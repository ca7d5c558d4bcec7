"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(kind, n_bytes, codec-ish tags in a map).  The Spark-side plumbing —
schemas, partition-friendly batch iteration via mapInPandas, Arrow
batch shapes, frame-sampling offsets — is REAL and tested; the actual
pixel/sample decoding is STUBBED because no image/audio libraries are
installed in this container (clearly marked below): ``decode_media``
produces a deterministic fake feature vector from the raw bytes, and
``decode_media_real`` raises NotImplementedError with the integration
point documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, kind string, n_bytes long, feat0 double, feat1 double, n_frames int"
_KINDS = ("image", "audio", "video")


def derive_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media table: payload bytes + typed metadata columns."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.element_at(
            F.array(*[F.lit(k) for k in _KINDS]), (F.col(id_col) % 3 + 1).cast("int")
        ).alias("kind"),
        F.map_from_arrays(
            F.array(F.lit("codec"), F.lit("source")),
            F.array(F.concat(F.lit("c"), (F.col(id_col) % 4).cast("string")), F.lit("synthetic")),
        ).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode pipeline with a STUBBED decoder.

    The Spark plumbing (batch iterator, Arrow transfer, output schema,
    per-kind dispatch) is production-shaped; the decode itself is a
    deterministic fake (byte-mean / byte-std as 'features', frame count
    from length) so tests can pin behavior without media libs.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["blob"].map(len).astype("int64")
            # ---- STUB: real decode would dispatch on pdf['kind'] to
            # PIL/librosa/pyav here (not installed in this container).
            feat0, feat1, n_frames = [], [], []
            for blob, kind in zip(pdf["blob"], pdf["kind"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                feat0.append(float(arr.mean()) if arr.size else 0.0)
                feat1.append(float(arr.std()) if arr.size else 0.0)
                n_frames.append(int(arr.size // 256) + 1 if kind == "video" else 1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "feat0": np.round(feat0, 6),
                    "feat1": np.round(feat1, 6),
                    "n_frames": n_frames,
                }
            )

    return df.mapInPandas(decode, MEDIA_SCHEMA)


def extract_media_col(html):
    """Embedded media references from page HTML, document order —
    array<struct<media_url,kind>> ([R] MediaExtractionBolt pulled
    image/video items out of fetched pages).  Pure codegen: two
    regexp_extract_all passes + struct-tagging, no Python."""

    def tagged(pattern: str, kind: str):
        urls = F.regexp_extract_all(html, F.lit(pattern), F.lit(1))
        return F.transform(
            urls, lambda u: F.struct(u.alias("media_url"), F.lit(kind).alias("kind"))
        )

    return F.concat(
        tagged(r'<img src="([^"]*)"', "image"),
        tagged(r'<video src="([^"]*)"', "video"),
    )


def frame_sample_offsets(n_bytes, every: int = 4096):
    """Deterministic frame-sampling plan: byte offsets to decode (JVM-side)."""
    n = F.greatest((n_bytes / every).cast("int"), F.lit(1))
    return F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every)


def decode_media_real(df: DataFrame) -> DataFrame:  # pragma: no cover
    """Integration point for real decoders (PIL / librosa / pyav).

    STUB: this container has no media libraries (environment
    constraint); on a real cluster, implement the same mapInPandas
    contract as decode_media with actual decoding.
    """
    raise NotImplementedError(
        "media decoding libraries are not installed in this environment; "
        "use decode_media (deterministic fake) or install PIL/librosa/pyav "
        "and implement the decode() iterator against MEDIA_SCHEMA"
    )
