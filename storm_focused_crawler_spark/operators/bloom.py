"""Sharded Bloom-filter URL-seen accelerator (SURVEY.md §4.3-2).

The reference keeps its URL-seen set in a single Redis SET — O(1)
probes but one global hotspot ([R] RedisSpout/URLExpanderBolt;
BASELINE.json north_star: "sharded Bloom/cuckoo-filter URL-seen set
built via vectorized Arrow UDFs").  Here the seen set's Bloom sidecar
is sharded by ``pmod(url_hash, n_shards)``; each shard's bitset is
built by a grouped Arrow UDF (numpy, no per-row Python), shards are
mergeable by bitwise OR (so incremental rounds just OR the new round's
shards in), and the probe is a broadcast of the small bitsets plus a
vectorized pandas UDF.

Correctness discipline (§2.1-3): the Bloom is ADVISORY.  Probe-negative
rows are definitively unseen (no false negatives — property-tested);
probe-positive rows go to the exact anti-join, which remains the
membership authority.  At a 10^10 frontier this cuts the anti-join's
probe side to the ~0.1% of rows that are Bloom-positive.

Two probe strategies share the same bitsets:

  * ``probe_transform`` broadcast mode — collect all shards into one
    broadcast dict, probe via scalar pandas UDF.  Right while the total
    bitset fits comfortably in executor memory: bits_per_shard=2^23
    (1 MiB) × 64 shards ≈ 64 MiB for ~5×10^8 seen URLs at FPR≈1%, k=5.
  * ``probe_transform`` routed mode — co-partition the frontier by
    shard id and cogroup it with the shard table, so each task loads
    ONLY its own shard's bitset (one Arrow batch group per shard;
    numpy probe inside).  This is the 10^10-URL path: at 1% FPR that
    seen set needs ~12 GiB of bitset — unbroadcastable — but split
    over 1024 shards it is ~12 MiB per shard, and a task touches
    exactly one.  Cost: one shuffle of the (narrow) frontier keyed by
    shard — at that scale strictly cheaper than shipping 12 GiB to
    every executor.

The driver picks automatically: broadcast while
``n_shards · n_bits/8 ≤ CrawlConfig.bloom_broadcast_max_bytes``,
routed beyond (tests force both and assert identical output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

K_HASHES = 5


def _h2(h1: np.ndarray) -> np.ndarray:
    """Second hash via splitmix64-style mixing of the url_hash (uint64)."""
    z = h1 + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """k bit positions per hash, double-hashing: (h1 + i·h2) mod n_bits."""
    h1 = hashes.astype(np.uint64)
    h2 = _h2(h1) | np.uint64(1)  # odd so the k probes don't collapse
    i = np.arange(K_HASHES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).ravel()


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, hashes: np.ndarray, n_bits: int) -> np.ndarray:
    pos = _positions(hashes, n_bits).reshape(-1, K_HASHES)
    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


def build_shards(df: DataFrame, n_shards: int, n_bits: int) -> DataFrame:
    """hash df(url_hash) → df(shard int, bits binary, n long) via Arrow UDAF."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        _set_bits(bits, _positions(h, n_bits))
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()],
             "n": [len(pdf)]}
        )

    withshard = df.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
    return withshard.groupBy("shard").applyInPandas(build, "shard int, bits binary, n long")


def merge_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR merge of two shard sets (round-incremental build)."""

    def orr(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        n = 0
        for blob, cnt in zip(pdf["bits"], pdf["n"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
            n += int(cnt)
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bits": [acc.tobytes()], "n": [n]})

    return a.unionByName(b).groupBy("shard").applyInPandas(orr, "shard int, bits binary, n long")


def probe_transform(
    spark: SparkSession,
    shards: DataFrame,
    n_shards: int,
    n_bits: int,
    broadcast_max_bytes: int = 64 << 20,
):
    """DataFrame transformer: df → df + boolean ``_maybe`` column.

    Picks broadcast vs shard-routed probing by total bitset size (see
    module docstring).  Input df must carry ``url_hash``.
    """
    total_bytes = n_shards * (n_bits // 8)
    if total_bytes <= broadcast_max_bytes:
        col_fn = probe_col(spark, shards, n_shards, n_bits)
        return lambda df: df.withColumn("_maybe", col_fn(F.col("url_hash")))
    return lambda df: probe_routed(df, shards, n_shards, n_bits)


def probe_routed(
    df: DataFrame, shards: DataFrame, n_shards: int, n_bits: int
) -> DataFrame:
    """Shard-routed probe: adds ``_maybe`` without broadcasting any bitset.

    The frontier is hash-partitioned by shard id and cogrouped with the
    shard table, so each task receives (its frontier rows, its ONE
    bitset row) — per-executor memory is bounded by shards-per-task,
    never the full filter.  Probe is the same vectorized numpy test as
    the broadcast path (identical output, property-tested).
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_maybe", T.BooleanType())]
    )

    def probe(fr: pd.DataFrame, sh: pd.DataFrame) -> pd.DataFrame:
        fr = fr.drop(columns=["_shard"])
        if fr.empty:
            fr["_maybe"] = pd.Series([], dtype=bool)
            return fr
        if sh.empty:  # shard never built → nothing seen in it
            fr["_maybe"] = False
            return fr
        bits = np.frombuffer(sh["bits"].iloc[0], dtype=np.uint8)
        h = fr["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        fr["_maybe"] = _test_bits(bits, h, n_bits)
        return fr

    keyed = df.withColumn(
        "_shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )
    return (
        keyed.groupBy("_shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )


def probe_col(spark: SparkSession, shards: DataFrame, n_shards: int, n_bits: int):
    """Returns a column-function: url_hash → maybe_seen (vectorized probe).

    Broadcasts the collected bitsets once; the pandas UDF probes numpy-
    side.  Use as: df.withColumn('maybe_seen', probe(F.col('url_hash'))).
    Only valid while the total bitset is broadcast-sized — the routed
    twin above is the beyond-broadcast path.
    """
    blobs = {int(r["shard"]): np.frombuffer(r["bits"], dtype=np.uint8) for r in shards.collect()}
    empty = np.zeros(n_bits // 8, dtype=np.uint8)
    bc = spark.sparkContext.broadcast({s: b for s, b in blobs.items()})

    @F.pandas_udf("boolean")
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy(dtype=np.int64).view(np.uint64)
        shard = (url_hash.to_numpy(dtype=np.int64) % n_shards + n_shards) % n_shards
        out = np.zeros(len(h), dtype=bool)
        table = bc.value
        for s in np.unique(shard):
            m = shard == s
            bits = table.get(int(s), empty)
            out[m] = _test_bits(bits, h[m], n_bits)
        return pd.Series(out)

    return maybe_seen
