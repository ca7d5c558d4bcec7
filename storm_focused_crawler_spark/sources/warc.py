"""WARC-lite source: Common-Crawl-style record ingestion as a
splittable Spark text read.

The reference topology fetched pages live; the batch analog every
web-scale corpus job needs is ingesting archived crawl records (the
public WARC format, ISO 28500).  This module reads a simplified WARC
("WARC-lite": `WARC/1.0` record marker, `Header: value` lines, blank
line, payload) with ZERO custom input format code:

  spark.read.option("lineSep", "WARC/1.0\\n").text(path)

puts one RECORD per row — Hadoop's text reader supports arbitrary
record delimiters and remains block-splittable, so a 100 TB archive
parallelizes by HDFS block exactly like newline text, and records
straddling a split boundary are handled by the standard
read-past-the-boundary rule.  Header/payload parsing is then pure JVM
string work in whole-stage codegen (no Python, no shuffle).

The synthetic writer twin (write_warc_lite) renders the same format
deterministically for tests/benchmarks — no external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SEP = "WARC/1.0\n"


def read_warc_lite(spark: SparkSession, path: str) -> DataFrame:
    """Parse a WARC-lite archive into
    (url, warc_date, content_length, payload).

    One text-source read with lineSep=RECORD_SEP (one record per row,
    splittable), then per-row JVM splits/regexes — the archive is
    never reassembled on one node and nothing shuffles."""
    raw = spark.read.option("lineSep", RECORD_SEP).text(path)
    rec = raw.filter(F.length("value") > 0)
    parts = F.split(F.col("value"), "\n\n", 2)
    headers = parts.getItem(0)
    payload = F.regexp_replace(parts.getItem(1), "\n$", "")
    return rec.select(
        F.regexp_extract(headers, r"WARC-Target-URI: (\S+)", 1).alias("url"),
        F.regexp_extract(headers, r"WARC-Date: (\S+)", 1).alias("warc_date"),
        F.regexp_extract(headers, r"Content-Length: (\d+)", 1)
        .cast("long")
        .alias("content_length"),
        payload.alias("payload"),
    )


def render_record(url: str, warc_date: str, payload: str) -> str:
    """One WARC-lite record (python twin of the format the reader
    parses; Content-Length counts payload characters)."""
    return (
        f"WARC/1.0\n"
        f"WARC-Target-URI: {url}\n"
        f"WARC-Date: {warc_date}\n"
        f"Content-Length: {len(payload)}\n"
        f"\n{payload}\n"
    )


def write_warc_lite(rows, path: str) -> None:
    """Render (url, warc_date, payload) triples to one archive file —
    deterministic synthesis for tests (fixture-sized, driver-side by
    design; a production archive arrives pre-written)."""
    with open(path, "w") as f:
        for url, warc_date, payload in rows:
            f.write(render_record(url, warc_date, payload))
