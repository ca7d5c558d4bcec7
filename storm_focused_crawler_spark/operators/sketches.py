"""Bounded-memory heavy-hitters sketch (space-saving) for hot-key
detection — the crawl's skew detector at cardinalities where an exact
``groupBy(host).count()`` state no longer fits.

Public algorithm: Metwally, Agrawal, El Abbadi, "Efficient computation
of frequent and top-k elements in data streams" (ICDT 2005); sketch
merging per Agarwal et al., "Mergeable summaries" (PODS 2012).

Spark-first shape: one space-saving summary of capacity k per
PARTITION via ``mapInPandas`` (numpy counting inside, no per-row
Python state churn), then ONE hash-aggregate merge over at most
``partitions × k`` summary rows.  The wide data crosses no shuffle —
only k rows per partition do — which is the entire point at 10^10
frontier rows where the exact aggregation's key state (hosts) is fine
but the INPUT volume dominates; with truly unbounded key cardinality
(per-url keys) the exact groupBy's state explodes while this stays
``partitions × k``.

Error contract (the testable truth, not a vibe):
  * every key with true count > N/k is in the output (no false
    dismissals above the guarantee threshold);
  * reported ``count_hi`` ≥ true count ≥ ``count_hi − err``; ``err``
    is reported per key, so a consumer can see exactly how soft each
    figure is;
  * with k ≥ distinct(keys) the sketch is EXACT (err = 0, counts
    equal groupBy counts) — which is what the DuckDB oracle pins at
    fixture scale while the bounded-error property is pytest-locked
    at k < distinct.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _space_saving(values: Iterator[pd.Series], k: int) -> dict[str, list[int]]:
    """Classic space-saving over a stream of pandas chunks.

    counters: key -> [count, err].  When full, the minimum counter is
    evicted and its count becomes the newcomer's overestimation error.
    Chunk-vectorized: within a chunk, value_counts() collapses
    repeats, so the python loop runs per DISTINCT key per chunk.
    """
    counters: dict[str, list[int]] = {}
    for chunk in values:
        for key, n in chunk.value_counts().items():
            n = int(n)
            if key in counters:
                counters[key][0] += n
            elif len(counters) < k:
                counters[key] = [n, 0]
            else:
                mkey = min(counters, key=lambda x: counters[x][0])
                mcount = counters.pop(mkey)[0]
                counters[key] = [mcount + n, mcount]
    return counters


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 64, top: int | None = None
) -> DataFrame:
    """(key, count_hi, err) for the up-to-*top* heaviest keys.

    Phase 1: per-partition space-saving summaries (mapInPandas, ≤ k
    rows out per partition).  Phase 2: merge = per-key SUM of counts
    and errs over the summary rows (the mergeable-summaries result:
    summed upper bounds stay upper bounds, summed errs stay valid
    error bounds, and any key above the global guarantee threshold
    survives because it is above it in at least one partition), then
    keep the *top* largest upper bounds.
    """
    top = top if top is not None else k

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = _space_saving((pdf[key_col] for pdf in it), k)
        if counters:
            yield pd.DataFrame(
                {
                    "key": list(counters),
                    "count_hi": [v[0] for v in counters.values()],
                    "err": [v[1] for v in counters.values()],
                }
            )

    partial = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, "key string, count_hi long, err long"
    )
    merged = partial.groupBy("key").agg(
        F.sum("count_hi").alias("count_hi"), F.sum("err").alias("err")
    )
    return (
        merged.orderBy(F.col("count_hi").desc(), F.col("key").asc())
        .limit(top)
        .select("key", "count_hi", "err")
    )
