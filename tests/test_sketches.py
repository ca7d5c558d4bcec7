"""Space-saving heavy hitters (operators/sketches): exact at k ≥
distinct, guarantee + error-bound properties at k < distinct, and
partition invariance of the guarantee."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish key stream: key i has frequency ~ 3000/(i+1), 200 keys,
    ~17k rows — deterministic, shuffled by a fixed-seed permutation."""
    rng = np.random.RandomState(3)
    keys = np.repeat(
        np.arange(200), (3000 / (np.arange(200) + 1)).astype(int).clip(min=1)
    )
    rng.shuffle(keys)
    return spark.createDataFrame(
        [(f"k{int(x):03d}",) for x in keys], "host string"
    ).repartition(8)


def _exact(df):
    return {
        r["host"]: r["n"]
        for r in df.groupBy("host").agg(F.count("*").alias("n")).collect()
    }


def test_exact_when_capacity_covers_cardinality(spark, skewed):
    truth = _exact(skewed)
    got = {
        r["key"]: (r["count_hi"], r["err"])
        for r in SK.heavy_hitters(skewed, "host", k=512, top=512).collect()
    }
    assert {k: v[0] for k, v in got.items()} == truth
    assert all(v[1] == 0 for v in got.values())  # no evictions anywhere


def test_guarantee_and_error_bounds_under_eviction(spark, skewed):
    """k = 32 < 200 distinct: every key with true count > N/k must
    surface, and count_hi − err ≤ true ≤ count_hi for surfaced keys."""
    truth = _exact(skewed)
    n_total = sum(truth.values())
    k = 32
    rows = SK.heavy_hitters(skewed, "host", k=k, top=k).collect()
    got = {r["key"]: (r["count_hi"], r["err"]) for r in rows}
    must_have = {h for h, c in truth.items() if c > n_total / k}
    assert must_have <= set(got), sorted(must_have - set(got))
    for key, (hi, err) in got.items():
        true = truth.get(key, 0)
        assert true <= hi, (key, true, hi)
        assert hi - err <= true, (key, true, hi, err)


def test_upper_bound_survives_cross_partition_eviction(spark):
    """ADVICE r03 #1 regression: a key evicted in one partition must not
    lose that partition's mass — count_hi ≥ true count must hold even
    when the key survives in some partitions and is evicted in others.

    Partition 0 holds X×100 (X survives there); partition 1 sees X×50
    FIRST, then two much heavier keys, so with k=2 X is evicted from
    partition 1's summary.  The pre-fix per-key-sum merge reported
    count_hi(X)=100 < true 150."""
    import pandas as pd

    from storm_focused_crawler_spark.operators.sketches import _space_saving

    # deterministic single-process check of the summary+merge math
    c1, pmin1 = _space_saving(iter([pd.Series(["X"] * 100 + ["Y"] * 10)]), k=2)
    c2, pmin2 = _space_saving(
        iter([pd.Series(["X"] * 50), pd.Series(["A"] * 200), pd.Series(["B"] * 300)]),
        k=2,
    )
    assert "X" in c1 and "X" not in c2 and pmin1 == 0 and pmin2 >= 50
    # and the same scenario end-to-end through the DataFrame merge:
    # slices of sc.parallelize become partitions; small Arrow batches
    # force multi-chunk summaries so X hits partition 1 before B does
    data = [("X",)] * 100 + [("Y",)] * 10 + [("X",)] * 50 + [("A",)] * 200 + [("B",)] * 300
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rdd = spark.sparkContext.parallelize(data, 2)
        df = spark.createDataFrame(rdd, "host string")
        got = {
            r["key"]: (r["count_hi"], r["err"])
            for r in SK.heavy_hitters(df, "host", k=2, top=4).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    truth = {"X": 150, "Y": 10, "A": 200, "B": 300}
    for key, (hi, err) in got.items():
        assert truth.get(key, 0) <= hi, (key, truth.get(key, 0), hi)
        assert hi - err <= truth.get(key, 0), (key, truth.get(key, 0), hi, err)


def test_guarantee_partition_invariant(spark, skewed):
    """The guarantee holds at any partitioning (summaries merge per the
    mergeable-summaries bound)."""
    truth = _exact(skewed)
    n_total = sum(truth.values())
    k = 32
    must_have = {h for h, c in truth.items() if c > n_total / k}
    for parts in (1, 4, 16):
        rows = SK.heavy_hitters(skewed.repartition(parts), "host", k=k, top=k).collect()
        assert must_have <= {r["key"] for r in rows}, parts
