"""Locks for the round-2 fixes (VERDICT.md 'Next round' items 2/6 +
ADVICE.md): hash64_url canonicalizes first, join_range_ts finds
cross-midnight pairs with no cross-product plan, dequeue rejects a
stale (too-small) literal budget bound, read_union resolves its
compaction base in O(1) manifest reads."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark import spec


def test_hash64_url_op_hashes_canonical_form(spark, sf_dir):
    """SURVEY §2.1-2: h(url) = xxhash64(canon(url)) — the registry op
    must agree with the pure-python spec twin."""
    from storm_focused_crawler_spark.plans.crawl_ops import hash64_url

    rows = hash64_url(spark, sf_dir).orderBy("url").limit(50).collect()
    assert rows
    for r in rows:
        assert r["url_hash"] == spec.xxh64(spec.canon(r["url"])), r["url"]


def test_join_range_ts_nonempty_and_matches_naive(spark, sf_dir):
    """The bucketized range join must be non-vacuous on the fixture and
    identical to the naive theta-join."""
    from storm_focused_crawler_spark.plans.queries import REGISTRY, _t

    fn, _ = REGISTRY["join_range_ts"]
    got = {(r["event_id"], r["n_prior"]) for r in fn(spark, sf_dir).collect()}
    assert len(got) > 0, "vacuous: fixture produced no range matches"

    ev = _t(spark, sf_dir, "events")
    f = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    e = ev.filter(F.col("event_type") != "click").select(F.col("ts").alias("ets"))
    naive = (
        f.join(
            e,
            (F.col("ets") >= F.col("ts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("ets") < F.col("ts")),
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_prior"))
    )
    want = {(r["event_id"], r["n_prior"]) for r in naive.collect()}
    assert got == want


def test_join_range_ts_crosses_midnight(spark, tmp_path):
    """A click at 00:30 must count an event at 23:30 the previous day —
    the round-1 day-bucket plan could never match this pair."""
    from storm_focused_crawler_spark.plans.queries import REGISTRY

    rows = [
        (1, dt.datetime(2024, 1, 2, 0, 30), 10, "click", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 23, 30), 11, "view", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 21, 0), 12, "view", 0.0, "{}"),  # outside 2h
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["join_range_ts"]
    got = {(r["event_id"], r["n_prior"]) for r in fn(spark, str(tmp_path)).collect()}
    assert got == {(1, 1)}


def test_join_range_ts_plan_has_no_cross_product(spark, sf_dir):
    from storm_focused_crawler_spark.plans.queries import REGISTRY

    fn, _ = REGISTRY["join_range_ts"]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dequeue_rejects_dominated_literal_budget(spark):
    """ADVICE: a stale max_budget literal below the table max must fail
    loudly instead of silently under-scheduling hosts."""
    from storm_focused_crawler_spark.operators.frontier import dequeue

    elig = spark.createDataFrame(
        [("https://h/x", 1, 0.5, 0, "h")],
        "url string, url_hash long, score double, depth int, host string",
    )
    budgets = spark.createDataFrame([("h", 9)], "host string, budget int")
    with pytest.raises(ValueError, match="max_budget"):
        dequeue(elig, budgets, 10, max_budget=3)


def test_read_union_uses_manifest_compact_pointer(spark, tmp_path):
    """The compaction base must come from the latest manifest (O(1)),
    and carry forward across rounds that don't compact."""
    from storm_focused_crawler_spark.sources.storage import ParquetSnapshotStore

    store = ParquetSnapshotStore(str(tmp_path / "state"))
    mk = lambda *vals: spark.createDataFrame([(v,) for v in vals], "url_hash long")
    store.write_round(0, {"seen": mk(1, 2)})
    store.write_round(1, {"seen": mk(3), "seen_full": mk(1, 2, 3)})
    store.write_round(2, {"seen": mk(4)})
    assert store.manifest(2)["compact"] == {"seen": 1}
    got = sorted(r["url_hash"] for r in store.read_union(spark, 2, "seen").collect())
    assert got == [1, 2, 3, 4]


def test_read_union_skips_rounds_missing_the_table(spark, tmp_path):
    """A table can join the crawl mid-run (postings when --text-index is
    enabled on resume): read_union must scan only rounds whose manifest
    lists the table instead of failing on the missing path (ADVICE r02)."""
    import pytest as _pytest

    from storm_focused_crawler_spark.sources.storage import ParquetSnapshotStore

    store = ParquetSnapshotStore(str(tmp_path / "state2"))
    mk = lambda *vals: spark.createDataFrame([(v,) for v in vals], "url_hash long")
    store.write_round(0, {"seen": mk(1)})                      # no postings yet
    store.write_round(1, {"seen": mk(2), "postings": mk(10)})  # enabled mid-run
    store.write_round(2, {"seen": mk(3), "postings": mk(11)})
    got = sorted(r["url_hash"] for r in store.read_union(spark, 2, "postings").collect())
    assert got == [10, 11]
    # a table no round ever committed raises a clear error, not a scan fail
    with _pytest.raises(FileNotFoundError, match="never_written"):
        store.read_union(spark, 2, "never_written")
