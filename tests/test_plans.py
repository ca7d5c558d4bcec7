"""Physical-plan assertions (SURVEY.md §4.2 'VERIFY via explain()').

Correct results with the wrong plan would not survive the 100 TB
scale-up; these tests pin the plan properties the engine relies on:
column pruning of the fat html column, predicate pushdown into parquet,
broadcast of dimension tables, and rank→top-k pruning
(WindowGroupLimit) in the politeness dequeue.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark.fixtures import gen_pages


@pytest.fixture(scope="module")
def fixture_paths(sf_dir):
    return gen_pages.ensure(sf_dir)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_column_pruning_html_never_read_unless_needed(spark, fixture_paths):
    """Projecting url/lang from pages must NOT read the html column —
    at 100 TB html is ~95% of the bytes (SURVEY.md §4.2)."""
    pages = spark.read.parquet(fixture_paths["pages"])
    plan = _plan(pages.select("url", "lang").filter(F.col("lang") == "en"))
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "html" not in read_schema, read_schema
    assert "url" in read_schema and "lang" in read_schema


def test_predicate_pushdown_to_parquet(spark, fixture_paths):
    pages = spark.read.parquet(fixture_paths["pages"])
    plan = _plan(pages.filter(F.col("lang") == "en").select("url"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "lang" in pushed[0], plan[:2000]


def test_fetch_join_broadcasts_dequeued_side(spark, fixture_paths):
    """The per-round fetch join must broadcast the (tiny) dequeued set,
    never shuffle the page corpus (SURVEY.md §3 entry 3)."""
    pages = spark.read.parquet(fixture_paths["pages"])
    deq = spark.createDataFrame([("https://x/p1",), ("https://x/p2",)], "url string")
    plan = _plan(pages.join(F.broadcast(deq), "url", "inner"))
    assert "BroadcastHashJoin" in plan
    # corpus side must not be exchanged by the join
    assert "Exchange hashpartitioning(url" not in plan


def test_dequeue_uses_window_group_limit(spark, fixture_paths):
    """rank<=k filters must compile to WindowGroupLimit (top-k pruning
    before the full sort) — this is what keeps the salted politeness
    window from materializing whole hot-host partitions."""
    from storm_focused_crawler_spark.operators.frontier import dequeue

    frontier = (
        spark.read.parquet(fixture_paths["pages"])
        .select("url")
        .distinct()
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("score", F.lit(0.5))
        .withColumn("depth", F.lit(0))
        .withColumn(
            "host", F.substring_index(F.substring_index("url", "://", -1), "/", 1)
        )
    )
    budgets = spark.read.parquet(fixture_paths["host_budget"])
    plan = _plan(dequeue(frontier, budgets, 64, n_salts=8))
    assert plan.count("WindowGroupLimit") >= 2, "phase-1/phase-2 top-k not pruned"
    assert "BroadcastHashJoin" in plan  # budgets joined broadcast

    # the crawl-delay cap (min_interval_ms) must NOT cost the pruning:
    # it folds into the budget column as a scalar expression and the
    # literal rank bounds keep compiling to WindowGroupLimit
    delayed = budgets.withColumn(
        "min_interval_ms",
        F.when(F.length("host") % 2 == 0, F.lit(15_000)),
    )
    plan_d = _plan(dequeue(frontier, delayed, 64, n_salts=8))
    assert plan_d.count("WindowGroupLimit") >= 2, "interval cap broke top-k pruning"
    assert "BroadcastHashJoin" in plan_d


def test_no_html_through_round_shuffles(spark, fixture_paths, tmp_path):
    """In the crawl round DAG, html may appear ONLY below the first
    projection after the corpus scan — never in an Exchange's output
    (SURVEY.md §7.4-4)."""
    import json

    from storm_focused_crawler_spark import spec
    from storm_focused_crawler_spark.driver import (
        FRONTIER_SCHEMA,
        SEEN_SCHEMA,
        CrawlConfig,
        run_round,
    )

    with open(fixture_paths["seeds"]) as f:
        seeds = [spec.canon(u) for u in json.load(f)]
    frontier = spark.createDataFrame(
        [(u, spec.xxh64(u), 0.0, 0, 0) for u in seeds], FRONTIER_SCHEMA
    )
    out = run_round(
        spark,
        spark.read.parquet(fixture_paths["pages"]),
        frontier,
        spark.createDataFrame([], SEEN_SCHEMA),
        spark.read.parquet(fixture_paths["robots"]),
        spark.read.parquet(fixture_paths["host_budget"]),
        CrawlConfig(rounds=1, capacity=64, keywords=("data",)),
        0,
        [spec.xxh64(u) for u in seeds],
    )
    try:
        plan = _plan(out["frontier"])
        for ln in plan.splitlines():
            if "Exchange" in ln and "html" in ln:
                raise AssertionError(f"html bytes cross a shuffle: {ln}")
    finally:
        for df in out["_persisted"]:
            df.unpersist()
