"""Iterative PageRank locks: bit-identical to the pure-python integer
twin, partition-invariant, dangling mass handled."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators import graph as G


def _spark_ranks(spark, edge_list, iters=10):
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    return {
        r["node"]: r["rank_i"] for r in G.pagerank(edges, iters=iters).collect()
    }


def test_matches_python_twin_exactly(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d has no in-links
        ("e", "e"),  # self-loop
        ("f", "a"), ("f", "a"),  # multi-edge
        ("g", "h"),  # h is dangling (no out-edges)
    ]
    got = _spark_ranks(spark, edges)
    want = G.pagerank_py(edges, iters=10)
    assert got == want  # INTEGER equality, not approximate


def test_partition_invariant(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"), ("d", "a")]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        r2 = _spark_ranks(spark, edges, iters=8)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        r17 = _spark_ranks(spark, edges, iters=8)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r2 == r17


def test_authority_ordering(spark):
    # everyone links to 'hub'; hub links back only to 'a' — so hub
    # aggregates 3 nodes' mass and 'a' inherits ALL of hub's; both
    # far outrank the leaf nodes, which hold only the teleport floor
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    got = _spark_ranks(spark, edges)
    assert got["b"] == got["c"]  # symmetric leaves
    assert got["hub"] > 5 * got["b"]
    assert got["a"] > 5 * got["b"]


def test_mass_conserved_within_floor_loss(spark):
    edges = [("a", "b"), ("b", "a"), ("c", "a")]
    got = _spark_ranks(spark, edges)
    total = sum(got.values())
    # integer floors only ever LOSE micro-units, bounded per node+iter
    assert G.SCALE * 0.98 <= total <= G.SCALE


def test_registry_op_runs(spark, sf_dir):
    from storm_focused_crawler_spark.plans import pipeline_ops  # noqa: F401
    from storm_focused_crawler_spark.plans.queries import REGISTRY

    fn, _ = REGISTRY["graph_host_rank"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 40
    assert abs(sum(r["rank_i"] for r in rows) - G.SCALE) < G.SCALE * 0.02
