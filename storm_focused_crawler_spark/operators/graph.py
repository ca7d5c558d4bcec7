"""Host-graph link analysis — iterative PageRank, Spark-first.

A focused crawler's frontier scoring can fold in link-graph authority
(the reference's RankerBolt scored pages; host-level PageRank is the
classic public-knowledge authority signal).  This is the repo's
representative ITERATIVE algorithm: per iteration one join + one
hash aggregate, state materialized and lineage truncated each step so
a 50-iteration run never builds a 50-deep plan.

Determinism discipline: ranks are INTEGER micro-units (parts of
``SCALE``), contributions use integer division, and per-node sums are
integer sums — order-independent regardless of partitioning, unlike
double accumulation whose last-ulp depends on reduce order.  A
pure-python twin (``pagerank_py``) computes bit-identical ranks for
the pytest lock.

Scale shape: edges shuffle ONCE per iteration on dst (hash agg with
map-side combine); ranks/degrees are node-cardinality tables (hosts,
~10^6 at web scale — orders smaller than the 10^10 URL level).  The
dangling-mass scalar is one tiny agg per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9  # rank micro-units; all arithmetic stays in int64
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a ratio


def pagerank(edges: DataFrame, iters: int = 10) -> DataFrame:
    """(node, rank_i, rank) after *iters* synchronous iterations.

    edges(src string, dst string); multi-edges count once per
    occurrence, self-loops allowed.  rank_i is the exact integer
    state (sums to ≤ SCALE with deterministic floor losses); rank is
    the float view rank_i / SCALE.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg")).persist()
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank_i")).persist()
    ranks.count()

    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)  # teleport term
    # dangling nodes (no out-edges) spread their mass uniformly; the
    # membership is fixed, so detect ONCE and pay the per-iteration
    # mass scalar only when the set is non-empty
    dangling = nodes.join(deg, "node", "left_anti").persist()
    has_dangling = dangling.count() > 0
    for _ in range(iters):
        dang = 0
        if has_dangling:
            dang = (
                dangling.join(ranks, "node")
                .agg(F.coalesce(F.sum("rank_i"), F.lit(0)).cast("long").alias("d"))
                .collect()[0]["d"]
            )
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_i DIV deg").cast("long").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
        new_ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_NUM} * (coalesce(s, 0L) + {int(dang) // n}L)) DIV {DAMP_DEN}"
                    )
                ).cast("long").alias("rank_i"),
            )
            .persist()
        )
        new_ranks.count()  # materialize → lineage cut at the cache
        ranks.unpersist()
        ranks = new_ranks

    out = ranks.select(
        "node", "rank_i", F.round(F.col("rank_i") / F.lit(float(SCALE)), 9).alias("rank")
    )
    nodes.unpersist()
    deg.unpersist()
    dangling.unpersist()
    return out


def pagerank_py(edge_list: list[tuple[str, str]], iters: int = 10) -> dict[str, int]:
    """Pure-python bit-identical twin of pagerank() (pytest oracle)."""
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    n = len(nodes)
    deg: dict[str, int] = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if v not in deg)
        s: dict[str, int] = {v: 0 for v in nodes}
        for src, dst in edge_list:
            s[dst] += rank[src] // deg[src]
        rank = {
            v: base + (DAMP_NUM * (s[v] + dang // n)) // DAMP_DEN for v in nodes
        }
    return rank
