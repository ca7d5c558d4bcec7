"""Seen-set compaction (CrawlConfig.compact_every): long crawls bound
their delta-scan fan-in by periodically rewriting the full seen set
inside a round's atomic commit; state must be identical with and
without compaction, including across a resume at the boundary."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (plan parity helpers)

from storm_focused_crawler_spark import driver as drv
from storm_focused_crawler_spark.fixtures import gen_pages

ROUNDS = 5


def _cfg(rounds, compact_every):
    return drv.CrawlConfig(
        rounds=rounds, capacity=32,
        keywords=tuple(gen_pages.topic_keywords()),
        compact_every=compact_every,
    )


def _state(spark, store, rounds):
    ordering = sorted(
        (r["round"], r["seq"], r["url"])
        for n in range(rounds)
        for r in store.read(spark, n, "ordering").collect()
    )
    seen = {r["url_hash"] for r in store.read_union(spark, rounds - 1, "seen").collect()}
    return ordering, seen


def test_compaction_state_identical(spark, sf_dir, tmp_path):
    paths = gen_pages.ensure(sf_dir)
    s_plain = drv.run_crawl(spark, paths, _cfg(ROUNDS, 0), str(tmp_path / "plain"))
    s_comp = drv.run_crawl(spark, paths, _cfg(ROUNDS, 2), str(tmp_path / "comp"))
    assert _state(spark, s_plain, ROUNDS) == _state(spark, s_comp, ROUNDS)
    # compactions actually happened at rounds 1 and 3 (0-indexed)
    for r, expect in [(0, False), (1, True), (2, False), (3, True)]:
        assert ("seen_full" in s_comp.manifest(r)["tables"]) is expect, r


def test_resume_across_compaction_boundary(spark, sf_dir, tmp_path):
    paths = gen_pages.ensure(sf_dir)
    wd = str(tmp_path / "resume")
    drv.run_crawl(spark, paths, _cfg(2, 2), wd)  # stops right after a compaction
    s = drv.run_crawl(spark, paths, _cfg(ROUNDS, 2), wd, resume=True)
    ref = drv.run_crawl(spark, paths, _cfg(ROUNDS, 0), str(tmp_path / "ref"))
    assert _state(spark, s, ROUNDS) == _state(spark, ref, ROUNDS)


def test_delta_tables_compact_too(spark, sf_dir, tmp_path):
    """host_edges and postings are append-only deltas like `seen`; a
    compaction round must rewrite their full sets as well (otherwise a
    long crawl's read_union fan-in grows without bound), and the
    compacted read must equal the plain (uncompacted) union — content
    AND multiplicity (pagerank counts multi-edges)."""
    paths = gen_pages.ensure(sf_dir)

    def cfg(compact_every):
        return drv.CrawlConfig(
            rounds=ROUNDS, capacity=32,
            keywords=tuple(gen_pages.topic_keywords()),
            compact_every=compact_every,
            host_rank_weight=0.25, build_text_index=True,
        )

    s_plain = drv.run_crawl(spark, paths, cfg(0), str(tmp_path / "dplain"))
    s_comp = drv.run_crawl(spark, paths, cfg(2), str(tmp_path / "dcomp"))

    # compaction rounds carry the full tables + the manifest pointer
    m3 = s_comp.manifest(3)
    for tbl in ("seen", "host_edges", "postings"):
        assert f"{tbl}_full" in m3["tables"], tbl
        assert m3["compact"][tbl] == 3, tbl

    def bag(store, table, cols):
        rows = store.read_union(spark, ROUNDS - 1, table).select(*cols).collect()
        return sorted(map(tuple, rows))

    assert bag(s_comp, "host_edges", ["src", "dst"]) == bag(
        s_plain, "host_edges", ["src", "dst"]
    )
    assert bag(s_comp, "postings", ["token", "doc", "tf"]) == bag(
        s_plain, "postings", ["token", "doc", "tf"]
    )
    # and the compacted read actually resolves from the pointer: the
    # full table alone already holds every pre-boundary row
    full_only = {
        tuple(r) for r in s_comp.read(spark, 3, "host_edges_full")
        .select("src", "dst").collect()
    }
    pre = {
        tuple(r)
        for n in range(4)
        for r in s_comp.read(spark, n, "host_edges").select("src", "dst").collect()
    }
    assert pre <= full_only
