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
