"""Host-authority frontier blending (§2.1-7, VERDICT r02 'Next round' #3).

The dequeue priority becomes round6(score + w · host_rank/SCALE) with
host_rank the integer PageRank over the host edges discovered so far.
The sequential oracle implements the identical semantics, so the parity
gate (identical ordering + seen set) must hold with the flag ON, at 2
and 32 shuffle partitions, and across kill/resume — and the blended
ordering must actually DIFFER from the unblended one (non-vacuous).
"""

from __future__ import annotations

import shutil

import pytest

from storm_focused_crawler_spark import driver as drv
from storm_focused_crawler_spark.fixtures import gen_pages
from storm_focused_crawler_spark.oracle import seqcrawler as sq

ROUNDS = 3
CAPACITY = 64
WEIGHT = 0.25


@pytest.fixture(scope="module")
def fixture_paths(sf_dir):
    return gen_pages.ensure(sf_dir)


@pytest.fixture(scope="module")
def oracle_blended(fixture_paths):
    pages, seeds, robots, budgets = sq.load_fixture_inputs(fixture_paths)
    cfg = sq.CrawlConfig(rounds=ROUNDS, capacity=CAPACITY,
                         keywords=tuple(gen_pages.topic_keywords()),
                         host_rank_weight=WEIGHT)
    return sq.crawl(pages, seeds, robots, budgets, cfg)


@pytest.fixture(scope="module")
def oracle_plain(fixture_paths):
    pages, seeds, robots, budgets = sq.load_fixture_inputs(fixture_paths)
    cfg = sq.CrawlConfig(rounds=ROUNDS, capacity=CAPACITY,
                         keywords=tuple(gen_pages.topic_keywords()))
    return sq.crawl(pages, seeds, robots, budgets, cfg)


def _engine_cfg(rounds=ROUNDS):
    return drv.CrawlConfig(rounds=rounds, capacity=CAPACITY,
                           keywords=tuple(gen_pages.topic_keywords()),
                           host_rank_weight=WEIGHT)


def _collect(spark, store, upto=ROUNDS):
    ordering = []
    for r in range(upto):
        ordering += [(x["round"], x["seq"], x["url"])
                     for x in store.read(spark, r, "ordering").collect()]
    seen = {x["url_hash"]
            for x in store.read_union(spark, upto - 1, "seen").collect()}
    return sorted(ordering), seen


def test_blend_changes_ordering(oracle_blended, oracle_plain):
    assert sorted(oracle_blended.ordering) != sorted(oracle_plain.ordering), (
        "host-rank blend is vacuous on this fixture — pick a larger WEIGHT"
    )


@pytest.mark.parametrize("parts", [2, 32])
def test_blended_parity(spark, fixture_paths, oracle_blended, tmp_path, parts):
    wd = str(tmp_path / f"blend{parts}")
    shutil.rmtree(wd, ignore_errors=True)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        store = drv.run_crawl(spark, fixture_paths, _engine_cfg(), wd)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    ordering, seen = _collect(spark, store)
    assert ordering == sorted(oracle_blended.ordering)
    assert seen == oracle_blended.seen_hashes


def test_blended_resume_matches_uninterrupted(spark, fixture_paths, oracle_blended, tmp_path):
    """Kill after round 1, resume to ROUNDS: ranks rebuilt from committed
    host_edges deltas must reproduce the uninterrupted blended run."""
    wd = str(tmp_path / "blend_resume")
    drv.run_crawl(spark, fixture_paths, _engine_cfg(rounds=2), wd)
    store = drv.run_crawl(spark, fixture_paths, _engine_cfg(), wd, resume=True)
    ordering, seen = _collect(spark, store)
    assert ordering == sorted(oracle_blended.ordering)
    assert seen == oracle_blended.seen_hashes


def test_host_edges_committed_per_round(spark, fixture_paths, tmp_path):
    wd = str(tmp_path / "blend_edges")
    store = drv.run_crawl(spark, fixture_paths, _engine_cfg(), wd)
    for r in range(ROUNDS):
        assert "host_edges" in store.manifest(r)["tables"]
    edges = store.read_union(spark, ROUNDS - 1, "host_edges")
    assert edges.columns == ["src", "dst"]
    assert edges.count() > 0
