"""Short-URL expansion hook ([R] URLExpanderBolt; VERDICT r01 missing
#4): standalone operator semantics + crawl integration (a shortener
link in a page resolves to its long target, which then gets crawled)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark import spec
from storm_focused_crawler_spark.functions.udfs import expand_urls


def test_expand_maps_and_passes_through(spark):
    df = spark.createDataFrame(
        [("https://sho.rt/1",), ("https://keep.me/x",)], "url string"
    )
    mapping = spark.createDataFrame(
        [("https://sho.rt/1", "https://long.example/page")],
        "short_url string, long_url string",
    )
    got = sorted(r["url"] for r in expand_urls(df, mapping, "url").collect())
    assert got == ["https://keep.me/x", "https://long.example/page"]


def test_expansion_join_is_broadcast(spark):
    df = spark.createDataFrame([("u",)], "url string")
    mapping = spark.createDataFrame([("a", "b")], "short_url string, long_url string")
    plan = expand_urls(df, mapping)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.fixture()
def mini_fixture(spark, tmp_path):
    """3-page corpus: seed page links to a shortener; the mapping
    resolves it to page C (never linked directly)."""
    a = "https://site-a.example/start"
    b = "https://site-b.example/middle"
    c = "https://site-c.example/target"
    short = "https://sho.rt/abc"
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    pages = [
        (a, ts, spec.render_html("start page about data", 0, [short, b]), "start page about data", "en"),
        (b, ts, spec.render_html("middle page about data", 1, []), "middle page about data", "en"),
        (c, ts, spec.render_html("target page about data", 2, []), "target page about data", "en"),
    ]
    pdir = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(pdir)
    import json

    seeds = str(tmp_path / "seeds.json")
    with open(seeds, "w") as f:
        json.dump([a], f)
    robots = str(tmp_path / "robots.parquet")
    spark.createDataFrame([], "host string, disallow_prefix string").write.parquet(robots)
    hb = str(tmp_path / "host_budget.parquet")
    spark.createDataFrame(
        [("site-a.example", 5), ("site-b.example", 5), ("site-c.example", 5)],
        "host string, budget int",
    ).write.parquet(hb)
    exp = str(tmp_path / "url_expansions.parquet")
    spark.createDataFrame([(short, c)], "short_url string, long_url string").write.parquet(exp)
    return {
        "pages": pdir, "seeds": seeds, "robots": robots, "host_budget": hb,
        "url_expansions": exp, "_urls": (a, b, c),
    }


def test_crawl_expands_shortener_links(spark, tmp_path, mini_fixture):
    from storm_focused_crawler_spark import driver as drv

    a, b, c = mini_fixture.pop("_urls")
    cfg = drv.CrawlConfig(rounds=2, capacity=8, keywords=("data",))
    store = drv.run_crawl(spark, mini_fixture, cfg, str(tmp_path / "wd"))
    r0 = {r["url"] for r in store.read(spark, 0, "ordering").collect()}
    r1 = {r["url"] for r in store.read(spark, 1, "ordering").collect()}
    assert r0 == {a}
    # round 1 crawls BOTH the direct link and the expanded shortener target
    assert r1 == {b, c}


def test_crawl_without_mapping_leaves_shortener_unresolved(spark, tmp_path, mini_fixture):
    from storm_focused_crawler_spark import driver as drv

    a, b, c = mini_fixture.pop("_urls")
    mini_fixture.pop("url_expansions")
    cfg = drv.CrawlConfig(rounds=2, capacity=8, keywords=("data",))
    store = drv.run_crawl(spark, mini_fixture, cfg, str(tmp_path / "wd2"))
    # the raw shortener still gets SCHEDULED (it is a url like any other)
    # but fetches nothing, and c stays unreachable
    r1_sched = {r["url"] for r in store.read(spark, 1, "ordering").collect()}
    assert r1_sched == {b, "https://sho.rt/abc"}
    r1_fetched = {r["url"] for r in store.read(spark, 1, "results").collect()}
    assert r1_fetched == {b}


def test_close_mapping_chains_cycles_and_passthrough(spark):
    from storm_focused_crawler_spark.functions.udfs import close_mapping

    mapping = spark.createDataFrame(
        [
            ("https://s.rt/1", "https://s.rt/2"),   # chain hop 1
            ("https://s.rt/2", "https://long.example/a"),  # chain hop 2
            ("https://s.rt/x", "https://s.rt/y"),   # 2-cycle
            ("https://s.rt/y", "https://s.rt/x"),
            ("https://s.rt/solo", "https://long.example/b"),
        ],
        "short_url string, long_url string",
    )
    got = {r["short_url"]: r["long_url"] for r in close_mapping(mapping).collect()}
    assert got["https://s.rt/1"] == "https://long.example/a"  # chain closed
    assert got["https://s.rt/2"] == "https://long.example/a"
    assert got["https://s.rt/solo"] == "https://long.example/b"
    # cycles terminate deterministically at the last url before revisit
    assert got["https://s.rt/x"] in ("https://s.rt/x", "https://s.rt/y")
    assert got["https://s.rt/y"] in ("https://s.rt/x", "https://s.rt/y")


def test_crawl_resolves_chained_shorteners_same_round(spark, tmp_path, mini_fixture):
    """shortener → shortener → target must fully resolve at discovery
    (the mapping is closed at load), so the target is crawled the round
    after the page linking the first shortener — VERDICT r02 #7."""
    from storm_focused_crawler_spark import driver as drv

    a, b, c = mini_fixture.pop("_urls")
    # replace the single-hop mapping with a 2-hop chain to the target
    exp = str(tmp_path / "chained_exp.parquet")
    spark.createDataFrame(
        [("https://sho.rt/abc", "https://sho.rt/hop2"),
         ("https://sho.rt/hop2", c)],
        "short_url string, long_url string",
    ).write.parquet(exp)
    mini_fixture["url_expansions"] = exp
    cfg = drv.CrawlConfig(rounds=2, capacity=8, keywords=("data",))
    store = drv.run_crawl(spark, mini_fixture, cfg, str(tmp_path / "wd_chain"))
    r1 = {r["url"] for r in store.read(spark, 1, "ordering").collect()}
    assert r1 == {b, c}, r1  # the 2-hop chain resolved within 2 rounds
    r1_fetched = {r["url"] for r in store.read(spark, 1, "results").collect()}
    assert c in r1_fetched
