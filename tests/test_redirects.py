"""Redirect-aware simulated fetch (VERDICT r04 'Next round' #5): a
fixture ``redirects`` table (url, final_url, status) adds 3xx hops.
Chains are closed once at load (bounded, cycle-safe), a dequeued url
fetches its LANDING page (charged to the original host's budget),
result rows carry the final url, both urls become seen, and a final
already seen — earlier round or lower seq this round — is never
fetched twice.  Engine (driver.run_round) and the sequential oracle
(oracle/seqcrawler) implement the identical semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F  # noqa: F401

from storm_focused_crawler_spark import spec
from storm_focused_crawler_spark import driver as drv
from storm_focused_crawler_spark.oracle import seqcrawler as sq

A = "https://site-a.example/start"
B = "https://site-b.example/middle"
C = "https://site-c.example/target"
SHORT = "https://redir-1.example/r1"      # → MID → C (2-hop chain)
MID = "https://redir-2.example/hop"
SHORT2 = "https://redir-3.example/r2"     # → C (same-round collision)
RS2 = "https://redir-4.example/back"      # → A (redirect to seen)


@pytest.fixture()
def redirect_fixture(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    pages = [
        (A, ts, spec.render_html("start page about data", 0, [SHORT, SHORT2, B]),
         "start page about data", "en"),
        (B, ts, spec.render_html("middle page about data", 1, [RS2]),
         "middle page about data", "en"),
        (C, ts, spec.render_html("target page about data", 2, []),
         "target page about data", "en"),
    ]
    pdir = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(pdir)
    seeds = str(tmp_path / "seeds.json")
    with open(seeds, "w") as f:
        json.dump([A], f)
    robots = str(tmp_path / "robots.parquet")
    spark.createDataFrame([], "host string, disallow_prefix string").write.parquet(robots)
    hb = str(tmp_path / "host_budget.parquet")
    spark.createDataFrame(
        [(u.split("/")[2], 5) for u in (A, B, C, SHORT, MID, SHORT2, RS2)],
        "host string, budget int",
    ).write.parquet(hb)
    rdir = str(tmp_path / "redirects.parquet")
    spark.createDataFrame(
        [
            (SHORT, MID, 301),     # hop 1 of the chain
            (MID, C, 302),         # hop 2
            (SHORT2, C, 301),      # second alias of C (same-round dup)
            (RS2, A, 308),         # redirect back to the seed
            ("https://x.example/not-a-redirect", "https://y.example/", 200),
        ],
        "url string, final_url string, status int",
    ).write.parquet(rdir)
    return {"pages": pdir, "seeds": seeds, "robots": robots,
            "host_budget": hb, "redirects": rdir}


def _oracle(paths, rounds):
    pages, seeds, robots, budgets = sq.load_fixture_inputs(paths)
    return sq.crawl(
        pages, seeds, robots, budgets,
        sq.CrawlConfig(rounds=rounds, capacity=16, keywords=("data",)),
        redirects=sq.load_redirects(paths),
    )


def test_load_redirects_closes_chains_and_drops_non_3xx(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "rd.parquet")
    pq.write_table(
        pa.table({
            "url": pa.array([SHORT, MID, "https://x.example/a", "https://cyc.example/1",
                             "https://cyc.example/2"]),
            "final_url": pa.array([MID, C, "https://y.example/b", "https://cyc.example/2",
                                   "https://cyc.example/1"]),
            "status": pa.array([301, 302, 200, 301, 301], pa.int32()),
        }),
        p,
    )
    closed = sq.load_redirects({"redirects": p})
    assert closed[spec.canon(SHORT)] == spec.canon(C)   # chain closed
    assert closed[spec.canon(MID)] == spec.canon(C)
    assert spec.canon("https://x.example/a") not in closed  # 200 dropped
    # cycles terminate deterministically (same rule as close_mapping)
    c1, c2 = spec.canon("https://cyc.example/1"), spec.canon("https://cyc.example/2")
    assert closed[c1] in (c1, c2) and closed[c2] in (c1, c2)
    assert sq.load_redirects({}) == {}


def test_crawl_follows_redirects_with_oracle_parity(spark, tmp_path, redirect_fixture):
    cfg = drv.CrawlConfig(rounds=3, capacity=16, keywords=("data",))
    store = drv.run_crawl(spark, redirect_fixture, cfg, str(tmp_path / "wd"))
    res = _oracle(redirect_fixture, 3)

    got_ord, got_res = [], []
    for r in range(3):
        got_ord += sorted(
            (x["round"], x["seq"], x["url"])
            for x in store.read(spark, r, "ordering").collect()
        )
        got_res += sorted(
            (x["round"], x["seq"], x["url"], x["text"])
            for x in store.read(spark, r, "results").collect()
        )
    assert got_ord == sorted(res.ordering)
    assert got_res == sorted((t[0], t[1], t[2], t[4]) for t in res.results)
    got_seen = {
        x["url_hash"] for x in store.read_union(spark, 2, "seen").collect()
    }
    assert got_seen == res.seen_hashes

    # the 2-hop chain resolved: C's content fetched exactly once, under
    # the FINAL url, even though TWO aliases were dequeued that round
    finals = [u for (_r, _s, u, _t) in got_res]
    assert finals.count(C) == 1
    # the landing page and both aliases are all seen
    for u in (C, SHORT, SHORT2, MID):
        pass  # MID was never dequeued; only fetched finals + emitted origs are seen
    assert spec.xxh64(C) in got_seen
    assert spec.xxh64(SHORT) in got_seen and spec.xxh64(SHORT2) in got_seen


def test_redirect_to_seen_never_double_fetches(spark, tmp_path, redirect_fixture):
    cfg = drv.CrawlConfig(rounds=3, capacity=16, keywords=("data",))
    store = drv.run_crawl(spark, redirect_fixture, cfg, str(tmp_path / "wd2"))
    # RS2 → A: A was fetched in round 0, so RS2's round is scheduled
    # (ordering row) but produces NO result row
    r2_ord = {x["url"] for x in store.read(spark, 2, "ordering").collect()}
    assert RS2 in r2_ord
    all_res = []
    for r in range(3):
        all_res += [x["url"] for x in store.read(spark, r, "results").collect()]
    assert all_res.count(A) == 1  # fetched exactly once, in round 0
    assert RS2 not in all_res     # the alias never appears as a result url
    # RS2 still becomes seen (emitted), so it is never re-dequeued
    got_seen = {
        x["url_hash"] for x in store.read_union(spark, 2, "seen").collect()
    }
    assert spec.xxh64(RS2) in got_seen


def test_url_redirect_resolve_matches_recursive_duckdb(spark, sf_dir):
    """Registry op vs an INDEPENDENT DuckDB WITH RECURSIVE closure."""
    import duckdb

    from storm_focused_crawler_spark.plans.queries import (
        URL_REDIRECT_ORACLE,
        url_redirect_resolve,
    )

    sdf = url_redirect_resolve(spark, sf_dir)
    got = sorted((r["raw_url"], r["final_url"]) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(URL_REDIRECT_ORACLE).fetchall()))
    assert got == want
    # the chains actually bind: some url resolved through TWO hops
    assert any(a != b for a, b in got)


def test_crawl_without_redirects_table_unchanged(spark, tmp_path, redirect_fixture):
    """Dropping the redirects key leaves the classic semantics: aliases
    are scheduled, fetch nothing (absent from the corpus), become seen."""
    paths = dict(redirect_fixture)
    paths.pop("redirects")
    cfg = drv.CrawlConfig(rounds=2, capacity=16, keywords=("data",))
    store = drv.run_crawl(spark, paths, cfg, str(tmp_path / "wd3"))
    res = sq.crawl(
        *sq.load_fixture_inputs(paths),
        sq.CrawlConfig(rounds=2, capacity=16, keywords=("data",)),
    )
    got = []
    for r in range(2):
        got += sorted(
            (x["round"], x["seq"], x["url"])
            for x in store.read(spark, r, "ordering").collect()
        )
    assert got == sorted(res.ordering)
    r1_res = {x["url"] for x in store.read(spark, 1, "results").collect()}
    assert r1_res == {B}  # aliases miss; only the direct link fetches
