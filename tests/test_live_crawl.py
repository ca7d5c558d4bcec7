"""End-to-end continuous crawl (streaming/live.live_crawl_generation):
the reference's always-on topology as chained checkpointed streaming
queries with a link feedback loop.  Asserts the crawl invariants the
batch engine proves by oracle parity — exactly-once fetch across
generations, per-host lifetime budget, byte-identical extracted text —
plus the feedback edge (links found in generation 1 are crawled in
generation 2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark import spec
from storm_focused_crawler_spark.fixtures import gen_pages
from storm_focused_crawler_spark.streaming import live

BUDGET = 3
N_SHARDS = 4


@pytest.fixture(scope="module")
def fixture_paths(sf_dir):
    return gen_pages.ensure(sf_dir)


def _results(spark, workdir):
    p = os.path.join(workdir, "results")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def test_live_crawl_generations(spark, fixture_paths, tmp_path):
    corpus = spark.read.parquet(fixture_paths["pages"])
    frontier_dir = str(tmp_path / "frontier_in")
    workdir = str(tmp_path / "live_wd")
    with open(fixture_paths["seeds"]) as f:
        seeds = sorted({spec.canon(u) for u in json.load(f)})
    spark.createDataFrame([(u,) for u in seeds], "url string").write.parquet(
        frontier_dir
    )
    kw = list(gen_pages.topic_keywords())

    live.live_crawl_generation(
        spark, corpus, frontier_dir, workdir, kw,
        budget_per_host=BUDGET, n_shards=N_SHARDS,
    )
    r1 = _results(spark, workdir)
    assert r1 is not None and r1.count() > 0
    rows1 = r1.collect()
    urls1 = {r["url"] for r in rows1}
    # everything fetched is a seed this generation (links only land in
    # the frontier for the NEXT generation) and exists in the corpus
    assert urls1 <= set(seeds)

    live.live_crawl_generation(
        spark, corpus, frontier_dir, workdir, kw,
        budget_per_host=BUDGET, n_shards=N_SHARDS,
    )
    r_all = _results(spark, workdir)
    rows_all = r_all.collect()
    urls_all = [r["url"] for r in rows_all]

    # exactly-once across generations: checkpointed seen state means no
    # url is ever fetched twice, even though generation 2 re-reads
    # nothing and seeds+links overlap
    assert len(urls_all) == len(set(urls_all))
    # the feedback edge worked: generation 2 fetched NEW (link-
    # discovered, non-seed) urls
    new_urls = set(urls_all) - urls1
    assert new_urls, "generation 2 crawled nothing — feedback loop broken"
    assert any(u not in set(seeds) for u in new_urls)

    # byte-identical extracted text per url vs the corpus' as-of-latest
    # capture, re-extracted by the same pure column expression
    from storm_focused_crawler_spark.functions.udfs import extract_text_col
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    expect = {
        r["url"]: r["tx"]
        for r in corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("url").isin(list(set(urls_all))))
        .select("url", extract_text_col(F.col("html")).alias("tx"))
        .collect()
    }
    for r in rows_all:
        assert r["text"].encode() == expect[r["url"]].encode(), r["url"]

    # per-host lifetime budget holds across BOTH generations
    from storm_focused_crawler_spark.functions.udfs import host_col

    per_host = (
        r_all.select(host_col(F.col("url")).alias("host"))
        .groupBy("host")
        .count()
        .collect()
    )
    assert per_host and all(row["count"] <= BUDGET for row in per_host), per_host


def test_live_crawl_generation_idempotent_when_drained(
    spark, fixture_paths, tmp_path
):
    """A generation over an already-drained frontier fetches nothing
    new (availableNow + checkpoints = safe to re-trigger on a timer)."""
    corpus = spark.read.parquet(fixture_paths["pages"])
    frontier_dir = str(tmp_path / "frontier_in2")
    workdir = str(tmp_path / "live_wd2")
    with open(fixture_paths["seeds"]) as f:
        seeds = sorted({spec.canon(u) for u in json.load(f)})[:5]
    spark.createDataFrame([(u,) for u in seeds], "url string").write.parquet(
        frontier_dir
    )
    kw = list(gen_pages.topic_keywords())
    for _ in range(2):
        live.live_crawl_generation(
            spark, corpus, frontier_dir, workdir, kw,
            budget_per_host=BUDGET, n_shards=N_SHARDS,
        )
    n_after_2 = _results(spark, workdir).count()
    # drain: run generations until the frontier stops producing new work
    for _ in range(6):
        live.live_crawl_generation(
            spark, corpus, frontier_dir, workdir, kw,
            budget_per_host=BUDGET, n_shards=N_SHARDS,
        )
    drained = _results(spark, workdir).count()
    live.live_crawl_generation(
        spark, corpus, frontier_dir, workdir, kw,
        budget_per_host=BUDGET, n_shards=N_SHARDS,
    )
    assert _results(spark, workdir).count() == drained
    assert drained >= n_after_2
    # exactly-once still holds over the whole run
    urls = [r["url"] for r in _results(spark, workdir).collect()]
    assert len(urls) == len(set(urls))


def test_live_crawl_exactly_once_across_processes(fixture_paths, tmp_path):
    """The exactly-once guarantee must survive a PROCESS restart (the
    checkpoint claim, not just same-session state): two separate
    driver processes each run one generation against the same workdir;
    the second crawls only generation-1's discovered links, and no url
    is ever fetched twice."""
    import subprocess
    import sys

    wd = str(tmp_path / "xproc")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    outs = []
    for _ in range(2):
        r = subprocess.run(
            [sys.executable, "/root/repo/jobs/live.py",
             "--sf-dir", os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"),
             "--workdir", wd, "--generations", "1",
             "--budget-per-host", str(BUDGET), "--n-shards", str(N_SHARDS)],
            capture_output=True, text=True, timeout=420, env=env, check=True,
        )
        outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    # second process made progress (crawled the links the first found)
    assert outs[1]["results_rows"] > outs[0]["results_rows"]
    # and never refetched: rows stay distinct across both processes
    assert outs[1]["results_rows"] == outs[1]["distinct_urls"]


def test_fetch_batch_replay_is_idempotent(spark, fixture_paths, tmp_path):
    """ADVICE r03 #3 regression: foreachBatch replays a batch when the
    process dies between the sink write and the checkpoint commit.
    Replaying the SAME (batch_df, batch_id) must leave the results
    table unchanged (dynamic partition overwrite of its own batch_id
    partition), and the duplicated link file must not produce a second
    crawl (Q1's seen filter dedups) — asserted here on the results
    rows, the real exactly-once surface."""
    corpus = spark.read.parquet(fixture_paths["pages"])
    frontier_dir = str(tmp_path / "replay_frontier")
    results_dir = str(tmp_path / "replay_results")
    os.makedirs(frontier_dir, exist_ok=True)
    with open(fixture_paths["seeds"]) as f:
        seeds = sorted({spec.canon(u) for u in json.load(f)})[:6]
    kw = list(gen_pages.topic_keywords())
    fetch_batch = live.make_fetch_batch(corpus, kw, results_dir, frontier_dir)
    batch_df = spark.createDataFrame([(u,) for u in seeds], "url string")

    fetch_batch(batch_df, 7)
    once = sorted(
        (r["batch_id"], r["url"], r["text"])
        for r in spark.read.parquet(results_dir).collect()
    )
    assert once
    fetch_batch(batch_df, 7)  # the replay
    twice = sorted(
        (r["batch_id"], r["url"], r["text"])
        for r in spark.read.parquet(results_dir).collect()
    )
    assert twice == once  # no duplicate rows, same content
    # a replay of a DIFFERENT batch id appends, not overwrites
    fetch_batch(batch_df.limit(2), 8)
    n = spark.read.parquet(results_dir).count()
    assert n == len(once) + 2


def test_live_crawl_respects_robots(spark, fixture_paths, tmp_path):
    """The continuous topology enforces REP like the batch engine:
    robots-blocked urls are never fetched, never consume politeness
    budget, and are NOT marked seen (filtered before the seen state, so
    a later policy change could admit them)."""
    corpus = spark.read.parquet(fixture_paths["pages"])
    frontier_dir = str(tmp_path / "rb_frontier")
    workdir = str(tmp_path / "rb_wd")
    with open(fixture_paths["seeds"]) as f:
        seeds = sorted({spec.canon(u) for u in json.load(f)})
    spark.createDataFrame([(u,) for u in seeds], "url string").write.parquet(
        frontier_dir
    )
    kw = list(gen_pages.topic_keywords())

    # raw robots bodies: block every /d-prefixed path (all fixture
    # paths are /d<id>/p<j>) on half the seed hosts, decoy group on top
    hosts = sorted({u.split("://", 1)[1].partition("/")[0] for u in seeds})
    blocked_hosts = set(hosts[::2])
    import pyarrow as pa
    import pyarrow.parquet as pq

    robots_path = str(tmp_path / "rb_robots.parquet")
    pq.write_table(
        pa.table({
            "host": pa.array(sorted(blocked_hosts), pa.string()),
            "content": pa.array(
                ["User-agent: NoSuchBot\nAllow: /\n\n"
                 "User-agent: Focused-Crawler\nDisallow: /d"
                 ] * len(blocked_hosts), pa.string()),
        }),
        robots_path,
    )
    robots = spark.read.parquet(robots_path)

    for _ in range(2):
        live.live_crawl_generation(
            spark, corpus, frontier_dir, workdir, kw,
            budget_per_host=BUDGET, n_shards=N_SHARDS,
            robots=robots, user_agent="focused-crawler",
        )
    rows = _results(spark, workdir).collect()
    assert rows
    got_hosts = {r["url"].split("://", 1)[1].partition("/")[0] for r in rows}
    assert not (got_hosts & blocked_hosts), got_hosts & blocked_hosts
    # blocked urls are NOT in the seen state: the unseen/ dir (Q1's
    # output = everything admitted into seen) contains no blocked host
    import os

    unseen = spark.read.parquet(os.path.join(workdir, "unseen")).collect()
    unseen_hosts = {r["url"].split("://", 1)[1].partition("/")[0] for r in unseen}
    assert not (unseen_hosts & blocked_hosts)
    # and budgets still hold on the allowed hosts
    per_host: dict[str, int] = {}
    for r in rows:
        h = r["url"].split("://", 1)[1].partition("/")[0]
        per_host[h] = per_host.get(h, 0) + 1
    assert all(n <= BUDGET for n in per_host.values()), per_host
