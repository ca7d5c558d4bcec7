"""Per-host crawl-delay (VERDICT r03 'Next round' #3): host_budget's
``min_interval_ms`` caps a host's per-round budget at
ceil(round_ms / interval) with politeness-spaced ``sched_ms`` offsets
— enforced in the batch dequeue (operators/frontier.dequeue), the
sequential oracle (oracle/seqcrawler), and the streaming token bucket
(streaming/live.politeness_limit_stream), all integer-exact twins."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark import driver as drv
from storm_focused_crawler_spark.fixtures import gen_pages
from storm_focused_crawler_spark.operators.frontier import dequeue
from storm_focused_crawler_spark.oracle import seqcrawler as sq

ROUND_MS = 60_000


def _ceil(a: int, b: int) -> int:
    return (a + b - 1) // b


def test_dequeue_interval_caps_and_sched_ms(spark):
    """Engine dequeue vs a direct python computation: per-host counts
    equal min(budget, ceil(round_ms/interval)), picks are the per-host
    (score desc, url asc) top so capped, and sched_ms spaces them
    interval ms apart (0 for no-delay hosts)."""
    rows = [
        (f"https://h{i % 5}.ex/p{i:03d}", float((i * 7) % 13), i)
        for i in range(60)
    ]
    elig = spark.createDataFrame(
        [(u, hash(u) % (1 << 60), s, 0, u.split("/")[2]) for u, s, _ in rows],
        "url string, url_hash long, score double, depth int, host string",
    )
    hb = spark.createDataFrame(
        [
            ("h0.ex", 5, 15_000),   # icap 4 < budget 5 → capped at 4
            ("h1.ex", 3, 40_000),   # icap 2 < budget 3 → capped at 2
            ("h2.ex", 4, 70_000),   # icap 1 → single fetch this round
            ("h3.ex", 2, None),     # no delay → budget 2
            # h4.ex missing → DEFAULT_BUDGET 2, no delay
        ],
        "host string, budget int, min_interval_ms int",
    )
    got = dequeue(elig, hb, capacity=100, n_salts=4, round_ms=ROUND_MS).collect()
    by_host: dict[str, list] = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    want_counts = {"h0.ex": 4, "h1.ex": 2, "h2.ex": 1, "h3.ex": 2, "h4.ex": 2}
    assert {h: len(v) for h, v in by_host.items()} == want_counts
    intervals = {"h0.ex": 15_000, "h1.ex": 40_000, "h2.ex": 70_000}
    for host, hr in by_host.items():
        hr.sort(key=lambda r: (-r["score"], r["url"]))
        i = intervals.get(host, 0)
        assert [r["sched_ms"] for r in hr] == [k * i for k in range(len(hr))], host
        # picks are the host's global (score desc, url asc) top-cap
        all_host = sorted(
            (r for r in rows if r[0].split("/")[2] == host),
            key=lambda t: (-t[1], t[0]),
        )
        assert [r["url"] for r in hr] == [t[0] for t in all_host[: len(hr)]]


@pytest.fixture(scope="module")
def delayed_paths(tmp_path_factory):
    """Fixture variant: host_budget gains a mixed min_interval_ms column
    (binding caps on ~2/3 of hosts, null on the rest)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = gen_pages.ensure("/root/testdata/sf0.001")
    hb = pq.read_table(paths["host_budget"])
    hosts = hb.column("host").to_pylist()
    budgets = hb.column("budget").to_pylist()
    ivals = []
    for i, _h in enumerate(hosts):
        ivals.append([15_000, 40_000, None][i % 3])
    d = tmp_path_factory.mktemp("delay_fix")
    out = str(d / "host_budget.parquet")
    pq.write_table(
        pa.table({
            "host": pa.array(hosts, pa.string()),
            "budget": pa.array(budgets, pa.int32()),
            "min_interval_ms": pa.array(ivals, pa.int32()),
        }),
        out,
    )
    return dict(paths, host_budget=out)


def test_crawl_parity_with_mixed_budgets_and_delays(spark, delayed_paths, tmp_path):
    """Full crawl parity — ordering rows and seen set — against the
    sequential oracle when most hosts carry a binding crawl-delay."""
    cfg = drv.CrawlConfig(
        rounds=3, capacity=64, keywords=tuple(gen_pages.topic_keywords())
    )
    wd = str(tmp_path / f"wd_{uuid.uuid4().hex[:6]}")
    shutil.rmtree(wd, ignore_errors=True)
    store = drv.run_crawl(spark, delayed_paths, cfg, wd)

    pages, seeds, robots, budgets = sq.load_fixture_inputs(delayed_paths)
    intervals = sq.load_intervals(delayed_paths)
    assert intervals  # the variant actually carries delays
    res = sq.crawl(
        pages, seeds, robots, budgets,
        sq.CrawlConfig(rounds=3, capacity=64,
                       keywords=tuple(gen_pages.topic_keywords())),
        intervals=intervals,
    )
    got = []
    for r in range(cfg.rounds):
        got += sorted(
            (x["round"], x["seq"], x["url"])
            for x in store.read(spark, r, "ordering").collect()
        )
    assert got == sorted(res.ordering)
    got_seen = {
        x["url_hash"]
        for x in store.read_union(spark, cfg.rounds - 1, "seen").collect()
    }
    assert got_seen == res.seen_hashes
    # the delays actually BIND: some host hit its interval cap below its
    # budget (otherwise this test proves nothing)
    from storm_focused_crawler_spark.functions.udfs import host_col

    deq_hosts = (
        store.read(spark, 0, "ordering")
        .select(host_col(F.col("url")).alias("host"))
        .groupBy("host").count().collect()
    )
    capped = [
        r for r in deq_hosts
        if intervals.get(r["host"])
        and _ceil(ROUND_MS, intervals[r["host"]]) < budgets.get(r["host"], 2)
    ]
    assert capped, "no host had a binding interval cap — fixture too weak"


def test_streaming_token_bucket_interval_cap(spark, tmp_path):
    """politeness_limit_stream with min_interval_ms: each micro-batch
    (one round_ms window) emits at most ceil(round_ms/interval) urls per
    host, while the lifetime budget keeps counting across batches."""
    feed = str(tmp_path / "feed_delay")
    b0 = [(f"https://h{i % 2}.ex/a{i:02d}",) for i in range(10)]
    b1 = [(f"https://h{i % 2}.ex/b{i:02d}",) for i in range(10)]
    spark.createDataFrame(b0, "url string").coalesce(1).write.parquet(
        os.path.join(feed, "b0")
    )
    spark.createDataFrame(b1, "url string").coalesce(1).write.parquet(
        os.path.join(feed, "b1")
    )
    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    from storm_focused_crawler_spark.streaming import live

    # budget 5 per host lifetime; interval 25s in a 60s round → icap 3
    name = f"delay_{uuid.uuid4().hex[:8]}"
    q = (
        live.politeness_limit_stream(
            stream, budget=5, min_interval_ms=25_000, round_ms=ROUND_MS
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        # batch 1: icap=3 admitted; batch 2: min(5-3, 3)=2 → 5 total,
        # never more than 3 from one batch (n_used encodes the order)
        assert len(hr) == 5, (host, len(hr))
        hr.sort(key=lambda r: r["n_used"])
        batch1 = [r["url"] for r in hr[:3]]
        assert all("/a" in u for u in batch1), batch1  # first window's files
        assert all("/b" in r["url"] for r in hr[3:])


def test_dequeue_crawl_delay_registry_op(spark):
    """The registry entry runs and respects its own caps."""
    import __spark_entry__ as e

    df = e.queries()["dequeue_crawl_delay"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    by_host: dict[str, int] = {}
    for r in rows:
        by_host[r["host"]] = by_host.get(r["host"], 0) + 1
    from storm_focused_crawler_spark import spec

    for host, n in by_host.items():
        signed = spec.xxh64(host)  # signed, = Spark's xxhash64; % is pmod
        budget = 2 + signed % 4
        m3 = signed % 3  # python % on positive modulus == Spark pmod
        icap = {0: _ceil(ROUND_MS, 15_000), 1: _ceil(ROUND_MS, 40_000)}.get(m3)
        cap = min(budget, icap) if icap else budget
        assert n <= cap, (host, n, cap)
