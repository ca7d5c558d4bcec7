"""RFC 9309 §2.2.1 user-agent group selection (VERDICT r03 'Next
round' #2): golden precedence cases on the python twin, lockstep of
the relational parse (operators/robots.parse_robots) with the twin,
and end-to-end crawl parity when the robots fixture carries raw
robots.txt bodies instead of pre-parsed rules."""

from __future__ import annotations

import shutil

import pytest

from storm_focused_crawler_spark.operators.robots import parse_robots, parse_robots_py

# (name, content, agent, expected [(prefix, allow)]) — written against
# RFC 9309 §2.2.1 (group selection) and §2.2.2 (rule parsing)
GOLDEN = [
    (
        "exact_beats_star",
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: focused-crawler\nDisallow: /mine\nAllow: /mine/pub",
        "focused-crawler",
        [("/mine", False), ("/mine/pub", True)],
    ),
    (
        "star_fallback_when_no_exact",
        "User-agent: otherbot\nDisallow: /other\n\n"
        "User-agent: *\nDisallow: /star",
        "focused-crawler",
        [("/star", False)],
    ),
    (
        "groups_with_same_token_merge",
        "User-agent: focused-crawler\nDisallow: /a\n\n"
        "User-agent: focused-crawler\nDisallow: /b",
        "focused-crawler",
        [("/a", False), ("/b", False)],
    ),
    (
        "multi_ua_run_shares_rules",
        "User-agent: abot\nUser-agent: focused-crawler\nUser-agent: bbot\n"
        "Disallow: /shared",
        "focused-crawler",
        [("/shared", False)],
    ),
    (
        "case_insensitive_token_and_directives",
        "USER-AGENT: Focused-Crawler\nDISALLOW: /up\nallow: /up/ok",
        "FOCUSED-CRAWLER",
        [("/up", False), ("/up/ok", True)],
    ),
    (
        "rules_before_any_group_ignored",
        "Disallow: /stray\nUser-agent: *\nDisallow: /real",
        "focused-crawler",
        [("/real", False)],
    ),
    (
        "comments_and_blanks_do_not_split_a_ua_run",
        "User-agent: abot\n# comment\n\nUser-agent: focused-crawler\n"
        "Disallow: /joint",
        "focused-crawler",
        [("/joint", False)],
    ),
    (
        "rule_line_closes_the_run",
        # the empty-value Disallow IS a rule: it closes abot's run, so
        # the focused-crawler group that follows is separate — and the
        # empty prefix itself is dropped (allow-all in REP)
        "User-agent: abot\nDisallow:\nUser-agent: focused-crawler\n"
        "Disallow: /sep",
        "focused-crawler",
        [("/sep", False)],
    ),
    (
        "no_space_after_colon",
        "User-agent:focused-crawler\nDisallow:/tight",
        "focused-crawler",
        [("/tight", False)],
    ),
    (
        "unknown_directives_ignored_entirely",
        # Sitemap is unknown (ignored entirely); Crawl-delay is KNOWN
        # since r4 (kept for run structure + delay extraction) but never
        # becomes a rule — either way the Disallow still binds
        "User-agent: focused-crawler\nCrawl-delay: 10\nSitemap: http://x/s.xml\n"
        "Disallow: /after-unknown",
        "focused-crawler",
        [("/after-unknown", False)],
    ),
    (
        "no_matching_group_at_all",
        "User-agent: otherbot\nDisallow: /other",
        "focused-crawler",
        [],
    ),
    (
        "star_group_not_merged_when_exact_exists",
        "User-agent: focused-crawler\nUser-agent: *\nDisallow: /both\n\n"
        "User-agent: *\nDisallow: /staronly",
        "focused-crawler",
        [("/both", False)],
    ),
]


@pytest.mark.parametrize("name,content,agent,want", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_parse_robots_py_golden(name, content, agent, want):
    assert parse_robots_py(content, agent) == want


def test_relational_parse_matches_python_twin(spark):
    """The Spark window-plan parse and the python twin agree rule-for-
    rule on every golden body (same host key, set equality — the
    evaluator's fold is order-independent)."""
    rows = [(g[0], g[1]) for g in GOLDEN]
    df = spark.createDataFrame(rows, "host string, content string")
    got = parse_robots(df, "focused-crawler").collect()
    by_host: dict[str, set] = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add((r["prefix"], r["allow"]))
    for name, content, agent, want in GOLDEN:
        if agent.lower() != "focused-crawler":
            continue  # relational run used one agent for all hosts
        assert by_host.get(name, set()) == set(want), name


def test_crawl_parity_with_raw_robots_bodies(spark, tmp_path):
    """End-to-end: a crawl whose robots fixture is raw (host, content)
    robots.txt bodies — decoy group for another bot, real rules under
    'Focused-Crawler' or '*' — produces EXACTLY the oracle's ordering
    and seen set (engine parses relationally, oracle via
    parse_robots_py), and matches a control run on the equivalent
    pre-parsed rule table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storm_focused_crawler_spark import driver as drv
    from storm_focused_crawler_spark.fixtures import gen_pages
    from storm_focused_crawler_spark.oracle import seqcrawler as sq

    sf_dir = "/root/testdata/sf0.001"
    paths = gen_pages.ensure(sf_dir)
    legacy = pq.read_table(paths["robots"])
    hosts = legacy.column("host").to_pylist()
    prefixes = legacy.column("disallow_prefix").to_pylist()
    contents = []
    for i, (h, p) in enumerate(zip(hosts, prefixes)):
        group = (
            "User-agent: Focused-Crawler" if i % 2 == 0 else "User-agent: *"
        )
        contents.append(
            "User-agent: NoSuchBot\nDisallow: /\n\n"
            f"{group}\nDisallow: {p}\n"
        )
    raw_path = str(tmp_path / "robots_txt.parquet")
    pq.write_table(
        pa.table({"host": pa.array(hosts, pa.string()),
                  "content": pa.array(contents, pa.string())}),
        raw_path,
    )
    raw_paths = dict(paths, robots=raw_path)

    cfg = drv.CrawlConfig(
        rounds=2, capacity=64, keywords=tuple(gen_pages.topic_keywords())
    )
    wd_raw = str(tmp_path / "wd_raw")
    wd_ctl = str(tmp_path / "wd_ctl")
    shutil.rmtree(wd_raw, ignore_errors=True)
    shutil.rmtree(wd_ctl, ignore_errors=True)
    store_raw = drv.run_crawl(spark, raw_paths, cfg, wd_raw)
    store_ctl = drv.run_crawl(spark, paths, cfg, wd_ctl)

    def ordering(store):
        out = []
        for r in range(cfg.rounds):
            out += sorted(
                (x["round"], x["seq"], x["url"])
                for x in store.read(spark, r, "ordering").collect()
            )
        return out

    # the decoy group must not change verdicts: raw == pre-parsed control
    assert ordering(store_raw) == ordering(store_ctl)

    # and both equal the sequential oracle parsing the RAW bodies
    pages, seeds, robots, budgets = sq.load_fixture_inputs(
        raw_paths, user_agent=cfg.user_agent
    )
    res = sq.crawl(
        pages, seeds, robots, budgets,
        sq.CrawlConfig(rounds=2, capacity=64,
                       keywords=tuple(gen_pages.topic_keywords())),
    )
    assert ordering(store_raw) == sorted(res.ordering)
    got_seen = {
        x["url_hash"]
        for x in store_raw.read_union(spark, cfg.rounds - 1, "seen").collect()
    }
    assert got_seen == res.seen_hashes


# ---------------------------------------------------------------------------
# Crawl-delay directive (the politeness extension) — selected-group only
# ---------------------------------------------------------------------------

DELAY_GOLDEN = [
    (
        "delay_from_exact_group",
        "User-agent: *\nCrawl-delay: 9\n\n"
        "User-agent: focused-crawler\nDisallow: /x\nCrawl-delay: 2.5",
        2500,
    ),
    (
        "delay_star_fallback",
        "User-agent: otherbot\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 4",
        4000,
    ),
    (
        "delay_absent_in_selected_group",
        "User-agent: otherbot\nCrawl-delay: 7\n\nUser-agent: focused-crawler\nDisallow: /x",
        None,
    ),
    (
        "delay_max_merged_across_selected_groups",
        "User-agent: focused-crawler\nCrawl-delay: 1.5\n\n"
        "User-agent: focused-crawler\nCrawl-delay: 3",
        3000,
    ),
    (
        "delay_closes_a_ua_run",
        # the Crawl-delay after abot closes its run, so focused-crawler
        # starts a NEW group whose delay is the one that applies
        "User-agent: abot\nCrawl-delay: 60\nUser-agent: focused-crawler\n"
        "Crawl-delay: 2\nDisallow: /y",
        2000,
    ),
    ("delay_no_groups_at_all", "Crawl-delay: 5\nDisallow: /x", None),
]


@pytest.mark.parametrize(
    "name,content,want", DELAY_GOLDEN, ids=[g[0] for g in DELAY_GOLDEN]
)
def test_parse_crawl_delay_py_golden(name, content, want):
    from storm_focused_crawler_spark.operators.robots import parse_crawl_delay_py

    assert parse_crawl_delay_py(content, "focused-crawler") == want


def test_relational_crawl_delays_match_python_twin(spark):
    from storm_focused_crawler_spark.operators.robots import (
        parse_crawl_delay_py,
        parse_crawl_delays,
    )

    rows = [(g[0], g[1]) for g in DELAY_GOLDEN]
    df = spark.createDataFrame(rows, "host string, content string")
    got = {r["host"]: r["delay_ms"]
           for r in parse_crawl_delays(df, "focused-crawler").collect()}
    for name, content, want in DELAY_GOLDEN:
        assert got.get(name) == want, name


def test_crawl_parity_with_robots_crawl_delay(spark, tmp_path):
    """Raw robots bodies carrying a BINDING Crawl-delay: the engine
    merges it into the dequeue's interval cap; the oracle loads the
    identical intervals via load_intervals(+parse_crawl_delay_py) —
    ordering and seen parity over 3 rounds, and at least one host is
    actually capped below its budget by the robots-declared delay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storm_focused_crawler_spark import driver as drv
    from storm_focused_crawler_spark.fixtures import gen_pages
    from storm_focused_crawler_spark.oracle import seqcrawler as sq

    paths = gen_pages.ensure("/root/testdata/sf0.001")
    legacy = pq.read_table(paths["robots"])
    hosts = legacy.column("host").to_pylist()
    prefixes = legacy.column("disallow_prefix").to_pylist()
    # 25s delay → cap ceil(60s/25s)=3 < budget for budget-4/5 hosts
    contents = [
        "User-agent: NoSuchBot\nDisallow: /\n\n"
        f"User-agent: Focused-Crawler\nDisallow: {p}\nCrawl-delay: 25\n"
        for p in prefixes
    ]
    raw_path = str(tmp_path / "robots_delay.parquet")
    pq.write_table(
        pa.table({"host": pa.array(hosts, pa.string()),
                  "content": pa.array(contents, pa.string())}),
        raw_path,
    )
    raw_paths = dict(paths, robots=raw_path)
    cfg = drv.CrawlConfig(
        rounds=3, capacity=64, keywords=tuple(gen_pages.topic_keywords())
    )
    wd = str(tmp_path / "wd_delay")
    shutil.rmtree(wd, ignore_errors=True)
    store = drv.run_crawl(spark, raw_paths, cfg, wd)

    pages, seeds, robots, budgets = sq.load_fixture_inputs(
        raw_paths, user_agent=cfg.user_agent
    )
    intervals = sq.load_intervals(raw_paths, user_agent=cfg.user_agent)
    assert intervals and all(v == 25_000 for v in intervals.values())
    assert any(
        budgets.get(h, 2) > 3 for h in intervals
    ), "no robots-delayed host has budget > cap — fixture too weak"
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


def test_parse_crawl_delay_registry_op(spark):
    """Registry op: each robot body carries a per-robot Crawl-delay
    (0.5/1/2.5/3 s by robot_id % 4) in the real group plus a decoy 9 s
    in the OtherBot group — only the real group's value survives."""
    import __spark_entry__ as e

    rows = e.queries()["parse_crawl_delay"](spark, "/root/testdata/sf0.001").collect()
    want = {rid: {0: 500, 1: 1000, 2: 2500, 3: 3000}[rid % 4] for rid in range(7)}
    assert {int(r["robot_id"]): r["delay_ms"] for r in rows} == want


def test_crawl_delay_applies_to_host_missing_from_budget_table(spark, tmp_path):
    """The robots-delay merge is a FULL outer join: a host that appears
    only via its robots Crawl-delay (absent from host_budget) still
    gets the interval cap, with its budget defaulting — parity with the
    oracle, which merges intervals independently of budget membership."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storm_focused_crawler_spark import driver as drv
    from storm_focused_crawler_spark.fixtures import gen_pages
    from storm_focused_crawler_spark.oracle import seqcrawler as sq

    paths = gen_pages.ensure("/root/testdata/sf0.001")
    hb = pq.read_table(paths["host_budget"])
    hosts = hb.column("host").to_pylist()
    budgets_l = hb.column("budget").to_pylist()
    dropped = set(hosts[::3])  # these become budget-less delay hosts
    keep = [(h, b) for h, b in zip(hosts, budgets_l) if h not in dropped]
    hb_path = str(tmp_path / "hb_missing.parquet")
    pq.write_table(
        pa.table({"host": pa.array([h for h, _ in keep], pa.string()),
                  "budget": pa.array([b for _, b in keep], pa.int32())}),
        hb_path,
    )
    robots_path = str(tmp_path / "rb_delay_only.parquet")
    pq.write_table(
        pa.table({
            "host": pa.array(sorted(dropped), pa.string()),
            "content": pa.array(
                ["User-agent: *\nCrawl-delay: 45\n"] * len(dropped), pa.string()
            ),
        }),
        robots_path,
    )
    raw_paths = dict(paths, host_budget=hb_path, robots=robots_path)
    cfg = drv.CrawlConfig(
        rounds=2, capacity=64, keywords=tuple(gen_pages.topic_keywords())
    )
    wd = str(tmp_path / "wd_missing")
    shutil.rmtree(wd, ignore_errors=True)
    store = drv.run_crawl(spark, raw_paths, cfg, wd)

    pages, seeds, robots, budgets = sq.load_fixture_inputs(
        raw_paths, user_agent=cfg.user_agent
    )
    intervals = sq.load_intervals(raw_paths, user_agent=cfg.user_agent)
    assert set(intervals) == dropped and all(v == 45_000 for v in intervals.values())
    res = sq.crawl(
        pages, seeds, robots, budgets,
        sq.CrawlConfig(rounds=2, capacity=64,
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
    # the cap actually binds somewhere: 45s in a 60s round → 2 max;
    # a dropped host defaults to budget 2, so assert <= 2 per round
    from collections import Counter

    for r in range(cfg.rounds):
        per = Counter(
            x["url"].split("://", 1)[1].partition("/")[0]
            for x in store.read(spark, r, "ordering").collect()
        )
        for h in dropped & set(per):
            assert per[h] <= 2, (h, per[h])


# ---------------------------------------------------------------------------
# fuzz: relational parse == python twin on randomized bodies
# ---------------------------------------------------------------------------


def _random_bodies(n=80, lines_max=14, seed=7):
    """Deterministic random robots.txt bodies mixing every line class
    the grammar distinguishes (UA runs, rules, delays, empty values,
    comments, unknown directives, garbage, mixed case, no-space)."""
    import random

    rng = random.Random(seed)
    uas = ["focused-crawler", "FOCUSED-Crawler", "otherbot", "*", "x-bot", "a b"]
    prefixes = ["", "/", "/a", "/a/b", "/private", "/p q"]
    delays = ["1", "2.5", "0", "10.0", "nope"]
    other = ["", "# comment", "Sitemap: http://x/s.xml", "garbage",
             "  Disallow: /indented", "User-agent:", "Crawl-delay:"]

    def line():
        k = rng.randrange(5)
        if k == 0:
            return f"User-agent:{rng.choice([' ', ''])}{rng.choice(uas)}"
        if k == 1:
            return f"{rng.choice(['Disallow', 'disallow', 'DISALLOW'])}:" \
                   f"{rng.choice([' ', ''])}{rng.choice(prefixes)}"
        if k == 2:
            return f"{rng.choice(['Allow', 'allow'])}:{rng.choice([' ', ''])}" \
                   f"{rng.choice(prefixes)}"
        if k == 3:
            return f"Crawl-delay:{rng.choice([' ', ''])}{rng.choice(delays)}"
        return rng.choice(other)

    return [
        "\n".join(line() for _ in range(rng.randrange(lines_max)))
        for _ in range(n)
    ]


def test_fuzz_relational_parse_matches_python_twin(spark):
    """80 randomized bodies, ONE Spark job per parser: the relational
    rules and delays must equal the python twins' on every body — the
    three-implementation lockstep (Spark / python / DuckDB share the
    grammar) holds beyond the hand-written goldens."""
    from storm_focused_crawler_spark.operators.robots import (
        parse_crawl_delay_py,
        parse_crawl_delays,
    )

    bodies = _random_bodies()
    rows = [(f"h{i:03d}", b) for i, b in enumerate(bodies)]
    df = spark.createDataFrame(rows, "host string, content string")

    got_rules: dict[str, set] = {}
    for r in parse_robots(df, "focused-crawler").collect():
        got_rules.setdefault(r["host"], set()).add((r["prefix"], r["allow"]))
    got_delays = {
        r["host"]: r["delay_ms"]
        for r in parse_crawl_delays(df, "focused-crawler").collect()
    }
    for h, body in rows:
        want_rules = set(parse_robots_py(body, "focused-crawler"))
        assert got_rules.get(h, set()) == want_rules, (h, body)
        want_delay = parse_crawl_delay_py(body, "focused-crawler")
        assert got_delays.get(h) == want_delay, (h, body)


def test_parser_total_on_arbitrary_text():
    """The python twin is total: any text in, no crash, list out —
    hypothesis-driven over arbitrary unicode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from storm_focused_crawler_spark.operators.robots import parse_crawl_delay_py

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300), st.text(min_size=1, max_size=20))
    def check(content, agent):
        out = parse_robots_py(content, agent)
        assert isinstance(out, list)
        d = parse_crawl_delay_py(content, agent)
        assert d is None or (isinstance(d, int) and d >= 0)

    check()
