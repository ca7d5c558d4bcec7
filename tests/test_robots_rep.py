"""REP longest-match + Allow semantics (VERDICT r02 'What's missing' #4).

operators/robots.rep_allowed and the oracle's _blocked are twins of the
public REP precedence rules (RFC 9309 §2.2.2): longest matching prefix
wins, Allow wins a length tie, no match ⇒ allowed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators import robots as RB
from storm_focused_crawler_spark.oracle.seqcrawler import _blocked

# (rules per host, path, expected allowed)
GOLDEN = [
    # Allow overrides shorter Disallow
    ([("/a", False), ("/a/b", True)], "/a/b/c", True),
    ([("/a", False), ("/a/b", True)], "/a/x", False),
    # Disallow overrides shorter Allow
    ([("/a", True), ("/a/b", False)], "/a/b/c", False),
    ([("/a", True), ("/a/b", False)], "/a/x", True),
    # same-length tie → Allow wins
    ([("/a/b", False), ("/a/b", True)], "/a/b", True),
    # no matching rule → allowed
    ([("/x", False)], "/a", True),
    # no rules for host at all → allowed
    ([], "/anything", True),
    # single Disallow (legacy behavior preserved)
    ([("/priv", False)], "/priv/x", False),
    ([("/priv", False)], "/pub", True),
    # three-deep alternation
    ([("/a", False), ("/a/b", True), ("/a/b/c", False)], "/a/b/c/d", False),
    ([("/a", False), ("/a/b", True), ("/a/b/c", False)], "/a/b/z", True),
]


def test_oracle_rep_golden():
    for rules, path, want in GOLDEN:
        robots = {"h": list(rules)}
        got = not _blocked(f"https://h{path}", robots)
        assert got == want, (rules, path, want)


def test_engine_rep_matches_oracle_golden(spark):
    rows, rule_rows = [], []
    for i, (rules, path, want) in enumerate(GOLDEN):
        host = f"h{i}.ex"
        rows.append((f"https://{host}{path}", host, path, want))
        rule_rows += [(host, p, a) for p, a in rules]
    urls = spark.createDataFrame(
        [(u, h, p) for u, h, p, _ in rows], "url string, host string, path string"
    )
    rules_df = spark.createDataFrame(rule_rows, RB.RULES_SCHEMA)
    kept = {r["url"] for r in RB.rep_filter(urls, rules_df, F.col("path")).collect()}
    for url, _h, _p, want in rows:
        assert (url in kept) == want, url


def test_rep_filter_no_row_multiplication_no_shuffle(spark):
    """Multi-rule hosts must not duplicate frontier rows (the old
    join-per-rule plan did), and the verdict is a broadcast join +
    fold — no Exchange on the urls side."""
    urls = spark.createDataFrame(
        [(f"https://h.ex/p{i}", "h.ex", f"/p{i}") for i in range(10)],
        "url string, host string, path string",
    )
    rules = spark.createDataFrame(
        [("h.ex", "/p1", False), ("h.ex", "/p2", False), ("h.ex", "/p11", True)],
        RB.RULES_SCHEMA,
    )
    out = RB.rep_filter(urls, rules, F.col("path"))
    got = sorted(r["url"] for r in out.collect())
    want = sorted(f"https://h.ex/p{i}" for i in range(10) if i not in (1, 2))
    assert got == want  # /p1,/p2 blocked; /p11 would be allowed if present
    assert out.count() == len(want)  # no duplicate rows from multi-rule host


def test_legacy_disallow_table_adapts(spark):
    legacy = spark.createDataFrame(
        [("h.ex", "/d")], "host string, disallow_prefix string"
    )
    urls = spark.createDataFrame(
        [("https://h.ex/d/x", "h.ex", "/d/x"), ("https://h.ex/ok", "h.ex", "/ok")],
        "url string, host string, path string",
    )
    kept = {r["url"] for r in RB.rep_filter(urls, legacy, F.col("path")).collect()}
    assert kept == {"https://h.ex/ok"}


def test_eligible_applies_rep_allow_rules(spark):
    """eligible() must honor Allow-overrides-Disallow end to end."""
    from storm_focused_crawler_spark import spec
    from storm_focused_crawler_spark.operators.frontier import eligible

    frontier = spark.createDataFrame(
        [
            ("https://h.ex/a/b/ok", spec.xxh64("https://h.ex/a/b/ok"), 0.5, 0, 0),
            ("https://h.ex/a/no", spec.xxh64("https://h.ex/a/no"), 0.5, 0, 0),
            ("https://other.ex/a/no", spec.xxh64("https://other.ex/a/no"), 0.5, 0, 0),
        ],
        "url string, url_hash long, score double, depth int, discovered_round int",
    )
    seen = spark.createDataFrame([], "url_hash long")
    rules = spark.createDataFrame(
        [("h.ex", "/a", False), ("h.ex", "/a/b", True)], RB.RULES_SCHEMA
    )
    got = sorted(r["url"] for r in eligible(frontier, seen, rules).collect())
    assert got == ["https://h.ex/a/b/ok", "https://other.ex/a/no"]
