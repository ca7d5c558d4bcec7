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
    # --- RFC 9309 §2.2.3 metacharacters (VERDICT r04 'Next round' #1) ---
    # trailing-extension block: /*.pdf$ only hits paths ENDING .pdf
    ([("/*.pdf$", False)], "/docs/a.pdf", False),
    ([("/*.pdf$", False)], "/docs/a.pdfx", True),
    ([("/*.pdf$", False)], "/docs/a.pdf/more", True),
    # mid-pattern '*' spans any octets, including '/'
    ([("/private*/", False)], "/private2024/x", False),
    ([("/private*/", False)], "/private", True),          # no trailing '/'
    ([("/a*b*c", False)], "/aXbY/c-more", False),
    ([("/a*b*c", False)], "/aXc", True),                  # 'b' never occurs
    # '$' anchors: exact-path rule vs longer real path
    ([("/a$", False)], "/a", False),
    ([("/a$", False)], "/ab", True),
    # leading '*': suffix-style rule
    ([("*p2$", False)], "/d9/p2", False),
    ([("*p2$", False)], "/d9/p2/x", True),
    # '$' mid-pattern is a LITERAL octet, not an anchor
    ([("/a$b", False)], "/a$b/c", False),
    ([("/a$b", False)], "/ab", True),
    # precedence counts raw octets incl. metacharacters: '/d*/p1$' (7)
    # beats '/d*' (3) where both match
    ([("/d*", False), ("/d*/p1$", True)], "/d42/p1", True),
    ([("/d*", False), ("/d*/p1$", True)], "/d42/p2", False),
    # wildcard-vs-wildcard length tie → Allow wins
    ([("/d1*", True), ("/d*1", False)], "/d11/p4", True),
    ([("/d1*", True), ("/d*1", False)], "/d251/p6", False),  # only Disallow matches
    # consecutive '**' collapses; bare '*' matches everything
    ([("/d**1", False)], "/d/x1", False),
    ([("*", False)], "/anything", False),
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


# --------------------------------------------------------------------------
# §2.2.3 matcher: lockstep fuzz of engine column / python twin / regex
# --------------------------------------------------------------------------


def _re_reference(pattern: str, path: str) -> bool:
    """Independent §2.2.3 reference via Python's regex engine:
    start-anchored, '*' → '.*', one trailing '$' → end anchor,
    everything else literal."""
    import re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.match("^" + rx + ("$" if anchored else ""), path) is not None


def test_rep_match_py_fuzz_vs_regex():
    """rep_match_py's locate-scan == regex semantics on 20k random
    (pattern, path) pairs over a metacharacter-dense alphabet."""
    import random

    rng = random.Random(2024)
    alpha_pat = "ab*$/."
    alpha_path = "ab/.$"
    for _ in range(20_000):
        pat = "".join(rng.choice(alpha_pat) for _ in range(rng.randint(1, 9)))
        path = "/" + "".join(rng.choice(alpha_path) for _ in range(rng.randint(0, 12)))
        assert RB.rep_match_py(pat, path) == _re_reference(pat, path), (pat, path)


def test_rep_match_col_fuzz_vs_python_twin(spark):
    """The JVM locate-fold column == rep_match_py on 3k random pairs
    (one Spark job, all comparisons row-wise)."""
    import random

    rng = random.Random(7)
    cases = []
    for _ in range(3_000):
        pat = "".join(rng.choice("ab*$/.") for _ in range(rng.randint(1, 9)))
        path = "/" + "".join(rng.choice("ab/.$") for _ in range(rng.randint(0, 12)))
        cases.append((pat, path))
    cases += [
        ("/*.pdf$", "/a/b.pdf"), ("/*.pdf$", "/a/b.pdfx"), ("/a*b*c$", "/aXbYc"),
        ("*p2$", "/d9/p2"), ("/d**1", "/d/x1"), ("$", "/"), ("*", "/x"),
        ("/a$b", "/a$b/c"), ("/a$", "/a"), ("/a$", "/ab"),
    ]
    df = spark.createDataFrame(cases, "pat string, path string")
    got = df.select(
        "pat", "path", RB.rep_match_col(F.col("path"), F.col("pat")).alias("m")
    ).collect()
    for r in got:
        assert bool(r["m"]) == RB.rep_match_py(r["pat"], r["path"]), (
            r["pat"], r["path"],
        )
