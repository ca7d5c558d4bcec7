"""Unit tests for the pure-function spec (SURVEY.md §2.1 / §5.2-3)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from storm_focused_crawler_spark import spec

GOLDEN_CANON = [
    ("HTTPS://H001.Example-COM:443/a/b/../c?b=2&a=1#frag", "https://h001.example-com/a/c?a=1&b=2"),
    ("http://x.com:80/", "http://x.com/"),
    ("http://x.com", "http://x.com/"),
    ("http://x.com/a/./b/", "http://x.com/a/b/"),
    ("http://x.com/%7Euser/%2fpath", "http://x.com/~user/%2Fpath"),
    ("http://x.com/a?", "http://x.com/a"),
    ("http://x.com:8080/a", "http://x.com:8080/a"),
    ("http://x.com/a/b/c/../../d", "http://x.com/a/d"),
    ("https://X.com/?z=1&y=2&z=0", "https://x.com/?y=2&z=0&z=1"),
    ("not a url", "not a url"),
]


@pytest.mark.parametrize("raw,want", GOLDEN_CANON)
def test_canon_golden(raw, want):
    assert spec.canon(raw) == want


@pytest.mark.parametrize("raw,_", GOLDEN_CANON)
def test_canon_idempotent(raw, _):
    c = spec.canon(raw)
    assert spec.canon(c) == c


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=60))
@settings(max_examples=200, deadline=None)
def test_canon_idempotent_property(s):
    u = "http://host.example/" + s
    c = spec.canon(u)
    assert spec.canon(c) == c


def test_xxh64_reference_vectors():
    # public xxHash reference vectors, seed 0
    assert spec.xxh64(b"", 0) % (1 << 64) == 0xEF46DB3751D8E999
    assert spec.xxh64(b"a", 0) % (1 << 64) == 0xD24EC4F1A98C6E5B


def test_xxh64_matches_spark(spark):
    """Lock the pure-python twin to Spark's F.xxhash64 (seed=42)."""
    from pyspark.sql import functions as F

    urls = [
        "",
        "a",
        "https://h001.example-com/a/c?a=1&b=2",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 33,
        "long-url-" * 20,
        "üñïçødé-ürl",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["h"] for r in df.select("url", F.xxhash64("url").alias("h")).collect()}
    for u in urls:
        assert got[u] == spec.xxh64(u), u


def test_html_roundtrip_byte_identical():
    texts = [
        "plain words here",
        'with <tags> & "quotes" and \'apostrophes\'',
        "unicode ünïcode — em-dash",
        "",
        "&amp; pre-escaped looking &lt;thing&gt;",
    ]
    links = ["https://a.com/x", "http://b.org/y?q=1"]
    for i, t in enumerate(texts):
        h = spec.render_html(t, i, links)
        assert spec.extract_text(h) == t
        assert spec.extract_links(h) == links


@given(st.text(max_size=300), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=200, deadline=None)
def test_html_roundtrip_property(t, doc_id):
    h = spec.render_html(t, doc_id, [])
    assert spec.extract_text(h) == t


def test_score_golden():
    kw = ["spark", "join", "window"]
    assert spec.relevance_score("spark join the window window", kw) == round(3 / (6 ** 0.5), 6)
    assert spec.relevance_score("", kw) == 0.0
    assert spec.relevance_score("nothing matches here", kw) == 0.0


def test_tokenize():
    assert spec.tokenize("Spark-SQL, 2nd join!") == ["spark", "sql", "2nd", "join"]
