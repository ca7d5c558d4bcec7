"""BM25 ranked retrieval + CCNet-style LM-perplexity bucketing.

Both ops are rows-only in the driver window (float math, round(6)-
healed); THIS file runs the driver-identical DuckDB compares against
RANK_BM25_ORACLE / QUALITY_LM_PPL_ORACLE plus independent pure-Python
twins and the 100 TB plan locks.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from storm_focused_crawler_spark.plans.pipeline_ops import (
    BM25_TERMS,
    QUALITY_LM_PPL_ORACLE,
    RANK_BM25_ORACLE,
    quality_lm_perplexity,
    rank_bm25,
)

import re

TOK = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list[str]:
    return [t for t in TOK.split(text.lower()) if t]


@pytest.fixture(scope="module")
def docs_pdf(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


# ------------------------------- BM25 ---------------------------------------


def test_bm25_matches_duckdb(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["score"], r["n_terms"])
        for r in rank_bm25(spark, sf_dir).collect()
    )
    want = sorted(map(tuple, _duck(sf_dir, RANK_BM25_ORACLE)))
    assert got == want
    assert len(got) == 15, "top-k shorter than k — query too selective"


def test_bm25_python_twin(spark, sf_dir, docs_pdf):
    """Recompute BM25 from scratch in pure Python; ranked doc set and
    scores (6 dp) must match the engine."""
    k1, b = 1.2, 0.75
    tf: dict[tuple[str, int], int] = Counter()
    dl: dict[int, int] = {}
    for row in docs_pdf.itertuples():
        ts = _toks(row.text)
        dl[row.doc_id] = len(ts)
        for t in ts:
            tf[(t, row.doc_id)] += 1
    df = Counter(t for (t, _d) in tf)
    n = len(docs_pdf)
    avgdl = sum(dl.values()) / len(dl)
    scores: dict[int, list[float]] = {}
    for term in BM25_TERMS:
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for (t, d), f in tf.items():
            if t == term:
                s = idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl[d] / avgdl))
                scores.setdefault(d, []).append(s)
    ranked = sorted(
        ((round(sum(v), 6), d, len(v)) for d, v in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )[:15]
    want = sorted((d, s, m) for s, d, m in ranked)
    got = sorted(
        (r["doc_id"], r["score"], r["n_terms"])
        for r in rank_bm25(spark, sf_dir).collect()
    )
    assert got == want


def test_bm25_plan_prunes_before_shuffle(spark, sf_dir):
    """Query terms and df must broadcast into the postings stream (the
    inverted lists are pruned BEFORE any exchange of corpus-sized
    data); no cross product anywhere."""
    plan = rank_bm25(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --------------------------- LM perplexity ----------------------------------


def test_lm_perplexity_matches_duckdb(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["ppl"], r["n_bigrams"], r["bucket"])
        for r in quality_lm_perplexity(spark, sf_dir).collect()
    )
    want = sorted(map(tuple, _duck(sf_dir, QUALITY_LM_PPL_ORACLE)))
    assert got == want


def test_lm_perplexity_python_twin(spark, sf_dir, docs_pdf):
    """Train the interpolated bigram LM and bucket in pure Python."""
    lam = 0.9
    uni: Counter = Counter()
    bi: Counter = Counter()
    for row in docs_pdf.itertuples():
        ts = _toks(row.text)
        if row.doc_id % 5 == 0:
            uni.update(ts)
            bi.update(zip(ts, ts[1:]))
    n, v = sum(uni.values()), len(uni)
    per = []
    for row in docs_pdf.itertuples():
        ts = _toks(row.text)
        if len(ts) < 2:
            continue
        lp = []
        for w1, w2 in zip(ts, ts[1:]):
            p = lam * (bi[(w1, w2)] / uni[w1] if uni[w1] else 0.0) + (
                (1.0 - lam) * (uni[w2] + 1.0)
            ) / (n + v)
            lp.append(math.log(p))
        per.append((round(math.exp(-sum(lp) / len(lp)), 6), row.doc_id, len(lp)))
    per.sort()
    # ntile semantics: first (n mod 3) groups get the extra row
    q, r = divmod(len(per), 3)
    sizes = [q + 1] * r + [q] * (3 - r)
    labels = []
    for lab, sz in zip(["head", "middle", "tail"], sizes):
        labels += [lab] * sz
    want = {
        d: (ppl, nb, labels[i]) for i, (ppl, d, nb) in enumerate(per)
    }
    got = {
        r["doc_id"]: (r["ppl"], r["n_bigrams"], r["bucket"])
        for r in quality_lm_perplexity(spark, sf_dir).collect()
    }
    assert got == want


def test_lm_perplexity_buckets_nonvacuous(spark, sf_dir):
    rows = quality_lm_perplexity(spark, sf_dir).collect()
    by = Counter(r["bucket"] for r in rows)
    assert set(by) == {"head", "middle", "tail"}
    # tertiles: sizes differ by at most 1
    assert max(by.values()) - min(by.values()) <= 1
    # head docs are more reference-like (lower ppl) than tail docs
    head = max(r["ppl"] for r in rows if r["bucket"] == "head")
    tail = min(r["ppl"] for r in rows if r["bucket"] == "tail")
    assert head <= tail


def test_lm_perplexity_plan_text_never_crosses_exchange(spark, sf_dir):
    """Scoring joins the LM tables broadcast; the doc text itself must
    never cross an Exchange (pairs carry (id, w1, w2) only)."""
    plan = (
        quality_lm_perplexity(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        s = ln.strip()
        if s.startswith("+- Exchange") or s.startswith("Exchange"):
            assert "text#" not in ln, ln
