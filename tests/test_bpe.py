"""BPE merge learning (functions/bpe.py): engine == exact python twin
on the fixture corpus, classic-paper golden, leftmost-first adjacent-
repeat semantics, and early stop."""

from __future__ import annotations

from storm_focused_crawler_spark.functions import bpe as B


def test_engine_matches_python_twin(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = B.word_histogram(d)
    got = B.learn_merges(spark, hist, 10)
    wc = {r["word"]: r["cnt"] for r in hist.collect()}
    want = B.learn_merges_py(wc, 10)
    assert got == want
    assert len(got) == 10
    ranks, counts = [m[0] for m in got], [m[4] for m in got]
    assert ranks == list(range(1, 11))
    # merged symbols compose from earlier merges (er -> er</w> etc.)
    assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in got[1:])


def test_golden_sennrich_style():
    """'low/lower/lowest/newer' learns the classic l+o -> lo -> low."""
    g = B.learn_merges_py({"low": 5, "lower": 2, "lowest": 6, "newer": 3}, 3)
    assert g[0][1:4] == ("l", "o", "lo")
    assert g[1][1:4] == ("lo", "w", "low")
    assert g[0][4] == 13


def test_adjacent_repeats_merge_pairwise():
    """Leftmost-first with zero-width lookarounds: 'aaaa' under merge
    (a,a) becomes two 'aa' symbols, not 'aa a a' — identical regex
    semantics in both engines (locked via the twin equality above)."""
    segs = B.segment_word("aaaa", [(1, "a", "a", "aa", 0)])
    assert segs == ["aa", "aa", B.END]


def test_early_stop_when_no_pairs():
    # single-letter vocab: first merge glues letter+</w>, then nothing
    out = B.learn_merges_py({"a": 3}, 5)
    assert out == [(1, "a", "</w>", "a</w>", 3)]


def test_segment_docs_matches_python_twin(spark, sf_dir):
    """Per-doc subword counts under the learned merges == re-encoding
    every word with segment_word; subwords strictly fewer than chars
    (merges fired) and ≥ words (END markers)."""
    import re

    import pandas as pd

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = B.word_histogram(d)
    merges = B.learn_merges(spark, hist, 8)
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in B.segment_docs(d, merges).collect()}

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    cache: dict[str, int] = {}
    for row in pdf.itertuples():
        words = [w for w in re.split(r"[^a-z0-9]+", row.text.lower()) if w]
        if not words:
            continue
        n_sub = 0
        for w in words:
            if w not in cache:
                cache[w] = len(B.segment_word(w, merges))
            n_sub += cache[w]
        assert got[int(row.doc_id)] == (len(words), n_sub), row.doc_id
    for did, (nw, ns) in got.items():
        assert ns >= nw  # at least one symbol per word
