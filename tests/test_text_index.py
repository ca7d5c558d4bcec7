"""Inverted-index sink locks (VERDICT r01 'Next round' #9): postings
math, tf-idf lookup ranking, and the crawl-integrated per-round delta
commit + union read."""

from __future__ import annotations

import pytest

from storm_focused_crawler_spark.operators import text_index as TI


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "spark spark spark joins data"),
        (2, "data data pipelines"),
        (3, "completely unrelated words"),
    ]
    return spark.createDataFrame(rows, "doc long, text string")


def test_postings_tf_exact(tiny):
    p = {(r["token"], r["doc"]): r["tf"]
         for r in TI.postings(tiny, "doc", "text").collect()}
    assert p[("spark", 1)] == 3
    assert p[("data", 1)] == 1 and p[("data", 2)] == 2
    assert ("spark", 2) not in p


def test_token_df(tiny):
    post = TI.postings(tiny, "doc", "text")
    d = {r["token"]: r["df"] for r in TI.token_df(post).collect()}
    assert d["spark"] == 1 and d["data"] == 2


def test_search_ranks_by_tfidf(spark, tiny):
    post = TI.postings(tiny, "doc", "text")
    got = TI.search(spark, post, TI.token_df(post), 3, ["spark", "data"], k=3).collect()
    docs = [r["doc"] for r in got]
    # doc 1 matches both terms (spark tf=3 rare + data); doc 2 only data
    assert docs[0] == 1 and docs[1] == 2 and 3 not in docs


def test_crawl_commits_postings_deltas_and_lookup_finds_doc(spark, sf_dir, tmp_path):
    from storm_focused_crawler_spark import driver as drv
    from storm_focused_crawler_spark.fixtures import gen_pages

    paths = gen_pages.ensure(sf_dir)
    cfg = drv.CrawlConfig(rounds=2, capacity=32,
                          keywords=tuple(gen_pages.topic_keywords()),
                          build_text_index=True)
    store = drv.run_crawl(spark, paths, cfg, str(tmp_path / "wd"))
    for rnd in range(2):
        assert "postings" in store.manifest(rnd)["tables"]
    post = store.read_union(spark, 1, "postings")
    # pick a crawled doc and one of its tokens; the index must find it
    res = store.read(spark, 0, "results").select("url", "text").first()
    from storm_focused_crawler_spark import spec

    token = next(t for t in spec.tokenize(res["text"]) if len(t) > 3)
    n_docs = post.select("doc").distinct().count()
    hits = [r["doc"] for r in
            TI.search(spark, post, TI.token_df(post), n_docs, [token], k=50).collect()]
    assert res["url"] in hits
