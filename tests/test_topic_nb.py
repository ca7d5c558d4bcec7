"""Multinomial-NB topic classifier: held-out accuracy + determinism.

The golden sentences are HELD OUT (none appear in the seed corpus).
Engine-vs-oracle value equality on the documents fixture is covered by
test_queries_duckdb.py like every sql-tagged op.
"""

from __future__ import annotations

from storm_focused_crawler_spark.functions import topic_nb as TN

GOLDEN = [
    ("databases", "the engine sorts both inputs before the merge join starts"),
    ("databases", "an index scan avoids reading every page of the table"),
    ("databases", "the plan estimates the row count for each predicate"),
    ("databases", "commit writes the log record before the pages flush"),
    ("networking", "the router drops the packet when the ttl reaches zero"),
    ("networking", "the client retransmits after the timer expires"),
    ("networking", "the resolver caches the answer from the name server"),
    ("networking", "congestion control shrinks the window after a loss"),
    ("cooking", "let the dough rest until it doubles before baking"),
    ("cooking", "season the sauce and simmer it until it thickens"),
    ("cooking", "roast the vegetables until the edges turn brown"),
    ("cooking", "fold the whites into the batter with a light hand"),
    ("astronomy", "the transit dip reveals the radius of the planet"),
    ("astronomy", "parallax fixes the distance to the nearby star"),
    ("astronomy", "the comet grows a tail as sunlight heats the ice"),
    ("astronomy", "the galaxy recedes and its light shifts toward red"),
]


def test_training_is_deterministic_and_broadcast_sized():
    w1, d1 = TN.train()
    w2, d2 = TN.train()
    assert (w1, d1) == (w2, d2)
    assert {t for t, _ in d1} == set(TN.SEED_CORPUS)
    assert all(w < 0 for _, _, w in w1)  # log-probs in micro-units
    assert len(w1) < 4 * 1000  # V*T bounded — broadcastable at any scale


def test_holdout_accuracy_at_least_90pct(spark):
    df = spark.createDataFrame(
        [(i, txt) for i, (_, txt) in enumerate(GOLDEN)], "doc_id long, text string"
    )
    pred = {r["doc_id"]: r["pred_topic"] for r in TN.classify(df).collect()}
    ok = sum(pred[i] == want for i, (want, _) in enumerate(GOLDEN))
    assert ok / len(GOLDEN) >= 0.9, {
        i: (GOLDEN[i][0], pred[i]) for i in pred if pred[i] != GOLDEN[i][0]
    }


def test_empty_text_predicts_first_topic_deterministically(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["pred_topic"], r["score_i"]) for r in TN.classify(df).collect()}
    first = sorted(TN.SEED_CORPUS)[0]
    assert rows == {1: (first, 0), 2: (first, 0)}


def test_weight_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "hash join plan")], "doc_id long, text string")
    plan = TN.classify(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Crawl-scorer surface: scorer="topic_nb" parity (engine == oracle)
# --------------------------------------------------------------------------


def test_score_text_is_a_probability_and_deterministic():
    s1 = TN.score_text("the hash join builds a table in memory")
    s2 = TN.score_text("the hash join builds a table in memory")
    assert s1 == s2
    assert 0.0 <= s1 <= 1.0
    # database-y text scores higher for the databases topic than cooking text
    assert s1 > TN.score_text("knead the dough and let it rest")
    # empty text = uniform posterior
    assert TN.score_text("") == round(1.0 / len(TN.SEED_CORPUS), 6)


def test_crawl_parity_with_nb_scorer(spark, sf_dir, tmp_path):
    """Full crawl parity (ordering + seen) with the trained scorer on,
    at 2 and 32 shuffle partitions — and the NB ordering must differ
    from the keyword ordering (the trained scorer is load-bearing)."""
    from storm_focused_crawler_spark import driver as drv
    from storm_focused_crawler_spark.fixtures import gen_pages
    from storm_focused_crawler_spark.oracle import seqcrawler as sq

    paths = gen_pages.ensure(sf_dir)
    pages, seeds, robots, budgets = sq.load_fixture_inputs(paths)
    kw = tuple(gen_pages.topic_keywords())
    oracle_nb = sq.crawl(pages, seeds, robots, budgets,
                         sq.CrawlConfig(rounds=3, capacity=64, keywords=kw,
                                        scorer="topic_nb"))
    oracle_kw = sq.crawl(pages, seeds, robots, budgets,
                         sq.CrawlConfig(rounds=3, capacity=64, keywords=kw))
    assert sorted(oracle_nb.ordering) != sorted(oracle_kw.ordering), (
        "NB scorer is vacuous on this fixture"
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    for parts in (2, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            cfg = drv.CrawlConfig(rounds=3, capacity=64, keywords=kw,
                                  scorer="topic_nb")
            store = drv.run_crawl(spark, paths, cfg,
                                  str(tmp_path / f"nb{parts}"))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        ordering = []
        for r in range(3):
            ordering += [(x["round"], x["seq"], x["url"])
                         for x in store.read(spark, r, "ordering").collect()]
        assert sorted(ordering) == sorted(oracle_nb.ordering), f"parts={parts}"
        seen = {x["url_hash"]
                for x in store.read_union(spark, 2, "seen").collect()}
        assert seen == oracle_nb.seen_hashes
