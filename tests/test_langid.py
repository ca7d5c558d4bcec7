"""Trigram language-ID accuracy lock (VERDICT r01 'Next round' #8).

The golden sentences are HELD OUT — none appear in the langid seed
corpora — so this measures generalization, not memorization.  The
driver-facing correctness of the operator (engine vs DuckDB oracle on
the documents fixture) is covered by test_queries_duckdb.py like every
other sql-tagged op."""

from __future__ import annotations

from storm_focused_crawler_spark.functions import langid as L

GOLDEN = [
    ("en", "she opened the window because the morning was warm"),
    ("en", "they walked along the river and talked about their plans"),
    ("en", "every student in the class finished the reading early"),
    ("en", "the old house at the end of the street was quiet"),
    ("en", "we should bring some water for the long walk tomorrow"),
    ("de", "sie öffnete das fenster weil der morgen warm war"),
    ("de", "wir gehen am fluss entlang und sprechen über unsere pläne"),
    ("de", "jeder schüler in der klasse war mit dem lesen früh fertig"),
    ("de", "das alte haus am ende der straße war sehr ruhig"),
    ("de", "wir sollten etwas wasser für den langen spaziergang mitnehmen"),
    ("fr", "elle a ouvert la fenêtre parce que le matin était chaud"),
    ("fr", "nous marchons le long de la rivière en parlant de nos projets"),
    ("fr", "chaque élève de la classe a fini la lecture très tôt"),
    ("fr", "la vieille maison au bout de la rue était calme"),
    ("fr", "nous devrions apporter de l'eau pour la longue marche demain"),
    ("es", "ella abrió la ventana porque la mañana estaba cálida"),
    ("es", "caminamos junto al río hablando de nuestros planes"),
    ("es", "cada estudiante de la clase terminó la lectura temprano"),
    ("es", "la casa vieja al final de la calle estaba tranquila"),
    ("es", "deberíamos llevar agua para la larga caminata de mañana"),
    ("zh", "她打开窗户因为早晨很温暖"),
    ("zh", "我们沿着河边散步谈论我们的计划"),
    ("zh", "班里的每个学生都很早完成了阅读"),
    ("zh", "街道尽头的老房子非常安静"),
    ("zh", "明天长途步行我们应该带些水"),
]


def test_golden_accuracy_at_least_95(spark):
    df = spark.createDataFrame(
        [(i, txt) for i, (_, txt) in enumerate(GOLDEN)], "doc_id long, text string"
    )
    pred = {r["doc_id"]: r["pred_lang"] for r in L.classify(df).collect()}
    ok = sum(pred[i] == want for i, (want, _) in enumerate(GOLDEN))
    assert ok / len(GOLDEN) >= 0.95, {
        i: (GOLDEN[i][0], pred[i]) for i in pred if pred[i] != GOLDEN[i][0]
    }


def test_empty_and_unprofiled_text_predict_und(spark):
    df = spark.createDataFrame([(1, ""), (2, "θθθ")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["pred_lang"], r["score"]) for r in L.classify(df).collect()}
    assert rows == {1: ("und", 0), 2: ("und", 0)}


def test_profiles_deterministic_and_bounded():
    p1, p2 = L.build_profiles(), L.build_profiles()
    assert p1 == p2
    langs = {lang for lang, _, _ in p1}
    assert langs == {"en", "de", "fr", "es", "zh"}
    assert all(1 <= w <= L.PROFILE_TOP_K for _, _, w in p1)
    # broadcast-sized at any corpus scale
    assert len(p1) <= 5 * L.PROFILE_TOP_K


def test_profile_join_is_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = L.classify(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Arrow scorer (classify_arrow) — the hot path must equal the relational
# spec row for row (VERDICT r02 'What's wrong' #2)
# --------------------------------------------------------------------------


def _rows(df):
    return sorted(
        (r["doc_id"], r["pred_lang"], r["score"]) for r in df.collect()
    )


def test_arrow_equals_relational_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _rows(L.classify_arrow(docs)) == _rows(L.classify(docs))


def test_arrow_equals_relational_on_golden_and_edges(spark):
    edge = [
        (100, ""),                       # empty -> und
        (101, None),                     # null text -> und
        (102, "θθθ"),                    # unprofiled script -> und
        (103, "\U0001f600\U0001f600a"),  # non-BMP code points (utf-32 path)
        (104, "x" * 2000),               # past the 512-char prefix bound
        (105, "the the the le le la la"),  # multi-language gram overlap
    ]
    data = [(i, txt) for i, (_, txt) in enumerate(GOLDEN)] + edge
    df = spark.createDataFrame(data, "doc_id long, text string")
    assert _rows(L.classify_arrow(df)) == _rows(L.classify(df))


def test_arrow_golden_accuracy_at_least_95(spark):
    df = spark.createDataFrame(
        [(i, txt) for i, (_, txt) in enumerate(GOLDEN)], "doc_id long, text string"
    )
    pred = {r["doc_id"]: r["pred_lang"] for r in L.classify_arrow(df).collect()}
    ok = sum(pred[i] == want for i, (want, _) in enumerate(GOLDEN))
    assert ok / len(GOLDEN) >= 0.95


def test_arrow_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    plan = L.classify_arrow(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # single narrow pass: no shuffle at all
