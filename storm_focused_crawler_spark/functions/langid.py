"""Character-n-gram language identification (en/de/fr/es/zh).

Replaces the round-1 three-stopword toy (VERDICT r01 'What's missing'
#3).  The method is the classic character-n-gram profile approach
(Cavnar & Trenkle, "N-Gram-Based Text Categorization", 1994 — public
knowledge; the reference shipped a language-detection library in its
ArticleExtractionBolt [R], SURVEY.md §0): each language gets a profile
of its top-K character 1-3-grams ranked by frequency over a small
embedded seed corpus (unigrams carry CJK, where 3-grams are too sparse
to overlap; bigrams/trigrams separate the European languages); a
document is classified as the argmax over languages of the summed
rank-weights of its distinct n-grams.

Everything is engine-agnostic by construction:

  * profiles are pure data — (lang, trigram, integer weight) rows
    derived deterministically at import from the seed corpora below;
  * trigram extraction and scoring are pure relational algebra
    (substr/explode/join/groupBy/argmax) with INTEGER sums, so the
    Spark plan and the DuckDB oracle compute identical values — no
    floats, no summation-order hazards;
  * at scale the profile table (≤ K·5 rows) broadcasts, documents
    shuffle once on (doc_id) for the per-doc aggregate.

The seed corpora are short everyday-prose samples written for this
module (not quoted from any corpus); held-out golden sentences in
tests/test_langid.py lock accuracy ≥ 0.95.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PROFILE_TOP_K = 400

SEED_CORPUS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. this is a simple "
        "sentence written in english. we are building a system that can "
        "recognize the language of a short text. many words in english end "
        "with ing and the most common word is the. people often say that "
        "practice makes perfect. the children play in the garden and the "
        "weather is nice today. reading books in the evening is one of the "
        "things we enjoy the most. yesterday we went to the market and "
        "bought fresh bread, cheese and apples. my brother works in a small "
        "office near the station and he takes the train every morning. when "
        "the rain stops we will walk through the park together. she told me "
        "that the meeting would start at nine and that everyone should be "
        "there on time. there are many beautiful places in this country "
        "that tourists never see. i would like to learn how to cook because "
        "good food makes people happy. the teacher asked the students to "
        "write a short story about their summer."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. dies ist "
        "ein einfacher satz der auf deutsch geschrieben wurde. wir bauen "
        "ein system das die sprache eines kurzen textes erkennen kann. "
        "viele wörter im deutschen enden mit ung und das häufigste wort ist "
        "der. die kinder spielen im garten und das wetter ist heute schön. "
        "abends lesen wir gerne bücher und trinken dabei eine tasse tee. "
        "gestern sind wir auf den markt gegangen und haben frisches brot, "
        "käse und äpfel gekauft. mein bruder arbeitet in einem kleinen büro "
        "in der nähe des bahnhofs und er nimmt jeden morgen den zug. wenn "
        "der regen aufhört werden wir zusammen durch den park gehen. sie "
        "sagte mir dass die besprechung um neun beginnen würde und dass "
        "alle pünktlich sein sollten. es gibt viele schöne orte in diesem "
        "land die touristen nie sehen. ich möchte gerne kochen lernen weil "
        "gutes essen die menschen glücklich macht. der lehrer bat die "
        "schüler eine kurze geschichte über ihren sommer zu schreiben."
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux. ceci "
        "est une phrase simple écrite en français. nous construisons un "
        "système qui peut reconnaître la langue d'un texte court. beaucoup "
        "de mots en français se terminent par tion et le mot le plus "
        "courant est le. les enfants jouent dans le jardin et il fait beau "
        "aujourd'hui. le soir nous aimons lire des livres et boire une "
        "tasse de thé. hier nous sommes allés au marché et nous avons "
        "acheté du pain frais, du fromage et des pommes. mon frère "
        "travaille dans un petit bureau près de la gare et il prend le "
        "train tous les matins. quand la pluie cessera nous marcherons "
        "ensemble dans le parc. elle m'a dit que la réunion commencerait à "
        "neuf heures et que tout le monde devait être à l'heure. il y a "
        "beaucoup de beaux endroits dans ce pays que les touristes ne "
        "voient jamais. je voudrais apprendre à cuisiner parce que la bonne "
        "nourriture rend les gens heureux. le professeur a demandé aux "
        "élèves d'écrire une petite histoire sur leurs vacances d'été."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. esta es una "
        "frase sencilla escrita en español. estamos construyendo un sistema "
        "que puede reconocer el idioma de un texto corto. muchas palabras "
        "en español terminan en ción y la palabra más común es que. los "
        "niños juegan en el jardín y hoy hace buen tiempo. por la noche nos "
        "gusta leer libros y tomar una taza de té. ayer fuimos al mercado y "
        "compramos pan fresco, queso y manzanas. mi hermano trabaja en una "
        "oficina pequeña cerca de la estación y toma el tren todas las "
        "mañanas. cuando pare la lluvia caminaremos juntos por el parque. "
        "ella me dijo que la reunión empezaría a las nueve y que todos "
        "debían llegar a tiempo. hay muchos lugares hermosos en este país "
        "que los turistas nunca ven. me gustaría aprender a cocinar porque "
        "la buena comida hace feliz a la gente. el profesor pidió a los "
        "estudiantes que escribieran un cuento corto sobre su verano."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒狗。这是一个用中文写的简单句子。我们正在构建一个可以识别短文本语言的系统。"
        "中文里最常见的字是的。孩子们在花园里玩耍，今天天气很好。晚上我们喜欢读书喝茶。"
        "昨天我们去市场买了新鲜的面包、奶酪和苹果。我的哥哥在车站附近的一间小办公室工作，他每天早上坐火车。"
        "雨停了以后我们会一起穿过公园散步。她告诉我会议九点开始，每个人都应该准时到。"
        "这个国家有很多游客从未见过的美丽地方。我想学做饭，因为好的食物让人快乐。"
        "老师让学生们写一篇关于他们夏天的短文。"
    ),
}


NGRAM_SIZES = (1, 2, 3)  # 1-grams carry CJK; 2/3-grams separate European


def _ngrams(s: str) -> list[str]:
    s = s.lower()
    out: list[str] = []
    for n in NGRAM_SIZES:
        out += [s[i : i + n] for i in range(len(s) - n + 1)]
    return out


def build_profiles(top_k: int = PROFILE_TOP_K) -> list[tuple[str, str, int]]:
    """(lang, ngram, weight) rows; weight = top_k − rank (rank by
    frequency desc, ngram asc — fully deterministic)."""
    rows: list[tuple[str, str, int]] = []
    for lang in sorted(SEED_CORPUS):
        counts = Counter(_ngrams(SEED_CORPUS[lang]))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        rows += [(lang, t, top_k - r) for r, (t, _) in enumerate(top)]
    return rows


def profiles_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(build_profiles(), "plang string, tg string, w int")


def profiles_cte() -> str:
    """DuckDB VALUES twin of profiles_df (same rows, same types)."""
    vals = ", ".join(
        "('{}', '{}', {})".format(lang, t.replace("'", "''"), w)
        for lang, t, w in build_profiles()
    )
    return f"profiles(plang, tg, w) AS (VALUES {vals})"


def _ngram_parts(lo):
    """ALL char 1-3-grams of *lo* (with repeats) — JVM-side.

    *lo* MUST be a cheap column reference (an already-projected
    lowercase column): any expression here is re-evaluated inside the
    transform lambda for EVERY element — passing lower(text) directly
    recomputed the lowercase of the whole document per gram (~L² work;
    measured as most of a 24 s sf0.1 run before this split).

    Deliberately NOT array_distinct'ed either: that is O(n²) string
    compares per document; classify() dedups linearly with a hash
    aggregate AFTER the profile join, where the stream is already
    filtered to profile hits.

    Guarded per size: Spark's sequence(1, n) counts DOWN for n < 1, so
    each size contributes empty when the text is too short."""
    empty = F.array().cast("array<string>")

    def _sub(n: int):
        # MUST be a 1-arg lambda: F.transform treats a 2-param callable
        # (incl. one with a default!) as an (element, index) lambda
        return lambda i: lo.substr(i, F.lit(n))

    parts = []
    for n in NGRAM_SIZES:
        k = F.length(lo) - (n - 1)
        parts.append(
            F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), _sub(n))).otherwise(empty)
        )
    return F.concat(*parts)


def doc_ngrams_col(text):
    """Compat wrapper: 1-3-grams of lower(text).  Prefer classify()'s
    project-then-explode plan on hot paths (see _ngram_parts)."""
    return _ngram_parts(F.lower(text))


CLASSIFY_MAX_CHARS = 512  # classical n-gram LID needs only a prefix; bounds
#                           per-doc work at multi-KB web documents


def classify(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             max_chars: int = CLASSIFY_MAX_CHARS) -> DataFrame:
    """(id, pred_lang, score): argmax over profile languages of the
    integer rank-weight sum of the doc's distinct 1-3-grams; docs
    matching no profile ngram (or empty text) predict 'und'."""
    spark = docs.sparkSession
    ids = docs.select(F.col(id_col).alias("_id"))
    # materialize the lowercase ONCE per row, then gram off the
    # attribute reference (see _ngram_parts for why this ordering)
    lowered = docs.select(
        F.col(id_col).alias("_id"),
        F.lower(F.substring(F.col(text_col), 1, max_chars)).alias("_lo"),
    )
    tg = lowered.select(
        "_id", F.explode(_ngram_parts(F.col("_lo"))).alias("tg")
    ).dropDuplicates(["_id", "tg"])
    # dedup on the NARROW (doc, gram) stream with one linear hash
    # aggregate (cheaper than distinct-ing the post-join stream, which
    # a multi-language gram amplifies), then broadcast-join profiles —
    # each (doc, gram, lang) is unique by construction, so the weight
    # sum counts every distinct doc gram once per language
    scored = (
        tg.join(F.broadcast(profiles_df(spark)), "tg")
        .groupBy("_id", "plang")
        .agg(F.sum("w").alias("s"))
    )
    w = Window.partitionBy("_id").orderBy(F.col("s").desc(), F.col("plang").asc())
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return ids.join(best, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("plang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("score"),
    )


# ---------------------------------------------------------------------------
# Single-pass Arrow scorer — the hot path (VERDICT r02 'What's wrong' #2).
#
# classify() above explodes ~10³ narrow (doc, gram) rows per document
# through a hash-dedup shuffle before the broadcast profile join; linear
# and bounded, but a ~1000× row-amplified shuffle at 100 TB.  This twin
# computes the identical (pred_lang, score) in ONE Arrow-batched pandas
# UDF pass: no explode, no shuffle — the only wide work left is whatever
# the caller does downstream.  Per document it is pure vectorized numpy:
# code points via utf-32 decode, 1/2/3-gram keys by integer base-2²¹
# folding, np.unique for the distinct-gram set, binary search into the
# sorted broadcast profile table, one (hits × langs) weight-matrix sum.
#
# classify() stays as the relational spec: classify_sql() is its DuckDB
# twin, and tests/test_langid.py locks classify_arrow == classify row
# for row (fixture + golden + non-BMP edge cases).
# ---------------------------------------------------------------------------

_CODE_BASE = 1 << 21  # > max code point + 1, so length-n keys never collide


def _gram_key(gram: str) -> int:
    k = 0
    for ch in gram:
        k = k * _CODE_BASE + (ord(ch) + 1)
    return k


@lru_cache(maxsize=1)
def _profile_table():
    """(sorted int64 key array, |keys|×|langs| int64 weight matrix, langs).

    Rebuilt lazily per executor process (build_profiles is deterministic,
    so every executor derives the identical table — nothing to ship)."""
    import numpy as np

    langs = tuple(sorted(SEED_CORPUS))
    lidx = {lang: i for i, lang in enumerate(langs)}
    weights: dict[int, "np.ndarray"] = {}
    for lang, gram, w in build_profiles():
        row = weights.setdefault(_gram_key(gram), np.zeros(len(langs), np.int64))
        row[lidx[lang]] += w
    keys = np.array(sorted(weights), dtype=np.int64)
    mat = np.stack([weights[k] for k in keys])
    return keys, mat, langs


def classify_arrow(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   max_chars: int = CLASSIFY_MAX_CHARS) -> DataFrame:
    """Exact twin of classify() — same schema, same values — in one
    narrow mapPartitions-shaped pass (Arrow-batched pandas UDF)."""
    import pandas as pd

    # no type hints: the hint parser has no Series->DataFrame mapping, but
    # the struct-returning SCALAR pandas UDF is exactly that signature
    def _score_impl(texts):
        import numpy as np

        keys, mat, langs = _profile_table()
        preds: list[str] = []
        scores: list[int] = []
        for t in texts:
            lo = (t or "")[:max_chars].lower()
            if not lo:
                preds.append("und")
                scores.append(0)
                continue
            a = np.frombuffer(lo.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 1
            parts = [a]
            if a.size >= 2:
                parts.append(a[:-1] * _CODE_BASE + a[1:])
            if a.size >= 3:
                parts.append((a[:-2] * _CODE_BASE + a[1:-1]) * _CODE_BASE + a[2:])
            grams = np.unique(np.concatenate(parts))  # distinct, like classify()
            pos = np.searchsorted(keys, grams)
            inside = pos < keys.size
            pos = pos[inside]
            rows = pos[keys[pos] == grams[inside]]
            if rows.size == 0:
                preds.append("und")
                scores.append(0)
                continue
            acc = mat[rows].sum(axis=0)
            # argmax returns the FIRST max — langs is sorted asc, so ties
            # break lang-asc exactly like classify()'s (s desc, plang asc)
            best = int(acc.argmax())
            preds.append(langs[best])
            scores.append(int(acc[best]))
        return pd.DataFrame({"pred_lang": preds, "score": scores})

    _score = F.pandas_udf("struct<pred_lang: string, score: bigint>")(_score_impl)

    return docs.select(
        F.col(id_col), _score(F.col(text_col)).alias("_r")
    ).select(
        id_col,
        F.col("_r.pred_lang").alias("pred_lang"),
        F.col("_r.score").alias("score"),
    )


def classify_sql(table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text",
                 max_chars: int = CLASSIFY_MAX_CHARS) -> str:
    """DuckDB oracle twin of classify() over a registered view."""
    lo = f"lower(substr({text_col}, 1, {max_chars}))"
    grams = " || ".join(
        f"list_transform(generate_series(1, len({lo}) - {n - 1}), "
        f"i -> substr({lo}, CAST(i AS INT), {n}))"
        for n in NGRAM_SIZES
    )
    return f"""WITH {profiles_cte()},
    tg AS (
      SELECT DISTINCT _id, tg FROM (
        SELECT {id_col} AS _id, unnest({grams}) AS tg
        FROM {table} WHERE len({lo}) >= 1)),
    scored AS (
      SELECT _id, plang, sum(w) AS s
      FROM tg JOIN profiles USING (tg) GROUP BY 1, 2),
    best AS (
      SELECT _id, plang, s,
             row_number() OVER (PARTITION BY _id ORDER BY s DESC, plang ASC) AS rn
      FROM scored)
    SELECT d.{id_col} AS {id_col},
           coalesce(b.plang, 'und') AS pred_lang,
           CAST(coalesce(b.s, 0) AS BIGINT) AS score
    FROM {table} d LEFT JOIN best b ON d.{id_col} = b._id AND b.rn = 1"""
