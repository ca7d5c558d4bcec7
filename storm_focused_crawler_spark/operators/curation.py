"""Curation-filter operators: Gopher repetition metrics, PII scrub,
benchmark n-gram decontamination.

The registry ops in plans/pipeline_ops.py wrap these over the fixture
tables (with deterministic derived PII/benchmark universes); the
runnable curation job (jobs/pipeline.py) applies the same functions to
arbitrary document frames.  All three are pure JVM column/agg plans —
no Python in the hot path.

Public sources: Rae et al. 2021 (Gopher) Appendix A1.1 repetition
filters; Brown et al. 2020 (GPT-3) Appendix C n-gram decontamination;
FineWeb's PII normalization pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_focused_crawler_spark.functions.udfs import tokens_col

PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"


def repetition_metrics(
    d: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = 0.20,
    top3_max: float = 0.18,
    dup3_max: float = 0.10,
) -> DataFrame:
    """Per-doc Gopher A1.1 repetition fractions + keep flag.

    Char mass of the most frequent word 2-/3-gram and of duplicated
    3-grams, over len(text).  100 TB shape: one explode + two hash
    aggregations (both map-side combinable; a doc's grams originate in
    one input row, so partial aggregation collapses duplicates before
    the shuffle); gram rows carry (id, n, gram) only, never the text.
    """
    from storm_focused_crawler_spark.functions.udfs import rebalance_small_scan

    # parallelism floor on the TOKENIZED projection (not the raw text
    # column): a single-split fixture scan would run the whole gram
    # explode in one task; no-op at real scale (guide §2.5)
    toks = rebalance_small_scan(
        d.select(
            F.col(id_col), F.length(text_col).alias("nc"),
            F.split(text_col, " ").alias("w"),
        )
    )
    grams = toks.select(
        id_col,
        F.explode(
            F.expr(
                """flatten(transform(array(2, 3), n ->
                     CASE WHEN size(w) >= n THEN
                       transform(sequence(1, size(w) - n + 1),
                                 i -> struct(n AS n, concat_ws(' ', slice(w, i, n)) AS g))
                     ELSE array() END))"""
            )
        ).alias("ng"),
    ).select(id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    cnt = grams.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    mass = F.col("c") * F.length("g")
    per = cnt.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, mass)).alias("top2"),
        F.max(F.when(F.col("n") == 3, mass)).alias("top3"),
        F.sum(F.when((F.col("n") == 3) & (F.col("c") >= 2), mass).otherwise(0)).alias("dup3"),
    )
    j = toks.select(id_col, "nc").join(per, id_col, "left")
    nc = F.col("nc").cast("double")
    f2 = F.coalesce(F.col("top2"), F.lit(0)) / nc
    f3 = F.coalesce(F.col("top3"), F.lit(0)) / nc
    fd = F.coalesce(F.col("dup3"), F.lit(0)) / nc
    return j.select(
        id_col,
        F.round(f2, 6).alias("top2gram_char_frac"),
        F.round(f3, 6).alias("top3gram_char_frac"),
        F.round(fd, 6).alias("dup3gram_char_frac"),
        ((f2 <= top2_max) & (f3 <= top3_max) & (fd <= dup3_max)).alias("keep"),
    )


def pii_scrub(d: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_email/n_ipv4/n_phone/has_pii and REPLACE text_col with
    its redacted form (<EMAIL>/<IP>/<PHONE> placeholders).

    Pure per-row JVM regex in whole-stage codegen — no shuffle."""
    body = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(body, F.lit(PII_EMAIL), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(body, F.lit(PII_IPV4), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(body, F.lit(PII_PHONE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")
    return (
        d.withColumn("n_email", n_email)
        .withColumn("n_ipv4", n_ipv4)
        .withColumn("n_phone", n_phone)
        .withColumn("has_pii", (n_email + n_ipv4 + n_phone) > 0)
        .withColumn(text_col, redacted)
    )


def _gram_arr(text_col: str, n: int):
    """Locally-deduped word n-gram array for one row (no shuffle)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}),"
            f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
        )
    )


def decontam_hits(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_shared_grams) for corpus docs sharing any word n-gram with
    the benchmark frame (GPT-3 App. C rule).

    100 TB shape: the benchmark gram set is eval-set-sized → broadcast;
    corpus grams are deduped per-doc LOCALLY (array_distinct on the
    per-row gram array), so the corpus side is one explode + broadcast
    join + one hash agg over contamination-sized hits — the corpus is
    never shuffled on gram."""
    wc = F.size(F.split(text_col, " "))
    bgrams = (
        bench.filter(wc >= n)
        .select(F.explode(_gram_arr(text_col, n)).alias("g"))
        .distinct()
    )
    cgrams = (
        corpus.filter(wc >= n)
        .select(id_col, F.explode(_gram_arr(text_col, n)).alias("g"))
    )
    return (
        cgrams.join(F.broadcast(bgrams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def lm_bigram_counts(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train-side tables of the CCNet-style bigram LM (Wenzek et al.
    2020 trains a KenLM on a clean reference corpus and buckets the
    crawl by perplexity; the relational instantiation is an
    interpolated bigram model, exactly spec-able in SQL).

    Returns (unigrams(w, c1), bigrams(w1, w2, c2)) over the reference
    frame — two hash aggregations off per-row gram arrays.  At 100 TB
    the reference slice is Wikipedia-sized by construction (the model
    is deliberately trained on a small clean corpus), so both tables
    are dim-like relative to the crawl being scored."""
    from storm_focused_crawler_spark.functions.udfs import rebalance_small_scan

    toks = rebalance_small_scan(ref.select(tokens_col(F.col(text_col)).alias("w")))
    uni = (
        toks.select(F.explode("w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        toks.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count("*").alias("c2"))
    )
    return uni, bi


def lm_perplexity(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    n_total: int,
    vocab: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
) -> DataFrame:
    """Per-doc perplexity under the interpolated bigram LM + CCNet
    head/middle/tail bucket.

      p(w2|w1) = lam * c2(w1,w2)/c1(w1)  +  (1-lam) * (c1(w2)+1)/(N+V)

    (the backoff term is add-1 unigram, so p > 0 for unseen words);
    ppl = exp(-mean ln p) over the doc's consecutive token pairs,
    rounded to 6 dp.  Buckets are exact tertiles by ntile(3) ordered
    (ppl, id) — head = most reference-like.  ntile is row-count based,
    so Spark and DuckDB agree bit-for-bit (no quantile interpolation).

    100 TB shape: the LM tables join by gram key (broadcast when they
    fit, shuffle-hash otherwise — they are reference-corpus-sized, not
    crawl-sized); scoring is one explode + three joins + one per-doc
    agg.  The ntile is a single global sort over DOC-level rows (3-4
    orders of magnitude fewer than tokens); a deployment scoring an
    unbounded stream would freeze thresholds from a calibration run
    instead — the bucketing rule itself is the spec here.
    """
    from pyspark.sql import Window as W

    from storm_focused_crawler_spark.functions.udfs import rebalance_small_scan

    pairs = (
        rebalance_small_scan(
            docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("w"))
        )
        .filter(F.size("w") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    scored = (
        pairs.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1_w1"))), "w1", "left")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2"))), "w2", "left")
        .withColumn(
            "p",
            F.lit(lam)
            * F.coalesce(F.col("c2") / F.col("c1_w1"), F.lit(0.0))
            + F.lit(1.0 - lam)
            * (F.coalesce(F.col("c1_w2"), F.lit(0)) + F.lit(1.0))
            / F.lit(float(n_total + vocab)),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.exp(-F.avg(F.log("p"))), 6).alias("ppl"),
        F.count("*").alias("n_bigrams"),
    )
    tile = F.ntile(3).over(W.orderBy("ppl", id_col))
    return per_doc.select(
        id_col, "ppl", "n_bigrams",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tile
        ).alias("bucket"),
    )


def url_blocklist_filter(
    urls: DataFrame,
    blocked_hosts: list[str],
    banned_terms: list[tuple[str, float]],
    threshold: float = 1.0,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """RefinedWeb-style URL gate (Penedo et al. 2023 §Document prep):
    drop documents whose host is on an explicit blocklist OR whose URL
    accumulates >= *threshold* of soft banned-term weight (each banned
    substring contributes its weight once if present).

    Adds host_blocked / badword_score / keep.  100 TB shape: the
    blocklist is dim-sized → broadcast left-semi-ish join marks hosts;
    the term score is a per-row JVM fold in whole-stage codegen — the
    corpus never shuffles for this gate."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    bl = spark.createDataFrame([(h,) for h in blocked_hosts], f"{host_col} string")
    # start from 0.0 so an empty banned_terms list degrades to
    # host-blocklist-only gating instead of a None column (ADVICE r05)
    score = F.lit(0.0)
    for term, w in banned_terms:
        score = score + F.when(F.col(url_col).contains(term), F.lit(w)).otherwise(F.lit(0.0))
    marked = urls.join(
        F.broadcast(bl.withColumn("_blk", F.lit(True))), host_col, "left"
    )
    return (
        marked.withColumn("host_blocked", F.coalesce(F.col("_blk"), F.lit(False)))
        .withColumn("badword_score", score)
        .withColumn(
            "keep",
            ~F.col("host_blocked") & (F.col("badword_score") < F.lit(threshold)),
        )
        .drop("_blk")
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    keep each row of stratum s with rate rates[s] (default_rate
    otherwise), decided by integer arithmetic on the id — fully
    reproducible across engines and runs (Knuth multiplicative hash
    mod 1000 vs rate*1000; no RNG state anywhere).

    100 TB shape: a broadcast rate join + one per-row integer
    predicate; no shuffle, no sampling skew (the hash decorrelates ids
    from the strata)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    rt = spark.createDataFrame(
        [(s, int(round(r * 1000))) for s, r in rates.items()],
        f"{strata_col} string, _permille int",
    )
    bucket = ((F.col(id_col) * F.lit(2654435761)) % 1000).cast("int")
    return (
        df.join(F.broadcast(rt), strata_col, "left")
        .withColumn(
            "_permille",
            F.coalesce(F.col("_permille"), F.lit(int(round(default_rate * 1000)))),
        )
        .filter(bucket < F.col("_permille"))
        .drop("_permille")
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    stopwords: list[str] | None = None,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality heuristics (Rae et al. 2021, Appendix A1 — the
    non-repetition rules; repetition is :func:`repetition_metrics`):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (`#` + `...`), bullet-line and ellipsis-line fractions, fraction
    of words with an alphabetic character, and distinct-stop-word
    presence.  Emits one row per doc with every metric (round 6), each
    rule's verdict folded into a single `keep` flag.

    Line rules read the doc's LINES (split on newline, `- ` prefix =
    bullet, `...` suffix = ellipsis); docs without newlines are one
    line.  All metrics are integer counts with one final division +
    round(6), so engine and oracle agree bitwise; thresholds are
    parameters (defaults = the published Gopher values).

    100 TB shape: pure per-row JVM array/string expressions — no
    shuffle, no UDF, whole-stage codegen end to end."""
    stopwords = GOPHER_STOPWORDS if stopwords is None else stopwords
    words = F.filter(F.split(text_col, "[ \\n]+"), lambda x: x != "")
    lines = F.filter(F.split(text_col, "\n"), lambda x: x != "")
    d = df.select(
        id_col,
        F.size(words).alias("n_words"),
        F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x)).alias("sum_len"),
        F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))).alias("n_alpha"),
        F.size(lines).alias("n_lines"),
        F.size(F.filter(lines, lambda x: x.startswith("- "))).alias("n_bullet"),
        F.size(F.filter(lines, lambda x: x.endswith("..."))).alias("n_ellipsis"),
        (
            (F.length(text_col) - F.length(F.regexp_replace(text_col, r"\.\.\.", "")))
            / F.lit(3)
            + (F.length(text_col) - F.length(F.regexp_replace(text_col, "#", "")))
        ).cast("int").alias("n_sym"),
        F.size(
            F.array_intersect(
                F.array_distinct(words), F.array(*[F.lit(s) for s in stopwords])
            )
        ).alias("stop_hits"),
    ).filter((F.col("n_words") > 0) & (F.col("n_lines") > 0))
    mean_wl = F.round(F.col("sum_len") / F.col("n_words"), 6)
    sym = F.round(F.col("n_sym") / F.col("n_words"), 6)
    bullet = F.round(F.col("n_bullet") / F.col("n_lines"), 6)
    ellipsis = F.round(F.col("n_ellipsis") / F.col("n_lines"), 6)
    alpha = F.round(F.col("n_alpha") / F.col("n_words"), 6)
    return d.select(
        id_col,
        "n_words",
        mean_wl.alias("mean_word_len"),
        sym.alias("sym_ratio"),
        bullet.alias("bullet_frac"),
        ellipsis.alias("ellipsis_frac"),
        alpha.alias("alpha_frac"),
        "stop_hits",
        (
            F.col("n_words").between(min_words, max_words)
            & mean_wl.between(min_mean_word_len, max_mean_word_len)
            & (sym <= max_symbol_ratio)
            & (bullet <= max_bullet_frac)
            & (ellipsis <= max_ellipsis_frac)
            & (alpha >= min_alpha_frac)
            & (F.col("stop_hits") >= min_stop_hits)
        ).alias("keep"),
    )


def host_quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    min_quality: float = 0.30,
    min_docs: int = 5,
) -> DataFrame:
    """Domain-level quality gating (RefinedWeb / C4 style: judge the
    SOURCE, not just the doc): aggregate a corpus-quality score per
    source — mean tokens/doc (capped contribution) blended with the
    stop-word mass — and keep every doc whose source clears both the
    quality floor and a minimum-document support.  A noisy host with
    consistently thin or stop-word-starved pages is dropped wholesale,
    which doc-level filters can't express.

    Scores are integer sums (tokens, stop tokens, docs) aggregated per
    source with ONE final double expression + round(6), so the verdict
    is order-independent and engine-exact.

    100 TB shape: one map-side-combinable hash agg onto the source key
    (dim-sized output), then a broadcast join of the per-source verdict
    back onto the docs — the corpus itself never shuffles."""
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    stops = F.filter(F.split(text_col, " "), lambda x: (x == "the") | (x == "a"))
    per_doc = df.select(
        id_col, group_col,
        F.size(toks).alias("n_tok"), F.size(stops).alias("n_stop"),
    ).filter(F.col("n_tok") > 0)
    per_src = per_doc.groupBy(group_col).agg(
        F.count("*").alias("src_docs"),
        F.sum("n_tok").alias("sum_tok"),
        F.sum("n_stop").alias("sum_stop"),
    )
    qual = F.round(
        0.5 * F.least(F.col("sum_tok") / F.col("src_docs") / 100.0, F.lit(1.0))
        + 0.5 * F.col("sum_stop") / F.col("sum_tok"),
        6,
    )
    verdict = per_src.select(
        group_col,
        "src_docs",
        qual.alias("src_quality"),
        ((qual >= min_quality) & (F.col("src_docs") >= min_docs)).alias("keep"),
    )
    return per_doc.select(id_col, group_col).join(F.broadcast(verdict), group_col)


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Unicode NFC normalization + whitespace collapse + edge trim —
    the standard first pass of a web-text curation pipeline (CCNet /
    FineWeb normalize before hashing, so byte-level variants of the
    same string dedup and fingerprint together).

    The whitespace collapse ([ \\t\\r\\n]+ → one space, then trim) runs
    JVM-side in whole-stage codegen; NFC has no JVM builtin, so it is
    the sanctioned Arrow slow path — ONE vectorized pandas-UDF batch
    pass, no shuffle, no per-row Python round trips.  Collapse and NFC
    commute (NFC neither creates nor destroys ASCII whitespace), so
    running the cheap JVM step first only shrinks the Arrow payload.

    100 TB shape: embarrassingly parallel per-row map; cost is one
    Arrow serialization of the text column per batch."""
    # no type hints: `from __future__ import annotations` stringifies
    # them and the hint parser can't resolve 'pd.Series' — the plain
    # SCALAR pandas UDF is exactly this signature (langid.classify_arrow
    # uses the same convention)
    def _nfc_impl(s):
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    _nfc = F.pandas_udf("string")(_nfc_impl)

    collapsed = F.trim(F.regexp_replace(F.col(text_col), "[ \t\r\n]+", " "))
    return df.withColumn(out_col, _nfc(collapsed))
