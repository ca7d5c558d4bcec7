"""spark-submit entry point for the training-data curation pipeline.

The crawl engine's sibling job: where jobs/crawl.py produces the
corpus, this consumes one — the standard LLM-data curation sweep over
a documents table, built entirely from this repo's registry operators:

    unicode NFC normalization (optional --normalize, CCNet/FineWeb
    first pass via operators/curation.normalize_text)
  → domain-level gate (optional --host-gate: judge the SOURCE —
    operators/curation.host_quality_gate, RefinedWeb-style)
  → quality filter (text_quality_score)
  → repetition filter (operators/curation, Gopher A1.1 fractions)
  → Gopher A1 heuristics (optional --gopher-rules: word/line-shape
    rules via operators/curation.gopher_quality_rules)
  → LM-perplexity gate (optional --ppl-drop, CCNet-style tertile
    buckets via operators/curation.lm_perplexity)
  → language ID + gate (functions/langid, char 1-3-gram profiles)
  → exact dedup (keep min doc_id per identical text)
  → near-dup removal (MinHash-LSH verified pairs → resolution rule)
  → cross-batch dedup (optional --dedup-against PRIOR_OUT: drop docs
    near-dupping the PRIOR run's survivors, via the persisted MinHash
    signatures operators/dedup.incremental_minhash_pairs consumes —
    the corpus is never re-signatured; --write-sigs persists this
    run's survivor signatures for the NEXT batch)
  → benchmark decontamination (optional --benchmark parquet, GPT-3
    App. C word-8-gram rule via operators/curation.decontam_hits)
  → ExactSubstr scrub (optional --substr-scrub, after Lee et al. 2021;
    NOTE: ALL occurrences of a corpus-duplicated 20-token span are
    removed — stricter than the paper's keep-one-copy removal, see
    operators/dedup.exact_substring_scrub)
  → PII scrub (emails/IPv4/phones redacted in the surviving text)
  → inverted-index build (operators/text_index postings + token_df)

Near-dup resolution (--dedup-resolution):
  * ``clusters`` (default, the standard corpus-dedup rule): connected
    components over the pair graph, keep the min id per component
    (operators/dedup.cluster_keepers).  A star {1~3, 2~3} keeps only
    doc 1 — every component contributes exactly one survivor.
  * ``pairs`` (the pre-round-3 rule, kept for compat): drop the larger
    id of every verified pair.  The same star keeps {1, 2} (they are
    not near-dups of each other), but a chain {1~2, 2~3} drops doc 3
    whose only match was itself dropped.
  Both rules leave a survivor set with zero verified pairs inside it.

Outputs under --out: clean/ (surviving docs), postings/, token_df/,
minhash_sigs/ (with --write-sigs — next batch's --dedup-against input),
and a summary JSON line on stdout (one line, machine-readable — same
contract as bench.py).

Local smoke:
    spark-submit --master local[8] --py-files dist/crawler.zip \
        jobs/pipeline.py --sf-dir /root/testdata/sf0.001 --out /tmp/clean

At 100 TB every stage is the scale-shaped plan the operator modules
document: one hash-agg shuffle per dedup family, banded equi-joins for
near-dup candidates, broadcast profile join for language ID.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="training-data curation pipeline")
    ap.add_argument("--sf-dir", default=None, help="testdata dir containing documents.parquet")
    ap.add_argument("--documents", default=None, help="explicit documents parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default="en", help="comma-separated allowed pred langs")
    ap.add_argument("--jaccard", type=float, default=0.5, help="near-dup threshold")
    ap.add_argument("--dedup-resolution", choices=("clusters", "pairs"),
                    default="clusters",
                    help="near-dup survivor rule (see module docstring)")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval docs (text column) to decontaminate "
                    "against; omitted = stage skipped")
    ap.add_argument("--ppl-drop", choices=("none", "tail", "middle+tail"),
                    default="none",
                    help="CCNet-style LM-perplexity gate: drop these tertile "
                    "buckets (LM trained on the doc_id%%5 slice of the "
                    "already-gated corpus); none = stage skipped")
    ap.add_argument("--dedup-against", default=None,
                    help="a PRIOR run's --out dir: drop docs near-dupping "
                    "its survivors (reads clean/ + minhash_sigs/)")
    ap.add_argument("--write-sigs", action="store_true",
                    help="persist survivor MinHash signatures under --out "
                    "for the next batch's --dedup-against")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + whitespace-collapse the text first, so "
                    "byte-variants hash/dedup together")
    ap.add_argument("--host-gate", action="store_true",
                    help="drop every doc of a source whose aggregate "
                    "quality fails the floor (needs a source column)")
    ap.add_argument("--host-min-quality", type=float, default=0.3)
    ap.add_argument("--host-min-docs", type=int, default=5)
    ap.add_argument("--gopher-rules", action="store_true",
                    help="Gopher A1 word/line-shape heuristics gate")
    ap.add_argument("--gopher-stopwords", default=None,
                    help="comma-separated stop set for the Gopher "
                    "stop-word rule (default: the published set)")
    ap.add_argument("--substr-scrub", action="store_true",
                    help="ExactSubstr pass (Lee et al. 2021): remove 20-token "
                    "spans duplicated >=2x corpus-wide from surviving text")
    return ap.parse_args(argv)


def run_pipeline(spark, docs_path: str, out: str, min_quality: float,
                 langs: set[str], jaccard: float,
                 dedup_resolution: str = "clusters",
                 benchmark_path: str | None = None,
                 ppl_drop: str = "none",
                 substr_scrub: bool = False,
                 normalize: bool = False,
                 host_gate: bool = False,
                 host_min_quality: float = 0.3,
                 host_min_docs: int = 5,
                 gopher_rules: bool = False,
                 gopher_stopwords: list[str] | None = None,
                 dedup_against: str | None = None,
                 write_sigs: bool = False) -> dict:
    from pyspark.sql import functions as F

    from storm_focused_crawler_spark.functions import langid as L
    from storm_focused_crawler_spark.operators import curation as CU
    from storm_focused_crawler_spark.operators import dedup as D
    from storm_focused_crawler_spark.operators import text_index as TI

    d = spark.read.parquet(docs_path)
    n_in = d.count()

    # 0. unicode normalization (optional): NFC + whitespace collapse so
    # every downstream hash/dedup/fingerprint sees one byte form
    if normalize:
        d = CU.normalize_text(d).drop("text").withColumnRenamed("text_norm", "text")

    # 0b. domain-level gate (optional): aggregate quality per source and
    # drop failing sources wholesale (RefinedWeb-style)
    n_host = None
    if host_gate:
        verdict = CU.host_quality_gate(
            d, min_quality=host_min_quality, min_docs=host_min_docs
        )
        keep_ids = verdict.filter(F.col("keep")).select("doc_id")
        d = d.join(keep_ids, "doc_id").persist()
        n_host = d.count()

    # 1. quality gate (same heuristics as the text_quality_score op)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stops = F.filter(F.split("text", " "), lambda x: (x == "the") | (x == "a"))
    q = d.withColumn("n_tok", F.size(toks)).withColumn("n_stop", F.size(stops))
    q = q.filter(F.col("n_tok") > 0).withColumn(
        "quality",
        F.round(
            0.5 * F.least(F.col("n_tok") / 100.0, F.lit(1.0))
            + 0.5 * (F.col("n_stop") / F.col("n_tok").cast("double")),
            6,
        ),
    ).filter(F.col("quality") >= min_quality).drop("n_tok", "n_stop")
    # each stage count is an action; persist the gated frame so the
    # quality filter + langid scorer don't recompute for every later count
    q = q.persist()
    n_quality = q.count()

    # 1b. repetition gate (Gopher A1.1): drop docs dominated by a
    # repeated n-gram before spending language-ID / dedup work on them
    rep_keep = CU.repetition_metrics(q).filter(F.col("keep")).select("doc_id")
    q2 = q.join(rep_keep, "doc_id").persist()
    n_repetition = q2.count()
    q.unpersist()
    q = q2

    # 1b2. Gopher A1 word/line-shape heuristics (optional)
    n_gopher = None
    if gopher_rules:
        g = CU.gopher_quality_rules(q, stopwords=gopher_stopwords)
        q2 = q.join(g.filter(F.col("keep")).select("doc_id"), "doc_id").persist()
        n_gopher = q2.count()
        q.unpersist()
        q = q2

    # 1c. CCNet-style perplexity gate (optional): bucket by bigram-LM
    # perplexity (operators/curation.lm_perplexity, LM trained on the
    # deterministic doc_id%5 slice of the gated corpus) and drop the
    # requested tertiles
    n_ppl = None
    if ppl_drop != "none":
        drop = {"tail"} if ppl_drop == "tail" else {"middle", "tail"}
        uni, bi = CU.lm_bigram_counts(q.filter(F.col("doc_id") % 5 == 0))
        st = uni.agg(F.sum("c1").alias("n"), F.count("*").alias("v")).collect()[0]
        buckets = CU.lm_perplexity(q, uni, bi, int(st["n"]), int(st["v"]))
        keep_ids = buckets.filter(~F.col("bucket").isin(*drop)).select("doc_id")
        q2 = q.join(keep_ids, "doc_id").persist()
        n_ppl = q2.count()
        q.unpersist()
        q = q2

    # 2. language gate on PREDICTED language (labels may be absent/wrong);
    # classify_arrow = single-pass scorer, no gram-explode shuffle
    pred = L.classify_arrow(q.select("doc_id", "text"))
    gated = q.join(
        pred.filter(F.col("pred_lang").isin(*langs)).select("doc_id"), "doc_id"
    ).persist()
    n_lang = gated.count()
    q.unpersist()
    q = gated

    # 3. exact dedup: keep the min doc_id per identical text
    keepers = q.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    q = q.join(keepers, "doc_id")
    n_exact = q.count()

    # 4. near-dup removal: verified MinHash pairs → survivor rule
    pairs = D.minhash_lsh_pairs(q, "doc_id", "text", threshold=jaccard)
    if dedup_resolution == "clusters":
        # connected components, one survivor (min id) per component
        comp = D.cluster_keepers(pairs)
        losers = comp.filter(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    else:
        # pairwise rule: drop the larger id of each pair (id_a < id_b)
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = q.join(losers, "doc_id", "left_anti").persist()
    n_clean = clean.count()

    # 4a2. cross-batch dedup (optional): drop survivors near-dupping a
    # PRIOR run's surviving corpus — its signatures were persisted by
    # --write-sigs, so the prior corpus is never re-signatured and its
    # text is read only for candidate ids (incremental_minhash_pairs)
    n_cross = None
    if dedup_against:
        prior_clean = spark.read.parquet(f"{dedup_against}/clean")
        prior_sigs = spark.read.parquet(
            f"{dedup_against}/minhash_sigs"
        ).withColumnRenamed("doc_id", "_id")  # minhash_signature shape
        pairs_x = D.incremental_minhash_pairs(
            clean, prior_clean, prior_sigs, "doc_id", "text", jaccard
        )
        prior_ids = prior_clean.select(F.col("doc_id").alias("pid"))
        # drop the CURRENT side of every cross pair (either endpoint may
        # be the prior doc — resolve by membership, not id order)
        drop = (
            pairs_x.join(prior_ids, pairs_x.id_a == F.col("pid"), "left")
            .withColumn("victim", F.when(F.col("pid").isNotNull(), F.col("id_b")).otherwise(F.col("id_a")))
            .select(F.col("victim").alias("doc_id")).distinct()
        )
        clean2 = clean.join(drop, "doc_id", "left_anti").persist()
        n_cross = clean2.count()
        clean.unpersist()
        clean = clean2

    # 4b. benchmark decontamination (GPT-3 App. C): drop survivors
    # sharing any word 8-gram with the eval set
    n_decontam = None
    if benchmark_path:
        bench = spark.read.parquet(benchmark_path)
        contaminated = CU.decontam_hits(clean, bench).select("doc_id")
        clean2 = clean.join(contaminated, "doc_id", "left_anti").persist()
        n_decontam = clean2.count()
        clean.unpersist()
        clean = clean2

    # 4b2. ExactSubstr scrub (optional, Lee et al. 2021): remove
    # 20-token spans duplicated >=2x across the SURVIVING corpus from
    # the text itself (span discovery = slim-hash candidates + text
    # verify; removal = per-row position filter)
    n_substr_docs = None
    if substr_scrub:
        spans = D.exact_substring_spans(clean, window=20)
        n_substr_docs = spans.select("doc_id").distinct().count()
        clean = D.exact_substring_scrub(clean, spans)

    # 4c. PII scrub: redact emails/IPv4/phones in the surviving text
    # (per-row codegen, no shuffle); keep the per-doc counts as columns
    clean = CU.pii_scrub(clean, "text")

    if write_sigs:
        # survivor signatures for the NEXT batch's --dedup-against
        D.minhash_signature(clean, "doc_id", "text").withColumnRenamed(
            "_id", "doc_id"
        ).write.mode("overwrite").parquet(f"{out}/minhash_sigs")

    # 5. inverted index over the surviving (redacted) corpus
    post = TI.postings(clean, "doc_id", "text")
    clean.write.mode("overwrite").parquet(f"{out}/clean")
    post.write.mode("overwrite").parquet(f"{out}/postings")
    TI.token_df(spark.read.parquet(f"{out}/postings")).write.mode("overwrite").parquet(
        f"{out}/token_df"
    )
    clean.unpersist()
    q.unpersist()
    summary = {
        "docs_in": n_in,
        "after_quality": n_quality,
        "after_repetition": n_repetition,
        "after_lang": n_lang,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_clean,
        "dedup_resolution": dedup_resolution,
        "out": out,
    }
    if n_cross is not None:
        summary["after_cross_dedup"] = n_cross
    if n_host is not None:
        summary["after_host_gate"] = n_host
    if n_gopher is not None:
        summary["after_gopher_rules"] = n_gopher
    if n_ppl is not None:
        summary["after_ppl_gate"] = n_ppl
    if n_decontam is not None:
        summary["after_decontam"] = n_decontam
    if n_substr_docs is not None:
        summary["substr_scrubbed_docs"] = n_substr_docs
    return summary


def main(argv=None) -> int:
    args = parse_args(argv)
    docs = args.documents or (args.sf_dir and f"{args.sf_dir}/documents.parquet")
    if not docs:
        print("error: --sf-dir or --documents required", file=sys.stderr)
        return 2
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("data-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    summary = run_pipeline(
        spark, docs, args.out, args.min_quality,
        set(args.langs.split(",")), args.jaccard,
        dedup_resolution=args.dedup_resolution,
        benchmark_path=args.benchmark,
        ppl_drop=args.ppl_drop,
        substr_scrub=args.substr_scrub,
        normalize=args.normalize,
        host_gate=args.host_gate,
        host_min_quality=args.host_min_quality,
        host_min_docs=args.host_min_docs,
        gopher_rules=args.gopher_rules,
        gopher_stopwords=(
            args.gopher_stopwords.split(",") if args.gopher_stopwords else None
        ),
        dedup_against=args.dedup_against,
        write_sigs=args.write_sigs,
    )
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
