"""End-to-end curation pipeline job (jobs/pipeline.py): funnel counts
monotone, outputs written, deterministic across reruns, survivors
contain no verified near-dup pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.pipeline import run_pipeline


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clean")
    s = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out,
        min_quality=0.3, langs={"en"}, jaccard=0.5,
    )
    assert (
        s["docs_in"] >= s["after_quality"] >= s["after_lang"]
        >= s["after_exact_dedup"] >= s["after_near_dedup"] > 0
    )
    clean = spark.read.parquet(f"{out}/clean")
    assert clean.count() == s["after_near_dedup"]
    # no identical texts survive
    assert clean.groupBy("text").count().filter(F.col("count") > 1).count() == 0
    # no verified near-dup pair survives
    from storm_focused_crawler_spark.operators import dedup as D

    assert D.minhash_lsh_pairs(clean, "doc_id", "text", threshold=0.5).count() == 0
    post = spark.read.parquet(f"{out}/postings")
    assert post.count() > 0
    assert spark.read.parquet(f"{out}/token_df").count() > 0

    # deterministic rerun
    out2 = str(tmp_path / "clean2")
    s2 = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out2,
        min_quality=0.3, langs={"en"}, jaccard=0.5,
    )
    assert s2 == dict(s2, **{k: v for k, v in s.items() if k != "out"})
    ids1 = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out2}/clean").select("doc_id").collect()
    )
    assert ids1 == ids2


def test_pipeline_cluster_vs_pairs_resolution(spark, sf_dir, tmp_path):
    """The cluster rule keeps exactly one survivor per pair-graph
    component (≤ the pairwise rule's survivors); both leave zero
    verified pairs inside the surviving corpus."""
    s_cl = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", str(tmp_path / "cl"),
        0.3, {"en"}, 0.5, dedup_resolution="clusters",
    )
    s_pw = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", str(tmp_path / "pw"),
        0.3, {"en"}, 0.5, dedup_resolution="pairs",
    )
    from storm_focused_crawler_spark.operators import dedup as D

    assert s_cl["after_near_dedup"] <= s_pw["after_near_dedup"]
    for p in ("cl", "pw"):
        clean = spark.read.parquet(str(tmp_path / p / "clean"))
        assert (
            D.minhash_lsh_pairs(clean, "doc_id", "text", threshold=0.5).count() == 0
        )


def test_pipeline_curation_stages(spark, sf_dir, tmp_path):
    """r5 stages: repetition gate in the funnel, optional benchmark
    decontamination, PII scrub columns on the written corpus."""
    # benchmark = the same deterministic slice the decontam_ngram op uses
    bench_path = str(tmp_path / "bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.filter(F.col("doc_id") % 29 == 0).write.parquet(bench_path)

    out = str(tmp_path / "clean")
    s = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out,
        min_quality=0.3, langs={"en"}, jaccard=0.5,
        benchmark_path=bench_path,
    )
    assert s["after_quality"] >= s["after_repetition"] >= s["after_lang"]
    assert s["after_near_dedup"] >= s["after_decontam"]
    clean = spark.read.parquet(f"{out}/clean")
    assert clean.count() == s["after_decontam"]
    for c in ("n_email", "n_ipv4", "n_phone", "has_pii"):
        assert c in clean.columns
    # no survivor shares an 8-gram with the benchmark
    from storm_focused_crawler_spark.operators import curation as CU

    assert CU.decontam_hits(clean, spark.read.parquet(bench_path)).count() == 0
    # no repetition-flagged doc survives
    assert (
        CU.repetition_metrics(clean).filter(~F.col("keep")).count() == 0
    )


def test_pipeline_ppl_gate_and_substr_scrub(spark, sf_dir, tmp_path):
    """r5 stages: CCNet perplexity gate drops exactly the tail-bucket
    survivors; the ExactSubstr scrub removes every flagged span from
    the written corpus."""
    out = str(tmp_path / "clean_ppl")
    s = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out,
        min_quality=0.3, langs={"en"}, jaccard=0.5,
        ppl_drop="tail", substr_scrub=True,
    )
    assert s["after_repetition"] >= s["after_ppl_gate"] >= s["after_lang"]
    # tertile drop removes about a third of the gated set (exact ntile:
    # the dropped bucket is floor(n/3) or ceil(n/3) rows)
    n = s["after_repetition"]
    assert n - s["after_ppl_gate"] in (n // 3, (n + 2) // 3, (n + 1) // 3)
    assert "substr_scrubbed_docs" in s
    clean = spark.read.parquet(f"{out}/clean")
    assert clean.count() == s["after_near_dedup"]
    # scrub ran against the survivor corpus: re-deriving spans on the
    # PRE-scrub survivors and scrubbing in python must agree with at
    # least one rewritten doc (non-vacuity)
    if s["substr_scrubbed_docs"]:
        orig = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.col("text").alias("orig")
        )
        changed = clean.join(orig, "doc_id").filter(
            F.col("text") != F.col("orig")
        )
        assert changed.count() >= 1


def test_pipeline_normalize_host_gate_gopher_stages(spark, sf_dir, tmp_path):
    """r5b stages: NFC/whitespace normalization leaves the (already
    single-spaced ASCII) fixture byte-identical; the host gate drops
    whole sources; the Gopher rules gate drops word-shape failures —
    all three in one run, funnel stays monotone and consistent."""
    from storm_focused_crawler_spark.operators import curation as CU

    out = str(tmp_path / "clean_norm")
    s = run_pipeline(
        spark, f"{sf_dir}/documents.parquet", out,
        min_quality=0.0, langs={"en"}, jaccard=0.5,
        normalize=True, host_gate=True, host_min_quality=0.30,
        host_min_docs=2, gopher_rules=True, gopher_stopwords=["the", "a"],
    )
    assert s["docs_in"] >= s["after_host_gate"] >= s["after_quality"]
    assert s["after_repetition"] >= s["after_gopher_rules"] >= s["after_lang"]
    assert s["after_near_dedup"] > 0

    clean = spark.read.parquet(f"{out}/clean")
    # every surviving source passes the gate's verdict
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = {
        r["source"]
        for r in CU.host_quality_gate(docs, min_quality=0.30, min_docs=2)
        .filter(~F.col("keep")).select("source").distinct().collect()
    }
    assert bad, "host gate vacuous at this threshold"
    assert clean.filter(F.col("source").isin(*bad)).count() == 0
    # no gopher-failing doc survives (rules re-checked on survivors)
    g = CU.gopher_quality_rules(clean, stopwords=["the", "a"])
    assert g.filter(~F.col("keep")).count() == 0
    # normalization idempotent: the surviving text is its own normal form
    renorm = CU.normalize_text(clean.select("doc_id", "text"))
    assert renorm.filter(F.col("text") != F.col("text_norm")).count() == 0


def test_pipeline_cross_batch_incremental_dedup(spark, tmp_path):
    """Two-batch recurring ingestion: batch A runs with --write-sigs;
    batch B runs with --dedup-against A's output and must drop exactly
    its docs that near-dup A's SURVIVORS (not A's pre-dedup inputs),
    without re-signaturing A."""
    import pandas as pd

    # all-distinct tokens per doc (the Gopher repetition gate must NOT
    # fire); the lang gate is bypassed by allowing every possible pred
    base = "the " + " ".join(f"w{i}" for i in range(60))
    variant = base.replace("w30", "zz", 1)           # shingle jaccard ≈ 0.9
    uniq = "the " + " ".join(f"u{i}" for i in range(60))
    novel = "the " + " ".join(f"v{i}" for i in range(60))
    a_rows = [
        (0, base, "en", "src0", len(base)),
        (2, base, "en", "src0", len(base)),      # exact dup of 0 — dropped in A
        (4, uniq, "en", "src1", len(uniq)),
    ]
    b_rows = [
        (1, variant, "en", "src0", len(variant)),  # near-dups A's survivor 0
        (3, uniq + " x1 x2 x3", "en", "src1", len(uniq) + 9),  # near-dups 4
        (5, novel, "en", "src2", len(novel)),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    pa_dir, pb_dir = str(tmp_path / "A.parquet"), str(tmp_path / "B.parquet")
    pd.DataFrame(a_rows, columns=cols).to_parquet(pa_dir)
    pd.DataFrame(b_rows, columns=cols).to_parquet(pb_dir)

    out_a = str(tmp_path / "outA")
    all_langs = {"en", "de", "fr", "es", "zh"}
    sa = run_pipeline(spark, pa_dir, out_a, min_quality=0.0, langs=all_langs,
                      jaccard=0.5, write_sigs=True)
    assert sa["after_near_dedup"] == 2  # 0 survives, 2 dropped, 4 survives
    assert spark.read.parquet(f"{out_a}/minhash_sigs").count() == 2

    out_b = str(tmp_path / "outB")
    sb = run_pipeline(spark, pb_dir, out_b, min_quality=0.0, langs=all_langs,
                      jaccard=0.5, dedup_against=out_a)
    survivors = {r["doc_id"] for r in
                 spark.read.parquet(f"{out_b}/clean").select("doc_id").collect()}
    assert sb["after_cross_dedup"] == len(survivors)
    assert 1 not in survivors      # near-dup of A's doc 0
    assert 3 not in survivors      # near-dup of A's doc 4
    assert 5 in survivors          # novel content passes
