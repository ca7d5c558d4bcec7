"""Pytest locks for the rows-only pipeline operators (dedup / similarity /
fingerprint / multimodal) — these have no DuckDB oracle, so their
semantics are pinned here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators import dedup as D
from storm_focused_crawler_spark.operators import multimodal as MM
from storm_focused_crawler_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra"               # jaccard 10/11 ≈ 0.909 vs base
    far = "completely different words nothing shared at all here friend"
    rows = [
        (1, base), (2, base),            # exact dup pair
        (3, near),                        # near dup of 1/2
        (4, far),
        (6, "tiny"),                      # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_exact_dups_always_found(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    assert pairs.get((1, 2)) == 1.0          # identical sigs → same buckets, jaccard 1
    assert (1, 3) in pairs and (2, 3) in pairs  # 0.909-jaccard near-dups bucket together
    assert round(pairs[(1, 3)], 6) == round(10 / 11, 6)
    assert all(not (a == 4 or b == 4 or a == 6 or b == 6) for a, b in pairs)


def test_simhash_identical_zero_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_near_pairs(docs, "doc_id", "text", max_hamming=12).collect()}
    assert pairs.get((1, 2)) == 0


def test_fingerprint_matches_python_oracle(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {r["doc_id"]: r["fp"] for r in
           d.select("doc_id", D.fingerprint_col(F.col("text")).alias("fp")).collect()}
    for r in d.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == D.fingerprint_py(r["text"]), r["doc_id"]


def test_lsh_knn_multiband_recall_at_design_point(spark, sf_dir):
    """Multi-band OR-amplified LSH (VERDICT r03 #5): with geometry
    DERIVED from a (min_cos, target_recall) design point, true top-k
    neighbors at cosine ≥ min_cos are recalled at ≥ the target rate —
    the guarantee is by construction, not hand-tuning.  min_cos 0.25
    sits below the fixture's whole top-5 cos range, so the check is
    non-vacuous on every brute-force pair.  Exact cos agreement on
    shared pairs stays locked."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    bf = S.brute_force_knn(emb, q, k=5)
    lsh = S.lsh_knn(emb, q, k=5, dim=64, min_cos=0.25, target_recall=0.9)
    bf_rows = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in bf.collect()}
    lsh_rows = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in lsh.collect()}
    assert lsh_rows, "LSH produced no candidates"
    # cos values must agree exactly where both report the same pair
    agree = [k for k in lsh_rows if k in bf_rows]
    assert all(lsh_rows[k] == bf_rows[k] for k in agree)
    above = [k for k, cos in bf_rows.items() if cos >= 0.25]
    assert above, "fixture has no pairs above the design point"
    hit = [k for k in above if k in lsh_rows]
    recall = len(hit) / len(above)
    assert recall >= 0.9, f"design-point recall {recall} < target 0.9"


def test_ivf_knn_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    bf = S.brute_force_knn(emb, q, k=5)
    ivf = S.ivf_knn(emb, q, k=5, n_centroids=16, nprobe=4)
    bf_rows = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in bf.collect()}
    ivf_rows = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in ivf.collect()}
    agree = [k for k in ivf_rows if k in bf_rows]
    assert all(ivf_rows[k] == bf_rows[k] for k in agree)  # exact cos on shared pairs
    # nprobe=4 of 16 clusters scans ~25% of the corpus; kmeans structure
    # should recover well over half of the true top-5
    recall = len(agree) / max(len(bf_rows), 1)
    assert recall >= 0.5, f"recall {recall}"


@pytest.mark.parametrize("fixture", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_embedding_near_pairs_equals_all_pairs(spark, fixture):
    """The banded-LSH plan must be pair-for-pair IDENTICAL to the naive
    all-pairs plan at both fixture scales (deterministic planes + data
    make this exact, not probabilistic) — VERDICT r01 'Next round' #3."""
    emb = spark.read.parquet(f"{fixture}/embeddings.parquet")
    banded = {(r["id_a"], r["id_b"]): r["cos"]
              for r in D.embedding_near_pairs(
                  emb, threshold=0.4, dim=64,
                  n_bands=D.EMB_BANDS, planes_per_band=D.EMB_PLANES_PER_BAND,
              ).collect()}
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = S.cosine_col(F.col("va"), F.col("vb"))
    naive = {(r["id_a"], r["id_b"]): r["cos"]
             for r in a.join(b, F.col("id_a") < F.col("id_b")).filter(cos >= 0.4)
             .select("id_a", "id_b", F.round(cos, 6).alias("cos")).collect()}
    assert banded == naive
    assert len(banded) > 0, "vacuous: fixture has no qualifying pairs"
    # the threshold-DERIVED geometry is probabilistic (0.99/pair by the
    # collision formula) — check empirical recall on the fixture, not
    # exactness (the pinned geometry above carries the exactness lock)
    derived = {(r["id_a"], r["id_b"])
               for r in D.embedding_near_pairs(emb, threshold=0.4, dim=64).collect()}
    assert derived <= set(naive), "verify stage must never emit a false pair"
    assert len(derived) / len(naive) >= 0.9, (len(derived), len(naive))


def test_embedding_near_pairs_plan_has_no_cross_product(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = D.embedding_near_pairs(emb, threshold=0.4, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recall_ops_report_quality(spark, sf_dir):
    """Calibration ops emit per-query recall; IVF (nprobe 4/16) must
    beat 0.5 mean recall, and multi-band LSH beats 0.5 too (the r3
    single-table variant's floor was 0.0; measured 0.64 at sf0.001 /
    0.88 at sf0.01 with the derived (0.4, 0.9) geometry)."""
    from storm_focused_crawler_spark.plans import pipeline_ops  # noqa: F401 — registers ops
    from storm_focused_crawler_spark.plans.queries import REGISTRY

    for name, floor in (("sim_knn_ivf_recall", 0.5), ("sim_knn_lsh_recall", 0.5)):
        fn, _ = REGISTRY[name]
        rows = fn(spark, sf_dir).collect()
        assert rows, name
        mean = sum(r["recall"] for r in rows) / len(rows)
        assert mean > floor, f"{name}: mean recall {mean}"
        assert all(r["n_hit"] <= r["n_true"] for r in rows)


def test_ivf_train_deterministic(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = S.ivf_train(emb, n_centroids=8, iters=1)
    c2 = S.ivf_train(emb, n_centroids=8, iters=1)
    assert np.array_equal(c1, c2)


def test_multimodal_decode_plumbing(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = MM.derive_media(d, "doc_id", "text")
    out = MM.decode_media(media)
    rows = out.collect()
    assert len(rows) == 20
    assert out.columns == ["doc_id", "kind", "n_bytes", "feat0", "feat1", "n_frames"]
    for r in rows:
        assert r["n_bytes"] > 0 and 0 <= r["feat0"] <= 255
        if r["kind"] == "video":
            assert r["n_frames"] >= 1


def test_multimodal_real_decoder_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_media_real(None)


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(10000,), (100,)], "n_bytes long")
    rows = df.select(MM.frame_sample_offsets(F.col("n_bytes")).alias("o")).collect()
    assert rows[0]["o"] == [0, 4096]  # 10000 bytes → 2 frames
    assert rows[1]["o"] == [0]


def test_lsh_geometry_meets_recall_and_prunes():
    """Derived geometry must hit the recall target by the collision
    formula and actually prune at production thresholds (ADVICE r02:
    the loose 8-bucket default yielded ~2N^2 expected candidates)."""
    import math

    for t in (0.0, 0.4, 0.6, 0.8, 0.9, 0.95):
        b, r = D.lsh_geometry(t, target_recall=0.99)
        p = 1.0 - math.acos(t) / math.pi
        recall = 1.0 - (1.0 - p**r) ** b
        assert recall >= 0.99, (t, b, r, recall)
        assert b <= 64
    # production threshold: expected candidate fraction b*2^-r well below 1
    b, r = D.lsh_geometry(0.8)
    assert b * 2.0**-r <= 0.25, (b, r)
    b9, r9 = D.lsh_geometry(0.9)
    assert b9 * 2.0**-r9 <= b * 2.0**-r  # tighter threshold prunes at least as hard
    import pytest as _pytest
    with _pytest.raises(ValueError):
        D.lsh_geometry(1.0)


def test_incremental_minhash_equals_full_run_restricted(spark, sf_dir):
    """incremental_minhash_pairs == minhash_lsh_pairs(full corpus)
    restricted to pairs touching the batch — candidate generation,
    verification, and threshold all agree; and the registry op
    (signatures via the snapshot store) returns the same set."""
    from pyspark.sql import functions as F

    from storm_focused_crawler_spark.operators import dedup as D
    from storm_focused_crawler_spark.plans.pipeline_ops import (
        dedup_minhash_incremental,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.minhash_lsh_pairs(d, "doc_id", "text", 0.5).collect()
    }
    want = {(a, b, j) for a, b, j in full if a % 4 == 0 or b % 4 == 0}
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_incremental(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "no batch-touching near-dup pair at this sf — vacuous"
    # both cross and within-batch pairs are exercised
    assert any(a % 4 == 0 and b % 4 == 0 for a, b, _ in want)
    assert any((a % 4 == 0) != (b % 4 == 0) for a, b, _ in want)


def test_incremental_minhash_plan_broadcasts_batch_bands(spark, sf_dir):
    """The stored-signature side streams; the batch band buckets are
    the broadcast side of the cross-candidate join, and corpus text is
    joined only by candidate id (no full-corpus band self-join)."""
    from storm_focused_crawler_spark.plans.pipeline_ops import (
        dedup_minhash_incremental,
    )

    plan = (
        dedup_minhash_incremental(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_col_matches_python_twin(spark, sf_dir):
    """The integer getbit rewrite computes the exact (hi, lo) values of
    the original bin()-string fold — locked via the spec.xxh64-based
    python twin on real fixture texts."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    got = {r["doc_id"]: (r["sh"]["hi"], r["sh"]["lo"]) for r in
           d.select("doc_id", D.simhash_col(F.col("text")).alias("sh")).collect()}
    for r in d.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == D.simhash_py(r["text"]), r["doc_id"]


def test_corpus_stats_report_matches_duckdb(spark, sf_dir):
    """Data-card numbers double-exact vs DuckDB, including the
    interpolated median, over every (lang, source) group."""
    import duckdb

    from storm_focused_crawler_spark.plans.pipeline_ops import (
        CORPUS_STATS_ORACLE,
        corpus_stats_report,
    )

    got = {(r["lang"], r["source"]):
           (r["n_docs"], r["sum_tokens"], r["mean_tokens"], r["median_chars"])
           for r in corpus_stats_report(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {(l, s): (n, st, mt, mc)
            for l, s, n, st, mt, mc in con.execute(CORPUS_STATS_ORACLE).fetchall()}
    assert got == want
    assert len(got) > 1
