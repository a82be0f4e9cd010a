"""Recall/quality harness for the approximate family: pins the knobs a
user actually tunes — banded embedding-dedup recall vs brute force, LSH
ANN recall@10 vs exact, MinHash est_jaccard error vs exact n-gram
Jaccard. Ground truths are the exact operators already oracle-verified
by the driver (emb_dup_exact / ann_cosine_all / ngram_jaccard)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics import dedup, similarity


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .cache()
    )


def test_lsh_band_params_geometry():
    """Parameter chooser: predicted candidate probability at the threshold
    must clear the recall target within the plane budget."""
    for threshold in (0.95, 0.8, 0.5, 0.3):
        b, r = similarity.lsh_band_params(threshold, target_recall=0.98)
        p = 1.0 - math.acos(threshold) / math.pi
        assert 1.0 - (1.0 - p**r) ** b >= 0.98, (threshold, b, r)
        assert b * r <= 192
    # the documented 0.95 setting
    assert similarity.lsh_band_params(0.95) == (14, 13)


def _exact_pairs(embeddings, threshold: float) -> set[tuple[int, int]]:
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    rows = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", similarity.cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
        .collect()
    )
    return {(r.id_a, r.id_b) for r in rows}


def test_banded_dup_pairs_recall_vs_exact(embeddings):
    """Multi-band blocking recall ≥ 0.95 against brute-force ground truth.
    The test corpus has no pairs above cosine 0.5, so the measurement runs
    at 0.3 — the densest threshold with real ground truth; lsh_band_params
    re-derives (bands, bits) for whatever threshold is asked."""
    threshold = 0.3
    exact = _exact_pairs(embeddings, threshold)
    assert len(exact) >= 50  # the measurement is meaningful
    got = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_dup_pairs(embeddings, threshold=threshold).collect()
    }
    # precision is exact by construction: same cosine expression + filter
    assert got <= exact
    recall = len(got) / len(exact)
    assert recall >= 0.95, f"banded recall {recall:.3f} < 0.95 ({len(got)}/{len(exact)})"


def test_banded_dup_pairs_max_bucket_guard(embeddings):
    """The skew cap only removes candidates, never invents them; an
    absurdly low cap still returns a subset of the uncapped pairs."""
    uncapped = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_dup_pairs(
            embeddings, threshold=0.3, max_bucket=None
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_dup_pairs(
            embeddings, threshold=0.3, max_bucket=20
        ).collect()
    }
    assert capped <= uncapped


def test_ann_lsh_recall_at_10(embeddings):
    """Indexed LSH ANN recall@10 vs the exact scan at the documented
    default (n_planes=12). This corpus has NO strong neighbors (max pair
    cosine < 0.5), the hardest case for hyperplane LSH, so the pin is the
    recall-vs-scan-fraction TRADE: at probe radius 4 the index must beat
    random candidate selection while scanning ≤ 25% of rows (measured:
    recall 0.6 at 17% scanned)."""
    qvec = list(embeddings.filter("vec_id = 0").first().embedding)
    qsig = similarity.query_signature(qvec, n_planes=12)
    exact = {r.vec_id for r in similarity.cosine_topk(embeddings, qvec, k=10).collect()}
    idx = similarity.build_ann_index(embeddings, n_planes=12).cache()
    n = embeddings.count()
    n_cand = idx.filter(F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig))) <= 4).count()
    scan_frac = n_cand / n
    r4 = {
        r.vec_id
        for r in similarity.lsh_topk(idx, qvec, k=10, n_planes=12, max_probe=4).collect()
    }
    recall = len(r4 & exact) / 10
    assert scan_frac <= 0.25, f"probe-4 candidate fraction {scan_frac:.2f}"
    assert recall >= 0.5, f"recall {recall} at scan fraction {scan_frac:.2f}"
    assert recall > scan_frac + 0.2  # genuinely better than random selection
    # full probe degenerates to exact — recall 1.0 by construction
    full = {
        r.vec_id
        for r in similarity.lsh_topk(idx, qvec, k=10, n_planes=12, max_probe=12).collect()
    }
    assert full == exact


def test_minhash_estimate_tracks_exact_jaccard(docs):
    """est_jaccard (64 slots) vs exact distinct-3-shingle Jaccard over the
    same gram universe: per-slot std is sqrt(J(1-J)/64) ≤ 0.0625, so the
    mean absolute error across real pairs must stay well inside it."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.01).collect()
    }
    assert len(exact) >= 10
    sigs = {r.doc_id: list(r.signature) for r in dedup.minhash_signatures(docs).collect()}
    errs = []
    for (ia, ib), j in exact.items():
        est = sum(x == y for x, y in zip(sigs[ia], sigs[ib])) / 64.0
        errs.append(abs(est - j))
    mae = sum(errs) / len(errs)
    assert mae <= 0.08, f"MinHash MAE {mae:.4f} vs exact Jaccard"
    assert max(errs) <= 0.30
