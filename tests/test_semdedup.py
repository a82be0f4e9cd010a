"""SemDeDup (analytics/similarity.semdedup): semantic dedup by
within-cluster cosine — exact (1-cluster) semantics vs a brute-force
numpy oracle, clustered-superset invariant, determinism, and the
greedy lower-id survivor rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics.similarity import semdedup

N, DIM = 60, 8


def _vectors():
    rng = np.random.RandomState(7)
    base = rng.randn(N, DIM)
    # plant near-dup groups: 10 ≈ 3, 11 ≈ 3 (tiny noise), 20 ≈ 21
    base[10] = base[3] + 1e-4 * rng.randn(DIM)
    base[11] = base[3] - 1e-4 * rng.randn(DIM)
    base[21] = base[20] + 1e-4 * rng.randn(DIM)
    return base


def _oracle_keep(vecs, tau):
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = v @ v.T
    keep = []
    for i in range(len(vecs)):
        dup = any(cos[i, j] >= tau for j in range(i))
        keep.append(not dup)
    return keep


@pytest.fixture(scope="module")
def emb(spark):
    vecs = _vectors()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return vecs, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_mode_matches_bruteforce(emb):
    vecs, df = emb
    got = {
        r.vec_id: r.keep
        for r in semdedup(df, threshold=0.999, n_centroids=1).collect()
    }
    # float32 storage: recompute the oracle on the float32-rounded vectors
    want = _oracle_keep(vecs.astype(np.float32).astype(np.float64), 0.999)
    assert [got[i] for i in range(N)] == want
    # the planted dups drop, their lowest-id archetypes survive
    assert got[3] and not got[10] and not got[11]
    assert got[20] and not got[21]


def test_clustered_is_superset_of_exact(emb):
    _, df = emb
    exact = {r.vec_id for r in semdedup(df, 0.999, n_centroids=1).collect() if r.keep}
    for k in (4, 8):
        clustered = {
            r.vec_id for r in semdedup(df, 0.999, n_centroids=k).collect() if r.keep
        }
        # clustering only removes candidate pairs → can only keep MORE
        assert clustered >= exact


def test_deterministic(emb):
    _, df = emb
    a = sorted((r.vec_id, r.keep) for r in semdedup(df, 0.999, n_centroids=8).collect())
    b = sorted((r.vec_id, r.keep) for r in semdedup(df, 0.999, n_centroids=8).collect())
    assert a == b


def test_threshold_monotone(emb):
    _, df = emb
    loose = {r.vec_id for r in semdedup(df, 0.5, n_centroids=1).collect() if r.keep}
    tight = {r.vec_id for r in semdedup(df, 0.9999, n_centroids=1).collect() if r.keep}
    assert tight >= loose  # lower τ drops at least as much
    assert 0 in loose and 0 in tight  # id 0 always survives


def test_schema_passthrough(emb):
    _, df = emb
    out = semdedup(df.withColumn("label", F.lit(1)), 0.99, n_centroids=2)
    assert set(out.columns) == {"vec_id", "embedding", "label", "keep"}
    assert out.count() == N
