"""Analytics layer: dedup (exact/minhash/simhash/jaccard), similarity
search (brute vs LSH recall), text stats, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics import dedup, multimodal, similarity, textstats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near a river bank"),  # near dup
    (3, "merge sort is a stable sorting algorithm for large data sets"),
    (4, "hash join builds a table on the smaller input then probes it"),
    (5, "completely different content about databases and query planning"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs)
    assert out.count() == 5  # 6 docs, one exact pair
    dup = out.filter(F.col("n_dups") == 2).first()
    assert dup.keep_id == 0


def _py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_minhash(text: str, num_hashes: int = 64, k: int = 3) -> list[int]:
    """Independent pure-Python MinHash reference (exact bigint math)."""
    from fugu_spark.analytics.dedup import MINHASH_P, minhash_params

    toks = _py_tokens(text)
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)] if toks else []
    xs = [_py_hash60(g) % MINHASH_P for g in grams]
    a, b = minhash_params(num_hashes)
    if not xs:
        return [0] * num_hashes
    return [min((ai * x + bi) % MINHASH_P for x in xs) for ai, bi in zip(a, b)]


def _py_simhash(text: str) -> int:
    """Independent pure-Python SimHash reference."""
    from collections import Counter

    from fugu_spark.analytics.dedup import SIMHASH_BITS

    counts = Counter(_py_tokens(text))
    sig = 0
    for j in range(SIMHASH_BITS):
        acc = sum(w if (_py_hash60(t) >> j) & 1 else -w for t, w in counts.items())
        if acc > 0:
            sig |= 1 << j
    return sig


def test_minhash_matches_python_reference(docs):
    """Spark column-expression signatures == exact-bigint Python reference
    (pins the md5-60bit-mod-p31 hash spec the DuckDB oracle relies on)."""
    sigs = {r.doc_id: list(r.signature) for r in dedup.minhash_signatures(docs).collect()}
    for doc_id, text in DOCS:
        assert sigs[doc_id] == _py_minhash(text), f"doc {doc_id}"


def test_minhash_short_and_empty_docs(spark):
    """<k tokens → single whole-doc gram; empty → all-zero signature
    (Spark's sequence(1,0)=[1,0] / slice(·,0,·) trap must not fire)."""
    df = spark.createDataFrame(
        [(1, "two tokens"), (2, ""), (3, "one"), (4, "   .,;   ")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: list(r.signature) for r in dedup.minhash_signatures(df).collect()}
    assert sigs[1] == _py_minhash("two tokens")
    assert sigs[2] == [0] * 64
    assert sigs[3] == _py_minhash("one")
    assert sigs[4] == [0] * 64


def test_simhash_matches_python_reference(docs):
    got = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_simhash(text), f"doc {doc_id}"
    assert all(0 <= v < 2**60 for v in got.values())


def test_minhash_identical_signature(docs):
    sigs = {r.doc_id: r.signature for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    sim01 = sum(a == b for a, b in zip(sigs[0], sigs[2])) / len(sigs[0])
    sim05 = sum(a == b for a, b in zip(sigs[0], sigs[5])) / len(sigs[0])
    assert sim01 > sim05  # near-dup closer than unrelated


def test_minhash_dedup_pairs(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (1, 2) in pairs
    assert (0, 5) not in pairs


def test_dup_groups_components(spark):
    """Min-label propagation = connected components: chain 1-2-3,
    separate pair 7-9, singleton-free domain."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 7)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.keep_id for r in dedup.dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dup_groups_nonconvergence_guard(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        dedup.dup_groups(pairs, max_iter=2)
    # ...but enough rounds resolves the full chain to one component
    got = {r.keep_id for r in dedup.dup_groups(pairs, max_iter=12).collect()}
    assert got == {0}


def test_simhash_pairs(docs):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_dup_pairs(docs, max_hamming=3).collect()}
    assert (0, 1) in pairs


def test_ngram_jaccard(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0


def test_ngram_jaccard_gram_df_cap(docs):
    """Stop-gram cap: grams hotter than the cap leave the gram universe.
    Pairs sharing ONLY hot grams are missed (the documented recall cost);
    pairs with rarer shared grams keep exact Jaccard over kept grams."""
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.3, max_gram_df=2
        ).collect()
    }
    # docs 0,1 share df-2 grams (only they contain them) → still found, 1.0
    assert capped[(0, 1)] == pytest.approx(1.0)
    # docs 0,2 share only grams present in all of {0,1,2} (df 3 > cap) → missed
    assert (0, 2) not in capped
    # a cap above every gram's df is a no-op vs uncapped
    wide = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_gram_df=10**6).collect()
    }
    unc = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_gram_df=None).collect()
    }
    assert wide == unc


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_self_first(embeddings):
    qvec = embeddings.filter("vec_id = 0").first().embedding
    top = similarity.cosine_topk(embeddings, list(qvec), k=5).collect()
    assert top[0].vec_id == 0
    assert top[0].score == pytest.approx(1.0, abs=1e-6)
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(embeddings):
    qvec = list(embeddings.filter("vec_id = 0").first().embedding)
    exact = [r.vec_id for r in similarity.cosine_topk(embeddings, qvec, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.lsh_topk(embeddings, qvec, k=10, n_planes=10, max_probe=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 0  # the query vector itself always survives pruning
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_full_probe_equals_exact(embeddings):
    """nprobe == n_centroids probes every cell → must equal brute force
    exactly; low nprobe keeps useful recall."""
    qvec = list(embeddings.filter("vec_id = 0").first().embedding)
    indexed, cents = similarity.build_ivf_index(embeddings, n_centroids=8, iters=4)
    indexed = indexed.cache()
    exact = [
        (r.vec_id, round(r.score, 9))
        for r in similarity.cosine_topk(embeddings, qvec, k=10).collect()
    ]
    full = [
        (r.vec_id, round(r.score, 9))
        for r in similarity.ivf_topk(indexed, cents, qvec, k=10, nprobe=8).collect()
    ]
    assert full == exact
    probe2 = [r.vec_id for r in similarity.ivf_topk(indexed, cents, qvec, k=10, nprobe=2).collect()]
    recall = len(set(probe2) & {d for d, _ in exact}) / 10
    assert probe2[0] == 0  # the query vector's own cell is always probed
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # cells partition the table
    assert indexed.count() == embeddings.count()


def test_lsh_indexed_equals_inline(embeddings):
    """Serving from a precomputed signature column (the scale path) must
    return exactly what the inline-recompute path returns."""
    qvec = list(embeddings.filter("vec_id = 0").first().embedding)
    idx = similarity.build_ann_index(embeddings, n_planes=10).cache()
    inline = [
        (r.vec_id, round(r.score, 9))
        for r in similarity.lsh_topk(embeddings, qvec, k=10, n_planes=10, max_probe=3).collect()
    ]
    indexed = [
        (r.vec_id, round(r.score, 9))
        for r in similarity.lsh_topk(idx, qvec, k=10, n_planes=10, max_probe=3).collect()
    ]
    assert indexed == inline


def test_textstats(docs):
    out = docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tok"),
        textstats.quality_score(F.col("text")).alias("q"),
        textstats.lang_id(F.col("text")).alias("lang"),
        textstats.fingerprint_md5(F.col("text")).alias("fp"),
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].n_tok == 13
    assert rows[0].lang == "en"  # 'the' x3, 'over' ... stopword-heavy
    assert rows[0].fp == rows[1].fp  # identical normalized content
    assert 0.0 < rows[0].q <= 1.0


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [(1, "it's a test-case, 42 don't"), (2, ""), (3, "hello")],
        "doc_id long, text string",
    ).select("doc_id", textstats.bpe_token_count(F.col("text")).alias("n"))
    got = {r.doc_id: r.n for r in df.collect()}
    # it|'s| a| test|-|case|,| 42| don|'t → 10 subword-ish tokens
    assert got == {1: 10, 2: 0, 3: 1}


def test_winnow_fingerprints(docs):
    rows = textstats.winnow_fingerprints(docs).collect()
    fps: dict[int, set[int]] = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[0] == fps[1]
    overlap02 = len(fps[0] & fps[2]) / max(len(fps[0]), 1)
    overlap05 = len(fps[0] & fps.get(5, set())) / max(len(fps[0]), 1)
    assert overlap02 > overlap05
    # rolling-min windows: every fingerprint set is <= the gram count
    assert all(len(v) >= 1 for v in fps.values())


def test_multimodal_plumbing(spark):
    assets = multimodal.generate_fake_assets(spark, 30)
    assert assets.count() == 30
    feats = multimodal.extract_features(assets)
    rows = feats.collect()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # strict mode marks the real-codec integration point
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.extract_features(assets, strict=True).collect()
    frames = multimodal.sample_frames(assets, every_ms=10000)
    assert frames.count() > 0
    assert frames.columns == ["asset_id", "frame_ts_ms"]
