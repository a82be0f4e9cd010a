"""Generational upsert/delete/compact semantics (D1/D2/B7): postings
round-trip through generations + delete masks; compact() restores
fresh-build equivalence exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.search import search
from fugu_spark.segment_search import decode_all_postings, search_segments
from fugu_spark.segments import build_segments, compact, delete_doc_ids, upsert_segments

BASE = [
    (0, "merge join hash join"),
    (1, "quick brown fox"),
    (2, "merge sort algorithm"),
    (3, "hash table lookup"),
]
UPSERT = [(0, "vector search engine"), (4, "merge vector index")]


def _postings_set(df):
    return sorted((r.term, r.doc_id, r.tf, tuple(r.positions), r.doc_len) for r in df.collect())


@pytest.fixture()
def si(spark, tmp_path):
    docs = spark.createDataFrame(BASE, "doc_id long, content string")
    return build_segments(docs, str(tmp_path / "idx"), n_buckets=2)


def test_upsert_masks_old_and_adds_new(spark, si):
    batch = spark.createDataFrame(UPSERT, "doc_id long, content string")
    si2 = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    live = decode_all_postings(si2, with_positions=True)
    # live postings == fresh postings of the post-upsert corpus
    merged = {d: t for d, t in BASE}
    merged.update({d: t for d, t in UPSERT})
    fresh = build_index(
        spark.createDataFrame(list(merged.items()), "doc_id long, content string")
    ).postings
    assert _postings_set(live) == _postings_set(fresh)
    # old content of doc 0 is gone; new searchable
    got = [r.doc_id for r in search_segments(si2, "vector", k=10).collect()]
    assert set(got) == {0, 4}
    got = [r.doc_id for r in search_segments(si2, "hash AND join", k=10).collect()]
    assert got == []  # doc 0 no longer contains them together


def test_delete_doc_ids(spark, si):
    si2 = delete_doc_ids(si, spark.createDataFrame([(2,)], "doc_id long"))
    got = [r.doc_id for r in search_segments(si2, "merge", k=10).collect()]
    assert 2 not in got and 0 in got


def test_compact_restores_fresh_build_equivalence(spark, si, tmp_path):
    batch = spark.createDataFrame(UPSERT, "doc_id long, content string")
    si2 = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    si2 = delete_doc_ids(si2, spark.createDataFrame([(1,)], "doc_id long"))
    si3 = compact(si2)
    assert si3.max_gen() == 0
    assert si3.deletes_df() is None
    merged = {d: t for d, t in BASE}
    merged.update({d: t for d, t in UPSERT})
    del merged[1]
    final_docs = spark.createDataFrame(list(merged.items()), "doc_id long, content string")
    fresh_dir = str(tmp_path / "fresh")
    fresh = build_segments(final_docs, fresh_dir, n_buckets=2)
    assert si3.stats.n_docs == fresh.stats.n_docs
    assert si3.stats.total_tokens == fresh.stats.total_tokens
    for q in ["merge", "merge join", "vector AND index"]:
        a = [(r.doc_id, round(r.score, 9)) for r in search_segments(si3, q, k=10).collect()]
        bb = [(r.doc_id, round(r.score, 9)) for r in search_segments(fresh, q, k=10).collect()]
        assert a == bb, q


def test_double_upsert_latest_wins(spark, si):
    b1 = spark.createDataFrame([(0, "first rewrite")], "doc_id long, content string")
    b2 = spark.createDataFrame([(0, "second rewrite wins")], "doc_id long, content string")
    si2 = upsert_segments(si, b1, text_col="content")
    si3 = upsert_segments(si2, b2, text_col="content")
    got = [r.doc_id for r in search_segments(si3, "wins", k=10).collect()]
    assert got == [0]
    got = [r.doc_id for r in search_segments(si3, "first", k=10).collect()]
    assert got == []


def test_empty_index_lifecycle(spark, tmp_path):
    """Regression: an empty corpus must build a valid (empty) index —
    explicit read schemas, since zero-row stage dirs defeat parquet
    schema inference — and then grow via upsert."""
    empty = spark.createDataFrame([], "doc_id long, content string")
    si = build_segments(empty, str(tmp_path / "e"), n_buckets=2)
    assert si.stats.n_docs == 0
    assert search_segments(si, "merge", k=5).count() == 0
    assert search_segments(si, "", k=5, docs=empty).count() == 0  # AllQuery
    batch = spark.createDataFrame([(1, "grown merge doc")], "doc_id long, content string")
    si2 = upsert_segments(si, batch, text_col="content")
    got = [r.doc_id for r in search_segments(si2, "merge", k=5).collect()]
    assert got == [1]


def test_incremental_dictionary_equals_full_remerge(spark, si, tmp_path):
    """Upsert folds only the new generation into the dictionary; the
    result must be row-identical to re-aggregating every generation."""
    from fugu_spark import fsio
    from fugu_spark.segments import merge_dictionary

    batch = spark.createDataFrame(UPSERT, "doc_id long, content string")
    si2 = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    full_path = str(tmp_path / "full_terms")
    merge_dictionary(spark, fsio.join(si2.index_dir, "segments"), full_path)
    cols = ["term", "df", "cf", "max_tf", "min_doc_len", "term_bucket", "n_blocks", "bytes_encoded"]
    inc = sorted(tuple(r) for r in si2.terms.select(cols).collect())
    full = sorted(tuple(r) for r in spark.read.parquet(full_path).select(cols).collect())
    assert inc == full


def test_upsert_bucket_layout_survives_sparse_buckets(spark, tmp_path):
    """Regression: n_buckets is a persisted build parameter. With more
    buckets than vocabulary, gen=0 leaves some term_bucket partitions
    empty; upserts must still hash terms with the original modulus or new
    generations land where the dictionary doesn't point."""
    docs = spark.createDataFrame(BASE, "doc_id long, content string")
    si = build_segments(docs, str(tmp_path / "sparse"), n_buckets=32)
    batch = spark.createDataFrame([BASE[0]], "doc_id long, content string")
    si = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    si = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    got = [r.doc_id for r in search_segments(si, "merge", k=4, wand_min_postings=0).collect()]
    assert 0 in got, "re-upserted doc lost by bucket-layout drift"
    live = _postings_set(decode_all_postings(si, with_positions=True))
    fresh = _postings_set(
        build_index(docs, id_col="doc_id", text_col="content").postings
    )
    assert live == fresh


def test_stale_terms_dataset_reopens_after_swap(spark, si):
    """A SegmentIndex opened BEFORE an in-place dictionary swap (the
    incremental merge's write-new → rmtree → rename) must transparently
    re-open its cached pyarrow dataset — one retry, no RuntimeWarning,
    no silent Spark-scan downgrade of the serving fast path."""
    import warnings

    # warm the cached pyarrow dataset on the pre-upsert handle
    assert search_segments(si, "merge", k=5).count() > 0
    assert getattr(si, "_terms_ds", None) is not None
    batch = spark.createDataFrame(UPSERT, "doc_id long, content string")
    si2 = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # any fallback = fail
        got = {r.doc_id for r in search_segments(si, "vector", k=10).collect()}
    # the old handle sees the post-swap dictionary (new terms resolvable)
    assert got == {0, 4}
    assert {r.doc_id for r in search_segments(si2, "vector", k=10).collect()} == got
