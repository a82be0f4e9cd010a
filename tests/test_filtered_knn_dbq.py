"""Filtered kNN (metadata pre-filter on every ANN path) and
delete_by_query (ES _delete_by_query through the generational tombstone
path), plus the search_segments(k=None) full-match-set mode both build
on. Filtered-kNN correctness pins: every ANN variant at full probe over
a filtered frame equals the brute-force scan over the same filtered
frame; delete_by_query pins: post-delete searches exclude exactly the
match set, and after compact() the index is score-identical to a fresh
build over the surviving docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics import similarity
from fugu_spark.engine import FuguSparkEngine
from fugu_spark.facets import derive_facets
from fugu_spark.segment_search import search_segments


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(embeddings):
    return list(embeddings.filter(F.col("vec_id") == 0).first().embedding)


def _pairs(df):
    return [(r[0], round(float(r[1]), 9)) for r in df.collect()]


def test_cosine_topk_where(embeddings, qvec):
    flt = F.col("label") == 1
    got = similarity.cosine_topk(embeddings, qvec, k=10, where=flt)
    labels = {
        r.label
        for r in got.join(embeddings.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels == {1}
    # equals brute force over the pre-filtered frame
    want = similarity.cosine_topk(embeddings.filter(flt), qvec, k=10)
    assert _pairs(got) == _pairs(want)
    # and differs from the unfiltered top-k (the filter must matter)
    unf = similarity.cosine_topk(embeddings, qvec, k=10)
    assert _pairs(got) != _pairs(unf)


def test_lsh_topk_where_full_probe_exact(embeddings, qvec):
    flt = F.col("label") == 1
    got = similarity.lsh_topk(
        embeddings, qvec, k=10, n_planes=12, max_probe=12, where=flt
    )
    want = similarity.cosine_topk(embeddings, qvec, k=10, where=flt)
    assert _pairs(got) == _pairs(want)


def test_ivf_topk_where_full_probe_exact(embeddings, qvec):
    flt = F.col("label") == 0
    indexed, centroids = similarity.build_ivf_index(embeddings, n_centroids=8)
    got = similarity.ivf_topk(
        indexed, centroids, qvec, k=10, nprobe=8, where=flt
    )
    want = similarity.cosine_topk(embeddings, qvec, k=10, where=flt)
    assert _pairs(got) == _pairs(want)


def test_batch_cosine_topk_where(embeddings):
    rows = embeddings.filter(F.col("vec_id").isin(0, 1)).collect()
    queries = {int(r.vec_id): list(r.embedding) for r in rows}
    flt = F.col("label") == 1
    got = similarity.batch_cosine_topk(embeddings, queries, k=5, where=flt)
    for qid, qv in queries.items():
        want = similarity.cosine_topk(embeddings, qv, k=5, where=flt)
        g = [
            (r.vec_id, round(float(r.score), 9))
            for r in got.filter(F.col("query_id") == qid)
            .orderBy("rank")
            .collect()
        ]
        assert g == _pairs(want), f"query {qid}"


# ---------------------------------------------------------------- DBQ --

DOCS = [
    (1, "merge join engine", "py", None),
    (2, "sort merge runner", "rs", None),
    (3, "hash table probe", "py", None),
    (4, "sort probe scan", "go", None),
    (5, "merge sort pivot", "py", None),
    (6, "window frame scan", "rs", None),
]


def _mk_engine(spark, tmp_path, name="dbq"):
    docs = spark.createDataFrame(
        [(i, t, l) for i, t, l, _ in DOCS], "doc_id long, text string, lang string"
    ).withColumn("facets", derive_facets(("lang", F.col("lang"))))
    return FuguSparkEngine.build(docs, str(tmp_path / name)), docs


def test_k_none_full_match_set(spark, tmp_path):
    eng, docs = _mk_engine(spark, tmp_path, "knone")
    full = search_segments(eng.si, "merge sort", k=None, docs=docs)
    # one row per matching doc, same scores the top-k path ranks
    top = search_segments(eng.si, "merge sort", k=10, docs=docs)
    assert sorted(_pairs(full), key=lambda x: (-x[1], x[0])) == _pairs(top)
    assert full.count() == 4  # docs 1, 2, 4, 5 carry merge and/or sort
    with pytest.raises(ValueError, match="sort_by"):
        search_segments(eng.si, "merge", k=None, docs=docs, sort_by="lang")


def test_delete_by_query_term(spark, tmp_path):
    eng, _ = _mk_engine(spark, tmp_path, "term")
    eng.delete_by_query("sort")
    assert {r.doc_id for r in eng.search("merge", k=10).collect()} == {1}
    assert eng.search("sort", k=10).count() == 0
    # non-matching docs untouched
    assert {r.doc_id for r in eng.search("hash", k=10).collect()} == {3}
    assert eng.docs.count() == 3  # 2, 4, 5 tombstoned


def test_delete_by_query_filter_only(spark, tmp_path):
    eng, _ = _mk_engine(spark, tmp_path, "filt")
    # AllQuery + facet filter: delete every py doc
    eng.delete_by_query(None, filters=["/lang/py"])
    left = {r.doc_id for r in eng.search(None, k=20).collect()}
    assert left == {2, 4, 6}


def test_delete_by_query_dsl_and_compact_parity(spark, tmp_path):
    eng, _ = _mk_engine(spark, tmp_path, "dsl")
    eng.delete_by_query({"match_phrase": {"_all": "merge join"}})
    assert eng.docs.count() == 5  # only doc 1 matched the phrase
    eng.compact()
    # post-compact index == fresh build over the survivors (stats and all)
    survivors = spark.createDataFrame(
        [(i, t, l) for i, t, l, _ in DOCS if i != 1],
        "doc_id long, text string, lang string",
    ).withColumn("facets", derive_facets(("lang", F.col("lang"))))
    fresh = FuguSparkEngine.build(survivors, str(tmp_path / "fresh"))
    got = _pairs(eng.search("merge sort scan", k=10))
    want = _pairs(fresh.search("merge sort scan", k=10))
    assert got == want


def test_delete_by_query_maybe_compact_trigger(spark, tmp_path):
    eng, _ = _mk_engine(spark, tmp_path, "trig")
    eng.delete_by_query("sort")  # 3 of 6 docs > default 25% ratio
    assert eng.maybe_compact() is True
    assert eng.si.deletes_df() is None
