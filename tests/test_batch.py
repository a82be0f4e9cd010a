"""Batch retrieval (fugu_spark.batch): many queries, one Spark job —
rank/score identity with the per-query segment engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.batch import batch_search_segments
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments


@pytest.fixture(scope="module")
def batch_setup(spark, tmp_path_factory):
    from fugu_spark.corpus import generate_corpus

    corpus = (
        generate_corpus(spark, 150)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    d = str(tmp_path_factory.mktemp("batch") / "idx")
    si = build_segments(corpus, d, id_col="doc_id", text_col="content")
    return corpus, si


QUERIES = {
    0: "merge join",
    1: "merge AND sort",
    2: "table NOT window",
    3: "merge^2 join sort",
    4: "hash",
    5: "merge join sort window table",  # wide OR
    6: "merge AND zzabsentzz",  # dead must → no rows for this query
    7: "merge zzabsentzz",  # absent should-leaf drops, query lives
}


def test_batch_matches_per_query(batch_setup):
    corpus, si = batch_setup
    out = batch_search_segments(si, QUERIES, k=7)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in QUERIES.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(search_segments(si, text, k=7, docs=corpus).collect())
        ]
        got = sorted(by_q.get(qid, []))
        assert got == want, f"q{qid}: {text}"
    assert 6 not in by_q  # dead-must query produces nothing


def test_batch_rank_column_is_dense_per_query(batch_setup):
    corpus, si = batch_setup
    out = batch_search_segments(si, {0: "merge join"}, k=5).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )


def test_batch_rejects_unsupported(batch_setup):
    corpus, si = batch_setup
    for bad in ('"merge join"', "(merge OR join) AND sort", "", "NOT merge"):
        with pytest.raises(ValueError):
            batch_search_segments(si, {0: bad}, k=5)
