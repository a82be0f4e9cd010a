"""Batch retrieval with min_should_match / synonyms — rank and score
identity against the single-query engine per query (the batch path is
the offline query-expansion shape, so the engine-level knobs must mean
exactly the same thing there)."""

from __future__ import annotations

import pytest

from fugu_spark.batch import batch_search_segments
from fugu_spark.segment_search import search_segments

DOCS = [
    (0, "fast merge path fast"),
    (1, "quick merge route"),
    (2, "rapid rapid scan"),
    (3, "slow merge walk"),
    (4, "fast quick results"),
    (5, "merge scan probe"),
]
SCHEMA = "doc_id long, text string"
SYN = {"fast": ["quick", "rapid"]}


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    from fugu_spark.segments import build_segments

    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    si = build_segments(
        docs, str(tmp_path_factory.mktemp("bms")) + "/idx", id_col="doc_id", text_col="text"
    )
    return docs, si


def _batch_ranks(out, qids):
    rows = out.collect()
    return {
        q: [
            (r["doc_id"], round(r["score"], 9))
            for r in sorted((r for r in rows if r["query_id"] == q), key=lambda r: r["rank"])
        ]
        for q in qids
    }


def _single_ranks(si, q, docs, **kw):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in search_segments(si, q, k=10, docs=docs, **kw).collect()
    ]


def test_batch_msm_parity(seg):
    docs, si = seg
    queries = {1: "merge scan fast", 2: "+merge scan fast", 3: "(fast quick) merge scan"}
    for m in (1, 2):
        got = _batch_ranks(
            batch_search_segments(si, queries, k=10, min_should_match=m), queries
        )
        for qid, qstr in queries.items():
            want = _single_ranks(si, qstr, docs, min_should_match=m)
            assert got[qid] == want, (qid, m)


def test_batch_msm_above_shoulds_drops_query(seg):
    docs, si = seg
    out = batch_search_segments(si, {1: "merge scan", 2: "merge"}, k=10, min_should_match=2)
    got = _batch_ranks(out, [1, 2])
    assert got[1] == _single_ranks(si, "merge scan", docs, min_should_match=2)
    assert got[1] and got[2] == []  # q2 has 1 should < msm -> empty


def test_batch_synonyms_parity(seg):
    docs, si = seg
    queries = {1: "fast", 2: "+fast merge", 3: "merge -fast", 4: "fast scan"}
    got = _batch_ranks(batch_search_segments(si, queries, k=10, synonyms=SYN), queries)
    for qid, qstr in queries.items():
        want = _single_ranks(si, qstr, docs, synonyms=SYN)
        assert got[qid] == want, qid


def test_batch_synonyms_nested_parity(seg):
    docs, si = seg
    queries = {1: "(fast OR probe) AND merge", 2: "(fast scan) -probe"}
    got = _batch_ranks(batch_search_segments(si, queries, k=10, synonyms=SYN), queries)
    for qid, qstr in queries.items():
        want = _single_ranks(si, qstr, docs, synonyms=SYN)
        assert got[qid] == want, qid


def test_batch_synonyms_with_msm(seg):
    docs, si = seg
    # synonym group + plain term as two shoulds, both required via msm=2
    queries = {1: "fast merge"}
    got = _batch_ranks(
        batch_search_segments(si, queries, k=10, synonyms=SYN, min_should_match=2),
        queries,
    )
    want = _single_ranks(si, "fast merge", docs, synonyms=SYN, min_should_match=2)
    assert got[1] == want and len(want) > 0
