"""Score explanation (fugu_spark/explain.py) — Lucene explain analog.
The invariant that matters: sum(contribution) over the breakdown equals
the score the search paths return for that doc."""

from __future__ import annotations

import pytest

from fugu_spark import postings as P
from fugu_spark.explain import explain, explain_served
from fugu_spark.search import search

DOCS = [
    (0, "merge join plan merge"),
    (1, "merge sort network"),
    (2, "hash join probe"),
    (3, "vector scan only"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    idx = P.build_index(docs, id_col="doc_id", text_col="text")
    return docs, idx


def _score(idx, q, docs, d):
    rows = {r["doc_id"]: r["score"] for r in search(idx, q, k=10, docs=docs).collect()}
    return rows.get(d)


def test_explain_sums_to_score(corpus):
    docs, idx = corpus
    for q, d in (("merge join", 0), ("merge join", 1), ("merge^2 join", 0)):
        parts = explain(idx, q, d).collect()
        got = sum(r["contribution"] for r in parts)
        assert got == pytest.approx(_score(idx, q, docs, d), abs=1e-12), (q, d)


def test_explain_components(corpus):
    docs, idx = corpus
    parts = {r["term"]: r for r in explain(idx, "merge join", 0).collect()}
    m = parts["merge"]
    assert m["tf"] == 2 and m["df"] == 2 and m["kind"] == "term"
    assert m["contribution"] == pytest.approx(m["idf"] * m["tf_norm"] * m["boost"])
    assert parts["join"]["df"] == 2


def test_explain_phrase_and_boost(corpus):
    docs, idx = corpus
    parts = explain(idx, '"merge join"^3', 0).collect()
    assert len(parts) == 1 and parts[0]["kind"] == "phrase"
    assert parts[0]["boost"] == 3.0
    assert sum(r["contribution"] for r in parts) == pytest.approx(
        _score(idx, '"merge join"^3', docs, 0), abs=1e-12
    )


def test_explain_missing_leaf_absent(corpus):
    docs, idx = corpus
    parts = explain(idx, "merge zzzmissing scan", 1).collect()
    assert [r["term"] for r in parts] == ["merge"]


def test_explain_occur_shows_boolean_role(corpus):
    docs, idx = corpus
    parts = {r["term"]: r["occur"] for r in explain(idx, "+merge -join plan", 0).collect()}
    assert parts == {"merge": "must", "join": "must_not", "plan": "should"}


def test_explain_expands_patterns(corpus):
    docs, idx = corpus
    terms = {r["term"] for r in explain(idx, "/jo.*/ mer*", 2).collect()}
    assert "join" in terms  # concrete expanded terms, not the pattern


def test_explain_served_parity(spark, corpus, tmp_path):
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "xp"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    for q, d in (("merge join", 0), ("merge^2 scan", 3)):
        mem = sorted(
            (r["term"], r["tf"], r["df"], round(r["contribution"], 12))
            for r in explain(idx, q, d).collect()
        )
        pdf = explain_served(ls, q, d)
        srv = sorted(
            (r.term, int(r.tf), int(r.df), round(r.contribution, 12))
            for r in pdf.itertuples()
        )
        assert mem == srv, (q, d)


def test_explain_served_rejects_phrases(spark, corpus, tmp_path):
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, _ = corpus
    si = build_segments(docs, str(tmp_path / "xp2"), id_col="doc_id", text_col="text")
    with pytest.raises(ValueError):
        explain_served(LocalSearcher(si.index_dir), '"merge join"', 0)
