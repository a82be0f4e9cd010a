"""combined_fields (Lucene CombinedFieldQuery / BM25F-style blending)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.search import combined_fields_search, search

DOCS = [
    (0, "merge join strategies for sorted runs", "merge"),
    (1, "hash join beats merge join on unsorted input", "join"),
    (2, "sorting networks and stable sort", "sort"),
    (3, "b-tree scan with index", "scan"),
    (4, "merge merge merge", "misc"),
]


@pytest.fixture(scope="module")
def two_fields(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, name string")
    return (
        docs,
        {
            "text": build_index(docs, id_col="doc_id", text_col="text"),
            "name": build_index(docs, id_col="doc_id", text_col="name"),
        },
    )


def _bm25f_expected(query_terms, weights, k1=1.2, b=0.75):
    """Straight-line BM25F reference computed from the raw fixture,
    tokenized with the default analyzer's rule (split non-alnum,
    lowercase, drop empties)."""
    import re as _re

    def tok_text(s):
        return [w for w in _re.split(r"[^a-z0-9]+", s.lower()) if w]

    tok = {d: (tok_text(t), tok_text(n)) for d, t, n in DOCS}
    n = len(DOCS)
    wt, wn = weights["text"], weights["name"]
    lens = {d: wt * len(tx) + wn * len(nm) for d, (tx, nm) in tok.items()}
    avgdl = wt * (sum(len(tx) for tx, _ in tok.values()) / n) + wn * 1.0
    scores = {}
    for term in query_terms:
        tfs = {
            d: wt * tx.count(term) + wn * nm.count(term)
            for d, (tx, nm) in tok.items()
        }
        df = sum(1 for v in tfs.values() if v > 0)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, tf in tfs.items():
            if tf <= 0:
                continue
            sc = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[d] / avgdl))
            scores[d] = scores.get(d, 0.0) + sc
    return scores


def test_matches_reference_math(spark, two_fields):
    docs, idxs = two_fields
    out = combined_fields_search(
        idxs, "merge join", weights={"name": 2.0}, k=10
    ).collect()
    want = _bm25f_expected(["merge", "join"], {"text": 1.0, "name": 2.0})
    got = {r.doc_id: r.score for r in out}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    # ranking is deterministic (score desc, doc_id asc)
    ranked = [r.doc_id for r in out]
    assert ranked == sorted(want, key=lambda d: (-want[d], d))


def test_single_field_weight1_equals_plain_or(spark, two_fields):
    """With one field at weight 1 the pseudo-stats ARE the field's
    stats, so combined_fields must equal the ordinary OR search."""
    docs, idxs = two_fields
    cf = {
        r.doc_id: r.score
        for r in combined_fields_search({"text": idxs["text"]}, "merge join").collect()
    }
    plain = {
        r.doc_id: r.score
        for r in search(idxs["text"], "merge join", k=10, docs=docs).collect()
    }
    assert set(cf) == set(plain)
    for d in cf:
        assert cf[d] == pytest.approx(plain[d], rel=1e-9)


def test_operator_and_and_musts(spark, two_fields):
    _, idxs = two_fields
    both = combined_fields_search(idxs, "merge join", operator="and").collect()
    assert {r.doc_id for r in both} == {0, 1}  # docs with both terms (any field)
    must = combined_fields_search(idxs, "+join merge").collect()
    assert {r.doc_id for r in must} == {0, 1}
    # scores unchanged by the gate — same blend, filtered set
    free = {
        r.doc_id: r.score
        for r in combined_fields_search(idxs, "merge join").collect()
    }
    for r in both:
        assert r.score == pytest.approx(free[r.doc_id], rel=1e-12)


def test_restrictions(spark, two_fields):
    _, idxs = two_fields
    for q in ['"merge join"', "mer*", "merge~1", "/m.*/", "name:merge", "-scan merge"]:
        with pytest.raises(ValueError):
            combined_fields_search(idxs, q)
    with pytest.raises(ValueError):
        combined_fields_search(idxs, "merge", weights={"name": 0.5})
    with pytest.raises(ValueError):
        combined_fields_search(idxs, "merge", weights={"nope": 2.0})
