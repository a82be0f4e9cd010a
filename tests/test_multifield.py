"""Multi-field search (Q9): fugu queries [text, name] — leaf matches in
ANY field, scores sum across fields with per-field stats."""

from __future__ import annotations

import pytest

from fugu_spark.postings import build_index
from fugu_spark.search import search_fields

from .oracle import PyIndex

DOCS = [
    (0, "merge join hash", "core engine"),
    (1, "sort filter scan", "merge utils"),
    (2, "merge merge merge", "join helpers"),
    (3, "unrelated text here", "other name"),
]


@pytest.fixture(scope="module")
def indexes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string, name string")
    return {
        "content": build_index(df, text_col="content"),
        "name": build_index(df, text_col="name"),
    }, df


def _oracle_scores(query):
    content = PyIndex({d: c for d, c, _ in DOCS})
    name = PyIndex({d: n for d, _, n in DOCS})
    per_field = [dict(content.search(query, k=100)), dict(name.search(query, k=100))]
    out = {}
    for m in per_field:
        for doc, s in m.items():
            out[doc] = out.get(doc, 0.0) + s
    return out


def test_or_sums_across_fields(indexes):
    idxs, df = indexes
    got = {r.doc_id: r.score for r in search_fields(idxs, "merge", k=10, docs=df).collect()}
    exp = _oracle_scores("merge")
    assert set(got) == set(exp) == {0, 1, 2}
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-9)


def test_and_across_fields(indexes):
    """doc 1 has 'merge' only in name, 'sort' only in content → AND matches."""
    idxs, df = indexes
    got = [r.doc_id for r in search_fields(idxs, "merge AND sort", k=10, docs=df).collect()]
    assert got == [1]


def test_not_across_fields(indexes):
    """'join' in either field excludes (docs 0 and 2)."""
    idxs, df = indexes
    got = [r.doc_id for r in search_fields(idxs, "merge NOT join", k=10, docs=df).collect()]
    assert got == [1]


def test_field_boost(indexes):
    idxs, df = indexes
    plain = {r.doc_id: r.score for r in search_fields(idxs, "merge", k=10, docs=df).collect()}
    boosted = {
        r.doc_id: r.score
        for r in search_fields(
            idxs, "merge", k=10, docs=df, field_boosts={"name": 3.0}
        ).collect()
    }
    # doc 1 matches only via name → exactly 3x; doc 2 only via content → unchanged
    assert boosted[1] == pytest.approx(3.0 * plain[1], abs=1e-9)
    assert boosted[2] == pytest.approx(plain[2], abs=1e-9)


# ------------------------------------------------ field-qualified queries


def _field_oracle(query_leaves):
    """leaves: [(terms, fld_or_None, boost, occur)] → {doc: score} summed
    across the fields each leaf applies to (independent reference)."""
    content = PyIndex({d: c for d, c, _ in DOCS})
    name = PyIndex({d: n for d, _, n in DOCS})
    by = {"content": content, "name": name}
    out: dict[int, float] = {}
    for terms, fld, boost, _occ in query_leaves:
        for fname, pidx in by.items():
            if fld not in (None, fname):
                continue
            m = (
                pidx.phrase_scores(terms, boost)
                if len(terms) > 1
                else pidx.term_scores(terms[0], boost)
            )
            for d, s in m.items():
                out[d] = out.get(d, 0.0) + s
    return out


def test_qualified_term_scores_one_field_only(indexes):
    idxs, df = indexes
    # 'name:merge' → only doc 1 (merge in name); content matches excluded
    got = {r.doc_id: r.score for r in search_fields(idxs, "name:merge", k=10, docs=df).collect()}
    exp = _field_oracle([(("merge",), "name", 1.0, "should")])
    assert set(got) == set(exp) == {1}
    assert got[1] == pytest.approx(exp[1], abs=1e-9)


def test_qualified_mixed_with_bare(indexes):
    idxs, df = indexes
    got = {
        r.doc_id: r.score
        for r in search_fields(idxs, "name:join merge", k=10, docs=df).collect()
    }
    exp = _field_oracle(
        [(("join",), "name", 1.0, "should"), (("merge",), None, 1.0, "should")]
    )
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-9)


def test_qualified_phrase_and_boost(indexes):
    idxs, df = indexes
    got = {
        r.doc_id: r.score
        for r in search_fields(idxs, 'name:"core engine"^2', k=10, docs=df).collect()
    }
    exp = _field_oracle([(("core", "engine"), "name", 2.0, "should")])
    assert set(got) == set(exp) == {0}
    assert got[0] == pytest.approx(exp[0], abs=1e-9)


def test_qualified_must_not(indexes):
    idxs, df = indexes
    # 'merge NOT name:join' excludes only docs whose NAME has join (doc 2),
    # not doc 0 (join only in content)
    got = {r.doc_id for r in search_fields(idxs, "merge NOT name:join", k=10, docs=df).collect()}
    assert got == {0, 1}


def test_qualified_must_dead_field_term(indexes):
    idxs, df = indexes
    # 'name:hash' — hash exists in content only → qualified must is dead
    got = search_fields(idxs, "merge AND name:hash", k=10, docs=df).collect()
    assert got == []


def test_unknown_field_falls_back_like_reference(indexes):
    idxs, df = indexes
    # 'lang:merge' with no 'lang' index → parse error → escape-retry
    # strips ':' → single term 'langmerge' (reference semantics) → no hits
    assert search_fields(idxs, "lang:merge", k=10, docs=df).collect() == []


def test_field_scoped_group(indexes):
    idxs, df = indexes
    # name:(merge OR join) → docs with merge or join IN NAME: 1 (merge
    # utils) and 2 (join helpers); doc 0 has both only in content
    got = {r.doc_id for r in search_fields(idxs, "name:(merge join)", k=10, docs=df).collect()}
    assert got == {1, 2}
    # scores equal the per-leaf field-restricted sum
    scores = {
        r.doc_id: r.score
        for r in search_fields(idxs, "name:(merge join)", k=10, docs=df).collect()
    }
    exp = _field_oracle(
        [(("merge",), "name", 1.0, "should"), (("join",), "name", 1.0, "should")]
    )
    for d in scores:
        assert scores[d] == pytest.approx(exp[d], abs=1e-9)


def test_nested_bool_across_fields(indexes):
    idxs, df = indexes
    # (merge AND sort): doc1 only (merge in name, sort in content —
    # cross-field AND); OR hash: adds doc 0 (hash in content)
    got = {
        r.doc_id
        for r in search_fields(idxs, "(merge AND sort) OR hash", k=10, docs=df).collect()
    }
    assert got == {0, 1}
    # name:(merge join) AND sort → name-match AND sort anywhere → doc 1
    got2 = {
        r.doc_id
        for r in search_fields(idxs, "name:(merge join) AND sort", k=10, docs=df).collect()
    }
    assert got2 == {1}
    # NOT over a field-scoped group
    got3 = {
        r.doc_id
        for r in search_fields(idxs, "merge NOT name:(join helpers)", k=10, docs=df).collect()
    }
    assert got3 == {0, 1}
