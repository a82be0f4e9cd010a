"""DisjunctionMax cross-field scoring (Lucene DisjunctionMaxQuery / ES
multi_match best_fields): per leaf, field scores combine as
max + tie_breaker × (sum − max). tie_breaker=1.0 must reproduce the sum
semantics bit-for-bit; tie_breaker=0.0 is the pure best-field score —
both checked against the pure-Python oracle per field."""

from __future__ import annotations

import pytest

from fugu_spark.postings import build_index
from fugu_spark.search import search_fields

from .oracle import PyIndex

# doc 0 and doc 2 carry 'merge' in BOTH fields — the case where dis_max
# diverges from the sum fold
DOCS = [
    (0, "merge join hash", "merge engine"),
    (1, "sort filter scan", "merge utils"),
    (2, "merge merge merge", "join merge helpers"),
    (3, "unrelated text here", "other name"),
    (4, "join the queue", "sort join tools"),
]


@pytest.fixture(scope="module")
def indexes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string, name string")
    return {
        "content": build_index(df, text_col="content"),
        "name": build_index(df, text_col="name"),
    }, df


def _per_field(query):
    content = PyIndex({d: c for d, c, _ in DOCS})
    name = PyIndex({d: n for d, _, n in DOCS})
    return [dict(content.search(query, k=100)), dict(name.search(query, k=100))]


def _dismax_oracle(terms, tie):
    """Per-LEAF dis_max: each term is one leaf; its per-field scores fold
    max + tie*(sum-max); leaves then sum."""
    out = {}
    for t in terms:
        per = _per_field(t)
        docs = set().union(*[set(m) for m in per])
        for d in docs:
            ss = [m[d] for m in per if d in m]
            leaf = max(ss) + tie * (sum(ss) - max(ss))
            out[d] = out.get(d, 0.0) + leaf
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
@pytest.mark.parametrize("q", ["merge", "merge join"])
def test_flat_dismax_matches_oracle(indexes, q, tie):
    idxs, df = indexes
    got = {
        r.doc_id: r.score
        for r in search_fields(idxs, q, k=10, docs=df, tie_breaker=tie).collect()
    }
    exp = _dismax_oracle(q.split(), tie)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-9), (q, tie, d)


def test_tie_one_equals_sum_fold(indexes):
    idxs, df = indexes
    plain = {
        r.doc_id: r.score for r in search_fields(idxs, "merge join", k=10, docs=df).collect()
    }
    tied = {
        r.doc_id: r.score
        for r in search_fields(idxs, "merge join", k=10, docs=df, tie_breaker=1.0).collect()
    }
    assert plain == tied  # exact equality: same floats, same fold


def test_pure_dismax_takes_best_field(indexes):
    """doc 2: 'merge' tf=3 in content AND 'join' in name — with tie=0 the
    'merge' leaf scores only its best field (content), so doc 2's total
    drops vs the sum fold whenever a leaf matched in both fields."""
    idxs, df = indexes
    summed = _dismax_oracle(["merge"], 1.0)
    best = _dismax_oracle(["merge"], 0.0)
    got = {
        r.doc_id: r.score
        for r in search_fields(idxs, "merge", k=10, docs=df, tie_breaker=0.0).collect()
    }
    both_fields = [d for d in summed if summed[d] != best[d]]
    assert both_fields  # the fixture must exercise a two-field leaf
    for d in both_fields:
        assert got[d] == pytest.approx(best[d], abs=1e-9)
        assert got[d] < summed[d]


def test_nested_dismax(indexes):
    """Nested boolean grouping with dis_max: the leaf fold applies inside
    groups too — '(merge OR sort) AND join' at tie=0."""
    idxs, df = indexes
    got = {
        r.doc_id: r.score
        for r in search_fields(
            idxs, "(merge OR sort) AND join", k=10, docs=df, tie_breaker=0.0
        ).collect()
    }
    # matched set must equal the sum-fold matched set (dis_max changes
    # scores, never matching)
    plain = {
        r.doc_id
        for r in search_fields(idxs, "(merge OR sort) AND join", k=10, docs=df).collect()
    }
    assert set(got) == plain
    # every score ≤ the sum-fold score, ≥ the best single-field leaf sum
    sums = {
        r.doc_id: r.score
        for r in search_fields(
            idxs, "(merge OR sort) AND join", k=10, docs=df, tie_breaker=1.0
        ).collect()
    }
    for d, s in got.items():
        assert s <= sums[d] + 1e-12
