"""Conjunctive block-range pruning (AND / phrase): `rare AND common`
queries must not decode the common term's full posting list — only blocks
overlapping the rare term's doc-id ranges — with rank/score identity to
the unpruned path."""

from __future__ import annotations

import numpy as np
import pytest

from fugu_spark.postings import build_index
from fugu_spark.queryparse import parse_query
from fugu_spark.search import search as table_search
from fugu_spark.segment_search import (
    _term_meta,
    anchor_doc_ranges,
    conjunctive_anchor,
    decode_postings,
    merge_intervals,
    search_segments,
)
from fugu_spark.segments import build_segments
from fugu_spark.serve import LocalSearcher

N = 1000
N_RARE = 10  # docs 990..999 carry the rare term


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    rows = []
    for i in range(N):
        text = f"common filler{i} pad{i % 7}"
        if i >= N - N_RARE:
            text = f"common zzrare filler{i}"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    idx_dir = str(tmp_path_factory.mktemp("prune") / "idx")
    si = build_segments(docs, idx_dir, id_col="doc_id", text_col="text")
    return docs, si


def test_merge_intervals():
    s, e = merge_intervals(np.array([5, 1, 3]), np.array([7, 2, 6]))
    assert s.tolist() == [1, 3] and e.tolist() == [2, 7]


def test_anchor_selection(skewed):
    _, si = skewed
    meta = _term_meta(si, ["common", "zzrare"])
    plan = parse_query("zzrare AND common")
    assert conjunctive_anchor(plan, meta) == "zzrare"
    # pure OR: no required term, no pruning
    assert conjunctive_anchor(parse_query("zzrare common"), meta) is None
    # lone phrase: all phrase terms are required
    assert conjunctive_anchor(parse_query('"common zzrare"'), meta) == "zzrare"


def test_fewer_blocks_decoded(skewed):
    _, si = skewed
    meta = _term_meta(si, ["common", "zzrare"])
    ranges = anchor_doc_ranges(si, "zzrare", meta)
    assert ranges is not None
    full = decode_postings(si, ["common", "zzrare"], meta).count()
    pruned = decode_postings(si, ["common", "zzrare"], meta, doc_ranges=ranges).count()
    assert full == N + N_RARE
    # only the common blocks overlapping docs [990, 999] survive: one
    # 128-doc block plus the rare postings
    assert pruned < full / 4
    assert pruned >= 2 * N_RARE  # every matching doc's postings retained


@pytest.mark.parametrize("q", ["zzrare AND common", '"common zzrare"', "common AND zzrare pad1"])
def test_pruned_results_identical(skewed, q):
    docs, si = skewed
    idx = build_index(docs, id_col="doc_id", text_col="text")
    want = [(r.doc_id, round(r.score, 9)) for r in table_search(idx, q, k=20, docs=docs).collect()]
    got = [(r.doc_id, round(r.score, 9)) for r in search_segments(si, q, k=20, docs=docs).collect()]
    assert got == want
    loc = [
        (int(r.doc_id), round(float(r.score), 9))
        for r in LocalSearcher(si.index_dir).search(q, k=20).itertuples(index=False)
    ]
    assert loc == want
