"""Point-in-time (generation-pinned) search: at_generation(g) must make
later upserts and deletes invisible — scores identical to a fresh index
built from the generation-g corpus, including idf/avgdl stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments, delete_doc_ids, upsert_segments

from .test_search import DOCS


def _rows(df):
    return [(r.doc_id, round(r.score, 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, content string"
    )
    d_live = str(tmp_path_factory.mktemp("tt") / "live")
    si = build_segments(docs, d_live, id_col="doc_id", text_col="content")

    # gen 1: doc 0 rewritten (loses 'merge'), doc 100 added (gains it)
    batch = spark.createDataFrame(
        [(0, "completely different content now"), (100, "merge merge join")],
        "doc_id long, content string",
    )
    si = upsert_segments(si, batch, id_col="doc_id", text_col="content")

    # reference: a FRESH index over the original corpus
    d_ref = str(tmp_path_factory.mktemp("tt") / "ref")
    ref = build_segments(docs, d_ref, id_col="doc_id", text_col="content")
    return si, ref


@pytest.mark.parametrize("q", ["merge", "merge join", '"merge join"', "merge AND sort"])
def test_pinned_equals_fresh_build(indexes, q):
    si, ref = indexes
    pinned = si.at_generation(0)
    got = _rows(search_segments(pinned, q, k=20))
    want = _rows(search_segments(ref, q, k=20))
    assert got == want, q  # ranks AND scores (idf/avgdl as of gen 0)


def test_live_sees_the_upsert(indexes):
    si, _ = indexes
    live = {d for d, _ in _rows(search_segments(si, "merge", k=50))}
    assert 100 in live and 0 not in live
    pinned = {d for d, _ in _rows(search_segments(si.at_generation(0), "merge", k=50))}
    assert 0 in pinned and 100 not in pinned


def test_pinned_stats_are_historic(indexes):
    si, ref = indexes
    pinned = si.at_generation(0)
    assert pinned.stats.n_docs == ref.stats.n_docs
    assert pinned.stats.total_tokens == ref.stats.total_tokens
    assert si.stats.n_docs == ref.stats.n_docs + 2  # maxDoc semantics


def test_delete_respects_pin(indexes, spark):
    si, _ = indexes
    ids = spark.createDataFrame([(2,)], "doc_id long")
    si2 = delete_doc_ids(si, ids)
    live = {d for d, _ in _rows(search_segments(si2, "merge", k=50))}
    assert 2 not in live
    # pinned BEFORE the delete generation still sees doc 2
    pinned = {
        d for d, _ in _rows(search_segments(si2.at_generation(1), "merge", k=50))
    }
    assert 2 in pinned


def test_pinned_rejects_sidecar_filters(indexes):
    si, _ = indexes
    with pytest.raises(ValueError):
        search_segments(si.at_generation(0), "merge", filter_paths=["/lang/en"])


def test_unpin_forward_rejected(indexes):
    si, _ = indexes
    p = si.at_generation(0)
    with pytest.raises(ValueError):
        p.at_generation(1)


def test_missing_generation_rejected(indexes):
    si, _ = indexes
    with pytest.raises(ValueError):
        si.at_generation(-1)
