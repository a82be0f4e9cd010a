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


class TestCompactRange:
    @pytest.fixture()
    def tiered(self, spark, tmp_path_factory):
        docs = spark.createDataFrame(
            [(i, t) for i, t in DOCS.items()], "doc_id long, content string"
        )
        d = str(tmp_path_factory.mktemp("cr") / "idx")
        si = build_segments(docs, d, id_col="doc_id", text_col="content")
        b1 = spark.createDataFrame(
            [(0, "rewritten zero no keywords"), (200, "merge sort quick")],
            "doc_id long, content string",
        )
        si = upsert_segments(si, b1, id_col="doc_id", text_col="content")
        b2 = spark.createDataFrame(
            [(200, "merge join window"), (300, "hash table join")],
            "doc_id long, content string",
        )
        return upsert_segments(si, b2, id_col="doc_id", text_col="content")

    def test_live_identical_and_dead_dropped(self, tiered):
        from fugu_spark.segments import compact_range

        before = {
            q: _rows(search_segments(tiered, q, k=50))
            for q in ["merge", "merge join", '"merge join"', "merge AND sort"]
        }
        si2 = compact_range(tiered, 1, 2)
        for q, want in before.items():
            assert _rows(search_segments(si2, q, k=50)) == want, q
        # the merged range is now ONE generation directory (gen=2)
        import os

        gens = sorted(
            d for d in os.listdir(os.path.join(si2.index_dir, "segments"))
            if d.startswith("gen=")
        )
        assert gens == ["gen=0", "gen=2"]
        # doc 200's gen-1 posting was superseded in gen 2 → physically gone
        from fugu_spark.segment_search import decode_all_postings

        live = decode_all_postings(si2)
        assert live.filter("doc_id = 200 AND term = 'quick'").count() == 0

    def test_pins_across_merge(self, tiered):
        from fugu_spark.segments import compact_range

        pin0_before = _rows(search_segments(tiered.at_generation(0), "merge", k=50))
        pin2_before = _rows(search_segments(tiered.at_generation(2), "merge", k=50))
        si2 = compact_range(tiered, 1, 2)
        # pins below the merged range are byte-stable
        assert _rows(search_segments(si2.at_generation(0), "merge", k=50)) == pin0_before
        # the pin AT the range's top edge stays a consistent reader; its
        # derived df reflects the physically-removed dead postings
        # (Lucene reopen-after-merge), so doc SET is preserved, scores
        # may shift
        pin2_after = _rows(search_segments(si2.at_generation(2), "merge", k=50))
        assert {d for d, _ in pin2_after} == {d for d, _ in pin2_before}
        # pins STRICTLY inside the range are gone (anchor dropped)
        hist = [
            h["gen"]
            for h in __import__("json").loads(
                __import__("fugu_spark.fsio", fromlist=["read_text"]).read_text(
                    __import__("fugu_spark.fsio", fromlist=["join"]).join(
                        si2.index_dir, "stats.json"
                    )
                )
            )["stats_history"]
        ]
        assert 1 not in hist and 0 in hist and 2 in hist

    def test_bad_range_rejected(self, tiered):
        from fugu_spark.segments import compact_range

        with pytest.raises(ValueError):
            compact_range(tiered, 2, 1)
        with pytest.raises(ValueError):
            compact_range(tiered, 0, 99)


class TestServedPIT:
    """LocalSearcher(as_of=g): the serving-side point-in-time twin."""

    def test_pinned_serving_matches_fresh_build(self, indexes):
        from fugu_spark.serve import LocalSearcher

        si, ref = indexes
        pinned = LocalSearcher(si.index_dir, as_of=0)
        fresh = LocalSearcher(ref.index_dir)
        for q in ["merge", "merge join", '"merge join"', "merge AND sort"]:
            got = list(pinned.search(q, k=20).itertuples(index=False))
            want = list(fresh.search(q, k=20).itertuples(index=False))
            assert [g.doc_id for g in got] == [w.doc_id for w in want], q
            for g, w in zip(got, want):
                assert g.score == pytest.approx(w.score, abs=1e-9), q

    def test_pinned_serving_stats(self, indexes):
        from fugu_spark.serve import LocalSearcher

        si, ref = indexes
        pinned = LocalSearcher(si.index_dir, as_of=0)
        live = LocalSearcher(si.index_dir)
        assert pinned.n_docs == ref.stats.n_docs
        assert live.n_docs == ref.stats.n_docs + 2

    def test_pinned_serving_rejects_filters(self, indexes):
        from fugu_spark.serve import LocalSearcher

        si, _ = indexes
        pinned = LocalSearcher(si.index_dir, as_of=0)
        with pytest.raises(ValueError):
            pinned.search("merge", k=5, filters=["/lang/en"])

    def test_pinned_serving_bad_generation(self, indexes):
        from fugu_spark.serve import LocalSearcher

        si, _ = indexes
        with pytest.raises(ValueError):
            LocalSearcher(si.index_dir, as_of=-1)


def test_index_stats_report(indexes, spark):
    from fugu_spark.segments import index_stats

    si, ref = indexes
    rows = {r.gen: r for r in index_stats(si).collect()}
    assert set(rows) >= {0, 1}
    assert rows[0].pinned and rows[1].pinned
    # gen-0 postings == the fresh reference build's total postings
    ref_rows = {r.gen: r for r in index_stats(ref).collect()}
    assert rows[0].n_postings == ref_rows[0].n_postings
    assert rows[1].n_terms > 0 and rows[1].bytes_encoded > 0
