"""search_after cursor pagination (ES search_after / Lucene
searchAfter): page N+1 via cursor must equal rank-based offset paging
on both the table path (search.top_k) and the serving path
(LocalSearcher), with O(k) plans (no row_number window, no
offset-deep heap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.search import search, top_k

from .test_search import DOCS


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, content string"
    )


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


def _rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _cursor(row):
    doc_id, score = row
    return (score, doc_id)


class TestTablePath:
    @pytest.mark.parametrize("q", ["merge join", "merge join sort hash"])
    def test_cursor_sweep_equals_offset_paging(self, index, q):
        full = _rows(search(index, q, k=100))
        page = max(2, len(full) // 3)  # 3-4 pages covers the whole set
        cursor, swept = None, []
        for _ in range(6):
            got = _rows(search(index, q, k=page, search_after=cursor))
            if not got:
                break
            swept.extend(got)
            cursor = _cursor(got[-1])
        assert swept == full  # covers everything, in order, no overlap

    def test_tie_break_across_cursor(self, index):
        # doc 8 is "merge merge ..." — craft a query where several docs
        # tie exactly (single term, same tf/doc_len would tie); even
        # without exact ties the equality branch must not drop docs:
        full = _rows(search(index, "quick brown fox", k=10))
        first = _rows(search(index, "quick brown fox", k=1))
        rest = _rows(
            search(index, "quick brown fox", k=9, search_after=_cursor(first[-1]))
        )
        assert first + rest == full

    def test_mutually_exclusive_with_offset(self, index):
        scored = search(index, "merge", k=10)
        with pytest.raises(ValueError):
            top_k(scored, k=5, offset=5, search_after=(1.0, 0))

    def test_no_window_in_cursor_plan(self, index):
        out = search(index, "merge join", k=5, search_after=(0.5, 3))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan  # offset paging pays a window; cursor must not

    def test_sort_by_rejected(self, index, docs_df):
        d = docs_df.withColumn("n", F.length("content"))
        with pytest.raises(ValueError):
            search(index, "merge", k=5, docs=d, sort_by="n", search_after=(1.0, 0))


class TestServingPath:
    @pytest.fixture(scope="class")
    def searcher(self, spark, docs_df, tmp_path_factory):
        from fugu_spark.segments import build_segments
        from fugu_spark.serve import LocalSearcher

        d = str(tmp_path_factory.mktemp("sa") / "idx")
        build_segments(docs_df, d, id_col="doc_id", text_col="content")
        return LocalSearcher(d)

    @pytest.mark.parametrize(
        "q",
        [
            "merge join",               # flat OR (MaxScore path when no cursor)
            "merge AND join",           # musts
            "(merge OR sort) AND join", # nested boolean
        ],
    )
    def test_cursor_equals_offset(self, searcher, q):
        full = searcher.search(q, k=50)
        rows = list(full.itertuples(index=False))
        for split in (1, 2, len(rows) - 1 if len(rows) > 1 else 1):
            cur = (rows[split - 1].score, rows[split - 1].doc_id)
            got = list(searcher.search(q, k=50, search_after=cur).itertuples(index=False))
            want = rows[split:]
            assert [g.doc_id for g in got] == [w.doc_id for w in want], (q, split)
            for g, w in zip(got, want):
                assert g.score == w.score

    def test_offset_and_cursor_exclusive(self, searcher):
        with pytest.raises(ValueError):
            searcher.search("merge", k=5, offset=5, search_after=(1.0, 0))

    def test_matches_table_path(self, searcher, index):
        first = _rows(search(index, "merge join", k=2))
        cur = _cursor(first[-1])
        t = _rows(search(index, "merge join", k=10, search_after=cur))
        s = list(
            searcher.search("merge join", k=10, search_after=cur).itertuples(
                index=False
            )
        )
        assert [x.doc_id for x in s] == [d for d, _ in t]
        for x, (_, score) in zip(s, t):
            assert x.score == pytest.approx(score, abs=1e-9)
