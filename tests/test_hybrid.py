"""Hybrid retrieval (fugu_spark/hybrid.py): RRF and weighted min-max
fusion — hand-computed fusions on fixed candidate lists, plus the
end-to-end hybrid_search composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.hybrid import RRF_C, hybrid_search, rrf_fuse, weighted_fuse
from fugu_spark.postings import build_index

from .test_search import DOCS


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, content string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


class TestRRF:
    def test_hand_computed(self, spark):
        a = _df(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])  # ranks 1,2,3
        b = _df(spark, [(2, 0.9), (4, 0.8)])            # ranks 1,2
        got = {r.doc_id: r.score for r in rrf_fuse([a, b], k=10).collect()}
        c = RRF_C
        want = {
            1: 1 / (c + 1),
            2: 1 / (c + 2) + 1 / (c + 1),
            3: 1 / (c + 3),
            4: 1 / (c + 2),
        }
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1e-12)
        # doc 2 (in both lists) must fuse on top
        assert max(got, key=got.get) == 2

    def test_rank_ties_break_by_doc_id(self, spark):
        a = _df(spark, [(5, 1.0), (3, 1.0)])  # equal scores → doc 3 ranks first
        got = rrf_fuse([a], k=2).collect()
        assert [r.doc_id for r in got] == [3, 5]

    def test_n_candidates_cap(self, spark):
        a = _df(spark, [(i, 100.0 - i) for i in range(10)])
        got = rrf_fuse([a], k=10, n_candidates=4).collect()
        assert {r.doc_id for r in got} == {0, 1, 2, 3}


class TestWeighted:
    def test_minmax_and_alpha(self, spark):
        a = _df(spark, [(1, 10.0), (2, 6.0), (3, 2.0)])  # minmax: 1, .5, 0
        b = _df(spark, [(2, 1.0), (3, 0.0)])             # minmax: 1, 0
        got = {r.doc_id: r.score for r in weighted_fuse(a, b, k=10, alpha=0.5).collect()}
        assert got[1] == pytest.approx(0.5)
        assert got[2] == pytest.approx(0.25 + 0.5)
        assert got[3] == pytest.approx(0.0)

    def test_degenerate_list_scores_zero(self, spark):
        a = _df(spark, [(1, 7.0), (2, 7.0)])  # max == min
        b = _df(spark, [(1, 1.0), (2, 0.0)])
        got = {r.doc_id: r.score for r in weighted_fuse(a, b, k=10).collect()}
        assert got[1] == pytest.approx(0.5)  # only the semantic half
        assert got[2] == pytest.approx(0.0)


class TestHybridSearch:
    def test_rrf_composition(self, spark, index, docs_df):
        # embeddings engineered so doc 4 is the semantic nearest neighbor
        emb = spark.createDataFrame(
            [(i, [1.0, 0.0] if i == 4 else [0.0, 1.0]) for i in DOCS],
            "vec_id long, embedding array<float>",
        )
        out = hybrid_search(index, emb, "merge join", [1.0, 0.0], k=5).collect()
        ids = [r.doc_id for r in out]
        # doc 4 (lexical match + the one semantic rank-1 hit) and doc 0
        # (lexical rank 1 + best cosine-0 tie rank) must fuse into the
        # top two; orthogonal non-matching docs cannot outrank them
        assert set(ids[:2]) == {0, 4}

    def test_unknown_fusion_raises(self, spark, index, docs_df):
        emb = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            hybrid_search(index, emb, "merge", [0.0], fusion="nope")


class TestBatchRRF:
    def test_matches_per_query_rrf(self, spark):
        """batch_rrf_fuse must equal rrf_fuse run per query."""
        from fugu_spark.hybrid import batch_rrf_fuse

        lex = spark.createDataFrame(
            [(0, 1, 9.0), (0, 2, 5.0), (1, 3, 4.0), (1, 1, 2.0)],
            "query_id long, doc_id long, score double",
        )
        sem = spark.createDataFrame(
            [(0, 2, 0.9), (0, 4, 0.8), (1, 3, 0.7)],
            "query_id long, doc_id long, score double",
        )
        got = batch_rrf_fuse([lex, sem], k=10).collect()
        for qid in (0, 1):
            single = rrf_fuse(
                [df.filter(F.col("query_id") == qid).drop("query_id") for df in (lex, sem)],
                k=10,
            ).collect()
            batch_q = [r for r in got if r.query_id == qid]
            assert [(r.doc_id, pytest.approx(r.score, abs=1e-12)) for r in single] == [
                (r.doc_id, r.score) for r in batch_q
            ]
            assert [r.rank for r in batch_q] == list(range(1, len(batch_q) + 1))

    def test_plan_group_limit_per_query(self, spark):
        import io
        import re
        from contextlib import redirect_stdout

        from fugu_spark.hybrid import batch_rrf_fuse

        a = spark.createDataFrame([(0, 1, 1.0)], "query_id long, doc_id long, score double")
        buf = io.StringIO()
        with redirect_stdout(buf):
            batch_rrf_fuse([a, a], k=3).explain("formatted")
        assert len(re.findall(r"^\(\d+\) WindowGroupLimit", buf.getvalue(), re.M)) >= 2
