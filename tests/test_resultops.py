"""Result-shaping collectors (fugu_spark/resultops.py): exact hit
counts, field collapsing (grouped top-k), MoreLikeThis — verified
against hand-derived answers on the 12-doc fixture corpus and against
the pure-Python BM25 oracle for score identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.postings import build_index
from fugu_spark.resultops import grouped_topk, match_count, mlt_terms, more_like_this
from fugu_spark.search import search

from .test_search import DOCS


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, t, ["py", "rs", "go"][i % 3]) for i, t in DOCS.items()]
    return spark.createDataFrame(rows, "doc_id long, content string, lang string")


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


MERGE_DOCS = {0, 2, 4, 8, 9}
JOIN_DOCS = {0, 4, 9}


class TestMatchCount:
    def test_or(self, index):
        got = match_count(index, "merge join").collect()[0].n_matches
        assert got == len(MERGE_DOCS | JOIN_DOCS)

    def test_and(self, index):
        assert match_count(index, "merge AND join").collect()[0].n_matches == len(
            MERGE_DOCS & JOIN_DOCS
        )

    def test_not(self, index):
        assert match_count(index, "merge NOT join").collect()[0].n_matches == len(
            MERGE_DOCS - JOIN_DOCS
        )

    def test_phrase(self, index):
        # adjacent "merge join" appears only in docs 0
        assert match_count(index, '"merge join"').collect()[0].n_matches == 1

    def test_absent_and_all(self, index):
        assert match_count(index, "zzzznotfound").collect()[0].n_matches == 0
        assert match_count(index, "").collect()[0].n_matches == len(DOCS)


class TestGroupedTopk:
    def test_counts_and_order(self, index, docs_df):
        out = grouped_topk(index, "merge", docs_df, "lang", k_per_group=2).collect()
        by_group: dict[str, list] = {}
        for r in out:
            by_group.setdefault(r.group, []).append(r)
        # merge docs 0,2,4,8,9 → lang py:{0,9}, rs:{4}, go:{2,8}
        assert set(by_group) == {"py", "rs", "go"}
        assert len(by_group["rs"]) == 1
        for rows in by_group.values():
            assert [r.rank_in_group for r in rows] == list(range(1, len(rows) + 1))
            scores = [r.score for r in rows]
            assert scores == sorted(scores, reverse=True)

    def test_matches_global_search(self, index, docs_df):
        """Every grouped hit carries the same score the flat search gives."""
        flat = {r.doc_id: r.score for r in search(index, "merge", k=100).collect()}
        for r in grouped_topk(index, "merge", docs_df, "lang", k_per_group=3).collect():
            assert r.score == pytest.approx(flat[r.doc_id], abs=1e-9)


class TestMoreLikeThis:
    def test_terms_ranked_tfidf(self, index):
        # doc 8 = 'merge' ×5: its only term is 'merge'
        assert mlt_terms(index, 8, 5) == ["merge"]

    def test_seed_excluded_and_scores_match_or_query(self, index):
        got = more_like_this(index, 8, max_terms=5, k=10).collect()
        ids = [r.doc_id for r in got]
        assert 8 not in ids
        flat = {
            r.doc_id: r.score
            for r in search(index, "merge", k=100).collect()
            if r.doc_id != 8
        }
        assert set(ids) == set(flat)
        for r in got:
            assert r.score == pytest.approx(flat[r.doc_id], abs=1e-9)

    def test_empty_seed(self, index, spark):
        assert more_like_this(index, 999999, k=5).count() == 0

    def test_max_terms_cap(self, index):
        # doc 0 has 4 distinct terms; cap at 2 keeps the top tf×idf pair
        t2 = mlt_terms(index, 0, 2)
        t4 = mlt_terms(index, 0, 4)
        assert len(t2) == 2 and set(t2) <= set(t4)


def test_grouped_topk_plan_has_map_side_group_limit(index, docs_df):
    """WindowGroupLimit must appear BELOW the exchange (partial mode):
    each map task ships at most k rows per group it saw, so a hot group
    cannot funnel the whole corpus into one window partition."""
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        grouped_topk(index, "merge", docs_df, "lang", k_per_group=2).explain("formatted")
    txt = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) WindowGroupLimit", txt, re.M)) >= 2, txt
    assert "Partial" in txt  # the map-side (pre-shuffle) instance


class TestBatchMLT:
    def test_identity_vs_single_seed(self, index):
        from fugu_spark.resultops import batch_mlt

        batch = batch_mlt(index, max_terms=3, k=4).collect()
        by_seed: dict[int, list] = {}
        for r in batch:
            by_seed.setdefault(r.seed, []).append((r.cand, r.score))
        # a doc whose selected (rare) terms occur nowhere else has no
        # lexical neighbors — e.g. fixture docs 7 ('a b c d e f g') and
        # 11 ('rare_unique_term …'); everyone else gets recommendations
        assert set(by_seed) <= set(DOCS)
        assert {0, 2, 4, 8, 9} <= set(by_seed)
        for seed in (0, 4, 8, 9):
            single = more_like_this(index, seed, max_terms=3, k=4).collect()
            assert [(r.doc_id, pytest.approx(r.score, abs=1e-9)) for r in single] == by_seed[seed]

    def test_ranks_contiguous_and_seed_excluded(self, index):
        from fugu_spark.resultops import batch_mlt

        for r in batch_mlt(index, max_terms=3, k=4).collect():
            assert r.cand != r.seed
            assert 1 <= r.rank <= 4

    def test_plan_map_side_group_limit(self, index):
        """The per-seed top-k window must carry the WindowGroupLimit
        pushdown (map-side partial top-k), like grouped_topk."""
        import io
        import re
        from contextlib import redirect_stdout

        from fugu_spark.resultops import batch_mlt

        buf = io.StringIO()
        with redirect_stdout(buf):
            batch_mlt(index, max_terms=3, k=4).explain("formatted")
        assert len(re.findall(r"^\(\d+\) WindowGroupLimit", buf.getvalue(), re.M)) >= 2


class TestSpellSuggest:
    def test_orders_by_distance_then_df(self, index):
        from fugu_spark.resultops import spell_suggest

        got = spell_suggest(index, "merg", n=5).collect()
        assert got, "no suggestions for 'merg'"
        # 'merge' is distance 1 and frequent; it must lead
        assert got[0].term == "merge" and got[0].distance == 1
        keys = [(r.distance, -r.df, r.term) for r in got]
        assert keys == sorted(keys)

    def test_excludes_exact_and_respects_cap(self, index):
        from fugu_spark.resultops import spell_suggest

        got = spell_suggest(index, "merge", n=3).collect()
        assert all(r.term != "merge" for r in got)
        assert len(got) <= 3
        assert all(r.distance <= 2 for r in got)


def test_batch_mlt_max_df_excludes_common_terms(index):
    """max_df (Lucene maxDocFreq) drops common terms from selection —
    the scale knob bounding candidate fan-out."""
    from fugu_spark.resultops import batch_mlt

    # 'merge' (df 5) is doc 8's only term; with max_df=4 doc 8 selects
    # nothing and gets no recommendations, while low-df docs still do
    out = batch_mlt(index, max_terms=3, k=4, max_df=4).collect()
    seeds = {r.seed for r in out}
    assert 8 not in seeds
    default = batch_mlt(index, max_terms=3, k=4).collect()
    assert 8 in {r.seed for r in default}


def test_term_vectors(spark):
    from fugu_spark.postings import build_index
    from fugu_spark.resultops import term_vectors

    docs = spark.createDataFrame(
        [(0, "merge join merge"), (1, "join sort"), (2, "merge")],
        "doc_id long, content string",
    )
    idx = build_index(docs, id_col="doc_id", text_col="content")
    out = {r.term: r for r in term_vectors(idx, 0).collect()}
    assert set(out) == {"merge", "join"}
    assert out["merge"].tf == 2 and list(out["merge"].positions) == [0, 2]
    assert out["join"].tf == 1 and list(out["join"].positions) == [1]
    assert out["merge"].df == 2 and out["merge"].cf == 3  # docs 0,2; 3 occurrences
    assert out["join"].df == 2 and out["join"].cf == 2
    bare = term_vectors(idx, 0, with_stats=False).columns
    assert bare == ["term", "tf", "positions"]
