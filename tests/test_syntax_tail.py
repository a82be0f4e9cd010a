"""Parser syntax tail (VERDICT r4 Next #6): term-set sugar
``field: IN [a b]``, dictionary-prefix queries ``term*`` / ``"a b"*``,
and lexicographic term ranges ``[a TO b]`` over non-date fields.

The reference passes raw query strings to Tantivy's QueryParser
(/root/reference/src/db/search.rs:112-118), so this grammar is reachable
through its search route; semantics pinned here per queryparse.Leaf."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark import postings as P
from fugu_spark.queryparse import expand_plan, parse_query
from fugu_spark.search import search, search_fields

DOCS = [
    (0, "merge join plan", "alpha"),
    (1, "merge sort network", "alpha"),
    (2, "hash join probe", "beta"),
    (3, "joiner jointly joins", "beta"),
    (4, "vector scan only", "gamma"),
    (5, "merge joins fast", "gamma"),
]
SCHEMA = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA).cache()
    idx = P.build_index(docs, id_col="doc_id", text_col="text")
    return docs, idx


# ---------------------------------------------------------------- parsing


def test_in_set_rewrites_to_field_group():
    plan = parse_query("source: IN [alpha beta]", fields={"text", "source"})
    assert plan.root is not None
    assert sorted(l.terms[0] for l in plan.leaves) == ["alpha", "beta"]
    assert all(l.fld == "source" for l in plan.leaves)


def test_in_set_inside_quotes_is_phrase_text():
    plan = parse_query('"source: IN [alpha beta]"', fields={"source"})
    # the quoted text is a phrase; IN/brackets are not clause syntax
    assert len(plan.leaves) == 1 and plan.leaves[0].is_phrase


def test_in_set_without_known_field_strips():
    # single-index search has no field set: ':' '[' ']' strip, members
    # become bare terms (the reference's escape-and-retry)
    plan = parse_query("lang: IN [es de]")
    terms = sorted(t for l in plan.leaves for t in l.terms)
    assert terms == ["de", "es", "in", "lang"]


def test_trailing_star_marks_prefix_leaf():
    plan = parse_query("merge jo*")
    assert [l.prefix_last for l in plan.leaves] == [False, True]
    assert plan.leaves[1].terms == ("jo",)


def test_phrase_star_marks_prefix_phrase():
    plan = parse_query('"merge jo"*')
    (leaf,) = plan.leaves
    assert leaf.prefix_last and leaf.terms == ("merge", "jo") and leaf.slop == 0


def test_bare_range_leaf():
    plan = parse_query("[join TO merge]")
    (leaf,) = plan.leaves
    assert leaf.rng == ("join", "merge", True, True)
    assert leaf.terms == ()


def test_exclusive_range_and_open_sides():
    plan = parse_query("{join TO *}")
    (leaf,) = plan.leaves
    assert leaf.rng == ("join", None, False, False)


def test_expand_plan_zero_expansions_is_dead():
    plan = parse_query("zz*")
    out = expand_plan(plan, lambda leaf: [])
    assert out.leaves == [] and not out.is_all


# ---------------------------------------------------------------- execution


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_term_prefix_matches_expansion_or(corpus):
    docs, idx = corpus
    got = search(idx, "jo*", k=10, docs=docs)
    # expansions of 'jo': join, joiner, jointly, joins
    want = search(idx, "join joiner jointly joins", k=10, docs=docs)
    assert [(r["doc_id"], round(r["score"], 9)) for r in got.collect()] == [
        (r["doc_id"], round(r["score"], 9)) for r in want.collect()
    ]


def test_phrase_prefix(corpus):
    docs, idx = corpus
    got = _ids(search(idx, '"merge jo"*', k=10, docs=docs))
    # docs where 'merge' is adjacently followed by a 'jo…' term
    assert got == sorted(
        _ids(search(idx, '"merge join" "merge joins"', k=10, docs=docs))
    ) or set(got) == {0, 5}


def test_prefix_as_must_clause(corpus):
    docs, idx = corpus
    got = set(_ids(search(idx, "merge AND jo*", k=10, docs=docs)))
    assert got == {0, 5}  # merge + some jo… term


def test_prefix_not_clause(corpus):
    docs, idx = corpus
    got = set(_ids(search(idx, "merge NOT jo*", k=10, docs=docs)))
    assert got == {1}  # merge docs without any jo… term


def test_range_constant_score(corpus):
    docs, idx = corpus
    out = search(idx, "[joiner TO jointly]", k=10, docs=docs)
    rows = out.collect()
    # joiner ≤ {joiner, joins} ≤ jointly → docs 3 and 5
    assert {r["doc_id"] for r in rows} == {3, 5}
    assert all(r["score"] == 1.0 for r in rows)


def test_range_with_term_or(corpus):
    docs, idx = corpus
    out = {r["doc_id"]: r["score"] for r in search(idx, "merge [joiner TO jointly]", k=10, docs=docs).collect()}
    assert 3 in out and out[3] == 1.0  # range-only match: constant score
    assert all(i in out for i in (0, 1, 5))  # merge docs score BM25


def test_range_exclusive_bounds(corpus):
    docs, idx = corpus
    # {join TO joins} excludes both endpoints → only joiner/jointly docs
    out = set(_ids(search(idx, "{join TO joins}", k=10, docs=docs)))
    assert out == {3}


def test_range_not_clause(corpus):
    docs, idx = corpus
    out = set(_ids(search(idx, "merge NOT [join TO joins]", k=10, docs=docs)))
    # excludes docs containing any term in [join, joins]
    assert out == {1}


def test_segments_parity_prefix_and_range(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "idx"), id_col="doc_id", text_col="text")
    for q in ("jo*", '"merge jo"*', "merge AND jo*", "[joiner TO jointly]",
              "merge [join TO joins]", "merge NOT [join TO joins]"):
        mem = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(idx, q, k=10, docs=docs).collect()
        ]
        seg = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_segments(si, q, k=10, docs=docs).collect()
        ]
        assert mem == seg, q


def test_multifield_in_set(corpus):
    docs, idx_text = corpus
    idx_src = P.build_index(docs, id_col="doc_id", text_col="source")
    got = search_fields(
        {"text": idx_text, "source": idx_src}, "source: IN [alpha gamma] merge",
        k=10, docs=docs,
    )
    ids = {r["doc_id"] for r in got.collect()}
    # alpha/gamma docs (0,1,4,5) from the set, merge adds nothing new
    assert ids == {0, 1, 4, 5}


def test_engine_falls_back_for_prefix(spark, corpus, tmp_path):
    """The engine facade serves prefix queries end-to-end (locally since
    r5; previously via Spark fallback) — results must be the expansion
    OR's."""
    from fugu_spark.engine import FuguSparkEngine

    docs, _ = corpus
    eng = FuguSparkEngine.build(
        docs, index_dir=str(tmp_path / "eng"), facets_col=None
    )
    out = {r["doc_id"] for r in eng.search("jo*", k=10).collect()}
    assert out == {0, 2, 3, 5}


# ---------------------------------------------------------------- fuzzy / exists


def test_fuzzy_parse_flags():
    plan = parse_query("joun~1 merge")
    assert plan.leaves[0].fuzzy == 1 and plan.leaves[0].terms == ("joun",)
    assert plan.leaves[1].fuzzy == 0


def test_fuzzy_multi_token_word_stays_phrase():
    plan = parse_query("hash-join~1")
    (leaf,) = plan.leaves
    assert leaf.is_phrase and leaf.fuzzy == 0


def test_fuzzy_matches_levenshtein_expansion(corpus):
    docs, idx = corpus
    # 'joun' is distance 1 from 'join' and 'jo' → depends on vocab;
    # compare against the explicit OR of the true expansion set
    got = search(idx, "joun~1", k=10, docs=docs)
    want = search(idx, "join", k=10, docs=docs)  # only vocab term at d<=1
    assert [(r["doc_id"], round(r["score"], 9)) for r in got.collect()] == [
        (r["doc_id"], round(r["score"], 9)) for r in want.collect()
    ]


def test_fuzzy_distance_2(corpus):
    docs, idx = corpus
    # 'jiner~2': joiner (1 ins), joins? j-i-n-e-r vs j-o-i-n-s = 3 → no
    got = set(_ids(search(idx, "jiner~2", k=10, docs=docs)))
    assert got == {3}  # only the joiner doc


def test_fuzzy_as_must(corpus):
    docs, idx = corpus
    got = set(_ids(search(idx, "merge AND joun~1", k=10, docs=docs)))
    assert got == {0}  # merge + join


def test_fuzzy_segments_parity(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "fz"), id_col="doc_id", text_col="text")
    for q in ("joun~1", "jiner~2", "merge AND joun~1"):
        mem = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(idx, q, k=10, docs=docs).collect()
        ]
        seg = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_segments(si, q, k=10, docs=docs).collect()
        ]
        assert mem == seg, q


def test_field_exists(corpus):
    docs, idx_text = corpus
    idx_src = P.build_index(docs, id_col="doc_id", text_col="source")
    out = {
        r["doc_id"]: r["score"]
        for r in search_fields(
            {"text": idx_text, "source": idx_src}, "source:*", k=10, docs=docs
        ).collect()
    }
    # every doc has a source token → constant 1.0 for all six docs
    assert out == {i: 1.0 for i in range(6)}


def test_exists_unknown_field_strips():
    # single-index: ':' and '*' strip → bare term 'source'
    plan = parse_query("source:*")
    assert [l.terms for l in plan.leaves] == [("source",)]


def test_prefix_serves_locally(spark, corpus, tmp_path):
    """Prefix queries serve from LocalSearcher (dictionary byte-range
    expansion) — rank/score identical to the Spark segment path."""
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "ps"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    for q in ("jo*", '"merge jo"*', "merge AND jo*", "merge NOT jo*"):
        pdf = ls.search(q, k=10)
        srv = [(int(r.doc_id), round(r.score, 9)) for r in pdf.itertuples()]
        seg = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_segments(si, q, k=10, docs=docs).collect()
        ]
        assert srv == seg, q


def test_fuzzy_still_raises_locally(spark, corpus, tmp_path):
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, _ = corpus
    si = build_segments(docs, str(tmp_path / "fr"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    for q in ("joun~1", "[join TO merge]"):
        with pytest.raises(ValueError):
            ls.search(q, k=5)


# ------------------------------------------------- signed phrase / range


class TestSignedClauses:
    """Tantivy occur prefixes on NON-word clauses: '-"a b"', '+"a b"',
    '-[a TO b]' — the sign binds to the phrase/range token itself
    (previously the lexer split '-"merge join"' into the words
    '-"merge' / 'join"', negating only the first term)."""

    def test_minus_phrase_parses_must_not(self):
        plan = parse_query('-"merge join" scan')
        assert [(l.occur, l.terms) for l in plan.leaves] == [
            ("must_not", ("merge", "join")),
            ("should", ("scan",)),
        ]

    def test_plus_phrase_parses_must(self):
        plan = parse_query('+"merge join" scan')
        assert plan.leaves[0].occur == "must"
        assert plan.leaves[0].terms == ("merge", "join")

    def test_signed_field_phrase(self):
        plan = parse_query('-name:"merge join"', fields={"name"})
        assert plan.leaves[0].occur == "must_not"
        assert plan.leaves[0].fld == "name"

    def test_minus_range_parses_must_not(self):
        plan = parse_query("-[scan TO sort] merge")
        assert plan.leaves[0].occur == "must_not"
        assert plan.leaves[0].rng == ("scan", "sort", True, True)

    def test_sign_wins_over_pending(self):
        # 'AND -"a b"': the attached sign beats the pending AND upgrade
        plan = parse_query('merge AND -"hash join"')
        assert plan.leaves[1].occur == "must_not"

    def test_not_phrase_unchanged(self):
        plan = parse_query('NOT "merge join" scan')
        assert plan.leaves[0].occur == "must_not"
        assert plan.leaves[0].terms == ("merge", "join")

    def test_minus_phrase_execution(self, corpus):
        docs, idx = corpus
        got = {r.doc_id for r in search(idx, '-"merge join" merge', k=10).collect()}
        # docs with 'merge' (0,1,5) minus the adjacent-phrase doc 0
        assert got == {1, 5}

    def test_plus_phrase_execution(self, corpus):
        docs, idx = corpus
        rows = search(idx, '+"merge join" merge', k=10).collect()
        assert [r.doc_id for r in rows] == [0]

    def test_minus_range_execution(self, corpus):
        docs, idx = corpus
        got = {r.doc_id for r in search(idx, "-[probe TO scan] merge", k=10).collect()}
        # 'merge' docs are 0,1,5; range [probe..scan] hits doc 2 (probe)
        # and 4 (scan) only — no overlap, so all three survive; then
        # exclude any merge-doc containing a term in range: none
        assert got == {0, 1, 5}

    def test_minus_range_excludes(self, corpus):
        docs, idx = corpus
        got = {r.doc_id for r in search(idx, "-[network TO plan] merge", k=10).collect()}
        # range [network..plan] contains 'network' (doc 1) and 'plan'
        # (doc 0) -> merge docs 0 and 1 excluded
        assert got == {5}

    def test_signed_date_range_stays_in_string(self):
        from fugu_spark.dates import extract_date_ranges

        q, ranges = extract_date_ranges(
            "-date_created:[2024-01-01T00:00:00Z TO 2024-02-01T00:00:00Z] merge",
            ("date_created",),
        )
        assert ranges == {}
        assert "date_created" in q  # clause left for the strip fallback
