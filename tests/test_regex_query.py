"""Regex term queries ``/pattern/`` — the Tantivy RegexQuery analog
(tantivy::query::RegexQuery; programmatic in the reference, surfaced
here through Lucene's slash syntax as a documented extension).

Semantics pinned per queryparse.Leaf.regex: raw pattern (no analysis,
no lowercasing), anchored whole-term match, expanded at execution time
to an OR-group of up to PREFIX_MAX_EXPANSIONS dictionary terms in
dictionary order — exactly the prefix/fuzzy expansion machinery, so
rank/score identity holds across the table, segment, served, and batch
paths."""

from __future__ import annotations

import pytest

from fugu_spark import postings as P
from fugu_spark.queryparse import parse_query, regex_literal_prefix
from fugu_spark.search import search

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


def test_regex_leaf_flags():
    plan = parse_query("/jo.*/")
    assert len(plan.leaves) == 1
    l = plan.leaves[0]
    assert l.regex and l.terms == ("jo.*",) and l.occur == "should"


def test_regex_field_sign_boost():
    plan = parse_query("name:/me?rge/^2 -/sca[nm]/", fields={"text", "name"})
    a, b = plan.leaves
    assert a.regex and a.fld == "name" and a.boost == 2.0
    assert b.regex and b.occur == "must_not" and b.terms == ("sca[nm]",)


def test_regex_inside_quotes_is_phrase_text():
    plan = parse_query('"see /foo/ here"')
    assert len(plan.leaves) == 1 and plan.leaves[0].is_phrase
    assert not plan.leaves[0].regex


def test_url_is_not_regex():
    # 'http://example.com/page' must not parse a regex clause out of the
    # slashes (empty body / no closing delimiter at a boundary)
    plan = parse_query("http://example.com/page")
    assert all(not l.regex for l in plan.leaves)


def test_bad_regex_falls_back_to_strip():
    # '(' unbalanced: parse error → Tantivy-escape strip → '/badpat/'
    # re-parses as a (now valid) pure-literal regex leaf
    plan = parse_query("/bad(pat/")
    assert len(plan.leaves) == 1
    assert plan.leaves[0].terms == ("badpat",)


def test_escaped_slash_in_pattern():
    plan = parse_query(r"/a\/b/")
    assert plan.leaves[0].regex and plan.leaves[0].terms == ("a/b",)


def test_literal_prefix_extraction():
    assert regex_literal_prefix("sch.*") == "sch"
    assert regex_literal_prefix("merge") == "merge"
    assert regex_literal_prefix("ab?c") == "a"  # 'b' optional
    assert regex_literal_prefix("ab+c") == "ab"  # '+' keeps >=1 'b'
    assert regex_literal_prefix(".*x") == ""
    assert regex_literal_prefix("foo(bar|baz)") == "foo"


# ---------------------------------------------------------- table path


def _ranks(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_regex_equals_explicit_or(corpus):
    """'/jo.*/' expands to {join, joiner, jointly, joins} — identical
    ranks/scores to spelling the OR-group out by hand."""
    docs, idx = corpus
    got = _ranks(search(idx, "/jo.*/", k=10, docs=docs))
    want = _ranks(search(idx, "join joiner jointly joins", k=10, docs=docs))
    assert got == want and len(got) > 0


def test_regex_no_match_is_dead_clause(corpus):
    docs, idx = corpus
    assert _ranks(search(idx, "/zz.*x/", k=10, docs=docs)) == []
    # dead regex OR'd with a live term ≡ the term alone
    got = _ranks(search(idx, "merge /zz.*x/", k=10, docs=docs))
    want = _ranks(search(idx, "merge", k=10, docs=docs))
    assert got == want


def test_regex_as_must_and_not(corpus):
    docs, idx = corpus
    got = {r[0] for r in _ranks(search(idx, "merge AND /jo.*/", k=10, docs=docs))}
    assert got == {0, 5}  # merge docs that also have a jo- term
    got = {r[0] for r in _ranks(search(idx, "merge -/jo.*/", k=10, docs=docs))}
    assert got == {1}


def test_regex_anchored_whole_term(corpus):
    docs, idx = corpus
    # '/oin/' matches no whole term (it is a substring of 'join')
    assert _ranks(search(idx, "/oin/", k=10, docs=docs)) == []


# ------------------------------------------------ segments + served paths


def test_regex_segments_and_served_parity(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "rx"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    # includes a prefix-free pattern ('/.*n/') — the full-dictionary-scan
    # path — and a boolean mix
    for q in ("/jo.*/", "/.*n/", "merge AND /jo.*/", "merge -/jo.*/"):
        mem = _ranks(search(idx, q, k=10, docs=docs))
        seg = _ranks(search_segments(si, q, k=10, docs=docs))
        pdf = ls.search(q, k=10)
        srv = [(int(r.doc_id), round(r.score, 9)) for r in pdf.itertuples()]
        assert mem == seg == srv, q


def test_regex_batch_parity(spark, corpus, tmp_path):
    """The batch path expands regex leaves through the same per-source
    expanders — rank identity against the single-query engine."""
    from fugu_spark.batch import batch_search_segments
    from fugu_spark.segments import build_segments

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "rb"), id_col="doc_id", text_col="text")
    out = batch_search_segments(si, {1: "/jo.*/", 2: "merge AND /jo.*/"}, k=10)
    rows = out.collect()
    got = {
        qid: [
            (r["doc_id"], round(r["score"], 9))
            for r in sorted(
                (r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"]
            )
        ]
        for qid in (1, 2)
    }
    for qid, qstr in ((1, "/jo.*/"), (2, "merge AND /jo.*/")):
        want = _ranks(search(idx, qstr, k=10, docs=docs))
        assert got[qid] == want, qid


def test_regex_percolate_rejected():
    from fugu_spark.percolate import compile_queries

    with pytest.raises(ValueError):
        compile_queries({1: "/jo.*/"})


# ------------------------------------------------------------- wildcards
# Lucene WildcardQuery ('te?m', 't*m*') — translated at parse time to an
# anchored regex leaf (lowercased, Lucene lowercase_expanded_terms) and
# expanded through the identical machinery.


def test_wildcard_translates_to_regex_leaf():
    plan = parse_query("jo?n*")
    assert len(plan.leaves) == 1
    l = plan.leaves[0]
    assert l.regex and l.terms == ("jo.n.*",)
    # lowercased, metachars in literals escaped
    plan = parse_query("Jo?N")
    assert plan.leaves[0].terms == ("jo.n",)


def test_trailing_star_stays_prefix_leaf():
    plan = parse_query("mer*")
    assert plan.leaves[0].prefix_last and not plan.leaves[0].regex


def test_bare_wildcards_do_not_leaf():
    # '*' alone = AllQuery; '??' has no literal char → dropped
    assert parse_query("*").is_all
    assert parse_query("??").is_all


def test_wildcard_equals_regex(corpus):
    docs, idx = corpus
    got = _ranks(search(idx, "jo*n*", k=10, docs=docs))
    want = _ranks(search(idx, "/jo.*n.*/", k=10, docs=docs))
    assert got == want and len(got) > 0


def test_leading_wildcard_full_scan(corpus):
    docs, idx = corpus
    # '*oin*' has no literal prefix — full dictionary scan, matches the
    # jo- family ('join', 'joiner', ...) via substring
    got = _ranks(search(idx, "*oin*", k=10, docs=docs))
    want = _ranks(search(idx, "/.*oin.*/", k=10, docs=docs))
    assert got == want and len(got) > 0


def test_wildcard_served_parity(spark, corpus, tmp_path):
    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import build_segments
    from fugu_spark.serve import LocalSearcher

    docs, idx = corpus
    si = build_segments(docs, str(tmp_path / "wc"), id_col="doc_id", text_col="text")
    ls = LocalSearcher(si.index_dir)
    for q in ("jo?n", "s?rt merge", "merge AND jo*n*"):
        mem = _ranks(search(idx, q, k=10, docs=docs))
        seg = _ranks(search_segments(si, q, k=10, docs=docs))
        pdf = ls.search(q, k=10)
        srv = [(int(r.doc_id), round(r.score, 9)) for r in pdf.itertuples()]
        assert mem == seg == srv, q
