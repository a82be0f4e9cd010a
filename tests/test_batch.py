"""Batch retrieval (fugu_spark.batch): many queries, one Spark job —
rank/score identity with the per-query segment engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.batch import batch_search_segments
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments


@pytest.fixture(scope="module")
def batch_setup(spark, tmp_path_factory):
    from fugu_spark.corpus import generate_corpus

    corpus = (
        generate_corpus(spark, 150)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    d = str(tmp_path_factory.mktemp("batch") / "idx")
    si = build_segments(corpus, d, id_col="doc_id", text_col="content")
    return corpus, si


QUERIES = {
    0: "merge join",
    1: "merge AND sort",
    2: "table NOT window",
    3: "merge^2 join sort",
    4: "hash",
    5: "merge join sort window table",  # wide OR
    6: "merge AND zzabsentzz",  # dead must → no rows for this query
    7: "merge zzabsentzz",  # absent should-leaf drops, query lives
}


def test_batch_matches_per_query(batch_setup):
    corpus, si = batch_setup
    out = batch_search_segments(si, QUERIES, k=7)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in QUERIES.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(search_segments(si, text, k=7, docs=corpus).collect())
        ]
        got = sorted(by_q.get(qid, []))
        assert got == want, f"q{qid}: {text}"
    assert 6 not in by_q  # dead-must query produces nothing


def test_batch_rank_column_is_dense_per_query(batch_setup):
    corpus, si = batch_setup
    out = batch_search_segments(si, {0: "merge join"}, k=5).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )


def test_batch_rejects_unsupported(batch_setup):
    corpus, si = batch_setup
    # v2 supports phrases, nested groups, and dictionary expansions;
    # still out of scope: AllQuery, NOT-only (doc universe — top-level
    # or as a group whose positives are all dead), term ranges
    for bad in (
        "",
        "NOT merge",
        "[alpha TO beta]",
        "(NOT merge NOT sort) window",  # NOT-only group needs all_docs
        "(zzabsentzz NOT merge) sort",  # positives dead → same branch
    ):
        with pytest.raises(ValueError):
            batch_search_segments(si, {0: bad}, k=5)


def test_batch_prefix_and_fuzzy_match_per_query(batch_setup):
    """Prefix/fuzzy queries expand driver-side and batch as nested
    OR-groups — identical ranks/scores to search_segments per query."""
    corpus, si = batch_setup
    queries = {0: "mer*", 1: "merge AND sor*", 2: "merhe~1"}
    out = batch_search_segments(si, queries, k=6)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in queries.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(search_segments(si, text, k=6, docs=corpus).collect())
        ]
        assert sorted(by_q.get(qid, [])) == want, f"q{qid}: {text}"


# ---- v2: phrases, slop, nested groups (VERDICT r4 Next #1) ----

V2_QUERIES = {
    10: '"merge join"',  # phrase
    11: '"merge join"~2',  # sloppy phrase
    12: "(merge OR join) AND sort",  # nested group
    13: '"merge join" sort',  # phrase + term mixed flat
    14: "(merge join)^2 AND (sort OR window)",  # boosted group + nested
    15: 'table NOT "merge join"',  # phrase exclusion
    16: "(merge AND zzabsentzz) OR sort",  # dead-must subgroup
    17: '"merge join" AND sort',  # must phrase
}


def test_batch_v2_matches_per_query(batch_setup):
    corpus, si = batch_setup
    out = batch_search_segments(si, V2_QUERIES, k=7)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in V2_QUERIES.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(search_segments(si, text, k=7, docs=corpus).collect())
        ]
        got = sorted(by_q.get(qid, []))
        assert got == want, f"q{qid}: {text}"


def test_batch_v2_mixed_flat_and_nested_one_call(batch_setup):
    """Flat and nested queries combine through different paths (column
    fold vs tree kernel) inside ONE job — both must agree per query."""
    corpus, si = batch_setup
    mixed = {**QUERIES, **V2_QUERIES}
    out = batch_search_segments(si, mixed, k=5)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in mixed.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(search_segments(si, text, k=5, docs=corpus).collect())
        ]
        assert sorted(by_q.get(qid, [])) == want, f"q{qid}: {text}"


def test_batch_fields_matches_search_fields(spark, batch_setup):
    """Field-qualified batch over {content, lang} InvertedIndexes —
    rank/score identity with search_fields per query."""
    from fugu_spark import postings as P
    from fugu_spark.batch import batch_search_fields
    from fugu_spark.search import search_fields

    corpus, _ = batch_setup
    idx_c = P.build_index(corpus, id_col="doc_id", text_col="content")
    idx_l = P.build_index(corpus, id_col="doc_id", text_col="lang")
    indexes = {"content": idx_c, "lang": idx_l}
    queries = {
        0: "merge join",  # unqualified: scores in both fields
        1: "lang:python merge",  # qualified leaf
        2: "lang:(python OR rust) AND merge",  # field-scoped group
        3: 'content:"merge join" lang:go',  # qualified phrase
        4: "merge AND lang:zzabsent",  # dead qualified must
    }
    out = batch_search_fields(indexes, queries, k=6)
    by_q: dict[int, list] = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, text in queries.items():
        want = [
            (i + 1, r.doc_id, round(r.score, 9))
            for i, r in enumerate(
                search_fields(indexes, text, k=6, docs=corpus).collect()
            )
        ]
        assert sorted(by_q.get(qid, [])) == want, f"q{qid}: {text}"
