"""Percolation (standing-query matching): parity with the forward
engine on the shared grammar, boolean semantics, and the streaming
wrapper. The pin: for every percolatable query string, the percolated
match set over a corpus EQUALS the forward engine's match set for the
same string (search.py executes the same parsed plan forward)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.percolate import (
    CompiledQueries,
    compile_queries,
    percolate,
    start_percolate_stream,
)
from fugu_spark.postings import build_index
from fugu_spark.search import search

from .test_search import DOCS

PERC_QUERIES = [
    "merge",
    "merge join",
    "merge AND join",
    "merge AND join AND sort",
    "merge OR quick",
    "merge NOT join",
    '"merge join"',
    '"sort merge"',
    "merge^2 join",
    "zzzznotfound",
    "merge AND zzzznotfound",
    "MERGE Join",
    "foo.bar",
    "rare_unique_term",
    "the",
    '"merge window"',
    '"merge opens"~1',
    '+merge -window quick',
    'merge AND "join window"',
    'NOT "merge join" sort',
    # nested groups (bitmask + tree-eval path)
    "(merge OR quick) AND sort",
    "(merge AND join) OR (hash AND table)",
    'sort AND (window NOT "merge join")',
    '("merge join" OR quick) NOT lazy',
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def index(docs_df):
    return build_index(docs_df, id_col="doc_id", text_col="text")


def _forward_match_set(index, q: str) -> set[int]:
    out = search(index, q, k=len(DOCS) + 5)
    return {r["doc_id"] for r in out.collect()}


def test_parity_with_forward_search(spark, docs_df, index):
    compiled = compile_queries(dict(enumerate(PERC_QUERIES)))
    got: dict[int, set[int]] = {qid: set() for qid in range(len(PERC_QUERIES))}
    for r in percolate(docs_df, compiled).collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, qstr in enumerate(PERC_QUERIES):
        assert got[qid] == _forward_match_set(index, qstr), qstr


def test_shuffle_join_variant_identical(spark, docs_df):
    compiled = compile_queries({7: "merge AND join", 9: '"merge join"'})
    a = sorted(map(tuple, percolate(docs_df, compiled).collect()))
    b = sorted(
        map(tuple, percolate(docs_df, compiled, broadcast_queries=False).collect())
    )
    assert a == b and a


def test_boolean_semantics_units(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "beta gamma"), (4, "delta")],
        "doc_id long, text string",
    )
    compiled = compile_queries(
        {
            10: "alpha AND beta",      # both required
            11: "alpha beta",          # either
            12: "alpha NOT gamma",     # exclusion
            13: "+alpha -beta",        # prefix operators
        }
    )
    got = {(r["doc_id"], r["query_id"]) for r in percolate(df, compiled).collect()}
    assert got == {
        (1, 10),
        (1, 11), (2, 11), (3, 11),
        (1, 12), (2, 12),
        (2, 13),
    }


def test_shared_phrase_sig_deduped():
    compiled = compile_queries(
        {0: '"a b" x', 1: '"a b" y', 2: '"a b"~2 z', 3: '("a b" OR c) AND d'}
    )
    # slop-0 sig shared between flat queries 0/1 AND nested query 3;
    # slop-2 is its own sig
    assert len(compiled.sigs) == 2
    assert len(compiled.trees) == 1 and compiled.trees[0][0] == 3
    assert isinstance(compiled, CompiledQueries)


@pytest.mark.parametrize(
    "bad",
    ["", "   ", "alph*", "alpha~1", "[a TO b]", "-alpha"],
)
def test_rejected_shapes(bad):
    with pytest.raises(ValueError):
        compile_queries({0: bad, 1: "keep one valid"})


def test_duplicate_qid_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        compile_queries([(1, "alpha"), (1, "beta")])


def test_percolate_stream(spark, tmp_path, docs_df):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half = len(DOCS) // 2
    docs_df.filter(F.col("doc_id") < half).write.parquet(src)
    docs_df.filter(F.col("doc_id") >= half).write.mode("append").parquet(src)
    compiled = compile_queries({0: "merge AND join", 1: '"merge join"', 2: "quick"})
    q = start_percolate_stream(
        spark, src, "doc_id long, text string", compiled, out, ckpt
    )
    q.awaitTermination(120)
    streamed = {(r["doc_id"], r["query_id"]) for r in spark.read.parquet(out).collect()}
    batch = {(r["doc_id"], r["query_id"]) for r in percolate(docs_df, compiled).collect()}
    assert streamed == batch and batch
