"""Engine-integrated code search: build(code_search=True) sidecars,
upsert/delete coherence, delete-masked symbol lookups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.engine import FuguSparkEngine

DOCS = [
    (0, "def merge_join(a, b):\n    return a", "py"),
    (1, "def hash_lookup(t):\n    pass", "py"),
    (2, "class QueryPlan:\n    def run(self): pass", "py"),
    (3, "plain text about merge strategies", "py"),
]


@pytest.fixture()
def eng(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return FuguSparkEngine.build(
        docs,
        str(tmp_path / "idx"),
        code_search=True,
        code_lang_col="lang",
        facets_col=None,
    )


def test_build_and_query(eng):
    got = {(r.doc_id, r.n_occ) for r in eng.substring_search("merge").collect()}
    assert got == {(0, 1), (3, 1)}
    lines = {tuple(r) for r in eng.grep("def \\w+\\(").collect()}
    assert (0, 1, "def merge_join(a, b):") in lines
    assert (2, 2, "    def run(self): pass") in lines
    counts = {r.doc_id: r.n_matches for r in eng.regex_count("pass").collect()}
    assert counts == {1: 1, 2: 1}
    syms = eng.symbol_search("merge_join").collect()
    assert [(r.doc_id, r.line_no, r.kind) for r in syms] == [(0, 1, "def")]
    pre = eng.symbol_search("h", prefix=True).collect()
    assert {r.name for r in pre} == {"hash_lookup"}


def test_upsert_and_delete_coherence(spark, eng):
    # replace doc 0 (new definition), add doc 9
    batch = spark.createDataFrame(
        [(0, "def sorted_merge(x):\n    return x", "py"),
         (9, "def merge_join(q):\n    pass", "py")],
        "doc_id long, text string, lang string",
    )
    eng.ingest(batch)
    # substring search sees live text only
    got = {r.doc_id for r in eng.substring_search("sorted_merge").collect()}
    assert got == {0}
    # old definition of doc 0 is delete-masked; the new doc's is live
    syms = eng.symbol_search("merge_join").collect()
    assert [(r.doc_id, r.kind) for r in syms] == [(9, "def")]
    assert {r.name for r in eng.symbol_search("sorted_merge").collect()} == {
        "sorted_merge"
    }
    # delete doc 9 → its definition and text drop from every path
    eng.delete(spark.createDataFrame([(9,)], "doc_id long"))
    assert eng.symbol_search("merge_join").collect() == []
    assert {r.doc_id for r in eng.substring_search("merge").collect()} == {0, 3}


def test_missing_sidecar_raises(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    plain = FuguSparkEngine.build(docs, str(tmp_path / "plain"), facets_col=None)
    with pytest.raises(ValueError, match="code_search=True"):
        plain.substring_search("merge")
    with pytest.raises(ValueError, match="code_search=True"):
        plain.symbol_search("merge_join")
