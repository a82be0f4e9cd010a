"""Symbol extraction (ctags-lite), sidecar lookup, definition boost."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics import symbols as SY

PY = "import os\n\ndef parse_query(s):\n    return s\n\nclass QueryPlan:\n    async def run(self):\n        pass\n"
RS = "pub struct Index;\npub(crate) fn merge_segments(a: u32) {}\nenum Op { And, Or }\ntrait Scorer {}\nunsafe fn raw_ptr() {}\n"
GO = "func BuildIndex(x int) {}\nfunc (s *Seg) Merge() {}\ntype Posting struct{}\n"
JS = "export function renderHits(x) {}\nclass SearchBox {}\nlet f = 1;\n"
C = "static int tokenize_line(char *s) {\n  if (s) { return 0; }\n}\nint main(void) {\n"

DOCS = [(0, PY, "py"), (1, RS, "rs"), (2, GO, "go"), (3, JS, "js"), (4, C, "c")]


@pytest.fixture(scope="module")
def sym_setup(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    syms = SY.extract_symbols(docs, lang_col="lang")
    d = str(tmp_path_factory.mktemp("symidx"))
    SY.build_symbol_index(syms, d)
    return docs, syms, d


def test_extraction_per_language(sym_setup):
    _, syms, _ = sym_setup
    got = {(r.doc_id, r.line_no, r.kind, r.name) for r in syms.collect()}
    assert (0, 3, "def", "parse_query") in got
    assert (0, 6, "class", "QueryPlan") in got
    assert (0, 7, "def", "run") in got  # async def
    assert (1, 1, "struct", "Index") in got
    assert (1, 2, "fn", "merge_segments") in got  # pub(crate)
    assert (1, 3, "enum", "Op") in got
    assert (1, 4, "trait", "Scorer") in got
    assert (1, 5, "fn", "raw_ptr") in got  # unsafe fn
    assert (2, 1, "func", "BuildIndex") in got
    assert (2, 2, "func", "Merge") in got  # method receiver
    assert (2, 3, "type", "Posting") in got
    assert (3, 1, "function", "renderHits") in got
    assert (3, 2, "class", "SearchBox") in got
    assert (4, 1, "func", "tokenize_line") in got
    assert (4, 4, "func", "main") in got
    # control flow / references are NOT definitions
    names = {n for _, _, _, n in got}
    assert "if" not in names and "return" not in names and "f" not in names


def test_extraction_matches_python_re(sym_setup):
    """Cross-engine check: Catalyst regexp_extract agrees with Python
    `re` for every (lang, pattern) over every line."""
    _, syms, _ = sym_setup
    got = {(r.doc_id, r.line_no, r.kind, r.name) for r in syms.collect()}
    want = set()
    for doc_id, text, lang in DOCS:
        for i, line in enumerate(text.split("\n"), 1):
            for plang, kind, pat in SY.SYMBOL_PATTERNS:
                if plang != lang:
                    continue
                m = re.search(pat, line)
                if m:
                    want.add((doc_id, i, kind, m.group(1)))
    assert got == want


def test_symbol_search_spark(spark, sym_setup):
    _, _, d = sym_setup
    out = SY.symbol_search(spark, d, "merge_segments").collect()
    assert [(r.doc_id, r.line_no, r.kind) for r in out] == [(1, 2, "fn")]
    pre = SY.symbol_search(spark, d, "m", prefix=True).collect()
    assert {r.name for r in pre} == {"merge_segments", "main"}
    kinds = SY.symbol_search(spark, d, "M", kind="func", prefix=True).collect()
    assert {r.name for r in kinds} == {"Merge"}


def test_symbol_searcher_served(sym_setup):
    _, syms, d = sym_setup
    s = SY.SymbolSearcher(d)
    pdf = s.lookup("parse_query")
    assert list(zip(pdf["doc_id"], pdf["line_no"])) == [(0, 3)]
    pre = s.lookup("m", prefix=True)
    assert set(pre["name"]) == {"merge_segments", "main"}
    assert s.lookup("zzz_missing").empty
    assert s.lookup("Merge", kind="func").iloc[0]["doc_id"] == 2


def test_definition_boost(spark, sym_setup):
    _, syms, _ = sym_setup
    results = spark.createDataFrame(
        [(0, 2.0), (1, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    out = SY.definition_boost(results, syms, ["parse_query", "nothere"], factor=1.5)
    got = {r.doc_id: r.score for r in out.collect()}
    assert got == {0: 3.0, 1: 2.0, 3: 1.0}


def test_sidecar_pushdown(spark, sym_setup):
    _, _, d = sym_setup
    plan = (
        SY.symbol_search(spark, d, "main")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "EqualTo(name,main)" in plan
