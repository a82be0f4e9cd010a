from __future__ import annotations

import pytest

from fugu_spark.highlights import _make_snippet, with_snippets
from fugu_spark.postings import build_index
from fugu_spark.search import search


def test_make_snippet_marks_and_windows():
    text = "a" * 100 + " merge join " + "b" * 100
    s = _make_snippet(text, {"merge"}, window=10)
    assert "**merge**" in s and s.startswith("…") and s.endswith("…")
    assert _make_snippet("no hits here", {"zzz"}, 10) is None
    assert _make_snippet("Merge at start", {"merge"}, 10).startswith("**Merge**")


def test_with_snippets(spark):
    docs = spark.createDataFrame(
        [(1, "the merge join runs fast"), (2, "sorting only")], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text")
    res = search(idx, "merge join", k=5)
    out = with_snippets(res, docs, "merge join").collect()
    assert out[0].doc_id == 1
    assert "**merge** **join**" in out[0].snippet
