"""StarCoder-style code-quality filters (analytics/code_quality.py):
line-shape stats, char-class fractions, and the published keep
thresholds — pure column expressions, edge cases pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics.code_quality import code_quality_stats, filter_code


@pytest.fixture(scope="module")
def stats(spark):
    rows = [
        # (id, content)
        (1, "def f(x):\n    return x + 1\n"),          # normal file -> keep
        (2, "x" * 1500),                                # minified single line -> drop
        (3, ("ab " * 45 + "\n") * 5),                   # avg line 112.5 > 100 -> drop
        (4, "\x01\x02\x03 ---- ==== ;;;; ####"),        # low alnum -> drop
        (5, ""),                                        # empty content
        (6, "a\nb\nc"),                                 # tiny, keeps
        (7, "1 2 3 4"),                                 # digits only: alpha_token_frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = code_quality_stats(df)
    return {r.doc_id: r for r in out.collect()}


def test_line_stats(stats):
    r = stats[1]
    # "def f(x):" / "    return x + 1" / "" (trailing newline keeps the
    # empty final field, matching DuckDB string_split)
    assert r.n_lines == 3
    assert r.max_line_len == len("    return x + 1")
    body = len("def f(x):") + len("    return x + 1")
    assert r.avg_line_len == pytest.approx(body / 3, abs=1e-6)


def test_minified_line_dropped(stats):
    assert stats[2].max_line_len == 1500
    assert stats[2].keep_code is False


def test_avg_line_len_dropped(stats):
    assert stats[3].avg_line_len > 100
    assert stats[3].keep_code is False


def test_low_alnum_dropped(stats):
    assert stats[4].alnum_frac < 0.25
    assert stats[4].keep_code is False


def test_empty_content(stats):
    r = stats[5]
    assert r.n_lines == 1 and r.max_line_len == 0
    assert r.alnum_frac == 0.0 and r.alpha_token_frac == 0.0
    assert r.keep_code is False  # alnum_frac 0 fails the > 0.25 gate


def test_small_file_keeps(stats):
    assert stats[6].keep_code is True
    assert stats[6].n_lines == 3


def test_alpha_token_frac(stats):
    assert stats[7].alpha_token_frac == 0.0
    assert stats[1].alpha_token_frac > 0.5


def test_filter_preserves_schema(spark):
    df = spark.createDataFrame(
        [(1, "ok line", "py"), (2, "y" * 2000, "js")],
        "doc_id long, content string, lang string",
    )
    kept = filter_code(df)
    assert kept.columns == df.columns
    assert [r.doc_id for r in kept.collect()] == [1]
