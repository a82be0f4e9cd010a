"""Source-code quality filters for training-data curation.

The published StarCoder / CodeParrot / BigCode preprocessing recipes
filter code files on line-shape and character-class statistics before
they reach a training mix: maximum/average line length, the fraction of
alphanumeric characters, and the fraction of alphabetic tokens (Li et
al., "StarCoder: may the source be with you!", §3.1 preprocessing;
CodeParrot's preprocessing script applies the same family of filters).
This module computes those statistics for a DataFrame with a code
``content`` column — the (repo, path, commit, lang, content) corpus
shape of BASELINE.json's input_hint — as PURE COLUMN EXPRESSIONS:
JVM-side, whole-stage-codegen'd, no Python in the row path, and each
metric is SQL-expressible so the DuckDB oracle can recompute it
exactly.

At 100 TB these are scan-speed predicates: one pass over the content
column, no shuffle, no UDF; applied before tokenization they prune the
corpus the index build and dedup stages then consume.

Default thresholds are the published ones (StarCoder §3.1 /
CodeParrot): drop files whose max line length exceeds 1000 characters
or whose average line length exceeds 100 (minified / generated files),
or whose alphanumeric-character fraction is at most 0.25 (binary blobs,
embedded data tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LINE_LEN = 1000
MAX_AVG_LINE_LEN = 100.0
MIN_ALNUM_FRAC = 0.25


def _lines(content: Column) -> Column:
    # split("x", "\n") keeps empty trailing fields in both Spark and
    # DuckDB's string_split, so the two sides count lines identically
    return F.split(content, "\n")


def code_quality_stats(
    df: DataFrame,
    content_col: str = "content",
    max_line_len: int = MAX_LINE_LEN,
    max_avg_line_len: float = MAX_AVG_LINE_LEN,
    min_alnum_frac: float = MIN_ALNUM_FRAC,
) -> DataFrame:
    """Per-file line-shape and character-class statistics + keep flag.

    Appended columns:
      n_lines        — number of newline-separated lines
      max_line_len   — length (chars) of the longest line
      avg_line_len   — mean line length, 6-dp rounded (chars; the
                       newline separators themselves are excluded)
      alnum_frac     — fraction of characters that are [0-9A-Za-z],
                       6-dp rounded; 0.0 for empty content
      alpha_token_frac — fraction of whitespace-separated tokens
                       containing at least one ASCII letter, 6-dp
                       rounded; 0.0 for tokenless content
      keep_code      — the StarCoder-style accept decision:
                       max_line_len <= 1000 AND avg_line_len <= 100
                       AND alnum_frac > 0.25
    """
    c = F.col(content_col)
    lines = _lines(c)
    n_lines = F.size(lines)
    # total non-newline chars = len(content) - (n_lines - 1)
    body_chars = F.length(c) - (n_lines - F.lit(1))
    max_line = F.array_max(F.transform(lines, F.length))
    avg_line = F.round(body_chars.cast("double") / n_lines, 6)
    alnum = F.length(F.regexp_replace(c, "[^0-9A-Za-z]", ""))
    alnum_frac = F.round(
        F.when(F.length(c) > 0, alnum.cast("double") / F.length(c)).otherwise(0.0), 6
    )
    toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    alpha_toks = F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    alpha_token_frac = F.round(
        F.when(
            F.size(toks) > 0, F.size(alpha_toks).cast("double") / F.size(toks)
        ).otherwise(0.0),
        6,
    )
    out = (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("max_line_len", max_line.cast("long"))
        .withColumn("avg_line_len", avg_line)
        .withColumn("alnum_frac", alnum_frac)
        .withColumn("alpha_token_frac", alpha_token_frac)
    )
    return out.withColumn(
        "keep_code",
        (F.col("max_line_len") <= max_line_len)
        & (F.col("avg_line_len") <= max_avg_line_len)
        & (F.col("alnum_frac") > min_alnum_frac),
    )


def filter_code(
    df: DataFrame,
    content_col: str = "content",
    max_line_len: int = MAX_LINE_LEN,
    max_avg_line_len: float = MAX_AVG_LINE_LEN,
    min_alnum_frac: float = MIN_ALNUM_FRAC,
) -> DataFrame:
    """Rows that pass the quality gate, original schema preserved."""
    stats = code_quality_stats(
        df, content_col, max_line_len, max_avg_line_len, min_alnum_frac
    )
    return stats.filter(F.col("keep_code")).select(*df.columns)
