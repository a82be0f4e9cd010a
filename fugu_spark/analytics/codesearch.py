"""Distributed raw-text grep — the code-search companion to the index.

The inverted index answers term/phrase/regex queries over ANALYZED
tokens; a source-code corpus also needs exact line-level pattern search
over the RAW text (the grep/ripgrep shape: "find every line matching
this regex, with its line number"). The reference's corpus is source
code (BASELINE north_star: 10^12-file source-code corpus), where this
is the second most common query shape after ranked search.

Scale design: every function here is a NARROW transformation — split
the text column into lines, evaluate the regex JVM-side (Catalyst
`rlike` / higher-order `filter`, whole-stage codegen, no Python), emit
matches. Zero shuffles, zero UDFs; throughput is scan-bound and scales
linearly with executors. The regex is Java syntax (same family the
served/segment regex queries use for dictionary expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pat(pattern: str, ignore_case: bool) -> str:
    return ("(?i)" if ignore_case else "") + pattern


def grep(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ignore_case: bool = False,
) -> DataFrame:
    """Every matching line → DataFrame(doc_id, line_no, line).

    ``line_no`` is 1-based. The match is Java `rlike` semantics: the
    pattern matches anywhere in the line (anchor with ^/$ yourself).
    Plan: split → posexplode → rlike filter, all codegen'd; the filter
    sits directly on the generator output so non-matching lines die
    before any downstream operator.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        .filter(F.col("line").rlike(_pat(pattern, ignore_case)))
        .select("doc_id", (F.col("idx") + 1).alias("line_no"), "line")
    )


def grep_count(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ignore_case: bool = False,
) -> DataFrame:
    """Per-doc matching-line counts → DataFrame(doc_id, n_matches),
    docs with ≥1 match only. Pure projection (size of a higher-order
    filter over the line array) — not even a generator, so a count
    over 100 TB is exactly one scan."""
    p = _pat(pattern, ignore_case)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(
                F.filter(F.split(F.col(text_col), "\n"), lambda x: x.rlike(p))
            ).alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


def grep_context(
    docs: DataFrame,
    pattern: str,
    context: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    ignore_case: bool = False,
) -> DataFrame:
    """grep with ±``context`` surrounding lines (ripgrep -C) →
    DataFrame(doc_id, line_no, line, before: array<string>,
    after: array<string>).

    The context windows are sliced from the SAME per-doc line array the
    match was found in (slice bounds clamped to the document), so this
    stays a narrow zero-shuffle plan — no self-join on (doc, line_no),
    which at 10^12 docs would be a catastrophic shuffle for what is a
    per-row array lookup."""
    if context < 0:
        raise ValueError("context must be >= 0")
    p = _pat(pattern, ignore_case)
    lines = F.split(F.col(text_col), "\n")
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_lines"),
        F.posexplode(lines).alias("idx", "line"),
    ).filter(F.col("line").rlike(p))
    # slice() is 1-based; idx is 0-based
    start_before = F.greatest(F.lit(1), F.col("idx") + 1 - context)
    n_before = F.col("idx") + 1 - start_before
    n_after = F.least(F.size("_lines") - F.col("idx") - 1, F.lit(context))
    return exploded.select(
        "doc_id",
        (F.col("idx") + 1).alias("line_no"),
        "line",
        F.slice("_lines", start_before, n_before).alias("before"),
        F.when(F.col("idx") + 2 <= F.size("_lines"), F.slice("_lines", F.col("idx") + 2, n_after))
        .otherwise(F.array().cast("array<string>"))
        .alias("after"),
    )
