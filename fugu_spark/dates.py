"""Date fields (SURVEY.md §2 X5): RFC3339 → indexed timestamps + range filters.

The reference declares three indexed+stored date fields
(date_created/date_updated/date_published,
/root/reference/src/db/schemas.rs:26-28) and parses them from RFC3339
strings at ingest, SILENTLY SKIPPING values that fail to parse — the doc
is still indexed, only the date field is absent
(/root/reference/src/db/document.rs:339-371, the `if let Ok(dt)` guard).

Spark mapping: ``cast(string as timestamp)`` accepts the RFC3339 grammar
(date-time with 'T', fractional seconds, 'Z' or ±hh:mm offsets) and
returns NULL on failure — exactly the reference's skip semantics, and a
plain column expression (codegen, pushdown-friendly: a date-range filter
on a parsed column reaches the parquet scan as a min/max predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_FIELDS = ("date_created", "date_updated", "date_published")


def parse_rfc3339(col: Column) -> Column:
    """RFC3339 string → TIMESTAMP (UTC instant; offsets normalized).
    Unparseable values become NULL (the reference skips them) —
    try_cast, because ANSI mode makes a plain cast throw."""
    return col.try_cast("timestamp")


def with_date_fields(
    docs: DataFrame, cols: tuple[str, ...] = DATE_FIELDS
) -> DataFrame:
    """Parse every present date column in place (ingest-side X5)."""
    for c in cols:
        if c in docs.columns and dict(docs.dtypes)[c] == "string":
            docs = docs.withColumn(c, parse_rfc3339(F.col(c)))
    return docs


def date_range_filter(
    col: Column, start: str | None = None, end: str | None = None
) -> Column:
    """[start, end) predicate over a date column; bounds are RFC3339
    strings (either side open when None). NULL dates never match — docs
    whose date failed to parse are excluded from range filters, matching
    Tantivy's missing-field semantics."""
    cond = col.isNotNull()
    if start is not None:
        cond = cond & (col >= parse_rfc3339(F.lit(start)))
    if end is not None:
        cond = cond & (col < parse_rfc3339(F.lit(end)))
    return cond
