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

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_FIELDS = ("date_created", "date_updated", "date_published")

# Tantivy range syntax 'field:[lo TO hi]' / 'field:{lo TO hi}' — the
# reference's QueryParser accepts it over its three INDEXED date fields
# (src/db/schemas.rs:26-28), so it is reachable through the raw query
# string the search route passes straight through.
_RANGE_RE = re.compile(
    r"(?P<field>[A-Za-z_][\w.]*):"
    r"(?P<lo_b>[\[\{])(?P<lo>[^\s\]\}]+)\s+TO\s+(?P<hi>[^\s\]\}]+)(?P<hi_b>[\]\}])"
)


def _bump_us(value: str, us: int) -> str:
    """value + us microseconds, as RFC3339 (maps Tantivy's inclusive /
    exclusive bounds onto the engine's half-open [start, end) at parquet
    timestamp precision). Unparseable values pass through unchanged —
    the downstream try_cast turns them into a match-nothing NULL, the
    reference's skip semantics."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return value
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    dt = (dt + timedelta(microseconds=us)).astimezone(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def extract_date_ranges(
    query: str | None, date_cols: tuple[str, ...] | list[str]
) -> tuple[str | None, dict[str, tuple[str | None, str | None]]]:
    """Pull 'field:[lo TO hi]' range clauses over DATE fields out of a
    query string before text parsing → (remaining_query, {col: (start,
    end)}) in the engine's half-open convention:

    - ``[lo`` inclusive start → start = lo; ``{lo`` exclusive → lo + 1 µs
    - ``hi]`` inclusive end → end = hi + 1 µs; ``hi}`` exclusive → hi
    - ``*`` on either side → that side open

    A clause naming a non-date field stays in the string (it parse-errors
    into the reference's escape-and-retry like any unknown field), and so
    does range-looking text INSIDE a quoted phrase — the reference parser
    only recognizes range syntax outside phrases (ADVICE r4). Two range
    clauses on the same field INTERSECT (both must match, the two-boolean-
    clause semantics of the reference parser); an intersection involving
    an unparseable bound keeps the unparseable side, whose downstream
    try_cast → NULL matches nothing.
    Pinned divergence: range clauses FILTER — they contribute no score —
    where Tantivy's RangeQuery scores matches at a constant; the facet
    filter path has the same pinned shape (F2-F6)."""
    if not query:
        return query, {}
    ranges: dict[str, tuple[str | None, str | None]] = {}

    def _parse(v: str | None):
        if v is None:
            return None
        try:
            dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            return None
        return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)

    def _tighter(old: str | None, new: str | None, side: str) -> str | None:
        # intersect two half-open bounds: later start / earlier end wins;
        # None = open; an unparseable bound wins (→ NULL, matches nothing)
        if old is None:
            return new
        if new is None:
            return old
        po, pn = _parse(old), _parse(new)
        if po is None:
            return old
        if pn is None:
            return new
        if side == "start":
            return old if po >= pn else new
        return old if po <= pn else new

    def repl(m: re.Match) -> str:
        # a match whose span lies inside a quoted region (odd count of
        # preceding unescaped quotes) is phrase text, not a range clause
        prefix = query[: m.start()]
        if (len(prefix.replace('\\"', "").split('"')) - 1) % 2 == 1:
            return m.group(0)
        if prefix.endswith(("+", "-")):
            # signed date range ('-date:[a TO b]'): the date-filter path
            # has no negated shape — leave the clause in the string so
            # it degrades through the parse-error → escape-strip
            # fallback instead of silently negating the NEXT clause
            return m.group(0)
        f = m.group("field")
        if f not in date_cols:
            return m.group(0)
        lo, hi = m.group("lo"), m.group("hi")
        start = None if lo == "*" else (lo if m.group("lo_b") == "[" else _bump_us(lo, 1))
        end = None if hi == "*" else (_bump_us(hi, 1) if m.group("hi_b") == "]" else hi)
        if f in ranges:
            old_s, old_e = ranges[f]
            start = _tighter(old_s, start, "start")
            end = _tighter(old_e, end, "end")
        ranges[f] = (start, end)
        return " "

    return _RANGE_RE.sub(repl, query), ranges


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
