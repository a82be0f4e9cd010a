"""Search aggregations: ES-shape bucket + metric aggs, query-scopable.

The reference serves facet counts, trees, and value listings
(src/db/facets.rs via routes.rs:29-84); its index library, Tantivy,
additionally ships an elasticsearch-compatible aggregations module
(bucket: terms / histogram / date_histogram / range; metric: stats /
percentiles / cardinality / top_hits) reachable by embedders. This
module re-expresses that aggregation surface Spark-first, over the same
docs frames the rest of the engine uses, optionally scoped to a query's
matched set (the ES `query` + `aggs` request shape).

Plan shapes (audited in PLANS.md):

- A bucket agg with ANY number of metric sub-aggs compiles to ONE
  ``groupBy`` — a single shuffle with map-side partial aggregation for
  every metric at once. Adding a metric never adds a shuffle.
- Query scoping is a semi/inner join of the matched set (doc_id, score)
  into the docs scan BEFORE the aggregate; AQE broadcast-sizes it when
  the matched set is small.
- ``top_hits`` is the one sub-agg that cannot fold into the groupBy: it
  is a rank window per bucket, and Spark's WindowGroupLimit pushes the
  per-group limit below the exchange (bounded map-side state even for a
  bucket holding most of the corpus).
- percentiles / cardinality have exact and approximate modes. Exact
  (`percentile`, `count_distinct`) is what the DuckDB oracles verify;
  approximate (`percentile_approx` t-digest, `approx_count_distinct`
  HLL) is the bounded-memory 100-TB path — both are single-pass
  sketches that fold into the same groupBy.

All bucket keys sort deterministically (count DESC, key ASC for terms;
key ASC for histogram/range) so results are stable under re-partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Cap on min_doc_count=0 spine size (ES search.max_buckets default):
# beyond it the empty-bucket sequence raises instead of OOMing the job.
MAX_SPINE_BUCKETS = 65536

__all__ = [
    "Stats",
    "Percentiles",
    "Cardinality",
    "terms_agg",
    "histogram_agg",
    "date_histogram_agg",
    "auto_date_histogram_agg",
    "range_agg",
    "stats_agg",
    "percentiles_agg",
    "cardinality_agg",
    "top_hits_agg",
    "composite_agg",
    "significant_terms_agg",
    "significant_text_agg",
    "filters_agg",
    "extended_stats_agg",
    "pipeline_agg",
    "weighted_avg_agg",
    "matrix_stats_agg",
    "scope_to_matches",
]


# --------------------------------------------------------------------------
# metric sub-aggs — each yields named aggregate Columns that fold into the
# enclosing bucket groupBy (or a global agg) without extra shuffles
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Stats:
    """ES `stats` metric: count / min / max / sum / avg of a field."""

    field: str

    def exprs(self) -> list[Column]:
        c = F.col(self.field)
        p = self.field
        return [
            F.count(c).alias(f"{p}_count"),
            F.min(c).alias(f"{p}_min"),
            F.max(c).alias(f"{p}_max"),
            F.sum(c).alias(f"{p}_sum"),
            F.round(F.avg(c), 6).alias(f"{p}_avg"),
        ]


@dataclass(frozen=True)
class Percentiles:
    """ES `percentiles` metric. ``exact=True`` uses `percentile` (linear
    interpolation on the sorted values — what the oracle can recompute);
    ``exact=False`` uses the `percentile_approx` sketch (bounded memory,
    the at-scale default in ES too)."""

    field: str
    percents: tuple = (0.25, 0.5, 0.75, 0.95)
    exact: bool = True
    accuracy: int = 10000

    def exprs(self) -> list[Column]:
        c = F.col(self.field)
        arr = F.array(*[F.lit(float(p)) for p in self.percents])
        if self.exact:
            agg = F.percentile(c, arr)
        else:
            agg = F.percentile_approx(c, arr, F.lit(self.accuracy))
        return [
            F.round(F.element_at(agg, i + 1), 6).alias(
                f"{self.field}_p{_pct_name(p)}"
            )
            for i, p in enumerate(self.percents)
        ]


@dataclass(frozen=True)
class Cardinality:
    """ES `cardinality` metric. Exact ``count_distinct`` for parity;
    ``exact=False`` is the HLL++ sketch (`approx_count_distinct`) — at
    scale the exact mode costs an Expand (one duplicated stream per
    distinct-field) while HLL folds into the partial aggregate."""

    field: str
    exact: bool = True
    rsd: float = 0.05

    def exprs(self) -> list[Column]:
        c = F.col(self.field)
        if self.exact:
            return [F.count_distinct(c).alias(f"{self.field}_cardinality")]
        return [F.approx_count_distinct(c, self.rsd).alias(f"{self.field}_cardinality")]


def _pct_name(p: float) -> str:
    # 0.25 -> "25", 0.995 -> "99_5" (column-name-safe)
    s = f"{p * 100:g}"
    return s.replace(".", "_")


def _metric_exprs(metrics: Sequence) -> list[Column]:
    out: list[Column] = []
    for m in metrics:
        out.extend(m.exprs())
    return out


# --------------------------------------------------------------------------
# query scoping
# --------------------------------------------------------------------------


def scope_to_matches(
    docs: DataFrame, matched: DataFrame | None, id_col: str = "doc_id"
) -> DataFrame:
    """Restrict ``docs`` to a query's matched set (the ES query+aggs
    shape). ``matched`` is any frame with a doc_id column — e.g.
    ``search.execute_plan``'s output. Semi-join keyed on the id: the
    aggregate below it still gets map-side partials, and AQE broadcasts
    the matched side when it is small."""
    if matched is None:
        return docs
    keys = matched.select(F.col("doc_id").cast("long").alias("__match_id")).distinct()
    return docs.join(
        keys, docs[id_col].cast("long") == keys["__match_id"], "left_semi"
    )


# --------------------------------------------------------------------------
# bucket aggs — one groupBy each; metrics fold in
# --------------------------------------------------------------------------


def terms_agg(
    docs: DataFrame,
    field: str,
    size: int = 10,
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `terms` bucket agg: top ``size`` values of ``field`` by
    doc_count (ties broken key ASC), with metric sub-aggs folded into
    the same groupBy. The final top-``size`` is a
    TakeOrderedAndProject — no second shuffle."""
    scoped = scope_to_matches(docs, matched, id_col)
    aggs = [F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)]
    return (
        scoped.groupBy(F.col(field).alias("key"))
        .agg(*aggs)
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def histogram_agg(
    docs: DataFrame,
    field: str,
    interval: float,
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    min_doc_count: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `histogram` bucket agg: fixed-interval numeric buckets keyed
    by their lower bound (floor(v / interval) * interval, ES bucketing).
    Buckets below ``min_doc_count`` are dropped; ``min_doc_count=0``
    materializes EVERY bucket between the observed extremes (ES shape),
    gaps at doc_count 0 — the spine is a sequence over bucket ordinals
    off the aggregate's own two-row extremes (bucket-count-sized, no
    driver loop), ordinal × interval reproducing the key expression
    bit-identically (floor yields a LONG, so both sides are the same
    long × double product)."""
    scoped = scope_to_matches(docs, matched, id_col)
    iv = float(interval)
    key = (F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)).alias("key")
    aggs = [F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)]
    out = scoped.groupBy(key).agg(*aggs)
    if min_doc_count > 0:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    else:
        # min_doc_count=0 spine guard (ADVICE r5): one outlier value with
        # a small interval makes sequence(lo, hi) astronomically large
        # (Spark caps arrays at ~2^31 and a big spine OOMs first) — fail
        # loudly at the ES search.max_buckets-style cap instead
        spine = (
            out.agg(
                F.round(F.min("key") / iv).cast("long").alias("lo"),
                F.round(F.max("key") / iv).cast("long").alias("hi"),
            )
            .select(
                F.explode(
                    F.expr(
                        f"CASE WHEN hi - lo >= {MAX_SPINE_BUCKETS} THEN "
                        "raise_error(concat('histogram min_doc_count=0 spine "
                        "would produce ', cast(hi - lo + 1 as string), "
                        f"' buckets (cap {MAX_SPINE_BUCKETS}) — raise the "
                        "interval or use min_doc_count=1')) "
                        "ELSE sequence(lo, hi) END"
                    )
                ).alias("n")
            )
            .select((F.col("n") * F.lit(iv)).alias("key"))
        )
        out = spine.join(out, "key", "left").withColumn(
            "doc_count", F.coalesce(F.col("doc_count"), F.lit(0))
        )
    return out.orderBy("key")


_CAL_INTERVALS = ("day", "week", "month", "quarter", "year")


def date_histogram_agg(
    docs: DataFrame,
    field: str,
    calendar_interval: str = "month",
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES `date_histogram` with a calendar interval: buckets are
    `date_trunc(interval, ts)` (the same function DuckDB exposes, so the
    oracle recomputes keys exactly). Key column is a DATE for stable
    cross-engine hashing.

    ``min_doc_count=0`` (ES): EVERY calendar bucket between the min and
    max observed keys appears, gaps with doc_count 0 and NULL metrics —
    the shape chart/downstream-pipeline consumers expect. The calendar
    spine is `sequence(min_key, max_key, 1 interval)` off the
    aggregate's own two-row extremes (bucket-count-sized, broadcast),
    never a driver loop."""
    if calendar_interval not in _CAL_INTERVALS:
        raise ValueError(
            f"calendar_interval must be one of {_CAL_INTERVALS}, got {calendar_interval!r}"
        )
    if min_doc_count not in (0, 1):
        raise ValueError(f"min_doc_count must be 0 or 1, got {min_doc_count}")
    scoped = scope_to_matches(docs, matched, id_col)
    key = F.date_trunc(calendar_interval, F.col(field)).cast("date").alias("key")
    aggs = [F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)]
    out = scoped.groupBy(key).agg(*aggs)
    if min_doc_count == 0:
        # 'week' truncates to ISO Monday — sequence stepping 7 days keeps
        # the alignment; the other intervals step by their own unit
        step = {"day": "interval 1 day", "week": "interval 7 day",
                "month": "interval 1 month", "quarter": "interval 3 month",
                "year": "interval 1 year"}[calendar_interval]
        # spine guard (ADVICE r5): bound the bucket count before building
        # the calendar sequence; the conservative day-span divisor (the
        # interval's LONGEST realization) never fires below the true cap
        ub_days = {"day": 1, "week": 7, "month": 31, "quarter": 92,
                   "year": 366}[calendar_interval]
        spine = (
            out.agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
            .select(
                F.explode(
                    F.expr(
                        f"CASE WHEN datediff(hi, lo) >= "
                        f"{MAX_SPINE_BUCKETS} * {ub_days} THEN "
                        "raise_error(concat('date_histogram min_doc_count=0 "
                        "spine would span ', cast(datediff(hi, lo) as string),"
                        f" ' days (bucket cap {MAX_SPINE_BUCKETS}) — raise "
                        "the interval or use min_doc_count=1')) "
                        f"ELSE sequence(lo, hi, {step}) END"
                    )
                ).alias("key")
            )
        )
        out = (
            spine.join(out, "key", "left")
            .withColumn("doc_count", F.coalesce(F.col("doc_count"), F.lit(0)))
        )
    return out.orderBy("key")


def auto_date_histogram_agg(
    docs: DataFrame,
    field: str,
    buckets: int = 10,
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES `auto_date_histogram`: pick the interval for the caller — the
    FINEST calendar interval from the day/week/month/quarter/year ladder
    whose distinct-bucket count is ≤ ``buckets`` (year is the floor
    regardless). Returns the date_histogram frame plus a constant
    `interval` column (ES reports the chosen interval in the response).

    The choice costs ONE tiny job: a single aggregate computing all five
    candidate distinct-bucket counts at once (5 count_distincts over
    date_truncs — one two-row-output pass, map-side partials), then the
    ordinary date_histogram at the winner."""
    scoped = scope_to_matches(docs, matched, id_col)
    counts = scoped.agg(
        *[
            F.count_distinct(F.date_trunc(iv, F.col(field))).alias(iv)
            for iv in _CAL_INTERVALS
        ]
    ).collect()[0]
    chosen = _CAL_INTERVALS[-1]
    for iv in _CAL_INTERVALS:
        if counts[iv] <= buckets:
            chosen = iv
            break
    out = date_histogram_agg(
        docs, field, chosen, metrics=metrics, matched=matched,
        id_col=id_col, min_doc_count=min_doc_count,
    )
    return out.withColumn("interval", F.lit(chosen))


def range_agg(
    docs: DataFrame,
    field: str,
    ranges: Sequence[tuple],
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `range` bucket agg: explicit half-open [from, to) buckets.
    ``ranges`` is a list of (lo, hi) with None for an open end; keys are
    the ES strings "lo-hi" / "*-hi" / "lo-*". A value landing in no
    range is dropped (ES semantics). One CASE projection + one groupBy."""
    if not ranges:
        raise ValueError("range_agg requires at least one range")
    c = F.col(field)
    expr = None
    for lo, hi in ranges:
        lo_s = "*" if lo is None else f"{lo:g}"
        hi_s = "*" if hi is None else f"{hi:g}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= F.lit(float(lo)))
        if hi is not None:
            cond = cond & (c < F.lit(float(hi)))
        label = F.lit(f"{lo_s}-{hi_s}")
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    key = expr.alias("key")  # a value in no range stays NULL → dropped below
    scoped = scope_to_matches(docs, matched, id_col)
    aggs = [F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)]
    return (
        scoped.select(key, "*")
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(*aggs)
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# global (bucketless) metric aggs
# --------------------------------------------------------------------------


def stats_agg(
    docs: DataFrame,
    field: str,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Global `stats` over (optionally) the matched set → one row."""
    return scope_to_matches(docs, matched, id_col).agg(*Stats(field).exprs())


def extended_stats_agg(
    docs: DataFrame,
    field: str,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `extended_stats`: the `stats` quintet plus sum_of_squares,
    POPULATION variance, and std_deviation (ES's defaults; its sampling
    variants are knobs over the same sums). One grand-total aggregate
    with map-side partials — identical shuffle shape to stats_agg."""
    c = F.col(field).cast("double")
    p = field
    return scope_to_matches(docs, matched, id_col).agg(
        F.count(c).alias(f"{p}_count"),
        F.min(c).alias(f"{p}_min"),
        F.max(c).alias(f"{p}_max"),
        F.sum(c).alias(f"{p}_sum"),
        F.round(F.avg(c), 6).alias(f"{p}_avg"),
        F.round(F.sum(c * c), 6).alias(f"{p}_sum_of_squares"),
        F.round(F.var_pop(c), 6).alias(f"{p}_variance"),
        F.round(F.stddev_pop(c), 6).alias(f"{p}_std_deviation"),
    )


def weighted_avg_agg(
    docs: DataFrame,
    value_field: str,
    weight_field: str,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `weighted_avg`: Σ(value × weight) / Σ(weight), NULL-valued rows
    excluded WITH their weights (ES skips missing values). Same
    single-aggregate shape as stats_agg."""
    v = F.col(value_field).cast("double")
    w = F.col(weight_field).cast("double")
    keep = F.when(v.isNotNull() & w.isNotNull(), True)
    return scope_to_matches(docs, matched, id_col).agg(
        F.round(
            F.sum(F.when(keep, v * w)) / F.sum(F.when(keep, w)), 6
        ).alias("weighted_avg")
    )


def matrix_stats_agg(
    docs: DataFrame,
    field_a: str,
    field_b: str,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `matrix_stats` for a field pair: per-field count/mean/variance
    plus POPULATION covariance and Pearson correlation — the numeric-
    column relationship report. One grand-total aggregate (all moments
    fold into the same partial-aggregated pass)."""
    a = F.col(field_a).cast("double")
    b = F.col(field_b).cast("double")
    return scope_to_matches(docs, matched, id_col).agg(
        F.count(a).alias("doc_count"),
        F.round(F.avg(a), 6).alias(f"{field_a}_mean"),
        F.round(F.avg(b), 6).alias(f"{field_b}_mean"),
        F.round(F.var_pop(a), 6).alias(f"{field_a}_variance"),
        F.round(F.var_pop(b), 6).alias(f"{field_b}_variance"),
        F.round(F.covar_pop(a, b), 6).alias("covariance"),
        F.round(F.corr(a, b), 6).alias("correlation"),
    )


def pipeline_agg(
    buckets: DataFrame,
    value_col: str,
    kind: str = "derivative",
    key_col: str = "key",
    window: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """ES pipeline aggregations over a parent bucket frame (the output
    of date_histogram_agg / histogram_agg): `derivative` (value − the
    previous bucket's value; NULL on the first bucket, which ES omits),
    `cumulative_sum`, and `moving_avg` (moving_fn avg over the trailing
    ``window`` buckets including the current one). One window function
    ordered by the bucket key over the (already aggregated,
    bucket-count-sized) frame — never the raw corpus."""
    if kind not in ("derivative", "cumulative_sum", "moving_avg"):
        raise ValueError(f"kind must be derivative/cumulative_sum/moving_avg, got {kind!r}")
    name = out_col or kind
    w = Window.orderBy(key_col)
    v = F.col(value_col)
    if kind == "derivative":
        expr = v - F.lag(value_col).over(w)
    elif kind == "cumulative_sum":
        expr = F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    else:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        expr = F.round(
            F.avg(value_col).over(w.rowsBetween(-(window - 1), 0)), 6
        )
    return buckets.withColumn(name, expr).orderBy(key_col)


def percentiles_agg(
    docs: DataFrame,
    field: str,
    percents: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Global `percentiles` → long form (percent, value) rows, ordered
    by percent (clean cross-engine hashing; ES returns the same map)."""
    scoped = scope_to_matches(docs, matched, id_col)
    spec = Percentiles(field, tuple(percents), exact=exact)
    wide = scoped.agg(*spec.exprs())
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("percent"),
                F.col(f"{field}_p{_pct_name(p)}").alias("value"),
            )
            for p in percents
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("kv"))
        .select("kv.percent", "kv.value")
        .orderBy("percent")
    )


def cardinality_agg(
    docs: DataFrame,
    field: str,
    exact: bool = True,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Global `cardinality` → one row (value)."""
    scoped = scope_to_matches(docs, matched, id_col)
    return scoped.agg(*Cardinality(field, exact=exact).exprs())


# --------------------------------------------------------------------------
# top_hits — the per-bucket hit sample (needs scores, so it takes the
# matched frame directly rather than scoping docs)
# --------------------------------------------------------------------------


def top_hits_agg(
    matched: DataFrame,
    docs: DataFrame,
    group_field: str,
    size: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `top_hits` under a terms bucket: the ``size`` best-scoring
    matched docs per value of ``docs.group_field`` →
    (key, doc_id, score, hit_rank). One window shuffle keyed by the
    bucket; WindowGroupLimit bounds map-side state to ``size`` rows per
    bucket per task (same plan shape as resultops.grouped_topk, pinned
    there)."""
    joined = matched.select(
        F.col("doc_id").cast("long").alias("doc_id"), "score"
    ).join(
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(group_field).alias("key"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= size)
        .select("key", "doc_id", F.round("score", 6).alias("score"), "hit_rank")
        .orderBy("key", "hit_rank")
    )


def composite_agg(
    docs: DataFrame,
    sources: Sequence[str],
    size: int = 10,
    after_key: Sequence | None = None,
    metrics: Sequence = (),
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `composite` bucket agg: enumerate ALL (field1, field2, ...)
    bucket combinations in key order, ``size`` at a time, resuming from
    ``after_key`` — the aggregation analog of search_after. This is how
    a client pages through an unbounded bucket space (e.g. every
    (lang, source) pair at 10^9 buckets) without the terms-agg top-N
    cap and without O(page-depth) cost.

    Plan shape: one groupBy (metrics fold in, as everywhere in this
    module), then the after_key is a lexicographic tuple filter ON THE
    BUCKET KEYS — at most ``size`` buckets survive per page via
    TakeOrderedAndProject. Because the filter is on the group-by keys,
    Catalyst pushes it below the final orderBy; pages cost the same at
    any depth.
    """
    if not sources:
        raise ValueError("composite_agg requires at least one source field")
    if after_key is not None and len(after_key) != len(sources):
        raise ValueError("after_key arity must match sources")
    scoped = scope_to_matches(docs, matched, id_col)
    aggs = [F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)]
    out = scoped.groupBy(*[F.col(s) for s in sources]).agg(*aggs)
    if after_key is not None:
        # lexicographic "strictly greater than after_key" over the sources
        cond = F.lit(False)
        eq_prefix = F.lit(True)
        for s, v in zip(sources, after_key):
            cond = cond | (eq_prefix & (F.col(s) > F.lit(v)))
            eq_prefix = eq_prefix & (F.col(s) == F.lit(v))
        out = out.filter(cond)
    return out.orderBy(*[F.asc(s) for s in sources]).limit(size)


def significant_terms_agg(
    docs: DataFrame,
    matched: DataFrame,
    field: str,
    size: int = 10,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `significant_terms` (JLH heuristic): which values of ``field``
    are OVER-represented in the query's matched set relative to the
    whole corpus? score = (fg% − bg%) × (fg% / bg%), where fg% is the
    value's share of matched docs and bg% its share of all docs —
    the "what is this result set about" aggregation.

    Plan shape: ONE groupBy over the corpus computing, per value, the
    background count AND the foreground count simultaneously (the
    foreground indicator is a left-semi-join flag projected before the
    aggregate) — no second scan, no second shuffle. Totals ride along
    as window-free grand aggregates via a cross join of two 1-row
    frames (broadcast)."""
    keys = matched.select(F.col("doc_id").cast("long").alias("__mid")).distinct()
    flagged = docs.join(
        keys, docs[id_col].cast("long") == keys["__mid"], "left"
    ).select(
        F.col(field).alias("key"),
        F.when(F.col("__mid").isNotNull(), 1).otherwise(0).alias("__fg"),
    )
    per_value = flagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("bg_count"), F.sum("__fg").alias("fg_count")
    )
    totals = flagged.agg(
        F.count(F.lit(1)).alias("__bg_total"), F.sum("__fg").alias("__fg_total")
    )
    fg_pct = F.col("fg_count") / F.col("__fg_total")
    bg_pct = F.col("bg_count") / F.col("__bg_total")
    return (
        per_value.crossJoin(F.broadcast(totals))
        .filter(F.col("fg_count") >= min_doc_count)
        .select(
            "key",
            F.col("fg_count").cast("long").alias("fg_count"),
            F.col("bg_count").cast("long").alias("bg_count"),
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(size)
    )


def filters_agg(
    docs: DataFrame,
    filters: dict,
    field: str | None = None,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `filters` bucket agg: one named bucket per predicate →
    (key, doc_count[, <field>_sum, <field>_avg]). Unlike terms/histogram
    this needs NO groupBy at all: every bucket is a conditional
    aggregate (count(when(cond))) folded into ONE grand aggregation —
    partial aggregation map-side, a single final row, then a tiny
    explode to long form. Zero shuffles beyond the scan's own.

    ``filters`` maps bucket name → boolean Column over ``docs``.
    Buckets may overlap (ES semantics: each doc counts in every bucket
    whose predicate it satisfies)."""
    if not filters:
        raise ValueError("filters_agg requires at least one named filter")
    scoped = scope_to_matches(docs, matched, id_col)
    aggs = []
    for name, cond in filters.items():
        aggs.append(F.count(F.when(cond, 1)).alias(f"__c_{name}"))
        if field is not None:
            aggs.append(F.sum(F.when(cond, F.col(field))).alias(f"__s_{name}"))
            aggs.append(F.round(F.avg(F.when(cond, F.col(field))), 6).alias(f"__a_{name}"))
    wide = scoped.agg(*aggs)
    entries = []
    for name in filters:
        fields = [
            F.lit(name).alias("key"),
            F.col(f"__c_{name}").cast("long").alias("doc_count"),
        ]
        if field is not None:
            fields.append(F.col(f"__s_{name}").cast("long").alias(f"{field}_sum"))
            fields.append(F.col(f"__a_{name}").alias(f"{field}_avg"))
        entries.append(F.struct(*fields))
    return (
        wide.select(F.explode(F.array(*entries)).alias("b"))
        .select("b.*")
        .orderBy("key")
    )


def significant_text_agg(
    index,
    matched: DataFrame,
    size: int = 10,
    min_doc_count: int = 2,
    max_bg_frac: float | None = None,
) -> DataFrame:
    """ES `significant_text` (JLH over TOKENS): which index terms are
    over-represented in the matched docs' text relative to the corpus —
    "what are these results about". Foreground df comes from a semi-join
    of the postings onto the matched set (one shuffle); background df is
    a dictionary lookup (already aggregated); totals are scalars.

    ``max_bg_frac`` drops terms whose corpus df exceeds that fraction of
    all docs (ES's stopword guard — at web scale the top of the JLH
    list without it is 'the'/'of' noise whenever the matched set skews
    long)."""
    from .postings import InvertedIndex

    if not isinstance(index, InvertedIndex):
        raise TypeError("significant_text_agg wants the table-native InvertedIndex")
    keys = matched.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()
    fg_total = keys.count()  # scalar: matched-set size (bounded driver value)
    if fg_total == 0:
        raise ValueError("empty matched set")
    bg_total = index.stats.n_docs
    fg = (
        index.postings.join(keys, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_count"))
        .filter(F.col("fg_count") >= min_doc_count)
    )
    joined = fg.join(index.terms.select("term", F.col("df").alias("bg_count")), "term")
    if max_bg_frac is not None:
        joined = joined.filter(F.col("bg_count") <= float(max_bg_frac) * bg_total)
    fg_pct = F.col("fg_count") / F.lit(float(fg_total))
    bg_pct = F.col("bg_count") / F.lit(float(bg_total))
    return (
        joined.select(
            F.col("term").alias("key"),
            F.col("fg_count").cast("long").alias("fg_count"),
            F.col("bg_count").cast("long").alias("bg_count"),
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(size)
    )


def adjacency_matrix_agg(
    docs: DataFrame,
    filters: dict,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `adjacency_matrix` bucket agg: one bucket per named filter and
    one per pairwise intersection (key "a&b", names in ascending order)
    → (key, doc_count), empty buckets omitted (ES contract). Like
    filters_agg this is ONE grand aggregation of conditional counts —
    n + n(n-1)/2 aggregate expressions, zero groupBy, zero extra
    shuffles; the quadratic term is in EXPRESSIONS (ES caps n at 100
    for the same reason), never in data movement."""
    if not filters:
        raise ValueError("adjacency_matrix_agg requires ≥1 named filter")
    names = sorted(filters)
    scoped = scope_to_matches(docs, matched, id_col)
    cells: list[tuple[str, Column]] = [(n, filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cells.append((f"{a}&{b}", filters[a] & filters[b]))
    wide = scoped.agg(
        *[F.count(F.when(cond, 1)).alias(f"__c_{i}") for i, (_, cond) in enumerate(cells)]
    )
    entries = [
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__c_{i}").cast("long").alias("doc_count"),
        )
        for i, (key, _) in enumerate(cells)
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("b"))
        .select("b.*")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def rare_terms_agg(
    frame: DataFrame,
    field: str,
    max_doc_count: int = 1,
    matched: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `rare_terms` bucket agg: values of ``field`` appearing in at
    most ``max_doc_count`` documents → (key, doc_count), ordered
    doc_count ASC then key ASC (the ES long-tail ordering — the agg is
    the inverse of terms_agg's most-common head). One shuffle
    (groupBy field, distinct-doc count with map-side partial agg);
    the post-aggregation doc_count filter is exact, not ES's
    probabilistic CuckooFilter approximation — a documented divergence
    (exactness is cheap here; the oracle verifies it)."""
    scoped = scope_to_matches(frame, matched, id_col)
    return (
        scoped.groupBy(F.col(field).alias("key"))
        .agg(F.count_distinct(F.col(id_col)).alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
        .orderBy("doc_count", "key")
    )
