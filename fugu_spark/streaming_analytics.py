"""Streaming analytics over event/document streams (SURVEY §2.11 ext).

Two Structured Streaming operators beyond the foreachBatch ingest path
(streaming.py):

- ``windowed_event_counts``: readStream → withWatermark → windowed
  groupBy — the canonical late-data-tolerant streaming aggregation
  (ingest-rate dashboards, per-source doc counts). Watermark semantics
  pinned in tests: an event older than (max event time − delay) when its
  micro-batch arrives is DROPPED, on-time late events still merge into
  their window.
- ``stream_dedup``: cross-batch EXACT dedup with
  ``applyInPandasWithState`` — the stateful streaming twin of
  analytics/dedup's batch exact-dedup. State is keyed by content hash
  and survives restarts via the checkpoint, so a re-played or late
  duplicate is dropped no matter how many micro-batches separate the
  copies. Within a batch the lowest id wins (deterministic); across
  batches the earlier batch wins (first-seen, the streaming-ingest
  contract).

At scale: the windowed agg is a standard watermarked stateful agg —
state is (window × group)-sized, bounded by the watermark horizon, and
partial-aggregates map-side. stream_dedup's state is one boolean per
distinct content hash — the same cardinality a batch exact-dedup
shuffle key has; RocksDB state store handles the 10^12-doc case.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "windowed_event_counts",
    "run_complete_to_memory",
    "run_update_to_memory",
    "stream_dedup",
]


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "1 hour",
    group_col: str | None = None,
    value_col: str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming frame: count (and optionally sum ``value_col``) per
    event-time window [× ``group_col``], tolerating late data up to
    ``watermark``. Returns the unstarted streaming DataFrame — pick the
    sink/output mode at the call site (run_complete_to_memory for
    deterministic drains, append+parquet for production)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    s = reader.format(fmt).load(source_dir).withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window)]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias(f"{value_col}_sum"))
    return s.groupBy(*keys).agg(*aggs)


def run_complete_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession
) -> DataFrame:
    """Drain a streaming aggregate with availableNow into a memory sink
    in COMPLETE mode and return the final batch frame. Complete mode
    emits every window including still-open ones — a deterministic
    function of the input files — but it RETAINS ALL STATE, which means
    the watermark's late-data filter is inert (Spark semantics: the
    watermark only gates state eviction and late drops in update/append
    modes). Use it for finite drains where every row should count; use
    run_update_to_memory to observe watermark semantics."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_update_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession
) -> DataFrame:
    """Drain with availableNow in UPDATE mode — the mode where the
    watermark actually drops too-late rows and evicts closed windows'
    state. The memory sink accumulates one row per (window, group)
    UPDATE, so callers reading final values should take the last/max
    version per key (tests do)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_DEDUP_STATE = "seen boolean"


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """Exact dedup over a document stream: only the FIRST occurrence of
    each content hash (across all micro-batches, ever) reaches
    ``out_dir``. Blocks until the availableNow drain finishes.

    Output schema: (content_hash string, ``id_col`` long) — the
    surviving doc per distinct content."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    s = (
        reader.format(fmt)
        .load(source_dir)
        .select(
            F.md5(F.col(text_col)).alias("content_hash"),
            F.col(id_col).cast("long").alias("doc_id"),
        )
    )

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # a prior micro-batch already emitted this content
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})

    deduped = s.groupBy("content_hash").applyInPandasWithState(
        first_seen,
        outputStructType="content_hash string, doc_id long",
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
