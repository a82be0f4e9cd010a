"""Streaming analytics (fugu_spark/streaming_analytics.py): watermarked
windowed aggregation late-data semantics and cross-batch stateful dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fugu_spark.streaming_analytics import (
    run_complete_to_memory,
    run_update_to_memory,
    stream_dedup,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, kind string"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, ts string, kind string").withColumn(
        "ts", F.to_timestamp("ts")
    ).coalesce(1).write.mode("append").parquet(path)


class TestWindowedCounts:
    def test_single_batch_counts(self, spark, tmp_path):
        d = str(tmp_path / "ev1")
        _write_events(
            spark,
            d,
            [
                (1, "2024-01-01 00:10:00", "a"),
                (2, "2024-01-01 00:20:00", "a"),
                (3, "2024-01-01 01:10:00", "b"),
            ],
        )
        out = run_complete_to_memory(
            windowed_event_counts(spark, d, SCHEMA, window="1 hour", group_col="kind"),
            "w1",
            spark,
        )
        got = {(str(r.window.start), r.kind): r.n_events for r in out.collect()}
        assert got == {
            ("2024-01-01 00:00:00", "a"): 2,
            ("2024-01-01 01:00:00", "b"): 1,
        }

    def test_late_beyond_watermark_dropped(self, spark, tmp_path):
        """Two availableNow drains over ONE checkpoint fix the batch
        order: drain 1 advances the watermark to 05:00 (max 06:00 − 1h,
        persisted in the checkpoint); drain 2's 5-hours-late event is
        then below the watermark and must be dropped, while its on-time
        sibling still lands."""
        d = str(tmp_path / "ev2")
        cp = str(tmp_path / "cp2")
        emitted = []

        def drain():
            q = (
                windowed_event_counts(
                    spark, d, SCHEMA, window="1 hour", watermark="1 hour"
                )
                .writeStream.foreachBatch(lambda df, eid: emitted.extend(df.collect()))
                .outputMode("update")
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _write_events(spark, d, [(1, "2024-01-01 06:00:00", "a")])
        drain()
        _write_events(
            spark,
            d,
            [(2, "2024-01-01 06:30:00", "a"), (3, "2024-01-01 00:30:00", "a")],
        )
        drain()
        got = {}
        for r in emitted:
            k = str(r.window.start)
            got[k] = max(got.get(k, 0), r.n_events)
        assert got.get("2024-01-01 06:00:00") == 2
        assert "2024-01-01 00:00:00" not in got  # late row dropped

    def test_value_sum(self, spark, tmp_path):
        d = str(tmp_path / "ev3")
        spark.createDataFrame(
            [(1, "2024-01-01 00:10:00", 2.5), (2, "2024-01-01 00:40:00", 1.5)],
            "event_id long, ts string, value double",
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(d)
        out = run_complete_to_memory(
            windowed_event_counts(
                spark, d, "event_id long, ts timestamp, value double",
                window="1 hour", value_col="value",
            ),
            "w3",
            spark,
        )
        r = out.collect()[0]
        assert (r.n_events, r.value_sum) == (2, 4.0)


class TestStreamDedup:
    def test_cross_batch_dedup(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp")
        docs = "doc_id long, text string"
        # batch 1: ids 0-2; batch 2 repeats the same texts with ids 10-12
        # plus one genuinely new text
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")], docs
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(10, "alpha beta"), (11, "gamma delta"), (12, "epsilon zeta")], docs
        ).coalesce(1).write.mode("append").parquet(src)
        stream_dedup(
            spark, src, docs, out, cp, text_col="text", id_col="doc_id",
            max_files_per_trigger=1,
        )
        got = {r.doc_id for r in spark.read.parquet(out).collect()}
        # within batch 1: min id per text (0 beats 2); batch 2's repeats
        # dropped; the new text survives with its own id
        assert got == {0, 1, 12}

    def test_restart_replays_nothing(self, spark, tmp_path):
        """A second availableNow run over the SAME checkpoint emits no
        new rows — state survived the stop."""
        src = str(tmp_path / "src2")
        out = str(tmp_path / "out2")
        cp = str(tmp_path / "cp2")
        docs = "doc_id long, text string"
        spark.createDataFrame([(0, "one two")], docs).coalesce(1).write.parquet(src)
        stream_dedup(spark, src, docs, out, cp)
        n1 = spark.read.parquet(out).count()
        # new file with a duplicate of the already-seen text
        spark.createDataFrame([(5, "one two")], docs).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream_dedup(spark, src, docs, out, cp)
        assert spark.read.parquet(out).count() == n1  # duplicate suppressed
