"""Structured-Streaming incremental ingest: file-source micro-batches →
foreachBatch upsert into segment generations; checkpoint resume drains
only NEW files on the second run."""

from __future__ import annotations

import os

from fugu_spark.segment_search import search_segments
from fugu_spark.segments import SegmentIndex, build_segments
from fugu_spark.streaming import start_stream_ingest

SCHEMA = "doc_id long, content string"


def test_stream_ingest_two_arrivals(spark, tmp_path):
    base = spark.createDataFrame(
        [(0, "merge join base"), (1, "hash probe base")], SCHEMA
    )
    idx_dir = str(tmp_path / "idx")
    build_segments(base, idx_dir, n_buckets=2)

    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")
    os.makedirs(drop)
    # arrival 1: one new doc + a rewrite of doc 0
    spark.createDataFrame(
        [(0, "vector rewrite of zero"), (2, "streamed merge doc")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(drop)
    q = start_stream_ingest(
        spark, drop, SCHEMA, idx_dir, cp, id_col="doc_id", text_col="content"
    )
    q.awaitTermination(120)
    si = SegmentIndex.load(spark, idx_dir)
    assert si.max_gen() >= 1
    got = {r.doc_id for r in search_segments(si, "merge", k=10).collect()}
    assert got == {2}  # doc 0's old content is masked, doc 2 arrived
    assert {r.doc_id for r in search_segments(si, "vector", k=10).collect()} == {0}

    # arrival 2: resume from checkpoint — only the new file is processed
    spark.createDataFrame([(3, "late merge arrival")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    gen_before = si.max_gen()
    q2 = start_stream_ingest(
        spark, drop, SCHEMA, idx_dir, cp, id_col="doc_id", text_col="content"
    )
    q2.awaitTermination(120)
    si2 = SegmentIndex.load(spark, idx_dir)
    got = {r.doc_id for r in search_segments(si2, "merge", k=10).collect()}
    assert got == {2, 3}
    # checkpoint prevented re-ingesting arrival 1: at most one new generation
    assert si2.max_gen() == gen_before + 1


def test_stream_upsert_keeps_date_index(spark, tmp_path):
    """A stream re-upsert must append date_index rows at the new gen —
    otherwise the doc's older date rows are delete-masked and it vanishes
    from date-filtered queries while still matching unfiltered ones."""
    from fugu_spark.engine import FuguSparkEngine
    from fugu_spark.segment_search import date_index_docs

    dschema = "doc_id long, text string, date_created string"
    docs = spark.createDataFrame(
        [
            (0, "merge join base", "2024-01-10T00:00:00Z"),
            (1, "hash probe base", "2024-06-10T00:00:00Z"),
        ],
        dschema,
    )
    idx_dir = str(tmp_path / "idx")
    eng = FuguSparkEngine.build(docs, index_dir=idx_dir, facets_col=None)

    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")
    os.makedirs(drop)
    spark.createDataFrame(
        [(0, "merge join moved", "2024-06-15T00:00:00Z")], dschema
    ).coalesce(1).write.mode("append").parquet(drop)
    q = start_stream_ingest(
        spark, drop, dschema, idx_dir, cp, id_col="doc_id", text_col="text"
    )
    q.awaitTermination(120)

    si = SegmentIndex.load(spark, idx_dir)
    june = {
        r.doc_id
        for r in date_index_docs(
            si, {"date_created": ("2024-06-01T00:00:00Z", "2024-07-01T00:00:00Z")}
        ).collect()
    }
    assert june == {0, 1}  # doc 0 moved into June at the new generation
    jan = {
        r.doc_id
        for r in date_index_docs(
            si, {"date_created": ("2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z")}
        ).collect()
    }
    assert jan == set()  # the old January row is delete-masked

    # the serving path agrees (LocalSearcher over the same sidecar files)
    from fugu_spark.serve import LocalSearcher

    pdf = LocalSearcher(idx_dir).search(
        "merge",
        k=10,
        date_ranges={"date_created": ("2024-06-01T00:00:00Z", "2024-07-01T00:00:00Z")},
    )
    assert set(pdf["doc_id"]) == {0}
    assert eng is not None  # keep the built engine alive through the test
