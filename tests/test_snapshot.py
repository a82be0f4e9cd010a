"""Snapshot/restore: point-in-time copies, incrementality, GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fugu_spark import snapshot as SN
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import SegmentIndex, build_segments, upsert_segments

BASE = [
    (0, "merge join hash join"),
    (1, "quick brown fox"),
    (2, "merge sort algorithm"),
    (3, "hash table lookup"),
]
UPSERT = [(0, "vector search engine"), (4, "merge vector index")]


def _topk(si, q="merge"):
    return [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(si, q, k=10).collect()
    ]


def test_snapshot_restore_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(BASE, "doc_id long, content string")
    idx_dir = str(tmp_path / "idx")
    si = build_segments(docs, idx_dir, n_buckets=2)
    before = _topk(si)

    repo = str(tmp_path / "repo")
    m1 = SN.snapshot(idx_dir, repo, "s1")
    assert m1["copied"] == m1["n_files"] and m1["reused"] == 0

    # mutate the live index — the snapshot must NOT see this
    batch = spark.createDataFrame(UPSERT, "doc_id long, content string")
    si2 = upsert_segments(si, batch, id_col="doc_id", text_col="content")
    after = _topk(si2)
    assert after != before

    # second snapshot is incremental: old generation's files reused
    m2 = SN.snapshot(idx_dir, repo, "s2")
    assert m2["reused"] > 0 and m2["copied"] > 0
    assert m2["n_files"] == m2["copied"] + m2["reused"]

    r1 = str(tmp_path / "r1")
    SN.restore(repo, "s1", r1)
    assert _topk(SegmentIndex.load(spark, r1)) == before
    r2 = str(tmp_path / "r2")
    SN.restore(repo, "s2", r2)
    assert _topk(SegmentIndex.load(spark, r2)) == after

    names = [s["name"] for s in SN.list_snapshots(repo)]
    assert names == ["s1", "s2"]


def test_restore_guards_and_gc(spark, tmp_path):
    docs = spark.createDataFrame(BASE, "doc_id long, content string")
    idx_dir = str(tmp_path / "idx")
    build_segments(docs, idx_dir, n_buckets=2)
    repo = str(tmp_path / "repo")
    m = SN.snapshot(idx_dir, repo, "only")
    with pytest.raises(ValueError):
        SN.snapshot(idx_dir, repo, "only")  # duplicate name
    with pytest.raises(ValueError):
        SN.restore(repo, "nope", str(tmp_path / "x"))
    with pytest.raises(ValueError):
        SN.restore(repo, "only", idx_dir)  # live target refused
    assert SN.gc(repo) == 0  # everything referenced
    SN.delete_snapshot(repo, "only")
    assert SN.gc(repo) == m["n_files"]  # all blobs now unreferenced
    assert SN.list_snapshots(repo) == []
