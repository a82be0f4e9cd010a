"""Regression pins for the round-2 ADVICE findings: NOT-phrase over the
bare index, non-BMP prefix pushdown, streaming filter_index continuity,
pre-filter_index fallback, and loud (not silent) pyarrow fallbacks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fugu_spark.engine import FuguSparkEngine
from fugu_spark.segment_search import _term_meta, search_segments
from fugu_spark.segments import SegmentIndex, build_segments
from fugu_spark.serve import _prefix_upper_bound
from fugu_spark.streaming import start_stream_ingest

# doc 3's facet continues the '/emoji' prefix with a NON-BMP code point
# (U+10348): its UTF-8 bytes (F0 90 8D 88) sort ABOVE U+FFFF (EF BF BF),
# so the old [path, path+U+FFFF) pushdown range missed it.
DOCS = [
    (0, "merge join plan", ["/lang/py"]),
    (1, "hash probe merge join", ["/lang/rs"]),
    (2, "vector scan only", ["/lang/py"]),
    (3, "merge sort network", ["/emoji\U00010348x"]),
]
SCHEMA = "doc_id long, text string, facets array<string>"


def test_not_phrase_only_bare_index(spark, tmp_path):
    """`NOT "<phrase>"` with docs=None (the bare-index universe path) must
    decode positions — without them the phrase exclusion silently no-ops
    and every doc comes back."""
    docs = spark.createDataFrame([(i, t) for i, t, _ in DOCS], "doc_id long, text string")
    si = build_segments(docs, str(tmp_path / "idx"), text_col="text", n_buckets=2)
    got = {r.doc_id for r in search_segments(si, 'NOT "merge join"', k=10).collect()}
    assert got == {2, 3}  # 0 and 1 contain the phrase


def test_prefix_upper_bound():
    assert _prefix_upper_bound("/a") == "/b"
    assert _prefix_upper_bound("/emoji") == "/emojj"
    # last char not incrementable → earlier position increments
    assert _prefix_upper_bound("/a" + chr(0x10FFFF)) == "/b"
    assert _prefix_upper_bound(chr(0x10FFFF)) is None
    # surrogate gap is skipped
    assert _prefix_upper_bound("x퟿") == "x"


def test_prefix_filter_matches_non_bmp_continuation(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"))
    # driver-side serving path (pyarrow pushdown + exact re-check)
    ids = eng._local_searcher()._allowed_docs(["/emoji/*"])
    assert 3 in ids.tolist()
    got = {r.doc_id for r in eng.search("merge", k=10, filters=["/emoji/*"]).collect()}
    assert got == {3}
    # distributed path parity over the same filter_index
    dist = {
        r.doc_id
        for r in search_segments(
            eng.si, "merge", k=10, filter_paths=["/emoji/*"]
        ).collect()
    }
    assert dist == {3}


def test_term_meta_fallback_warns_not_silent(spark, tmp_path):
    """A broken pyarrow fast path must surface a RuntimeWarning while the
    Spark fallback still answers correctly."""
    docs = spark.createDataFrame([(i, t) for i, t, _ in DOCS], "doc_id long, text string")
    si = build_segments(docs, str(tmp_path / "idx"), text_col="text", n_buckets=2)

    class Boom:
        def to_table(self, **kw):
            raise OSError("simulated corrupt terms dir")

    si._terms_ds = Boom()
    with pytest.warns(RuntimeWarning, match="falling back to a Spark scan"):
        meta = _term_meta(si, ["merge"])
    assert meta["merge"]["df"] == 3


def test_stream_upsert_keeps_facet_serving(spark, tmp_path):
    """A stream re-upsert writes del_gen for the batch ids; without the
    sink appending filter_index rows at the new generation the doc would
    vanish from facet-filtered results while still matching unfiltered."""
    docs = spark.createDataFrame(DOCS, SCHEMA)
    idx = str(tmp_path / "idx")
    FuguSparkEngine.build(docs, idx)
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    spark.createDataFrame(
        [(0, "merge join plan rewritten", ["/lang/py"])], SCHEMA
    ).coalesce(1).write.mode("append").parquet(drop)
    q = start_stream_ingest(
        spark, drop, SCHEMA, idx, str(tmp_path / "cp"), id_col="doc_id", text_col="text"
    )
    q.awaitTermination(120)
    si = SegmentIndex.load(spark, idx)
    unfiltered = {r.doc_id for r in search_segments(si, "merge", k=10).collect()}
    filtered = {
        r.doc_id
        for r in search_segments(si, "merge", k=10, filter_paths=["/lang/py"]).collect()
    }
    assert 0 in unfiltered
    assert 0 in filtered  # the regression: present unfiltered, gone filtered


def test_filter_fallback_without_filter_index(spark, tmp_path):
    """An index built without a filter_index (pre-0.3.0 layout) still
    serves facet filters when the docs table is available; the loud error
    remains only for the docs-less case."""
    docs = spark.createDataFrame(DOCS, SCHEMA)
    si = build_segments(docs, str(tmp_path / "idx"), text_col="text", n_buckets=2)  # no filter_index
    got = {
        r.doc_id
        for r in search_segments(
            si, "merge", k=10, docs=docs, filter_paths=["/lang/py"]
        ).collect()
    }
    assert got == {0}
    with pytest.raises(ValueError, match="filter_index"):
        search_segments(si, "merge", k=10, filter_paths=["/lang/py"]).collect()
