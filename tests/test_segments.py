"""Segment format + query-v2 fixtures: codec round-trips (128-block
boundaries, FIXTURES.md §4), build/decode parity, rank identity vs the
table-native engine, salting under a hot term, checkpoint/resume."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fugu_spark import codecs
from fugu_spark.postings import build_index
from fugu_spark.search import search
from fugu_spark.segment_search import decode_postings, heap_topk, search_segments, _term_meta
from fugu_spark.segments import build_segments

from .test_search import DOCS


class TestCodecs:
    def test_varint_roundtrip(self):
        vals = np.array([0, 1, 127, 128, 300, 2**21, 2**42, 2**63, 2**64 - 1], dtype=np.uint64)
        assert list(codecs.varint_decode(codecs.varint_encode(vals), len(vals))) == list(vals)

    def test_delta_roundtrip_negative_ids(self):
        # signed int64 doc ids (xxhash64) reinterpreted as uint64: wrap-exact
        ids = np.array([-(2**62), -5, -3, 2, 2**62], dtype=np.int64)
        enc = codecs.delta_encode(ids.view(np.uint64))
        dec = codecs.delta_decode(enc).view(np.int64)
        assert list(dec) == list(ids)

    def test_block_roundtrip_with_positions(self):
        doc_ids = np.arange(0, 128, dtype=np.uint64) * 7
        tfs = (doc_ids % 5 + 1).astype(np.uint64)
        doc_lens = (doc_ids % 90 + 10).astype(np.uint64)
        pos_counts = tfs.copy()
        flat = np.concatenate([np.arange(t, dtype=np.uint64) * 3 + 1 for t in tfs])
        enc = codecs.encode_posting_block(doc_ids, tfs, doc_lens, flat, pos_counts)
        dec = codecs.decode_posting_block(enc)
        assert list(dec["doc_ids"]) == list(doc_ids)
        assert list(dec["tfs"]) == list(tfs)
        assert list(dec["doc_lens"]) == list(doc_lens)
        got_flat = np.concatenate(dec["positions"])
        assert list(got_flat) == list(flat)
        assert enc["max_doc_id"] == int(doc_ids[-1])
        assert enc["max_tf"] == int(tfs.max())
        assert enc["min_doc_len"] == int(doc_lens.min())

    def test_varint_roundtrip_property(self):
        """Property: varint/delta round-trip is identity for ANY uint64
        multiset and ANY sorted-by-view doc-id list (hypothesis)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
        def roundtrip(vals):
            arr = np.array(vals, dtype=np.uint64)
            assert list(codecs.varint_decode(codecs.varint_encode(arr), len(arr))) == vals

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=300,
                unique=True,
            )
        )
        def delta_roundtrip(ids):
            arr = np.sort(np.array(ids, dtype=np.int64))
            dec = codecs.delta_decode(codecs.delta_encode(arr.view(np.uint64))).view(np.int64)
            assert list(dec) == list(arr)

        roundtrip()
        delta_roundtrip()

    def test_compression_shrinks(self):
        doc_ids = np.sort(np.arange(1000, dtype=np.uint64) * 3)
        enc = codecs.varint_encode(codecs.delta_encode(doc_ids))
        assert len(enc) < 1000 * 3  # gaps of 3 → 1 byte each vs 8 raw


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, content string")


@pytest.fixture(scope="module")
def seg_index(spark, docs_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("segidx"))
    return build_segments(docs_df, d, id_col="doc_id", text_col="content", n_buckets=4)


def test_segment_block_boundaries(spark, tmp_path_factory):
    """One term across 300 docs → 3 blocks (128/128/44), FIXTURES.md §4."""
    docs = spark.createDataFrame(
        [(i, "blockterm filler%d" % i) for i in range(300)], "doc_id long, content string"
    )
    d = str(tmp_path_factory.mktemp("blk"))
    si = build_segments(docs, d, n_buckets=2)
    blocks = (
        si.segments_df(terms=["blockterm"]).orderBy("block_id").select("block_id", "n_docs").collect()
    )
    assert [(r.block_id, r.n_docs) for r in blocks] == [(0, 128), (1, 128), (2, 44)]


def test_decode_matches_table_native(spark, docs_df, seg_index):
    idx = build_index(docs_df)
    expected = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions), r.doc_len) for r in idx.postings.collect()
    )
    terms = sorted({t for t, *_ in expected})
    meta = _term_meta(seg_index, terms)
    got = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions), r.doc_len)
        for r in decode_postings(seg_index, terms, meta, with_positions=True).collect()
    )
    assert got == expected


QUERIES = [
    "merge",
    "merge join",
    "merge join sort quick",
    "merge AND join",
    "merge NOT join",
    '"merge join"',
    "merge^2 join",
    "the quick brown",  # includes hot term
    "zzznotfound merge",
]


@pytest.mark.parametrize("query", QUERIES)
def test_rank_parity_segments_vs_table(spark, docs_df, seg_index, query):
    idx = build_index(docs_df)
    expected = [(r.doc_id, r.score) for r in search(idx, query, k=10, docs=docs_df).collect()]
    wand = [
        (r.doc_id, r.score)
        for r in search_segments(
            seg_index, query, k=10, docs=docs_df, use_wand=True, wand_min_postings=0
        ).collect()
    ]
    exhaustive = [
        (r.doc_id, r.score)
        for r in search_segments(seg_index, query, k=10, docs=docs_df, use_wand=False).collect()
    ]
    assert [d for d, _ in wand] == [d for d, _ in expected], f"wand ranks: {query!r}"
    assert [d for d, _ in exhaustive] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(wand, expected):
        assert gs == pytest.approx(es, abs=1e-9)


def test_salting_preserves_results(spark, docs_df, tmp_path_factory):
    """hot_df_threshold=2 → every term with df>2 splits into salted
    sub-lists; merged results must be identical."""
    d = str(tmp_path_factory.mktemp("salted"))
    si = build_segments(docs_df, d, n_buckets=4, hot_df_threshold=2)
    n_salts = si.terms.filter(F.col("term") == "merge").first()["n_salts"]
    assert n_salts >= 2  # 'merge' df=5 → split
    idx = build_index(docs_df)
    for q in ["merge", "merge join", '"merge join"']:
        expected = [(r.doc_id, round(r.score, 9)) for r in search(idx, q, k=12).collect()]
        got = [
            (r.doc_id, round(r.score, 9))
            for r in search_segments(si, q, k=12, docs=docs_df).collect()
        ]
        assert got == expected, q


def test_salting_bounds_sublists_under_zipf(spark, tmp_path_factory):
    """Hot-term skew (SURVEY.md §7.4): with threshold H, every (term, salt)
    posting sub-list stays ≤ 2H on a Zipf corpus — no unbounded reducer."""
    from fugu_spark.corpus import generate_corpus

    H = 100
    docs = generate_corpus(spark, 600).withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    d = str(tmp_path_factory.mktemp("zipf"))
    si = build_segments(docs, d, id_col="doc_id", text_col="content", hot_df_threshold=H)
    sizes = (
        si.segments_df()
        .groupBy("term", "salt")
        .agg(F.sum("n_docs").alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
    )
    hot = si.terms.orderBy(F.desc("df")).first()
    assert hot["df"] > H  # the corpus really has a hot term
    assert hot["n_salts"] >= 2
    assert sizes["mx"] <= 2 * H


def test_resume_skips_completed_stages(spark, docs_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume"))
    si1 = build_segments(docs_df, d, n_buckets=4, build_id="build1")
    m1 = spark.read.parquet(f"{d}/manifest").count()
    si2 = build_segments(docs_df, d, n_buckets=4, build_id="build2", resume=True)
    m2 = spark.read.parquet(f"{d}/manifest").count()
    assert m1 == m2  # nothing re-ran → no new manifest rows
    assert si2.stats.n_docs == si1.stats.n_docs


def test_resume_rebuilds_missing_stage(spark, docs_df, tmp_path_factory):
    import shutil

    d = str(tmp_path_factory.mktemp("resume2"))
    build_segments(docs_df, d, n_buckets=4, build_id="b1")
    before = {r.term: r.df for r in spark.read.parquet(f"{d}/terms").collect()}
    shutil.rmtree(f"{d}/terms")
    si = build_segments(docs_df, d, n_buckets=4, build_id="b2", resume=True)
    after = {r.term: r.df for r in si.terms.collect()}
    assert after == before  # stage 3 rebuilt deterministically


def test_manifest_lineage_and_metrics(spark, seg_index):
    m = spark.read.parquet(f"{seg_index.index_dir}/manifest")
    per_bucket = m.filter(
        (F.col("stage") == "segments") & (F.col("partition_key") != "all")
    )
    assert per_bucket.count() > 0  # per-partition lineage rows exist
    assert per_bucket.filter(F.col("bytes_encoded") <= 0).count() == 0
    import json

    with open(f"{seg_index.index_dir}/stats.json") as f:
        stats = json.load(f)
    assert stats["n_postings"] > 0
    assert stats["postings_per_sec"] > 0
    assert stats["bytes_encoded"] > 0


def test_heap_topk_matches_orderby(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("double").alias("score")
    ).repartition(8)
    got = [(r.doc_id, r.score) for r in heap_topk(df, 10).collect()]
    exp = [
        (r.doc_id, r.score)
        for r in df.orderBy(F.desc("score"), F.asc("doc_id")).limit(10).collect()
    ]
    assert got == exp


def test_negative_doc_ids_roundtrip(spark, tmp_path_factory):
    """xxhash64-style ids (negative int64) survive the segment round-trip."""
    docs = spark.createDataFrame(
        [(-(2**62) - 5, "alpha beta"), (-7, "alpha gamma"), (9, "alpha beta beta")],
        "doc_id long, content string",
    )
    d = str(tmp_path_factory.mktemp("negids"))
    si = build_segments(docs, d, n_buckets=2)
    meta = _term_meta(si, ["alpha", "beta"])
    rows = sorted(
        (r.term, r.doc_id, r.tf) for r in decode_postings(si, ["alpha", "beta"], meta).collect()
    )
    assert rows == [
        ("alpha", -(2**62) - 5, 1),
        ("alpha", -7, 1),
        ("alpha", 9, 1),
        ("beta", -(2**62) - 5, 1),
        ("beta", 9, 2),
    ]


def test_fused_build_matches_staged(spark, tmp_path):
    """checkpoint_postings=False (fused tokenize→shuffle→encode, sampled
    hot sketch) must produce result-identical indexes; sketch_fraction=1
    makes the sketch exact so salting decisions match too."""
    import json

    from fugu_spark.corpus import generate_corpus
    from fugu_spark.segment_search import search_segments

    docs = (
        generate_corpus(spark, 120)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    a = build_segments(docs, str(tmp_path / "staged"), id_col="doc_id", text_col="content")
    b = build_segments(
        docs,
        str(tmp_path / "fused"),
        id_col="doc_id",
        text_col="content",
        checkpoint_postings=False,
        sketch_fraction=1.0,
    )
    sa = json.load(open(str(tmp_path / "staged" / "stats.json")))
    sb = json.load(open(str(tmp_path / "fused" / "stats.json")))
    for k in ("n_docs", "total_tokens", "n_postings", "bytes_encoded"):
        assert sa[k] == sb[k], k
    for q in ("merge join", '"merge join"', "merge NOT sort"):
        ra = [(r.doc_id, round(r.score, 9)) for r in search_segments(a, q, k=10, docs=docs).collect()]
        rb = [(r.doc_id, round(r.score, 9)) for r in search_segments(b, q, k=10, docs=docs).collect()]
        assert ra == rb, q
    # fused mode has no postings_raw checkpoint, but the segments marker
    # still makes re-builds resume-free
    import os
    import time

    assert not os.path.exists(str(tmp_path / "fused" / "postings_raw"))
    t0 = time.time()
    build_segments(
        docs, str(tmp_path / "fused"), id_col="doc_id", text_col="content",
        checkpoint_postings=False, resume=True,
    )
    assert time.time() - t0 < 5.0


def test_term_dictionary_sorted_for_pruning(spark, tmp_path):
    """The dictionary must be range-partitioned + sorted by term so the
    driver-side pyarrow lookup prunes by row-group min/max: files cover
    disjoint term ranges, and rows inside each file are sorted."""
    import glob

    import pyarrow.parquet as pq

    from fugu_spark.corpus import generate_corpus

    docs = (
        generate_corpus(spark, 100)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .cache()
    )
    build_segments(docs, str(tmp_path / "idx"), id_col="doc_id", text_col="content")
    files = sorted(glob.glob(str(tmp_path / "idx" / "terms" / "part-*.parquet")))
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        i = md.schema.to_arrow_schema().get_field_index("term")
        lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
        col = pq.read_table(f, columns=["term"]).column("term").to_pylist()
        assert col == sorted(col), f"{f} not sorted"
    ranges.sort()
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "term ranges overlap across files"


def test_dict_merge_reads_metadata_only(spark, seg_index):
    """Stage-3 dictionary merge must never read the encoded posting
    streams: bytes_enc is precomputed per block at encode time, so the
    parquet scan prunes every binary column (at scale, the alternative
    re-reads the whole index payload to sum lengths)."""
    import re

    from fugu_spark import segments as seg

    sdf = spark.read.schema(seg.SEG_READ_SCHEMA).parquet(f"{seg_index.index_dir}/segments")
    plan = seg._dict_agg(sdf)._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    for col in ("doc_ids_enc", "tfs_enc", "doc_lens_enc", "pos_counts_enc", "positions_enc"):
        assert col not in m.group(1), f"dictionary merge reads binary column {col}"
    # and the precomputed sum is identical to recomputing from the streams
    recomputed = sdf.agg(
        F.sum(
            F.length("doc_ids_enc")
            + F.length("tfs_enc")
            + F.length("doc_lens_enc")
            + F.length("pos_counts_enc")
            + F.length("positions_enc")
        )
    ).collect()[0][0]
    assert sdf.agg(F.sum("bytes_enc")).collect()[0][0] == recomputed
