"""Trigram index: extraction soundness, build/query parity vs full
scans, shard reassembly, served-path parity, fallback behavior."""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fugu_spark import trigram as TG

DOCS = [
    (0, "def merge_join(left, right): return left"),
    (1, "MERGE JOIN uses sorted runs"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "value = hash(key) % n_buckets"),
    (4, "merge sort is stable; merge join is not a sort"),
    (5, "x" * 10),
    (6, "ab"),
    (7, "import numpy as np\nvalue2 = hash(obj)"),
    (8, "Colour or color, both spellings appear"),
    (9, "mergers and acquisitions"),
]


@pytest.fixture(scope="module")
def tri_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tri"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    # shard_docs=4 → multi-shard posting rows for common trigrams,
    # exercising the cross-shard concat on both query paths
    TG.build_trigram_index(docs, d, shard_docs=4)
    return d, docs


# ---------------------------------------------------------------- extraction


def test_substring_required_basic():
    g = TG.substring_required("hash(")
    assert [sorted(x) for x in g] == [["has"], ["ash"], ["sh("]]
    assert TG.substring_required("ab") == []


def test_case_variant_groups():
    (g,) = TG.substring_required("abc", ignore_case=True)
    assert g == frozenset(
        {"abc", "abC", "aBc", "aBC", "Abc", "AbC", "ABc", "ABC"}
    )


def test_regex_required_shapes():
    req = TG.regex_required("value.*hash")
    assert frozenset({"val"}) in req and frozenset({"ash"}) in req
    # alternation: only factors common to every branch survive
    assert TG.regex_required("(foo|foobar)") == [frozenset({"foo"})]
    assert TG.regex_required("merge (join|sort)") == TG.substring_required("merge ")
    # group inlining keeps the literal run contiguous
    assert frozenset({"cde"}) in TG.regex_required("(abc)def")
    # nothing provable → empty (full-scan fallback)
    assert TG.regex_required("[0-9]+") == []
    assert TG.regex_required("(*invalid") == []


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(
        [
            "merge (join|sort)",
            "foo(bar)?baz",
            "colou?r",
            "import\\s+numpy",
            "a{2,5}bcd",
            "(abc)+def",
            "value.*hash",
            "^def [a-z_]+\\(self\\)",
        ]
    ),
    st.data(),
)
def test_required_trigrams_sound(pattern, data):
    """Soundness: any string MATCHING the pattern contains ≥1 alternate
    of every required group — i.e. the prefilter can never drop a true
    match (the property that makes the index an optimization, not an
    approximation)."""
    s = data.draw(st.from_regex(pattern))
    for group in TG.regex_required(pattern):
        assert any(t in s for t in group), (pattern, s, group)


def test_arrow_kernel_matches_sql_reference(spark):
    """The vectorized extraction and the JVM expression produce the
    identical (doc_id, tri) multiset — including unicode, empty, and
    sub-3-char docs."""
    docs = spark.createDataFrame(
        DOCS + [(10, ""), (11, "héllo wörld"), (12, "日本語のテキスト"), (13, "ab\ncd")],
        "doc_id long, text string",
    )
    a = {(r.doc_id, r.tri_code) for r in TG.doc_trigram_rows(docs).collect()}
    b = {
        (r.doc_id, TG.pack_trigram(r.tri))
        for r in TG.doc_trigram_rows_sql(docs).collect()
    }
    assert a == b
    # pack/unpack round-trips any codepoint triple
    for t in ["abc", " \t\n", "日本語", "a€z"]:
        assert TG.unpack_trigram(TG.pack_trigram(t)) == t


# ------------------------------------------------------------- spark parity


def _scan_substring(docs, needle):
    n_occ = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(needle))))
        / F.lit(len(needle))
    ).cast("long")
    return {
        (r.doc_id, r.n_occ)
        for r in docs.select("doc_id", n_occ.alias("n_occ"))
        .filter(F.col("n_occ") > 0)
        .collect()
    }


@pytest.mark.parametrize("needle", ["merge join", "hash(", "sort", "xx", "zzz"])
def test_substring_parity(spark, tri_index, needle):
    d, docs = tri_index
    got = {
        (r.doc_id, r.n_occ)
        for r in TG.substring_search(spark, d, docs, needle).collect()
    }
    assert got == _scan_substring(docs, needle)


def test_substring_ignore_case(spark, tri_index):
    d, docs = tri_index
    got = {
        (r.doc_id, r.n_occ)
        for r in TG.substring_search(spark, d, docs, "Colour", ignore_case=True).collect()
    }
    assert got == {(8, 1)}
    # exact-case finds only the literal spelling
    got2 = {r.doc_id for r in TG.substring_search(spark, d, docs, "Colour").collect()}
    assert got2 == {8}
    got3 = {
        r.doc_id
        for r in TG.substring_search(spark, d, docs, "MERGE", ignore_case=True).collect()
    }
    assert got3 == {0, 1, 4, 9}


@pytest.mark.parametrize(
    "pattern",
    ["merge (join|sort)", "value.? = hash", "[0-9]+", "qu.ck", "nomatchxyz"],
)
def test_regex_parity_vs_scan(spark, tri_index, pattern):
    d, docs = tri_index
    scan = {
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    }
    got = {
        (r.doc_id, r.n_matches)
        for r in TG.regex_search(spark, d, docs, pattern).collect()
    }
    assert got == scan


def test_prefilter_actually_prunes(spark, tri_index):
    """The selective path reads the sidecar (the plan contains the
    trigram_index scan) and its candidate count is < corpus size."""
    d, docs = tri_index
    groups = TG.substring_required("merge join")
    cand = TG.candidate_docs(spark, d, groups)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "trigram_index" in plan
    ids = {r.doc_id for r in cand.collect()}
    # doc 4 holds the literal "merge join"; docs without all trigrams
    # (e.g. doc 0's "merge_join", doc 9's "mergers") were pruned
    assert 4 in ids and len(ids) < len(DOCS)


@pytest.mark.parametrize("pattern", ["merge (join|sort)", "hash\\(", "[0-9]+"])
def test_trigram_grep_parity(spark, tri_index, pattern):
    from fugu_spark.analytics.codesearch import grep

    d, docs = tri_index
    want = {tuple(r) for r in grep(docs, pattern).collect()}
    got = {tuple(r) for r in TG.trigram_grep(spark, d, docs, pattern).collect()}
    assert got == want
    # multi-line doc 7 keeps real line numbers through the prefilter
    if pattern == "hash\\(":
        assert (7, 2, "value2 = hash(obj)") in got


def test_trigram_grep_ignore_case(spark, tri_index):
    from fugu_spark.analytics.codesearch import grep

    d, docs = tri_index
    want = {tuple(r) for r in grep(docs, "MERGE", ignore_case=True).collect()}
    got = {
        tuple(r)
        for r in TG.trigram_grep(spark, d, docs, "MERGE", ignore_case=True).collect()
    }
    assert got == want
    assert {g[0] for g in got} == {0, 1, 4, 9}  # incl. uppercase doc 1


# ------------------------------------------------------------- served parity


def test_served_parity(spark, tri_index, tmp_path):
    d, docs = tri_index
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(docs_path)
    s = TG.TrigramSearcher(d, docs_path)

    for needle in ["merge join", "hash(", "zzz", "xx"]:
        pdf = s.substring(needle)
        got = set(zip(pdf["doc_id"], pdf["n_occ"]))
        assert got == _scan_substring(docs, needle), needle

    pdf = s.substring("MERGE", ignore_case=True)
    assert set(pdf["doc_id"]) == {0, 1, 4, 9}

    pdf = s.regex("merge (join|sort)")
    assert set(pdf["doc_id"]) == {
        r.doc_id
        for r in docs.filter(F.col("text").rlike("merge (join|sort)")).collect()
    }


def test_served_candidates_sorted_across_shards(spark, tri_index, tmp_path):
    """shard_docs=4 splits common trigrams across posting rows; the
    concatenated id stream must stay ascending (the intersection
    relies on it)."""
    d, docs = tri_index
    docs_path = str(tmp_path / "docs2.parquet")
    docs.write.mode("overwrite").parquet(docs_path)
    s = TG.TrigramSearcher(d, docs_path)
    post = s._postings({"erg", "rge", " th"})
    assert post, "expected at least one posting"
    for tri, arr in post.items():
        assert np.all(np.diff(arr) > 0), tri


def test_incremental_update_parity(spark, tmp_path):
    """Append-mode maintenance: after an upsert (replace + insert +
    delete), prefiltered results equal a full scan of the LIVE corpus —
    stale postings never surface, new text is findable."""
    base = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = str(tmp_path / "tri_inc")
    TG.build_trigram_index(base, d, shard_docs=4)
    # live corpus: doc 0 replaced (new needle), doc 2 deleted, doc 20 new
    live = base.filter(F.col("doc_id").isin([1, 3, 4, 5, 6, 7, 8, 9])).unionByName(
        spark.createDataFrame(
            [(0, "replacement text with zebra stripes"),
             (20, "fresh doc mentioning zebra crossings")],
            "doc_id long, text string",
        )
    )
    TG.update_trigram_index(
        live.filter(F.col("doc_id").isin([0, 20])), d, shard_docs=4
    )
    # new-text needle found through the prefilter
    got = {r.doc_id for r in TG.substring_search(spark, d, live, "zebra").collect()}
    assert got == {0, 20}
    # old-text needle of the replaced doc no longer matches; deleted doc gone
    got2 = {r.doc_id for r in TG.substring_search(spark, d, live, "merge").collect()}
    want2 = {r.doc_id for r in live.filter(F.col("text").contains("merge")).collect()}
    assert got2 == want2 and 0 not in got2 and 2 not in got2
    # served path over the appended sidecar (duplicate keys tolerated)
    docs_path = str(tmp_path / "live.parquet")
    live.write.mode("overwrite").parquet(docs_path)
    s = TG.TrigramSearcher(d, docs_path)
    assert set(s.substring("zebra")["doc_id"]) == {0, 20}
    assert set(s.substring("merge")["doc_id"]) == want2


def test_build_is_range_clustered(tri_index):
    """Every parquet file's [min(tri), max(tri)] ranges are disjoint —
    the property row-group pruning depends on."""
    import pyarrow.dataset as pads

    d, _ = tri_index
    import os

    ranges = []
    for f in pads.dataset(os.path.join(d, TG.TRIGRAM_DIR)).files:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(f).metadata
        col = [md.row_group(i).column(0) for i in range(md.num_row_groups)]
        stats = [c.statistics for c in col if c.statistics is not None]
        if stats:
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
