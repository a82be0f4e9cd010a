"""Facet fixtures (FIXTURES.md §5): derivation, metadata flatten, filter
parsing/semantics, counts/tree with reference rollup, suggestions, R4 tweak."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.facets import (
    assemble_tree,
    combine_filters,
    derive_facets,
    facet_counts,
    facet_tree_counts,
    filter_boost_score,
    filter_values_at_path,
    metadata_facets_udf,
    namespace_facets,
    parse_filter,
    search_facets,
    suggestions_udf,
)


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        [
            (0, "es", "src0"),
            (1, "es", "src1"),
            (2, "de", "src0"),
            (3, "de", "src0"),
            (4, "zh", "src1"),
        ],
        "doc_id long, lang string, source string",
    )
    return df.withColumn(
        "facets", derive_facets(("lang", F.col("lang")), ("source", F.col("source")))
    )


def test_derive_facets(docs):
    row = docs.filter("doc_id = 0").first()
    assert row.facets == ["/lang/es", "/source/src0"]


def test_namespace_facets(spark):
    """Expected paths per /root/reference/src/object.rs:81-111."""
    df = spark.createDataFrame(
        [("ns1", "org1", "conv1", "chat"), ("ns2", None, "", None)],
        "ns string, org string, cid string, dt string",
    ).select(
        namespace_facets(F.col("ns"), F.col("org"), F.col("cid"), F.col("dt")).alias("f")
    )
    rows = [r.f for r in df.collect()]
    assert rows[0] == [
        "/namespace/ns1",
        "/namespace/ns1/organization/org1",
        "/namespace/ns1/conversation/conv1",
        "/namespace/ns1/data/chat",
    ]
    assert rows[1] == ["/namespace/ns2"]


def test_metadata_facets(spark):
    """Per /root/reference/src/db/utils.rs:11-56: objects recurse, arrays fan
    out, only non-empty string leaves emit."""
    df = spark.createDataFrame(
        [
            ('{"a": {"b": "x"}, "tags": ["t1", "t2"], "n": 5, "empty": "", "nil": null}',),
            (None,),
            ("not json",),
        ],
        "meta string",
    ).select(metadata_facets_udf(F.col("meta")).alias("f"))
    rows = [r.f for r in df.collect()]
    assert sorted(rows[0]) == ["/metadata/a/b/x", "/metadata/tags/t1", "/metadata/tags/t2"]
    assert rows[1] == []
    assert rows[2] == []


class TestFilterParse:
    def test_equals(self):
        f = parse_filter("/lang/es")
        assert (f.operator, f.path) == ("equals", "/lang/es")

    def test_prefix(self):
        f = parse_filter("/repo/org0/*")
        assert (f.operator, f.path) == ("prefix", "/repo/org0")

    def test_keyvalue(self):
        f = parse_filter("lang=es")
        assert (f.operator, f.path, f.value) == ("equals", "/lang/es", "es")

    def test_wildcard(self):
        f = parse_filter("*core*")
        assert (f.operator, f.value) == ("wildcard", "core")

    def test_normalize_leading_slash(self):
        assert parse_filter("lang/es").path == "/lang/es"


def test_filter_semantics(docs):
    pred = combine_filters(["/lang/es"], F.col("facets"))
    assert sorted(r.doc_id for r in docs.filter(pred).collect()) == [0, 1]
    pred = combine_filters(["/lang/es", "/lang/de"], F.col("facets"))  # OR'd
    assert sorted(r.doc_id for r in docs.filter(pred).collect()) == [0, 1, 2, 3]
    pred = combine_filters(["/source/*"], F.col("facets"))  # prefix
    assert docs.filter(pred).count() == 5
    pred = combine_filters(["*SRC1*"], F.col("facets"))  # wildcard, case-insensitive
    assert sorted(r.doc_id for r in docs.filter(pred).collect()) == [1, 4]


def test_facet_counts_immediate_children(docs):
    rows = {r.child: r["count"] for r in facet_counts(docs, "/lang").collect()}
    assert rows == {"/lang/es": 2, "/lang/de": 2, "/lang/zh": 1}


def test_facet_tree_rollup(docs):
    rows = {r.prefix: r["count"] for r in facet_tree_counts(docs).collect()}
    # parent = own + Σ children (reference rollup, src/db/facet.rs:174-189)
    assert rows["/lang"] == 5
    assert rows["/lang/es"] == 2
    assert rows["/source"] == 5
    assert rows["/source/src0"] == 3
    tree = assemble_tree(list(rows.items()))
    assert tree["children"]["lang"]["count"] == 5
    assert tree["children"]["lang"]["children"]["es"]["count"] == 2


def test_filter_values_at_path(docs):
    vals = [r.value for r in filter_values_at_path(docs, "/lang").collect()]
    assert vals == ["de", "es", "zh"]


def test_search_facets_contains(docs):
    rows = [r.facet for r in search_facets(docs, "/source", text="src0").collect()]
    assert rows == ["/source/src0"]


def test_suggestions(spark):
    df = spark.createDataFrame(
        [("Merge sort is stable. Hash joins are fast! Tiny.\nStreaming data works",)],
        "text string",
    ).select(suggestions_udf(F.col("text")).alias("s"))
    got = df.first().s
    # 'Tiny' phrase has len 4 → 3 < 4 < 50 → kept (rule: 3 < len < 50)
    assert got == ["Merge sort is", "Hash joins are", "Tiny", "Streaming data works"]


def test_filter_boost(docs):
    scored = docs.withColumn("score", F.lit(1.0)).withColumn(
        "tweaked",
        filter_boost_score(F.col("score"), F.col("facets"), ["/lang/es", "/source/src0"]),
    )
    by_id = {r.doc_id: r.tweaked for r in scored.collect()}
    assert by_id[0] == 1.0  # has both
    assert by_id[1] == 0.25  # missing /source/src0
    assert by_id[4] == 0.0625  # missing both


def test_facet_boost_variant(docs):
    """R5 (disabled-in-reference variant, behind option): 1.5^matching."""
    from fugu_spark.facets import facet_boost_score

    scored = docs.withColumn("score", F.lit(1.0)).withColumn(
        "boosted",
        facet_boost_score(F.col("score"), F.col("facets"), ["/lang/es", "/source/src0"]),
    )
    by_id = {r.doc_id: r.boosted for r in scored.collect()}
    assert by_id[0] == 2.25  # both match: 1.5^2
    assert by_id[1] == 1.5  # one match
    assert by_id[4] == 1.0  # none match


def test_normalize_metadata_round_trip(spark):
    """X6 both ways: struct/map metadata serializes with to_json at
    ingest; the stored string flattens back to facet paths (X7)."""
    from fugu_spark.facets import metadata_facets_udf, normalize_metadata

    df = spark.createDataFrame(
        [(1, {"team": "search", "env": "prod"}), (2, None)],
        "doc_id long, metadata map<string,string>",
    )
    out = normalize_metadata(df)
    assert dict(out.dtypes)["metadata"] == "string"
    rows = {
        r.doc_id: r.facets
        for r in out.select(
            "doc_id", metadata_facets_udf(F.col("metadata")).alias("facets")
        ).collect()
    }
    assert set(rows[1]) == {"/metadata/team/search", "/metadata/env/prod"}
    assert rows[2] == []
    # string metadata passes through untouched
    s = spark.createDataFrame([(3, '{"a":"b"}')], "doc_id long, metadata string")
    assert normalize_metadata(s).first().metadata == '{"a":"b"}'
    # no metadata column is a no-op
    assert normalize_metadata(s.drop("metadata")).columns == ["doc_id"]
