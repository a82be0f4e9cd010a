"""Federated search: DFS-global stats must make a split corpus score
identically to one index over the union (the dfs_query_then_fetch
contract); local mode reproduces the query_then_fetch trade-off."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.federated import search_federated
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments

DOCS = [
    (0, "merge join hash join"),
    (1, "quick brown fox jumps"),
    (2, "merge sort algorithm details"),
    (3, "hash table lookup structure"),
    (4, "merge vector index build"),
    (5, "sort networks are stable"),
    (6, "join order optimization merge"),
    (7, "table scan with index hints"),
]


@pytest.fixture(scope="module")
def split_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fed")
    docs = spark.createDataFrame(DOCS, "doc_id long, content string")
    whole = build_segments(docs, str(base / "whole"), n_buckets=2)
    a = build_segments(
        docs.filter(F.col("doc_id") < 4), str(base / "a"), n_buckets=2
    )
    b = build_segments(
        docs.filter(F.col("doc_id") >= 4), str(base / "b"), n_buckets=2
    )
    return whole, a, b


@pytest.mark.parametrize(
    "q", ["merge", "merge join", "merge AND join", '"merge sort"', "merge -hash"]
)
def test_dfs_equals_union_index(spark, split_indexes, q):
    whole, a, b = split_indexes
    want = [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(whole, q, k=10).collect()
    ]
    got = [
        (r.doc_id, round(r.score, 9))
        for r in search_federated([a, b], q, k=10).collect()
    ]
    assert got == want, q


def test_local_mode_differs_but_is_deterministic(spark, split_indexes):
    whole, a, b = split_indexes
    # 'merge' df: whole=4, member a=2, member b=2 → local idf differs
    loc = [
        (r.doc_id, round(r.score, 9))
        for r in search_federated([a, b], "merge", k=10, dfs=False).collect()
    ]
    glob = [
        (r.doc_id, round(r.score, 9))
        for r in search_federated([a, b], "merge", k=10).collect()
    ]
    assert {d for d, _ in loc} == {d for d, _ in glob}  # same matched set
    assert dict(loc) != dict(glob)  # but local scores are member-relative
    assert loc == [
        (r.doc_id, round(r.score, 9))
        for r in search_federated([a, b], "merge", k=10, dfs=False).collect()
    ]


def test_k_truncation_is_rank_safe(spark, split_indexes):
    whole, a, b = split_indexes
    want = [
        r.doc_id for r in search_segments(whole, "merge join", k=3).collect()
    ]
    got = [
        r.doc_id for r in search_federated([a, b], "merge join", k=3).collect()
    ]
    assert got == want


def test_pit_member_refused(spark, split_indexes):
    _, a, b = split_indexes
    with pytest.raises(ValueError):
        search_federated([a.at_generation(0), b], "merge")


def test_routed_federation(spark, tmp_path):
    from fugu_spark.federated import RoutedFederation

    docs = spark.createDataFrame(
        [(d, t, ["py", "rs"][d % 2]) for d, t in DOCS],
        "doc_id long, content string, lang string",
    )
    members = {
        lang: build_segments(
            docs.filter(F.col("lang") == lang), str(tmp_path / lang), n_buckets=2
        )
        for lang in ("py", "rs")
    }
    fed = RoutedFederation(members)
    # routed result == an index built over exactly that partition
    only_py = build_segments(
        docs.filter(F.col("lang") == "py"), str(tmp_path / "only_py"), n_buckets=2
    )
    want = [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(only_py, "merge join", k=10).collect()
    ]
    got = [
        (r.doc_id, round(r.score, 9))
        for r in fed.search("merge join", route=["py"]).collect()
    ]
    assert got == want
    # unrouted == full federation == union index over everything
    whole = build_segments(docs, str(tmp_path / "whole2"), n_buckets=2)
    want_all = [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(whole, "merge join", k=10).collect()
    ]
    got_all = [
        (r.doc_id, round(r.score, 9))
        for r in fed.search("merge join").collect()
    ]
    assert got_all == want_all
    with pytest.raises(ValueError):
        fed.search("merge", route=["go"])
