"""End-to-end rank identity on the 25-query reference set (FIXTURES.md §2)
over the deterministic synthetic corpus, against the pinned pure-Python
oracle — through BOTH engines (table-native and segment/WAND)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.facets import combine_filters, derive_facets, filter_predicate, parse_filter
from fugu_spark.postings import build_index
from fugu_spark.reference_queries import REFERENCE_QUERIES
from fugu_spark.search import search
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments

from .oracle import PyIndex

N_ROWS = 300


@pytest.fixture(scope="module")
def corpus(spark):
    from fugu_spark.corpus import generate_corpus

    df = (
        generate_corpus(spark, N_ROWS)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn(
            "facets",
            F.concat(
                derive_facets(("repo", F.col("repo")), ("lang", F.col("lang"))),
                F.array(F.concat(F.lit("/path/"), F.split("path", "/")[0])),
            ),
        )
        .cache()
    )
    return df


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.select("doc_id", "content", "facets").collect()
    idx = PyIndex({r.doc_id: r.content for r in rows})
    facets = {r.doc_id: list(r.facets) for r in rows}
    return idx, facets


@pytest.fixture(scope="module")
def engines(spark, corpus, tmp_path_factory):
    table = build_index(corpus, id_col="doc_id", text_col="content")
    seg = build_segments(
        corpus,
        str(tmp_path_factory.mktemp("refq") / "idx"),
        id_col="doc_id",
        text_col="content",
        hot_df_threshold=150,  # forces salting on the Zipf head
    )
    return table, seg


def _py_filter_match(facets: list[str], raw: str) -> bool:
    f = parse_filter(raw)
    if f.operator == "equals":
        return f.path in facets
    if f.operator == "prefix":
        return any(x.startswith(f.path) for x in facets)
    if f.operator == "wildcard":
        return any(f.value in x.lower() for x in facets)
    return any((f.value or f.path) in x for x in facets)


@pytest.mark.parametrize("rq", REFERENCE_QUERIES, ids=lambda r: f"q{r.query_id}")
def test_reference_query_rank_identity(spark, corpus, oracle, engines, rq):
    idx, facets = oracle
    table, seg = engines
    allowed = (
        {d for d, fl in facets.items() if any(_py_filter_match(fl, f) for f in rq.filters)}
        if rq.filters
        else None
    )
    full = idx.search(rq.query_text, k=len(facets))
    if allowed is not None:
        full = [(d, s) for d, s in full if d in allowed]
    expected = full[: rq.top_k]

    doc_filter = combine_filters(list(rq.filters), F.col("facets")) if rq.filters else None
    got_t = [
        (r.doc_id, r.score)
        for r in search(
            table, rq.query_text, k=rq.top_k, doc_filter=doc_filter, docs=corpus
        ).collect()
    ]
    got_s = [
        (r.doc_id, r.score)
        for r in search_segments(
            seg,
            rq.query_text,
            k=rq.top_k,
            doc_filter=doc_filter,
            docs=corpus,
            wand_min_postings=0,
        ).collect()
    ]
    assert [d for d, _ in got_t] == [d for d, _ in expected], f"table ranks q{rq.query_id}"
    assert [d for d, _ in got_s] == [d for d, _ in expected], f"segment ranks q{rq.query_id}"
    for (gd, gs), (ed, es) in zip(got_t, expected):
        assert gs == pytest.approx(es, abs=1e-9), f"table score q{rq.query_id} doc {gd}"
    for (gd, gs), (ed, es) in zip(got_s, expected):
        assert gs == pytest.approx(es, abs=1e-9), f"segment score q{rq.query_id} doc {gd}"
