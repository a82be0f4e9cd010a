"""Date fields (X5): RFC3339 parse at ingest, null-on-garbage (the
reference's skip semantics), offset normalization, and date-range
filtered search through the engine facade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.dates import date_range_filter, parse_rfc3339, with_date_fields
from fugu_spark.engine import FuguSparkEngine


def test_parse_rfc3339_variants(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [
            ("2024-03-05T10:11:12Z",),
            ("2024-03-05T12:11:12+02:00",),  # same instant as above
            ("2024-03-05T10:11:12.500Z",),
            ("not a date",),
            (None,),
        ],
        "s string",
    ).select(F.unix_micros(parse_rfc3339(F.col("s"))).alias("us"))
    got = [r.us for r in df.collect()]
    assert got[0] == got[1]  # offsets normalize to the same UTC instant
    assert got[2] == got[0] + 500_000
    assert got[3] is None and got[4] is None  # garbage → NULL, doc survives


def test_with_date_fields_only_strings(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01T00:00:00Z", "x")], "doc_id long, date_created string, other string"
    )
    out = with_date_fields(df)
    assert dict(out.dtypes)["date_created"] == "timestamp"
    assert dict(out.dtypes)["other"] == "string"
    # idempotent on already-parsed frames
    assert dict(with_date_fields(out).dtypes)["date_created"] == "timestamp"


def test_engine_date_range_search(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "merge alpha", "2024-01-01T00:00:00Z"),
            (2, "merge beta", "2024-02-01T00:00:00Z"),
            (3, "merge gamma", "2024-03-01T05:00:00+05:00"),  # == 03-01T00:00Z
            (4, "merge delta", "broken-date"),
        ],
        "doc_id long, text string, date_created string",
    )
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"), facets_col=None)
    assert dict(eng.docs.dtypes)["date_created"] == "timestamp"

    def hits(**kw):
        return {r.doc_id for r in eng.search("merge", k=10, **kw).collect()}

    assert hits() == {1, 2, 3, 4}
    assert hits(date_ranges={"date_created": ("2024-01-15T00:00:00Z", None)}) == {2, 3}
    # half-open: end bound excluded
    assert hits(
        date_ranges={"date_created": ("2024-01-01T00:00:00Z", "2024-03-01T00:00:00Z")}
    ) == {1, 2}
    # unparseable date → NULL → never matches a range (reference semantics)
    assert 4 not in hits(date_ranges={"date_created": (None, "2030-01-01T00:00:00Z")})
    # but the doc itself is still indexed and searchable without the filter
    assert 4 in hits()


def test_date_range_filter_open_bounds(spark):
    df = spark.createDataFrame(
        [(1, "2024-06-01T00:00:00Z"), (2, None)], "id long, d string"
    ).select("id", parse_rfc3339(F.col("d")).alias("d"))
    only_start = df.filter(date_range_filter(F.col("d"), "2024-01-01T00:00:00Z", None))
    assert [r.id for r in only_start.collect()] == [1]
    only_end = df.filter(date_range_filter(F.col("d"), None, "2024-01-01T00:00:00Z"))
    assert only_end.count() == 0


def test_date_serving_local_parity(spark, tmp_path):
    """Driver-side date serving (date_index sidecar, no Spark job) must be
    rank/score-identical to the distributed docs-predicate path."""
    from fugu_spark.dates import date_range_filter
    from fugu_spark.segment_search import search_segments

    rows = [
        (i, f"merge doc {i} " + "join " * (i % 4), f"2024-01-{(i % 28) + 1:02d}T12:00:00Z")
        for i in range(24)
    ] + [(24, "merge unparseable", "not-a-date"), (25, "merge missing", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, date_created string")
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"), facets_col=None)
    dr = {"date_created": ("2024-01-05T00:00:00Z", "2024-01-15T00:00:00Z")}
    # local path directly (proves it serves, not merely falls back)
    pdf = eng._local_searcher().search("merge join", k=20, date_ranges=dr)
    local = [(int(r.doc_id), round(float(r.score), 9)) for r in pdf.itertuples(index=False)]
    # distributed path over the same predicate
    dist = [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(
            eng.si,
            "merge join",
            k=20,
            docs=eng.docs,
            doc_filter=date_range_filter(F.col("date_created"), *dr["date_created"]),
        ).collect()
    ]
    assert local == dist
    assert local  # the window is non-empty
    # distributed date-sidecar path (no docs table) agrees too
    sidecar = [
        (r.doc_id, round(r.score, 9))
        for r in search_segments(eng.si, "merge join", k=20, date_ranges=dr).collect()
    ]
    assert sidecar == dist
    got_ids = {d for d, _ in local}
    assert got_ids <= set(range(4, 15))  # day 5..14 → doc_id 4..13
    assert 24 not in got_ids and 25 not in got_ids
    # the engine facade agrees with both
    eng_ids = {r.doc_id for r in eng.search("merge join", k=20, date_ranges=dr).collect()}
    assert eng_ids == got_ids


def test_date_serving_after_ingest_and_fallback(spark, tmp_path):
    """Ingest appends date sidecar rows at the new generation (the
    rewritten doc's NEW date wins); an index without date fields raises
    in the local path so the engine can fall back."""
    docs = spark.createDataFrame(
        [(1, "merge one", "2024-01-01T00:00:00Z"), (2, "merge two", "2024-06-01T00:00:00Z")],
        "doc_id long, text string, date_created string",
    )
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"), facets_col=None)
    dr = {"date_created": ("2024-05-01T00:00:00Z", None)}
    assert {r.doc_id for r in eng.search("merge", date_ranges=dr).collect()} == {2}
    # move doc 1 into the range via upsert
    eng.ingest(
        spark.createDataFrame(
            [(1, "merge one rewritten", "2024-07-01T00:00:00Z")],
            "doc_id long, text string, date_created string",
        )
    )
    assert {r.doc_id for r in eng.search("merge", date_ranges=dr).collect()} == {1, 2}
    # no-date index: local path refuses loudly
    import pytest as _pytest

    nd = spark.createDataFrame([(5, "merge plain")], "doc_id long, text string")
    eng2 = FuguSparkEngine.build(nd, str(tmp_path / "idx2"), facets_col=None)
    with _pytest.raises(ValueError, match="date_index"):
        eng2._local_searcher().search("merge", date_ranges=dr)


# -------------------------------------- Tantivy range syntax in the query


def test_extract_date_ranges_unit():
    from fugu_spark.dates import extract_date_ranges

    q, r = extract_date_ranges(
        "merge date_created:[2024-01-01T00:00:00Z TO 2024-02-01T00:00:00Z] join",
        ("date_created",),
    )
    assert q.split() == ["merge", "join"]
    assert r["date_created"][0] == "2024-01-01T00:00:00Z"
    # inclusive end maps to half-open end + 1µs
    assert r["date_created"][1] == "2024-02-01T00:00:00.000001Z"
    # exclusive bounds
    _, r2 = extract_date_ranges(
        "date_created:{2024-01-01T00:00:00Z TO 2024-02-01T00:00:00Z}", ("date_created",)
    )
    assert r2["date_created"] == ("2024-01-01T00:00:00.000001Z", "2024-02-01T00:00:00Z")
    # open sides
    _, r3 = extract_date_ranges("date_created:[* TO 2024-02-01T00:00:00Z}", ("date_created",))
    assert r3["date_created"] == (None, "2024-02-01T00:00:00Z")
    # non-date field: clause left intact for the normal parse/escape path
    q4, r4 = extract_date_ranges("price:[1 TO 2] merge", ("date_created",))
    assert r4 == {} and "price:[1 TO 2]" in q4


def test_query_string_range_matches_param_api(spark, tmp_path):
    from fugu_spark.engine import FuguSparkEngine

    rows = [
        (i, "merge join text", f"2024-01-{d:02d}T12:00:00Z")
        for i, d in enumerate([2, 8, 14, 20], start=1)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, date_created string")
    eng = FuguSparkEngine.build(docs, str(tmp_path / "idx"), facets_col=None)
    via_param = {
        r.doc_id
        for r in eng.search(
            "merge",
            k=20,
            date_ranges={"date_created": ("2024-01-05T00:00:00Z", "2024-01-15T00:00:00Z")},
        ).collect()
    }
    via_query = {
        r.doc_id
        for r in eng.search(
            "merge date_created:[2024-01-05T00:00:00Z TO 2024-01-15T00:00:00Z}", k=20
        ).collect()
    }
    assert via_query == via_param == {2, 3}
    # inclusive end picks up the boundary doc
    incl = {
        r.doc_id
        for r in eng.search(
            "merge date_created:[2024-01-05T00:00:00Z TO 2024-01-14T12:00:00Z]", k=20
        ).collect()
    }
    assert incl == {2, 3}
    # open-ended
    tail = {
        r.doc_id
        for r in eng.search("merge date_created:[2024-01-15T00:00:00Z TO *]", k=20).collect()
    }
    assert tail == {4}
