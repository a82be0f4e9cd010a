"""Aggregations (fugu_spark/aggs.py): ES-shape bucket + metric aggs over
the 12-doc fixture corpus — hand-derived bucket answers, exact-vs-approx
mode agreement bounds, query-scoped (ES query+aggs) shapes, and plan
pins (single Exchange per bucket agg regardless of metric count)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.aggs import (
    Cardinality,
    Percentiles,
    Stats,
    cardinality_agg,
    date_histogram_agg,
    histogram_agg,
    percentiles_agg,
    range_agg,
    stats_agg,
    terms_agg,
    top_hits_agg,
)
from fugu_spark.postings import build_index
from fugu_spark.queryparse import parse_query
from fugu_spark.search import dict_expander, execute_plan
from fugu_spark.queryparse import expand_plan

from .test_search import DOCS

LANGS = ["py", "rs", "go"]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (i, t, LANGS[i % 3], len(t), f"2024-{(i % 4) + 1:02d}-15 00:00:00")
        for i, t in DOCS.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, content string, lang string, n_chars long, ts string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


@pytest.fixture(scope="module")
def index(spark, docs_df):
    return build_index(docs_df)


@pytest.fixture(scope="module")
def merge_matched(index):
    plan = expand_plan(parse_query("merge"), dict_expander({None: index}))
    return execute_plan(index, plan)


MERGE_DOCS = {0, 2, 4, 8, 9}


class TestTerms:
    def test_counts_and_order(self, docs_df):
        rows = terms_agg(docs_df, "lang", size=10).collect()
        # 12 docs, 3 langs round-robin -> 4 each; ties break key ASC
        assert [(r.key, r.doc_count) for r in rows] == [
            ("go", 4),
            ("py", 4),
            ("rs", 4),
        ]

    def test_size_truncates(self, docs_df):
        assert terms_agg(docs_df, "lang", size=2).count() == 2

    def test_metrics_fold_in(self, docs_df):
        rows = terms_agg(
            docs_df, "lang", metrics=[Stats("n_chars"), Cardinality("doc_id")]
        ).collect()
        by_key = {r.key: r for r in rows}
        py_lens = [len(DOCS[i]) for i in DOCS if i % 3 == 1]
        assert by_key["rs"].n_chars_min == min(py_lens)
        assert by_key["rs"].n_chars_max == max(py_lens)
        assert by_key["rs"].n_chars_sum == sum(py_lens)
        assert by_key["rs"].doc_id_cardinality == 4

    def test_single_exchange(self, docs_df):
        # metric sub-aggs must NOT add shuffles: exactly one Exchange
        # (plus the limit's single-partition collect) in the plan
        plan = terms_agg(
            docs_df, "lang", metrics=[Stats("n_chars")]
        )._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, plan

    def test_query_scoped(self, docs_df, merge_matched):
        rows = terms_agg(docs_df, "lang", matched=merge_matched).collect()
        want = {}
        for d in MERGE_DOCS:
            want[LANGS[d % 3]] = want.get(LANGS[d % 3], 0) + 1
        assert {r.key: r.doc_count for r in rows} == want


class TestHistogram:
    def test_buckets(self, docs_df):
        rows = histogram_agg(docs_df, "n_chars", interval=10).collect()
        want = {}
        for t in DOCS.values():
            b = (len(t) // 10) * 10
            want[b] = want.get(b, 0) + 1
        assert {int(r.key): r.doc_count for r in rows} == want
        # ordered by key ascending
        keys = [r.key for r in rows]
        assert keys == sorted(keys)

    def test_min_doc_count_zero_keeps_all(self, docs_df):
        n1 = histogram_agg(docs_df, "n_chars", 10, min_doc_count=0).count()
        n2 = histogram_agg(docs_df, "n_chars", 10, min_doc_count=1).count()
        assert n1 == n2  # no empty buckets materialized in either mode


class TestDateHistogram:
    def test_month_buckets(self, docs_df):
        rows = date_histogram_agg(docs_df, "ts", "month").collect()
        want = {}
        for i in DOCS:
            m = (i % 4) + 1
            want[f"2024-0{m}-01"] = want.get(f"2024-0{m}-01", 0) + 1
        assert {str(r.key): r.doc_count for r in rows} == want

    def test_bad_interval_rejected(self, docs_df):
        with pytest.raises(ValueError):
            date_histogram_agg(docs_df, "ts", "fortnight")


class TestRange:
    def test_half_open_buckets(self, docs_df):
        rows = range_agg(
            docs_df, "n_chars", [(None, 25), (25, 35), (35, None)]
        ).collect()
        want = {"*-25": 0, "25-35": 0, "35-*": 0}
        for t in DOCS.values():
            n = len(t)
            if n < 25:
                want["*-25"] += 1
            elif n < 35:
                want["25-35"] += 1
            else:
                want["35-*"] += 1
        got = {r.key: r.doc_count for r in rows}
        assert got == {k: v for k, v in want.items() if v > 0}

    def test_uncovered_values_dropped(self, docs_df):
        rows = range_agg(docs_df, "n_chars", [(0, 1)]).collect()
        assert rows == []

    def test_empty_ranges_rejected(self, docs_df):
        with pytest.raises(ValueError):
            range_agg(docs_df, "n_chars", [])


class TestGlobalMetrics:
    def test_stats(self, docs_df):
        r = stats_agg(docs_df, "n_chars").collect()[0]
        lens = [len(t) for t in DOCS.values()]
        assert (r.n_chars_count, r.n_chars_min, r.n_chars_max, r.n_chars_sum) == (
            len(lens),
            min(lens),
            max(lens),
            sum(lens),
        )
        assert r.n_chars_avg == round(sum(lens) / len(lens), 6)

    def test_stats_scoped(self, docs_df, merge_matched):
        r = stats_agg(docs_df, "n_chars", matched=merge_matched).collect()[0]
        assert r.n_chars_count == len(MERGE_DOCS)
        assert r.n_chars_sum == sum(len(DOCS[d]) for d in MERGE_DOCS)

    def test_percentiles_exact_interpolation(self, docs_df):
        rows = percentiles_agg(docs_df, "n_chars", (0.5,)).collect()
        lens = sorted(len(t) for t in DOCS.values())
        # linear interpolation at p=0.5 over 12 values: mean of 6th/7th
        want = (lens[5] + lens[6]) / 2
        assert rows[0].percent == 0.5
        assert rows[0].value == pytest.approx(want)

    def test_percentiles_approx_close(self, docs_df):
        exact = {
            r.percent: r.value
            for r in percentiles_agg(docs_df, "n_chars", (0.25, 0.5, 0.75)).collect()
        }
        approx = {
            r.percent: r.value
            for r in percentiles_agg(
                docs_df, "n_chars", (0.25, 0.5, 0.75), exact=False
            ).collect()
        }
        lens = sorted(len(t) for t in DOCS.values())
        for p, v in approx.items():
            # approx returns an actual data value within one rank of exact
            assert lens[0] <= v <= lens[-1]
            assert abs(v - exact[p]) <= (lens[-1] - lens[0]) / 2

    def test_cardinality_exact_and_hll(self, docs_df):
        exact = cardinality_agg(docs_df, "lang").collect()[0].lang_cardinality
        hll = cardinality_agg(docs_df, "lang", exact=False).collect()[0].lang_cardinality
        assert exact == 3
        assert abs(hll - 3) <= 1  # tiny-n HLL++ is exact in practice


class TestTopHits:
    def test_per_bucket_topk(self, docs_df, index, merge_matched):
        rows = top_hits_agg(merge_matched, docs_df, "lang", size=1).collect()
        # one best hit per lang bucket that has any merge match
        langs_with_match = {LANGS[d % 3] for d in MERGE_DOCS}
        assert {r.key for r in rows} == langs_with_match
        assert all(r.hit_rank == 1 for r in rows)
        # the winner of each bucket has the max score within its bucket
        scored = {r.doc_id: r.score for r in merge_matched.collect()}
        for r in rows:
            bucket = [d for d in MERGE_DOCS if LANGS[d % 3] == r.key]
            best = max(bucket, key=lambda d: (scored[d], -d))
            assert r.doc_id == best

    def test_window_group_limit_pushed(self, docs_df, merge_matched):
        plan = top_hits_agg(
            merge_matched, docs_df, "lang", size=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan


class TestComposite:
    def test_pages_cover_all_buckets(self, docs_df):
        from fugu_spark.aggs import composite_agg

        all_buckets = sorted(
            (r.lang, int(r.n_chars) // 10) for r in docs_df.collect()
        )
        want = sorted(set(all_buckets))
        d = docs_df.withColumn("bucket", (F.col("n_chars") / 10).cast("int"))
        after, got = None, []
        for _ in range(20):
            page = composite_agg(d, ["lang", "bucket"], size=3, after_key=after).collect()
            if not page:
                break
            got.extend((r.lang, r.bucket) for r in page)
            last = page[-1]
            after = (last.lang, last.bucket)
        assert got == want  # full enumeration, key order, no overlap

    def test_counts_match_groupby(self, docs_df):
        from fugu_spark.aggs import composite_agg

        rows = composite_agg(docs_df, ["lang"], size=100).collect()
        want = {r.lang: r.cnt for r in docs_df.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert {r.lang: r.doc_count for r in rows} == want

    def test_arity_checked(self, docs_df):
        from fugu_spark.aggs import composite_agg

        with pytest.raises(ValueError):
            composite_agg(docs_df, ["lang", "source"], after_key=("a",))
        with pytest.raises(ValueError):
            composite_agg(docs_df, [])


def test_adjacency_matrix(spark, docs_df):
    from fugu_spark.aggs import adjacency_matrix_agg

    out = adjacency_matrix_agg(
        docs_df,
        {
            "py": F.col("lang") == "py",
            "rs": F.col("lang") == "rs",
            "long": F.col("n_chars") >= 30,
        },
    ).collect()
    got = {r.key: r.doc_count for r in out}
    rows = docs_df.select("lang", "n_chars").collect()
    want = {
        "py": sum(1 for r in rows if r.lang == "py"),
        "rs": sum(1 for r in rows if r.lang == "rs"),
        "long": sum(1 for r in rows if r.n_chars >= 30),
        "long&py": sum(1 for r in rows if r.lang == "py" and r.n_chars >= 30),
        "long&rs": sum(1 for r in rows if r.lang == "rs" and r.n_chars >= 30),
        "py&rs": 0,  # disjoint — must be OMITTED
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got == want
    # keys ordered ascending
    assert [r.key for r in out] == sorted(got)
    # ONE grand aggregation: no hash-partitioned exchange in the plan
    plan = (
        adjacency_matrix_agg(docs_df, {"py": F.col("lang") == "py"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan


def test_rare_terms(spark):
    from fugu_spark.aggs import rare_terms_agg

    frame = spark.createDataFrame(
        [
            (0, "common"), (1, "common"), (2, "common"),
            (3, "twice"), (4, "twice"),
            (5, "once"), (6, "alone"),
            (5, "once"),  # duplicate (doc, term) row: doc_count is DISTINCT docs
        ],
        "doc_id long, term string",
    )
    r1 = rare_terms_agg(frame, "term", max_doc_count=1).collect()
    assert [(r.key, r.doc_count) for r in r1] == [("alone", 1), ("once", 1)]
    r2 = rare_terms_agg(frame, "term", max_doc_count=2).collect()
    assert [(r.key, r.doc_count) for r in r2] == [
        ("alone", 1), ("once", 1), ("twice", 2)]


class TestExtendedStatsAndPipeline:
    """extended_stats (sum_of_squares / population variance / stddev) and
    the derivative / cumulative_sum / moving_avg pipeline aggs — hand-
    derived on the fixture corpus."""

    def test_extended_stats(self, docs_df):
        from fugu_spark.aggs import extended_stats_agg

        vals = [float(len(t)) for t in DOCS.values()]
        n = len(vals)
        mean = sum(vals) / n
        row = extended_stats_agg(docs_df, "n_chars").collect()[0]
        assert row.n_chars_count == n
        assert row.n_chars_min == min(vals) and row.n_chars_max == max(vals)
        assert row.n_chars_sum == pytest.approx(sum(vals))
        assert row.n_chars_sum_of_squares == pytest.approx(
            round(sum(v * v for v in vals), 6)
        )
        var = sum((v - mean) ** 2 for v in vals) / n
        assert row.n_chars_variance == pytest.approx(var, abs=1e-5)
        assert row.n_chars_std_deviation == pytest.approx(var**0.5, abs=1e-5)

    def test_pipeline_kinds(self, docs_df):
        from fugu_spark.aggs import date_histogram_agg, pipeline_agg

        hist = date_histogram_agg(docs_df, "ts", "month")
        base = [(r.key, r.doc_count) for r in hist.collect()]
        der = {r.key: r.derivative for r in pipeline_agg(hist, "doc_count").collect()}
        cum = {r.key: r.cumulative_sum
               for r in pipeline_agg(hist, "doc_count", "cumulative_sum").collect()}
        mov = {r.key: r.moving_avg
               for r in pipeline_agg(hist, "doc_count", "moving_avg", window=2).collect()}
        run = 0
        for i, (k, c) in enumerate(base):
            run += c
            assert cum[k] == run
            if i == 0:
                assert der[k] is None
            else:
                assert der[k] == c - base[i - 1][1]
            lo = max(0, i - 1)
            w_vals = [c2 for _, c2 in base[lo : i + 1]]
            assert mov[k] == pytest.approx(round(sum(w_vals) / len(w_vals), 6))

    def test_pipeline_guards(self, docs_df):
        from fugu_spark.aggs import date_histogram_agg, pipeline_agg

        hist = date_histogram_agg(docs_df, "ts", "month")
        with pytest.raises(ValueError):
            pipeline_agg(hist, "doc_count", "percentile")
        with pytest.raises(ValueError):
            pipeline_agg(hist, "doc_count", "moving_avg", window=0)


class TestWeightedAvgAndMatrixStats:
    def test_weighted_avg(self, docs_df):
        from fugu_spark.aggs import weighted_avg_agg

        # weight = doc_id, value = n_chars
        w = docs_df.withColumn("wt", F.col("doc_id").cast("double"))
        vals = {i: float(len(t)) for i, t in DOCS.items()}
        want = sum(v * i for i, v in vals.items()) / sum(vals)  # Σvw/Σw, w=i
        want = sum(vals[i] * i for i in vals) / sum(i for i in vals)
        row = weighted_avg_agg(w, "n_chars", "wt").collect()[0]
        assert row.weighted_avg == pytest.approx(round(want, 6), abs=1e-6)

    def test_weighted_avg_null_values_drop_their_weights(self, docs_df):
        from fugu_spark.aggs import weighted_avg_agg

        holes = docs_df.withColumn(
            "v", F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))
        ).withColumn("wt", F.lit(1.0))
        vals = {i: float(len(t)) for i, t in DOCS.items() if i % 2 == 0}
        want = sum(vals.values()) / len(vals)
        row = weighted_avg_agg(holes, "v", "wt").collect()[0]
        assert row.weighted_avg == pytest.approx(round(want, 6), abs=1e-6)

    def test_matrix_stats(self, docs_df):
        from fugu_spark.aggs import matrix_stats_agg

        d = docs_df.withColumn("did", F.col("doc_id").cast("double"))
        xs = [float(i) for i in DOCS]
        ys = [float(len(t)) for t in DOCS.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
        vx = sum((x - mx) ** 2 for x in xs) / n
        vy = sum((y - my) ** 2 for y in ys) / n
        row = matrix_stats_agg(d, "did", "n_chars").collect()[0]
        assert row.doc_count == n
        assert row.covariance == pytest.approx(cov, abs=1e-5)
        assert row.correlation == pytest.approx(cov / (vx**0.5 * vy**0.5), abs=1e-6)


class TestDateHistogramEmptyBuckets:
    """min_doc_count=0: every calendar bucket between the observed
    extremes appears, gaps at doc_count 0 (ES shape)."""

    def test_gaps_filled(self, spark):
        from datetime import date

        from fugu_spark.aggs import date_histogram_agg

        rows = [(1, "2024-01-10"), (2, "2024-01-20"), (3, "2024-05-02")]
        df = spark.createDataFrame(rows, "doc_id long, d string").withColumn(
            "d", F.col("d").cast("date")
        )
        got = [(r.key, r.doc_count)
               for r in date_histogram_agg(df, "d", "month", min_doc_count=0).collect()]
        assert got == [
            (date(2024, 1, 1), 2), (date(2024, 2, 1), 0), (date(2024, 3, 1), 0),
            (date(2024, 4, 1), 0), (date(2024, 5, 1), 1),
        ]
        dense = [(r.key, r.doc_count)
                 for r in date_histogram_agg(df, "d", "month").collect()]
        assert dense == [(date(2024, 1, 1), 2), (date(2024, 5, 1), 1)]

    def test_guard(self, spark):
        from fugu_spark.aggs import date_histogram_agg

        df = spark.createDataFrame([(1, "2024-01-10")], "doc_id long, d string")
        with pytest.raises(ValueError):
            date_histogram_agg(df, "d", "month", min_doc_count=2)


def test_histogram_empty_buckets(spark):
    """Numeric histogram min_doc_count=0: gap buckets materialize at 0
    between the observed extremes."""
    from fugu_spark.aggs import histogram_agg

    df = spark.createDataFrame([(1, 5.0), (2, 7.0), (3, 42.0)], "doc_id long, v double")
    got = [(r.key, r.doc_count)
           for r in histogram_agg(df, "v", 10.0, min_doc_count=0).collect()]
    assert got == [(0.0, 2), (10.0, 0), (20.0, 0), (30.0, 0), (40.0, 1)]
    dense = [(r.key, r.doc_count) for r in histogram_agg(df, "v", 10.0).collect()]
    assert dense == [(0.0, 2), (40.0, 1)]


class TestAutoDateHistogram:
    """auto_date_histogram: finest ladder interval with <= target
    buckets; year is the floor."""

    def _df(self, spark, dates):
        return spark.createDataFrame(
            [(i, d) for i, d in enumerate(dates)], "doc_id long, d string"
        ).withColumn("d", F.col("d").cast("date"))

    def test_picks_finest_fitting(self, spark):
        from fugu_spark.aggs import auto_date_histogram_agg

        # 3 days in one week -> day fits a target of 10
        df = self._df(spark, ["2024-03-04", "2024-03-05", "2024-03-06"])
        out = auto_date_histogram_agg(df, "d", buckets=10)
        assert out.collect()[0].interval == "day"
        # 40 consecutive days -> day has 40 buckets > 10, week fits (6)
        df = self._df(spark, [f"2024-03-{(i % 31) + 1:02d}" for i in range(31)]
                      + [f"2024-04-{i:02d}" for i in range(1, 10)])
        assert auto_date_histogram_agg(df, "d", buckets=10).collect()[0].interval == "week"

    def test_year_is_floor(self, spark):
        from fugu_spark.aggs import auto_date_histogram_agg

        df = self._df(spark, [f"{y}-06-15" for y in range(2000, 2020)])
        out = auto_date_histogram_agg(df, "d", buckets=10)
        rows = out.collect()
        assert rows[0].interval == "year" and len(rows) == 20

    def test_bucket_values_match_plain_histogram(self, spark):
        from fugu_spark.aggs import auto_date_histogram_agg, date_histogram_agg

        df = self._df(spark, ["2024-01-01", "2024-01-20", "2024-02-02", "2024-05-09"])
        # 4 distinct days and 4 distinct weeks both exceed 3; the 3
        # distinct months fit -> month chosen
        auto = [(r.key, r.doc_count)
                for r in auto_date_histogram_agg(df, "d", buckets=3).collect()]
        plain = [(r.key, r.doc_count) for r in date_histogram_agg(df, "d", "month").collect()]
        assert auto == plain


class TestSpineGuard:
    """min_doc_count=0 spine cap (ADVICE r5): one outlier value must
    raise the max-bucket error instead of building a giant sequence."""

    def test_numeric_spine_outlier_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0), (2, 1e9)], "doc_id long, v double"
        )
        with pytest.raises(Exception, match="spine would produce"):
            histogram_agg(df, "v", interval=1.0, min_doc_count=0).collect()

    def test_numeric_spine_in_cap_ok(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0), (2, 500.0)], "doc_id long, v double"
        )
        rows = histogram_agg(df, "v", interval=1.0, min_doc_count=0).collect()
        assert len(rows) == 501

    def test_date_spine_outlier_raises(self, spark):
        import datetime

        df = spark.createDataFrame(
            [(1, datetime.datetime(1, 1, 1)), (2, datetime.datetime(9999, 1, 1))],
            "doc_id long, ts timestamp",
        )
        with pytest.raises(Exception, match="spine would span"):
            date_histogram_agg(df, "ts", "day", min_doc_count=0).collect()

    def test_date_spine_in_cap_ok(self, spark):
        import datetime

        df = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 5)), (2, datetime.datetime(2024, 3, 2))],
            "doc_id long, ts timestamp",
        )
        rows = date_histogram_agg(df, "ts", "month", min_doc_count=0).collect()
        assert [str(r.key) for r in rows] == ["2024-01-01", "2024-02-01", "2024-03-01"]
