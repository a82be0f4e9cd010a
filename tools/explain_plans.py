"""Capture .explain('formatted') for the engine's key plans → PLANS.md,
with the properties each plan must exhibit (pushdown, pruning, broadcast,
whole-stage codegen, TakeOrderedAndProject)."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from fugu_spark.facets import derive_facets, facet_tree_counts
from fugu_spark.postings import build_index, build_postings
from fugu_spark.search import search
from fugu_spark.segment_search import search_segments
from fugu_spark.segments import build_segments
from fugu_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark(app_name="plans", master="local[8]")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = build_index(docs, id_col="doc_id", text_col="text")
    si = build_segments(docs, "/tmp/fugu_plans_idx", id_col="doc_id", text_col="text")

    sections = []

    plan = grab(docs.select("doc_id", "lang").filter(F.col("lang") == "es"))
    sections.append(
        (
            "Parquet scan: filter + column pruning",
            "MUST: PushedFilters contains IsNotNull(lang), EqualTo(lang,es); "
            "ReadSchema only doc_id+lang.",
            plan,
        )
    )

    seg = si.segments_df(terms=["merge", "join"], buckets=[3, 17])
    sections.append(
        (
            "Segment scan: bucket partition pruning + term row-group pushdown",
            "MUST: PartitionFilters on term_bucket; PushedFilters In(term, ...).",
            grab(seg),
        )
    )

    sections.append(
        (
            "Table-native BM25 top-k (single term)",
            "MUST: TakeOrderedAndProject (per-partition heap + driver merge); "
            "WholeStageCodegen around the score arithmetic; no extra shuffle "
            "beyond the boolean-combine groupBy.",
            grab(search(idx, "merge join", k=10, docs=docs)),
        )
    )

    sections.append(
        (
            "Segment-path BM25 top-k",
            "MUST: scan pruned by term_bucket/term before the decode "
            "mapInPandas; single combine shuffle; TakeOrderedAndProject.",
            grab(search_segments(si, "merge join", k=10, docs=docs)),
        )
    )

    fdocs = docs.withColumn(
        "facets", derive_facets(("lang", F.col("lang")), ("source", F.col("source")))
    )
    sections.append(
        (
            "Facet tree (one-scan prefix rollup)",
            "MUST: single scan + one groupBy shuffle (partial_count before "
            "exchange = map-side combine); no join, no recursion.",
            grab(facet_tree_counts(fdocs)),
        )
    )

    sections.append(
        (
            "Postings build (tokenize mapInPandas)",
            "MUST: no shuffle at all — scan → repartition-free mapInPandas.",
            grab(build_postings(docs, id_col="doc_id", text_col="text")),
        )
    )

    sections.append(
        (
            "Nested boolean: (merge OR hash) AND join",
            "MUST: per-level combine as joins over ONE term-pruned candidate "
            "scan; the must-group intersection is a join on doc_id, shoulds "
            "sum via a sorted-struct fold (deterministic f64).",
            grab(search_segments(si, "(merge OR hash) AND join", k=10, docs=docs)),
        )
    )

    from fugu_spark.dates import date_range_filter, parse_rfc3339

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sections.append(
        (
            "Date-range filter pushdown (X5)",
            "MUST: the timestamp range reaches the parquet scan as "
            "PushedFilters GreaterThanOrEqual/LessThan on ts.",
            grab(
                ev.filter(
                    (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
                    & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp_ntz"))
                ).select("event_id", "ts")
            ),
        )
    )

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("# PLANS — physical-plan review (`.explain('formatted')`)\n\n")
        f.write(
            "Captured at sf0.01 on local[8]. Each section lists the property "
            "the plan must exhibit, then the plan. Regenerate with "
            "`python tools/explain_plans.py`.\n\n"
        )
        for title, must, plan in sections:
            f.write(f"## {title}\n\n{must}\n\n```\n{plan}\n```\n\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
