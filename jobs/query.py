"""spark-submit entry: run BM25 top-k queries against a built index.

    spark-submit --py-files fugu_spark.zip jobs/query.py \
        --index-dir s3a://bucket/index --query 'merge AND "hash join"' -k 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/<x>.py` runs: make the repo root importable (under
# spark-submit --py-files the zip is already on the path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", action="append", default=None)
    p.add_argument(
        "--suggest",
        default=None,
        metavar="PREFIX",
        help="autocomplete from the suggest_index sidecar (JVM-free)",
    )
    p.add_argument(
        "--get",
        type=int,
        default=None,
        metavar="DOC_ID",
        help="stored-object point lookup from the doc_store sidecar (JVM-free)",
    )
    p.add_argument(
        "--facet-counts",
        default=None,
        metavar="ROOT",
        help="immediate-child facet counts from the counts_index ledger (JVM-free)",
    )
    p.add_argument(
        "--filter",
        action="append",
        default=None,
        help="facet filter (repeatable, OR'd): '/lang/py', 'lang/*', 'lang=py'. "
        "Served from the index's filter_index (Equals/Prefix pushdown).",
    )
    p.add_argument(
        "--date-range",
        action="append",
        default=None,
        metavar="COL,START,END",
        help="half-open [START, END) RFC3339 date filter (repeatable, "
        "AND'd): 'date_created,2024-01-01T00:00:00Z,2024-02-01T00:00:00Z'; "
        "leave START or END empty for an open bound. Served from the "
        "index's date_index sidecar.",
    )
    p.add_argument("-k", type=int, default=10)
    p.add_argument(
        "--count",
        action="store_true",
        help="print the exact hit count instead of top-k hits "
        "(LocalSearcher.count / resultops.match_count)",
    )
    p.add_argument("--no-wand", action="store_true")
    p.add_argument(
        "--serve-max-postings",
        type=int,
        default=5_000_000,
        help="max posting volume (sum df over query terms) served driver-side; "
        "hotter queries run on the cluster",
    )
    p.add_argument(
        "--spark",
        action="store_true",
        help="force the distributed engine (default: serve driver-side when "
        "the query is locally servable — ms latency, identical results)",
    )
    args = p.parse_args()

    # sidecar-only commands: no Spark, no JVM — pyarrow reads only
    if args.suggest is not None or args.get is not None or args.facet_counts is not None:
        from fugu_spark.serve import LocalSearcher

        ls = LocalSearcher(args.index_dir)
        if args.suggest is not None:
            pdf = ls.suggest(args.suggest, n=args.k)
            print(json.dumps({"suggestions": [
                {"suggestion": s, "count": int(c)}
                for s, c in zip(pdf["suggestion"], pdf["count"])
            ]}))
        if args.get is not None:
            pdf = ls.get_docs([args.get])
            rec = pdf.to_dict(orient="records")[0] if len(pdf) else None
            if rec is not None:
                rec = {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in rec.items()}
            # default=str: timestamp columns (pd.Timestamp/NaT) have no
            # native JSON encoding
            print(json.dumps({"object": rec}, default=str))
        if args.facet_counts is not None:
            pdf = ls.facet_counts(args.facet_counts)
            print(json.dumps({"counts": [
                {"child": ch, "count": int(c)} for ch, c in zip(pdf["child"], pdf["count"])
            ]}))
        if not args.query:
            return 0
    if not args.query:
        p.error("--query required (or one of --suggest/--get/--facet-counts)")

    date_ranges = None
    if args.date_range:
        date_ranges = {}
        for spec in args.date_range:
            parts = spec.split(",")
            if len(parts) != 3:
                p.error(f"--date-range needs COL,START,END (got {spec!r})")
            col, start, end = parts
            date_ranges[col] = (start or None, end or None)

    searcher = None
    if not args.spark:
        from fugu_spark.serve import LocalSearcher

        searcher = LocalSearcher(args.index_dir)

    spark = None
    si = None
    for q in args.query:
        t0 = time.time()
        if args.count:
            n = None
            if searcher is not None:
                try:
                    n = searcher.count(
                        q,
                        max_postings=args.serve_max_postings,
                        filters=args.filter,
                        date_ranges=date_ranges,
                    )
                except ValueError:
                    pass
            if n is None:
                if spark is None:
                    from pyspark.sql import SparkSession

                    from fugu_spark.segments import SegmentIndex

                    spark = SparkSession.builder.appName("fugu_query").getOrCreate()
                    si = SegmentIndex.load(spark, args.index_dir)
                from fugu_spark.segment_search import search_segments

                n = search_segments(
                    si,
                    q,
                    k=(1 << 31) - 1,
                    use_wand=False,  # rank pruning must not shrink the set
                    filter_paths=args.filter,
                    date_ranges=date_ranges,
                ).count()
            print(json.dumps({"query": q, "sec": round(time.time() - t0, 4),
                              "n_matches": int(n)}))
            continue
        hits = None
        if searcher is not None:
            try:
                pdf = searcher.search(
                    q,
                    k=args.k,
                    max_postings=args.serve_max_postings,
                    filters=args.filter,
                    date_ranges=date_ranges,
                )
                hits = [
                    {"doc_id": int(r.doc_id), "score": float(r.score)}
                    for r in pdf.itertuples(index=False)
                ]
            except ValueError:
                # AllQuery / NOT-only / above the serve cap / wildcard
                # filter: fall through to Spark (which reads the same
                # persisted filter_index via filter_paths)
                pass
        if hits is None:
            if spark is None:
                from pyspark.sql import SparkSession

                from fugu_spark.segments import SegmentIndex

                spark = SparkSession.builder.appName("fugu_query").getOrCreate()
                si = SegmentIndex.load(spark, args.index_dir)
            from fugu_spark.segment_search import search_segments

            rows = search_segments(
                si,
                q,
                k=args.k,
                use_wand=not args.no_wand,
                filter_paths=args.filter,
                date_ranges=date_ranges,
            ).collect()
            hits = [{"doc_id": r.doc_id, "score": r.score} for r in rows]
        print(
            json.dumps(
                {"query": q, "sec": round(time.time() - t0, 4), "hits": hits}
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
