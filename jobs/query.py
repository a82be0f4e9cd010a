"""spark-submit entry: run BM25 top-k queries against a built index.

    spark-submit --py-files fugu_spark.zip jobs/query.py \
        --index-dir s3a://bucket/index --query 'merge AND "hash join"' -k 10
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", action="append", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--no-wand", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from fugu_spark.segment_search import search_segments
    from fugu_spark.segments import SegmentIndex

    spark = SparkSession.builder.appName("fugu_query").getOrCreate()
    si = SegmentIndex.load(spark, args.index_dir)
    for q in args.query:
        t0 = time.time()
        rows = search_segments(si, q, k=args.k, use_wand=not args.no_wand).collect()
        print(
            json.dumps(
                {
                    "query": q,
                    "sec": round(time.time() - t0, 4),
                    "hits": [{"doc_id": r.doc_id, "score": r.score} for r in rows],
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
