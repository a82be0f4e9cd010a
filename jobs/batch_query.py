"""spark-submit entry: batch retrieval — many queries, ONE Spark job.

    spark-submit --py-files fugu_spark.zip jobs/batch_query.py \
        --index-dir /data/index --queries-file queries.tsv --out /data/hits -k 10

``queries.tsv``: one ``query_id<TAB>query_text`` per line (or a parquet
path with columns (query_id, query)). Output: parquet
(query_id, doc_id, score, rank) — the offline RAG-mining / eval-sweep /
hard-negative shape where millions of queries amortize one pass over the
index (fugu_spark/batch.py documents the dataflow).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/<x>.py` runs: make the repo root importable (under
# spark-submit --py-files the zip is already on the path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_queries(path: str, spark) -> dict[int, str]:
    if path.endswith(".parquet") or os.path.isdir(path):
        rows = spark.read.parquet(path).select("query_id", "query").collect()
        return {int(r.query_id): r.query for r in rows}
    out: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, _, text = line.partition("\t")
            out[int(qid)] = text
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--queries-file", required=True)
    p.add_argument("--out", required=True, help="output parquet directory")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from fugu_spark.batch import batch_search_segments
    from fugu_spark.segments import SegmentIndex
    from fugu_spark.session import get_spark

    spark = get_spark(app_name="fugu_batch_query", master=args.master)
    queries = _load_queries(args.queries_file, spark)
    si = SegmentIndex.load(spark, args.index_dir)
    t0 = time.time()
    out = batch_search_segments(si, queries, k=args.k)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "n_queries": len(queries),
                "n_hits": n,
                "k": args.k,
                "wall_sec": round(time.time() - t0, 2),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
