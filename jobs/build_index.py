"""spark-submit entry: build (or resume) the inverted index.

    spark-submit --py-files fugu_spark.zip jobs/build_index.py \
        --source s3a://bucket/corpus --format iceberg \
        --index-dir s3a://bucket/index --text-col content

Package the library with:  cd /root/repo && zip -r fugu_spark.zip fugu_spark
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/<x>.py` runs: make the repo root importable (under
# spark-submit --py-files the zip is already on the path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument(
        "--config",
        default=None,
        help="EngineConfig YAML/JSON (S6); FUGU_SPARK_* env vars override it. "
        "CLI flags below override both.",
    )
    p.add_argument("--index-dir", default=None)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default=None)
    p.add_argument("--mode", default=None)
    p.add_argument("--n-buckets", type=int, default=None)
    p.add_argument("--hot-df-threshold", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--skip-sha-check", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from fugu_spark import fsio
    from fugu_spark.config import load_config
    from fugu_spark.segments import build_segments
    from fugu_spark.sources import check_sha256_invariant, load_corpus

    spark = SparkSession.builder.appName("fugu_build_index").getOrCreate()
    cfg = load_config(args.config)
    index_dir = args.index_dir or cfg.index_dir
    if not index_dir:
        print(json.dumps({"error": "no index_dir (flag, config file, or env)"}))
        return 2
    text_col = args.text_col or cfg.text_col
    docs = load_corpus(spark, args.source, fmt=args.format)
    if not args.skip_sha_check:
        bad = check_sha256_invariant(docs, text_col)
        if bad:
            print(json.dumps({"error": "sha256_invariant_violations", "rows": bad}))
            return 1
    si = build_segments(
        docs,
        index_dir,
        id_col=args.id_col,
        text_col=text_col,
        mode=args.mode or cfg.mode,
        n_buckets=args.n_buckets or cfg.n_buckets,
        hot_df_threshold=args.hot_df_threshold or cfg.hot_df_threshold,
        resume=not args.no_resume,
    )
    print(fsio.read_text(fsio.join(si.index_dir, "stats.json")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
