"""Stage-1 scaling attribution (VERDICT r1 #8): where do 8→32 cores go?

Three measurements of the SAME tokenize work over the SAME corpus files,
alternated per rep to cancel host drift:

  pool    — Spark-free multiprocessing pool running the engine's actual
            tokenizer kernel (pyarrow read + fast_token_stats path):
            the host's ceiling for THIS workload shape.
  compute — build_postings(...).agg(count) on local[P]: Spark's Arrow
            pipe + Python workers, no parquet write.
  full    — build_postings(...).write.parquet (the real stage 1).

pool vs compute isolates Spark overhead; compute vs full isolates the
/tmp parquet-write cost. Prints one JSON line per measurement.

Usage: python tools/profile_stage1.py [reps] [corpus_dir]
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/fugu_bench_corpus_160000_p128"


def _pool_worker(files: list[str]) -> int:
    import pyarrow.parquet as pq

    from fugu_spark.tokenizer import postings_batch

    n = 0
    CHUNK = 1024  # same inner chunking as build_postings.extract
    for f in files:
        pdf = pq.read_table(f, columns=["doc_id", "content"]).to_pandas()
        for lo in range(0, len(pdf), CHUNK):
            out = postings_batch(
                pdf["content"].iloc[lo : lo + CHUNK].reset_index(drop=True),
                "tantivy_default",
                True,
            )
            n += len(out)
    return n


def run_pool(procs: int, files: list[str]) -> dict:
    chunks = [files[i::procs] for i in range(procs)]
    t0 = time.time()
    with mp.Pool(procs) as p:
        counts = p.map(_pool_worker, chunks)
    wall = time.time() - t0
    return {"kind": "pool", "procs": procs, "rows": sum(counts), "wall": round(wall, 2)}


def run_spark(procs: int, write: bool) -> dict:
    """Separate subprocess per measurement (fresh JVM, like bench)."""
    code = f"""
import sys, time, json, shutil
sys.path.insert(0, {REPO!r})
from fugu_spark.session import get_spark
from fugu_spark.postings import build_postings
spark = get_spark(app_name="prof_stage1", master="local[{procs}]",
    extra_conf={{"spark.sql.files.maxPartitionBytes": "1048576",
                "spark.sql.files.openCostInBytes": "0"}})
docs = spark.read.parquet({CORPUS!r})
docs.count()
warm = docs.limit({8 * procs}).repartition({procs})
build_postings(warm, id_col="doc_id", text_col="content", encode_positions=True).count()
t0 = time.time()
p = build_postings(docs, id_col="doc_id", text_col="content", encode_positions=True)
if {write}:
    shutil.rmtree("/tmp/prof_stage1_out", ignore_errors=True)
    p.write.mode("overwrite").parquet("/tmp/prof_stage1_out")
else:
    p.selectExpr("count(*)").collect()
print(json.dumps({{"kind": {"'full'" if write else "'compute'"}, "procs": {procs},
    "wall": round(time.time() - t0, 2)}}))
spark.stop()
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=900)
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    corpus = sys.argv[2] if len(sys.argv) > 2 else CORPUS
    files = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
    results = []
    for rep in range(reps):
        for procs in (8, 32):
            for kind in ("pool", "compute", "full"):
                if kind == "pool":
                    r = run_pool(procs, files)
                else:
                    r = run_spark(procs, kind == "full")
                r["rep"] = rep
                results.append(r)
                print(json.dumps(r), flush=True)
    best: dict[tuple, float] = {}
    for r in results:
        key = (r["kind"], r["procs"])
        best[key] = min(best.get(key, 1e9), r["wall"])
    print("\n== best-of walls ==")
    for kind in ("pool", "compute", "full"):
        w8, w32 = best[(kind, 8)], best[(kind, 32)]
        print(f"{kind:8s} 8c={w8:6.1f}s 32c={w32:6.1f}s speedup={w8 / w32:4.2f}x "
              f"(raw 4x-eff {(w8 / w32) / 4:4.2f})")


if __name__ == "__main__":
    main()
