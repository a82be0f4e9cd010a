"""Profile the LocalSearcher cold/warm serving path (bench.py phase A mirror).

Usage:
  python tools/profile_serve.py [--build] [--profile qname] [--repeat N]

Builds (or reuses) the bench index for $SPARK_GRAFT_SF_DIR under
/tmp/fugu_profile_idx_<sf>, then times each bench query cold (fresh
LocalSearcher, absent-term warm query — exactly bench.py's protocol) with
per-phase wall breakdown, and optionally cProfiles one query.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY_SET = {
    "q01_single": "merge",
    "q02_or2": "merge join",
    "q03_and2": "merge AND join",
    "q04_not": "merge NOT window",
    "q05_phrase": '"merge join"',
    "q06_boost": "merge^2 join",
    "q07_hot": "the",
    "q08_or4": "merge join sort window",
    "q09_and3": "merge AND join AND sort",
    "q10_k100": "merge join",
}


def build(sf_dir: str, idx_dir: str) -> None:
    import shutil

    from fugu_spark.segments import build_segments
    from fugu_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_serve_build", master=f"local[{cpus}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_segments(docs, idx_dir, id_col="doc_id", text_col="text", resume=False)
    print(f"build wall {time.time() - t0:.2f}s")
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    sf = os.path.basename(sf_dir.rstrip("/"))
    idx_dir = f"/tmp/fugu_profile_idx_{sf}"
    if "--build" in sys.argv or not os.path.exists(f"{idx_dir}/stats.json"):
        build(sf_dir, idx_dir)

    from fugu_spark.serve import LocalSearcher

    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    LocalSearcher(idx_dir).search("merge", k=10)  # one-off JIT/arrow warm-up

    for rep in range(repeat):
        print(f"--- rep {rep} ---")
        stimes = {}
        for name, q in QUERY_SET.items():
            k = 100 if name.endswith("k100") else 10
            cold_ls = LocalSearcher(idx_dir)
            cold_ls.search("zz_absent_term_zz", k=1)
            t0 = time.time()
            cold_ls.search(q, k=k)
            stimes[name] = round(time.time() - t0, 4)
        import statistics

        print({**stimes, "p50": round(statistics.median(stimes.values()), 4)})

    if "--profile" in sys.argv:
        qname = sys.argv[sys.argv.index("--profile") + 1]
        q = QUERY_SET[qname]
        k = 100 if qname.endswith("k100") else 10
        cold_ls = LocalSearcher(idx_dir)
        cold_ls.search("zz_absent_term_zz", k=1)
        pr = cProfile.Profile()
        pr.enable()
        cold_ls.search(q, k=k)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40)
        print(s.getvalue())


if __name__ == "__main__":
    main()
