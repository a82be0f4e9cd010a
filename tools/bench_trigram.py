"""Scale evidence for the trigram index: build throughput at two
parallelism levels (the N→4N criterion) and query wall vs the full
grep scan on the same corpus. One Spark session per parallelism level,
run sequentially on a quiet host.

Usage: python tools/bench_trigram.py [n_docs]
Prints one JSON line."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_level(cpus: int, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from fugu_spark import trigram as TG
    from fugu_spark.analytics.codesearch import grep
    from fugu_spark.corpus import generate_corpus
    from fugu_spark.session import get_spark

    spark = get_spark(
        app_name=f"tri_bench_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = (
        generate_corpus(spark, n_docs)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("text"),
        )
        .cache()
    )
    n_tris = None
    docs.count()  # materialize input outside the timed region

    d = f"/tmp/tri_bench_{cpus}"
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    TG.build_trigram_index(docs, d)
    build_wall = time.time() - t0
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    ds = pads.dataset(f"{d}/trigram_index")
    n_tris = int(
        pc.sum(ds.to_table(columns=["df"])["df"]).as_py()
    )  # total postings written

    # query: selective pattern through the prefilter vs the full scan
    pattern = "merge (join|sort)"
    t0 = time.time()
    n_pref = TG.trigram_grep(spark, d, docs, pattern).count()
    q_pref = time.time() - t0
    t0 = time.time()
    n_scan = grep(docs, pattern).count()
    q_scan = time.time() - t0
    assert n_pref == n_scan, (n_pref, n_scan)

    out = {
        "cpus": cpus,
        "build_wall_sec": round(build_wall, 2),
        "postings": n_tris,
        "tri_postings_per_sec": round(n_tris / build_wall, 1),
        "grep_prefilter_sec": round(q_pref, 2),
        "grep_scan_sec": round(q_scan, 2),
        "n_hits": n_pref,
    }
    if cpus == 32:  # once: served-path latency over the same sidecar
        docs_path = "/tmp/tri_bench_docs.parquet"
        docs.write.mode("overwrite").parquet(docs_path)
        from fugu_spark.trigram import TrigramSearcher, substring_required

        s = TrigramSearcher(d, docs_path)
        served = {}
        for label, needle in [("selective", "5983"), ("common", "merge join")]:
            cand = s.candidates(substring_required(needle))
            t0 = time.time()
            pdf = s.substring(needle)
            ms = (time.time() - t0) * 1000
            t0 = time.time()
            pdf2 = s.substring(needle)
            ms_warm = (time.time() - t0) * 1000
            served[label] = {
                "needle": needle,
                "candidates": int(cand.size),
                "hits": int(len(pdf)),
                "prune_ratio": round(cand.size / n_docs_total(docs), 4),
                "ms_cold": round(ms, 1),
                "ms_warm": round(ms_warm, 1),
            }
        out["served"] = served
    spark.stop()
    return out


def n_docs_total(docs) -> int:
    return docs.count()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    cpu_levels = (
        [int(c) for c in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 8, 32]
    )
    levels = {}
    for cpus in cpu_levels:
        levels[f"local[{cpus}]"] = run_level(cpus, n_docs)
    out = {
        "metric": "trigram_build_postings_per_sec",
        "n_docs": n_docs,
        "levels": levels,
    }
    for lo, hi in zip(cpu_levels, cpu_levels[1:]):
        a, b = levels[f"local[{lo}]"], levels[f"local[{hi}]"]
        out[f"efficiency_{lo}_to_{hi}"] = round(
            b["tri_postings_per_sec"] / a["tri_postings_per_sec"] / (hi / lo), 4
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
