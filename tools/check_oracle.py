"""Local stand-in for the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count, sorted column names, and an order-insensitive value
multiset (rounded stringification)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from fugu_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, list):
        return str([norm_cell(x) for x in v])
    return str(v)


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main(
    sf_dir: str = "/root/testdata/sf0.01",
    only: list[str] | None = None,
    json_out: str | None = None,
):
    import json as _json

    results: dict[str, dict] = {}
    spark = get_spark(app_name="oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {e}"}
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(s_rows),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            print(f"rows-only {name}: {len(s_rows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(s_rows),
                             "oracle_rows": None, "err": f"duckdb: {e}"}
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        ok_vals = ok_cols and ok_count and to_multiset(s_cols, [list(r) for r in s_rows]) == to_multiset(
            d_cols, d_rows
        )
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        results[name] = {"rows_match": ok_count, "schema_match": ok_cols,
                         "hash_match": ok_vals, "spark_rows": len(s_rows),
                         "oracle_rows": len(d_rows), "err": None}
        print(
            f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} cols={ok_cols} vals={ok_vals}  ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_cols and ok_count:
            a = to_multiset(s_cols, [list(r) for r in s_rows])
            b = to_multiset(d_cols, d_rows)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diff:
                print(f"   spark={x}\n   duck ={y}")
    print("\nFAILURES:", failures or "none")
    if json_out:
        with open(json_out, "w") as f:
            _json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    jout = None
    if args and args[0] == "--json":
        jout = args[1]
        args = args[2:]
    sf = "/root/testdata/sf0.01"
    if args and args[0].startswith("/"):
        sf = args[0]
        args = args[1:]
    sys.exit(main(sf_dir=sf, only=args or None, json_out=jout))
