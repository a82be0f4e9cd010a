"""Per-phase wall breakdown of one cold LocalSearcher query (no cProfile
distortion): parse, term_meta, block read, prune, decode, leaf parts,
combine. Usage: python tools/profile_serve_phases.py [qname]"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.profile_serve import QUERY_SET  # noqa: E402


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "q08_or4"
    q = QUERY_SET[qname]
    k = 100 if qname.endswith("k100") else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    idx_dir = f"/tmp/fugu_profile_idx_{os.path.basename(sf_dir.rstrip('/'))}"

    from fugu_spark.serve import LocalSearcher

    LocalSearcher(idx_dir).search(q, k=k)  # process warm-up

    for rep in range(3):
        ls = LocalSearcher(idx_dir)
        ls.search("zz_absent_term_zz", k=1)
        t = {}
        t0 = time.perf_counter()

        orig_meta = ls._term_meta_read
        orig_rows = ls._block_rows
        orig_dec = ls._decode_rows
        orig_parts = ls._leaf_parts

        def timed(name, fn):
            def wrap(*a, **kw):
                s = time.perf_counter()
                r = fn(*a, **kw)
                t[name] = t.get(name, 0.0) + time.perf_counter() - s
                return r

            return wrap

        ls._term_meta_read = timed("term_meta", orig_meta)
        ls._block_rows = timed("block_rows", orig_rows)
        ls._decode_rows = timed("decode", orig_dec)
        ls._leaf_parts = timed("leaf_parts", orig_parts)
        ls.search(q, k=k)
        total = time.perf_counter() - t0
        t["other(combine/parse)"] = total - sum(t.values())
        print(
            f"{qname} rep{rep} total={total*1e3:.1f}ms  "
            + "  ".join(f"{n}={v*1e3:.1f}" for n, v in t.items())
        )


if __name__ == "__main__":
    main()
