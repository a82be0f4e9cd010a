"""Driver-side serving engine: BM25 top-k directly over segment files.

Spark owns the BUILD; serving one query must not cost a cluster
round-trip. The reference serves from Tantivy's mmap'd segment files
(/root/reference/src/db/core.rs:238-249); the analog here reads the same
parquet segment blocks through pyarrow with bucket-partition + term
row-group pushdown, decodes the varint streams with numpy, and scores /
boolean-combines with the exact semantics of
``fugu_spark.search.execute_plan`` — rank and score identity against the
distributed engines is pinned in tests. p50 latency is ~10-30 ms vs
~0.5-1 s for a warm Spark job at local scale.

Block-max pruning (SURVEY.md M6) engages for pure-OR term queries: θ is
seeded by fully scoring the highest-upper-bound term (a rank-safe lower
bound on the final top-k threshold); blocks of the remaining terms are
skipped when their block score bound plus the other terms' global upper
bounds cannot reach θ — the same rank-safe MaxScore criterion as the
distributed path, so results are identical to exhaustive evaluation.

Facet filters (Equals/Prefix) serve locally from the persisted
filter_index, and date-range filters from the epoch-micros date_index
sidecar — both with parquet predicate pushdown. Not servable locally
(fall back to ``search_segments``): AllQuery / NOT-only queries (need
the docs table), Contains/Wildcard facet filters (no pushdown), and
queries whose posting volume exceeds the driver serve cap.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from . import BM25_B, BM25_K1
from .bm25 import idf_py
from .codecs import decode_posting_blocks_batched
from .queryparse import QueryPlan, parse_query
from .tokenizer import DEFAULT_MODE

_ENC_COLS = ["doc_ids_enc", "tfs_enc", "doc_lens_enc"]
_POS_COLS = ["pos_counts_enc", "positions_enc"]
_META_BLOCK_COLS = [
    "term", "n_docs", "max_tf", "min_doc_len", "min_doc_id", "max_doc_id", "gen",
]


def _tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def _rfc3339_us(s: str, tz: str | None = None) -> int:
    """RFC3339 bound string → epoch microseconds, matching Spark's
    cast-to-timestamp semantics: offset/'Z' strings are absolute
    instants; naive strings resolve in ``tz`` (the engine passes
    spark.sql.session.timeZone so serve and Spark paths agree even when
    the session tz differs from the host's), else the system zone
    (Spark's own session-tz default)."""
    from datetime import datetime, timedelta, timezone

    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        if tz:
            from zoneinfo import ZoneInfo

            dt = dt.replace(tzinfo=ZoneInfo(tz))
        else:
            dt = dt.astimezone()
    return (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(microseconds=1)


def _apply_cursor(out: pd.DataFrame, search_after: tuple | None) -> pd.DataFrame:
    """Keep rows strictly AFTER the (score, doc_id) cursor in the
    (score DESC, doc_id ASC) total order — the serving-side mirror of
    search.top_k's search_after filter. Scores are recomputed by the
    same f64 arithmetic that produced the cursor, so equality is exact."""
    if search_after is None:
        return out
    s, d = float(search_after[0]), int(search_after[1])
    sc = out["score"].to_numpy()
    di = out["doc_id"].to_numpy()
    return out[(sc < s) | ((sc == s) & (di > d))]


def _segmented_gather(
    flat: np.ndarray, offs: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Select segments ``idx`` from a flat array partitioned by ``offs``
    (len(offs) == n_segments + 1) → (new_flat, new_offs). Fully
    vectorized — the flat-positions analog of ``[arrs[i] for i in idx]``."""
    lens = offs[idx + 1] - offs[idx]
    total = int(lens.sum())
    if total == 0:
        return flat[:0], np.zeros(len(idx) + 1, dtype=np.int64)
    ends = np.cumsum(lens)
    out_idx = np.repeat(offs[idx], lens) + np.arange(total, dtype=np.int64) - np.repeat(
        ends - lens, lens
    )
    return flat[out_idx], np.concatenate([[0], ends]).astype(np.int64)


def _prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string (in UTF-8 byte order) greater than every string
    with this prefix: increment the last incrementable code point,
    skipping the surrogate gap. None when no such bound exists (the
    prefix is all U+10FFFF) — callers then scan with only the lower
    bound and rely on the exact re-check."""
    for i in range(len(prefix) - 1, -1, -1):
        nxt = ord(prefix[i]) + 1
        if nxt == 0xD800:  # skip the unencodable surrogate range
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return prefix[:i] + chr(nxt)
    return None


class LocalSearcher:
    """Query-side reader over a segment index directory (no SparkSession)."""

    def __init__(
        self,
        index_dir: str,
        mode: str = DEFAULT_MODE,
        k1: float = BM25_K1,
        b: float = BM25_B,
        cache_bytes: int = 256 << 20,
        session_tz: str | None = None,
        as_of: int | None = None,
    ) -> None:
        """``as_of`` pins the searcher at a past generation (segments.
        SegmentIndex.at_generation's serving twin): block reads filter
        gen ≤ as_of (parquet directory pruning), deletes filter
        del_gen ≤ as_of, corpus stats come from the stats_history
        anchor, and dictionary stats are re-derived from block METADATA
        of the pinned generations. Query serving only — sidecar filters
        (facets/dates) reject a pinned searcher loudly."""
        import pyarrow.dataset as pads

        from .fsio import as_local

        # driver-side serving reads through pyarrow: local indexes only
        # (raises for s3a://… — callers fall back to search_segments,
        # whose IO goes through Spark's Hadoop connectors)
        index_dir = as_local(index_dir)
        self.index_dir = index_dir
        self.mode = mode
        self.k1 = float(k1)
        self.b = float(b)
        self.session_tz = session_tz  # naive date-bound resolution zone
        # decoded-postings LRU (the Lucene/Tantivy block-cache analog):
        # full per-term posting arrays, keyed (term, with_positions),
        # byte-budgeted. Safe per searcher instance — the engine replaces
        # the searcher whenever the index changes generation.
        from collections import OrderedDict

        self._post_cache: "OrderedDict[tuple[str, bool], dict]" = OrderedDict()
        self._post_cache_bytes = 0
        self._post_cache_cap = int(cache_bytes)
        with open(os.path.join(index_dir, "stats.json")) as f:
            st = json.load(f)
        fmt = int(st.get("format", 1))
        if fmt != 2:
            # same guard as SegmentIndex.load: an untagged (format-1)
            # stream would be MIS-decoded, not rejected, by stream_decode
            raise ValueError(
                f"segment format {fmt} at {index_dir!r} is not readable by this "
                "version (expects format 2, codec-tagged streams since 0.4.0) "
                "— rebuild the index"
            )
        self.as_of = None if as_of is None else int(as_of)
        if self.as_of is not None:
            hist = st.get("stats_history")
            if not hist:
                raise ValueError(
                    "index has no stats_history (built before point-in-time "
                    "support) — rebuild, or compact() once to re-anchor"
                )
            past = [h for h in hist if int(h["gen"]) <= self.as_of]
            if not past:
                raise ValueError(f"no generation <= {self.as_of} in stats_history")
            anchor = max(past, key=lambda e: int(e["gen"]))
            st = {**st, "n_docs": anchor["n_docs"], "avgdl": (
                anchor["total_tokens"] / anchor["n_docs"] if anchor["n_docs"] else 0.0
            )}
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        self._terms = pads.dataset(os.path.join(index_dir, "terms"), format="parquet")
        self._segments = pads.dataset(
            os.path.join(index_dir, "segments"), format="parquet", partitioning="hive"
        )
        self._deletes: pd.Series | None = None  # doc_id -> max del_gen
        dpath = os.path.join(index_dir, "deletes")
        if os.path.isdir(dpath):
            dpdf = pads.dataset(dpath, format="parquet").to_table().to_pandas()
            if self.as_of is not None:
                dpdf = dpdf[dpdf["del_gen"] <= self.as_of]
            d = dpdf.groupby("doc_id")["del_gen"].max()
            if len(d):
                self._deletes = d
        # facet filter index (written by FuguSparkEngine when facets exist)
        fpath = os.path.join(index_dir, "filter_index")
        self._filters_ds = (
            pads.dataset(fpath, format="parquet") if os.path.isdir(fpath) else None
        )
        # date sidecar (written by FuguSparkEngine when date fields exist)
        dxpath = os.path.join(index_dir, "date_index")
        self._dates_ds = (
            pads.dataset(dxpath, format="parquet") if os.path.isdir(dxpath) else None
        )

    # ------------------------------------------------------------- lookups

    def _prefix_expander(self):
        """queryparse.expand_plan expander over the local dictionary for
        prefix AND regex leaves: [prefix, successor) pyarrow read,
        row-group pruned by the range-clustered terms layout (a regex
        prunes by its literal prefix; prefix-free patterns scan the
        dictionary column, Lucene's FST-walk analog); cap = Tantivy's
        max_expansions."""
        import re as _re

        import pyarrow.dataset as pads

        from .queryparse import PREFIX_MAX_EXPANSIONS, regex_literal_prefix

        def exp(leaf) -> list[str]:
            rx = None
            if leaf.regex:
                rx = _re.compile(leaf.terms[-1])
                prefix = regex_literal_prefix(leaf.terms[-1])
            else:
                prefix = leaf.terms[-1]
            flt = None
            if prefix:
                flt = pads.field("term") >= prefix
                ub = _prefix_upper_bound(prefix)
                if ub is not None:
                    flt = flt & (pads.field("term") < ub)
            try:
                tbl = self._terms.to_table(columns=["term"], filter=flt)
            except Exception:
                return []
            terms = tbl["term"].to_pylist()
            if rx is not None:
                terms = [t for t in terms if rx.fullmatch(t)]
            return sorted(terms)[:PREFIX_MAX_EXPANSIONS]

        return exp

    def term_meta(self, terms: list[str]) -> dict[str, dict]:
        """Dictionary rows for the query terms (row-group pruned read,
        memoized per searcher — the dictionary is immutable for this
        index generation). Absent terms are memoized too, so repeated
        misses skip the parquet read."""
        cache = getattr(self, "_term_meta_cache", None)
        if cache is None:
            cache = self._term_meta_cache = {}
        missing = [t for t in terms if t not in cache]
        if missing:
            fetched = self._term_meta_read(missing)
            for t in missing:
                cache[t] = fetched.get(t)
        return {t: cache[t] for t in terms if cache.get(t) is not None}

    def _term_meta_read(self, terms: list[str]) -> dict[str, dict]:
        import pyarrow.dataset as pads

        if not terms:
            return {}
        if self.as_of is not None:
            # pinned: the on-disk dictionary is the LIVE merged one —
            # re-derive the terms' stats from block METADATA columns of
            # the pinned generations (posting payloads never read)
            try:
                tbl = self._segments.to_table(
                    columns=["term", "n_docs", "max_tf", "min_doc_len", "term_bucket"],
                    filter=pads.field("term").isin(terms)
                    & (pads.field("gen") <= self.as_of),
                )
            except Exception:
                return {}
            pdf = tbl.to_pandas()
            if not len(pdf):
                return {}
            g = pdf.groupby("term").agg(
                df=("n_docs", "sum"), max_tf=("max_tf", "max"),
                min_doc_len=("min_doc_len", "min"), term_bucket=("term_bucket", "first"),
            )
            return {
                t: {
                    "df": int(r.df), "term_bucket": int(r.term_bucket),
                    "max_tf": int(r.max_tf), "min_doc_len": int(r.min_doc_len),
                    "idf": idf_py(int(r.df), self.n_docs),
                }
                for t, r in g.iterrows()
            }
        try:
            tbl = self._terms.to_table(
                columns=["term", "df", "term_bucket", "max_tf", "min_doc_len"],
                filter=pads.field("term").isin(terms),
            )
        except Exception:
            return {}  # empty index: terms dir has no data files / schema
        out = {}
        for r in tbl.to_pylist():
            out[r["term"]] = {
                "df": r["df"],
                "term_bucket": r["term_bucket"],
                "max_tf": r["max_tf"],
                "min_doc_len": r["min_doc_len"],
                "idf": idf_py(r["df"], self.n_docs),
            }
        return out

    def _block_rows(self, terms: list[str], meta: dict, need_pos: bool) -> pd.DataFrame:
        import pyarrow.dataset as pads

        buckets = sorted({meta[t]["term_bucket"] for t in terms})
        cols = _META_BLOCK_COLS + _ENC_COLS + (_POS_COLS if need_pos else [])
        flt = pads.field("term_bucket").isin(buckets) & pads.field("term").isin(terms)
        if self.as_of is not None:
            flt = flt & (pads.field("gen") <= self.as_of)
        return self._segments.to_table(columns=cols, filter=flt).to_pandas()

    # --------------------------------------------------- postings cache

    @staticmethod
    def _post_nbytes(p: dict) -> int:
        n = int(p["doc_ids"].nbytes + p["tfs"].nbytes + p["doc_lens"].nbytes)
        if p.get("pos_flat") is not None:
            n += int(p["pos_flat"].nbytes + p["pos_offsets"].nbytes)
        return n

    def _cache_get(self, term: str, need_pos: bool) -> dict | None:
        e = self._post_cache.get((term, need_pos))
        if e is not None:
            self._post_cache.move_to_end((term, need_pos))
        return e

    def _cache_put(self, term: str, need_pos: bool, postings: dict) -> None:
        if self._post_cache_cap <= 0:
            return
        key = (term, need_pos)
        if key in self._post_cache:
            return
        nb = self._post_nbytes(postings)
        if nb > self._post_cache_cap:
            return
        self._post_cache[key] = postings
        self._post_cache_bytes += nb
        while self._post_cache_bytes > self._post_cache_cap and self._post_cache:
            _, old = self._post_cache.popitem(last=False)
            self._post_cache_bytes -= self._post_nbytes(old)

    def _postings_cached(self, live_terms, meta, need_pos, prune) -> dict:
        """Decoded postings for the query's terms, through the LRU —
        rank-safe by construction: a cache hit serves the FULL posting
        list (scoring over a superset of any pruned block set is exact),
        and a pruned partial decode is never stored.

        Cold query (no hits): fetch + prune across the full term set
        (cross-term pruning bounds are valid there), caching the terms
        pruning left whole. Partial hit: fetch ONLY the missing terms,
        un-pruned (query-level bounds would be wrong without the cached
        terms' contributions), cache them, merge with the hits."""
        if self._post_cache_cap <= 0:
            rows = self._block_rows(live_terms, meta, need_pos)
            return self._decode_with_seed(prune(rows), need_pos)
        hit = {t: self._cache_get(t, need_pos) for t in live_terms}
        missing = [t for t in live_terms if hit[t] is None]
        if not missing:
            return hit
        if len(missing) == len(live_terms):
            rows = self._block_rows(live_terms, meta, need_pos)
            before = rows["term"].value_counts()
            pruned = prune(rows)
            postings = self._decode_with_seed(pruned, need_pos)
            if len(pruned):
                after = pruned["term"].value_counts()
                for t in live_terms:
                    if t in postings and int(before.get(t, 0)) == int(after.get(t, 0)):
                        self._cache_put(t, need_pos, postings[t])
            return postings
        rows = self._block_rows(missing, meta, need_pos)
        fresh = self._decode_rows(rows, need_pos)
        for t, p in fresh.items():
            self._cache_put(t, need_pos, p)
        out = {t: v for t, v in hit.items() if v is not None}
        out.update(fresh)
        return out

    def _decode_with_seed(
        self, pruned: pd.DataFrame, need_pos: bool
    ) -> dict[str, dict]:
        """Decode pruned block rows, reusing the postings the MaxScore
        prune already decoded for its θ-seed term (the seed's blocks are
        never pruned, so the main pass would decode the exact same rows
        a second time — ~half the decode cost of a 2-term OR)."""
        stash = getattr(self, "_seed_postings", None)
        self._seed_postings = None
        if stash and not need_pos:
            seed = next(iter(stash))
            sel = (pruned["term"] == seed).to_numpy() if len(pruned) else None
            if sel is not None and sel.any():
                out = self._decode_rows(pruned[~sel], need_pos)
                out[seed] = stash[seed]
                return out
        return self._decode_rows(pruned, need_pos)

    def _decode_rows(
        self, rows: pd.DataFrame, need_pos: bool
    ) -> dict[str, dict[str, np.ndarray | list]]:
        """Block rows → per-term posting arrays, delete mask applied.
        Doc order within a term follows (gen, block) order; combine is
        order-insensitive (grouped by doc), so no re-sort is needed.

        ALL blocks decode in one batched pass (codecs.
        decode_posting_blocks_batched) — per-block stream decodes were
        the dominant cold-query cost (r5 profile: ~0.2 ms × ~100 blocks
        of fixed numpy overhead)."""
        out: dict[str, dict] = {}
        if not len(rows):
            return out
        # group blocks per term, preserving (gen, block) row order
        rows = rows.sort_values("term", kind="stable")
        n_docs = rows["n_docs"].to_numpy(np.int64)
        dec = decode_posting_blocks_batched(
            n_docs,
            rows["doc_ids_enc"].tolist(),
            rows["tfs_enc"].tolist(),
            rows["doc_lens_enc"].tolist(),
            rows["pos_counts_enc"].tolist() if need_pos else None,
            rows["positions_enc"].tolist() if need_pos else None,
            flat_positions=True,
        )
        doc_ids_all = dec["doc_ids"].view(np.int64)
        tfs_all = dec["tfs"].astype(np.int64)
        dls_all = dec["doc_lens"].astype(np.int64)
        gens_all = np.repeat(rows["gen"].to_numpy(np.int64), n_docs)
        terms = rows["term"].to_numpy()
        # contiguous per-term slices after the stable term sort
        block_term_change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        term_block_starts = np.concatenate([[0], block_term_change, [len(rows)]])
        val_offs = np.concatenate([[0], np.cumsum(n_docs)]).astype(np.int64)
        pos_offs_all = dec.get("pos_offsets")
        for k in range(len(term_block_starts) - 1):
            b0, b1 = term_block_starts[k], term_block_starts[k + 1]
            lo, hi = val_offs[b0], val_offs[b1]
            doc_ids = doc_ids_all[lo:hi]
            tfs = tfs_all[lo:hi]
            dls = dls_all[lo:hi]
            gens = gens_all[lo:hi]
            pos_flat = pos_offs = None
            if need_pos:
                p0 = pos_offs_all[lo]
                pos_flat = dec["positions_flat"][p0 : pos_offs_all[hi]]
                pos_offs = (pos_offs_all[lo : hi + 1] - p0).astype(np.int64)
            if self._deletes is not None:
                dg = self._deletes.reindex(doc_ids).to_numpy(dtype=np.float64)
                keep = np.isnan(dg) | (gens >= dg)
                if not keep.all():
                    doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
                    if pos_flat is not None:
                        pos_flat, pos_offs = _segmented_gather(
                            pos_flat, pos_offs, np.flatnonzero(keep)
                        )
            out[str(terms[b0])] = {
                "doc_ids": doc_ids,
                "tfs": tfs,
                "doc_lens": dls,
                "pos_flat": pos_flat,
                "pos_offsets": pos_offs,
            }
        return out

    # ------------------------------------------------------------- filters

    def _allowed_docs(self, filters: list[str]) -> np.ndarray:
        """Doc ids matching ANY filter (the reference ORs filters), read
        from the persisted filter index with pyarrow pushdown: equality
        for Equals, a [path, successor(path)) byte-order range plus an
        exact startswith re-check for Prefix. Contains / wildcard filters
        can't push down (full facet-column scan at
        corpus scale) → raise; callers fall back to the Spark path."""
        import pyarrow.dataset as pads

        from .facets import FacetFilter, parse_filter

        if self._filters_ds is None:
            raise ValueError(
                "no filter_index in this index dir — facet-filtered "
                "queries need the Spark path"
            )
        expr = None
        post: list[tuple[str, str]] = []
        for raw in filters:
            flt = raw if isinstance(raw, FacetFilter) else parse_filter(raw)
            if flt.operator == "equals":
                e = pads.field("facet") == flt.path
                post.append(("equals", flt.path))
            elif flt.operator == "prefix":
                # [path, successor(path)) in UTF-8 byte order: the
                # successor increments the last incrementable code point,
                # upper-bounding EVERY continuation (a path+U+FFFF bound
                # misses non-BMP continuations, whose UTF-8 bytes sort
                # above it); the exact startswith re-check below handles
                # the widened range when an earlier position had to be
                # incremented
                ub = _prefix_upper_bound(flt.path)
                e = pads.field("facet") >= flt.path
                if ub is not None:
                    e = e & (pads.field("facet") < ub)
                post.append(("prefix", flt.path))
            else:
                raise ValueError(
                    f"filter operator {flt.operator!r} is not locally "
                    "servable — use search_segments"
                )
            expr = e if expr is None else (expr | e)
        tbl = self._filters_ds.to_table(columns=["doc_id", "facet", "gen"], filter=expr)
        fac = tbl["facet"].to_pandas()
        ok = np.zeros(len(fac), dtype=bool)
        for op, v in post:
            ok |= (fac == v).to_numpy() if op == "equals" else fac.str.startswith(v).to_numpy()
        ids = tbl["doc_id"].to_numpy()[ok]
        gens = tbl["gen"].to_numpy()[ok]
        if self._deletes is not None and len(ids):
            dg = self._deletes.reindex(ids).to_numpy(dtype=np.float64)
            keep = np.isnan(dg) | (gens >= dg)
            ids = ids[keep]
        return np.unique(ids)

    def _allowed_dates(self, date_ranges: dict) -> np.ndarray:
        """Doc ids inside EVERY [start, end) range (ranges AND together,
        matching engine.search's Spark-path predicate), via pyarrow
        min/max pushdown over the epoch-micros date sidecar. NULL dates
        (unparseable at ingest) never match — X5 skip semantics."""
        import pyarrow.dataset as pads

        if self._dates_ds is None:
            raise ValueError(
                "no date_index in this index dir — date-filtered queries "
                "need the Spark path (or a rebuild with date fields)"
            )
        names = set(self._dates_ds.schema.names)
        expr = None
        for col, (start, end) in date_ranges.items():
            cu = f"{col}_us"
            if cu not in names:
                raise ValueError(
                    f"date column {col!r} is not in the date sidecar — "
                    "use the Spark path"
                )
            e = pads.field(cu).is_valid()
            if start is not None:
                e = e & (pads.field(cu) >= _rfc3339_us(start, self.session_tz))
            if end is not None:
                e = e & (pads.field(cu) < _rfc3339_us(end, self.session_tz))
            expr = e if expr is None else (expr & e)
        if expr is None:
            raise ValueError("empty date_ranges")
        tbl = self._dates_ds.to_table(columns=["doc_id", "gen"], filter=expr)
        ids = tbl["doc_id"].to_numpy()
        gens = tbl["gen"].to_numpy()
        if self._deletes is not None and len(ids):
            dg = self._deletes.reindex(ids).to_numpy(dtype=np.float64)
            keep = np.isnan(dg) | (gens >= dg)
            ids = ids[keep]
        return np.unique(ids)

    # ------------------------------------------------------------- scoring

    def _leaf_parts(
        self, plan: QueryPlan, meta: dict, postings: dict
    ) -> list[tuple[np.ndarray, int, np.ndarray]]:
        """(doc_ids, leaf_id, scores) per live leaf — mirrors
        search._term_leaves_frame / _phrase_frame arithmetic exactly."""
        k1, b, avgdl = self.k1, self.b, self.avgdl
        parts = []
        for i, leaf in enumerate(plan.leaves):
            if leaf.synonym:
                part = self._synonym_part(leaf, meta, postings)
                if part is not None:
                    parts.append((part[0], i, part[1]))
                continue
            if any(t not in meta for t in leaf.terms):
                continue
            if leaf.is_phrase:
                ph = tuple(dict.fromkeys(leaf.terms)) if leaf.near else leaf.terms
                docs, tfp, dls = self._phrase_freq(ph, postings, slop=leaf.slop, near=leaf.near)
                if len(docs) == 0:
                    continue
                idf_sum = sum(meta[t]["idf"] for t in ph)
                score = idf_sum * _tf_norm(tfp, dls, avgdl, k1, b) * leaf.boost
                parts.append((docs, i, score))
            else:
                t = leaf.terms[0]
                p = postings.get(t)
                if p is None:
                    # every block of this term was MaxScore-pruned: no doc
                    # scored only by it can reach the top-k (rank-safe)
                    continue
                score = (
                    meta[t]["idf"]
                    * _tf_norm(p["tfs"], p["doc_lens"], avgdl, k1, b)
                    * leaf.boost
                )
                parts.append((p["doc_ids"], i, score))
        return parts

    def _synonym_part(self, leaf, meta: dict, postings: dict):
        """Lucene SynonymQuery blended scoring over decoded postings:
        idf from the group's MAX df, tf summed per doc across the
        group's member terms — numpy unique + bincount, no Python loop
        over docs. → (doc_ids, scores) or None when every member is
        absent. Mirrors search._synonym_leaves_frame exactly."""
        from .bm25 import idf_py

        group = [t for t in leaf.terms if t in meta]
        if not group:
            return None
        live = [t for t in group if postings.get(t) is not None]
        if not live:
            return None
        idf = idf_py(max(int(meta[t]["df"]) for t in group), self.n_docs)
        docs_c = np.concatenate([postings[t]["doc_ids"] for t in live])
        tfs_c = np.concatenate([postings[t]["tfs"] for t in live]).astype(np.float64)
        dls_c = np.concatenate([postings[t]["doc_lens"] for t in live]).astype(np.float64)
        uniq, first_idx, inv = np.unique(docs_c, return_index=True, return_inverse=True)
        tf_sum = np.bincount(inv, weights=tfs_c)
        dls = dls_c[first_idx]
        score = idf * _tf_norm(tf_sum, dls, self.avgdl, self.k1, self.b) * leaf.boost
        return uniq, score

    def _phrase_freq(self, terms: list[str], postings: dict, slop: int = 0, near: bool = False):
        """Adjacency-chain phrase tf per doc (pre-filter ordinals).

        Fully vectorized: (doc, pos) pairs are packed into uint64 keys
        (dense doc rank << 32 | pos) so the whole adjacency chain is a
        sequence of sorted-array intersections — no per-doc Python loop
        (the loop dominated phrase serving latency).

        ``slop`` > 0 switches to the ordered sloppy chain (same pinned
        semantics as search._sloppy_phrase_frame): over the packed keys,
        a searchsorted + running-max pass per term carries the latest
        possible chain start to each candidate end; the final span check
        also requires same-doc rank, so cross-doc carries (which the
        packing makes strictly smaller) can never produce a match.

        ``near`` switches to the UNORDERED span_near count (same pinned
        semantics as search._span_near_frame; caller passes de-duplicated
        terms): one merged-sorted sweep carrying each term's latest
        packed key; a window ending at key q is valid when every term
        has been seen and q − min(latest) ≤ slop + n − 1. A latest key
        from a previous doc differs in the rank bits, making the
        difference ≥ 2³² > window, so cross-doc state never matches."""
        empty = (np.empty(0, np.int64),) * 3

        def _ascending(a: np.ndarray) -> bool:
            return len(a) < 2 or bool(np.all(a[1:] > a[:-1]))

        def _member(sorted_ref: np.ndarray, vals: np.ndarray) -> np.ndarray:
            # membership of vals in a SORTED unique array via one binary
            # search — np.isin re-sorts both sides on every call
            pos = np.searchsorted(sorted_ref, vals)
            ok = pos < len(sorted_ref)
            ok[ok] = sorted_ref[pos[ok]] == vals[ok]
            return ok

        # dense rank domain over docs present for EVERY phrase term
        common = postings[terms[0]]["doc_ids"]
        common_sorted = _ascending(common)
        for t in terms[1:]:
            ids = postings[t]["doc_ids"]
            if common_sorted and _ascending(ids):
                common = common[_member(ids, common)]
            else:
                common = np.intersect1d(common, ids)
                common_sorted = True
        if len(common) == 0:
            return empty
        if not common_sorted:
            common = np.sort(common)

        def packed_keys(t: str) -> np.ndarray:
            p = postings[t]
            ids = p["doc_ids"]
            keep = _member(common, ids)
            if not keep.any():
                return np.empty(0, np.uint64)
            idx = np.flatnonzero(keep)
            flat_pos, offs = _segmented_gather(p["pos_flat"], p["pos_offsets"], idx)
            lens = offs[1:] - offs[:-1]
            ranks = np.searchsorted(common, ids[idx]).astype(np.uint64)
            return (np.repeat(ranks, lens) << np.uint64(32)) | flat_pos

        def sorted_keys(t: str) -> np.ndarray:
            # ascending doc ids + ascending in-doc positions make the
            # packed keys already sorted — skip the O(n log n) re-sort
            ks = packed_keys(t)
            if len(ks) > 1 and not bool(np.all(ks[1:] > ks[:-1])):
                ks = np.sort(ks)
            return ks

        if near:
            arrs = [sorted_keys(t) for t in terms]
            if any(len(a) == 0 for a in arrs):
                return empty
            merged = np.concatenate(arrs).astype(np.int64)
            tids = np.repeat(np.arange(len(arrs)), [len(a) for a in arrs])
            order = np.argsort(merged, kind="mergesort")
            merged, tids = merged[order], tids[order]
            big = np.iinfo(np.int64).max
            min_last = np.full(len(merged), big)
            seen_all = np.ones(len(merged), bool)
            for i in range(len(terms)):
                last = np.maximum.accumulate(np.where(tids == i, merged, -1))
                seen_all &= last >= 0
                min_last = np.minimum(min_last, np.where(last >= 0, last, big))
            w = np.int64(slop + len(terms) - 1)
            valid = seen_all & (merged - min_last <= w)
            if not valid.any():
                return empty
            keys = merged[valid].astype(np.uint64)
        elif slop:
            keys = sorted_keys(terms[0])
            starts = keys.copy()  # latest chain start per candidate end
            for t in terms[1:]:
                q = sorted_keys(t)
                if len(keys) == 0 or len(q) == 0:
                    return empty
                idx = np.searchsorted(keys, q, side="left")  # #predecessors < q
                runmax = np.maximum.accumulate(starts)
                valid = idx > 0
                keys = q[valid]
                starts = runmax[idx[valid] - 1]
            if len(keys) == 0:
                return empty
            max_span = np.uint64(slop + len(terms) - 1)
            ok = ((keys >> np.uint64(32)) == (starts >> np.uint64(32))) & (
                keys - starts <= max_span
            )
            keys = keys[ok]
            if len(keys) == 0:
                return empty
        else:
            keys = sorted_keys(terms[0])
            for t in terms[1:]:
                # pos+1 within the same doc: low 32 bits hold pos (< 2^32);
                # both sides sorted unique → binary-search intersection
                nxt = keys + np.uint64(1)
                keys = nxt[_member(sorted_keys(t), nxt)]
                if len(keys) == 0:
                    return empty
        ranks = (keys >> np.uint64(32)).astype(np.int64)
        hit_ranks, tfps = np.unique(ranks, return_counts=True)
        docs = common[hit_ranks]
        first = postings[terms[0]]
        order = np.argsort(first["doc_ids"], kind="mergesort")
        pos_in_first = order[
            np.searchsorted(first["doc_ids"][order], docs)
        ]
        dls = first["doc_lens"][pos_in_first]
        return docs.astype(np.int64), tfps.astype(np.int64), dls.astype(np.int64)

    # ------------------------------------------------- facet analytics

    def _prefix_counts(self) -> pd.DataFrame:
        """Sum the pre-rolled counts_index ledger → (prefix, count > 0),
        memoized per searcher (the ledger only grows via ingest, which
        swaps the searcher). The memo keeps serving O(|distinct
        prefixes|) even after many ingest batches have appended delta
        rows; compact() consolidates the ledger itself."""
        memo = getattr(self, "_prefix_counts_memo", None)
        if memo is not None:
            return memo
        import pyarrow.dataset as pads

        path = os.path.join(self.index_dir, "counts_index")
        if not os.path.isdir(path):
            raise ValueError(
                "no counts_index in this index dir — build through "
                "FuguSparkEngine with a facets column, or use the docs-scan path"
            )
        tbl = pads.dataset(path, format="parquet").to_table(columns=["prefix", "delta"])
        pdf = tbl.to_pandas().groupby("prefix", as_index=False)["delta"].sum()
        pdf = pdf[pdf["delta"] > 0].rename(columns={"delta": "count"})
        self._prefix_counts_memo = pdf.reset_index(drop=True)
        return self._prefix_counts_memo

    def facet_counts(self, root: str) -> pd.DataFrame:
        """Immediate-child counts under ``root`` (A1), value-identical to
        facets.facet_counts over the docs table."""
        pdf = self._prefix_counts()
        depth = len([p for p in root.split("/") if p]) + 1
        sel = pdf[
            pdf["prefix"].str.startswith(root + "/")
            & (pdf["prefix"].str.count("/") == depth)
        ]
        out = sel.rename(columns={"prefix": "child"}).sort_values("child")
        return out.reset_index(drop=True)

    def facet_tree_counts(self) -> pd.DataFrame:
        """All-prefix rollup counts (A3), value-identical to
        facets.facet_tree_counts over the docs table."""
        return self._prefix_counts().sort_values("prefix").reset_index(drop=True)

    def filter_values(self, path: str) -> pd.DataFrame:
        """Immediate child values of a facet path (A6) from the counts
        ledger — distinct sorted value names, no corpus scan."""
        pdf = self._prefix_counts()
        depth = len([p for p in path.split("/") if p]) + 1
        sel = pdf[
            pdf["prefix"].str.startswith(path + "/")
            & (pdf["prefix"].str.count("/") == depth)
        ]
        vals = sorted(p.rsplit("/", 1)[-1] for p in sel["prefix"] if p.rsplit("/", 1)[-1])
        return pd.DataFrame({"value": vals})

    def suggest(self, prefix: str, n: int = 10) -> pd.DataFrame:
        """Autocomplete from the persisted suggest_index (D6): byte-range
        prefix pushdown on the lowercase column + exact re-check,
        generation delete-masking, count-ranked top-n — value-identical
        to the engine's query_index scan."""
        import pyarrow.dataset as pads

        path = os.path.join(self.index_dir, "suggest_index")
        if not os.path.isdir(path):
            raise ValueError("no suggest_index in this index dir — rebuild (0.4.0+)")
        low = prefix.lower()
        expr = pads.field("s_lower") >= low
        ub = _prefix_upper_bound(low)
        if ub is not None:
            expr = expr & (pads.field("s_lower") < ub)
        tbl = pads.dataset(path, format="parquet").to_table(
            columns=["doc_id", "suggestion", "s_lower", "gen"], filter=expr
        )
        pdf = tbl.to_pandas()
        pdf = pdf[pdf["s_lower"].str.startswith(low)]
        if self._deletes is not None and len(pdf):
            dg = self._deletes.reindex(pdf["doc_id"].to_numpy()).to_numpy(dtype=np.float64)
            pdf = pdf[np.isnan(dg) | (pdf["gen"].to_numpy() >= dg)]
        out = (
            pdf.groupby("suggestion", as_index=False)
            .agg(count=("doc_id", "size"))
            .sort_values(["count", "suggestion"], ascending=[False, True])
            .head(n)
        )
        return out.reset_index(drop=True)

    def get_docs(self, ids: list[int]) -> pd.DataFrame:
        """Stored-doc fetch from the doc_store sidecar: doc_id IN-filter
        pushes to the range-partitioned parquet (row-group pruning), then
        per-doc latest LIVE generation wins (upsert + delete masking).
        The serving half of get() / include_data hydration."""
        import pyarrow.dataset as pads

        path = os.path.join(self.index_dir, "doc_store")
        if not os.path.isdir(path):
            raise ValueError("no doc_store in this index dir — rebuild (0.4.0+)")
        if not ids:
            return pd.DataFrame()
        tbl = pads.dataset(path, format="parquet").to_table(
            filter=pads.field("_doc_key").isin([int(i) for i in ids])
        )
        pdf = tbl.to_pandas()
        if not len(pdf):
            return pdf
        # latest generation per doc — whole-ROW select (groupby().last()
        # would take the last NON-NULL per column, mixing generations
        # when the newer version holds nulls)
        pdf = pdf.loc[pdf.groupby("_doc_key")["_gen"].idxmax()]
        if self._deletes is not None and len(pdf):
            dg = self._deletes.reindex(pdf["_doc_key"].to_numpy()).to_numpy(dtype=np.float64)
            pdf = pdf[np.isnan(dg) | (pdf["_gen"].to_numpy() >= dg)]
        return pdf.drop(columns=["_gen", "_doc_key"]).reset_index(drop=True)

    # ------------------------------------------------------------- search

    def search_pinned(
        self,
        ids: list[int] | tuple[int, ...],
        query_text,
        k: int = 10,
        **kwargs,
    ) -> pd.DataFrame:
        """ES `pinned` query on the serving path: the listed ids lead in
        the order given (deterministic 1e9 − position score ladder —
        same pinned divergence as resultops.pinned, rank/score parity
        pinned in tests), then the organic top-(k − pins) with pinned
        docs deduped out. Fetches k organic rows (the worst case is
        every pin also ranking organically), so cost is one ordinary
        bounded search plus O(k) pandas work."""
        if not ids:
            raise ValueError("pinned requires at least one id")
        if len(set(ids)) != len(ids):
            raise ValueError("duplicate ids in pinned list")
        pin = pd.DataFrame(
            {"doc_id": [int(d) for d in ids],
             "score": [1e9 - i for i in range(len(ids))]}
        )
        head = pin.head(k)
        n_tail = k - len(head)
        if n_tail <= 0:
            return head.reset_index(drop=True)
        org = self.search(query_text, k=k, **kwargs)
        tail = org[~org["doc_id"].isin(set(pin["doc_id"]))].head(n_tail)
        out = pd.concat([head, tail], ignore_index=True)
        return out

    def search(
        self,
        query_text: str | None,
        k: int = 10,
        offset: int = 0,
        max_postings: int | None = None,
        filters: list | None = None,
        date_ranges: dict | None = None,
        min_should_match: int = 0,
        synonyms: dict | None = None,
        search_after: tuple | None = None,
    ) -> pd.DataFrame:
        """Top-k → pandas DataFrame(doc_id, score); identical ranks/scores
        to search_segments for locally-servable queries.

        ``max_postings`` caps the total posting volume (Σ df over the query
        terms) this searcher will materialize on one machine; a query over
        hot terms (`the`, `if`, `return` at 10^12 docs) raises instead of
        OOMing the driver — callers fall back to the distributed engine.
        ``min_should_match`` mirrors search.execute_plan's Lucene gate
        (top-level boolean; msm ≥ 2 disables the MaxScore block prune —
        the filtered θ is not rank-safe — conjunctive pruning stays).
        ``search_after`` — (score, doc_id) relevance cursor (ES
        search_after): the next k strictly after the cursor; page-depth-
        independent cost, must equal offset paging (pinned in tests).
        Disables the MaxScore prune (the cursor's rank is unknown, so a
        k-seeded θ over-prunes); conjunctive pruning stays.
        """
        if search_after is not None and offset:
            raise ValueError("search_after and offset are mutually exclusive")
        if self.as_of is not None and (filters or date_ranges):
            raise ValueError(
                "filters/date_ranges are not generation-pinned (the sidecar "
                "indexes read live rows) — run point-in-time queries bare"
            )
        if isinstance(query_text, dict):
            # structured-DSL query (fugu_spark.dsl — the only spelling
            # for span_near etc.) compiles onto the same plan shapes
            from .dsl import compile_query

            plan = compile_query(query_text, mode=self.mode)
        else:
            plan = parse_query(query_text, mode=self.mode)
        if any(l.prefix_last or l.regex for l in plan.leaves):
            # prefix leaves ('term*', '"a b"*') and regex leaves
            # ('/pat/') serve locally: expansion is a [prefix, successor)
            # byte-range read of the range-clustered dictionary —
            # O(matching row groups) at any vocab size (regex prunes by
            # its literal prefix) — and the expanded plan is an ordinary
            # OR-group
            from .queryparse import expand_plan

            plan = expand_plan(plan, self._prefix_expander())
        if any(l.fuzzy or l.rng is not None for l in plan.leaves):
            # fuzzy expansion (O(vocab) Levenshtein scan) and
            # lexicographic-range decode stay on the Spark path, where
            # they run as distributed dictionary/segment scans
            raise ValueError(
                "fuzzy/range query leaves are not locally servable — "
                "route to search_segments"
            )
        if synonyms:
            from .queryparse import apply_synonyms

            plan = apply_synonyms(plan, synonyms, mode=self.mode)
        return self._execute_local(
            plan, k, offset, max_postings, filters, date_ranges,
            min_should_match=min_should_match, search_after=search_after,
        )

    def _execute_local(
        self,
        plan,
        k: int,
        offset: int = 0,
        max_postings: int | None = None,
        filters: list | None = None,
        date_ranges: dict | None = None,
        min_should_match: int = 0,
        search_after: tuple | None = None,
    ) -> pd.DataFrame:
        """Serve an already-parsed (and expanded) plan — the shared body
        behind ``search`` and plan-constructing callers (MLT)."""
        allowed = self._allowed_docs(filters) if filters else None
        if date_ranges:
            dallowed = self._allowed_dates(date_ranges)
            allowed = dallowed if allowed is None else np.intersect1d(allowed, dallowed)
        if allowed is not None and len(allowed) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        msm = max(0, int(min_should_match))
        if plan.root is not None:
            return self._search_nested(
                plan, k, offset, max_postings, allowed, msm=msm,
                search_after=search_after,
            )
        musts, must_nots = set(plan.musts), set(plan.must_nots)
        should_ids = sorted(set(range(len(plan.leaves))) - musts - must_nots)
        if msm and not plan.is_all and msm > len(should_ids):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        if plan.is_all or not any(
            i not in must_nots for i in range(len(plan.leaves))
        ):
            raise ValueError(
                "AllQuery / NOT-only queries need the docs table — use search_segments"
            )
        all_terms = plan.all_terms()
        meta = self.term_meta(all_terms)
        if max_postings is not None:
            volume = sum(m["df"] for m in meta.values())
            if volume > max_postings:
                raise ValueError(
                    f"query posting volume {volume} exceeds the driver-side "
                    f"serve cap {max_postings} — route to search_segments"
                )
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
        # a Must leaf on an absent term means nothing can match (synonym
        # groups: members are alternatives — dead only when ALL absent)
        for i, leaf in enumerate(plan.leaves):
            dead = (
                all(t not in meta for t in leaf.terms)
                if leaf.synonym
                else any(t not in meta for t in leaf.terms)
            )
            if i in musts and dead:
                return empty
        live_leaf_ids = {
            i
            for i, l in enumerate(plan.leaves)
            if (
                any(t in meta for t in l.terms)
                if l.synonym
                else all(t in meta for t in l.terms)
            )
        }
        if not (live_leaf_ids - must_nots):
            return empty

        pure_or = all(
            l.occur == "should" and not l.is_phrase and not l.synonym
            for l in plan.leaves
        ) and len(plan.leaves) > 0
        need_pos = any(l.is_phrase for l in plan.leaves)
        live_terms = sorted({t for i in live_leaf_ids | must_nots for t in plan.leaves[i].terms if t in meta})

        if (
            pure_or
            and allowed is None  # a filter shrinks true top-k scores below
            # the unfiltered θ seed, so MaxScore pruning is not rank-safe
            and msm <= 1  # same reason: msm >= 2 filters the matched set
            and search_after is None  # cursor rank unknown → θ over-prunes
            and len({l.terms[0] for l in plan.leaves if l.terms[0] in meta}) > 1
        ):
            need_pos = False
            # θ must cover the full requested window: docs ranked in
            # (k, k+offset] live only in blocks a k-seeded θ would prune
            prune = lambda rows: self._prune_blocks_maxscore(rows, plan, meta, k + offset)
        else:
            prune = lambda rows: self._prune_blocks_conjunctive(rows, plan, meta)
        postings = self._postings_cached(live_terms, meta, need_pos, prune)
        parts = self._leaf_parts(plan, meta, postings)
        if not parts:
            return empty
        # combine on raw numpy arrays (lexsort + masks); ONLY the float
        # group-sum stays on the pandas kernel so the accumulation
        # (order AND compensation) is bit-identical to the r5 path —
        # rank/score identity with search_segments is pinned in tests
        if (
            len(parts) == 1
            and not musts
            and not must_nots
            and msm <= 1
            and len(parts[0][0])
            and bool(np.all(parts[0][0][1:] > parts[0][0][:-1]))
        ):
            # single live leaf over strictly-ascending (single-generation)
            # doc ids: every doc appears once — the group-sum is identity
            uniq_d = np.asarray(parts[0][0], dtype=np.int64)
            sums = np.asarray(parts[0][2], dtype=np.float64)
        elif all(
            len(p[0]) == 0 or bool(np.all(p[0][1:] > p[0][:-1])) for p in parts
        ):
            # every leaf's doc ids strictly ascend (single-generation
            # postings — the common case): the leaf-major concat order
            # already visits each doc's rows in ascending leaf_id with at
            # most one row per leaf, i.e. exactly the (doc, leaf, score)
            # fold order — so skip the global 3-key lexsort and group by
            # hash factorization; the float group-sum stays on the same
            # pandas kernel, so each doc's addend sequence is unchanged
            d = np.concatenate([p[0] for p in parts]).astype(np.int64, copy=False)
            s = np.concatenate([p[2] for p in parts]).astype(np.float64, copy=False)
            codes, uniq_d = pd.factorize(d)
            n_uniq = len(uniq_d)
            spans = np.concatenate([[0], np.cumsum([len(p[0]) for p in parts])])
            if must_nots:
                pos_mask = np.ones(len(d), dtype=bool)
                for j, p in enumerate(parts):
                    if p[1] in must_nots:
                        pos_mask[spans[j] : spans[j + 1]] = False
                cp, sp = codes[pos_mask], s[pos_mask]
                excl_docs = np.bincount(codes[~pos_mask], minlength=n_uniq) > 0
            else:
                cp, sp = codes, s
                excl_docs = None
            # group by the factorized codes directly (Categorical carries
            # them, so groupby skips a second hash factorization); with
            # observed=False the result is dense over 0..n_uniq-1, already
            # aligned to uniq_d — same Cython group-sum kernel, same
            # row-order accumulation, empty groups are 0.0 and masked off
            cat = pd.Categorical.from_codes(cp, categories=pd.RangeIndex(n_uniq))
            sums = pd.Series(sp).groupby(cat, observed=False).sum().to_numpy()
            keep = np.bincount(cp, minlength=n_uniq) > 0
            if musts:
                mm = np.zeros(len(d), dtype=bool)
                for j, p in enumerate(parts):
                    if p[1] in musts:
                        mm[spans[j] : spans[j + 1]] = True
                keep &= np.bincount(codes[mm], minlength=n_uniq) == len(musts)
            if excl_docs is not None:
                keep &= ~excl_docs
            if msm > 0:
                sm = np.zeros(len(d), dtype=bool)
                shoulds = set(should_ids)
                for j, p in enumerate(parts):
                    if p[1] in shoulds:
                        sm[spans[j] : spans[j + 1]] = True
                keep &= np.bincount(codes[sm], minlength=n_uniq) >= msm
            if not keep.all():
                uniq_d, sums = uniq_d[keep], sums[keep]
        else:
            d = np.concatenate([p[0] for p in parts]).astype(np.int64, copy=False)
            l = np.concatenate(
                [np.full(len(p[0]), p[1], dtype=np.int64) for p in parts]
            )
            s = np.concatenate([p[2] for p in parts]).astype(np.float64, copy=False)
            # deterministic fold order, as in _combine_frames: (leaf_id, score)
            order = np.lexsort((s, l, d))
            d, l, s = d[order], l[order], s[order]
            if must_nots:
                mn_mask = np.isin(l, sorted(must_nots))
                excl_docs = np.unique(d[mn_mask])
                dp, sp = d[~mn_mask], s[~mn_mask]
            else:
                excl_docs = np.array([], dtype=np.int64)
                dp, sp = d, s
            scores = pd.Series(sp).groupby(dp, sort=False).sum()
            uniq_d = scores.index.to_numpy()
            sums = scores.to_numpy()
            keep = np.ones(len(uniq_d), dtype=bool)
            if musts:
                mm = np.isin(l, sorted(musts))
                dm, lm = d[mm], l[mm]
                if len(dm):
                    # distinct (doc, leaf) pairs: adjacent dedupe on the
                    # (d, l)-sorted rows, then per-doc boundary counts
                    up = np.concatenate(
                        [[True], (dm[1:] != dm[:-1]) | (lm[1:] != lm[:-1])]
                    )
                    dmu = dm[up]
                    db = np.concatenate([[True], dmu[1:] != dmu[:-1]])
                    cnts = np.diff(np.append(np.flatnonzero(db), len(dmu)))
                    ok_docs = dmu[db][cnts == len(musts)]
                else:
                    ok_docs = np.empty(0, dtype=np.int64)
                keep &= np.isin(uniq_d, ok_docs)
            if len(excl_docs):
                keep &= ~np.isin(uniq_d, excl_docs)
            if msm > 0:
                sm = np.isin(l, should_ids)
                ds_, ls_ = d[sm], l[sm]
                if len(ds_):
                    up = np.concatenate(
                        [[True], (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])]
                    )
                    dsu = ds_[up]
                    db = np.concatenate([[True], dsu[1:] != dsu[:-1]])
                    cnts = np.diff(np.append(np.flatnonzero(db), len(dsu)))
                    msm_docs = dsu[db][cnts >= msm]
                else:
                    msm_docs = np.empty(0, dtype=np.int64)
                keep &= np.isin(uniq_d, msm_docs)
            if not keep.all():
                uniq_d, sums = uniq_d[keep], sums[keep]
        if allowed is not None:
            amask = np.isin(uniq_d, allowed)
            uniq_d, sums = uniq_d[amask], sums[amask]
        if search_after is not None:
            sa_s, sa_d = float(search_after[0]), int(search_after[1])
            cmask = (sums < sa_s) | ((sums == sa_s) & (uniq_d > sa_d))
            uniq_d, sums = uniq_d[cmask], sums[cmask]
        m = offset + k
        if 0 < 4 * m < len(sums):
            # exact top-m via argpartition + tie-complete re-sort: every
            # doc at or above the m-th score competes, so the (score
            # DESC, doc_id ASC) order of the first m entries is identical
            # to a full sort
            part = np.argpartition(-sums, m - 1)[:m]
            thr = sums[part].min()
            cand = np.flatnonzero(sums >= thr)
            sel = cand[np.lexsort((uniq_d[cand], -sums[cand]))][offset : offset + k]
        else:
            sel = np.lexsort((uniq_d, -sums))[offset : offset + k]
        return pd.DataFrame(
            {"doc_id": uniq_d[sel], "score": sums[sel]}
        )

    def more_like_this(
        self,
        seed_doc_id: int,
        max_terms: int = 10,
        k: int = 10,
        text_col: str = "text",
        max_postings: int | None = None,
    ) -> pd.DataFrame:
        """MoreLikeThis at serving latency (the distributed analog is
        resultops.more_like_this): seed text from the doc_store sidecar,
        tokenized driver-side with the index's analyzer; terms ranked by
        seed-tf × idf via ONE dictionary probe; the top ``max_terms``
        served as an OR plan through the standard local pipeline, seed
        excluded → pandas DataFrame(doc_id, score)."""
        from collections import Counter

        from .queryparse import Leaf, QueryPlan
        from .tokenizer import tokenize_py

        pdf = self.get_docs([seed_doc_id])
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
        if not len(pdf):
            return empty
        if text_col not in pdf.columns:
            raise ValueError(
                f"doc_store has no column {text_col!r} (columns: {list(pdf.columns)})"
            )
        tf = Counter(t for t, _pos in tokenize_py(str(pdf[text_col].iloc[0]), self.mode))
        meta = self.term_meta(list(tf))
        ranked = sorted(
            ((t, tf[t] * meta[t]["idf"]) for t in meta),
            key=lambda x: (-x[1], x[0]),
        )[:max_terms]
        if not ranked:
            return empty
        plan = QueryPlan(leaves=[Leaf(terms=(t,)) for t, _w in ranked])
        # over-fetch by one: the seed itself usually ranks first
        out = self._execute_local(plan, k=k + 1, max_postings=max_postings)
        out = out[out["doc_id"] != seed_doc_id].head(k)
        return out.reset_index(drop=True)

    def grouped_topk(
        self,
        query_text: str | None,
        facet_root: str,
        k_per_group: int = 3,
        max_postings: int | None = None,
    ) -> pd.DataFrame:
        """Field collapsing at serving latency (distributed analog:
        resultops.grouped_topk), grouped by a FACET: top ``k_per_group``
        hits per child value of ``facet_root`` (e.g. 'lang') → pandas
        DataFrame(group, doc_id, score, rank_in_group).

        Group membership comes from the filter_index sidecar (the
        ledger enumerates values, the index restricts docs) — no doc
        fetches, no corpus scan; the decoded-postings LRU makes the
        per-value passes share one decode of the query's terms."""
        root = "/" + facet_root.strip("/")
        frames = []
        for v in self.filter_values(root)["value"]:
            pdf = self.search(
                query_text,
                k=k_per_group,
                max_postings=max_postings,
                filters=[f"{root}/{v}"],
            )
            if len(pdf):
                pdf = pdf.assign(
                    group=v, rank_in_group=range(1, len(pdf) + 1)
                )
                frames.append(pdf[["group", "doc_id", "score", "rank_in_group"]])
        if not frames:
            return pd.DataFrame({"group": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64"),
                                 "rank_in_group": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    def count(
        self,
        query_text: str | None,
        max_postings: int | None = None,
        filters: list | None = None,
        date_ranges: dict | None = None,
    ) -> int:
        """Exact hit count without top-k (Lucene TotalHitCountCollector;
        distributed analog: resultops.match_count). Runs the search
        pipeline with an unreachable k: the MaxScore θ-seed never
        engages (`len(scores) < k` → no block skipped), so the matched
        set is exact; conjunctive block pruning remains active — it is
        SET-safe (only skips blocks that cannot satisfy every Must).
        Cost is O(matched postings), the same volume `max_postings`
        already caps for serving."""
        out = self.search(
            query_text,
            k=1 << 40,
            max_postings=max_postings,
            filters=filters,
            date_ranges=date_ranges,
        )
        return int(len(out))

    def _search_nested(
        self,
        plan: QueryPlan,
        k: int,
        offset: int,
        max_postings: int | None,
        allowed: np.ndarray | None = None,
        msm: int = 0,
        search_after: tuple | None = None,
    ) -> pd.DataFrame:
        """Nested boolean serving: pandas mirror of search._execute_node
        (same child order, same f64 arithmetic shape → identical scores);
        ``msm`` applies at the root level only, as in _execute_node."""
        if not plan.has_positive():
            raise ValueError(
                "NOT-only queries need the docs table — use search_segments"
            )
        meta = self.term_meta(plan.all_terms())
        if max_postings is not None:
            volume = sum(m["df"] for m in meta.values())
            if volume > max_postings:
                raise ValueError(
                    f"query posting volume {volume} exceeds the driver-side "
                    f"serve cap {max_postings} — route to search_segments"
                )
        need_pos = any(l.is_phrase for l in plan.leaves)
        live_terms = sorted(t for t in plan.all_terms() if t in meta)
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
        if not live_terms:
            return empty
        postings = self._postings_cached(
            live_terms,
            meta,
            need_pos,
            lambda rows: self._prune_blocks_conjunctive(rows, plan, meta),
        )
        base = self._eval_node(plan.root, meta, postings, msm=msm)
        if base is None or not len(base):
            return empty
        if allowed is not None:
            base = base[base.index.isin(allowed)]
            if not len(base):
                return empty
        out = base.reset_index()
        out.columns = ["doc_id", "score"]
        out = _apply_cursor(out, search_after)
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[offset : offset + k]
        return out.reset_index(drop=True)

    def _eval_node(self, node, meta: dict, postings: dict, msm: int = 0) -> pd.Series | None:
        """→ Series(score, index=doc_id) of matching docs; None = dead
        node (absent term). Mirrors search._execute_node exactly,
        including the root-level ``msm`` gate (recursion passes 0)."""
        from .queryparse import Leaf

        k1, b, avgdl = self.k1, self.b, self.avgdl
        if isinstance(node, Leaf):
            if node.synonym:
                part = self._synonym_part(node, meta, postings)
                if part is None:
                    return None
                return pd.Series(part[1], index=part[0], dtype="float64")
            if any(t not in meta for t in node.terms):
                return None
            if node.is_phrase:
                ph = tuple(dict.fromkeys(node.terms)) if node.near else node.terms
                docs, tfp, dls = self._phrase_freq(ph, postings, slop=node.slop, near=node.near)
                idf_sum = sum(meta[t]["idf"] for t in ph)
                s = idf_sum * _tf_norm(tfp, dls, avgdl, k1, b) * node.boost
                return pd.Series(s, index=docs, dtype="float64")
            t = node.terms[0]
            p = postings.get(t)
            if p is None:
                return None
            s = meta[t]["idf"] * _tf_norm(p["tfs"], p["doc_lens"], avgdl, k1, b) * node.boost
            return pd.Series(s, index=p["doc_ids"], dtype="float64")

        musts, shoulds, nots = [], [], []
        for occ, child in node.children:
            f = self._eval_node(child, meta, postings)
            if occ == "must":
                if f is None:
                    return pd.Series(dtype="float64")
                musts.append(f)
            elif occ == "must_not":
                if f is not None and len(f):
                    nots.append(f)
            elif f is not None:
                shoulds.append(f)

        if msm > len(shoulds):
            # Lucene: minShouldMatch above the live optional count → no
            # docs match (dead children are excluded, like null scorers)
            return pd.Series(dtype="float64")

        if musts:
            base = musts[0]
            for f in musts[1:]:
                idx = base.index.intersection(f.index)
                base = base.loc[idx] + f.loc[idx]
            if shoulds and len(base):
                opt = pd.Series(0.0, index=base.index)
                cnt = np.zeros(len(base), dtype=np.int64)
                for f in shoulds:  # child order == Spark's sorted _ci fold
                    opt = opt + f.reindex(base.index, fill_value=0.0)
                    if msm > 0:
                        cnt += base.index.isin(f.index)
                base = base + opt
                if msm > 0:
                    base = base[cnt >= msm]
        elif shoulds:
            base = shoulds[0]
            for f in shoulds[1:]:
                base = base.add(f, fill_value=0.0)
            if msm > 0:
                cnt = pd.Series(0, index=base.index, dtype="int64")
                for f in shoulds:
                    cnt[cnt.index.isin(f.index)] += 1
                base = base[cnt >= msm]
        elif nots:
            raise ValueError(
                "NOT-only group needs the docs table — use search_segments"
            )
        else:
            return None
        for f in nots:
            base = base[~base.index.isin(f.index)]
        return base

    def _prune_blocks_conjunctive(
        self, rows: pd.DataFrame, plan: QueryPlan, meta: dict
    ) -> pd.DataFrame:
        """AND/phrase range skip: keep only blocks overlapping the rarest
        required term's merged doc-id intervals (rank-safe — a doc outside
        them cannot satisfy the conjunction)."""
        from .segment_search import conjunctive_anchor, merge_intervals

        anchor = conjunctive_anchor(plan, meta)
        if anchor is None or rows.empty:
            return rows
        a = rows[rows["term"] == anchor]
        if a.empty:
            return rows
        starts, ends = merge_intervals(
            a["min_doc_id"].to_numpy(np.int64), a["max_doc_id"].to_numpy(np.int64)
        )
        bmin = rows["min_doc_id"].to_numpy(np.int64)
        bmax = rows["max_doc_id"].to_numpy(np.int64)
        j = np.searchsorted(ends, bmin, side="left")
        ok = j < len(starts)
        ok[ok] = starts[j[ok]] <= bmax[ok]
        return rows[ok]

    def _prune_blocks_maxscore(
        self, rows: pd.DataFrame, plan: QueryPlan, meta: dict, k: int
    ) -> pd.DataFrame:
        """Rank-safe block-max skip for pure-OR: drop blocks that cannot
        reach the θ seeded by the strongest term's full scores."""
        k1, b, avgdl = self.k1, self.b, self.avgdl
        boosts: dict[str, float] = {}
        for leaf in plan.leaves:
            if leaf.terms[0] in meta:
                boosts[leaf.terms[0]] = boosts.get(leaf.terms[0], 0.0) + leaf.boost
        terms = list(boosts)
        if len(terms) < 2:
            return rows
        ub = {
            t: boosts[t]
            * meta[t]["idf"]
            * float(
                _tf_norm(
                    np.asarray([meta[t]["max_tf"]]),
                    np.asarray([meta[t]["min_doc_len"]]),
                    avgdl,
                    k1,
                    b,
                )[0]
            )
            for t in terms
        }
        seed = max(terms, key=lambda t: ub[t])
        seed_post = self._decode_rows(rows[rows["term"] == seed], need_pos=False)
        if seed not in seed_post:
            return rows
        # stash for _decode_with_seed: the seed is fully decoded here and
        # its blocks all survive the prune — don't decode them twice
        self._seed_postings = {seed: seed_post[seed]}
        p = seed_post[seed]
        s = boosts[seed] * meta[seed]["idf"] * _tf_norm(p["tfs"], p["doc_lens"], avgdl, k1, b)
        if len(s) < k:
            return rows
        theta = float(np.partition(s, -k)[-k])
        other_ub = {t: sum(ub[u] for u in terms if u != t) for t in terms}
        blk_tfn = _tf_norm(
            rows["max_tf"].to_numpy(np.int64), rows["min_doc_len"].to_numpy(np.int64), avgdl, k1, b
        )
        idf_b = rows["term"].map({t: boosts[t] * meta[t]["idf"] for t in terms}).to_numpy(np.float64)
        oub = rows["term"].map(other_ub).to_numpy(np.float64)
        keep = (rows["term"] == seed).to_numpy() | (idf_b * blk_tfn + oub >= theta)
        return rows[keep]
