"""Zoekt-style trigram index: substring + regex search without a scan.

The grep family (analytics/codesearch.py) answers raw-pattern queries
with a full-corpus scan — the right tool once, the wrong tool for a
query service. Google Code Search and Zoekt solve the same problem with
a TRIGRAM posting index (R. Cox, "Regular Expression Matching with a
Trigram Index", 2012 — public write-up of the codesearch design): every
document is indexed by its distinct character 3-grams; a query's
pattern is analyzed into trigrams that every match MUST contain; the
index intersects those posting lists into a candidate set; only the
candidates are fetched and verified with the real matcher. I/O becomes
proportional to the rarest required trigram's document frequency
instead of corpus size.

Reference anchor: the reference serves raw source-code search through
full Tantivy scans of stored content (src/db/search.rs); at the
north-star scale (10^12 files) a per-query scan is not servable, so
this module is the scale path for the same query shape.

Scale design:
- **Build** is two narrow JVM stages: a higher-order-function trigram
  extraction (``transform(sequence(...))`` + ``array_distinct`` —
  whole-stage codegen, zero Python) and ONE groupBy shuffle keyed on
  ``(tri, shard)``. The shard key (``doc_id // shard_docs``) bounds
  every posting row to ``shard_docs`` ids, so a universal trigram
  (``"def"`` appears in every source file) cannot hot-key a task at
  10^12 docs — the same skew treatment the segment builder applies to
  hot terms (segments.py:307).
- **Storage** is a range-clustered parquet sidecar ``trigram_index/``
  ``(tri_code, shard, df, doc_ids array<long>)`` sorted by
  ``(tri_code, shard)`` — identical layout contract to the term
  dictionary and filter/date sidecars, so both Spark (predicate
  pushdown) and the pyarrow serving path (row-group min/max pruning)
  read only the row groups whose code range matches the query's
  trigrams. A trigram is stored as its packed 63-bit codepoint triple
  (``pack_trigram``), never as a string — fixed-width comparisons in
  the scan, no string materialization anywhere in the build (Zoekt
  stores integer trigrams for the same reason).
- **Query** reads only the required trigrams' rows, intersects via one
  groupBy (candidate = doc carrying ALL required trigram groups), and
  verifies only candidates against the raw text. Verification joins the
  candidate set to the docs table — at selective patterns AQE turns
  this into a broadcast join; the scan side prunes to (id, text).

Pattern analysis is conservative by construction: anything the
analyzer cannot prove required contributes nothing, and a pattern with
no extractable trigram falls back to the full scan (loudly — the
caller sees ``required == []``). A false candidate costs one doc
verification; a missed required trigram would lose matches, so every
rule errs toward "not required".
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

try:  # Python 3.11+: sre_parse lives at re._parser (same public behavior)
    from re import _parser as _sre
except ImportError:  # pragma: no cover
    import sre_parse as _sre

import re

TRIGRAM_DIR = "trigram_index"
DEFAULT_SHARD_DOCS = 1 << 20  # ids per posting row: bounds task + row size
_CHUNK_CHARS = 6_000_000  # kernel chunk: keeps the dedup sort cache-hot


# ---------------------------------------------------------------------------
# pattern analysis → required trigram groups
# ---------------------------------------------------------------------------
# A "group" is a frozenset of trigram alternates; a matching document
# must contain at least one member of EVERY group (AND of ORs). Exact
# substring search yields singleton groups; case-insensitive search
# yields case-variant groups; regex alternation yields the trigrams
# required by every branch.


def _case_variants(tri: str) -> frozenset[str] | None:
    """All case spellings of an ASCII trigram (≤ 8); None when the
    trigram has cased non-ASCII letters (full Unicode folding is not
    worth the correctness risk — the caller drops the group, which is
    conservative: fewer required groups, more candidates, same answer)."""
    opts: list[list[str]] = []
    for ch in tri:
        lo, up = ch.lower(), ch.upper()
        if lo != up and (
            len(lo) > 1 or len(up) > 1 or ord(lo) > 127 or ord(up) > 127
        ):
            return None
        opts.append([lo] if lo == up else [lo, up])
    out = {""}
    for o in opts:
        out = {p + c for p in out for c in o}
    return frozenset(out)


def substring_required(s: str, ignore_case: bool = False) -> list[frozenset[str]]:
    """Trigram groups every document containing ``s`` must contain.

    len(s) < 3 → [] (no trigram exists; caller must full-scan)."""
    groups: list[frozenset[str]] = []
    seen: set[frozenset[str]] = set()
    for i in range(len(s) - 2):
        tri = s[i : i + 3]
        g = _case_variants(tri) if ignore_case else frozenset([tri])
        if g is None or g in seen:
            continue
        seen.add(g)
        groups.append(g)
    return groups


def _branch_required(branches, flags: int) -> list[frozenset[str]]:
    """Required groups of an alternation = the trigrams required by
    EVERY branch (a match takes one branch; only factors common to all
    branches are certain). Compared as sets of groups."""
    per = [_walk_required(b, flags) for b in branches]
    if not per:
        return []
    common = set(per[0])
    for p in per[1:]:
        common &= set(p)
    return sorted(common, key=sorted)


def _walk_required(tokens, flags: int) -> list[frozenset[str]]:
    """Walk one parsed-regex token sequence, returning required trigram
    groups. Maintains the current contiguous literal run; any token that
    can consume variable/uncertain text breaks the run. SUBPATTERN with
    unchanged flags and {1,1} repeats are inlined so ``(abc)def`` keeps
    one 6-char run."""
    ic = bool(flags & re.IGNORECASE)
    groups: list[frozenset[str]] = []
    run: list[str] = []

    def flush() -> None:
        if len(run) >= 3:
            groups.extend(substring_required("".join(run), ignore_case=ic))
        run.clear()

    for op, av in tokens:
        name = str(op)
        if name == "LITERAL":
            run.append(chr(av))
        elif name == "SUBPATTERN":
            _gid, add_f, del_f, subp = av
            if add_f or del_f:  # scoped flag change: stay conservative
                flush()
                continue
            # inline: extend the surrounding run through the group so
            # (abc)def keeps one contiguous 6-char literal run
            for j, t in enumerate(subp):
                if str(t[0]) == "LITERAL":
                    run.append(chr(t[1]))
                else:
                    flush()
                    groups.extend(_walk_required(list(subp)[j:], flags))
                    break
        elif name in ("MAX_REPEAT", "MIN_REPEAT"):
            lo, _hi, subp = av
            flush()
            if lo >= 1:  # occurs at least once → its factors are required
                groups.extend(_walk_required(subp, flags))
        elif name == "BRANCH":
            flush()
            groups.extend(_branch_required(av[1], flags))
        elif name == "AT":
            # anchors consume nothing; the run survives (^abc still
            # requires "abc") — but a word-boundary style anchor also
            # consumes nothing, so no flush needed either way
            continue
        elif name == "ASSERT":
            # positive lookaround asserts its pattern matches inside the
            # document, so its factors ARE present — but it consumes no
            # text, so the surrounding run must still break only if we
            # recurse; keep the run, harvest the assertion separately
            flush()
            groups.extend(_walk_required(av[1], flags))
        else:
            # ANY, IN, NOT_LITERAL, ASSERT_NOT, GROUPREF, …: uncertain
            flush()
    flush()
    # dedupe, preserve order
    out, seen = [], set()
    for g in groups:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def regex_required(pattern: str) -> list[frozenset[str]]:
    """Trigram groups every string containing a match of ``pattern``
    must contain. [] when nothing is provably required (caller must
    full-scan) or when the pattern does not parse as a Python regex
    (Java-only syntax — the verifier engine differs, so no prefilter)."""
    try:
        parsed = _sre.parse(pattern)
    except Exception:
        return []
    flags = parsed.state.flags if hasattr(parsed, "state") else 0
    return _walk_required(list(parsed), flags)


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def doc_trigram_rows_sql(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(tri, doc_id) via pure JVM expressions — the semantic REFERENCE
    implementation (sequence/transform/array_distinct/explode). Correct
    and shuffle-free, but each position materializes a String object;
    the Arrow kernel below is ~10× faster and parity-pinned against
    this in tests."""
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, so docs shorter
    # than 3 chars must short-circuit to an empty array, not rely on an
    # empty sequence
    tris = F.expr(
        f"case when length({text_col}) >= 3 then"
        f" array_distinct(transform(sequence(1, length({text_col}) - 2),"
        f" i -> substring({text_col}, i, 3)))"
        f" else array() end"
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.explode(tris).alias("tri")
    )


def _trigram_kernel(ids: np.ndarray, texts: "pd.Series") -> pd.DataFrame:
    """Vectorized distinct-trigram extraction for one Arrow batch.

    No per-row Python: every text in the batch is decoded to one flat
    uint32 codepoint array (utf-32), docs separated by two sentinel
    codepoints (> 0x10FFFF, so no real trigram spans a boundary); the
    window mask and the packed 63-bit trigram codes are computed with
    three 1-D gathers; (doc, code) pairs are deduplicated with ONE
    lexsort + neighbor-diff (doc index is already nondecreasing, so the
    stable int radix sorts stay near-linear — a structured-dtype
    np.unique here measured 7× slower)."""
    if len(texts) == 0:
        return pd.DataFrame(
            {"doc_id": np.empty(0, np.int64), "tri_code": np.empty(0, np.int64)}
        )
    SENT = np.uint32(0x110000)
    parts: list[np.ndarray] = []
    bounds = np.empty(len(texts) + 1, dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):  # assembly loop: O(docs), not O(chars)
        bounds[i] = pos
        cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4")
        parts.append(cp)
        parts.append(np.array([SENT, SENT], dtype=np.uint32))
        pos += len(cp) + 2
    bounds[-1] = pos
    flat = np.concatenate(parts)
    if flat.size < 3:
        return pd.DataFrame(
            {"doc_id": np.empty(0, np.int64), "tri_code": np.empty(0, np.int64)}
        )
    real = flat < SENT
    ok = real[:-2] & real[1:-1] & real[2:]
    idx = np.nonzero(ok)[0]
    doc_ix = np.searchsorted(bounds, idx, side="right") - 1
    packed = (
        (flat[idx].astype(np.uint64) << np.uint64(42))
        | (flat[idx + 1].astype(np.uint64) << np.uint64(21))
        | flat[idx + 2].astype(np.uint64)
    ).view(np.int64)
    order = np.lexsort((packed, doc_ix))
    d, c = doc_ix[order], packed[order]
    keep = np.empty(len(order), dtype=bool)
    keep[0] = True
    np.not_equal(d[1:], d[:-1], out=keep[1:])
    keep[1:] |= c[1:] != c[:-1]
    return pd.DataFrame({"doc_id": ids[d[keep]], "tri_code": c[keep]})


def doc_trigram_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(tri_code, doc_id) — one row per DISTINCT trigram per document.

    Arrow-vectorized mapInPandas over (id, text): each chunk is
    processed with numpy sliding windows and one lexsort dedup —
    per-row Python never touches the characters (input_hint contract).
    Arrow batches are re-chunked to ~``_CHUNK_CHARS`` characters before
    the kernel: the dedup sort is O(n log n) with ~10× temporaries, so
    an UNBOUNDED batch (10k rows × big files at low partition counts)
    would thrash cache and memory while a bounded chunk stays hot —
    this keeps per-task memory constant at ANY partition count/file
    size mix. Output is identical to doc_trigram_rows_sql
    (parity-pinned)."""

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ids = pdf["doc_id"].to_numpy(np.int64)
            texts = pdf["text"]
            sizes = texts.str.len().to_numpy(np.int64)
            csum = np.cumsum(sizes)
            lo = 0
            while lo < n:
                hi = int(
                    np.searchsorted(
                        csum, (csum[lo - 1] if lo else 0) + _CHUNK_CHARS, "left"
                    )
                ) + 1
                hi = min(max(hi, lo + 1), n)
                yield _trigram_kernel(ids[lo:hi], texts.iloc[lo:hi])
                lo = hi

    rows = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return rows.mapInPandas(kernel, schema="doc_id long, tri_code long")


def build_trigram_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_docs: int = DEFAULT_SHARD_DOCS,
    mode: str = "overwrite",
) -> str:
    """Build the trigram sidecar → ``index_dir/trigram_index``.

    One shuffle, keyed (tri, shard): shard = doc_id // shard_docs caps
    every collect_list at shard_docs ids, so corpus-universal trigrams
    distribute over ceil(n_docs / shard_docs) tasks instead of one.
    Rows are range-clustered + sorted on (tri, shard) so point-trigram
    reads prune to O(result) row groups on both the Spark and pyarrow
    paths, and doc_ids are ascending within a row and across shards —
    the serving intersection concatenates shards, never re-sorts."""
    from . import fsio
    from .segments import SIDECAR_PART_BYTES, sized_range_partitions

    rows = (
        doc_trigram_rows(docs, id_col=id_col, text_col=text_col)
        .withColumn("shard", (F.col("doc_id") / F.lit(shard_docs)).cast("long"))
        .groupBy("tri_code", "shard")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )
    out = fsio.join(index_dir, TRIGRAM_DIR)
    (
        rows.repartitionByRange(
            sized_range_partitions(rows, SIDECAR_PART_BYTES), "tri_code"
        )
        .sortWithinPartitions("tri_code", "shard")
        .write.mode(mode)
        .parquet(out)
    )
    return out


def update_trigram_index(
    docs_batch: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_docs: int = DEFAULT_SHARD_DOCS,
) -> str:
    """Incremental maintenance: append the batch's trigram postings
    after an upsert — no rebuild, no read of the existing sidecar.

    Why append alone is CORRECT here (unlike the main index, which
    needs generation masks): the trigram index is a PREFILTER whose
    output is always verified against live text. A deleted doc's stale
    postings die at the verification join (the doc is gone from the
    docs table); a replaced doc's stale postings produce at most a
    false candidate (one wasted verification) — while its NEW text's
    trigrams, appended here, are what keeps true matches findable.
    Both query paths already tolerate duplicate (tri_code, shard) keys:
    the Spark path counts distinct group ids per doc, and the served
    path passes every per-group posting union through np.unique.
    Compact by rebuilding with ``build_trigram_index(mode="overwrite")``
    when the appended fraction grows large (same rule as segment
    compaction)."""
    return build_trigram_index(
        docs_batch,
        index_dir,
        id_col=id_col,
        text_col=text_col,
        shard_docs=shard_docs,
        mode="append",
    )


# ---------------------------------------------------------------------------
# query: Spark path
# ---------------------------------------------------------------------------


def pack_trigram(tri: str) -> int:
    """The storage code of a trigram: 3 codepoints packed 21 bits each
    (≤ 63 bits, so it is a plain non-negative int64 everywhere)."""
    return (ord(tri[0]) << 42) | (ord(tri[1]) << 21) | ord(tri[2])


def unpack_trigram(code: int) -> str:
    return "".join(
        chr((code >> sh) & 0x1FFFFF) for sh in (42, 21, 0)
    )


def _group_table(spark: SparkSession, groups: list[frozenset[str]]) -> DataFrame:
    rows = [
        (int(i), pack_trigram(t)) for i, g in enumerate(groups) for t in sorted(g)
    ]
    return spark.createDataFrame(rows, "gid int, tri_code long")


def candidate_docs(
    spark: SparkSession, index_dir: str, groups: list[frozenset[str]]
) -> DataFrame:
    """DataFrame(doc_id) of docs containing ≥1 member of every group.

    Plan: pushdown-pruned sidecar scan (tri IN alternates) ⤳ broadcast
    join to the tiny (gid, tri) table ⤳ explode doc_ids ⤳ one groupBy
    counting distinct gid == n_groups. The explode volume is the sum of
    the matched trigrams' dfs — the point of the index is that the
    caller picked trigrams where that sum ≪ corpus size."""
    from . import fsio

    if not groups:
        raise ValueError("candidate_docs requires ≥1 trigram group")
    alts = sorted({pack_trigram(t) for g in groups for t in g})
    post = (
        spark.read.parquet(fsio.join(index_dir, TRIGRAM_DIR))
        .filter(F.col("tri_code").isin(alts))
        .select("tri_code", "doc_ids")
    )
    g = _group_table(spark, groups)
    return (
        post.join(F.broadcast(g), "tri_code")
        .select("gid", F.explode("doc_ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count_distinct("gid").alias("n_g"))
        .filter(F.col("n_g") == len(groups))
        .select("doc_id")
    )


def substring_search(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ignore_case: bool = False,
) -> DataFrame:
    """Exact substring search → DataFrame(doc_id, n_occ), n_occ = the
    non-overlapping occurrence count. Needles < 3 chars have no trigram
    and fall back to the one-scan path (documented, loud in the plan:
    no sidecar read appears)."""
    t = F.lower(F.col(text_col)) if ignore_case else F.col(text_col)
    n = needle.lower() if ignore_case else needle
    groups = substring_required(needle, ignore_case=ignore_case)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), t.alias("_t"))
    if groups:
        cand = candidate_docs(spark, index_dir, groups)
        base = base.join(cand, "doc_id")
    n_occ = (
        (F.length("_t") - F.length(F.replace(F.col("_t"), F.lit(n)))) / F.lit(len(n))
    ).cast("long")
    return (
        base.select("doc_id", n_occ.alias("n_occ"))
        .filter(F.col("n_occ") > 0)
        .orderBy("doc_id")
    )


def regex_search(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Regex search → DataFrame(doc_id, n_matches), n_matches = count of
    non-overlapping matches (regexp_extract_all semantics). The trigram
    prefilter applies when the pattern has provable literal factors;
    otherwise this degrades to exactly the grep_count scan — same
    answer, full cost — and the plan shows it (no sidecar scan)."""
    groups = regex_required(pattern)
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t")
    )
    if groups:
        cand = candidate_docs(spark, index_dir, groups)
        base = base.join(cand, "doc_id")
    n = F.size(F.regexp_extract_all(F.col("_t"), F.lit(pattern), F.lit(0)))
    return (
        base.select("doc_id", n.cast("long").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy("doc_id")
    )


def trigram_grep(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ignore_case: bool = False,
) -> DataFrame:
    """Line-level grep (doc_id, line_no, line — ripgrep shape, same
    contract as analytics.codesearch.grep) accelerated by the trigram
    prefilter: the split/posexplode/rlike pipeline runs over CANDIDATE
    docs only, so the per-line regex work scales with the rarest
    required trigram's df instead of total corpus lines. Patterns with
    no provable factor degrade to exactly the full grep scan.
    ``ignore_case`` folds through the analyzer as (?i) — required
    groups become ASCII case-variant alternates (AND of ORs), so the
    prefilter stays sound for case-insensitive matching too."""
    from .analytics.codesearch import grep

    groups = regex_required(("(?i)" if ignore_case else "") + pattern)
    base = docs.select(F.col(id_col).cast("long").alias(id_col), text_col)
    if groups:
        cand = candidate_docs(spark, index_dir, groups).withColumnRenamed(
            "doc_id", id_col
        )
        base = base.join(cand, id_col)
    return grep(base, pattern, id_col=id_col, text_col=text_col, ignore_case=ignore_case)


# ---------------------------------------------------------------------------
# query: served path (driver-side pyarrow, ms latency)
# ---------------------------------------------------------------------------


@dataclass
class TrigramSearcher:
    """Driver-side searcher over the trigram sidecar + a docs table.

    Reads are row-group-pruned pyarrow scans (the sidecar is
    range-clustered on tri; the candidate verification reads only the
    candidate ids' rows and only (id, text) columns). Intended for the
    selective patterns a code-search service actually serves; a pattern
    whose candidates approach corpus size belongs on the Spark path."""

    index_dir: str
    docs_path: str
    id_col: str = "doc_id"
    text_col: str = "text"

    def __post_init__(self):
        import pyarrow.dataset as pads

        self._tri = pads.dataset(
            os.path.join(self.index_dir, TRIGRAM_DIR), format="parquet"
        )
        self._docs = pads.dataset(self.docs_path, format="parquet")

    def _postings(self, alts: set[str]) -> dict[str, np.ndarray]:
        import pyarrow.dataset as pads

        codes = {pack_trigram(t): t for t in alts}
        tbl = self._tri.to_table(
            columns=["tri_code", "shard", "doc_ids"],
            filter=pads.field("tri_code").isin(sorted(codes)),
        ).to_pandas()
        out: dict[str, np.ndarray] = {}
        for code, grp in tbl.sort_values(["tri_code", "shard"]).groupby(
            "tri_code", sort=False
        ):
            # ascending within each shard row and shards are disjoint
            # ascending ranges → plain concat stays sorted
            arrs = [np.asarray(a, dtype=np.int64) for a in grp["doc_ids"]]
            out[codes[int(code)]] = (
                np.concatenate(arrs) if arrs else np.empty(0, np.int64)
            )
        return out

    def candidates(self, groups: list[frozenset[str]]) -> np.ndarray:
        post = self._postings({t for g in groups for t in g})
        per_group: list[np.ndarray] = []
        for g in groups:
            arrs = [post.get(t, np.empty(0, np.int64)) for t in sorted(g)]
            u = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
            per_group.append(u)
        per_group.sort(key=len)  # rarest first: intersections only shrink
        cand = per_group[0]
        for arr in per_group[1:]:
            if cand.size == 0:
                break
            cand = cand[np.isin(cand, arr, assume_unique=True)]
        return cand

    def _verify_frame(self, cand: np.ndarray) -> pd.DataFrame:
        import pyarrow.dataset as pads

        if cand.size == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "_t": pd.Series([], dtype="str"),
                }
            )
        tbl = self._docs.to_table(
            columns=[self.id_col, self.text_col],
            filter=pads.field(self.id_col).isin(cand.tolist()),
        ).to_pandas()
        return tbl.rename(columns={self.id_col: "doc_id", self.text_col: "_t"})

    def substring(self, needle: str, ignore_case: bool = False) -> pd.DataFrame:
        groups = substring_required(needle, ignore_case=ignore_case)
        if groups:
            df = self._verify_frame(self.candidates(groups))
        else:  # no trigram → full driver-side scan (small corpora only)
            tbl = self._docs.to_table(columns=[self.id_col, self.text_col]).to_pandas()
            df = tbl.rename(columns={self.id_col: "doc_id", self.text_col: "_t"})
        hay = df["_t"].str.lower() if ignore_case else df["_t"]
        n = needle.lower() if ignore_case else needle
        cnt = hay.str.count(re.escape(n)).astype("int64")
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"), "n_occ": cnt})
        out = out[out["n_occ"] > 0].sort_values("doc_id").reset_index(drop=True)
        return out

    def regex(self, pattern: str) -> pd.DataFrame:
        groups = regex_required(pattern)
        if groups:
            df = self._verify_frame(self.candidates(groups))
        else:
            tbl = self._docs.to_table(columns=[self.id_col, self.text_col]).to_pandas()
            df = tbl.rename(columns={self.id_col: "doc_id", self.text_col: "_t"})
        cnt = df["_t"].str.count(pattern).astype("int64")
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"), "n_matches": cnt})
        return out[out["n_matches"] > 0].sort_values("doc_id").reset_index(drop=True)
