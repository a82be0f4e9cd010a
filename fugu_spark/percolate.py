"""Percolation — standing-query matching (reverse search).

The forward engines answer "which docs match this query?"; percolation
answers "which REGISTERED queries match this doc?" — the Lucene
Monitor / Elasticsearch percolator shape, and the operator a
training-data pipeline runs at crawl time: tag every incoming document
with the standing topic / eval-contamination / routing queries it
satisfies, without building a persistent index first. The query grammar
is the engine's own (:mod:`fugu_spark.queryparse`, the Tantivy surface
the reference exposes through /root/reference/src/db/search.rs:108-127),
so a query string behaves identically whether it is searched forward or
percolated — parity is pinned by tests.

Dataflow (ONE job over the doc batch, no index built):

    compile the registered queries driver-side (tiny)
      → tokenize the doc batch once (the same mapInPandas posting
        extractor as the index build — postings.build_postings)
      → broadcast-join a (term, query, occur) leaf table against the
        doc postings; docs are the big side and stay map-local until
        the final combine
      → phrase leaves: distinct phrases across the whole query set
        chain-join BATCHED BY LENGTH (all length-L sigs share one
        (L−1)-join chain keyed (doc_id, sig_id), per-sig slop bound as
        a column) — the forward engine's greedy latest-start fold
        (search._sloppy_phrase_frame) in the same JVM expressions
      → per-(doc, query) boolean combine: one partial-aggregated
        groupBy — the job's only shuffle

Match semantics per (doc, query) — Lucene BooleanQuery, identical to
the forward plan executor (search.execute_plan): every Must clause
matched, no MustNot matched, and when a query has no Musts at least one
Should matched. Matching is BOOLEAN — a standing query has no
meaningful BM25 score because corpus statistics don't exist for a
stream of unseen docs (the same reason the ES percolator returns
constant scores).

Scale shape at 10^12 docs / 10^6 standing queries: the leaf table is
(queries × leaves) rows — metadata-sized, broadcast by default (pass
``broadcast_queries=False`` to shuffle-join on ``term`` when the query
set outgrows broadcast); doc postings are never shuffled except the
(doc_id, query_id) combine, which partial-aggregates map-side; each
distinct phrase chain runs once regardless of how many queries use it.

Scope: terms, phrases (incl. ``"a b"~N`` slop), AND/OR/NOT, ``+``/
``-`` prefixes, flat boolean plans, and nested groups (``(a OR b) AND
c`` — leaf hits aggregate to a per-(doc, query) BITMASK JVM-side; only
the candidate pairs cross into a vectorized numpy tree evaluator whose
fold mirrors search._execute_node, ≤ 63 leaves per query). Rejected at
compile with a clear error: AllQuery (matches everything — needs no
engine), dictionary expansions (``term*``, ``term~N``) and term ranges
(both need a term dictionary, which an index-free doc stream doesn't
have).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .postings import build_postings
from .queryparse import parse_query
from .tokenizer import DEFAULT_MODE

_OCC_SHOULD, _OCC_MUST, _OCC_NOT = 0, 1, 2
_OCC_CODE = {"should": _OCC_SHOULD, "must": _OCC_MUST, "must_not": _OCC_NOT}


@dataclass(frozen=True)
class CompiledQueries:
    """Driver-side compile of a standing-query set.

    Flat queries (no parentheses) take the pure-column counting path:
    ``term_rows``: deduped (term, query_id, occur) single-term leaves.
    ``sigs``: sig_id → (terms, slop) distinct phrases across ALL queries
    (shared between flat and nested).
    ``phrase_rows``: deduped (sig_id, query_id, occur).
    ``qmeta``: (query_id, n_musts) — n_musts counts the DEDUPED must
    leaves, the count the combine compares against.

    Nested queries take the bitmask path:
    ``nested_term_rows``: (term, query_id, leaf_idx).
    ``nested_phrase_rows``: (sig_id, query_id, leaf_idx).
    ``trees``: query_id → ('leaf', idx) / ('group', ((occur, child), …))
    with leaf indices in flattened plan order.
    """

    term_rows: tuple[tuple[str, int, int], ...]
    sigs: tuple[tuple[str, ...] | tuple, ...]  # indexed by sig_id; (terms..., slop)
    phrase_rows: tuple[tuple[int, int, int], ...]
    qmeta: tuple[tuple[int, int], ...]
    nested_term_rows: tuple[tuple[str, int, int], ...] = ()
    nested_phrase_rows: tuple[tuple[int, int, int], ...] = ()
    trees: tuple[tuple[int, tuple], ...] = ()
    mode: str = DEFAULT_MODE

    @property
    def all_terms(self) -> list[str]:
        seen: dict[str, None] = {}
        for t, _, _ in self.term_rows:
            seen.setdefault(t)
        for t, _, _ in self.nested_term_rows:
            seen.setdefault(t)
        for sig in self.sigs:
            for t in sig[0]:
                seen.setdefault(t)
        return list(seen)


def _degroup_synonyms(plan):
    """Rewrite synonym leaves into should-groups of their member terms —
    boolean-equivalent for matching (a group matches ⇔ any member
    present), which is all percolation needs. The rewritten plan is
    nested, so it compiles to the mask-tree path."""
    import dataclasses

    from .queryparse import BoolNode, QueryPlan, _flatten

    if not any(l.synonym for l in plan.leaves):
        return plan

    def conv(node):
        if isinstance(node, BoolNode):
            return BoolNode(tuple((o, conv(c)) for o, c in node.children))
        if node.synonym:
            return BoolNode(
                tuple(
                    (
                        "should",
                        dataclasses.replace(
                            node, terms=(t,), synonym=False, occur="should"
                        ),
                    )
                    for t in node.terms
                )
            )
        return node

    if plan.root is not None:
        root = conv(plan.root)
    else:
        root = BoolNode(tuple((l.occur, conv(l)) for l in plan.leaves))
    out = QueryPlan(root=root)
    out.leaves = _flatten(root)
    return out


def compile_queries(
    queries: dict[int, str] | list[tuple[int, str]],
    mode: str = DEFAULT_MODE,
    synonyms: dict | None = None,
) -> CompiledQueries:
    """Parse + validate a standing-query set. Raises ``ValueError`` for
    duplicate ids and for query shapes outside the percolation scope
    (AllQuery, nested groups, dictionary expansions, term ranges).

    ``synonyms`` ({term: [alternatives...]}) applies Lucene SynonymQuery
    rewriting to every standing query. Percolation is boolean matching
    (no scores), so a synonym group is EXACTLY a should-group of its
    member terms — compiled as one, which routes the query through the
    nested mask-tree path."""
    pairs = list(queries.items()) if isinstance(queries, dict) else list(queries)
    seen_q: set[int] = set()
    term_rows: dict[tuple[str, int, int], None] = {}
    sig_ids: dict[tuple, int] = {}
    phrase_rows: dict[tuple[int, int, int], None] = {}
    qmeta: list[tuple[int, int]] = []
    nested_term_rows: dict[tuple[str, int, int], None] = {}
    nested_phrase_rows: dict[tuple[int, int, int], None] = {}
    trees: list[tuple[int, tuple]] = []
    for qid, qstr in pairs:
        qid = int(qid)
        if qid in seen_q:
            raise ValueError(f"duplicate query_id {qid!r} in standing-query set")
        seen_q.add(qid)
        plan = parse_query(qstr, mode)
        if synonyms:
            from .queryparse import apply_synonyms

            plan = apply_synonyms(plan, synonyms, mode=mode)
            plan = _degroup_synonyms(plan)
        if plan.is_all:
            raise ValueError(f"query {qid}: AllQuery (empty) cannot be percolated")
        if not plan.has_positive():
            raise ValueError(f"query {qid}: MustNot-only query cannot be percolated")
        for leaf in plan.leaves:
            if leaf.prefix_last or leaf.fuzzy or leaf.regex or leaf.rng is not None:
                raise ValueError(
                    f"query {qid}: dictionary expansions / term ranges need an "
                    "index and cannot be percolated over a raw doc stream"
                )
        if plan.root is not None:
            if len(plan.leaves) > 63:
                raise ValueError(f"query {qid}: > 63 leaves in a nested plan")
            from .batch import _tree_of

            trees.append((qid, _tree_of(plan)))
            for i, leaf in enumerate(plan.leaves):
                if leaf.is_phrase:
                    sig = (leaf.terms, leaf.slop)
                    sid = sig_ids.setdefault(sig, len(sig_ids))
                    nested_phrase_rows.setdefault((sid, qid, i))
                else:
                    nested_term_rows.setdefault((leaf.terms[0], qid, i))
            continue
        musts: set[tuple] = set()
        for leaf in plan.leaves:
            occ = _OCC_CODE[leaf.occur]
            if leaf.is_phrase:
                sig = (leaf.terms, leaf.slop)
                sid = sig_ids.setdefault(sig, len(sig_ids))
                phrase_rows.setdefault((sid, qid, occ))
                key: tuple = ("p", sid)
            else:
                term_rows.setdefault((leaf.terms[0], qid, occ))
                key = ("t", leaf.terms[0])
            if occ == _OCC_MUST:
                musts.add(key)
        qmeta.append((qid, len(musts)))
    sigs = [None] * len(sig_ids)
    for (terms, slop), sid in sig_ids.items():
        sigs[sid] = (terms, slop)
    return CompiledQueries(
        term_rows=tuple(term_rows),
        sigs=tuple(sigs),
        phrase_rows=tuple(phrase_rows),
        qmeta=tuple(qmeta),
        nested_term_rows=tuple(nested_term_rows),
        nested_phrase_rows=tuple(nested_phrase_rows),
        trees=tuple(trees),
        mode=mode,
    )


def percolate(
    docs: DataFrame,
    compiled: CompiledQueries,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_queries: bool = True,
    min_should_match: int = 0,
) -> DataFrame:
    """Match a doc batch against the compiled standing queries.

    Returns ``(doc_id, query_id)`` — one row per satisfied (doc, query)
    pair. Pure DataFrame ops: composable under ``foreachBatch`` (see
    :func:`start_percolate_stream`, which also releases the internal
    cache per micro-batch) or directly over a 100-TB batch.

    ``min_should_match`` — the Lucene gate, applied to every standing
    query's top level: a doc must match ≥ that many distinct should
    clauses (besides musts / no nots) to count as a match.
    """
    out, _ = _percolate_frames(
        docs, compiled, id_col, text_col, broadcast_queries,
        msm=max(0, int(min_should_match)),
    )
    return out


def _percolate_frames(
    docs: DataFrame,
    compiled: CompiledQueries,
    id_col: str,
    text_col: str,
    broadcast_queries: bool,
    msm: int = 0,
) -> tuple[DataFrame, DataFrame | None]:
    """(matches, persisted-postings-or-None) — the second element lets a
    per-batch caller (the streaming sink) unpersist after materializing,
    so long-running streams don't accumulate cached plans."""
    spark = docs.sparkSession
    # prune to the standing vocabulary BEFORE anything else: the doc
    # stream's vocab is unbounded, the query set's is metadata-sized.
    # Small sets push INSIDE the tokenize kernel (non-vocabulary tokens
    # never reach the posting-grouping passes — they are ~98% of the
    # stream for a realistic standing set); big sets tokenize fully and
    # broadcast-semi-join — a 10^6-term set would bloat every task
    # closure and a 10^6-term isin literal the expression tree.
    vocab = compiled.all_terms
    if len(vocab) <= 8192:
        posts = build_postings(
            docs, id_col=id_col, text_col=text_col, mode=compiled.mode,
            vocab=frozenset(vocab),
        )
    else:
        posts = build_postings(docs, id_col=id_col, text_col=text_col, mode=compiled.mode)
        vdf = spark.createDataFrame([(t,) for t in vocab], "term string")
        posts = posts.join(F.broadcast(vdf), "term", "left_semi")
    persisted: DataFrame | None = None
    if compiled.sigs:
        # consumed once per distinct phrase sig + once for term leaves —
        # persist so tokenization runs a single pass over the batch
        posts = persisted = posts.persist()

    def _maybe_broadcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df

    # one (doc_id, sig_id) match frame for ALL distinct phrases, shared
    # between the flat and nested paths and between every query using a
    # phrase — chains run BATCHED BY LENGTH (one join sequence per
    # phrase length, sig_id rides along), not one per sig
    sig_hits: DataFrame | None = (
        _batched_sig_match(spark, posts, compiled.sigs) if compiled.sigs else None
    )

    outs: list[DataFrame] = []

    # ---- flat queries: pure-column counting combine --------------------
    hit_frames: list[DataFrame] = []
    if compiled.term_rows:
        tl = spark.createDataFrame(
            list(compiled.term_rows), "term string, query_id long, occur int"
        )
        hit_frames.append(
            posts.join(_maybe_broadcast(tl), "term").select("doc_id", "query_id", "occur")
        )
    if compiled.phrase_rows:
        prows = spark.createDataFrame(
            list(compiled.phrase_rows), "sig_id int, query_id long, occur int"
        )
        hit_frames.append(
            sig_hits.join(F.broadcast(prows), "sig_id").select(
                "doc_id", "query_id", "occur"
            )
        )
    if hit_frames:
        hits = hit_frames[0]
        for f in hit_frames[1:]:
            hits = hits.unionByName(f)
        agg = hits.groupBy("doc_id", "query_id").agg(
            F.sum(F.when(F.col("occur") == _OCC_MUST, 1).otherwise(0)).alias("must_hits"),
            F.sum(F.when(F.col("occur") == _OCC_SHOULD, 1).otherwise(0)).alias(
                "should_hits"
            ),
            F.max(F.when(F.col("occur") == _OCC_NOT, 1).otherwise(0)).alias("not_hit"),
        )
        qm = spark.createDataFrame(list(compiled.qmeta), "query_id long, n_musts int")
        gate = (
            (F.col("should_hits") >= msm)
            if msm > 0
            else ((F.col("n_musts") > 0) | (F.col("should_hits") > 0))
        )
        outs.append(
            agg.join(F.broadcast(qm), "query_id")
            .filter(
                (F.col("not_hit") == 0)
                & (F.col("must_hits") == F.col("n_musts"))
                & gate
            )
            .select("doc_id", "query_id")
        )

    # ---- nested queries: leaf-hit bitmask + vectorized tree eval -------
    nhit_frames: list[DataFrame] = []
    if compiled.nested_term_rows:
        ntl = spark.createDataFrame(
            list(compiled.nested_term_rows), "term string, query_id long, leaf_idx int"
        )
        nhit_frames.append(
            posts.join(_maybe_broadcast(ntl), "term").select(
                "doc_id", "query_id", "leaf_idx"
            )
        )
    if compiled.nested_phrase_rows:
        nprows = spark.createDataFrame(
            list(compiled.nested_phrase_rows), "sig_id int, query_id long, leaf_idx int"
        )
        nhit_frames.append(
            sig_hits.join(F.broadcast(nprows), "sig_id").select(
                "doc_id", "query_id", "leaf_idx"
            )
        )
    if nhit_frames:
        nhits = nhit_frames[0]
        for f in nhit_frames[1:]:
            nhits = nhits.unionByName(f)
        masks = nhits.groupBy("doc_id", "query_id").agg(
            F.expr("bit_or(shiftleft(1L, leaf_idx))").alias("mask")
        )
        outs.append(
            masks.mapInPandas(
                _mask_tree_eval(dict(compiled.trees), msm), "doc_id long, query_id long"
            )
        )

    out = outs[0]
    for f in outs[1:]:
        out = out.unionByName(f)
    return out, persisted


def _batched_sig_match(spark, posts: DataFrame, sigs) -> DataFrame:
    """(doc_id, sig_id) existence matches for EVERY distinct phrase in
    ONE aggregation: postings broadcast-join a (term, sig_id, step)
    table, a single ``groupBy(doc_id, sig_id)`` collects the per-step
    position arrays, and the greedy latest-start chain — the forward
    engine's fold (search._sloppy_phrase_frame) — runs as one JVM
    ``aggregate`` over the sorted steps. One shuffle for the whole
    phrase stage regardless of phrase count or length (the join-chain
    alternative costs a SortMergeJoin per step). For slop = 0 an
    ascending chain with total span ≤ L−1 forces consecutive
    positions, i.e. exact adjacency — pinned by forward-parity tests."""
    rows = []
    for sid, (terms, slop) in enumerate(sigs):
        span = slop + len(terms) - 1
        for k, t in enumerate(terms):
            rows.append((t, sid, k, len(terms), span))
    steps = spark.createDataFrame(
        rows, "term string, sig_id int, k int, n_terms int, span int"
    )
    # a doc contributes one posting row per term, so each step matches
    # ≤ 1 row — size(kp) == n_terms ⇔ every step's term is present
    # (duplicate terms in a phrase are distinct steps joining the same
    # posting row)
    grouped = (
        posts.join(F.broadcast(steps), "term")
        .groupBy("doc_id", "sig_id")
        .agg(
            F.collect_list(F.struct("k", "positions")).alias("kp"),
            F.first("n_terms").alias("n_terms"),
            F.first("span").alias("span"),
        )
        .filter(F.size("kp") == F.col("n_terms"))
    )
    # fold steps in k order: state = candidate (end p, latest chain
    # start s) pairs; each step keeps ends q with some predecessor
    # p < q, carrying the max start reachable
    chain = (
        "aggregate(slice(array_sort(kp), 2, n_terms - 1), "
        "transform(array_sort(kp)[0].positions, p -> named_struct('p', p, 's', p)), "
        "(acc, e) -> filter(transform(e.positions, q -> named_struct('p', q, "
        "'s', aggregate(acc, -1, (m, x) -> CASE WHEN x.p < q THEN greatest(m, x.s) "
        "ELSE m END))), x -> x.s >= 0))"
    )
    return grouped.filter(
        F.expr(f"exists({chain}, x -> x.p - x.s <= span)")
    ).select("doc_id", "sig_id")


def _mask_tree_eval(trees: dict[int, tuple], msm: int = 0):
    """mapInPandas evaluator for nested standing queries: rows are
    (doc_id, query_id, mask) candidate pairs; per query the plan tree
    folds over numpy bool arrays (leaf i matched ⇔ bit i set). Fold
    semantics mirror search._execute_node: all musts, ≥1 should when
    mustless, nots exclude, a must-not-only group matches nothing.
    ``msm`` gates the tree ROOT (count of matched should children)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            outs = []
            for qid, grp in pdf.groupby("query_id"):
                tree = trees[int(qid)]
                mask = grp["mask"].to_numpy(np.int64)

                def ev(node):
                    if node[0] == "leaf":
                        return (mask >> node[1]) & 1 != 0
                    musts, shoulds, nots = [], [], []
                    for occ, child in node[1]:
                        v = ev(child)
                        if occ == "must":
                            musts.append(v)
                        elif occ == "must_not":
                            nots.append(v)
                        else:
                            shoulds.append(v)
                    if musts:
                        m = musts[0].copy()
                        for x in musts[1:]:
                            m &= x
                    elif shoulds:
                        m = np.zeros(len(mask), dtype=bool)
                        for x in shoulds:
                            m |= x
                    else:
                        return np.zeros(len(mask), dtype=bool)
                    for x in nots:
                        m &= ~x
                    return m

                sel = ev(tree)
                if msm > 0:
                    cnt = np.zeros(len(mask), dtype=np.int64)
                    for occ, child in tree[1]:
                        if occ not in ("must", "must_not"):
                            cnt += ev(child)
                    sel = sel & (cnt >= msm)
                if sel.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_id": grp["doc_id"].to_numpy(np.int64)[sel],
                                "query_id": np.int64(int(qid)),
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs)

    return run


def start_percolate_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    compiled: CompiledQueries,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
    available_now: bool = True,
    min_should_match: int = 0,
):
    """Percolate a file-source stream; matches append to ``out_dir`` as
    parquet ``(doc_id, query_id)``. Same drop-folder shape as
    :func:`streaming.start_stream_ingest`; ``available_now=True`` drains
    what's present and stops (the cron/Airflow pattern). Replayed
    micro-batches re-append their matches — dedup downstream with the
    usual exactly-once sink (MERGE on (doc_id, query_id)) when the sink
    must be exact."""
    stream = spark.readStream.schema(schema).format(fmt).load(source_dir)

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        matches, persisted = _percolate_frames(
            batch, compiled, id_col, text_col, broadcast_queries=True,
            msm=max(0, int(min_should_match)),
        )
        try:
            matches.write.mode("append").parquet(out_dir)
        finally:
            if persisted is not None:
                persisted.unpersist()

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
