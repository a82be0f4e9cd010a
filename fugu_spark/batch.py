"""Batch retrieval: score MANY queries in ONE Spark job.

The interactive engine launches a job per query — the right shape for a
serving fallback, the wrong one for offline retrieval (RAG corpus
mining, distillation targets, eval sweeps, hard-negative mining for
training data), where millions of queries amortize a single pass over
the index. This module executes a whole query batch as one dataflow:

    parse + compile all queries driver-side (tiny)
      → ONE pruned decode per field of the union of their terms'
        posting blocks (positions ride along only for phrase terms)
      → broadcast-join a (query, leaf, term | phrase-sig) table
      → phrase signatures chain-joined ONCE per distinct (field,
        terms, slop) — shared across every query that contains them
      → per-(query, doc) boolean combine: flat queries fold in pure
        column expressions (identical order to search._combine_frames);
        nested queries fold their plan tree in a vectorized
        applyInPandas kernel (identical order to search._execute_node)
      → per-query top-k via a window over (score DESC, doc_id ASC)

Scale shape: posting blocks are decoded once no matter how many queries
reference a term; each distinct phrase runs its chain join once; the
leaf tables are queries×leaves rows (metadata-sized, broadcast); the
only shuffles are the (query_id, doc_id) combine and the per-query
window — both keyed wide enough to use every executor. Rank and score
identity with the single-query engines (:func:`segment_search.
search_segments` per query, :func:`search.search_fields` for
field-qualified batches) is pinned by tests.

v2 scope (VERDICT r4 Next #1): terms, AND/OR/NOT, boosts, phrases
(including ``"a b"~N`` slop), nested boolean groups, dictionary
expansions (``term*``, ``"a b"*``, ``term~N``, ``/regex/``, wildcards —
expanded driver-side with the same dictionary reads as the single-query
engines), and — through :func:`batch_search_fields` — field-qualified
leaves and field-scoped groups. The engine-level knobs batch too:
``min_should_match`` (parts-array count projection in the flat fold,
root gate in the tree kernel) and ``synonyms`` (blended leaves
pre-combined per (query, leaf, field, doc) so tf sums before the
nonlinear tf-norm). Still unsupported (callers fall back to per-query
search): AllQuery, NOT-only plans or groups (need the doc universe),
and lexicographic term ranges / ``field:*`` (their decode is a
segment-scan predicate, not a leaf table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .bm25 import idf_py
from .postings import InvertedIndex
from .queryparse import BoolNode, Leaf, parse_query
from .segments import SegmentIndex
from .tokenizer import DEFAULT_MODE


class _FieldSource:
    """Uniform access to one field's index: a SegmentIndex (compressed
    segment files, pruned decode) or an InvertedIndex (table-native)."""

    def __init__(self, src):
        self.src = src
        self.is_segments = isinstance(src, SegmentIndex)

    @property
    def spark(self):
        return self.src.spark if self.is_segments else self.src.postings.sparkSession

    @property
    def stats(self):
        return self.src.stats

    def term_meta(self, terms: list[str]) -> dict[str, dict]:
        if not terms:
            return {}
        if self.is_segments:
            from .segment_search import _term_meta

            return _term_meta(self.src, terms)
        rows = (
            self.src.terms.filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {
            r["term"]: {"df": r["df"], "idf": idf_py(r["df"], self.stats.n_docs)}
            for r in rows
        }

    def decode(
        self, terms: list[str], meta: dict, pos_terms: set[str], k1: float, b: float
    ) -> DataFrame:
        """(doc_id, term, tf, positions, doc_len) for these terms;
        positions are decoded only for ``pos_terms`` (phrase members)."""
        if self.is_segments:
            from .segment_search import decode_postings

            plain = sorted(t for t in terms if t not in pos_terms)
            withpos = sorted(t for t in terms if t in pos_terms)
            parts = []
            if withpos:
                parts.append(
                    decode_postings(
                        self.src, withpos, meta, with_positions=True, k1=k1, b=b
                    )
                )
            if plain:
                parts.append(
                    decode_postings(self.src, plain, meta, k1=k1, b=b)
                )
            if not parts:
                return self.spark.createDataFrame(
                    [], "doc_id long, term string, tf int, "
                    "positions array<int>, doc_len int"
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        return self.src.postings.filter(F.col("term").isin(terms)).select(
            "doc_id", "term", "tf", "positions", "doc_len"
        )


def _compile_checks(plan, qid) -> None:
    if plan.is_all:
        raise ValueError(f"query {qid!r}: AllQuery not supported in batch mode")
    if not plan.has_positive():
        raise ValueError(f"query {qid!r}: NOT-only queries not supported in batch mode")
    if any(l.rng is not None for l in plan.leaves):
        raise ValueError(
            f"query {qid!r}: range/exists leaves not supported in batch mode"
        )
    if any(l.near for l in plan.leaves):
        # the batch phrase kernel keys signatures by (field, terms,
        # slop) and runs the ORDERED chain; silently scoring an
        # unordered span_near leaf through it would be wrong — route
        # such queries through the single-query engines instead
        raise ValueError(
            f"query {qid!r}: span_near (unordered) leaves not supported in batch mode"
        )


def _batch_expander(sources: dict):
    """Dictionary expander for prefix/fuzzy leaves in batch plans —
    delegates to the per-source expanders (pyarrow byte-range /
    distributed levenshtein scan for segments, Spark dictionary filter
    for table indexes) and unions across a leaf's applicable fields,
    exactly like the single-query engines, so expansion sets (and
    therefore ranks) stay identical."""
    from .queryparse import PREFIX_MAX_EXPANSIONS

    def exp(leaf) -> list[str]:
        keys = (
            [leaf.fld]
            if leaf.fld is not None and leaf.fld in sources
            else list(sources)
        )
        terms: set[str] = set()
        for f in keys:
            src = sources[f]
            if src.is_segments:
                from .segment_search import _segment_expander

                terms.update(_segment_expander(src.src)(leaf))
            else:
                from .search import dict_expander

                terms.update(dict_expander({f: src.src})(leaf))
        return sorted(terms)[:PREFIX_MAX_EXPANSIONS]

    return exp


def _leaf_live_fields(leaf: Leaf, fields: list[str], metas: dict) -> list[str]:
    """Fields this leaf can score in (its own when qualified, else all),
    restricted to fields whose dictionary contains every leaf term —
    ANY member term for a synonym group (members are alternatives)."""
    cand = [leaf.fld] if leaf.fld is not None else fields
    if leaf.synonym:
        return [f for f in cand if f in metas and any(t in metas[f] for t in leaf.terms)]
    return [f for f in cand if f in metas and all(t in metas[f] for t in leaf.terms)]


def _check_no_not_only_groups(node, fields, metas, qid) -> bool:
    """Mirror of search._execute_node's frame-vs-None protocol: returns
    True when the node produces a frame (a dead-Must group produces an
    EMPTY frame, which still counts), False when it is dead (dropped by
    its parent), and raises when a group's only live children are
    MustNot — that branch needs the doc universe (all_docs), which batch
    mode cannot supply."""
    if isinstance(node, Leaf):
        return bool(_leaf_live_fields(node, fields, metas))
    has_must = False
    shoulds_live = nots_live = False
    for occ, child in node.children:
        alive = _check_no_not_only_groups(child, fields, metas, qid)
        if occ == "must":
            has_must = True
        elif occ == "must_not":
            nots_live = nots_live or alive
        else:
            shoulds_live = shoulds_live or alive
    if has_must or shoulds_live:
        return True
    if nots_live:
        raise ValueError(
            f"query {qid!r}: a NOT-only boolean group needs the doc universe "
            "— not supported in batch mode"
        )
    return False


def _flat_kernel(n_musts: dict, msm: int, k: int):
    """applyInPandas combiner for FLAT plans: per query, fold the
    (leaf_id, score, is_not, is_must) contribution rows per doc and emit
    the ranked top-k directly.

    Bit-identical to the former JVM column fold — and to
    search._combine_frames: rows sort by (doc_id, leaf_id, score,
    is_not, is_must), the mirror of array_sort(collect_list(struct(
    leaf_id, score, is_not, is_must))); the per-doc sum adds the
    NOT-free scores left-to-right from 0.0 via rounds over the
    within-doc rank (round j adds every doc's j-th part — the same
    addend sequence as the sequential fold, vectorized over docs).
    Gates (every must leaf distinct-matched, no NOT part, ≥ msm
    distinct should leaves) are integer tallies. Emitting top-k here
    replaces a window over every (query, doc) score with a per-query
    argsort of the (already partitioned) survivors."""
    import numpy as np
    import pandas as pd

    def combine(key, pdf):
        qid = int(key[0])
        nm = int(n_musts.get(qid, 0))
        d = pdf["doc_id"].to_numpy(np.int64)
        lid = pdf["leaf_id"].to_numpy(np.int64)
        sc = pdf["score"].to_numpy(np.float64)
        inot = pdf["is_not"].to_numpy(np.int64)
        imust = pdf["is_must"].to_numpy(np.int64)
        order = np.lexsort((imust, inot, sc, lid, d))
        d, lid, sc = d[order], lid[order], sc[order]
        inot, imust = inot[order], imust[order]
        docs, gidx = np.unique(d, return_inverse=True)
        n = len(docs)
        keep = np.bincount(gidx[inot == 1], minlength=n) == 0
        if nm > 0:
            m = imust == 1
            dm, lm = gidx[m], lid[m]
            if len(dm):
                up = np.concatenate([[True], (dm[1:] != dm[:-1]) | (lm[1:] != lm[:-1])])
                keep &= np.bincount(dm[up], minlength=n) == nm
            else:
                keep[:] = False
        if msm > 0:
            sm = (inot == 0) & (imust == 0)
            ds_, ls_ = gidx[sm], lid[sm]
            if len(ds_):
                up = np.concatenate(
                    [[True], (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])]
                )
                keep &= np.bincount(ds_[up], minlength=n) >= msm
            else:
                keep[:] = False
        pos = inot == 0
        gp, sp = gidx[pos], sc[pos]
        score = np.zeros(n, dtype=np.float64)
        if len(gp):
            firsts = np.flatnonzero(np.concatenate([[True], gp[1:] != gp[:-1]]))
            counts = np.diff(np.append(firsts, len(gp)))
            rank = np.arange(len(gp), dtype=np.int64) - np.repeat(firsts, counts)
            for j in range(int(counts.max())):
                selj = rank == j
                score[gp[selj]] += sp[selj]
        kept = np.flatnonzero(keep)
        dk, sk = docs[kept], score[kept]
        sel = np.lexsort((dk, -sk))[:k]
        return pd.DataFrame(
            {
                "query_id": np.full(len(sel), qid, dtype=np.int64),
                "doc_id": dk[sel],
                "score": sk[sel],
                "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            }
        )

    return combine


def _tree_kernel(trees: dict, msm: int = 0):
    """applyInPandas combiner for nested plans: per query, fold the plan
    tree over (leaf_id, ci, score) contribution rows — vectorized over
    the doc axis, Python only over the (tiny) tree structure. Fold
    orders mirror search._execute_node / _execute_node_fields exactly
    (musts in child order, shoulds from 0.0 in child order, per-leaf
    cross-field fold from 0.0 in field order) so scores are
    bit-identical to the single-query engines. ``msm`` applies at the
    tree ROOT, mirroring _execute_node's top-level gate."""
    import numpy as np
    import pandas as pd

    def combine(key, pdf):
        qid = key[0]
        tree = trees[qid]
        docs, doc_idx = np.unique(pdf["doc_id"].to_numpy(np.int64), return_inverse=True)
        n = len(docs)
        lid = pdf["leaf_id"].to_numpy()
        ci = pdf["ci"].to_numpy()
        sc = pdf["score"].to_numpy(np.float64)
        leaf_vals: dict[int, np.ndarray] = {}
        leaf_matched: dict[int, np.ndarray] = {}
        for l in np.unique(lid):
            rows = lid == l
            val = np.zeros(n)
            present = np.zeros(n, dtype=bool)
            for c in np.unique(ci[rows]):  # ascending field order
                rr = rows & (ci == c)
                idx = doc_idx[rr]
                val[idx] = val[idx] + sc[rr]
                present[idx] = True
            leaf_vals[int(l)] = val
            leaf_matched[int(l)] = present

        def ev(node):
            if node[0] == "leaf":
                l = node[1]
                if l in leaf_vals:
                    return leaf_matched[l], leaf_vals[l]
                return np.zeros(n, dtype=bool), np.zeros(n)
            musts, shoulds, nots = [], [], []
            for occ, child in node[1]:
                m, s = ev(child)
                if occ == "must":
                    musts.append((m, s))
                elif occ == "must_not":
                    nots.append((m, s))
                else:
                    shoulds.append((m, s))
            if musts:
                matched = musts[0][0].copy()
                score = musts[0][1].copy()
                for m, s in musts[1:]:
                    matched &= m
                    score = score + s
                if shoulds:
                    opt = np.zeros(n)
                    for m, s in shoulds:
                        opt = np.where(m, opt + s, opt)
                    score = score + opt
            elif shoulds:
                matched = np.zeros(n, dtype=bool)
                score = np.zeros(n)
                for m, s in shoulds:
                    score = np.where(m, score + s, score)
                    matched |= m
            else:
                return np.zeros(n, dtype=bool), np.zeros(n)
            for m, _ in nots:
                matched &= ~m
            return matched, score

        matched, score = ev(tree)
        if msm > 0:
            # root-level minimumNumberShouldMatch: count matched should
            # children (ev recomputation is a cheap vectorized pass)
            cnt = np.zeros(n, dtype=np.int64)
            for occ, child in tree[1]:
                if occ not in ("must", "must_not"):
                    m, _ = ev(child)
                    cnt += m
            matched = matched & (cnt >= msm)
        return pd.DataFrame(
            {
                "query_id": np.int64(qid),
                "doc_id": docs[matched],
                "score": score[matched],
            }
        )

    return combine


def _tree_of(plan) -> tuple:
    """Plan → serializable tree of ('leaf', id) / ('group', children)
    with leaf ids matching the flattened plan.leaves order."""
    counter = iter(range(len(plan.leaves)))

    def walk(node):
        if isinstance(node, Leaf):
            return ("leaf", next(counter))
        return ("group", tuple((occ, walk(c)) for occ, c in node.children))

    if plan.root is not None:
        return walk(plan.root)
    return (
        "group",
        tuple((l.occur, ("leaf", i)) for i, l in enumerate(plan.leaves)),
    )


def _batch_execute(
    sources: dict[str, _FieldSource],
    queries,
    k: int,
    mode: str,
    k1: float,
    b: float,
    field_boosts: dict[str, float] | None,
    parse_fields,
    min_should_match: int = 0,
    synonyms: dict | None = None,
) -> DataFrame:
    if isinstance(queries, dict):
        queries = list(queries.items())
    seen_qids = set()
    for qid, _ in queries:
        if qid in seen_qids:
            # a silent merge would sum two queries' leaves under one id
            # and overwrite n_musts (ADVICE r4) — refuse loudly
            raise ValueError(f"duplicate query_id {qid!r} in batch")
        seen_qids.add(qid)
    fields = list(sources)
    first = sources[fields[0]]
    spark = first.spark
    boosts = field_boosts or {}

    plans = []
    expander = None
    for qid, text in queries:
        if isinstance(text, dict):
            # structured-DSL query (fugu_spark.dsl) — compiles onto the
            # same plan shapes, so batching is identical downstream
            from .dsl import compile_query

            plan = compile_query(text, mode=mode)
        else:
            plan = parse_query(text, mode=mode, fields=parse_fields)
        from .queryparse import expand_plan, needs_expansion

        if needs_expansion(plan):
            # prefix/fuzzy leaves expand driver-side (same dictionary
            # reads as the single-query engines → identical expansion
            # sets); the expanded OR-groups batch like any nested plan
            if expander is None:
                expander = _batch_expander(sources)
            plan = expand_plan(plan, expander)
        if synonyms:
            from .queryparse import apply_synonyms

            plan = apply_synonyms(plan, synonyms, mode=mode)
        _compile_checks(plan, qid)
        plans.append((qid, plan))
    msm = max(0, int(min_should_match))

    # ---- per-field term needs + dictionary lookups (one per field) ----
    need: dict[str, set[str]] = {f: set() for f in fields}
    pos_need: dict[str, set[str]] = {f: set() for f in fields}
    for _, plan in plans:
        for leaf in plan.leaves:
            cand = [leaf.fld] if leaf.fld is not None else fields
            for f in cand:
                need[f].update(leaf.terms)
                if leaf.is_phrase:
                    pos_need[f].update(leaf.terms)
    metas = {f: sources[f].term_meta(sorted(need[f])) for f in fields}

    for qid, plan in plans:
        if plan.root is not None:
            _check_no_not_only_groups(plan.root, fields, metas, qid)

    # ---- driver-side leaf/sig table construction ----------------------
    # term rows:   (qid, leaf_id, ci, term_key, mult, is_must, is_not)
    # phrase rows: (qid, leaf_id, ci, sig_id, idf_sum, boost, fmult,
    #               is_must, is_not)
    # sig rows:    (sig_id, field, slop, t0..t_{L-1})
    term_rows: list[tuple] = []
    syn_rows: list[tuple] = []  # synonym-group member rows (blended mult)
    phrase_rows: list[tuple] = []
    sig_ids: dict[tuple, int] = {}
    n_musts: dict[int, int] = {}
    nested_trees: dict[int, tuple] = {}
    flat_qids: set[int] = set()

    live_fields_by_f: dict[str, set[str]] = {f: set() for f in fields}

    def emit_leaf(qid: int, i: int, leaf: Leaf, is_must: int, is_not: int) -> bool:
        """Append contribution rows for one leaf; False = dead everywhere."""
        lf = _leaf_live_fields(leaf, fields, metas)
        if not lf:
            return False
        for f in lf:
            ci = fields.index(f)
            fmult = float(boosts.get(f, 1.0))
            if leaf.is_phrase:
                key = (f, leaf.terms, leaf.slop)
                sig = sig_ids.setdefault(key, len(sig_ids))
                idf_sum = sum(metas[f][t]["idf"] for t in leaf.terms)
                phrase_rows.append(
                    (qid, i, ci, sig, idf_sum, float(leaf.boost), fmult, is_must, is_not)
                )
                live_fields_by_f[f].update(leaf.terms)
            elif leaf.synonym:
                # Lucene SynonymQuery blend: ONE mult from the group's
                # max df, shared by every member row; tf sums per doc in
                # the pre-combine before the nonlinear tf-norm
                group = [t for t in leaf.terms if t in metas[f]]
                mult = (
                    idf_py(
                        max(metas[f][t]["df"] for t in group),
                        sources[f].stats.n_docs,
                    )
                    * leaf.boost
                    * fmult
                )
                for t in group:
                    syn_rows.append((qid, i, ci, t, mult, is_must, is_not))
                live_fields_by_f[f].update(group)
            else:
                t = leaf.terms[0]
                # python fold identical to search._term_leaves_frame:
                # (idf * boost) * field_mult
                mult = metas[f][t]["idf"] * leaf.boost * fmult
                term_rows.append((qid, i, ci, t, mult, is_must, is_not))
                live_fields_by_f[f].update(leaf.terms)
        return True

    for qid, plan in plans:
        if plan.root is not None:
            nested_trees[qid] = _tree_of(plan)
            # occur flags live in the tree, folded by the kernel — emit
            # contribution rows with neutral flags. A dead leaf (absent
            # everywhere) simply emits no rows: its matched vector is
            # all-False, so a root-level Must on it kills every doc —
            # exactly search._execute_node's empty-frame semantics.
            for i, leaf in enumerate(plan.leaves):
                emit_leaf(qid, i, leaf, 0, 0)
            continue
        # flat plan — mirror of the v1 path + search._combine_frames
        dead = False
        rows_before = (len(term_rows), len(phrase_rows), len(syn_rows))
        nm = 0
        n_live_shoulds = 0
        any_positive_live = False
        for i, leaf in enumerate(plan.leaves):
            is_must = 1 if leaf.occur == "must" else 0
            is_not = 1 if leaf.occur == "must_not" else 0
            alive = emit_leaf(qid, i, leaf, is_must, is_not)
            if not alive:
                if is_must:
                    dead = True  # Must leaf on absent term kills the query
                    break
                continue  # absent should/not leaves drop
            nm += is_must
            if not is_must and not is_not:
                n_live_shoulds += 1
            if not is_not:
                any_positive_live = True
        # Lucene: minShouldMatch above the live optional count → the
        # query matches nothing (same rule as execute_plan's early exit)
        if dead or not any_positive_live or (msm > 0 and msm > n_live_shoulds):
            # roll back this query's rows
            del term_rows[rows_before[0] :]
            del phrase_rows[rows_before[1] :]
            del syn_rows[rows_before[2] :]
            continue
        n_musts[qid] = nm
        flat_qids.add(qid)

    out_schema = "query_id long, doc_id long, score double, rank int"
    if not term_rows and not phrase_rows and not syn_rows:
        return spark.createDataFrame([], out_schema)

    # ---- one decode per field ----------------------------------------
    decoded: dict[str, DataFrame] = {}
    for f in fields:
        terms = sorted(live_fields_by_f[f])
        if terms:
            decoded[f] = sources[f].decode(
                terms, metas[f], pos_need[f], k1, b
            )

    def tfn(f: str):
        # identical expression shape to search._tf_norm (bit-identical
        # scores vs the single-query engines)
        tf = F.col("tf").cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b)
            * F.col("doc_len").cast("double")
            / F.lit(float(sources[f].stats.avgdl))
        )
        return tf * F.lit(k1 + 1.0) / (tf + norm)

    contribs: list[DataFrame] = []

    # term contributions: decoded ⋈ broadcast leaf table, per field
    if term_rows:
        tdf = spark.createDataFrame(
            term_rows,
            "query_id long, leaf_id int, ci int, term string, mult double, "
            "is_must int, is_not int",
        )
        for fi, f in enumerate(fields):
            if f not in decoded:
                continue
            rows_f = tdf.filter(F.col("ci") == fi)
            contribs.append(
                decoded[f]
                .join(F.broadcast(rows_f), "term")
                .select(
                    "query_id",
                    "leaf_id",
                    "ci",
                    "doc_id",
                    (F.col("mult") * tfn(f)).alias("score"),
                    "is_must",
                    "is_not",
                )
            )

    # synonym contributions: decoded ⋈ member rows, then ONE
    # (query, leaf, field, doc) pre-combine summing tf BEFORE the
    # nonlinear tf-norm (Lucene SynonymScorer's freq sum)
    if syn_rows:
        syn_df = spark.createDataFrame(
            syn_rows,
            "query_id long, leaf_id int, ci int, term string, mult double, "
            "is_must int, is_not int",
        )
        for fi, f in enumerate(fields):
            if f not in decoded:
                continue
            rows_f = syn_df.filter(F.col("ci") == fi)
            pre = (
                decoded[f]
                .join(F.broadcast(rows_f), "term")
                .groupBy("query_id", "leaf_id", "ci", "doc_id")
                .agg(
                    F.sum("tf").alias("tf"),
                    F.first("doc_len").alias("doc_len"),
                    F.first("mult").alias("mult"),
                    F.first("is_must").alias("is_must"),
                    F.first("is_not").alias("is_not"),
                )
            )
            contribs.append(
                pre.select(
                    "query_id",
                    "leaf_id",
                    "ci",
                    "doc_id",
                    (F.col("mult") * tfn(f)).alias("score"),
                    "is_must",
                    "is_not",
                )
            )

    # phrase contributions: one chain join per distinct signature length
    if phrase_rows:
        pdf_leaves = spark.createDataFrame(
            phrase_rows,
            "query_id long, leaf_id int, ci int, sig_id int, idf_sum double, "
            "boost double, fmult double, is_must int, is_not int",
        )
        sig_frames = _phrase_sig_frames(spark, sig_ids, decoded, fields, tfn)
        if sig_frames is not None:
            contribs.append(
                sig_frames.join(F.broadcast(pdf_leaves), "sig_id").select(
                    "query_id",
                    "leaf_id",
                    "ci",
                    "doc_id",
                    # exact single-engine order: ((idf_sum · tfn) · boost) · fmult
                    (
                        (F.col("idf_sum") * F.col("tfn")) * F.col("boost") * F.col("fmult")
                    ).alias("score"),
                    "is_must",
                    "is_not",
                )
            )

    if not contribs:
        return spark.createDataFrame([], out_schema)
    contrib = contribs[0]
    for c in contribs[1:]:
        contrib = contrib.unionByName(c)

    # ONE exchange for the whole combine: hash-cluster the contributions
    # by query_id — a partitioning on a subset of the grouping keys
    # satisfies the (query_id, doc_id) aggregation's distribution, the
    # per-query tree kernel groups on it directly, and the per-query
    # top-k window needs exactly it. Without this, Spark exchanges three
    # times (agg on both keys → window re-shuffle; ~850 MB of shuffle at
    # the 1k-query bench). Scores are unchanged: the fold order is fixed
    # by array_sort before summation, not by row arrival.
    contrib = contrib.repartition("query_id")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))

    def _topk(scored: DataFrame) -> DataFrame:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )

    scored_parts: list[DataFrame] = []

    # ---- flat combine: per-query vectorized fold + ranked top-k ------
    if flat_qids:
        fc = contrib.filter(F.col("query_id").isin(sorted(flat_qids)))
        scored_parts.append(
            fc.select(
                "query_id", "leaf_id", "doc_id", "score", "is_must", "is_not"
            )
            .groupBy("query_id")
            .applyInPandas(
                _flat_kernel(dict(n_musts), msm, k),
                "query_id long, doc_id long, score double, rank int",
            )
        )

    # ---- nested combine: vectorized tree fold ------------------------
    if nested_trees:
        nc = contrib.filter(F.col("query_id").isin(sorted(nested_trees)))
        scored_parts.append(
            _topk(
                nc.select("query_id", "leaf_id", "ci", "doc_id", "score")
                .groupBy("query_id")
                .applyInPandas(
                    _tree_kernel(nested_trees, msm),
                    "query_id long, doc_id long, score double",
                )
            )
        )

    # a query id lives in exactly one branch (flat XOR nested), so the
    # per-branch top-k windows partition the result space — union of the
    # ranked branches equals ranking the union, minus one re-shuffle of
    # the combined score stream
    out = scored_parts[0]
    for s in scored_parts[1:]:
        out = out.unionByName(s)
    return out


def _phrase_sig_frames(spark, sig_ids, decoded, fields, tfn) -> DataFrame | None:
    """(sig_id, ci, doc_id, tfn) for every phrase signature, chain-joined
    ONCE per distinct (field, terms, slop) and batched by phrase length:
    all length-L signatures of a field share L-1 joins. The chain is the
    single-engine sloppy kernel (search._sloppy_phrase_frame) — at
    slop=0 the total-window bound equals adjacency, so one kernel serves
    both and tf (an integer) is identical to the adjacency path."""
    out = None
    by_field_len: dict[tuple[str, int], list[tuple]] = {}
    for (f, terms, slop), sig in sig_ids.items():
        by_field_len.setdefault((f, len(terms)), []).append((sig, slop, terms))
    for (f, L), sigs in sorted(by_field_len.items()):
        if f not in decoded:
            continue
        dec = decoded[f].select("doc_id", "term", "positions", "doc_len")
        sig_schema = "sig_id int, slop int, " + ", ".join(
            f"t{i} string" for i in range(L)
        )
        sdf = spark.createDataFrame(
            [(sig, slop) + tuple(terms) for sig, slop, terms in sigs], sig_schema
        )
        base = (
            dec.join(F.broadcast(sdf), dec["term"] == sdf["t0"])
            .select(
                "sig_id",
                "slop",
                "doc_id",
                F.col("positions").alias("pp"),
                F.col("positions").alias("ss"),
                "doc_len",
                *[f"t{i}" for i in range(1, L)],
            )
        )
        for i in range(1, L):
            nxt = dec.select(
                F.col("doc_id").alias("doc_id_r"),
                F.col("term").alias("term_r"),
                F.col("positions").alias("pos_r"),
            )
            base = (
                base.join(
                    nxt,
                    (base["doc_id"] == nxt["doc_id_r"])
                    & (base[f"t{i}"] == nxt["term_r"]),
                    "inner",
                )
                .drop("doc_id_r", "term_r", f"t{i}")
                .withColumn(
                    "ss_new",
                    F.expr(
                        "transform(pos_r, q -> aggregate(arrays_zip(pp, ss), -1, "
                        "(acc, x) -> CASE WHEN x.pp < q THEN greatest(acc, x.ss) ELSE acc END))"
                    ),
                )
                .withColumn(
                    "z", F.expr("filter(arrays_zip(pos_r, ss_new), x -> x.ss_new >= 0)")
                )
                .select(
                    "sig_id",
                    "slop",
                    "doc_id",
                    F.expr("transform(z, x -> x.pos_r)").alias("pp"),
                    F.expr("transform(z, x -> x.ss_new)").alias("ss"),
                    "doc_len",
                    *[f"t{j}" for j in range(i + 1, L)],
                )
                .filter(F.size("pp") > 0)
            )
        frame = (
            base.withColumn(
                "tf",
                F.expr(
                    f"size(filter(arrays_zip(pp, ss), x -> x.pp - x.ss <= slop + {L - 1}))"
                ),
            )
            .filter(F.col("tf") > 0)
            # no ci column here: a signature is per-field, so the leaf
            # rows joined on sig_id already carry the field index
            .select("sig_id", "doc_id", tfn(f).alias("tfn"))
        )
        out = frame if out is None else out.unionByName(frame)
    return out


def batch_search_segments(
    si: SegmentIndex,
    queries: list[tuple[int, str]] | dict[int, str],
    k: int = 10,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    min_should_match: int = 0,
    synonyms: dict | None = None,
) -> DataFrame:
    """→ DataFrame(query_id, doc_id, score, rank) — top-k per query over
    one segment index (single default field; ``field:`` prefixes strip,
    as in single-index search). ``queries``: (query_id, query_text)
    pairs — parsing happens driver-side (queries are metadata-scale even
    at millions; the tables they produce are broadcast).
    ``min_should_match`` / ``synonyms`` apply to EVERY query in the
    batch (the engine-level knobs, same semantics as search/
    search_segments — the offline query-expansion shape)."""
    return _batch_execute(
        {"": _FieldSource(si)}, queries, k, mode, k1, b, None, None,
        min_should_match=min_should_match, synonyms=synonyms,
    )


def batch_search_fields(
    indexes: dict[str, SegmentIndex | InvertedIndex],
    queries: list[tuple[int, str]] | dict[int, str],
    k: int = 10,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    field_boosts: dict[str, float] | None = None,
    min_should_match: int = 0,
    synonyms: dict | None = None,
) -> DataFrame:
    """Multi-field batch retrieval (the batch mirror of
    :func:`search.search_fields`): a leaf scores in ANY applicable field
    (its own when ``field:``-qualified, every field otherwise) and
    per-field scores sum in field order — rank/score identical per query
    to search_fields, pinned by tests."""
    return _batch_execute(
        {f: _FieldSource(src) for f, src in indexes.items()},
        queries,
        k,
        mode,
        k1,
        b,
        field_boosts,
        frozenset(indexes),
        min_should_match=min_should_match,
        synonyms=synonyms,
    )
