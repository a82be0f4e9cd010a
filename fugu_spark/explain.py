"""Score explanation — the Lucene ``IndexSearcher.explain`` analog.

For one (query, doc) pair, emit every leaf's BM25 components so a human
(or a parity test) can audit exactly how the score came to be:

    leaf_id, occur, kind, term, tf, df, idf, tf_norm, boost, contribution

``sum(contribution)`` over the rows equals the score the search paths
return for that doc (pinned by test); a doc excluded by boolean
semantics (missing must, matching must_not) still gets its matching
leaves listed — the ``occur`` column tells the reader why the doc may
nonetheless be absent from results.

Scale shape: the postings scan is filtered to ONE doc and the query's
terms before anything else runs (predicate reaches the scan), and the
output is ≤ #leaves rows — explain is a point lookup, not a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bm25 import BM25_B, BM25_K1, idf_py
from .queryparse import DEFAULT_MODE, parse_query
from .search import _phrase_frame, _tf_norm, dict_expander

_SCHEMA = (
    "leaf_id int, occur string, kind string, term string, tf long, df long, "
    "idf double, tf_norm double, boost double, contribution double"
)


def explain(
    index,
    query_text: str | None,
    doc_id: int,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-leaf score breakdown for ``doc_id`` → DataFrame(_SCHEMA).

    Prefix/fuzzy/regex leaves are expanded against the dictionary first
    (the same machinery the search paths use), so the breakdown shows
    the CONCRETE terms that scored, not the pattern."""
    from .queryparse import expand_plan

    spark = index.postings.sparkSession
    plan = parse_query(query_text, mode=mode)
    plan = expand_plan(plan, dict_expander({None: index}))
    if plan.is_all:
        return spark.createDataFrame(
            [(0, "should", "all", None, None, None, None, None, 1.0, 1.0)], _SCHEMA
        )

    stats = index.stats
    all_terms = plan.all_terms()
    # ONE point-filtered scan feeds every leaf below
    cand = index.postings.filter(
        (F.col("doc_id") == doc_id) & F.col("term").isin(all_terms)
    )
    df_map = index.df_map
    if df_map is None or any(t not in df_map for t in all_terms):
        rows = (
            index.terms.filter(F.col("term").isin(all_terms))
            .select("term", "df")
            .collect()
        )
        df_map = {r["term"]: r["df"] for r in rows}

    frames: list[DataFrame] = []
    for i, leaf in enumerate(plan.leaves):
        if leaf.rng is not None:
            lo, hi, incl_lo, incl_hi = leaf.rng
            rng_cand = index.postings.filter(F.col("doc_id") == doc_id)
            if lo is not None:
                rng_cand = rng_cand.filter(
                    F.col("term") >= lo if incl_lo else F.col("term") > lo
                )
            if hi is not None:
                rng_cand = rng_cand.filter(
                    F.col("term") <= hi if incl_hi else F.col("term") < hi
                )
            frames.append(
                rng_cand.limit(1).select(
                    F.lit(i).alias("leaf_id"),
                    F.lit(leaf.occur).alias("occur"),
                    F.lit("range").alias("kind"),
                    F.col("term"),
                    F.lit(None).cast("long").alias("tf"),
                    F.lit(None).cast("long").alias("df"),
                    F.lit(None).cast("double").alias("idf"),
                    F.lit(None).cast("double").alias("tf_norm"),
                    F.lit(leaf.boost).alias("boost"),
                    F.lit(leaf.boost).alias("contribution"),  # constant score
                )
            )
            continue
        if any(t not in df_map for t in leaf.terms):
            continue  # dead leaf — no contribution
        if leaf.is_phrase:
            pf = _phrase_frame(cand, leaf, df_map, stats, k1, b)
            if pf is None:
                continue
            ph = tuple(dict.fromkeys(leaf.terms)) if leaf.near else leaf.terms
            idf_sum = sum(idf_py(df_map[t], stats.n_docs) for t in ph)
            frames.append(
                pf.filter(F.col("doc_id") == doc_id).select(
                    F.lit(i).alias("leaf_id"),
                    F.lit(leaf.occur).alias("occur"),
                    F.lit("span_near" if leaf.near else "phrase").alias("kind"),
                    F.lit(" ".join(leaf.terms)).alias("term"),
                    F.lit(None).cast("long").alias("tf"),
                    F.lit(None).cast("long").alias("df"),
                    F.lit(idf_sum).alias("idf"),
                    (F.col("score") / F.lit(idf_sum * leaf.boost)).alias("tf_norm"),
                    F.lit(leaf.boost).alias("boost"),
                    F.col("score").alias("contribution"),
                )
            )
            continue
        t = leaf.terms[0]
        idf = idf_py(df_map[t], stats.n_docs)
        frames.append(
            cand.filter(F.col("term") == t).select(
                F.lit(i).alias("leaf_id"),
                F.lit(leaf.occur).alias("occur"),
                F.lit("term").alias("kind"),
                F.col("term"),
                F.col("tf").cast("long").alias("tf"),
                F.lit(df_map[t]).cast("long").alias("df"),
                F.lit(idf).alias("idf"),
                _tf_norm(F.col("tf"), F.col("doc_len"), stats.avgdl, k1, b).alias(
                    "tf_norm"
                ),
                F.lit(leaf.boost).alias("boost"),
                (
                    F.lit(idf)
                    * _tf_norm(F.col("tf"), F.col("doc_len"), stats.avgdl, k1, b)
                    * F.lit(leaf.boost)
                ).alias("contribution"),
            )
        )
    if not frames:
        return spark.createDataFrame([], _SCHEMA)
    from functools import reduce

    out = reduce(DataFrame.unionByName, frames)
    return out.orderBy("leaf_id")


def explain_served(
    searcher,
    query_text: str | None,
    doc_id: int,
):
    """Serving-latency explain over the LocalSearcher's sidecars →
    pandas DataFrame(_SCHEMA columns). Term leaves only (the shapes the
    local fast path serves); same numbers as ``explain`` (pinned)."""
    import pandas as pd

    from .queryparse import expand_plan

    plan = parse_query(query_text, mode=searcher.mode)
    if any(l.prefix_last or l.regex for l in plan.leaves):
        plan = expand_plan(plan, searcher._prefix_expander())
    if any(l.is_phrase or l.fuzzy or l.rng is not None for l in plan.leaves):
        raise ValueError(
            "served explain covers term leaves — use explain() on the "
            "distributed index for phrase/fuzzy/range breakdowns"
        )
    meta = searcher.term_meta(plan.all_terms())
    live = sorted(t for t in plan.all_terms() if t in meta)
    postings = searcher._postings_cached(live, meta, False, lambda rows: rows)
    rows = []
    for i, leaf in enumerate(plan.leaves):
        t = leaf.terms[0]
        p = postings.get(t)
        if p is None:
            continue
        import numpy as np

        j = np.searchsorted(p["doc_ids"], doc_id)
        if j >= len(p["doc_ids"]) or p["doc_ids"][j] != doc_id:
            continue
        tf, dl = int(p["tfs"][j]), float(p["doc_lens"][j])
        idf = meta[t]["idf"]
        tfn = tf * (searcher.k1 + 1) / (
            tf + searcher.k1 * (1 - searcher.b + searcher.b * dl / searcher.avgdl)
        )
        rows.append(
            (i, leaf.occur, "term", t, tf, int(meta[t]["df"]), idf, tfn,
             leaf.boost, idf * tfn * leaf.boost)
        )
    return pd.DataFrame(
        rows,
        columns=["leaf_id", "occur", "kind", "term", "tf", "df", "idf",
                 "tf_norm", "boost", "contribution"],
    )
