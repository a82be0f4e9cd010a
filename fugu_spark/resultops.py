"""Result-shaping search operators over the table-native engine —
Lucene-parity surface beyond the reference's own API (the reference
delegates these to callers; Tantivy exposes Count / grouping / MLT
through its collector layer, cf. /root/reference/src/db/search.rs:146-162
which only ever builds TopDocs):

- ``match_count``: total hit count without materializing top-k
  (Lucene ``TotalHitCountCollector``).
- ``grouped_topk``: field collapsing / diversified results — top k docs
  per value of a grouping column (Lucene grouping module).
- ``more_like_this``: seed-document similarity query (Lucene
  ``MoreLikeThis``): rank the seed's terms by tf×idf, search the top
  ``max_terms`` as an OR query, exclude the seed.

All three are pure DataFrame compositions over the existing plan
executor — no new shuffles beyond the canonical shapes (a grand-total
partial aggregate; one window keyed by the group column; a broadcast
semi-join against the seed's vocabulary).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import BM25_B, BM25_K1
from .postings import InvertedIndex
from .queryparse import Leaf, QueryPlan, parse_query
from .queryparse import expand_plan
from .search import _tf_norm, dict_expander, execute_plan, top_k
from .tokenizer import DEFAULT_MODE, tokenize_py


def match_count(
    index: InvertedIndex,
    query_text: str | None,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Exact number of documents matching the query → one-row
    DataFrame(n_matches). ``execute_plan`` returns exactly one row per
    matched document on every path (each ends in a per-doc groupBy,
    distinct, or anti-join), so the count is a grand-total aggregate:
    map-side partials, no extra shuffle beyond the plan's own."""
    plan = parse_query(query_text, mode=mode)
    plan = expand_plan(plan, dict_expander({None: index}))
    scored = execute_plan(index, plan, k1=k1, b=b)
    return scored.agg(F.count(F.lit(1)).alias("n_matches"))


def grouped_topk(
    index: InvertedIndex,
    query_text: str | None,
    docs: DataFrame,
    group_col: str,
    k_per_group: int = 3,
    id_col: str = "doc_id",
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top ``k_per_group`` hits per value of ``docs.group_col`` →
    DataFrame(group, doc_id, score, rank_in_group), deterministic
    (score DESC, doc_id ASC within each group).

    One window shuffle keyed by the group column, over MATCHED docs
    only (not the corpus). Catalyst inserts WindowGroupLimit on the
    rank filter — a per-partition bounded top-k BEFORE the exchange —
    so each map task ships at most k_per_group rows per group it saw:
    a hot group (most of the corpus matching one value) reduces
    map-side exactly like a partial aggregate (plan pinned in
    tests/test_resultops.py)."""
    plan = parse_query(query_text, mode=mode)
    plan = expand_plan(plan, dict_expander({None: index}))
    scored = execute_plan(index, plan, k1=k1, b=b)
    joined = scored.join(
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(group_col).alias("group"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k_per_group)
        .select("group", "doc_id", F.col("score"), "rank_in_group")
        .orderBy("group", "rank_in_group")
    )


def mlt_terms(
    index: InvertedIndex, seed_doc_id: int, max_terms: int = 10
) -> list[str]:
    """Rank the seed document's terms by seed-tf × idf (ties: term ASC)
    and return the top ``max_terms``. df comes from the index's term
    dictionary via a broadcast join against the seed's vocabulary — one
    point-filtered pass over postings plus a dictionary probe; never a
    corpus-wide aggregation."""
    seed = (
        index.postings.filter(F.col("doc_id") == seed_doc_id)
        .select("term", "tf")
    )
    n = index.stats.n_docs
    ranked = (
        index.terms.join(F.broadcast(seed), "term")
        .withColumn(
            "w",
            F.col("tf")
            * F.log(1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(max_terms)
    )
    return [r["term"] for r in ranked.collect()]  # bounded: ≤ max_terms rows


def spell_suggest(
    index: InvertedIndex,
    term: str,
    n: int = 5,
    max_distance: int = 2,
) -> DataFrame:
    """'Did you mean' (Lucene DirectSpellChecker shape): the dictionary
    terms closest to a possibly-misspelled input →
    DataFrame(term, distance, df), ordered (distance ASC, df DESC,
    term ASC), the input itself excluded.

    One parallel pass over the term dictionary with a length-band
    prefilter + JVM ``levenshtein`` — the same distributed shape as
    fuzzy-leaf expansion (queryparse Q14); the dictionary is the only
    input, so cost scales with vocabulary, never the corpus."""
    t = term.lower()
    cand = index.terms.filter(
        (F.length("term") >= len(t) - max_distance)
        & (F.length("term") <= len(t) + max_distance)
        & (F.col("term") != t)
    )
    return (
        cand.withColumn("distance", F.levenshtein(F.col("term"), F.lit(t)))
        .filter(F.col("distance") <= max_distance)
        .select("term", "distance", "df")
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(n)
    )


def batch_mlt(
    index: InvertedIndex,
    max_terms: int = 5,
    k: int = 5,
    max_df: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """MoreLikeThis for EVERY document in one job → DataFrame(seed,
    cand, score, rank ≤ k): each doc's top-k lexically most-similar
    docs, the related-docs / near-dup candidate mining shape a training
    pipeline runs corpus-wide (where per-seed ``more_like_this`` calls
    would mean n_docs driver round-trips).

    Dataflow: (1) per-doc term selection — one window partitioned by
    doc over the postings (top ``max_terms`` by seed-tf × idf, ties
    term ASC); (2) candidate generation — the selected (seed, term)
    frame joins postings ON TERM, so fan-out per term is its df; tf×idf
    selection favors RARE terms, which bounds df exactly where it
    matters (a stopword never wins a tf×idf slot against any rarer
    term); (3) per-(seed, cand) score = Σ BM25 term contributions —
    partial-aggregated groupBy; (4) per-seed top-k window, which
    Catalyst rewrites with map-side WindowGroupLimit.

    ``max_df`` (Lucene MoreLikeThis ``maxDocFreq``): exclude terms with
    df above it from selection. Candidate volume is Σ df over each
    seed's selected terms, so this is THE scale knob for corpus-wide
    mining: on a real heavy-tail vocabulary the tf×idf winners are
    genuinely rare and the default (no cap) is fine, but a corpus whose
    vocabulary is tiny relative to n_docs (every term common — e.g. a
    5k-word vocab at 160k docs) degenerates toward all-pairs without
    it. Set max_df so that n_docs × max_terms × max_df pair-rows fit
    your cluster."""
    n = index.stats.n_docs
    idf = F.log(1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w_sel = Window.partitionBy("doc_id").orderBy(
        F.desc("w"), F.asc("term")
    )
    term_df = index.terms.select("term", "df")
    if max_df is not None:
        term_df = term_df.filter(F.col("df") <= max_df)
    sel = (
        index.postings.join(term_df, "term")
        .withColumn("w", F.col("tf") * idf)
        .withColumn("rn", F.row_number().over(w_sel))
        .filter(F.col("rn") <= max_terms)
        .select(F.col("doc_id").alias("seed"), "term", F.col("df"))
    )
    contrib = F.lit(1.0) * F.log(
        1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    ) * _tf_norm(F.col("tf"), F.col("doc_len"), index.stats.avgdl, k1, b)
    pairs = (
        sel.join(index.postings, "term")
        .filter(F.col("doc_id") != F.col("seed"))
        .groupBy("seed", F.col("doc_id").alias("cand"))
        .agg(F.sum(contrib).alias("score"))
    )
    w_k = Window.partitionBy("seed").orderBy(F.desc("score"), F.asc("cand"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("seed", "cand", "score", "rank")
        .orderBy("seed", "rank")
    )


def more_like_this(
    index: InvertedIndex,
    seed_doc_id: int,
    max_terms: int = 10,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Documents most similar to the seed (Lucene MoreLikeThis shape):
    BM25 OR-query over the seed's ``max_terms`` highest tf×idf terms,
    seed excluded → top-k DataFrame(doc_id, score)."""
    terms = mlt_terms(index, seed_doc_id, max_terms=max_terms)
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")
    # plan built directly from normalized dictionary terms — re-parsing a
    # joined string would re-tokenize (and split) terms like '3.4'
    plan = QueryPlan(leaves=[Leaf(terms=(t,)) for t in terms])
    scored = execute_plan(index, plan, k1=k1, b=b).filter(
        F.col("doc_id") != seed_doc_id
    )
    return top_k(scored, k=k)


def rescore(
    index: InvertedIndex,
    query_text: str,
    rescore_query: str,
    window_size: int = 100,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES/Lucene rescoring: re-rank the top ``window_size`` hits of the
    base query with a second (usually more expensive) query —
    score' = query_weight × base + rescore_weight × rescore (ES
    ``rescore`` with score_mode=total). The canonical use is phrase-
    proximity rescoring: cheap OR recall, exact phrase precision on the
    window only.

    Scale shape: the expensive query's leaf frames are semi-joined to
    the WINDOW (≤ window_size rows, broadcast by AQE) before any
    positions work — at 10^12 docs the phrase chain runs over
    window_size docs, not the corpus. Docs outside the window keep
    their base rank (ES semantics: rescoring never recalls new docs)."""
    plan = parse_query(query_text, mode=mode)
    plan = expand_plan(plan, dict_expander({None: index}))
    base = execute_plan(index, plan, k1=k1, b=b)
    window = top_k(base, k=window_size).withColumnRenamed("score", "_base")

    rplan = parse_query(rescore_query, mode=mode)
    rplan = expand_plan(rplan, dict_expander({None: index}))
    rs = execute_plan(index, rplan, k1=k1, b=b).withColumnRenamed("score", "_re")
    out = window.join(rs, "doc_id", "left").select(
        "doc_id",
        (
            F.lit(float(query_weight)) * F.col("_base")
            + F.lit(float(rescore_weight)) * F.coalesce(F.col("_re"), F.lit(0.0))
        ).alias("score"),
    )
    return top_k(out, k=k)


def field_value_factor(
    scored: DataFrame,
    docs: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES function_score / field_value_factor: multiply each matched
    doc's relevance score by a function of a document field —
    score' = score × modifier(factor × field). Modifiers: none, log1p,
    sqrt (the ES names). ``missing`` substitutes for NULL field values.

    The join is matched-set × (id, field)-pruned docs scan (column
    pruning reaches the parquet reader); the modifier is a pure JVM
    column expression — no UDF, stays inside whole-stage codegen."""
    mods = {
        "none": lambda c: c,
        "log1p": lambda c: F.log1p(c),
        "sqrt": lambda c: F.sqrt(c),
    }
    if modifier not in mods:
        raise ValueError(f"modifier must be one of {sorted(mods)}, got {modifier!r}")
    val = F.coalesce(F.col("_fv").cast("double"), F.lit(float(missing)))
    fac = mods[modifier](F.lit(float(factor)) * val)
    keyed = scored.join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(field).alias("_fv")),
        "doc_id",
        "left",
    )
    return keyed.select("doc_id", (F.col("score") * fac).alias("score"))


def phrase_suggest(
    index: InvertedIndex,
    docs: DataFrame,
    text: str,
    text_col: str = "text",
    n: int = 5,
    max_distance: int = 1,
    per_word: int = 5,
    alpha: float = 0.1,
    mode: str = DEFAULT_MODE,
) -> DataFrame:
    """ES `phrase` suggester ("did you mean" for WHOLE queries): per-word
    spelling candidates from the term dictionary re-ranked as full
    phrases by an add-α bigram language model over the corpus — the
    step beyond the term-level :func:`spell_suggest` (ES backs it with
    a shard Laplace/StupidBackoff word LM the same way).

    Pinned model (ES's smoothing internals are configurable/unspecified):
      candidates per word  dictionary terms with levenshtein ≤
                           ``max_distance`` (the word itself at 0),
                           top ``per_word`` by (distance, df DESC, term)
      score(w₁..w_k)       ln (cf(w₁)+α)/(N+αV)
                           + Σᵢ ln (c(wᵢ₋₁,wᵢ)+α)/(cf(wᵢ₋₁)+αV)
    with c(a,b) = adjacent-pair count in the corpus token stream, cf/N/V
    from the index's own dictionary and stats. Returns
    DataFrame(suggestion, score), (score DESC, suggestion ASC), top n.

    Scale shape: candidate generation is the spell_suggest dictionary
    scan per word; the bigram counts are ONE corpus token-stream pass
    filtered to the candidate pair set BEFORE its aggregation. Driver
    state is O(per_word²·k) (collected candidates + pair counts),
    independent of corpus size; phrase enumeration (≤ per_word^k,
    k ≤ 4) happens on those collected scalars."""
    from .analytics.textstats import simple_tokens

    words = [w for w, _ in tokenize_py(text, mode=mode)]
    if not 2 <= len(words) <= 4:
        raise ValueError(f"phrase_suggest takes 2-4 words, got {len(words)}")
    if per_word < 1 or max_distance < 0:
        raise ValueError("per_word >= 1 and max_distance >= 0 required")

    # per-slot candidates: bounded collects (≤ per_word rows each)
    slot_cands: list[list[tuple[str, int]]] = []
    for w in words:
        cand = (
            index.terms.filter(
                (F.length("term") >= len(w) - max_distance)
                & (F.length("term") <= len(w) + max_distance)
            )
            .withColumn("distance", F.levenshtein(F.col("term"), F.lit(w)))
            .filter(F.col("distance") <= max_distance)
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .limit(per_word)
            .select("term", "cf")
        )
        slot_cands.append([(r.term, r.cf) for r in cand.collect()])
    if any(not c for c in slot_cands):
        return docs.sparkSession.createDataFrame([], "suggestion string, score double")

    # distinct adjacent candidate pairs; ONE filtered corpus pass
    prevs = sorted({t for i in range(len(words) - 1) for t, _ in slot_cands[i]})
    nexts = sorted({t for i in range(1, len(words)) for t, _ in slot_cands[i]})
    stream = docs.select(
        F.col("doc_id").alias("__did"),
        F.posexplode(simple_tokens(F.col(text_col))).alias("pos", "w"),
    )
    w_doc = Window.partitionBy("__did").orderBy("pos")
    pair_counts = {
        (r.prev, r.w): r.c
        for r in (
            stream.withColumn("prev", F.lag("w").over(w_doc))
            .filter(F.col("prev").isin(prevs) & F.col("w").isin(nexts))
            .groupBy("prev", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()  # bounded: ≤ per_word² · (k−1) rows
        )
    }
    n_tok = float(index.stats.total_tokens)
    v = float(index.terms.count())

    # enumerate phrases over the collected scalars (≤ per_word^k, k ≤ 4)
    combos = [[(t, cf)] for t, cf in slot_cands[0]]
    for cands in slot_cands[1:]:
        combos = [c + [tc] for c in combos for tc in cands]
    rows = []
    for combo in combos:
        (w0, cf0) = combo[0]
        s = math.log((cf0 + alpha) / (n_tok + alpha * v))
        for (a, cfa), (b, _) in zip(combo, combo[1:]):
            s += math.log((pair_counts.get((a, b), 0) + alpha) / (cfa + alpha * v))
        rows.append((" ".join(t for t, _ in combo), s))
    out = docs.sparkSession.createDataFrame(rows, "suggestion string, score double")
    return out.orderBy(F.desc("score"), F.asc("suggestion")).limit(n)


def random_score(
    scored: DataFrame,
    seed: int = 0,
    weight: float = 1.0,
    mode: str = "replace",
) -> DataFrame:
    """ES function_score `random_score` with an explicit seed: a
    DETERMINISTIC per-(seed, doc) uniform value in [0, 1) — the
    reproducible-sampling / A-B-bucketing function (same seed → same
    ordering on every run and every engine). Pinned formula (ES's
    internal hash is unspecified): first 8 hex chars of
    md5("<doc_id>:<seed>") as a 32-bit int, divided by 2³².

    ``mode``: 'replace' (score := weight × r, ES's random sort use) or
    'multiply' (score ×= weight × r, the function_score combine).
    Pure JVM md5/conv column expressions over the matched set — no
    shuffle, no Python."""
    if mode not in ("replace", "multiply"):
        raise ValueError(f"mode must be replace/multiply, got {mode!r}")
    r = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(int(seed))))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    val = F.lit(float(weight)) * r
    score = val if mode == "replace" else F.col("score") * val
    return scored.select("doc_id", score.alias("score"))


def terms_set(
    index: InvertedIndex,
    terms: list[str] | tuple[str, ...],
    docs: DataFrame,
    msm_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES `terms_set` query: an OR over ``terms`` where the minimum
    number of matching terms is read PER DOCUMENT from ``msm_col``
    (ES's minimum_should_match_field) — e.g. skill matching where each
    doc declares how many of its listed codes are required. A doc
    qualifies when distinct-matched-terms ≥ its own msm value; the
    score is the plain BM25 sum of its matched leaves (bool-should
    semantics). NULL msm values never match (ES errors per-shard;
    filtering is the pinned table-side behavior).

    Plan: the canonical OR leaf scoring, plus a distinct-match count
    from the postings (map-side partial count on the same doc_id key),
    joined to the (id, msm)-pruned docs scan — no Python, no new
    shuffle shapes."""
    toks = []
    for t in terms:
        tt = [w for w, _ in tokenize_py(str(t), mode=mode)]
        if len(tt) != 1:
            raise ValueError(f"terms_set term {t!r} must analyze to one token, got {tt}")
        toks.append(tt[0])
    if not toks:
        raise ValueError("terms_set requires at least one term")
    if len(set(toks)) != len(toks):
        raise ValueError("duplicate terms in terms_set")
    plan = QueryPlan(leaves=[Leaf(terms=(t,)) for t in toks])
    scored = execute_plan(index, plan, k1=k1, b=b)
    n_match = (
        index.postings.filter(F.col("term").isin(list(toks)))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nm"))
    )
    req = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(msm_col).cast("long").alias("_req"),
    )
    out = (
        scored.join(n_match, "doc_id")
        .join(req, "doc_id", "left")
        .filter(F.col("_req").isNotNull() & (F.col("_nm") >= F.col("_req")))
        .select("doc_id", "score")
    )
    return top_k(out, k=k)


def pinned(
    index: InvertedIndex,
    ids: list[int] | tuple[int, ...],
    organic: str,
    k: int = 10,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES `pinned` query (promoted/sponsored results): the listed doc
    ids rank first, in the order given, ahead of every organic match;
    a pinned doc never re-appears in the organic tail. Pinned scores
    are the deterministic ladder 1e9 − position (pinned divergence:
    ES uses descending floats below Float.MAX_VALUE; any ladder above
    the organic range preserves its ordering contract), so the result
    is a plain (score DESC, doc_id ASC) sort like every other query.

    Plan: organic matched set ANTI-joined to the (broadcast-size) pin
    list, unioned with the driver-built pinned frame — one bounded
    top-k, no new shuffle shapes."""
    if not ids:
        raise ValueError("pinned requires at least one id")
    if len(set(ids)) != len(ids):
        raise ValueError("duplicate ids in pinned list")
    plan = expand_plan(parse_query(organic, mode=mode), dict_expander({None: index}))
    org = execute_plan(index, plan, k1=k1, b=b)
    spark = org.sparkSession
    pin = spark.createDataFrame(
        [(int(d), float(1e9 - i)) for i, d in enumerate(ids)],
        "doc_id long, score double",
    )
    organic_tail = org.join(F.broadcast(pin.select("doc_id")), "doc_id", "left_anti")
    return top_k(pin.unionByName(organic_tail), k=k)


def boosting(
    index: InvertedIndex,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
    mode: str = DEFAULT_MODE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES/Lucene `boosting` query: docs matching ``positive`` keep their
    relevance score, but those ALSO matching ``negative`` have it
    multiplied by ``negative_boost`` (demotion, not exclusion — the
    middle ground between a plain query and a must_not). The negative
    query contributes no recall: its matched set only flags rows.

    Plan: positive matched set LEFT-joined to the negative matched
    set's doc_ids (the negative side prunes to one column before the
    join), multiplier is a JVM CASE expression, then bounded top-k —
    the same two-matched-set shape as :func:`rescore`."""
    if not (0.0 <= negative_boost <= 1.0):
        raise ValueError(f"negative_boost must be in [0, 1], got {negative_boost}")
    pplan = expand_plan(parse_query(positive, mode=mode), dict_expander({None: index}))
    nplan = expand_plan(parse_query(negative, mode=mode), dict_expander({None: index}))
    pos = execute_plan(index, pplan, k1=k1, b=b)
    neg = (
        execute_plan(index, nplan, k1=k1, b=b)
        .select("doc_id")
        .withColumn("_neg", F.lit(True))
    )
    out = pos.join(neg, "doc_id", "left").select(
        "doc_id",
        (
            F.col("score")
            * F.when(F.col("_neg"), F.lit(float(negative_boost))).otherwise(F.lit(1.0))
        ).alias("score"),
    )
    return top_k(out, k=k)


def decay_score(
    scored: DataFrame,
    docs: DataFrame,
    field: str,
    origin: float,
    scale: float,
    kind: str = "gauss",
    offset: float = 0.0,
    decay: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES function_score decay (gauss / exp / linear): multiply each
    matched doc's relevance score by a distance decay on a numeric
    field — the multiplier is ``decay`` exactly ``scale`` away from
    ``origin`` and 1.0 within ``offset`` of it.

    With dist = max(0, |field − origin| − offset), the Lucene formulas:

      gauss   exp(−dist² / 2σ²),  σ² = scale² / (2·ln(1/decay))
      exp     exp(ln(decay) · dist / scale)
      linear  max(0, (s − dist) / s),  s = scale / (1 − decay)

    Date fields: cast to epoch seconds caller-side and pass origin/scale
    in seconds. A NULL/missing field leaves the score unchanged
    (multiplier 1.0 — the ES behavior for docs without the field).

    Same plan shape as :func:`field_value_factor`: matched set joined to
    the (id, field)-pruned docs scan; the decay is a pure JVM column
    expression, no UDF."""
    if scale <= 0:
        raise ValueError(f"scale must be > 0, got {scale}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    dist = F.greatest(
        F.abs(F.col("_fv").cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    if kind == "gauss":
        sigma2 = scale * scale / (2.0 * math.log(1.0 / decay))
        mult = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    elif kind == "exp":
        mult = F.exp(F.lit(math.log(decay) / scale) * dist)
    elif kind == "linear":
        s = scale / (1.0 - decay)
        mult = F.greatest((F.lit(s) - dist) / F.lit(s), F.lit(0.0))
    else:
        raise ValueError(f"kind must be gauss/exp/linear, got {kind!r}")
    # missing-field neutrality made EXPLICIT (ADVICE r5): greatest()
    # skipping the NULL distance happened to yield mult=1.0 for every
    # kind, but that invariant would silently break if the dist
    # expression changed — gate on the field itself instead
    mult = F.when(F.col("_fv").isNull(), F.lit(1.0)).otherwise(mult)
    keyed = scored.join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(field).alias("_fv")),
        "doc_id",
        "left",
    )
    return keyed.select(
        "doc_id",
        (F.col("score") * mult).alias("score"),
    )


def term_vectors(
    index, doc_id: int, with_stats: bool = True
) -> DataFrame:
    """ES `_termvectors` API shape: one document's analyzed view —
    (term, tf, positions[, df, cf]) — the per-doc inverse of a search.

    Plan: a point-filtered postings read (doc_id reaches the scan) plus,
    with stats, a dictionary join restricted to the doc's own terms (a
    per-doc-bounded broadcast, never the whole dictionary). ES computes
    the same thing from a single shard's TermVectorsService; here the
    postings ARE the term vectors, so no separate stored structure is
    needed."""
    from pyspark.sql import functions as F

    own = index.postings.filter(F.col("doc_id") == doc_id).select(
        "term", F.col("tf").cast("long").alias("tf"), "positions"
    )
    if not with_stats:
        return own.orderBy("term")
    stats = index.terms.select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )
    return own.join(stats, "term").orderBy("term")
