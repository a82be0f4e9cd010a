"""Training-data curation operators: deterministic splits, stratified
sampling, PII scan/redaction, repetition statistics, benchmark
contamination, C4-style rule filters, and incremental dedup against an
existing corpus.

Everything here is designed for the 100-TB shape first:

- ``split_assign`` / ``stratified_sample`` / ``pii_*`` / ``c4_filters``
  are pure column expressions — narrow, whole-stage-codegen'd, zero
  shuffle, and their filters push down to the parquet scan.
- ``repetition_stats`` folds over the token array with ``F.aggregate``
  instead of explode+groupBy, so per-doc statistics never shuffle: the
  work is proportional to tokens per document, not corpus size.
- ``contamination`` broadcasts the (small) benchmark gram set; the
  corpus side stays narrow after one per-doc explode.
- ``dedup_against`` is a broadcast-able left-anti join on a normalized
  content fingerprint; when the existing corpus is large, Spark falls
  back to a shuffled anti-join on the (already tiny) fingerprint
  projection.

Determinism contract: all hashes are the md5-60bit construction from
:func:`fugu_spark.analytics.textstats.gram_hash60`, so every operator is
reproducible across runs/engines and each has an exact ANSI-SQL oracle
(see ``__spark_entry__.oracle_sql``).

Reference scope note: the reference engine (mycorrhiza-inc/fugu) stops
at indexing/search; these operators extend the engine toward the
training-data pipeline described in SURVEY.md §6 and are fugu_spark
originals (no reference counterpart to cite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import gram_hash60, simple_tokens

# ---------------------------------------------------------------- splits

_SPLIT_BUCKETS = 10_000

DEFAULT_SPLIT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}


def _id_hash(id_col: Column, seed: int, salt: str = "") -> Column:
    """Deterministic 60-bit hash of (seed, salt, id) — the split/sample
    coin. md5-based so DuckDB computes the identical value."""
    return gram_hash60(F.concat_ws(":", F.lit(str(seed)), F.lit(salt), id_col.cast("string")))


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Add a deterministic ``split`` column ('train'/'val'/'test'/...).

    The assignment is a pure function of (seed, id): stable under
    re-runs, re-partitioning, and incremental appends — a new document
    lands in the same split no matter when it arrives, which is the
    property a training pipeline actually needs (no leakage when the
    corpus is rebuilt). Buckets are ``hash(id) % 10000`` against the
    cumulative weight table, so weights are honored to 0.01%.

    Narrow, codegen'd, no shuffle.
    """
    w = weights or DEFAULT_SPLIT_WEIGHTS
    total = sum(w.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    bucket = _id_hash(F.col(id_col), seed) % _SPLIT_BUCKETS
    expr: Column | None = None
    acc = 0.0
    # deterministic order: insertion order of the weights dict
    items = list(w.items())
    for name, frac in items[:-1]:
        acc += frac / total
        bound = int(round(acc * _SPLIT_BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", split)


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``hash(seed, stratum, id) % 1e6 < fraction * 1e6``.

    Unlike ``DataFrame.sample`` this is reproducible across runs and
    cluster sizes (no RNG state per partition), and the per-stratum rate
    is exact in expectation regardless of how rows are distributed over
    partitions. ``fractions`` overrides the rate for specific stratum
    values. Narrow, no shuffle; the predicate cannot push to parquet
    (hash of two columns) but evaluates in codegen at scan speed.
    """
    m = 1_000_000
    coin = gram_hash60(
        F.concat_ws(
            ":", F.lit(str(seed)), F.col(strata_col).cast("string"), F.col(id_col).cast("string")
        )
    ) % m
    thresh: Column = F.lit(int(round(fraction * m)))
    for val, frac in sorted((fractions or {}).items()):
        thresh = F.when(F.col(strata_col) == val, F.lit(int(round(frac * m)))).otherwise(thresh)
    return docs.filter(coin < thresh)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic corpus mixing: sample each stratum so the OUTPUT
    follows the target distribution ``weights`` (e.g. 50% web, 30% code,
    20% papers) — the data-mixing step of an LLM training recipe.

    The largest achievable output is ``T = min_s(n_s / w_s)`` (the
    scarcest stratum saturates); each stratum keeps ``w_s·T / n_s`` of
    its rows via the same stable hash coin as
    :func:`stratified_sample` — so the mix is reproducible and a given
    document's membership never depends on partitioning. Strata not in
    ``weights`` are dropped.

    Scale shape: one tiny groupBy-count (|strata| rows collected), then
    a narrow hash-filter scan. The count pass is the only shuffle.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive fractions")
    total_w = sum(weights.values())
    norm = {k: w / total_w for k, w in weights.items()}
    counts = {
        r["stratum"]: r["n"]
        for r in docs.groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["stratum"] in norm
    }
    missing = set(norm) - set(counts)
    if missing:
        raise ValueError(f"strata absent from the corpus: {sorted(missing)}")
    # achievable output size, saturated by the scarcest stratum
    cap = min(counts[s] / norm[s] for s in norm)
    fractions = {s: norm[s] * cap / counts[s] for s in norm}
    out = docs.filter(F.col(strata_col).isin(list(norm)))
    return stratified_sample(
        out, 0.0, strata_col=strata_col, id_col=id_col, seed=seed, fractions=fractions
    )


def pack_sequences(
    docs: DataFrame,
    cap_tokens: int,
    n_streams: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Assign documents to training-sequence packs of ~``cap_tokens``
    tokens: contiguous first-fit within ``n_streams`` independent
    streams. Output: ``(doc_id, n_tokens, stream, pack_id)`` where
    ``(stream, pack_id)`` identifies the pack.

    A single global running sum cannot scale (one ordered partition), so
    packing runs in ``n_streams`` hash-assigned streams — each a window
    partition that packs independently and deterministically (ordered by
    id). Packs may overflow ``cap_tokens`` by at most one document
    (documents are never split); degenerate docs longer than the cap get
    a pack of their own. At 100 TB, set ``n_streams`` >= cluster cores so
    every executor packs in parallel.
    """
    from pyspark.sql import Window

    from .textstats import token_count

    if cap_tokens <= 0 or n_streams <= 0:
        raise ValueError("cap_tokens and n_streams must be positive")
    base = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        (_id_hash(F.col(id_col), seed, "pack") % n_streams).alias("stream"),
    )
    w = Window.partitionBy("stream").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens").over(w)
    # pack by starting offset: the doc whose tokens start at offset o
    # joins pack floor(o / cap)
    return base.select(
        id_col,
        "n_tokens",
        "stream",
        F.floor((cum - F.col("n_tokens")) / F.lit(cap_tokens)).cast("long").alias("pack_id"),
    )


# ------------------------------------------------------------------ PII

# Patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, no possessive quantifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (``n_email``/``n_ipv4``/``n_phone``)
    plus ``has_pii``. Pure regexp column expressions — narrow, codegen'd,
    suitable as a pre-filter before any external egress of corpus text."""
    t = F.col(text_col)
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        )
    flags = [F.col(f"n_{name}") > 0 for name in PII_PATTERNS]
    has = flags[0]
    for fl in flags[1:]:
        has = has | fl
    return out.withColumn("has_pii", has)


def pii_redact(text_col: Column) -> Column:
    """Replace every PII match with a typed placeholder ('[EMAIL]'…).
    Single pass per pattern, global replacement (Spark regexp_replace
    semantics; the DuckDB oracle passes the 'g' flag for parity)."""
    out = text_col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


# --------------------------------------------------------- repetition

def _max_multiplicity(arr: Column) -> Column:
    """Largest number of occurrences of any single element, computed as a
    fold over the SORTED array (state = (prev, run, best)) — no explode,
    no shuffle, O(len) per row inside codegen."""
    sorted_arr = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(s: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(s["prev"]), s["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(s["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, step, lambda s: s["best"])


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``n_tokens`` — token count;
    - ``dup_token_frac`` — fraction of tokens that are repeats of an
      earlier token (1 − distinct/total);
    - ``top_token_frac`` — occurrences of the most frequent token / total
      (Gopher's "fraction in most common word");
    - ``top_bigram_frac`` — same for word bigrams.

    High values mark degenerate/boilerplate documents that poison LLM
    training. Entirely column expressions (array fold, no explode):
    per-doc cost is O(tokens log tokens), corpus cost is one narrow scan.
    """
    toks = simple_tokens(F.col(text_col))
    # guard: sequence(1, 0) would yield [1, 0] (descending), so only
    # build bigrams when there are at least 2 tokens
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    safe = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    ng = F.size(grams).cast("long")
    gsafe = F.when(ng > 0, ng.cast("double")).otherwise(F.lit(1.0))
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ((n - nd).cast("double") / safe).alias("dup_token_frac"),
        (_max_multiplicity(toks).cast("double") / safe).alias("top_token_frac"),
        (_max_multiplicity(grams).cast("double") / gsafe).alias("top_bigram_frac"),
    )


# ------------------------------------------------------- contamination

def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination score: for each document, the fraction of
    its distinct word n-grams that appear anywhere in ``benchmark`` —
    the standard train/eval overlap check before a training run.

    Output: ``(doc_id, n_grams, n_contaminated, contamination_frac)``;
    documents with fewer than ``n`` tokens report ``n_grams = 0`` and
    fraction 0.

    Scale shape: the benchmark gram set is distinct-ed and broadcast
    (eval suites are small by construction — if yours is not, Spark's
    AQE demotes the broadcast automatically); the corpus side explodes
    to distinct grams per doc and aggregates back by doc id — one
    map-side-combined shuffle keyed by doc, no corpus self-join.
    """

    def _grams(df: DataFrame) -> DataFrame:
        toks = simple_tokens(F.col(text_col))
        # guard: only evaluate the sequence when size >= n (sequence(1,0)
        # is the descending [1,0]); docs with < n tokens yield no grams
        g = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col(id_col), F.explode(F.array_distinct(g)).alias("gram")
        )

    bench_grams = _grams(benchmark).select("gram").distinct()
    doc_grams = _grams(docs)
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_contaminated"),
    )
    base = docs.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination_frac"),
    )


# --------------------------------------------------------- C4 filters

def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_word_len: int = 25,
) -> DataFrame:
    """C4-style heuristic quality flags + keep decision (Raffel et al.
    2020 §2.2, the public cleaning recipe): too few words, pathological
    word length, lorem-ipsum boilerplate, code brace, and terminal
    punctuation. ``keep`` is the conjunction used by C4. Pure column
    expressions — the ``keep`` predicate runs at scan speed and prunes
    the corpus before any heavier operator."""
    t = F.col(text_col)
    toks = simple_tokens(t)
    low = F.lower(t)
    n_words = F.size(toks)
    flag_few = n_words < F.lit(min_words)
    flag_long = F.exists(toks, lambda x: F.length(x) > max_word_len)
    flag_lorem = low.contains("lorem ipsum")
    flag_brace = t.contains("{")
    ends_punct = F.rtrim(t).rlike(r"[.!?\"']$")
    return docs.select(
        F.col(id_col),
        flag_few.alias("too_few_words"),
        flag_long.alias("has_long_word"),
        flag_lorem.alias("has_lorem"),
        flag_brace.alias("has_brace"),
        ends_punct.alias("ends_with_punct"),
        (~flag_few & ~flag_long & ~flag_lorem & ~flag_brace & ends_punct).alias("keep"),
    )


# Stop words for the Gopher containment rule (Rae et al. 2021, App. A:
# a document must contain at least 2 of these common English words).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021, Appendix A — the
    other public curation recipe next to C4): word-count band, mean
    word length band, hash/ellipsis symbol-to-word ratio, bullet-line
    and ellipsis-line fractions, fraction of words with an alphabetic
    character, and stop-word containment. ``keep`` is the conjunction.
    Words are WHITESPACE-split (the paper's unit — symbols count, unlike
    the index tokenizer); pure column expressions, so ``keep`` runs at
    scan speed ahead of heavier operators."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
    words_low = F.transform(words, F.lower)
    n_words = F.size(words)
    nw = n_words.cast("double")
    mean_wl = F.aggregate(
        words, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    ) / nw
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("double")
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("double")
    sym_ratio = (n_hash + n_ell) / nw
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != F.lit(""))
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    frac_bullet = (
        F.size(
            F.filter(
                lines,
                lambda x: F.trim(x).startswith("- ")
                | F.trim(x).startswith("* ")
                | F.trim(x).startswith("•"),
            )
        ).cast("double")
        / nl
    )
    frac_ell_lines = (
        F.size(
            F.filter(
                lines,
                lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
            )
        ).cast("double")
        / nl
    )
    frac_alpha = (
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw
    )
    n_stop = F.aggregate(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        F.lit(0),
        lambda acc, s: acc + F.when(F.array_contains(words_low, s), 1).otherwise(0),
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (frac_bullet <= max_bullet_frac)
        & (frac_ell_lines <= max_ellipsis_frac)
        & (frac_alpha >= min_alpha_frac)
        & (n_stop >= min_stop_hits)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(frac_bullet, 6).alias("frac_bullet_lines"),
        F.round(frac_ell_lines, 6).alias("frac_ellipsis_lines"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        n_stop.alias("n_stop_hits"),
        keep.alias("keep"),
    )


# --------------------------------------------- incremental exact dedup

def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: rows of ``new_docs`` whose normalized
    content fingerprint (md5 over the token stream — whitespace/punct
    insensitive) does NOT already occur in ``corpus``. The ingest-time
    companion to :func:`fugu_spark.analytics.dedup.exact_dedup`: dedup a
    new batch against what is already indexed without re-scanning pairs.

    Scale shape: only the fingerprint column of ``corpus`` is read
    (column pruning reaches the scan), and the anti-join broadcasts when
    that projection is small; otherwise it is a hash anti-join shuffled
    on the fingerprint — never a pairwise comparison.
    """
    from .textstats import fingerprint_md5

    fp = fingerprint_md5(F.col(text_col)).alias("_fp")
    new_fp = new_docs.withColumn("_fp", fingerprint_md5(F.col(text_col)))
    corpus_fp = corpus.select(fp).distinct()
    return new_fp.join(corpus_fp, "_fp", "left_anti").drop("_fp")


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim_re: str = r"\n{2,}",
    joiner: str = "\n\n",
) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the MassiveText /
    Gopher recipe removes duplicate paragraphs corpus-wide, not just
    duplicate documents). A paragraph = non-empty trimmed segment after
    splitting ``text_col`` on ``delim_re``; each distinct paragraph
    (by 60-bit md5 hash) survives ONLY in its first occurrence — ordered
    by (doc_id, paragraph index) — and per-doc text is reassembled from
    the survivors with ``joiner``.

    100-TB shape: winner selection is a groupBy(paragraph_hash) min of a
    (doc_id, par_idx) struct — map-side partial aggregation, so a
    corpus-wide boilerplate paragraph (license header, nav chrome)
    collapses to one row per input partition before the shuffle instead
    of hot-keying a window partition. Returns
    (id, text_dedup, n_pars, n_pars_kept) for EVERY input doc; a doc
    whose every paragraph lost comes back with empty text.
    """
    pars = (
        docs.select(
            F.col(id_col).cast("long").alias("_did"),
            F.posexplode(F.split(F.col(text_col), delim_re)).alias("par_idx", "par"),
        )
        .withColumn("par", F.trim("par"))
        .filter(F.col("par") != "")
        .withColumn("ph", gram_hash60(F.col("par")))
    )
    winners = pars.groupBy("ph").agg(F.min(F.struct("_did", "par_idx")).alias("w"))
    kept = (
        pars.join(winners, "ph")
        .filter(
            (F.col("_did") == F.col("w._did")) & (F.col("par_idx") == F.col("w.par_idx"))
        )
        .drop("w")
    )
    per_doc_all = pars.groupBy("_did").agg(F.count(F.lit(1)).alias("n_pars"))
    per_doc_kept = kept.groupBy("_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("par_idx", "par"))),
                lambda x: x["par"],
            ),
            joiner,
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_pars_kept"),
    )
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(per_doc_all.withColumnRenamed("_did", id_col), id_col, "left")
        .join(per_doc_kept.withColumnRenamed("_did", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_pars", F.lit(0)).alias("n_pars"),
            F.coalesce("n_pars_kept", F.lit(0)).alias("n_pars_kept"),
        )
    )
