"""Text analysis for corpus curation: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All hot-path variants are pure column expressions (JVM-side, codegen'd,
SQL-expressible for the DuckDB oracle). ``simple_tokens`` is the ASCII
analog of the normative tokenizer — adequate for analytics columns; the
index build always uses the full pandas tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small fixed stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "pas", "que", "en", "du"],
}


def simple_tokens(text_col: Column) -> Column:
    """Lowercase alnum-run tokens as an array column (ASCII analog of the
    normative analyzer; matches DuckDB regexp_split_to_array oracle)."""
    return F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != ""
    )


def token_count(text_col: Column) -> Column:
    return F.size(simple_tokens(text_col)).cast("long")


# GPT-2-style pre-tokenizer shape, ASCII-simplified so the SAME pattern
# runs in Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|'| ?\s+"


def bpe_token_count(text_col: Column) -> Column:
    """Subword-ish token count: matches of the BPE-style pre-tokenizer
    regex (the standard cheap proxy for LLM token budgeting when the
    real BPE merges aren't available)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def distinct_token_count(text_col: Column) -> Column:
    return F.size(F.array_distinct(simple_tokens(text_col))).cast("long")


def stopword_ratio(text_col: Column, lang: str = "en") -> Column:
    toks = simple_tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def avg_token_len(text_col: Column) -> Column:
    toks = simple_tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text_col: Column) -> Column:
    """Deterministic 0..1 quality heuristic: length saturation (40%),
    lexical diversity (40%), penalized stopword dominance (20%)."""
    toks = simple_tokens(text_col)
    n = F.size(toks).cast("double")
    length_part = F.least(F.lit(1.0), n / F.lit(100.0))
    diversity = F.when(n > 0, F.size(F.array_distinct(toks)).cast("double") / n).otherwise(
        F.lit(0.0)
    )
    sw_pen = F.lit(1.0) - stopword_ratio(text_col, "en")
    return F.lit(0.4) * length_part + F.lit(0.4) * diversity + F.lit(0.2) * sw_pen


def lang_id(text_col: Column, threshold: float = 0.05) -> Column:
    """Stopword-ratio argmax over known languages; 'und' below threshold."""
    ratios = {lang: stopword_ratio(text_col, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_ratio = F.lit(float(threshold))
    # deterministic order: iterate sorted langs; strict '>' keeps first-best
    for lang in sorted(STOPWORDS):
        r = ratios[lang]
        cond = r > best_ratio
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(cond, r).otherwise(best_ratio)
    return best_lang


def fingerprint_md5(text_col: Column) -> Column:
    """Whitespace/punct-insensitive content fingerprint: md5 over the
    normalized token stream (matches DuckDB md5 for the oracle)."""
    return F.md5(F.array_join(simple_tokens(text_col), " "))


def gram_hash60(gram: Column) -> Column:
    """Deterministic 60-bit gram hash: first 15 hex chars of md5, as a
    BIGINT. Chosen over xxhash/pandas-hash because the SAME value is
    computable in ANSI SQL (DuckDB: ``('0x' || substr(md5(g),1,15))::BIGINT``)
    — keeping winnowing oracle-checkable end to end."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (rolling k-gram hashes, per-window minima) —
    the standard local document fingerprint for near-dup/plagiarism scans.

    Pure column expressions (JVM codegen, no Python workers); output is
    EXPLODED scalar rows ``(doc_id, fingerprint)`` so downstream sorts /
    joins / the driver canonicalizer never see an array column. Docs with
    fewer than ``k`` tokens produce no rows.
    """
    toks = simple_tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    h = F.transform(grams, gram_hash60)
    # rolling min over `window` consecutive gram hashes; <=window grams →
    # a single global min (same value the rolling form yields at i = n)
    fps = (
        F.when(F.size(h) == 0, F.array().cast("array<bigint>"))
        .when(F.size(h) <= window, F.array(F.array_min(h)))
        .otherwise(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(h) - (window - 1)),
                        lambda j: F.array_min(F.slice(h, j, window)),
                    )
                )
            )
        )
    )
    return docs.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def bigram_lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 use KenLM
    perplexity to bucket CommonCrawl into head/middle/tail): score every
    document by the perplexity of an add-α-smoothed BIGRAM model —
    P(w|prev) = (c(prev,w) + α) / (c(prev) + α·V), first token scored by
    the unigram P(w) = (c(w) + α) / (N + α·V); perplexity =
    exp(−Σ ln P / n_tokens). Lower = more natural under the reference
    corpus. ``lm_docs`` supplies the training corpus (CCNet trains on
    Wikipedia); default = score against the corpus itself.

    Everything is JVM column work: one posexplode to the token stream, a
    lag window per doc for the bigram stream, two count aggregations for
    the model, two shuffle joins to attach counts, one per-doc aggregate.
    The model tables are (vocab)- and (bigram)-sized — far smaller than
    the corpus — and broadcast when small. No UDF, no driver state."""
    toks = docs.select(
        F.col(id_col).alias("__did"),
        F.posexplode(simple_tokens(F.col(text_col))).alias("pos", "w"),
    )
    src = toks if lm_docs is None else lm_docs.select(
        F.col(id_col).alias("__did"),
        F.posexplode(simple_tokens(F.col(text_col))).alias("pos", "w"),
    )
    w_doc = Window.partitionBy("__did").orderBy("pos")
    big_src = src.withColumn("prev", F.lag("w").over(w_doc))
    uni = src.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    ctx = big_src.filter(F.col("prev").isNotNull()).groupBy("prev").agg(
        F.count(F.lit(1)).alias("c_prev")
    )
    big = big_src.filter(F.col("prev").isNotNull()).groupBy("prev", "w").agg(
        F.count(F.lit(1)).alias("c_big")
    )
    # scalars: vocab size and total tokens (tiny aggregate, broadcast)
    totals = src.agg(
        F.count_distinct("w").alias("__v"), F.count(F.lit(1)).alias("__n")
    )
    stream = toks.withColumn("prev", F.lag("w").over(w_doc))
    scored = (
        stream.join(big, ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .join(uni, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__did",
            F.when(
                F.col("prev").isNull(),
                F.log(
                    (F.coalesce(F.col("c_w"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__n") + F.lit(alpha) * F.col("__v"))
                ),
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.lit(alpha) * F.col("__v"))
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy(F.col("__did").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.exp(-F.avg("lp")), 6).alias("perplexity"),
    )
