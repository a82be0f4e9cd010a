"""Training-data curation operators: splits, sampling, PII, repetition,
contamination, C4 filters, incremental dedup (fugu_spark/analytics/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.analytics import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today.", "en"),
        (2, "spam spam spam spam spam spam spam spam spam spam", "en"),
        (3, "mail me at alice@example.org or call 555-123-4567 now!", "en"),
        (4, "short", "en"),
        (5, "el rapido zorro marron salta sobre el perro perezoso hoy.", "es"),
        (6, "curly brace { appears here making this code-like text.", "en"),
        (7, "lorem ipsum dolor sit amet consectetur adipiscing elit sed.", "en"),
        (8, "a b a b a b a b a b a b", "en"),
        (9, "server at 10.0.0.1 and 192.168.1.254 responded fine today.", "en"),
        (10, "the quick brown fox jumps over the lazy dog today.", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- splits


def test_split_assign_deterministic_and_partitioned(spark, docs):
    a = {r.doc_id: r.split for r in C.split_assign(docs).collect()}
    b = {r.doc_id: r.split for r in C.split_assign(docs.repartition(7)).collect()}
    assert a == b  # stable under partitioning
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_assign_weights_converge(spark):
    big = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    frac = {
        r.split: r["count"]
        for r in C.split_assign(big, weights={"train": 0.8, "val": 0.2})
        .groupBy("split")
        .count()
        .collect()
    }
    total = sum(frac.values())
    assert total == 20000
    assert abs(frac["train"] / total - 0.8) < 0.02
    assert abs(frac["val"] / total - 0.2) < 0.02


def test_split_assign_stable_under_append(spark):
    """A doc's split must not depend on what else is in the corpus."""
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s = {r.doc_id: r.split for r in C.split_assign(small).collect()}
    b = {r.doc_id: r.split for r in C.split_assign(big).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_stratified_sample_rates_and_determinism(spark):
    big = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    samp = C.stratified_sample(big, 0.1, strata_col="lang", fractions={"2": 0.5})
    counts = {r.lang: r["count"] for r in samp.groupBy("lang").count().collect()}
    assert abs(counts["0"] / 10000 - 0.1) < 0.02
    assert abs(counts["1"] / 10000 - 0.1) < 0.02
    assert abs(counts["2"] / 10000 - 0.5) < 0.02
    again = set(r.doc_id for r in C.stratified_sample(
        big, 0.1, strata_col="lang", fractions={"2": 0.5}).collect())
    assert again == set(r.doc_id for r in samp.collect())


# ------------------------------------------------------------------- PII


def test_pii_counts_and_redact(spark, docs):
    out = {r.doc_id: r for r in C.pii_counts(docs).collect()}
    assert out[3].n_email == 1 and out[3].n_phone == 1 and out[3].has_pii
    assert out[9].n_ipv4 == 2 and out[9].has_pii
    assert not out[1].has_pii
    red = {
        r.doc_id: r.red
        for r in docs.select("doc_id", C.pii_redact(F.col("text")).alias("red")).collect()
    }
    assert "[EMAIL]" in red[3] and "[PHONE]" in red[3]
    assert red[9].count("[IPV4]") == 2
    assert "alice@example.org" not in red[3]
    assert red[2] == "spam spam spam spam spam spam spam spam spam spam"


# ------------------------------------------------------------ repetition


def test_repetition_stats(spark, docs):
    out = {r.doc_id: r for r in C.repetition_stats(docs).collect()}
    # doc 2: one token repeated 10x
    assert out[2].n_tokens == 10
    assert out[2].top_token_frac == pytest.approx(1.0)
    assert out[2].dup_token_frac == pytest.approx(0.9)
    assert out[2].top_bigram_frac == pytest.approx(1.0)
    # doc 8: alternating a b -> top token 6/12, all bigrams "a b"/"b a"
    assert out[8].n_tokens == 12
    assert out[8].top_token_frac == pytest.approx(0.5)
    assert out[8].top_bigram_frac == pytest.approx(6 / 11)
    # doc 1: 'the' appears twice in 10 tokens
    assert out[1].top_token_frac == pytest.approx(0.2)
    # doc 4: single token, no bigrams -> frac 0
    assert out[4].n_tokens == 1 and out[4].top_bigram_frac == 0.0


def test_repetition_stats_empty_text(spark):
    d = spark.createDataFrame([(1, "!!!")], "doc_id long, text string")
    r = C.repetition_stats(d).collect()[0]
    assert r.n_tokens == 0 and r.dup_token_frac == 0.0 and r.top_token_frac == 0.0


# --------------------------------------------------------- contamination


def test_contamination(spark, docs):
    bench = docs.filter(F.col("doc_id") == 1)  # the fox sentence
    out = {r.doc_id: r for r in C.contamination(docs, bench, n=3).collect()}
    # identical doc 10 is fully contaminated; doc 2 not at all
    assert out[10].contamination_frac == pytest.approx(1.0)
    assert out[2].contamination_frac == 0.0
    # doc 4 has <3 tokens: no grams
    assert out[4].n_grams == 0 and out[4].contamination_frac == 0.0
    # every doc id is present in the output
    assert set(out) == set(range(1, 11))


def test_contamination_partial_overlap(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    b = spark.createDataFrame([(9, "beta gamma delta zeta")], "doc_id long, text string")
    r = C.contamination(d, b, n=3).collect()[0]
    # doc grams: {abg, bgd, gde}; bench grams: {bgd, gdz}; 1/3 contaminated
    assert r.n_grams == 3 and r.n_contaminated == 1
    assert r.contamination_frac == pytest.approx(1 / 3)


# ------------------------------------------------------------ C4 filters


def test_c4_filters(spark, docs):
    out = {r.doc_id: r for r in C.c4_filters(docs).collect()}
    assert out[1].keep  # clean sentence w/ terminal punct
    assert out[4].too_few_words and not out[4].keep
    assert out[6].has_brace and not out[6].keep
    assert out[7].has_lorem and not out[7].keep
    assert not out[2].ends_with_punct and not out[2].keep
    assert out[3].ends_with_punct  # '!' terminal


def test_c4_long_word_flag(spark):
    d = spark.createDataFrame(
        [(1, "normal words then Pneumonoultramicroscopicsilicovolcanoconiosis here today.")],
        "doc_id long, text string",
    )
    r = C.c4_filters(d).collect()[0]
    assert r.has_long_word and not r.keep


# ------------------------------------------------- incremental dedup


def test_dedup_against(spark, docs):
    corpus = docs.filter(F.col("doc_id") <= 5)
    new = spark.createDataFrame(
        [
            (100, "THE QUICK brown fox jumps over the lazy dog today", "en"),  # dup of 1 (normalized)
            (101, "a genuinely new document about nothing else", "en"),
            (102, "spam spam spam spam spam spam spam spam spam spam", "en"),  # dup of 2
        ],
        "doc_id long, text string, lang string",
    )
    kept = sorted(r.doc_id for r in C.dedup_against(new, corpus).collect())
    assert kept == [101]


def test_dedup_against_prunes_corpus_columns(spark, docs):
    """Only the text column of the corpus should be read."""
    plan = C.dedup_against(docs, docs)._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "Scan" in plan  # smoke: plan materializes


# ------------------------------------------------------------ mixing


def test_mix_corpus_hits_target_distribution(spark):
    big = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    # 10k of each; target 50/25/25 -> cap = min(10k/.5, 10k/.25, 10k/.25) = 20k
    out = C.mix_corpus(big, {"s0": 0.5, "s1": 0.25, "s2": 0.25})
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    total = sum(counts.values())
    assert counts["s0"] == 10000  # scarcest-by-weight stratum keeps everything
    assert abs(counts["s1"] / total - 0.25) < 0.02
    assert abs(counts["s2"] / total - 0.25) < 0.02
    # deterministic
    again = C.mix_corpus(big.repartition(13), {"s0": 0.5, "s1": 0.25, "s2": 0.25})
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out.collect()}


def test_mix_corpus_validates(spark, docs):
    with pytest.raises(ValueError):
        C.mix_corpus(docs, {})
    with pytest.raises(ValueError):
        C.mix_corpus(docs, {"nope": 1.0}, strata_col="lang")


# ------------------------------------------------------------ packing


def test_pack_sequences_caps_and_determinism(spark):
    big = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), (F.col("id") % 50 + 1).cast("int"))).alias(
            "text"
        ),
    )
    packed = C.pack_sequences(big, cap_tokens=100, n_streams=4)
    rows = packed.collect()
    assert len(rows) == 2000
    # pack totals: every pack fits cap + one overflow doc at most
    agg = (
        packed.groupBy("stream", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert all(r.tot <= 100 + r.mx for r in agg)
    # contiguity: within a stream, pack_id is monotone in doc_id
    by_stream: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.stream, r.doc_id)):
        by_stream.setdefault(r.stream, []).append(r.pack_id)
    for packs in by_stream.values():
        assert packs == sorted(packs)
    # deterministic under partitioning
    again = C.pack_sequences(big.repartition(7), cap_tokens=100, n_streams=4).collect()
    assert {(r.doc_id, r.stream, r.pack_id) for r in again} == {
        (r.doc_id, r.stream, r.pack_id) for r in rows
    }


def test_pack_sequences_oversize_doc_gets_own_pack(spark):
    d = spark.createDataFrame(
        [(1, "a " * 500), (2, "b c"), (3, "d e f")], "doc_id long, text string"
    )
    packed = {r.doc_id: r for r in C.pack_sequences(d, cap_tokens=10, n_streams=1).collect()}
    assert packed[1].n_tokens == 500
    # the oversize doc occupies its own pack; later docs start new packs
    ids_by_pack: dict[int, set] = {}
    for r in packed.values():
        ids_by_pack.setdefault(r.pack_id, set()).add(r.doc_id)
    pack_of_1 = packed[1].pack_id
    assert ids_by_pack[pack_of_1] == {1}


# ------------------------------------------------- paragraph-level dedup


def test_paragraph_dedup_keep_first(spark):
    from fugu_spark.analytics.curation import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro text\n\nshared license header\n\nbody one"),
            (2, "shared license header\n\nbody two"),
            (3, "shared license header\n\nintro text"),
            (4, "body one\n\nbody one"),  # within-doc repeat (and cross-doc)
            (5, "   \n\n  "),  # only empty paragraphs
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    # doc 1 is first for all three of its paragraphs
    assert out[1].text_dedup == "intro text\n\nshared license header\n\nbody one"
    assert (out[1].n_pars, out[1].n_pars_kept) == (3, 3)
    # docs 2/3 lose the shared header (and doc 3 loses intro text too)
    assert out[2].text_dedup == "body two"
    assert out[3].text_dedup == ""
    assert (out[3].n_pars, out[3].n_pars_kept) == (2, 0)
    # doc 4: 'body one' already won in doc 1; both instances drop
    assert out[4].text_dedup == "" and out[4].n_pars == 2
    # doc 5: no non-empty paragraphs, still present
    assert (out[5].n_pars, out[5].n_pars_kept, out[5].text_dedup) == (0, 0, "")


def test_paragraph_dedup_within_doc_repeat_keeps_first_instance(spark):
    from fugu_spark.analytics.curation import paragraph_dedup

    docs = spark.createDataFrame(
        [(7, "dup par\n\nother\n\ndup par")], "doc_id long, text string"
    )
    r = paragraph_dedup(docs).collect()[0]
    assert r.text_dedup == "dup par\n\nother"
    assert (r.n_pars, r.n_pars_kept) == (3, 2)
