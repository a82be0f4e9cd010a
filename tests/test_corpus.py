"""Corpus generator properties: determinism, partition invariance, and the
sha256 ingest invariant (BASELINE.json input_hint) carried through the
index build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugu_spark.corpus import generate_corpus
from fugu_spark.postings import build_postings


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, n_rows=300, n_partitions=4).cache()


def test_schema_and_rows(corpus):
    assert corpus.columns == ["repo", "path", "commit", "lang", "content", "content_sha256"]
    assert corpus.count() == 300


def test_partition_invariance(spark, corpus):
    a = sorted(r.commit for r in corpus.collect())
    b = sorted(r.commit for r in generate_corpus(spark, 300, n_partitions=1).collect())
    assert a == b


def test_sha256_invariant_through_pipeline(corpus):
    """Per-row invariant: sha256(content) equality source ↔ indexed
    (input_hint). Checked with Spark's own sha2 against the stored hash,
    then re-verified on the doc table the index build consumes."""
    bad = corpus.filter(F.sha2(F.col("content"), 256) != F.col("content_sha256")).count()
    assert bad == 0
    docs = corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    postings = build_postings(docs, id_col="doc_id", text_col="content")
    # every doc with content produced postings; ids round-trip
    n_docs_with_tokens = postings.select("doc_id").distinct().count()
    assert n_docs_with_tokens == docs.select("doc_id").distinct().count()


def test_version2_rows_exist(corpus):
    """Every 10th row is a v2 of the previous file (upsert/dedup exercise)."""
    dupes = corpus.groupBy("repo", "path").count().filter(F.col("count") >= 2).count()
    assert dupes > 0


def test_zipf_repo_skew(corpus):
    counts = [r["count"] for r in corpus.groupBy("repo").count().orderBy(F.desc("count")).collect()]
    assert counts[0] > 3 * counts[len(counts) // 2]  # hot head vs median
