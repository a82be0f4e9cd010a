"""Corpus sources: Iceberg table / parquet path / any Spark-readable format.

The production input is an Iceberg table of source-code files
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint);
Iceberg gives the engine snapshot-isolated reads, the atomic-commit
analog of the reference's reader reload-on-commit
(/root/reference/src/db/core.rs:290-297). This container ships no
Iceberg runtime jar, so ``format='iceberg'`` raises a clear error here
and works unchanged on a cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:...``;
parquet is the tested local path (same DataFrame out, engine-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    derive_doc_id: bool = True,
) -> DataFrame:
    """Load the corpus table and derive ``doc_id = xxhash64(repo, path,
    commit)`` (FIXTURES.md §1 identity) when the id columns exist."""
    if fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as e:  # no runtime jar in this container
            raise RuntimeError(
                "Iceberg runtime not on the classpath; submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"
            ) from e
    elif fmt == "table":
        df = spark.read.table(source)
    else:
        df = spark.read.format(fmt).load(source)
    if derive_doc_id and "doc_id" not in df.columns and {"repo", "path", "commit"} <= set(
        df.columns
    ):
        df = df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    return df


def check_sha256_invariant(df: DataFrame, content_col: str = "content") -> int:
    """Per-row ingest invariant (input_hint): sha256(content) equality.
    Returns the number of violating rows (0 = pass)."""
    if "content_sha256" not in df.columns:
        return 0
    return df.filter(F.sha2(F.col(content_col), 256) != F.col("content_sha256")).count()
