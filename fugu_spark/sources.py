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


_ICEBERG_HINT = (
    "Iceberg runtime not on the classpath; submit with "
    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"
)


def load_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    derive_doc_id: bool = True,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Load the corpus table and derive ``doc_id = xxhash64(repo, path,
    commit)`` (FIXTURES.md §1 identity) when the id columns exist.

    ``snapshot_id`` / ``as_of_timestamp`` (Iceberg only) pin the read to
    one table snapshot: every stage of a multi-job index build then sees
    the same data even while writers commit — the snapshot-isolation
    analog of the reference's reader reload-on-commit."""
    if fmt == "iceberg":
        try:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            if as_of_timestamp is not None:
                reader = reader.option("as-of-timestamp", str(as_of_timestamp))
            df = reader.load(source)
        except Exception as e:  # no runtime jar in this container
            raise RuntimeError(_ICEBERG_HINT) from e
    elif fmt == "table":
        df = spark.read.table(source)
    else:
        df = spark.read.format(fmt).load(source)
    if derive_doc_id and "doc_id" not in df.columns and {"repo", "path", "commit"} <= set(
        df.columns
    ):
        df = df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    return df


def iceberg_merge_upsert(
    batch: DataFrame, table: str, id_col: str = "doc_id"
) -> None:
    """Corpus-side upsert as an atomic Iceberg commit: ``MERGE INTO`` on
    the id (the exact SQL shape dataset.upsert mirrors as an
    anti-join+union). Readers on the previous snapshot are unaffected
    until they reload — the reference's commit/publish point
    (/root/reference/src/db/document.rs:65)."""
    spark = batch.sparkSession
    batch.createOrReplaceTempView("_fugu_upsert_batch")
    try:
        spark.sql(
            f"""MERGE INTO {table} t USING _fugu_upsert_batch s
                ON t.{id_col} = s.{id_col}
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *"""
        )
    except Exception as e:
        raise RuntimeError(_ICEBERG_HINT) from e
    finally:
        spark.catalog.dropTempView("_fugu_upsert_batch")


def iceberg_changed_rows(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended between two snapshots (Iceberg incremental read) —
    the feed for incremental re-indexing: pipe into
    ``segments.upsert_segments`` instead of rebuilding from scratch."""
    try:
        reader = (
            spark.read.format("iceberg")
            .option("start-snapshot-id", str(start_snapshot_id))
        )
        if end_snapshot_id is not None:
            reader = reader.option("end-snapshot-id", str(end_snapshot_id))
        return reader.load(table)
    except Exception as e:
        raise RuntimeError(_ICEBERG_HINT) from e


def check_sha256_invariant(df: DataFrame, content_col: str = "content") -> int:
    """Per-row ingest invariant (input_hint): sha256(content) equality.
    Returns the number of violating rows (0 = pass)."""
    if "content_sha256" not in df.columns:
        return 0
    return df.filter(F.sha2(F.col(content_col), 256) != F.col("content_sha256")).count()
