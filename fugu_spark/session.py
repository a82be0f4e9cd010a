"""SparkSession factory with engine defaults.

Local-mode testing uses ``local[N]``; the same configs are what we would
ship to a real multi-executor cluster via ``spark-submit --py-files``
(only master/memory change). AQE stays on as a backstop behind our
explicit skew salting (SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fugu_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # In local[N] the shuffle width should match cores, not the 200 default.
    n_shuffle = shuffle_partitions or (
        int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("FUGU_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # snappy: posting payloads carry their own delta+varint compression,
        # so heavier parquet codecs buy ~20% size for ~10x write CPU
        # (measured: zstd 18.5s vs snappy 6.7s for the same postings write)
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
