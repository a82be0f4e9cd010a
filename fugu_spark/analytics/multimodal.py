"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures. The actual codec step is STUBBED: this
container has no image/audio libraries, so ``decode`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (default), keeping every downstream operator
(feature join, dedup by perceptual hash, frame sampling) exercisable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def generate_fake_assets(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic opaque binary payloads with typed metadata."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = kinds[int(i) % 3]
                payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (1 + int(i) % 7)
                rows.append(
                    (
                        int(i),
                        kind,
                        payload,
                        64 + int(i) % 512 if kind == "image" else None,
                        64 + (int(i) * 3) % 512 if kind == "image" else None,
                        1000 + int(i) % 60000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "data", "width", "height", "duration_ms"]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_features(data: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: 16 floats from
    the sha256 of the payload, scaled to [0, 1)."""
    digest = hashlib.sha256(data).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return list(arr / 65536.0)


def extract_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched).

    ``strict=True`` raises NotImplementedError where a real codec
    (PIL/librosa/ffmpeg) would run — the marked integration point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa/ffmpeg — "
                    "not available in this container; deterministic fake used by default"
                )
            feats = [_fake_features(bytes(d)) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return assets.mapInPandas(gen, schema=FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video assets: one row per sampled
    timestamp (the decode itself is the stub above)."""
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
