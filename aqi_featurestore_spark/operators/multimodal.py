"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Extension operators (BASELINE.json): image/audio/video ride along as
``binary`` columns with typed metadata (schemas.MEDIA). The Spark-side
contract — schema, partitioning, UDF signature, batch shape — is real and
tested; the codec step itself is stubbed because no image/audio libraries
exist in this container:

- ``decode_media`` raises NotImplementedError per-kind unless
  ``fake=True``, in which case it produces a deterministic fake feature
  vector from the payload bytes (stable across runs/executors, so tests
  can assert on it).

Scale notes: mapInPandas streams Arrow batches — payload bytes never
round-trip through Python row objects; ``maxRecordsPerBatch`` bounds
executor memory on large payloads; repartition by a key before the map
when downstream wants co-location.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

MEDIA_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, features array<double>"
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded values in
    [0, 1). Stable everywhere; replace with a real codec when available."""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 256.0 for i in range(dim)]


def extract_media_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    Input: schemas.MEDIA-shaped DataFrame (payload as string/binary).
    Output: (media_id, kind, n_bytes, features array<double>).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return df.mapInPandas(featurize, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (duration_ms) — the decode of
    each frame is the stubbed step. Demonstrates the explode-by-metadata
    shape that keeps the expensive work row-parallel."""
    from pyspark.sql import functions as F

    n = (F.col("duration_ms") / every_ms).cast("int")
    # guard n >= 1: sequence(0, -1) would produce a *descending* [0, -1]
    return (
        df.where((F.col("kind") == "video") & (n >= 1))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
