"""Deterministic dataset splitting for training pipelines.

The reference splits with sklearn's ``train_test_split`` on the driver
(model/aqi_predict_hn.py:56) — random state, single machine. At scale the
split must be (a) computable row-locally with no shuffle or RNG state,
(b) stable across reruns and engines, and (c) leakage-safe when keyed by
entity (all rows of one entity land on the same side).

``hash_split`` assigns each row a bucket in [0, 65536) from the first four
hex digits of md5(key) — engine-portable (md5 is md5 everywhere) — and
thresholds by the requested fraction. Split by the ENTITY key to keep
groups together, or by a row id for an i.i.d. split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 16


def split_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, 65536): first 4 hex digits of md5(key)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")


def hash_split(
    df: DataFrame, key: str, *, train_fraction: float = 0.8
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split on a stable hash of ``key`` — no RNG, no
    shuffle, rerun-stable; same key always lands on the same side."""
    threshold = int(train_fraction * BUCKETS)
    b = split_bucket(key)
    return df.where(b < threshold), df.where(b >= threshold)


def with_split_label(
    df: DataFrame, key: str, *, train_fraction: float = 0.8, col: str = "split"
) -> DataFrame:
    """Single-pass variant: adds a 'train'/'test' label column."""
    threshold = int(train_fraction * BUCKETS)
    return df.withColumn(
        col,
        F.when(split_bucket(key) < threshold, F.lit("train")).otherwise(F.lit("test")),
    )
