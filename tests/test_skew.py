"""Salted skew operators: identical results to their unsalted forms on
hot-key data."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.skew import (
    salted_equi_join,
    salted_latest_per_key,
    skew_profile,
)
from aqi_featurestore_spark.operators.snapshot import latest_per_key


def _skewed(spark, n=2000):
    # entity 'hot' owns 90% of rows; ties on ts at the top to stress
    # the tie-break through both phases
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string")))
        .alias("entity_id"),
        F.to_timestamp(F.lit("2023-01-01 00:00:00")).alias("base"),
        F.col("id").alias("event_id"),
        (F.col("id") % 500).cast("double").alias("val"),
    ).select(
        "entity_id",
        (F.col("base") + F.make_interval(hours=(F.col("event_id") % 48).cast("int")))
        .alias("feature_timestamp"),
        "event_id",
        "val",
    )


def test_salted_latest_equals_unsalted(spark):
    df = _skewed(spark)
    plain = latest_per_key(df, ["entity_id"], ts="feature_timestamp", tie_break=["event_id"])
    salted = salted_latest_per_key(
        df, ["entity_id"], ts="feature_timestamp", tie_break=["event_id"], salt_buckets=16
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b and len(a) == 8  # hot + 7 cold entities


def test_salted_join_equals_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "h"), ("cold_0", "c0"), ("cold_3", "c3"), ("absent", "x")],
        "entity_id string, tag string",
    )
    plain = fact.join(dim, ["entity_id"], "inner")
    salted = salted_equi_join(fact, dim, ["entity_id"], salt_buckets=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join parity incl. null-extension
    plain_l = fact.join(dim, ["entity_id"], "left")
    salted_l = salted_equi_join(fact, dim, ["entity_id"], how="left", salt_buckets=4)
    assert sorted(map(tuple, plain_l.collect()), key=str) == sorted(
        map(tuple, salted_l.collect()), key=str
    )


def test_skew_profile_flags_hot_key(spark):
    prof = skew_profile(_skewed(spark), ["entity_id"], top=3).collect()
    assert prof[0]["entity_id"] == "hot"
    assert prof[0]["share"] > 0.8
