"""Operational source/sink semantics at the store layer: schema
evolution on read (a batch written before a column existed must
null-backfill, not fail) and dynamic partition overwrite (a rewrite
touches only the partitions present in the incoming batch).

Reference parity: the reference's BigQuery tables evolve by ALTER and
its loader overwrites day partitions (spark/code/write_to_bigquery.py's
partitioned-table write disposition); these are the Spark-native
equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_null_backfills_old_batches(spark, tmp_path):
    p = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("entity_id"), F.lit(1.0).alias("aqi")
    ).write.parquet(p)
    # Later batches add a column the old files don't have.
    spark.range(5, 8).select(
        F.col("id").alias("entity_id"),
        F.lit(2.0).alias("aqi"),
        F.lit("station-9").alias("source_station"),
    ).write.mode("append").parquet(p)

    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"entity_id", "aqi", "source_station"}
    rows = {r["entity_id"]: r for r in df.collect()}
    assert rows[0]["source_station"] is None  # old batch null-backfilled
    assert rows[6]["source_station"] == "station-9"
    assert df.count() == 8


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    p = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 11.0), ("2024-01-02", 3, 12.0)],
        "day string, entity_id int, aqi double",
    )
    base.write.partitionBy("day").parquet(p)

    fix = spark.createDataFrame(
        [("2024-01-02", 3, 99.0), ("2024-01-02", 4, 98.0)],
        "day string, entity_id int, aqi double",
    )
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(p)
    )

    out = spark.read.parquet(p)
    d1 = out.where(F.col("day") == "2024-01-01")
    d2 = out.where(F.col("day") == "2024-01-02").orderBy("entity_id")
    assert d1.count() == 2  # untouched partition survives the overwrite
    got = [(r["entity_id"], r["aqi"]) for r in d2.collect()]
    assert got == [(3, 99.0), (4, 98.0)]  # replaced, not appended
