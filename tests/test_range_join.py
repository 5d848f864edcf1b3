"""Range-join: bucketed-expansion equivalence vs the naive theta join,
plus the guard rails (inner-only, degenerate intervals, replication cap,
column collisions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.range_join import range_join, range_join_time

SF_DIR = "/root/testdata/sf0.001"


def _windows(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )


def _points(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


def test_matches_naive_theta_join(spark):
    pts, win = _points(spark), _windows(spark)
    bucketed = range_join_time(
        pts, win, point="l_shipdate", start="w_start", end="w_end",
        bucket_width_seconds=3 * 86_400,
    )
    naive = pts.join(
        win,
        (F.col("l_shipdate") >= F.col("w_start"))
        & (F.col("l_shipdate") <= F.col("w_end")),
        "inner",
    )
    key = ["l_orderkey", "l_linenumber", "o_orderkey"]
    a = sorted(tuple(r) for r in bucketed.select(*key).collect())
    b = sorted(tuple(r) for r in naive.select(*key).collect())
    assert a == b and len(a) > 0


def test_no_duplicate_pairs_across_buckets(spark):
    # width much smaller than the span → intervals explode to many
    # buckets, but each (point, interval) pair still meets exactly once.
    # (synthetic lineitem repeats (l_orderkey, l_linenumber), so dedupe
    # the input — duplicate INPUT rows are legitimately duplicate output)
    pts = _points(spark).dropDuplicates(["l_orderkey", "l_linenumber"])
    win = _windows(spark)
    out = range_join_time(
        pts, win, point="l_shipdate", start="w_start", end="w_end",
        bucket_width_seconds=6 * 3_600,
    )
    key = ["l_orderkey", "l_linenumber", "o_orderkey"]
    assert out.groupBy(*key).count().where("count > 1").count() == 0


def test_bucket_width_insensitive(spark):
    pts, win = _points(spark), _windows(spark)
    kw = dict(point="l_shipdate", start="w_start", end="w_end")
    n1 = range_join_time(pts, win, bucket_width_seconds=86_400, **kw).count()
    n2 = range_join_time(pts, win, bucket_width_seconds=10 * 86_400, **kw).count()
    assert n1 == n2


def test_degenerate_interval_matches_nothing(spark):
    win = _windows(spark).select(
        "o_orderkey", F.col("w_end").alias("w_start"), F.col("w_start").alias("w_end")
    )  # end < start everywhere
    out = range_join_time(
        _points(spark), win, point="l_shipdate", start="w_start", end="w_end",
        bucket_width_seconds=86_400,
    )
    assert out.count() == 0


def test_outer_join_rejected(spark):
    with pytest.raises(ValueError, match="inner"):
        range_join(
            _points(spark), _windows(spark),
            point="l_shipdate", start="w_start", end="w_end",
            bucket_width=1, how="left",
        )


def test_column_collision_rejected(spark):
    pts = _points(spark)
    with pytest.raises(ValueError, match="both sides"):
        range_join(pts, pts, point="l_shipdate", start="l_shipdate",
                   end="l_shipdate", bucket_width=1)


def test_replication_cap_fails_fast(spark):
    # 3-day span at 1-second buckets = ~260k buckets per interval —
    # the in-plan assert must fire before the explode materializes.
    with pytest.raises(Exception, match="range_join"):
        range_join_time(
            _points(spark), _windows(spark),
            point="l_shipdate", start="w_start", end="w_end",
            bucket_width_seconds=1, max_replication=1024,
        ).count()
