"""Unit tests for the scalar feature functions (AQI piecewise, time
features, entity keys) — semantics pinned in SURVEY.md §2.8/§7."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.aqi import aqi_from_pm25, aqi_level_label
from aqi_featurestore_spark.functions.time_features import (
    entity_key,
    next_hour_features,
    time_feature_columns,
)


def _aqi(spark, value, **kw):
    df = spark.createDataFrame([(value,)], "c double")
    return df.select(aqi_from_pm25("c", **kw).alias("aqi")).first()["aqi"]


def test_aqi_interpolation_in_range(spark):
    # 10.0 in [0,12] -> (50/12)*10 = 41.666...
    assert _aqi(spark, 10.0) == pytest.approx(41.66666666666667)
    # exact breakpoint edges
    assert _aqi(spark, 0.0) == 0.0
    assert _aqi(spark, 12.0) == 50.0
    assert _aqi(spark, 12.1) == 51.0
    assert _aqi(spark, 500.4) == 500.0


def test_aqi_gap_and_out_of_range_defaults(spark):
    # 12.05 falls in the 12.0..12.1 breakpoint gap -> default (spec'd behavior)
    assert _aqi(spark, 12.05) == 8.5
    assert _aqi(spark, 600.0) == 8.5  # offline spark-job variant
    assert _aqi(spark, 600.0, default=500) == 500.0  # online-refresh variant
    assert _aqi(spark, 600.0, default=None) is None  # loader variant
    assert _aqi(spark, -1.0) == 8.5


def test_aqi_null_passthrough(spark):
    assert _aqi(spark, None) is None
    assert _aqi(spark, None, default=500) is None


def test_aqi_loader_rounding(spark):
    assert _aqi(spark, 10.0, default=None, round_to_int=True) == 42.0


def test_aqi_level_label(spark):
    df = spark.createDataFrame([(30.0,), (75.0,), (120.0,), (300.0,)], "aqi double")
    labels = [r[0] for r in df.select(aqi_level_label("aqi")).collect()]
    assert labels == ["good", "moderate", "unhealthy_sensitive", "unhealthy"]


def test_time_features_and_entity_key(spark):
    df = spark.createDataFrame(
        [("2024-01-07 13:45:00",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    row = df.withColumns(time_feature_columns("ts")).first()
    assert (row["hour"], row["day"], row["month"], row["year"]) == (13, 7, 1, 2024)
    assert row["dayOfWeek"] == 1  # 2024-01-07 is a Sunday; Spark: 1=Sunday

    # float formatting parity: 21.0 -> "21.0" (reference agent.py:29-33)
    kdf = spark.createDataFrame([(21.0, 105.75)], "lat double, lon double")
    assert kdf.select(entity_key("lat", "lon").alias("k")).first()["k"] == "21.0_105.75"


def test_next_hour_rollover(spark):
    df = spark.createDataFrame(
        [(23, 7, 1), (10, 7, 1)], "hour int, day int, dow int"
    )
    rows = df.withColumns(next_hour_features("hour", "day", "dow")).collect()
    wrap = next(r for r in rows if r["hour"] == 23)
    assert (wrap["next_hour"], wrap["next_day"], wrap["next_dayOfWeek"]) == (0, 8, 2)
    nowrap = next(r for r in rows if r["hour"] == 10)
    assert (nowrap["next_hour"], nowrap["next_day"], nowrap["next_dayOfWeek"]) == (11, 7, 1)


def test_sql_surface_over_registered_views(spark):
    from aqi_featurestore_spark.sources.testdata import register_views

    register_views(spark, "/root/testdata/sf0.001")
    # the reference's COUNT(*) existence probe shape (S10, load.py:71-81)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM events WHERE event_type = 'signup'"
    ).first()["n"]
    assert n > 0
    # joins + windows compose through pure SQL too
    top = spark.sql(
        """SELECT user_id, ts, value FROM (
             SELECT user_id, ts, value,
                    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) rn
             FROM events) WHERE rn = 1 LIMIT 5"""
    ).collect()
    assert len(top) == 5


def test_regression_metrics_hand_computed(spark):
    import math

    from aqi_featurestore_spark.functions.metrics import regression_metrics

    # y: 1,2,3,4 ; yhat: 1,1,4,6 -> err: 0,1,-1,-2
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 4.0), (4.0, 6.0), (None, 9.9), (5.0, None)],
        "y double, yhat double",
    )
    m = regression_metrics(df, y="y", yhat="yhat").first()
    assert m["n"] == 4
    assert m["mae"] == pytest.approx((0 + 1 + 1 + 2) / 4)
    assert m["rmse"] == pytest.approx(math.sqrt((0 + 1 + 1 + 4) / 4))
    # SStot around mean 2.5 = 2.25+0.25+0.25+2.25 = 5 ; R2 = 1 - 6/5
    assert m["r2"] == pytest.approx(1 - 6 / 5)


def test_parse_freetext_date(spark):
    from datetime import date

    from aqi_featurestore_spark.functions.time_features import parse_freetext_date

    df = spark.createDataFrame(
        [
            ("cho toi AQI ngay 25/12/2024 nhe",),   # day-first, embedded
            ("du bao 5/3/2024 va 6/3/2024",),        # first match wins
            ("khong co ngay nao o day",),            # refusal -> NULL
            ("nua la 31/4/2024",),                   # impossible date -> NULL
        ],
        "text string",
    )
    got = [r[0] for r in df.select(parse_freetext_date("text")).collect()]
    assert got == [date(2024, 12, 25), date(2024, 3, 5), None, None]


def test_local_time_features_seven_hour_shift(spark):
    from datetime import datetime

    from aqi_featurestore_spark.functions.time_features import local_time_features

    # 2024-01-01 20:30 UTC -> 2024-01-02 03:30 in Asia/Ho_Chi_Minh:
    # hour wraps, day advances, dayOfWeek Mon(2) -> Tue(3).
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 20, 30),), (datetime(2024, 1, 1, 3, 0),)],
        "ts timestamp",
    )
    rows = df.select(
        *[c.alias(n) for n, c in local_time_features("ts").items()]
    ).collect()
    assert rows[0]["local_ts"] == datetime(2024, 1, 2, 3, 30)
    assert (rows[0]["local_hour"], rows[0]["local_day"], rows[0]["local_dayOfWeek"]) == (3, 2, 3)
    assert (rows[1]["local_hour"], rows[1]["local_day"], rows[1]["local_dayOfWeek"]) == (10, 1, 2)
