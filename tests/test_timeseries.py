"""Time-spine gap filling + inter-arrival stats on planted fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.timeseries import (
    fill_time_gaps,
    inter_arrival_stats,
)


def _events(spark, hours):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(hours=h, minutes=7), float(h))
        for i, h in enumerate(hours)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def test_fill_time_gaps_surfaces_empty_hours(spark):
    # events in hours 0, 1, 4 -> hours 2 and 3 must appear with n=0
    df = _events(spark, [0, 1, 1, 4])
    out = {r["bucket"].hour: (r["n"], r["sum_value_c"]) for r in
           fill_time_gaps(
               df, "ts", step="1 hour", trunc="hour",
               aggs=(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                     .alias("sum_value_c"),),
           ).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]  # complete spine, no holes
    assert out[0] == (1, 0)
    assert out[1] == (2, 200)
    assert out[2] == (0, None) and out[3] == (0, None)  # the gap rows
    assert out[4] == (1, 400)


def test_inter_arrival_gaps_exact(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10),
        (2, base + dt.timedelta(seconds=5), 10),
        (3, base + dt.timedelta(seconds=65), 10),
        (4, base, 20),  # single-row key -> no gap row
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["user_id"]: r for r in
           inter_arrival_stats(df, "ts", ["user_id"], tie_break="event_id").collect()}
    assert set(out) == {10}
    r = out[10]
    assert r["n_gaps"] == 2
    assert r["min_gap_us"] == 5_000_000
    assert r["max_gap_us"] == 60_000_000
    assert r["sum_gap_us"] == 65_000_000
