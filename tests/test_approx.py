"""Approximate aggregates: sketch estimates stay within bounds and
per-day HLL sketches merge to the single-pass answer."""

from __future__ import annotations

from aqi_featurestore_spark.operators.approx import (
    distinct_count_profile,
    quantile_profile,
)
from aqi_featurestore_spark.sources.testdata import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_distinct_profile_bounds_and_merge(spark):
    events = read_table(spark, SF_DIR, "events")
    rows = distinct_count_profile(
        events, ["event_type"], "user_id", day_col="ts"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        assert r.hll_ok and r.acd_ok, r
        # register-wise max is associative: merged == direct exactly
        assert r.merge_ok, r


def test_quantile_profile_bounds(spark):
    events = read_table(spark, SF_DIR, "events")
    rows = quantile_profile(events, ["event_type"], "value").collect()
    assert rows
    for r in rows:
        assert r.q50 <= r.q95
        assert r.q50_ok and r.q95_ok, r
