"""Property-based check of the point-in-time join against a brute-force
Python model: for random histories and spines, the as-of row is always the
max feature_timestamp <= event_ts within TTL, ties broken by tie_break,
left semantics preserved."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from aqi_featurestore_spark.operators.pit_join import (
    point_in_time_join,
    point_in_time_join_sorted,
)

BASE = datetime(2023, 1, 1)
TTL = timedelta(hours=12)

entities = st.sampled_from(["a", "b", "c"])
# offsets in hours; duplicates on purpose (append-only stores re-append)
feature_rows = st.lists(
    st.tuples(entities, st.integers(0, 72), st.integers(0, 1000)),
    min_size=0, max_size=40,
)
spine_rows = st.lists(
    st.tuples(entities, st.integers(-4, 76)), min_size=1, max_size=25
)


def _model(features, spine):
    out = []
    for ent, ev_h in spine:
        ev = BASE + timedelta(hours=ev_h)
        cands = [
            (BASE + timedelta(hours=fh), seq, val)
            for (fe, fh, seq) in features
            for val in [float(seq)]
            if fe == ent
            and BASE + timedelta(hours=fh) <= ev
            and BASE + timedelta(hours=fh) >= ev - TTL
        ]
        if cands:
            best = max(cands, key=lambda c: (c[0], c[1]))
            out.append((ent, ev, best[2]))
        else:
            out.append((ent, ev, None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2]))


@pytest.fixture(params=[point_in_time_join, point_in_time_join_sorted],
                ids=["join_maxby", "sort_merge"])
def pit_impl(request):
    return request.param


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(features=feature_rows, spine=spine_rows)
def test_pit_join_matches_bruteforce_model(spark, pit_impl, features, spine):
    feat_df = spark.createDataFrame(
        [
            (ent, BASE + timedelta(hours=fh), seq, float(seq))
            for (ent, fh, seq) in features
        ]
        or [("zz", BASE, -1, -1.0)],  # schema anchor; entity never queried
        "entity_id string, feature_timestamp timestamp, event_id long, val double",
    )
    spine_df = spark.createDataFrame(
        [(ent, BASE + timedelta(hours=h)) for (ent, h) in spine],
        "entity_id string, event_timestamp timestamp",
    )
    out = pit_impl(
        spine_df,
        feat_df,
        ["entity_id"],
        ttl=TTL,
        feature_cols=["val"],
        tie_break=["event_id"],
    )
    got = sorted(
        [(r["entity_id"], r["event_timestamp"], r["val"]) for r in out.collect()],
        key=lambda r: (r[0], r[1], r[2] is None, r[2]),
    )
    assert got == _model(features, spine)


# -- AQI piecewise property -------------------------------------------------

AQI_BP = (
    (0.0, 12.0, 0, 50), (12.1, 35.4, 51, 100), (35.5, 55.4, 101, 150),
    (55.5, 150.4, 151, 200), (150.5, 250.4, 201, 300),
    (250.5, 350.4, 301, 400), (350.5, 500.4, 401, 500),
)


def _aqi_model(c, default):
    if c is None:
        return None
    for lo, hi, ilo, ihi in AQI_BP:
        if lo <= c <= hi:
            return ((ihi - ilo) / (hi - lo)) * (c - lo) + float(ilo)
    return default  # out of range AND breakpoint gaps (e.g. 12.05)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-10, max_value=520, allow_nan=False),
            # hammer the gap/boundary regions
            st.sampled_from([12.0, 12.05, 12.1, 35.45, 55.45, 150.45, 500.4, 500.5]),
        ),
        min_size=1, max_size=30,
    ),
    default=st.sampled_from([8.5, None, 500.0]),
)
def test_aqi_expression_matches_python_model(spark, values, default):
    from aqi_featurestore_spark.functions.aqi import aqi_from_pm25

    df = spark.createDataFrame([(v,) for v in values], "pm double")
    got = [r["aqi"] for r in
           df.select(aqi_from_pm25("pm", default=default).alias("aqi")).collect()]
    want = [_aqi_model(v, default) for v in values]
    assert got == want
