"""Streaming sessionization: append-mode session_window over a file
stream must emit exactly the batch `sessionized_activity` sessions whose
end the final watermark passed — same starts, ends, counts, cent-sums."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aqi_featurestore_spark.sources.testdata import read_events
from aqi_featurestore_spark.streaming.jobs import (
    run_sessionization_stream,
    sessionized_activity,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    events = read_events(spark, SF_DIR).select("user_id", "ts", "value", "event_id")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    run_sessionization_stream(
        spark, src, schema, out, cp, gap="30 minutes", watermark="30 minutes"
    )

    emitted = spark.read.parquet(out)
    batch = sessionized_activity(
        events.withColumn("ts", F.col("ts").cast("timestamp"))
    )

    key = ["user_id", "session_start"]
    b = {tuple(r[k] for k in key): r for r in batch.collect()}
    got = emitted.collect()
    assert len(got) > 0
    # 1) every emitted session is byte-identical to its batch twin
    for r in got:
        twin = b[tuple(r[k] for k in key)]
        assert r["session_end"] == twin["session_end"]
        assert r["n_obs"] == twin["n_obs"]
        assert r["sum_value_c"] == twin["sum_value_c"]
    # 2) completeness: everything the final watermark sealed was emitted
    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    wm = max_ts - dt.timedelta(minutes=35)  # watermark + safety margin
    sealed = {k for k, r in b.items() if r["session_end"] < wm}
    emitted_keys = {tuple(r[k] for k in key) for r in got}
    assert sealed <= emitted_keys
