"""Stream-static broadcast enrichment must emit exactly the batch
left-join result: same rows, null-extension for keys absent from the
dim, no stream rows dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqi_featurestore_spark.sources.testdata import read_events
from aqi_featurestore_spark.streaming.jobs import run_enrichment_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stream_enrichment_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    events = read_events(spark, SF_DIR).select("event_id", "user_id", "value")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    # Static profile dim; keep some users OUT so null-extension is exercised.
    dim = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .where(F.col("user_id") % 5 != 0)
        .withColumn(
            "tier", F.when(F.col("n_events") >= 100, "heavy").otherwise("light")
        )
    )

    run_enrichment_stream(spark, src, schema, dim, out, cp)

    got = spark.read.parquet(out)
    want = events.join(F.broadcast(dim), ["user_id"], "left")

    assert got.count() == events.count()  # no stream rows dropped
    key = lambda r: r["event_id"]
    w = {key(r): r for r in want.collect()}
    missing_dim = 0
    for r in got.collect():
        t = w[key(r)]
        assert (r["n_events"], r["tier"]) == (t["n_events"], t["tier"])
        if r["tier"] is None:
            missing_dim += 1
    assert missing_dim > 0  # the null-extended path actually ran
