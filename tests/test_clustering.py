"""Distributed k-means + semantic dedup (operators/clustering.py).

The registry queries are hash-verified against the unrolled DuckDB
oracle by test_oracle_parity; these pin the OPERATOR contracts directly:
planted clusters are recovered, empty clusters carry forward, the
assignment plan never shuffles, and the JVM normalizer matches the
Arrow one bit-for-bit.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.clustering import (
    MICRO,
    kmeans_assign_col,
    kmeans_fit,
    kmeans_min_struct,
    normalized_jvm,
)


def _planted(spark, *, n_per=40, dim=8, spread=0.05, seed=11):
    """Three well-separated Gaussian-ish blobs; returns (df, truth)."""
    rng = random.Random(seed)
    centers = [[5.0] * dim, [-5.0] * dim, [5.0 if i % 2 else -5.0 for i in range(dim)]]
    rows, truth = [], {}
    vid = 0
    for b, c in enumerate(centers):
        for _ in range(n_per):
            vec = [c[d] + rng.uniform(-spread, spread) for d in range(dim)]
            rows.append((vid, [float(x) for x in vec]))
            truth[vid] = b
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, truth


def test_kmeans_recovers_planted_clusters(spark):
    # farthest-point seeding provably puts one seed per well-separated
    # blob; md5 seeding (the registry default) is cheaper but can start
    # two seeds in one blob, which plain Lloyd's won't always escape.
    df, truth = _planted(spark)
    cents = kmeans_fit(df, k=3, iters=3, seeding="farthest")
    out = df.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * MICRO, 0).cast("long")
        ).alias("v"),
    ).select("vec_id", kmeans_assign_col(F.col("v"), cents).alias("cid"))
    got = {r["vec_id"]: r["cid"] for r in out.collect()}
    # cluster ids are arbitrary — check the PARTITION matches the truth
    by_true: dict[int, set[int]] = {}
    for vid, b in truth.items():
        by_true.setdefault(b, set()).add(got[vid])
    assert all(len(s) == 1 for s in by_true.values()), by_true
    assert len({next(iter(s)) for s in by_true.values()}) == 3


def test_kmeans_empty_cluster_carries_forward(spark):
    # 2 identical points, k=2: one seed never wins a member after the
    # first reassignment round — its centroid must persist, not vanish.
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0001, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(df, k=2, iters=3)
    assert len(cents) == 2
    assert all(len(c) == 2 and all(math.isfinite(x) for x in c) for c in cents)


def test_assignment_plan_is_pure_projection(spark):
    df, _ = _planted(spark)
    cents = kmeans_fit(df, k=3, iters=1)
    out = df.select(
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * MICRO, 0).cast("long")
        ).alias("v")
    ).select(kmeans_min_struct(F.col("v"), cents).alias("m"))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    # no UDF boundary (the createDataFrame RDD source mentions Python;
    # what must be absent is any Python EVAL operator)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_normalized_jvm_matches_arrow(spark):
    from aqi_featurestore_spark.operators.similarity import _normalized_arrow

    df, _ = _planted(spark, n_per=10)
    both = df.select(
        normalized_jvm("embedding").alias("jvm"),
        _normalized_arrow("embedding").alias("arrow"),
    ).collect()
    for r in both:
        assert r["jvm"] == r["arrow"]  # bit-identical, not approx


def test_semantic_dedup_drops_planted_duplicate(spark):
    from aqi_featurestore_spark.plans import QUERIES  # noqa: F401  (env check)
    from aqi_featurestore_spark.plans.clustering import q_semantic_dedup

    out = q_semantic_dedup(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500  # every vector gets a verdict
    drops = [r for r in rows if r["keep"] == 0]
    cluster_of = {r["vec_id"]: r["cluster_id"] for r in rows}
    for r in drops:
        # dropped rows point at a SMALLER-id vector in the SAME cluster
        assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
        assert cluster_of[r["dup_of"]] == r["cluster_id"]
    for r in rows:
        if r["keep"] == 1:
            assert r["dup_of"] is None


def test_kmeans_assignment_works_in_streaming(spark, tmp_path):
    """The literal-centroid assignment is a pure projection, so the SAME
    column works unchanged under Structured Streaming (stream-static
    semantic routing: fit offline, assign on the stream)."""
    df, _ = _planted(spark, n_per=10)
    cents = kmeans_fit(df, k=3, iters=1)
    src = tmp_path / "vec_src"
    src.mkdir()
    df.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(
        str(src)
    )
    assigned = stream.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * MICRO, 0).cast("long")
        ).alias("v"),
    ).select("vec_id", kmeans_assign_col(F.col("v"), cents).alias("cid"))
    q = (
        assigned.writeStream.format("memory")
        .queryName("km_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "km_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["vec_id"]: r["cid"] for r in spark.sql("SELECT * FROM km_stream").collect()
    }
    batch = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * MICRO, 0).cast("long"),
            ).alias("v"),
        )
        .select("vec_id", kmeans_assign_col(F.col("v"), cents).alias("cid"))
        .collect()
    }
    assert got == batch and len(got) == 30


def test_kmeans_warm_start_equals_cold_continuation(spark):
    """A Lloyd round is a pure function of (centroids, data), so
    warm-starting from round a's centroids for b more rounds is
    bit-identical to a cold a+b-round fit — the property that makes a
    persisted-quantizer refresh exact (the hardlogit warm-start
    contract on the clustering side)."""
    import pytest

    from aqi_featurestore_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(
        [
            (i, [((i * 37 + d * 13) % 53 - 26) / 26.0 for d in range(8)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    cold = kmeans_fit(df, k=4, iters=3)
    head = kmeans_fit(df, k=4, iters=2)
    warm = kmeans_fit(df, k=4, iters=1, init=head)
    assert warm == cold
    with pytest.raises(ValueError, match="init has"):
        kmeans_fit(df, k=4, iters=1, init=head[:2])
