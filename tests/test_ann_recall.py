"""Recall pins for the ANN family. The oracle gate proves each method
computes WHAT IT SAYS bit-for-bit — but since the oracle mirrors the
method, a change that silently degraded retrieval quality would still
MATCH. These pins hold the measured recall@10 itself fixed on the
deterministic sf0.001 data, so a semantic regression (bad codebooks,
broken probe lists, wrong banding) fails here even when the arithmetic
stays self-consistent. Update the pinned values only with a deliberate
parameter change, like the exchange ceilings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Measured at HEAD on the driver-generated sf0.001 embeddings with the
# registry parameters (k=10; LSH 16 planes; IVF 16 lists x 4 probes;
# PQ 4x16 codes; IVFADC = IVF coarse + PQ codes). Deterministic: seeded
# hyperplanes, md5-seeded k-means, exact integer distances.
PINNED_RECALL = {
    "lsh": 0.46,
    "ivf": 0.57,
    "pq": 0.45,
    "ivfpq": 0.39,
    # trained coarse (3 Lloyd rounds): ties seeded at this 500-vector
    # fixture; the decisive gap appears at sf0.01 (0.49 vs 0.34 — the
    # measurement that switched the serving default, round 7)
    "ivfpq_km": 0.37,
}


def test_ann_recall_methods_pinned(spark):
    rows = {
        r["method"]: r["recall_at_10"]
        for r in QUERIES["ann_recall_methods"](spark, SF_DIR).collect()
    }
    assert rows == PINNED_RECALL


def test_ivfpq_kmeans_coarse_path(spark):
    """The production coarse quantizer (distributed k-means instead of
    the oracle's seeded centroids) must return full top-k rows per
    query and land in the same recall band as the seeded variant —
    the code path the registry oracle cannot cover."""
    from aqi_featurestore_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivfpq,
    )
    from aqi_featurestore_spark.sources.testdata import read_table

    e = read_table(spark, SF_DIR, "embeddings").cache()
    q = e.where(F.col("vec_id") % 50 == 0)
    got = cosine_topk_ivfpq(
        q, e, k=10, n_lists=16, n_probe=4, coarse="kmeans", coarse_iters=2
    )
    exact = cosine_topk_bruteforce(q, e, k=10).select("q_id", "n_id")
    counts = got.groupBy("q_id").count().collect()
    assert counts and all(r["count"] == 10 for r in counts)
    hits = got.select("q_id", "n_id").intersect(exact).count()
    n_q = len(counts)
    assert hits / (10 * n_q) >= 0.3  # same band as the seeded variant


def test_pq_reconstruction_memorization_and_noise(spark):
    """A 16-distinct-vector corpus with a 16-code book memorizes exactly
    (every subspace error == 0.0 — each distinct row seeds its own
    codeword); adding per-row noise makes every subspace error > 0.
    n_rows covers the corpus in both cases."""
    import math

    from aqi_featurestore_spark.operators.similarity import pq_reconstruction_stats

    base = [
        (i, [math.sin(0.37 * i + 0.11 * j) for j in range(64)], 0)
        for i in range(16)
    ]
    clean = spark.createDataFrame(
        base, "vec_id long, embedding array<float>, label int"
    )
    got = {r["subspace_id"]: r for r in pq_reconstruction_stats(clean).collect()}
    assert set(got) == {0, 1, 2, 3}
    for r in got.values():
        assert r["n_rows"] == 16
        assert r["avg_sq_err"] == 0.0
    noisy = spark.createDataFrame(
        [
            (i, [v + 0.01 * math.cos(1.7 * i * (j + 1)) for j, v in enumerate(vec)], 0)
            for k in range(4)
            for i, vec, _ in [(r[0] + 16 * k, r[1], 0) for r in base]
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got_n = {r["subspace_id"]: r for r in pq_reconstruction_stats(noisy).collect()}
    for r in got_n.values():
        assert r["n_rows"] == 64
        assert r["avg_sq_err"] > 0.0
