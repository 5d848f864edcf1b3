"""Embedding-maintenance operators: centroid reduction and scalar
quantization (operators/embeddings.py). The exploded query forms are
oracle-checked by test_oracle_parity; these pin the array-form API and
the numeric contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.embeddings import (
    dim_minmax,
    label_centroids,
    quantize_embeddings,
)
from aqi_featurestore_spark.sources.testdata import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings").cache()


def test_centroids_match_local_mean(spark, emb):
    rows = emb.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    got = {
        (r["label"], r["dim"]): (r["centroid"], r["n"])
        for r in label_centroids(emb).collect()
    }
    for label, vecs in by_label.items():
        n = len(vecs)
        dim = len(vecs[0])
        for d in range(dim):
            want = sum(round(float(v[d]) * 1e6) for v in vecs) / (n * 1e6)
            c, gn = got[(label, d)]
            assert gn == n
            assert math.isclose(c, want, rel_tol=0, abs_tol=1e-12)


def test_quantize_codes_bounded_and_reconstructible(spark, emb):
    mm = dim_minmax(emb)
    q = quantize_embeddings(emb, minmax=mm)
    joined = (
        emb.join(q, "vec_id")
        .select("vec_id", "embedding", "codes")
        .limit(50)
        .collect()
    )
    assert joined
    for r in joined:
        assert len(r["codes"]) == len(r["embedding"])
        for d, (v, code) in enumerate(zip(r["embedding"], r["codes"])):
            mn, mx = mm[d]
            assert 0 <= code <= 255
            if mx > mn:
                # Dequantized midpoint is within one quantization step.
                step = (mx - mn) / 255.0
                deq = mn + code * step
                assert abs(float(v) - deq) <= step + 1e-9


def test_quantize_no_shuffle_of_vectors(spark, emb):
    """The code-assignment plan must be scan -> project (no Exchange):
    vectors are mapped in place against broadcast literal stats."""
    mm = dim_minmax(emb)
    plan = quantize_embeddings(emb, minmax=mm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_top_component_recovers_dominant_axis(spark):
    """Vectors varying strongly along axis 2 and weakly along axis 1
    (constant offset on axis 0): PC1 must be +-e_2, PC2 (via deflation)
    must be +-e_1, and the PC1 projections must equal the centered
    coordinates up to the sign."""
    from aqi_featurestore_spark.operators.pca import pca_fit, pca_project

    rows = [
        (i, [0.5, 0.01 * ((-1) ** i), float(i) / 10.0, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pcs, mean = pca_fit(df, dim=4, n_iter=30, n_components=2)
    pc1, pc2 = pcs
    assert abs(abs(pc1[2]) - 1.0) < 1e-6
    assert all(abs(pc1[j]) < 1e-3 for j in (0, 1, 3))
    assert abs(abs(pc2[1]) - 1.0) < 1e-3  # deflated second axis
    assert abs(mean[0] - 0.5) < 1e-9 and abs(mean[2] - 0.2) < 1e-9
    out = {r["vec_id"]: r for r in pca_project(df, pcs, mean).collect()}
    sgn = 1.0 if pc1[2] > 0 else -1.0
    for i in range(5):
        assert abs(out[i]["pc1_score"] - round(sgn * (i / 10.0 - 0.2), 6)) <= 1e-3
    assert set(out[0].asDict()) == {"vec_id", "pc1_score", "pc2_score"}


def test_pca_overflow_guard_raises(spark):
    """Round-5 verdict ask #4: a fit past max_exact_rows must never
    return silently-wrapped Gram sums — on_overflow='error' raises with
    the bound in the message."""
    from aqi_featurestore_spark.operators.pca import pca_fit

    rows = [(i, [float(i % 7) / 10.0] * 4) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exact int64 Gram bound"):
        pca_fit(df, dim=4, max_exact_rows=10, on_overflow="error")
    with pytest.raises(ValueError, match="on_overflow"):
        pca_fit(df, dim=4, on_overflow="ignore")


def test_pca_sampled_fit_tracks_full_fit(spark):
    """on_overflow='sample' (default): past the bound the fit reruns on
    a deterministic md5-hash row sample. On a corpus with a planted
    dominant axis the sampled PC1 must align with both the full-fit PC1
    and the planted direction (|cos| > 0.98), and the sampled mean must
    sit near the full mean — same estimator, unbiased subset."""
    import random

    from aqi_featurestore_spark.operators.pca import pca_fit

    rng = random.Random(7)
    rows = []
    for i in range(400):
        t = rng.uniform(-1.0, 1.0)
        # dominant direction e_1 + small isotropic noise, |x| <= 1 kept
        rows.append(
            (
                i,
                [
                    0.1 + 0.02 * rng.uniform(-1, 1),
                    0.8 * t + 0.02 * rng.uniform(-1, 1),
                    0.02 * rng.uniform(-1, 1),
                    0.02 * rng.uniform(-1, 1),
                ],
            )
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full_pcs, full_mean = pca_fit(df, dim=4, n_components=1)
    smp_pcs, smp_mean = pca_fit(df, dim=4, n_components=1, max_exact_rows=250)
    dot = sum(a * b for a, b in zip(full_pcs[0], smp_pcs[0]))
    assert abs(dot) > 0.98
    assert abs(abs(smp_pcs[0][1]) - 1.0) < 0.05  # planted axis recovered
    assert all(abs(a - b) < 0.05 for a, b in zip(full_mean, smp_mean))
    # determinism: the hash sample is rerun-stable
    smp_pcs2, _ = pca_fit(df, dim=4, n_components=1, max_exact_rows=250)
    assert smp_pcs2 == smp_pcs
