"""Unit tests for operators/linear_model.py — the integer-exact
hard-sigmoid logistic GD and the pinned rounding primitives it relies
on. The registry oracles prove cross-engine parity end to end; these
tests pin the arithmetic CONTRACT on planted cases small enough to
verify by hand, so a refactor cannot silently change the number system
while both engines drift together."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.linear_model import (
    MICRO,
    SIG_DEN,
    fit_reference,
    floordiv_col,
    floordiv_sql,
    hard_sigmoid_micro,
    hardlogit_fit,
    margin_col,
    micro_vec,
)


def test_floordiv_parity_negative_operands(spark):
    """The one rounding point of the training loop: Spark's
    (a - pmod)/b, DuckDB's ((a%b+b)%b) form, and Python's // must agree
    on negative dividends (C-style truncation would give -1 for
    -7 // 4 instead of the floored -2)."""
    cases = [(-7, 4), (7, 4), (-8, 4), (-1, 4_000_000), (-4_000_001, 4_000_000)]
    got = (
        spark.range(1)
        .select(
            *[
                floordiv_col(F.lit(a).cast("long"), b).alias(f"q{i}")
                for i, (a, b) in enumerate(cases)
            ]
        )
        .collect()[0]
    )
    for i, (a, b) in enumerate(cases):
        duck = duckdb.sql(f"SELECT {floordiv_sql(str(a), b)}").fetchone()[0]
        assert got[f"q{i}"] == a // b == duck, (a, b, got[f"q{i}"], duck)


def test_floordiv_col_rejects_nonpositive_divisor():
    with pytest.raises(ValueError):
        floordiv_col(F.lit(1), 0)


def test_hard_sigmoid_clamps_and_center(spark):
    """s(0)=0.5; |m| >= 2 margin units saturates at the clamp; interior
    points floor toward -inf (one p12 unit below zero steps down a full
    micro-step — the pinned floor behavior, not truncation)."""
    pts = {
        0: MICRO // 2,
        2 * MICRO * MICRO: MICRO,  # m = +2.0 -> 0.5 + 0.5 = 1.0 (boundary)
        4 * MICRO * MICRO: MICRO,  # m = +4.0 -> raw 1.5 clamps to 1.0
        -4 * MICRO * MICRO: 0,  # m = -4.0 -> raw -0.5 clamps to 0
        SIG_DEN: MICRO // 2 + 1,  # one sigmoid micro-step up
        -1: MICRO // 2 - 1,  # floor: steps DOWN (truncation would stay)
        1: MICRO // 2,
    }
    df = spark.createDataFrame([(m,) for m in pts], "m long")
    got = {
        r["m"]: r["s"]
        for r in df.select("m", hard_sigmoid_micro(F.col("m")).alias("s")).collect()
    }
    assert got == pts


def test_fit_matches_sequential_reference(spark):
    """Planted 6-vector, 3-dim corpus: the distributed fit reproduces
    the pure-Python sequential reference integer-for-integer (weights
    AND bias), including negative-gradient floor rounding."""
    vecs = [
        ([0.5, -0.25, 0.125], 1),
        ([-0.5, 0.25, 0.0], 0),
        ([0.375, 0.375, -0.125], 1),
        ([-0.25, -0.5, 0.25], 0),
        ([0.125, 0.0, 0.5], 1),
        ([0.0, -0.125, -0.375], 0),
    ]
    df = spark.createDataFrame(
        [(i, v, y) for i, (v, y) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    w, b, n = hardlogit_fit(
        df,
        label_col=F.col("label").cast("long"),
        dim=3,
        iters=4,
        lr_num=8,
    )
    xs = [[round(x * MICRO) for x in v] for v, _ in vecs]
    ys = [y for _, y in vecs]
    rw, rb = fit_reference(xs, ys, iters=4, lr_num=8)
    assert n == 6
    assert w == rw
    assert b == rb
    # the planted corpus is linearly separable on dim 0: the fit must
    # have moved weight 0 positive (a semantic floor under the parity)
    assert w[0] > 0


def test_fit_rejects_bad_lr_and_mode(spark):
    df = spark.createDataFrame([(0, [0.0], 0)], "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError):
        hardlogit_fit(df, label_col=F.col("label"), dim=1, lr_num=3)
    with pytest.raises(ValueError):
        hardlogit_fit(df, label_col=F.col("label"), dim=1, on_overflow="wrap")


def test_fit_overflow_guard(spark):
    """Rows above max_exact_rows: 'error' refuses; 'sample' re-fits on
    the deterministic md5 subset and returns a model (exactness bound
    honored by shrinking the corpus, the PCA-guard precedent)."""
    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.25), F.lit(-0.25)).cast("array<float>").alias("embedding"),
        (F.col("id") % 2).cast("int").alias("label"),
    )
    with pytest.raises(ValueError, match="exceeds the exact int64"):
        hardlogit_fit(
            df,
            label_col=F.col("label").cast("long"),
            dim=2,
            iters=1,
            max_exact_rows=10,
            on_overflow="error",
        )
    w, b, n = hardlogit_fit(
        df,
        label_col=F.col("label").cast("long"),
        dim=2,
        iters=1,
        max_exact_rows=10,
        on_overflow="sample",
    )
    assert n <= 10 and len(w) == 2


def test_margin_fold_is_exact_int(spark):
    """margin = b*1e6 + sum w*x in pure int64: planted case crossing
    zero, checked against Python ints."""
    w = [1_000, -2_000, 3_000]
    b = -1
    v = [250_000, 500_000, -125_000]
    expect = b * MICRO + sum(wi * xi for wi, xi in zip(w, v))
    got = (
        spark.range(1)
        .select(
            margin_col(
                F.array(*[F.lit(x).cast("long") for x in v]), w, b
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert got == expect


def test_micro_vec_round_half_up_parity(spark):
    """Quantization is F.round (HALF_UP at .5) — pin one exact .5 case
    so the oracle's round() stays the same function."""
    df = spark.createDataFrame([([0.0000005, -0.0000005],)], "embedding array<double>")
    got = df.select(micro_vec("embedding").alias("v")).collect()[0]["v"]
    duck = duckdb.sql(
        "SELECT [CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) "
        "FOR x IN [0.0000005, -0.0000005]]"
    ).fetchone()[0]
    assert list(got) == list(duck)


def test_classifier_learns_signal(spark):
    """Semantic floor under the parity gates (the pinned-ANN-recall
    discipline, round 6): the trained scorer must actually separate the
    classes on the fixture corpus — measured AUC 0.682 at sf0.001,
    pinned >= 0.65 — and the margin>0 selection must be a nontrivial
    strict subset. An arithmetic change that kept both engines in
    lockstep but destroyed the model (e.g. lr to zero) fails here, not
    at the oracle."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    row = QUERIES["classifier_auc"](spark, sf).collect()[0]
    assert row["auc"] >= 0.65, row
    n_sel = QUERIES["quality_classifier_select"](spark, sf).count()
    assert 0 < n_sel < row["n_pos"] + row["n_neg"]


def test_auc_hand_case():
    """The binned rank-sum AUC identity on a hand case with ties:
    buckets (score asc) pos/neg = [(0,2),(1,1),(2,0)]: concordant pairs
    = 2 (b1 pos over b0 negs) + 6 (b2 pos pair over all negs), tied
    pairs = 1 (within b1, half credit) -> AUC = 8.5/9; the integer
    numerator num = 1*(2*2+1) + 2*(2*3+0) = 17 = 2*P*N*AUC."""
    buckets = [(0, 2), (1, 1), (2, 0)]
    num = 0
    cumneg = 0
    for pos, neg in buckets:
        num += pos * (2 * cumneg + neg)
        cumneg += neg
    p = sum(b[0] for b in buckets)
    n = sum(b[1] for b in buckets)
    assert (num, p, n) == (17, 3, 3)
    assert num / (2 * p * n) == pytest.approx(17 / 18)


def test_feature_mi_hand_cases(spark):
    """MI ground truths on planted data: a dimension that equals the
    label has MI = ln 2 (one bit); a constant dimension has MI = 0.
    Balanced 4-row corpus, labels {0,0,1,1}, dim0 = +-0.5 tracking the
    label, dim1 constant 0."""
    from aqi_featurestore_spark.plans.model_curation import q_feature_mi
    import math, os, tempfile

    rows = [
        (0, [-0.5, 0.0], 0),
        (1, [-0.5, 0.0], 4),
        (2, [0.5, 0.0], 5),
        (3, [0.5, 0.0], 9),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        got = {
            r["dim_id"]: r["mi"]
            for r in q_feature_mi(spark, d).collect()
        }
    assert got[0] == pytest.approx(math.log(2), abs=2e-6)
    assert got[1] == 0.0


def test_epoch_shuffle_plan_contract(spark):
    """Positions are contiguous 1..n within every (epoch, shard); every
    doc appears exactly once per epoch; epochs genuinely reshuffle (the
    per-epoch doc orderings differ); rerun is bit-stable."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    df = QUERIES["epoch_shuffle_plan"](spark, sf)
    rows = df.collect()
    n_docs = len({r["doc_id"] for r in rows})
    per_epoch = {}
    by_shard = {}
    for r in rows:
        per_epoch.setdefault(r["epoch"], []).append(r["doc_id"])
        by_shard.setdefault((r["epoch"], r["shard_id"]), []).append(r["pos"])
    assert set(per_epoch) == {0, 1, 2}
    for ep, docs in per_epoch.items():
        assert len(docs) == n_docs == len(set(docs))
    for key, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), key
    order = {
        ep: [d for _, _, d in sorted(
            (r["shard_id"], r["pos"], r["doc_id"]) for r in rows if r["epoch"] == ep
        ) ]
        for ep in (0, 1, 2)
    }
    # hash re-keying must actually permute the visit order across epochs
    assert order[0] != order[1] != order[2]
    rerun = {tuple(r) for r in QUERIES["epoch_shuffle_plan"](spark, sf).collect()}
    assert rerun == {tuple(r) for r in rows}


def test_classifier_calibration_invariants(spark):
    """Reliability-curve contract at sf0.001: buckets in [0, 10), counts
    cover the corpus, mean_pred stays inside its bucket's probability
    range, and gap is exactly |pos_rate - mean_pred| (to rounding)."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["classifier_calibration"](spark, sf).collect()
    n_vecs = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert sum(r["n"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["bucket_id"] < 10
        lo, hi = r["bucket_id"] / 10, (r["bucket_id"] + 1) / 10
        # top bucket includes s == 1.0 exactly
        assert lo - 1e-6 <= r["mean_pred"] <= (hi + 1e-6 if r["bucket_id"] < 9 else 1.0)
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["gap"] == pytest.approx(abs(r["pos_rate"] - r["mean_pred"]), abs=3e-6)


def test_label_noise_audit_contract(spark):
    """Disagreement audit at sf0.001: rows cover all present classes,
    counts are consistent (n_disagree = n - n_pred_pos for positive
    classes, = n_pred_pos for negative ones), and extreme classes
    disagree no more than the boundary pair on average."""
    from aqi_featurestore_spark.plans import QUERIES

    rows = QUERIES["label_noise_audit"](spark, "/root/testdata/sf0.001").collect()
    got = {r["label"]: r for r in rows}
    n_total = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert sum(r["n"] for r in rows) == n_total
    for r in rows:
        want = (
            r["n"] - r["n_pred_pos"] if r["label"] >= 5 else r["n_pred_pos"]
        )
        assert r["n_disagree"] == want, r
        assert r["disagree_rate"] == pytest.approx(r["n_disagree"] / r["n"], abs=1e-6)
    extreme = [got[c]["disagree_rate"] for c in (0, 1, 8, 9) if c in got]
    boundary = [got[c]["disagree_rate"] for c in (4, 5) if c in got]
    if extreme and boundary:
        assert sum(extreme) / len(extreme) <= sum(boundary) / len(boundary) + 0.25
