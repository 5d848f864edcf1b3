"""Distributed linear quality-classifier training (hard-sigmoid
logistic regression by full-batch gradient descent) with exact
integer-micro-unit arithmetic, so a SQL oracle can reproduce every
weight bit-for-bit.

This is the model-based data-curation primitive (the FineWeb-Edu /
quality-classifier pipeline shape): fit a linear scorer on labeled
embedding vectors, then score, select, and evaluate the corpus with it.
The reference has no model-training surface (its ML is an offline
sklearn notebook, reference ml/train.py) — this family extends the
engine per the LLM-pipeline brief; method is standard batch GD with the
hard-sigmoid activation of quantized-network practice (e.g. Courbariaux
et al. 2015), chosen here because it is piecewise-RATIONAL: every
training op stays in exact integer arithmetic, which is what makes the
cross-engine oracle possible (no transcendental whose libm rounding
could differ).

Number system (all BIGINT):

- features  x_micro = round(x * 1e6)                 (scale 1e-6)
- weights   w_micro                                   (scale 1e-6)
- margins   m_p12 = b_micro*1e6 + sum_d w_d * x_d     (scale 1e-12)
- hard sigmoid  s_micro = clamp(5e5 + floordiv(m_p12, 4e6), 0, 1e6)
  — i.e. s = clip(0.5 + m/4, 0, 1), the published hard-sigmoid form.
- error     e_micro = s_micro - y * 1e6               (scale 1e-6)
- gradient  G_d = sum_i e_i * x_id  (p12, exact int64 sum, order-free)
- update    w_d -= floordiv(G_d, n * (2e6 / lr_num))   (lr = lr_num/2)
            b   -= floordiv(lr_num * B, 2 * n)

``floordiv(a, b) = (a - pmod(a, b)) / b`` (b > 0) floors toward -inf
identically in Spark (F.pmod), DuckDB (((a%b)+b)%b), and Python (//) —
the one rounding point in the loop, pinned to a single definition.

Exact-int64 bound: per row |e * x| <= 1e6 * max|x_micro|, so the
gradient sum stays exact while n * 1e6 * max|x_micro| < 2^63. For
|x| <= 1 (max|x_micro| = 1e6) that allows n <~ 9.2e6; for the |x| <= 2
envelope this module documents (max|x_micro| = 2e6) it is n <~ 4.6e6.
``MAX_EXACT_ROWS`` pins 4_000_000 — provably inside the bound at
|x| <= 2 without measuring max|x_micro| (operators/pca.py pins 9e6
under its own 9.2e6 bound because its inputs are contractually
|x| <= 1). Same overflow escape as pca: ``on_overflow="error"``
refuses, ``"sample"`` (default) re-fits on a deterministic md5 row
sample — and the fit hands back the sampled frame so callers staging
extra rounds train on the SAME rows the returned weights came from.

Scale shape (the Lloyd's-fit discipline, operators/clustering.py):
each round is ONE no-shuffle margin map against broadcast literal
weights + ONE map-side-combined aggregate down to a single row of
dim+2 BIGINTs, collected. Driver state is dim+1 integers; nothing
corpus-sized is ever collected or shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.portable_hash import md5_int32

MICRO = 1_000_000
#: hard-sigmoid slope denominator: s = 0.5 + m/4 -> floordiv(m_p12, 4e6)
SIG_DEN = 4 * MICRO
#: Flat exact-int64 row bound for the gradient sums — provable at the
#: documented |x| <= 2 input envelope: 2^63 / (1e6 * 2e6) ~ 4.6e6
#: rows, pinned conservatively below (module header).
MAX_EXACT_ROWS = 4_000_000


def floordiv_col(a: Column, b: int) -> Column:
    """Floor division of a BIGINT column by a positive int literal,
    exact and engine-portable: (a - pmod(a, b)) / b. The double
    division is exact because (a - pmod) is an exact multiple of b and
    the quotient magnitude stays far below 2^53."""
    if b <= 0:
        raise ValueError(f"floordiv_col requires b > 0, got {b}")
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def floordiv_sql(a: str, b: int) -> str:
    """DuckDB twin of :func:`floordiv_col` (same rounding point)."""
    return f"CAST(({a} - ((({a}) % {b} + {b}) % {b})) / {b} AS BIGINT)"


def micro_vec(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * MICRO, 0).cast("long")
    )


def margin_col(vec_micro: Column, w_micro: list[int], b_micro: int) -> Column:
    """m_p12 = b*1e6 + sum_d w_d * x_d over a micro-int vector column
    against literal weights — a pure-JVM zip_with/aggregate fold, no
    Python boundary, exact int64."""
    lits = F.array(*[F.lit(int(w)).cast("long") for w in w_micro])
    return F.aggregate(
        F.zip_with(vec_micro, lits, lambda x, wi: x * wi),
        F.lit(int(b_micro) * MICRO).cast("long"),
        lambda acc, x: acc + x,
    )


def hard_sigmoid_micro(m_p12: Column) -> Column:
    """clamp(5e5 + floordiv(m, 4e6), 0, 1e6) — exact int."""
    raw = F.lit(MICRO // 2).cast("long") + floordiv_col(m_p12, SIG_DEN)
    return F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(MICRO).cast("long"))


@dataclass
class HardlogitFit:
    """Full fit result: the (w_micro, b_micro) state after EVERY round
    (``rounds[t]`` = weights after round t+1, ``rounds[-1]`` = final),
    the training row count, and — critically — the exact DataFrame the
    weights were trained on (``train_df``). When the overflow guard
    sampled, ``train_df`` IS the md5 sample and ``sampled`` is True, so
    a caller staging an extra in-plan GD round (the
    quality_classifier_train hybrid) aggregates over the same rows it
    divides by ``n`` for — never full-corpus gradients over a sampled
    count. The trajectory also gives model-registry consumers every
    intermediate version (e.g. the T-1 model) from ONE fit."""

    rounds: list[tuple[list[int], int]]
    n: int
    train_df: DataFrame
    sampled: bool = False


def hardlogit_fit_trajectory(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: Column,
    dim: int = 64,
    iters: int = 6,
    lr_num: int = 8,
    max_exact_rows: int = MAX_EXACT_ROWS,
    on_overflow: str = "sample",
    init: tuple[list[int], int] | None = None,
) -> HardlogitFit:
    """Full-batch hard-sigmoid GD keeping every round's weights.

    ``init``: warm-start state (w_micro, b_micro) — e.g. weights read
    back from the model registry. Because each round is a pure function
    of (weights, data), warm-starting from round T's state and running
    k more rounds is BIT-IDENTICAL to a cold fit at T+k rounds on the
    same data (property-pinned in tests/test_model_store.py) — which is
    what makes registry-based model refresh exact rather than
    approximate.

    ``label_col``: a 0/1 integer Column (the binary quality target).
    ``lr_num`` must divide 2e6 (lr = lr_num / 2); the weight update is
    floordiv(G_d, n * (2_000_000 // lr_num)) and the bias update
    floordiv(lr_num * B, 2 * n) — both exact.

    Per round: one aggregation job producing dim+2 BIGINTs (gradient
    per dim, bias gradient, row count) — collected; the margin map runs
    against broadcast literal weights, so no round shuffles anything
    but the one map-combined aggregate. The quantized projection is
    persisted once across rounds (the kmeans_fit discipline).

    Plan-width bound: the gradient aggregate is dim+2 columns wide —
    dim-LINEAR in both plan size and driver state, property-tested at
    dim=256 (tests/test_linear_model.py). The practical ceiling is
    Catalyst's wide-aggregate handling (whole-stage codegen splits past
    ~100 exprs; compilation cost grows ~linearly), comfortably fine
    through embedding-realistic dim 512-1024; past a few thousand dims,
    switch the gradient to a posexplode + (dim)-keyed hash aggregate
    (the feature_mi shape) instead of widening the plan further. The
    int64 margin bound is separate and dim-linear too:
    |m_p12| <= |b|*1e6 + dim * max|w| * max|x_micro|."""
    if on_overflow not in ("error", "sample"):
        raise ValueError(f"unknown on_overflow mode {on_overflow!r}")
    if 2 * MICRO % lr_num:
        raise ValueError(f"lr_num={lr_num} must divide {2 * MICRO}")
    w_den = 2 * MICRO // lr_num

    vc = df.select(
        F.col(id_col).alias("_id"),
        micro_vec(vec_col).alias("_v"),
        label_col.cast("long").alias("_y"),
    ).persist()
    try:
        if init is not None:
            w, b = [int(x) for x in init[0]], int(init[1])
            if len(w) != dim:
                raise ValueError(f"init has dim {len(w)}, expected {dim}")
        else:
            w, b = [0] * dim, 0
        n = 0
        rounds: list[tuple[list[int], int]] = []
        for _ in range(iters):
            # Stage the fold ONCE per row before multi-reference use
            # (the round-6 staged-encode lesson: Catalyst higher-order
            # fns get no CSE, so an unstaged margin would re-run the
            # 64-term fold once per consumer expression).
            staged = vc.select(
                "_y", margin_col(F.col("_v"), w, b).alias("_m"), "_v"
            ).select(
                "_v", (hard_sigmoid_micro(F.col("_m")) - F.col("_y") * MICRO).alias("_e")
            )
            row = staged.agg(
                *[
                    F.sum(F.element_at("_v", d + 1) * F.col("_e")).alias(f"g{d}")
                    for d in range(dim)
                ],
                F.sum("_e").alias("gb"),
                F.count("*").alias("n"),
            ).collect()[0]
            n = row["n"]
            if n > max_exact_rows:
                if on_overflow == "error":
                    raise ValueError(
                        f"hardlogit_fit: {n} rows exceeds the exact int64 "
                        f"gradient bound ({max_exact_rows}); sums may have "
                        "overflowed. Fit on a sample (on_overflow='sample') "
                        "or pre-filter the corpus."
                    )
                thresh = int(0.8 * max_exact_rows / n * (1 << 32))
                sampled = df.where(
                    md5_int32(F.concat(F.lit("hl|"), F.col(id_col).cast("string")))
                    < F.lit(thresh)
                )
                refit = hardlogit_fit_trajectory(
                    sampled,
                    id_col=id_col,
                    vec_col=vec_col,
                    label_col=label_col,
                    dim=dim,
                    iters=iters,
                    lr_num=lr_num,
                    max_exact_rows=max_exact_rows,
                    on_overflow="error",
                    init=init,
                )
                return HardlogitFit(
                    rounds=refit.rounds,
                    n=refit.n,
                    train_df=sampled,
                    sampled=True,
                )
            w = [int(w[d]) - int(row[f"g{d}"]) // (n * w_den) for d in range(dim)]
            b = int(b) - (lr_num * int(row["gb"])) // (2 * n)
            rounds.append((w, b))
        return HardlogitFit(rounds=rounds, n=n, train_df=df, sampled=False)
    finally:
        vc.unpersist()


def hardlogit_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: Column,
    dim: int = 64,
    iters: int = 6,
    lr_num: int = 8,
    max_exact_rows: int = MAX_EXACT_ROWS,
    on_overflow: str = "sample",
) -> tuple[list[int], int, int]:
    """Final-round view of :func:`hardlogit_fit_trajectory`:
    (w_micro[dim], b_micro, n). Callers that stage additional in-plan
    rounds or need intermediate versions should take the trajectory
    (it carries the possibly-sampled ``train_df``)."""
    fit = hardlogit_fit_trajectory(
        df,
        id_col=id_col,
        vec_col=vec_col,
        label_col=label_col,
        dim=dim,
        iters=iters,
        lr_num=lr_num,
        max_exact_rows=max_exact_rows,
        on_overflow=on_overflow,
    )
    w, b = fit.rounds[-1]
    return w, b, fit.n


def fit_reference(
    xs: list[list[int]], ys: list[int], *, iters: int = 6, lr_num: int = 8
) -> tuple[list[int], int]:
    """Pure-Python sequential reference of the same pinned arithmetic
    (for property tests): identical floordiv, clamp, and update order —
    must agree with :func:`hardlogit_fit` integer-for-integer."""
    dim = len(xs[0])
    n = len(xs)
    w_den = 2 * MICRO // lr_num
    w = [0] * dim
    b = 0
    for _ in range(iters):
        gs = [0] * dim
        gb = 0
        for x, y in zip(xs, ys):
            m = b * MICRO + sum(wd * xd for wd, xd in zip(w, x))
            s = min(max(MICRO // 2 + m // SIG_DEN, 0), MICRO)
            e = s - y * MICRO
            gb += e
            for d in range(dim):
                gs[d] += e * x[d]
        w = [w[d] - gs[d] // (n * w_den) for d in range(dim)]
        b = b - (lr_num * gb) // (2 * n)
    return w, b
