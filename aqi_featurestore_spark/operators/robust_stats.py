"""Robust per-group statistics: winsorized moments and MAD outliers.

Training-data pipelines clip or drop outliers before a feature reaches a
model (a single 1e9 sensor glitch moves a mean arbitrarily far; the
reference caps AQI at a fixed 500, which is the degenerate
known-bounds case of the same idea). These operators compute the bounds
FROM the data, per group:

- ``winsorized_stats``: clip at exact per-group percentiles (p01/p99 by
  default) and report the clipped mean + clip counts.
- ``mad_outliers``: median absolute deviation — the robust sigma. A row
  is an outlier when ``|v - median| > scale * MAD`` (scale 4.4478 =
  3 * 1.4826 ≈ three Gaussian sigmas).

Exactness/scale trade-off: ``approx=False`` (default) uses exact
``percentile`` — per-group value buffering, right for bounded group
domains (event types, sensor classes) and REQUIRED for the DuckDB
oracle gate. ``approx=True`` swaps in ``percentile_approx`` (t-digest
style sketch, fixed memory, mergeable map-side) — the path for
unbounded group counts or billion-row groups at 100 TB, identical plan
shape otherwise.

Cross-engine float policy: percentile outputs are rounded to 4 decimals
BEFORE use (both engines interpolate linearly; rounding the bound is the
spec, not a fudge — downstream comparisons are then engine-exact), and
all sums accumulate fixed-point cents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pct(value_col: str, p: float, approx: bool):
    c = F.col(value_col)
    return (
        F.percentile_approx(c, F.lit(p), F.lit(50_000))
        if approx
        else F.percentile(c, F.lit(p))
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    *,
    lo: float = 0.01,
    hi: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Per-key winsorized summary: percentile bounds (rounded to 4dp),
    row count, rows clipped at each side, exact cent-sum of the clipped
    values, and the clipped mean.

    Two passes over the fact (both column-pruned to keys+value): pass 1
    aggregates the bounds per key, pass 2 re-scans, broadcast-joins the
    tiny bounds table, clips, and aggregates. No window, no sort; both
    shuffles key on the group columns."""
    bounds = df.groupBy(*keys).agg(
        F.round(_pct(value_col, lo, approx), 4).alias("lo_bound"),
        F.round(_pct(value_col, hi, approx), 4).alias("hi_bound"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("lo_bound")), F.col("hi_bound"))
    return (
        df.join(F.broadcast(bounds), list(keys))
        .groupBy(*keys)
        .agg(
            F.first("lo_bound").alias("lo_bound"),
            F.first("hi_bound").alias("hi_bound"),
            F.count("*").alias("n"),
            F.sum((v < F.col("lo_bound")).cast("long")).alias("n_clip_lo"),
            F.sum((v > F.col("hi_bound")).cast("long")).alias("n_clip_hi"),
            F.sum(F.round(clipped * 100, 0).cast("long")).alias("sum_wins_c"),
        )
        .withColumn(
            "mean_wins",
            F.round(F.col("sum_wins_c") / (F.col("n") * F.lit(100.0)), 6),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    *,
    threshold_scale: float = 4.4478,
    approx: bool = False,
) -> DataFrame:
    """Per-key robust outlier census: median (4dp), MAD (4dp), row count,
    and the count of rows with ``|v - median| > threshold_scale * MAD``.

    Three key-pruned passes (median -> MAD of deviations -> flag count);
    the two intermediate tables are one row per key and broadcast. The
    deviation is recomputed from the ROUNDED median on both passes so
    every engine compares identical doubles."""
    med = df.groupBy(*keys).agg(
        F.round(_pct(value_col, 0.5, approx), 4).alias("med")
    )
    dev = F.abs(F.col(value_col) - F.col("med"))
    mad = (
        df.join(F.broadcast(med), list(keys))
        .groupBy(*keys)
        .agg(
            F.first("med").alias("med"),
            F.round(
                F.percentile_approx(dev, F.lit(0.5), F.lit(50_000))
                if approx
                else F.percentile(dev, F.lit(0.5)),
                4,
            ).alias("mad"),
        )
    )
    return (
        df.join(F.broadcast(mad), list(keys))
        .groupBy(*keys)
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count("*").alias("n"),
            F.sum(
                (dev > F.col("mad") * F.lit(threshold_scale)).cast("long")
            ).alias("n_outliers"),
        )
    )
