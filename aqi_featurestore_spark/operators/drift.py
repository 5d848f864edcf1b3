"""Distribution monitoring: fixed-width histograms and PSI drift.

A 100 TB feature pipeline needs cheap distribution fingerprints — to
validate a new ingest batch against the served population (the
reference's implicit contract is "today's AQI distribution looks like
yesterday's"; reference airflow/dags re-run the full pipeline daily and
would silently serve a drifted feature). Both operators here are
single-scan, single-shuffle plans whose shuffle key space is the BIN
domain (bounded by value-range / width), never the row count — at any
scale the reduce side is a few hundred rows.

- ``value_histogram``: floor-binned counts + exact fixed-point bin sums.
- ``psi_drift``: Population Stability Index between two populations
  held in ONE frame (a boolean side column), so reference and current
  are binned in a single pass with conditional aggregation — no second
  scan, no self-join. Per-bin smoothed PSI terms; ``sum(psi_term)`` is
  the headline index (rule of thumb: < 0.1 stable, > 0.25 drifted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    value_col: str,
    *,
    width: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram: one row per (keys..., bin) with the row
    count and the exact cent-sum of the binned values. ``bin`` is
    ``floor(value / width)`` — no data-dependent edges, so two runs (or
    two engines, or two days) bin identically and rows are comparable
    without alignment."""
    b = F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bin")
    return (
        df.select(*keys, b, F.col(value_col).alias("__v"))
        .groupBy(*keys, "bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("__v") * 100, 0).cast("long")).alias("sum_c"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_ref: Column,
    *,
    width: float,
    smooth: float = 1.0,
) -> DataFrame:
    """Per-bin PSI terms between the reference rows (``is_ref`` true)
    and the current rows (false) of one frame.

    ``p_side = (n_side + smooth) / (N_side + smooth * B)`` (Laplace —
    a bin present on one side only must not produce log(0)), where B is
    the number of observed bins across both sides;
    ``psi_term = (p_cur - p_ref) * ln(p_cur / p_ref)``.

    Plan shape: one scan, one shuffle on the bin key (bounded domain),
    then the N_ref/N_cur/B totals come from an unpartitioned window over
    the ALREADY-AGGREGATED bin rows — a "global" window, but its input
    is B rows, not the fact table, so the single-partition stage is
    O(bins) at any data scale.
    """
    b = F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bin")
    side = is_ref.cast("int").alias("__ref")
    per_bin = (
        df.select(b, side)
        .groupBy("bin")
        .agg(
            F.sum("__ref").alias("n_ref"),
            F.sum(F.lit(1) - F.col("__ref")).alias("n_cur"),
        )
    )
    w = Window.partitionBy()
    tot_ref = F.sum("n_ref").over(w)
    tot_cur = F.sum("n_cur").over(w)
    n_bins = F.count("*").over(w)
    p_ref = (F.col("n_ref") + F.lit(smooth)) / (tot_ref + F.lit(smooth) * n_bins)
    p_cur = (F.col("n_cur") + F.lit(smooth)) / (tot_cur + F.lit(smooth) * n_bins)
    return per_bin.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )
