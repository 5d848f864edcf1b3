"""Model evaluation metrics over prediction DataFrames (SURVEY.md §2.4 A5).

The reference computes MAE/RMSE/R² with sklearn on a driver-side pandas
frame (model/aqi_predict_hn.py:61-69); here they are two Spark
aggregations over the full distributed frame.

Determinism contract: every sum accumulates 6-dp-rounded integer terms
(``round(term * 10^6)`` as long), so results are independent of
partitioning/summation order and bit-identical across engines — the same
integer-space pattern as q1_pricing_summary. Metrics are therefore exact
for 6-dp-rounded errors (documented approximation, far below any model's
noise floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def regression_metrics(
    df: DataFrame, *, y: str, yhat: str, scale: int = SCALE
) -> DataFrame:
    """One-row (mae, rmse, r2, n) for predictions ``yhat`` against truth
    ``y``. Rows where either side is NULL are excluded (the reference
    dropna()s before fitting)."""
    d = df.where(F.col(y).isNotNull() & F.col(yhat).isNotNull())
    err = F.col(y) - F.col(yhat)
    abs_i = F.round(F.abs(err) * scale, 0).cast("long")
    sq_i = F.round(err * err * scale, 0).cast("long")
    y_i = F.round(F.col(y) * scale, 0).cast("long")

    stage1 = d.agg(
        F.sum(abs_i).alias("s_abs"),
        F.sum(sq_i).alias("s_sq"),
        F.sum(y_i).alias("s_y"),
        F.count("*").alias("n"),
    )
    # mean from exact integer sums -> single deterministic division
    with_mean = d.crossJoin(
        F.broadcast(stage1.select((F.col("s_y").cast("double") / scale / F.col("n")).alias("y_mean")))
    )
    tot_i = F.round((F.col(y) - F.col("y_mean")) * (F.col(y) - F.col("y_mean")) * scale, 0).cast("long")
    sstot = with_mean.agg(F.sum(tot_i).alias("s_tot"))

    return (
        stage1.crossJoin(sstot)
        .select(
            (F.col("s_abs").cast("double") / scale / F.col("n")).alias("mae"),
            F.sqrt(F.col("s_sq").cast("double") / scale / F.col("n")).alias("rmse"),
            (
                F.lit(1.0)
                - (F.col("s_sq").cast("double") / scale)
                / (F.col("s_tot").cast("double") / scale)
            ).alias("r2"),
            F.col("n"),
        )
    )
