"""Lag-feature windowing (W1).

The reference computes ``last_hour_aqi`` in pandas with a *global* sort +
shift (model/aqi_predict_hn.py:40-47) — safe only because each script
handles a single entity. The engine partitions the window by entity so the
same operator is correct (and parallel) across millions of entities: each
entity's history sorts independently within its shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_lag_features(
    df: DataFrame,
    cols: dict[str, str],
    *,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    offset: int = 1,
    drop_incomplete: bool = False,
) -> DataFrame:
    """Add lagged columns. ``cols`` maps source column -> new lag column
    (e.g. {"aqi": "last_hour_aqi"}). ``drop_incomplete`` reproduces the
    reference's ``dropna()`` after the shift (first row per entity has no
    predecessor)."""
    partition_by = partition_by or ["entity_id"]
    order_by = order_by or ["datetime"]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumns({new: F.lag(src, offset).over(w) for src, new in cols.items()})
    if drop_incomplete:
        out = out.na.drop(subset=list(cols.values()))
    return out
