"""Piecewise-linear AQI from PM2.5 as a native Catalyst expression.

The reference implements this three times as Python UDFs / pandas applies
with *divergent* out-of-range behavior (SURVEY.md §2.8 F17):

- spark/code/write_to_bigquery.py:91-107 — default ``8.5``
- airflow/dags/load.py:104-117         — default ``None``, result ``round()``-ed
- airflow/dags/redis_data.py:29-42     — default ``500``

All three share the EPA PM2.5 breakpoint table, *including its gaps*
(e.g. 12.0 < c < 12.1 matches no interval and falls through to the
default) — the gap behavior is part of the spec and preserved here.

Instead of a UDF we emit one chained ``F.when`` CASE expression: it stays
JVM-side inside whole-stage codegen, vectorizes over Parquet columnar
batches, and removes the Python-worker boundary that made the reference's
transform its hot-path bottleneck (BASELINE.md "Transform hot path").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (bp_lo, bp_hi, i_lo, i_hi) — identical in all three reference variants.
AQI_BREAKPOINTS: tuple[tuple[float, float, int, int], ...] = (
    (0.0, 12.0, 0, 50),
    (12.1, 35.4, 51, 100),
    (35.5, 55.4, 101, 150),
    (55.5, 150.4, 151, 200),
    (150.5, 250.4, 201, 300),
    (250.5, 350.4, 301, 400),
    (350.5, 500.4, 401, 500),
)


def aqi_from_pm25(
    c: Column | str,
    *,
    default: float | None = 8.5,
    round_to_int: bool = False,
    breakpoints: tuple[tuple[float, float, int, int], ...] = AQI_BREAKPOINTS,
) -> Column:
    """AQI(US) from a PM2.5 concentration column.

    ``default`` selects the reference variant: 8.5 (offline Spark job),
    None (loader), 500 (online refresh). ``round_to_int=True`` reproduces
    the loader's ``round()`` (half-to-even in Python; we use ``F.round``
    half-up — documented divergence, loader variant is not on the
    correctness path). NULL input yields NULL (the reference guards with
    ``pd.notna`` before calling).
    """
    col = F.col(c) if isinstance(c, str) else c
    expr: Column | None = None
    for bp_lo, bp_hi, i_lo, i_hi in breakpoints:
        interp = ((i_hi - i_lo) / (bp_hi - bp_lo)) * (col - F.lit(bp_lo)) + F.lit(float(i_lo))
        cond = (col >= F.lit(bp_lo)) & (col <= F.lit(bp_hi))
        expr = F.when(cond, interp) if expr is None else expr.when(cond, interp)
    assert expr is not None
    default_col = F.lit(None).cast("double") if default is None else F.lit(float(default))
    out = expr.otherwise(F.when(col.isNotNull(), default_col))
    if round_to_int:
        out = F.round(out, 0)
    return out


def aqi_level_label(aqi: Column | str) -> Column:
    """CASE classification of an AQI value into the reference's labels
    (agent/aqi-agent/app/agent.py:103-107): <=50 good, <=100 moderate,
    <=150 unhealthy-for-sensitive, else unhealthy."""
    col = F.col(aqi) if isinstance(aqi, str) else aqi
    return (
        F.when(col <= 50, F.lit("good"))
        .when(col <= 100, F.lit("moderate"))
        .when(col <= 150, F.lit("unhealthy_sensitive"))
        .otherwise(F.lit("unhealthy"))
    )


def aqi_case_sql(column: str, *, default: float | None = 8.5) -> str:
    """The exact same piecewise expression as ANSI SQL (for oracle parity
    and for use via ``spark.sql``). Gap + NULL semantics match
    :func:`aqi_from_pm25`."""
    arms = []
    for bp_lo, bp_hi, i_lo, i_hi in AQI_BREAKPOINTS:
        slope = (i_hi - i_lo) / (bp_hi - bp_lo)
        # CASTs force DOUBLE literals (DuckDB parses bare decimal literals
        # as DECIMAL, which would change the arithmetic); operation order
        # matches aqi_from_pm25 exactly: slope * (c - lo) + i_lo.
        arms.append(
            f"WHEN {column} >= {bp_lo!r} AND {column} <= {bp_hi!r} "
            f"THEN CAST({slope!r} AS DOUBLE) * ({column} - CAST({bp_lo!r} AS DOUBLE)) "
            f"+ CAST({float(i_lo)!r} AS DOUBLE)"
        )
    default_sql = "NULL" if default is None else f"CAST({float(default)!r} AS DOUBLE)"
    arms.append(f"WHEN {column} IS NOT NULL THEN {default_sql}")
    return "CASE " + " ".join(arms) + " ELSE NULL END"
