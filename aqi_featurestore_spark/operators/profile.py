"""Table profiling: per-column row/null/distinct counts.

Extension beyond the reference's surface: the audit pass a pipeline
runs before training (and before trusting a new source) — how complete
is each column, how many distinct values, where are the nulls.

Shape: one single-column aggregation per profiled column, unioned.
Each branch's parquet scan prunes to exactly that column, so the cost
is N cheap columnar scans rather than one scan followed by Spark's
multi-`count_distinct` Expand (which replicates every row once per
distinct aggregate — an N× shuffle at 100 TB). Exact distinct counts
keep the result oracle-verifiable; swap `F.count_distinct` for
`F.approx_count_distinct` (HyperLogLog, mergeable, one pass for all
columns) when profiling at full scale and exactness isn't required.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``(column_name, n_rows, n_nulls, n_distinct)`` per profiled
    column (default: every column). ``n_distinct`` counts non-null
    distinct values."""
    cols = list(df.columns) if cols is None else cols
    parts = [
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.isnull(c).cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
        ).select(
            F.lit(c).alias("column_name"), "n_rows", "n_nulls", "n_distinct"
        )
        for c in cols
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
