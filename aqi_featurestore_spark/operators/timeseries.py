"""Time-series utilities: dense time spines (gap filling) and
inter-arrival statistics.

Rollups silently drop empty buckets — `groupBy(hour)` has no row for an
hour with no events, which poisons downstream lag/window features (the
lag of a missing hour is the PREVIOUS hour's value, off by one slot) and
under-reports outage windows, exactly the case monitoring exists for.
`fill_time_gaps` densifies: generate the complete bucket spine between
the observed min and max, left-join the real aggregate, zero-fill.

Scale shape: the spine derives from a single-row (min, max) aggregate
exploded with `sequence()` — the generated spine is O(time-range /
step), independent of fact rows (6 years of hours ≈ 53k rows), then
repartitioned off the single explode task. The per-bucket aggregate of
the fact table is the only row-count-proportional work, and the final
join broadcasts whichever side is tiny (both are bucket-domain-sized).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fill_time_gaps(
    df: DataFrame,
    ts_col: str,
    *,
    step: str = "1 hour",
    trunc: str = "hour",
    aggs: Sequence = (),
) -> DataFrame:
    """Dense per-bucket aggregate: truncate ``ts_col`` to ``trunc``,
    aggregate ``aggs`` per bucket, then left-join onto the complete
    ``step``-spaced spine from min to max bucket so empty buckets
    surface as rows.

    Returns one row per spine bucket: ``(bucket, n, *aggs)`` with ``n``
    the row count, coalesced to 0 for gap rows. User-supplied ``aggs``
    stay NULL on gap rows (only ``n`` is zero-filled — a NULL mean/min
    for an empty bucket is correct; a fabricated 0 would not be).

    The grouping column is computed under an internal name so an input
    that already has a ``bucket`` column cannot collide; the output
    column is still named ``bucket``."""
    tmp = "__fill_time_gaps_bucket__"
    per_bucket = (
        df.withColumn(tmp, F.date_trunc(trunc, F.col(ts_col)))
        .groupBy(tmp)
        .agg(F.count("*").alias("n"), *aggs)
        .withColumnRenamed(tmp, "bucket")
    )
    bounds = df.select(F.date_trunc(trunc, F.col(ts_col)).alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))).alias(
                "bucket"
            )
        )
        # the explode emits the whole spine from ONE task; spread it
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    out = spine.join(per_bucket, "bucket", "left")
    return out.withColumn("n", F.coalesce("n", F.lit(0)))


def inter_arrival_stats(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    *,
    tie_break: str | None = None,
) -> DataFrame:
    """Per-key inter-arrival summary: count of gaps, min/max/sum of the
    microsecond-granularity gaps between consecutive rows (ordered by
    ``ts_col``, then ``tie_break`` for a total order). Integer µs
    throughout — no float time math. One window sort per key partition,
    then a hash aggregate; keys with a single row emit no gap row (no
    0-gap fabrication)."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + (
        [F.col(tie_break).asc()] if tie_break else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = (epoch - F.lag(epoch).over(w)).alias("gap_us")
    return (
        df.select(*keys, gap)
        .where(F.col("gap_us").isNotNull())
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("sum_gap_us"),
        )
    )
