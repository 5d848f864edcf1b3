"""Range (interval-containment) join via bucketed expansion.

Spark has no native range-join strategy: ``points.join(intervals,
point BETWEEN start AND end)`` is a pure theta join, which Catalyst
executes as BroadcastNestedLoopJoin (O(|P|·|I|) comparisons, and only
when one side fits in memory) or a cartesian product. Both die at
100 TB. The classic fix — the same binning strategy behind Databricks'
``RANGE_JOIN`` hint and KDB's window joins — turns the containment
predicate into an equi-join:

1. points get ``bucket = floor(point / width)`` (one bucket per row);
2. each interval explodes to every bucket its span covers
   (``sequence(floor(start/width), floor(end/width))`` — replication
   factor ``span/width + 1``);
3. equi-join on bucket (plus any user equi-keys) — a plain shuffled
   hash/sort-merge join Catalyst can plan, prune, and AQE-rebalance;
4. residual filter ``start <= point <= end`` (inclusive, = SQL
   BETWEEN) discards same-bucket non-overlaps.

Each (point, interval) match meets in exactly ONE bucket — the point's
— so the output needs no dedup. Choose ``bucket_width`` near the
typical interval span: replication stays ~2× while each point probes
one bucket. ``max_replication`` fails fast inside the plan (no driver
action) if a rogue interval would explode the build side.

Only ``how="inner"`` is supported: outer semantics under bucket
replication would surface unmatched interval rows once per covered
bucket (same failure mode ``skew.salted_equi_join`` rejects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    bucket_width: int,
    equi_keys: list[str] | None = None,
    how: str = "inner",
    max_replication: int | None = 4096,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[start, end]`` (inclusive) contains its ``point``. All three are
    numeric columns in the same unit; for timestamps use
    :func:`range_join_time`. Intervals with ``end < start`` match
    nothing (dropped — Spark's descending ``sequence`` would otherwise
    fabricate buckets for them).

    ``equi_keys`` name columns present on BOTH sides that must also be
    equal; they become part of the shuffle key, so a per-entity range
    join co-partitions by (entity, bucket). All other column names must
    be disjoint."""
    if how != "inner":
        raise ValueError(
            f"range_join supports how='inner' only, got {how!r}: bucket "
            "replication would emit unmatched interval rows once per bucket"
        )
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    equi_keys = equi_keys or []
    shared = ({*points.columns} & {*intervals.columns}) - set(equi_keys)
    if shared:
        raise ValueError(f"non-key columns appear on both sides: {sorted(shared)}")

    lo = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
    hi = F.floor(F.col(end) / F.lit(bucket_width)).cast("long")
    if max_replication is not None:
        hi = F.when(
            F.assert_true(
                hi - lo < F.lit(max_replication),
                F.concat(
                    F.lit(f"range_join: interval spans >= {max_replication} "
                          f"buckets of width {bucket_width}; raise bucket_width "
                          "or max_replication. start="),
                    F.col(start).cast("string"), F.lit(" end="),
                    F.col(end).cast("string"),
                ),
            ).isNull(),
            hi,
        )
    exploded = intervals.filter(F.col(end) >= F.col(start)).withColumn(
        _BUCKET, F.explode(F.sequence(lo, hi))
    )
    bucketed_points = points.withColumn(
        _BUCKET, F.floor(F.col(point) / F.lit(bucket_width)).cast("long")
    )
    return (
        bucketed_points.join(exploded, [_BUCKET, *equi_keys], "inner")
        .filter((F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end)))
        .drop(_BUCKET)
    )


def range_join_time(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    bucket_width_seconds: int,
    equi_keys: list[str] | None = None,
    max_replication: int | None = 4096,
) -> DataFrame:
    """:func:`range_join` over timestamp columns: buckets on epoch
    microseconds (full precision — second-truncated epochs would pull
    sub-second points across the boundary), output keeps the original
    timestamp columns."""
    us = [f"__rj_us_{c}" for c in (point, start, end)]

    def _us(c: str):
        # unix_micros rejects TIMESTAMP_NTZ; the cast shifts all three
        # columns by the same session-tz offset, so containment is
        # unchanged (and the session is pinned UTC anyway).
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn(us[0], _us(point))
    iv = intervals.withColumn(us[1], _us(start)).withColumn(us[2], _us(end))
    out = range_join(
        p,
        iv,
        point=us[0],
        start=us[1],
        end=us[2],
        bucket_width=bucket_width_seconds * 1_000_000,
        equi_keys=equi_keys,
        max_replication=max_replication,
    )
    return out.drop(*us)
