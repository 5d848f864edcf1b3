"""Point-in-time (as-of) join — the engine's flagship operator (J1).

Semantics (from the reference's Feast feature views + training query):
for each spine row ``(entity_id, event_timestamp)`` attach the feature row
with the greatest ``feature_timestamp <= event_timestamp`` that is also
within TTL (``feature_timestamp >= event_timestamp - ttl``); no candidate
=> feature columns are NULL (the reference's consumers null-guard,
agent/aqi-agent/app/agent.py:78). Declared by
feast/features/aqi_feature.py:12-20 (timestamp_field + ttl=7d), invoked at
model/aqi_predict_hn.py:25-33.

Physical strategy (scale notes):
- equi-join on the entity keys with the time-range predicate applied as a
  join condition, so Catalyst/AQE picks broadcast-hash when the spine is
  small (the common training case: a spine of thousands vs a 100 TB feature
  log) and sort-merge otherwise.
- the "greatest timestamp" winner is selected with ``max_by`` over a
  deterministic ordering struct — a hash aggregation with map-side partial
  combine, which at scale beats the window(row_number) formulation: no
  per-partition full sort, and skewed entities are split by AQE.
- spine multiplicity is preserved by aggregating the *candidates* to one
  best-match per (keys, event_timestamp) and left-joining back to the
  spine, instead of window-ranking the joined output (which would collapse
  duplicate spine rows and break left semantics).

Ties on feature_timestamp (possible: the offline store is append-only and
re-runs double-append, SURVEY §2.9 ST6) break deterministically by the
``tie_break`` columns, then by the remaining feature columns.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_time_join(
    spine: DataFrame,
    features: DataFrame,
    keys: list[str] | None = None,
    *,
    event_ts: str = "event_timestamp",
    feature_ts: str = "feature_timestamp",
    ttl: timedelta | None = None,
    feature_cols: list[str] | None = None,
    tie_break: list[str] | None = None,
    broadcast_spine: bool | None = None,
) -> DataFrame:
    """As-of join `spine` against `features`.

    Output = all spine columns + ``feature_cols`` (default: every feature
    column except the keys) + ``feature_ts`` of the matched row. One output
    row per spine row (left semantics).
    """
    keys = keys or ["entity_id"]
    if feature_cols is None:
        feature_cols = [c for c in features.columns if c not in set(keys)]
    # Matched feature_ts rides along so callers can audit staleness.
    if feature_ts not in feature_cols:
        feature_cols = [*feature_cols, feature_ts]
    tie_break = tie_break or []

    f = features.select(*keys, *dict.fromkeys([feature_ts, *feature_cols, *tie_break]))
    s_keys = [F.col(f"s.{k}") for k in keys]

    cond = F.col(f"f.{feature_ts}") <= F.col(f"s.{event_ts}")
    if ttl is not None:
        ttl_expr = F.expr(f"s.{event_ts} - INTERVAL {int(ttl.total_seconds())} SECONDS")
        cond = cond & (F.col(f"f.{feature_ts}") >= ttl_expr)
    for k in keys:
        cond = cond & (F.col(f"s.{k}") == F.col(f"f.{k}"))

    # Distinct query points: the candidate-selection join only needs one row
    # per (keys, event_ts); duplicates in the spine re-attach in the final
    # left join.
    points = spine.select(*keys, event_ts).dropDuplicates([*keys, event_ts]).alias("s")
    if broadcast_spine is True:
        points = F.broadcast(points)

    ordering = F.struct(
        F.col(f"f.{feature_ts}"),
        *[F.col(f"f.{c}") for c in tie_break if c != feature_ts],
    )
    payload = F.struct(*[F.col(f"f.{c}").alias(c) for c in feature_cols])

    best = (
        points.join(f.alias("f"), cond, "inner")
        .groupBy(*s_keys, F.col(f"s.{event_ts}").alias(event_ts))
        .agg(F.max_by(payload, ordering).alias("__best"))
        .select(*keys, event_ts, "__best")
    )

    out = spine.join(best, on=[*keys, event_ts], how="left")
    return out.select(*spine.columns, *[F.col(f"__best.{c}").alias(c) for c in feature_cols])


def point_in_time_join_sorted(
    spine: DataFrame,
    features: DataFrame,
    keys: list[str] | None = None,
    *,
    event_ts: str = "event_timestamp",
    feature_ts: str = "feature_timestamp",
    ttl: timedelta | None = None,
    feature_cols: list[str] | None = None,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """As-of join via a single merge-sort pass — the SURVEY §7 alternative
    physical strategy, semantically identical to :func:`point_in_time_join`.

    Union spine points and feature rows, sort once per entity by
    (timestamp, spine-last, tie_break), carry the latest feature forward
    with ``last(ignoreNulls)``, keep spine rows, apply TTL after the fact.

    When to choose which: the join+max_by formulation wins when the spine
    is small/broadcastable (no sort of the feature log); this one wins
    when spine and features are both huge and co-sorted work beats the
    range-join fan-out — cost is one shuffle+sort of (spine UNION
    features), independent of how many feature rows fall inside each
    spine row's TTL window (the join formulation materializes every
    in-window candidate before aggregating them away)."""
    from pyspark.sql import Window

    keys = keys or ["entity_id"]
    if feature_cols is None:
        feature_cols = [c for c in features.columns if c not in set(keys)]
    if feature_ts not in feature_cols:
        feature_cols = [*feature_cols, feature_ts]
    tie_break = tie_break or []

    payload = F.struct(
        *[F.col(c).alias(c) for c in dict.fromkeys([feature_ts, *tie_break, *feature_cols])]
    )
    f_rows = features.select(
        *keys,
        F.col(feature_ts).alias("__t"),
        F.lit(0).alias("__is_spine"),
        payload.alias("__p"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(f"__s_{c}")
          for c in spine.columns if c not in keys],
    )
    s_rows = spine.select(
        *keys,
        F.col(event_ts).alias("__t"),
        F.lit(1).alias("__is_spine"),
        F.lit(None).cast(f_rows.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__s_{c}") for c in spine.columns if c not in keys],
    )
    merged = f_rows.unionByName(s_rows)

    # feature rows sort before the spine point at the same timestamp
    # (feature_ts <= event_ts is inclusive); among same-ts features the
    # tie_break order makes the LAST one the deterministic winner.
    order = [F.col("__t"), F.col("__is_spine"), *[F.col(f"__p.{c}") for c in tie_break]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__last", F.last("__p", ignorenulls=True).over(w))

    out = carried.where(F.col("__is_spine") == 1)
    best_ts = F.col(f"__last.{feature_ts}")
    valid = best_ts.isNotNull()
    if ttl is not None:
        valid = valid & (
            best_ts >= F.col("__t") - F.expr(f"INTERVAL {int(ttl.total_seconds())} SECONDS")
        )
    return out.select(
        *keys,
        F.col("__t").alias(event_ts),
        *[F.col(f"__s_{c}").alias(c) for c in spine.columns if c not in [*keys, event_ts]],
        *[F.when(valid, F.col(f"__last.{c}")).alias(c) for c in feature_cols],
    )
