"""Online-store semantics as pure DataFrame plans (A1, J2, S13, S15).

The reference's online store is Redis: hash upsert keyed ``aqi:{lat}:{lon}``
(airflow/dags/load.py:141, redis_data.py:93) — i.e. *latest value per
entity* — and ``get_online_features`` is a key lookup
(model/aqi_predict_hn.py:81-89, agent/aqi-agent/app/agent.py:73-76) with
the feature view's 7-day TTL enforced at read.

Here the online store is a compact "snapshot" DataFrame = one row per
entity key. At scale this is the right shape: the snapshot is bounded by
entity cardinality (not history length), persists as a small Parquet
table, and lookups broadcast it.

``latest_per_key`` uses ``max_by`` (hash agg, map-side partial combine)
rather than window+row_number — no full sort of the 100 TB history, and
AQE splits skewed entities.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordering(ts: str, tie_break: list[str]) -> Column:
    return F.struct(F.col(ts), *[F.col(c) for c in tie_break if c != ts])


def latest_per_key(
    df: DataFrame,
    keys: list[str] | None = None,
    *,
    ts: str = "feature_timestamp",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Most recent row per entity key (Redis-overwrite semantics).

    Ties on ``ts`` break deterministically by ``tie_break`` columns
    (append-only stores can hold duplicates, SURVEY §2.9 ST6).
    """
    keys = keys or ["entity_id"]
    tie_break = tie_break or []
    payload_cols = [c for c in df.columns if c not in set(keys)]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    return (
        df.groupBy(*keys)
        .agg(F.max_by(payload, _ordering(ts, tie_break)).alias("__latest"))
        .select(*keys, *[F.col(f"__latest.{c}").alias(c) for c in payload_cols])
    )


def upsert_snapshot(
    snapshot: DataFrame,
    updates: DataFrame,
    keys: list[str] | None = None,
    *,
    ts: str = "feature_timestamp",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """``write_to_online_store`` semantics (redis_data.py:93): new rows win
    per key. Implemented as union + latest_per_key; updates beat existing
    rows with equal ``ts`` (upsert overwrite) via a precedence column.
    """
    keys = keys or ["entity_id"]
    tagged = snapshot.withColumn("__prec", F.lit(0)).unionByName(
        updates.withColumn("__prec", F.lit(1))
    )
    out = latest_per_key(tagged, keys, ts=ts, tie_break=[*(tie_break or []), "__prec"])
    return out.drop("__prec")


def online_lookup(
    entity_rows: DataFrame,
    snapshot: DataFrame,
    keys: list[str] | None = None,
    *,
    ts: str = "feature_timestamp",
    ttl: timedelta | None = None,
    as_of: Column | None = None,
) -> DataFrame:
    """``get_online_features``: left join of the request keys against the
    snapshot; unknown keys yield NULL features (agent.py:78 null guard);
    rows older than ``ttl`` relative to ``as_of`` are masked to NULL.

    The snapshot side is broadcast — it is bounded by entity cardinality
    and this is a serving-path lookup.
    """
    keys = keys or ["entity_id"]
    feature_cols = [c for c in snapshot.columns if c not in set(keys)]
    out = entity_rows.join(F.broadcast(snapshot), on=keys, how="left")
    if ttl is not None:
        if as_of is None:
            as_of = F.current_timestamp()
        expired = F.col(ts) < (as_of - F.expr(f"INTERVAL {int(ttl.total_seconds())} SECONDS"))
        out = out.select(
            *entity_rows.columns,
            *[F.when(~expired, F.col(c)).alias(c) for c in feature_cols],
        )
    return out


def resolve_entity(
    requests: DataFrame,
    dimension: DataFrame,
    *,
    text_col: str = "query_text",
    name_col: str = "name",
    key_col: str = "entity_id",
) -> DataFrame:
    """P8/F15: free-text request -> entity key via case-insensitive
    containment against a (name, entity_id) dimension table (the
    reference's city-substring dict, agent.py:29-33,56-58, as a broadcast
    join). Unmatched requests keep NULL keys — the refusal path.

    Exactly ONE output row per request row: when a request mentions
    several dimension names, the longest match wins (ties break on the
    smallest key) — a deterministic version of the reference's
    first-match dict loop, which depends on dict insertion order."""
    from pyspark.sql import Window

    dim = F.broadcast(
        dimension.select(
            F.lower(F.col(name_col)).alias("__name"), F.col(key_col)
        )
    )
    tagged = requests.withColumn("__req", F.monotonically_increasing_id())
    cond = F.contains(F.lower(tagged[text_col]), F.col("__name"))
    w = Window.partitionBy("__req").orderBy(
        F.length("__name").desc_nulls_last(), F.col(key_col).asc()
    )
    return (
        tagged.join(dim, cond, "left")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__name", "__req", "__rn")
    )
