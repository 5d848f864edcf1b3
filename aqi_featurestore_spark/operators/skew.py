"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins
whose *partitions* are skewed. Two hot-key shapes still need explicit
salting at 100 TB:

- **latest-per-key over a hot entity** — one entity owning 10% of a
  100 TB history funnels through one reducer. Two-phase: pre-aggregate
  per (key, salt) so the map side combines within each salt bucket, then
  reduce the ``salt_buckets`` partial winners per key. Result is
  identical to the unsalted aggregate for any associative winner
  function (max_by over a total order is).
- **equi-join with a hot key on the fact side** — replicate the small
  side ``salt_buckets`` times, salt the fact side deterministically, join
  on (key, salt). Row-for-row identical output to the plain join.

Salts derive from xxhash64 of stable row attributes — deterministic
across runs/executors, no RNG in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.snapshot import _ordering


def salted_latest_per_key(
    df: DataFrame,
    keys: list[str] | None = None,
    *,
    ts: str = "feature_timestamp",
    tie_break: list[str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Latest row per key via two-phase salted max_by.

    Semantically identical to ``snapshot.latest_per_key`` (max over a
    total order is associative); physically, phase 1 spreads each hot key
    over ``salt_buckets`` reducers, phase 2 reduces only
    ``salt_buckets`` rows per key."""
    keys = keys or ["entity_id"]
    tie_break = tie_break or []
    payload_cols = [c for c in df.columns if c not in set(keys)]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    order = _ordering(ts, tie_break)

    salt = F.pmod(F.xxhash64(ts, *tie_break), F.lit(salt_buckets)).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.max_by(payload, order).alias("__w"))
        .select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])
    )
    return (
        partial.groupBy(*keys)
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload_cols]), order).alias("__w"))
        .select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])
    )


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    *,
    how: str = "inner",
    salt_buckets: int = 8,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``fact`` has hot keys that overwhelm single
    reducers: fact rows get a deterministic salt in [0, salt_buckets),
    ``dim`` is replicated once per salt value, and the join key becomes
    (keys..., salt). Output equals ``fact.join(dim, keys, how)`` for the
    fact-preserving join types (inner / left / left_semi / left_anti);
    right and full-outer are rejected because each unmatched dim row
    would surface once per salt bucket instead of once.

    Use when the dim side is too big to broadcast but small enough to
    replicate ``salt_buckets`` times; otherwise prefer broadcast or AQE.
    ``salt_on`` names fact columns to derive the salt from (default: all
    non-key columns — stable, spreads rows that differ anywhere)."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join supports fact-preserving joins {sorted(allowed)}, "
            f"got {how!r}: replicated-dim salting would emit unmatched dim rows "
            f"{salt_buckets}x for right/full outer joins"
        )
    salt_cols = salt_on or [c for c in fact.columns if c not in set(keys)]
    if not salt_cols:
        salt_cols = keys  # degenerate: constant salt, still correct
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt_buckets)]))
    )
    out = salted_fact.join(replicated_dim, [*keys, "__salt"], how)
    return out.drop("__salt")


def skew_profile(df: DataFrame, keys: list[str], *, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — the thing to run before choosing broadcast / AQE / salting."""
    total = df.count()
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    return (
        counts.withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
