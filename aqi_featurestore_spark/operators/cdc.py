"""Snapshot diff — CDC-style change detection between two table versions.

The reference refreshes its offline store by appending whole new
snapshots (airflow/dags/*: each run re-lands the day's rows); the
natural large-scale generalization is computing the DELTA between two
snapshots — what a lakehouse merge (Delta/Iceberg MERGE INTO) or a
downstream incremental consumer actually needs. This operator derives
added / removed / changed rows from full snapshots with one
fingerprint projection per side and one co-partitioned full-outer
join; row bodies never move — only (key, fingerprint).

At 100 TB: both sides shuffle once on the key (or zero times if the
snapshots are bucketed by key — see ``sources/bucketed.py``), the
join output is streamed into the status projection, and emitting only
the non-``unchanged`` rows keeps the result proportional to the
actual churn, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    fingerprint: Column | str,
    include_unchanged: bool = False,
) -> DataFrame:
    """Delta between two snapshots keyed by ``key_cols``.

    ``fingerprint`` is a column (or column name) computed on EACH side
    identifying row content — typically ``F.md5(F.concat_ws(...))``
    over the value columns. Returns ``key_cols + (old_fp, new_fp,
    status)`` where status ∈ added | removed | changed (| unchanged
    when ``include_unchanged``).

    Keys must be unique per side (snapshot semantics); duplicate keys
    would fan out in the join exactly as they would in a MERGE.
    """
    fp = F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint
    o = old.select(*key_cols, fp.alias("old_fp"))
    n = new.select(*key_cols, fp.alias("new_fp"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("new_fp").isNull(), F.lit(STATUS_REMOVED))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit(STATUS_CHANGED))
        .otherwise(F.lit(STATUS_UNCHANGED))
    )
    out = joined.select(*key_cols, "old_fp", "new_fp", status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != STATUS_UNCHANGED)
    return out
