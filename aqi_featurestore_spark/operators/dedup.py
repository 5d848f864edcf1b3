"""Deduplication operators.

Reference parity: the lineage insert gate — "insert only if no row with
this (feature_name, version) exists" (airflow/dags/load.py:71-102, P6/J3)
— and the missing re-run dedup on the append-only offline store (ST6).

Extensions (BASELINE.json north star): exact dedup over the ``documents``
table; approximate dedup (MinHash-LSH / SimHash / n-gram Jaccard) lives in
``operators/near_dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_if_absent(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """The P6 existence gate as a left-anti join: rows of ``new`` whose key
    is not present in ``existing``. The reference runs one COUNT(*) probe
    per row (load.py:71-81); the anti-join does all rows in one shuffle
    (or broadcast, when ``existing``'s keys are small — AQE decides).
    """
    return new.join(existing.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")


def drop_duplicate_features(
    df: DataFrame, keys: list[str] | None = None, *, ts: str = "feature_timestamp"
) -> DataFrame:
    """Fix for ST6 (re-run double-append): exact dedup of the offline store
    on (entity, feature_timestamp). ``dropDuplicates`` = hash-agg keep-first;
    content is identical across duplicates so keep-any is correct."""
    keys = keys or ["entity_id"]
    return df.dropDuplicates([*keys, ts])


def dedup_exact(
    df: DataFrame,
    content_cols: list[str],
    *,
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Exact content dedup: one surviving row per distinct content, the
    survivor chosen deterministically as the min (or max) ``id_col``.

    Implemented as hash aggregation on the content columns (map-side
    partial combine). At 100 TB, group on ``xxhash64(content)`` first so
    the shuffle moves 8-byte keys, not document bodies — see
    ``dedup_exact_by_hash``.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    survivors = df.groupBy(*content_cols).agg(agg.alias(id_col)).select(id_col)
    return df.join(survivors, on=id_col, how="left_semi")


def dedup_exact_by_hash(
    df: DataFrame,
    content_cols: list[str],
    *,
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Scale path for exact dedup: shuffle a 64-bit content hash instead of
    the content itself. Hash collisions (~2^-64) trade a false-dedup for a
    shuffle that is orders of magnitude smaller on document-sized rows."""
    h = F.xxhash64(*content_cols)
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    survivors = df.groupBy(h.alias("__h")).agg(agg.alias(id_col)).select(id_col)
    return df.join(survivors, on=id_col, how="left_semi")
