"""Offline feature store: append-only, Hive-partitioned, dedup-gated,
watermark-incremental.

Reference behavior being rebuilt (SURVEY.md §2.1/§2.9):
- S4: typed Parquet write partitioned ``year=/month=/day=``
  (airflow/dags/load.py:151-182) -> ``df.write.partitionBy(...)``.
- S6/P2: partition discovery by regex + date >= watermark
  (spark/code/write_to_bigquery.py:43-55) -> one ``spark.read.parquet``
  with a partition-column predicate; Catalyst prunes directories, so the
  100 TB store only lists/reads matching partitions.
- S16/ST2: watermark checkpoint in a text file, read-with-default and
  advance-after-commit (write_to_bigquery.py:36-38,123-127).
- ST6 fix: the reference double-appends on re-run; ``append`` here gates
  with a left-anti join on (entity, feature_timestamp) against only the
  partitions the new batch touches (not the whole store).

At cluster scale the same code runs against object-store paths; local
tests point it at a tmp dir.
"""

from __future__ import annotations

import json
import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aqi_featurestore_spark.sources import fs


class OfflineStore:
    """Append-only partitioned Parquet feature table with incremental
    semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keys: list[str] | None = None,
        ts: str = "feature_timestamp",
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = keys or ["entity_id"]
        self.ts = ts

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        # Hadoop FileSystem probe, not os.path: on s3a://gs:// paths a
        # local-FS check answers False and would silently skip the
        # anti-join dedup gate (reintroducing the ST6 double-append bug).
        return any(
            n.startswith("year=") for n in fs.child_names(self.spark, self.path)
        )

    def read(self, since: date | None = None) -> DataFrame:
        """Full-history read; ``since`` applies a partition-pruned date
        predicate (the reference's manual folder regex, done by Catalyst)."""
        df = self.spark.read.parquet(self.path)
        if since is not None:
            df = df.where(
                F.make_date("year", "month", "day") >= F.lit(since.isoformat()).cast("date")
            )
        return df

    # -- write --------------------------------------------------------------

    def _with_partition_cols(self, df: DataFrame) -> DataFrame:
        d = F.to_date(self.ts)
        missing = {c for c in ("year", "month", "day")} - set(df.columns)
        cols = {}
        if "year" in missing:
            cols["year"] = F.year(d)
        if "month" in missing:
            cols["month"] = F.month(d)
        if "day" in missing:
            cols["day"] = F.dayofmonth(d)
        return df.withColumns(cols) if cols else df

    def append(self, batch: DataFrame, *, dedup: bool = True) -> None:
        """Append feature rows; with ``dedup`` (default) drops rows whose
        (keys, ts) already exist — making re-runs idempotent. The existing
        side is pruned to the date range of the incoming batch, so the
        anti-join never scans the whole store."""
        batch = self._with_partition_cols(batch)
        batch = batch.dropDuplicates([*self.keys, self.ts])
        if dedup and self.exists():
            lo, hi = (
                batch.agg(
                    F.min(F.make_date("year", "month", "day")),
                    F.max(F.make_date("year", "month", "day")),
                ).first()
            )
            existing = self.read().where(
                F.make_date("year", "month", "day").between(F.lit(lo), F.lit(hi))
            )
            batch = batch.join(
                existing.select(*self.keys, self.ts).dropDuplicates(),
                on=[*self.keys, self.ts],
                how="left_anti",
            )
        (
            batch.write.partitionBy("year", "month", "day")
            .mode("append")
            .parquet(self.path)
        )


class Watermark:
    """Scalar checkpoint protocol (S16): read-with-default, advance after a
    successful batch. JSON file beside the store; uses local `os` APIs on
    purpose (atomic `os.replace`), so the path must be driver-local or
    shared-POSIX — on object-store deployments replace it with a
    Structured Streaming checkpoint (see streaming/jobs.py), which is the
    engine's native incremental protocol."""

    def __init__(self, path: str, *, default: str) -> None:
        self.path = path
        self.default = default

    def read(self) -> str:
        if not os.path.exists(self.path):
            return self.default
        with open(self.path) as f:
            return json.load(f)["watermark"]

    def advance(self, value: str) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": value}, f)
        os.replace(tmp, self.path)  # atomic commit, crash-safe
