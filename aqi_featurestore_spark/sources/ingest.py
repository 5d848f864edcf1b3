"""Raw-data ingest connectors (SURVEY.md §2.1 S1/S2/S3/S8).

The reference's extract step sweeps a lat/lon grid against a REST history
API with watermark + retry (airflow/dags/extract.py:17-19,44-112) and
parses the resulting JSON with a hand-rolled 25k-row batching loop
(airflow/dags/load.py:119,184-197). Spark-first rebuild:

- **Grid sweep** is data, not driver code: the cell list is a DataFrame,
  and the per-cell fetch runs *distributed* via ``mapInPandas`` — at 459
  cells it's one task wave; at 100k cells it scales linearly with
  executors. The HTTP call is injected (``fetcher``) so the connector is
  testable offline and rate-limit/retry policy stays in one place.
- **JSON / NDJSON load** is ``spark.read.json`` with an explicit schema —
  distributed parse, no manual batching, malformed rows quarantined in
  ``_corrupt_record`` instead of crashing the sweep (PERMISSIVE mode).

No live-network defaults: callers must pass a ``fetcher``; this engine
never embeds service endpoints or credentials.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw pollution record (reference airflow/dags/extract.py:75-88).
RAW_RECORD = StructType(
    [
        StructField("dt", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("aqi_level", LongType()),
        StructField("co", DoubleType()),
        StructField("no", DoubleType()),
        StructField("no2", DoubleType()),
        StructField("o3", DoubleType()),
        StructField("so2", DoubleType()),
        StructField("pm2_5", DoubleType()),
        StructField("pm10", DoubleType()),
        StructField("nh3", DoubleType()),
    ]
)

# fetcher(lat, lon, start, end) -> list of raw-record dicts
Fetcher = Callable[[float, float, int, int], list[dict[str, Any]]]


def grid_cells(
    spark: SparkSession,
    *,
    lat_min: float = 19.5,
    lat_max: float = 23.5,
    lon_min: float = 102.0,
    lon_max: float = 108.5,
    step: float = 0.25,
) -> DataFrame:
    """The sweep grid as a DataFrame (defaults = the reference's northern-
    Vietnam grid, extract.py:17-19). Integer-stepped to avoid float-accum
    drift in cell coordinates."""
    n_lat = int(round((lat_max - lat_min) / step)) + 1
    n_lon = int(round((lon_max - lon_min) / step)) + 1
    lats = spark.range(n_lat).select((F.lit(lat_min) + F.col("id") * step).alias("lat"))
    lons = spark.range(n_lon).select((F.lit(lon_min) + F.col("id") * step).alias("lon"))
    return lats.crossJoin(lons)


def fetch_grid(
    cells: DataFrame,
    fetcher: Fetcher,
    *,
    start: int,
    end: int,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed REST sweep (S1): one ``fetcher`` call per grid cell,
    executed on executors via mapInPandas. Retry/backoff (S2, the
    reference's HTTP-429 sleep loop) belongs inside ``fetcher`` — it is
    I/O policy, not engine semantics.

    ``partitions`` spreads the cells so slow endpoints don't serialize the
    sweep; default leaves the input partitioning alone."""
    if partitions:
        cells = cells.repartition(partitions)
    fields = [f.name for f in RAW_RECORD.fields]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for lat, lon in zip(pdf["lat"], pdf["lon"]):
                for rec in fetcher(float(lat), float(lon), start, end):
                    rows.append({k: rec.get(k) for k in fields})
            yield pd.DataFrame(rows, columns=fields)

    return cells.mapInPandas(fetch, schema=RAW_RECORD)


def read_raw_json(
    spark: SparkSession, path: str, *, multiline: bool = True
) -> DataFrame:
    """S3: the extract step's JSON array file, parsed distributed with the
    explicit record schema (replaces the ijson 25k-row batching loop).
    Malformed records land in ``_corrupt_record``."""
    schema = StructType(
        [*RAW_RECORD.fields, StructField("_corrupt_record", StringType())]
    )
    return spark.read.json(path, schema=schema, multiLine=multiline, mode="PERMISSIVE")


def read_ndjson(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S8: newline-delimited JSON (the reference's lineage load uses
    BigQuery autodetect; schema inference is the analogue, an explicit
    schema the recommended path)."""
    if schema is None:
        return spark.read.json(path)
    return spark.read.json(path, schema=schema)
