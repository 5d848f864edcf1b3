"""Source connectors: schema-declared reads, partitioned writes, watermarks,
bucketed tables, distributed REST ingest."""

from aqi_featurestore_spark.sources.bucketed import read_bucketed, write_bucketed
from aqi_featurestore_spark.sources.ingest import (
    RAW_RECORD,
    fetch_grid,
    grid_cells,
    read_ndjson,
    read_raw_json,
)
from aqi_featurestore_spark.sources.offline_store import OfflineStore, Watermark
from aqi_featurestore_spark.sources.testdata import read_table, register_views

__all__ = [
    "OfflineStore",
    "RAW_RECORD",
    "Watermark",
    "fetch_grid",
    "grid_cells",
    "read_bucketed",
    "read_ndjson",
    "read_raw_json",
    "read_table",
    "register_views",
    "write_bucketed",
]
