"""Source connectors: schema-declared reads, partitioned writes, watermarks."""

from aqi_featurestore_spark.sources.testdata import read_table

__all__ = ["read_table"]
