"""Named query plans + their DuckDB oracle SQL (the correctness contract)."""

from aqi_featurestore_spark.plans.queries import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
