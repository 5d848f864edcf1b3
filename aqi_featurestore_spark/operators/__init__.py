"""Engine operators — compositions of DataFrame primitives.

Each operator here is something the reference delegates to an external
system (Feast/BigQuery/Redis) or to pandas, re-expressed as pure Spark
plans so Catalyst/AQE owns the physical strategy.
"""

from aqi_featurestore_spark.operators.pit_join import point_in_time_join
from aqi_featurestore_spark.operators.snapshot import (
    latest_per_key,
    online_lookup,
    upsert_snapshot,
)
from aqi_featurestore_spark.operators.dedup import (
    append_if_absent,
    dedup_exact,
    drop_duplicate_features,
)
from aqi_featurestore_spark.operators.lag import add_lag_features

__all__ = [
    "point_in_time_join",
    "latest_per_key",
    "online_lookup",
    "upsert_snapshot",
    "append_if_absent",
    "dedup_exact",
    "drop_duplicate_features",
    "add_lag_features",
]
