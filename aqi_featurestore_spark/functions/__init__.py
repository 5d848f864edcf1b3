"""Scalar feature functions — all native Catalyst expressions.

The reference computes these with row-at-a-time Python UDFs / pandas apply
(SURVEY.md §2.10); here every function returns a ``Column`` built from
``pyspark.sql.functions`` so the whole feature-derivation stage stays inside
whole-stage codegen with zero Python-worker boundary.
"""

from aqi_featurestore_spark.functions.aqi import (
    AQI_BREAKPOINTS,
    aqi_from_pm25,
    aqi_level_label,
)
from aqi_featurestore_spark.functions.layout import (
    zorder_key2,
    zorder_layout,
)
from aqi_featurestore_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count,
    word_shingles,
)
from aqi_featurestore_spark.functions.time_features import (
    entity_key,
    next_hour_features,
    reconstructed_datetime,
    time_feature_columns,
)

__all__ = [
    "AQI_BREAKPOINTS",
    "aqi_from_pm25",
    "aqi_level_label",
    "doc_fingerprint",
    "entity_key",
    "lang_id",
    "next_hour_features",
    "quality_features",
    "reconstructed_datetime",
    "time_feature_columns",
    "token_count",
    "word_shingles",
    "zorder_key2",
    "zorder_layout",
]
