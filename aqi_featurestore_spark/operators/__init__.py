"""Engine operators — compositions of DataFrame primitives.

Each operator here is something the reference delegates to an external
system (Feast/BigQuery/Redis) or to pandas, re-expressed as pure Spark
plans so Catalyst/AQE owns the physical strategy — plus the
LLM-data-pipeline extensions (near-dedup, similarity search, multimodal,
splitting, skew tooling) the reference lacks entirely.
"""

from aqi_featurestore_spark.operators.cdc import snapshot_diff
from aqi_featurestore_spark.operators.dedup import (
    append_if_absent,
    dedup_exact,
    drop_duplicate_features,
)
from aqi_featurestore_spark.operators.dedup_groups import (
    connected_components,
    resolve_duplicates,
)
from aqi_featurestore_spark.operators.lag import add_lag_features
from aqi_featurestore_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)
from aqi_featurestore_spark.operators.near_dedup import (
    exact_jaccard_for_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from aqi_featurestore_spark.operators.pit_join import (
    point_in_time_join,
    point_in_time_join_sorted,
)
from aqi_featurestore_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_cosine_pairs,
    hyperplane_sketch,
)
from aqi_featurestore_spark.operators.approx import (
    distinct_count_profile,
    quantile_profile,
)
from aqi_featurestore_spark.operators.range_join import (
    range_join,
    range_join_time,
)
from aqi_featurestore_spark.operators.skew import (
    salted_equi_join,
    salted_latest_per_key,
    skew_profile,
)
from aqi_featurestore_spark.operators.snapshot import (
    latest_per_key,
    online_lookup,
    upsert_snapshot,
)
from aqi_featurestore_spark.operators.split import hash_split, with_split_label

__all__ = [
    "add_lag_features",
    "append_if_absent",
    "connected_components",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "dedup_exact",
    "distinct_count_profile",
    "drop_duplicate_features",
    "embedding_cosine_pairs",
    "exact_jaccard_for_pairs",
    "extract_media_features",
    "frame_sample_plan",
    "hash_split",
    "hyperplane_sketch",
    "latest_per_key",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "minhash_verified_pairs",
    "ngram_jaccard_pairs",
    "online_lookup",
    "point_in_time_join",
    "point_in_time_join_sorted",
    "quantile_profile",
    "range_join",
    "range_join_time",
    "resolve_duplicates",
    "snapshot_diff",
    "salted_equi_join",
    "salted_latest_per_key",
    "simhash",
    "simhash_near_dup_pairs",
    "skew_profile",
    "upsert_snapshot",
    "with_split_label",
]
