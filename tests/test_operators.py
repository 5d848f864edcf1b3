"""Unit tests for the core operators: PIT join edge cases (SURVEY.md §7
build-plan step 4), snapshot upsert/lookup, dedup gate, lag windows."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.dedup import (
    append_if_absent,
    dedup_exact,
    dedup_exact_by_hash,
    drop_duplicate_features,
)
from aqi_featurestore_spark.operators.lag import add_lag_features
from aqi_featurestore_spark.operators.pit_join import point_in_time_join
from aqi_featurestore_spark.operators.snapshot import (
    latest_per_key,
    online_lookup,
    upsert_snapshot,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _features(spark):
    rows = [
        ("a", ts("2024-01-10 00:00:00"), 1.0, 1),
        ("a", ts("2024-01-12 00:00:00"), 2.0, 2),
        ("a", ts("2024-01-12 00:00:00"), 2.5, 3),  # duplicate ts (ST6) — tie
        ("a", ts("2024-01-20 00:00:00"), 3.0, 4),
        ("b", ts("2024-01-01 00:00:00"), 9.0, 5),
    ]
    return spark.createDataFrame(
        rows, "entity_id string, feature_timestamp timestamp, aqi double, event_id int"
    )


def _spine(spark):
    rows = [
        ("a", ts("2024-01-12 00:00:00")),  # exactly at a feature ts
        ("a", ts("2024-01-15 00:00:00")),  # between rows -> as-of 01-12
        ("a", ts("2024-01-09 00:00:00")),  # before any row -> NULL
        ("b", ts("2024-01-20 00:00:00")),  # last row older than TTL -> NULL
        ("c", ts("2024-01-15 00:00:00")),  # unknown entity -> NULL
    ]
    return spark.createDataFrame(rows, "entity_id string, event_timestamp timestamp")


def test_pit_join_semantics(spark):
    out = point_in_time_join(
        _spine(spark),
        _features(spark),
        ["entity_id"],
        ttl=timedelta(days=7),
        feature_cols=["aqi"],
        tie_break=["event_id"],
    )
    got = {(r["entity_id"], r["event_timestamp"].isoformat()): r["aqi"] for r in out.collect()}
    assert out.count() == 5  # left semantics: one row per spine row
    assert got[("a", "2024-01-12T00:00:00")] == 2.5  # tie -> highest event_id
    assert got[("a", "2024-01-15T00:00:00")] == 2.5
    assert got[("a", "2024-01-09T00:00:00")] is None  # no history yet
    assert got[("b", "2024-01-20T00:00:00")] is None  # TTL-expired
    assert got[("c", "2024-01-15T00:00:00")] is None  # unknown entity


def test_pit_join_preserves_spine_duplicates(spark):
    spine = spark.createDataFrame(
        [("a", ts("2024-01-15 00:00:00"))] * 3,
        "entity_id string, event_timestamp timestamp",
    )
    out = point_in_time_join(
        spine, _features(spark), ["entity_id"], feature_cols=["aqi"], tie_break=["event_id"]
    )
    assert out.count() == 3


def test_pit_join_no_ttl_looks_back_forever(spark):
    out = point_in_time_join(
        _spine(spark), _features(spark), ["entity_id"], feature_cols=["aqi"],
        tie_break=["event_id"],
    )
    got = {(r["entity_id"], r["event_timestamp"].isoformat()): r["aqi"] for r in out.collect()}
    assert got[("b", "2024-01-20T00:00:00")] == 9.0


def test_latest_per_key_and_upsert(spark):
    feat = _features(spark)
    snap = latest_per_key(feat, ["entity_id"], tie_break=["event_id"])
    got = {r["entity_id"]: r["aqi"] for r in snap.collect()}
    assert got == {"a": 3.0, "b": 9.0}

    updates = spark.createDataFrame(
        [
            ("b", ts("2024-01-25 00:00:00"), 1.5, 10),  # newer -> wins
            ("a", ts("2024-01-20 00:00:00"), 7.0, 11),  # equal ts -> update wins
            ("d", ts("2024-01-02 00:00:00"), 4.0, 12),  # new key -> inserted
        ],
        "entity_id string, feature_timestamp timestamp, aqi double, event_id int",
    )
    up = upsert_snapshot(snap, updates, ["entity_id"])
    got = {r["entity_id"]: r["aqi"] for r in up.collect()}
    assert got == {"a": 7.0, "b": 1.5, "d": 4.0}


def test_online_lookup_ttl_and_missing(spark):
    snap = latest_per_key(_features(spark), ["entity_id"], tie_break=["event_id"])
    req = spark.createDataFrame([("a",), ("b",), ("zz",)], "entity_id string")
    out = online_lookup(
        req, snap, ["entity_id"], ttl=timedelta(days=7),
        as_of=F.lit("2024-01-21 00:00:00").cast("timestamp"),
    )
    got = {r["entity_id"]: r["aqi"] for r in out.collect()}
    assert got["a"] == 3.0
    assert got["b"] is None  # 01-01 row expired at as_of 01-21
    assert got["zz"] is None  # unknown key


def test_dedup_gate_and_duplicates(spark):
    new = spark.createDataFrame([("f1", "v1"), ("f2", "v1")], "feature_name string, version string")
    existing = spark.createDataFrame([("f1", "v1")], "feature_name string, version string")
    out = append_if_absent(new, existing, ["feature_name", "version"])
    assert [r["feature_name"] for r in out.collect()] == ["f2"]

    feat = _features(spark)
    doubled = feat.unionByName(feat)
    assert drop_duplicate_features(doubled, ["entity_id"]).count() == 4  # 4 distinct (e, ts)


def test_dedup_exact_variants(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    for fn in (dedup_exact, dedup_exact_by_hash):
        out = fn(docs, ["text"], id_col="doc_id")
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_lag_features(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "entity_id string, seq int, v double",
    )
    out = add_lag_features(
        df, {"v": "prev_v"}, partition_by=["entity_id"], order_by=["seq"]
    )
    got = {(r["entity_id"], r["seq"]): r["prev_v"] for r in out.collect()}
    assert got == {("a", 1): None, ("a", 2): 10.0, ("b", 1): None}
    assert (
        add_lag_features(
            df, {"v": "prev_v"}, partition_by=["entity_id"], order_by=["seq"],
            drop_incomplete=True,
        ).count()
        == 1
    )


def test_hash_split_stability_and_group_safety(spark):
    from aqi_featurestore_spark.operators.split import hash_split, with_split_label

    df = spark.range(10_000).select(
        F.col("id").alias("row_id"), (F.col("id") % 500).alias("entity_id")
    )
    train, test = hash_split(df, "entity_id", train_fraction=0.8)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 10_000
    assert 0.7 < n_train / 10_000 < 0.9  # ~binomial(500, .8) of entities
    # leakage safety: every entity entirely on one side
    sides = with_split_label(df, "entity_id").groupBy("entity_id").agg(
        F.count_distinct("split").alias("n")
    )
    assert sides.where(F.col("n") > 1).count() == 0
    # rerun-stable
    train2, _ = hash_split(df, "entity_id", train_fraction=0.8)
    assert train2.count() == n_train


def test_resolve_entity_by_name(spark):
    from aqi_featurestore_spark.operators.snapshot import resolve_entity

    dim = spark.createDataFrame(
        [("Hanoi", "21.0_105.75"), ("Haiphong", "20.75_106.75"),
         ("Thai Binh", "20.5_106.25")],
        "name string, entity_id string",
    )
    reqs = spark.createDataFrame(
        [(1, "what is the air quality in hanoi today"),
         (2, "AQI for HAIPHONG please"),
         (3, "weather on the moon")],
        "req_id int, query_text string",
    )
    out = {r["req_id"]: r["entity_id"] for r in resolve_entity(reqs, dim).collect()}
    assert out[1] == "21.0_105.75"
    assert out[2] == "20.75_106.75"
    assert out[3] is None  # refusal path: unknown location -> NULL


def test_column_profile_hand_computed(spark):
    from aqi_featurestore_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "x long, s string",
    )
    got = {r["column_name"]: r for r in column_profile(df).collect()}
    assert got["x"]["n_rows"] == 4 and got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 3
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
