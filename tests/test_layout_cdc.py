"""Tests for the Z-order layout key and the CDC snapshot diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.layout import zorder_key2, zorder_layout
from aqi_featurestore_spark.operators.cdc import snapshot_diff


def _py_zorder(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key2("x", "y").alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_zorder(x, y)


def test_zorder_locality_beats_single_column_sort(spark):
    # A 2x2 (x, y) tile maps to a contiguous range of 4 z-values —
    # the property min/max file stats rely on.
    assert sorted(
        _py_zorder(x, y) for x in (4, 5) for y in (6, 7)
    ) == list(range(_py_zorder(4, 6), _py_zorder(4, 6) + 4))


def test_zorder_layout_partitions_are_z_ranges(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
    )
    parts = (
        zorder_layout(df, "x", "y", bits=6, num_partitions=8)
        .select(zorder_key2("x", "y", bits=6).alias("z"))
        .rdd.glom()
        .map(lambda rows: [r.z for r in rows])
        .collect()
    )
    spans = sorted((min(p), max(p)) for p in parts if p)
    assert len(spans) > 1
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo  # ranges are disjoint and ordered


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, payload string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "id int, payload string"
    )
    out = {
        r.id: r.status
        for r in snapshot_diff(
            old, new, key_cols=["id"], fingerprint=F.md5("payload")
        ).collect()
    }
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id int, payload string")
    new = spark.createDataFrame([(1, "a"), (2, "x")], "id int, payload string")
    out = snapshot_diff(
        old, new, key_cols=["id"], fingerprint=F.md5("payload"),
        include_unchanged=True,
    )
    assert {(r.id, r.status) for r in out.collect()} == {
        (1, "unchanged"),
        (2, "changed"),
    }
