"""Physical z-order skipping: the zone_map_zorder_audit claim checked
against REAL parquet footers. Write the same rows twice — date-sorted
(the incumbent layout) and Morton-range-partitioned
(functions/layout.py zorder_layout) — then read each data file's
min/max column statistics with pyarrow and evaluate the two audit
predicates exactly the way a scan planner would. The z-ordered layout
must make the price predicate file-skippable without destroying date
skipping, and skipping must be one-sided (a skipped file provably
contains no hit)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.layout import zorder_key2
from aqi_featurestore_spark.sources.testdata import read_table

SF_DIR = "/root/testdata/sf0.01"
TCUT = "2000-01-01"
PCUT = 100000.0
N_FILES = 24


def _file_stats(path: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        mins: dict = {}
        maxs: dict = {}
        n = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            n += g.num_rows
            for name, i in cols.items():
                st = g.column(i).statistics
                assert st is not None and st.has_min_max
                mins[name] = (
                    st.min if name not in mins else min(mins[name], st.min)
                )
                maxs[name] = (
                    st.max if name not in maxs else max(maxs[name], st.max)
                )
        out.append({"n": n, "min": mins, "max": maxs, "file": f})
    return out


def _skip_report(stats: list[dict], spark_df) -> dict:
    import datetime

    tcut = datetime.datetime.fromisoformat(TCUT)
    total = sum(s["n"] for s in stats)
    skipped_t = [s for s in stats if s["max"]["l_shipdate"] < tcut]
    skipped_p = [s for s in stats if s["max"]["l_extendedprice"] < PCUT]
    return {
        "files": len(stats),
        "rows": total,
        "t_files": len(skipped_t),
        "t_rows": sum(s["n"] for s in skipped_t),
        "p_files": len(skipped_p),
        "p_rows": sum(s["n"] for s in skipped_p),
    }


def test_zorder_write_makes_price_predicate_file_skippable(spark, tmp_path):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    enriched = li.select(
        "*",
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
        F.floor(F.col("l_extendedprice") / 26).cast("long").alias("y"),
    )

    # incumbent: date-clustered files (sortWithinPartitions after a
    # range shuffle on date = the offline store's layout, idealized)
    by_date = str(tmp_path / "by_date")
    (
        enriched.repartitionByRange(N_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .drop("x", "y")
        .write.parquet(by_date)
    )

    # the fix: Morton-range-partitioned on (date, price) tiles
    by_z = str(tmp_path / "by_zorder")
    z = zorder_key2("x", "y", bits=12).alias("__z")
    (
        enriched.withColumn("__z", z)
        .repartitionByRange(N_FILES, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "x", "y")
        .write.parquet(by_z)
    )

    date_rep = _skip_report(_file_stats(by_date), li)
    zord_rep = _skip_report(_file_stats(by_z), li)
    assert date_rep["rows"] == zord_rep["rows"]

    # date layout: time predicate prunes well, price predicate prunes ~0
    assert date_rep["t_rows"] / date_rep["rows"] > 0.5
    assert date_rep["p_files"] == 0

    # z-order: price predicate becomes genuinely file-skippable...
    assert zord_rep["p_rows"] / zord_rep["rows"] > 0.5
    # ...while time skipping survives (the multi-dim trade, not a swap)
    assert zord_rep["t_rows"] / zord_rep["rows"] > 0.3

    # one-sidedness against the actual rows: no skipped file holds a hit
    import datetime

    tcut = datetime.datetime.fromisoformat(TCUT)
    for rep_path, stats in (
        (by_date, _file_stats(by_date)),
        (by_z, _file_stats(by_z)),
    ):
        for s in stats:
            df = spark.read.parquet(s["file"])
            if s["max"]["l_shipdate"] < tcut:
                assert df.where(F.col("l_shipdate") >= F.lit(TCUT)).count() == 0
            if s["max"]["l_extendedprice"] < PCUT:
                assert (
                    df.where(F.col("l_extendedprice") >= F.lit(PCUT)).count()
                    == 0
                )
