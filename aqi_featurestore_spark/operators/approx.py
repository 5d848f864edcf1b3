"""Approximate aggregates: HLL distinct counts and approximate
quantiles, with exact-value guard rails.

At 100 TB, ``COUNT(DISTINCT x)`` is the classic scale-killer: the
exact form shuffles every distinct value to a reducer. Sketches fix
the shape, not just the constant:

- **HyperLogLog** (``hll_sketch_agg``, Apache DataSketches): each
  executor folds its partition into a fixed-size register array
  (map-side partial agg), and merge is a register-wise max — fully
  associative, so a 1000-executor agg ships KB-sized sketches, not
  values. Sketches are also storable: per-day sketches unioned later
  give exactly the same registers (and therefore the same estimate) as
  a single global pass — the "hypertable rollup" pattern for
  continuous distinct-user metrics. :func:`distinct_count_profile`
  asserts that equality as a boolean column.
- **approx_percentile** (KLL-style): same mergeable-partial shape for
  quantiles; exact ``percentile`` sorts every value per group.

Every approximate column is emitted as a deterministic
``*_ok`` boolean (|approx − exact| within a bound) next to the exact
value, so a cross-engine oracle that cannot reproduce the sketch can
still verify the result: both sketches and data are seed-free and
deterministic, so the booleans are stable run-to-run. The exact
columns double as the (small-cardinality) reference output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count_profile(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    day_col: str | None = None,
    rel_bound: float = 0.10,
    lgk: int = 14,
) -> DataFrame:
    """Per-``keys`` distinct count of ``col``: exact, plus HLL and
    approx_count_distinct estimates checked against the exact value
    (``hll_ok`` / ``acd_ok``: relative error ≤ ``rel_bound``).

    With ``day_col``, also proves sketch mergeability: per-day sketches
    unioned per key must estimate exactly what the single-pass sketch
    estimates (``merge_ok``) — register-wise max is associative, so
    this is equality, not an error bound."""
    direct = df.groupBy(*keys).agg(
        F.count_distinct(F.col(col)).alias("n_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lgk))).alias("__hll"),
        F.approx_count_distinct(col, 0.02).alias("__acd"),
    )
    ok = lambda est: (  # noqa: E731
        F.abs(F.col(est) - F.col("n_exact"))
        <= F.lit(rel_bound) * F.col("n_exact")
    ).alias(est.strip("_") + "_ok")
    out = direct.select(
        *keys,
        "n_exact",
        ok("__hll"),
        ok("__acd"),
        F.col("__hll").alias("__direct_est"),
    )
    if day_col is None:
        return out.drop("__direct_est")
    daily = df.groupBy(*keys, F.to_date(day_col).alias("__d")).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("__sk")
    )
    merged = daily.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"))).alias("__merged_est")
    )
    return (
        out.join(merged, keys)
        .withColumn("merge_ok", F.col("__merged_est") == F.col("__direct_est"))
        .drop("__merged_est", "__direct_est")
    )


def quantile_profile(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    quantiles: list[float] = (0.5, 0.95),
    accuracy: int = 10_000,
    rel_bound: float = 0.05,
) -> DataFrame:
    """Per-``keys`` quantiles of ``col``: exact ``percentile`` values
    (cross-engine comparable — Spark ``percentile`` == DuckDB
    ``quantile_cont`` bit-for-bit) plus a ``q*_ok`` boolean per
    quantile checking ``approx_percentile`` (mergeable KLL-style
    sketch, the 100 TB path) against the exact value within
    ``rel_bound`` relative error. The bound absorbs more than sketch
    error: ``approx_percentile`` returns an actual data value while
    ``percentile`` interpolates, so on small groups the gap is the
    local inter-order-statistic spacing."""
    aggs = []
    for q in quantiles:
        tag = f"q{int(q * 100)}"
        aggs.append(F.percentile(F.col(col), F.lit(q)).alias(tag))
        aggs.append(
            F.approx_percentile(F.col(col), F.lit(q), F.lit(accuracy)).alias(f"__a_{tag}")
        )
    prof = df.groupBy(*keys).agg(*aggs)
    checks = [
        (
            F.abs(F.col(f"__a_q{int(q*100)}") - F.col(f"q{int(q*100)}"))
            <= F.abs(F.col(f"q{int(q*100)}")) * F.lit(rel_bound)
        ).alias(f"q{int(q*100)}_ok")
        for q in quantiles
    ]
    return prof.select(*keys, *[f"q{int(q*100)}" for q in quantiles], *checks)
