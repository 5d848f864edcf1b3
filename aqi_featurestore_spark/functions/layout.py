"""Data-layout keys: Z-order (Morton) interleaving for multi-dimension
clustering.

A single-column sort prunes scans on that column only; interleaving
the bits of two dimensions into one Morton key and range-partitioning
the write on it keeps rows that are close in BOTH dimensions in the
same files, so min/max file statistics prune either predicate — the
technique behind Delta Lake's ``OPTIMIZE ZORDER BY`` and extensively
published elsewhere. Everything here is pure integer bit arithmetic
(JVM-side, codegen'd, and exactly reproducible in any engine), which
is also what lets the DuckDB oracle verify the keys bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key2(x: Column | str, y: Column | str, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative int
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    ``bits <= 31`` keeps the result in a signed 64-bit long. Caller is
    responsible for reducing each dimension into [0, 2^bits) — e.g.
    ``F.col("u") % (1 << bits)`` or a quantized timestamp."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftrightunsigned(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def duck_zorder_key2(x: str, y: str, *, bits: int = 16) -> str:
    """DuckDB SQL computing exactly :func:`zorder_key2` — same bit ops,
    same positions, for oracle parity."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    *,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition ``df`` by the Morton key of (x, y) — the write-
    side layout step: each output partition covers a contiguous Z-range,
    i.e. a tile in (x, y) space, so parquet min/max stats on BOTH
    source columns become selective. Pure repartitioning; row content
    untouched. ``num_partitions`` pins the file count (AQE may coalesce
    the range shuffle otherwise)."""
    z = zorder_key2(x, y, bits=bits).alias("__z")
    zdf = df.withColumn("__z", z)
    if num_partitions is not None:
        zdf = zdf.repartitionByRange(num_partitions, "__z")
    else:
        zdf = zdf.repartitionByRange("__z")
    return zdf.drop("__z")
