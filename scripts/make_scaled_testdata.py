#!/usr/bin/env python
"""Synthesize a larger scale factor from the driver's testdata
(TESTDATA.md ships sf0.001/0.01/0.1 only; the sf1 scale probe needs
~10x sf0.1). Deterministic replication via DuckDB — no RNG, rerunning
produces byte-identical tables.

Replica ``rep`` in [0, factor): every id shifts by ``rep * OFFSET`` with
referential integrity preserved (orders.o_custkey moves with customer,
lineitem's order/part/supp keys move with their dims), and rep 0 is the
original data unchanged. Content is perturbed so CROSS-replica
similarity collapses instead of exploding quadratically (verbatim
10x-replicated text would turn every dedup query's pair count 100x and
invalidate the workload shape):

- documents: every whitespace token gets a per-replica suffix for
  rep > 0 — in-replica shingle/MinHash/SimHash structure is intact,
  cross-replica Jaccard ~ 0; n_chars is recomputed to stay consistent.
- embeddings: circular dimension shift by ``rep`` — norms and
  in-replica geometry exact (a coordinate permutation), cross-replica
  cosine decorrelates.
- events: ids/users shift; timestamps keep their wall-clock range, so
  per-hour density grows with the factor (how a real system scales).

Usage: python scripts/make_scaled_testdata.py [src] [dst] [factor]
Defaults: /root/testdata/sf0.1 -> ./testdata_sf1, factor 10.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000

ID_OVERRIDES: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": f"c_custkey + rep * {OFFSET}"},
    "supplier": {"s_suppkey": f"s_suppkey + rep * {OFFSET}"},
    "part": {"p_partkey": f"p_partkey + rep * {OFFSET}"},
    "orders": {
        "o_orderkey": f"o_orderkey + rep * {OFFSET}",
        "o_custkey": f"o_custkey + rep * {OFFSET}",
    },
    "lineitem": {
        "l_orderkey": f"l_orderkey + rep * {OFFSET}",
        "l_partkey": f"l_partkey + rep * {OFFSET}",
        "l_suppkey": f"l_suppkey + rep * {OFFSET}",
    },
    "events": {
        "event_id": f"event_id + rep * {OFFSET}",
        "user_id": f"user_id + rep * {OFFSET}",
    },
    "documents": {
        "doc_id": f"doc_id + rep * {OFFSET}",
        "text": (
            "CASE WHEN rep = 0 THEN text ELSE array_to_string("
            "list_transform(regexp_split_to_array(text, ' '), "
            "tk -> tk || 'r' || CAST(rep AS VARCHAR)), ' ') END"
        ),
    },
    "embeddings": {
        "vec_id": f"vec_id + rep * {OFFSET}",
        "embedding": (
            "CASE WHEN rep = 0 THEN embedding ELSE CAST("
            "list_slice(embedding, rep + 1, len(embedding)) || "
            "list_slice(embedding, 1, rep) AS FLOAT[]) END"
        ),
    },
}

# columns derived from an overridden column, recomputed after it
DERIVED = {"documents": {"n_chars": "CAST(length({text}) AS BIGINT)"}}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name, over in ID_OVERRIDES.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{name}.parquet'"
            ).fetchall()
        ]
        derived = DERIVED.get(name, {})
        sel = ", ".join(
            derived[c].format(**over) + f" AS {c}"
            if c in derived
            else f"{over.get(c, c)} AS {c}"
            for c in cols
        )
        rep_src = (
            f"'{src}/{name}.parquet' CROSS JOIN range(0, {factor}) t(rep)"
            if over
            else f"'{src}/{name}.parquet'"  # canonical dims: no replication
        )
        con.sql(
            f"COPY (SELECT {sel} FROM {rep_src}) TO "
            f"'{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name:12s} -> {n} rows")


if __name__ == "__main__":
    main()
