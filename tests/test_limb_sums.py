"""Two-limb exact integer accumulation (the round-4 q1 fix): property
tests that the limb-reconstructed double is (a) engine-independent by
construction — DuckDB computes the identical value from the identical
int64 limb sums — and (b) within 1 ulp of the once-rounded true sum.

The reconstruction ``double(sum_hi) * S + double(sum_lo)`` rounds at
most twice, so it can differ from the correctly-rounded true sum by at
most 1 ulp — but BOTH engines perform the SAME two roundings on the
SAME exact integers, which is what the oracle hash-gate needs. (The
previous DECIMAL(38) route produced a >2^63 integer whose narrowing to
double is correctly rounded in one engine and not the other — the
sf0.1 gate caught the 1-ulp divergence live.)
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

S = 100_000_000  # the q1 sum_charge limb scale


def _limb_reconstruct(values: list[int], s: int = S) -> float:
    hi = sum(v // s for v in values)
    lo = sum(v % s for v in values)
    assert abs(hi) < 2**63 and abs(lo) < 2**63  # int64 limb contract
    return float(hi) * float(s) + float(lo)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2_000_000_000_000_000),  # ~2e15: q1's row bound
        min_size=1,
        max_size=50,
    )
)
def test_limb_reconstruction_within_one_ulp_of_true_sum(values):
    got = _limb_reconstruct(values)
    true = float(sum(values))  # Python: correctly-rounded bigint -> double
    assert got == true or math.isclose(got, true, rel_tol=2.3e-16), (
        values, got, true,
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2_000_000_000_000_000),
        min_size=1,
        max_size=50,
    )
)
def test_limb_reconstruction_matches_duckdb_bit_for_bit(values):
    """The exact cross-engine contract: DuckDB evaluating the same limb
    expression over the same integers produces the same double BITS."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    (dv,) = con.execute(
        f"SELECT CAST(CAST(SUM(x // {S}) AS BIGINT) AS DOUBLE) * {float(S)}"
        f" + CAST(CAST(SUM(x % {S}) AS BIGINT) AS DOUBLE) FROM t"
    ).fetchone()
    assert dv == _limb_reconstruct(values)
    assert math.copysign(1, dv) == math.copysign(1, _limb_reconstruct(values))


def test_wide_decimal_narrowing_is_the_hazard():
    """Documents the bug class the limbs replace: a sum past 2^63 whose
    decimal->double narrowing DuckDB rounds differently than a
    correctly-rounded conversion (the exact value the sf0.1 gate caught
    differed in the last ulp). Python's int->float IS correctly rounded,
    so it is the reference here."""
    total = 51_064_801_351_670_610_000  # ~5.1e19 > 2^63, the q1 case's scale
    con = duckdb.connect()
    (dv,) = con.execute(
        f"SELECT CAST(CAST({total} AS DECIMAL(38,0)) AS DOUBLE)"
    ).fetchone()
    correctly_rounded = float(total)
    # Either they agree (fine) or differ by exactly 1 ulp (the hazard);
    # both outcomes demonstrate why sums must stay inside int64 limbs.
    assert abs(dv - correctly_rounded) <= math.ulp(correctly_rounded)
