"""Custom stateful streaming operator: per-entity running EMA via
``applyInPandasWithState``.

The reference has no stateful operators at all (SURVEY.md §2.9) — its
"state" is the Redis latest-value store refreshed by scheduled batch. A
real 100 TB streaming pipeline needs arbitrary per-key state that outlives
a single microbatch; this module is the pattern instance:

- state is per entity key (group), bounded by entity cardinality;
- each microbatch updates the EMA from that key's new rows in event-time
  order and emits one row per updated key;
- a processing-time timeout evicts keys idle longer than ``state_ttl``
  (the streaming analogue of the feature view's 7-day TTL).

The same shape covers sessionization, CDC-style dedup windows, and online
feature freshness counters — swap the pandas body, keep the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUTPUT_SCHEMA = (
    "entity_id string, ema double, n_obs long, last_ts timestamp"
)
EMA_STATE_SCHEMA = "ema double, n_obs long, last_ts_us long"


def _ema_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    alpha: float,
    value_col: str,
    ts_col: str,
    state_ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    ema, n_obs, last_ts_us = state.get if state.exists else (None, 0, None)
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.dropna(subset=[value_col]).sort_values(ts_col, kind="stable")
    for v in rows[value_col]:
        v = float(v)
        ema = v if ema is None else alpha * v + (1.0 - alpha) * ema
        n_obs += 1
    if len(rows):
        last_ts_us = int(rows[ts_col].iloc[-1].value // 1_000)
    state.update((ema, n_obs, last_ts_us))
    if state_ttl_ms is not None:
        state.setTimeoutDuration(state_ttl_ms)
    yield pd.DataFrame(
        {
            "entity_id": [key[0]],
            "ema": [ema],
            "n_obs": [n_obs],
            "last_ts": [pd.Timestamp(last_ts_us * 1_000) if last_ts_us else pd.NaT],
        }
    )


def batch_ema(
    df: DataFrame,
    *,
    key_col: str = "entity_id",
    value_col: str = "aqi",
    ts_col: str = "feature_timestamp",
    order_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Batch-mode twin of ``running_aqi_ema``: the same sequential EMA
    fold (seeded with the first value, then ``alpha*v + (1-alpha)*ema``
    in event-time order) as one distributed aggregation.

    EMA is a non-commutative left fold, so it can't be a plain SUM-style
    aggregate; instead each key's values are gathered into one sorted
    array (``array_sort(collect_list(struct(ts, order, v)))`` — per-key
    state, same memory bound as the streaming operator's) and folded
    JVM-side with ``F.aggregate``. Deterministic (ties break on
    ``order_col``) and IEEE-identical to DuckDB's ``list_reduce`` with
    the same constants — this is what lets the driver hash-verify the
    stateful-streaming family in batch mode."""
    from pyspark.sql import functions as F

    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(order_col).alias("oid"),
                F.col(value_col).alias("v"),
            )
        )
    )
    beta = 1.0 - alpha  # computed ONCE; embedded exactly on both sides
    fold = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["v"]).otherwise(
            F.lit(alpha) * x["v"] + F.lit(beta) * acc
        ),
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            fold.alias("ema"),
            F.count(value_col).alias("n_obs"),
            F.max(ts_col).alias("last_ts"),
        )
    )


def running_aqi_ema(
    events: DataFrame,
    *,
    key_col: str = "entity_id",
    value_col: str = "aqi",
    ts_col: str = "feature_timestamp",
    alpha: float = 0.3,
    state_ttl_ms: int | None = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Streaming per-entity exponential moving average.

    Input must be a *streaming* DataFrame keyed by ``key_col``. Emits one
    ``(entity_id, ema, n_obs, last_ts)`` row per key per microbatch in
    update mode. ``state_ttl_ms=None`` disables eviction."""

    def fn(key, batches, state):
        yield from _ema_update(
            key,
            batches,
            state,
            alpha=alpha,
            value_col=value_col,
            ts_col=ts_col,
            state_ttl_ms=state_ttl_ms,
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# -- transformWithState (Spark 4 arbitrary-state API) ------------------------

EXTREMA_OUTPUT_SCHEMA = (
    "entity_id string, n_obs long, min_value double, max_value double, "
    "last_ts timestamp"
)
_EXTREMA_STATE_SCHEMA = "n long, mn double, mx double, last_ts_us long"


def running_extrema_tws(
    events: DataFrame,
    *,
    key_col: str = "entity_id",
    value_col: str = "aqi",
    ts_col: str = "feature_timestamp",
    state_ttl_ms: int | None = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Per-entity running count/min/max via ``transformWithStateInPandas``
    — the Spark 4 successor to ``applyInPandasWithState``. Differences
    that matter at scale, and why this operator uses it:

    - state lives in NAMED, TYPED handles (ValueState/ListState/MapState)
      managed by the state store, not one opaque tuple per key — multiple
      independent states per key without re-serializing everything;
    - per-state TTL is declarative (``ttlDurationMs``), enforced by the
      store itself instead of hand-rolled processing-time timeout
      callbacks — the 7-day feature-freshness eviction is one argument;
    - timers and initial state are first-class (not used here).

    Emits one ``(entity_id, n_obs, min_value, max_value, last_ts)`` row
    per key per microbatch (update semantics). State is O(1) per key:
    four scalars, bounded by entity cardinality, TTL-evicted.

    Runtime requirement: the Python transformWithState worker speaks a
    protobuf protocol to the JVM state server, so ``google.protobuf``
    must be importable on executors (any standard PySpark install; the
    test is skipif-guarded for containers that strip it — this sandbox
    does). ``running_aqi_ema`` (applyInPandasWithState) has no such
    dependency and remains the portable fallback."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Extrema(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "extrema", _EXTREMA_STATE_SCHEMA, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n, mn, mx, last_us = 0, None, None, None
            if self._st.exists():
                n, mn, mx, last_us = self._st.get()
            for pdf in rows:
                pdf = pdf.dropna(subset=[value_col])
                if not len(pdf):
                    continue
                vals = pdf[value_col].astype(float)
                bmn, bmx = float(vals.min()), float(vals.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
                n += int(len(pdf))
                batch_last = int(pdf[ts_col].max().value // 1_000)
                last_us = batch_last if last_us is None else max(last_us, batch_last)
            if n:
                self._st.update((n, mn, mx, last_us))
                yield pd.DataFrame(
                    {
                        "entity_id": [key[0]],
                        "n_obs": [n],
                        "min_value": [mn],
                        "max_value": [mx],
                        "last_ts": [pd.Timestamp(last_us, unit="us")],
                    }
                )

        def close(self) -> None:
            # Required StatefulProcessor teardown hook, intentionally a
            # no-op (no resources to release). NOT an exception guard:
            # errors raised in handleInputRows propagate through the
            # Python worker and fail the streaming query — see
            # tests/test_ingest_stateful.py::test_stateful_worker_error_surfaces.
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Extrema(),
        outputStructType=EXTREMA_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="None",
    )


def batch_extrema(
    events: DataFrame,
    *,
    key_col: str = "entity_id",
    value_col: str = "aqi",
    ts_col: str = "feature_timestamp",
) -> DataFrame:
    """Batch twin of :func:`running_extrema_tws` — the terminal state the
    stream converges to on the same (bounded) input. Used by the
    equivalence test."""
    from pyspark.sql import functions as F

    return (
        events.where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_obs"),
            F.min(F.col(value_col).cast("double")).alias("min_value"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
            F.max(ts_col).alias("last_ts"),
        )
    )
