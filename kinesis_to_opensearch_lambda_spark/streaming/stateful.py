"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no cross-batch state (its only "state" is the ES
``_id`` upsert).  Large-scale pipelines need it — running per-key
counters, threshold alerts, incremental profiles — so the engine ships
the canonical pattern: grouped Arrow batches + a ``GroupState`` whose
schema is explicit, with per-key state partitioned by the shuffle and
checkpointed by the state store (bounded by watermark/timeout at scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_events bigint, total_value double"
STATE_SCHEMA = "n bigint, v double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count and value sum across batches."""
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [n], "total_value": [v]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user: one row per (user, batch) with
    the cumulative count/value carried in the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CENTS_OUTPUT_SCHEMA = "user_id bigint, total_events bigint, total_cents bigint"
CENTS_STATE_SCHEMA = "n bigint, c bigint"


def _update_user_cents(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Integer-cents accumulator: exact (order-independent) arithmetic,
    so the drained result is oracle-comparable bit-for-bit."""
    n, c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        c += int(pdf["cents"].sum())
    state.update((n, c))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [n], "total_cents": [c]}
    )


def running_user_cents(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, cents) totals over an integer
    ``cents`` column — the exact-arithmetic twin of
    :func:`running_user_totals` used by the oracle-checked
    ``streaming_stateful_user_totals`` query entry."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
