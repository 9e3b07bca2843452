"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 X27 / north-star "custom stateful operators").

The built-in stateful operators (window aggs, session_window,
dropDuplicatesWithinWatermark) cover the closure; this module is the
escape hatch for semantics none of them express. The example operator
is a per-user *spend tracker with alerting*: it keeps a running event
count + value sum per user across micro-batches and emits one row per
(user, batch) only when the cumulative value crosses multiples of a
threshold — cross-batch state, data-dependent emission, no built-in
equivalent.

State discipline at scale: state is keyed by user_id (the shuffle
key), holds two scalars per user, and expires via processing-time
timeout when a user goes quiet — bounded state, the thing that keeps
a 1000-executor streaming job alive."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("crossed_multiple", LongType()),
    ]
)


def track_spend(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float = 100.0,
    expire_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Per-user cumulative tracker: emits whenever the running total
    crosses a new multiple of `threshold`."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    before = int(total // threshold)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    if expire_ms is not None:
        state.setTimeoutDuration(expire_ms)
    after = int(total // threshold)
    if after > before:
        yield pd.DataFrame(
            [(user_id, n, total, after)],
            columns=["user_id", "n_events", "total_value", "crossed_multiple"],
        )


def spend_alerts(
    events: DataFrame, threshold: float = 100.0, expire_ms: int | None = None
) -> DataFrame:
    """Wire the tracker over a stream grouped by user.

    ``expire_ms`` enables processing-time state expiry for quiet keys
    — the state-boundedness requirement of a long-running production
    stream. It is OPT-IN because a processing-time timeout makes
    Trigger.AvailableNow loop indefinitely (every drained batch
    schedules future timeout work); bounded replays (tests, the
    driver) run with NoTimeout."""

    def fn(key, pdfs, state):
        return track_spend(key, pdfs, state, threshold, expire_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if expire_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# -- transformWithState form (Spark 4.x) --------------------------------------
#
# The modern replacement for applyInPandasWithState: a StatefulProcessor
# object with named, individually-typed state variables (value/list/map),
# TTL support, and timer callbacks — the API surface new stateful
# operators should target. spend_alerts_tws is the same per-user spend
# tracker as spend_alerts, so tests can pin both implementations to the
# same output on the same stream.


def spend_alerts_tws(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """transformWithStateInPandas twin of ``spend_alerts``: per-user
    running (count, total); emit one row whenever the total crosses a
    new multiple of ``threshold``. State is a single named ValueState
    keyed by user_id (the shuffle key) holding two scalars — same
    bounded-state discipline, new API.

    Runtime requirements beyond applyInPandasWithState: the RocksDB
    state store provider (set spark.sql.streaming.stateStore.
    providerClass to ...state.RocksDBStateStoreProvider) and the
    ``protobuf`` package (the TWS Python state server's wire format) —
    the equivalence test skips where the runtime lacks them."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "spend", "n_events long, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._state.get() if self._state.exists() else None
            n, total = (prior[0], prior[1]) if prior is not None else (0, 0.0)
            before = int(total // threshold)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            after = int(total // threshold)
            if after > before:
                yield pd.DataFrame(
                    [(user_id, n, total, after)],
                    columns=[
                        "user_id",
                        "n_events",
                        "total_value",
                        "crossed_multiple",
                    ],
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SpendProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
