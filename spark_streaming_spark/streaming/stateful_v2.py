"""Arbitrary stateful processing v2: ``transformWithStateInPandas``
(Spark 4.x) — the modern successor of the reference's
``updateStateByKey`` fold (``/root/reference/src/main/java/com/soto/
UpdateStateByKeyWordCount.java:54-78``) and the v2 twin of
``streaming/stateful.py``'s ``applyInPandasWithState``.

What v2 adds over the 3.x API (and why it is the 100 TB spelling):

* typed state VARIABLES (value/list/map) instead of one opaque tuple —
  the store schema is declared, not pickled;
* built-in per-state TTL (``ttlDurationMs``) — state expiry without
  hand-rolled timeout plumbing;
* TIMERS: a key can schedule a callback (``handleExpiredTimer``) at a
  processing/event time, the primitive behind session close-out,
  reminder emission, and delayed eviction;
* requires the RocksDB state store provider (statestore.py) — disk-
  backed state with bounded memory, which is exactly what large keyed
  state needs.

The processor below reproduces ``running_totals_with_state`` (per-key
running sum/count) so the two APIs are directly comparable: same input,
same output schema, same final state — pinned by
tests/test_skew_stateful.py::test_transform_with_state_v2_matches_v1.

RUNTIME GATE: executing (not importing) this API additionally requires
the Python ``protobuf`` package — Spark's TransformWithState runner
speaks protobuf to the JVM state server — which this container lacks
(and installs are off-limits). ``tws_available()`` reports whether the
current runtime can execute it; the tests skip when it can't, and the
v1 ``applyInPandasWithState`` twin (stateful.py) is the always-
executable spelling with identical semantics minus timers.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

_OUT_SCHEMA = "key string, total double, n bigint"
_STATE_SCHEMA = "total double, n bigint"


def tws_available() -> bool:
    """True iff the runtime can EXECUTE transformWithStateInPandas:
    Spark's TWS Python runner requires the protobuf package (the state
    server protocol), which is not part of this container's baked-in
    set. Exact requirement (pinned from the generated stub
    ``pyspark/sql/streaming/proto/StateMessage_pb2.py``, whose
    ``ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0)`` call enforces
    it): public ``protobuf`` >= 6.33.0. Import of this module never
    requires it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (sum, count). With ``ttl_ms`` set, each update
    registers a processing-time timer ttl_ms ahead; an expired timer
    clears the key's state and emits a final tombstone row with n = -1
    (observable expiry — the test hook; production would emit the
    flushed aggregate to a downstream sink)."""

    def __init__(self, value_col: str, ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        total, n = self._state.get() if self._state.exists() else (0.0, 0)
        for pdf in rows:
            total += float(pdf[self._value_col].sum())
            n += int(len(pdf))
        self._state.update((total, n))
        if self._ttl_ms is not None:
            # one live timer per key: re-arm by replacing the old one
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self._ttl_ms
            )
        yield pd.DataFrame({"key": [key[0]], "total": [total], "n": [n]})

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        self._state.clear()
        yield pd.DataFrame({"key": [key[0]], "total": [0.0], "n": [-1]})

    def close(self) -> None:
        pass


def running_totals_with_state_v2(
    keyed: DataFrame,
    key_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """v2 twin of ``stateful.running_totals_with_state``: same contract
    (one (key, total, n) row per updated key per trigger), built on
    ``transformWithStateInPandas``. Callers must start the query under
    the RocksDB provider (``statestore.state_store_provider``)."""
    return (
        keyed.selectExpr(f"cast({key_col} as string) as key", value_col)
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(value_col, ttl_ms),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )
