"""Custom keyed streaming state via ``applyInPandasWithState`` —
the general replacement for the reference's ``updateStateByKey`` fold
(``/root/reference/src/main/java/com/soto/UpdateStateByKeyWordCount.java:
54-78``) for aggregations the built-in state-store operators can't
express.

Two deliberate upgrades over the reference:

* state is touched only for keys present in the trigger (the DStream
  implementation cogrouped the *entire* state RDD every batch);
* optional TTL expires idle keys — the reference's state grew without
  bound (``README.md:295``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("total", DoubleType()),
    StructField("n", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("total", DoubleType()),
    StructField("n", LongType()),
])


def running_totals_with_state(
    keyed: DataFrame,
    key_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running (sum, count) across triggers, as a custom stateful
    op. ``keyed`` is a streaming DataFrame; output one row per updated
    key per trigger: (key, total, n).

    With ``ttl_ms``, idle keys are dropped after the timeout — bounded
    state for unbounded key spaces.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += int(len(pdf))
        state.update((total, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "total": [total], "n": [n]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        keyed.selectExpr(f"cast({key_col} as string) as key", f"{value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "update", timeout
        )
    )
