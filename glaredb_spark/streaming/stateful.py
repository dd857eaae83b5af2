"""Custom stateful streaming operator — applyInPandasWithState.

North-star extension (the reference has no streaming/state subsystem,
SURVEY.md §2.7): a per-user running aggregate maintained in the state store
across micro-batches — the pattern for custom sessionization, CEP, or
online feature computation that windowed aggregation can't express.

Scale notes: state is partitioned by the grouping key across executors
(RocksDB state store on a real cluster); each micro-batch touches only the
groups present in that batch plus timed-out state. State size ∝ active
users, not event history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),  # exact integer cents
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, total-in-cents, max) per user across batches.
    Totals are kept as integer cents so state merge order can't change
    results (same determinism discipline as the batch operators)."""
    n, total_cents, max_v = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        # round per row, then sum integers — batch-boundary invariant
        total_cents += int((pdf["value"] * 100).round().astype("int64").sum())
        if len(pdf):
            max_v = max(max_v, float(pdf["value"].max()))
    state.update((n, total_cents, max_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
            "max_value": [max_v],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via applyInPandasWithState."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
