"""Custom stateful streaming: per-key running aggregates via
``applyInPandasWithState``.

This is the escape hatch for operators Structured Streaming's built-in
windows can't express: arbitrary per-key state evolved batch-by-batch
with Arrow-batched pandas. The example operator keeps a running
(count, sum, max) per user across micro-batches — the streaming twin of
a grouped aggregation, but with user-controlled state you could extend
to sessionization, CUSUM drift detection, or token-budget tracking.

State size is bounded by the key cardinality; set a timeout to reap
idle keys in production streams.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("peak_value", DoubleType()),
    ]
)


def _update_running(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            peak = max(peak, float(pdf["value"].max()))
    state.update((n, round(total, 6), peak))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": round(total, 6),
                "peak_value": peak,
            }
        ]
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) across micro-batches.

    Works on a streaming DataFrame with (user_id bigint, value double);
    emits one updated row per user per micro-batch (Update output mode).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 typed-state API (transformWithStateInPandas)
# ---------------------------------------------------------------------------


def has_transform_with_state() -> bool:
    """transformWithStateInPandas streams state through a protobuf
    channel between the JVM and the Python driver worker; a broken or
    absent ``google.protobuf`` install crashes the StreamingPythonRunner
    at query start (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), so
    callers gate execution on this probe. Plan construction and schema
    resolution work without it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """Spark 4 twin of :func:`running_user_stats` on the
    ``transformWithStateInPandas`` typed-state API: named ValueState
    with an explicit schema instead of a positional state tuple, plus
    (unused here) timers, ListState/MapState, and per-state TTL — the
    API to reach for when custom operators need more than one state
    blob per key. Semantics are identical: one updated
    (user_id, n_events, total_value, peak_value) row per user per
    micro-batch. Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, peak DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            st = self._stats.get()
            n, total, peak = st if st else (0, 0.0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    peak = max(peak, float(pdf["value"].max()))
            self._stats.update((n, round(total, 6), peak))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": round(total, 6),
                        "peak_value": peak,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        _RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
