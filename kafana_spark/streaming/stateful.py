"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed/session aggregations (streaming/pipeline.py)
cover the reference's query surface; this module is the extension
point for operators whose state logic Spark's aggregates can't
express. State lives in the checkpointed state store (per key, per
partition — scales horizontally with executors); user code sees Arrow
batches per key per micro-batch.

``running_counts`` is the canonical example: an ever-running per-key
event counter emitting an updated total every micro-batch — the
streaming twin of ``SELECT key, COUNT(*) ... GROUP BY key`` with
update-mode output and explicitly-owned state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_OUTPUT = "key string, events bigint"
RUNNING_COUNT_STATE = "events bigint"

SESSION_OUTPUT = ("key string, start_us bigint, end_us bigint, "
                  "events bigint")
SESSION_STATE = "start_us bigint, end_us bigint, events bigint"


def sessionize_stateful(records: DataFrame, gap_seconds: int = 1800,
                        key_col: str = "key",
                        time_col: str = "timestamp",
                        watermark: str = "30 minutes") -> DataFrame:
    """Custom session operator with explicit state + event-time timeout.

    Unlike the built-in ``session_window`` aggregation (which only
    counts), this owns its state record (start, end, count per key) and
    EMITS a finalized session when the event-time timeout fires — i.e.
    when the watermark passes ``last_event + gap``. The built-in
    covers the query surface; this is the extension point for session
    state Spark's aggregates can't express (e.g. carrying arbitrary
    per-session payloads).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, end_us, events = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "start_us": [start_us],
                                "end_us": [end_us], "events": [events]})
            return
        lo, hi, n = None, None, 0
        for pdf in pdfs:
            ts_us = (pdf[time_col].astype("int64") // 1000).to_numpy()
            lo = min(ts_us.min(), lo) if lo is not None else ts_us.min()
            hi = max(ts_us.max(), hi) if hi is not None else ts_us.max()
            n += len(ts_us)
        done = []
        if state.exists:
            start_us, end_us, events = state.get
            if lo is not None and lo - end_us > gap_us:
                # new burst beyond the gap: close the old session
                done.append((start_us, end_us, events))
                start_us, end_us, events = lo, hi, n
            else:
                start_us = min(start_us, lo)
                end_us = max(end_us, hi)
                events += n
        else:
            start_us, end_us, events = int(lo), int(hi), n
        state.update((int(start_us), int(end_us), int(events)))
        # epoch-millis; plain Python int (numpy int64 breaks the
        # JSON-serialized state command)
        state.setTimeoutTimestamp(int(end_us) // 1000 + gap_seconds * 1000)
        if done:
            yield pd.DataFrame(
                [(key[0], s, e, c) for s, e, c in done],
                columns=["key", "start_us", "end_us", "events"])

    return (records.selectExpr(f"CAST({key_col} AS STRING) AS key",
                               f"{time_col}")
            .withWatermark(time_col, watermark)
            .groupBy("key")
            .applyInPandasWithState(
                update,
                outputStructType=SESSION_OUTPUT,
                stateStructType=SESSION_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def running_counts(records: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key cumulative event count across all micro-batches.

    Output mode is update: each batch emits one row per key seen in
    that batch carrying the new lifetime total. State is one long per
    key — bounded by key cardinality, not stream length.
    """

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "events": [total]})

    return (records.selectExpr(f"CAST({key_col} AS STRING) AS key")
            .groupBy("key")
            .applyInPandasWithState(
                update,
                outputStructType=RUNNING_COUNT_OUTPUT,
                stateStructType=RUNNING_COUNT_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
