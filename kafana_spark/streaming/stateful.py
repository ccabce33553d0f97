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
