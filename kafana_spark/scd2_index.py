"""Persisted SCD Type-2 dimension index — build once, append batches,
serve versioned history and point-in-time lookups without re-reading
the event stream.

x287 derives the dimension from the full changelog per query; at
100 TB the changelog scan is the whole cost, while the dimension
itself is tiny (changes-only). This index persists the COLLAPSED
change rows, batch-partitioned:

- ``<path>/changes/batch=<id>`` — (key, state, ts, seq) rows where
  the state differs from its (ts, seq)-ordered predecessor WITHIN the
  batch.

Merge law (the ``operators.events.scd2_changes`` docstring, pinned by
test): collapse is idempotent, and for EVENT-TIME-partitioned batches
(the streaming epoch contract — every event in batch N+1 is later
than every event in batch N)::

    collapse(concat(collapse(b1), collapse(b2))) == collapse(concat(b1, b2))

so the serve-time re-collapse (which also removes across-boundary
no-change rows, e.g. a key that ends batch 1 and starts batch 2 in
the same state) reproduces the full-recompute dimension EXACTLY —
the stored twins x296/x297 hash-match x287/x288's oracles. Folding a
new day of events costs one per-key collapse over the NEW rows only.

Batch layout matches dedup_index/ann_index/gate_index/event_index:
every load lands under ``batch=<id>``; a base rebuild clears the
subtree first; redelivering a batch id overwrites its own partition
(idempotent), so the foreachBatch streaming sink is at-least-once
safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafana_spark.operators import events as ev_ops

CHANGES_DIR = "changes"


def build_scd2_index(df: DataFrame, path: str, *,
                     key_col: str = "user_id",
                     state_col: str = "event_type",
                     time_col: str = "ts",
                     seq_col: str = "event_id",
                     batch: str = "base") -> None:
    """Collapse the changelog to change rows and persist them. A base
    build clears stale batch partitions first."""
    from kafana_spark.ann_index import _clear_batched_dir

    if batch == "base":
        _clear_batched_dir(f"{path}/{CHANGES_DIR}")
    ev_ops.scd2_changes(df, key_col, state_col, time_col, seq_col) \
        .write.mode("overwrite") \
        .parquet(f"{path}/{CHANGES_DIR}/batch={batch}")


def append_scd2_index(df_new: DataFrame, path: str, batch: str, *,
                      key_col: str = "user_id",
                      state_col: str = "event_type",
                      time_col: str = "ts",
                      seq_col: str = "event_id") -> None:
    """Fold a new EVENT-TIME-later batch into the index: one collapse
    over only the new rows (no base re-read). A redelivered batch id
    replaces its own partition."""
    ev_ops.scd2_changes(df_new, key_col, state_col, time_col,
                        seq_col) \
        .write.mode("overwrite") \
        .parquet(f"{path}/{CHANGES_DIR}/batch={batch}")


def changes_from_store(spark: SparkSession, path: str, *,
                       key_col: str = "user_id",
                       state_col: str = "event_type",
                       time_col: str = "ts",
                       seq_col: str = "event_id") -> DataFrame:
    """All stored change rows merged across batches: one re-collapse
    (idempotent) removes across-boundary no-change rows, yielding
    exactly the full-stream change frame."""
    raw = spark.read.parquet(f"{path}/{CHANGES_DIR}").drop("batch")
    return ev_ops.scd2_changes(raw, key_col, state_col, time_col,
                               seq_col)


def scd2_dim_from_store(spark: SparkSession, path: str, *,
                        key_col: str = "user_id",
                        state_col: str = "event_type",
                        time_col: str = "ts",
                        seq_col: str = "event_id") -> DataFrame:
    """x287's dimension served from the store — the operator's own
    version/interval tail over the merged change rows; no event is
    re-read."""
    return ev_ops.scd2_dim_from_changes(
        changes_from_store(spark, path, key_col=key_col,
                           state_col=state_col, time_col=time_col,
                           seq_col=seq_col),
        key_col, state_col, time_col, seq_col)


def scd2_state_at_from_store(spark: SparkSession, probes_df: DataFrame,
                             path: str, probe_type: str = "purchase",
                             *, key_col: str = "user_id",
                             state_col: str = "event_type",
                             time_col: str = "ts",
                             seq_col: str = "event_id") -> DataFrame:
    """x288's PIT lookup served from the store: probe events (the
    query input) join the STORED dimension — the feature-store shape
    where the dimension is maintained once and every training-data
    extraction reads it."""
    dim = scd2_dim_from_store(spark, path, key_col=key_col,
                              state_col=state_col, time_col=time_col,
                              seq_col=seq_col)
    probes = (probes_df.where(F.col(state_col) == probe_type)
              .select(F.col(seq_col).alias("probe_id"),
                      F.col(key_col),
                      F.col(time_col).alias("p_ts")))
    return ev_ops.scd2_state_at_from_dim(dim, probes, key_col)


def scd2_stream_sink(path: str, *, key_col: str = "user_id",
                     state_col: str = "event_type",
                     time_col: str = "ts",
                     seq_col: str = "event_id"):
    """foreachBatch sink maintaining the dimension from streaming
    ingest: each micro-batch collapses to its change rows under
    ``batch=<epoch_id>`` — at-least-once redelivery replaces its own
    partition, so every change counts once in the served history."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        append_scd2_index(batch_df, path, batch=str(epoch_id),
                          key_col=key_col, state_col=state_col,
                          time_col=time_col, seq_col=seq_col)

    return _sink
