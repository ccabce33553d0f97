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
- ``<path>/manifest/batch=<id>`` — one (batch_id, min_us, max_us)
  row per batch: the batch's event-time span, used to ENFORCE the
  merge law's precondition at append time (below).

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

The precondition is NOT optional: with overlapping batch spans the
within-batch collapse drops rows that are genuine state changes in
the merged order (b1 = A@1,A@5 collapses away A@5; b2 = B@3 then
serves A,B instead of A,B,A). ``append_scd2_index`` therefore
REFUSES a batch whose min event time is not strictly greater than
every other stored batch's max (span manifest check; exact
redeliveries of the same batch id pass — they replace their own
partition). Late/out-of-order data requires a base rebuild, exactly
as a watermark violation would in the streaming pipeline.

Batch layout matches dedup_index/ann_index/gate_index/event_index:
every load lands under ``batch=<id>``; a base rebuild clears the
subtree first; redelivering a batch id overwrites its own partition
(idempotent), so the foreachBatch streaming sink is at-least-once
safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafana_spark.operators import events as ev_ops

CHANGES_DIR = "changes"
MANIFEST_DIR = "manifest"


def _batch_span(df: DataFrame, time_col: str,
                seq_col: str) -> tuple[int | None, int | None]:
    """(min, max) event-time microseconds of a batch — one tiny agg."""
    r = df.agg(F.min(F.unix_micros(F.col(time_col))).alias("mn"),
               F.max(F.unix_micros(F.col(time_col))).alias("mx")) \
        .first()
    return r.mn, r.mx


def _write_manifest(spark: SparkSession, path: str, batch: str,
                    mn: int | None, mx: int | None) -> None:
    spark.createDataFrame([(batch, mn, mx)],
                          "batch_id string, min_us long, max_us long") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{path}/{MANIFEST_DIR}/batch={batch}")


def _enforce_event_time_partitioning(spark: SparkSession, path: str,
                                     batch: str, mn: int | None,
                                     mx: int | None) -> None:
    """The merge law (module docstring) holds ONLY for event-time-
    partitioned batches: the within-batch collapse drops rows that a
    LATER-ARRIVING-but-EARLIER-IN-TIME batch would have split into
    genuine state changes, and the serve-time re-collapse cannot
    recover them. Enforce it at append time from the stored batch
    spans (one row per batch — tiny): a new batch must start strictly
    after every other stored batch ends. An exact redelivery (same
    batch id, same span) is always allowed — it replaces its own
    partition (ADVICE.md r7 medium)."""
    if mn is None:
        return  # empty batch carries no events to mis-order
    if not os.path.isdir(f"{path}/{MANIFEST_DIR}"):
        return  # pre-manifest store: nothing recorded to compare
    rows = spark.read.parquet(f"{path}/{MANIFEST_DIR}") \
        .select("batch_id", "min_us", "max_us").collect()
    for r in rows:
        if r.batch_id == batch:
            if (r.min_us, r.max_us) == (mn, mx):
                return  # pure redelivery — idempotent overwrite
            continue  # same id, new span: judge against the others
    overlap = [r for r in rows
               if r.batch_id != batch and r.max_us is not None
               and mn <= r.max_us]
    if overlap:
        worst = max(r.max_us for r in overlap)
        raise ValueError(
            f"scd2 index batch {batch!r} starts at {mn} us but stored "
            f"batch(es) {[r.batch_id for r in overlap]} extend to "
            f"{worst} us — batches must be strictly event-time "
            f"partitioned (the scd2_changes merge-law contract); "
            f"rebuild the base with build_scd2_index instead")


def build_scd2_index(df: DataFrame, path: str, *,
                     key_col: str = "user_id",
                     state_col: str = "event_type",
                     time_col: str = "ts",
                     seq_col: str = "event_id",
                     batch: str = "base") -> None:
    """Collapse the changelog to change rows and persist them. A base
    build clears stale batch partitions first; a non-base build is an
    incremental write and rides the SAME event-time-partitioning
    enforcement as ``append_scd2_index`` — an overlapping batch must
    raise on every write path, or a build-instead-of-append call
    silently corrupts the served history (ADVICE r8)."""
    from kafana_spark.ann_index import _clear_batched_dir

    if batch == "base":
        _clear_batched_dir(f"{path}/{CHANGES_DIR}")
        _clear_batched_dir(f"{path}/{MANIFEST_DIR}")
    else:
        mn0, mx0 = _batch_span(df, time_col, seq_col)
        _enforce_event_time_partitioning(df.sparkSession, path, batch,
                                         mn0, mx0)
    ev_ops.scd2_changes(df, key_col, state_col, time_col, seq_col) \
        .write.mode("overwrite") \
        .parquet(f"{path}/{CHANGES_DIR}/batch={batch}")
    mn, mx = _batch_span(df, time_col, seq_col)
    _write_manifest(df.sparkSession, path, batch, mn, mx)


def append_scd2_index(df_new: DataFrame, path: str, batch: str, *,
                      key_col: str = "user_id",
                      state_col: str = "event_type",
                      time_col: str = "ts",
                      seq_col: str = "event_id") -> None:
    """Fold a new EVENT-TIME-later batch into the index: one collapse
    over only the new rows (no base re-read). A redelivered batch id
    replaces its own partition. The event-time-partitioning contract
    is ENFORCED from the stored batch-span manifest — an out-of-order
    or overlapping batch raises instead of silently corrupting the
    served history (the merge law does not hold for it)."""
    spark = df_new.sparkSession
    mn, mx = _batch_span(df_new, time_col, seq_col)
    _enforce_event_time_partitioning(spark, path, batch, mn, mx)
    ev_ops.scd2_changes(df_new, key_col, state_col, time_col,
                        seq_col) \
        .write.mode("overwrite") \
        .parquet(f"{path}/{CHANGES_DIR}/batch={batch}")
    _write_manifest(spark, path, batch, mn, mx)


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
