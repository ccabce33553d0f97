"""As-of join and batch sessionization — time-series operators Spark
lacks natively (SURVEY.md §2.D lists them absent from the reference and
from stock Spark; both are staples of event-log analytics).

Both are implemented as single-shuffle plans:

- ``asof_join``: the sort-merge formulation — union the two sides,
  one window pass per key carries the last right-side value forward.
  One shuffle on the join key, O(n log n) per key; never the
  O(left × right) range-join explosion of the naive formulation (which
  is exactly what the DuckDB oracle runs, being correct-but-small).
- ``sessionize_batch``: ``session_window`` groupBy — the same operator
  the streaming path uses (streaming/pipeline.py:sessionize), so batch
  backfill and live sessionization share semantics by construction.

Session-window boundary semantics (pinned by test): an event exactly
``gap`` after the previous one still MERGES into the session; a new
session starts only when the difference exceeds the gap strictly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: tuple[str, ...] = (),
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    its timestamp (per key). Returns all left columns plus
    ``asof_ts`` (right row's event time) and the requested
    ``value_cols`` (prefixed ``asof_``), null when no right row
    precedes.

    ``direction='backward'`` (the pandas ``merge_asof`` default)
    matches the latest right row at-or-before; ``'forward'`` matches
    the earliest right row at-or-after — same single-shuffle plan with
    the window order reversed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = (right.select(F.col(on),
                             F.col(right_ts).alias("__rts"),
                             *[F.col(c) for c in value_cols])
                .withColumn("__side", F.lit(0)))

    # align schemas for the union: left keeps its columns, right's
    # carried values ride in __r_* slots that are null on left rows
    l_cols = left.columns
    lu = l_tagged.select(
        *l_cols, "__side",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols])
    ru = r_tagged.select(
        *[F.col(on).alias(c) if c == on else F.lit(None)
          .cast(left.schema[c].dataType).alias(c) for c in l_cols],
        "__side",
        F.col("__rts").alias("__ts"),
        F.col("__rts").alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])

    # right rows sort "inside" left rows at equal timestamps, so an
    # exactly-simultaneous right row IS matched in either direction.
    if direction == "backward":
        w = (Window.partitionBy(on).orderBy(F.col("__ts"), F.col("__side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(on).orderBy(F.col("__ts").desc(),
                                            F.col("__side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = lu.unionByName(ru)
    out = out.withColumn("asof_ts", F.last("__r_ts", ignorenulls=True).over(w))
    for c in value_cols:
        out = out.withColumn(f"asof_{c}",
                             F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (out.where(F.col("__side") == 1)
            .drop("__side", "__ts", "__r_ts",
                  *[f"__r_{c}" for c in value_cols]))


def sessionize_batch(df: DataFrame, gap: str = "30 minutes",
                     time_col: str = "ts",
                     key_col: str = "user_id") -> DataFrame:
    """Batch sessionization: one row per (key, session) with the session
    start (µs), event count, and duration (µs). Same session_window
    operator as the streaming path."""
    return (df.groupBy(F.session_window(F.col(time_col), gap).alias("sw"),
                       F.col(key_col))
            .agg(F.count(F.lit(1)).alias("events"),
                 F.min(F.unix_micros(F.col(time_col))).alias("start_us"),
                 F.max(F.unix_micros(F.col(time_col))).alias("end_us"))
            .select(key_col, "start_us",
                    (F.col("end_us") - F.col("start_us")).alias("dur_us"),
                    "events"))
