"""As-of join + batch sessionization unit semantics.

Pinned behaviors:
- backward as-of matches at-or-before (a right row at the exact same
  timestamp IS matched);
- left rows with no preceding right row get null;
- carried values come from the latest preceding right row per key,
  never across keys;
- session_window merges at diff == gap and splits strictly above it
  (matches the gaps-and-islands oracle's `> gap` break rule).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafana_spark.operators.asof import asof_join, sessionize_batch


def ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def make(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_backward_basic(spark):
    left = make(spark, [(1, "u", ts(10)), (2, "u", ts(30))],
                ["event_id", "user_id", "ts"])
    right = make(spark, [("u", ts(5), 1.0), ("u", ts(20), 2.0)],
                 ["user_id", "ts", "v"])
    out = {r.event_id: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, on="user_id",
                              value_cols=("v",)).collect()}
    assert out[1] == (ts(5), 1.0)
    assert out[2] == (ts(20), 2.0)


def test_asof_simultaneous_right_is_matched(spark):
    left = make(spark, [(1, "u", ts(10))], ["event_id", "user_id", "ts"])
    right = make(spark, [("u", ts(10), 9.0)], ["user_id", "ts", "v"])
    row = asof_join(left, right, on="user_id", value_cols=("v",)).first()
    assert row.asof_ts == ts(10) and row.asof_v == 9.0


def test_asof_no_prior_right_is_null(spark):
    left = make(spark, [(1, "u", ts(1))], ["event_id", "user_id", "ts"])
    right = make(spark, [("u", ts(2), 1.0)], ["user_id", "ts", "v"])
    row = asof_join(left, right, on="user_id", value_cols=("v",)).first()
    assert row.asof_ts is None and row.asof_v is None


def test_asof_keys_do_not_leak(spark):
    left = make(spark, [(1, "a", ts(10))], ["event_id", "user_id", "ts"])
    right = make(spark, [("b", ts(5), 1.0)], ["user_id", "ts", "v"])
    row = asof_join(left, right, on="user_id", value_cols=("v",)).first()
    assert row.asof_ts is None


def test_asof_plan_is_single_shuffle_window_not_range_join(spark):
    """The whole point: one shuffle on the key + window, not a
    left×right range join."""
    left = make(spark, [(1, "u", ts(10))], ["event_id", "user_id", "ts"])
    right = make(spark, [("u", ts(5), 1.0)], ["user_id", "ts", "v"])
    plan = (asof_join(left, right, on="user_id", value_cols=("v",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan  # union + window only
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_sessionize_boundary_merges_at_gap(spark):
    df = make(spark, [(7, ts(0)), (7, ts(30)), (7, ts(60.001))],
              ["user_id", "ts"])
    out = sessionize_batch(df, "30 minutes").collect()
    # 0→30 merges (diff == gap), 60.001 splits (diff > gap)
    assert sorted(r.events for r in out) == [1, 2]


def test_sessionize_matches_streaming_twin_semantics(spark):
    """Batch sessionize_batch and streaming sessionize share the
    session_window operator; session boundaries must agree."""
    from kafana_spark.streaming.pipeline import sessionize

    rows = [("u", ts(m)) for m in (0, 5, 10, 120, 125)]
    df = make(spark, rows, ["key", "timestamp"])
    stream_style = {(r.key, r.session_start, r.events)
                    for r in sessionize(df, gap="30 minutes").collect()}
    batch_style = {("u", ts(0), 3), ("u", ts(120), 2)}
    assert stream_style == batch_style


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after each left row."""
    left = make(spark, [(1, "u", ts(10)), (2, "u", ts(30))],
                ["event_id", "user_id", "ts"])
    right = make(spark, [("u", ts(10), 1.0), ("u", ts(20), 2.0),
                         ("u", ts(40), 3.0)],
                 ["user_id", "ts", "v"])
    out = {r.event_id: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, on="user_id",
                              value_cols=("v",),
                              direction="forward").collect()}
    assert out[1] == (ts(10), 1.0)   # simultaneous matches
    assert out[2] == (ts(40), 3.0)   # next at-or-after

    # no right row after → null
    late = make(spark, [(3, "u", ts(99))], ["event_id", "user_id", "ts"])
    row = asof_join(late, right, on="user_id", value_cols=("v",),
                    direction="forward").first()
    assert row.asof_ts is None
