"""Event-analytics family (x181–x187) + Rocchio classifier (x188)
closed-form semantics.

Pinned behaviors:
- funnel: steps must occur STRICTLY after the previous step's
  first-touch timestamp (an earlier click never converts a later
  view); off-funnel event types are ignored; conversions are bp.
- retention: cohort = epoch-week of first event; a user is retained
  in every week-offset with activity; offset 0 holds the cohort.
- session_stats: aggregates the x15 sessionization (gap > 30 min
  splits).
- transitions: (ts, event_id) total order; row-normalized bp.
- rolling_active: WAU counts a user once per trailing window; days
  not observed as event days are not emitted.
- rfm: integer-cent monetary; quartile via the distinct-value-group
  percentile rule — tied users share a quartile.
- error_spike: only hours with a fully-observed trailing-24h grid
  are scored; spike_bp = 10000 ⇔ exactly the trailing mean.
- rocchio: sign-safe truncating centroid division; argmax ties break
  to the smallest label.
"""

from __future__ import annotations

import datetime as dt

from kafana_spark.operators import events as ev
from kafana_spark.operators.similarity import rocchio_confusion

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def make(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, e, v) for i, (t, u, e, v) in enumerate(rows)], COLS)


def test_funnel_requires_strict_order(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(1), 1, "click", 1.0),
        (ts(2), 1, "purchase", 1.0),          # u1: full funnel
        (ts(0), 2, "click", 1.0), (ts(1), 2, "view", 1.0),
        # u2: click BEFORE view → stops at view
        (ts(0), 3, "view", 1.0), (ts(1), 3, "click", 1.0),
        # u3: view+click, no purchase
        (ts(0), 4, "purchase", 1.0),          # u4: never viewed
        (ts(0), 5, "error", 1.0),             # off-funnel only
    ]
    out = {r.step: r for r in ev.funnel(
        make(spark, rows), ("view", "click", "purchase")).collect()}
    assert out["view"].n_users == 3
    assert out["click"].n_users == 2
    assert out["purchase"].n_users == 1
    assert out["view"].conv_prev_bp == 10000
    assert out["click"].conv_prev_bp == 2 * 10000 // 3
    assert out["purchase"].conv_prev_bp == 5000
    assert out["purchase"].conv_first_bp == 10000 // 3


def test_funnel_same_timestamp_does_not_convert(spark):
    rows = [(ts(0), 1, "view", 1.0), (ts(0), 1, "click", 1.0)]
    out = {r.step: r.n_users for r in ev.funnel(
        make(spark, rows), ("view", "click")).collect()}
    assert out == {"view": 1, "click": 0}


def test_retention_offsets_and_base(spark):
    day = 24 * 60
    rows = [
        (ts(0), 1, "view", 1.0), (ts(8 * day), 1, "view", 1.0),
        (ts(0), 2, "view", 1.0),
        (ts(1 * day), 3, "view", 1.0), (ts(2 * day), 3, "view", 1.0),
    ]
    out = {(r.cohort_week, r.week_offset): (r.n_users, r.retained_bp)
           for r in ev.retention_cohorts(make(spark, rows)).collect()}
    # all three users' first events land in the same epoch week
    cw = next(iter(out))[0]
    assert out[(cw, 0)] == (3, 10000)
    assert out[(cw, 1)] == (1, 3333)   # only u1 returns in week 1
    assert len(out) == 2


def test_session_stats_shape(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(10), 1, "view", 1.0),
        (ts(120), 1, "view", 1.0),       # 2 sessions for u1
        (ts(0), 2, "view", 1.0),         # 1 single-event session
    ]
    r = ev.session_stats(make(spark, rows)).collect()[0]
    assert r.n_sessions == 3
    assert r.n_single == 2
    assert r.events_per_session_bp == 4 * 10000 // 3
    assert r.max_dur_us == 10 * 60 * 1_000_000


def test_transitions_row_normalized(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(1), 1, "click", 1.0),
        (ts(2), 1, "view", 1.0), (ts(3), 1, "view", 1.0),
        (ts(0), 2, "view", 1.0), (ts(1), 2, "click", 1.0),
    ]
    out = {(r.src, r.dst): (r.n, r.prob_bp)
           for r in ev.event_transitions(make(spark, rows)).collect()}
    # view → click twice, view → view once; click → view once
    assert out[("view", "click")] == (2, 6666)
    assert out[("view", "view")] == (1, 3333)
    assert out[("click", "view")] == (1, 10000)


def test_rolling_active_window_and_grid(spark):
    day = 24 * 60
    rows = [
        (ts(0), 1, "view", 1.0),
        (ts(2 * day), 2, "view", 1.0),
        (ts(9 * day), 1, "view", 1.0),
    ]
    out = {r.day: (r.dau, r.wau, r.stickiness_bp)
           for r in ev.rolling_active(make(spark, rows), 7).collect()}
    d0 = min(out)
    # only observed days are emitted
    assert set(out) == {d0, d0 + 2, d0 + 9}
    assert out[d0] == (1, 1, 10000)
    assert out[d0 + 2] == (1, 2, 5000)     # u1 still in the window
    assert out[d0 + 9] == (1, 1, 10000)    # d0+2 aged out


def test_rfm_quartiles_deterministic(spark):
    # 4 users, strictly increasing frequency/monetary, same recency
    rows = []
    for u in range(1, 5):
        for i in range(u):
            rows.append((ts(i), u, "purchase", 10.0 * u))
    out = {(r.r_q, r.f_q, r.m_q): (r.n_users, r.monetary_cents)
           for r in ev.rfm_segments(make(spark, rows)).collect()}
    # freq/monetary quartiles are 1..4 in user order; recency all ties
    # → one distinct-value group → every user shares recency quartile 1
    assert out[(1, 1, 1)] == (1, 1000)
    assert out[(1, 4, 4)] == (1, 4 * 4 * 1000)
    assert {k[0] for k in out} == {1}
    assert sum(n for n, _ in out.values()) == 4


def test_error_spike_full_window_only(spark):
    rows = []
    eid = 0
    # 30 consecutive hours with 1 error each, then 1 hour with 10
    for h in range(30):
        rows.append((ts(h * 60), 1, "error", 1.0))
    rows.append((ts(30 * 60), 1, "error", 1.0))
    for _ in range(9):
        rows.append((ts(30 * 60 + 1), 1, "error", 1.0))
    out = {r.hour: r for r in ev.error_spike(
        make(spark, rows), trail_hours=24, top_k=50).collect()}
    hours = sorted(out)
    # first 24 hours can never have a full trailing day
    assert len(hours) == 31 - 24
    spike = out[max(hours)]
    assert spike.n_err == 10
    assert spike.trail == 24
    assert spike.spike_bp == 10 * 10000
    flat = out[min(hours)]
    assert flat.spike_bp == 10000     # exactly the trailing mean


def test_rocchio_ties_break_to_smallest_label(spark):
    # train: two classes with opposite-sign 2-dim-ish centroids in a
    # 4-dim space; test vector equidistant → tie → label 0 wins
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0), (2, [1.0, 0.0, 0.0, 0.0], 0),
        (4, [0.0, 1.0, 0.0, 0.0], 1), (5, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [1.0, 1.0, 0.0, 0.0], 1),   # held out (3 % 3 == 0)
        (6, [1.0, 0.0, 0.0, 0.0], 0),   # held out, clearly class 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {(r.true_label, r.pred_label): r.n
           for r in rocchio_confusion(df, train_mod=3).collect()}
    assert out[(1, 0)] == 1     # the tie goes to label 0
    assert out[(0, 0)] == 1


def test_rocchio_centroid_truncates_toward_zero(spark):
    # class 0 sum = -1 over n=2 → centroid -0 (trunc), not -1 (floor)
    rows = [
        (1, [-1.0, 0.0], 0), (2, [0.0, 0.0], 0),
        (4, [-1.0, 0.0], 1), (5, [-1.0, 0.0], 1),
        (3, [-1.0, 0.0], 0),   # held out
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {(r.true_label, r.pred_label): r.n
           for r in rocchio_confusion(df, train_mod=3).collect()}
    # class-0 centroid dim0 = trunc(-1e6/2) = -500000; class 1 = -1e6.
    # test vec [-1,0] scores 5e11 vs 1e12 → class 1 wins on magnitude
    assert out == {(0, 1): 1}


def test_funnel_latency_matches_stage_chain(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(5), 1, "click", 1.0),
        (ts(10), 1, "purchase", 1.0),
        (ts(0), 2, "view", 1.0), (ts(1), 2, "click", 1.0),
        (ts(31), 2, "purchase", 1.0),
        (ts(0), 3, "view", 1.0),   # never converts
    ]
    r = ev.funnel_latency(make(spark, rows),
                          ("view", "click", "purchase")).collect()[0]
    assert r.n_converted == 2
    assert r.max_us == 31 * 60 * 1_000_000
    # mean of 10 and 31 minutes, integer-floored
    assert r.mean_us == (10 + 31) * 60 * 1_000_000 // 2


def test_acf_perfect_alternation(spark):
    # daily counts 2,1,2,1,... → r(1) = -10000, r(2) = +10000
    day = 24 * 60
    rows = []
    for d in range(10):
        rows.append((ts(d * day), 1, "view", 1.0))
        if d % 2 == 0:
            rows.append((ts(d * day + 1), 2, "view", 1.0))
    out = {r.lag: r.r_bp for r in ev.acf(make(spark, rows), 3).collect()}
    assert out[1] == -10000
    assert out[2] == 10000
    assert out[3] == -10000


def test_acf_constant_series_is_zero(spark):
    day = 24 * 60
    rows = [(ts(d * day), 1, "view", 1.0) for d in range(6)]
    out = {r.lag: r.r_bp for r in ev.acf(make(spark, rows), 2).collect()}
    assert out == {1: 0, 2: 0}


def test_dow_profile_flat_and_skewed(spark):
    day = 24 * 60
    # 14 days, one event per day except dow of day 0 gets doubled
    rows = []
    eid = 0
    for d in range(14):
        rows.append((ts(d * day), 1, "view", 1.0))
    rows.append((ts(1), 2, "view", 1.0))          # extra on day 0
    rows.append((ts(7 * day + 1), 2, "view", 1.0))  # extra on day 7
    out = {r.dow: r for r in ev.dow_profile(make(spark, rows)).collect()}
    assert len(out) == 7
    d0 = min(r.dow for r in out.values()
             if r.total == 4)
    assert out[d0].n_days == 2 and out[d0].total == 4
    # idx = 4·14·10000 // (2·16) = 17500
    assert out[d0].idx_bp == 17500
    flat = [r for r in out.values() if r.total == 2]
    assert all(r.idx_bp == 2 * 14 * 10000 // (2 * 16) for r in flat)


def test_forecast_backtest_weekly_series(spark):
    day = 24 * 60
    # strict weekly pattern over 3 weeks: seasonal-naive is perfect
    rows = []
    for d in range(21):
        n = 1 + (d % 7 == 0)     # 2 events on week starts
        for i in range(n):
            rows.append((ts(d * day + i), 1, "view", 1.0))
    out = {r.model: r for r in
           ev.forecast_backtest(make(spark, rows), 7).collect()}
    assert out["seasonal7"].sum_abs_err == 0
    assert out["seasonal7"].wape_bp == 0
    assert out["seasonal7"].n_days == 14
    assert out["naive1"].sum_abs_err > 0
    assert out["naive1"].n_days == 20


def test_bot_flags_regular_vs_bursty(spark):
    rows = []
    # u1: perfectly regular 30s gaps × 25 → disp 0, median 30 → bot
    for i in range(26):
        rows.append((ts(i * 0.5), 1, "view", 1.0))
    # u2: bursty human — alternating 1 min / 120 min gaps
    t = 0.0
    for i in range(21):
        rows.append((ts(t), 2, "view", 1.0))
        t += 1 if i % 2 == 0 else 120
    out = {r.k: r for r in ev.bot_flags(
        make(spark, rows), bot_median_s=20, min_gaps=20,
        max_disp_bp=500).collect()}
    assert out[1].n_gaps == 25
    assert out[1].disp_bp == 0
    assert out[1].is_bot            # too regular
    assert out[2].disp_bp > 500
    assert not out[2].is_bot


def test_bot_flags_fast_median(spark):
    # median gap 2 s < 60 → bot regardless of dispersion
    import random
    rnd = random.Random(7)
    rows = []
    t = 0.0
    for _ in range(30):
        rows.append((ts(t), 3, "click", 1.0))
        t += rnd.choice([1, 2, 3]) / 60       # 1-3 s gaps
    out = {r.k: r for r in ev.bot_flags(make(spark, rows)).collect()}
    assert out[3].median_gap_s < 60
    assert out[3].is_bot


def test_funnel_trend_attributes_to_entry_week(spark):
    day = 24 * 60
    rows = [
        # u1 enters week 0, converts in week 2
        (ts(0), 1, "view", 1.0), (ts(1), 1, "click", 1.0),
        (ts(15 * day), 1, "purchase", 1.0),
        # u2 enters week 0, never converts
        (ts(1 * day), 2, "view", 1.0),
        # u3 enters week 1, converts same week
        (ts(8 * day), 3, "view", 1.0), (ts(8 * day + 1), 3, "click", 1.0),
        (ts(8 * day + 2), 3, "purchase", 1.0),
    ]
    out = {r.week: (r.n_entered, r.n_converted, r.conv_bp)
           for r in ev.funnel_trend(
               make(spark, rows), ("view", "click", "purchase")).collect()}
    w0 = min(out)
    assert out[w0] == (2, 1, 5000)      # u1 counted in ENTRY week
    assert out[w0 + 1] == (1, 1, 10000)


def test_session_paths_respect_session_boundaries(spark):
    rows = [
        # one session: view>click>purchase and click>purchase>view
        (ts(0), 1, "view", 1.0), (ts(1), 1, "click", 1.0),
        (ts(2), 1, "purchase", 1.0), (ts(3), 1, "view", 1.0),
        # a >30min gap: the next triple is its OWN session
        (ts(60), 1, "view", 1.0), (ts(61), 1, "click", 1.0),
        (ts(62), 1, "purchase", 1.0),
    ]
    out = {r.path: r.n for r in ev.session_paths(
        make(spark, rows), "30 minutes", 3, 10).collect()}
    assert out["view>click>purchase"] == 2
    # no path spans the gap (e.g. purchase>view>view is absent)
    assert "purchase>view>view" not in out
    assert sum(out.values()) == 3


def test_revenue_cohorts_payback_curve(spark):
    day = 24 * 60
    rows = [
        (ts(0), 1, "purchase", 10.00),
        (ts(8 * day), 1, "purchase", 5.00),     # week 1 revenue
        (ts(1 * day), 2, "purchase", 20.00),    # same cohort, week 0
    ]
    out = {(r.cohort_week, r.week_offset): (r.revenue_cents, r.rev_bp)
           for r in ev.revenue_cohorts(make(spark, rows)).collect()}
    cw = min(k[0] for k in out)
    assert out[(cw, 0)] == (3000, 10000)
    assert out[(cw, 1)] == (500, 500 * 10000 // 3000)


def test_session_cooccurrence_lift(spark):
    rows = [
        # session 1 (u1): view+click together
        (ts(0), 1, "view", 1.0), (ts(1), 1, "click", 1.0),
        # session 2 (u1, after gap): view alone
        (ts(60), 1, "view", 1.0),
        # session 3 (u2): click alone
        (ts(0), 2, "click", 1.0),
        # session 4 (u3): view+click again
        (ts(0), 3, "view", 1.0), (ts(1), 3, "click", 1.0),
    ]
    out = {(r.type_a, r.type_b): (r.n_both, r.lift_bp)
           for r in ev.session_cooccurrence(
               make(spark, rows), "30 minutes").collect()}
    # 4 sessions; view in 3, click in 3, both in 2
    # lift = 2*4*10000 // (3*3) = 8888
    assert out[("click", "view")] == (2, 8888)
    assert len(out) == 1


def test_metric_alerts_relative_threshold(spark):
    rows = []
    # 10 hours of 'error': nine quiet hours (1/hr), one burst (11)
    for h in range(9):
        rows.append((ts(h * 60), 1, "error", 1.0))
    for i in range(11):
        rows.append((ts(9 * 60 + i), 1, "error", 1.0))
    out = [r for r in ev.metric_alerts(
        make(spark, rows), (("r1", "error", 15000),)).collect()]
    # mean = 2/hr; only the 11-count hour reaches 1.5x mean
    assert len(out) == 1
    assert out[0].observed == 11
    assert out[0].mean_x100 == 200


# ------------------------------------------------------------ plans

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_retention_base_join_is_broadcast(spark):
    from kafana_spark.sources.tables import load_table
    from kafana_spark.session import tune_session
    from tests.conftest import SF_SMOKE

    tune_session(spark)
    d = load_table(spark, SF_SMOKE, "events")
    plan = _plan(ev.retention_cohorts(d))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rolling_active_grid_semi_join_is_broadcast(spark):
    from kafana_spark.sources.tables import load_table
    from kafana_spark.session import tune_session
    from tests.conftest import SF_SMOKE

    tune_session(spark)
    d = load_table(spark, SF_SMOKE, "events")
    plan = _plan(ev.rolling_active(d))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_error_spike_window_is_range_frame_over_hour_series(spark):
    from kafana_spark.sources.tables import load_table
    from kafana_spark.session import tune_session
    from tests.conftest import SF_SMOKE

    tune_session(spark)
    d = load_table(spark, SF_SMOKE, "events")
    plan = _plan(ev.error_spike(d))
    # RANGE frame (clock-window semantics), computed AFTER the
    # hour-grid aggregate — the window input is the aggregated series
    assert "RangeFrame" in plan or "RANGE BETWEEN" in plan
    assert "HashAggregate" in plan


def test_funnel_pushes_step_filter_to_scan(spark):
    from kafana_spark.sources.tables import load_table
    from kafana_spark.session import tune_session
    from tests.conftest import SF_SMOKE

    tune_session(spark)
    d = load_table(spark, SF_SMOKE, "events")
    plan = _plan(ev.funnel(d, ("view", "click", "purchase")))
    # each stage's event_type equality reaches the parquet scan
    assert "PushedFilters" in plan
    assert "view" in plan


# ------------------------------------------------- x206-x211 family

def test_growth_accounting_classifies_and_churns(spark):
    day = 24 * 60
    rows = [
        # u1: active weeks 0,1,2 (retained twice)
        (ts(0), 1, "view", 1.0), (ts(7 * day), 1, "view", 1.0),
        (ts(14 * day), 1, "view", 1.0),
        # u2: active week 0 only -> churns into week 1
        (ts(1 * day), 2, "view", 1.0),
        # u3: active weeks 0 and 2 -> resurrected in week 2
        (ts(2 * day), 3, "view", 1.0), (ts(15 * day), 3, "view", 1.0),
    ]
    out = {r.week: r for r in ev.growth_accounting(
        make(spark, rows)).collect()}
    w0 = min(out)
    assert (out[w0].n_new, out[w0].n_churned) == (3, 0)
    w1, w2 = w0 + 1, w0 + 2
    assert (out[w1].n_active, out[w1].n_retained) == (1, 1)
    assert out[w1].n_churned == 2          # u2 and u3 went silent
    assert out[w1].quick_bp == 0           # no inflow, churn 2
    assert (out[w2].n_retained, out[w2].n_resurrected) == (1, 1)
    assert out[w2].n_churned == 0
    assert out[w2].quick_bp == 0           # churn 0 -> guarded


def test_power_user_curve_cumulative_from_top(spark):
    day = 24 * 60
    rows = [
        (ts(0), 1, "view", 1.0), (ts(day), 1, "view", 1.0),
        (ts(2 * day), 1, "view", 1.0),     # u1: 3 days
        (ts(0), 2, "view", 1.0),           # u2: 1 day
        (ts(0), 3, "view", 1.0),           # u3: 1 day
    ]
    out = ev.power_user_curve(make(spark, rows)).collect()
    assert [(r.active_days, r.n_users) for r in out] == [(3, 1), (1, 2)]
    assert out[0].share_bp == 3333
    assert out[0].cum_share_bp == 3333
    assert out[1].cum_share_bp == 10000


def test_last_touch_credits_recent_touch_within_lookback(spark):
    day = 24 * 60
    rows = [
        (ts(0), 1, "view", 0.0), (ts(1), 1, "click", 0.0),
        (ts(2), 1, "purchase", 10.0),     # credited to click (latest)
        (ts(0), 2, "view", 0.0),
        (ts(5 * day), 2, "purchase", 20.0),  # view too old -> direct
        (ts(0), 3, "purchase", 30.0),        # no touch -> direct
    ]
    out = {r.channel: r for r in ev.last_touch_attribution(
        make(spark, rows)).collect()}
    assert out["click"].revenue_cents == 1000
    assert out["direct"].revenue_cents == 5000
    assert out["direct"].n_conv == 2
    assert "view" not in out
    assert out["click"].revenue_share_bp == 1000 * 10000 // 6000


def test_last_touch_same_ts_not_credited(spark):
    # the touch must STRICTLY precede in (ts, event_id) order; a touch
    # row AFTER the purchase at the same ts gets a higher event_id and
    # must not be credited
    rows = [(ts(0), 1, "purchase", 10.0), (ts(0), 1, "click", 0.0)]
    out = {r.channel: r.n_conv for r in ev.last_touch_attribution(
        make(spark, rows)).collect()}
    assert out == {"direct": 1}


def test_mad_anomalies_flags_outlier_not_mean_shift(spark):
    day = 24 * 60
    # counts 3,4,5,3,4,5 then a 40-spike: med2 = 8, the spike's
    # dev2 = 72, mad2 = 4 -> z = 180000 bp; normal days z <= 5000
    rows = []
    for d, c in enumerate((3, 4, 5, 3, 4, 5, 40)):
        rows += [(ts(d * day + i), 1 + i, "view", 1.0)
                 for i in range(c)]
    out = {r.day: r for r in ev.mad_anomalies(
        make(spark, rows)).collect()}
    flags = sorted(d for d, r in out.items() if r.is_anomaly)
    assert len(flags) == 1
    spike = out[flags[0]]
    assert (spike.c, spike.dev2, spike.z_bp) == (40, 72, 180000)
    assert max(r.z_bp for d, r in out.items() if d != flags[0]) == 5000


def test_mad_constant_series_has_no_anomalies(spark):
    day = 24 * 60
    rows = [(ts(d * day), 1, "view", 1.0) for d in range(5)]
    out = ev.mad_anomalies(make(spark, rows)).collect()
    assert all(not r.is_anomaly and r.z_bp == 0 for r in out)


def test_cusum_peaks_at_level_shift(spark):
    day = 24 * 60
    # 3 days at 2/day then 3 days at 10/day -> shift after day 2
    rows = []
    for d in range(3):
        rows += [(ts(d * day + i), 1, "view", 1.0) for i in range(2)]
    for d in range(3, 6):
        rows += [(ts(d * day + i), 1, "view", 1.0) for i in range(10)]
    out = ev.cusum_changepoint(make(spark, rows)).collect()
    peaks = [r for r in out if r.is_peak]
    assert len(peaks) == 1
    days = sorted(r.day for r in out)
    assert peaks[0].day == days[2]        # last low day = the shift
    # cusum = D*prefix - idx*T; day2: 6*6 - 3*36 = -72
    assert peaks[0].cusum == -72


def test_purchase_intervals_summary(spark):
    rows = [
        (ts(0), 1, "purchase", 1.0), (ts(10), 1, "purchase", 1.0),
        (ts(30), 1, "purchase", 1.0),     # u1: gaps 10min, 20min
        (ts(0), 2, "purchase", 1.0),      # u2: single buyer
        (ts(0), 3, "view", 1.0),          # not a buyer
    ]
    r = ev.purchase_intervals(make(spark, rows)).collect()[0]
    assert (r.n_buyers, r.n_repeat) == (2, 1)
    assert r.repeat_bp == 5000
    assert r.n_gaps == 2
    assert r.med2_gap_us == 2 * 15 * 60 * 1_000_000  # median 15 min
    assert r.mean_gap_us == 15 * 60 * 1_000_000


def test_purchase_intervals_no_repeats_guarded(spark):
    rows = [(ts(0), 1, "purchase", 1.0)]
    r = ev.purchase_intervals(make(spark, rows)).collect()[0]
    assert (r.n_buyers, r.n_repeat, r.repeat_bp) == (1, 0, 0)
    assert (r.n_gaps, r.med2_gap_us, r.mean_gap_us) == (0, 0, 0)


def test_landing_bounce_first_event_and_single_sessions(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(5), 1, "click", 1.0),
        # u1 session 2 (90 min later): single purchase -> bounce
        (ts(95), 1, "purchase", 1.0),
        (ts(0), 2, "view", 1.0),           # u2: single view -> bounce
    ]
    out = {r.landing: r for r in ev.landing_bounce(
        make(spark, rows)).collect()}
    assert out["view"].n_sessions == 2
    assert out["view"].n_bounces == 1          # u2's only
    assert out["view"].bounce_bp == 5000
    assert out["purchase"].n_sessions == 1
    assert out["purchase"].bounce_bp == 10000
    assert out["view"].share_bp == 6666        # 2 of 3 sessions


def test_conversion_latency_strictly_after_first_signup(spark):
    rows = [
        (ts(0), 1, "signup", 1.0), (ts(30), 1, "purchase", 1.0),
        (ts(60), 1, "purchase", 1.0),   # later buys don't count
        (ts(10), 2, "signup", 1.0),     # never converts
        (ts(0), 3, "purchase", 1.0), (ts(5), 3, "signup", 1.0),
        # u3: purchase BEFORE signup -> not converted
    ]
    r = ev.conversion_latency(make(spark, rows)).collect()[0]
    assert (r.n_from, r.n_converted) == (3, 1)
    assert r.conv_bp == 3333
    assert r.med2_lat_us == 2 * 30 * 60 * 1_000_000
    assert r.mean_lat_us == 30 * 60 * 1_000_000


def test_scd2_dim_collapses_runs_and_versions(spark):
    rows = [
        (ts(0), 1, "view", 1.0), (ts(1), 1, "view", 1.0),
        (ts(2), 1, "click", 1.0), (ts(3), 1, "view", 1.0),
        (ts(0), 2, "signup", 1.0),
    ]
    out = ev.scd2_dim(make(spark, rows)).collect()
    u1 = [r for r in out if r.user_id == 1]
    assert [(r.state, r.version, r.is_current) for r in u1] == [
        ("view", 1, 0), ("click", 2, 0), ("view", 3, 1)]
    # intervals tile: each valid_to == next valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    assert u1[2].valid_to is None
    u2 = [r for r in out if r.user_id == 2]
    assert [(r.state, r.version, r.is_current) for r in u2] == [
        ("signup", 1, 1)]


def test_scd2_dim_same_ts_tiebreak_by_seq(spark):
    # two changes at the identical timestamp: event_id orders them;
    # the first gets an EMPTY [ts, ts) interval
    rows = [
        (ts(0), 1, "view", 1.0),
        (ts(5), 1, "click", 1.0), (ts(5), 1, "error", 1.0),
    ]
    out = ev.scd2_dim(make(spark, rows)).collect()
    assert [r.state for r in out] == ["view", "click", "error"]
    assert out[1].valid_from == out[1].valid_to  # empty interval


def test_scd2_state_at_half_open_lookup(spark):
    rows = [
        (ts(0), 1, "view", 1.0),
        (ts(10), 1, "purchase", 1.0),   # probe AND change at ts=10
        (ts(20), 1, "click", 1.0),
        (ts(30), 1, "purchase", 1.0),   # probe: state flips again
    ]
    out = {r.event_id: r for r in ev.scd2_state_at(
        make(spark, rows)).collect()}
    assert len(out) == 2
    # a change landing at the probe's own ts IS visible
    assert out[1].state_at == "purchase"
    assert out[1].state_version == 2
    assert out[3].state_at == "purchase"
    assert out[3].state_version == 4


def test_trend_fit_exact_line_and_zero_densify(spark):
    # type "a": y = 2x over days 0..2 -> slope 2e6, intercept 0, R2 1
    # type "b": only day 0 fires; days 1,2 are DENSIFIED zeros
    day = 24 * 60.0
    rows = [
        (ts(0 * day), 1, "a", 1.0), (ts(0 * day), 2, "a", 1.0),
        (ts(1 * day), 1, "a", 1.0), (ts(1 * day), 2, "a", 1.0),
        (ts(1 * day), 3, "a", 1.0), (ts(1 * day), 4, "a", 1.0),
        (ts(2 * day), 1, "a", 1.0), (ts(2 * day), 2, "a", 1.0),
        (ts(2 * day), 3, "a", 1.0), (ts(2 * day), 4, "a", 1.0),
        (ts(2 * day), 5, "a", 1.0), (ts(2 * day), 6, "a", 1.0),
        (ts(0 * day), 9, "b", 1.0),
    ]
    out = {r.t: r for r in ev.trend_fit(make(spark, rows)).collect()}
    a = out["a"]
    assert (a.n_days, a.sum_y) == (3, 12)
    assert a.slope_u == 2_000_000
    assert a.intercept_u == 2_000_000
    assert a.r2_bp == 10000
    b = out["b"]
    assert (b.n_days, b.sum_y) == (3, 1)   # global spine densifies
    assert b.slope_u < 0                   # 1,0,0 trends down
