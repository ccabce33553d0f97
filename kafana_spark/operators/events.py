"""Event-stream product analytics over the ``events`` table — the
funnel / retention / path family every clickstream pipeline ships
(Kibana sits next to exactly this workload; the reference's changelog
topics are product-event shaped, /root/reference/kafana.http:63-95).

Every operator keeps its derived ratios in integer basis points
(``a * 10000 div b``) so the DuckDB oracle twins hash-match bit for
bit; timestamps are integer epoch microseconds (``unix_micros`` /
``epoch_us``) and calendar bucketing is plain integer division —
no timezone, no session-local calendar, identical in both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafana_spark.operators import asof

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _base(df: DataFrame, time_col: str, key_col: str,
          type_col: str) -> DataFrame:
    return df.select(F.col(key_col).alias("k"),
                     F.unix_micros(F.col(time_col)).alias("us"),
                     F.col(type_col).alias("t"))


def _funnel_stages(ev: DataFrame,
                   steps: tuple[str, ...]) -> list[DataFrame]:
    """The shared first-touch stage chain: stage i is one row per user
    who reached step i, carrying ``t0`` = the earliest qualifying
    timestamp (strictly after the previous stage's t0)."""
    stage = (ev.where(F.col("t") == steps[0])
             .groupBy("k").agg(F.min("us").alias("t0")))
    stages = [stage]
    for s in steps[1:]:
        stage = (ev.where(F.col("t") == s)
                 .join(stage.select("k", "t0"), "k")
                 .where(F.col("us") > F.col("t0"))
                 .groupBy("k").agg(F.min("us").alias("t0")))
        stages.append(stage)
    return stages


def funnel(df: DataFrame, steps: tuple[str, ...],
           time_col: str = "ts", key_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-step funnel conversion: a user is at step i iff they
    performed step i STRICTLY AFTER their step-(i-1) timestamp, with
    the earliest qualifying timestamp carried forward (the standard
    first-touch funnel; re-entries don't resurrect a dead funnel).

    Output: (step_idx, step, n_users, conv_prev_bp, conv_first_bp),
    one row per step; conversions are integer bp, step 0 = 10000.

    Scale: one filtered pass over events per step (event_type pushed
    to the scan), each stage a map-side-combinable MIN per user
    joined to the previous stage on the user key — the same shuffle
    partitioning reused stage to stage, so AQE coalesces the chain.
    The funnel frame itself is len(steps) rows; the window over it is
    bounded by the step count, not the data.
    """
    ev = _base(df, time_col, key_col, type_col)
    rows = []
    for i, (s, stage) in enumerate(zip(steps, _funnel_stages(ev, steps))):
        rows.append(stage.agg(F.count(F.lit(1)).alias("n_users"))
                    .select(F.lit(i).cast("int").alias("step_idx"),
                            F.lit(s).alias("step"), "n_users"))
    fun = reduce(DataFrame.unionByName, rows)
    w = Window.orderBy("step_idx")
    prev = F.lag("n_users").over(w)
    first = F.first("n_users").over(w)
    return (fun.withColumn("prev_n", prev).withColumn("first_n", first)
            .select("step_idx", "step", "n_users",
                    F.when(F.col("prev_n").isNull(), F.lit(10000))
                    .when(F.col("prev_n") > 0,
                          F.expr("n_users * 10000 div prev_n"))
                    .otherwise(F.lit(0))
                    .cast("long").alias("conv_prev_bp"),
                    F.when(F.col("step_idx") == 0, F.lit(10000))
                    .when(F.col("first_n") > 0,
                          F.expr("n_users * 10000 div first_n"))
                    .otherwise(F.lit(0))
                    .cast("long").alias("conv_first_bp"))
            .orderBy("step_idx"))


def retention_cohorts(df: DataFrame, week_days: int = 7,
                      time_col: str = "ts",
                      key_col: str = "user_id") -> DataFrame:
    """Cohort retention matrix: cohort = epoch-week of a user's FIRST
    event, week_offset = whole weeks since that first event; a user
    counts as retained in offset w iff they have any event in it.

    Output: (cohort_week, week_offset, n_users, retained_bp) where
    retained_bp is vs the cohort's offset-0 size (offset 0 always
    holds the whole cohort — the first event itself lands there).

    Scale: the corpus collapses to DISTINCT (user, day) immediately
    (the only event-cardinality shuffle), then to one row per (user,
    cohort, offset); the offset-0 base frame is one row per cohort —
    broadcast back. No windows over the corpus.
    """
    ud = (df.select(F.col(key_col).alias("k"),
                    F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                    .alias("day"))
          .distinct())
    first = ud.groupBy("k").agg(F.min("day").alias("d0"))
    act = (ud.join(first, "k")
           .select("k", F.expr(f"d0 div {week_days}").alias("cohort_week"),
                   F.expr(f"(day - d0) div {week_days}")
                   .alias("week_offset"))
           .distinct())
    counts = (act.groupBy("cohort_week", "week_offset")
              .agg(F.count(F.lit(1)).alias("n_users")))
    base = (counts.where(F.col("week_offset") == 0)
            .select("cohort_week", F.col("n_users").alias("base_n")))
    return (counts.join(F.broadcast(base), "cohort_week")
            .select("cohort_week", "week_offset", "n_users",
                    F.expr("n_users * 10000 div base_n")
                    .alias("retained_bp"))
            .orderBy("cohort_week", "week_offset"))


def session_stats(df: DataFrame, gap: str = "30 minutes",
                  pct_qs: tuple[float, ...] = (0.5, 0.95),
                  time_col: str = "ts",
                  key_col: str = "user_id") -> DataFrame:
    """One-row corpus summary of the sessionization output (x15's
    operator): session count, single-event-session count, mean events
    per session in bp, duration percentiles (exact, rounded to 4dp —
    the x17-proven percentile/quantile_cont parity), max duration.

    Scale: everything downstream of sessionize_batch is one global
    aggregate over the per-session frame (sessions ≪ events); the
    exact percentile is the only sort and runs on that frame.
    """
    s = asof.sessionize_batch(df, gap, time_col=time_col,
                              key_col=key_col)
    aggs = [F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("events") == 1).cast("long")).alias("n_single"),
            F.sum("events").alias("tot_events"),
            F.max("dur_us").alias("max_dur_us")]
    aggs += [F.round(F.percentile("dur_us", F.lit(q)), 4)
             .alias(f"p{int(q * 100)}_dur_us") for q in pct_qs]
    return (s.agg(*aggs)
            .select("n_sessions", "n_single",
                    F.expr("tot_events * 10000 div n_sessions")
                    .alias("events_per_session_bp"),
                    *[f"p{int(q * 100)}_dur_us" for q in pct_qs],
                    "max_dur_us"))


def event_transitions(df: DataFrame, time_col: str = "ts",
                      key_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (src, dst, n, prob_bp) where prob_bp is the row-
    normalized transition probability in bp. The per-user order is
    (ts, event_id) — a total order, so ties cannot flip the matrix.

    Scale: ONE window partitioned by user (each partition is that
    user's history — the natural clickstream partitioning), then a
    combinable count per (src, dst); the row-normalizing window runs
    over the |types|² aggregate, not the corpus.
    """
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("src"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    pairs = (ev.withColumn("dst", F.lead("src").over(w))
             .where(F.col("dst").isNotNull()))
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("src")
    return (counts.withColumn("src_total", F.sum("n").over(wt))
            .select("src", "dst", "n",
                    F.expr("n * 10000 div src_total").alias("prob_bp"))
            .orderBy("src", "dst"))


def rolling_active(df: DataFrame, window_days: int = 7,
                   time_col: str = "ts",
                   key_col: str = "user_id") -> DataFrame:
    """Daily active users + rolling-window active users (WAU for the
    default 7) + stickiness (DAU/WAU in bp) per observed day.

    A rolling DISTINCT count can't be summed from daily distincts, so
    each (user, day) row is fanned out to the ``window_days`` target
    days it keeps the user active in (a map-only explode of a
    constant-length sequence — never a range join), then one
    count-distinct per target day. Target days that aren't observed
    event days are dropped (broadcast semi-join against the day grid)
    so both engines report the same day set.

    Scale: the explode multiplies the DISTINCT (user, day) frame by
    window_days — bounded fan-out on the collapsed frame, not the
    event stream; the count-distinct shuffles (day, user) pairs once.
    """
    ud = (df.select(F.col(key_col).alias("k"),
                    F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                    .alias("day"))
          .distinct())
    return rolling_active_from_user_days(ud, window_days)


def rolling_active_from_user_days(ud: DataFrame,
                                  window_days: int = 7) -> DataFrame:
    """The rolling_active tail over a DISTINCT (k, day) frame — shared
    with the persisted event-rollup index (event_index.py), whose
    stored user-day rows serve this exact plan."""
    days = ud.select(F.col("day").alias("tday")).distinct()
    tgt = ud.select(
        "k", "day",
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + F.lit(window_days - 1))).alias("tday"))
    tgt = tgt.join(F.broadcast(days), "tday", "left_semi")
    return (tgt.groupBy("tday")
            .agg(F.countDistinct("k").alias("wau"),
                 F.countDistinct(
                     F.when(F.col("day") == F.col("tday"), F.col("k")))
                 .alias("dau"))
            .select(F.col("tday").alias("day"), "dau", "wau",
                    F.expr("dau * 10000 div wau").alias("stickiness_bp"))
            .orderBy("day"))


def rfm_segments(df: DataFrame, time_col: str = "ts",
                 key_col: str = "user_id",
                 value_col: str = "value") -> DataFrame:
    """RFM segmentation: per-user Recency (days since last event, vs
    the corpus max day), Frequency (event count), Monetary (sum of
    value in integer cents — floor(v·100 + 0.5) per event BEFORE the
    sum, so both engines add exact integers). Each metric is cut into
    quartiles by the distinct-value-group percentile rule (the
    x232/x257 ``group_quantiles`` discipline): pct_bp(v) =
    10000·cum_lt(v) div (n−1) where cum_lt counts users with a
    STRICTLY smaller metric — every user tied at a value lands in the
    same quartile. Quartile boundaries are the smallest values whose
    pct reaches 2500/5000/7500; assignment is a comparison against
    three broadcast scalars.

    Output: (r_q, f_q, m_q, n_users, monetary_cents) ≤ 64 rows.

    Scale: per-user metrics are one combinable agg over events; the
    cum_lt ranking of each metric's DISTINCT-VALUE frame is two-phase
    banded (the x248/abc discipline): (1) an exclusive running count
    over the ≤128-row power-of-two-band frame (64 non-negative + 63
    negative bands when a metric goes negative — still O(1) in
    n_users), (2) the within-band
    running count partitioned BY BAND — no ordered window ever runs
    over a frame whose NDV grows with n_users (mon is a per-user cent
    SUM, so its distinct-value frame approaches n_users at scale; rec
    and freq are naturally bounded but ride the same shape for free).
    Bands are disjoint value ranges, so band-asc + within-band value
    order reproduces the global order exactly. Boundary and max-day
    scalars ride 1-row broadcast cross joins.
    """
    cents = F.floor(F.coalesce(F.col(value_col), F.lit(0.0))
                    * F.lit(100.0) + F.lit(0.5)).cast("long")
    m = (df.select(F.col(key_col).alias("k"),
                   F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                   .alias("day"),
                   cents.alias("cents"))
         .groupBy("k")
         .agg(F.max("day").alias("umax"),
              F.count(F.lit(1)).alias("freq"),
              F.sum("cents").alias("mon")))
    g = m.agg(F.max("umax").alias("gmax"))
    u = (m.crossJoin(F.broadcast(g))
         .select("k", (F.col("gmax") - F.col("umax")).alias("rec"),
                 "freq", "mon"))
    n1 = u.agg(F.count(F.lit(1)).alias("nn"))

    def cuts(col: str) -> DataFrame:
        vals = u.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        # power-of-two band: sign-aware so the band is monotone
        # non-decreasing in the value even if a metric goes negative
        # (refund-heavy corpora can drive mon < 0)
        banded = vals.withColumn(
            "band",
            F.expr(f"CASE WHEN {col} >= 0 THEN length(bin({col})) - 1 "
                   f"ELSE -length(bin(-{col})) END").cast("int"))
        bt = banded.groupBy("band").agg(F.sum("cnt").alias("bcnt"))
        wb = (Window.orderBy("band")
              .rowsBetween(Window.unboundedPreceding, -1))
        boff = (bt.withColumn(
            "cum_before", F.coalesce(F.sum("bcnt").over(wb), F.lit(0)))
            .select("band", "cum_before"))
        wib = (Window.partitionBy("band").orderBy(col)
               .rowsBetween(Window.unboundedPreceding, -1))
        cl = (banded.join(F.broadcast(boff), "band")
              .withColumn("cum_lt",
                          F.col("cum_before")
                          + F.coalesce(F.sum("cnt").over(wib),
                                       F.lit(0))))
        return (cl.crossJoin(F.broadcast(n1))
                .agg(*[F.min(F.when(
                    (F.col("nn") > 1)
                    & (F.col("cum_lt") * 10000
                       >= F.lit(q) * (F.col("nn") - 1)),
                    F.col(col))).alias(f"{col}_c{q}")
                    for q in (2500, 5000, 7500)]))

    b = cuts("rec").crossJoin(cuts("freq")).crossJoin(cuts("mon"))

    def quart(col: str) -> F.Column:
        e = F.lit(1)
        for q in (2500, 5000, 7500):
            e = e + F.coalesce(
                (F.col(col) >= F.col(f"{col}_c{q}")).cast("int"),
                F.lit(0))
        return e.cast("int").alias(f"{col}_q")

    q = (u.crossJoin(F.broadcast(b))
         .select("k", "mon", quart("rec"), quart("freq"), quart("mon")))
    return (q.groupBy(F.col("rec_q").alias("r_q"),
                      F.col("freq_q").alias("f_q"),
                      F.col("mon_q").alias("m_q"))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("mon").alias("monetary_cents"))
            .orderBy("r_q", "f_q", "m_q"))


def error_spike(df: DataFrame, trail_hours: int = 24, top_k: int = 20,
                time_col: str = "ts", type_col: str = "event_type",
                err_type: str = "error") -> DataFrame:
    """Error-burst detection: hourly error counts vs the trailing
    ``trail_hours`` baseline — spike_bp = n_err · trail_hours · 10000
    div trailing_sum (10000 = exactly the trailing mean). A RANGE
    frame over the integer hour index makes the baseline a true
    clock-time window even across silent hours; only hours whose
    trailing day is fully observed (24 grid rows present, trailing
    errors > 0) are scored, and the top_k spikiest are returned with
    a (spike desc, hour) total order.

    Scale: events collapse to one row per observed hour first (a
    combinable conditional count); the ordered window runs over the
    hour SERIES (8.8k rows/year), not the event stream. At multi-year
    × multi-tenant scale the same window partitions by tenant.
    """
    hr = df.select(
        F.expr(f"unix_micros({time_col}) div {US_PER_HOUR}").alias("hour"),
        (F.col(type_col) == err_type).cast("long").alias("is_err"))
    g = hr.groupBy("hour").agg(F.sum("is_err").alias("n_err"))
    return error_spike_from_hourly(g, trail_hours, top_k)


def error_spike_from_hourly(g: DataFrame, trail_hours: int = 24,
                            top_k: int = 20) -> DataFrame:
    """The spike-detection tail over an (hour, n_err) grid frame
    (one row per hour with ANY observed event)."""
    w = (Window.orderBy("hour")
         .rangeBetween(-trail_hours, -1))
    return (g.withColumn("trail", F.sum("n_err").over(w))
            .withColumn("hrs", F.count(F.lit(1)).over(w))
            .where((F.col("hrs") == trail_hours) & (F.col("trail") > 0))
            .select("hour", "n_err", "trail",
                    F.expr(f"n_err * {trail_hours} * 10000 div trail")
                    .alias("spike_bp"))
            .orderBy(F.desc("spike_bp"), "hour")
            .limit(top_k))


def funnel_latency(df: DataFrame, steps: tuple[str, ...],
                   pct_qs: tuple[float, ...] = (0.5, 0.95),
                   time_col: str = "ts", key_col: str = "user_id",
                   type_col: str = "event_type") -> DataFrame:
    """Time-to-convert for users completing the whole funnel: the gap
    between the entry step's first touch and the final step's
    first-touch timestamp (the same stage chain as ``funnel``, so the
    two reports can never disagree about who converted).

    Output: one row — (n_converted, mean_us, p50_us, p95_us, max_us);
    mean is integer-floored, percentiles exact at 4dp.

    Scale: the stage chain is funnel()'s; the latency frame is one
    row per CONVERTED user and the summary one aggregate over it.
    """
    ev = _base(df, time_col, key_col, type_col)
    stages = _funnel_stages(ev, steps)
    lat = (stages[0].select("k", F.col("t0").alias("t_entry"))
           .join(stages[-1].select("k", F.col("t0").alias("t_done")),
                 "k")
           .select((F.col("t_done") - F.col("t_entry")).alias("lat_us")))
    aggs = [F.count(F.lit(1)).alias("n_converted"),
            F.sum("lat_us").alias("tot"),
            F.max("lat_us").alias("max_us")]
    aggs += [F.round(F.percentile("lat_us", F.lit(q)), 4)
             .alias(f"p{int(q * 100)}_us") for q in pct_qs]
    return (lat.agg(*aggs)
            .select("n_converted",
                    F.when(F.col("n_converted") > 0,
                           F.expr("tot div n_converted"))
                    .otherwise(F.lit(0)).cast("long").alias("mean_us"),
                    *[f"p{int(q * 100)}_us" for q in pct_qs],
                    "max_us"))


def _daily_counts(df: DataFrame, time_col: str) -> DataFrame:
    return (df.select(F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                      .alias("day"))
            .groupBy("day").agg(F.count(F.lit(1)).alias("c")))


def acf(df: DataFrame, max_lag: int = 7,
        time_col: str = "ts") -> DataFrame:
    """Autocorrelation of the daily event-count series for lags
    1..max_lag — the weekly-rhythm detector a monitoring stack runs
    before picking a seasonal window.

    Pearson r per lag from EXACT integer moments over the overlapping
    day pairs (n, Σx, Σy, Σx², Σy², Σxy): r_bp = floor(10000·(n·Σxy −
    Σx·Σy) / sqrt((n·Σx² − Σx²ᵗᵒᵗ)·(n·Σy² − Σy²ᵗᵒᵗ))). The only
    doubles are the final sqrt/divide over exact integers — IEEE sqrt
    is correctly rounded, so both engines emit the identical quotient
    (the x166 floor-on-double discipline; FLOOR is toward −inf in
    both, negative-safe). Degenerate (constant) sides → r_bp = 0.

    Output: (lag, n_pairs, r_bp), one row per lag with >= 2 pairs.

    Scale: the corpus collapses to the daily series first (one
    combinable count); the lag fan-out and self-join run over series
    × max_lag rows. Moment products reach n²·c² — bigint-safe to
    ~3e9 events/day on a 10-year series; shard the day index beyond.
    """
    return acf_from_daily(_daily_counts(df, time_col), max_lag)


def acf_from_daily(d: DataFrame, max_lag: int = 7) -> DataFrame:
    """The ACF tail over a (day, c) daily-count frame — shared with
    the persisted event-rollup index."""
    lagged = d.select(
        "day", "c",
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"))
    pairs = (lagged.alias("a")
             .join(d.alias("b"),
                   F.col("b.day") == F.col("a.day") + F.col("a.lag"))
             .select("a.lag", F.col("a.c").alias("x"),
                     F.col("b.c").alias("y")))
    m = (pairs.groupBy("lag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("s1"), F.sum("y").alias("s2"),
              F.sum(F.col("x") * F.col("x")).alias("s11"),
              F.sum(F.col("y") * F.col("y")).alias("s22"),
              F.sum(F.col("x") * F.col("y")).alias("s12")))
    num = F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")
    d1 = F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")
    d2 = F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")
    r = F.when((d1 > 0) & (d2 > 0),
               F.floor(F.lit(10000.0) * num.cast("double")
                       / F.sqrt(d1.cast("double") * d2.cast("double"))))\
        .otherwise(F.lit(0))
    return (m.where(F.col("n") >= 2)
            .select("lag", F.col("n").alias("n_pairs"),
                    r.cast("long").alias("r_bp"))
            .orderBy("lag"))


def dow_profile(df: DataFrame, time_col: str = "ts") -> DataFrame:
    """Day-of-week seasonality profile of daily event volume: per
    epoch-day-of-week (day % 7 — bucket identity, not calendar
    naming), the day count, total events, and the seasonal index in
    bp vs the all-days mean (10000 = flat; integer cross-multiplied:
    idx = total·N_days·10000 div (n_days·T_total)).

    Scale: daily series first; the profile is 7 rows; the global
    totals are a 1-row broadcast cross join.
    """
    return dow_profile_from_daily(_daily_counts(df, time_col))


def dow_profile_from_daily(d: DataFrame) -> DataFrame:
    """The day-of-week profile tail over a (day, c) frame."""
    g = d.agg(F.count(F.lit(1)).alias("nd"), F.sum("c").alias("tc"))
    return (d.select((F.col("day") % 7).alias("dow"), "c")
            .groupBy("dow")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum("c").alias("total"))
            .crossJoin(F.broadcast(g))
            .select("dow", "n_days", "total",
                    F.expr("total * nd * 10000 div (n_days * tc)")
                    .alias("idx_bp"))
            .orderBy("dow"))


def forecast_backtest(df: DataFrame, season: int = 7,
                      time_col: str = "ts") -> DataFrame:
    """Forecast-model backtest over the daily series: naive-1
    (predict today = yesterday) vs seasonal-naive (today = same day
    last week), scored by WAPE in bp (10000·Σ|actual − pred| div
    Σactual — the weighted absolute percentage error; one integer
    division, no per-day ratio floors). A weekly rhythm shows up as
    seasonal-naive beating naive-1 — the go/no-go check before
    wiring any fancier forecaster.

    Output: (model, horizon_days, n_days, sum_abs_err, wape_bp), one
    row per model; only days with an observed lagged day are scored,
    so the two models may cover slightly different day sets (each
    reports its own n_days).

    Scale: both joins are day-series × 1 equi-joins on the day index.
    """
    return forecast_backtest_from_daily(
        _daily_counts(df, time_col), season)


def forecast_backtest_from_daily(d: DataFrame,
                                 season: int = 7) -> DataFrame:
    """The backtest tail over a (day, c) frame."""
    out = []
    for name, lag in (("naive1", 1), (f"seasonal{season}", season)):
        j = (d.alias("a")
             .join(d.alias("b"),
                   F.col("a.day") == F.col("b.day") + F.lit(lag))
             .select(F.col("a.c").alias("actual"),
                     F.col("b.c").alias("pred")))
        out.append(
            j.agg(F.count(F.lit(1)).alias("n_days"),
                  F.sum(F.abs(F.col("actual") - F.col("pred")))
                  .alias("sum_abs_err"),
                  F.sum("actual").alias("tot"))
            .select(F.lit(name).alias("model"),
                    F.lit(lag).cast("int").alias("horizon_days"),
                    "n_days", "sum_abs_err",
                    F.when(F.col("tot") > 0,
                           F.expr("sum_abs_err * 10000 div tot"))
                    .otherwise(F.lit(0)).cast("long").alias("wape_bp")))
    return reduce(DataFrame.unionByName, out).orderBy("horizon_days")


def bot_flags(df: DataFrame, bot_median_s: int = 60,
              min_gaps: int = 20, max_disp_bp: int = 500,
              time_col: str = "ts", key_col: str = "user_id",
              id_col: str = "event_id") -> DataFrame:
    """Automation/bot heuristics from per-user inter-event timing —
    the abuse-filtering pass a clickstream pipeline runs before any
    behavioral metric: per user, the count of gaps, the median gap in
    seconds (exact percentile, 4dp), and the squared coefficient of
    variation of the gap series in bp (disp_bp = 10000·(n·Σg² −
    (Σg)²) div (Σg)² — exact integer moments; a human's gaps are
    bursty, disp ≫ 0; a timer's gaps are near-constant, disp ≈ 0).
    is_bot flags inhumanly fast (median < bot_median_s) or
    too-regular (n ≥ min_gaps and disp < max_disp_bp) users.

    Output: (k, n_gaps, median_gap_s, disp_bp, is_bot) for every
    user with ≥ 1 gap, ordered — the flag thresholds are the
    reviewable policy, the stats are the evidence.

    Scale: one lag window partitioned by user (natural clickstream
    partitioning), then a combinable per-user aggregate. Gaps are
    bucketed to SECONDS before squaring: n·Σg² stays bigint-safe to
    ~10⁵ events per user per month; widen to decimal past that.
    """
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    gp = (ev.withColumn("prev", F.lag("us").over(w))
          .where(F.col("prev").isNotNull())
          .select("k", F.expr("(us - prev) div 1000000").alias("g")))
    s = (gp.groupBy("k")
         .agg(F.count(F.lit(1)).alias("n_gaps"),
              F.sum("g").alias("sg"),
              F.sum(F.col("g") * F.col("g")).alias("sg2"),
              F.round(F.percentile("g", F.lit(0.5)), 4)
              .alias("median_gap_s")))
    disp = F.when(F.col("sg") > 0,
                  F.expr("10000 * (n_gaps * sg2 - sg * sg) "
                         "div (sg * sg)")).otherwise(F.lit(0))
    return (s.withColumn("disp_bp", disp.cast("long"))
            .select("k", "n_gaps", "median_gap_s", "disp_bp",
                    ((F.col("median_gap_s") < bot_median_s)
                     | ((F.col("n_gaps") >= min_gaps)
                        & (F.col("disp_bp") < max_disp_bp)))
                    .alias("is_bot"))
            .orderBy("k"))


def funnel_trend(df: DataFrame, steps: tuple[str, ...],
                 week_days: int = 7,
                 time_col: str = "ts", key_col: str = "user_id",
                 type_col: str = "event_type") -> DataFrame:
    """Funnel conversion over time: users are grouped by the epoch-
    week of their ENTRY first-touch (stage 0's t0), and each week
    reports how many entered vs how many eventually completed the
    whole funnel — the week-over-week conversion health check
    (attribution to entry week, the standard cohorted funnel).

    Output: (week, n_entered, n_converted, conv_bp), ordered.

    Scale: the stage chain is funnel()'s; the trend is one combinable
    aggregate over the per-user entry frame left-joined (on the user
    key) to the final stage.
    """
    ev = _base(df, time_col, key_col, type_col)
    stages = _funnel_stages(ev, steps)
    entered = stages[0].select(
        "k", F.expr(f"t0 div {week_days * US_PER_DAY}").alias("week"))
    done = stages[-1].select("k", F.lit(1).cast("long").alias("conv"))
    return (entered.join(done, "k", "left")
            .groupBy("week")
            .agg(F.count(F.lit(1)).alias("n_entered"),
                 F.sum(F.coalesce(F.col("conv"), F.lit(0)))
                 .alias("n_converted"))
            .select("week", "n_entered", "n_converted",
                    F.expr("n_converted * 10000 div n_entered")
                    .alias("conv_bp"))
            .orderBy("week"))


def session_paths(df: DataFrame, gap: str = "30 minutes",
                  path_len: int = 3, top_k: int = 20,
                  time_col: str = "ts", key_col: str = "user_id",
                  type_col: str = "event_type",
                  id_col: str = "event_id") -> DataFrame:
    """Top-k most common within-session event-type paths of length
    ``path_len`` — the "what do users actually do" view transitions
    (x184) can't give: paths never cross a session boundary, so a
    lunch break doesn't fabricate a view→purchase flow.

    Sessions are the x15 gaps-and-islands (split strictly above the
    gap); paths are consecutive event triples in (ts, event_id)
    order, rendered ``a>b>c``; share_bp is vs all complete paths.
    Ties in the top-k break on the path string — total order.

    Output: (path, n, share_bp), top_k rows.

    Scale: two windows partitioned by user (and session) — the
    natural clickstream partitioning; the count is combinable and
    the top-k a TakeOrdered. No global window anywhere.
    """
    import re as _re

    m = _re.fullmatch(r"(\d+)\s+minutes?", gap)
    gap_us = int(m.group(1)) * 60 * 1_000_000
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("t"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    brk = F.when(F.col("us") - F.lag("us").over(w) > gap_us,
                 F.lit(1)).otherwise(F.lit(0))
    sess = ev.withColumn("sid", F.sum(brk).over(w))
    w2 = Window.partitionBy("k", "sid").orderBy("us", "eid")
    path = F.concat_ws(">", *[F.lead("t", i).over(w2)
                              for i in range(path_len)])
    paths = (sess.withColumn("path", path)
             .withColumn("lastt", F.lead("t", path_len - 1).over(w2))
             .where(F.col("lastt").isNotNull())
             .select("path"))
    tot = paths.agg(F.count(F.lit(1)).alias("n_paths"))
    return (paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(tot))
            .select("path", "n",
                    F.expr("n * 10000 div n_paths").alias("share_bp"))
            .orderBy(F.desc("n"), "path")
            .limit(top_k))


def revenue_cohorts(df: DataFrame, week_days: int = 7,
                    time_col: str = "ts", key_col: str = "user_id",
                    value_col: str = "value") -> DataFrame:
    """Revenue retention matrix — x182's cohort grid with money
    instead of headcount: cohort = epoch-week of the user's first
    event, and each (cohort, week_offset) cell sums the cohort's
    integer-cent event value landing in that offset week. rev_bp is
    vs the cohort's offset-0 revenue (the payback-curve view).

    Scale: one combinable agg per (user-first-week, offset) after
    the per-user first-day frame (the only event-keyed shuffles);
    the offset-0 base is one row per cohort, broadcast back.
    """
    cents = F.floor(F.coalesce(F.col(value_col), F.lit(0.0))
                    * F.lit(100.0) + F.lit(0.5)).cast("long")
    e = df.select(F.col(key_col).alias("k"),
                  F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                  .alias("day"), cents.alias("cents"))
    first = e.groupBy("k").agg(F.min("day").alias("d0"))
    cell = (e.join(first, "k")
            .select(F.expr(f"d0 div {week_days}").alias("cohort_week"),
                    F.expr(f"(day - d0) div {week_days}")
                    .alias("week_offset"), "cents"))
    rev = (cell.groupBy("cohort_week", "week_offset")
           .agg(F.sum("cents").alias("revenue_cents")))
    base = (rev.where(F.col("week_offset") == 0)
            .select("cohort_week",
                    F.col("revenue_cents").alias("base_cents")))
    return (rev.join(F.broadcast(base), "cohort_week")
            .select("cohort_week", "week_offset", "revenue_cents",
                    F.when(F.col("base_cents") > 0,
                           F.expr("revenue_cents * 10000 "
                                  "div base_cents"))
                    .otherwise(F.lit(0)).cast("long").alias("rev_bp"))
            .orderBy("cohort_week", "week_offset"))


def session_cooccurrence(df: DataFrame, gap: str = "30 minutes",
                         time_col: str = "ts",
                         key_col: str = "user_id",
                         type_col: str = "event_type",
                         id_col: str = "event_id") -> DataFrame:
    """Order-free association between event types within a session —
    the market-basket view next to x184's ordered transitions: for
    each unordered type pair, the number of sessions containing
    both and the lift in bp (10000·n_both·n_sessions div (n_a·n_b);
    10000 = independent, higher = the types travel together).

    Sessions are the x15 gaps-and-islands; per-session presence is a
    DISTINCT, so event volume inside a session doesn't inflate lift.

    Output: (type_a, type_b, n_both, lift_bp), type_a < type_b,
    ordered.

    Scale: one islands window per user, one DISTINCT to (session,
    type), then the pair join runs on the per-session TYPE sets
    (≤ |types| rows per session); the totals are broadcast.
    """
    import re as _re

    m = _re.fullmatch(r"(\d+)\s+minutes?", gap)
    gap_us = int(m.group(1)) * 60 * 1_000_000
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("t"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    brk = F.when(F.col("us") - F.lag("us").over(w) > gap_us,
                 F.lit(1)).otherwise(F.lit(0))
    st = (ev.withColumn("sid", F.sum(brk).over(w))
          .select("k", "sid", "t").distinct())
    tot = st.select("k", "sid").distinct() \
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    per = st.groupBy("t").agg(F.count(F.lit(1)).alias("nt"))
    a, b = st.alias("a"), st.alias("b")
    both = (a.join(b, (F.col("a.k") == F.col("b.k"))
                   & (F.col("a.sid") == F.col("b.sid"))
                   & (F.col("a.t") < F.col("b.t")))
            .groupBy(F.col("a.t").alias("type_a"),
                     F.col("b.t").alias("type_b"))
            .agg(F.count(F.lit(1)).alias("n_both")))
    return (both
            .join(F.broadcast(per.select(F.col("t").alias("type_a"),
                                         F.col("nt").alias("na"))),
                  "type_a")
            .join(F.broadcast(per.select(F.col("t").alias("type_b"),
                                         F.col("nt").alias("nb"))),
                  "type_b")
            .crossJoin(F.broadcast(tot))
            .select("type_a", "type_b", "n_both",
                    F.expr("n_both * n_sessions * 10000 div (na * nb)")
                    .alias("lift_bp"))
            .orderBy("type_a", "type_b"))


def metric_alerts(df: DataFrame,
                  rules: tuple[tuple[str, str, int], ...],
                  time_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Metric-threshold alerting over the hourly grid — the Kibana
    threshold-watcher shape for metrics (the percolator family covers
    document-match alerts). Rules are RELATIVE: (rule_id, event_type,
    mult_bp) fires for every observed hour where the type's count is
    >= mult_bp/10000 x its own corpus-wide mean hourly rate — the
    self-normalizing form that stays meaningful across a 100x volume
    change (an absolute count can't). The check is cross-multiplied
    integer: observed * n_hours * 10000 >= total_t * mult_bp.

    Output: (rule_id, hour, event_type, observed, mean_x100,
    mult_bp) per firing, ordered — the alert log a notifier drains.

    Scale: events collapse to (hour, type) counts (combinable); the
    per-type totals and the hour-grid size are broadcast 1-row/row-
    per-type frames; the rule table is a broadcast literal. Streaming
    ingest gets the same semantics served from the event-rollup
    index's hourly grid.
    """
    spark = df.sparkSession
    ht = (df.select(F.expr(f"unix_micros({time_col}) div {US_PER_HOUR}")
                    .alias("hour"), F.col(type_col).alias("t"))
          .groupBy("hour", "t")
          .agg(F.count(F.lit(1)).alias("observed")))
    return metric_alerts_from_type_hourly(spark, ht, rules)


def metric_alerts_from_type_hourly(spark, ht: DataFrame,
                                   rules) -> DataFrame:
    """The x205 alert tail over a (hour, t, observed) per-type hourly
    grid — shared with the persisted event-rollup index."""
    nh = (ht.select("hour").distinct()
          .agg(F.count(F.lit(1)).alias("n_hours")))
    tot = ht.groupBy("t").agg(F.sum("observed").alias("tot_t"))
    rf = spark.createDataFrame(list(rules),
                               ["rule_id", "t", "mult_bp"])
    return (ht.join(F.broadcast(rf), "t")
            .join(F.broadcast(tot), "t")
            .crossJoin(F.broadcast(nh))
            .where(F.col("observed") * F.col("n_hours") * F.lit(10000)
                   >= F.col("tot_t") * F.col("mult_bp"))
            .select("rule_id", "hour", F.col("t").alias("event_type"),
                    "observed",
                    F.expr("tot_t * 100 div n_hours").alias("mean_x100"),
                    F.col("mult_bp").cast("long").alias("mult_bp"))
            .orderBy("rule_id", "hour"))


def growth_accounting(df: DataFrame, week_days: int = 7,
                      time_col: str = "ts",
                      key_col: str = "user_id") -> DataFrame:
    """Weekly growth accounting — every active user classified as
    new (first-ever active week), retained (also active the previous
    week) or resurrected (returning after >= 1 skipped week), plus
    churned = last week's actives who went silent; quick ratio =
    (new + resurrected) / churned in bp (the standard inflow/outflow
    health metric; 10000 = treading water).

    Output: (week, n_active, n_new, n_retained, n_resurrected,
    n_churned, quick_bp), one row per observed epoch-week; churn and
    quick_bp are 0 for a week with no observed predecessor week.

    Scale: the corpus collapses to DISTINCT (user, week) immediately;
    the classifying lag window is partitioned by user over that
    frame (<= weeks-per-user rows each); the churn lookup is a
    self-join of the |weeks|-row aggregate on week-1.
    """
    wd_us = week_days * US_PER_DAY
    uw = (df.select(F.col(key_col).alias("k"),
                    F.expr(f"unix_micros({time_col}) div {wd_us}")
                    .alias("week"))
          .distinct())
    w = Window.partitionBy("k").orderBy("week")
    cl = (uw.withColumn("prev", F.lag("week").over(w))
          .select("week",
                  F.col("prev").isNull().cast("long").alias("is_new"),
                  (F.col("prev") == F.col("week") - 1).cast("long")
                  .alias("is_ret"),
                  (F.col("prev") < F.col("week") - 1).cast("long")
                  .alias("is_res")))
    g = (cl.groupBy("week")
         .agg(F.count(F.lit(1)).alias("n_active"),
              F.sum("is_new").alias("n_new"),
              F.sum(F.coalesce(F.col("is_ret"), F.lit(0)))
              .alias("n_retained"),
              F.sum(F.coalesce(F.col("is_res"), F.lit(0)))
              .alias("n_resurrected")))
    prev = g.select((F.col("week") + 1).alias("week"),
                    F.col("n_active").alias("prev_active"))
    churn = F.coalesce(F.col("prev_active"), F.lit(0)) \
        - F.col("n_retained")
    return (g.join(F.broadcast(prev), "week", "left")
            .withColumn("n_churned", churn)
            .select("week", "n_active", "n_new", "n_retained",
                    "n_resurrected", "n_churned",
                    F.when(F.col("n_churned") > 0,
                           F.expr("(n_new + n_resurrected) * 10000 "
                                  "div n_churned"))
                    .otherwise(F.lit(0)).cast("long").alias("quick_bp"))
            .orderBy("week"))


def power_user_curve(df: DataFrame, time_col: str = "ts",
                     key_col: str = "user_id") -> DataFrame:
    """Engagement-depth histogram (the L30 / power-user curve): how
    many users were active on exactly d distinct days, with the user
    share per bucket and the cumulative share of users at least that
    active (summed from the most-active side — "top x% of users").

    Output: (active_days, n_users, share_bp, cum_share_bp), ordered
    by active_days DESCENDING (the cumulative reads top-down).

    Scale: DISTINCT (user, day) -> per-user day count -> histogram;
    the windows run over the <= |span-days| histogram rows.
    """
    ud = (df.select(F.col(key_col).alias("k"),
                    F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                    .alias("day"))
          .distinct())
    per = ud.groupBy("k").agg(F.count(F.lit(1)).alias("active_days"))
    hist = (per.groupBy("active_days")
            .agg(F.count(F.lit(1)).alias("n_users")))
    wt = Window.partitionBy()
    wc = (Window.orderBy(F.desc("active_days"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (hist.withColumn("tot", F.sum("n_users").over(wt))
            .withColumn("cum", F.sum("n_users").over(wc))
            .select("active_days", "n_users",
                    F.expr("n_users * 10000 div tot").alias("share_bp"),
                    F.expr("cum * 10000 div tot").alias("cum_share_bp"))
            .orderBy(F.desc("active_days")))


def last_touch_attribution(df: DataFrame,
                           touch_types: tuple[str, ...] = ("view",
                                                           "click"),
                           conv_type: str = "purchase",
                           lookback_days: int = 3,
                           time_col: str = "ts",
                           key_col: str = "user_id",
                           type_col: str = "event_type",
                           id_col: str = "event_id",
                           value_col: str = "value") -> DataFrame:
    """Last-touch revenue attribution: each conversion's value (in
    integer cents, the x186 discipline) is credited to the user's
    most recent STRICTLY-PRECEDING touch event within the lookback
    window; conversions with no qualifying touch are 'direct'. The
    precede order is (ts, event_id) — total, so ties can't flip the
    credited channel.

    Output: (channel, n_conv, revenue_cents, revenue_share_bp),
    one row per credited channel, ordered.

    Scale: ONE window partitioned by user (the natural clickstream
    partitioning) computes the running last-touch via conditional
    last-ignore-nulls over the strictly-preceding frame; everything
    after is a combinable per-channel aggregate plus a window over
    the <= |types|+1 channel rows.
    """
    lb_us = lookback_days * US_PER_DAY
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("t"),
                   F.floor(F.coalesce(F.col(value_col), F.lit(0.0))
                           * 100 + F.lit(0.5)).alias("cents"))
    w = (Window.partitionBy("k").orderBy("us", "eid")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col("t").isin(*touch_types)
    conv = (ev.withColumn(
        "touch_t",
        F.last(F.when(is_touch, F.col("t")), ignorenulls=True).over(w))
        .withColumn(
        "touch_us",
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True).over(w))
        .where(F.col("t") == conv_type))
    channel = F.when(F.col("touch_us").isNotNull()
                     & (F.col("us") - F.col("touch_us") <= lb_us),
                     F.col("touch_t")).otherwise(F.lit("direct"))
    g = (conv.select(channel.alias("channel"), "cents")
         .groupBy("channel")
         .agg(F.count(F.lit(1)).alias("n_conv"),
              F.sum("cents").alias("revenue_cents")))
    wt = Window.partitionBy()
    return (g.withColumn("tot", F.sum("revenue_cents").over(wt))
            .select("channel", "n_conv", "revenue_cents",
                    F.when(F.col("tot") > 0,
                           F.expr("revenue_cents * 10000 div tot"))
                    .otherwise(F.lit(0)).cast("long")
                    .alias("revenue_share_bp"))
            .orderBy("channel"))


def mad_anomalies(df: DataFrame, z_bp_threshold: int = 35000,
                  time_col: str = "ts") -> DataFrame:
    """Robust daily-volume anomaly detection via median absolute
    deviation — the outlier-immune complement to x187's trailing-mean
    spikes (one bad day inflates a mean baseline; it cannot move the
    median). All quantities stay integer by carrying DOUBLED medians:
    med2 = 2*median(count) (exact — the interpolated median of
    integers is a half-integer, so twice it is an integer in both
    engines, the x17 percentile/quantile_cont parity), dev2 =
    |2*c - med2|, mad2 = 2*median(dev2), z_bp = dev2*10000 div mad2.

    Output: (day, c, dev2, z_bp, is_anomaly) per observed day where
    is_anomaly = z_bp > threshold (0 when mad2 = 0 — a perfectly
    constant series has no outliers).

    Scale: the corpus collapses to the daily series first; the two
    medians are 1-row aggregates of that series, broadcast back.
    """
    return mad_anomalies_from_daily(_daily_counts(df, time_col),
                                    z_bp_threshold)


def mad_anomalies_from_daily(d: DataFrame,
                             z_bp_threshold: int = 35000) -> DataFrame:
    """The MAD tail over a (day, c) daily-count frame."""
    med = d.agg((F.percentile("c", F.lit(0.5)) * 2)
                .cast("long").alias("med2"))
    dev = (d.crossJoin(F.broadcast(med))
           .select("day", "c", "med2",
                   F.abs(F.col("c") * 2 - F.col("med2")).alias("dev2")))
    mad = dev.agg((F.percentile("dev2", F.lit(0.5)) * 2)
                  .cast("long").alias("mad2"))
    z = F.when(F.col("mad2") > 0,
               F.expr("dev2 * 10000 div mad2")).otherwise(F.lit(0))
    return (dev.crossJoin(F.broadcast(mad))
            .withColumn("z_bp", z.cast("long"))
            .select("day", "c", "dev2", "z_bp",
                    (F.col("z_bp") > z_bp_threshold).alias("is_anomaly"))
            .orderBy("day"))


def cusum_changepoint(df: DataFrame,
                      time_col: str = "ts") -> DataFrame:
    """CUSUM level-shift scan over the daily series: the cumulative
    sum of deviations from the whole-series mean, kept exact-integer
    by cross-multiplication — cusum_d = D*prefix_d - idx_d*T (D days,
    T total events; the true cusum times D). The |cusum| peak marks
    the most likely changepoint (the classic offline CUSUM argmax);
    shift_bp locates the peak's magnitude vs D*T.

    Output: (day, c, cusum, is_peak) per observed day; is_peak is
    TRUE exactly once (ties break to the earliest day).

    Scale: daily collapse first; every window here runs over the
    |days| series frame, never the corpus.
    """
    return cusum_from_daily(_daily_counts(df, time_col))


def cusum_from_daily(d: DataFrame) -> DataFrame:
    """The CUSUM tail over a (day, c) daily-count frame."""
    wo = Window.orderBy("day")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    s = (d.withColumn("prefix", F.sum("c").over(wc))
         .withColumn("idx", F.row_number().over(wo))
         .withColumn("tot", F.sum("c").over(wt))
         .withColumn("nd", F.count(F.lit(1)).over(wt))
         .withColumn("cusum", F.col("nd") * F.col("prefix")
                     - F.col("idx") * F.col("tot")))
    wp = Window.orderBy(F.desc(F.abs(F.col("cusum"))), F.col("day"))
    return (s.withColumn("pk", F.row_number().over(wp))
            .select("day", "c", "cusum", (F.col("pk") == 1)
                    .alias("is_peak"))
            .orderBy("day"))


def purchase_intervals(df: DataFrame, conv_type: str = "purchase",
                       time_col: str = "ts",
                       key_col: str = "user_id",
                       type_col: str = "event_type",
                       id_col: str = "event_id") -> DataFrame:
    """Repeat-purchase summary — the LTV primer: buyer counts, the
    repeat rate in bp, and the inter-purchase gap distribution
    (count, exact doubled-median in us — the x209 med2 discipline —
    and the integer mean).

    Output: ONE row (n_buyers, n_repeat, repeat_bp, n_gaps,
    med2_gap_us, mean_gap_us); gap stats are 0 when no user bought
    twice.

    Scale: the type filter is pushed to the scan; one lag window
    partitioned by user over the purchase frame; two 1-row
    aggregates broadcast-crossed.
    """
    p = (df.where(F.col(type_col) == conv_type)
         .select(F.col(key_col).alias("k"),
                 F.unix_micros(F.col(time_col)).alias("us"),
                 F.col(id_col).alias("eid")))
    w = Window.partitionBy("k").orderBy("us", "eid")
    gaps = (p.withColumn("prev", F.lag("us").over(w))
            .where(F.col("prev").isNotNull())
            .select((F.col("us") - F.col("prev")).alias("g")))
    buyers = (p.groupBy("k").agg(F.count(F.lit(1)).alias("n_p"))
              .agg(F.count(F.lit(1)).alias("n_buyers"),
                   F.sum((F.col("n_p") >= 2).cast("long"))
                   .alias("n_repeat")))
    gs = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce((F.percentile("g", F.lit(0.5)) * 2).cast("long"),
                   F.lit(0)).alias("med2_gap_us"),
        F.coalesce(F.expr("sum(g) div count(1)"), F.lit(0))
        .alias("mean_gap_us"))
    return (buyers.crossJoin(F.broadcast(gs))
            .select("n_buyers", "n_repeat",
                    F.when(F.col("n_buyers") > 0,
                           F.expr("n_repeat * 10000 div n_buyers"))
                    .otherwise(F.lit(0)).cast("long").alias("repeat_bp"),
                    "n_gaps", "med2_gap_us", "mean_gap_us"))


def landing_bounce(df: DataFrame, gap: str = "30 minutes",
                   time_col: str = "ts", key_col: str = "user_id",
                   type_col: str = "event_type",
                   id_col: str = "event_id") -> DataFrame:
    """Landing-type report over x15 sessions: for each session's
    FIRST event type ((ts, event_id) total order), the session count,
    the bounce count (single-event sessions), bounce rate and the
    landing's share of all sessions — the entry-point health view
    next to x201's path mining.

    Output: (landing, n_sessions, n_bounces, bounce_bp, share_bp),
    ordered by landing.

    Scale: the two windows are partitioned by user (and session) —
    the natural clickstream partitioning; the report is a combinable
    aggregate over one row per session plus a window over ≤ |types|
    rows.
    """
    import re as _re

    m = _re.fullmatch(r"(\d+)\s+minutes?", gap)
    gap_us = int(m.group(1)) * 60 * 1_000_000
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("t"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    brk = F.when(F.col("us") - F.lag("us").over(w) > gap_us,
                 F.lit(1)).otherwise(F.lit(0))
    sess = ev.withColumn("sid", F.sum(brk).over(w))
    w2 = Window.partitionBy("k", "sid").orderBy("us", "eid")
    w2a = Window.partitionBy("k", "sid")
    fl = (sess.withColumn("rn", F.row_number().over(w2))
          .withColumn("n_ev", F.count(F.lit(1)).over(w2a))
          .where(F.col("rn") == 1)
          .select(F.col("t").alias("landing"), "n_ev"))
    g = (fl.groupBy("landing")
         .agg(F.count(F.lit(1)).alias("n_sessions"),
              F.sum((F.col("n_ev") == 1).cast("long"))
              .alias("n_bounces")))
    wt = Window.partitionBy()
    return (g.withColumn("tot", F.sum("n_sessions").over(wt))
            .select("landing", "n_sessions", "n_bounces",
                    F.expr("n_bounces * 10000 div n_sessions")
                    .alias("bounce_bp"),
                    F.expr("n_sessions * 10000 div tot")
                    .alias("share_bp"))
            .orderBy("landing"))


def conversion_latency(df: DataFrame, from_type: str = "signup",
                       to_type: str = "purchase",
                       time_col: str = "ts",
                       key_col: str = "user_id") -> DataFrame:
    """Time-to-convert from a user's FIRST ``from_type`` event to
    their first STRICTLY-LATER ``to_type`` event (the funnel
    strictness rule) — the activation-latency summary: how many
    signups ever buy, and how long that takes.

    Output: ONE row (n_from, n_converted, conv_bp, med2_lat_us,
    mean_lat_us) — gap stats use the x209 doubled-median discipline
    and are 0 when nobody converts.

    Scale: two type-filtered scans (predicate pushed), each a
    combinable MIN per user, one equi-join on the user key, two
    broadcast 1-row aggregates.
    """
    first_from = (df.where(F.col("event_type") == from_type)
                  .select(F.col(key_col).alias("k"),
                          F.unix_micros(F.col(time_col)).alias("us"))
                  .groupBy("k").agg(F.min("us").alias("t0")))
    conv = (df.where(F.col("event_type") == to_type)
            .select(F.col(key_col).alias("k"),
                    F.unix_micros(F.col(time_col)).alias("us"))
            .join(first_from, "k")
            .where(F.col("us") > F.col("t0"))
            .groupBy("k").agg(F.min("us").alias("t1"),
                              F.any_value("t0").alias("t0"))
            .select((F.col("t1") - F.col("t0")).alias("lat")))
    nf = first_from.agg(F.count(F.lit(1)).alias("n_from"))
    cs = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.coalesce((F.percentile("lat", F.lit(0.5)) * 2).cast("long"),
                   F.lit(0)).alias("med2_lat_us"),
        F.coalesce(F.expr("sum(lat) div count(1)"), F.lit(0))
        .alias("mean_lat_us"))
    return (nf.crossJoin(F.broadcast(cs))
            .select("n_from", "n_converted",
                    F.when(F.col("n_from") > 0,
                           F.expr("n_converted * 10000 div n_from"))
                    .otherwise(F.lit(0)).cast("long").alias("conv_bp"),
                    "med2_lat_us", "mean_lat_us"))


def ab_test_report(df: DataFrame, conv_type: str = "purchase",
                   time_col: str = "ts", key_col: str = "user_id",
                   type_col: str = "event_type",
                   value_col: str = "value") -> DataFrame:
    """A/B experiment readout over a deterministic user split
    (variant B iff ``user_id % 2 == 1`` — the hash-bucket assignment
    every experimentation stack uses, here plain modulo so both
    engines agree): per-arm exposed users, converters (>= 1
    ``conv_type`` event), conversion rates, the bp lift, per-arm
    revenue in integer cents (floor(value*100) per converting event),
    and the pooled two-proportion z statistic.

    With c = conv_a + conv_b and N = n_a + n_b, the pooled z
    algebraically reduces to every operand being an exact integer:

        z = (conv_b*n_a - conv_a*n_b)/(n_a*n_b)
            / sqrt(c*(N - c) / (N*n_a*n_b))

    The only doubles are the two final divisions and one sqrt
    (correctly-rounded IEEE — identical in both engines) with FLOOR
    toward -inf (the x190 discipline). Degenerate experiments (an
    empty arm, zero or unanimous conversion) report z_bp = 0.

    Output: ONE row (n_a, n_b, conv_a, conv_b, conv_a_bp, conv_b_bp,
    lift_bp, rev_a_cents, rev_b_cents, z_bp).

    Scale: one map-side-combinable per-user collapse (the only
    event-cardinality shuffle, on the user key), then a single-row
    global conditional aggregate — no windows, no joins.
    """
    ev = df.select(F.col(key_col).alias("k"),
                   F.col(type_col).alias("t"),
                   F.col(value_col).alias("val"))
    u = (ev.groupBy("k")
         .agg(F.max(F.when(F.col("t") == conv_type, 1).otherwise(0))
              .alias("conv"),
              F.sum(F.when(F.col("t") == conv_type,
                           F.floor(F.col("val") * 100).cast("long"))
                    .otherwise(F.lit(0))).alias("rev"))
         .select((F.col("k") % 2).alias("v"), "conv", "rev"))
    s = u.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0))
        .alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0))
        .alias("conv_b"),
        F.sum(F.when(F.col("v") == 0, F.col("rev")).otherwise(0))
        .alias("rev_a_cents"),
        F.sum(F.when(F.col("v") == 1, F.col("rev")).otherwise(0))
        .alias("rev_b_cents"))
    c = F.col("conv_a") + F.col("conv_b")
    n = F.col("n_a") + F.col("n_b")
    num = F.col("conv_b") * F.col("n_a") - F.col("conv_a") * F.col("n_b")
    z = F.floor(
        F.lit(10000.0) * num.cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
        / F.sqrt((c * (n - c)).cast("double")
                 / (n * F.col("n_a") * F.col("n_b")).cast("double")))
    rate = (lambda cv, nn:
            F.when(F.col(nn) > 0, F.expr(f"{cv} * 10000 div {nn}"))
            .otherwise(F.lit(0)).cast("long"))
    return (s.select(
        "n_a", "n_b", "conv_a", "conv_b",
        rate("conv_a", "n_a").alias("conv_a_bp"),
        rate("conv_b", "n_b").alias("conv_b_bp"),
        "rev_a_cents", "rev_b_cents",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0)
               & (c > 0) & (c < n), z)
        .otherwise(F.lit(0)).cast("long").alias("z_bp"))
        .withColumn("lift_bp",
                    (F.col("conv_b_bp") - F.col("conv_a_bp"))
                    .cast("long"))
        .select("n_a", "n_b", "conv_a", "conv_b", "conv_a_bp",
                "conv_b_bp", "lift_bp", "rev_a_cents", "rev_b_cents",
                "z_bp"))


def ewma_weights(window: int = 14) -> list[int]:
    """Integer EWMA weights for decay 3/4: w_k = 3^(k-1) * 4^(W-k)
    for lag k = 1..W — exactly (3/4)^(k-1) scaled by 4^(W-1), so the
    weighted mean is one integer division and both engines agree bit
    for bit (no pow(), no float decay)."""
    return [3 ** (k - 1) * 4 ** (window - k) for k in range(1, window + 1)]


def ewma_anomalies(df: DataFrame, window: int = 14,
                   hi_bp: int = 15000, lo_bp: int = 6667,
                   time_col: str = "ts") -> DataFrame:
    """EWMA control chart over the daily event-count series — the
    smoothed-baseline anomaly detector beside x209's MAD (static
    robust band) and x210's CUSUM (mean-shift scan): each day is
    compared against the exponentially-weighted mean of the STRICTLY
    prior ``window`` days (decay 3/4, integer weights — see
    ``ewma_weights``), and flagged when the ratio dev_bp =
    10000*c*den div ewma_num leaves [lo_bp, hi_bp].

    Only full-window days are scored (the x187 full-trailing-day
    gating): a day needs all ``window`` prior days observed, so gaps
    in the series disqualify rather than silently reweight.

    Output: (day, c, ewma_c, dev_bp, flag) ordered by day.

    Scale: the corpus collapses to the daily series first; the lag
    fan-out is series x window rows joined back on the day index —
    no window function anywhere. Bound: c*den*10000 with den =
    4^W - 3^W ~ 2.7e8 at W=14 keeps bigints safe to ~3e9 events/day.
    """
    return ewma_from_daily(_daily_counts(df, time_col), window,
                           hi_bp, lo_bp)


def ewma_from_daily(d: DataFrame, window: int = 14,
                    hi_bp: int = 15000, lo_bp: int = 6667) -> DataFrame:
    """The EWMA chart tail over a (day, c) frame — shared with the
    persisted event-rollup index."""
    weights = ewma_weights(window)
    den = sum(weights)
    warr = F.array(*[F.lit(w).cast("long") for w in weights])
    lag = d.select("day", "c",
                   F.explode(F.sequence(F.lit(1), F.lit(window)))
                   .alias("lk"))
    j = (lag.alias("a")
         .join(d.select(F.col("day").alias("bday"),
                        F.col("c").alias("bc")).alias("b"),
               F.col("bday") == F.col("a.day") - F.col("lk"))
         .select(F.col("a.day").alias("day"), F.col("a.c").alias("c"),
                 (F.element_at(warr, F.col("lk")) * F.col("bc"))
                 .alias("wc")))
    g = (j.groupBy("day", "c")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("wc").alias("num"))
         .where(F.col("n") == window))
    dev = F.when(F.col("num") > 0,
                 F.expr(f"c * {den} * 10000 div num")) \
        .otherwise(F.lit(0)).cast("long")
    return (g.select("day", "c",
                     F.expr(f"num div {den}").cast("long")
                     .alias("ewma_c"),
                     dev.alias("dev_bp"))
            .withColumn("flag", (F.col("dev_bp") >= hi_bp)
                        | (F.col("dev_bp") <= lo_bp))
            .orderBy("day"))


def markov_backtest(df: DataFrame, test_mod: int = 3,
                    time_col: str = "ts", key_col: str = "user_id",
                    type_col: str = "event_type",
                    id_col: str = "event_id") -> DataFrame:
    """Next-event prediction backtest — the eval loop for x184's
    transition matrix (the x125/x142 discipline: method quality is
    itself a query): train the first-order Markov predictor
    (argmax next-type per src, ties to the lexicographically smallest
    dst) on users with ``user_id % test_mod != test_mod - 1`` and
    score it on the held-out users' transitions.

    Output: (src, predicted, n_test, n_correct, acc_bp), one row per
    src observed in BOTH splits (a src with no training transitions
    has no prediction to score), ordered by src.

    Scale: ONE per-user window builds the transition pairs (the
    natural clickstream partitioning); the predictor table is a
    |types|^2 aggregate with its rank window over those few rows, and
    rides a broadcast join back onto the held-out pairs.
    """
    ev = df.select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"),
                   F.col(id_col).alias("eid"),
                   F.col(type_col).alias("src"))
    w = Window.partitionBy("k").orderBy("us", "eid")
    pairs = (ev.withColumn("dst", F.lead("src").over(w))
             .where(F.col("dst").isNotNull())
             .select("k", "src", "dst"))
    is_test = (F.col("k") % test_mod) == (test_mod - 1)
    train = (pairs.where(~is_test).groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("n")))
    wr = Window.partitionBy("src").orderBy(F.desc("n"), "dst")
    pred = (train.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .select("src", F.col("dst").alias("predicted")))
    return (pairs.where(is_test)
            .join(F.broadcast(pred), "src")
            .groupBy("src", "predicted")
            .agg(F.count(F.lit(1)).alias("n_test"),
                 F.sum(F.when(F.col("dst") == F.col("predicted"), 1)
                       .otherwise(0)).cast("long").alias("n_correct"))
            .select("src", "predicted", "n_test", "n_correct",
                    F.expr("n_correct * 10000 div n_test")
                    .alias("acc_bp"))
            .orderBy("src"))


def variant_funnel(df: DataFrame, steps: tuple[str, ...],
                   time_col: str = "ts", key_col: str = "user_id",
                   type_col: str = "event_type") -> DataFrame:
    """The x181 ordered funnel split by experiment arm (variant =
    user_id % 2, the x225 assignment) — the experiment readout teams
    actually ship: WHERE in the funnel the treatment wins, not just
    whether the terminal conversion moved.

    Output: (variant, step_idx, step, n_users, conv_prev_bp,
    conv_first_bp) ordered by (variant, step_idx); conversions are
    within-arm (step 0 = 10000 per arm).

    Scale: the shared first-touch stage chain (one filtered scan +
    combinable MIN per user per step); the per-arm counts are a
    2-row-per-step aggregate and the conversion window runs over the
    2*len(steps)-row funnel frame.
    """
    ev = _base(df, time_col, key_col, type_col)
    rows = []
    for i, (s, stage) in enumerate(zip(steps, _funnel_stages(ev, steps))):
        rows.append(stage.groupBy((F.col("k") % 2).alias("variant"))
                    .agg(F.count(F.lit(1)).alias("n_users"))
                    .select("variant",
                            F.lit(i).cast("int").alias("step_idx"),
                            F.lit(s).alias("step"), "n_users"))
    fun = reduce(DataFrame.unionByName, rows)
    w = Window.partitionBy("variant").orderBy("step_idx")
    prev = F.lag("n_users").over(w)
    first = F.first("n_users").over(w)
    return (fun.withColumn("prev_n", prev).withColumn("first_n", first)
            .select("variant", "step_idx", "step", "n_users",
                    F.when(F.col("prev_n").isNull(), F.lit(10000))
                    .when(F.col("prev_n") > 0,
                          F.expr("n_users * 10000 div prev_n"))
                    .otherwise(F.lit(0))
                    .cast("long").alias("conv_prev_bp"),
                    F.when(F.col("step_idx") == 0, F.lit(10000))
                    .when(F.col("first_n") > 0,
                          F.expr("n_users * 10000 div first_n"))
                    .otherwise(F.lit(0))
                    .cast("long").alias("conv_first_bp"))
            .orderBy("variant", "step_idx"))


#: Latency CDF bucket edges in seconds (<1m, <10m, <1h, <1d, <7d,
#: >=7d) and their labels.
LATENCY_EDGES_S = (60, 600, 3600, 86400, 604800)
LATENCY_LABELS = ("<1m", "<10m", "<1h", "<1d", "<7d", ">=7d")


def latency_cdf(df: DataFrame, from_type: str = "signup",
                to_type: str = "purchase", time_col: str = "ts",
                key_col: str = "user_id") -> DataFrame:
    """Conversion-latency CDF: the x220 first-signup -> first
    strictly-later purchase latencies bucketed on a log-ish grid
    (<1m, <10m, <1h, <1d, <7d, >=7d) with cumulative share — the
    "how fast do converters convert" distribution behind x220's
    single-row summary (an SLA curve, not a mean).

    Output: (bucket_idx, bucket, n, cum_n, share_bp, cum_bp) ordered
    by bucket_idx; only observed buckets are emitted; shares are vs
    the converter total.

    Scale: the two filtered MIN-per-user passes + one user equi-join
    (the x220 chain), then a <= 6-row bucket aggregate; the
    cumulative window runs over those <= 6 rows; the total rides a
    1-row broadcast.
    """
    first_from = (df.where(F.col("event_type") == from_type)
                  .select(F.col(key_col).alias("k"),
                          F.unix_micros(F.col(time_col)).alias("us"))
                  .groupBy("k").agg(F.min("us").alias("t0")))
    lat = (df.where(F.col("event_type") == to_type)
           .select(F.col(key_col).alias("k"),
                   F.unix_micros(F.col(time_col)).alias("us"))
           .join(first_from, "k")
           .where(F.col("us") > F.col("t0"))
           .groupBy("k").agg(F.min("us").alias("t1"),
                             F.any_value("t0").alias("t0"))
           .select((F.col("t1") - F.col("t0")).alias("lat")))
    b = F.lit(len(LATENCY_EDGES_S))
    for i, e in reversed(list(enumerate(LATENCY_EDGES_S))):
        b = F.when(F.col("lat") < e * 1_000_000, i).otherwise(b)
    labels = F.array(*[F.lit(s) for s in LATENCY_LABELS])
    g = (lat.select(b.cast("int").alias("bucket_idx"))
         .groupBy("bucket_idx").agg(F.count(F.lit(1)).alias("n")))
    tot = g.agg(F.sum("n").alias("tot"))
    w = (Window.orderBy("bucket_idx")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (g.withColumn("cum_n", F.sum("n").over(w))
            .crossJoin(F.broadcast(tot))
            .select("bucket_idx",
                    F.element_at(labels, F.col("bucket_idx") + 1)
                    .alias("bucket"),
                    "n", "cum_n",
                    F.expr("n * 10000 div tot").alias("share_bp"),
                    F.expr("cum_n * 10000 div tot").alias("cum_bp"))
            .orderBy("bucket_idx"))


def stl_anomalies(df: DataFrame, z_bp_threshold: int = 35000,
                  time_col: str = "ts") -> DataFrame:
    """STL-lite decomposition anomalies over the daily series: each
    day is trend (centered 7-day moving mean) + day-of-week seasonal
    + residual, and residual outliers are flagged by the x209 MAD
    rule — the detector that survives BOTH a trend (which breaks
    x209's static median band) and a weekly rhythm (which x227's
    trailing EWMA half-absorbs).

    Everything stays integer by working in 7x units: t7 = sum of the
    7 centered days (gated on a full window, the x187 rule), r7 =
    7*c - t7, s7 = per-dow truncating mean of r7 (Spark ``div`` and
    DuckDB ``//`` both truncate toward zero — negative-safe by
    parity), e7 = r7 - s7, then doubled-median MAD on e7.

    Output: (day, c, t7, s7, e7, z_bp, is_anomaly) for fully-windowed
    days, ordered by day.

    Scale: daily collapse first; the +-3 fan-out, dow profile, and
    medians all run over the series frame, never the corpus.
    """
    return stl_from_daily(_daily_counts(df, time_col), z_bp_threshold)


def stl_from_daily(d: DataFrame,
                   z_bp_threshold: int = 35000) -> DataFrame:
    """The STL-lite tail over a (day, c) frame."""
    off = d.select("day", "c",
                   F.explode(F.sequence(F.lit(-3), F.lit(3)))
                   .alias("off"))
    t = (off.alias("a")
         .join(d.select(F.col("day").alias("bday"),
                        F.col("c").alias("bc")).alias("b"),
               F.col("bday") == F.col("a.day") + F.col("off"))
         .groupBy(F.col("a.day").alias("day"), F.col("a.c").alias("c"))
         .agg(F.count(F.lit(1)).alias("n"), F.sum("bc").alias("t7"))
         .where(F.col("n") == 7)
         .select("day", "c", "t7",
                 (F.col("c") * 7 - F.col("t7")).alias("r7")))
    s = (t.groupBy((F.col("day") % 7).alias("dow"))
         .agg(F.expr("sum(r7) div count(1)").cast("long").alias("s7")))
    e = (t.join(F.broadcast(s), (F.col("day") % 7) == F.col("dow"))
         .select("day", "c", "t7", "s7",
                 (F.col("r7") - F.col("s7")).alias("e7")))
    med = e.agg((F.percentile("e7", F.lit(0.5)) * 2)
                .cast("long").alias("med2"))
    dev = (e.crossJoin(F.broadcast(med))
           .withColumn("dev2", F.abs(F.col("e7") * 2 - F.col("med2"))))
    mad = dev.agg((F.percentile("dev2", F.lit(0.5)) * 2)
                  .cast("long").alias("mad2"))
    z = F.when(F.col("mad2") > 0,
               F.expr("dev2 * 10000 div mad2")).otherwise(F.lit(0))
    return (dev.crossJoin(F.broadcast(mad))
            .withColumn("z_bp", z.cast("long"))
            .select("day", "c", "t7", "s7", "e7", "z_bp",
                    (F.col("z_bp") > z_bp_threshold).alias("is_anomaly"))
            .orderBy("day"))


def anomaly_ensemble(df: DataFrame, mad_z_bp: int = 35000,
                     ewma_window: int = 14, ewma_hi_bp: int = 15000,
                     ewma_lo_bp: int = 6667, stl_z_bp: int = 35000,
                     time_col: str = "ts") -> DataFrame:
    """Anomaly-detector ensemble over the daily series: one row per
    day flagged by ANY of MAD (x209), EWMA chart (x227), or STL-lite
    residual (x235), with per-method booleans and the agreement count
    — the triage view an on-call reads (3 = certainly real, 1 = check
    which method's blind spot fired).

    A method that did not SCORE a day (EWMA/STL full-window gating)
    counts as not-flagged for that day — documented, matches the
    oracle.

    Output: (day, c, mad_flag, ewma_flag, stl_flag, n_methods) for
    days with n_methods >= 1, ordered by day.

    Scale: ONE daily collapse shared by all three methods; every
    downstream frame is series-sized.
    """
    d = _daily_counts(df, time_col)
    mad = (mad_anomalies_from_daily(d, mad_z_bp)
           .select("day", F.col("is_anomaly").alias("mad_flag")))
    ew = (ewma_from_daily(d, ewma_window, ewma_hi_bp, ewma_lo_bp)
          .select("day", F.col("flag").alias("ewma_flag")))
    stl = (stl_from_daily(d, stl_z_bp)
           .select("day", F.col("is_anomaly").alias("stl_flag")))
    out = (d.join(mad, "day", "left").join(ew, "day", "left")
           .join(stl, "day", "left")
           .select("day", "c",
                   F.coalesce("mad_flag", F.lit(False)).alias("mad_flag"),
                   F.coalesce("ewma_flag", F.lit(False)).alias("ewma_flag"),
                   F.coalesce("stl_flag", F.lit(False)).alias("stl_flag")))
    n = (F.col("mad_flag").cast("int") + F.col("ewma_flag").cast("int")
         + F.col("stl_flag").cast("int"))
    return (out.withColumn("n_methods", n)
            .where(F.col("n_methods") >= 1)
            .orderBy("day"))


def dow_hour_heatmap(df: DataFrame,
                     time_col: str = "ts") -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap (epoch-day % 7
    bucket identity x UTC hour) with each cell's share of all events
    — the traffic-shape dashboard behind capacity planning and the
    x191 seasonal profile.

    Output: (dow, hour, n, share_bp) ordered by (dow, hour); only
    observed cells are emitted.

    Scale: one map-side-combinable count over <= 168 cells; the
    total rides a 1-row broadcast.
    """
    cell = df.select(
        F.expr(f"unix_micros({time_col}) div {US_PER_DAY} % 7")
        .alias("dow"),
        F.expr(f"unix_micros({time_col}) div {US_PER_HOUR} % 24")
        .alias("hour"))
    g = cell.groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("n"))
    tot = g.agg(F.sum("n").alias("tot"))
    return (g.crossJoin(F.broadcast(tot))
            .select("dow", "hour", "n",
                    F.expr("n * 10000 div tot").alias("share_bp"))
            .orderBy("dow", "hour"))


def scd2_changes(df: DataFrame, key_col: str = "user_id",
                 state_col: str = "event_type", time_col: str = "ts",
                 seq_col: str = "event_id") -> DataFrame:
    """The SCD2 collapse half: per key, keep only rows whose state
    differs from their (ts, seq)-ordered predecessor. Idempotent —
    collapsing an already-collapsed change frame is a no-op — which
    is what makes the persisted-index merge exact: for event-time-
    partitioned batches (the streaming epoch contract),
    collapse(concat(collapse(b1), collapse(b2))) ==
    collapse(concat(b1, b2))."""
    w = Window.partitionBy(key_col).orderBy(time_col, seq_col)
    return (df.select(key_col, state_col, time_col, seq_col)
            .withColumn("prev", F.lag(state_col).over(w))
            .where(F.col("prev").isNull()
                   | (F.col("prev") != F.col(state_col)))
            .drop("prev"))


def scd2_dim(df: DataFrame, key_col: str = "user_id",
             state_col: str = "event_type", time_col: str = "ts",
             seq_col: str = "event_id") -> DataFrame:
    """SCD Type-2 dimension built from an event changelog — the
    warehouse pattern behind every versioned dimension (the reference
    feeds exactly such changelogs into its store; this is the history
    table the C16 latest-state view truncates).

    Per key, consecutive identical states collapse into one validity
    interval: rows where the state differs from its predecessor (by
    (ts, seq) order — seq is the within-timestamp tiebreak, Kafka's
    offset role) open a version at ``valid_from``; ``valid_to`` is the
    next change's start (NULL = current, half-open [from, to)
    intervals so versions tile the key's timeline exactly).

    Output: (key, state, valid_from, valid_to, version, is_current)
    ordered by (key, version).

    Scale: both windows share one (key)-partitioned shuffle and each
    partition holds one key's events — no global window, no driver
    state; the collapse drops the frame to changes-only before the
    lead/version pass.
    """
    changes = scd2_changes(df, key_col, state_col, time_col, seq_col)
    return scd2_dim_from_changes(changes, key_col, state_col,
                                 time_col, seq_col)


def scd2_dim_from_changes(changes: DataFrame,
                          key_col: str = "user_id",
                          state_col: str = "event_type",
                          time_col: str = "ts",
                          seq_col: str = "event_id") -> DataFrame:
    """The version/interval tail over an already-collapsed change
    frame — shared with the persisted SCD2 index's stored twin
    (scd2_index.py), so the store roundtrip is provable by the same
    oracle hash."""
    w = Window.partitionBy(key_col).orderBy(time_col, seq_col)
    return (changes
            .withColumn("valid_to", F.lead(time_col).over(w))
            .withColumn("version",
                        F.row_number().over(w).cast("int"))
            .select(F.col(key_col),
                    F.col(state_col).alias("state"),
                    F.col(time_col).alias("valid_from"),
                    "valid_to", "version",
                    F.when(F.col("valid_to").isNull(), 1).otherwise(0)
                    .cast("int").alias("is_current"))
            .orderBy(key_col, "version"))


def scd2_state_at(df: DataFrame, probe_type: str = "purchase",
                  key_col: str = "user_id",
                  state_col: str = "event_type", time_col: str = "ts",
                  seq_col: str = "event_id") -> DataFrame:
    """Point-in-time (as-of) enrichment against the SCD2 dimension:
    for each probe event, the state version in effect AT its
    timestamp — the PIT join every feature-store / training-data
    pipeline needs to avoid label leakage (state changes landing at
    the probe's own ts are visible, later ones are not).

    The half-open intervals make the lookup exact even when several
    changes share a timestamp: an empty [ts, ts) version can never
    match, so exactly one interval covers each probe.

    Output: (probe event_id, key, ts, state_at, state_version)
    ordered by event_id.

    Scale: an equi-join on the key with the interval predicate as the
    join filter — each probe meets only its own key's (bounded)
    version list, never a corpus×corpus product; at 100 TB both sides
    shuffle once on the key.
    """
    dim = scd2_dim(df, key_col, state_col, time_col, seq_col)
    probes = (df.where(F.col(state_col) == probe_type)
              .select(F.col(seq_col).alias("probe_id"),
                      F.col(key_col), F.col(time_col).alias("p_ts")))
    return scd2_state_at_from_dim(dim, probes, key_col)


def scd2_state_at_from_dim(dim: DataFrame, probes: DataFrame,
                           key_col: str = "user_id") -> DataFrame:
    """The PIT-join tail over a built SCD2 dimension and a
    (probe_id, key, p_ts) probe frame — shared with the persisted
    index's stored twin."""
    cond = ((F.col("valid_from") <= F.col("p_ts"))
            & (F.col("valid_to").isNull()
               | (F.col("p_ts") < F.col("valid_to"))))
    return (probes.join(dim, key_col).where(cond)
            .select(F.col("probe_id").alias("event_id"),
                    F.col(key_col), F.col("p_ts").alias("ts"),
                    F.col("state").alias("state_at"),
                    F.col("version").alias("state_version"))
            .orderBy("event_id"))


def trend_fit(df: DataFrame, time_col: str = "ts",
              type_col: str = "event_type") -> DataFrame:
    """Per-series OLS trend over the daily count series — the
    "is this metric growing?" regression a monitoring stack fits
    before alerting on slope (the x192 backtest's model-zero).

    The series is densified over the GLOBAL [min_day, max_day] spine
    (missing days are real zeros for a count series) so every type
    fits over the same x axis. Slope/intercept come from exact
    integer moments (truncating µunit division, identical in both
    engines); R² is the one floor-on-double at the end, the x190
    discipline: r2_bp = floor(10⁴·(num/denx)·(num/deny)).

    Output per type: (t, n_days, sum_y, slope_u, intercept_u, r2_bp)
    ordered by t.

    Scale: the corpus collapses to |types|×|days| daily counts (one
    combinable aggregate); the spine explode and the moment sums run
    over that tiny frame. Moment products stay bigint-safe to ~3e9
    events/day on a 10-year series.
    """
    d = (df.select(F.col(type_col).alias("t"),
                   F.expr(f"unix_micros({time_col}) div {US_PER_DAY}")
                   .alias("day"))
         .groupBy("t", "day").agg(F.count(F.lit(1)).alias("c")))
    return trend_from_daily(d)


def trend_from_daily(d: DataFrame) -> DataFrame:
    """The OLS tail over a (t, day, c) per-type daily-count frame —
    shared with the persisted event-rollup index's stored twin."""
    rng = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = d.select("t").distinct()
    spine = (types.crossJoin(F.broadcast(rng))
             .select("t", "d0",
                     F.explode(F.sequence(
                         F.lit(0),
                         (F.col("d1") - F.col("d0")).cast("int")))
                     .alias("x")))
    yy = (spine.join(d.withColumnRenamed("t", "dt"),
                     (F.col("dt") == F.col("t"))
                     & (F.col("day") == F.col("d0") + F.col("x")),
                     "left")
          .select("t", "x", F.coalesce("c", F.lit(0)).alias("y")))
    m = (yy.groupBy("t")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    icn = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r2 = F.when((den > 0) & (deny > 0),
                F.floor(F.lit(10000.0)
                        * (num.cast("double") / den.cast("double"))
                        * (num.cast("double") / deny.cast("double"))))\
        .otherwise(F.lit(0))
    return (m.select(
        "t", F.col("n").alias("n_days"),
        F.col("sy").alias("sum_y"),
        F.when(den > 0, (num * 1_000_000).cast("long"))
        .otherwise(F.lit(0)).alias("_sl_num"),
        den.alias("_den"), (icn * 1_000_000).cast("long").alias("_ic"),
        r2.cast("long").alias("r2_bp"))
        .selectExpr("t", "n_days", "sum_y",
                    "CASE WHEN _den > 0 THEN _sl_num div _den "
                    "ELSE 0 END AS slope_u",
                    "CASE WHEN _den > 0 THEN _ic div _den "
                    "ELSE 0 END AS intercept_u", "r2_bp")
        .orderBy("t"))
