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
    stage = (ev.where(F.col("t") == steps[0])
             .groupBy("k").agg(F.min("us").alias("t0")))
    rows = []
    for i, s in enumerate(steps):
        if i > 0:
            stage = (ev.where(F.col("t") == s)
                     .join(stage.select("k", "t0"), "k")
                     .where(F.col("us") > F.col("t0"))
                     .groupBy("k").agg(F.min("us").alias("t0")))
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
    quartiles by the x158 integer-percentile rule — pct_bp =
    10000·(rk−1) div (n−1) over a deterministic (metric, user) order
    — and the output is the segment-level rollup.

    Output: (r_q, f_q, m_q, n_users, monetary_cents) ≤ 64 rows.

    Scale: per-user metrics are one combinable agg over events; the
    three rank windows run on the USER frame (users ≪ events — the
    exact-percentile price, same tradeoff as lang_fair_gate; a
    two-phase histogram cut drops in when users alone overflow a
    partition). The global max-day is a 1-row broadcast cross join.
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

    def quart(col: str) -> F.Column:
        w = Window.orderBy(col, "k")
        rk = F.row_number().over(w).cast("long")
        n = F.count(F.lit(1)).over(Window.partitionBy())
        pct = F.when(n > 1, (F.lit(10000) * (rk - 1))
                     .cast("long") / (n - 1)).otherwise(F.lit(0))
        pct = F.floor(pct).cast("long")
        return (F.lit(1) + (pct >= 2500).cast("int")
                + (pct >= 5000).cast("int")
                + (pct >= 7500).cast("int")).alias(f"{col}_q")

    q = u.select("k", "mon", quart("rec"), quart("freq"), quart("mon"))
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
