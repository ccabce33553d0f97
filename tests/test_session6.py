"""Session-6 additions (x225-x231) closed-form semantics.

Pinned behaviors:
- ab_test_report: variant = user_id % 2; converter = >=1 conv event;
  revenue = floor(value*100) cents summed over conv events; z = the
  pooled two-proportion statistic, 0 on degenerate splits; z sign
  follows B minus A.
- pmi_collocations: pairs below min_count never surface; PMI orders
  exclusive pairs above promiscuous ones; rank ties break (w1, w2).
- ewma: decay-3/4 integer weights; only full-window days scored
  (gaps disqualify); flag at ratio band edges inclusive.
- markov_backtest: predictor trained only on non-held-out users;
  argmax ties break to smallest dst; held-out srcs without training
  rows are dropped.
- link_prediction: existing edges never appear; RA = sum 1e6 div
  deg(m) over common neighbours; canonical a < b.
- layout_advisor: a perfectly-clustered column reports cluster_bp
  10000; a value striped across every block reports n_blocks per
  value.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafana_spark.operators import events as ev
from kafana_spark.operators import skew
from kafana_spark.operators.similarity import link_prediction_from_edges
from kafana_spark.operators.text import pmi_collocations

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def make(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, e, v) for i, (t, u, e, v) in enumerate(rows)], COLS)


def test_ab_test_counts_and_degenerate_z(spark):
    # u0/u2 arm A (even), u1/u3 arm B; only u1 converts, 2.5 -> 250c.
    rows = [
        (ts(0), 0, "view", 1.0), (ts(1), 2, "view", 1.0),
        (ts(0), 1, "purchase", 2.5), (ts(1), 3, "view", 1.0),
    ]
    r = ev.ab_test_report(make(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (2, 2, 0, 1)
    assert (r.conv_a_bp, r.conv_b_bp, r.lift_bp) == (0, 5000, 5000)
    assert (r.rev_a_cents, r.rev_b_cents) == (0, 250)
    assert r.z_bp > 0  # B converts more -> positive z

    # unanimous conversion -> degenerate, z = 0
    rows2 = [(ts(0), 0, "purchase", 1.0), (ts(0), 1, "purchase", 1.0)]
    assert ev.ab_test_report(make(spark, rows2)).collect()[0].z_bp == 0


def test_pmi_prefers_exclusive_pairs(spark):
    # "aa bb" always together (exclusive); "cc" promiscuous.
    docs = spark.createDataFrame(
        [(i, "aa bb") for i in range(5)]
        + [(10 + i, "cc dd") for i in range(5)]
        + [(20 + i, "cc ee") for i in range(5)],
        ["doc_id", "text"])
    out = pmi_collocations(docs, min_count=5, k=10).collect()
    assert out[0].w1 == "aa" and out[0].w2 == "bb"
    pairs = {(r.w1, r.w2): r.pmi_u for r in out}
    assert pairs[("aa", "bb")] > pairs[("cc", "dd")]
    # below min_count never surfaces
    assert ("zz", "zz") not in pairs


def test_ewma_full_window_gating_and_flat_series(spark):
    d = spark.createDataFrame(
        [(i, 100) for i in range(20)], ["day", "c"])
    out = ev.ewma_from_daily(d, window=14).collect()
    # days 0..13 lack a full 14-day history
    assert [r.day for r in out] == list(range(14, 20))
    for r in out:  # flat series: ewma == level, ratio exactly 10000
        assert r.ewma_c == 100 and r.dev_bp == 10000 and not r.flag
    # a gap disqualifies every day whose window spans it: drop day 5
    # -> only days 20..24 still have 14 observed prior days
    d2 = spark.createDataFrame(
        [(i, 100) for i in range(25) if i != 5], ["day", "c"])
    out2 = ev.ewma_from_daily(d2, window=14).collect()
    assert [r.day for r in out2] == list(range(20, 25))


def test_ewma_spike_flags(spark):
    d = spark.createDataFrame(
        [(i, 100) for i in range(14)] + [(14, 200)], ["day", "c"])
    r = ev.ewma_from_daily(d, window=14).collect()[0]
    assert r.dev_bp == 20000 and r.flag


def test_markov_backtest_argmax_and_holdout(spark):
    # users 0,1,3,4 train (mod 3 != 2); user 2 held out.
    rows = []
    for u in (0, 1, 3, 4):
        rows += [(ts(0), u, "a", 1.0), (ts(1), u, "b", 1.0)]
    rows += [(ts(0), 2, "a", 1.0), (ts(1), 2, "b", 1.0),
             (ts(2), 2, "b", 1.0)]  # b->b never trained -> dropped
    out = ev.markov_backtest(make(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src, r.predicted, r.n_test, r.n_correct, r.acc_bp) == \
        ("a", "b", 1, 1, 10000)


def test_link_prediction_scores_open_triangle(spark):
    # path 1-2-3 plus 1-4: open pairs (1,3) via 2, (2,4) via 1,
    # (3,4) via 1? no: 3's neighbours {2}; 4's {1} -> no shared m.
    mu = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], ["a", "b"])
    out = {(r.a, r.b): r for r in
           link_prediction_from_edges(mu, top_k=10).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    # middle 2 has deg 2 -> ra 500000; middle 1 has deg 2 -> 500000
    assert out[(1, 3)].ra_u == 500000 and out[(1, 3)].n_common == 1
    assert out[(2, 4)].ra_u == 500000


def test_layout_advisor_clustered_vs_striped(spark):
    # 4 blocks of 2 rows; "sorted" clusters per block, "striped"
    # alternates two values across every block.
    rows = [(i, i // 2, i % 2) for i in range(8)]
    df = spark.createDataFrame(rows, ["rid", "sorted_v", "striped_v"])
    out = {r.col_name: r for r in skew.layout_advisor(
        df, [("sorted", F.col("sorted_v")),
             ("striped", F.col("striped_v"))],
        block_rows=2, row_id_col="rid").collect()}
    s = out["sorted"]
    assert (s.n_vals, s.n_blocks, s.val_blocks) == (4, 4, 4)
    assert s.cluster_bp == 10000 and s.scan_share_bp == 2500
    t = out["striped"]
    assert t.val_blocks == 8  # each of 2 values in all 4 blocks
    assert t.ideal_blocks == 4 and t.cluster_bp == 20000
    assert t.scan_share_bp == 10000


def test_column_stats_quantile_rule_and_nulls(spark):
    from kafana_spark.operators.stats import column_stats
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 10, 20, 30, None])],
        ["rid", "m"])
    out = {r.field: r for r in column_stats(
        df, [("rid", F.col("rid"), False),
             ("m", F.col("m"), True)]).collect()}
    m = out["m"]
    assert (m.n, m.n_null, m.ndv, m.min_v, m.max_v) == (5, 1, 3, 10, 30)
    # nn=4: p25 -> rank ceil(1)=1 -> 10; p50 -> rank 2 -> 10;
    # p75 -> rank 3 -> 20
    assert (m.p25, m.p50, m.p75) == (10, 10, 20)
    r = out["rid"]
    assert r.ndv == 5 and r.p25 is None  # quantiles not requested


def test_variant_funnel_within_arm_conversion(spark):
    rows = [
        # arm A (u0): full funnel; arm B (u1): stops after view
        (ts(0), 0, "view", 1.0), (ts(1), 0, "click", 1.0),
        (ts(2), 0, "purchase", 1.0),
        (ts(0), 1, "view", 1.0),
    ]
    out = {(r.variant, r.step): r for r in ev.variant_funnel(
        make(spark, rows), ("view", "click", "purchase")).collect()}
    assert out[(0, "view")].n_users == 1
    assert out[(0, "purchase")].conv_first_bp == 10000
    assert out[(1, "view")].conv_prev_bp == 10000
    assert (1, "click") not in out  # arm B never clicked


def test_latency_cdf_buckets_and_cumulative(spark):
    rows = [(ts(0), 1, "signup", 1.0), (ts(0.5), 1, "purchase", 1.0),
            (ts(0), 2, "signup", 1.0), (ts(30), 2, "purchase", 1.0),
            (ts(0), 3, "signup", 1.0)]  # u3 never converts
    out = ev.latency_cdf(make(spark, rows)).collect()
    assert [(r.bucket_idx, r.bucket, r.n, r.cum_n) for r in out] == \
        [(0, "<1m", 1, 1), (2, "<1h", 1, 2)]
    assert out[-1].cum_bp == 10000


def test_stl_separates_trend_and_seasonality(spark):
    # pure weekly rhythm on a flat level: residuals all 0, no flags
    d = spark.createDataFrame(
        [(i, 100 + (50 if i % 7 == 0 else 0)) for i in range(28)],
        ["day", "c"])
    out = ev.stl_from_daily(d).collect()
    assert [r.day for r in out] == list(range(3, 25))
    assert all(r.e7 == 0 and not r.is_anomaly for r in out)
    # one genuine spike on the rhythm -> that day's residual flags
    d2 = spark.createDataFrame(
        [(i, (100 + (50 if i % 7 == 0 else 0))
          * (3 if i == 10 else 1)) for i in range(28)],
        ["day", "c"])
    flagged = [r.day for r in ev.stl_from_daily(d2).collect()
               if r.is_anomaly]
    assert 10 in flagged


def test_anomaly_ensemble_counts_methods(spark):
    import datetime as dtm
    base = dtm.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        # wiggly baseline (keeps mad2 > 0) with a big spike on day 25
        n = 1000 if day == 25 else 100 + day % 5
        for j in range(n):
            rows.append((eid, base + dtm.timedelta(days=day,
                                                   minutes=j % 1440),
                         1, "view", 1.0))
            eid += 1
    df = spark.createDataFrame(rows, COLS)
    out = {r.day: r for r in ev.anomaly_ensemble(df).collect()}
    spike_day = base.toordinal() - dtm.date(1970, 1, 1).toordinal() + 25
    spike = out[spike_day]
    assert spike.mad_flag and spike.ewma_flag
    assert spike.n_methods >= 2


def test_langid_confusion_rows_normalize(spark):
    from kafana_spark.operators.text import langid_confusion
    docs = spark.createDataFrame(
        [(1, "en", "the of and to a"), (2, "en", "the of in is"),
         (3, "de", "der die und das")],
        ["doc_id", "lang", "text"])
    out = {(r.lang, r.pred_lang): r for r in
           langid_confusion(docs).collect()}
    assert out[("en", "en")].n == 2
    assert out[("en", "en")].share_bp == 10000
    assert out[("de", "de")].share_bp == 10000


def test_doc_metric_corr_perfect_and_degenerate(spark):
    from kafana_spark.operators.text import doc_metric_corr
    # n_chars == 10*n_tokens (r=1); n_distinct constant (r=0)
    docs = spark.createDataFrame(
        [(1, "a b", 20), (2, "a b c", 30), (3, "a b c d", 40)],
        ["doc_id", "text", "n_chars"])
    out = {(r.m1, r.m2): r.r_bp for r in doc_metric_corr(docs).collect()}
    assert out[("n_chars", "n_tokens")] == 10000
    # n_distinct == n_tokens here (all tokens distinct) -> also 1
    assert out[("n_tokens", "n_distinct")] == 10000
    docs2 = spark.createDataFrame(
        [(1, "a a", 20), (2, "a a a", 30)],
        ["doc_id", "text", "n_chars"])  # n_distinct constant = 1
    out2 = {(r.m1, r.m2): r.r_bp
            for r in doc_metric_corr(docs2).collect()}
    assert out2[("n_chars", "n_distinct")] == 0  # degenerate guard


def test_dow_hour_heatmap_buckets(spark):
    import datetime as dtm
    base = dtm.datetime(1970, 1, 1)  # epoch day 0 -> dow 0
    rows = [(0, base.replace(hour=5), 1, "view", 1.0),
            (1, base.replace(hour=5), 2, "view", 1.0),
            (2, base + dtm.timedelta(days=1, hours=7), 3, "view", 1.0)]
    df = spark.createDataFrame(rows, COLS)
    out = {(r.dow, r.hour): r for r in ev.dow_hour_heatmap(df).collect()}
    assert out[(0, 5)].n == 2 and out[(0, 5)].share_bp == 6666
    assert out[(1, 7)].n == 1


# ---------------------------------------------------------------- s9:
# Benford digit audit + 1R decision stump (x291/x292)

def test_benford_digits_densifies_and_matches_constants(spark):
    from kafana_spark.operators.stats import BENFORD_BP, benford_digits

    # cents values with leading digits 1,1,2,9; zero/negative dropped
    df = spark.createDataFrame(
        [(100,), (19999,), (250,), (90,), (0,), (-5,)], ["c"])
    out = {r.digit: r for r in benford_digits(df, F.col("c")).collect()}
    assert len(out) == 9                       # spine densifies 3..8
    assert out[1].n_obs == 2 and out[1].obs_bp == 5000
    assert out[2].n_obs == 1 and out[9].n_obs == 1
    assert out[3].n_obs == 0 and out[3].obs_bp == 0
    for d in range(1, 10):
        assert out[d].exp_bp == BENFORD_BP[d - 1]
        assert out[d].dev_bp == out[d].obs_bp - out[d].exp_bp


def test_best_stump_finds_separating_threshold(spark):
    from kafana_spark.operators.stats import best_stump

    # y = 1 exactly when f >= 10: perfect split at threshold 5
    rows = [(1, 0), (3, 0), (5, 0), (10, 1), (12, 1), (20, 1)]
    df = spark.createDataFrame(rows, ["f", "y"])
    out = best_stump(df, F.col("f"), F.col("y"), top_k=2).collect()
    best = out[0]
    assert best.threshold == 5
    assert (best.n_left, best.pos_left) == (3, 0)
    assert (best.n_right, best.pos_right) == (3, 3)
    # perfect purity: 1e6*(0+9)/3 + 1e6*(9+0)/3 = 6e6
    assert best.score_u == 6_000_000
    assert best.acc_bp == 10000
    # runner-up is strictly worse
    assert out[1].score_u < best.score_u


def test_best_stump_right_side_never_empty(spark):
    from kafana_spark.operators.stats import best_stump

    df = spark.createDataFrame([(1, 0), (2, 1)], ["f", "y"])
    out = best_stump(df, F.col("f"), F.col("y"), top_k=10).collect()
    assert [r.threshold for r in out] == [1]   # f=2 split excluded
