"""Rollup (continuous-aggregate) correctness: exact partials merge
losslessly, HLL sketches merge within tolerance, and incremental
(union-of-builds) maintenance equals a one-shot build."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafana_spark.rollup import build_rollup, rollup_range
from kafana_spark.session import tune_session
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

DS0, DS1 = "2024-01-05", "2024-01-20"


def events(spark):
    tune_session(spark)
    ev = load_table(spark, SF_SMOKE, "events")
    return ev.select("event_type", F.to_date("ts").alias("ds"),
                     "value", "user_id")


def exact(spark):
    ev = events(spark)
    return (ev.where((F.col("ds") >= DS0) & (F.col("ds") <= DS1))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("value").alias("sum_value"),
                 F.countDistinct("user_id").alias("ndv")))


def test_rollup_range_exact_metrics_match_raw(spark):
    ev = events(spark)
    ru = build_rollup(ev, by=("event_type",), value_col="value",
                      distinct_cols=("user_id",))
    got = rollup_range(ru, DS0, DS1, by=("event_type",),
                       value_col="value", distinct_cols=("user_id",))
    g = {r.event_type: r for r in got.collect()}
    e = {r.event_type: r for r in exact(spark).collect()}
    assert set(g) == set(e)
    for et, er in e.items():
        assert g[et].cnt == er.cnt
        assert abs(g[et].sum_value - er.sum_value) < 1e-6
        # HLL at lgK=12: ~1.6% rse; allow 5%
        assert abs(g[et].ndv_user_id - er.ndv) <= max(3, 0.05 * er.ndv)


def test_incremental_builds_merge_like_one_shot(spark):
    """Rollup maintenance: build over two disjoint slices, union, and
    the range query answers identically (partials + sketches merge
    associatively)."""
    ev = events(spark)
    a = build_rollup(ev.where(F.col("user_id") % 2 == 0),
                     by=("event_type",), value_col="value",
                     distinct_cols=("user_id",))
    b = build_rollup(ev.where(F.col("user_id") % 2 == 1),
                     by=("event_type",), value_col="value",
                     distinct_cols=("user_id",))
    merged = rollup_range(a.unionByName(b), DS0, DS1, by=("event_type",),
                          value_col="value", distinct_cols=("user_id",))
    one = build_rollup(ev, by=("event_type",), value_col="value",
                       distinct_cols=("user_id",))
    oneshot = rollup_range(one, DS0, DS1, by=("event_type",),
                           value_col="value", distinct_cols=("user_id",))
    m = {r.event_type: r for r in merged.collect()}
    o = {r.event_type: r for r in oneshot.collect()}
    assert set(m) == set(o)
    for et in o:
        assert m[et].cnt == o[et].cnt
        assert abs(m[et].sum_value - o[et].sum_value) < 1e-6
        # sketch union is exact over the SAME underlying values
        assert m[et].ndv_user_id == o[et].ndv_user_id
