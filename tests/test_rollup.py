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


def test_update_rollup_equals_full_rebuild(spark):
    """Incremental maintenance with OVERLAPPING days: merging the late
    batch re-aggregates only touched (group, day) keys and the result
    matches a one-shot build over the full history."""
    from kafana_spark.rollup import update_rollup

    ev = events(spark)
    first = ev.where(F.col("ds") <= "2024-01-15")
    late = ev.where(F.col("ds") > "2024-01-10")      # overlaps 5 days
    full = ev.where(F.col("ds") <= "2024-01-15") \
        .unionByName(ev.where(F.col("ds") > "2024-01-10"))

    base = build_rollup(first, by=("event_type",), value_col="value",
                        distinct_cols=("user_id",))
    merged = update_rollup(base, late, by=("event_type",),
                           value_col="value", distinct_cols=("user_id",))
    expect = build_rollup(full, by=("event_type",), value_col="value",
                          distinct_cols=("user_id",))

    got = {(r.event_type, r.ds): r for r in merged.collect()}
    exp = {(r.event_type, r.ds): r for r in expect.collect()}
    assert set(got) == set(exp)
    for k, er in exp.items():
        assert got[k].cnt == er.cnt
        assert abs(got[k].sum_value - er.sum_value) < 1e-6
        assert got[k].min_value == er.min_value
        assert got[k].max_value == er.max_value


def test_update_rollup_unions_only_touched_keys(spark):
    """Untouched (group, day) rollup rows pass through the anti-join
    branch byte-identically (no re-aggregation of old partials)."""
    from kafana_spark.rollup import update_rollup

    ev = events(spark)
    base = build_rollup(ev.where(F.col("ds") <= "2024-01-10"),
                        by=("event_type",), value_col="value")
    late = ev.where(F.col("ds") == "2024-01-10")      # touches 1 day
    merged = update_rollup(base, late, by=("event_type",),
                           value_col="value")
    untouched_before = {(r.event_type, r.ds): r.cnt for r in base
                        .where(F.col("ds") < "2024-01-10").collect()}
    untouched_after = {(r.event_type, r.ds): r.cnt for r in merged
                       .where(F.col("ds") < "2024-01-10").collect()}
    assert untouched_before == untouched_after
    doubled = {r.event_type: r.cnt for r in merged
               .where(F.col("ds") == F.lit("2024-01-10").cast("date"))
               .collect()}
    single = {r.event_type: r.cnt for r in base
              .where(F.col("ds") == F.lit("2024-01-10").cast("date"))
              .collect()}
    assert doubled == {k: 2 * v for k, v in single.items()}


def test_rollup_stream_sink_maintains_parquet(spark, tmp_path):
    """foreachBatch sink: two manual batch invocations leave a rollup
    equal to a one-shot build over both batches."""
    from kafana_spark.rollup import rollup_stream_sink

    tune_session(spark)
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("event_type", "ts", "value")
    b1 = ev.where(F.to_date("ts") <= "2024-01-10")
    b2 = ev.where(F.to_date("ts") > "2024-01-08")
    out = str(tmp_path / "rollup")
    sink = rollup_stream_sink(out, by=("event_type",), time_col="ts",
                              value_col="value")
    sink(b1, 0)
    sink(b2, 1)
    got = {(r.event_type, r.ds): (r.cnt, round(r.sum_value, 6))
           for r in spark.read.parquet(out).collect()}
    expect_df = build_rollup(
        b1.unionByName(b2).withColumn("ds", F.to_date("ts")),
        by=("event_type",), value_col="value")
    exp = {(r.event_type, r.ds): (r.cnt, round(r.sum_value, 6))
           for r in expect_df.collect()}
    assert got == exp


def test_date_histogram_gapfill_zero_buckets(spark):
    from kafana_spark import query
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 5),),
         (datetime.datetime(2024, 1, 1, 7),),
         (datetime.datetime(2024, 1, 4, 2),)], "ts timestamp")
    out = [(r["bucket"].day, r["cnt"])
           for r in query.date_histogram_gapfill(df, "ts").collect()]
    assert out == [(1, 2), (2, 0), (3, 0), (4, 1)]


def test_streaming_topk_from_rollup(spark, tmp_path):
    """Continuous top-k: after N micro-batches through the rollup sink,
    the rollup-served top-k equals the exact top-k over the full raw
    history — the streaming-top-k contract without complete-mode sorts."""
    from kafana_spark.rollup import rollup_stream_sink, topk_from_rollup

    tune_session(spark)
    ev = load_table(spark, SF_SMOKE, "events") \
        .select("event_type", "ts", "value")
    batches = [ev.where(F.dayofmonth("ts") % 3 == i) for i in range(3)]
    out = str(tmp_path / "rollup")
    sink = rollup_stream_sink(out, by=("event_type",), time_col="ts",
                              value_col="value")
    for i, b in enumerate(batches):
        sink(b, i)

    got = [(r.event_type, r.cnt) for r in
           topk_from_rollup(spark.read.parquet(out), k=3,
                            by=("event_type",)).collect()]
    exp = [(r.event_type, r.cnt) for r in
           ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.col("cnt").desc(), "event_type").limit(3).collect()]
    assert got == exp


# --------------------------------------------------- count-min sketch

def test_cms_never_undercounts_and_tight_on_top_terms(spark):
    from kafana_spark.rollup import cms_estimate, cms_sketch

    d = load_table(spark, SF_SMOKE, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    exact = {r.t: r.n for r in
             toks.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.col("n").desc(), "t").limit(50).collect()}
    terms = spark.createDataFrame([(t,) for t in exact], ["t"])
    est = {r.t: r.cms_cnt for r in
           cms_estimate(cms_sketch(d, "text"), terms).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)   # CM never undercounts
    # point error bound is e·N/w per row; on this fixture the top-term
    # estimates should be near-exact — allow 5% slack
    assert sum(est[t] == exact[t] for t in exact) >= 0.8 * len(exact)


def test_cms_merge_equals_one_shot_sketch(spark):
    from kafana_spark.rollup import cms_merge, cms_sketch

    d = load_table(spark, SF_SMOKE, "documents")
    a = cms_sketch(d.where(F.col("doc_id") % 2 == 0), "text")
    b = cms_sketch(d.where(F.col("doc_id") % 2 != 0), "text")
    merged = {(r.j, r.b): r.cnt for r in cms_merge(a, b).collect()}
    full = {(r.j, r.b): r.cnt for r in cms_sketch(d, "text").collect()}
    assert merged == full


def test_cms_stream_sink_redelivery_equals_one_shot(spark, tmp_path):
    from kafana_spark.rollup import cms_from_store, cms_sketch, cms_stream_sink

    d = load_table(spark, SF_SMOKE, "documents")
    root = str(tmp_path / "cms")
    sink = cms_stream_sink(root)
    batches = [d.where(F.col("doc_id") % 3 == i) for i in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    sink(batches[1], 1)          # at-least-once redelivery
    sink(batches[2], 2)
    got = {(r.j, r.b): r.cnt for r in cms_from_store(spark, root).collect()}
    full = {(r.j, r.b): r.cnt for r in cms_sketch(d, "text").collect()}
    assert got == full
