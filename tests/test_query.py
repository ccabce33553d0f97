"""Query API tests (the Kibana/ES surface, SURVEY.md §2.C) over the
testdata events table and small synthetic frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafana_spark import query as Q
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_discover_time_range_newest_first(spark):
    t0 = dt.datetime(2024, 1, 2)
    t1 = dt.datetime(2024, 1, 3)
    rows = Q.discover(events(spark), t0, t1, n=10, time_col="ts").collect()
    assert 0 < len(rows) <= 10
    ts = [r.ts for r in rows]
    assert ts == sorted(ts, reverse=True)
    assert all(t0 <= t < t1 for t in ts)


def test_discover_with_filters(spark):
    rows = Q.discover(events(spark), filters=[F.col("event_type") == "error"],
                      n=5, time_col="ts").collect()
    assert all(r.event_type == "error" for r in rows)


def test_search_key_and_topics(spark):
    df = events(spark).withColumn("key", F.col("user_id").cast("string")) \
        .withColumn("topic", F.lit("events"))
    assert Q.search_key(df, "13").count() > 0
    assert Q.search_key(df, "13", topics=["nope"]).count() == 0


def test_search_text_substring_vs_token(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sub = Q.search_text(docs, "window", field="text").count()
    tok = Q.search_text(docs, "window", field="text", token=True).count()
    assert sub >= tok > 0


def test_exists(spark):
    assert Q.exists(events(spark), "props").count() == events(spark).count()


def test_paginate_is_disjoint_and_ordered(spark):
    ev = events(spark)
    p0 = [r.event_id for r in Q.paginate(ev, [F.col("event_id")], 0, 20).collect()]
    p1 = [r.event_id for r in Q.paginate(ev, [F.col("event_id")], 1, 20).collect()]
    assert len(p0) == len(p1) == 20
    assert set(p0).isdisjoint(p1)
    assert max(p0) < min(p1)


def test_terms_top_n(spark):
    rows = Q.terms(events(spark), "event_type", n=3).collect()
    assert len(rows) == 3
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_date_histogram_buckets_cover_all_rows(spark):
    ev = events(spark)
    rows = Q.date_histogram(ev, "1 day", time_col="ts").collect()
    assert sum(r.cnt for r in rows) == ev.count()
    starts = [r.bucket_start for r in rows]
    assert starts == sorted(starts)


def test_metrics_matches_manual_agg(spark):
    ev = events(spark)
    m = Q.metrics(ev, "value").collect()[0]
    exact = ev.agg(F.count("value"), F.min("value"), F.max("value")).collect()[0]
    assert (m.cnt, m.min_v, m.max_v) == tuple(exact)


def test_cardinality_exact_vs_approx(spark):
    ev = events(spark)
    exact = Q.cardinality(ev, "user_id", exact=True).collect()[0].cardinality
    approx = Q.cardinality(ev, "user_id").collect()[0].cardinality
    assert exact == ev.select("user_id").distinct().count()
    assert abs(approx - exact) <= max(2, 0.1 * exact)


def test_percentiles_exact_within_range(spark):
    ev = events(spark)
    p = Q.percentiles(ev, "value", qs=(0.5,), exact=True).collect()[0].p50
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    assert lo <= p <= hi


def test_top_hits_latest_per_user(spark):
    ev = events(spark)
    th = Q.top_hits(ev, ["user_id"], [F.col("ts").desc()], k=1)
    assert th.count() == ev.select("user_id").distinct().count()


def test_histogram_bucket_math(spark):
    rows = Q.histogram(events(spark), "value", 100.0).collect()
    assert all(r.bucket % 100 == 0 for r in rows)
    assert sum(r.cnt for r in rows) == events(spark).where(
        F.col("value").isNotNull()).count()


def test_search_after_keyset_pagination(spark):
    """Keyset pages must tile the full sorted sequence exactly, and the
    keyset filter must reach the scan (pushdown) unlike window-based
    from/size."""
    from kafana_spark.sources.tables import load_table
    from kafana_spark import query as q

    ev = load_table(spark, SF_SMOKE, "events").select("event_id")
    all_ids = sorted(r.event_id for r in ev.collect())

    got, last = [], -1
    while True:
        page = [r.event_id for r in
                q.search_after(ev, "event_id", last, 400).collect()]
        if not page:
            break
        got.extend(page)
        last = page[-1]
    assert got == all_ids

    plan = (q.search_after(ev, "event_id", 50, 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "GreaterThan(event_id,50)" in plan
