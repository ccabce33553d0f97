"""ES bucket/pipeline aggregation surface (query.py x40-x44 APIs) and
the training-pipeline consumption ops (chunk_dedup, canonical_per_cluster,
shard_assign)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafana_spark import query
from kafana_spark.operators import dedup, sample, text


def _events(spark):
    rows = []
    for d in range(3):
        for i in range(d + 1):  # 1, 2, 3 events on days 0..2
            rows.append((datetime.datetime(2024, 1, 1 + d, 10, i), 10.0))
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_pipeline_aggs_values(spark):
    out = query.pipeline_aggs(_events(spark), "ts", "value",
                              unit="day", ma_buckets=2)
    rows = {r["bucket"].day: r for r in out.collect()}
    assert [rows[d]["cnt"] for d in (1, 2, 3)] == [1, 2, 3]
    # derivative: None, +1, +1
    assert rows[1]["deriv_cnt"] is None
    assert rows[2]["deriv_cnt"] == 1 and rows[3]["deriv_cnt"] == 1
    # cumulative count: 1, 3, 6
    assert [rows[d]["cum_cnt"] for d in (1, 2, 3)] == [1, 3, 6]
    # 2-bucket moving average of sum_v (10, 20, 30): 10, 15, 25
    assert [rows[d]["ma_sum"] for d in (1, 2, 3)] == [10.0, 15.0, 25.0]


def test_composite_agg_pages_tile_the_buckets(spark):
    df = spark.createDataFrame(
        [(a, b) for a in "abc" for b in ("x", "y") for _ in range(2)],
        "k1 string, k2 string")
    seen, after = [], None
    while True:
        page = query.composite_agg(df, ["k1", "k2"], after=after, size=2) \
            .collect()
        if not page:
            break
        seen += [(r["k1"], r["k2"], r["cnt"]) for r in page]
        after = (page[-1]["k1"], page[-1]["k2"])
    # pages are disjoint, ordered, and cover every bucket exactly once
    assert seen == sorted(set(seen))
    assert seen == [(a, b, 2) for a in "abc" for b in ("x", "y")]


def test_composite_after_key_filters_before_aggregation(spark):
    df = spark.range(10).select(
        (F.col("id") % 5).cast("string").alias("k1"),
        F.lit("z").alias("k2"))
    plan = query.composite_agg(df, ["k1", "k2"], after=("2", "z"), size=9) \
        ._jdf.queryExecution().executedPlan().toString()
    # the tuple predicate must sit below the aggregate, not above it
    agg_pos = plan.index("HashAggregate")
    assert "Filter" in plan[agg_pos:], plan


def test_range_and_filters_aggs(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in (5, 50, 99, 150, 299, 300, 400)],
        "value double")
    buckets = {r["bucket"]: r["cnt"]
               for r in query.range_agg(df, "value", (50.0, 150.0, 300.0))
               .collect()}
    assert buckets == {"*-50": 1, "50-150": 2, "150-300": 2, "300-*": 2}

    row = query.filters_agg(df, {
        "small": F.col("value") < 100,
        "big": F.col("value") >= 100,
        "all": F.lit(True),          # overlaps both
    }).collect()[0]
    assert (row["small"], row["big"], row["all"]) == (3, 4, 7)


def test_rare_terms_surfaces_only_the_tail(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)], "term string")
    out = query.rare_terms(df, "term", max_count=2).collect()
    assert [(r["term"], r["cnt"]) for r in out] == [("b", 2), ("c", 1)]


def test_chunk_dedup_drops_boilerplate_and_preserves_order(spark):
    boiler = "all rights reserved"
    docs = [(i, f"doc{i} unique words here {boiler}") for i in range(4)]
    docs.append((9, "completely original text entirely"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"]
           for r in text.chunk_dedup(df, block_tokens=4, max_freq=2)
           .collect()}
    # blocks are 4 tokens: "docN unique words here" (unique) +
    # "all rights reserved" tail block (appears 4x > max_freq 2)
    for i in range(4):
        assert out[i] == f"doc{i} unique words here"
    assert out[9] == "completely original text entirely"


def test_chunk_dedup_can_drop_whole_documents(spark):
    df = spark.createDataFrame(
        [(i, "same exact text") for i in range(5)],
        "doc_id long, text string")
    assert text.chunk_dedup(df, block_tokens=3, max_freq=2).count() == 0


def test_canonical_per_cluster_prefers_quality(spark):
    # two near-identical docs (shared shingles) + one isolated
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base + " extra"), (2, base + " extra padding tokens"),
         (3, "totally different words never repeating anywhere else")],
        "doc_id long, text string")
    df = df.withColumn("n_chars", F.length("text"))
    out = {r["cluster_id"]: r
           for r in dedup.canonical_per_cluster(df, 0.5).collect()}
    dup_cluster = out[1]
    assert dup_cluster["n_members"] == 2
    # keeper is the member with the higher quality_bp (len 2 tiebreak)
    from kafana_spark.operators.text import quality_score
    q = {r["doc_id"]: r["quality_bp"]
         for r in quality_score(df).collect()}
    expect = max((1, 2), key=lambda d: (q[d], -d))
    assert dup_cluster["keeper"] == expect
    assert out[3]["n_members"] == 1 and out[3]["keeper"] == 3


def test_shard_assign_deterministic_and_complete(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = sample.shard_assign(df, n_shards=4).collect()
    b = sample.shard_assign(df.repartition(7), n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 100 and len({r["doc_id"] for r in a}) == 100
    # pos is contiguous 1..n within every shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_assign_window_is_partitioned(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = sample.shard_assign(df, n_shards=4) \
        ._jdf.queryExecution().executedPlan().toString()
    # the row_number window must partition by shard — a SinglePartition
    # exchange would mean a global sort bottleneck
    assert "SinglePartition" not in plan, plan


def test_label_centroids_elementwise_mean(spark):
    from kafana_spark.operators import similarity
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<double>")
    out = {r["label"]: r["centroid"]
           for r in similarity.label_centroids(df).collect()}
    assert out[0] == [2.0, 3.0]
    assert out[1] == [10.0, 20.0]


def test_adjacency_matrix_buckets(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "v int, t string")
    out = {r["bucket"]: r["cnt"]
           for r in query.adjacency_matrix(df, {
               "ta": F.col("t") == "a",
               "small": F.col("v") <= 2,
               "odd": F.col("v") % 2 == 1,
           }).collect()}
    # ta∩small = {1,2}; ta∩odd = {1}; small∩odd = {1}; empties omitted
    assert out == {"ta": 2, "small": 2, "odd": 2,
                   "ta&small": 2, "ta&odd": 1, "small&odd": 1}


def test_percentile_ranks_exact(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)],
                               "value double")
    row = query.percentile_ranks(df, "value", (3.0, 10.0)).collect()[0]
    assert row["rank_3_0"] == 30.0
    assert row["rank_10_0"] == 100.0


def test_weighted_avg(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "k string, v double, w double")
    out = {r["k"]: r["w_avg"]
           for r in query.weighted_avg(df, "v", "w", by=("k",)).collect()}
    assert out["a"] == round((10 * 1 + 20 * 3) / 4.0, 4)
    assert out["b"] == 5.0


def test_extended_stats_population_moments(spark):
    df = spark.createDataFrame([(2.0,), (4.0,), (6.0,)], "v double")
    r = query.extended_stats(df, "v").collect()[0]
    assert (r["cnt"], r["min_v"], r["max_v"]) == (3, 2.0, 6.0)
    assert r["avg_v"] == 4.0 and r["sum_v"] == 12.0
    # population variance of {2,4,6} = 8/3
    assert r["var_v"] == round(8 / 3, 1)
    assert r["std_v"] == round((8 / 3) ** 0.5, 4)


def test_oov_rate(spark):
    # counts: a=4, b=4, z=1 -> vocab_k=2 keeps {'a','b'}; 'z' is OOV
    df = spark.createDataFrame(
        [(1, "a a b z"), (2, "a b"), (3, "b b a")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.oov_rate(df, vocab_k=2).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"], out[1]["oov_bp"]) \
        == (4, 1, 2500)
    assert out[2]["n_oov"] == 0 and out[2]["oov_bp"] == 0
    assert out[3]["n_oov"] == 0 and out[3]["oov_bp"] == 0


def test_global_agg_filtered_vs_all(spark):
    df = spark.createDataFrame(
        [("x", 10.0), ("x", 30.0), ("y", 100.0)], "k string, v double")
    r = query.global_agg(df, F.col("k") == "x", "v").collect()[0]
    assert (r["cnt"], r["sum_v"], r["avg_v"]) == (2, 40.0, 20.0)
    assert (r["global_cnt"], r["global_sum_v"]) == (3, 140.0)
    assert r["global_avg_v"] == round(140 / 3, 4)


def test_missing_agg_counts_nulls_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), ("b", None)],
        "k string, f int")
    out = {r["k"]: (r["missing_cnt"], r["present_cnt"])
           for r in query.missing_agg(df, "f", by="k").collect()}
    assert out == {"a": (1, 1), "b": (2, 0)}


def test_sampler_agg_bounds_subagg_to_top_n(spark):
    rows = [("hot", float(100 - i), i) for i in range(5)] \
        + [("cold", 1.0, 100 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, score double, id long")
    # shard_size=5 keeps exactly the 5 'hot' rows (scores 96..100)
    out = {r["k"]: (r["cnt"], r["avg_score"]) for r in
           query.sampler_agg(df, "score", "id", 5, "k").collect()}
    assert out == {"hot": (5, 98.0)}


def test_bucket_pipeline_closed_form(spark):
    """serial_diff/bucket_script on the 1-2-3 fixture: sums are
    10/20/30, lag-1 serial_diff None/+10/+10, per_doc constant 10."""
    out = query.bucket_pipeline(_events(spark), "ts", "value",
                                unit="day", lag=1)
    rows = {r["bucket"].day: r for r in out.collect()}
    assert rows[1]["serial_diff"] is None
    assert rows[2]["serial_diff"] == 10.0 and rows[3]["serial_diff"] == 10.0
    assert all(rows[d]["per_doc"] == 10.0 for d in (1, 2, 3))


def test_bucket_selector_runs_after_windows(spark):
    """ES pipeline ordering: a bucket dropped by bucket_selector must
    STILL feed the serial_diff of later buckets (the selector filters
    the output list, not the window input)."""
    out = query.bucket_pipeline(_events(spark), "ts", "value",
                                unit="day", lag=1, min_count=2)
    rows = {r["bucket"].day: r for r in out.collect()}
    assert set(rows) == {2, 3}          # day 1 (cnt=1) dropped
    # day 2's serial_diff references day 1's sum even though day 1
    # was selected out: 20 - 10 = 10, NOT None
    assert rows[2]["serial_diff"] == 10.0


def test_bucket_sort_truncates_by_exact_count(spark):
    out = query.bucket_pipeline(_events(spark), "ts", "value",
                                unit="day", lag=1, size=2).collect()
    assert [r["cnt"] for r in out] == [3, 2]


def test_matrix_stats_closed_form(spark):
    """y = 2x gives corr exactly 1; z = -x gives corr -1; the pair list
    is the upper triangle in field order."""
    df = spark.createDataFrame(
        [(float(x), 2.0 * x, -float(x)) for x in range(1, 6)],
        "x double, y double, z double")
    rows = {(r.fa, r.fb): r
            for r in query.matrix_stats(df, ["x", "y", "z"]).collect()}
    assert set(rows) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert rows[("x", "y")].corr == 1.0
    assert rows[("x", "z")].corr == -1.0
    assert rows[("y", "z")].corr == -1.0
    r = rows[("x", "y")]
    assert r.cnt == 5 and r.mean_a == 3.0 and r.mean_b == 6.0
    # stddev_samp of 1..5 = sqrt(2.5)
    assert abs(r.std_a - 2.5 ** 0.5) < 1e-4


def test_diversified_sampler_caps_per_value(spark):
    """One dominant user with the 5 highest scores must contribute at
    most max_per_value rows to the sample; the freed slots go to other
    users (the de-biasing ES's max_docs_per_value exists for)."""
    rows = [(i, "heavy", "a", 100.0 - i) for i in range(5)]       # top-5 raw
    rows += [(10 + i, f"u{i}", "b", 50.0 - i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, value double")
    out = {r.event_type: r for r in query.diversified_sampler_agg(
        df, "value", "event_id", shard_size=6, field="event_type",
        dedup_field="user_id", max_per_value=2).collect()}
    # heavy user capped at 2 despite owning the 5 best scores
    assert out["a"].cnt == 2
    assert out["b"].cnt == 4


# ----------------------------------------------------- auto_date_histogram

def test_auto_date_histogram_picks_smallest_fitting_interval(spark):
    from datetime import datetime, timedelta

    from kafana_spark.query import AUTO_HIST_LADDER, auto_date_histogram

    t0 = datetime(2024, 3, 1)
    rows = [(t0 + timedelta(minutes=7 * i),) for i in range(100)]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = auto_date_histogram(df, "ts", target_buckets=25).collect()
    span = 7 * 99 * 60
    exp_interval = min(s for s in AUTO_HIST_LADDER if span // s + 1 <= 25)
    assert {r.interval_s for r in out} == {exp_interval}
    assert sum(r.cnt for r in out) == 100
    assert len(out) <= 25
    # buckets are epoch-aligned multiples of the interval
    for r in out:
        ep = int(r.bucket_start.timestamp())
        assert ep % exp_interval == 0


def test_auto_date_histogram_single_row(spark):
    from datetime import datetime

    from kafana_spark.query import auto_date_histogram

    df = spark.createDataFrame([(datetime(2024, 3, 1, 12, 34, 56),)],
                               "ts timestamp")
    out = auto_date_histogram(df, "ts", target_buckets=10).collect()
    assert len(out) == 1 and out[0].cnt == 1 and out[0].interval_s == 1


def test_variable_width_histogram_splits_at_largest_gaps(spark):
    """Three clusters separated by the two largest gaps: boundaries
    must land exactly there, buckets report min/max/centroid/count."""
    vals = [1.00, 1.01, 1.02, 5.00, 5.01, 9.00]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {r.bucket: r for r in
           query.variable_width_histogram(df, "value", 3).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0].min_c, out[0].max_c, out[0].doc_count) == (100, 102, 3)
    assert (out[1].min_c, out[1].max_c, out[1].doc_count) == (500, 501, 2)
    assert (out[2].min_c, out[2].max_c, out[2].doc_count) == (900, 900, 1)
    assert out[0].key_c == (100 + 101 + 102) // 3


def test_variable_width_histogram_fewer_values_than_buckets(spark):
    """With fewer distinct values than buckets, every distinct value
    gets its own bucket (no empty buckets fabricated)."""
    df = spark.createDataFrame([(1.0,), (2.0,), (1.0,)], "value double")
    out = query.variable_width_histogram(df, "value", 8).collect()
    assert len(out) == 2
    assert sorted((r.min_c, r.doc_count) for r in out) == \
        [(100, 2), (200, 1)]


def test_terms_with_other_remainder_bucket(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)],
        "k string")
    out = query.terms_with_other(df, "k", 2).collect()
    assert [(r.term, r.cnt, r.is_other) for r in out] == \
        [("a", 5, 0), ("b", 3, 0), ("__other__", 3, 1)]
    # empty corpus: no buckets AND no '__other__' row (never a NULL
    # remainder) — ES reports sum_other_doc_count=0 with no buckets
    assert query.terms_with_other(df.where("k = 'zz'"), "k", 2) \
        .count() == 0
    # n >= distinct terms: the remainder row stays, exactly 0
    full = query.terms_with_other(df, "k", 10).collect()
    assert ("__other__", 0, 1) == (full[-1].term, full[-1].cnt,
                                   full[-1].is_other)
