"""Discover / search / aggregate API — the Kibana/ES query surface.

Each function compiles a Kibana-style request to a declarative DataFrame
plan (SURVEY.md §2.C, C1-C18), exactly the way Kibana compiles UI
actions to ES query DSL (/root/reference/README.md:15,24,26-42). All
predicates are plain Column expressions so Catalyst pushes them into the
parquet scan (partition pruning on topic/ds + min-max skipping).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------- discover

def discover(
    df: DataFrame,
    t0=None,
    t1=None,
    filters: Sequence[Column] | None = None,
    n: int = 500,
    time_col: str = "timestamp",
) -> DataFrame:
    """C1: time-range browse, newest first (Kibana discover)."""
    out = df
    if t0 is not None:
        out = out.where(F.col(time_col) >= F.lit(t0))
    if t1 is not None:
        out = out.where(F.col(time_col) < F.lit(t1))
    for flt in filters or ():
        out = out.where(flt)
    return out.orderBy(F.col(time_col).desc()).limit(n)


def search_key(df: DataFrame, key, topics: Sequence[str] | None = None) -> DataFrame:
    """C2/C3: exact key lookup, optionally restricted to topics."""
    out = df.where(F.col("key") == F.lit(key))
    if topics:
        out = out.where(F.col("topic").isin(list(topics)))
    return out


def search_field(df: DataFrame, field: str, value) -> DataFrame:
    """C4: filter on a (possibly nested) document field across topics."""
    return df.where(F.col(field) == F.lit(value))


def search_text(df: DataFrame, needle: str, field: str = "message.value",
                token: bool = False,
                bloom_col: str | None = None) -> DataFrame:
    """C5: substring or whole-token search over the stringified value.

    ``bloom_col`` names a skipping column stored beside the document —
    a token_bloom for token search, a trigram_bloom for substring
    search (operators/text.py). The bloom test prefilters rows with
    bitwise math and the exact match verifies survivors — identical
    results, a fraction of the scan work.
    """
    if token:
        tokens = F.split(F.lower(F.col(field)), r"\W+")
        match = F.array_contains(tokens, needle.lower())
        if bloom_col is not None:
            from kafana_spark.operators.text import bloom_might_contain

            return df.where(bloom_might_contain(F.col(bloom_col), needle)
                            & match)
        return df.where(match)
    match = F.col(field).contains(needle)
    if bloom_col is not None:
        from kafana_spark.operators.text import (
            bloom_might_contain_substring,
        )

        return df.where(
            bloom_might_contain_substring(F.col(bloom_col), needle) & match)
    return df.where(match)


def search(df: DataFrame, qs: str,
           default_field: str = "message.value") -> DataFrame:
    """Kibana-search-box twin: filter by a Lucene-ish query string
    (`key: "1" and topic: "bar"`), compiled to Column predicates so
    Catalyst pushes it into the scan like any native filter."""
    from kafana_spark.query_string import compile_query_string

    return df.where(compile_query_string(qs, default_field))


def exists(df: DataFrame, field: str) -> DataFrame:
    """C8: _exists_ — field present and non-null (dynamic-mapping world)."""
    return df.where(F.col(field).isNotNull())


def paginate(df: DataFrame, sort_cols: Sequence[Column], page: int,
             size: int) -> DataFrame:
    """C9: from/size pagination as a window over a total sort order.

    Note: deep pagination is as expensive as in ES (global sort); use
    search_after-style keyset pagination (filter on last-seen sort key)
    for anything past the first pages at scale.
    """
    w = Window.orderBy(*sort_cols)
    rn = F.row_number().over(w)
    lo, hi = page * size, (page + 1) * size
    return (df.withColumn("__rn", rn)
            .where((F.col("__rn") > lo) & (F.col("__rn") <= hi))
            .drop("__rn"))


def search_after(df: DataFrame, sort_col: str, last_seen, size: int,
                 descending: bool = False) -> DataFrame:
    """C9 at scale: keyset pagination (ES search_after).

    Instead of a global sort + row_number (deep pages re-sort
    everything), filter past the last-seen sort key and take the next
    page — the filter pushes into the scan, so page N costs the same
    as page 1. Requires a unique sort key (use _id or (ts, _id))."""
    c = F.col(sort_col)
    if descending:
        return df.where(c < F.lit(last_seen)).orderBy(c.desc()).limit(size)
    return df.where(c > F.lit(last_seen)).orderBy(c).limit(size)


# ------------------------------------------------------------ aggregations

def terms(df: DataFrame, field: str, n: int = 10) -> DataFrame:
    """C11: terms aggregation — top-N buckets by doc count."""
    return (df.groupBy(field).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col(field))
            .limit(n))


def date_histogram(df: DataFrame, interval: str = "1 hour",
                   time_col: str = "timestamp") -> DataFrame:
    """C12: tumbling time buckets (ES date_histogram)."""
    return (df.groupBy(F.window(F.col(time_col), interval).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("bucket.start").alias("bucket_start"), "cnt")
            .orderBy("bucket_start"))


#: ES auto_date_histogram rounding ladder, in seconds (fixed-interval
#: semantics: the calendar units ES rounds to are taken at their fixed
#: lengths — 1s 5s 10s 30s, 1m 5m 10m 30m, 1h 3h 12h, 1d 7d 30d 90d 1y).
AUTO_HIST_LADDER = (1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800,
                    43200, 86400, 604800, 2592000, 7776000, 31536000)


def auto_date_histogram(df: DataFrame, time_col: str = "ts",
                        target_buckets: int = 40) -> DataFrame:
    """The ES ``auto_date_histogram`` agg: pick the smallest ladder
    interval that yields ≤ target_buckets buckets over the data's
    [min, max] span, then histogram with it. The chosen interval rides
    along in the output (ES reports it in the response).

    The interval choice stays IN the plan: the 1-row min/max aggregate
    cross-joins the 16-row ladder, filters to fitting rungs, and keeps
    the smallest — no collect, no second driver round-trip; epoch
    bucketing is floor(epoch/i)·i (UTC session, microseconds floored
    by unix_timestamp on both engines).

    Scale: one corpus aggregate (map-side combinable min/max) + one
    histogram aggregation, both sharing the scan via the broadcast
    1-row chosen-interval join.
    """
    ep = F.unix_timestamp(F.col(time_col))
    bounds = df.agg(F.min(ep).alias("lo"), F.max(ep).alias("hi"))
    ladder = bounds.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(s) for s in AUTO_HIST_LADDER]))
        .alias("interval_s"))
    chosen = (bounds.join(F.broadcast(ladder))
              .withColumn("nb", F.expr("(hi - lo) div interval_s") + 1)
              .filter(F.col("nb") <= target_buckets)
              .orderBy("interval_s").limit(1)
              .select("interval_s"))
    bucket = (F.floor(ep / F.col("interval_s"))
              * F.col("interval_s")).alias("bucket_epoch")
    return (df.join(F.broadcast(chosen))
            .groupBy(F.col("interval_s"), bucket)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.timestamp_seconds(F.col("bucket_epoch"))
                    .alias("bucket_start"), "interval_s", "cnt")
            .orderBy("bucket_start"))


def metrics(df: DataFrame, field: str, by: Sequence[str] = ()) -> DataFrame:
    """C13: the ES stats agg — count/min/max/avg/sum of a numeric field."""
    c = F.col(field)
    aggs = [
        F.count(c).alias("cnt"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.avg(c).alias("avg_v"),
        F.sum(c).alias("sum_v"),
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def cardinality(df: DataFrame, field: str, by: Sequence[str] = (),
                exact: bool = False, rsd: float = 0.05) -> DataFrame:
    """C14: distinct count. approx (HLL, like ES cardinality) by default;
    exact twin for oracle checks."""
    c = (F.count_distinct(F.col(field)) if exact
         else F.approx_count_distinct(F.col(field), rsd))
    out_col = c.alias("cardinality")
    return df.groupBy(*by).agg(out_col) if by else df.agg(out_col)


def percentiles(df: DataFrame, field: str, qs: Sequence[float] = (0.5, 0.95, 0.99),
                by: Sequence[str] = (), exact: bool = False) -> DataFrame:
    """C15: percentiles. approx (t-digest-like) by default; exact twin."""
    fn = F.percentile if exact else F.percentile_approx
    aggs = [fn(F.col(field), F.lit(q)).alias(f"p{int(q * 100)}") for q in qs]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def top_hits(df: DataFrame, by: Sequence[str], order: Sequence[Column],
             k: int = 1) -> DataFrame:
    """C16: top-k documents per bucket (ES top_hits)."""
    w = Window.partitionBy(*by).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .drop("__rn"))


def histogram(df: DataFrame, field: str, width: float) -> DataFrame:
    """C18: fixed-width numeric histogram."""
    bucket = (F.floor(F.col(field) / F.lit(width)) * F.lit(width)).alias("bucket")
    return (df.where(F.col(field).isNotNull())
            .groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("bucket"))


# ------------------------------------------------- pipeline / bucket aggs

def pipeline_aggs(df: DataFrame, time_col: str, value_col: str,
                  unit: str = "day", ma_buckets: int = 3) -> DataFrame:
    """ES pipeline aggregations: ``derivative``, ``cumulative_sum`` and
    ``moving_fn`` (moving average) computed over the buckets of a parent
    date_histogram — the Kibana TSVB / Timelion panel surface
    (ES 6.8 pipeline aggs; the reference delegates all charting to
    Kibana, /root/reference/README.md:15).

    Scale: the raw scan aggregates FIRST (distributed, map-side
    combinable); the window functions then run over the bucket frame —
    one row per time bucket, O(range/interval) rows even at 100 TB —
    so the unpartitioned window is a deliberate post-aggregation step
    over a tiny frame, not a global sort of the data.
    """
    b = (df.groupBy(F.date_trunc(unit, F.col(time_col)).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(value_col).alias("sum_v")))
    w = Window.orderBy("bucket")
    return b.select(
        "bucket", "cnt", "sum_v",
        (F.col("cnt") - F.lag("cnt").over(w)).alias("deriv_cnt"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_cnt"),
        F.avg("sum_v").over(w.rowsBetween(-(ma_buckets - 1), 0))
        .alias("ma_sum"),
    )


def matrix_stats(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """ES ``matrix_stats`` aggregation (the correlation-matrix slice):
    ONE combinable pass computing row count, per-field mean/stddev and
    Pearson correlation for every unordered field pair; output is one
    row per pair (fa < fb) — the tidy form of ES's per-field matrix.

    Covariance is deliberately NOT in the output contract: it equals
    corr·std_a·std_b (derivable), and its raw magnitude scales with
    the fields' units, so no fixed decimal rounding is simultaneously
    tight for a 0.05-scale discount and a 1e9-scale price variance —
    while corr is dimensionless (|rel err| ~1e-12 across engines, 6dp
    rounding safe) and stddev's magnitude matches the field's own.

    Scale: a single full-width scan with map-side partial moments
    (Spark's CentralMomentAgg); no shuffle beyond the 1-row final
    combine, no per-pair rescan.
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for f in fields:
        aggs += [F.avg(f).alias(f"mean_{f}"),
                 F.stddev_samp(f).alias(f"std_{f}")]
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            aggs.append(F.corr(a, b).alias(f"corr_{a}_{b}"))
    g = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            pairs.append(F.struct(
                F.lit(a).alias("fa"), F.lit(b).alias("fb"),
                F.col("cnt").alias("cnt"),
                F.round(F.col(f"mean_{a}"), 4).alias("mean_a"),
                F.round(F.col(f"mean_{b}"), 4).alias("mean_b"),
                F.round(F.col(f"std_{a}"), 4).alias("std_a"),
                F.round(F.col(f"std_{b}"), 4).alias("std_b"),
                F.round(F.col(f"corr_{a}_{b}"), 6).alias("corr")))
    return (g.select(F.explode(F.array(*pairs)).alias("s"))
            .select("s.*"))


def bucket_pipeline(df: DataFrame, time_col: str, value_col: str,
                    unit: str = "day", lag: int = 7,
                    min_count: int | None = None,
                    size: int | None = None) -> DataFrame:
    """The remaining ES 6.8 pipeline aggs beside ``pipeline_aggs``:
    ``serial_diff`` (lag-n difference — the seasonality detrend Kibana
    TSVB exposes), ``bucket_script`` (arithmetic across sibling
    metrics, here sum/count), ``bucket_selector`` (drop buckets
    failing a predicate — applied AFTER the window functions, matching
    ES's pipeline ordering), and ``bucket_sort`` (order + truncate the
    bucket list by a metric).

    Scale: same stance as pipeline_aggs — the raw scan aggregates
    first (map-side combinable), the windows run over the tiny bucket
    frame, and bucket_sort's order+limit plans as TakeOrdered, never a
    full sort.
    """
    b = (df.groupBy(F.date_trunc(unit, F.col(time_col)).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(value_col).alias("sum_v")))
    w = Window.orderBy("bucket")
    out = b.select(
        "bucket", "cnt", "sum_v",
        (F.col("sum_v") - F.lag("sum_v", lag).over(w)).alias("serial_diff"),
        (F.col("sum_v") / F.col("cnt")).alias("per_doc"),
    )
    if min_count is not None:
        out = out.where(F.col("cnt") >= min_count)
    if size is not None:
        # integer sort key: exact across engines (a float sum key could
        # flip near-ties by accumulation-order ulps at the LIMIT edge)
        out = out.orderBy(F.col("cnt").desc(), "bucket").limit(size)
    return out


def composite_agg(df: DataFrame, keys: Sequence[str],
                  after: Sequence | None = None, size: int = 10) -> DataFrame:
    """ES composite aggregation: multi-source buckets in natural key
    order with ``after``-key pagination.

    Scale: the after-key becomes a predicate on the RAW rows (bucket
    keys are row values), applied BEFORE the aggregation shuffle — rows
    belonging to already-paged buckets never enter the shuffle, and the
    predicate reaches the parquet scan. Deep bucket pages therefore
    cost the same as page one (the aggregation twin of keyset
    search_after, C9).
    """
    if after is not None:
        pred = None
        eq = None
        for k, v in zip(keys, after):
            gt = F.col(k) > F.lit(v)
            clause = gt if eq is None else eq & gt
            pred = clause if pred is None else pred | clause
            e = F.col(k) == F.lit(v)
            eq = e if eq is None else eq & e
        df = df.where(pred)
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(*keys).limit(size))


def range_agg(df: DataFrame, field: str, bounds: Sequence[float]) -> DataFrame:
    """ES range aggregation: explicit half-open buckets
    ``[*,b0) [b0,b1) … [bn,*)`` with per-bucket count + sum.

    One scan, no join: the bucket label is a chained CASE expression
    (whole-stage-codegen'd), the agg is map-side combinable, and bucket
    cardinality is len(bounds)+1 regardless of data size.
    """
    c = F.col(field)
    label = F.when(c < F.lit(bounds[0]), F.lit(f"*-{bounds[0]:g}"))
    for lo, hi in zip(bounds, bounds[1:]):
        label = label.when(c < F.lit(hi), F.lit(f"{lo:g}-{hi:g}"))
    label = label.otherwise(F.lit(f"{bounds[-1]:g}-*"))
    return (df.where(c.isNotNull())
            .groupBy(label.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum(c), 2).alias("sum_v"))
            .orderBy("bucket"))


def filters_agg(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES filters aggregation: arbitrary, possibly-OVERLAPPING named
    buckets in ONE scan — each bucket is a conditional count, so k
    filters cost one pass, not k scans (overlap is exactly what a
    groupBy-CASE bucketing cannot express).
    """
    return df.agg(*[
        F.count(F.when(p, F.lit(1))).alias(name)
        for name, p in filters.items()])


def global_agg(df: DataFrame, query_filter: Column, field: str) -> DataFrame:
    """ES ``global`` aggregation: metrics over ALL documents next to the
    same metrics in the query-filtered context — the "filtered vs total"
    breakdown Kibana renders above every filtered dashboard.

    One scan, no self-join: the filtered twin of each metric aggregates
    ``CASE WHEN filter``-masked inputs, so both contexts are conditional
    aggregates in a single map-side-combinable pass (the naive form —
    agg the table twice and cross-join — scans twice).
    """
    c = F.col(field)
    masked = F.when(query_filter, c)
    return df.agg(
        F.count(F.when(query_filter, F.lit(1))).alias("cnt"),
        F.round(F.sum(masked), 2).alias("sum_v"),
        F.round(F.avg(masked), 4).alias("avg_v"),
        F.count(F.lit(1)).alias("global_cnt"),
        F.round(F.sum(c), 2).alias("global_sum_v"),
        F.round(F.avg(c), 4).alias("global_avg_v"))


def missing_agg(df: DataFrame, field: str, by: str) -> DataFrame:
    """ES ``missing`` aggregation: the bucket of documents that have NO
    value for a field (null here — parquet's untyped-missing twin),
    broken down by ``by`` so the bucket is usable as a sub-agg parent.

    Scale: a conditional count per group — one combinable pass; never
    a separate IS NULL scan next to the main agg.
    """
    c = F.col(field)
    return (df.groupBy(by)
            .agg(F.count(F.when(c.isNull(), F.lit(1))).alias("missing_cnt"),
                 F.count(c).alias("present_cnt"))
            .orderBy(by))


def sampler_agg(df: DataFrame, order_col: str, tiebreak: str,
                shard_size: int, field: str) -> DataFrame:
    """ES ``sampler`` aggregation: run sub-aggregations over only the
    top-``shard_size`` highest-scoring documents instead of the full
    result set (ES uses it to keep expensive sub-aggs bounded).

    ES's sample is per-shard by _score; the deterministic twin samples
    the global top-N by (order_col DESC, tiebreak ASC) — a total order,
    so the sample set is reproducible and oracle-checkable. Scale: the
    top-N is a TakeOrdered (per-partition heaps + merge of N·P rows),
    never a full sort; the sub-agg then runs on N rows.
    """
    top = (df.orderBy(F.col(order_col).desc(), F.col(tiebreak))
           .limit(shard_size))
    return (top.groupBy(field)
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.avg(order_col), 4).alias("avg_score"))
            .orderBy(field))


def diversified_sampler_agg(df: DataFrame, order_col: str, tiebreak: str,
                            shard_size: int, field: str,
                            dedup_field: str,
                            max_per_value: int = 1) -> DataFrame:
    """ES ``diversified_sampler``: the sampler agg with a per-value cap
    on ``dedup_field`` — at most ``max_per_value`` documents per
    distinct value enter the sample, de-biasing sub-aggs from dominant
    values (ES's max_docs_per_value contract).

    Scale: the cap is a per-value window top-k — Spark plans a
    rank-limit (per-partition heaps on the dedup_field shuffle), never
    a global sort; the capped pool then feeds the same TakeOrdered
    top-N as sampler_agg.
    """
    w = Window.partitionBy(dedup_field).orderBy(F.col(order_col).desc(),
                                                F.col(tiebreak))
    capped = (df.withColumn("_r", F.row_number().over(w))
              .where(F.col("_r") <= max_per_value).drop("_r"))
    top = (capped.orderBy(F.col(order_col).desc(), F.col(tiebreak))
           .limit(shard_size))
    return (top.groupBy(field)
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.avg(order_col), 4).alias("avg_score"))
            .orderBy(field))


def rare_terms(df: DataFrame, field: str, max_count: int = 2) -> DataFrame:
    """ES rare_terms aggregation: the LONG-TAIL buckets — terms whose
    doc count is at most ``max_count`` (the dual of terms/top-N, which
    can never surface them; ES added it precisely because sorting
    terms ascending by count is abuse-prone).

    Scale: map-side-combinable group-count then filter; the output is
    the tail itself — never a global sort of the full term dictionary.
    """
    return (df.groupBy(field).agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") <= F.lit(max_count))
            .orderBy(field))


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES adjacency_matrix aggregation: doc counts for every named
    filter and every pairwise intersection — the co-occurrence matrix
    behind Kibana's graph visualizations.

    One scan: k(k+1)/2 conditional counts instead of one pass per
    cell; the single aggregated row is then unpivoted to ES's bucket
    shape. Empty intersections are omitted, as ES does.
    """
    names = list(filters)
    cols, keys = [], []
    for i, a in enumerate(names):
        for j in range(i, len(names)):
            b = names[j]
            key = a if i == j else f"{a}&{b}"
            pred = filters[a] if i == j else (filters[a] & filters[b])
            keys.append(key)
            cols.append(F.count(F.when(pred, F.lit(1))).alias(key))
    row = df.agg(*cols)
    pairs = ", ".join(f"'{k}', `{k}`" for k in keys)
    return (row.selectExpr(f"stack({len(keys)}, {pairs}) AS (bucket, cnt)")
            .where(F.col("cnt") > 0)
            .orderBy("bucket"))


def date_histogram_gapfill(df: DataFrame, time_col: str,
                           unit: str = "day") -> DataFrame:
    """ES date_histogram with ``min_doc_count: 0`` + extended_bounds:
    emit EMPTY buckets for intervals with no documents. Kibana charts
    need the zero points, and a plain groupBy can never produce them.

    Scale: the raw scan aggregates FIRST; the bucket spine is
    sequence()-generated between the aggregated min/max buckets —
    O(range/interval) rows — and LEFT-joined to the bucket frame. The
    spine join touches bucket rows only (both sides post-aggregation,
    broadcast-sized); raw data is never re-shuffled.
    """
    b = (df.groupBy(F.date_trunc(unit, F.col(time_col)).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    spine = (b.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
             .select(F.explode(F.sequence(
                 F.col("lo"), F.col("hi"),
                 F.expr(f"interval 1 {unit}"))).alias("bucket")))
    return (spine.join(b, "bucket", "left")
            .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
            .orderBy("bucket"))


def percentile_ranks(df: DataFrame, field: str,
                     values: Sequence[float]) -> DataFrame:
    """ES percentile_ranks: the inverse of percentiles — for each given
    value, the percentage of docs with field <= value. Exact,
    single-pass conditional counts (ES itself approximates with
    t-digest; the exact form is the oracle-checkable twin, the same
    stance as C14/C15's exact twins)."""
    c = F.col(field)
    total = F.count(c)
    return df.agg(*[
        F.round(F.lit(100.0)
                * F.count(F.when(c <= F.lit(v), F.lit(1))) / total, 4)
        .alias(f"rank_{str(v).replace('.', '_')}")
        for v in values])


def weighted_avg(df: DataFrame, value_col: str, weight_col: str,
                 by: Sequence[str] = ()) -> DataFrame:
    """ES weighted_avg aggregation: sum(v·w)/sum(w) per bucket — one
    pass, both sums map-side combinable."""
    wa = (F.sum(F.col(value_col) * F.col(weight_col))
          / F.sum(F.col(weight_col)))
    out = F.round(wa, 4).alias("w_avg")
    return df.groupBy(*by).agg(out) if by else df.agg(out)


def extended_stats(df: DataFrame, field: str,
                   by: Sequence[str] = ()) -> DataFrame:
    """ES extended_stats aggregation: stats + population variance /
    std deviation (ES reports population moments), all one combinable
    pass."""
    c = F.col(field)
    aggs = [F.count(c).alias("cnt"),
            F.round(F.min(c), 2).alias("min_v"),
            F.round(F.max(c), 2).alias("max_v"),
            F.round(F.avg(c), 4).alias("avg_v"),
            F.round(F.sum(c), 2).alias("sum_v"),
            F.round(F.var_pop(c), 1).alias("var_v"),
            F.round(F.stddev_pop(c), 4).alias("std_v")]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
