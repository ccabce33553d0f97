"""Deterministic sampling operators for training-data pipelines.

Dataset curation at 100 TB needs samples that are (a) reproducible
across runs and engines (no RNG state, no partition-order dependence),
(b) pushdown-friendly (a pure column predicate — no shuffle, no
collect), and (c) per-stratum tunable (the standard
"mix 30% web / 60% code / 10% papers" recipe). All of that falls out
of hashing a stable row key into a uniform bucket and comparing
against a per-stratum threshold — the same trick as deterministic
A/B bucketing.

The hash is kafana_spark.functions.portable_hash64 (md5-based), which
has an exact DuckDB twin, so every sampler here is fully
oracle-checkable (registry x25).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafana_spark.functions import portable_hash64

#: sampling resolution: fractions are quantized to 1/1e6
SAMPLE_DENOM = 1_000_000


def sample_bucket(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform bucket in [0, SAMPLE_DENOM) from a row key.

    Seed changes produce independent samples (the seed is concatenated
    into the hashed bytes, not added to the output — adding would just
    rotate the buckets).
    """
    return F.pmod(
        portable_hash64(
            F.concat_ws("#", key.cast("string"), F.lit(str(seed)))),
        F.lit(SAMPLE_DENOM))


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         seed: int = 0) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash.

    Unlike DataFrame.sample(): stable across runs, partitionings and
    engines; the SAME keys are kept when re-run on a superset (sampling
    is a property of the row, not the pass) — which is what makes
    incremental pipeline re-runs consistent.
    """
    return df.where(
        sample_bucket(F.col(key_col), seed)
        < F.lit(int(fraction * SAMPLE_DENOM)))


def stratified_sample(df: DataFrame, fractions: Mapping[str, float],
                      strata_col: str = "lang", key_col: str = "doc_id",
                      default: float = 0.0, seed: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value -> keep fraction; strata not listed keep ``default``.

    One pure column predicate (CASE over the stratum + hash compare):
    pushes into the scan, no shuffle, no per-stratum passes. This is
    the mixture-weights op of a training-data pipeline (upsample rare
    languages, downsample boilerplate-heavy sources).
    """
    thr: Column = F.lit(int(default * SAMPLE_DENOM))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value),
                     F.lit(int(frac * SAMPLE_DENOM))).otherwise(thr)
    return df.where(sample_bucket(F.col(key_col), seed) < thr)


def mixture_rebalance(df: DataFrame, strata_col: str = "lang",
                      key_col: str = "doc_id", weight_col: str | None = None,
                      seed: int = 0) -> DataFrame:
    """Equalizing mixture sampler: computes per-stratum keep rates that
    level every stratum down to the smallest one, then applies the
    deterministic hash sample — the self-tuning variant of
    ``stratified_sample`` (rates measured from the data instead of
    hand-picked). ``weight_col`` rebalances by a weight sum (e.g. token
    counts) instead of row counts.

    Two-phase adaptive plan: phase 1 is one tiny aggregation
    (|strata| rows); phase 2 broadcasts the rate table and filters with
    the same pure-column predicate as every sampler here — the corpus
    is scanned once and never shuffled. Rates are exact integers
    (1e6·min div total), so the DuckDB oracle twin is bit-identical.
    """
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    totals = df.groupBy(strata_col).agg(w.cast("long").alias("__tot"))
    mn = totals.agg(F.min("__tot").alias("__mn"))
    rates = (totals.crossJoin(F.broadcast(mn))
             .select(strata_col,
                     F.expr(f"({SAMPLE_DENOM} * __mn) div __tot")
                     .alias("__rate")))
    return (df.join(F.broadcast(rates), strata_col)
            .where(sample_bucket(F.col(key_col), seed) < F.col("__rate"))
            .drop("__rate"))


def shard_assign(df: DataFrame, key_col: str = "doc_id",
                 n_shards: int = 8, seed: int = 0) -> DataFrame:
    """Deterministic training-order assignment: every row gets a
    ``(shard, pos)`` — a reproducible global shuffle for training-data
    ordering (epoch order = ORDER BY shard, pos) that is stable across
    runs, engines and partitionings, like every sampler here.

    Scale: the shard id is a pure column expression (no shuffle); the
    within-shard position is a row_number window PARTITIONED BY shard —
    n_shards independent sorts, each 1/n_shards of the data, instead
    of one global single-partition sort. Writers consume it as
    ``.repartition("shard").sortWithinPartitions("pos")`` — one
    shuffle, fully parallel.

    The position key is a SECOND independent hash (different seed
    namespace): ordering by the shard hash would correlate order with
    shard assignment; ordering by the raw key would preserve corpus
    order within shards.
    """
    k = F.col(key_col).cast("string")
    h_shard = portable_hash64(F.concat_ws("#", k, F.lit(f"shard{seed}")))
    h_pos = portable_hash64(F.concat_ws("#", k, F.lit(f"pos{seed}")))
    w = Window.partitionBy("shard").orderBy("h_pos", key_col)
    return (df.select(F.col(key_col),
                      F.pmod(h_shard, F.lit(n_shards)).cast("int")
                      .alias("shard"),
                      h_pos.alias("h_pos"))
            .withColumn("pos", F.row_number().over(w))
            .select(key_col, "shard", "pos"))


WS_U_GRAIN = 1_000_000       # uniform draw resolution
WS_KEY_SCALE = 1_000_000_000  # fixed-point key resolution (1e-9)


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws a portable-hash uniform
    u ∈ (0,1) and ranks by u^(1/w) — equivalently ln(u)/w, maximized —
    so inclusion probability is proportional to weight. The standard
    quality-weighted corpus subsampling shape (sample high-quality
    docs more, never deterministically drop the tail).

    Portability: u = (portable_hash64(id||'#ws') % grain + 0.5)/grain
    (never 0, so ln is finite); the sort key is ROUND(ln(u)/w · 1e9)
    cast to BIGINT — integer compare, so Spark and DuckDB order
    identically (ln of the same rational inputs agrees well inside the
    1e-9 grain). Zero/negative weights are excluded (a zero-weight row
    has zero inclusion probability by definition).

    Scale: key is pure per-row column math; top-k is a TakeOrdered
    (never a full sort). Output: (id, weight, skey) for the k winners.
    """
    from kafana_spark.functions import portable_hash64

    u = ((portable_hash64(F.concat_ws(
        "#", F.col(id_col).cast("string"), F.lit("ws")))
        % WS_U_GRAIN) + F.lit(0.5)) / F.lit(float(WS_U_GRAIN))
    skey = F.round(F.log(u) / F.col(weight_col)
                   * F.lit(float(WS_KEY_SCALE))).cast("long")
    return (df.where(F.col(weight_col) > 0)
            .select(F.col(id_col), F.col(weight_col), skey.alias("skey"))
            .orderBy(F.col("skey").desc(), F.col(id_col))
            .limit(k))


# --------------------------------------------------------------- DSIR

#: DSIR hashed-feature bucket count (Xie et al. 2023 use 10k buckets;
#: the synthetic corpus vocabulary is ~31 words + bigrams, so 256
#: keeps buckets populated enough that the smoothed ratios carry
#: signal).
DSIR_BUCKETS = 256
#: fixed-point grain for per-feature log-ratios (0.1 milli-nats —
#: same grain as the x71 unigram-LM costs).
DSIR_FP = 10_000


def dsir_weights(df: DataFrame, target_pred: Column,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023): score every document by how target-like its hashed n-gram
    feature distribution is.

    Features are unigrams + bigrams hashed into ``n_buckets``; the
    target (rows matching ``target_pred``) and raw (all rows) bucket
    distributions are add-one smoothed, and a document's importance
    weight is

        Σ_f  ln p̂_target(bucket(f)) − ln p̂_raw(bucket(f))

    summed over its feature OCCURRENCES (multiplicity kept). Each
    per-bucket log-ratio is rounded to DSIR_FP integer units before
    the per-doc sum — integer sums, order-independent across engines.

    Output: (id, n_feats, weight_u), every document scored.

    Scale: both bucket tables are ≤ n_buckets rows — broadcast; the
    only corpus-sized work is the feature explode (map-side) and the
    per-doc integer sum (map-side combinable). The target predicate is
    a column expression, evaluated in the same scan as the explode —
    one pass over the corpus, no self-join.
    """
    from kafana_spark.functions import grams, portable_hash64, tokens

    feats = F.concat(tokens(F.col(text_col)), grams(F.col(text_col), 2))
    ex = df.select(F.col(id_col), target_pred.alias("is_t"),
                   F.explode(feats).alias("g"))
    hashed = ex.select(id_col, "is_t",
                       (portable_hash64(F.col("g")) % n_buckets).alias("b"))
    buckets = (hashed.groupBy("b")
               .agg(F.count(F.lit(1)).alias("c_raw"),
                    F.sum(F.when(F.col("is_t"), 1).otherwise(0))
                    .alias("c_t")))
    totals = (buckets.agg(F.sum("c_raw").alias("n_raw"),
                          F.sum("c_t").alias("n_t")))
    lr = (F.log(F.col("c_t") + 1) - F.log(F.col("n_t") + n_buckets)
          - F.log(F.col("c_raw") + 1) + F.log(F.col("n_raw") + n_buckets))
    lr_u = F.round(lr * F.lit(float(DSIR_FP))).cast("long")
    ltab = (buckets.join(F.broadcast(totals))
            .select("b", lr_u.alias("lr_u")))
    return (hashed.join(F.broadcast(ltab), "b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_feats"),
                 F.sum("lr_u").alias("weight_u")))


def token_budget_select(df: DataFrame, budget: int,
                        score_col: str = "quality_bp",
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id") -> DataFrame:
    """Greedy token-budget selection: walk documents in
    (score desc, id asc) order and keep every document whose running
    token total stays ≤ budget — the standard "best N tokens" corpus
    cut, WITHOUT a global single-partition window.

    Two-phase shape: (1) per-score token totals (the score domain is
    bounded — quality_bp ∈ [0, 10000] — so this aggregate is tiny) get
    an exclusive running sum on the driver-sized side; (2) docs join
    their score's cum_before (broadcast), scores that are entirely
    past the budget are FILTERED BEFORE the per-score window, and the
    within-score cumulative sum runs partitioned BY SCORE — work is
    proportional to the selected prefix, never a one-partition sort of
    the corpus.

    Output: (id, score, n_tokens, cum_tokens) for the selected docs —
    cum_tokens is the global running total, so the oracle's
    single-window formulation must match row for row.
    """
    per_score = (df.groupBy(score_col)
                 .agg(F.sum(tokens_col).alias("stok")))
    w_scores = (Window.orderBy(F.col(score_col).desc())
                .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = (per_score
                  .withColumn("cum_before",
                              F.coalesce(F.sum("stok").over(w_scores),
                                         F.lit(0)))
                  .filter(F.col("cum_before") < budget)
                  .select(score_col, "cum_before"))
    w_docs = (Window.partitionBy(score_col)
              .orderBy(F.col(id_col))
              .rowsBetween(Window.unboundedPreceding, 0))
    joined = df.join(F.broadcast(cum_before), score_col)
    cum = (F.col("cum_before")
           + F.sum(tokens_col).over(w_docs)).alias("cum_tokens")
    return (joined.select(F.col(id_col), F.col(score_col),
                          F.col(tokens_col), cum)
            .filter(F.col("cum_tokens") <= budget))


def temperature_mixture(df: DataFrame, alpha: float = 0.7,
                        budget: int = 200, strata_col: str = "lang",
                        key_col: str = "doc_id",
                        seed: int = 0) -> DataFrame:
    """Temperature-based mixture sampling — the standard multilingual
    LM recipe (mT5/XLM-R): stratum ``l`` gets target share
    n_l^alpha / Σ n_m^alpha (alpha < 1 upsamples the tail relative to
    its natural share), realized as a deterministic per-stratum keep
    rate against a total document ``budget``.

    The keep rate is an INTEGER ppm threshold computed from the
    per-stratum counts (pow/ln on integer counts — cross-engine libm
    noise is ~1e-11 relative against a 0.5-unit rounding margin), so
    the kept set is exactly reproducible across engines, runs and
    partitionings (the property mixture_rebalance establishes; this is
    its temperature-weighted sibling).

    Scale: one combinable count pass; the rate table is |strata| rows
    broadcast back; the keep predicate is a pure column expression.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_l"))
    w = F.pow(F.col("n_l").cast("double"), F.lit(alpha))
    tot = counts.agg(F.sum(w).alias("sw"))
    rate = (counts.join(F.broadcast(tot))
            .select(strata_col,
                    F.least(
                        F.lit(SAMPLE_DENOM),
                        F.round(F.lit(float(SAMPLE_DENOM * budget))
                                * w / F.col("sw") / F.col("n_l"))
                        .cast("long")).alias("keep_ppm")))
    return (df.join(F.broadcast(rate), strata_col)
            .where(sample_bucket(F.col(key_col), seed)
                   < F.col("keep_ppm"))
            .select(key_col, strata_col))


def mixture_waterfill(df: DataFrame, budget_num: int = 3,
                      budget_den: int = 2, cap_bp: int = 17000,
                      n_rounds: int = 3,
                      source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Token-budget allocation across sources with repetition caps —
    the mixing plan a training run computes before sampling: split a
    corpus-level token budget (budget_num/budget_den × the corpus
    total) EQUALLY across sources, but never give a source more than
    cap_bp/10000 epochs of its own tokens; the capped sources'
    unused share is redistributed equally among the uncapped ones
    (water-filling, ``n_rounds`` unrolled rounds — any residue after
    the last round stays unallocated, the conservative reading).

    Equal shares = temperature-0 mixing toward a uniform source mix
    (the ∝ tokens^τ family is temperature_sample's job); the cap is
    the "don't repeat data past ~2 epochs" rule of thumb.

    All arithmetic is integer (token counts, integer division), so
    both engines walk the identical allocation path.

    Output: (source, tokens, cap_tokens, alloc_tokens, epochs_bp),
    one row per source, ordered.

    Scale: the corpus collapses to one combinable (source, Σtokens)
    aggregate; every later round is a 1-row aggregate cross-joined
    back onto the |sources| frame — driver-free iteration over a
    broadcast-sized table, the bpe_merge_train shape without the
    driver.
    """
    from kafana_spark.functions import tokens

    tc = (df.select(F.col(source_col).alias("source"),
                    F.size(tokens(F.col(text_col))).cast("long")
                    .alias("nt"))
          .groupBy("source").agg(F.sum("nt").alias("t")))
    g0 = tc.agg(F.sum("t").alias("tot"),
                F.count(F.lit(1)).alias("ns"))
    a = (tc.crossJoin(F.broadcast(g0))
         .select("source", "t",
                 F.expr(f"t * {cap_bp} div 10000").alias("cap"),
                 F.expr(f"tot * {budget_num} div {budget_den}")
                 .alias("b"),
                 F.least(
                     F.expr(f"(tot * {budget_num} div {budget_den}) "
                            "div ns"),
                     F.expr(f"t * {cap_bp} div 10000")).alias("alloc")))
    for _ in range(1, n_rounds):
        g = a.agg(F.first("b").alias("b0"),
                  F.sum("alloc").alias("spent"),
                  F.sum((F.col("alloc") < F.col("cap")).cast("long"))
                  .alias("nu"))
        a = (a.crossJoin(F.broadcast(g))
             .select("source", "t", "cap", "b",
                     F.when((F.col("alloc") < F.col("cap"))
                            & (F.col("nu") > 0),
                            F.least(
                                F.expr("alloc + (b0 - spent) div nu"),
                                F.col("cap")))
                     .otherwise(F.col("alloc")).alias("alloc")))
    return (a.select("source", F.col("t").alias("tokens"),
                     F.col("cap").alias("cap_tokens"),
                     F.col("alloc").alias("alloc_tokens"),
                     F.expr("alloc * 10000 div t").alias("epochs_bp"))
            .orderBy("source"))
