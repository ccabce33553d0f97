"""Optimizer-grade table statistics — the ANALYZE TABLE twin.

A cost-based optimizer (and a human tuning one) wants, per column:
row/null counts, exact NDV, min/max, and equi-depth quantiles. This
module computes them engine-portably (all integers, the x158
percentile-by-cumulative-distinct-value rule) so the numbers feeding
partitioning / join-strategy decisions are themselves oracle-checked.

At 100 TB the exact-NDV pass is the one expensive aggregate (a
distinct shuffle per column); swap it for the C14 HLL sketch when
approximate is acceptable — the output contract is unchanged.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def column_stats(df: DataFrame,
                 specs: Sequence[tuple[str, Column, bool]]) -> DataFrame:
    """Per-column statistics over integer-valued projections.

    ``specs`` is (field_name, bigint Column, want_quantiles). The
    quantile rule is the x158 integer-percentile discipline: p_q =
    the smallest value whose cumulative count reaches ceil(q*nn/100)
    over the DISTINCT-value groups (never a rank window over the
    corpus), so quantile columns must be bounded-NDV (a unique key
    column gets NDV/min/max but want_quantiles=False; use the C15
    t-digest for high-NDV quantiles).

    Output: (field, n, n_null, ndv, min_v, max_v, p25, p50, p75)
    ordered by field; quantiles are NULL where not requested.

    Scale: ONE corpus pass explodes each row into |specs| (field,
    value) pairs; counts per (field, value) are map-side combinable;
    the cumulative window runs over the distinct-value groups of the
    requested fields only; NDV is the one distinct-cardinality
    shuffle (see module docstring for the HLL swap).
    """
    rows = (df.select(F.explode(F.array(*[
        F.struct(F.lit(name).alias("fname"),
                 col.cast("long").alias("val"))
        for name, col, _ in specs])).alias("nv"))
        .select("nv.fname", "nv.val"))
    base = (rows.groupBy("fname")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
                 .alias("n_null")))
    pv = (rows.where(F.col("val").isNotNull())
          .groupBy("fname", "val")
          .agg(F.count(F.lit(1)).alias("cnt")))
    a1 = (pv.groupBy("fname")
          .agg(F.count(F.lit(1)).alias("ndv"),
               F.min("val").alias("min_v"),
               F.max("val").alias("max_v")))
    hist = [name for name, _, want in specs if want]
    wv = (Window.partitionBy("fname").orderBy("val")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (pv.where(F.col("fname").isin(hist))
           .withColumn("cum", F.sum("cnt").over(wv)))
    nn = base.select("fname",
                     (F.col("n") - F.col("n_null")).alias("nn"))
    pc = (cum.join(nn, "fname")
          .groupBy("fname")
          .agg(*[F.min(F.when(
              F.col("cum") >= F.expr(f"({q} * nn + 99) div 100"),
              F.col("val"))).alias(f"p{q}")
              for q in (25, 50, 75)]))
    return (base.join(a1, "fname").join(pc, "fname", "left")
            .select(F.col("fname").alias("field"), "n", "n_null",
                    "ndv", "min_v", "max_v", "p25", "p50", "p75")
            .orderBy("field"))


def group_quantiles(df: DataFrame, group_col: str, val: Column,
                    quantiles: Sequence[int] = (25, 50, 75)) -> DataFrame:
    """Per-group exact integer quantiles by the same cumulative
    distinct-value rule as :func:`column_stats` (p_q = smallest value
    whose cumulative count reaches ceil(q·n/100)), partitioned by the
    group column.  The window runs over each group's DISTINCT values —
    callers must pass a bounded-NDV projection (bucketed amounts, line
    counts), never a near-unique key; high-NDV quantiles belong to the
    C15 t-digest.

    Output: (group_col, n, p<q>...) ordered by group.
    """
    rows = df.select(F.col(group_col).alias("g"), val.cast("long")
                     .alias("val")).where(F.col("val").isNotNull())
    pv = rows.groupBy("g", "val").agg(F.count(F.lit(1)).alias("cnt"))
    nn = rows.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    wv = (Window.partitionBy("g").orderBy("val")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = pv.withColumn("cum", F.sum("cnt").over(wv))
    out = (cum.join(nn, "g")
           .groupBy("g", "n")
           .agg(*[F.min(F.when(
               F.col("cum") >= F.expr(f"({q} * n + 99) div 100"),
               F.col("val"))).alias(f"p{q}")
               for q in quantiles]))
    return (out.select(F.col("g").alias(group_col), "n",
                       *[f"p{q}" for q in quantiles])
            .orderBy(group_col))


#: floor(10⁴·log₁₀(1 + 1/d)) for d = 1..9 — the Benford expectation,
#: computed ONCE driver-side so neither engine evaluates a log.
BENFORD_BP = tuple(
    int(math.floor(10000 * math.log10(1 + 1 / d)))
    for d in range(1, 10))


def benford_digits(df: DataFrame, cents: Column) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fraud/data-quality audit for naturally-occurring monetary
    amounts (synthetic or truncated data departs loudly).

    The amount is integer cents (floor(x·100 + 0.5), the house money
    discipline) so the leading digit is exact string arithmetic —
    no logs, no floats anywhere in either engine; the expected shares
    are the precomputed :data:`BENFORD_BP` constants.

    Output: one row per digit 1..9 (absent digits densified to 0):
    (digit, n_obs, obs_bp, exp_bp, dev_bp) ordered by digit.

    Scale: one combinable 9-bucket count; the total and the digit
    spine ride 1-row/9-row broadcasts.
    """
    base = (df.select(cents.cast("long").alias("v"))
            .where(F.col("v") > 0))
    g = (base.select(F.substring(F.col("v").cast("string"), 1, 1)
                     .cast("int").alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int")
                                      .alias("digit"))
    tot = g.agg(F.sum("n").alias("tot"))
    exp_bp = F.element_at(
        F.array(*[F.lit(b) for b in BENFORD_BP]), F.col("digit"))
    return (spine.join(g, "digit", "left")
            .crossJoin(F.broadcast(tot))
            .select("digit",
                    F.coalesce("n", F.lit(0)).alias("n_obs"),
                    F.expr("coalesce(n, 0) * 10000 div tot")
                    .alias("obs_bp"),
                    exp_bp.cast("long").alias("exp_bp"))
            .withColumn("dev_bp", F.col("obs_bp") - F.col("exp_bp"))
            .orderBy("digit"))


def best_stump(df: DataFrame, feature: Column, label: Column,
               top_k: int = 5) -> DataFrame:
    """1R decision stump: the best single-feature threshold split
    (x ≤ t vs x > t) for a binary label, scored by the purity
    criterion Σ_side (pos² + neg²)/n_side in integer µunits — the
    monotone twin of Gini-impurity minimization, kept in truncating
    integer division so both engines rank splits identically.

    Candidate thresholds are the feature's distinct values with a
    non-empty right side; ``acc_bp`` is the majority-vote accuracy of
    the resulting two-leaf classifier.

    Output: top-``top_k`` splits by (score_u desc, threshold asc):
    (threshold, n_left, pos_left, n_right, pos_right, score_u,
    acc_bp).

    Scale: the corpus collapses to per-distinct-value (n, pos) counts
    (map-side combinable); the cumulative window runs over the
    DISTINCT-value groups only (the x232 rule — callers pass a
    bounded-NDV feature, never a unique key); totals ride a 1-row
    broadcast. Purity products stay bigint-safe to ~3e9 rows.
    """
    base = df.select(feature.cast("long").alias("f"),
                     label.cast("long").alias("y"))
    g = (base.groupBy("f")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")))
    w = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select("f", F.sum("n").over(w).alias("nl"),
                   F.sum("p").over(w).alias("pl"))
    tot = g.agg(F.sum("n").alias("nn"), F.sum("p").alias("pp"))
    k = (cum.crossJoin(F.broadcast(tot))
         .where(F.col("nl") < F.col("nn")))
    return (k.selectExpr(
        "f AS threshold", "nl AS n_left", "pl AS pos_left",
        "nn - nl AS n_right", "pp - pl AS pos_right",
        "(1000000 * (pl*pl + (nl-pl)*(nl-pl))) div nl + "
        "(1000000 * ((pp-pl)*(pp-pl) + "
        "((nn-pp)-(nl-pl))*((nn-pp)-(nl-pl)))) div (nn-nl) AS score_u",
        "10000 * (greatest(pl, nl-pl) + "
        "greatest(pp-pl, (nn-pp)-(nl-pl))) div nn AS acc_bp")
        .orderBy(F.col("score_u").desc(), "threshold")
        .limit(top_k))
