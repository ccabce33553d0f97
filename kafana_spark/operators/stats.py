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
