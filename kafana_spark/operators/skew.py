"""Skew mitigation for hot keys — salting utilities.

AQE's skew-join splitting (enabled in session.py) handles skewed
sort-merge joins at runtime; these helpers cover the shapes AQE does
not: hot-key *aggregations* (one reducer owns the whole hot key) and
broadcast-averse joins where one side must shuffle on a skewed key.

The salt is deterministic per row (hash of a row-unique column), so
plans stay replayable and tests reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_col: str, parts: int = 32,
                top_k: int = 10) -> DataFrame:
    """Shuffle-skew advisor for a prospective join/groupBy key — the
    report that decides BEFORE a 100 TB shuffle whether ``key_col``
    needs ``salted_join``/``salted_agg``: per hot key, its row count,
    corpus share, and the integer salt recommendation
    salts = ceil(n_key·parts div n_total) — how many partitions'
    worth of rows the key holds under a ``parts``-way hash shuffle
    (1 = no salting needed; k > 1 = salt into k buckets).

    Output: (key, n, share_bp, salts) — the ``top_k`` heaviest keys
    (count desc, key asc).

    Scale: one combinable count per key, a 1-row total broadcast,
    and a TakeOrdered head — the report never shuffles the data it
    is protecting.
    """
    c = (df.groupBy(F.col(key_col).cast("string").alias("key"))
         .agg(F.count(F.lit(1)).alias("n")))
    tot = c.agg(F.sum("n").alias("n_total"))
    return (c.crossJoin(F.broadcast(tot))
            .select("key", "n",
                    F.expr("10000 * n div n_total").alias("share_bp"),
                    F.expr(f"(n * {parts} + n_total - 1) div n_total")
                    .alias("salts"))
            .orderBy(F.col("n").desc(), "key").limit(top_k))


def with_salt(df: DataFrame, unique_col: str, buckets: int,
              salt_col: str = "__salt") -> DataFrame:
    """Add a deterministic salt in [0, buckets) derived from a
    row-unique column."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)))


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                unique_col: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` has skewed join keys.

    The big side is salted; the small side is replicated ``buckets``
    times (explode of a literal range — cheap when small really is
    small), and the join key becomes (on…, salt). Each hot key now
    spreads over ``buckets`` reducers instead of one straggler.

    Only ``inner`` and ``left`` (big side preserved) are equivalent to
    the unsalted join: for right/full/left_semi-style joins the
    unmatched *replicated* small-side rows would surface ``buckets``
    times, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "replicating the small side breaks outer/semi semantics")
    big_s = with_salt(big, unique_col, buckets)
    small_s = (small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        .withColumn("__salt", F.col("__salt").cast("long")))
    out = big_s.join(small_s, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(df: DataFrame, keys: Sequence[str], unique_col: str,
               aggs: dict[str, str], buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates on (keys…, salt) — the hot key's rows split
    across ``buckets`` reducers; phase 2 merges the partials on the
    true keys. Supported aggs (column -> fn): count, sum, min, max
    (the re-mergeable ones; avg = sum/count at the call site).
    """
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        p = f"__p_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"unsupported re-mergeable agg: {fn}")
    salted = with_salt(df, unique_col, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
