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


def layout_advisor(df: DataFrame,
                   candidates: Sequence[tuple[str, Column]],
                   block_rows: int = 512,
                   row_id_col: str = "event_id") -> DataFrame:
    """Sort-key / file-layout advisor: for each candidate cluster
    column, measure how scattered its values are across physical row
    blocks under the CURRENT layout (block = row_id div block_rows —
    insertion order as the row-group proxy) versus what sorting on
    that column would achieve. This is the min-max-pruning question a
    100 TB table asks before choosing its parquet sort order: a point
    query on column c must read every block whose [min, max] spans
    the value, and that block set IS the per-value distinct-block
    count under contiguous layout.

    Per candidate column:
      - val_blocks   = sum over values v of distinct blocks holding v
      - ideal_blocks = sum over v of ceil(rows_v / block_rows)
                       (what a perfect sort on c would give)
      - cluster_bp   = 10000*val_blocks div ideal_blocks
                       (10000 = already perfectly clustered; big =
                       sorting on c would prune that factor harder)
      - scan_share_bp = 10000*val_blocks div (n_vals*n_blocks)
                       (expected block fraction a point query on a
                       uniformly-chosen value reads today)

    Output: (col_name, n_vals, n_blocks, val_blocks, ideal_blocks,
    cluster_bp, scan_share_bp) ordered by col_name.

    Scale: ONE corpus pass explodes each row into |candidates|
    (name, value) pairs (map-only), then everything is combinable
    counts over (name, value, block); the global block count rides a
    1-row broadcast. Nothing is collected, no windows.
    """
    blk = F.expr(f"{row_id_col} div {block_rows}").alias("blk")
    named = F.explode(F.array(*[
        F.struct(F.lit(name).alias("cname"),
                 expr.cast("string").alias("val"))
        for name, expr in candidates])).alias("nv")
    rows = df.select(blk, named).select("blk", "nv.cname", "nv.val")
    per_val = (rows.groupBy("cname", "val")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.count_distinct("blk").alias("vblk")))
    nb = df.select(blk).agg(F.count_distinct("blk").alias("n_blocks"))
    per = (per_val.groupBy("cname")
           .agg(F.count(F.lit(1)).alias("n_vals"),
                F.sum("vblk").alias("val_blocks"),
                F.sum(F.expr(
                    f"(n_rows + {block_rows - 1}) div {block_rows}"))
                .alias("ideal_blocks")))
    return (per.crossJoin(F.broadcast(nb))
            .select(F.col("cname").alias("col_name"), "n_vals",
                    "n_blocks", "val_blocks", "ideal_blocks",
                    F.expr("val_blocks * 10000 div ideal_blocks")
                    .alias("cluster_bp"),
                    F.expr("val_blocks * 10000 div (n_vals * n_blocks)")
                    .alias("scan_share_bp"))
            .orderBy("col_name"))
