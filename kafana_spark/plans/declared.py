"""The declared query set (SURVEY.md §2.9, Q1-Q22) as DataFrame plans.

Each query is written Spark-first with the DataFrame API — the SQL in
``DECLARED_ORACLE`` is the DuckDB oracle the driver checks against
(row-count + schema + order-insensitive value hash). Determinism rules
(FIXTURES.md §3): total ORDER BY everywhere a LIMIT matters, ROUND(…,2)
on money sums / ROUND(…,4) on averages, timestamps only compared through
date_trunc/DATE, exact aggregates only.

Aliases in the DataFrame plans match the oracle SQL column names exactly
(the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafana_spark.session import tune_session
from kafana_spark.sources.tables import load_table, ts_bounds


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --- C1 discover: time-range filter + sort + limit --------------------------
def q1_discover(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.where(ts_bounds("2024-01-05 00:00:00", "2024-01-06 00:00:00", ev))
            .orderBy(F.col("ts").desc(), F.col("event_id"))
            .limit(50)
            .select("event_id", "user_id", "event_type"))


# --- C2 key lookup ----------------------------------------------------------
def q2_key_lookup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.where(F.col("user_id") == 13)
            .select("event_id", "event_type", F.round("value", 2).alias("value"))
            .orderBy("event_id"))


# --- C3 conjunctive filter --------------------------------------------------
def q3_conjunctive(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.where((F.col("user_id") == 12) & (F.col("event_type") == "purchase"))
            .select("event_id").orderBy("event_id"))


# --- C4/C7 field + range predicate ------------------------------------------
def q4_field_range(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
            .select("l_orderkey", "l_linenumber")
            .orderBy("l_orderkey", "l_linenumber"))


# --- C5 substring search ----------------------------------------------------
def q5_substring(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.where(F.col("text").contains("window"))
            .select("doc_id").orderBy("doc_id"))


# --- C6 boolean combinators -------------------------------------------------
def q6_boolean(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.where(((F.col("event_type") == "error") | (F.col("event_type") == "signup"))
                     & ~(F.col("user_id") == 13))
            .select("event_id").orderBy("event_id"))


# --- C11 terms agg ----------------------------------------------------------
def q7_terms(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "event_type"))


# --- C12 date histogram -----------------------------------------------------
def q8_date_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("d"))


# --- C13 metric aggs --------------------------------------------------------
def q9_metrics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_v"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        F.round(F.avg("value"), 4).alias("avg_v"),
    ).orderBy("event_type"))


# --- JSON extraction --------------------------------------------------------
def q10_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select("event_id", k.alias("k"))
            .where(F.col("k") > 80)
            .orderBy("event_id"))


# --- C14 exact distinct -----------------------------------------------------
def q11_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("u"))
            .orderBy("event_type"))


# --- rollup -----------------------------------------------------------------
def q12_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.rollup("event_type").agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.coalesce("event_type", F.lit("ALL")).alias("et"), "cnt")
            .orderBy("et"))


# --- inner equi-join (broadcast) --------------------------------------------
def q13_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # nation has 25 rows at every SF — always broadcast.
    return (cust.join(F.broadcast(nation),
                      cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name").agg(F.count(F.lit(1)).alias("custs"))
            .orderBy(F.col("custs").desc(), "n_name"))


# --- 3-way join + agg (TPC-H-ish revenue) -----------------------------------
def q14_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .orderBy("n_name"))


# --- left semi / anti -------------------------------------------------------
def q15_semi_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    anti = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("anti").alias("kind"), "n"))
    semi = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("semi").alias("kind"), "n"))
    return anti.unionByName(semi).orderBy("kind")


# --- non-equi (theta) join --------------------------------------------------
def q16_theta_join(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    # equi on partkey + theta residual; Spark plans this as a hash join
    # with the range predicate as a post-join filter condition.
    return (li.join(part, (li.l_partkey == part.p_partkey)
                    & (li.l_quantity > part.p_size))
            .groupBy("p_partkey").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("p_partkey"))


# --- C16 latest-state-per-key (window rank) ---------------------------------
def q17_latest_state(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id")
            .orderBy("user_id"))


# --- analytic window (running frame) ----------------------------------------
def q18_running_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.where(F.col("user_id") == 12)
            .select("event_id",
                    F.sum(F.lit(1).cast("bigint")).over(w).alias("seq"))
            .orderBy("event_id"))


# --- C10 set ops ------------------------------------------------------------
def q19_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    errors = ev.where(F.col("event_type") == "error").select("user_id")
    return purchases.intersect(errors).orderBy("user_id")


# --- E4 text stats ----------------------------------------------------------
def q20_text_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("chars"),
    ).orderBy("lang"))


# --- E1 exact dedup ---------------------------------------------------------
def q21_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # group on the 32-byte content hash, not the text (the exact_dedup
    # discipline, r12): the count shuffle then carries sha2 keys
    # instead of the distinct corpus text — identical dup_texts by
    # construction (collision P ≈ n²/2²⁵⁷; oracle replays group-by-text)
    return (docs.groupBy(F.unhex(F.sha2(F.col("text"), 256)).alias("h"))
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .agg(F.count(F.lit(1)).alias("dup_texts")))


# --- C8/C18 existence + numeric histogram -----------------------------------
def q22_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 50) * 50).cast("int").alias("bucket")
    return (ev.where(F.col("value").isNotNull())
            .groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("bucket"))


DECLARED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_discover": q1_discover,
    "q02_key_lookup": q2_key_lookup,
    "q03_conjunctive": q3_conjunctive,
    "q04_field_range": q4_field_range,
    "q05_substring": q5_substring,
    "q06_boolean": q6_boolean,
    "q07_terms": q7_terms,
    "q08_date_histogram": q8_date_histogram,
    "q09_metrics": q9_metrics,
    "q10_json": q10_json,
    "q11_distinct": q11_distinct,
    "q12_rollup": q12_rollup,
    "q13_join": q13_join,
    "q14_revenue": q14_revenue,
    "q15_semi_anti": q15_semi_anti,
    "q16_theta_join": q16_theta_join,
    "q17_latest_state": q17_latest_state,
    "q18_running_window": q18_running_window,
    "q19_set_ops": q19_set_ops,
    "q20_text_stats": q20_text_stats,
    "q21_exact_dedup": q21_exact_dedup,
    "q22_histogram": q22_histogram,
}

DECLARED_ORACLE: dict[str, str] = {
    "q01_discover": (
        "SELECT event_id, user_id, event_type FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP "
        "'2024-01-06 00:00:00' ORDER BY ts DESC, event_id LIMIT 50"
    ),
    "q02_key_lookup": (
        "SELECT event_id, event_type, ROUND(value, 2) AS value FROM events "
        "WHERE user_id = 13 ORDER BY event_id"
    ),
    "q03_conjunctive": (
        "SELECT event_id FROM events WHERE user_id = 12 AND "
        "event_type = 'purchase' ORDER BY event_id"
    ),
    "q04_field_range": (
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45 "
        "AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber"
    ),
    "q05_substring": (
        "SELECT doc_id FROM documents WHERE text LIKE '%window%' ORDER BY doc_id"
    ),
    "q06_boolean": (
        "SELECT event_id FROM events WHERE (event_type = 'error' OR "
        "event_type = 'signup') AND NOT user_id = 13 ORDER BY event_id"
    ),
    "q07_terms": (
        "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type "
        "ORDER BY cnt DESC, event_type"
    ),
    "q08_date_histogram": (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS cnt "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    "q09_metrics": (
        "SELECT event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_v, "
        "ROUND(MIN(value), 2) AS min_v, ROUND(MAX(value), 2) AS max_v, "
        "ROUND(AVG(value), 4) AS avg_v FROM events GROUP BY event_type "
        "ORDER BY event_type"
    ),
    "q10_json": (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k "
        "FROM events WHERE CAST(json_extract(props, '$.k') AS INTEGER) > 80 "
        "ORDER BY event_id"
    ),
    "q11_distinct": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS u FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "q12_rollup": (
        "SELECT COALESCE(event_type, 'ALL') AS et, COUNT(*) AS cnt FROM events "
        "GROUP BY ROLLUP(event_type) ORDER BY et"
    ),
    "q13_join": (
        "SELECT n.n_name, COUNT(*) AS custs FROM customer c JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name "
        "ORDER BY custs DESC, n.n_name"
    ),
    "q14_revenue": (
        "SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) "
        "AS revenue FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name"
    ),
    "q15_semi_anti": (
        "SELECT 'anti' AS kind, COUNT(*) AS n FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) UNION ALL "
        "SELECT 'semi' AS kind, COUNT(*) AS n FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY kind"
    ),
    "q16_theta_join": (
        "SELECT p.p_partkey, COUNT(*) AS n FROM part p JOIN lineitem l ON "
        "l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size "
        "GROUP BY p.p_partkey ORDER BY p.p_partkey"
    ),
    "q17_latest_state": (
        "SELECT user_id, event_id FROM (SELECT user_id, event_id, ROW_NUMBER() "
        "OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM events) t WHERE rn = 1 ORDER BY user_id"
    ),
    "q18_running_window": (
        # CAST the window SUM: DuckDB widens integer SUM to HUGEINT
        # (Arrow decimal128) while Spark emits BIGINT — the driver's
        # canonicalizer hashes them differently.
        "SELECT event_id, CAST(SUM(CAST(1 AS BIGINT)) OVER (PARTITION BY "
        "user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS seq FROM events WHERE user_id = 12 "
        "ORDER BY event_id"
    ),
    "q19_set_ops": (
        "SELECT user_id FROM events WHERE event_type = 'purchase' INTERSECT "
        "SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id"
    ),
    "q20_text_stats": (
        # CAST: DuckDB integer SUM -> HUGEINT; Spark emits BIGINT.
        "SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    "q21_exact_dedup": (
        "SELECT COUNT(*) AS dup_texts FROM (SELECT text FROM documents "
        "GROUP BY text HAVING COUNT(*) > 1) t"
    ),
    "q22_histogram": (
        "SELECT CAST(FLOOR(value / 50) * 50 AS INTEGER) AS bucket, COUNT(*) "
        "AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1"
    ),
}
