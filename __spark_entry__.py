"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-ish revenue rollup
    (3-way join + broadcast dim + agg)."""
    from kafana_spark.plans.declared import q14_revenue

    return q14_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kafana_spark.plans.declared import DECLARED_QUERIES
    from kafana_spark.operators.registry import EXTENSION_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(DECLARED_QUERIES)
    out.update(EXTENSION_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted keys get the weaker
    rows-only check)."""
    from kafana_spark.plans.declared import DECLARED_ORACLE
    from kafana_spark.operators.registry import EXTENSION_ORACLE

    out: dict[str, str] = {}
    out.update(DECLARED_ORACLE)
    out.update(EXTENSION_ORACLE)
    return out
