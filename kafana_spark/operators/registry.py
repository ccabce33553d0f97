"""Registry of extension-operator queries (SURVEY.md §2.E) exposed to the
driver's correctness harness via __spark_entry__.queries()/oracle_sql().

Filled in as operators land; keys absent from EXTENSION_ORACLE get the
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

EXTENSION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTENSION_ORACLE: dict[str, str] = {}
