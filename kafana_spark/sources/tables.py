"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

The one quirk: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark cannot read natively (PARQUET_TYPE_ILLEGAL).
With ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as a long of
epoch-nanos; we convert to a microsecond TIMESTAMP column here so every
consumer sees a proper timestamp. (DuckDB reads the same file at full ns
precision; the declared query set only compares timestamps through
date_trunc/CAST-to-DATE, so the µs truncation is invisible to the oracle
— see SURVEY.md §2.9.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are small at EVERY scale factor by construction
# (region=5, nation=25 rows always) — always safe to broadcast.
TINY_DIMS = frozenset({"region", "nation"})


def _events(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events.ts nanos column."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _events(spark, path)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
