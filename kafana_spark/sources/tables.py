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
        # Keep the raw nanos long as ts_ns: predicates on the derived
        # timestamp column cannot be pushed into the parquet scan
        # (timestamp_micros() is opaque to pushdown), but the equivalent
        # long comparison on ts_ns reaches row-group min/max stats —
        # the difference between a pruned read and a full scan on a
        # time-ordered 100 TB table. See ts_bounds() for the helper.
        # ts DIV 1000, NOT ts / 1000: `/` on longs goes through DOUBLE,
        # whose ulp at epoch-nanos magnitude (~1.7e18) is 256 ns — a
        # double round-trip shifts ~12% of rows by 1 µs. Integer
        # division is exact (and is what DuckDB's µs read does).
        df = (df.withColumn("ts_ns", F.col("ts"))
              .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    return df


def ts_bounds(t0: str | None = None, t1: str | None = None) -> F.Column:
    """Pushdown-friendly time-range predicate for the events table.

    Returns ``ts`>=t0 AND ts<t1`` expressed on BOTH the derived
    timestamp (exact semantics) and the raw ``ts_ns`` long (redundant,
    but sargable — Catalyst pushes it to the parquet reader for
    row-group skipping).
    """
    import datetime as _dt

    _EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

    def _ns(s: str) -> int:
        # integer datetime arithmetic: int(d.timestamp()) would truncate
        # fractional seconds, silently making the redundant sargable
        # predicate stricter than the exact timestamp one for
        # sub-second bounds (rows in [floor(t1), t1) dropped)
        d = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        return ((d - _EPOCH) // _dt.timedelta(microseconds=1)) * 1000

    pred = F.lit(True)
    if t0 is not None:
        pred = pred & (F.col("ts") >= F.lit(t0).cast("timestamp")) \
            & (F.col("ts_ns") >= F.lit(_ns(t0)))
    if t1 is not None:
        pred = pred & (F.col("ts") < F.lit(t1).cast("timestamp")) \
            & (F.col("ts_ns") < F.lit(_ns(t1)))
    return pred


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
