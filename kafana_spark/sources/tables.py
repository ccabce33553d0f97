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
from pyspark.sql.types import LongType, TimestampNTZType

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
    """Normalize events.ts across physical parquet layouts.

    Contract for every consumer: ``ts`` is a session-local TIMESTAMP
    (µs, UTC session tz) and ``ts_ns`` is an epoch-nanos long. The
    sargable story differs per layout, which is why ``ts_bounds()``
    takes the DataFrame to pick the pushdown-friendly twin predicate:

    - TIMESTAMP(NANOS) (legacy nanosAsLong read): ``ts_ns`` IS the
      physical column → long predicates on it reach row-group stats.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ:
      the physical column is kept as ``ts_raw`` → NTZ predicates on it
      push down; ``ts``/``ts_ns`` are exact derived twins (session tz
      is UTC, so the NTZ→LTZ cast is value-preserving).
    - TIMESTAMP(MICROS, utc-adjusted): ``ts`` itself is physical and
      timestamp predicates push down directly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        # ts DIV 1000, NOT ts / 1000: `/` on longs goes through DOUBLE,
        # whose ulp at epoch-nanos magnitude (~1.7e18) is 256 ns — a
        # double round-trip shifts ~12% of rows by 1 µs. Integer
        # division is exact (and is what DuckDB's µs read does).
        df = (df.withColumn("ts_ns", F.col("ts"))
              .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    elif isinstance(dt, TimestampNTZType):
        df = (df.withColumn("ts_raw", F.col("ts"))
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000)))
    else:
        df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
    return df


def ts_bounds(t0: str | None = None, t1: str | None = None,
              df: DataFrame | None = None) -> F.Column:
    """Pushdown-friendly time-range predicate for the events table.

    Returns ``ts>=t0 AND ts<t1`` expressed on the normalized ``ts``
    timestamp (exact semantics) AND a redundant sargable twin aimed at
    the table's *physical* column so Catalyst pushes it into the
    parquet scan for row-group skipping:

    - ``ts_raw`` present (TIMESTAMP_NTZ layout): NTZ comparisons on it
      (session tz is UTC, so wall-clock literals are exact).
    - otherwise: epoch-nanos long comparisons on ``ts_ns`` (physical in
      the legacy nanos layout, derived-but-harmless elsewhere).

    Pass the events DataFrame as ``df`` so the right twin is chosen;
    without it the long twin is used (requires ``ts_ns`` to resolve).
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

    use_ntz = df is not None and "ts_raw" in df.columns

    def _twin(s: str):
        if use_ntz:
            return F.col("ts_raw"), F.lit(s).cast("timestamp_ntz")
        return F.col("ts_ns"), F.lit(_ns(s))

    pred = F.lit(True)
    if t0 is not None:
        c, v = _twin(t0)
        pred = pred & (F.col("ts") >= F.lit(t0).cast("timestamp")) & (c >= v)
    if t1 is not None:
        c, v = _twin(t1)
        pred = pred & (F.col("ts") < F.lit(t1).cast("timestamp")) & (c < v)
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
