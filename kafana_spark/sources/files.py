"""File-backed record sources (JSON / CSV / parquet).

The reference ingests only from Kafka; Spark gives file sources for
free and they matter twice here: (a) file-backed streams are the
broker-less test/backfill path (same enrichment pipeline, same store),
(b) bulk backfill of historical dumps into the changelog store. Both
batch and streaming readers return the SAME envelope shape that
`ingest.enrich` expects, so every downstream step is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

FORMATS = ("json", "csv", "parquet")


def read_records(spark: SparkSession, path: str, fmt: str,
                 schema: StructType | str, streaming: bool = False,
                 **options: str) -> DataFrame:
    """Read raw records from files; batch or streaming with one call.

    A streaming read REQUIRES the schema (Structured Streaming cannot
    infer); batch accepts it too for plan stability. CSV defaults to
    header=true.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    reader = spark.readStream if streaming else spark.read
    reader = reader.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def as_envelope(records: DataFrame, topic: str, key_col: str,
                ts_col: str, offset_col: str,
                partition: int = 0) -> DataFrame:
    """Adapt an arbitrary record frame into the Kafka envelope shape
    (`key, value_struct, topic, partition, offset, timestamp`) that
    `ingest.enrich` consumes. Value = all non-envelope columns."""
    value_cols = [c for c in records.columns
                  if c not in {key_col, ts_col, offset_col}]
    return records.select(
        F.col(key_col).cast("string").alias("key"),
        F.struct(*[F.col(c) for c in value_cols]).alias("value_struct"),
        F.lit(topic).alias("topic"),
        F.lit(partition).alias("partition"),
        F.col(offset_col).cast("long").alias("offset"),
        F.col(ts_col).alias("timestamp"),
    )
