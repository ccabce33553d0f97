"""Kafka Structured Streaming source + Confluent wire-format Avro decode.

Mirrors the reference's consume/convert path Spark-first:
- consume: ``spark.readStream.format("kafka")`` already exposes the
  whole record envelope (key, value, topic, partition, offset,
  timestamp) — the exact fields the reference's SMT chain re-attaches
  by hand (/root/reference/kafana.http:84-93)
- convert: Confluent-framed Avro (magic byte 0x0 + 4-byte schema id +
  payload) must have the 5-byte header stripped before ``from_avro``;
  the tombstone branch substitutes "TOMBSTONE" for null values
  (/root/reference/convert/.../TombstoneAwareAvroConverter.java:26-31)

No broker exists in the test environment, so ``kafka_stream`` is a thin
builder (exercised only for plan construction) while the pure-column
helpers (wire-format strip, tombstone decode) are unit-tested against
synthetic byte frames.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # spark-avro is a separate artifact; gate so the engine loads without it
    from pyspark.sql.avro.functions import from_avro
    HAVE_AVRO = True
except Exception:  # pragma: no cover
    from_avro = None
    HAVE_AVRO = False

CONFLUENT_MAGIC = 0


def kafka_stream(spark: SparkSession, brokers: str, topics: str,
                 starting_offsets: str = "earliest",
                 min_partitions: int | None = None) -> DataFrame:
    """readStream builder for the reference's source config
    (topics 'foo,bar', offset tracking ⇒ checkpointing).

    One Spark partition per Kafka topic-partition by default;
    min_partitions widens skewed/low-partition topics.
    """
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", brokers)
              .option("subscribe", topics)
              .option("startingOffsets", starting_offsets))
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire-format header (magic + schema id),
    yielding the raw Avro payload. Null-safe (tombstones stay null)."""
    return F.substring(value, F.lit(6), F.length(value) - 5)


def confluent_schema_id(value: Column) -> Column:
    """Extract the 4-byte big-endian schema id from a framed message
    (for registry lookup / multi-writer-schema dispatch)."""
    return F.conv(F.hex(F.substring(value, F.lit(2), F.lit(4))), 16, 10) \
        .cast("int")


def decode_avro_value(df: DataFrame, avro_schema_json: str,
                      value_col: str = "value",
                      out_col: str = "value_struct") -> DataFrame:
    """Confluent-framed Avro -> struct column; tombstones (null values)
    pass through as null structs (from_avro of null is null), which the
    enrich step then materializes as 'TOMBSTONE'."""
    if not HAVE_AVRO:  # pragma: no cover
        raise ImportError("pyspark avro functions unavailable; "
                          "provide the spark-avro package")
    payload = strip_confluent_header(F.col(value_col))
    return df.withColumn(
        out_col, from_avro(payload, avro_schema_json, {"mode": "PERMISSIVE"}))


def frame_confluent(payload: bytes, schema_id: int) -> bytes:
    """Build a Confluent-framed message (test helper; the write path's
    to_avro twin of strip_confluent_header)."""
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id) + payload
