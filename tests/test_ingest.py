"""Golden-case tests for the enrichment pipeline (FIXTURES.md §1.3, G1-G7).

These reproduce the reference's only golden scenarios — its canned
producer requests (/root/reference/kafana.http:1-61) — as unit fixtures.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, MapType, StringType, StructField, StructType,
    TimestampType,
)

from kafana_spark.ingest import (
    TOMBSTONE, doc_id, enrich, enrich_schemaless,
)

TS = dt.datetime(2024, 1, 1, 12, 0, 0)

BAR_VALUE = StructType([
    StructField("bar", IntegerType()),
    StructField("baz", StringType()),
])
FOO_VALUE = StructType([
    StructField("foo", StringType()),
    StructField("bar", IntegerType()),
])


def envelope_schema(value_schema, value_name="value_struct"):
    return StructType([
        StructField("key", StringType()),
        StructField(value_name, value_schema),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
    ])


def bar_records(spark, rows):
    return spark.createDataFrame(rows, envelope_schema(BAR_VALUE))


def test_g1_schemad_record(spark):
    df = bar_records(spark, [("1", (1234, "baz"), "bar", 0, 7, TS)])
    doc = enrich(df).collect()[0]
    assert doc.message.bar == 1234
    assert doc.message.baz == "baz"
    assert json.loads(doc.message.value) == {"bar": 1234, "baz": "baz"}
    assert doc.topic == "bar" and doc.partition == 0 and doc.offset == 7
    assert doc.key == "1"
    assert doc._id == "bar+0+7"


def test_g2_tombstone(spark):
    df = bar_records(spark, [("1", None, "bar", 0, 8, TS)])
    doc = enrich(df).collect()[0]
    # tombstone: value fields null, message.value == "TOMBSTONE"
    assert doc.message.value == TOMBSTONE
    assert doc.message.bar is None and doc.message.baz is None
    assert doc.key == "1" and doc._id == "bar+0+8"


def test_g3_second_topic_overlapping_field(spark):
    df = spark.createDataFrame(
        [("1", ("foo", 1234), "foo", 0, 3, TS)], envelope_schema(FOO_VALUE))
    doc = enrich(df).collect()[0]
    assert doc.message.foo == "foo" and doc.message.bar == 1234
    assert doc.topic == "foo"
    assert json.loads(doc.message.value) == {"foo": "foo", "bar": 1234}


def test_g4_key_search_across_topics(spark):
    bar = enrich(bar_records(spark, [("1", (1234, "baz"), "bar", 0, 7, TS)]))
    foo = enrich(spark.createDataFrame(
        [("1", ("foo", 1234), "foo", 0, 3, TS)], envelope_schema(FOO_VALUE)))
    # cross-topic union works on the universal columns (SURVEY.md §7.3.5)
    universal = ["_id", "topic", "partition", "offset", "timestamp", "key"]
    both = bar.select(*universal, F.col("message.value").alias("value")) \
        .unionByName(foo.select(*universal, F.col("message.value").alias("value")))
    hits = both.where(F.col("key") == "1").collect()
    assert {h.topic for h in hits} == {"bar", "foo"}


def test_g5_replay_dedup(spark):
    rec = ("1", (1234, "baz"), "bar", 0, 7, TS)
    df = enrich(bar_records(spark, [rec, rec]))  # delivered twice
    assert df.count() == 2
    assert df.dropDuplicates(["_id"]).count() == 1


def test_g6_schemaless_map_value(spark):
    schema = envelope_schema(MapType(StringType(), StringType()), "value_map")
    df = spark.createDataFrame([("k", {"a": "x"}, "foo", 1, 5, TS)], schema)
    doc = enrich_schemaless(df).collect()[0]
    assert json.loads(doc.message.value) == {"a": "x"}
    assert doc._id == "foo+1+5" and doc.key == "k"


def test_g7_schema_drift_on_one_topic(spark):
    # two value schemas on one topic: enrich each, union on universal cols
    v1 = enrich(bar_records(spark, [("1", (1, "a"), "bar", 0, 1, TS)]))
    v2 = enrich(spark.createDataFrame(
        [("1", ("x", 2), "bar", 0, 2, TS)], envelope_schema(FOO_VALUE)))
    both = v1.unionByName(v2, allowMissingColumns=True)
    rows = {r.offset: r for r in both.collect()}
    assert json.loads(rows[1].message.value) == {"bar": 1, "baz": "a"}
    assert json.loads(rows[2].message.value) == {"foo": "x", "bar": 2}
    # drifted fields are null where absent, never dropped
    assert rows[1].message.foo is None and rows[2].message.baz is None


def test_doc_id_shape(spark):
    df = bar_records(spark, [("1", (1, "a"), "t", 3, 42, TS)])
    assert df.select(doc_id().alias("i")).collect()[0].i == "t+3+42"


def test_enrich_rejects_non_struct(spark):
    df = spark.createDataFrame([("1",)], ["value_struct"])
    with pytest.raises(TypeError):
        enrich(df)
