"""Streaming tests: batch/stream parity (availableNow drain), windowed
aggregations, session windows, in-stream dedup, Confluent wire format.

SURVEY.md §5.3.3: ingest fixture records as a file-backed stream with
trigger(availableNow=True); the resulting store table must equal the
batch pipeline's output on the same input.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafana_spark.ingest import enrich, events_as_kafka_records
from kafana_spark.sources.kafka import (
    confluent_schema_id, frame_confluent, strip_confluent_header,
)
from kafana_spark.sources.tables import load_table
from kafana_spark.store import read_store, with_store_partitions, write_store
from kafana_spark.streaming.pipeline import (
    ingest_stream, sessionize, windowed_counts,
)
from tests.conftest import SF_SMOKE


def records_df(spark):
    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    return events_as_kafka_records(ev)


def test_stream_batch_parity(spark, tmp_path):
    """availableNow streaming ingest == batch ingest, row for row."""
    records = records_df(spark)

    # batch path
    batch_store = str(tmp_path / "batch_store")
    write_store(enrich(records), batch_store)

    # stream path: stage records as parquet, readStream over them
    staged = str(tmp_path / "staged")
    records.write.parquet(staged)
    stream = (spark.readStream.schema(records.schema).parquet(staged))
    q = ingest_stream(stream, str(tmp_path / "stream_store"),
                      str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    b = read_store(spark, batch_store)
    s = read_store(spark, str(tmp_path / "stream_store"))
    assert b.count() == s.count() == 200

    # identical documents modulo row order (canonical JSON per doc;
    # exceptAll on nested structs trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    # in Spark 4.1, so compare serialized rows instead)
    def canon(df):
        return sorted(
            r.j for r in df.select(F.to_json(F.struct(*sorted(df.columns)))
                                   .alias("j")).collect())

    assert canon(b) == canon(s)


def test_stream_restart_is_idempotent(spark, tmp_path):
    """Re-running with the same checkpoint must not duplicate records
    (checkpoint = Connect offset storage)."""
    records = records_df(spark)
    staged = str(tmp_path / "staged")
    records.write.parquet(staged)
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    for _ in range(2):  # second run: nothing new to process
        stream = spark.readStream.schema(records.schema).parquet(staged)
        q = ingest_stream(stream, store, ckpt)
        q.awaitTermination(120)

    assert read_store(spark, store, dedup=False).count() == 200


def test_windowed_counts_batch_twin(spark):
    """The windowed agg is one code path for batch and stream; verify
    the batch semantics against a manual date_trunc aggregation."""
    docs = enrich(records_df(spark))
    out = windowed_counts(docs, window="1 day", by=("topic",))
    manual = (docs.groupBy(F.date_trunc("day", "timestamp").alias("d"))
              .count().collect())
    got = {r.bucket_start: r.cnt for r in out.collect()}
    want = {r.d: r["count"] for r in manual}
    assert got == want


def test_windowed_counts_streaming_mode(spark, tmp_path):
    """Same aggregation as a real streaming query (update-to-complete
    via availableNow + memory sink)."""
    records = records_df(spark)
    staged = str(tmp_path / "staged")
    records.write.parquet(staged)
    stream = spark.readStream.schema(records.schema).parquet(staged)
    agg = windowed_counts(enrich(stream), window="1 day", by=("topic",))
    q = (agg.writeStream.format("memory").queryName("wc")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.bucket_start: r.cnt for r in spark.sql("SELECT * FROM wc").collect()}
    batch = {r.bucket_start: r.cnt
             for r in windowed_counts(enrich(records), "1 day").collect()}
    assert got == batch


def test_sessionize_gap_splits(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [("k", base + dt.timedelta(minutes=m)) for m in (0, 5, 10, 120, 125)]
    df = spark.createDataFrame(rows, ["key", "timestamp"])
    out = sessionize(df, gap="30 minutes").orderBy("session_start").collect()
    assert len(out) == 2
    assert out[0].events == 3 and out[1].events == 2


def test_confluent_wire_format_roundtrip(spark):
    framed = frame_confluent(b"avro-payload-bytes", schema_id=42)
    df = spark.createDataFrame([(framed,), (None,)], ["value"])
    out = df.select(
        strip_confluent_header(F.col("value")).alias("payload"),
        confluent_schema_id(F.col("value")).alias("sid"),
    ).collect()
    assert bytes(out[0].payload) == b"avro-payload-bytes"
    assert out[0].sid == 42
    assert out[1].payload is None and out[1].sid is None  # tombstone-safe


def test_stateful_running_counts_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches — the
    final per-key total equals the batch groupBy count."""
    from kafana_spark.streaming.stateful import running_counts

    records = records_df(spark)
    staged = str(tmp_path / "staged")
    # two files → with maxFilesPerTrigger=1, two micro-batches
    records.limit(120).write.parquet(staged)
    records.subtract(records.limit(120)).write.mode("append").parquet(staged)

    stream = (spark.readStream.schema(records.schema)
              .option("maxFilesPerTrigger", "1").parquet(staged))
    out = running_counts(stream, key_col="key")
    q = (out.writeStream.format("memory").queryName("rc")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # update mode emits one row per key per batch; lifetime total = max
    got = {r.key: r.mx for r in spark.sql(
        "SELECT key, MAX(events) AS mx FROM rc GROUP BY key").collect()}
    want = {r.key: r.cnt for r in records.groupBy(
        F.col("key").cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want


def test_exactly_once_replayed_batch_overwrites(spark, tmp_path):
    """A redelivered micro-batch must overwrite its own batch directory,
    not append duplicates (foreachBatch + deterministic path = the
    plain-parquet idempotency contract)."""
    from kafana_spark.streaming.pipeline import ingest_stream_exactly_once

    records = records_df(spark)
    staged = str(tmp_path / "staged")
    records.write.parquet(staged)
    store = str(tmp_path / "store")

    stream = spark.readStream.schema(records.schema).parquet(staged)
    q = ingest_stream_exactly_once(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    first = spark.read.parquet(store)
    first_ids = sorted(r._id for r in first.select("_id").collect())
    assert len(first_ids) == 200

    # simulate redelivery: run batch 0's write again by hand
    from kafana_spark.ingest import enrich
    from kafana_spark.store import with_store_partitions
    docs = with_store_partitions(enrich(records))
    docs.write.mode("overwrite").partitionBy("topic", "ds") \
        .parquet(f"{store}/batch=0")

    replayed = spark.read.parquet(store)
    assert replayed.count() == 200  # no duplicates
    assert sorted(r._id for r in replayed.select("_id").collect()) == first_ids


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (watermarked both sides) produces the
    same pairs as the identical batch join."""
    from kafana_spark.streaming.pipeline import stream_interval_join

    records = enrich(records_df(spark)).select("key", "timestamp", "offset")
    left = records.where(F.col("offset") % 2 == 0)
    right = records.where(F.col("offset") % 2 == 1)

    batch = stream_interval_join(left, right, key="key",
                                 upper_seconds=3600)
    want = sorted((r.offset, r.r_offset) for r in batch.collect())
    assert want, "fixture should produce at least one joined pair"

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ldir)
    right.write.parquet(rdir)
    ls = spark.readStream.schema(left.schema).parquet(ldir)
    rs = spark.readStream.schema(right.schema).parquet(rdir)
    joined = stream_interval_join(ls, rs, key="key", upper_seconds=3600)
    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.offset, r.r_offset) for r in
                 spark.sql("SELECT offset, r_offset FROM ssj").collect())
    assert got == want


def test_stateful_sessionizer_event_time_timeout(spark, tmp_path):
    """Custom session operator (applyInPandasWithState + event-time
    timeout): a session is emitted either when a new burst starts
    beyond the gap, or when the watermark passes last_event + gap;
    a still-open session at stream end stays unemitted (append-mode
    streaming semantics)."""
    import time as _time
    from kafana_spark.streaming.stateful import sessionize_stateful

    schema = "key string, timestamp timestamp"
    batches = [
        [("u", dt.datetime(2024, 1, 1, 0, 0)),
         ("u", dt.datetime(2024, 1, 1, 0, 10))],
        [("u", dt.datetime(2024, 1, 1, 3, 0))],   # closes session 1
        [("u", dt.datetime(2024, 1, 1, 9, 0))],   # times out session 2
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1) \
            .write.mode("append").parquet(str(tmp_path / "in"))
        _time.sleep(1.2)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "in")))
    out = sessionize_stateful(stream, gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("ssf")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = [(r.start_us, r.end_us, r.events) for r in
            spark.sql("SELECT * FROM ssf ORDER BY start_us").collect()]
    us = lambda h, m=0: int(dt.datetime(
        2024, 1, 1, h, m, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert rows == [(us(0), us(0, 10), 2), (us(3), us(3), 1)]


def test_dedup_stream_drops_cross_microbatch_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes an _id redelivered in a
    LATER micro-batch (within the watermark horizon) — the in-stream
    twin of the store's dedup-on-read."""
    import time

    from kafana_spark.streaming.pipeline import dedup_stream

    staged = str(tmp_path / "staged")
    records = records_df(spark).limit(50)
    # batch 1: originals; batch 2 (separate file, arrives later):
    # the same 20 records redelivered + 10 genuinely new ones
    originals = enrich(records)
    first = originals.limit(30)
    redelivered = originals.limit(20)
    fresh = originals.subtract(first).limit(10)
    first.write.parquet(staged)

    stream = (spark.readStream.schema(originals.schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (dedup_stream(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        time.sleep(5)  # batch 1 through
        redelivered.unionByName(fresh).coalesce(1).write.mode("append") \
            .parquet(staged)
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.read.parquet(out_dir)
            if got.count() >= 40:
                break
            time.sleep(2)
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    assert got.count() == 40                       # 30 + 10, no replays
    assert got.select("_id").distinct().count() == 40


def test_dedup_index_sink_through_real_writestream(spark, tmp_path):
    """End-to-end: readStream → writeStream.foreachBatch(
    dedup_index_stream_sink) — the index a real stream builds serves
    identically to the recompute-everything pipeline."""
    from kafana_spark import dedup_index
    from kafana_spark.operators import dedup
    from kafana_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", "text")
    staged = str(tmp_path / "staged")
    # several files → several micro-batches under maxFilesPerTrigger
    docs.repartition(3).write.parquet(staged)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    root = str(tmp_path / "ndidx")
    q = (stream.writeStream
         .foreachBatch(dedup_index.dedup_index_stream_sink(root))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.da, r.db, r.jaccard) for r in
           dedup_index.near_dup_from_index(spark, root, 0.5).collect()}
    expect = {(r.da, r.db, r.jaccard) for r in
              dedup.minhash_near_dup(docs, 0.5).collect()}
    assert got == expect
