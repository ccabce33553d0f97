"""Store layout + latest-state view tests (SURVEY.md §1.1 changelog model)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from kafana_spark.ingest import enrich
from kafana_spark.store import latest_state, read_store, write_store
from tests.test_ingest import BAR_VALUE, bar_records

TS1 = dt.datetime(2024, 1, 1, 10, 0)
TS2 = dt.datetime(2024, 1, 2, 10, 0)


def docs(spark):
    return enrich(bar_records(spark, [
        ("1", (10, "a"), "bar", 0, 1, TS1),
        ("1", (11, "b"), "bar", 0, 2, TS1),   # update of key 1
        ("2", (20, "c"), "bar", 0, 3, TS2),
        ("2", None, "bar", 0, 4, TS2),        # tombstone deletes key 2
        ("3", (30, "d"), "bar", 1, 1, TS2),   # other partition
    ]))


def test_store_roundtrip_and_partition_layout(spark, tmp_path):
    path = str(tmp_path / "store")
    write_store(docs(spark), path)
    # partitioned by topic and ds → pruning-friendly layout on disk
    assert os.path.isdir(os.path.join(path, "topic=bar", "ds=2024-01-01"))
    assert os.path.isdir(os.path.join(path, "topic=bar", "ds=2024-01-02"))
    out = read_store(spark, path)
    assert out.count() == 5
    assert set(out.columns) >= {"message", "timestamp", "topic", "partition",
                                "offset", "key", "_id"}


def test_store_replay_dedup(spark, tmp_path):
    path = str(tmp_path / "store")
    write_store(docs(spark), path)
    write_store(docs(spark), path)  # replay the whole batch
    assert read_store(spark, path, dedup=False).count() == 10
    assert read_store(spark, path).count() == 5  # _id dedup-on-read


def test_latest_state_picks_max_offset_and_drops_tombstones(spark):
    state = {r.key: r for r in latest_state(docs(spark)).collect()}
    assert set(state) == {"1", "3"}          # key 2 deleted by tombstone
    assert state["1"].offset == 2            # latest update wins
    assert state["1"].message.bar == 11


def test_latest_state_keep_tombstones(spark):
    state = latest_state(docs(spark), drop_tombstones=False)
    rows = {r.key: r for r in state.collect()}
    assert set(rows) == {"1", "2", "3"}
    assert rows["2"].message.value == "TOMBSTONE"
