"""Multimodal plumbing tests: binary payload columns + Arrow-batched
feature extraction (decode stubbed; plumbing real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafana_spark.operators import multimodal as M
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    return M.attach_binary_payload(docs, "text", "doc_id")


def test_payload_schema(spark):
    df = media(spark)
    assert [f.name for f in df.schema.fields] == ["media_id", "payload", "meta"]
    assert df.schema["payload"].dataType.typeName() == "binary"


def test_metadata_pass_is_jvm_only(spark):
    out = M.media_metadata(media(spark))
    # no Python workers: the plan must be pure project (no mapInPandas)
    assert "mapInPandas" not in out._jdf.queryExecution().executedPlan().toString().lower().replace(" ", "")
    row = out.orderBy("media_id").collect()[0]
    assert row.byte_len > 0 and len(row.payload_md5) == 32


def test_extract_features_shapes_and_determinism(spark):
    out = M.extract_features(media(spark)).orderBy("media_id").collect()
    assert len(out) == 20
    for r in out:
        assert len(r.features) == M.FEATURE_DIM
        assert len(r.sha) == 64
    again = M.extract_features(media(spark)).orderBy("media_id").collect()
    assert [r.features for r in out] == [r.features for r in again]


def test_extract_features_matches_local_hash(spark):
    first = media(spark).orderBy("media_id").limit(1).collect()[0]
    row = (M.extract_features(media(spark))
           .where(F.col("media_id") == first.media_id).collect()[0])
    assert row.sha == hashlib.sha256(bytes(first.payload)).hexdigest()


def test_real_decode_path_raises(spark):
    with pytest.raises(Exception) as exc_info:
        M.extract_features(media(spark), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def test_resize_images_shape_contract(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = M.attach_binary_payload(docs, "text", "doc_id")
    out = M.resize_images(media, width=16, height=16).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 256 and r.width == 16 and r.height == 16
               for r in out)


def test_sample_frames_cardinality_and_keys(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = M.attach_binary_payload(docs, "text", "doc_id")
    out = M.sample_frames(media, every_n_bytes=64,
                                   max_frames=4).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(by_media) == {r.media_id for r in media.collect()}
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..N-1
        assert 1 <= len(idxs) <= 4


def test_stub_gates_raise_without_decoder(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(2)
    media = M.attach_binary_payload(docs, "text", "doc_id")
    import pytest as _pytest
    with _pytest.raises(Exception):
        M.resize_images(media, decode_stub=False).collect()


def test_resize_stub_payload_is_truncate_pad(spark):
    """x70's oracle contract: resized payload == first width·height
    payload bytes, zero-padded — byte-for-byte (md5 checked locally)."""
    import hashlib

    from kafana_spark.operators.multimodal import (
        attach_binary_payload, resize_images,
    )

    df = spark.createDataFrame(
        [(1, "short"), (2, "x" * 300)], ["doc_id", "text"])
    media = attach_binary_payload(df, "text", "doc_id")
    got = {r.media_id: bytes(r.payload)
           for r in resize_images(media, width=16, height=16).collect()}
    for mid, text in ((1, "short"), (2, "x" * 300)):
        expect = text.encode()[:256].ljust(256, b"\0")
        assert got[mid] == expect
        assert hashlib.md5(got[mid]).hexdigest() == \
            hashlib.md5(expect).hexdigest()
