"""Multimodal column plumbing: binary payloads, Arrow-batched mapInPandas
feature extraction, frame-sampling invariants, stubbed decoders."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.catalog import load_table
from big_data_analytics_machine_learning_poc_spark.operators import multimodal as mm

from .conftest import SF_DIR


def test_binary_payload_schema(spark):
    binry = mm.with_binary_payload(load_table(spark, SF_DIR, "documents"))
    assert binry.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,meta:struct<format:string,n_bytes:bigint>>"
    )


def test_decode_features_checksum_matches_md5(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = {r.doc_id: r for r in mm.mm_decode_features(spark, SF_DIR).collect()}
    for row in docs.limit(5).collect():
        expect = int(hashlib.md5(row.text.encode()).hexdigest()[:8], 16)
        got = feats[row.doc_id]
        assert got.checksum32 == expect
        assert got.n_bytes == len(row.text.encode())
        assert got.fake_width == got.n_bytes % 640
        assert got.fake_height == (got.n_bytes * 7) % 480


def test_decode_features_partition_invariant(spark):
    """mapInPandas output must not depend on partitioning (batch boundaries)."""
    docs = mm.with_binary_payload(load_table(spark, SF_DIR, "documents")).select(
        "doc_id", "payload"
    )
    one = sorted(map(tuple, docs.coalesce(1).mapInPandas(mm.fake_decode_features, mm.FEATURE_SCHEMA).collect()))
    many = sorted(map(tuple, docs.repartition(16).mapInPandas(mm.fake_decode_features, mm.FEATURE_SCHEMA).collect()))
    assert one == many


def test_frame_sample_invariants(spark):
    frames = mm.mm_frame_sample(spark, SF_DIR)
    sizes = {
        r.doc_id: r.meta.n_bytes
        for r in mm.with_binary_payload(load_table(spark, SF_DIR, "documents")).collect()
    }
    per_doc: dict[int, list[int]] = {}
    for r in frames.collect():
        per_doc.setdefault(r.doc_id, []).append(r.frame_offset)
    for doc_id, offs in per_doc.items():
        assert len(offs) <= 8
        assert all(0 <= o < sizes[doc_id] for o in offs)
        assert offs == sorted(offs) or sorted(offs) == offs  # evenly spaced, ordered


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG fake")


def test_resize_checksum_is_byte_exact(spark):
    """The stride-4 subsample checksum must match a local reimplementation."""
    import hashlib as _hl

    from big_data_analytics_machine_learning_poc_spark.catalog import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").limit(5).collect()}
    payloads = mm.with_binary_payload(load_table(spark, SF_DIR, "documents")).select(
        "doc_id", "payload"
    )
    out = {
        r.doc_id: r
        for r in payloads.mapInPandas(mm.fake_resize, mm.RESIZE_SCHEMA).collect()
    }
    for doc_id, text in docs.items():
        expect = text.encode()[::4]
        assert out[doc_id].resized_bytes == len(expect)
        assert out[doc_id].resized_checksum32 == int(_hl.md5(expect).hexdigest()[:8], 16)
