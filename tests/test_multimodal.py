"""Multimodal plumbing: schema, determinism, Arrow batch shape, and the
stub decode contract."""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.operators.multimodal import (
    _decode_stub,
    extract_features,
    multimodal_features,
    synthesize_media,
)
from local_datalakehouse_phase2_spark.sources.loaders import load_table


def test_media_schema_and_payload(spark, sf_small):
    media = synthesize_media(load_table(spark, sf_small, "documents"))
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,payload:binary,"
        "meta:struct<codec:string,n_bytes:bigint,sample_rate:int>>"
    )
    row = media.orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) == 64
    assert row.meta.n_bytes == 64 and row.meta.codec == "stub"


def test_feature_extraction_deterministic(spark, sf_small):
    media = synthesize_media(load_table(spark, sf_small, "documents"))
    a = {r.doc_id: (r.width, r.height, r.checksum) for r in extract_features(media).collect()}
    b = {r.doc_id: (r.width, r.height, r.checksum) for r in extract_features(media).collect()}
    assert a == b and len(a) == 500
    # dims derived from payload bytes stay in the stub's declared range
    assert all(16 <= w < 80 and 16 <= h < 80 for (w, h, _) in a.values())


def test_feature_agg_counts(spark, sf_small):
    rows = multimodal_features(spark, sf_small).collect()
    assert {r.media_type for r in rows} == {"image", "audio", "video"}
    assert sum(r.n_media for r in rows) == 500
    for r in rows:
        assert r.total_bytes == r.n_media * 64


def test_decode_stub_contract():
    assert _decode_stub(b"\x00\x01rest") == (16, 17)
    with pytest.raises(NotImplementedError):
        _decode_stub(b"")
