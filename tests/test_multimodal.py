"""Multimodal plumbing tests: binary columns through mapInPandas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparktrends_spark.multimodal import (
    decode_payload,
    documents_to_assets,
    extract_features,
    sample_frames,
)
from sparktrends_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return documents_to_assets(load_table(spark, sf_dir, "documents")).persist()


def test_asset_schema_and_metadata(assets):
    row = assets.filter(F.col("asset_id") % 3 == 0).first()
    assert row.modality == "image"
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.width is not None and row.duration_ms is None
    vid = assets.filter(F.col("asset_id") % 3 == 2).first()
    assert vid.modality == "video" and vid.duration_ms >= 1000


def test_extract_features_matches_local_computation(assets):
    feats = {r.asset_id: r for r in extract_features(assets).collect()}
    for src in assets.limit(20).collect():
        got = feats[src.asset_id]
        payload = bytes(src.payload)
        assert got.n_bytes == len(payload)
        assert got.payload_md5 == hashlib.md5(payload).hexdigest()
        assert got.mean_byte == pytest.approx(sum(payload) / len(payload))
        assert got.decode_status == "stubbed_no_codec"


def test_frame_fanout_counts(assets):
    frames = sample_frames(assets, every_ms=400)
    per_asset = {
        r.asset_id: r.n
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    vids = assets.filter(F.col("modality") == "video").collect()
    assert per_asset.keys() == {v.asset_id for v in vids}
    for v in vids:
        assert per_asset[v.asset_id] == max(1, v.duration_ms // 400)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "video", "video/mp4")
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "audio", "audio/wav")
