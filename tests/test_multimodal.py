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


def test_image_pixel_features_match_independent_numpy(spark, sf_dir):
    """The decode->resize dataflow over the deterministic fake decoder:
    Spark's Arrow-batched pooling must agree with an independent
    driver-side numpy computation, value for value."""
    import hashlib

    import numpy as np

    from sparktrends_spark.multimodal.assets import documents_to_assets
    from sparktrends_spark.multimodal.decode import fake_decode_image
    from sparktrends_spark.multimodal.featurize import image_pixel_features
    from sparktrends_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    assets = documents_to_assets(docs)
    got = {
        r.asset_id: r
        for r in image_pixel_features(assets, grid=4).collect()
    }
    expected_imgs = [
        (r.asset_id, bytes(r.payload), r.width, r.height)
        for r in assets.filter("modality = 'image'").collect()
    ]
    assert len(got) == len(expected_imgs) > 0
    for asset_id, payload, w, h in expected_imgs:
        px = fake_decode_image(payload, w, h).astype(np.float64)
        ys = np.linspace(0, h, 5, dtype=int)
        xs = np.linspace(0, w, 5, dtype=int)
        pooled = np.array(
            [
                [px[ys[i]:ys[i+1], xs[j]:xs[j+1], :].mean() for j in range(4)]
                for i in range(4)
            ]
        )
        row = got[asset_id]
        assert row.decode_status == "fake_decode"
        assert abs(row.mean_brightness - px.mean()) < 1e-9
        assert row.pooled_md5 == hashlib.md5(
            np.round(pooled).astype(np.uint8).tobytes()
        ).hexdigest()


def test_fake_decode_image_is_deterministic_and_shaped():
    import numpy as np

    from sparktrends_spark.multimodal.decode import fake_decode_image

    a = fake_decode_image(b"hello", 32, 16)
    b = fake_decode_image(b"hello", 32, 16)
    assert a.shape == (16, 32, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert not (a == fake_decode_image(b"other", 32, 16)).all()
