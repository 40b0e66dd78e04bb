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
        assert got.decode_status == "byte_level"


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
    # containers with no in-engine codec: still the NotImplementedError seam
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "video", "video/webm")
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "image", "image/gif")
    # png/jpeg/wav/mp4 all have real decoders; garbage is corrupt
    # data -> ValueError
    with pytest.raises(ValueError):
        decode_payload(b"xx", "video", "video/mp4")
    with pytest.raises(ValueError):
        decode_payload(b"xx", "audio", "audio/wav")
    with pytest.raises(ValueError):
        decode_payload(b"xx", "image", "image/png")
    with pytest.raises(ValueError):
        decode_payload(b"\xff\xd8\xffxx", "image", "image/jpeg")


def test_decode_corrupt_truncated_containers():
    """Truncated-but-signed containers must raise ValueError, never leak
    EOFError/zlib.error from the stdlib internals."""
    import numpy as np

    from sparktrends_spark.multimodal.decode import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    png = encode_png(np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3))
    wav = encode_wav(np.arange(-50, 50, dtype=np.int16))
    for cut in (9, 20, len(png) - 7):
        with pytest.raises(ValueError):
            decode_png(png[:cut])
    for cut in (5, 12, 30):
        with pytest.raises(ValueError):
            decode_wav(wav[:cut])
    # RIFF-prefixed garbage (the ADVICE repro) -> ValueError, not EOFError
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxx")


def test_codec_round_trips():
    """encode->decode is lossless for RGB PNG and mono PCM16 WAV, and
    decode_png reconstructs every PNG filter type and color type."""
    import zlib

    import numpy as np

    from sparktrends_spark.multimodal.decode import (
        PNG_SIGNATURE,
        _png_chunk,
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()

    samples = rng.integers(-(2**15), 2**15, size=311, dtype=np.int16)
    got, rate = decode_wav(encode_wav(samples, sample_rate=16000))
    assert rate == 16000 and (got == samples).all()
    # stereo input -> channel 0 (engine mono convention)
    import io
    import wave

    stereo = np.column_stack([samples, -samples]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(stereo.astype("<i2").tobytes())
    got2, _ = decode_wav(buf.getvalue())
    assert (got2 == samples).all()

    # hand-built PNGs exercising filters 1-4 and gray/GA/RGBA color types
    def build_png(pixels, color_type, ftype):
        h, w, ch = pixels.shape
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.uint8)
        for y in range(h):
            line = pixels[y].reshape(-1).astype(np.int16)
            if ftype == 0:
                filt = line
            elif ftype == 1:  # Sub
                left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
                filt = line - left
            elif ftype == 2:  # Up
                filt = line - prev
            elif ftype == 3:  # Average
                left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
                filt = line - ((left + prev.astype(np.int16)) >> 1)
            else:  # Paeth
                filt = np.empty_like(line)
                for x in range(w * ch):
                    a = int(line[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[x] = line[x] - pred
            raw.append(ftype)
            raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
            prev = pixels[y].reshape(-1).copy()
        import struct

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = rng.integers(0, 256, size=(6, 7, ch), dtype=np.uint8)
        for ftype in range(5):
            decoded = decode_png(build_png(px, color_type, ftype))
            if color_type == 0:
                expect = np.repeat(px, 3, axis=2)
            elif color_type == 4:
                expect = np.repeat(px[:, :, :1], 3, axis=2)
            elif color_type == 6:
                expect = px[:, :, :3]
            else:
                expect = px
            assert (decoded == expect).all(), (color_type, ftype)


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
