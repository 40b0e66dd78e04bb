"""Asset-table construction: documents -> multimodal asset rows.

The testdata ships no binary media, so the asset table is derived
deterministically from ``documents``: the UTF-8 text bytes stand in for
the payload, and metadata (modality, dimensions, duration) is a pure
function of ``doc_id``. Everything downstream — binary columns, Arrow
batches, frame fan-out — is the real 100 TB shape; only the bytes are
synthetic.

``encode_media_payloads`` upgrades that table to carry REAL media
containers: each image payload becomes an actual PNG (encoded from the
deterministic pseudo-pixels) and each audio payload an actual WAV — so
the decode→feature queries exercise the real stdlib codecs end-to-end
while the decoded values stay a pure function of the source text
(which is what keeps them DuckDB-oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")
MIME_TYPES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def documents_to_assets(docs: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table from the documents table.

    modality cycles by doc_id % 3; images get width/height, audio/video
    get a duration; ``payload`` is the UTF-8 text bytes (BinaryType).
    """
    modality = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(modality == "image", F.lit(MIME_TYPES["image"]))
        .when(modality == "audio", F.lit(MIME_TYPES["audio"]))
        .otherwise(F.lit(MIME_TYPES["video"]))
    )
    is_image = modality == "image"
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        mime.alias("mime_type"),
        F.when(is_image, (32 * (1 + F.col("doc_id") % 8)).cast("int")).alias("width"),
        F.when(is_image, (32 * (1 + F.col("doc_id") % 5)).cast("int")).alias("height"),
        F.when(~is_image, (1000 * (1 + F.col("doc_id") % 10)).cast("long")).alias(
            "duration_ms"
        ),
        F.create_map(F.lit("source"), F.col("source")).alias("extra"),
    )


AUDIO_SAMPLE_RATE = 8000


VIDEO_FRAME_MS = 400


def corrupt_payloads(assets: DataFrame, mod: int = 5) -> DataFrame:
    """Deterministically truncate every ``mod``-th asset's payload to
    half its bytes — a reproducible corruption injector for grading the
    decode error path (a real 100 TB media lake always contains some
    torn/corrupt objects; the engine must quarantine them, not die).
    Pure JVM expression: binary substr, no Python in the row path."""
    half = F.expr("substring(payload, 1, cast(length(payload) / 2 as int))")
    return assets.withColumn(
        "payload",
        F.when(F.col("asset_id") % mod == 0, half).otherwise(F.col("payload")),
    )


def deterministic_exif_tags(asset_id: int) -> dict:
    """The Exif tag set spliced into image ``asset_id`` — one shared
    derivation so the embed pass, the fused scrub-verify pass, and the
    DuckDB oracles all restate the same values."""
    a = int(asset_id)
    return {
        "make": "SparkTrends",
        "model": "CamSim",
        "orientation": 1 + a % 8,
        "datetime": f"2026:01:{1 + a % 28:02d} 12:00:00",
        "exposure_time": (1, 125 * (1 + a % 4)),
        "iso": 100 * (1 + a % 16),
    }


def embed_exif_payloads(assets: DataFrame) -> DataFrame:
    """Splice a deterministic Exif APP1 into every image payload
    (JPEG-encoded upstream via ``encode_media_payloads``): orientation,
    camera make/model, capture time, exposure and ISO derived from
    asset_id — so the downstream Exif extraction path
    (``image_exif_features``) is value-oracle-checkable. Non-image
    payloads pass through untouched. One mapInPandas; bytes never
    leave the executors."""
    schema = assets.schema

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparktrends_spark.multimodal.exif import insert_exif

        for pdf in batches:
            out = []
            for asset_id, payload, modality in zip(
                pdf["asset_id"], pdf["payload"], pdf["modality"]
            ):
                raw = bytes(payload)
                if modality != "image":
                    out.append(raw)
                    continue
                out.append(
                    insert_exif(raw, deterministic_exif_tags(int(asset_id)))
                )
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return assets.mapInPandas(embed, schema)


def encode_media_payloads(
    assets: DataFrame,
    image_codec: str = "png",
    video_codec: str | None = None,
) -> DataFrame:
    """Replace synthetic text payloads with REAL media containers.

    - image rows, ``image_codec="png"`` (default):
      ``encode_png(fake_decode_image(text_bytes, w, h))`` — a real,
      decodable PNG whose pixels are the md5-tiled array (lossless).
    - image rows, ``image_codec="jpeg"``: a real baseline JFIF whose
      pixels are the CONSTANT color v = first md5(text) byte — the
      constant-block DC path round-trips bit-exactly at quality 75
      (multimodal/jpeg.py), which is what keeps the full
      huffman→zigzag→quant→IDCT chain value-oracle-checkable.
    - audio rows: ``encode_wav(fake_decode_audio(text_bytes, dur))``
      — a real PCM16 WAV of duration_ms at AUDIO_SAMPLE_RATE.
    - video rows, ``video_codec=None`` (default): unchanged raw text
      bytes (the pre-round-6 behavior, kept for the metadata-math
      twins).
    - video rows, ``video_codec="mp4"``: a real ISO-BMFF container
      (multimodal/mp4.py) whose samples are the 16-byte
      ``md5(text + '#' + i)`` digests, one per VIDEO_FRAME_MS of
      duration — so the demuxed sample bytes ARE the frame oracle.
    - video rows, ``video_codec="mp4_png"``: the nested two-codec
      form — every MP4 sample is itself a real 16x16 PNG whose pixels
      are the md5-tiled array of ``text + '#' + i`` (demux then
      per-frame image decode, the shape a video training pipeline
      actually runs).

    Runs as one Arrow-batched ``mapInPandas`` pass; payload bytes never
    leave the executors. Output schema identical to the input asset
    table, so every downstream featurize path works on either.
    Constant-color JPEG encodes are memoized per (v, w, h) within the
    executor — the synthetic corpus has heavy repetition and the cache
    turns the CPU cost into a dict lookup at scale.
    """
    schema = assets.schema

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from sparktrends_spark.multimodal.decode import (
            encode_png,
            encode_wav,
            fake_decode_audio,
            fake_decode_image,
        )

        jpeg_cache: dict[tuple[int, int, int], bytes] = {}

        def image_payload(raw: bytes, w: int, h: int) -> bytes:
            if image_codec in ("jpeg", "jpeg_progressive"):
                from sparktrends_spark.multimodal.jpeg import (
                    encode_jpeg,
                    encode_jpeg_progressive,
                )

                enc_fn = (
                    encode_jpeg_progressive
                    if image_codec == "jpeg_progressive"
                    else encode_jpeg
                )
                v = hashlib.md5(raw).digest()[0]
                key = (image_codec, v, w, h)
                enc = jpeg_cache.get(key)
                if enc is None:
                    enc = enc_fn(np.full((h, w, 3), v, dtype=np.uint8), 75)
                    jpeg_cache[key] = enc
                return enc
            return encode_png(fake_decode_image(raw, w, h))

        def video_payload(raw: bytes, dur: int) -> bytes:
            if video_codec in ("mp4", "mp4_png", "fmp4"):
                from sparktrends_spark.multimodal.mp4 import (
                    encode_fmp4,
                    encode_mp4,
                )

                n_frames = max(1, dur // VIDEO_FRAME_MS)
                if video_codec == "fmp4":
                    # fragmented layout (moof/mdat pairs) — same
                    # md5(text#i) digest samples as "mp4", so every
                    # downstream demux oracle holds unchanged
                    frames = [
                        hashlib.md5(raw + b"#" + str(i).encode()).digest()
                        for i in range(n_frames)
                    ]
                    return encode_fmp4(
                        frames, VIDEO_FRAME_MS, frames_per_fragment=4
                    )
                if video_codec == "mp4_png":
                    # each sample is itself a real PNG frame: pixels =
                    # the md5-tiled array of (text#i), 16x16 RGB (768
                    # bytes = 48 digests, no tiling remainder)
                    frames = [
                        encode_png(
                            fake_decode_image(
                                raw + b"#" + str(i).encode(), 16, 16
                            )
                        )
                        for i in range(n_frames)
                    ]
                    return encode_mp4(frames, VIDEO_FRAME_MS, width=16, height=16)
                frames = [
                    hashlib.md5(raw + b"#" + str(i).encode()).digest()
                    for i in range(n_frames)
                ]
                return encode_mp4(frames, VIDEO_FRAME_MS)
            return raw

        for pdf in batches:
            out = []
            for payload, modality, w, h, dur in zip(
                pdf["payload"], pdf["modality"], pdf["width"], pdf["height"],
                pdf["duration_ms"],
            ):
                raw = bytes(payload)
                if modality == "image":
                    out.append(image_payload(raw, int(w), int(h)))
                elif modality == "audio":
                    out.append(
                        encode_wav(
                            fake_decode_audio(raw, int(dur), AUDIO_SAMPLE_RATE),
                            AUDIO_SAMPLE_RATE,
                        )
                    )
                else:
                    out.append(video_payload(raw, int(dur)))
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return assets.mapInPandas(encode, schema)
