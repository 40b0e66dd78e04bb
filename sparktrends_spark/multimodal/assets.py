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


def encode_media_payloads(assets: DataFrame) -> DataFrame:
    """Replace synthetic text payloads with REAL media containers.

    - image rows: ``encode_png(fake_decode_image(text_bytes, w, h))``
      — a real, decodable PNG whose pixels are the md5-tiled array.
    - audio rows: ``encode_wav(fake_decode_audio(text_bytes, dur))``
      — a real PCM16 WAV of duration_ms at AUDIO_SAMPLE_RATE.
    - video rows: unchanged (no stdlib codec for mp4; still the
      documented NotImplementedError seam).

    Runs as one Arrow-batched ``mapInPandas`` pass; payload bytes never
    leave the executors. Output schema identical to the input asset
    table, so every downstream featurize path works on either.
    """
    schema = assets.schema

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparktrends_spark.multimodal.decode import (
            encode_png,
            encode_wav,
            fake_decode_audio,
            fake_decode_image,
        )

        for pdf in batches:
            out = []
            for payload, modality, w, h, dur in zip(
                pdf["payload"], pdf["modality"], pdf["width"], pdf["height"],
                pdf["duration_ms"],
            ):
                raw = bytes(payload)
                if modality == "image":
                    out.append(
                        encode_png(fake_decode_image(raw, int(w), int(h)))
                    )
                elif modality == "audio":
                    out.append(
                        encode_wav(
                            fake_decode_audio(raw, int(dur), AUDIO_SAMPLE_RATE),
                            AUDIO_SAMPLE_RATE,
                        )
                    )
                else:
                    out.append(raw)
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return assets.mapInPandas(encode, schema)
