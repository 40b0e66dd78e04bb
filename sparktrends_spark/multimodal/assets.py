"""Asset-table construction: documents -> multimodal asset rows.

The testdata ships no binary media, so the asset table is derived
deterministically from ``documents``: the UTF-8 text bytes stand in for
the payload, and metadata (modality, dimensions, duration) is a pure
function of ``doc_id``. Everything downstream — binary columns, Arrow
batches, frame fan-out — is the real 100 TB shape; only the bytes are
synthetic.
"""

from __future__ import annotations

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
