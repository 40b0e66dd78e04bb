"""Multimodal columns (north-star surface).

Convention: image/audio/video payloads ride as opaque ``binary``
columns plus typed metadata (schemas.MULTIMODAL_ASSET_SCHEMA); all
per-payload compute goes through Arrow-batched ``mapInPandas`` so bytes
never round-trip row-at-a-time through Python.

The actual media decode (PIL/librosa/ffmpeg) is NOT available in this
environment and is stubbed behind ``decode.decode_payload`` — the Spark
plumbing (schema, partitioning, UDF signatures, batch shapes, frame
fan-out) is real and tested.
"""

from sparktrends_spark.multimodal.assets import documents_to_assets
from sparktrends_spark.multimodal.decode import decode_payload
from sparktrends_spark.multimodal.featurize import extract_features, sample_frames

__all__ = [
    "documents_to_assets",
    "decode_payload",
    "extract_features",
    "sample_frames",
]
