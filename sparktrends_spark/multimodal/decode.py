"""Media decode boundary — STUBBED in this environment.

The image/audio/video codec libraries (PIL, soundfile, av/ffmpeg) are
not installed in the build container. This module is the single,
clearly-marked seam where they would plug in: every featurize path
calls ``decode_payload`` and degrades to byte-level features when the
decoder reports unavailable.
"""

from __future__ import annotations

from typing import Any

try:  # pragma: no cover - not installed in the build container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decoder_available(modality: str) -> bool:
    """True if a real decoder exists for the modality in this env."""
    return modality == "image" and _HAS_PIL


def decode_payload(payload: bytes, modality: str, mime_type: str) -> Any:
    """Decode raw media bytes into pixels/samples/frames.

    STUB: raises ``NotImplementedError`` unless the matching codec
    library is importable. Callers must catch-or-check
    ``decoder_available`` and fall back to byte-level features — which
    keeps the distributed plumbing testable without codecs.
    """
    if not decoder_available(modality):
        raise NotImplementedError(
            f"no decoder for modality={modality!r} ({mime_type!r}) in this "
            "environment; install PIL/soundfile/av to enable real decode"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover
