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


def fake_decode_image(payload: bytes, width: int, height: int):
    """DETERMINISTIC FAKE decode: pseudo-pixels derived from the
    payload, NOT a real codec.

    The md5 digest of the payload is tiled across a (height, width, 3)
    uint8 array — so the "image" is a pure function of the bytes, two
    engines (or two runs) agree exactly, and everything downstream
    (array shapes, resize math, Arrow batch memory ∝ H×W×3) behaves
    like real decoded media. Swap in ``decode_payload`` + np.asarray
    when codecs exist; the call sites don't change.
    """
    import hashlib

    import numpy as np

    digest = hashlib.md5(payload).digest()
    n = width * height * 3
    reps = -(-n // len(digest))  # ceil
    flat = np.frombuffer((digest * reps)[:n], dtype=np.uint8)
    return flat.reshape(height, width, 3)


def fake_decode_audio(payload: bytes, duration_ms: int, sample_rate: int = 8000):
    """DETERMINISTIC FAKE audio decode: int16 PCM samples derived from
    the payload (md5 digest tiled, little-endian pairs), NOT a codec.

    Length = duration_ms * sample_rate / 1000 samples — real 1-D
    sample-array shape and memory, synthetic values. Same seam rules
    as ``fake_decode_image``.
    """
    import hashlib

    import numpy as np

    digest = hashlib.md5(payload).digest()
    n = (duration_ms * sample_rate) // 1000
    nbytes = n * 2
    reps = -(-nbytes // len(digest))
    return np.frombuffer((digest * reps)[:nbytes], dtype="<i2").copy()
