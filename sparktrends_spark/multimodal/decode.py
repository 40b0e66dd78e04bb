"""Media codec boundary — real stdlib codecs for PNG and WAV.

Third-party codec libraries (PIL, soundfile, av/ffmpeg) are not
installed in the build container, but two formats need only the
standard library and are implemented for real here:

- **PNG** (``image/png``): ``zlib`` inflate + per-scanline filter
  reconstruction (filters 0-4, 8-bit gray/RGB/gray+alpha/RGBA,
  non-interlaced), and a matching encoder (filter 0, 8-bit RGB).
- **WAV** (``audio/wav``): PCM16 decode/encode via the ``wave``
  module + ``numpy.frombuffer``.
- **JPEG** (``image/jpeg``): baseline sequential codec in pure
  numpy — markers, Annex-K quant/Huffman tables, zigzag, DC/AC
  entropy coding, matrix DCT/IDCT (multimodal/jpeg.py).
- **MP4** (``video/mp4``): real ISO-BMFF container mux/demux —
  ftyp/mdat/moov box tree with stts/stsc/stsz/stco sample tables
  (multimodal/mp4.py). Samples are raw payloads (no H.264 codec in
  this environment — the sample-entry FourCC says so honestly).

Everything else (GIF, progressive JPEG, Matroska, ...) raises
``NotImplementedError``
at this single, clearly-marked seam; callers check
``decoder_available`` / sniff magic bytes and degrade to the
deterministic fake decoders below (which remain as the no-codec twins
and as the pseudo-pixel *generators* the synthetic media assets are
encoded from — see multimodal/assets.encode_media_payloads).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Any

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
WAV_SIGNATURE = b"RIFF"
JPEG_SIGNATURE = b"\xff\xd8\xff"

# channel counts per PNG color type (type 3 = palette, unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decoder_available(modality: str, mime_type: str | None = None) -> bool:
    """True if a real (stdlib/numpy) decoder exists for the modality.

    PNG, JPEG, WAV and the MP4 container are decodable in-engine;
    other containers are not. When ``mime_type`` is omitted the answer
    is for the modality's canonical container (png / wav / mp4).
    """
    if modality == "image":
        return mime_type in (None, "image/png", "image/jpeg", "image/jpg")
    if modality == "audio":
        return mime_type in (None, "audio/wav", "audio/x-wav")
    if modality == "video":
        return mime_type in (None, "video/mp4")
    return False


def decode_payload(payload: bytes, modality: str, mime_type: str) -> Any:
    """Decode raw media bytes into pixels/samples/frames.

    - image/png, image/jpeg -> ``(H, W, 3) uint8`` ndarray (alpha
      dropped, grayscale replicated to 3 channels)
    - audio/wav -> ``(samples int16 ndarray, sample_rate)``
    - video/mp4 -> list of ``(ts_ms, frame_bytes)`` demuxed samples
      (container-level; no bitstream codec in this environment)
    - anything else -> ``NotImplementedError`` (the plug-in seam for
      PIL/soundfile/av); corrupt data for a supported format raises
      ``ValueError``.
    """
    if not decoder_available(modality, mime_type):
        raise NotImplementedError(
            f"no decoder for modality={modality!r} ({mime_type!r}) in this "
            "environment; only PNG/JPEG/WAV/MP4 are supported — install "
            "PIL/soundfile/av for other containers"
        )
    if modality == "image":
        if mime_type in ("image/jpeg", "image/jpg") or (
            mime_type is None and payload[:3] == JPEG_SIGNATURE
        ):
            from sparktrends_spark.multimodal.jpeg import decode_jpeg

            return decode_jpeg(payload)
        return decode_png(payload)
    if modality == "video":
        from sparktrends_spark.multimodal.mp4 import decode_mp4

        return decode_mp4(payload).samples
    return decode_wav(payload)


def decode_png(data: bytes):
    """Real PNG decode: chunk walk -> zlib inflate -> filter
    reconstruction. Supports bit depth 8, color types 0/2/4/6,
    non-interlaced. Returns ``(H, W, 3) uint8`` (alpha dropped,
    grayscale replicated)."""
    import numpy as np

    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, idat = 8, []
    width = height = bit_depth = color_type = interlace = None
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("PNG truncated mid-chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("PNG IHDR malformed")
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            saw_iend = True
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if not saw_iend:
        raise ValueError("PNG truncated: missing IEND")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); "
            "only 8-bit non-interlaced gray/RGB/GA/RGBA"
        )
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT corrupt: {exc}") from exc
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up (uint8 addition wraps mod 256 by itself)
            cur = line + prev
        elif ftype == 1:  # Sub — prefix-sum per byte lane: the recurrence
            # c[x] = line[x] + c[x-bpp] unrolls to a running sum over
            # every bpp-th byte, and mod-256 distributes over addition,
            # so a uint64 cumsum masked to 8 bits is exact (vectorized;
            # the naive per-byte loop costs ~stride Python ops per row)
            cur = line
            for lane in range(bpp):
                cur[lane::bpp] = (
                    np.cumsum(line[lane::bpp], dtype=np.uint64) & 0xFF
                ).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur
    px = out.reshape(height, width, channels)
    if color_type == 0:
        px = np.repeat(px, 3, axis=2)
    elif color_type == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif color_type == 6:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """Real PNG encode: 8-bit RGB, filter 0 on every scanline, one
    IDAT. Lossless — ``decode_png(encode_png(a)) == a`` exactly."""
    import numpy as np

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = arr.shape
    filtered = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    filtered[:, 1:] = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(filtered.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(data: bytes):
    """Real WAV decode via the stdlib ``wave`` module, for every
    integer PCM width the RIFF spec allows: 8-bit unsigned, 16/24/32
    bit signed little-endian. Returns ``(samples int16 ndarray,
    sample_rate)`` — wider widths keep their top 16 bits, 8-bit is
    re-centered and left-shifted, so every width lands in the engine's
    int16 mono convention. Multi-channel input yields channel 0."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            width = w.getsampwidth()
            if width not in (1, 2, 3, 4):
                raise ValueError(f"WAV sample width {width} invalid")
            nch = w.getnchannels()
            rate = w.getframerate()
            nframes = w.getnframes()
            frames = w.readframes(nframes)
            if len(frames) != nframes * width * nch:
                # stdlib wave silently returns short data when the file
                # is torn mid-data-chunk; a truncated supported
                # container must surface as corrupt, not as a shorter
                # clip (quarantine contract)
                raise wave.Error(
                    f"WAV data truncated: header declares {nframes} frames, "
                    f"payload holds {len(frames) // (width * nch)}"
                )
    except (wave.Error, EOFError, struct.error, RuntimeError) as exc:
        # wave.open raises EOFError (via chunk.py) on truncated input,
        # struct.error on malformed headers, and chunk.py's seek raises
        # a bare RuntimeError when a corrupted chunk size points outside
        # the file (found by fuzzing) — per the decode_payload contract,
        # corrupt data for a supported format is ValueError.
        raise ValueError(f"not a WAV: {exc}") from exc
    if width == 1:
        # RIFF 8-bit PCM is unsigned; recenter then scale to int16 range
        raw = np.frombuffer(frames, dtype=np.uint8)
        samples = ((raw.astype(np.int16) - 128) << 8).astype("<i2")
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 3:
        # 24-bit LE: widen to int32 via a zero low byte, keep top 16
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = raw
        samples = (padded.view("<i4").ravel() >> 16).astype("<i2")
    else:  # width == 4
        samples = (np.frombuffer(frames, dtype="<i4") >> 16).astype("<i2")
    if nch > 1:
        samples = np.ascontiguousarray(samples.reshape(-1, nch)[:, 0])
    return samples, rate


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Real WAV encode: mono PCM16. Lossless round-trip with
    ``decode_wav``."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def fake_decode_image(payload: bytes, width: int, height: int):
    """DETERMINISTIC FAKE decode: pseudo-pixels derived from the
    payload, NOT a real codec.

    The md5 digest of the payload is tiled across a (height, width, 3)
    uint8 array — so the "image" is a pure function of the bytes, two
    engines (or two runs) agree exactly, and everything downstream
    (array shapes, resize math, Arrow batch memory ∝ H×W×3) behaves
    like real decoded media. It is also the pseudo-pixel *generator*
    for the synthetic media assets: ``encode_png(fake_decode_image(t))``
    produces a real PNG whose decoded pixels are this array — which is
    what makes the real-codec queries oracle-checkable.
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
    (and same generator role) as ``fake_decode_image``.
    """
    import hashlib

    import numpy as np

    digest = hashlib.md5(payload).digest()
    n = (duration_ms * sample_rate) // 1000
    nbytes = n * 2
    reps = -(-nbytes // len(digest))
    return np.frombuffer((digest * reps)[:nbytes], dtype="<i2").copy()
