"""Real baseline JPEG codec in pure numpy + stdlib.

The build container has no PIL/libjpeg, but baseline sequential JFIF
needs nothing beyond numpy: the full marker structure (SOI, APP0, DQT,
SOF0, DHT, SOS, EOI), zigzag ordering, quality-scaled Annex-K
quantization tables, the standard Annex-K Huffman tables, DC
differential + AC run-length entropy coding with byte stuffing, and an
orthonormal matrix DCT/IDCT. This closes the "JPEG remains a
NotImplementedError seam" gap from earlier rounds for the encode and
decode directions actually exercised by the engine.

Scope (documented, honest):

- **Encoder**: 8-bit RGB or grayscale, baseline DCT (4:4:4 or 4:2:0)
  with standard Huffman tables, selectable quality; AND progressive
  (SOF2, ``encode_jpeg_progressive``) with the classic 10-scan
  spectral-selection + successive-approximation script (4:4:4,
  standard tables — EOB runs therefore cap at 1, the only EOBn symbol
  baseline tables carry).
- **Decoder**: baseline sequential (SOF0) — 1- or 3-component, any
  sampling factors declared in SOF0 (4:4:4, 4:2:0, 4:2:2 — chroma is
  nearest-neighbor upsampled), restart markers (DRI/RSTn), custom DQT
  and DHT tables — and progressive (SOF2): multi-scan coefficient
  accumulation across DC first/refinement and banded AC
  first/refinement scans with general EOBn runs (T.81 Annex G).
  Restart markers (DRI/RSTn) are honored in progressive scans too
  (predictors and EOB runs reset per interval). 12-bit extended
  sequential (SOF1, grayscale) is supported end-to-end:
  ``encode_jpeg12``/``decode_jpeg12`` carry full 0..4095 precision
  (16-bit pq=1 DQT, self-describing 12-bit Huffman tables), and plain
  ``decode_jpeg`` downshifts a 12-bit frame to its uint8 contract.
  Arithmetic coding, 12-bit color, and hierarchical modes raise
  ``NotImplementedError``; corrupt data raises ``ValueError``
  per the decode_payload contract. Progressive and baseline encodes of
  the same image decode BIT-IDENTICALLY (property-tested) — the scan
  structure changes, the coefficients do not.

JPEG is lossy in general, but two exactness properties make it
oracle-checkable end-to-end (see plans/multimodal.py):

- a constant-color block has DC = 8·(v−128) and all-zero AC; at
  quality 75 the luma DC quantizer is exactly 8, so constant-color
  images round-trip BIT-EXACTLY through the full huffman → zigzag →
  quant → IDCT chain, and DuckDB can restate the decoded mean;
- width/height always round-trip exactly (SOF0 header).

Reference intent: the multimodal north-star (BASELINE.json); the
reference repo itself (Giorgio-Abboud/SparkTrends) ships no codec code
— this is original work against the public JPEG (ITU T.81) spec.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIGNATURE = b"\xff\xd8\xff"

# ---------------------------------------------------------------------------
# Tables (ITU T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance base quantization tables (natural order)
BASE_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

BASE_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zigzag scan order: ZIGZAG[k] = flat index (row*8+col) of the k-th
# coefficient in scan order
def _build_zigzag() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _build_zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: F = C @ A @ C.T, A = C.T @ F @ C
def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


DCT_M = _dct_matrix()


def quality_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables (public formula):
    S = 5000/q (q<50) else 200−2q; T = clamp(floor((base·S+50)/100), 1, 255).
    At quality 75 the luma DC quantizer is exactly 8 — the constant that
    makes constant-color blocks round-trip losslessly."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    def scale(base: np.ndarray) -> np.ndarray:
        return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)
    return scale(BASE_QT_LUMA), scale(BASE_QT_CHROMA)


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 C.2)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, code_length) per the canonical T.81 procedure."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> value, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a coefficient."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits_val: int, size: int) -> int:
    """Inverse of _magnitude: sign-extend `size` appended bits."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-coded segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("JPEG entropy data truncated at FF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise ValueError("unexpected restart marker inside block")
            else:
                self.marker = nxt
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            val = table.get((length, code))
            if val is not None:
                return val
        raise ValueError("invalid JPEG Huffman code")

    def align_restart(self) -> int:
        """Drop partial byte, expect and consume an RSTn marker; return n."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = d[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"expected RSTn, found FF{m:02X}")
        self.pos += 2
        return m - 0xD0


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601. Float output, not yet rounded."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _encode_component(
    plane: np.ndarray,
    qt: np.ndarray,
) -> np.ndarray:
    """plane (H8, W8) float, level-shifted -> quantized coefficient
    blocks (n_blocks_y, n_blocks_x, 8, 8) int, vectorized DCT."""
    h8, w8 = plane.shape
    by, bx = h8 // 8, w8 // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,byjk,lk->byil", DCT_M, blocks, DCT_M)
    # round-half-up quantization: deterministic and SQL-restatable
    return np.floor(coeffs / qt + 0.5).astype(np.int64)


def _write_block(bw, zz, prev_dc, dc_codes, ac_codes):
    """Entropy-code one zigzagged quantized block; returns new DC pred."""
    diff = int(zz[0]) - prev_dc
    size, extra = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(extra, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, extra = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(extra, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray, quality: int = 75, subsampling: str = "444"
) -> bytes:
    """Baseline JFIF encode: 8-bit RGB (H, W, 3) or grayscale (H, W),
    standard Huffman tables. ``subsampling="444"`` keeps chroma at
    full resolution (one block per component per MCU);
    ``subsampling="420"`` mean-pools chroma 2x2 and interleaves
    4 Y + 1 Cb + 1 Cr blocks per 16x16 MCU — the layout virtually
    every camera JPEG uses. Lossy in general; see module docstring
    for the exact-round-trip special cases (they hold under both
    subsampling modes, since constant chroma pools to itself)."""
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W, 3) RGB or (H, W) gray")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    qt_l, qt_c = quality_tables(quality)

    sub420 = subsampling == "420" and not gray
    # pad by edge replication to the MCU grid (16 for 4:2:0, else 8)
    mcu = 16 if sub420 else 8
    ph, pw = -h % mcu, -w % mcu
    if gray:
        ycc = arr.astype(np.float64)[:, :, None]
    else:
        ycc = rgb_to_ycbcr(arr)
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge") - 128.0

    ncomp = 1 if gray else 3
    if sub420:
        hh2, ww2 = ycc.shape[0] // 2, ycc.shape[1] // 2
        chroma = [
            ycc[:, :, c].reshape(hh2, 2, ww2, 2).mean(axis=(1, 3))
            for c in (1, 2)
        ]
        comps = [ycc[:, :, 0], chroma[0], chroma[1]]
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        comps = [ycc[:, :, c] for c in range(ncomp)]
        sampling = [(1, 1)] * ncomp
    qts = [qt_l] + [qt_c] * (ncomp - 1)
    planes = [_encode_component(comps[c], qts[c]) for c in range(ncomp)]

    dc_codes = [_build_codes(*STD_DC_LUMA)] + [_build_codes(*STD_DC_CHROMA)] * (
        ncomp - 1
    )
    ac_codes = [_build_codes(*STD_AC_LUMA)] + [_build_codes(*STD_AC_CHROMA)] * (
        ncomp - 1
    )

    bw = _BitWriter()
    prev_dc = [0] * ncomp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcuy = planes[0].shape[0] // sampling[0][1]
    mcux = planes[0].shape[1] // sampling[0][0]
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(ncomp):
                hs, vs = sampling[c]
                for v in range(vs):
                    for hb in range(hs):
                        block = planes[c][my * vs + v, mx * hs + hb]
                        zz = block.reshape(64)[ZIGZAG]
                        prev_dc[c] = _write_block(
                            bw, zz, prev_dc[c], dc_codes[c], ac_codes[c]
                        )
    bw.flush()

    # --- marker stream -----------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += seg(
            0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        *((((0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA))) if ncomp == 3 else ()),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for c in range(ncomp):
        tid = 0 if c == 0 else 1
        sos += bytes([c + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# 12-bit (extended sequential, SOF1) encoder — grayscale
# ---------------------------------------------------------------------------

# 12-bit magnitudes exceed the Annex-K tables (DC sizes reach 15, AC
# sizes 14), so the encoder ships its OWN canonical tables in DHT:
# flat-length codes — 16 five-bit DC size codes and 226 eight-bit AC
# RS codes (EOB, ZRL, runs 0-15 x sizes 1-14). Suboptimal compression,
# trivially valid (no all-ones code), and self-describing: any T.81
# decoder (including ours) reads them from the stream.
DC12_TABLE = (
    [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
AC12_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | sz for r in range(16) for sz in range(1, 15)],
)


def encode_jpeg12(pixels: np.ndarray, quality: int = 75) -> bytes:
    """Extended-sequential (SOF1) 12-bit GRAYSCALE encode: input is
    (H, W) uint16 with values 0..4095; level shift 2048; quantizers =
    the Annex-K luma table under the same IJG quality scaling,
    multiplied by 16 to match the 16x larger coefficient range (stored
    as a 16-bit pq=1 DQT); custom flat Huffman tables sized for 12-bit
    magnitudes ride in DHT. Round-trips through ``decode_jpeg12`` with
    quantization error only; constant images whose (v - 2048) is a
    multiple of 16 round-trip EXACTLY at quality 75 (DC quantizer
    8*16=128 divides 8*(v-2048))."""
    arr = np.asarray(pixels)
    if arr.ndim != 2 or arr.dtype != np.uint16:
        raise ValueError("encode_jpeg12 expects (H, W) uint16 grayscale")
    if int(arr.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    qt = quality_tables(quality)[0] * 16
    ph, pw = -h % 8, -w % 8
    plane = np.pad(
        arr.astype(np.float64), ((0, ph), (0, pw)), mode="edge"
    ) - 2048.0
    blocks = _encode_component(plane, qt)

    dc_codes = _build_codes(*DC12_TABLE)
    ac_codes = _build_codes(*AC12_TABLE)
    bw = _BitWriter()
    prev = 0
    by, bx = blocks.shape[:2]
    for yb in range(by):
        for xb in range(bx):
            zz = blocks[yb, xb].reshape(64)[ZIGZAG]
            prev = _write_block(bw, zz, prev, dc_codes, ac_codes)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    # pq=1: 16-bit quantizer entries
    out += seg(
        0xDB,
        bytes([0x10])
        + b"".join(
            struct.pack(">H", int(v)) for v in qt.reshape(64)[ZIGZAG]
        ),
    )
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    for cls, tid, (bits, vals) in ((0, 0, DC12_TABLE), (1, 0, AC12_TABLE)):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — spectral selection + successive
# approximation, the libjpeg-style scan script. Public spec: ITU T.81
# Annex G.
# ---------------------------------------------------------------------------


def _prog_scan_script(ncomp: int) -> list:
    """(comps, Ss, Se, Ah, Al) per scan — the classic 10-scan libjpeg
    script for color (3-scan DC+AC for grayscale): coarse DC first,
    low-frequency luma band, full chroma at half precision, the rest
    of luma, then one refinement pass per band."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncate toward zero), NOT
    an arithmetic shift — T.81 G.1.2.2."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgACWriter:
    """AC band writer for one progressive scan of one component:
    EOB-run accumulation (first scans) and correction-bit buffering
    (refinement scans), flushed through the shared ``_BitWriter``."""

    def __init__(self, bw: _BitWriter, ac_codes: dict):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def _emit_eobrun(self) -> None:
        if self.eobrun == 0:
            return
        r = self.eobrun.bit_length() - 1
        code, length = self.ac[r << 4]
        self.bw.write(code, length)
        if r:
            self.bw.write(self.eobrun - (1 << r), r)
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []
        self.eobrun = 0

    def _count_eob(self) -> None:
        self.eobrun += 1
        # The standard Annex-K AC tables carry no EOBn symbols beyond
        # EOB0 (0x00) — they are baseline tables — so runs are emitted
        # immediately rather than accumulated (spec-valid: an EOB run
        # of length 1). The DECODER still handles general EOBn runs
        # from encoders that ship custom tables.
        self._emit_eobrun()

    def first_scan_block(self, zz, ss: int, se: int, al: int) -> None:
        vals = [_pt(int(zz[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v != 0]
        if not nz:
            self._count_eob()
            return
        self._emit_eobrun()
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = self.ac[0xF0]  # ZRL
                self.bw.write(code, length)
                run -= 16
            size, extra = _magnitude(v)
            code, length = self.ac[(run << 4) | size]
            self.bw.write(code, length)
            self.bw.write(extra, size)
            run = 0
        if last < se - ss:
            self._count_eob()

    def refine_block(self, zz, ss: int, se: int, al: int) -> None:
        """Ah = Al + 1 refinement (T.81 G.1.2.3 / libjpeg's
        encode_mcu_AC_refine walk): newly-significant coefficients code
        as (run-over-zero-history, size=1) + sign; correction bits of
        already-significant coefficients buffer and flush after the
        NEXT emitted symbol — including intermediate ZRLs — so the
        decoder consumes them in positional order as it walks. Runs
        past the last newly-significant coefficient fold into the EOB
        run, their trailing correction bits pending on it."""
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [_pt(abs(v), al) for v in vals]
        newly = [i for i, a in enumerate(absv) if a == 1]
        if not newly:
            # no new significance: the whole band folds into the EOB
            # run; history corrections ride on its eventual emission
            self.eobrun += 1
            self.pending_bits.extend(
                (abs(v) >> al) & 1
                for v, a in zip(vals, absv)
                if a > 1
            )
            self._emit_eobrun()  # standard tables: EOB0 only
            return
        last_new = newly[-1]
        self._emit_eobrun()
        run = 0
        be: list[int] = []
        for i in range(last_new + 1):
            a, v = absv[i], vals[i]
            if a == 0:
                run += 1
                continue
            while run > 15:  # ZRL covers the next 16 zero-history slots
                code, length = self.ac[0xF0]
                self.bw.write(code, length)
                for b in be:
                    self.bw.write(b, 1)
                be = []
                run -= 16
            if a > 1:  # already significant: buffer its correction bit
                be.append((abs(v) >> al) & 1)
                continue
            code, length = self.ac[(run << 4) | 1]
            self.bw.write(code, length)
            self.bw.write(1 if v > 0 else 0, 1)
            for b in be:
                self.bw.write(b, 1)
            be = []
            run = 0
        # be is always flushed by the final newly-significant symbol
        if last_new < len(vals) - 1:
            self.eobrun += 1
            self.pending_bits.extend(
                (abs(vals[i]) >> al) & 1
                for i in range(last_new + 1, len(vals))
                if absv[i] > 1
            )
            self._emit_eobrun()  # standard tables: EOB0 only

    def finish(self) -> None:
        self._emit_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 75, restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) JFIF encode with the classic multi-scan
    script: coarse DC, banded AC at reduced precision, then successive-
    approximation refinement scans — the layout web encoders emit so an
    image sharpens as it loads. Coefficients, tables and quantization
    are identical to ``encode_jpeg`` (4:4:4); only the entropy-coded
    scan structure differs, so ``decode_jpeg`` reconstructs the exact
    same pixels for both (asserted in tests)."""
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8 pixels")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expects (H, W, 3) RGB or (H, W) gray")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("image dimensions out of JPEG range")
    qt_l, qt_c = quality_tables(quality)
    ph, pw = -h % 8, -w % 8
    ycc = (
        arr.astype(np.float64)[:, :, None]
        if gray
        else rgb_to_ycbcr(arr)
    )
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge") - 128.0
    ncomp = 1 if gray else 3
    qts = [qt_l] + [qt_c] * (ncomp - 1)
    planes = [
        _encode_component(ycc[:, :, c], qts[c]) for c in range(ncomp)
    ]
    by, bx = planes[0].shape[:2]
    zzs = [
        planes[c].reshape(by, bx, 64)[:, :, ZIGZAG]
        for c in range(ncomp)
    ]

    dc_codes = [_build_codes(*STD_DC_LUMA)] + [
        _build_codes(*STD_DC_CHROMA)
    ] * (ncomp - 1)
    ac_codes = [_build_codes(*STD_AC_LUMA)] + [
        _build_codes(*STD_AC_CHROMA)
    ] * (ncomp - 1)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += seg(
            0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        *((((0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA))) if ncomp == 3 else ()),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    for comps, ss, se, ah, al in _prog_scan_script(ncomp):
        sos = bytes([len(comps)])
        for c in comps:
            tid = 0 if c == 0 else 1
            sos += bytes([c + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        rst = [0]  # next RSTn index

        def emit_restart() -> None:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst[0] % 8])
            rst[0] += 1

        if ss == 0:  # DC scan, interleaved over blocks (4:4:4 MCU = block)
            if ah == 0:
                prev = {c: 0 for c in comps}
                i = 0
                for yb in range(by):
                    for xb in range(bx):
                        if restart_interval and i and i % restart_interval == 0:
                            emit_restart()
                            prev = {c: 0 for c in comps}
                        i += 1
                        for c in comps:
                            v = int(zzs[c][yb, xb, 0]) >> al
                            diff = v - prev[c]
                            prev[c] = v
                            size, extra = _magnitude(diff)
                            code, length = dc_codes[c][size]
                            bw.write(code, length)
                            if size:
                                bw.write(extra, size)
            else:  # DC refinement: one raw bit per block per comp
                i = 0
                for yb in range(by):
                    for xb in range(bx):
                        if restart_interval and i and i % restart_interval == 0:
                            emit_restart()
                        i += 1
                        for c in comps:
                            bw.write((int(zzs[c][yb, xb, 0]) >> al) & 1, 1)
        else:  # AC scan: single component, raster block order
            (c,) = comps
            wtr = _ProgACWriter(bw, ac_codes[c])
            i = 0
            for yb in range(by):
                for xb in range(bx):
                    if restart_interval and i and i % restart_interval == 0:
                        wtr.finish()  # EOB runs may not cross a restart
                        emit_restart()
                    i += 1
                    zz = zzs[c][yb, xb]
                    if ah == 0:
                        wtr.first_scan_block(zz, ss, se, al)
                    else:
                        wtr.refine_block(zz, ss, se, al)
            wtr.finish()
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG decode -> (H, W, 3) uint8 RGB (grayscale replicated to 3
    channels). Baseline sequential (SOF0): arbitrary sampling factors
    (nearest-neighbor chroma upsampling), restart markers, custom
    DQT/DHT. Progressive (SOF2): multi-scan coefficient accumulation —
    DC first/refine, banded AC first/refine, EOBn runs. Arithmetic /
    12-bit / hierarchical raise NotImplementedError; corrupt data
    raises ValueError — including structurally fuzzed streams whose
    truncated segments would otherwise surface IndexError/struct.error
    from slice parsing (converted at this boundary; the quarantine
    contract promises exactly ValueError for bad bytes)."""
    try:
        return _decode_jpeg_checked(data)
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        # fuzzed streams can declare a 255-bit DC size (int64 overflow
        # in the block buffer), reference components/tables absent
        # from the frame (KeyError), or truncate any length-prefixed
        # structure (IndexError/struct.error)
        raise ValueError(f"JPEG structure corrupt: {exc}") from exc


def decode_jpeg12(data: bytes) -> np.ndarray:
    """Full-precision decode of a 12-bit (extended sequential SOF0/1)
    grayscale JPEG -> (H, W) uint16 with values 0..4095. Raises
    ValueError for 8-bit input (use ``decode_jpeg``) and keeps the
    corrupt-data contract."""
    try:
        return _decode_jpeg_checked(data, want_12bit=True)
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(f"JPEG structure corrupt: {exc}") from exc


def _decode_jpeg_checked(data: bytes, want_12bit: bool = False) -> np.ndarray:
    if data[:3] != JPEG_SIGNATURE or data[3] < 0xC0:
        raise ValueError("not a JPEG: bad signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hsamp, vsamp, qid)]
    restart_interval = 0
    progressive = False
    frame_precision = 8
    coefs = geom = None  # progressive coefficient buffers
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG segment truncated")
        pos += 2 + length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:  # 8-bit entries
                    zz = np.frombuffer(
                        payload[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    step = 64
                elif pq == 1:  # 16-bit entries (12-bit precision frames)
                    zz = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    step = 128
                else:
                    raise ValueError(f"DQT precision {pq} invalid")
                if len(zz) != 64:
                    raise ValueError("DQT truncated")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += step
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("DHT truncated")
                htables[(tc, th)] = _build_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 sequential
            precision = payload[0]
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"sample precision {precision} unsupported"
                )
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid = payload[6 + 3 * c]
                hv = payload[7 + 3 * c]
                qid = payload[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (h, w, comps)
            frame_precision = precision
        elif marker == 0xC2:  # SOF2: progressive DCT
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid = payload[6 + 3 * c]
                hv = payload[7 + 3 * c]
                qid = payload[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (h, w, comps)
            progressive = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/hierarchical/lossless) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            scan_tables = {}
            scan_cids = []
            for c in range(ns):
                cid = payload[1 + 2 * c]
                td, ta = payload[2 + 2 * c] >> 4, payload[2 + 2 * c] & 0x0F
                scan_tables[cid] = (td, ta)
                scan_cids.append(cid)
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan_tables, qtables, htables,
                    restart_interval, frame_precision, want_12bit,
                )
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if coefs is None:
                coefs, geom = _prog_alloc(frame)
            pos = _decode_progressive_scan(
                data, pos, frame, scan_cids, scan_tables, ss, se, ah, al,
                coefs, geom, htables, restart_interval,
            )
        # APPn / COM / others: skipped
    if progressive and coefs is not None:
        if want_12bit:
            raise ValueError("decode_jpeg12 requires a 12-bit frame")
        return _prog_reconstruct(frame, coefs, geom, qtables)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan_tables: dict,
    qtables: dict,
    htables: dict,
    restart_interval: int,
    precision: int = 8,
    want_12bit: bool = False,
) -> np.ndarray:
    if want_12bit and precision != 12:
        raise ValueError("decode_jpeg12 requires a 12-bit frame")
    level = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _q in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)

    br = _BitReader(data, pos)
    prev_dc = {cid: 0 for cid, *_ in comps}
    n_mcu = mcux * mcuy
    idct_t = DCT_M.T
    try:
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                br.align_restart()
                prev_dc = {cid: 0 for cid, *_ in comps}
            my, mx = divmod(m, mcux)
            for cid, hs, vs, qid in comps:
                td, ta = scan_tables[cid]
                dc_t = htables.get((0, td))
                ac_t = htables.get((1, ta))
                qt = qtables.get(qid)
                if dc_t is None or ac_t is None or qt is None:
                    raise ValueError("JPEG scan references missing table")
                for v in range(vs):
                    for hh in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.decode_huff(dc_t)
                        diff = _extend(br.read_bits(size), size)
                        prev_dc[cid] += diff
                        zz[0] = prev_dc[cid]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[ZIGZAG] = zz
                        block = (nat.reshape(8, 8) * qt).astype(np.float64)
                        px = idct_t @ block @ DCT_M + level
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
    except ValueError as exc:
        raise ValueError(f"JPEG entropy decode failed: {exc}") from exc

    # upsample + crop + color convert
    chans = []
    for cid, hs, vs, _q in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        if precision == 12:
            y12 = np.clip(np.round(chans[0]), 0, maxval).astype(np.uint16)
            if want_12bit:
                return y12
            y = (y12 >> 4).astype(np.uint8)  # uint8 contract: top 8 bits
        else:
            y = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if precision != 8:
        raise NotImplementedError("12-bit color JPEG unsupported (grayscale only)")
    if len(chans) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    return ycbcr_to_rgb(np.stack(chans, axis=-1))


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoder internals
# ---------------------------------------------------------------------------


def _prog_alloc(frame: tuple):
    """Zigzag-order coefficient buffers per component, sized to the
    MCU-padded block grid (interleaved DC scans cover padding blocks;
    non-interleaved AC scans cover only the component's own grid)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs, geom = {}, {}
    for cid, hs, vs, qid in comps:
        by_pad, bx_pad = mcuy * vs, mcux * hs
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        geom[cid] = {
            "by_pad": by_pad,
            "bx_pad": bx_pad,
            "bh": -(-ch // 8),
            "bw": -(-cw // 8),
            "hs": hs,
            "vs": vs,
            "qid": qid,
        }
        coefs[cid] = np.zeros((by_pad, bx_pad, 64), dtype=np.int64)
    return coefs, geom


def _next_marker(data: bytes, pos: int) -> int:
    """First non-stuffing marker at/after ``pos`` (entropy data may end
    mid-byte; stuffed FF00 bytes are entropy content, not markers)."""
    n = len(data)
    p = pos
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    raise ValueError("JPEG entropy data ran past end of file")


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan_cids: list,
    scan_tables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs: dict,
    geom: dict,
    htables: dict,
    restart_interval: int = 0,
) -> int:
    """Decode one progressive scan into the coefficient buffers;
    returns the file position of the next marker. ``restart_interval``
    (DRI) is honored: at each boundary the reader aligns to the RSTn
    marker and DC predictors / EOB runs reset — restart intervals are
    counted in MCUs for interleaved DC scans and in blocks for
    non-interleaved scans, and an EOB run may not cross a boundary."""
    h, w, comps = frame
    known = {c[0] for c in comps}
    if any(cid not in known for cid in scan_cids):
        raise ValueError("progressive scan references unknown component")
    br = _BitReader(data, pos)
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            _prog_dc_scan(br, frame, scan_cids, scan_tables, ah, al,
                          coefs, geom, htables, restart_interval)
        else:
            if len(scan_cids) != 1:
                raise ValueError("progressive AC scan must be 1-component")
            cid = scan_cids[0]
            _td, ta = scan_tables[cid]
            ac_t = htables.get((1, ta))
            if ac_t is None:
                raise ValueError("JPEG scan references missing AC table")
            g = geom[cid]
            blocks = coefs[cid]
            if ah == 0:
                _prog_ac_first(br, blocks, g, ac_t, ss, se, al,
                               restart_interval)
            else:
                _prog_ac_refine(br, blocks, g, ac_t, ss, se, al,
                                restart_interval)
    except ValueError as exc:
        raise ValueError(f"JPEG progressive scan failed: {exc}") from exc
    return _next_marker(data, br.pos)


def _prog_dc_scan(br, frame, scan_cids, scan_tables, ah, al, coefs, geom,
                  htables, restart_interval=0):
    h, w, comps = frame
    by_cid = {c[0]: c for c in comps}
    if len(scan_cids) > 1:  # interleaved MCU walk
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        prev = {cid: 0 for cid in scan_cids}
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                br.align_restart()
                prev = {cid: 0 for cid in scan_cids}
            my, mx = divmod(m, mcux)
            for cid in scan_cids:
                _c, hs, vs, _q = by_cid[cid]
                for v in range(vs):
                    for hh in range(hs):
                        _prog_dc_block(
                            br, coefs[cid][my * vs + v, mx * hs + hh],
                            cid, scan_tables, htables, ah, al, prev,
                        )
    else:
        cid = scan_cids[0]
        g = geom[cid]
        prev = {cid: 0}
        i = 0
        for yb in range(g["bh"]):
            for xb in range(g["bw"]):
                if restart_interval and i and i % restart_interval == 0:
                    br.align_restart()
                    prev = {cid: 0}
                i += 1
                _prog_dc_block(
                    br, coefs[cid][yb, xb], cid, scan_tables, htables,
                    ah, al, prev,
                )


def _prog_dc_block(br, zz, cid, scan_tables, htables, ah, al, prev):
    if ah == 0:
        td, _ta = scan_tables[cid]
        dc_t = htables.get((0, td))
        if dc_t is None:
            raise ValueError("JPEG scan references missing DC table")
        size = br.decode_huff(dc_t)
        diff = _extend(br.read_bits(size), size)
        prev[cid] += diff
        zz[0] = prev[cid] << al
    else:
        if br.read_bit():
            zz[0] |= 1 << al  # two's-complement OR appends the bit


def _prog_ac_first(br, blocks, g, ac_t, ss, se, al, restart_interval=0):
    eobrun = 0
    i = 0
    for yb in range(g["bh"]):
        for xb in range(g["bw"]):
            if restart_interval and i and i % restart_interval == 0:
                br.align_restart()
                eobrun = 0  # EOB runs may not cross a restart
            i += 1
            zz = blocks[yb, xb]
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.decode_huff(ac_t)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += br.read_bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("AC run overflows band")
                zz[k] = _extend(br.read_bits(size), size) << al
                k += 1


def _prog_ac_refine(br, blocks, g, ac_t, ss, se, al, restart_interval=0):
    p1 = 1 << al

    def correct(zz, k):
        if br.read_bit() and not (abs(int(zz[k])) & p1):
            zz[k] += p1 if zz[k] > 0 else -p1

    eobrun = 0
    i = 0
    for yb in range(g["bh"]):
        for xb in range(g["bw"]):
            if restart_interval and i and i % restart_interval == 0:
                br.align_restart()
                eobrun = 0
            i += 1
            zz = blocks[yb, xb]
            if eobrun > 0:
                for k in range(ss, se + 1):
                    if zz[k] != 0:
                        correct(zz, k)
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.decode_huff(ac_t)
                run, size = rs >> 4, rs & 0x0F
                if size == 0 and run < 15:  # EOBn
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += br.read_bits(run)
                    break
                if size == 0:  # ZRL: pass 16 zero-history positions
                    cnt = 16
                    while cnt > 0:
                        if k > se:
                            raise ValueError("ZRL overflows band")
                        if zz[k] != 0:
                            correct(zz, k)
                        else:
                            cnt -= 1
                        k += 1
                    continue
                if size != 1:
                    raise ValueError("refinement scan with size > 1")
                newval = p1 if br.read_bit() else -p1
                cnt = run
                while True:
                    if k > se:
                        raise ValueError("refinement run overflows band")
                    if zz[k] != 0:
                        correct(zz, k)
                    else:
                        if cnt == 0:
                            break
                        cnt -= 1
                    k += 1
                zz[k] = newval
                k += 1
            # finish the block: corrections for remaining history
            for kk in range(k, se + 1):
                if zz[kk] != 0:
                    correct(zz, kk)


def _prog_reconstruct(frame, coefs, geom, qtables) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    idct_t = DCT_M.T
    chans = []
    for cid, hs, vs, qid in comps:
        qt = qtables.get(qid)
        if qt is None:
            raise ValueError("JPEG frame references missing quant table")
        g = geom[cid]
        by_pad, bx_pad = g["by_pad"], g["bx_pad"]
        plane = np.zeros((by_pad * 8, bx_pad * 8), dtype=np.float64)
        zz = coefs[cid]
        nat = np.zeros((by_pad, bx_pad, 64), dtype=np.int64)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(by_pad, bx_pad, 8, 8) * qt
        px = (
            np.einsum("ij,byjk,kl->byil", idct_t, blocks.astype(np.float64), DCT_M)
            + 128.0
        )
        plane = (
            px.transpose(0, 2, 1, 3).reshape(by_pad * 8, bx_pad * 8)
        )
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        chans.append(plane[:h, :w])
    # progressive frames are 8-bit only (SOF2 branch enforces it)
    if len(chans) == 1:
        y = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(chans) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    return ycbcr_to_rgb(np.stack(chans, axis=-1))
