"""Real ISO-BMFF (MP4) container mux/demux in pure stdlib.

An MP4 file is a tree of length-prefixed boxes; the sample tables
inside ``moov/trak/mdia/minf/stbl`` (stts = decode timestamps,
stsc = samples-per-chunk runs, stsz = sample sizes, stco/co64 = chunk
file offsets) fully describe where every frame lives in ``mdat`` and
when it is presented. This module implements that container layer for
real — the part a frame-sampling training pipeline actually needs —
against the public ISO/IEC 14496-12 spec.

What is honestly NOT here: a video *bitstream* codec. The build
container has no libav/ffmpeg, so samples are opaque byte payloads and
the muxer writes a VisualSampleEntry whose coding name is ``raw ``.
``decode_mp4`` demuxes any single-video-track progressive MP4's sample
bytes + timestamps regardless of codec; *decoding* H.264/H.265 sample
bytes to pixels remains a documented ``NotImplementedError`` seam in
decode.decode_payload's callers.

Corrupt structure raises ``ValueError`` (decode_payload contract);
fragmented MP4 (``moof``) raises ``NotImplementedError``.

Reference intent: the multimodal north-star (BASELINE.json); the
reference repo ships no container code — original work.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

FTYP = b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2"


@dataclass
class Mp4Media:
    """Demuxed single-track media: presentation timestamps are in
    milliseconds, ``samples`` is ``[(ts_ms, frame_bytes), ...]`` in
    decode order."""

    timescale: int
    duration_ms: int
    width: int
    height: int
    samples: list  # list[tuple[int, bytes]]


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4(
    frames: list,
    frame_duration_ms: int,
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
) -> bytes:
    """Mux opaque frame payloads into a real, spec-shaped MP4:
    ``ftyp | mdat | moov`` with a single video track whose sample
    tables index every frame. moov is written after mdat so chunk
    offsets are known without a second pass — the standard
    non-faststart layout."""
    if not frames:
        raise ValueError("encode_mp4 requires at least one frame")
    delta = frame_duration_ms * timescale // 1000
    n = len(frames)
    duration = n * delta

    mdat_payload = b"".join(bytes(f) for f in frames)
    mdat = _box(b"mdat", mdat_payload)
    # first sample starts right after ftyp + mdat header
    data_offset = len(FTYP) + 8

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">II", 0, 0)  # creation/modification (epoch 1904: 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )  # unity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in-movie | in-preview
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry, coding name 'raw ' (uncompressed/opaque)
    sample_entry = _box(
        b"raw ",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1),  # depth, color table
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    sizes = [len(bytes(f)) for f in frames]
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, data_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return FTYP + mdat + moov


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 largesize header truncated")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns container")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("MP4 trailing garbage after last box")


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def decode_mp4(data: bytes) -> Mp4Media:
    """Demux a progressive single-video-track MP4: walk the box tree,
    read the stbl sample tables, and slice every sample's bytes out of
    mdat with its presentation timestamp. Corrupt structure raises
    ValueError only (quarantine contract)."""
    try:
        return _decode_mp4(data)
    except (struct.error, IndexError) as exc:
        # short slices / out-of-range reads from fuzzed box sizes —
        # map to the corrupt-data contract instead of leaking
        raise ValueError(f"MP4 structure corrupt: {exc}") from exc


def _decode_mp4(data: bytes) -> Mp4Media:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp")
    top = {t: (s, e) for t, s, e in _iter_boxes(data, 0, len(data))}
    if b"moof" in top:
        raise NotImplementedError("fragmented MP4 (moof) unsupported")
    if b"moov" not in top:
        raise ValueError("MP4 has no moov")
    moov_s, moov_e = top[b"moov"]

    timescale = duration = None
    width = height = 0
    tables: dict[bytes, bytes] = {}
    for t, s, e in _iter_boxes(data, moov_s, moov_e):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        # full-box payload: version/flags (4) + pre_defined (4) + handler_type
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(data, s, e, b"tkhd")
        if tkhd is not None:
            ver = data[tkhd[0]]
            # width/height are the last 8 bytes, 16.16 fixed point
            w_fx, h_fx = struct.unpack(">II", data[tkhd[1] - 8 : tkhd[1]])
            width, height = w_fx >> 16, h_fx >> 16
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("MP4 video trak missing mdhd")
        ver = data[mdhd[0]]
        if ver == 1:
            timescale, duration = struct.unpack(
                ">IQ", data[mdhd[0] + 20 : mdhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", data[mdhd[0] + 12 : mdhd[0] + 20]
            )
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 video trak missing stbl")
        for tt, ss, ee in _iter_boxes(data, *stbl):
            tables[tt] = data[ss:ee]
        break
    if timescale is None:
        raise ValueError("MP4 has no video track")
    for need in (b"stts", b"stsz", b"stsc"):
        if need not in tables:
            raise ValueError(f"MP4 stbl missing {need.decode()}")
    if b"stco" not in tables and b"co64" not in tables:
        raise ValueError("MP4 stbl missing stco/co64")

    def full(payload: bytes) -> bytes:
        return payload[4:]  # drop version+flags

    # stsz -> per-sample sizes
    p = full(tables[b"stsz"])
    fixed, n_samples = struct.unpack(">II", p[:8])
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if len(p) < 8 + 4 * n_samples:
            raise ValueError("MP4 stsz truncated")
        sizes = list(struct.unpack(f">{n_samples}I", p[8 : 8 + 4 * n_samples]))

    # stco/co64 -> chunk offsets
    if b"stco" in tables:
        p = full(tables[b"stco"])
        (nc,) = struct.unpack(">I", p[:4])
        chunk_offsets = list(struct.unpack(f">{nc}I", p[4 : 4 + 4 * nc]))
    else:
        p = full(tables[b"co64"])
        (nc,) = struct.unpack(">I", p[:4])
        chunk_offsets = list(struct.unpack(f">{nc}Q", p[4 : 4 + 8 * nc]))

    # stsc runs -> samples per chunk
    p = full(tables[b"stsc"])
    (nruns,) = struct.unpack(">I", p[:4])
    runs = [
        struct.unpack(">III", p[4 + 12 * i : 16 + 12 * i]) for i in range(nruns)
    ]
    spc = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < nruns else len(chunk_offsets)
        spc.extend([per] * (last - first + 1))

    # stts -> per-sample decode timestamps
    p = full(tables[b"stts"])
    (nent,) = struct.unpack(">I", p[:4])
    ts_units = []
    t = 0
    for i in range(nent):
        cnt, delta = struct.unpack(">II", p[4 + 8 * i : 12 + 8 * i])
        for _ in range(cnt):
            ts_units.append(t)
            t += delta
    if len(ts_units) < n_samples:
        raise ValueError("MP4 stts covers fewer samples than stsz")

    samples = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(data):
                raise ValueError("MP4 sample overruns file")
            samples.append((ts_units[si] * 1000 // timescale, data[off : off + size]))
            off += size
            si += 1
    if si != n_samples:
        raise ValueError("MP4 chunk map does not cover all samples")
    return Mp4Media(
        timescale=timescale,
        duration_ms=duration * 1000 // timescale,
        width=width,
        height=height,
        samples=samples,
    )
