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

Corrupt structure raises ``ValueError`` (decode_payload contract).
Fragmented MP4 (fMP4: ``moov/mvex`` + ``moof``/``mdat`` pairs — the
DASH/HLS streaming layout) is supported for both mux (``encode_fmp4``)
and demux: ``decode_mp4`` walks every ``moof``'s ``traf`` (tfhd
defaults, tfdt base decode time, trun sample runs with
default-base-is-moof offsets) and yields the identical sample list a
progressive mux of the same frames produces.

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


def encode_fmp4(
    frames: list,
    frame_duration_ms: int,
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    frames_per_fragment: int = 4,
) -> bytes:
    """Mux frames as FRAGMENTED MP4: ``ftyp | moov(mvex/trex) |
    [moof mdat]…`` — the append-only layout live/streaming pipelines
    write (each fragment is self-describing, so a file is playable as
    it grows). Sample metadata lives in per-fragment ``trun`` boxes
    instead of moov's stbl; tfhd carries the fragment's default sample
    duration and ``default-base-is-moof`` addressing; tfdt carries the
    base decode time so fragments are seekable independently."""
    if not frames:
        raise ValueError("encode_fmp4 requires at least one frame")
    delta = frame_duration_ms * timescale // 1000
    n = len(frames)
    duration = n * delta

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, 0)  # duration unknown up front
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)
        + b"\x00" * 4
        + struct.pack(">I", 0)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"raw ",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    # fragmented: stbl tables are empty — samples live in trun boxes
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    # mvex/trex: declares the movie fragmented and the track defaults
    trex = _full(
        b"trex",
        0,
        0,
        struct.pack(">IIIII", 1, 1, delta, 0, 0),
    )
    mvex = _box(b"mvex", trex)
    moov = _box(b"moov", mvhd + trak + mvex)

    out = [FTYP, moov]
    base_time = 0
    seq = 1
    for frag_start in range(0, n, frames_per_fragment):
        chunk = frames[frag_start : frag_start + frames_per_fragment]
        payloads = [bytes(f) for f in chunk]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x020000) + default duration (0x8)
        tfhd = _full(
            b"tfhd", 0, 0x020008, struct.pack(">II", 1, delta)
        )
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", base_time))
        # trun: data-offset (0x1) + sample-size-present (0x200);
        # durations come from the tfhd default
        trun_payload = struct.pack(">I", len(payloads)) + struct.pack(
            ">i", 0
        ) + b"".join(struct.pack(">I", len(p)) for p in payloads)
        trun = _full(b"trun", 0, 0x000201, trun_payload)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof_wo_offset = _box(b"moof", mfhd + traf)
        # patch trun data_offset: mdat payload starts at
        # len(moof) + 8 bytes from moof start (default-base-is-moof)
        data_offset = len(moof_wo_offset) + 8
        trun = _full(
            b"trun",
            0,
            0x000201,
            struct.pack(">I", len(payloads))
            + struct.pack(">i", data_offset)
            + b"".join(struct.pack(">I", len(p)) for p in payloads),
        )
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        assert len(moof) == len(moof_wo_offset)
        mdat = _box(b"mdat", b"".join(payloads))
        out.append(moof)
        out.append(mdat)
        base_time += len(payloads) * delta
        seq += 1
    _ = duration
    return b"".join(out)


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
    fragmented = b"moof" in top
    if b"moov" not in top:
        raise ValueError("MP4 has no moov")
    moov_s, moov_e = top[b"moov"]

    timescale = duration = None
    width = height = 0
    video_track_id = None
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
            # track_ID follows version/flags + creation/modification
            # times (4+4 bytes at v0, 8+8 at v1)
            tid_off = tkhd[0] + (20 if ver == 1 else 12)
            (video_track_id,) = struct.unpack(">I", data[tid_off : tid_off + 4])
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
    if fragmented:
        return _decode_fragments(
            data, (moov_s, moov_e), timescale, width, height,
            video_track_id=video_track_id,
        )
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


def _decode_fragments(
    data: bytes,
    moov_span: tuple,
    timescale: int,
    width: int,
    height: int,
    video_track_id: int | None = None,
) -> Mp4Media:
    """Demux every ``moof``/``mdat`` fragment: tfhd defaults (falling
    back to mvex/trex movie defaults), tfdt base decode time, trun
    sample runs. Sample byte addressing honors base-data-offset when
    present and default-base-is-moof otherwise (also the spec default
    for our own muxer's output).

    Multi-track input (e.g. video+audio from an external muxer): only
    trafs whose tfhd track_ID matches the moov's video track are
    demuxed — interleaving every track's samples into one list would
    corrupt both timestamps and bytes. trex defaults are likewise
    selected per track."""
    trex_dur = trex_size = 0
    mvex = _find(data, *moov_span, b"mvex")
    if mvex is not None:
        for tt, ts_, te_ in _iter_boxes(data, *mvex):
            if tt != b"trex":
                continue
            _tid, _sdi, dur_, size_, _fl = struct.unpack(
                ">IIIII", data[ts_ + 4 : ts_ + 24]
            )
            if video_track_id is None or _tid == video_track_id:
                trex_dur, trex_size = dur_, size_
                break

    samples: list = []
    t_units = 0
    pos, end = 0, len(data)
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns container")
        if btype == b"moof":
            moof_start, moof_ps, moof_pe = pos, pos + hdr, pos + size
            for tt, ts_, te_ in _iter_boxes(data, moof_ps, moof_pe):
                if tt != b"traf":
                    continue
                tfhd = _find(data, ts_, te_, b"tfhd")
                if tfhd is None:
                    raise ValueError("MP4 traf missing tfhd")
                fl = struct.unpack(">I", data[tfhd[0] : tfhd[0] + 4])[0]
                tf_flags = fl & 0xFFFFFF
                (traf_tid,) = struct.unpack(
                    ">I", data[tfhd[0] + 4 : tfhd[0] + 8]
                )
                if video_track_id is not None and traf_tid != video_track_id:
                    continue  # another track's fragment (audio, ...)
                p = tfhd[0] + 8  # skip version/flags + track_id
                base_data_offset = None
                if tf_flags & 0x1:
                    (base_data_offset,) = struct.unpack(
                        ">Q", data[p : p + 8]
                    )
                    p += 8
                if tf_flags & 0x2:
                    p += 4  # sample_description_index
                def_dur = trex_dur
                if tf_flags & 0x8:
                    (def_dur,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                def_size = trex_size
                if tf_flags & 0x10:
                    (def_size,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                tfdt = _find(data, ts_, te_, b"tfdt")
                if tfdt is not None:
                    ver = data[tfdt[0]]
                    t_units = (
                        struct.unpack(">Q", data[tfdt[0] + 4 : tfdt[0] + 12])[0]
                        if ver == 1
                        else struct.unpack(
                            ">I", data[tfdt[0] + 4 : tfdt[0] + 8]
                        )[0]
                    )
                base = (
                    base_data_offset
                    if base_data_offset is not None
                    else moof_start
                )
                run_off = None
                for rt, rs, re_ in _iter_boxes(data, ts_, te_):
                    if rt != b"trun":
                        continue
                    rfl = struct.unpack(">I", data[rs : rs + 4])[0] & 0xFFFFFF
                    q = rs + 4
                    (cnt,) = struct.unpack(">I", data[q : q + 4])
                    q += 4
                    if rfl & 0x1:
                        (doff,) = struct.unpack(">i", data[q : q + 4])
                        q += 4
                        run_off = base + doff
                    elif run_off is None:
                        run_off = base
                    if rfl & 0x4:
                        q += 4  # first_sample_flags
                    for _ in range(cnt):
                        dur = def_dur
                        if rfl & 0x100:
                            (dur,) = struct.unpack(">I", data[q : q + 4])
                            q += 4
                        sz = def_size
                        if rfl & 0x200:
                            (sz,) = struct.unpack(">I", data[q : q + 4])
                            q += 4
                        if rfl & 0x400:
                            q += 4  # per-sample flags
                        if rfl & 0x800:
                            q += 4  # composition time offset
                        if sz == 0:
                            raise ValueError(
                                "fMP4 sample has no size (trun/tfhd/trex)"
                            )
                        if run_off + sz > len(data):
                            raise ValueError("fMP4 sample overruns file")
                        samples.append(
                            (
                                t_units * 1000 // timescale,
                                data[run_off : run_off + sz],
                            )
                        )
                        run_off += sz
                        t_units += dur
        pos += size
    if not samples:
        raise ValueError("fragmented MP4 has no trun samples")
    return Mp4Media(
        timescale=timescale,
        duration_ms=t_units * 1000 // timescale,
        width=width,
        height=height,
        samples=samples,
    )
