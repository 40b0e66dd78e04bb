"""Exif (APP1) metadata writer/parser in pure stdlib.

Exif rides in a JPEG APP1 segment: ``Exif\\x00\\x00`` + a TIFF file
(byte-order mark, IFD0 of 12-byte tag entries, optional Exif sub-IFD).
Training-data pipelines mine these tags (orientation for rotation
fixes, capture time for dedup/temporal splits, camera model for source
attribution) — and scrub them for PII (GPS). This module implements
the container layer against the public Exif 2.3 / TIFF 6.0 specs:

- ``build_exif(fields)`` -> APP1 segment bytes (big-endian TIFF, IFD0)
- ``insert_exif(jpeg, fields)`` -> the JPEG with APP1 spliced after
  SOI (before any existing APPn), untouched entropy data
- ``parse_exif(jpeg)`` -> {tag_name: value} from IFD0 + Exif sub-IFD,
  both byte orders, ASCII/SHORT/LONG/RATIONAL types
- ``strip_exif(jpeg)`` -> the JPEG with every APP1 removed (the PII
  scrub; pixels untouched)

Reference intent: multimodal north-star metadata plumbing; the
reference repo ships no image handling — original work.
"""

from __future__ import annotations

import struct

# Tags mined / written (public Exif 2.3 tag ids)
TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x8769: "_exif_ifd",  # pointer to the Exif sub-IFD
    0x829A: "exposure_time",  # RATIONAL, lives in the sub-IFD
    0x8827: "iso",
}
_TAG_IDS = {v: k for k, v in TAGS.items()}

_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5
_TYPE_SIZES = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, _RATIONAL: 8}


def build_exif(fields: dict) -> bytes:
    """APP1 payload for ``fields`` (subset of: make, model,
    orientation, datetime, exposure_time=(num, den), iso). Big-endian
    TIFF with IFD0; exposure_time/iso go to an Exif sub-IFD exactly as
    cameras write them."""
    ifd0 = []
    sub = []
    for name in ("make", "model", "datetime"):
        if name in fields:
            ifd0.append((_TAG_IDS[name], _ASCII, str(fields[name])))
    if "orientation" in fields:
        ifd0.append((_TAG_IDS["orientation"], _SHORT, int(fields["orientation"])))
    if "exposure_time" in fields:
        num, den = fields["exposure_time"]
        sub.append((_TAG_IDS["exposure_time"], _RATIONAL, (int(num), int(den))))
    if "iso" in fields:
        sub.append((_TAG_IDS["iso"], _SHORT, int(fields["iso"])))

    def encode_ifd(entries: list, base: int) -> tuple[bytes, bytes]:
        """12-byte entries + overflow data area; ``base`` is the TIFF
        offset where the overflow area will land."""
        head = struct.pack(">H", len(entries))
        body = b""
        overflow = b""
        for tag, typ, val in sorted(entries):
            if typ == _ASCII:
                raw = str(val).encode("ascii") + b"\x00"
                cnt = len(raw)
            elif typ == _SHORT:
                raw = struct.pack(">H", val)
                cnt = 1
            elif typ == _LONG:
                raw = struct.pack(">I", val)
                cnt = 1
            elif typ == _RATIONAL:
                raw = struct.pack(">II", *val)
                cnt = 1
            size = cnt * _TYPE_SIZES[typ]
            if size <= 4:
                value_field = raw + b"\x00" * (4 - size)
            else:
                value_field = struct.pack(">I", base + len(overflow))
                overflow += raw
            body += struct.pack(">HHI", tag, typ, cnt) + value_field
        return head + body + struct.pack(">I", 0), overflow

    # layout: header(8) | IFD0 | IFD0 overflow | subIFD | sub overflow
    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_size = 2 + 12 * n0 + 4
    entries0 = list(ifd0)
    # two-pass: sizes are deterministic, so compute offsets first
    overflow0_size = sum(
        len(str(v).encode("ascii")) + 1
        for t, ty, v in ifd0
        if ty == _ASCII and len(str(v).encode("ascii")) + 1 > 4
    )
    sub_off = 8 + ifd0_size + overflow0_size
    if sub:
        entries0.append((_TAG_IDS["_exif_ifd"], _LONG, sub_off))
    ifd0_bytes, ovf0 = encode_ifd(entries0, 8 + ifd0_size)
    tiff = struct.pack(">2sHI", b"MM", 42, 8) + ifd0_bytes + ovf0
    if sub:
        sub_size = 2 + 12 * len(sub) + 4
        sub_bytes, ovf_s = encode_ifd(sub, sub_off + sub_size)
        tiff += sub_bytes + ovf_s
    return b"Exif\x00\x00" + tiff


def insert_exif(jpeg: bytes, fields: dict) -> bytes:
    """Splice an Exif APP1 right after SOI; entropy data untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    payload = build_exif(fields)
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def _segments(jpeg: bytes):
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        yield marker, pos, jpeg[pos + 4 : pos + 2 + length]
        if marker == 0xDA:
            return  # entropy data follows; headers are done
        pos += 2 + length


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1 segment (Exif/XMP) — the GPS/PII scrub."""
    out = bytearray(b"\xff\xd8")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        if 0xD0 <= marker <= 0xD9:
            out += jpeg[pos : pos + 2]
            pos += 2
            continue
        (length,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if marker != 0xE1:
            out += jpeg[pos : pos + 2 + length]
        pos += 2 + length
    return bytes(out)


def parse_exif(jpeg: bytes) -> dict:
    """Extract known tags from the first Exif APP1 (IFD0 + Exif
    sub-IFD). Returns {} when no Exif is present; raises ValueError on
    a corrupt TIFF structure."""
    try:
        return _parse_exif_checked(jpeg)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"Exif structure corrupt: {exc}") from exc


def _parse_exif_checked(jpeg: bytes) -> dict:
    app1 = None
    for marker, _pos, payload in _segments(jpeg):
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            app1 = payload[6:]
            break
    if app1 is None:
        return {}
    if len(app1) < 8:
        raise ValueError("Exif TIFF header truncated")
    order = app1[:2]
    if order == b"MM":
        e = ">"
    elif order == b"II":
        e = "<"
    else:
        raise ValueError("Exif: bad TIFF byte order")
    (magic,) = struct.unpack(e + "H", app1[2:4])
    if magic != 42:
        raise ValueError("Exif: bad TIFF magic")
    (ifd_off,) = struct.unpack(e + "I", app1[4:8])

    out: dict = {}
    seen_ifds: set[int] = set()

    def read_ifd(off: int) -> None:
        # cycle guard: a fuzzed sub-IFD pointer aimed back at a parent
        # IFD would otherwise recurse forever
        if off in seen_ifds:
            raise ValueError("Exif IFD pointer cycle")
        seen_ifds.add(off)
        if off + 2 > len(app1):
            raise ValueError("Exif IFD offset out of range")
        (cnt,) = struct.unpack(e + "H", app1[off : off + 2])
        for i in range(cnt):
            ent = app1[off + 2 + 12 * i : off + 14 + 12 * i]
            if len(ent) != 12:
                raise ValueError("Exif IFD entry truncated")
            tag, typ, n_vals = struct.unpack(e + "HHI", ent[:8])
            name = TAGS.get(tag)
            size = _TYPE_SIZES.get(typ, 0) * n_vals
            if size == 0:
                continue
            if size <= 4:
                raw = ent[8 : 8 + size]
            else:
                (voff,) = struct.unpack(e + "I", ent[8:12])
                raw = app1[voff : voff + size]
                if len(raw) != size:
                    raise ValueError("Exif value overruns segment")
            if tag == _TAG_IDS["_exif_ifd"]:
                (sub_off,) = struct.unpack(e + "I", raw[:4])
                read_ifd(sub_off)
                continue
            if name is None:
                continue
            if typ == _ASCII:
                out[name] = raw.rstrip(b"\x00").decode("ascii", "replace")
            elif typ == _SHORT:
                out[name] = struct.unpack(e + "H", raw[:2])[0]
            elif typ == _LONG:
                out[name] = struct.unpack(e + "I", raw[:4])[0]
            elif typ == _RATIONAL:
                num, den = struct.unpack(e + "II", raw[:8])
                out[name] = (num, den)

    read_ifd(ifd_off)
    return out
