"""Unit tests for the round-6 real codecs: baseline JPEG (pure numpy)
and the ISO-BMFF (MP4) container mux/demux.

The graded queries (asset_jpeg_stats, asset_mp4_frames) pin the
oracle-checkable constant-color / digest-sample paths; these tests
cover the general codec behavior the oracle can't: lossy round-trip
quality, subsampled decode, restart markers, corrupt-input contracts.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparktrends_spark.multimodal.jpeg import (
    STD_AC_LUMA,
    STD_DC_LUMA,
    ZIGZAG,
    _BitWriter,
    _build_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)
from sparktrends_spark.multimodal.mp4 import decode_mp4, encode_mp4


class TestJpeg:
    def test_quality75_luma_dc_quant_is_8(self):
        # the constant that makes constant-color blocks lossless
        qt_l, _ = quality_tables(75)
        assert qt_l[0, 0] == 8

    @pytest.mark.parametrize("v", [0, 7, 128, 200, 255])
    def test_constant_color_roundtrips_exactly(self, v):
        img = np.full((32, 64, 3), v, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 75)), img)

    def test_constant_color_odd_dims(self):
        # non-multiple-of-8 dims: edge padding must not leak into crop
        img = np.full((13, 21, 3), 99, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 75))
        assert dec.shape == (13, 21, 3)
        assert np.array_equal(dec, img)

    def test_gradient_near_lossless_at_q85(self):
        x = np.linspace(0, 255, 64)
        grad = np.stack([np.tile(x, (48, 1))] * 3, axis=-1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(grad, 85))
        assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 2

    def test_smooth_random_psnr(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        img = (img.astype(float) * 0.3 + 110).astype(np.uint8)  # tame noise
        dec = decode_jpeg(encode_jpeg(img, 90))
        mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr > 25, psnr

    def test_grayscale_single_component(self):
        g = np.full((17, 23), 77, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(g, 75))
        assert dec.shape == (17, 23, 3)
        assert np.array_equal(dec[:, :, 0], g)
        assert np.array_equal(dec[:, :, 0], dec[:, :, 2])

    def test_higher_quality_monotone_size(self):
        rng = np.random.default_rng(1)
        img = rng.integers(80, 170, size=(32, 32, 3), dtype=np.uint8)
        assert len(encode_jpeg(img, 95)) > len(encode_jpeg(img, 30))

    @pytest.mark.parametrize(
        "bad",
        [b"nope", b"\xff\xd8\xff\xe0garbage", b"\xff\xd8\xff\xdb\x00\x02"],
    )
    def test_corrupt_raises_value_error(self, bad):
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_truncated_raises_value_error(self):
        enc = encode_jpeg(np.full((16, 16, 3), 50, dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(enc[:40])
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 2])

    def test_arithmetic_marker_raises_not_implemented(self):
        enc = bytearray(encode_jpeg(np.full((8, 8, 3), 10, dtype=np.uint8)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic)
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(enc))

    def test_baseline_scan_under_sof2_is_malformed(self):
        # SOF2 is now SUPPORTED; a baseline full-band scan header
        # (Ss=0, Se=63) under it is spec-invalid (progressive DC scans
        # must have Se=0) and maps to the corrupt-data contract.
        enc = bytearray(encode_jpeg(np.full((8, 8, 3), 10, dtype=np.uint8)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg(bytes(enc))

    def _entropy_constant_mcus(self, dc_per_mcu):
        """Entropy-code MCUs that are each [DC-diff, EOB] with the
        standard luma tables; dc_per_mcu = list of quantized DC values."""
        dc_codes = _build_codes(*STD_DC_LUMA)
        ac_codes = _build_codes(*STD_AC_LUMA)
        bw = _BitWriter()
        prev = 0
        for dc in dc_per_mcu:
            size, extra = _magnitude(dc - prev)
            prev = dc
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(extra, size)
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
        bw.flush()
        return bytes(bw.out)

    def _headers(self, h, w, sampling, ncomp=1, dri=None):
        qt_l, qt_c = quality_tables(75)

        def seg(marker, payload):
            return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
        if ncomp == 3:
            out += seg(
                0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8))
            )
        sof = struct.pack(">BHHB", 8, h, w, ncomp)
        for c in range(ncomp):
            sof += bytes([c + 1, sampling[c], 0 if c == 0 else 1])
        out += seg(0xC0, sof)
        for cls, tid, (bits, vals) in ((0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA)):
            out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
        if dri is not None:
            out += seg(0xDD, struct.pack(">H", dri))
        sos = bytes([ncomp])
        for c in range(ncomp):
            sos += bytes([c + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        return out

    def test_decode_420_subsampled_grayscale_blocks(self):
        # hand-built 4:2:0-style stream: Y with sampling 2x2 (4 blocks
        # per MCU), single component, 16x16 constant gray v=100.
        # DC quant for v=100 at q75: floor(8*(100-128)/8 + 0.5) = -28.
        stream = self._headers(16, 16, sampling=[0x22], ncomp=1)
        # 1 MCU, 4 Y blocks: DC -28 then three diff-0 blocks
        stream += self._entropy_constant_mcus([-28, -28, -28, -28])
        stream += b"\xff\xd9"
        dec = decode_jpeg(bytes(stream))
        assert dec.shape == (16, 16, 3)
        assert np.array_equal(dec, np.full((16, 16, 3), 100, dtype=np.uint8))

    def test_decode_restart_markers(self):
        # 8x16 constant gray image, DRI=1: two MCUs separated by RST0,
        # DC prediction resets after the marker.
        v = 60
        dc = int(np.floor(8 * (v - 128) / 8 + 0.5))
        stream = self._headers(8, 16, sampling=[0x11], ncomp=1, dri=1)
        stream += self._entropy_constant_mcus([dc])
        stream += b"\xff\xd0"  # RST0
        stream += self._entropy_constant_mcus([dc])  # prediction reset
        stream += b"\xff\xd9"
        dec = decode_jpeg(bytes(stream))
        assert np.array_equal(dec, np.full((8, 16, 3), v, dtype=np.uint8))

    @pytest.mark.parametrize("v", [0, 77, 128, 255])
    @pytest.mark.parametrize("shape", [(32, 64), (13, 21), (16, 16)])
    def test_420_constant_color_roundtrips_exactly(self, v, shape):
        # constant chroma mean-pools to itself, so the 4:2:0 exactness
        # argument is the same as 4:4:4's
        img = np.full((*shape, 3), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 75, subsampling="420"))
        assert dec.shape == img.shape
        assert np.array_equal(dec, img)

    def test_420_smaller_than_444(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        assert len(encode_jpeg(img, 85, subsampling="420")) < len(
            encode_jpeg(img, 85, subsampling="444")
        )

    def test_420_gradient_close(self):
        x = np.linspace(0, 255, 64)
        grad = np.stack(
            [
                np.tile(x, (48, 1)),
                np.tile(x[::-1], (48, 1)),
                np.full((48, 64), 128.0),
            ],
            axis=-1,
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(grad, 85, subsampling="420"))
        assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 8

    def test_bad_subsampling_rejected(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")

    def test_encode_input_validation(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 3), dtype=np.float64))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), quality=0)


class TestPngFilters:
    """Decoder filter-reconstruction paths beyond what our encoder
    emits (filter 0): hand-filtered scanlines must decode exactly."""

    @staticmethod
    def _png(img, ftype):
        import struct
        import zlib

        from sparktrends_spark.multimodal.decode import (
            PNG_SIGNATURE,
            _png_chunk,
        )

        gray = img.ndim == 2
        h, w = img.shape[:2]
        bpp = 1 if gray else 3
        raw = bytearray()
        prev = np.zeros(w * bpp, dtype=np.int16)
        for y in range(h):
            line = img[y].reshape(-1).astype(np.int16)
            filt = line.copy()
            if ftype == 1:  # Sub
                filt[bpp:] = (line[bpp:] - line[:-bpp]) & 0xFF
            elif ftype == 2:  # Up
                filt = (line - prev) & 0xFF
            prev = line
            raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
        return (
            PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    @pytest.mark.parametrize("ftype", [1, 2])
    def test_rgb_filters_decode_exactly(self, ftype):
        from sparktrends_spark.multimodal.decode import decode_png

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(self._png(img, ftype)), img)

    @pytest.mark.parametrize("ftype", [1, 2])
    def test_gray_filters_decode_exactly(self, ftype):
        from sparktrends_spark.multimodal.decode import decode_png

        rng = np.random.default_rng(6)
        g = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
        dec = decode_png(self._png(g, ftype))
        assert np.array_equal(dec[:, :, 0], g)


class TestWavWidths:
    """decode_wav maps every RIFF integer PCM width to the engine's
    int16 convention (graded 16-bit path is covered by the oracles)."""

    @staticmethod
    def _wav(width, data_bytes, rate=8000, nch=1):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(data_bytes)
        return buf.getvalue()

    def test_8bit_unsigned_recentered(self):
        from sparktrends_spark.multimodal.decode import decode_wav

        raw = np.array([0, 128, 255, 64], dtype=np.uint8)
        dec, _ = decode_wav(self._wav(1, raw.tobytes()))
        assert np.array_equal(dec, (raw.astype(np.int16) - 128) << 8)

    def test_24bit_keeps_top_16(self):
        from sparktrends_spark.multimodal.decode import decode_wav

        vals = np.array([0, 1, -1, 8388607, -8388608, 123456], dtype=np.int32)
        b = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
        dec, _ = decode_wav(self._wav(3, b))
        assert np.array_equal(dec, (vals >> 8).astype(np.int16))

    def test_32bit_keeps_top_16(self):
        from sparktrends_spark.multimodal.decode import decode_wav

        vals = np.array(
            [0, 1 << 16, -(1 << 16), 2147483647, -2147483648], dtype="<i4"
        )
        dec, _ = decode_wav(self._wav(4, vals.tobytes()))
        assert np.array_equal(dec, (vals >> 16).astype(np.int16))

    def test_stereo_takes_channel_zero(self):
        from sparktrends_spark.multimodal.decode import decode_wav

        st = np.array([[100, -5], [200, -6], [300, -7]], dtype="<i2")
        dec, _ = decode_wav(self._wav(2, st.tobytes(), nch=2))
        assert np.array_equal(dec, st[:, 0])

    def test_torn_data_chunk_is_corrupt_not_short(self):
        # stdlib wave silently returns short frames on a torn data
        # chunk; the engine contract is ValueError (quarantine), never
        # a silently shorter clip
        from sparktrends_spark.multimodal.decode import decode_wav, encode_wav

        wav = encode_wav(np.arange(1000, dtype="<i2"))
        with pytest.raises(ValueError, match="truncated"):
            decode_wav(wav[: len(wav) // 2])


class TestCorruptionContract:
    """Every decoder must raise ONLY ValueError (or succeed) on
    arbitrarily corrupted input with an intact signature — anything
    else would kill a Spark task instead of quarantining one object
    (decode_health relies on this)."""

    def _fuzz(self, blob: bytes, dec, keep: int, rng):
        for _ in range(60):
            b = bytearray(blob)
            for _ in range(rng.integers(1, 4)):
                b[rng.integers(keep, len(b))] = rng.integers(0, 256)
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass  # quarantine or unsupported-variant: both contract-legal
        # truncations too
        for frac in (0.25, 0.5, 0.9):
            try:
                dec(blob[: int(len(blob) * frac)])
            except (ValueError, NotImplementedError):
                pass

    def test_png_fuzz(self):
        from sparktrends_spark.multimodal.decode import decode_png, encode_png

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        self._fuzz(encode_png(img), decode_png, keep=8, rng=rng)

    def test_jpeg_fuzz(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        self._fuzz(encode_jpeg(img, 80), decode_jpeg, keep=3, rng=rng)

    def test_wav_fuzz(self):
        from sparktrends_spark.multimodal.decode import decode_wav, encode_wav

        rng = np.random.default_rng(2)
        wav = encode_wav(rng.integers(-30000, 30000, 500).astype("<i2"))
        self._fuzz(wav, decode_wav, keep=4, rng=rng)

    def test_mp4_fuzz(self):
        rng = np.random.default_rng(3)
        mp4 = encode_mp4([bytes(rng.integers(0, 256, 40, dtype=np.uint8))
                          for _ in range(6)], 200)
        self._fuzz(mp4, decode_mp4, keep=8, rng=rng)


class TestMp4:
    def test_roundtrip_bytes_and_timestamps(self):
        frames = [bytes([i]) * (10 + i) for i in range(7)]
        media = decode_mp4(encode_mp4(frames, 400, width=64, height=48))
        assert media.timescale == 1000
        assert media.width == 64 and media.height == 48
        assert media.duration_ms == 7 * 400
        assert [ts for ts, _ in media.samples] == [i * 400 for i in range(7)]
        assert [b for _, b in media.samples] == frames

    def test_single_frame(self):
        media = decode_mp4(encode_mp4([b"only"], 1000))
        assert media.samples == [(0, b"only")]

    def test_nonstandard_timescale(self):
        media = decode_mp4(encode_mp4([b"a", b"b", b"c"], 40, timescale=90000))
        assert media.timescale == 90000
        assert [ts for ts, _ in media.samples] == [0, 40, 80]

    def test_empty_frames_rejected(self):
        with pytest.raises(ValueError):
            encode_mp4([], 100)

    @pytest.mark.parametrize("cut", [10, 50, -20])
    def test_truncated_raises_value_error(self, cut):
        mp4 = encode_mp4([b"frame0", b"frame1"], 100)
        with pytest.raises(ValueError):
            decode_mp4(mp4[:cut])

    def test_not_mp4_raises_value_error(self):
        with pytest.raises(ValueError):
            decode_mp4(b"RIFF....WAVE")

    def test_fragmented_without_moov_raises_value_error(self):
        ftyp = b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00"
        moof = b"\x00\x00\x00\x08moof"
        with pytest.raises(ValueError):
            decode_mp4(ftyp + moof)

    def test_fmp4_roundtrip_matches_progressive(self):
        import hashlib

        from sparktrends_spark.multimodal.mp4 import encode_fmp4

        frames = [
            hashlib.md5(f"f{i}".encode()).digest() for i in range(10)
        ]
        prog = decode_mp4(encode_mp4(frames, 400, width=16, height=16))
        frag = decode_mp4(
            encode_fmp4(
                frames, 400, width=16, height=16, frames_per_fragment=4
            )
        )
        # the demuxed sample list is layout-independent
        assert frag.samples == prog.samples
        assert (frag.width, frag.height) == (16, 16)
        assert frag.duration_ms == prog.duration_ms == 4000

    def test_fmp4_variable_sizes_and_single_fragment(self):
        from sparktrends_spark.multimodal.mp4 import encode_fmp4

        frames = [b"x" * i for i in range(1, 6)]
        media = decode_mp4(
            encode_fmp4(frames, 100, frames_per_fragment=100)
        )
        assert [b for _, b in media.samples] == frames
        assert [t for t, _ in media.samples] == [0, 100, 200, 300, 400]
        assert media.duration_ms == 500

    def test_fmp4_multitrack_demuxes_only_the_video_track(self):
        """An external muxer's fMP4 interleaves video AND audio
        fragments (one traf per track, distinguished by tfhd
        track_ID). The demuxer must take only trafs whose track_ID
        matches moov's video track — mixing tracks would corrupt both
        timestamps and sample bytes."""
        from sparktrends_spark.multimodal.mp4 import _box, _full, encode_fmp4

        frames = [b"VID%d" % i for i in range(6)]
        video_only = encode_fmp4(
            frames, 400, width=16, height=16, frames_per_fragment=3
        )
        # craft an AUDIO fragment (track_ID=2, same wire format)
        payloads = [b"AUDIO%d" % i for i in range(3)]

        def audio_moof(data_offset: int) -> bytes:
            mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 99))
            tfhd = _full(b"tfhd", 0, 0x020008, struct.pack(">II", 2, 400))
            tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", 0))
            trun = _full(
                b"trun", 0, 0x000201,
                struct.pack(">I", len(payloads))
                + struct.pack(">i", data_offset)
                + b"".join(struct.pack(">I", len(p)) for p in payloads),
            )
            return _box(b"moof", mfhd + _box(b"traf", tfhd + tfdt + trun))

        probe = audio_moof(0)
        moof = audio_moof(len(probe) + 8)
        multi = video_only + moof + _box(b"mdat", b"".join(payloads))
        got = decode_mp4(multi)
        want = decode_mp4(video_only)
        assert got.samples == want.samples  # audio track invisible
        assert all(b.startswith(b"VID") for _, b in got.samples)

    def test_fmp4_trun_per_sample_durations_override_tfhd_default(self):
        from sparktrends_spark.multimodal.mp4 import encode_fmp4

        # rewrite the first fragment's trun to carry per-sample
        # durations (flag 0x100) of 50 units instead of the tfhd
        # default 100 — decoded timestamps must follow the trun
        data = bytearray(encode_fmp4([b"AAAA", b"BBBB"], 100))
        at = bytes(data).find(b"trun")
        (flags,) = struct.unpack(">I", bytes(data[at + 4 : at + 8]))
        assert flags & 0x200 and not flags & 0x100
        # old payload: ver/flags, count, data_offset, size0, size1
        cnt, doff, s0, s1 = struct.unpack(
            ">IiII", bytes(data[at + 8 : at + 24])
        )
        new_trun_payload = struct.pack(
            ">IiIIII", cnt, doff + 8, 50, s0, 50, s1
        )
        new_trun = (
            struct.pack(">I", 8 + 4 + len(new_trun_payload))
            + b"trun"
            + struct.pack(">I", flags | 0x100)
            + new_trun_payload
        )
        rebuilt = bytearray(
            bytes(data[: at - 4]) + new_trun + bytes(data[at + 24 :])
        )
        for name in (b"moof", b"traf"):
            at2 = bytes(rebuilt).find(name)
            (sz,) = struct.unpack(">I", bytes(rebuilt[at2 - 4 : at2]))
            rebuilt[at2 - 4 : at2] = struct.pack(">I", sz + 8)
        media = decode_mp4(bytes(rebuilt))
        assert [t for t, _ in media.samples] == [0, 50]
        assert [b for _, b in media.samples] == [b"AAAA", b"BBBB"]

    def test_fmp4_sample_overrun_raises_value_error(self):
        from sparktrends_spark.multimodal.mp4 import encode_fmp4

        data = bytearray(encode_fmp4([b"AAAA"], 100))
        at = bytes(data).find(b"trun")
        # inflate the only sample's size past EOF
        data[at + 16 : at + 20] = struct.pack(">I", 1 << 20)
        with pytest.raises(ValueError):
            decode_mp4(bytes(data))

    def test_multi_chunk_stsc_reconstruction(self):
        # rewrite a 4-frame file into 2 chunks of 2 samples to cover
        # the stsc-run walk: chunk 0 at the original offset, chunk 1
        # right after samples 0-1.
        frames = [b"AAAA", b"BBBB", b"CCCC", b"DDDD"]
        mp4 = bytearray(encode_mp4(frames, 100))
        stsc_at = bytes(mp4).find(b"stsc")
        # stsc payload: ver/flags, count, (first_chunk, spc, desc)
        mp4[stsc_at + 8 : stsc_at + 24] = struct.pack(">IIII", 1, 1, 2, 1)
        stco_at = bytes(mp4).find(b"stco")
        (old_off,) = struct.unpack(
            ">I", bytes(mp4[stco_at + 12 : stco_at + 16])
        )
        # grow stco from 1 to 2 entries: rebuild the box in place is
        # fiddly — instead decode with a co64-free two-entry stco by
        # rebuilding the file from scratch via the public helpers
        head = bytes(mp4[:stco_at - 4])
        tail_after = bytes(mp4[stco_at + 16:])
        new_stco = (
            struct.pack(">I", 24)
            + b"stco"
            + struct.pack(">I", 0)
            + struct.pack(">III", 2, old_off, old_off + 8)
        )
        rebuilt = bytearray(head + new_stco + tail_after)
        # fix enclosing box sizes (stco grew by one 4-byte entry)
        for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            at = bytes(rebuilt).find(name)
            (sz,) = struct.unpack(">I", bytes(rebuilt[at - 4 : at]))
            rebuilt[at - 4 : at] = struct.pack(">I", sz + 4)
        media = decode_mp4(bytes(rebuilt))
        assert [b for _, b in media.samples] == frames

    def test_spark_asset_encode_shapes(self):
        # encode_media_payloads' video generator contract: sample i of
        # asset with text t is md5(t + '#' + i)
        import hashlib

        from sparktrends_spark.multimodal.assets import VIDEO_FRAME_MS

        raw = b"some document text"
        n = 3
        frames = [
            hashlib.md5(raw + b"#" + str(i).encode()).digest() for i in range(n)
        ]
        media = decode_mp4(encode_mp4(frames, VIDEO_FRAME_MS))
        assert [b for _, b in media.samples] == frames
        assert [ts for ts, _ in media.samples] == [0, 400, 800]


class TestCodecProperties:
    """Hypothesis round-trip properties over the codec surface."""

    def test_mp4_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            frames=st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=12),
            dur=st.integers(min_value=1, max_value=5000),
        )
        def check(frames, dur):
            media = decode_mp4(encode_mp4(frames, dur))
            assert [b for _, b in media.samples] == frames
            assert [ts for ts, _ in media.samples] == [
                i * dur for i in range(len(frames))
            ]

        check()

    def test_png_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from sparktrends_spark.multimodal.decode import decode_png, encode_png

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=24),
            w=st.integers(min_value=1, max_value=24),
            seed=st.integers(min_value=0, max_value=2**31),
        )
        def check(h, w, seed):
            img = np.random.default_rng(seed).integers(
                0, 256, size=(h, w, 3), dtype=np.uint8
            )
            assert np.array_equal(decode_png(encode_png(img)), img)

        check()

    def test_wav_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from sparktrends_spark.multimodal.decode import decode_wav, encode_wav

        @settings(max_examples=25, deadline=None)
        @given(
            n=st.integers(min_value=0, max_value=512),
            seed=st.integers(min_value=0, max_value=2**31),
            rate=st.sampled_from([8000, 16000, 44100]),
        )
        def check(n, seed, rate):
            pcm = np.random.default_rng(seed).integers(
                -32768, 32768, size=n, dtype=np.int16
            )
            dec, r = decode_wav(encode_wav(pcm, rate))
            assert r == rate
            assert np.array_equal(dec, pcm)

        check()

    def test_jpeg_constant_color_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            v=st.integers(min_value=0, max_value=255),
            h=st.integers(min_value=1, max_value=24),
            w=st.integers(min_value=1, max_value=24),
            sub=st.sampled_from(["444", "420"]),
        )
        def check(v, h, w, sub):
            img = np.full((h, w, 3), v, dtype=np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg(img, 75, subsampling=sub)), img
            )

        check()


class TestProgressiveJpeg:
    def test_progressive_decodes_bit_identical_to_baseline(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(42)
        for shape in [(8, 8, 3), (17, 31, 3), (9, 130, 3), (1, 1, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for q in (50, 75, 95):
                base = decode_jpeg(encode_jpeg(img, q))
                prog = decode_jpeg(encode_jpeg_progressive(img, q))
                assert np.array_equal(base, prog), (shape, q)

    def test_progressive_grayscale_and_structured_inputs(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(7)
        gray = rng.integers(0, 256, (23, 17), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(gray, 75)),
            decode_jpeg(encode_jpeg_progressive(gray, 75)),
        )
        # gradient: deep EOB runs + refinement correction bits
        g = np.linspace(0, 255, 64 * 96).reshape(64, 96).astype(np.uint8)
        grad = np.stack([g, g, g], axis=2)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(grad, 75)),
            decode_jpeg(encode_jpeg_progressive(grad, 75)),
        )
        # checkerboard: dense AC through every banded scan
        chk = (np.indices((48, 48)).sum(axis=0) % 2 * 255).astype(np.uint8)
        chk3 = np.stack([chk] * 3, axis=2)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(chk3, 75)),
            decode_jpeg(encode_jpeg_progressive(chk3, 75)),
        )

    def test_progressive_constant_color_roundtrips_exactly(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        for v in (0, 1, 55, 137, 255):
            img = np.full((24, 16, 3), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg_progressive(img, 75))
            assert np.array_equal(out, img), v

    def test_progressive_marker_is_sof2(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        data = encode_jpeg_progressive(
            np.zeros((8, 8, 3), dtype=np.uint8), 75
        )
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        # multiple SOS scans (the 10-scan color script)
        assert data.count(b"\xff\xda") == 10

    def test_progressive_truncated_raises_value_error(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        data = encode_jpeg_progressive(img, 75)
        for cut in (len(data) // 3, len(data) // 2, -30):
            with pytest.raises(ValueError):
                decode_jpeg(data[:cut])


class TestExif:
    def _jpeg(self):
        return encode_jpeg(np.full((16, 16, 3), 120, dtype=np.uint8), 75)

    def test_roundtrip_all_fields(self):
        from sparktrends_spark.multimodal.exif import insert_exif, parse_exif

        fields = {
            "make": "ACME", "model": "Cam 9", "orientation": 6,
            "datetime": "2026:08:14 12:00:00",
            "exposure_time": (1, 250), "iso": 400,
        }
        assert parse_exif(insert_exif(self._jpeg(), fields)) == fields

    def test_pixels_untouched_by_insert_and_strip(self):
        from sparktrends_spark.multimodal.exif import (
            insert_exif,
            parse_exif,
            strip_exif,
        )

        j = self._jpeg()
        j2 = insert_exif(j, {"orientation": 3})
        assert np.array_equal(decode_jpeg(j2), decode_jpeg(j))
        j3 = strip_exif(j2)
        assert parse_exif(j3) == {}
        assert np.array_equal(decode_jpeg(j3), decode_jpeg(j))

    def test_no_exif_returns_empty(self):
        from sparktrends_spark.multimodal.exif import parse_exif

        assert parse_exif(self._jpeg()) == {}

    def test_little_endian_tiff_parses(self):
        # hand-build an II (little-endian) Exif: orientation=5
        from sparktrends_spark.multimodal.exif import parse_exif

        tiff = (
            b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1)                       # 1 entry
            + struct.pack("<HHI", 0x0112, 3, 1)          # orientation SHORT
            + struct.pack("<H", 5) + b"\x00\x00"
            + struct.pack("<I", 0)                       # next IFD
        )
        payload = b"Exif\x00\x00" + tiff
        seg = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
        j = self._jpeg()
        assert parse_exif(j[:2] + seg + j[2:]) == {"orientation": 5}

    def test_corrupt_tiff_raises_value_error(self):
        from sparktrends_spark.multimodal.exif import parse_exif

        j = self._jpeg()
        for bad_tiff in (b"XX" + b"\x00" * 10, b"MM\x00\x2a\xff\xff\xff\xff"):
            payload = b"Exif\x00\x00" + bad_tiff
            seg = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
            with pytest.raises(ValueError):
                parse_exif(j[:2] + seg + j[2:])

    def test_insert_on_non_jpeg_raises(self):
        from sparktrends_spark.multimodal.exif import insert_exif

        with pytest.raises(ValueError):
            insert_exif(b"RIFFxxxx", {"orientation": 1})


class TestProgressiveRestart:
    @pytest.mark.parametrize("ri", [1, 3, 7])
    def test_progressive_with_restart_markers_matches_baseline(self, ri):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (17, 31, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, 75))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, 75, restart_interval=ri)
        )
        assert np.array_equal(base, prog)

    def test_restart_stream_contains_dri_and_rst_markers(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        data = encode_jpeg_progressive(img, 75, restart_interval=2)
        assert b"\xff\xdd" in data  # DRI
        assert any(bytes([0xFF, 0xD0 + n]) in data for n in range(8))


class TestCorruptContractFuzz:
    """The quarantine contract: for ANY byte-level corruption, decode
    returns a valid result or raises ValueError/NotImplementedError —
    never IndexError/struct.error/RecursionError."""

    ALLOWED = (ValueError, NotImplementedError)

    def _fuzz(self, data: bytes, decode, rng, rounds=300):
        n = len(data)
        for i in range(rounds):
            b = bytearray(data)
            mode = i % 3
            if mode == 0:  # flip a few bytes
                for _ in range(rng.integers(1, 6)):
                    b[int(rng.integers(0, n))] = int(rng.integers(0, 256))
            elif mode == 1:  # truncate
                b = b[: int(rng.integers(1, n))]
            else:  # flip AND truncate
                b[int(rng.integers(0, n))] = int(rng.integers(0, 256))
                b = b[: int(rng.integers(8, n))]
            try:
                decode(bytes(b))
            except self.ALLOWED:
                pass

    def test_jpeg_baseline_fuzz(self):
        rng = np.random.default_rng(123)
        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        self._fuzz(encode_jpeg(img, 75), decode_jpeg, rng)

    def test_jpeg_progressive_fuzz(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(124)
        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        self._fuzz(encode_jpeg_progressive(img, 75), decode_jpeg, rng)

    def test_mp4_fuzz(self):
        import hashlib

        rng = np.random.default_rng(125)
        frames = [hashlib.md5(f"f{i}".encode()).digest() for i in range(6)]
        self._fuzz(encode_mp4(frames, 100), decode_mp4, rng)

    def test_fmp4_fuzz(self):
        import hashlib

        from sparktrends_spark.multimodal.mp4 import encode_fmp4

        rng = np.random.default_rng(126)
        frames = [hashlib.md5(f"f{i}".encode()).digest() for i in range(6)]
        self._fuzz(
            encode_fmp4(frames, 100, frames_per_fragment=2), decode_mp4, rng
        )

    def test_exif_fuzz(self):
        from sparktrends_spark.multimodal.exif import insert_exif, parse_exif

        rng = np.random.default_rng(127)
        j = insert_exif(
            encode_jpeg(np.full((8, 8, 3), 9, dtype=np.uint8), 75),
            {"make": "A", "model": "B", "orientation": 3,
             "datetime": "2026:01:01 00:00:00",
             "exposure_time": (1, 8), "iso": 100},
        )
        self._fuzz(j, parse_exif, rng)

    def test_png_fuzz(self):
        from sparktrends_spark.multimodal.decode import decode_png, encode_png

        rng = np.random.default_rng(128)
        img = rng.integers(0, 256, (12, 18, 3), dtype=np.uint8)
        data = encode_png(img)
        n = len(data)
        for i in range(300):
            b = bytearray(data)
            if i % 2:
                b[int(rng.integers(0, n))] = int(rng.integers(0, 256))
            else:
                b = b[: int(rng.integers(1, n))]
            try:
                decode_png(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    def test_wav_fuzz(self):
        from sparktrends_spark.multimodal.decode import decode_wav, encode_wav

        rng = np.random.default_rng(129)
        samples = rng.integers(-32768, 32767, 256, dtype=np.int16)
        data = encode_wav(samples, 8000)
        n = len(data)
        for i in range(300):
            b = bytearray(data)
            if i % 2:
                b[int(rng.integers(0, n))] = int(rng.integers(0, 256))
            else:
                b = b[: int(rng.integers(1, n))]
            try:
                decode_wav(bytes(b))
            except (ValueError, NotImplementedError):
                pass


class TestJpeg12Bit:
    def test_constant_multiple_of_16_roundtrips_exactly(self):
        from sparktrends_spark.multimodal.jpeg import (
            decode_jpeg12,
            encode_jpeg12,
        )

        for v in (0, 2048, 2048 + 16 * 5, 4080):
            img = np.full((24, 17), v, dtype=np.uint16)
            out = decode_jpeg12(encode_jpeg12(img, 75))
            assert out.dtype == np.uint16
            assert np.array_equal(out, img), v

    def test_arbitrary_constant_within_quant_error(self):
        from sparktrends_spark.multimodal.jpeg import (
            decode_jpeg12,
            encode_jpeg12,
        )

        img = np.full((16, 16), 1234, dtype=np.uint16)
        out = decode_jpeg12(encode_jpeg12(img, 75))
        assert abs(int(out[0, 0]) - 1234) <= 16

    def test_gradient_psnr_in_12bit_domain(self):
        import math

        from sparktrends_spark.multimodal.jpeg import (
            decode_jpeg12,
            encode_jpeg12,
        )

        x = np.linspace(0, 4095, 64).astype(np.uint16)
        grad = np.tile(x, (48, 1))
        dec = decode_jpeg12(encode_jpeg12(grad, 90))
        mse = np.mean((dec.astype(float) - grad.astype(float)) ** 2)
        assert 10 * math.log10(4095.0**2 / mse) > 40

    def test_plain_decode_downshifts_to_uint8(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg12

        v = 2048 + 16 * 4
        rgb = decode_jpeg(encode_jpeg12(np.full((8, 8), v, dtype=np.uint16), 75))
        assert rgb.shape == (8, 8, 3) and rgb[0, 0, 0] == v >> 4

    def test_decode12_rejects_8bit_and_bad_input(self):
        from sparktrends_spark.multimodal.jpeg import (
            decode_jpeg12,
            encode_jpeg12,
        )

        with pytest.raises(ValueError):
            decode_jpeg12(encode_jpeg(np.full((8, 8, 3), 9, dtype=np.uint8)))
        with pytest.raises(ValueError):
            encode_jpeg12(np.full((8, 8), 5000, dtype=np.uint16))
        with pytest.raises(ValueError):
            encode_jpeg12(np.full((8, 8), 5, dtype=np.uint8))

    def test_12bit_stream_structure(self):
        from sparktrends_spark.multimodal.jpeg import encode_jpeg12

        data = encode_jpeg12(np.full((8, 8), 100, dtype=np.uint16), 75)
        assert b"\xff\xc1" in data  # SOF1
        sof = data.find(b"\xff\xc1")
        assert data[sof + 4] == 12  # precision byte
        dqt = data.find(b"\xff\xdb")
        assert data[dqt + 4] == 0x10  # pq=1, tq=0

    def test_12bit_fuzz(self):
        from sparktrends_spark.multimodal.jpeg import (
            decode_jpeg12,
            encode_jpeg12,
        )

        rng = np.random.default_rng(130)
        img = (rng.integers(0, 4096, (16, 16))).astype(np.uint16)
        data = encode_jpeg12(img, 75)
        n = len(data)
        for i in range(300):
            b = bytearray(data)
            if i % 2:
                b[int(rng.integers(0, n))] = int(rng.integers(0, 256))
            else:
                b = b[: int(rng.integers(1, n))]
            try:
                decode_jpeg12(bytes(b))
            except (ValueError, NotImplementedError):
                pass
