"""Pure-Python FLAC codec: encoder/decoder round-trips + handcrafted frames
for the decoder paths the subset encoder never emits (LPC, stereo
decorrelation)."""

import numpy as np
import pytest

from rnnt_inference_tpu.data.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
    load_flac,
)


def roundtrip(x, sr=16000, **kw):
    data = encode_flac(x, sr, **kw)
    out, out_sr, bps = decode_flac(data)
    assert out_sr == sr
    return out


@pytest.mark.parametrize("n", [1, 100, 4096, 5000, 13001])
def test_roundtrip_random_mono(n):
    rng = np.random.RandomState(n)
    x = rng.randint(-32768, 32768, size=n).astype(np.int32)
    out = roundtrip(x)
    np.testing.assert_array_equal(out[:, 0], x)


def test_roundtrip_speechlike_mono():
    # correlated signal exercises fixed-order predictors + small rice params
    rng = np.random.RandomState(0)
    x = np.cumsum(rng.randint(-80, 81, size=30000)).astype(np.int32)
    x = np.clip(x, -32768, 32767)
    out = roundtrip(x)
    np.testing.assert_array_equal(out[:, 0], x)


def test_roundtrip_constant_and_silence():
    x = np.zeros(9000, np.int32)
    np.testing.assert_array_equal(roundtrip(x)[:, 0], x)
    x = np.full(5000, -1234, np.int32)
    np.testing.assert_array_equal(roundtrip(x)[:, 0], x)


def test_roundtrip_stereo_independent():
    rng = np.random.RandomState(1)
    x = rng.randint(-4000, 4000, size=(7000, 2)).astype(np.int32)
    out = roundtrip(x)
    np.testing.assert_array_equal(out, x)


def test_roundtrip_escape_partitions():
    rng = np.random.RandomState(2)
    x = rng.randint(-32768, 32768, size=5000).astype(np.int32)
    out = roundtrip(x, force_escape=True)
    np.testing.assert_array_equal(out[:, 0], x)


def test_roundtrip_wasted_bits():
    rng = np.random.RandomState(3)
    x = (rng.randint(-2000, 2000, size=4096) << 3).astype(np.int32)
    out = roundtrip(x)
    np.testing.assert_array_equal(out[:, 0], x)


def test_crc_detects_corruption():
    x = np.arange(-500, 500, dtype=np.int32)
    data = bytearray(encode_flac(x, 16000))
    data[-10] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_load_flac_matches_wav_scaling(tmp_path):
    rng = np.random.RandomState(4)
    x = rng.randint(-32768, 32768, size=8000).astype(np.int32)
    p = tmp_path / "a.flac"
    p.write_bytes(encode_flac(x, 16000))
    wav, sr = load_flac(str(p))
    assert sr == 16000
    np.testing.assert_allclose(wav, x.astype(np.float32) / 32768.0)


def test_load_audio_flac_path(tmp_path):
    from rnnt_inference_tpu.data.audio import load_audio

    rng = np.random.RandomState(5)
    x = rng.randint(-10000, 10000, size=16000).astype(np.int32)
    p = tmp_path / "u.flac"
    p.write_bytes(encode_flac(x, 16000))
    wav = load_audio(str(p), target_sr=16000)
    np.testing.assert_allclose(wav, x.astype(np.float32) / 32768.0)


# -- handcrafted frames for decoder-only paths ------------------------------


def _frame_header(bw, channels_code, bsz, frame_no=0, bps_code=4):
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit blocksize at end
    bw.write(0, 4)  # sr from streaminfo
    bw.write(channels_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.write(frame_no, 8)
    bw.write(bsz - 1, 16)
    bw.align()


def _streaminfo(sr, channels, bps, total, block_size=4096):
    import struct

    si = struct.pack(">HH", block_size, block_size) + b"\x00" * 6
    bits = (sr << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    si += bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _verbatim_subframe(bw, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x:
        bw.write_signed(int(v), bps)


def _finish_frame(header_and_body: "_BitWriter") -> bytes:
    header_and_body.align()
    raw = header_and_body.getvalue()
    return raw + _crc16(raw).to_bytes(2, "big")


def _with_crc8(bw: "_BitWriter") -> "_BitWriter":
    """Close the header (byte-aligned), append CRC-8, return a new writer
    preloaded with header+crc bytes."""
    hdr = bw.getvalue()
    out = _BitWriter()
    for b in hdr:
        out.write(b, 8)
    out.write(_crc8(hdr), 8)
    return out


def test_decoder_lpc_subframe():
    """Order-1 LPC with coef=1, shift=0 == cumulative sum of residuals."""
    bsz = 16
    warm = 100
    res = [3, -2, 5, 0, 1, -1, 2, 4, -3, 0, 0, 7, -7, 1, 2]
    expect = [warm]
    for r in res:
        expect.append(r + expect[-1])

    hdr = _BitWriter()
    _frame_header(hdr, channels_code=0, bsz=bsz)
    bw = _with_crc8(hdr)
    # LPC subframe: pad 0, type 1xxxxx with order-1 -> 0b100000
    bw.write(0, 1)
    bw.write(0b100000, 6)
    bw.write(0, 1)  # no wasted bits
    bw.write_signed(warm, 16)
    bw.write(14, 4)  # precision 15
    bw.write_signed(0, 5)  # shift 0
    bw.write_signed(1, 15)  # coef = 1
    bw.write(0, 2)  # rice 4-bit
    bw.write(0, 4)  # partition order 0
    bw.write(2, 4)  # rice k=2
    for v in res:
        z = (abs(v) << 1) - (1 if v < 0 else 0)
        bw.write_unary(z >> 2)
        bw.write(z & 3, 2)
    data = _streaminfo(16000, 1, 16, bsz, bsz) + _finish_frame(bw)
    out, sr, bps = decode_flac(data)
    np.testing.assert_array_equal(out[:, 0], expect)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decoder_stereo_decorrelation(mode):
    rng = np.random.RandomState(7)
    left = rng.randint(-3000, 3000, size=12).astype(np.int64)
    right = rng.randint(-3000, 3000, size=12).astype(np.int64)
    side = left - right
    bsz = len(left)

    code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    hdr = _BitWriter()
    _frame_header(hdr, channels_code=code, bsz=bsz)
    bw = _with_crc8(hdr)
    if mode == "left_side":
        _verbatim_subframe(bw, left, 16)
        _verbatim_subframe(bw, side, 17)
    elif mode == "right_side":
        _verbatim_subframe(bw, side, 17)
        _verbatim_subframe(bw, right, 16)
    else:
        mid = (left + right) >> 1
        _verbatim_subframe(bw, mid, 16)
        _verbatim_subframe(bw, side, 17)
    data = _streaminfo(16000, 2, 16, bsz, bsz) + _finish_frame(bw)
    out, _, _ = decode_flac(data)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


def test_decoder_multi_partition_residual():
    """Partition order 2 (4 partitions, distinct rice params) — the shape
    libFLAC actually emits; our subset encoder always uses order 0."""
    bsz = 32
    order = 1
    warm = 7
    rng = np.random.RandomState(9)
    res = rng.randint(-20, 21, size=bsz - order)
    expect = [warm]
    for r in res:
        expect.append(int(r) + expect[-1])

    hdr = _BitWriter()
    _frame_header(hdr, channels_code=0, bsz=bsz)
    bw = _with_crc8(hdr)
    bw.write(0, 1)
    bw.write(8 + order, 6)  # fixed order 1
    bw.write(0, 1)
    bw.write_signed(warm, 16)
    bw.write(0, 2)  # rice 4-bit
    bw.write(2, 4)  # partition order 2 -> 4 partitions of bsz/4
    part_len = bsz >> 2
    ks = [1, 3, 0, 5]
    idx = 0
    for p, k in enumerate(ks):
        n = part_len - order if p == 0 else part_len
        bw.write(k, 4)
        for _ in range(n):
            v = int(res[idx]); idx += 1
            z = (abs(v) << 1) - (1 if v < 0 else 0)
            bw.write_unary(z >> k)
            bw.write(z & ((1 << k) - 1), k)
    data = _streaminfo(16000, 1, 16, bsz, bsz) + _finish_frame(bw)
    out, _, _ = decode_flac(data)
    np.testing.assert_array_equal(out[:, 0], expect)


def test_decoder_table_blocksize_code():
    """Block size from the 4-bit code table (code 8 = 256), not the
    explicit 8/16-bit field our encoder uses."""
    bsz = 256
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(8, 4)   # table code: 256
    hdr.write(0, 4)   # sr from streaminfo
    hdr.write(0, 4)   # mono
    hdr.write(4, 3)   # 16-bit
    hdr.write(0, 1)
    hdr.write(0, 8)   # frame number 0
    hdr.align()
    bw = _with_crc8(hdr)
    bw.write(0, 1)
    bw.write(0, 6)  # constant subframe
    bw.write(0, 1)
    bw.write_signed(-321, 16)
    data = _streaminfo(16000, 1, 16, bsz, bsz) + _finish_frame(bw)
    out, _, _ = decode_flac(data)
    np.testing.assert_array_equal(out[:, 0], np.full(bsz, -321))


def test_utf8_coded_number_roundtrip():
    """Writer == reader inverse across every lead-byte form (frame numbers
    beyond 0x10000 = streams past ~4.7 h used to desync)."""
    from rnnt_inference_tpu.data.flac import _read_utf8_number, _write_utf8_number

    values = [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
              0x200000, 0x3FFFFFF, 0x4000000, (1 << 36) - 1]
    bw = _BitWriter()
    for v in values:
        _write_utf8_number(bw, v)
    br = _BitReader(bw.getvalue())
    assert [_read_utf8_number(br) for _ in values] == values


def test_bitreader_unary_across_bytes():
    bw = _BitWriter()
    bw.write_unary(0)
    bw.write_unary(13)
    bw.write_unary(40)
    bw.write_unary(7)
    bw.align()
    br = _BitReader(bw.getvalue())
    assert [br.unary() for _ in range(4)] == [0, 13, 40, 7]


def test_stream_info_probe(tmp_path):
    """flac_stream_info reads (total_samples, sample_rate) from STREAMINFO
    only — must agree with a full decode, and reject non-FLAC bytes."""
    import numpy as np
    import pytest

    from rnnt_inference_tpu.data.flac import decode_flac, encode_flac, flac_stream_info

    rng = np.random.RandomState(0)
    pcm = (rng.randn(12345) * 3000).astype(np.int16)
    path = str(tmp_path / "probe.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, sample_rate=16000))
    total, sr = flac_stream_info(path)
    assert (total, sr) == (12345, 16000)
    decoded, sr2, _ = decode_flac(open(path, "rb").read())
    assert sr2 == sr and len(decoded) == total

    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(b"RIFFxxxx")
    with pytest.raises(ValueError):
        flac_stream_info(bad)

    # truncated mid-STREAMINFO (e.g. a partial download): loud error, not
    # silently mis-aligned sr/total bitfields
    trunc = str(tmp_path / "trunc.flac")
    with open(trunc, "wb") as f:
        f.write(open(path, "rb").read()[:30])
    with pytest.raises(ValueError, match="truncated"):
        flac_stream_info(trunc)
