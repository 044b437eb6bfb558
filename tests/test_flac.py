"""FLAC codec tests — lossless round-trip (hash-exact), all stereo
decorrelation modes, LPC decode path via a hand-built spec frame, Rice
escape, CRC corruption detection. Reference parity: upgrades the
compressed-audio leg beyond WAV (operators/multimodal.py dispatch)."""

import struct

import numpy as np
import pytest

from georasters_spark.sources import flac as FL


def _sig(n, seed=0):
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    return (3000 * np.sin(t / 50) + rng.normal(0, 120, n)).astype(np.int16)


def test_mono_roundtrip_exact_and_compresses():
    s = _sig(20000)
    s[5000:5600] = 777  # constant run -> CONSTANT subframe
    buf = FL.encode_flac(s, 8000)
    out, rate = FL.decode_flac(buf)
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], s)
    assert len(buf) < 2 * s.size  # smaller than raw PCM


@pytest.mark.parametrize("mode", ["indep", "mid_side", "left_side", "right_side"])
def test_stereo_modes_exact(mode):
    left = _sig(9000, 1)
    right = (left * 0.92 + np.random.default_rng(2).normal(0, 40, 9000)).astype(np.int16)
    st = np.stack([left, right], axis=1)
    buf = FL.encode_flac(st, 44100, block_size=1152, stereo_mode=mode)
    out, rate = FL.decode_flac(buf)
    assert rate == 44100
    np.testing.assert_array_equal(out, st)


def test_decorrelation_actually_helps():
    left = _sig(9000, 1)
    right = (left * 0.92).astype(np.int16)
    st = np.stack([left, right], axis=1)
    indep = len(FL.encode_flac(st, 44100, stereo_mode="indep"))
    ms = len(FL.encode_flac(st, 44100, stereo_mode="mid_side"))
    assert ms < indep


def test_edge_inputs():
    for s in [np.array([5, -3, 7], np.int16),
              np.full(5000, -12345, np.int16),
              np.random.default_rng(3).integers(-32768, 32768, 700).astype(np.int16)]:
        out, _ = FL.decode_flac(FL.encode_flac(s))
        np.testing.assert_array_equal(out[:, 0], s)


def test_crc_catches_corruption():
    buf = bytearray(FL.encode_flac(_sig(8000)))
    buf[len(buf) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC|MD5|sync|exhaust"):
        FL.decode_flac(bytes(buf))
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_flac(b"RIFFxxxx")


def test_lpc_subframe_decodes():
    """Hand-built LPC subframe (the decoder path our fixed-predictor
    encoder never emits): order-2 quantized LPC with a known shift —
    expected samples recomputed independently here."""
    warmup = [100, 130]
    coefs = [3, -1]  # prediction = (3*prev - 1*prevprev) >> shift
    shift = 1
    residuals = [5, -2, 7, 0, -3, 1]
    bs = len(warmup) + len(residuals)
    bw = FL._BitWriter()
    # frame header: sync+fixed, blocksize code 7 (16-bit), rate code 13 (16-bit Hz)
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b1101)
    hdr.append((0 << 4) | (0b100 << 1))  # 1 channel, 16 bps
    hdr += FL._utf8_number(0)
    hdr += struct.pack(">H", bs - 1)
    hdr += struct.pack(">H", 8000)
    hdr.append(FL._crc8(bytes(hdr)))
    # subframe: LPC order 2 -> type 32 + (order-1)
    bw.put(0, 1)
    bw.put(32 | (2 - 1), 6)
    bw.put(0, 1)  # no wasted bits
    for w in warmup:
        bw.put(w & 0xFFFF, 16)
    bw.put(4 - 1, 4)        # qlp precision 4 bits
    bw.put(shift & 0x1F, 5)
    for c in coefs:
        bw.put(c & 0xF, 4)
    bw.put(0b00, 2)  # rice method 0
    bw.put(0, 4)     # partition order 0
    bw.put(3, 4)     # rice param
    FL._rice_encode(bw, np.array(residuals, np.int64), 3)
    bw.align()
    body = bytes(hdr) + bytes(bw.out)
    frame = body + struct.pack(">H", FL._crc16(body))
    # container: STREAMINFO for 1 channel / 16 bps / bs samples
    si = (struct.pack(">HH", bs, bs) + b"\x00\x00\x00" * 2
          + FL._pack_streaminfo_tail(8000, 1, 16, bs) + b"\x00" * 16)
    buf = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame
    out, rate = FL.decode_flac(buf)
    exp = list(warmup)
    for r in residuals:
        pred = (coefs[0] * exp[-1] + coefs[1] * exp[-2]) >> shift
        exp.append(r + pred)
    assert out[:, 0].tolist() == exp


def test_rice_escape_and_partitions_decode():
    """Hand-built frame using rice method 1 (5-bit params), partition
    order 1, with one escaped (verbatim) partition."""
    bs = 8
    samples = [10, -20, 30, -40, 1, 2, -1, 0]
    bw = FL._BitWriter()
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b1101)
    hdr.append((0 << 4) | (0b100 << 1))
    hdr += FL._utf8_number(0)
    hdr += struct.pack(">H", bs - 1)
    hdr += struct.pack(">H", 8000)
    hdr.append(FL._crc8(bytes(hdr)))
    bw.put(0, 1)
    bw.put(0b001000, 6)  # FIXED order 0 -> residual == samples
    bw.put(0, 1)
    bw.put(0b01, 2)  # rice method 1 (5-bit params)
    bw.put(1, 4)     # partition order 1 -> 2 partitions of 4
    bw.put(31, 5)    # escape in partition 0
    bw.put(8, 5)     # 8-bit verbatim residuals
    for v in samples[:4]:
        bw.put(v & 0xFF, 8)
    bw.put(2, 5)     # rice param 2 in partition 1
    FL._rice_encode(bw, np.array(samples[4:], np.int64), 2)
    bw.align()
    body = bytes(hdr) + bytes(bw.out)
    frame = body + struct.pack(">H", FL._crc16(body))
    si = (struct.pack(">HH", bs, bs) + b"\x00\x00\x00" * 2
          + FL._pack_streaminfo_tail(8000, 1, 16, bs) + b"\x00" * 16)
    buf = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame
    out, _ = FL.decode_flac(buf)
    assert out[:, 0].tolist() == samples


def test_multimodal_dispatch(spark):
    from georasters_spark.operators import multimodal as MM

    s = _sig(4000)
    samples, rate = MM.decode_audio(FL.encode_flac(s, 8000), "flac")
    np.testing.assert_array_equal(samples, s)
    assert rate == 8000


def test_mono_stream_with_stereo_frame_refuses():
    """Code-review regression: a mono STREAMINFO whose frame claims a
    stereo decorrelation mode must raise the flac ValueError contract,
    not escape with an IndexError."""
    buf = bytearray(FL.encode_flac(_sig(600), 8000))
    # find the first frame (after the 4+4+34-byte header+STREAMINFO)
    fpos = 4 + 4 + 34
    assert buf[fpos] == 0xFF
    hdr = bytearray(buf[fpos : fpos + 4])
    hdr[3] = (8 << 4) | (hdr[3] & 0x0F)  # ch_asgn = 8 (left/side)
    buf[fpos : fpos + 4] = hdr
    # fix the header CRC-8 so the channel check (not the CRC) trips
    hdr_len = 4 + 1 + 2 + 2  # sync.. + utf8(0) + bs16 + rate16
    buf[fpos + hdr_len] = FL._crc8(bytes(buf[fpos : fpos + hdr_len]))
    with pytest.raises(ValueError, match="flac"):
        FL.decode_flac(bytes(buf))


def test_wasted_bits_and_verbatim_subframe_decode():
    """Hand-built spec frame for the two decode paths the encoder never
    emits together: a VERBATIM subframe with 2 wasted bits (samples
    stored >>2 in bps-2 bits, shifted back on output)."""
    bs = 6
    true_samples = [-1000, 4, 2048, -4, 0, 512]  # multiples of 4
    stored = [s >> 2 for s in true_samples]
    bw = FL._BitWriter()
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b1101)
    hdr.append((0 << 4) | (0b100 << 1))
    hdr += FL._utf8_number(0)
    hdr += struct.pack(">H", bs - 1)
    hdr += struct.pack(">H", 8000)
    hdr.append(FL._crc8(bytes(hdr)))
    bw.put(0, 1)
    bw.put(0b000001, 6)   # VERBATIM
    bw.put(1, 1)          # wasted-bits flag
    bw.put_unary(2 - 1)   # k = 2 wasted bits (unary of k-1)
    for v in stored:
        bw.put(v & 0x3FFF, 14)  # bps - wasted = 14 bits
    bw.align()
    body = bytes(hdr) + bytes(bw.out)
    frame = body + struct.pack(">H", FL._crc16(body))
    si = (struct.pack(">HH", bs, bs) + b"\x00\x00\x00" * 2
          + FL._pack_streaminfo_tail(8000, 1, 16, bs) + b"\x00" * 16)
    buf = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame
    out, _ = FL.decode_flac(buf)
    assert out[:, 0].tolist() == true_samples


def test_corrupt_subframe_guards():
    """Crafted corrupt subframes fail with clear errors, not bare
    ValueError('negative shift count') / nonsense bps (advisor r4)."""
    # LPC subframe (order 1) with a negative quantization shift (-1).
    bw = FL._BitWriter()
    bw.put(0, 1)           # padding bit
    bw.put(32, 6)          # LPC, order = 32 - 31 = 1
    bw.put(0, 1)           # no wasted bits
    bw.put(5 & 0xFFFF, 16)  # warm-up sample, bps=16
    bw.put(3, 4)           # precision-1 = 3 -> prec 4
    bw.put(0b11111, 5)     # shift = -1 (signed 5-bit)
    bw.align()
    br = FL._BitReader(bytes(bw.out) + b"\x00" * 8)
    with pytest.raises(ValueError, match="negative qlp shift"):
        FL._decode_subframe(br, 4, 16)
    # Wasted bits >= bps: unary 16 -> wasted 17 on a 16-bit stream.
    bw = FL._BitWriter()
    bw.put(0, 1)
    bw.put(0b000001, 6)    # VERBATIM
    bw.put(1, 1)           # wasted flag
    bw.put_unary(17 - 1)
    bw.align()
    br = FL._BitReader(bytes(bw.out) + b"\x00" * 8)
    with pytest.raises(ValueError, match="wasted bits"):
        FL._decode_subframe(br, 4, 16)
