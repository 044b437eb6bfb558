"""QOI codec (sources/qoi.py): roundtrip matrix, per-op coverage
(index/diff/luma/run/rgb/rgba), hand-built spec vectors, error paths."""

import struct

import numpy as np
import pytest

from georasters_spark.sources import qoi


@pytest.mark.parametrize("nch", [3, 4])
def test_random_roundtrip(nch):
    rng = np.random.default_rng(nch)
    a = rng.integers(0, 256, (29, 41, nch), dtype=np.uint8)
    img, meta = qoi.decode(qoi.encode(a))
    assert (img == a).all()
    assert meta["channels"] == nch and meta["w"] == 41 and meta["h"] == 29


def test_run_lengths_split_at_62():
    a = np.zeros((3, 100, 4), np.uint8)
    a[..., 3] = 255  # equals the (0,0,0,255) start pixel: pure runs
    buf = qoi.encode(a)
    body = buf[14:-8]
    # 300 px = 62+62+62+62+52: five RUN chunks, nothing else
    assert list(body) == [0xC0 | 61] * 4 + [0xC0 | 51]
    assert (qoi.decode(buf)[0] == a).all()


def test_diff_and_luma_ops():
    # gradient steps of +1 per channel stay in DIFF range; bigger green
    # steps with small dr-dg/db-dg hit LUMA
    g = (np.arange(64, dtype=np.int64) * 5) % 256
    a = np.stack([g, (g + 3) % 256, (g + 7) % 256], -1).astype(
        np.uint8).reshape(1, 64, 3)
    buf = qoi.encode(a)
    assert (qoi.decode(buf)[0] == a).all()
    ops = {b >> 6 for b in buf[14:-8] if b not in (0xFE, 0xFF)}
    assert 2 in ops  # LUMA present


def test_index_op_reuses_seen_pixels():
    # two alternating colors -> after first sight, INDEX ops
    a = np.zeros((1, 8, 3), np.uint8)
    a[0, ::2] = (10, 20, 30)
    a[0, 1::2] = (200, 100, 50)
    buf = qoi.encode(a)
    assert (qoi.decode(buf)[0] == a).all()
    n_index = sum(1 for b in buf[14:-8] if b >> 6 == 0)
    assert n_index >= 6


def test_alpha_change_needs_rgba_op():
    a = np.zeros((1, 2, 4), np.uint8)
    a[0, 0] = (5, 6, 7, 255)
    a[0, 1] = (5, 6, 7, 128)
    buf = qoi.encode(a)
    assert 0xFF in buf[14:-8]
    assert (qoi.decode(buf)[0] == a).all()


def test_wrapping_diff_matches_spec():
    """0 -> 255 is dr = -1 (wraparound), a DIFF chunk per the spec."""
    a = np.array([[[255, 0, 0]]], np.uint8)
    buf = qoi.encode(a)
    exp = (b"qoif" + struct.pack(">IIBB", 1, 1, 3, 0)
           + bytes([0x40 | (1 << 4) | (2 << 2) | 2])
           + b"\x00" * 7 + b"\x01")
    assert buf == exp
    assert (qoi.decode(buf)[0] == a).all()


def test_hand_built_decode_vector():
    """Decoder-only path: INDEX referencing the zero-initialized table
    slot (0,0,0,0) — encoders never emit it, the spec allows it."""
    # px0 = RGB(1,2,3) -> hash(1,2,3,255) slot; px1 = INDEX(0) -> (0,0,0,0)
    body = bytes([0xFE, 1, 2, 3, 0x00])
    buf = (b"qoif" + struct.pack(">IIBB", 2, 1, 4, 0) + body
           + b"\x00" * 7 + b"\x01")
    img, _ = qoi.decode(buf)
    assert img.shape == (1, 2, 4)
    assert tuple(img[0, 0]) == (1, 2, 3, 255)
    assert tuple(img[0, 1]) == (0, 0, 0, 0)


@pytest.mark.parametrize("mut, msg", [
    (lambda b: b"qoix" + b[4:], "magic"),
    (lambda b: b[:14], "truncated"),
    (lambda b: b[:-8] + b"\x00" * 7 + b"\x02", "end marker"),
])
def test_decode_errors(mut, msg):
    buf = qoi.encode(np.full((4, 4, 3), 9, np.uint8))
    with pytest.raises(ValueError, match=msg):
        qoi.decode(mut(buf))


def test_decode_midstream_truncation():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)  # incompressible
    buf = qoi.encode(a)
    with pytest.raises(ValueError, match="before last pixel"):
        qoi.decode(buf[: len(buf) // 2] + b"\x00" * 7 + b"\x01")


def test_encode_errors():
    with pytest.raises(ValueError, match="uint8"):
        qoi.encode(np.zeros((2, 2, 3), np.int16))
    with pytest.raises(ValueError, match="h, w"):
        qoi.encode(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="colorspace"):
        qoi.encode(np.zeros((2, 2, 3), np.uint8), colorspace=2)


def test_run_overflow_rejected():
    a = np.zeros((1, 3, 3), np.uint8)
    buf = bytearray(qoi.encode(a))
    # encoder emits RUN(3) = 0xC2; bump to RUN(5) -> overflows 3 px
    pos = buf.index(0xC0 | 2, 14)
    buf[pos] = 0xC0 | 4
    with pytest.raises(ValueError, match="run overflows"):
        qoi.decode(bytes(buf))
