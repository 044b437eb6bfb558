"""Baseline grayscale JPEG codec tests — spec-anchored bitstream
vector, DCT exactness, roundtrip PSNR matrix, DRI/RSTn, 16-bit DQT,
and explicit refusals (progressive, color, corrupt streams).

Reference parity: closes the 'jpeg' leg of the multimodal codec
boundary (operators/multimodal.py fmt dispatch).
"""

import struct

import numpy as np
import pytest

from georasters_spark.sources import jpeg as J


def _smooth(h, w, phase=0.0):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return (128 + 90 * np.sin(r / 5.0 + phase) * np.cos(c / 6.0)).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.abs(J._C @ J._C.T - np.eye(8)).max() < 1e-12
    # DCT then IDCT is identity to float precision (pre-quantization)
    rng = np.random.default_rng(0)
    b = rng.random((8, 8)) * 255 - 128
    f = J._C @ b @ J._C.T
    back = J._C.T @ f @ J._C
    assert np.abs(back - b).max() < 1e-10


def test_zigzag_is_the_standard_scan():
    # first and last diagonals of the canonical T.81 order
    assert list(J.ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(J.ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(J.ZIGZAG) == list(range(64))


def test_standard_huffman_codes():
    # spec-known canonical codes: DC category 1 = '010' (len 3),
    # AC EOB (0x00) = '1010' (len 4), AC ZRL (0xF0) = '11111111001' (11)
    assert J._DC_ENC[0] == (0b00, 2)
    assert J._DC_ENC[1] == (0b010, 3)
    assert J._AC_ENC[0x00] == (0b1010, 4)
    assert J._AC_ENC[0x01] == (0b00, 2)
    assert J._AC_ENC[0xF0] == (0b11111111001, 11)


def test_flat_block_matches_hand_derived_bitstream():
    """A flat 8x8 of 130 at quality 50 (Annex K tables unscaled):
    level shift 2 -> DC coeff 16 -> /16 = 1 -> cat-1 '010'+'1',
    all AC zero -> EOB '1010'; ECS = 01011010 = 0x5A. Decoding that
    single DC code must reproduce 130 exactly. This anchors both
    Huffman tables AND the DCT/quant scaling to the spec itself."""
    img = np.full((8, 8), 130, np.uint8)
    buf = J.encode_gray(img, quality=50)
    i = buf.find(b"\xff\xda")
    ln = int.from_bytes(buf[i + 2 : i + 4], "big")
    assert buf[i + 2 + ln : -2] == b"\x5a"
    assert (J.decode_gray(buf) == img).all()


@pytest.mark.parametrize("shape", [(64, 64), (60, 52), (8, 8), (17, 9), (128, 40)])
def test_roundtrip_psnr(shape):
    h, w = shape
    img = _smooth(h, w)
    for q, thresh in [(95, 40), (85, 35), (75, 30), (50, 25)]:
        out = J.decode_gray(J.encode_gray(img, q))
        assert out.shape == (h, w) and out.dtype == np.uint8
        assert J.psnr_u8(img, out) > thresh, (shape, q)
    # higher quality -> no smaller file, no worse psnr (monotone sanity)
    sizes = [len(J.encode_gray(img, q)) for q in (25, 75, 95)]
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_restart_markers_bit_identical_and_dri_parsed():
    img = _smooth(48, 72)
    plain = J.decode_gray(J.encode_gray(img, 90))
    buf = J.encode_gray(img, 90, restart_interval=3)
    assert b"\xff\xdd" in buf  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + k]) in buf for k in range(8))
    assert (J.decode_gray(buf) == plain).all()


def test_sixteen_bit_dqt_parses():
    """Rewrite the 8-bit DQT segment as 16-bit precision (pq=1) —
    decoders must accept both; result is identical."""
    img = _smooth(24, 24)
    buf = J.encode_gray(img, 80)
    i = buf.find(b"\xff\xdb")
    ln = int.from_bytes(buf[i + 2 : i + 4], "big")
    vals = buf[i + 5 : i + 5 + 64]
    seg16 = (b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10"
             + b"".join(struct.pack(">H", v) for v in vals))
    buf16 = buf[:i] + seg16 + buf[i + 2 + ln:]
    assert (J.decode_gray(buf16) == J.decode_gray(buf)).all()


def test_refusals_and_corruption():
    img = _smooth(16, 16)
    buf = J.encode_gray(img, 80)
    with pytest.raises(ValueError, match="SOI"):
        J.decode_gray(b"nope" + buf)
    # flip SOF0 -> SOF2 (progressive)
    i = buf.find(b"\xff\xc0")
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_gray(buf[:i] + b"\xff\xc2" + buf[i + 2:])
    # claim 3 components in SOF0
    bad = bytearray(buf)
    bad[i + 9] = 3
    with pytest.raises(NotImplementedError, match="color"):
        J.decode_gray(bytes(bad))
    # truncate the scan mid-stream: either too few blocks decode or the
    # Huffman state desynchronizes — both must raise, never hang
    with pytest.raises(ValueError):
        J.decode_gray(buf[: len(buf) // 2])
    with pytest.raises(ValueError):
        J.encode_gray(np.zeros((4, 4, 3), np.uint8))


def test_decode_any_dispatch():
    from georasters_spark.operators import multimodal as MM

    img = _smooth(32, 48)
    out = MM.decode_any(J.encode_gray(img, 95), "jpeg", 48, 32)
    assert out.shape == (32, 48)
    assert J.psnr_u8(img, out.astype(np.uint8)) > 40
    with pytest.raises(NotImplementedError):
        MM.decode_any(b"xx", "webp", 1, 1)
