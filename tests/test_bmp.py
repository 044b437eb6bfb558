"""BMP codec (sources/bmp.py): roundtrip matrix (8-bit palette plain +
RLE8, 24/32-bit, bottom-up/top-down), RLE escapes, error paths."""

import numpy as np
import pytest

from georasters_spark.sources import bmp


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [False, True])
def test_8bit_roundtrip(rle, top_down):
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (23, 37), dtype=np.uint8)
    img, meta = bmp.decode(bmp.encode(idx, pal, rle=rle, top_down=top_down))
    assert (img == idx).all()
    assert (meta["palette"][:16] == pal).all() and meta["bpp"] == 8


def test_rle_long_runs_and_solid():
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    runs = np.repeat(np.arange(4, dtype=np.uint8), 700).reshape(20, 140)
    assert (bmp.decode(bmp.encode(runs, pal, rle=True))[0] == runs).all()
    solid = np.zeros((7, 300), dtype=np.uint8)  # run > 255 splits
    assert (bmp.decode(bmp.encode(solid, pal, rle=True))[0] == solid).all()


def test_rle_absolute_and_delta_decode():
    """Hand-built RLE stream exercising absolute mode + delta escape
    (the encoder never emits them — decoder-only spec coverage)."""
    # 4x6: abs run [1,2,3] at (0,0); delta +1,+1; run 2x7 at (1,4); EOB
    data = bytes([0, 3, 1, 2, 3, 0,   # absolute, padded to word
                  0, 2, 1, 1,          # delta dx=1 dy=1
                  2, 7,                # run
                  0, 1])               # end of bitmap
    pal = np.zeros((8, 3), dtype=np.uint8)
    hdr = bmp.encode(np.zeros((4, 6), dtype=np.uint8), pal, rle=True)
    # splice our stream into the container (data offset from header)
    import struct
    data_off = struct.unpack_from("<I", hdr, 10)[0]
    buf = bytearray(hdr[:data_off]) + data
    struct.pack_into("<I", buf, 2, len(buf))
    img, _ = bmp.decode(bytes(buf))
    exp = np.zeros((4, 6), dtype=np.uint8)
    exp[3, 0:3] = [1, 2, 3]  # bottom-up: RLE row 0 = image row 3
    exp[2, 4:6] = 7          # delta -> x=4, y=1; run of 2 -> cols 4,5
    assert (img == exp).all()


@pytest.mark.parametrize("nch", [3, 4])
def test_truecolor_roundtrip(nch):
    rng = np.random.default_rng(nch)
    a = rng.integers(0, 256, (19, 31, nch), dtype=np.uint8)
    img, meta = bmp.decode(bmp.encode(a))
    assert (img == a).all() and meta["bpp"] == nch * 8
    img2, _ = bmp.decode(bmp.encode(a, top_down=True))
    assert (img2 == a).all()


def test_errors():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, (4, 4), dtype=np.uint8)
    rgb = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="signature"):
        bmp.decode(b"XX" + bytes(60))
    with pytest.raises(ValueError, match="palette"):
        bmp.encode(idx)
    with pytest.raises(ValueError, match="RLE8"):
        bmp.encode(rgb, rle=True)
    with pytest.raises(ValueError, match="truncated"):
        bmp.decode(bmp.encode(rgb)[:-20])
    with pytest.raises(ValueError, match="index outside"):
        bmp.encode(np.full((2, 2), 9, dtype=np.uint8), pal)
