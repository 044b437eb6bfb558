"""GIF codec (sources/gif.py): hand-derived LZW fixture, lossless
roundtrip matrix incl. dictionary reset + KwKwK + interlace, animation
compositing (transparency/disposal), error paths, fuzz."""

import numpy as np
import pytest

from georasters_spark.sources import gif


def test_spec_fixture_hand_derived_lzw():
    """A GIF built BY HAND with an LZW stream derived on paper:
    image [1,1,1,1], min code size 2 -> codes CLEAR(4),1,6,1,END(5)
    at width 3, LSB-first packed = bytes 0x8C 0x53. Validates the
    decoder (bit order, width handling, dictionary growth) against
    the spec itself, not this module's encoder."""
    buf = (
        b"GIF89a"
        + bytes([4, 0, 1, 0])          # logical screen 4x1
        + bytes([0x80, 0, 0])          # GCT flag, 2 entries
        + bytes([0, 0, 0, 255, 255, 255])  # palette
        + b"\x2c" + bytes([0, 0, 0, 0, 4, 0, 1, 0, 0])  # image desc 4x1
        + bytes([2])                   # LZW min code size
        + bytes([2, 0x8C, 0x53, 0])    # one 2-byte sub-block
        + b"\x3b"
    )
    g = gif.parse(buf)
    assert g["w"] == 4 and g["h"] == 1 and g["version"] == "89a"
    assert (g["frames"][0]["indices"] == [[1, 1, 1, 1]]).all()


@pytest.mark.parametrize("npal", [2, 4, 16, 93, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip(npal, interlace):
    rng = np.random.default_rng(npal)
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, (29, 37), dtype=np.uint8)
    g = gif.parse(gif.encode(idx, pal, interlace=interlace))
    fr = g["frames"][0]
    assert (fr["indices"] == idx).all()
    assert (fr["palette"][:npal] == pal).all()
    assert fr["interlace"] == interlace


def test_dictionary_reset_on_large_image():
    """>4096 LZW entries forces the encoder's CLEAR-and-reset path and
    the decoder's table rebuild."""
    rng = np.random.default_rng(1)
    big = rng.integers(0, 256, (120, 200), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert (gif.parse(gif.encode(big, pal))["frames"][0]["indices"] == big).all()


def test_kwkwk_and_solid():
    rng = np.random.default_rng(2)
    pal8 = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    runs = np.repeat(np.arange(8, dtype=np.uint8), 500).reshape(40, 100)
    assert (gif.parse(gif.encode(runs, pal8))["frames"][0]["indices"] == runs).all()
    solid = np.zeros((33, 47), dtype=np.uint8)
    assert (gif.parse(gif.encode(solid, pal8))["frames"][0]["indices"] == solid).all()


def test_animation_compositing():
    """Multi-frame + transparency: a frame's transparent pixels show
    the previous canvas (disposal 1), delays round-trip, and the
    composited RGBA canvases match a direct numpy mirror."""
    rng = np.random.default_rng(3)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    frames = [rng.integers(0, 4, (16, 16), dtype=np.uint8) for _ in range(5)]
    buf = gif.encode(frames, pal, transparent=3, delays_cs=[2, 4, 6, 8, 10])
    g = gif.parse(buf)
    assert [f["delay_cs"] for f in g["frames"]] == [2, 4, 6, 8, 10]
    for f, orig in zip(g["frames"], frames):
        assert (f["indices"] == orig).all()
    canvases = gif.decode_frames(buf)
    assert len(canvases) == 5 and canvases[0].shape == (16, 16, 4)
    # numpy mirror: last non-transparent frame wins per pixel
    canvas = np.zeros((16, 16, 4), dtype=np.uint8)
    for k, fr in enumerate(frames):
        opaque = fr != 3
        canvas[opaque, :3] = pal[fr[opaque]]
        canvas[opaque, 3] = 255
        assert (canvases[k] == canvas).all(), k


def test_disposal_restore_background_and_previous():
    pal = np.array([[10, 10, 10], [200, 200, 200], [7, 8, 9]],
                   dtype=np.uint8)
    opaque0 = np.zeros((4, 4), dtype=np.uint8)      # color 0
    transp = np.full((4, 4), 2, dtype=np.uint8)      # all-transparent
    # disposal 2: after frame 0 its region resets to transparent, so
    # frame 1 (all transparent pixels) composites onto BLANK, not f0
    buf = gif.encode([opaque0, transp], pal, transparent=2, disposal=2)
    c = gif.decode_frames(buf)
    assert (c[0][..., 3] == 255).all() and (c[0][..., :3] == 10).all()
    assert (c[1][..., 3] == 0).all()
    # disposal 1 (leave): same frames, frame 1 now shows frame 0
    c1 = gif.decode_frames(
        gif.encode([opaque0, transp], pal, transparent=2, disposal=1))
    assert (c1[1] == c1[0]).all()
    # disposal 3 (restore previous) on the MIDDLE frame only: f1
    # paints color 1 but is rolled back afterwards, so the
    # all-transparent f2 shows f0, not f1
    opaque1 = np.ones((4, 4), dtype=np.uint8)
    c3 = gif.decode_frames(
        gif.encode([opaque0, opaque1, transp], pal, transparent=2,
                   disposal=[1, 3, 1]))
    assert (c3[1][..., :3] == 200).all()
    assert (c3[2] == c3[0]).all()


def test_error_paths():
    pal = np.zeros((4, 3), dtype=np.uint8)
    img = np.zeros((3, 3), dtype=np.uint8)
    good = gif.encode(img, pal)
    with pytest.raises(ValueError, match="signature"):
        gif.parse(b"JIF89a" + good[6:])
    with pytest.raises(ValueError):
        gif.parse(good[:-8])  # truncated sub-blocks
    with pytest.raises(ValueError, match="index outside"):
        gif.encode(np.full((2, 2), 7, dtype=np.uint8), pal[:2])
    with pytest.raises(ValueError, match="palette"):
        gif.encode(img, np.zeros((300, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="no frames"):
        gif.encode([], pal)


def test_fuzz_roundtrip():
    rng = np.random.default_rng(42)
    for t in range(25):
        npal = int(rng.integers(2, 257))
        h = int(rng.integers(1, 50))
        w = int(rng.integers(1, 50))
        idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
        il = bool(rng.integers(0, 2))
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        fr = gif.parse(gif.encode(idx, pal, interlace=il))["frames"][0]
        assert (fr["indices"] == idx).all(), (t, npal, h, w, il)


def test_index_outside_caller_palette_rejected():
    """Indices must be validated against the CALLER's palette length,
    not the power-of-two padded table (code-review fix: index 6 into a
    5-color palette would otherwise encode as black padding)."""
    pal5 = np.arange(15, dtype=np.uint8).reshape(5, 3)
    with pytest.raises(ValueError, match="index outside"):
        gif.encode(np.full((2, 2), 6, dtype=np.uint8), pal5)


def test_decode_any_gif_first_frame_luminance():
    from georasters_spark.operators.multimodal import decode_any

    pal = np.stack([np.arange(16) * 17] * 3, axis=1).astype(np.uint8)
    idx = (np.arange(96, dtype=np.uint8).reshape(8, 12)) % 16
    buf = gif.encode(idx, pal)
    out = decode_any(buf, "gif", 12, 8)
    # gray palette: luminance == index * 17 exactly
    assert out.shape == (8, 12) and (out == idx.astype(np.float64) * 17).all()
