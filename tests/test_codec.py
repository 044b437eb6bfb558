"""Codec roundtrips + the PSNR>=40dB lossy gate (BASELINE.json input_hint)."""

import numpy as np

from georasters_spark.sources import codec, synth

NDV = -9999.0


def _tile():
    return synth.tile_array(synth.T1, 1, 2)


def test_raw16_roundtrip():
    a = _tile()
    d = codec.decode_tile(codec.encode_tile(a, "raw16", NDV), "raw16", 64, 64, NDV)
    assert np.array_equal(np.asarray(d, dtype=np.int16), a)


def test_png_roundtrip_lossless():
    a = _tile()
    d = codec.decode_tile(codec.encode_tile(a, "png", NDV), "png", 64, 64, NDV)
    assert np.array_equal(np.asarray(d, dtype=np.int16), a)
    assert codec.psnr(a, np.asarray(d, dtype=np.float64), NDV) == float("inf")


def test_rawf32_roundtrip():
    a = _tile().astype(np.float32)
    d = codec.decode_tile(codec.encode_tile(a, "rawf32", NDV), "rawf32", 64, 64, NDV)
    assert np.array_equal(np.asarray(d, dtype=np.float32), a)


def test_q8_psnr_gate():
    """q8 is lossy: ndv cells restored exactly, valid cells PSNR >= 40dB."""
    a = _tile()
    d = codec.decode_tile(codec.encode_tile(a, "q8", NDV), "q8", 64, 64, NDV)
    assert np.array_equal(d == NDV, a == NDV)  # mask survives exactly
    assert codec.psnr(a, d, NDV) >= 40.0


def test_caption_checksum_invariant(spark, images_t1):
    """input_hint per-row invariant: the caption's embedded checksum
    equals the decoded tile's valid-pixel sum (caption equality is then
    implied by decoded-pixel equality end-to-end)."""
    rows = images_t1.select("image_id", "caption", "bytes", "fmt", "w", "h", "ndv").collect()
    assert len(rows) == 45
    for r in rows:
        dec = codec.decode_tile(bytes(r["bytes"]), r["fmt"], r["w"], r["h"], r["ndv"])
        s = int(np.asarray(dec, dtype=np.int64)[np.asarray(dec) != r["ndv"]].sum())
        assert r["caption"].endswith(f"sum={s}"), (r["image_id"], r["caption"], s)


def test_phash_deterministic_and_discriminative():
    a, b = synth.tile_array(synth.T1, 0, 0), synth.tile_array(synth.T1, 2, 3)
    assert codec.average_hash(a, NDV) == codec.average_hash(a.copy(), NDV)
    assert codec.average_hash(a, NDV) != codec.average_hash(b, NDV)


def test_phash_small_tiles():
    """Tiles smaller than the 8x8 hash grid (clip/assemble emit arbitrary
    sizes) zero-pad instead of crashing, and padding is consistent: a
    5x7 tile hashes like its 8x8 zero-padded image."""
    rng = np.arange(35, dtype=np.int16).reshape(5, 7)
    h = codec.average_hash(rng, NDV)
    padded = np.zeros((8, 8), dtype=np.int16)
    padded[:5, :7] = rng
    assert h == codec.average_hash(padded, NDV)
    # degenerate 1xN strip also works
    assert isinstance(codec.average_hash(np.ones((1, 3), dtype=np.int16), NDV), int)
