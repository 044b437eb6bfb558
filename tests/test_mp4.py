"""ISO-BMFF (MP4) container codec tests — box walk, sample-table
resolution (stsc x stco x stsz), keyframes, payload extraction, and the
Spark demux operator. Reference parity: shrinks the 'mp4' multimodal
leg to a real demuxer with only coded-frame decode stubbed
(operators/multimodal.py fmt dispatch)."""

import struct

import numpy as np
import pytest

from georasters_spark.sources import mp4 as M


def _payloads(v, n):
    return [bytes((v + i * 7 + k) % 256
                  for k in range(50 + ((v * 31 + i * 17) % 200)))
            for i in range(n)]


def test_build_parse_roundtrip_exact():
    payloads = _payloads(3, 33)
    buf = M.build_minimal_mp4(payloads)
    info, samples = M.extract_samples(buf)
    assert info.major_brand == "isom"
    tr = info.tracks[0]
    assert (tr.handler, tr.codec) == ("vide", "avc1")
    assert (tr.width, tr.height) == (640.0, 360.0)
    assert tr.n_samples == 33 and tr.timescale == 90000
    assert info.duration_ms == 33 * 3000 * 1000 // 90000
    pos = M.MDAT_PAYLOAD_START
    for i, (si, off, size, pts_ms, is_sync, payload) in enumerate(samples):
        assert si == i and off == pos
        assert payload == payloads[i]
        assert is_sync == (i % 10 == 0)  # stss every 10th, 1-based
        assert pts_ms == i * 3000 * 1000 // 90000
        pos += size


def test_chunk_grouping_resolution():
    """7-samples-per-chunk stsc runs (incl. a short last chunk) must
    resolve to contiguous offsets inside each chunk and the recorded
    stco offset at each chunk start."""
    payloads = _payloads(5, 20)  # 2 full chunks of 7 + short chunk of 6
    buf = M.build_minimal_mp4(payloads, samples_per_chunk=7)
    info, samples = M.extract_samples(buf)
    tr = info.tracks[0]
    assert len(tr.chunk_offsets) == 3
    # chunk boundaries: sample 0, 7, 14 start exactly at stco entries
    for ci, first_sample in enumerate([0, 7, 14]):
        assert samples[first_sample][1] == tr.chunk_offsets[ci]


def test_largesize_and_co64_walk():
    payloads = _payloads(1, 3)
    buf = M.build_minimal_mp4(payloads)
    mdat_body = b"".join(payloads)
    small = M._box(b"mdat", mdat_body)
    i = buf.index(small)
    large = (struct.pack(">I", 1) + b"mdat"
             + struct.pack(">Q", len(mdat_body) + 16) + mdat_body)
    boxes = list(M._walk(large, 0, len(large)))
    assert boxes[0][0] == "mdat" and boxes[0][1] == 16
    assert i > 0  # mdat located in the real file too


def test_refusals():
    with pytest.raises(ValueError):
        M.parse_mp4(b"\x00\x00\x00\x08free")  # no ftyp/moov
    buf = M.build_minimal_mp4(_payloads(2, 5))
    with pytest.raises(ValueError):
        M.parse_mp4(buf[:40])  # truncated box
    # a sample reaching past EOF must refuse, not return short bytes
    with pytest.raises(ValueError):
        M.extract_samples(buf[:-10])


def test_video_samples_operator(spark):
    from pyspark.sql import functions as F

    from georasters_spark.operators import multimodal as MM

    rows = [(v, M.build_minimal_mp4(_payloads(v, 12 + v % 9)))
            for v in range(6)]
    videos = spark.createDataFrame(rows, "video_id long, bytes binary")
    out = MM.video_samples(videos).toPandas().sort_values(
        ["video_id", "sample_idx"]).reset_index(drop=True)
    for v in range(6):
        sub = out[out.video_id == v]
        n = 12 + v % 9
        assert len(sub) == n
        exp_sizes = [50 + ((v * 31 + i * 17) % 200) for i in range(n)]
        assert sub.byte_size.tolist() == exp_sizes
        assert sub.byte_offset.tolist() == [
            M.MDAT_PAYLOAD_START + int(np.cumsum([0] + exp_sizes)[i])
            for i in range(n)]
        exp_ck = [sum((v + i * 7 + k) % 256 for k in range(exp_sizes[i]))
                  for i in range(n)]
        assert sub.checksum.tolist() == exp_ck


def test_stsd_entry_size_consistent_and_single_chunk_stsc():
    """Code-review regressions: the VisualSampleEntry's declared size
    must equal its real length (86), and a single-chunk file must emit
    ONE stsc run (two runs with equal first_chunk violate the spec)."""
    buf = M.build_minimal_mp4(_payloads(4, 5), samples_per_chunk=7)
    # locate stsd: its entry size field must match the entry bytes
    i = buf.index(b"stsd")
    n_entries = struct.unpack_from(">I", buf, i + 8)[0]
    entry_size = struct.unpack_from(">I", buf, i + 12)[0]
    assert n_entries == 1 and entry_size == 86
    assert buf[i + 16 : i + 20] == b"avc1"
    info, samples = M.extract_samples(buf)
    tr = info.tracks[0]
    assert len(tr.sample_to_chunk) == 1
    assert tr.sample_to_chunk[0] == (1, 5, 1)
    assert len(samples) == 5


def test_video_frames_mjpeg_end_to_end(spark):
    """No stub anywhere: spec-built MJPEG mp4 -> real demux -> real
    JPEG decode; pixel sums equal decoding the payloads directly, and
    an inter-frame codec fourcc refuses."""
    from georasters_spark.operators import multimodal as MM
    from georasters_spark.sources import jpeg as J

    def frame(v, i, h=32, w=48):
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        return (128 + 90 * np.sin(r / 5.0 + v * 0.3 + i * 0.17)
                * np.cos(c / 6.0)).astype(np.uint8)

    rows = []
    for v in range(3):
        payloads = [J.encode_gray(frame(v, i), 90) for i in range(12)]
        rows.append((v, M.build_minimal_mp4(payloads, codec="mjpg",
                                            sync_every=3)))
    videos = spark.createDataFrame(rows, "video_id long, bytes binary")
    out = (MM.video_frames(videos, n_frames=4).toPandas()
           .sort_values(["video_id", "frame_idx"]))
    assert len(out) == 12 and (out.w == 48).all() and (out.h == 32).all()
    assert out.sample_idx.tolist() == [0, 3, 6, 9] * 3
    for t in out.itertuples(index=False):
        img = J.decode_gray(J.encode_gray(frame(t.video_id, t.sample_idx), 90))
        assert t.px_sum == int(img.astype(np.int64).sum())
    # avc1 fourcc refuses (inter-frame codecs are the stub boundary)
    avc = spark.createDataFrame(
        [(9, M.build_minimal_mp4([b"\x00" * 50], codec="avc1"))],
        "video_id long, bytes binary")
    with pytest.raises(Exception, match="Motion-JPEG|NotImplemented"):
        MM.video_frames(avc).collect()


def test_version1_boxes_parse():
    """mvhd/tkhd/mdhd version-1 (64-bit time) layouts — the writer
    emits v0, so v1 is built here by rewrapping a v0 file's stbl under
    v1 headers (stco offsets stay valid: ftyp+mdat are unchanged)."""
    payloads = _payloads(6, 9)
    buf0 = M.build_minimal_mp4(payloads)
    base = M.extract_samples(buf0)[1]
    # locate moov -> trak -> mdia children in the v0 file
    moov = [b for b in M._walk(buf0, 0, len(buf0)) if b[0] == "moov"][0]
    trak = [b for b in M._walk(buf0, moov[1], moov[2]) if b[0] == "trak"][0]
    mdia = [b for b in M._walk(buf0, trak[1], trak[2]) if b[0] == "mdia"][0]
    kids = {fc: buf0[a - 8: b] for fc, a, b in M._walk(buf0, mdia[1], mdia[2])}
    dur = 9 * 3000
    mdhd1 = M._full(b"mdhd", 1, 0,
                    struct.pack(">QQIQ", 0, 0, 90000, dur)
                    + struct.pack(">HH", 0x55C4, 0))
    tkhd1 = M._full(b"tkhd", 1, 7,
                    struct.pack(">QQI", 0, 0, 1) + b"\x00" * 4
                    + struct.pack(">Q", dur) + b"\x00" * 8
                    + struct.pack(">HHHH", 0, 0, 0, 0)
                    + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                  0x40000000)
                    + struct.pack(">II", 640 << 16, 360 << 16))
    mvhd1 = M._full(b"mvhd", 1, 0,
                    struct.pack(">QQIQ", 0, 0, 90000, dur)
                    + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                    + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                  0x40000000)
                    + b"\x00" * 24 + struct.pack(">I", 2))
    mdia1 = M._box(b"mdia", mdhd1 + kids["hdlr"] + kids["minf"])
    moov1 = M._box(b"moov", mvhd1 + M._box(b"trak", tkhd1 + mdia1))
    i = buf0.index(b"moov") - 4
    buf1 = buf0[:i] + moov1
    info, samples = M.extract_samples(buf1)
    tr = info.tracks[0]
    assert info.movie_timescale == 90000 and tr.track_id == 1
    assert (tr.width, tr.height) == (640.0, 360.0)
    assert [(s[1], s[2]) for s in samples] == [(s[1], s[2]) for s in base]
