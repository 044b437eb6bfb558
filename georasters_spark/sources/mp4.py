"""Real ISO-BMFF (MP4, ISO/IEC 14496-12) container codec, pure stdlib.

Shrinks the multimodal 'mp4' leg from a declared stub to a REAL
demuxer-level implementation (reference analog: the reference library
reads every format through GDAL/ffmpeg-backed stacks,
georasters.py:281-291; here the CONTAINER layer is implemented from the
public spec and only the coded-frame *payload* decode remains the stub
boundary — no video codec libraries exist in this environment):

reader (``parse_mp4``):
  * box walk with 32-bit and 64-bit (largesize) box sizes
  * ftyp (brands), mvhd (movie timescale/duration, version 0 and 1)
  * per-trak: tkhd (track id, 16.16 fixed-point dims), mdhd
    (media timescale/duration), hdlr (handler type), stsd (codec
    fourcc), stts (decode timestamps), stsz (sample sizes),
    stsc x stco/co64 (sample-to-chunk -> absolute file offsets),
    stss (sync samples)
  * ``sample_table(track)`` resolves the stsc/stco/stsz triplet into
    one absolute (offset, size, pts, is_sync) row per sample — the
    real demuxer work a frame-sampling pipeline needs before any
    codec runs

writer (``build_minimal_mp4``): a valid single-video-track MP4
(ftyp | mdat | moov with full stbl) used as the deterministic fixture
generator for tests and the ``mp4_samples`` gate — sample sizes and
payload bytes come from integer formulas, so a DuckDB oracle can
re-derive every byte offset (header + running sum of sizes) and
payload checksum without parsing anything.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8].decode("latin1")
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"mp4: box {fourcc!r} size {size} out of range")
        yield fourcc, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: str):
    for fc, a, b in _walk(buf, start, end):
        if fc == fourcc:
            return a, b
    return None


def _fullbox(buf: bytes, a: int) -> tuple[int, int, int]:
    """(version, flags, body_start_after_fullbox_header)."""
    version = buf[a]
    flags = int.from_bytes(buf[a + 1 : a + 4], "big")
    return version, flags, a + 4


@dataclass
class Mp4Track:
    track_id: int
    handler: str
    codec: str
    timescale: int
    duration: int  # in media timescale units
    width: float
    height: float
    sample_sizes: list = field(default_factory=list)
    sample_deltas: list = field(default_factory=list)  # (count, delta) runs
    chunk_offsets: list = field(default_factory=list)
    sample_to_chunk: list = field(default_factory=list)  # (first_chunk, per_chunk, desc_idx)
    sync_samples: list | None = None  # None = every sample is sync

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0

    def sample_table(self) -> list[tuple[int, int, int, bool]]:
        """One (byte_offset, byte_size, pts_units, is_sync) per sample —
        the stsc x stco x stsz resolution (14496-12 §8.7)."""
        out = []
        # expand sample-to-chunk runs to per-chunk sample counts
        stc = self.sample_to_chunk
        nchunks = len(self.chunk_offsets)
        per_chunk = []
        for i, (first, count, _desc) in enumerate(stc):
            last = stc[i + 1][0] - 1 if i + 1 < len(stc) else nchunks
            per_chunk.extend([count] * (last - first + 1))
        # decode timestamps from stts runs
        pts = []
        t = 0
        for count, delta in self.sample_deltas:
            for _ in range(count):
                pts.append(t)
                t += delta
        sync = set(self.sync_samples) if self.sync_samples is not None else None
        si = 0
        for ci, off in enumerate(self.chunk_offsets):
            pos = off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= len(self.sample_sizes):
                    break
                size = self.sample_sizes[si]
                is_sync = sync is None or (si + 1) in sync  # stss is 1-based
                out.append((pos, size, pts[si] if si < len(pts) else 0, is_sync))
                pos += size
                si += 1
        if si != len(self.sample_sizes):
            raise ValueError(
                f"mp4: sample table inconsistent ({si}/{len(self.sample_sizes)} "
                "samples placed in chunks)")
        return out


@dataclass
class Mp4Info:
    major_brand: str
    movie_timescale: int
    movie_duration: int
    tracks: list

    @property
    def duration_ms(self) -> int:
        return (self.movie_duration * 1000 // self.movie_timescale
                if self.movie_timescale else 0)


def parse_mp4(buf: bytes) -> Mp4Info:
    """Parse the container structure of an ISO-BMFF file."""
    top = list(_walk(buf, 0, len(buf)))
    fourccs = [fc for fc, _a, _b in top]
    if "ftyp" not in fourccs or "moov" not in fourccs:
        raise ValueError("not an ISO-BMFF/MP4 file (missing ftyp/moov)")
    major = ""
    mts = mdur = 0
    tracks: list[Mp4Track] = []
    for fc, a, b in top:
        if fc == "ftyp":
            major = buf[a : a + 4].decode("latin1")
        elif fc == "moov":
            for fc2, a2, b2 in _walk(buf, a, b):
                if fc2 == "mvhd":
                    v, _fl, p = _fullbox(buf, a2)
                    if v == 1:
                        _c, _m, mts, mdur = struct.unpack_from(">QQIQ", buf, p)
                    else:
                        _c, _m, mts, mdur = struct.unpack_from(">IIII", buf, p)
                elif fc2 == "trak":
                    tracks.append(_parse_trak(buf, a2, b2))
    return Mp4Info(major, mts, mdur, tracks)


def _parse_trak(buf: bytes, a: int, b: int) -> Mp4Track:
    tid = 0
    width = height = 0.0
    handler = codec = ""
    timescale = duration = 0
    sizes: list[int] = []
    deltas: list[tuple[int, int]] = []
    offsets: list[int] = []
    stc: list[tuple[int, int, int]] = []
    sync = None
    tk = _find(buf, a, b, "tkhd")
    if tk:
        v, _fl, p = _fullbox(buf, tk[0])
        if v == 1:  # creation(8) modification(8) id(4) rsvd(4) duration(8)
            tid = struct.unpack_from(">I", buf, p + 16)[0]
            p2 = p + 32
        else:  # creation(4) modification(4) id(4) rsvd(4) duration(4)
            tid = struct.unpack_from(">I", buf, p + 8)[0]
            p2 = p + 20
        # 2x32 reserved, 2x16 layer/group, 16 volume, 16 pad, 36 matrix
        wh = p2 + 8 + 8 + 36
        w_fx, h_fx = struct.unpack_from(">II", buf, wh)
        width, height = w_fx / 65536.0, h_fx / 65536.0
    mdia = _find(buf, a, b, "mdia")
    if mdia is None:
        raise ValueError("mp4: trak without mdia")
    md = _find(buf, *mdia, "mdhd")
    if md:
        v, _fl, p = _fullbox(buf, md[0])
        if v == 1:
            _c, _m, timescale, duration = struct.unpack_from(">QQIQ", buf, p)
        else:
            _c, _m, timescale, duration = struct.unpack_from(">IIII", buf, p)
    hd = _find(buf, *mdia, "hdlr")
    if hd:
        handler = buf[hd[0] + 8 : hd[0] + 12].decode("latin1")
    minf = _find(buf, *mdia, "minf")
    stbl = _find(buf, *minf, "stbl") if minf else None
    if stbl is None:
        raise ValueError("mp4: trak without stbl")
    for fc, p0, p1 in _walk(buf, *stbl):
        v, _fl, p = _fullbox(buf, p0) if fc != "stsd" else (0, 0, p0 + 4)
        if fc == "stsd":
            (n,) = struct.unpack_from(">I", buf, p)
            if n >= 1:
                codec = buf[p + 8 : p + 12].decode("latin1")
        elif fc == "stts":
            (n,) = struct.unpack_from(">I", buf, p)
            for i in range(n):
                c, d = struct.unpack_from(">II", buf, p + 4 + 8 * i)
                deltas.append((c, d))
        elif fc == "stsz":
            uniform, n = struct.unpack_from(">II", buf, p)
            if uniform:
                sizes = [uniform] * n
            else:
                sizes = list(struct.unpack_from(f">{n}I", buf, p + 8))
        elif fc == "stsc":
            (n,) = struct.unpack_from(">I", buf, p)
            for i in range(n):
                f, c, d = struct.unpack_from(">III", buf, p + 4 + 12 * i)
                stc.append((f, c, d))
        elif fc == "stco":
            (n,) = struct.unpack_from(">I", buf, p)
            offsets = list(struct.unpack_from(f">{n}I", buf, p + 4))
        elif fc == "co64":
            (n,) = struct.unpack_from(">I", buf, p)
            offsets = list(struct.unpack_from(f">{n}Q", buf, p + 4))
        elif fc == "stss":
            (n,) = struct.unpack_from(">I", buf, p)
            sync = list(struct.unpack_from(f">{n}I", buf, p + 4))
    return Mp4Track(tid, handler, codec, timescale, duration, width, height,
                    sizes, deltas, offsets, stc, sync)


# ---------------------------------------------------------------------------
# Minimal writer (fixture generator)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


#: fixed prefix layout so oracles can compute absolute offsets:
#: ftyp(24) + mdat header(8) -> first sample at byte 32
FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
MDAT_PAYLOAD_START = len(FTYP) + 8


def build_minimal_mp4(
    sample_payloads: list[bytes],
    *,
    timescale: int = 90000,
    sample_delta: int = 3000,  # 30 fps at 90 kHz
    width: int = 640,
    height: int = 360,
    codec: str = "avc1",
    sync_every: int = 10,
    samples_per_chunk: int = 7,
) -> bytes:
    """A valid single-video-track MP4: ftyp | mdat | moov. Samples are
    grouped `samples_per_chunk` per chunk (exercising the stsc x stco
    resolution), every `sync_every`-th sample is a keyframe (stss)."""
    n = len(sample_payloads)
    sizes = [len(p) for p in sample_payloads]
    mdat = _box(b"mdat", b"".join(sample_payloads))
    duration = n * sample_delta

    # chunk layout: fixed-size runs, last chunk may be short
    nchunks = -(-n // samples_per_chunk)
    chunk_offsets = []
    pos = MDAT_PAYLOAD_START
    si = 0
    for _c in range(nchunks):
        chunk_offsets.append(pos)
        for _ in range(min(samples_per_chunk, n - si)):
            pos += sizes[si]
            si += 1

    entry_body = (
        codec.encode("ascii")
        + b"\x00" * 6 + struct.pack(">H", 1)           # reserved + data ref
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)   # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)           # frame count
        + b"\x00" * 32                                 # compressor name
        + struct.pack(">Hh", 24, -1)                   # depth, color table
    )
    # declared size MUST equal the real entry length (86 for a
    # standard VisualSampleEntry) or conformant readers overrun stsd
    stsd_entry = struct.pack(">I", len(entry_body) + 4) + entry_body
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes))
    if nchunks > 1 and n % samples_per_chunk:
        stsc_runs = [(1, samples_per_chunk, 1), (nchunks, n % samples_per_chunk, 1)]
    elif nchunks == 1:
        # single (possibly short) chunk: ONE run — two runs with the
        # same first_chunk would violate stsc's strictly-increasing rule
        stsc_runs = [(1, n, 1)]
    else:
        stsc_runs = [(1, samples_per_chunk, 1)]
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                 + b"".join(struct.pack(">III", *r) for r in stsc_runs))
    stco = _full(b"stco", 0, 0, struct.pack(">I", nchunks)
                 + struct.pack(f">{nchunks}I", *chunk_offsets))
    syncs = list(range(1, n + 1, sync_every))
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(syncs))
                 + struct.pack(f">{len(syncs)}I", *syncs))
    stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco + stss)

    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">HH", 0x55C4, 0))  # 'und' language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">III", 0, 0, 1) + b"\x00" * 4
                 + struct.pack(">I", duration) + b"\x00" * 8
                 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return FTYP + mdat + moov


def extract_samples(buf: bytes, track_idx: int = 0):
    """(info, [(sample_idx, offset, size, pts_ms, is_sync, payload)]):
    the real demuxer surface — resolve the sample table and slice the
    coded-frame payloads out of mdat. Decoding a payload is the stub
    boundary (no video codec libraries in this environment)."""
    info = parse_mp4(buf)
    if not info.tracks:
        raise ValueError("mp4: no tracks")
    tr = info.tracks[track_idx]
    out = []
    for i, (off, size, pts, is_sync) in enumerate(tr.sample_table()):
        if off + size > len(buf):
            raise ValueError(f"mp4: sample {i} reaches past end of file")
        pts_ms = pts * 1000 // tr.timescale if tr.timescale else 0
        out.append((i, off, size, pts_ms, is_sync, buf[off : off + size]))
    return info, out
