"""Real FLAC codec (fixed-predictor encode, full-featured decode),
pure numpy + stdlib — no libFLAC.

Upgrades the engine's compressed-audio leg from "WAV only" to a REAL
lossless codec implemented from the public FLAC format specification
(datatracks: the classic xiph.org spec / RFC 9639). Because FLAC is
lossless, the round-trip gate is HASH-EXACT — same contract as the
GeoTIFF codec, stronger than the PSNR-audited JPEG gate.

encoder (``encode_flac``): 16-bit mono/stereo (independent channels),
  fixed blocksize; per block, per channel the best of
  CONSTANT / FIXED order 0-4 by residual magnitude; residuals coded
  with partitioned Rice (partition order 0, per-block parameter chosen
  from the residual mean); frame headers with UTF-8 frame numbers,
  CRC-8 (poly 0x07) header and CRC-16 (poly 0x8005) frame checksums;
  STREAMINFO with MD5 of the raw little-endian PCM.

decoder (``decode_flac``): everything the spec's subset-16bit needs —
  CONSTANT, VERBATIM, FIXED 0-4 AND LPC subframes (qlp precision/shift
  /coefficients), wasted bits, Rice methods 0 and 1 incl. the escape
  code, partition orders 0-15, stereo decorrelation (left/side,
  right/side, mid/side), CRC verification of every frame.

Reference parity: the reference library reaches audio through
GDAL/ffmpeg-class stacks (georasters.py:281-291 reads ANY raster the
same way); here the codec itself is from-scratch. mp3 (lossy,
patent-era DCT stack) remains the declared stub boundary.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.n = 0

    def get(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("flac: bitstream exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def get_signed(self, bits: int) -> int:
        v = self.get(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def get_unary(self) -> int:
        q = 0
        while self.get(1) == 0:
            q += 1
        return q

    def align(self):
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        """Current position assuming byte alignment."""
        return self.pos


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    for nbytes in range(2, 8):  # smallest encoding with capacity
        cap = (7 - nbytes) + 6 * (nbytes - 1) if nbytes < 7 else 36
        if bits <= cap:
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | ((n >> shift) & ((1 << (7 - nbytes)) - 1)))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.get(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8 coded number")
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        b = br.get(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v * 2, -v * 2 - 1).astype(np.int64)


def _unzigzag(u: int) -> int:
    return u >> 1 if u % 2 == 0 else -((u + 1) >> 1)


def _rice_encode(bw: _BitWriter, res: np.ndarray, param: int):
    u = _zigzag(res)
    for x in u.tolist():
        bw.put_unary(x >> param)
        if param:
            bw.put(x & ((1 << param) - 1), param)


def _best_rice_param(res: np.ndarray) -> int:
    u = _zigzag(res)
    mean = float(u.mean()) if len(u) else 0.0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac(samples: np.ndarray, sample_rate: int = 8000,
                block_size: int = 4096, stereo_mode: str = "indep") -> bytes:
    """Encode int16 PCM — (n,) mono or (n, 2) stereo — as a FLAC file
    (fixed predictors). stereo_mode: 'indep' | 'mid_side' |
    'left_side' | 'right_side' (the spec's decorrelation modes; the
    side channel carries bps+1 bits)."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_flac: int16 samples only")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError("encode_flac: (n,) or (n, 2) arrays only")
    if stereo_mode != "indep" and s.shape[1] != 2:
        raise ValueError("stereo_mode needs 2 channels")
    n, nch = s.shape
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    frames = bytearray()
    frame_idx = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        frames += _encode_frame(blk, frame_idx, sample_rate, stereo_mode)
        frame_idx += 1

    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max framesize unknown
        + _pack_streaminfo_tail(sample_rate, nch, 16, n)
        + md5
    )
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    return header + bytes(frames)


def _pack_streaminfo_tail(rate: int, nch: int, bps: int, total: int) -> bytes:
    v = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    return v.to_bytes(8, "big")


_CH_ASGN = {"indep": None, "left_side": 8, "right_side": 9, "mid_side": 10}


def _encode_frame(blk: np.ndarray, frame_idx: int, rate: int,
                  stereo_mode: str = "indep") -> bytes:
    bs, nch = blk.shape
    if stereo_mode == "indep" or nch == 1:
        chmode = nch - 1
        chans = [(blk[:, ch].astype(np.int64), 16) for ch in range(nch)]
    else:  # decorrelated stereo: side channel carries bps+1 bits
        left = blk[:, 0].astype(np.int64)
        right = blk[:, 1].astype(np.int64)
        side = left - right
        chmode = _CH_ASGN[stereo_mode]
        if stereo_mode == "left_side":
            chans = [(left, 16), (side, 17)]
        elif stereo_mode == "right_side":
            chans = [(side, 17), (right, 16)]
        else:  # mid_side
            chans = [((left + right) >> 1, 16), (side, 17)]
    hdr = bytearray()
    hdr += b"\xff\xf8"  # sync + fixed blocking
    # blocksize code 0b0111 (explicit 16-bit blocksize-1 after header),
    # sample rate code 0b1101 (16-bit Hz at end)
    hdr.append((0b0111 << 4) | 0b1101)
    hdr.append((chmode << 4) | (0b100 << 1))  # 16 bps code=100, reserved 0
    hdr += _utf8_number(frame_idx)
    hdr += struct.pack(">H", bs - 1)
    hdr += struct.pack(">H", rate)
    hdr.append(_crc8(bytes(hdr)))

    bw = _BitWriter()
    for x, cbps in chans:
        if np.all(x == x[0]):
            bw.put(0, 1)
            bw.put(0b000000, 6)  # CONSTANT
            bw.put(0, 1)  # no wasted bits
            bw.put(int(x[0]) & ((1 << cbps) - 1), cbps)
            continue
        best_order, best_cost, best_res = 0, None, None
        max_order = min(4, bs - 1)
        for order in range(max_order + 1):
            res = _fixed_residual(x, order)
            cost = int(np.abs(res).sum())
            if best_cost is None or cost < best_cost:
                best_order, best_cost, best_res = order, cost, res
        bw.put(0, 1)
        bw.put(0b001000 | best_order, 6)  # FIXED, order
        bw.put(0, 1)  # no wasted bits
        for w in x[:best_order].tolist():
            bw.put(w & ((1 << cbps) - 1), cbps)  # warmup samples
        # residual: rice method 0, partition order 0
        bw.put(0b00, 2)
        bw.put(0, 4)
        param = min(_best_rice_param(best_res), 14)
        bw.put(param, 4)
        _rice_encode(bw, best_res, param)
    bw.align()
    body = bytes(hdr) + bytes(bw.out)
    return body + struct.pack(">H", _crc16(body))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_flac(buf: bytes):
    """Decode a FLAC file -> (samples int32 (n, nch), sample_rate).
    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 when present."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC file (missing fLaC magic)")
    pos = 4
    rate = nch = bps = 0
    total = 0
    md5_expect = b"\x00" * 16
    # metadata blocks
    while True:
        if pos + 4 > len(buf):
            raise ValueError("flac: truncated metadata")
        last = buf[pos] & 0x80
        btype = buf[pos] & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            v = int.from_bytes(body[10:18], "big")
            rate = v >> 44
            nch = ((v >> 41) & 0x7) + 1
            bps = ((v >> 36) & 0x1F) + 1
            total = v & ((1 << 36) - 1)
            md5_expect = body[18:34]
        pos += 4 + blen
        if last:
            break
    if rate == 0:
        raise ValueError("flac: missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(nch)]
    while pos < len(buf):
        pos = _decode_frame(buf, pos, nch, bps, chans)
    out = np.array(chans, dtype=np.int64).T
    if total and out.shape[0] != total:
        raise ValueError(f"flac: decoded {out.shape[0]}/{total} samples")
    if md5_expect != b"\x00" * 16 and bps == 16:
        got = hashlib.md5(out.astype("<i2").tobytes()).digest()
        if got != md5_expect:
            raise ValueError("flac: decoded-PCM MD5 mismatch")
    return out.astype(np.int32), rate


_BS_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
             10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {0: 0, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_frame(buf: bytes, pos: int, nch: int, bps: int,
                  chans: list) -> int:
    hdr_start = pos
    br = _BitReader(buf, pos)
    sync = br.get(14)
    if sync != 0x3FFE:
        raise ValueError(f"flac: bad frame sync at byte {pos}")
    br.get(1)  # reserved
    br.get(1)  # blocking strategy
    bs_code = br.get(4)
    rate_code = br.get(4)
    ch_asgn = br.get(4)
    ss_code = br.get(3)
    br.get(1)  # reserved
    _fn = _read_utf8_number(br)
    if bs_code == 6:
        bs = br.get(8) + 1
    elif bs_code == 7:
        bs = br.get(16) + 1
    elif bs_code in _BS_CODES:
        bs = _BS_CODES[bs_code]
    else:
        raise ValueError(f"flac: reserved blocksize code {bs_code}")
    if rate_code == 12:
        br.get(8)
    elif rate_code in (13, 14):
        br.get(16)
    elif rate_code not in _RATE_CODES and rate_code != 15:
        raise ValueError("flac: bad sample-rate code")
    _SS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    fbps = _SS.get(ss_code, bps)
    crc8_got = br.get(8)
    if _crc8(buf[hdr_start : br.byte_pos() - 1]) != crc8_got:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_asgn < 8:
        if ch_asgn + 1 != nch:
            raise ValueError("flac: channel count changed mid-stream")
        modes = [("indep", fbps)] * nch
    elif ch_asgn <= 10 and nch != 2:
        raise ValueError(
            "flac: stereo channel assignment in a non-stereo stream")
    elif ch_asgn == 8:  # left/side
        modes = [("indep", fbps), ("side", fbps + 1)]
    elif ch_asgn == 9:  # right/side
        modes = [("side", fbps + 1), ("indep", fbps)]
    elif ch_asgn == 10:  # mid/side
        modes = [("indep", fbps), ("side", fbps + 1)]
    else:
        raise ValueError(f"flac: reserved channel assignment {ch_asgn}")

    sub = []
    for _kind, cbps in modes:
        sub.append(_decode_subframe(br, bs, cbps))
    br.align()
    crc16_got = struct.unpack_from(">H", buf, br.byte_pos())[0]
    if _crc16(buf[hdr_start : br.byte_pos()]) != crc16_got:
        raise ValueError("flac: frame CRC-16 mismatch")

    a = [np.asarray(s, dtype=np.int64) for s in sub]
    if ch_asgn < 8:
        for ch in range(nch):
            chans[ch].extend(a[ch].tolist())
    elif ch_asgn == 8:  # left, side: right = left - side
        chans[0].extend(a[0].tolist())
        chans[1].extend((a[0] - a[1]).tolist())
    elif ch_asgn == 9:  # side, right: left = right + side
        chans[0].extend((a[1] + a[0]).tolist())
        chans[1].extend(a[1].tolist())
    else:  # mid, side
        mid2 = (a[0] << 1) | (a[1] & 1)
        chans[0].extend(((mid2 + a[1]) >> 1).tolist())
        chans[1].extend(((mid2 - a[1]) >> 1).tolist())
    return br.byte_pos() + 2


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> list:
    if br.get(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    t = br.get(6)
    wasted = 0
    if br.get(1):
        wasted = 1 + br.get_unary()
        if wasted >= bps:
            raise ValueError("flac: wasted bits exceed sample size")
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.get_signed(bps)
        out = [v] * bs
    elif t == 1:  # VERBATIM
        out = [br.get_signed(bps) for _ in range(bs)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        out = [br.get_signed(bps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            pred = sum(c * out[order + i - j - 1] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC
        order = t - 31
        out = [br.get_signed(bps) for _ in range(order)]
        prec = br.get(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.get_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.get_signed(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        for i, r in enumerate(res):
            acc = sum(c * out[order + i - j - 1] for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(br: _BitReader, bs: int, order: int) -> list:
    method = br.get(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = br.get(4)
    nparts = 1 << porder
    out = []
    for p in range(nparts):
        cnt = bs >> porder
        if p == 0:
            cnt -= order
        param = br.get(pbits)
        if param == esc:  # verbatim escape
            nb = br.get(5)
            out.extend(br.get_signed(nb) if nb else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.get_unary()
                u = (q << param) | (br.get(param) if param else 0)
                out.append(_unzigzag(u))
    return out
