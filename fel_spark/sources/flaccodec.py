"""FLAC codec in pure Python/NumPy (stdlib only).

FLAC is LOSSLESS and purely integer: its entropy layer is Rice coding and
its predictors are small integer filters — no external library needed.

decoder (`decode_flac`):
- STREAMINFO + metadata-block walk, frame sync, UTF-8 frame numbers,
  CRC-8 (header) and CRC-16 (frame) verification
- subframe types: CONSTANT, VERBATIM, FIXED orders 0-4, LPC (any order,
  quantized coefficients + shift), wasted-bits unpacking
- Rice residual decoding (4- and 5-bit parameters, escape-to-raw),
  partition orders, inter-channel decorrelation (left/side, right/side,
  mid/side)
- optional MD5 check against the STREAMINFO signature (strict=True)

encoder (`encode_flac`):
- fixed 4096-sample blocks, independent channels, per-subframe choice of
  CONSTANT / FIXED order 0-2 by residual cost, single-partition Rice with
  a mean-magnitude parameter, correct CRCs and the PCM MD5 signature

Because FLAC is lossless, decode(encode(x)) == x ALWAYS — every
round-trip test is exact, and the driver's `media_flac_stats` oracle gets
the same closed forms as uncompressed WAV. 8/16/24-bit PCM supported.

Reference analogue: FEL parses its own compact binary formats directly
(`io/Datapack.java:98-213`); same posture as codecs.py / jpegcodec.py.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "flac_info", "FLAC_MAGIC"]

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_TO_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    def bytepos(self) -> int:
        return self.bitpos // 8

    def read(self, n: int) -> int:
        d = self.data
        end = self.bitpos + n
        if end > len(d) * 8:
            raise ValueError("truncated FLAC bitstream")
        v = 0
        pos = self.bitpos
        while n > 0:
            byte = d[pos >> 3]
            off = pos & 7
            take = min(8 - off, n)
            v = (v << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1."""
        d = self.data
        pos = self.bitpos
        total = len(d) * 8
        start = pos
        while pos < total:
            byte = d[pos >> 3]
            off = pos & 7
            chunk = (byte << off) & 0xFF  # remaining bits left-aligned
            if chunk:
                lead = 8 - chunk.bit_length()  # zeros before first 1
                pos += lead + 1
                self.bitpos = pos
                return pos - start - 1
            pos += 8 - off
        raise ValueError("truncated FLAC unary code")

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad FLAC UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, pred_order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"bad FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.read_unary()
                u = (q << param) | (bits.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        samples = np.array([bits.read_signed(eff) for _ in range(blocksize)],
                           dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        s = list(warm)
        for r in resid:
            v = r
            for j, c in enumerate(coefs):
                v += c * s[-1 - j]
            s.append(v)
        samples = np.array(s, dtype=np.int64)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        s = list(warm)
        for r in resid:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * s[-1 - j]
            s.append(r + (acc >> shift))
        samples = np.array(s, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return samples << wasted


def _parse_metadata(payload: bytes):
    """Walk the metadata blocks; returns (sr, nch, bps, total_samples,
    md5, first_frame_offset)."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\0" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            bi = _Bits(body)
            bi.read(16)  # min block
            bi.read(16)  # max block
            bi.read(24)  # min frame
            bi.read(24)  # max frame
            sr = bi.read(20)
            nch = bi.read(3) + 1
            bps = bi.read(5) + 1
            total = bi.read(36)
            streaminfo = (sr, nch, bps, total, body[18:34])
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    return (*streaminfo, pos)


def flac_info(payload: bytes) -> tuple[int, int, int, int]:
    """STREAMINFO essentials without decoding: (sample_rate, channels,
    bits_per_sample, total_samples)."""
    sr, nch, bps, total, _md5, _pos = _parse_metadata(payload)
    return sr, nch, bps, total


def decode_flac(payload: bytes, strict: bool = False) -> tuple[np.ndarray, int]:
    """FLAC -> ((n_samples, channels) int32 PCM, sample_rate).

    Verifies frame CRC-8/CRC-16; ``strict=True`` additionally checks the
    decoded PCM against STREAMINFO's MD5 signature. Sample values are the
    raw integers at the stream's bit depth (8 -> [-128, 127], 16 ->
    [-32768, 32767], 24-bit accordingly).
    """
    sr, nch, bps, total, md5sig, pos = _parse_metadata(payload)
    if sr == 0 or nch < 1:
        raise ValueError("bad FLAC STREAMINFO")
    channels_acc: list[list[np.ndarray]] = [[] for _ in range(nch)]
    # frames
    while pos < len(payload):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            blocksize = 192
        elif 2 <= bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        elif sr_code != 0 and sr_code not in _SAMPLE_RATES:
            raise ValueError(f"bad FLAC sample rate code {sr_code}")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size code {bps_code}")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        hdr_end = bits.bytepos()
        crc8 = bits.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code <= 7:
            fch = ch_code + 1
            if fch != nch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_read_subframe(bits, blocksize, fbps) for _ in range(fch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _read_subframe(bits, blocksize, fbps)
                side = _read_subframe(bits, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side (side first)
                side = _read_subframe(bits, blocksize, fbps + 1)
                right = _read_subframe(bits, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _read_subframe(bits, blocksize, fbps)
                side = _read_subframe(bits, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        bits.align()
        crc_end = bits.bytepos()
        crc16 = bits.read(16)
        if _crc16(payload[frame_start:crc_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(nch):
            channels_acc[c].append(subs[c])
        pos = bits.bytepos()
    if not channels_acc[0]:
        raise ValueError("FLAC stream has no frames")
    chans = [np.concatenate(parts) for parts in channels_acc]
    pcm = np.stack(chans, axis=1)
    if total and len(pcm) < total:
        raise ValueError("FLAC stream shorter than STREAMINFO total_samples")
    if total:
        pcm = pcm[:total]
    if strict and md5sig != b"\0" * 16:
        if _pcm_md5(pcm, bps) != md5sig:
            raise ValueError("FLAC MD5 signature mismatch")
    return pcm.astype(np.int32), sr


def _pcm_md5(pcm: np.ndarray, bps: int) -> bytes:
    """MD5 of the interleaved little-endian PCM at bps bits (whole bytes)."""
    nbytes = bps // 8
    inter = pcm.astype(np.int64).reshape(-1)
    if nbytes == 1:
        raw = (inter & 0xFF).astype(np.uint8).tobytes()
    elif nbytes == 2:
        raw = inter.astype("<i2").tobytes()
    elif nbytes == 3:
        u = (inter & 0xFFFFFF).astype(np.uint32)
        b = np.empty((len(u), 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        raw = b.tobytes()
    else:
        raw = inter.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _rice_cost(resid: np.ndarray, param: int) -> int:
    return int(np.sum((np.abs(resid * 2) >> param) + 1 + param))


def _best_rice_param(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.mean(np.abs(resid)))
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    best = min(range(max(0, p - 1), min(15, p + 2)),
               key=lambda k: _rice_cost(resid, k))
    return best


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    w.write(0, 2)  # 4-bit rice
    w.write(0, 4)  # partition order 0
    param = _best_rice_param(resid)
    w.write(param, 4)
    for r in resid:
        r = int(r)
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        q = u >> param
        w.write_unary(q)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, samples: np.ndarray, bps: int) -> None:
    w.write(0, 1)  # pad
    if np.all(samples == samples[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(samples[0]), bps)
        return
    # pick fixed order 0-2 by total |residual|
    cands = {}
    s = samples.astype(np.int64)
    cands[0] = s
    if len(s) > 1:
        cands[1] = np.concatenate([s[:1] * 0, np.diff(s)])
    if len(s) > 2:
        d2 = s[2:] - 2 * s[1:-1] + s[:-2]
        cands[2] = d2
    order = min(cands, key=lambda o: int(np.abs(cands[o][o if o < 2 else 0:]).sum()))
    if order == 0:
        resid = s
    elif order == 1:
        resid = np.diff(s)
    else:
        resid = s[2:] - 2 * s[1:-1] + s[:-2]
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for i in range(order):
        w.write(int(s[i]), bps)
    _write_residual(w, resid)


def encode_flac(pcm: np.ndarray, sample_rate: int, bps: int = 16) -> bytes:
    """(n, channels) or (n,) int PCM -> FLAC bytes (lossless).

    Independent channels, 4096-sample blocks, CONSTANT / FIXED(0-2)
    subframes with single-partition Rice residuals. The STREAMINFO MD5
    is computed so decoders (ours with strict=True, or any standard
    tool) can verify bit-exactness.
    """
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2:
        raise ValueError("encode_flac wants (n,) or (n, channels)")
    n, nch = pcm.shape
    if n == 0 or nch < 1 or nch > 8:
        raise ValueError("bad FLAC channel/sample count")
    if bps not in _BPS_TO_CODE:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    s64 = pcm.astype(np.int64)
    if s64.min() < lo or s64.max() > hi:
        raise ValueError(f"PCM out of range for {bps}-bit FLAC")
    block = 4096
    out = bytearray(FLAC_MAGIC)
    w = _BitWriter()
    w.write(block, 16)  # min block
    w.write(block, 16)  # max block
    w.write(0, 24)  # min frame size unknown
    w.write(0, 24)  # max frame size unknown
    w.write(sample_rate, 20)
    w.write(nch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    streaminfo = bytes(w.out) + _pcm_md5(s64, bps)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    frame_no = 0
    for start in range(0, n, block):
        chunk = s64[start : start + block]
        blocksize = len(chunk)
        hw = _BitWriter()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed blocksize strategy
        hw.write(7, 4)  # blocksize as 16-bit field (blocksize-1)
        hw.write(0, 4)  # sample rate from STREAMINFO
        hw.write(nch - 1, 4)  # independent channels
        hw.write(_BPS_TO_CODE[bps], 3)
        hw.write(0, 1)
        for b in _utf8_number(frame_no):
            hw.write(b, 8)
        hw.write(blocksize - 1, 16)
        hw.align()
        header = bytes(hw.out)
        header += bytes([_crc8(header)])
        fw = _BitWriter()
        for c in range(nch):
            _write_subframe(fw, chunk[:, c], bps)
        fw.align()
        frame = header + bytes(fw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
