"""Baseline JPEG (ITU-T T.81) codec in pure NumPy + stdlib.

JPEG's entropy layer is Huffman coding and its transform is the 8x8 DCT —
neither needs an external library. This module implements the baseline
sequential process end-to-end:

decoder (`decode_jpeg`):
- marker segment parser (SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI)
- canonical Huffman table construction (T.81 Annex C) + MSB-first bit
  reader with 0xFF00 byte-unstuffing and restart-marker resync
- per-MCU data-unit decode (DPCM DC + run/size AC, EXTEND sign logic)
- dequantization, vectorized 8x8 IDCT (one einsum over all blocks),
- chroma upsampling by sample replication, YCbCr -> RGB (T.871 matrix),
  level shift, rounding, clamp, edge-crop to the declared dimensions

encoder (`encode_jpeg`):
- forward DCT + quantization (Annex K example tables scaled by a quality
  knob, or caller-supplied / flat tables), 4:4:4 color or grayscale,
- standard Annex K Huffman tables, bit writer with 0xFF stuffing,
- edge-replication padding to 8-pixel multiples

Baseline JPEG is lossy, so round-trips are tolerance-checked in pytest —
EXCEPT the DC-only subspace: with flat (all-ones) quantization a
solid-color block's FDCT is exactly (8*(v-128), 0, ..., 0) and the IDCT
recovers v exactly, which is what the driver's closed-form
`media_jpeg_stats` oracle exploits (tests/test_jpeg.py proves exactness).

Progressive/arithmetic/12-bit modes are out of scope and rejected with a
clear error; 4:2:0 and 4:2:2 subsampled streams are DECODED (replication
upsampling) though the encoder only writes 4:4:4.

Reference analogue: FEL parses its own binary formats directly
(`io/Datapack.java:98-213`); same no-framework posture applied to the one
compressed image format whose primitives live in the stdlib + NumPy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "JPEG_MAGIC"]

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag scan order: ZIGZAG[i] = raster index of the i-th zigzag coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example quantization tables (luminance, chrominance), raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K standard Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_basis() -> np.ndarray:
    """T[u, x] = C(u)/2 * cos((2x+1) u pi / 16) — the 8-point DCT-II basis
    with JPEG normalization: S = T s T^t, s = T^t S T."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    t[0] /= np.sqrt(2.0)
    return t


_T = _dct_basis()


# ---------------------------------------------------------------------------
# Huffman table machinery (T.81 Annex C canonical codes)


class _HuffDecoder:
    """Spec DECODE procedure tables: mincode/maxcode/valptr per length."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        if len(bits) != 16 or sum(bits) != len(values):
            raise ValueError("malformed Huffman table")
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


def _huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under the canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded bytes with FF00 unstuffing.
    Stops at any non-stuffing marker (caller handles RSTn)."""

    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: expose it and feed zero bits (spec says a
                # correct stream never reads past the marker mid-unit)
                self.marker = nxt
                raise ValueError(
                    f"hit marker 0x{nxt:02x} inside entropy data" if nxt is not None
                    else "truncated JPEG entropy stream"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.nbits == 0:
                self._fill()
            take = min(n, self.nbits)
            v = (v << take) | ((self.acc >> (self.nbits - take)) & ((1 << take) - 1))
            self.nbits -= take
            n -= take
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        got = d[self.pos + 1]
        if got != 0xD0 + (n & 7):
            raise ValueError(f"bad restart marker 0x{got:02x}, wanted RST{n & 7}")
        self.pos += 2

    def decode_huff(self, table: _HuffDecoder) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise ValueError("invalid Huffman code in JPEG stream")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.values[table.valptr[length] + code - table.mincode[length]]


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W) grayscale or (H, W, 3) RGB uint8.

    Supports SOF0 (baseline sequential, 8-bit), 1 or 3 components, any
    H/V sampling factors up to 2 (4:4:4 / 4:2:2 / 4:2:0 / ...), restart
    intervals. Rejects progressive (SOF2), arithmetic coding, and 12-bit
    precision with explicit errors.
    """
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    n = len(payload)
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffDecoder] = {}  # (class, id)
    frame = None  # (h, w, comps) comps = list[(cid, hs, vs, tq)]
    restart_interval = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tab
                qtabs[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(seg[i + 17 : i + 17 + nvals])
                htabs[(tc, th)] = _HuffDecoder(bits, values)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both Huffman sequential)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h, w = struct.unpack_from(">HH", seg, 1)
            nf = seg[5]
            comps = []
            for c in range(nf):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xff{marker:02x}): only "
                "baseline sequential Huffman (SOF0/SOF1) is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — decode the scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qtabs, htabs,
                restart_interval,
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        pos += 2 + seglen
    raise ValueError("JPEG stream has no scan")


def _decode_scan(payload, pos, frame, scan, qtabs, htabs, ri):
    h, w, comps = frame
    if h <= 0 or w <= 0 or h * w > 512 * 1024 * 1024:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per scan component: coefficient store (blocks_y, blocks_x, 8, 8)
    stores = {}
    meta = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        hs, vs, tq = by_id[cs]
        if (0, td) not in htabs or (1, ta) not in htabs or tq not in qtabs:
            raise ValueError("scan references missing Huffman/quant table")
        stores[cs] = np.zeros((mcuy * vs, mcux * hs, 8, 8), dtype=np.int64)
        meta.append((cs, hs, vs, tq, htabs[(0, td)], htabs[(1, ta)]))
    reader = _BitReader(payload, pos)
    preds = {cs: 0 for cs, *_ in meta}
    coef = np.zeros(64, dtype=np.int64)
    rst_n = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_i and mcu_i % ri == 0:
                reader.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                for k in preds:
                    preds[k] = 0
            for cs, hs, vs, tq, dc_tab, ac_tab in meta:
                for by in range(vs):
                    for bx in range(hs):
                        coef[:] = 0
                        s = reader.decode_huff(dc_tab)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[cs] += diff
                        coef[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tab)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            coef[k] = _extend(reader.read_bits(sz), sz)
                            k += 1
                        blk = np.empty(64, dtype=np.int64)
                        blk[ZIGZAG] = coef
                        stores[cs][my * vs + by, mx * hs + bx] = blk.reshape(8, 8)
            mcu_i += 1
    # dequantize + IDCT all blocks per component (vectorized)
    planes = {}
    for cs, hs, vs, tq, _dc, _ac in meta:
        q = qtabs[tq][None, None, :, :]
        # s(y,x) = sum_u sum_v T[u,y] S[u,v] T[v,x], vectorized over blocks
        S = (stores[cs] * q).astype(np.float64)
        sp = np.einsum("uy,bruv,vx->bryx", _T, S, _T)
        by_, bx_ = sp.shape[0], sp.shape[1]
        plane = sp.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        plane = np.clip(np.round(plane) + 128, 0, 255).astype(np.uint8)
        # upsample by replication to full MCU grid resolution
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cs] = plane[:h, :w]
    if len(meta) == 1:
        return planes[meta[0][0]]
    if len(meta) != 3:
        raise ValueError(f"unsupported JPEG component count {len(meta)}")
    y = planes[meta[0][0]].astype(np.float64)
    cb = planes[meta[1][0]].astype(np.float64) - 128.0
    cr = planes[meta[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-convention quality scaling of a base quant table (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    tab = (base * s + 50) // 100
    return np.clip(tab, 1, 255)


def _encode_blocks(writer, blocks_q, dc_enc, ac_enc, pred):
    """Entropy-encode quantized blocks (n, 8, 8) in raster order; returns
    updated DC predictor."""
    zz = ZIGZAG
    for blk in blocks_q:
        flat = blk.reshape(64)[zz]
        dc = int(flat[0])
        diff = dc - pred
        pred = dc
        s = int(diff).bit_length() if diff != 0 else 0
        code, ln = dc_enc[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = 0
        nz = np.nonzero(flat[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(flat[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                writer.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac_enc[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_enc[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane (level-shifted) -> quantized (n_blocks, 8, 8)."""
    h8, w8 = plane.shape
    blocks = plane.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    S = np.einsum("uy,bryx,vx->bruv", _T, blocks, _T)
    Sq = np.round(S / q[None, None, :, :]).astype(np.int64)
    return Sq.reshape(-1, 8, 8)


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    quant: str | np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes (4:4:4).

    ``quant="flat"`` uses all-ones quantization for both tables — lossless
    for solid-color blocks (DC-only: FDCT/IDCT round-trip exactly), the
    basis of the closed-form driver oracle. Otherwise the Annex K tables
    scaled by ``quality`` (IJG convention). ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every that many MCUs (exercises the
    decoder's byte-align + DC-predictor resync path).
    """
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    if isinstance(quant, np.ndarray):
        qy = qc = quant.reshape(8, 8).astype(np.int64)
    elif quant == "flat":
        qy = qc = np.ones((8, 8), dtype=np.int64)
    elif quant is None:
        qy = _quality_scale(_QT_LUMA, quality).reshape(8, 8)
        qc = _quality_scale(_QT_CHROMA, quality).reshape(8, 8)
    else:
        raise ValueError(f"bad quant spec {quant!r}")
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qts = [qy]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qy, qc, qc]
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tq, q in enumerate([qy] if gray else [qy, qc]):
        zz = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in zz
        )
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (all four standard tables; gray only needs the luma pair)
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data: 4:4:4 -> each MCU is one block per component;
    # encoding per-component planes block-row-major inside the MCU walk is
    # equivalent to interleaving blocks one at a time
    writer = _BitWriter()
    dc_enc_y = _huff_encode_table(*_DC_LUMA)
    ac_enc_y = _huff_encode_table(*_AC_LUMA)
    dc_enc_c = _huff_encode_table(*_DC_CHROMA)
    ac_enc_c = _huff_encode_table(*_AC_CHROMA)
    qblocks = [
        _fdct_quant(_pad8(p), q) for p, q in zip(planes, qts)
    ]
    preds = [0] * ncomp
    nblocks = qblocks[0].shape[0]
    encs = [(dc_enc_y, ac_enc_y)] + [(dc_enc_c, ac_enc_c)] * (ncomp - 1)
    rst_n = 0
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
            rst_n += 1
            preds = [0] * ncomp
        for c in range(ncomp):
            preds[c] = _encode_blocks(
                writer, qblocks[c][bi : bi + 1], encs[c][0], encs[c][1], preds[c]
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
