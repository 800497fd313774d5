"""GIF codec (87a/89a) in pure Python/NumPy (stdlib only).

GIF's only compression is LZW with GIF's LSB-first variable-width code
packing — no external library needed. Implemented:

decoder:
- logical screen descriptor, global/local color tables, graphic control
  extensions (transparency, disposal), interlaced images (4-pass),
  full LZW decode (clear/EOI codes, width growth, the cScSc case)
- `decode_gif` -> (frames RGB uint8 (n, H, W, 3), header) with frames
  composited onto the logical screen (disposal 0/1 keep, 2 restore-to-
  background, transparency holes keep the underlying pixel)
- `gif_frame_count` -> cheap frame count WITHOUT LZW decode (sub-block
  walk), used by sniff_kind to classify single-frame GIFs as images and
  animated GIFs as video

encoder:
- `encode_gif(frames, palette)` — explicit-palette index frames, global
  color table, optional per-frame delays, interlace flag; lossless for
  <=256-color content, so round-trips are exact

Reference analogue: same no-framework byte-parsing posture as
codecs.py / jpegcodec.py / flaccodec.py (FEL `io/Datapack.java:98-213`).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif",
    "decode_gif_image",
    "encode_gif",
    "gif_frame_count",
    "GIF_MAGICS",
]

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, variable width 3..12 bits)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as a list of byte strings; rebuilt on clear
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        # one-behind sync: the decoder appends each entry one code later
        # than the encoder assigned it, so at the next read the encoder's
        # table is len(table)+1 — widen when THAT reaches 1<<width
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError("GIF LZW stream shorter than image")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    data = indices.astype(np.uint8).tobytes()
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # grow in lockstep with the decoder: its table length equals our
        # next_code, and it widens when that length reaches 1<<width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk


def _read_color_table(payload: bytes, pos: int, size: int):
    table = np.frombuffer(payload[pos : pos + 3 * size], dtype=np.uint8)
    if len(table) != 3 * size:
        raise ValueError("truncated GIF color table")
    return table.reshape(size, 3), pos + 3 * size


def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(payload[pos : pos + ln])
        if len(parts[-1]) != ln:
            raise ValueError("truncated GIF sub-block")
        pos += ln


def _skip_subblocks(payload: bytes, pos: int) -> int:
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def _walk(payload: bytes, decode_frames: bool):
    """Yields decoded frames (or just counts image descriptors)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w <= 0 or h <= 0:
        raise ValueError("bad GIF dimensions")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (flags & 7))
    canvas = None
    frames = []
    transparent = None
    disposal = 0
    n = len(payload)
    count = 0
    while pos < n:
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and decode_frames:  # graphic control
                blk, pos = _subblocks(payload, pos)
                if len(blk) >= 4:
                    gflags = blk[0]
                    disposal = (gflags >> 2) & 7
                    transparent = blk[3] if gflags & 1 else None
            else:
                pos = _skip_subblocks(payload, pos)
            continue
        if b != 0x2C:  # image descriptor expected
            raise ValueError(f"bad GIF block 0x{b:02x}")
        count += 1
        ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        iflags = payload[pos + 8]
        pos += 9
        lct = None
        if iflags & 0x80:
            lct, pos = _read_color_table(payload, pos, 2 << (iflags & 7))
        if not decode_frames:
            pos += 1  # min code size
            pos = _skip_subblocks(payload, pos)
            continue
        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 8):
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        data, pos = _subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, iw * ih)
        if iflags & 0x40:  # interlaced: reorder rows
            rows = idx.reshape(ih, iw)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                cnt = len(range(start, ih, step))
                out_rows[start::step] = rows[src : src + cnt]
                src += cnt
            idx = out_rows.reshape(-1)
        ct = lct if lct is not None else gct
        if ct is None:
            raise ValueError("GIF image has no color table")
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF index out of palette range")
        if canvas is None:
            if gct is not None and bg_index < len(gct):
                canvas = np.tile(gct[bg_index], (h, w, 1)).astype(np.uint8)
            else:
                canvas = np.zeros((h, w, 3), dtype=np.uint8)
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame exceeds logical screen")
        rgb = ct[idx].reshape(ih, iw, 3)
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            mask = (idx.reshape(ih, iw) != transparent)[:, :, None]
            region = np.where(mask, rgb, region)
        else:
            region = rgb
        canvas = canvas.copy()
        canvas[iy : iy + ih, ix : ix + iw] = region
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[iy : iy + ih, ix : ix + iw] = bg
        transparent = None
        disposal = 0
    if decode_frames:
        if not frames:
            raise ValueError("GIF has no frames")
        return np.stack(frames), {"width": w, "height": h, "n_frames": len(frames)}
    return count, {"width": w, "height": h}


def decode_gif(payload: bytes):
    """GIF -> ((n_frames, H, W, 3) uint8 RGB composited frames, header)."""
    return _walk(payload, decode_frames=True)


def decode_gif_image(payload: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) RGB (static-GIF convention)."""
    frames, _hdr = decode_gif(payload)
    return frames[0]


def gif_frame_count(payload: bytes) -> int:
    """Number of image descriptors WITHOUT LZW decoding (sub-block walk)."""
    count, _hdr = _walk(payload, decode_frames=False)
    return count


# ---------------------------------------------------------------------------
# encoder


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delays_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """(n, H, W) palette-index frames + (k<=256, 3) palette -> GIF89a.

    Lossless for palettized content. Multi-frame inputs get a graphic
    control extension per frame (delay in 1/100 s)."""
    if frames.ndim == 2:
        frames = frames[None]
    if frames.ndim != 3:
        raise ValueError("encode_gif wants (H, W) or (n, H, W) index frames")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (k<=256, 3)")
    nf, h, w = frames.shape
    if frames.max(initial=0) >= len(palette):
        raise ValueError("frame index out of palette range")
    # color table size: power of two >= max(2, len(palette))
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    size = 1 << bits
    ct = np.zeros((size, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg 0, no aspect
    out += ct.tobytes()
    min_code = max(2, bits)
    for f in range(nf):
        if nf > 1:
            out += bytes([0x21, 0xF9, 4, 0, delays_cs & 0xFF, delays_cs >> 8, 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0])
        frame = frames[f]
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.append(frame[start::step])
            frame = np.concatenate(rows, axis=0)
        out += bytes([min_code])
        lzw = _lzw_encode(frame.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
