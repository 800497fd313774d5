"""Pure-NumPy media codecs for self-describing uncompressed formats.

This container ships no imaging/audio libraries, so the engine implements
REAL decode for the formats that need none — exactly the formats a
large-scale ingest pipeline meets as intermediate representations:

- PPM / PGM (netpbm P2/P3/P5/P6, 8- and 16-bit) images
- BMP (BITMAPINFOHEADER, BI_RGB uncompressed, 24/32 bpp) images
- PNG (full decoder: DEFLATE via stdlib zlib, all 5 scanline filters,
  color types 0/2/3/4/6, bit depths 1-16, Adam7 interlace, CRC checks)
- JPEG baseline (`sources/jpegcodec.py`: Huffman + DCT in pure
  NumPy/stdlib — dispatched from decode_image/sniff_kind here)
- GIF 87a/89a (`sources/gifcodec.py`: full LZW, interlace, animation —
  static GIFs dispatch as images, animated as video with exact Rec.601
  luma)
- WAV (RIFF PCM 8/16/24/32-bit and IEEE float32/64) audio
- FLAC (`sources/flaccodec.py`: lossless Rice + fixed/LPC predictors,
  pure integer — dispatched from decode_wav/sniff_kind here)
- Y4M (YUV4MPEG2, C420/C422/C444 8-bit planar) video

Codecs whose compression genuinely requires external libraries
(opus/av1/vp9/h264...) remain honestly stubbed in
`sources/multimodal.py`; a deployment with ffmpeg bindings plugs them
in via `register_codec`.
Everything here is stdlib `struct`/`zlib` + NumPy: byte-exact,
deterministic, and safe inside Arrow-batched UDFs (no per-row Python in
the Spark hot path; these run on whole payloads inside mapInPandas).

Reference analogue: FEL ships its media-free datapack as self-describing
binary the engine parses directly (`io/Datapack.java:98-213`); the same
"parse the bytes yourself, no framework" posture applied to media columns.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_kind",
    "decode_image",
    "decode_netpbm",
    "decode_bmp",
    "decode_png",
    "decode_wav",
    "decode_y4m",
    "encode_ppm",
    "encode_pgm",
    "encode_png",
    "encode_wav",
    "encode_y4m",
    "resize_nearest",
    "register_codec",
    "unregister_codec",
    "codec_snapshot",
]


# ---------------------------------------------------------------------------
# pluggable codec registry
#
# Deployments that DO have imaging/audio libraries (PIL, soundfile, ffmpeg
# bindings, ...) plug their compressed-format decoders in here instead of
# forking the operators: `register_codec(b"\\x89PNG", "image", pil_decode)`.
# Every decode path in `sources/multimodal.py` consults the registry BEFORE
# the built-in magic dispatch and before raising undecodable/
# NotImplementedError.
#
# Decoder return contract, by kind (same shapes the built-ins produce):
#   image: np.ndarray uint8, (H, W) grayscale or (H, W, 3) RGB
#   audio: (samples np.ndarray float (n, channels) in [-1, 1], sample_rate)
#   video: (luma np.ndarray uint8 (n_frames, H, W),
#           header dict with at least {"width", "height"})
#
# Worker propagation: Spark Python workers re-import this module fresh, so
# a registry mutated on the driver is NOT visible worker-side by itself.
# The UDF builders in `sources/multimodal.py` therefore capture
# `codec_snapshot()` into the UDF closure at plan-build time — cloudpickle
# ships the snapshot (including by-value pickling of non-importable
# decoder functions) to the workers. Register codecs BEFORE building the
# DataFrame plan.

_EXTRA_CODECS: dict[bytes, tuple[str, object]] = {}

_KINDS = ("image", "audio", "video")


def register_codec(magic: bytes, kind: str, decode_fn) -> None:
    """Register a decoder for payloads starting with ``magic``.

    Registered codecs take precedence over the built-ins (so a deployment
    can replace the pure-NumPy BMP path with a library one). Longest magic
    wins when several match. ``decode_fn`` must follow the per-kind return
    contract documented above and be picklable (cloudpickle ships it to
    executors by value when it isn't importable there).
    """
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    if not isinstance(magic, (bytes, bytearray)) or len(magic) == 0:
        raise ValueError("magic must be non-empty bytes")
    _EXTRA_CODECS[bytes(magic)] = (kind, decode_fn)


def unregister_codec(magic: bytes) -> bool:
    """Remove a registered decoder; returns True if it existed."""
    return _EXTRA_CODECS.pop(bytes(magic), None) is not None


def codec_snapshot() -> tuple[tuple[bytes, str, object], ...]:
    """Immutable snapshot of the registry, longest magic first — capture
    this into UDF closures so executors see driver-side registrations."""
    return tuple(
        (m, k, fn)
        for m, (k, fn) in sorted(
            _EXTRA_CODECS.items(), key=lambda kv: -len(kv[0])
        )
    )


def _extra_match(payload: bytes, extra) -> tuple[str, object] | None:
    """First (longest-magic) registered decoder whose magic prefixes
    ``payload``; ``extra`` is a codec_snapshot() tuple."""
    for magic, kind, fn in extra or ():
        if payload[: len(magic)] == magic:
            return kind, fn
    return None


# ---------------------------------------------------------------------------
# sniffing


def sniff_kind(payload: bytes, extra=()) -> str | None:
    """Return 'image' / 'audio' / 'video' for payloads this module (or a
    registered codec in ``extra``) can decode, else None (caller decides
    whether that's an error)."""
    m = _extra_match(payload, extra)
    if m is not None:
        return m[0]
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return "image"
    if payload[:2] == b"BM":
        return "image"
    if payload[:8] == _PNG_SIG:
        return "image"
    if payload[:3] == b"\xff\xd8\xff":
        return "image"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # static GIF = image, animated GIF = video; the frame count comes
        # from a cheap sub-block walk (no LZW decode). Corrupt containers
        # classify as image and fail at decode (the filter's fenced path).
        from fel_spark.sources.gifcodec import gif_frame_count

        try:
            return "video" if gif_frame_count(payload) > 1 else "image"
        except ValueError:
            return "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:4] == b"fLaC":
        return "audio"
    if payload[:9] == b"YUV4MPEG2":
        return "video"
    return None


# ---------------------------------------------------------------------------
# netpbm (PPM/PGM)


def _pnm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read `n_tokens` whitespace-separated integer tokens after the magic,
    skipping `#` comments. Returns (tokens, offset_past_single_whitespace)."""
    toks: list[int] = []
    i = 2  # past magic
    n = len(payload)
    while len(toks) < n_tokens:
        # skip whitespace
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":  # comment to EOL
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(payload[i:j]))
        i = j
    # exactly ONE whitespace byte separates header from raster (netpbm spec)
    return toks, i + 1


def decode_netpbm(payload: bytes) -> np.ndarray:
    """P5/P6 binary and P2/P3 ascii -> (H, W) or (H, W, 3) array.

    maxval <= 255 -> uint8; 256..65535 -> uint16 (big-endian per spec).
    """
    magic = payload[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a PGM/PPM payload: {magic!r}")
    color = magic in (b"P3", b"P6")
    (w, h, maxval), off = _pnm_header_tokens(payload, 3)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"bad netpbm dimensions {w}x{h} maxval={maxval}")
    channels = 3 if color else 1
    count = w * h * channels
    if magic in (b"P5", b"P6"):
        if maxval < 256:
            flat = np.frombuffer(payload, dtype=np.uint8, count=count, offset=off)
        else:
            flat = np.frombuffer(payload, dtype=">u2", count=count, offset=off).astype(
                np.uint16
            )
    else:  # ascii: one int token per sample
        vals = payload[off - 1 :].split()
        if len(vals) < count:
            raise ValueError("truncated ascii netpbm raster")
        dt = np.uint8 if maxval < 256 else np.uint16
        flat = np.array([int(v) for v in vals[:count]], dtype=dt)
    if len(flat) < count:
        raise ValueError("truncated netpbm raster")
    arr = flat.reshape((h, w, 3)) if color else flat.reshape((h, w))
    return arr


def encode_ppm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(H, W, 3) uint8/uint16 -> binary P6."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm wants (H, W, 3)")
    h, w = img.shape[:2]
    header = f"P6\n{w} {h}\n{maxval}\n".encode()
    if maxval < 256:
        return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    return header + np.ascontiguousarray(img.astype(">u2")).tobytes()


def encode_pgm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(H, W) uint8/uint16 -> binary P5."""
    if img.ndim != 2:
        raise ValueError("encode_pgm wants (H, W)")
    h, w = img.shape
    header = f"P5\n{w} {h}\n{maxval}\n".encode()
    if maxval < 256:
        return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    return header + np.ascontiguousarray(img.astype(">u2")).tobytes()


# ---------------------------------------------------------------------------
# BMP (BI_RGB only)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bpp BITMAPINFOHEADER BMP -> (H, W, 3) uint8 RGB.

    Handles bottom-up (positive biHeight) and top-down (negative) rasters
    and the 4-byte row padding.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"only 24/32 bpp supported, got {bpp}")
    h = abs(h_signed)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = data_off + row_stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_stride * h, offset=data_off)
    rows = raster.reshape(h, row_stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if h_signed > 0:  # bottom-up storage
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_image(payload: bytes, extra=()) -> np.ndarray:
    """Dispatch by magic: registered codecs (``extra`` = codec_snapshot())
    first, then netpbm/BMP. Grayscale comes back (H, W)."""
    m = _extra_match(payload, extra)
    if m is not None and m[0] == "image":
        return m[1](payload)
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from fel_spark.sources.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from fel_spark.sources.gifcodec import decode_gif_image

        return decode_gif_image(payload)
    raise ValueError(f"undecodable image magic {payload[:2]!r}")


# ---------------------------------------------------------------------------
# WAV


def decode_wav(payload: bytes, extra=()) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n_samples, channels) float32 in [-1, 1], sample_rate).

    PCM (format 1): 8-bit unsigned, 16/24/32-bit signed little-endian.
    IEEE float (format 3): float32/float64. Walks chunks properly (skips
    LIST/fact/...), honours the declared chunk sizes + odd-size padding.
    """
    m = _extra_match(payload, extra)
    if m is not None and m[0] == "audio":
        return m[1](payload)
    if payload[:4] == b"fLaC":
        from fel_spark.sources.flaccodec import decode_flac, flac_info

        pcm, sr = decode_flac(payload)
        _sr, _nch, bps, _total = flac_info(payload)
        # normalize like the PCM paths below: int at bps -> [-1, 1] float
        return (pcm.astype(np.float32) / float(1 << (bps - 1)), sr)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _brate, _align, bits = fmt
    if channels <= 0:
        raise ValueError("bad channel count")
    if audio_fmt == 1:  # PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            as32 = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            as32 = np.where(as32 >= 1 << 23, as32 - (1 << 24), as32)
            x = as32.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}")
    frames = len(x) // channels
    return x[: frames * channels].reshape(frames, channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 (or float in [-1,1]) -> PCM16 WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype.kind == "f":
        arr = np.clip(np.round(arr * 32767.0), -32768, 32767)
    pcm = np.ascontiguousarray(arr.astype("<i2"))
    channels = pcm.shape[1]
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)

_Y4M_CHROMA_DIV = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}


def decode_y4m(payload: bytes, extra=()) -> tuple[np.ndarray, dict]:
    """YUV4MPEG2 -> ((n_frames, H, W) uint8 luma, header dict).

    Chroma planes are parsed (so frame boundaries are exact) but only luma
    is returned — downstream features are luma-based, and full YUV would
    triple the Arrow batch size for no consumer.
    """
    m = _extra_match(payload, extra)
    if m is not None and m[0] == "video":
        return m[1](payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from fel_spark.sources.gifcodec import decode_gif

        frames, hdr = decode_gif(payload)
        rgb = frames.astype(np.int64)
        # integer-exact Rec.601 luma (SQL-replayable in oracles)
        luma = (
            (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2] + 500)
            // 1000
        ).astype(np.uint8)
        return luma, {"width": hdr["width"], "height": hdr["height"], "chroma": "gif"}
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    chroma = "420"
    rate = "25:1"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            rate = t[1:]
        elif t.startswith("C"):
            # C420jpeg / C420mpeg2 / C420paldv all subsample 2x2
            chroma = "420" if t[1:].startswith("420") else t[1:4]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _Y4M_CHROMA_DIV:
        raise ValueError(f"unsupported Y4M chroma mode C{chroma}")
    cw_div, ch_div = _Y4M_CHROMA_DIV[chroma]
    y_size = w * h
    c_size = (w // cw_div) * (h // ch_div)
    frame_size = y_size + 2 * c_size
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M frame marker")
        pos = fnl + 1
        if pos + frame_size > n:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=pos).reshape(h, w)
        )
        pos += frame_size
    luma = np.stack(frames) if frames else np.empty((0, h, w), dtype=np.uint8)
    return luma, {"width": w, "height": h, "chroma": chroma, "rate": rate}


def encode_y4m(luma: np.ndarray, chroma_value: int = 128, chroma: str = "420") -> bytes:
    """(n_frames, H, W) uint8 luma -> Y4M with flat chroma planes."""
    if luma.ndim != 3:
        raise ValueError("encode_y4m wants (n_frames, H, W)")
    f, h, w = luma.shape
    cw_div, ch_div = _Y4M_CHROMA_DIV[chroma]
    c_size = (w // cw_div) * (h // ch_div)
    c_plane = bytes([chroma_value]) * c_size
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()]
    for k in range(f):
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(luma[k], dtype=np.uint8).tobytes())
        out.append(c_plane)
        out.append(c_plane)
    return b"".join(out)


# ---------------------------------------------------------------------------
# PNG (RFC 2083 / W3C PNG spec) — real decode via stdlib zlib + NumPy.
#
# PNG is the one "compressed" media format this container CAN decode for
# real: its only compression is DEFLATE, which ships in the Python stdlib.
# Full decoder: all five scanline filters, color types 0/2/3/4/6, bit
# depths 1/2/4/8/16, Adam7 interlace, CRC-verified chunks. Alpha channels
# are dropped after decode (the documented image contract is (H, W) or
# (H, W, 3)); low-bit grayscale is expanded with the exact 255/(2^d-1)
# replication factor (integer-exact: 255, 85*3, 17*15). 16-bit samples
# come back uint16 (same convention as 16-bit netpbm above).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type (3 = palette index, expanded via PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying length and CRC."""
    import zlib

    pos, n = 8, len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in chunk {ctype!r}")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG stream ended without IEND")


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering -> (height, stride) uint8 of raw bytes.

    ``stride`` is the filtered byte count per scanline (excluding the
    leading filter-type byte); ``bpp`` the filter unit (bytes per pixel,
    min 1). Filters None/Up/Sub vectorize (Sub via per-lag-class cumsum —
    byte addition mod 256 is associative); Average/Paeth carry a true
    along-row recurrence and fall back to a per-byte loop, which is fine
    at payload scale (these run on whole payloads inside Arrow batches,
    not per Spark row).
    """
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG raster")
    rows = np.frombuffer(raw[: height * (stride + 1)], dtype=np.uint8)
    rows = rows.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(ftypes[y])
        line = rows[y, 1:]
        if ft == 0:  # None
            rec = line.copy()
        elif ft == 2:  # Up
            rec = line + prior  # uint8 wraps mod 256, exactly the spec
        elif ft == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            rec = line.astype(np.uint64).copy()
            for k in range(bpp):
                np.cumsum(rec[k::bpp], out=rec[k::bpp])
            rec = (rec & 0xFF).astype(np.uint8)
        elif ft in (3, 4):  # Average / Paeth: sequential along the row
            rec = np.zeros(stride, dtype=np.int32)
            ln = line.astype(np.int32)
            pr = prior.astype(np.int32)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(pr[i])
                if ft == 3:
                    rec[i] = (ln[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(pr[i - bpp]) if i >= bpp else 0
                    rec[i] = (ln[i] + _paeth_predict(a, b, c)) & 0xFF
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prior = rec
    return out


def _png_samples(recon: np.ndarray, width: int, channels: int, depth: int) -> np.ndarray:
    """(H, stride) raw recon bytes -> (H, width, channels) sample array
    (uint8, or uint16 for depth 16; low-bit samples NOT yet scaled)."""
    h = recon.shape[0]
    if depth == 8:
        flat = recon[:, : width * channels]
        return flat.reshape(h, width, channels)
    if depth == 16:
        flat = recon[:, : width * channels * 2].reshape(h, -1)
        u16 = (flat[:, 0::2].astype(np.uint16) << 8) | flat[:, 1::2]
        return u16.reshape(h, width, channels)
    # 1/2/4-bit: only valid for 1-channel types (gray / palette)
    bits = np.unpackbits(recon, axis=1)
    per = bits[:, : width * depth].reshape(h, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (per * weights[None, None, :]).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, width, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W) grayscale or (H, W, 3) RGB NumPy array.

    uint8 output (uint16 for 16-bit depth). Alpha (types 4/6, tRNS) is
    dropped; palette (type 3) is expanded through PLTE; 1/2/4-bit gray is
    scaled by the exact 255/(2^d-1) factor. Adam7 interlace supported.
    Chunk CRCs are verified (a deterministic corruption gate — corrupt
    payloads fail decode and flow to the corrupt-audit path of
    `media_filter_decisions` rather than yielding garbage pixels).
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat_parts = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat_parts.append(data)
    if ihdr is None or not idat_parts:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if ctype_ not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ctype_}")
    if w <= 0 or h <= 0 or w * h > 512 * 1024 * 1024:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    valid_depths = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }[ctype_]
    if depth not in valid_depths:
        raise ValueError(f"bad PNG bit depth {depth} for color type {ctype_}")
    if ctype_ == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    channels = _PNG_CHANNELS[ctype_]
    raster = zlib.decompress(b"".join(idat_parts))
    sdtype = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, channels), dtype=sdtype)
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        bpp = max(1, channels * depth // 8)
        need = ph * (stride + 1)
        recon = _png_unfilter(raster[off : off + need], ph, stride, bpp)
        off += need
        img[y0::dy, x0::dx] = _png_samples(recon, pw, channels, depth)
    # post-process by color type
    if ctype_ == 3:
        rgb = plte[img[:, :, 0]]
        return np.ascontiguousarray(rgb)
    if ctype_ == 0 and depth < 8:
        img = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if channels == 1:
        return np.ascontiguousarray(img[:, :, 0])
    if channels == 2:  # gray + alpha -> gray
        return np.ascontiguousarray(img[:, :, 0])
    if channels == 4:  # RGBA -> RGB
        return np.ascontiguousarray(img[:, :, :3])
    return np.ascontiguousarray(img)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(line: np.ndarray, prior: np.ndarray, bpp: int, ft: int) -> np.ndarray:
    """Apply filter ``ft`` to one reconstructed scanline (uint8 arrays)."""
    ln = line.astype(np.int32)
    if ft == 0:
        return line.copy()
    if ft == 2:
        return line - prior  # uint8 arithmetic wraps mod 256, per spec
    left = np.zeros_like(ln)
    left[bpp:] = ln[:-bpp]
    pr = prior.astype(np.int32)
    if ft == 1:
        out = ln - left
    elif ft == 3:
        out = ln - ((left + pr) >> 1)
    elif ft == 4:
        prl = np.zeros_like(pr)
        prl[bpp:] = pr[:-bpp]
        out = np.empty_like(ln)
        for i in range(len(ln)):
            out[i] = ln[i] - _paeth_predict(int(left[i]), int(pr[i]), int(prl[i]))
    else:
        raise ValueError(f"bad filter type {ft}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(
    img: np.ndarray, filter_type: int | str = 0, interlace: bool = False, level: int = 6
) -> bytes:
    """(H, W) or (H, W, 3) uint8/uint16 -> PNG bytes.

    ``filter_type``: 0-4 applied to every scanline, or "mixed" (row y gets
    filter y % 5 — exercises every unfilter path in round-trip tests).
    ``interlace=True`` writes Adam7. Exact inverse of :func:`decode_png`
    for 8/16-bit gray and RGB inputs.
    """
    import zlib

    if img.ndim == 2:
        arr = img[:, :, None]
        ctype_ = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        arr = img
        ctype_ = 2
    else:
        raise ValueError("encode_png wants (H, W) or (H, W, 3)")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"encode_png wants uint8/uint16, got {arr.dtype}")
    h, w, channels = arr.shape
    bpp = channels * depth // 8
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    parts = []
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if depth == 16:
            be = sub.astype(">u2").reshape(ph, pw * channels).view(np.uint8)
            rows = np.ascontiguousarray(be).reshape(ph, pw * bpp)
        else:
            rows = np.ascontiguousarray(sub).reshape(ph, pw * bpp)
        prior = np.zeros(pw * bpp, dtype=np.uint8)
        for y in range(ph):
            ft = (y % 5) if filter_type == "mixed" else int(filter_type)
            filtered = _png_filter_row(rows[y], prior, bpp, ft)
            parts.append(bytes([ft]) + filtered.tobytes())
            prior = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_, 0, 0, 1 if interlace else 0)
    return b"".join(
        [
            _PNG_SIG,
            _png_chunk(b"IHDR", ihdr),
            _png_chunk(b"IDAT", zlib.compress(b"".join(parts), level)),
            _png_chunk(b"IEND", b""),
        ]
    )


# ---------------------------------------------------------------------------
# resize


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize, floor sampling: src = floor(dst * src_dim /
    dst_dim). Integer-exact (oracle-replayable in SQL) and allocation-light —
    two take() gathers, no interpolation arithmetic."""
    if width <= 0 or height <= 0:
        raise ValueError("resize to empty")
    h, w = img.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return np.ascontiguousarray(img[ys][:, xs])
