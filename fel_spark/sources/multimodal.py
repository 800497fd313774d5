"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested.

Decode is REAL for every self-describing uncompressed format
(`sources/codecs.py`: PPM/PGM, BMP BI_RGB, WAV PCM/float, Y4M) — pure
NumPy, byte-exact, value-checked against closed-form SQL oracles — and
for PNG (full stdlib-zlib decoder: all filters, color types, bit depths,
Adam7) and baseline JPEG (`sources/jpegcodec.py`: Huffman + DCT in pure
NumPy). Codecs needing external libraries (opus/av1/vp9/h264) remain
honestly stubbed: decode
functions raise NotImplementedError for those unless `fake=True`, in which
case a deterministic fake decoder (seeded from the payload hash) produces
stable features so downstream plumbing stays exercisable for any codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.sources import codecs

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, feat array<float>, feat_dim int"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = h * 4  # 128 bytes of deterministic "media"
        kind = kinds[i % 3]
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                {
                    "width": 64 + (i % 8) * 16 if kind == "image" else None,
                    "height": 64 + (i % 5) * 16 if kind == "image" else None,
                    "duration_ms": 1000 + i * 37 if kind != "image" else None,
                    "codec": {"image": "png", "audio": "opus", "video": "av1"}[kind],
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector derived from the payload digest."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little", signed=False) % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _real_feature(payload: bytes, dim: int, extra=()) -> np.ndarray:
    """Fixed-dim feature vector from a REALLY decoded payload.

    image: [w, h, channels, mean, std, quadrant means(4), channel means(3)]
    audio: [sample_rate, n_samples, channels, rms, zero-crossing rate, peak,
            coarse |rFFT| band means(8)]
    video: [n_frames, w, h, luma mean, luma std, first/last frame means]
    padded with zeros / truncated to `dim`.
    """
    kind = codecs.sniff_kind(payload, extra)
    if kind is None:
        raise NotImplementedError(
            "payload is not a format the built-in codecs decode "
            "(PPM/PGM/BMP/PNG/JPEG/WAV/Y4M) and no registered codec "
            "matches (codecs.register_codec plugs external-library "
            "decoders in)"
        )
    if kind == "image":
        img = codecs.decode_image(payload, extra)
        chans = 1 if img.ndim == 2 else img.shape[2]
        gray = img.astype(np.float64) if img.ndim == 2 else img.mean(axis=2)
        h, w = gray.shape
        q = [
            gray[: h // 2 or 1, : w // 2 or 1].mean(),
            gray[: h // 2 or 1, w // 2 :].mean() if w > 1 else 0.0,
            gray[h // 2 :, : w // 2 or 1].mean() if h > 1 else 0.0,
            gray[h // 2 :, w // 2 :].mean() if h > 1 and w > 1 else 0.0,
        ]
        ch = (
            [img[:, :, c].mean() for c in range(3)]
            if img.ndim == 3
            else [gray.mean()] * 3
        )
        vals = [w, h, chans, gray.mean(), gray.std(), *q, *ch]
    elif kind == "audio":
        x, sr = codecs.decode_wav(payload, extra)
        mono = x.mean(axis=1)
        n = len(mono)
        rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
        zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
        peak = float(np.max(np.abs(mono))) if n else 0.0
        spec = np.abs(np.fft.rfft(mono[: min(n, 2048)]))
        bands = [float(b.mean()) if len(b) else 0.0 for b in np.array_split(spec, 8)]
        vals = [sr, n, x.shape[1], rms, zcr, peak, *bands]
    else:  # video
        luma, hdr = codecs.decode_y4m(payload, extra)
        f = luma.shape[0]
        lm = luma.astype(np.float64)
        vals = [
            f,
            hdr["width"],
            hdr["height"],
            lm.mean() if f else 0.0,
            lm.std() if f else 0.0,
            lm[0].mean() if f else 0.0,
            lm[-1].mean() if f else 0.0,
        ]
    v = np.zeros(dim, dtype=np.float32)
    v[: min(dim, len(vals))] = np.asarray(vals[:dim], dtype=np.float32)
    return v


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    fake=False REALLY decodes self-describing payloads (PPM/PGM/BMP/WAV/Y4M
    via `sources/codecs.py`, plus any `codecs.register_codec` decoders —
    registered BEFORE this call so the snapshot rides the UDF closure) and
    raises NotImplementedError only for compressed codecs nothing can
    decode. Per-payload NumPy kernels inside Arrow batches — the
    per-payload Python dispatch is inherent to variable-size binary; all
    pixel/sample math is vectorized.
    """
    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                feats.append(
                    (
                        _fake_decode(b, dim)
                        if fake
                        else _real_feature(b, dim, extra)
                    ).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize operator.

    fake=False REALLY decodes (PPM/PGM/BMP), nearest-neighbour resizes
    (floor sampling — integer-exact, SQL-replayable) and re-encodes as P6
    PPM, all inside one mapInPandas pass. fake=True keeps the metadata-only
    passthrough for payloads with compressed codecs.
    """
    imgs = media.filter(F.col("kind") == "image")
    if fake:
        return imgs.withColumn(
            "meta",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.codec").alias("codec"),
            ),
        )

    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = codecs.decode_image(bytes(payload), extra)
                small = codecs.resize_nearest(img, width, height)
                if small.ndim == 2:  # grayscale -> replicate to RGB for P6
                    small = np.repeat(small[:, :, None], 3, axis=2)
                out.append(bytearray(codecs.encode_ppm(small)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": out,
                    "width": width,
                    "height": height,
                    "codec": "ppm",
                }
            )

    return imgs.mapInPandas(
        gen,
        schema="media_id string, kind string, payload binary, "
        "width int, height int, codec string",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode over a computed timestamp sequence — the decode of
    each frame is the stubbed part for compressed codecs, the row explosion
    is real). For REAL per-frame decode of Y4M payloads use
    `sample_frames_decoded`."""
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return vids.select(
        "media_id",
        F.explode(stamps).alias("frame_ms"),
        "payload",
    )


def sample_frames_decoded(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL frame sampling for Y4M payloads: decode, take every `stride`-th
    frame, emit integer-exact per-frame luma sums (one output row per
    sampled frame). The fan-out happens worker-side inside mapInPandas —
    no driver involvement, scales with total frame count."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    vids = media.filter(F.col("kind") == "video")
    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums, widths, heights = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                luma, hdr = codecs.decode_y4m(bytes(payload), extra)
                for k in range(0, luma.shape[0], stride):
                    ids.append(media_id)
                    idxs.append(k)
                    sums.append(int(luma[k].sum(dtype=np.int64)))
                    widths.append(hdr["width"])
                    heights.append(hdr["height"])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "luma_sum": sums,
                    "width": widths,
                    "height": heights,
                }
            )

    return vids.mapInPandas(
        gen,
        schema="media_id string, frame_idx int, luma_sum bigint, "
        "width int, height int",
    )


# ---------------------------------------------------------------------------
# REAL media: deterministic synthesis + integer-exact decode stats
#
# The generators below produce REAL payload bytes (P6 PPM / PCM16 WAV /
# Y4M) whose content is a closed-form function of the row index, so a SQL
# oracle can recompute every decoded statistic analytically — proving the
# decoders read every pixel/sample, not just the headers.


def _synth_image_payload(i: int) -> tuple[bytes, int, int, int]:
    """P6 gradient: r=x, g=y, b=(i*7)%256. Returns (payload, w, h, b)."""
    w = 16 + (i % 8) * 8
    h = 16 + (i % 5) * 8
    b = (i * 7) % 256
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]
    img[:, :, 2] = b
    return codecs.encode_ppm(img), w, h, b


def _synth_audio_payload(i: int) -> tuple[bytes, int, int, int, int]:
    """PCM16 mono square wave, amplitude A, half-period hp samples.
    Returns (payload, sample_rate, n_samples, A, hp)."""
    sr = 8000
    n = 800
    amp = 1000 + (i % 7) * 500
    hp = 2 + (i % 5)
    t = np.arange(n)
    wave = np.where((t // hp) % 2 == 0, amp, -amp).astype(np.int16)
    return codecs.encode_wav(wave, sr), sr, n, amp, hp


def _synth_video_payload(i: int) -> tuple[bytes, int, int, int]:
    """Y4M 16x16, n_frames frames, frame k solid luma 16+((i*13+k*29)%220).
    Returns (payload, w, h, n_frames). n_frames keys on i//3 because video
    rows all share i%3==2."""
    w = h = 16
    nf = 3 + ((i // 3) % 3)
    luma = np.empty((nf, h, w), dtype=np.uint8)
    for k in range(nf):
        luma[k] = 16 + ((i * 13 + k * 29) % 220)
    return codecs.encode_y4m(luma), w, h, nf


def synth_media_real(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic REAL media table: payloads are valid PPM/WAV/Y4M bytes
    whose decoded statistics are closed-form in the row index (see the
    per-kind generators). kind cycles image/audio/video like synth_media."""
    rows = []
    for i in range(n):
        k = i % 3
        if k == 0:
            payload, w, h, _b = _synth_image_payload(i)
            meta = {"width": w, "height": h, "duration_ms": None, "codec": "ppm"}
            kind = "image"
        elif k == 1:
            payload, sr, ns, _a, _hp = _synth_audio_payload(i)
            meta = {
                "width": None,
                "height": None,
                "duration_ms": ns * 1000 // sr,
                "codec": "wav",
            }
            kind = "audio"
        else:
            payload, w, h, nf = _synth_video_payload(i)
            meta = {"width": w, "height": h, "duration_ms": nf * 40, "codec": "y4m"}
            kind = "video"
        rows.append((f"m{i:05d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_media_png(spark: SparkSession, n: int = 36) -> DataFrame:
    """Deterministic REAL PNG media table: the same closed-form gradient
    as `_synth_image_payload` (r=x, g=y, b=(i*7)%256), but DEFLATE-encoded
    as PNG with the filter type cycling through 0-4 + per-row "mixed" and
    interlace alternating off/Adam7 — so a header-only or partial decoder
    (missing a filter path or the interlace join) cannot reproduce the
    decode statistics."""
    rows = []
    filters = [0, 1, 2, 3, 4, "mixed"]
    for i in range(n):
        w = 16 + (i % 8) * 8
        h = 16 + (i % 5) * 8
        b = (i * 7) % 256
        img = np.empty((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
        img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]
        img[:, :, 2] = b
        payload = codecs.encode_png(
            img, filter_type=filters[i % 6], interlace=bool(i % 2)
        )
        rows.append(
            (
                f"g{i:05d}",
                "image",
                bytearray(payload),
                {"width": w, "height": h, "duration_ms": None, "codec": "png"},
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_media_jpeg(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic REAL JPEG media table on the exact-recovery subspace:
    grayscale images constant within each 8x8 block (value (11*bx + 23*by
    + 7*i) % 256) are DC-only under the DCT, so flat-quant baseline JPEG
    (`jpegcodec.encode_jpeg(quant='flat')`) round-trips them byte-exactly
    — the decode statistics stay closed-form in (i, w, h) while the
    payload still exercises Huffman tables, DC DPCM chaining across
    blocks, bit-unstuffing, and (on every 3rd row) restart-marker resync.
    """
    from fel_spark.sources.jpegcodec import encode_jpeg

    rows = []
    for i in range(n):
        w = 8 * (2 + (i % 5))
        h = 8 * (2 + (i % 4))
        by, bx = np.mgrid[0 : h // 8, 0 : w // 8]
        vals = (11 * bx + 23 * by + 7 * i) % 256
        img = np.repeat(np.repeat(vals.astype(np.uint8), 8, axis=0), 8, axis=1)
        payload = encode_jpeg(
            img, quant="flat", restart_interval=2 if i % 3 == 0 else 0
        )
        rows.append(
            (
                f"j{i:05d}",
                "image",
                bytearray(payload),
                {"width": w, "height": h, "duration_ms": None, "codec": "jpeg"},
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_media_flac(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic REAL FLAC media table: the `_synth_audio_payload`
    square waves (amplitude 1000 + (i%7)*500, half-period 2 + (i%5), 800
    samples at 8 kHz) FLAC-encoded losslessly — decode statistics carry
    the IDENTICAL closed forms as the WAV rows while the payload
    exercises Rice coding, fixed predictors, and the CRC/MD5 chain."""
    from fel_spark.sources.flaccodec import encode_flac

    rows = []
    sr, ns = 8000, 800
    t = np.arange(ns)
    for i in range(n):
        amp = 1000 + (i % 7) * 500
        hp = 2 + (i % 5)
        wave = np.where((t // hp) % 2 == 0, amp, -amp).astype(np.int64)
        payload = encode_flac(wave, sr, bps=16)
        rows.append(
            (
                f"f{i:05d}",
                "audio",
                bytearray(payload),
                {
                    "width": None,
                    "height": None,
                    "duration_ms": ns * 1000 // sr,
                    "codec": "flac",
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_media_gif(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic REAL GIF media table with an identity grayscale
    palette (index v -> RGB (v,v,v), so decoded sums are closed-form in
    the index pattern and Rec.601 luma equals the index exactly):

    - even i -> STATIC image `s####`: index (3x + 5y + 7i) % 256 over a
      w x h grid (w = 8 + (i%5)*8, h = 8 + (i%4)*8), interlaced when
      i % 4 == 0; decode_stats vsum = 3 * sum of indices (RGB replicate)
    - odd i  -> ANIMATED video `a####`: nf = 2 + (i%3) solid frames of
      luma 16 + ((i*13 + k*29) % 220) at 16x16 (the Y4M pattern), so
      vsum = 256 * sum of frame values

    Real LZW decode on the Spark side; the SQL oracle replays both closed
    forms analytically."""
    from fel_spark.sources.gifcodec import encode_gif

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w = 8 + (i % 5) * 8
            h = 8 + (i % 4) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            idx = ((3 * xx + 5 * yy + 7 * i) % 256).astype(np.uint8)
            payload = encode_gif(idx, pal, interlace=(i % 4 == 0))
            rows.append(
                (
                    f"s{i:05d}",
                    "image",
                    bytearray(payload),
                    {"width": w, "height": h, "duration_ms": None, "codec": "gif"},
                )
            )
        else:
            nf = 2 + (i % 3)
            frames = np.stack(
                [
                    np.full((16, 16), 16 + ((i * 13 + k * 29) % 220), dtype=np.uint8)
                    for k in range(nf)
                ]
            )
            payload = encode_gif(frames, pal)
            rows.append(
                (
                    f"a{i:05d}",
                    "video",
                    bytearray(payload),
                    {"width": 16, "height": 16, "duration_ms": nf * 40, "codec": "gif"},
                )
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode -> integer-exact per-row statistics (value-checkable).

    image: width/height/depth(=channels), units=pixel count,
           vsum = sum of all uint8 samples across channels
    audio: width=sample_rate, height=zero crossings, depth=channels,
           units=n_samples, vsum = sum |pcm16|
    video: width/height/depth(=n_frames), units = frames*w*h,
           vsum = total luma sum
    """
    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height", "depth", "units", "vsum")}
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                if kind == "image":
                    img = codecs.decode_image(b, extra)
                    hh, ww = img.shape[:2]
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    row = (ww, hh, ch, ww * hh, int(img.sum(dtype=np.int64)))
                elif kind == "audio":
                    x, sr = codecs.decode_wav(b, extra)
                    pcm = np.round(x * 32768.0).astype(np.int64)  # exact for PCM16
                    mono = pcm[:, 0]
                    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    row = (sr, zc, x.shape[1], len(mono), int(np.abs(pcm).sum()))
                else:
                    luma, hdr = codecs.decode_y4m(b, extra)
                    nf = luma.shape[0]
                    row = (
                        hdr["width"],
                        hdr["height"],
                        nf,
                        nf * hdr["width"] * hdr["height"],
                        int(luma.sum(dtype=np.int64)),
                    )
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                for key, v in zip(("width", "height", "depth", "units", "vsum"), row):
                    out[key].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen,
        schema="media_id string, kind string, width int, height int, "
        "depth int, units bigint, vsum bigint",
    )


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (cached): D @ x applies the 1-D DCT."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        d[0] /= np.sqrt(2.0)
        _DCT32 = d
    return _DCT32


def _phash_from_gray(gray: np.ndarray) -> int:
    """pHash core: gray float array -> 32x32 nearest resize -> 2-D DCT-II
    -> low-frequency 8x8 block -> bit per coefficient above the block
    median. Signed 64-bit (Spark LongType-compatible)."""
    small = codecs.resize_nearest(gray, 32, 32)
    d = _dct_matrix(32)
    coeffs = d @ small @ d.T
    block = coeffs[:8, :8].ravel()
    bits = block > np.median(block)
    return int(
        np.uint64(
            (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                dtype=np.uint64
            )
        ).view(np.int64)
    )


def phash64(payload: bytes, extra=()) -> int:
    """Perceptual hash of a REALLY decoded image. Near-identical images
    (small crops, noise, re-encodes) land within a few bits; unrelated
    images differ in ~32. Pure NumPy — two 32x32 GEMMs per image."""
    img = codecs.decode_image(payload, extra)
    gray = img.astype(np.float64) if img.ndim == 2 else img.mean(axis=2)
    return _phash_from_gray(gray)


def video_phash64(payload: bytes, extra=()) -> int:
    """Perceptual hash of a REALLY decoded Y4M video: pHash of the
    temporal-MEAN luma frame. Re-encodes and mild per-frame noise keep the
    mean frame (and so the hash) stable; different content diverges."""
    luma, _hdr = codecs.decode_y4m(payload, extra)
    if luma.shape[0] == 0:
        return 0
    return _phash_from_gray(luma.astype(np.float64).mean(axis=0))


def image_phash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, phash) for every image row — real decode + DCT pHash."""
    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": [phash64(bytes(p), extra) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen, schema=f"{id_col} string, phash long"
    )


def image_phash_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 6,
    bands: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs: pHash + the shared banded-Hamming
    kernel (`operators/dedup.banded_hamming_pairs` — same salt-capped
    block join and pigeonhole recall guarantee as SimHash text dedup).
    Returns (id_a, id_b, hamming)."""
    from fel_spark.operators.dedup import DEDUP_MAX_BLOCK, banded_hamming_pairs

    return banded_hamming_pairs(
        image_phash(media, id_col=id_col),
        id_col,
        "phash",
        bands=bands,
        max_hamming=max_hamming,
        max_block=max_block if max_block is not None else DEDUP_MAX_BLOCK,
    )


def audio_fingerprint64(
    payload: bytes, segs: int = 16, bands: int = 4, extra=()
) -> int:
    """Spectral fingerprint of a REALLY decoded WAV: mono -> 16 equal
    segments -> 4 band energies per segment (|rFFT|^2 quartiles) ->
    differential bit per (segment, band): energy rose vs the previous
    segment (segment 0 compares to the global band mean). 64 bits,
    noise-tolerant (mild noise flips a few bits; different tone mixes
    differ in ~17-40 — see the ground-truth test)."""
    x, _sr = codecs.decode_wav(payload, extra)
    mono = x.mean(axis=1)
    n = len(mono)
    seg = max(n // segs, 1)
    energy = np.zeros((segs, bands))
    for s in range(segs):
        chunk = mono[s * seg : (s + 1) * seg]
        if len(chunk) == 0:
            continue
        spec = np.abs(np.fft.rfft(chunk)) ** 2
        for b, part in enumerate(np.array_split(spec, bands)):
            energy[s, b] = part.sum()
    prev = np.vstack([energy.mean(axis=0, keepdims=True), energy[:-1]])
    bits = (energy > prev).ravel()[:64]
    return int(
        np.uint64(
            (bits.astype(np.uint64) << np.arange(len(bits), dtype=np.uint64)).sum(
                dtype=np.uint64
            )
        ).view(np.int64)
    )


def audio_fp_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 10,
    bands: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs: spectral fingerprint + the shared
    banded-Hamming kernel (same salt-capped join and pigeonhole recall
    guarantee as SimHash / image pHash). Returns (id_a, id_b, hamming)."""
    from fel_spark.operators.dedup import DEDUP_MAX_BLOCK, banded_hamming_pairs

    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": [
                        audio_fingerprint64(bytes(p), extra=extra)
                        for p in pdf["payload"]
                    ],
                }
            )

    d = media.filter(F.col("kind") == "audio").mapInPandas(
        gen, schema=f"{id_col} string, afp long"
    )
    return banded_hamming_pairs(
        d,
        id_col,
        "afp",
        bands=bands,
        max_hamming=max_hamming,
        max_block=max_block if max_block is not None else DEDUP_MAX_BLOCK,
    )


def video_fp_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 6,
    bands: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Video near-duplicate pairs: mean-frame pHash + the shared
    banded-Hamming kernel. Returns (id_a, id_b, hamming)."""
    from fel_spark.operators.dedup import DEDUP_MAX_BLOCK, banded_hamming_pairs

    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "vfp": [video_phash64(bytes(p), extra) for p in pdf["payload"]],
                }
            )

    d = media.filter(F.col("kind") == "video").mapInPandas(
        gen, schema=f"{id_col} string, vfp long"
    )
    return banded_hamming_pairs(
        d,
        id_col,
        "vfp",
        bands=bands,
        max_hamming=max_hamming,
        max_block=max_block if max_block is not None else DEDUP_MAX_BLOCK,
    )


def media_neardup_dedup(
    media: DataFrame, pairs: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Pairs -> transitive clusters -> keep one canonical per cluster.

    The same dedup-completion step the text pipeline uses
    (`operators/cluster.connected_components` + keep-min): any of the
    modality pair generators (`image_phash_pairs`, `audio_fp_pairs`,
    `video_fp_pairs`) plugs in. Rows absent from the pair set are
    singletons and always kept. Returns the kept subset of ``media``."""
    from fel_spark.operators.cluster import connected_components

    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return media.join(losers, id_col, "left_anti")


def synth_patterned_videos(
    spark: SparkSession, n: int = 12, seed: int = 31, with_neardups: bool = True
) -> DataFrame:
    """Deterministic Y4M clips: 4 frames of a seeded cosine pattern
    translating one pixel per frame (so frames differ but the mean frame is
    content-stable). When ``with_neardups``, each base v#### gets a w####
    copy with mild seeded per-frame pixel noise."""
    h = w = 48
    y, x = np.mgrid[0:h, 0:w]
    rows = []
    for i in range(n):
        r = np.random.RandomState(seed * 100_003 + i)
        base = np.zeros((h, w))
        for _ in range(4):
            fy, fx = r.uniform(0.5, 3, 2)
            ph = r.uniform(0, 2 * np.pi)
            base += r.uniform(0.5, 1.5) * np.cos(
                2 * np.pi * (fy * y / h + fx * x / w) + ph
            )
        base = ((base - base.min()) / (base.ptp() + 1e-9) * 255).astype(np.uint8)
        frames = np.stack([np.roll(base, k, axis=1) for k in range(4)])
        meta = {"width": w, "height": h, "duration_ms": 160, "codec": "y4m"}
        rows.append(
            (f"v{i:04d}", "video", bytearray(codecs.encode_y4m(frames)), meta)
        )
        if with_neardups:
            pr = np.random.RandomState(seed * 100_003 + i + 50_000)
            noisy = np.clip(
                frames.astype(int) + pr.randint(-6, 7, frames.shape), 0, 255
            ).astype(np.uint8)
            rows.append(
                (f"w{i:04d}", "video", bytearray(codecs.encode_y4m(noisy)), meta)
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_toned_audio(
    spark: SparkSession, n: int = 16, seed: int = 23, with_neardups: bool = True
) -> DataFrame:
    """Deterministic tone-mix WAVs (sum of 3 seeded enveloped sines,
    4000 samples PCM16). When ``with_neardups``, each base a#### gets a
    b#### copy with mild seeded noise — a planted near-dup ground truth
    for `audio_fp_pairs`."""
    rows = []
    t = np.arange(4000)
    for i in range(n):
        r = np.random.RandomState(seed * 100_003 + i)
        sig = np.zeros(4000)
        for _ in range(3):
            f = r.uniform(0.01, 0.2)
            ph = r.uniform(0, 6)
            env_f = r.uniform(0.0005, 0.002)
            sig += r.uniform(0.5, 1.0) * np.sin(2 * np.pi * f * t + ph) * (
                1 + np.sin(2 * np.pi * env_f * t)
            )
        pcm = np.clip(np.round(sig / (np.abs(sig).max() + 1e-9) * 20000), -32768, 32767)
        meta = {"width": None, "height": None, "duration_ms": 500, "codec": "wav"}
        rows.append(
            (
                f"a{i:04d}",
                "audio",
                bytearray(codecs.encode_wav(pcm.astype(np.int16), 8000)),
                meta,
            )
        )
        if with_neardups:
            pr = np.random.RandomState(seed * 100_003 + i + 50_000)
            noisy = np.clip(pcm + np.round(pr.randn(4000) * 0.03 * pcm.std()), -32768, 32767)
            rows.append(
                (
                    f"b{i:04d}",
                    "audio",
                    bytearray(codecs.encode_wav(noisy.astype(np.int16), 8000)),
                    meta,
                )
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_patterned_images(
    spark: SparkSession, n: int = 24, seed: int = 11, with_neardups: bool = True
) -> DataFrame:
    """Deterministic low-frequency cosine-pattern images (pHash needs
    frequency content — the gradient images of `synth_media_real` are all
    the same ramp after resize). Base rows p####; when ``with_neardups``,
    each base gets a q#### copy with 30 slightly-perturbed pixels — a
    planted near-duplicate ground truth (perturbed copies land within a
    couple of pHash bits, unrelated patterns ~30 apart)."""
    h = w = 48
    y, x = np.mgrid[0:h, 0:w]
    rows = []
    for i in range(n):
        r = np.random.RandomState(seed * 100_003 + i)
        img = np.zeros((h, w))
        for _ in range(4):
            fy, fx = r.uniform(0.5, 3, 2)
            ph = r.uniform(0, 2 * np.pi)
            img += r.uniform(0.5, 1.5) * np.cos(2 * np.pi * (fy * y / h + fx * x / w) + ph)
        img = ((img - img.min()) / (img.ptp() + 1e-9) * 255).astype(np.uint8)
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        meta = {"width": w, "height": h, "duration_ms": None, "codec": "ppm"}
        rows.append((f"p{i:04d}", "image", bytearray(codecs.encode_ppm(rgb)), meta))
        if with_neardups:
            pert = rgb.copy()
            pr = np.random.RandomState(seed * 100_003 + i + 50_000)
            for yy, xx in pr.randint(0, h, (30, 2)):
                pert[yy, xx] = np.clip(
                    pert[yy, xx].astype(int) + pr.randint(-20, 21, 3), 0, 255
                )
            rows.append(
                (f"q{i:04d}", "image", bytearray(codecs.encode_ppm(pert)), meta)
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_filter_decisions(
    media: DataFrame,
    min_width: int = 8,
    min_height: int = 8,
    min_samples: int = 400,
    min_frames: int = 2,
) -> DataFrame:
    """Per-row media quality flags + keep (the `corpus_filter_decisions`
    analogue for binary columns). Decode failures are a FLAG, not a crash —
    at 100 TB one corrupt payload must not kill the run, so every decode is
    fenced and undecodable rows come back keep=false, reason='undecodable'.

    Rules (image: min dims; audio: min sample count; video: min frames)
    are deliberately cheap — they need only the decoded shape, which the
    pure-NumPy codecs produce in one pass. Registered codecs
    (`codecs.register_codec`, snapshot captured here at plan-build time)
    extend what counts as decodable — a deployment with PIL/ffmpeg plugs
    png/jpeg/opus in without touching this operator.
    """
    extra = codecs.codec_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, keeps, reasons = [], [], [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                keep, reason = True, ""
                try:
                    b = bytes(payload)
                    sniffed = codecs.sniff_kind(b, extra)
                    if sniffed is None:
                        keep, reason = False, "undecodable"
                    elif sniffed != kind:
                        keep, reason = False, "kind_mismatch"
                    elif kind == "image":
                        img = codecs.decode_image(b, extra)
                        h, w = img.shape[:2]
                        if w < min_width or h < min_height:
                            keep, reason = False, "too_small"
                    elif kind == "audio":
                        x, _sr = codecs.decode_wav(b, extra)
                        if len(x) < min_samples:
                            keep, reason = False, "too_short"
                    else:
                        luma, _hdr = codecs.decode_y4m(b, extra)
                        if luma.shape[0] < min_frames:
                            keep, reason = False, "too_few_frames"
                except Exception:  # noqa: BLE001 — the FILTER is the one
                    # place a decode failure must flag, never crash; with
                    # registered third-party codecs in the loop the failure
                    # surface is no longer just (ValueError, struct.error,
                    # IndexError)
                    keep, reason = False, "undecodable"
                ids.append(media_id)
                kinds.append(kind)
                keeps.append(keep)
                reasons.append(reason)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "keep": keeps, "reason": reasons}
            )

    return media.mapInPandas(
        gen, schema="media_id string, kind string, keep boolean, reason string"
    )
