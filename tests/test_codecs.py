"""Pure-NumPy media codecs (sources/codecs.py) + the real-decode Spark
surface (sources/multimodal.py fake=False paths)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fel_spark.sources import codecs as C


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w, c) if c > 1 else (h, w)
    return rng.randint(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# netpbm


def test_ppm_roundtrip():
    img = _rand_img(7, 5)
    assert np.array_equal(C.decode_netpbm(C.encode_ppm(img)), img)


def test_pgm_roundtrip_8_and_16bit():
    g = _rand_img(4, 9, c=1, seed=1)
    assert np.array_equal(C.decode_netpbm(C.encode_pgm(g)), g)
    g16 = np.random.RandomState(2).randint(0, 60000, (3, 4)).astype(np.uint16)
    out = C.decode_netpbm(C.encode_pgm(g16, maxval=65535))
    assert out.dtype == np.uint16 and np.array_equal(out, g16)


def test_netpbm_ascii_and_comments():
    p2 = b"P2\n# a comment\n3 2\n255\n0 1 2\n3 4 5\n"
    assert C.decode_netpbm(p2).tolist() == [[0, 1, 2], [3, 4, 5]]
    p3 = b"P3 2 1 255  1 2 3  4 5 6\n"
    assert C.decode_netpbm(p3).tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_netpbm_truncated_raster_raises():
    img = _rand_img(4, 4)
    with pytest.raises(ValueError):
        C.decode_netpbm(C.encode_ppm(img)[:-5])


# ---------------------------------------------------------------------------
# BMP


def _make_bmp(rows_top, bpp=24, bottom_up=True):
    h = len(rows_top)
    w = len(rows_top[0])
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3

    def row(px_row):
        out = b""
        for r, g, b in px_row:
            out += bytes([b, g, r] + ([0] if bpp == 32 else []))
        return out.ljust(stride, b"\0")

    order = reversed(rows_top) if bottom_up else rows_top
    raster = b"".join(row(r) for r in order)
    h_field = h if bottom_up else -h
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h_field, 1, bpp, 0, len(raster), 0, 0, 0, 0)
    )
    return hdr + raster


_PIX = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)], [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]


def test_bmp_24bpp_bottom_up_with_padding():
    assert C.decode_bmp(_make_bmp(_PIX)).tolist() == [
        [list(p) for p in row] for row in _PIX
    ]


def test_bmp_top_down_and_32bpp():
    assert C.decode_bmp(_make_bmp(_PIX, bottom_up=False)).tolist() == [
        [list(p) for p in row] for row in _PIX
    ]
    assert C.decode_bmp(_make_bmp(_PIX, bpp=32)).tolist() == [
        [list(p) for p in row] for row in _PIX
    ]


def test_bmp_compressed_rejected():
    bad = bytearray(_make_bmp(_PIX))
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        C.decode_bmp(bytes(bad))


# ---------------------------------------------------------------------------
# WAV


def test_wav_pcm16_stereo_roundtrip():
    pcm = np.random.RandomState(3).randint(-30000, 30000, (100, 2)).astype(np.int16)
    x, sr = C.decode_wav(C.encode_wav(pcm, 44100))
    assert sr == 44100 and x.shape == (100, 2)
    assert np.array_equal(np.round(x * 32768).astype(np.int16), pcm)


def test_wav_8bit_24bit_float():
    # 8-bit unsigned
    data8 = bytes([0, 128, 255])
    hdr8 = (
        b"RIFF" + struct.pack("<I", 36 + 3) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 3)
    )
    x, sr = C.decode_wav(hdr8 + data8 + b"\0")  # odd size -> pad byte
    assert sr == 8000 and np.allclose(x[:, 0], [-1.0, 0.0, 127 / 128])
    # 24-bit signed little-endian: min, zero, max
    s24 = b"\x00\x00\x80" + b"\x00\x00\x00" + b"\xff\xff\x7f"
    hdr24 = (
        b"RIFF" + struct.pack("<I", 36 + 9) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 24000, 3, 24)
        + b"data" + struct.pack("<I", 9)
    )
    x24, _ = C.decode_wav(hdr24 + s24 + b"\0")
    assert np.allclose(x24[:, 0], [-1.0, 0.0, (2**23 - 1) / 2**23])
    # IEEE float32
    f32 = np.array([-0.5, 0.25, 1.0], dtype="<f4").tobytes()
    hdrf = (
        b"RIFF" + struct.pack("<I", 36 + 12) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        + b"data" + struct.pack("<I", 12)
    )
    xf, _ = C.decode_wav(hdrf + f32)
    assert np.allclose(xf[:, 0], [-0.5, 0.25, 1.0])


def test_wav_chunk_walk_skips_list():
    pcm = np.arange(10, dtype=np.int16)
    full = C.encode_wav(pcm, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    listed = full[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO" + full[fmt_end:]
    fixed = bytearray(listed)
    struct.pack_into("<I", fixed, 4, len(fixed) - 8)
    x, sr = C.decode_wav(bytes(fixed))
    assert np.array_equal(np.round(x[:, 0] * 32768).astype(np.int16), pcm)


# ---------------------------------------------------------------------------
# Y4M


def test_y4m_roundtrip_and_chroma_modes():
    luma = np.random.RandomState(4).randint(0, 256, (4, 6, 8), dtype=np.uint8)
    for chroma in ("420", "422", "444"):
        out, hdr = C.decode_y4m(C.encode_y4m(luma, chroma=chroma))
        assert hdr["chroma"] == chroma
        assert np.array_equal(out, luma)


def test_y4m_truncated_frame_raises():
    luma = np.zeros((2, 4, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        C.decode_y4m(C.encode_y4m(luma)[:-3])


# ---------------------------------------------------------------------------
# resize


def test_resize_nearest_floor_semantics():
    img = _rand_img(7, 5, seed=5)
    out = C.resize_nearest(img, 2, 3)
    ys = (np.arange(3) * 7) // 3
    xs = (np.arange(2) * 5) // 2
    assert np.array_equal(out, img[ys][:, xs])
    # upscale replicates
    up = C.resize_nearest(np.array([[1, 2]], dtype=np.uint8), 4, 2)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


# ---------------------------------------------------------------------------
# sniff + Spark surface


def test_sniff_kind():
    assert C.sniff_kind(C.encode_ppm(_rand_img(2, 2))) == "image"
    assert C.sniff_kind(_make_bmp(_PIX)) == "image"
    assert C.sniff_kind(C.encode_wav(np.zeros(4, dtype=np.int16), 8000)) == "audio"
    assert C.sniff_kind(C.encode_y4m(np.zeros((1, 2, 2), dtype=np.uint8))) == "video"
    # PNG and baseline JPEG are decodable built-in as of r5; compressed
    # audio/video (e.g. Ogg/Opus, Matroska) are not
    assert C.sniff_kind(b"\x89PNG\r\n\x1a\n") == "image"
    assert C.sniff_kind(b"\xff\xd8\xff\xe0rest") == "image"
    assert C.sniff_kind(b"OggS\x00rest") is None
    assert C.sniff_kind(b"\x1a\x45\xdf\xa3rest") is None


def test_real_feature_compressed_codec_raises():
    from fel_spark.sources.multimodal import _real_feature

    # Ogg/Opus genuinely needs an external library -> honest stub
    with pytest.raises(NotImplementedError):
        _real_feature(b"OggS\x00rest", 16)
    # PNG/JPEG with a valid signature but garbage bytes is a DECODE error
    # (flows to the corrupt-audit path), not a missing-codec error
    with pytest.raises(ValueError):
        _real_feature(b"\x89PNG\r\n\x1a\nrest", 16)
    with pytest.raises(ValueError):
        _real_feature(b"\xff\xd8\xff\xe0rest", 16)


def test_extract_features_real_path(spark):
    from fel_spark.sources.multimodal import extract_features, synth_media_real

    media = synth_media_real(spark, 12)
    rows = extract_features(media, dim=16, fake=False).collect()
    assert len(rows) == 12
    by_id = {r.media_id: r for r in rows}
    # image m00000: w=16, h=16 -> feat[0]=16, feat[1]=16, feat[2]=3 channels
    assert by_id["m00000"].feat[:3] == [16.0, 16.0, 3.0]
    # audio m00001: sr=8000, n=800, mono
    assert by_id["m00001"].feat[:3] == [8000.0, 800.0, 1.0]
    # video m00002: nf=3, 16x16
    assert by_id["m00002"].feat[:3] == [3.0, 16.0, 16.0]


def test_decode_stats_matches_closed_form(spark):
    from fel_spark.sources.multimodal import decode_stats, synth_media_real

    stats = {r.media_id: r for r in decode_stats(synth_media_real(spark, 9)).collect()}
    # image i=0: w=h=16, b=0 -> vsum = 16*120 + 16*120 + 0
    assert stats["m00000"].vsum == 16 * (16 * 15 // 2) * 2
    # audio i=1: amp=1500, n=800 -> vsum = 1.2M; zc = 799 // 3
    assert stats["m00001"].vsum == 800 * 1500
    assert stats["m00001"].height == 799 // 3
    # video i=2: nf=3, frames solid 16+((26+29k)%220)
    expect = 256 * sum(16 + ((2 * 13 + k * 29) % 220) for k in range(3))
    assert stats["m00002"].vsum == expect


def test_codec_roundtrip_fuzz():
    """Seeded fuzz (repo idiom: one seeded batch, not per-example jobs):
    random shapes/dtypes through every encode->decode pair, widths chosen
    to hit every BMP row-padding residue and odd WAV data sizes."""
    rng = np.random.RandomState(1234)
    for trial in range(40):
        h = int(rng.randint(1, 33))
        w = int(rng.randint(1, 33))
        # netpbm color / gray / 16-bit
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(C.decode_netpbm(C.encode_ppm(img)), img)
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(C.decode_netpbm(C.encode_pgm(g)), g)
        g16 = rng.randint(0, 65536, (h, w)).astype(np.uint16)
        assert np.array_equal(C.decode_netpbm(C.encode_pgm(g16, maxval=65535)), g16)
        # BMP: every padding residue via w in 1..32, both orientations, both depths
        pix = [[tuple(int(v) for v in rng.randint(0, 256, 3)) for _ in range(w)] for _ in range(h)]
        for bpp in (24, 32):
            for bottom_up in (True, False):
                out = C.decode_bmp(_make_bmp(pix, bpp=bpp, bottom_up=bottom_up))
                assert out.tolist() == [[list(p) for p in r] for r in pix]
        # WAV PCM16, 1-3 channels, odd/even lengths
        ch = int(rng.randint(1, 4))
        n = int(rng.randint(1, 200))
        pcm = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        x, sr = C.decode_wav(C.encode_wav(pcm, 8000))
        assert sr == 8000 and np.array_equal(np.round(x * 32768).astype(np.int16), pcm)
        # Y4M: even dims (chroma subsampling), every mode
        he, we = (h + h % 2), (w + w % 2)
        luma = rng.randint(0, 256, (int(rng.randint(1, 5)), he, we)).astype(np.uint8)
        for chroma in ("420", "422", "444"):
            out, hdr = C.decode_y4m(C.encode_y4m(luma, chroma=chroma))
            assert np.array_equal(out, luma), (trial, chroma)
        # resize vs naive gather
        tw, th = int(rng.randint(1, 17)), int(rng.randint(1, 17))
        got = C.resize_nearest(img, tw, th)
        naive = np.array(
            [[img[(yd * h) // th, (xd * w) // tw] for xd in range(tw)] for yd in range(th)]
        )
        assert np.array_equal(got, naive)


def test_resize_images_real_roundtrip(spark):
    from fel_spark.sources.multimodal import (
        decode_stats,
        resize_images,
        synth_media_real,
    )

    small = resize_images(synth_media_real(spark, 6), 8, 6, fake=False)
    rows = {r.media_id: r for r in decode_stats(small).collect()}
    # i=0: w=h=16, b=0; vsum = sum((xd*16)//8 + (yd*16)//6) over 8x6
    expect = 6 * sum((xd * 16) // 8 for xd in range(8)) + 8 * sum(
        (yd * 16) // 6 for yd in range(6)
    )
    assert rows["m00000"].vsum == expect
    assert rows["m00000"].width == 8 and rows["m00000"].height == 6


def test_image_phash_pairs_ground_truth(spark):
    """Planted near-dup recovery: every perturbed copy pairs with its base
    (and nothing else) through the full Spark chain — real decode, DCT
    pHash, banded-Hamming block join, exact verification."""
    from fel_spark.sources.multimodal import image_phash_pairs, synth_patterned_images

    media = synth_patterned_images(spark, 12)
    pairs = image_phash_pairs(media, max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    want = {(f"p{i:04d}", f"q{i:04d}") for i in range(12)}
    assert got == want
    assert all(r.hamming <= 6 for r in pairs)


def test_phash_invariance_and_separation():
    from fel_spark.sources import codecs as C
    from fel_spark.sources.multimodal import phash64

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    h1 = phash64(C.encode_ppm(img))
    # byte-identical payload -> identical hash
    assert phash64(C.encode_ppm(img.copy())) == h1
    # grayscale PGM of the channel mean -> same hash (gray conversion path)
    gray = img.mean(axis=2).astype(np.uint8)
    h_gray = phash64(C.encode_pgm(gray))
    assert isinstance(h_gray, int)


def test_banded_hamming_bands_guard():
    import pytest as _pytest

    from fel_spark.operators.dedup import banded_hamming_pairs

    with _pytest.raises(ValueError):
        banded_hamming_pairs(None, "id", "h", bands=3, max_hamming=6)


def test_audio_fp_pairs_ground_truth(spark):
    """Planted noisy copies pair with their base tones (and nothing else)
    through the full chain — real WAV decode, spectral fingerprint,
    banded-Hamming block join, exact verification."""
    from fel_spark.sources.multimodal import audio_fp_pairs, synth_toned_audio

    media = synth_toned_audio(spark, 10)
    pairs = audio_fp_pairs(media, max_hamming=10).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    want = {(f"a{i:04d}", f"b{i:04d}") for i in range(10)}
    assert got == want
    assert all(r.hamming <= 10 for r in pairs)


def test_video_fp_pairs_ground_truth(spark):
    """Planted noisy clips pair with their base (and nothing else) —
    real Y4M decode, mean-frame pHash, banded-Hamming join."""
    from fel_spark.sources.multimodal import synth_patterned_videos, video_fp_pairs

    media = synth_patterned_videos(spark, 8)
    pairs = video_fp_pairs(media, max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    want = {(f"v{i:04d}", f"w{i:04d}") for i in range(8)}
    assert got == want


def test_media_neardup_dedup_keeps_one_per_cluster(spark):
    from fel_spark.sources.multimodal import (
        image_phash_pairs,
        media_neardup_dedup,
        synth_patterned_images,
    )

    media = synth_patterned_images(spark, 6)  # 6 bases + 6 planted copies
    pairs = image_phash_pairs(media, max_hamming=6)
    kept = media_neardup_dedup(media, pairs)
    ids = {r.media_id for r in kept.select("media_id").collect()}
    # exactly one survivor per (p_i, q_i) cluster: the min id, i.e. p_i
    assert ids == {f"p{i:04d}" for i in range(6)}


# ---------------------------------------------------------------------------
# pluggable codec registry (register_codec): a stub "compressed" format
# flows through decode -> filter -> near-dup without touching any operator


@pytest.fixture()
def zimg_codec():
    """Register a stub raw-pixel format: b'ZIMG' + <HH>(w,h) + w*h gray
    bytes. Defined as a LOCAL function so cloudpickle must ship it to the
    Python workers by value — the real propagation path for a user codec
    registered on the driver."""

    def decode_zimg(payload: bytes) -> np.ndarray:
        w, h = struct.unpack_from("<HH", payload, 4)
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
        return px.reshape(h, w).copy()

    C.register_codec(b"ZIMG", "image", decode_zimg)
    yield decode_zimg
    assert C.unregister_codec(b"ZIMG")


def _zimg_payload(gray: np.ndarray) -> bytearray:
    h, w = gray.shape
    return bytearray(
        b"ZIMG" + struct.pack("<HH", w, h) + gray.astype(np.uint8).tobytes()
    )


def _zimg_rows():
    from fel_spark.sources.multimodal import MEDIA_SCHEMA  # noqa: F401

    # cosine pattern, not a linear ramp: a pure ramp's low-freq DCT block
    # sits almost entirely AT the median, so its pHash bits are chaotic
    # under tiny perturbations — exactly the degenerate input pHash is not
    # built for (measured: ramp a-b hamming 32, cosine a-b hamming 0)
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (
        127 + 80 * np.cos(2 * np.pi * xx / 17.0) * np.cos(2 * np.pi * yy / 11.0)
    ).astype(np.uint8)
    pert = grad.copy()
    pr = np.random.RandomState(7)
    for y, x in pr.randint(0, h, (20, 2)):
        pert[y, x % w] = np.clip(int(pert[y, x % w]) + pr.randint(-15, 16), 0, 255)
    other = (
        127 + 80 * np.cos(2 * np.pi * xx / 5.0 + 1.3) * np.cos(2 * np.pi * yy / 23.0)
    ).astype(np.uint8)
    tiny = grad[:4, :6].copy()
    meta = {"width": None, "height": None, "duration_ms": None, "codec": "zimg"}
    return [
        ("z_a", "image", _zimg_payload(grad), meta),
        ("z_b", "image", _zimg_payload(pert), meta),   # planted near-dup of z_a
        ("z_c", "image", _zimg_payload(other), meta),  # unrelated
        ("z_tiny", "image", _zimg_payload(tiny), meta),  # fails min dims
    ]


def test_registered_codec_decode_filter_neardup_e2e(spark, zimg_codec):
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        decode_stats,
        extract_features,
        image_phash_pairs,
        media_filter_decisions,
        media_neardup_dedup,
    )

    media = spark.createDataFrame(_zimg_rows(), schema=MEDIA_SCHEMA)

    # decode: stats are computed from REALLY decoded registry pixels
    stats = {r.media_id: r for r in decode_stats(media).collect()}
    grad = _zimg_rows()[0][2]
    assert stats["z_a"].width == 48 and stats["z_a"].height == 32
    assert stats["z_a"].vsum == int(
        np.frombuffer(bytes(grad[8:]), dtype=np.uint8).sum()
    )

    # feature extraction: no NotImplementedError for the registered magic
    feats = extract_features(media, dim=8, fake=False).collect()
    assert len(feats) == 4 and all(len(r.feat) == 8 for r in feats)

    # filter: registered payloads decode (keep), the tiny one trips the
    # min-dims rule, an unregistered magic still flags undecodable
    from fel_spark.sources.multimodal import MEDIA_SCHEMA as MS

    bad = spark.createDataFrame(
        [("z_bad", "image", bytearray(b"NOPE1234"),
          {"width": None, "height": None, "duration_ms": None, "codec": "?"})],
        schema=MS,
    )
    dec = {
        r.media_id: r
        for r in media_filter_decisions(
            media.unionByName(bad), min_width=8, min_height=8
        ).collect()
    }
    assert dec["z_a"].keep and dec["z_b"].keep and dec["z_c"].keep
    assert not dec["z_tiny"].keep and dec["z_tiny"].reason == "too_small"
    assert not dec["z_bad"].keep and dec["z_bad"].reason == "undecodable"

    # near-dup: exactly the planted pair, through the shared banded-Hamming
    # kernel; dedup completion keeps one canonical of the pair
    pairs = image_phash_pairs(media, max_hamming=6).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("z_a", "z_b")}
    kept = {r.media_id for r in media_neardup_dedup(
        media, image_phash_pairs(media, max_hamming=6)
    ).collect()}
    assert kept == {"z_a", "z_c", "z_tiny"}


def test_unregistered_zimg_is_undecodable(spark):
    """Without the registration the same payloads are honestly stubbed:
    sniff returns None, the filter flags undecodable, and the real-decode
    feature path raises NotImplementedError."""
    from fel_spark.sources.multimodal import media_filter_decisions, _real_feature

    rows = _zimg_rows()
    assert C.sniff_kind(bytes(rows[0][2])) is None
    with pytest.raises(NotImplementedError):
        _real_feature(bytes(rows[0][2]), 8)
    from fel_spark.sources.multimodal import MEDIA_SCHEMA

    dec = media_filter_decisions(
        spark.createDataFrame(rows[:1], schema=MEDIA_SCHEMA)
    ).collect()
    assert not dec[0].keep and dec[0].reason == "undecodable"


def test_registered_codec_overrides_builtin():
    """Longest-magic-first and registry-over-builtin precedence: a codec
    registered for the BMP magic replaces the pure-NumPy BMP path."""
    marker = np.full((2, 3), 7, dtype=np.uint8)
    C.register_codec(b"BM", "image", lambda p: marker)
    try:
        some_bmp = C.encode_ppm(_rand_img(2, 3))  # not BMP; builtin path
        assert C.decode_image(some_bmp, C.codec_snapshot()).shape == (2, 3, 3)
        assert np.array_equal(
            C.decode_image(b"BMxxxx", C.codec_snapshot()), marker
        )
        # without the snapshot the builtin dispatch is untouched
        with pytest.raises(Exception):
            C.decode_image(b"BMxxxx")
    finally:
        assert C.unregister_codec(b"BM")


# ---------------------------------------------------------------------------
# PNG (r5: real stdlib-zlib decoder)


def test_png_roundtrip_filters_and_interlace():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (7, 9), (16, 16), (33, 17)]:
        for color in (False, True):
            for dtype in (np.uint8, np.uint16):
                hi = 256 if dtype == np.uint8 else 65536
                full = shape + ((3,) if color else ())
                arr = rng.randint(0, hi, size=full).astype(dtype)
                for ft in (0, 1, 2, 3, 4, "mixed"):
                    for il in (False, True):
                        dec = C.decode_png(C.encode_png(arr, filter_type=ft, interlace=il))
                        assert dec.dtype == arr.dtype and np.array_equal(dec, arr), (
                            shape, color, dtype, ft, il)


# The canonical Adam7 pass-number grid from the PNG spec (§ Interlaced data
# order) — written here as a LITERAL so the test's pixel scattering is
# independent of the decoder's _ADAM7 start/step arithmetic.
_ADAM7_SPEC_GRID = [
    [1, 6, 4, 6, 2, 6, 4, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [5, 6, 5, 6, 5, 6, 5, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [3, 6, 4, 6, 3, 6, 4, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [5, 6, 5, 6, 5, 6, 5, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
]


def test_png_adam7_decode_vs_spec_grid():
    """Hand-assemble an interlaced grayscale PNG by scanning the spec's 8x8
    pass grid (not the decoder's pass arithmetic) and check decode."""
    import zlib

    w, h = 9, 7
    img = np.fromfunction(lambda y, x: (37 * y + 5 * x) % 256, (h, w)).astype(np.uint8)
    raster = bytearray()
    for p in range(1, 8):
        ys = [y for y in range(h) if any(_ADAM7_SPEC_GRID[y % 8][x % 8] == p for x in range(w))]
        for y in ys:
            xs = [x for x in range(w) if _ADAM7_SPEC_GRID[y % 8][x % 8] == p]
            if xs:
                raster += bytes([0]) + bytes(int(img[y, x]) for x in xs)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    png = (C._PNG_SIG + C._png_chunk(b"IHDR", ihdr)
           + C._png_chunk(b"IDAT", zlib.compress(bytes(raster)))
           + C._png_chunk(b"IEND", b""))
    assert np.array_equal(C.decode_png(png), img)


def _manual_png(ihdr_fields, raster, plte=None):
    import zlib

    png = C._PNG_SIG + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        png += C._png_chunk(b"PLTE", plte)
    return png + C._png_chunk(b"IDAT", zlib.compress(raster)) + C._png_chunk(b"IEND", b"")


def test_png_palette_expansion():
    plte = bytes([10, 20, 30, 200, 100, 50, 0, 0, 255, 255, 255, 0])
    idx = np.array([[0, 1, 2, 3, 0], [1, 1, 2, 2, 3], [3, 2, 1, 0, 0]], dtype=np.uint8)
    raster = b"".join(bytes([0]) + idx[y].tobytes() for y in range(3))
    dec = C.decode_png(_manual_png((5, 3, 8, 3, 0, 0, 0), raster, plte))
    exp = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)[idx]
    assert np.array_equal(dec, exp)


def test_png_low_bit_gray_exact_scaling():
    # 255/(2^d - 1) replication is integer-exact: x255, x85, x17
    for depth, scale in ((1, 255), (2, 85), (4, 17)):
        hi = (1 << depth) - 1
        vals = np.array([[0, hi, hi, 0, 1 % (hi + 1)], [hi, 0, 1 % (hi + 1), hi, 0]],
                        dtype=np.uint8)
        packed_rows = []
        for y in range(2):
            bits = np.unpackbits(vals[y][:, None], axis=1)[:, 8 - depth:].flatten()
            pad = (-len(bits)) % 8
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
            packed_rows.append(bytes([0]) + np.packbits(bits).tobytes())
        dec = C.decode_png(_manual_png((5, 2, depth, 0, 0, 0, 0), b"".join(packed_rows)))
        assert np.array_equal(dec, vals.astype(np.uint16) * scale), depth


def test_png_alpha_channels_dropped():
    rng = np.random.RandomState(3)
    rgba = rng.randint(0, 256, (4, 5, 4)).astype(np.uint8)
    raster = b"".join(bytes([0]) + rgba[y].tobytes() for y in range(4))
    assert np.array_equal(C.decode_png(_manual_png((5, 4, 8, 6, 0, 0, 0), raster)),
                          rgba[:, :, :3])
    ga = rng.randint(0, 256, (3, 6, 2)).astype(np.uint8)
    raster = b"".join(bytes([0]) + ga[y].tobytes() for y in range(3))
    assert np.array_equal(C.decode_png(_manual_png((6, 3, 8, 4, 0, 0, 0), raster)),
                          ga[:, :, 0])


def test_png_corruption_raises():
    enc = bytearray(C.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    enc[20] ^= 0xFF
    with pytest.raises(ValueError):
        C.decode_png(bytes(enc))
    with pytest.raises(ValueError):
        C.decode_png(C.encode_png(np.zeros((4, 4), dtype=np.uint8))[:-8])  # no IEND
    with pytest.raises(ValueError):
        C.decode_png(b"\x89PNG\r\n\x1a\nrest")


def test_png_format_independent_phash_and_stats(spark):
    """The SAME pixels encoded as PNG and as PPM must produce identical
    perceptual hashes and decode stats — decode is byte-exact for both."""
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA, decode_stats, media_filter_decisions, phash64,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    assert phash64(C.encode_png(img)) == phash64(C.encode_ppm(img))

    rows = [
        ("png0", "image", bytearray(C.encode_png(img, filter_type="mixed")),
         {"width": 64, "height": 48, "duration_ms": None, "codec": "png"}),
        ("ppm0", "image", bytearray(C.encode_ppm(img)),
         {"width": 64, "height": 48, "duration_ms": None, "codec": "ppm"}),
        ("bad0", "image", bytearray(C.encode_png(img)[:40]),
         {"width": None, "height": None, "duration_ms": None, "codec": "png"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    stats = {r.media_id: r for r in decode_stats(media.filter("media_id != 'bad0'")).collect()}
    assert stats["png0"].vsum == stats["ppm0"].vsum == int(img.sum(dtype=np.int64))
    assert (stats["png0"].width, stats["png0"].height) == (64, 48)
    dec = {r.media_id: r for r in media_filter_decisions(media, min_width=8, min_height=8).collect()}
    assert dec["png0"].keep and dec["ppm0"].keep
    assert not dec["bad0"].keep and dec["bad0"].reason == "undecodable"
