"""GIF codec (sources/gifcodec.py): lossless LZW round-trips, interlace,
animation, container edge cases, and the Spark media surface."""

from __future__ import annotations

import numpy as np
import pytest

from fel_spark.sources import codecs as C
from fel_spark.sources.gifcodec import (
    decode_gif,
    decode_gif_image,
    encode_gif,
    gif_frame_count,
)


def test_gif_static_roundtrips_palette_sizes_and_interlace():
    rng = np.random.RandomState(6)
    for k in (2, 4, 16, 100, 256):
        pal = rng.randint(0, 256, (k, 3)).astype(np.uint8)
        for shape in [(1, 1), (7, 9), (40, 56)]:
            idx = rng.randint(0, k, shape).astype(np.uint8)
            for il in (False, True):
                img = decode_gif_image(encode_gif(idx, pal, interlace=il))
                assert np.array_equal(img, pal[idx]), (k, shape, il)


def test_gif_dictionary_reset_roundtrip():
    # 200x200 random indices blow past 4096 LZW codes -> clear + rebuild
    rng = np.random.RandomState(1)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (200, 200)).astype(np.uint8)
    assert np.array_equal(decode_gif_image(encode_gif(idx, pal)), pal[idx])


def test_gif_run_compression_engages():
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    smooth = np.repeat(np.arange(8, dtype=np.uint8), 512).reshape(64, 64)
    enc = encode_gif(smooth, pal)
    assert len(enc) < 0.2 * smooth.size  # LZW actually compresses runs
    assert np.array_equal(decode_gif_image(enc), pal[smooth])


def test_gif_animated_roundtrip_and_frame_count():
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 16, (5, 24, 32)).astype(np.uint8)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    enc = encode_gif(frames, pal)
    dec, hdr = decode_gif(enc)
    assert hdr == {"width": 32, "height": 24, "n_frames": 5}
    for f in range(5):
        assert np.array_equal(dec[f], pal[frames[f]])
    assert gif_frame_count(enc) == 5
    assert gif_frame_count(encode_gif(frames[:1], pal)) == 1


def test_gif_truncation_and_garbage_rejected():
    pal = np.zeros((4, 3), dtype=np.uint8)
    enc = encode_gif(np.zeros((8, 8), dtype=np.uint8), pal)
    for cut in (4, 12, len(enc) // 2, len(enc) - 2):
        with pytest.raises(ValueError):
            decode_gif(enc[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4 + b"\xff\xff\xff")


def test_gif_sniff_and_image_dispatch():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    static = encode_gif(rng.randint(0, 16, (10, 12)).astype(np.uint8), pal)
    anim = encode_gif(rng.randint(0, 16, (3, 10, 12)).astype(np.uint8), pal)
    assert C.sniff_kind(static) == "image"
    assert C.sniff_kind(anim) == "video"
    img = C.decode_image(static)
    assert img.shape == (10, 12, 3)
    luma, hdr = C.decode_y4m(anim)
    assert luma.shape == (3, 10, 12)
    assert (hdr["width"], hdr["height"]) == (12, 10)


def test_gif_video_luma_is_exact_rec601():
    # identity grayscale palette -> rgb = (v, v, v) -> luma = v exactly
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    frames = np.array(
        [np.full((6, 8), 30, dtype=np.uint8), np.full((6, 8), 200, dtype=np.uint8)]
    )
    luma, _ = C.decode_y4m(encode_gif(frames, pal))
    assert (luma[0] == 30).all() and (luma[1] == 200).all()


def test_gif_through_media_surface(spark):
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        decode_stats,
        media_filter_decisions,
        phash64,
    )

    rng = np.random.RandomState(4)
    # grayscale-palette static GIF: pixels equal a PPM of the same values
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    idx = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    gif = encode_gif(idx, pal)
    ppm = C.encode_ppm(np.repeat(idx[:, :, None], 3, axis=2))
    assert phash64(gif) == phash64(ppm)

    anim = encode_gif(rng.randint(0, 256, (4, 16, 16)).astype(np.uint8), pal)
    rows = [
        ("g0", "image", bytearray(gif),
         {"width": 64, "height": 48, "duration_ms": None, "codec": "gif"}),
        ("v0", "video", bytearray(anim),
         {"width": 16, "height": 16, "duration_ms": 160, "codec": "gif"}),
        ("gbad", "image", bytearray(gif[:20]),
         {"width": None, "height": None, "duration_ms": None, "codec": "gif"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    stats = {r.media_id: r for r in
             decode_stats(media.filter("media_id != 'gbad'")).collect()}
    assert stats["g0"].vsum == 3 * int(idx.sum(dtype=np.int64))  # RGB replicate
    assert (stats["g0"].width, stats["g0"].height) == (64, 48)
    assert stats["v0"].depth == 4  # n_frames
    dec = {r.media_id: r for r in
           media_filter_decisions(media, min_width=8, min_height=8,
                                  min_frames=2).collect()}
    assert dec["g0"].keep and dec["v0"].keep
    assert not dec["gbad"].keep and dec["gbad"].reason == "undecodable"
