"""Baseline JPEG codec (sources/jpegcodec.py): exact-recovery subspace,
lossy tolerance, restart resync, 4:2:0 decode, rejection paths, and the
Spark media surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fel_spark.sources import codecs as C
from fel_spark.sources import jpegcodec as J
from fel_spark.sources.jpegcodec import decode_jpeg, encode_jpeg


def _block_pattern(w: int, h: int, salt: int = 0) -> np.ndarray:
    """Gray image constant within each 8x8 block: DC-only under the DCT,
    so with flat quantization encode->decode recovers it EXACTLY while
    still exercising DC DPCM chaining and Huffman across blocks."""
    by, bx = np.mgrid[0 : h // 8, 0 : w // 8]
    vals = (11 * bx + 23 * by + 7 * salt) % 256
    return np.repeat(np.repeat(vals.astype(np.uint8), 8, axis=0), 8, axis=1)


# ---------------------------------------------------------------------------
# exact-recovery subspace (the driver-oracle basis)


def test_jpeg_solid_gray_exact_all_shapes():
    for v in (0, 7, 128, 200, 255):
        for shape in [(8, 8), (24, 16), (17, 9), (1, 1)]:
            img = np.full(shape, v, dtype=np.uint8)
            assert np.array_equal(decode_jpeg(encode_jpeg(img, quant="flat")), img)


def test_jpeg_block_pattern_exact_and_dpcm():
    img = _block_pattern(48, 40, salt=3)
    dec = decode_jpeg(encode_jpeg(img, quant="flat"))
    assert np.array_equal(dec, img)


def test_jpeg_gradient_flat_quant_exact():
    # pinned generator used nowhere else: linear gradient decodes exactly
    # under flat quant (quantization error 0 -> float DCT round-trip exact)
    y, x = np.mgrid[0:32, 0:40]
    img = ((x * 3 + y * 2) % 256).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quant="flat")), img)


def test_jpeg_solid_rgb_within_colorspace_rounding():
    for v in (0, 64, 128, 255):
        rgb = np.full((16, 24, 3), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(rgb, quant="flat"))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - int(v)).max() <= 1


# ---------------------------------------------------------------------------
# lossy paths


def test_jpeg_lossy_quality_bounds_error_on_smooth_image():
    y, x = np.mgrid[0:40, 0:48]
    img = (128 + 100 * np.sin(x / 8.0) * np.cos(y / 6.0)).astype(np.uint8)
    for q, tol in ((95, 4), (90, 6), (50, 16)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol, q


def test_jpeg_noise_rgb_flat_quant_small_error():
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quant="flat"))
    # error comes only from the YCbCr int round-trip, not the DCT
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 3


# ---------------------------------------------------------------------------
# restart markers


def test_jpeg_restart_interval_resync_exact():
    img = _block_pattern(48, 40, salt=1)
    for ri in (1, 2, 3, 7):
        payload = encode_jpeg(img, quant="flat", restart_interval=ri)
        assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
        assert np.array_equal(decode_jpeg(payload), img)


def test_jpeg_wrong_restart_marker_raises():
    img = _block_pattern(32, 16)
    payload = bytearray(encode_jpeg(img, quant="flat", restart_interval=1))
    i = payload.find(b"\xff\xd0")
    payload[i + 1] = 0xD5  # out-of-sequence RST5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# subsampled decode (hand-built 4:2:0 stream — the encoder writes 4:4:4)


def _solid_420(w, h, yv, cbv, crv):
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, values) in [
        (0, 0, J._DC_LUMA), (1, 0, J._AC_LUMA),
        (0, 1, J._DC_CHROMA), (1, 1, J._AC_CHROMA),
    ]:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    wtr = J._BitWriter()
    dcy = J._huff_encode_table(*J._DC_LUMA)
    acy = J._huff_encode_table(*J._AC_LUMA)
    dcc = J._huff_encode_table(*J._DC_CHROMA)
    acc = J._huff_encode_table(*J._AC_CHROMA)
    preds = {1: 0, 2: 0, 3: 0}
    dcvals = {1: 8 * (yv - 128), 2: 8 * (cbv - 128), 3: 8 * (crv - 128)}

    def emit(cid, dc_enc, ac_enc):
        diff = dcvals[cid] - preds[cid]
        preds[cid] = dcvals[cid]
        s = abs(diff).bit_length()
        c, ln = dc_enc[s]
        wtr.write(c, ln)
        if s:
            wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        c, ln = ac_enc[0x00]
        wtr.write(c, ln)

    for _m in range(((w + 15) // 16) * ((h + 15) // 16)):
        for _ in range(4):
            emit(1, dcy, acy)
        emit(2, dcc, acc)
        emit(3, dcc, acc)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_subsampled_decode():
    yv, cbv, crv = 120, 140, 90
    dec = decode_jpeg(_solid_420(20, 12, yv, cbv, crv))
    assert dec.shape == (12, 20, 3)
    exp = [
        round(yv + 1.402 * (crv - 128)),
        round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)),
        round(yv + 1.772 * (cbv - 128)),
    ]
    assert (dec == np.array(exp, dtype=np.uint8)).all()


# ---------------------------------------------------------------------------
# rejection / corruption


def test_jpeg_progressive_and_truncation_rejected():
    prog = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    full = encode_jpeg(np.full((16, 16), 77, np.uint8))
    for cut in (30, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0rest")


# ---------------------------------------------------------------------------
# Spark media surface


def test_jpeg_through_media_surface(spark):
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        decode_stats,
        media_filter_decisions,
        phash64,
    )

    img = _block_pattern(64, 48, salt=5)
    jp = encode_jpeg(img, quant="flat")
    # exact decode -> identical pixels -> identical perceptual hash vs PPM
    assert phash64(jp) == phash64(C.encode_ppm(np.stack([img] * 3, axis=2)))
    rows = [
        ("j0", "image", bytearray(jp),
         {"width": 64, "height": 48, "duration_ms": None, "codec": "jpeg"}),
        ("j1", "image", bytearray(encode_jpeg(img, quality=90)),
         {"width": 64, "height": 48, "duration_ms": None, "codec": "jpeg"}),
        ("jbad", "image", bytearray(jp[:60]),
         {"width": None, "height": None, "duration_ms": None, "codec": "jpeg"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    stats = {r.media_id: r for r in
             decode_stats(media.filter("media_id != 'jbad'")).collect()}
    assert stats["j0"].vsum == int(img.sum(dtype=np.int64))
    assert (stats["j0"].width, stats["j0"].height, stats["j0"].depth) == (64, 48, 1)
    dec = {r.media_id: r for r in
           media_filter_decisions(media, min_width=8, min_height=8).collect()}
    assert dec["j0"].keep and dec["j1"].keep
    assert not dec["jbad"].keep and dec["jbad"].reason == "undecodable"
