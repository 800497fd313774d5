"""FLAC codec (sources/flaccodec.py): lossless round-trips, decoder-only
paths via hand-built streams, corruption gates, and the Spark surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fel_spark.sources import codecs as C
from fel_spark.sources import flaccodec as FL
from fel_spark.sources.flaccodec import decode_flac, encode_flac, flac_info


# ---------------------------------------------------------------------------
# lossless round-trips (encoder-produced streams)


def test_flac_noise_roundtrip_bit_depths_and_channels():
    rng = np.random.RandomState(3)
    for bps in (8, 16, 24):
        hi = 1 << (bps - 1)
        for n, ch in [(5, 1), (4096, 2), (5000, 2), (9000, 3)]:
            pcm = rng.randint(-hi, hi, size=(n, ch)).astype(np.int64)
            dec, sr = decode_flac(encode_flac(pcm, 44100, bps=bps), strict=True)
            assert sr == 44100 and np.array_equal(dec, pcm), (bps, n, ch)


def test_flac_smooth_signals_exact_and_compressed():
    t = np.arange(20000)
    sig = (10000 * np.sin(t / 50.0)).astype(np.int64)
    enc = encode_flac(sig, 8000, bps=16)
    dec, _ = decode_flac(enc, strict=True)
    assert np.array_equal(dec[:, 0], sig)
    assert len(enc) < 0.5 * 2 * len(sig)  # fixed predictors actually engage
    const = np.full(9000, -12345, dtype=np.int64)
    enc_c = encode_flac(const, 8000)
    assert np.array_equal(decode_flac(enc_c, strict=True)[0][:, 0], const)
    assert len(enc_c) < 200  # CONSTANT subframes: ~40 bytes of headers/block


def test_flac_square_wave_matches_wav_closed_form():
    # the synth_audio square-wave pattern: identical closed forms as WAV
    t = np.arange(800)
    wave = np.where((t // 3) % 2 == 0, 1500, -1500).astype(np.int64)
    dec, sr = decode_flac(encode_flac(wave, 8000), strict=True)
    pcm = dec[:, 0]
    assert int(np.abs(pcm).sum()) == 800 * 1500
    zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
    assert zc == 799 // 3


def test_flac_info():
    enc = encode_flac(np.zeros((100, 2), dtype=np.int64), 22050, bps=24)
    assert flac_info(enc) == (22050, 2, 24, 100)


# ---------------------------------------------------------------------------
# hand-built streams: decoder paths the encoder never writes


def _streaminfo(sr, nch, bps, total, md5=b"\0" * 16):
    w = FL._BitWriter()
    w.write(4096, 16)
    w.write(4096, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(nch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    body = bytes(w.out) + md5
    return FL.FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(blocksize, ch_code, bps, frame_no=0):
    hw = FL._BitWriter()
    hw.write(0x3FFE, 14)
    hw.write(0, 2)
    hw.write(7, 4)  # 16-bit blocksize field
    hw.write(0, 4)  # sample rate from STREAMINFO
    hw.write(ch_code, 4)
    hw.write(FL._BPS_TO_CODE[bps], 3)
    hw.write(0, 1)
    for b in FL._utf8_number(frame_no):
        hw.write(b, 8)
    hw.write(blocksize - 1, 16)
    hw.align()
    header = bytes(hw.out)
    return header + bytes([FL._crc8(header)])


def _finish_frame(header, fw):
    fw.align()
    frame = header + bytes(fw.out)
    return frame + struct.pack(">H", FL._crc16(frame))


def _const_subframe(fw, value, bits):
    fw.write(0, 1)
    fw.write(0, 6)
    fw.write(0, 1)
    fw.write(value, bits)


def test_flac_mid_side_left_side_right_side():
    l, r = 1000, 600
    mid, side = (l + r) >> 1, l - r
    n = 16
    # mid/side (ch_code 10): mid at bps, side at bps+1
    for ch_code, first, second in [
        (10, mid, side),      # mid, side
        (8, l, side),         # left, side
        (9, side, r),         # side first, then right
    ]:
        payload = _streaminfo(8000, 2, 16, n)
        header = _frame_header(n, ch_code, 16)
        fw = FL._BitWriter()
        if ch_code == 9:
            _const_subframe(fw, first, 17)   # side (bps+1)
            _const_subframe(fw, second, 16)  # right
        else:
            _const_subframe(fw, first, 16)
            _const_subframe(fw, second, 17)  # side (bps+1)
        pcm, sr = decode_flac(payload + _finish_frame(header, fw))
        assert (pcm[:, 0] == l).all() and (pcm[:, 1] == r).all(), ch_code


def test_flac_lpc_subframe_equals_fixed_order1():
    # LPC with coeffs [1], shift 0 == fixed order-1 predictor
    n = 12
    samples = np.cumsum(np.arange(1, n + 1)).astype(np.int64)  # warm 1, diffs
    payload = _streaminfo(8000, 1, 16, n)
    header = _frame_header(n, 0, 16)
    fw = FL._BitWriter()
    fw.write(0, 1)
    fw.write(32, 6)  # LPC order 1
    fw.write(0, 1)  # no wasted bits
    fw.write(int(samples[0]), 16)  # warmup
    fw.write(2 - 1, 4)  # precision 2
    fw.write(0, 5)  # shift 0
    fw.write(1, 2)  # coefficient +1 at precision 2
    resid = np.diff(samples)
    fw.write(0, 2)  # rice4
    fw.write(0, 4)  # partition order 0
    fw.write(3, 4)  # rice param 3
    for rr in resid:
        u = (abs(int(rr)) << 1) - (1 if rr < 0 else 0)
        fw.write_unary(u >> 3)
        fw.write(u & 7, 3)
    pcm, _ = decode_flac(payload + _finish_frame(header, fw))
    assert np.array_equal(pcm[:, 0], samples)


def test_flac_wasted_bits():
    n = 8
    v = 52  # all samples = 52 = 13 << 2 -> 2 wasted bits
    payload = _streaminfo(8000, 1, 16, n)
    header = _frame_header(n, 0, 16)
    fw = FL._BitWriter()
    fw.write(0, 1)
    fw.write(0, 6)  # CONSTANT
    fw.write(1, 1)  # wasted-bits flag
    fw.write(1, 2)  # unary '01' -> 1 zero -> wasted = 2
    fw.write(13, 14)  # value at bps - wasted bits
    pcm, _ = decode_flac(payload + _finish_frame(header, fw))
    assert (pcm[:, 0] == v).all()


def test_flac_verbatim_partitions_and_escape():
    n = 16
    vals = np.array([3, -7, 100, -100, 5, 0, -1, 2,
                     50, -50, 7, -3, 9, -9, 1, -2], dtype=np.int64)
    payload = _streaminfo(8000, 1, 16, n)
    # frame 1: VERBATIM subframe
    header = _frame_header(n, 0, 16)
    fw = FL._BitWriter()
    fw.write(0, 1)
    fw.write(1, 6)  # VERBATIM
    fw.write(0, 1)
    for v in vals:
        fw.write(int(v), 16)
    stream = payload + _finish_frame(header, fw)
    pcm, _ = decode_flac(stream)
    assert np.array_equal(pcm[:, 0], vals)
    # frame with FIXED order 0 + partition order 1, second partition escaped
    header = _frame_header(n, 0, 16, frame_no=0)
    fw = FL._BitWriter()
    fw.write(0, 1)
    fw.write(8, 6)  # FIXED order 0
    fw.write(0, 1)
    fw.write(0, 2)  # rice4
    fw.write(1, 4)  # partition order 1 -> two partitions of 8
    fw.write(2, 4)  # partition 1: rice param 2
    for v in vals[:8]:
        u = (abs(int(v)) << 1) - (1 if v < 0 else 0)
        fw.write_unary(u >> 2)
        fw.write(u & 3, 2)
    fw.write(15, 4)  # partition 2: escape
    fw.write(8, 5)  # raw 8-bit residuals
    for v in vals[8:]:
        fw.write(int(v), 8)
    pcm, _ = decode_flac(payload + _finish_frame(header, fw))
    assert np.array_equal(pcm[:, 0], vals)


# ---------------------------------------------------------------------------
# corruption / rejection


def test_flac_corruption_gates():
    sig = (1000 * np.sin(np.arange(6000) / 20.0)).astype(np.int64)
    good = encode_flac(sig, 8000)
    # flip a bit inside frame data -> CRC-16
    bad = bytearray(good)
    bad[len(bad) - 40] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # flip a bit inside the frame header -> CRC-8 (or sync) error
    hdr_off = good.index(b"\xff\xf8", 40)
    bad2 = bytearray(good)
    bad2[hdr_off + 3] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac(bytes(bad2))
    # truncations
    for cut in (2, 20, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            decode_flac(good[:cut])
    # MD5 strict: tamper losslessly-undetectable? -> decode with wrong
    # STREAMINFO md5 must fail strict but pass non-strict
    bad3 = bytearray(good)
    bad3[8 + 18] ^= 0xFF  # first md5 byte in STREAMINFO body
    decode_flac(bytes(bad3))  # non-strict ok
    with pytest.raises(ValueError):
        decode_flac(bytes(bad3), strict=True)


def test_flac_out_of_range_encode_rejected():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)
    with pytest.raises(ValueError):
        encode_flac(np.array([300]), 8000, bps=8)


# ---------------------------------------------------------------------------
# Spark surface


def test_flac_through_media_surface(spark):
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint64,
        decode_stats,
        media_filter_decisions,
    )

    t = np.arange(800)
    wave = np.where((t // 3) % 2 == 0, 1500, -1500).astype(np.int16)
    fl = encode_flac(wave.astype(np.int64), 8000)
    wv = C.encode_wav(wave, 8000)
    assert C.sniff_kind(fl) == "audio"
    # identical samples -> identical spectral fingerprint
    assert audio_fingerprint64(fl) == audio_fingerprint64(wv)
    rows = [
        ("f0", "audio", bytearray(fl),
         {"width": None, "height": None, "duration_ms": 100, "codec": "flac"}),
        ("w0", "audio", bytearray(wv),
         {"width": None, "height": None, "duration_ms": 100, "codec": "wav"}),
        ("fbad", "audio", bytearray(fl[:30]),
         {"width": None, "height": None, "duration_ms": None, "codec": "flac"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    stats = {r.media_id: r for r in
             decode_stats(media.filter("media_id != 'fbad'")).collect()}
    for mid in ("f0", "w0"):
        assert stats[mid].vsum == 800 * 1500
        assert stats[mid].height == 799 // 3  # zero crossings
        assert stats[mid].width == 8000  # sample rate
    dec = {r.media_id: r for r in
           media_filter_decisions(media, min_samples=100).collect()}
    assert dec["f0"].keep and dec["w0"].keep
    assert not dec["fbad"].keep and dec["fbad"].reason == "undecodable"
