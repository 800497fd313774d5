"""Property-based round-trips for the pure-stdlib codecs (hypothesis).

The seeded fuzz loops in test_codecs/test_jpeg/test_flac/test_gif pin
known shapes; these properties let hypothesis drive shapes, dtypes, and
content — with shrinking, so a failure lands as a minimal counterexample.
Example counts are kept small: each property is O(payload) work and the
suite runs them on every commit.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from fel_spark.sources import codecs as C
from fel_spark.sources.flaccodec import decode_flac, encode_flac
from fel_spark.sources.gifcodec import decode_gif_image, encode_gif
from fel_spark.sources.jpegcodec import decode_jpeg, encode_jpeg

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def _images(draw, max_side=33, color=None, dtypes=(np.uint8, np.uint16)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    c = draw(st.booleans()) if color is None else color
    dtype = draw(st.sampled_from(list(dtypes)))
    hi = 256 if dtype == np.uint8 else 65536
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if c else (h, w)
    return rng.randint(0, hi, shape).astype(dtype)


@settings(**_SETTINGS)
@given(
    img=_images(),
    ft=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    interlace=st.booleans(),
)
def test_png_roundtrip_property(img, ft, interlace):
    dec = C.decode_png(C.encode_png(img, filter_type=ft, interlace=interlace))
    assert dec.dtype == img.dtype and np.array_equal(dec, img)


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 6000),
    ch=st.integers(1, 3),
    bps=st.sampled_from([8, 16, 24]),
    seed=st.integers(0, 2**31 - 1),
    smooth=st.booleans(),
)
def test_flac_roundtrip_property(n, ch, bps, seed, smooth):
    rng = np.random.RandomState(seed)
    hi = 1 << (bps - 1)
    if smooth:
        base = (hi // 2 * np.sin(np.arange(n) / 17.0)).astype(np.int64)
        pcm = np.stack([base + k for k in range(ch)], axis=1)
    else:
        pcm = rng.randint(-hi, hi, (n, ch)).astype(np.int64)
    dec, sr = decode_flac(encode_flac(pcm, 8000, bps=bps), strict=True)
    assert sr == 8000 and np.array_equal(dec, pcm)


@settings(**_SETTINGS)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    k=st.integers(2, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, k, interlace, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (k, 3)).astype(np.uint8)
    idx = rng.randint(0, k, (h, w)).astype(np.uint8)
    dec = decode_gif_image(encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal(dec, pal[idx])


@settings(**_SETTINGS)
@given(
    bh=st.integers(1, 5),
    bw=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
    ri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_block_constant_exact_property(bh, bw, seed, ri):
    # block-constant gray images are DC-only: flat-quant JPEG is exact
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg(img, quant="flat", restart_interval=ri))
    assert np.array_equal(dec, img)


@settings(**_SETTINGS)
@given(img=_images(max_side=24, color=False, dtypes=(np.uint8,)))
def test_netpbm_pgm_roundtrip_property(img):
    assert np.array_equal(C.decode_netpbm(C.encode_pgm(img)), img)
