"""Hypothesis property tests for the pure-numpy codecs (r4).

The fixed-seed tests pin known cases; these let hypothesis search the
input space (and shrink failures) for the LOSSLESS round-trip
invariants: GIF pixels, PNG pixels, strhash SQL-replay keys, ADPCM
stream geometry. Examples are deliberately small — each case is a
full encode+decode."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webalizer_ray.pipelines.graphs import decode_png, encode_png
from webalizer_ray.stages.jpeg import decode_jpeg, encode_jpeg
from webalizer_ray.stages.multimodal import (
    decode_gif,
    decode_wav,
    encode_adpcm_wav,
    encode_gif,
)
from webalizer_ray.stages.sketch import splitmix64
from webalizer_ray.stages.strhash import CP_STRIDE, string_hashes


@st.composite
def _paletted_image(draw):
    h = draw(st.integers(1, 20))
    w = draw(st.integers(1, 20))
    ncol = draw(st.integers(1, 16))
    seed = draw(st.integers(0, 2 ** 31))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


@settings(max_examples=40, deadline=None)
@given(_paletted_image())
def test_gif_round_trip_property(img):
    assert (decode_gif(encode_gif(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2 ** 31))
def test_png_round_trip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2 ** 31),
       st.sampled_from(["444", "422", "420"]))
def test_jpeg_shape_and_dtype_property(h, w, seed, sub):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90, subsample=sub))
    assert out.shape == img.shape and out.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 3000), st.integers(0, 2 ** 31))
def test_adpcm_length_and_rate_property(n, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    back, rate = decode_wav(encode_adpcm_wav(s, 8000))
    assert rate == 8000 and len(back) == n


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=40))
def test_string_hash_matches_per_char_definition(t):
    want = np.uint64(0)
    for j, ch in enumerate(t):
        want ^= splitmix64(np.uint64(j) * CP_STRIDE + np.uint64(ord(ch)))
    assert string_hashes([t])[0] == want
