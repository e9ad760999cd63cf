"""Decoder robustness fuzz: corrupted media payloads must fail CLEANLY.

The production contract for every pure-numpy decoder (PNG, GIF, JPEG,
PPM, BMP, WAV): on arbitrary corruption — truncation, byte flips,
garbage — either return a valid raster/array or raise ValueError (the
one documented exception type). IndexError / struct.error / zlib
errors / silent hangs reaching an actor pool would poison a 100 TB
media pass, so they are bugs by contract. Deterministic seeds: this
is a fixed corpus, not flaky fuzzing.
"""

from __future__ import annotations

import numpy as np
import pytest

from webalizer_ray.pipelines.graphs import decode_png, encode_png
from webalizer_ray.stages.jpeg import decode_jpeg, encode_jpeg
from webalizer_ray.stages.multimodal import (
    decode_bmp,
    decode_gif,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_ppm,
    encode_wav,
)

_ALLOWED = (ValueError,)


def _fuzz_one(decode, good: bytes, rng, n_cases: int = 120):
    bad_types = []
    for i in range(n_cases):
        b = bytearray(good)
        mode = i % 3
        if mode == 0 and len(b) > 4:           # truncate
            b = b[:int(rng.integers(1, len(b)))]
        elif mode == 1:                        # flip random bytes
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        else:                                  # splice garbage
            at = int(rng.integers(0, len(b)))
            b[at:at] = bytes(rng.integers(0, 256, 8, dtype=np.uint8))
        try:
            out = decode(bytes(b))
            assert isinstance(out, (np.ndarray, tuple))
        except _ALLOWED:
            pass
        except Exception as ex:                # noqa: BLE001
            bad_types.append((type(ex).__name__, bytes(b[:24])))
    assert not bad_types, bad_types[:5]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def _img(rng, h=9, w=11):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_fuzz_png(rng):
    _fuzz_one(decode_png, encode_png(_img(rng)), rng)


def test_fuzz_gif(rng):
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (9, 11))]
    _fuzz_one(decode_gif, encode_gif(img), rng)


def test_fuzz_jpeg(rng):
    _fuzz_one(decode_jpeg, encode_jpeg(_img(rng), 90), rng)
    _fuzz_one(decode_jpeg,
              encode_jpeg(_img(rng, 17, 13), 85, subsample="420",
                          restart_interval=2), rng)


def test_fuzz_ppm_bmp(rng):
    _fuzz_one(decode_ppm, encode_ppm(_img(rng)), rng)
    _fuzz_one(decode_bmp, encode_bmp(_img(rng)), rng)


def test_fuzz_wav(rng):
    samples = (np.sin(np.arange(500) / 7.0) * 20000).astype(np.int16)
    _fuzz_one(decode_wav, encode_wav(samples, 8000), rng)


def test_fuzz_mjpeg_avi(rng):
    from webalizer_ray.stages.multimodal import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )

    frames = [_img(rng, 6, 8) for _ in range(3)]
    def dec(b):
        return np.array([len(decode_mjpeg_avi(b))])
    _fuzz_one(dec, encode_mjpeg_avi(frames, 10, 90), rng)
