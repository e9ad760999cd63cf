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


# ---------------------------------------------------------------------
# r5: container-walker structure attacks (VERDICT r4 item 7) — the two
# walkers that trust length fields the most get TARGETED cases beyond
# the random corruption above: crafted RIFF chunk chains and PNG chunk
# CRC corruption.
# ---------------------------------------------------------------------

import struct


def test_avi_nested_list_bomb_is_valueerror():
    """A 5000-deep chain of nested LISTs blew the recursive walker as
    RecursionError (found r5); the iterative walk must answer with the
    contract ValueError (no frames) in bounded time."""
    from webalizer_ray.stages.multimodal import decode_mjpeg_avi
    inner = b""
    for _ in range(5000):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"movi" \
            + inner
    data = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(ValueError):
        decode_mjpeg_avi(data)


def test_avi_length_field_attacks(rng):
    """Length fields pointing past the buffer, zero-length chunk runs,
    and odd-length padding abuse must all end in ValueError or a valid
    frame list — never IndexError/struct.error/hang."""
    from webalizer_ray.stages.multimodal import (
        decode_mjpeg_avi,
        encode_mjpeg_avi,
    )
    frames = [np.full((6, 6, 3), 40 * i, np.uint8) for i in range(3)]
    good = bytearray(encode_mjpeg_avi(frames, 10, 85))

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    crafted = [
        # chunk length pointing far past the end
        b"RIFF" + struct.pack("<I", 64) + b"AVI "
        + b"00dc" + struct.pack("<I", 1 << 30) + b"x" * 32,
        # a run of zero-length chunks then a truncated one
        b"RIFF" + struct.pack("<I", 200) + b"AVI "
        + chunk(b"00dc", b"") * 12 + b"00dc" + struct.pack("<I", 9),
        # LIST whose declared length covers only half its body
        b"RIFF" + struct.pack("<I", 100) + b"AVI "
        + b"LIST" + struct.pack("<I", 10) + b"movi"
        + chunk(b"00dc", b"abcdef"),
        # movi LIST terminated mid-header of an inner chunk
        b"RIFF" + struct.pack("<I", 30) + b"AVI "
        + b"LIST" + struct.pack("<I", 9) + b"movi" + b"00dc\x05",
    ]
    # plus random surgery on the length fields of a VALID file: find
    # each chunk header and overwrite its length with edge values
    for off in range(12, len(good) - 8, 4):
        if bytes(good[off:off + 2]) == b"00":
            for v in (0, 1, 0xFFFFFFFF, len(good)):
                b = bytearray(good)
                struct.pack_into("<I", b, off + 4, v)
                crafted.append(bytes(b))
    for payload in crafted:
        try:
            out = decode_mjpeg_avi(bytes(payload))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_avi_frame_order_survives_split_movi():
    """Two sibling movi LISTs: frames must come back in stream order
    (the iterative walker pushes continuation-then-body to keep the
    recursive walker's depth-first order)."""
    from webalizer_ray.stages.multimodal import decode_mjpeg_avi

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi1 = chunk(b"LIST", b"movi" + chunk(b"00dc", b"AA")
                  + chunk(b"00dc", b"BB"))
    movi2 = chunk(b"LIST", b"movi" + chunk(b"00dc", b"CC"))
    body = b"AVI " + movi1 + movi2
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_mjpeg_avi(data) == [b"AA", b"BB", b"CC"]


def test_png_chunk_crc_is_verified(rng):
    """Flipping any single byte inside a chunk's tag, data or CRC must
    raise ValueError (PNG spec §5.3 per-chunk CRC): before r5 a
    data-byte flip could sail through to zlib and only fail by luck."""
    img = (np.arange(7 * 9 * 3, dtype=np.uint8).reshape(7, 9, 3) * 3) \
        % 255
    good = encode_png(img)
    # walk the real chunk layout to find data/crc byte offsets
    pos, targets = 8, []
    while pos + 8 <= len(good):
        (ln,) = struct.unpack(">I", good[pos:pos + 4])
        targets.extend([pos + 4,                 # tag byte
                        pos + 8 + max(0, ln // 2),  # data byte
                        pos + 8 + ln])           # first CRC byte
        pos += 12 + ln
    flipped = 0
    for off in targets:
        if off >= len(good):
            continue
        b = bytearray(good)
        b[off] ^= 0x5A
        try:
            decode_png(bytes(b))
        except ValueError:
            flipped += 1
        else:
            pytest.fail(f"byte flip at {off} decoded silently")
    assert flipped == len([t for t in targets if t < len(good)])


def test_png_crc_check_does_not_reject_valid(rng):
    """Round-trip sanity alongside the CRC check: valid encodes still
    decode pixel-exact."""
    img = rng.integers(0, 256, (11, 5, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
