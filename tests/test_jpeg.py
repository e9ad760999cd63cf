"""Pure-numpy baseline JPEG codec tests (r4).

JPEG is lossy, so the bar is PSNR bounds + structural behavior, not
pixel equality — except flat-color blocks, which survive quantization
exactly at high quality."""

from __future__ import annotations

import numpy as np
import pytest

from webalizer_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else float("inf")


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256,
                     ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)


def test_smooth_image_high_psnr_444_and_420():
    img = _gradient(48, 64)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, 90))) > 45
    assert _psnr(img, decode_jpeg(
        encode_jpeg(img, 90, subsample="420"))) > 40


def test_flat_color_survives_exactly():
    flat = np.full((16, 24, 3), (120, 60, 200), np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 95)) == flat).all()


def test_noise_image_bounded_error():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    assert _psnr(noise, decode_jpeg(encode_jpeg(noise, 95))) > 30


def test_restart_markers_round_trip():
    """DRI/RSTn path: a restart interval must not change the decoded
    pixels (DC predictors reset at every marker on both sides)."""
    img = _gradient(33, 49)
    plain = decode_jpeg(encode_jpeg(img, 90))
    restarted = decode_jpeg(encode_jpeg(img, 90, restart_interval=2))
    assert (plain == restarted).all()
    r420 = decode_jpeg(encode_jpeg(img, 90, subsample="420",
                                   restart_interval=3))
    assert _psnr(img, r420) > 40


def test_odd_sizes_and_tiny_images():
    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23), (16, 16)]:
        for sub in ("444", "420"):
            im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(im, 92, subsample=sub))
            assert out.shape == im.shape


def test_quality_monotone_size():
    img = _gradient(32, 32)
    sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_malformed_and_unsupported_raise_valueerror():
    ok = encode_jpeg(_gradient(8, 8), 90)
    with pytest.raises(ValueError):
        decode_jpeg(b"NOPE")
    with pytest.raises(ValueError):
        decode_jpeg(ok[:20])
    # progressive (SOF2) marker rejected loudly
    bad = bytearray(ok)
    i = bad.find(b"\xFF\xC0")
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError, match="not supported"):
        decode_jpeg(bytes(bad))


def test_media_fixture_jpeg_rows_decode_real(ray_session):
    """Fixture v5 rotates PPM/BMP/GIF/JPEG; the features query decodes
    JPEG rows for real — their feature vectors equal DecodeImage over
    the independently decoded pixels (and there ARE 4:2:0 and
    restart-marker payloads in the mix)."""
    from webalizer_ray.pipelines import queries as Q
    from webalizer_ray.pipelines.queries.q01_core import _media_ds
    from webalizer_ray.stages.multimodal import decode_image_payload

    out = Q.REGISTRY["media_image_features"][0]("/root/testdata/sf0.001")
    tbl = _media_ds().to_pandas()
    jp = tbl[tbl["mime"] == "image/jpeg"]
    assert len(jp) > 0
    m = out.merge(jp[["media_id", "payload"]], on="media_id")
    assert len(m) == len(jp)
    for _, r in m.iterrows():
        px = decode_image_payload(bytes(r["payload"]))
        assert px is not None and px.dtype == np.uint8
        want = round(float(
            np.concatenate([px.reshape(-1, 3).mean(axis=0) / 255.0,
                            np.histogram(px.reshape(-1, 3)
                                         .astype(np.float64).mean(axis=1),
                                         bins=13,
                                         range=(0.0, 255.0 + 1e-9))[0]
                            / px[:, :, 0].size]).mean()), 6)
        assert abs(float(r["feat_mean"]) - want) < 1e-9


def test_adpcm_wav_round_trip_and_fixture(ray_session):
    """IMA ADPCM (r4): ~4:1 compressed audio round-trips with SNR >
    20 dB across multiple blocks, decode_wav dispatches on the format
    tag transparently, and the media fixture (v6) feeds REAL ADPCM
    payloads through media_audio_features."""
    from webalizer_ray.pipelines import queries as Q
    from webalizer_ray.pipelines.queries.q01_core import _media_ds
    from webalizer_ray.stages.multimodal import (
        decode_wav,
        encode_adpcm_wav,
    )

    t = np.arange(4000) / 8000.0
    s16 = np.clip(0.5 * np.sin(2 * np.pi * 330 * t) * 32767,
                  -32768, 32767).astype(np.int16)
    data = encode_adpcm_wav(s16, 8000)
    assert len(data) < 2 * len(s16) // 3          # really compressed
    back, rate = decode_wav(data)
    assert rate == 8000 and len(back) == len(s16)
    err = back.astype(np.float64) - s16.astype(np.float64)
    snr = 10 * np.log10((s16.astype(np.float64) ** 2).mean()
                        / max((err ** 2).mean(), 1e-12))
    assert snr > 20

    out = Q.REGISTRY["media_audio_features"][0]("/root/testdata/sf0.001")
    tbl = _media_ds().to_pandas()
    ad = tbl[tbl["mime"] == "audio/wav;codec=adpcm"]
    assert len(ad) > 0
    m = out.merge(ad[["media_id"]], on="media_id")
    assert len(m) == len(ad)
    # durations survive the lossy codec exactly (fact chunk)
    for _, r in m.iterrows():
        want = tbl.loc[tbl["media_id"] == r["media_id"],
                       "duration_ms"].iloc[0]
        assert abs(r["duration_s"] * 1000 - want) < 1.0


def test_grayscale_jpeg_round_trip():
    """r4: single-component (grayscale) JPEG — encoder emits nc=1,
    decoder replicates the luma plane into RGB."""
    yy, xx = np.mgrid[0:30, 0:41]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, 90))
    assert out.shape == (30, 41, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert (out[:, :, 1] == out[:, :, 2]).all()
    assert _psnr(np.repeat(g[:, :, None], 3, axis=2), out) > 40


def test_422_subsampling_round_trip():
    """r4: 4:2:2 (horizontal-only chroma halving) exercises the
    decoder's asymmetric-sampling upsample path (h=2, v=1)."""
    img = _gradient(33, 49)
    out = decode_jpeg(encode_jpeg(img, 90, subsample="422"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 40
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (7, 9), (17, 23)]:
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert decode_jpeg(
            encode_jpeg(im, 92, subsample="422")).shape == im.shape
