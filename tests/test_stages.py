"""Stage-level unit tests: multimodal plumbing + session partials."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages.multimodal import (
    DecodeImage,
    FrameSample,
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    synth_media_table,
)


def test_decode_image_deterministic_and_shaped():
    tbl = synth_media_table(n=32, seed=7)
    dec = DecodeImage(feature_dim=16, fake_decoder=True)
    a, b = dec(tbl), dec(tbl)
    assert a.num_rows == 32
    assert a["features"].type.list_size == 16
    assert a.equals(b)
    # identical payload → identical features (the dedup-join property)
    feats = a["features"].to_pylist()
    assert feats[0] == dec(tbl.slice(0, 1))["features"].to_pylist()[0]


def test_ppm_bmp_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    assert (decode_bmp(encode_bmp(px)) == px).all()
    # PPM comments in the header are skipped per the netpbm spec
    with_comment = b"P6\n# a comment\n7 11\n255\n" + px.tobytes()
    assert (decode_ppm(with_comment) == px).all()


def test_decode_image_real_pixels_expected_values():
    """Features over REAL encoded pixels match the closed-form values."""
    import pyarrow as pa
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2] = [255, 0, 0]          # half pure red, half black
    for payload in (encode_ppm(px), encode_bmp(px)):
        tbl = pa.table({"media_id": [0], "kind": ["image"],
                        "payload": pa.array([payload], pa.large_binary())})
        f = np.asarray(
            DecodeImage(feature_dim=7)(tbl)["features"].to_pylist()[0])
        assert np.allclose(f[:3], [0.5, 0.0, 0.0])     # channel means /255
        # grayscale: 8 px at 85.0, 8 at 0.0 → bins 0 and 1 of 4 get 0.5
        assert np.allclose(f[3:], [0.5, 0.5, 0.0, 0.0])


def test_decode_image_stub_raises_without_codec():
    import pyarrow as pa
    fake = pa.table({"media_id": [0], "kind": ["image"],
                     "payload": pa.array([b"\x89PNG fake compressed"],
                                         pa.large_binary())})
    with pytest.raises(NotImplementedError):
        DecodeImage()(fake)
    fake_video = pa.table({"media_id": [0], "kind": ["video"],
                           "payload": pa.array([b"\x00garbage video"],
                                               pa.large_binary())})
    with pytest.raises(NotImplementedError):
        FrameSample()(fake_video)


def test_frame_sample_flatmap_shape():
    """r4: the fixture's video rows are REAL Motion-JPEG AVI streams —
    FrameSample demuxes + decodes them: per video min(n, F) rows,
    evenly spaced SOURCE frame indices, and the first sampled frame's
    features equal decoding frame 0 directly."""
    from webalizer_ray.stages.jpeg import decode_jpeg
    from webalizer_ray.stages.multimodal import (
        decode_mjpeg_avi,
        raster_features,
    )

    tbl = synth_media_table(n=48, seed=9)
    vids = {m: p for m, k, p in zip(tbl["media_id"].to_pylist(),
                                    tbl["kind"].to_pylist(),
                                    tbl["payload"].to_pylist())
            if k == "video"}
    assert vids
    out = FrameSample(n_frames=3)(tbl)
    df = out.to_pandas()
    assert set(df["media_id"]) == set(vids)
    for mid, grp in df.groupby("media_id"):
        jpegs = decode_mjpeg_avi(vids[mid])
        nf = len(jpegs)
        assert len(grp) == min(3, nf)
        idxs = sorted(grp["frame_idx"])
        assert idxs[0] == 0 and idxs[-1] == nf - 1 if nf > 1 else True
        first = grp.sort_values("frame_idx").iloc[0]
        want = raster_features(decode_jpeg(jpegs[0]), 8)
        assert np.allclose(np.asarray(list(first["features"])), want)


def test_session_partials_combine_equals_direct(lookups):
    """The partial/combine path (pre-aggregate pattern) must agree with
    the direct whole-bucket sessions table, even when batches split a
    session across block boundaries."""
    from webalizer_ray import fixtures
    from webalizer_ray.config import DEFAULT_CONFIG
    from webalizer_ray.pipelines.flagship import sessions_from_sorted
    from webalizer_ray.stages.enrich import enrich_fn
    from webalizer_ray.stages.parse import make_parse_fn
    from webalizer_ray.stages.session import (
        combine_session_partials,
        session_partials,
        sessionize_frame,
    )

    tbl = fixtures.generate_turns(n_convs=60, seed=11)
    parsed = enrich_fn(*lookups, "Unresolved")(
        make_parse_fn(DEFAULT_CONFIG, 4)(tbl))
    df = parsed.to_pandas()
    ok = df[df["route"] == "ok"].copy()
    turns = sessionize_frame(ok, DEFAULT_CONFIG)
    turns = turns[~turns["seq_drop"]]

    direct = sessions_from_sorted(turns).sort_values(
        ["conv_id", "session_id"], ignore_index=True)

    # split into arbitrary row chunks (order preserved), emit partials
    parts = []
    n = len(turns)
    cuts = [0, n // 3, n // 3 + 7, 2 * n // 3, n]
    for lo, hi in zip(cuts, cuts[1:]):
        chunk = turns.iloc[lo:hi].copy()
        chunk["bucket"] = 0
        if len(chunk):
            parts.append(session_partials(chunk))
    combined = combine_session_partials(pd.concat(parts, ignore_index=True))
    combined = combined.sort_values(["conv_id", "session_id"],
                                    ignore_index=True)

    for col in ("conv_id", "session_id", "n_turns", "files", "pages",
                "entry_tool", "exit_tool", "month", "date"):
        a = direct[col].fillna("∅") if direct[col].dtype == object \
            else direct[col]
        b = combined[col].fillna("∅") if combined[col].dtype == object \
            else combined[col]
        assert (np.asarray(a) == np.asarray(b)).all(), col
    assert np.allclose(direct["kb"], combined["kb"])


def test_ivf_topk_recall_and_exact_cosines(ray_session):
    """IVF returns true cosines for whatever it returns, with decent
    recall vs the exact brute-force baseline."""
    import ray.data as rd

    from webalizer_ray.stages import ann

    rng = np.random.default_rng(5)
    n, d = 400, 16
    vecs = rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(4)
    queries = vecs[:3]
    exact = ann.brute_force_topk(ds, queries, k=5)
    approx = ann.ivf_topk(ds, queries, k=5)
    # self-match must be rank 1 (query vectors are in the dataset and a
    # query always probes its own cell)
    r1 = approx[approx["rank"] == 1]
    assert list(r1["vec_id"]) == [0, 1, 2]
    hits = 0
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits / 15 >= 0.5   # recall@5 with 16 cells / 4 probes
    # returned cosines are TRUE cosines (IVF never approximates scores)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for _, row in approx.iterrows():
        true = round(float(vn[int(row["query_id"])] @ vn[int(row["vec_id"])]), 9)
        assert abs(row["cosine"] - true) < 1e-9


def test_redact_pii_kernels():
    """Pass-order semantics: dotted quads survive the digit-run passes,
    a redacted email's domain can't be re-matched as an IP, and counts
    come from the FINAL text (no double counting)."""
    import pyarrow as pa
    from webalizer_ray.stages.textstats import redact_pii
    rows = [
        "mail a.b+c@sub.example.org now",          # email with dots/+
        "server at 192.168.0.1 and 10.0.255.7",    # two IPs
        "ssn 987-65-4321 phone +1 800 555 0199",   # ssn then phone
        "card 4111111111111111 ok",                # 16-digit CC
        "phone 555-123-4567 end",                  # undashed-country phone
        "no pii here",                             # nothing
    ]
    out = redact_pii(pa.table({"text": rows}))
    red = out["red_text"].to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server at <IP> and <IP>"
    assert red[2] == "ssn <SSN> phone <PHONE>"
    assert red[3] == "card <CC> ok"
    assert red[4] == "phone <PHONE> end"
    assert red[5] == "no pii here"
    assert out["n_pii"].to_pylist() == [1, 2, 2, 1, 1, 0]
    assert out["n_ip"].to_pylist() == [0, 2, 0, 0, 0, 0]


def test_wav_roundtrip_and_chunk_skip():
    """encode→decode is exact; a decoder must skip unknown chunks
    (LIST inserted between fmt and data) per the RIFF spec."""
    import numpy as np
    from webalizer_ray.stages.multimodal import decode_wav, encode_wav
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32767, 999, dtype=np.int16)
    data = encode_wav(s, 8000)
    back, rate = decode_wav(data)
    assert rate == 8000 and np.array_equal(back, s)
    # splice an unknown LIST chunk (odd size → word-aligned skip)
    head, rest = data[:12], data[12:]
    chunk = b"LIST" + (7).to_bytes(4, "little") + b"1234567" + b"\x00"
    back2, rate2 = decode_wav(head + chunk + rest)
    assert rate2 == 8000 and np.array_equal(back2, s)


def test_decode_audio_known_sine_features():
    """A full-scale 440 Hz sine at 8 kHz: RMS = 1/sqrt(2), ZCR =
    2*440/8000, duration 1 s, peak ≈ 1 — real signal math, no fake."""
    import numpy as np
    from webalizer_ray.stages.multimodal import DecodeAudio, encode_wav
    import pyarrow as pa
    rate, freq = 8000, 440.0
    t = np.arange(rate) / rate
    s = np.round(np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": pa.array(["audio"]),
                      "payload": pa.array([encode_wav(s, rate)],
                                          pa.large_binary())})
    out = DecodeAudio()(batch)
    assert abs(out["duration_s"][0].as_py() - 1.0) < 1e-9
    assert abs(out["rms"][0].as_py() - 1 / np.sqrt(2)) < 1e-3
    assert abs(out["zcr"][0].as_py() - 2 * freq / rate) < 1e-3
    assert out["peak"][0].as_py() > 0.999


def test_spectral_features_recover_sine_frequency():
    """440 Hz sine, 8000 samples at 8 kHz ⇒ 1 Hz FFT bins: dominant
    frequency must be exactly 440.0; a narrowband signal's rolloff
    sits on the same bin."""
    import numpy as np
    from webalizer_ray.stages.multimodal import (SpectralFeatures,
                                                 encode_wav)
    import pyarrow as pa
    rate, freq = 8000, 440.0
    t = np.arange(rate) / rate
    s = np.round(np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": pa.array(["audio"]),
                      "payload": pa.array([encode_wav(s, rate)],
                                          pa.large_binary())})
    out = SpectralFeatures()(batch)
    assert out["dominant_hz"][0].as_py() == 440.0
    assert abs(out["rolloff_hz"][0].as_py() - 440.0) <= 1.0
    assert abs(out["centroid_hz"][0].as_py() - 440.0) < 5.0


def test_spectral_query_fixture_sines_in_band(ray_session):
    """Every fixture audio row is a seeded 100–1500 Hz sine (+2% noise):
    the recovered dominant frequency must land in that band and the
    rolloff can't sit below the dominant bin."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["media_audio_spectral"][0]("/root/testdata/sf0.001")
    assert len(out) > 0
    assert ((out["dominant_hz"] >= 95) & (out["dominant_hz"] <= 1505)).all()
    assert (out["rolloff_hz"] >= out["dominant_hz"] - 5).all()


def test_decode_audio_stub_raises_without_codec():
    import pytest
    import pyarrow as pa
    from webalizer_ray.stages.multimodal import DecodeAudio
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": pa.array(["audio"]),
                      "payload": pa.array([b"\xff\xfbmp3-ish"],
                                          pa.large_binary())})
    with pytest.raises(NotImplementedError):
        DecodeAudio()(batch)
    out = DecodeAudio(fake_decoder=True)(batch)
    assert out.num_rows == 1


def test_kmeans_recovers_planted_blobs(ray_session):
    """Three well-separated direction blobs → 3 non-empty clusters,
    each blob pure; assignment invariant under repartition (the
    partial-sum reduce is order-independent for separated data)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.ann import kmeans_fit_assign
    rng = np.random.default_rng(9)
    centers = np.eye(3) * 10
    vecs = np.vstack([c + 0.1 * rng.standard_normal((40, 3))
                      for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": list(vecs)})
    out = kmeans_fit_assign(rd.from_pandas(df), n_clusters=3, n_iter=5)
    lbl = out["cluster"].to_numpy()
    blobs = [lbl[i * 40:(i + 1) * 40] for i in range(3)]
    assert all(len(set(b)) == 1 for b in blobs)          # pure blobs
    assert len({b[0] for b in blobs}) == 3               # distinct
    out2 = kmeans_fit_assign(rd.from_pandas(df).repartition(6),
                             n_clusters=3, n_iter=5)
    assert (out2["cluster"].to_numpy() == lbl).all()


def test_exact_quantiles_bounded_matches_numpy(ray_session):
    """Histogram-interpolated quantiles == np.quantile(linear) ==
    SQL quantile_cont, including interpolated (non-integer rank)
    positions and duplicated values."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.aggregate import exact_quantiles_bounded
    rng = np.random.default_rng(4)
    v = rng.integers(0, 40, 1003)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(5)
    got = exact_quantiles_bounded(ds, "x", [0.0, 0.1, 0.5, 0.9, 1.0])
    for q, val in got.items():
        assert val == float(np.quantile(v, q, method="linear")), q


def test_curation_pipeline_routes_and_conservation(ray_session, tmp_path):
    """Every doc lands in exactly one route (conservation); planted
    duplicates keep min doc_id; gates fire in order (a doc that is both
    out-of-band AND low quality routes to 'length'); rerunning into a
    used dir recomputes from scratch, never appends (from_pandas input
    has no file lineage, so the cached-funnel path can't be trusted)."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads
    import pytest
    import ray.data as rd
    from webalizer_ray.pipelines.curate import run_curation

    good = ("the cat and the dog is that it for a in is that good text "
            "with many stopwords the and of to a in is that it for") 
    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [good + " one", good + " two", good + " one",  # dup of 0
                 good + " three", good + " one",               # dup of 0
                 "x",                                          # too short
                 " ".join(["zz"] * 2000),                      # too long
                 good + " four"],
    })
    out = str(tmp_path / "curated")
    res = run_curation(rd.from_pandas(docs).repartition(3), out,
                       q_lo=0.2, q_hi=0.8, min_quality=0.2)
    assert res["total"] == len(docs)                 # conservation
    assert res["routes"]["duplicate"] == 2
    assert res["routes"]["length"] == 2
    kept = pads.dataset(out + "/route=kept").to_table().to_pandas()
    assert 0 in set(kept["doc_id"])                  # min-id keeper
    assert {2, 4}.isdisjoint(set(kept["doc_id"]))
    res2 = run_curation(rd.from_pandas(docs).repartition(2), out,
                        q_lo=0.2, q_hi=0.8, min_quality=0.2)
    assert res2 == res                      # wiped and recomputed, no
    kept2 = pads.dataset(out + "/route=kept").to_table().to_pandas()
    assert len(kept2) == len(kept)          # appended double rows
    del pytest


def test_knn_graph_matches_brute_force(ray_session):
    """LSH knn graph vs exact brute force on 150 vectors: at (4, 48)
    candidate recall is ~1, so the graphs agree exactly (ties broken
    identically by neighbor id); every node has exactly k edges."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages import ann
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((150, 16))
    df = pd.DataFrame({"vec_id": np.arange(150, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df).repartition(4)
    got = ann.knn_graph_lsh(ds, k=2)
    assert len(got) == 300 and (got.groupby("node").size() == 2).all()
    exact = ann.brute_force_topk(ds, vecs, k=3)   # rank 1 is self
    exact = exact[exact["rank"] > 1].copy()
    exact["neighbor"] = exact["vec_id"]
    exact["node"] = exact["query_id"]
    exact["rank"] = exact["rank"] - 1
    exact["cosine"] = exact["cosine"].round(6)
    merged = got.merge(exact[["node", "rank", "neighbor", "cosine"]],
                       on=["node", "rank"], suffixes=("", "_x"))
    assert (merged["neighbor"] == merged["neighbor_x"]).mean() > 0.97
    same = merged["neighbor"] == merged["neighbor_x"]
    assert np.allclose(merged.loc[same, "cosine"],
                       merged.loc[same, "cosine_x"])


def test_resize_nearest_exact_pixels():
    """4×4 → 2×2 nearest neighbor picks source rows/cols [0, 2]."""
    import numpy as np
    from webalizer_ray.stages.multimodal import resize_nearest

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_nearest(px, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out == px[[0, 2]][:, [0, 2]]).all()


def test_resize_image_stage_real_roundtrip(ray_session):
    """ResizeImage over real PPM/BMP payloads: aspect preserved, max
    side respected, thumbnail decodes back to the nearest-neighbor
    downsample of the original pixels."""
    import numpy as np
    import pyarrow as pa
    from webalizer_ray.stages.multimodal import (
        ResizeImage, decode_ppm, encode_ppm, encode_bmp, resize_nearest)

    rng = np.random.default_rng(11)
    px_a = rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)
    px_b = rng.integers(0, 256, (5, 20, 3), dtype=np.uint8)
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([encode_ppm(px_a), encode_bmp(px_b)],
                            pa.large_binary())})
    out = ResizeImage(max_side=8)(batch)
    got = {m: decode_ppm(p) for m, p in
           zip(out["media_id"].to_pylist(), out["payload"].to_pylist())}
    assert got[1].shape == (8, 4, 3)      # 16x8 / 2
    assert got[2].shape == (2, 8, 3)      # 5x20 / 2.5
    assert (got[1] == resize_nearest(px_a, 8, 4)).all()
    assert (got[2] == resize_nearest(px_b, 2, 8)).all()
    # already-small images pass through unscaled
    small = pa.table({
        "media_id": pa.array([3], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_ppm(px_a[:4, :4])], pa.large_binary())})
    out2 = ResizeImage(max_side=8)(small)
    assert decode_ppm(out2["payload"][0].as_py()).shape == (4, 4, 3)
