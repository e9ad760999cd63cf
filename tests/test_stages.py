"""Stage-level unit tests: multimodal plumbing + session partials."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages.multimodal import (
    DecodeImage,
    FrameSample,
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


def test_decode_image_stub_raises_without_codec():
    tbl = synth_media_table(n=2, seed=7)
    with pytest.raises(NotImplementedError):
        DecodeImage()(tbl)
    with pytest.raises(NotImplementedError):
        FrameSample()(tbl)


def test_frame_sample_flatmap_shape():
    tbl = synth_media_table(n=48, seed=9)
    n_videos = sum(1 for k in tbl["kind"].to_pylist() if k == "video")
    out = FrameSample(n_frames=3, fake_decoder=True)(tbl)
    assert out.num_rows == 3 * n_videos
    df = out.to_pandas()
    assert (df.groupby("media_id")["frame_idx"].apply(list)
            .map(lambda v: v == [0, 1, 2]).all())


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
