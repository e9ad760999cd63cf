"""SemDeDup semantic dedup: every verdict verified against a
brute-force per-cluster recomputation, determinism, planted duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def brute_keep(ids, vecs, clusters, t):
    """Reference rule: drop j iff some i<j in the same cluster has
    cos >= t (chain removal: dropped i still knocks out later rows)."""
    keep = {}
    for cl in np.unique(clusters):
        rows = sorted(np.flatnonzero(clusters == cl),
                      key=lambda r: ids[r])
        for pos, r in enumerate(rows):
            keep[ids[r]] = not any(
                float(vecs[r] @ vecs[p]) >= t for p in rows[:pos])
    return keep


def test_verdicts_match_brute_force(ray_session):
    from webalizer_ray.stages.dedup import semantic_dedup

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = semantic_dedup(ds, threshold=0.4, n_clusters=8)
    raw = ds.to_pandas().sort_values("vec_id", ignore_index=True)
    vecs = normalize(np.stack(raw["embedding"].to_numpy())
                     .astype(np.float64))
    ids = raw["vec_id"].to_numpy(np.int64)
    clusters = out.sort_values("vec_id")["cluster"].to_numpy()
    want = brute_keep(ids, vecs, clusters, 0.4)
    got = dict(zip(out["vec_id"], out["keep"]))
    assert got == want
    assert out["keep"].sum() < len(out)  # drops something at t=0.4


def test_deterministic_and_repartition_invariant(ray_session):
    from webalizer_ray.stages.dedup import semantic_dedup

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    a = semantic_dedup(ds, threshold=0.4, n_clusters=8)
    b = semantic_dedup(ds.repartition(7), threshold=0.4, n_clusters=8)
    pd.testing.assert_frame_equal(
        a, b.sort_values("vec_id", ignore_index=True))


def test_planted_exact_duplicates_dropped(ray_session):
    """An exact copy of an earlier vector must always be dropped (same
    cluster by construction, cosine 1.0)."""
    from webalizer_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 8))
    vecs = np.vstack([base, base[:5]])       # ids 40..44 duplicate 0..4
    df = pd.DataFrame({"vec_id": np.arange(45, dtype=np.int64),
                       "embedding": list(vecs)})
    out = semantic_dedup(rd.from_pandas(df), threshold=0.999,
                         n_clusters=4)
    dup = out[out["vec_id"] >= 40]
    assert not dup["keep"].any()
    orig = out[out["vec_id"] < 5]
    assert orig["keep"].all()
