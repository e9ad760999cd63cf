"""Grid distance join (stages/spatial.py): exact-recall parity vs the
brute-force O(n²) join, boundary inclusivity, negative-coordinate
cells, cross-cell pairs, and block-layout invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.stages.spatial import grid_distance_join


def _brute(df: pd.DataFrame, r: int) -> pd.DataFrame:
    m = df.merge(df, how="cross", suffixes=("_a", "_b"))
    m = m[m["id_a"] < m["id_b"]]
    d2 = (m["x_a"] - m["x_b"]) ** 2 + (m["y_a"] - m["y_b"]) ** 2
    m = m.assign(dist_sq=d2)[d2 <= r * r]
    return m[["id_a", "id_b", "dist_sq"]] \
        .sort_values(["id_a", "id_b"], ignore_index=True) \
        .astype(np.int64)


def _run(df: pd.DataFrame, r: int, blocks: int = 4) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(blocks)
    out = grid_distance_join(ds, radius=r).to_pandas()
    if out.empty:  # empty pandas blocks lose schema (Ray 2.49)
        out = pd.DataFrame({c: pd.Series(dtype=np.int64)
                            for c in ("id_a", "id_b", "dist_sq")})
    return out.sort_values(["id_a", "id_b"], ignore_index=True) \
        .astype(np.int64)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        # spread includes negatives → exercises floor-divide cells
        "x": rng.randint(-5000, 5000, n).astype(np.int64),
        "y": rng.randint(-5000, 5000, n).astype(np.int64)})


def test_parity_with_brute_force(ray_session, cloud):
    for r in (300, 900):
        got = _run(cloud, r)
        want = _brute(cloud, r)
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 10  # non-trivial fixture


def test_boundary_pair_inclusive(ray_session):
    # distance exactly r (3-4-5 triangle scaled) must be KEPT
    df = pd.DataFrame({"id": np.array([1, 2], dtype=np.int64),
                       "x": np.array([0, 300], dtype=np.int64),
                       "y": np.array([0, 400], dtype=np.int64)})
    got = _run(df, 500, blocks=1)
    assert got.to_dict("records") == [
        {"id_a": 1, "id_b": 2, "dist_sq": 250000}]
    # one unit farther → dropped
    df.loc[1, "x"] = 301
    assert len(_run(df, 500, blocks=1)) == 0


def test_cross_cell_pair_found(ray_session):
    # points straddling a cell boundary (cells differ in both axes)
    df = pd.DataFrame({"id": np.array([5, 9], dtype=np.int64),
                       "x": np.array([99, 101], dtype=np.int64),
                       "y": np.array([199, 201], dtype=np.int64)})
    got = _run(df, 100, blocks=2)
    assert got.to_dict("records") == [
        {"id_a": 5, "id_b": 9, "dist_sq": 8}]


def test_block_layout_invariance(ray_session, cloud):
    a = _run(cloud, 600, blocks=1)
    b = _run(cloud, 600, blocks=13)
    pd.testing.assert_frame_equal(a, b)


def test_bad_radius_raises(ray_session, cloud):
    with pytest.raises(ValueError):
        grid_distance_join(rd.from_pandas(cloud), radius=0)


# ---------------------------------------------------------------- DBSCAN

def _dbscan(df: pd.DataFrame, r: int, min_pts: int = 3, blocks: int = 3):
    from webalizer_ray.stages.spatial import dbscan_labels
    member, noise = dbscan_labels(rd.from_pandas(df).repartition(blocks),
                                  radius=r, min_pts=min_pts)
    return (dict(zip(member["node"].astype(int),
                     member["rep"].astype(int))), noise)


def test_dbscan_planted_clusters(ray_session):
    # cluster A: tight triangle around origin (ids 0,1,2 — all core at
    # min_pts=3); cluster B: triangle at (1000, 1000) (ids 3,4,5);
    # border: id 6 within r of A's id 0 only; noise: id 7 far away
    pts = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "x": np.array([0, 5, 0, 1000, 1005, 1000, 9, 5000], np.int64),
        "y": np.array([0, 0, 5, 1000, 1000, 1005, 0, 5000], np.int64)})
    got, noise = _dbscan(pts, r=10)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 0}
    assert noise == 1


def test_dbscan_border_takes_min_rep(ray_session):
    # two singleton-edge "clusters" won't form at min_pts=3 unless
    # dense; build two 3-chains and put a border point adjacent to a
    # core of EACH — it must take the smaller rep
    pts = pd.DataFrame({
        "id": np.array([0, 1, 2, 10, 11, 12, 20], np.int64),
        # chain A around x=0..10, chain B around x=60..70,
        # border id 20 at x=35 within r=30 of cores 1 (x=5) and 11 (x=65)?
        "x": np.array([0, 5, 10, 60, 65, 70, 35], np.int64),
        "y": np.zeros(7, np.int64)})
    got, noise = _dbscan(pts, r=30)
    # all of chain A and B are mutually within 30 → both fully core
    assert got[20] == 0          # min rep wins (0 < 10)
    assert noise == 0


def test_dbscan_no_core_all_noise(ray_session):
    pts = pd.DataFrame({"id": np.arange(3, dtype=np.int64),
                        "x": np.array([0, 10_000, 20_000], np.int64),
                        "y": np.zeros(3, np.int64)})
    got, noise = _dbscan(pts, r=10)
    assert got == {} and noise == 3


def test_dbscan_isolated_core_pair_cluster(ray_session):
    # min_pts=2: a pair is a 2-core cluster; a lone point is noise
    pts = pd.DataFrame({"id": np.array([5, 9, 42], np.int64),
                        "x": np.array([0, 3, 1000], np.int64),
                        "y": np.zeros(3, np.int64)})
    got, noise = _dbscan(pts, r=10, min_pts=2)
    assert got == {5: 5, 9: 5} and noise == 1


def test_dbscan_layout_invariance(ray_session, cloud):
    a = _dbscan(cloud, r=600, blocks=1)
    b = _dbscan(cloud, r=600, blocks=7)
    assert a == b
