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
