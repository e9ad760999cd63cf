"""ALS collaborative filtering (stages/recommend.py): recovers a
planted low-rank matrix, objective improves over iterations, layout
invariance, and the broadcast/partial plumbing is exact about shapes."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.stages.recommend import als_fit, als_rmse


def _planted(n_users=60, n_items=25, rank=2, frac=0.6, seed=3):
    """Ratings from a rank-2 model, observed on a deterministic
    pseudo-random subset."""
    rng = np.random.RandomState(seed)
    U = rng.normal(size=(n_users, rank))
    V = rng.normal(size=(n_items, rank))
    full = U @ V.T
    mask = rng.rand(n_users, n_items) < frac
    u, i = np.nonzero(mask)
    return pd.DataFrame({"user": u.astype(np.int64) + 1,
                         "item": i.astype(np.int64) + 1,
                         "rating": full[u, i]})


@pytest.fixture(scope="module")
def planted():
    return _planted()


def test_als_recovers_low_rank(ray_session, planted):
    ds = rd.from_pandas(planted).repartition(4)
    uf, vf = als_fit(ds, k=4, iters=8, reg=0.01, num_buckets=8)
    rmse = als_rmse(ds, uf, vf, k=4)
    # rank-2 signal, k=4 factors, 8 sweeps, small reg: near-exact fit
    assert rmse < 0.05, rmse
    assert set(vf["item"]) == set(planted["item"].unique())
    assert uf.count() == planted["user"].nunique()


def test_als_objective_improves(ray_session, planted):
    ds = rd.from_pandas(planted).repartition(4)
    uf1, vf1 = als_fit(ds, k=4, iters=1, reg=0.05, num_buckets=8)
    uf4, vf4 = als_fit(ds, k=4, iters=4, reg=0.05, num_buckets=8)
    r1 = als_rmse(ds, uf1, vf1, k=4)
    r4 = als_rmse(ds, uf4, vf4, k=4)
    assert r4 < r1, (r1, r4)


def test_als_layout_invariance(ray_session, planted):
    a = als_fit(rd.from_pandas(planted).repartition(1),
                k=3, iters=2, reg=0.1, num_buckets=4)
    b = als_fit(rd.from_pandas(planted).repartition(9),
                k=3, iters=2, reg=0.1, num_buckets=4)
    va = a[1].sort_values("item", ignore_index=True)
    vb = b[1].sort_values("item", ignore_index=True)
    pd.testing.assert_frame_equal(va, vb, check_exact=False, atol=1e-8)


def test_als_cold_item_absent(ray_session):
    # an item never rated simply doesn't get factors (no NaN solve)
    df = _planted(n_users=20, n_items=10)
    uf, vf = als_fit(rd.from_pandas(df), k=2, iters=1, num_buckets=4)
    assert not vf[[f"f{d}" for d in range(2)]].isna().any().any()
