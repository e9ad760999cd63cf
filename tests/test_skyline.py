"""Skyline operator: dominance semantics, ties, merge-invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages.skyline import local_skyline, skyline_2d


def brute_skyline(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    keep = []
    for i, a in df.iterrows():
        dominated = ((df[x] >= a[x]) & (df[y] >= a[y])
                     & ((df[x] > a[x]) | (df[y] > a[y]))).any()
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def frame(xs, ys):
    return pd.DataFrame({"x": np.asarray(xs, np.int64),
                         "y": np.asarray(ys, np.int64)})


def canon(df):
    return df.sort_values(["x", "y"], ignore_index=True)[["x", "y"]]


def test_local_matches_brute_force():
    rng = np.random.default_rng(7)
    df = frame(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
    got = canon(local_skyline(df, "x", "y"))
    want = canon(brute_skyline(df, "x", "y"))
    pd.testing.assert_frame_equal(got, want)


def test_ties_on_both_dims_all_kept():
    df = frame([5, 5, 1], [5, 5, 9])
    out = canon(local_skyline(df, "x", "y"))
    # the two identical (5,5) points don't dominate each other
    pd.testing.assert_frame_equal(out, canon(frame([1, 5, 5], [9, 5, 5])))


def test_equal_x_smaller_y_dominated():
    df = frame([5, 5], [3, 7])
    out = canon(local_skyline(df, "x", "y"))
    pd.testing.assert_frame_equal(out, canon(frame([5], [7])))


def test_single_point_and_empty():
    assert len(local_skyline(frame([2], [3]), "x", "y")) == 1
    assert len(local_skyline(frame([], []), "x", "y")) == 0


def test_merge_invariance():
    # skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the property
    # the distributed partial-combine relies on
    rng = np.random.default_rng(11)
    a = frame(rng.integers(0, 50, 300), rng.integers(0, 50, 300))
    b = frame(rng.integers(0, 50, 300), rng.integers(0, 50, 300))
    whole = canon(local_skyline(pd.concat([a, b]), "x", "y"))
    merged = canon(local_skyline(
        pd.concat([local_skyline(a, "x", "y"),
                   local_skyline(b, "x", "y")]), "x", "y"))
    pd.testing.assert_frame_equal(whole, merged)


@pytest.mark.usefixtures("ray_session")
def test_distributed_partition_invariance():
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = frame(rng.integers(0, 40, 500), rng.integers(0, 40, 500))
    want = canon(brute_skyline(df, "x", "y").drop_duplicates())
    for blocks in (1, 7):
        got = canon(skyline_2d(rd.from_pandas(df).repartition(blocks),
                               "x", "y").drop_duplicates())
        pd.testing.assert_frame_equal(got, want)
