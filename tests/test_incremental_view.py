"""Incremental materialized-view maintenance: incremental refresh ==
full recompute across commits/deletes/rollbacks, untouched bucket
files are NEVER read (proven by deleting them from disk), idempotent
re-refresh, and multi-version catch-up in one call."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.state import versioned_store as vs
from webalizer_ray.state.incremental_view import read_view, refresh


def _base(n=60) -> pd.DataFrame:
    k = np.arange(n, dtype=np.int64)
    return pd.DataFrame({"k": k, "grp": k % 3, "val": k * 2})


def _delta(ops) -> rd.Dataset:
    df = pd.DataFrame(ops, columns=["k", "grp", "val", "op"])
    for c in ("k", "grp", "val"):
        df[c] = df[c].astype(np.int64)
    df["seq"] = np.arange(len(df), dtype=np.int64)
    return rd.from_pandas(df[["k", "grp", "val", "seq", "op"]])


def _full(store, v) -> pd.DataFrame:
    df = vs.read(store, v).to_pandas()
    out = df.groupby("grp", as_index=False).agg(n=("val", "size"),
                                                s=("val", "sum"))
    out["n"] = out["n"].astype(np.int64)
    out["s"] = out["s"].astype(np.int64)
    return out.sort_values("grp", ignore_index=True)


@pytest.fixture()
def store(ray_session, tmp_path):
    d = str(tmp_path / "store")
    vs.init(rd.from_pandas(_base()), d, key="k", num_buckets=6)
    return d


def test_incremental_equals_full_across_commits(store, tmp_path):
    view = str(tmp_path / "view")
    assert refresh(store, view, "grp", "val") == 1
    pd.testing.assert_frame_equal(read_view(view), _full(store, 1))

    vs.commit_changes(store, _delta([(5, 2, 999, "upsert"),
                                     (7, 1, 0, "delete"),
                                     (100, 1, 42, "upsert")]))
    vs.commit_changes(store, _delta([(100, 1, 0, "delete"),
                                     (5, 2, 1000, "upsert")]))
    assert refresh(store, view, "grp", "val") == 3   # catches up 2 vs
    pd.testing.assert_frame_equal(read_view(view), _full(store, 3))
    # earlier view versions remain readable
    pd.testing.assert_frame_equal(read_view(view, 1), _full(store, 1))


def test_untouched_bucket_files_never_read(store, tmp_path):
    view = str(tmp_path / "view")
    refresh(store, view, "grp", "val")
    v2 = vs.commit_changes(store, _delta([(5, 2, 999, "upsert")]))
    entries = {e["version"]: e for e in vs.versions(store)}
    touched_files = set()
    for b in entries[v2]["touched"]:
        touched_files.add(entries[v2]["files"][str(b)])
        touched_files.add(entries[1]["files"][str(b)])
    expected = _full(store, 2)  # compute BEFORE corrupting the store
    data = os.path.join(store, "data")
    for f in os.listdir(data):  # delete everything the refresh may
        if f not in touched_files:  # not touch — a read would crash
            os.remove(os.path.join(data, f))
    assert refresh(store, view, "grp", "val") == 2
    pd.testing.assert_frame_equal(read_view(view), expected)


def test_refresh_idempotent_and_rollback_aware(store, tmp_path):
    view = str(tmp_path / "view")
    refresh(store, view, "grp", "val")
    assert refresh(store, view, "grp", "val") == 1  # no-op retry

    vs.commit_changes(store, _delta([(0, 0, 777, "upsert")]))
    refresh(store, view, "grp", "val")
    vs.rollback(store, 1)
    assert refresh(store, view, "grp", "val") == 3
    pd.testing.assert_frame_equal(read_view(view), _full(store, 1))


def test_group_vanishes_when_all_rows_deleted(ray_session, tmp_path):
    d = str(tmp_path / "s2")
    base = pd.DataFrame({"k": np.array([1, 2], np.int64),
                         "grp": np.array([0, 1], np.int64),
                         "val": np.array([10, 20], np.int64)})
    vs.init(rd.from_pandas(base), d, key="k", num_buckets=2)
    view = str(tmp_path / "v2")
    refresh(d, view, "grp", "val")
    vs.commit_changes(d, _delta([(2, 1, 0, "delete")]))
    refresh(d, view, "grp", "val")
    got = read_view(view)
    assert got["grp"].tolist() == [0]
