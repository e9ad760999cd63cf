"""Versioned store: replay parity vs a pandas oracle, untouched-bucket
file reuse (no copy — same immutable file, byte-untouched), metadata
rollback, vacuum reclaim + floor enforcement, and delete-to-empty
schema preservation."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.state import versioned_store as vs


def _base() -> pd.DataFrame:
    return pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "val": np.arange(100, dtype=np.int64) * 10})


def _delta(ops) -> rd.Dataset:
    # ops: list of (k, val, op)
    df = pd.DataFrame(ops, columns=["k", "val", "op"])
    df["k"] = df["k"].astype(np.int64)
    df["val"] = df["val"].astype(np.int64)
    df["seq"] = np.arange(len(df), dtype=np.int64)
    return rd.from_pandas(df[["k", "val", "seq", "op"]])


@pytest.fixture()
def store(ray_session, tmp_path):
    d = str(tmp_path / "store")
    vs.init(rd.from_pandas(_base()), d, key="k", num_buckets=4)
    vs.commit_changes(d, _delta([(5, 999, "upsert"), (7, 0, "delete"),
                                 (200, 42, "upsert")]))
    vs.commit_changes(d, _delta([(5, 1000, "upsert"), (200, 0, "delete"),
                                 (7, 77, "upsert")]))
    return d


def _expect(version: int) -> pd.DataFrame:
    df = _base().set_index("k")
    if version >= 2:
        df.loc[5] = 999
        df = df.drop(7)
        df.loc[200] = 42
    if version >= 3:
        df.loc[5] = 1000
        df = df.drop(200)
        df.loc[7] = 77
    return df.sort_index().reset_index()


@pytest.mark.parametrize("v", [1, 2, 3])
def test_read_as_of_matches_replay(store, v):
    got = vs.read(store, v).to_pandas().sort_values("k",
                                                    ignore_index=True)
    pd.testing.assert_frame_equal(got, _expect(v))


def test_latest_is_default(store):
    got = vs.read(store).to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got, _expect(3))


def test_untouched_buckets_reuse_files_byte_identical(store):
    entries = vs.versions(store)
    e1, e2 = entries[0], entries[1]
    touched = set(str(b) for b in e2["touched"])
    untouched = set(e1["files"]) - touched
    assert untouched, "fixture degenerate: every bucket touched"
    for b in untouched:
        assert e2["files"][b] == e1["files"][b]  # same immutable file
    for b in touched:
        assert e2["files"][b] != e1["files"][b]


def test_rollback_is_metadata_only_and_can_roll_forward(store):
    data = os.path.join(store, "data")
    before = {f: os.path.getmtime(os.path.join(data, f))
              for f in os.listdir(data)}
    v4 = vs.rollback(store, 1)
    assert v4 == 4
    after = {f: os.path.getmtime(os.path.join(data, f))
             for f in os.listdir(data)}
    assert before == after  # no data file written or touched
    got = vs.read(store, 4).to_pandas().sort_values("k",
                                                    ignore_index=True)
    pd.testing.assert_frame_equal(got, _expect(1))
    # history above the rollback point is still reachable
    got3 = vs.read(store, 3).to_pandas().sort_values("k",
                                                     ignore_index=True)
    pd.testing.assert_frame_equal(got3, _expect(3))
    # and a new commit applies on top of the rolled-back state
    vs.commit_changes(store, _delta([(0, 111, "upsert")]))
    got5 = vs.read(store, 5).to_pandas()
    assert got5.loc[got5["k"] == 0, "val"].iloc[0] == 111
    assert 7 in got5["k"].to_numpy()  # v1 state: key 7 never deleted


def test_vacuum_reclaims_and_enforces_floor(store):
    data = os.path.join(store, "data")
    n_before = len(os.listdir(data))
    stats = vs.vacuum(store, keep_from=3)
    assert stats["dropped_versions"] == 2
    assert stats["deleted_files"] > 0
    assert len(os.listdir(data)) == n_before - stats["deleted_files"]
    got = vs.read(store, 3).to_pandas().sort_values("k",
                                                    ignore_index=True)
    pd.testing.assert_frame_equal(got, _expect(3))
    with pytest.raises(ValueError, match="vacuum floor"):
        vs.read(store, 1)


def test_delete_to_empty_keeps_schema(ray_session, tmp_path):
    d = str(tmp_path / "tiny")
    base = pd.DataFrame({"k": np.array([1], np.int64),
                         "val": np.array([5], np.int64)})
    vs.init(rd.from_pandas(base), d, key="k", num_buckets=1)
    vs.commit_changes(d, _delta([(1, 0, "delete")]))
    ds = vs.read(d, 2)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"k", "val"}
