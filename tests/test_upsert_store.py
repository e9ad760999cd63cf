"""Persistent bucketed upsert store: incremental == one-shot merge,
untouched buckets untouched on disk, idempotent retry, delete path."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from webalizer_ray.stages.cdc import merge_changes
from webalizer_ray.state.upsert_store import (
    apply_changes, init_store, read_store)


def _base(n=200):
    return pd.DataFrame({"key": np.arange(n, dtype=np.int64),
                         "val": np.arange(n, dtype=np.float64) * 0.5})


def _changes(seed, n=120, key_space=260, seq0=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "key": rng.choice(key_space, n, replace=False).astype(np.int64),
        "val": rng.integers(-640, 640, n) / 64.0,
        "seq": (np.arange(n) + seq0).astype(np.int64),
        "op": rng.choice(["upsert", "upsert", "delete"], n)})


def test_incremental_equals_oneshot(ray_session, tmp_path):
    d = str(tmp_path / "store")
    base = _base()
    c1, c2 = _changes(1, seq0=0), _changes(2, seq0=1000)

    init_store(rd.from_pandas(base), d, "key", num_buckets=8)
    apply_changes(d, rd.from_pandas(c1), "key", num_buckets=8)
    apply_changes(d, rd.from_pandas(c2), "key", num_buckets=8)
    got = read_store(d).to_pandas().sort_values("key", ignore_index=True)

    want = merge_changes(
        rd.from_pandas(base),
        rd.from_pandas(pd.concat([c1, c2], ignore_index=True)),
        "key").to_pandas().sort_values("key", ignore_index=True)
    pd.testing.assert_frame_equal(got[["key", "val"]],
                                  want[["key", "val"]], check_like=True)


def test_untouched_buckets_not_rewritten(ray_session, tmp_path):
    d = str(tmp_path / "store2")
    init_store(rd.from_pandas(_base()), d, "key", num_buckets=8)
    before = {f: os.stat(os.path.join(d, f)).st_mtime_ns
              for f in os.listdir(d)}
    # a single-key change touches exactly one bucket
    one = pd.DataFrame({"key": np.array([5], np.int64), "val": [9.0],
                        "seq": np.array([1], np.int64), "op": ["upsert"]})
    touched = apply_changes(d, rd.from_pandas(one), "key", num_buckets=8)
    assert len(touched) == 1
    after = {f: os.stat(os.path.join(d, f)).st_mtime_ns
             for f in os.listdir(d)}
    changed = [f for f in before if before[f] != after[f]]
    assert len(changed) == 1
    got = read_store(d).to_pandas()
    assert got.loc[got["key"] == 5, "val"].iloc[0] == 9.0


def test_retry_is_idempotent(ray_session, tmp_path):
    d = str(tmp_path / "store3")
    init_store(rd.from_pandas(_base()), d, "key", num_buckets=8)
    c = _changes(3)
    apply_changes(d, rd.from_pandas(c), "key", num_buckets=8)
    s1 = read_store(d).to_pandas().sort_values("key", ignore_index=True)
    apply_changes(d, rd.from_pandas(c), "key", num_buckets=8)  # retry
    s2 = read_store(d).to_pandas().sort_values("key", ignore_index=True)
    pd.testing.assert_frame_equal(s1, s2)


def test_delete_then_reinsert_across_applies(ray_session, tmp_path):
    d = str(tmp_path / "store4")
    init_store(rd.from_pandas(_base(10)), d, "key", num_buckets=4)
    dele = pd.DataFrame({"key": np.array([3], np.int64), "val": [0.0],
                         "seq": np.array([1], np.int64), "op": ["delete"]})
    apply_changes(d, rd.from_pandas(dele), "key", num_buckets=4)
    assert 3 not in set(read_store(d).to_pandas()["key"])
    re = pd.DataFrame({"key": np.array([3], np.int64), "val": [7.0],
                       "seq": np.array([2], np.int64), "op": ["upsert"]})
    apply_changes(d, rd.from_pandas(re), "key", num_buckets=4)
    got = read_store(d).to_pandas()
    assert got.loc[got["key"] == 3, "val"].iloc[0] == 7.0
