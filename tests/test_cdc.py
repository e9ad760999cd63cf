"""CDC merge (MERGE INTO / upsert-apply) semantics vs a pandas model."""

import numpy as np
import pandas as pd
import ray.data as rd

from webalizer_ray.stages.cdc import merge_changes


def _model(base: pd.DataFrame, changes: pd.DataFrame, key: str):
    """Last-writer-wins reference: base rows at seq=-1, winning delete
    retires the key."""
    b = base.copy()
    b["seq"] = np.int64(-1)
    b["op"] = "upsert"
    u = pd.concat([b, changes], ignore_index=True)
    w = u.sort_values([key, "seq"], ascending=[True, False],
                      kind="mergesort").drop_duplicates(key)
    w = w[w["op"] != "delete"]
    return w.drop(columns=["seq", "op"]).sort_values(key,
                                                     ignore_index=True)


def _rand_tables(seed: int, n_base=200, n_changes=400, key_space=120):
    rng = np.random.default_rng(seed)
    base = pd.DataFrame({
        "key": rng.choice(key_space, n_base, replace=False)
        if n_base <= key_space else np.arange(n_base),
        "val": rng.normal(size=n_base).round(3),
    }).astype({"key": np.int64})
    # keys beyond key_space exercise pure inserts (no base row)
    changes = pd.DataFrame({
        "key": rng.integers(0, key_space + 30, n_changes).astype(np.int64),
        "val": rng.normal(size=n_changes).round(3),
        "seq": rng.permutation(n_changes).astype(np.int64),  # unique seqs
        "op": rng.choice(["upsert", "upsert", "upsert", "delete"],
                         n_changes),
    })
    return base, changes


def test_merge_matches_pandas_model(ray_session):
    base, changes = _rand_tables(7, n_base=100, key_space=120)
    got = merge_changes(rd.from_pandas(base), rd.from_pandas(changes),
                        "key", num_buckets=8).to_pandas() \
        .sort_values("key", ignore_index=True)
    want = _model(base, changes, "key")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_like=True)


def test_insert_delete_reinsert_ordering(ray_session):
    base = pd.DataFrame({"key": np.array([1, 2], np.int64),
                         "val": [10.0, 20.0]})
    changes = pd.DataFrame({
        "key": np.array([1, 1, 2, 3], np.int64),
        "val": [11.0, 12.0, 0.0, 30.0],
        "seq": np.array([5, 9, 4, 2], np.int64),
        # key 1: upsert then later upsert wins; key 2: delete wins;
        # key 3: pure insert
        "op": ["upsert", "upsert", "delete", "upsert"],
    })
    got = merge_changes(rd.from_pandas(base), rd.from_pandas(changes),
                        "key", num_buckets=4).to_pandas() \
        .sort_values("key", ignore_index=True)
    assert got["key"].tolist() == [1, 3]
    assert got["val"].tolist() == [12.0, 30.0]


def test_delete_then_later_upsert_survives(ray_session):
    base = pd.DataFrame({"key": np.array([1], np.int64), "val": [1.0]})
    changes = pd.DataFrame({
        "key": np.array([1, 1], np.int64), "val": [0.0, 99.0],
        "seq": np.array([3, 8], np.int64), "op": ["delete", "upsert"]})
    got = merge_changes(rd.from_pandas(base), rd.from_pandas(changes),
                        "key").to_pandas()
    assert got["val"].tolist() == [99.0]


def test_empty_changes_is_identity(ray_session):
    base = pd.DataFrame({"key": np.arange(10, dtype=np.int64),
                         "val": np.arange(10, dtype=np.float64)})
    changes = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                            "val": pd.Series([], dtype=np.float64),
                            "seq": pd.Series([], dtype=np.int64),
                            "op": pd.Series([], dtype=object)})
    got = merge_changes(rd.from_pandas(base), rd.from_pandas(changes),
                        "key", num_buckets=4).to_pandas() \
        .sort_values("key", ignore_index=True)
    pd.testing.assert_frame_equal(got, base, check_like=True)


def test_delete_everything_yields_empty(ray_session):
    base = pd.DataFrame({"key": np.arange(5, dtype=np.int64),
                         "val": np.ones(5)})
    changes = pd.DataFrame({
        "key": np.arange(5, dtype=np.int64), "val": np.zeros(5),
        "seq": np.arange(5, dtype=np.int64),
        "op": ["delete"] * 5})
    got = merge_changes(rd.from_pandas(base), rd.from_pandas(changes),
                        "key", num_buckets=4).to_pandas()
    assert len(got) == 0


def test_no_base_pure_replay(ray_session):
    changes = pd.DataFrame({
        "key": np.array([7, 7, 8], np.int64), "val": [1.0, 2.0, 3.0],
        "seq": np.array([1, 2, 1], np.int64),
        "op": ["upsert", "upsert", "upsert"]})
    got = merge_changes(None, rd.from_pandas(changes), "key") \
        .to_pandas().sort_values("key", ignore_index=True)
    assert got["key"].tolist() == [7, 8]
    assert got["val"].tolist() == [2.0, 3.0]
