"""Right-to-be-forgotten: physical erasure, files without hits left
byte-untouched, every VERSION of a versioned store scrubbed (history
included), idempotent retries."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from webalizer_ray.state import versioned_store as vs
from webalizer_ray.state.forget import forget_keys, scrub_parquet_dir


def test_scrub_dir_rewrites_only_hit_files(ray_session, tmp_path):
    d = tmp_path / "t"
    os.makedirs(d)
    pq.write_table(pa.table({"u": pa.array([1, 2, 3], pa.int64()),
                             "v": pa.array([10, 20, 30], pa.int64())}),
                   str(d / "a.parquet"))
    pq.write_table(pa.table({"u": pa.array([7, 8], pa.int64()),
                             "v": pa.array([70, 80], pa.int64())}),
                   str(d / "b.parquet"))
    mtime_b = os.path.getmtime(d / "b.parquet")

    rep = scrub_parquet_dir(str(d), "u", [2, 99])
    rep = rep.set_index("file")
    assert rep.loc["a.parquet", "removed"] == 1
    assert rep.loc["b.parquet", "removed"] == 0
    assert not rep.loc["b.parquet", "rewritten"]
    assert os.path.getmtime(d / "b.parquet") == mtime_b  # byte-untouched

    left = pd.read_parquet(d).sort_values("u", ignore_index=True)
    assert left["u"].tolist() == [1, 3, 7, 8]
    # idempotent: nothing left to remove
    rep2 = scrub_parquet_dir(str(d), "u", [2, 99])
    assert rep2["removed"].sum() == 0 and not rep2["rewritten"].any()


def _delta(ops) -> rd.Dataset:
    df = pd.DataFrame(ops, columns=["k", "val", "op"])
    df["k"] = df["k"].astype(np.int64)
    df["val"] = df["val"].astype(np.int64)
    df["seq"] = np.arange(len(df), dtype=np.int64)
    return rd.from_pandas(df[["k", "val", "seq", "op"]])


def test_forget_erases_key_from_every_version(ray_session, tmp_path):
    d = str(tmp_path / "store")
    base = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                         "val": np.arange(20, dtype=np.int64) * 10})
    vs.init(rd.from_pandas(base), d, key="k", num_buckets=4)
    vs.commit_changes(d, _delta([(5, 999, "upsert"), (3, 0, "delete")]))
    vs.commit_changes(d, _delta([(5, 1000, "upsert")]))

    rep = forget_keys(d, [5])
    # key 5 had a row in v1's bucket file and each commit's rewrite
    assert rep["removed"].sum() == 3

    for v in (1, 2, 3):
        got = vs.read(d, v).to_pandas()
        assert 5 not in got["k"].to_numpy()
    # non-forgotten history is intact: v2 still lacks deleted key 3,
    # v1 still has it
    assert 3 not in vs.read(d, 2).to_pandas()["k"].to_numpy()
    assert 3 in vs.read(d, 1).to_pandas()["k"].to_numpy()
    assert vs.read(d, 1).count() == 19  # 20 - forgotten key

    # idempotent
    rep2 = forget_keys(d, [5])
    assert rep2["removed"].sum() == 0


def test_forget_touches_only_hashed_buckets(ray_session, tmp_path):
    d = str(tmp_path / "store")
    base = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                         "val": np.zeros(40, np.int64)})
    vs.init(rd.from_pandas(base), d, key="k", num_buckets=8)
    data = os.path.join(d, "data")
    before = {f: os.path.getmtime(os.path.join(data, f))
              for f in os.listdir(data)}
    rep = forget_keys(d, [7])
    touched = set(rep[rep["rewritten"]]["file"])
    assert len(touched) == 1  # key hashes to exactly one bucket
    for f, mt in before.items():
        if f not in set(rep["file"]):
            assert os.path.getmtime(os.path.join(data, f)) == mt
