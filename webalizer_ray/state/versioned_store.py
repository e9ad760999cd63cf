"""Versioned keyed table store — commit log, time travel, rollback,
vacuum (a minimal lakehouse transaction layer over the bucketed-upsert
machinery).

``state/upsert_store.py`` keeps ONE current state: an apply rewrites
touched bucket files in place, so history is gone. This module makes
every commit a VERSION while keeping the only-touched-buckets cost
model: data files are immutable (``data/b{K}-v{N}.parquet``) and each
commit writes new files ONLY for the buckets its delta touches; the
commit's log entry records the full bucket→file mapping, reusing the
previous version's file names for untouched buckets. Reading as-of
version V is therefore one tiny JSON read + a parquet scan of V's file
list — no reconstruction replay — and storage cost is
O(touched buckets) per commit, not O(store).

Commit protocol (single-writer, the repo's standard shared-store
contract): write the immutable data files first, then publish
``_log/{N:08d}.json`` via tmp+rename — a version exists IFF its log
entry does, so readers never observe a half-written commit and a
crashed commit leaves only unreferenced data files for vacuum to
sweep.

* ``rollback(store, to_version)`` is a METADATA operation: it writes a
  new log entry whose file mapping is the old version's — no data
  moves, and history after the rollback point is preserved (you can
  roll forward again).
* ``vacuum(store, keep_from)`` drops log entries < keep_from and
  deletes data files no surviving version references — the storage
  reclaim that bounds history growth; time travel below the floor
  then raises.

Deletes that empty a bucket still write a (zero-row, full-schema)
file so the mapping never loses the table schema.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from webalizer_ray.stages.aggregate import key_bucket
from webalizer_ray.stages.cdc import BASE_SEQ, OP_DELETE

NUM_BUCKETS_DEFAULT = 32


def _log_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "_log")


def _data_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "data")


def _publish_log(store_dir: str, entry: dict) -> None:
    path = os.path.join(_log_dir(store_dir),
                        f"{entry['version']:08d}.json")
    tmp = path + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f, sort_keys=True)
    os.replace(tmp, path)


def versions(store_dir: str) -> list[dict]:
    """All committed log entries, ascending by version."""
    d = _log_dir(store_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def _entry(store_dir: str, version: int | None) -> dict:
    vs = versions(store_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions in {store_dir}")
    if version is None:
        return vs[-1]
    for e in vs:
        if e["version"] == version:
            return e
    floor = vs[0]["version"]
    if version < floor:
        raise ValueError(
            f"version {version} below the vacuum floor {floor}")
    raise ValueError(f"version {version} not committed "
                     f"(latest is {vs[-1]['version']})")


def init(base: rd.Dataset, store_dir: str, key: str,
         num_buckets: int = NUM_BUCKETS_DEFAULT) -> int:
    """Materialize a base snapshot as version 1."""
    os.makedirs(_log_dir(store_dir), exist_ok=True)
    os.makedirs(_data_dir(store_dir), exist_ok=True)
    data = _data_dir(store_dir)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        name = f"b{b}-v1.parquet"
        t = pa.Table.from_pandas(
            g.drop(columns=["_b"]).sort_values(key), preserve_index=False)
        tmp = os.path.join(data, name + f".{os.getpid()}.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(data, name))
        return pd.DataFrame({"bucket": [np.int64(b)], "file": [name]})

    written = base.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(write_bucket, batch_format="pandas") \
        .to_pandas()
    files = {str(int(b)): f
             for b, f in zip(written["bucket"], written["file"])}
    _publish_log(store_dir, {"version": 1, "op": "init", "key": key,
                             "num_buckets": num_buckets, "files": files})
    return 1


def commit_changes(store_dir: str, changes: rd.Dataset,
                   seq: str = "seq", op: str = "op") -> int:
    """Apply a CDC delta (key, payload..., seq, op) as a new version.

    Touched buckets read their CURRENT file (from the parent entry's
    mapping), resolve last-writer-wins locally, and write an immutable
    new file; untouched buckets' entries are carried over by name.
    """
    parent = _entry(store_dir, None)
    key, num_buckets = parent["key"], parent["num_buckets"]
    new_v = parent["version"] + 1
    data = _data_dir(store_dir)
    parent_files = ray.put(parent["files"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        g = g.drop(columns=["_b"])
        cur = ray.get(parent_files).get(str(b))
        if cur is not None:
            base_df = pq.read_table(os.path.join(data, cur)).to_pandas()
            base_df[seq] = np.int64(BASE_SEQ)
            base_df[op] = "upsert"
            g = pd.concat([base_df[g.columns], g], ignore_index=True)
        w = g.sort_values([key, seq], ascending=[True, False],
                          kind="mergesort").drop_duplicates(key)
        w = w[w[op] != OP_DELETE].drop(columns=[seq, op]) \
            .sort_values(key)
        name = f"b{b}-v{new_v}.parquet"
        tmp = os.path.join(data, name + f".{os.getpid()}.tmp")
        pq.write_table(pa.Table.from_pandas(w, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(data, name))
        return pd.DataFrame({"bucket": [np.int64(b)], "file": [name]})

    written = changes.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(merge_bucket, batch_format="pandas") \
        .to_pandas()
    files = dict(parent["files"])
    for b, f in zip(written["bucket"], written["file"]):
        files[str(int(b))] = f
    _publish_log(store_dir, {
        "version": new_v, "op": "apply", "key": key,
        "num_buckets": num_buckets, "files": files,
        "touched": sorted(int(b) for b in written["bucket"])})
    return new_v


def read(store_dir: str, version: int | None = None) -> rd.Dataset:
    """Streaming scan of the store as of ``version`` (default latest):
    one log-entry read resolves the exact file list — no replay."""
    e = _entry(store_dir, version)
    data = _data_dir(store_dir)
    paths = [os.path.join(data, f) for f in sorted(e["files"].values())]
    return rd.read_parquet(paths)


def rollback(store_dir: str, to_version: int) -> int:
    """Publish a NEW version whose file mapping is ``to_version``'s —
    pure metadata, no data files move or copy."""
    target = _entry(store_dir, to_version)
    latest = _entry(store_dir, None)
    new_v = latest["version"] + 1
    _publish_log(store_dir, {
        "version": new_v, "op": "rollback", "key": target["key"],
        "num_buckets": target["num_buckets"],
        "files": dict(target["files"]), "rolled_back_to": to_version})
    return new_v


def vacuum(store_dir: str, keep_from: int) -> dict:
    """Drop log entries < keep_from and delete data files no surviving
    version references. Returns {'dropped_versions': n, 'deleted_files':
    n}. Time travel below the new floor raises afterwards."""
    vs = versions(store_dir)
    if not vs or keep_from > vs[-1]["version"]:
        raise ValueError("keep_from must be <= the latest version")
    keep = [e for e in vs if e["version"] >= keep_from]
    drop = [e for e in vs if e["version"] < keep_from]
    live = {f for e in keep for f in e["files"].values()}
    data = _data_dir(store_dir)
    deleted = 0
    for name in os.listdir(data):
        if name.endswith(".parquet") and name not in live:
            os.remove(os.path.join(data, name))
            deleted += 1
    for e in drop:  # metadata last: a crash mid-sweep stays readable
        os.remove(os.path.join(_log_dir(store_dir),
                               f"{e['version']:08d}.json"))
    return {"dropped_versions": len(drop), "deleted_files": deleted}
