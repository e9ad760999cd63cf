"""Incremental materialized-view maintenance over the versioned store.

A grouped aggregate (the monthly-report analog) over a 100 TB table
must not recompute from scratch because one delta landed. This module
keeps a SUM/COUNT view exact across versions by the classic
delta-maintenance rule: when version V commits, only the buckets V
TOUCHED changed, so

    view(V) = view(V-1) − partials(old touched files)
                        + partials(new touched files)

Everything else — the untouched buckets — contributes exactly what it
contributed before, byte-identically, because the versioned store's
untouched files are carried over BY NAME (state/versioned_store.py).
The refresh therefore reads O(touched buckets) data regardless of
store size; correctness needs additive measures (SUM/COUNT — the
algebraic class; MIN/MAX would need a recompute fallback on deletes).

The view itself is versioned alongside the table: ``view_dir/v{N}.parquet``
plus ``_state.json`` (tmp+rename publish, idempotent refresh — a retry
of an already-materialized version is a no-op). A refresh that skips
versions folds every intermediate version's delta in one pass.

All refresh reads fan out as ordinary Ray scans; the view table that
reaches the driver is O(groups).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from webalizer_ray.state import versioned_store as _vs


def _partials(paths: list[str], group_col: str,
              val_col: str) -> pd.DataFrame:
    """(group, n, s) per group over the given store files (empty frame
    if no paths — e.g. version 0)."""
    if not paths:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "s": pd.Series([], dtype=np.int64)})

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or group_col not in df.columns:
            # zero-row store files (a bucket whose rows were all
            # deleted) arrive as schema-less empty blocks (Ray quirk)
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64)})
        g = df.groupby(group_col, as_index=False).agg(
            n=(val_col, "size"), s=(val_col, "sum"))
        g["n"] = g["n"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        return g

    out = rd.read_parquet(paths).map_batches(
        part, batch_format="pandas").to_pandas()
    if not len(out) or group_col not in out.columns:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "s": pd.Series([], dtype=np.int64)})
    return out.groupby(group_col, as_index=False).sum()


def _combine(view: pd.DataFrame, delta: pd.DataFrame, sign: int,
             group_col: str) -> pd.DataFrame:
    d = delta.copy()
    d["n"] = sign * d["n"]
    d["s"] = sign * d["s"]
    out = pd.concat([view, d], ignore_index=True) \
        .groupby(group_col, as_index=False).sum()
    out = out[out["n"] > 0]  # groups whose rows all vanished drop out
    out["n"] = out["n"].astype(np.int64)
    out["s"] = out["s"].astype(np.int64)
    return out.sort_values(group_col, ignore_index=True)


def refresh(store_dir: str, view_dir: str, group_col: str,
            val_col: str) -> int:
    """Bring the view to the store's latest version incrementally.

    First call materializes the full aggregate at the latest version;
    later calls fold only the touched buckets' old/new file partials
    for each version since the view's last one. Returns the view's
    new version. Idempotent (tmp+rename publish, versioned files)."""
    os.makedirs(view_dir, exist_ok=True)
    entries = _vs.versions(store_dir)
    if not entries:
        raise FileNotFoundError(f"no committed versions in {store_dir}")
    latest = entries[-1]["version"]
    data = _vs._data_dir(store_dir)

    state_path = os.path.join(view_dir, "_state.json")
    if os.path.exists(state_path):
        with open(state_path) as f:
            have = json.load(f)["version"]
    else:
        have = None

    if have is None:
        view = _partials(
            [os.path.join(data, f)
             for f in sorted(entries[-1]["files"].values())],
            group_col, val_col)
        view = _combine(view, view.iloc[0:0], 1, group_col)
    elif have >= latest:
        return have
    else:
        view = pq.read_table(
            os.path.join(view_dir, f"v{have}.parquet")).to_pandas()
        by_v = {e["version"]: e for e in entries}
        for v in range(have + 1, latest + 1):
            cur, prev = by_v[v], by_v[v - 1]
            old_files, new_files = [], []
            for b, f in cur["files"].items():
                pf = prev["files"].get(b)
                if pf != f:  # touched (or newly created) bucket
                    new_files.append(os.path.join(data, f))
                    if pf is not None:
                        old_files.append(os.path.join(data, pf))
            for b, pf in prev["files"].items():  # buckets dropped at v
                if b not in cur["files"]:
                    old_files.append(os.path.join(data, pf))
            view = _combine(view, _partials(old_files, group_col,
                                            val_col), -1, group_col)
            view = _combine(view, _partials(new_files, group_col,
                                            val_col), +1, group_col)

    out = os.path.join(view_dir, f"v{latest}.parquet")
    tmp = out + f".{os.getpid()}.tmp"
    pq.write_table(pa.Table.from_pandas(view, preserve_index=False), tmp)
    os.replace(tmp, out)
    stmp = state_path + f".{os.getpid()}.tmp"
    with open(stmp, "w") as f:
        json.dump({"version": latest, "group_col": group_col,
                   "val_col": val_col}, f)
    os.replace(stmp, state_path)
    return latest


def read_view(view_dir: str, version: int | None = None) -> pd.DataFrame:
    """The materialized (group, n, s) table at a refreshed version."""
    if version is None:
        with open(os.path.join(view_dir, "_state.json")) as f:
            version = json.load(f)["version"]
    return pq.read_table(
        os.path.join(view_dir, f"v{version}.parquet")).to_pandas()
