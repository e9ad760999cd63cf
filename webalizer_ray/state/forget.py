"""Right-to-be-forgotten: physical key erasure across stores.

Deleting a key from the CURRENT state is easy (a CDC delete); GDPR
erasure must remove the rows from EVERY readable byte — including the
immutable history files a versioned store keeps for time travel. Two
primitives:

* ``scrub_parquet_dir(dir, key_col, keys)`` — general table scrub.
  Every file's KEY COLUMN is read (column-pruned — the cheap probe);
  files with no hit are left byte-untouched (not rewritten, mtime
  preserved — at 100 TB almost all files miss and the job costs one
  key-column scan), files with hits are rewritten minus the rows via
  tmp+rename. Fan-out is an ordinary map_batches over the file list.

* ``forget_keys(store_dir, keys)`` — versioned-store erasure
  (state/versioned_store.py). Keys hash to buckets, so only those
  buckets' files can hold them; ALL live versions' files for the
  affected buckets are scrubbed IN PLACE under their existing names
  (the sanctioned exception to file immutability: every log entry's
  mapping stays valid, history structure and every version's
  non-forgotten rows are preserved, but the forgotten rows are
  physically gone from every version). Idempotent — a retry finds
  nothing left to remove.

Both return per-file accounting so callers can audit the erasure.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from webalizer_ray.state import versioned_store as _vs


def scrub_parquet_dir(path: str, key_col: str, keys) -> pd.DataFrame:
    """Remove rows whose ``key_col`` is in ``keys`` from every parquet
    file under ``path``. Returns (file, removed, rewritten) — files
    without hits are not rewritten."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    else:
        files = [path]
    keys_ref = ray.put(np.asarray(sorted(set(keys))))

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        kset = ray.get(keys_ref)
        out = []
        for p in df["path"]:
            probe = pq.read_table(p, columns=[key_col])
            hit = np.isin(np.asarray(probe[key_col]), kset)
            n_hit = int(hit.sum())
            if n_hit:
                t = pq.read_table(p)
                t = t.filter(pa.array(~hit))
                tmp = p + f".{os.getpid()}.scrub.tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, p)
            out.append({"file": os.path.basename(p),
                        "removed": np.int64(n_hit),
                        "rewritten": bool(n_hit)})
        return pd.DataFrame(out)

    rep = rd.from_items([{"path": p} for p in files]) \
        .map_batches(scrub, batch_format="pandas").to_pandas()
    return rep.sort_values("file", ignore_index=True)


def forget_keys(store_dir: str, keys) -> pd.DataFrame:
    """Erase ``keys`` from EVERY version of a versioned store.

    Only the buckets the keys hash into are touched; their files are
    scrubbed in place (same names — all log-entry mappings stay
    valid). Returns (file, removed, rewritten)."""
    from webalizer_ray.stages.aggregate import key_bucket

    entries = _vs.versions(store_dir)
    if not entries:
        raise FileNotFoundError(f"no committed versions in {store_dir}")
    latest = entries[-1]
    key_col, num_buckets = latest["key"], latest["num_buckets"]

    kdf = pd.DataFrame({key_col: sorted(set(keys))})
    buckets = set(key_bucket(kdf, [key_col], num_buckets).tolist())

    data = _vs._data_dir(store_dir)
    live = sorted({f for e in entries for f in e["files"].values()
                   if int(f.split("-", 1)[0][1:]) in buckets})
    if not live:
        return pd.DataFrame(columns=["file", "removed", "rewritten"])
    keys_ref = ray.put(np.asarray(sorted(set(keys))))

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        kset = ray.get(keys_ref)
        out = []
        for name in df["file"]:
            p = os.path.join(data, name)
            t = pq.read_table(p)
            hit = np.isin(np.asarray(t[key_col]), kset)
            n_hit = int(hit.sum())
            if n_hit:
                tmp = p + f".{os.getpid()}.scrub.tmp"
                pq.write_table(t.filter(pa.array(~hit)), tmp)
                os.replace(tmp, p)
            out.append({"file": name, "removed": np.int64(n_hit),
                        "rewritten": bool(n_hit)})
        return pd.DataFrame(out)

    rep = rd.from_items([{"file": f} for f in live]) \
        .map_batches(scrub, batch_format="pandas").to_pandas()
    return rep.sort_values("file", ignore_index=True)
