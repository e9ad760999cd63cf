"""Persisted zone-map skipping index (file-level min/max pruning).

``sources/readers.py:footer_aggregate`` opens every footer per query;
at 100 TB with ~10⁵ files that is 10⁵ metadata round-trips EVERY query.
A zone map pays them once: one row per (file, column) holding
min / max / nulls / rows, persisted as a single tiny parquet (the
Delta/Iceberg file-statistics idea reduced to its core). A range query
then reads the zone map (one small file), keeps only the files whose
[min, max] interval overlaps the predicate, and scans JUST those —
with the same predicate pushed into the scan for row-group pruning
inside the survivors.

Safety rules (a skipping index must never change answers):
* files that appeared AFTER the zone map was built are ALWAYS scanned
  (unknown ≠ prunable);
* a zone-mapped file that no longer exists raises loudly (stale index)
  rather than silently under-reading;
* columns without exact stats simply get no zone-map row → their
  files are always scanned.

Build fans out as an ordinary map_batches over the file list (footer
reads only — no data bytes), and is atomic (tmp+rename).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    return [path]


def build_zonemap(table_dir: str, columns: list[str],
                  out_path: str) -> str:
    """One footer pass → (file, column, vmin, vmax, nulls, rows)
    parquet at ``out_path``. Values are stored as strings with a dtype
    tag so one zone map serves numeric / temporal / string columns."""
    files = _list_files(table_dir)
    cols = list(columns)

    def footer_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p in df["path"]:
            md = pq.ParquetFile(p).metadata
            rel = os.path.relpath(p, table_dir) \
                if os.path.isdir(table_dir) else os.path.basename(p)
            if not md.num_row_groups:
                continue
            idx = {md.row_group(0).column(i).path_in_schema: i
                   for i in range(md.row_group(0).num_columns)}
            for c in cols:
                if c not in idx:
                    continue
                lo, hi, nulls, ok = [], [], 0, True
                for g in range(md.num_row_groups):
                    col = md.row_group(g).column(idx[c])
                    st = col.statistics
                    if st is None or (not st.has_min_max
                                      and col.num_values > 0):
                        ok = False
                        break
                    if st.has_min_max:
                        lo.append(st.min)
                        hi.append(st.max)
                    nulls += st.null_count if st.has_null_count else 0
                if not ok or not lo:
                    continue  # no exact stats → never prunable
                vmin, vmax = min(lo), max(hi)
                out.append({
                    "file": rel, "column": c,
                    "vmin": repr(vmin), "vmax": repr(vmax),
                    "dtype": type(vmin).__name__,
                    "nulls": np.int64(nulls),
                    "rows": np.int64(md.num_rows)})
        if not out:
            return pd.DataFrame({
                "file": pd.Series([], dtype=str),
                "column": pd.Series([], dtype=str),
                "vmin": pd.Series([], dtype=str),
                "vmax": pd.Series([], dtype=str),
                "dtype": pd.Series([], dtype=str),
                "nulls": pd.Series([], dtype=np.int64),
                "rows": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(out)

    zm = rd.from_items([{"path": p} for p in files]) \
        .map_batches(footer_rows, batch_format="pandas").to_pandas()
    tmp = out_path + f".{os.getpid()}.tmp"
    pq.write_table(pa.Table.from_pandas(zm, preserve_index=False), tmp)
    os.replace(tmp, out_path)
    return out_path


def _decode(v: str, dtype: str):
    import datetime  # noqa: F401  (eval namespace for datetime reprs)
    return eval(v, {"datetime": datetime})  # repr round-trip


def pruned_files(table_dir: str, zonemap_path: str, column: str,
                 lo, hi) -> tuple[list[str], int]:
    """Files that may hold rows with ``lo <= column <= hi``: zone-
    mapped files whose interval overlaps, PLUS every file unknown to
    the zone map. Returns (paths, n_pruned). Raises on a zone-mapped
    file that vanished (stale index)."""
    zm = pq.read_table(zonemap_path).to_pandas()
    zm = zm[zm["column"] == column]
    current = _list_files(table_dir)
    rel = {(os.path.relpath(p, table_dir)
            if os.path.isdir(table_dir) else os.path.basename(p)): p
           for p in current}
    missing = set(zm["file"]) - set(rel)
    if missing:
        raise FileNotFoundError(
            f"zone map references vanished files {sorted(missing)[:3]} "
            "— rebuild the index")
    keep, pruned = [], 0
    mapped = set(zm["file"])
    for _, r in zm.iterrows():
        vmin = _decode(r["vmin"], r["dtype"])
        vmax = _decode(r["vmax"], r["dtype"])
        if vmax >= lo and vmin <= hi:
            keep.append(rel[r["file"]])
        else:
            pruned += 1
    # unknown-to-the-index files are never pruned
    keep.extend(p for name, p in rel.items() if name not in mapped)
    return sorted(set(keep)), pruned


def pruned_scan(table_dir: str, zonemap_path: str, column: str,
                lo, hi, **read_kwargs) -> rd.Dataset:
    """Range scan that skips non-overlapping files via the zone map
    and pushes the same predicate into the surviving scans."""
    import pyarrow.dataset as pds

    paths, _ = pruned_files(table_dir, zonemap_path, column, lo, hi)
    f = (pds.field(column) >= lo) & (pds.field(column) <= hi)
    existing = read_kwargs.pop("filter", None)
    if existing is not None:
        f = f & existing
    return rd.read_parquet(paths, filter=f, **read_kwargs)


# ---------------------------------------------------------------------------
# Persisted per-file Bloom index — point-lookup pruning where min/max
# zone maps are useless (a high-cardinality key inside every file's
# range). One row per file holds that file's Bloom filter over the key
# column; a point lookup tests the tiny filters and scans only the
# files that MIGHT contain the key (no false negatives — candidates
# are a superset). Same safety rules as the zone map: unknown files
# are always candidates, vanished mapped files raise.
# ---------------------------------------------------------------------------

def build_bloom_index(table_dir: str, column: str, out_path: str,
                      log2m: int = 16, k: int = 7) -> str:
    """One column-pruned pass per file → (file, bloom bytes, n_keys)
    parquet at ``out_path`` (atomic publish). ~2^log2m bits per file:
    size the FP rate to the file count you want to avoid scanning."""
    from webalizer_ray.stages.sketch import BloomFilter

    files = _list_files(table_dir)

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p in df["path"]:
            t = pq.read_table(p, columns=[column])
            vals = t[column].drop_null()
            h = pd.util.hash_array(np.asarray(vals))
            bf = BloomFilter(log2m=log2m, k=k).add_hashes(h)
            rel = os.path.relpath(p, table_dir) \
                if os.path.isdir(table_dir) else os.path.basename(p)
            out.append({"file": rel, "bf": bf.to_bytes(),
                        "n_keys": np.int64(len(h)),
                        "log2m": np.int64(log2m), "k": np.int64(k)})
        return pd.DataFrame(out)

    idx = rd.from_items([{"path": p} for p in files]) \
        .map_batches(rows, batch_format="pandas").to_pandas()
    tmp = out_path + f".{os.getpid()}.tmp"
    pq.write_table(pa.Table.from_pandas(idx, preserve_index=False), tmp)
    os.replace(tmp, out_path)
    return out_path


def bloom_candidate_files(table_dir: str, index_path: str,
                          key) -> tuple[list[str], int]:
    """Files that MIGHT contain ``key`` (superset — no false
    negatives), plus every file unknown to the index. The key must be
    passed with the column's dtype (hashes must match the build)."""
    from webalizer_ray.stages.sketch import BloomFilter

    idx = pq.read_table(index_path).to_pandas()
    current = _list_files(table_dir)
    rel = {(os.path.relpath(p, table_dir)
            if os.path.isdir(table_dir) else os.path.basename(p)): p
           for p in current}
    missing = set(idx["file"]) - set(rel)
    if missing:
        raise FileNotFoundError(
            f"bloom index references vanished files "
            f"{sorted(missing)[:3]} — rebuild the index")
    h = pd.util.hash_array(np.asarray([key]))
    keep, pruned = [], 0
    for _, r in idx.iterrows():
        bf = BloomFilter.from_bytes(r["bf"], log2m=int(r["log2m"]),
                                    k=int(r["k"]))
        if bool(bf.contains_hashes(h)[0]):
            keep.append(rel[r["file"]])
        else:
            pruned += 1
    mapped = set(idx["file"])
    keep.extend(p for name, p in rel.items() if name not in mapped)
    return sorted(set(keep)), pruned


def bloom_point_scan(table_dir: str, index_path: str, column: str,
                     key, **read_kwargs) -> rd.Dataset:
    """Point lookup that scans only the Bloom candidates, with the
    equality predicate pushed into the surviving scans (bloom false
    positives therefore cannot leak wrong rows — only wasted reads)."""
    import pyarrow.dataset as pds

    paths, _ = bloom_candidate_files(table_dir, index_path, key)
    f = pds.field(column) == key
    existing = read_kwargs.pop("filter", None)
    if existing is not None:
        f = f & existing
    return rd.read_parquet(paths, filter=f, **read_kwargs)
