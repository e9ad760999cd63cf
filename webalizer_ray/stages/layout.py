"""Z-order (Morton-curve) data layout for multi-column scan pruning.

The lakehouse clustering technique (Delta/Iceberg ``OPTIMIZE ZORDER BY``,
public construction: Morton 1966; Bayer's UB-tree): interleave the bits
of several quantized sort keys so rows close in the multi-dimensional
key space land in the same row groups. A range predicate on ANY of the
z-ordered columns then prunes row groups by their min/max stats, where
a single-column sort only helps its leading column.

Scale shape: computing z is a per-batch vectorized transform (a loop
over BITS, never over rows); the one-time re-layout sort is the same
all-to-all any clustering rewrite pays (same family as `run.py compact`
and `join.write_bucketed`). Pruning statistics come straight from
parquet row-group metadata — nothing is read but footers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd


def interleave_bits2(x: np.ndarray, y: np.ndarray,
                     bits: int = 16) -> np.ndarray:
    """Morton-interleave two non-negative int arrays: bit i of x lands
    at 2i, bit i of y at 2i+1. Vectorized over rows (the loop is over
    BIT POSITIONS, max 16)."""
    x = x.astype(np.uint64)
    y = y.astype(np.uint64)
    z = np.zeros(len(x), np.uint64)
    for i in range(bits):
        z |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z.astype(np.int64)


def quantize_minmax(a: np.ndarray, lo: float, hi: float,
                    bits: int = 16) -> np.ndarray:
    """Linear min/max quantization to [0, 2^bits) (clamped)."""
    span = max(hi - lo, 1e-300)
    q = np.floor((a.astype(np.float64) - lo) / span * (2 ** bits))
    return np.clip(q, 0, 2 ** bits - 1).astype(np.int64)


def zorder_dataset(ds: rd.Dataset, xcol: str, ycol: str,
                   x_range: tuple[float, float],
                   y_range: tuple[float, float],
                   bits: int = 12) -> rd.Dataset:
    """Sort ``ds`` along the Morton curve of (xcol, ycol). The ranges
    are the global min/max of each column (one cheap aggregate pass at
    the call site); the z column is dropped from the caller's view —
    it exists only to drive the sort."""
    def add_z(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        qx = quantize_minmax(df[xcol].to_numpy(), *x_range, bits=bits)
        qy = quantize_minmax(df[ycol].to_numpy(), *y_range, bits=bits)
        df["_z"] = interleave_bits2(qx, qy, bits=bits)
        return df

    return ds.map_batches(add_z, batch_format="pandas").sort("_z") \
        .drop_columns(["_z"])


def row_group_prune_stats(path: str, col_ranges: dict) -> dict:
    """How many row groups a conjunctive range predicate could skip,
    from parquet footer stats only. ``col_ranges`` maps column ->
    (lo, hi) inclusive query bounds."""
    f = pq.ParquetFile(path)
    names = {c.name: i for i, c in enumerate(f.schema_arrow)}
    total = f.metadata.num_row_groups
    hit = 0
    for rg in range(total):
        meta = f.metadata.row_group(rg)
        overlaps = True
        for col, (lo, hi) in col_ranges.items():
            st = meta.column(names[col]).statistics
            if st is None:
                continue
            if st.max < lo or st.min > hi:
                overlaps = False
                break
        hit += overlaps
    return {"row_groups": total, "scanned": hit, "pruned": total - hit}
