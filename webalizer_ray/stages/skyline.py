"""2-D skyline (Pareto frontier) — maximize both dimensions.

The skyline operator is mergeable: skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)), so each block reduces to its local
frontier (a tiny summary — at most one row per distinct x that is
locally undominated) and the driver finishes on the union of locals.
Nothing but frontier partials ever shuffles, which is what makes the
classic BNL/SFS skyline (Börzsönyi et al., ICDE 2001 "The Skyline
Operator") cluster-friendly: the reduction is the same
partial-combine shape as every aggregate in stages/aggregate.py.

Dominance is the standard strict one: b dominates a iff b >= a on
both dimensions and b > a on at least one. Ties on BOTH dimensions
are mutually non-dominating — all such rows are kept.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def local_skyline(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact skyline of one frame, vectorized (sort + cummax scan)."""
    if df.empty:
        return df
    # per-x best y: rows below their own x-group max are dominated
    # (equal x, strictly smaller y)
    gmax = df.groupby(x)[y].max()
    xs = np.sort(gmax.index.to_numpy())[::-1]          # x descending
    ys = gmax.loc[xs].to_numpy()
    # exclusive running max of y over strictly-greater x
    best_gt = np.empty_like(ys)
    best_gt[0] = np.iinfo(ys.dtype).min if ys.dtype.kind in "iu" else -np.inf
    if len(ys) > 1:
        np.maximum.accumulate(ys[:-1], out=best_gt[1:])
    keep_x = set(xs[ys > best_gt].tolist())
    m = df[x].isin(keep_x) & (df[y].to_numpy() ==
                              gmax.loc[df[x]].to_numpy())
    return df[m]


def skyline_2d(ds: rd.Dataset, x: str, y: str) -> pd.DataFrame:
    """Distributed skyline: per-block local frontier → driver final."""
    partials = ds.map_batches(lambda df: local_skyline(df, x, y),
                              batch_format="pandas").to_pandas()
    return local_skyline(partials, x, y).reset_index(drop=True)
