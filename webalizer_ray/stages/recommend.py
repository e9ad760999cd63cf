"""Alternating least squares (ALS) collaborative filtering on Ray Data.

The Zhou et al. 2008 ("Large-scale Parallel Collaborative Filtering
for the Netflix Prize") distributed layout, Ray-Data-first:

* the ITEM factor matrix is the broadcast side (`ray.put` per
  iteration — items are the bounded dimension: parts/products/tools;
  the user dimension, which is unbounded, is never collected);
* per iteration, ratings shuffle ONCE into user-hash buckets; inside
  each bucket the user half-step solves every user's normal equations
  (VᵀV over the rated items + λnI) as ONE stacked
  ``np.linalg.solve`` over (users, k, k) — no Python loop — and the
  SAME task immediately emits the item half-step's normal-equation
  PARTIALS (k×k A and k-vector b per (bucket, item)) using the
  user factors it just produced, so the item step needs no second
  shuffle and no join;
* a key-level reduce sums the item partials ((k²+k+1) floats per
  (bucket, item) — never a rating row) and the driver solves the
  bounded |items|×k system and re-broadcasts.

Floating-point note: partial sums combine in nondeterministic order,
so factors are reproducible only to ~1e-9 — callers that need
engine-stable output must round before ranking (the recommend query
rounds to 6 dp with an id tiebreak). Iteration count is FIXED (no
data-dependent convergence test) so reruns do identical work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from webalizer_ray.config import default_partitions

from webalizer_ray.stages.aggregate import (join_partitions, key_bucket,
                                             reduce_sink)

_KNUTH = np.uint64(2654435761)


def _hash_init(ids: np.ndarray, k: int) -> np.ndarray:
    """Deterministic pseudo-random init in [-0.5, 0.5] / sqrt(k):
    mixed per (id, dim) so shapes are reproducible across runs,
    cluster sizes and engines."""
    i = ids.astype(np.uint64)[:, None] * _KNUTH
    j = (np.arange(k, dtype=np.uint64)[None, :] + np.uint64(1)) \
        * np.uint64(0x9E3779B97F4A7C15)
    m = (i ^ j) * _KNUTH
    m ^= m >> np.uint64(31)
    u = (m % np.uint64(1_000_003)).astype(np.float64) / 1_000_003.0
    return (u - 0.5) / np.sqrt(k)


def _segment_normal_eq(key: np.ndarray, feats: np.ndarray,
                       r: np.ndarray, k: int):
    """Per-key Σ f fᵀ (A), Σ r·f (b) and counts via one sort +
    np.add.at segment reduce. Returns (uniq_keys, A, b, n)."""
    order = np.argsort(key, kind="mergesort")
    key, feats, r = key[order], feats[order], r[order]
    uniq, starts = np.unique(key, return_index=True)
    seg = np.zeros(len(key), dtype=np.int64)
    seg[starts[1:]] = 1
    seg = seg.cumsum()
    A = np.zeros((len(uniq), k, k))
    b = np.zeros((len(uniq), k))
    np.add.at(A, seg, feats[:, :, None] * feats[:, None, :])
    np.add.at(b, seg, feats * r[:, None])
    n = np.diff(np.append(starts, len(key)))
    return uniq, A, b, n


def als_fit(ratings: rd.Dataset, k: int = 8, iters: int = 3,
            reg: float = 0.1, num_buckets: int | None = None):
    """Fit ALS over a (user, item, rating) Dataset.

    Returns (user_factors Dataset[user, f0..f{k-1}],
             item_factors pd.DataFrame[item, f0..f{k-1}]).
    Items must be the bounded dimension (broadcast per iteration)."""
    num_buckets = default_partitions(num_buckets)
    fcols = [f"f{d}" for d in range(k)]
    acols = [f"a{i}_{j}" for i in range(k) for j in range(k)]
    bcols = [f"b{i}" for i in range(k)]

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user": df["user"].to_numpy(np.int64),
            "item": df["item"].to_numpy(np.int64),
            "rating": df["rating"].to_numpy(np.float64)})
        out["_h"] = key_bucket(out, ["user"], num_buckets)
        return out

    by_user = ratings.map_batches(bucketed,
                                  batch_format="pandas").materialize()
    # distinct items via the two-phase combiner, NOT Dataset.groupby:
    # the naive sort-groupby spreads 600k rows over ~200 near-empty
    # partitions and cost 33 s of the query's 40 s at sf0.1 (r3 bench
    # audit); reduce_sink pre-combines per batch and does the same
    # reduce in ~1 s. Items are the bounded broadcast dimension.
    from webalizer_ray.stages.aggregate import reduce_sink
    items = np.sort(
        reduce_sink(by_user, ["item"], {"_n": ("item", "size")})
        .to_pandas()["item"].to_numpy(np.int64))
    vidx = pd.Index(items)
    vmat = _hash_init(items, k)

    user_factors = None
    for _ in range(iters):
        vref = ray.put((vmat, vidx))

        def step(g: pd.DataFrame, _v=vref) -> pd.DataFrame:
            vmat_b, vidx_b = ray.get(_v)
            item = g["item"].to_numpy(np.int64)
            user = g["user"].to_numpy(np.int64)
            r = g["rating"].to_numpy(np.float64)
            vi = vmat_b[vidx_b.get_indexer(item)]          # (n, k)
            # user half-step: stacked solve over this bucket's users
            uu, A, b, n = _segment_normal_eq(user, vi, r, k)
            A += (reg * n)[:, None, None] * np.eye(k)[None]
            x = np.linalg.solve(A, b)                      # (users, k)
            urows = pd.DataFrame({"kind": np.int64(0), "id": uu,
                                  "n": n.astype(np.float64)})
            for d in range(k):
                urows[fcols[d]] = x[:, d]
            for c in acols + bcols:
                urows[c] = 0.0
            # item half-step partials with the factors just solved
            pos = pd.Index(uu).get_indexer(user)
            uf = x[pos]                                     # (n, k)
            ii, Ai, bi, ni = _segment_normal_eq(item, uf, r, k)
            irows = pd.DataFrame({"kind": np.int64(1), "id": ii,
                                  "n": ni.astype(np.float64)})
            for d in range(k):
                irows[fcols[d]] = 0.0
            for i in range(k):
                irows[bcols[i]] = bi[:, i]
                for j in range(k):
                    irows[f"a{i}_{j}"] = Ai[:, i, j]
            return pd.concat([urows, irows], ignore_index=True)

        both = by_user.groupby("_h") \
            .map_groups(step, batch_format="pandas").materialize()
        def to_uf(df: pd.DataFrame) -> pd.DataFrame:
            # rename via map_batches: Dataset.rename_columns breaks on
            # pandas blocks (Ray 2.49)
            out = df[["id"] + fcols].copy()
            out.columns = ["user"] + fcols
            return out

        user_factors = both.filter(expr="kind == 0") \
            .map_batches(to_uf, batch_format="pandas")
        spec = {"n": ("n", "sum")}
        for c in acols + bcols:
            spec[c] = (c, "sum")
        agg = reduce_sink(both.filter(expr="kind == 1"), ["id"],
                          spec).to_pandas() \
            .sort_values("id", ignore_index=True)
        A = np.stack([np.stack([agg[f"a{i}_{j}"].to_numpy()
                                for j in range(k)], axis=1)
                      for i in range(k)], axis=1)
        b = np.stack([agg[c].to_numpy() for c in bcols], axis=1)
        A += (reg * agg["n"].to_numpy())[:, None, None] * np.eye(k)[None]
        vmat = np.linalg.solve(A, b)
        vidx = pd.Index(agg["id"].to_numpy(np.int64))

    return user_factors.materialize(), pd.DataFrame(
        {"item": vidx.to_numpy(),
         **{fcols[d]: vmat[:, d] for d in range(k)}})


def als_rmse(ratings: rd.Dataset, user_factors: rd.Dataset,
             item_factors: pd.DataFrame, k: int = 8,
             num_buckets: int | None = None) -> float:
    """Distributed RMSE of the factor model: item factors broadcast,
    ratings ⋈ user factors, (Σerr², n) scalar partials only."""
    num_buckets = default_partitions(num_buckets)
    fcols = [f"f{d}" for d in range(k)]
    vref = ray.put((item_factors[fcols].to_numpy(np.float64),
                    pd.Index(item_factors["item"].to_numpy(np.int64))))

    def err(g: pd.DataFrame) -> pd.DataFrame:
        vmat, vidx = ray.get(vref)
        u = g[fcols].to_numpy(np.float64)
        vi = vmat[vidx.get_indexer(g["item"].to_numpy(np.int64))]
        e = g["rating"].to_numpy(np.float64) - (u * vi).sum(axis=1)
        return pd.DataFrame({"se": [float((e * e).sum())],
                             "n": [len(g)]})

    j = ratings.join(user_factors, join_type="inner",
                     num_partitions=join_partitions(
                         min(8, num_buckets)),
                     on=("user",), right_on=("user",))
    p = j.map_batches(err, batch_format="pandas").materialize()
    return float(np.sqrt(p.sum("se") / p.sum("n")))
