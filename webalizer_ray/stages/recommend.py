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


@ray.remote(num_cpus=0)
class _ALSShard:
    """One user-hash bucket of the ALS engine: resident rating slice
    (sealed once), per-iteration local user solve + item-partial
    scatter to the hash(item)-owner shards — the same resident-state
    actor pattern as graph._GraphShard, for the same reason: the r4
    Dataset form re-shuffled the SAME materialized ratings every
    iteration and paid 2 shuffle jobs (~0.3-0.5 s fixed each) per
    sweep. num_cpus=0: work comes in short numpy bursts between
    barriers; whole-CPU reservations for B shards would deadlock
    sessions with fewer cores than shards."""

    def __init__(self, bucket: int, num_buckets: int, k: int,
                 reg: float):
        self.b, self.B, self.k, self.reg = bucket, num_buckets, k, reg
        self._parts: list | None = []
        self.user = self.item = self.rating = None
        self.peers = None
        self.uu = None          # solved user ids (sorted)
        self.x = None           # their factors
        self.inbox: list = []

    def set_peers(self, peers) -> None:
        self.peers = peers

    def add(self, user, item, rating) -> None:
        self._parts.append((user, item, rating))

    def seal(self) -> int:
        """Concatenate the scattered slices and pre-sum duplicate
        (user, item) pairs — EXACT relative to a global reduce because
        a user's rows all land in this shard (user-hash scatter), and
        deterministic regardless of arrival order (sorted before the
        segment sum). Callers can therefore feed raw per-event rating
        rows and skip a whole pre-aggregation shuffle."""
        if self._parts:
            u = np.concatenate([p[0] for p in self._parts])
            i = np.concatenate([p[1] for p in self._parts])
            r = np.concatenate([p[2] for p in self._parts])
            o = np.lexsort((i, u))
            u, i, r = u[o], i[o], r[o]
            first = np.ones(len(u), bool)
            first[1:] = (u[1:] != u[:-1]) | (i[1:] != i[:-1])
            starts = np.flatnonzero(first)
            self.user = u[starts]
            self.item = i[starts]
            self.rating = np.add.reduceat(r, starts) if len(starts) \
                else np.empty(0, np.float64)
        else:
            self.user = np.empty(0, np.int64)
            self.item = np.empty(0, np.int64)
            self.rating = np.empty(0, np.float64)
        self._parts = None
        return len(self.user)

    def step(self, vmat, vitems) -> list:
        """User half-step against the broadcast item factors, then the
        item half-step partials scattered to their owner shards.
        Returns the delivery refs (the driver awaits them as the
        barrier — blocking here would deadlock the peer actors)."""
        k = self.k
        if not len(self.user):
            return []
        vi = vmat[pd.Index(vitems).get_indexer(self.item)]
        uu, A, b, n = _segment_normal_eq(self.user, vi, self.rating, k)
        A += (self.reg * n)[:, None, None] * np.eye(k)[None]
        self.uu, self.x = uu, np.linalg.solve(A, b)
        uf = self.x[pd.Index(uu).get_indexer(self.user)]
        ii, Ai, bi, ni = _segment_normal_eq(self.item, uf,
                                            self.rating, k)
        hb = ((ii.astype(np.uint64) * _KNUTH) >> np.uint64(7)) \
            % np.uint64(self.B)
        o = np.argsort(hb, kind="stable")
        ii, Ai, bi, ni, hb = ii[o], Ai[o], bi[o], ni[o], hb[o]
        bounds = np.searchsorted(hb, np.arange(self.B + 1))
        return [self.peers[j].deliver.remote(
                    self.b, ii[bounds[j]:bounds[j + 1]],
                    Ai[bounds[j]:bounds[j + 1]],
                    bi[bounds[j]:bounds[j + 1]],
                    ni[bounds[j]:bounds[j + 1]])
                for j in range(self.B)
                if bounds[j] < bounds[j + 1]]

    def deliver(self, sender, ii, Ai, bi, ni) -> None:
        self.inbox.append((sender, ii, Ai, bi, ni))

    def solve_items(self) -> tuple:
        """Sum this shard's item partials (sorted by (item, sender) —
        DETERMINISTIC association regardless of delivery order), solve
        the k×k systems, return (item_ids, factors) — k floats per
        item, the only thing that travels to the driver."""
        k = self.k
        if not self.inbox:
            return (np.empty(0, np.int64), np.empty((0, k)))
        self.inbox.sort(key=lambda t: t[0])
        ii = np.concatenate([t[1] for t in self.inbox])
        Ai = np.concatenate([t[2] for t in self.inbox])
        bi = np.concatenate([t[3] for t in self.inbox])
        ni = np.concatenate([t[4] for t in self.inbox])
        self.inbox = []
        o = np.argsort(ii, kind="stable")
        ii, Ai, bi, ni = ii[o], Ai[o], bi[o], ni[o]
        uniq, starts = np.unique(ii, return_index=True)
        A = np.add.reduceat(Ai, starts)
        b = np.add.reduceat(bi, starts)
        n = np.add.reduceat(ni, starts)
        A += (self.reg * n)[:, None, None] * np.eye(k)[None]
        return uniq, np.linalg.solve(A, b)

    def user_table(self, fcols) -> "pa.Table":
        import pyarrow as pa
        if self.uu is None:
            return pa.table({"user": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.float64())
                                for c in fcols}})
        return pa.table({"user": self.uu,
                         **{fcols[d]: self.x[:, d]
                            for d in range(len(fcols))}})


def als_fit(ratings: rd.Dataset, k: int = 8, iters: int = 3,
            reg: float = 0.1, num_buckets: int | None = None):
    """Fit ALS over a (user, item, rating) Dataset.

    Returns (user_factors Dataset[user, f0..f{k-1}],
             item_factors pd.DataFrame[item, f0..f{k-1}]).
    Items must be the bounded dimension (broadcast per iteration).

    r5: rides a resident shard-actor engine (_ALSShard) — ratings
    scatter ONCE into user-hash bucket actors (a single streaming
    pass, no Dataset shuffle); per sweep each shard solves its users
    locally against the broadcast item factors and scatters its item
    normal-equation partials ((k²+k+1) floats per (shard, item), never
    a rating row) directly to the hash(item)-owner shards, whose
    deterministic-order merge solves the item systems; only |items|×k
    solved factors reach the driver for the re-broadcast. The r4
    Dataset form re-shuffled the materialized ratings every sweep
    (measured 8.2 s for 3 sweeps over 600k ratings at 32 cpus; the
    engine does the same math in ~2 s)."""
    num_buckets = default_partitions(num_buckets, per_cpu=1)
    fcols = [f"f{d}" for d in range(k)]
    B = num_buckets
    shards = [_ALSShard.remote(b, B, k, reg) for b in range(B)]
    try:
        return _als_fit_run(ratings, k, iters, reg, B, fcols, shards)
    finally:
        # cyclic peer handles — explicit teardown, ALSO on failure,
        # or every failed call leaks B actors
        for s in shards:
            ray.kill(s)


def _als_fit_run(ratings: rd.Dataset, k: int, iters: int, reg: float,
                 B: int, fcols: list, shards: list):
    ray.get([s.set_peers.remote(shards) for s in shards])

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user"].to_numpy(np.int64)
        i = df["item"].to_numpy(np.int64)
        r = df["rating"].to_numpy(np.float64)
        hb = ((u.astype(np.uint64) * _KNUTH) >> np.uint64(7)) \
            % np.uint64(B)
        o = np.argsort(hb, kind="stable")
        u, i, r, hb = u[o], i[o], r[o], hb[o]
        bounds = np.searchsorted(hb, np.arange(B + 1))
        ray.get([shards[j].add.remote(u[bounds[j]:bounds[j + 1]],
                                      i[bounds[j]:bounds[j + 1]],
                                      r[bounds[j]:bounds[j + 1]])
                 for j in range(B) if bounds[j] < bounds[j + 1]])
        # the same pass emits this batch's distinct items, so the
        # deterministic-init item universe costs no second execution
        # of the (often lazy) upstream ratings plan
        return pd.DataFrame({"item": pd.unique(i)})

    from webalizer_ray.stages.aggregate import reduce_sink
    items = np.sort(reduce_sink(
        ratings.map_batches(scatter, batch_format="pandas"),
        ["item"], {"_n": ("item", "size")})
        .to_pandas()["item"].to_numpy(np.int64))
    ray.get([s.seal.remote() for s in shards])
    vitems = items
    vmat = _hash_init(items, k)

    for _ in range(iters):
        # refs passed as args resolve node-locally from plasma (one
        # shared copy per node, zero-copy numpy views)
        vm_ref, vi_ref = ray.put(vmat), ray.put(vitems)
        ack_lists = ray.get([s.step.remote(vm_ref, vi_ref)
                             for s in shards])
        ray.get([a for lst in ack_lists for a in lst])
        solved = ray.get([s.solve_items.remote() for s in shards])
        ids = np.concatenate([t[0] for t in solved])
        fac = np.concatenate([t[1] for t in solved])
        o = np.argsort(ids, kind="stable")
        vitems, vmat = ids[o], fac[o]

    import pyarrow as pa  # noqa: F401  (shard tables are Arrow)
    refs = [s.user_table.remote(fcols) for s in shards]
    ray.wait(refs, num_returns=len(refs))
    # materialize before the caller's finally kills the shards: the
    # user tables then live in the object store owned by the driver
    uf = rd.from_arrow_refs(refs).materialize()
    return uf, pd.DataFrame(
        {"item": vitems,
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
