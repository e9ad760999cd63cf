"""Persisted IVF vector index + cell-pruned ANN queries.

``stages/ann.py:ivf_topk`` re-trains centroids and re-scans the corpus
on every call; real vector stores pay the clustering ONCE. ``build``
writes each vector into its nearest-centroid cell as a hive-partitioned
parquet store (the one-time bucketed write IS the shuffle — the same
pattern as the term-sharded inverted index in ``stages/invindex.py``);
a query loads only the tiny centroid matrix, picks its ``nprobe``
closest cells, and scans JUST those cell directories — query cost is
proportional to the vectors in the probed cells, not corpus size.

Layout::

    index_dir/cell=K/*.parquet      (vec_id, embedding)
    index_dir/_centroids.npy        k x d float64 centroid matrix
    index_dir/_meta.json            {n_clusters, dim, version}

The store is published atomically: build stages into a sibling temp
directory and renames it over the target (last build wins; a reader
never observes a half-written index). Underscore-prefixed files are
ignored by parquet dataset discovery, so the metadata can live inside
the store.

Candidate semantics: one Ray scan reads the UNION of all queries'
probed cells and scores every candidate for every query — a superset
of strict per-query IVF (recall can only improve) for one scan instead
of q scans. ``nprobe = n_clusters`` degenerates to the exact
brute-force answer (every cell is read), which is the oracle-backed
configuration; smaller ``nprobe`` trades recall for a proportional
scan-cost cut. Pruning is real, not advisory: the test suite deletes
every unprobed ``cell=`` directory and the query result is unchanged.

Scale shape at 100 TB: build = one k-means fit (per-iteration shuffle
is k partial-sum rows per block) + one assignment pass + the hive
write; query = O(k·d) driver math to pick cells + a scan of nprobe/k
of the store. The centroid matrix (k×d floats) is the only broadcast.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from webalizer_ray.stages import ann
from webalizer_ray.stages.vecops import ids_from_column, mat_from_column

VERSION = 1


def build(ds: rd.Dataset, index_dir: str, n_clusters: int = 8,
          n_iter: int = 5, sample_rows: int = 1024, seed: int = 7,
          id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """Cluster ``ds`` and persist the cell-partitioned store.

    Stages into ``index_dir + '.staging-<pid>'`` and atomically renames
    over ``index_dir`` (rebuilds replace, never append — a second build
    into an existing store cannot double its rows).
    """
    cents = ann.kmeans_fit(ds, n_clusters=n_clusters, n_iter=n_iter,
                           sample_rows=sample_rows, seed=seed,
                           id_col=id_col, vec_col=vec_col)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = ann._normalize(mat_from_column(batch[vec_col]))
        # round before argmax so the cell choice cannot flip between
        # engines / BLAS builds on a hairline tie
        sims = np.round(m @ c.T, 9)
        return pa.table({
            id_col: batch[id_col], vec_col: batch[vec_col],
            "cell": pa.array(np.argmax(sims, axis=1).astype(np.int32))})

    staging = f"{index_dir}.staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(staging, partition_cols=["cell"])

    with open(os.path.join(staging, "_centroids.npy"), "wb") as f:
        np.save(f, cents)
    with open(os.path.join(staging, "_meta.json"), "w") as f:
        json.dump({"n_clusters": int(n_clusters),
                   "dim": int(cents.shape[1]), "version": VERSION}, f)

    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(staging, index_dir)
    return index_dir


def probed_cells(index_dir: str, queries: np.ndarray,
                 nprobe: int | None = None) -> list[int]:
    """The union of the queries' ``nprobe`` closest cells (sorted).

    Deterministic: centroid similarities are rounded to 9 dp and ties
    broken by cell index ascending (stable argsort).
    """
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    cents = np.load(os.path.join(index_dir, "_centroids.npy"))
    qn = ann._normalize(np.asarray(queries, dtype=np.float64))
    sims = np.round(qn @ cents.T, 9)
    nprobe = meta["n_clusters"] if nprobe is None else \
        min(nprobe, meta["n_clusters"])
    order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    return sorted(set(order.ravel().tolist()))


def query(index_dir: str, queries: np.ndarray, k: int = 5,
          nprobe: int | None = None, id_col: str = "vec_id",
          vec_col: str = "embedding") -> pd.DataFrame:
    """Cell-pruned cosine top-k: (query_id, vec_id, cosine, rank).

    Reads ONLY the probed ``cell=`` directories; with
    ``nprobe=None`` (all cells) the answer is exactly the brute-force
    scan's. Empty cells (k-means cells that attracted no vectors) have
    no directory and are skipped.
    """
    cells = probed_cells(index_dir, queries, nprobe)
    paths = []
    for c in cells:
        d = os.path.join(index_dir, f"cell={c}")
        if os.path.isdir(d):  # empty k-means cells have no directory
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    return ann.brute_force_topk(ds, queries, k=k, id_col=id_col,
                                vec_col=vec_col)
