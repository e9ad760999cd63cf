"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast once (``ray.put``), every batch does one numpy matmul against
it and emits its LOCAL top-k per query (a per-batch combiner — k rows per
query per batch cross the shuffle, never the full similarity matrix), and
a final tiny merge keeps the global top-k. The scale path is the
LSH-bucketed variant: random-hyperplane signs bucket both vectors and
queries; only matching buckets multiply (probe several buckets for
recall). Both are deterministic given the seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from webalizer_ray.stages.vecops import ids_from_column, mat_from_column


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank) per query.

    Ties broken deterministically by (cosine desc, vec_id asc) on
    similarities rounded to 9 dp (so float noise cannot flip ranks
    between engines).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        # pyarrow batch: the embedding matrix comes straight off the
        # list array's values buffer — no object-array round-trip
        q = ray.get(q_ref)
        mat = _normalize(mat_from_column(batch[vec_col]))
        sims = np.round(q @ mat.T, 9)                    # (nq, nb)
        ids = ids_from_column(batch[id_col])
        nq, nb = sims.shape
        kk = min(k, nb)
        # local top-k per query (argpartition then exact ordering)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        return pd.DataFrame({
            "query_id": rows.astype(np.int64),
            id_col: ids[cols],
            "cosine": sims[rows, cols],
        })

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out


def lsh_bucket_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 5,
                    n_planes: int = 8, n_probe: int = 4, seed: int = 7,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets.

    bucket(v) = sign bits of v·P (P drawn once from seed). Queries probe
    their own bucket plus the ``n_probe-1`` nearest buckets (smallest
    |margin| bit flips), so each data batch multiplies only against the
    queries probing its buckets. Recall < 1 by construction; the exact
    variant above is the parity baseline.
    """
    rng = np.random.default_rng(seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    planes = rng.standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes) > 0).astype(np.int64) @ weights

    # query probes: own bucket + buckets with the lowest-|margin| bit flipped
    proj = qn @ planes
    base = (proj > 0).astype(np.int64) @ weights
    order = np.argsort(np.abs(proj), axis=1)
    probes = {int(b) for b in base}
    for p in range(min(n_probe - 1, n_planes)):
        flipped = base ^ weights[order[:, p]]
        probes |= {int(b) for b in flipped}
    probe_sets = {}
    for qi in range(len(qn)):
        mine = {int(base[qi])}
        for p in range(min(n_probe - 1, n_planes)):
            mine.add(int(base[qi] ^ weights[order[qi, p]]))
        probe_sets[qi] = mine
    q_ref = ray.put((qn, probe_sets))

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        q, psets = ray.get(q_ref)
        mat = _normalize(mat_from_column(batch[vec_col]))
        buckets = bucket_of(mat)
        ids = ids_from_column(batch[id_col])
        frames = []
        for qi, mine in psets.items():
            mask = np.isin(buckets, list(mine))
            if not mask.any():
                continue
            sims = np.round(mat[mask] @ q[qi], 9)
            sel = ids[mask]
            kk = min(k, len(sel))
            top = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(pd.DataFrame({
                "query_id": np.full(kk, qi, dtype=np.int64),
                id_col: sel[top], "cosine": sims[top]}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64),
                                 id_col: pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out


def ivf_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, n_iter: int = 10,
             sample_rows: int = 4096, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer (k-means cells).

    Train: Lloyd iterations on a driver-side sample (deterministic —
    first ``sample_rows`` rows, seeded init). Search: centroids are
    broadcast; every batch assigns its vectors to their nearest cell and
    multiplies only against the queries probing that cell (each query
    probes its ``n_probe`` nearest cells). Same shape as a FAISS
    IVF-Flat scan, expressed as a per-batch combiner + tiny top-k merge.
    Recall < 1 by construction; brute_force_topk is the parity baseline.
    """
    rng = np.random.default_rng(seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))

    sample = ds.limit(sample_rows).to_pandas()
    train = _normalize(np.stack(sample[vec_col].to_numpy())
                       .astype(np.float64))
    n_centroids = min(n_centroids, len(train))
    cents = train[rng.choice(len(train), n_centroids, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(train @ cents.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cents[c] = train[m].mean(axis=0)
        cents = _normalize(cents)

    # per-query probe lists: the n_probe nearest cells
    qsims = qn @ cents.T
    probe = np.argsort(-qsims, axis=1)[:, :min(n_probe, n_centroids)]
    probe_sets = {qi: set(map(int, probe[qi])) for qi in range(len(qn))}
    q_ref = ray.put((qn, cents, probe_sets))

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        q, C, psets = ray.get(q_ref)
        mat = _normalize(mat_from_column(batch[vec_col]))
        cell = np.argmax(mat @ C.T, axis=1)
        ids = ids_from_column(batch[id_col])
        frames = []
        for qi, mine in psets.items():
            mask = np.isin(cell, list(mine))
            if not mask.any():
                continue
            sims = np.round(mat[mask] @ q[qi], 9)
            sel = ids[mask]
            kk = min(k, len(sel))
            top = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(pd.DataFrame({
                "query_id": np.full(kk, qi, dtype=np.int64),
                id_col: sel[top], "cosine": sims[top]}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series(dtype=np.int64),
                                 id_col: pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out


def kmeans_fit(ds: rd.Dataset, n_clusters: int = 8,
               n_iter: int = 5, sample_rows: int = 1024,
               seed: int = 7, id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Fit step of :func:`kmeans_fit_assign` (same distributed Lloyd
    loop), returning the final normalized centroid matrix so callers
    can broadcast it into their own assignment stage (e.g. semantic
    dedup keeps the assignment distributed instead of gathering it)."""
    return _kmeans_loop(ds, n_clusters, n_iter, sample_rows, seed,
                        vec_col)


def kmeans_fit_assign(ds: rd.Dataset, n_clusters: int = 8,
                      n_iter: int = 5, sample_rows: int = 1024,
                      seed: int = 7, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      as_dataset: bool = False,
                      out_dir: str | None = None
                      ) -> pd.DataFrame | rd.Dataset:
    """Distributed spherical k-means (the SemDeDup-style semantic
    bucketing step): seeded init from a driver-side sample, then
    ``n_iter`` DISTRIBUTED Lloyd iterations — each iteration broadcasts
    the centroids once (``ray.put``) and every batch emits only
    ``n_clusters`` partial rows (per-cluster vector sum + count), so the
    update shuffles O(k·dim·num_batches) floats regardless of dataset
    size; the driver reduces partials and renormalizes. Final pass
    assigns every vector. Deterministic given the seed (partial sums
    are order-independent up to float association; see the
    repartition-invariance test).

    Empty clusters keep their previous centroid (standard Lloyd
    convention). Returns (id, cluster) sorted by id.
    """
    cents = _kmeans_loop(ds, n_clusters, n_iter, sample_rows, seed,
                         vec_col)
    cents_ref = ray.put(cents)

    def assign_batch(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cents_ref)
        m = np.round(_normalize(mat_from_column(batch[vec_col])), 9)
        # rounded dots: assignment ties break to the LOWEST cluster on
        # both engines (np.argmax first-max ≡ SQL ROW_NUMBER dot DESC,
        # cluster ASC)
        return pd.DataFrame({
            id_col: ids_from_column(batch[id_col]),
            "cluster": np.argmax(np.round(m @ c.T, 9),
                                 axis=1).astype(np.int64)})

    assigned = ds.map_batches(assign_batch, batch_format="pyarrow")
    if out_dir is not None:
        assigned = assigned.materialize()
        assigned.write_parquet(out_dir)
    if as_dataset:
        # corpus-scale contract: (id, cluster) stays distributed
        return assigned
    return assigned.to_pandas().sort_values(id_col, ignore_index=True)


def _kmeans_loop(ds: rd.Dataset, n_clusters: int, n_iter: int,
                 sample_rows: int, seed: int,
                 vec_col: str) -> np.ndarray:
    """Distributed Lloyd loop with ENGINE-INDEPENDENT determinism (r3):

    - seeding is STRIDED over the (deterministically ordered) sample —
      row floor(i·N/k) for i < k — which stratifies ordered input
      (planted-blob fixtures pick one seed per blob) and, unlike the
      previous rng.choice, is replicable in SQL so kmeans-derived
      queries can carry a DuckDB oracle. ``seed`` is kept for API
      compatibility but no longer consumed.
    - normalized vectors, assignment dot products, and updated
      centroids are all rounded to 9 dp, so the argmax decisions (ties
      → lowest cluster, np.argmax convention) cannot flip on the
      ~1e-16 float-association noise between this engine's partial
      sums and an oracle's single-pass SUMs.
    """
    if seed != 7:
        import warnings
        warnings.warn(
            "seed is no longer consumed: k-means seeding is the "
            "deterministic strided rule and the clustering is identical "
            "for every seed (ADVICE r3 — silent ignore removed)",
            DeprecationWarning, stacklevel=3)
    del seed  # deterministic strided seeding (see docstring)
    sample = ds.limit(sample_rows).to_pandas()
    train = np.round(_normalize(np.stack(sample[vec_col].to_numpy())
                                .astype(np.float64)), 9)
    k = min(n_clusters, len(train))
    idx = (np.arange(k, dtype=np.int64) * len(train)) // k
    cents = train[idx]

    for _ in range(n_iter):
        cents_ref = ray.put(cents)

        def partial_sums(batch: pa.Table) -> pd.DataFrame:
            c = ray.get(cents_ref)
            m = np.round(_normalize(mat_from_column(batch[vec_col])), 9)
            assign = np.argmax(np.round(m @ c.T, 9), axis=1)
            rows = []
            for cl in np.unique(assign):
                sub = m[assign == cl]
                rows.append((int(cl), sub.sum(axis=0).tobytes(),
                             len(sub)))
            return pd.DataFrame(rows, columns=["cluster", "vsum", "n"])

        parts = ds.map_batches(partial_sums,
                               batch_format="pyarrow").to_pandas()
        new = cents.copy()
        touched = []
        for cl, grp in parts.groupby("cluster"):
            s = np.frombuffer(b"".join(grp["vsum"]), dtype=np.float64) \
                .reshape(len(grp), -1).sum(axis=0)
            n = grp["n"].sum()
            if n:
                new[cl] = s / n
                touched.append(cl)
        # only TOUCHED rows renormalize: an empty cluster keeps its
        # previous centroid verbatim — renormalizing an already-rounded
        # unit vector can wiggle the 9th decimal and desync the oracle
        if touched:
            new[touched] = np.round(_normalize(new[touched]), 9)
        cents = new
    return cents


def knn_graph(ds: rd.Dataset, k: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding", as_dataset: bool = False,
              out_dir: str | None = None) -> pd.DataFrame | rd.Dataset:
    """EXACT k-NN graph (top-k similarity join) — the parity baseline
    for :func:`knn_graph_lsh`, with the same Dataset/out_dir contract
    (r4; previously driver-pandas only).

    The full normalized matrix is broadcast ONCE via ``ray.put`` (the
    documented all-pairs baseline exemption, same as
    ``cosine_dup_pairs``: fine while N·dim fits a broadcast; the LSH
    variant is the 100-TB path).  Each batch then computes the exact
    top-k for ITS OWN rows against the broadcast — nodes are
    batch-partitioned, so every node's neighbor list completes inside
    one task and the O(N·k) edge set never lands on the driver unless
    the caller asks for pandas.  Self-edges are dropped by IDENTITY
    (an exact-duplicate vector with a smaller id would outrank self);
    ties break by (cosine@9dp desc, neighbor asc) like
    brute_force_topk.  Returns (node, neighbor, cosine, rank).
    """
    tbl = ds.to_pandas()      # baseline broadcast build (see docstring)
    all_ids = tbl[id_col].to_numpy(np.int64)
    mat = _normalize(np.stack(tbl[vec_col].to_numpy())
                     .astype(np.float64))
    ref = ray.put((all_ids, mat))

    def local(batch: pa.Table) -> pd.DataFrame:
        aid, m = ray.get(ref)
        mine = _normalize(mat_from_column(batch[vec_col]))
        my_ids = ids_from_column(batch[id_col]).astype(np.int64)
        sims = np.round(mine @ m.T, 9)
        sims[my_ids[:, None] == aid[None, :]] = -np.inf
        nq, nb = sims.shape
        kk = min(k, nb - 1)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        out = pd.DataFrame({
            "node": my_ids[rows],
            "neighbor": aid[cols],
            "cosine": sims[rows, cols]})
        out = out.sort_values(["node", "cosine", "neighbor"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out["rank"] = (out.groupby("node", sort=False).cumcount() + 1) \
            .astype(np.int64)
        out = out[out["rank"] <= k].copy()
        out["cosine"] = out["cosine"].round(6)
        return out

    graph = ds.map_batches(local, batch_format="pyarrow")
    if out_dir is not None:
        graph = graph.materialize()
        graph.write_parquet(out_dir)
    if as_dataset:
        return graph
    return graph.to_pandas().sort_values(["node", "rank"],
                                         ignore_index=True)


def knn_graph_lsh(ds: rd.Dataset, k: int = 2, n_planes: int = 4,
                  n_tables: int = 48, seed: int = 7,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  bucket_cap: int = 4096, as_dataset: bool = False,
                  out_dir: str | None = None
                  ) -> pd.DataFrame | rd.Dataset:
    """Approximate k-nearest-neighbor GRAPH (the similarity JOIN with
    top-k semantics — every vector gets its k most-cosine-similar
    peers): LSH candidate pairs (shared generator with the threshold
    dedup), exact cosine on candidates via bucketed value joins, then
    per-node top-k in two stages — a per-batch local top-k bounds the
    shuffle to k rows per (node, batch), the final per-node combine
    sees only those partials. Candidate recall governs graph recall
    (miss prob (1-p^planes)^tables per pair); the pytest baseline is
    brute_force_topk over the full table.

    Returns (node, neighbor, cosine, rank) sorted by (node, rank) —
    as a DATASET with ``as_dataset=True`` / written with ``out_dir``
    (r4: the same contract as knn_graph/CC/PageRank, so graph
    consumers never assemble the O(N·k) edge set on the driver).
    """
    from webalizer_ray.stages.dedup import (
        _unpack_rows,
        join_pairs_to_values,
        lsh_candidate_pairs,
    )
    empty = pd.DataFrame({"node": pd.Series(dtype=np.int64),
                          "neighbor": pd.Series(dtype=np.int64),
                          "cosine": pd.Series(dtype=np.float64),
                          "rank": pd.Series(dtype=np.int64)})
    cand = lsh_candidate_pairs(ds, id_col, vec_col, n_planes, n_tables,
                               seed, bucket_cap)
    if cand.count() == 0:
        if out_dir is not None:
            rd.from_pandas(empty).write_parquet(out_dir)
        return rd.from_pandas(empty) if as_dataset else empty
    j = join_pairs_to_values(cand, ds, id_col, vec_col,
                             pack_dtype=np.float64)

    def score_both_directions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "neighbor": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        a = _normalize(_unpack_rows(df[f"{vec_col}_a"], np.float64))
        b = _normalize(_unpack_rows(df[f"{vec_col}_b"], np.float64))
        cos = np.round((a * b).sum(axis=1), 6)
        ia = df["id_a"].to_numpy(np.int64)
        ib = df["id_b"].to_numpy(np.int64)
        return pd.DataFrame({"node": np.concatenate([ia, ib]),
                             "neighbor": np.concatenate([ib, ia]),
                             "cosine": np.concatenate([cos, cos])})

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["node", "cosine", "neighbor"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("node", sort=False).head(k)

    part = (j.map_batches(score_both_directions, batch_format="pandas")
            .map_batches(local_topk, batch_format="pandas"))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = local_topk(g.drop_duplicates(["node", "neighbor"]))
        g = g.copy()
        g["rank"] = (g.groupby("node", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return g

    graph = part.groupby("node").map_groups(final_topk,
                                            batch_format="pandas")
    if out_dir is not None:
        graph = graph.materialize()
        graph.write_parquet(out_dir)
    if as_dataset:
        return graph
    out = graph.to_pandas()
    if "rank" not in out.columns:          # all-empty blocks
        return empty
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values(["node", "rank"], ignore_index=True)


def mmr_select(ds: rd.Dataset, query_vec: np.ndarray, k: int = 5,
               pool: int = 50, lam: float = 0.7,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> pd.DataFrame:
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein,
    SIGIR 1998): greedily pick items maximizing
    ``lam·sim(query, d) − (1−lam)·max_{s∈S} sim(d, s)``.

    Scale shape: the DISTRIBUTED work is the relevance top-``pool``
    (brute_force_topk's per-batch partial pattern — only pool rows per
    block reach the driver); the greedy loop then runs over the tiny
    pool × k on the driver with vectorized similarity updates. Ties
    break by id for cross-run determinism.
    """
    top = brute_force_topk(ds, query_vec[None, :], k=pool,
                           id_col=id_col, vec_col=vec_col)
    ids = top[id_col].to_numpy()
    rel = top["cosine"].to_numpy(np.float64)
    # fetch the pool's vectors once (pool rows — driver-tiny)
    pool_ids = set(int(i) for i in ids)

    def grab(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df[id_col].isin(pool_ids)]
        return m[[id_col, vec_col]]

    vecs = ds.map_batches(grab, batch_format="pandas").to_pandas() \
        .set_index(id_col).loc[ids][vec_col]
    M = _normalize(np.stack(vecs.to_numpy()).astype(np.float64))
    sim = np.round(M @ M.T, 9)

    chosen: list[int] = []
    cand = np.arange(len(ids))
    # penalty term is 0 while S is empty (standard MMR convention)
    max_to_chosen = np.zeros(len(ids))
    for _ in range(min(k, len(ids))):
        score = np.round(lam * rel[cand]
                         - (1.0 - lam) * max_to_chosen[cand], 9)
        # deterministic: best score, then smaller id
        order = np.lexsort((ids[cand], -score))
        pick = cand[order[0]]
        chosen.append(pick)
        cand = cand[cand != pick]
        max_to_chosen = np.maximum(max_to_chosen, sim[:, pick])
    out = pd.DataFrame({
        id_col: ids[chosen].astype(np.int64),
        "relevance": np.round(rel[chosen], 6),
        "rank": np.arange(1, len(chosen) + 1, dtype=np.int64)})
    return out
