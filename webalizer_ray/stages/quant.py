"""Int8 embedding quantization — the memory-bandwidth scale path for
similarity search.

Public construction (scalar quantization as in FAISS SQ8 /
product-quantization literature, Jégou et al. 2011): L2-normalize each
vector, then symmetric per-vector int8 quantization (scale =
max|component| / 127). Cosine similarity against a float query is then
``(q · v_i8) * scale`` with per-component error ≤ scale/2 ≤ 1/254 —
small next to typical neighbor gaps.

Why it matters at 100 TB: embeddings dominate the bytes of a vector
corpus. float32 → int8 cuts object-store footprint, shuffle volume and
scan bandwidth 4× while keeping ranks for all but hairline ties; the
quantized table is what you'd persist and serve. Quantization and
scoring are both stateless vectorized ``map_batches`` passes; the
broadcast query matrix stays float.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from webalizer_ray.stages.ann import _normalize
from webalizer_ray.stages.vecops import ids_from_column, mat_from_column


def quantize_int8(ds: rd.Dataset, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> rd.Dataset:
    """→ (id_col, q_vec list<int8>, scale float64): per-vector
    symmetric quantization of the L2-normalized vector."""
    def qbatch(batch: pa.Table) -> pa.Table:
        m = _normalize(mat_from_column(batch[vec_col]))
        s = np.maximum(np.abs(m).max(axis=1) / 127.0, 1e-12)
        q = np.rint(m / s[:, None]).astype(np.int8)
        n, d = q.shape
        return pa.table({
            id_col: batch[id_col],
            "q_vec": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1)), d).cast(pa.list_(pa.int8())),
            "scale": pa.array(s, pa.float64()),
        })

    return ds.map_batches(qbatch, batch_format="pyarrow")


def int8_topk(qds: rd.Dataset, queries: np.ndarray, k: int = 5,
              id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate cosine top-k over a quantized table (same output
    shape and tie rule as ann.brute_force_topk)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        q = ray.get(q_ref)
        mat = mat_from_column(batch["q_vec"])
        s = np.asarray(batch["scale"], dtype=np.float64)
        sims = np.round((q @ mat.T) * s[None, :], 9)
        ids = ids_from_column(batch[id_col])
        nq, nb = sims.shape
        kk = min(k, nb)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        return pd.DataFrame({"query_id": rows.astype(np.int64),
                             id_col: ids[cols],
                             "cosine": sims[rows, cols]})

    partials = qds.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) — the 32x compression tier below
# SQ8's 4x: the d-dim vector splits into m subspaces, each quantized to
# one of ks codewords, so a vector stores as m uint8 codes. Queries score
# by Asymmetric Distance Computation (ADC): ONE (m, ks) lookup table of
# partial dot products per query, then every data vector's score is m
# table lookups — no float multiply per vector.
#
# Scale shape: codebooks train on a driver-side sample (the standard
# practice — FAISS trains on a subset; the codebook is (m, ks, d/m)
# floats, broadcast once), encoding is a stateless vectorized pass, and
# ADC scoring is per-batch lookups + the same mergeable top-k partials
# the exact path uses. At 100 TB the PQ table is 1/32 the scan and
# shuffle bytes of float32.
# ---------------------------------------------------------------------------

def _kmeans_np(x: np.ndarray, ks: int, n_iter: int) -> np.ndarray:
    """Plain Lloyd on a (small) sample; empty clusters keep their
    previous centroid. Engine-independent determinism (r3, same
    discipline as ann._kmeans_loop): STRIDED seeding over the sample
    (row floor(i·N/k)), squared distances rounded to 9 dp before the
    argmin (ties → lowest codeword), centroids rounded to 9 dp after
    each update — replicable in SQL so the PQ query can carry an
    oracle. (r4: the dead ``rng`` parameter is gone — ADVICE r3.)"""
    k = min(ks, len(x))
    idx = (np.arange(k, dtype=np.int64) * len(x)) // k
    c = x[idx]
    if len(c) < ks:  # degenerate tiny sample: pad by repeating
        c = np.concatenate([c, np.repeat(c[:1], ks - len(c), axis=0)])
    for _ in range(n_iter):
        d = np.round(((x[:, None, :] - c[None, :, :]) ** 2).sum(-1), 9)
        a = np.argmin(d, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, x)
        cnt = np.bincount(a, minlength=ks).astype(np.float64)
        nz = cnt > 0
        c = np.where(nz[:, None],
                     np.round(sums / np.maximum(cnt, 1)[:, None], 9), c)
    return c


def pq_train(ds: rd.Dataset, m: int = 8, ks: int = 16,
             sample_rows: int = 2048, n_iter: int = 8, seed: int = 7,
             vec_col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks on a sample → (m, ks, d/m)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = np.round(_normalize(np.stack(sample[vec_col].to_numpy())
                            .astype(np.float64)), 9)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if seed != 7:
        import warnings
        warnings.warn(
            "seed is no longer consumed: codebook training uses the "
            "deterministic strided seeding and is identical for every "
            "seed (ADVICE r3 — silent ignore removed)",
            DeprecationWarning, stacklevel=2)
    return np.stack([
        _kmeans_np(x[:, j * dsub:(j + 1) * dsub], ks, n_iter)
        for j in range(m)])


def pq_encode(ds: rd.Dataset, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> rd.Dataset:
    """→ (id_col, codes list<uint8>): m codes per vector, 1/32 the
    bytes of the float32 input at m=8 over 64 float dims."""
    cb_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)              # (m, ks, dsub)
        mm, ks, dsub = cb.shape
        x = np.round(_normalize(mat_from_column(batch[vec_col])), 9)
        codes = np.empty((len(x), mm), np.uint8)
        for j in range(mm):
            sub = x[:, j * dsub:(j + 1) * dsub]
            dist = np.round(
                ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1), 9)
            codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
        return pa.table({
            id_col: batch[id_col],
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), mm)
                .cast(pa.list_(pa.uint8()))})

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds: rd.Dataset, codebooks: np.ndarray,
            queries: np.ndarray, k: int = 5,
            id_col: str = "vec_id") -> pd.DataFrame:
    """ADC cosine top-k over the PQ table (same output shape and tie
    rule as ann.brute_force_topk). Per query the (m, ks) partial-dot
    LUT is built ONCE; each data vector costs m uint8 lookups."""
    qn = np.round(_normalize(np.asarray(queries, dtype=np.float64)), 9)
    mm, ks, dsub = codebooks.shape
    # LUT[q, j, c] = <query subvector j, codeword c of subspace j>
    qsub = qn.reshape(len(qn), mm, dsub)               # (nq, m, dsub)
    # rounded LUT: the per-(query, subspace, codeword) partial dots are
    # the addends of the final sim — rounding them makes the engine and
    # the SQL oracle sum IDENTICAL terms (r3)
    lut = np.round(np.einsum("qjd,jcd->qjc", qsub, codebooks), 9)
    lut_ref = ray.put(lut)
    cols_j = np.arange(mm)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        lt = ray.get(lut_ref)
        codes = mat_from_column(batch["codes"], dtype=np.int64)
        ids = ids_from_column(batch[id_col])
        nq = lt.shape[0]
        outs = []
        for qi in range(nq):
            sims = np.round(lt[qi][cols_j[None, :], codes].sum(1), 9)
            kk = min(k, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk]
            outs.append(pd.DataFrame({
                "query_id": np.full(kk, qi, np.int64),
                id_col: ids[part], "cosine": sims[part]}))
        return pd.concat(outs, ignore_index=True)

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort")
    out = partials.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int64) + 1
    return out
