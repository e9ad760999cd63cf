"""Distributed PCA / whitening for embedding tables.

Public construction: PCA whitening as used in retrieval pipelines
(e.g. Jégou & Chum 2012, "Negative evidences and co-occurrences in
image retrieval: the benefit of PCA and whitening"): decorrelate the
embedding space so cosine/L2 distances aren't dominated by a few
high-variance directions.

Scale shape — the same moment-partial pattern as the IRLS classifier:
each block emits ONE partial row holding its (Σx, Σxxᵀ, n) moments
(d + d² floats, d = embedding dim); the driver assembles the d×d
covariance, eigendecomposes it (O(d³), trivial for embedding dims),
and broadcasts the whitening matrix for a stateless per-batch matmul
transform. The corpus is touched exactly twice, and nothing bigger
than d² floats per block ever shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from webalizer_ray.stages.vecops import mat_from_column


def covariance_moments(ds: rd.Dataset, vec_col: str = "embedding"
                       ) -> tuple[np.ndarray, np.ndarray, int]:
    """One streaming pass → (mean, covariance, n). Population
    covariance (divide by n), matching numpy's np.cov(bias=True)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        m = mat_from_column(batch[vec_col])
        sx = m.sum(axis=0)
        sxx = m.T @ m
        row = {f"s{i}": [sx[i]] for i in range(len(sx))}
        row.update({f"q{i}": [v] for i, v in enumerate(sxx.ravel())})
        row["n"] = [np.int64(len(m))]
        return pd.DataFrame(row)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    # columns = d (sums) + d² (outer products) + 1 (n) → solve for d
    d = int(round((-1 + np.sqrt(1 + 4 * (len(p.columns) - 1))) / 2))
    sx = np.array([p[f"s{i}"].sum() for i in range(d)])
    sxx = np.array([p[f"q{i}"].sum() for i in range(d * d)]).reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    return mean, cov, n


def pca_spectrum(cov: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigenvalues (descending) + eigenvectors of a covariance."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    return w[order], v[:, order]


def whiten(ds: rd.Dataset, mean: np.ndarray, eigvals: np.ndarray,
           eigvecs: np.ndarray, eps: float = 1e-9,
           vec_col: str = "embedding") -> rd.Dataset:
    """Stateless whitening transform: x → Λ^{-1/2} Vᵀ (x − µ). The
    (d×d) whitening matrix broadcasts once via ray.put."""
    W = eigvecs @ np.diag(1.0 / np.sqrt(eigvals + eps))
    ref = ray.put((mean.copy(), W))

    def transform(batch: pa.Table) -> pd.DataFrame:
        mu, Wm = ray.get(ref)
        m = mat_from_column(batch[vec_col])
        z = (m - mu) @ Wm
        out = batch.drop_columns([vec_col]).to_pandas()
        out[vec_col] = list(z)
        return out

    return ds.map_batches(transform, batch_format="pyarrow")
