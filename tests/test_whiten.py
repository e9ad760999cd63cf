"""Distributed PCA whitening: numpy parity, block invariance, identity
covariance after the transform."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from webalizer_ray.stages.whiten import (
    covariance_moments, pca_spectrum, whiten)

SF = "/root/testdata/sf0.001"


def _emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_covariance_matches_numpy(ray_session):
    df = _emb()
    mean, cov, n = covariance_moments(rd.from_pandas(df).repartition(5))
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    assert n == len(m)
    assert np.allclose(mean, m.mean(axis=0), atol=1e-10)
    assert np.allclose(cov, np.cov(m, rowvar=False, bias=True),
                       atol=1e-10)


def test_whitened_covariance_is_identity(ray_session):
    df = _emb()
    ds = rd.from_pandas(df)
    mean, cov, _ = covariance_moments(ds)
    w, v = pca_spectrum(cov)
    assert (np.diff(w) <= 1e-12).all()          # descending
    _, wcov, _ = covariance_moments(whiten(ds, mean, w, v))
    assert np.allclose(wcov, np.eye(len(w)), atol=1e-6)


def test_spectrum_query_surface(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["embedding_pca_spectrum"][0](SF)
    assert (out["eigenvalue"].to_numpy()[:-1]
            >= out["eigenvalue"].to_numpy()[1:] - 1e-9).all()
    assert np.allclose(out["whitened_var"], 1.0, atol=1e-4)
