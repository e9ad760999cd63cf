"""Int8 embedding quantization: error bound, schema, recall vs exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from webalizer_ray.stages.ann import _normalize, brute_force_topk
from webalizer_ray.stages.quant import int8_topk, quantize_int8

SF = "/root/testdata/sf0.001"


def _emb_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_quantize_schema_and_error_bound(ray_session):
    q = quantize_int8(_emb_ds())
    t = pa.concat_tables(ray.get(q.to_arrow_refs()))
    assert t.schema.field("q_vec").type == pa.list_(pa.int8())
    df = t.to_pandas()
    orig = pd.read_parquet(f"{SF}/embeddings.parquet") \
        .set_index("vec_id").loc[df["vec_id"]]
    M = _normalize(np.stack(orig["embedding"].to_numpy()).astype(np.float64))
    Q = np.stack(df["q_vec"].to_numpy()).astype(np.float64)
    s = df["scale"].to_numpy()
    err = np.abs(Q * s[:, None] - M)
    # symmetric rounding: per-component error <= scale/2 <= 1/254
    assert (err <= s[:, None] / 2 + 1e-12).all()
    assert float(err.max()) <= 1.0 / 254 + 1e-12


def test_int8_recall_vs_exact(ray_session):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    queries = np.stack(emb.sort_values("vec_id").head(5)["embedding"]
                       .to_numpy())
    exact = brute_force_topk(_emb_ds(), queries, k=5)
    approx = int8_topk(quantize_int8(_emb_ds()), queries, k=5)
    hits = tot = 0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.9, hits / tot


def test_int8_query_surface(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["ann_topk_int8"][0](SF)
    assert list(out.columns) == ["query_id", "vec_id", "cosine", "rank"]
    assert set(out["query_id"]) == {0, 1, 2}
    assert out.groupby("query_id")["rank"].max().eq(5).all()
    # self-match must top each query's list with cosine ~ 1
    self_rows = out[out["rank"] == 1]
    assert (self_rows["query_id"].to_numpy()
            == self_rows["vec_id"].to_numpy()).all()
    assert (self_rows["cosine"] > 0.99).all()
