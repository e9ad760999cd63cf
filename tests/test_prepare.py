"""End-to-end training-data prep pipeline: conservation at every hop,
exact pack-rule verification, determinism."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_prepare_funnel_conserves_and_packs_exactly(ray_session,
                                                    tmp_path):
    from webalizer_ray.pipelines.prepare import run_prepare
    from webalizer_ray.stages.scan import _KEY_MOD, _KNUTH

    val = _docs().limit(5)
    out = str(tmp_path / "prep")
    f = run_prepare(_docs(), out, val=val, token_budget=512, seed=0)

    assert f["total"] == sum(f["routes"].values())
    assert f["packed_docs"] == f["routes"]["kept"] - f["contaminated"]
    assert f["contaminated"] >= 5 - 2  # planted val docs must be caught

    packed = pads.dataset(os.path.join(out, "packed"),
                          partitioning="hive").to_table().to_pandas()
    assert len(packed) == f["packed_docs"]
    assert packed["n_tokens"].sum() == f["packed_tokens"]
    assert packed["bin_id"].max() + 1 == f["bins"]

    # EXACT pack rule: recompute the shuffle key, sort, exclusive
    # cumsum, floor by budget — must reproduce bin_id for every doc
    k = (packed["doc_id"].to_numpy(np.uint64) * np.uint64(_KNUTH)) \
        % np.uint64(_KEY_MOD)
    packed = packed.assign(_k=k.astype(np.int64)) \
        .sort_values(["_k", "doc_id"], ignore_index=True)
    cum = packed["n_tokens"].cumsum() - packed["n_tokens"]
    want_bin = (cum // 512).to_numpy()
    assert (packed["bin_id"].to_numpy() == want_bin).all()
    # a bin never spans slices
    g = packed.groupby("bin_id")["slice"].nunique()
    assert (g == 1).all()


def test_prepare_deterministic(ray_session, tmp_path):
    from webalizer_ray.pipelines.prepare import run_prepare

    f1 = run_prepare(_docs(), str(tmp_path / "a"), token_budget=1024)
    f2 = run_prepare(_docs(), str(tmp_path / "b"), token_budget=1024)
    assert f1 == f2
    a = pads.dataset(str(tmp_path / "a/packed"), partitioning="hive") \
        .to_table().to_pandas().sort_values("doc_id", ignore_index=True)
    b = pads.dataset(str(tmp_path / "b/packed"), partitioning="hive") \
        .to_table().to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_prepare_rerun_serves_cached_funnel(ray_session, tmp_path):
    """Same parquet input + params: the second run returns the stamped
    funnel without recomputing (marker path); changed params recompute."""
    import json
    import time

    from webalizer_ray.pipelines.prepare import run_prepare

    out = str(tmp_path / "p")
    f1 = run_prepare(_docs(), out, token_budget=512)
    marker = os.path.join(out, "_PREPARE.json")
    assert os.path.exists(marker)
    stamp = os.path.getmtime(marker)
    t0 = time.time()
    f2 = run_prepare(_docs(), out, token_budget=512)
    assert f2 == f1
    assert os.path.getmtime(marker) == stamp        # untouched: cached
    assert time.time() - t0 < 2.0                    # no recompute
    f3 = run_prepare(_docs(), out, token_budget=256)  # params changed
    assert f3["bins"] > f1["bins"]
    assert json.load(open(marker))["funnel"] == f3


def test_prepare_and_curate_on_empty_corpus(ray_session, tmp_path):
    """An empty documents table yields a zeroed funnel at every hop —
    no crash, no partial output (the CLI path a bad glob would hit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.curate import run_curation
    from webalizer_ray.pipelines.prepare import run_prepare

    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([], "int64"),
                             "text": pa.array([], "string")}), p)
    docs = rd.read_parquet(p)
    c = run_curation(docs, str(tmp_path / "c"))
    assert c["total"] == 0 and sum(c["routes"].values()) == 0
    f = run_prepare(docs, str(tmp_path / "p"), token_budget=512)
    assert f["packed_docs"] == 0 and f["bins"] == 0
