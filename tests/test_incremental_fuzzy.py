"""Cross-run fuzzy dedup: near-dups of prior runs drop, novel docs
survive, same-run_id reruns are idempotent, exact re-feeds drop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from webalizer_ray.stages.dedup import incremental_minhash_dedup

SF = "/root/testdata/sf0.001"


def _docs_df():
    return pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_cross_run_near_dups_drop(ray_session, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs_df()
    run_a = docs.iloc[:200].copy()
    # run B: 100 novel docs + 20 near-duplicates of run A (light edit)
    novel = docs.iloc[200:300].copy()
    dups = docs.iloc[:20].copy()
    dups["doc_id"] = dups["doc_id"] + 100_000
    dups["text"] = dups["text"] + " zz"
    run_b = pd.concat([novel, dups], ignore_index=True)

    kept_a, drops_a = incremental_minhash_dedup(
        rd.from_pandas(run_a), store, "a", threshold=0.5)
    assert kept_a.count() == 200 and drops_a.count() == 0

    kept_b, drops_b = incremental_minhash_dedup(
        rd.from_pandas(run_b), store, "b", threshold=0.5)
    kept_b, drops_b = kept_b.to_pandas(), drops_b.to_pandas()
    dropped = set(drops_b["doc_id"])
    # every planted near-dup is caught, every novel doc survives
    assert dropped == set(dups["doc_id"])
    assert set(kept_b["doc_id"]) == set(novel["doc_id"])
    # drops point back at the right originals
    back = dict(zip(drops_b["doc_id"], drops_b["matched_id"]))
    for did in dups["doc_id"]:
        assert back[did] == did - 100_000
    assert (drops_b["est_jaccard"] >= 0.5).all()


def test_same_run_rerun_is_idempotent(ray_session, tmp_path):
    store = str(tmp_path / "store2")
    docs = _docs_df().iloc[:150]
    k1, d1 = incremental_minhash_dedup(rd.from_pandas(docs), store, "a")
    k2, d2 = incremental_minhash_dedup(rd.from_pandas(docs), store, "a")
    pd.testing.assert_frame_equal(
        k1.to_pandas().sort_values("doc_id", ignore_index=True),
        k2.to_pandas().sort_values("doc_id", ignore_index=True))
    assert d1.count() == d2.count() == 0


def test_exact_refeed_drops_everything(ray_session, tmp_path):
    store = str(tmp_path / "store3")
    docs = _docs_df().iloc[:100]
    incremental_minhash_dedup(rd.from_pandas(docs), store, "a")
    refeed = docs.copy()
    refeed["doc_id"] = refeed["doc_id"] + 500_000
    kept, drops = incremental_minhash_dedup(
        rd.from_pandas(refeed), store, "b")
    assert kept.count() == 0
    assert (drops.to_pandas()["est_jaccard"] == 1.0).all()
