"""End-to-end training-data preparation: the canonical LLM data-prep
pipeline composed from this engine's operators —

    curate (percentile length band → quality gate → exact dedup)
      → decontaminate (drop docs sharing an n-gram with the eval set)
      → deterministic global shuffle (seeded hash rank, no sort)
      → sequence packing (token-budget bins via the two-level scan)
      → partitioned parquet write + conservation-checked funnel

Every stage is the already-tested primitive (curate.run_curation,
dedup.ngram_decontaminate, scan.shuffle_rank's key, scan.pack_bins);
this module only wires them, so the scale story is the union of
theirs: two streaming passes for curation, one bucketed hash join for
decontamination, and a two-level scan for shuffle+pack — no stage
gathers the corpus anywhere.

Output layout: ``out_dir/curation/route=*`` (audit trail of every
drop), ``out_dir/packed/slice=K/*.parquet`` with ``(doc_id, n_tokens,
bin_id)`` — resumable consumption per slice; a bin never spans slices
(slice = bin_id % 16).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.pipelines.curate import run_curation
from webalizer_ray.stages.dedup import ngram_decontaminate
from webalizer_ray.stages.scan import _KEY_MOD, _KNUTH, pack_bins


def run_prepare(docs: rd.Dataset, out_dir: str,
                val: rd.Dataset | None = None,
                token_budget: int = 2048, seed: int = 0,
                q_lo: float = 0.05, q_hi: float = 0.95,
                min_quality: float = 0.38,
                decon_ngram: int = 5,
                id_col: str = "doc_id") -> dict:
    """Run the full prep; returns the funnel dict (counts conserve at
    every hop: total = kept + dropped_by_route; kept = packed +
    contaminated). Rerun-safe like run_curation: a completed run
    stamps ``_PREPARE.json`` with the (docs, val, params) lineage and
    same-lineage reruns return the saved funnel; anything else wipes
    and recomputes."""
    import shutil

    import ray

    from webalizer_ray.pipelines.curate import (
        lineage_key,
        load_marker,
        write_marker,
    )
    params = {"token_budget": token_budget, "seed": seed, "q_lo": q_lo,
              "q_hi": q_hi, "min_quality": min_quality,
              "decon_ngram": decon_ngram, "id_col": id_col}
    key = lineage_key(docs, params)
    if key is not None and val is not None:
        vkey = lineage_key(val, params)
        key = None if vkey is None else key + vkey
    cached = load_marker(out_dir, "_PREPARE.json", key)
    if cached is not None:
        return cached
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)

    funnel = run_curation(docs, os.path.join(out_dir, "curation"),
                          q_lo=q_lo, q_hi=q_hi, min_quality=min_quality,
                          id_col=id_col)
    if funnel["routes"]["kept"] == 0:   # nothing survived curation
        funnel.update({"contaminated": 0, "packed_docs": 0,
                       "packed_tokens": 0, "bins": 0,
                       "token_budget": token_budget})
        os.makedirs(os.path.join(out_dir, "packed"), exist_ok=True)
        write_marker(out_dir, "_PREPARE.json", key, funnel)
        return funnel
    kept = rd.read_parquet(os.path.join(out_dir, "curation", "route=kept"),
                           columns=[id_col, "text", "n_tokens"])

    n_contaminated = 0
    if val is not None:
        bad_ids = ngram_decontaminate(kept, val, n=decon_ngram,
                                      id_col=id_col)
        n_contaminated = len(bad_ids)
        if n_contaminated:
            # eval-benchmark-sized id set: broadcast once, filter map-side
            bad_ref = ray.put(frozenset(bad_ids[id_col].tolist()))

            def drop_bad(df: pd.DataFrame) -> pd.DataFrame:
                bad = ray.get(bad_ref)
                return df[~df[id_col].isin(bad)]

            kept = kept.map_batches(drop_bad, batch_format="pandas")

    def shuffle_key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.uint64)
        k = ((ids ^ np.uint64(seed)) * np.uint64(_KNUTH)) \
            % np.uint64(_KEY_MOD)
        return pd.DataFrame({"_sk": k.astype(np.int64),
                             id_col: df[id_col].to_numpy(np.int64),
                             "n_tokens": df["n_tokens"]
                             .to_numpy(np.int64)})

    keyed = kept.map_batches(shuffle_key, batch_format="pandas")
    packed = pack_bins(keyed, "_sk", "n_tokens", budget=token_budget,
                       bucket_width=_KEY_MOD // 64)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "n_tokens", "bin_id"]].copy()
        out["slice"] = (out["bin_id"] % 16).astype(np.int32)
        return out

    out_packed = os.path.join(out_dir, "packed")
    packed.map_batches(finalize, batch_format="pandas") \
        .write_parquet(out_packed, partition_cols=["slice"])

    stats = rd.read_parquet(out_packed).aggregate(
        *_pack_aggs())
    funnel["contaminated"] = int(n_contaminated)
    funnel["packed_docs"] = int(stats["count()"])
    funnel["packed_tokens"] = int(stats["sum(n_tokens)"])
    funnel["bins"] = int(stats["max(bin_id)"]) + 1
    funnel["token_budget"] = token_budget
    write_marker(out_dir, "_PREPARE.json", key, funnel)
    return funnel


def _pack_aggs():
    from ray.data.aggregate import Count, Max, Sum
    return (Count(), Sum("n_tokens"), Max("bin_id"))
