"""Document-curation pipeline: the training-data analog of the
flagship's parse→enrich→route→aggregate shape, applied to a documents
table — quality signals computed in one streaming pass, docs routed to
exactly one of {kept, length, quality, duplicate}, curated output
written hive-partitioned by route, and a conservation-checked funnel
summary returned (every input doc lands in exactly one route, the same
total=parsed+bad+ignored invariant the flagship's metrics carry).

Gate order (first failing gate wins, cheap-to-expensive):
  1. length  — n_tokens outside the corpus [q_lo, q_hi] percentile band
     (exact histogram quantiles; one (value, count) row per distinct
     value shuffles, never the column)
  2. quality — C4/Gopher-style score below min_quality (Arrow RE2
     kernels, same formula as textstats.add_quality_score)
  3. duplicate — exact dedup among SURVIVORS: min(doc_id) per
     normalized-text fingerprint keeps, the rest route to duplicate.
     Survivors shuffle by fingerprint bucket so the keeper decision is
     bucket-local; failed docs skip that shuffle entirely (bucket -1
     passthrough, the flagship's non-ok-route collapse trick).

Scale shape: two streaming passes over the docs (signals+quantiles,
then route+dedup+write); the only all-to-alls are the tiny value
histogram and the fingerprint-bucket shuffle of survivors.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.stages.aggregate import exact_quantiles_bounded
from webalizer_ray.stages.textstats import add_fingerprint, add_quality_score

ROUTES = ("kept", "length", "quality", "duplicate")


def run_curation(docs: rd.Dataset, out_dir: str, q_lo: float = 0.05,
                 q_hi: float = 0.95, min_quality: float = 0.5,
                 num_buckets: int = 32,
                 id_col: str = "doc_id") -> dict:
    """Route every doc, write out_dir/route=*/...parquet, return the
    funnel: {"total": N, "routes": {route: count}, "band": (lo, hi)}.

    ``out_dir`` must be fresh (write_parquet appends uuid-named files —
    same contract as the flagship's pass-1 store); rerun into a new
    dir, or wrap with the checkpoint machinery for partial resume.
    """
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(f"{out_dir} already holds a run; "
                              "use a fresh output dir")

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        df = add_quality_score(df)
        df = add_fingerprint(df)
        df["fingerprint"] = df["fingerprint"].astype(np.int64)  # hive key
        return df[[id_col, "text", "n_tokens", "quality_score",
                   "fingerprint"]]

    sig = docs.map_batches(signals, batch_format="pandas")
    band = exact_quantiles_bounded(sig, "n_tokens", [q_lo, q_hi])
    lo, hi = band[q_lo], band[q_hi]

    def route_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        n = df["n_tokens"].to_numpy()
        bad_len = (n < lo) | (n > hi)
        bad_q = df["quality_score"].to_numpy() < min_quality
        df["route"] = np.select([bad_len, bad_q], ["length", "quality"],
                                default="kept")
        # survivors shuffle by fingerprint bucket; failures pass through
        # one collapsed bucket (no keeper decision needed for them)
        df["_bk"] = np.where(
            df["route"].eq("kept"),
            (df["fingerprint"].to_numpy(np.uint64)
             % np.uint64(num_buckets)).astype(np.int32),
            np.int32(-1))
        return df

    def mark_duplicates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bk"])
        if g["route"].iat[0] != "kept":      # the -1 passthrough bucket
            return g
        keeper = g.groupby("fingerprint")[id_col].transform("min")
        g = g.copy()
        g["route"] = np.where(g[id_col].to_numpy() == keeper.to_numpy(),
                              "kept", "duplicate")
        return g

    routed = (sig.map_batches(route_batch, batch_format="pandas")
              .groupby("_bk").map_groups(mark_duplicates,
                                         batch_format="pandas"))
    routed.write_parquet(out_dir, partition_cols=["route"],
                         compression="zstd")

    import pyarrow.dataset as pads
    counts = {}
    for r in ROUTES:
        d = os.path.join(out_dir, f"route={r}")
        counts[r] = pads.dataset(d).count_rows() if os.path.isdir(d) else 0
    total = sum(counts.values())
    return {"total": total, "routes": counts,
            "band": (float(lo), float(hi))}
