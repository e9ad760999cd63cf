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

#: bump when routing semantics change — invalidates lineage markers
CURATE_VERSION = 1


def lineage_key(ds: rd.Dataset, params: dict) -> str | None:
    """Identity of (input files + sizes + params): a completed output
    directory carrying this key can be trusted on rerun. None when the
    input has no file lineage (e.g. from_pandas) — then reruns always
    recompute (wipe-and-redo is still safe: the pipeline owns out_dir).
    """
    import hashlib
    import json as _json
    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    ident = [(f, os.stat(f).st_size) for f in sorted(files)
             if os.path.exists(f)]
    if len(ident) != len(files):
        return None
    blob = _json.dumps([ident, sorted(params.items()),
                        CURATE_VERSION]).encode()
    return hashlib.sha256(blob).hexdigest()


def load_marker(out_dir: str, name: str, key: str | None) -> dict | None:
    """Saved funnel if out_dir completed with the SAME lineage key."""
    import json as _json
    p = os.path.join(out_dir, name)
    if key is None or not os.path.exists(p):
        return None
    saved = _json.load(open(p))
    return saved["funnel"] if saved.get("lineage") == key else None


def write_marker(out_dir: str, name: str, key: str | None,
                 funnel: dict) -> None:
    import json as _json
    p = os.path.join(out_dir, name)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump({"lineage": key, "funnel": funnel}, f)
    os.replace(tmp, p)


def run_curation(docs: rd.Dataset, out_dir: str, q_lo: float = 0.05,
                 q_hi: float = 0.95, min_quality: float = 0.5,
                 num_buckets: int = 32,
                 id_col: str = "doc_id") -> dict:
    """Route every doc, write out_dir/route=*/...parquet, return the
    funnel: {"total": N, "routes": {route: count}, "band": (lo, hi)}.

    Rerun-safe: a COMPLETED run stamps ``_FUNNEL.json`` with the input
    lineage (file list + sizes + params); rerunning with the same
    lineage returns the saved funnel without recomputing, while a
    changed input, changed params, or a crashed partial output wipes
    the directory and recomputes (write_parquet appends uuid-named
    files, so reusing a dirty dir would double rows — same contract as
    the flagship's pass-1 store, which solves it with per-partition
    checkpoints instead)."""
    key = lineage_key(docs, {"q_lo": q_lo, "q_hi": q_hi,
                             "min_quality": min_quality,
                             "num_buckets": num_buckets,
                             "id_col": id_col})
    cached = load_marker(out_dir, "_FUNNEL.json", key)
    if cached is not None:
        return cached
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        df = add_quality_score(df)
        df = add_fingerprint(df)
        df["fingerprint"] = df["fingerprint"].astype(np.int64)  # hive key
        return df[[id_col, "text", "n_tokens", "quality_score",
                   "fingerprint"]]

    sig = docs.map_batches(signals, batch_format="pandas")
    band = exact_quantiles_bounded(sig, "n_tokens", [q_lo, q_hi])
    lo, hi = band[q_lo], band[q_hi]
    if np.isnan(lo):    # empty corpus: zero-row funnel, nothing to write
        os.makedirs(out_dir, exist_ok=True)
        funnel = {"total": 0, "routes": {r: 0 for r in ROUTES},
                  "band": [0.0, 0.0]}
        write_marker(out_dir, "_FUNNEL.json", key, funnel)
        return funnel

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
    funnel = {"total": total, "routes": counts,
              "band": [float(lo), float(hi)]}
    write_marker(out_dir, "_FUNNEL.json", key, funnel)
    return funnel
