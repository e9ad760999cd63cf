"""Persistent keyed upsert store — durable CDC apply over a bucketed
parquet layout.

``stages/cdc.py:merge_changes`` resolves a change stream against an
in-memory base; this module makes the base DURABLE: a hive-bucketed
parquet store (``store_dir/bucket=K.parquet``, same value-hash layout
as ``join.write_bucketed``) that change batches apply to
incrementally. The lakehouse property that matters at 100 TB: an
apply rewrites ONLY the buckets that received changes — untouched
buckets' files are not read, not written, not even opened — so the
cost of an incremental apply is proportional to the delta's key
spread, not the store size.

Crash safety is the repo's standard tmp+rename publish: each touched
bucket writes to a tmp file and atomically replaces its bucket file,
and the merge is idempotent (last-writer-wins on seq), so a retried
apply converges to the same bytes. At cluster scale store_dir is a
shared-store path (same contract as the checkpoint dirs).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from webalizer_ray.stages.aggregate import key_bucket
from webalizer_ray.stages.cdc import BASE_SEQ, OP_DELETE

NUM_BUCKETS_DEFAULT = 32


def _bucket_path(store_dir: str, b: int) -> str:
    return os.path.join(store_dir, f"bucket={b}.parquet")


def init_store(base: rd.Dataset, store_dir: str, key: str,
               num_buckets: int = NUM_BUCKETS_DEFAULT) -> str:
    """Materialize a base snapshot as the bucketed store."""
    os.makedirs(store_dir, exist_ok=True)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        t = pa.Table.from_pandas(
            g.drop(columns=["_b"]).sort_values(key), preserve_index=False)
        tmp = _bucket_path(store_dir, b) + f".{os.getpid()}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, _bucket_path(store_dir, b))
        return pd.DataFrame({"bucket": [np.int64(b)],
                             "rows": [np.int64(len(g))]})

    base.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(write_bucket, batch_format="pandas") \
        .materialize()
    return store_dir


def apply_changes(store_dir: str, changes: rd.Dataset, key: str,
                  seq: str = "seq", op: str = "op",
                  num_buckets: int = NUM_BUCKETS_DEFAULT) -> pd.DataFrame:
    """Apply a change stream (key, payload..., seq, op) to the store.

    Each TOUCHED bucket's task reads its one store file, resolves
    last-writer-wins locally (vectorized sort + drop_duplicates) and
    atomically republishes the bucket. Returns a (bucket, rows) frame
    of the touched buckets only.

    Apply batches IN SEQUENCE ORDER: the store keeps winners, not
    seqs, so a batch whose seqs predate an already-applied batch would
    overwrite newer state (the same contract as any log-structured
    apply; retries of the SAME batch are safe and idempotent)."""
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        g = g.drop(columns=["_b"])
        path = _bucket_path(store_dir, b)
        if os.path.exists(path):
            base = pq.read_table(path).to_pandas()
            base[seq] = np.int64(BASE_SEQ)
            base[op] = "upsert"
            g = pd.concat([base[g.columns], g], ignore_index=True)
        w = g.sort_values([key, seq], ascending=[True, False],
                          kind="mergesort").drop_duplicates(key)
        w = w[w[op] != OP_DELETE].drop(columns=[seq, op]) \
            .sort_values(key)
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(pa.Table.from_pandas(w, preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"bucket": [np.int64(b)],
                             "rows": [np.int64(len(w))]})

    touched = changes.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(merge_bucket, batch_format="pandas") \
        .to_pandas()
    return touched.sort_values("bucket", ignore_index=True)


def read_store(store_dir: str) -> rd.Dataset:
    """Streaming scan of the current store state."""
    return rd.read_parquet(store_dir)
