"""Join strategy selection: broadcast (map-side) vs distributed hash.

The reference's only joins are in-memory lookup tables (SURVEY.md §2.4
J1–J6); at cluster scale the same decision every SQL optimizer makes
applies to Ray pipelines: a build side that fits comfortably in the
object store should be ``ray.put`` ONCE and probed inside every map
task (zero shuffle — the left side never moves), and only when both
sides are big should the all-to-all hash join run. ``auto_join`` makes
that choice from the build side's row count and guarantees the two
paths produce identical rows (tested), so callers can let data size
pick the plan.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data as rd


def broadcast_join(left: rd.Dataset, right: pd.DataFrame,
                   on: str, right_on: str | None = None) -> rd.Dataset:
    """Map-side inner join: the (small) right side is shipped to the
    object store once and probed per batch — the left side never
    shuffles. The right key column is dropped from the output (the
    left key carries the value)."""
    right_on = right_on or on
    ref = ray.put(right)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        out = df.merge(r, how="inner", left_on=on, right_on=right_on)
        if right_on != on:
            out = out.drop(columns=[right_on])
        return out

    return left.map_batches(probe, batch_format="pandas")


def auto_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: str | None = None,
              broadcast_limit: int = 1_000_000,
              num_partitions: int = 8) -> rd.Dataset:
    """Inner join with automatic strategy: build sides up to
    ``broadcast_limit`` rows broadcast (count() on a parquet read is a
    metadata-only footer sum — no scan); bigger sides take Ray's
    distributed hash join. Both paths emit the same columns (right key
    dropped when names differ)."""
    right_on = right_on or on
    if right.count() <= broadcast_limit:
        return broadcast_join(left, right.to_pandas(), on, right_on)
    # Ray's hash join already emits only the left key when names differ
    return left.join(right, join_type="inner",
                     num_partitions=num_partitions,
                     on=(on,), right_on=(right_on,))


def write_bucketed(ds: rd.Dataset, key: str, out_dir: str,
                   num_buckets: int = 32) -> str:
    """Write a table hive-partitioned by ``bucket = siphash(key) % B``
    — the storage layout that makes later same-key joins shuffle-FREE
    (the lakehouse bucket-transform / storage-partitioned-join
    technique; same explicit partitioning the flagship store uses for
    conv_id). Returns out_dir."""
    from webalizer_ray.stages.aggregate import key_bucket

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = key_bucket(df, [key], num_buckets)
        return df

    ds.map_batches(tag, batch_format="pandas") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def bucketed_join(dir_left: str, dir_right: str, on: str,
                  right_on: str | None = None,
                  num_buckets: int = 32) -> rd.Dataset:
    """Inner join of two bucketed stores WITHOUT any shuffle: both
    sides were written with the same key hash, so matching keys live in
    the same bucket directory on both sides — one independent task per
    bucket reads its two partitions and merges locally. The join's
    all-to-all moved into the (one-time) bucketed writes; every
    subsequent join on that key is embarrassingly parallel. Buckets
    missing on either side contribute nothing (inner semantics)."""
    import os

    import pyarrow.dataset as pads
    right_on = right_on or on

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in df["b"].unique():      # a block may carry several ids
            ld = os.path.join(dir_left, f"bucket={int(b)}")
            rd_ = os.path.join(dir_right, f"bucket={int(b)}")
            if not (os.path.isdir(ld) and os.path.isdir(rd_)):
                continue
            left = pads.dataset(ld).to_table().to_pandas()
            right = pads.dataset(rd_).to_table().to_pandas()
            out = left.merge(right, how="inner", left_on=on,
                             right_on=right_on)
            if right_on != on:
                out = out.drop(columns=[right_on])
            frames.append(out)
        return pd.concat(frames, ignore_index=True) if frames \
            else pd.DataFrame()

    work = rd.from_pandas(pd.DataFrame({"b": range(num_buckets)})) \
        .repartition(num_buckets)
    return work.map_batches(join_bucket, batch_format="pandas")
