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
