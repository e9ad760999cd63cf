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

import numpy as np
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
              num_partitions: int | None = None) -> rd.Dataset:
    """Inner join with automatic strategy: build sides up to
    ``broadcast_limit`` rows broadcast (count() on a parquet read is a
    metadata-only footer sum — no scan); bigger sides take Ray's
    distributed hash join. Both paths emit the same columns (right key
    dropped when names differ)."""
    from webalizer_ray.config import default_partitions
    from webalizer_ray.stages.aggregate import join_partitions
    num_partitions = join_partitions(
        default_partitions(num_partitions, per_cpu=1))
    right_on = right_on or on
    # materialize ONCE: count() then to_pandas()/join() on a lazy
    # computed side would re-execute its whole upstream plan (measured
    # 2× the reduce cost in the Q18 shape). No streaming is lost: a
    # hash join is BLOCKING on its build side by nature (fully consumed
    # before probing), so holding the build blocks in the (spillable)
    # object store is work the join would have done anyway.
    right = right.materialize()
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
    conv_id). Returns out_dir.

    num_buckets is a LAYOUT CONSTANT, not a parallelism knob: every
    store that will be joined together must be written with the SAME
    value (bucketed_join pairs dirs by bucket id), so it must never
    derive from the live session size."""
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
    missing on either side contribute nothing (inner semantics).
    num_buckets is the LAYOUT CONSTANT both stores were written with
    (see write_bucketed) — session-independent by design."""
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


def skew_join(left: rd.Dataset, right: rd.Dataset, on: str,
              salt_src: str, right_on: str | None = None,
              num_salts: int | None = None,
              num_partitions: int | None = None,
              sample_rows: int = 8192,
              hot_threshold: float = 0.05) -> rd.Dataset:
    """Skew-mitigated distributed inner join (the standard salted-join
    technique): hot join keys would funnel all their rows through one
    join partition; here the probe side's hot-key rows are salted
    deterministically (hash of ``salt_src``, so reruns match) across
    ``num_salts`` sub-keys and the build side REPLICATES its hot-key
    rows once per salt — every pair still meets exactly once, but a
    hot key's work spreads over num_salts partitions.

    Hot keys come from a driver-side sample of the probe side (any key
    holding > hot_threshold of sampled rows). A skewed sample only
    mis-selects WHICH keys get salted, never correctness: non-hot keys
    keep salt 0 on both sides.
    """
    from webalizer_ray.config import default_partitions
    from webalizer_ray.stages.aggregate import join_partitions
    num_salts = default_partitions(num_salts, per_cpu=1)
    num_partitions = join_partitions(
        default_partitions(num_partitions, per_cpu=1))
    right_on = right_on or on
    sample = left.limit(sample_rows).to_pandas()[on]
    freq = sample.value_counts(normalize=True)
    hot = frozenset(freq[freq > hot_threshold].index.tolist())

    def salt_probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        is_hot = df[on].isin(hot).to_numpy()
        h = pd.util.hash_pandas_object(df[salt_src], index=False) \
            .to_numpy()
        df["_salt"] = np.where(is_hot,
                               (h % np.uint64(num_salts)).astype(np.int32),
                               np.int32(0))
        return df

    def replicate_build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        is_hot = df[right_on].isin(hot).to_numpy()
        reps = np.where(is_hot, num_salts, 1)
        out = df.loc[df.index.repeat(reps)].reset_index(drop=True)
        # vectorized 0..r-1 per source row: global index minus each
        # row's replicated start offset
        cum = np.cumsum(reps)
        starts = np.repeat(cum - reps, reps)
        out["_salt"] = (np.arange(cum[-1] if len(df) else 0)
                        - starts).astype(np.int32)
        return out

    j = left.map_batches(salt_probe, batch_format="pandas").join(
        right.map_batches(replicate_build, batch_format="pandas"),
        join_type="inner", num_partitions=num_partitions,
        on=(on, "_salt"), right_on=(right_on, "_salt"))
    return j.drop_columns(["_salt"])


def temporal_join(facts: rd.Dataset, dim: rd.Dataset, key: str,
                  ts_col: str, from_col: str = "valid_from",
                  to_col: str = "valid_to", how: str = "inner",
                  num_buckets: int | None = None) -> rd.Dataset:
    """SCD2 / temporal-validity join: each fact row picks the dimension
    row valid at its event time — ``valid_from <= ts < valid_to``
    (a null ``valid_to`` means open-ended, the current generation).

    The point-in-time-correct enrichment every warehouse needs (a
    slowly-changing dimension must be joined as of the FACT's
    timestamp, not its current value — joining current values leaks
    the future into historical rows). Ray Data has no interval-join
    kernel; this is the composition: both sides align to one Arrow
    schema with typed-null fill, union, shuffle ONCE into a coarse
    key-hash bucket (a key's facts and its whole validity history land
    in the same bucket), and within the bucket a single vectorized
    ``pd.merge_asof(by=key)`` resolves every key at once, followed by
    the exclusive upper-bound check. Validity gaps (ts between two
    generations) therefore resolve to no-match, not the previous row.

    ``how``: 'inner' drops unmatched facts; 'left' keeps them with
    null dimension attributes. Output = fact columns + dim columns
    (one shared ``key`` column), lazy. num_buckets bounds per-task
    memory: size to (rows of the hotter side / buckets) at scale.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}")
    import pyarrow as pa

    from webalizer_ray.config import default_partitions
    from webalizer_ray.stages.aggregate import key_bucket
    num_buckets = default_partitions(num_buckets)

    def arrow_schema(ds: rd.Dataset) -> "pa.Schema":
        # after a pandas-format map_batches Ray reports a
        # PandasBlockSchema; materialize ONE block to get arrow types
        sch = ds.schema().base_schema
        if isinstance(sch, pa.Schema):
            return sch
        return pa.Table.from_pandas(
            ds.limit(1).to_pandas(), preserve_index=False).schema

    f_sch = arrow_schema(facts)
    d_sch = arrow_schema(dim)
    shared = set(f_sch.names) & set(d_sch.names)
    if shared != {key}:
        raise ValueError(f"sides must share ONLY the key; shared={shared}")
    dim_only = [n for n in d_sch.names if n != key]
    fact_only = [n for n in f_sch.names if n != key]
    order = [key] + fact_only + dim_only + ["_tag"]

    def align(missing: list, src: "pa.Schema", tag: int):
        def f(t: "pa.Table") -> "pa.Table":
            n = t.num_rows
            for name in missing:
                t = t.append_column(name, pa.nulls(n, src.field(name).type))
            t = t.append_column(
                "_tag", pa.array(np.full(n, tag, np.int8), pa.int8()))
            return t.select(order)
        return f

    stream = facts.map_batches(align(dim_only, d_sch, 0),
                               batch_format="pyarrow") \
        .union(dim.map_batches(align(fact_only, f_sch, 1),
                               batch_format="pyarrow"))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    out_cols = [key] + fact_only + dim_only

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["_tag"] == 0][[key] + fact_only] \
            .sort_values(ts_col, kind="mergesort")
        d = g[g["_tag"] == 1][[key] + dim_only] \
            .sort_values(from_col, kind="mergesort")
        m = pd.merge_asof(f, d, left_on=ts_col, right_on=from_col,
                          by=key, direction="backward")
        valid = m[from_col].notna() & (
            m[to_col].isna() | (m[ts_col] < m[to_col]))
        if how == "inner":
            m = m[valid]
        else:
            m.loc[~valid, dim_only] = None
        return m[out_cols].reset_index(drop=True)

    return stream.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(resolve, batch_format="pandas")
