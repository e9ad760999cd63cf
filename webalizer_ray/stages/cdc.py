"""Change-data-capture merge (MERGE INTO / upsert) over a keyed table.

The incremental-store primitive every lakehouse exposes (Delta MERGE,
Iceberg upsert, Hudi CoW): apply a change stream of ``upsert`` /
``delete`` operations to a base snapshot, last-writer-wins per key.
The reference engine's analog is its incremental month state — replayed
log lines overwrite prior counters for the same slot (SURVEY.md §2.9
W5 watermark + §2.1 S11 state writer) — here generalized to whole rows
with an explicit sequence column.

Scale shape: base ∪ changes is ONE streaming union; each row shuffles
exactly once into a coarse int32 hash bucket (a key lives in exactly
one bucket), and the winner-per-key resolution is a single vectorized
pandas sort + drop_duplicates inside the bucket task.  Nothing but the
surviving rows leaves the cluster; driver memory is O(0) — callers get
a lazy Dataset.  num_buckets bounds per-task memory: size it to
(#distinct keys × row width) / buckets at the target scale.

Semantics (deterministic given unique ``seq`` per key):
- the change with the highest ``seq`` for a key wins;
- base rows carry seq = BASE_SEQ (-1), i.e. any change beats the base;
- a winning ``delete`` removes the key; a winning ``upsert`` replaces
  the full row payload;
- keys present only in changes are inserts (no base row required).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from webalizer_ray.stages.aggregate import key_bucket

from webalizer_ray.config import default_partitions

#: sequence assigned to base-snapshot rows — any real change outranks it.
BASE_SEQ = -1

OP_UPSERT = "upsert"
OP_DELETE = "delete"


def merge_changes(base: rd.Dataset | None, changes: rd.Dataset,
                  key: str, seq: str = "seq", op: str = "op",
                  num_buckets: int | None = None) -> rd.Dataset:
    """Apply ``changes`` (columns: key, seq, op, payload...) to ``base``
    (columns: key, payload...). Returns the merged table WITHOUT the
    seq/op bookkeeping columns. ``base=None`` materializes the change
    stream alone (pure insert/delete replay).

    ``seq`` must be unique per key (e.g. a log offset or commit id);
    ties would make last-writer-wins ambiguous across engines.
    """
    num_buckets = default_partitions(num_buckets)

    def tag_base(t: "pa.Table") -> "pa.Table":
        n = t.num_rows
        t = t.append_column(seq, pa.array(
            np.full(n, BASE_SEQ, np.int64), pa.int64()))
        return t.append_column(op, pa.array([OP_UPSERT] * n, pa.string()))

    stream = changes
    if base is not None:
        stream = base.map_batches(tag_base, batch_format="pyarrow") \
            .union(changes)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, [key], num_buckets)
        return df

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # Highest seq per key wins; mergesort keeps determinism if a
        # caller violates the unique-seq contract.
        w = df.sort_values([key, seq], ascending=[True, False],
                           kind="mergesort").drop_duplicates(key)
        w = w[w[op] != OP_DELETE]
        return w.drop(columns=["_b", seq, op]).reset_index(drop=True)

    return stream.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(resolve, batch_format="pandas")
