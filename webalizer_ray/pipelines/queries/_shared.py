"""Driver-contract queries: Ray pipelines + matching DuckDB oracle SQL.

One entry per implemented operator family from SURVEY.md §2, expressed
over the driver's testdata views (events / documents / embeddings /
lineitem). Each Ray callable takes ``sf_dir`` and returns a pandas
DataFrame whose COLUMN NAMES AND TYPES exactly match the oracle SQL
(the driver hashes values after sorting columns by name).

Conventions for hash-stable floats: every float aggregate is rounded
(ROUND(x, 2) for sums, 6 for similarities) on BOTH sides; int aggregates
are CAST(. AS BIGINT) in SQL because DuckDB's SUM(int) is HUGEINT.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from webalizer_ray.stages import ann, dedup, scan, simjoin, textstats
from webalizer_ray.stages.aggregate import (
    distinct_count,
    join_partitions,
    exact_quantiles_bounded,
    reduce_sink,
    salted_two_phase,
)
from webalizer_ray.stages.topn import top_n_pandas


class _LazyRegistry(dict):
    """name -> (ray_callable, oracle_sql|None); self-populating.

    The query registry spans ~17 chunk modules under
    ``pipelines/queries/``.  Importing the package is near-free; the
    first READ access (lookup/iteration/len) triggers a one-time import
    of every chunk module via the loader installed by ``__init__``.
    Writes (``register``) never trigger loading, so chunk modules can be
    imported individually (e.g. by Ray workers deserializing a single
    query function) without paying for the whole registry.

    Reentrancy (r3 review): a few chunk modules READ an earlier entry's
    SQL at module level (e.g. ``REGISTRY["bm25_search"][1]``).  Keyed
    lookups therefore only fire the loader when the key is actually
    MISSING — a backward read during a standalone chunk import resolves
    from what is already registered instead of recursively importing
    every chunk mid-import (which crashed q10–q17: the full load would
    re-enter half-initialized modules).  A load in progress is never
    re-entered (``_loading``), and the loader is only consumed on
    SUCCESS so a failed import leaves the registry retryable rather
    than silently partial.
    """

    _loader = None
    _loading = False

    def _ensure(self, missing_key: bool = True):
        if self._loader is None or self._loading or not missing_key:
            return
        loader = self._loader
        type(self)._loading = True
        try:
            loader()
        finally:
            type(self)._loading = False
        self._loader = None          # consumed only on success

    def __getitem__(self, k):
        self._ensure(not dict.__contains__(self, k))
        return dict.__getitem__(self, k)

    def __contains__(self, k):
        self._ensure(not dict.__contains__(self, k))
        return dict.__contains__(self, k)

    def __iter__(self):
        self._ensure()
        return dict.__iter__(self)

    def __len__(self):
        self._ensure()
        return dict.__len__(self)

    def get(self, k, default=None):
        self._ensure(not dict.__contains__(self, k))
        return dict.get(self, k, default)

    def items(self):
        self._ensure()
        return dict.items(self)

    def keys(self):
        self._ensure()
        return dict.keys(self)

    def values(self):
        self._ensure()
        return dict.values(self)


#: name -> (ray_callable, oracle_sql | None)
REGISTRY = _LazyRegistry()


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def _events(sf_dir: str, cols) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(cols))


def _docs(sf_dir: str, cols) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(cols))


def np_lookup(keys_sorted: "np.ndarray", values: "np.ndarray",
              query: "np.ndarray"):
    """Vectorized broadcast-dict lookup: (hit_mask, values[query]).

    Replaces per-batch ``Series.map(python_dict)`` on the fact-table
    hot path (VERDICT r2 minor: tpch_q9 idiom) with one searchsorted
    per batch. ``keys_sorted`` must be sorted ascending; rows whose
    key is absent get hit=False (their value slot is arbitrary).
    """
    if len(keys_sorted) == 0:
        # all-miss, not IndexError (e.g. a dimension filter matched
        # nothing — the Series.map path this replaces returned empty)
        return (np.zeros(len(query), dtype=bool),
                np.empty(len(query), dtype=values.dtype))
    pos = np.searchsorted(keys_sorted, query)
    pos = np.minimum(pos, len(keys_sorted) - 1)
    hit = keys_sorted[pos] == query
    return hit, values[pos]
