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
    exact_quantiles_bounded,
    reduce_sink,
    salted_two_phase,
)
from webalizer_ray.stages.topn import top_n_pandas


class _LazyRegistry(dict):
    """name -> (ray_callable, oracle_sql|None); self-populating.

    The query registry spans ~16 chunk modules under
    ``pipelines/queries/``.  Importing the package is near-free; the
    first READ access (lookup/iteration/len) triggers a one-time import
    of every chunk module via the loader installed by ``__init__``.
    Writes (``register``) never trigger loading, so chunk modules can be
    imported individually (e.g. by Ray workers deserializing a single
    query function) without paying for the whole registry.
    """

    _loader = None

    def _ensure(self):
        if self._loader is not None:
            loader, self._loader = self._loader, None
            loader()

    def __getitem__(self, k):
        self._ensure()
        return dict.__getitem__(self, k)

    def __contains__(self, k):
        self._ensure()
        return dict.__contains__(self, k)

    def __iter__(self):
        self._ensure()
        return dict.__iter__(self)

    def __len__(self):
        self._ensure()
        return dict.__len__(self)

    def get(self, k, default=None):
        self._ensure()
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
    pos = np.searchsorted(keys_sorted, query)
    pos = np.minimum(pos, len(keys_sorted) - 1)
    hit = keys_sorted[pos] == query
    return hit, values[pos]
