"""Top-N tables (SURVEY.md §2.6 K1–K3).

The reference loads each hash table into a pointer array and qsorts it with
per-dimension comparators (output.c:load_site_array() + qs_site_cmph /
qs_site_cmpk / qs_url_cmph / ... ≈100–400 [verify]), then emits the first
TopSites/TopURLs/... rows; Hide*-flagged nodes are skipped from the tables
but kept in totals.

Ours: the input is already a small aggregate Dataset, so ``sort + limit``
is cheap. Tie-break is made DETERMINISTIC: (metric desc, key asc) — the
reference's tie order is incidental hash/insertion order (documented
deviation, SURVEY.md §7.3 item 4). Hidden keys are filtered here, after
aggregation — never removed from totals (exactly the Hide* semantics).
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data as rd


def _hide_mask(s: pd.Series, patterns) -> pd.Series:
    if not patterns:
        return pd.Series(False, index=s.index)
    rx = re.compile("|".join(f"(?:{p})" for p in patterns))
    return s.fillna("").str.contains(rx)


def top_n(agg: rd.Dataset, key: str, metric: str, n: int,
          hide_patterns=()) -> rd.Dataset:
    """hits-desc/key-asc top-N over a (small) aggregate Dataset."""
    ds = agg
    if hide_patterns:
        rx = "|".join(f"(?:{p})" for p in hide_patterns)

        def drop_hidden(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df[key].fillna("").str.contains(rx)]

        ds = ds.map_batches(drop_hidden, batch_format="pandas")
    return ds.sort([metric, key], descending=[True, False]).limit(n)


def top_n_pandas(agg: pd.DataFrame, key: str, metric: str, n: int,
                 hide_patterns=()) -> pd.DataFrame:
    """Driver-side variant for already-materialized small aggregates."""
    f = agg[~_hide_mask(agg[key], hide_patterns)] if hide_patterns else agg
    return (f.sort_values([metric, key], ascending=[False, True],
                          kind="mergesort").head(n).reset_index(drop=True))
