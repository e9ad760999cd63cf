"""Aggregations (SURVEY.md §2.5 A1–A11) — partial-per-batch, then final.

The reference tabulates everything into in-memory hash tables and dense
counter arrays in one pass (webalizer.c t_*/tm_*/th_* counters;
hashtab.c:put_hnode()/put_unode()/... [verify]). Our re-expression is the
two-phase pattern Ray Data's groupby already uses internally, made explicit
and stronger: every sink FIRST collapses each Arrow batch to one row per
key inside ``map_batches`` (the combiner — so the all-to-all exchange
moves per-batch partials, never raw turns), THEN a small
``groupby(keys).aggregate(Sum/Min/Max)`` finalizes. This is also the skew
story: a hot key (one conversation = 20 % of all rows) contributes at most
one partial row per batch regardless of its row count, which is exactly
what salting buys for algebraic aggregates — ``salted_two_phase`` below
demonstrates the explicit salt for completeness and is property-tested
equal to the direct groupby.

Distinct counts (A10 — "sites" = distinct hosts analog) are exact
two-phase: per-batch dedup → global ``groupby(keys + [of])`` → per-batch
recount → final sum. Never approximate (parity requires exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# spec: out_col -> (in_col, how);  how ∈ {size, sum, min, max, nunique-free}
STD_SPEC = {
    "hits": ("ts", "size"),
    "files": ("is_file", "sum"),
    "pages": ("is_content", "sum"),
    "kb": ("kb", "sum"),
}

_FINAL_AGG = {"size": Sum, "sum": Sum, "min": Min, "max": Max}


def make_partial_fn(keys: list[str], spec: dict, dropna: bool = True):
    """Per-batch combiner: pandas in → one row per key out."""
    named = {out: (col, how if how != "size" else "size")
             for out, (col, how) in spec.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=dropna)
        out = g.agg(**{o: (c, h) for o, (c, h) in named.items()}).reset_index()
        for o, (c, h) in spec.items():
            if h in ("size", "sum") and df[c].dtype != np.float64:
                out[o] = out[o].astype(np.int64)
        return out

    return partial


def reduce_sink(ds: rd.Dataset, keys: list[str], spec: dict = STD_SPEC,
                dropna: bool = True) -> rd.Dataset:
    """partial-per-batch → groupby(keys).aggregate over partials only."""
    partials = ds.map_batches(make_partial_fn(keys, spec, dropna),
                              batch_format="pandas")
    aggs = [_FINAL_AGG[how](out, alias_name=out)
            for out, (_, how) in spec.items()]
    return partials.groupby(keys).aggregate(*aggs)


def distinct_count(ds: rd.Dataset, keys: list[str], of: str,
                   alias: str = "n") -> rd.Dataset:
    """Exact distinct-count of ``of`` per ``keys`` (A10), two-phase.

    per-batch dedup (big reduction) → global dedup via groupby(keys+[of])
    → per-batch partial count → final sum. All exchanges move deduped keys.
    """
    cols = keys + [of]

    def batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        # null keys and null values are excluded (pandas/SQL groupby drops
        # null keys; refmodel's groupby(dropna=True) matches)
        return df[cols].dropna().drop_duplicates()

    deduped = (ds.map_batches(batch_dedup, batch_format="pandas")
               .groupby(cols).aggregate(Count(alias_name="_c")))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, sort=False).size().rename(alias).reset_index()
        out[alias] = out[alias].astype(np.int64)
        return out

    return (deduped.map_batches(recount, batch_format="pandas")
            .groupby(keys).aggregate(Sum(alias, alias_name=alias)))


def salted_two_phase(ds: rd.Dataset, key: str, value: str,
                     salt_buckets: int = 16, alias: str = "total") -> rd.Dataset:
    """Explicit salted aggregation (SURVEY.md §4.3 item 2).

    ``groupby([key, salt]).sum`` → ``groupby(key).sum`` — the classic hot-key
    mitigation when a combiner isn't available. Property-tested equal to the
    direct groupby; ``reduce_sink`` supersedes it wherever the aggregate is
    algebraic (the per-batch combiner is a salt with B = #batches).
    """
    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, value]].copy()
        df["_salt"] = np.arange(len(df)) % salt_buckets
        return df

    phase1 = (ds.map_batches(add_salt, batch_format="pandas")
              .groupby([key, "_salt"]).aggregate(Sum(value, alias_name=alias)))
    return phase1.groupby(key).aggregate(Sum(alias, alias_name=alias))


# ---------------------------------------------------------------------------
# pandas-side finishers for the small merged sinks (run on tiny aggregates)
# ---------------------------------------------------------------------------

def merge_small(left: pd.DataFrame, right: pd.DataFrame, on, how="left",
                fill_int=()) -> pd.DataFrame:
    out = left.merge(right, on=on, how=how)
    for c in fill_int:
        out[c] = out[c].fillna(0).astype(np.int64)
    return out
