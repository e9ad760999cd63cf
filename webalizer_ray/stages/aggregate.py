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
from ray.data.aggregate import Max, Min, Sum

from webalizer_ray.config import default_partitions

# spec: out_col -> (in_col, how);  how ∈ {size, sum, min, max, nunique-free}
STD_SPEC = {
    "hits": ("ts", "size"),
    "files": ("is_file", "sum"),
    "pages": ("is_content", "sum"),
    "kb": ("kb", "sum"),
}

_FINAL_AGG = {"size": Sum, "sum": Sum, "min": Min, "max": Max}


def join_partitions(n: int = 8) -> int:
    """Hash-join partition count clamped to the session's CPU count.

    Ray's hash join spins up one shuffle-aggregator actor per
    partition; asking for more partitions than the session has CPUs
    can deadlock the actor pool on a small ``ray.init`` (measured: 32
    partitions hang under num_cpus=8 — r3; the 4-CPU verify recipe
    hung on an 8-partition join — r4). Callers pass their preferred
    fan-out and get it whenever the session is big enough."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))         if ray.is_initialized() else 8
    return max(2, min(n, cpus))


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


_FINAL_HOW = {"size": "sum", "sum": "sum", "min": "min", "max": "max"}


def key_bucket(df: pd.DataFrame, keys, num_buckets: int) -> np.ndarray:
    """Deterministic int bucket of a key tuple (SipHash, stable across
    processes — the same explicit hash partitioning used for conv_id)."""
    h = pd.util.hash_pandas_object(df[list(keys)], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def bucket_combine(partials: rd.Dataset, keys: list[str], spec: dict,
                   num_buckets: int | None = None) -> rd.Dataset:
    """Final combine of per-batch partials: int-bucket shuffle + ONE
    vectorized pandas groupby per bucket.

    This replaces ``groupby(keys).aggregate(...)`` because Ray's sort-based
    aggregate pays a Python-level comparison sort over tuple keys (measured
    ~8× slower on string keys); shuffling on a single int32 bucket keyed by
    the same hash is semantically identical (a key lives in exactly one
    bucket) and the per-bucket combine is a single pandas groupby.
    num_buckets bounds both parallelism and per-task memory; size it to
    #distinct-keys × row-width at the target scale.
    """
    num_buckets = default_partitions(num_buckets)

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = key_bucket(df, keys, num_buckets)
        return df

    agg = {out: (out, _FINAL_HOW[how]) for out, (_, how) in spec.items()}

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(list(keys), sort=False).agg(**agg).reset_index()

    return (partials.map_batches(add_h, batch_format="pandas")
            .groupby("_h").map_groups(combine, batch_format="pandas"))


def reduce_sink(ds: rd.Dataset, keys: list[str], spec: dict = STD_SPEC,
                dropna: bool = True,
                num_buckets: int | None = None) -> rd.Dataset:
    """partial-per-batch → bucketed final combine over partials only."""
    partials = ds.map_batches(make_partial_fn(keys, spec, dropna),
                              batch_format="pandas")
    return bucket_combine(partials, keys, spec, num_buckets)


def distinct_count(ds: rd.Dataset, keys: list[str], of: str,
                   alias: str = "n",
                   num_buckets: int | None = None) -> rd.Dataset:
    """Exact distinct-count of ``of`` per ``keys`` (A10), two-phase.

    per-batch dedup (big reduction) → bucket on (keys+of) → per-bucket
    global dedup + count (each (key, member) pair lives in exactly one
    bucket, so per-bucket counts are disjoint partials) → tiny final sum.
    """
    num_buckets = default_partitions(num_buckets)
    cols = keys + [of]

    def batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        # null keys and null values are excluded (pandas/SQL groupby drops
        # null keys; refmodel's groupby(dropna=True) matches)
        d = df[cols].dropna().drop_duplicates()
        d = d.copy()
        d["_h"] = key_bucket(d, cols, num_buckets)
        return d

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=cols)
        out = d.groupby(keys, sort=False).size().rename(alias).reset_index()
        out[alias] = out[alias].astype(np.int64)
        return out

    partial_counts = (ds.map_batches(batch_dedup, batch_format="pandas")
                      .groupby("_h")
                      .map_groups(bucket_count, batch_format="pandas"))
    return bucket_combine(partial_counts, keys,
                          {alias: (alias, "sum")},
                          num_buckets=8)  # fixed small fan-out: input is
    #                       already <= num_buckets x keys partial rows


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


def exact_quantiles_bounded(ds: rd.Dataset, col: str,
                            qs: list[float]) -> dict[float, float]:
    """EXACT global quantile_cont for a bounded-cardinality column
    (ints like token counts, status codes, day numbers): a value
    histogram is a lossless summary, so shuffle one (value, count) row
    per distinct value — never the column itself — and interpolate the
    order statistics from cumulative counts on the driver. Matches SQL
    quantile_cont (linear interpolation at rank q·(N-1)) to the bit.
    For unbounded/continuous columns use the t-digest sketch instead
    (sketch.py) — this is the exact path where it's affordable.
    """
    def value_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        return pd.DataFrame({col: vc.index.to_numpy(),
                             "cnt": vc.to_numpy(np.int64)})

    hist = sink_pandas(ds.map_batches(value_counts,
                                      batch_format="pandas"),
                       [col], {"cnt": ("cnt", "sum")})
    if hist.empty:      # empty input: quantiles of nothing are NaN
        return {q: float("nan") for q in qs}
    hist = hist.sort_values(col, ignore_index=True)
    vals = hist[col].to_numpy(np.float64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def order_stat(i: int) -> float:
        return float(vals[np.searchsorted(cum, i, side="right")])

    out = {}
    for q in qs:
        if n == 0:
            out[q] = float("nan")
            continue
        p = q * (n - 1)
        k = int(np.floor(p))
        frac = p - k
        lo = order_stat(k)
        out[q] = lo if frac == 0 else lo + frac * (order_stat(k + 1) - lo)
    return out


def key_skew_profile(ds: rd.Dataset, key: str) -> dict:
    """Key-skew diagnostics for partition-key selection: distinct keys,
    hottest-key count/share, Shannon entropy and Gini coefficient of
    the per-key count distribution. Per-key counts reduce as usual;
    because counts are bounded small ints, only an exact (count_value,
    frequency) HISTOGRAM leaves the cluster, and entropy/Gini are
    closed-form over it (Σ n·ln n decomposes per bucket; Gini's sorted
    rank sum has a closed form per tie block of equal counts)."""
    counts = reduce_sink(ds, [key], {"n": (key, "size")})

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n"].value_counts()
        return pd.DataFrame({"n": vc.index.to_numpy(np.int64),
                             "k_n": vc.to_numpy(np.int64)})

    h = sink_pandas(counts.map_batches(hist_partial,
                                       batch_format="pandas"),
                    ["n"], {"k_n": ("k_n", "sum")})
    if h.empty:
        return {"distinct_keys": 0, "total_rows": 0, "max_n": 0,
                "max_share": 0.0, "entropy": 0.0, "gini": 0.0}
    h = h.sort_values("n", ignore_index=True)
    n = h["n"].to_numpy(np.float64)
    k_n = h["k_n"].to_numpy(np.float64)
    tot, k = float((n * k_n).sum()), float(k_n.sum())
    entropy = float(np.log(tot) - float((k_n * n * np.log(n)).sum()) / tot)
    starts = np.concatenate(([1.0], 1.0 + np.cumsum(k_n)[:-1]))
    rank_sums = k_n * starts + k_n * (k_n - 1) / 2
    gini = float((n * (2 * rank_sums - k_n * (k + 1))).sum()) / (k * tot)
    return {"distinct_keys": int(k), "total_rows": int(tot),
            "max_n": int(n[-1]), "max_share": n[-1] / tot,
            "entropy": entropy, "gini": gini}


def sink_pandas(ds: rd.Dataset, keys: list[str], spec: dict,
                dropna: bool = True,
                num_buckets: int | None = None) -> "pd.DataFrame":
    """reduce_sink → pandas with a SCHEMA-STABLE empty: Ray's all-empty
    block path loses column names, so a zero-row result comes back as a
    named (object-dtyped) frame instead of a column-less one — callers'
    column selections and sorts keep working on empty inputs."""
    out = reduce_sink(ds, keys, spec, dropna, num_buckets).to_pandas()
    cols = list(keys) + list(spec)
    if len(out) and set(cols) <= set(out.columns):
        return out
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
