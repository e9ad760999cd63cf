"""Level-wise frequent-itemset mining (A-Priori, Agrawal & Srikant,
VLDB 1994): triples of items co-occurring in at least ``num/den`` of
all baskets.

Scale shape — the textbook distributed A-Priori layout:

* Baskets are co-located by a basket-id hash, so per-bucket distinct
  (basket, item) rows are globally distinct and every expansion is ONE
  vectorized self-merge inside the bucket; only (items..., n) count
  partials ever shuffle.
* Pass 1 counts pairs; the bucket's basket count rides the same reduce
  as a sentinel row, so the relative threshold needs no extra pass.
* Only the FREQUENT pairs broadcast into pass 2 (downward closure:
  every 2-subset of a frequent triple is frequent), where the triple
  expansion keeps a candidate only when all three sub-pairs are
  frequent — fan-out tracks the true frequent set, not |items|³.
* Thresholds compare by integer cross-multiplication
  (den·support >= num·n_baskets): no float share to disagree with a
  SQL oracle.

The unpruned triple self-join with the same HAVING produces identical
output (downward closure), which is exactly what the SQL oracles run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from webalizer_ray.config import default_partitions

_SENTINEL = "\x00baskets"


def frequent_triples(rows: rd.Dataset, basket_col: str = "basket",
                     item_col: str = "item", num: int = 1, den: int = 2,
                     num_buckets: int | None = None) -> pd.DataFrame:
    """Frequent 3-itemsets over ``rows`` of (basket_id, item).

    ``basket_col`` must be integer (hash co-location key); rows need
    not be pre-deduplicated. Returns (item_a, item_b, item_c, support)
    for every item triple present in >= num/den of all baskets, items
    ordered a < b < c, sorted.
    """
    from webalizer_ray.stages.aggregate import reduce_sink

    num_buckets = default_partitions(num_buckets)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "sid": df[basket_col].to_numpy(np.int64),
            "t": df[item_col].to_numpy(),
            "bucket_": (df[basket_col].to_numpy(np.int64)
                        % num_buckets).astype(np.int32)})

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["sid", "t"]].drop_duplicates()
        m = d.merge(d, on="sid")
        m = m[m["t_x"] < m["t_y"]]
        c = m.groupby(["t_x", "t_y"], sort=False).size() \
            .rename("n").reset_index()
        c = pd.concat([c, pd.DataFrame(
            {"t_x": [_SENTINEL], "t_y": [""],
             "n": [d["sid"].nunique()]})], ignore_index=True)
        c["n"] = c["n"].astype(np.int64)
        return c

    bucketed = rows.map_batches(with_bucket,
                                batch_format="pandas").materialize()
    p1 = reduce_sink(bucketed.groupby("bucket_")
                     .map_groups(pair_partials, batch_format="pandas"),
                     ["t_x", "t_y"], {"n": ("n", "sum")}).to_pandas()
    n_baskets = int(p1.loc[p1["t_x"] == _SENTINEL, "n"].iloc[0])
    freq = p1[(p1["t_x"] != _SENTINEL)
              & (den * p1["n"] >= num * n_baskets)][["t_x", "t_y"]]
    empty = pd.DataFrame({"item_a": pd.Series(dtype=object),
                          "item_b": pd.Series(dtype=object),
                          "item_c": pd.Series(dtype=object),
                          "support": pd.Series(dtype=np.int64)})
    if not len(freq):
        return empty
    freq_ref = ray.put(freq.reset_index(drop=True))

    def triple_partials(g: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(freq_ref)
        d = g[["sid", "t"]].drop_duplicates()
        # items outside every frequent pair can't be in a frequent triple
        alive = np.union1d(f["t_x"].to_numpy(), f["t_y"].to_numpy())
        d = d[d["t"].isin(alive)]
        m2 = d.merge(d, on="sid")
        m2 = m2[m2["t_x"] < m2["t_y"]]
        m2 = m2.merge(f, on=["t_x", "t_y"])          # (a,b) frequent
        m3 = m2.merge(d.rename(columns={"t": "t_z"}), on="sid")
        m3 = m3[m3["t_y"] < m3["t_z"]]
        m3 = m3.merge(f.rename(columns={"t_x": "t_y", "t_y": "t_z"}),
                      on=["t_y", "t_z"])             # (b,c) frequent
        m3 = m3.merge(f.rename(columns={"t_y": "t_z"}),
                      on=["t_x", "t_z"])             # (a,c) frequent
        c = m3.groupby(["t_x", "t_y", "t_z"], sort=False).size() \
            .rename("n").reset_index()
        c["n"] = c["n"].astype(np.int64)
        return c

    p2 = reduce_sink(bucketed.groupby("bucket_")
                     .map_groups(triple_partials,
                                 batch_format="pandas"),
                     ["t_x", "t_y", "t_z"],
                     {"support": ("n", "sum")}).to_pandas()
    if not len(p2):
        return empty
    p2 = p2[den * p2["support"] >= num * n_baskets]
    out = p2.rename(columns={"t_x": "item_a", "t_y": "item_b",
                             "t_z": "item_c"})
    out["support"] = out["support"].astype(np.int64)
    return out.sort_values(["item_a", "item_b", "item_c"],
                           ignore_index=True)
