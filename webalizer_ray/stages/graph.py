"""Distributed PageRank (power iteration over an edge Dataset).

Third member of the iterative-algorithm family (with spherical k-means
in ann.py and connected components in dedup.py): per iteration the
rank table is NEVER gathered on the driver — edge contributions are
resolved by the same co-partitioned union+groupby message passing the
components op uses (a node's rank row and every edge leaving it land
in one hash bucket, one vectorized merge per bucket), then a second
groupby sums contributions per destination. The only thing the driver
sees per superstep is ONE scalar (the dangling mass, itself a
distributed filter+sum); edge weights (1/outdeg) are computed once and
reused across all iterations, and the static dangling flag rides the
rank rows through the per-node aggregate (Max) so no re-join is needed.

Standard formulation (Page et al. 1999; dangling mass redistributed
uniformly):  r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)
where D = Σ ranks of dangling (no-outlink) nodes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Sum

_MSG_SCHEMA = pa.schema([("_h", pa.int32()), ("key", pa.int64()),
                         ("dst", pa.int64()), ("w", pa.float64()),
                         ("tag", pa.int8())])
#: rank rows carry the STATIC dangling flag so it survives groupbys
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("r", pa.float64()),
                          ("dang", pa.int8())])


def _bucket(key: np.ndarray, num_partitions: int) -> np.ndarray:
    return (((key.astype(np.uint64) * np.uint64(2654435761))
             >> np.uint64(7)) % np.uint64(num_partitions)).astype(np.int32)


def pagerank(edges: rd.Dataset | pd.DataFrame, damping: float = 0.85,
             n_iter: int = 10, src_col: str = "src",
             dst_col: str = "dst",
             num_partitions: int = 8) -> pd.DataFrame:
    """(node, rank) for every node appearing in ``edges``; ranks sum
    to 1. Deterministic given the edge set up to per-bucket float
    association (parity vs a numpy reference is tested to 1e-9)."""
    if isinstance(edges, pd.DataFrame):
        if not len(edges):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "r": pd.Series(dtype=np.float64)})
        edges = rd.from_pandas(edges[[src_col, dst_col]])

    # ---- static prep (once): nodes, outdegrees, edge weights --------
    def node_rows(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            np.asarray(b[src_col], dtype=np.int64),
            np.asarray(b[dst_col], dtype=np.int64)]))
        return pa.table({"node": n})

    from ray.data.aggregate import Count
    nodes = (edges.map_batches(node_rows, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .repartition(num_partitions).materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "r": pd.Series(dtype=np.float64)})

    def deg_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(b[src_col], dtype=np.int64),
                         return_counts=True)
        return pa.table({"node": u, "d": c.astype(np.int64)})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d"))
           .materialize())

    # weighted edges (w = 1/outdeg(src)) via one bucketed merge of the
    # degree table against the raw edges — static across iterations
    def edge_msgs(b: pa.Table) -> pa.Table:
        s = np.asarray(b[src_col], dtype=np.int64)
        d = np.asarray(b[dst_col], dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(_bucket(s, num_partitions)), pa.array(s),
             pa.array(d), pa.array(np.zeros(len(s))),
             pa.array(np.ones(len(s), dtype=np.int8))],
            schema=_MSG_SCHEMA)

    def deg_msgs(b: pa.Table) -> pa.Table:
        n = np.asarray(b["node"], dtype=np.int64)
        d = np.asarray(b["d"], dtype=np.float64)
        return pa.Table.from_arrays(
            [pa.array(_bucket(n, num_partitions)), pa.array(n),
             pa.array(np.zeros(len(n), dtype=np.int64)),
             pa.array(1.0 / d),
             pa.array(np.zeros(len(n), dtype=np.int8))],
            schema=_MSG_SCHEMA)

    def weigh(g: pd.DataFrame) -> pa.Table:
        t = g[g["tag"] == 0][["key", "w"]]
        e = g[g["tag"] == 1][["key", "dst"]]
        m = e.merge(t, on="key")
        return pa.Table.from_arrays(
            [pa.array(_bucket(m["key"].to_numpy(np.int64),
                              num_partitions)),
             pa.array(m["key"].to_numpy(np.int64)),
             pa.array(m["dst"].to_numpy(np.int64)),
             pa.array(m["w"].to_numpy(np.float64)),
             pa.array(np.ones(len(m), dtype=np.int8))],
            schema=_MSG_SCHEMA)

    wedges = (edges.map_batches(edge_msgs, batch_format="pyarrow")
              .union(deg.map_batches(deg_msgs, batch_format="pyarrow"))
              .groupby("_h").map_groups(weigh, batch_format="pandas")
              .repartition(num_partitions).materialize())

    # static dangling flag via one union+groupby: max(tag)=0 → no outlink
    def node_tag(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "t": pa.array(np.zeros(b.num_rows, np.int8))})

    def deg_tag(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "t": pa.array(np.ones(b.num_rows, np.int8))})

    flags = (nodes.map_batches(node_tag, batch_format="pyarrow")
             .union(deg.map_batches(deg_tag, batch_format="pyarrow"))
             .groupby("node").aggregate(Max("t", alias_name="t")))

    def init_ranks(b: pa.Table) -> pa.Table:
        n = np.asarray(b["node"], dtype=np.int64)
        dang = (1 - np.asarray(b["t"], dtype=np.int8)).astype(np.int8)
        return pa.Table.from_arrays(
            [pa.array(n), pa.array(np.full(len(n), 1.0 / n_nodes)),
             pa.array(dang)], schema=_RANK_SCHEMA)

    ranks = flags.map_batches(init_ranks, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    # zero-contribution base rows keep every node (and its flag) alive
    # through the per-iteration sum — isolated/dangling nodes included
    base = ranks.map_batches(
        lambda b: pa.Table.from_arrays(
            [b["node"], pa.array(np.zeros(b.num_rows)), b["dang"]],
            schema=_RANK_SCHEMA),
        batch_format="pyarrow").materialize()

    def rank_msgs(b: pa.Table) -> pa.Table:
        n = np.asarray(b["node"], dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(_bucket(n, num_partitions)), pa.array(n),
             pa.array(np.zeros(len(n), dtype=np.int64)),
             pa.array(np.asarray(b["r"], dtype=np.float64)),
             pa.array(np.zeros(len(n), dtype=np.int8))],
            schema=_MSG_SCHEMA)

    def contribute(g: pd.DataFrame) -> pa.Table:
        t = g[g["tag"] == 0][["key", "w"]].rename(columns={"w": "r"})
        e = g[g["tag"] == 1]
        m = e.merge(t, on="key")
        return pa.Table.from_arrays(
            [pa.array(m["dst"].to_numpy(np.int64)),
             pa.array((m["w"] * m["r"]).to_numpy(np.float64)),
             pa.array(np.zeros(len(m), dtype=np.int8))],
            schema=_RANK_SCHEMA)

    for _ in range(n_iter):
        # dangling mass: distributed filter+sum, ONE scalar to driver
        dangling = ranks.filter(expr="dang == 1").sum("r") or 0.0
        shift = (1.0 - damping) / n_nodes \
            + damping * dangling / n_nodes
        contrib = (wedges.union(
            ranks.map_batches(rank_msgs, batch_format="pyarrow"))
            .groupby("_h").map_groups(contribute,
                                      batch_format="pandas"))
        summed = (contrib.union(base).groupby("node")
                  .aggregate(Sum("r", alias_name="r"),
                             Max("dang", alias_name="dang")))

        def apply_shift(b: pa.Table, _s=shift) -> pa.Table:
            return pa.Table.from_arrays(
                [b["node"],
                 pa.array(_s + damping
                          * np.asarray(b["r"], dtype=np.float64)),
                 pa.array(np.asarray(b["dang"], dtype=np.int8))],
                schema=_RANK_SCHEMA)

        ranks = summed.map_batches(apply_shift, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    out = ranks.to_pandas()[["node", "r"]].astype({"node": np.int64})
    return out.sort_values("node", ignore_index=True)
