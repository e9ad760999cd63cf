"""Spatial grid join: all point pairs within a radius, exactly once.

The classic distributed spatial join (points → uniform grid cells →
only same/adjacent cells can hold a pair within ``radius``). Kept
INTEGER end-to-end so a SQL oracle can reproduce it bit-for-bit:
coordinates are integer units (e.g. milli-degrees), the predicate is
squared euclidean ``dx² + dy² <= radius²`` in int64 — no trig, no
float rounding to disagree on a boundary pair.

Meets-exactly-once construction (the 2-D generalization of the band
join's 3-bucket trick, webalizer_ray.pipelines.queries orders_nearby):

* every point lands in its HOME cell (floor division by ``radius`` —
  cell width = radius, so a qualifying pair spans at most 1 cell in
  each axis);
* every point is also REPLICATED to its 3×3 cell neighborhood;
* each cell's task joins the cell's HOME points against the
  REPLICATED points and keeps ``id_a < id_b`` — pair (a, b) with
  a.id < b.id is emitted only by a's home cell, where b is present
  exactly once (as home-or-replica), so no pair is seen twice and no
  cross-cell pair is missed.

Replication factor is a constant 9; per-cell work is the cell's
population × its neighborhood's — the job scales with density skew,
not corpus size. A degenerate hot cell (urban core) can be salted the
same way skew_join salts hot keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.config import default_partitions


def grid_distance_join(points: rd.Dataset, radius: int,
                       id_col: str = "id", x_col: str = "x",
                       y_col: str = "y",
                       num_buckets: int | None = None) -> rd.Dataset:
    """All pairs (id_a < id_b) with squared euclidean distance
    <= radius² over integer coordinates. Returns a Dataset of
    (id_a, id_b, dist_sq)."""
    r = int(radius)
    if r <= 0:
        raise ValueError("radius must be a positive integer")
    num_buckets = default_partitions(num_buckets)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        cx = np.floor_divide(x, r)
        cy = np.floor_divide(y, r)
        n = len(df)
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                out.append(pd.DataFrame({
                    "cell_x": cx + dx, "cell_y": cy + dy,
                    "home": np.full(n, dx == 0 and dy == 0),
                    "pid": df[id_col].to_numpy(np.int64),
                    "px": x, "py": y}))
        return pd.concat(out, ignore_index=True)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # one int key per cell; knuth-mix for bucket spread
        cell = (df["cell_x"].to_numpy(np.int64) * 73856093
                ^ df["cell_y"].to_numpy(np.int64) * 19349663)
        df["_cell"] = cell
        return df

    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64),
                          "dist_sq": pd.Series(dtype=np.int64)})

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (cell_x, cell_y) MAY collide into one _cell group;
        # dedup points by id (home rows first — coordinates are the
        # same on every replica, only the flag differs) so a collided
        # group can never emit a pair twice, and the distance filter
        # rejects any cross-cell pair a collision brings in (cells ≥ 2
        # apart are > radius apart by construction)
        c = g.sort_values("home", ascending=False) \
            .drop_duplicates("pid")
        home = c[c["home"]]
        if not len(home):
            return empty
        m = home.merge(c, on="_cell", suffixes=("_a", "_b"))
        m = m[m["pid_a"] < m["pid_b"]]
        if not len(m):
            return empty
        dx = m["px_a"].to_numpy(np.int64) - m["px_b"].to_numpy(np.int64)
        dy = m["py_a"].to_numpy(np.int64) - m["py_b"].to_numpy(np.int64)
        d2 = dx * dx + dy * dy
        keep = d2 <= r * r
        return pd.DataFrame({
            "id_a": m["pid_a"].to_numpy(np.int64)[keep],
            "id_b": m["pid_b"].to_numpy(np.int64)[keep],
            "dist_sq": d2[keep]})

    rep = points.map_batches(replicate, batch_format="pandas") \
        .map_batches(add_bucket, batch_format="pandas")
    return rep.groupby("_cell").map_groups(cell_pairs,
                                           batch_format="pandas")


def dbscan_labels(points: rd.Dataset, radius: int, min_pts: int = 3,
                  id_col: str = "id", x_col: str = "x",
                  y_col: str = "y") -> tuple[pd.DataFrame, int]:
    """Grid DBSCAN (Ester et al. KDD 1996) composed from the exact
    grid distance join above and connected components (dedup.py).

    A point is CORE iff its ε-neighborhood holds >= ``min_pts`` points
    (the point itself included, the textbook convention). Clusters are
    the connected components of core points under ε-adjacency, labeled
    by their min member id; BORDER points (non-core with >= 1 core
    neighbor) attach to the MIN cluster rep among their core
    neighbors — textbook DBSCAN leaves multi-cluster border ties
    scan-order-dependent; the min rule makes the labeling
    deterministic and SQL-checkable. Everything heavy stays
    distributed: the pair set never gathers, degrees reduce as
    (id, n) partials, border assignment reduces as (node, rep) min
    partials. The core-id set and core→rep map broadcast once
    (``ray.put`` — the sparse-map pattern shared with the
    leakage-safe split); at extreme core cardinality swap them for
    the co-partitioned tagged-union merge CC itself uses.

    Returns ``(member, n_noise)``: member has one (node, rep) row per
    clustered point (core + border); noise = everything else.
    """
    import ray

    from webalizer_ray.stages.aggregate import reduce_sink
    from webalizer_ray.stages.dedup import connected_components

    n_total = points.count()
    pairs = grid_distance_join(points, radius, id_col=id_col,
                               x_col=x_col, y_col=y_col).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["id_a"].to_numpy(np.int64),
                              df["id_b"].to_numpy(np.int64)])
        return pd.DataFrame({"id": ids,
                             "n": np.ones(len(ids), np.int64)})

    deg = reduce_sink(pairs.map_batches(endpoints,
                                        batch_format="pandas"),
                      ["id"], {"n": ("n", "sum")}) \
        .filter(expr=f"n >= {min_pts - 1}").to_pandas()
    empty = pd.DataFrame({"node": pd.Series(dtype=np.int64),
                          "rep": pd.Series(dtype=np.int64)})
    if not len(deg):                 # no core points: all noise
        return empty, int(n_total)
    core_ids = np.sort(deg["id"].to_numpy(np.int64))
    core_ref = ray.put(core_ids)

    def core_edges(df: pd.DataFrame) -> pd.DataFrame:
        core = ray.get(core_ref)
        a = df["id_a"].to_numpy(np.int64)
        b = df["id_b"].to_numpy(np.int64)
        m = np.isin(a, core) & np.isin(b, core)
        return pd.DataFrame({"id_a": a[m], "id_b": b[m]})

    comp = connected_components(
        pairs.map_batches(core_edges, batch_format="pandas").to_pandas())
    # isolated core points (no core neighbor) are singleton clusters
    rep = core_ids.copy()
    if len(comp):
        pos = np.searchsorted(core_ids, comp["node"].to_numpy(np.int64))
        rep[pos] = comp["cluster_id"].to_numpy(np.int64)
    rep_ref = ray.put(rep)

    def border_cand(df: pd.DataFrame) -> pd.DataFrame:
        core = ray.get(core_ref)
        reps = ray.get(rep_ref)
        a = df["id_a"].to_numpy(np.int64)
        b = df["id_b"].to_numpy(np.int64)
        ca, cb = np.isin(a, core), np.isin(b, core)
        m1 = ca & ~cb                # a core, b border candidate
        m2 = cb & ~ca
        node = np.concatenate([b[m1], a[m2]])
        neigh = np.concatenate([a[m1], b[m2]])
        return pd.DataFrame({
            "node": node,
            "rep": reps[np.searchsorted(core, neigh)]})

    border = reduce_sink(pairs.map_batches(border_cand,
                                           batch_format="pandas"),
                         ["node"], {"rep": ("rep", "min")}).to_pandas()
    member = pd.DataFrame({"node": core_ids, "rep": rep})
    if len(border):
        member = pd.concat(
            [member, border[["node", "rep"]].astype(np.int64)],
            ignore_index=True)
    return member, int(n_total - len(member))
