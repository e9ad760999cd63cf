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


def grid_distance_join(points: rd.Dataset, radius: int,
                       id_col: str = "id", x_col: str = "x",
                       y_col: str = "y",
                       num_buckets: int = 64) -> rd.Dataset:
    """All pairs (id_a < id_b) with squared euclidean distance
    <= radius² over integer coordinates. Returns a Dataset of
    (id_a, id_b, dist_sq)."""
    r = int(radius)
    if r <= 0:
        raise ValueError("radius must be a positive integer")

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
