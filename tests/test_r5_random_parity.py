"""r5 random-input parity pins.

Two of this round's oracle conversions and the shard-actor graph
engine get verified on RANDOM data, not just the driver fixture —
the discipline test_strhash set for the r4 dedup oracles:

* markov_removal_attribution: engine (32-step Neumann, left-fold
  sums) vs its own generated DuckDB oracle on random event streams.
* bfs_levels / sssp_distances: shard-actor engine vs a brute-force
  numpy Bellman-Ford reference on random directed weighted graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.mark.parametrize("seed,n_users,n_events", [(11, 40, 1200),
                                                   (12, 5, 300)])
def test_markov_removal_engine_matches_oracle_on_random_events(
        ray_session, tmp_path, seed, n_users, n_events):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines import queries as Q

    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ev = pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n_events),
        # gaps up to 2h so the 30-min session rule actually splits
        "ts": ts0 + np.cumsum(rng.integers(1, 7200, n_events)
                              ).astype("timedelta64[s]").astype(
                                  "timedelta64[us]"),
        "event_type": rng.choice(
            ["view", "click", "signup", "purchase", "error"], n_events,
            p=[0.4, 0.3, 0.1, 0.1, 0.1]),
        "value": rng.random(n_events).round(2) * 100,
        "props": "{}",
    }).sort_values(["user_id", "ts"], ignore_index=True)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   sf / "events.parquet")

    fn, sql = Q.REGISTRY["markov_removal_attribution"][:2]
    ours = fn(str(sf))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    ref = con.sql(sql).df()
    assert len(ours) == len(ref) and len(ours) > 0
    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False, atol=1e-9, rtol=0)


def _ref_sssp(edges: pd.DataFrame, roots, max_hops: int) -> dict:
    """Plain Bellman-Ford over ≤ max_hops-edge paths."""
    import collections
    dist = {int(r): 0 for r in roots}
    adj = collections.defaultdict(list)
    for s, d, w in edges.itertuples(index=False):
        adj[int(s)].append((int(d), int(w)))
    for _ in range(max_hops):
        nd = dict(dist)
        for u, du in dist.items():
            for v, w in adj[u]:
                if v not in nd or du + w < nd[v]:
                    nd[v] = du + w
        if nd == dist:
            break
        dist = nd
    return dist


@pytest.mark.parametrize("seed,n,m", [(21, 60, 300), (22, 250, 900)])
def test_superstep_engine_matches_bruteforce(ray_session, seed, n, m):
    from webalizer_ray.stages.graph import bfs_levels, sssp_distances

    rng = np.random.default_rng(seed)
    edges = pd.DataFrame({
        "src": rng.integers(0, n, m).astype(np.int64),
        "dst": rng.integers(0, n, m).astype(np.int64),
        "w": rng.integers(1, 20, m).astype(np.int64)})
    roots = [0, 1, int(n // 2)]

    got = sssp_distances(rd.from_pandas(edges).repartition(9),
                         roots, max_hops=8).to_pandas()
    want = _ref_sssp(edges, roots, 8)
    assert dict(zip(got["node"].astype(int),
                    got["dist"].astype(int))) == want

    unit = edges.assign(w=1)
    gotb = bfs_levels(rd.from_pandas(unit[["src", "dst"]]),
                      roots, max_depth=8).to_pandas()
    wantb = _ref_sssp(unit, roots, 8)
    assert dict(zip(gotb["node"].astype(int),
                    gotb["level"].astype(int))) == wantb
