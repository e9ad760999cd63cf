"""bfs_levels (stages/graph.py): hand-built graphs with known hop
distances, depth cap, early exit, multi-source min semantics,
directedness, and layout invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.stages.graph import bfs_levels


def _undirected(pairs):
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    return pd.concat([df, df.rename(columns={"src": "dst",
                                             "dst": "src"})],
                     ignore_index=True)


def _levels(edges, roots, **kw):
    out = bfs_levels(edges, roots, **kw).to_pandas()
    return dict(zip(out["node"].astype(int),
                    out["level"].astype(int)))


def test_chain_levels(ray_session):
    # 0-1-2-3-4 chain from root 0
    got = _levels(_undirected([(i, i + 1) for i in range(4)]), [0])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_depth_cap_and_unreachable(ray_session):
    edges = _undirected([(i, i + 1) for i in range(9)]
                        + [(100, 101)])  # disconnected component
    got = _levels(edges, [0], max_depth=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert 100 not in got and 4 not in got


def test_multi_source_takes_min(ray_session):
    # chain 0..6; roots at both ends -> middle node's level is min
    got = _levels(_undirected([(i, i + 1) for i in range(6)]), [0, 6])
    assert got[3] == 3 and got[1] == 1 and got[5] == 1


def test_directed_edges_respected(ray_session):
    # 0 -> 1 -> 2 with NO reverse edges: from root 2 nothing reachable
    df = pd.DataFrame([(0, 1), (1, 2)], columns=["src", "dst"])
    got = _levels(df, [2])
    assert got == {2: 0}


def test_layout_invariance(ray_session):
    rng = np.random.RandomState(11)
    e = _undirected([(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
                     for _ in range(80)])
    a = _levels(rd.from_pandas(e).repartition(1), [0, 1])
    b = _levels(rd.from_pandas(e).repartition(7), [0, 1])
    assert a == b


def test_cycle_terminates_early(ray_session):
    got = _levels(_undirected([(0, 1), (1, 2), (2, 0)]), [0],
                  max_depth=50)
    assert got == {0: 0, 1: 1, 2: 1}


# ------------------------------------------------------------- SSSP

from webalizer_ray.stages.graph import sssp_distances


def _w_undirected(triples):
    df = pd.DataFrame(triples, columns=["src", "dst", "w"])
    return pd.concat([df, df.rename(columns={"src": "dst",
                                             "dst": "src"})],
                     ignore_index=True)


def _dists(edges, roots, **kw):
    out = sssp_distances(edges, roots, **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["dist"].astype(int)))


def test_sssp_weighted_chain(ray_session):
    got = _dists(_w_undirected([(0, 1, 5), (1, 2, 7), (2, 3, 1)]), [0])
    assert got == {0: 0, 1: 5, 2: 12, 3: 13}


def test_sssp_lighter_longer_path_wins(ray_session):
    # direct 0->2 costs 10; via 1 costs 2+3=5 (needs 2 relax rounds)
    got = _dists(_w_undirected([(0, 2, 10), (0, 1, 2), (1, 2, 3)]), [0])
    assert got[2] == 5


def test_sssp_hop_cap_blocks_long_light_path(ray_session):
    # light 3-hop path (total 3) vs heavy 1-hop (total 100): with
    # max_hops=2 only the heavy edge is reachable
    e = _w_undirected([(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 100)])
    assert _dists(e, [0], max_hops=2)[3] == 100
    assert _dists(e, [0], max_hops=3)[3] == 3


def test_sssp_late_improvement_repropagates(ray_session):
    # round 1 reaches C heavy (10); round 2 improves C via B (4);
    # the improvement must re-expand so D sees 4+1, not 11
    e = _w_undirected([(0, 2, 10), (0, 1, 2), (1, 2, 2), (2, 3, 1)])
    got = _dists(e, [0])
    assert got[2] == 4 and got[3] == 5


def test_sssp_multi_source_and_directed(ray_session):
    df = pd.DataFrame([(0, 1, 4), (5, 1, 1)],
                      columns=["src", "dst", "w"])  # directed only
    got = _dists(df, [0, 5])
    assert got == {0: 0, 5: 0, 1: 1}


def test_sssp_layout_invariance(ray_session):
    rng = np.random.RandomState(3)
    e = _w_undirected([(int(rng.randint(0, 30)),
                        int(rng.randint(0, 30)),
                        int(rng.randint(1, 9))) for _ in range(60)])
    a = _dists(rd.from_pandas(e).repartition(1), [0, 1])
    b = _dists(rd.from_pandas(e).repartition(6), [0, 1])
    assert a == b


def test_superstep_block_counts_stay_bounded(ray_session):
    """r4 regression pin, kept under the r5 shard-actor engine: on a
    MULTI-BLOCK edge Dataset the result block count must stay bounded
    by the shard fan-out (the r4 Dataset supersteps doubled blocks
    every round before the repartition fix — 34→100→…→1024 blocks,
    turning a 6-s BFS into 35 minutes). The engine returns one state
    slice per shard, so the materialized block count is the direct
    observable (B = config.default_partitions(per_cpu=1) = 8 on the
    4-cpu test session)."""
    from webalizer_ray.stages.graph import bfs_levels, sssp_distances

    rng = np.random.RandomState(7)
    n = 400
    edges = pd.DataFrame({
        "src": rng.randint(0, n, 3000).astype(np.int64),
        "dst": rng.randint(0, n, 3000).astype(np.int64)})
    e32 = rd.from_pandas(edges).repartition(32).materialize()
    st = bfs_levels(e32, roots=[0, 1], max_depth=6).materialize()
    assert st.num_blocks() <= 8
    # and the result equals the single-block run
    one = bfs_levels(rd.from_pandas(edges), roots=[0, 1], max_depth=6)
    a = st.to_pandas().sort_values("node", ignore_index=True)
    b = one.to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)

    edges["w"] = rng.randint(1, 9, 3000).astype(np.int64)
    e32w = rd.from_pandas(edges).repartition(32).materialize()
    stw = sssp_distances(e32w, roots=[0, 1], max_hops=5).materialize()
    assert stw.num_blocks() <= 8
    onew = sssp_distances(rd.from_pandas(edges), roots=[0, 1],
                          max_hops=5)
    aw = stw.to_pandas().sort_values("node", ignore_index=True)
    bw = onew.to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(aw, bw)
