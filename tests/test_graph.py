"""Distributed PageRank vs numpy power iteration."""

from __future__ import annotations

import numpy as np
import pandas as pd


def numpy_pagerank(edges: pd.DataFrame, n_iter: int,
                   d: float = 0.85) -> pd.DataFrame:
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = edges.groupby("src").size()
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = sum(r[idx[u]] for u in nodes if u not in deg.index)
        nr = np.full(n, (1 - d) / n + d * dang / n)
        for s, t in zip(edges["src"], edges["dst"]):
            nr[idx[t]] += d * r[idx[s]] / deg[s]
        r = nr
    return pd.DataFrame({"node": nodes, "r": r})


def test_pagerank_matches_numpy_with_dangling(ray_session):
    from webalizer_ray.stages.graph import pagerank

    edges = pd.DataFrame({"src": [0, 0, 1, 2, 2, 4],
                          "dst": [1, 2, 2, 0, 3, 0]})  # 3 is dangling
    out = pagerank(edges, n_iter=15)
    want = numpy_pagerank(edges, 15)
    assert np.allclose(out["r"], want["r"], atol=1e-9)
    assert abs(out["r"].sum() - 1.0) < 1e-9


def test_pagerank_random_graph_repartition_invariant(ray_session):
    import ray.data as rd
    from webalizer_ray.stages.graph import pagerank

    rng = np.random.default_rng(13)
    edges = pd.DataFrame({
        "src": rng.integers(0, 60, 300).astype(np.int64),
        "dst": rng.integers(0, 60, 300).astype(np.int64)})
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    out = pagerank(edges, n_iter=8)
    want = numpy_pagerank(edges, 8)
    m = out.merge(want, on="node")
    assert np.allclose(m["r_x"], m["r_y"], atol=1e-9)
    out2 = pagerank(rd.from_pandas(edges).repartition(7), n_iter=8)
    assert np.allclose(out["r"], out2["r"], atol=1e-12)


def test_pagerank_sink_attracts_mass(ray_session):
    """A node every other node links to must hold the top rank."""
    from webalizer_ray.stages.graph import pagerank

    edges = pd.DataFrame({"src": [1, 2, 3, 4, 0],
                          "dst": [0, 0, 0, 0, 1]})
    out = pagerank(edges, n_iter=20)
    assert out.loc[out["r"].idxmax(), "node"] == 0


def test_pagerank_edge_inputs(ray_session):
    """Empty edge set → empty typed frame; a lone self-loop holds all
    the mass; ranks always sum to 1 when nodes exist."""
    from webalizer_ray.stages.graph import pagerank

    empty = pagerank(pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                   "dst": pd.Series([], dtype="int64")}),
                     n_iter=2)
    assert len(empty) == 0 and list(empty.columns) == ["node", "r"]
    loop = pagerank(pd.DataFrame({"src": [5], "dst": [5]}), n_iter=3)
    assert len(loop) == 1 and abs(loop["r"].iloc[0] - 1.0) < 1e-12


def test_triangle_count_planted(ray_session):
    """K4 has 4 triangles; triangle+pendant has 1; bipartite has 0."""
    import itertools

    import pandas as pd

    from webalizer_ray.stages.graph import triangle_count

    k4 = pd.DataFrame(list(itertools.combinations(range(4), 2)),
                      columns=["id_a", "id_b"])
    assert triangle_count(k4) == {"n_nodes": 4, "n_edges": 6,
                                  "n_triangles": 4}
    tp = pd.DataFrame({"id_a": [0, 1, 2, 3], "id_b": [1, 2, 0, 0]})
    assert triangle_count(tp) == {"n_nodes": 4, "n_edges": 4,
                                  "n_triangles": 1}
    # bipartite K2,3: 6 edges, no triangles; duplicate + reversed edges
    # must not change anything
    bp = pd.DataFrame({"id_a": [0, 0, 0, 1, 1, 1, 2, 0],
                       "id_b": [2, 3, 4, 2, 3, 4, 0, 2]})
    assert triangle_count(bp) == {"n_nodes": 5, "n_edges": 6,
                                  "n_triangles": 0}
