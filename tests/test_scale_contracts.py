"""Corpus-scale return contracts (VERDICT r2 item 1): the library
paths of the dedup / graph stages must hand results back as
``ray.data.Dataset`` (or partitioned Parquet via ``out_dir``), never
as an O(corpus)-row driver object. The pandas-returning wrappers
remain the sf-scale *query* contract only; these tests pin that the
Dataset variants (a) exist, (b) agree with the wrappers, and (c) the
``out_dir`` sinks round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd


def _pairs():
    return pd.DataFrame({"id_a": [1, 2, 5, 7, 10],
                         "id_b": [2, 3, 6, 7, 11]})


def test_connected_components_ds_matches_wrapper(ray_session, tmp_path):
    from webalizer_ray.stages.dedup import (
        connected_components,
        connected_components_ds,
    )

    want = connected_components(_pairs())
    ds = connected_components_ds(rd.from_pandas(_pairs()))
    assert isinstance(ds, rd.Dataset)
    got = ds.to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)

    out = str(tmp_path / "cc")
    connected_components_ds(rd.from_pandas(_pairs()), out_dir=out)
    disk = pq.read_table(out).to_pandas() \
        .sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(disk, want)


def test_pagerank_ds_matches_wrapper(ray_session, tmp_path):
    from webalizer_ray.stages.graph import pagerank, pagerank_ds

    edges = pd.DataFrame({"src": [1, 2, 3, 3], "dst": [2, 3, 1, 4]})
    want = pagerank(edges, n_iter=8)
    ds = pagerank_ds(rd.from_pandas(edges), n_iter=8)
    assert isinstance(ds, rd.Dataset)
    got = ds.to_pandas().sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, atol=1e-12, rtol=0)

    out = str(tmp_path / "pr")
    pagerank_ds(rd.from_pandas(edges), n_iter=8, out_dir=out)
    disk = pq.read_table(out).to_pandas() \
        .sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(disk, want, atol=1e-12, rtol=0)


def test_bfs_and_sssp_return_datasets(ray_session):
    from webalizer_ray.stages.graph import bfs_levels, sssp_distances

    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    lv = bfs_levels(rd.from_pandas(edges), roots=[0])
    assert isinstance(lv, rd.Dataset)
    got = lv.to_pandas().set_index("node")["level"].to_dict()
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    w = edges.assign(w=[1.0, 2.0, 4.0])
    dist = sssp_distances(rd.from_pandas(w), roots=[0])
    assert isinstance(dist, rd.Dataset)
    got = dist.to_pandas().set_index("node")["dist"].to_dict()
    assert got == {0: 0.0, 1: 1.0, 2: 3.0, 3: 7.0}


def test_bfs_sssp_out_dir_sinks(ray_session, tmp_path):
    from webalizer_ray.stages.graph import bfs_levels, sssp_distances

    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    out = str(tmp_path / "bfs")
    bfs_levels(rd.from_pandas(edges), roots=[0], out_dir=out)
    disk = pq.read_table(out).to_pandas().set_index("node")["level"]         .to_dict()
    assert disk == {0: 0, 1: 1, 2: 2, 3: 3}

    w = edges.assign(w=[1.0, 2.0, 4.0])
    out = str(tmp_path / "sssp")
    sssp_distances(rd.from_pandas(w), roots=[0], out_dir=out)
    disk = pq.read_table(out).to_pandas().set_index("node")["dist"]         .to_dict()
    assert disk == {0: 0.0, 1: 1.0, 2: 3.0, 3: 7.0}


def test_incremental_minhash_dedup_dataset_contract(ray_session,
                                                    tmp_path):
    from webalizer_ray.stages.dedup import incremental_minhash_dedup

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    run_a = docs.iloc[:120].copy()
    novel = docs.iloc[120:180].copy()
    dups = docs.iloc[:10].copy()
    dups["doc_id"] = dups["doc_id"] + 100_000
    dups["text"] = dups["text"] + " zz"
    run_b = pd.concat([novel, dups], ignore_index=True)

    store = str(tmp_path / "store")
    out_a = str(tmp_path / "kept_a")
    kept_a, drops_a = incremental_minhash_dedup(
        rd.from_pandas(run_a), store, "a", threshold=0.5, out_dir=out_a)
    assert isinstance(kept_a, rd.Dataset)
    assert isinstance(drops_a, rd.Dataset)
    assert kept_a.count() == 120 and drops_a.count() == 0
    # out_dir sink == returned Dataset
    assert (set(pq.read_table(out_a)["doc_id"].to_pylist())
            == set(run_a["doc_id"]))

    out_b = str(tmp_path / "kept_b")
    kept_b, drops_b = incremental_minhash_dedup(
        rd.from_pandas(run_b), store, "b", threshold=0.5, out_dir=out_b)
    kb = kept_b.to_pandas()
    db = drops_b.to_pandas()
    # the synthetic corpus contains ORGANIC near-dups across the a/b
    # split (e.g. doc 174 is an exact dup of doc 99), so assert set
    # algebra rather than exact membership: every planted dup drops,
    # kept + dropped partition run_b, and the sink equals the Dataset.
    assert set(dups["doc_id"]) <= set(db["doc_id"])
    assert set(kb["doc_id"]) | set(db["doc_id"]) == set(run_b["doc_id"])
    assert not (set(kb["doc_id"]) & set(db["doc_id"]))
    assert (set(pq.read_table(out_b)["doc_id"].to_pylist())
            == set(kb["doc_id"]))
    # per-id best match is unique, and planted dups match their source
    assert db["doc_id"].is_unique
    back = dict(zip(db["doc_id"], db["matched_id"]))
    for did in dups["doc_id"]:
        assert back[did] == did - 100_000


def test_incremental_exact_dedup_returns_dataset(ray_session, tmp_path):
    from webalizer_ray.stages.dedup import incremental_exact_dedup

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).iloc[:100]
    kept = incremental_exact_dedup(
        rd.from_pandas(docs), str(tmp_path / "store"), "a",
        str(tmp_path / "out"))
    assert isinstance(kept, rd.Dataset)
    assert kept.count() <= 100


def test_triangle_count_scalars_only(ray_session):
    from webalizer_ray.stages.graph import triangle_count

    edges = pd.DataFrame({"id_a": [1, 2, 3, 3, 4],
                          "id_b": [2, 3, 1, 4, 5]})
    st = triangle_count(edges)
    assert st == {"n_nodes": 5, "n_edges": 5, "n_triangles": 1}


def test_pair_generators_dataset_contract(ray_session, tmp_path):
    """The LSH pair generators and SemDeDup/k-means hand back Datasets
    (+out_dir Parquet) at corpus scale; pandas stays the sf-scale
    query contract."""
    import ray.data as rd

    from webalizer_ray.stages.ann import kmeans_fit_assign
    from webalizer_ray.stages.dedup import (
        cosine_dup_pairs_lsh,
        minhash_lsh_pairs,
        semantic_dedup,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).iloc[:200]
    want = minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.5)
    out = str(tmp_path / "mh")
    got = minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.5,
                            as_dataset=True, out_dir=out)
    assert isinstance(got, rd.Dataset)
    gp = got.to_pandas().sort_values(["id_a", "id_b"],
                                     ignore_index=True)
    pd.testing.assert_frame_equal(gp, want)
    disk = pq.read_table(out).to_pandas().sort_values(
        ["id_a", "id_b"], ignore_index=True)
    pd.testing.assert_frame_equal(disk, want)

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    # threshold low enough that sf0.001 yields pairs (an all-empty
    # Dataset's blocks lose their schema — documented caveat)
    want = cosine_dup_pairs_lsh(emb, threshold=0.3)
    assert len(want) > 0
    got = cosine_dup_pairs_lsh(emb, threshold=0.3, as_dataset=True)
    assert isinstance(got, rd.Dataset)
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values(["id_a", "id_b"],
                                    ignore_index=True), want)

    want = semantic_dedup(emb, threshold=0.4, n_clusters=4)
    got = semantic_dedup(emb, threshold=0.4, n_clusters=4,
                         as_dataset=True)
    assert isinstance(got, rd.Dataset)
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values("vec_id", ignore_index=True), want)

    want = kmeans_fit_assign(emb, n_clusters=4)
    got = kmeans_fit_assign(emb, n_clusters=4, as_dataset=True)
    assert isinstance(got, rd.Dataset)
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values("vec_id", ignore_index=True), want)


def test_knn_graph_dataset_contract(ray_session, tmp_path):
    """r4 (VERDICT r3 item 1): knn_graph and knn_graph_lsh hand the
    O(N·k) edge set back as a Dataset / out_dir Parquet; the pandas
    return stays bit-identical; and the BFS/SSSP consumers in q03
    stream edges without any driver-side pandas assembly (pinned by
    source inspection — the old pattern concatenated numpy arrays on
    the driver)."""
    import inspect

    from webalizer_ray.stages.ann import knn_graph, knn_graph_lsh

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    want = knn_graph(emb, k=2)
    assert len(want) > 0
    got = knn_graph(emb, k=2, as_dataset=True)
    assert isinstance(got, rd.Dataset)
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values(["node", "rank"],
                                    ignore_index=True), want)
    out = str(tmp_path / "knn")
    knn_graph(emb, k=2, out_dir=out)
    disk = pq.read_table(out).to_pandas().sort_values(
        ["node", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(disk, want)

    want = knn_graph_lsh(emb, k=2, n_planes=5, n_tables=128)
    got = knn_graph_lsh(emb, k=2, n_planes=5, n_tables=128,
                        as_dataset=True)
    assert isinstance(got, rd.Dataset)
    pd.testing.assert_frame_equal(
        got.to_pandas().sort_values(["node", "rank"],
                                    ignore_index=True), want)

    # the BFS/SSSP queries must consume the Dataset contract — no
    # knn_graph(sf_dir) pandas call, no driver-side np.concatenate
    from webalizer_ray.pipelines.queries import q03_tpch_ml as q03
    for fn in (q03.knn_bfs_levels, q03.knn_sssp_distances):
        src = inspect.getsource(fn)
        assert "as_dataset=True" in src
        assert "drop_duplicates" not in src
