"""Persisted IVF vector index: exactness at nprobe=all, REAL pruning
(unprobed cells deleted from disk, result unchanged), self-match at
nprobe=1, and rebuild-replaces semantics."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from webalizer_ray.stages import ann, vecindex

SF = "/root/testdata/sf0.001"


def _queries(n=3):
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], n))
    return np.stack(qtbl["embedding"].to_pandas().to_numpy())


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vecidx") / "store")
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    vecindex.build(ds, d, n_clusters=8)
    return d


def test_nprobe_all_equals_brute_force(ray_session, index_dir):
    q = _queries()
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = ann.brute_force_topk(ds, q, k=5) \
        .sort_values(["query_id", "rank"], ignore_index=True)
    got = vecindex.query(index_dir, q, k=5, nprobe=None) \
        .sort_values(["query_id", "rank"], ignore_index=True)
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(got["cosine"], exact["cosine"])


def test_self_match_found_at_nprobe_1(ray_session, index_dir):
    """A corpus vector used as its own query lands in the probed cell
    (assignment and probe use the same rounded argmax), so nprobe=1
    must return it at rank 1 with cosine 1.0."""
    q = _queries()
    got = vecindex.query(index_dir, q, k=5, nprobe=1)
    r1 = got[got["rank"] == 1].sort_values("query_id")
    assert r1["vec_id"].tolist() == [0, 1, 2]
    assert np.allclose(r1["cosine"], 1.0)


def test_pruning_is_real_unprobed_cells_deleted(ray_session, index_dir,
                                                tmp_path):
    """Copy the store, DELETE every cell directory the query does not
    probe, and get an identical answer — proof the query never touches
    unprobed cells (cost is proportional to the probed fraction)."""
    q = _queries(1)
    before = vecindex.query(index_dir, q, k=5, nprobe=2)

    clone = str(tmp_path / "pruned")
    shutil.copytree(index_dir, clone)
    keep = {f"cell={c}" for c in vecindex.probed_cells(clone, q, nprobe=2)}
    removed = 0
    for name in os.listdir(clone):
        if name.startswith("cell=") and name not in keep:
            shutil.rmtree(os.path.join(clone, name))
            removed += 1
    assert removed > 0, "fixture degenerate: every cell was probed"

    after = vecindex.query(clone, q, k=5, nprobe=2)
    assert after["vec_id"].tolist() == before["vec_id"].tolist()
    assert np.allclose(after["cosine"], before["cosine"])


def test_rebuild_replaces_not_appends(ray_session, index_dir):
    """Building again over the same corpus must not double the store's
    rows (staging + atomic rename = replace semantics)."""
    import pyarrow.dataset as pads

    n_before = pads.dataset(index_dir).count_rows()
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    vecindex.build(ds, index_dir, n_clusters=8)
    assert pads.dataset(index_dir).count_rows() == n_before

    q = _queries()
    got = vecindex.query(index_dir, q, k=5, nprobe=None)
    assert len(got) == 15


def test_embedding_norm_profile_planted(ray_session, tmp_path):
    """Unit vectors count as in-band; a 2x vector moves max_norm."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "nrm")
    os.makedirs(d, exist_ok=True)
    vecs = [[1.0, 0.0], [0.0, 1.0], [2.0, 0.0],
            [0.6, 0.8]]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32())}),
        os.path.join(d, "embeddings.parquet"))
    out = REGISTRY["embedding_norm_profile"][0](d)
    r = out.iloc[0]
    assert r.n_vectors == 4 and r.n_unit == 3
    assert r.max_norm == 2.0 and r.min_norm == 1.0
    assert r.mean_norm == 1.25


def test_fisher_ratio_separated_vs_mixed(ray_session, tmp_path):
    """Two tight clusters far apart -> large ratio; identical
    clusters -> ratio ~ 0."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    def write(vecs, labels, name):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32())}),
            os.path.join(d, "embeddings.parquet"))
        return d

    sep = write([[0.0, 0.1], [0.1, 0.0], [10.0, 10.1],
                 [10.1, 10.0]], [0, 0, 1, 1], "fsep")
    o = REGISTRY["embedding_fisher_ratio"][0](sep)
    assert o["fisher_ratio"][0] > 100
    mix = write([[0.0, 1.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0]],
                [0, 1, 0, 1], "fmix")
    o2 = REGISTRY["embedding_fisher_ratio"][0](mix)
    assert abs(o2["fisher_ratio"][0]) < 1e-6
