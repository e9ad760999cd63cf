"""BM25 ranked retrieval: oracle parity + first-principles brute force."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def brute_bm25(docs: pd.DataFrame, terms, k1=1.2, b=0.75, k=10):
    """Independent per-doc python implementation of Robertson/Lucene BM25."""
    toks = [t.split() for t in docs["text"].fillna("")]
    n = len(toks)
    avgdl = sum(len(w) for w in toks) / n
    df = {t: sum(1 for w in toks if t in w) for t in terms}
    rows = []
    for doc_id, w in zip(docs["doc_id"], toks):
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
        if s > 0:
            rows.append((doc_id, s))
    rows.sort(key=lambda r: (-round(r[1], 6), r[0]))
    return rows[:k]


def test_bm25_matches_oracle(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY["bm25_search"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    ours, ref = fn(SF), con.sql(sql).df()
    assert len(ours) == len(ref) == 10
    assert ours["doc_id"].tolist() == ref["doc_id"].tolist()
    assert np.allclose(ours["score"], ref["score"], rtol=0, atol=1e-9)


def test_bm25_matches_brute_force(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY, _BM25_TERMS

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    want = brute_bm25(docs, _BM25_TERMS)
    got = REGISTRY["bm25_search"][0](SF)
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert np.allclose(got["score"],
                       [round(s, 6) for _, s in want], atol=1e-6)


def test_bm25_scores_descending_and_hits_only(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY, _BM25_TERMS

    got = REGISTRY["bm25_search"][0](SF)
    assert (np.diff(got["score"]) <= 0).all()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for d in got["doc_id"]:
        assert any(t in texts[d].split() for t in _BM25_TERMS)


def test_indexed_bm25_matches_scan_path(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    scan = REGISTRY["bm25_search"][0](SF)
    idx = REGISTRY["bm25_search_indexed"][0](SF)
    assert idx["doc_id"].tolist() == scan["doc_id"].tolist()
    assert np.allclose(idx["score"], scan["score"], atol=1e-9)


def test_index_query_reads_only_term_buckets(ray_session, tmp_path):
    """A query for terms hashing to B buckets must not open the other
    bucket directories (index-side pruning)."""
    import ray.data as rd
    from webalizer_ray.stages.invindex import (_term_bucket, build_index,
                                               query_index)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    d = str(tmp_path / "idx")
    build_index(rd.from_pandas(docs), d, num_buckets=16)
    terms = ["table"]
    b = set(_term_bucket(pd.Series(terms), 16).tolist())
    import os
    other = [f"bucket={i}" for i in range(16) if i not in b]
    # remove every other bucket dir: a pruned query can't notice
    import shutil
    for o in other:
        p = os.path.join(d, o)
        if os.path.isdir(p):
            shutil.rmtree(p)
    out = query_index(d, terms, k=5)
    assert len(out) == 5
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for did in out["doc_id"]:
        assert "table" in texts[did].split()


def test_empty_term_miss_returns_empty(ray_session, tmp_path):
    import ray.data as rd
    from webalizer_ray.stages.invindex import build_index, query_index

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).head(50)
    d = str(tmp_path / "idx2")
    build_index(rd.from_pandas(docs), d, num_buckets=8)
    out = query_index(d, ["zzz_not_a_word"], k=5)
    assert len(out) == 0


def test_search_cli_roundtrip(ray_session, tmp_path):
    """CLI builds the index on first call, reuses it on the second,
    and both answers match the library path."""
    import json
    import subprocess
    import sys

    idx = str(tmp_path / "cli_idx")
    cmd = [sys.executable, "-m", "webalizer_ray.run", "search",
           "--input", f"{SF}/documents.parquet", "--index-dir", idx,
           "--terms", "table,hash", "--k", "3", "--num-cpus", "2"]
    env = dict(__import__("os").environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        check=True)
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        check=True)
    h1 = json.loads(r1.stdout.strip().splitlines()[-1])["hits"]
    h2 = json.loads(r2.stdout.strip().splitlines()[-1])["hits"]
    assert h1 == h2 and len(h1) == 3

    from webalizer_ray.stages.invindex import query_index
    lib = query_index(idx, ["table", "hash"], k=3)
    assert [h["doc_id"] for h in h1] == lib["doc_id"].tolist()
