"""Persisted inverted index + BM25 query path.

``queries.bm25_search`` scans the corpus per query; real retrieval
systems pay the scan ONCE: build a term-sharded inverted index, then
answer queries by reading only the shards that hold the query's terms.

Layout: ``index_dir/bucket=K/*.parquet`` holds postings
(term, doc_id, tf, dl) for terms hashing to bucket K, plus
``_meta.json`` with the collection stats (N, avgdl) the scorer needs.
A query hashes its terms, reads ONLY those buckets (column-pruned,
predicate-pushed on ``term``), computes df from the postings it
already has in hand, and scores the candidate set — at 100 TB the
query cost is proportional to the matched postings, not the corpus.

Build is one streaming pass: per-batch (term, doc_id, tf, dl) rows
from the same explode the TF-IDF pass uses, hive-written by term-hash
bucket (the write IS the shuffle — the flagship's pattern).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import ray.data as rd

#: build-time DEFAULT shard count only — the chosen value is persisted
#: in the index's _meta.json and every later read/append session uses
#: THAT, so deriving the default from the live session is safe (unlike
#: the join-store LAYOUT CONSTANTS, the layout is self-describing).
NUM_BUCKETS = 32
K1, B = 1.2, 0.75


def _term_bucket(terms: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(terms, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def build_index(ds: rd.Dataset, index_dir: str,
                num_buckets: int | None = None,
                text_col: str = "text", id_col: str = "doc_id") -> str:
    """One streaming pass corpus → term-sharded postings store."""
    from webalizer_ray.config import default_partitions
    num_buckets = default_partitions(num_buckets)
    os.makedirs(index_dir, exist_ok=True)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.split()
        dl = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna().to_numpy()
        doc = np.repeat(df[id_col].to_numpy(), dl)
        dls = np.repeat(dl, dl)
        tf = (pd.DataFrame({"doc_id": doc, "term": flat, "dl": dls})
              .groupby(["doc_id", "term"], sort=False)
              .agg(tf=("dl", "size"), dl=("dl", "first")).reset_index())
        tf["tf"] = tf["tf"].astype(np.int64)
        tf["bucket"] = _term_bucket(tf["term"], num_buckets)
        return tf

    ds.map_batches(postings, batch_format="pandas") \
        .write_parquet(index_dir, partition_cols=["bucket"])

    # collection stats from the postings themselves: N and avgdl need
    # per-doc dl exactly once — docs with ≥1 token appear in ≥1 posting
    docs = rd.read_parquet(index_dir, columns=["doc_id", "dl"])

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates("doc_id")
        return pd.DataFrame({"doc_id": g["doc_id"], "dl": g["dl"]})

    from webalizer_ray.stages.aggregate import reduce_sink
    per_doc = reduce_sink(
        docs.map_batches(doc_partial, batch_format="pandas"),
        ["doc_id"], {"dl": ("dl", "max")}).to_pandas()
    meta = {"n_docs": int(len(per_doc)),
            "sum_dl": int(per_doc["dl"].sum()),
            "num_buckets": num_buckets}
    tmp = os.path.join(index_dir, f"._meta-{os.getpid()}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "_meta.json"))
    return index_dir


def append_index(ds: rd.Dataset, index_dir: str, run_tag: str,
                 text_col: str = "text", id_col: str = "doc_id") -> str:
    """Incremental index maintenance: add NEW documents to an existing
    index without rebuilding it.

    Each append is its own run directory (``runs/<tag>/bucket=K`` +
    per-run ``_meta.json`` stats) written to a temp dir and atomically
    renamed — re-running the same tag replaces its own output and
    nothing else, the same idempotence contract as the incremental
    dedup stores. ``query_index`` unions the base and every run (the
    LSM pattern: queries read segments, ``run.py compact`` is the
    merge). Append-only semantics: re-adding an existing doc_id
    double-counts — updates belong to the CDC/upsert store."""
    run_dir = os.path.join(index_dir, "runs", run_tag)
    with open(os.path.join(index_dir, "_meta.json")) as f:
        num_buckets = json.load(f)["num_buckets"]
    tmp = run_dir + f".tmp-{os.getpid()}"
    build_index(ds, tmp, num_buckets=num_buckets,
                text_col=text_col, id_col=id_col)
    os.makedirs(os.path.dirname(run_dir), exist_ok=True)
    if os.path.isdir(run_dir):
        import shutil
        shutil.rmtree(run_dir)
    os.replace(tmp, run_dir)
    return run_dir


def _index_segments(index_dir: str) -> list:
    """(segment_dir, meta) for the base index + every appended run."""
    segs = []
    with open(os.path.join(index_dir, "_meta.json")) as f:
        segs.append((index_dir, json.load(f)))
    runs = os.path.join(index_dir, "runs")
    if os.path.isdir(runs):
        for tag in sorted(os.listdir(runs)):
            mp = os.path.join(runs, tag, "_meta.json")
            if os.path.isfile(mp):
                with open(mp) as f:
                    segs.append((os.path.join(runs, tag), json.load(f)))
    return segs


def query_index(index_dir: str, terms: list[str], k: int = 10
                ) -> pd.DataFrame:
    """BM25 top-k from the index: reads ONLY the term buckets the
    query hashes to, with a ``term IN (...)`` predicate pushed into
    the scan. Collection stats are the SUM over segments (base +
    appended runs), so scores after an append equal a full rebuild's."""
    segs = _index_segments(index_dir)
    n = sum(m["n_docs"] for _, m in segs)
    avgdl = sum(m["sum_dl"] for _, m in segs) / n
    num_buckets = segs[0][1]["num_buckets"]
    buckets = sorted(set(
        _term_bucket(pd.Series(list(terms)), num_buckets).tolist()))
    frames = []
    for seg_dir, _ in segs:
        for b in buckets:
            p = os.path.join(seg_dir, f"bucket={b}")
            if not os.path.isdir(p):
                continue
            t = pads.dataset(p).to_table(
                filter=pads.field("term").isin(list(terms)))
            frames.append(t.to_pandas())
    if not frames:
        return pd.DataFrame({"doc_id": pd.Series([], np.int64),
                             "score": pd.Series([], np.float64)})
    m = pd.concat(frames, ignore_index=True)
    dfreq = m.groupby("term")["doc_id"].nunique()
    dfv = m["term"].map(dfreq).to_numpy(np.float64)
    idf = np.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
    tfv = m["tf"].to_numpy(np.float64)
    dlv = m["dl"].to_numpy(np.float64)
    m["s"] = (idf * tfv * (K1 + 1.0)
              / (tfv + K1 * (1.0 - B + B * dlv / avgdl)))
    from webalizer_ray.stages.textstats import round_half_away
    sc = m.groupby("doc_id", sort=False)["s"].sum().reset_index()
    sc["score"] = round_half_away(sc["s"].to_numpy(np.float64), 6)
    sc = sc.sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort").head(k)
    sc["doc_id"] = sc["doc_id"].astype(np.int64)
    return sc[["doc_id", "score"]].reset_index(drop=True)
