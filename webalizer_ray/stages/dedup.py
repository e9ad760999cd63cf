"""Deduplication operators for training-data pipelines.

Exact dedup is the direct descendant of the reference's insert-if-absent
hash tables (hashtab.c:put_hnode() — D1 in SURVEY.md §2.7): re-expressed
as hash-partitioned two-phase aggregation over a 64-bit content
fingerprint, so the shuffle moves (hash, partial) rows, never document
text. Near-dup families (MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) follow the standard public constructions (Broder 1997
resemblance / MinHash; Charikar 2002 SimHash; LSH banding as in Mining of
Massive Datasets ch.3).

Scale notes (the partitioning contract):
* signatures/fingerprints are computed per batch (numpy-vectorized across
  the permutation/bit dimension; the ragged shingle construction is the
  only per-doc step and produces data, not compute);
* LSH bucketing is a groupby on (band, band_hash) — only doc ids and
  band hashes shuffle;
* pair verification joins signatures back by broadcast at test scale
  (``ray.put`` once); at 10^12-doc scale replace with a bucketed join on
  doc id (documented where used).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from webalizer_ray.stages.textstats import add_fingerprint

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mix constant


# ---------------------------------------------------------------------------
# exact dedup (D1)
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Keep min(id) per distinct normalized text; emit (id, copies).

    Two-phase: per-batch fingerprint + partial (min id, count) per hash →
    final groupby(fingerprint) Min/Sum → project. Only (uint64, int64,
    int64) rows cross the shuffle.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = add_fingerprint(df, text_col)
        g = f.groupby("fingerprint", sort=False).agg(
            keep_id=(id_col, "min"), copies=(id_col, "size")).reset_index()
        g["copies"] = g["copies"].astype(np.int64)
        return g

    final = (ds.map_batches(partial, batch_format="pandas")
             .groupby("fingerprint")
             .aggregate(Min("keep_id", alias_name="keep_id"),
                        Sum("copies", alias_name="copies")))
    return final.map_batches(
        lambda df: df[["keep_id", "copies"]].rename(
            columns={"keep_id": id_col}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH (near-dup, Broder resemblance over char shingles)
# ---------------------------------------------------------------------------

_PRIME = np.uint64((1 << 61) - 1)


def _hash_strings(strings: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(strings, dtype=object))


def _char_shingles(text: str, k: int) -> list[str]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return [t]
    return [t[i:i + k] for i in range(len(t) - k + 1)]


class MinHashSignatures:
    """Actor-pool stage: text → minhash signature (list<uint64>).

    Permutation parameters are drawn ONCE per actor in ``__init__`` from a
    fixed seed (identical across actors → signatures agree cluster-wide).
    Per batch, all docs' shingles are hashed in one vectorized call and the
    per-permutation min is a ``np.minimum.reduceat`` over doc segments —
    the loop is over the 64 permutations, never over docs.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 seed: int = 7, text_col: str = "text"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _PRIME, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _PRIME, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].fillna("").tolist()
        shingles = [_char_shingles(t, self.k) for t in texts]  # ragged build
        counts = np.array([len(s) for s in shingles])
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        flat = _hash_strings([s for doc in shingles for s in doc])
        sig = np.empty((len(df), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):  # vectorized over ALL shingles
            hp = (self.a[p] * flat + self.b[p]) % _PRIME
            sig[:, p] = np.minimum.reduceat(hp, offsets)
        out = df.drop(columns=[self.text_col]).copy()
        out["sig"] = list(sig)
        return out


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 band hashes via a polynomial combine."""
    n, p = sig.shape
    r = p // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        acc = np.full(n, _MIX, dtype=np.uint64)
        for c in range(b * r, (b + 1) * r):
            acc = (acc * np.uint64(1000003)) ^ sig[:, c]
        out[:, b] = acc
    return out


def minhash_lsh_pairs(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.7,
                      shingle_k: int = 5, seed: int = 7,
                      concurrency=2) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash (actor pool) → explode to (band, band_hash, id) rows →
    groupby((band, band_hash)) buckets → candidate pairs → verify by
    signature agreement (the standard estimator: fraction of equal
    minhashes is an unbiased estimate of Jaccard resemblance).
    Returns (id_a, id_b, est_jaccard), id_a < id_b, sorted.
    """
    sigs = ds.map_batches(
        MinHashSignatures, batch_format="pandas",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, text_col=text_col),
        concurrency=concurrency)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(df["sig"].to_numpy())
        bh = _band_hashes(sig, bands)
        n = len(df)
        return pd.DataFrame({
            "band": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_hash": bh.T.reshape(-1),
            id_col: np.tile(df[id_col].to_numpy(), bands),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = (sigs.map_batches(explode, batch_format="pandas")
            .groupby(["band", "band_hash"])
            .map_groups(bucket_pairs, batch_format="pandas")
            .to_pandas().drop_duplicates(ignore_index=True))

    # verify by signature agreement. Signatures are broadcast here (small at
    # test scale); at 10^12-doc scale replace with a bucketed join on id.
    sig_df = sigs.to_pandas()
    sig_map = dict(zip(sig_df[id_col], sig_df["sig"]))
    if not len(cand):
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "est_jaccard": pd.Series(dtype=np.float64)})
    sa = np.stack(cand["id_a"].map(sig_map).to_numpy())
    sb = np.stack(cand["id_b"].map(sig_map).to_numpy())
    est = (sa == sb).mean(axis=1)
    cand = cand.assign(est_jaccard=np.round(est, 6))
    out = cand[cand["est_jaccard"] >= threshold]
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# SimHash (Charikar) — 64-bit, near-dup = small Hamming distance
# ---------------------------------------------------------------------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 (byte view + unpackbits)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1) \
        .sum(axis=1).astype(np.int64)

def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """64-bit SimHash per row; token hashing vectorized, bit loop is 64."""
    tokens = [t.lower().split() for t in df[text_col].fillna("")]
    counts = np.array([max(len(t), 1) for t in tokens])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    flat = pd.util.hash_array(
        np.asarray([w for doc in tokens for w in (doc or [""])], dtype=object))
    sim = np.zeros(len(df), dtype=np.uint64)
    for bit in range(64):
        contrib = (((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
                   * 2 - 1)
        sums = np.add.reduceat(contrib, offsets)
        sim |= (sums > 0).astype(np.uint64) << np.uint64(bit)
    out = df.copy()
    out["simhash"] = sim
    return out


def simhash_pairs(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit chunk banding → verify Hamming.

    Two docs within Hamming distance ≤ 3 of a 64-bit simhash share at
    least one of the four 16-bit chunks (pigeonhole) — the standard
    chunk-banding trick, so candidates come from a groupby, not N².
    """
    hashed = ds.map_batches(
        lambda df: simhash_batch(df, text_col)[[id_col, "simhash"]],
        batch_format="pandas")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().astype(np.uint64)
        n = len(df)
        chunks = [((h >> np.uint64(16 * c)) & np.uint64(0xFFFF))
                  for c in range(4)]
        return pd.DataFrame({
            "chunk": np.repeat(np.arange(4, dtype=np.int64), n),
            "chunk_val": np.concatenate(chunks),
            id_col: np.tile(df[id_col].to_numpy(), 4),
            "simhash": np.tile(h, 4),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids, h = g[id_col].to_numpy(), g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = h[ia] ^ h[ib]
        ham = _popcount64(x)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "hamming": ham})

    pairs = (hashed.map_batches(explode, batch_format="pandas")
             .groupby(["chunk", "chunk_val"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas())
    if not len(pairs):
        return pairs
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"], ignore_index=True)
    return (pairs[pairs["hamming"] <= max_hamming]
            .sort_values(["id_a", "id_b"], ignore_index=True))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify) and embedding-cosine near-dup
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard_verify(texts_by_id: dict, pairs: pd.DataFrame, n: int = 3,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact word-n-gram Jaccard for CANDIDATE pairs (the verify step after
    any LSH stage; candidate sets are small by construction)."""
    rows = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = word_ngrams(texts_by_id[a], n), word_ngrams(texts_by_id[b], n)
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            rows.append((a, b, round(j, 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64})


def cosine_dup_pairs(ds: rd.Dataset, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     threshold: float = 0.9) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold).

    Each batch normalizes its vectors and multiplies against the full
    normalized matrix broadcast via ``ray.put`` (read once per task) —
    a blocked N×N similarity without materializing N² anywhere: each task
    emits only its above-threshold pairs. At 10^9-vector scale, replace
    the broadcast side with LSH buckets (see ann.py) so blocks only meet
    candidate buckets.
    """
    full = ds.to_pandas()
    ids = full[id_col].to_numpy()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(mat_ref)
        q = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ all_mat.T
        qi = df[id_col].to_numpy()
        keep = (sims >= threshold) & (qi[:, None] < all_ids[None, :])
        r, c = np.nonzero(keep)
        return pd.DataFrame({"id_a": qi[r], "id_b": all_ids[c],
                             "cosine": np.round(sims[r, c], 6)})

    out = ds.map_batches(block, batch_format="pandas").to_pandas()
    if "id_a" not in out.columns:  # fully-empty result loses its schema
        out = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                            "id_b": pd.Series(dtype=np.int64),
                            "cosine": pd.Series(dtype=np.float64)})
    return out.sort_values(["id_a", "id_b"], ignore_index=True)
