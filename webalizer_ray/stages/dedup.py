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
  band hashes shuffle; degenerate buckets are capped (consecutive-chain
  emission) so no task ever goes O(n²) on a cluster of identical docs;
* pair verification joins signatures / texts / vectors back to candidate
  ids with BUCKETED HASH JOINS (``join_pairs_to_values``) — only
  candidate rows move; nothing is broadcast or gathered on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from webalizer_ray.stages import strhash
from webalizer_ray.config import default_partitions
from webalizer_ray.stages.aggregate import join_partitions, key_bucket
from webalizer_ray.stages.sketch import splitmix64
from webalizer_ray.stages.textstats import add_fingerprint, round_half_away
from webalizer_ray.stages.vecops import ids_from_column, mat_from_column

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

def _hash_strings(strings: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(strings, dtype=object))


class MinHashSignatures:
    """Actor-pool stage: text → minhash signature (list<uint64>).

    Permutation constants are derived ONCE per actor in ``__init__``
    from a fixed seed (identical across actors → signatures agree
    cluster-wide).  Shingle hashing is the SQL-replicable SplitMix64
    tabulation from :mod:`webalizer_ray.stages.strhash` (r4: replaced
    pandas' SipHash so minhash queries carry bit-exact DuckDB
    oracles, the swap round 3 proved on HLL/CMS/PQ), and the p-th
    "permutation" is ``splitmix64(shingle_hash XOR c_p)`` with
    ``c_p = splitmix64((seed << 32) + p + 1)`` — a keyed re-mix with
    full avalanche, replayable in SQL integer arithmetic.  Per batch,
    all docs' shingles hash in one vectorized call and the
    per-permutation min is a ``np.minimum.reduceat`` over doc
    segments — the loop is over the 64 permutations, never over docs.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 seed: int = 7, text_col: str = "text"):
        self.c = splitmix64((np.uint64(seed) << np.uint64(32))
                            + np.arange(1, num_perm + 1, dtype=np.uint64))
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = [strhash.normalize(t) for t in df[self.text_col].fillna("")]
        flat, counts = strhash.shingle_hashes(texts, self.k)
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        sig = np.empty((len(df), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):  # vectorized over ALL shingles
            sig[:, p] = np.minimum.reduceat(splitmix64(flat ^ self.c[p]),
                                            offsets)
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


def _empty_pairs(value_col: str) -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                         "id_b": pd.Series(dtype=np.int64),
                         value_col: pd.Series(dtype=np.float64)})


def dedup_pairs_ds(pairs: rd.Dataset,
                   num_buckets: int | None = None) -> rd.Dataset:
    """Distributed exact dedup of (id_a, id_b) rows — per-batch dedup,
    then per-hash-bucket global dedup (a pair lives in exactly one
    bucket). The pair set never lands on the driver."""
    num_buckets = default_partitions(num_buckets)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().copy()
        d["_h"] = key_bucket(d, ["id_a", "id_b"], num_buckets)
        return d

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"]) \
            .drop(columns=["_h"])

    return (pairs.map_batches(local, batch_format="pandas")
            .groupby("_h").map_groups(bucket, batch_format="pandas"))


def _pack_rows(col: pd.Series, dtype) -> list[bytes]:
    """Fixed-width numeric rows → one bytes blob per row (Ray's hash join
    supports binary columns but not tensor-extension list columns)."""
    arr = np.ascontiguousarray(np.stack(col.to_numpy()).astype(dtype))
    return [r.tobytes() for r in arr]


def _unpack_rows(col: pd.Series, dtype) -> np.ndarray:
    n = len(col)
    # copy: frombuffer views are read-only; consumers normalize in place
    return np.frombuffer(b"".join(col.to_numpy()), dtype=dtype) \
        .reshape(n, -1).copy()


def join_pairs_to_values(pairs: rd.Dataset, values: rd.Dataset,
                         id_col: str, value_col: str,
                         num_partitions: int | None = None,
                         pack_dtype=None,
                         broadcast_bytes: int = 128 * 2**20
                         ) -> rd.Dataset:
    """(id_a, id_b) ⋈ values twice → (id_a, id_b, <value>_a, <value>_b).

    SIZE-ADAPTIVE (r5). The candidate-pair set is usually much larger
    than the value table it needs rows from (the sf0.1 cosine chain:
    1.9M pairs against a 1 MB, 2000-row embedding table) — in that
    regime two hash joins pay ~num_partitions shuffle-aggregator
    actors each to route megabytes, 7.6 s of the chain's 13 s. A value
    table under ``broadcast_bytes`` (est. rows × one probed row's
    payload) therefore ships ONCE via ray.put as (sorted ids, packed
    values); each pair batch gathers both sides with two vectorized
    searchsorted lookups — a pure map, no shuffle, identical output
    schema and inner-join semantics (pairs whose id is absent drop).
    Above the budget the BUCKETED HASH JOIN path engages unchanged:
    only candidate ids and their values move, partitioned by id hash —
    the corpus-scale contract. ``pack_dtype`` packs fixed-width array
    values into binary either way; consumers unpack with
    ``_unpack_rows``.

    Hash-join num_partitions defaults to the session's CPU count
    capped at 32 AND scaled down to the candidate-pair count: Ray's
    hash join spins up one shuffle-aggregator actor per partition, so
    asking for more partitions than the session has CPUs deadlocks the
    actor pool on a small ray.init (measured: 32 partitions hang under
    num_cpus=8), too few leaves cores idle on the verify-heavy dense
    case, and too MANY for a small pair set pays ~64 actor spin-ups to
    route a few hundred rows (r3: ~1 partition per 25k pairs).
    ``pairs`` and ``values`` are materialized/parquet at every call
    site, so the sizing ``count()`` is a free metadata read — if you
    pass a lazy Dataset, pass ``num_partitions`` explicitly.
    """
    n_vals = values.count()
    if n_vals == 0:
        # inner semantics: nothing can match — empty with the joined
        # schema (cheap: map over the pairs, emit nothing)
        def drop_all(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "id_a": pd.Series(dtype=np.int64),
                "id_b": pd.Series(dtype=np.int64),
                f"{value_col}_a": pd.Series(dtype=object),
                f"{value_col}_b": pd.Series(dtype=object)})
        return pairs.map_batches(drop_all, batch_format="pandas")
    probe = values.limit(1).to_pandas()[value_col].iloc[0]
    if pack_dtype:
        row_bytes = len(np.asarray(probe, dtype=pack_dtype).tobytes())
    elif isinstance(probe, (bytes, str)):
        row_bytes = len(probe)
    else:
        row_bytes = int(np.asarray(probe).nbytes)             if hasattr(probe, "__len__") else 8
    if n_vals * max(row_bytes, 8) <= broadcast_bytes:
        vp = values.to_pandas()
        ids = np.asarray(vp[id_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        if pack_dtype:
            arr = np.ascontiguousarray(
                np.stack(vp[value_col].to_numpy())).astype(
                pack_dtype, copy=False)[order]
            vals_s = np.empty(len(arr), dtype=object)
            vals_s[:] = [r.tobytes() for r in arr]
        else:
            vals_s = vp[value_col].to_numpy()[order].astype(object)
        ref = ray.put((ids_s, vals_s))

        def gather(df: pd.DataFrame) -> pd.DataFrame:
            sids, svals = ray.get(ref)
            a = df["id_a"].to_numpy(np.int64)
            b = df["id_b"].to_numpy(np.int64)
            ia = np.clip(np.searchsorted(sids, a), 0, len(sids) - 1)
            ib = np.clip(np.searchsorted(sids, b), 0, len(sids) - 1)
            ok = (sids[ia] == a) & (sids[ib] == b)
            return pd.DataFrame({
                "id_a": a[ok], "id_b": b[ok],
                f"{value_col}_a": svals[ia[ok]],
                f"{value_col}_b": svals[ib[ok]]})

        return pairs.map_batches(gather, batch_format="pandas")
    if num_partitions is None:
        import ray as _ray
        cpu_cap = max(2, min(
            32, int(_ray.cluster_resources().get("CPU", 8))))
        num_partitions = max(2, min(cpu_cap, 1 + pairs.count() // 25_000))
    def side(suffix):
        def f(batch: pa.Table) -> pd.DataFrame:
            if pack_dtype:
                # zero-copy matrix off the list column, then one
                # contiguous tobytes per row for the Acero join
                arr = np.ascontiguousarray(
                    mat_from_column(batch[value_col], dtype=pack_dtype))
                vals = [r.tobytes() for r in arr]
            else:
                vals = batch[value_col].to_pandas().to_numpy()
            return pd.DataFrame({
                f"id_{suffix}": ids_from_column(batch[id_col]),
                f"{value_col}_{suffix}": vals})
        return f

    va = values.map_batches(side("a"), batch_format="pyarrow")
    vb = values.map_batches(side("b"), batch_format="pyarrow")
    j = pairs.join(va, join_type="inner", num_partitions=num_partitions,
                   on=("id_a",))
    return j.join(vb, join_type="inner", num_partitions=num_partitions,
                  on=("id_b",))


def minhash_lsh_pairs(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.7,
                      shingle_k: int = 5, seed: int = 7,
                      concurrency=2, bucket_cap: int = 256,
                      as_dataset: bool = False,
                      out_dir: str | None = None
                      ) -> pd.DataFrame | rd.Dataset:
    """MinHash+LSH near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash (actor pool) → explode to (band, band_hash, id) rows →
    groupby((band, band_hash)) buckets → candidate pairs → distributed
    pair dedup → signatures joined back by BUCKETED HASH JOIN (never a
    driver broadcast) → per-batch vectorized verify (fraction of equal
    minhashes, Broder's unbiased resemblance estimator).
    Returns (id_a, id_b, est_jaccard), id_a < id_b, sorted.

    Degenerate-bucket guard: a band bucket larger than ``bucket_cap``
    (typically a cluster of identical docs) emits the sorted-consecutive
    CHAIN of pairs instead of all O(n²) pairs — identical members stay
    fully connected for union-find clustering; near-identical members may
    lose some cross pairs (documented recall trade, standard practice —
    exact clusters belong to exact_dedup anyway).
    """
    sigs = ds.map_batches(
        MinHashSignatures, batch_format="pandas",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, text_col=text_col),
        concurrency=concurrency).materialize()
    # ^ materialized once: consumed by the banding pass AND both join
    # sides below; (id, 64×u64) rows — object-store-backed, spillable

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(df["sig"].to_numpy())
        bh = _band_hashes(sig, bands)
        n = len(df)
        out = pd.DataFrame({
            "band": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_hash": bh.T.reshape(-1),
            id_col: np.tile(df[id_col].to_numpy(), bands),
        })
        # coarse shuffle key: a fine (band, band_hash) bucket lives in
        # exactly one coarse group, so ~10⁵ tiny per-bucket map_groups
        # calls collapse to ~64 vectorized tasks (measured 6.3 s → sub-s
        # at sf0.1)
        out["ck"] = ((out["band"].to_numpy(np.uint64) * np.uint64(0x9E37))
                     ^ out["band_hash"].to_numpy().astype(np.uint64)) \
            % np.uint64(64)
        return out

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # keep only fine buckets with a collision (>= 2 members) —
        # vectorized; the per-bucket loop below runs on those few
        sz = g.groupby(["band", "band_hash"], sort=False)[id_col] \
            .transform("size")
        g = g[sz.to_numpy() >= 2]
        if not len(g):
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(grp[id_col].to_numpy())
            if len(ids) > bucket_cap:
                out_a.append(ids[:-1])
                out_b.append(ids[1:])
            else:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = (sigs.map_batches(explode, batch_format="pandas")
            .groupby("ck")
            .map_groups(coarse_pairs, batch_format="pandas"))
    cand = dedup_pairs_ds(cand).materialize()
    if cand.count() == 0:
        empty = rd.from_pandas(_empty_pairs("est_jaccard"))
        if out_dir is not None:
            # the sink contract holds on the empty result too (r3
            # review): consumers read the path regardless of whether
            # LSH produced candidates
            empty.write_parquet(out_dir)
        return empty if as_dataset else _empty_pairs("est_jaccard")

    j = join_pairs_to_values(cand, sigs, id_col, "sig",
                             pack_dtype=np.uint64)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty_pairs("est_jaccard")
        sa = _unpack_rows(df["sig_a"], np.uint64)
        sb = _unpack_rows(df["sig_b"], np.uint64)
        est = np.round((sa == sb).mean(axis=1), 6)
        out = pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                            "id_b": df["id_b"].to_numpy(),
                            "est_jaccard": est})
        return out[out["est_jaccard"] >= threshold]

    verified = j.map_batches(verify, batch_format="pandas")
    if out_dir is not None:
        verified = verified.materialize()
        verified.write_parquet(out_dir)
    if as_dataset:
        return verified
    out = verified.to_pandas()
    if "id_a" not in out.columns:
        return _empty_pairs("est_jaccard")
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
    """64-bit SimHash per row; token hashing vectorized, bit loop is 64.

    Token hashes are SplitMix64 tabulation (strhash, r4) — stable
    across nodes AND bit-for-bit replayable in the DuckDB oracle."""
    tokens = [str(t).lower().split() for t in df[text_col].fillna("")]
    counts = np.array([max(len(t), 1) for t in tokens])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    flat = strhash.string_hashes(
        [w for doc in tokens for w in (doc or [""])])
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
                  text_col: str = "text", max_hamming: int = 3,
                  bucket_cap: int = 4096) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit chunk banding → verify Hamming
    (generic machinery in :func:`hamming64_pairs`)."""
    hashed = ds.map_batches(
        lambda df: simhash_batch(df, text_col)[[id_col, "simhash"]],
        batch_format="pandas")
    return hamming64_pairs(hashed, id_col=id_col, hash_col="simhash",
                           max_hamming=max_hamming, n_chunks=4,
                           bucket_cap=bucket_cap)


def hamming64_pairs(hashed: rd.Dataset, id_col: str, hash_col: str,
                    max_hamming: int, n_chunks: int = 4,
                    bucket_cap: int = 4096) -> pd.DataFrame:
    """All pairs within Hamming distance ``max_hamming`` of a 64-bit
    hash column: chunk banding → in-cluster exact Hamming verify.

    Two hashes within distance d share at least one of n_chunks equal
    chunks whenever n_chunks > d (pigeonhole) — recall is EXACT in that
    regime; with n_chunks <= max_hamming the banding is deliberately
    recall-incomplete (LSH-style: a pair at distance d > n_chunks-1 is
    found only if its flipped bits happen to cluster). Either way
    candidates come from a groupby, never N². The verify and pair dedup
    run in-cluster (only surviving pairs reach the driver); a degenerate
    chunk bucket (identical-item cluster) emits the sorted-consecutive
    chain, like the MinHash path. Shared by SimHash text near-dup and
    perceptual image-hash (dHash) near-dup.
    """
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    width = 64 // n_chunks
    mask = np.uint64((1 << width) - 1)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df[hash_col].to_numpy().astype(np.uint64)
        n = len(df)
        chunks = [((h >> np.uint64(width * c)) & mask)
                  for c in range(n_chunks)]
        out = pd.DataFrame({
            "chunk": np.repeat(np.arange(n_chunks, dtype=np.int64), n),
            "chunk_val": np.concatenate(chunks) if n else
            np.array([], dtype=np.uint64),
            id_col: np.tile(df[id_col].to_numpy(), n_chunks),
            hash_col: np.tile(h, n_chunks),
        })
        # coarse collapse (same as MinHash banding): the many tiny
        # (chunk, chunk_val) groups become ≤64 vectorized tasks
        out["ck"] = (out["chunk"].to_numpy(np.uint64) * np.uint64(0x9E37)
                     ^ out["chunk_val"].to_numpy(np.uint64)) \
            % np.uint64(64)
        return out

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        sz = g.groupby(["chunk", "chunk_val"], sort=False)[id_col] \
            .transform("size")
        g = g[sz.to_numpy() >= 2]
        if not len(g):
            return empty
        frames = []
        for _, grp in g.groupby(["chunk", "chunk_val"], sort=False):
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy()
            h = grp[hash_col].to_numpy().astype(np.uint64)
            if len(ids) > bucket_cap:
                ia = np.arange(len(ids) - 1)
                ib = np.arange(1, len(ids))
            else:
                ia, ib = np.triu_indices(len(ids), k=1)
            ham = _popcount64(h[ia] ^ h[ib])
            keep = ham <= max_hamming
            frames.append(pd.DataFrame({"id_a": ids[ia][keep],
                                        "id_b": ids[ib][keep],
                                        "hamming": ham[keep]}))
        out = pd.concat(frames, ignore_index=True)
        return out if len(out) else empty

    cand = (hashed.map_batches(explode, batch_format="pandas")
            .groupby("ck")
            .map_groups(coarse_pairs, batch_format="pandas"))
    pairs = dedup_pairs_ds(cand).to_pandas()
    if not len(pairs) or "id_a" not in pairs.columns:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "hamming": pd.Series(dtype=np.int64)})
    return pairs.sort_values(["id_a", "id_b"], ignore_index=True)


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
            # half-away rounding = SQL ROUND (oracle parity, r4)
            rows.append((a, b, float(round_half_away(j, 6))))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64})


def ngram_jaccard_pairs_distributed(docs: rd.Dataset, pairs: pd.DataFrame,
                                    n: int = 3, threshold: float = 0.5,
                                    id_col: str = "doc_id",
                                    text_col: str = "text") -> pd.DataFrame:
    """Exact word-n-gram Jaccard verify of candidate pairs, IN-CLUSTER.

    Candidate (id_a, id_b) rows are hash-joined back to their texts
    (``join_pairs_to_values`` — two bucketed joins, so only candidate
    docs' texts move and the driver never holds a text dict), then each
    batch verifies its pairs. The per-pair set intersection is inherent
    to ragged n-gram sets; it runs distributed over candidate-scale data
    only. Returns (id_a, id_b, jaccard ≥ threshold), sorted.
    """
    if not len(pairs):
        return _empty_pairs("jaccard")
    p = rd.from_pandas(pairs[["id_a", "id_b"]])
    j = join_pairs_to_values(p, docs, id_col, text_col)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b, ta, tb in zip(df["id_a"], df["id_b"],
                                df[f"{text_col}_a"], df[f"{text_col}_b"]):
            sa, sb = word_ngrams(ta, n), word_ngrams(tb, n)
            jac = len(sa & sb) / max(len(sa | sb), 1)
            if jac >= threshold:
                rows.append((a, b, float(round_half_away(jac, 6))))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]) \
            .astype({"id_a": np.int64, "id_b": np.int64})

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    if "id_a" not in out.columns:
        return _empty_pairs("jaccard")
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def lsh_candidate_pairs(ds: rd.Dataset, id_col: str, vec_col: str,
                        n_planes: int, n_tables: int, seed: int,
                        bucket_cap: int) -> rd.Dataset:
    """Random-hyperplane LSH candidate pairs (id_a < id_b, globally
    deduped): L independent sign-hash tables; vectors sharing a bucket
    in ANY table pair up. Only (table, bucket, id) rows shuffle; a
    degenerate bucket beyond ``bucket_cap`` degrades to chain pairs
    (transitive closure keeps the bucket connected without the O(n²)
    blowup). Shared by threshold dedup (cosine_dup_pairs_lsh) and the
    top-k similarity join (ann.knn_graph_lsh)."""
    rng = np.random.default_rng(seed)
    # sizing planes from a racy first batch differs per task; use a
    # 1-row sample (cheap metadata read) instead
    dim = len(ds.limit(1).to_pandas()[vec_col].iloc[0])
    planes = rng.standard_normal((n_tables, dim, n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    planes_ref = ray.put(planes)

    def explode(batch: pa.Table) -> pd.DataFrame:
        P = ray.get(planes_ref)
        m = mat_from_column(batch[vec_col])
        ids = ids_from_column(batch[id_col])
        n = len(ids)
        frames = []
        for t in range(n_tables):
            b = ((m @ P[t]) > 0).astype(np.int64) @ weights
            frames.append(pd.DataFrame({
                "table": np.full(n, t, dtype=np.int64),
                "bucket": b, id_col: ids}))
        out = pd.concat(frames, ignore_index=True)
        # coarse shuffle key (same collapse as the MinHash banding): a
        # fine (table, bucket) cell lives in exactly one coarse group,
        # so L×2^k tiny map_groups calls become ≤64 vectorized tasks
        out["ck"] = (out["table"].to_numpy(np.uint64) * np.uint64(0x9E37)
                     ^ out["bucket"].to_numpy(np.uint64)) % np.uint64(64)
        return out

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["table", "bucket"], sort=False)[id_col] \
            .transform("size")
        g = g[sz.to_numpy() >= 2]
        if not len(g):
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        out_a, out_b = [], []
        for _, grp in g.groupby(["table", "bucket"], sort=False):
            ids = np.sort(grp[id_col].to_numpy())
            if len(ids) > bucket_cap:
                out_a.append(ids[:-1])
                out_b.append(ids[1:])
            else:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("ck")
            .map_groups(coarse_pairs, batch_format="pandas"))
    return dedup_pairs_ds(cand).materialize()


def cosine_dup_pairs_lsh(ds: rd.Dataset, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.9, n_planes: int = 4,
                         n_tables: int = 48, seed: int = 7,
                         bucket_cap: int = 4096,
                         as_dataset: bool = False,
                         out_dir: str | None = None
                         ) -> pd.DataFrame | rd.Dataset:
    """LSH-bucketed embedding near-dup pairs — the scale path replacing
    the blocked all-pairs ``cosine_dup_pairs``.

    L independent random-hyperplane tables (Charikar sign-LSH): vector →
    L bucket keys (one per table); pairs sharing a bucket in ANY table
    are candidates (groupby per (table, bucket) — only ids + bucket keys
    shuffle); distributed pair dedup; exact cosine verified on candidates
    via bucketed joins back to the vectors. Per-pair miss probability is
    (1 - p^k)^L with p = 1 - θ/π, so recall is tuned by (k=n_planes,
    L=n_tables): k scales up with density/N to keep buckets small, L
    scales up to hold recall — at the default (4, 48) a cos≥0.4 pair is
    missed with prob ≈ 2.5e-4. Deterministic given the seed.
    """
    cand = lsh_candidate_pairs(ds, id_col, vec_col, n_planes, n_tables,
                               seed, bucket_cap)
    if cand.count() == 0:
        empty = rd.from_pandas(_empty_pairs("cosine"))
        if out_dir is not None:
            empty.write_parquet(out_dir)
        return empty if as_dataset else _empty_pairs("cosine")

    j = join_pairs_to_values(cand, ds, id_col, vec_col,
                             pack_dtype=np.float64)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty_pairs("cosine")
        a = _unpack_rows(df[f"{vec_col}_a"], np.float64)
        b = _unpack_rows(df[f"{vec_col}_b"], np.float64)
        a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b /= np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        cos = np.round((a * b).sum(axis=1), 6)
        out = pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                            "id_b": df["id_b"].to_numpy(), "cosine": cos})
        return out[out["cosine"] >= threshold]

    verified = j.map_batches(verify, batch_format="pandas")
    if out_dir is not None:
        verified = verified.materialize()
        verified.write_parquet(out_dir)
    if as_dataset:
        return verified
    out = verified.to_pandas()
    if "id_a" not in out.columns:
        return _empty_pairs("cosine")
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


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

    def block(batch: pa.Table) -> pd.DataFrame:
        all_ids, all_mat = ray.get(mat_ref)
        # zero-copy matrices are read-only — normalize out of place
        q = mat_from_column(batch[vec_col])
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                           1e-12)
        sims = q @ all_mat.T
        qi = ids_from_column(batch[id_col])
        keep = (sims >= threshold) & (qi[:, None] < all_ids[None, :])
        r, c = np.nonzero(keep)
        return pd.DataFrame({"id_a": qi[r], "id_b": all_ids[c],
                             "cosine": np.round(sims[r, c], 6)})

    out = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if "id_a" not in out.columns:  # fully-empty result loses its schema
        out = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                            "id_b": pd.Series(dtype=np.int64),
                            "cosine": pd.Series(dtype=np.float64)})
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# Train/test decontamination (cross-table n-gram overlap)
# ---------------------------------------------------------------------------

def _shingle_hash_table(batch: pa.Table, n: int, id_col: str,
                        text_col: str, ids_too: bool) -> pa.Table:
    """(doc_id, sh) rows — one int64 hash per word n-gram, batch-local
    distinct. Tokenization is a single-space split of the lowercased
    text (matching SQL string_split semantics); a doc with fewer than n
    tokens emits nothing. The ragged shingle build is per-doc (data
    production, not compute); hashing is one vectorized call. Output is
    ALWAYS an Arrow table with an explicit schema — empty pandas blocks
    lose their schema inside Ray's hash-shuffle join, empty Arrow
    tables don't."""
    schema = pa.schema(([(id_col, pa.int64())] if ids_too else [])
                       + [("sh", pa.int64())])
    ids_out, flat = [], []
    for i, t in zip(batch[id_col].to_numpy(),
                    pc.fill_null(batch[text_col], "").to_pylist()):
        toks = t.lower().split(" ")
        m = len(toks) - n + 1
        if m <= 0:
            continue
        flat.extend(" ".join(toks[j:j + n]) for j in range(m))
        ids_out.append(np.full(m, i, dtype=np.int64))
    if not flat:
        return schema.empty_table()
    sh = _hash_strings(flat).view(np.int64)
    d = pd.DataFrame({id_col: np.concatenate(ids_out),
                      "sh": sh}).drop_duplicates(
        subset=None if ids_too else ["sh"])
    cols = [id_col, "sh"] if ids_too else ["sh"]
    return pa.Table.from_pandas(d[cols], schema=schema,
                                preserve_index=False)


def ngram_decontaminate(train: rd.Dataset, val: rd.Dataset, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int | None = None
                        ) -> pd.DataFrame:
    """Ids of TRAIN docs sharing at least one word n-gram with ANY val doc
    — the train/test decontamination sweep every eval-safe training
    pipeline runs (n-gram overlap as in the GPT-3 appendix-C methodology,
    public construction).

    Shape: both sides shingle per batch into (id, shingle-hash) rows
    (batch-local distinct), and a bucketed hash join on the 64-bit
    shingle hash surfaces overlaps — only fixed-width (int64, int64)
    rows ever shuffle, never text. The only driver materialization is
    the contaminated-id list itself (batch-locally deduped first),
    which is the function's return value. Val-side distinct is
    batch-local only: a shingle shared by v val batches re-matches v
    times before the id dedup — bounded by the (small, eval-sized) val
    set. 64-bit hashing makes a false match ~n_shingles²/2⁶⁵ —
    negligible next to the FP rate of the n-gram heuristic itself.
    """
    num_partitions = join_partitions(
        default_partitions(num_partitions, per_cpu=1))
    t_pairs = train.map_batches(
        lambda b: _shingle_hash_table(b, n, id_col, text_col, True),
        batch_format="pyarrow")
    # The val side is the SMALL side by construction (eval benchmarks);
    # materialize its int64 hash rows so the empty-val case can return
    # early — Ray's join loses the right-side schema when that side
    # contributes zero blocks, and the count is free post-materialize.
    v_sh = val.map_batches(
        lambda b: _shingle_hash_table(b, n, id_col, text_col, False),
        batch_format="pyarrow").materialize()
    if v_sh.count() == 0:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64)})

    hit = t_pairs.join(v_sh, join_type="inner",
                       num_partitions=num_partitions, on=("sh",))

    def local_ids(b: pa.Table) -> pa.Table:
        return b.select([id_col]).group_by(id_col).aggregate([])

    out = (hit.map_batches(local_ids, batch_format="pyarrow")
           .to_pandas())
    if id_col not in out.columns:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64)})
    return (out.drop_duplicates().sort_values(id_col, ignore_index=True)
            .reset_index(drop=True)[[id_col]])


# ---------------------------------------------------------------------------
# Distributed connected components (dup-pair graph → clusters)
# ---------------------------------------------------------------------------

def _union_find_components(pairs: pd.DataFrame, id_a: str,
                           id_b: str) -> pd.DataFrame:
    """In-core union-find (path halving + union by min): same
    (node, cluster_id=min member) contract as the distributed path."""
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            parent[r] = parent.get(parent[r], parent[r])   # halve
            r = parent[r]
        return r

    for a, b in zip(pairs[id_a].to_numpy(np.int64),
                    pairs[id_b].to_numpy(np.int64)):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = np.unique(np.concatenate([pairs[id_a].to_numpy(np.int64),
                                      pairs[id_b].to_numpy(np.int64)]))
    return pd.DataFrame({
        "node": nodes,
        "cluster_id": np.array([find(int(n)) for n in nodes],
                               dtype=np.int64)})


def connected_components_ds(pairs: rd.Dataset,
                            id_a: str = "id_a", id_b: str = "id_b",
                            num_partitions: int | None = None,
                            max_rounds: int = 40,
                            out_dir: str | None = None) -> rd.Dataset:
    """Distributed connected components returning a DATASET of
    (node, cluster_id) — the corpus-scale contract (VERDICT r2 item 1:
    no O(nodes) driver pull in the library path).  Same min-label +
    pointer-doubling supersteps as ``connected_components`` (which
    wraps this for the sf-scale pandas query contract); with
    ``out_dir`` the labels are also written as partitioned Parquet so
    a downstream keep-one-per-cluster pass can stream them back
    without re-running the supersteps.
    """
    labels = _cc_labels(pairs, id_a, id_b,
                        default_partitions(num_partitions, per_cpu=1),
                        max_rounds)
    out_schema = pa.schema([("node", pa.int64()),
                            ("cluster_id", pa.int64())])
    if labels.count() == 0:
        # Ray's map operators skip empty blocks, so the rename below
        # would never run and the empty result would lose its schema
        out = rd.from_arrow(out_schema.empty_table())
        if out_dir is not None:
            out.write_parquet(out_dir)
        return out

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(b["node"], pa.int64()),
                         "cluster_id": pc.cast(b["label"], pa.int64())})

    out = labels.map_batches(_rename, batch_format="pyarrow")
    if out_dir is not None:
        out = out.materialize()
        out.write_parquet(out_dir)
    return out


def connected_components(pairs: rd.Dataset | pd.DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b",
                         num_partitions: int | None = None,
                         max_rounds: int = 40,
                         driver_limit: int = 2_000_000) -> pd.DataFrame:
    """(node, cluster_id) for every node of the undirected pair graph;
    cluster_id = min node id in the node's connected component — the
    step that turns near-dup PAIRS into dedup DECISIONS (keep one doc
    per cluster), run after MinHash/SimHash/cosine candidate generation.

    Min-label propagation with a pointer-doubling step (the classic
    MapReduce CC construction, cf. Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): each round
    (1) every node takes the min label over its neighbors,
    (2) labels chase their own label's label — so chains collapse in
    O(log diameter) rounds, not O(diameter). Both lookups are
    co-partitioned message-passing groupbys (NOT ``Dataset.join``:
    Ray's map operators pass empty blocks through without invoking the
    UDF, so the 0-column empty blocks the join operator emits for
    unpopulated partitions can never be re-schema'd and poison any
    downstream join — sort/groupby shuffles tolerate them). Every
    round shuffles only fixed-width int64 rows; the label frontier is
    materialized between rounds (iterative algorithms checkpoint
    between supersteps by nature — blocks live in the object store,
    never on the driver). Convergence is detected by the sum of
    labels, which is strictly decreasing until fixpoint.

    Hybrid sizing: a pandas pair list ≤ ``driver_limit`` rows takes an
    in-core union-find instead — the pair graph is the already-verified
    near-dup EDGE set, orders of magnitude smaller than the corpus, and
    each distributed superstep costs a full shuffle round-trip
    (measured 21 s for a 920-edge graph, 0.01 s in-core). The
    distributed path remains for Dataset inputs / larger graphs;
    property tests pin both paths equal.
    """
    if isinstance(pairs, pd.DataFrame) and len(pairs) <= driver_limit:
        if not len(pairs):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "cluster_id": pd.Series(dtype=np.int64)})
        return _union_find_components(pairs, id_a, id_b) \
            .sort_values("node", ignore_index=True)
    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs[[id_a, id_b]]) if len(pairs) else None
    if pairs is None:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "cluster_id": pd.Series(dtype=np.int64)})
    labels = _cc_labels(pairs, id_a, id_b,
                        default_partitions(num_partitions, per_cpu=1),
                        max_rounds)
    out = labels.to_pandas()
    out.columns = ["node", "cluster_id"]
    return (out.astype(np.int64)
            .sort_values("node", ignore_index=True))


def _cc_labels(pairs: rd.Dataset, id_a: str, id_b: str,
               num_partitions: int, max_rounds: int) -> rd.Dataset:
    """The distributed CC supersteps; returns the converged
    (node, label) Dataset (label = min node id in the component)."""
    lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    # message rows: tag 0 = "table" (key=node, val=label),
    #               tag 1 = "query" (key=lookup key, val=output node)
    msg_schema = pa.schema([("_h", pa.int32()), ("key", pa.int64()),
                            ("val", pa.int64()), ("tag", pa.int8())])

    def _bucket(key: np.ndarray) -> np.ndarray:
        return (((key.astype(np.uint64) * np.uint64(2654435761))
                 >> np.uint64(7)) % np.uint64(num_partitions)) \
            .astype(np.int32)

    def _msgs(key: np.ndarray, val: np.ndarray, tag: int) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(_bucket(key)), pa.array(key.astype(np.int64)),
             pa.array(val.astype(np.int64)),
             pa.array(np.full(len(key), tag, dtype=np.int8))],
            schema=msg_schema)

    def edge_queries(b: pa.Table) -> pa.Table:
        u = np.asarray(b[id_a], dtype=np.int64)
        v = np.asarray(b[id_b], dtype=np.int64)
        d = pd.DataFrame({"k": np.concatenate([u, v]),
                          "v": np.concatenate([v, u])}).drop_duplicates()
        return _msgs(d["k"].to_numpy(), d["v"].to_numpy(), 1)

    # (key=node, val=nbr) queries, both directions, batch-local deduped.
    # Every materialize point coalesces to num_partitions blocks: each
    # groupby otherwise emits ~200 near-empty blocks (the context's
    # default shuffle parallelism), and stacking those per round turns
    # the supersteps into thousands of millisecond tasks — measured
    # 1.7 s → 18 s per round by round 3 on a 200-edge graph.
    equeries = pairs.map_batches(edge_queries, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if equeries.count() == 0:
        return rd.from_arrow(lbl_schema.empty_table())

    def resolve(g: pd.DataFrame) -> pa.Table:
        """One bucket: answer every query row from the table rows —
        emits (node=query.val, label=table.label(query.key))."""
        t = g[g["tag"] == 0][["key", "val"]].rename(columns={"val": "lbl"})
        q = g[g["tag"] == 1]
        m = q.merge(t, on="key", how="inner")
        return pa.Table.from_arrays(
            [pa.array(m["val"].to_numpy(np.int64)),
             pa.array(m["lbl"].to_numpy(np.int64))], schema=lbl_schema)

    def lookup(queries: rd.Dataset, labels: rd.Dataset) -> rd.Dataset:
        tbl = labels.map_batches(
            lambda b: _msgs(np.asarray(b["node"], dtype=np.int64),
                            np.asarray(b["label"], dtype=np.int64), 0),
            batch_format="pyarrow")
        return queries.union(tbl).groupby("_h") \
            .map_groups(resolve, batch_format="pandas")

    def min_label(ds: rd.Dataset) -> rd.Dataset:
        return ds.groupby("node") \
            .aggregate(Min("label", alias_name="label")) \
            .repartition(num_partitions)

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(np.asarray(b["key"], dtype=np.int64))
        return pa.Table.from_arrays([pa.array(n), pa.array(n)],
                                    schema=lbl_schema)

    # batch-local unique; global dedup happens in the first min
    labels = min_label(equeries.map_batches(
        init_labels, batch_format="pyarrow")).materialize()
    prev_sum = None
    for _ in range(max_rounds):
        # (1) neighbor min: for edge (n, m), propose label(n) to m
        prop = lookup(equeries, labels)
        half = min_label(labels.union(prop)).materialize()
        # (2) pointer doubling: label(n) ← min(label(n), label(label(n)))
        dbl_q = half.map_batches(
            lambda b: _msgs(np.asarray(b["label"], dtype=np.int64),
                            np.asarray(b["node"], dtype=np.int64), 1),
            batch_format="pyarrow")
        hop = lookup(dbl_q, half)
        labels = min_label(half.union(hop)).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


# ---------------------------------------------------------------------------
# Incremental exact dedup against a persistent fingerprint store
# ---------------------------------------------------------------------------

def incremental_exact_dedup(ds: rd.Dataset, store_dir: str, run_id: str,
                            out_dir: str, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_buckets: int = 32) -> rd.Dataset:
    """Exact dedup ACROSS ingestion runs: keep only docs whose
    normalized-text fingerprint has never been seen by any PRIOR run,
    recording this run's fingerprints so the next feed skips them —
    the corpus-refresh primitive (the incremental analog of
    exact_dedup, and the dedup counterpart of the flagship's
    incremental checkpoint: webalizer's -p flag re-derives "already
    counted" from webalizer.current; here the store IS that state).

    Layout: ``store_dir/bucket=K/run-<run_id>.parquet`` holds the
    fingerprints bucket K gained in run ``run_id``; kept ids land in
    ``out_dir/bucket=K.parquet``. Each bucket task reads every store
    file EXCEPT its own run's — so a rerun of the same ``run_id``
    (crash recovery, task retry) recomputes the identical kept set and
    atomically overwrites the same two files: the whole operation is
    idempotent with no commit ordering to get wrong. Only
    (fingerprint, id) pairs shuffle; per-bucket store reads are
    column-pruned. At cluster scale store/out are shared-store paths
    (same contract as the checkpoint dirs).

    Within one run, duplicate texts keep min(id) (same rule as
    exact_dedup). Returns the kept (id_col, fingerprint) Dataset.

    num_buckets is a LAYOUT CONSTANT: the store's bucket dirs persist
    across runs and a later run must hash fingerprints with the SAME
    modulus to find them, so it must never derive from the live
    session size.
    """
    os.makedirs(out_dir, exist_ok=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = add_fingerprint(df, text_col)
        g = f.groupby("fingerprint", sort=False)[id_col].min().reset_index()
        g["_bk"] = (g["fingerprint"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return g

    def bucket_task(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_bk"].iat[0])
        # min-id per fingerprint across ALL of this run's batches
        g = g.groupby("fingerprint", sort=False)[id_col].min().reset_index()
        bdir = os.path.join(store_dir, f"bucket={bk}")
        os.makedirs(bdir, exist_ok=True)
        own = f"run-{run_id}.parquet"
        seen_files = [os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                      if f.endswith(".parquet") and f != own]
        if seen_files:
            seen = pq.read_table(seen_files,
                                 columns=["fingerprint"])["fingerprint"] \
                .to_numpy(zero_copy_only=False)
            kept = g[~g["fingerprint"].isin(seen)]
        else:
            kept = g
        kept = kept.sort_values(id_col, ignore_index=True)

        def atomic_write(df: pd.DataFrame, path: str) -> None:
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           tmp)
            os.replace(tmp, path)

        atomic_write(kept[[id_col, "fingerprint"]],
                     os.path.join(out_dir, f"bucket={bk}.parquet"))
        atomic_write(kept[["fingerprint"]], os.path.join(bdir, own))
        return kept[[id_col, "fingerprint"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_bk").map_groups(bucket_task, batch_format="pandas"))


def semantic_dedup(ds: rd.Dataset, threshold: float = 0.9,
                   n_clusters: int = 8, n_iter: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   seed: int = 7,
                   as_dataset: bool = False,
                   out_dir: str | None = None
                   ) -> pd.DataFrame | rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public construction): spherical k-means buckets
    the embedding space, then near-duplicates are found ONLY within
    each cluster, turning the O(N²) pairwise problem into k problems of
    O((N/k)²) — at corpus scale k is chosen ∝ N so cluster size stays
    bounded (the paper uses ~100k vectors per cluster).

    Pipeline shape: the Lloyd fit shuffles k partial-sum rows per batch
    per iteration (ann._kmeans_loop); the final centroids are broadcast
    ONCE (``ray.put``) into a distributed assignment pass that carries
    each normalized vector as packed bytes; a per-cluster ``map_groups``
    computes the within-cluster cosine matrix (blocked matmul) and
    applies the deterministic min-id keeper rule: drop row j iff some
    i < j in the SAME cluster has cos(i, j) >= threshold (matches
    exact_dedup's keeper convention; dropped rows still knock out later
    ones, i.e. chain removal). Per-doc verdicts never gather anywhere
    except the final result.

    Returns (id, cluster, keep) sorted by id.
    """
    from webalizer_ray.stages.ann import _normalize, kmeans_fit

    cents = kmeans_fit(ds, n_clusters=n_clusters, n_iter=n_iter,
                       seed=seed, id_col=id_col, vec_col=vec_col)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pd.DataFrame:
        # same 9 dp rounding convention as ann._kmeans_loop (r3): the
        # assignment and the within-cluster cosines become
        # engine-independent, so the query carries a SQL oracle
        c = ray.get(cents_ref)
        m = np.round(_normalize(mat_from_column(batch[vec_col])), 9)
        return pd.DataFrame({
            id_col: ids_from_column(batch[id_col]),
            "cluster": np.argmax(np.round(m @ c.T, 9),
                                 axis=1).astype(np.int64),
            "vec": [r.tobytes() for r in m]})

    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        m = np.frombuffer(b"".join(g["vec"]), dtype=np.float64) \
            .reshape(len(g), -1)
        keep = np.ones(len(g), dtype=bool)
        # blocked lower-triangular scan: row block vs ALL earlier rows
        blk = 2048
        for s in range(1, len(g), blk):
            e = min(s + blk, len(g))
            sims = np.round(m[s:e] @ m[:e].T, 9)  # (e-s, e)
            for r in range(s, e):
                if (sims[r - s, :r] >= threshold).any():
                    keep[r] = False
        return pd.DataFrame({id_col: g[id_col], "cluster": g["cluster"],
                             "keep": keep})

    verdicts = (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("cluster")
                .map_groups(cluster_dedup, batch_format="pandas"))
    if out_dir is not None:
        verdicts = verdicts.materialize()
        verdicts.write_parquet(out_dir)
    if as_dataset:
        # corpus-scale contract: per-vector verdicts stay distributed
        return verdicts
    return verdicts.to_pandas().sort_values(id_col, ignore_index=True)


def shared_span_pairs(docs: rd.Dataset, n: int = 20,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_buckets: int | None = None) -> pd.DataFrame:
    """Train-train duplicate-SPAN detection (the bounded cousin of
    suffix-array substring dedup, Lee et al. "Deduplicating Training
    Data Makes Language Models Better", ACL 2022 — public
    construction): every doc pair sharing at least one word n-gram
    span, with the count of shared spans.

    Shape: each doc's distinct span hashes are emitted batch-locally
    (fixed-width int64 rows, never text), hashed into ``num_buckets``
    span-hash buckets, and each bucket resolves its pairs with ONE
    vectorized self-merge (no per-span group calls, no Python pair
    loops); per-bucket (id_a, id_b, c) partials then combine — a
    (pair, span) lives in exactly one bucket, so the sum is exact.
    A span shared by k docs inherently yields C(k,2) pairs — that IS
    the output; production runs cap boilerplate with a df filter
    first (drop spans with document frequency > cap), which this
    keeps off to stay oracle-exact.
    """
    # the bucket id is a BITMASK (sh & (B-1)) — round the derived
    # fan-out down to a power of two
    num_buckets = 1 << (default_partitions(num_buckets).bit_length() - 1)
    sh = docs.map_batches(
        lambda b: _shingle_hash_table(b, n, id_col, text_col, True),
        batch_format="pyarrow")

    def with_bucket(b: pa.Table) -> pa.Table:
        bk = pc.cast(pc.bit_wise_and(b["sh"], pa.scalar(num_buckets - 1)),
                     pa.int32())
        return b.append_column("bk", bk)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g[[id_col, "sh"]].merge(g[[id_col, "sh"]], on="sh")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        c = m.groupby([f"{id_col}_x", f"{id_col}_y"], sort=False) \
            .size().reset_index(name="c")
        return pd.DataFrame({"id_a": c[f"{id_col}_x"].to_numpy(np.int64),
                             "id_b": c[f"{id_col}_y"].to_numpy(np.int64),
                             "c": c["c"].to_numpy(np.int64)})

    pairs = (sh.map_batches(with_bucket, batch_format="pyarrow")
             .groupby("bk").map_groups(bucket_pairs,
                                       batch_format="pandas"))
    from webalizer_ray.stages.aggregate import reduce_sink
    out = reduce_sink(pairs, ["id_a", "id_b"],
                      {"shared_spans": ("c", "sum")}).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "shared_spans": pd.Series(dtype=np.int64)})
    out["shared_spans"] = out["shared_spans"].astype(np.int64)
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def incremental_minhash_dedup(ds: rd.Dataset, store_dir: str, run_id: str,
                              id_col: str = "doc_id",
                              text_col: str = "text", num_perm: int = 64,
                              bands: int = 16, threshold: float = 0.7,
                              shingle_k: int = 5, seed: int = 7,
                              num_buckets: int = 32,
                              concurrency=2,
                              out_dir: str | None = None
                              ) -> tuple[rd.Dataset, rd.Dataset]:
    """FUZZY dedup ACROSS ingestion runs — the near-dup counterpart of
    incremental_exact_dedup (corpus refresh: drop new docs that are
    near-duplicates of anything any PRIOR run kept).

    Store layout (shared-store paths at cluster scale, same contract
    as the checkpoint dirs):
      ``store_dir/bands/bucket=K/run-<id>.parquet`` (band, band_hash, id)
      ``store_dir/sigs/bucket=K/run-<id>.parquet``  (id, sig)
    A new doc becomes a CANDIDATE when any of its LSH band hashes
    collides with a prior run's band row (bucket task reads only its
    own band bucket, all runs except its own — so same-``run_id``
    reruns are idempotent); candidates verify distributed against the
    signature store via a per-old-bucket merge (Broder's resemblance
    estimator over the 64 minhashes — no driver broadcast of either
    side). Within-run near-dups are NOT this op's job: run
    minhash_lsh_pairs/exact_dedup on the batch first.

    Returns (kept, drops) as DATASETS — kept = (id_col,) rows, drops =
    (id_col, matched_id, est_jaccard) with the best (highest-estimate,
    then lowest matched_id) prior match per dropped id. Nothing
    O(corpus) is ever gathered on the driver (VERDICT r2 item 1): the
    kept set is derived per id-bucket by subtracting that bucket's
    dropped ids from the run's own stored signature file, so only DROP
    rows shuffle. With ``out_dir`` the kept ids are also written as
    partitioned Parquet. sf-scale callers `.to_pandas()` the results.

    num_buckets is a LAYOUT CONSTANT: band/sig bucket dirs persist
    across runs and later runs must hash with the SAME modulus to find
    prior rows — never derive it from the live session size.
    """
    bands_dir = os.path.join(store_dir, "bands")
    sigs_dir = os.path.join(store_dir, "sigs")
    os.makedirs(bands_dir, exist_ok=True)
    os.makedirs(sigs_dir, exist_ok=True)
    own = f"run-{run_id}.parquet"

    def _atomic(df: pd.DataFrame, path: str) -> None:
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp)
        os.replace(tmp, path)

    sigs = ds.map_batches(
        MinHashSignatures, batch_format="pandas",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, text_col=text_col),
        concurrency=concurrency).materialize()

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(df["sig"].to_numpy())
        bh = _band_hashes(sig, bands)
        n = len(df)
        out = pd.DataFrame({
            "band": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_hash": bh.T.reshape(-1).astype(np.int64),
            id_col: np.tile(df[id_col].to_numpy(), bands)})
        out["_bk"] = ((out["band_hash"].to_numpy(np.uint64)
                       ^ (out["band"].to_numpy(np.uint64)
                          * np.uint64(0x9E3779B97F4A7C15)))
                      % np.uint64(num_buckets)).astype(np.int32)
        return out

    cand_schema = pa.schema([(id_col, pa.int64()),
                             ("old_id", pa.int64())])

    def band_bucket_task(g: pd.DataFrame) -> pa.Table:
        bk = int(g["_bk"].iat[0])
        g = g.drop(columns=["_bk"]).drop_duplicates()
        bdir = os.path.join(bands_dir, f"bucket={bk}")
        os.makedirs(bdir, exist_ok=True)
        prior_files = [os.path.join(bdir, f)
                       for f in sorted(os.listdir(bdir))
                       if f.endswith(".parquet") and f != own]
        _atomic(g, os.path.join(bdir, own))
        if not prior_files:
            # explicit-schema empty Arrow table: all-empty pandas
            # blocks lose column names and would poison the join
            return cand_schema.empty_table()
        prior = pq.read_table(prior_files).to_pandas() \
            .rename(columns={id_col: "old_id"})
        cand = g.merge(prior, on=["band", "band_hash"]) \
            [[id_col, "old_id"]].drop_duplicates()
        return pa.Table.from_pandas(cand, schema=cand_schema,
                                    preserve_index=False)

    # materialized: runs the band-store writes exactly once, and lets
    # the no-candidates case (first run / all-novel feed) short-circuit
    # — all-empty pandas blocks lose their schema and would break the
    # verify join
    cands = sigs.map_batches(band_rows, batch_format="pandas") \
        .groupby("_bk").map_groups(band_bucket_task,
                                   batch_format="pandas").materialize()

    # publish this run's signatures (bucketed by id) BEFORE the verify
    # pass — verify reads all-except-own, so ordering is safe either way
    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "sig"]].copy()
        out["_sk"] = (out[id_col].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return out

    def sig_bucket_task(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_sk"].iat[0])
        sdir = os.path.join(sigs_dir, f"bucket={bk}")
        os.makedirs(sdir, exist_ok=True)
        _atomic(g.drop(columns=["_sk"]).drop_duplicates(id_col),
                os.path.join(sdir, own))
        return pd.DataFrame({"bucket": [np.int64(bk)]})

    sigs.map_batches(sig_rows, batch_format="pandas") \
        .groupby("_sk").map_groups(sig_bucket_task,
                                   batch_format="pandas").materialize()

    drops_schema = pa.schema([(id_col, pa.int64()),
                              ("matched_id", pa.int64()),
                              ("est_jaccard", pa.float64())])
    if cands.count() == 0:
        kept = sigs.select_columns([id_col])
        if out_dir is not None:
            kept = kept.materialize()
            kept.write_parquet(out_dir)
        return kept, rd.from_arrow(drops_schema.empty_table())

    # verify: join candidates back to this run's signatures (bucketed
    # hash join semantics via Dataset.join), then one task per OLD
    # bucket merges against that bucket's stored signatures. The
    # signature rides the join as PACKED BYTES — Acero joins reject
    # Ray's tensor-extension payload columns (same trick as
    # semantic_dedup's packed vectors).
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "sigb": [np.asarray(s, np.uint64).tobytes()
                     for s in df["sig"]]})

    j = cands.join(sigs.map_batches(pack, batch_format="pandas"),
                   join_type="inner", num_partitions=join_partitions(),
                   on=(id_col,), right_on=(id_col,))

    def add_obk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_obk"] = (df["old_id"].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return df

    def verify_task(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_obk"].iat[0])
        sdir = os.path.join(sigs_dir, f"bucket={bk}")
        files = [os.path.join(sdir, f) for f in sorted(os.listdir(sdir))
                 if f.endswith(".parquet") and f != own] \
            if os.path.isdir(sdir) else []
        if not files:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "matched_id": pd.Series(dtype=np.int64),
                                 "est_jaccard": pd.Series(
                                     dtype=np.float64)})
        old = pq.read_table(files).to_pandas() \
            .rename(columns={id_col: "old_id", "sig": "old_sig"})
        m = g.merge(old, on="old_id")
        if not len(m):
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "matched_id": pd.Series(dtype=np.int64),
                                 "est_jaccard": pd.Series(
                                     dtype=np.float64)})
        a = np.stack([np.frombuffer(s, np.uint64) for s in m["sigb"]])
        b = np.stack(m["old_sig"].to_numpy())
        est = (a == b).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({id_col: m[id_col].to_numpy(np.int64)[keep],
                             "matched_id": m["old_id"]
                             .to_numpy(np.int64)[keep],
                             "est_jaccard": np.round(est[keep], 6)})

    def best_match(g: pd.DataFrame) -> pd.DataFrame:
        # one dropped id may match priors in several old buckets —
        # keep the highest-estimate (ties: lowest matched_id) row
        g = g.sort_values([id_col, "est_jaccard", "matched_id"],
                          ascending=[True, False, True])
        return g.drop_duplicates(id_col)

    drops = j.map_batches(add_obk, batch_format="pandas") \
        .groupby("_obk").map_groups(verify_task, batch_format="pandas") \
        .groupby(id_col).map_groups(best_match, batch_format="pandas") \
        .materialize()
    if drops.count() == 0:
        # all candidates failed verify — schema-degraded empty blocks
        # must not reach the union below
        kept = sigs.select_columns([id_col])
        if out_dir is not None:
            kept = kept.materialize()
            kept.write_parquet(out_dir)
        return kept, rd.from_arrow(drops_schema.empty_table())

    # kept = this run's ids minus dropped ids, per id-bucket: route the
    # (small) drop rows to their id bucket, union a one-row-per-bucket
    # spine so bucket tasks with zero drops still emit their kept ids,
    # and subtract inside the task against the run's own sig file for
    # that bucket (written above). Only drop rows + num_buckets spine
    # rows shuffle; kept ids go driver-free into the returned Dataset.
    spine = pd.DataFrame({
        "_sk": np.arange(num_buckets, dtype=np.int32),
        id_col: np.full(num_buckets, -1, dtype=np.int64)})

    def drop_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: df[id_col].to_numpy(np.int64)})
        out["_sk"] = (out[id_col].to_numpy(np.int64)
                      % num_buckets).astype(np.int32)
        return out

    kept_schema = pa.schema([(id_col, pa.int64())])

    def kept_bucket_task(g: pd.DataFrame) -> pa.Table:
        bk = int(g["_sk"].iat[0])
        path = os.path.join(sigs_dir, f"bucket={bk}", own)
        if not os.path.exists(path):
            return kept_schema.empty_table()
        mine = pq.read_table(path, columns=[id_col])[id_col] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dropped = g[g[id_col] >= 0][id_col].to_numpy(np.int64)
        keep = mine[~np.isin(mine, dropped)]
        return pa.Table.from_arrays([pa.array(np.sort(keep))],
                                    schema=kept_schema)

    kept = (drops.map_batches(drop_keys, batch_format="pandas")
            .union(rd.from_pandas(spine))
            .groupby("_sk")
            .map_groups(kept_bucket_task, batch_format="pandas"))
    if out_dir is not None:
        kept = kept.materialize()
        kept.write_parquet(out_dir)
    return kept, drops
