"""Dedup operator tests: scale guards + LSH/exact agreement.

Covers the round-2 scale-safety work: degenerate-bucket capping (no
O(n²) pair blowup on a cluster of identical docs), the in-cluster
join-based verify paths, and the LSH cosine variant's agreement with the
exact all-pairs baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages import dedup


@pytest.fixture()
def rd_mod(ray_session):
    import ray.data as rd
    return rd


def test_skewed_identical_docs_capped(rd_mod):
    """1k identical docs: the band buckets are degenerate; the cap must
    emit the consecutive chain (n-1 pairs per band), not O(n²)."""
    n_dup, n_other = 1000, 20
    texts = ["the same document body repeated many times over"] * n_dup + [
        f"unique document number {i} with its own words" for i in
        range(n_other)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd_mod.from_pandas(df).repartition(4)
    out = dedup.minhash_lsh_pairs(ds, threshold=0.9, bucket_cap=64,
                                  concurrency=1)
    # chain pairs of the duplicate cluster, est_jaccard exactly 1.0
    dup_pairs = out[(out["id_a"] < n_dup) & (out["id_b"] < n_dup)]
    assert len(out) < 5 * (n_dup + n_other)      # nowhere near n²/2
    assert (dup_pairs["est_jaccard"] == 1.0).all()
    # the chain keeps the cluster fully connected for union-find
    ids = np.union1d(dup_pairs["id_a"], dup_pairs["id_b"])
    assert len(ids) == n_dup
    parent = np.arange(n_dup)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(dup_pairs["id_a"], dup_pairs["id_b"]):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n_dup)}) == 1


def test_ngram_decontaminate_known_overlaps(rd_mod):
    """Hand-built train/val with known 3-gram overlaps: exactly the
    contaminated train ids come back, case-insensitively, and docs
    shorter than n emit nothing."""
    train = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": ["the quick brown fox jumps",        # shares "quick brown fox"
                 "totally clean training text here",
                 "THE QUICK BROWN cat sits",          # shares via lowercase
                 "short one"]})                       # < n tokens: no shingles
    val = pd.DataFrame({
        "doc_id": np.array([100, 101], dtype=np.int64),
        "text": ["a quick brown fox appears", "the quick brown dog"]})
    out = dedup.ngram_decontaminate(
        rd_mod.from_pandas(train).repartition(2),
        rd_mod.from_pandas(val), n=3)
    assert out["doc_id"].tolist() == [0, 2]
    # empty val side → nothing contaminated
    empty = dedup.ngram_decontaminate(
        rd_mod.from_pandas(train),
        rd_mod.from_pandas(val.iloc[:0]), n=3)
    assert len(empty) == 0


def test_ngram_distributed_equals_driver_verify(rd_mod):
    texts = ["alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon eta",
             "completely different words here now",
             "alpha beta gamma delta epsilon zeta"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    pairs = pd.DataFrame({"id_a": [0, 0, 0, 1],
                          "id_b": [1, 2, 3, 2]}).astype(np.int64)
    want = dedup.ngram_jaccard_verify(dict(zip(df["doc_id"], df["text"])),
                                      pairs, n=3, threshold=0.3)
    got = dedup.ngram_jaccard_pairs_distributed(
        rd_mod.from_pandas(df), pairs, n=3, threshold=0.3)
    pd.testing.assert_frame_equal(
        got.sort_values(["id_a", "id_b"], ignore_index=True),
        want.sort_values(["id_a", "id_b"], ignore_index=True))


def test_cosine_lsh_equals_exact_all_pairs(rd_mod):
    """LSH-bucketed cosine dedup reproduces the exact all-pairs result
    (full recall at the default (k, L); exact cosines verified)."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((150, 32))
    # plant 30 near-dup partners: small perturbations of existing rows
    noisy = base[:30] + 0.55 * rng.standard_normal((30, 32))
    vecs = np.vstack([base, noisy])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd_mod.from_pandas(df).repartition(4)
    exact = dedup.cosine_dup_pairs(ds, threshold=0.4)
    lsh = dedup.cosine_dup_pairs_lsh(ds, threshold=0.4, n_planes=4,
                                     n_tables=48)
    assert len(exact) > 10          # the planted dups actually exist
    pd.testing.assert_frame_equal(lsh, exact)


def test_connected_components_basic(rd_mod):
    """Chain + disjoint pair + triangle → three components labeled by
    their min node; output covers exactly the nodes seen in pairs."""
    pairs = pd.DataFrame({"id_a": [0, 1, 2, 10, 20, 21, 22],
                          "id_b": [1, 2, 3, 11, 21, 22, 20]})
    want = {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10,
            20: 20, 21: 20, 22: 20}
    for lim in (2_000_000, 0):      # in-core union-find / distributed
        out = dedup.connected_components(pairs, driver_limit=lim)
        assert dict(zip(out["node"], out["cluster_id"])) == want, lim


def test_connected_components_long_chain(rd_mod):
    """A 64-node path collapses to one component — pointer doubling
    means O(log n) supersteps, and max_rounds=40 >> log2(64)."""
    n = 64
    pairs = pd.DataFrame({"id_a": np.arange(n - 1, dtype=np.int64),
                          "id_b": np.arange(1, n, dtype=np.int64)})
    for lim in (2_000_000, 0):
        out = dedup.connected_components(pairs, driver_limit=lim)
        assert len(out) == n
        assert (out["cluster_id"] == 0).all()


def test_connected_components_empty(rd_mod):
    out = dedup.connected_components(
        pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                      "id_b": pd.Series(dtype=np.int64)}))
    assert len(out) == 0
    assert list(out.columns) == ["node", "cluster_id"]


def test_connected_components_skewed_star(rd_mod):
    """Hot-key star (every node paired with node 0) — one component,
    min label 0, and the per-bucket message-passing path handles the
    skewed degree without all-pairs blowup."""
    n = 300
    pairs = pd.DataFrame({"id_a": np.zeros(n - 1, dtype=np.int64),
                          "id_b": np.arange(1, n, dtype=np.int64)})
    for lim in (2_000_000, 0):
        out = dedup.connected_components(pairs, driver_limit=lim)
        assert len(out) == n
        assert (out["cluster_id"] == 0).all()


def test_incremental_dedup_store_rounds(rd_mod, tmp_path):
    """Run 1 keeps all distinct texts; re-feeding the same corpus as
    run 2 keeps nothing; run 3's mixed feed keeps only the new docs.
    Re-running run 1 (crash/retry semantics) reproduces its kept set
    byte-identically even though the store now holds later runs."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    a = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                      "text": ["t0", "t1", "t2", "t0", "t3", "t1"]})
    k1 = dedup.incremental_exact_dedup(
        rd_mod.from_pandas(a), store, "r1", out + "1").to_pandas()
    assert sorted(k1["doc_id"]) == [0, 1, 2, 4]     # min-id per text

    k2 = dedup.incremental_exact_dedup(
        rd_mod.from_pandas(a), store, "r2", out + "2").to_pandas()
    assert len(k2) == 0                              # all seen

    b = pd.DataFrame({"doc_id": np.arange(10, 14, dtype=np.int64),
                      "text": ["t1", "t9", "t9", "t8"]})
    k3 = dedup.incremental_exact_dedup(
        rd_mod.from_pandas(b), store, "r3", out + "3").to_pandas()
    assert sorted(k3["doc_id"]) == [11, 13]          # only t9, t8 new

    k1b = dedup.incremental_exact_dedup(
        rd_mod.from_pandas(a), store, "r1", out + "1b").to_pandas()
    pd.testing.assert_frame_equal(
        k1b.sort_values("doc_id", ignore_index=True),
        k1.sort_values("doc_id", ignore_index=True))


def test_shared_span_pairs_planted(ray_session):
    """Two docs sharing exactly one 20-token span (at different
    offsets) are found with shared_spans == 1; unrelated docs are not
    paired; a 21-token shared run yields 2 overlapping spans."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.dedup import shared_span_pairs

    span20 = " ".join(f"w{i}" for i in range(20))
    span21 = " ".join(f"v{i}" for i in range(21))
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "alpha " + span20 + " beta",
            "gamma delta " + span20,
            "totally unrelated text with enough words " * 5,
            span21 + " tail",
            "head " + span21,
        ]})
    out = shared_span_pairs(rd.from_pandas(docs), n=20)
    got = {(a, b): c for a, b, c in
           zip(out["id_a"], out["id_b"], out["shared_spans"])}
    assert got[(0, 1)] == 1
    assert got[(3, 4)] == 2          # 21-token run = 2 sliding 20-spans
    assert set(got) == {(0, 1), (3, 4)}


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    """No verified near-dup pair may straddle the train/val cut, and the
    cluster-aware split must conserve totals vs the naive id split."""
    from webalizer_ray.pipelines.queries import (
        cosine_dup_clusters,
        cosine_dup_pairs,
        leakage_safe_split_counts,
    )

    sf = "/root/testdata/sf0.001"
    cl = cosine_dup_clusters(sf)
    rep = dict(zip(cl["node"], cl["cluster_id"]))

    def split_of(vec_id: int) -> str:
        return "train" if rep.get(vec_id, vec_id) % 10 < 8 else "val"

    pairs = cosine_dup_pairs(sf)
    assert len(pairs), "fixture must contain verified near-dup pairs"
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert split_of(int(a)) == split_of(int(b)), (a, b)

    counts = leakage_safe_split_counts(sf)
    n = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id"]).shape[0]
    assert int(counts["vecs"].sum()) == n
    # a cluster with members on both sides of the naive cut must exist,
    # otherwise this test is vacuous
    naive = {v: ("train" if v % 10 < 8 else "val") for v in rep}
    moved = [v for v, r in rep.items() if naive[v] != split_of(v)]
    assert moved, "fixture has no cluster spanning the naive cut"


def test_dhash_pairs_equal_brute_force_and_find_planted(ray_session):
    """n_chunks=8 > max_hamming=6 ⇒ banding recall is exact: the
    distributed pair set must EQUAL driver brute force, and every
    planted variant (format flip, 2× upscale, noised copy) must pair
    with its base."""
    from webalizer_ray.pipelines.queries import media_image_dhash_pairs
    from webalizer_ray.stages.multimodal import (
        decode_bmp,
        decode_ppm,
        dhash64,
        synth_image_dup_table,
    )

    got = media_image_dhash_pairs("unused")
    got_set = set(zip(got["id_a"], got["id_b"]))

    t = synth_image_dup_table().to_pandas()
    px = {r.media_id: (decode_ppm(r.payload) if r.payload[:2] == b"P6"
                       else decode_bmp(r.payload))
          for r in t.itertuples()}
    h = {m: int(dhash64(p)) for m, p in px.items()}
    ids = sorted(h)
    brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(h[a] ^ h[b]).count("1") <= 6}
    assert got_set == brute

    base = t[t.variant == "base"].set_index("base_id")["media_id"]
    planted_found = 0
    for r in t[t.variant != "base"].itertuples():
        a, b = sorted((int(base[r.base_id]), int(r.media_id)))
        if bin(h[a] ^ h[b]).count("1") <= 6:
            assert (a, b) in got_set, (a, b, r.variant)
            planted_found += 1
    assert planted_found >= 100   # 144 planted variants, noise mostly <=6
    # non-vacuous: at least one pair needed the tolerance (hamming > 0)
    assert (got["hamming"] > 0).any()
