"""strhash (SplitMix64 tabulation) ↔ DuckDB SQL replay parity.

The r4 oracle story for the MinHash/SimHash/fingerprint family rests on
one claim: the engine's string hashing is bit-replayable in SQL integer
arithmetic. These tests check the claim on RANDOM inputs — not just the
driver fixture — by running the SQL builders against in-memory DuckDB
tables and comparing uint64-for-uint64.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from webalizer_ray.stages.sketch import splitmix64
from webalizer_ray.stages.strhash import (
    CP_STRIDE,
    NORM_SQL,
    normalize,
    shingle_hashes,
    sm64_ctes,
    string_hashes,
)


def _rand_texts(rng, n, alphabet, maxlen=40):
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, maxlen))
        out.append("".join(rng.choice(alphabet, ln)))
    return out


def test_string_hashes_match_bruteforce():
    rng = np.random.default_rng(0)
    alpha = list("abc XY9\t\n é☃")
    texts = _rand_texts(rng, 200, alpha) + ["", " ", "a", "\t\n"]
    got = string_hashes(texts)
    for t, h in zip(texts, got):
        want = np.uint64(0)
        for j, ch in enumerate(t):
            want ^= splitmix64(np.uint64(j) * CP_STRIDE
                               + np.uint64(ord(ch)))
        assert h == want, repr(t)


def test_shingle_hashes_match_bruteforce():
    rng = np.random.default_rng(1)
    texts = [normalize(t) for t in
             _rand_texts(rng, 80, list("ab cd"), 12)]
    flat, counts = shingle_hashes(texts, 5)
    pos = 0
    for t, c in zip(texts, counts):
        if len(t) >= 5:
            shingles = [t[i:i + 5] for i in range(len(t) - 4)]
        else:
            shingles = [t]
        assert c == len(shingles)
        assert (flat[pos:pos + c] == string_hashes(shingles)).all(), \
            repr(t)
        pos += c


def test_sql_replay_matches_engine_on_random_corpus():
    """End-to-end: fingerprints of random texts computed by the engine
    equal the sm64_ctes SQL replay in DuckDB (the exact construction
    the fingerprint_docs oracle uses)."""
    rng = np.random.default_rng(2)
    texts = _rand_texts(rng, 120, list("abcdefgh  XYZ.!?"), 60) + [""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    eng = string_hashes([normalize(t) for t in texts])
    con = duckdb.connect()
    con.register("documents", df)
    s = int(CP_STRIDE)
    sql = f"""WITH norm AS (
        SELECT doc_id, {NORM_SQL.format(col='text')} AS t FROM documents),
    chars AS (SELECT doc_id, i,
                     unicode(substring(t, CAST(i + 1 AS INT), 1)) AS cp
              FROM norm, unnest(range(length(t))) r(i)),
    {sm64_ctes('sm', 'chars', f'CAST(i AS UBIGINT) * {s} + cp',
               'doc_id')},
    fp AS (SELECT doc_id, bit_xor(h) AS f FROM sm GROUP BY doc_id)
    SELECT n.doc_id, CAST(COALESCE(fp.f, 0) AS UBIGINT) AS f
    FROM norm n LEFT JOIN fp USING (doc_id) ORDER BY n.doc_id"""
    ref = con.sql(sql).df()["f"].to_numpy(np.uint64)
    assert (ref == eng).all()


def test_normalize_equals_sql_normalization():
    """normalize() and NORM_SQL agree on whitespace-heavy inputs,
    including non-space edge whitespace (collapse BEFORE trim)."""
    texts = ["  A\t\tB  ", "\nhello\r\nWORLD\n", "", "   ", "ONE two",
             "a  b   c", "\tx\t"]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": texts}))
    ref = con.sql(
        f"SELECT {NORM_SQL.format(col='s')} AS n FROM t").df()["n"]
    for t, n in zip(texts, ref):
        assert normalize(t) == n, repr(t)


def test_minhash_engine_matches_sql_on_random_corpus(ray_session):
    """The full minhash_dup_pairs chain (engine) vs the full SQL replay
    (oracle builder) on a RANDOM planted-duplicate corpus — the oracle
    is not fixture-specific."""
    import ray.data as rd

    from webalizer_ray.pipelines.queries._dedup_sql import minhash_ctes
    from webalizer_ray.stages import dedup

    rng = np.random.default_rng(7)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"])
    base = [" ".join(rng.choice(vocab, int(rng.integers(8, 30))))
            for _ in range(40)]
    # plant near-dups: light one-word edits of the first ten docs
    edited = [t + " zz" for t in base[:10]]
    texts = base + edited
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ours = dedup.minhash_lsh_pairs(rd.from_pandas(df).repartition(3),
                                   threshold=0.5)
    con = duckdb.connect()
    con.register("documents", df)
    ref = con.sql(f"""WITH {minhash_ctes(0.5)}
SELECT id_a, id_b, est_jaccard FROM verified
ORDER BY id_a, id_b""").df()
    assert len(ours) == len(ref) and len(ref) >= 10
    assert (ours["id_a"].to_numpy() == ref["id_a"].to_numpy()).all()
    assert (ours["id_b"].to_numpy() == ref["id_b"].to_numpy()).all()
    assert np.allclose(ours["est_jaccard"], ref["est_jaccard"],
                       rtol=0, atol=1e-12)
