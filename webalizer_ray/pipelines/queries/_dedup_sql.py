"""DuckDB oracle SQL for the MinHash / SimHash / n-gram dedup family.

Round 4: the engine's shingle/token hashing moved from pandas' SipHash
to the SplitMix64 position-keyed tabulation in ``stages/strhash.py``,
which is replayable in portable SQL integer arithmetic — so the four
previously rows-only dedup queries (``minhash_dup_pairs``,
``minhash_dup_clusters``, ``simhash_dup_pairs``,
``ngram_jaccard_pairs``) now carry bit-exact independent oracles, the
same construction round 3 proved on HLL/CMS/PQ with integer keys.

The oracles rebuild the ENTIRE engine pipeline in SQL:
normalize → char-5-shingles → SplitMix64 tabulation hash → 64
"permutations" (``sm64(shingle_hash XOR c_p)``) → per-doc MIN →
16 bands of 4 → bucket grouping (with the engine's degenerate-bucket
chain degradation above ``bucket_cap``) → candidate pair dedup →
Broder resemblance verify (fraction of equal signature components).
Bucketing note: the engine groups buckets by a 64-bit polynomial
band-hash of the 4-signature tuple, the oracle by the tuple itself —
identical grouping unless the band-hash collides for unequal tuples
(p ≈ 2⁻⁶⁴ per bucket pair; a collision could only ADD an engine
candidate, and the verify step would still have to pass it).

Cost note: the ×64 permutation blowup is applied to the DISTINCT
shingle-hash set (typically ≪ total shingle instances) and joined
back per doc — this keeps the oracle seconds-fast at driver scale.
"""

from __future__ import annotations

from webalizer_ray.stages.strhash import CP_STRIDE, NORM_SQL, sm64_ctes

_S = int(CP_STRIDE)
#: engine MinHashSignatures default: c_p = sm64((seed << 32) + p + 1)
_SEED_BASE = 7 * (1 << 32)


def sig_ctes(src: str = "documents") -> str:
    """CTE chain (no WITH) ending in ``bandsig`` (doc_id, band, sigs);
    also defines ``norm`` and ``sig`` (doc_id, p, s).

    Mirrors ``dedup.MinHashSignatures`` + ``_band_hashes`` defaults:
    num_perm=64, bands=16 (r=4), shingle_k=5, seed=7.
    """
    norm = NORM_SQL.format(col="text")
    return f"""norm AS (SELECT doc_id, {norm} AS t FROM {src}),
sh0 AS (SELECT doc_id, i, j,
               unicode(substring(t, CAST(i + j + 1 AS INT), 1)) AS cp
        FROM norm,
             unnest(range(CASE WHEN length(t) >= 5
                          THEN length(t) - 4 ELSE 1 END)) r1(i),
             unnest(range(5)) r2(j)
        WHERE i + j < length(t)),
{sm64_ctes('smsh', 'sh0', f'CAST(j AS UBIGINT) * {_S} + cp', 'doc_id, i')},
shash AS (SELECT doc_id, i, bit_xor(h) AS sh FROM smsh
          GROUP BY doc_id, i),
dsh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM shash
        UNION SELECT doc_id, CAST(0 AS UBIGINT) FROM norm
              WHERE length(t) = 0),
ush AS (SELECT DISTINCT sh FROM dsh),
perms AS (SELECT CAST(p AS BIGINT) AS p FROM range(64) r(p)),
{sm64_ctes('smc', 'perms', f'CAST({_SEED_BASE} + p + 1 AS UBIGINT)', 'p')},
pk AS (SELECT u.sh, c.p, xor(u.sh, c.h) AS k FROM ush u CROSS JOIN smc c),
{sm64_ctes('smp', 'pk', 'k', 'sh, p')},
sig AS MATERIALIZED (SELECT d.doc_id, s.p, MIN(s.h) AS s
       FROM dsh d JOIN smp s ON s.sh = d.sh GROUP BY d.doc_id, s.p),
bandsig AS (SELECT doc_id, CAST(p // 4 AS BIGINT) AS band,
                   list(s ORDER BY p) AS sigs
            FROM sig GROUP BY doc_id, band)"""


def minhash_ctes(threshold: float, bucket_cap: int = 256,
                 src: str = "documents") -> str:
    """CTE chain (no WITH) ending in ``verified`` (id_a, id_b,
    est_jaccard ≥ threshold); also defines ``norm``, ``sig``.

    Mirrors ``dedup.minhash_lsh_pairs`` defaults on top of
    :func:`sig_ctes`, including the degenerate-bucket chain above
    ``bucket_cap``.
    """
    return f"""{sig_ctes(src)},
bm AS (SELECT band, sigs, doc_id,
              COUNT(*) OVER (PARTITION BY band, sigs) AS bsz,
              LEAD(doc_id) OVER (PARTITION BY band, sigs
                                 ORDER BY doc_id) AS nxt
       FROM bandsig),
rawp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bm a JOIN bm b ON a.band = b.band AND a.sigs = b.sigs
                            AND a.doc_id < b.doc_id
         WHERE a.bsz <= {bucket_cap}
         UNION ALL
         SELECT doc_id, nxt FROM bm
         WHERE bsz > {bucket_cap} AND nxt IS NOT NULL),
cand AS (SELECT DISTINCT id_a, id_b FROM rawp),
verified AS MATERIALIZED (
    SELECT c.id_a, c.id_b,
           ROUND(AVG(CASE WHEN sa.s = sb.s THEN 1.0 ELSE 0.0 END), 6)
               AS est_jaccard
    FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
                JOIN sig sb ON sb.doc_id = c.id_b AND sb.p = sa.p
    GROUP BY c.id_a, c.id_b
    HAVING AVG(CASE WHEN sa.s = sb.s THEN 1.0 ELSE 0.0 END)
           >= {threshold})"""


def words_ctes(with_norm: bool = True, src: str = "documents") -> str:
    """CTEs ending in ``whash`` (doc_id, wi, wh) — one row per word
    INSTANCE, SplitMix64 tabulation per word, h("")=0 for empty docs —
    plus ``words`` (doc_id, wi, w).  Mirrors ``dedup.simhash_batch``
    tokenization (lower + whitespace split)."""
    norm = NORM_SQL.format(col="text")
    head = (f"norm AS (SELECT doc_id, {norm} AS t FROM {src}),\n"
            if with_norm else "")
    return head + f"""words AS (SELECT doc_id, wi,
                 list_extract(ws, CAST(wi + 1 AS INT)) AS w
          FROM (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
               unnest(range(len(ws))) r(wi)),
wch AS (SELECT doc_id, wi, ci,
               unicode(substring(w, CAST(ci + 1 AS INT), 1)) AS cp
        FROM words, unnest(range(length(w))) r(ci)),
{sm64_ctes('smw', 'wch', f'CAST(ci AS UBIGINT) * {_S} + cp', 'doc_id, wi')},
whash AS MATERIALIZED (
    SELECT doc_id, wi, bit_xor(h) AS wh FROM smw GROUP BY doc_id, wi
    UNION ALL
    SELECT doc_id, 0, CAST(0 AS UBIGINT) FROM norm WHERE t = '')"""


MINHASH_PAIRS_SQL = f"""WITH {minhash_ctes(0.5)}
SELECT id_a, id_b, est_jaccard FROM verified ORDER BY id_a, id_b"""


MINHASH_CLUSTERS_SQL = f"""WITH RECURSIVE {minhash_ctes(0.5)},
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified),
walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.reach FROM edges e JOIN walk w ON w.node = e.v)
SELECT CAST(node AS BIGINT) AS node,
       CAST(MIN(reach) AS BIGINT) AS cluster_id
FROM walk GROUP BY node"""


DUP_CLUSTER_SIZES_SQL = f"""WITH RECURSIVE {minhash_ctes(0.5)},
edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified),
walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.reach FROM edges e JOIN walk w ON w.node = e.v),
cl AS (SELECT node, MIN(reach) AS cluster_id FROM walk GROUP BY node),
sz AS (SELECT cluster_id, COUNT(*) AS n FROM cl GROUP BY cluster_id)
SELECT CAST(n AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY n ORDER BY cluster_size"""


#: engine: simhash_pairs(max_hamming=8, n_chunks=4, bucket_cap=4096) —
#: candidates share ≥1 equal 16-bit chunk (pigeonhole-incomplete at
#: d > 3, exactly like the engine banding), verify popcount ≤ 8
SIMHASH_PAIRS_SQL = f"""WITH {words_ctes()},
bits AS (SELECT CAST(b AS BIGINT) AS b FROM range(64) r(b)),
contrib AS (SELECT w.doc_id, b.b,
                   SUM(CASE WHEN (w.wh >> b.b) & 1 = 1
                       THEN 1 ELSE -1 END) AS sgn
            FROM whash w CROSS JOIN bits b GROUP BY w.doc_id, b.b),
sim AS MATERIALIZED (
    SELECT doc_id,
           CAST(SUM(CASE WHEN sgn > 0
                    THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INT)
                              AS HUGEINT)
                    ELSE 0 END) AS UBIGINT) AS sh
    FROM contrib GROUP BY doc_id),
chunks AS (SELECT doc_id, c, (sh >> CAST(16 * c AS INT)) & 65535 AS cv,
                  sh
           FROM sim, unnest(range(4)) r(c)),
cm AS (SELECT c, cv, doc_id, sh,
              COUNT(*) OVER (PARTITION BY c, cv) AS bsz,
              LEAD(doc_id) OVER (PARTITION BY c, cv
                                 ORDER BY doc_id) AS nxt,
              LEAD(sh) OVER (PARTITION BY c, cv ORDER BY doc_id) AS nxt_sh
       FROM chunks),
rawp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS ha,
                b.sh AS hb
         FROM cm a JOIN cm b ON a.c = b.c AND a.cv = b.cv
                           AND a.doc_id < b.doc_id
         WHERE a.bsz <= 4096
         UNION ALL
         SELECT doc_id, nxt, sh, nxt_sh FROM cm
         WHERE bsz > 4096 AND nxt IS NOT NULL),
cand AS (SELECT DISTINCT id_a, id_b, ha, hb FROM rawp)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 8
ORDER BY id_a, id_b"""


#: engine: minhash_lsh_pairs(threshold=0.3) candidates → exact
#: word-3-gram Jaccard ≥ 0.3 (filter on the UNROUNDED ratio, like the
#: engine; ROUND only for the emitted value)
NGRAM_JACCARD_SQL = f"""WITH {minhash_ctes(0.3)},
{words_ctes(with_norm=False)},
nt AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
tri AS (SELECT doc_id, wi,
               w || ' ' || LEAD(w, 1) OVER win || ' '
                 || LEAD(w, 2) OVER win AS g,
               COUNT(*) OVER (PARTITION BY doc_id) AS n
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY wi)),
grams AS MATERIALIZED (
    SELECT DISTINCT doc_id, g FROM tri WHERE n >= 3 AND g IS NOT NULL
    UNION SELECT doc_id, t FROM norm JOIN nt USING (doc_id)
          WHERE nt.n < 3),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (SELECT v.id_a, v.id_b, COUNT(*) AS i
          FROM verified v JOIN grams ga ON ga.doc_id = v.id_a
                          JOIN grams gb ON gb.doc_id = v.id_b
                                       AND gb.g = ga.g
          GROUP BY v.id_a, v.id_b),
jac AS (SELECT v.id_a, v.id_b,
               COALESCE(i.i, 0) * 1.0
                   / GREATEST(sa.sz + sb.sz - COALESCE(i.i, 0), 1) AS j
        FROM verified v LEFT JOIN inter i
             ON i.id_a = v.id_a AND i.id_b = v.id_b
             JOIN sizes sa ON sa.doc_id = v.id_a
             JOIN sizes sb ON sb.doc_id = v.id_b)
SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM jac
WHERE j >= 0.3 ORDER BY id_a, id_b"""


#: Replays incremental_minhash_dedup over the query's two-run feed:
#: run A = first 60% of the corpus (row order = doc_id order), run B =
#: the rest + 15 planted light edits of run-A docs (doc_id + 100000,
#: text || ' zz').  A run-B doc drops iff one of its 16 band signature
#: tuples collides with a PRIOR-run (A) doc's AND the Broder estimate
#: over the 64 minhashes is ≥ 0.5 — exactly the engine's band-store
#: candidate + signature-merge verify (no bucket cap on this path).
INCR_FUZZY_SQL = f"""WITH ord AS (
    SELECT doc_id, text,
           row_number() OVER (ORDER BY doc_id) AS rn,
           COUNT(*) OVER () AS nn
    FROM documents),
ra AS (SELECT doc_id, text FROM ord WHERE rn <= nn * 6 // 10),
rb AS (SELECT doc_id, text FROM ord WHERE rn > nn * 6 // 10
       UNION ALL
       SELECT doc_id + 100000, text || ' zz' FROM ord WHERE rn <= 15),
corpus AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
{sig_ctes('corpus')},
cand AS (SELECT DISTINCT bb.doc_id AS id_b, ab.doc_id AS id_a
         FROM bandsig bb
         JOIN bandsig ab ON bb.band = ab.band AND bb.sigs = ab.sigs
         JOIN (SELECT doc_id FROM rb) fb ON fb.doc_id = bb.doc_id
         JOIN (SELECT doc_id FROM ra) fa ON fa.doc_id = ab.doc_id),
ver AS (SELECT c.id_b
        FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
                    JOIN sig sb ON sb.doc_id = c.id_b AND sb.p = sa.p
        GROUP BY c.id_b, c.id_a
        HAVING AVG(CASE WHEN sa.s = sb.s THEN 1.0 ELSE 0.0 END)
               >= 0.5),
drops AS (SELECT DISTINCT id_b FROM ver),
na AS (SELECT COUNT(*) AS c FROM ra),
nb AS (SELECT COUNT(*) AS c FROM rb),
nd AS (SELECT COUNT(*) AS c FROM drops)
SELECT 'a' AS round, CAST(na.c AS BIGINT) AS input_docs,
       CAST(na.c AS BIGINT) AS kept, CAST(0 AS BIGINT) AS dropped
FROM na
UNION ALL
SELECT 'b', CAST(nb.c AS BIGINT), CAST(nb.c - nd.c AS BIGINT),
       CAST(nd.c AS BIGINT)
FROM nb, nd
ORDER BY round"""


#: engine: textstats.add_fingerprint — whole-normalized-doc SplitMix64
#: tabulation; h("") = 0
FINGERPRINT_SQL = f"""WITH norm AS (
    SELECT doc_id, {NORM_SQL.format(col='text')} AS t FROM documents),
fchars AS (SELECT doc_id, i,
                  unicode(substring(t, CAST(i + 1 AS INT), 1)) AS cp
           FROM norm, unnest(range(length(t))) r(i)),
{sm64_ctes('smf', 'fchars', f'CAST(i AS UBIGINT) * {_S} + cp', 'doc_id')},
fp AS (SELECT doc_id, bit_xor(h) AS fingerprint FROM smf
       GROUP BY doc_id)
SELECT n.doc_id,
       CAST(COALESCE(f.fingerprint, 0) AS UBIGINT) AS fingerprint
FROM norm n LEFT JOIN fp f USING (doc_id) ORDER BY n.doc_id"""
