"""SQL-replicable string hashing (SplitMix64 position-keyed tabulation).

The dedup family (MinHash, SimHash, document fingerprints) needs a
string → uint64 hash that is (a) stable across processes and nodes so
signatures computed on different workers agree — the distributed-dedup
requirement the reference meets with its in-process hash tables
(hashtab.c in SURVEY.md §2.7 has no such concern because it is
single-process) — and (b) replicable in portable SQL integer
arithmetic, so every query built on it can carry an independent DuckDB
oracle that rebuilds signatures bit-for-bit (the construction round 3
proved on HLL/CMS/PQ with integer keys; this module extends it to
strings).

Construction: position-keyed tabulation over Unicode codepoints,

    h(s) = XOR_{j < len(s)} splitmix64(j * 2^21 + codepoint(s[j]))

(`2^21 > 0x10FFFF` keeps (position, codepoint) keys collision-free),
with ``h("") = 0``.  Position-keyed tabulation hashing has full
64-bit avalanche per character (SplitMix64 is a finalizer-grade
mixer) and the XOR combine makes it embarrassingly vectorizable in
numpy AND expressible as one ``bit_xor`` GROUP BY in SQL.

Everything here is pure numpy — no Python loop ever touches a
character; the only per-string step is the UTF-32 encode that turns
text into a codepoint array (data movement, not compute).
"""

from __future__ import annotations

import numpy as np

from webalizer_ray.stages.sketch import splitmix64

#: key stride: key = position * CP_STRIDE + codepoint; codepoints are
#: < 0x110000 < 2^21, so keys never collide across positions.
CP_STRIDE = np.uint64(1 << 21)

_U64_EMPTY = np.empty(0, dtype=np.uint64)


def normalize(text) -> str:
    """Lowercase + collapse all whitespace runs to single spaces + strip.

    Identical to ``" ".join(str(text).lower().split())`` and to the SQL
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))`` (collapse
    BEFORE trim so non-space edge whitespace normalizes identically).
    """
    return " ".join(str(text).lower().split())


def _flat_codepoints(strs) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate all strings' Unicode codepoints; return (flat uint64
    codepoints, per-string lengths)."""
    cps = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
           for s in strs]
    lens = np.fromiter((len(c) for c in cps), dtype=np.int64,
                       count=len(cps))
    if not len(cps) or not int(lens.sum()):
        return _U64_EMPTY, lens
    return np.concatenate(cps).astype(np.uint64), lens


def _ragged_within(counts: np.ndarray) -> np.ndarray:
    """Within-segment index for ragged segments of the given sizes:
    counts [2, 3] → [0, 1, 0, 1, 2]."""
    total = int(counts.sum())
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(offs, counts)


def string_hashes(strs) -> np.ndarray:
    """Vectorized h(s) per string (see module docstring); h("") = 0."""
    flat, lens = _flat_codepoints(strs)
    out = np.zeros(len(lens), dtype=np.uint64)
    if not flat.size:
        return out
    pos = _ragged_within(lens).astype(np.uint64)
    vals = splitmix64(pos * CP_STRIDE + flat)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    nz = lens > 0
    out[nz] = np.bitwise_xor.reduceat(vals, offs[nz])
    return out


def shingle_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-text character-k-shingle hashes over PRE-NORMALIZED texts.

    A text of length L ≥ k yields L−k+1 shingle hashes
    ``h(t[i:i+k])``; a shorter text yields ONE hash of the whole text
    (so every doc has at least one shingle — "" hashes to 0).  Returns
    (flat uint64 hash array in doc order, per-doc shingle counts) —
    the reduceat-ready layout MinHash needs.

    Vectorization: k SplitMix64 passes build A_j = sm64(j·S + cp) over
    the flat codepoint array; a window hash is then an XOR of k
    shifted slices — no per-shingle Python, no per-doc loop.
    """
    flat, lens = _flat_codepoints(texts)
    counts = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    out_offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out = np.zeros(int(counts.sum()), dtype=np.uint64)
    if not flat.size:
        return out, counts
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n = flat.size
    aj = [splitmix64(np.uint64(j) * CP_STRIDE + flat) for j in range(k)]
    w = n - k + 1
    if w > 0:
        h_full = aj[0][:w].copy()
        for j in range(1, k):
            h_full ^= aj[j][j:j + w]
        long = lens >= k
        if long.any():
            within = _ragged_within(counts[long])
            src = np.repeat(offs[long], counts[long]) + within
            dst = np.repeat(out_offs[long], counts[long]) + within
            out[dst] = h_full[src]
    # short texts (0 < L < k): prefix XOR of the A_j terms, one lane
    # per j — k vectorized passes, no per-doc loop
    short = lens < k
    if short.any():
        acc = np.zeros(int(short.sum()), dtype=np.uint64)
        so, sl = offs[short], lens[short]
        for j in range(k):
            m = sl > j
            if not m.any():
                break
            acc[m] ^= aj[j][so[m] + j]
        out[out_offs[short]] = acc
    return out, counts


# ---------------------------------------------------------------------------
# SQL builders — the DuckDB replay of the same construction
# ---------------------------------------------------------------------------

_M64 = 18446744073709551616          # 2^64
_SM_C0 = 11400714819323198485        # 0x9E3779B97F4A7C15
_SM_K1 = 13787848793156543929        # 0xBF58476D1CE4E5B9
_SM_K2 = 10723151780598845931        # 0x94D049BB133111EB


def _mul_mod64_sql(a: str, k: int) -> str:
    """uint64 wraparound multiply in SQL: split the 64-bit operand into
    32-bit halves so every intermediate fits HUGEINT (the exact form
    round 3's HLL/CMS oracles established)."""
    return (f"CAST((((CAST(({a}) >> 32 AS HUGEINT) * {k}) % 4294967296)"
            f" * 4294967296 + (CAST(({a}) & 4294967295 AS HUGEINT)"
            f" * {k})) % {_M64} AS UBIGINT)")


def sm64_ctes(prefix: str, src: str, x: str, keep: str) -> str:
    """CTE chain computing SplitMix64 of UBIGINT expression ``x`` over
    the rows of CTE ``src``; the final CTE is named ``prefix`` and
    carries columns ``keep`` (comma list, may be '') plus ``h``."""
    kp = (keep + ", ") if keep else ""
    z0 = (f"CAST((CAST(({x}) AS HUGEINT) + {_SM_C0}) % {_M64}"
          f" AS UBIGINT)")
    return f"""{prefix}_a AS (SELECT {kp}{z0} AS z FROM {src}),
{prefix}_b AS (SELECT {kp}{_mul_mod64_sql('xor(z, z >> 30)', _SM_K1)} AS z FROM {prefix}_a),
{prefix}_c AS (SELECT {kp}{_mul_mod64_sql('xor(z, z >> 27)', _SM_K2)} AS z FROM {prefix}_b),
{prefix} AS (SELECT {kp}xor(z, z >> 31) AS h FROM {prefix}_c)"""


#: SQL expression producing the engine's normalized text from ``text``
#: (collapse whitespace FIRST, then trim — exactly normalize() above).
NORM_SQL = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"
