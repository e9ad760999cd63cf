"""Mergeable sketches — the approximate path for high-cardinality keys.

The exact aggregates elsewhere in this engine (distinct_count, per-group
quantiles) require a key's values to be co-located; at 100 TB with 10^9
keys that shuffle dominates. These sketches follow the classic partial/
merge pattern instead: every batch collapses to a tiny fixed-size
summary, only summaries shuffle, and the final merge is associative —
the same shape `reduce_sink` uses for algebraic aggregates.

* ``TDigest`` — merging t-digest (Dunning & Ertl, "Computing extremely
  accurate quantiles using t-digests", arXiv:1902.04023): centroids
  sorted by mean, compressed under the k1-style size bound
  ``4·W·q(1-q)/δ``. Deterministic given the merge order (we always merge
  sorted-by-mean), mergeable, O(δ) memory.
* ``HyperLogLog`` — Flajolet et al. 2007 with the standard small-range
  (linear counting) correction; register array merge is elementwise max.
* ``MisraGries`` — heavy hitters / approximate top-k (Misra & Gries
  1982; the mergeable formulation of Agarwal et al., "Mergeable
  Summaries", PODS 2012): at most ``capacity`` (key, count) entries plus
  one global error bound, with the guarantee
  ``est(x) <= true(x) <= est(x) + err`` and every key whose true count
  exceeds ``err`` guaranteed present.
* ``BloomFilter`` — membership filter for semi-join pruning (Bloom
  1970): k index bits per key via Kirsch–Mitzenmacher double hashing,
  merge is bitwise OR. No false negatives; FP rate ≈ (1-e^{-kn/m})^k.

All are pure numpy and serialize to plain bytes so they ride Ray Data
blocks as binary columns.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# t-digest (merging variant)
# ---------------------------------------------------------------------------

class TDigest:
    """Fixed-budget mergeable quantile sketch."""

    __slots__ = ("means", "weights", "delta")

    def __init__(self, means: np.ndarray | None = None,
                 weights: np.ndarray | None = None, delta: int = 200):
        self.means = np.asarray([] if means is None else means,
                                dtype=np.float64)
        self.weights = np.asarray([] if weights is None else weights,
                                  dtype=np.float64)
        self.delta = delta

    @classmethod
    def from_values(cls, values: np.ndarray, delta: int = 200) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return cls(delta=delta)
        v = np.sort(v)
        d = cls(v, np.ones(len(v)), delta)
        d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]),
                      self.delta)
        out._compress()
        return out

    def _compress(self) -> None:
        """Single merging pass under the k1 scale function
        ``k(q) = δ/(2π)·asin(2q−1)`` — a centroid may span at most one
        unit of k, giving ≤ δ/2 + 1 centroids with fine resolution at
        the tails (the t-digest property)."""
        if len(self.means) <= 1:
            return
        order = np.argsort(self.means, kind="mergesort")
        m, w = self.means[order], self.weights[order]
        W = w.sum()
        kf = self.delta / (2.0 * np.pi)

        def k(q):
            return kf * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))

        out_m, out_w = [], []
        acc_m, acc_w = m[0] * w[0], w[0]
        cum = 0.0          # weight strictly before the current centroid
        k0 = k(0.0)
        for i in range(1, len(m)):
            if k((cum + acc_w + w[i]) / W) - k0 <= 1.0:
                acc_m += m[i] * w[i]
                acc_w += w[i]
            else:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
                cum += acc_w
                k0 = k(cum / W)
                acc_m, acc_w = m[i] * w[i], w[i]
        out_m.append(acc_m / acc_w)
        out_w.append(acc_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        W = self.weights.sum()
        target = q * W
        # centroid i sits at cumulative position cum_i + w_i/2
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        j = np.searchsorted(cum, target)
        lo, hi = j - 1, j
        frac = (target - cum[lo]) / (cum[hi] - cum[lo])
        return float(self.means[lo] + frac * (self.means[hi]
                                              - self.means[lo]))

    # -- bytes codec (rides Ray blocks as a binary column) ---------------
    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, delta: int = 200) -> "TDigest":
        a = np.frombuffer(blob, dtype=np.float64)
        n = len(a) // 2
        return cls(a[:n].copy(), a[n:].copy(), delta)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain SplitMix64 finalizer (Steele/Lea/Vigna) over
    uint64: high-avalanche and — unlike SipHash — replicable in SQL
    integer arithmetic, so sketch queries hashed with it can carry
    DuckDB oracles that rebuild the sketch bit-for-bit (r3)."""
    z = np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


class HyperLogLog:
    """Approximate distinct count; registers merge by elementwise max."""

    __slots__ = ("p", "regs")

    def __init__(self, p: int = 14, regs: np.ndarray | None = None):
        self.p = p
        m = 1 << p
        self.regs = np.zeros(m, dtype=np.uint8) if regs is None \
            else np.asarray(regs, dtype=np.uint8)

    @classmethod
    def from_hashes(cls, h: np.ndarray, p: int = 14) -> "HyperLogLog":
        """Build from 64-bit hashes (e.g. pd.util.hash_array output)."""
        h = np.asarray(h, dtype=np.uint64)
        sk = cls(p)
        if not len(h):
            return sk
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rem_bits = 64 - p
        w = h & np.uint64((1 << rem_bits) - 1)
        # rank = leading zeros within the low rem_bits + 1
        #      = rem_bits - floor(log2(w)) for w > 0 (w==0 → rem_bits+1).
        # frexp exponent e satisfies w = frac·2^e, frac∈[0.5,1) →
        # floor(log2(w)) = e-1; exact for w < 2^53.
        rank = np.full(len(h), rem_bits + 1, dtype=np.int64)
        nz = w > 0
        _, e = np.frexp(w[nz].astype(np.float64))
        rank[nz] = rem_bits - (e - 1)
        np.maximum.at(sk.regs, idx, rank.astype(np.uint8))
        return sk

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.regs, other.regs))

    def count(self) -> float:
        m = float(len(self.regs))
        alpha = _HLL_ALPHA.get(int(m), 0.7213 / (1.0 + 1.079 / m))
        e = alpha * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        if e <= 2.5 * m:
            zeros = int((self.regs == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)    # linear-counting correction
        return float(e)

    def to_bytes(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = 14) -> "HyperLogLog":
        return cls(p, np.frombuffer(blob, dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable)
# ---------------------------------------------------------------------------

class MisraGries:
    """Mergeable heavy-hitters summary over int64 keys.

    Invariant (Agarwal et al. 2012): for every key x,
    ``est(x) <= true(x) <= est(x) + err`` where ``est`` is 0 for absent
    keys — so any key with true count > err is guaranteed present, and
    the true top-k is contained in the summary's top-k-by-(est+err) as
    long as the k-th count exceeds err. Size is bounded by ``capacity``
    entries regardless of stream length; only these tiny summaries
    shuffle, never the raw keys.
    """

    __slots__ = ("keys", "counts", "err", "capacity")

    def __init__(self, capacity: int = 64,
                 keys: np.ndarray | None = None,
                 counts: np.ndarray | None = None, err: int = 0):
        self.capacity = capacity
        self.keys = np.asarray([] if keys is None else keys, dtype=np.int64)
        self.counts = np.asarray([] if counts is None else counts,
                                 dtype=np.int64)
        self.err = int(err)

    @classmethod
    def from_counts(cls, keys: np.ndarray, counts: np.ndarray,
                    capacity: int = 64) -> "MisraGries":
        """Build from EXACT (key, count) pairs (e.g. one batch's counts)."""
        sk = cls(capacity, np.asarray(keys, dtype=np.int64),
                 np.asarray(counts, dtype=np.int64), 0)
        sk._shrink()
        return sk

    def _shrink(self) -> None:
        """MG reduction: subtract the (capacity+1)-th largest count from
        every entry, drop non-positives — err grows by that threshold."""
        if len(self.keys) <= self.capacity:
            return
        thr = int(np.partition(self.counts,
                               len(self.counts) - self.capacity - 1)
                  [len(self.counts) - self.capacity - 1])
        keep = self.counts > thr
        self.keys = self.keys[keep]
        self.counts = self.counts[keep] - thr
        self.err += thr

    def merge(self, other: "MisraGries") -> "MisraGries":
        k = np.concatenate([self.keys, other.keys])
        c = np.concatenate([self.counts, other.counts])
        uk, inv = np.unique(k, return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, c)
        out = MisraGries(self.capacity, uk, uc, self.err + other.err)
        out._shrink()
        return out

    def top(self, n: int) -> "list[tuple[int, int, int]]":
        """Top-n (key, est, est+err), est desc then key asc (stable)."""
        order = np.lexsort((self.keys, -self.counts))[:n]
        return [(int(self.keys[i]), int(self.counts[i]),
                 int(self.counts[i]) + self.err) for i in order]

    def to_bytes(self) -> bytes:
        head = np.asarray([self.err, len(self.keys)], dtype=np.int64)
        return np.concatenate([head, self.keys, self.counts]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, capacity: int = 64) -> "MisraGries":
        a = np.frombuffer(blob, dtype=np.int64)
        err, n = int(a[0]), int(a[1])
        return cls(capacity, a[2:2 + n].copy(), a[2 + n:2 + 2 * n].copy(),
                   err)


# ---------------------------------------------------------------------------
# Bloom filter (semi-join pruning)
# ---------------------------------------------------------------------------

class BloomFilter:
    """Bit-array membership filter over 64-bit hashes; merge = OR.

    Index bits come from Kirsch–Mitzenmacher double hashing
    ``idx_i = h + i·h2 mod m`` (h2 forced odd so it cycles the full
    power-of-two table). Build per batch, OR the tiny bit arrays on the
    driver, broadcast once with ``ray.put`` — the standard scan-side
    prune ahead of a distributed join.
    """

    __slots__ = ("log2m", "k", "bits")

    def __init__(self, log2m: int = 20, k: int = 7,
                 bits: np.ndarray | None = None):
        self.log2m = log2m
        self.k = k
        self.bits = np.zeros(1 << log2m, dtype=bool) if bits is None \
            else np.asarray(bits, dtype=bool)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(len(h), k) table indices.

        The double-hash step derives from the HIGH 32 bits: with the
        table mask applied, ``h + i*h2 mod 2^log2m`` depends only on the
        low log2m bits of h and h2, so an h2 computed from h's low bits
        would collapse the filter to a log2m-bit hash (measured: the FP
        rate then equals the 2^-log2m birthday rate, ~30× theory)."""
        h = np.asarray(h, dtype=np.uint64)
        h2 = ((h >> np.uint64(32)) * np.uint64(0x9E3779B97F4A7C15)) \
            | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        mask = np.uint64((1 << self.log2m) - 1)
        return ((h[:, None] + i[None, :] * h2[:, None]) & mask) \
            .astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        if len(h):
            self.bits[self._indices(h).reshape(-1)] = True
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=bool)
        return self.bits[self._indices(h)].all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.log2m, self.k, self.bits | other.bits)

    def to_bytes(self) -> bytes:
        return np.packbits(self.bits).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, log2m: int = 20,
                   k: int = 7) -> "BloomFilter":
        bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8)) \
            .astype(bool)[:1 << log2m]
        return cls(log2m, k, bits)


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): point-frequency
    estimates over int64 keys with one-sided error — estimate >= true,
    and estimate <= true + ε·N with prob 1-δ for width w = ⌈e/ε⌉,
    depth d = ⌈ln 1/δ⌉. Merges by elementwise ADD (counts are linear),
    so per-batch sketches combine exactly like the other partials here.
    Row hashing: the same 64-bit input hashes the callers already
    produce, mixed per row with odd multiplicative constants (a
    2-universal-style family suffices for the CM bound in practice)."""

    __slots__ = ("width", "depth", "table", "n")

    _MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                     0x165667B19E3779F9, 0x27D4EB2F165667C5,
                     0x85EBCA77C2B2AE63], dtype=np.uint64)

    def __init__(self, width: int = 2048, depth: int = 4,
                 table: np.ndarray | None = None, n: int = 0):
        assert depth <= len(self._MIX)
        self.width, self.depth = width, depth
        self.table = np.zeros((depth, width), dtype=np.int64) \
            if table is None else np.asarray(table, dtype=np.int64)
        self.n = int(n)

    def _idx(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        # one row of indices per depth: mix then fold to the width
        mixed = h[None, :] * self._MIX[:self.depth, None]
        mixed ^= mixed >> np.uint64(33)
        return (mixed % np.uint64(self.width)).astype(np.int64)

    @classmethod
    def from_hashes(cls, h: np.ndarray, counts: np.ndarray | None = None,
                    width: int = 2048, depth: int = 4) -> "CountMin":
        sk = cls(width, depth)
        if not len(h):
            return sk
        c = np.ones(len(h), dtype=np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        idx = sk._idx(h)
        for d in range(sk.depth):
            np.add.at(sk.table[d], idx[d], c)
        sk.n = int(c.sum())
        return sk

    def estimate(self, h: np.ndarray) -> np.ndarray:
        """Point estimates for the given key hashes (min over rows)."""
        if not len(np.asarray(h)):
            return np.zeros(0, dtype=np.int64)
        idx = self._idx(h)
        per_row = np.stack([self.table[d][idx[d]]
                            for d in range(self.depth)])
        return per_row.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        return CountMin(self.width, self.depth,
                        self.table + other.table, self.n + other.n)

    def to_bytes(self) -> bytes:
        return np.int64(self.n).tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, width: int = 2048,
                   depth: int = 4) -> "CountMin":
        n = int(np.frombuffer(blob[:8], dtype=np.int64)[0])
        t = np.frombuffer(blob[8:], dtype=np.int64).reshape(depth, width)
        return cls(width, depth, t.copy(), n)


# ------------------------------------------------------- deterministic digest
#
# k0-scale ("uniform") merging t-digest, the Dunning t-digest variant
# whose scale function k0(q) = δq/2 yields EQUAL-weight centroids
# (Dunning & Ertl, "Computing extremely accurate quantiles using
# t-digests", arXiv:1902.04023 §2.2 — public construction). Unlike the
# asin-scale TDigest class above, every step here is a closed form over
# sorted input (NTILE boundaries, floor-of-cumweight cluster
# assignment, midpoint interpolation), which makes the whole chain
# ORDER-INVARIANT given a deterministic grouping — and therefore
# replayable bit-for-bit in SQL window functions (the register-exact
# HLL oracle pattern, r4). Used by the value_quantiles_sketch query:
# values are split per key into TDK0_BUCKETS fixed event_id-residue
# groups, each group builds δ centroids, and the per-key merge folds
# the B×δ centroids in (mean, bucket, centroid) order.

TDK0_DELTA = 100
TDK0_BUCKETS = 16


def tdk0_centroids(values: np.ndarray,
                   tie: np.ndarray,
                   delta: int = TDK0_DELTA) -> tuple:
    """(sums, weights) of the k0 digest over ONE group of INTEGER
    values: rows sorted by (value, tie), then NTILE(delta) boundaries
    — the first n % delta centroids take ceil(n/delta) rows, the rest
    floor(n/delta); a group smaller than delta keeps one row per
    centroid. Centroids carry exact int64 (sum, weight) rather than
    float means so every accumulation is order-independent — the
    property that lets the SQL replay match bit-for-bit (the same
    integer-cents trick the stats-test oracles use); the mean s/w is
    a single float division, identical on both sides."""
    n = len(values)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    v = np.asarray(values, np.int64)
    o = np.lexsort((np.asarray(tie), v))
    v = v[o]
    k = min(int(delta), n)
    base, rem = divmod(n, k)
    sizes = np.full(k, base, np.int64)
    sizes[:rem] += 1
    starts = np.cumsum(sizes) - sizes
    return np.add.reduceat(v, starts), sizes


def tdk0_merge(sums: np.ndarray, weights: np.ndarray,
               bucket: np.ndarray, cidx: np.ndarray,
               delta: int = TDK0_DELTA) -> tuple:
    """Merge centroids from several groups of one key: order by
    (mean = s/w, bucket, centroid-idx) — the deterministic tiebreak
    the SQL ORDER BY mirrors — then assign each centroid to cluster
    floor(exclusive_cumweight * delta / total) and sum the integer
    (s, w) per cluster (left-boundary k0 assignment; centroids are
    atomic, never split). Returns (sums, weights) in cluster order."""
    if not len(sums):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    s = np.asarray(sums, np.int64)
    w = np.asarray(weights, np.int64)
    m = s.astype(np.float64) / w
    o = np.lexsort((np.asarray(cidx), np.asarray(bucket), m))
    s, w = s[o], w[o]
    cw = np.concatenate(([0], np.cumsum(w)[:-1]))
    tot = float(w.sum())
    cl = np.floor(cw * float(delta) / tot).astype(np.int64)
    first = np.ones(len(cl), bool)
    first[1:] = cl[1:] != cl[:-1]
    starts = np.flatnonzero(first)
    return np.add.reduceat(s, starts), np.add.reduceat(w, starts)


def tdk0_quantile(sums: np.ndarray, weights: np.ndarray,
                  q: float) -> float:
    """Midpoint-interpolated quantile over cluster-ordered integer
    centroids: centroid i has mean s_i/w_i and sits at rank position
    p_i = (cumw_before_i + w_i/2) / total; linear interpolation
    between the bracketing centroids, clamped to the first/last mean
    — the exact expression the SQL replay computes."""
    if not len(sums):
        return float("nan")
    w = np.asarray(weights, np.int64)
    means = np.asarray(sums, np.int64).astype(np.float64) / w
    cwi = np.concatenate(([0], np.cumsum(w)[:-1]))
    tot = float(w.sum())
    p = (cwi + w / 2.0) / tot
    if q <= p[0]:
        return float(means[0])
    if q >= p[-1]:
        return float(means[-1])
    i = int(np.searchsorted(p, q, side="right"))
    p_lo, p_hi = p[i - 1], p[i]
    m_lo, m_hi = float(means[i - 1]), float(means[i])
    return m_lo + (q - p_lo) / (p_hi - p_lo) * (m_hi - m_lo)
