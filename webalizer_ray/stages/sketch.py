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

Both are pure numpy and serialize to plain bytes so they ride Ray Data
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
