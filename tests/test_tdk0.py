"""Deterministic k0-scale t-digest (stages/sketch.py tdk0_*): the r5
oracle foundation pinned on RANDOM inputs, not just the driver fixture
(the same discipline test_strhash applies to the r4 dedup hashing).

The value_quantiles_sketch oracle replays the digest in DuckDB window
functions; these tests prove the two constructions agree bit-for-bit
on arbitrary integer data, that the merge is invariant to centroid
arrival order (the property that makes the distributed form
deterministic), and that the estimates actually track exact quantiles.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages.sketch import (
    TDK0_DELTA,
    tdk0_centroids,
    tdk0_merge,
    tdk0_quantile,
)


def _engine_quantiles(vals: np.ndarray, ids: np.ndarray, buckets: int,
                      qs=(0.5, 0.95)):
    ss, ws, bks, cs = [], [], [], []
    df = pd.DataFrame({"v": vals, "id": ids, "bk": ids % buckets})
    for bk, g in df.groupby("bk"):
        s, w = tdk0_centroids(g["v"].to_numpy(np.int64),
                              g["id"].to_numpy(np.int64))
        ss.append(s)
        ws.append(w)
        bks.append(np.full(len(s), bk))
        cs.append(np.arange(1, len(s) + 1))
    gs, gw = tdk0_merge(np.concatenate(ss), np.concatenate(ws),
                        np.concatenate(bks), np.concatenate(cs))
    return [tdk0_quantile(gs, gw, q) for q in qs]


def _sql_quantiles(vals: np.ndarray, ids: np.ndarray, buckets: int,
                   qs=(0.5, 0.95)):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals.astype(np.int64),
                                    "id": ids.astype(np.int64)}))
    out = con.sql(f"""
WITH src AS (SELECT v AS cents, id AS event_id,
                    id % {buckets} AS bk FROM t),
t1 AS (SELECT bk, cents, event_id,
              NTILE({TDK0_DELTA}) OVER (PARTITION BY bk
                  ORDER BY cents, event_id) AS c FROM src),
cent AS (SELECT bk, c, SUM(cents) AS s, COUNT(*) AS w
         FROM t1 GROUP BY bk, c),
ord AS (SELECT bk, c, s, w, CAST(s AS DOUBLE) / w AS m,
        COALESCE(SUM(w) OVER (ORDER BY CAST(s AS DOUBLE) / w, bk, c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cw,
        SUM(w) OVER () AS tot FROM cent),
mg AS (SELECT CAST(FLOOR(cw * {TDK0_DELTA}.0 / tot) AS BIGINT) AS cl,
              s, w FROM ord),
fin AS (SELECT cl, SUM(s) AS s, SUM(w) AS w FROM mg GROUP BY cl),
pos AS (SELECT cl, CAST(s AS DOUBLE) / w AS m, w,
        (COALESCE(SUM(w) OVER (ORDER BY cl
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + w / 2.0) / SUM(w) OVER () AS p FROM fin),
qq AS (SELECT * FROM (VALUES {','.join(f'({q})' for q in qs)}) t(q)),
lo AS (SELECT q, MAX_BY(m, p) AS m_lo, MAX(p) AS p_lo
       FROM pos, qq WHERE p <= q GROUP BY q),
hi AS (SELECT q, MIN_BY(m, p) AS m_hi, MIN(p) AS p_hi
       FROM pos, qq WHERE p > q GROUP BY q)
SELECT COALESCE(lo.q, hi.q) AS q,
       CASE WHEN lo.q IS NULL THEN hi.m_hi
            WHEN hi.q IS NULL THEN lo.m_lo
            ELSE lo.m_lo + (COALESCE(lo.q, hi.q) - lo.p_lo)
                 / (hi.p_hi - lo.p_lo) * (hi.m_hi - lo.m_lo)
       END AS v
FROM lo FULL OUTER JOIN hi ON lo.q = hi.q ORDER BY q""").df()
    return out.sort_values("q")["v"].tolist()


@pytest.mark.parametrize("seed,n,spread", [
    (1, 50, 100),        # fewer rows than delta: 1-row centroids
    (2, 5_000, 10),      # heavy ties (10 distinct values)
    (3, 20_000, 10**6),  # wide spread
    (4, 999, 3),         # extreme ties + non-divisible NTILE sizes
])
def test_engine_matches_sql_bit_for_bit(seed, n, spread):
    rng = np.random.default_rng(seed)
    vals = rng.integers(-spread, spread, n)
    ids = rng.permutation(np.arange(10_000, 10_000 + n))
    eng = _engine_quantiles(vals, ids, 16)
    sql = _sql_quantiles(vals, ids, 16)
    assert eng == sql, (eng, sql)   # EXACT float equality, no tolerance


def test_merge_invariant_to_centroid_order():
    """The distributed form's determinism rests on the merge sorting
    by (mean, bucket, idx) internally — any arrival permutation of the
    same centroid multiset must produce identical output."""
    rng = np.random.default_rng(9)
    s = rng.integers(0, 10**6, 300)
    w = rng.integers(1, 50, 300)
    bk = rng.integers(0, 16, 300)
    c = rng.integers(1, 101, 300)
    ref = tdk0_merge(s, w, bk, c)
    for _ in range(3):
        p = rng.permutation(300)
        got = tdk0_merge(s[p], w[p], bk[p], c[p])
        assert (got[0] == ref[0]).all() and (got[1] == ref[1]).all()


def test_quantile_accuracy_tracks_exact():
    """k0 with delta=100 over 16 buckets: estimates within ~2 centroid
    widths of the exact quantile on a skewed distribution."""
    rng = np.random.default_rng(5)
    vals = (rng.pareto(2.0, 50_000) * 1000).astype(np.int64)
    ids = np.arange(50_000)
    p50, p95 = _engine_quantiles(vals, ids, 16)
    e50, e95 = np.quantile(vals, [0.5, 0.95])
    spread = np.quantile(vals, 0.95) - np.quantile(vals, 0.05)
    assert abs(p50 - e50) / spread < 0.03
    assert abs(p95 - e95) / spread < 0.03


def test_centroid_weights_are_ntile_sizes():
    s, w = tdk0_centroids(np.arange(1003, dtype=np.int64),
                          np.arange(1003))
    assert len(w) == TDK0_DELTA
    # NTILE: first n % delta groups get ceil, rest floor
    assert (w[:3] == 11).all() and (w[3:] == 10).all()
    assert w.sum() == 1003
    # empty group
    s0, w0 = tdk0_centroids(np.empty(0, np.int64), np.empty(0))
    assert len(s0) == 0 and len(w0) == 0
    assert np.isnan(tdk0_quantile(s0, w0, 0.5))
