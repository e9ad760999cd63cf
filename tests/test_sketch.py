"""Mergeable sketch tests: accuracy, mergeability, determinism, and the
query-level agreement with the exact operators."""

from __future__ import annotations

import numpy as np
import pandas as pd

from webalizer_ray.stages.sketch import (BloomFilter, HyperLogLog,
                                         MisraGries, TDigest)


def test_tdigest_quantile_accuracy_and_merge():
    rng = np.random.default_rng(7)
    v = rng.lognormal(1.0, 0.8, 50_000)
    d = TDigest.from_values(v)
    assert len(d.means) < 400          # compressed to O(delta) centroids
    for q in (0.05, 0.5, 0.95):
        exact = np.quantile(v, q)
        approx = d.quantile(q)
        span = np.quantile(v, 0.99) - np.quantile(v, 0.01)
        assert abs(approx - exact) < 0.02 * span, q
    # merge of disjoint parts ≈ digest of the whole
    parts = np.array_split(v, 7)
    merged = TDigest()
    for p in parts:
        merged = merged.merge(TDigest.from_values(p))
    for q in (0.5, 0.95):
        assert abs(merged.quantile(q) - np.quantile(v, q)) < 0.03 * span
    # bytes round-trip + determinism
    blob = d.to_bytes()
    d2 = TDigest.from_bytes(blob)
    assert d2.quantile(0.5) == d.quantile(0.5)
    assert TDigest.from_values(v).to_bytes() == blob


def test_tdigest_edges():
    assert np.isnan(TDigest.from_values(np.array([])).quantile(0.5))
    one = TDigest.from_values(np.array([3.25]))
    assert one.quantile(0.0) == one.quantile(1.0) == 3.25
    d = TDigest.from_values(np.array([1.0, 2.0]))
    assert d.quantile(0.0) == 1.0 and d.quantile(1.0) == 2.0


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(3)
    vals = rng.choice(10_000_000, 100_000, replace=False)
    h = pd.util.hash_array(vals)
    sk = HyperLogLog.from_hashes(h)
    est = sk.count()
    assert abs(est - 100_000) / 100_000 < 0.03
    # merge of overlapping halves estimates the union, not the sum
    a = HyperLogLog.from_hashes(h[:70_000])
    b = HyperLogLog.from_hashes(h[30_000:])
    est_u = a.merge(b).count()
    assert abs(est_u - 100_000) / 100_000 < 0.03
    # small-range linear counting stays accurate
    small = HyperLogLog.from_hashes(pd.util.hash_array(np.arange(50)))
    assert abs(small.count() - 50) < 3
    # bytes round-trip
    assert HyperLogLog.from_bytes(sk.to_bytes()).count() == est


def test_misra_gries_bounds_and_merge():
    rng = np.random.default_rng(11)
    stream = rng.zipf(1.5, 200_000) % 5000   # heavy-tailed keys
    true = pd.Series(stream).value_counts()

    def summarize(part: np.ndarray) -> MisraGries:
        k, c = np.unique(part, return_counts=True)
        return MisraGries.from_counts(k, c, capacity=64)

    # single-shot and merged-from-parts must both honor
    # est(x) <= true(x) <= est(x) + err for every retained key
    for sk in (summarize(stream),
               __import__("functools").reduce(
                   MisraGries.merge,
                   (summarize(p) for p in np.array_split(stream, 9)))):
        assert len(sk.keys) <= 64
        for key, est, est_hi in sk.top(64):
            t = int(true.get(key, 0))
            assert est <= t <= est_hi, (key, est, t, est_hi)
        # every key with true count > err is guaranteed present
        guaranteed = true[true > sk.err].index
        assert set(guaranteed).issubset(set(sk.keys.tolist()))
        # the true #1 heavy hitter leads the estimate ordering
        assert sk.top(1)[0][0] == int(true.index[0])
    # bytes round-trip preserves everything
    sk = summarize(stream)
    rt = MisraGries.from_bytes(sk.to_bytes(), capacity=64)
    assert rt.err == sk.err and (rt.keys == sk.keys).all() \
        and (rt.counts == sk.counts).all()


def test_bloom_filter_semantics():
    rng = np.random.default_rng(5)
    members = pd.util.hash_array(rng.choice(10_000_000, 50_000,
                                            replace=False))
    others = pd.util.hash_array(rng.choice(10_000_000, 50_000,
                                           replace=False) + 10_000_000)
    bf = BloomFilter(log2m=20).add_hashes(members)
    # no false negatives, ever
    assert bf.contains_hashes(members).all()
    # FP rate near theory: (1-e^{-kn/m})^k ≈ 0.6% for k=7,n=50k,m=2^20
    fp = bf.contains_hashes(others).mean()
    assert fp < 0.02, fp
    # merge is union
    a = BloomFilter(log2m=20).add_hashes(members[:30_000])
    b = BloomFilter(log2m=20).add_hashes(members[30_000:])
    assert a.merge(b).contains_hashes(members).all()
    # bytes round-trip
    rt = BloomFilter.from_bytes(bf.to_bytes(), log2m=20)
    assert (rt.bits == bf.bits).all()
    # empty filter rejects everything; empty query is well-typed
    assert not BloomFilter(log2m=10).contains_hashes(members[:10]).any()
    assert BloomFilter(log2m=10).contains_hashes(
        np.array([], dtype=np.uint64)).shape == (0,)


def test_heavy_hitter_query_exact(ray_session):
    """Query-level (r4 two-pass design): the MG-candidates + exact
    recount output equals the plain exact top-10 of the φ-frequent
    set, computed independently in pandas."""
    from webalizer_ray.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    got = Q.REGISTRY["heavy_hitter_users"][0](sf)
    events = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    true = events["user_id"].value_counts()
    n = len(events)
    want = (true[true > n / 257.0].rename("cnt").reset_index()
            .sort_values(["cnt", "user_id"], ascending=[False, True],
                         kind="mergesort").head(10)
            .reset_index(drop=True))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()


def test_sketch_queries_match_exact(ray_session):
    from webalizer_ray.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    exact = Q.REGISTRY["distinct_users"][0](sf)["users"].iloc[0]
    approx = Q.REGISTRY["distinct_users_hll"][0](sf)["users_approx"].iloc[0]
    assert abs(approx - exact) / max(exact, 1) < 0.05

    eq = Q.REGISTRY["value_quantiles_by_type"][0](sf)
    aq = Q.REGISTRY["value_quantiles_sketch"][0](sf)
    m = eq.merge(aq, on="event_type")
    spread = (m["p95"] - m["p50"]).clip(lower=1e-9)
    assert ((m["p50_approx"] - m["p50"]).abs() / spread < 0.15).all()
    assert ((m["p95_approx"] - m["p95"]).abs() / spread < 0.15).all()


def test_countmin_bound_and_merge():
    """est >= true always; est <= true + eps*N on a zipf stream;
    merged partials equal the single-shot sketch (linearity)."""
    import numpy as np
    import pandas as pd
    from webalizer_ray.stages.sketch import CountMin

    rng = np.random.default_rng(4)
    keys = (rng.zipf(1.3, 50_000) % 5000).astype(np.int64)
    h = pd.util.hash_array(keys)
    whole = CountMin.from_hashes(h, width=2048, depth=4)
    parts = CountMin(2048, 4)
    for i in range(0, len(h), 7000):
        parts = parts.merge(CountMin.from_hashes(h[i:i + 7000],
                                                 width=2048, depth=4))
    assert (whole.table == parts.table).all() and whole.n == parts.n

    true = pd.Series(keys).value_counts()
    probe = true.index.to_numpy(np.int64)
    est = whole.estimate(pd.util.hash_array(probe))
    tv = true.to_numpy()
    assert (est >= tv).all()
    eps = np.e / 2048
    assert (est - tv <= eps * whole.n).mean() > 0.99   # delta=e^-4


def test_cms_and_grouped_hll_queries(ray_session):
    """CMS per-user estimates dominate true counts and sum near N;
    grouped HLL lands within 3% of exact per-group distincts."""
    import duckdb
    from webalizer_ray.pipelines.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    cms = REGISTRY["user_event_counts_cms"][0](sf)
    true = duckdb.sql(
        f"SELECT user_id, count(*) AS n FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").df()
    m = cms.merge(true, on="user_id")
    assert (m["est_events"] >= m["n"]).all()
    assert m["est_events"].sum() <= 1.05 * m["n"].sum()

    hll = REGISTRY["distinct_users_by_type_hll"][0](sf)
    ex = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS u FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").df()
    j = hll.merge(ex, on="event_type")
    rel = (j["users_approx"] - j["u"]).abs() / j["u"]
    assert (rel < 0.03).all()


def test_hll_intersection_within_5pct_of_exact(ray_session):
    """Inclusion–exclusion overlap estimate vs the exact pandas
    overlap on the sf0.001 events table."""
    import datetime as dt

    from webalizer_ray.pipelines.queries import week_overlap_users_hll

    got = week_overlap_users_hll("/root/testdata/sf0.001").iloc[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "user_id"])
    d0 = pd.Timestamp(dt.datetime(2024, 1, 1))
    a = set(ev.loc[(ev.ts >= d0) & (ev.ts < d0 + pd.Timedelta(days=7)),
                   "user_id"])
    b = set(ev.loc[(ev.ts >= d0 + pd.Timedelta(days=7))
                   & (ev.ts < d0 + pd.Timedelta(days=14)), "user_id"])
    exact = len(a & b)
    assert exact > 0
    assert abs(int(got["users_overlap"]) - exact) <= max(1, 0.05 * exact)
    assert abs(int(got["users_a"]) - len(a)) <= max(1, 0.03 * len(a))
