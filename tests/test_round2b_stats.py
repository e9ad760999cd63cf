"""Planted-fixture pinning tests for the round-2b statistical queries
(Haar energy, energy distance, CUPED, TwoNN/hubness/assortativity,
two-way ANOVA, Theil decomposition, dwell/trigram/think-time session
ops, percolation consistency). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on inputs with known
closed-form answers."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def q(name):
    return REGISTRY[name][0]


def _write_events(d, ts_list, users, types, values=None):
    os.makedirs(d, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(ts_list, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(np.array(users, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n) if values is None
                          else np.asarray(values, np.float64)),
        "props": pa.array(["{}"] * n)}),
        os.path.join(d, "events.parquet"))


def _write_embeddings(d, vecs):
    os.makedirs(d, exist_ok=True)
    vecs = np.asarray(vecs, np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), np.int32))}),
        os.path.join(d, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# Haar energy: a pure period-2 alternation puts ALL energy at level 1
# ---------------------------------------------------------------------------

def test_haar_alternating_series_level1_only(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-01T12:00:00", "us")
    ts, users, types = [], [], []
    day_us = 86_400_000_000
    for day in range(32):
        cnt = 5 if day % 2 == 0 else 1        # a=5, b=1 alternation
        for k in range(cnt):
            ts.append(base + np.timedelta64(day * day_us + k, "us"))
            users.append(1)
            types.append("view")
    _write_events(d, ts, users, types)
    out = q("haar_daily_energy")(d).set_index("level")
    # level-1 details: (5-1)^2 per pair x 16 pairs; sums are constant 6
    # afterwards so every higher level is exactly zero
    assert out.loc[1, "energy"] == 16 * 16
    assert (out.loc[2:, "energy"] == 0).all()
    assert list(out["n_coeffs"]) == [16, 8, 4, 2, 1]


def test_haar_constant_series_all_zero(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-01T00:30:00", "us")
    day_us = 86_400_000_000
    ts = [base + np.timedelta64(day * day_us + k, "us")
          for day in range(32) for k in range(3)]
    _write_events(d, ts, [7] * len(ts), ["click"] * len(ts))
    out = q("haar_daily_energy")(d)
    assert (out["energy"] == 0).all()


# ---------------------------------------------------------------------------
# Energy distance: point masses at p and q -> exactly 2|p-q| dollars
# ---------------------------------------------------------------------------

def test_energy_distance_point_masses(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-05", "us")
    ts = [base + np.timedelta64(i, "s") for i in range(8)]
    types = ["view"] * 4 + ["purchase"] * 4
    values = [10.0] * 4 + [12.5] * 4       # masses 2.50 apart
    _write_events(d, ts, list(range(8)), types, values)
    out = q("energy_distance_view_purchase")(d).iloc[0]
    # E|X-Y| = 2.5, within-sample terms 0 -> D^2 = 5.0 dollars
    assert out["n_view"] == 4 and out["n_purchase"] == 4
    assert out["energy_distance_dollars"] == 5.0


def test_energy_distance_identical_distributions_zero(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-05", "us")
    vals = [1.0, 2.0, 3.0, 4.0]
    ts = [base + np.timedelta64(i, "s") for i in range(8)]
    _write_events(d, ts, list(range(8)),
                  ["view"] * 4 + ["purchase"] * 4, vals + vals)
    out = q("energy_distance_view_purchase")(d).iloc[0]
    assert out["energy_distance_dollars"] == 0.0


# ---------------------------------------------------------------------------
# CUPED: post spend == pre spend per user -> rho^2 = 1, theta = 1,
# adjusted effect exactly 0
# ---------------------------------------------------------------------------

def test_cuped_perfect_pre_post_correlation(tmp_path):
    d = str(tmp_path / "sf")
    pre = np.datetime64("2024-01-10", "us")
    post = np.datetime64("2024-01-20", "us")
    ts, users, values = [], [], []
    for uid in range(10):
        spend = 5.0 + uid           # distinct per user, identical
        for t in (pre, post):       # in both periods
            ts.append(t + np.timedelta64(uid, "s"))
            users.append(uid)
            values.append(spend)
    _write_events(d, ts, users, ["purchase"] * len(ts), values)
    out = q("cuped_value_adjustment")(d).iloc[0]
    assert out["theta"] == 1.0
    assert out["variance_reduction"] == 1.0
    assert out["cuped_effect_dollars"] == 0.0


# ---------------------------------------------------------------------------
# TwoNN / hubness / assortativity: distributed result == in-test brute
# force on a planted random embedding
# ---------------------------------------------------------------------------

def _brute_two_nn(vecs):
    v = np.asarray(vecs, np.float32).astype(np.float64)
    n = len(v)
    d = np.sqrt(((v[:, None, :] - v[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(d, np.inf)
    s = np.sort(d, axis=1)
    return s[:, 0], s[:, 1]


def test_twonn_matches_brute_force(tmp_path):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    d = str(tmp_path / "sf")
    _write_embeddings(d, vecs)
    out = q("twonn_intrinsic_dim")(d).iloc[0]
    r1, r2 = _brute_two_nn(vecs)
    keep = r1 > 0
    lr = np.round(np.log(r2[keep] / r1[keep]), 9)
    exp = round(int(keep.sum()) / float(lr.sum()), 4)
    assert out["n_points"] == int(keep.sum())
    assert abs(out["intrinsic_dim"] - exp) < 1e-9


def test_twonn_excludes_exact_duplicates(tmp_path):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 4)).astype(np.float32)
    vecs[5] = vecs[2]                       # exact duplicate pair
    d = str(tmp_path / "sf")
    _write_embeddings(d, vecs)
    out = q("twonn_intrinsic_dim")(d).iloc[0]
    assert out["n_points"] == 18            # both dup points dropped


def test_hubness_and_assortativity_brute_force(tmp_path):
    rng = np.random.default_rng(29)
    vecs = rng.normal(size=(40, 6)).astype(np.float32)
    d = str(tmp_path / "sf")
    _write_embeddings(d, vecs)
    # brute-force cosine 2-NN with the engines' tie convention
    v = vecs.astype(np.float64)
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    sims = np.round(v @ v.T, 9)
    np.fill_diagonal(sims, -np.inf)
    edges = []
    for i in range(len(v)):
        order = np.lexsort((np.arange(len(v)), -sims[i]))
        edges += [(i, order[0]), (i, order[1])]
    e = pd.DataFrame(edges, columns=["node", "neighbor"])
    indeg = e["neighbor"].value_counts()
    # hubness histogram
    hist = q("knn_hubness_hist")(d)
    exp_deg = indeg.reindex(range(len(v))).fillna(0).astype(int)
    exp_hist = exp_deg.value_counts().sort_index()
    got = dict(zip(hist["in_degree"], hist["n_nodes"]))
    assert got == {int(k): int(c) for k, c in exp_hist.items()}
    # assortativity
    deg = 2 + exp_deg
    x = deg.loc[e["node"]].to_numpy(np.int64)
    y = deg.loc[e["neighbor"]].to_numpy(np.int64)
    n = len(x)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = ((n * int((x * x).sum()) - int(x.sum()) ** 2)
           * (n * int((y * y).sum()) - int(y.sum()) ** 2))
    exp_a = 0.0 if den == 0 else round(num / np.sqrt(den * 1.0), 6)
    out = q("knn_degree_assortativity")(d).iloc[0]
    assert out["n_edges"] == n
    assert abs(out["assortativity"] - exp_a) < 1e-9


# ---------------------------------------------------------------------------
# Two-way ANOVA: balanced additive design -> interaction exactly 0
# ---------------------------------------------------------------------------

def test_twoway_anova_additive_design_zero_interaction(tmp_path):
    d = str(tmp_path / "sf")
    # 2 types x 2 weekdays, balanced, cell mean = type effect + dow
    # effect (additive), within-cell noise symmetric so cell means
    # are exact
    days = {0: np.datetime64("2024-01-01", "us"),    # Monday
            1: np.datetime64("2024-01-02", "us")}    # Tuesday
    t_eff = {"view": 10.0, "click": 20.0}
    d_eff = {0: 0.0, 1: 5.0}
    ts, users, types, values = [], [], [], []
    for ty in t_eff:
        for dow in days:
            for eps in (-1.0, 1.0):      # symmetric within-cell noise
                ts.append(days[dow] + np.timedelta64(len(ts), "s"))
                users.append(len(ts))
                types.append(ty)
                values.append(t_eff[ty] + d_eff[dow] + eps)
    _write_events(d, ts, users, types, values)
    out = q("twoway_anova_value")(d).iloc[0]
    assert out["eta2_interaction"] == 0.0
    assert out["f_interaction"] == 0.0
    assert out["eta2_type"] > 0 and out["eta2_dow"] > 0


# ---------------------------------------------------------------------------
# Theil decomposition pins
# ---------------------------------------------------------------------------

def _write_orders_nations(d, nation_of_cust, order_values):
    """order_values: list of (custkey, totalprice)."""
    os.makedirs(d, exist_ok=True)
    nk = sorted(set(nation_of_cust.values()))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.array(nk, np.int64)),
        "n_name": pa.array([f"NATION_{k}" for k in nk]),
        "n_regionkey": pa.array(np.zeros(len(nk), np.int64)),
    }), os.path.join(d, "nation.parquet"))
    ck = sorted(nation_of_cust)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.array(ck, np.int64)),
        "c_nationkey": pa.array(np.array([nation_of_cust[c]
                                          for c in ck], np.int64)),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(len(order_values),
                                         dtype=np.int64)),
        "o_custkey": pa.array(np.array([c for c, _ in order_values],
                                       np.int64)),
        "o_totalprice": pa.array(np.array([v for _, v in order_values],
                                          np.float64)),
    }), os.path.join(d, "orders.parquet"))


def test_theil_equal_values_all_zero(tmp_path):
    d = str(tmp_path / "sf")
    _write_orders_nations(
        d, {1: 0, 2: 0, 3: 1, 4: 1},
        [(1, 50.0), (2, 50.0), (3, 50.0), (4, 50.0)])
    out = q("theil_decomposition_by_nation")(d)
    assert (out["t_g"] == 0.0).all()
    assert (out["t_between"] == 0.0).all()
    assert (out["t_within"] == 0.0).all()


def test_theil_between_only_two_nations(tmp_path):
    d = str(tmp_path / "sf")
    # nation 0: two orders of $10; nation 1: two orders of $30 —
    # within-nation inequality 0, between = sum s_g ln(s_g * N/n_g)
    _write_orders_nations(
        d, {1: 0, 2: 0, 3: 1, 4: 1},
        [(1, 10.0), (2, 10.0), (3, 30.0), (4, 30.0)])
    out = q("theil_decomposition_by_nation")(d)
    assert (out["t_g"] == 0.0).all()
    assert (out["t_within"] == 0.0).all()
    exp = 0.25 * np.log(0.25 * 2) + 0.75 * np.log(0.75 * 2)
    assert abs(out["t_between"].iloc[0] - round(exp, 6)) < 1e-9


# ---------------------------------------------------------------------------
# Session ops: dwell matrix, trigrams, per-user median think time
# ---------------------------------------------------------------------------

def test_transition_dwell_planted(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T10:00:00", "us")
    ts = [base, base + np.timedelta64(10, "s"),
          base + np.timedelta64(70, "s"),
          base + np.timedelta64(70 + 1800, "s")]   # 1800s gap: NEW sess
    _write_events(d, ts, [1, 1, 1, 1],
                  ["view", "click", "purchase", "view"])
    out = q("transition_dwell_time")(d) \
        .set_index(["from_type", "to_type"])
    assert len(out) == 2                  # the 1800s edge is excluded
    assert out.loc[("view", "click"), "total_s"] == 10
    assert out.loc[("click", "purchase"), "mean_s"] == 60.0


def test_session_trigrams_respect_session_breaks(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T10:00:00", "us")
    ts = [base, base + np.timedelta64(10, "s"),
          base + np.timedelta64(20, "s"),
          base + np.timedelta64(20 + 1800, "s"),   # break
          base + np.timedelta64(20 + 1810, "s"),
          base + np.timedelta64(20 + 1820, "s")]
    _write_events(d, ts, [1] * 6,
                  ["view", "click", "purchase",
                   "view", "view", "purchase"])
    out = q("session_type_trigrams")(d)
    got = dict(zip(out["trigram"], out["n"]))
    assert got == {"view>click>purchase": 1, "view>view>purchase": 1}


def test_user_median_thinktime_lower_median(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T10:00:00", "us")
    # user 1 gaps: 600s, 1200s (even count -> LOWER median 600 = band
    # 10); a 1900s gap would break the session and is excluded
    ts = [base, base + np.timedelta64(600, "s"),
          base + np.timedelta64(1800, "s"),
          base + np.timedelta64(1800 + 1900, "s")]
    _write_events(d, ts, [1] * 4, ["view"] * 4)
    out = q("user_median_thinktime_hist")(d)
    assert list(out["minute_band"]) == [10]
    assert list(out["users"]) == [1]


# ---------------------------------------------------------------------------
# Percolation curve: monotone in threshold + consistent with the
# oracle-backed pair query at 0.4 (real sf0.001 data)
# ---------------------------------------------------------------------------

def test_percolation_monotone_and_consistent():
    curve = q("cosine_percolation_curve")(SF).set_index("threshold")
    assert (curve["n_pairs"].diff().dropna() <= 0).all()
    assert (curve["largest"].diff().dropna() <= 0).all()
    pairs_04 = q("cosine_dup_pairs")(SF)
    assert curve.loc[0.4, "n_pairs"] == len(pairs_04)


# ---------------------------------------------------------------------------
# Provenance / lexical pins
# ---------------------------------------------------------------------------

def _write_docs(d, texts, sources):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     np.int64))}),
        os.path.join(d, "documents.parquet"))


def test_cross_source_dup_groups_planted(tmp_path):
    d = str(tmp_path / "sf")
    _write_docs(d,
                ["same text", "same text",        # cross A/B
                 "only in a", "only in a",        # within A
                 "unique"],
                ["a", "b", "a", "a", "b"])
    out = q("cross_source_dup_groups")(d).iloc[0]
    assert out["dup_groups"] == 2
    assert out["cross_groups"] == 1
    assert out["docs_in_cross"] == 2
    assert out["cross_share"] == 0.5


def test_hapax_share_planted(tmp_path):
    d = str(tmp_path / "sf")
    _write_docs(d, ["a a b", "c d"], ["s1", "s2"])
    out = q("hapax_share_by_source")(d).set_index("source")
    assert out.loc["s1", "vocab"] == 2
    assert out.loc["s1", "hapax"] == 1
    assert out.loc["s1", "tokens"] == 3
    assert out.loc["s1", "hapax_share"] == 0.5
    assert out.loc["s2", "hapax_share"] == 1.0
