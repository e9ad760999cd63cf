"""Planted-fixture pinning tests for the round-2j query batches
(NDR waterfall, e-value, Cobb–Douglas, source JSD, time-rescaling,
NODF nestedness, Clauset power law, text QA, VaR backtests, MANOVA,
Borda, Fisher exact, Shapiro–Francia). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

from math import comb, lgamma, log

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import (_write_events,
                                      _write_documents,
                                      _write_lineitem_ship,
                                      _write_part)
from tests.test_round2g_stats import _daily_events
from tests.test_round2h_stats import _week_window_fixture


def q(name):
    return REGISTRY[name][0]


def test_ndr_and_waterfall_hand_cells(tmp_path):
    d = str(tmp_path / "sf")
    # week w: u0 $1.00, u1 $0.50; week w+1: u0 $1.20, u1 churned
    _write_events(d,
                  ["1995-01-02T10:00:00", "1995-01-02T11:00:00",
                   "1995-01-09T10:00:00"],
                  [0, 1, 0], ["view"] * 3, [1.00, 0.50, 1.20])
    r = q("net_dollar_retention_weekly")(d)
    assert len(r) == 1
    row = r.iloc[0]
    assert row["base_users"] == 2
    assert row["ndr_pct"] == 80.0
    assert row["grr_pct"] == round(100 / 150 * 100, 6)
    w = q("ndr_waterfall_split")(d)
    wd = {b: (s, c) for b, s, c in
          zip(w["bucket"], w["base_share_pct"],
              w["ndr_contribution_pct"])}
    assert wd["churned"][0] == round(50 / 150 * 100, 6)
    assert wd["churned"][1] == round(-50 / 150 * 100, 6)
    assert wd["expanded"][1] == round(20 / 150 * 100, 6)


def test_evalue_hand_beta_binomial(tmp_path):
    d = str(tmp_path / "sf")
    _week_window_fixture(d, 2, 5)
    r = q("evalue_weekend_purchase")(d).iloc[0]
    p0 = 2 / 7
    lne = (lgamma(2.5) + lgamma(5.5) - lgamma(8.0)
           - 2 * lgamma(0.5) + lgamma(1.0)) \
        - (2 * log(p0) + 5 * log(1 - p0))
    assert r["n_purchases"] == 7
    assert r["log10_e"] == round(lne / log(10), 6)
    assert r["anytime_p"] == round(min(np.exp(-lne), 1.0), 6)


def test_cobb_douglas_against_lstsq(tmp_path):
    d = str(tmp_path / "sf")
    plan = [(2, 3, 2), (3, 2, 2), (4, 6, 4), (6, 4, 4)]
    ts, us, tp = [], [], []
    uid = 0
    for i, (v, c, y) in enumerate(plan):
        for kind, cnt in [("view", v), ("click", c),
                          ("purchase", y)]:
            for j in range(cnt):
                ts.append(f"1995-01-0{i + 1}T0{j + 1}:0{j % 6}:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)
    r = q("cobb_douglas_conversion")(d).iloc[0]
    u1 = np.log([p[0] for p in plan])
    u2 = np.log([p[1] for p in plan])
    yy = np.log([p[2] for p in plan])
    X = np.column_stack([np.ones(4), u1, u2])
    beta, *_ = np.linalg.lstsq(X, yy, rcond=None)
    assert r["alpha_views"] == round(float(beta[1]), 6)
    assert r["beta_clicks"] == round(float(beta[2]), 6)
    assert r["returns_to_scale"] == round(float(beta[1] + beta[2]),
                                          6)


def test_source_jsd_half_bit(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(1, "a b", "s0"), (2, "a c", "s1")])
    r = q("source_jsd_extreme_pairs")(d)
    row = r[r["kind"] == "closest"].iloc[0]
    # shared 'a' at equal probability contributes 0; each source's
    # exclusive half-mass contributes ln2/2 -> exactly 0.5 bit
    assert row["jsd_bits"] == 0.5
    assert row["vocab_jaccard"] == round(1 / 3, 6)


def test_time_rescaling_perfectly_regular(tmp_path):
    d = str(tmp_path / "sf")
    # identical 2-purchase pattern both days: all rescaled gaps
    # exactly 1 -> mean 1, zero dispersion; KS vs Exp(1) inline
    _write_events(d,
                  ["1995-01-01T00:30:00", "1995-01-01T12:30:00",
                   "1995-01-02T00:30:00", "1995-01-02T12:30:00"],
                  [0, 1, 2, 3], ["purchase"] * 4)
    mo = q("rescaled_gap_moments")(d).iloc[0]
    assert mo["n_gaps"] == 3
    assert mo["mean_gap"] == 1.0
    assert mo["cv_gap"] == 0.0
    assert mo["dispersion_index"] == 0.0
    ks = q("time_rescaling_ks_purchases")(d).iloc[0]
    u = 1 - np.exp(-1.0)
    dexp = max(max(i / 3 - u, u - (i - 1) / 3)
               for i in (1, 2, 3))
    assert ks["ks_stat"] == round(dexp, 6)


def test_nodf_perfect_chain(tmp_path):
    d = str(tmp_path / "sf")
    # u0 {view}, u1 {view,click}, u2 {view,click,purchase}
    _write_events(d,
                  ["1995-01-01T01:00:00",
                   "1995-01-01T02:00:00", "1995-01-01T02:30:00",
                   "1995-01-01T03:00:00", "1995-01-01T03:30:00",
                   "1995-01-01T04:00:00"],
                  [0, 1, 1, 2, 2, 2],
                  ["view", "view", "click", "view", "click",
                   "purchase"])
    r = q("user_type_nestedness_nodf")(d).iloc[0]
    assert r["n_users"] == 3
    assert r["nodf_rows"] == 100.0
    assert r["nodf_cols"] == 30.0
    assert r["nodf_total"] == round(600 / 13, 6)
    a = q("adoption_ladder_audit")(d).iloc[0]
    assert a["ladder_pct"] == 100.0
    assert a["top_violation_mask"] == -1


def test_powerlaw_ml_hand_spectrum(tmp_path):
    d = str(tmp_path / "sf")
    # users with 1,1,1,2 events
    _write_events(d,
                  ["1995-01-01T01:00:00", "1995-01-01T02:00:00",
                   "1995-01-01T03:00:00", "1995-01-01T04:00:00",
                   "1995-01-01T04:30:00"],
                  [0, 1, 2, 3, 3], ["view"] * 5)
    r = q("zipf_ml_alpha_user_activity")(d).iloc[0]
    slx = 3 * log(1 / 0.5) + log(2 / 0.5)
    assert r["n_users"] == 4
    assert r["alpha_ml"] == round(1 + 4 / slx, 6)


def test_text_qa_planted_breakage(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(1, "all fine here.", "s0"),
                         (2, "broken (paren and no end", "s0")])
    u = q("unbalanced_span_audit_by_source")(d).iloc[0]
    assert u["n_docs"] == 2
    assert u["paren_unbalanced"] == 1
    assert u["broken_pct"] == 50.0
    t = q("truncation_audit_by_source")(d).iloc[0]
    assert t["truncated"] == 1
    assert t["len_ratio_trunc_vs_ok"] == round(24 / 14, 6)


def test_var_backtests_hand_exceptions(tmp_path):
    d = str(tmp_path / "sf")
    # 8-day window; train revs [10,20,30,40], test [5,10,15,20]
    vals = [0.10, 0.20, 0.30, 0.40, 0.05, 0.10, 0.15, 0.20]
    _write_events(d, [f"1995-01-0{i + 1}T12:00:00"
                      for i in range(8)],
                  list(range(8)), ["view"] * 8, vals)
    k = q("var_backtest_kupiec")(d).iloc[0]
    assert k["var10_value"] == 0.10
    assert k["n_test_days"] == 4 and k["exceptions"] == 1
    ll0 = 3 * log(0.9) + log(0.1)
    ll1 = log(0.25) + 3 * log(0.75)
    assert k["kupiec_lr"] == round(-2 * (ll0 - ll1), 6)
    c = q("var_backtest_christoffersen")(d).iloc[0]
    assert (c["n00"], c["n01"], c["n10"], c["n11"]) == (2, 0, 1, 0)
    assert c["christoffersen_lr"] == 0.0


def test_manova_against_linalg_det(tmp_path):
    d = str(tmp_path / "sf")
    plan = [(1, 2, 1), (2, 1, 1), (3, 1, 2), (1, 3, 1),
            (2, 2, 2), (4, 1, 1), (1, 1, 3), (2, 3, 1),
            (3, 2, 2), (1, 4, 1), (2, 1, 3), (5, 1, 1),
            (1, 2, 2), (3, 3, 1)]
    ts, us, tp = [], [], []
    uid = 0
    for i, (v, c, p) in enumerate(plan):
        for kind, cnt in [("view", v), ("click", c),
                          ("purchase", p)]:
            for j in range(cnt):
                ts.append(f"1995-01-{i + 1:02d}T0{j + 1}:00:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)
    r = q("manova_dow_dayvectors")(d).iloc[0]
    X = np.array(plan, float)
    dow = (np.arange(len(plan)) + 9131 + 4) % 7
    n = len(plan)
    T = X.T @ X
    W = T.copy()
    Bs = np.zeros((3, 3))
    for g in range(7):
        m = dow == g
        if m.sum() == 0:
            continue
        S = X[m].sum(axis=0)
        W -= np.outer(S, S) / m.sum()
        Bs += np.outer(S, S) / m.sum()
    B = Bs - np.outer(X.sum(axis=0), X.sum(axis=0)) / n
    lam = np.linalg.det(W) / np.linalg.det(W + B)
    assert r["wilks_lambda"] == round(float(lam), 6)
    assert r["n_groups"] == 7


def test_borda_three_brands(tmp_path):
    d = str(tmp_path / "sf")
    _write_part(d, [(1, "A"), (2, "B"), (3, "C")])
    # revenue A>B>C; qty C>B>A; orders B>A>C — extendedprice is
    # fixed at 100 per line by the writer, so revenue rank =
    # line-count rank; craft counts accordingly:
    # A: 4 lines qty 1 each (rev 400, qty 4, orders 2)
    # B: 3 lines qty 2 each (rev 300, qty 6, orders 3)
    # C: 2 lines qty 4 each (rev 200, qty 8, orders 1)
    rows = []
    ok = 1
    rows += [(1, 1, 1.0, "1995-01-01T00:00:00"),
             (1, 1, 1.0, "1995-01-01T00:00:00"),
             (2, 1, 1.0, "1995-01-02T00:00:00"),
             (2, 1, 1.0, "1995-01-02T00:00:00")]
    rows += [(3, 2, 2.0, "1995-01-01T00:00:00"),
             (4, 2, 2.0, "1995-01-02T00:00:00"),
             (5, 2, 2.0, "1995-01-03T00:00:00")]
    rows += [(6, 3, 4.0, "1995-01-01T00:00:00"),
             (6, 3, 4.0, "1995-01-02T00:00:00")]
    _write_lineitem_ship(d, rows)
    r = q("brand_metric_borda_consensus")(d)
    byb = r.set_index("brand")
    assert byb.loc["A", "rank_revenue"] == 1
    assert byb.loc["C", "rank_quantity"] == 1
    assert byb.loc["B", "rank_orders"] == 1
    # borda: A=1+3+2=6, B=2+2+1=5, C=3+1+3=7
    assert byb.loc["B", "consensus_rank"] == 1
    assert byb.loc["A", "consensus_rank"] == 2
    assert byb.loc["C", "consensus_rank"] == 3


def test_fisher_exact_hand_hypergeometric(tmp_path):
    d = str(tmp_path / "sf")
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(d, exist_ok=True)
    # (a,b,c,d) = (1,2,3,4): AUTOMOBILE cust 1, other cust 2
    rows = [("1-URGENT", 1)] * 1 + [("3-MEDIUM", 1)] * 2 \
        + [("1-URGENT", 2)] * 3 + [("3-MEDIUM", 2)] * 4
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, 11)), pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 10),
        "o_totalprice": pa.array([1.0] * 10),
        "o_orderdate": pa.array(
            np.array(["1995-01-01T00:00:00"] * 10,
                     dtype="datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array([r[0] for r in rows])}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["c1", "c2"]),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0]),
        "c_mktsegment": pa.array(["AUTOMOBILE", "BUILDING"])}),
        os.path.join(d, "customer.parquet"))
    r = q("fisher_exact_segment_urgent")(d).iloc[0]
    assert (r["n11"], r["n12"], r["n21"], r["n22"]) == (1, 2, 3, 4)
    # hypergeometric over k=0..3 with margins (3,7,4)
    pk = {k: comb(3, k) * comb(7, 4 - k) / comb(10, 4)
          for k in range(4)}
    pobs = pk[1]
    exact = sum(p for p in pk.values()
                if p <= pobs * (1 + 1e-7))
    assert r["exact_p"] == round(min(exact, 1.0), 6)
    assert r["odds_ratio"] == round(4 / 6, 6)


def test_shapiro_francia_replicated_scores(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [4, 1, 1, 2])
    r = q("shapiro_francia_daily_residuals")(d).iloc[0]
    e = np.sort(np.array([1.1, -1.3, -0.7, 0.9]))
    i = np.arange(1, 5, dtype=float)
    p = (i - 0.375) / 4.25
    pl = np.where(p < 0.5, p, 1 - p)
    t = np.sqrt(-2 * np.log(pl))
    x = t - (2.30753 + 0.27061 * t) \
        / (1 + 0.99229 * t + 0.04481 * t * t)
    m = np.where(p < 0.5, -x, x)
    num = 4 * (e * m).sum() - e.sum() * m.sum()
    den = (4 * (e * e).sum() - e.sum() ** 2) \
        * (4 * (m * m).sum() - m.sum() ** 2)
    assert r["w_prime"] == round(float(num * num / den), 6)
    lv = q("levels_vs_logs_normality")(d)
    row = lv.iloc[0]
    assert 0 < row["w_levels"] <= 1 and 0 < row["w_logs"] <= 1
    assert row["logs_win"] == (1 if row["w_logs"]
                               > row["w_levels"] else 0)
