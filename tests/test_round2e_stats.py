"""Planted-fixture pinning tests for the round-2e query batches
(multiplicity control, streak survival, clock autocorrelation, ratio
metrics, fairness, agreement robustness, richness constants, Croston,
L-moments, Shapley attribution, Stein shrinkage, Brier decomposition,
competing risks, GPD tail, Dagum decomposition). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on hand-computable inputs.

Date anchor: 1995-01-01 was a Sunday.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY


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


def _write_customer(d, rows):
    """rows: (custkey, mktsegment)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows]),
        "c_nationkey": pa.array([0] * len(rows), pa.int32()),
        "c_acctbal": pa.array([0.0] * len(rows)),
        "c_mktsegment": pa.array([r[1] for r in rows])}),
        os.path.join(d, "customer.parquet"))


def _write_documents(d, rows):
    """rows: (doc_id, text, source)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}),
        os.path.join(d, "documents.parquet"))


def _write_lineitem_ship(d, rows):
    """rows: (orderkey, partkey, qty, shipdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int32()),
        "l_quantity": pa.array([float(r[2]) for r in rows]),
        "l_extendedprice": pa.array([100.0] * len(rows)),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(
            np.array([r[3] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def _write_part(d, rows):
    """rows: (partkey, brand)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": pa.array([f"p{r[0]}" for r in rows]),
        "p_brand": pa.array([r[1] for r in rows]),
        "p_type": pa.array(["T"] * len(rows)),
        "p_size": pa.array([1] * len(rows), pa.int32()),
        "p_retailprice": pa.array([1.0] * len(rows))}),
        os.path.join(d, "part.parquet"))


def _write_orders(d, rows):
    """rows: (orderkey, orderdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * len(rows), pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows)),
        "o_totalprice": pa.array([1.0] * len(rows)),
        "o_orderdate": pa.array(
            np.array([r[1] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * len(rows))}),
        os.path.join(d, "orders.parquet"))


# ---------------------------------------------------------------------------
# Streak survival + sBG
# ---------------------------------------------------------------------------

def test_streak_continuation_exact(tmp_path):
    d = str(tmp_path / "sf")
    # streak lengths 1,1,2,3 (users 0..3), plus user 99 active on the
    # final day only (censored run, excluded)
    ts, us = [], []

    def run(uid, start, length):
        for i in range(length):
            ts.append(f"1995-01-{start + i:02d}T12:00:00")
            us.append(uid)

    run(0, 1, 1)
    run(1, 1, 1)
    run(2, 1, 2)
    run(3, 1, 3)
    run(99, 20, 1)          # ends on global max day -> censored
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("streak_continuation_ratios")(d)
    r1 = out[out["age"] == 1].iloc[0]
    assert r1["at_risk"] == 4 and r1["continued"] == 2
    assert r1["ratio"] == 0.5
    r2 = out[out["age"] == 2].iloc[0]
    assert r2["at_risk"] == 2 and r2["continued"] == 1
    r3 = out[out["age"] == 3].iloc[0]
    assert r3["at_risk"] == 1 and r3["continued"] == 0


def test_sbg_fit_closed_form(tmp_path):
    d = str(tmp_path / "sf")
    # 16 uncensored streaks: 4 of len 1, 2 of len 2, 10 of len 3
    # s1 = 12/16 = .75, s2 = 10/16 = .625, r2 = 5/6 > s1
    # A = (1-r2)/(r2-s1) = 2 -> alpha = .5, beta = 1.5
    # s3_sbg = .625*(1.5+2)/(2+2) = .546875
    ts, us = [], []
    uid = 0

    def run(start, length):
        nonlocal uid
        for i in range(length):
            ts.append(f"1995-01-{start + i:02d}T12:00:00")
            us.append(uid)
        uid += 1

    for _ in range(4):
        run(1, 1)
    for _ in range(2):
        run(1, 2)
    for _ in range(10):
        run(1, 3)
    run(25, 1)               # censored sentinel
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("sbg_streak_churn_fit")(d).iloc[0]
    assert out["n_streaks"] == 16
    assert out["fit_ok"] == 1
    assert out["alpha"] == 0.5
    assert out["beta"] == 1.5
    assert out["s3_sbg"] == 0.546875
    assert out["s3_geo"] == round(0.75 ** 3, 6)


# ---------------------------------------------------------------------------
# Clock autocorrelation
# ---------------------------------------------------------------------------

def test_moran_geary_alternating_ring(tmp_path):
    d = str(tmp_path / "sf")
    # one event in every EVEN hour of 7 consecutive days -> the
    # hour-of-week lattice alternates 1,0 around the ring
    ts, us = [], []
    uid = 0
    for day in range(1, 8):
        for h in range(0, 24, 2):
            ts.append(f"1995-01-{day:02d}T{h:02d}:30:00")
            us.append(uid)
            uid += 1
    _write_events(d, ts, us, ["view"] * len(ts))
    mi = q("morans_i_hourweek")(d).iloc[0]
    assert mi["moran_i"] == -1.0
    assert mi["clustered"] == 0
    gc = q("gearys_c_hourweek")(d).iloc[0]
    # C = n(n-1)*168 / (2*168*84^2) = 167/84
    assert gc["geary_c"] == round(167.0 / 84.0, 6)
    assert gc["clustered"] == 0


# ---------------------------------------------------------------------------
# Delta-method ratio metrics
# ---------------------------------------------------------------------------

def test_delta_ctr_homogeneous_users_zero_se(tmp_path):
    d = str(tmp_path / "sf")
    # 4 identical users: 2 views + 1 click each -> zero between-user
    # variance -> se_delta = 0, design_effect = 0
    ts, us, tp = [], [], []
    for u in range(4):
        for i, t in enumerate(["view", "view", "click"]):
            ts.append(f"1995-01-01T{u + 1:02d}:{i:02d}:00")
            us.append(u)
            tp.append(t)
    _write_events(d, ts, us, tp)
    out = q("delta_method_ctr_per_user")(d).iloc[0]
    assert out["ctr"] == 0.5
    assert out["se_delta"] == 0.0
    assert out["design_effect"] == 0.0


def test_delta_value_per_session_two_users(tmp_path):
    d = str(tmp_path / "sf")
    # u0: one session value 10; u1: one session value 20
    # R = 15; var_r = ((n*Svv - Sv^2)/(n(n-1))) / (n*1) = 5^2
    _write_events(d,
                  ["1995-01-01T01:00:00", "1995-01-01T02:00:00"],
                  [0, 1], ["view", "view"], [10.0, 20.0])
    out = q("delta_method_value_per_session")(d).iloc[0]
    assert out["n_users"] == 2 and out["n_sessions"] == 2
    assert out["value_per_session"] == 15.0
    assert out["se_delta"] == 5.0


# ---------------------------------------------------------------------------
# Fairness
# ---------------------------------------------------------------------------

def test_fairness_all_predicted_positive(tmp_path):
    d = str(tmp_path / "sf")
    # cents [100,200,100,200]: lower median = 100 -> every event
    # clears the threshold -> ppr = tpr = fpr = 1 in both segments
    _write_customer(d, [(0, "A"), (1, "B")])
    _write_events(d,
                  ["1995-01-01T01:00:00", "1995-01-01T02:00:00",
                   "1995-01-01T03:00:00", "1995-01-01T04:00:00"],
                  [0, 0, 1, 1],
                  ["purchase", "view", "view", "purchase"],
                  [1.0, 2.0, 1.0, 2.0])
    eo = q("equalized_odds_by_segment")(d)
    assert list(eo["segment"]) == ["A", "B"]
    assert (eo["ppr"] == 1.0).all()
    assert (eo["tpr"] == 1.0).all()
    assert (eo["fpr"] == 1.0).all()
    fi = q("fairness_impossibility_audit")(d).iloc[0]
    assert fi["thr_cents"] == 100
    assert fi["dp_gap"] == 0.0 and fi["tpr_gap"] == 0.0


# ---------------------------------------------------------------------------
# Agreement
# ---------------------------------------------------------------------------

def test_gwet_ac1_vs_kappa(tmp_path):
    d = str(tmp_path / "sf")
    # 3 users, halves: (view,view), (view,view), (view,click)
    # pa = 2/3; kappa = 0 (pe_num = 6, n = 3); AC1 = 7/13
    ts, us, tp = [], [], []
    for u, (g1, g2) in enumerate([("view", "view"),
                                  ("view", "view"),
                                  ("view", "click")]):
        ts += [f"1995-01-01T0{u + 1}:00:00",
               f"1995-01-09T0{u + 1}:00:00"]
        us += [u, u]
        tp += [g1, g2]
    _write_events(d, ts, us, tp)
    out = q("gwet_ac1_period_modal_type")(d).iloc[0]
    assert out["n"] == 3
    assert out["pa"] == round(2.0 / 3.0, 6)
    assert out["kappa"] == 0.0
    assert out["ac1"] == round(7.0 / 13.0, 6)
    assert out["paradox_gap"] == round(7.0 / 13.0, 6)


def test_krippendorff_alpha_extremes(tmp_path):
    d1 = str(tmp_path / "agree")
    # perfect within-user weekly agreement -> alpha = 1
    _write_events(d1,
                  ["1995-01-01T01:00:00", "1995-01-09T01:00:00",
                   "1995-01-01T02:00:00", "1995-01-09T02:00:00"],
                  [0, 0, 1, 1],
                  ["view", "view", "click", "click"])
    out = q("krippendorff_alpha_weekly_modal")(d1).iloc[0]
    assert out["alpha"] == 1.0 and out["d_o"] == 0.0

    d2 = str(tmp_path / "disagree")
    # one user switching -> D_o = 1, D_e = 1 -> alpha = 0
    _write_events(d2,
                  ["1995-01-01T01:00:00", "1995-01-09T01:00:00"],
                  [0, 0], ["view", "click"])
    out2 = q("krippendorff_alpha_weekly_modal")(d2).iloc[0]
    assert out2["alpha"] == 0.0


# ---------------------------------------------------------------------------
# Richness constants
# ---------------------------------------------------------------------------

def test_honore_sichel_tiny_corpus(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(0, "a a b", "X")])
    out = q("honore_sichel_by_source")(d).iloc[0]
    assert out["n_tokens"] == 3 and out["n_types"] == 2
    assert out["v1"] == 1 and out["v2"] == 1
    assert out["honore_r"] == round(100.0 * np.log(3.0) / 0.5, 6)
    assert out["sichel_s"] == 0.5
    bh = q("brunet_herdan_by_source")(d).iloc[0]
    assert bh["herdan_c"] == round(np.log(2.0) / np.log(3.0), 6)
    assert bh["guiraud_r"] == round(2.0 / np.sqrt(3.0), 6)


# ---------------------------------------------------------------------------
# Croston / safety stock
# ---------------------------------------------------------------------------

def test_croston_two_demands(tmp_path):
    d = str(tmp_path / "sf")
    # part 1: qty 1 in month idx 0, qty 2 in month idx 2
    # z = .9*100 + .1*200 = 110c; p = .9*1 + .1*2 = 1.1
    # croston = 1.0 qty/month, sba = .95
    _write_lineitem_ship(d, [(1, 1, 1.0, "1995-01-15"),
                             (2, 1, 2.0, "1995-03-15"),
                             (3, 2, 5.0, "1995-02-15")])
    out = q("croston_sba_top_parts")(d)
    r = out[out["part_key"] == 1].iloc[0]
    assert r["n_demand_months"] == 2
    assert r["p_hat"] == 1.1
    assert r["croston_fc"] == 1.0
    assert r["sba_fc"] == 0.95


def test_safety_stock_lead_and_mu(tmp_path):
    d = str(tmp_path / "sf")
    # one brand, demand qty 1 on day 0 and qty 3 on day 2 (span 3d)
    # mu = 4/3 qty/day; lead lags 0 and 2 days -> mean 1.0
    _write_part(d, [(1, "B#1")])
    _write_orders(d, [(10, "1995-01-01"), (11, "1995-01-01")])
    _write_lineitem_ship(d, [(10, 1, 1.0, "1995-01-01"),
                             (11, 1, 3.0, "1995-01-03")])
    out = q("safety_stock_by_brand")(d).iloc[0]
    assert out["brand"] == "B#1"
    assert out["demand_days"] == 2
    assert out["mu_daily"] == round(400.0 / 3.0 / 100.0, 6)
    assert out["lead_days"] == 1.0
    sigma = np.sqrt((3 * (100**2 + 300**2) - 400**2) / 6.0) / 100.0
    assert out["sigma_daily"] == round(sigma, 6)
    assert out["safety_stock"] == round(1.644854 * sigma, 6)


# ---------------------------------------------------------------------------
# L-moments
# ---------------------------------------------------------------------------

def test_l_moments_equally_spaced_is_uniform(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d,
                  [f"1995-01-01T0{i}:00:00" for i in range(1, 5)],
                  [0, 1, 2, 3], ["view"] * 4,
                  [1.0, 2.0, 3.0, 4.0])
    lm = q("l_moments_value_by_type")(d).iloc[0]
    assert lm["l1_mean"] == 2.5
    assert lm["l2_scale"] == round(10.0 / 12.0 / 1.0, 6) \
        or lm["l2_scale"] == round(0.833333, 6)
    assert lm["tau3"] == 0.0
    assert lm["tau4"] == 0.0
    di = q("l_ratio_diagram_by_type")(d).iloc[0]
    assert di["nearest_family"] == "uniform"
    assert di["nearest_dist"] == 0.0


# ---------------------------------------------------------------------------
# Shapley attribution
# ---------------------------------------------------------------------------

def test_shapley_two_coalitions(tmp_path):
    d = str(tmp_path / "sf")
    # 10 view-only sessions (2 convert) and 10 view+click sessions
    # (6 convert): phi_click = (1/12)*.4, phi_view = .25*.2+(1/12)*.6
    ts, us, tp = [], [], []
    uid = 0

    def session(types, day, hour):
        nonlocal uid
        for i, t in enumerate(types):
            ts.append(f"1995-01-{day:02d}T{hour:02d}:{i:02d}:00")
            us.append(uid)
            tp.append(t)
        uid += 1

    for i in range(10):
        session(["view", "purchase"] if i < 2 else ["view"],
                1 + i % 5, 1 + i // 5)
    for i in range(10):
        session(["view", "click", "purchase"] if i < 6
                else ["view", "click"], 10 + i % 5, 1 + i // 5)
    _write_events(d, ts, us, tp)
    co = q("session_coalition_conversion")(d)
    mv = co[co["channels"] == "view"].iloc[0]
    assert mv["n_sessions"] == 10 and mv["conversions"] == 2
    mcv = co[co["channels"] == "click+view"].iloc[0]
    assert mcv["conv_rate"] == 0.6
    sh = q("shapley_attribution_channels")(d)
    sh = sh.set_index("channel")
    assert sh.loc["click", "shapley_value"] == round(0.4 / 12, 6)
    assert sh.loc["view", "shapley_value"] == \
        round(0.25 * 0.2 + 0.6 / 12, 6)
    assert sh.loc["error", "shapley_value"] == \
        round(-(0.2 / 12 + 0.6 / 12), 6)


# ---------------------------------------------------------------------------
# Stein shrinkage
# ---------------------------------------------------------------------------

def test_james_stein_known_shrink(tmp_path):
    d = str(tmp_path / "sf")
    # hours 1..4 with means 1,2,3,4 dollars and +-10c noise:
    # s2w = 200*4/(8-4) = 200c^2, var_mean = 100, ss = 50000
    # c = 1 - 100/50000 = .998
    ts, us, tp, vals = [], [], [], []
    uid = 0
    for h, m in [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]:
        for dv in (-0.1, 0.1):
            ts.append(f"1995-01-01T{h:02d}:00:00")
            us.append(uid)
            tp.append("view")
            vals.append(m + dv)
            uid += 1
    _write_events(d, ts, us, tp, vals)
    out = q("james_stein_hourly_value")(d)
    assert (out["shrink_c"] == 0.998).all()
    r1 = out[out["hour"] == 1].iloc[0]
    assert r1["raw_mean"] == 1.0
    assert r1["js_mean"] == round((250 + 0.998 * (100 - 250))
                                  / 100.0, 6)


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------

def test_brier_murphy_two_cells(tmp_path):
    d = str(tmp_path / "sf")
    # cell A (Sun 12h): half1 p=.5, half2 1/2 purchases
    # cell B (Mon 13h): half1 p=0, half2 0/2
    # brier = .125, rel = 0, res = .0625, unc = .1875
    ts, us, tp = [], [], []
    uid = 0

    def ev(day, hour, typ):
        nonlocal uid
        ts.append(f"1995-01-{day:02d}T{hour:02d}:{uid % 60:02d}:00")
        us.append(uid)
        tp.append(typ)
        uid += 1

    # half 1: days 1..5 (cut at day 5 of span 1..9 -> cut day index)
    ev(1, 12, "purchase")
    ev(1, 12, "view")
    ev(2, 13, "view")
    ev(2, 13, "view")
    # half 2: same weekday cells one week later
    ev(8, 12, "purchase")
    ev(8, 12, "view")
    ev(9, 13, "view")
    ev(9, 13, "view")
    _write_events(d, ts, us, tp)
    out = q("brier_murphy_hourweek")(d).iloc[0]
    assert out["n_scored"] == 4
    assert out["brier"] == 0.125
    assert out["reliability"] == 0.0
    assert out["resolution"] == 0.0625
    assert out["uncertainty"] == 0.1875
    assert out["identity_check"] == 0.125


# ---------------------------------------------------------------------------
# Competing risks
# ---------------------------------------------------------------------------

def test_competing_risks_hand_table(tmp_path):
    d = str(tmp_path / "sf")
    # u0 purchase t=1, u1 error t=1, u2 censored t=2, u3 purchase t=2
    # final: cif_p = .5, cif_e = .25, surv = .25
    # naive: 1-km_p = .625, 1-km_e = .25 -> overcount .125
    ts, us, tp = [], [], []

    def ev(u, day, typ):
        ts.append(f"1995-01-{day:02d}T12:{u:02d}:00")
        us.append(u)
        tp.append(typ)

    for u in range(4):
        ev(u, 1, "view")
    ev(0, 2, "purchase")
    ev(1, 2, "error")
    ev(2, 3, "view")
    ev(3, 3, "purchase")
    _write_events(d, ts, us, tp)
    fin = q("competing_risk_final_shares")(d).iloc[0]
    assert fin["cif_purchase_final"] == 0.5
    assert fin["cif_error_final"] == 0.25
    assert fin["surv_final"] == 0.25
    assert fin["identity_check"] == 1.0
    assert fin["naive_sum"] == 0.875
    assert fin["naive_overcount"] == 0.125
    tab = q("competing_risk_cif_daily")(d)
    r1 = tab[tab["day_t"] == 1].iloc[0]
    assert r1["at_risk"] == 4
    assert r1["cif_purchase"] == 0.25 and r1["cif_error"] == 0.25


# ---------------------------------------------------------------------------
# GPD tail
# ---------------------------------------------------------------------------

def test_gpd_fit_two_exceedances(tmp_path):
    d = str(tmp_path / "sf")
    # 38 events at 1.00, exceedances 2.00 and 3.00 over u = 100c
    # m = 150, s2 = 5000 -> xi = -1.75, beta = 412.5c
    ts = [f"1995-01-01T{h:02d}:{m:02d}:00"
          for h in range(8) for m in range(5)]
    vals = [1.0] * 38 + [2.0, 3.0]
    _write_events(d, ts, list(range(40)), ["view"] * 40, vals)
    out = q("gpd_fit_value_tail")(d).iloc[0]
    assert out["u_cents"] == 100 and out["n_exceed"] == 2
    assert out["xi"] == -1.75
    assert out["beta"] == 4.125
    assert out["heavy_tail"] == 0


# ---------------------------------------------------------------------------
# Dagum decomposition
# ---------------------------------------------------------------------------

def test_dagum_identical_segments_no_net_between(tmp_path):
    d = str(tmp_path / "sf")
    # segments A and B each hold user totals {1, 3} dollars:
    # G = .25 = Gw .125 + Gnb 0 + Gt .125
    _write_customer(d, [(0, "A"), (1, "A"), (2, "B"), (3, "B")])
    _write_events(d,
                  [f"1995-01-01T0{i}:00:00" for i in range(1, 5)],
                  [0, 1, 2, 3], ["view"] * 4,
                  [1.0, 3.0, 1.0, 3.0])
    out = q("dagum_gini_decomposition_segments")(d).iloc[0]
    assert out["gini_total"] == 0.25
    assert out["g_within"] == 0.125
    assert out["g_between_net"] == 0.0
    assert out["g_transvariation"] == 0.125
    assert out["identity_check"] == 0.25
    pair = q("segment_pair_affluence")(d).iloc[0]
    assert pair["dagum_d"] == 0.0 and pair["overlap"] == 1.0
    assert pair["gini_jh"] == 0.25


# ---------------------------------------------------------------------------
# Multiplicity control (structural: planted extreme cell survives BH)
# ---------------------------------------------------------------------------

def test_bh_fdr_planted_signal(tmp_path):
    d = str(tmp_path / "sf")
    ts, us, tp = [], [], []
    uid = 0
    # background: 1 view in each hour of one week
    for day in range(1, 8):
        for h in range(24):
            ts.append(f"1995-01-{day:02d}T{h:02d}:00:00")
            us.append(uid)
            tp.append("view")
            uid += 1
    # planted: 40 purchases in a single cell (Sun 12h)
    for i in range(40):
        ts.append(f"1995-01-01T12:{i + 1:02d}:00")
        us.append(uid)
        tp.append("purchase")
        uid += 1
    _write_events(d, ts, us, tp)
    out = q("bh_fdr_hourweek_purchase")(d).iloc[0]
    assert out["m"] == 168
    assert out["bh_sig"] >= 1
    assert out["naive_sig"] >= out["bh_sig"]
    pi0 = q("storey_pi0_hourweek_purchase")(d).iloc[0]
    assert pi0["m"] == 168
    assert 0.0 <= pi0["pi0"] <= 1.0


# ---------------------------------------------------------------------------
# Kleinberg burst detection
# ---------------------------------------------------------------------------

def test_kleinberg_planted_burst(tmp_path):
    d = str(tmp_path / "sf")
    # 5/day baseline, 25/day for days 10..13 -> one burst interval
    counts = [5] * 10 + [25] * 4 + [5] * 10
    ts, us = _days("1995-01-01", counts)
    _write_events(d, ts, us, ["view"] * len(ts))
    iv = q("kleinberg_burst_intervals")(d)
    assert len(iv) == 1
    r = iv.iloc[0]
    assert r["len_days"] == 4 and r["events"] == 100
    # lambda0 = 200/24 days; burst mean 25 -> ratio = 3.0 exactly
    assert r["rate_ratio"] == 3.0
    days = q("kleinberg_burst_days")(d)
    assert len(days) == 4 and (days["events"] == 25).all()


def _days(start, counts):
    ts, us = [], []
    uid = 0
    for i, c in enumerate(counts):
        for k in range(c):
            ts.append(np.datetime64(start, "D")
                      + np.timedelta64(i, "D"))
            us.append(uid)
            uid += 1
    return [str(t) + "T12:00:00" for t in ts], us
