"""Planted-fixture pinning tests for the round-2i query batches
(process mining, Tukey/Mandel additivity, GPH, entropy bias, IV +
Hausman, PRESS/LOO, Goodman–Kruskal λ / Theil U, digit randomness,
NW kernel smoothing, Ferro–Segers, CCA). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.

Date anchors: 1995-01-01 Sunday; 1995-01-05 Thursday.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import _write_events, _write_documents
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


def test_process_footprint_and_dependency(tmp_path):
    d = str(tmp_path / "sf")
    # user0: view>click>view (one session) -> view||click
    # user1: signup>purchase -> '->'
    # user2: error>error -> self '||'
    _write_events(d,
                  ["1995-01-01T10:00:00", "1995-01-01T10:01:00",
                   "1995-01-01T10:02:00",
                   "1995-01-01T11:00:00", "1995-01-01T11:01:00",
                   "1995-01-01T12:00:00", "1995-01-01T12:01:00"],
                  [0, 0, 0, 1, 1, 2, 2],
                  ["view", "click", "view", "signup", "purchase",
                   "error", "error"])
    fp = q("process_footprint_matrix")(d)
    rel = {(a, b): r for a, b, r in
           zip(fp["type_a"], fp["type_b"], fp["relation"])}
    assert rel[("click", "view")] == "||"
    assert rel[("purchase", "signup")] == "<-"
    assert rel[("error", "error")] == "||"
    assert rel[("click", "signup")] == "#"
    hd = q("heuristics_dependency_graph")(d)
    dep = {(a, b): v for a, b, v in
           zip(hd["type_a"], hd["type_b"], hd["dependency"])}
    assert dep[("signup", "purchase")] == 0.5
    assert dep[("view", "click")] == 0.0
    assert dep[("error", "error")] == 0.5


def test_tukey_mandel_pure_product_table(tmp_path):
    d = str(tmp_path / "sf")
    # value = dow * band dollars per cell: residual is exactly
    # alpha*beta/(4.5*100) in cents, so lambda = 1/450 and
    # SS_nonadd = SS_resid = 140*100^2; Mandel slopes are the
    # scale-free dow/3 (product interaction IS row-linear)
    ts, us, tp, vals = [], [], [], []
    uid = 0
    for day in range(1, 8):
        dow = (day + 6) % 7            # epoch-day dow: Jan 1 -> 0
        for band in range(4):
            ts.append(f"1995-01-{day:02d}T{band * 6:02d}:30:00")
            us.append(uid)
            tp.append("view")
            vals.append(float(dow * band))
            uid += 1
    _write_events(d, ts, us, tp, vals)
    tk = q("tukey_additivity_dow_hourband")(d).iloc[0]
    # cell means are in CENTS: lambda scales by 1/100, SS by 100^2
    assert tk["lambda_hat"] == round(1 / 450, 6)
    assert tk["ss_nonadd"] == 1400000.0
    assert tk["ss_resid"] == 0.0
    assert tk["nonadditive"] == 1
    md = q("mandel_row_slopes_dow_hourband")(d)
    for dow in range(7):
        assert md[md["dow"] == dow]["row_slope"].iloc[0] == \
            round(dow / 3, 6)
    assert md["ss_mandel"].iloc[0] == 1400000.0


def test_gph_antipersistent_alternation(tmp_path):
    d = str(tmp_path / "sf")
    # period-2 alternation concentrates power at high frequency:
    # the low-frequency regression sees a rising spectrum -> d < 0
    _daily_events(d, [1, 5] * 8)
    r = q("gph_log_periodogram_daily")(d).iloc[0]
    assert r["n_days"] == 16 and r["n_freqs"] == 4
    assert r["d_gph"] < 0
    assert r["stationary"] == (1 if abs(r["d_gph"]) < 0.5 else 0)
    assert r["h_gph"] == round(r["d_gph"] + 0.5, 6)


def test_entropy_bias_hand_chao_shen(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(1, "a a b", "s0")])
    r = q("entropy_bias_panel_by_source")(d).iloc[0]
    hp = -(2 / 3 * np.log(2 / 3) + 1 / 3 * np.log(1 / 3))
    assert r["h_plugin"] == round(hp, 6)
    assert r["h_miller_madow"] == round(hp + 1 / 6, 6)
    pt = np.array([2 / 3 * 2 / 3, 2 / 3 * 1 / 3])
    hcs = float((-(pt * np.log(pt))
                 / (1 - (1 - pt) ** 3)).sum())
    assert r["h_chao_shen"] == round(hcs, 6)
    assert r["coverage"] == round(2 / 3, 6)


def _iv_fixture(d):
    """Days Jan 5-8 (Thu,Fri,Sat,Sun): views [1,2,3,5],
    purchases [0,1,1,2]."""
    ts, us, tp = [], [], []
    uid = 0
    views = [1, 2, 3, 5]
    purch = [0, 1, 1, 2]
    for i in range(4):
        for j in range(views[i]):
            ts.append(f"1995-01-0{5 + i}T01:{j:02d}:00")
            us.append(uid)
            tp.append("view")
            uid += 1
        for j in range(purch[i]):
            ts.append(f"1995-01-0{5 + i}T02:{j:02d}:00")
            us.append(uid)
            tp.append("purchase")
            uid += 1
    _write_events(d, ts, us, tp)


def test_wald_iv_and_hausman_hand_moments(tmp_path):
    d = str(tmp_path / "sf")
    _iv_fixture(d)
    r = q("wald_iv_purchases_per_view")(d).iloc[0]
    assert r["n_days"] == 4
    assert r["b_iv"] == 0.4
    assert r["b_ols"] == round(4 / 8.75, 6)
    assert r["first_stage_f"] == 5.0
    assert r["instrument_strong"] == 0
    h = q("durbin_wu_hausman_views")(d).iloc[0]
    sig2 = (2 - 2 * 0.4 * 4 + 0.16 * 8.75) / 2
    dv = sig2 * 1 / 6.25 - sig2 / 8.75
    hstat = (0.4 - 4 / 8.75) ** 2 / dv
    assert h["sigma2_iv"] == round(sig2, 6)
    assert h["hausman_stat"] == round(hstat, 6)


def test_press_perfect_line(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 2, 3, 4])
    r = q("press_predicted_r2_daily")(d).iloc[0]
    assert r["r2"] == 1.0
    assert r["press"] == 0.0
    assert r["predicted_r2"] == 1.0
    assert r["optimism_gap"] == 0.0


def test_loo_cv_exact_group_factor(tmp_path):
    d = str(tmp_path / "sf")
    # each dow appears twice with counts (c, c+2): in-sample MAE 1,
    # LOO MAE 2 -> optimism factor exactly n_g/(n_g-1) = 2
    _daily_events(d, [1, 2, 3, 4, 5, 6, 7,
                      3, 4, 5, 6, 7, 8, 9])
    r = q("loo_cv_dow_model_daily")(d).iloc[0]
    assert r["n_days"] == 14 and r["singleton_days"] == 0
    assert r["mae_insample"] == 1.0
    assert r["mae_loo"] == 2.0
    assert r["optimism_factor"] == 2.0


def _write_orders_seg(d, rows):
    """rows: (orderkey, custkey, priority)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows)),
        "o_totalprice": pa.array([1.0] * len(rows)),
        "o_orderdate": pa.array(
            np.array(["1995-01-01T00:00:00"] * len(rows),
                     dtype="datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array([r[2] for r in rows])}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["c1", "c2"]),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0]),
        "c_mktsegment": pa.array(["A", "B"])}),
        os.path.join(d, "customer.parquet"))


def test_lambda_and_uncertainty_hand_table(tmp_path):
    d = str(tmp_path / "sf")
    # A: P=3, Q=1; B: P=1, Q=3
    rows = []
    ok = 1
    for cust, pri, cnt in [(1, "P", 3), (1, "Q", 1),
                           (2, "P", 1), (2, "Q", 3)]:
        for _ in range(cnt):
            rows.append((ok, cust, pri))
            ok += 1
    _write_orders_seg(d, rows)
    lam = q("goodman_kruskal_lambda_segment_priority")(d).iloc[0]
    assert lam["n_orders"] == 8
    assert lam["lambda_priority_given_segment"] == 0.5
    assert lam["lambda_segment_given_priority"] == 0.5
    assert lam["lambda_symmetric"] == 0.5
    u = q("uncertainty_coefficient_segment_priority")(d).iloc[0]
    hj = -(2 * (3 / 8) * np.log(3 / 8)
           + 2 * (1 / 8) * np.log(1 / 8))
    i = 2 * np.log(2) - hj
    assert u["mutual_info_nats"] == round(i, 6)
    assert u["u_symmetric"] == round(i / np.log(2), 6)


def test_digit_serial_single_digit_stream(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-01T01:00:00", "1995-01-01T02:00:00",
                      "1995-01-01T03:00:00"],
                  [0, 0, 0], ["view"] * 3, [0.01, 0.01, 0.01])
    r = q("digit_serial_pair_test")(d).iloc[0]
    assert r["n_pairs"] == 2
    assert r["chi2"] == 0.0
    assert r["df"] == 0
    assert r["rejected"] == 0


def test_digit_gap_hand_histogram(tmp_path):
    d = str(tmp_path / "sf")
    # one user, digits [0,1,0,1,1,0]: gaps 1 and 2; p0 = 1/2
    vals = [0.10, 0.11, 0.10, 0.11, 0.11, 0.10]
    _write_events(d, [f"1995-01-01T0{i + 1}:00:00"
                      for i in range(6)],
                  [0] * 6, ["view"] * 6, vals)
    r = q("digit_gap_test_zero")(d).iloc[0]
    assert r["n_gaps"] == 2 and r["p_zero"] == 0.5
    x = 0.0
    for k in range(11):
        e = 2 * (0.5 ** (k + 1) if k < 10 else 0.5 ** 10)
        o = 1 if k in (1, 2) else 0
        x += (o - e) ** 2 / e
    assert r["chi2"] == round(x, 6)


def test_nw_kernel_two_hours(tmp_path):
    d = str(tmp_path / "sf")
    # hours 0 and 12 (antipodal, circular distance 12): rates
    # 1.0 and 0.0 pull each other toward the middle equally
    _write_events(d, ["1995-01-01T00:00:00", "1995-01-01T00:30:00",
                      "1995-01-01T12:00:00", "1995-01-01T12:30:00"],
                  [0, 1, 2, 3],
                  ["purchase", "purchase", "view", "view"])
    out = q("nw_purchase_rate_by_hour")(d)
    assert len(out) == 2
    w = np.exp(-144 / (2 * 1.5 * 1.5))
    sm0 = (2 * 1 + w * 2 * 0) / (2 + 2 * w)
    r0 = out[out["hour"] == 0].iloc[0]
    assert r0["rate_raw"] == 1.0
    assert r0["rate_smooth"] == round(sm0, 6)
    bw = q("nw_bandwidth_sensitivity")(d)
    assert len(bw) == 3
    assert (bw["roughness"] >= 0).all()


def test_ferro_segers_hand_gaps(tmp_path):
    d = str(tmp_path / "sf")
    counts = [1] * 30
    for day in (3, 4, 10, 11, 20, 21):
        counts[day - 1] = 10
    _daily_events(d, counts)
    r = q("ferro_segers_extremal_index")(d).iloc[0]
    # gaps [1,6,1,9,1]: max>2 variant, theta = 2*13^2/(5*76)
    assert r["n_exceed"] == 6
    assert r["small_gap_variant"] == 0
    th = min(1.0, 2 * 13 ** 2 / (5 * 76))
    assert r["theta"] == round(th, 6)
    assert r["mean_cluster_size"] == round(1 / th, 6)
    dc = q("declustered_incident_rate")(d).iloc[0]
    assert dc["window_days"] == 30
    assert dc["naive_days_between"] == 5.0
    assert dc["independent_incidents"] == round(th * 6, 6)


def test_cca_against_independent_eig(tmp_path):
    d = str(tmp_path / "sf")
    plan = [(1, 2, 1, 1), (2, 1, 2, 1), (3, 1, 4, 2), (5, 2, 5, 1)]
    ts, us, tp = [], [], []
    uid = 0
    for i, (v, c, p, e) in enumerate(plan):
        for kind, cnt in [("view", v), ("click", c),
                          ("purchase", p), ("error", e)]:
            for j in range(cnt):
                ts.append(f"1995-01-0{i + 1}T0{j + 1}:00:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)
    r = q("cca_demand_outcome_daily")(d).iloc[0]
    # independent recomputation via numpy eigendecomposition
    M = np.array(plan, float)
    Mc = M - M.mean(axis=0)
    S = Mc.T @ Mc
    sxx, sxy, syy = S[:2, :2], S[:2, 2:], S[2:, 2:]
    eigs = np.linalg.eigvals(
        np.linalg.inv(sxx) @ sxy @ np.linalg.inv(syy) @ sxy.T)
    eigs = np.sort(np.real(eigs))
    assert r["rho1"] == round(float(np.sqrt(eigs[-1])), 6)
    assert r["rho2"] == round(float(np.sqrt(max(eigs[0], 0))), 6)
    assert 0 <= r["wilks_lambda"] <= 1
