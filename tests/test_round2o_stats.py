"""Planted-fixture pinning tests for the round-2o query batches
(medcouple + outlier rules, isotonic, interaction info + G²,
pinball/Winkler, Greenwood + max gap, c-hat + drift, meta-analysis
family, acceptance sampling, funnel plot). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY, _dl_pool
from tests.test_round2d_stats import _write_orders_pri
from tests.test_round2e_stats import _write_events
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


# ---------------------------------------------------------------------------
# Medcouple + outlier rules: four flat days and one 100x spike
# ---------------------------------------------------------------------------

def _rev_fixture(d):
    _write_events(d, [f"1995-01-0{i + 1}T12:00:00"
                      for i in range(5)],
                  list(range(5)), ["view"] * 5,
                  [1.0, 1.0, 1.0, 1.0, 100.0])


def test_medcouple_degenerate_iqr(tmp_path):
    d = str(tmp_path / "sf")
    _rev_fixture(d)
    r = q("medcouple_adjusted_fences_daily")(d).iloc[0]
    # cents [100 x4, 10000]: med=q1=q3=100, every straddling pair
    # has kernel exactly 1 -> MC = 1, all fences collapse to 100
    assert r["n_days"] == 5
    assert abs(r["medcouple"] - 1.0) < 1e-9
    assert r["q1_cents"] == 100 and r["q3_cents"] == 100
    assert abs(r["classic_hi"] - 100.0) < 1e-9
    assert abs(r["adjusted_hi"] - 100.0) < 1e-9


def test_outlier_rules_all_flag_spike(tmp_path):
    d = str(tmp_path / "sf")
    _rev_fixture(d)
    r = q("outlier_rule_disagreement_daily")(d)
    assert len(r) == 1
    row = r.iloc[0]
    assert row["day"] == "1995-01-05"
    assert row["revenue_cents"] == 10000
    assert (row["classic_flag"], row["adjusted_flag"],
            row["hampel_flag"]) == (1, 1, 1)


# ---------------------------------------------------------------------------
# Isotonic: a planted inversion at depth 2
# ---------------------------------------------------------------------------

def _depth_fixture(d):
    """depth1: 2 purchase + 2 view singles; depth2: 2 view-view;
    depth3: 1 view-click-purchase."""
    ts, us, tp = [], [], []
    uid = 0
    for t in ["purchase", "purchase", "view", "view"]:
        ts.append(f"1995-01-03T09:{uid:02d}:00")
        us.append(uid)
        tp.append(t)
        uid += 1
    for _ in range(2):
        ts += [f"1995-01-03T10:{uid:02d}:00",
               f"1995-01-03T10:{uid:02d}:30"]
        us += [uid, uid]
        tp += ["view", "view"]
        uid += 1
    ts += [f"1995-01-03T11:00:00", f"1995-01-03T11:00:30",
           f"1995-01-03T11:01:00"]
    us += [uid, uid, uid]
    tp += ["view", "click", "purchase"]
    _write_events(d, ts, us, tp)


def test_isotonic_pools_inversion(tmp_path):
    d = str(tmp_path / "sf")
    _depth_fixture(d)
    r = q("isotonic_conversion_by_depth")(d)
    assert list(r["depth"]) == [1, 2, 3]
    assert list(r["sessions"]) == [4, 2, 1]
    # raw [.5, 0, 1] -> PAVA pools depths 1-2 at 2/6
    assert abs(r["raw_rate"].iloc[1] - 0.0) < 1e-9
    assert abs(r["isotonic_rate"].iloc[0] - 1 / 3) < 1e-6
    assert abs(r["isotonic_rate"].iloc[1] - 1 / 3) < 1e-6
    assert abs(r["isotonic_rate"].iloc[2] - 1.0) < 1e-9
    assert list(r["pooled"]) == [1, 1, 0]


def test_isotonic_level_sets(tmp_path):
    d = str(tmp_path / "sf")
    _depth_fixture(d)
    r = q("isotonic_depth_level_sets")(d)
    assert len(r) == 2
    assert (r["depth_lo"].iloc[0], r["depth_hi"].iloc[0]) == (1, 2)
    assert r["sessions"].iloc[0] == 6
    assert abs(r["pooled_rate"].iloc[0] - 1 / 3) < 1e-6
    assert (r["depth_lo"].iloc[1], r["depth_hi"].iloc[1]) == (3, 3)


# ---------------------------------------------------------------------------
# Interaction information: degenerate constant purchases -> all zero
# ---------------------------------------------------------------------------

def _flat_purchase_fixture(d):
    ts, us, tp = [], [], []
    uid = 0
    views = [1, 2, 1, 2, 1, 2, 1, 2]
    for i, v in enumerate(views):
        for k in range(v):
            ts.append(f"1995-01-{i + 1:02d}T08:{k:02d}:00")
            us.append(uid)
            tp.append("view")
            uid += 1
        ts.append(f"1995-01-{i + 1:02d}T12:00:00")
        us.append(uid)
        tp.append("purchase")
        uid += 1
    _write_events(d, ts, us, tp)


def test_interaction_information_degenerate_zero(tmp_path):
    d = str(tmp_path / "sf")
    _flat_purchase_fixture(d)
    r = q("interaction_information_daily")(d).iloc[0]
    # purchases constant -> P-indicator all zero -> every MI = 0
    assert abs(r["mi_vp_bits"] - 0.0) < 1e-9
    assert abs(r["mi_vp_given_w_bits"] - 0.0) < 1e-9
    assert abs(r["interaction_bits"] - 0.0) < 1e-9
    g = q("conditional_independence_g2_daily")(d).iloc[0]
    assert abs(g["g2_marginal"] - 0.0) < 1e-9
    assert abs(g["g2_conditional"] - 0.0) < 1e-9
    assert g["independent_given_weekend"] == 1


# ---------------------------------------------------------------------------
# Pinball + Winkler on the 2-train-day line
# ---------------------------------------------------------------------------

def test_pinball_hand_losses(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [3, 5, 7, 7, 7, 7, 7, 7, 7])
    r = q("quantile_forecast_backtest")(d)
    lo = r[r["tau"] == 0.1].iloc[0]
    hi = r[r["tau"] == 0.9].iloc[0]
    # single train pair -> both lines are y = 1 + 2t
    assert abs(lo["pinball_trend"] - 5.4) < 1e-6
    assert abs(lo["pinball_naive"] - 0.4) < 1e-6
    assert lo["trend_wins"] == 0
    assert abs(hi["pinball_trend"] - 0.6) < 1e-6
    assert abs(hi["pinball_naive"] - 1.8) < 1e-6
    assert hi["trend_wins"] == 1


def test_winkler_degenerate_interval(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [3, 5, 7, 7, 7, 7, 7, 7, 7])
    r = q("interval_winkler_daily")(d).iloc[0]
    # width-0 model band: covered only where the line hits 7
    assert abs(r["winkler_trend"] - 60.0) < 1e-6
    assert abs(r["coverage_trend"] - 1 / 7) < 1e-6
    assert abs(r["winkler_naive"] - 22.0) < 1e-6
    assert abs(r["coverage_naive"] - 0.0) < 1e-9
    assert r["trend_wins"] == 0


# ---------------------------------------------------------------------------
# Greenwood + max clock gap on the symmetric two-point clock
# ---------------------------------------------------------------------------

def test_greenwood_two_even_spacings(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-05T06:00:00", "1995-01-06T18:00:00"],
                  [0, 1], ["purchase"] * 2)
    r = q("greenwood_clock_spacings")(d).iloc[0]
    # two half-day spacings: G = .5, E = 2/3, Var = 1/45
    assert r["n_spacings"] == 2
    assert abs(r["greenwood_g"] - 0.5) < 1e-9
    assert abs(r["expected_g"] - 2 / 3) < 1e-6
    assert abs(r["z"] - (-1 / 6) * np.sqrt(45)) < 1e-5
    assert r["clustered"] == 0


def test_max_clock_gap_tie_earliest(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-05T06:00:00", "1995-01-06T18:00:00"],
                  [0, 1], ["purchase"] * 2)
    r = q("max_clock_gap_purchases")(d).iloc[0]
    assert r["gap_start_sec"] == 21600
    assert r["gap_end_sec"] == 64800
    assert r["gap_seconds"] == 43200
    assert abs(r["p_gumbel"]
               - (1 - np.exp(-2 * np.exp(-1)))) < 1e-6


# ---------------------------------------------------------------------------
# c-hat + drift on the two-day flip
# ---------------------------------------------------------------------------

def test_chat_hand_four(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-02T10:00:00", "1995-01-02T11:00:00",
                      "1995-01-03T10:00:00", "1995-01-03T11:00:00"],
                  [0, 1, 2, 3],
                  ["view", "view", "purchase", "purchase"])
    r = q("mix_overdispersion_chat")(d).iloc[0]
    # 2x2 flip: X2 = 4 on 1 df -> c-hat 4, SE inflation 2
    assert r["df"] == 1
    assert abs(r["pearson_x2"] - 4.0) < 1e-9
    assert abs(r["c_hat"] - 4.0) < 1e-9
    assert abs(r["se_inflation"] - 2.0) < 1e-9
    dr = q("mix_drift_by_type")(d)
    assert all(abs(v - 4.0) < 1e-6 for v in dr["drift_ratio"])


# ---------------------------------------------------------------------------
# Meta-analysis family on three planted weeks
# ---------------------------------------------------------------------------

_META_COUNTS = [2, 1, 1, 1, 1, 1, 4,     # wk1: th=2, v=1
                4, 2, 2, 2, 2, 2, 8,     # wk2: th=4, v=4
                3, 3, 3, 3, 3, 3, 5]     # wk3: th=1, v=1


def test_meta_hand_pool(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _META_COUNTS)
    r = q("weekend_effect_meta_analysis")(d).iloc[0]
    # weights (1, .25, 1): tf = 4/2.25, Q = 1.888889 < k-1=2
    # -> tau2 clamps to 0 and random == fixed
    assert r["n_weeks"] == 3
    assert abs(r["theta_fixed"] - 4 / 2.25) < 1e-6
    assert abs(r["theta_random"] - 4 / 2.25) < 1e-6
    assert abs(r["tau2"] - 0.0) < 1e-9
    assert abs(r["cochran_q"] - 1.888889) < 1e-5
    assert abs(r["i2"] - 0.0) < 1e-9


def test_meta_forest_weights(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _META_COUNTS)
    r = q("weekend_effect_forest")(d)
    assert len(r) == 3
    assert [round(v, 4) for v in r["weight_fixed_pct"]] \
        == [44.4444, 11.1111, 44.4444]
    assert list(r["effect"]) == [2.0, 4.0, 1.0]


def test_meta_loo_hand_row(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _META_COUNTS)
    r = q("meta_leave_one_out")(d)
    assert len(r) == 3
    # drop week 1: thetas (4, v=4), (1, v=1): DL tau2 = 2,
    # pooled = 2, se = sqrt(2)
    row = r.iloc[0]
    assert row["weeks_used"] == 2
    assert abs(row["theta_random"] - 2.0) < 1e-6
    assert abs(row["se_random"] - np.sqrt(2.0)) < 1e-6
    assert row["significant"] == 0
    # cross-check every row against the shared pool helper
    eff = [(2.0, 1.0), (4.0, 4.0), (1.0, 1.0)]
    for i in range(3):
        th = np.array([e[0] for j, e in enumerate(eff) if j != i])
        v = np.array([e[1] for j, e in enumerate(eff) if j != i])
        tr, se = _dl_pool(th, v)
        assert abs(r["theta_random"].iloc[i] - tr) < 1e-6


def test_meta_cumulative_rows(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _META_COUNTS)
    r = q("meta_cumulative")(d)
    assert list(r["weeks_used"]) == [2, 3]
    tr, se = _dl_pool(np.array([2.0, 4.0]), np.array([1.0, 4.0]))
    assert abs(r["theta_random"].iloc[0] - tr) < 1e-6


# ---------------------------------------------------------------------------
# Acceptance sampling on the 50% late fixture
# ---------------------------------------------------------------------------

def _write_lineitem_supp(d, rows):
    """rows: (orderkey, suppkey, shipdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows)),
        "l_extendedprice": pa.array([100.0] * len(rows)),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(
            np.array([r[2] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def _write_supp_nation(d, sup_rows, nat_rows):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([r[0] for r in sup_rows],
                              pa.int64()),
        "s_name": pa.array([f"s{r[0]}" for r in sup_rows]),
        "s_nationkey": pa.array([r[1] for r in sup_rows],
                                pa.int32()),
        "s_acctbal": pa.array([0.0] * len(sup_rows))}),
        os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([r[0] for r in nat_rows],
                                pa.int32()),
        "n_name": pa.array([r[1] for r in nat_rows]),
        "n_regionkey": pa.array([0] * len(nat_rows), pa.int32())}),
        os.path.join(d, "nation.parquet"))


def test_acceptance_sampling_half_late(tmp_path):
    d = str(tmp_path / "sf")
    _write_orders_pri(d, [(1, 1, 1.0, "1995-01-01", "1-URGENT"),
                          (2, 1, 1.0, "1995-01-01", "1-URGENT")])
    _write_lineitem_supp(d, [(1, 1, "1995-03-22"),
                             (2, 1, "1995-04-11")])
    r = q("acceptance_sampling_oc")(d).iloc[0]
    assert abs(r["late_rate"] - 0.5) < 1e-9
    assert r["p_accept_obs"] < 1e-6

    def pa_(p):
        return (1 - p) ** 48 * ((1 - p) ** 2 + 50 * p * (1 - p)
                                + 1225 * p * p)

    grid = np.arange(1, 1000) / 1000.0
    pg = pa_(grid)
    assert abs(r["aql_95"] - grid[pg >= 0.95].max()) < 1e-9
    assert abs(r["ltpd_10"] - grid[pg <= 0.10].min()) < 1e-9
    a = q("aoql_late_shipments")(d).iloc[0]
    prod = grid * pg
    assert abs(a["aoql"] - prod.max()) < 1e-6


def test_funnel_two_nations(tmp_path):
    d = str(tmp_path / "sf")
    rows = []
    for k in range(1, 9):
        rows.append((k, 1,
                     "1995-04-11" if k <= 4 else "1995-01-11"))
    for k in range(9, 17):
        rows.append((k, 2, "1995-01-11"))
    _write_lineitem_supp(d, rows)
    _write_orders_pri(d, [(k, 1, 1.0, "1995-01-01", "3-MEDIUM")
                          for k in range(1, 17)])
    _write_supp_nation(d, [(1, 0), (2, 1)],
                       [(0, "ALPHA"), (1, "BETA")])
    r = q("late_shipment_funnel_nations")(d)
    # pooled p0 = .25: z = +-.25/sqrt(.25*.75/8)
    z = 0.25 / np.sqrt(0.25 * 0.75 / 8)
    assert list(r["nation"]) == ["ALPHA", "BETA"]
    assert abs(r["z"].iloc[0] - z) < 1e-5
    assert abs(r["z"].iloc[1] + z) < 1e-5
    assert list(r["outside_95"]) == [0, 0]
    f = q("funnel_overdispersion_adjusted")(d).iloc[0]
    assert abs(f["phi"] - z * z) < 1e-4
    assert f["outside_95_naive"] == 0
    assert f["overdispersed"] == 1
