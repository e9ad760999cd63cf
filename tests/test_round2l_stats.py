"""Planted-fixture pinning tests for the round-2l query batches
(aggregation ladder, temporal concentration, Gini jackknife +
A/A, broken stick, front door, binomial intervals). Oracle parity
runs in tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import _write_events
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


def _vp_days(d, views, purchases):
    ts, us, tp = [], [], []
    uid = 0
    for i, (v, p) in enumerate(zip(views, purchases)):
        for kind, cnt in [("view", v), ("purchase", p)]:
            for j in range(cnt):
                ts.append(f"1995-01-{i + 1:02d}T0{j % 8 + 1}:"
                          f"{j % 60:02d}:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)


def test_aggregation_ladder_scale_invariant(tmp_path):
    d = str(tmp_path / "sf")
    # purchases == views daily: r = 1 and slope = 1 at EVERY grain
    _vp_days(d, list(range(1, 15)), list(range(1, 15)))
    lad = q("aggregation_bias_ladder")(d)
    assert set(lad["grain"]) == {"day", "triday", "week"}
    assert (lad["pearson_r"] == 1.0).all()
    assert (lad["slope_purch_per_view"] == 1.0).all()
    infl = q("aggregation_r2_inflation")(d).iloc[0]
    assert infl["triday_over_day"] == 1.0
    assert infl["week_over_day"] == 1.0


def test_revenue_concentration_hand_ranks(tmp_path):
    d = str(tmp_path / "sf")
    # daily revenue [10,1,1,1,1]: 1 day holds 50%, 3 days hold 80%
    _write_events(d, [f"1995-01-0{i + 1}T12:00:00"
                      for i in range(5)],
                  list(range(5)), ["view"] * 5,
                  [10.0, 1.0, 1.0, 1.0, 1.0])
    r = q("revenue_day_concentration")(d).iloc[0]
    assert r["n_days"] == 5
    assert r["days_for_50pct"] == 1
    assert r["days_for_80pct"] == 3
    assert r["top_day_share_pct"] == round(10 / 14 * 100, 6)
    assert r["top5_max_run"] == 5


def test_gini_jackknife_three_values(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-01T01:00:00", "1995-01-01T02:00:00",
                      "1995-01-01T03:00:00"],
                  [0, 1, 2], ["view"] * 3, [1.0, 3.0, 5.0])
    r = q("gini_user_value_jackknife")(d).iloc[0]
    assert r["gini"] == round(8 / 27, 6)
    # LOO ginis 1/8, 1/3, 1/4 -> var = (2/3)*114/5184
    assert r["se_jack"] == round(np.sqrt(2 / 3 * 114 / 5184), 6)


def test_gini_aa_degenerate_arms(tmp_path):
    d = str(tmp_path / "sf")
    # one user per arm: each arm's jackknife SE is undefined-free
    # zero (single leave-out set), so the z is NULL on both engines
    _write_events(d, ["1995-01-01T01:00:00", "1995-01-01T02:00:00",
                      "1995-01-01T03:00:00", "1995-01-01T04:00:00"],
                  [0, 1, 2, 3], ["view"] * 4,
                  [1.0, 2.0, 3.0, 4.0])
    r = q("gini_aa_calibration")(d).iloc[0]
    assert r["n_arm0"] == 2 and r["n_arm1"] == 2
    assert r["gini_arm0"] == 0.25
    assert r["gini_arm1"] == round(1 / 6, 6)
    assert np.isnan(r["gap_z"])
    assert r["false_positive"] == 0


def test_broken_stick_exact_two_slopes(tmp_path):
    d = str(tmp_path / "sf")
    # slope 1 through day 5, slope 3 after: exact fit at k=5
    _daily_events(d, [1, 2, 3, 4, 5, 8, 11, 14, 17, 20])
    r = q("broken_stick_daily_trend")(d).iloc[0]
    assert r["knot_day"] == 5
    assert r["slope_before"] == 1.0
    assert r["slope_after"] == 3.0
    assert r["slope_change"] == 2.0
    assert r["sse_broken"] == 0.0
    assert r["r2"] == 1.0
    s = q("broken_stick_significance")(d).iloc[0]
    assert np.isnan(s["f_naive"])
    assert s["naive_rejected"] == 1
    assert s["davies_rejected"] == 1


def test_front_door_against_lstsq(tmp_path):
    d = str(tmp_path / "sf")
    plan_v = [1, 2, 3, 5]
    plan_c = [2, 3, 5, 7]
    plan_p = [1, 2, 4, 5]
    ts, us, tp = [], [], []
    uid = 0
    for i in range(4):
        for kind, cnt in [("view", plan_v[i]), ("click",
                                                plan_c[i]),
                          ("purchase", plan_p[i])]:
            for j in range(cnt):
                ts.append(f"1995-01-0{i + 1}T0{j + 1}:00:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)
    r = q("front_door_views_purchases")(d).iloc[0]
    v = np.array(plan_v, float)
    c = np.array(plan_c, float)
    p = np.array(plan_p, float)
    b1 = np.polyfit(v, c, 1)[0]
    X = np.column_stack([np.ones(4), c, v])
    beta, *_ = np.linalg.lstsq(X, p, rcond=None)
    assert r["clicks_per_view"] == round(float(b1), 6)
    assert r["purchases_per_click_adj"] == round(float(beta[1]),
                                                 6)
    assert r["b_front_door"] == round(float(b1 * beta[1]), 6)
    chk = q("front_door_direct_effect_check")(d).iloc[0]
    assert chk["direct_views_coef"] == round(float(beta[2]), 6)


def test_binomial_intervals_rarest(tmp_path):
    d = str(tmp_path / "sf")
    # counts: signup 1, click 4, view 5 (n=10)
    tys = ["signup"] + ["click"] * 4 + ["view"] * 5
    _write_events(d, [f"1995-01-01T0{i}:00:00" for i in range(10)],
                  list(range(10)), tys)
    r = q("binomial_interval_panel_rarest_type")(d).iloc[0]
    assert r["rarest_type"] == "signup"
    assert r["share"] == 0.1
    # Wald lower limit is negative at p=.1, n=10 -> clipped
    assert r["wald_clipped"] == 1 and r["wald_lo"] == 0.0
    z = 1.96
    den = 1 + z * z / 10
    ctr = 0.1 + z * z / 20
    hw = z * np.sqrt(0.1 * 0.9 / 10 + z * z / 400)
    assert r["wilson_lo"] == round((ctr - hw) / den, 6)
    rk = q("type_share_ranking_reliability")(d)
    # with n=10 every adjacent Wilson pair overlaps
    assert (rk["rank_reliable"] == 0).all()
