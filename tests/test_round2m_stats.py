"""Planted-fixture pinning tests for the round-2m query batches
(Bowker symmetry + net flow, Fligner–Killeen + Conover, Watson U²,
Goldfeld–Quandt + Prais–Winsten, join counts + Gi*, LAD + quantile
corridor, process capability). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2d_stats import _write_orders_pri
from tests.test_round2e_stats import _write_events, _write_lineitem_ship
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


# ---------------------------------------------------------------------------
# Bowker symmetry + net flow
# ---------------------------------------------------------------------------

def _pair_sessions(d, n_vc, n_cv):
    """n_vc users doing view→click (60 s apart), n_cv doing
    click→view; every user is one session, one transition."""
    ts, us, tp = [], [], []
    uid = 0
    for k in range(n_vc):
        ts += [f"1995-01-03T10:{2 * k:02d}:00",
               f"1995-01-03T10:{2 * k:02d}:30"]
        us += [uid, uid]
        tp += ["view", "click"]
        uid += 1
    for k in range(n_cv):
        ts += [f"1995-01-03T11:{2 * k:02d}:00",
               f"1995-01-03T11:{2 * k:02d}:30"]
        us += [uid, uid]
        tp += ["click", "view"]
        uid += 1
    _write_events(d, ts, us, tp)


def test_bowker_hand_chi2(tmp_path):
    d = str(tmp_path / "sf")
    _pair_sessions(d, 4, 1)
    r = q("bowker_symmetry_transitions")(d).iloc[0]
    # one off-diagonal pair {click,view}: chi2 = (4-1)^2/5 = 1.8
    assert r["n_pairs"] == 1
    assert abs(r["bowker_chi2"] - 1.8) < 1e-9
    assert r["top_pair_a"] == "click"
    assert r["top_pair_b"] == "view"
    # Wilson–Hilferty at k=1: z = (1.8^(1/3) - 7/9)/sqrt(2/9)
    z = (1.8 ** (1 / 3) - 7 / 9) / np.sqrt(2 / 9)
    assert abs(z - 0.930548) < 1e-5
    assert 0.17 < r["p_wh"] < 0.18
    assert r["asymmetric"] == 0


def test_net_flow_exact_mcnemar_z(tmp_path):
    d = str(tmp_path / "sf")
    _pair_sessions(d, 4, 1)
    r = q("transition_net_flow")(d)
    assert len(r) == 1
    row = r.iloc[0]
    assert (row["type_a"], row["type_b"]) == ("click", "view")
    assert row["n_ab"] == 1 and row["n_ba"] == 4
    assert row["net"] == -3
    assert abs(row["direction_z"] - (-3 / np.sqrt(5))) < 1e-6


# ---------------------------------------------------------------------------
# Fligner–Killeen + Conover: the scale-free chi2 = 1 fixture
# ---------------------------------------------------------------------------

def _scale_fixture(d):
    # weekend (Sun 1995-01-01) values {0, 20}: deviations {0, 2000}c
    # weekday (Mon 1995-01-02) values {5, 5}: deviations {0, 0}
    _write_events(
        d,
        ["1995-01-01T10:00:00", "1995-01-01T11:00:00",
         "1995-01-02T10:00:00", "1995-01-02T11:00:00"],
        [0, 1, 2, 3], ["view"] * 4, [0.0, 20.0, 5.0, 5.0])


def test_fligner_killeen_scale_free_unity(tmp_path):
    d = str(tmp_path / "sf")
    _scale_fixture(d)
    r = q("fligner_killeen_weekend_scale")(d).iloc[0]
    # pooled deviations: u=0 (x3, one weekend), u=2000 (weekend).
    # With scores a0 = inv(0.7), a1 = inv(0.9) the statistic
    # algebraically collapses to EXACTLY 1 whatever a0, a1 are:
    # numerator 2(x/4)^2*2 = x^2/4 equals s^2 = (3x^2/4)/3.
    assert r["n_weekend"] == 2 and r["n_weekday"] == 2
    assert abs(r["fk_chi2"] - 1.0) < 1e-9
    assert r["scale_rejected"] == 0


def test_conover_squared_ranks_unity(tmp_path):
    d = str(tmp_path / "sf")
    _scale_fixture(d)
    r = q("conover_squared_ranks_weekend")(d).iloc[0]
    # midranks 2 (x3) and 4: q = {4,4,4,16}; T = (200+32-196)/36 = 1
    assert abs(r["conover_t"] - 1.0) < 1e-9
    assert r["scale_rejected"] == 0


# ---------------------------------------------------------------------------
# Watson U²
# ---------------------------------------------------------------------------

def test_watson_one_sample_symmetric_pair(tmp_path):
    d = str(tmp_path / "sf")
    # purchases at 06:00 and 18:00: u = {.25,.75} hit (2i-1)/(2n)
    # exactly, so U² = 1/(12n) = 1/24
    _write_events(d, ["1995-01-05T06:00:00", "1995-01-05T18:00:00"],
                  [0, 1], ["purchase"] * 2)
    r = q("watson_u2_purchase_uniformity")(d).iloc[0]
    assert r["n_purchases"] == 2
    assert abs(r["watson_u2"] - 1 / 24) < 1e-6
    assert r["nonuniform"] == 0


def test_watson_two_sample_hand_value(tmp_path):
    d = str(tmp_path / "sf")
    # views 06:00,12:00; purchases 12:00,18:00 (shared noon ties)
    _write_events(d, ["1995-01-05T06:00:00", "1995-01-05T12:00:00",
                      "1995-01-06T12:00:00", "1995-01-06T18:00:00"],
                  [0, 1, 2, 3],
                  ["view", "view", "purchase", "purchase"])
    r = q("watson_u2_view_purchase_hours")(d).iloc[0]
    # d at the 3 distinct seconds: .5,.5,0 with t = 1,2,1
    # U² = (4/16)·(0.75 − 1.5²/4) = 0.046875
    assert abs(r["watson_u2"] - 0.046875) < 1e-9
    assert r["rejected"] == 0


# ---------------------------------------------------------------------------
# Goldfeld–Quandt + Prais–Winsten
# ---------------------------------------------------------------------------

def test_goldfeld_quandt_hand_f(tmp_path):
    d = str(tmp_path / "sf")
    # early [5,6,5,6] SSR = .8; late [1,9,1,9] SSR = 51.2; F = 64
    _daily_events(d, [5, 6, 5, 6, 3, 3, 1, 9, 1, 9])
    r = q("goldfeld_quandt_daily")(d).iloc[0]
    assert r["n_early"] == 4 and r["n_late"] == 4
    assert abs(r["gq_f"] - 64.0) < 1e-6
    assert abs(r["z"] - np.log(64.0) / np.sqrt(2.0)) < 1e-6
    assert r["heteroscedastic"] == 1


def test_prais_winsten_exact_fractions(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [2, 1, 2, 1, 2])
    r = q("prais_winsten_daily")(d).iloc[0]
    # OLS slope 0, residuals ±(.4,.6): rho = -12/13 exactly
    assert abs(r["slope_ols"] - 0.0) < 1e-9
    assert abs(r["rho"] - (-12 / 13)) < 1e-6
    # independent exact-fraction replication of the FGLS solve
    rho = Fraction(-12, 13)
    y = [2, 1, 2, 1, 2]
    n = 5
    s2 = 1 - rho * rho          # 25/169, sqrt = 5/13 exact
    s = Fraction(5, 13)
    ys = [s * y[0]] + [y[t] - rho * y[t - 1] for t in range(1, n)]
    xs = [s * 1] + [Fraction(t + 1) - rho * t for t in range(1, n)]
    cs = [s] + [1 - rho] * (n - 1)
    assert s * s == s2

    def biv(cs_, xs_, ys_):
        scc = sum(c * c for c in cs_)
        scx = sum(c * x for c, x in zip(cs_, xs_))
        scy = sum(c * yy for c, yy in zip(cs_, ys_))
        sxx = sum(x * x for x in xs_)
        sxy = sum(x * yy for x, yy in zip(xs_, ys_))
        return (scc * sxy - scx * scy) / (scc * sxx - scx * scx)

    b_pw = float(biv(cs, xs, ys))
    b_co = float(biv(cs[1:], xs[1:], ys[1:]))
    assert abs(r["slope_pw"] - b_pw) < 1e-6
    assert abs(r["slope_co"] - b_co) < 1e-6


# ---------------------------------------------------------------------------
# Join counts + Gi* on a planted contiguous hot block
# ---------------------------------------------------------------------------

def _sunday_block(d):
    """2 events in every hour of Sunday 1995-01-01 (hw 0..23)."""
    ts, us = [], []
    uid = 0
    for h in range(24):
        for k in range(2):
            ts.append(f"1995-01-01T{h:02d}:{k:02d}:00")
            us.append(uid)
            uid += 1
    _write_events(d, ts, us, ["view"] * len(ts))


def test_join_counts_contiguous_block(tmp_path):
    d = str(tmp_path / "sf")
    _sunday_block(d)
    r = q("join_counts_hourweek")(d).iloc[0]
    # 24 hot cells in one ring block: BB = 23 internal edges,
    # BW = 2 boundary edges; E[BB] = 168·24·23/(168·167) = 552/167
    assert r["n_hot"] == 24
    assert r["bb_joins"] == 23 and r["bw_joins"] == 2
    assert abs(r["e_bb"] - 552 / 167) < 1e-6
    assert abs(r["e_bw"] - 336.0 * 24 * 144 / (168 * 167)) < 1e-6
    assert r["z_bb"] > 1.959964 and r["hot_clustered"] == 1
    assert r["z_bw"] < 0


def test_gi_star_block_interior(tmp_path):
    d = str(tmp_path / "sf")
    _sunday_block(d)
    r = q("getis_ord_hotspots_hourweek")(d)
    # interior cells 1..22 all share the max window sum 6; top-5
    # resolve by hw → Sunday hours 1..5
    assert list(r["dow"]) == [0] * 5
    assert list(r["hour"]) == [1, 2, 3, 4, 5]
    assert list(r["window_events"]) == [6] * 5
    mu = 48 / 168
    v = (96 - 168 * mu * mu) / 168
    gz = (6 - 3 * mu) / np.sqrt(v * 3 * 165 / 167)
    assert all(abs(g - gz) < 1e-6 for g in r["gi_z"])


# ---------------------------------------------------------------------------
# LAD + quantile corridor: 4 collinear days and one spike
# ---------------------------------------------------------------------------

def test_lad_ignores_the_spike(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 2, 3, 4, 100])
    r = q("lad_trend_daily")(d).iloc[0]
    # L1 line is y = t through the 4 collinear days: SAD = 95;
    # OLS is dragged to slope 20 with SAD 114
    assert abs(r["slope_lad"] - 1.0) < 1e-9
    assert abs(r["intercept_lad"] - 0.0) < 1e-9
    assert abs(r["sad_lad"] - 95.0) < 1e-9
    assert abs(r["slope_ols"] - 20.0) < 1e-9
    assert abs(r["sad_ols"] - 114.0) < 1e-9


def test_quantile_corridor_hand_lines(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 2, 3, 4, 100])
    r = q("quantile_regression_corridor_daily")(d)
    lo = r[r["tau"] == 0.25].iloc[0]
    hi = r[r["tau"] == 0.75].iloc[0]
    # tau=.25 keeps y=t (loss .25·95); tau=.75 swings to the line
    # through (1,1),(5,100): slope 24.75, loss .25·142.5
    assert abs(lo["slope"] - 1.0) < 1e-9
    assert abs(lo["check_loss"] - 23.75) < 1e-9
    assert abs(hi["slope"] - 24.75) < 1e-9
    assert abs(hi["intercept"] - (-23.75)) < 1e-9
    assert abs(hi["check_loss"] - 35.625) < 1e-9


# ---------------------------------------------------------------------------
# Process capability
# ---------------------------------------------------------------------------

def test_capability_boundary_cpk_zero(tmp_path):
    d = str(tmp_path / "sf")
    # two 1-URGENT lags 80 and 100 days: mu = 90 = USL → Cpk = 0,
    # one of two items beyond spec → 500000 ppm
    _write_orders_pri(d, [(1, 1, 10.0, "1995-01-01", "1-URGENT"),
                          (2, 1, 10.0, "1995-01-01", "1-URGENT")])
    _write_lineitem_ship(d, [(1, 1, 1.0, "1995-03-22"),
                             (2, 1, 1.0, "1995-04-11")])
    r = q("process_capability_ship_lag")(d)
    assert len(r) == 1
    row = r.iloc[0]
    assert row["priority"] == "1-URGENT"
    assert abs(row["mean_lag_days"] - 90.0) < 1e-9
    assert abs(row["sd_lag_days"] - np.sqrt(200.0)) < 1e-6
    assert abs(row["cpk"] - 0.0) < 1e-9
    assert abs(row["observed_ppm"] - 500000.0) < 1e-6
    g = q("capability_normality_gap")(d).iloc[0]
    # at mu = USL the normal model puts exactly half the mass out
    # of spec too: ratio ≈ 1 (the A&S tail at 0 is ~0.5)
    assert abs(g["cpk"] - 0.0) < 1e-9
    assert abs(g["normal_implied_ppm"] - 500000.0) < 200
    assert abs(g["ppm_ratio"] - 1.0) < 1e-3
