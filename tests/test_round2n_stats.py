"""Planted-fixture pinning tests for the round-2n query batches
(Stuart–Maxwell + marginal shift, Page–Hinkley + EWMA chart,
distance panel + attribution, Cameron–Trivedi + KM median CI,
theta + damped Holt, Box M + generalized variance, Tukey HSD +
interval widths). Oracle parity runs in tools/check_oracle.py;
these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import _write_events
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


# ---------------------------------------------------------------------------
# Stuart–Maxwell + marginal shift
# ---------------------------------------------------------------------------

def _two_session_users(d, specs):
    """specs: per user (first_session_types, last_session_types);
    sessions 2 h apart so the 1800 s rule splits them."""
    ts, us, tp = [], [], []
    for uid, (s1, s2) in enumerate(specs):
        for k, t in enumerate(s1):
            ts.append(f"1995-01-03T08:{k:02d}:00")
            us.append(uid)
            tp.append(t)
        for k, t in enumerate(s2):
            ts.append(f"1995-01-03T14:{k:02d}:00")
            us.append(uid)
            tp.append(t)
    _write_events(d, ts, us, tp)


_SM_SPECS = [(["view"], ["purchase"]),      # 0 -> 2
             (["view"], ["purchase"]),      # 0 -> 2
             (["purchase"], ["view"]),      # 2 -> 0
             (["click"], ["click"]),        # 1 -> 1
             (["click"], ["purchase"])]     # 1 -> 2


def test_stuart_maxwell_hand_chi2(tmp_path):
    d = str(tmp_path / "sf")
    _two_session_users(d, _SM_SPECS)
    r = q("stuart_maxwell_first_last_outcome")(d).iloc[0]
    # r = (2,2,1), c = (1,1,3): d = (1,1), V = [[3,0],[0,1]]
    # chi2 = (1·1 + 1·3)/3 = 4/3, p = e^(-2/3)
    assert r["n_users"] == 5
    assert abs(r["sm_chi2"] - 4 / 3) < 1e-6
    assert abs(r["p"] - np.exp(-2 / 3)) < 1e-6
    assert r["mix_shifted"] == 0


def test_outcome_marginal_shift_hand_z(tmp_path):
    d = str(tmp_path / "sf")
    _two_session_users(d, _SM_SPECS)
    r = q("outcome_marginal_shift")(d).set_index("outcome")
    assert list(r["n_first"]) == [2, 2, 1]
    assert list(r["n_last"]) == [1, 1, 3]
    assert list(r["net"]) == [-1, -1, 2]
    assert abs(r.loc[0, "shift_z"] - (-1 / np.sqrt(3))) < 1e-6
    assert abs(r.loc[1, "shift_z"] - (-1.0)) < 1e-6
    assert abs(r.loc[2, "shift_z"] - (2 / np.sqrt(4))) < 1e-6


# ---------------------------------------------------------------------------
# Page–Hinkley + EWMA chart
# ---------------------------------------------------------------------------

def test_page_hinkley_hand_drift(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 1, 1, 1, 5])
    r = q("page_hinkley_daily")(d).iloc[0]
    # running means end at 1.8: m = [0,0,0,0,3.2]
    assert abs(r["ph_up_max"] - 3.2) < 1e-6
    assert r["ph_up_day"] == 5
    assert abs(r["ph_down_max"] - 0.0) < 1e-9
    assert r["ph_down_day"] == 1          # all-zero ties -> earliest
    assert r["drift_detected"] == 0       # 3.2/1.7889 < 3


def test_ewma_chart_in_control(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 1, 1, 1, 5])
    r = q("ewma_chart_daily")(d).iloc[0]
    assert r["in_control"] == 1
    assert pd.isna(r["first_up_signal"])
    assert pd.isna(r["first_down_signal"])
    # replicate the recursion + exact time-varying limits
    y = np.array([1, 1, 1, 1, 5.0])
    mu, s = 1.8, np.sqrt(12.8 / 4)
    z, zs = mu, []
    for v in y:
        z = 0.2 * v + 0.8 * z
        zs.append(z)
    t = np.arange(1, 6)
    hw = 3 * s * np.sqrt(0.2 / 1.8 * (1 - 0.64 ** t))
    exp = float(np.max(np.abs(np.array(zs) - mu) / hw))
    assert abs(r["max_limit_ratio"] - exp) < 1e-6


# ---------------------------------------------------------------------------
# Distance panel + attribution
# ---------------------------------------------------------------------------

def _mix_fixture(d):
    # weekend: 1 view + 1 purchase; weekday: 2 views
    _write_events(
        d,
        ["1995-01-01T10:00:00", "1995-01-01T11:00:00",
         "1995-01-02T10:00:00", "1995-01-02T11:00:00"],
        [0, 1, 2, 3], ["view", "purchase", "view", "view"])


def test_distance_panel_hand_values(tmp_path):
    d = str(tmp_path / "sf")
    _mix_fixture(d)
    r = q("distribution_distance_panel_weekend")(d).iloc[0]
    assert abs(r["tv"] - 0.5) < 1e-9
    bc = np.sqrt(0.5)
    assert abs(r["bhattacharyya_coef"] - bc) < 1e-6
    assert abs(r["hellinger"] - np.sqrt(1 - bc)) < 1e-6
    jsd = (0.5 * np.log(2 / 3) + 0.5 * np.log(2.0)) / 2 \
        + np.log(4 / 3) / 2
    assert abs(r["jsd_bits"] - jsd / np.log(2)) < 1e-6
    assert r["chain_holds"] == 1


def test_distance_attribution_tie_order(tmp_path):
    d = str(tmp_path / "sf")
    _mix_fixture(d)
    r = q("distance_attribution_weekend_types")(d)
    # both types carry gap .5: tie resolves lexicographically
    assert list(r["event_type"]) == ["purchase", "view"]
    assert abs(r["tv_contribution"].sum() - 0.5) < 1e-9
    assert all(abs(v - 0.5) < 1e-9 for v in r["share_of_tv"])


# ---------------------------------------------------------------------------
# Cameron–Trivedi + KM median CI
# ---------------------------------------------------------------------------

def test_cameron_trivedi_equidispersed_zero(tmp_path):
    d = str(tmp_path / "sf")
    # day1 h0: 2 purchases; day2: only a view (cell zero):
    # w = (-1, +1) at mu=1, every other cell 0 -> alpha = 0 exactly
    _write_events(d, ["1995-01-01T00:00:00", "1995-01-01T00:30:00",
                      "1995-01-02T05:00:00"],
                  [0, 1, 2], ["purchase", "purchase", "view"])
    r = q("cameron_trivedi_hourly_purchases")(d).iloc[0]
    assert r["n_cells"] == 48
    assert abs(r["alpha_nb1"] - 0.0) < 1e-9
    assert abs(r["alpha_nb2"] - 0.0) < 1e-9
    assert abs(r["t_nb1"] - 0.0) < 1e-9
    assert r["overdispersed"] == 0


def test_km_median_ci_half_censored(tmp_path):
    d = str(tmp_path / "sf")
    # A,B purchase at day 1; C,D censored at day 3
    _write_events(d, ["1995-01-01T10:00:00", "1995-01-02T10:00:00",
                      "1995-01-01T10:00:00", "1995-01-02T10:00:00",
                      "1995-01-01T10:00:00", "1995-01-04T10:00:00",
                      "1995-01-01T10:00:00", "1995-01-04T10:00:00"],
                  [0, 0, 1, 1, 2, 2, 3, 3],
                  ["view", "purchase", "view", "purchase",
                   "view", "view", "view", "view"])
    r = q("km_median_ci_first_purchase")(d).iloc[0]
    # S(1) = .5, Greenwood gw = 2/(4·2): (S-.5)² = 0 <= band
    assert r["n_users"] == 4
    assert r["median_day"] == 1
    assert r["ci_lo_day"] == 1 and r["ci_hi_day"] == 1
    assert r["ci_open_ended"] == 1


def test_km_median_ci_saturated_no_band(tmp_path):
    d = str(tmp_path / "sf")
    # everyone purchases at t=2: S crashes to 0 with zero
    # Greenwood variance -> median exact, CI empty (NULL)
    ts, us, tp = [], [], []
    for u in range(4):
        ts += ["1995-01-01T09:00:00", "1995-01-03T09:00:00"]
        us += [u, u]
        tp += ["view", "purchase"]
    _write_events(d, ts, us, tp)
    r = q("km_median_ci_first_purchase")(d).iloc[0]
    assert r["median_day"] == 2
    assert pd.isna(r["ci_lo_day"]) and pd.isna(r["ci_hi_day"])
    assert r["ci_open_ended"] == 0


# ---------------------------------------------------------------------------
# Theta + damped Holt
# ---------------------------------------------------------------------------

_FC_COUNTS = [3, 5, 7, 7, 7, 7, 7, 7, 7]


def test_theta_hand_forecast(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _FC_COUNTS)
    r = q("theta_forecast_daily")(d).iloc[0]
    # train [3,5]: OLS y = 1+2t; theta2 = [3,5], SES(.2) -> 3.4;
    # forecast t+2.2 over test 7s -> MAE 13.6/7; naive MAE 2
    assert r["n_train"] == 2
    assert abs(r["mae_theta"] - 13.6 / 7) < 1e-6
    assert abs(r["mae_naive"] - 2.0) < 1e-9
    assert abs(r["mase_theta"] - 13.6 / 14) < 1e-6
    assert r["beats_naive"] == 1


def test_damped_holt_hand_forecast(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, _FC_COUNTS)
    r = q("damped_holt_daily")(d).iloc[0]
    # replicate both recursions on train [3,5]
    l, b = 3.0, 2.0
    ln = 0.5 * 5 + 0.5 * (l + 0.9 * b)
    bd = 0.3 * (ln - l) + 0.7 * 0.9 * b
    ld = ln
    lu = 0.5 * 5 + 0.5 * (3 + 2)
    bu = 0.3 * (lu - 3) + 0.7 * 2
    h = np.arange(1, 8, dtype=float)
    fd = ld + bd * 0.9 * (1 - 0.9 ** h) / 0.1
    fh = lu + bu * h
    te = np.full(7, 7.0)
    md = float(np.abs(te - fd).mean())
    mh = float(np.abs(te - fh).mean())
    assert abs(r["mae_damped"] - md) < 1e-6
    assert abs(r["mae_holt"] - mh) < 1e-6
    assert r["damping_wins"] == (1 if md < mh else 0)


# ---------------------------------------------------------------------------
# Box M + generalized variance (vs independent numpy replication)
# ---------------------------------------------------------------------------

_WKEND_VECS = [(1, 2, 3), (2, 1, 1), (3, 3, 2), (5, 1, 4)]
_WKDAY_VECS = [(1, 1, 1), (2, 3, 2), (4, 2, 1), (3, 1, 5),
               (2, 2, 2), (1, 4, 3), (5, 5, 1), (2, 1, 4),
               (3, 2, 2), (4, 3, 3)]


def _dayvec_fixture(d):
    """14 days from Sunday 1995-01-01; weekend = days 1,7,8,14."""
    ts, us, tp = [], [], []
    uid = 0
    wk = iter(_WKEND_VECS)
    wd = iter(_WKDAY_VECS)
    for i in range(14):
        day = i + 1
        vec = next(wk) if day in (1, 7, 8, 14) else next(wd)
        for ty, cnt in zip(("view", "click", "purchase"), vec):
            for k in range(cnt):
                ts.append(f"1995-01-{day:02d}T{k + 1:02d}:15:00")
                us.append(uid)
                tp.append(ty)
                uid += 1
    _write_events(d, ts, us, tp)


def test_box_m_vs_numpy(tmp_path):
    d = str(tmp_path / "sf")
    _dayvec_fixture(d)
    r = q("box_m_weekend_dayvec")(d).iloc[0]
    X1 = np.array(_WKEND_VECS, float)
    X0 = np.array(_WKDAY_VECS, float)
    S1 = np.cov(X1, rowvar=False)
    S0 = np.cov(X0, rowvar=False)
    n1, n0 = len(X1), len(X0)
    n = n1 + n0
    Sp = ((n1 - 1) * S1 + (n0 - 1) * S0) / (n - 2)
    bm = (n - 2) * np.log(np.linalg.det(Sp)) \
        - ((n1 - 1) * np.log(np.linalg.det(S1))
           + (n0 - 1) * np.log(np.linalg.det(S0)))
    sinv = 1 / (n1 - 1) + 1 / (n0 - 1)
    x2 = (1 - (sinv - 1 / (n - 2)) * 26 / 24) * bm
    assert r["n_weekend"] == 4 and r["n_weekday"] == 10
    assert abs(r["box_m"] - bm) < 1e-5
    assert abs(r["chi2"] - x2) < 1e-5


def test_generalized_variance_vs_numpy(tmp_path):
    d = str(tmp_path / "sf")
    _dayvec_fixture(d)
    r = q("generalized_variance_ratio_weekend")(d).iloc[0]
    S1 = np.cov(np.array(_WKEND_VECS, float), rowvar=False)
    S0 = np.cov(np.array(_WKDAY_VECS, float), rowvar=False)
    assert abs(r["gen_var_ratio"]
               - np.linalg.det(S1) / np.linalg.det(S0)) < 1e-5
    assert abs(r["view_var_ratio"] - S1[0, 0] / S0[0, 0]) < 1e-6
    assert abs(r["click_var_ratio"] - S1[1, 1] / S0[1, 1]) < 1e-6
    assert abs(r["purchase_var_ratio"]
               - S1[2, 2] / S0[2, 2]) < 1e-6


# ---------------------------------------------------------------------------
# Tukey HSD + interval widths
# ---------------------------------------------------------------------------

def test_tukey_hsd_hand_q(tmp_path):
    d = str(tmp_path / "sf")
    # two Sunday-aligned weeks: counts dow+1 then dow+2:
    # group means k+1.5, MSE = .5, q_ij = 2|i-j|
    _daily_events(d, [1, 2, 3, 4, 5, 6, 7,
                      2, 3, 4, 5, 6, 7, 8])
    r = q("tukey_hsd_dow_pairs")(d)
    assert len(r) == 21
    row01 = r[(r["dow_a"] == 0) & (r["dow_b"] == 1)].iloc[0]
    assert abs(row01["mean_a"] - 1.5) < 1e-9
    assert abs(row01["q_stat"] - 2.0) < 1e-6
    # significant iff 2|i-j| > 4.17 <=> gap >= 3: C(7,2) pairs
    # with gap>=3 is 10
    assert int(r["significant"].sum()) == 10


def test_interval_widths_ordering(tmp_path):
    d = str(tmp_path / "sf")
    _daily_events(d, [1, 2, 3, 4, 5, 6, 7,
                      2, 3, 4, 5, 6, 7, 8])
    r = q("simultaneous_interval_widths_dow")(d).iloc[0]
    # extreme pair (0,6): diff = 1.5 - 7.5 = -6; se = sqrt(.5)
    assert (r["dow_a"], r["dow_b"]) == (0, 6)
    assert abs(r["mean_diff"] - (-6.0)) < 1e-9
    assert abs(r["hw_tukey"] - 4.170 * 0.5) < 1e-6
    assert abs(r["hw_scheffe"]
               - np.sqrt(12.591587) * np.sqrt(0.5)) < 1e-6
    assert r["hw_tukey"] < r["hw_bonferroni"] < r["hw_scheffe"]
    assert r["tukey_tightest"] == 1
