"""Planted-fixture pinning tests for the round-2h query batches
(Sen-slope CI, Van Belle–Hughes, weekly harmonic, Yuen profile,
exact rate test, E-value, AP/pAUC, Menzerath, Doksum shift, partial
Kendall, Laplace/Crow–AMSAA, DiD robustness, CKA, MDE/Type-S-M,
Diebold–Mariano/MASE). Oracle parity runs in tools/check_oracle.py;
these pin the MATH on tiny hand-computable inputs.

Date anchors: 1995-01-01 Sunday; 1995-01-02 Monday; 1995-01-07
Saturday.
"""

from __future__ import annotations

from math import comb

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2b_stats import _write_embeddings
from tests.test_round2e_stats import _write_events, _write_documents
from tests.test_round2g_stats import _daily_events


def q(name):
    return REGISTRY[name][0]


def test_sen_slope_ci_all_pairs_equal(tmp_path):
    d = str(tmp_path / "sf")
    # counts 1,2,3,4: every pairwise slope is 1 -> CI [1,1];
    # Var(S)=26/3, C=1.96*sqrt(26/3)=5.77 -> ranks 1..6
    _daily_events(d, [1, 2, 3, 4])
    r = q("theil_sen_slope_ci")(d).iloc[0]
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["slope"] == 1.0
    assert r["rank_lo"] == 1 and r["rank_hi"] == 6
    assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0
    assert r["excludes_zero"] == 1


def test_vanbelle_hughes_uniform_trend_is_homogeneous(tmp_path):
    d = str(tmp_path / "sf")
    # counts 1..21: every dow subseries is (k, k+7, k+14) ->
    # S_g=3, Var_g=11/3, Z identical -> chi2_homog exactly 0
    _daily_events(d, list(range(1, 22)))
    r = q("vanbelle_hughes_dow_homogeneity")(d).iloc[0]
    assert r["n_groups"] == 7
    assert r["chi2_total"] == round(7 * 27 / 11, 6)
    assert r["chi2_trend"] == round(7 * 27 / 11, 6)
    assert r["chi2_homog"] == 0.0
    assert r["homogeneous"] == 1
    assert r["common_trend_rejected"] == 1


def test_weekly_harmonic_planted_spike(tmp_path):
    d = str(tmp_path / "sf")
    # 14 days, count 3 when i%7==2 else 1: projection lands at
    # angle 4pi/7 with magnitude 4 -> amp 4/7, peak day 2.0
    _daily_events(d, [3 if i % 7 == 2 else 1 for i in range(14)])
    out = q("weekly_harmonic_by_type")(d)
    r = out[out["event_type"] == "view"].iloc[0]
    assert r["n_days"] == 14
    assert r["mean_daily"] == round(9 / 7, 6)
    assert r["weekly_amp"] == round(4 / 7, 6)
    assert r["rel_amp_pct"] == round(4 / 9 * 100, 6)
    assert r["peak_day"] == 2.0


def _weekend_value_fixture(d, wd_vals, we_vals):
    ts, us, tp, vals = [], [], [], []
    uid = 0
    for v in wd_vals:
        ts.append(f"1995-01-02T{uid % 24:02d}:{uid % 60:02d}:00")
        us.append(uid)
        tp.append("view")
        vals.append(v)
        uid += 1
    for v in we_vals:
        ts.append(f"1995-01-07T{uid % 24:02d}:{uid % 60:02d}:00")
        us.append(uid)
        tp.append("view")
        vals.append(v)
        uid += 1
    _write_events(d, ts, us, tp, vals)


def test_yuen_hand_winsorized(tmp_path):
    d = str(tmp_path / "sf")
    # weekday cents [0,10,10,20,100], weekend [10,20,20,30,200]:
    # g=1, trimmed means 40/3 vs 70/3 (delta 0.1 units); both
    # winsorized SSDs are exactly 120 (the outliers are REPLACED
    # before squaring), so d=20 each, t=10/sqrt(40), df=4
    _weekend_value_fixture(d, [0.0, 0.10, 0.10, 0.20, 1.00],
                           [0.10, 0.20, 0.20, 0.30, 2.00])
    r = q("yuen_trimmed_t_weekend_value")(d).iloc[0]
    assert r["h_weekend"] == 3 and r["h_weekday"] == 3
    assert r["delta_units"] == 0.1
    assert r["yuen_t"] == round(10.0 / np.sqrt(40.0), 6)
    assert r["df"] == 4.0
    prof = q("yuen_trim_profile_weekend_value")(d)
    assert list(prof["trim_pct"]) == [0, 10, 20]
    # trim 10% of 5 -> g=0 -> identical to trim 0 (Welch)
    assert prof.iloc[0]["t_stat"] == prof.iloc[1]["t_stat"]


def _week_window_fixture(d, n_we_purch, n_wd_purch):
    """Window exactly Mon 01-02 .. Sun 01-08 (2 weekend days)."""
    ts, us, tp = [], [], []
    uid = 0
    # pin the window with boundary views
    for stamp in ["1995-01-02T00:00:00", "1995-01-08T23:00:00"]:
        ts.append(stamp)
        us.append(uid)
        tp.append("view")
        uid += 1
    for j in range(n_wd_purch):
        ts.append(f"1995-01-0{3 + j % 4}T10:{j:02d}:00")
        us.append(uid)
        tp.append("purchase")
        uid += 1
    for j in range(n_we_purch):
        ts.append(f"1995-01-0{7 + j % 2}T11:{j:02d}:00")
        us.append(uid)
        tp.append("purchase")
        uid += 1
    _write_events(d, ts, us, tp)


def test_exact_binomial_weekend_test_hand_tails(tmp_path):
    d = str(tmp_path / "sf")
    _week_window_fixture(d, 2, 5)
    r = q("poisson_exact_weekend_purchase_test")(d).iloc[0]
    assert r["n_purchases"] == 7 and r["weekend_purchases"] == 2
    assert r["null_weekend_share"] == round(2 / 7, 6)
    p = 2 / 7
    pk = [comb(7, k) * p ** k * (1 - p) ** (7 - k)
          for k in range(8)]
    lo, hi = sum(pk[:3]), sum(pk[2:])
    assert r["exact_p"] == round(min(2 * min(lo, hi), 1.0), 6)
    assert r["midp"] == round(
        min(2 * min(lo - pk[2] / 2, hi - pk[2] / 2), 1.0), 6)


def test_evalue_null_ratio_is_one(tmp_path):
    d = str(tmp_path / "sf")
    # 2 weekend purchases / 2 weekend days vs 5 weekday / 5 days:
    # RR exactly 1 -> E-values 1 (no confounding needed)
    _week_window_fixture(d, 2, 5)
    r = q("weekend_rate_ratio_evalue")(d).iloc[0]
    assert r["rate_ratio"] == 1.0
    assert r["evalue_point"] == 1.0
    assert r["evalue_ci"] == 1.0


def test_average_precision_hand_blocks(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-02T01:00:00", "1995-01-02T02:00:00",
                      "1995-01-02T03:00:00"],
                  [0, 1, 2], ["purchase", "view", "purchase"],
                  [0.03, 0.02, 0.01])
    r = q("average_precision_value_purchase")(d).iloc[0]
    assert r["n_pos"] == 2 and r["n_events"] == 3
    assert r["average_precision"] == round(5 / 6, 6)
    assert r["ap_over_baseline"] == 1.25


def test_partial_auc_crossing_interpolation(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-02T01:00:00", "1995-01-02T02:00:00",
                      "1995-01-02T03:00:00"],
                  [0, 1, 2], ["purchase", "view", "purchase"],
                  [0.03, 0.02, 0.01])
    r = q("partial_auc_value_purchase")(d).iloc[0]
    # ROC steps (0,.5)->(1,.5)->(1,1): area to FPR .2 = .2*.5 = .1
    assert r["pauc_fpr02"] == 0.1
    assert r["pauc_over_random"] == 5.0
    assert r["mcclish_standardized"] == round(
        0.5 * (1 + (0.1 - 0.02) / 0.18), 6)


def test_menzerath_curve_two_sentences(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(1, "aa b. a bb cc.", "s0")])
    out = q("menzerath_curve_global")(d)
    r2 = out[out["x_words"] == 2].iloc[0]
    r3 = out[out["x_words"] == 3].iloc[0]
    assert r2["n_sentences"] == 1 and r2["mean_word_len"] == 1.5
    assert r3["n_sentences"] == 1
    assert r3["mean_word_len"] == round(5 / 3, 6)


def test_doksum_constant_shift(tmp_path):
    d = str(tmp_path / "sf")
    # weekday cents 1..100, weekend = +10: delta 0.1 at EVERY
    # decile; shape audit: range 0, monotone, no sign changes
    _weekend_value_fixture(d, [i / 100 for i in range(1, 101)],
                           [(i + 10) / 100 for i in range(1, 101)])
    out = q("doksum_shift_weekend_value")(d)
    assert len(out) == 9
    assert (out["delta_units"] == 0.1).all()
    sh = q("shift_function_shape_audit")(d).iloc[0]
    assert sh["delta_range"] == 0.0
    assert sh["median_delta"] == 0.1
    assert sh["monotone_nondecreasing"] == 1
    assert sh["sign_changes"] == 0


def test_partial_kendall_hand_taus(tmp_path):
    d = str(tmp_path / "sf")
    # daily (views, clicks, purchases) = (1,3,2),(2,1,1),(3,2,3):
    # tau_vp=1/3, tau_vc=-1/3, tau_cp=1/3 -> partial = 0.5
    ts, us, tp = [], [], []
    uid = 0
    plan = [(1, 3, 2), (2, 1, 1), (3, 2, 3)]
    for i, (nv, nc, np_) in enumerate(plan):
        for kind, cnt in [("view", nv), ("click", nc),
                          ("purchase", np_)]:
            for j in range(cnt):
                ts.append(f"1995-01-{i + 2:02d}T0{j + 1}:00:00")
                us.append(uid)
                tp.append(kind)
                uid += 1
    _write_events(d, ts, us, tp)
    r = q("partial_kendall_views_purchases")(d).iloc[0]
    assert r["tau_views_purchases"] == round(1 / 3, 6)
    assert r["tau_views_clicks"] == round(-1 / 3, 6)
    assert r["tau_clicks_purchases"] == round(1 / 3, 6)
    assert r["partial_tau"] == 0.5
    panel = q("partial_corr_panel_views_purchases")(d)
    # counts are already ranks -> pearson == spearman == 1.0 partial
    assert (panel["partial_corr"] == 1.0).all()
    assert (panel["mediation_drop"] == -0.5).all()


def test_laplace_and_crow_amsaa_front_loaded_errors(tmp_path):
    d = str(tmp_path / "sf")
    # window [0, 99] s pinned by views; errors at s=0,1,2,3
    ts, us, tp = ["1995-01-01T00:00:00", "1995-01-01T00:01:39"], \
        [90, 91], ["view", "view"]
    for j in range(4):
        ts.append(f"1995-01-01T00:00:0{j}")
        us.append(j)
        tp.append("error")
    _write_events(d, ts, us, tp)
    la = q("laplace_trend_errors")(d).iloc[0]
    assert la["n_errors"] == 4 and la["window_s"] == 100
    assert la["mean_position"] == round(10 / 4 / 100, 6)
    assert la["laplace_u"] == round(
        np.sqrt(48) * (0.025 - 0.5), 6)
    assert la["improving"] == 1 and la["deteriorating"] == 0
    ca = q("crow_amsaa_errors")(d).iloc[0]
    beta = 4 / sum(np.log(100 / t) for t in [1, 2, 3, 4])
    assert ca["beta"] == round(beta, 6)
    assert ca["reliability_growth"] == 1
    assert ca["mtbf_ratio"] == round(1 / beta, 6)


def _did_fixture(d):
    """arm1 = odd users, arm0 = even. Daily one-event means:
    pre (Jan 2-4): arm0 [1,3,2], arm1 [2,4,3]; mid (Jan 10):
    both 2; post (Jan 20): arm0 2, arm1 4."""
    ts, us, tp, vals = [], [], [], []

    def ev(day, uid, v):
        ts.append(f"2024-01-{day:02d}T12:00:00")
        us.append(uid)
        tp.append("view")
        vals.append(v)

    for i, (v0, v1) in enumerate([(1, 2), (3, 4), (2, 3)]):
        ev(2 + i, 0, v0)
        ev(2 + i, 1, v1)
    ev(10, 0, 2.0)
    ev(10, 1, 2.0)
    ev(20, 0, 2.0)
    ev(20, 1, 4.0)
    _write_events(d, ts, us, tp, vals)


def test_did_placebo_and_pretrend(tmp_path):
    d = str(tmp_path / "sf")
    _did_fixture(d)
    p = q("did_placebo_in_time")(d).iloc[0]
    # placebo: arm1 (2 - 3) - arm0 (2 - 2) = -1;
    # real: arm1 (4 - 2.75) - arm0 (2 - 2) = 1.25
    assert p["placebo_estimate"] == -1.0
    assert p["real_estimate"] == 1.25
    assert p["placebo_abs_ratio"] == 0.8
    assert p["placebo_passed"] == 0
    t = q("did_pretrend_slope_gap")(d).iloc[0]
    # pre-window = everything before Jan 16, i.e. days {2,3,4,10}:
    # arm1 daily means [2,4,3,2], arm0 [1,3,2,2] on t=[0,1,2,8]

    def ols(y):
        tt = np.array([0.0, 1.0, 2.0, 8.0])
        y = np.array(y, float)
        n = 4
        b = (n * (tt * y).sum() - tt.sum() * y.sum()) \
            / (n * (tt * tt).sum() - tt.sum() ** 2)
        a = y.mean() - b * tt.mean()
        e = y - a - b * tt
        se2 = (e * e).sum() / (n - 2) \
            / ((tt * tt).sum() - tt.sum() ** 2 / n)
        return b, se2

    b1, se1 = ols([2, 4, 3, 2])
    b0, se0 = ols([1, 3, 2, 2])
    assert t["slope_treated"] == round(b1, 6)
    assert t["slope_control"] == round(b0, 6)
    assert t["slope_gap"] == round(b1 - b0, 6)
    gt = (b1 - b0) / np.sqrt(se1 + se0)
    assert t["gap_t"] == round(gt, 6)
    assert t["parallel_ok"] == (1 if abs(gt) <= 1.96 else 0)


def test_cka_orthogonal_halves_matryoshka_signature(tmp_path):
    d = str(tmp_path / "sf")
    # first 32 dims carry p=[1,2,3] across vectors, last 32 carry
    # q=[c+1,c-2,c+1] with cov(p,q)=0: halves CKA exactly 0,
    # even/odd CKA exactly 1 (identical column structure per side)
    p = [1.0, 2.0, 3.0]
    qv = [6.0, 3.0, 6.0]
    vecs = [[p[k]] * 32 + [qv[k]] * 32 for k in range(3)]
    _write_embeddings(d, vecs)
    h = q("cka_embedding_halves")(d).iloc[0]
    assert h["n_vectors"] == 3 and h["dim"] == 64
    assert h["cka"] == 0.0
    eo = q("cka_embedding_even_odd")(d).iloc[0]
    assert eo["cka_even_odd"] == 1.0


def test_mde_and_retrodesign_tiny_counts(tmp_path):
    d = str(tmp_path / "sf")
    _week_window_fixture(d, 2, 5)
    m = q("weekend_mde_power_audit")(d).iloc[0]
    se = np.sqrt(1 / 2 + 1 / 5)
    assert m["se_log"] == round(se, 6)
    assert m["mde_rel_pct_80"] == round(
        (np.exp(2.801585 * se) - 1) * 100, 6)
    assert m["exposure_multiple_5pct"] == round(
        (2.801585 * se / np.log(1.05)) ** 2, 6)
    r = q("weekend_type_s_m_retrodesign")(d).iloc[0]
    # at theta ~ 0.058 the design is hopeless: tiny power, Type S
    # near its 0.5 ceiling, massive winner's-curse inflation
    assert r["power_5pct"] < 0.1
    assert 0.3 < r["type_s_prob"] < 0.5
    assert r["exaggeration_ratio"] > 10


def test_diebold_mariano_and_mase_planted_week(tmp_path):
    d = str(tmp_path / "sf")
    # identical weeks [10,20,40,20,10,30,50] cents: dow forecast
    # is exact on the test week (mase_dow=0); naive loss diffs
    # give dbar=20, lrv=(600-800/3)/7, HLN factor sqrt(6/7)
    week = [10, 20, 40, 20, 10, 30, 50]
    ts, us, tp, vals = [], [], [], []
    for i, c in enumerate(week + week):
        ts.append(f"1995-01-{i + 1:02d}T12:00:00")
        us.append(i)
        tp.append("view")
        vals.append(c / 100)
    _write_events(d, ts, us, tp, vals)
    dm = q("diebold_mariano_naive_vs_dow")(d).iloc[0]
    assert dm["n_test_days"] == 7
    assert dm["mean_loss_diff_cents"] == 20.0
    lrv = (600 + 2 * (2 / 3) * (-200)) / 7
    assert dm["lrv"] == round(lrv, 6)
    assert dm["dm_hln"] == round(
        20 / np.sqrt(lrv / 7) * np.sqrt(6 / 7), 6)
    assert dm["significant"] == 1
    ms = q("mase_forecast_panel")(d).iloc[0]
    assert ms["insample_naive_mae_cents"] == round(100 / 6, 6)
    assert ms["mase_naive"] == 1.2
    assert ms["mase_dow"] == 0.0
    assert ms["dow_beats_scale"] == 1
