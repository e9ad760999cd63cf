"""Planted-fixture pinning tests for the round-2f query batches
(RMST, Nelson–Aalen vs KM, exact quantile CIs, Kneser–Ney,
collocations, SLO burn rate, superposed epoch, chain ladder,
Bayesian A/B, trading-day adjustment, Qn scale). Oracle parity runs
in tools/check_oracle.py; these pin the MATH on tiny inputs.

Date anchor: 1995-01-01 was a Sunday.
"""

from __future__ import annotations

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import (_write_events,
                                      _write_lineitem_ship,
                                      _write_orders,
                                      _write_documents)


def q(name):
    return REGISTRY[name][0]


def test_rmst_all_purchase_day1(tmp_path):
    d = str(tmp_path / "sf")
    # 2 weekday-first users (Mon Jan 2), both purchase next day:
    # S(0)=1, S(u>=1)=0 -> RMST14 = 1.0
    _write_events(d,
                  ["1995-01-02T10:00:00", "1995-01-02T11:00:00",
                   "1995-01-03T10:00:00", "1995-01-03T11:00:00"],
                  [0, 1, 0, 1],
                  ["view", "view", "purchase", "purchase"])
    out = q("rmst_first_purchase_cohorts")(d)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["cohort"] == "weekday"
    assert r["n_users"] == 2 and r["events14"] == 2
    assert r["rmst14_days"] == 1.0


def test_nelson_aalen_hand_table(tmp_path):
    d = str(tmp_path / "sf")
    # 4 users at risk; u0,u1 purchase at t=1; u2,u3 censored t=2
    # KM(1) = .5, H(1) = .5, exp(-.5)-KM = .106531
    ts, us, tp = [], [], []
    for u in range(4):
        ts.append(f"1995-01-01T0{u + 1}:00:00")
        us.append(u)
        tp.append("view")
    ts += ["1995-01-02T01:00:00", "1995-01-02T02:00:00",
           "1995-01-03T01:00:00", "1995-01-03T02:00:00"]
    us += [0, 1, 2, 3]
    tp += ["purchase", "purchase", "view", "view"]
    _write_events(d, ts, us, tp)
    tab = q("nelson_aalen_first_purchase")(d)
    r = tab.iloc[0]
    assert r["at_risk"] == 4 and r["d_purchase"] == 2
    assert r["km_survival"] == 0.5
    assert r["cum_hazard"] == 0.5
    assert r["fh_minus_km"] == round(np.exp(-0.5) - 0.5, 6)
    dv = q("na_km_divergence")(d).iloc[0]
    assert dv["inequality_holds"] == 1
    assert dv["max_gap"] == round(np.exp(-0.5) - 0.5, 6)


def test_median_ci_ranks_1_to_100(tmp_path):
    d = str(tmp_path / "sf")
    vals = [float(i) for i in range(1, 101)]
    ts = [f"1995-01-01T{i // 60:02d}:{i % 60:02d}:00"
          for i in range(100)]
    _write_events(d, ts, list(range(100)), ["view"] * 100, vals)
    out = q("median_exact_ci_value")(d).iloc[0]
    assert out["n"] == 100
    assert out["rank_lo"] == 40 and out["rank_hi"] == 61
    assert out["point"] == 50.0
    assert out["ci_lo"] == 40.0 and out["ci_hi"] == 61.0
    assert 0.94 < out["coverage"] < 0.97


def test_kneser_ney_tiny(tmp_path):
    d = str(tmp_path / "sf")
    _write_documents(d, [(0, "a b a b", "X")])
    kn = q("kneser_ney_discount_by_source")(d).iloc[0]
    # bigrams: (a,b)x2, (b,a)x1 -> n1=1, n2=1, D = 1/3
    assert kn["bigram_tokens"] == 3 and kn["bigram_types"] == 2
    assert kn["n1"] == 1 and kn["n2"] == 1
    assert kn["kn_discount"] == round(1.0 / 3.0, 6)
    ct = q("kn_continuation_top_words")(d)
    assert set(ct["word"]) == {"a", "b"}
    assert (ct["p_continuation"] == 0.5).all()


def test_collocation_dice_perfect_pairs(tmp_path):
    d = str(tmp_path / "sf")
    docs = [(i, "alpha beta", "X") for i in range(6)] \
        + [(10 + i, "gamma delta", "X") for i in range(5)]
    _write_documents(d, docs)
    td = q("collocation_tscore_dice")(d)
    assert len(td) == 2
    assert (td["dice"] == 1.0).all()
    # t = (k - c1*c2/n)/sqrt(k): both surpluses are 30/11, so the
    # SMALLER pair (gamma delta, k=5) wins on the sqrt(k) divisor
    assert td.iloc[0]["w1"] == "gamma"
    t_gd = (5.0 - 25.0 / 11.0) / np.sqrt(5.0)
    assert td.iloc[0]["t_score"] == round(t_gd, 6)
    llr = q("bigram_llr_collocations")(d)
    assert set(llr["cnt"]) == {5, 6}


def test_slo_burn_and_budget(tmp_path):
    d = str(tmp_path / "sf")
    # 24 hours x 10 events; hours 12..17 have 2 errors each
    ts, us, tp = [], [], []
    uid = 0
    for h in range(24):
        for i in range(10):
            ts.append(f"1995-01-01T{h:02d}:{i:02d}:00")
            us.append(uid)
            uid += 1
            tp.append("error" if h in range(12, 18) and i < 2
                      else "view")
    _write_events(d, ts, us, tp)
    al = q("slo_burn_rate_alerts")(d)
    page = al[al["policy"] == "page"].iloc[0]
    assert page["hours_fired"] >= 1
    # burn over a fully-errored 6h window = (12/60)/.01 = 20
    assert page["max_long_burn"] == 20.0
    bt = q("error_budget_timeline")(d)
    last = bt.iloc[-1]
    assert last["cum_errors"] == 12 and last["cum_events"] == 240
    assert last["budget_consumed_pct"] == 500.0
    assert last["over_budget"] == 1


def test_superposed_epoch_ramp(tmp_path):
    from tests.test_round2e_stats import _days
    d = str(tmp_path / "sf")
    counts = list(range(1, 12))          # 1..11 over 11 days
    ts, us = _days("1995-01-01", counts)
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("superposed_epoch_peak_days")(d)
    r0 = out[out["offset"] == 0].iloc[0]
    assert r0["n_anchors"] == 5
    assert r0["mean_count"] == 9.0       # mean of 7..11
    assert r0["ratio_to_global"] == 1.5  # global mean 6


def test_chain_ladder_two_cohorts(tmp_path):
    d = str(tmp_path / "sf")
    # cohort Jan: ships 1.00 at lag 0 and 1.00 at lag 1
    # cohort Feb: ships 1.00 at lag 0 (lag 1 unobservable)
    _write_orders(d, [(1, "1995-01-10"), (2, "1995-01-10"),
                      (3, "1995-02-10")])
    _write_lineitem_ship(d, [(1, 1, 1.0, "1995-01-20"),
                             (2, 1, 1.0, "1995-02-20"),
                             (3, 1, 1.0, "1995-02-25")])
    fa = q("chain_ladder_factors")(d)
    f0 = fa[fa["dev_lag"] == 0].iloc[0]
    assert f0["age_to_age"] == 2.0       # 200/100 (extprice 100)
    rv = q("chain_ladder_reserve")(d).iloc[0]
    assert rv["n_cohorts"] == 2
    # cohort Feb projects 100 -> 200: reserve = one lineitem price
    assert rv["reserve"] == 100.0
    assert rv["ultimate_total"] == 400.0


def test_bayes_ab_symmetric_half(tmp_path):
    d = str(tmp_path / "sf")
    # weekend (Sun Jan 1): 1 of 2 purchase; weekday (Mon): same
    _write_events(d,
                  ["1995-01-01T10:00:00", "1995-01-01T11:00:00",
                   "1995-01-02T10:00:00", "1995-01-02T11:00:00"],
                  [0, 1, 2, 3],
                  ["purchase", "view", "purchase", "view"])
    out = q("bayes_ab_weekend_purchase")(d).iloc[0]
    assert out["rate_weekend"] == 0.5
    assert out["p_weekend_better"] == 0.5
    assert out["decisive_95"] == 0
    ap = q("bayes_ab_normal_approx")(d).iloc[0]
    assert ap["p_normal"] == 0.5 and ap["p_exact"] == 0.5
    assert ap["abs_error"] == 0.0


def test_dow_adjusted_two_sundays(tmp_path):
    from tests.test_round2e_stats import _days
    d = str(tmp_path / "sf")
    # 8 days from Sunday: both Sundays 8 events, others 1
    counts = [8, 1, 1, 1, 1, 1, 1, 8]
    ts, us = _days("1995-01-01", counts)
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("dow_adjusted_event_mean")(d).iloc[0]
    assert out["days"] == 8
    assert out["raw_mean"] == 2.75
    assert out["dow_adjusted_mean"] == 2.0
    assert out["composition_bias_pct"] == 37.5
    assert out["nd_max"] == 2 and out["nd_min"] == 1


def test_qn_scale_four_values(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d,
                  [f"1995-01-01T0{i}:00:00" for i in range(1, 5)],
                  [0, 1, 2, 3], ["view"] * 4,
                  [1.0, 2.0, 3.0, 4.0])
    out = q("qn_scale_value_by_type")(d).iloc[0]
    # pairwise diffs (cents): 100x3, 200x2, 300; h=3, k=3 -> 100
    assert out["qn_scaled"] == round(2.2219 * 1.0, 6)
    assert out["mad_scaled"] == round(1.4826 * 1.0, 6)
    assert out["qn_over_mad"] == round(2.2219 / 1.4826, 6)
