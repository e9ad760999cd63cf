"""Planted-fixture pinning tests for the round-2q batches
(subgroup scan + moderation Q, effect-measure panel + stability,
attributable fractions + policy counterfactuals). Oracle parity
runs in tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import _write_customer, _write_events


def q(name):
    return REGISTRY[name][0]


def _seg_fixture(d):
    """Users 0,1 → segment S1; 2,3 → S2. Per user: 2 weekend
    (Sun 1995-01-01) + 2 weekday (Mon 1995-01-02) events.
    Purchases: S1 weekend 2/4, weekday 1/4; S2 weekend 2/4,
    weekday 2/4."""
    _write_customer(d, [(0, "S1"), (1, "S1"),
                        (2, "S2"), (3, "S2")])
    ts, us, tp = [], [], []
    spec = {  # user -> (wkend types, wkday types)
        0: (["purchase", "view"], ["purchase", "view"]),
        1: (["purchase", "view"], ["view", "view"]),
        2: (["purchase", "view"], ["purchase", "view"]),
        3: (["purchase", "view"], ["purchase", "view"])}
    # adjust: S2 weekday should have 2 purchases total (users 2,3
    # one each), S1 weekday 1 (user 0)
    for u, (we, wd) in spec.items():
        for k, t in enumerate(we):
            ts.append(f"1995-01-01T1{k}:0{u}:00")
            us.append(u)
            tp.append(t)
        for k, t in enumerate(wd):
            ts.append(f"1995-01-02T1{k}:0{u}:00")
            us.append(u)
            tp.append(t)
    _write_events(d, ts, us, tp)


def test_subgroup_scan_hand_z(tmp_path):
    d = str(tmp_path / "sf")
    _seg_fixture(d)
    r = q("subgroup_weekend_effect_scan")(d).set_index("segment")
    assert abs(r.loc["S1", "effect"] - 0.25) < 1e-6
    v1 = 0.25 * 0.75 / 4 + 0.25 / 4
    assert abs(r.loc["S1", "z"] - 0.25 / np.sqrt(v1)) < 1e-5
    assert abs(r.loc["S2", "effect"] - 0.0) < 1e-9
    assert list(r["bh_significant"]) == [0, 0]


def test_subgroup_q_hand_value(tmp_path):
    d = str(tmp_path / "sf")
    _seg_fixture(d)
    r = q("subgroup_heterogeneity_q")(d).iloc[0]
    w1 = 1.0 / (0.25 * 0.75 / 4 + 0.25 / 4)
    w2 = 1.0 / (0.0625 + 0.0625)
    tf = (w1 * 0.25) / (w1 + w2)
    qv = w1 * (0.25 - tf) ** 2 + w2 * tf ** 2
    assert r["n_segments"] == 2
    assert abs(r["pooled_effect"] - tf) < 1e-6
    assert abs(r["cochran_q"] - qv) < 1e-5
    # the df-4 closed form is PINNED (k=5 in production data);
    # with k=2 both engines still share it verbatim
    assert abs(r["p_exact"]
               - np.exp(-qv / 2) * (1 + qv / 2)) < 1e-5


def test_effect_measure_panel_hand(tmp_path):
    d = str(tmp_path / "sf")
    _seg_fixture(d)
    r = q("effect_measure_panel_weekend")(d).iloc[0]
    # pooled: weekend 4/8 = .5, weekday 3/8 = .375
    assert abs(r["arr"] - 0.125) < 1e-6
    assert abs(r["rr"] - 4 / 3) < 1e-6
    assert abs(r["odds_ratio"] - 5 / 3) < 1e-6
    assert abs(r["nnt"] - 8.0) < 1e-6
    assert abs(r["or_over_rr"] - 1.25) < 1e-6


def test_effect_stability_cv_hand(tmp_path):
    d = str(tmp_path / "sf")
    _seg_fixture(d)
    r = q("effect_measure_stability_segments")(d) \
        .set_index("measure")
    # S1: arr .25 rr 2 or 3; S2: arr 0 rr 1 or 1
    assert abs(r.loc["arr", "cv"] - np.sqrt(2.0)) < 1e-5
    assert abs(r.loc["rr", "cv"]
               - (np.sqrt(0.5) / 1.5)) < 1e-5
    assert abs(r.loc["odds_ratio", "cv"]
               - (np.sqrt(2.0) / 2)) < 1e-5
    assert abs(r.loc["log_rr", "cv"] - np.sqrt(2.0)) < 1e-5
    assert abs(r.loc["rr", "min_across_segments"] - 1.0) < 1e-9
    assert abs(r.loc["rr", "max_across_segments"] - 2.0) < 1e-9


def test_attributable_fraction_hand(tmp_path):
    d = str(tmp_path / "sf")
    _seg_fixture(d)
    r = q("attributable_fraction_weekend")(d).iloc[0]
    assert abs(r["af_exposed"] - 0.25) < 1e-6
    assert abs(r["paf"] - 1 / 7) < 1e-6
    assert r["total_purchases"] == 7
    assert abs(r["purchases_attributable"] - 1.0) < 1e-6
    assert abs(r["excess_on_weekends"] - 1.0) < 1e-6
    c = q("counterfactual_purchase_policies")(d).iloc[0]
    assert c["observed_purchases"] == 7
    assert abs(c["all_weekday_policy"] - 6.0) < 1e-6
    assert abs(c["all_weekend_policy"] - 8.0) < 1e-6
    # identity: vs_all_weekday == purchases_attributable
    assert abs(c["vs_all_weekday"] - 1.0) < 1e-6
    assert abs(c["headroom_to_weekend_rate"] - 1.0) < 1e-6
