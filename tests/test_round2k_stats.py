"""Planted-fixture pinning tests for the round-2k query batches
(SPC p-chart, Omega/Sortino, ABC×XYZ, Keyfitz/MRL, German tank,
behavioral uniqueness, Dobrushin mixing). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import numpy as np

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import (_write_events,
                                      _write_lineitem_ship,
                                      _write_part)


def q(name):
    return REGISTRY[name][0]


def test_p_chart_flat_process(tmp_path):
    d = str(tmp_path / "sf")
    ts, us, tp = [], [], []
    uid = 0
    for day in (1, 2):
        for j in range(10):
            ts.append(f"1995-01-0{day}T0{j % 10}:00:00")
            us.append(uid)
            tp.append("error" if j == 0 else "view")
            uid += 1
    _write_events(d, ts, us, tp)
    ch = q("p_chart_daily_errors")(d)
    assert len(ch) == 2
    r = ch.iloc[0]
    assert r["p"] == 0.1 and r["p_bar"] == 0.1
    assert r["ucl"] == round(0.1 + 3 * np.sqrt(0.009), 6)
    assert (ch["beyond_3sigma"] == 0).all()
    we = q("western_electric_rules_errors")(d).iloc[0]
    assert we["rule1_days"] == 0 and we["first_rule1_day"] == -1
    assert we["rule4_days"] == 0


def test_omega_hand_quartiles(tmp_path):
    d = str(tmp_path / "sf")
    # daily revenue $1..$8 over 8 consecutive days
    _write_events(d, [f"1995-01-0{i + 1}T12:00:00"
                      for i in range(8)],
                  list(range(8)), ["view"] * 8,
                  [float(i + 1) for i in range(8)])
    s = q("omega_sortino_daily_revenue")(d).iloc[0]
    assert s["omega_at_mean"] == 1.0
    assert s["downside_dev"] == round(
        np.sqrt(210000 / 8) / 100, 6)
    assert s["upside_over_ddev"] == round(
        100.0 / np.sqrt(210000 / 8), 6)
    c = q("omega_curve_daily_revenue")(d)
    om = dict(zip(c["threshold_pctile"], c["omega"]))
    assert om[25] == 21.0
    assert om[50] == round(1000 / 600, 6)
    assert om[75] == 0.2


def test_abc_xyz_planted_diagonal(tmp_path):
    d = str(tmp_path / "sf")
    _write_part(d, [(1, "B1"), (2, "B2"), (3, "B3")])
    rows = []
    ok = 1
    # part1: 8 lines/month x 2 months, qty 1 -> A, CV 0 -> X
    for m in (1, 2):
        for j in range(8):
            rows.append((ok, 1, 1.0, f"1995-0{m}-10T00:00:00"))
            ok += 1
    # part2: qty sums (1, 3) across months -> B, CV ~0.707 -> Y
    rows.append((ok, 2, 1.0, "1995-01-11T00:00:00")); ok += 1
    rows.append((ok, 2, 1.0, "1995-02-11T00:00:00")); ok += 1
    rows.append((ok, 2, 2.0, "1995-02-12T00:00:00")); ok += 1
    # part3: one line month1 only -> C, CV sqrt(2) -> Z
    rows.append((ok, 3, 1.0, "1995-01-12T00:00:00"))
    _write_lineitem_ship(d, rows)
    m = q("abc_xyz_matrix")(d)
    cells = {(a, x): (n, r) for a, x, n, r in
             zip(m["abc"], m["xyz"], m["n_parts"],
                 m["revenue_pct"])}
    assert cells[("A", "X")] == (1, 80.0)
    assert cells[("B", "Y")] == (1, 15.0)
    assert cells[("C", "Z")] == (1, 5.0)
    e = q("abc_xyz_policy_exposure")(d).iloc[0]
    assert e["automatable_rev_pct"] == 80.0
    assert e["az_exposure_pct"] == 0.0
    assert e["cz_review_parts"] == 1
    assert e["erratic_rev_pct"] == 5.0


def test_keyfitz_and_mrl_instant_conversion(tmp_path):
    d = str(tmp_path / "sf")
    # everyone purchases on day 1: S = [1,0,...]; H = 0, MRL NULL
    _write_events(d,
                  ["1995-01-02T10:00:00", "1995-01-02T11:00:00",
                   "1995-01-03T10:00:00", "1995-01-03T11:00:00"],
                  [0, 1, 0, 1],
                  ["view", "view", "purchase", "purchase"])
    k = q("keyfitz_entropy_purchase_cohorts")(d).iloc[0]
    assert k["rmst14_days"] == 1.0
    assert k["keyfitz_h"] == 0.0
    m = q("purchase_mrl_at_day7_cohorts")(d).iloc[0]
    assert m["survival_at_7"] == 0.0
    assert np.isnan(m["mrl7_days"])
    assert m["rmst_share_after_7_pct"] == 0.0


def test_german_tank_fully_sampled(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, [f"1995-01-01T0{i}:00:00" for i in range(10)],
                  list(range(10)), ["view"] * 10)
    t = q("german_tank_user_estimate")(d).iloc[0]
    assert t["observed_users"] == 10 and t["max_id"] == 9
    assert t["n_hat"] == round(9 + 0.9 - 1, 6)
    assert t["se_approx"] == 0.0
    a = q("id_space_validity_audit")(d).iloc[0]
    assert a["density_pct"] == 100.0
    assert a["gap_dispersion"] == 1.0
    assert a["tank_estimator_valid"] == 1


def test_uniqueness_decile_drives_risk(tmp_path):
    d = str(tmp_path / "sf")
    # u0, u1 behaviorally identical (1 view at 01h); u2 distinct
    # (2 purchases at 13h). n=3 deciles separate u0/u1 by the
    # pinned user_id tie-break -> full QI uniqueness 100%, but
    # dropping the decile merges u0/u1 -> 1/3 unique
    _write_events(d,
                  ["1995-01-01T01:00:00", "1995-01-01T01:30:00",
                   "1995-01-01T13:00:00", "1995-01-01T13:30:00"],
                  [0, 1, 2, 2],
                  ["view", "view", "purchase", "purchase"])
    r = q("behavioral_uniqueness_risk")(d).iloc[0]
    assert r["n_users"] == 3
    assert r["unique_users_pct"] == 100.0
    lad = q("uniqueness_attribution_ladder")(d)
    ld = dict(zip(lad["dropped"], lad["unique_pct"]))
    assert ld["none"] == 100.0
    assert ld["decile"] == round(1 / 3 * 100, 6)


def test_dobrushin_disjoint_rows(tmp_path):
    d = str(tmp_path / "sf")
    # u0: view>click>view>click; u1: purchase>error — every row
    # pair is disjoint so delta = 1 and the mixing bound is NULL
    _write_events(d,
                  ["1995-01-01T10:00:00", "1995-01-01T10:01:00",
                   "1995-01-01T10:02:00", "1995-01-01T10:03:00",
                   "1995-01-01T11:00:00", "1995-01-01T11:01:00"],
                  [0, 0, 0, 0, 1, 1],
                  ["view", "click", "view", "click",
                   "purchase", "error"])
    r = q("dobrushin_mixing_types")(d).iloc[0]
    assert r["n_states"] == 3
    assert r["dobrushin_delta"] == 1.0
    assert (r["extreme_state_a"], r["extreme_state_b"]) == \
        ("click", "purchase")
    assert np.isnan(r["steps_to_1pct_bound"])
    mem = q("markov_state_memory_types")(d)
    tv = dict(zip(mem["state"], mem["tv_from_marginal"]))
    # marginal next-step = (click .5, error .25, view .25);
    # view row = (click 1) -> TV = 0.5
    assert tv["view"] == 0.5
