"""Planted-fixture pinning tests for the round-2d queries (ordered
alternatives, scale/median tests, variance structure, reliability,
arrival fingerprints, length-bias, attribution completion, privacy
triad, adoption dynamics, session survival). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on hand-computable inputs.

Date anchors: 1995-01-01 was a Sunday ((epoch_day + 4) % 7 == 0 with
epoch_day 9131), so weekday arithmetic below is exact by construction.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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


def _write_orders_pri(d, rows):
    """rows: (orderkey, custkey, totalprice, orderdate, priority)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows)),
        "o_totalprice": pa.array([float(r[2]) for r in rows]),
        "o_orderdate": pa.array(np.array([r[3] for r in rows],
                                         dtype="datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[4] for r in rows])}),
        os.path.join(d, "orders.parquet"))


def _write_lineitem(d, rows):
    """rows: (orderkey, qty, discount)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int64()),
        "l_quantity": pa.array([float(r[1]) for r in rows]),
        "l_extendedprice": pa.array([100.0] * len(rows)),
        "l_discount": pa.array([float(r[2]) for r in rows]),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(
            np.array(["1995-02-01"] * len(rows),
                     dtype="datetime64[us]"), pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def _days(start, counts):
    """ts list with counts[i] events on start+i days (noon)."""
    ts, us = [], []
    uid = 0
    for i, c in enumerate(counts):
        for k in range(c):
            ts.append(np.datetime64(start, "D")
                      + np.timedelta64(i, "D"))
            us.append(uid)
            uid += 1
    return [str(t) + "T12:00:00" for t in ts], us


# ---------------------------------------------------------------------------
# Ordered alternatives
# ---------------------------------------------------------------------------

def test_page_trend_perfect_weekly_ramp(tmp_path):
    d = str(tmp_path / "sf")
    # two complete Sunday-aligned weeks, counts = dow+1 each week:
    # per-week ranks are 1..7 in treatment order, L = 2*140 = 280,
    # L2 = 560, E = 224, Var = 2*392/3
    counts = [1, 2, 3, 4, 5, 6, 7] * 2
    ts, us = _days("1995-01-01", counts)
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("page_trend_weekday")(d).iloc[0]
    assert out["n_weeks"] == 2
    assert out["l2"] == 560
    z = (560 - 224 * 2) / (2.0 * np.sqrt(2 * 392.0 / 3.0))
    assert abs(out["z"] - round(z, 6)) < 1e-9
    assert out["trend_rejected"] == 1


def test_jonckheere_perfect_ordering(tmp_path):
    d = str(tmp_path / "sf")
    _write_orders_pri(d, [
        (1, 1, 1.0, "1995-01-01", "1-URGENT"),
        (2, 1, 2.0, "1995-01-01", "1-URGENT"),
        (3, 1, 3.0, "1995-01-01", "2-HIGH"),
        (4, 1, 4.0, "1995-01-01", "2-HIGH"),
        (5, 1, 5.0, "1995-01-01", "5-LOW"),
        (6, 1, 6.0, "1995-01-01", "5-LOW")])
    out = q("jonckheere_priority_value")(d).iloc[0]
    # all 12 cross pairs concordant -> 2J = 24; E4 = 36-12 = 24
    assert out["n"] == 6
    assert out["j2"] == 24
    assert out["z"] > 1.959964
    assert out["ordered_rejected"] == 1


def test_taub_somers_perfect_grid(tmp_path):
    d = str(tmp_path / "sf")
    _write_lineitem(d, [(1, 1, 0.01), (2, 2, 0.02), (3, 3, 0.03)])
    out = q("taub_somers_qty_discount")(d).iloc[0]
    assert out["concordant"] == 3 and out["discordant"] == 0
    assert out["tau_b"] == 1.0
    assert out["somers_d_qty"] == 1.0
    assert out["somers_d_disc"] == 1.0


# ---------------------------------------------------------------------------
# Scale / median / location-scale
# ---------------------------------------------------------------------------

def test_ansari_bradley_weekend_wider(tmp_path):
    d = str(tmp_path / "sf")
    # weekend (Sat 1995-01-07) at the extremes, weekday (Mon) middle
    ts = ["1995-01-07T10:00:00", "1995-01-07T11:00:00",
          "1995-01-02T10:00:00", "1995-01-02T11:00:00"]
    _write_events(d, ts, [1, 2, 3, 4], ["view"] * 4,
                  [1.0, 100.0, 50.0, 51.0])
    out = q("ansari_bradley_weekend_scale")(d).iloc[0]
    assert out["n_weekend"] == 2 and out["n_weekday"] == 2
    assert out["z"] < 0          # weekend MORE dispersed


def test_mood_median_exact_chi2(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00"] * 9
    types = ["a"] * 3 + ["b"] * 3 + ["c"] * 3
    vals = [1.0] * 3 + [5.0] * 3 + [9.0] * 3
    _write_events(d, ts, list(range(9)), types, vals)
    out = q("mood_median_test_by_type")(d).iloc[0]
    assert out["grand_median_cents"] == 500
    assert out["n_above"] == 3
    assert abs(out["chi2"] - 9.0) < 1e-9
    assert out["median_rejected"] == 1


# ---------------------------------------------------------------------------
# Variance structure / time series
# ---------------------------------------------------------------------------

def test_allan_variance_ramp(tmp_path):
    d = str(tmp_path / "sf")
    ts, us = _days("1995-01-02", [1, 2, 3, 4])
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("allan_variance_daily")(d).set_index("tau_days")
    assert abs(out.loc[1, "avar"] - 0.5) < 1e-9       # 3/(2*3*1)
    assert abs(out.loc[2, "avar"] - 2.0) < 1e-9       # 16/(2*1*4)
    assert out.loc[4, "n_blocks"] == 1 and out.loc[4, "avar"] == 0.0
    assert out.loc[8, "n_blocks"] == 0


def test_adf_mean_reversion_detected(tmp_path):
    d = str(tmp_path / "sf")
    counts = [10, 1] * 6
    counts[-1] = 2    # break perfect fit so SSR > 0
    ts, us = _days("1995-01-02", counts)
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("adf_daily")(d).iloc[0]
    assert -2.2 < out["beta"] < -1.5
    assert out["unit_root_rejected"] == 1


def test_foster_stuart_monotone_records(tmp_path):
    d = str(tmp_path / "sf")
    ts, us = _days("1995-01-02", [1, 2, 3, 4, 5])
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("foster_stuart_records_daily")(d).iloc[0]
    assert out["upper_records"] == 4 and out["lower_records"] == 0
    assert out["d_stat"] == 4
    vard = sum(2.0 / t for t in range(2, 6))
    assert abs(out["z"] - round(4 / np.sqrt(vard), 6)) < 1e-9


def test_lin_ccc_identical_series(tmp_path):
    d = str(tmp_path / "sf")
    ts, types = [], []
    for i, c in enumerate([1, 2, 3]):
        for _ in range(c):
            base = str(np.datetime64("1995-01-02", "D")
                       + np.timedelta64(i, "D"))
            ts += [base + "T10:00:00", base + "T11:00:00"]
            types += ["view", "click"]
    _write_events(d, ts, list(range(len(ts))), types)
    out = q("lin_ccc_views_clicks")(d).iloc[0]
    assert out["ccc"] == 1.0 and out["pearson"] == 1.0
    assert out["c_b"] == 1.0


def test_chatterjee_xi_perfect_function_n5(tmp_path):
    d = str(tmp_path / "sf")
    ts, types = [], []
    for i, c in enumerate([1, 2, 3, 4, 5]):
        base = str(np.datetime64("1995-01-02", "D")
                   + np.timedelta64(i, "D"))
        for _ in range(c):
            ts += [base + "T10:00:00", base + "T11:00:00"]
            types += ["view", "purchase"]
    _write_events(d, ts, list(range(len(ts))), types)
    out = q("chatterjee_xi_views_purchases")(d).iloc[0]
    # exact finite-n value for a strictly increasing function, n=5
    assert abs(out["xi"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# Reliability / arrival fingerprints / length bias
# ---------------------------------------------------------------------------

def test_cronbach_alpha_two_users_two_hours(tmp_path):
    d = str(tmp_path / "sf")
    ts, us = [], []
    for uid, mult in [(1, 1), (2, 2)]:
        for h, c in [(0, 2), (1, 2)]:
            for k in range(c * mult):
                ts.append(f"1995-01-02T{h:02d}:0{k}:00")
                us.append(uid)
    _write_events(d, ts, us, ["view"] * len(ts))
    out = q("cronbach_alpha_hour_profile")(d).iloc[0]
    # item sums num: hour0 2*20-36=4, hour1 4; total 2*80-144=16
    assert out["item_var_num"] == 8
    assert out["total_var_num"] == 16
    assert abs(out["alpha"] - round(24.0 / 23.0 * 0.5, 6)) < 1e-9


def test_goh_barabasi_constant_gaps(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00", "1995-01-02T10:00:10",
          "1995-01-02T10:00:20", "1995-01-02T10:00:30"]
    _write_events(d, ts, [1] * 4, ["view"] * 4)
    out = q("goh_barabasi_gaps")(d).iloc[0]
    assert out["n_gaps"] == 3 and out["n_pairs"] == 2
    assert out["burstiness_b"] == -1.0     # sd 0 => (0-mu)/(0+mu)
    assert out["memory_r"] == 0.0          # degenerate variance


def test_inspection_paradox_two_gaps(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00", "1995-01-02T10:00:01",
          "1995-01-02T10:00:04"]
    _write_events(d, ts, [1] * 3, ["view"] * 3)
    out = q("inspection_paradox_gaps")(d).iloc[0]
    assert out["mean_gap_s"] == 2.0
    assert out["length_biased_mean_s"] == 2.5
    assert out["inspection_ratio"] == 1.25
    assert out["mean_residual_s"] == 1.25


# ---------------------------------------------------------------------------
# Session survival / size bias
# ---------------------------------------------------------------------------

def test_session_hazard_and_mrl(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00",                       # u1: k=1
          "1995-01-02T10:00:00",                       # u2: k=1
          "1995-01-02T10:00:00", "1995-01-02T10:00:10"]  # u3: k=2
    _write_events(d, ts, [1, 2, 3, 3], ["view"] * 4)
    hz = q("session_position_hazard")(d).set_index("position")
    assert hz.loc[1, "at_risk"] == 3 and hz.loc[1, "ended"] == 2
    assert abs(hz.loc[1, "hazard"] - round(2 / 3, 6)) < 1e-9
    assert hz.loc[2, "hazard"] == 1.0
    mrl = q("session_mean_residual_life")(d) \
        .set_index("after_events")
    assert mrl.loc[1, "at_risk"] == 1
    assert mrl.loc[1, "mean_remaining_events"] == 1.0
    sb = q("event_size_biased_sessions")(d).iloc[0]
    # sizes [1,1,2]: mean 4/3; event-weighted (1+1+4)/4 = 1.5
    assert abs(sb["mean_session_events"] - round(4 / 3, 6)) < 1e-9
    assert sb["event_weighted_mean"] == 1.5


# ---------------------------------------------------------------------------
# Attribution completion
# ---------------------------------------------------------------------------

def test_u_shaped_and_decay_attribution(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00",    # view, 30 min before purchase
          "1995-01-02T10:30:00",    # click, at purchase instant
          "1995-01-02T10:30:00",    # purchase (u1)
          "1995-01-03T10:00:00"]    # purchase (u2), zero touches
    _write_events(d, ts, [1, 1, 1, 2],
                  ["view", "click", "purchase", "purchase"])
    att = q("position_decay_attribution")(d) \
        .set_index("touch_type")
    assert att.loc["view", "u_shaped_credit"] == 0.5
    assert att.loc["click", "u_shaped_credit"] == 0.5
    # decay: click weight 1, view weight 2^-1 = 0.5
    assert abs(att.loc["click", "time_decay_credit"]
               - round(1 / 1.5, 4)) < 1e-9
    assert abs(att.loc["view", "time_decay_credit"]
               - round(0.5 / 1.5, 4)) < 1e-9
    pl = q("conversion_path_length_hist")(d) \
        .set_index("path_len")
    assert pl.loc[0, "purchases"] == 1
    assert pl.loc[2, "purchases"] == 1


# ---------------------------------------------------------------------------
# Privacy / adoption
# ---------------------------------------------------------------------------

def test_t_closeness_identical_groups(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T00:10:00", "1995-01-02T00:20:00",
          "1995-01-02T01:10:00", "1995-01-02T01:20:00"]
    _write_events(d, ts, [1, 2, 3, 4],
                  ["view", "purchase", "view", "purchase"])
    out = q("t_closeness_audit")(d).iloc[0]
    assert out["n_groups"] == 2
    assert out["t_max"] == 0.0
    assert out["groups_over_02"] == 0


def test_arrival_gini_burst(tmp_path):
    d = str(tmp_path / "sf")
    # all 4 users first appear day 1; days 2-3 only user 1 returns
    ts = ["1995-01-02T10:00:00"] * 4 \
        + ["1995-01-03T10:00:00", "1995-01-04T10:00:00"]
    _write_events(d, ts, [1, 2, 3, 4, 1, 1], ["view"] * 6)
    out = q("arrival_gini_concentration")(d).iloc[0]
    assert out["n_days"] == 3 and out["n_users"] == 4
    assert abs(out["gini_arrivals"] - round(2 / 3, 6)) < 1e-9
    assert out["peak_day_share"] == 1.0


def test_lorenz_asymmetry_giant_vs_tail(tmp_path):
    d = str(tmp_path / "sf")
    ts = ["1995-01-02T10:00:00"] * 4
    # one giant (97) + three 1s: mean 25, F = 3/4, L = 3/100
    _write_events(d, ts, [1, 2, 3, 4], ["view"] * 4,
                  [1.0, 1.0, 1.0, 97.0])
    out = q("lorenz_asymmetry_user_value")(d).iloc[0]
    assert out["f_mu"] == 0.75
    assert out["l_mu"] == 0.03
    assert out["lac"] == 0.78
    assert out["giant_driven"] == 0
    eff = q("effective_users_concentration")(d).iloc[0]
    # Neff = 100^2 cents-scaled: (10000)^2/(3*100^2+9700^2)
    neff = 10000.0 ** 2 / (3 * 100 ** 2 + 9700 ** 2)
    assert abs(eff["effective_users"] - round(neff, 6)) < 1e-9
    assert eff["berger_parker_share"] == 0.97


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
