"""Planted-fixture pinning tests for the round-2p query batches
(standardization + Kitagawa, VaR governance, Erlang-C, Cape Cod /
Benktander reserving, Taguchi loss, revenue-volatility
decomposition). Oracle parity runs in tools/check_oracle.py; these
pin the MATH on tiny inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2d_stats import _write_orders_pri
from tests.test_round2e_stats import _write_events
from tests.test_round2o_stats import (_write_lineitem_supp,
                                      _write_supp_nation)


def q(name):
    return REGISTRY[name][0]


def _write_lineitem_price(d, rows):
    """rows: (orderkey, extendedprice, shipdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows)),
        "l_extendedprice": pa.array([float(r[1]) for r in rows]),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(
            np.array([r[2] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


# ---------------------------------------------------------------------------
# Standardization + Kitagawa on a two-nation, two-priority world
# ---------------------------------------------------------------------------

def _std_fixture(d):
    """Nation A: 4 urgent (2 late) + 4 low (0 late);
    nation B: 4 urgent (4 late) + 4 low (2 late)."""
    rows = []
    ordrows = []
    ok = 1
    for supp, urg_late, low_late in ((1, 2, 0), (2, 4, 2)):
        for i in range(4):
            ship = "1995-04-11" if i < urg_late else "1995-01-11"
            rows.append((ok, supp, ship))
            ordrows.append((ok, 1, 1.0, "1995-01-01", "1-URGENT"))
            ok += 1
        for i in range(4):
            ship = "1995-04-11" if i < low_late else "1995-01-11"
            rows.append((ok, supp, ship))
            ordrows.append((ok, 1, 1.0, "1995-01-01", "5-LOW"))
            ok += 1
    _write_lineitem_supp(d, rows)
    _write_orders_pri(d, ordrows)
    _write_supp_nation(d, [(1, 0), (2, 1)],
                       [(0, "ALPHA"), (1, "BETA")])


def test_smr_and_direct_standardization(tmp_path):
    d = str(tmp_path / "sf")
    _std_fixture(d)
    # pooled rates: urgent 6/8, low 2/8
    r = q("late_smr_by_nation")(d).set_index("nation")
    ea = 4 * 6 / 8 + 4 * 2 / 8        # expected for ALPHA = 4
    assert abs(r.loc["ALPHA", "expected_late"] - ea) < 1e-6
    assert abs(r.loc["ALPHA", "smr"] - 2 / ea) < 1e-6
    assert abs(r.loc["BETA", "smr"] - 6 / ea) < 1e-6
    ds = q("direct_standardized_late_rates")(d) \
        .set_index("nation")
    # equal mixes: standardized == crude
    assert abs(ds.loc["ALPHA", "standardized_rate"]
               - 2 / 8) < 1e-6
    assert abs(ds.loc["BETA", "standardized_rate"]
               - 6 / 8) < 1e-6
    assert list(ds["incomplete_mix"]) == [0, 0]


def test_kitagawa_equal_mix_all_rate(tmp_path):
    d = str(tmp_path / "sf")
    _std_fixture(d)
    r = q("kitagawa_rate_gap_decomposition")(d).iloc[0]
    # identical mixes (.5/.5): the whole gap is rate component
    assert abs(r["crude_gap"] + 0.5) < 1e-6 \
        or abs(r["crude_gap"] - 0.5) < 1e-6
    assert abs(r["mix_component"] - 0.0) < 1e-9
    assert abs(abs(r["rate_component"]) - 0.5) < 1e-6
    assert r["performance_driven"] == 1
    st = q("kitagawa_stratum_contributions")(d)
    assert abs(st["mix_contribution"].abs().sum() - 0.0) < 1e-9


# ---------------------------------------------------------------------------
# VaR governance on the 22-day staircase
# ---------------------------------------------------------------------------

def _var_fixture(d):
    vals = [0.01 * (i + 1) for i in range(11)] \
        + [0.01] + [0.50] * 10
    ts = [f"1995-01-{i + 1:02d}T12:00:00" for i in range(22)]
    _write_events(d, ts, list(range(22)), ["view"] * 22, vals)


def test_basel_and_es_hand_values(tmp_path):
    d = str(tmp_path / "sf")
    _var_fixture(d)
    b = q("var_basel_traffic_light")(d).iloc[0]
    # train 11 days revs 1..11c: var10 = 2c; test: one 1c day
    assert b["n_test_days"] == 11
    assert b["exceptions"] == 1
    exp = 0.9 ** 11 + 11 * 0.1 * 0.9 ** 10
    assert abs(b["cum_prob"] - exp) < 1e-6
    assert b["zone"] == "green"
    e = q("es_backtest_acerbi")(d).iloc[0]
    assert abs(e["es_train"] - 0.01) < 1e-9
    assert abs(e["mean_exception_rev"] - 0.01) < 1e-9
    assert abs(e["z2"] - (1 / 1.1 - 1)) < 1e-6
    assert e["tail_worse"] == 0


# ---------------------------------------------------------------------------
# Erlang-C sanity: recursion against closed forms
# ---------------------------------------------------------------------------

def test_erlang_c_recursion_closed_form(tmp_path):
    from webalizer_ray.pipelines.queries import _erlang_c
    # Erlang-B with s=1: B = a/(1+a); C(1) = B/(1-a(1-B)/1)...
    a = 0.5
    cs = _erlang_c(a)
    b1 = a / (1 + a)
    c1 = 1 * b1 / (1 - a * (1 - b1))
    assert abs(cs[1] - c1) < 1e-12
    # monotone decreasing in s, and -> 0
    assert cs[2] < cs[1] and cs[10] < 1e-6


def test_erlang_profile_runs(tmp_path):
    d = str(tmp_path / "sf")
    # a handful of short sessions in one hour
    ts, us = [], []
    for u in range(6):
        ts += [f"1995-01-02T09:{u:02d}:00",
               f"1995-01-02T09:{u:02d}:30"]
        us += [u, u]
    _write_events(d, ts, us, ["view"] * len(ts))
    r = q("erlang_c_wait_profile")(d)
    assert len(r) == 8
    assert (r["wait_prob"].diff().dropna() <= 1e-12).all()
    s = q("sqrt_staffing_curve")(d)
    assert (s["servers_required"].diff().dropna() >= 0).all()


# ---------------------------------------------------------------------------
# Reserving on the 2-cohort toy triangle
# ---------------------------------------------------------------------------

def _reserve_fixture(d):
    _write_orders_pri(d, [(1, 1, 10.0, "1995-01-15", "3-MEDIUM"),
                          (2, 1, 10.0, "1995-02-15", "3-MEDIUM")])
    _write_lineitem_price(d, [(1, 5.0, "1995-01-20"),
                              (1, 5.0, "1995-02-20"),
                              (2, 5.0, "1995-02-20")])


def test_cape_cod_hand_triangle(tmp_path):
    d = str(tmp_path / "sf")
    _reserve_fixture(d)
    r = q("cape_cod_elr")(d).iloc[0]
    # f0 = 2; cohort 2 cdf = 2; ELR = 15/15 = 1
    assert r["n_cohorts"] == 2
    assert abs(r["elr"] - 1.0) < 1e-6
    assert abs(r["used_up_premium"] - 15.0) < 1e-6
    assert abs(r["reserve_bf"] - 5.0) < 1e-6
    assert abs(r["reserve_cl"] - 5.0) < 1e-6
    bc = q("bf_reserve_by_cohort")(d)
    assert abs(bc["ultimate_cl"].iloc[1] - 10.0) < 1e-6
    assert abs(bc["ultimate_bf"].iloc[1] - 10.0) < 1e-6
    gb = q("benktander_reserve")(d).iloc[0]
    assert abs(gb["reserve_gb"] - 5.0) < 1e-6
    assert abs(gb["gb_over_cl"] - 1.0) < 1e-6
    em = q("expected_next_month_emergence")(d)
    assert len(em) == 1
    assert em["cohort"].iloc[0] == 1
    assert abs(em["expected_next_month"].iloc[0] - 5.0) < 1e-6


# ---------------------------------------------------------------------------
# Taguchi loss + ranking
# ---------------------------------------------------------------------------

def test_taguchi_bias_variance_split(tmp_path):
    d = str(tmp_path / "sf")
    _write_orders_pri(d, [(1, 1, 1.0, "1995-01-01", "1-URGENT"),
                          (2, 1, 1.0, "1995-01-01", "1-URGENT"),
                          (3, 1, 1.0, "1995-01-01", "5-LOW"),
                          (4, 1, 1.0, "1995-01-01", "5-LOW")])
    # urgent lags {80,100}: v=100, bias=(90-45)^2; low {40,50}:
    # mu=45 -> bias exactly 0
    _write_lineitem_supp(d, [(1, 1, "1995-03-22"),
                             (2, 1, "1995-04-11"),
                             (3, 1, "1995-02-10"),
                             (4, 1, "1995-02-20")])
    r = q("taguchi_loss_ship_lag")(d).set_index("priority")
    assert abs(r.loc["1-URGENT", "expected_loss"] - 2125.0) < 1e-6
    assert abs(r.loc["1-URGENT", "variance_part"] - 100.0) < 1e-6
    assert abs(r.loc["1-URGENT", "bias_part"] - 2025.0) < 1e-6
    assert abs(r.loc["5-LOW", "bias_part"] - 0.0) < 1e-9
    assert abs(r.loc["5-LOW", "variance_part"] - 25.0) < 1e-6
    t = q("taguchi_vs_goalpost_ranking")(d).iloc[0]
    # LOW is better under BOTH metrics: tau = 1
    assert t["n_priorities"] == 2
    assert abs(t["kendall_tau"] - 1.0) < 1e-9
    assert t["rankings_agree"] == 1


# ---------------------------------------------------------------------------
# Revenue volatility decomposition
# ---------------------------------------------------------------------------

def test_volatility_decomposition_hand(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, ["1995-01-01T10:00:00", "1995-01-01T11:00:00",
                      "1995-01-02T10:00:00"],
                  [0, 1, 2], ["view"] * 3, [1.0, 1.0, 4.0])
    r = q("revenue_volatility_decomposition")(d).iloc[0]
    # days (n, rev$): (2, 2), (1, 4): var_obs = 2; E[N]Var(X)=3;
    # Var(N)E[X]^2 = 2; residual = -3; count share .4
    assert r["n_days"] == 2
    assert abs(r["var_observed"] - 2.0) < 1e-6
    assert abs(r["var_from_sizes"] - 3.0) < 1e-6
    assert abs(r["var_from_counts"] - 2.0) < 1e-6
    assert abs(r["dependence_residual"] + 3.0) < 1e-6
    assert abs(r["count_share_of_predicted"] - 0.4) < 1e-6
    t = q("volatility_attribution_by_type")(d)
    assert len(t) == 1
    assert abs(t["var_observed"].iloc[0] - 2.0) < 1e-6
    assert abs(t["count_share"].iloc[0] - 0.4) < 1e-6
