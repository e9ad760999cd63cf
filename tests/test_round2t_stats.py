"""Planted-fixture pinning tests for the round-2t batches (kappa
paradox + AC1, chain drift + GEKS, SIPP staffing). Oracle parity
runs in tools/check_oracle.py; these pin the MATH on tiny inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines.queries import REGISTRY
from tests.test_round2e_stats import _write_events


def q(name):
    return REGISTRY[name][0]


# ---------------------------------------------------------------------------
# Kappa paradox on the spike fixture: both rules agree perfectly
# ---------------------------------------------------------------------------

def test_kappa_perfect_agreement(tmp_path):
    d = str(tmp_path / "sf")
    _write_events(d, [f"1995-01-0{i + 1}T12:00:00"
                      for i in range(5)],
                  list(range(5)), ["view"] * 5,
                  [1.0, 1.0, 1.0, 1.0, 100.0])
    r = q("kappa_paradox_outlier_rules")(d).iloc[0]
    # both rules flag exactly day 5: a=1,d=4 -> po=1, kappa=1
    assert abs(r["raw_agreement"] - 1.0) < 1e-9
    assert abs(r["kappa"] - 1.0) < 1e-9
    assert abs(r["prevalence_index"] + 0.6) < 1e-9
    assert abs(r["bias_index"] - 0.0) < 1e-9
    assert abs(r["pabak"] - 1.0) < 1e-9
    assert r["paradox"] == 0
    a = q("ac1_vs_kappa_outlier_rules")(d).iloc[0]
    assert abs(a["gwet_ac1"] - 1.0) < 1e-9
    assert abs(a["ac1_minus_kappa"] - 0.0) < 1e-9


# ---------------------------------------------------------------------------
# Chain drift + GEKS on a doubled-price two-part panel
# ---------------------------------------------------------------------------

def _write_lineitem_pq(d, rows):
    """rows: (orderkey, partkey, extendedprice, qty, shipdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int32()),
        "l_quantity": pa.array([float(r[3]) for r in rows]),
        "l_extendedprice": pa.array([float(r[2]) for r in rows]),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(
            np.array([r[4] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def test_chain_drift_and_geks_doubling(tmp_path):
    d = str(tmp_path / "sf")
    # both parts double between the two months: every index = 2
    _write_lineitem_pq(d, [(1, 1, 1.0, 1, "1995-01-10"),
                           (2, 2, 1.0, 1, "1995-01-15"),
                           (3, 1, 2.0, 1, "1995-02-10"),
                           (4, 2, 2.0, 1, "1995-02-15")])
    r = q("chain_drift_fisher")(d).iloc[0]
    assert r["final_month_idx"] == 1 and r["n_links"] == 1
    assert abs(r["fixed_base_fisher"] - 2.0) < 1e-6
    assert abs(r["chained_fisher"] - 2.0) < 1e-6
    assert abs(r["drift_ratio"] - 1.0) < 1e-9
    g = q("geks_price_index")(d).iloc[0]
    assert abs(g["geks_index"] - 2.0) < 1e-6
    assert abs(g["geks_over_fixed"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# SIPP on a one-busy-hour world
# ---------------------------------------------------------------------------

def test_sipp_single_hot_hour(tmp_path):
    d = str(tmp_path / "sf")
    # 4 sessions per day x 2 days, all in hour 9, each 360 s:
    # a_9 = 4 * 360/3600 = 0.4 erlangs
    ts, us = [], []
    uid = 0
    for day in (2, 3):
        for k in range(4):
            ts += [f"1995-01-0{day}T09:{10 + k:02d}:00",
                   f"1995-01-0{day}T09:{16 + k:02d}:00"]
            us += [uid, uid]
            uid += 1
    _write_events(d, ts, us, ["view"] * len(ts))
    r = q("sipp_staffing_by_hour")(d).set_index("hour")
    assert abs(r.loc[9, "offered_erlangs"] - 0.4) < 1e-6
    assert r.loc[9, "servers_required"] == 2
    assert abs(r.loc[9, "occupancy"] - 0.2) < 1e-6
    assert r.loc[0, "servers_required"] == 0
    f = q("sipp_vs_flat_staffing")(d).iloc[0]
    assert f["sipp_server_hours"] == 2
    assert f["flat_peak_server_hours"] == 48
    assert f["flat_mean_server_hours"] == 24
    assert abs(f["peak_overstaff_ratio"] - 24.0) < 1e-6
    assert f["mean_understaffed_hours"] == 1


# ---------------------------------------------------------------------------
# Group-sequential boundaries on two planted weeks
# ---------------------------------------------------------------------------

def test_obf_and_pocock_two_weeks(tmp_path):
    d = str(tmp_path / "sf")
    # each week: Sun purchase + Sat view (p1=.5), one weekday
    # purchase of five (p0=.2)
    ts, us, tp = [], [], []
    uid = 0
    for wk in range(2):
        base = 1 + 7 * wk
        for off, t in [(0, "purchase"), (6, "view"),
                       (1, "purchase"), (2, "view"),
                       (3, "view"), (4, "view"), (5, "view")]:
            ts.append(f"1995-01-{base + off:02d}T12:00:00")
            us.append(uid)
            tp.append(t)
            uid += 1
    _write_events(d, ts, us, tp)
    r = q("obrien_fleming_monitor")(d)
    assert len(r) == 2
    assert abs(r["obf_boundary"].iloc[0]
               - 1.959964 * np.sqrt(2.0)) < 1e-5
    assert abs(r["obf_boundary"].iloc[1] - 1.959964) < 1e-6
    # cumulative z at week 2: (.5-.2)/sqrt(.0625+.016)
    z2 = 0.3 / np.sqrt(0.5 * 0.5 / 4 + 0.2 * 0.8 / 10)
    assert abs(r["cumulative_z"].iloc[1] - z2) < 1e-5
    assert list(r["obf_crossed"]) == [0, 0]
    assert list(r["naive_crossed"]) == [0, 0]
    v = q("pocock_vs_obf_verdict")(d).iloc[0]
    assert v["n_analyses"] == 2
    assert abs(v["pocock_boundary"] - 2.178) < 1e-9
    import pandas as pd
    assert pd.isna(v["first_cross_pocock"])
    assert pd.isna(v["first_cross_obf"])
    assert pd.isna(v["first_cross_naive"])
