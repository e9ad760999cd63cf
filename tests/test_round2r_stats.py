"""Planted-fixture pinning tests for the round-2r batches — the
statistical-pitfall series (Berkson, post-treatment conditioning,
Lord's paradox, Robinson's ecological fallacy, Will Rogers).
Oracle parity runs in tools/check_oracle.py; these pin the MATH on
tiny inputs.
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
# Berkson: one session per (v,p) cell
# ---------------------------------------------------------------------------

def test_berkson_hand_phi(tmp_path):
    d = str(tmp_path / "sf")
    ts, us, tp = [], [], []
    for u, types in enumerate([["view", "purchase"], ["view"],
                               ["purchase"], ["click"]]):
        for k, t in enumerate(types):
            ts.append(f"1995-01-03T09:{u:02d}:{k:02d}")
            us.append(u)
            tp.append(t)
    _write_events(d, ts, us, tp)
    r = q("berkson_selection_demo")(d).iloc[0]
    # cells a=b=c=d=1: phi_all = 0; selecting away d: phi = -1/2
    assert abs(r["phi_all"] - 0.0) < 1e-9
    assert abs(r["phi_selected"] + 0.5) < 1e-6
    assert abs(r["selection_distortion"] - 0.5) < 1e-6
    assert r["sign_flipped"] == 1


# ---------------------------------------------------------------------------
# Post-treatment conditioning
# ---------------------------------------------------------------------------

def test_post_treatment_hand_rates(tmp_path):
    d = str(tmp_path / "sf")
    ts, us, tp = [], [], []
    uid = 0
    # weekend (Sun 1995-01-01): clicker+purchase, view-only
    for types in [["click", "purchase"], ["view"]]:
        for k, t in enumerate(types):
            ts.append(f"1995-01-01T09:{uid:02d}:{k:02d}")
            us.append(uid)
            tp.append(t)
        uid += 1
    # weekday (Mon): clicker+purchase, clicker, view, view
    for types in [["click", "purchase"], ["click"],
                  ["view"], ["view"]]:
        for k, t in enumerate(types):
            ts.append(f"1995-01-02T09:{uid:02d}:{k:02d}")
            us.append(uid)
            tp.append(t)
        uid += 1
    _write_events(d, ts, us, tp)
    r = q("post_treatment_conditioning_demo")(d).iloc[0]
    # all: weekend .5 vs weekday .25 -> .25
    # clickers: weekend 1/1 vs weekday 1/2 -> .5 (ratio 2)
    assert abs(r["effect_all_sessions"] - 0.25) < 1e-6
    assert abs(r["effect_among_clickers"] - 0.5) < 1e-6
    assert abs(r["conditioned_over_itt"] - 2.0) < 1e-6
    assert abs(r["click_rate_shift"] - 0.0) < 1e-9
    assert r["conditioning_unsafe"] == 0


# ---------------------------------------------------------------------------
# Lord's paradox: the clean flip
# ---------------------------------------------------------------------------

def test_lords_paradox_full_flip(tmp_path):
    d = str(tmp_path / "sf")
    # (first val, first type, last val) per user; purchase-first
    # cohort {A,B}: x=(10,8), y=(6,8); other {C,D}: x=(2,0),
    # y=(4,2) -> change -4, pooled slope 0, ANCOVA +4
    spec = [(10.0, "purchase", 6.0), (8.0, "purchase", 8.0),
            (2.0, "view", 4.0), (0.0, "view", 2.0)]
    ts, us, tp, vals = [], [], [], []
    for u, (x, t1, y) in enumerate(spec):
        ts.append(f"1995-01-03T08:{u:02d}:00")
        us.append(u)
        tp.append(t1)
        vals.append(x)
        ts.append(f"1995-01-03T14:{u:02d}:00")
        us.append(u)
        tp.append("view")
        vals.append(y)
    _write_events(d, ts, us, tp, vals)
    r = q("lords_paradox_sessions")(d).iloc[0]
    assert abs(r["change_score_diff"] + 4.0) < 1e-6
    assert abs(r["ancova_diff"] - 4.0) < 1e-6
    assert abs(r["baseline_gap"] - 8.0) < 1e-6
    assert abs(r["pooled_slope"] - 0.0) < 1e-9
    assert r["verdicts_flip"] == 1
    rec = q("lords_paradox_reconciliation")(d).iloc[0]
    assert abs(rec["rtm_term"] - 8.0) < 1e-6
    assert abs(rec["identity_residual"] - 0.0) < 1e-9
    assert rec["regression_to_mean_present"] == 1


# ---------------------------------------------------------------------------
# Robinson: two perfectly-aligned nations
# ---------------------------------------------------------------------------

def _write_customer_nk(d, rows):
    """rows: (custkey, nationkey)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows]),
        "c_nationkey": pa.array([r[1] for r in rows],
                                pa.int32()),
        "c_acctbal": pa.array([0.0] * len(rows)),
        "c_mktsegment": pa.array(["S"] * len(rows))}),
        os.path.join(d, "customer.parquet"))


def test_robinson_hand_correlations(tmp_path):
    d = str(tmp_path / "sf")
    _write_customer_nk(d, [(0, 0), (1, 0), (2, 1), (3, 1)])
    spec = {0: (1, 0), 1: (0, 1), 2: (3, 2), 3: (2, 3)}
    ts, us, tp = [], [], []
    for u, (x, y) in spec.items():
        for k in range(x):
            ts.append(f"1995-01-03T08:{u:02d}:{k:02d}")
            us.append(u)
            tp.append("view")
        for k in range(y):
            ts.append(f"1995-01-03T09:{u:02d}:{k:02d}")
            us.append(u)
            tp.append("purchase")
    _write_events(d, ts, us, tp)
    r = q("robinson_ecological_demo")(d).iloc[0]
    assert r["n_users"] == 4 and r["n_nations"] == 2
    assert abs(r["r_individual"] - 0.6) < 1e-6
    assert abs(r["r_ecological"] - 1.0) < 1e-6
    assert abs(r["inflation_ratio"] - 1 / 0.6) < 1e-5
    c = q("correlation_decomposition_nations")(d).iloc[0]
    assert abs(c["cov_within_share"] + 1 / 3) < 1e-6
    assert abs(c["cov_between_share"] - 4 / 3) < 1e-6
    assert abs(c["eta2_views"] - 0.8) < 1e-6
    assert abs(c["eta2_purchases"] - 0.8) < 1e-6


# ---------------------------------------------------------------------------
# Will Rogers on the four-user tier panel
# ---------------------------------------------------------------------------

def test_will_rogers_hand_means(tmp_path):
    d = str(tmp_path / "sf")
    # (v1, v2) dollars: A(1,1) B(2,4) C(3,3) D(10,10); 4-day
    # span splits after day 2
    spec = [(1.0, 1.0), (2.0, 4.0), (3.0, 3.0), (10.0, 10.0)]
    ts, us, tp, vals = [], [], [], []
    for u, (a, b) in enumerate(spec):
        ts.append(f"1995-01-01T10:{u:02d}:00")
        us.append(u)
        tp.append("view")
        vals.append(a)
        ts.append(f"1995-01-03T10:{u:02d}:00")
        us.append(u)
        tp.append("view")
        vals.append(b)
    _write_events(d, ts, us, tp, vals)
    r = q("will_rogers_demo")(d).iloc[0]
    # medians: v1 -> 2 (A,B low); v2 -> 3 (A,C low re-tiered)
    assert abs(r["low_mean_frozen"] - 2.5) < 1e-6
    assert abs(r["low_mean_retiered"] - 2.0) < 1e-6
    assert abs(r["high_mean_frozen"] - 6.5) < 1e-6
    assert abs(r["high_mean_retiered"] - 7.0) < 1e-6
    assert r["migrants"] == 2
    assert r["both_rose"] == 0      # B up lifted high, C down cut low
    m = q("will_rogers_migrants")(d).iloc[0]
    assert m["migrated_up"] == 1 and m["migrated_down"] == 1
    assert abs(m["up_migrant_mean"] - 4.0) < 1e-6
    assert abs(m["down_migrant_mean"] - 3.0) < 1e-6
    assert m["up_migrants_between"] == 1
