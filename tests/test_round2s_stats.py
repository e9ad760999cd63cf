"""Planted-fixture pinning tests for the round-2s batches (RDD
validity checks, Bayesian decision layer). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on tiny inputs.
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


def _write_customer_bal(d, rows):
    """rows: (custkey, acctbal, mktsegment)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"c{r[0]}" for r in rows]),
        "c_nationkey": pa.array([0] * len(rows), pa.int32()),
        "c_acctbal": pa.array([float(r[1]) for r in rows]),
        "c_mktsegment": pa.array([r[2] for r in rows])}),
        os.path.join(d, "customer.parquet"))


def test_mccrary_hand_window(tmp_path):
    d = str(tmp_path / "sf")
    _write_customer_bal(d, [(1, 100.0, "A"), (2, 200.0, "A"),
                            (3, 300.0, "B"), (4, -100.0, "A"),
                            (5, 1000.0, "A"), (6, -800.0, "B")])
    r = q("mccrary_density_acctbal")(d).iloc[0]
    # window [-500,500): 3 above, 1 below; z = 2/2 = 1
    assert r["n_above"] == 3 and r["n_below"] == 1
    assert abs(r["density_ratio"] - 3.0) < 1e-9
    assert abs(r["z"] - 1.0) < 1e-6
    assert r["manipulation_flag"] == 0


def test_rdd_balance_hand_chi2(tmp_path):
    d = str(tmp_path / "sf")
    _write_customer_bal(d, [(1, 100.0, "A"), (2, 200.0, "A"),
                            (3, 300.0, "B"), (4, -100.0, "A"),
                            (5, 1000.0, "A"), (6, -800.0, "B")])
    r = q("rdd_covariate_balance_acctbal")(d).iloc[0]
    # 2x2 window table A:(2,1) B:(1,0): chi2 = 4/9
    assert r["n_segments"] == 2
    assert abs(r["chi2"] - 4 / 9) < 1e-5
    # the even-df tail form is PINNED (df=4 in production);
    # both engines share it verbatim at any k
    x = 4 / 9
    assert abs(r["p_exact"] - np.exp(-x / 2) * (1 + x / 2)) \
        < 1e-5
    assert r["balanced"] == 1


def test_bayes_decision_symmetric(tmp_path):
    d = str(tmp_path / "sf")
    # Sun: 1 purchase + 1 view; Mon: 1 purchase + 1 view:
    # identical Beta(2,2) posteriors -> mu = 0
    _write_events(d, ["1995-01-01T10:00:00", "1995-01-01T11:00:00",
                      "1995-01-02T10:00:00", "1995-01-02T11:00:00"],
                  [0, 1, 2, 3],
                  ["purchase", "view", "purchase", "view"])
    r = q("bayes_expected_loss_weekend")(d).iloc[0]
    assert abs(r["mean_diff"] - 0.0) < 1e-9
    # both regrets equal sd*phi(0)
    sd = r["sd_diff"]
    exp = sd * 0.39894228040143267
    assert abs(r["el_choose_weekend"] - exp) < 1e-5
    assert abs(r["el_choose_weekday"] - exp) < 1e-5
    assert abs(r["identity_residual"] - 0.0) < 1e-9
    v = q("bayes_rope_weekend")(d).iloc[0]
    assert abs(v["mean_diff"] - 0.0) < 1e-9
    # sd ~ .27 dwarfs the .005 ROPE: everything is undecided
    assert v["verdict"] == "undecided"
    assert v["p_rope"] < 0.05
