"""Planted-fixture pinning tests for the round-2c queries (pricing
audits, ABC/fiscal calendars, growth accounting, backtests, bot
detection, Simpson flips, ARI permutation invariance, tail
dependence, semivariogram ramps). Oracle parity runs in
tools/check_oracle.py; these pin the MATH on hand-computable
inputs."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


def _write_lineitem(d, rows):
    """rows: list of (orderkey, partkey, qty, extprice, disc, tax,
    retflag, shipdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)),
                                 pa.int64()),
        "l_quantity": pa.array([float(r[2]) for r in rows]),
        "l_extendedprice": pa.array([float(r[3]) for r in rows]),
        "l_discount": pa.array([float(r[4]) for r in rows]),
        "l_tax": pa.array([float(r[5]) for r in rows]),
        "l_returnflag": pa.array([r[6] for r in rows]),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array(np.array([r[7] for r in rows],
                                        dtype="datetime64[us]"),
                               pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def _write_orders(d, rows):
    """rows: list of (orderkey, custkey, totalprice, orderdate)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows)),
        "o_totalprice": pa.array([float(r[2]) for r in rows]),
        "o_orderdate": pa.array(np.array([r[3] for r in rows],
                                         dtype="datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * len(rows))}),
        os.path.join(d, "orders.parquet"))


# ---------------------------------------------------------------------------
# Exact-arithmetic audits
# ---------------------------------------------------------------------------

def test_unit_price_consistency_gcd_reduction(tmp_path):
    d = str(tmp_path / "sf")
    # part 1: 10.00/2 and 5.00/1 are the SAME reduced fraction
    # (consistent); part 2: 4.00/1 vs 5.00/1 differ (inconsistent)
    _write_lineitem(d, [
        (1, 1, 2, 10.00, 0.0, 0.0, "N", "1995-02-01"),
        (2, 1, 1, 5.00, 0.0, 0.0, "N", "1995-02-02"),
        (3, 2, 1, 4.00, 0.0, 0.0, "N", "1995-02-03"),
        (4, 2, 1, 5.00, 0.0, 0.0, "N", "1995-02-04")])
    out = q("unit_price_consistency")(d).iloc[0]
    assert out["n_parts"] == 2
    assert out["inconsistent_parts"] == 1
    assert out["max_prices_per_part"] == 2


def test_abc_classification_exact_cuts(tmp_path):
    d = str(tmp_path / "sf")
    # revenues 80 / 15 / 5: exclusive-prefix rule puts exactly one
    # part in each class
    _write_lineitem(d, [
        (1, 1, 1, 80.0, 0.0, 0.0, "N", "1995-02-01"),
        (2, 2, 1, 15.0, 0.0, 0.0, "N", "1995-02-02"),
        (3, 3, 1, 5.0, 0.0, 0.0, "N", "1995-02-03")])
    out = q("abc_part_classification")(d).set_index("abc")
    assert out.loc["A", "n_parts"] == 1
    assert out.loc["B", "n_parts"] == 1
    assert out.loc["C", "n_parts"] == 1
    assert out.loc["A", "revenue_cents"] == 8000


def test_fiscal_445_period_mapping(tmp_path):
    d = str(tmp_path / "sf")
    # day 0 = period 1; day 28 = period 2; day 56 = period 3 (the
    # 5-week one); day 91 = first day of quarter 2 = period 4
    _write_orders(d, [
        (1, 1, 10.0, "1995-01-01"),   # day 0
        (2, 1, 10.0, "1995-01-29"),   # day 28
        (3, 1, 10.0, "1995-02-26"),   # day 56
        (4, 1, 10.0, "1995-04-02")])  # day 91
    out = q("fiscal_445_revenue")(d)
    got = dict(zip(out["fiscal_period"], out["n_orders"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    assert (out["fiscal_year"] == 0).all()


def test_invoice_reconciliation_exact_and_drift(tmp_path):
    d = str(tmp_path / "sf")
    # order 1: header exactly equals the line formula; order 2:
    # header 2 cents higher than the lines
    line_total = 100.0 * (1 - 0.05) * (1 + 0.08)     # 102.60 exactly
    _write_lineitem(d, [
        (1, 1, 1, 100.0, 0.05, 0.08, "N", "1995-02-01"),
        (2, 2, 1, 100.0, 0.00, 0.00, "N", "1995-02-02")])
    _write_orders(d, [(1, 1, line_total, "1995-01-20"),
                      (2, 1, 100.05, "1995-01-21")])
    out = q("invoice_reconciliation_audit")(d).iloc[0]
    assert out["n_orders"] == 2
    assert out["exact_match"] == 1
    assert out["header_over"] == 1          # 2-cent gap keeps sign


def test_escalating_spend_monotone_and_tie(tmp_path):
    d = str(tmp_path / "sf")
    # cust 1: 10 < 20 < 30 monotone climber; cust 2: 10, 10 tie —
    # strict > means the tie loses both flags
    _write_orders(d, [
        (1, 1, 10.0, "1995-01-01"), (2, 1, 20.0, "1995-02-01"),
        (3, 1, 30.0, "1995-03-01"),
        (4, 2, 10.0, "1995-01-01"), (5, 2, 10.0, "1995-02-01")])
    out = q("escalating_spend_share")(d).iloc[0]
    assert out["n_multi_customers"] == 2
    assert out["last_is_max_n"] == 1
    assert out["monotone_n"] == 1


# ---------------------------------------------------------------------------
# Session / lifecycle ops
# ---------------------------------------------------------------------------

def test_timeout_calibration_splits(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T10:00:00", "us")
    ts = [base, base + np.timedelta64(600, "s")]   # 10-minute gap
    _write_events(d, ts, [1, 1], ["view", "view"])
    out = q("session_timeout_calibration")(d).set_index("timeout_s")
    assert out.loc[300, "n_sessions"] == 2
    assert out.loc[900, "n_sessions"] == 1
    assert out.loc[1800, "n_sessions"] == 1


def test_growth_accounting_identity_and_classes(tmp_path):
    d = str(tmp_path / "sf")
    day = np.datetime64("2024-01-01T12:00:00", "us")
    dd = np.timedelta64(86400, "s")
    ts, users = [], []
    # user 1: days 0,1,3 (retained on 1, resurrected on 3)
    for k in (0, 1, 3):
        ts.append(day + k * dd)
        users.append(1)
    # user 2: day 1 only (new on 1, churn counted on day 2)
    ts.append(day + 1 * dd)
    users.append(2)
    _write_events(d, ts, users, ["view"] * len(ts))
    out = q("growth_accounting_daily")(d).set_index("day")
    d0 = int(np.datetime64("2024-01-01").astype("datetime64[D]")
             .astype(np.int64))
    assert out.loc[d0, "new_u"] == 1
    assert out.loc[d0 + 1, "retained"] == 1
    assert out.loc[d0 + 1, "new_u"] == 1
    assert out.loc[d0 + 3, "resurrected"] == 1
    # identity: dau = new + retained + resurrected on every row
    assert (out["dau"] == out["new_u"] + out["retained"]
            + out["resurrected"]).all()


def test_conversion_by_depth_and_entry(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T10:00:00", "us")
    s = np.timedelta64(10, "s")
    # session A (user 1): view,click,purchase (depth 3, entry view)
    # session B (user 2): click (depth 1, entry click, no purchase)
    ts = [base, base + s, base + 2 * s, base]
    _write_events(d, ts, [1, 1, 1, 2],
                  ["view", "click", "purchase", "click"])
    dep = q("conversion_by_session_depth")(d).set_index("depth_band")
    assert dep.loc[3, "converted"] == 1
    assert dep.loc[1, "converted"] == 0
    ent = q("conversion_by_entry_type")(d).set_index("entry_type")
    assert ent.loc["view", "conversion"] == 1.0
    assert ent.loc["click", "conversion"] == 0.0


def test_error_hangover_exact_probabilities(tmp_path):
    d = str(tmp_path / "sf")
    day = np.datetime64("2024-01-01T12:00:00", "us")
    dd = np.timedelta64(86400, "s")
    ts, users, types = [], [], []
    # user 1: error day 0, returns day 1 -> p_after_error includes 1
    # user 2: error day 0, never returns
    # user 3: clean day 0, returns day 1
    for uid, t0, ret in ((1, "error", True), (2, "error", False),
                         (3, "view", True)):
        ts.append(day)
        users.append(uid)
        types.append(t0)
        if ret:
            ts.append(day + dd)
            users.append(uid)
            types.append("view")
    _write_events(d, ts, users, types)
    out = q("error_hangover_effect")(d).iloc[0]
    assert out["p_return_after_error"] == 0.5
    assert out["p_return_after_clean"] == 1.0
    assert out["risk_ratio"] == 0.5


def test_bot_detector_cron_vs_human(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-01T03:00:00", "us")
    ts, users = [], []
    # bot: 60 events, all at hour 3, one per day
    for k in range(60):
        ts.append(base + np.timedelta64(k * 86400, "s"))
        users.append(1)
    # human: 60 events spread across 12 hours with 10-min gaps
    hbase = np.datetime64("2024-01-01T08:00:00", "us")
    for k in range(60):
        ts.append(hbase + np.timedelta64(k * 600 + (k % 12) * 3600,
                                         "s"))
        users.append(2)
    _write_events(d, ts, users, ["view"] * len(ts))
    out = q("bot_user_detector")(d).iloc[0]
    assert out["n_users"] == 2
    assert out["flagged_users"] == 1
    assert out["flagged_events"] == 60


# ---------------------------------------------------------------------------
# Statistical shapes
# ---------------------------------------------------------------------------

def test_semivariogram_constant_and_ramp(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-01T06:00:00", "us")
    dd = np.timedelta64(86400, "s")
    # linear ramp: day k has k+1 events -> gamma(k) = k^2 / 2
    ts, users = [], []
    for day in range(10):
        for j in range(day + 1):
            ts.append(base + day * dd + np.timedelta64(j, "s"))
            users.append(j)
    _write_events(d, ts, users, ["view"] * len(ts))
    out = q("daily_semivariogram")(d).set_index("lag")
    for k in range(1, 8):
        assert out.loc[k, "gamma"] == k * k / 2


def test_tail_dependence_extremes(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-05", "us")
    ts, users, types = [], [], []
    # 20 users; user u has u views and u purchases -> the top decile
    # of both coincides exactly -> lambda_U = 1
    for u in range(1, 21):
        for k in range(u):
            ts.append(base + np.timedelta64(len(ts), "s"))
            users.append(u)
            types.append("view")
            ts.append(base + np.timedelta64(len(ts), "s"))
            users.append(u)
            types.append("purchase")
    _write_events(d, ts, users, types)
    out = q("tail_dependence_views_purchases")(d).iloc[0]
    assert out["lambda_u"] == 1.0


def test_gibrat_proportional_growth(tmp_path):
    d = str(tmp_path / "sf")
    pre = np.datetime64("2024-01-05", "us")
    post = np.datetime64("2024-01-25", "us")
    ts, users = [], []
    # each user has k events in BOTH halves -> ln y = ln x exactly
    for u, k in ((1, 2), (2, 3), (3, 5), (4, 8)):
        for j in range(k):
            ts.append(pre + np.timedelta64(j, "s"))
            users.append(u)
            ts.append(post + np.timedelta64(j, "s"))
            users.append(u)
    _write_events(d, ts, users, ["view"] * len(ts))
    out = q("gibrat_growth_test")(d).iloc[0]
    assert out["gibrat_slope"] == 1.0
    assert out["r2"] == 1.0


def test_self_excitation_even_spacing_zero_short(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-05", "us")
    # 100 events exactly 120 s apart -> zero sub-60s gaps, and the
    # hour-bucket seams must NOT invent one
    ts = [base + np.timedelta64(120 * k, "s") for k in range(100)]
    _write_events(d, ts, [1] * 100, ["view"] * 100)
    out = q("self_excitation_screen")(d).iloc[0]
    assert out["n_gaps"] == 99
    assert out["n_short"] == 0
    assert out["short_share"] == 0.0


def test_self_excitation_seam_gap_counted(tmp_path):
    d = str(tmp_path / "sf")
    # two events 30 s apart straddling an hour boundary: different
    # buckets, so only the seam reconstruction can count the gap
    ts = [np.datetime64("2024-01-05T09:59:45", "us"),
          np.datetime64("2024-01-05T10:00:15", "us")]
    _write_events(d, ts, [1, 2], ["view", "view"])
    out = q("self_excitation_screen")(d).iloc[0]
    assert out["n_gaps"] == 1
    assert out["n_short"] == 1


def test_simpson_flip_planted(tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    # brand A sells big qty at 0% discount, brand B small qty at 10%:
    # overall slope is NEGATIVE (brand mix), within-brand slope is
    # positive (each brand sells MORE when discounted)
    rows = []
    k = 1
    # explicit construction: (partkey, qty, discount)
    data = [(1, 50, 0.00), (1, 52, 0.01), (1, 51, 0.00), (1, 53, 0.01),
            (2, 5, 0.09), (2, 7, 0.10), (2, 6, 0.09), (2, 8, 0.10)]
    for pk, qty, disc in data:
        rows.append((k, pk, qty, 100.0, disc, 0.0, "N", "1995-02-01"))
        k += 1
    _write_lineitem(d, rows)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"]),
        "p_brand": pa.array(["BRAND#A", "BRAND#B"]),
        "p_type": pa.array(["t", "t"]),
        "p_size": pa.array([1, 1], pa.int64()),
        "p_retailprice": pa.array([1.0, 1.0])}),
        os.path.join(d, "part.parquet"))
    out = q("simpson_discount_qty_audit")(d).iloc[0]
    assert out["slope_within"] > 0
    assert out["slope_overall"] < 0
    assert out["sign_flip"] == 1


def test_forecast_backtest_periodic_series_dow_wins(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-01T12:00:00", "us")
    dd = np.timedelta64(86400, "s")
    ts, values = [], []
    # value cycles with period 7 -> dow-profile forecast is exact
    for day in range(28):
        ts.append(base + day * dd)
        values.append(float(10 + (day % 7)))
    _write_events(d, ts, [1] * len(ts), ["purchase"] * len(ts),
                  values)
    out = q("forecast_backtest_daily")(d).iloc[0]
    assert out["mae_dow_cents"] == 0.0
    assert out["winner"] == "dow_profile"


def test_arrival_js_zero_for_single_event_sessions(tmp_path):
    d = str(tmp_path / "sf")
    base = np.datetime64("2024-01-03T07:00:00", "us")
    # every session has exactly one event -> start clock == activity
    # clock -> JS divergence exactly 0
    ts = [base + np.timedelta64(k * 7200, "s") for k in range(12)]
    _write_events(d, ts, list(range(12)), ["view"] * 12)
    out = q("arrival_vs_activity_divergence")(d).iloc[0]
    assert out["js_divergence"] == 0.0
    assert out["n_events"] == out["n_sessions"]
