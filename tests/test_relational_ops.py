"""New relational operators vs DuckDB at sf0.001: grouped top-N, pivot,
rollup, anti-join, window functions, as-of join, band join — plus the
SQL-ROUND parity helper the quality oracle depends on."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_OPS = ["top_users_per_type", "hour_type_pivot", "events_rollup",
           "users_no_purchase", "user_running_value", "asof_last_view_gap",
           "orders_nearby_7d", "quality_docs"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["orders", "customer", "events", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", NEW_OPS)
def test_matches_oracle(ray_session, oracle_con, name):
    from webalizer_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY[name]
    ours, ref = canon(fn(SF)), canon(oracle_con.sql(sql).df())
    assert len(ours) == len(ref)
    assert list(ours.columns) == list(ref.columns)
    for c in ours.columns:
        a, b = ours[c], ref[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # exact — both sides round identically before comparison
            assert (a.astype(float).to_numpy()
                    == b.astype(float).to_numpy()).all(), c
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), c


def test_round_half_away_matches_sql_round():
    from webalizer_ray.stages.textstats import round_half_away

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.random(5000),
                           np.arange(5000) / 16384.0,   # dyadic halves
                           np.arange(5000) * 0.00005])  # exact 4-dp halves
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    ref = con.sql("SELECT ROUND(x, 4) AS r FROM t").df()["r"].to_numpy()
    assert (round_half_away(vals, 4) == ref).all()


def test_band_join_zero_match_orders_kept(ray_session):
    """LEFT-join semantics: every order appears, even with 0 neighbors."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["orders_nearby_7d"][0](SF)
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert len(out) == n_orders
    assert (out["nearby"] >= 0).all()


def test_asof_gap_nonnegative_or_sentinel(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["asof_last_view_gap"][0](SF)
    assert ((out["gap_us"] >= 0) | (out["gap_us"] == -1)).all()
    n_purch = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet') "
        "WHERE event_type = 'purchase'").fetchone()[0]
    assert len(out) == n_purch
