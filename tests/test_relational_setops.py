"""Relational-completeness ops vs DuckDB at sf0.001: LEFT/FULL OUTER
joins (with real null paths), INTERSECT/EXCEPT set ops, deterministic
Bernoulli and per-group sampling."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_OPS = ["urgent_orders_per_customer", "nation_presence",
           "purchase_week_user_setops", "sampled_docs",
           "docs_per_lang_sample"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["customer", "supplier", "orders", "events", "documents"]:
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
        a, b = ours[c].to_numpy(), ref[c].to_numpy()
        assert (a == b).all(), c


def test_left_outer_null_path_is_real(ray_session):
    """Customers with zero urgent orders must appear with n_urgent=0 —
    the null-filled LEFT OUTER rows, not dropped inner-join rows."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["urgent_orders_per_customer"][0](SF)
    zero = out.loc[out["n_urgent"] == 0, "customers"].sum()
    assert zero > 0
    # totals conserve: every customer lands in exactly one bucket
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert out["customers"].sum() == n_cust


def test_full_outer_both_null_directions(ray_session):
    """sf0.001 has supplier-only AND customer-only nations, so both
    outer directions must be exercised (zero-filled, not dropped)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["nation_presence"][0](SF)
    assert (out["suppliers"] == 0).any()
    assert (out["customers"] == 0).any()
    assert ((out["suppliers"] > 0) | (out["customers"] > 0)).all()


def test_setops_partition_users(ray_session):
    """intersect/except_a/except_b partition the union of both sides:
    no user appears under two ops."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["purchase_week_user_setops"][0](SF)
    assert out["user_id"].is_unique
    assert set(out["op"]).issubset({"intersect", "except_a", "except_b"})


def test_sampling_deterministic_and_blocksize_invariant(ray_session):
    """The Bernoulli sample must be identical across runs, and the
    per-group sample must not depend on block layout (mergeable
    hash-min top-k)."""
    import ray.data as rd
    import numpy as np
    from webalizer_ray.pipelines.queries import REGISTRY
    from webalizer_ray.stages import scan

    a = REGISTRY["sampled_docs"][0](SF)
    b = REGISTRY["sampled_docs"][0](SF)
    pd.testing.assert_frame_equal(a, b)
    # p=1/4 within loose tolerance on 500 docs
    assert 0.15 < len(a) / 500 < 0.35

    g = REGISTRY["docs_per_lang_sample"][0](SF)
    assert (g.groupby("lang").size() <= 5).all()
    # independent single-batch reference: same hash, pandas nsmallest
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "doc_id"]).to_pandas()
    h = (docs["doc_id"].to_numpy(np.uint64) * np.uint64(scan._KNUTH)) \
        % np.uint64(1 << 32)
    docs = docs.assign(h=h.astype(np.int64))
    want = (docs.sort_values(["h", "doc_id"], kind="mergesort")
            .groupby("lang", sort=False).head(5))[["lang", "doc_id"]]
    want = want.sort_values(["lang", "doc_id"], ignore_index=True)
    pd.testing.assert_frame_equal(g, want)


def test_skew_profile_properties(ray_session):
    """Entropy <= ln(k), gini in [0,1), shares consistent."""
    from webalizer_ray.pipelines.queries import REGISTRY
    import numpy as np

    out = REGISTRY["user_key_skew"][0](SF).iloc[0]
    k = out["distinct_keys"]
    assert 0 < out["entropy"] <= np.log(k) + 1e-9
    assert 0 <= out["gini"] < 1
    assert 0 < out["max_share"] <= 1
    assert out["max_n"] >= 1


def test_mad_outliers_bounded(ray_session):
    """Outlier counts are strictly less than group sizes (MAD never
    flags the whole group) and medians are within the value range."""
    from webalizer_ray.pipelines.queries import REGISTRY
    import duckdb

    out = REGISTRY["value_outliers_mad"][0](SF)
    sizes = duckdb.sql(
        f"SELECT event_type, count(*) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1").df()
    m = out.merge(sizes, on="event_type")
    assert (m["outliers"] < m["n"]).all()
    assert (m["mad"] >= 0).all()


def test_cube_internal_consistency(ray_session):
    """CUBE lattice: grand total equals each marginal's sum; marginals
    match the base cells."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["events_cube"][0](SF)
    base = out[(out["hour"] != -1) & (out["event_type"] != "ALL")]
    by_h = out[(out["hour"] != -1) & (out["event_type"] == "ALL")]
    by_t = out[(out["hour"] == -1) & (out["event_type"] != "ALL")]
    grand = out[(out["hour"] == -1) & (out["event_type"] == "ALL")]
    assert len(grand) == 1
    g = grand["hits"].iloc[0]
    assert base["hits"].sum() == by_h["hits"].sum() \
        == by_t["hits"].sum() == g
    m = base.groupby("hour")["hits"].sum().reset_index() \
        .merge(by_h[["hour", "hits"]], on="hour")
    assert (m["hits_x"] == m["hits_y"]).all()


def test_validate_rules_catches_planted_violations(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.textstats import validate_rules

    df = pd.DataFrame({
        "event_id": np.array([1, 2, 2, 3, 4, 4, 4], dtype=np.int64),
        "user_id": pd.array([1, None, 3, None, 5, 6, 7],
                            dtype="Int64"),
        "value": [-5.0, 0.0, 10.0, 2000.0, 3000.0, 1.0, 1.0],
        "event_type": ["click", "BAD!", "view", "x9", "ok", "ok", "ok"]})
    out = validate_rules(rd.from_pandas(df).repartition(3), {
        "event_id": {"unique": True},
        "user_id": {"not_null": True},
        "value": {"min": 0, "max": 1000},
        "event_type": {"regex": r"^[a-z]+$"},
    })
    got = {(c, r): v for c, r, v in
           zip(out["column"], out["rule"], out["violations"])}
    assert got == {("event_id", "unique"): 3,   # 2x2 + 4x3 -> 7-4 dups
                   ("user_id", "not_null"): 2,
                   ("value", "min"): 1,
                   ("value", "max"): 2,
                   ("event_type", "regex"): 2}


def test_fk_validation_catches_planted_orphans(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    import os
    os.makedirs(d)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(6, dtype=np.int64)),
        "o_custkey": pa.array([1, 1, 2, 99, 3, 77], pa.int64())}),
        os.path.join(d, "orders.parquet"))
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["validate_fk_orders"][0](d).iloc[0]
    assert out["orphan_orders"] == 2 and out["total_orders"] == 6


def test_psi_drift_properties(ray_session, tmp_path):
    """PSI is ~0 for identical halves and large for a planted shift."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    n = 4000
    # identical distribution in both halves
    ts_a = np.datetime64("2024-01-05", "us") + rng.integers(
        0, 86_400_000_000, n // 2).astype("timedelta64[us]")
    ts_b = np.datetime64("2024-01-25", "us") + rng.integers(
        0, 86_400_000_000, n // 2).astype("timedelta64[us]")
    same = np.concatenate([rng.normal(100, 20, n // 2),
                           rng.normal(100, 20, n // 2)])
    shifted = np.concatenate([rng.normal(100, 20, n // 2),
                              rng.normal(300, 20, n // 2)])
    from webalizer_ray.pipelines.queries import REGISTRY

    for name, vals, bound in [("same", same, 0.05),
                              ("shift", shifted, None)]:
        d = str(tmp_path / name)
        import os
        os.makedirs(d)
        pq.write_table(pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.concatenate([ts_a, ts_b]),
                           pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(np.abs(vals)),
            "props": pa.array(["{}"] * n)}),
            os.path.join(d, "events.parquet"))
        psi = REGISTRY["value_drift_psi"][0](d)["psi"].iloc[0]
        if bound is not None:
            assert psi < bound
        else:
            assert psi > 1.0     # gross shift -> large PSI
