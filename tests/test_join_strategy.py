"""auto_join: broadcast and shuffle strategies must produce identical
rows; the strategy switches on build-side size."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture()
def sides():
    rng = np.random.default_rng(9)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 500).astype(np.int64),
        "x": rng.normal(size=500).round(4)})
    right = pd.DataFrame({
        "rk": np.arange(0, 35, dtype=np.int64),   # keys 35..39 unmatched
        "tag": [f"t{i}" for i in range(35)]})
    return left, right


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_broadcast_equals_shuffle(ray_session, sides):
    from webalizer_ray.stages.join import auto_join

    left, right = sides
    l_ds = rd.from_pandas(left).repartition(5)
    r_ds = rd.from_pandas(right).repartition(3)
    bc = auto_join(l_ds, r_ds, on="k", right_on="rk",
                   broadcast_limit=10_000).to_pandas()
    sh = auto_join(l_ds, r_ds, on="k", right_on="rk",
                   broadcast_limit=0).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk") \
        .drop(columns=["rk"])
    pd.testing.assert_frame_equal(canon(bc), canon(want))
    pd.testing.assert_frame_equal(canon(sh), canon(want))
    # inner semantics: unmatched left keys drop
    assert set(bc["k"]) <= set(right["rk"])


def test_bucketed_storage_join_matches_shuffle_join(ray_session,
                                                    tmp_path):
    """Write both sides bucketed by key hash, join per bucket with zero
    shuffle — identical rows to the ordinary join (key-hash bucketing
    is value-based, so differing column names co-bucket)."""
    from webalizer_ray.stages.join import bucketed_join, write_bucketed

    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    lo = write_bucketed(orders, "o_custkey", str(tmp_path / "o"),
                        num_buckets=8)
    lc = write_bucketed(cust, "c_custkey", str(tmp_path / "c"),
                        num_buckets=8)
    j = bucketed_join(lo, lc, on="o_custkey", right_on="c_custkey",
                      num_buckets=8).to_pandas()
    want = orders.to_pandas().merge(
        cust.to_pandas(), left_on="o_custkey",
        right_on="c_custkey").drop(columns=["c_custkey"])
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"]
    a = j[cols].sort_values(cols, ignore_index=True)
    b = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_skew_join_equals_plain_join_on_zipf(ray_session):
    """Planted hot key (60% of probe rows): the salted join must emit
    exactly the plain shuffle join's multiset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.join import skew_join

    rng = np.random.default_rng(9)
    n = 5000
    keys = np.where(rng.random(n) < 0.6, 7,
                    rng.integers(0, 50, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys,
                         "rid": np.arange(n, dtype=np.int64),
                         "x": rng.normal(size=n).round(4)})
    right = pd.DataFrame({"rk": np.arange(50, dtype=np.int64),
                          "y": np.arange(50, dtype=np.float64) * 2})

    salted = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="k", right_on="rk", salt_src="rid",
                       num_salts=4).to_pandas()
    plain = rd.from_pandas(left).join(
        rd.from_pandas(right), join_type="inner", num_partitions=4,
        on=("k",), right_on=("rk",)).to_pandas()
    cols = sorted(plain.columns)
    a = salted[cols].sort_values(cols, ignore_index=True)
    b = plain[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert len(a) == n  # every probe row matched exactly once


def test_skew_join_no_hot_keys_degenerates_cleanly(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.join import skew_join

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64) % 50,
                         "rid": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "y": np.ones(50)})
    out = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", salt_src="rid", hot_threshold=0.5).to_pandas()
    assert len(out) == 100
