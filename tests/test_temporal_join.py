"""temporal_join (SCD2): boundary inclusivity (from inclusive, to
exclusive), validity gaps resolve to NO match (not the stale previous
generation), open-ended NaT intervals, left-vs-inner, and keys absent
from the dimension."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.stages.join import temporal_join


def _ts(s: str):
    return np.datetime64(s, "us")


@pytest.fixture()
def sides():
    # key 1: two generations with a GAP 2020-03..2020-06, then open-ended
    #   [2020-01, 2020-03) seg=10 ; [2020-06, NaT) seg=11
    # key 2: one closed generation [2020-01, 2021-01) seg=20
    # key 3: facts only (no dim rows)
    dim = pd.DataFrame({
        "k": [1, 1, 2],
        "valid_from": [_ts("2020-01-01"), _ts("2020-06-01"),
                       _ts("2020-01-01")],
        "valid_to": [_ts("2020-03-01"), np.datetime64("NaT"),
                     _ts("2021-01-01")],
        "seg": [10, 11, 20],
    })
    facts = pd.DataFrame({
        "k":  [1, 1, 1, 1, 1, 2, 2, 3],
        "ts": [_ts("2020-01-01"),              # == from: inclusive -> 10
               _ts("2020-02-15"),              # inside gen0 -> 10
               _ts("2020-03-01"),              # == to: EXCLUSIVE, in gap
               _ts("2020-04-10"),              # gap -> no match
               _ts("2021-12-31"),              # open-ended -> 11
               _ts("2020-12-31 23:59:59"),     # inside -> 20
               _ts("2021-01-01"),              # past to -> no match
               _ts("2020-05-05")],             # key not in dim
        "fid": np.arange(8, dtype=np.int64),
    })
    return facts, dim


def _run(facts, dim, how):
    out = temporal_join(
        rd.from_pandas(facts), rd.from_pandas(dim), key="k",
        ts_col="ts", how=how, num_buckets=4).to_pandas()
    return out.sort_values("fid", ignore_index=True)


def test_inner_semantics(ray_session, sides):
    facts, dim = sides
    out = _run(facts, dim, "inner")
    assert out["fid"].tolist() == [0, 1, 4, 5]
    assert out["seg"].tolist() == [10, 10, 11, 20]


def test_left_keeps_unmatched_with_null_dim(ray_session, sides):
    facts, dim = sides
    out = _run(facts, dim, "left")
    assert out["fid"].tolist() == list(range(8))
    seg = out["seg"]
    assert seg[[0, 1, 4, 5]].tolist() == [10, 10, 11, 20]
    assert seg[[2, 3, 6, 7]].isna().all()


def test_shared_nonkey_column_rejected(ray_session, sides):
    facts, dim = sides
    dim2 = dim.rename(columns={"seg": "fid"})
    with pytest.raises(Exception, match="share ONLY the key"):
        temporal_join(rd.from_pandas(facts), rd.from_pandas(dim2),
                      key="k", ts_col="ts").to_pandas()
