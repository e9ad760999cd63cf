"""Edge-input probes for the full pipeline: empty table, all-malformed
text, zero session timeout. These exercise the paths a crash would hide
in (finalize over empty long partials, missing _meta keys, metrics count
fallbacks)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webalizer_ray import fixtures
from webalizer_ray.config import PipelineConfig
from webalizer_ray.sources.rawlog import TURN_SCHEMA

CFG = PipelineConfig(num_buckets=4)


def _empty_turns_dir(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d + "/turns")
    pq.write_table(
        pa.table({n: pa.array([], f.type)
                  for n, f in zip(TURN_SCHEMA.names, TURN_SCHEMA)}),
        d + "/turns/t.parquet")
    fixtures.write_lookups(d)
    return d


def test_empty_turns_table(ray_session, tmp_path):
    from webalizer_ray.pipelines.flagship import run_flagship
    d = _empty_turns_dir(tmp_path)
    r = run_flagship(d, str(tmp_path / "out"), CFG, use_actors=False)
    m = r["metrics"]
    # conservation on zero rows — and total_rec must NOT fall through to
    # counting the lookup parquet files (regression)
    assert m["total_rec"] == 0
    assert m == {**m, "bad": 0, "parsed": 0, "ignored": 0,
                 "sessions": 0, "convs": 0}


def test_all_malformed_rows_route_bad(ray_session, tmp_path):
    from webalizer_ray.pipelines.flagship import run_flagship
    d = str(tmp_path / "in")
    os.makedirs(d + "/turns")
    tbl = pa.table({
        "conv_id": ["c1", "c2"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"],
        "text": ["garbage", "also garbage"],
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 2,
                       pa.timestamp("us"))})
    pq.write_table(tbl, d + "/turns/t.parquet")
    fixtures.write_lookups(d)
    r = run_flagship(d, str(tmp_path / "out"), CFG, use_actors=False)
    m = r["metrics"]
    assert m["total_rec"] == 2 and m["bad"] == 2 and m["parsed"] == 0
    assert len(r["sinks"]["monthly"]) == 0


@pytest.mark.parametrize("timeout_s,expect", [(0, "per_turn"),
                                              (10**9, "per_conv")])
def test_session_timeout_extremes(ray_session, tiny_fixture, tmp_path,
                                  timeout_s, expect):
    """timeout 0 → every turn is its own session (gap >= 0 always);
    huge timeout → one session per conv per month."""
    from webalizer_ray.pipelines.flagship import run_flagship
    cfg = PipelineConfig(num_buckets=4, session_timeout_s=timeout_s)
    r = run_flagship(tiny_fixture, str(tmp_path / f"o{timeout_s}"), cfg,
                     use_actors=False)
    m = r["metrics"]
    if expect == "per_turn":
        assert m["sessions"] == m["parsed"]
    else:
        sess = r["sinks"]["sessions"]
        per_conv_months = sess.groupby(["conv_id", "month"]).size()
        assert (per_conv_months == 1).all()


def test_profile_and_validate_on_empty_table(ray_session, tmp_path):
    """CLI-reachable diagnostics must handle an empty input table:
    profile returns zeroed stats, validation reports zero violations
    for every rule (empty data violates nothing)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from webalizer_ray.stages.aggregate import key_skew_profile
    from webalizer_ray.stages.textstats import validate_rules

    p = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({
        "k": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64())}), p)
    ds = rd.read_parquet(p)
    prof = key_skew_profile(rd.read_parquet(p, columns=["k"]), "k")
    assert prof == {"distinct_keys": 0, "total_rows": 0, "max_n": 0,
                    "max_share": 0.0, "entropy": 0.0, "gini": 0.0}
    out = validate_rules(ds, {"k": {"not_null": True, "unique": True},
                              "v": {"min": 0.0}})
    assert (out["violations"] == 0).all() and len(out) == 3
    del os
