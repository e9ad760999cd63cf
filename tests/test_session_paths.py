"""Session path mining: planted journeys + oracle parity."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(d, ts_list, users, types):
    os.makedirs(d, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(ts_list, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(np.array(users, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n)}),
        os.path.join(d, "events.parquet"))


def test_planted_session_paths(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # user 1: a,b,c,d within one session (path truncates to first 3),
    # then a 2h gap -> new session "e"; user 2: lone "e".
    ts = [t0, t0 + 10 * s, t0 + 20 * s, t0 + 30 * s,
          t0 + 7200 * s, t0]
    users = [1, 1, 1, 1, 1, 2]
    types = ["a", "b", "c", "d", "e", "e"]
    d = str(tmp_path / "planted")
    _write_events(d, ts, users, types)

    out = REGISTRY["top_session_paths"][0](d)
    got = dict(zip(out["path"], out["sessions"]))
    assert got == {"a>b>c": 1, "e": 2}


def test_exact_timeout_gap_splits_path(ray_session, tmp_path):
    """gap == exactly 1800 s must START a new session (W1 boundary)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0, t0 + 1800 * s]
    d = str(tmp_path / "boundary")
    _write_events(d, ts, [5, 5], ["x", "y"])
    out = REGISTRY["top_session_paths"][0](d)
    got = dict(zip(out["path"], out["sessions"]))
    assert got == {"x": 1, "y": 1}


def test_paths_match_oracle(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY["top_session_paths"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    ours, ref = fn(SF), con.sql(sql).df()
    assert ours["path"].tolist() == ref["path"].tolist()
    assert ours["sessions"].tolist() == ref["sessions"].tolist()
