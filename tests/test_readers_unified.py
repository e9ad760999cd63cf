"""Schema-evolution union-by-name reads."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webalizer_ray.sources.readers import read_parquet_unified


def _write(d, name, table):
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, name))


def test_union_by_name_fills_nulls(ray_session, tmp_path):
    d = str(tmp_path / "store")
    _write(d, "a.parquet", pa.table({
        "id": pa.array([1, 2], pa.int64()), "v": pa.array([1.0, 2.0])}))
    _write(d, "b.parquet", pa.table({
        "id": pa.array([3], pa.int64()), "v": pa.array([3.0]),
        "tag": pa.array(["x"])}))
    out = read_parquet_unified(d).to_pandas() \
        .sort_values("id", ignore_index=True)
    assert list(sorted(out.columns)) == ["id", "tag", "v"]
    assert out["tag"].tolist()[:2] == [None, None]
    assert out["tag"].iloc[2] == "x"
    assert len(out) == 3


def test_type_promotion_int_to_float(ray_session, tmp_path):
    d = str(tmp_path / "promote")
    _write(d, "a.parquet", pa.table({"id": pa.array([1], pa.int32()),
                                     "v": pa.array([2], pa.int64())}))
    _write(d, "b.parquet", pa.table({"id": pa.array([2], pa.int64()),
                                     "v": pa.array([0.5], pa.float64())}))
    out = read_parquet_unified(d).to_pandas() \
        .sort_values("id", ignore_index=True)
    assert out["id"].dtype == np.int64
    assert out["v"].dtype == np.float64
    assert out["v"].tolist() == [2.0, 0.5]


def test_incompatible_types_fail_at_plan_build(ray_session, tmp_path):
    d = str(tmp_path / "bad")
    _write(d, "a.parquet", pa.table({"id": pa.array([1], pa.int64()),
                                     "v": pa.array(["s"])}))
    _write(d, "b.parquet", pa.table({"id": pa.array([2], pa.int64()),
                                     "v": pa.array([1.5])}))
    with pytest.raises(Exception):
        read_parquet_unified(d)


def test_single_schema_passthrough(ray_session, tmp_path):
    d = str(tmp_path / "same")
    for i in range(3):
        _write(d, f"f{i}.parquet",
               pa.table({"id": pa.array([i], pa.int64())}))
    out = read_parquet_unified(d).to_pandas()
    assert sorted(out["id"].tolist()) == [0, 1, 2]


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_parquet_unified(str(tmp_path / "nothing_here"))


def test_shard_balance_report(tmp_path):
    from webalizer_ray.sources.readers import shard_balance_report

    d = str(tmp_path / "shards")
    # 9 small shards + 1 giant one: straggler factor ~5.3
    sizes = [100] * 9 + [900]
    for i, n in enumerate(sizes):
        _write(d, f"f{i}.parquet",
               pa.table({"x": pa.array(np.arange(n, dtype=np.int64))}))
    r = shard_balance_report(d)
    assert r["files"].iloc[0] == 10
    assert r["total_rows"].iloc[0] == sum(sizes)
    assert abs(r["straggler_factor"].iloc[0] - 900 / 180) < 1e-6
    assert r["top_decile_row_share"].iloc[0] == 0.5

    # perfectly balanced: factor 1, cv 0
    d2 = str(tmp_path / "flat")
    for i in range(4):
        _write(d2, f"f{i}.parquet",
               pa.table({"x": pa.array(np.arange(50, dtype=np.int64))}))
    r2 = shard_balance_report(d2)
    assert r2["straggler_factor"].iloc[0] == 1.0
    assert r2["rows_cv"].iloc[0] == 0.0
