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
