"""footer_aggregate: footer-only COUNT/MIN/MAX correctness, the
corrupted-data-pages proof that no data bytes are read, the
missing-statistics scan fallback, multi-file combine, and null edges."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webalizer_ray.sources.readers import footer_aggregate

SF = "/root/testdata/sf0.001"


def test_matches_direct_scan(ray_session):
    got = footer_aggregate(f"{SF}/events.parquet", ["value", "user_id"])
    ref = pd.read_parquet(f"{SF}/events.parquet",
                          columns=["value", "user_id"])
    assert got["n_rows"][0] == len(ref)
    assert got["value_min"][0] == ref["value"].min()
    assert got["value_max"][0] == ref["value"].max()
    assert got["user_id_min"][0] == ref["user_id"].min()
    assert got["user_id_max"][0] == ref["user_id"].max()


def test_no_data_pages_read_corruption_proof(ray_session, tmp_path):
    """Zero out every data page byte range (footer left intact): the
    footer path still answers exactly while a real scan raises — proof
    the aggregate never touches row data."""
    src = pd.DataFrame({"x": np.arange(1000, dtype=np.int64),
                        "y": np.random.default_rng(7).normal(size=1000)})
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(src), p, row_group_size=100)

    md = pq.ParquetFile(p).metadata
    spans = []
    for g in range(md.num_row_groups):
        for i in range(md.row_group(g).num_columns):
            col = md.row_group(g).column(i)
            off = col.dictionary_page_offset
            start = off if off is not None else col.data_page_offset
            spans.append((start, col.total_compressed_size))
    with open(p, "r+b") as f:
        for start, size in spans:
            f.seek(start)
            f.write(b"\x00" * size)

    with pytest.raises(Exception):
        pq.read_table(p)
    got = footer_aggregate(p, ["x", "y"])
    assert got["n_rows"][0] == 1000
    assert got["x_min"][0] == 0 and got["x_max"][0] == 999
    assert got["y_min"][0] == src["y"].min()
    assert got["y_max"][0] == src["y"].max()


def test_missing_stats_falls_back_to_scan(ray_session, tmp_path):
    p = str(tmp_path / "nostats.parquet")
    t = pa.table({"x": pa.array([5, -3, 9, 2], pa.int64())})
    pq.write_table(t, p, write_statistics=False)
    got = footer_aggregate(p, ["x"])
    assert got["n_rows"][0] == 4
    assert got["x_min"][0] == -3 and got["x_max"][0] == 9


def test_multi_file_combine_and_all_null(ray_session, tmp_path):
    d = tmp_path / "store"
    os.makedirs(d)
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64()),
                             "z": pa.array([None, None], pa.float64())}),
                   str(d / "a.parquet"))
    pq.write_table(pa.table({"x": pa.array([-7, 4], pa.int64()),
                             "z": pa.array([None, None], pa.float64())}),
                   str(d / "b.parquet"))
    got = footer_aggregate(str(d), ["x", "z"])
    assert got["n_rows"][0] == 4
    assert got["x_min"][0] == -7 and got["x_max"][0] == 4
    assert got["z_min"][0] is None and got["z_max"][0] is None
