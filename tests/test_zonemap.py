"""Zone-map skipping index: real pruning (pruned files deleted from
disk, result unchanged), unknown-file safety (never pruned), stale-
index detection, and string-column support."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages.zonemap import (
    build_zonemap,
    pruned_files,
    pruned_scan,
)


@pytest.fixture()
def table(ray_session, tmp_path):
    """4 files with disjoint value ranges 0-9 / 10-19 / 20-29 / 30-39."""
    d = tmp_path / "data"
    os.makedirs(d)
    for i in range(4):
        pd.DataFrame({
            "v": np.arange(i * 10, i * 10 + 10, dtype=np.int64),
            "s": [f"row{j}" for j in range(10)],
        }).to_parquet(d / f"f{i}.parquet", index=False)
    zm = str(tmp_path / "zm.parquet")
    build_zonemap(str(d), ["v", "s"], zm)
    return str(d), zm


def test_prunes_nonoverlapping_files(table):
    d, zm = table
    paths, n_pruned = pruned_files(d, zm, "v", 12, 25)
    assert n_pruned == 2
    assert sorted(os.path.basename(p) for p in paths) == \
        ["f1.parquet", "f2.parquet"]


def test_pruning_is_real_deleted_pruned_files(table):
    d, zm = table
    before = pruned_scan(d, zm, "v", 12, 25).to_pandas() \
        .sort_values("v", ignore_index=True)
    os.remove(os.path.join(d, "f0.parquet"))
    os.remove(os.path.join(d, "f3.parquet"))
    with pytest.raises(FileNotFoundError, match="rebuild"):
        pruned_files(d, zm, "v", 0, 5)  # stale: mapped file vanished
    # but a range that never touches the vanished files... still needs
    # the index consistent — rebuild and verify the same answer
    build_zonemap(d, ["v", "s"], zm)
    after = pruned_scan(d, zm, "v", 12, 25).to_pandas() \
        .sort_values("v", ignore_index=True)
    pd.testing.assert_frame_equal(before, after)
    assert after["v"].tolist() == list(range(12, 26))


def test_unknown_new_file_is_always_scanned(table):
    d, zm = table
    pd.DataFrame({"v": np.array([15], np.int64), "s": ["late"]}) \
        .to_parquet(os.path.join(d, "late.parquet"), index=False)
    paths, _ = pruned_files(d, zm, "v", 30, 35)  # range misses 15
    assert "late.parquet" in {os.path.basename(p) for p in paths}
    got = pruned_scan(d, zm, "v", 14, 16).to_pandas()
    assert "late" in set(got["s"])  # and its rows are found


def test_string_column_zonemap(table):
    d, zm = table
    paths, n_pruned = pruned_files(d, zm, "s", "row0", "row9")
    assert n_pruned == 0  # every file spans row0..row9
    paths, n_pruned = pruned_files(d, zm, "s", "z", "zz")
    assert n_pruned == 4 and paths == []
