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


# ---------------------------------------------------------------------------
# persisted per-file Bloom point-lookup index
# ---------------------------------------------------------------------------

@pytest.fixture()
def bloom_table(ray_session, tmp_path):
    """4 files with disjoint key sets {0..9} {10..19} {20..29} {30..39}."""
    from webalizer_ray.stages.zonemap import build_bloom_index

    d = tmp_path / "bdata"
    os.makedirs(d)
    for i in range(4):
        pd.DataFrame({
            "k": np.arange(i * 10, i * 10 + 10, dtype=np.int64),
            "v": np.arange(10, dtype=np.int64),
        }).to_parquet(d / f"b{i}.parquet", index=False)
    idx = str(tmp_path / "bloom.parquet")
    build_bloom_index(str(d), "k", idx)
    return str(d), idx


def test_bloom_no_false_negatives_and_prunes(bloom_table):
    from webalizer_ray.stages.zonemap import bloom_candidate_files

    d, idx = bloom_table
    for key in [0, 15, 27, 39]:
        paths, n_pruned = bloom_candidate_files(d, idx, np.int64(key))
        expect = f"b{key // 10}.parquet"
        assert expect in {os.path.basename(p) for p in paths}
        assert n_pruned >= 1  # at least one file ruled out


def test_bloom_pruning_real_deleted_noncandidates(bloom_table):
    from webalizer_ray.stages.zonemap import (bloom_candidate_files,
                                              bloom_point_scan)

    d, idx = bloom_table
    key = np.int64(15)
    before = bloom_point_scan(d, idx, "k", key).to_pandas()
    keep = {os.path.basename(p)
            for p in bloom_candidate_files(d, idx, key)[0]}
    removed = 0
    for f in os.listdir(d):
        if f.endswith(".parquet") and f not in keep:
            os.remove(os.path.join(d, f))
            removed += 1
    assert removed > 0
    # index now references vanished files -> stale detection fires
    with pytest.raises(FileNotFoundError, match="rebuild"):
        bloom_candidate_files(d, idx, np.int64(0))
    # rebuilt index over the survivors answers identically for our key
    from webalizer_ray.stages.zonemap import build_bloom_index
    build_bloom_index(d, "k", idx)
    after = bloom_point_scan(d, idx, "k", key).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values("v", ignore_index=True),
        after.sort_values("v", ignore_index=True))
    assert after["k"].tolist() == [15]


def test_bloom_unknown_file_always_candidate(bloom_table):
    from webalizer_ray.stages.zonemap import bloom_candidate_files

    d, idx = bloom_table
    pd.DataFrame({"k": np.array([100], np.int64),
                  "v": np.array([1], np.int64)}) \
        .to_parquet(os.path.join(d, "late.parquet"), index=False)
    paths, _ = bloom_candidate_files(d, idx, np.int64(100))
    assert "late.parquet" in {os.path.basename(p) for p in paths}
