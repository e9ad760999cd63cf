"""TTL retention + compaction (state/maintain.py).

Retention: footer-only classification (expired files unlink without a
data read, retained files stay byte-untouched), straddling rewrite,
idempotence. Compaction: content multiset preserved, big files kept,
crash recovery finishes a committed bin and GCs uncommitted staging.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webalizer_ray.state import maintain


def _write(dirp, name, ts_days, vals):
    t = pa.table({
        "ts": pa.array(pd.to_datetime(ts_days, unit="D",
                                      origin="2024-01-01")),
        "v": pa.array(np.asarray(vals, dtype=np.int64))})
    pq.write_table(t, os.path.join(dirp, name))


@pytest.fixture()
def ttl_dir(tmp_path):
    d = str(tmp_path / "store")
    os.makedirs(d)
    _write(d, "old.parquet", [0, 1, 2], [1, 2, 3])        # all < cutoff
    _write(d, "mid.parquet", [8, 9, 10, 11], [4, 5, 6, 7])  # straddles
    _write(d, "new.parquet", [20, 21], [8, 9])            # all >= cutoff
    return d


CUTOFF = "2024-01-11"


def test_retention_actions_and_content(ray_session, ttl_dir):
    mtime_new = os.path.getmtime(os.path.join(ttl_dir, "new.parquet"))
    rep = maintain.apply_retention(ttl_dir, "ts", CUTOFF)
    acts = dict(zip(rep["file"], rep["action"]))
    assert acts == {"old.parquet": "deleted", "mid.parquet": "rewritten",
                    "new.parquet": "kept"}
    assert not os.path.exists(os.path.join(ttl_dir, "old.parquet"))
    # wholly-retained file byte-untouched
    assert os.path.getmtime(os.path.join(ttl_dir, "new.parquet")) \
        == mtime_new
    left = pq.read_table(ttl_dir).to_pandas()
    assert sorted(left["v"].tolist()) == [6, 7, 8, 9]
    assert (left["ts"] >= pd.Timestamp(CUTOFF)).all()
    # removed accounting: 3 (old) + 2 (mid)
    assert int(rep["removed"].sum()) == 5


def test_retention_idempotent(ray_session, ttl_dir):
    maintain.apply_retention(ttl_dir, "ts", CUTOFF)
    rep2 = maintain.apply_retention(ttl_dir, "ts", CUTOFF)
    assert int(rep2["removed"].sum()) == 0
    assert set(rep2["action"]) == {"kept"}


def test_retention_missing_column_raises(ray_session, ttl_dir):
    with pytest.raises(KeyError):
        maintain.apply_retention(ttl_dir, "nope", CUTOFF)


@pytest.fixture()
def small_files_dir(tmp_path):
    d = str(tmp_path / "cmp")
    os.makedirs(d)
    for i in range(10):
        _write(d, f"s{i:02d}.parquet", [i], [i])
    _write(d, "big.parquet", list(range(40)), list(range(100, 140)))
    return d


def test_compaction_preserves_content(ray_session, small_files_dir):
    before = sorted(pq.read_table(small_files_dir)["v"].to_pylist())
    rep = maintain.compact_dir(small_files_dir, target_rows=8)
    after = sorted(pq.read_table(small_files_dir)["v"].to_pylist())
    assert before == after
    # big file (40 rows >= target/2) untouched
    assert os.path.exists(os.path.join(small_files_dir, "big.parquet"))
    row = rep[rep["file"] == "big.parquet"].iloc[0]
    assert row["action"] == "kept"
    files = [f for f in os.listdir(small_files_dir)
             if f.endswith(".parquet")]
    # 10 smalls (1 row each) pack into ceil(10/8)=2 bins + big
    assert len(files) == 3
    assert sum(f.startswith("compact-") for f in files) == 2
    # no leftover manifests or staging
    assert not [f for f in os.listdir(small_files_dir)
                if f.startswith(".cmp-")]


def test_compaction_recovery_finishes_committed_bin(ray_session,
                                                    tmp_path):
    d = str(tmp_path / "rec")
    os.makedirs(d)
    _write(d, "a.parquet", [0], [1])
    _write(d, "b.parquet", [1], [2])
    # simulate crash AFTER the manifest commit point, before publish
    t = pa.concat_tables([pq.read_table(os.path.join(d, "a.parquet")),
                          pq.read_table(os.path.join(d, "b.parquet"))])
    pq.write_table(t, os.path.join(d, ".cmp-deadbeef.staging"))
    json.dump({"final": "compact-deadbeef.parquet",
               "staging": ".cmp-deadbeef.staging",
               "sources": ["a.parquet", "b.parquet"]},
              open(os.path.join(d, ".cmp-deadbeef.json"), "w"))
    res = maintain.recover_compaction(d)
    assert res["finished"] == 1
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert files == ["compact-deadbeef.parquet"]
    assert sorted(pq.read_table(d)["v"].to_pylist()) == [1, 2]
    # idempotent
    assert maintain.recover_compaction(d) == {"finished": 0,
                                              "orphans_removed": 0}


def test_cli_maintain_ttl_and_compact(ray_session, tmp_path, capsys):
    import json

    from webalizer_ray import run as cli
    d = str(tmp_path / "clistore")
    os.makedirs(d)
    _write(d, "old.parquet", [0, 1], [1, 2])
    _write(d, "a.parquet", [15], [3])
    _write(d, "b.parquet", [16], [4])
    assert cli.main(["maintain", "--dir", d,
                     "--ttl-cutoff", "2024-01-11",
                     "--compact-target-rows", "100"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ttl"] == {"removed": 2, "deleted_files": 1,
                          "rewritten": 0, "kept": 2}
    assert rep["compact"]["compacted"] == 2
    assert sorted(pq.read_table(d)["v"].to_pylist()) == [3, 4]


def test_compaction_recovery_gcs_uncommitted_staging(ray_session,
                                                     tmp_path):
    d = str(tmp_path / "gc")
    os.makedirs(d)
    _write(d, "a.parquet", [0], [1])
    # staging with NO manifest = never committed → sources must survive
    pq.write_table(pq.read_table(os.path.join(d, "a.parquet")),
                   os.path.join(d, ".cmp-0rphan.staging"))
    res = maintain.recover_compaction(d)
    assert res == {"finished": 0, "orphans_removed": 1}
    assert sorted(pq.read_table(d)["v"].to_pylist()) == [1]
