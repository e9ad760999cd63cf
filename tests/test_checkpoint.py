"""Checkpoint/resume parity (SURVEY.md §4.3, §5.2 item 5; north_rule).

The contract under test: kill a run at ANY point, resume, and every sink
equals the uninterrupted run's — no double counting, no lost partitions.
Kills are simulated by deleting commit manifests / outputs mid-state
(equivalent to dying before the manifest rename, the commit point).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.dataset as pads
import pytest

from webalizer_ray.config import PipelineConfig
from webalizer_ray.state import checkpoint as ckpt

CFG = PipelineConfig(num_buckets=8, enrich_concurrency=(1, 2))

SINK_KEYS = {"monthly": ["month"], "daily": ["date"], "hourly": ["hour"],
             "per_tool": ["tool_norm"], "per_category": ["category"],
             "status_hist": ["status"], "search_terms": ["term"]}


def _assert_sinks_equal(a: dict, b: dict):
    for name, keys in SINK_KEYS.items():
        pd.testing.assert_frame_equal(
            a["sinks"][name].sort_values(keys, ignore_index=True),
            b["sinks"][name].sort_values(keys, ignore_index=True),
            check_dtype=False)
    pd.testing.assert_frame_equal(
        a["sinks"]["sessions"].sort_values(["conv_id", "session_id"],
                                           ignore_index=True),
        b["sinks"]["sessions"].sort_values(["conv_id", "session_id"],
                                           ignore_index=True),
        check_dtype=False)
    assert a["metrics"] == b["metrics"]


@pytest.fixture(scope="module")
def baseline(ray_session, small_fixture, lookups, tmp_path_factory):
    """Uninterrupted resumable run — the golden result."""
    out = str(tmp_path_factory.mktemp("ckpt_base"))
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    return res


def test_resumable_matches_plain_flagship(ray_session, small_fixture,
                                          lookups, baseline,
                                          tmp_path_factory):
    from webalizer_ray.pipelines.flagship import run_flagship

    out = str(tmp_path_factory.mktemp("plain"))
    plain = run_flagship(small_fixture, out, CFG, lookups=lookups,
                         use_actors=False)
    for name, keys in SINK_KEYS.items():
        pd.testing.assert_frame_equal(
            baseline["sinks"][name].sort_values(keys, ignore_index=True),
            plain["sinks"][name].sort_values(keys, ignore_index=True),
            check_dtype=False)


def test_noop_resume_recomputes_nothing(ray_session, small_fixture, lookups,
                                        baseline):
    out = baseline["out_dir"]
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert res["resume"]["pass1"]["recomputed"] == []
    assert res["resume"]["pass2"]["recomputed"] == []
    _assert_sinks_equal(res, baseline)


def test_kill_mid_pass1_resume(ray_session, small_fixture, lookups, baseline,
                               tmp_path_factory):
    """Die before 3 units commit (manifest missing, incl. a stray tmp)."""
    out = str(tmp_path_factory.mktemp("ckpt_k1"))
    ckpt.run_flagship_resumable(small_fixture, out, CFG, lookups=lookups,
                                use_actors=False)
    units = sorted(glob.glob(os.path.join(out, "state", "pass1", "*.json")))
    assert len(units) >= 3
    for mp in units[:2]:
        uid = json.load(open(mp))["unit"]
        os.remove(mp)
        shutil.rmtree(os.path.join(out, "parsed", f"unit={uid}"))
    # unit killed between write and manifest: output dir present, no manifest
    mp = units[2]
    os.remove(mp)
    # stray tmp dir from a killed write
    os.makedirs(os.path.join(out, "parsed", "_tmp_dead"), exist_ok=True)
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert len(res["resume"]["pass1"]["recomputed"]) == 3
    _assert_sinks_equal(res, baseline)
    assert not glob.glob(os.path.join(out, "parsed", "_tmp_*"))


def test_kill_mid_pass2_resume(ray_session, small_fixture, lookups, baseline,
                               tmp_path_factory):
    """Die before some buckets commit; one also lost its partial file."""
    out = str(tmp_path_factory.mktemp("ckpt_k2"))
    ckpt.run_flagship_resumable(small_fixture, out, CFG, lookups=lookups,
                                use_actors=False)
    mans = sorted(glob.glob(os.path.join(out, "state", "pass2", "*.json")))
    assert len(mans) >= 3
    killed = []
    for mp in mans[:2]:
        killed.append(json.load(open(mp))["bucket"])
        os.remove(mp)
    # manifest present but partial missing (killed between the two writes
    # is impossible by ordering, but a corrupted file is equivalent)
    b3 = json.load(open(mans[2]))["bucket"]
    os.remove(ckpt._partial_path(out, b3))
    killed.append(b3)
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert sorted(res["resume"]["pass2"]["recomputed"]) == sorted(killed)
    assert res["resume"]["pass1"]["recomputed"] == []
    _assert_sinks_equal(res, baseline)


def test_incremental_feed_no_double_count(ray_session, small_fixture, lookups,
                                          baseline, tmp_path_factory):
    """Feed half the log files, then the rest — the reference's
    month-to-date incremental mode (W5). Final sinks must equal a single
    full run; already-processed files must not be recomputed or
    double-counted."""
    stage = tmp_path_factory.mktemp("ckpt_incr")
    in_dir = str(stage / "in")
    out = str(stage / "out")
    os.makedirs(os.path.join(in_dir, "turns"))
    for f in glob.glob(os.path.join(small_fixture, "*.parquet")):
        shutil.copy(f, in_dir)
    files = sorted(glob.glob(os.path.join(small_fixture, "turns",
                                          "*.parquet")))
    assert len(files) >= 4
    half = len(files) // 2
    for f in files[:half]:
        shutil.copy(f, os.path.join(in_dir, "turns"))
    r1 = ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                     use_actors=False)
    assert len(r1["resume"]["pass1"]["recomputed"]) == half
    # re-feed the SAME files (overlapping log feed) → pure no-op
    r1b = ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                      use_actors=False)
    assert r1b["resume"]["pass1"]["recomputed"] == []
    assert r1b["metrics"] == r1["metrics"]
    # now the rest of the month's logs arrive
    for f in files[half:]:
        shutil.copy(f, os.path.join(in_dir, "turns"))
    r2 = ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                     use_actors=False)
    assert len(r2["resume"]["pass1"]["recomputed"]) == len(files) - half
    assert len(r2["resume"]["pass1"]["skipped"]) == half
    # only buckets that received new data recompute; the rest load partials
    assert len(r2["resume"]["pass2"]["cached"]) + \
        len(r2["resume"]["pass2"]["recomputed"]) == r2["resume"]["pass2"]["buckets"]
    _assert_sinks_equal(r2, baseline)


def test_routed_rows_equal_after_resume(ray_session, small_fixture, lookups,
                                        baseline, tmp_path_factory):
    """Routed-row equality (north_rule): per-turn text equality under
    stable (conv_id, turn_idx) ordering, interrupted vs uninterrupted."""
    out = str(tmp_path_factory.mktemp("ckpt_rows"))
    ckpt.run_flagship_resumable(small_fixture, out, CFG, lookups=lookups,
                                use_actors=False)
    mans = sorted(glob.glob(os.path.join(out, "state", "pass2", "*.json")))
    for mp in mans[: len(mans) // 2]:
        os.remove(mp)
    ckpt.run_flagship_resumable(small_fixture, out, CFG, lookups=lookups,
                                use_actors=False)

    def routed(out_dir):
        return (pads.dataset(os.path.join(out_dir, "turns", "route=ok"))
                .to_table(columns=["conv_id", "turn_idx", "session_id"])
                .to_pandas()
                .sort_values(["conv_id", "turn_idx"], ignore_index=True))

    pd.testing.assert_frame_equal(routed(out), routed(baseline["out_dir"]))


def test_same_size_rewrite_forces_recompute(ray_session, small_fixture,
                                            lookups, tmp_path_factory):
    """A same-size in-place rewrite of an input file must invalidate its
    unit (digest includes mtime; code-review regression)."""
    import time as _time
    stage = tmp_path_factory.mktemp("ckpt_rewrite")
    in_dir = str(stage / "in")
    os.makedirs(os.path.join(in_dir, "turns"))
    for f in glob.glob(os.path.join(small_fixture, "turns", "*.parquet")):
        shutil.copy(f, os.path.join(in_dir, "turns"))
    out = str(stage / "out")
    ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                use_actors=False)
    victim = sorted(glob.glob(os.path.join(in_dir, "turns",
                                           "*.parquet")))[0]
    _time.sleep(0.01)
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:    # identical bytes, new mtime
        f.write(data)
    res = ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                      use_actors=False)
    assert len(res["resume"]["pass1"]["recomputed"]) == 1


def test_deleted_input_is_retired(ray_session, small_fixture, lookups,
                                  tmp_path_factory):
    """Deleting an input log file must RETIRE its unit on resume: its rows
    leave every sink (lineage differs → recompute), matching the
    reference's state-re-derived-from-the-fed-log contract."""
    stage = tmp_path_factory.mktemp("ckpt_retire")
    in_dir = str(stage / "in")
    os.makedirs(os.path.join(in_dir, "turns"))
    for f in glob.glob(os.path.join(small_fixture, "*.parquet")):
        shutil.copy(f, in_dir)
    files = sorted(glob.glob(os.path.join(small_fixture, "turns",
                                          "*.parquet")))
    for f in files:
        shutil.copy(f, os.path.join(in_dir, "turns"))
    out = str(stage / "out")
    ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                use_actors=False)
    # remove one input file and resume
    victim = sorted(glob.glob(os.path.join(in_dir, "turns",
                                           "*.parquet")))[0]
    os.remove(victim)
    res = ckpt.run_flagship_resumable(in_dir, out, CFG, lookups=lookups,
                                      use_actors=False)
    assert len(res["resume"]["pass1"]["retired"]) == 1
    retired_unit = res["resume"]["pass1"]["retired"][0]
    assert not os.path.isdir(os.path.join(out, "parsed",
                                          f"unit={retired_unit}"))
    assert not os.path.exists(
        ckpt._pass1_manifest_path(out, retired_unit))
    # sinks must equal a FRESH run over the reduced input set
    fresh_out = str(stage / "fresh")
    fresh = ckpt.run_flagship_resumable(in_dir, fresh_out, CFG,
                                        lookups=lookups, use_actors=False)
    _assert_sinks_equal(res, fresh)


def test_presplit_resume_parity(ray_session, small_fixture, lookups,
                                baseline, tmp_path_factory):
    """Big-bucket two-stage presplit on the resumable path: same sinks,
    same commit semantics, driver-side manifest carries presplit_k."""
    import dataclasses

    cfg = dataclasses.replace(CFG, bucket_split_target_bytes=1)
    out = str(tmp_path_factory.mktemp("ckpt_split"))
    res = ckpt.run_flagship_resumable(small_fixture, out, cfg,
                                      lookups=lookups, use_actors=False)
    assert res["resume"]["pass2"].get("presplit"), \
        "expected at least one presplit bucket with a 1-byte split target"
    _assert_sinks_equal(res, baseline)
    mans = [json.load(open(p)) for p in
            glob.glob(os.path.join(out, "state", "pass2", "*.json"))]
    assert any(m.get("presplit_k", 0) >= 4 for m in mans)
    # scratch cleaned up after commit
    assert not glob.glob(os.path.join(out, "presplit", "*"))
    assert not glob.glob(os.path.join(out, "state", "pass2_parts", "*"))

    # no-op resume recomputes nothing
    res2 = ckpt.run_flagship_resumable(small_fixture, out, cfg,
                                       lookups=lookups, use_actors=False)
    assert res2["resume"]["pass2"]["recomputed"] == []
    _assert_sinks_equal(res2, baseline)

    # kill one split bucket before its commit point (manifest gone):
    # resume recomputes it through the presplit path and re-converges
    victim = max(mans, key=lambda m: m.get("presplit_k", 0))["bucket"]
    os.remove(ckpt._pass2_manifest_path(out, victim))
    res3 = ckpt.run_flagship_resumable(small_fixture, out, cfg,
                                       lookups=lookups, use_actors=False)
    assert res3["resume"]["pass2"]["recomputed"] == [victim]
    assert res3["resume"]["pass2"]["presplit"] == [victim]
    _assert_sinks_equal(res3, baseline)
