"""Write–Audit–Publish: a passing batch becomes visible atomically, a
failing batch NEVER touches the serving directory (old state byte-
preserved, staged data quarantined), and republish replaces."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from webalizer_ray.state.wap import AuditFailure, write_audit_publish

RULES = {"k": {"not_null": True, "min": 0},
         "name": {"regex": r"^u\d+$"}}


def _batch(ks, names) -> rd.Dataset:
    return rd.from_pandas(pd.DataFrame({
        "k": pd.array(ks, dtype="Int64"), "name": names}))


def test_pass_publishes_and_fail_preserves_old_state(ray_session,
                                                     tmp_path):
    out = str(tmp_path / "serving")
    rep = write_audit_publish(_batch([1, 2], ["u1", "u2"]), out, RULES)
    assert int(rep["violations"].sum()) == 0
    good = pd.read_parquet(out).sort_values("k", ignore_index=True)
    assert good["k"].tolist() == [1, 2]
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out)}

    with pytest.raises(AuditFailure, match="k.min=1"):
        write_audit_publish(_batch([3, -7], ["u3", "u4"]), out, RULES)

    # serving dir byte-untouched
    assert {f: os.path.getmtime(os.path.join(out, f))
            for f in os.listdir(out)} == mtimes
    again = pd.read_parquet(out).sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(good, again)
    # staged data quarantined for debugging, not deleted
    q = [d for d in os.listdir(tmp_path)
         if d.startswith("serving.quarantine-")]
    assert len(q) == 1
    quarantined = pd.read_parquet(tmp_path / q[0])
    assert -7 in quarantined["k"].tolist()


def test_multiple_rule_failures_reported(ray_session, tmp_path):
    out = str(tmp_path / "s2")
    with pytest.raises(AuditFailure) as ei:
        write_audit_publish(_batch([None, 1], ["bad name", "u1"]),
                            out, RULES)
    rep = ei.value.report.set_index(["column", "rule"])
    assert rep.loc[("k", "not_null"), "violations"] == 1
    assert rep.loc[("name", "regex"), "violations"] == 1
    assert not os.path.exists(out)  # nothing ever became visible


def test_republish_replaces_not_appends(ray_session, tmp_path):
    out = str(tmp_path / "s3")
    write_audit_publish(_batch([1], ["u1"]), out, RULES)
    write_audit_publish(_batch([5, 6], ["u5", "u6"]), out, RULES)
    got = pd.read_parquet(out).sort_values("k", ignore_index=True)
    assert got["k"].tolist() == [5, 6]  # replaced, not doubled
