"""Single-pass (checkpoint="off") flagship parity — VERDICT r4 item 2.

The fused mode replaces the durable pass-1 store + pass-2 re-read with
one parse→shuffle→aggregate stream. Its contract is BIT-IDENTICAL
sinks and metrics to the durable path; these tests pin that on the
small fixture (1k convs, bad + routed rows included) and on a variant
config exercising ignore filters and strict sequencing.
"""

from __future__ import annotations

import dataclasses
import json
import os

import pandas as pd
import pytest

from webalizer_ray.config import DEFAULT_CONFIG
from webalizer_ray.pipelines.flagship import run_flagship


@pytest.fixture(scope="module")
def both_results(ray_session, small_fixture, tmp_path_factory):
    on = tmp_path_factory.mktemp("fused_on")
    off = tmp_path_factory.mktemp("fused_off")
    return (run_flagship(small_fixture, str(on), DEFAULT_CONFIG),
            run_flagship(small_fixture, str(off), DEFAULT_CONFIG,
                         checkpoint="off"))


def test_fused_metrics_identical(both_results):
    on, off = both_results
    assert on["metrics"] == off["metrics"]
    # bad rows exist in the small fixture, so the _route counting path
    # (not the durable dir scan) is what produced these numbers
    assert off["metrics"]["bad"] > 0


def test_fused_sinks_bit_identical(both_results):
    on, off = both_results
    for name, a in on["sinks"].items():
        b = off["sinks"][name]
        if not isinstance(a, pd.DataFrame):
            assert a == b, name
            continue
        if name in ("sessions", "per_conv"):
            # row-level tables are written per bucket; order is layout-
            # dependent, values are not
            cols = list(a.columns)
            a = a.sort_values(cols, ignore_index=True) if len(a) else a
            b = b.sort_values(cols, ignore_index=True) if len(b) else b
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True),
                                      obj=name)


def test_fused_has_no_parsed_store(both_results, tmp_path_factory):
    _, off = both_results
    assert not os.path.isdir(os.path.join(off["out_dir"], "parsed"))
    # but the per-bucket row-level outputs are all there
    for sub in ("sessions", "per_conv", "per_conv_top", "turns"):
        assert os.path.isdir(os.path.join(off["out_dir"], sub)), sub
    assert os.path.isfile(os.path.join(off["out_dir"], "metrics.json"))
    with open(os.path.join(off["out_dir"], "metrics.json")) as f:
        assert json.load(f)["parsed"] == off["metrics"]["parsed"]


def test_fused_variant_config_parity(ray_session, small_fixture,
                                     tmp_path_factory):
    """Ignore filters + strict_seq flow through the fused route
    counting identically (ignored rows land in the _route channel, seq
    drops in the _meta channel)."""
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, strict_seq=True,
        ignore_conv_patterns=("conv-00001*",))
    on = run_flagship(small_fixture,
                      str(tmp_path_factory.mktemp("fv_on")), cfg)
    off = run_flagship(small_fixture,
                       str(tmp_path_factory.mktemp("fv_off")), cfg,
                       checkpoint="off")
    assert on["metrics"] == off["metrics"]
    assert off["metrics"]["ignored_pattern"] > 0
    for name in ("monthly", "daily", "per_tool", "top_conv",
                 "status_hist", "search_terms"):
        pd.testing.assert_frame_equal(on["sinks"][name],
                                      off["sinks"][name], obj=name)


def test_fused_rejects_bad_checkpoint_value(small_fixture, tmp_path):
    with pytest.raises(ValueError, match="checkpoint"):
        run_flagship(small_fixture, str(tmp_path), DEFAULT_CONFIG,
                     checkpoint="maybe")


def test_fused_rerun_over_stale_scratch_does_not_double(
        ray_session, small_fixture, tmp_path_factory):
    """A crashed fused run leaves out_dir/_scratch behind; Ray's
    write_parquet APPENDS, so a rerun over the stale scratch would
    double every row. The fused pass must clear it (the scratch is
    not a resume point)."""
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("fused_stale")
    scratch = os.path.join(str(out), "_scratch", "route=ok",
                           "bucket=7")
    os.makedirs(scratch)
    # plant a fake stale slice that would inflate bucket 7
    pd.DataFrame({"conv_id": ["zzz"], "turn_idx": [0]}).pipe(
        lambda df: pq.write_table(
            __import__("pyarrow").Table.from_pandas(df),
            os.path.join(scratch, "stale.parquet")))
    res = run_flagship(small_fixture, str(out), DEFAULT_CONFIG,
                       checkpoint="off")
    ref = run_flagship(small_fixture,
                       str(tmp_path_factory.mktemp("fused_clean")),
                       DEFAULT_CONFIG, checkpoint="off")
    assert res["metrics"] == ref["metrics"]
