"""§2.10 extension surface: named extra map_batches stages, engine vs
refmodel parity, loud unknown-name failure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from webalizer_ray import PipelineConfig
from webalizer_ray.extensions import STAGE_REGISTRY
from webalizer_ray.refmodel import run_refmodel


def test_registry_and_unknown_name():
    from webalizer_ray.extensions import resolve_stages

    assert "demo_double_kb" in STAGE_REGISTRY
    with pytest.raises(KeyError, match="nope_stage"):
        resolve_stages(["nope_stage"])


def test_extension_stage_engine_refmodel_parity(ray_session,
                                                tiny_fixture, tmp_path):
    from webalizer_ray.pipelines.flagship import run_flagship

    cfg = PipelineConfig(extra_stages=("demo_double_kb",), num_buckets=4)
    out = str(tmp_path / "o")
    run_flagship(tiny_fixture, out, config=cfg, use_actors=False)
    eng = pd.read_parquet(f"{out}/sinks/monthly.parquet") \
        .sort_values("month", ignore_index=True)

    turns = pads.dataset(tiny_fixture + "/turns").to_table().to_pandas()
    import os
    lk = {}
    for name in ["tool_categories", "role_groups"]:
        t = pd.read_parquet(os.path.join(tiny_fixture,
                                         f"{name}.parquet"))
        lk[name] = dict(zip(t.iloc[:, 0], t.iloc[:, 1]))
    ref = run_refmodel(turns, cfg, lk["tool_categories"],
                       lk["role_groups"])["monthly"] \
        .sort_values("month", ignore_index=True)
    assert list(eng.columns) == list(ref.columns)
    for c in eng.columns:
        a, b = eng[c].to_numpy(), ref[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b), c
        else:
            assert (a == b).all(), c

    # and the stage demonstrably acted: kb totals are 2x the un-staged run
    base = run_refmodel(turns, PipelineConfig(num_buckets=4),
                        lk["tool_categories"], lk["role_groups"])["monthly"]
    assert np.allclose(ref["kb"].to_numpy(),
                       2.0 * base["kb"].to_numpy())


def test_unknown_stage_fails_at_plan_build(ray_session, tiny_fixture,
                                           tmp_path):
    from webalizer_ray.pipelines.flagship import run_flagship

    cfg = PipelineConfig(extra_stages=("missing_stage",), num_buckets=4)
    with pytest.raises(KeyError, match="missing_stage"):
        run_flagship(tiny_fixture, str(tmp_path / "x"), config=cfg,
                     use_actors=False)
