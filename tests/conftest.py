"""Shared fixtures: ONE Ray session per pytest session + transcript fixtures."""

from __future__ import annotations

import warnings

import pandas as pd
import pytest

warnings.filterwarnings("ignore", category=DeprecationWarning)
warnings.filterwarnings("ignore", category=FutureWarning)


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    """20-conv fixture dir: turns/*.parquet + lookup tables."""
    from webalizer_ray import fixtures

    d = tmp_path_factory.mktemp("tiny")
    fixtures.build_fixture_dir(str(d), scale="tiny")
    return str(d)


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    """1000-conv fixture dir (refmodel parity scale)."""
    from webalizer_ray import fixtures

    d = tmp_path_factory.mktemp("small")
    fixtures.build_fixture_dir(str(d), scale="small")
    return str(d)


@pytest.fixture(scope="session")
def lookups():
    from webalizer_ray import fixtures

    tc, rg = fixtures.lookup_tables()
    return (
        dict(zip(tc["tool"].to_pylist(), tc["category"].to_pylist())),
        dict(zip(rg["role"].to_pylist(), rg["grp"].to_pylist())),
    )


def load_turns(fixture_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    return pads.dataset(f"{fixture_dir}/turns").to_table().to_pandas()


@pytest.fixture(scope="session")
def small_refmodel(small_fixture, lookups):
    """Golden sinks for the small fixture from the pandas oracle."""
    from webalizer_ray.config import DEFAULT_CONFIG
    from webalizer_ray.refmodel import run_refmodel

    tcd, rgd = lookups
    return run_refmodel(load_turns(small_fixture), DEFAULT_CONFIG, tcd, rgd)
