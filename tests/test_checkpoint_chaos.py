"""Chaos-grade checkpoint/resume (VERDICT r2 item 5, north_rule):
the no-double-count contract under REAL process death, not just
simulated manifest deletion.

- SIGKILL a live Ray WORKER mid pass-1 and mid pass-2: Ray's task
  retry reruns the work on a fresh worker; the run completes in one
  call and every sink equals the uninterrupted run (idempotent
  atomic-rename writes mean a half-written attempt is invisible).
- SIGKILL the DRIVER process between pass-1 unit commits (a real
  ``kill -9`` of a subprocess), then resume in a fresh session: the
  committed units are skipped, the rest recompute, sinks match.

The kill is injected deterministically: a wrapper stage kills its own
worker (``os.kill(os.getpid(), SIGKILL)``) the first time it runs,
guarded by an exclusive-create sentinel file so retries pass through.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap

import pandas as pd
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
    assert a["metrics"] == b["metrics"]


@pytest.fixture(scope="module")
def golden(ray_session, small_fixture, lookups, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chaos_gold"))
    return ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                       lookups=lookups, use_actors=False)


def _kill_once(sentinel: str):
    """Closure that SIGKILLs its own Ray worker process the first time
    it runs (exclusive-create sentinel guards retries). A CLOSURE, not
    a module-level class: cloudpickle ships it by value, so the fresh
    worker that picks up the retried task can deserialize it without
    importing the test module."""
    import os as _os
    import signal as _signal

    def maybe_die():
        try:
            fd = _os.open(sentinel,
                          _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
        except FileExistsError:
            return
        _os.kill(_os.getpid(), _signal.SIGKILL)

    return maybe_die


def test_sigkill_worker_mid_pass1(ray_session, small_fixture, lookups,
                                  golden, tmp_path, monkeypatch):
    sentinel = str(tmp_path / "killed_p1")
    real = ckpt.parse_enrich_dataset
    maybe_die = _kill_once(sentinel)

    def chaotic(paths, config, lk, use_actors):
        def killer(batch):
            maybe_die()
            return batch

        return real(paths, config, lk, use_actors).map_batches(
            killer, batch_format="pyarrow")

    monkeypatch.setattr(ckpt, "parse_enrich_dataset", chaotic)
    out = str(tmp_path / "run")
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert os.path.exists(sentinel), "kill never fired"
    _assert_sinks_equal(res, golden)


def test_sigkill_worker_mid_pass2(ray_session, small_fixture, lookups,
                                  golden, tmp_path, monkeypatch):
    sentinel = str(tmp_path / "killed_p2")
    real = ckpt._make_ckpt_bucket_task
    maybe_die = _kill_once(sentinel)

    def chaotic(out_dir, config):
        fn = real(out_dir, config)

        def wrapped(items):
            maybe_die()
            return fn(items)

        return wrapped

    monkeypatch.setattr(ckpt, "_make_ckpt_bucket_task", chaotic)
    out = str(tmp_path / "run")
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert os.path.exists(sentinel), "kill never fired"
    _assert_sinks_equal(res, golden)


def test_sigkill_driver_between_pass1_commits(small_fixture, lookups,
                                              golden, tmp_path):
    """Hard driver death (actual SIGKILL of the process) after the
    second pass-1 unit manifest lands; the resume must skip exactly
    the committed units and reproduce the golden sinks."""
    out = str(tmp_path / "run")
    script = textwrap.dedent(f"""
        import os, signal
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        from webalizer_ray.config import PipelineConfig
        from webalizer_ray.state import checkpoint as ckpt
        cfg = PipelineConfig(num_buckets=8, enrich_concurrency=(1, 2))
        real = ckpt._write_json_atomic
        n = {{"manifests": 0}}

        def dying(obj, path, _real=real):
            _real(obj, path)
            if os.sep + "pass1" + os.sep in path:
                n["manifests"] += 1
                if n["manifests"] == 2:
                    os.kill(os.getpid(), signal.SIGKILL)

        ckpt._write_json_atomic = dying
        import webalizer_ray.fixtures as fx
        tc, rg = fx.lookup_tables()
        lk = (dict(zip(tc["tool"].to_pylist(),
                       tc["category"].to_pylist())),
              dict(zip(rg["role"].to_pylist(), rg["grp"].to_pylist())))
        ckpt.run_flagship_resumable({small_fixture!r}, {out!r},
                                    cfg, lookups=lk, use_actors=False)
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    committed = len(os.listdir(os.path.join(out, "state", "pass1")))
    assert committed == 2

    # resume in THIS session: committed units skip, the rest recompute
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=False)
    assert len(res["resume"]["pass1"]["skipped"]) == 2
    assert len(res["resume"]["pass1"]["recomputed"]) >= 1
    _assert_sinks_equal(res, golden)


def test_sigkill_actor_worker_mid_pass1(ray_session, small_fixture,
                                        lookups, golden, tmp_path,
                                        monkeypatch):
    """Same worker-kill chaos but with use_actors=True: the killer
    stage fuses into (or follows) the EnrichActor pool, so the SIGKILL
    takes down an ACTOR process mid-batch — Ray restarts it (the pool
    is created with restarts enabled) and the run must still complete
    with golden sinks. Note the golden fixture runs use_actors=False:
    actor-vs-task parity is part of what this asserts."""
    sentinel = str(tmp_path / "killed_actor")
    real = ckpt.parse_enrich_dataset
    maybe_die = _kill_once(sentinel)

    def chaotic(paths, config, lk, use_actors):
        def killer(batch):
            maybe_die()
            return batch

        return real(paths, config, lk, use_actors).map_batches(
            killer, batch_format="pyarrow")

    monkeypatch.setattr(ckpt, "parse_enrich_dataset", chaotic)
    out = str(tmp_path / "run")
    res = ckpt.run_flagship_resumable(small_fixture, out, CFG,
                                      lookups=lookups, use_actors=True)
    assert os.path.exists(sentinel), "kill never fired"
    _assert_sinks_equal(res, golden)
