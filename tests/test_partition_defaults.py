"""Grep/AST pin for VERDICT r4 item 4: no hardcoded parallelism
constants in stages/.

Every ``num_partitions`` / ``num_buckets`` / ``num_salts`` signature
default in ``webalizer_ray/stages`` must be ``None`` (resolved at call
time through ``config.default_partitions``, which derives the fan-out
from the live Ray session) — UNLESS the function's docstring declares
the value a ``LAYOUT CONSTANT`` (a bucket count persisted in a store's
directory layout, where a session-derived value would silently corrupt
cross-session joins or incremental dedup lookups).
"""

from __future__ import annotations

import ast
import glob
import os

import pytest

STAGES = os.path.join(os.path.dirname(__file__), "..",
                      "webalizer_ray", "stages")
FANOUT_PARAMS = {"num_partitions", "num_buckets", "num_salts"}


def _iter_defs():
    for path in sorted(glob.glob(os.path.join(STAGES, "*.py"))):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                yield os.path.basename(path), node


def test_no_hardcoded_fanout_defaults_in_stages():
    offenders = []
    for fname, fn in _iter_defs():
        args = fn.args
        all_args = args.posonlyargs + args.args + args.kwonlyargs
        defaults = ([None] * (len(args.posonlyargs + args.args)
                              - len(args.defaults))
                    + list(args.defaults) + list(args.kw_defaults))
        doc = ast.get_docstring(fn) or ""
        for a, d in zip(all_args, defaults):
            if a.arg in FANOUT_PARAMS and d is not None \
                    and isinstance(d, ast.Constant) \
                    and isinstance(d.value, int):
                if "LAYOUT CONSTANT" not in doc:
                    offenders.append(f"{fname}:{fn.lineno} {fn.name}"
                                     f"({a.arg}={d.value})")
    assert not offenders, (
        "hardcoded fan-out defaults (route through "
        "config.default_partitions, or document as LAYOUT CONSTANT): "
        + "; ".join(offenders))


def test_layout_constants_are_the_known_set():
    """The LAYOUT CONSTANT escape hatch stays a closed list — adding a
    new persisted-layout knob means consciously extending this pin."""
    allowed = {("join.py", "write_bucketed"),
               ("join.py", "bucketed_join"),
               ("dedup.py", "incremental_exact_dedup"),
               ("dedup.py", "incremental_minhash_dedup")}
    found = set()
    for fname, fn in _iter_defs():
        doc = ast.get_docstring(fn) or ""
        if "LAYOUT CONSTANT" in doc:
            found.add((fname, fn.name))
    assert found == allowed, found ^ allowed


def test_default_partitions_scales_with_session():
    import ray

    from webalizer_ray.config import default_partitions
    assert default_partitions(16) == 16          # explicit wins
    n = default_partitions()
    assert n >= 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
        assert n == max(8, min(4096, 2 * cpus))
        assert default_partitions(None, per_cpu=1) == \
            max(8, min(4096, cpus))
