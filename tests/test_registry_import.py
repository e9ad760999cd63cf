"""Query-package import contracts (r3 split): the package import is
near-free (PEP 562 lazy __init__), a single chunk module imports
standalone (what a Ray worker deserializing one query function pays),
and the lazy REGISTRY populates itself on first read."""

from __future__ import annotations

import subprocess
import sys


def _run(code: str) -> str:
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    return out.stdout.strip()


def test_package_import_is_lazy_and_registry_self_populates():
    got = _run("""
import time, webalizer_ray.pipelines.queries as Q
from webalizer_ray.pipelines.queries import REGISTRY
import sys
chunks_before = [m for m in sys.modules
                 if m.startswith('webalizer_ray.pipelines.queries.q')]
n = len(REGISTRY)              # first READ triggers the one-time load
chunks_after = [m for m in sys.modules
                if m.startswith('webalizer_ray.pipelines.queries.q')]
print(len(chunks_before), n, len(chunks_after) >= 17)
""")
    before, n, loaded = got.split()
    assert before == "0", "chunks imported eagerly at package import"
    assert int(n) == 960
    assert loaded == "True"


def test_single_chunk_imports_standalone():
    # a worker deserializing a q01 function imports only q01 and its
    # backward deps — never the whole registry
    got = _run("""
import sys
import webalizer_ray.pipelines.queries.q01_core as q1
from webalizer_ray.pipelines.queries._shared import REGISTRY
loaded = [m for m in sys.modules
          if m.startswith('webalizer_ray.pipelines.queries.q')]
print(len(loaded), callable(q1.hourly_events),
      dict.__len__(REGISTRY) > 0)
""")
    nmod, is_callable, registered = got.split()
    assert int(nmod) < 17, f"chunk import pulled {nmod} chunk modules"
    assert is_callable == "True" and registered == "True"


def test_core_queries_cover_survey_mapped_names():
    got = _run("""
import webalizer_ray.pipelines.queries as Q
cq = Q.core_queries()
aq = list(Q.all_queries())
print(len(cq), aq[:len(cq)] == list(cq))
""")
    n, prefix_ok = got.split()
    assert int(n) >= 65
    assert prefix_ok == "True", \
        "all_queries() must enumerate core (SURVEY-S2) names first"


def test_every_chunk_imports_standalone():
    """r3 review finding: chunks with module-level REGISTRY reads
    (backward SQL references) used to crash q10-q17 on standalone
    import by firing the full load mid-import. Keyed lookups now
    resolve from what is already registered; every chunk must import
    alone in a fresh process."""
    import webalizer_ray.pipelines.queries as Q

    for chunk in Q._CHUNKS:
        _run(f"import webalizer_ray.pipelines.queries.{chunk}")


def test_late_chunk_names_reachable_after_partial_import():
    """r3 review finding: a reentrant load used to snapshot a
    half-initialized q02, permanently hiding its later names from the
    package attribute map."""
    got = _run("""
import webalizer_ray.pipelines.queries.q02_relational_media
import webalizer_ray.pipelines.queries as Q
print(callable(Q.tpch_q9_nation_profit), len(Q.REGISTRY))
""")
    ok, n = got.split()
    assert ok == "True" and int(n) == 960


def test_ray_worker_deserializes_chunk_function(ray_session):
    """The split's whole point for workers: a Ray task that receives a
    chunk-module function must import that chunk (plus backward deps)
    on the worker and run it — without the test process's modules."""
    import ray

    from webalizer_ray.pipelines.queries.q01_core import hourly_events

    @ray.remote
    def run(fn):
        out = fn("/root/testdata/sf0.001")
        return len(out)

    assert ray.get(run.remote(hourly_events)) == 24


def test_late_names_reachable_after_each_chunk_standalone_import():
    """Generalization of the q02 regression (r3 review latent-gap):
    for EVERY chunk, a standalone import followed by package attribute
    access must resolve that chunk's registered names — if a future
    module-level REGISTRY read for a non-imported chunk's key fires
    the loader mid-import, the half-initialized snapshot would surface
    here as an AttributeError."""
    import webalizer_ray.pipelines.queries as Q

    for chunk in Q._CHUNKS:
        _run(f"""
import webalizer_ray.pipelines.queries.{chunk} as ch
import webalizer_ray.pipelines.queries as Q
from webalizer_ray.pipelines.queries._shared import REGISTRY
names = [k for k in dict.keys(REGISTRY)
         if getattr(ch, k.replace('-', '_'), None) is not None][-3:]
assert len(Q.REGISTRY) == 960
for n in names:
    getattr(Q, n)
""")


def test_chunk_size_bar():
    """VERDICT r4 item 6: no query chunk drifts past the 4.5k-line
    bar (q01 was at 4,685 and climbing; the session/window family now
    lives in q19). New queries go in the thematically-right chunk or a
    new one — not the biggest existing file."""
    import glob
    import os
    qdir = os.path.join(os.path.dirname(__file__), "..",
                        "webalizer_ray", "pipelines", "queries")
    over = []
    for p in glob.glob(os.path.join(qdir, "q*.py")):
        n = sum(1 for _ in open(p))
        if n > 4500:
            over.append(f"{os.path.basename(p)}: {n}")
    assert not over, over
