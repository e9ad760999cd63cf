"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the webalizer_ray library ever calls ``ray.init()`` /
``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001.

    Adapts the events table into the canonical transcript turns schema
    (sources/events_adapter.py), runs the full parse→enrich→route→
    sessionize→aggregate pipeline, and returns the monthly sink.
    """
    from webalizer_ray.pipelines.queries import flagship_monthly

    return flagship_monthly("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from webalizer_ray.pipelines.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from webalizer_ray.pipelines.queries import all_oracle_sql

    return all_oracle_sql()
