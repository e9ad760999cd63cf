"""Input sources (SURVEY.md §2.1 S1–S5).

The reference reads one text log sequentially (webalizer.c:main() read loop +
our_gets(), ≈3400–3600 [verify]); our primary input is a Parquet *turns*
table (BASELINE.json input_hint) read with ``ray.data.read_parquet`` —
parallel per-file/row-group task assignment with column pruning, the
scale-correct analog of the streaming line reader.

Enrichment lookup tables (the DNS-cache / GeoDB analogs, dns_resolv.c
open_cache()/geodb.c geodb_open() [verify]) are tiny Parquet files loaded
into plain dicts once — they are broadcast to actors via ``ray.put`` /
actor ``__init__``, never shuffled.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray.data as rd

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def turns_path(fixture_dir: str) -> str:
    """Resolve the turns table location inside a fixture dir."""
    p = os.path.join(fixture_dir, "turns")
    return p if os.path.isdir(p) else fixture_dir


def read_turns(fixture_dir: str, columns: list[str] | None = None,
               **read_kwargs) -> rd.Dataset:
    """Turns-table scan with column pruning (prune at the read)."""
    return rd.read_parquet(turns_path(fixture_dir),
                           columns=columns or TURN_COLUMNS, **read_kwargs)


def read_lookup_dicts(fixture_dir: str) -> tuple[dict[str, str], dict[str, str]]:
    """Load tool→category and role→grp lookup tables as dicts.

    Small side of every enrichment "join" (J1/J2): read once on the driver,
    broadcast by value into the actor pool (EnrichActor.__init__).
    """
    tc = pq.read_table(os.path.join(fixture_dir, "tool_categories.parquet"))
    rg = pq.read_table(os.path.join(fixture_dir, "role_groups.parquet"))
    tool_categories = dict(zip(tc["tool"].to_pylist(), tc["category"].to_pylist()))
    role_groups = dict(zip(rg["role"].to_pylist(), rg["grp"].to_pylist()))
    return tool_categories, role_groups
