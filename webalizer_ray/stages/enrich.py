"""Stateful enrichment actor pool (SURVEY.md §2.3 ST1–ST3, §2.4 J1/J2).

The analog of the reference's DNS/GeoIP machinery — dns_resolv.c's
forked-children resolver + Berkeley-DB cache (dns_resolver()/resolve_dns(),
≈500–1000 [verify]) and geodb.c's mmap'd IP→country reader — re-expressed
the Ray-idiomatic way: lookup tables are loaded ONCE per actor in
``__init__`` (broadcast small side: driver does ``ray.put`` once; every
actor reads the same object-store copy — never re-shipped per batch, never
shuffled), and the per-batch "join" is a vectorized Arrow dictionary lookup
(``index_in`` + ``take``), not a row loop or an all-to-all hash join.

A key missing from the table resolves to ``config.unresolved_category`` —
the unresolved-DNS / unknown-country analog.

Usage::

    tc_ref = ray.put(tool_categories_dict)   # once, on the driver
    rg_ref = ray.put(role_groups_dict)
    ds = ds.map_batches(EnrichActor, batch_format="pyarrow",
                        fn_constructor_kwargs=dict(
                            tool_categories=tc_ref, role_groups=rg_ref,
                            unresolved=cfg.unresolved_category),
                        concurrency=cfg.enrich_concurrency, num_cpus=1)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

ENRICHED_COLS = ["category", "grp"]


def _resolve(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


class _Lookup:
    """Vectorized dict lookup: key column → value column, miss → default."""

    def __init__(self, mapping: dict[str, str], default: str | None):
        keys = sorted(mapping)
        self.keys = pa.array(keys, pa.string())
        self.values = pa.array([mapping[k] for k in keys], pa.string())
        self.default = default

    def __call__(self, col) -> pa.Array:
        idx = pc.index_in(col, value_set=self.keys)
        taken = pc.take(self.values, idx)
        if self.default is not None:
            # miss (null idx) → default, but only where the key itself
            # was non-null: a null tool has no category at all.
            taken = pc.if_else(pc.is_valid(col),
                               pc.fill_null(taken, self.default), taken)
        return taken


class EnrichActor:
    """Actor-pool stage: appends category (tool→) and grp (role→) columns."""

    def __init__(self, tool_categories, role_groups,
                 unresolved: str = "Unresolved"):
        # ONCE per actor: materialize broadcast tables into Arrow arrays.
        self.tool_lookup = _Lookup(_resolve(tool_categories), unresolved)
        self.role_lookup = _Lookup(_resolve(role_groups), unresolved)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.append_column("category",
                                    self.tool_lookup(batch["tool_norm"]))
        batch = batch.append_column("grp", self.role_lookup(batch["role"]))
        return batch


def enrich_fn(tool_categories: dict, role_groups: dict,
              unresolved: str = "Unresolved"):
    """Stateless-closure variant for small/local runs and unit tests."""
    actor = EnrichActor(tool_categories, role_groups, unresolved)
    return actor.__call__
