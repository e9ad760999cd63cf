"""User-extension surface: named batch stages (SURVEY.md §2.10).

The reference has no plugin/UDF API — its whole extension surface is
~100 config keys plus HTML snippet injection (webalizer.conf.sample).
The idiomatic Ray Data equivalent of "config is the API" is a registry
of NAMED batch transforms: a user registers an Arrow-table function
once at import time, lists its name in ``PipelineConfig.extra_stages``,
and the flagship splices it into pass 1 after enrichment as an ordinary
``map_batches`` — fully streaming, no engine changes. The refmodel
applies the identical function through an Arrow round-trip, so parity
tests cover extension stages exactly like built-ins.

Contract for a stage function: ``(pa.Table) -> pa.Table``; it may add
or rewrite columns but must keep one-row-in-one-row-out (conservation
metrics assume the route split is the only place rows disappear) and
must preserve the columns downstream stages read (see
flagship.PASS2_COLS).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

STAGE_REGISTRY: dict[str, Callable[[pa.Table], pa.Table]] = {}


def register_stage(name: str):
    """Decorator: ``@register_stage("my_stage")`` over an Arrow batch fn."""
    def deco(fn: Callable[[pa.Table], pa.Table]):
        STAGE_REGISTRY[name] = fn
        return fn
    return deco


def resolve_stages(names) -> list[Callable[[pa.Table], pa.Table]]:
    """Registry lookup with a loud failure for unknown names — a typo'd
    config must not silently skip a user's stage."""
    missing = [n for n in names if n not in STAGE_REGISTRY]
    if missing:
        raise KeyError(
            f"extra_stages {missing} not in the stage registry; "
            f"registered: {sorted(STAGE_REGISTRY)}")
    return [STAGE_REGISTRY[n] for n in names]


@register_stage("demo_double_kb")
def demo_double_kb(batch: pa.Table) -> pa.Table:
    """Reference extension stage (and the parity-test subject): doubles
    the kb measure. Shows the contract — rewrite parsed columns with
    Arrow kernels, one row in → one row out. NOTE: stage fns must live
    in an importable module (Ray workers unpickle them by reference)."""
    import pyarrow.compute as pc
    return batch.set_column(
        batch.schema.get_field_index("kb"), "kb",
        pc.multiply(batch["kb"], pa.scalar(2.0)))


def apply_stages_pandas(df, names):
    """Refmodel path: run the same Arrow stage fns over a pandas frame
    (Arrow round-trip) so engine/refmodel parity covers extensions."""
    if not names:
        return df
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    for fn in resolve_stages(names):
        tbl = fn(tbl)
    return tbl.to_pandas()
