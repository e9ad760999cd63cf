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


def read_parquet_unified(path: str, **read_kwargs) -> rd.Dataset:
    """Schema-evolution read: union-by-name over parquet files whose
    schemas differ (columns added over a store's lifetime).

    Plain ``read_parquet`` over a mixed-schema directory either fails
    or silently drops late columns depending on which file seeds the
    schema. Here the unified schema comes from FOOTERS ONLY (one
    metadata fetch per file on the driver — no data bytes), files are
    grouped by schema fingerprint, each group is read as its own
    streaming scan, aligned to the unified schema in a zero-copy Arrow
    pass (missing columns materialize as typed nulls), and the groups
    union — still lazy, still streaming, one task per file/row-group.
    Type conflicts across files resolve by permissive Arrow promotion
    (int → wider int/float); genuinely incompatible types raise at
    plan-build time, not mid-stream.
    """
    import pyarrow as pa

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    groups: dict[tuple, list[str]] = {}
    schemas: dict[tuple, pa.Schema] = {}
    for f in files:
        s = pq.ParquetFile(f).schema_arrow
        key = tuple((n, str(s.field(n).type)) for n in s.names)
        groups.setdefault(key, []).append(f)
        schemas[key] = s
    unified = pa.unify_schemas(list(schemas.values()),
                               promote_options="permissive")

    def align(target: pa.Schema):
        def fn(t: pa.Table) -> pa.Table:
            cols = []
            for field in target:
                if field.name in t.column_names:
                    cols.append(t[field.name].cast(field.type))
                else:
                    cols.append(pa.nulls(t.num_rows, field.type))
            return pa.table(dict(zip(target.names, cols)))
        return fn

    parts = [rd.read_parquet(fs, **read_kwargs)
             .map_batches(align(unified), batch_format="pyarrow")
             for fs in groups.values()]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def shard_balance_report(path: str) -> "pd.DataFrame":
    """File/shard balance diagnostics from parquet FOOTERS only (no
    data bytes): per-file rows and bytes plus the skew measures that
    predict stragglers at cluster scale — a 100 TB job is only as fast
    as its largest shard. Run before picking read parallelism or after
    a write to validate the layout (pairs with `run.py compact`).

    Returns one summary row: files, total rows/bytes, max/mean row
    ratio (straggler factor), coefficient of variation, and the share
    of rows held by the largest decile of files.
    """
    import numpy as np
    import pandas as pd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    rows = np.array([pq.ParquetFile(f).metadata.num_rows for f in files],
                    dtype=np.float64)
    size = np.array([os.path.getsize(f) for f in files], dtype=np.float64)
    mean = rows.mean()
    top = max(1, len(files) // 10)
    top_share = float(np.sort(rows)[::-1][:top].sum() / max(rows.sum(), 1))
    return pd.DataFrame({
        "files": [np.int64(len(files))],
        "total_rows": [np.int64(rows.sum())],
        "total_bytes": [np.int64(size.sum())],
        "straggler_factor": [round(float(rows.max() / max(mean, 1e-12)),
                                   4)],
        "rows_cv": [round(float(rows.std() / max(mean, 1e-12)), 4)],
        "top_decile_row_share": [round(top_share, 4)],
    })


def footer_aggregate(path: str, columns: list[str]) -> "pd.DataFrame":
    """COUNT(*) / MIN / MAX answered from parquet FOOTERS only.

    The aggregate-pushdown endgame of scan pruning: row-group
    statistics already hold the per-group row count and exact min/max
    for numeric / temporal columns, so these aggregates cost O(files)
    footer reads instead of O(rows) data bytes — at 100 TB that is the
    difference between milliseconds and a cluster-wide scan. Footer
    reads fan out as an ordinary Ray map_batches over the file list
    (each batch of paths collapses to ONE partial row), and the driver
    folds the per-batch partials.

    Exactness: parquet stats are exact for numeric/temporal physical
    types. Any (file, column) whose row group lacks min/max statistics
    (e.g. written with ``write_statistics=False``, or a long-string
    column whose stats the writer dropped) falls back to a pruned
    single-column scan of THAT file only — the answer is always exact;
    only the shortcut degrades. The test suite proves the shortcut is
    real by corrupting every data page in place (footer intact): the
    aggregate still answers while a full scan raises.

    Returns one row: ``n_rows`` plus ``<col>_min`` / ``<col>_max``.
    All-null columns yield None. Min/max ignore nulls (SQL semantics).
    """
    import numpy as np
    import pandas as pd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    cols = list(columns)

    def batch_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        import pyarrow.compute as pc_

        n = 0
        mins: dict[str, list] = {c: [] for c in cols}
        maxs: dict[str, list] = {c: [] for c in cols}
        for p in df["path"]:
            md = pq.ParquetFile(p).metadata
            n += md.num_rows
            idx = {md.row_group(0).column(i).path_in_schema: i
                   for i in range(md.row_group(0).num_columns)} \
                if md.num_row_groups else {}
            need_scan = []
            for c in cols:
                ok = md.num_row_groups > 0 and c in idx
                lo, hi = [], []
                if ok:
                    for g in range(md.num_row_groups):
                        col = md.row_group(g).column(idx[c])
                        st = col.statistics
                        if st is None or (not st.has_min_max
                                          and col.num_values > 0):
                            ok = False
                            break
                        if st.has_min_max:
                            lo.append(st.min)
                            hi.append(st.max)
                if ok:
                    mins[c].extend(lo)
                    maxs[c].extend(hi)
                else:
                    need_scan.append(c)
            if need_scan:  # exactness fallback: scan ONLY these columns
                t = pq.read_table(p, columns=need_scan)
                for c in need_scan:
                    mm = pc_.min_max(t[c])
                    if mm["min"].is_valid:
                        mins[c].append(mm["min"].as_py())
                        maxs[c].append(mm["max"].as_py())
        row: dict = {"n_rows": np.int64(n)}
        for c in cols:
            row[f"{c}_min"] = [min(mins[c]) if mins[c] else None]
            row[f"{c}_max"] = [max(maxs[c]) if maxs[c] else None]
        return pd.DataFrame(row)

    parts = rd.from_items([{"path": p} for p in files]) \
        .map_batches(batch_partial, batch_format="pandas").to_pandas()
    out = {"n_rows": np.int64(parts["n_rows"].sum())}
    for c in cols:
        lo = [v for v in parts[f"{c}_min"] if v is not None]
        hi = [v for v in parts[f"{c}_max"] if v is not None]
        out[f"{c}_min"] = [min(lo) if lo else None]
        out[f"{c}_max"] = [max(hi) if hi else None]
    return pd.DataFrame(out)
