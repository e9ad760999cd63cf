"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and
order-insensitive value equality. Non-SQL queries get a rows-only check.

Usage: python tools/check_oracle.py [sf_dir] [only-patterns] [sweep-out]

A FULL run (no ``only`` filter) also writes a sweep artifact —
``SWEEP_r{N}.json`` when ``sweep-out`` is given, recording per query
{ok|fail, rows, oracle|rows_only} plus summary counts — so a judge can
diff sweeps without re-running 960 queries (VERDICT r3 item 7).
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.uint64:
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, ours: pd.DataFrame, ref: pd.DataFrame) -> list[str]:
    errs = []
    if len(ours) != len(ref):
        errs.append(f"rows {len(ours)} != {len(ref)}")
    if sorted(ours.columns) != sorted(ref.columns):
        errs.append(f"schema {sorted(ours.columns)} != {sorted(ref.columns)}")
        return errs
    a, b = canon(ours), canon(ref)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (av.fillna("∅") == bv.fillna("∅")).all() \
                    if av.dtype == object else (av == bv).all()
            if not ok:
                bad = None
                try:
                    m = ~(av == bv)
                    bad = a[m].head(3), b[m].head(3)
                except Exception:
                    pass
                errs.append(f"values differ in {c}: {bad}")
    return errs


def main(sf_dir: str, only: str | None = None,
         sweep_out: str | None = None):
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_fail = 0
    pats = only.split(",") if only else None
    sweep: dict = {}
    for name, fn in qs.items():
        if pats and not any(p in name for p in pats):
            continue
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            sweep[name] = {"status": "fail", "rows": None,
                           "check": "query_raised",
                           "err": f"{type(ex).__name__}: {ex}"[:200]}
            n_fail += 1
            continue
        if name not in osql:
            print(f"ok   {name} (rows-only): {len(ours)} rows")
            sweep[name] = {"status": "ok", "rows": len(ours),
                           "check": "rows_only"}
            n_ok += 1
            continue
        try:
            ref = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            sweep[name] = {"status": "fail", "rows": len(ours),
                           "check": "oracle_raised",
                           "err": str(ex)[:200]}
            n_fail += 1
            continue
        errs = compare(name, ours, ref)
        if errs:
            print(f"FAIL {name}: " + "; ".join(str(e0) for e0 in errs))
            sweep[name] = {"status": "fail", "rows": len(ours),
                           "check": "oracle",
                           "err": "; ".join(str(e0) for e0 in errs)[:200]}
            n_fail += 1
        else:
            print(f"ok   {name}: {len(ours)} rows match oracle")
            sweep[name] = {"status": "ok", "rows": len(ours),
                           "check": "oracle"}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    if sweep_out and not pats:
        art = {"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_fail,
               "n_oracle": sum(1 for v in sweep.values()
                               if v["check"] == "oracle"
                               and v["status"] == "ok"),
               "n_rows_only": sum(1 for v in sweep.values()
                                  if v["check"] == "rows_only"),
               "queries": sweep}
        with open(sweep_out, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f"sweep artifact -> {sweep_out}")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1
                       else "/root/testdata/sf0.01",
                       sys.argv[2] if len(sys.argv) > 2 else None,
                       sys.argv[3] if len(sys.argv) > 3 else None) else 0)
