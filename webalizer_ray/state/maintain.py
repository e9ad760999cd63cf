"""Table maintenance: TTL retention expiry and small-file compaction.

Two jobs every 100 TB parquet lake runs on a schedule; both are
footer-driven so their cost scales with the files they must CHANGE,
not with table size (SURVEY.md §2.1 S11's "state lives in files"
philosophy applied to the lake itself; the reference's analog is the
monthly state roll-off that drops expired months from the history).

* ``apply_retention(dir, ts_col, cutoff)`` — row-level TTL. Each
  file is classified from its parquet FOOTER statistics alone:
  max(ts) < cutoff  → the whole file is expired, unlink (zero data
  bytes read); min(ts) >= cutoff → wholly retained, byte-untouched;
  straddling files are rewritten minus the expired rows via
  tmp+rename. At steady state almost every file is wholly in or out
  (time-partitioned writes put neighbors together), so a daily TTL
  pass reads only the boundary files.

* ``compact_dir(dir, target_rows)`` — bin-packs small files into
  ~target_rows outputs. Row counts come from footers; files already
  at/above half the target stay untouched. Each bin is rewritten by
  one task with a SELF-HEALING two-phase publish:

      1. combined data → ``.cmp-<digest>.staging`` (invisible)
      2. manifest ``.cmp-<digest>.json`` (atomic tmp+rename) listing
         the source files — the commit point
      3. staging → ``compact-<digest>.parquet`` (atomic)
      4. unlink sources, remove manifest

  A crash anywhere leaves a recoverable state: ``recover_compaction``
  (always run first) finishes any manifest's publish + deletes, and
  garbage-collects orphan staging files that never reached their
  commit point. Single-writer per directory; concurrent READERS may
  transiently see a bin's rows twice between steps 3 and 4 — run
  compaction in a maintenance window or behind the versioned store.

Both return per-file accounting frames for audit.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd


def _files(path: str) -> list[str]:
    return sorted(
        os.path.join(root, f)
        for root, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet"))


def _ts_bounds(path: str, ts_col: str):
    """(min, max) of ``ts_col`` from row-group stats; (None, None) if
    any group lacks stats (caller must then treat the file as
    straddling — never classify blind)."""
    md = pq.read_metadata(path)
    names = md.schema.names  # flat leaf-column order = stats order
    idx = {n: i for i, n in enumerate(names)}
    if ts_col not in idx:
        raise KeyError(f"{path} has no column {ts_col!r}")
    lo = hi = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx[ts_col]).statistics
        if st is None or not st.has_min_max:
            return None, None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def apply_retention(table_dir: str, ts_col: str, cutoff) -> pd.DataFrame:
    """Delete rows with ``ts_col < cutoff``. Returns a frame of
    (file, action ∈ {deleted, kept, rewritten}, removed)."""
    cutoff = pd.Timestamp(cutoff)
    plans = []
    for p in _files(table_dir):
        lo, hi = _ts_bounds(p, ts_col)
        if hi is not None and pd.Timestamp(hi) < cutoff:
            plans.append({"path": p, "action": "delete"})
        elif lo is not None and pd.Timestamp(lo) >= cutoff:
            plans.append({"path": p, "action": "keep"})
        else:
            plans.append({"path": p, "action": "rewrite"})

    cut64 = np.datetime64(cutoff.to_datetime64())

    def work(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p, action in zip(df["path"], df["action"]):
            if action == "delete":
                n = pq.read_metadata(p).num_rows
                os.unlink(p)
                out.append({"file": os.path.basename(p),
                            "action": "deleted",
                            "removed": np.int64(n)})
            elif action == "keep":
                out.append({"file": os.path.basename(p),
                            "action": "kept", "removed": np.int64(0)})
            else:
                t = pq.read_table(p)
                ts = np.asarray(t[ts_col], dtype="datetime64[ns]")
                keep = ts >= cut64
                n_rm = int((~keep).sum())
                if n_rm:
                    import pyarrow as pa
                    tmp = p + f".{os.getpid()}.ttl.tmp"
                    pq.write_table(t.filter(pa.array(keep)), tmp)
                    os.replace(tmp, p)
                out.append({"file": os.path.basename(p),
                            "action": "rewritten" if n_rm else "kept",
                            "removed": np.int64(n_rm)})
        return pd.DataFrame(out)

    if not plans:
        return pd.DataFrame(columns=["file", "action", "removed"])
    rep = rd.from_items(plans).map_batches(work, batch_format="pandas") \
        .to_pandas()
    return rep.sort_values("file", ignore_index=True)


def _manifest_paths(table_dir: str) -> list[str]:
    return sorted(os.path.join(table_dir, f)
                  for f in os.listdir(table_dir)
                  if f.startswith(".cmp-") and f.endswith(".json"))


def recover_compaction(table_dir: str) -> dict:
    """Finish or roll back interrupted compactions (idempotent).

    Manifest present ⇒ its bin is committed: publish the staging file
    if the final doesn't exist yet, delete surviving sources, drop the
    manifest. Staging without a manifest never committed ⇒ unlink."""
    finished, orphans = 0, 0
    for m in _manifest_paths(table_dir):
        spec = json.load(open(m))
        final = os.path.join(table_dir, spec["final"])
        staging = os.path.join(table_dir, spec["staging"])
        if not os.path.exists(final):
            os.replace(staging, final)
        elif os.path.exists(staging):
            os.unlink(staging)
        for s in spec["sources"]:
            sp = os.path.join(table_dir, s)
            if os.path.exists(sp):
                os.unlink(sp)
        os.unlink(m)
        finished += 1
    for f in os.listdir(table_dir):
        if f.startswith(".cmp-") and f.endswith(".staging"):
            os.unlink(os.path.join(table_dir, f))
            orphans += 1
    return {"finished": finished, "orphans_removed": orphans}


def compact_dir(table_dir: str, target_rows: int = 1_000_000) \
        -> pd.DataFrame:
    """Bin-pack small files (< target_rows/2) into ~target_rows
    outputs. Returns (file, action ∈ {kept, compacted}, bin)."""
    recover_compaction(table_dir)
    sizes = [(p, pq.read_metadata(p).num_rows)
             for p in _files(table_dir)]
    bins, cur, cur_rows = [], [], 0
    report = []
    for p, n in sizes:
        if n >= target_rows // 2:
            report.append({"file": os.path.basename(p),
                           "action": "kept", "bin": np.int64(-1)})
            continue
        cur.append(p)
        cur_rows += n
        if cur_rows >= target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
    if cur:
        bins.append(cur)
    # a 1-file bin would rewrite bytes for nothing
    for i, b in enumerate(list(bins)):
        if len(b) == 1:
            report.append({"file": os.path.basename(b[0]),
                           "action": "kept", "bin": np.int64(-1)})
    bins = [b for b in bins if len(b) > 1]

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        out = []
        for i, srcs in zip(df["bin"], df["sources"]):
            srcs = list(srcs)
            digest = hashlib.sha256(
                "\n".join(os.path.basename(s) for s in srcs)
                .encode()).hexdigest()[:16]
            final = f"compact-{digest}.parquet"
            staging = os.path.join(table_dir, f".cmp-{digest}.staging")
            t = pa.concat_tables([pq.read_table(s) for s in srcs],
                                 promote_options="default")
            pq.write_table(t, staging)
            mtmp = os.path.join(table_dir,
                                f".cmp-{digest}.json.{os.getpid()}.tmp")
            with open(mtmp, "w") as f:
                json.dump({"final": final,
                           "staging": os.path.basename(staging),
                           "sources": [os.path.basename(s)
                                       for s in srcs]}, f)
            os.replace(mtmp, os.path.join(table_dir,
                                          f".cmp-{digest}.json"))
            os.replace(staging, os.path.join(table_dir, final))
            for s in srcs:
                os.unlink(s)
            os.unlink(os.path.join(table_dir, f".cmp-{digest}.json"))
            for s in srcs:
                out.append({"file": os.path.basename(s),
                            "action": "compacted", "bin": np.int64(i)})
        return pd.DataFrame(out)

    if bins:
        items = [{"bin": i, "sources": b} for i, b in enumerate(bins)]
        rep = rd.from_items(items).map_batches(
            pack, batch_format="pandas").to_pandas()
        report.extend(rep.to_dict("records"))
    out = pd.DataFrame(report, columns=["file", "action", "bin"])
    out["bin"] = out["bin"].astype(np.int64)
    return out.sort_values("file", ignore_index=True)
