"""Per-partition checkpoint / resume — the ``webalizer.current`` analog.

The reference checkpoints its ENTIRE in-memory state (all hash tables +
counters + the ``cur_tstamp`` watermark) into one text file at end of run
(preserve.c:save_state() ≈100–600 [verify]) and on resume skips every
record older than the watermark (webalizer.c main-loop check vs
cur_tstamp [verify]) — exactly-once across overlapping month-to-date log
feeds, but all-or-nothing: a crash mid-month loses everything since the
last full run.

Our re-expression is PARTITIONED and idempotent (SURVEY.md §4.3):

  pass 1 (parse+enrich) commits per input *unit* (one unit per input
  parquet file — the deterministic partition plan). A unit's output goes
  to ``out/parsed/unit=<key>/route=*/bucket=*`` via a tmp-dir + atomic
  rename, then a manifest JSON commits it:
      state/pass1/unit-<key>.json
        {unit, digest(inputs), inputs, rows{in,ok,bad,ignored},
         max_ts watermark, wall_s}
  Resume skips units whose manifest digest matches the current input
  file — re-feeding an already-processed log is a no-op (the reference's
  no-double-count contract, record-free: file identity, not record
  timestamps, is the dedup key — never record-level dedup at 10^12).

  pass 2 (sessionize+aggregate) commits per conv_id *bucket*. Each bucket
  task reads that bucket's rows from ALL committed units (a conversation
  never spans buckets — the explicit hash partitioning), writes its
  deterministic row-level outputs (idempotent on retry), writes its
  small-sink partial aggregates to state/partials/bucket-<id>.parquet,
  then commits a manifest carrying LINEAGE — the exact set of
  (unit, digest) pairs it consumed — plus metrics:
      state/pass2/bucket-<id>.json
        {bucket, lineage[{unit,digest}], rows, sessions, convs,
         max_ts, wall_s}
  Resume recomputes a bucket iff its lineage differs from the current
  committed-unit set (new log data arrived for that bucket) or its
  manifest/partial is missing (killed mid-commit). Committed buckets'
  partials are loaded from Parquet — no recompute, no double count.

  finalize is a cheap, idempotent driver-side combine of the per-bucket
  partials (always re-run; it holds no state of its own).

Commit ordering guarantees: outputs → partial → manifest (the manifest is
the commit point, written tmp+rename). A kill at ANY point leaves either
an uncommitted unit/bucket (fully recomputed on resume, outputs
overwritten deterministically) or a committed one (skipped entirely).

Lineage identity stays at bucket granularity, but a bucket whose data is
big enough to split (k >= flagship.PRESPLIT_MIN_K by bytes) runs the same
TWO-STAGE presplit as the non-resumable path: stage A sessionizes the
bucket ONCE and writes k slice files plus the bucket stats; k cheap slice
tasks aggregate. The bucket's long partial and manifest are then written
by the DRIVER after every slice commits — the commit point is unchanged
(partial → manifest, tmp+rename), so a kill anywhere inside the split
leaves an uncommitted bucket that is simply recomputed.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from webalizer_ray.config import DEFAULT_CONFIG, PipelineConfig
from webalizer_ray.pipelines.flagship import (
    PRESPLIT_MIN_K,
    _empty_long,
    _finish_slice,
    _presplit_path,
    _presplit_table,
    _write_atomic,
    finalize_sinks,
    parse_enrich_dataset,
    process_bucket_frame,
    write_bucket_outputs,
)
from webalizer_ray.sources.readers import read_lookup_dicts, turns_path


# ---------------------------------------------------------------------------
# manifest + digest helpers
# ---------------------------------------------------------------------------

def _digest(parts) -> str:
    h = hashlib.sha1()
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


def _write_json_atomic(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _file_max_ts(path: str) -> str | None:
    """Max ``ts`` from parquet row-group statistics — zero data read."""
    try:
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index("ts")
        vals = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                vals.append(st.max)
        return str(max(vals)) if vals else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# partition plan (pass 1 units)
# ---------------------------------------------------------------------------

def plan_units(input_dir: str) -> list[dict]:
    """Deterministic partition plan: one unit per input parquet file.

    Unit identity derives from the file NAME (stable when new log files
    are added later — the incremental-feed case); the digest adds the
    file size so a rewritten file forces recompute.
    """
    files = sorted(glob.glob(os.path.join(turns_path(input_dir),
                                          "*.parquet")))
    units = []
    for f in files:
        base = os.path.basename(f)
        st = os.stat(f)
        units.append({
            "unit": _digest([base]),
            "inputs": [base],
            "paths": [f],
            # size + mtime_ns: a same-size in-place rewrite still forces
            # recompute. Known limitation (documented, mirrors feeding a
            # renamed log to the reference without its watermark): a
            # ROTATED file re-fed under a new name is a new unit and
            # would double-count — feed stable file names.
            "digest": _digest([(base, st.st_size, st.st_mtime_ns)]),
        })
    return units


def _pass1_manifest_path(out_dir: str, unit: str) -> str:
    return os.path.join(out_dir, "state", "pass1", f"unit-{unit}.json")


def _pass2_manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "state", "pass2",
                        f"bucket-{bucket:05d}.json")


def _partial_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "state", "partials",
                        f"bucket-{bucket:05d}.parquet")


def _count_dir(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    return pads.dataset(path).count_rows()


# ---------------------------------------------------------------------------
# pass 1 — resumable parse+enrich, committed per unit
# ---------------------------------------------------------------------------

def run_parse_pass_resumable(input_dir: str, out_dir: str,
                             config: PipelineConfig = DEFAULT_CONFIG,
                             lookups: tuple[dict, dict] | None = None,
                             use_actors: bool = True) -> dict:
    """Parse+enrich every uncommitted unit; returns resume statistics."""
    if lookups is None:
        lookups = read_lookup_dicts(input_dir)
    parsed_root = os.path.join(out_dir, "parsed")
    os.makedirs(parsed_root, exist_ok=True)
    # a kill mid-write leaves tmp dirs — never read, always safe to drop
    for junk in glob.glob(os.path.join(parsed_root, "_tmp_*")):
        shutil.rmtree(junk, ignore_errors=True)

    units = plan_units(input_dir)
    # retire units whose input file vanished: drop manifest + parsed dir
    # so the affected buckets' lineage changes and they recompute (the
    # reference re-derives all state from the fed log; a deleted log must
    # not leave its rows in the sinks forever)
    live_units = {u["unit"] for u in units}
    retired = []
    for mp in glob.glob(os.path.join(out_dir, "state", "pass1", "*.json")):
        man = _read_json(mp)
        unit = (man or {}).get("unit") or \
            os.path.basename(mp)[len("unit-"):-len(".json")]
        if unit not in live_units:
            shutil.rmtree(os.path.join(parsed_root, f"unit={unit}"),
                          ignore_errors=True)
            os.remove(mp)
            retired.append(unit)
    skipped, recomputed = [], []
    for u in units:
        man = _read_json(_pass1_manifest_path(out_dir, u["unit"]))
        dest = os.path.join(parsed_root, f"unit={u['unit']}")
        if man and man.get("digest") == u["digest"] and os.path.isdir(dest):
            skipped.append(u["unit"])
            continue
        t0 = time.perf_counter()
        tmp = os.path.join(parsed_root, f"_tmp_{u['unit']}")
        shutil.rmtree(tmp, ignore_errors=True)
        n_in = sum(pq.ParquetFile(p).metadata.num_rows for p in u["paths"])
        ds = parse_enrich_dataset(u["paths"], config, lookups, use_actors)
        ds.write_parquet(tmp, partition_cols=["route", "bucket"],
                         compression="zstd")
        if os.path.isdir(dest):       # stale version (input file rewritten)
            shutil.rmtree(dest)
        os.replace(tmp, dest)
        rows = {r: _count_dir(os.path.join(dest, f"route={r}"))
                for r in ("ok", "bad", "ignored")}
        rows["in"] = n_in
        _write_json_atomic({
            "unit": u["unit"], "digest": u["digest"], "inputs": u["inputs"],
            "rows": rows,
            "max_ts": max(filter(None, (_file_max_ts(p) for p in u["paths"])),
                          default=None),
            "wall_s": round(time.perf_counter() - t0, 3),
        }, _pass1_manifest_path(out_dir, u["unit"]))
        recomputed.append(u["unit"])
    return {"units": len(units), "skipped": skipped,
            "recomputed": recomputed, "retired": retired}


# ---------------------------------------------------------------------------
# pass 2 — resumable per-bucket sessionize+aggregate with lineage
# ---------------------------------------------------------------------------

def _bucket_lineage(out_dir: str) -> dict[int, list[list[str]]]:
    """bucket → sorted [(unit, digest)] of committed units containing it."""
    unit_digest = {}
    for mp in glob.glob(os.path.join(out_dir, "state", "pass1", "*.json")):
        man = _read_json(mp)
        if man:
            unit_digest[man["unit"]] = man["digest"]
    lineage: dict[int, list[list[str]]] = {}
    for d in glob.glob(os.path.join(out_dir, "parsed", "unit=*",
                                    "route=ok", "bucket=*")):
        parts = d.split(os.sep)
        unit = parts[-3].split("=", 1)[1]
        bucket = int(parts[-1].split("=", 1)[1])
        if unit in unit_digest:
            lineage.setdefault(bucket, []).append([unit, unit_digest[unit]])
    return {b: sorted(v) for b, v in lineage.items()}


def _slice_long_path(out_dir: str, bucket: int, rem: int) -> str:
    return os.path.join(out_dir, "state", "pass2_parts",
                        f"long-{bucket:05d}-{rem}.parquet")


def _bucket_files(dirs: list[str]) -> list[str]:
    return sorted(f for d in dirs for f in
                  glob.glob(os.path.join(d, "**", "*.parquet"),
                            recursive=True))


def _make_ckpt_bucket_task(out_dir: str, config: PipelineConfig):
    """map_batches fn over resumable pass-2 work items → long partials.

    Three item kinds mirror flagship.make_bucket_task: ``whole`` reads,
    sessionizes, aggregates and COMMITS one bucket; ``presplit`` is
    stage A for a big bucket (slices + stats marker row, no commit);
    ``slice`` aggregates one presplit slice and writes its outputs +
    slice-long file — the driver commits the bucket once all k landed.
    """
    def task(batch: pd.DataFrame) -> pd.DataFrame:
        longs = []
        for _, row in batch.iterrows():
            bucket = int(row["bucket"])
            kind = row.get("kind", "whole")
            t0 = time.perf_counter()
            from webalizer_ray.pipelines.flagship import PASS2_COLS, \
                _long_rows
            if kind == "presplit":
                # one task per big bucket (there are few): let ITS scan
                # use the Arrow thread pool, unlike the wide stages
                tbl = pads.dataset(_bucket_files(json.loads(row["dirs"]))) \
                    .scanner(columns=PASS2_COLS, use_threads=True) \
                    .to_table()
                shared, stats = _presplit_table(tbl, bucket, int(row["k"]),
                                                out_dir, config)
                stats["shared"] = shared
                stats["wall_s"] = round(time.perf_counter() - t0, 3)
                longs.append(_long_rows(
                    "_presplit", [str(bucket)],
                    np.array([int(row["k"])], dtype=np.int64),
                    sub=json.dumps(stats)))
                continue
            if kind == "slice":
                rem = int(row["rem"])
                turns = pq.read_table(
                    _presplit_path(out_dir, bucket, rem)).to_pandas()
                res = _finish_slice(turns, set(json.loads(row["shared"])),
                                    config)
                write_bucket_outputs(res, out_dir, bucket, part=rem)
                _write_atomic(res["long"],
                              _slice_long_path(out_dir, bucket, rem))
                continue
            # whole bucket: single-threaded scan — one bucket task per
            # core already; per-task Arrow pools would oversubscribe
            tbl = pads.dataset(_bucket_files(json.loads(row["dirs"]))) \
                .scanner(columns=PASS2_COLS, use_threads=False).to_table()
            res = process_bucket_frame(tbl, config)
            write_bucket_outputs(res, out_dir, bucket)
            _write_atomic(res["long"], _partial_path(out_dir, bucket))
            _write_json_atomic({
                "bucket": bucket, "lineage": json.loads(row["lineage"]),
                "rows": int(len(res["turns_ok"])),
                "seq_dropped": int(len(res["turns_seq"])),
                "sessions": int(len(res["sessions"])),
                "convs": int(len(res["per_conv"])),
                "max_ts": (str(res["turns_ok"]["ts"].max())
                           if len(res["turns_ok"]) else None),
                "wall_s": round(time.perf_counter() - t0, 3),
            }, _pass2_manifest_path(out_dir, bucket))
            longs.append(res["long"])
        out = pd.concat(longs, ignore_index=True) if longs else _empty_long()
        return out if len(out) else _empty_long()
    return task


def run_bucket_pass_resumable(out_dir: str,
                              config: PipelineConfig = DEFAULT_CONFIG
                              ) -> tuple[pd.DataFrame, dict]:
    """Sessionize+aggregate uncommitted/stale buckets; load the rest."""
    lineage = _bucket_lineage(out_dir)
    # drop row-level outputs of buckets no longer in lineage (an input
    # unit was rewritten away): finalize's recursive reads must see only
    # live partitions or sessions/per_conv would disagree with the
    # lineage-filtered small sinks
    live = {f"bucket={b:05d}" for b in lineage}
    for sub in ("turns/route=ok", "turns/route=seq", "sessions",
                "per_conv", "per_conv_top"):
        for d in glob.glob(os.path.join(out_dir, sub, "bucket=*")):
            if os.path.basename(d) not in live:
                shutil.rmtree(d, ignore_errors=True)
    todo, cached = [], []
    for bucket, lin in sorted(lineage.items()):
        man = _read_json(_pass2_manifest_path(out_dir, bucket))
        partial = _partial_path(out_dir, bucket)
        if (man and sorted(map(list, man.get("lineage", []))) == lin
                and os.path.exists(partial)):
            cached.append(bucket)
            continue
        # recompute (stale lineage, or killed mid-commit): clear the
        # bucket's outputs + split scratch first so an attempt that
        # writes fewer parts (no seq rows, different split k) leaves
        # no orphans
        for sub in ("turns/route=ok", "turns/route=seq", "sessions",
                    "per_conv", "per_conv_top", "presplit"):
            shutil.rmtree(os.path.join(out_dir, sub, f"bucket={bucket:05d}"),
                          ignore_errors=True)
        for p in glob.glob(_slice_long_path(out_dir, bucket, 0)
                           .replace("-0.parquet", "-*.parquet")):
            os.remove(p)
        unit_set = {u for u, _ in lin}
        # hive dirs from write_parquet are unpadded (bucket=3)
        dirs = sorted(
            d for d in glob.glob(os.path.join(
                out_dir, "parsed", "unit=*", "route=ok", "bucket=*"))
            if int(d.split(os.sep)[-1].split("=", 1)[1]) == bucket
            and d.split(os.sep)[-3].split("=", 1)[1] in unit_set)
        size = sum(os.path.getsize(f) for f in _bucket_files(dirs))
        k = min(16, max(1, -(-size // config.bucket_split_target_bytes)))
        todo.append({"bucket": bucket, "dirs": json.dumps(dirs),
                     "lineage": json.dumps(lin),
                     "kind": "presplit" if k >= PRESPLIT_MIN_K else "whole",
                     "k": k, "rem": 0, "shared": "[]"})

    longs = []
    split_stats: dict[int, dict] = {}
    if todo:
        # job 1: whole-bucket items (self-committing) + stage-A presplit
        # items for big buckets, TOGETHER — stage A overlaps the
        # independent whole-bucket work. Presplit items first so the
        # long stage-A tasks start immediately.
        job1 = sorted(todo, key=lambda it: it["kind"] != "presplit")
        fresh = (rd.from_items(job1, override_num_blocks=len(job1))
                 .map_batches(_make_ckpt_bucket_task(out_dir, config),
                              batch_format="pandas", batch_size=1)
                 .to_pandas())
        slice_items = []
        if "sink" in fresh.columns and len(fresh):
            marker = fresh["sink"] == "_presplit"
            for _, m in fresh[marker].iterrows():
                b, k = int(m["key"]), int(m["hits"])
                st = json.loads(m["sub"])
                split_stats[b] = st
                shared = json.dumps(st.pop("shared"))
                slice_items.extend(
                    {"bucket": b, "dirs": "[]", "lineage": "[]",
                     "kind": "slice", "k": k, "rem": r, "shared": shared}
                    for r in range(k))
            fresh = fresh[~marker]
            if len(fresh):
                longs.append(fresh)
        if slice_items:
            (rd.from_items(slice_items, override_num_blocks=len(slice_items))
             .map_batches(_make_ckpt_bucket_task(out_dir, config),
                          batch_format="pandas", batch_size=1)
             .materialize())
        # driver-side commit of each split bucket: merge the k slice
        # longs → the canonical partial, THEN the manifest (same
        # partial-before-manifest commit point as the whole path)
        by_bucket = {it["bucket"]: it for it in todo}
        for b, st in sorted(split_stats.items()):
            k = by_bucket[b]["k"]
            parts = [pq.read_table(_slice_long_path(out_dir, b, r))
                     .to_pandas() for r in range(k)]
            merged = pd.concat([p for p in parts if len(p)],
                               ignore_index=True)
            if not len(merged):
                merged = _empty_long()
            _write_atomic(merged, _partial_path(out_dir, b))
            _write_json_atomic(
                {"bucket": b, "lineage": json.loads(by_bucket[b]["lineage"]),
                 **st, "presplit_k": k},
                _pass2_manifest_path(out_dir, b))
            for r in range(k):
                os.remove(_slice_long_path(out_dir, b, r))
            shutil.rmtree(os.path.join(out_dir, "presplit",
                                       f"bucket={b:05d}"),
                          ignore_errors=True)
            longs.append(merged)
    for bucket in cached:
        p = pq.read_table(_partial_path(out_dir, bucket)).to_pandas()
        if len(p):
            longs.append(p)
    long = (pd.concat(longs, ignore_index=True) if longs else _empty_long())
    stats = {"buckets": len(lineage), "cached": cached,
             "recomputed": [t["bucket"] for t in todo],
             "presplit": sorted(split_stats)}
    return long, stats


# ---------------------------------------------------------------------------
# end-to-end resumable run
# ---------------------------------------------------------------------------

def run_flagship_resumable(input_dir: str, out_dir: str,
                           config: PipelineConfig = DEFAULT_CONFIG,
                           lookups: tuple[dict, dict] | None = None,
                           use_actors: bool = True) -> dict:
    """Resumable flagship: kill at any point, rerun, get identical sinks.

    Returns {'metrics', 'sinks', 'resume': {pass1, pass2}} — 'resume'
    reports what was skipped vs recomputed so callers (and tests) can
    verify the no-double-count contract.
    """
    p1 = run_parse_pass_resumable(input_dir, out_dir, config, lookups,
                                  use_actors)
    long, p2 = run_bucket_pass_resumable(out_dir, config)
    sinks = finalize_sinks(long, out_dir, config)

    rows = {"in": 0, "ok": 0, "bad": 0, "ignored": 0}
    watermark = None
    for mp in glob.glob(os.path.join(out_dir, "state", "pass1", "*.json")):
        man = _read_json(mp)
        if man:
            for k in rows:
                rows[k] += man["rows"].get(k, 0)
            if man.get("max_ts"):
                watermark = max(watermark or man["max_ts"], man["max_ts"])
    seq = sum((_read_json(mp) or {}).get("seq_dropped", 0)
              for mp in glob.glob(os.path.join(out_dir, "state", "pass2",
                                               "*.json")))
    metrics = {
        "total_rec": rows["in"], "bad": rows["bad"],
        "ignored_pattern": rows["ignored"], "ignored_seq": seq,
        "ignored": rows["ignored"] + seq,
        "parsed": rows["ok"] - seq,
        "sessions": int(len(sinks["sessions"])),
        "convs": int(sinks["_meta"].get("convs", 0)),
        "watermark": watermark,
    }
    _write_json_atomic(metrics, os.path.join(out_dir, "metrics.json"))
    _write_json_atomic({
        "metrics": metrics,
        "pass1": {"units": p1["units"], "skipped": len(p1["skipped"]),
                  "recomputed": len(p1["recomputed"])},
        "pass2": {"buckets": p2["buckets"], "cached": len(p2["cached"]),
                  "recomputed": len(p2["recomputed"])},
    }, os.path.join(out_dir, "state", "run_manifest.json"))
    return {"metrics": metrics, "sinks": sinks, "out_dir": out_dir,
            "resume": {"pass1": p1, "pass2": p2}}
