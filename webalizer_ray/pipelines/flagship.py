"""Flagship pipeline: parse → enrich → route → sessionize → aggregate.

The Ray-Data re-expression of the reference's whole main pass
(webalizer.c:main() record loop ≈3400–3600 + output.c report emission
[verify]) as TWO streaming passes over Parquet plus a tiny driver
finalize:

  pass 1  read_parquet(turns) → map_batches(parse) → map_batches(Enrich
          actor pool) → write_parquet(out/parsed,
          partition_cols=[route, bucket]).
          The single full-data pass (regex parse over the wide ``text``
          column dominates at 100 TB). The hive-partitioned write IS the
          conv_id hash shuffle ("write shuffle"): bad/ignored rows land in
          their route dirs, ok rows land in bucket=hash(conv_id)%B dirs —
          measured ~4× cheaper than Ray's sort-based groupby shuffle of
          the same rows, and the layout doubles as the resume point
          (state/checkpoint.py processes buckets independently).

  pass 2  one task per (bucket dir, conv-hash residue): read the
          bucket's WORKING columns only (text stays on disk — pass 1's
          parsed/route=* IS the routed row store), sessionize on
          dictionary codes + int64 arrays (no Python string objects on
          multi-million-row buckets), write the (conv_id, turn_idx,
          session_id) annotation + sessions + per_conv + per-bucket
          top-N partials under deterministic names (idempotent on
          retry), and RETURN long-format small-sink partials. Because a
          conversation lives in exactly one (bucket, residue), session
          tables, per-conv aggregates and conv-distinct counts are
          globally exact with no further shuffle. A bucket dir too big
          for one task (k ≥ PRESPLIT_MIN_K) takes the TWO-STAGE path:
          a stage-A task — overlapped with the independent bucket work
          in the same job — sessionizes the dir ONCE and writes k slice
          files; k cheap tasks then aggregate the slices (normal convs
          split by conv-hash residue, giant convs by session_id % k —
          whole sessions only, so every aggregate stays exact).

  finalize  driver-side pandas combine of the per-bucket partials
          (B × keys rows — tiny next to the data; at 10^12 turns this
          combine can itself ride aggregate.bucket_combine) → daily /
          monthly / per_tool / ... sinks + deterministic top-N (from the
          per-bucket top partials, never the full per_conv table) +
          Parquet report outputs (the HTML/TSV analogs, S6–S9).

Skew note (north_rule): small-sink partials collapse every bucket to one
row per key, so a hot conversation (20 % of all rows) costs one bucket
extra compute, never a hot shuffle partition; a conversation too big for
one bucket task is session-split across slice tasks by the presplit path
(chunk_sessionize_frame remains the in-frame chunk-merge primitive).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd

from webalizer_ray.config import DEFAULT_CONFIG, PipelineConfig
from webalizer_ray.sources.readers import read_lookup_dicts, read_turns
from webalizer_ray.stages.enrich import EnrichActor, enrich_fn
from webalizer_ray.stages.parse import make_parse_fn
from webalizer_ray.stages.session import SESSION_COLS, sessionize_arrays
from webalizer_ray.stages.topn import top_n_pandas

#: small aggregate sinks computed per bucket: sink → turns key column
SMALL_AGG_KEYS = {
    "hourly": "hour", "daily": "date", "monthly": "month",
    "per_tool": "tool_norm", "per_role": "role", "per_grp": "grp",
    "per_category": "category", "status_hist": "status",
    "status_class_hist": "status_class",
}
#: conv-distinct counts (exact per bucket — convs never span buckets)
CONV_DISTINCT_SPECS = {
    "daily_convs": "date", "monthly_convs": "month",
    "category_convs": "category",
}

LONG_COLS = ["sink", "key", "sub", "hits", "files", "pages", "kb"]


def _empty_long() -> pd.DataFrame:
    return pd.DataFrame({
        "sink": pd.Series(dtype=object), "key": pd.Series(dtype=object),
        "sub": pd.Series(dtype=object), "hits": pd.Series(dtype="int64"),
        "files": pd.Series(dtype="int64"), "pages": pd.Series(dtype="int64"),
        "kb": pd.Series(dtype="float64")})


def _long_rows(sink, key, hits, files=None, pages=None, kb=None, sub=""):
    n = len(key)
    z = np.zeros(n, dtype=np.int64)
    return pd.DataFrame({
        "sink": sink, "key": np.asarray(key, dtype=object),
        "sub": sub if not isinstance(sub, (pd.Series, np.ndarray))
        else np.asarray(sub, dtype=object),
        "hits": np.asarray(hits, dtype=np.int64),
        "files": z if files is None else np.asarray(files, dtype=np.int64),
        "pages": z if pages is None else np.asarray(pages, dtype=np.int64),
        "kb": np.zeros(n) if kb is None else np.asarray(kb, dtype=np.float64),
    })


def sessions_from_sorted(ok: pd.DataFrame) -> pd.DataFrame:
    """Sessions table from whole-conversation, (conv,turn_idx)-sorted turns.

    Direct vectorized aggregation — no partial/combine needed because the
    bucket holds every turn of its conversations. pandas groupby
    first/last skip NaN, giving first/last non-null tool (entry/exit page
    analog, webalizer.c:update_entry()/update_exit() [verify]).
    """
    g = ok[["conv_id", "session_id", "ts", "kb", "is_file", "is_content",
            "tool_norm"]].groupby(["conv_id", "session_id"], sort=True)
    out = g.agg(start_ts=("ts", "first"), end_ts=("ts", "last"),
                n_turns=("ts", "size"), kb=("kb", "sum"),
                files=("is_file", "sum"), pages=("is_content", "sum"),
                entry_tool=("tool_norm", "first"),
                exit_tool=("tool_norm", "last")).reset_index()
    out["month"] = out["start_ts"].dt.strftime("%Y-%m")
    out["date"] = out["start_ts"].dt.strftime("%Y-%m-%d")
    for c in ("n_turns", "files", "pages"):
        out[c] = out[c].astype(np.int64)
    return out[SESSION_COLS]


def bucket_partials(ok: pd.DataFrame, sess: pd.DataFrame,
                    shared_convs: set | None = None) -> pd.DataFrame:
    """Long-format small-sink rows for one bucket slice.

    ``shared_convs``: conv_ids whose SESSIONS are split across residue
    tasks (the giant-conv decomposition). Their conv-distinct
    contributions are emitted as (key, conv) PAIR rows — deduplicated at
    finalize — because two slices of the same conv may touch the same
    date/month/category. Non-shared convs stay exact-per-slice. Giants
    are few by definition, so the pair channel stays tiny at any scale.
    """
    frames = []
    for sink, key in SMALL_AGG_KEYS.items():
        # slim before dropna/groupby: dropping nulls on the 16-column
        # frame copies every column, nine times per bucket
        sub = ok[[key, "ts", "is_file", "is_content", "kb"]]
        if sub[key].hasnans:
            sub = sub.dropna(subset=[key])
        g = sub.groupby(key, sort=False)
        p = g.agg(hits=("ts", "size"), files=("is_file", "sum"),
                  pages=("is_content", "sum"), kb=("kb", "sum")).reset_index()
        frames.append(_long_rows(sink, p[key].astype(str), p["hits"],
                                 p["files"], p["pages"], p["kb"]))
    q = ok.dropna(subset=["query"])
    if len(q):
        term = q["query"].str.lower().str.replace("+", " ", regex=False)
        tc = term.groupby(term).size()
        frames.append(_long_rows("search_terms", tc.index.astype(object),
                                 tc.to_numpy()))
    # conv-distinct counts: exact for convs wholly owned by this slice;
    # pair rows (deduped at finalize) for session-split shared convs
    has_shared = bool(shared_convs) and \
        ok["conv_id"].isin(shared_convs).any()
    for sink, key in CONV_DISTINCT_SPECS.items():
        d = ok[[key, "conv_id"]].dropna()
        if has_shared:
            dm = d["conv_id"].isin(shared_convs).to_numpy()
            own, sh = d[~dm], d[dm]
        else:
            own, sh = d, d.iloc[0:0]
        n = own.groupby(key, sort=False)["conv_id"].nunique()
        frames.append(_long_rows(sink, n.index.astype(str), n.to_numpy()))
        if len(sh):
            pairs = sh.drop_duplicates()
            frames.append(_long_rows(
                sink + "_pairs", pairs[key].astype(str),
                np.ones(len(pairs), dtype=np.int64),
                sub=pairs["conv_id"].astype(object)))
    # tool-distinct pairs: tools span buckets → driver dedupes (month, tool)
    mt = ok[["month", "tool_norm"]].dropna().drop_duplicates()
    frames.append(_long_rows("monthly_tools", mt["month"].astype(str),
                             np.ones(len(mt), dtype=np.int64),
                             sub=mt["tool_norm"].astype(object)))
    # session-derived sinks
    if len(sess):
        for sink, key in (("daily_sessions", "date"),
                          ("monthly_sessions", "month")):
            c = sess.groupby(key, sort=False).size()
            frames.append(_long_rows(sink, c.index.astype(str), c.to_numpy()))
        en = sess.dropna(subset=["entry_tool"]).groupby("entry_tool").size()
        ex = sess.dropna(subset=["exit_tool"]).groupby("exit_tool").size()
        frames.append(_long_rows("tool_entry", en.index.astype(object),
                                 en.to_numpy()))
        frames.append(_long_rows("tool_exit", ex.index.astype(object),
                                 ex.to_numpy()))
    frames = [f for f in frames if len(f)]
    return pd.concat(frames, ignore_index=True) if frames else _empty_long()


def process_bucket_frame(df: pd.DataFrame | pa.Table,
                         config: PipelineConfig = DEFAULT_CONFIG,
                         k: int = 1, rem: int = 0) -> dict:
    """Pure per-bucket-slice computation (unit-testable without Ray).

    Input: parsed ok-route turns of one bucket (complete conversations),
    as a pandas frame or (the hot path) a zero-copy Arrow table. With
    k > 1 this task owns slice ``rem`` of a k-way split: normal
    conversations by conv-hash residue, and GIANT conversations (rows >
    giant_conv_chunk) by ``session_id % k`` — whole sessions only, so
    every downstream aggregate stays exact.

    The sessionize step runs on dictionary CODES + int64 µs arrays
    (stages/session.sessionize_arrays): multi-million-row buckets never
    materialize Python string objects, and each slice applies exactly
    ONE Arrow ``take`` of only the rows it keeps — a k-way-split hot
    bucket costs each task the (cheap, columnar) array pass plus
    slice-sized pandas work, not k whole-frame copies (SURVEY.md §7.3
    item 2; round-1 verdict finding #7).

    Output: {'turns_ok', 'turns_seq', 'sessions', 'per_conv',
    'per_conv_top', 'long'}.
    """
    tbl = pa.Table.from_pandas(df, preserve_index=False) \
        if isinstance(df, pd.DataFrame) else df
    import pyarrow.compute as pac
    enc = pac.dictionary_encode(tbl["conv_id"].combine_chunks())
    codes = np.asarray(enc.indices)
    uniq = np.asarray(enc.dictionary, dtype=object)
    tidx = np.asarray(tbl["turn_idx"].combine_chunks())
    ts_us = np.asarray(pac.cast(tbl["ts"].combine_chunks(), pa.int64()))
    mcodes = np.asarray(
        pac.dictionary_encode(tbl["month"].combine_chunks()).indices)

    shared: set = set()
    shared_per_code = None
    if k > 1 and len(codes):
        counts = np.bincount(codes, minlength=len(uniq))
        shared_per_code = counts > config.giant_conv_chunk
        mine_per_code = (pd.util.hash_array(uniq, hash_key=_SUBSPLIT_KEY)
                         % np.uint64(k)).astype(np.int64) == rem
        # pre-slice BEFORE sessionizing: session ids are per-conv, so
        # sessionizing only (my residue convs ∪ giant convs) yields
        # identical ids while skipping the other slices' conv rows
        idx = np.flatnonzero((mine_per_code | shared_per_code)[codes])
        shared = set(uniq[shared_per_code])
    else:
        idx = np.arange(len(codes))
    order, sid, seq_drop = sessionize_arrays(
        codes[idx], tidx[idx], ts_us[idx], mcodes[idx], config)
    sel = idx[order]
    if shared_per_code is not None and shared_per_code.any():
        # giant (session-split) convs: keep whole sessions of my
        # residue; their seq-dropped rows belong to slice 0
        is_sh = shared_per_code[codes[sel]]
        keep = np.where(is_sh,
                        np.where(sid >= 0, sid % k == rem, rem == 0),
                        True)
        sel, sid, seq_drop = sel[keep], sid[keep], seq_drop[keep]
    turns = tbl.take(pa.array(sel)).to_pandas()
    turns["session_id"] = sid
    turns["seq_drop"] = seq_drop
    return _finish_slice(turns, shared, config)


def _finish_slice(turns: pd.DataFrame, shared: set,
                  config: PipelineConfig) -> dict:
    """Aggregation tail over one sessionized, session-sorted slice —
    shared by the direct path (process_bucket_frame) and the two-stage
    presplit path (big dirs sessionized once, slices aggregated here)."""
    seqmask = turns["seq_drop"].to_numpy()
    if seqmask.any():
        seq = turns[seqmask].drop(columns=["seq_drop"])
        ok = turns[~seqmask].drop(columns=["seq_drop"])
    else:
        # common path: no drops — masking would copy the whole frame
        seq = turns.iloc[0:0].drop(columns=["seq_drop"])
        ok = turns
    sess = sessions_from_sorted(ok)
    pc_g = ok[["conv_id", "ts", "kb", "is_file", "is_content",
               "session_id"]].groupby("conv_id", sort=True)
    per_conv = pc_g.agg(hits=("ts", "size"), files=("is_file", "sum"),
                        pages=("is_content", "sum"), kb=("kb", "sum"),
                        sessions=("session_id", "max"),
                        first_ts=("ts", "min"),
                        last_ts=("ts", "max")).reset_index()
    for c in ("hits", "files", "pages", "sessions"):
        per_conv[c] = per_conv[c].astype(np.int64)
    # distributed top-N partials: the global top-N conv lives in exactly
    # one slice, so slice-local top-N (hide applied, same comparator)
    # union ⊇ global top-N — exact — EXCEPT session-split shared convs,
    # whose per-slice rows are all forwarded (giants are few by
    # definition) and re-combined at finalize. The driver then touches
    # B × ~2N rows, never the 10^8-row per_conv table.
    N = max(config.top_n["conv"], config.top_n["conv_kb"])
    if shared and len(per_conv):
        sh_mask = per_conv["conv_id"].isin(shared)
        sh, own = per_conv[sh_mask], per_conv[~sh_mask]
    else:
        sh, own = per_conv.iloc[0:0], per_conv
    cand = pd.concat(
        [top_n_pandas(own, "conv_id", "hits", N, config.hide_conv_patterns),
         top_n_pandas(own, "conv_id", "kb", N, config.hide_conv_patterns)],
        ignore_index=True).drop_duplicates(subset="conv_id")
    per_conv_top = pd.concat([sh.assign(is_shared=True),
                              cand.assign(is_shared=False)],
                             ignore_index=True)
    long = bucket_partials(ok, sess, shared_convs=shared)
    # row-count partials ride the long channel so the driver never has
    # to re-scan thousands of output files just to fill metrics.json;
    # convs_own counts NON-shared convs (exactly one slice each — exact
    # sum); shared convs are counted distinct from per_conv_top rows
    meta = _long_rows("_meta", ["ok", "seq", "sessions", "convs_own"],
                      np.array([len(ok), len(seq), len(sess), len(own)],
                               dtype=np.int64))
    return {"turns_ok": ok, "turns_seq": seq, "sessions": sess,
            "per_conv": per_conv, "per_conv_top": per_conv_top,
            "long": pd.concat([long, meta], ignore_index=True)}


def _write_atomic(df: pd.DataFrame, path: str):
    """tmp+rename so a killed task never leaves a partial file behind."""
    import pyarrow.compute as pac
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    # an all-None object column infers type null, which breaks schema
    # unification when other buckets' parts have real strings
    for i, f in enumerate(tbl.schema):
        if pa.types.is_null(f.type):
            tbl = tbl.set_column(i, pa.field(f.name, pa.string()),
                                 pac.cast(tbl.column(i), pa.string()))
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


#: Columns of the pass-2 turns sink. The canonical ROUTED ROW STORE is
#: pass 1's ``parsed/route=*`` (full input columns incl. ``text`` plus
#: every derived column); pass 2 only ANNOTATES ok rows with their
#: session id, keyed by (conv_id, turn_idx). Hauling the wide text
#: column through pass 2 again would multiply its I/O several-fold for
#: bytes that already sit route-partitioned on disk.
ROUTED_COLS = ["conv_id", "turn_idx", "session_id"]

#: Pass-2 working columns — everything the sessionizer and the small
#: sinks need; pruning ``text``/``query`` at the read is the point.
PASS2_COLS = ["conv_id", "turn_idx", "ts", "role", "status", "kb",
              "query", "tool_norm", "month", "date", "hour", "is_content",
              "is_file", "status_class", "grp", "category"]


def write_bucket_outputs(res: dict, out_dir: str, bucket: int,
                         part: int = 0) -> None:
    """Deterministic per-bucket output files (idempotent on retry)."""
    b = f"bucket={bucket:05d}"
    p = f"part-{part}.parquet"
    _write_atomic(res["turns_ok"][ROUTED_COLS],
                  os.path.join(out_dir, "turns", "route=ok", b, p))
    if len(res["turns_seq"]):
        _write_atomic(res["turns_seq"][ROUTED_COLS],
                      os.path.join(out_dir, "turns", "route=seq", b, p))
    _write_atomic(res["sessions"],
                  os.path.join(out_dir, "sessions", b, p))
    _write_atomic(res["per_conv"],
                  os.path.join(out_dir, "per_conv", b, p))
    _write_atomic(res["per_conv_top"],
                  os.path.join(out_dir, "per_conv_top", b, p))


def _bucket_id(path: str) -> int:
    return int(re.search(r"bucket=(\d+)", path).group(1))


#: 16-byte SipHash key for the second-level conv split — independent of
#: the key behind parse.conv_bucket (pandas' default), so residues are
#: uncorrelated with bucket assignment.
_SUBSPLIT_KEY = "wr_subsplit_key1"


def sub_residue(conv_id, k: int) -> np.ndarray:
    """Second-level conv residue (the k-way split rule); the bucket path
    applies the same hash to the dictionary VALUES only (one hash per
    distinct conv) — this row-wise form is the executable definition."""
    return (pd.util.hash_array(np.asarray(conv_id, dtype=object),
                               hash_key=_SUBSPLIT_KEY)
            % np.uint64(k)).astype(np.int32)


#: A dir whose plan gives k >= this goes through the TWO-STAGE presplit
#: path: one task sessionizes the dir ONCE and writes k slice files;
#: k cheap tasks then aggregate the slices. Below the threshold the
#: write+re-read round trip costs more than the duplicate array pass.
PRESPLIT_MIN_K = 4


def _scan_dir(d: str) -> pa.Table:
    # use_threads=False: many concurrent bucket tasks each spinning the
    # default per-process Arrow scan pool (one thread per host core)
    # oversubscribe the node into a context-switch storm
    return pads.dataset(d).scanner(columns=PASS2_COLS,
                                   use_threads=False).to_table()


def _write_table_atomic(tbl: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def _presplit_table(tbl: pa.Table, bucket: int, k: int, out_dir: str,
                    config: PipelineConfig) -> tuple[list, dict]:
    """Stage A core over one bucket's scanned table: sessionize ONCE,
    write per-slice files.

    Returns (shared_ids, stats): the session-split giant conv ids the
    slice aggregators need for pair-row accounting, and the bucket-level
    stats {rows, seq_dropped, sessions, convs, max_ts} the resumable
    path records in its per-bucket commit manifest (they are free here —
    the arrays are already in hand — and spare the slice tasks any
    cross-slice accounting).
    """
    import pyarrow.compute as pac
    enc = pac.dictionary_encode(tbl["conv_id"].combine_chunks())
    codes = np.asarray(enc.indices)
    uniq = np.asarray(enc.dictionary, dtype=object)
    tidx = np.asarray(tbl["turn_idx"].combine_chunks())
    ts_us = np.asarray(pac.cast(tbl["ts"].combine_chunks(), pa.int64()))
    mcodes = np.asarray(pac.dictionary_encode(
        tbl["month"].combine_chunks()).indices)
    counts = np.bincount(codes, minlength=len(uniq))
    shared_per_code = counts > config.giant_conv_chunk
    res_per_code = (pd.util.hash_array(uniq, hash_key=_SUBSPLIT_KEY)
                    % np.uint64(k)).astype(np.int64)
    order, sid, seq_drop = sessionize_arrays(codes, tidx, ts_us, mcodes,
                                             config)
    sc = codes[order]
    slice_id = res_per_code[sc]
    if shared_per_code.any():
        slice_id = np.where(shared_per_code[sc],
                            np.where(sid >= 0, sid % k, 0), slice_id)
    # bucket stats over ok (non-seq-dropped) rows; `order` groups convs
    # contiguously with sid nondecreasing inside a conv, so session and
    # conv counts are one changed-neighbor pass each
    okm = ~seq_drop
    oc, osid = sc[okm], sid[okm]
    if len(oc):
        chg = (oc[1:] != oc[:-1])
        sessions = int(1 + (chg | (osid[1:] != osid[:-1])).sum())
        convs = int(1 + chg.sum())
        max_ts = str(pd.Timestamp(int(ts_us[order][okm].max()), unit="us"))
    else:
        sessions = convs = 0
        max_ts = None
    stats = {"rows": int(okm.sum()), "seq_dropped": int((~okm).sum()),
             "sessions": sessions, "convs": convs, "max_ts": max_ts}
    sorted_tbl = tbl.take(pa.array(order)) \
        .append_column("session_id", pa.array(sid)) \
        .append_column("seq_drop", pa.array(seq_drop))
    # filter+encode the k slices on a thread pool (Arrow releases the
    # GIL) — stage A is the pass's serial neck otherwise
    from concurrent.futures import ThreadPoolExecutor

    def write_slice(r):
        part = sorted_tbl.filter(pa.array(slice_id == r))
        _write_table_atomic(part, _presplit_path(out_dir, bucket, r))
    with ThreadPoolExecutor(min(8, k)) as ex:
        list(ex.map(write_slice, range(k)))
    return sorted(map(str, uniq[shared_per_code])), stats


def _presplit_dir(d: str, k: int, out_dir: str,
                  config: PipelineConfig) -> tuple[int, str]:
    """Stage A for one big dir: returns (bucket, shared_json)."""
    # stage A runs as one task per big dir (there are few) — let ITS
    # scan use the Arrow thread pool, unlike the wide stage
    tbl = pads.dataset(d).scanner(columns=PASS2_COLS,
                                  use_threads=True).to_table()
    shared, _ = _presplit_table(tbl, _bucket_id(d), k, out_dir, config)
    return _bucket_id(d), json.dumps(shared)


def _presplit_path(out_dir: str, bucket: int, rem: int) -> str:
    return os.path.join(out_dir, "presplit", f"bucket={bucket:05d}",
                        f"slice-{rem}.parquet")


def make_bucket_task(out_dir: str, config: PipelineConfig):
    """map_batches fn over bucket work items → long partials.

    Two item kinds: ``dir`` items carry (dir, k, rem) — the task reads
    the dir and owns the convs whose second-level hash ≡ rem (mod k);
    ``slice`` items point at a presplit file (already sessionized by
    stage A) and only run the aggregation tail. Every conversation still
    lives in exactly one task (the partitioning invariant sessionization
    needs).
    """
    def task(batch: pd.DataFrame) -> pd.DataFrame:
        longs = []
        for _, row in batch.iterrows():
            kind = row.get("kind")
            if kind == "presplit":
                # stage A rides the same job as the dir items, so it
                # overlaps them instead of serializing the whole pass;
                # its result travels on the long channel as a marker row
                bucket, shared = _presplit_dir(row["dir"], int(row["k"]),
                                               out_dir, config)
                longs.append(_long_rows("_presplit", [str(bucket)],
                                        np.array([int(row["k"])],
                                                 dtype=np.int64),
                                        sub=shared))
                continue
            if kind == "slice":
                bucket, rem = int(row["bucket"]), int(row["rem"])
                turns = pq.read_table(
                    _presplit_path(out_dir, bucket, rem)).to_pandas()
                res = _finish_slice(turns, set(json.loads(row["shared"])),
                                    config)
                write_bucket_outputs(res, out_dir, bucket, part=rem)
            else:
                d, k, rem = row["dir"], int(row["k"]), int(row["rem"])
                res = process_bucket_frame(_scan_dir(d), config, k=k,
                                           rem=rem)
                write_bucket_outputs(res, out_dir, _bucket_id(d), part=rem)
            longs.append(res["long"])
        out = pd.concat(longs, ignore_index=True) if longs else _empty_long()
        return out if len(out) else _empty_long()
    return task


def run_fused_pass(input_dir: str, out_dir: str,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   lookups: tuple[dict, dict] | None = None,
                   use_actors: bool = True
                   ) -> tuple[pd.DataFrame, dict]:
    """Single-pass flagship (checkpoint="off"): parse → enrich → SLIM
    scratch write-shuffle → per-bucket sessionize/aggregate, with no
    durable parsed store. Returns (long partials, route counts).

    The durable path's pass-1 store exists for unit-granular resume
    and the routed row store (re-queryable bad rows, ``text`` kept on
    disk); throughput-only runs need neither, and its zstd encode +
    full-width write is ~5 s of the 21.5 s sf-bench headline
    (BASELINE.md profile). Here the parsed stream drops ``text``
    immediately — select_columns to the 16 narrow working columns, so
    the wide column never leaves the parse operator — and the bucket
    exchange is the same hive-partitioned write-shuffle as pass 1 but
    over a snappy SCRATCH store that is deleted after the aggregate
    pass. Measured at 38.8M turns / 32 cpus (r5): the slim
    write-shuffle beats the pure-in-memory alternatives end to end —
    19.5 s vs 27.5 s for ``groupby(bucket).map_groups`` under Ray's
    sort shuffle and 47.0 s under ShuffleStrategy.HASH_SHUFFLE — and
    unlike the map_groups forms it keeps the presplit skew path (an
    oversized bucket still fans out into k slice tasks instead of
    binding to one). Versus the durable mode, WALL on an idle box is
    within host noise (the pass-1 store write overlaps parse compute
    in the streaming executor; interleaved A/B measured 24.4/24.9 s
    fused vs 24.7/24.8 s durable under load, 19.5 vs 21.5 s on the
    idle samples) — the real saving is WORK and I/O: the
    intermediate store drops from 2.61 GB (zstd, full width incl.
    ``text``) to 1.13 GB (snappy, 16 narrow columns), 2.3× fewer
    bytes through the shared store plus no durable-store round-trip
    obligations — capacity, not idle-box wall, the same wall-vs-work
    distinction the presplit A/B documents. Sinks/metrics are
    bit-identical to the durable mode (tests/test_fused.py).
    """
    scratch = os.path.join(out_dir, "_scratch")
    # a crashed earlier run leaves a stale scratch behind, and Ray's
    # write_parquet APPENDS uuid-named files — rerunning over it would
    # silently double every row in the bucket pass. The scratch is not
    # a resume point (that's the durable mode's job), so clear it.
    import shutil as _sh
    _sh.rmtree(scratch, ignore_errors=True)
    parsed = parse_enrich_dataset(input_dir, config, lookups, use_actors)
    slim = parsed.select_columns(PASS2_COLS + ["route", "bucket"])
    # snappy, not zstd: the scratch is written once, read once (usually
    # straight from page cache) and deleted — cheap encode beats small
    # bytes here, the reverse of the durable store's trade
    slim.write_parquet(scratch, partition_cols=["route", "bucket"],
                       compression="snappy")
    import shutil as _shutil
    from concurrent.futures import ThreadPoolExecutor
    try:
        dirs = sorted(glob.glob(
            os.path.join(scratch, "route=ok", "bucket=*")))
        with ThreadPoolExecutor(2) as ex:
            # bad/ignored counts are footer sweeps over the scratch —
            # overlap them with the bucket pass
            f_bad = ex.submit(_count_rows,
                              os.path.join(scratch, "route=bad"))
            f_ign = ex.submit(_count_rows,
                              os.path.join(scratch, "route=ignored"))
            long = run_bucket_pass(out_dir, config, dirs=dirs)
            routes = {"bad": f_bad.result(), "ignored": f_ign.result()}
    finally:
        _shutil.rmtree(scratch, ignore_errors=True)
    return long, routes


def _dir_bytes(d: str) -> int:
    return sum(os.path.getsize(f)
               for f in glob.glob(os.path.join(d, "*.parquet")))


def plan_bucket_items(dirs: list[str],
                      config: PipelineConfig) -> list[dict]:
    """(dir, k, rem) work items; oversized dirs get k = ceil(size/target)."""
    items = []
    for d in dirs:
        k = max(1, -(-_dir_bytes(d) // config.bucket_split_target_bytes))
        k = min(k, 16)   # fan-out cap: re-reading the dir k times is the
        #                  cost of the split; beyond ~16 it beats the gain
        items.extend({"dir": d, "k": k, "rem": r} for r in range(k))
    return items


def parse_enrich_dataset(source, config: PipelineConfig = DEFAULT_CONFIG,
                         lookups: tuple[dict, dict] | None = None,
                         use_actors: bool = True) -> rd.Dataset:
    """parse + enrich Dataset plan over a turns source.

    ``source`` is a fixture dir (str) or an explicit list of parquet file
    paths (the unit-granular entry used by state/checkpoint.py).
    """
    ray_up = ray.is_initialized()
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray_up else 8
    # split the read into ~4 blocks per core — with a handful of large
    # input files the default one-block-per-file caps pass-1 parallelism,
    # and finer blocks pack the parse stage tighter (smaller tail)
    nblocks = 4 * ncpu
    if isinstance(source, str):
        tc, rg = lookups if lookups is not None else read_lookup_dicts(source)
        ds = read_turns(source, override_num_blocks=nblocks)
    else:
        if lookups is None:
            raise ValueError("explicit file lists require lookups")
        tc, rg = lookups
        ds = rd.read_parquet(list(source), override_num_blocks=nblocks)
    parsed = ds.map_batches(make_parse_fn(config, config.num_buckets),
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=config.parse_batch_size)
    if use_actors and config.enrich_concurrency is None and ray_up \
            and ncpu < 2:
        # a fixed actor pool on a 1-CPU cluster would hold the only CPU
        # and starve the read/write tasks into deadlock
        use_actors = False
    if use_actors:
        conc = config.enrich_concurrency
        if conc is None and not ray_up:
            # cluster size unknown until Ray auto-inits at execution: an
            # AUTOSCALING pool can never deadlock (min 1 actor, tasks
            # keep their share); a fixed guess could starve a small box
            conc = (1, 8)
        elif conc is None:
            # FIXED pool sized to ~3/4 of the cluster: the parse stage
            # fuses into this operator, and an autoscaling (min,max) pool
            # ramps too slowly to reach max within a short job; the
            # remaining CPUs keep the read/write task operators fed
            # (a full-size pool starves them into deadlock)
            conc = max(1, ncpu - max(1, ncpu // 4))
        # broadcast: ObjectRef for big tables (read once per actor), by
        # VALUE for small ones — ObjectRef constructor args break actor
        # restarts if the ref is lost (ray#53727), so don't pay that
        # fragility for a few-KB dict
        big = (len(tc) + len(rg)) > 100_000
        tc_arg = ray.put(tc) if big else tc
        rg_arg = ray.put(rg) if big else rg
        parsed = parsed.map_batches(
            EnrichActor, batch_format="pyarrow",
            fn_constructor_kwargs=dict(
                tool_categories=tc_arg, role_groups=rg_arg,
                unresolved=config.unresolved_category),
            concurrency=conc, num_cpus=1)
    else:
        parsed = parsed.map_batches(
            enrich_fn(tc, rg, config.unresolved_category),
            batch_format="pyarrow")
    # user-extension stages (§2.10): named batch fns spliced in after
    # enrichment; unknown names fail here, at plan build, not mid-run
    if config.extra_stages:
        from webalizer_ray.extensions import resolve_stages
        for fn in resolve_stages(config.extra_stages):
            parsed = parsed.map_batches(fn, batch_format="pyarrow")
    return parsed


def run_parse_pass(input_dir: str, out_dir: str,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   lookups: tuple[dict, dict] | None = None,
                   use_actors: bool = True) -> None:
    """Pass 1: parse + enrich + route/bucket-partitioned write."""
    parsed_dir = os.path.join(out_dir, "parsed")
    if os.path.isdir(parsed_dir) and os.listdir(parsed_dir):
        # write_parquet APPENDS uuid-named files: rerunning into a used
        # out dir would silently double every row. Repeated runs belong
        # to the resumable path (state/checkpoint.py), which commits and
        # skips partitions instead.
        raise FileExistsError(
            f"{parsed_dir} already holds a run; use a fresh --out dir or "
            "the resumable mode (run --resume)")
    parsed = parse_enrich_dataset(input_dir, config, lookups, use_actors)
    # zstd: ~35% fewer bytes than snappy on this text-heavy store — the
    # write (and pass 2's re-read) is partly disk-bound; encode cost is
    # paid in parallel across the write tasks
    parsed.write_parquet(parsed_dir, partition_cols=["route", "bucket"],
                         compression="zstd")


def run_bucket_pass(out_dir: str,
                    config: PipelineConfig = DEFAULT_CONFIG,
                    dirs: list[str] | None = None) -> pd.DataFrame:
    """Pass 2: one Ray task per work item; returns combined long partials.

    Dirs whose split factor k ≥ PRESPLIT_MIN_K run the two-stage path:
    stage A sessionizes each big dir ONCE and writes k slice files
    (instead of k tasks each re-reading and re-sessionizing the same
    dir); the main stage then aggregates dirs and slices uniformly.
    """
    if dirs is None:
        dirs = sorted(glob.glob(
            os.path.join(out_dir, "parsed", "route=ok", "bucket=*")))
    if not dirs:
        return _empty_long()
    planned = plan_bucket_items(dirs, config)
    items = [{"kind": "dir", "dir": it["dir"], "k": it["k"],
              "rem": it["rem"], "bucket": -1, "shared": "[]"}
             for it in planned if it["k"] < PRESPLIT_MIN_K]
    big = sorted({(it["dir"], it["k"]) for it in planned
                  if it["k"] >= PRESPLIT_MIN_K})
    # job 1: dir items + presplit stage-A items TOGETHER (stage A
    # overlaps the independent dir work instead of gating the pass);
    # presplit items first so the long stage-A tasks start immediately
    job1 = [{"kind": "presplit", "dir": d, "k": k, "rem": 0,
             "bucket": -1, "shared": "[]"} for d, k in big] + items
    long_frames = []
    slice_items = []
    if job1:
        # one BLOCK per work item — from_items defaults to a single
        # block, which would serialize the whole pass into one task
        l1 = (rd.from_items(job1, override_num_blocks=len(job1))
              .map_batches(make_bucket_task(out_dir, config),
                           batch_format="pandas", batch_size=1)
              .to_pandas())
        if "sink" in l1.columns and len(l1):
            marker = l1["sink"] == "_presplit"
            for _, m in l1[marker].iterrows():
                k = int(m["hits"])
                slice_items.extend(
                    {"kind": "slice", "dir": "", "k": k, "rem": r,
                     "bucket": int(m["key"]), "shared": m["sub"]}
                    for r in range(k))
            long_frames.append(l1[~marker])
    if slice_items:
        l2 = (rd.from_items(slice_items,
                            override_num_blocks=len(slice_items))
              .map_batches(make_bucket_task(out_dir, config),
                           batch_format="pandas", batch_size=1)
              .to_pandas())
        if "sink" in l2.columns and len(l2):
            long_frames.append(l2)
    if not long_frames:
        return _empty_long()
    return pd.concat(long_frames, ignore_index=True)


def _sum_sink(comb: pd.DataFrame, name: str, key_name: str,
              cols=("hits", "files", "pages", "kb"), dtype=None):
    f = comb[comb["sink"] == name]
    out = pd.DataFrame({key_name: f["key"].to_numpy()})
    if dtype is not None:
        out[key_name] = out[key_name].astype(dtype)
    for c in cols:
        out[c] = f[c].to_numpy()
    return out.sort_values(key_name, ignore_index=True)


def finalize_sinks(long: pd.DataFrame, out_dir: str,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   load_sessions: bool = True,
                   load_per_conv: bool = True) -> dict:
    """Driver-side combine of per-bucket partials → finished sinks + top-N."""
    # combine sum-style sinks across buckets. Pair-style sinks (one row
    # per (key, member)) dedup FIRST: tools span buckets, and a
    # session-split giant conv spans residue slices. The endswith test
    # runs on the ~20-name sink VOCABULARY, not the million-row column
    # (a per-row .str.endswith cost 0.56 s of the 1.3 s finalize).
    vocab = long["sink"].unique()
    pair_names = [v for v in vocab
                  if v == "monthly_tools" or v.endswith("_pairs")]
    is_pair = long["sink"].isin(pair_names)
    pairs = long[is_pair].drop_duplicates(subset=["sink", "key", "sub"])
    long = pd.concat([long[~is_pair], pairs], ignore_index=True)
    comb = (long.groupby(["sink", "key"], sort=True)
            .agg(hits=("hits", "sum"), files=("files", "sum"),
                 pages=("pages", "sum"), kb=("kb", "sum")).reset_index())

    sinks: dict = {}
    meta = comb[comb["sink"] == "_meta"]
    sinks["_meta"] = dict(zip(meta["key"], meta["hits"].astype(int)))
    comb = comb[comb["sink"] != "_meta"]
    sinks["hourly"] = _sum_sink(comb, "hourly", "hour", dtype=np.int64)
    daily = _sum_sink(comb, "daily", "date")
    monthly = _sum_sink(comb, "monthly", "month")
    tool_hits = _sum_sink(comb, "per_tool", "tool_norm", cols=("hits", "kb"))
    sinks["per_role"] = _sum_sink(comb, "per_role", "role",
                                  cols=("hits", "kb"))
    sinks["per_grp"] = _sum_sink(comb, "per_grp", "grp", cols=("hits", "kb"))
    per_cat = _sum_sink(comb, "per_category", "category", cols=("hits", "kb"))
    sinks["status_hist"] = _sum_sink(comb, "status_hist", "status",
                                     cols=("hits",), dtype=np.int64)
    sinks["status_class_hist"] = _sum_sink(comb, "status_class_hist",
                                           "status_class", cols=("hits",))
    sinks["search_terms"] = _sum_sink(comb, "search_terms", "term",
                                      cols=("hits",))

    def counts_of(name, key_name, alias):
        """Exact per-slice counts + deduped pair counts (shared convs)."""
        base = comb[comb["sink"].isin([name, name + "_pairs"])]
        f = (base.groupby("key", as_index=False)["hits"].sum()
             .rename(columns={"key": key_name, "hits": alias})
             .sort_values(key_name, ignore_index=True))
        f[alias] = f[alias].astype(np.int64)
        return f

    daily = (daily.merge(counts_of("daily_convs", "date", "convs"),
                         on="date", how="left")
             .merge(counts_of("daily_sessions", "date", "sessions"),
                    on="date", how="left"))
    monthly = (monthly
               .merge(counts_of("monthly_convs", "month", "convs"),
                      on="month", how="left")
               .merge(counts_of("monthly_tools", "month", "tools"),
                      on="month", how="left")
               .merge(counts_of("monthly_sessions", "month", "sessions"),
                      on="month", how="left"))
    for df, cols in ((daily, ["convs", "sessions"]),
                     (monthly, ["convs", "tools", "sessions"])):
        for c in cols:
            df[c] = df[c].fillna(0).astype(np.int64)
    sinks["daily"] = daily
    sinks["monthly"] = monthly

    per_tool = (tool_hits
                .merge(counts_of("tool_entry", "tool_norm", "entry"),
                       on="tool_norm", how="left")
                .merge(counts_of("tool_exit", "tool_norm", "exit"),
                       on="tool_norm", how="left"))
    for c in ("entry", "exit"):
        per_tool[c] = per_tool[c].fillna(0).astype(np.int64)
    sinks["per_tool"] = per_tool
    sinks["per_category"] = per_cat.merge(
        counts_of("category_convs", "category", "convs"), on="category",
        how="left")
    sinks["per_category"]["convs"] = sinks["per_category"]["convs"] \
        .fillna(0).astype(np.int64)

    # row-level sinks written per bucket in pass 2 — read back UNSORTED
    # (a driver-side sort of 10^6+ rows is pure serial wall time; every
    # consumer sorts or aggregates for itself; at 10^12 consume the
    # Parquet directly instead)
    def read_dir(sub):
        p = os.path.join(out_dir, sub)
        if not os.path.isdir(p) or not glob.glob(p + "/**/*.parquet",
                                                 recursive=True):
            return pd.DataFrame()
        return pads.dataset(p).to_table().to_pandas()

    # the sessions TABLE is a product of pass 2 (Parquet on disk); pulling
    # 10^6+ rows into the driver is a test convenience, not a pipeline
    # step — callers that only need counts skip it (_meta carries them)
    sinks["sessions"] = read_dir("sessions") if load_sessions \
        else pd.DataFrame()
    # top-N source: the per-bucket top partials (B × ~2N rows + the few
    # session-split shared-conv rows), NEVER the full per_conv table —
    # one row per conversation is 10^8–10^9 rows at target scale
    top_src = read_dir("per_conv_top")
    n_shared_convs = 0
    if len(top_src):
        shm = top_src["is_shared"].to_numpy(dtype=bool)
        sh, own_top = top_src[shm], top_src[~shm]
        n_shared_convs = int(sh["conv_id"].nunique())
        if len(sh):
            sh = sh.groupby("conv_id", as_index=False).agg(
                hits=("hits", "sum"), files=("files", "sum"),
                pages=("pages", "sum"), kb=("kb", "sum"),
                sessions=("sessions", "max"), first_ts=("first_ts", "min"),
                last_ts=("last_ts", "max"))
            top_src = pd.concat([own_top.drop(columns=["is_shared"]), sh],
                                ignore_index=True)
        else:
            top_src = own_top.drop(columns=["is_shared"])
    sinks["_meta"]["convs"] = int(sinks["_meta"].get("convs_own", 0)
                                  + n_shared_convs)

    # the full per_conv TABLE, like sessions, is a pass-2 Parquet output;
    # load into the driver only on request (test convenience)
    per_conv_df = read_dir("per_conv") if load_per_conv else pd.DataFrame()
    if len(per_conv_df) and not per_conv_df["conv_id"].is_unique:
        # session-split giant convs emit one per_conv part per slice
        per_conv_df = per_conv_df.groupby("conv_id", as_index=False).agg(
            hits=("hits", "sum"), files=("files", "sum"),
            pages=("pages", "sum"), kb=("kb", "sum"),
            sessions=("sessions", "max"), first_ts=("first_ts", "min"),
            last_ts=("last_ts", "max"))
    sinks["per_conv"] = per_conv_df

    # top-N tables (K1–K3) with deterministic (metric desc, key asc) order
    N = config.top_n
    tops = {
        "top_conv": (top_src, "conv_id", "hits", N["conv"],
                     config.hide_conv_patterns),
        "top_conv_kb": (top_src, "conv_id", "kb", N["conv_kb"],
                        config.hide_conv_patterns),
        "top_tool": (per_tool, "tool_norm", "hits", N["tool"],
                     config.hide_tool_patterns),
        "top_tool_kb": (per_tool, "tool_norm", "kb", N["tool_kb"],
                        config.hide_tool_patterns),
        "top_entry": (per_tool, "tool_norm", "entry", N["entry"],
                      config.hide_tool_patterns),
        "top_exit": (per_tool, "tool_norm", "exit", N["exit"],
                     config.hide_tool_patterns),
        "top_role": (sinks["per_role"], "role", "hits", N["role"], ()),
        "top_category": (sinks["per_category"], "category", "hits",
                         N["category"], ()),
        "top_search": (sinks["search_terms"], "term", "hits", N["search"], ()),
    }
    for name, (frame, key, metric, n, hide) in tops.items():
        sinks[name] = (top_n_pandas(frame, key, metric, n, hide)
                       if len(frame) else frame)

    # A9 max/avg derivations (mh_hit/avg trackers; computed from the
    # small daily/hourly tables like output.c does from tm_*/th_* arrays)
    if len(daily):
        d = daily.assign(month=daily["date"].str.slice(0, 7),
                         kb=daily["kb"].round(2))
        ext = d.groupby("month").agg(
            max_hits_day=("hits", "max"), avg_hits_day=("hits", "mean"),
            max_kb_day=("kb", "max")).reset_index()
        ext["avg_hits_day"] = ext["avg_hits_day"].round(2)
        ext["max_kb_day"] = ext["max_kb_day"].round(2)
        ext["max_hits_day"] = ext["max_hits_day"].astype(np.int64)
        sinks["monthly_extremes"] = ext
    else:
        sinks["monthly_extremes"] = pd.DataFrame(
            columns=["month", "max_hits_day", "avg_hits_day", "max_kb_day"])

    # persist the small sinks (the HTML/TSV report analogs, S6–S9)
    sink_dir = os.path.join(out_dir, "sinks")
    os.makedirs(sink_dir, exist_ok=True)
    for name, obj in sinks.items():
        if isinstance(obj, pd.DataFrame) and name not in ("sessions",
                                                          "per_conv"):
            _write_atomic(obj, os.path.join(sink_dir, f"{name}.parquet"))
            if config.dump_tsv:
                dump_dir = os.path.join(out_dir, "dumps")
                os.makedirs(dump_dir, exist_ok=True)
                tmp = os.path.join(dump_dir, f"{name}.tab.tmp")
                obj.to_csv(tmp, sep="\t", index=False)
                os.replace(tmp, os.path.join(dump_dir, f"{name}.tab"))
    if config.emit_html:
        # S6–S8 + S10: HTML report pages (render graphs first so the
        # <img> references resolve) — driver-side O(KB) finishing step
        from webalizer_ray.pipelines.htmlreport import write_html_report
        write_html_report(out_dir, config=config)
    elif config.emit_graphs:
        # S10 only: the four usage PNGs from the parquet sinks
        from webalizer_ray.pipelines.graphs import write_flagship_graphs
        write_flagship_graphs(out_dir, config=config)
    return sinks


def _count_rows(path: str) -> int:
    """Metadata-only row count, footers read on a thread pool (a serial
    pads.dataset discovery over thousands of small files costs seconds;
    footer reads are I/O-bound so the pool is wide)."""
    if not os.path.isdir(path):
        return 0
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not files:
        return 0
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(min(64, len(files))) as ex:
        return sum(ex.map(lambda f: pq.ParquetFile(f).metadata.num_rows,
                          files))


def run_flagship(input_dir: str, out_dir: str,
                 config: PipelineConfig = DEFAULT_CONFIG,
                 lookups: tuple[dict, dict] | None = None,
                 use_actors: bool = True,
                 load_sessions: bool = True,
                 load_per_conv: bool = True,
                 checkpoint: str = "on") -> dict:
    """Full pipeline; returns {'metrics': ..., 'sinks': {...}}.

    ``checkpoint="on"`` (default): the two-pass durable layout — pass 1
    writes the route/bucket-partitioned parsed store (the resume point
    and routed row store), pass 2 aggregates it. ``checkpoint="off"``:
    the fused single pass (run_fused_pass) for throughput-only runs —
    same sinks and metrics, no parsed store, no resumability.
    """
    if checkpoint not in ("on", "off"):
        raise ValueError(f"checkpoint must be 'on' or 'off', "
                         f"got {checkpoint!r}")
    if checkpoint == "off":
        long, route_counts = run_fused_pass(input_dir, out_dir, config,
                                            lookups, use_actors)
        sinks = finalize_sinks(long, out_dir, config,
                               load_sessions=load_sessions,
                               load_per_conv=load_per_conv)
        meta = sinks.get("_meta", {})
        turns_dir = os.path.join(input_dir, "turns")
        metrics = {
            "total_rec": _count_rows(turns_dir)
            if os.path.isdir(turns_dir) else _count_rows(input_dir),
            "bad": int(route_counts.get("bad", 0)),
            "ignored_pattern": int(route_counts.get("ignored", 0)),
            "ignored_seq": int(meta.get("seq", 0)),
            "parsed": int(meta.get("ok", 0)),
        }
        metrics["ignored"] = metrics["ignored_pattern"] \
            + metrics["ignored_seq"]
        metrics["sessions"] = int(meta.get("sessions",
                                           len(sinks["sessions"])))
        metrics["convs"] = int(meta.get("convs", 0))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2, default=str)
        return {"metrics": metrics, "sinks": sinks, "out_dir": out_dir}

    run_parse_pass(input_dir, out_dir, config, lookups, use_actors)
    long = run_bucket_pass(out_dir, config)
    sinks = finalize_sinks(long, out_dir, config,
                           load_sessions=load_sessions,
                           load_per_conv=load_per_conv)

    parsed_dir = os.path.join(out_dir, "parsed")
    meta = sinks.get("_meta", {})
    # the three dir counts are independent footer sweeps — overlap them
    from concurrent.futures import ThreadPoolExecutor
    turns_dir = os.path.join(input_dir, "turns")
    with ThreadPoolExecutor(3) as ex:
        # fall back to the flat layout only when turns/ doesn't exist —
        # an EMPTY turns table is a real count of 0, not a miss (falling
        # through would count the lookup parquet files as records)
        f_tot = ex.submit(lambda: _count_rows(turns_dir)
                          if os.path.isdir(turns_dir)
                          else _count_rows(input_dir))
        f_bad = ex.submit(_count_rows, os.path.join(parsed_dir,
                                                    "route=bad"))
        f_ign = ex.submit(_count_rows, os.path.join(parsed_dir,
                                                    "route=ignored"))
        metrics = {
            "total_rec": f_tot.result(),
            "bad": f_bad.result(),
            "ignored_pattern": f_ign.result(),
            "ignored_seq": int(meta.get("seq", 0)),
            "parsed": int(meta.get("ok", 0)),
        }
    metrics["ignored"] = metrics["ignored_pattern"] + metrics["ignored_seq"]
    metrics["sessions"] = int(meta.get("sessions",
                                       len(sinks["sessions"])))
    metrics["convs"] = int(meta.get("convs", 0))
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return {"metrics": metrics, "sinks": sinks, "out_dir": out_dir}
