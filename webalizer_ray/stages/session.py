"""Sessionization (SURVEY.md §2.9 W1–W6) — the visit-window logic.

The reference detects "visits" inside hashtab.c:put_hnode() (≈300–450
[verify]): per host, a new visit starts when ``rec_tstamp - hnode.tstamp >=
Visit_Timeout`` (default 1800 s, note ``>=`` — the exact-boundary gap
splits), entry pages are counted at session start (update_entry()), the
host's lasturl becomes the exit page at flush (update_exit()), and
clear_month() implicitly ends every visit at a month boundary (W3).

Re-expression: sessions are a per-``conv_id`` ordered window. We hash-
partition by ``bucket = hash(conv_id) % B`` (computed in the parse stage)
and run ``groupby("bucket").map_groups(fn)`` so each fn call receives ALL
turns of many complete conversations at once and sessionizes them with one
vectorized pandas pass (sort + shift + cumsum) — B bounded calls total, not
one Python call per conversation. This is the documented partitioning
assumption: a conversation never spans buckets (guaranteed by the hash),
and one bucket fits in a worker's heap (B is sized to the data; at 10^12
turns B ≈ total_bytes / target_bucket_bytes). Hot/giant conversations are
range-chunked by ``turn_idx`` and boundary-merged (chunk_sessionize_frame)
— the salting-compatible path for keys too big for one group.

Out-of-order handling (W4): default heals by sorting on ``turn_idx``
(documented deviation — strictly more correct); ``strict_seq=True``
reproduces the reference's drop rule (a row older than the per-conv running
max ts → dropped and counted, total_ignore analog) via a ``seq_drop``
column the caller routes to the ignored sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from webalizer_ray.config import DEFAULT_CONFIG, PipelineConfig

#: Output columns of the sessions table (order fixed for parity tests).
SESSION_COLS = ["conv_id", "session_id", "start_ts", "end_ts", "n_turns",
                "kb", "files", "pages", "entry_tool", "exit_tool",
                "month", "date"]


def _session_ids(codes: np.ndarray, ts: np.ndarray, month: np.ndarray,
                 config: PipelineConfig) -> np.ndarray:
    """1-based per-conv session ids over (conv-code, turn)-ordered arrays."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    same = np.empty(n, dtype=bool)
    same[0] = False
    same[1:] = codes[1:] == codes[:-1]
    gap_s = np.empty(n, dtype=np.float64)
    gap_s[0] = np.inf
    gap_s[1:] = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
    new_sess = ~same | (gap_s >= config.session_timeout_s)
    if config.split_sessions_on_month:
        mchg = np.empty(n, dtype=bool)
        mchg[0] = False
        mchg[1:] = month[1:] != month[:-1]
        new_sess |= same & mchg
    if config.fold_seq:
        # FoldSeqErr (W4 fold): backwards ts jump = flush + restart
        new_sess |= same & (gap_s < 0)
    gsid = np.cumsum(new_sess)
    firsts = np.flatnonzero(~same)
    counts = np.diff(np.append(firsts, n))
    return (gsid - np.repeat(gsid[firsts] - 1, counts)).astype(np.int64)


def _session_ids_us(codes: np.ndarray, ts_us: np.ndarray,
                    month_codes: np.ndarray,
                    config: PipelineConfig) -> np.ndarray:
    """`_session_ids` over raw int arrays (ts in epoch µs, month as
    dictionary codes) — the allocation-free kernel for the Arrow bucket
    path. Identical rule set: new session at conv change, gap >= timeout,
    month change (W3), or backwards jump when fold_seq (W4 fold)."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    same = np.empty(n, dtype=bool)
    same[0] = False
    same[1:] = codes[1:] == codes[:-1]
    gap_s = np.empty(n, dtype=np.float64)
    gap_s[0] = np.inf
    gap_s[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
    new_sess = ~same | (gap_s >= config.session_timeout_s)
    if config.split_sessions_on_month:
        mchg = np.empty(n, dtype=bool)
        mchg[0] = False
        mchg[1:] = month_codes[1:] != month_codes[:-1]
        new_sess |= same & mchg
    if config.fold_seq:
        new_sess |= same & (gap_s < 0)
    gsid = np.cumsum(new_sess)
    firsts = np.flatnonzero(~same)
    counts = np.diff(np.append(firsts, n))
    return (gsid - np.repeat(gsid[firsts] - 1, counts)).astype(np.int64)


def sessionize_arrays(codes: np.ndarray, turn_idx: np.ndarray,
                      ts_us: np.ndarray, month_codes: np.ndarray,
                      config: PipelineConfig = DEFAULT_CONFIG
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Array-level sessionizer: returns (order, session_id, seq_drop),
    all aligned to ``order`` (positions into the input arrays sorted by
    (conv-code, turn_idx)). Avoids materializing Python string objects
    for multi-million-row buckets — the callers apply ``order`` with one
    Arrow ``take`` of only the rows they keep."""
    order = np.lexsort((turn_idx, codes))
    c = codes[order]
    t = ts_us[order]
    m = month_codes[order]
    if config.strict_seq and len(c):
        runmax = pd.Series(t).groupby(pd.Series(c), sort=False).cummax() \
            .to_numpy()
        seq_drop = t < runmax
    else:
        seq_drop = np.zeros(len(c), dtype=bool)
    if seq_drop.any():
        keep = ~seq_drop
        live = _session_ids_us(c[keep], t[keep], m[keep], config)
        sid = np.full(len(c), -1, dtype=np.int64)
        sid[keep] = live
    else:
        sid = _session_ids_us(c, t, m, config)
    return order, sid, seq_drop


def sessionize_frame(df: pd.DataFrame,
                     config: PipelineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Vectorized multi-conversation sessionizer (one bucket per call).

    Input: parsed ok-route turns of >=1 complete conversations. Output:
    the same rows sorted by (conv_id-group, turn_idx) with ``session_id``
    (int64, 1-based per conv) and ``seq_drop`` (bool) appended. Pure
    numpy on factorized conv codes — an object-string mergesort plus
    full-frame copies cost seconds per 10^6-row bucket.
    """
    codes, _ = pd.factorize(df["conv_id"], sort=True)
    order = np.lexsort((df["turn_idx"].to_numpy(), codes))
    df = df.take(order)
    codes = codes[order]
    if config.strict_seq and len(df):
        runmax = df.groupby("conv_id", sort=False)["ts"].cummax()
        seq_drop = (df["ts"] < runmax).to_numpy()
    else:
        seq_drop = np.zeros(len(df), dtype=bool)
    live_codes, live_ts, live_month = codes, df["ts"].to_numpy(), \
        df["month"].to_numpy()
    if seq_drop.any():
        keep = ~seq_drop
        live_codes, live_ts, live_month = (codes[keep], live_ts[keep],
                                           live_month[keep])
    sess = _session_ids(live_codes, live_ts, live_month, config)

    out = df
    out["seq_drop"] = seq_drop
    if seq_drop.any():
        sid = np.full(len(df), -1, dtype=np.int64)
        sid[~seq_drop] = sess
        out["session_id"] = sid
    else:
        out["session_id"] = sess
    return out


def chunk_sessionize_frame(df: pd.DataFrame,
                           config: PipelineConfig = DEFAULT_CONFIG,
                           chunk_rows: int | None = None) -> pd.DataFrame:
    """Giant-conversation path (SURVEY.md §4.3 item 2, §7.3 item 2).

    Range-chunk one conversation's turns by ``turn_idx``, sessionize each
    chunk independently, then merge boundary sessions: a chunk's first
    session is NOT new if the gap across the chunk edge is < timeout and the
    month didn't change — renumber by a cumulative offset. Equivalent to
    sessionize_frame (property-tested); enables splitting a 10^9-turn conv
    across workers: only the per-chunk boundary rows (2 per chunk) need a
    second, driver-side pass.
    """
    chunk_rows = chunk_rows or config.giant_conv_chunk
    df = df.sort_values("turn_idx", kind="mergesort").reset_index(drop=True)
    n = len(df)
    if n == 0:
        return sessionize_frame(df.assign(), config)
    parts = []
    for lo in range(0, n, chunk_rows):
        chunk = df.iloc[lo:lo + chunk_rows]
        parts.append(sessionize_frame(chunk, config))
    # boundary merge: decide whether each chunk's first turn continues the
    # previous chunk's last session
    offset = np.int64(0)
    merged = []
    prev_last = None  # (last_ts, last_month, last_session_id_global)
    for p in parts:
        p = p.copy()
        live_mask = ~p["seq_drop"]
        if prev_last is not None and live_mask.any():
            first = p[live_mask].iloc[0]
            gap = (first["ts"] - prev_last[0]).total_seconds()
            cont = (gap < config.session_timeout_s and
                    not (config.fold_seq and gap < 0) and
                    not (config.split_sessions_on_month
                         and first["month"] != prev_last[1]))
            # chunk-local ids are 1-based; continuation fuses local 1 into
            # the previous global session
            p.loc[live_mask, "session_id"] += offset - (1 if cont else 0)
        if live_mask.any():
            lastrow = p[live_mask].iloc[-1]
            offset = np.int64(lastrow["session_id"])
            prev_last = (lastrow["ts"], lastrow["month"], offset)
        merged.append(p)
    return pd.concat(merged, ignore_index=True)


def make_sessionize_group(config: PipelineConfig = DEFAULT_CONFIG):
    """map_groups fn over bucket groups → turns + session_id/seq_drop."""
    def fn(group: pd.DataFrame) -> pd.DataFrame:
        return sessionize_frame(group, config)
    return fn


# ---------------------------------------------------------------------------
# Sessions summary table: partial-per-batch → final-per-bucket combine.
# The classic pre-aggregate pattern: the wide data never shuffles twice —
# per-batch partials are tiny (one row per (conv, session) per batch), and
# the final combine is vectorized per bucket.
# ---------------------------------------------------------------------------

_PARTIAL_KEYS = ["bucket", "conv_id", "session_id"]


def session_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial session aggregates (assumes rows of one (conv,
    session) appear in turn_idx order within the batch — guaranteed because
    the sessionizer's output is written sorted and Parquet preserves order).
    """
    d = df[(df["session_id"] >= 0)]
    if "seq_drop" in d.columns:
        d = d[~d["seq_drop"]]
    d = d.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = d.groupby(_PARTIAL_KEYS, sort=False)
    out = g.agg(n_turns=("turn_idx", "size"), kb=("kb", "sum"),
                files=("is_file", "sum"), pages=("is_content", "sum"),
                min_idx=("turn_idx", "min"), max_idx=("turn_idx", "max"),
                start_ts=("ts", "first"), end_ts=("ts", "last"))
    t = d[d["tool_norm"].notna()].groupby(_PARTIAL_KEYS, sort=False)
    ent = t.agg(entry_tool=("tool_norm", "first"),
                exit_tool=("tool_norm", "last"))
    out = out.join(ent, how="left").reset_index()
    for c in ("n_turns", "files", "pages"):
        out[c] = out[c].astype(np.int64)
    return out


def combine_session_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Final combine of session partials — one vectorized call per bucket.

    Partials of one session cover disjoint, ordered turn_idx ranges, so
    sorting by min_idx orders everything; groupby first/last skip NaN which
    yields the first/last non-null entry/exit tool.
    """
    df = df.sort_values(["conv_id", "session_id", "min_idx"], kind="mergesort")
    g = df.groupby(["conv_id", "session_id"], sort=True)
    out = g.agg(n_turns=("n_turns", "sum"), kb=("kb", "sum"),
                files=("files", "sum"), pages=("pages", "sum"),
                start_ts=("start_ts", "first"), end_ts=("end_ts", "last"),
                entry_tool=("entry_tool", "first"),
                exit_tool=("exit_tool", "last")).reset_index()
    out["month"] = out["start_ts"].dt.strftime("%Y-%m")
    out["date"] = out["start_ts"].dt.strftime("%Y-%m-%d")
    for c in ("n_turns", "files", "pages"):
        out[c] = out[c].astype(np.int64)
    return out[SESSION_COLS]
