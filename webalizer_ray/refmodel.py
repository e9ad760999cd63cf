"""Pure-pandas reference model — the executable spec (SURVEY.md §5.2.1).

A single-threaded reimplementation of the reference semantics (webalizer's
record loop, webalizer.c:main() ≈3400–3600 [verify]; visit logic,
hashtab.c:put_hnode() ≈300–450 [verify]; tabulation output.c) over the
transcript table. The Ray engine is tested for EXACT parity against this
model: per-sink aggregate-count equality, routed-row equality, per-turn
text equality under stable (conv_id, turn_idx) ordering.

Semantics (our spec; deviations from the reference are documented):

* parse: rows not matching ``config.parse_pattern`` → ``bad`` sink
  (``total_bad`` analog); parse happens BEFORE ignore checks, as in the
  reference record loop.
* ignore: RE2 pattern lists on conv_id / normalized tool / role →
  ``ignored`` sink, excluded from ALL aggregates (``total_ignore`` analog).
* strict_seq=True: within a conv in turn_idx order, a row whose ts is
  older than the running max is dropped → ignored (reason="seq") — the
  reference's out-of-sequence drop (W4). Default heals by sorting.
* tool normalization: lowercase + strip ``_v<digits>`` suffix (URL
  normalize / IndexAlias analog).
* enrich: tool→category with misses → ``Unresolved`` (DNS-miss analog);
  role→grp (GroupAgent analog).
* sessions: per conv in turn_idx order, NEW session when first turn, or
  ``gap >= timeout`` (note ``>=``: the exact-boundary gap splits, matching
  put_hnode's ``rec_tstamp - tstamp >= Visit_Timeout``), or the month
  changed (W3: clear_month() ends all visits). entry/exit = first/last
  non-null normalized tool of the session (entry/exit page analog).
* files = status==200 (reference: files counted for code 200 only);
  pages = content turns (role == config.content_role) — ispage() analog.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from webalizer_ray.config import (
    DEFAULT_CONFIG,
    STATUS_CLASSES,
    TOOL_VERSION_SUFFIX,
    PipelineConfig,
)

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
DERIVED_COLS = [
    "action", "status", "kb", "query", "tool_norm", "category", "grp",
    "month", "date", "hour", "is_content", "is_file", "session_id",
]


#: mangle_level → truncation length (mirrors parse.MANGLE_TRUNC)
_MANGLE_TRUNC = {2: 8, 3: 4, 4: 2}


def normalize_tool(s: pd.Series, level: int = 1) -> pd.Series:
    """Progressive MangleAgents-analog normalization (P13), levels 0–4."""
    t = s.str.lower()
    if level >= 1:
        t = t.str.replace(TOOL_VERSION_SUFFIX, "", regex=True)
    if level >= 2:
        t = t.str.slice(0, _MANGLE_TRUNC[min(level, 4)])
    return t


def status_class(status: pd.Series) -> pd.Series:
    return (status // 100).map(STATUS_CLASSES).fillna("other")


def _matches_any(s: pd.Series, patterns) -> pd.Series:
    if not patterns:
        return pd.Series(False, index=s.index)
    rx = re.compile("|".join(f"(?:{p})" for p in patterns))
    return s.fillna("").str.contains(rx)


def run_refmodel(
    turns: pd.DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    tool_categories: dict[str, str] | None = None,
    role_groups: dict[str, str] | None = None,
) -> dict:
    """Run the full pipeline; returns {sink_name: DataFrame} + 'metrics'."""
    tool_categories = tool_categories or {}
    role_groups = role_groups or {}
    df = turns[TURN_COLS].copy()
    total_rec = len(df)

    # ---- parse (P2): grok regex over text --------------------------------
    ext = df["text"].str.extract(config.parse_pattern)
    bad_mask = ext["action"].isna()
    bad = df[bad_mask].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    good = df[~bad_mask].copy()
    ext = ext[~bad_mask]
    good["action"] = ext["action"]
    good["status"] = ext["status"].astype(np.int64)
    good["kb"] = ext["kb"].astype(np.float64)
    good["query"] = ext["query"]

    # ---- normalize + ignore/include filters (P7, P10, P13) ---------------
    good["tool_norm"] = normalize_tool(good["tool"], config.mangle_level)
    ign = (
        _matches_any(good["conv_id"], config.ignore_conv_patterns)
        | _matches_any(good["tool_norm"], config.ignore_tool_patterns)
        | _matches_any(good["role"], config.ignore_role_patterns)
    )
    if (config.include_conv_patterns or config.include_tool_patterns
            or config.include_role_patterns):
        inc = (
            _matches_any(good["conv_id"], config.include_conv_patterns)
            | _matches_any(good["tool_norm"], config.include_tool_patterns)
            | _matches_any(good["role"], config.include_role_patterns)
        )
        ign &= ~inc
    ignored = good[ign][TURN_COLS].copy()
    ignored["ign_reason"] = "pattern"
    good = good[~ign].copy()

    # ---- strict sequence drop (W4) ---------------------------------------
    n_seq = 0
    if config.strict_seq and len(good):
        good = good.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        runmax = good.groupby("conv_id")["ts"].cummax()
        seq_drop = good["ts"] < runmax
        n_seq = int(seq_drop.sum())
        seq_rows = good[seq_drop][TURN_COLS].copy()
        seq_rows["ign_reason"] = "seq"
        ignored = pd.concat([ignored, seq_rows], ignore_index=True)
        good = good[~seq_drop].copy()
    ignored = ignored.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # ---- enrich (ST1–ST3) + derived time columns (P6) --------------------
    good["category"] = good["tool_norm"].map(
        lambda t: None if t is None or (isinstance(t, float) and np.isnan(t))
        else tool_categories.get(t, config.unresolved_category))
    good["grp"] = good["role"].map(
        lambda r: role_groups.get(r, config.unresolved_category))
    rts = good["ts"] + pd.Timedelta(hours=config.tz_offset_hours) \
        if config.tz_offset_hours else good["ts"]
    good["month"] = rts.dt.strftime("%Y-%m")
    good["date"] = rts.dt.strftime("%Y-%m-%d")
    good["hour"] = rts.dt.hour.astype(np.int64)
    good["is_content"] = good["role"] == config.content_role
    good["is_file"] = good["status"] == config.file_status

    # ---- user-extension stages (§2.10) ------------------------------
    # Same registered Arrow fns the engine splices in after enrichment,
    # applied to the parsed/enriched surface (stages contract: rewrite
    # parsed columns only, one row in → one row out).
    if config.extra_stages:
        from webalizer_ray.extensions import apply_stages_pandas
        good = apply_stages_pandas(good, config.extra_stages)

    # ---- sessionize (W1–W3), fully vectorized ----------------------------
    good = good.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    same_conv = good["conv_id"].eq(good["conv_id"].shift())
    gap = (good["ts"] - good["ts"].shift()).dt.total_seconds()
    new_sess = ~same_conv | (gap >= config.session_timeout_s)
    if config.split_sessions_on_month:
        new_sess |= same_conv & good["month"].ne(good["month"].shift())
    if config.fold_seq:
        # FoldSeqErr (W4 fold): a backwards time jump flushes the current
        # period — the out-of-sequence row starts a NEW session
        new_sess |= same_conv & (gap < 0)
    good["session_id"] = new_sess.groupby(good["conv_id"]).cumsum().astype(np.int64)

    def first_nonnull(s):
        s = s.dropna()
        return s.iloc[0] if len(s) else None

    def last_nonnull(s):
        s = s.dropna()
        return s.iloc[-1] if len(s) else None

    if len(good):
        sess = good.groupby(["conv_id", "session_id"], sort=True).agg(
            start_ts=("ts", "first"), end_ts=("ts", "last"),
            n_turns=("ts", "size"), kb=("kb", "sum"),
            files=("is_file", "sum"), pages=("is_content", "sum"),
            entry_tool=("tool_norm", first_nonnull),
            exit_tool=("tool_norm", last_nonnull),
        ).reset_index()
    else:
        sess = pd.DataFrame(columns=["conv_id", "session_id", "start_ts",
                                     "end_ts", "n_turns", "kb", "files",
                                     "pages", "entry_tool", "exit_tool"])
    sess["month"] = pd.to_datetime(sess["start_ts"]).dt.strftime("%Y-%m")
    sess["date"] = pd.to_datetime(sess["start_ts"]).dt.strftime("%Y-%m-%d")
    for c in ("n_turns", "files", "pages"):
        sess[c] = sess[c].astype(np.int64)

    # ---- aggregates (A1–A10) ---------------------------------------------
    def agg(keys, frame=None):
        f = good if frame is None else frame
        out = f.groupby(keys, sort=True, dropna=True).agg(
            hits=("ts", "size"), files=("is_file", "sum"),
            pages=("is_content", "sum"), kb=("kb", "sum")).reset_index()
        for c in ("hits", "files", "pages"):
            out[c] = out[c].astype(np.int64)
        return out

    hourly = agg("hour")
    daily = agg("date")
    d_convs = good.groupby("date")["conv_id"].nunique().rename("convs")
    d_sess = sess.groupby("date")["session_id"].size().rename("sessions")
    daily = daily.merge(d_convs, on="date", how="left") \
                 .merge(d_sess, on="date", how="left")
    daily[["convs", "sessions"]] = daily[["convs", "sessions"]].fillna(0).astype(np.int64)

    monthly = agg("month")
    m_convs = good.groupby("month")["conv_id"].nunique().rename("convs")
    m_tools = good.dropna(subset=["tool_norm"]).groupby("month")["tool_norm"] \
                  .nunique().rename("tools")
    m_sess = sess.groupby("month")["session_id"].size().rename("sessions")
    monthly = (monthly.merge(m_convs, on="month", how="left")
               .merge(m_tools, on="month", how="left")
               .merge(m_sess, on="month", how="left"))
    monthly[["convs", "tools", "sessions"]] = (
        monthly[["convs", "tools", "sessions"]].fillna(0).astype(np.int64))

    per_conv = agg("conv_id")
    pc_sess = sess.groupby("conv_id")["session_id"].size().rename("sessions")
    pc_ts = good.groupby("conv_id")["ts"].agg(first_ts="min", last_ts="max")
    per_conv = per_conv.merge(pc_sess, on="conv_id").merge(pc_ts, on="conv_id")
    per_conv["sessions"] = per_conv["sessions"].astype(np.int64)

    tool_rows = good.dropna(subset=["tool_norm"])
    per_tool = tool_rows.groupby("tool_norm", sort=True).agg(
        hits=("ts", "size"), kb=("kb", "sum")).reset_index()
    per_tool["hits"] = per_tool["hits"].astype(np.int64)
    entry = sess.dropna(subset=["entry_tool"]).groupby("entry_tool") \
                .size().rename("entry")
    exit_ = sess.dropna(subset=["exit_tool"]).groupby("exit_tool") \
                .size().rename("exit")
    per_tool = (per_tool.merge(entry, left_on="tool_norm", right_index=True,
                               how="left")
                .merge(exit_, left_on="tool_norm", right_index=True, how="left"))
    per_tool[["entry", "exit"]] = per_tool[["entry", "exit"]].fillna(0).astype(np.int64)

    per_role = good.groupby("role", sort=True).agg(
        hits=("ts", "size"), kb=("kb", "sum")).reset_index()
    per_role["hits"] = per_role["hits"].astype(np.int64)

    per_grp = good.groupby("grp", sort=True).agg(
        hits=("ts", "size"), kb=("kb", "sum")).reset_index()
    per_grp["hits"] = per_grp["hits"].astype(np.int64)

    cat_rows = tool_rows
    per_category = cat_rows.groupby("category", sort=True).agg(
        hits=("ts", "size"), kb=("kb", "sum")).reset_index()
    pc_conv = cat_rows.groupby("category")["conv_id"].nunique().rename("convs")
    per_category = per_category.merge(pc_conv, on="category")
    per_category[["hits", "convs"]] = per_category[["hits", "convs"]].astype(np.int64)

    status_hist = good.groupby("status", sort=True).size().rename("hits") \
                      .reset_index()
    status_hist["hits"] = status_hist["hits"].astype(np.int64)
    sc = good.assign(status_class=status_class(good["status"]))
    status_class_hist = sc.groupby("status_class", sort=True).size() \
                          .rename("hits").reset_index()
    status_class_hist["hits"] = status_class_hist["hits"].astype(np.int64)

    q_rows = good.dropna(subset=["query"])
    terms = q_rows["query"].str.lower().str.replace("+", " ", regex=False)
    search_terms = terms.groupby(terms).size().rename("hits").reset_index() \
                        .rename(columns={"query": "term"})
    search_terms.columns = ["term", "hits"]
    search_terms["hits"] = search_terms["hits"].astype(np.int64)

    # ---- top-N (K1–K3): hits desc, key asc, hidden excluded --------------
    def topn(frame, key, metric, n, hide_patterns=()):
        f = frame
        if hide_patterns:
            f = f[~_matches_any(f[key], hide_patterns)]
        return (f.sort_values([metric, key], ascending=[False, True],
                              kind="mergesort")
                .head(n).reset_index(drop=True))

    N = config.top_n
    tops = {
        "top_conv": topn(per_conv, "conv_id", "hits", N["conv"],
                         config.hide_conv_patterns),
        "top_conv_kb": topn(per_conv, "conv_id", "kb", N["conv_kb"],
                            config.hide_conv_patterns),
        "top_tool": topn(per_tool, "tool_norm", "hits", N["tool"],
                         config.hide_tool_patterns),
        "top_tool_kb": topn(per_tool, "tool_norm", "kb", N["tool_kb"],
                            config.hide_tool_patterns),
        "top_entry": topn(per_tool, "tool_norm", "entry", N["entry"],
                          config.hide_tool_patterns),
        "top_exit": topn(per_tool, "tool_norm", "exit", N["exit"],
                         config.hide_tool_patterns),
        "top_role": topn(per_role, "role", "hits", N["role"]),
        "top_category": topn(per_category, "category", "hits", N["category"]),
        "top_search": topn(search_terms, "term", "hits", N["search"]),
    }

    turns_out = good.sort_values(["conv_id", "turn_idx"], kind="mergesort") \
                    .reset_index(drop=True)

    metrics = {
        "total_rec": total_rec,
        "bad": int(len(bad)),
        "ignored": int(len(ignored)),
        "ignored_seq": n_seq,
        "parsed": int(len(good)),
        "sessions": int(len(sess)),
        "convs": int(good["conv_id"].nunique()),
    }
    assert metrics["total_rec"] == metrics["parsed"] + metrics["bad"] + metrics["ignored"]

    return {
        "turns": turns_out, "bad": bad, "ignored": ignored,
        "sessions": sess, "hourly": hourly, "daily": daily,
        "monthly": monthly, "per_conv": per_conv, "per_tool": per_tool,
        "per_role": per_role, "per_grp": per_grp,
        "per_category": per_category, "status_hist": status_hist,
        "status_class_hist": status_class_hist, "search_terms": search_terms,
        **tops, "metrics": metrics,
    }
