"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Generates the engine's primary input per ``BASELINE.json.input_hint``:

    turns(conv_id:string, turn_idx:int32, role:string, text:string,
          tool:string, ts:timestamp[us])

plus the enrichment lookup tables (tool_categories, role_groups — the
DNS-cache / GeoDB analogs, dns_resolv.c / geodb.c [verify]). Everything is
seeded numpy; no external data. The generator is fully vectorized so the
bench scale (10^6+ rows) builds in seconds.

Edge cases baked in (FIXTURES.md §5): gap == exactly the session timeout,
single-turn convs, a designated giant conv, month-boundary-crossing convs,
~0.5% out-of-order ts pairs, duplicate ts, null tool, empty text,
non-ASCII text, text containing the grammar's own delimiters, tools missing
from tool_categories, and 1–3 hot convs holding ~20% of all rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
US = 1_000_000  # microseconds per second

VERBS = np.array(["ask", "answer", "call", "observe", "plan"])
STATUS_CODES = np.array([200, 206, 301, 302, 304, 400, 401, 403, 404, 500, 503])
STATUS_P = np.array([0.55, 0.05, 0.04, 0.03, 0.05, 0.08, 0.03, 0.03, 0.08, 0.04, 0.02])

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_P = np.array([0.45, 0.45, 0.08, 0.02])

# ~40 tool names incl. versioned variants (normalization tests) — the URL
# population analog. A few are deliberately ABSENT from tool_categories.
TOOL_POOL = [
    "search", "search_v2", "browse", "browse_v3", "code_exec", "code_exec_v2",
    "calc", "calc_v10", "read_file", "write_file", "edit_file", "bash",
    "python", "sql_query", "sql_query_v2", "http_get", "http_post",
    "summarize", "translate", "translate_v4", "ocr", "speech_to_text",
    "image_gen", "image_gen_v2", "embed", "rerank", "classify", "extract",
    "plan_tool", "memory_read", "memory_write", "scratchpad", "citation",
    "weather", "stock_quote", "map_route", "news_feed", "crawler",
    "mystery_tool", "legacy_probe",  # absent from tool_categories → Unresolved
]

TOOL_CATEGORY = {
    "search": "retrieval", "browse": "retrieval", "http_get": "retrieval",
    "http_post": "retrieval", "crawler": "retrieval", "news_feed": "retrieval",
    "code_exec": "compute", "calc": "compute", "python": "compute",
    "bash": "compute", "sql_query": "compute",
    "read_file": "filesystem", "write_file": "filesystem",
    "edit_file": "filesystem", "scratchpad": "filesystem",
    "memory_read": "memory", "memory_write": "memory", "citation": "memory",
    "summarize": "nlp", "translate": "nlp", "classify": "nlp",
    "extract": "nlp", "rerank": "nlp", "embed": "nlp",
    "ocr": "perception", "speech_to_text": "perception",
    "image_gen": "perception",
    "plan_tool": "control", "weather": "external", "stock_quote": "external",
    "map_route": "external",
    # mystery_tool / legacy_probe intentionally missing → "Unresolved"
}

ROLE_GROUP = {
    "user": "human", "assistant": "model",
    "tool": "automation", "system": "automation",
}

# word pool for QUERY= and free-text tails; includes unicode, embedded
# quotes/brackets and the grammar's own delimiters.
WORDS = [
    "alpha", "beta", "gamma", "delta", "query", "vector", "tensor", "batch",
    "stream", "shuffle", "naïve", "café", "δοκιμή", "日本語", "emoji🙂",
    'quo"ted', "brack[et]", "paren(s)", "ACTION=fake", "STATUS=999",
    "tail", "data", "model", "agent", "prompt", "token", "chunk", "merge",
]

MALFORMED = [
    "ACTION=call KB=1.00 missing status",            # required field dropped
    "STATUS=200 KB=2.00 missing action",
    "ACTION=call STATUS=2x0 KB=3.00 bad code",
    "ACTION=call STATUS=200 KB=4.0 one-decimal kb",
    'ACTION=Call STATUS=200 KB=5.00 upper verb',
    "",                                              # empty text
    "free text only, no grammar at all",
]


def _conv_sizes(rng, n_convs, hot_convs, hot_frac, giant_conv_size):
    """Zipf-ish per-conv turn counts + designated hot convs (skew tests)."""
    sizes = rng.zipf(1.6, size=n_convs).clip(1, 400).astype(np.int64)
    base = int(sizes.sum())
    if hot_convs > 0 and hot_frac > 0:
        # hot convs jointly hold ~hot_frac of ALL rows
        hot_total = int(base * hot_frac / (1.0 - hot_frac))
        per = max(2, hot_total // hot_convs)
        sizes[:hot_convs] = per
    if giant_conv_size:
        sizes[0] = giant_conv_size
    return sizes


def generate_turns(
    n_convs: int = 1000,
    seed: int = SEED,
    hot_convs: int = 2,
    hot_frac: float = 0.20,
    giant_conv_size: int | None = None,
    start: str = "2024-01-10",
    span_days: int = 80,
    bad_frac: float = 0.01,
    ooo_frac: float = 0.005,
) -> pa.Table:
    """Build the turns table as one Arrow table, sorted by (ts, conv_id)."""
    rng = np.random.default_rng(seed)
    sizes = _conv_sizes(rng, n_convs, hot_convs, hot_frac, giant_conv_size)
    n = int(sizes.sum())
    conv_ix = np.repeat(np.arange(n_convs), sizes)
    starts_at = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts_at, sizes)).astype(np.int32)

    # --- timestamps ------------------------------------------------------
    t0 = np.datetime64(start, "us").astype(np.int64)
    conv_start = t0 + (rng.uniform(0, span_days * 86400, n_convs) * US).astype(np.int64)
    # ~2% of convs start 10 min before a month boundary (W3 split tests)
    n_cross = max(1, n_convs // 50)
    feb1 = np.datetime64("2024-02-01", "us").astype(np.int64)
    mar1 = np.datetime64("2024-03-01", "us").astype(np.int64)
    cross_ix = rng.choice(n_convs, n_cross, replace=False)
    conv_start[cross_ix] = np.where(
        rng.random(n_cross) < 0.5, feb1, mar1
    ) - 600 * US

    # inter-turn gaps: lognormal seconds; ~5% >= timeout; some exactly 1800
    gaps = rng.lognormal(3.0, 1.6, n).clip(0.001, 1500.0)
    long_ix = rng.random(n) < 0.05
    gaps[long_ix] = rng.uniform(1800.0, 30000.0, int(long_ix.sum()))
    exact_ix = rng.random(n) < 0.003
    gaps[exact_ix] = 1800.0
    dup_ix = rng.random(n) < 0.002
    gaps[dup_ix] = 0.0                       # duplicate ts within a conv
    g_us = (gaps * US).astype(np.int64)
    g_us[starts_at] = 0
    cs = np.cumsum(g_us)
    ts = np.repeat(conv_start, sizes) + (cs - np.repeat(cs[starts_at], sizes))

    # ~0.5% out-of-order: swap ts of (i-1, i) pairs within a conv
    elig = np.flatnonzero((turn_idx >= 1) & (rng.random(n) < ooo_frac))
    if elig.size:
        prev = elig - 1
        ts[prev], ts[elig] = ts[elig].copy(), ts[prev].copy()

    # --- roles / tools ---------------------------------------------------
    role_ix = rng.choice(len(ROLES), n, p=ROLE_P)
    # ROLES order: user, assistant, tool, system → tools only on 1/2
    tool_ok = np.isin(role_ix, [1, 2]) & (rng.random(n) < 0.25)

    # --- text (Arrow-kernel string assembly; np.char loops at Python
    # speed and U-dtype arrays blow memory at 10^7+ rows) ----------------
    import pyarrow.compute as pc

    def take(pool, ix):
        return pc.take(pa.array(list(pool), pa.string()), pa.array(ix))

    action_ix = rng.integers(0, len(VERBS), n)
    status = STATUS_CODES[rng.choice(len(STATUS_CODES), n, p=STATUS_P)]
    kb_cents = np.round(rng.lognormal(0.5, 1.0, n), 2).clip(0.01, 9999.99)
    kb_cents = np.round(kb_cents * 100).astype(np.int64)
    qa_ix = rng.integers(0, len(WORDS), n)
    qb_ix = rng.integers(0, len(WORDS), n)
    has_q = rng.random(n) < 0.10
    # pre-built pool of free-text tails (keeps assembly O(n) array ops)
    warr = np.array(WORDS)
    tail_pool = [
        " ".join(warr[rng.integers(0, len(warr), rng.integers(3, 40))])
        for _ in range(256)
    ]
    tail_ix = rng.integers(0, 256, n)
    bad_mask = rng.random(n) < bad_frac
    mal_ix = rng.integers(0, len(MALFORMED), n)
    tool_ix = rng.integers(0, len(TOOL_POOL), n)

    # global time order (real log shape: convs interleave across files),
    # applied to the index arrays BEFORE Arrow assembly — sorting the
    # built table would materialize a >2 GiB single text array
    order = np.lexsort((turn_idx, conv_ix, ts))
    (conv_ix, turn_idx, ts, role_ix, tool_ok, tool_ix, action_ix, status,
     kb_cents, qa_ix, qb_ix, has_q, tail_ix, bad_mask, mal_ix) = (
        a[order] for a in (conv_ix, turn_idx, ts, role_ix, tool_ok,
                           tool_ix, action_ix, status, kb_cents, qa_ix,
                           qb_ix, has_q, tail_ix, bad_mask, mal_ix))

    # assemble in ≤4M-row chunks: one joined 10^7+-row text array would
    # blow the 2 GiB non-large string limit
    CHUNK = 4_000_000
    chunks = []
    for lo in range(0, n, CHUNK):
        s = slice(lo, lo + CHUNK)
        kb_str = pc.binary_join_element_wise(
            pc.cast(pa.array(kb_cents[s] // 100), pa.string()), ".",
            pc.utf8_slice_codeunits(
                pc.cast(pa.array(kb_cents[s] % 100 + 100), pa.string()),
                1, 3), "")
        q_words = pc.binary_join_element_wise(
            take(WORDS, qa_ix[s]), " ", take(WORDS, qb_ix[s]), "")
        qpart = pc.if_else(
            pa.array(has_q[s]),
            pc.binary_join_element_wise(' QUERY="', q_words, '"', ""),
            pa.scalar(""))
        chunk = pc.binary_join_element_wise(
            "ACTION=", take(VERBS, action_ix[s]), " STATUS=",
            pc.cast(pa.array(status[s]), pa.string()), " KB=", kb_str,
            qpart, " ", take(tail_pool, tail_ix[s]), "")
        chunk = pc.if_else(pa.array(bad_mask[s]),
                           take(MALFORMED, mal_ix[s]), chunk)
        chunks.append(chunk)
    text = pa.chunked_array(chunks)

    conv_id = pc.binary_join_element_wise(
        "conv-", pc.utf8_slice_codeunits(
            pc.cast(pa.array(conv_ix + 100_000_000), pa.string()), 1, 9), "")

    role = take(ROLES, role_ix)
    tool = pc.if_else(pa.array(tool_ok), take(TOOL_POOL, tool_ix),
                      pa.scalar(None, pa.string()))

    return pa.table({
        "conv_id": conv_id,
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": role,
        "text": text,
        "tool": tool,
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def write_turns(tbl: pa.Table, out_dir: str, n_files: int = 8) -> list[str]:
    """Write the turns table as n_files parquet shards (row-range split)."""
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    paths = []
    bounds = np.linspace(0, n, n_files + 1).astype(np.int64)
    for i in range(n_files):
        part = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        p = os.path.join(out_dir, f"turns-{i:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def lookup_tables() -> tuple[pa.Table, pa.Table]:
    """Enrichment lookups: tool→category (with deliberate misses), role→grp."""
    tools = sorted(TOOL_CATEGORY)
    tool_categories = pa.table({
        "tool": pa.array(tools, pa.string()),
        "category": pa.array([TOOL_CATEGORY[t] for t in tools], pa.string()),
    })
    role_groups = pa.table({
        "role": pa.array(sorted(ROLE_GROUP), pa.string()),
        "grp": pa.array([ROLE_GROUP[r] for r in sorted(ROLE_GROUP)], pa.string()),
    })
    return tool_categories, role_groups


def write_lookups(out_dir: str) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    tc, rg = lookup_tables()
    tc_path = os.path.join(out_dir, "tool_categories.parquet")
    rg_path = os.path.join(out_dir, "role_groups.parquet")
    pq.write_table(tc, tc_path)
    pq.write_table(rg, rg_path)
    return tc_path, rg_path


SCALES = {
    # name: (n_convs, n_files, giant_conv_size)
    "tiny": (20, 2, None),
    "small": (1000, 8, None),
    "bench": (40_000, 32, 20_000),
}


def build_fixture_dir(out_dir: str, scale: str = "small", seed: int = SEED,
                      n_convs: int | None = None, n_files: int | None = None,
                      giant_conv_size: int | None = None) -> str:
    """Materialize <out_dir>/turns/*.parquet + lookup parquet files."""
    c, f, g = SCALES[scale]
    tbl = generate_turns(n_convs=n_convs or c, seed=seed,
                         giant_conv_size=giant_conv_size or g)
    write_turns(tbl, os.path.join(out_dir, "turns"), n_files=n_files or f)
    write_lookups(out_dir)
    return out_dir
