"""Vectorized parse / normalize / route stage (SURVEY.md §2.2 P2–P15).

The analog of the reference's per-record block — parser.c:parse_record_web()
(≈200–450 [verify]) for field extraction, webalizer.c's main-loop date
handling (≈3450–3520 [verify]), unescape()/IndexAlias URL normalization
(≈3700 [verify]), ispage() (≈3650 [verify]), the response-code classify
block (≈3530 [verify]) and the linklist.c:isinlist() Ignore* filter — but
re-expressed as ONE stateless ``map_batches`` function over zero-copy Arrow
batches: a single compiled RE2 pattern (``pyarrow.compute.extract_regex``)
replaces the per-line C tokenizer, and every derived column is an Arrow
kernel. No Python-per-row work anywhere.

Routing: instead of ``continue``-ing out of a C loop, each row gets a
``route`` column ∈ {ok, bad, ignored} (total_bad / total_ignore analogs);
downstream sinks filter on it, and the fan-out writer partitions by it.

Deviations from the reference (documented in refmodel.py too):
* optional QUERY group: absent (or empty) ⇒ null, matching the pandas /
  DuckDB oracles' NULL semantics.
* the out-of-sequence drop (W4) is per-conversation state and lives in the
  session stage (strict_seq mode), not here — a batch cannot see its
  neighbors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from webalizer_ray.config import (
    DEFAULT_CONFIG,
    TOOL_VERSION_SUFFIX,
    PipelineConfig,
)

ROUTE_OK = "ok"
ROUTE_BAD = "bad"
ROUTE_IGNORED = "ignored"

#: Columns the parse stage appends to the six input columns.
PARSED_COLS = [
    "action", "status", "kb", "query", "tool_norm", "month", "date", "hour",
    "is_content", "is_file", "status_class", "bucket", "route",
]


def _alternation(patterns) -> str | None:
    return "|".join(f"(?:{p})" for p in patterns) if patterns else None


def _matches(col: pa.ChunkedArray | pa.Array, rx: str | None) -> pa.Array:
    """Vectorized wildcard-list match (linklist.c:isinlist() analog)."""
    if rx is None:
        return pa.array(np.zeros(len(col), dtype=bool))
    m = pc.match_substring_regex(col, rx)
    return pc.fill_null(m, False)


def conv_bucket(conv_id, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket of conv_id (explicit hash partitioning).

    Uses pandas' SipHash-based ``hash_array`` (stable across processes and
    runs — the fixed default hash key), so the partitioning survives
    checkpoint/resume and is identical on every cluster size.
    """
    if isinstance(conv_id, (pa.ChunkedArray, pa.Array)):
        conv_id = conv_id.to_numpy(zero_copy_only=False)
    return (pd.util.hash_array(np.asarray(conv_id, dtype=object))
            % np.uint64(num_buckets)).astype(np.int32)


#: mangle_level → truncation length (the MAXAGENT-buffer coarsening steps)
MANGLE_TRUNC = {2: 8, 3: 4, 4: 2}


def mangle_tool_arrow(tool, level: int):
    """Progressive tool normalization (P13 MangleAgents analog), Arrow
    kernels only: 0 = lowercase; 1 = + strip version suffix; 2/3/4 =
    + truncate to 8/4/2 chars."""
    t = pc.utf8_lower(tool)
    if level >= 1:
        t = pc.replace_substring_regex(t, pattern=TOOL_VERSION_SUFFIX,
                                       replacement="")
    if level >= 2:
        t = pc.utf8_slice_codeunits(t, 0, MANGLE_TRUNC[min(level, 4)])
    return t


def status_class_arr(status: pa.Array) -> pa.Array:
    """Response-code family classify (webalizer.h TOTAL_RC analog)."""
    fam = pc.cast(pc.divide(status, 100), pa.int64())
    out = pc.case_when(
        pc.make_struct(
            pc.equal(fam, 2), pc.equal(fam, 3), pc.equal(fam, 4),
            pc.equal(fam, 5),
        ),
        "success", "redirect", "client_error", "server_error", "other",
    )
    return out


def make_parse_fn(config: PipelineConfig = DEFAULT_CONFIG,
                  num_buckets: int | None = None):
    """Build the stateless per-batch parse fn (closure holds only config).

    Arrow in / Arrow out; appends PARSED_COLS. Rows that fail the grok
    pattern keep null derived fields and route="bad"; rows matching any
    Ignore* pattern route="ignored" (still parsed, excluded downstream —
    exactly the reference's total_ignore semantics, dropped from ALL counts).
    """
    B = num_buckets or config.salt_buckets * 16
    parse_pattern = config.parse_pattern
    mangle_level = config.mangle_level
    tz_offset_hours = config.tz_offset_hours
    ignore_conv_rx = _alternation(config.ignore_conv_patterns)
    ignore_tool_rx = _alternation(config.ignore_tool_patterns)
    ignore_role_rx = _alternation(config.ignore_role_patterns)
    include_conv_rx = _alternation(config.include_conv_patterns)
    include_tool_rx = _alternation(config.include_tool_patterns)
    include_role_rx = _alternation(config.include_role_patterns)

    def parse_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch["text"]
        ext = pc.extract_regex(text, parse_pattern)
        ok = pc.fill_null(pc.is_valid(ext), False)

        action = pc.struct_field(ext, "action")
        status = pc.cast(pc.struct_field(ext, "status"), pa.int64())
        kb = pc.cast(pc.struct_field(ext, "kb"), pa.float64())
        query = pc.struct_field(ext, "query")
        # absent/empty optional group → null (oracle NULL semantics)
        query = pc.if_else(pc.equal(query, ""), pa.scalar(None, pa.string()),
                           query)

        tool_norm = mangle_tool_arrow(batch["tool"], mangle_level)

        ts = batch["ts"]
        if tz_offset_hours:
            # GMTTime analog (webalizer.c tstamp shift [verify]): report
            # in a fixed local offset; derived cols shift, raw ts stays
            ts = pc.add(ts, pa.scalar(tz_offset_hours * 3_600_000_000,
                                      pa.duration("us")))
        month = pc.strftime(ts, format="%Y-%m")
        date = pc.strftime(ts, format="%Y-%m-%d")
        hour = pc.cast(pc.hour(ts), pa.int64())

        role = batch["role"]
        is_content = pc.equal(role, config.content_role)
        is_file = pc.fill_null(pc.equal(status, config.file_status), False)

        ign = pc.or_(
            pc.or_(_matches(batch["conv_id"], ignore_conv_rx),
                   _matches(tool_norm, ignore_tool_rx)),
            _matches(role, ignore_role_rx))
        if include_conv_rx or include_tool_rx or include_role_rx:
            # Include* overrides (P10): an include match anywhere KEEPS
            # the row — checked before ignore, like the reference
            inc = pc.or_(
                pc.or_(_matches(batch["conv_id"], include_conv_rx),
                       _matches(tool_norm, include_tool_rx)),
                _matches(role, include_role_rx))
            ign = pc.and_(ign, pc.invert(inc))

        route = pc.case_when(
            pc.make_struct(pc.invert(ok), ign),
            ROUTE_BAD, ROUTE_IGNORED, ROUTE_OK)

        # bad/ignored rows never reach pass 2: collapsing their bucket to
        # -1 turns route=bad/ignored into ONE hive partition each (a file
        # per write task, not per (task, bucket)) — metrics counts scan
        # hundreds of footers instead of thousands
        bucket = pa.array(
            np.where(np.asarray(pc.equal(route, ROUTE_OK)),
                     conv_bucket(batch["conv_id"], B),
                     np.int32(-1)), pa.int32())

        cols = {
            "action": action, "status": status, "kb": kb, "query": query,
            "tool_norm": tool_norm, "month": month, "date": date,
            "hour": hour, "is_content": is_content, "is_file": is_file,
            "status_class": status_class_arr(status), "bucket": bucket,
            "route": route,
        }
        out = batch
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        assert out.num_rows == n
        return out

    return parse_batch


def only_route(route: str):
    """Predicate stage: keep rows with the given route (vectorized filter)."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["route"], route))
    return f
