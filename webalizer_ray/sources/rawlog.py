"""Raw text transcript-log ingestion (SURVEY.md §2.1 S1, §2.2 P1–P5).

The reference reads line-oriented text logs in four dialects selected by
``LogType`` — CLF/combined (parser.c:parse_record_web() ≈200–450
[verify]), FTP xferlog (parse_record_ftp() ≈450–650), Squid native
(parse_record_squid() ≈650–800) and W3C extended with a ``#Fields:``
header (parse_record_w3c() ≈800–1100) — through a per-line C tokenizer
(fmt_logrec() ≈60–120) that splits on spaces while respecting quotes and
brackets.

Our re-expression: a FORMAT REGISTRY of grok (RE2) patterns, each parsed
with ONE vectorized ``pyarrow.compute.extract_regex`` call per batch over
the zero-copy line column from ``ray.data.read_text`` — no per-line
Python. Malformed lines get route="bad" (total_bad analog, P15) instead
of a ``continue``. Each format also has a vectorized serializer so tests
can round-trip: turns → log text → turns.

Formats (all line = one turn of the canonical schema):
  clf    ``conv [iso_ts] idx role tool "text"``   — quoted free text with
         backslash escapes, tool "-" = null (the combined-log analog)
  squid  ``epoch_us conv idx role tool "text"``   — epoch-microsecond ts
         (the squid native-format analog: epoch.ms leading timestamp)
  w3c    ``#Fields: …`` header naming the space-separated columns in any
         order; values %XX-escaped (the IIS extended-log analog; header
         drives a generated pattern, like the reference's field map)
  ftp    ``Ddd Mmm dd hh:mm:ss YYYY conv idx role tool "text"`` — the
         wu-ftpd xferlog timestamp grammar (asctime-style: weekday +
         month NAME + space-padded day; parse_record_ftp() ≈450–650
         [verify]); the month-name lookup and day padding are the
         dialect's distinguishing parse steps. The weekday token is
         accepted unvalidated, as in the reference.

Compression: shards ending ``.gz`` / ``.bz2`` decompress transparently on
read (Arrow's by-extension codec detection under ``ray.data.read_text``);
the writer takes ``compress=False | True/'gz' | 'bz2'`` (the reference
links both zlib and bzlib for the same purpose).

Escape discipline for quoted text (clf/squid): ``\\`` ``\"`` and ``\n``;
decode is 3 chained replaces via a NUL placeholder (text must not contain
NUL — asserted at serialize time). W3C uses %25/%20/%22/%0A escapes.
"""

from __future__ import annotations

import bz2
import gzip
import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TURN_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("role", pa.string()), ("text", pa.string()),
    ("tool", pa.string()), ("ts", pa.timestamp("us")),
])

_QTEXT = r'"(?P<text>(?:[^"\\]|\\.)*)"'
#: Typed sub-patterns: the regex admits ONLY castable values, so a line
#: with a malformed date / overflowing index routes to bad instead of
#: crashing the cast ("\d+" alone would match e.g. an 11-digit turn_idx
#: that overflows int32).
_TS = r'\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?'
_IDX = r'\d{1,9}'          # < 2^31
_EPOCH = r'\d{1,18}'       # < 2^63 µs

CLF_PATTERN = (rf'^(?P<conv_id>\S+) \[(?P<ts>{_TS})\] '
               rf'(?P<turn_idx>{_IDX}) '
               r'(?P<role>\S+) (?P<tool>\S+) ' + _QTEXT + r'$')
SQUID_PATTERN = (rf'^(?P<ts>{_EPOCH}) (?P<conv_id>\S+) '
                 rf'(?P<turn_idx>{_IDX}) '
                 r'(?P<role>\S+) (?P<tool>\S+) ' + _QTEXT + r'$')

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
FTP_PATTERN = (r'^(?P<wday>[A-Za-z]{3}) (?P<mon>[A-Za-z]{3})'
               r'\s+(?P<day>\d{1,2}) '
               r'(?P<time>\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?) (?P<year>\d{4}) '
               rf'(?P<conv_id>\S+) (?P<turn_idx>{_IDX}) '
               r'(?P<role>\S+) (?P<tool>\S+) ' + _QTEXT + r'$')

W3C_FIELDS = ["conv_id", "turn_idx", "role", "tool", "ts", "text"]


# ---------------------------------------------------------------------------
# vectorized escape / unescape
# ---------------------------------------------------------------------------

def _esc_quoted(col: pa.ChunkedArray) -> pa.ChunkedArray:
    col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    col = pc.replace_substring(col, pattern='"', replacement='\\"')
    return pc.replace_substring(col, pattern="\n", replacement="\\n")


def _unesc_quoted(col):
    # NUL placeholder makes sequential replace correct for '\\"' etc.
    col = pc.replace_substring(col, pattern="\\\\", replacement="\x00")
    col = pc.replace_substring(col, pattern='\\"', replacement='"')
    col = pc.replace_substring(col, pattern="\\n", replacement="\n")
    return pc.replace_substring(col, pattern="\x00", replacement="\\")


_W3C_WS = [(" ", "%20"), ("\t", "%09"), ("\n", "%0A"), ("\r", "%0D"),
           ("\f", "%0C"), ("\v", "%0B"), ('"', "%22")]


def _esc_w3c(col):
    col = pc.replace_substring(col, pattern="%", replacement="%25")
    for ch, code in _W3C_WS:
        col = pc.replace_substring(col, pattern=ch, replacement=code)
    # empty field can't survive a space-split line: "-" token stands in
    # (the W3C/IIS convention); a literal lone "-" is escaped to "%2D"
    col = pc.if_else(pc.equal(col, "-"), pa.scalar("%2D"), col)
    return pc.if_else(pc.equal(col, ""), pa.scalar("-"), col)


def _unesc_w3c(col):
    col = pc.if_else(pc.equal(col, "-"), pa.scalar(""), col)
    col = pc.if_else(pc.equal(col, "%2D"), pa.scalar("-"), col)
    for ch, code in _W3C_WS:
        col = pc.replace_substring(col, pattern=code, replacement=ch)
    return pc.replace_substring(col, pattern="%25", replacement="%")


def _null_dash(col):
    """'-' token ⇒ null (the CLF missing-field convention)."""
    return pc.if_else(pc.equal(col, "-"), pa.scalar(None, pa.string()), col)


def _dash_null(col):
    return pc.fill_null(col, "-")


# ---------------------------------------------------------------------------
# serializers: canonical turns batch -> line array
# ---------------------------------------------------------------------------

def _check_no_nul(text):
    if len(text) and pc.any(pc.match_substring(text, "\x00")).as_py():
        raise ValueError("text contains NUL; not serializable to clf/squid")


def _check_fields(tbl: pa.Table, w3c_first: str | None = None):
    """Serialize-time validation of the UNQUOTED fields.

    conv_id/role/tool travel as bare space-separated tokens in every
    dialect: embedded whitespace would shift the line's field grid and
    the row would silently route to bad (or worse, misparse) on
    read-back. Likewise a w3c line whose first token starts with '#'
    would be dropped as a comment. Fail loudly at serialize time instead
    of silently losing data.
    """
    for name in ("conv_id", "role", "tool"):
        col = tbl[name]
        valid = pc.drop_null(col)
        if len(valid) and pc.any(
                pc.match_substring_regex(valid, r"\s")).as_py():
            raise ValueError(
                f"{name} contains whitespace; not serializable as a bare "
                "log token")
        if len(valid) and pc.any(pc.equal(valid, "")).as_py():
            raise ValueError(f"{name} contains empty strings; not "
                             "serializable as a bare log token")
    if w3c_first is not None:
        col = pc.fill_null(tbl[w3c_first], "")
        if len(col) and pc.any(pc.starts_with(col, "#")).as_py():
            raise ValueError(
                f"w3c first field {w3c_first} starts with '#'; such lines "
                "would be dropped as comments on read-back")


def _fmt_clf(tbl: pa.Table) -> pa.Array:
    _check_no_nul(tbl["text"])
    _check_fields(tbl)
    iso = pc.strftime(tbl["ts"], format="%Y-%m-%dT%H:%M:%S")
    parts = [tbl["conv_id"], pa.scalar(" ["), iso, pa.scalar("] "),
             pc.cast(tbl["turn_idx"], pa.string()), pa.scalar(" "),
             tbl["role"], pa.scalar(" "), _dash_null(tbl["tool"]),
             pa.scalar(' "'), _esc_quoted(tbl["text"]), pa.scalar('"')]
    return pc.binary_join_element_wise(
        *[pc.cast(p, pa.string()) if isinstance(p, (pa.Array, pa.ChunkedArray))
          else p for p in parts], "")


def _fmt_squid(tbl: pa.Table) -> pa.Array:
    _check_no_nul(tbl["text"])
    _check_fields(tbl)
    epoch = pc.cast(pc.cast(tbl["ts"], pa.int64()), pa.string())
    parts = [epoch, pa.scalar(" "), tbl["conv_id"], pa.scalar(" "),
             pc.cast(tbl["turn_idx"], pa.string()), pa.scalar(" "),
             tbl["role"], pa.scalar(" "), _dash_null(tbl["tool"]),
             pa.scalar(' "'), _esc_quoted(tbl["text"]), pa.scalar('"')]
    return pc.binary_join_element_wise(*parts, "")


def _fmt_ftp(tbl: pa.Table) -> pa.Array:
    _check_no_nul(tbl["text"])
    _check_fields(tbl)
    ts = tbl["ts"]
    wday = pc.strftime(ts, format="%a")
    mon = pc.strftime(ts, format="%b")
    # asctime convention: day-of-month right-aligned in a 2-char field
    day = pc.utf8_lpad(pc.cast(pc.day(ts), pa.string()), 2, " ")
    rest = pc.strftime(ts, format="%H:%M:%S %Y")
    parts = [wday, pa.scalar(" "), mon, pa.scalar(" "), day,
             pa.scalar(" "), rest, pa.scalar(" "), tbl["conv_id"],
             pa.scalar(" "), pc.cast(tbl["turn_idx"], pa.string()),
             pa.scalar(" "), tbl["role"], pa.scalar(" "),
             _dash_null(tbl["tool"]), pa.scalar(' "'),
             _esc_quoted(tbl["text"]), pa.scalar('"')]
    return pc.binary_join_element_wise(*parts, "")


def _fmt_w3c(tbl: pa.Table) -> pa.Array:
    _check_fields(tbl, w3c_first=W3C_FIELDS[0])
    iso = pc.strftime(tbl["ts"], format="%Y-%m-%dT%H:%M:%S")
    cols = {"conv_id": tbl["conv_id"],
            "turn_idx": pc.cast(tbl["turn_idx"], pa.string()),
            "role": tbl["role"],
            "tool": _dash_null(tbl["tool"]),
            "ts": iso,
            "text": _esc_w3c(tbl["text"])}
    parts = []
    for i, f in enumerate(W3C_FIELDS):
        if i:
            parts.append(pa.scalar(" "))
        parts.append(cols[f])
    return pc.binary_join_element_wise(*parts, "")


# ---------------------------------------------------------------------------
# parsers: line batch -> canonical turns batch (+ route)
# ---------------------------------------------------------------------------

def _decode_common(ext, n, ts_arr, unesc):
    text = unesc(pc.fill_null(pc.struct_field(ext, "text"), ""))
    return pa.table({
        "conv_id": pc.struct_field(ext, "conv_id"),
        "turn_idx": pc.cast(pc.struct_field(ext, "turn_idx"), pa.int32()),
        "role": pc.struct_field(ext, "role"),
        "text": text,
        "tool": _null_dash(pc.struct_field(ext, "tool")),
        "ts": ts_arr,
        "route": pc.if_else(pc.fill_null(pc.is_valid(ext), False),
                            pa.scalar("ok"), pa.scalar("bad")),
    })


def _parse_clf(lines: pa.ChunkedArray) -> pa.Table:
    ext = pc.extract_regex(lines, CLF_PATTERN)
    ts = pc.cast(pc.struct_field(ext, "ts"), pa.timestamp("us"))
    return _decode_common(ext, len(lines), ts, _unesc_quoted)


def _parse_squid(lines: pa.ChunkedArray) -> pa.Table:
    ext = pc.extract_regex(lines, SQUID_PATTERN)
    ts = pc.cast(pc.cast(pc.struct_field(ext, "ts"), pa.int64()),
                 pa.timestamp("us"))
    return _decode_common(ext, len(lines), ts, _unesc_quoted)


def _parse_ftp(lines: pa.ChunkedArray) -> pa.Table:
    """xferlog-timestamp dialect: month-NAME lookup + padded day →
    timestamp; a matching line with a bogus month name routes to bad
    (null month index propagates through the join to a null ts)."""
    ext = pc.extract_regex(lines, FTP_PATTERN)
    mon_idx = pc.index_in(pc.struct_field(ext, "mon"),
                          value_set=pa.array(_MONTHS))
    mon_num = pc.take(pa.array([f"{m + 1:02d}" for m in range(12)]),
                      mon_idx)
    day = pc.utf8_lpad(pc.struct_field(ext, "day"), 2, "0")
    iso = pc.binary_join_element_wise(
        pc.struct_field(ext, "year"), pa.scalar("-"), mon_num,
        pa.scalar("-"), day, pa.scalar("T"),
        pc.struct_field(ext, "time"), "")
    ts = pc.cast(iso, pa.timestamp("us"))
    out = _decode_common(ext, len(lines), ts, _unesc_quoted)
    route = pc.if_else(
        pc.and_(pc.equal(out["route"], "ok"), pc.is_valid(ts)),
        pa.scalar("ok"), pa.scalar("bad"))
    return out.set_column(out.schema.get_field_index("route"),
                          "route", route)


def _w3c_pattern(fields: list[str]) -> str:
    """Generate the positional grok pattern from a #Fields header —
    the analog of parse_record_w3c()'s header-driven field map. The
    ts/turn_idx positions use typed sub-patterns so uncastable values
    route to bad rather than crash."""
    typed = {"ts": _TS, "turn_idx": _IDX}
    default = r"\S+"
    return "^" + " ".join(rf"(?P<{f}>{typed.get(f, default)})"
                          for f in fields) + "$"


def _make_parse_w3c(fields: list[str]):
    pattern = _w3c_pattern(fields)

    def parse(lines: pa.ChunkedArray) -> pa.Table:
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        keep = pc.invert(pc.starts_with(pc.fill_null(lines, "#"), "#"))
        lines = lines.filter(keep)
        ext = pc.extract_regex(lines, pattern)
        ts = pc.cast(pc.struct_field(ext, "ts"), pa.timestamp("us"))
        out = _decode_common(ext, len(lines), ts, _unesc_w3c)
        return out
    return parse


#: Canonical turn schema for the JSON-lines dialect. Unlike the
#: token-grid dialects above, JSONL is LOSSLESS: whitespace in
#: conv_id/role/tool and arbitrary text round-trip via JSON escaping,
#: so no _check_fields gate is needed.
JSONL_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("role", pa.string()), ("text", pa.string()),
    ("tool", pa.string()), ("ts", pa.timestamp("us")),
])


def _fmt_jsonl(tbl: pa.Table) -> pa.Array:
    """One JSON object per line, via pandas' C serializer (vectorized;
    ISO-µs timestamps, non-ASCII passed through)."""
    df = tbl.select([f.name for f in JSONL_SCHEMA]).to_pandas()
    body = df.to_json(orient="records", lines=True, date_format="iso",
                      date_unit="us", force_ascii=False)
    return pa.array(body.splitlines(), pa.string())


def _jsonl_route(t: pa.Table, n: int) -> pa.Table:
    """Attach route: a parsed row is ok iff the NOT-NULL key fields
    (conv_id, turn_idx, ts) are present; text nulls become ''."""
    ok = pc.and_(pc.and_(pc.is_valid(t["conv_id"]),
                         pc.is_valid(t["turn_idx"])),
                 pc.is_valid(t["ts"]))
    return pa.table({
        "conv_id": t["conv_id"],
        "turn_idx": t["turn_idx"],
        "role": t["role"],
        "text": pc.fill_null(t["text"], ""),
        "tool": t["tool"],
        "ts": t["ts"],
        "route": pc.if_else(ok, pa.scalar("ok"), pa.scalar("bad")),
    })


def _parse_jsonl(lines: pa.ChunkedArray) -> pa.Table:
    """Vectorized fast path: the whole batch through pyarrow.json's C++
    NDJSON reader. A batch containing ANY malformed line falls back to
    a per-line loop so only that batch pays Python cost and only the
    bad lines route to bad (error isolation the block reader can't do)."""
    import pyarrow.json as pajson
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    raw = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
    try:
        t = pajson.read_json(
            io.BytesIO(raw),
            parse_options=pajson.ParseOptions(
                explicit_schema=JSONL_SCHEMA,
                unexpected_field_behavior="ignore"))
        return _jsonl_route(t, len(lines))
    except pa.ArrowInvalid:
        pass
    import json as _json
    cols = {f.name: [] for f in JSONL_SCHEMA}
    for ln in lines.to_pylist():
        try:
            o = _json.loads(ln)
            if not isinstance(o, dict):
                o = {}
        except Exception:
            o = {}
        for f in JSONL_SCHEMA:
            cols[f.name].append(o.get(f.name))
    arrs = {}
    for f in JSONL_SCHEMA:
        try:
            arrs[f.name] = pa.array(cols[f.name], f.type)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # per-value salvage: wrong-typed values null out (route=bad)
            vals = []
            for v in cols[f.name]:
                try:
                    vals.append(pa.array([v], f.type)[0].as_py())
                except Exception:
                    vals.append(None)
            arrs[f.name] = pa.array(vals, f.type)
    return _jsonl_route(pa.table(arrs), len(lines))


FORMATS = {
    "clf": (_fmt_clf, _parse_clf),
    "squid": (_fmt_squid, _parse_squid),
    "ftp": (_fmt_ftp, _parse_ftp),
    # w3c parse is header-driven; see read_transcript_log
    "w3c": (_fmt_w3c, None),
    "jsonl": (_fmt_jsonl, _parse_jsonl),
}


# ---------------------------------------------------------------------------
# Ray Data source / sink
# ---------------------------------------------------------------------------

_CODECS = {False: None, None: None, True: "gz", "gz": "gz",
           "gzip": "gz", "bz2": "bz2"}


def write_transcript_log(turns: rd.Dataset, out_dir: str, fmt: str = "clf",
                         compress: bool | str = False) -> None:
    """Serialize a turns Dataset to a directory of log shards.

    Each task writes its own ``part-*.log[.gz|.bz2]`` — a distributed
    text sink (test/demo utility; the engine's real outputs are Parquet).
    ``compress``: False, True/'gz', or 'bz2'.
    """
    codec = _CODECS[compress]
    fmt_fn, _ = FORMATS[fmt]
    os.makedirs(out_dir, exist_ok=True)
    header = (" ".join(["#Fields:"] + W3C_FIELDS) + "\n") if fmt == "w3c" \
        else ""

    def write_shard(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            # an empty block would produce a header-only (or zero-byte)
            # shard whose name collides with every other empty block
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        lines = fmt_fn(tbl)
        body = header + "\n".join(lines.to_pylist()) + "\n"
        # deterministic per-block name: hash over the FULL key columns —
        # a retried task overwrites its own shard, while two blocks that
        # happen to share a first row and row count still get distinct
        # names (duplicate (conv_id, turn_idx) inputs are legal here)
        import hashlib
        key = hashlib.sha1()
        key.update(pd.util.hash_array(
            np.asarray(tbl["conv_id"], dtype=object)).tobytes())
        key.update(pd.util.hash_array(
            np.asarray(tbl["turn_idx"], dtype=np.int64)).tobytes())
        name = f"part-{key.hexdigest()[:16]}.log" + \
            (f".{codec}" if codec else "")
        path = os.path.join(out_dir, name)
        opener = {None: open, "gz": gzip.open, "bz2": bz2.open}[codec]
        with opener(path + ".tmp", "wt", encoding="utf-8") as f:
            f.write(body)
        os.replace(path + ".tmp", path)
        return pa.table({"path": [name], "rows": [tbl.num_rows]})

    turns.map_batches(write_shard, batch_format="pyarrow").materialize()


def _peek_w3c_fields(path: str) -> list[str]:
    op = gzip.open if path.endswith(".gz") \
        else bz2.open if path.endswith(".bz2") else open
    with op(path, "rt", encoding="utf-8") as f:
        first = f.readline().strip()
    if not first.startswith("#Fields:"):
        raise ValueError(f"w3c log {path} missing #Fields header")
    return first.split()[1:]


def read_transcript_log(path: str, fmt: str = "clf",
                        include_bad: bool = False) -> rd.Dataset:
    """read_text + one vectorized grok parse per batch → turns Dataset.

    Malformed lines are counted into route="bad"; by default they are
    dropped here (set include_bad=True to keep the route column and
    route them to a bad sink, P15 style).
    """
    if fmt == "w3c":
        base = path if os.path.isdir(path) else os.path.dirname(path)
        files = sorted(f for f in os.listdir(base)
                       if not f.startswith(".")) \
            if os.path.isdir(path) else [os.path.basename(path)]
        if not files:
            raise ValueError(f"no log files under {path}")
        # one #Fields order must hold for the whole dir (the vectorized
        # pattern is generated once); verify every header up front
        headers = {f: _peek_w3c_fields(os.path.join(base, f))
                   for f in files}
        first = headers[files[0]]
        bad = [f for f, h in headers.items() if h != first]
        if bad:
            raise ValueError(
                f"w3c shards disagree on #Fields order: {bad[:3]} differ "
                f"from {files[0]}; ingest them separately")
        parse = _make_parse_w3c(first)
    else:
        parse = FORMATS[fmt][1]

    def parse_batch(tbl: pa.Table) -> pa.Table:
        out = parse(tbl["text"])
        if not include_bad:
            out = out.filter(pc.equal(out["route"], "ok")) \
                .drop_columns(["route"])
        return out

    return rd.read_text(path).map_batches(parse_batch, batch_format="pyarrow",
                                          zero_copy_batch=True)
