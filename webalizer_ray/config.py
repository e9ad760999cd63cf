"""Pipeline configuration — the engine's "webalizer.conf" analog.

The reference's entire user-extension surface is ~100 config keys parsed by
``webalizer.c:get_config()`` (≈lines 1200–2200 [verify]; see SURVEY.md §2.10).
Ours is a declarative dataclass: the grok pattern registry (parser.c analogs),
ignore/hide wildcard lists (linklist.c:isinlist analogs), the session timeout
(``VisitTimeout``, default 1800 s, consumed by hashtab.c:put_hnode ≈300–450
[verify]), top-N sizes (``TopSites``/``TopURLs``/… in output.c), and lookup
table paths (the DNS-cache / GeoDB analogs from dns_resolv.c / geodb.c).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# The transcript "grok" grammar (FIXTURES.md §1.1) — the CLF/combined-parser
# analog (parser.c:parse_record_web() ≈200–450 [verify]). RE2-compatible so
# the identical pattern string drives pyarrow.compute.extract_regex (engine),
# pandas str.extract (refmodel), and DuckDB regexp_extract (oracle).
PARSE_PATTERN = (
    r'^ACTION=(?P<action>[a-z]+) STATUS=(?P<status>\d{3}) '
    r'KB=(?P<kb>\d+\.\d{2})(?: QUERY="(?P<query>[^"]*)")?'
)

# Versioned-tool suffix stripped by tool normalization (the URL-normalize /
# IndexAlias analog, webalizer.c:unescape + main block ≈3700 [verify]).
TOOL_VERSION_SUFFIX = r"_v\d+$"

# Response-code analog buckets (webalizer.h TOTAL_RC histogram [verify]).
STATUS_CLASSES = {
    2: "success",
    3: "redirect",
    4: "client_error",
    5: "server_error",
}

def default_partitions(n: int | None = None, *, per_cpu: int = 2,
                       floor: int = 8, cap: int = 4096) -> int:
    """THE fan-out knob for every hash-bucket / repartition constant in
    stages/ (VERDICT r4 item 4): partition counts derive from the live
    Ray session instead of being frozen at authoring time.

    ``n`` is an explicit caller override and wins untouched — callers
    that measured a specific fan-out keep it. Otherwise the fan-out is
    ``per_cpu x session CPUs``: a laptop session gets the ``floor`` (so
    skewed keys still spread), a 256-node cluster gets proportionally
    more buckets without editing any stage, and ``cap`` keeps a huge
    cluster from shredding small reduces into thousands of empty
    blocks. ``per_cpu=2`` (default) suits groupby hash buckets where a
    little over-decomposition smooths skew; superstep ``repartition``
    call sites pass ``per_cpu=1`` — there each extra partition is a
    real per-round task, not just a group key.

    Results are invariant to the fan-out except for float-sum
    association (different bucket membership reorders per-bucket
    partial sums); the oracle gate compares floats at atol=1e-9, far
    above ulp-level reassociation drift.
    """
    if n is not None:
        return int(n)
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(floor, min(cap, per_cpu * cpus))


def _rgb(hexs: str) -> tuple:
    """'#RRGGBB' (leading '#' optional) → (r, g, b); the single hex
    validator for every color knob."""
    h = hexs.lstrip("#")
    if len(h) != 6:
        raise ValueError(f"bad color {hexs!r} (want #RRGGBB)")
    try:
        return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))
    except ValueError:
        raise ValueError(f"bad color {hexs!r} (want #RRGGBB)") from None


# Top-N table sizes, mirroring the reference defaults (webalizer.conf.sample:
# TopSites=30 TopKSites=10 TopURLs=30 TopKURLs=10 TopEntry=10 TopExit=10
# TopRefs=30 TopAgents=15 TopSearch=20 TopUsers=20 [verify]).
DEFAULT_TOP_N = {
    "conv": 30,        # TopSites analog (hosts → conv_id)
    "conv_kb": 10,     # TopKSites analog (by transfer volume)
    "tool": 30,        # TopURLs analog
    "tool_kb": 10,     # TopKURLs analog
    "entry": 10,       # TopEntry
    "exit": 10,        # TopExit
    "role": 15,        # TopAgents analog
    "category": 30,    # TopCountries analog
    "search": 20,      # TopSearch
}


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs for the flagship parse→enrich→route→aggregate pipeline."""

    # --- semantics -------------------------------------------------------
    #: Visit/session timeout in seconds (``VisitTimeout``; gap >= timeout
    #: starts a NEW session — the reference tests ``rec_tstamp - tstamp >=
    #: Visit_Timeout`` in put_hnode, so the exact-boundary gap splits).
    session_timeout_s: int = 1800
    #: Sessions additionally split at month boundaries (W3: clear_month()
    #: flushes all state at month change, implicitly ending every visit).
    split_sessions_on_month: bool = True
    #: Role whose turns count as "pages" (ispage() analog): content turns.
    content_role: str = "assistant"
    #: Status code counted as a "file" hit (reference: files = code 200 only).
    file_status: int = 200
    #: strict_seq=True reproduces the reference's out-of-order drop rule
    #: (W4: record older than current per-conv time → ignored+counted).
    #: Default False = heal by sorting on turn_idx (documented deviation,
    #: strictly more correct; SURVEY.md §7.3 item 5).
    strict_seq: bool = False
    #: fold_seq=True is the ``FoldSeqErr`` analog (W4 fold variant): an
    #: out-of-sequence record — within a conv in feed order, ts earlier
    #: than the previous record's — FLUSHES the current period and
    #: restarts instead of being dropped: the backwards jump starts a NEW
    #: session (the reference closes out the month and keeps processing).
    #: Mutually exclusive with strict_seq.
    fold_seq: bool = False
    #: ``MangleAgents`` analog (P13): progressive tool normalization level
    #: applied by the parse stage. 0 = lowercase only; 1 = + strip the
    #: ``_v<digits>`` version suffix (the historical default); 2/3/4 =
    #: + truncate to 8/4/2 chars (the MAXAGENT-buffer coarsening).
    mangle_level: int = 1

    # --- parsing ---------------------------------------------------------
    parse_pattern: str = PARSE_PATTERN

    # --- filters (linklist.c Ignore*/Hide*/Include* analogs; RE2) --------
    ignore_conv_patterns: tuple[str, ...] = ()
    ignore_tool_patterns: tuple[str, ...] = ()
    ignore_role_patterns: tuple[str, ...] = ()
    #: Include* override lists (P10): a row matching ANY Include* pattern
    #: on its field is KEPT even if an Ignore* pattern matches — the
    #: reference checks include lists before ignore lists
    #: (webalizer.c main loop + linklist.c:isinlist() [verify]), making
    #: "ignore everything except X" expressible.
    include_conv_patterns: tuple[str, ...] = ()
    include_tool_patterns: tuple[str, ...] = ()
    include_role_patterns: tuple[str, ...] = ()
    hide_tool_patterns: tuple[str, ...] = ()
    hide_conv_patterns: tuple[str, ...] = ()

    # --- enrichment (dns_resolv.c / geodb.c analogs) ---------------------
    #: Category assigned to tools absent from the lookup table — the
    #: unresolved-DNS / unknown-country analog.
    unresolved_category: str = "Unresolved"

    #: Report-timezone shift in whole hours (the ``GMTTime`` analog,
    #: SURVEY.md §2.2 P6): derived month/date/hour columns shift by this
    #: offset; raw timestamps (and session gaps) are unaffected.
    tz_offset_hours: int = 0

    #: Named extension stages (SURVEY.md §2.10 — the plugin surface the
    #: reference never had): each name must be registered via
    #: ``extensions.register_stage``; the flagship splices them in after
    #: enrichment as ordinary map_batches, and the refmodel applies the
    #: identical functions, so parity tests cover extensions.
    extra_stages: tuple = ()

    # --- outputs ---------------------------------------------------------
    top_n: dict = field(default_factory=lambda: dict(DEFAULT_TOP_N))
    #: Also dump every small sink as a tab-separated ``<name>.tab`` with a
    #: header row (the Dump*/DumpHeader TSV outputs, output.c:
    #: dump_all_sites() … ≈3300–3700 [verify]).
    dump_tsv: bool = False
    #: Also render the four PNG usage graphs (graphs.c analogs: daily /
    #: hourly / yearly bars + category pie) from the finished sinks into
    #: ``out_dir/graphs`` — pure-stdlib encoder, driver-side O(KB).
    emit_graphs: bool = False
    #: Also compose the static HTML report tree (output.c analog:
    #: index.html yearly summary + usage_YYYYMM.html month pages over
    #: the sink tables, PNG graphs embedded). Implies the graphs.
    emit_html: bool = False

    # --- execution knobs (Ray only; refmodel ignores) --------------------
    #: Hash buckets for explicit conv_id partitioning (sessionization unit;
    #: at 10^12 turns size this to total_bytes / target_bucket_bytes).
    num_buckets: int = 64
    parse_batch_size: int = 32768
    #: Enrich actor-pool (min, max); None = auto-size max to the
    #: cluster's CPU count at plan-build time (a fixed cap would leave
    #: cores idle at 4N and silently serialize the stage).
    enrich_concurrency: tuple[int, int] | None = None
    session_shuffle_partitions: int = 0   # 0 = let Ray pick
    #: Salt modulus for skewed-key two-phase aggregation helpers.
    salt_buckets: int = 16
    #: Rows per chunk when range-chunking a giant conversation for
    #: sessionization (SURVEY.md §4.3 item 2).
    giant_conv_chunk: int = 100_000
    #: Pass-2 skew mitigation: a bucket dir bigger than this (compressed
    #: bytes) is processed by ceil(bytes/target) tasks, each owning a
    #: disjoint conv-hash residue — a hot bucket fans out instead of
    #: becoming the straggler that gates the whole pass.
    bucket_split_target_bytes: int = 24 * 2**20

    # --- report cosmetics (webalizer.conf Color* / GroupShading /
    #     GroupHighlight analogs; SURVEY §2.10, output.c/graphs.c) ------
    #: Graph series colors, "#RRGGBB" — ColorHit / ColorFile /
    #: ColorPage / ColorVisit / ColorSite / ColorKbyte analogs
    #: (graphs.c palette; defaults match the reference's libgd colors).
    color_hit: str = "#00805c"
    color_file: str = "#0000ff"
    color_page: str = "#00c0c0"
    color_session: str = "#ffd000"
    color_conv: str = "#ff8000"
    color_value: str = "#ff0000"
    #: GroupShading analog: shade grouped rows in the HTML report.
    group_shading: bool = True
    #: GroupHighlight analog: render grouped rows bold.
    group_highlight: bool = True
    #: GroupShading fill ("#RRGGBB") when group_shading is on.
    group_shade_color: str = "#d0d0e0"

    def graph_palette(self) -> dict:
        """{series: (r, g, b)} for pipelines/graphs.py from the Color*
        knobs; raises on malformed hex (config errors fail loudly)."""
        return {"hits": _rgb(self.color_hit),
                "files": _rgb(self.color_file),
                "pages": _rgb(self.color_page),
                "sess": _rgb(self.color_session),
                "convs": _rgb(self.color_conv),
                "kb": _rgb(self.color_value)}

    def __post_init__(self):
        if self.strict_seq and self.fold_seq:
            raise ValueError("strict_seq and fold_seq are mutually "
                             "exclusive out-of-sequence policies")
        if not 0 <= self.mangle_level <= 4:
            raise ValueError("mangle_level must be in 0..4")
        self.graph_palette()   # validate Color* hex up front
        # same validator as the Color* knobs (ONE hex rule — r3
        # review); normalized to '#RRGGBB' since this one lands
        # verbatim in CSS, where a bare hex would be invalid
        r, g, b = _rgb(self.group_shade_color)
        object.__setattr__(self, "group_shade_color",
                           f"#{r:02x}{g:02x}{b:02x}")  # frozen dataclass


DEFAULT_CONFIG = PipelineConfig()
