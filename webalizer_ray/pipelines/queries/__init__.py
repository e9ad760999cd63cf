"""Driver-contract queries: Ray pipelines + matching DuckDB oracle SQL.

One entry per implemented operator family from SURVEY.md S2 plus the
LLM-data-pipeline operators, expressed over the driver's testdata views
(events / documents / embeddings / lineitem ...).  Each Ray callable
takes ``sf_dir`` and returns a pandas DataFrame whose COLUMN NAMES AND
TYPES exactly match the oracle SQL (the driver hashes values after
sorting columns by name).

Conventions for hash-stable floats: every float aggregate is rounded
(ROUND(x, 2) for sums, 6 for similarities) on BOTH sides; int
aggregates are CAST(. AS BIGINT) in SQL because DuckDB's SUM(int) is
HUGEINT.

The registry is split across chunk modules (``q01_*.py`` ...) sharing
``_shared.REGISTRY``.  This ``__init__`` is lazy (PEP 562): importing
the package costs nothing; the first attribute access or REGISTRY read
imports every chunk.  Ray workers that deserialize a single query
function import only that function's chunk (plus its backward deps).
"""

from __future__ import annotations

import importlib

from webalizer_ray.pipelines.queries._shared import REGISTRY  # noqa: F401

_CHUNKS = ['q01_core', 'q02_relational_media', 'q03_tpch_ml', 'q04_stats_tests', 'q05_text_distrib', 'q06_causal_effects', 'q07_fits_audits', 'q08_rank_dominance', 'q09_nonparam_tests', 'q10_session_bias', 'q11_forecast_supply', 'q12_survival_colloc', 'q13_decision_resample', 'q14_randomness_kernels', 'q15_markov_aggregation', 'q16_forecast_verify', 'q17_agreement_pricing', 'q18_relational_tail',
           'q19_sessions_windows']

_loaded = False
_name2mod: dict = {}


def _load() -> None:
    """Import every chunk module, then build the name→module map.

    Two passes (r3 review): the vars() scan runs only AFTER all chunk
    imports complete, so a module that happened to be mid-import when
    the load fired is never snapshotted half-initialized.  ``_loaded``
    commits only on success — a failed chunk import propagates and the
    next access retries instead of leaving a silently partial registry.
    """
    global _loaded
    if _loaded:
        return
    mods = [importlib.import_module(
        f"webalizer_ray.pipelines.queries.{c}") for c in _CHUNKS]
    for mod in mods:
        for k, v in vars(mod).items():
            if not k.startswith("__"):
                _name2mod.setdefault(k, mod)
    _loaded = True


REGISTRY._loader = _load


def __getattr__(name: str):
    _load()
    mod = _name2mod.get(name)
    if mod is not None:
        return getattr(mod, name)
    raise AttributeError(
        f"module 'webalizer_ray.pipelines.queries' has no attribute "
        f"{name!r}")


#: SURVEY.md S2-mapped core query names, ordered so that any prefix
#: sample of the registry covers the brief's operators first (VERDICT
#: r2 item 6).  Grouped in SURVEY S2 order: A1-A3 time buckets, K/A
#: top-N + distinct, P9/P10 classify+filter, ST4/W1-W4 sessions,
#: flagship month report, P7/P13/P14 normalizers, J2/J3/J6 joins,
#: A11 salted partials, K4 split, then the LLM-ops families (dedup,
#: ANN/graph, text stats, BPE/packing, multimodal, curation).
CORE_QUERY_NAMES: list = [
    # A1-A3 + A7 + A10: time buckets, response classes, distinct
    "hourly_events", "daily_events", "monthly_events",
    "event_class_hist", "distinct_users",
    # K1/K3 top-N
    "top_event_types", "top_revenue_parts", "top_users_by_value",
    # P10 ignore/include filters
    "filtered_event_counts", "filtered_event_counts_with_include",
    # ST4/W1/W2 sessions + entry/exit, W4 out-of-seq disciplines
    "user_sessions", "session_entry_exit",
    "strict_seq_drops", "fold_seq_sessions",
    # W3 windows (tumbling / rolling / sliding / hopping)
    "tumbling_6h_events", "rolling_7d_events", "sliding_1h_events",
    "hopping_window_stats", "late_event_rate",
    # S6 flagship month report
    "flagship_monthly",
    # P1/P7/P13/P14 tokenize + normalize + mangle + search extract
    "docs_first_word", "docs_with_term", "token_count_docs",
    "mangled_tool_hits", "props_json_k_sum",
    # J2/J3/J6 joins (TLD suffix, semi-join, GroupDomains)
    "lang_family_docs", "conv_domain_groups",
    # A11 salted two-phase partials, K4 deterministic split
    "salted_returnflag_qty", "train_val_split_counts",
    # sequence / funnel analogs of the report tables
    "event_transitions", "user_retention_cohorts",
    "hourly_anomaly_scores", "session_funnel_conversion",
    "events_cube",
    # D1-D4 dedup: exact, incremental, MinHash/SimHash, cosine
    "exact_dedup_docs", "incremental_dedup_counts",
    "minhash_dup_pairs", "minhash_dup_clusters", "simhash_dup_pairs",
    "ngram_jaccard_pairs", "cosine_dup_pairs", "cosine_dup_pairs_lsh",
    "cosine_dup_clusters", "semantic_dedup_embeddings",
    "decontaminated_train_docs", "shared_span_pairs",
    # ANN / kNN graph
    "ann_topk", "ann_topk_indexed", "ann_topk_lsh",
    "knn_graph", "knn_graph_lsh",
    # text analysis: lang-ID, quality, fingerprint, PII, HTML, repetition
    "lang_id_docs", "quality_docs", "fingerprint_docs",
    "pii_redacted_docs", "html_stripped_docs", "repetition_docs",
    # tokenizer training / packing / shuffling
    "bpe_merges", "packed_docs", "shuffled_doc_order",
    # multimodal plumbing
    "media_image_dhash_pairs", "media_image_features",
    "media_audio_features",
    # curation / sketches / classifier
    "curation_funnel", "leakage_safe_split_counts",
    "quality_classifier_docs", "distinct_users_hll",
    "heavy_hitter_users", "value_quantiles_by_type",
    "urgent_lineitem_qty",
    # relational anchor
    "tpch_q1_pricing_summary",
]


def core_queries():
    """The SURVEY-S2-mapped subset of the registry, in S2 order."""
    _load()
    missing = [n for n in CORE_QUERY_NAMES if n not in REGISTRY]
    assert not missing, f"core queries missing from REGISTRY: {missing}"
    return {n: REGISTRY[n][0] for n in CORE_QUERY_NAMES}


def all_queries():
    """Every registered query, core (SURVEY S2) names first."""
    _load()
    out = {n: REGISTRY[n][0] for n in CORE_QUERY_NAMES if n in REGISTRY}
    for name, (fn, _) in REGISTRY.items():
        if name not in out:
            out[name] = fn
    return out


def all_oracle_sql():
    """DuckDB oracle SQL for every SQL-expressible query, core first."""
    _load()
    # two oracles read deterministic /tmp fixtures by absolute path --
    # make sure they exist even if the caller runs SQL before the
    # corresponding Ray query (cheap, idempotent, atomic publish)
    __getattr__("_evolved_dir")()
    __getattr__("_skewed_dir")()
    sqls = {name: sql for name, (_, sql) in REGISTRY.items()
            if sql is not None}
    out = {n: sqls[n] for n in CORE_QUERY_NAMES if n in sqls}
    for name, sql in sqls.items():
        out.setdefault(name, sql)
    return out
