"""Text-analysis stages for training-data pipelines.

Beyond the reference's operator set (webalizer analyzes log lines, not
documents), these are the document-level operators a 100 TB training-data
pipeline needs: token counting, quality scoring, language ID, and document
fingerprinting. All are stateless vectorized ``map_batches`` transforms
(regexes precompiled at module import; Arrow/pandas kernels only — no
Python-per-row loops). The search-string extractor (webalizer.c:
srch_string() ≈3600–3700 [verify]) is the closest reference ancestor: a
per-record string analysis feeding an aggregate sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RX = r"\S+"
#: BPE-ish subword pieces: runs of letters, digits, or single punctuation.
BPE_RX = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"
PUNCT_RX = r"[^\w\s]"

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic (public common-word lists; no model files needed).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "ich", "mit"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "por"],
}


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """tokens (whitespace) + bpe_pieces (BPE-ish regex) per row, zero-copy."""
    text = batch[text_col]
    batch = batch.append_column(
        "n_tokens", pc.cast(pc.count_substring_regex(text, TOKEN_RX),
                            pa.int64()))
    batch = batch.append_column(
        "n_bpe_pieces", pc.cast(pc.count_substring_regex(text, BPE_RX),
                                pa.int64()))
    return batch


#: One alternation so a single RE2 pass counts every stopword hit; distinct
#: \b-anchored words can never match at the same start offset, so the
#: alternation count equals the sum of per-word counts.
STOPWORD_EN_RX = r"\b(?:" + "|".join(LANG_STOPWORDS["en"]) + r")\b"


def round_half_away(x, decimals: int) -> np.ndarray:
    """SQL-style ROUND (half away from zero) — numpy's round is half-to-
    even, and the difference is NOT rare here: ratios over token counts
    are often dyadic (2/64 = 0.03125), landing exactly on the half."""
    p = 10.0 ** decimals
    y = np.asarray(x, dtype=np.float64) * p
    return np.copysign(np.floor(np.abs(y) + 0.5), y) / p


def add_quality_score(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    The classic cheap quality heuristics (C4/Gopher-style rules): docs that
    are too short, all punctuation, or stopword-free are likely junk. All
    counts come from Arrow's RE2 kernels (ASCII ``\\w``/``\\s``/``\\b``
    classes — a deliberate, documented choice: byte-class filters are the
    norm for cheap at-scale quality scoring, and DuckDB's RE2
    ``regexp_extract_all`` reproduces the exact same counts for the
    correctness oracle).
    """
    text = pa.array(df[text_col].fillna(""), type=pa.large_string())

    def count(rx: str) -> np.ndarray:
        return pc.cast(pc.count_substring_regex(text, rx), pa.int64()) \
            .to_numpy(zero_copy_only=False)

    n_chars = pc.cast(pc.utf8_length(text), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_tokens = count(TOKEN_RX)
    n_punct = count(PUNCT_RX)
    n_stop = count(STOPWORD_EN_RX)
    out = df.copy()
    out["n_chars"] = n_chars
    out["n_tokens"] = n_tokens
    tok = np.maximum(n_tokens, 1)
    out["mean_token_len"] = round_half_away(
        (n_chars - np.maximum(n_tokens - 1, 0)) / tok, 4)
    out["punct_ratio"] = round_half_away(n_punct / np.maximum(n_chars, 1), 4)
    out["stopword_ratio"] = round_half_away(n_stop / tok, 4)
    out["quality_score"] = round_half_away(
        0.4 * (np.minimum(n_tokens, 200) / 200)
        + 0.3 * (1.0 - np.minimum(out["punct_ratio"], 1.0))
        + 0.3 * np.minimum(out["stopword_ratio"], 1.0), 4)
    return out


def add_lang_id(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword-hit language heuristic → pred_lang + lang_conf columns.

    Vectorized: one regex count per (language, stopword); argmax over the
    per-language hit sums. Ties / zero hits → 'und' (undetermined).
    """
    text = df[text_col].fillna("").str.lower()
    scores = np.zeros((len(df), len(LANG_STOPWORDS)), dtype=np.float64)
    for j, (lang, words) in enumerate(LANG_STOPWORDS.items()):
        rx = r"\b(?:" + "|".join(words) + r")\b"
        scores[:, j] = text.str.count(rx).to_numpy()
    total = scores.sum(axis=1)
    best = scores.argmax(axis=1)
    langs = np.array(list(LANG_STOPWORDS), dtype=object)
    out = df.copy()
    pred = langs[best]
    pred[total == 0] = "und"
    out["pred_lang"] = pred
    with np.errstate(invalid="ignore", divide="ignore"):
        conf = np.where(total > 0, scores.max(axis=1) / np.maximum(total, 1), 0.0)
    # half-away rounding to match SQL ROUND (np.round is banker's —
    # 1/32 = 0.03125 would round to 0.0312 vs the oracle's 0.0313)
    out["lang_conf"] = round_half_away(conf, 4)
    return out


#: PII redaction passes, applied IN ORDER (order matters: IP before the
#: digit-run patterns so dotted quads aren't half-eaten; SSN before PHONE
#: since a dashed SSN is a prefix-shaped phone candidate). RE2-only
#: syntax (no lookaround/backrefs) so Arrow's kernels and DuckDB's
#: regexp_replace(…, 'g') — both RE2 — produce byte-identical output,
#: which is what makes the redaction oracle-checkable.
PII_PASSES = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\+?\b(?:\d{1,3}[- ])?\d{3}[- ]\d{3,4}[- ]\d{4}\b"),
    ("CC", r"\b\d{13,16}\b"),
]


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Sequential vectorized PII scrubbing → red_text + per-type counts.

    Each pass is one zero-copy Arrow RE2 ``replace_substring_regex`` over
    the whole batch (emails → ``<EMAIL>``, dotted quads → ``<IP>``, …);
    counts are placeholder occurrences in the final text, so a string
    consumed by an earlier pass (an IP inside a URL already redacted)
    is never double-counted. The closest reference ancestor is the
    search-string extractor's per-record scan; the operator itself is
    the standard pre-training scrub step (cf. C4/RefinedWeb pipelines).
    """
    red = pc.cast(batch[text_col], pa.large_string())
    for tag, rx in PII_PASSES:
        red = pc.replace_substring_regex(red, rx, f"<{tag}>")
    batch = batch.append_column("red_text", red)
    total = None
    for tag, _ in PII_PASSES:
        n = pc.cast(pc.count_substring(red, f"<{tag}>"), pa.int64())
        batch = batch.append_column(f"n_{tag.lower()}", n)
        total = n if total is None else pc.add(total, n)
    return batch.append_column("n_pii", total)


def add_fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Deterministic 64-bit document fingerprint over normalized text.

    Normalization (lowercase, collapse whitespace, strip) then the
    SplitMix64 position-keyed tabulation hash from
    :mod:`webalizer_ray.stages.strhash` (r4; previously SipHash) —
    stable across processes/runs/nodes (the requirement for
    distributed dedup joins) AND replicable in DuckDB SQL, so
    fingerprint queries carry a bit-exact independent oracle.
    """
    from webalizer_ray.stages import strhash
    norm = (df[text_col].fillna("").str.lower()
            .str.replace(r"\s+", " ", regex=True).str.strip())
    out = df.copy()
    out["fingerprint"] = strhash.string_hashes(norm.tolist())
    return out


def validate_rules(ds, rules: dict) -> "pd.DataFrame":
    """Schema/data-contract validation in ONE streaming pass (the
    expectations check a production feed runs before trusting a drop):
    per-batch violation-count partials per rule — nulls, range bounds,
    regex misses — sum exactly; a `unique` rule runs the two-phase
    distinct count and compares to the row count. Returns one row per
    rule: (column, rule, violations).

    rules = {col: {"not_null": True, "min": x, "max": y,
                   "regex": pattern, "unique": True}}
    """
    import pandas as pd

    import ray.data as rd  # noqa: F401

    from webalizer_ray.stages.aggregate import distinct_count, reduce_sink

    checks = []           # (col, rule, batch_fn)
    for col, spec in rules.items():
        if spec.get("not_null"):
            checks.append((col, "not_null",
                           lambda t, c=col: pc.sum(pc.cast(
                               pc.is_null(t[c]), pa.int64())).as_py() or 0))
        if "min" in spec:
            checks.append((col, "min",
                           lambda t, c=col, v=spec["min"]: pc.sum(pc.cast(
                               pc.less(t[c], pa.scalar(v)),
                               pa.int64())).as_py() or 0))
        if "max" in spec:
            checks.append((col, "max",
                           lambda t, c=col, v=spec["max"]: pc.sum(pc.cast(
                               pc.greater(t[c], pa.scalar(v)),
                               pa.int64())).as_py() or 0))
        if "regex" in spec:
            checks.append((col, "regex",
                           lambda t, c=col, v=spec["regex"]: pc.sum(
                               pc.cast(pc.invert(pc.match_substring_regex(
                                   pc.fill_null(t[c], ""), v)),
                                   pa.int64())).as_py() or 0))

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": pa.array([c for c, _, _ in checks]),
            "rule": pa.array([r for _, r, _ in checks]),
            "violations": pa.array([np.int64(fn(t))
                                    for _, _, fn in checks])})

    rows = []
    if checks:
        from webalizer_ray.stages.aggregate import sink_pandas
        agg = sink_pandas(ds.map_batches(partial, batch_format="pyarrow"),
                          ["column", "rule"],
                          {"violations": ("violations", "sum")})
        if agg.empty:   # empty input: zero violations for every rule
            agg = pd.DataFrame({
                "column": [c for c, _, _ in checks],
                "rule": [r for _, r, _ in checks],
                "violations": np.zeros(len(checks), dtype=np.int64)})
        rows.append(agg)
    for col, spec in rules.items():
        if spec.get("unique"):
            tagged = ds.map_batches(
                lambda df, c=col: df[[c]].assign(_g=np.int32(0)),
                batch_format="pandas")
            ndf = distinct_count(tagged, ["_g"], col, "n").to_pandas()
            nd = int(ndf["n"].iloc[0]) if len(ndf) and "n" in ndf else 0
            total = ds.count()
            rows.append(pd.DataFrame({
                "column": [col], "rule": ["unique"],
                "violations": np.array([total - nd], dtype=np.int64)}))
    out = pd.concat(rows, ignore_index=True)
    out["violations"] = out["violations"].astype(np.int64)
    return out.sort_values(["column", "rule"], ignore_index=True)


def add_compression_ratio(df: pd.DataFrame,
                          text_col: str = "text") -> pd.DataFrame:
    """zlib-compressibility quality signal (the Gopher-family filter:
    highly repetitive / templated text compresses far below natural
    prose). Compression is inherently per-payload work — the same
    exemption as image/audio decode — but the payloads stay inside the
    batch and the loop is C-speed zlib per row, not Python parsing.
    Ratio = deflated bytes / raw bytes (level 6), 1-char floor guard.
    """
    import zlib

    raw = df[text_col].fillna("")
    ratios = np.fromiter(
        ((len(zlib.compress(b, 6)) / len(b)) if (
            b := t.encode("utf-8", "surrogatepass")) else 1.0
         for t in raw),
        dtype=np.float64, count=len(raw))
    out = df.copy()
    out["compression_ratio"] = round_half_away(ratios, 6)
    return out


#: HTML boilerplate passes, applied IN ORDER: block elements whose
#: CONTENT must go (script/style), then comments, then remaining tags,
#: then entity decode (&amp; LAST so "&amp;lt;" correctly yields the
#: literal text "&lt;"), then whitespace collapse. RE2-safe patterns
#: ((?s) inline flag, non-greedy, no backrefs) so the identical chain
#: runs in Arrow and in DuckDB.
HTML_STRIP_PASSES = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
]

HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&amp;", "&")]


def strip_html(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized HTML/boilerplate extraction → ``clean_text`` +
    ``clean_len`` (the main-content step of a web-corpus pipeline;
    Arrow RE2 kernels, zero Python per row)."""
    t = pc.fill_null(batch[text_col], "")
    for pat, repl in HTML_STRIP_PASSES:
        t = pc.replace_substring_regex(t, pat, repl)
    for ent, ch in HTML_ENTITIES:
        t = pc.replace_substring(t, ent, ch)
    t = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(t, r"\s+", " "))
    batch = batch.append_column("clean_text", t)
    return batch.append_column(
        "clean_len", pc.cast(pc.utf8_length(t), pa.int64()))
