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


def add_quality_score(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    The classic cheap quality heuristics (C4/Gopher-style rules re-expressed
    as vectorized pandas): docs that are too short, all punctuation, or
    stopword-free are likely junk.
    """
    text = df[text_col].fillna("")
    n_chars = text.str.len().astype(np.int64)
    n_tokens = text.str.count(TOKEN_RX).astype(np.int64)
    n_punct = text.str.count(PUNCT_RX).astype(np.int64)
    n_stop = sum(text.str.count(rf"\b{w}\b") for w in LANG_STOPWORDS["en"])
    out = df.copy()
    out["n_chars"] = n_chars
    out["n_tokens"] = n_tokens
    tok = n_tokens.clip(lower=1)
    out["mean_token_len"] = ((n_chars - (n_tokens - 1).clip(lower=0)) / tok) \
        .round(4)
    out["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).round(4)
    out["stopword_ratio"] = (n_stop / tok).round(4)
    out["quality_score"] = (
        0.4 * (n_tokens.clip(upper=200) / 200)
        + 0.3 * (1.0 - out["punct_ratio"].clip(upper=1.0))
        + 0.3 * out["stopword_ratio"].clip(upper=1.0)
    ).round(4)
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
    out["lang_conf"] = np.round(conf, 4)
    return out


def add_fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Deterministic 64-bit document fingerprint over normalized text.

    Normalization (lowercase, collapse whitespace) then SipHash via
    pandas.util.hash_array — stable across processes/runs, so fingerprints
    computed on different nodes agree (the requirement for distributed
    dedup joins).
    """
    norm = (df[text_col].fillna("").str.lower()
            .str.replace(r"\s+", " ", regex=True).str.strip())
    out = df.copy()
    out["fingerprint"] = pd.util.hash_array(norm.to_numpy(dtype=object)) \
        .astype(np.uint64)
    return out
