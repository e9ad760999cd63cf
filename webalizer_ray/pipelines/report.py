"""Corpus data card — the training-data analog of the reference's
monthly report.

The Webalizer's entire purpose is one artifact: a periodic report
rolled up from many aggregates (SURVEY.md §2.1 S6–S9). For an LLM
corpus the equivalent artifact is the *data card* (Gebru et al. 2021,
"Datasheets for Datasets"; Mitchell et al. 2019 model cards): source
mix, size/token statistics, language distribution, quality and
repetition profiles, duplication rate, PII exposure. Every section
here is one of the registry's oracle-checked queries — the card adds
NO new computation, only composition — so its numbers inherit the
driver's correctness gate.

Scale: each section is an independent streaming pipeline over the
corpus; the card itself is a few KB of aggregates. Sections run
sequentially in one Ray session (each is internally parallel; at 100
TB you want the cluster saturated by one section at a time, not five
all-to-alls interleaved).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import pandas as pd

#: section name -> (query name, post-processor to a JSON-able value)
_SECTIONS: list[tuple[str, str, Callable[[pd.DataFrame], object]]] = [
    ("source_mix", "corpus_source_mix",
     lambda df: df.to_dict("records")),
    ("token_band", "docs_token_band",
     lambda df: {"docs_in_p10_p90_band": int(len(df))}),
    ("language_distribution", "lang_id_docs",
     lambda df: df.groupby("pred_lang").size().astype(int).to_dict()),
    ("quality", "quality_docs",
     lambda df: {
         "mean_quality_score": round(float(df["quality_score"].mean()), 6),
         "low_quality_docs": int((df["quality_score"] < 0.5).sum())}),
    ("repetition", "repetition_docs",
     lambda df: {
         "mean_dup_word_frac": round(float(df["dup_word_frac"].mean()), 6),
         "high_repetition_docs": int((df["dup_word_frac"] > 0.5).sum())}),
    ("exact_duplication", "exact_dedup_docs",
     lambda df: {"unique_docs": int(len(df))}),
    ("pii", "pii_redacted_docs",
     lambda df: {
         c: int(df[c].sum())
         for c in df.columns if c.startswith("n_")}),
    ("vocabulary", "vocab_top_words",
     lambda df: df.to_dict("records")),
]


def build_corpus_card(sf_dir: str) -> dict:
    """Run every section's registered query over ``sf_dir`` and return
    the card as a dict (JSON-able)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    n_docs = None
    card: dict = {"input": sf_dir, "sections": {}}
    for section, qname, post in _SECTIONS:
        fn = REGISTRY[qname][0]
        df = fn(sf_dir)
        card["sections"][section] = post(df)
        if section == "exact_duplication":
            # duplication rate needs the raw doc count too
            import pyarrow.parquet as pq
            n_docs = pq.ParquetFile(
                os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
            uniq = card["sections"][section]["unique_docs"]
            card["sections"][section]["total_docs"] = int(n_docs)
            card["sections"][section]["duplicate_rate"] = round(
                1.0 - uniq / n_docs, 6)
    return card


def card_to_markdown(card: dict) -> str:
    lines = [f"# Corpus data card — `{card['input']}`", ""]
    for name, body in card["sections"].items():
        lines.append(f"## {name}")
        if isinstance(body, list):
            if body:
                cols = list(body[0].keys())
                lines.append("| " + " | ".join(cols) + " |")
                lines.append("|" + "---|" * len(cols))
                for row in body:
                    lines.append("| " + " | ".join(str(row[c])
                                                   for c in cols) + " |")
        else:
            for k, v in body.items():
                lines.append(f"- **{k}**: {v}")
        lines.append("")
    return "\n".join(lines)


def write_corpus_card(sf_dir: str, out_dir: str) -> dict:
    """Build the card and publish card.json + card.md atomically."""
    card = build_corpus_card(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name, payload in [("card.json", json.dumps(card, indent=2,
                                                   sort_keys=True)),
                          ("card.md", card_to_markdown(card))]:
        tmp = os.path.join(out_dir, f".{name}.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
    return card
