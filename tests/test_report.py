"""Corpus data card: section completeness, consistency with the
underlying oracle-checked queries, idempotent publish."""

from __future__ import annotations

import json
import os

import pandas as pd

from webalizer_ray.pipelines.report import (
    build_corpus_card, card_to_markdown, write_corpus_card)

SF = "/root/testdata/sf0.001"

EXPECTED_SECTIONS = {"source_mix", "token_band", "language_distribution",
                     "quality", "repetition", "exact_duplication", "pii",
                     "vocabulary"}


def test_card_sections_and_consistency(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    card = build_corpus_card(SF)
    assert set(card["sections"].keys()) == EXPECTED_SECTIONS
    dup = card["sections"]["exact_duplication"]
    assert dup["total_docs"] == 500
    assert 0.0 <= dup["duplicate_rate"] <= 1.0
    assert dup["unique_docs"] == len(REGISTRY["exact_dedup_docs"][0](SF))
    lang = card["sections"]["language_distribution"]
    assert sum(lang.values()) == dup["total_docs"]
    mix = pd.DataFrame(card["sections"]["source_mix"])
    assert abs(mix["token_share"].sum() - 1.0) < 1e-3
    assert mix["docs"].sum() == dup["total_docs"]


def test_card_write_idempotent_and_valid_json(ray_session, tmp_path):
    out = str(tmp_path / "card")
    c1 = write_corpus_card(SF, out)
    c2 = write_corpus_card(SF, out)          # republish over itself
    assert c1 == c2
    with open(os.path.join(out, "card.json")) as f:
        loaded = json.load(f)
    assert loaded["sections"].keys() == c1["sections"].keys()
    md = open(os.path.join(out, "card.md")).read()
    for s in EXPECTED_SECTIONS:
        assert f"## {s}" in md


def test_markdown_renders_lists_and_dicts():
    card = {"input": "x", "sections": {
        "tbl": [{"a": 1, "b": 2}], "kv": {"k": 3}}}
    md = card_to_markdown(card)
    assert "| a | b |" in md and "| 1 | 2 |" in md
    assert "- **k**: 3" in md
