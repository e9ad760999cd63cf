"""BPE training: the ACL'16 worked example, encode round-trip, piece
conservation, and distributed-vs-local word-count equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from webalizer_ray.stages.bpe import (
    bpe_encode_counts, encode_word, learn_bpe, word_counts)

SF = "/root/testdata/sf0.001"


def test_paper_worked_example():
    """Sennrich et al. §3.2 example: {'low':5,'lower':2,'newest':6,
    'widest':3} — first merges are (e,s), (es,t), (est,</w>), (l,o)."""
    vocab = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                          "n": np.array([5, 2, 6, 3], np.int64)})
    merges = learn_bpe(vocab, n_merges=4)
    assert merges[0] == ("e", "s")          # 6+3 = 9
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", "</w>")     # 9
    assert merges[3] == ("l", "o")          # 5+2 = 7


def test_encode_round_trip_and_priority():
    vocab = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                          "n": np.array([5, 2, 6, 3], np.int64)})
    merges = learn_bpe(vocab, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest"]:
        pieces = encode_word(w, ranks)
        assert "".join(pieces).replace("</w>", "") == w
    # 'newest' must collapse fully after enough merges
    assert len(encode_word("newest", ranks)) <= 3


def test_distributed_word_counts_match_pandas(ray_session):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = word_counts(rd.from_pandas(docs).repartition(5)) \
        .sort_values("word", ignore_index=True)
    want = docs["text"].str.split().explode().dropna().value_counts()
    want = pd.DataFrame({"word": want.index.to_numpy(),
                         "n": want.to_numpy(np.int64)}) \
        .sort_values("word", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_like=True,
                                  check_dtype=False)


def test_piece_count_conservation(ray_session):
    """Under any merge list, total piece length over the corpus equals
    total char count + one </w> marker per word."""
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"]).head(100)
    ds = rd.from_pandas(docs)
    vocab = word_counts(ds)
    merges = learn_bpe(vocab, n_merges=20)
    pieces = bpe_encode_counts(ds, merges)
    # chars contributed by each piece = len(piece without the marker)
    stripped = pieces["piece"].str.replace("</w>", "", regex=False)
    char_mass = int((stripped.str.len() * pieces["n"]).sum())
    marker_mass = int(pieces.loc[
        pieces["piece"].str.endswith("</w>"), "n"].sum())
    words = docs["text"].str.split().explode().dropna()
    assert char_mass == int(words.str.len().sum())
    assert marker_mass == len(words)


def test_query_surface(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["bpe_merges"][0](SF)
    assert list(out.columns) == ["rank", "left", "right"]
    assert len(out) == 50
    assert out["rank"].tolist() == list(range(50))
