"""BPE tokenizer training over a distributed corpus.

Public construction: Sennrich, Haddow & Birch (ACL 2016), "Neural
Machine Translation of Rare Words with Subword Units" — byte-pair
encoding learns the top-K most frequent adjacent symbol merges.

How it scales (and how real trainers — subword-nmt, sentencepiece —
scale): BPE statistics depend ONLY on the word-frequency table, not on
the corpus layout. The distributed part is therefore a single
word-count reduce (only (word, n) partials shuffle; the vocabulary is
orders of magnitude smaller than the corpus even at 100 TB). The merge
loop then runs on that vocabulary-sized table — iterating K times over
V rows, never over the corpus — and the learned merge list (K rows)
broadcasts for the distributed ENCODE pass, a stateless vectorized
``map_batches`` over documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def word_counts(ds: rd.Dataset, text_col: str = "text") -> pd.DataFrame:
    """Distributed (word, n) reduce — only count partials shuffle."""
    from webalizer_ray.stages.aggregate import reduce_sink

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.split().explode().dropna()
        c = words.value_counts()
        return pd.DataFrame({"word": c.index.to_numpy(),
                             "n": c.to_numpy(np.int64)})

    return reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                       ["word"], {"n": ("n", "sum")}).to_pandas()


def learn_bpe(vocab: pd.DataFrame, n_merges: int,
              end_of_word: str = "</w>") -> list[tuple[str, str]]:
    """Learn the top-``n_merges`` BPE merges from a (word, n) table.

    Deterministic: the most frequent adjacent symbol pair wins each
    round, ties broken lexicographically. Runs on the vocabulary-sized
    table only (V rows × K rounds — never touches the corpus)."""
    # symbol sequences per distinct word, weighted by count
    seqs = [tuple(w) + (end_of_word,) for w in vocab["word"].astype(str)]
    weights = vocab["n"].to_numpy(np.int64)
    merges: list[tuple[str, str]] = []

    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, n in zip(seqs, weights):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pairs[p] = pairs.get(p, 0) + int(n)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_seqs = []
        for seq in seqs:
            if len(seq) < 2:
                new_seqs.append(seq)
                continue
            out = []
            i = 0
            while i < len(seq):
                if (i < len(seq) - 1 and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                end_of_word: str = "</w>") -> list[str]:
    """Apply learned merges to one word (lowest-rank merge first —
    the standard BPE encode order)."""
    seq = list(word) + [end_of_word]
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode_counts(ds: rd.Dataset, merges: list[tuple[str, str]],
                      text_col: str = "text") -> pd.DataFrame:
    """Distributed encode pass: piece-frequency table of the corpus
    under the learned merges. The merge list (K rows) is broadcast via
    closure; each batch encodes its DISTINCT words once (batch-local
    memoization) and scales counts by word frequency."""
    from webalizer_ray.stages.aggregate import reduce_sink

    ranks = {m: i for i, m in enumerate(merges)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.split().explode().dropna()
        wc = words.value_counts()
        rows: dict[str, int] = {}
        for w, n in wc.items():
            for piece in encode_word(str(w), ranks):
                rows[piece] = rows.get(piece, 0) + int(n)
        return pd.DataFrame({"piece": list(rows.keys()),
                             "n": np.array(list(rows.values()), np.int64)})

    return reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                       ["piece"], {"n": ("n", "sum")}).to_pandas()
