"""Distributed logistic-regression classifier (model-based quality filter).

The fastText/CCNet-style *model-based* document filter every large
training-data pipeline runs after the cheap heuristics: fit a small
linear model on surface features, score every document, keep the
high-scoring tail. (Public construction: Joulin et al. 2016 fastText;
CCNet / GPT-3 data-quality classifiers.) The reference engine has no
ancestor for this — it belongs to the training-data extension family.

Scale shape:
- Features are projected ONCE into a (d+1)-float-column dataset and
  materialized — the text column never re-parses per iteration, and the
  cached feature table is ~d×8 bytes/doc (tiny next to the corpus).
- Each training iteration is one streaming pass: every block emits a
  single PARTIAL row (Hessian d² + gradient d + count floats); the
  driver sums B partial rows and takes one Newton/IRLS step. Weights
  are closure-captured (d floats — nothing to broadcast).
- Full-batch IRLS with a fixed iteration count and no sampling →
  deterministic, and partials sum to exactly the single-machine
  Hessian/gradient (verified bit-level in tests on a single block).
- Scoring is an ordinary stateless ``map_batches`` (one matmul/batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

FEATURE_COLS = ["f_bias", "f_len", "f_punct", "f_stop_en", "f_stop_de",
                "f_stop_fr", "f_stop_es", "f_wordlen"]


def doc_feature_frame(df: pd.DataFrame, text_col: str = "text",
                      label: str | None = None) -> pd.DataFrame:
    """Surface-feature projection for documents (reuses the C4/Gopher
    heuristics from textstats.add_quality_score, un-rounded)."""
    from webalizer_ray.stages.textstats import (
        LANG_STOPWORDS, PUNCT_RX, TOKEN_RX)
    import pyarrow as pa
    import pyarrow.compute as pc

    text = pa.array(df[text_col].fillna(""), type=pa.large_string())

    def count(rx: str) -> np.ndarray:
        return pc.cast(pc.count_substring_regex(text, rx), pa.int64()) \
            .to_numpy(zero_copy_only=False)

    n_chars = pc.cast(pc.utf8_length(text), pa.int64()) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_tok = count(TOKEN_RX).astype(np.float64)
    tok = np.maximum(n_tok, 1.0)
    out = pd.DataFrame({
        "f_bias": np.ones(len(df)),
        "f_len": np.minimum(n_tok, 200.0) / 200.0,
        "f_punct": count(PUNCT_RX) / np.maximum(n_chars, 1.0),
        "f_wordlen": (n_chars - np.maximum(n_tok - 1.0, 0.0)) / tok / 10.0,
    })
    # per-language stopword-hit ratios — the discriminative signal the
    # lang-ID heuristic uses, one RE2 alternation pass per language
    for lang, words in LANG_STOPWORDS.items():
        rx = r"\b(?:" + "|".join(words) + r")\b"
        out[f"f_stop_{lang}"] = count(rx) / tok
    out = out[FEATURE_COLS]
    if "doc_id" in df.columns:
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
    if label is not None:
        out["y"] = (df[label] == "en").to_numpy(np.float64) \
            if df[label].dtype == object else df[label].to_numpy(np.float64)
    return out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable both tails
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def train_logreg(feats: rd.Dataset, n_iter: int = 10,
                 l2: float = 1e-6) -> np.ndarray:
    """Fit w by Newton/IRLS over a materialized feature dataset with
    columns FEATURE_COLS + ``y``. Returns the weight vector.

    One streaming pass per iteration; each block emits ONE partial row
    holding its Hessian contribution X^T·diag(p(1−p))·X (d² floats),
    gradient contribution X^T(y−p) (d floats) and row count — the
    driver sums B rows and solves one d×d system. Newton steps make
    ~10 passes enough where plain GD needs hundreds on imbalanced
    targets."""
    feats = feats.materialize()
    d = len(FEATURE_COLS)
    w = np.zeros(d)

    acols = [f"a{i}" for i in range(d * d)]
    bcols = [f"b{i}" for i in range(d)]

    for _ in range(n_iter):
        wk = w.copy()  # capture by value, not the loop variable

        def hess_partial(df: pd.DataFrame) -> pd.DataFrame:
            X = df[FEATURE_COLS].to_numpy(np.float64)
            y = df["y"].to_numpy(np.float64)
            p = _sigmoid(X @ wk)
            A = (X * (p * (1.0 - p))[:, None]).T @ X
            b = X.T @ (y - p)
            row = {c: [A.ravel()[i]] for i, c in enumerate(acols)}
            row.update({c: [b[i]] for i, c in enumerate(bcols)})
            row["n"] = [np.int64(len(df))]
            return pd.DataFrame(row)

        parts = feats.map_batches(hess_partial,
                                  batch_format="pandas").to_pandas()
        n = float(parts["n"].sum())
        A = parts[acols].to_numpy(np.float64).sum(axis=0).reshape(d, d) \
            / n + l2 * np.eye(d)
        b = parts[bcols].to_numpy(np.float64).sum(axis=0) / n - l2 * w
        w = w + np.linalg.solve(A, b)
    return w


def numpy_logreg(X: np.ndarray, y: np.ndarray, n_iter: int = 10,
                 l2: float = 1e-6) -> np.ndarray:
    """Single-machine IRLS reference (same updates as train_logreg)."""
    d = X.shape[1]
    n = float(len(y))
    w = np.zeros(d)
    for _ in range(n_iter):
        p = _sigmoid(X @ w)
        A = (X * (p * (1.0 - p))[:, None]).T @ X / n + l2 * np.eye(d)
        b = X.T @ (y - p) / n - l2 * w
        w = w + np.linalg.solve(A, b)
    return w


def score_logreg(ds: rd.Dataset, w: np.ndarray,
                 feature_fn=doc_feature_frame) -> rd.Dataset:
    """Stateless scoring pass: adds ``score`` (sigmoid) and ``pred``."""
    wk = np.asarray(w, np.float64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        f = feature_fn(df)
        s = _sigmoid(f[FEATURE_COLS].to_numpy(np.float64) @ wk)
        out = pd.DataFrame({"score": s, "pred": (s >= 0.5).astype(np.int64)})
        if "doc_id" in f.columns:
            out.insert(0, "doc_id", f["doc_id"].to_numpy())
        return out

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# Model evaluation: deterministic k-fold cross-validation + calibration.
# The eval half every model-based filter needs before its threshold is
# trusted: out-of-fold metrics (no leakage — each doc is scored by a
# model that never saw it) and a reliability table (is score=0.8 right
# 80% of the time?).
# ---------------------------------------------------------------------------

def fold_of(ids: np.ndarray, k: int) -> np.ndarray:
    """Deterministic fold assignment (Knuth multiplicative hash —
    reproducible across runs, engines and cluster sizes; same family
    as the shuffle/sampling keys)."""
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) >> np.uint64(7)
    return (h % np.uint64(k)).astype(np.int64)


def kfold_eval(feats: rd.Dataset, id_col: str = "doc_id", k: int = 5,
               n_iter: int = 10, l2: float = 1e-6) -> pd.DataFrame:
    """Out-of-fold evaluation: for each fold f, train on the other
    k−1 folds (the same one-partial-row-per-block IRLS) and score
    fold f; per-fold accuracy and Brier score reduce as scalar
    partials. Cost = k × n_iter streaming passes over the materialized
    feature table (features project once). Returns one row per fold
    (fold, n_test, accuracy, brier)."""
    feats = feats.materialize()
    rows = []
    for f in range(k):
        def drop_fold(df: pd.DataFrame, _f=f) -> pd.DataFrame:
            return df[fold_of(df[id_col].to_numpy(np.int64), k) != _f]

        def keep_fold(df: pd.DataFrame, _f=f) -> pd.DataFrame:
            return df[fold_of(df[id_col].to_numpy(np.int64), k) == _f]

        w = train_logreg(
            feats.map_batches(drop_fold, batch_format="pandas"),
            n_iter=n_iter, l2=l2)

        def metrics(df: pd.DataFrame) -> pd.DataFrame:
            X = df[FEATURE_COLS].to_numpy(np.float64)
            y = df["y"].to_numpy(np.float64)
            s = _sigmoid(X @ w)
            return pd.DataFrame({
                "n": [np.int64(len(df))],
                "correct": [np.int64(((s >= 0.5) == (y >= 0.5)).sum())],
                "sq": [float(((s - y) ** 2).sum())]})

        m = feats.map_batches(keep_fold, batch_format="pandas") \
            .map_batches(metrics, batch_format="pandas").to_pandas()
        n = int(m["n"].sum())
        rows.append({
            "fold": np.int64(f), "n_test": np.int64(n),
            "accuracy": round(float(m["correct"].sum()) / max(n, 1), 6),
            "brier": round(float(m["sq"].sum()) / max(n, 1), 6)})
    return pd.DataFrame(rows)


def calibration_table(scored: rd.Dataset, n_bins: int = 10,
                      score_col: str = "score",
                      y_col: str = "y") -> pd.DataFrame:
    """Reliability table + ECE: scores bin into fixed-width buckets;
    each block emits (bin, n, Σscore, Σy) partials, so only
    O(bins × blocks) rows shuffle. Returns per-bin rows with
    mean_score / frac_pos / ece_term (|gap|·n/N)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        b = np.minimum((s * n_bins).astype(np.int64), n_bins - 1)
        out = pd.DataFrame({"bin": b, "n": np.int64(1), "s": s, "y": y})
        return out.groupby("bin", as_index=False).sum()

    from webalizer_ray.stages.aggregate import reduce_sink
    agg = reduce_sink(scored.map_batches(partial, batch_format="pandas"),
                      ["bin"], {"n": ("n", "sum"), "s": ("s", "sum"),
                                "y": ("y", "sum")}).to_pandas() \
        .sort_values("bin", ignore_index=True)
    total = float(agg["n"].sum())
    agg["mean_score"] = (agg["s"] / agg["n"]).round(6)
    agg["frac_pos"] = (agg["y"] / agg["n"]).round(6)
    agg["ece_term"] = ((agg["mean_score"] - agg["frac_pos"]).abs()
                       * agg["n"] / total).round(6)
    agg["bin"] = agg["bin"].astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg[["bin", "n", "mean_score", "frac_pos", "ece_term"]]
