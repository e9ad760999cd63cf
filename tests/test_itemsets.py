"""A-Priori frequent triples (stages/itemsets.py): planted frequent
sets, threshold boundary, downward-closure prune parity vs brute
force, and layout invariance."""

from itertools import combinations

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.stages.itemsets import frequent_triples


def _rows(baskets: dict) -> pd.DataFrame:
    recs = [(b, i) for b, items in baskets.items() for i in items]
    return pd.DataFrame(recs, columns=["basket", "item"])


def _brute(baskets: dict, num: int, den: int) -> pd.DataFrame:
    n = len(baskets)
    counts = {}
    for items in baskets.values():
        for tri in combinations(sorted(set(items)), 3):
            counts[tri] = counts.get(tri, 0) + 1
    keep = sorted(t for t, c in counts.items() if den * c >= num * n)
    out = pd.DataFrame(
        [(a, b, c, counts[(a, b, c)]) for a, b, c in keep],
        columns=["item_a", "item_b", "item_c", "support"])
    return out.astype({"support": np.int64})


def _run(baskets: dict, num=1, den=2, blocks=3) -> pd.DataFrame:
    ds = rd.from_pandas(_rows(baskets)).repartition(blocks)
    out = frequent_triples(ds, basket_col="basket", item_col="item",
                           num=num, den=den)
    return out.astype({"support": np.int64})


def test_planted_frequent_triple(ray_session):
    baskets = {1: ["a", "b", "c"], 2: ["a", "b", "c", "d"],
               3: ["a", "b", "c"], 4: ["x", "y", "z"]}
    out = _run(baskets)                 # threshold: 2 of 4 baskets
    assert len(out) == 1
    assert tuple(out.iloc[0]) == ("a", "b", "c", 3)


def test_threshold_boundary_inclusive(ray_session):
    # support exactly num/den of baskets must be KEPT (>=)
    baskets = {1: ["a", "b", "c"], 2: ["a", "b", "c"],
               3: ["p", "q"], 4: ["r", "s"]}
    out = _run(baskets, num=1, den=2)   # 2*2 >= 1*4 → kept
    assert len(out) == 1 and out.iloc[0]["support"] == 2


def test_duplicates_in_basket_count_once(ray_session):
    baskets = {1: ["a", "a", "b", "c", "c"], 2: ["a", "b", "c"]}
    out = _run(baskets, num=1, den=1)   # 100% threshold
    assert tuple(out.iloc[0]) == ("a", "b", "c", 2)


def test_no_frequent_pairs_empty(ray_session):
    baskets = {i: [f"u{i}", f"v{i}", f"w{i}"] for i in range(6)}
    out = _run(baskets)
    assert out.empty
    assert list(out.columns) == ["item_a", "item_b", "item_c",
                                 "support"]


def test_parity_vs_brute_force_random(ray_session):
    rng = np.random.RandomState(5)
    vocab = [f"t{i}" for i in range(12)]
    baskets = {b: [vocab[i] for i in
                   rng.choice(12, size=rng.randint(2, 9),
                              replace=False)]
               for b in range(40)}
    got = _run(baskets, num=1, den=4)   # 25%
    want = _brute(baskets, 1, 4)
    pd.testing.assert_frame_equal(got, want)


def test_layout_invariance(ray_session):
    rng = np.random.RandomState(9)
    vocab = [f"t{i}" for i in range(8)]
    baskets = {b: [vocab[i] for i in
                   rng.choice(8, size=rng.randint(3, 7),
                              replace=False)]
               for b in range(30)}
    a = _run(baskets, blocks=1)
    b = _run(baskets, blocks=7)
    pd.testing.assert_frame_equal(a, b)
