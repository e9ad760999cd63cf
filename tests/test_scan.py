"""Distributed prefix-scan primitive (stages/scan.py) unit tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.stages import scan


@pytest.fixture
def rd_mod(ray_session):
    import ray.data as rd
    return rd


def test_range_prefix_sum_matches_pandas(rd_mod):
    """Exclusive running sum over shuffled input == pandas cumsum on
    the sorted frame, across bucket boundaries and with ragged bucket
    sizes (keys drawn non-uniformly so buckets are skewed)."""
    rng = np.random.default_rng(3)
    keys = rng.choice(np.arange(1000), size=400, replace=False)
    vals = rng.integers(1, 50, size=400)
    df = pd.DataFrame({"k": keys, "v": vals})
    out = scan.range_prefix_sum(rd_mod.from_pandas(df).repartition(7),
                                "k", "v", "cum", bucket_width=37) \
        .to_pandas().sort_values("k", ignore_index=True)
    want = df.sort_values("k", ignore_index=True)
    want["cum"] = want["v"].cumsum() - want["v"]
    pd.testing.assert_frame_equal(out[["k", "v", "cum"]], want)


def test_range_prefix_count_is_rank(rd_mod):
    df = pd.DataFrame({"k": [30, 10, 20, 40, 0]})
    out = scan.range_prefix_sum(rd_mod.from_pandas(df), "k", None,
                                "rank", bucket_width=16) \
        .to_pandas().sort_values("k", ignore_index=True)
    assert out["rank"].tolist() == [0, 1, 2, 3, 4]


def test_pack_bins_cut_points(rd_mod):
    """Budget 10: docs of 4+4+4 tokens — the third doc STARTS in bin 0
    (running-total rule: exclusive cumsum 8 < 10) even though it
    overflows; the fourth doc (cumsum 12) opens bin 1."""
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "n_tokens": [4, 4, 4, 4]})
    out = scan.pack_bins(rd_mod.from_pandas(df), "doc_id", "n_tokens",
                         budget=10, bucket_width=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["bin_id"].tolist() == [0, 0, 0, 1]


def test_shuffle_rank_is_seeded_permutation(rd_mod):
    """Ranks are a permutation of 0..n-1; deterministic under re-run
    and under a different bucket count (cluster-size independence —
    the dataloader reproducibility property); seed changes the order."""
    df = pd.DataFrame({"doc_id": np.arange(257, dtype=np.int64)})
    a = scan.shuffle_rank(rd_mod.from_pandas(df), "doc_id", seed=0) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert sorted(a["shuffle_rank"]) == list(range(257))
    assert a["shuffle_rank"].tolist() != list(range(257))  # actually shuffled
    b = scan.shuffle_rank(rd_mod.from_pandas(df).repartition(5),
                          "doc_id", seed=0, num_buckets=17) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    c = scan.shuffle_rank(rd_mod.from_pandas(df), "doc_id", seed=99) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert c["shuffle_rank"].tolist() != a["shuffle_rank"].tolist()


def test_global_rank_matches_argsort(ray_session):
    """global_rank over adversarial data: heavy ties (including ties
    straddling would-be bucket boundaries), skewed sample, tiny
    buckets — must equal the lexicographic argsort rank exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.scan import global_rank

    rng = np.random.default_rng(5)
    vals = np.concatenate([
        np.full(200, 1.5),                 # giant tie block
        rng.integers(0, 10, 300).astype(np.float64),  # few distincts
        rng.normal(1000, 1, 50),           # far-out cluster
    ])
    ids = rng.permutation(len(vals)).astype(np.int64)
    df = pd.DataFrame({"v": vals, "i": ids})
    out = global_rank(rd.from_pandas(df).repartition(9), "v", "i",
                      num_buckets=16, sample_rows=64).to_pandas()
    out = out.sort_values(["v", "i"], ignore_index=True)
    assert (out["rnk"].to_numpy() == np.arange(1, len(df) + 1)).all()
    # every id exactly once
    assert sorted(out["i"]) == sorted(ids)


def test_global_rank_degenerate_inputs(ray_session):
    """Single row and all-equal values rank correctly (ties by id)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.stages.scan import global_rank

    one = global_rank(rd.from_pandas(
        pd.DataFrame({"v": [7.0], "i": [1]})), "v", "i").to_pandas()
    assert list(one["rnk"]) == [1]
    eq = global_rank(rd.from_pandas(pd.DataFrame(
        {"v": [3.0] * 50, "i": np.arange(50)})), "v", "i").to_pandas()
    eq = eq.sort_values("i", ignore_index=True)
    assert (eq["rnk"].to_numpy() == np.arange(1, 51)).all()
