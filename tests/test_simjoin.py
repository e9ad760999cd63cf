"""Prefix-filtered set-similarity join: brute-force parity, hot-qgram
skew behavior, short-string edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def brute_force(keys: list[str], t: float, q: int = 3) -> pd.DataFrame:
    def grams(s):
        return {s[i:i + q] for i in range(len(s) - q + 1)}

    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            ga, gb = grams(a), grams(b)
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= t:
                x, y = (a, b) if a < b else (b, a)
                rows.append((x, y, j))
    return (pd.DataFrame(rows, columns=["a", "b", "jacc"])
            .sort_values(["a", "b"], ignore_index=True))


def run_join(keys: list[str], t: float) -> pd.DataFrame:
    from webalizer_ray.stages.simjoin import set_similarity_join_prefix

    ds = rd.from_pandas(pd.DataFrame({"key": keys}))
    return set_similarity_join_prefix(ds, threshold=t)


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8])
def test_matches_brute_force(ray_session, t):
    """Recall AND precision 1.0 vs all-pairs on real part names."""
    names = rd.read_parquet(
        "/root/testdata/sf0.001/part.parquet",
        columns=["p_name"]).to_pandas()["p_name"].unique().tolist()
    ours = run_join(names, t)
    want = brute_force(names, t)
    assert len(ours) == len(want)
    pd.testing.assert_series_equal(ours["a"], want["a"])
    pd.testing.assert_series_equal(ours["b"], want["b"])
    assert np.allclose(ours["jacc"], want["jacc"])


def test_hot_qgram_does_not_bucket(ray_session):
    """Strings sharing ONE ubiquitous trigram but nothing else must not
    pair — and the hot trigram must not open a candidate bucket (its df
    puts it at the END of every prefix ordering). Checked behaviorally:
    result is exact and empty despite the 100%-df trigram."""
    keys = [f"{i:03d}@xyz" for i in range(50)]  # all share '@xy','xyz'
    out = run_join(keys, t=0.6)
    want = brute_force(keys, t=0.6)
    assert len(want) == 0  # the shared hot trigrams alone don't clear t
    assert len(out) == 0


def test_short_strings_excluded(ray_session):
    """Strings shorter than q have no q-grams: never pair, never crash
    (matches the oracle's empty generate_series)."""
    out = run_join(["ab", "a", "abcdef", "abcdeg"], t=0.3)
    assert set(out["a"]) | set(out["b"]) <= {"abcdef", "abcdeg"}
    assert len(out) == 1


def test_identical_sets_jaccard_one(ray_session):
    """Anagram-style equal trigram sets reach jacc == 1.0."""
    out = run_join(["abcabc", "cabcab"], t=0.9)
    # trigram sets: {abc,bca,cab} both -> jaccard 1.0
    assert len(out) == 1 and out["jacc"].iloc[0] == 1.0


from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.text(alphabet="abcdef ", min_size=0, max_size=12)


@settings(max_examples=5, deadline=None)
@given(st.lists(_word, min_size=2, max_size=25, unique=True),
       st.sampled_from([0.4, 0.7]))
def test_simjoin_fuzz_matches_brute_force(ray_session, keys, t):
    """Random short strings (incl. empty/whitespace/low-entropy):
    prefix-filtered join equals all-pairs brute force exactly."""
    ours = run_join(keys, t)
    want = brute_force(keys, t)
    assert len(ours) == len(want)
    if len(want):
        pd.testing.assert_series_equal(ours["a"], want["a"])
        pd.testing.assert_series_equal(ours["b"], want["b"])
        assert np.allclose(ours["jacc"], want["jacc"])


def test_all_strings_shorter_than_q(ray_session):
    out = run_join(["", "a", "bb"], t=0.5)
    assert len(out) == 0 and list(out.columns) == ["a", "b", "jacc"]


def test_edit_distance_join_planted(ray_session):
    """PassJoin recall is exact: distributed pairs == brute force on a
    planted typo fixture (substitution, deletion, transposition, and
    far-apart negatives)."""
    import itertools

    import ray.data as rd

    from webalizer_ray.stages.simjoin import _lev_banded, edit_distance_join

    keys = ["widget bolt", "widgat bolt",       # 1 substitution
            "sprocket nut", "sprocket nt",      # 1 deletion
            "anchor plate", "anchor platte",    # 1 insertion
            "copper gear", "copper gera",       # transposition = ed 2
            "flange", "totally different name"]
    ds = rd.from_pandas(pd.DataFrame({"key": keys}))
    got = edit_distance_join(ds, k=2)
    got_set = set(zip(got["a"], got["b"]))
    brute = {(a, b) if a < b else (b, a)
             for a, b in itertools.combinations(keys, 2)
             if _lev_banded(a, b, 2) <= 2}
    assert got_set == brute
    assert ("widgat bolt", "widget bolt") in got_set
    assert ("copper gear", "copper gera") in got_set
    assert not any("flange" in p for pair in got_set for p in pair)


def test_jaro_winkler_reference_values():
    """Classic published values + edge conventions (DuckDB-matching:
    empty side scores 0.0 even vs empty)."""
    from webalizer_ray.stages.simjoin import jaro_winkler as jw

    assert abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15
    assert abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15
    assert jw("same", "same") == 1.0
    assert jw("", "") == 0.0 and jw("a", "") == 0.0
    # jaro <= 0.7 -> NO prefix boost despite 4 shared leading chars
    assert abs(jw("abcdxxxx", "abcdyyyy") - 2 / 3) < 1e-15


def test_jaro_winkler_matches_duckdb_fuzz():
    import random

    import duckdb

    from webalizer_ray.stages.simjoin import jaro_winkler as jw

    con = duckdb.connect()
    rng = random.Random(3)
    alpha = "abcde fg"
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert abs(d - jw(a, b)) < 1e-15, (a, b)
