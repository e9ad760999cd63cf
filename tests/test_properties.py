"""Property tests (SURVEY.md §5.2 item 4; hypothesis where it pays).

The invariants that make the distributed design safe at 10^12 turns:
 * giant-conv chunked sessionization ≡ whole-conv sessionization
 * sinks are invariant to the bucket partitioning (any B gives the
   same combined aggregates)
 * salted two-phase aggregation ≡ direct groupby
 * the parse stage routes every row exactly once (count conservation)
 * raw-log serialize→parse is the identity on arbitrary text

All but the salted test run Ray-free: the stage functions are plain
Arrow/pandas transforms, so properties can hammer them cheaply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webalizer_ray.config import DEFAULT_CONFIG, PipelineConfig
from webalizer_ray.pipelines.flagship import process_bucket_frame
from webalizer_ray.sources import rawlog
from webalizer_ray.stages.enrich import enrich_fn
from webalizer_ray.stages.parse import conv_bucket, make_parse_fn
from webalizer_ray.stages.session import (
    chunk_sessionize_frame,
    sessionize_frame,
)

# ---------------------------------------------------------------------------
# chunked sessionization ≡ whole-conv sessionization
# ---------------------------------------------------------------------------

_gap_lists = st.lists(
    st.one_of(st.integers(0, 3700),
              st.sampled_from([0, 1799, 1800, 1801, 40 * 86400])),
    min_size=1, max_size=60)


def _conv_frame(gaps: list[int]) -> pd.DataFrame:
    ts = pd.Timestamp("2024-01-28 23:10:00") + pd.to_timedelta(
        np.cumsum([0] + gaps), unit="s")
    return pd.DataFrame({
        "conv_id": "c0",
        "turn_idx": np.arange(len(ts), dtype=np.int32),
        "ts": ts,
        "month": ts.strftime("%Y-%m"),
    })


@given(gaps=_gap_lists, chunk_rows=st.integers(1, 7))
@settings(max_examples=120, deadline=None)
def test_chunked_equals_whole_sessionization(gaps, chunk_rows):
    """Gap == exactly 1800 s splits; month boundaries split; chunking a
    conversation at ANY granularity must not change session ids."""
    df = _conv_frame(gaps)
    whole = sessionize_frame(df, DEFAULT_CONFIG)
    chunked = chunk_sessionize_frame(df, DEFAULT_CONFIG,
                                     chunk_rows=chunk_rows)
    pd.testing.assert_series_equal(
        whole.sort_values("turn_idx")["session_id"].reset_index(drop=True),
        chunked.sort_values("turn_idx")["session_id"].reset_index(drop=True))


@given(gaps=_gap_lists, nconv=st.integers(1, 5), seed=st.integers(0, 99),
       fold=st.booleans())
@settings(max_examples=80, deadline=None)
def test_sessionize_arrays_equals_frame(gaps, nconv, seed, fold):
    """The Arrow-path array sessionizer must agree with the pandas one
    on session ids for every (conv, turn), incl. fold_seq mode."""
    from webalizer_ray.config import PipelineConfig
    from webalizer_ray.stages.session import sessionize_arrays

    rng = np.random.default_rng(seed)
    frames = []
    for c in range(nconv):
        f = _conv_frame(gaps)
        f["conv_id"] = f"c{c}"
        # shuffle ts a bit across convs so codes orderings differ
        f["ts"] = f["ts"] + pd.Timedelta(seconds=int(rng.integers(0, 3600)))
        f["month"] = f["ts"].dt.strftime("%Y-%m")
        frames.append(f)
    df = pd.concat(frames, ignore_index=True)
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    cfg = PipelineConfig(fold_seq=fold)

    want = sessionize_frame(df, cfg).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)

    codes, u = pd.factorize(df["conv_id"], sort=False)
    mcodes, _ = pd.factorize(df["month"], sort=False)
    ts_us = df["ts"].astype("int64").to_numpy() // 1000  # ns → µs
    order, sid, seq = sessionize_arrays(
        codes, df["turn_idx"].to_numpy(), ts_us, mcodes, cfg)
    got = df.iloc[order].assign(session_id=sid).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    assert (got["session_id"].to_numpy()
            == want["session_id"].to_numpy()).all()


@given(gaps=_gap_lists)
@settings(max_examples=60, deadline=None)
def test_exact_timeout_gap_starts_new_session(gaps):
    df = _conv_frame(gaps)
    out = sessionize_frame(df, DEFAULT_CONFIG).sort_values("turn_idx")
    gap_s = out["ts"].diff().dt.total_seconds().to_numpy()[1:]
    month_change = (out["month"].to_numpy()[1:]
                    != out["month"].to_numpy()[:-1])
    expect_new = (gap_s >= 1800) | month_change
    got_new = np.diff(out["session_id"].to_numpy()) > 0
    assert (expect_new == got_new).all()


# ---------------------------------------------------------------------------
# bucket-partitioning invariance of the combined sinks (Ray-free)
# ---------------------------------------------------------------------------

def _parsed_frame(seed: int, lookups) -> pd.DataFrame:
    from webalizer_ray import fixtures
    tbl = fixtures.generate_turns(n_convs=40, seed=seed)
    parsed = make_parse_fn(DEFAULT_CONFIG, 16)(tbl)
    enriched = enrich_fn(*lookups, "Unresolved")(parsed)
    df = enriched.to_pandas()
    return df[df["route"] == "ok"]


@pytest.mark.parametrize("seed", [7, 99])
@pytest.mark.parametrize("num_buckets", [1, 5])
def test_sinks_invariant_to_bucketing(seed, num_buckets, lookups):
    """Identical combined small-sink aggregates for ANY bucket count —
    the property that lets B scale with the cluster, not the data."""
    ok = _parsed_frame(seed, lookups)
    b = conv_bucket(ok["conv_id"].to_numpy(), num_buckets)
    longs = [process_bucket_frame(ok[b == i].copy())["long"]
             for i in range(num_buckets) if (b == i).any()]
    comb = (pd.concat(longs, ignore_index=True)
            [lambda d: d["sink"] != "monthly_tools"]
            .groupby(["sink", "key"], sort=True)
            .agg(hits=("hits", "sum"), files=("files", "sum"),
                 pages=("pages", "sum"),
                 kb=("kb", lambda s: round(s.sum(), 6))).reset_index())
    ref = (process_bucket_frame(ok.copy())["long"]
           [lambda d: d["sink"] != "monthly_tools"]
           .groupby(["sink", "key"], sort=True)
           .agg(hits=("hits", "sum"), files=("files", "sum"),
                pages=("pages", "sum"),
                kb=("kb", lambda s: round(s.sum(), 6))).reset_index())
    pd.testing.assert_frame_equal(comb, ref)


# ---------------------------------------------------------------------------
# salted two-phase ≡ direct groupby (the one Ray-backed property)
# ---------------------------------------------------------------------------

def test_salted_equals_direct_groupby_on_skew(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from webalizer_ray.stages.aggregate import salted_two_phase

    rng = np.random.default_rng(3)
    n = 20_000
    # 80% of rows on ONE hot key — the skew the salt exists for
    keys = np.where(rng.random(n) < 0.8, "hot",
                    rng.integers(0, 50, n).astype(str))
    vals = rng.random(n).round(3)
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})) \
        .repartition(8)
    salted = salted_two_phase(ds, "k", "v", salt_buckets=16,
                              alias="total").to_pandas() \
        .sort_values("k", ignore_index=True)
    direct = ds.groupby("k").aggregate(Sum("v", alias_name="total")) \
        .to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_series_equal(salted["k"], direct["k"])
    np.testing.assert_allclose(salted["total"], direct["total"], rtol=1e-9)


# ---------------------------------------------------------------------------
# parse-stage route conservation (Ray-free, hypothesis over nasty text)
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.builds(lambda s, q: f"ACTION=ask STATUS=200 KB=1.25{s}{q}",
                  st.sampled_from(["", ' QUERY="x y"', ' QUERY=""']),
                  st.text(alphabet="abc \"[]=", max_size=10)),
    ), min_size=1, max_size=80)


@given(texts=_texts)
@settings(max_examples=80, deadline=None)
def test_parse_routes_every_row_exactly_once(texts):
    n = len(texts)
    tbl = pa.table({
        "conv_id": pa.array([f"c{i % 5}" for i in range(n)]),
        "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * n,
                       pa.timestamp("us")),
    })
    out = make_parse_fn(DEFAULT_CONFIG, 8)(tbl)
    assert out.num_rows == n
    routes = out["route"].to_pylist()
    assert set(routes) <= {"ok", "bad", "ignored"}
    # ok rows have parsed fields; bad rows have null status
    st_col = out["status"].to_pylist()
    for r, s in zip(routes, st_col):
        assert (s is not None) == (r != "bad")


# ---------------------------------------------------------------------------
# raw-log round-trip identity on arbitrary text (Ray-free)
# ---------------------------------------------------------------------------

_safe_text = st.text(max_size=60).filter(lambda s: "\x00" not in s)


@given(texts=st.lists(_safe_text, min_size=1, max_size=20),
       fmt=st.sampled_from(["clf", "squid", "w3c"]))
@settings(max_examples=80, deadline=None)
def test_rawlog_roundtrip_identity(texts, fmt):
    n = len(texts)
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([None if i % 3 else "search" for i in range(n)],
                         pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01 12:00:00")
                        + pd.Timedelta(microseconds=int(i) * 1001)
                        for i in range(n)], pa.timestamp("us")),
    })
    fmt_fn = rawlog.FORMATS[fmt][0]
    lines = fmt_fn(tbl)
    # newlines inside text are escaped: a serialized line never contains \n
    assert not any("\n" in ln for ln in lines.to_pylist())
    if fmt == "w3c":
        parse = rawlog._make_parse_w3c(rawlog.W3C_FIELDS)
    else:
        parse = rawlog.FORMATS[fmt][1]
    back = parse(pa.chunked_array([lines]) if isinstance(lines, pa.Array)
                 else lines)
    assert back["route"].to_pylist() == ["ok"] * n
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert back[col].to_pylist() == tbl[col].to_pylist(), col
    assert back["ts"].to_pylist() == tbl["ts"].to_pylist()


def test_hot_bucket_subsplit_parity(ray_session, small_fixture, lookups,
                                    tmp_path):
    """Forcing every bucket through the k-way conv-hash sub-split (the
    hot-bucket fan-out path) yields identical sinks, sessions, and
    routed rows to whole-bucket processing."""
    from webalizer_ray.pipelines.flagship import run_flagship

    base = PipelineConfig(num_buckets=8, enrich_concurrency=(1, 2))
    # force k > 1 everywhere AND session-splitting of any conv over 40
    # rows (the giant-conv cross-task decomposition path)
    split = PipelineConfig(num_buckets=8, enrich_concurrency=(1, 2),
                           bucket_split_target_bytes=16_384,
                           giant_conv_chunk=40)
    a = run_flagship(small_fixture, str(tmp_path / "a"), base,
                     lookups=lookups, use_actors=False)
    b = run_flagship(small_fixture, str(tmp_path / "b"), split,
                     lookups=lookups, use_actors=False)
    for sink in ("monthly", "daily", "hourly", "per_tool", "per_category",
                 "status_hist", "search_terms", "top_conv", "top_tool"):
        pd.testing.assert_frame_equal(
            a["sinks"][sink].reset_index(drop=True),
            b["sinks"][sink].reset_index(drop=True), check_dtype=False)
    sa = a["sinks"]["sessions"].sort_values(["conv_id", "session_id"],
                                            ignore_index=True)
    sb = b["sinks"]["sessions"].sort_values(["conv_id", "session_id"],
                                            ignore_index=True)
    pd.testing.assert_frame_equal(sa, sb, check_dtype=False)
    assert a["metrics"] == b["metrics"]
