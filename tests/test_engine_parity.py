"""Ray engine ↔ refmodel parity (the correctness gate, SURVEY.md §5.2).

Runs the full flagship pipeline on the small fixture (1k convs / ~25k
turns, 8 parquet shards) and compares EVERY sink against the pure-pandas
oracle: aggregate-count equality, routed-row equality, and per-turn text
equality under stable (conv_id, turn_idx) ordering (the BASELINE.json
per-row invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from tests.conftest import load_turns
from webalizer_ray.config import DEFAULT_CONFIG
from webalizer_ray.pipelines.flagship import run_flagship

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


@pytest.fixture(scope="module")
def engine_result(ray_session, small_fixture, tmp_path_factory):
    out = tmp_path_factory.mktemp("flagship_out")
    return run_flagship(small_fixture, str(out), DEFAULT_CONFIG)


def assert_frame_match(ours: pd.DataFrame, ref: pd.DataFrame, keys,
                       float_cols=("kb",), name=""):
    """Order-insensitive equality: sort both by keys, compare values."""
    ref = ref.reset_index(drop=True)
    ours = ours.reset_index(drop=True)
    assert len(ours) == len(ref), f"{name}: row count {len(ours)} != {len(ref)}"
    ref = ref.sort_values(list(keys), ignore_index=True, kind="mergesort")
    ours = ours.sort_values(list(keys), ignore_index=True, kind="mergesort")
    for col in ref.columns:
        assert col in ours.columns, f"{name}: missing column {col}"
        r, o = ref[col], ours[col]
        if col in float_cols:
            assert np.allclose(o.astype(float), r.astype(float),
                               rtol=1e-9, atol=1e-6), f"{name}.{col} mismatch"
        elif np.issubdtype(np.asarray(r).dtype, np.datetime64) or \
                str(r.dtype).startswith("datetime"):
            assert (pd.to_datetime(o).values == pd.to_datetime(r).values).all(), \
                f"{name}.{col} mismatch"
        else:
            ro = r.fillna("∅") if r.dtype == object else r
            oo = o.fillna("∅") if o.dtype == object else o
            assert (np.asarray(oo) == np.asarray(ro)).all(), \
                f"{name}.{col} mismatch:\n{ours.head()}\n{ref.head()}"


def test_metrics_conservation(engine_result, small_refmodel):
    m, rm = engine_result["metrics"], small_refmodel["metrics"]
    assert m["total_rec"] == rm["total_rec"]
    assert m["bad"] == rm["bad"]
    assert m["ignored"] == rm["ignored"]
    assert m["parsed"] == rm["parsed"]
    assert m["sessions"] == rm["sessions"]
    assert m["convs"] == rm["convs"]
    assert m["total_rec"] == m["parsed"] + m["bad"] + m["ignored"]


@pytest.mark.parametrize("sink,keys", [
    ("hourly", ["hour"]), ("daily", ["date"]), ("monthly", ["month"]),
    ("per_conv", ["conv_id"]), ("per_tool", ["tool_norm"]),
    ("per_role", ["role"]), ("per_grp", ["grp"]),
    ("per_category", ["category"]), ("status_hist", ["status"]),
    ("status_class_hist", ["status_class"]), ("search_terms", ["term"]),
])
def test_aggregate_sink_parity(engine_result, small_refmodel, sink, keys):
    ref = small_refmodel[sink]
    ours = engine_result["sinks"][sink]
    assert_frame_match(ours, ref, keys, name=sink)


def test_sessions_parity(engine_result, small_refmodel):
    ref = small_refmodel["sessions"][
        ["conv_id", "session_id", "start_ts", "end_ts", "n_turns", "kb",
         "files", "pages", "entry_tool", "exit_tool", "month", "date"]]
    ours = engine_result["sinks"]["sessions"]
    assert_frame_match(ours, ref, ["conv_id", "session_id"], name="sessions")


@pytest.mark.parametrize("sink,keys", [
    ("top_conv", ["conv_id"]), ("top_conv_kb", ["conv_id"]),
    ("top_tool", ["tool_norm"]), ("top_tool_kb", ["tool_norm"]),
    ("top_entry", ["tool_norm"]), ("top_exit", ["tool_norm"]),
    ("top_role", ["role"]), ("top_category", ["category"]),
    ("top_search", ["term"]),
])
def test_topn_parity(engine_result, small_refmodel, sink, keys):
    ref = small_refmodel[sink]
    ours = engine_result["sinks"][sink]
    # top-N is ORDER-SENSITIVE (deterministic tie-break) → compare in order
    assert list(ours[keys[0]]) == list(ref[keys[0]]), f"{sink} order differs"


def test_routed_turns_text_equality(engine_result, small_refmodel):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering.

    The routed row STORE is parsed/route=ok (full text, written by pass
    1); pass 2's turns/route=ok annotates each row with its session id,
    keyed by (conv_id, turn_idx) — join the two and compare to the
    oracle."""
    text = (pads.dataset(f"{engine_result['out_dir']}/parsed/route=ok")
            .to_table(columns=["conv_id", "turn_idx", "text"]).to_pandas())
    sess = (pads.dataset(f"{engine_result['out_dir']}/turns/route=ok")
            .to_table(columns=["conv_id", "turn_idx", "session_id"])
            .to_pandas())
    ours = (text.merge(sess, on=["conv_id", "turn_idx"], how="inner")
            .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    ref = small_refmodel["turns"][
        ["conv_id", "turn_idx", "text", "session_id"]].reset_index(drop=True)
    assert len(ours) == len(ref)
    assert (ours["conv_id"] == ref["conv_id"]).all()
    assert (ours["turn_idx"].to_numpy() == ref["turn_idx"].to_numpy()).all()
    assert (ours["text"] == ref["text"]).all()
    assert (ours["session_id"].to_numpy()
            == ref["session_id"].to_numpy()).all()


#: Variant config exercising the round-2 knobs together: Include*
#: overriding Ignore* (P10), FoldSeqErr fold (W4) over the fixture's
#: ~0.5% out-of-order rows, a coarser mangle level (P13), and a report
#: timezone shift (GMTTime analog, P6) that crosses day boundaries.
VARIANT_CFG = None  # built lazily (frozen dataclass w/ validation)


def _variant_cfg():
    from webalizer_ray.config import PipelineConfig
    return PipelineConfig(
        ignore_conv_patterns=(r"[048]$",),
        include_conv_patterns=(r"8$",),
        ignore_role_patterns=(r"^system$",),
        include_tool_patterns=(r"^mem",),
        fold_seq=True,
        mangle_level=2,
        tz_offset_hours=-5,
    )


@pytest.fixture(scope="module")
def variant_engine(ray_session, small_fixture, tmp_path_factory):
    out = tmp_path_factory.mktemp("flagship_variant")
    return run_flagship(small_fixture, str(out), _variant_cfg())


@pytest.fixture(scope="module")
def variant_refmodel(small_fixture, lookups):
    from webalizer_ray.refmodel import run_refmodel
    tcd, rgd = lookups
    return run_refmodel(load_turns(small_fixture), _variant_cfg(), tcd, rgd)


def test_variant_metrics_and_filters(variant_engine, variant_refmodel):
    m, rm = variant_engine["metrics"], variant_refmodel["metrics"]
    for k in ("total_rec", "bad", "ignored", "parsed", "sessions", "convs"):
        assert m[k] == rm[k], k
    assert m["ignored"] > 0          # the ignore list actually fired
    # include override actually kept rows an ignore pattern matches
    turns = variant_refmodel["turns"]
    assert turns["conv_id"].str.endswith("8").any()
    # rows of an ignored conv survive ONLY via the tool include override
    kept0 = turns[turns["conv_id"].str.endswith(("0", "4"))]
    assert len(kept0) and kept0["tool_norm"].str.startswith("mem").all()


@pytest.mark.parametrize("sink,keys", [
    ("monthly", ["month"]), ("daily", ["date"]), ("per_tool", ["tool_norm"]),
    ("per_category", ["category"]), ("per_role", ["role"]),
])
def test_variant_sink_parity(variant_engine, variant_refmodel, sink, keys):
    assert_frame_match(variant_engine["sinks"][sink], variant_refmodel[sink],
                       keys, name=sink)


def test_variant_sessions_parity(variant_engine, variant_refmodel):
    ref = variant_refmodel["sessions"][
        ["conv_id", "session_id", "start_ts", "end_ts", "n_turns", "kb",
         "files", "pages", "entry_tool", "exit_tool", "month", "date"]]
    assert_frame_match(variant_engine["sinks"]["sessions"], ref,
                       ["conv_id", "session_id"], name="sessions_variant")


def test_topn_without_full_per_conv_load(ray_session, small_fixture, lookups,
                                         small_refmodel, tmp_path_factory):
    """The bench/scale path (load_per_conv=False, load_sessions=False)
    must produce the exact top-N conv tables from the per-bucket top
    partials WITHOUT reading the full per_conv table into the driver."""
    out = tmp_path_factory.mktemp("noload")
    res = run_flagship(small_fixture, str(out), DEFAULT_CONFIG,
                       lookups=lookups, use_actors=False,
                       load_per_conv=False, load_sessions=False)
    assert res["sinks"]["per_conv"].empty
    assert res["sinks"]["sessions"].empty
    for sink in ("top_conv", "top_conv_kb"):
        assert_frame_match(res["sinks"][sink], small_refmodel[sink],
                           ["conv_id"], name=sink)
        assert list(res["sinks"][sink]["conv_id"]) == \
            list(small_refmodel[sink]["conv_id"]), f"{sink} order"
    assert res["metrics"]["convs"] == small_refmodel["metrics"]["convs"]
    assert res["metrics"]["sessions"] == small_refmodel["metrics"]["sessions"]


def test_bad_rows_routed(engine_result, small_refmodel):
    bad_dir = f"{engine_result['out_dir']}/parsed/route=bad"
    ours = (pads.dataset(bad_dir).to_table(columns=TURN_COLS).to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    ref = small_refmodel["bad"][TURN_COLS].reset_index(drop=True)
    assert len(ours) == len(ref)
    for c in ("conv_id", "turn_idx", "text"):
        assert (ours[c] == ref[c]).all(), c


def test_tz_offset_actually_shifts_report(small_fixture, lookups):
    """GMTTime analog: hours rotate by the offset; totals conserve."""
    from dataclasses import replace

    from webalizer_ray.refmodel import run_refmodel
    tcd, rgd = lookups
    turns = load_turns(small_fixture)
    base = run_refmodel(turns, DEFAULT_CONFIG, tcd, rgd)
    shifted = run_refmodel(
        turns, replace(DEFAULT_CONFIG, tz_offset_hours=-5), tcd, rgd)
    b = base["hourly"].set_index("hour")["hits"]
    s = shifted["hourly"].set_index("hour")["hits"]
    assert b.sum() == s.sum()
    rotated = {(h - 5) % 24: v for h, v in b.items()}
    assert {h: v for h, v in s.items()} == rotated
    # the -5 shift pushes post-midnight turns to the previous date
    assert set(shifted["daily"]["date"]) != set(base["daily"]["date"])
