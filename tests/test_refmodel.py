"""Unit tests for the executable spec (refmodel) + fixtures.

These pin the SEMANTICS (SURVEY.md §2.9 hard parts): exact-timeout session
boundary, month split, entry/exit attribution, strict-seq drops, count
conservation. The Ray engine is then tested for parity against refmodel.
"""

import numpy as np
import pandas as pd
import pytest

from webalizer_ray import fixtures
from webalizer_ray.config import PipelineConfig
from webalizer_ray.refmodel import run_refmodel

CFG = PipelineConfig()


def mk(rows):
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.to_datetime(df["ts"])
    return df


T = "ACTION=call STATUS=200 KB=1.00 x"


def test_parse_bad_rows():
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 1, "user", "garbage", None, "2024-01-01 00:01:00"),
        ("c1", 2, "user", "ACTION=call KB=1.00 no status", None, "2024-01-01 00:02:00"),
    ])
    out = run_refmodel(df, CFG)
    assert out["metrics"] == {**out["metrics"], "total_rec": 3, "bad": 2,
                              "parsed": 1}
    assert list(out["bad"]["turn_idx"]) == [1, 2]


def test_parse_fields():
    df = mk([
        ("c1", 0, "user", 'ACTION=ask STATUS=404 KB=12.50 QUERY="Foo+Bar baz" tail',
         None, "2024-01-01 00:00:00"),
    ])
    out = run_refmodel(df, CFG)
    t = out["turns"].iloc[0]
    assert t["action"] == "ask" and t["status"] == 404 and t["kb"] == 12.5
    assert t["query"] == "Foo+Bar baz"
    assert list(out["search_terms"]["term"]) == ["foo bar baz"]


def test_session_exact_timeout_boundary():
    # gap == timeout starts a NEW session (>= rule, put_hnode analog)
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 1, "user", T, None, "2024-01-01 00:30:00"),   # gap == 1800
        ("c1", 2, "user", T, None, "2024-01-01 00:59:59"),   # gap 1799
    ])
    out = run_refmodel(df, CFG)
    assert out["metrics"]["sessions"] == 2
    assert list(out["turns"]["session_id"]) == [1, 2, 2]


def test_session_month_boundary_split():
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-31 23:55:00"),
        ("c1", 1, "user", T, None, "2024-02-01 00:05:00"),   # gap 600 < 1800
    ])
    out = run_refmodel(df, CFG)
    assert out["metrics"]["sessions"] == 2
    no_split = run_refmodel(df, PipelineConfig(split_sessions_on_month=False))
    assert no_split["metrics"]["sessions"] == 1


def test_single_turn_conv_counts_one_session():
    df = mk([("c1", 0, "user", T, None, "2024-01-01 00:00:00")])
    out = run_refmodel(df, CFG)
    assert out["metrics"]["sessions"] == 1


def test_entry_exit_attribution():
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", T, "search_v2", "2024-01-01 00:01:00"),
        ("c1", 2, "assistant", T, "browse", "2024-01-01 00:02:00"),
        ("c1", 3, "user", T, None, "2024-01-01 00:03:00"),
    ])
    out = run_refmodel(df, CFG)
    s = out["sessions"].iloc[0]
    assert s["entry_tool"] == "search" and s["exit_tool"] == "browse"
    pt = out["per_tool"].set_index("tool_norm")
    assert pt.loc["search", "entry"] == 1 and pt.loc["search", "exit"] == 0
    assert pt.loc["browse", "exit"] == 1


def test_tool_normalization():
    df = mk([
        ("c1", 0, "assistant", T, "Search_v2", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", T, "search", "2024-01-01 00:01:00"),
    ])
    out = run_refmodel(df, CFG)
    assert list(out["per_tool"]["tool_norm"]) == ["search"]
    assert out["per_tool"]["hits"].iloc[0] == 2


def test_enrich_unresolved_category():
    df = mk([("c1", 0, "assistant", T, "mystery_tool", "2024-01-01 00:00:00")])
    out = run_refmodel(df, CFG, tool_categories={"search": "retrieval"})
    assert list(out["per_category"]["category"]) == ["Unresolved"]


def test_ignore_filter_and_conservation():
    df = mk([
        ("spam-1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 1, "user", "garbage", None, "2024-01-01 00:01:00"),
    ])
    cfg = PipelineConfig(ignore_conv_patterns=(r"^spam-",))
    out = run_refmodel(df, cfg)
    m = out["metrics"]
    assert m["bad"] == 1 and m["ignored"] == 1 and m["parsed"] == 1
    assert m["total_rec"] == m["parsed"] + m["bad"] + m["ignored"]


def test_strict_seq_drops_out_of_order():
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-01 00:02:00"),
        ("c1", 1, "user", T, None, "2024-01-01 00:01:00"),   # older → dropped
        ("c1", 2, "user", T, None, "2024-01-01 00:03:00"),
    ])
    out = run_refmodel(df, PipelineConfig(strict_seq=True))
    assert out["metrics"]["ignored_seq"] == 1
    assert out["metrics"]["parsed"] == 2
    healed = run_refmodel(df, CFG)
    assert healed["metrics"]["parsed"] == 3


def test_include_overrides_ignore():
    """P10: a row matching an Include* pattern is kept even when an
    Ignore* pattern matches it (include checked first, as in the
    reference's main loop)."""
    df = mk([
        ("spam-1", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("spam-keep", 0, "user", T, None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", T, None, "2024-01-01 00:00:00"),
    ])
    cfg = PipelineConfig(ignore_conv_patterns=(r"^spam-",),
                         include_conv_patterns=(r"keep",))
    out = run_refmodel(df, cfg)
    assert out["metrics"]["ignored"] == 1
    assert out["metrics"]["parsed"] == 2
    assert set(out["turns"]["conv_id"]) == {"spam-keep", "c1"}
    # include on one field overrides ignore on ANOTHER field too
    cfg2 = PipelineConfig(ignore_conv_patterns=(r"^spam-",),
                          include_role_patterns=(r"^user$",))
    out2 = run_refmodel(df, cfg2)
    assert out2["metrics"]["ignored"] == 0


def test_fold_seq_restarts_session_on_backwards_jump():
    """W4 fold variant (FoldSeqErr): the out-of-sequence record flushes
    the current period and restarts instead of being dropped."""
    df = mk([
        ("c1", 0, "user", T, None, "2024-01-01 00:02:00"),
        ("c1", 1, "user", T, None, "2024-01-01 00:01:00"),   # backwards
        ("c1", 2, "user", T, None, "2024-01-01 00:03:00"),
    ])
    fold = run_refmodel(df, PipelineConfig(fold_seq=True))
    assert fold["metrics"]["parsed"] == 3        # nothing dropped
    assert fold["metrics"]["sessions"] == 2      # flush + restart
    assert list(fold["turns"]["session_id"]) == [1, 2, 2]
    healed = run_refmodel(df, CFG)
    assert healed["metrics"]["sessions"] == 1
    with pytest.raises(ValueError):
        PipelineConfig(strict_seq=True, fold_seq=True)


def test_mangle_levels_progressive():
    df = mk([
        ("c1", 0, "user", T, "Browse_v12", "2024-01-01 00:00:00"),
        ("c1", 1, "user", T, "CheckoutTool_v2", "2024-01-01 00:01:00"),
    ])
    expect = {0: ["browse_v12", "checkouttool_v2"],
              1: ["browse", "checkouttool"],
              2: ["browse", "checkout"],
              3: ["brow", "chec"],
              4: ["br", "ch"]}
    for lvl, tools in expect.items():
        out = run_refmodel(df, PipelineConfig(mangle_level=lvl))
        assert list(out["turns"]["tool_norm"]) == tools, lvl
    with pytest.raises(ValueError):
        PipelineConfig(mangle_level=5)


def test_top_n_deterministic_tiebreak():
    rows = [(f"c{i}", 0, "user", T, None, "2024-01-01 00:00:00")
            for i in range(5)]
    out = run_refmodel(mk(rows), CFG)
    # all convs have 1 hit → ties broken by key ascending
    assert list(out["top_conv"]["conv_id"]) == sorted(f"c{i}" for i in range(5))


def test_hide_excluded_from_topn_not_totals():
    df = mk([
        ("c1", 0, "assistant", T, "secret_tool", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", T, "search", "2024-01-01 00:01:00"),
    ])
    cfg = PipelineConfig(hide_tool_patterns=(r"^secret",))
    out = run_refmodel(df, cfg)
    assert set(out["per_tool"]["tool_norm"]) == {"secret_tool", "search"}
    assert set(out["top_tool"]["tool_norm"]) == {"search"}


def test_fixture_determinism_and_shape():
    a = fixtures.generate_turns(n_convs=50, seed=7)
    b = fixtures.generate_turns(n_convs=50, seed=7)
    assert a.equals(b)
    assert a.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # per-conv turn_idx contiguous + unique
    df = a.to_pandas().sort_values(["conv_id", "turn_idx"])
    for _, g in df.groupby("conv_id"):
        assert list(g["turn_idx"]) == list(range(len(g)))


def test_fixture_small_refmodel_runs(small_refmodel):
    m = small_refmodel["metrics"]
    assert m["total_rec"] > 20000
    assert m["bad"] > 0
    assert m["sessions"] >= m["convs"]  # every conv has >= 1 session
    assert m["total_rec"] == m["parsed"] + m["bad"] + m["ignored"]
