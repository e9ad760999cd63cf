"""PNG usage graphs (S10): container round-trip, bar geometry, pie
shares, sink-directory driver, and the flagship config knob."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webalizer_ray.pipelines import graphs as G


def _daily(days, hits, **extra):
    df = pd.DataFrame({"date": [f"2025-01-{d:02d}" for d in days],
                       "hits": hits})
    for k, v in extra.items():
        df[k] = v
    return df


def test_png_roundtrip_exact():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert (G.decode_png(G.encode_png(img)) == img).all()


def test_png_rejects_bad_input():
    with pytest.raises(ValueError):
        G.encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        G.decode_png(b"nope")


def test_daily_bar_heights_proportional():
    # two days, 100 vs 50 hits: the taller bar's green column count
    # must be ~2x the shorter one's (same band, shared max)
    img = G.daily_usage_graph(_daily([3, 10], [100, 50]))
    green = (img == np.array(G.C_HITS, np.uint8)).all(axis=2)
    cols = green.any(axis=0)
    runs = np.flatnonzero(np.diff(np.concatenate(
        [[0], cols.view(np.int8), [0]])))
    assert len(runs) == 4, "expected exactly two green bars"
    h1 = green[:, runs[0]:runs[1]].sum(axis=0).max()
    h2 = green[:, runs[2]:runs[3]].sum(axis=0).max()
    assert abs(h1 / h2 - 2.0) < 0.1


def test_daily_graph_deterministic_and_empty_safe():
    d = _daily([1, 2], [5, 9], kb=[1.0, 2.0])
    assert G.encode_png(G.daily_usage_graph(d)) \
        == G.encode_png(G.daily_usage_graph(d))
    empty = G.daily_usage_graph(_daily([], []))
    assert empty.shape == (256, 512, 3)     # frame only, no bars
    assert not (empty == np.array(G.C_HITS, np.uint8)).all(axis=2).any()


def test_hourly_graph_slots():
    img = G.hourly_usage_graph(pd.DataFrame(
        {"hour": [0, 23], "hits": [10, 10]}))
    green = (img == np.array(G.C_HITS, np.uint8)).all(axis=2)
    xs = np.flatnonzero(green.any(axis=0))
    # bars at both extremes of the 24-slot axis
    assert xs.min() < 60 and xs.max() > 450


def test_pie_shares_match_fractions():
    img = G.category_pie(pd.DataFrame(
        {"category": ["a", "b", "c", "d"], "hits": [40, 30, 20, 10]}))
    counts = [(img == np.array(c, np.uint8)).all(axis=2).sum()
              for c in G.PIE_COLORS[:4]]
    tot = sum(counts)
    for got, want in zip(counts, [0.4, 0.3, 0.2, 0.1]):
        assert abs(got / tot - want) < 0.02


def test_pie_other_bucket_and_empty():
    df = pd.DataFrame({"category": [f"c{i}" for i in range(15)],
                       "hits": [100 - i for i in range(15)]})
    img = G.category_pie(df)                 # 9 + other = 10 slices
    ncolors = {tuple(c) for c in
               img.reshape(-1, 3)[::7].tolist()} - {G.BG, G.PLOT_BG,
                                                    G.BORDER, G.SHADOW}
    assert len(ncolors) == 10
    assert G.category_pie(pd.DataFrame({"category": [], "hits": []})) \
        .shape == (300, 512, 3)


def test_write_flagship_graphs_from_sinks(tmp_path):
    out = str(tmp_path)
    os.makedirs(os.path.join(out, "sinks"))
    pq.write_table(pa.Table.from_pandas(_daily(
        [1, 2, 31], [7, 3, 5], files=[3, 1, 2], pages=[1, 1, 1],
        kb=[1.5, 0.5, 1.0], convs=[2, 1, 1], sessions=[2, 1, 2])),
        os.path.join(out, "sinks", "daily.parquet"))
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(
        {"category": ["x", "y"], "hits": [8, 2], "kb": [1.0, 0.2],
         "convs": [1, 1]})),
        os.path.join(out, "sinks", "per_category.parquet"))
    written = G.write_flagship_graphs(out)
    assert set(written) == {"daily_usage.png", "ctry_usage.png"}
    for p in written.values():
        img = G.decode_png(open(p, "rb").read())
        assert img.ndim == 3
    # idempotent re-render
    assert G.write_flagship_graphs(out).keys() == written.keys()


def test_flagship_emit_graphs_knob(tmp_path, ray_session):
    from webalizer_ray import PipelineConfig, fixtures
    from webalizer_ray.pipelines.flagship import run_flagship

    src = str(tmp_path / "in")
    fixtures.build_fixture_dir(src, scale="tiny")
    out = str(tmp_path / "out")
    run_flagship(src, out_dir=out,
                 config=PipelineConfig(emit_graphs=True))
    gdir = os.path.join(out, "graphs")
    got = sorted(os.listdir(gdir))
    assert "daily_usage.png" in got and "hourly_usage.png" in got
    img = G.decode_png(open(os.path.join(gdir, "daily_usage.png"),
                            "rb").read())
    # real fixture data must put ink on the canvas
    assert (img == np.array(G.C_HITS, np.uint8)).all(axis=2).any()
