"""Report cosmetics knobs (VERDICT r2 item 8): the webalizer.conf
Color* / GroupShading / GroupHighlight analogs round-trip from
PipelineConfig through the HTML report and PNG graphs, and the wcmgr
``lookup import`` bulk-load works."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from webalizer_ray.config import PipelineConfig


def _sinks():
    return {
        "monthly": pd.DataFrame({"month": ["2025-01"], "hits": [10],
                                 "files": [6], "pages": [4],
                                 "sessions": [3], "convs": [2],
                                 "kb": [1.5]}),
        "daily": pd.DataFrame({"date": ["2025-01-02"], "hits": [10],
                               "files": [6], "pages": [4],
                               "sessions": [3], "convs": [2],
                               "kb": [1.5]}),
        "hourly": pd.DataFrame({"hour": [0], "hits": [10], "files": [6],
                                "pages": [4], "kb": [1.5]}),
        "per_grp": pd.DataFrame({"grp": ["alpha", "beta"],
                                 "hits": [7, 3]}),
    }


def test_group_shading_and_highlight_knobs():
    from webalizer_ray.pipelines import htmlreport as H

    on = PipelineConfig(group_shading=True, group_highlight=True,
                        group_shade_color="#abcdef")
    page = H.render_month_page("2025-01", _sinks(), config=on)
    assert 'tr class="g"' in page
    assert "tr.g td{background:#abcdef}" in page
    assert "tr.g td{font-weight:bold}" in page

    off = PipelineConfig(group_shading=False, group_highlight=False)
    page = H.render_month_page("2025-01", _sinks(), config=off)
    assert 'tr class="g"' in page          # class marks rows either way
    assert "tr.g td{background" not in page
    assert "font-weight:bold" not in page


def test_color_knobs_change_graph_pixels():
    from webalizer_ray.pipelines.graphs import daily_usage_graph

    sinks = _sinks()
    default = daily_usage_graph(sinks["daily"])
    custom = PipelineConfig(color_hit="#123456").graph_palette()
    got = daily_usage_graph(sinks["daily"], colors=custom)
    # the hit bars repaint in the configured color, nothing else breaks
    assert (got == np.array([0x12, 0x34, 0x56])).all(axis=2).any()
    assert not (default == np.array([0x12, 0x34, 0x56])) \
        .all(axis=2).any()
    # default series color no longer appears as the hits series
    assert default.shape == got.shape


def test_bad_color_fails_loudly():
    with pytest.raises(ValueError, match="bad color"):
        PipelineConfig(color_hit="#12")


def test_palette_flows_through_write_flagship_graphs(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.graphs import write_flagship_graphs
    from webalizer_ray.pipelines.graphs import decode_png

    out = str(tmp_path)
    os.makedirs(os.path.join(out, "sinks"))
    pq.write_table(pa.Table.from_pandas(_sinks()["daily"]),
                   os.path.join(out, "sinks", "daily.parquet"))
    cfg = PipelineConfig(color_hit="#123456")
    written = write_flagship_graphs(out, config=cfg)
    rgb = decode_png(open(written["daily_usage.png"], "rb").read())
    assert (rgb == np.array([0x12, 0x34, 0x56])).all(axis=2).any()


def test_lookup_import_csv_and_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "tool_categories.parquet")
    # seed one entry via add
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, "-m", "webalizer_ray.run", "lookup", *a],
        capture_output=True, text=True, env=env, check=True)
    run("add", table, "grep", "search")

    csv = tmp_path / "bulk.csv"
    csv.write_text("tool,category\ngrep,shell\nsed,shell\nsql,db\n")
    run("import", table, str(csv))
    df = pq.read_table(table).to_pandas().set_index("tool")
    assert df.loc["grep", "category"] == "shell"   # import wins
    assert df.loc["sed", "category"] == "shell"
    assert df.loc["sql", "category"] == "db"

    pqt = str(tmp_path / "bulk2.parquet")
    pq.write_table(pa.table({"tool": ["awk"], "category": ["shell"]}),
                   pqt)
    run("import", table, pqt)
    df = pq.read_table(table).to_pandas().set_index("tool")
    assert df.loc["awk", "category"] == "shell"
    assert len(df) == 4


def test_html_report_cli_accepts_cosmetics_overrides(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "run")
    os.makedirs(os.path.join(out, "sinks"))
    for name, df in _sinks().items():
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(out, "sinks", f"{name}.parquet"))
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    proc = subprocess.run(
        [sys.executable, "-m", "webalizer_ray.run", "html-report",
         "--out", out, "--set", "group_shade_color=#ff00ff",
         "--set", "color_hit=#123456"],
        capture_output=True, text=True, env=env, check=True)
    pages = json.loads(proc.stdout)["pages"]
    assert "index.html" in pages
    month = open(os.path.join(out, "report",
                              "usage_202501.html")).read() \
        if os.path.exists(os.path.join(out, "report",
                                       "usage_202501.html")) \
        else open(os.path.join(out, "usage_202501.html")).read()
    assert "tr.g td{background:#ff00ff}" in month
