"""HTML report (output.c analog): page structure, escaping, month
split, top-N headers, sink-directory driver, flagship knob."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webalizer_ray.pipelines import htmlreport as H


def _sinks():
    return {
        "monthly": pd.DataFrame(
            {"month": ["2025-01", "2025-02"], "hits": [90, 10],
             "files": [40, 5], "pages": [20, 2], "kb": [9.5, 1.0],
             "convs": [4, 1], "tools": [3, 1], "sessions": [6, 2]}),
        "daily": pd.DataFrame(
            {"date": ["2025-01-03", "2025-01-04", "2025-02-01"],
             "hits": [60, 30, 10], "files": [30, 10, 5],
             "pages": [15, 5, 2], "kb": [6.0, 3.5, 1.0],
             "convs": [3, 1, 1], "sessions": [4, 2, 2]}),
        "hourly": pd.DataFrame({"hour": [0, 13], "hits": [70, 30],
                                "files": [35, 10], "pages": [17, 5],
                                "kb": [7.0, 3.5]}),
        "per_tool": pd.DataFrame(
            {"tool_norm": ["grep", "a<b>&x"], "hits": [50, 40],
             "kb": [5.0, 4.0], "entry": [2, 1], "exit": [1, 2]}),
        "status_hist": pd.DataFrame({"status": ["200", "404"],
                                     "hits": [95, 5]}),
    }


def test_month_page_structure_and_escaping():
    page = H.render_month_page("2025-01", _sinks())
    assert "<!DOCTYPE html>" in page
    assert "Usage Statistics — 2025-01" in page
    assert "2025-01-03" in page and "2025-02-01" not in page
    assert "Top 2 of 2 Tools" in page
    assert "a&lt;b&gt;&amp;x" in page and "a<b>&x" not in page
    assert 'graphs/daily_usage.png' in page
    assert "HTTP Status Codes" in page


def test_index_links_months_desc():
    page = H.render_index_page(_sinks())
    assert 'href="usage_202502.html"' in page
    assert 'href="usage_202501.html"' in page
    assert page.index("usage_202502") < page.index("usage_202501")
    assert 'graphs/usage.png' in page


def test_top_n_truncation():
    s = _sinks()
    s["per_tool"] = pd.DataFrame(
        {"tool_norm": [f"t{i:02d}" for i in range(30)],
         "hits": list(range(30, 0, -1)), "kb": [1.0] * 30,
         "entry": [0] * 30, "exit": [0] * 30})
    page = H.render_month_page("2025-01", s, top_n=10)
    assert "Top 10 of 30 Tools" in page
    assert "t00" in page and "t29" not in page


def test_write_html_report_tree(tmp_path):
    out = str(tmp_path)
    os.makedirs(os.path.join(out, "sinks"))
    for name, df in _sinks().items():
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(out, "sinks", f"{name}.parquet"))
    written = H.write_html_report(out)
    assert set(written) == {"index.html", "usage_202501.html",
                            "usage_202502.html"}
    # graphs rendered alongside so <img> refs resolve
    assert os.path.exists(os.path.join(out, "graphs",
                                       "daily_usage.png"))
    text = open(written["usage_202501.html"], encoding="utf-8").read()
    assert "Daily Usage" in text
    # idempotent
    assert H.write_html_report(out).keys() == written.keys()


def test_write_html_report_no_sinks(tmp_path):
    assert H.write_html_report(str(tmp_path)) == {}


def test_flagship_emit_html_knob(tmp_path, ray_session):
    from webalizer_ray import PipelineConfig, fixtures
    from webalizer_ray.pipelines.flagship import run_flagship

    src = str(tmp_path / "in")
    fixtures.build_fixture_dir(src, scale="tiny")
    out = str(tmp_path / "out")
    run_flagship(src, out_dir=out, config=PipelineConfig(emit_html=True))
    files = os.listdir(out)
    assert "index.html" in files
    assert any(f.startswith("usage_") and f.endswith(".html")
               for f in files)
    assert os.path.isdir(os.path.join(out, "graphs"))
