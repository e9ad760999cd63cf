"""HTML usage report — the `output.c` analog (SURVEY.md §2.1 S6–S8).

The reference's end product is a static HTML tree: one `index.html`
yearly summary linking a `usage_YYYYMM.html` page per month, each page
a stack of totals / daily / hourly / top-N tables above the PNG
graphs. This module composes the SAME artifact from the flagship's
finished parquet sinks with stdlib only (``html.escape`` + string
templates): every number shown comes from a sink table the parity and
oracle suites already gate, so the report adds composition, not
computation — exactly the S6–S9 mapping where rendering sits on top of
the aggregate tables.

Scale: like :mod:`webalizer_ray.pipelines.graphs`, this is a
driver-side O(KB) finishing step over the tiny sinks; the cluster's
job ended when the sinks were written.
"""

from __future__ import annotations

import html
import os

import numpy as np
import pandas as pd

_CSS = """body{font-family:sans-serif;background:#e0e0e0;margin:1em}
h1,h2{color:#004000} table{border-collapse:collapse;background:#fff;
margin-bottom:1.5em} th{background:#c0c0c0;border:1px solid #404040;
padding:2px 8px} td{border:1px solid #808080;padding:2px 8px;
text-align:right} td.k{text-align:left} img{border:2px solid #404040;
margin-bottom:1em}"""


def _css(config=None) -> str:
    """Stylesheet honoring the GroupShading / GroupHighlight /
    group_shade_color knobs (webalizer.conf analogs; SURVEY §2.10):
    grouped rows carry class ``g``."""
    css = _CSS
    if config is None:
        # delegate so config=None ALWAYS equals PipelineConfig() by
        # construction, not by a hand-synced literal (r3 review)
        from webalizer_ray.config import DEFAULT_CONFIG
        config = DEFAULT_CONFIG
    rules = []
    if getattr(config, "group_shading", True):
        rules.append(
            f"tr.g td{{background:{config.group_shade_color}}}")
    if getattr(config, "group_highlight", True):
        rules.append("tr.g td{font-weight:bold}")
    return css + (" " + " ".join(rules) if rules else "")


def _fmt(v) -> str:
    if isinstance(v, (int, np.integer)):
        return f"{int(v):,}"
    if isinstance(v, (float, np.floating)):
        return f"{float(v):,.2f}"
    return html.escape(str(v))


def _table(df: pd.DataFrame, title: str, key_cols=("",),
           grouped: bool = False) -> str:
    """``grouped=True`` marks every row class ``g`` — the GroupShading
    / GroupHighlight styling hook (grouped rows are the per-group
    sink's rows in this engine's report)."""
    if df is None or not len(df):
        return ""
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in df.columns)
    tr = '<tr class="g">' if grouped else "<tr>"
    rows = []
    for rec in df.itertuples(index=False):
        cells = "".join(
            f'<td class="k">{_fmt(v)}</td>' if c in key_cols
            else f"<td>{_fmt(v)}</td>"
            for c, v in zip(df.columns, rec))
        rows.append(f"{tr}{cells}</tr>")
    return (f"<h2>{html.escape(title)}</h2>\n<table>\n"
            f"<tr>{head}</tr>\n" + "\n".join(rows) + "\n</table>\n")


def _page(title: str, body: str, config=None) -> str:
    return (f"<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
            f"<title>{html.escape(title)}</title>"
            f"<style>{_css(config)}</style></head>\n"
            f"<body>\n<h1>{html.escape(title)}</h1>\n{body}</body></html>\n")


def _top(df: pd.DataFrame, by: str, key: str, n: int) -> tuple[pd.DataFrame,
                                                               int]:
    """Deterministic top-n view (count desc, key asc) + total row count
    for the reference's 'Top n of m' headers."""
    if df is None or not len(df):
        return pd.DataFrame(), 0
    out = df.sort_values([by, key], ascending=[False, True],
                         ignore_index=True).head(n)
    return out, len(df)


def render_month_page(month: str, sinks: dict, top_n: int = 10,
                      config=None) -> str:
    """One `usage_YYYYMM.html` analog. Daily rows filter to the month;
    hourly and top-N tables are the run's aggregates (one flagship run
    = one report period, the incremental monthly split lives in the
    history pipeline)."""
    daily = sinks.get("daily", pd.DataFrame())
    if len(daily):
        daily = daily[daily["date"].str.startswith(month)] \
            .sort_values("date", ignore_index=True)
    monthly = sinks.get("monthly", pd.DataFrame())
    if len(monthly):
        monthly = monthly[monthly["month"] == month]
    parts = []
    if len(monthly):
        parts.append(_table(monthly, "Monthly Totals", key_cols=("month",)))
    ext = sinks.get("monthly_extremes", pd.DataFrame())
    if ext is not None and len(ext):
        ext = ext[ext["month"] == month]
        if len(ext):
            parts.append(_table(ext, "Averages and Maximums",
                                key_cols=("month",)))
    parts.append('<img src="graphs/daily_usage.png" alt="daily usage">')
    parts.append(_table(daily, "Daily Usage", key_cols=("date",)))
    parts.append('<img src="graphs/hourly_usage.png" alt="hourly usage">')
    parts.append(_table(sinks.get("hourly", pd.DataFrame()),
                        "Hourly Usage"))
    for sink, by, key, title in (
            ("per_tool", "hits", "tool_norm", "Tools"),
            ("per_role", "hits", "role", "Roles"),
            ("per_category", "hits", "category", "Categories"),
            ("search_terms", "hits", "term", "Search Strings"),
            ("per_grp", "hits", "grp", "Groups")):
        df = sinks.get(sink)
        top, m = _top(df, by, key, top_n)
        if len(top):
            parts.append(_table(top, f"Top {len(top)} of {m} {title}",
                                key_cols=(key,),
                                grouped=(sink == "per_grp")))
    pie = '<img src="graphs/ctry_usage.png" alt="category pie">'
    parts.append(pie)
    parts.append(_table(sinks.get("status_hist", pd.DataFrame()),
                        "HTTP Status Codes", key_cols=("status",)))
    return _page(f"Usage Statistics — {month}",
                 "\n".join(p for p in parts if p), config)


def render_index_page(sinks: dict, config=None) -> str:
    """`index.html` analog: the yearly summary table over the monthly
    sink, each month linking its detail page."""
    monthly = sinks.get("monthly", pd.DataFrame())
    body = ['<img src="graphs/usage.png" alt="usage by month">']
    if len(monthly):
        m = monthly.sort_values("month", ascending=False,
                                ignore_index=True).copy()
        m.insert(0, "report", [
            f'<a href="usage_{mo.replace("-", "")}.html">{mo}</a>'
            for mo in m.pop("month")])
        head = "".join(f"<th>{html.escape(str(c))}</th>"
                       for c in m.columns)
        rows = []
        for rec in m.itertuples(index=False):
            cells = [f'<td class="k">{rec[0]}</td>']   # pre-built link
            cells += [f"<td>{_fmt(v)}</td>" for v in rec[1:]]
            rows.append("<tr>" + "".join(cells) + "</tr>")
        body.append("<h2>Summary by Month</h2>\n<table>\n"
                    f"<tr>{head}</tr>\n" + "\n".join(rows) + "\n</table>\n")
    return _page("Usage Statistics — Summary", "\n".join(body),
                 config)


def write_html_report(out_dir: str, top_n: int = 10,
                      config=None) -> dict[str, str]:
    """Compose index.html + one usage_YYYYMM.html per month under
    ``out_dir`` from its parquet sinks; renders the PNG graphs first so
    the <img> references resolve. Idempotent (atomic replace)."""
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.graphs import write_flagship_graphs

    sink_dir = os.path.join(out_dir, "sinks")
    if not os.path.isdir(sink_dir):
        return {}
    sinks = {}
    for f in sorted(os.listdir(sink_dir)):
        if f.endswith(".parquet"):
            sinks[f[:-8]] = pq.read_table(
                os.path.join(sink_dir, f)).to_pandas()
    write_flagship_graphs(out_dir, config=config)

    def _write(name: str, text: str) -> str:
        dest = os.path.join(out_dir, name)
        tmp = dest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, dest)
        return dest

    written = {"index.html": _write("index.html",
                                    render_index_page(sinks, config))}
    monthly = sinks.get("monthly", pd.DataFrame())
    for month in (monthly["month"].tolist() if len(monthly) else []):
        name = f"usage_{month.replace('-', '')}.html"
        written[name] = _write(name,
                               render_month_page(month, sinks, top_n,
                                                 config))
    return written
