"""Monthly history roll-up (SURVEY.md §2.1 S12 — webalizer.hist analog).

The reference keeps one line per month (month year hits files sites
kbytes firstday lastday pages visits) in ``webalizer.hist``, updated at
each month-end flush (preserve.c:put_history()/get_history() ≈40–100
[verify]) and rendered as the yearly summary on index.html
(output.c:write_main_index() [verify]).

Ours: ``history.parquet`` — one row per month with the monthly sink's
measures plus first/last active date. Update = read-old ∪ new →
keep-latest per month (an incremental rerun of a month REPLACES its
row, exactly the reference's month-to-date overwrite semantics) →
atomic rewrite. The table is tiny (months × ~10 cols) — driver-side
pandas, never a distributed job.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from webalizer_ray.pipelines.flagship import _write_atomic as _atomic

HISTORY_COLS = ["month", "hits", "files", "pages", "kb", "convs",
                "sessions", "first_date", "last_date"]


def history_rows(monthly: pd.DataFrame, daily: pd.DataFrame) -> pd.DataFrame:
    """Build history rows from the monthly + daily sinks of one run."""
    span = (daily.assign(month=daily["date"].str.slice(0, 7))
            .groupby("month")["date"].agg(first_date="min", last_date="max")
            .reset_index())
    out = monthly.merge(span, on="month", how="left")
    keep = [c for c in HISTORY_COLS if c in out.columns]
    return out[keep]


def update_history(monthly: pd.DataFrame, daily: pd.DataFrame,
                   history_path: str) -> pd.DataFrame:
    """Merge this run's months into the history file (latest wins)."""
    new = history_rows(monthly, daily)
    if os.path.exists(history_path):
        old = pq.read_table(history_path).to_pandas()
        merged = pd.concat([old, new], ignore_index=True)
    else:
        merged = new
    merged = (merged.drop_duplicates(subset=["month"], keep="last")
              .sort_values("month", ignore_index=True))
    _atomic(merged, history_path)
    return merged


def read_history(history_path: str) -> pd.DataFrame:
    if not os.path.exists(history_path):
        return pd.DataFrame(columns=HISTORY_COLS)
    return pq.read_table(history_path).to_pandas()
