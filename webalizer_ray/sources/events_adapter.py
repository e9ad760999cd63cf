"""Adapter: generic event-stream table → transcript turns schema.

The reference supports several log dialects through per-format parsers
selected by ``LogType`` (parser.c:parse_record_ftp()/_squid()/_w3c()
≈450–1100 [verify] — P3–P5 in SURVEY.md). Our equivalent of "another log
format" is an adapter that maps a foreign event table onto the engine's
canonical turns schema (conv_id, turn_idx, role, text, tool, ts), after
which the entire flagship pipeline applies unchanged.

This one adapts the driver's ``events`` table (event_id, ts, user_id,
event_type, value, props): user → conversation, event → turn, with a
deterministic event_type → (role, action, status, tool) mapping and a
grok-formatted ``text`` synthesized from the event fields. turn_idx is
the per-user rank by (ts, event_id), assigned per conv_id hash bucket
(same explicit partitioning as sessionization — one bounded vectorized
call per bucket, no global sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from webalizer_ray.stages.parse import conv_bucket

ROLE_OF = {"view": "user", "click": "user", "signup": "system",
           "purchase": "assistant", "error": "tool"}
ACTION_OF = {"view": "observe", "click": "call", "signup": "plan",
             "purchase": "answer", "error": "ask"}
STATUS_OF = {"view": 200, "click": 200, "signup": 206, "purchase": 200,
             "error": 500}
TOOL_OF = {"click": "browse", "purchase": "checkout_v2", "error": "probe"}

#: Enrichment lookups for the adapted stream (DNS-cache analog content).
TOOL_CATEGORIES = {"browse": "retrieval", "checkout": "commerce"}
ROLE_GROUPS = {"user": "human", "assistant": "model", "system": "automation",
               "tool": "automation"}


def _to_turn_batch(df: pd.DataFrame) -> pd.DataFrame:
    et = df["event_type"]
    out = pd.DataFrame({
        "conv_id": "u" + df["user_id"].astype(np.int64).astype(str).str.zfill(6),
        "event_id": df["event_id"].astype(np.int64),
        "role": et.map(ROLE_OF).fillna("user"),
        "text": ("ACTION=" + et.map(ACTION_OF).fillna("observe")
                 + " STATUS=" + et.map(STATUS_OF).fillna(200).astype(np.int64)
                 .astype(str)
                 + " KB=" + df["value"].astype(np.float64).round(2)
                 .map("{:.2f}".format)
                 + " evt"),
        "tool": et.map(TOOL_OF),
        "ts": df["ts"],
    })
    return out


def events_to_turns(sf_dir: str, num_buckets: int = 64) -> rd.Dataset:
    """Adapt <sf_dir>/events.parquet into the canonical turns schema."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type",
                                  "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = _to_turn_batch(df)
        out["bucket_"] = conv_bucket(out["conv_id"].to_numpy(), num_buckets)
        return out

    def assign_turn_idx(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        g["turn_idx"] = g.groupby("conv_id", sort=False).cumcount() \
            .astype(np.int32)
        return g.drop(columns=["bucket_", "event_id"])[
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    return (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_")
            .map_groups(assign_turn_idx, batch_format="pandas"))


EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def read_events_csv(path: str) -> rd.Dataset:
    """CSV ingestion for the events table (header row, ISO timestamps):
    ``ray.data.read_csv`` streams the files; a batch-local coercion
    stage pins the canonical dtypes (int64 ids, timestamp[us] ts,
    float64 value) so downstream queries behave identically to the
    parquet path — CSV type inference varies per block otherwise (a
    block of integer-looking values must not become int64 when the
    schema says double). Round-trip-tested against the parquet table.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = rd.read_csv(path)

    def coerce(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if not pa.types.is_timestamp(ts.type):
            ts = pc.strptime(pc.cast(ts, pa.string()),
                             format="%Y-%m-%dT%H:%M:%S.%f", unit="us")
        else:
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "value": pc.cast(batch["value"], pa.float64()),
            "props": pc.cast(batch["props"], pa.string()),
        })

    return ds.map_batches(coerce, batch_format="pyarrow")
