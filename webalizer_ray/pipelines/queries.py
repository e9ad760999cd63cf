"""Driver-contract queries: Ray pipelines + matching DuckDB oracle SQL.

One entry per implemented operator family from SURVEY.md §2, expressed
over the driver's testdata views (events / documents / embeddings /
lineitem). Each Ray callable takes ``sf_dir`` and returns a pandas
DataFrame whose COLUMN NAMES AND TYPES exactly match the oracle SQL
(the driver hashes values after sorting columns by name).

Conventions for hash-stable floats: every float aggregate is rounded
(ROUND(x, 2) for sums, 6 for similarities) on BOTH sides; int aggregates
are CAST(. AS BIGINT) in SQL because DuckDB's SUM(int) is HUGEINT.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from webalizer_ray.stages import ann, dedup, scan, simjoin, textstats
from webalizer_ray.stages.aggregate import (
    distinct_count,
    exact_quantiles_bounded,
    reduce_sink,
    salted_two_phase,
)
from webalizer_ray.stages.topn import top_n_pandas

#: name -> (ray_callable, oracle_sql | None)
REGISTRY: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def _events(sf_dir: str, cols) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(cols))


def _docs(sf_dir: str, cols) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(cols))


# ---------------------------------------------------------------------------
# A1–A3: time-bucket aggregates over events (daily/hourly/monthly tables)
# ---------------------------------------------------------------------------

def _with_time_cols(cols):
    def f(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if "hour" in cols:
            batch = batch.append_column(
                "hour", pc.cast(pc.hour(ts), pa.int64()))
        if "date" in cols:
            batch = batch.append_column("date",
                                        pc.strftime(ts, format="%Y-%m-%d"))
        if "month" in cols:
            batch = batch.append_column("month",
                                        pc.strftime(ts, format="%Y-%m"))
        return batch
    return f


@register("hourly_events", sql="""
SELECT CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS hits,
       ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY hour""")
def hourly_events(sf_dir: str) -> pd.DataFrame:
    ds = _events(sf_dir, ["ts", "value"]) \
        .map_batches(_with_time_cols({"hour"}), batch_format="pyarrow")
    out = reduce_sink(ds, ["hour"], {"hits": ("ts", "size"),
                                     "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("hour", ignore_index=True)


@register("daily_events", sql="""
SELECT strftime(ts, '%Y-%m-%d') AS date, COUNT(*) AS hits,
       ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY date""")
def daily_events(sf_dir: str) -> pd.DataFrame:
    ds = _events(sf_dir, ["ts", "value"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    out = reduce_sink(ds, ["date"], {"hits": ("ts", "size"),
                                     "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("date", ignore_index=True)


@register("monthly_events", sql="""
SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS hits,
       COUNT(DISTINCT user_id) AS users, ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY month""")
def monthly_events(sf_dir: str) -> pd.DataFrame:
    ds = _events(sf_dir, ["ts", "value", "user_id"]) \
        .map_batches(_with_time_cols({"month"}), batch_format="pyarrow")
    agg = reduce_sink(ds, ["month"], {"hits": ("ts", "size"),
                                      "value_sum": ("value", "sum")}).to_pandas()
    users = distinct_count(ds, ["month"], "user_id", "users").to_pandas()
    out = agg.merge(users, on="month")
    out["value_sum"] = out["value_sum"].round(2)
    return out[["month", "hits", "users", "value_sum"]] \
        .sort_values("month", ignore_index=True)


# ---------------------------------------------------------------------------
# K1, A10, P9, P10 analogs over events
# ---------------------------------------------------------------------------

@register("top_event_types", sql="""
SELECT event_type, COUNT(*) AS hits FROM events
GROUP BY event_type ORDER BY hits DESC, event_type LIMIT 3""")
def top_event_types(sf_dir: str) -> pd.DataFrame:
    agg = reduce_sink(_events(sf_dir, ["event_type"]), ["event_type"],
                      {"hits": ("event_type", "size")}).to_pandas()
    return top_n_pandas(agg, "event_type", "hits", 3)


@register("distinct_users", sql="""
SELECT COUNT(DISTINCT user_id) AS users FROM events""")
def distinct_users(sf_dir: str) -> pd.DataFrame:
    """Global exact distinct via the two-phase distinct_count with a
    constant key — per-batch dedup, hash-bucketed global dedup + count,
    tiny sum of disjoint partials. The distinct VALUES never gather on
    the driver (10^9 users would not fit)."""
    ds = _events(sf_dir, ["user_id"]).map_batches(
        lambda df: df.assign(_g=np.int32(0)), batch_format="pandas")
    out = distinct_count(ds, ["_g"], "user_id", "users").to_pandas()
    return pd.DataFrame({"users": out["users"].astype(np.int64).to_numpy()})


_CLASS_SQL = """CASE WHEN event_type IN ('view', 'click') THEN 'engagement'
       WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
       WHEN event_type = 'error' THEN 'failure' ELSE 'other' END"""
_CLASS_MAP = {"view": "engagement", "click": "engagement",
              "purchase": "conversion", "signup": "conversion",
              "error": "failure"}


@register("event_class_hist", sql=f"""
SELECT {_CLASS_SQL} AS class, COUNT(*) AS hits, ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY class""")
def event_class_hist(sf_dir: str) -> pd.DataFrame:
    """P9/J2 analog: classify via broadcast lookup, aggregate per class."""
    from webalizer_ray.stages.enrich import _Lookup
    lk = _Lookup(_CLASS_MAP, "other")

    def classify(batch: pa.Table) -> pa.Table:
        return batch.append_column("class", lk(batch["event_type"]))

    ds = _events(sf_dir, ["event_type", "value"]) \
        .map_batches(classify, batch_format="pyarrow")
    out = reduce_sink(ds, ["class"], {"hits": ("class", "size"),
                                      "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("class", ignore_index=True)


@register("filtered_event_counts", sql="""
SELECT event_type, COUNT(*) AS hits FROM events
WHERE NOT regexp_matches(event_type, '^err') GROUP BY event_type""")
def filtered_event_counts(sf_dir: str) -> pd.DataFrame:
    """P10 Ignore*-list analog: vectorized anti-filter then aggregate."""
    def drop_ignored(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.match_substring_regex(batch["event_type"], "^err"))
        return batch.filter(keep)

    ds = _events(sf_dir, ["event_type"]) \
        .map_batches(drop_ignored, batch_format="pyarrow")
    return (reduce_sink(ds, ["event_type"],
                        {"hits": ("event_type", "size")})
            .to_pandas().sort_values("event_type", ignore_index=True))


@register("filtered_event_counts_with_include", sql="""
SELECT event_type, COUNT(*) AS hits FROM events
WHERE NOT (regexp_matches(event_type, '^(err|p)')
           AND NOT regexp_matches(event_type, '^purch'))
GROUP BY event_type""")
def filtered_event_counts_with_include(sf_dir: str) -> pd.DataFrame:
    """P10 Include*-override analog: ignore list drops '^(err|p)' but the
    include list '^purch' overrides — ignore-with-exception, the
    reference's include-before-ignore check order."""
    def drop_ignored(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        ign = pc.match_substring_regex(et, "^(err|p)")
        inc = pc.match_substring_regex(et, "^purch")
        return batch.filter(pc.invert(pc.and_(ign, pc.invert(inc))))

    ds = _events(sf_dir, ["event_type"]) \
        .map_batches(drop_ignored, batch_format="pyarrow")
    return (reduce_sink(ds, ["event_type"],
                        {"hits": ("event_type", "size")})
            .to_pandas().sort_values("event_type", ignore_index=True))


# ---------------------------------------------------------------------------
# W1/W2: sessionization of the events stream (30-min gap, >= rule)
# ---------------------------------------------------------------------------

_NS_SQL = """
SELECT user_id, event_type, ts, event_id,
       CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
            THEN 1 ELSE 0 END AS ns
FROM (SELECT user_id, event_type, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events)"""


def _sessionized_events(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """events + session id per user (vectorized per user-hash bucket)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return df

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        g["sid"] = ns.groupby(g["user_id"], sort=False).cumsum() \
            .astype(np.int64)
        return g.drop(columns=["bucket_"])

    return (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_").map_groups(sessionize, batch_format="pandas"))


@register("event_transitions", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type""")
def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Per-user consecutive-event transition matrix (funnel/Markov
    analysis over the event log). Same partitioning pattern as
    sessionization: hash-bucket by user, ONE vectorized sort+shift per
    bucket (shift masked at user boundaries), then per-bucket partial
    counts so only (from, to, cnt) partials shuffle — never raw events
    twice."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 64).astype(np.int32)
        return df

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        pairs = pd.DataFrame({"from_type": g["event_type"].shift()[same],
                              "to_type": g["event_type"][same]})
        c = pairs.groupby(["from_type", "to_type"], sort=False) \
            .size().rename("cnt").reset_index()
        c["cnt"] = c["cnt"].astype(np.int64)
        return c

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(transitions,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["from_type", "to_type"],
                      {"cnt": ("cnt", "sum")}).to_pandas()
    return out.sort_values(["from_type", "to_type"], ignore_index=True)


@register("user_retention_cohorts", sql="""
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', f.cohort, d.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM d JOIN f USING (user_id) GROUP BY 1, 2""")
def user_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (users active N days after their first-seen
    day) — the classic telemetry roll-up. Every per-user step (distinct
    days, first-seen min, offset join) happens inside the user's hash
    bucket — cohort assignment never crosses buckets, so the only
    all-to-all is the tiny final (cohort, offset) partial-count sum.
    Days are int32 epoch days (zero-copy Arrow date32 cast) until the
    final strftime on the combined result."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(batch["ts"], pa.date32()), pa.int32())
        t = pa.table({"user_id": batch["user_id"], "day": day})
        t = t.group_by(["user_id", "day"]).aggregate([])  # batch-local dedup
        b = pc.cast(np.asarray(t["user_id"], dtype=np.int64) % 64,
                    pa.int32())
        return t.append_column("bucket_", b)

    def cohortize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).copy()
        g["cohort_day"] = g.groupby("user_id")["day"].transform("min")
        g["day_offset"] = (g["day"] - g["cohort_day"]).astype(np.int64)
        c = g.groupby(["cohort_day", "day_offset"], sort=False) \
            .size().rename("active_users").reset_index()
        c["active_users"] = c["active_users"].astype(np.int64)
        return c

    parts = (ds.map_batches(project, batch_format="pyarrow")
             .groupby("bucket_").map_groups(cohortize,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["cohort_day", "day_offset"],
                      {"active_users": ("active_users", "sum")}).to_pandas()
    out["cohort"] = pd.to_datetime(out["cohort_day"], unit="D") \
        .dt.strftime("%Y-%m-%d")
    return (out[["cohort", "day_offset", "active_users"]]
            .sort_values(["cohort", "day_offset"], ignore_index=True))


@register("hourly_anomaly_scores", sql="""
WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
                  event_type, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, AVG(cnt) AS mu, STDDEV_POP(cnt) AS sd
      FROM h GROUP BY event_type)
SELECT h.hr, h.event_type, CAST(h.cnt AS BIGINT) AS cnt,
       ROUND((h.cnt - s.mu) / s.sd, 6) AS z
FROM h JOIN s USING (event_type)""")
def hourly_anomaly_scores(sf_dir: str) -> pd.DataFrame:
    """Per-(hour, type) volume z-scores against the type's own
    distribution — the monitoring/anomaly roll-up. The heavy step is
    the partial-combined hourly count (raw events never shuffle, only
    per-batch (hour, type, cnt) partials); z-scoring runs on the tiny
    aggregate, which stays small (hours × types) at any event scale."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def hour_partials(batch: pa.Table) -> pa.Table:
        hr = pc.strftime(pc.floor_temporal(batch["ts"], unit="hour"),
                         format="%Y-%m-%d %H")
        t = pa.table({"hr": hr, "event_type": batch["event_type"]})
        return t.group_by(["hr", "event_type"]).aggregate([("hr", "count")]) \
            .rename_columns(["hr", "event_type", "cnt"])

    h = reduce_sink(ds.map_batches(hour_partials, batch_format="pyarrow"),
                    ["hr", "event_type"], {"cnt": ("cnt", "sum")}) \
        .to_pandas()
    g = h.groupby("event_type")["cnt"]
    mu = g.transform("mean").to_numpy(np.float64)
    sd = g.transform(lambda x: np.std(x.to_numpy(np.float64)))
    h["z"] = textstats.round_half_away(
        (h["cnt"].to_numpy(np.float64) - mu) / sd.to_numpy(np.float64), 6)
    h["cnt"] = h["cnt"].astype(np.int64)
    return h.sort_values(["hr", "event_type"], ignore_index=True)


@register("session_funnel_conversion", sql=f"""
WITH s AS (SELECT user_id, event_type, ts,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM ({{ns}})),
per AS (SELECT user_id, sid,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS last_purchase
        FROM s GROUP BY user_id, sid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN first_view IS NOT NULL
                      AND last_purchase IS NOT NULL
                      AND first_view < last_purchase
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM per""".format(ns=_NS_SQL))
def session_funnel_conversion(sf_dir: str) -> pd.DataFrame:
    """Funnel conversion: sessions where a 'view' strictly precedes a
    'purchase' (same visit-window sessionization as user_sessions).
    first-view/last-purchase per session via the exact two-phase
    combiner (sentinel int64 µs, min/max merge — correct under any
    block split), then only per-batch (sessions, converted) count
    partials reach the driver."""
    SENT_MAX, SENT_MIN = np.iinfo(np.int64).max, np.iinfo(np.int64).min
    sess = _sessionized_events(sf_dir)

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "sid": df["sid"].to_numpy(),
            "fv": np.where(et == "view", us, SENT_MAX),
            "lp": np.where(et == "purchase", us, SENT_MIN)})

    per_sess = reduce_sink(sess.map_batches(flags, batch_format="pandas"),
                           ["user_id", "sid"],
                           {"fv": ("fv", "min"), "lp": ("lp", "max")})

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        conv = ((df["fv"] != SENT_MAX) & (df["lp"] != SENT_MIN)
                & (df["fv"] < df["lp"])).sum()
        return pd.DataFrame({"n_sessions": [np.int64(len(df))],
                             "n_converted": [np.int64(conv)]})

    parts = per_sess.map_batches(count_partial,
                                 batch_format="pandas").to_pandas()
    return pd.DataFrame({"n_sessions": [parts["n_sessions"].sum()],
                         "n_converted": [parts["n_converted"].sum()]}) \
        .astype(np.int64)


@register("user_sessions", sql=f"""
SELECT user_id, CAST(SUM(ns) AS BIGINT) AS sessions
FROM ({_NS_SQL}) GROUP BY user_id""")
def user_sessions(sf_dir: str) -> pd.DataFrame:
    sess = _sessionized_events(sf_dir)
    out = reduce_sink(sess, ["user_id"],
                      {"sessions": ("sid", "max")}).to_pandas()
    return out.sort_values("user_id", ignore_index=True)


@register("session_entry_exit", sql=f"""
WITH s AS (SELECT user_id, event_type, ts, event_id,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM ({_NS_SQL})),
per_sess AS (SELECT user_id, sid,
                    FIRST(event_type ORDER BY ts, event_id) AS entry_type,
                    LAST(event_type ORDER BY ts, event_id) AS exit_type
             FROM s GROUP BY user_id, sid),
en AS (SELECT entry_type AS event_type, COUNT(*) AS entry FROM per_sess
       GROUP BY 1),
ex AS (SELECT exit_type AS event_type, COUNT(*) AS exit FROM per_sess
       GROUP BY 1)
SELECT event_type, COALESCE(entry, 0) AS entry, COALESCE(exit, 0) AS exit
FROM en FULL JOIN ex USING (event_type)""")
def session_entry_exit(sf_dir: str) -> pd.DataFrame:
    """W2 analog: first/last event of each session → entry/exit counts."""
    sess = _sessionized_events(sf_dir)

    def firstlast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby(["user_id", "sid"], sort=False)
        return g.agg(entry_type=("event_type", "first"),
                     exit_type=("event_type", "last"),
                     min_ts=("ts", "min"),
                     min_eid=("event_id", "min")).reset_index()

    # per-batch partials could split a session across blocks → combine in
    # (ts, event_id) order (same pattern as session.py)
    partials = sess.map_batches(firstlast, batch_format="pandas").to_pandas()
    partials = partials.sort_values(["user_id", "sid", "min_ts", "min_eid"],
                                    kind="mergesort")
    per_sess = partials.groupby(["user_id", "sid"], sort=False).agg(
        entry_type=("entry_type", "first"), exit_type=("exit_type", "last"))
    en = per_sess.groupby("entry_type").size().rename("entry")
    ex = per_sess.groupby("exit_type").size().rename("exit")
    out = pd.concat([en, ex], axis=1).fillna(0).astype(np.int64) \
        .rename_axis("event_type").reset_index()
    return out.sort_values("event_type", ignore_index=True)


# ---------------------------------------------------------------------------
# P2/P14/J3 analogs over documents
# ---------------------------------------------------------------------------

@register("docs_first_word", sql="""
SELECT regexp_extract(text, '^[a-z]+') AS word, COUNT(*) AS docs
FROM documents GROUP BY word""")
def docs_first_word(sf_dir: str) -> pd.DataFrame:
    def extract(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["text"], r"^(?P<w>[a-z]+)")
        return batch.append_column(
            "word", pc.fill_null(pc.struct_field(ext, "w"), ""))

    ds = _docs(sf_dir, ["text"]).map_batches(extract, batch_format="pyarrow")
    return (reduce_sink(ds, ["word"], {"docs": ("word", "size")})
            .to_pandas().sort_values("word", ignore_index=True))


@register("docs_with_term", sql="""
SELECT source, COUNT(*) AS docs FROM documents
WHERE text LIKE '%query%' GROUP BY source""")
def docs_with_term(sf_dir: str) -> pd.DataFrame:
    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.match_substring(batch["text"], "query"))

    ds = _docs(sf_dir, ["text", "source"]).map_batches(
        semi, batch_format="pyarrow")
    return (reduce_sink(ds, ["source"], {"docs": ("source", "size")})
            .to_pandas().sort_values("source", ignore_index=True))


@register("token_count_docs", sql=r"""
SELECT doc_id, CASE WHEN trim(text) = '' THEN 0
       ELSE CAST(array_length(string_split_regex(trim(text), '\s+')) AS BIGINT)
       END AS n_tokens
FROM documents""")
def token_count_docs(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.add_token_counts, batch_format="pyarrow")
    return (ds.select_columns(["doc_id", "n_tokens"]).to_pandas()
            .sort_values("doc_id", ignore_index=True))


# ---------------------------------------------------------------------------
# A11 skew / K3 over lineitem
# ---------------------------------------------------------------------------

@register("salted_returnflag_qty", sql="""
SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY l_returnflag""")
def salted_returnflag_qty(sf_dir: str) -> pd.DataFrame:
    """Explicit salted two-phase aggregation (hot-key mitigation path)."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    out = salted_two_phase(ds, "l_returnflag", "l_quantity",
                           salt_buckets=16, alias="sum_qty").to_pandas()
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values("l_returnflag", ignore_index=True)


@register("top_revenue_parts", sql="""
SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_partkey
ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) DESC, l_partkey
LIMIT 10""")
def top_revenue_parts(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("rev", rev)

    agg = reduce_sink(ds.map_batches(revenue, batch_format="pyarrow"),
                      ["l_partkey"], {"revenue": ("rev", "sum")}).to_pandas()
    agg["revenue"] = agg["revenue"].round(2)
    return top_n_pandas(agg, "l_partkey", "revenue", 10)


# ---------------------------------------------------------------------------
# Dedup / similarity / text-analysis (training-data operators)
# ---------------------------------------------------------------------------

@register("exact_dedup_docs", sql=r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies FROM documents
GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))""")
def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    out = dedup.exact_dedup(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


@register("incremental_dedup_counts", sql=r"""
SELECT 'r1' AS run,
       CAST(COUNT(DISTINCT lower(regexp_replace(trim(text), '\s+', ' ',
                                                'g'))) AS BIGINT) AS kept
FROM documents
UNION ALL SELECT 'r2', 0""")
def incremental_dedup_counts(sf_dir: str) -> pd.DataFrame:
    """Cross-run dedup against the persistent fingerprint store: run 1
    ingests the corpus (keeps one doc per distinct normalized text),
    run 2 re-feeds the same corpus and must keep NOTHING — the
    incremental-ingestion guarantee (D3 applied to the documents
    table). Oracle: run 1 = COUNT(DISTINCT normalized text), run 2 = 0
    by the store contract."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    store = tempfile.mkdtemp(prefix="wr_incstore_")
    k1 = dedup.incremental_exact_dedup(
        docs, store, "r1", tempfile.mkdtemp(prefix="wr_incout_")).count()
    k2 = dedup.incremental_exact_dedup(
        docs, store, "r2", tempfile.mkdtemp(prefix="wr_incout_")).count()
    return pd.DataFrame({"run": ["r1", "r2"],
                         "kept": np.array([k1, k2], dtype=np.int64)})


@register("cosine_dup_pairs", sql="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
           AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4""")
def cosine_dup_pairs(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return dedup.cosine_dup_pairs(ds, threshold=0.4)


@register("cosine_dup_pairs_lsh", sql="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
           AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4""")
def cosine_dup_pairs_lsh(sf_dir: str) -> pd.DataFrame:
    """The SCALE path for embedding near-dup: hyperplane-LSH candidate
    buckets + exact-cosine verify on candidates only (bucketed joins) —
    same oracle as cosine_dup_pairs; at (k=4, L=48) the per-pair miss
    probability is ≈2.5e-4, giving deterministic full recall on this
    fixture with the fixed seed (the blocked all-pairs query above stays
    as the parity baseline)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return dedup.cosine_dup_pairs_lsh(ds, threshold=0.4, n_planes=4,
                                      n_tables=48)


@register("cosine_dup_clusters", sql="""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.reach FROM edges e JOIN walk w ON w.node = e.v)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(reach) AS BIGINT) AS cluster_id
FROM walk GROUP BY node""")
def cosine_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup PAIRS → dedup DECISIONS: distributed connected
    components (min-label propagation + pointer doubling, O(log d)
    supersteps of fixed-width int64 shuffles) over the LSH-generated
    cosine pair graph.  cluster_id = min vec_id per component — a
    "keep one doc per cluster" policy falls out as
    ``node != cluster_id → drop``.  Oracle: DuckDB recursive CTE
    (reachability closure + MIN) over the identical pair predicate."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = dedup.cosine_dup_pairs_lsh(ds, threshold=0.4, n_planes=4,
                                       n_tables=48)
    return dedup.connected_components(pairs)


@register("ann_topk", sql="""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 3),
sims AS (SELECT q.query_id, e.vec_id,
                ROUND(list_cosine_similarity(q.qe,
                      CAST(e.embedding AS DOUBLE[])), 9) AS cosine
         FROM q CROSS JOIN embeddings e),
ranked AS (SELECT query_id, vec_id, cosine,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
           FROM sims)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 5""")
def ann_topk(sf_dir: str) -> pd.DataFrame:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pc.less(tbl["vec_id"], 3)
    qtbl = tbl.filter(qmask)
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]] \
        .sort_values(["query_id", "rank"], ignore_index=True)


# --- rows-only checks (non-SQL-expressible; driver records row counts) ----

@register("minhash_dup_pairs")
def minhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                   threshold=0.5)


@register("minhash_dup_clusters")
def minhash_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components over the MinHash-LSH candidate pair graph
    (Jaccard-verified): the full fuzzy-dedup chain candidate → verify →
    cluster.  Rows-only check (MinHash is sampling-based, not
    SQL-expressible); the CC step itself is oracle-backed via
    cosine_dup_clusters."""
    pairs = dedup.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                    threshold=0.5)
    return dedup.connected_components(pairs)


@register("simhash_dup_pairs")
def simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               max_hamming=8)


@register("ngram_jaccard_pairs")
def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH candidates verified by EXACT word-3-gram Jaccard —
    texts joined back in-cluster (bucketed hash joins), never a driver
    text dict."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    cand = dedup.minhash_lsh_pairs(docs, threshold=0.3)
    return dedup.ngram_jaccard_pairs_distributed(docs, cand, n=3,
                                                 threshold=0.3)


@register("knn_graph", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor, cosine,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims)
SELECT node, neighbor, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 2""")
def knn_graph(sf_dir: str) -> pd.DataFrame:
    """EXACT k-NN graph (top-k similarity join), the parity baseline:
    the query matrix is the whole (small) table broadcast once, each
    batch emits local top-(k+1) per node — fine while N·dim fits a
    broadcast; knn_graph_lsh below is the scale path (same split as
    cosine_dup_pairs vs cosine_dup_pairs_lsh)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    vecs = np.stack(tbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, vecs, k=3)     # k+1: self is in there
    out["node"] = ids[out["query_id"].to_numpy()]
    # drop the self edge by IDENTITY, not by rank — an exact duplicate
    # vector with a smaller id would outrank self
    out = out[out["node"] != out["vec_id"]].copy()
    out = out.sort_values(["node", "rank"], ignore_index=True)
    out["rank"] = (out.groupby("node", sort=False).cumcount() + 1) \
        .astype(np.int64)
    out = out[out["rank"] <= 2]
    out["neighbor"] = out["vec_id"]
    out["cosine"] = out["cosine"].round(6)
    return (out[["node", "neighbor", "cosine", "rank"]]
            .sort_values(["node", "rank"], ignore_index=True))


@register("knn_graph_lsh")
def knn_graph_lsh(sf_dir: str) -> pd.DataFrame:
    """The SCALE path for the k-NN graph: LSH candidate pairs → exact
    cosine via bucketed value joins → two-stage per-node top-k (local
    top-k partials bound the shuffle to k rows per node per batch).
    Approximate (candidate recall < 1); brute-force parity guarded by
    pytest, rows-only here."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ann.knn_graph_lsh(ds, k=2, n_planes=4, n_tables=48)


@register("ann_topk_lsh")
def ann_topk_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate variant of ann_topk (LSH buckets; recall < 1)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.lsh_bucket_topk(ds, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out.sort_values(["query_id", "rank"], ignore_index=True)


def _lang_rx(lang: str) -> str:
    return r"\b(?:" + "|".join(textstats.LANG_STOPWORDS[lang]) + r")\b"


@register("lang_id_docs", sql=f"""
WITH s AS (SELECT doc_id, lang,
    len(regexp_extract_all(lower(text), '{_lang_rx("en")}')) AS s_en,
    len(regexp_extract_all(lower(text), '{_lang_rx("de")}')) AS s_de,
    len(regexp_extract_all(lower(text), '{_lang_rx("fr")}')) AS s_fr,
    len(regexp_extract_all(lower(text), '{_lang_rx("es")}')) AS s_es
    FROM documents),
t AS (SELECT *, s_en + s_de + s_fr + s_es AS total,
             GREATEST(s_en, s_de, s_fr, s_es) AS mx FROM s)
SELECT doc_id, lang,
       CASE WHEN total = 0 THEN 'und'
            WHEN s_en = mx THEN 'en' WHEN s_de = mx THEN 'de'
            WHEN s_fr = mx THEN 'fr' ELSE 'es' END AS pred_lang,
       ROUND(CASE WHEN total = 0 THEN 0.0
                  ELSE mx * 1.0 / total END, 4) AS lang_conf
FROM t""")
def lang_id_docs(sf_dir: str) -> pd.DataFrame:
    """Stopword-hit language ID — now oracle-backed: the per-language
    RE2 alternation counts and the first-max argmax (CASE in dict
    order against GREATEST) are reproduced exactly in SQL; RE2 on both
    sides makes the counts byte-identical."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        textstats.add_lang_id, batch_format="pandas")
    out = ds.select_columns(["doc_id", "lang", "pred_lang", "lang_conf"]) \
        .to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


#: Stopword alternation shared with the SQL oracle (RE2 on both sides:
#: Arrow kernels in the engine, DuckDB regexp_extract_all in the oracle).
_STOP_RX_SQL = r"\b(?:" + "|".join(textstats.LANG_STOPWORDS["en"]) + r")\b"


@register("quality_docs", sql=f"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
           AS n_tokens,
         CAST(length(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT)
           AS n_punct,
         CAST(length(regexp_extract_all(text, '{_STOP_RX_SQL}')) AS BIGINT)
           AS n_stop
  FROM documents),
r AS (
  SELECT doc_id, n_chars, n_tokens,
         ROUND(n_punct * 1.0 / GREATEST(n_chars, 1), 4) AS punct_ratio,
         ROUND(n_stop * 1.0 / GREATEST(n_tokens, 1), 4) AS stopword_ratio
  FROM q)
SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
       ROUND(0.4 * (LEAST(n_tokens, 200) / 200.0)
             + 0.3 * (1.0 - LEAST(punct_ratio, 1.0))
             + 0.3 * LEAST(stopword_ratio, 1.0), 4) AS quality_score
FROM r""")
def quality_docs(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.add_quality_score, batch_format="pandas")
    return (ds.select_columns(["doc_id", "n_chars", "n_tokens", "punct_ratio",
                               "stopword_ratio", "quality_score"])
            .to_pandas().sort_values("doc_id", ignore_index=True))


@register("fingerprint_docs")
def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda df: textstats.add_fingerprint(df)[["doc_id", "fingerprint"]],
        batch_format="pandas")
    out = ds.to_pandas()
    out["fingerprint"] = out["fingerprint"].astype(np.uint64)
    return out.sort_values("doc_id", ignore_index=True)


@register("curation_funnel", sql=f"""
WITH q AS (
  SELECT doc_id, text,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
           AS n_tokens,
         CAST(length(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT)
           AS n_punct,
         CAST(length(regexp_extract_all(text, '{_STOP_RX_SQL}')) AS BIGINT)
           AS n_stop
  FROM documents),
s AS (
  SELECT doc_id, text, n_tokens,
         ROUND(0.4 * (LEAST(n_tokens, 200) / 200.0)
               + 0.3 * (1.0 - LEAST(ROUND(n_punct * 1.0
                                          / GREATEST(n_chars, 1), 4), 1.0))
               + 0.3 * LEAST(ROUND(n_stop * 1.0
                                   / GREATEST(n_tokens, 1), 4), 1.0), 4)
             AS quality_score
  FROM q),
b AS (SELECT quantile_cont(n_tokens, 0.05) AS lo,
             quantile_cont(n_tokens, 0.95) AS hi FROM s),
g AS (SELECT doc_id, text,
             CASE WHEN n_tokens < b.lo OR n_tokens > b.hi THEN 'length'
                  WHEN quality_score < 0.38 THEN 'quality'
                  ELSE 'pass' END AS gate
      FROM s, b),
p AS (SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY
                 lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                 AS keeper
      FROM g WHERE gate = 'pass'),
routes AS (
  SELECT doc_id, gate AS route FROM g WHERE gate != 'pass'
  UNION ALL
  SELECT doc_id, CASE WHEN doc_id = keeper THEN 'kept'
                      ELSE 'duplicate' END FROM p)
SELECT route, CAST(COUNT(*) AS BIGINT) AS docs
FROM routes GROUP BY route""")
def curation_funnel(sf_dir: str) -> pd.DataFrame:
    """End-to-end curation pipeline (pipelines/curate.py): percentile
    length band → quality gate → exact dedup among survivors, curated
    parquet written hive-partitioned by route, funnel counts returned.
    Oracle reproduces gate order, the quantile band, the rounded score
    and the min-id keeper rule in plain SQL."""
    from webalizer_ray.pipelines.curate import run_curation
    res = run_curation(_docs(sf_dir, ["doc_id", "text"]),
                       tempfile.mkdtemp(prefix="wr_curate_") + "/run",
                       min_quality=0.38)
    rows = [(r, c) for r, c in res["routes"].items() if c > 0]
    return (pd.DataFrame(rows, columns=["route", "docs"])
            .astype({"docs": np.int64})
            .sort_values("route", ignore_index=True))


# ---------------------------------------------------------------------------
# Flagship over the adapted events stream (full parse→enrich→route→agg),
# oracle-checked end to end including sessionization with month split.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# P13 / J2 / J6 / P14 / K3 analogs (mangle, suffix-table join, domain
# grouping, JSON field extraction, top-by-volume)
# ---------------------------------------------------------------------------

_TOOL_SQL = """SELECT CASE event_type WHEN 'click' THEN 'browse'
       WHEN 'purchase' THEN 'checkout_v2' WHEN 'error' THEN 'probe'
       END AS tool FROM events WHERE event_type IN ('click','purchase','error')"""


@register("mangled_tool_hits", sql=f"""
WITH t AS ({_TOOL_SQL}),
lv AS (SELECT 0 AS level, tool FROM t
       UNION ALL SELECT 1, regexp_replace(tool, '_v\\d+$', '') FROM t
       UNION ALL SELECT 2, substring(regexp_replace(tool, '_v\\d+$', ''),
                                     1, 4) FROM t)
SELECT level, tool, COUNT(*) AS hits FROM lv GROUP BY level, tool""")
def mangled_tool_hits(sf_dir: str) -> pd.DataFrame:
    """P13 MangleAgents analog: progressive normalization levels 0..2
    (raw → version-stripped → 4-char truncation, the MAXAGENT-buffer
    analog), each an Arrow kernel."""
    from webalizer_ray.sources.events_adapter import TOOL_OF

    def levels(batch: pa.Table) -> pa.Table:
        tool = pc.drop_null(batch["tool"])
        l1 = pc.replace_substring_regex(tool, pattern=r"_v\d+$",
                                        replacement="")
        l2 = pc.utf8_slice_codeunits(l1, 0, 4)
        return pa.concat_tables(
            pa.table({"level": pa.array(np.full(len(t), i, dtype=np.int32)),
                      "tool": t}) for i, t in enumerate((tool, l1, l2)))

    def to_tool(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tool": df["event_type"].map(TOOL_OF)})

    ds = (_events(sf_dir, ["event_type"])
          .map_batches(to_tool, batch_format="pandas")
          .map_batches(levels, batch_format="pyarrow"))
    out = reduce_sink(ds, ["level", "tool"],
                      {"hits": ("tool", "size")}).to_pandas()
    out["level"] = out["level"].astype(np.int64)
    return out.sort_values(["level", "tool"], ignore_index=True)


@register("conv_domain_groups", sql="""
SELECT substring('u' || lpad(CAST(user_id AS VARCHAR), 6, '0'), 1, 4)
           AS domain,
       COUNT(*) AS hits, COUNT(DISTINCT user_id) AS convs
FROM events GROUP BY domain""")
def conv_domain_groups(sf_dir: str) -> pd.DataFrame:
    """J6 GroupDomains analog: truncate the conv key to its N-label
    prefix and aggregate per group (get_domain() ≈3950 [verify])."""
    def dom(df: pd.DataFrame) -> pd.DataFrame:
        conv = "u" + df["user_id"].astype(np.int64).astype(str).str.zfill(6)
        return pd.DataFrame({"domain": conv.str.slice(0, 4),
                             "user_id": df["user_id"]})

    ds = _events(sf_dir, ["user_id"]).map_batches(dom, batch_format="pandas")
    hits = reduce_sink(ds, ["domain"], {"hits": ("domain", "size")})
    convs = distinct_count(ds, ["domain"], "user_id", "convs")
    out = hits.to_pandas().merge(convs.to_pandas(), on="domain")
    return out.sort_values("domain", ignore_index=True)


_FAMILY_SQL = """CASE lang WHEN 'en' THEN 'germanic' WHEN 'de' THEN 'germanic'
    WHEN 'fr' THEN 'romance' WHEN 'es' THEN 'romance'
    WHEN 'zh' THEN 'sinitic' ELSE 'other' END"""
_FAMILY_MAP = {"en": "germanic", "de": "germanic", "fr": "romance",
               "es": "romance", "zh": "sinitic"}


@register("lang_family_docs", sql=f"""
SELECT {_FAMILY_SQL} AS family, COUNT(*) AS docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY family""")
def lang_family_docs(sf_dir: str) -> pd.DataFrame:
    """J2 country-TLD-table analog: tiny static suffix table broadcast
    into the batch fn (ctry[] scan in put_hnode path ≈3900 [verify])."""
    from webalizer_ray.stages.enrich import _Lookup
    lk = _Lookup(_FAMILY_MAP, "other")

    def fam(batch: pa.Table) -> pa.Table:
        return batch.append_column("family", lk(batch["lang"]))

    ds = _docs(sf_dir, ["lang", "n_chars"]).map_batches(
        fam, batch_format="pyarrow")
    out = reduce_sink(ds, ["family"], {"docs": ("family", "size"),
                                       "chars": ("n_chars", "sum")}).to_pandas()
    return out.sort_values("family", ignore_index=True)


@register("props_json_k_sum", sql="""
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
            AS BIGINT) AS k_sum
FROM events GROUP BY event_type""")
def props_json_k_sum(sf_dir: str) -> pd.DataFrame:
    """P14 search-param-extraction analog over a JSON props column:
    vectorized regex pull of a field, then aggregate."""
    def extract(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return batch.append_column("k", pc.fill_null(k, 0))

    ds = _events(sf_dir, ["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow")
    out = reduce_sink(ds, ["event_type"],
                      {"k_sum": ("k", "sum")}).to_pandas()
    return out.sort_values("event_type", ignore_index=True)


@register("top_users_by_value", sql="""
SELECT user_id, ROUND(SUM(value), 2) AS value_sum FROM events
GROUP BY user_id
ORDER BY ROUND(SUM(value), 2) DESC, user_id LIMIT 10""")
def top_users_by_value(sf_dir: str) -> pd.DataFrame:
    """K3 top-by-KBytes analog: second top-N metric over one aggregate."""
    agg = reduce_sink(_events(sf_dir, ["user_id", "value"]), ["user_id"],
                      {"value_sum": ("value", "sum")}).to_pandas()
    agg["value_sum"] = agg["value_sum"].round(2)
    return top_n_pandas(agg, "user_id", "value_sum", 10)


@register("train_val_split_counts", sql="""
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'val' END AS split,
       lang, COUNT(*) AS docs
FROM documents GROUP BY split, lang""")
def train_val_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val split (the K4-adjacent op every training
    pipeline needs): membership is a pure function of the stable doc id,
    so the split is reproducible across runs/cluster sizes and needs no
    shuffle — each batch tags its own rows."""
    def tag(batch: pa.Table) -> pa.Table:
        frac = np.asarray(batch["doc_id"]) % 10
        split = pa.array(np.where(frac < 8, "train", "val"), pa.string())
        return batch.append_column("split", split)

    ds = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        tag, batch_format="pyarrow")
    out = reduce_sink(ds, ["split", "lang"],
                      {"docs": ("lang", "size")}).to_pandas()
    return out.sort_values(["split", "lang"], ignore_index=True)


@register("cleaned_docs_len", sql=r"""
SELECT doc_id,
       CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
            AS BIGINT) AS clean_len
FROM documents""")
def cleaned_docs_len(sf_dir: str) -> pd.DataFrame:
    """Text-cleaning op (lowercase, whitespace collapse, trim) as pure
    Arrow kernels — the normalize step ahead of dedup/tokenize."""
    def clean(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim(t, " ")
        return batch.append_column(
            "clean_len", pc.cast(pc.utf8_length(t), pa.int64()))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow")
    return (ds.select_columns(["doc_id", "clean_len"]).to_pandas()
            .sort_values("doc_id", ignore_index=True))


#: Deterministic PII augmentation shared by the Ray path and the oracle:
#: the fixture docs are digit-free word salad, so each doc gets synthetic
#: PII derived from its doc_id — identical string expression both sides.
_PII_SUFFIX = ("@mail.example.com from 10.0.{m}.7 card 4111111111111111 "
               "ssn 987-65-4321 tel +1 800 555 0199")

@register("pii_redacted_docs", sql=r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.7 card 4111111111111111 ssn 987-65-4321'
              || ' tel +1 800 555 0199' AS t
  FROM documents),
red AS (
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
      '\+?\b(?:\d{1,3}[- ])?\d{3}[- ]\d{3,4}[- ]\d{4}\b', '<PHONE>', 'g'),
      '\b\d{13,16}\b', '<CC>', 'g') AS red_text
  FROM aug)
SELECT doc_id, red_text,
       CAST(len(regexp_extract_all(red_text, '<EMAIL>')) AS BIGINT)
           AS n_email,
       CAST(len(regexp_extract_all(red_text, '<IP>')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(red_text, '<SSN>')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(red_text, '<PHONE>')) AS BIGINT)
           AS n_phone,
       CAST(len(regexp_extract_all(red_text, '<CC>')) AS BIGINT) AS n_cc,
       CAST(len(regexp_extract_all(red_text,
            '<EMAIL>|<IP>|<SSN>|<PHONE>|<CC>')) AS BIGINT) AS n_pii
FROM red""")
def pii_redacted_docs(sf_dir: str) -> pd.DataFrame:
    """PII scrubbing as sequential Arrow RE2 replace passes
    (textstats.redact_pii) — email/IP/SSN/phone/credit-card →
    placeholders, with per-type counts. Oracle: identical nested
    DuckDB regexp_replace chain (both engines are RE2, so the redacted
    text is compared byte-for-byte, not just counted)."""
    def augment(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        pre, post = _PII_SUFFIX.split("{m}")
        df["text"] = (df["text"].fillna("") + " contact user"
                      + df["doc_id"].astype(str) + pre
                      + (df["doc_id"] % 256).astype(str) + post)
        return df

    ds = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(augment, batch_format="pandas") \
        .map_batches(textstats.redact_pii, batch_format="pyarrow")
    out = ds.select_columns(["doc_id", "red_text", "n_email", "n_ip",
                             "n_ssn", "n_phone", "n_cc", "n_pii"]) \
        .to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


@register("top_ngrams", sql=r"""
WITH w AS (SELECT doc_id, generate_subscripts(ws, 1) AS i,
                  unnest(ws) AS word
           FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                 FROM documents)),
g AS (SELECT a.word || ' ' || b.word || ' ' || c.word AS ngram
      FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
               JOIN w c ON a.doc_id = c.doc_id AND c.i = a.i + 2)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""")
def top_ngrams(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide top-k word trigrams — the corpus-statistics op
    behind contamination checks and boilerplate detection. Per batch,
    trigrams are built by numpy array shifts over the exploded word
    array (no per-row loop) and PRE-COUNTED (value_counts partials =
    the combiner), so the groupby shuffles one row per distinct
    (trigram, batch), never one per occurrence."""
    def trigram_partials(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna().to_numpy()
        if len(flat) < 3:
            return pd.DataFrame({"ngram": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        doc = np.repeat(np.arange(len(lens)), lens)
        tri = flat[:-2] + " " + flat[1:-1] + " " + flat[2:]
        tri = tri[doc[:-2] == doc[2:]]          # no cross-doc trigrams
        vc = pd.Series(tri).value_counts()
        return pd.DataFrame({"ngram": vc.index.to_numpy(),
                             "cnt": vc.to_numpy(np.int64)})

    ds = _docs(sf_dir, ["text"]).map_batches(trigram_partials,
                                             batch_format="pandas")
    agg = reduce_sink(ds, ["ngram"], {"cnt": ("cnt", "sum")}).to_pandas()
    return top_n_pandas(agg, "ngram", "cnt", 20)


@register("repetition_docs", sql=r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_uniq_words,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_word_frac,
       ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_word_frac
FROM c GROUP BY doc_id""")
def repetition_docs(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (most-frequent-word
    fraction, duplicate-word fraction) — repetitious docs are the #1
    junk class the Gopher rules target. Entirely batch-local (docs
    never span batches): explode + one pandas groupby per batch, zero
    shuffle."""
    def rep_stats(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        c = (pd.DataFrame({"doc_id": doc, "word": flat.to_numpy()})
             .groupby(["doc_id", "word"], sort=False).size())
        g = c.groupby(level="doc_id")
        tot, uniq, mx = g.sum(), g.size(), g.max()
        return pd.DataFrame({
            "doc_id": tot.index.to_numpy(np.int64),
            "n_words": tot.to_numpy(np.int64),
            "n_uniq_words": uniq.to_numpy(np.int64),
            "top_word_frac": textstats.round_half_away(
                mx.to_numpy(np.float64) / tot.to_numpy(), 6),
            "dup_word_frac": textstats.round_half_away(
                1.0 - uniq.to_numpy(np.float64) / tot.to_numpy(), 6),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rep_stats, batch_format="pandas")
    return ds.to_pandas().sort_values("doc_id", ignore_index=True)


@register("packed_docs", sql=r"""
WITH t AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens) / 256.0)
            AS BIGINT) AS bin_id
FROM t""")
def packed_docs(sf_dir: str) -> pd.DataFrame:
    """Sequence packing via the distributed two-level prefix scan
    (scan.pack_bins): docs concatenated in doc_id order, cut every 256
    tokens. Only per-bucket totals reach the driver. Oracle: window
    SUM OVER ORDER BY."""
    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.TOKEN_RX), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow")
    out = scan.pack_bins(ds, "doc_id", "n_tokens", budget=256,
                         bucket_width=64).to_pandas()
    return (out[["doc_id", "n_tokens", "bin_id"]]
            .sort_values("doc_id", ignore_index=True))


@register("shuffled_doc_order", sql="""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) - 1
            AS BIGINT) AS shuffle_rank
FROM documents""")
def shuffled_doc_order(sf_dir: str) -> pd.DataFrame:
    """Seeded deterministic global shuffle order (scan.shuffle_rank):
    multiplicative-hash key + two-level rank scan — reproducible
    across runs and cluster sizes, no full-dataset sort. Oracle:
    ROW_NUMBER over the identical hash expression."""
    ds = _docs(sf_dir, ["doc_id"])
    out = scan.shuffle_rank(ds, "doc_id", seed=0).to_pandas()
    return (out[["doc_id", "shuffle_rank"]]
            .sort_values("doc_id", ignore_index=True))


@register("docs_token_band", sql=r"""
WITH t AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents),
q AS (SELECT quantile_cont(n_tokens, 0.1) AS lo,
             quantile_cont(n_tokens, 0.9) AS hi FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM t, q WHERE n_tokens >= lo AND n_tokens <= hi""")
def docs_token_band(sf_dir: str) -> pd.DataFrame:
    """Percentile-band length gate (drop the shortest/longest 10% —
    the C4-style outlier filter) using EXACT global quantiles from a
    value histogram: token counts are bounded ints, so one (value,
    count) row per distinct value shuffles — never the column — and
    the driver interpolates quantile_cont to the bit. Second streaming
    pass filters against the two broadcast scalars."""
    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.TOKEN_RX), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    tok = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow")
    q = exact_quantiles_bounded(tok, "n_tokens", [0.1, 0.9])
    lo, hi = q[0.1], q[0.9]
    kept = tok.filter(
        expr=f"n_tokens >= {lo!r} and n_tokens <= {hi!r}").to_pandas()
    return kept.sort_values("doc_id", ignore_index=True)


@register("embedding_clusters")
def embedding_clusters(sf_dir: str) -> pd.DataFrame:
    """Semantic clustering (SemDeDup-style bucketing): distributed
    spherical k-means — per-iteration shuffle is k partial (sum, count)
    rows per batch, centroids broadcast once per iteration. Rows-only
    check (iterative, not SQL-expressible); determinism and
    planted-blob recovery are pytest-verified."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ann.kmeans_fit_assign(ds, n_clusters=8, n_iter=5)


@register("tfidf_top_terms", sql=r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
           FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term) AS rk FROM s)
SELECT doc_id, term AS top_term, tfidf FROM r WHERE rk = 1""")
def tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Most-distinctive term per doc by TF-IDF — the two-pass
    broadcast pattern: pass 1 reduces (term, doc-frequency) partials
    to a vocabulary-sized table (vocab << corpus even at 100 TB),
    which is ray.put ONCE and merged batch-locally in pass 2; per-doc
    term counts never shuffle at all (a doc's words live in its own
    batch)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def doc_term_tf(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna().to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        c = (pd.DataFrame({"doc_id": doc, "term": flat})
             .groupby(["doc_id", "term"], sort=False).size()
             .rename("tf").reset_index())
        c["tf"] = c["tf"].astype(np.int64)
        c["one"] = np.int64(1)
        return c

    tf = docs.map_batches(doc_term_tf, batch_format="pandas")
    dfreq = reduce_sink(tf, ["term"], {"df": ("one", "sum")}).to_pandas()
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    df_ref = ray.put(dfreq)

    class TopTerm:
        def __init__(self):
            self.dfreq = ray.get(df_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = b.merge(self.dfreq, on="term")
            m["tfidf"] = textstats.round_half_away(
                m["tf"].to_numpy(np.float64)
                * np.log(float(n_docs) / m["df"].to_numpy(np.float64)), 6)
            m = m.sort_values(["doc_id", "tfidf", "term"],
                              ascending=[True, False, True],
                              kind="mergesort")
            top = m.groupby("doc_id", sort=False).head(1)
            return top.rename(columns={"term": "top_term"})[
                ["doc_id", "top_term", "tfidf"]]

    # Per-batch top-1 is a PARTIAL (dynamic block splitting can cut a
    # doc's tf rows across blocks); final combine over ≤2 candidate
    # rows per doc resolves it exactly.
    cand = tf.map_batches(TopTerm, concurrency=2,
                          batch_format="pandas").to_pandas()
    cand = cand.sort_values(["doc_id", "tfidf", "top_term"],
                            ascending=[True, False, True],
                            kind="mergesort")
    return (cand.groupby("doc_id", sort=False).head(1)
            .reset_index(drop=True))


@register("value_quantiles_by_type", sql="""
SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type""")
def value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-group quantiles: shuffle by the (low-cardinality) group
    key, one vectorized np.quantile per group — linear interpolation,
    matching SQL quantile_cont. Partitioning note: exact quantiles need
    a key's values co-located; for high-cardinality keys at 100 TB use a
    mergeable sketch (t-digest) as partial-per-batch instead."""
    ds = _events(sf_dir, ["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        p50, p95 = np.quantile(v, [0.5, 0.95], method="linear")
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "p50": [round(float(p50), 6)],
                             "p95": [round(float(p95), 6)]})

    out = (ds.groupby("event_type").map_groups(q, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_type", ignore_index=True)


# --- sketch-based approximate variants (the high-cardinality scale path:
#     fixed-size mergeable partials shuffle, never the values) -------------

@register("distinct_users_hll")
def distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate global distinct via HyperLogLog (p=14, ~0.8% err):
    one 16 KiB register array per batch, elementwise-max merge — at 10^9
    users only B tiny partials move, vs the exact two-phase shuffle."""
    from webalizer_ray.stages.sketch import HyperLogLog

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["user_id"].to_numpy())
        return pd.DataFrame(
            {"hll": [HyperLogLog.from_hashes(h).to_bytes()]})

    parts = _events(sf_dir, ["user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    sk = HyperLogLog()
    for blob in parts["hll"]:
        sk = sk.merge(HyperLogLog.from_bytes(blob))
    return pd.DataFrame({"users_approx":
                         np.array([int(round(sk.count()))], dtype=np.int64)})


@register("value_quantiles_sketch")
def value_quantiles_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate per-group quantiles via mergeable t-digests: per-batch
    per-key digests (O(δ) bytes) → groupby(key) digest merge → quantile.
    The key's raw values never co-locate — the scale path the exact
    value_quantiles_by_type docstring points at."""
    from webalizer_ray.stages.sketch import TDigest

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = [(et, TDigest.from_values(g["value"].to_numpy()).to_bytes())
                for et, g in df.groupby("event_type", sort=False)]
        return pd.DataFrame(rows, columns=["event_type", "td"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        sk = TDigest()
        for blob in g["td"]:
            sk = sk.merge(TDigest.from_bytes(blob))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50_approx": [round(sk.quantile(0.5), 6)],
            "p95_approx": [round(sk.quantile(0.95), 6)]})

    out = (_events(sf_dir, ["event_type", "value"])
           .map_batches(partial, batch_format="pandas")
           .groupby("event_type").map_groups(combine,
                                             batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_type", ignore_index=True)


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only: binary payloads, actor-pool decode)
# ---------------------------------------------------------------------------

def _media_ds(n: int = 96):
    from webalizer_ray.stages.multimodal import MEDIA_TABLE_VERSION, \
        synth_media_table
    # per-user dir + generator-version tag in the name: a schema change in
    # a future version, another user's file, or a stale tmp-cleaner
    # leftover can never be served as this version's fixture
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_media_u{uid}_v{MEDIA_TABLE_VERSION}_{n}")
    marker = os.path.join(d, "media.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".media-{os.getpid()}.tmp")
        pq.write_table(synth_media_table(n), tmp)
        os.replace(tmp, marker)
    return rd.read_parquet(marker)


@register("media_image_features")
def media_image_features(sf_dir: str) -> pd.DataFrame:
    """Actor-pool decode stage over opaque binary payloads (deterministic
    fake decoder; real codec drops into DecodeImage.__init__)."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        DecodeImage,
    )
    feats = _media_ds().map_batches(
        DecodeImage, fn_constructor_kwargs=dict(fake_decoder=True),
        concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    out = feats.to_pandas()
    out["feat_mean"] = np.stack(out["features"].to_numpy()) \
        .mean(axis=1).round(6)
    return out[["media_id", "kind", "feat_mean"]] \
        .sort_values("media_id", ignore_index=True)


@register("media_audio_features")
def media_audio_features(sf_dir: str) -> pd.DataFrame:
    """REAL audio decode (pure-numpy RIFF/WAVE PCM chunk walker) in an
    actor-pool stage: duration, RMS, zero-crossing rate, peak — no fake
    path needed, every audio payload in the fixture is genuine WAV."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        DecodeAudio,
    )
    feats = _media_ds().map_batches(
        DecodeAudio, concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    out = feats.to_pandas()
    for c in ["duration_s", "rms", "zcr", "peak"]:
        out[c] = out[c].round(6)
    return out.sort_values("media_id", ignore_index=True)


@register("media_audio_spectral")
def media_audio_spectral(sf_dir: str) -> pd.DataFrame:
    """REAL spectral analysis (numpy rFFT over decoded PCM — no codec
    library involved): dominant frequency, spectral centroid and 85%
    rolloff per audio payload. The fixture's sines make the dominant
    frequency verifiable to one FFT bin in tests."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        SpectralFeatures,
    )
    feats = _media_ds().map_batches(
        SpectralFeatures, concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    out = feats.to_pandas()
    for c in ["dominant_hz", "centroid_hz", "rolloff_hz"]:
        out[c] = out[c].round(4)
    return out.sort_values("media_id", ignore_index=True)


@register("media_frame_sample")
def media_frame_sample(sf_dir: str) -> pd.DataFrame:
    """Flat-map actor stage: video payload → n_frames feature rows."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        FrameSample,
    )
    frames = _media_ds().map_batches(
        FrameSample, fn_constructor_kwargs=dict(fake_decoder=True,
                                                n_frames=4),
        concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    out = frames.to_pandas()
    out["feat0"] = np.stack(out["features"].to_numpy())[:, 0].round(6)
    return out[["media_id", "frame_idx", "feat0"]] \
        .sort_values(["media_id", "frame_idx"], ignore_index=True)


_FLAGSHIP_CACHE: dict[str, dict] = {}


def _flagship_sinks(sf_dir: str) -> dict:
    """Run the flagship once per sf_dir per process; serve every
    flagship_* query from the same sinks (one pipeline, many sinks —
    that IS the fan-out routing)."""
    key = os.path.realpath(sf_dir)
    if key not in _FLAGSHIP_CACHE:
        from webalizer_ray.pipelines.flagship import run_flagship
        from webalizer_ray.sources.events_adapter import (
            ROLE_GROUPS,
            TOOL_CATEGORIES,
            events_to_turns,
        )
        work = tempfile.mkdtemp(prefix="wr_flagship_")
        turns_dir = os.path.join(work, "in", "turns")
        os.makedirs(turns_dir, exist_ok=True)
        events_to_turns(sf_dir).write_parquet(turns_dir)
        res = run_flagship(os.path.join(work, "in"),
                           os.path.join(work, "out"),
                           lookups=(TOOL_CATEGORIES, ROLE_GROUPS))
        _FLAGSHIP_CACHE[key] = res["sinks"]
    return _FLAGSHIP_CACHE[key]


_FLAGSHIP_T_SQL = """
SELECT 'u' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
       event_id, ts, strftime(ts, '%Y-%m') AS month,
       CASE event_type WHEN 'signup' THEN 'system'
            WHEN 'purchase' THEN 'assistant' WHEN 'error' THEN 'tool'
            ELSE 'user' END AS role,
       CASE event_type WHEN 'signup' THEN 206 WHEN 'error' THEN 500
            ELSE 200 END AS status,
       CASE event_type WHEN 'click' THEN 'browse'
            WHEN 'purchase' THEN 'checkout' WHEN 'error' THEN 'probe'
            ELSE NULL END AS tool_norm,
       ROUND(value, 2) AS kb
FROM events"""


@register("flagship_monthly", sql=f"""
WITH t AS ({_FLAGSHIP_T_SQL}),
marks AS (SELECT month, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                 OR strftime(prev_ts, '%Y-%m') <> month
                 THEN 1 ELSE 0 END AS ns
          FROM (SELECT month, ts,
                       LAG(ts) OVER (PARTITION BY conv_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM t)),
sess AS (SELECT month, CAST(SUM(ns) AS BIGINT) AS sessions FROM marks
         GROUP BY month),
agg AS (SELECT month, COUNT(*) AS hits,
               CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
                   AS files,
               CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pages,
               ROUND(SUM(kb), 2) AS kb,
               COUNT(DISTINCT conv_id) AS convs,
               COUNT(DISTINCT tool_norm) AS tools
        FROM t GROUP BY month)
SELECT agg.month AS month, hits, files, pages, kb, convs, tools, sessions
FROM agg JOIN sess ON agg.month = sess.month""")
def flagship_monthly(sf_dir: str) -> pd.DataFrame:
    """Full flagship pipeline over events adapted to the turns schema."""
    out = _flagship_sinks(sf_dir)["monthly"].copy()
    out["kb"] = out["kb"].round(2)
    return out[["month", "hits", "files", "pages", "kb", "convs", "tools",
                "sessions"]]


_FLAGSHIP_SESS_SQL = f"""
m AS (SELECT conv_id, event_id, ts, month, tool_norm,
             CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                  OR strftime(prev_ts, '%Y-%m') <> month
                  THEN 1 ELSE 0 END AS ns
      FROM (SELECT conv_id, event_id, ts, month, tool_norm,
                   LAG(ts) OVER (PARTITION BY conv_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM t)),
s AS (SELECT conv_id, event_id, ts, tool_norm,
             SUM(ns) OVER (PARTITION BY conv_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
per_sess AS (SELECT conv_id, sid,
                    FIRST(tool_norm ORDER BY ts, event_id)
                        FILTER (WHERE tool_norm IS NOT NULL) AS entry_tool,
                    LAST(tool_norm ORDER BY ts, event_id)
                        FILTER (WHERE tool_norm IS NOT NULL) AS exit_tool
             FROM s GROUP BY conv_id, sid)"""


@register("flagship_per_tool", sql=f"""
WITH t AS ({_FLAGSHIP_T_SQL}),
{_FLAGSHIP_SESS_SQL},
hits AS (SELECT tool_norm, COUNT(*) AS hits, ROUND(SUM(kb), 2) AS kb
         FROM t WHERE tool_norm IS NOT NULL GROUP BY tool_norm),
en AS (SELECT entry_tool AS tool_norm, COUNT(*) AS entry FROM per_sess
       WHERE entry_tool IS NOT NULL GROUP BY 1),
ex AS (SELECT exit_tool AS tool_norm, COUNT(*) AS exit FROM per_sess
       WHERE exit_tool IS NOT NULL GROUP BY 1)
SELECT h.tool_norm AS tool_norm, h.hits AS hits, h.kb AS kb,
       COALESCE(en.entry, 0) AS entry, COALESCE(ex.exit, 0) AS exit
FROM hits h LEFT JOIN en USING (tool_norm) LEFT JOIN ex USING (tool_norm)""")
def flagship_per_tool(sf_dir: str) -> pd.DataFrame:
    """Per-tool sink (A5 per-URL analog) incl. session entry/exit
    attribution (W2 update_entry/update_exit analog)."""
    out = _flagship_sinks(sf_dir)["per_tool"].copy()
    out["kb"] = out["kb"].round(2)
    return out[["tool_norm", "hits", "kb", "entry", "exit"]] \
        .sort_values("tool_norm", ignore_index=True)


@register("flagship_hourly", sql=f"""
WITH t AS ({_FLAGSHIP_T_SQL})
SELECT CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS hits,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
           AS files,
       CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
           AS pages,
       ROUND(SUM(kb), 2) AS kb
FROM t GROUP BY hour""")
def flagship_hourly(sf_dir: str) -> pd.DataFrame:
    """Hourly table (A3, th_* arrays analog) from the flagship run."""
    out = _flagship_sinks(sf_dir)["hourly"].copy()
    out["kb"] = out["kb"].round(2)
    out["hour"] = out["hour"].astype(np.int64)
    return out[["hour", "hits", "files", "pages", "kb"]] \
        .sort_values("hour", ignore_index=True)


@register("flagship_status_class", sql=f"""
WITH t AS ({_FLAGSHIP_T_SQL})
SELECT CASE WHEN status // 100 = 2 THEN 'success'
            WHEN status // 100 = 3 THEN 'redirect'
            WHEN status // 100 = 4 THEN 'client_error'
            WHEN status // 100 = 5 THEN 'server_error'
            ELSE 'other' END AS status_class,
       COUNT(*) AS hits
FROM t GROUP BY status_class""")
def flagship_status_class(sf_dir: str) -> pd.DataFrame:
    """Response-class histogram (A7, response[TOTAL_RC] analog)."""
    out = _flagship_sinks(sf_dir)["status_class_hist"].copy()
    return out[["status_class", "hits"]] \
        .sort_values("status_class", ignore_index=True)



@register("flagship_monthly_extremes", sql=f"""
WITH t AS ({_FLAGSHIP_T_SQL}),
d AS (SELECT strftime(ts, '%Y-%m') AS month,
             strftime(ts, '%Y-%m-%d') AS date,
             COUNT(*) AS hits, ROUND(SUM(kb), 2) AS kb
      FROM t GROUP BY 1, 2)
SELECT month, CAST(MAX(hits) AS BIGINT) AS max_hits_day,
       ROUND(AVG(hits), 2) AS avg_hits_day,
       ROUND(MAX(kb), 2) AS max_kb_day
FROM d GROUP BY month""")
def flagship_monthly_extremes(sf_dir: str) -> pd.DataFrame:
    """A9 max/avg derivations (mh_hit / avg-per-day trackers, computed
    by output.c from the tm_* arrays [verify]); avg is over days with
    data, matching the finalize-side definition."""
    out = _flagship_sinks(sf_dir)["monthly_extremes"].copy()
    return out.sort_values("month", ignore_index=True)


@register("strict_seq_drops", sql="""
SELECT user_id, CAST(SUM(CASE WHEN prev_max IS NOT NULL AND ts < prev_max
                              THEN 1 ELSE 0 END) AS BIGINT) AS dropped
FROM (SELECT user_id, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY value, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
      FROM events)
GROUP BY user_id""")
def strict_seq_drops(sf_dir: str) -> pd.DataFrame:
    """W4 out-of-sequence drop rule (webalizer.c sequence check ≈3460
    [verify]): a record older than the per-stream running max timestamp
    is dropped and counted (total_ignore analog). Vectorized per
    user-hash bucket: running cummax over event_id order."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def count_drops(g: pd.DataFrame) -> pd.DataFrame:
        # "value" stands in for an out-of-order replay feed
        g = g.sort_values(["user_id", "value", "event_id"], kind="mergesort")
        runmax = g.groupby("user_id", sort=False)["ts"].cummax()
        first = ~g["user_id"].duplicated()
        dropped = (g["ts"] < runmax) & ~first
        out = dropped.groupby(g["user_id"], sort=False).sum() \
            .rename("dropped").reset_index()
        out["dropped"] = out["dropped"].astype(np.int64)
        return out

    out = (ds.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_").map_groups(count_drops, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id", ignore_index=True)


@register("fold_seq_sessions", sql="""
SELECT user_id, CAST(SUM(ns) AS BIGINT) AS sessions FROM (
  SELECT user_id, CASE WHEN prev_ts IS NULL
       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
       OR epoch_us(ts) < epoch_us(prev_ts)
       THEN 1 ELSE 0 END AS ns
  FROM (SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY value, event_id)
                   AS prev_ts
        FROM events))
GROUP BY user_id""")
def fold_seq_sessions(sf_dir: str) -> pd.DataFrame:
    """W4 FoldSeqErr fold variant: over an out-of-order feed ("value"
    stands in for feed order, as in strict_seq_drops), a backwards time
    jump FLUSHES the current session and restarts — counted as a new
    session instead of a dropped record."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def count_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0) | (gap_s < 0)
        out = ns.groupby(g["user_id"], sort=False).sum() \
            .rename("sessions").reset_index()
        out["sessions"] = out["sessions"].astype(np.int64)
        return out

    out = (ds.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_").map_groups(count_sessions,
                                          batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id", ignore_index=True)


@register("ann_topk_ivf")
def ann_topk_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-cell approximate variant of ann_topk (scale path #2)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.ivf_topk(ds, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out.sort_values(["query_id", "rank"], ignore_index=True)


@register("tumbling_6h_events", sql="""
SELECT CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS win, COUNT(*) AS hits,
       ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY win""")
def tumbling_6h_events(sf_dir: str) -> pd.DataFrame:
    """Tumbling 6-hour window aggregate (generalizes the reference's
    fixed hourly/daily/monthly tumbling tables to arbitrary widths)."""
    def win(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64())  # µs since epoch
        w = pc.divide(epoch, 21_600_000_000)
        return batch.append_column("win", pc.cast(w, pa.int64()))

    ds = _events(sf_dir, ["ts", "value"]).map_batches(
        win, batch_format="pyarrow")
    out = reduce_sink(ds, ["win"], {"hits": ("ts", "size"),
                                    "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("win", ignore_index=True)


@register("rolling_7d_events", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS date, COUNT(*) AS hits
           FROM events GROUP BY date)
SELECT date, hits,
       CAST(SUM(hits) OVER (ORDER BY date
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hits_7d
FROM d""")
def rolling_7d_events(sf_dir: str) -> pd.DataFrame:
    """Sliding 7-day window over the DAILY aggregate: the distributed
    part collapses to one row per day (reduce_sink), then the window
    runs over the tiny result — a rolling window never needs to touch
    the wide data."""
    ds = _events(sf_dir, ["ts"]).map_batches(
        _with_time_cols({"date"}), batch_format="pyarrow")
    d = reduce_sink(ds, ["date"], {"hits": ("ts", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    d["hits_7d"] = d["hits"].rolling(7, min_periods=1).sum().astype(np.int64)
    return d[["date", "hits", "hits_7d"]]


@register("sliding_1h_events", sql="""
WITH e AS (SELECT epoch_us(ts) // 1800000000 AS j, value FROM events)
SELECT win, COUNT(*) AS hits, ROUND(SUM(value), 2) AS value_sum
FROM (SELECT j AS win, value FROM e
      UNION ALL SELECT j - 1 AS win, value FROM e)
GROUP BY win""")
def sliding_1h_events(sf_dir: str) -> pd.DataFrame:
    """SLIDING event-time window (width 1 h, slide 30 min): window ``win``
    covers [win·30 min, win·30 min + 1 h), so each event belongs to
    exactly width/slide = 2 windows. Expressed as a per-batch flat-map
    (each row duplicated into its covering windows — vectorized concat,
    no Python loop) followed by the standard partial/combine aggregate;
    the expansion factor is the window overlap, never N²."""
    def expand(batch: pa.Table) -> pa.Table:
        j = np.asarray(pc.cast(batch["ts"], pa.int64())) // 1_800_000_000
        v = np.asarray(batch["value"])
        return pa.table({
            "win": pa.array(np.concatenate([j, j - 1]), pa.int64()),
            "value": pa.array(np.concatenate([v, v])),
        })

    ds = _events(sf_dir, ["ts", "value"]).map_batches(
        expand, batch_format="pyarrow")
    out = reduce_sink(ds, ["win"], {"hits": ("win", "size"),
                                    "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("win", ignore_index=True)


@register("mktsegment_order_totals", sql="""
SELECT c_mktsegment, COUNT(*) AS orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""")
def mktsegment_order_totals(sf_dir: str) -> pd.DataFrame:
    """Distributed hash join (Dataset.join) — beyond the reference,
    which has no relational joins (SURVEY.md §2.4): orders ⋈ customer
    on custkey, then the standard partial-combine aggregate. For a
    small build side prefer the broadcast-dict pattern (J1/J2); this
    exercises the real shuffle join for when both sides are big."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    out = reduce_sink(joined, ["c_mktsegment"],
                      {"orders": ("o_custkey", "size"),
                       "total_price": ("o_totalprice", "sum")}).to_pandas()
    out["total_price"] = out["total_price"].round(2)
    return out.sort_values("c_mktsegment", ignore_index=True)

@register("tpch_q3_top_orders", sql="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10""")
def tpch_q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3-shaped multi-join pipeline: both row predicates are
    pushed INTO the parquet scan (``filter=`` prunes row groups before
    bytes leave storage, ``columns=`` prunes the rest), the pruned
    sides meet in two distributed hash joins, and only (orderkey,
    revenue) partials reach the top-10. Join order: customer⋈orders
    first (smallest intermediate), its result ⋈ lineitem."""
    import datetime as _dt
    import pyarrow.dataset as pds
    pivot = _dt.datetime(1997, 6, 1)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"],
                           filter=pds.field("c_mktsegment") == "BUILDING")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"],
                             filter=pds.field("o_orderdate") < pivot)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"],
                         filter=pds.field("l_shipdate") > pivot)
    sel = orders.join(cust, join_type="inner", num_partitions=8,
                      on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(sel.select_columns(["o_orderkey", "o_orderdate"]),
                join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "o_orderdate": batch["o_orderdate"],
                         "rev": rev})

    agg = reduce_sink(j.map_batches(revenue, batch_format="pyarrow"),
                      ["l_orderkey", "o_orderdate"],
                      {"revenue": ("rev", "sum")}).to_pandas()
    agg["revenue"] = agg["revenue"].round(2)
    top = (agg.sort_values(["revenue", "l_orderkey"],
                           ascending=[False, True], kind="mergesort")
           .head(10).reset_index(drop=True))
    top["orderdate"] = top.pop("o_orderdate").dt.strftime("%Y-%m-%d")
    return top[["l_orderkey", "revenue", "orderdate"]]


# ---------------------------------------------------------------------------
# Relational operators Ray Data lacks natively, re-expressed as scale-safe
# compositions (grouped top-N, pivot, rollup, anti-join, window functions,
# as-of join, band join). Each documents the partitioning assumption.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register("top_users_per_type", sql="""
WITH agg AS (SELECT event_type, user_id, ROUND(SUM(value), 2) AS value_sum
             FROM events GROUP BY event_type, user_id),
r AS (SELECT event_type, user_id, value_sum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value_sum DESC, user_id) AS rn
      FROM agg)
SELECT event_type, user_id, value_sum FROM r WHERE rn <= 2""")
def top_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped top-N (K1 generalized to top-k PER GROUP, which the
    reference's qsort'd global tables never need). Scale shape: the
    (event_type, user_id) aggregate ships only reduce_sink partials;
    a per-batch local top-k then bounds the per-group final combine to
    k rows per (batch, group) — the full aggregate never gathers."""
    agg = reduce_sink(_events(sf_dir, ["event_type", "user_id", "value"]),
                      ["event_type", "user_id"],
                      {"value_sum": ("value", "sum")})

    def localtop(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_sum"] = df["value_sum"].round(2)
        return (df.sort_values(["value_sum", "user_id"],
                               ascending=[False, True], kind="mergesort")
                .groupby("event_type", sort=False).head(2))

    out = (agg.map_batches(localtop, batch_format="pandas")
           .groupby("event_type")
           .map_groups(localtop, batch_format="pandas")).to_pandas()
    return out.sort_values(["event_type", "user_id"], ignore_index=True)


@register("hour_type_pivot", sql="""
SELECT CAST(hour(ts) AS BIGINT) AS hour, """ + ", ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) "
    f"AS {t}_hits" for t in _EVENT_TYPES) + """
FROM events GROUP BY hour""")
def hour_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot / crosstab (hour x event_type): indicator columns added per
    batch (Arrow kernels), then the ordinary partial-combine aggregate —
    a pivot is just a multi-column combiner, no extra shuffle."""
    def widen(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "hour", pc.cast(pc.hour(batch["ts"]), pa.int64()))
        et = batch["event_type"]
        for t in _EVENT_TYPES:
            batch = batch.append_column(
                f"{t}_hits", pc.cast(pc.equal(et, t), pa.int64()))
        return batch.drop_columns(["ts", "event_type"])

    ds = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(widen, batch_format="pyarrow")
    spec = {f"{t}_hits": (f"{t}_hits", "sum") for t in _EVENT_TYPES}
    out = reduce_sink(ds, ["hour"], spec).to_pandas()
    return out.sort_values("hour", ignore_index=True)


@register("events_rollup", sql="""
SELECT COALESCE(month, 'ALL') AS month,
       COALESCE(event_type, 'ALL') AS event_type,
       CAST(hits AS BIGINT) AS hits, ROUND(value_sum, 2) AS value_sum
FROM (SELECT strftime(ts, '%Y-%m') AS month, event_type,
             COUNT(*) AS hits, SUM(value) AS value_sum
      FROM events GROUP BY ROLLUP(month, event_type))""")
def events_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP / grouping sets: one distributed pass computes the finest
    (month, event_type) level; the coarser levels are derived from those
    already-tiny partials on the driver (sums of sums), never from a
    second scan. 'ALL' stands in for the aggregated-out key."""
    ds = _events(sf_dir, ["ts", "value", "event_type"]).map_batches(
        _with_time_cols({"month"}), batch_format="pyarrow")
    fine = reduce_sink(ds, ["month", "event_type"],
                       {"hits": ("value", "size"),
                        "value_sum": ("value", "sum")}).to_pandas()
    mid = fine.groupby("month", as_index=False).agg(
        hits=("hits", "sum"), value_sum=("value_sum", "sum"))
    mid["event_type"] = "ALL"
    top = pd.DataFrame({"month": ["ALL"], "event_type": ["ALL"],
                        "hits": [fine["hits"].sum()],
                        "value_sum": [fine["value_sum"].sum()]})
    out = pd.concat([fine, mid, top], ignore_index=True)[
        ["month", "event_type", "hits", "value_sum"]]
    out["hits"] = out["hits"].astype(np.int64)
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values(["month", "event_type"], ignore_index=True)


@register("users_no_purchase", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS users FROM (
  SELECT user_id FROM events GROUP BY user_id
  HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0)""")
def users_no_purchase(sf_dir: str) -> pd.DataFrame:
    """Distributed anti-join (users with events but never a purchase).
    No driver-side membership set: the per-user any-purchase flag is a
    reduce_sink max over indicator partials; the final count sums tiny
    per-batch counts — at 10^9 users nothing but partials move."""
    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_p", pc.cast(pc.equal(batch["event_type"], "purchase"),
                            pa.int64())).drop_columns(["event_type"])

    per_user = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(flag, batch_format="pyarrow"),
        ["user_id"], {"has_p": ("is_p", "max")})

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"users": [np.int64((df["has_p"] == 0).sum())]})

    n = per_user.map_batches(cnt, batch_format="pandas") \
        .to_pandas()["users"].sum()
    return pd.DataFrame({"users": [np.int64(n)]})


@register("user_running_value", sql="""
SELECT event_id,
       ROUND(SUM(value) OVER w, 2) AS run_sum,
       CAST(COALESCE(date_diff('microsecond', lag(ts) OVER w, ts), -1)
            AS BIGINT) AS prev_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)""")
def user_running_value(sf_dir: str) -> pd.DataFrame:
    """SQL window functions (running SUM + LAG) as a partitioned
    operator: hash users into buckets, one vectorized sort + grouped
    cumsum/shift per bucket. Partitioning assumption: a user's full
    history fits one group — the same assumption sessionization makes."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        run = g.groupby("user_id", sort=False)["value"].cumsum().round(2)
        ts_us = pd.Series(
            g["ts"].to_numpy("datetime64[us]").astype(np.int64),
            index=g.index)
        same = g["user_id"].eq(g["user_id"].shift())
        gap = (ts_us - ts_us.shift()).where(same, -1).astype(np.int64)
        return pd.DataFrame({"event_id": g["event_id"], "run_sum": run,
                             "prev_gap_us": gap})

    out = (ds.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_").map_groups(running, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("event_id", ignore_index=True)


@register("asof_last_view_gap", sql="""
SELECT p.event_id, p.user_id,
       CAST(COALESCE(date_diff('microsecond', v.ts, p.ts), -1) AS BIGINT)
         AS gap_us
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events
                WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts""")
def asof_last_view_gap(sf_dir: str) -> pd.DataFrame:
    """As-of join (each purchase ↔ the latest view at ts <= purchase.ts
    by the same user) — an operator Ray Data has no kernel for. Both
    sides hash-partition on user; within a bucket one vectorized
    pd.merge_asof(by=user) resolves every user at once. Gap is exact µs
    so equal-ts ties are value-identical regardless of which duplicate
    the oracle picks; -1 marks purchases with no prior view."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("purchase", "view"))].copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]] \
            .sort_values("ts", kind="mergesort")
        v = g[g["event_type"] == "view"][["user_id", "ts"]] \
            .sort_values("ts", kind="mergesort") \
            .rename(columns={"ts": "vts"})
        m = pd.merge_asof(p, v, left_on="ts", right_on="vts", by="user_id",
                          direction="backward")
        pus = m["ts"].to_numpy("datetime64[us]").astype(np.int64)
        vus = m["vts"].to_numpy("datetime64[us]").astype(np.int64)
        gap = np.where(m["vts"].isna(), np.int64(-1), pus - vus) \
            .astype(np.int64)
        return pd.DataFrame({"event_id": m["event_id"],
                             "user_id": m["user_id"], "gap_us": gap})

    out = (ds.map_batches(keep_bucket, batch_format="pandas")
           .groupby("bucket_").map_groups(asof, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("event_id", ignore_index=True)


@register("orders_nearby_7d", sql="""
SELECT a.o_orderkey, CAST(COUNT(b.o_orderkey) AS BIGINT) AS nearby
FROM orders a LEFT JOIN orders b
  ON a.o_custkey = b.o_custkey AND b.o_orderkey <> a.o_orderkey
 AND b.o_orderdate >= a.o_orderdate - INTERVAL 7 DAY
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
GROUP BY a.o_orderkey""")
def orders_nearby_7d(sf_dir: str) -> pd.DataFrame:
    """Band (interval) join: per order, how many OTHER orders by the same
    customer landed within ±7 days. Scale shape: bucket time into
    band-width (7 d) buckets; probe rows keep their bucket, build rows
    replicate to the 3 adjacent buckets, so every qualifying pair meets
    in EXACTLY one (custkey, bucket) group and the pairwise check runs
    on tiny per-customer-per-fortnight groups — never all-to-all."""
    week_us = 7 * 86400 * 10**6
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        us = df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
        base = {"o_custkey": df["o_custkey"].to_numpy(),
                "key": df["o_orderkey"].to_numpy(), "us": us}
        b = us // week_us
        parts = [pd.DataFrame({**base, "bucket": b, "side": np.int8(0)})]
        parts += [pd.DataFrame({**base, "bucket": b + d, "side": np.int8(1)})
                  for d in (-1, 0, 1)]
        return pd.concat(parts, ignore_index=True)

    def count_nearby(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        if not len(left):
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "nearby": pd.Series([], dtype=np.int64)})
        right = g[g["side"] == 1]
        lus = left["us"].to_numpy()[:, None]
        rus = right["us"].to_numpy()[None, :]
        ok = (np.abs(lus - rus) <= week_us) \
            & (left["key"].to_numpy()[:, None]
               != right["key"].to_numpy()[None, :])
        return pd.DataFrame({"o_orderkey": left["key"].to_numpy(),
                             "nearby": ok.sum(axis=1).astype(np.int64)})

    out = (orders.map_batches(expand, batch_format="pandas")
           .groupby(["o_custkey", "bucket"])
           .map_groups(count_nearby, batch_format="pandas")).to_pandas()
    return out.sort_values("o_orderkey", ignore_index=True)


# ---------------------------------------------------------------------------
# Training-data ops round 2: decontamination, bloom semi-join prune,
# heavy-hitters sketch, per-group mixture rebalancing
# ---------------------------------------------------------------------------

@register("decontaminated_train_docs", sql="""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
sh AS (
  SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS sh
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-4)) AS i) g
)
SELECT DISTINCT a.doc_id FROM sh a
WHERE a.doc_id % 10 < 8
AND EXISTS (SELECT 1 FROM sh b WHERE b.doc_id % 10 >= 8 AND b.sh = a.sh)
ORDER BY doc_id""")
def decontaminated_train_docs(sf_dir: str) -> pd.DataFrame:
    """Train/test decontamination: train-split docs sharing any word
    5-gram with a val-split doc (split = same deterministic doc_id rule
    as train_val_split_counts). Only (int64 id, int64 shingle-hash) rows
    shuffle; the overlap is a bucketed hash join — see
    dedup.ngram_decontaminate."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def split_filter(is_train: bool):
        def f(batch: pa.Table) -> pa.Table:
            frac = np.asarray(batch["doc_id"]) % 10
            return batch.filter(pa.array(
                frac < 8 if is_train else frac >= 8))
        return f

    train = docs.map_batches(split_filter(True), batch_format="pyarrow")
    val = docs.map_batches(split_filter(False), batch_format="pyarrow")
    return dedup.ngram_decontaminate(train, val, n=5)


@register("urgent_lineitem_qty", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS qty_sum
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'""")
def urgent_lineitem_qty(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter semi-join prune ahead of a distributed join: the
    small side (urgent orders) collapses to per-batch Bloom partials
    (128 KiB bit arrays, OR-merged on the driver, broadcast once via
    ray.put); the big side (lineitem) drops non-matching rows AT THE
    SCAN, so only ~1/5 of the fact table enters the exact hash join
    that removes Bloom false positives. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the semi-join survivors."""
    from webalizer_ray.stages.sketch import BloomFilter
    import ray as _ray

    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
                       .select(["o_orderkey"]),
            batch_format="pyarrow").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(log2m=20).add_hashes(
            pd.util.hash_array(df["o_orderkey"].to_numpy()))
        return pd.DataFrame({"bf": [bf.to_bytes()]})

    bf = BloomFilter(log2m=20)
    for blob in urgent.map_batches(partial,
                                   batch_format="pandas").to_pandas()["bf"]:
        bf = bf.merge(BloomFilter.from_bytes(blob, log2m=20))
    bf_ref = _ray.put(bf)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        f = _ray.get(bf_ref)
        keep = f.contains_hashes(
            pd.util.hash_array(df["l_orderkey"].to_numpy()))
        return df[keep]

    survivors = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"]) \
        .map_batches(prune, batch_format="pandas")
    build = urgent.map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")
    joined = survivors.join(build, join_type="inner", num_partitions=8,
                            on=("l_orderkey",))
    agg = reduce_sink(joined.map_batches(
        lambda df: df.assign(_g=np.int32(0)), batch_format="pandas"),
        ["_g"], {"n_rows": ("l_orderkey", "size"),
                 "qty_sum": ("l_quantity", "sum")}).to_pandas()
    return pd.DataFrame({
        "n_rows": agg["n_rows"].astype(np.int64).to_numpy(),
        "qty_sum": agg["qty_sum"].round(2).to_numpy()})


@register("heavy_hitter_users")
def heavy_hitter_users(sf_dir: str) -> pd.DataFrame:
    """Approximate top-10 users by event count via mergeable Misra-Gries
    summaries (capacity 48): each batch collapses its exact counts to
    ≤48 (key, count) entries, the driver merges B tiny summaries — at
    10^9 users nothing key-shaped ever shuffles or gathers. est ≤ true
    ≤ est_hi = est + err (bounds checked by test_sketch accuracy tests
    against the exact reduce_sink path)."""
    from webalizer_ray.stages.sketch import MisraGries

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, counts = np.unique(df["user_id"].to_numpy(),
                                 return_counts=True)
        return pd.DataFrame({"mg": [MisraGries.from_counts(
            keys, counts, capacity=48).to_bytes()]})

    parts = _events(sf_dir, ["user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    sk = MisraGries(capacity=48)
    for blob in parts["mg"]:
        sk = sk.merge(MisraGries.from_bytes(blob, capacity=48))
    rows = sk.top(10)
    return pd.DataFrame({
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "est": np.array([r[1] for r in rows], dtype=np.int64),
        "est_hi": np.array([r[2] for r in rows], dtype=np.int64)})


@register("mixture_rebalance_counts", sql="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs
FROM documents
WHERE ((doc_id % 1000003) * 2654435761) % 100
      < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
GROUP BY lang ORDER BY lang""")
def mixture_rebalance_counts(sf_dir: str) -> pd.DataFrame:
    """Per-group stratified sampling for dataset mixture rebalancing:
    downsample the dominant language to 10%, keep 50% of the rest —
    membership is a pure deterministic function of the stable doc id
    (Knuth multiplicative hash), so the sample is reproducible across
    runs and cluster sizes and needs NO shuffle: each batch filters its
    own rows; only per-batch count partials move."""
    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"])
        frac = ((ids % 1000003) * 2654435761) % 100
        lim = np.where(np.asarray(batch["lang"]) == "en", 10, 50)
        return batch.filter(pa.array(frac < lim))

    ds = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        keep, batch_format="pyarrow")
    out = reduce_sink(ds, ["lang"], {"docs": ("lang", "size")}).to_pandas()
    out["docs"] = out["docs"].astype(np.int64)
    return out.sort_values("lang", ignore_index=True)


# ---------------------------------------------------------------------------
# Corpus language modeling: unigram LM scoring + vocabulary building
# ---------------------------------------------------------------------------

def _word_count_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch (word, count) partials — the combiner ahead of the
    vocabulary groupby, so one row per distinct (word, batch) shuffles,
    never one per token occurrence."""
    vc = df["text"].fillna("").str.split().explode().dropna().value_counts()
    return pd.DataFrame({"word": vc.index.to_numpy(),
                         "cnt": vc.to_numpy(np.int64)})


@register("unigram_nll_docs", sql=r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c)
SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-AVG(LN(c.cnt / t.tot)), 6) AS nll
FROM w JOIN c USING (word), t
GROUP BY w.doc_id""")
def unigram_nll_docs(sf_dir: str) -> pd.DataFrame:
    """Unigram language-model scoring (mean negative log-likelihood
    per doc) — the cheap perplexity-style quality signal CCNet/Gopher
    pipelines gate on. Two passes: pass 1 reduces (word, count)
    partials to the vocabulary table (vocab << corpus), whose log-prob
    column is ray.put ONCE; pass 2 scores each doc batch-locally via a
    hash-map lookup on the exploded word array (docs read straight
    from parquet never span batches). Only vocabulary-sized state ever
    reaches the driver besides the per-doc result itself."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    vocab = reduce_sink(docs.map_batches(_word_count_partials,
                                         batch_format="pandas"),
                        ["word"], {"cnt": ("cnt", "sum")}).to_pandas()
    tot = float(vocab["cnt"].sum())
    # identical float path to the oracle: LN(cnt / tot), not ln-diff
    logp_ref = ray.put(pd.Series(
        np.log(vocab["cnt"].to_numpy(np.float64) / tot),
        index=vocab["word"].to_numpy()))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # stateless task: the log-prob table is a local object-store
        # read per batch (shared memory), no actor-pool spinup
        logp = ray.get(logp_ref)
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        lp = flat.map(logp).to_numpy(np.float64)
        g = (pd.DataFrame({"doc_id": doc, "lp": lp})
             .groupby("doc_id", sort=False)["lp"].agg(["mean", "size"]))
        return pd.DataFrame({
            "doc_id": g.index.to_numpy(np.int64),
            "n_tokens": g["size"].to_numpy(np.int64),
            "nll": textstats.round_half_away(
                -g["mean"].to_numpy(np.float64), 6)})

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


@register("vocab_top_words", sql=r"""
WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c)
SELECT word, CAST(cnt AS BIGINT) AS cnt,
       ROUND(SUM(cnt) OVER (ORDER BY cnt DESC, word
                            ROWS UNBOUNDED PRECEDING) / tot, 6)
       AS cum_coverage
FROM c, t ORDER BY cnt DESC, word LIMIT 20""")
def vocab_top_words(sf_dir: str) -> pd.DataFrame:
    """Vocabulary building: corpus top-20 words with cumulative corpus
    coverage — the first step of any tokenizer/vocab pipeline. The
    full vocabulary NEVER reaches the driver: after the bucketed
    combine each word lives in exactly one row globally, so block-local
    top-20 partials union ⊇ the global top-20 (exact), and the token
    total is a per-block scalar partial over the same materialized
    aggregate."""
    ds = _docs(sf_dir, ["text"]).map_batches(_word_count_partials,
                                             batch_format="pandas")
    # small: one row per distinct word — object-store resident, reused
    # by the top-k partials AND the total without recomputing the corpus
    agg = reduce_sink(ds, ["word"], {"cnt": ("cnt", "sum")}).materialize()

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return top_n_pandas(df, "word", "cnt", 20)

    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [np.int64(df["cnt"].sum())]})

    cand = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    tot = float(agg.map_batches(tot_partial,
                                batch_format="pandas").to_pandas()["t"].sum())
    top = top_n_pandas(cand, "word", "cnt", 20)
    top["cnt"] = top["cnt"].astype(np.int64)
    top["cum_coverage"] = textstats.round_half_away(
        top["cnt"].to_numpy(np.float64).cumsum() / tot, 6)
    return top.reset_index(drop=True)


@register("chunked_docs", sql=r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
           FROM documents),
s AS (SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 96)) AS start
      FROM t WHERE len(toks) > 0)
SELECT doc_id, CAST(start / 96 AS BIGINT) AS chunk_idx,
       CAST(LEAST(start + 128, len(toks)) - start AS BIGINT)
       AS chunk_tokens,
       array_to_string(toks[start + 1 : start + 128], ' ') AS chunk_text
FROM s""")
def chunked_docs(sf_dir: str) -> pd.DataFrame:
    """Document chunking with overlap (window 128 tokens, stride 96 —
    the context-window splitting step of an embedding/training-prep
    pipeline), as a batch-local flat-map expansion: chunk starts are
    derived with numpy repeat/cumsum over the per-doc token counts (no
    per-row Python loop to FIND chunks; the join of each chunk's token
    slice is inherently O(total output tokens)). Oracle: DuckDB
    generate_series + list slicing reproduces the exact text."""
    window, stride = 128, 96

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        n_chunks = np.where(lens > 0, (np.maximum(lens - 1, 0) // stride) + 1,
                            0)
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), n_chunks)
        # chunk_idx = 0..n_chunks-1 within each doc, vectorized
        off = np.arange(int(n_chunks.sum()), dtype=np.int64)
        first = np.repeat(np.concatenate(([0], np.cumsum(n_chunks)[:-1])),
                          n_chunks)
        idx = off - first
        starts = idx * stride
        doc_len = np.repeat(lens, n_chunks)
        ends = np.minimum(starts + window, doc_len)
        toks = words.to_numpy()
        row = np.repeat(np.arange(len(df), dtype=np.int64), n_chunks)
        texts = [" ".join(toks[r][s:e])
                 for r, s, e in zip(row, starts, ends)]
        return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idx,
                             "chunk_tokens": ends - starts,
                             "chunk_text": texts})

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)


# ---------------------------------------------------------------------------
# Relational completeness: outer joins, set operations, deterministic samples
# ---------------------------------------------------------------------------

@register("urgent_orders_per_customer", sql="""
WITH oc AS (SELECT o_custkey, COUNT(*) AS n FROM orders
            WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
pc AS (SELECT c_mktsegment, COALESCE(n, 0) AS n_urgent
       FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
SELECT c_mktsegment, CAST(n_urgent AS BIGINT) AS n_urgent,
       COUNT(*) AS customers
FROM pc GROUP BY 1, 2""")
def urgent_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Distributed LEFT OUTER join with a real null path (customers
    with zero urgent orders survive, null-filled to 0). Scale shape:
    the orders side is pre-reduced to one (custkey, n) row per
    customer BEFORE the join — the join's shuffle moves aggregates,
    never raw orders — and the priority predicate is pushed into the
    parquet scan so non-urgent row groups never leave storage."""
    import pyarrow.dataset as pds
    oc = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"],
                        filter=pds.field("o_orderpriority") == "1-URGENT"),
        ["o_custkey"], {"n": ("o_custkey", "size")})
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    j = cust.join(oc, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"],
            "n_urgent": df["n"].fillna(0).astype(np.int64)})

    out = reduce_sink(j.map_batches(fill, batch_format="pandas"),
                      ["c_mktsegment", "n_urgent"],
                      {"customers": ("n_urgent", "size")}).to_pandas()
    return out.sort_values(["c_mktsegment", "n_urgent"],
                           ignore_index=True)


@register("nation_presence", sql="""
WITH s AS (SELECT s_nationkey AS snk, COUNT(*) AS suppliers
           FROM supplier GROUP BY 1),
c AS (SELECT c_nationkey AS cnk, COUNT(*) AS customers
      FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1)
SELECT CAST(COALESCE(snk, cnk) AS INTEGER) AS nationkey,
       CAST(COALESCE(suppliers, 0) AS BIGINT) AS suppliers,
       CAST(COALESCE(customers, 0) AS BIGINT) AS customers
FROM s FULL JOIN c ON snk = cnk""")
def nation_presence(sf_dir: str) -> pd.DataFrame:
    """Distributed FULL OUTER join: nations holding suppliers vs
    nations holding BUILDING customers — either side may be absent
    (at sf0.001 suppliers cover 10/25 nations, so both null
    directions are real). Both sides are pre-reduced per-nation
    aggregates; for sides this small the broadcast-dict pattern
    (J1/J2) is cheaper, but this exercises Ray's full_outer shuffle
    join for when both sides are big."""
    import pyarrow.dataset as pds
    sup = reduce_sink(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_nationkey"]),
        ["s_nationkey"], {"suppliers": ("s_nationkey", "size")})
    cus = reduce_sink(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_nationkey"],
                        filter=pds.field("c_mktsegment") == "BUILDING"),
        ["c_nationkey"], {"customers": ("c_nationkey", "size")})
    j = sup.join(cus, join_type="full_outer", num_partitions=4,
                 on=("s_nationkey",), right_on=("c_nationkey",))

    def coalesce(df: pd.DataFrame) -> pd.DataFrame:
        # Ray's outer join already coalesces the key into the left
        # key column; a missing right match shows as null aggregates.
        nk = df["s_nationkey"].astype("float64")
        if "c_nationkey" in df.columns:
            nk = nk.fillna(df["c_nationkey"].astype("float64"))
        return pd.DataFrame({
            "nationkey": nk.to_numpy(np.int32),
            "suppliers": df["suppliers"].fillna(0).astype(np.int64),
            "customers": df["customers"].fillna(0).astype(np.int64)})

    out = j.map_batches(coalesce, batch_format="pandas").to_pandas()
    return out.sort_values("nationkey", ignore_index=True)


@register("purchase_week_user_setops", sql="""
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND day(ts) <= 7),
b AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND day(ts) >= 24)
SELECT 'intersect' AS op, user_id
FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'except_a', user_id FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'except_b', user_id FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""")
def purchase_week_user_setops(sf_dir: str) -> pd.DataFrame:
    """Distributed set operations (INTERSECT / EXCEPT both ways) via
    the presence-flag pattern: one streaming pass emits batch-distinct
    (user_id, in_a, in_b) flag partials, a single groupby max-combines
    them, and the classification is a batch-local map over the
    user-sized aggregate. One shuffle serves all three set ops —
    versus three separate distinct+join plans."""
    import pyarrow.dataset as pds
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"],
                         filter=pds.field("event_type") == "purchase")

    def flags(batch: pa.Table) -> pa.Table:
        day = pc.day(batch["ts"])
        in_a = pc.cast(pc.less_equal(day, 7), pa.int64())
        in_b = pc.cast(pc.greater_equal(day, 24), pa.int64())
        t = pa.table({"user_id": batch["user_id"],
                      "in_a": in_a, "in_b": in_b})
        t = t.filter(pc.greater(pc.add(t["in_a"], t["in_b"]), 0))
        return pa.TableGroupBy(t, "user_id").aggregate(
            [("in_a", "max"), ("in_b", "max")]).rename_columns(
            ["user_id", "in_a", "in_b"])

    agg = reduce_sink(ev.map_batches(flags, batch_format="pyarrow"),
                      ["user_id"], {"in_a": ("in_a", "max"),
                                    "in_b": ("in_b", "max")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        op = np.where(df["in_a"].eq(1) & df["in_b"].eq(1), "intersect",
                      np.where(df["in_a"].eq(1), "except_a", "except_b"))
        return pd.DataFrame({"op": op, "user_id": df["user_id"]})

    out = agg.map_batches(classify, batch_format="pandas").to_pandas()
    return out.sort_values(["op", "user_id"], ignore_index=True)


@register("sampled_docs", sql="""
SELECT doc_id FROM documents
WHERE (doc_id * 2654435761) % 4294967296 < 1073741824""")
def sampled_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic Bernoulli sampling (p = 1/4) by multiplicative
    hash threshold — the reproducible alternative to
    Dataset.random_sample: the kept set is identical across runs,
    cluster sizes and block layouts, and membership is testable in
    SQL. Zero shuffle: a batch-local numpy filter (the same Knuth
    hash as scan.shuffle_rank)."""
    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(scan._KNUTH)) % np.uint64(1 << 32)
        return batch.filter(pa.array(h < np.uint64(1 << 30)))

    out = _docs(sf_dir, ["doc_id"]).map_batches(
        keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


@register("docs_per_lang_sample", sql="""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents) t WHERE rn <= 5""")
def docs_per_lang_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-group sampling (k = 5 per language): the
    hash-min top-k is a MERGEABLE summary, so a batch-local top-k
    bounds what shuffles to k rows per (batch, group) and a per-group
    final combine finishes exactly — the distributed analog of
    per-stratum reservoir sampling, but reproducible (same sample on
    any cluster size)."""
    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(scan._KNUTH)) % np.uint64(1 << 32)
        return pa.table({"lang": batch["lang"], "doc_id": batch["doc_id"],
                         "h": pa.array(h.astype(np.int64))})

    def localtop(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["h", "doc_id"], kind="mergesort")
                .groupby("lang", sort=False).head(5))

    ds = _docs(sf_dir, ["lang", "doc_id"]).map_batches(
        hashed, batch_format="pyarrow")
    out = (ds.map_batches(localtop, batch_format="pandas")
           .groupby("lang")
           .map_groups(localtop, batch_format="pandas")).to_pandas()
    return (out[["lang", "doc_id"]]
            .sort_values(["lang", "doc_id"], ignore_index=True))


@register("similar_part_names", sql="""
WITH names AS (SELECT DISTINCT p_name AS key FROM part),
g AS (SELECT key, unnest(list_transform(generate_series(1, len(key) - 2),
                                        i -> substring(key, i, 3))) AS tri
      FROM names),
d AS (SELECT DISTINCT key, tri FROM g),
sz AS (SELECT key, COUNT(*) AS n FROM d GROUP BY 1),
inter AS (SELECT x.key AS a, y.key AS b, COUNT(*) AS c
          FROM d x JOIN d y ON x.tri = y.tri AND x.key < y.key
          GROUP BY 1, 2)
SELECT a, b, ROUND(c * 1.0 / (s1.n + s2.n - c), 6) AS jacc
FROM inter JOIN sz s1 ON s1.key = a JOIN sz s2 ON s2.key = b
WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5""")
def similar_part_names(sf_dir: str) -> pd.DataFrame:
    """Fuzzy string-similarity join (trigram-set Jaccard >= 0.5 over
    distinct part names) via PREFIX FILTERING — recall 1.0 without the
    all-pairs product: only each string's rarest ``n - ceil(t*n) + 1``
    trigrams (by global df order) open candidate buckets, so hot
    trigrams never bucket anything, and the in-bucket verify is exact
    over the full carried rank arrays (see stages/simjoin.py). Oracle:
    the brute-force trigram self-join in SQL."""
    from webalizer_ray.stages.simjoin import set_similarity_join_prefix
    names = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    distinct = reduce_sink(
        names.map_batches(
            lambda df: df.drop_duplicates().rename(
                columns={"p_name": "key"}),
            batch_format="pandas"),
        ["key"], {"n": ("key", "size")}).select_columns(["key"])
    out = set_similarity_join_prefix(distinct, threshold=0.5, q=3)
    out["jacc"] = textstats.round_half_away(
        out["jacc"].to_numpy(np.float64), 6)
    return out


@register("semantic_dedup_embeddings")
def semantic_dedup_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup semantic deduplication (k-means buckets → within-cluster
    cosine min-id keeper, stages/dedup.py:semantic_dedup). k-means is
    iterative and not SQL-expressible, so this is a rows-only driver
    check; the pytest verifies every verdict against a brute-force
    per-cluster recomputation."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return dedup.semantic_dedup(ds, threshold=0.4, n_clusters=8)


# ---------------------------------------------------------------------------
# Webalizer-family session metrics: bounce rate, dwell time
# ---------------------------------------------------------------------------

def _per_session_rollup(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """One row per visit-window session: (user_id, sid, entry_type,
    n, t0_us, t1_us). Computed INSIDE the per-user-bucket sessionize
    group — a bucket holds every event of its users, so sessions are
    complete there and the rollup needs no cross-block combine (unlike
    session_entry_exit, which demonstrates the partial-combine path)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        g["sid"] = ns.groupby(g["user_id"], sort=False).cumsum() \
            .astype(np.int64)
        g["us"] = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        per = g.groupby(["user_id", "sid"], sort=False).agg(
            entry_type=("event_type", "first"), n=("event_type", "size"),
            t0_us=("us", "min"), t1_us=("us", "max")).reset_index()
        per["n"] = per["n"].astype(np.int64)
        return per

    return (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_").map_groups(rollup, batch_format="pandas"))


_SESS_SQL = f"""
SELECT user_id, event_type, ts, event_id,
       SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
FROM ({_NS_SQL})"""


@register("bounce_rate_by_entry", sql=f"""
WITH s AS ({_SESS_SQL}),
per AS (SELECT user_id, sid,
               FIRST(event_type ORDER BY ts, event_id) AS entry_type,
               COUNT(*) AS n
        FROM s GROUP BY 1, 2)
SELECT entry_type, COUNT(*) AS sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
       ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
           AS bounce_rate
FROM per GROUP BY 1""")
def bounce_rate_by_entry(sf_dir: str) -> pd.DataFrame:
    """Bounce rate per entry event type (the webalizer-family
    single-hit-visit metric, SURVEY.md §2.9 W1/W2 domain): share of
    visit-window sessions that contain exactly one event, keyed by the
    session's first event. Per-session rows come from the bucket-local
    rollup; only (entry_type, sessions, bounces) partials shuffle."""
    per = _per_session_rollup(sf_dir)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bounce=(df["n"] == 1).astype(np.int64),
                       one=np.int64(1))
        return df[["entry_type", "one", "bounce"]]

    out = reduce_sink(per.map_batches(partials, batch_format="pandas"),
                      ["entry_type"],
                      {"sessions": ("one", "sum"),
                       "bounces": ("bounce", "sum")}).to_pandas()
    out["bounce_rate"] = textstats.round_half_away(
        out["bounces"].to_numpy(np.float64)
        / out["sessions"].to_numpy(np.float64), 6)
    return out.sort_values("entry_type", ignore_index=True)


@register("session_duration_by_hour", sql=f"""
WITH s AS ({_SESS_SQL}),
per AS (SELECT user_id, sid, MIN(ts) AS t0,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
        FROM s GROUP BY 1, 2)
SELECT CAST(hour(t0) AS BIGINT) AS hour, COUNT(*) AS sessions,
       ROUND(SUM(dur_us) * 1.0 / COUNT(*) / 1000000, 2) AS avg_dur_s,
       ROUND(MAX(dur_us) / 1000000.0, 2) AS max_dur_s
FROM per GROUP BY 1""")
def session_duration_by_hour(sf_dir: str) -> pd.DataFrame:
    """Dwell time: average and max session duration keyed by the hour
    the session STARTED (webalizer's hourly table extended with the
    visit-duration measure). Integer-µs duration sums combine exactly
    across partials; the float division happens once on the final
    aggregate, in the same order as the oracle."""
    per = _per_session_rollup(sf_dir)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        hour = ((df["t0_us"].to_numpy(np.int64) // 3_600_000_000)
                % 24).astype(np.int64)
        return pd.DataFrame({
            "hour": hour, "one": np.int64(1),
            "dur_us": df["t1_us"].to_numpy(np.int64)
            - df["t0_us"].to_numpy(np.int64)})

    agg = reduce_sink(per.map_batches(partials, batch_format="pandas"),
                      ["hour"], {"sessions": ("one", "sum"),
                                 "dur_sum": ("dur_us", "sum"),
                                 "dur_max": ("dur_us", "max")}).to_pandas()
    out = pd.DataFrame({
        "hour": agg["hour"].astype(np.int64),
        "sessions": agg["sessions"].astype(np.int64),
        "avg_dur_s": textstats.round_half_away(
            agg["dur_sum"].to_numpy(np.float64)
            / agg["sessions"].to_numpy(np.float64) / 1e6, 2),
        "max_dur_s": textstats.round_half_away(
            agg["dur_max"].to_numpy(np.float64) / 1e6, 2)})
    return out.sort_values("hour", ignore_index=True)


# ---------------------------------------------------------------------------
# Distribution diagnostics: histogram, robust outliers, key-skew profile
# ---------------------------------------------------------------------------

@register("value_histogram", sql="""
SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin, COUNT(*) AS cnt,
       ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY 1""")
def value_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width value histogram (bin width 25): binning is a
    batch-local Arrow kernel, then the ordinary partial-combine
    aggregate — a histogram is a groupby on a derived key, zero extra
    shuffle beyond the tiny (bin, cnt, sum) partials."""
    def binned(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(batch["value"],
                                       pa.scalar(25.0))), pa.int64())
        return pa.table({"bin": b, "value": batch["value"]})

    out = reduce_sink(_events(sf_dir, ["value"]).map_batches(
        binned, batch_format="pyarrow"),
        ["bin"], {"cnt": ("value", "size"),
                  "value_sum": ("value", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values("bin", ignore_index=True)


@register("value_outliers_mad", sql="""
WITH st AS (SELECT event_type, median(value) AS med, mad(value) AS m
            FROM events GROUP BY 1)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS outliers,
       ROUND(ANY_VALUE(med), 6) AS med, ROUND(ANY_VALUE(m), 6) AS mad
FROM events e JOIN st USING (event_type)
WHERE abs(value - med) > 3 * 1.4826 * m
GROUP BY 1""")
def value_outliers_mad(sf_dir: str) -> pd.DataFrame:
    """Robust outlier detection per group: median/MAD (the
    breakdown-resistant alternative to mean/stddev z-scores) with the
    standard 1.4826 normal-consistency constant. Exact medians need a
    group's values co-located (low-cardinality event_type ⇒ one
    map_groups task each); at high key cardinality swap in the t-digest
    sketch partials (stages/sketch.py). Identical float expression on
    both sides so the strict > threshold agrees bit-for-bit."""
    ds = _events(sf_dir, ["event_type", "value"])

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        med = float(np.quantile(v, 0.5, method="linear"))
        mad = float(np.quantile(np.abs(v - med), 0.5, method="linear"))
        n_out = int((np.abs(v - med) > 3 * 1.4826 * mad).sum())
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "outliers": np.array([n_out], dtype=np.int64),
                             "med": [round(med, 6)],
                             "mad": [round(mad, 6)]})

    out = (ds.groupby("event_type").map_groups(stats,
                                               batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_type", ignore_index=True)


@register("user_key_skew", sql="""
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
t AS (SELECT SUM(n) * 1.0 AS tot, COUNT(*) AS k FROM c),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM c)
SELECT CAST(t.k AS BIGINT) AS distinct_keys,
       CAST((SELECT MAX(n) FROM c) AS BIGINT) AS max_n,
       ROUND((SELECT MAX(n) FROM c) / t.tot, 6) AS max_share,
       ROUND(LN(t.tot) - (SELECT SUM(n * LN(n)) FROM c) / t.tot, 6)
           AS entropy,
       ROUND((SELECT SUM((2 * i - t.k - 1) * n) FROM r)
             / (t.k * t.tot), 6) AS gini
FROM t""")
def user_key_skew(sf_dir: str) -> pd.DataFrame:
    """Key-skew profiler — the diagnostic you run BEFORE picking a
    partition key at 100 TB: distinct keys, hottest-key share, Shannon
    entropy and Gini coefficient of the per-key count distribution.
    Scale shape: per-key counts reduce as usual, then — because counts
    are bounded small ints — an exact (count_value, frequency)
    HISTOGRAM is the only thing that leaves the cluster (the
    exact_quantiles_bounded trick), and entropy/Gini are closed-form
    over that histogram: Σ n·ln n decomposes per bucket; Gini's sorted
    rank sum has a closed form per tie-block of equal counts."""
    from webalizer_ray.stages.aggregate import key_skew_profile
    prof = key_skew_profile(_events(sf_dir, ["user_id"]), "user_id")
    return pd.DataFrame({
        "distinct_keys": np.array([prof["distinct_keys"]], dtype=np.int64),
        "max_n": np.array([prof["max_n"]], dtype=np.int64),
        "max_share": [round(prof["max_share"], 6)],
        "entropy": [round(prof["entropy"], 6)],
        "gini": [round(prof["gini"], 6)]})


@register("shared_span_pairs", sql="""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
sh AS (SELECT doc_id, array_to_string(toks[i:i+19], ' ') AS sp
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-19))
                        AS i) g),
d AS (SELECT DISTINCT doc_id, sp FROM sh)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS shared_spans
FROM d a JOIN d b ON a.sp = b.sp AND a.doc_id < b.doc_id
GROUP BY 1, 2""")
def shared_span_pairs_q(sf_dir: str) -> pd.DataFrame:
    """Duplicate-span detection (doc pairs sharing any 20-token span +
    how many, the bounded substring-dedup of Lee et al. ACL'22): span
    hashes bucket-join in-cluster, one vectorized self-merge per
    bucket — see dedup.shared_span_pairs."""
    return dedup.shared_span_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                   n=20)


@register("media_image_thumbnails")
def media_image_thumbnails(sf_dir: str) -> pd.DataFrame:
    """REAL image resize chained into a feature pass: PPM/BMP payloads
    decode with the pure-numpy parsers, nearest-neighbor downscale to
    fit 8×8 (aspect preserved), re-encode as PPM, then a second stage
    decodes the THUMBNAIL and emits its mean intensity — genuine pixels
    through both hops (no fake path; every fixture image is real)."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        ResizeImage,
        decode_ppm,
    )
    thumbs = _media_ds().map_batches(
        ResizeImage, fn_constructor_kwargs=dict(max_side=8),
        concurrency=(1, 2), **MEDIA_BATCH_KWARGS)

    def thumb_stats(batch: pa.Table) -> pa.Table:
        means = [decode_ppm(p).astype(np.float64).mean() / 255.0
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "width": batch["width"], "height": batch["height"],
            "thumb_mean": pa.array(np.round(means, 6), pa.float64())})

    out = thumbs.map_batches(thumb_stats,
                             batch_format="pyarrow").to_pandas()
    return out.sort_values("media_id", ignore_index=True)


@register("users_ranked_by_value", sql="""
WITH agg AS (SELECT user_id, ROUND(SUM(value), 2) AS value_sum
             FROM events GROUP BY 1)
SELECT user_id, value_sum,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM agg WINDOW w AS (ORDER BY value_sum, user_id)""")
def users_ranked_by_value(sf_dir: str) -> pd.DataFrame:
    """Distributed ORDER BY ranking (ROW_NUMBER / NTILE / PERCENT_RANK
    without a global sort shuffle): scan.global_rank range-partitions
    by sampled quantile cut points, ranks each bucket locally against
    driver-cumsum'd offsets (only num_buckets count rows leave the
    cluster), and NTILE/PERCENT_RANK are closed-form over the rank —
    NTILE with SQL's larger-groups-first convention."""
    agg = reduce_sink(_events(sf_dir, ["user_id", "value"]),
                      ["user_id"], {"value_sum": ("value", "sum")})

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_sum"] = df["value_sum"].round(2)
        return df

    ranked = scan.global_rank(
        agg.map_batches(rounded, batch_format="pandas"),
        "value_sum", "user_id", num_buckets=8).to_pandas()
    k = len(ranked)
    r = ranked["rnk"].to_numpy(np.int64)
    q, rem = divmod(k, 4)
    big = rem * (q + 1)          # SQL NTILE: first `rem` groups get q+1
    quartile = np.where(r <= big, (r - 1) // max(q + 1, 1) + 1,
                        rem + (r - big - 1) // max(q, 1) + 1)
    ranked["quartile"] = quartile.astype(np.int64)
    ranked["pct_rank"] = textstats.round_half_away(
        (r - 1) / max(k - 1, 1), 6)
    return (ranked[["user_id", "value_sum", "rnk", "quartile",
                    "pct_rank"]]
            .sort_values("user_id", ignore_index=True))


@register("nation_order_stats", sql="""
SELECT n_name, COUNT(*) AS orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1""")
def nation_order_stats(sf_dir: str) -> pd.DataFrame:
    """Auto-strategy joins (stages/join.py:auto_join): customer⋈nation
    goes map-side (25-row build side broadcast once, the probe side
    never shuffles), orders⋈customer picks by build-side row count —
    the optimizer decision every SQL engine makes, surfaced as an
    operator so pipelines scale without a rewrite when a dimension
    table outgrows the broadcast limit."""
    from webalizer_ray.stages.join import auto_join
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cn = auto_join(cust, nation, on="c_nationkey",
                   right_on="n_nationkey")
    j = auto_join(orders, cn, on="o_custkey", right_on="c_custkey")
    out = reduce_sink(j, ["n_name"],
                      {"orders": ("o_custkey", "size"),
                       "total_price": ("o_totalprice", "sum")}).to_pandas()
    out["total_price"] = out["total_price"].round(2)
    return out.sort_values("n_name", ignore_index=True)


@register("embedding_pagerank")
def embedding_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the k-NN similarity graph (centrality-based data
    selection — rank documents by how "central" they are in embedding
    space). Iterative and not SQL-expressible: rows-only driver check;
    the pytest verifies parity vs a numpy power iteration to 1e-9.
    See stages/graph.py for the co-partitioned message-passing shape."""
    from webalizer_ray.stages.graph import pagerank
    edges = knn_graph(sf_dir)[["node", "neighbor"]]
    out = pagerank(edges.rename(columns={"node": "src",
                                         "neighbor": "dst"}),
                   n_iter=10)
    out["r"] = textstats.round_half_away(out["r"].to_numpy(np.float64), 9)
    return out


@register("events_cube", sql="""
SELECT COALESCE(CAST(hour(ts) AS BIGINT), -1) AS hour,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS hits, ROUND(SUM(value), 2) AS value_sum
FROM events GROUP BY CUBE (hour(ts), event_type)""")
def events_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE in ONE pass: every batch emits partials for all
    2^k grouping sets (rolled-up dims as sentinels -1/'ALL'), so a
    single shuffle serves the full lattice — versus 2^k separate
    groupby plans re-reading the input. The partial explosion is
    bounded: ≤ 4× the per-batch distinct (hour, type) combinations,
    tiny next to the raw rows that DON'T shuffle."""
    def cube_partials(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({
            "hour": df["ts"].dt.hour.astype(np.int64),
            "event_type": df["event_type"],
            "value": df["value"]})
        frames = []
        for roll_h, roll_t in [(False, False), (False, True),
                               (True, False), (True, True)]:
            f = base.copy()
            if roll_h:
                f["hour"] = np.int64(-1)
            if roll_t:
                f["event_type"] = "ALL"
            frames.append(f.groupby(["hour", "event_type"], sort=False)
                          .agg(hits=("value", "size"),
                               value_sum=("value", "sum")).reset_index())
        out = pd.concat(frames, ignore_index=True)
        out["hits"] = out["hits"].astype(np.int64)
        return out

    ds = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        cube_partials, batch_format="pandas")
    out = reduce_sink(ds, ["hour", "event_type"],
                      {"hits": ("hits", "sum"),
                       "value_sum": ("value_sum", "sum")}).to_pandas()
    out["value_sum"] = out["value_sum"].round(2)
    return out.sort_values(["hour", "event_type"], ignore_index=True)


@register("user_event_counts_cms")
def user_event_counts_cms(sf_dir: str) -> pd.DataFrame:
    """Per-key frequency estimates via Count-Min (the linear-merge
    sketch for per-key counts when the key space is too big for an
    exact groupby result to live anywhere): per-batch sketches ADD
    together, so only (depth×width) int64 tables shuffle, never keys.
    One-sided error (est ≥ true); pytest checks the CM bound."""
    from webalizer_ray.stages.sketch import CountMin

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["user_id"].to_numpy(np.int64))
        return pd.DataFrame({
            "cms": [CountMin.from_hashes(h).to_bytes()]})

    parts = _events(sf_dir, ["user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    sk = CountMin()
    for blob in parts["cms"]:
        sk = sk.merge(CountMin.from_bytes(blob))
    # query the sketch for the (small, known) key set — at real scale
    # the probes come from a heavy-hitter summary, not a distinct scan
    users = _events(sf_dir, ["user_id"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas") \
        .to_pandas()["user_id"].drop_duplicates().sort_values()
    est = sk.estimate(pd.util.hash_array(users.to_numpy(np.int64)))
    return pd.DataFrame({"user_id": users.to_numpy(np.int64),
                         "est_events": est.astype(np.int64)})


@register("distinct_users_by_type_hll")
def distinct_users_by_type_hll(sf_dir: str) -> pd.DataFrame:
    """PER-GROUP approximate distinct: one HyperLogLog per (batch,
    event_type) — fixed 16 KiB register arrays merge by max inside an
    ordinary groupby, so per-group distinct users costs one small-row
    shuffle however many users exist. Accuracy pytest vs the exact
    two-phase count."""
    from webalizer_ray.stages.sketch import HyperLogLog

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            h = pd.util.hash_array(g["user_id"].to_numpy(np.int64))
            rows.append((et, HyperLogLog.from_hashes(h).to_bytes()))
        return pd.DataFrame(rows, columns=["event_type", "hll"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        sk = HyperLogLog()
        for blob in g["hll"]:
            sk = sk.merge(HyperLogLog.from_bytes(blob))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "users_approx": [int(round(sk.count()))]})

    out = (_events(sf_dir, ["event_type", "user_id"])
           .map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .map_groups(combine, batch_format="pandas")).to_pandas()
    return out.sort_values("event_type", ignore_index=True)


@register("validate_events", sql="""
SELECT * FROM (
  SELECT 'event_id' AS "column", 'unique' AS rule,
         CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS violations
  FROM events
  UNION ALL
  SELECT 'user_id', 'not_null',
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'value', 'min',
         CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'value', 'max',
         CAST(SUM(CASE WHEN value > 1000 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'event_type', 'regex',
         CAST(SUM(CASE WHEN NOT regexp_matches(
              COALESCE(event_type, ''), '^[a-z]+$') THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM events) t
ORDER BY "column", rule""")
def validate_events(sf_dir: str) -> pd.DataFrame:
    """Data-contract validation (the expectations gate a production
    feed runs before trusting a drop): all non-unique rules check in
    ONE streaming pass of per-batch violation partials; uniqueness
    reuses the two-phase distinct count. One row per rule."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
    return textstats.validate_rules(ds, {
        "event_id": {"unique": True},
        "user_id": {"not_null": True},
        "value": {"min": 0, "max": 1000},
        "event_type": {"regex": r"^[a-z]+$"},
    })


@register("user_moving_avg", sql="""
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
           AS mov_avg
FROM events""")
def user_moving_avg(sf_dir: str) -> pd.DataFrame:
    """Sliding ROWS-frame window function (3-event moving average per
    user): user-hash bucket co-locates each user's stream, one
    vectorized pandas rolling() per bucket — completing the window
    family next to running-SUM/LAG (`user_running_value`) and the
    rank windows (`users_ranked_by_value`)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        # AVG over a count-varying frame: divide the rolling SUM by the
        # rolling COUNT in the same order the oracle does
        mv = (g.groupby("user_id", sort=False)["value"]
              .rolling(3, min_periods=1).mean()
              .reset_index(level=0, drop=True))
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "event_id": g["event_id"].to_numpy(np.int64),
            "mov_avg": textstats.round_half_away(
                mv.to_numpy(np.float64), 6)})

    out = (ds.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_").map_groups(roll, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["user_id", "event_id"], ignore_index=True)


@register("funnel_three_step", sql=f"""
WITH s AS ({_SESS_SQL}),
k AS (SELECT DISTINCT user_id, sid FROM s),
v AS (SELECT user_id, sid, MIN(ts) AS t FROM s
      WHERE event_type = 'view' GROUP BY 1, 2),
c AS (SELECT s.user_id, s.sid, MIN(s.ts) AS t
      FROM s JOIN v ON s.user_id = v.user_id AND s.sid = v.sid
      WHERE s.event_type = 'click' AND s.ts > v.t GROUP BY 1, 2),
p AS (SELECT s.user_id, s.sid, MIN(s.ts) AS t
      FROM s JOIN c ON s.user_id = c.user_id AND s.sid = c.sid
      WHERE s.event_type = 'purchase' AND s.ts > c.t GROUP BY 1, 2)
SELECT (SELECT COUNT(*) FROM k) AS sessions,
       (SELECT COUNT(*) FROM v) AS step_view,
       (SELECT COUNT(*) FROM c) AS step_click,
       (SELECT COUNT(*) FROM p) AS step_purchase""")
def funnel_three_step(sf_dir: str) -> pd.DataFrame:
    """N-step ORDERED funnel (view → click-after-view →
    purchase-after-that-click, within a visit-window session): the
    sequential-pattern query behind conversion analysis. Each step's
    anchor is the previous step's FIRST qualifying timestamp, so the
    whole chain is a per-session forward scan — computed vectorized
    inside the user-bucket sessionize group (sessions complete there),
    with only four count partials per bucket reaching the driver."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        g["sid"] = ns.groupby(g["user_id"], sort=False).cumsum()
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        SENT = np.iinfo(np.int64).max

        def first_after(step: str, anchor: pd.Series) -> pd.Series:
            t = pd.Series(np.where(
                (g["event_type"].to_numpy() == step)
                & (us > anchor.reindex(
                    pd.MultiIndex.from_arrays(
                        [g["user_id"], g["sid"]])).to_numpy()),
                us, SENT), index=g.index)
            return t.groupby([g["user_id"], g["sid"]], sort=False).min()

        zero = pd.Series(
            np.int64(-1),
            index=g.groupby(["user_id", "sid"], sort=False)
            .size().index)
        v = first_after("view", zero)
        c = first_after("click", v)
        p = first_after("purchase", c)
        return pd.DataFrame({
            "sessions": [np.int64(len(zero))],
            "step_view": [np.int64((v < SENT).sum())],
            "step_click": [np.int64((c < SENT).sum())],
            "step_purchase": [np.int64((p < SENT).sum())]})

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(funnel,
                                            batch_format="pandas")
             .to_pandas())
    return pd.DataFrame({c: [np.int64(parts[c].sum())]
                         for c in ["sessions", "step_view",
                                   "step_click", "step_purchase"]})


@register("validate_fk_orders", sql="""
SELECT CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphan_orders,
       CAST(COUNT(*) AS BIGINT) AS total_orders
FROM (SELECT o_orderkey,
             (SELECT 1 FROM customer WHERE c_custkey = o_custkey) AS c
      FROM orders) t""")
def validate_fk_orders(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity check (orders.o_custkey ⊆
    customer.c_custkey) — the cross-table contract companion to
    validate_events: the presence-flag pattern tags each custkey side
    (parent=2/child=1), one groupby max-combines per key, and orphan
    child rows sum from (key, n_child) partials — no join of the fact
    table, only key-level aggregates shuffle."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def child(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["o_custkey"].value_counts()
        return pd.DataFrame({"k": vc.index.to_numpy(np.int64),
                             "n_child": vc.to_numpy(np.int64),
                             "parent": np.int64(0)})

    def parent(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].drop_duplicates().to_numpy(np.int64)
        return pd.DataFrame({"k": k,
                             "n_child": np.int64(0),
                             "parent": np.int64(1)})

    both = orders.map_batches(child, batch_format="pandas").union(
        cust.map_batches(parent, batch_format="pandas"))
    agg = reduce_sink(both, ["k"], {"n_child": ("n_child", "sum"),
                                    "parent": ("parent", "max")})

    def orphan_partial(df: pd.DataFrame) -> pd.DataFrame:
        orphan = df.loc[df["parent"].eq(0), "n_child"].sum()
        return pd.DataFrame({"orphans": [np.int64(orphan)],
                             "total": [np.int64(df["n_child"].sum())]})

    parts = agg.map_batches(orphan_partial,
                            batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "orphan_orders": [np.int64(parts["orphans"].sum())],
        "total_orders": [np.int64(parts["total"].sum())]})


@register("value_drift_psi", sql="""
WITH binned AS (SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin,
                       CASE WHEN day(ts) <= 15 THEN 'a' ELSE 'b' END
                           AS half
                FROM events),
c AS (SELECT bin,
             SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS nb
      FROM binned GROUP BY bin),
t AS (SELECT SUM(na) * 1.0 AS ta, SUM(nb) * 1.0 AS tb FROM c),
p AS (SELECT (na + 0.5) / (ta + 0.5 * COUNT(*) OVER ()) AS pa,
             (nb + 0.5) / (tb + 0.5 * COUNT(*) OVER ()) AS pb
      FROM c, t)
SELECT ROUND(SUM((pa - pb) * LN(pa / pb)), 6) AS psi FROM p""")
def value_drift_psi(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: Population Stability Index between
    the month's two halves over the value histogram (the check a
    production feed runs before trusting a new drop against the last).
    Laplace-smoothed (+0.5 per bin over the UNION of observed bins) so
    bins empty on one side stay finite. Only (bin, na, nb) rows leave
    the cluster; PSI is closed-form on that tiny table."""
    def partials(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(batch["value"],
                                       pa.scalar(25.0))), pa.int64())
        is_a = pc.less_equal(pc.day(batch["ts"]), 15)
        return pa.table({
            "bin": b,
            "na": pc.cast(is_a, pa.int64()),
            "nb": pc.cast(pc.invert(is_a), pa.int64())})

    c = reduce_sink(_events(sf_dir, ["ts", "value"]).map_batches(
        partials, batch_format="pyarrow"),
        ["bin"], {"na": ("na", "sum"), "nb": ("nb", "sum")}).to_pandas()
    na = c["na"].to_numpy(np.float64)
    nb = c["nb"].to_numpy(np.float64)
    k = float(len(c))
    pa_ = (na + 0.5) / (na.sum() + 0.5 * k)
    pb_ = (nb + 0.5) / (nb.sum() + 0.5 * k)
    psi = float(((pa_ - pb_) * np.log(pa_ / pb_)).sum())
    return pd.DataFrame({"psi": [round(psi, 6)]})


@register("daily_growth", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS date, COUNT(*) AS hits
           FROM events GROUP BY 1)
SELECT date, hits,
       ROUND(COALESCE((hits - LAG(hits) OVER (ORDER BY date)) * 100.0
                      / LAG(hits) OVER (ORDER BY date), 0), 6)
           AS pct_change
FROM d""")
def daily_growth(sf_dir: str) -> pd.DataFrame:
    """Day-over-day traffic growth % (the trend arrow on every
    dashboard): the heavy work is the ordinary partial-combine daily
    aggregate; the LAG window runs on the date-cardinality result
    (a window over a tiny aggregate is driver arithmetic, not a
    distributed op — same stance as the flagship's finalize)."""
    ds = _events(sf_dir, ["ts"]).map_batches(
        _with_time_cols({"date"}), batch_format="pyarrow")
    d = reduce_sink(ds, ["date"], {"hits": ("ts", "size")}).to_pandas()
    d = d.sort_values("date", ignore_index=True)
    prev = d["hits"].shift()
    pct = ((d["hits"] - prev) * 100.0 / prev).fillna(0.0)
    d["pct_change"] = textstats.round_half_away(
        pct.to_numpy(np.float64), 6)
    return d


@register("return_visit_gaps", sql=f"""
WITH s AS ({_SESS_SQL}),
per AS (SELECT user_id, sid, MIN(ts) AS t0 FROM s GROUP BY 1, 2),
g AS (SELECT user_id,
             epoch_us(t0) - epoch_us(LAG(t0) OVER (PARTITION BY user_id
                                                   ORDER BY t0)) AS gap_us
      FROM per)
SELECT CAST(FLOOR(gap_us / 3600000000.0) AS BIGINT) AS gap_hours,
       CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE gap_us IS NOT NULL GROUP BY 1""")
def return_visit_gaps(sf_dir: str) -> pd.DataFrame:
    """Return-visit gap histogram (hours between a user's consecutive
    session starts — the webalizer-family loyalty metric): session
    starts come from the bucket-local rollup, consecutive gaps from a
    per-user shift INSIDE the same bucket (users never span buckets),
    and only (gap_hours, n) partials shuffle."""
    per = _per_session_rollup(sf_dir)

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t0_us"], kind="mergesort")
        same = df["user_id"].eq(df["user_id"].shift())
        gap = df["t0_us"] - df["t0_us"].shift()
        h = (gap[same] // 3_600_000_000).astype(np.int64)
        vc = h.value_counts()
        return pd.DataFrame({"gap_hours": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    # the rollup's map_groups output blocks are per user-bucket, but a
    # later stage may re-split them: do the shift inside ONE map_groups
    # over the same bucket key to stay split-proof
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    parts = (per.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_")
             .map_groups(lambda g: gaps(g.drop(columns=["bucket_"])),
                         batch_format="pandas"))
    out = reduce_sink(parts, ["gap_hours"],
                      {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("gap_hours", ignore_index=True)


@register("region_supplier_stats", sql="""
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS suppliers,
       ROUND(SUM(s_acctbal), 2) AS acctbal_sum
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY 1""")
def region_supplier_stats(sf_dir: str) -> pd.DataFrame:
    """Region-level rollup through the 3-level dimension chain
    (supplier → nation → region): both dimensions are tiny, so
    auto_join picks the broadcast path twice — the fact side never
    shuffles; completes query coverage of every driver table."""
    from webalizer_ray.stages.join import auto_join
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_nationkey", "s_acctbal"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_regionkey"])
    reg = rd.read_parquet(f"{sf_dir}/region.parquet",
                          columns=["r_regionkey", "r_name"])
    j = auto_join(auto_join(sup, nat, on="s_nationkey",
                            right_on="n_nationkey"),
                  reg, on="n_regionkey", right_on="r_regionkey")
    out = reduce_sink(j, ["r_name"],
                      {"suppliers": ("s_acctbal", "size"),
                       "acctbal_sum": ("s_acctbal", "sum")}).to_pandas()
    out["acctbal_sum"] = out["acctbal_sum"].round(2)
    return out.sort_values("r_name", ignore_index=True)


@register("tpch_q6_revenue", sql="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS qualifying
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.08
  AND l_quantity < 24""")
def tpch_q6_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape — THE scan-efficiency benchmark: every predicate
    is pushed into the parquet scan (``filter=`` prunes row groups
    before bytes leave storage, ``columns=`` prunes to the two measure
    columns), then per-batch revenue partials sum — nothing shuffles
    but scalars."""
    import datetime as _dt

    import pyarrow.dataset as pds
    f = ((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
         & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1))
         & (pds.field("l_discount") >= 0.02)
         & (pds.field("l_discount") <= 0.08)
         & (pds.field("l_quantity") < 24))
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"],
                         filter=f)

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(batch["l_extendedprice"],
                                 batch["l_discount"])).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue": [round(float(parts["rev"].sum()), 2)],
        "qualifying": [np.int64(parts["n"].sum())]})


@register("promo_revenue_share", sql="""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
                              l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6)
           AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'""")
def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape (promotion revenue share): the date predicate is
    pushed into the lineitem scan, the part dimension broadcasts
    through auto_join (fact side never shuffles), and both the promo
    and total revenue sums combine from per-batch scalar partials —
    the division happens once, on the driver, in oracle order."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 3, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1997, 4, 1))))
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    j = auto_join(li, part, on="l_partkey", right_on="p_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = (df["l_extendedprice"].to_numpy(np.float64)
               * (1.0 - df["l_discount"].to_numpy(np.float64)))
        promo = df["p_type"].str.startswith("PROMO").to_numpy()
        return pd.DataFrame({"promo": [float(rev[promo].sum())],
                             "total": [float(rev.sum())]})

    parts = j.map_batches(partial, batch_format="pandas").to_pandas()
    pct = 100.0 * parts["promo"].sum() / parts["total"].sum()
    return pd.DataFrame({"promo_pct": [round(float(pct), 6)]})


@register("bigram_pmi", sql=r"""
WITH t AS (SELECT regexp_extract_all(lower(text), '\S+') AS w
           FROM documents),
u AS (SELECT unnest(w) AS word FROM t),
uc AS (SELECT word, COUNT(*) AS c FROM u GROUP BY 1),
tot AS (SELECT SUM(c) * 1.0 AS T FROM uc),
bg AS (SELECT w[i] AS w1, w[i+1] AS w2
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
                        AS i) g),
bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
btot AS (SELECT SUM(cb) * 1.0 AS B FROM bc)
SELECT w1, w2, CAST(cb AS BIGINT) AS cnt,
       ROUND(LN((cb / B) / ((ua.c / T) * (ub.c / T))), 6) AS pmi
FROM bc JOIN uc ua ON ua.word = w1 JOIN uc ub ON ub.word = w2, tot, btot
WHERE cb >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 15""")
def bigram_pmi(sf_dir: str) -> pd.DataFrame:
    """Collocation extraction: top-15 bigrams by pointwise mutual
    information (min count 5) — the phrase-mining step of tokenizer /
    vocab pipelines. Unigram and bigram counts reduce as partials
    (bigrams from a numpy shift inside each doc, never across docs);
    the PMI arithmetic runs on the count-threshold survivors against
    the vocabulary-sized unigram table (same driver footprint as the
    unigram-LM scorer), with the float expression in oracle order."""
    def grams(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        rows_u, rows_b = [], []
        for ws in words:
            rows_u.extend(ws)
            rows_b.extend(zip(ws[:-1], ws[1:]))
        vc_u = pd.Series(rows_u).value_counts() if rows_u \
            else pd.Series(dtype=np.int64)
        vc_b = pd.Series(rows_b).value_counts() if rows_b \
            else pd.Series(dtype=np.int64)
        u = pd.DataFrame({"w1": vc_u.index.to_numpy(), "w2": "",
                          "cnt": vc_u.to_numpy(np.int64), "kind": "u"})
        b = pd.DataFrame({
            "w1": [a for a, _ in vc_b.index],
            "w2": [bb for _, bb in vc_b.index],
            "cnt": vc_b.to_numpy(np.int64), "kind": "b"})
        return pd.concat([u, b], ignore_index=True)

    agg = reduce_sink(_docs(sf_dir, ["text"]).map_batches(
        grams, batch_format="pandas"),
        ["kind", "w1", "w2"], {"cnt": ("cnt", "sum")}).to_pandas()
    uni = agg[agg["kind"] == "u"].set_index("w1")["cnt"]
    big = agg[agg["kind"] == "b"]
    T = float(uni.sum())
    B = float(big["cnt"].sum())
    q = big[big["cnt"] >= 5].copy()
    ca = uni.loc[q["w1"]].to_numpy(np.float64)
    cb2 = uni.loc[q["w2"]].to_numpy(np.float64)
    cb = q["cnt"].to_numpy(np.float64)
    q["pmi"] = textstats.round_half_away(
        np.log((cb / B) / ((ca / T) * (cb2 / T))), 6)
    q = q.sort_values(["pmi", "w1", "w2"],
                      ascending=[False, True, True]).head(15)
    return pd.DataFrame({"w1": q["w1"].to_numpy(),
                         "w2": q["w2"].to_numpy(),
                         "cnt": q["cnt"].to_numpy(np.int64),
                         "pmi": q["pmi"].to_numpy()})


@register("corpus_source_mix", sql=r"""
WITH t AS (SELECT source,
                  len(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents),
s AS (SELECT source, COUNT(*) AS docs,
             SUM(n_tokens) AS tokens FROM t GROUP BY 1),
tot AS (SELECT SUM(tokens) * 1.0 AS T FROM s)
SELECT source, CAST(docs AS BIGINT) AS docs,
       CAST(tokens AS BIGINT) AS tokens,
       ROUND(tokens / T, 6) AS token_share
FROM s, tot""")
def corpus_source_mix(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus mix report (docs, tokens, token share) — the
    first table of every data-mixture card. Token counting is the
    Arrow regex kernel; per-source partials combine; shares divide once
    on the source-cardinality aggregate."""
    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.TOKEN_RX), pa.int64())
        return pa.table({"source": batch["source"], "n_tokens": n})

    agg = reduce_sink(
        _docs(sf_dir, ["source", "text"]).map_batches(
            counts, batch_format="pyarrow"),
        ["source"], {"docs": ("n_tokens", "size"),
                     "tokens": ("n_tokens", "sum")}).to_pandas()
    T = float(agg["tokens"].sum())
    agg["docs"] = agg["docs"].astype(np.int64)
    agg["tokens"] = agg["tokens"].astype(np.int64)
    agg["token_share"] = textstats.round_half_away(
        agg["tokens"].to_numpy(np.float64) / T, 6)
    return agg.sort_values("source", ignore_index=True)


@register("cdc_merged_customers", sql="""
WITH u AS (
  SELECT c_custkey AS key, c_acctbal AS val,
         CAST(-1 AS BIGINT) AS seq, 'upsert' AS op FROM customer
  UNION ALL
  SELECT o_custkey, o_totalprice, CAST(o_orderkey AS BIGINT),
         CASE WHEN o_orderkey % 13 = 0 THEN 'delete' ELSE 'upsert' END
  FROM orders),
w AS (SELECT key, val, op,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rk
      FROM u)
SELECT key, ROUND(val, 2) AS val FROM w WHERE rk = 1 AND op <> 'delete'""")
def cdc_merged_customers(sf_dir: str) -> pd.DataFrame:
    """MERGE INTO / CDC upsert-apply (the lakehouse incremental-store
    primitive): the customer snapshot is the base, orders replay as a
    change stream keyed by custkey (orderkey = commit sequence; every
    13th order is a delete). Last writer wins per key; a winning delete
    retires the key. Scale shape: one streaming union, each row
    shuffles ONCE into a coarse int32 key-hash bucket, winner-per-key
    is a single vectorized sort+drop_duplicates inside the bucket."""
    from webalizer_ray.stages.cdc import OP_DELETE, OP_UPSERT, merge_changes

    base = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .rename_columns({"c_custkey": "key", "c_acctbal": "val"})

    def to_changes(b: pa.Table) -> pa.Table:
        ok = pc.cast(b["o_orderkey"], pa.int64())
        # op: delete when orderkey % 13 == 0 (Arrow int divide truncates)
        rem = pc.subtract(ok, pc.multiply(pc.divide(ok, 13), 13))
        op = pc.if_else(pc.equal(rem, 0), pa.scalar(OP_DELETE),
                        pa.scalar(OP_UPSERT))
        return pa.table({"key": b["o_custkey"], "val": b["o_totalprice"],
                         "seq": ok, "op": op})

    changes = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"]) \
        .map_batches(to_changes, batch_format="pyarrow")
    out = merge_changes(base, changes, "key").to_pandas()
    out["key"] = out["key"].astype(np.int64)
    out["val"] = textstats.round_half_away(
        out["val"].to_numpy(np.float64), 2)
    return out.sort_values("key", ignore_index=True)


@register("top_session_paths", sql=f"""
WITH s AS (SELECT user_id, event_type, ts, event_id,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM ({_NS_SQL})),
r AS (SELECT user_id, sid, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rk
      FROM s),
p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rk) AS path
      FROM r WHERE rk <= 3 GROUP BY user_id, sid)
SELECT path, COUNT(*) AS sessions FROM p GROUP BY path
ORDER BY sessions DESC, path LIMIT 15""")
def top_session_paths(sf_dir: str) -> pd.DataFrame:
    """Session path mining (clickstream navigation analysis): the most
    common first-3-event-type journeys across visit-window sessions.
    Scale shape: sessions are sessionized AND folded to their path
    string inside the user-hash bucket task (a user's events never span
    buckets), so only (path, n) partials — cardinality ≤ |types|³ —
    shuffle to the final combine; top-15 resolves on the driver over
    the tiny path table."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    num_buckets = 32

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def path_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        sid = ns.cumsum()  # unique per session within the bucket
        rk = g.groupby(sid.to_numpy(), sort=False).cumcount()
        f = pd.DataFrame({"sid": sid[rk < 3], "pos": rk[rk < 3],
                          "t": g["event_type"][rk < 3]})
        wide = f.pivot(index="sid", columns="pos", values="t") \
            .reindex(columns=[0, 1, 2])

        def seg(col: pd.Series) -> np.ndarray:
            # absent positions (session shorter than 3) contribute ""
            return np.where(col.isna(), "",
                            ">" + col.fillna("").astype(str))

        path = pd.Series(wide[0].astype(str).to_numpy()
                         + seg(wide[1]) + seg(wide[2]))
        c = path.value_counts()
        return pd.DataFrame({"path": c.index.to_numpy(),
                             "n": c.to_numpy(np.int64)})

    partials = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(path_counts, batch_format="pandas")
    agg = reduce_sink(partials, ["path"], {"sessions": ("n", "sum")}) \
        .to_pandas()
    agg["sessions"] = agg["sessions"].astype(np.int64)
    return agg.sort_values(["sessions", "path"], ascending=[False, True],
                           kind="mergesort").head(15).reset_index(drop=True)


#: fixed keyword query + Robertson/Lucene BM25 constants for bm25_search.
_BM25_TERMS = ("table", "hash", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


@register("bm25_search", sql=r"""
WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS dl
           FROM documents),
n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
             FROM documents)
       WHERE term IN ('table', 'hash', 'merge') GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             SUM(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / n.avgdl)))
               AS score
      FROM tf JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN n
      GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 6) AS score
FROM s ORDER BY score DESC, doc_id LIMIT 10""")
def bm25_search(sf_dir: str) -> pd.DataFrame:
    """BM25 ranked retrieval (the search-engine scoring the reference's
    search-string reports feed; Robertson et al. TREC-3 / Lucene idf
    variant). Two streaming passes over the corpus: pass 1 reduces the
    collection statistics — N, total token count, per-query-term doc
    frequency — to a handful of scalars; pass 2 captures those scalars,
    scores each batch vectorized, and emits per-batch top-k PARTIALS so
    only k rows per block reach the final combine. A doc's tf/dl come
    from its own text cell, so per-doc values never shuffle at all."""
    return _bm25_topk(sf_dir, k=10)


def _bm25_topk(sf_dir: str, k: int) -> pd.DataFrame:
    """Shared BM25 scorer (see bm25_search): distributed two-pass,
    per-batch top-k partials, driver combines only k rows per block."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    terms = list(_BM25_TERMS)

    def term_tf(df: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, dl) + per-query-term tf rows for one batch."""
        words = df["text"].fillna("").str.split()
        dl = words.str.len().to_numpy(np.int64)
        # empty docs explode to a NaN placeholder — drop it so the
        # flat token array aligns with np.repeat(doc_id, dl)
        flat = words.explode().dropna().to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy(), dl)
        m = pd.Series(flat).isin(terms).to_numpy()
        tf = (pd.DataFrame({"doc_id": doc[m], "term": flat[m]})
              .groupby(["doc_id", "term"], sort=False).size()
              .rename("tf").reset_index())
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf, pd.DataFrame({"doc_id": df["doc_id"], "dl": dl})

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = term_tf(df)
        per_term = tf.groupby("term", sort=False).size().rename("df") \
            .reset_index()
        per_term["n"] = np.int64(0)
        per_term["dl"] = np.int64(0)
        tot = pd.DataFrame({"term": ["\x00stats"],
                            "df": np.int64(0),
                            "n": np.int64(len(df)),
                            "dl": np.int64(dl["dl"].sum())})
        return pd.concat([per_term, tot], ignore_index=True)

    st = reduce_sink(
        docs.map_batches(stats_partial, batch_format="pandas"),
        ["term"], {"df": ("df", "sum"), "n": ("n", "sum"),
                   "dl": ("dl", "sum")}).to_pandas()
    n_docs = float(st["n"].sum())
    avgdl = float(st["dl"].sum()) / n_docs
    dfreq = {r["term"]: float(r["df"]) for _, r in st.iterrows()
             if r["term"] != "\x00stats"}
    k1, b = _BM25_K1, _BM25_B

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = term_tf(df)
        m = tf.merge(dl, on="doc_id")
        dfv = m["term"].map(dfreq).to_numpy(np.float64)
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        tfv = m["tf"].to_numpy(np.float64)
        dlv = m["dl"].to_numpy(np.float64)
        m["s"] = (idf * tfv * (k1 + 1.0)
                  / (tfv + k1 * (1.0 - b + b * dlv / avgdl)))
        sc = m.groupby("doc_id", sort=False)["s"].sum().reset_index()
        sc["score"] = textstats.round_half_away(
            sc["s"].to_numpy(np.float64), 6)
        sc = sc.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k)
        return sc[["doc_id", "score"]]

    cand = docs.map_batches(score_topk, batch_format="pandas").to_pandas()
    out = cand.sort_values(["score", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(k)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.reset_index(drop=True)


@register("quality_classifier_docs", sql=None)  # iterative GD — not SQL
def quality_classifier_docs(sf_dir: str) -> pd.DataFrame:
    """Model-based quality filtering (fastText/CCNet-style): distill
    the heuristic curation gate (quality_score >= 0.5) into a logistic
    regression trained distributed — per-block gradient partials, one
    streaming pass per iteration over a materialized feature
    projection — then score every document in a stateless pass.
    (The synthetic corpus's lang/source columns are independent of the
    text, so the gate is the one genuinely learnable target; it is
    also exactly what quality-classifier distillation does in real
    pipelines.) Rows-only for the driver; pytest verifies bit-level
    gradient parity vs a single-machine reference, repartition
    invariance, and gate-reproduction accuracy."""
    from webalizer_ray.stages.classifier import (
        doc_feature_frame, score_logreg, train_logreg)

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        f = doc_feature_frame(df)
        q = textstats.add_quality_score(df)
        f["y"] = (q["quality_score"].to_numpy(np.float64)
                  >= 0.5).astype(np.float64)
        return f

    feats = docs.map_batches(featurize, batch_format="pandas")
    w = train_logreg(feats, n_iter=10)
    out = score_logreg(docs, w).to_pandas()
    out["score"] = textstats.round_half_away(
        out["score"].to_numpy(np.float64), 6)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)


@register("smallqty_revenue_q17", sql="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)""")
def smallqty_revenue_q17(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape — a correlated scalar subquery decorrelated into
    a per-key aggregate + map-side re-probe. Scale shape: the brand's
    partkeys broadcast once and prune BOTH lineitem passes map-side
    (the fact table never shuffles); pass 1 reduces (partkey, sum, n)
    partials to a per-part average table (≤ brand-part cardinality,
    broadcast back via ray.put); pass 2 re-scans the pruned lineitems
    and sums the below-threshold revenue as scalar partials. The
    threshold 0.2*avg is exact: quantities are integer-valued doubles,
    so the sum/count division is order-independent."""
    parts = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
        filters=[("p_brand", "=", "Brand#12")])
    keys = frozenset(parts["p_partkey"].to_pylist())

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def avg_partial(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["l_partkey"], value_set=pa.array(list(keys)))
        t = t.filter(m)
        return pa.table({"l_partkey": t["l_partkey"],
                         "q": t["l_quantity"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    avgs = reduce_sink(li.map_batches(avg_partial, batch_format="pyarrow"),
                       ["l_partkey"],
                       {"s": ("q", "sum"), "n": ("one", "sum")}).to_pandas()
    thr = {int(k): 0.2 * (s / n) for k, s, n in
           zip(avgs["l_partkey"], avgs["s"], avgs["n"])}
    thr_ref = ray.put(thr)

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        df = df[df["l_partkey"].isin(t.keys())]
        lim = df["l_partkey"].map(t).to_numpy(np.float64)
        keep = df["l_quantity"].to_numpy(np.float64) < lim
        return pd.DataFrame(
            {"rev": [df["l_extendedprice"].to_numpy(np.float64)[keep]
                     .sum()]})

    parts_rev = li.map_batches(rev_partial,
                               batch_format="pandas").to_pandas()
    total = float(parts_rev["rev"].sum())
    return pd.DataFrame({"avg_yearly": [
        float(textstats.round_half_away(total / 7.0, 2))]})


@register("session_type_pairs", sql=f"""
WITH s AS (SELECT user_id, event_type, ts, event_id,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM ({_NS_SQL})),
d AS (SELECT DISTINCT user_id, sid, event_type FROM s),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.sid = b.sid
                       AND a.event_type < b.event_type)
SELECT type_a, type_b, COUNT(*) AS support FROM p GROUP BY 1, 2""")
def session_type_pairs(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence mining: support counts of unordered
    event-type pairs appearing in the same visit-window session. Scale
    shape: distinct (session, type) and the pair expansion are ONE
    vectorized self-merge inside the user-hash bucket (a session's
    pair fan-out is bounded by |types|²); only (type_a, type_b, n)
    partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    num_buckets = 32

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        sid = ((~same) | (gap_s >= 1800.0)).cumsum()
        d = pd.DataFrame({"sid": sid.to_numpy(),
                          "t": g["event_type"].to_numpy()}) \
            .drop_duplicates()
        m = d.merge(d, on="sid")
        m = m[m["t_x"] < m["t_y"]]
        c = m.groupby(["t_x", "t_y"], sort=False).size()
        out = c.rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out.rename(columns={"t_x": "type_a", "t_y": "type_b"})

    partials = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(pair_counts, batch_format="pandas")
    agg = reduce_sink(partials, ["type_a", "type_b"],
                      {"support": ("n", "sum")}).to_pandas()
    agg["support"] = agg["support"].astype(np.int64)
    return agg.sort_values(["type_a", "type_b"], ignore_index=True)


@register("user_value_decile_lift", sql="""
WITH agg AS (SELECT user_id, ROUND(SUM(value), 2) AS v,
                    MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS buyer
             FROM events GROUP BY 1),
r AS (SELECT *, NTILE(10) OVER (ORDER BY v, user_id) AS decile FROM agg)
SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS users,
       CAST(SUM(buyer) AS BIGINT) AS buyers,
       ROUND(SUM(buyer) * 1.0 / COUNT(*), 6) AS buyer_rate
FROM r GROUP BY decile""")
def user_value_decile_lift(sf_dir: str) -> pd.DataFrame:
    """Decile lift/gains table (the model-evaluation report scoring
    teams read): users ranked into value deciles via the distributed
    ORDER BY rank (only bucket counts reach the driver), buyer flags
    reduced as per-user max partials, per-decile rates closed-form on
    the 10-row aggregate."""
    agg = reduce_sink(
        _events(sf_dir, ["user_id", "value", "event_type"]).map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"], "value": t["value"],
                "buyer": pc.cast(pc.equal(t["event_type"], "purchase"),
                                 pa.int64())}),
            batch_format="pyarrow"),
        ["user_id"], {"v": ("value", "sum"), "buyer": ("buyer", "max")})

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v"] = df["v"].round(2)
        return df

    ranked = scan.global_rank(
        agg.map_batches(rounded, batch_format="pandas"),
        "v", "user_id", num_buckets=8).to_pandas()
    k = len(ranked)
    r = ranked["rnk"].to_numpy(np.int64)
    q, rem = divmod(k, 10)
    big = rem * (q + 1)
    ranked["decile"] = np.where(
        r <= big, (r - 1) // max(q + 1, 1) + 1,
        rem + (r - big - 1) // max(q, 1) + 1).astype(np.int64)
    out = ranked.groupby("decile").agg(
        users=("user_id", "size"), buyers=("buyer", "sum")).reset_index()
    out["users"] = out["users"].astype(np.int64)
    out["buyers"] = out["buyers"].astype(np.int64)
    out["buyer_rate"] = textstats.round_half_away(
        out["buyers"].to_numpy(np.float64) * 1.0
        / out["users"].to_numpy(np.float64), 6)
    return out.sort_values("decile", ignore_index=True)


@register("auc_value_purchase", sql="""
WITH r AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS pos,
           ROW_NUMBER() OVER (ORDER BY value, event_id) AS rnk
           FROM events),
s AS (SELECT CAST(SUM(CASE WHEN pos = 1 THEN rnk ELSE 0 END) AS DOUBLE)
          AS rank_sum,
      CAST(SUM(pos) AS DOUBLE) AS np,
      CAST(COUNT(*) - SUM(pos) AS DOUBLE) AS nn FROM r)
SELECT ROUND((rank_sum - np * (np + 1) / 2) / (np * nn), 6) AS auc
FROM s""")
def auc_value_purchase(sf_dir: str) -> pd.DataFrame:
    """Distributed AUC via the Mann-Whitney rank-sum identity (the
    standard trick for AUC over data too big to sort locally): the
    global rank comes from scan.global_rank (deterministic (value,
    event_id) order on both engines — ties share the tiebreak, so the
    statistic matches exactly), and only per-block (rank_sum, np, nn)
    scalar partials reach the driver for the closed form."""
    ds = _events(sf_dir, ["event_id", "value", "event_type"])
    ranked = scan.global_rank(ds, "value", "event_id", num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = (df["event_type"] == "purchase").to_numpy()
        r = df["rnk"].to_numpy(np.float64)
        return pd.DataFrame({"rank_sum": [r[pos].sum()],
                             "np": [float(pos.sum())],
                             "nn": [float((~pos).sum())]})

    p = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    rank_sum, n_pos, n_neg = (float(p["rank_sum"].sum()),
                              float(p["np"].sum()), float(p["nn"].sum()))
    auc = (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    return pd.DataFrame({"auc": [float(textstats.round_half_away(auc, 6))]})


@register("ann_topk_int8", sql=None)  # int8 rounding — not SQL-exact
def ann_topk_int8(sf_dir: str) -> pd.DataFrame:
    """Cosine top-k over the int8-quantized embedding table (the 4×
    smaller representation you would persist at 100 TB): quantize in
    one stateless pass, score per-batch against the broadcast float
    query matrix, per-batch top-k partials. Rows-only for the driver;
    pytest asserts the per-component error bound and recall vs the
    exact float path."""
    from webalizer_ray.stages.quant import int8_topk, quantize_int8

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    qds = quantize_int8(rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]))
    out = int8_topk(qds, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]] \
        .sort_values(["query_id", "rank"], ignore_index=True)


@register("bpe_merges", sql=None)  # iterative merge loop — not SQL
def bpe_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016): the distributed
    part is ONE word-count reduce (only (word, n) partials shuffle —
    BPE statistics depend on the frequency table alone, which is how
    real subword trainers scale); the K-merge loop runs over the
    vocabulary-sized table on the driver. Returns the learned merge
    list; pytest checks the paper's worked example, encode/decode
    round-trip and piece-count conservation."""
    from webalizer_ray.stages.bpe import learn_bpe, word_counts

    vocab = word_counts(_docs(sf_dir, ["text"]))
    merges = learn_bpe(vocab, n_merges=50)
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [a for a, _ in merges],
        "right": [b for _, b in merges]})


@register("label_centroids", sql="""
WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS x
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       ROUND(SUM(x) / COUNT(*), 6) AS centroid
FROM u GROUP BY label, dim""")
def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroids (the class-prototype table behind
    nearest-centroid classifiers and SemDeDup-style bucketing): each
    batch reduces to one (sum-vector, count) partial per label via a
    single matmul-free np.add.reduceat — only |labels| × dim floats
    ever shuffle; the division happens once on the tiny aggregate in
    oracle order (sum first, divide once)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy()
        order = np.argsort(lab, kind="mergesort")
        m, lab = m[order], lab[order]
        uniq, starts = np.unique(lab, return_index=True)
        sums = np.add.reduceat(m, starts, axis=0)
        counts = np.diff(np.append(starts, len(lab)))
        d = m.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uniq.astype(np.int64), d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64),
                           len(uniq)),
            "s": sums.ravel(),
            "n": np.repeat(counts.astype(np.int64), d)})

    agg = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                      ["label", "dim"],
                      {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    agg["centroid"] = textstats.round_half_away(
        agg["s"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64), 6)
    return agg[["label", "dim", "centroid"]] \
        .sort_values(["label", "dim"], ignore_index=True)


@register("hour_value_corr", sql="""
WITH b AS (SELECT CAST(hour(ts) AS DOUBLE) AS x, value AS y FROM events),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy FROM b)
SELECT ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           AS corr
FROM s""")
def hour_value_corr(sf_dir: str) -> pd.DataFrame:
    """Distributed Pearson correlation from the five classic scalar
    moments — each block emits ONE (n, Σx, Σy, Σxy, Σx², Σy²) partial;
    the closed form (written out identically in the oracle instead of
    CORR() so the float expression order matches) runs once on the
    driver."""
    ds = _events(sf_dir, ["ts", "value"]).map_batches(
        _with_time_cols({"hour"}), batch_format="pyarrow")

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["hour"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(x))], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()],
            "syy": [(y * y).sum()]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = float(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxy = float(p["sxy"].sum())
    sxx, syy = float(p["sxx"].sum()), float(p["syy"].sum())
    corr = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                                  * np.sqrt(n * syy - sy * sy))
    return pd.DataFrame({"corr": [float(textstats.round_half_away(
        corr, 6))]})


@register("value_trend_ols", sql="""
WITH b AS (SELECT CAST(epoch_us(ts)
                       - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
                  / 86400000000.0 AS x,
                  value AS y FROM events),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx FROM b)
SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept
FROM s""")
def value_trend_ols(sf_dir: str) -> pd.DataFrame:
    """Distributed OLS trend line (value vs time-in-days) via the
    normal equations over the same scalar-moment partials as the
    correlation — the two-coefficient special case of the classifier's
    Hessian-partial pattern, oracle-backed because the closed form is
    written out explicitly on both sides. x is centered at the corpus
    epoch (2024-01-01): days-since-Unix-epoch (~19700) makes
    n·Σx² − (Σx)² cancel catastrophically and the engines disagree
    past the rounding guard."""
    ds = _events(sf_dir, ["ts", "value"])
    epoch_us_2024 = 1704067200000000  # TIMESTAMP '2024-01-01' in µs

    def partial(t: pa.Table) -> pd.DataFrame:
        x = ((pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
              - epoch_us_2024).astype(np.float64) / 86400000000.0)
        y = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(x))], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = float(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxy, sxx = float(p["sxy"].sum()), float(p["sxx"].sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
    return pd.DataFrame({
        "slope": [float(textstats.round_half_away(slope, 6))],
        "intercept": [float(textstats.round_half_away(intercept, 6))]})


@register("snapshot_diff_users", sql="""
WITH a AS (SELECT user_id, ROUND(SUM(value), 2) AS v FROM events
           WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
b AS (SELECT user_id, ROUND(SUM(value), 2) AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
j AS (SELECT CASE WHEN a.user_id IS NULL THEN 'added'
                  WHEN b.user_id IS NULL THEN 'removed'
                  WHEN a.v <> b.v THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL JOIN b ON a.user_id = b.user_id)
SELECT status, COUNT(*) AS n FROM j GROUP BY status""")
def snapshot_diff_users(sf_dir: str) -> pd.DataFrame:
    """Snapshot diff (the table-compare every incremental store needs
    after a backfill): per-user value between the month's two halves,
    classified added / removed / changed / unchanged. Scale shape: ONE
    streaming pass computes both periods' partials (a period flag
    rides each row, conditional sums combine exactly); the classify is
    map-side on the per-user aggregate and only (status, n) partials
    reach the driver — no second scan, no join of raw rows."""
    cut = np.datetime64("2024-01-16T00:00:00")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        in_a = (df["ts"].to_numpy() < cut)
        v = df["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "va": np.where(in_a, v, 0.0),
            "vb": np.where(in_a, 0.0, v),
            "na": in_a.astype(np.int64),
            "nb": (~in_a).astype(np.int64)})

    agg = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pandas"),
        ["user_id"], {"va": ("va", "sum"), "vb": ("vb", "sum"),
                      "na": ("na", "sum"), "nb": ("nb", "sum")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        has_a = df["na"].to_numpy() > 0
        has_b = df["nb"].to_numpy() > 0
        va = textstats.round_half_away(df["va"].to_numpy(np.float64), 2)
        vb = textstats.round_half_away(df["vb"].to_numpy(np.float64), 2)
        status = np.where(~has_a, "added",
                          np.where(~has_b, "removed",
                                   np.where(va != vb, "changed",
                                            "unchanged")))
        c = pd.Series(status).value_counts()
        return pd.DataFrame({"status": c.index.to_numpy(),
                             "n": c.to_numpy(np.int64)})

    out = reduce_sink(agg.map_batches(classify, batch_format="pandas"),
                      ["status"], {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("status", ignore_index=True)


@register("centroid_confusion", sql="""
WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS x
           FROM embeddings),
c AS (SELECT label AS clabel, list(m ORDER BY dim) AS cvec
      FROM (SELECT label, dim, SUM(x) / COUNT(*) AS m
            FROM u GROUP BY label, dim) GROUP BY label),
s AS (SELECT e.vec_id, CAST(e.label AS BIGINT) AS true_label,
             CAST(c.clabel AS BIGINT) AS pred_label,
             ROUND(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), c.cvec), 9) AS sim
      FROM embeddings e CROSS JOIN c),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY sim DESC, pred_label) AS rk FROM s)
SELECT true_label, pred_label, COUNT(*) AS n
FROM r WHERE rk = 1 GROUP BY 1, 2""")
def centroid_confusion(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid classification + confusion matrix (the
    Rocchio/prototype classifier — also SemDeDup's assignment step):
    per-label centroids reduce from (sum-vector, count) partials, the
    |labels|×dim centroid matrix broadcasts once, each batch assigns
    by one cosine matmul (similarities rounded to 9 dp so float noise
    can't flip an argmax between engines; ties break on the smaller
    label), and only (true, pred, n) partials shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy()
        order = np.argsort(lab, kind="mergesort")
        m, lab = m[order], lab[order]
        uniq, starts = np.unique(lab, return_index=True)
        sv = np.add.reduceat(m, starts, axis=0)
        cnt = np.diff(np.append(starts, len(lab)))
        d = m.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uniq.astype(np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "s": sv.ravel(), "n": np.repeat(cnt.astype(np.int64), d)})

    agg = reduce_sink(ds.map_batches(sums, batch_format="pandas"),
                      ["label", "dim"],
                      {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    agg["m"] = agg["s"] / agg["n"]
    piv = agg.pivot(index="label", columns="dim", values="m").sort_index()
    labels = piv.index.to_numpy(np.int64)
    C = piv.to_numpy(np.float64)                    # (L, d)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put((labels, Cn))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        labs, cn = ray.get(c_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ cn.T, 9)               # (n, L)
        # argmax with smaller-label tiebreak: labels ascend, argmax
        # returns the FIRST max — matches ORDER BY sim DESC, label
        pred = labs[np.argmax(sims, axis=1)]
        g = pd.DataFrame({"true_label": df["label"].to_numpy(np.int64),
                          "pred_label": pred}) \
            .groupby(["true_label", "pred_label"], sort=False).size()
        out = g.rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    out = reduce_sink(ds.map_batches(assign, batch_format="pandas"),
                      ["true_label", "pred_label"],
                      {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["true_label", "pred_label"],
                           ignore_index=True)


@register("event_periodicity", sql=None)  # FFT — not SQL
def event_periodicity(sf_dir: str) -> pd.DataFrame:
    """Seasonality detection: dominant period of the event-arrival
    series (the diurnal/weekly-pattern check every traffic report
    implies). Scale shape: the heavy work is ONE distributed
    count-per-hour-bucket reduce (only (bucket, n) partials shuffle —
    the series is a few hundred points per month regardless of corpus
    size); the periodogram (mean-detrended rFFT) runs on that tiny
    series driver-side. Returns the dominant period in hours and its
    share of non-DC spectral power."""
    ds = _events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        b = us // 3_600_000_000
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    agg = reduce_sink(ds.map_batches(partial, batch_format="pyarrow"),
                      ["bucket"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values("bucket")
    lo, hi = int(agg["bucket"].min()), int(agg["bucket"].max())
    series = np.zeros(hi - lo + 1)
    series[agg["bucket"].to_numpy() - lo] = agg["n"].to_numpy(np.float64)
    x = series - series.mean()
    power = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), d=1.0)          # cycles per hour
    k = 1 + int(np.argmax(power[1:]))               # skip DC
    period = 1.0 / freqs[k]
    share = float(power[k] / power[1:].sum()) if power[1:].sum() > 0 \
        else 0.0
    return pd.DataFrame({
        "dominant_period_hours": [float(textstats.round_half_away(
            period, 4))],
        "power_share": [float(textstats.round_half_away(share, 6))],
        "series_hours": [np.int64(len(series))]})


@register("embedding_pca_spectrum", sql=None)  # eigendecomposition — not SQL
def embedding_pca_spectrum(sf_dir: str) -> pd.DataFrame:
    """PCA spectrum + whitening check for the embedding table (the
    retrieval-pipeline preprocessing of Jégou & Chum 2012): covariance
    from ONE streaming pass of (Σx, Σxxᵀ, n) moment partials — nothing
    bigger than d² floats per block shuffles — eigendecomposition on
    the driver, then a stateless whitening matmul pass whose output
    covariance the query verifies is the identity (per-dim variance
    reported, must be ~1)."""
    from webalizer_ray.stages.whiten import (
        covariance_moments, pca_spectrum, whiten)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mean, cov, n = covariance_moments(ds)
    eigvals, eigvecs = pca_spectrum(cov)
    wds = whiten(ds, mean, eigvals, eigvecs)
    _, wcov, _ = covariance_moments(wds)
    return pd.DataFrame({
        "dim": np.arange(len(eigvals), dtype=np.int64),
        "eigenvalue": textstats.round_half_away(eigvals, 6),
        "whitened_var": textstats.round_half_away(np.diag(wcov), 6)})


@register("type_hour_mi", sql="""
WITH j AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
                  COUNT(*) AS nxy FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
t AS (SELECT SUM(nxy) AS n FROM j)
SELECT ROUND(SUM(CAST(nxy AS DOUBLE) / n
                 * ln(CAST(nxy AS DOUBLE) * n / (nx * ny))), 6) AS mi
FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t""")
def type_hour_mi(sf_dir: str) -> pd.DataFrame:
    """Mutual information between event type and hour-of-day (the
    dependence screen feature-selection and drift monitors use, next
    of kin to the bigram PMI table). Scale shape: the corpus reduces
    to the joint (type, hour, n) histogram — |types|×24 rows — via
    per-batch count partials; marginals and the MI closed form run on
    that tiny table with the float expression in oracle order."""
    ds = _events(sf_dir, ["ts", "event_type"]).map_batches(
        _with_time_cols({"hour"}), batch_format="pyarrow")
    j = reduce_sink(ds.map_batches(
        lambda t: pa.table({"x": t["event_type"], "y": t["hour"],
                            "one": pa.array(np.ones(t.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow"),
        ["x", "y"], {"nxy": ("one", "sum")}).to_pandas()
    n = float(j["nxy"].sum())
    nx = j.groupby("x")["nxy"].transform("sum").to_numpy(np.float64)
    ny = j.groupby("y")["nxy"].transform("sum").to_numpy(np.float64)
    nxy = j["nxy"].to_numpy(np.float64)
    mi = float((nxy / n * np.log(nxy * n / (nx * ny))).sum())
    return pd.DataFrame({"mi": [float(textstats.round_half_away(mi, 6))]})


@register("padding_waste_by_bucket", sql=r"""
WITH t AS (SELECT len(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents),
b AS (SELECT n_tokens,
             CAST(CEIL(CAST(n_tokens AS DOUBLE) / 64) AS BIGINT)
                 AS bucket
      FROM t)
SELECT bucket, COUNT(*) AS docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
           AS padding_waste
FROM b GROUP BY bucket""")
def padding_waste_by_bucket(sf_dir: str) -> pd.DataFrame:
    """Length-bucketed batching profile (the padding-waste report
    behind inference/training batch planners): docs bucketed by
    64-token length bands; padding waste = what batching each bucket
    to its longest member costs. Token counts are the Arrow regex
    kernel; only (bucket, docs, Σtokens, max) partials shuffle; the
    waste expression is closed-form on the tiny aggregate."""
    def partial(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bucket = np.ceil(n / 64.0).astype(np.int64)
        return pa.table({"bucket": bucket, "n_tokens": n,
                         "one": np.ones(len(n), np.int64)})

    agg = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["bucket"], {"docs": ("one", "sum"), "tokens": ("n_tokens", "sum"),
                     "max_tokens": ("n_tokens", "max")}).to_pandas()
    for c in ["docs", "tokens", "max_tokens"]:
        agg[c] = agg[c].astype(np.int64)
    agg["padding_waste"] = (agg["docs"] * agg["max_tokens"]
                            - agg["tokens"]).astype(np.int64)
    return agg.sort_values("bucket", ignore_index=True)


@register("value_trend_by_type", sql="""
WITH b AS (SELECT event_type,
                  CAST(epoch_us(ts)
                       - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
                  / 86400000000.0 AS x,
                  value AS y FROM events),
s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM b GROUP BY 1)
SELECT event_type,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
FROM s""")
def value_trend_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS trend (grouped version of value_trend_ols — the
    per-segment drift report): the five scalar moments reduce PER
    EVENT TYPE as ordinary keyed partials, so the shuffle carries
    |types| × 5 floats per block and the slope closed form runs on the
    tiny per-type table in oracle expression order."""
    ds = _events(sf_dir, ["ts", "value", "event_type"])
    epoch_us_2024 = 1704067200000000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = ((df["ts"].astype("int64").to_numpy() - epoch_us_2024)
             .astype(np.float64) / 86400000000.0)
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": np.int64(1), "sx": x, "sy": y,
                          "sxy": x * y, "sxx": x * x})
        return g.groupby("event_type", sort=False).sum().reset_index()

    agg = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                      ["event_type"],
                      {"n": ("n", "sum"), "sx": ("sx", "sum"),
                       "sy": ("sy", "sum"), "sxy": ("sxy", "sum"),
                       "sxx": ("sxx", "sum")}).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy, sxx = (agg["sxy"].to_numpy(np.float64),
                agg["sxx"].to_numpy(np.float64))
    agg["slope"] = textstats.round_half_away(
        (n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    return agg[["event_type", "slope"]] \
        .sort_values("event_type", ignore_index=True)


@register("view_purchase_1h_conversion", sql="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT CAST(COUNT(*) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN EXISTS (
            SELECT 1 FROM p WHERE p.user_id = v.user_id
              AND p.ts > v.ts
              AND p.ts <= v.ts + INTERVAL 1 HOUR)
            THEN 1 ELSE 0 END) AS BIGINT) AS converted
FROM v""")
def view_purchase_1h_conversion(sf_dir: str) -> pd.DataFrame:
    """Attribution-window conversion (EXISTS within a time window —
    the ad-attribution primitive): for every view, did the same user
    purchase within the next hour? Scale shape: both event streams
    co-locate in the user-hash bucket; inside each bucket ONE
    vectorized searchsorted of purchase timestamps answers every view
    (no pairwise expansion); only two scalar partials per bucket reach
    the driver."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    num_buckets = 32
    hour_us = 3_600_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])].copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def convert(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        is_v = (g["event_type"] == "view").to_numpy()
        # composite int64 key (user_rank * span + relative_ts) makes
        # ONE sorted array searchable per (user, window) with plain
        # searchsorted — no per-user Python loop, no pair expansion
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        # int64 headroom: users-per-bucket × time-span must fit; at a
        # month span (~2.7e12 µs) that is ~3e6 users per bucket — raise
        # num_buckets before this ever binds at scale
        if int(uranks.max(initial=0) + 1) > (2 ** 63 - 1) // int(span):
            raise ValueError("composite key overflow: raise num_buckets")
        key = uranks * span + base
        pk = np.sort(key[~is_v])
        vk = key[is_v]
        left = np.searchsorted(pk, vk, side="right")
        right = np.searchsorted(pk, vk + hour_us, side="right")
        return pd.DataFrame({
            "views": [np.int64(len(vk))],
            "converted": [np.int64(int((right > left).sum()))]})

    p = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(convert, batch_format="pandas") \
        .to_pandas()
    return pd.DataFrame({"views": [np.int64(p["views"].sum())],
                         "converted": [np.int64(p["converted"].sum())]})


@register("analyze_events", sql="""
SELECT 'event_id' AS col, COUNT(*) AS n,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS nulls,
       COUNT(DISTINCT event_id) AS ndv,
       ROUND(MIN(event_id), 6) AS min_num,
       ROUND(MAX(event_id), 6) AS max_num
FROM events
UNION ALL
SELECT 'user_id', COUNT(*),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT user_id), ROUND(MIN(user_id), 6),
       ROUND(MAX(user_id), 6) FROM events
UNION ALL
SELECT 'value', COUNT(*),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT value), ROUND(MIN(value), 6),
       ROUND(MAX(value), 6) FROM events
UNION ALL
SELECT 'event_type', COUNT(*),
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT event_type), NULL, NULL FROM events""")
def analyze_events(sf_dir: str) -> pd.DataFrame:
    """ANALYZE-style table profile (the stats collection every
    optimizer and data-quality gate runs): per column — row count,
    nulls, exact NDV, numeric min/max. One streaming pass emits a
    single partial row per (block, column) for count/null/min/max; NDV
    reuses the exact two-phase distinct (only distinct values shuffle,
    then per-bucket counts). At extreme cardinality swap NDV to the
    HLL sketch (`distinct_users_hll` shows the path)."""
    cols = ["event_id", "user_id", "value", "event_type"]
    ds = _events(sf_dir, cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            num = s.dtype.kind in "if"
            rows.append({
                "col": c, "n": np.int64(len(s)),
                "nulls": np.int64(s.isna().sum()),
                "min_num": float(s.min()) if num and len(s) else np.nan,
                "max_num": float(s.max()) if num and len(s) else np.nan})
        return pd.DataFrame(rows)

    agg = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                      ["col"], {"n": ("n", "sum"),
                                "nulls": ("nulls", "sum"),
                                "min_num": ("min_num", "min"),
                                "max_num": ("max_num", "max")}).to_pandas()
    ndvs = {}
    for c in cols:
        one = distinct_count(ds.map_batches(
            lambda t, c=c: pa.table(
                {"g": pa.array(np.zeros(t.num_rows, np.int64)),
                 c: t[c]}), batch_format="pyarrow"),
            ["g"], c, "ndv").to_pandas()
        ndvs[c] = np.int64(one["ndv"].iloc[0]) if len(one) else np.int64(0)
    agg["ndv"] = agg["col"].map(ndvs).astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    agg["nulls"] = agg["nulls"].astype(np.int64)
    for c in ["min_num", "max_num"]:
        agg[c] = textstats.round_half_away(
            agg[c].to_numpy(np.float64), 6)
    return agg[["col", "n", "nulls", "ndv", "min_num", "max_num"]] \
        .sort_values("col", ignore_index=True)


@register("join_cardinality_estimate", sql="""
WITH l AS (SELECT o_custkey AS k, COUNT(*) AS nl FROM orders GROUP BY 1),
r AS (SELECT c_custkey AS k, COUNT(*) AS nr FROM customer GROUP BY 1)
SELECT CAST(SUM(nl * nr) AS BIGINT) AS join_rows,
       CAST(MAX(nl * nr) AS BIGINT) AS max_key_rows,
       CAST(COUNT(*) AS BIGINT) AS matching_keys
FROM l JOIN r USING (k)""")
def join_cardinality_estimate(sf_dir: str) -> pd.DataFrame:
    """Join-explosion guard (run BEFORE a big join): the exact output
    cardinality of orders⋈customer from per-key count histograms —
    Σ nl·nr — plus the hottest key's contribution. Only (key, count)
    aggregates shuffle (never the fact rows), so the guard costs two
    keyed reduces and a count-table join; max_key_rows is what tells
    you to reach for skew_join."""
    lo = reduce_sink(rd.read_parquet(f"{sf_dir}/orders.parquet",
                                     columns=["o_custkey"]),
                     ["o_custkey"], {"nl": ("o_custkey", "size")})
    ro = reduce_sink(rd.read_parquet(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey"]),
                     ["c_custkey"], {"nr": ("c_custkey", "size")})
    j = lo.join(ro, join_type="inner", num_partitions=4,
                on=("o_custkey",), right_on=("c_custkey",)).to_pandas()
    prod = (j["nl"].to_numpy(np.int64) * j["nr"].to_numpy(np.int64))
    return pd.DataFrame({
        "join_rows": [np.int64(prod.sum())],
        "max_key_rows": [np.int64(prod.max() if len(prod) else 0)],
        "matching_keys": [np.int64(len(j))]})


@register("user_activity_islands", sql="""
WITH iv AS (SELECT user_id, ts AS s,
                   ts + INTERVAL 5 MINUTE AS e FROM events),
o AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv),
g AS (SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
      FROM o),
m AS (SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
      FROM g GROUP BY user_id, island)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS islands,
       CAST(SUM(epoch_us(en) - epoch_us(st)) // 1000000 AS BIGINT)
           AS covered_s
FROM m GROUP BY user_id""")
def user_activity_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands (merge overlapping intervals): each event opens
    a 5-minute activity interval; overlapping intervals per user merge
    into islands, reporting island count and covered seconds. The
    classic hard-SQL window pattern, computed here as ONE vectorized
    cummax/flag/segment-reduce inside the user-hash bucket (a user's
    intervals never span buckets); only (user, islands, covered)
    aggregates shuffle."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id"])
    num_buckets = 32
    win_us = 5 * 60 * 1_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        s = g["ts"].astype("int64").to_numpy()
        e = s + win_us
        same = uid == np.roll(uid, 1)
        if len(same):
            same[0] = False
        # equal-length intervals sorted by start ⇒ ends are sorted too,
        # so the running max end within a user IS the previous end —
        # the general cummax degenerates to one roll
        prev_e = np.roll(e, 1)
        new_island = (~same) | (s > prev_e)
        island_id = np.cumsum(new_island) - 1
        m = pd.DataFrame({"uid": uid, "isl": island_id, "s": s, "e": e}) \
            .groupby("isl", sort=False).agg(
                uid=("uid", "first"), st=("s", "min"), en=("e", "max"))
        cov_us = (m["en"] - m["st"]).groupby(m["uid"]).sum()
        cnt = m.groupby("uid", sort=False).size()
        return pd.DataFrame({
            "user_id": cnt.index.to_numpy(np.int64),
            "islands": cnt.to_numpy(np.int64),
            "covered_s": (cov_us.loc[cnt.index].to_numpy(np.int64)
                          // 1_000_000)})

    out = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(islands, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id", ignore_index=True)


@register("weekly_active_users", sql="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau
FROM days JOIN d ON d.day > days.day - 7 AND d.day <= days.day
GROUP BY days.day""")
def weekly_active_users(sf_dir: str) -> pd.DataFrame:
    """7-day rolling distinct users (WAU — the rolling COUNT DISTINCT
    that SQL window frames cannot express): the corpus reduces to
    distinct (day, user) pairs; each pair flat-maps to the ≤7 window
    anchors it supports; a second exact distinct collapses users seen
    on several days of one window. Only (day, user) pairs — bounded by
    users × days — ever shuffle, never events."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // 86_400_000_000).astype(np.int64)
        df = pd.DataFrame({"day": day,
                           "user_id": t["user_id"].to_numpy(
                               zero_copy_only=False)}).drop_duplicates()
        return df

    pairs = reduce_sink(ds.map_batches(day_pairs, batch_format="pyarrow"),
                        ["day", "user_id"], {"n": ("day", "size")})
    # the observed-day set bounds window anchors (match the oracle's
    # "days" table = days with ≥1 event)
    days = sorted(reduce_sink(pairs, ["day"], {"n": ("n", "size")})
                  .to_pandas()["day"].tolist())
    days_ref = ray.put(np.array(days, np.int64))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        anchors = ray.get(days_ref)
        d = df["day"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        # each (day, user) supports anchors in [day, day+6] ∩ observed
        lo = np.searchsorted(anchors, d, side="left")
        hi = np.searchsorted(anchors, d + 7, side="left")
        reps = (hi - lo).astype(np.int64)
        cum = np.cumsum(reps)
        starts = np.repeat(cum - reps, reps)
        offs = np.arange(cum[-1] if len(df) else 0) - starts
        a_idx = np.repeat(lo, reps) + offs
        return pd.DataFrame({"anchor": anchors[a_idx],
                             "user_id": np.repeat(u, reps)}) \
            .drop_duplicates()

    wau = distinct_count(
        pairs.map_batches(expand, batch_format="pandas"),
        ["anchor"], "user_id", "wau").to_pandas()
    wau["day"] = pd.to_datetime(wau["anchor"] * 86_400_000_000,
                                unit="us").dt.strftime("%Y-%m-%d")
    wau["wau"] = wau["wau"].astype(np.int64)
    return wau[["day", "wau"]].sort_values("day", ignore_index=True)


@register("monthly_unpivot", sql="""
WITH m AS (SELECT strftime(ts, '%Y-%m') AS month,
                  CAST(COUNT(*) AS BIGINT) AS hits,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
                  CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d'))
                       AS BIGINT) AS days
           FROM events GROUP BY 1)
SELECT month, metric, val
FROM m UNPIVOT (val FOR metric IN (hits, users, days))""")
def monthly_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt (the inverse of hour_type_pivot, completing the
    reshape family): the monthly wide aggregate — itself a partials
    reduce — melts to (month, metric, val) long form batch-locally.
    The melt is pure pandas on the tiny aggregate; nothing extra
    shuffles."""
    ds = _events(sf_dir, ["ts", "user_id"]).map_batches(
        _with_time_cols({"month", "date"}), batch_format="pyarrow")
    agg = reduce_sink(ds, ["month"],
                      {"hits": ("ts", "size")}).to_pandas()
    users = distinct_count(ds, ["month"], "user_id", "users").to_pandas()
    days = distinct_count(ds, ["month"], "date", "days").to_pandas()
    wide = agg.merge(users, on="month").merge(days, on="month")
    wide = wide[["month", "hits", "users", "days"]]
    for c in ["hits", "users", "days"]:
        wide[c] = wide[c].astype(np.int64)
    long = wide.melt(id_vars=["month"], var_name="metric",
                     value_name="val")
    long["val"] = long["val"].astype(np.int64)
    return long.sort_values(["month", "metric"], ignore_index=True)


@register("weighted_sample_docs", sql=r"""
WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS w
           FROM documents),
k AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
             ROUND(ln((((doc_id * 2654435761) % 4294967296) + 1)
                      / 4294967297.0) / w, 9) AS key
      FROM t WHERE w > 0)
SELECT doc_id, w FROM k ORDER BY key DESC, doc_id LIMIT 50""")
def weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis 2006: top-k by u^(1/w), here the order-equivalent
    ln(u)/w): u comes from the same Knuth multiplicative hash the
    shuffle oracle uses, so the draw is reproducible across runs,
    cluster sizes AND engines. Per-batch local top-k partials are
    mergeable (block-layout invariant); keys round to 9 dp with a
    doc_id tiebreak so libm ulp differences can't flip the cut."""
    k = 50

    def partial(t: pa.Table) -> pd.DataFrame:
        w = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = w > 0
        ids, w = ids[m], w[m]
        u = ((ids * 2654435761) % 4294967296 + 1) / 4294967297.0
        key = textstats.round_half_away(np.log(u) / w, 9)
        df = pd.DataFrame({"doc_id": ids, "w": w, "key": key})
        return df.sort_values(["key", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    cand = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["key", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(k)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["w"] = out["w"].astype(np.int64)
    return out[["doc_id", "w"]].reset_index(drop=True)


_SKEW_VERSION = 2


def _skewed_dir() -> str:
    """Deterministic zipf-ish join fixture (60% of probe rows share one
    hot key) — built once per user under /tmp, same publish convention
    as the evolved store. x values are dyadic (int/64) so float sums
    are EXACT under any summation order — the join's output block
    order varies run to run, and a non-dyadic sum at a rounding
    boundary would flip the last digit against the oracle."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_skew_u{uid}_v{_SKEW_VERSION}")
    marker = os.path.join(d, "dim.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(3)
        n = 20000
        k = np.where(rng.random(n) < 0.6, 7,
                     rng.integers(0, 50, n)).astype(np.int64)
        probe = pa.table({"k": k,
                          "rid": np.arange(n, dtype=np.int64),
                          "x": rng.integers(-6400, 6400, n) / 64.0})
        dim = pa.table({"rk": np.arange(50, dtype=np.int64),
                        "y": np.arange(50, dtype=np.float64) * 2.0})
        for name, t in [("probe", probe), ("dim", dim)]:
            tmp = os.path.join(d, f".{name}-{os.getpid()}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.parquet"))
    return d


@register("skewed_join_totals", sql=None)  # filled in below
def skewed_join_totals(sf_dir: str) -> pd.DataFrame:
    """Salted skew join (stages/join.py:skew_join): 60% of probe rows
    share one hot key, which a plain hash join funnels through a
    single partition; salting spreads the hot key across num_salts
    sub-partitions while the build side replicates only its hot rows —
    every pair still meets exactly once (the per-key totals prove it
    against DuckDB's join over the same files)."""
    from webalizer_ray.stages.join import skew_join

    d = _skewed_dir()
    probe = rd.read_parquet(f"{d}/probe.parquet")
    dim = rd.read_parquet(f"{d}/dim.parquet")
    j = skew_join(probe, dim, on="k", right_on="rk", salt_src="rid",
                  num_salts=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False).agg(
            n=("rid", "size"), xs=("x", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = reduce_sink(j.map_batches(partial, batch_format="pandas"),
                      ["k"], {"n": ("n", "sum"), "xs": ("xs", "sum")}) \
        .to_pandas()
    # multiply by y ONCE after the full sum — SUM(x) * y in oracle order
    dim_pd = pq.read_table(f"{d}/dim.parquet").to_pandas()
    agg = agg.merge(dim_pd, left_on="k", right_on="rk")
    agg["n"] = agg["n"].astype(np.int64)
    agg["xy_sum"] = textstats.round_half_away(
        agg["xs"].to_numpy(np.float64) * agg["y"].to_numpy(np.float64), 2)
    return agg[["k", "n", "xy_sum"]].sort_values("k", ignore_index=True)


REGISTRY["skewed_join_totals"] = (
    skewed_join_totals,
    f"""SELECT k, COUNT(*) AS n, ROUND(SUM(x) * y, 2) AS xy_sum
FROM read_parquet('{os.path.join(tempfile.gettempdir(), "wr_skew_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_SKEW_VERSION))}/probe.parquet') p
JOIN read_parquet('{os.path.join(tempfile.gettempdir(), "wr_skew_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_SKEW_VERSION))}/dim.parquet') d
  ON k = rk
GROUP BY k, y""")


_EVOLVED_VERSION = 1


def _evolved_dir() -> str:
    """Deterministic 3-generation parquet store whose schema widened
    over time (gen1: id,val · gen2: +tag · gen3: +score) — the
    schema-evolution fixture, built once per user under /tmp with the
    same atomic-publish convention as _media_ds."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_evolved_u{uid}_v{_EVOLVED_VERSION}")
    marker = os.path.join(d, "gen3.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        ids1 = np.arange(0, 100, dtype=np.int64)
        ids2 = np.arange(100, 200, dtype=np.int64)
        ids3 = np.arange(200, 300, dtype=np.int64)
        gens = [
            ("gen1", pa.table({"id": ids1, "val": ids1 * 0.5})),
            ("gen2", pa.table({"id": ids2, "val": ids2 * 0.5,
                               "tag": pa.array([f"t{i % 3}"
                                                for i in ids2])})),
            ("gen3", pa.table({"id": ids3, "val": ids3 * 0.5,
                               "tag": pa.array([f"t{i % 3}"
                                                for i in ids3]),
                               "score": ids3 * 0.25})),
        ]
        for name, t in gens:
            tmp = os.path.join(d, f".{name}-{os.getpid()}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.parquet"))
    return d


@register("evolved_store_profile", sql=None)  # filled in below
def evolved_store_profile(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution read (union-by-name): three file generations
    with widening schemas unify from footers only; missing columns
    materialize as typed nulls in a zero-copy Arrow align pass; the
    profile reduces as per-batch scalar partials. Oracle: DuckDB's own
    read_parquet(..., union_by_name=true) over the same files."""
    from webalizer_ray.sources.readers import read_parquet_unified

    ds = read_parquet_unified(_evolved_dir())

    def partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": [np.int64(t.num_rows)],
            "n_tag": [np.int64(t.num_rows - t["tag"].null_count)],
            "n_score": [np.int64(t.num_rows - t["score"].null_count)],
            "val_sum": [float(pc.sum(t["val"]).as_py() or 0.0)]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_rows": [np.int64(p["n_rows"].sum())],
        "n_tag": [np.int64(p["n_tag"].sum())],
        "n_score": [np.int64(p["n_score"].sum())],
        "val_sum": [float(textstats.round_half_away(
            float(p["val_sum"].sum()), 2))]})


# the oracle reads the same deterministic fixture path via DuckDB's
# union_by_name (built on first query() call; queries run before oracles)
REGISTRY["evolved_store_profile"] = (
    evolved_store_profile,
    f"""SELECT COUNT(*) AS n_rows, COUNT(tag) AS n_tag,
       COUNT(score) AS n_score, ROUND(SUM(val), 2) AS val_sum
FROM read_parquet('{os.path.join(tempfile.gettempdir(), "wr_evolved_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_EVOLVED_VERSION))}/*.parquet', union_by_name=true)""")


_BM25_INDEX_VERSION = 1


def _bm25_index_dir(sf_dir: str) -> str:
    """Per-(user, corpus, version) index path; build once, reuse —
    the index store is the point of the indexed path."""
    import hashlib
    docs = f"{sf_dir}/documents.parquet"
    st = os.stat(docs)
    tag = hashlib.sha1(
        f"{os.path.abspath(docs)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_BM25_INDEX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_bm25idx_u{uid}_{tag}")


@register("bm25_search_indexed", sql=None)  # oracle attached below
def bm25_search_indexed(sf_dir: str) -> pd.DataFrame:
    """BM25 over a PERSISTED term-sharded inverted index
    (stages/invindex.py): the corpus scan is paid once at build; a
    query reads only the term-hash buckets its terms live in, with a
    term predicate pushed into the scan — query cost ∝ matched
    postings, not corpus size. Same scoring math and oracle as
    bm25_search (the scan path); df comes from the postings in hand."""
    from webalizer_ray.stages.invindex import build_index, query_index

    idx = _bm25_index_dir(sf_dir)
    if not os.path.exists(os.path.join(idx, "_meta.json")):
        build_index(_docs(sf_dir, ["doc_id", "text"]), idx)
    return query_index(idx, list(_BM25_TERMS), k=10)


#: Morton interleave as a generated SQL expression (bit i of x at 2i,
#: bit i of y at 2i+1) — integer arithmetic, exact on both sides.
_Z_BITS = 12
_Z_EXPR = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS))


@register("zorder_curve_hist", sql=f"""
WITH q AS (SELECT CAST(hour(ts) AS BIGINT) AS x,
                  CAST(NTILE(4096) OVER (ORDER BY value, event_id) - 1
                       AS BIGINT) AS y
           FROM events),
z AS (SELECT ({_Z_EXPR}) AS z FROM q)
SELECT CAST(z >> 12 AS BIGINT) AS zbucket, COUNT(*) AS n
FROM z GROUP BY zbucket""")
def zorder_curve_hist(sf_dir: str) -> pd.DataFrame:
    """Z-order curve assignment (the OPTIMIZE ZORDER BY layout key):
    hour × value-NTILE interleaved into a Morton code, histogrammed by
    curve bucket. The NTILE quantization rides the distributed ORDER BY
    rank (scan.global_rank — only bucket counts reach the driver), the
    interleave is a vectorized per-batch transform, and only (zbucket,
    n) partials shuffle. stages/layout.py applies the same curve as a
    physical re-layout; the pruning win is asserted in tests from
    parquet footer stats."""
    from webalizer_ray.stages.layout import interleave_bits2

    ds = _events(sf_dir, ["event_id", "ts", "value"]).map_batches(
        _with_time_cols({"hour"}), batch_format="pyarrow")
    n_rows = _events(sf_dir, ["event_id"]).count()
    ranked = scan.global_rank(ds, "value", "event_id", num_buckets=16)

    k = 4096
    q, rem = divmod(n_rows, k)
    big = rem * (q + 1)

    def zbucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rnk"].to_numpy(np.int64)
        ntile = np.where(r <= big, (r - 1) // max(q + 1, 1) + 1,
                         rem + (r - big - 1) // max(q, 1) + 1)
        z = interleave_bits2(df["hour"].to_numpy(np.int64),
                             ntile.astype(np.int64) - 1, bits=_Z_BITS)
        return pd.DataFrame({"zbucket": z >> 12,
                             "one": np.ones(len(df), np.int64)})

    agg = reduce_sink(ranked.map_batches(zbucket, batch_format="pandas"),
                      ["zbucket"], {"n": ("one", "sum")}).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values("zbucket", ignore_index=True)


# the indexed path must reproduce the scan path bit-for-bit → same oracle
REGISTRY["bm25_search_indexed"] = (bm25_search_indexed,
                                   REGISTRY["bm25_search"][1])


@register("bm25_search_index_appended", sql=None)  # oracle attached below
def bm25_search_index_appended(sf_dir: str) -> pd.DataFrame:
    """Incremental index MAINTENANCE: build the inverted index over 3/4
    of the corpus, append_index the remaining 1/4 as a second segment
    (no rebuild — the LSM pattern), query the segmented index. The
    oracle is the FULL-corpus bm25_search SQL, so the green row proves
    append+query ≡ rebuild bit-for-bit (collection stats are summed
    across segments, df comes from the unioned postings). Fresh scratch
    store per invocation — the append is what's under test."""
    import shutil

    from webalizer_ray.stages.invindex import (
        append_index,
        build_index,
        query_index,
    )

    idx = tempfile.mkdtemp(prefix="wr_bm25app_")
    try:
        def part(keep_mod0: bool):
            def f(t: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(3)),
                             pa.scalar(0))
                return t.filter(m if keep_mod0 else pc.invert(m))
            return f

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        build_index(docs.map_batches(part(False),
                                     batch_format="pyarrow"), idx)
        append_index(docs.map_batches(part(True),
                                      batch_format="pyarrow"),
                     idx, run_tag="r2")
        return query_index(idx, list(_BM25_TERMS), k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


REGISTRY["bm25_search_index_appended"] = (bm25_search_index_appended,
                                          REGISTRY["bm25_search"][1])


@register("mmr_diverse_topk", sql=None)  # greedy iterative — not SQL
def mmr_diverse_topk(sf_dir: str) -> pd.DataFrame:
    """Diversity-aware retrieval (Maximal Marginal Relevance, SIGIR'98
    — the dedup-at-serving-time counterpart of the corpus dedup ops):
    distributed relevance top-pool partials feed a driver-side greedy
    loop over the tiny pool. Rows-only; pytest proves λ=1 reduces to
    plain top-k and that a planted near-duplicate is demoted."""
    from webalizer_ray.stages.ann import mmr_select

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))
                   ["embedding"].to_pylist()[0], np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return mmr_select(ds, q, k=5, pool=50, lam=0.7)


@register("incremental_fuzzy_dedup_counts", sql=None)  # MinHash — not SQL
def incremental_fuzzy_dedup_counts(sf_dir: str) -> pd.DataFrame:
    """Cross-run FUZZY dedup (near-dup corpus refresh): run A feeds
    the first 60% of the corpus; run B feeds the rest plus 15 planted
    light edits of run-A docs. The band/signature stores persist
    between runs (idempotent run-tagged files — a rerun of the same
    round converges to identical bytes), candidates come from LSH band
    collisions against PRIOR runs only, and the verify is a
    distributed signature merge. The planted near-dups must be exactly
    the drops."""
    import shutil

    from webalizer_ray.stages.dedup import incremental_minhash_dedup

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cut = int(len(docs) * 0.6)
    run_a = docs.iloc[:cut]
    edits = docs.iloc[:15].copy()
    edits["doc_id"] = edits["doc_id"] + 100_000
    edits["text"] = edits["text"] + " zz"
    run_b = pd.concat([docs.iloc[cut:], edits], ignore_index=True)

    # per-invocation scratch store: the query itself stays fully
    # deterministic (re-invocations can't see earlier rounds' files);
    # cross-run persistence semantics are covered by the store's own
    # tests (test_incremental_fuzzy.py)
    store = tempfile.mkdtemp(prefix="wr_fz_")
    try:
        rows = []
        for rid, frame in [("a", run_a), ("b", run_b)]:
            kept, drops = incremental_minhash_dedup(
                rd.from_pandas(frame), store, rid, threshold=0.5)
            rows.append({"round": rid,
                         "input_docs": np.int64(len(frame)),
                         "kept": np.int64(len(kept)),
                         "dropped": np.int64(len(drops))})
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@register("compression_ratio_docs", sql=None)  # zlib — not SQL
def compression_ratio_docs(sf_dir: str) -> pd.DataFrame:
    """Compressibility quality signal (Gopher-family filter: templated
    or repetitive text deflates far below natural prose): per-doc zlib
    ratio as a stateless map_batches pass — per-payload C-speed
    compression is inherent row work, same exemption as media decode.
    Rows-only; pytest plants repetitive-vs-natural texts."""
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.add_compression_ratio, batch_format="pandas") \
        .to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "compression_ratio"]] \
        .sort_values("doc_id", ignore_index=True)


@register("dup_cluster_sizes", sql=None)  # composition over LSH clusters
def dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Duplicate-cluster size histogram (the dedup report's headline
    table): connected components over the MinHash candidate graph,
    folded to (cluster_size, n_clusters). Pure composition of
    oracle/pytest-covered pieces; only (node, label) rows then the
    tiny histogram shuffle."""
    cl = minhash_dup_clusters(sf_dir)
    sizes = cl.groupby("cluster_id").size()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({
        "cluster_size": hist.index.to_numpy(np.int64),
        "n_clusters": hist.to_numpy(np.int64)})


_VEC_INDEX_VERSION = 1


def _vec_index_dir(sf_dir: str) -> str:
    """Per-(user, corpus, version) IVF store path; build once, reuse —
    the persisted store is the point of the indexed path."""
    import hashlib
    emb = f"{sf_dir}/embeddings.parquet"
    st = os.stat(emb)
    tag = hashlib.sha1(
        f"{os.path.abspath(emb)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_VEC_INDEX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_vecidx_u{uid}_{tag}")


@register("ann_topk_indexed", sql=None)  # oracle attached below
def ann_topk_indexed(sf_dir: str) -> pd.DataFrame:
    """Cosine top-k over a PERSISTED IVF cell store
    (stages/vecindex.py): clustering is paid once at build; a query
    loads only the k x d centroid matrix and scans JUST its probed
    cell= directories. Probing ALL cells here makes the answer exactly
    the brute-force scan's — same oracle as ann_topk; the pruning win
    at nprobe < k is proven by the delete-unprobed-cells test."""
    from webalizer_ray.stages import vecindex

    idx = _vec_index_dir(sf_dir)
    if not os.path.exists(os.path.join(idx, "_meta.json")):
        vecindex.build(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]), idx)
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    out = vecindex.query(idx, queries, k=5, nprobe=None)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]] \
        .sort_values(["query_id", "rank"], ignore_index=True)


REGISTRY["ann_topk_indexed"] = (ann_topk_indexed, REGISTRY["ann_topk"][1])


@register("events_stats_meta", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(value), 2) AS value_min, ROUND(MAX(value), 2) AS value_max,
       CAST(MIN(user_id) AS BIGINT) AS user_id_min,
       CAST(MAX(user_id) AS BIGINT) AS user_id_max,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS ts_min,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS ts_max
FROM events""")
def events_stats_meta(sf_dir: str) -> pd.DataFrame:
    """COUNT/MIN/MAX from parquet FOOTERS only (aggregate pushdown to
    row-group statistics, sources/readers.py:footer_aggregate): O(files)
    footer reads instead of O(rows) data bytes — the test suite proves
    no data page is touched by corrupting them all in place. Exact:
    stat-less columns fall back to a pruned per-file scan."""
    from webalizer_ray.sources.readers import footer_aggregate

    out = footer_aggregate(f"{sf_dir}/events.parquet",
                           ["value", "user_id", "ts"])
    return pd.DataFrame({
        "n_rows": out["n_rows"].astype(np.int64),
        "value_min": out["value_min"].astype(np.float64).round(2),
        "value_max": out["value_max"].astype(np.float64).round(2),
        "user_id_min": out["user_id_min"].astype(np.int64),
        "user_id_max": out["user_id_max"].astype(np.int64),
        "ts_min": [out["ts_min"][0].strftime("%Y-%m-%d %H:%M:%S.%f")],
        "ts_max": [out["ts_max"][0].strftime("%Y-%m-%d %H:%M:%S.%f")],
    })


@register("scd2_order_segments", sql="""
WITH dim AS (
  SELECT c_custkey, gen,
         CASE gen WHEN 0 THEN TIMESTAMP '1970-01-01'
                  WHEN 1 THEN TIMESTAMP '1996-01-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  ELSE TIMESTAMP '1998-06-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY END AS vfrom,
         CASE gen WHEN 0 THEN TIMESTAMP '1996-01-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  WHEN 1 THEN TIMESTAMP '1998-06-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  ELSE TIMESTAMP '2200-01-01' END AS vto
  FROM customer CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS gen))
SELECT CAST(d.gen AS BIGINT) AS gen, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.vfrom AND o.o_orderdate < d.vto
GROUP BY gen""")
def scd2_order_segments(sf_dir: str) -> pd.DataFrame:
    """SCD2 temporal-validity join (stages/join.py:temporal_join):
    orders pick the customer-segment GENERATION valid at order date —
    point-in-time-correct enrichment, the thing a current-values join
    gets wrong. Dimension = 3 deterministic generations per customer
    with boundaries derived arithmetically from the key (identical
    expression in the oracle). Revenue in integer cents so sums are
    exact under any summation order."""
    from webalizer_ray.stages.join import temporal_join

    day_us = np.int64(86_400_000_000)

    def gen_dim(df: pd.DataFrame) -> pd.DataFrame:
        c = np.repeat(df["c_custkey"].to_numpy(np.int64), 3)
        g = np.tile(np.array([0, 1, 2], np.int64), len(df))
        off = (c % 365) * day_us
        b1 = np.datetime64("1996-01-01", "us").astype(np.int64) + off
        b2 = np.datetime64("1998-06-01", "us").astype(np.int64) + off
        lo = np.datetime64("1970-01-01", "us").astype(np.int64)
        hi = np.datetime64("2200-01-01", "us").astype(np.int64)
        vfrom = np.where(g == 0, lo, np.where(g == 1, b1, b2))
        vto = np.where(g == 0, b1, np.where(g == 1, b2, hi))
        return pd.DataFrame({
            "o_custkey": c, "gen": g,
            "valid_from": vfrom.astype("datetime64[us]"),
            "valid_to": vto.astype("datetime64[us]")})

    dim = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"]) \
        .map_batches(gen_dim, batch_format="pandas")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "ts": df["o_orderdate"],
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})

    facts = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(cents, batch_format="pandas")

    joined = temporal_join(facts, dim, key="o_custkey", ts_col="ts",
                           how="inner")
    out = reduce_sink(joined, ["gen"],
                      {"n_orders": ("cents", "size"),
                       "revenue_cents": ("cents", "sum")}).to_pandas()
    out["gen"] = out["gen"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("gen", ignore_index=True)


_VSTORE_VERSION = 2


def _vstore_dir(sf_dir: str) -> str:
    import hashlib
    cust = f"{sf_dir}/customer.parquet"
    st = os.stat(cust)
    tag = hashlib.sha1(
        f"{os.path.abspath(cust)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_VSTORE_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_vstore_u{uid}_{tag}")


def _build_vstore(sf_dir: str) -> str:
    """Deterministic 3-version store from customer: v1 = base
    (k, cents); v2 deletes k%7==0 and bumps k%5==0 by +10000; v3
    upserts k%3==0 to 555+k (re-inserting the k%21==0 keys v2
    deleted). Built once per (user, corpus, version); atomic
    staging+rename publish."""
    from webalizer_ray.state import versioned_store as vs

    out = _vstore_dir(sf_dir)
    if os.path.isdir(os.path.join(out, "_log")):
        return out

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"k": k, "grp": k % 10, "cents": cents})

    def delta2(df: pd.DataFrame) -> pd.DataFrame:
        r = base_rows(df)
        dele = r[r["k"] % 7 == 0].copy()
        dele["op"] = "delete"
        ups = r[(r["k"] % 5 == 0) & (r["k"] % 7 != 0)].copy()
        ups["cents"] = ups["cents"] + 10000
        ups["op"] = "upsert"
        out_ = pd.concat([dele, ups], ignore_index=True)
        out_["seq"] = out_["k"].to_numpy(np.int64)
        return out_[["k", "grp", "cents", "seq", "op"]]

    def delta3(df: pd.DataFrame) -> pd.DataFrame:
        r = base_rows(df)
        ups = r[r["k"] % 3 == 0].copy()
        ups["cents"] = 555 + ups["k"].to_numpy(np.int64)
        ups["op"] = "upsert"
        ups["seq"] = ups["k"].to_numpy(np.int64)
        return ups[["k", "grp", "cents", "seq", "op"]]

    cust = lambda: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    staging = out + f".staging-{os.getpid()}"
    import shutil
    shutil.rmtree(staging, ignore_errors=True)
    vs.init(cust().map_batches(base_rows, batch_format="pandas"),
            staging, key="k", num_buckets=8)
    vs.commit_changes(staging,
                      cust().map_batches(delta2, batch_format="pandas"))
    vs.commit_changes(staging,
                      cust().map_batches(delta3, batch_format="pandas"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("time_travel_counts", sql="""
WITH v1 AS (SELECT c_custkey AS k,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer),
u2 AS (SELECT k, cents + 10000 AS cents FROM v1
       WHERE k % 5 = 0 AND k % 7 <> 0),
v2 AS (SELECT k, cents FROM v1
       WHERE k % 7 <> 0 AND NOT (k % 5 = 0 AND k % 7 <> 0)
       UNION ALL SELECT k, cents FROM u2),
u3 AS (SELECT k, 555 + k AS cents FROM v1 WHERE k % 3 = 0),
v3 AS (SELECT k, cents FROM v2 WHERE k % 3 <> 0
       UNION ALL SELECT k, cents FROM u3)
SELECT * FROM (
  SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(cents) AS BIGINT) AS cents_sum FROM v1
  UNION ALL
  SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v2
  UNION ALL
  SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v3)
ORDER BY version""")
def time_travel_counts(sf_dir: str) -> pd.DataFrame:
    """Time travel over the versioned store (state/versioned_store.py):
    three committed versions read AS OF each version — one log-entry
    read resolves the exact immutable file list, no replay; the oracle
    reconstructs each version relationally from the same deterministic
    delta definitions. Integer cents so sums are exact in any order."""
    from webalizer_ray.state import versioned_store as vs

    store = _build_vstore(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [np.int64(len(df))],
            "s": [np.int64(df["cents"].sum()) if len(df) else np.int64(0)]})

    rows = []
    for v in (1, 2, 3):
        p = vs.read(store, v).map_batches(
            partial, batch_format="pandas").to_pandas()
        rows.append({"version": np.int64(v),
                     "n_rows": np.int64(p["n"].sum()),
                     "cents_sum": np.int64(p["s"].sum())})
    return pd.DataFrame(rows)


def best_sse_split(y: np.ndarray) -> tuple[int, float, float, float]:
    """Single change point by two-segment least squares: the split i
    (1-based, left segment = first i points) minimizing
    SSE(left)+SSE(right), computed in closed form from cumulative
    sums — O(T), no per-split re-scan. Cost rounded to 6 dp with
    smaller-i tiebreak so engines cannot disagree on hairline ties.
    Returns (i, cost, mean_before, mean_after)."""
    y = np.asarray(y, np.float64)
    n = len(y)
    if n < 2:
        raise ValueError("need >= 2 points")
    cs = np.cumsum(y)
    cs2 = np.cumsum(y * y)
    i = np.arange(1, n, dtype=np.float64)
    left = cs2[:-1] - cs[:-1] ** 2 / i
    right = (cs2[-1] - cs2[:-1]) - (cs[-1] - cs[:-1]) ** 2 / (n - i)
    cost = np.round(left + right, 6)
    k = int(np.argmin(cost))  # first minimum = smallest split index
    return (k + 1, float(cost[k]), float(cs[k] / (k + 1)),
            float((cs[-1] - cs[k]) / (n - k - 1)))


@register("changepoint_day", sql="""
WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY day),
ord AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i,
               COUNT(*) OVER () AS n,
               SUM(y) OVER (ORDER BY day) AS cs,
               SUM(y * y) OVER (ORDER BY day) AS cs2,
               SUM(y) OVER () AS tot, SUM(y * y) OVER () AS tot2
        FROM daily),
costs AS (SELECT day, i, ROUND((cs2 - cs * cs / i)
                 + ((tot2 - cs2) - (tot - cs) * (tot - cs) / (n - i)),
                 6) AS cost,
                 ROUND(cs / i, 4) AS mean_before,
                 ROUND((tot - cs) / (n - i), 4) AS mean_after
          FROM ord WHERE i < n)
SELECT day AS change_day, cost, mean_before, mean_after
FROM costs ORDER BY cost, i LIMIT 1""")
def changepoint_day(sf_dir: str) -> pd.DataFrame:
    """Change-point detection (two-segment least squares — the k=1
    case of binary segmentation / PELT): the level-shift monitor a
    telemetry pipeline runs on its daily volumes. Scale shape: the
    heavy work is ONE distributed daily-count reduce (the series is
    O(days) regardless of corpus size); the closed-form cumulative-sum
    scan runs on that tiny series driver-side — and is fully
    SQL-expressible, so the whole detector is oracle-backed."""
    ds = _events(sf_dir, ["ts"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    daily = reduce_sink(ds, ["date"], {"y": ("ts", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    y = daily["y"].to_numpy(np.float64)
    i, cost, mb, ma = best_sse_split(y)
    return pd.DataFrame({
        "change_day": [daily["date"].iloc[i - 1]],
        "cost": [round(cost, 6)],
        "mean_before": [round(mb, 4)],
        "mean_after": [round(ma, 4)]})


@register("ann_topk_pq", sql=None)  # quantized/approximate — not SQL
def ann_topk_pq(sf_dir: str) -> pd.DataFrame:
    """PQ/ADC cosine top-k (Jégou et al. TPAMI'11): vectors stored as
    16 uint8 codes (16x smaller than float32 — the scan/shuffle tier
    below SQ8's 4x); each query builds ONE (m, ks) partial-dot lookup
    table and every data vector costs m table lookups. Rows-only
    (quantized); pytest pins recall >= 0.6 vs the exact path at these
    params (0.87 measured)."""
    from webalizer_ray.stages import quant

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cb = quant.pq_train(ds, m=16, ks=256)
    out = quant.pq_topk(quant.pq_encode(ds, cb), cb, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out.sort_values(["query_id", "rank"], ignore_index=True)


@register("forget_user_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       COUNT(DISTINCT user_id) AS users
FROM events WHERE user_id % 13 <> 0
GROUP BY event_type""")
def forget_user_counts(sf_dir: str) -> pd.DataFrame:
    """Right-to-be-forgotten (state/forget.py:scrub_parquet_dir): a
    COPY of the events table is physically scrubbed of every user with
    user_id %% 13 == 0 (key list derived from footer-only max — the
    GDPR request list stand-in), then aggregated from the scrubbed
    FILES — proving erasure happened in the bytes, not in a filter.
    Files without hits are skipped untouched (mtime-tested)."""
    import shutil

    from webalizer_ray.sources.readers import footer_aggregate
    from webalizer_ray.state.forget import scrub_parquet_dir

    work = tempfile.mkdtemp(prefix="wr_forget_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet",
                    os.path.join(work, "events.parquet"))
        umax = int(footer_aggregate(work, ["user_id"])["user_id_max"][0])
        keys = np.arange(0, umax + 1, 13, dtype=np.int64)
        scrub_parquet_dir(work, "user_id", keys)
        ds = rd.read_parquet(work, columns=["event_type", "user_id"])
        agg = reduce_sink(ds, ["event_type"],
                          {"hits": ("user_id", "size")}).to_pandas()
        users = distinct_count(ds, ["event_type"], "user_id",
                               "users").to_pandas()
        out = agg.merge(users, on="event_type")
        out["hits"] = out["hits"].astype(np.int64)
        out["users"] = out["users"].astype(np.int64)
        return out.sort_values("event_type", ignore_index=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- TPC-H join-breadth family: Q5 / Q10 / Q18 shapes ---------------------
# Float discipline: revenue = l_extendedprice * (1 - l_discount) is a
# ≤4-dp decimal; CAST(ROUND(rev * 10000) AS BIGINT) makes every revenue
# an exact int64 so group sums cannot depend on summation order.

@register("tpch_q5_region_revenue", sql="""
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_dm,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""")
def tpch_q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (6-table local-supplier volume): the date
    predicate is pushed into the orders scan; customer rides a
    distributed/auto join; the big lineitem side joins on orderkey;
    supplier and the ASIA nation/region dims are tiny and broadcast
    once (ray.put dicts in a map-side filter implementing the
    c_nationkey = s_nationkey correlation) — the fact table never
    shuffles for the dimension predicates."""
    import datetime as _dt

    import pyarrow.dataset as pds

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = nat.merge(reg[reg["r_name"] == "ASIA"],
                     left_on="n_regionkey", right_on="r_regionkey")
    nk2name = dict(zip(asia["n_nationkey"].astype(int),
                       asia["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk2nk_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_nationkey"].astype(int))))
    nk2name_ref = ray.put(nk2name)

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1997, 1, 1))))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    ordc = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(rev_dm, batch_format="pandas")
    joined = auto_join(items, ordc, on="l_orderkey",
                       right_on="o_orderkey")

    def local_filter(df: pd.DataFrame) -> pd.DataFrame:
        sk2nk = ray.get(sk2nk_ref)
        nknm = ray.get(nk2name_ref)
        snk = df["l_suppkey"].map(sk2nk)
        keep = snk.eq(df["c_nationkey"]) & snk.isin(nknm.keys())
        df = df[keep]
        return pd.DataFrame({
            "n_name": df["l_suppkey"].map(sk2nk).map(nknm),
            "rev_dm": df["rev_dm"].to_numpy(np.int64)})

    out = reduce_sink(joined.map_batches(local_filter,
                                         batch_format="pandas"),
                      ["n_name"], {"revenue_dm": ("rev_dm", "sum"),
                                   "n_items": ("rev_dm", "size")}) \
        .to_pandas()
    if "n_name" not in out.columns:
        # Ray drops the schema of all-empty block sets on
        # to_pandas(); zero qualifying flows is a legal tiny-scale
        # answer
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype=object),
             "revenue_dm": pd.Series([], dtype=np.int64),
             "n_items": pd.Series([], dtype=np.int64)})
    out["revenue_dm"] = out["revenue_dm"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("n_name", ignore_index=True)


@register("tpch_q10_returned_revenue", sql="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT)) AS BIGINT) AS revenue_dm
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_dm DESC, c.c_custkey LIMIT 20""")
def tpch_q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item revenue, top 20 customers):
    returnflag pushed into the lineitem scan and the date window into
    orders; revenue pre-reduces PER CUSTKEY before the customer
    dimension is consulted, so the top-N works on |customers| rows and
    the name/nation attributes join only onto the 20 winners (driver-
    side merge of a broadcast-scale dim). Integer revenue makes the
    DESC/custkey tiebreak engine-stable."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1996, 7, 1))))

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R") \
        .map_batches(rev_dm, batch_format="pandas")
    joined = auto_join(items, orders, on="l_orderkey",
                       right_on="o_orderkey")
    per_cust = reduce_sink(joined, ["o_custkey"],
                           {"revenue_dm": ("rev_dm", "sum")}).to_pandas()
    per_cust["revenue_dm"] = per_cust["revenue_dm"].astype(np.int64)
    top = per_cust.sort_values(["revenue_dm", "o_custkey"],
                               ascending=[False, True],
                               kind="mergesort").head(20)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out = out.sort_values(["revenue_dm", "c_custkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["c_custkey", "c_name", "n_name", "revenue_dm"]] \
        .reset_index(drop=True)


@register("tpch_q18_large_orders", sql="""
WITH big AS (SELECT l_orderkey,
                    CAST(SUM(l_quantity) AS BIGINT) AS qty
             FROM lineitem GROUP BY l_orderkey
             HAVING SUM(l_quantity) > 300)
SELECT c.c_custkey, b.l_orderkey AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       b.qty
FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_cents DESC, o_orderkey LIMIT 100""")
def tpch_q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume orders — HAVING over a grouped
    fact): per-order quantity sums reduce distributedly (only
    (orderkey, qty) partials shuffle), the HAVING filter shrinks the
    set to the rare giants, and ONLY those survivors join back to
    orders/customer (broadcast-scale after the filter). Quantities and
    cents are integers — exact under any order."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qty_int(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy(np.float64))
            .astype(np.int64)})

    per_order = reduce_sink(li.map_batches(qty_int,
                                           batch_format="pandas"),
                            ["l_orderkey"], {"qty": ("qty", "sum")})
    # vectorized HAVING — a row-lambda filter here costs a Python call
    # per order (measured 26 s → 4 s at sf0.1)
    big = per_order.map_batches(lambda df: df[df["qty"] > 300],
                                batch_format="pandas")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])
    joined = auto_join(orders, big, on="o_orderkey",
                       right_on="l_orderkey").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    out = joined.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["total_cents"] = np.rint(
        out["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
    out["orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    out["qty"] = out["qty"].astype(np.int64)
    out = out.sort_values(["total_cents", "o_orderkey"],
                          ascending=[False, True],
                          kind="mergesort").head(100)
    return out[["c_custkey", "o_orderkey", "orderdate", "total_cents",
                "qty"]].reset_index(drop=True)


@register("peak_concurrent_sessions", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
      FROM sid GROUP BY user_id, sid),
b AS (SELECT st AS ts, 1 AS pos, 0 AS neg FROM s
      UNION ALL SELECT en, 0, 1 FROM s),
g AS (SELECT ts, SUM(pos) AS pos, SUM(neg) AS neg FROM b GROUP BY ts),
c AS (SELECT ts,
             SUM(pos - neg) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
               - (pos - neg) + pos AS conc
      FROM g)
SELECT CAST(conc AS BIGINT) AS peak,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS peak_ts
FROM c ORDER BY conc DESC, ts LIMIT 1""")
def peak_concurrent_sessions(sf_dir: str) -> pd.DataFrame:
    """Peak concurrency (the classic +1/-1 interval sweep — 'how many
    sessions were live at once, and when first'): sessions reduce to
    intervals inside the user-hash bucket, intervals flat-map to
    per-timestamp (starts, ends) partials, and the global running sum
    rides the TWO-LEVEL range prefix scan (stages/scan.py — bucket
    totals, driver offsets over O(buckets) rows, per-bucket cumsum) so
    no single task ever sees the whole boundary stream. Tie rule:
    starts apply before ends at an equal timestamp (touching sessions
    count as concurrent) — candidate peak at t = exclusive-cumsum +
    starts(t), identical expression in the oracle."""
    sess = _sessionized_events(sf_dir)
    iv = reduce_sink(sess, ["user_id", "sid"],
                     {"st": ("ts", "min"), "en": ("ts", "max")})

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        st = df["st"].to_numpy("datetime64[us]").astype(np.int64)
        en = df["en"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "ts_us": np.concatenate([st, en]),
            "pos": np.concatenate([np.ones(len(st), np.int64),
                                   np.zeros(len(en), np.int64)]),
            "neg": np.concatenate([np.zeros(len(st), np.int64),
                                   np.ones(len(en), np.int64)])})
        return out.groupby("ts_us", as_index=False).sum()

    per_ts = reduce_sink(iv.map_batches(boundaries,
                                        batch_format="pandas"),
                         ["ts_us"], {"pos": ("pos", "sum"),
                                     "neg": ("neg", "sum")})

    def add_net(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["net"] = df["pos"] - df["neg"]
        return df

    day_us = 86_400_000_000
    cum = scan.range_prefix_sum(
        per_ts.map_batches(add_net, batch_format="pandas"),
        key_col="ts_us", val_col="net", out_col="cum_excl",
        bucket_width=day_us)

    def local_peak(df: pd.DataFrame) -> pd.DataFrame:
        cand = df["cum_excl"].to_numpy(np.int64) \
            + df["pos"].to_numpy(np.int64)
        i = int(np.lexsort((df["ts_us"].to_numpy(), -cand))[0])
        return pd.DataFrame({"peak": [np.int64(cand[i])],
                             "ts_us": [np.int64(df["ts_us"].iloc[i])]})

    p = cum.map_batches(local_peak, batch_format="pandas").to_pandas()
    p = p.sort_values(["peak", "ts_us"], ascending=[False, True],
                      kind="mergesort").head(1)
    ts = pd.Timestamp(int(p["ts_us"].iloc[0]), unit="us")
    return pd.DataFrame({
        "peak": [np.int64(p["peak"].iloc[0])],
        "peak_ts": [ts.strftime("%Y-%m-%d %H:%M:%S.%f")]})


@register("attribution_by_hour", sql="""
WITH v AS (SELECT user_id, ts AS vts, event_id AS vid FROM events
           WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'),
pairs AS (SELECT pid, vts, vid,
                 COUNT(*) OVER (PARTITION BY pid) AS n,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts, vid) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts DESC, vid DESC) AS rl
          FROM p JOIN v ON p.user_id = v.user_id
               AND v.vts <= p.pts
               AND v.vts > p.pts - INTERVAL 1 HOUR)
SELECT CAST(hour(vts) AS BIGINT) AS hour,
       CAST(SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch,
       ROUND(SUM(1.0 / n), 4) AS linear_credit
FROM pairs GROUP BY hour""")
def attribution_by_hour(sf_dir: str) -> pd.DataFrame:
    """Multi-touch attribution (first-touch / last-touch / linear —
    the three standard marketing credit models) over the 1-hour
    pre-purchase window, credited to the touch's hour of day. Both
    event streams co-locate in the user-hash bucket; ONE composite-key
    searchsorted per bucket finds every purchase's view window (no
    join explosion — expansion is bounded by views-per-hour), ties at
    equal timestamps broken by view event_id so engines agree; only
    (hour, credit) partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("purchase", "view"))].copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    hour_us = np.int64(3_600_000_000)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"hour": pd.Series([], dtype=np.int64),
                             "ft": pd.Series([], dtype=np.int64),
                             "lt": pd.Series([], dtype=np.int64),
                             "lin": pd.Series([], dtype=np.float64)})

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        is_v = (g["event_type"] == "view").to_numpy()
        if not is_v.any() or is_v.all():
            return _empty()
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        is_v = (g["event_type"] == "view").to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        # composite int64 key (user_rank * span + relative_ts): ONE
        # sorted view-key array answers every purchase window — same
        # overflow-guarded construction as view_purchase_1h_conversion
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        if int(uranks.max(initial=0) + 1) > (2 ** 63 - 1) // int(span):
            raise ValueError("composite key overflow: raise num_buckets")
        key = uranks * span + base
        vkey = key[is_v]          # nondecreasing (g sorted); ties keep
        vh = g["ts"].dt.hour.to_numpy(np.int64)[is_v]  # event_id order
        pkey = key[~is_v]
        lo = np.searchsorted(vkey, pkey - hour_us, side="right")
        hi = np.searchsorted(vkey, pkey, side="right")
        n = hi - lo
        has = n > 0
        if not has.any():
            return _empty()
        reps = n[has]
        # window expansion without a Python loop (repeat/arange trick);
        # bounded: a window holds at most one user's views of one hour
        offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
        flat = np.repeat(lo[has], reps) \
            + (np.arange(reps.sum()) - np.repeat(offs, reps))
        cat = pd.concat([
            pd.DataFrame({"hour": vh[lo[has]], "ft": np.int64(1),
                          "lt": np.int64(0), "lin": 0.0}),
            pd.DataFrame({"hour": vh[hi[has] - 1], "ft": np.int64(0),
                          "lt": np.int64(1), "lin": 0.0}),
            pd.DataFrame({"hour": vh[flat], "ft": np.int64(0),
                          "lt": np.int64(0),
                          "lin": np.repeat(1.0 / reps, reps)}),
        ], ignore_index=True)
        part = cat.groupby("hour", as_index=False).sum()
        part["ft"] = part["ft"].astype(np.int64)
        part["lt"] = part["lt"].astype(np.int64)
        return part

    parts = (ds.map_batches(keep_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(credit,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["hour"],
                      {"first_touch": ("ft", "sum"),
                       "last_touch": ("lt", "sum"),
                       "linear_credit": ("lin", "sum")}).to_pandas()
    out["first_touch"] = out["first_touch"].astype(np.int64)
    out["last_touch"] = out["last_touch"].astype(np.int64)
    out["linear_credit"] = out["linear_credit"].round(4)
    return out.sort_values("hour", ignore_index=True)


def _classifier_feats(sf_dir: str) -> rd.Dataset:
    from webalizer_ray.stages.classifier import doc_feature_frame

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        f = doc_feature_frame(df)
        q = textstats.add_quality_score(df)
        f["y"] = (q["quality_score"].to_numpy(np.float64)
                  >= 0.5).astype(np.float64)
        f["doc_id"] = df["doc_id"].to_numpy(np.int64)
        return f

    return docs.map_batches(featurize, batch_format="pandas")


@register("classifier_kfold_metrics", sql=None)  # iterative — not SQL
def classifier_kfold_metrics(sf_dir: str) -> pd.DataFrame:
    """Out-of-fold evaluation of the quality classifier: deterministic
    hash folds, per-fold IRLS training on the other k-1 folds, scalar
    accuracy/Brier partials — the no-leakage eval a model-based filter
    needs before its threshold is trusted. Rows-only (iterative);
    pytest proves fold partition, determinism and near-perfect CV
    accuracy on a separable planted set."""
    from webalizer_ray.stages.classifier import kfold_eval

    return kfold_eval(_classifier_feats(sf_dir), k=5, n_iter=10)


@register("classifier_calibration", sql=None)  # model scores — not SQL
def classifier_calibration(sf_dir: str) -> pd.DataFrame:
    """Reliability table + ECE terms for the quality classifier's
    scores: fixed-width score bins, (bin, n, sums) partials only.
    Rows-only; pytest pins the closed form on a hand-computable set
    and conservation of n across bins."""
    from webalizer_ray.stages.classifier import (
        FEATURE_COLS, _sigmoid, calibration_table, train_logreg)

    feats = _classifier_feats(sf_dir).materialize()
    w = train_logreg(feats, n_iter=10)

    def add_score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = _sigmoid(df[FEATURE_COLS].to_numpy(np.float64) @ w)
        return df

    return calibration_table(
        feats.map_batches(add_score, batch_format="pandas"))


@register("incremental_view_counts", sql="""
WITH v1 AS (SELECT c_custkey AS k, c_custkey % 10 AS grp,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer),
u2 AS (SELECT k, grp, cents + 10000 AS cents FROM v1
       WHERE k % 5 = 0 AND k % 7 <> 0),
v2 AS (SELECT k, grp, cents FROM v1
       WHERE k % 7 <> 0 AND NOT (k % 5 = 0 AND k % 7 <> 0)
       UNION ALL SELECT k, grp, cents FROM u2),
u3 AS (SELECT k, grp, 555 + k AS cents FROM v1 WHERE k % 3 = 0),
v3 AS (SELECT k, grp, cents FROM v2 WHERE k % 3 <> 0
       UNION ALL SELECT k, grp, cents FROM u3)
SELECT CAST(grp AS BIGINT) AS grp, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS s
FROM v3 GROUP BY grp""")
def incremental_view_counts(sf_dir: str) -> pd.DataFrame:
    """Incrementally-maintained materialized view
    (state/incremental_view.py): the per-group SUM/COUNT aggregate of
    the versioned store stays exact across commits by folding ONLY the
    touched buckets' old/new file partials (view(V) = view(V-1) − old
    + new) — untouched buckets contribute byte-identically because
    their files carry over by name. Oracle checks the view at the
    latest version; pytest proves incremental == full recompute and
    that untouched files are never read."""
    import shutil

    from webalizer_ray.state.incremental_view import read_view, refresh

    store = _build_vstore(sf_dir)
    view_dir = tempfile.mkdtemp(prefix="wr_iview_")
    try:
        refresh(store, view_dir, group_col="grp", val_col="cents")
        out = read_view(view_dir)
        out = out.rename(columns={"grp": "grp"})
        out["grp"] = out["grp"].astype(np.int64)
        return out.sort_values("grp", ignore_index=True)
    finally:
        shutil.rmtree(view_dir, ignore_errors=True)


@register("cumulative_users_by_day", sql="""
WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
           FROM events GROUP BY user_id),
d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY day)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d""")
def cumulative_users_by_day(sf_dir: str) -> pd.DataFrame:
    """Running distinct-user count (cumulative NDV — the 'total users
    ever seen' growth curve window frames cannot express as COUNT
    (DISTINCT) OVER): distinct collapses to each user's FIRST-SEEN day
    (one keyed min-reduce — only (user, day) partials shuffle), daily
    new-user counts follow, and the cumsum runs over the O(days)
    series on the driver."""
    ds = _events(sf_dir, ["ts", "user_id"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    first = reduce_sink(ds, ["user_id"], {"day": ("date", "min")})
    daily = reduce_sink(first, ["day"],
                        {"new_users": ("user_id", "size")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    daily["new_users"] = daily["new_users"].astype(np.int64)
    daily["cum_users"] = daily["new_users"].cumsum().astype(np.int64)
    return daily.rename(columns={"day": "day"})[
        ["day", "new_users", "cum_users"]]


_ZONEMAP_VERSION = 1


def _zonemap_dir(sf_dir: str) -> str:
    """ts-sorted 8-file re-layout of events + its zone map (the layout
    that makes time-range file pruning effective); built once per
    (user, corpus, version), atomic staging+rename."""
    import hashlib
    import shutil

    from webalizer_ray.stages.zonemap import build_zonemap

    ev = f"{sf_dir}/events.parquet"
    st = os.stat(ev)
    tag = hashlib.sha1(
        f"{os.path.abspath(ev)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_ZONEMAP_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    out = os.path.join(tempfile.gettempdir(), f"wr_zm_u{uid}_{tag}")
    if os.path.exists(os.path.join(out, "_zonemap.parquet")):
        return out
    staging = out + f".staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(os.path.join(staging, "data"))
    df = pq.read_table(ev).to_pandas() \
        .sort_values(["ts", "event_id"], ignore_index=True)
    for i, part in enumerate(np.array_split(df, 8)):
        part.to_parquet(os.path.join(staging, "data",
                                     f"f{i}.parquet"), index=False)
    build_zonemap(os.path.join(staging, "data"), ["ts", "value"],
                  os.path.join(staging, "_zonemap.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("zonemap_pruned_daily_hits", sql="""
SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS hits
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-16'
GROUP BY day""")
def zonemap_pruned_daily_hits(sf_dir: str) -> pd.DataFrame:
    """Range scan through the PERSISTED zone-map skipping index
    (stages/zonemap.py): file-level min/max rows built once from
    footers; the query reads the tiny index, skips every file whose
    interval misses the week, and pushes the same predicate into the
    surviving scans. Unknown files are never pruned; vanished mapped
    files raise. Pytest proves pruning by deleting the pruned files."""
    import datetime as _dt

    from webalizer_ray.stages.zonemap import pruned_scan

    d = _zonemap_dir(sf_dir)
    ds = pruned_scan(os.path.join(d, "data"),
                     os.path.join(d, "_zonemap.parquet"), "ts",
                     _dt.datetime(2024, 1, 10), _dt.datetime(2024, 1, 16),
                     columns=["ts"])
    out = reduce_sink(
        ds.map_batches(_with_time_cols({"date"}), batch_format="pyarrow"),
        ["date"], {"hits": ("ts", "size")}).to_pandas()
    out["hits"] = out["hits"].astype(np.int64)
    return out.rename(columns={"date": "day"}) \
        .sort_values("day", ignore_index=True)


@register("html_stripped_docs", sql=r"""
WITH aug AS (
  SELECT doc_id,
         '<html><head><script type="text/javascript">var x = 1 < 2;'
         || '</script><style>p { color: red; }</style></head><body><h1>'
         || 'Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
         || text || ' &amp; tail &lt;x&gt;</p><!-- trailing comment -->'
         || '</body></html>' AS t
  FROM documents),
clean AS (
  SELECT doc_id,
         trim(regexp_replace(
           replace(replace(replace(replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               t,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
           '\s+', ' ', 'g')) AS clean_text
  FROM aug)
SELECT doc_id, clean_text, CAST(len(clean_text) AS BIGINT) AS clean_len
FROM clean""")
def html_stripped_docs(sf_dir: str) -> pd.DataFrame:
    """HTML boilerplate extraction (the main-content step of a web
    corpus): documents wrapped in deterministic doc_id-derived HTML
    (script/style blocks, tags, comments, entities), then stripped by
    the IDENTICAL RE2 chain on both sides — byte-identical clean_text
    is the check, not just lengths (stages/textstats.py:strip_html)."""
    def augment(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = (
            '<html><head><script type="text/javascript">var x = 1 < 2;'
            "</script><style>p { color: red; }</style></head><body><h1>"
            "Doc " + df["doc_id"].astype(str) + "</h1><p>"
            + df["text"].fillna("")
            + " &amp; tail &lt;x&gt;</p><!-- trailing comment -->"
            "</body></html>")
        return df

    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(augment, batch_format="pandas") \
        .map_batches(textstats.strip_html, batch_format="pyarrow") \
        .to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["clean_len"] = out["clean_len"].astype(np.int64)
    return out[["doc_id", "clean_text", "clean_len"]] \
        .sort_values("doc_id", ignore_index=True)


_BLOOMIDX_VERSION = 1


def _bloomidx_dir(sf_dir: str) -> str:
    """user-hash-bucketed 8-file re-layout of events + a per-file
    Bloom index on user_id (point lookups prune to ~1 file); built
    once per (user, corpus, version), atomic staging+rename."""
    import hashlib
    import shutil

    from webalizer_ray.stages.zonemap import build_bloom_index

    ev = f"{sf_dir}/events.parquet"
    st = os.stat(ev)
    tag = hashlib.sha1(
        f"{os.path.abspath(ev)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_BLOOMIDX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    out = os.path.join(tempfile.gettempdir(), f"wr_bloomidx_u{uid}_{tag}")
    if os.path.exists(os.path.join(out, "_bloom.parquet")):
        return out
    staging = out + f".staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(os.path.join(staging, "data"))
    df = pq.read_table(ev).to_pandas()
    for b in range(8):
        df[df["user_id"] % 8 == b].to_parquet(
            os.path.join(staging, "data", f"b{b}.parquet"), index=False)
    build_bloom_index(os.path.join(staging, "data"), "user_id",
                      os.path.join(staging, "_bloom.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("bloom_point_user_stats", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       COUNT(DISTINCT event_type) AS types
FROM events WHERE user_id = 7""")
def bloom_point_user_stats(sf_dir: str) -> pd.DataFrame:
    """Point lookup through the PERSISTED per-file Bloom index
    (stages/zonemap.py:bloom_point_scan) over a user-bucketed layout:
    the tiny filter table routes the lookup to the files that might
    hold the key (no false negatives; the pushed equality predicate
    makes false positives wasted reads, never wrong rows). Pytest
    proves pruning by deleting the non-candidate files."""
    from webalizer_ray.stages.zonemap import bloom_point_scan

    d = _bloomidx_dir(sf_dir)
    ds = bloom_point_scan(os.path.join(d, "data"),
                          os.path.join(d, "_bloom.parquet"),
                          "user_id", np.int64(7),
                          columns=["user_id", "value", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hits": [np.int64(len(df))],
            "value_cents": [np.int64(np.rint(
                df["value"].to_numpy(np.float64) * 100).sum())
                if len(df) else np.int64(0)],
            "types": [df["event_type"].unique().tolist()]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    types = set()
    for t in p["types"]:
        types.update(t)
    return pd.DataFrame({
        "hits": [np.int64(p["hits"].sum())],
        "value_cents": [np.int64(p["value_cents"].sum())],
        "types": [np.int64(len(types))]})


@register("wap_published_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE value >= 0 GROUP BY event_type""")
def wap_published_counts(sf_dir: str) -> pd.DataFrame:
    """Write–Audit–Publish (state/wap.py): the events feed stages to
    an isolated directory, the data-contract gate audits the STAGED
    files (not-null, range, regex — one streaming pass), and only then
    does the atomic rename publish; the aggregate reads the PUBLISHED
    files, proving the gated copy is what serves. Pytest proves a
    failing batch never becomes visible."""
    import shutil

    from webalizer_ray.state.wap import write_audit_publish

    work = tempfile.mkdtemp(prefix="wr_wap_")
    out = os.path.join(work, "serving")
    try:
        ds = _events(sf_dir, ["event_id", "event_type", "value"])
        write_audit_publish(ds, out, {
            "event_id": {"not_null": True, "min": 0},
            "value": {"min": 0.0},
            "event_type": {"regex": r"^[a-z_]+$"}})
        pub = rd.read_parquet(out, columns=["event_type", "value"])

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("event_type", as_index=False).agg(
                hits=("value", "size"),
                value_cents=("value", lambda v: np.int64(
                    np.rint(v.to_numpy(np.float64) * 100).sum())))
            return g

        agg = reduce_sink(pub.map_batches(partial, batch_format="pandas"),
                          ["event_type"],
                          {"hits": ("hits", "sum"),
                           "value_cents": ("value_cents", "sum")}) \
            .to_pandas()
        agg["hits"] = agg["hits"].astype(np.int64)
        agg["value_cents"] = agg["value_cents"].astype(np.int64)
        return agg.sort_values("event_type", ignore_index=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register("dup_rate_by_threshold", sql="""
WITH p AS (SELECT ROUND(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) >= 0.3)
SELECT CAST(FLOOR(cosine * 20) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY band""")
def dup_rate_by_threshold(sf_dir: str) -> pd.DataFrame:
    """Dedup-threshold calibration curve: candidate-pair cosines
    banded into 0.05 steps — the table you read before PICKING the
    near-dup threshold (how many pairs does each cut keep?). Bands
    computed from the 6-dp-rounded similarity on both sides so band
    edges cannot flip between engines."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = dedup.cosine_dup_pairs(ds, threshold=0.3)
    band = np.floor(pairs["cosine"].to_numpy(np.float64) * 20) \
        .astype(np.int64)
    out = pd.DataFrame({"band": band}).groupby(
        "band", as_index=False).size().rename(columns={"size": "n_pairs"})
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("band", ignore_index=True)


@register("week_overlap_users_hll")
def week_overlap_users_hll(sf_dir: str) -> pd.DataFrame:
    """Sketch set algebra: estimated user overlap between the first
    two weeks via HyperLogLog inclusion–exclusion
    (|A∩B| ≈ |A| + |B| − |A∪B|, union = elementwise register max —
    the mergeable-summary answer when two 10⁹-key sets live on
    different clusters and an exact presence-flag shuffle
    (purchase_week_user_setops) is too expensive). ONE pass computes
    both weeks' sketches (a week-tag per partial); rows-only — pytest
    pins the estimate within 5% of the exact overlap."""
    import datetime as _dt

    from webalizer_ray.stages.sketch import HyperLogLog

    d0 = _dt.datetime(2024, 1, 1)
    d1 = d0 + _dt.timedelta(days=7)
    d2 = d0 + _dt.timedelta(days=14)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        ts = df["ts"]
        for tag, lo, hi in (("a", d0, d1), ("b", d1, d2)):
            u = df.loc[(ts >= lo) & (ts < hi), "user_id"].to_numpy()
            if len(u):
                h = pd.util.hash_array(u)
                out.append({"week": tag,
                            "hll": HyperLogLog.from_hashes(h).to_bytes()})
        return pd.DataFrame(
            {"week": pd.Series([r["week"] for r in out], dtype="string"),
             "hll": pd.Series([r["hll"] for r in out], dtype=object)})

    parts = _events(sf_dir, ["ts", "user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    sk = {"a": HyperLogLog(), "b": HyperLogLog()}
    for _, r in parts.iterrows():
        sk[r["week"]] = sk[r["week"]].merge(
            HyperLogLog.from_bytes(r["hll"]))
    a, b = sk["a"].count(), sk["b"].count()
    union = sk["a"].merge(sk["b"]).count()
    inter = max(0.0, a + b - union)
    return pd.DataFrame({
        "users_a": [np.int64(round(a))],
        "users_b": [np.int64(round(b))],
        "users_union": [np.int64(round(union))],
        "users_overlap": [np.int64(round(inter))]})


def _image_dup_ds(columns=None):
    from webalizer_ray.stages.multimodal import (
        IMAGE_DUP_TABLE_VERSION,
        synth_image_dup_table,
    )
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_imgdup_u{uid}_v{IMAGE_DUP_TABLE_VERSION}")
    marker = os.path.join(d, "images.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".images-{os.getpid()}.tmp")
        pq.write_table(synth_image_dup_table(), tmp)
        os.replace(tmp, marker)
    return rd.read_parquet(marker, columns=columns)


@register("media_image_dhash_pairs")
def media_image_dhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Perceptual near-dup IMAGE pairs: real pixels → 64-bit dHash in an
    actor-pool stage → chunk-banded Hamming pairs (n_chunks=8 >
    max_hamming=6, so recall is exact by pigeonhole — the distributed
    result provably equals brute force). Catches what byte/exact dedup
    cannot: the fixture plants format-converted (PPM↔BMP), 2×-upscaled
    and noised copies, all different bytes, same or near-same dHash.
    Rows-only (pixel hashing isn't SQL); pytest verifies equality with
    the driver-side brute-force pair set and that every planted variant
    pairs with its base."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        DHashImage,
    )
    hashed = _image_dup_ds(["media_id", "kind", "payload"]).map_batches(
        DHashImage, concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    return dedup.hamming64_pairs(hashed, id_col="media_id",
                                 hash_col="dhash", max_hamming=6,
                                 n_chunks=8)


@register("hybrid_search_rrf", sql=r"""
WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS dl
           FROM documents),
n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
             FROM documents)
       WHERE term IN ('table', 'hash', 'merge') GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             ROUND(SUM(ln((n.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / n.avgdl))), 6)
               AS score
      FROM tf JOIN dfq USING (term) JOIN d USING (doc_id) CROSS JOIN n
      GROUP BY tf.doc_id),
lex AS (SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lr
        FROM s QUALIFY lr <= 50),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
      WHERE vec_id = 0),
vs AS (SELECT e.vec_id AS doc_id,
              ROUND(list_cosine_similarity(q.qe,
                    CAST(e.embedding AS DOUBLE[])), 9) AS cos
       FROM embeddings e CROSS JOIN q),
vec AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vr
        FROM vs QUALIFY vr <= 50),
f AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + lr), 0) + COALESCE(1.0 / (60 + vr), 0)
               AS rrf,
             COALESCE(lr, 0) AS lex_rank, COALESCE(vr, 0) AS vec_rank
      FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(rrf, 9) AS rrf,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank
FROM f ORDER BY rrf DESC, doc_id LIMIT 10""")
def hybrid_search_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    SIGIR'09 — the standard way a RAG/search stack combines a lexical
    and a vector index): the BM25 leg and the exact-cosine leg each
    produce their distributed top-50 (per-batch top-k partials; only
    k rows per block reach the driver), then RRF fuses the two tiny
    rank lists driver-side: score = Σ 1/(60 + rank), absent leg
    contributes 0. Ranks on both engines are over 6-dp (BM25) / 9-dp
    (cosine) rounded scores with id tiebreaks, so no float noise can
    flip a rank; the fused score is one two-term double add."""
    lex = _bm25_topk(sf_dir, k=50)
    lex_rank = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    query = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    vec = ann.brute_force_topk(ds, query, k=50)
    vec_rank = {int(v): int(r) for v, r in zip(vec["vec_id"], vec["rank"])}

    ids = sorted(set(lex_rank) | set(vec_rank))
    lr = np.array([lex_rank.get(i, 0) for i in ids], dtype=np.int64)
    vr = np.array([vec_rank.get(i, 0) for i in ids], dtype=np.int64)
    rrf = (np.where(lr > 0, 1.0 / (60.0 + lr), 0.0)
           + np.where(vr > 0, 1.0 / (60.0 + vr), 0.0))
    out = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                        "rrf": np.round(rrf, 9),
                        "lex_rank": lr, "vec_rank": vr})
    return (out.sort_values(["rrf", "doc_id"], ascending=[False, True],
                            kind="mergesort")
            .head(10).reset_index(drop=True))


@register("ab_test_conversion_ztest", sql="""
WITH u AS (SELECT user_id, user_id % 2 AS arm,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS conv
           FROM events GROUP BY user_id),
a AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_b
      FROM u)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM a""")
def ab_test_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    """Experiment analysis: two-proportion z-test on user-level purchase
    conversion under a deterministic id-parity assignment (the split a
    real experimenation system computes over billions of users). Per-user
    conversion flags are indicator-max partials (users never reach the
    driver); the four arm counts are the only rows that move; the
    z statistic is ONE closed-form expression written identically on
    both engines (integer counts in, one rounded double out)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "conv": (df["event_type"] == "purchase").astype(np.int64)})

    per_user = reduce_sink(ds.map_batches(flag, batch_format="pandas"),
                           ["user_id"], {"conv": ("conv", "max")})

    def arm_partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (df["user_id"].to_numpy(np.int64) % 2)
        c = df["conv"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_a": [np.int64((arm == 0).sum())],
            "n_b": [np.int64((arm == 1).sum())],
            "conv_a": [np.int64(c[arm == 0].sum())],
            "conv_b": [np.int64(c[arm == 1].sum())]})

    tot = per_user.map_batches(arm_partial,
                               batch_format="pandas").to_pandas().sum()
    n_a, n_b = float(tot["n_a"]), float(tot["n_b"])
    conv_a, conv_b = float(tot["conv_a"]), float(tot["conv_b"])
    p = (conv_a + conv_b) / (n_a + n_b)
    z = ((conv_a / n_a - conv_b / n_b)
         / np.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)))
    return pd.DataFrame({
        "n_a": [np.int64(tot["n_a"])], "n_b": [np.int64(tot["n_b"])],
        "conv_a": [np.int64(tot["conv_a"])],
        "conv_b": [np.int64(tot["conv_b"])],
        "z": [float(textstats.round_half_away(z, 6))]})


@register("k_anonymity_audit", sql="""
WITH g AS (SELECT event_type, hour(ts) AS hr, dayofweek(ts) AS dow,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_violating,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk
FROM g""")
def k_anonymity_audit(sf_dir: str) -> pd.DataFrame:
    """Privacy-governance audit: k-anonymity (k=5) over the
    quasi-identifier tuple (event_type, hour, weekday) — a release is
    k-anonymous when every QI group holds ≥ k rows, else the small
    groups re-identify individuals (Sweeney 2002). Group sizes are
    ordinary count partials; the audit then folds the COUNT TABLE (not
    the rows) to three integers with per-batch partial sums, so neither
    the events nor the group table ever reach the driver. The weekday
    NUMBERING differs between engines (pandas Monday=0, DuckDB
    Sunday=0) but the PARTITION it induces is identical, and only group
    sizes matter."""
    def qi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hr": df["ts"].dt.hour.astype(np.int64),
                             "dow": df["ts"].dt.dayofweek.astype(np.int64)})

    groups = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(qi, batch_format="pandas"),
        ["event_type", "hr", "dow"], {"n": ("hr", "size")})

    def audit_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        small = n < 5
        return pd.DataFrame({"n_groups": [np.int64(len(n))],
                             "groups_violating": [np.int64(small.sum())],
                             "rows_at_risk": [np.int64(n[small].sum())]})

    tot = groups.map_batches(audit_partial,
                             batch_format="pandas").to_pandas().sum()
    return pd.DataFrame({k: [np.int64(tot[k])]
                         for k in ("n_groups", "groups_violating",
                                   "rows_at_risk")})


@register("containment_quote_pairs", sql=r"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
sh AS (SELECT doc_id, array_to_string(toks[i:i+19], ' ') AS sp
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-19))
                        AS i) g),
d AS (SELECT DISTINCT doc_id, sp FROM sh),
cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM d a JOIN d b ON a.sp = b.sp AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
g3 AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-2))
                        AS i) gg),
dg AS (SELECT DISTINCT doc_id, g FROM g3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1),
inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS i
          FROM cand c JOIN dg x ON x.doc_id = c.id_a
               JOIN dg y ON y.doc_id = c.id_b AND y.g = x.g
          GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       ROUND(COALESCE(i.i, 0) / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6)
         AS containment,
       ROUND(COALESCE(i.i, 0)
             / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE), 6)
         AS jaccard
FROM cand c JOIN sz sa ON sa.doc_id = c.id_a
     JOIN sz sb ON sb.doc_id = c.id_b
     LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
WHERE COALESCE(i.i, 0) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= 0.8""")
def containment_quote_pairs(sf_dir: str) -> pd.DataFrame:
    """Quote/subset detection via n-gram CONTAINMENT, C(A,B) =
    |G₃(A)∩G₃(B)| / min(|G₃(A)|,|G₃(B)|) — the asymmetric cousin of
    Jaccard (Broder's resemblance vs containment split): a short doc
    quoted inside a long one scores containment ≈ 1 but low Jaccard,
    so symmetric dedup misses it. Candidates come from the
    DETERMINISTIC shared-20-token-span prefilter (itself oracle-backed
    — a containing pair shares its spans by construction, so recall
    vs this filter is exact, which is what makes the whole chain
    SQL-checkable, unlike the sampling-based MinHash candidates);
    the verify joins candidate texts back in-cluster and emits both
    measures so the containment-vs-jaccard gap is visible."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    cand = dedup.shared_span_pairs(docs, n=20)
    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64),
                          "containment": pd.Series(dtype=np.float64),
                          "jaccard": pd.Series(dtype=np.float64)})
    if not len(cand):
        return empty
    p = rd.from_pandas(cand[["id_a", "id_b"]])
    j = dedup.join_pairs_to_values(p, docs, "doc_id", "text")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b, ta, tb in zip(df["id_a"], df["id_b"],
                                df["text_a"], df["text_b"]):
            sa, sb = dedup.word_ngrams(ta, 3), dedup.word_ngrams(tb, 3)
            inter = len(sa & sb)
            cont = inter / min(len(sa), len(sb))
            if cont >= 0.8:
                jac = inter / (len(sa) + len(sb) - inter)
                rows.append((a, b,
                             float(textstats.round_half_away(cont, 6)),
                             float(textstats.round_half_away(jac, 6))))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "containment",
                                           "jaccard"]) \
            .astype({"id_a": np.int64, "id_b": np.int64})

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    if "id_a" not in out.columns or not len(out):
        return empty
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


@register("knn_triangle_stats", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
k AS (SELECT node, neighbor FROM r WHERE rank <= 2),
e AS (SELECT DISTINCT LEAST(node, neighbor) AS a,
                      GREATEST(node, neighbor) AS b FROM k),
nn AS (SELECT COUNT(DISTINCT x) AS n
       FROM (SELECT a AS x FROM e UNION ALL SELECT b AS x FROM e)),
tri AS (SELECT COUNT(*) AS t
        FROM e e1 JOIN e e2 ON e2.a = e1.b
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST(nn.n AS BIGINT) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(tri.t AS BIGINT) AS n_triangles
FROM nn CROSS JOIN tri""")
def knn_triangle_stats(sf_dir: str) -> pd.DataFrame:
    """Triangle census of the k-NN similarity graph — the standard
    embedding-space clustering diagnostic (many triangles = tight
    semantic clusters; a triangle-free kNN graph means the space is
    spread thin). Distributed node-iterator counting in
    graph.triangle_count: canonical edges → wedges by middle node →
    closing-edge check, each step a co-partitioned union+groupby (the
    CC/PageRank message pattern), only three scalars reach the driver.
    Oracle: triple self-join over the identical canonical edge set."""
    from webalizer_ray.stages import graph

    edges = knn_graph(sf_dir)[["node", "neighbor"]].rename(
        columns={"node": "id_a", "neighbor": "id_b"})
    st = graph.triangle_count(edges)
    return pd.DataFrame({"n_nodes": [np.int64(st["n_nodes"])],
                         "n_edges": [np.int64(st["n_edges"])],
                         "n_triangles": [np.int64(st["n_triangles"])]})


@register("events_table_checksum", sql="""
WITH d AS (SELECT (CAST(user_id AS HUGEINT) * 1000003
                   + CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT)
                     * 8191
                   + CAST(hour(ts) AS HUGEINT) * 131071
                   + CAST(ascii(event_type) * 131 + length(event_type)
                          AS HUGEINT) * 524287)
                  % 18446744073709551616 AS dig
           FROM events)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(dig) % 18446744073709551616 AS VARCHAR) AS checksum
FROM d""")
def events_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent content checksum — the replication/migration
    verifier: after copying a table between engines or clusters, two
    sides agree iff (n_rows, checksum) agree, no sort and no row
    transfer needed. The row digest is an ARITHMETIC closed form over
    integer-coerced fields (cents-quantized value, hour, a char-code
    fold of the type) in uint64 wrap-around — numpy's per-op wrapping
    and SQL's single end mod are congruent because +/× commute with
    mod 2⁶⁴ — and SUM is commutative, so any row order / any
    partitioning yields the identical checksum. One uint64 partial per
    batch reaches the driver."""
    M = 1 << 64

    def digest_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.uint64)
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64).astype(np.uint64)
        hr = df["ts"].dt.hour.to_numpy().astype(np.uint64)
        types = {t: np.uint64(ord(t[0]) * 131 + len(t))
                 for t in df["event_type"].unique()}
        tcode = df["event_type"].map(types).to_numpy(np.uint64)
        dig = (u * np.uint64(1000003) + cents * np.uint64(8191)
               + hr * np.uint64(131071) + tcode * np.uint64(524287))
        s = int(np.sum(dig, dtype=np.uint64))   # wrap == mod 2^64
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "s": [str(s)]})

    parts = _events(sf_dir, ["ts", "user_id", "event_type", "value"]) \
        .map_batches(digest_partial, batch_format="pandas").to_pandas()
    total = 0
    for s in parts["s"]:
        total = (total + int(s)) % M
    return pd.DataFrame({"n_rows": [np.int64(parts["n"].sum())],
                         "checksum": [str(total)]})


@register("target_encoded_event_types", sql="""
WITH c AS (SELECT event_type, event_id % 3 AS fold,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events),
f AS (SELECT event_type, fold, SUM(cents) AS s, COUNT(*) AS n
      FROM c GROUP BY 1, 2),
t AS (SELECT event_type, SUM(s) AS ts, SUM(n) AS tn FROM f GROUP BY 1)
SELECT f.event_type, CAST(f.fold AS BIGINT) AS fold,
       CAST(f.n AS BIGINT) AS n_rows,
       ROUND((t.ts - f.s) / (100.0 * (t.tn - f.n)), 6) AS enc
FROM f JOIN t USING (event_type)
WHERE t.tn > f.n""")
def target_encoded_event_types(sf_dir: str) -> pd.DataFrame:
    """Leakage-protected (out-of-fold) target encoding — the standard
    way a categorical feature absorbs a target without memorizing its
    own row: fold k's encoding of a category is the target mean over
    the OTHER folds, (tot − fold)/(n_tot − n_fold). Everything reduces
    to per-(category, fold) integer partials — the 2-dp value column is
    cent-quantized, so sums are EXACT in any order and partitioning
    (the dyadic-fixture lesson applied to real money columns); the one
    float division happens once per output row on both engines."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "fold": df["event_id"].to_numpy(np.int64) % 3,
            "s": cents,
        }).groupby(["event_type", "fold"], sort=False) \
            .agg(s=("s", "sum"), n=("s", "size")).reset_index()
        g["s"] = g["s"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    f = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                    ["event_type", "fold"],
                    {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    t = f.groupby("event_type", sort=False) \
        .agg(ts=("s", "sum"), tn=("n", "sum")).reset_index()
    m = f.merge(t, on="event_type")
    m = m[m["tn"] > m["n"]].copy()
    m["enc"] = textstats.round_half_away(
        (m["ts"] - m["s"]).to_numpy(np.float64)
        / (100.0 * (m["tn"] - m["n"]).to_numpy(np.float64)), 6)
    m["n_rows"] = m["n"].astype(np.int64)
    m["fold"] = m["fold"].astype(np.int64)
    return m[["event_type", "fold", "n_rows", "enc"]] \
        .sort_values(["event_type", "fold"], ignore_index=True)


@register("benford_first_digit", sql="""
WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM events
           WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(n / CAST(t.tot AS DOUBLE), 6) AS observed,
       ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford
FROM c CROSS JOIN t""")
def benford_first_digit(sf_dir: str) -> pd.DataFrame:
    """Benford's-law digit audit — the classic fraud / synthetic-data
    smell test on a money column: the first significant digit of
    natural multiplicative data follows log10(1 + 1/d). Digits come
    from the EXACT cent integer (decimal-string head, no float log
    tricks that disagree at powers of ten), counts are ordinary
    partials, and both the observed share and the Benford expectation
    are one rounded expression per digit. The verdict (uniform-ish
    synthetic values ≠ Benford) is the point — the table is what an
    auditor reads."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def digit_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        d = cents[cents > 0]
        while (d >= 10).any():     # strip digits: O(log10 max) passes
            d = np.where(d >= 10, d // 10, d)
        g = pd.Series(d).value_counts()
        return pd.DataFrame({"digit": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    c = reduce_sink(ds.map_batches(digit_partial, batch_format="pandas"),
                    ["digit"], {"n": ("n", "sum")}).to_pandas()
    tot = float(c["n"].sum())
    c["observed"] = textstats.round_half_away(
        c["n"].to_numpy(np.float64) / tot, 6)
    c["benford"] = textstats.round_half_away(
        np.log(1.0 + 1.0 / c["digit"].to_numpy(np.float64))
        / np.log(10.0), 6)
    c["n"] = c["n"].astype(np.int64)
    return c.sort_values("digit", ignore_index=True)


@register("term_info_gain", sql=r"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
lab AS (SELECT doc_id,
               CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
                 AS y
        FROM t),
dw AS (SELECT DISTINCT doc_id, unnest(toks) AS w FROM t),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(y) AS DOUBLE) AS n1 FROM lab),
c AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS dt,
             CAST(SUM(y) AS DOUBLE) AS a
      FROM dw JOIN lab USING (doc_id) GROUP BY w),
ig AS (SELECT w,
  (CASE WHEN n1 / nn <= 0 OR n1 / nn >= 1 THEN 0
        ELSE -((n1 / nn) * ln(n1 / nn)
               + (1 - n1 / nn) * ln(1 - n1 / nn)) END)
  - (dt / nn) * (CASE WHEN a / dt <= 0 OR a / dt >= 1 THEN 0
                      ELSE -((a / dt) * ln(a / dt)
                             + (1 - a / dt) * ln(1 - a / dt)) END)
  - (CASE WHEN nn - dt = 0 THEN 0
          ELSE ((nn - dt) / nn)
               * (CASE WHEN (n1 - a) / (nn - dt) <= 0
                            OR (n1 - a) / (nn - dt) >= 1 THEN 0
                       ELSE -(((n1 - a) / (nn - dt))
                              * ln((n1 - a) / (nn - dt))
                              + (1 - (n1 - a) / (nn - dt))
                              * ln(1 - (n1 - a) / (nn - dt))) END) END)
    AS gain
  FROM c CROSS JOIN n)
SELECT w AS term, ROUND(gain, 6) AS info_gain
FROM ig ORDER BY ROUND(gain, 6) DESC, term LIMIT 10""")
def term_info_gain(sf_dir: str) -> pd.DataFrame:
    """Feature selection by information gain: IG(term; label) =
    H(label) − Σ_splits p(split)·H(label | term present/absent), the
    classic filter-method term ranker (and the decision-tree split
    criterion). Label = doc contains 'spark', so the top term must be
    'spark' itself (IG = H(label)) — a built-in sanity check. The heavy
    work is ONE distinct-(doc, term) count reduce carrying the label
    (vocab-sized output; the corpus never re-shuffles); the entropy
    closed form runs on that tiny table in the oracle's exact
    expression order, branches guarded the same way on both engines."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        y = np.array([1 if "spark" in (w or []) else 0 for w in words],
                     dtype=np.int64)
        dl = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna().to_numpy()
        pairs = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), dl),
            "w": flat,
            "y": np.repeat(y, dl)}).drop_duplicates(["doc_id", "w"])
        # scalar partials ride as a sentinel row so one reduce serves
        # both the per-term counts and (N, n1)
        head = pd.DataFrame({"doc_id": [np.int64(-1)], "w": ["\x00n"],
                             "y": [np.int64(y.sum())]})
        head["dt"] = np.int64(len(df))
        pairs["dt"] = np.int64(1)
        return pd.concat([pairs[["w", "dt", "y"]],
                          head[["w", "dt", "y"]]], ignore_index=True)

    st = reduce_sink(docs.map_batches(explode, batch_format="pandas"),
                     ["w"], {"dt": ("dt", "sum"), "a": ("y", "sum")}) \
        .to_pandas()
    tot = st[st["w"] == "\x00n"]
    nn, n1 = float(tot["dt"].iloc[0]), float(tot["a"].iloc[0])
    c = st[st["w"] != "\x00n"].copy()
    dt = c["dt"].to_numpy(np.float64)
    a = c["a"].to_numpy(np.float64)

    def h(p: np.ndarray) -> np.ndarray:
        p = np.asarray(p, dtype=np.float64)
        inner = (p > 0) & (p < 1)
        q = np.where(inner, p, 0.5)     # dummy where the branch is dead
        return np.where(inner, -(q * np.log(q)
                                 + (1 - q) * np.log(1 - q)), 0.0)

    with np.errstate(divide="ignore", invalid="ignore"):
        cond = h(np.where(nn - dt == 0, 0.0,
                          (n1 - a) / np.where(nn - dt == 0, 1.0,
                                              nn - dt)))
        gain = (h(n1 / nn) - (dt / nn) * h(a / dt)
                - np.where(nn - dt == 0, 0.0, ((nn - dt) / nn) * cond))
    c["info_gain"] = textstats.round_half_away(gain, 6)
    c["term"] = c["w"]
    return (c.sort_values(["info_gain", "term"],
                          ascending=[False, True], kind="mergesort")
            .head(10)[["term", "info_gain"]].reset_index(drop=True))


@register("survival_time_to_purchase", sql="""
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(ts AS DATE) END) AS pday,
         MIN(CAST(ts AS DATE)) AS fday,
         MAX(CAST(ts AS DATE)) AS lday
  FROM events GROUP BY user_id),
obs AS (SELECT CASE WHEN pday IS NOT NULL
                    THEN datediff('day', fday, pday)
                    ELSE datediff('day', fday, lday) END AS t,
               CASE WHEN pday IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM u),
e AS (SELECT t, SUM(ev) AS d, COUNT(*) AS ending FROM obs GROUP BY t),
r AS (SELECT t, d,
             (SELECT COUNT(*) FROM obs)
             - COALESCE(SUM(ending) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
      FROM e)
SELECT CAST(t AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS events,
       ROUND(PRODUCT(1.0 - d / CAST(n_risk AS DOUBLE))
             OVER (ORDER BY t), 6) AS survival
FROM r WHERE d > 0""")
def survival_time_to_purchase(sf_dir: str) -> pd.DataFrame:
    """Survival analysis: Kaplan–Meier estimate of time from a user's
    first event to first purchase, RIGHT-CENSORED at the last seen day
    for users who never purchase — the estimator conversion-lag and
    churn studies actually need (a naive mean-over-converters is
    biased). Heavy work = ONE per-user (min purchase day, first day,
    last day) reduce; the (t, deaths, at-risk) life table is O(days)
    and the ordered product runs on the driver in the oracle's exact
    multiply order. d=0 rows contribute factor 1, so filtering them
    before or after the product is equivalent (both engines filter)."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    SENT = np.int64(1 << 60)

    def per_user_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        is_p = (df["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"],
            "pday": np.where(is_p, day, SENT),
            "fday": day, "lday": day})

    u = reduce_sink(ds.map_batches(per_user_partial,
                                   batch_format="pandas"),
                    ["user_id"], {"pday": ("pday", "min"),
                                  "fday": ("fday", "min"),
                                  "lday": ("lday", "max")})

    def obs_partial(df: pd.DataFrame) -> pd.DataFrame:
        conv = df["pday"].to_numpy(np.int64) < SENT
        t = np.where(conv,
                     df["pday"].to_numpy(np.int64)
                     - df["fday"].to_numpy(np.int64),
                     df["lday"].to_numpy(np.int64)
                     - df["fday"].to_numpy(np.int64))
        g = pd.DataFrame({"t": t, "ev": conv.astype(np.int64)}) \
            .groupby("t", sort=False) \
            .agg(d=("ev", "sum"), ending=("ev", "size")).reset_index()
        g["d"] = g["d"].astype(np.int64)
        g["ending"] = g["ending"].astype(np.int64)
        return g

    e = reduce_sink(u.map_batches(obs_partial, batch_format="pandas"),
                    ["t"], {"d": ("d", "sum"),
                            "ending": ("ending", "sum")}).to_pandas()
    e = e.sort_values("t", ignore_index=True)
    n_total = int(e["ending"].sum())
    before = np.concatenate(([0], np.cumsum(e["ending"].to_numpy())[:-1]))
    e["n_risk"] = n_total - before
    surv = 1.0
    out_rows = []
    for t, d, nr in zip(e["t"], e["d"], e["n_risk"]):
        surv = surv * (1.0 - float(d) / float(nr))
        if d > 0:
            out_rows.append((int(t), int(nr), int(d),
                             float(textstats.round_half_away(surv, 6))))
    return pd.DataFrame(out_rows, columns=["t_day", "n_risk", "events",
                                           "survival"]) \
        .astype({"t_day": np.int64, "n_risk": np.int64,
                 "events": np.int64})


@register("typo_part_name_pairs", sql="""
WITH n AS (SELECT DISTINCT p_name AS key FROM part)
SELECT a.key AS a, b.key AS b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS ed
FROM n a JOIN n b ON a.key < b.key
WHERE levenshtein(a.key, b.key) <= 2""")
def typo_part_name_pairs(sf_dir: str) -> pd.DataFrame:
    """Edit-distance fuzzy join (typo detection / entity resolution):
    all distinct part-name pairs within Levenshtein distance ≤ 2 via
    PassJoin segment signatures — k edits leave one of k+1 segments
    verbatim in any partner, so candidates come from a signature
    groupby (O(k·n) rows per key) and the banded-DP verify runs
    in-cluster; recall is exact, proven against the brute-force
    all-pairs oracle. Complements similar_part_names (set Jaccard):
    edit distance sees transpositions/typos that q-gram sets score
    leniently, and vice versa."""
    from webalizer_ray.stages.simjoin import edit_distance_join

    names = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"]).map_batches(
        lambda df: df.rename(columns={"p_name": "key"}),
        batch_format="pandas")
    return edit_distance_join(names, k=2)


@register("type_hour_chi2", sql="""
WITH j AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
                  COUNT(*) AS nxy FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
t AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n FROM j),
chi AS (SELECT SUM((nxy - nx * ny / n) * (nxy - nx * ny / n)
                   / (nx * ny / n)) AS c2,
               (SELECT COUNT(*) FROM mx) AS r,
               (SELECT COUNT(*) FROM my) AS c
        FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t)
SELECT ROUND(c2, 6) AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(sqrt(c2 / ((SELECT n FROM t)
                        * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6)
         AS cramers_v
FROM chi""")
def type_hour_chi2(sf_dir: str) -> pd.DataFrame:
    """Pearson χ² test of independence (event_type × hour) with
    Cramér's V effect size — the frequentist sibling of type_hour_mi
    (MI measures shared information, χ²/V calibrates deviation against
    sampling noise). Corpus reduces to the |types|×24 joint histogram
    (integer partials); the χ² sum and V run on the tiny table in the
    oracle's expression order. NOTE the missing-cell convention: only
    OBSERVED (x, y) cells enter the sum on both engines — a zero cell
    contributes its expected count; this implementation and the SQL
    share the same (documented) convention so the statistic matches."""
    def qi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": df["event_type"],
                             "y": df["ts"].dt.hour.astype(np.int64)})

    j = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                    .map_batches(qi, batch_format="pandas"),
                    ["x", "y"], {"nxy": ("x", "size")}).to_pandas()
    nx = j.groupby("x")["nxy"].sum()
    ny = j.groupby("y")["nxy"].sum()
    n = float(j["nxy"].sum())
    nxv = j["x"].map(nx).to_numpy(np.float64)
    nyv = j["y"].map(ny).to_numpy(np.float64)
    nxy = j["nxy"].to_numpy(np.float64)
    exp = nxv * nyv / n
    chi2 = float(np.sum((nxy - exp) * (nxy - exp) / exp))
    r, c = len(nx), len(ny)
    v = np.sqrt(chi2 / (n * float(min(r - 1, c - 1))))
    return pd.DataFrame({
        "chi2": [float(textstats.round_half_away(chi2, 6))],
        "dof": [np.int64((r - 1) * (c - 1))],
        "cramers_v": [float(textstats.round_half_away(v, 6))]})


@register("daily_events_gapfilled", sql="""
WITH b AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
         FROM b GROUP BY 1),
cal AS (SELECT event_type, CAST(unnest(generate_series(d0, d1,
                    INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
SELECT cal.event_type, strftime(cal.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS hits
FROM cal LEFT JOIN b ON b.event_type = cal.event_type
                    AND b.day = cal.day""")
def daily_events_gapfilled(sf_dir: str) -> pd.DataFrame:
    """Calendar densification (gap filling): the daily-count series per
    type with EXPLICIT zero rows for silent days — what every
    time-series consumer downstream (charting, anomaly z-scores,
    forecasting) assumes, and what a bare groupby cannot produce
    because absent groups yield no row. Heavy work = the one daily
    count reduce; the calendar expansion runs on the O(types × days)
    aggregate with numpy repeat/arange — no per-day loop, no extra
    shuffle."""
    def day_col(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "day": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64)})

    b = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                    .map_batches(day_col, batch_format="pandas"),
                    ["event_type", "day"],
                    {"n": ("day", "size")}).to_pandas()
    span = b.groupby("event_type")["day"].agg(["min", "max"])
    lens = (span["max"] - span["min"] + 1).to_numpy(np.int64)
    types = np.repeat(span.index.to_numpy(), lens)
    days = np.concatenate([np.arange(d0, d1 + 1, dtype=np.int64)
                           for d0, d1 in zip(span["min"], span["max"])])
    cal = pd.DataFrame({"event_type": types, "day": days})
    out = cal.merge(b, on=["event_type", "day"], how="left")
    out["hits"] = out["n"].fillna(0).astype(np.int64)
    out["day"] = pd.to_datetime(out["day"], unit="D") \
        .dt.strftime("%Y-%m-%d")
    return out[["event_type", "day", "hits"]] \
        .sort_values(["event_type", "day"], ignore_index=True)


@register("cohort_ltv_curve", sql="""
WITH um AS (SELECT user_id, (year(ts) * 12 + month(ts)) AS ym,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events),
uc AS (SELECT user_id, MIN(ym) AS cohort FROM um GROUP BY 1),
ca AS (SELECT cohort, ym - cohort AS age, SUM(cents) AS cents
       FROM um JOIN uc USING (user_id) GROUP BY 1, 2),
sz AS (SELECT cohort, COUNT(*) AS users FROM uc GROUP BY 1)
SELECT CAST(ca.cohort AS BIGINT) AS cohort_ym,
       CAST(age AS BIGINT) AS age_months,
       CAST(sz.users AS BIGINT) AS users,
       ROUND(SUM(ca.cents) OVER (PARTITION BY ca.cohort ORDER BY age)
             / (100.0 * sz.users), 6) AS cum_ltv
FROM ca JOIN sz USING (cohort)""")
def cohort_ltv_curve(sf_dir: str) -> pd.DataFrame:
    """Cohort lifetime-value curve: cumulative value per user by cohort
    age (the retention report's revenue twin). Per-(user, month) cent
    partials reduce first; each user's cohort (min month) and age
    offsets derive INSIDE the user-hash bucket so the fact rows never
    join back to a cohort table; the (cohort, age) table is O(months²)
    and the cumulative sum runs over exact integer cents — one division
    per output row on both engines."""
    ds = _events(sf_dir, ["ts", "user_id", "value"])

    def um_partial(df: pd.DataFrame) -> pd.DataFrame:
        ym = (df["ts"].dt.year * 12 + df["ts"].dt.month) \
            .to_numpy(np.int64)
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"], "ym": ym,
                          "cents": cents}) \
            .groupby(["user_id", "ym"], sort=False)["cents"].sum() \
            .reset_index()
        g["cents"] = g["cents"].astype(np.int64)
        return g

    um = reduce_sink(ds.map_batches(um_partial, batch_format="pandas"),
                     ["user_id", "ym"], {"cents": ("cents", "sum")})

    def bucket_cohort(df: pd.DataFrame) -> pd.DataFrame:
        cohort = df.groupby("user_id", sort=False)["ym"].transform("min")
        out = pd.DataFrame({"cohort": cohort.to_numpy(np.int64),
                            "age": df["ym"].to_numpy(np.int64)
                            - cohort.to_numpy(np.int64),
                            "cents": df["cents"].to_numpy(np.int64)})
        g = out.groupby(["cohort", "age"], sort=False)["cents"].sum() \
            .reset_index()
        g["users"] = np.int64(0)
        # cohort sizes ride as age = -1 sentinel rows (one per cohort
        # per bucket; users are bucket-disjoint so the final sum is
        # exact and never double-counts across age rows)
        users = df.groupby("user_id", sort=False)["ym"].min()
        u = users.value_counts().rename("users").reset_index() \
            .rename(columns={"ym": "cohort"})
        u["age"] = np.int64(-1)
        u["cents"] = np.int64(0)
        both = pd.concat([g, u[["cohort", "age", "cents", "users"]]],
                         ignore_index=True)
        both["cents"] = both["cents"].astype(np.int64)
        both["users"] = both["users"].astype(np.int64)
        return both

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from webalizer_ray.stages.aggregate import key_bucket
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    ca = reduce_sink(
        (um.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(bucket_cohort,
                                   batch_format="pandas")),
        ["cohort", "age"], {"cents": ("cents", "sum"),
                            "users": ("users", "sum")}).to_pandas()
    sz = ca[ca["age"] == -1].set_index("cohort")["users"]
    ca = ca[ca["age"] >= 0].sort_values(["cohort", "age"],
                                        ignore_index=True)
    ca["cum"] = ca.groupby("cohort")["cents"].cumsum()
    return pd.DataFrame({
        "cohort_ym": ca["cohort"].astype(np.int64),
        "age_months": ca["age"].astype(np.int64),
        "users": ca["cohort"].map(sz).astype(np.int64),
        "cum_ltv": textstats.round_half_away(
            ca["cum"].to_numpy(np.float64)
            / (100.0 * ca["cohort"].map(sz).to_numpy(np.float64)), 6)})


@register("event_type_lift", sql="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS nu FROM events),
m AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cab
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT ta, tb, CAST(cab AS BIGINT) AS users_both,
       ROUND(cab * nu / (ma.c * mb.c), 6) AS lift
FROM p JOIN m ma ON ma.event_type = ta
       JOIN m mb ON mb.event_type = tb CROSS JOIN n""")
def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rules lift over user baskets: lift(a,b) =
    P(a,b)/(P(a)P(b)) — >1 means the types co-occur in the same users
    beyond chance (the market-basket statistic behind
    recommendations). Distinct (user, type) pairs reduce two-phase;
    pair expansion is one vectorized self-merge INSIDE the user-hash
    bucket (types per user is bounded by |types|, so no blowup);
    margins and the lift expression run on the |types|²-sized table."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["user_id", "event_type"])

    def dedup_local(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().copy()
        d["_h"] = key_bucket(d, ["user_id"], 64)
        return d

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        pairs = d.merge(d, on="user_id")
        pairs = pairs[pairs["event_type_x"] < pairs["event_type_y"]]
        pc = pairs.groupby(["event_type_x", "event_type_y"],
                           sort=False).size().rename("cab").reset_index()
        pc.columns = ["ta", "tb", "cab"]
        marg = d.groupby("event_type", sort=False).size().rename("c") \
            .reset_index()
        out = pd.DataFrame({
            "ta": pd.concat([pc["ta"], marg["event_type"],
                             pd.Series(["\x00nu"])], ignore_index=True),
            "tb": pd.concat([pc["tb"],
                             pd.Series(["\x00m"] * len(marg)),
                             pd.Series(["\x00nu"])], ignore_index=True),
            "n": pd.concat([pc["cab"], marg["c"],
                            pd.Series([d["user_id"].nunique()])],
                           ignore_index=True).astype(np.int64)})
        return out

    st = reduce_sink(
        (ds.map_batches(dedup_local, batch_format="pandas")
         .groupby("_h").map_groups(bucket_stats, batch_format="pandas")),
        ["ta", "tb"], {"n": ("n", "sum")}).to_pandas()
    nu = float(st.loc[st["ta"] == "\x00nu", "n"].iloc[0])
    marg = st[st["tb"] == "\x00m"].set_index("ta")["n"]
    p = st[(st["tb"] != "\x00m") & (st["ta"] != "\x00nu")].copy()
    ca = p["ta"].map(marg).to_numpy(np.float64)
    cb = p["tb"].map(marg).to_numpy(np.float64)
    p["users_both"] = p["n"].astype(np.int64)
    p["lift"] = textstats.round_half_away(
        p["n"].to_numpy(np.float64) * nu / (ca * cb), 6)
    return p[["ta", "tb", "users_both", "lift"]] \
        .sort_values(["ta", "tb"], ignore_index=True)


@register("new_vs_returning_daily", sql="""
WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fday
           FROM events GROUP BY 1)
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN CAST(ts AS DATE) = fday THEN 1 ELSE 0 END)
            AS BIGINT) AS new_hits,
       CAST(SUM(CASE WHEN CAST(ts AS DATE) > fday THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_hits
FROM events JOIN f USING (user_id) GROUP BY 1""")
def new_vs_returning_daily(sf_dir: str) -> pd.DataFrame:
    """New-vs-returning daily split (the acquisition-vs-retention
    headline every traffic report leads with): a hit is 'new' iff it
    falls on its user's first-seen day. Per-(user, day) count partials
    reduce first; the first-seen day derives INSIDE the user-hash
    bucket (no join back to the fact rows); only (day, new, returning)
    partials leave the buckets."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["ts", "user_id"])

    def ud_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"], "day": day}) \
            .groupby(["user_id", "day"], sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    ud = reduce_sink(ds.map_batches(ud_partial, batch_format="pandas"),
                     ["user_id", "day"], {"n": ("n", "sum")})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    def bucket_split(df: pd.DataFrame) -> pd.DataFrame:
        fday = df.groupby("user_id", sort=False)["day"].transform("min")
        new = df["day"].to_numpy(np.int64) == fday.to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        out = pd.DataFrame({"day": df["day"].to_numpy(np.int64),
                            "new_hits": np.where(new, n, 0),
                            "returning_hits": np.where(new, 0, n)})
        g = out.groupby("day", sort=False).sum().reset_index()
        for c in ("new_hits", "returning_hits"):
            g[c] = g[c].astype(np.int64)
        return g

    daily = reduce_sink(
        (ud.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(bucket_split, batch_format="pandas")),
        ["day"], {"new_hits": ("new_hits", "sum"),
                  "returning_hits": ("returning_hits", "sum")}) \
        .to_pandas()
    daily["day"] = pd.to_datetime(daily["day"], unit="D") \
        .dt.strftime("%Y-%m-%d")
    for c in ("new_hits", "returning_hits"):
        daily[c] = daily[c].astype(np.int64)
    return daily.sort_values("day", ignore_index=True)


@register("leakage_safe_split_counts", sql="""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk(node, reach) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.reach FROM edges e JOIN walk w ON w.node = e.v),
cl AS (SELECT node, MIN(reach) AS rep FROM walk GROUP BY node),
r AS (SELECT e.vec_id, e.label, COALESCE(c.rep, e.vec_id) AS rep
      FROM embeddings e LEFT JOIN cl c ON c.node = e.vec_id)
SELECT CASE WHEN rep % 10 < 8 THEN 'train' ELSE 'val' END AS split,
       CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS vecs
FROM r GROUP BY split, label""")
def leakage_safe_split_counts(sf_dir: str) -> pd.DataFrame:
    """Cluster-aware (leakage-safe) train/val split: a doc-id hash split
    puts near-duplicates on BOTH sides of the cut — the eval set then
    scores memorization, not generalization. Fix: split on the near-dup
    CLUSTER representative (min id of the connected component over the
    verified cosine pair graph), so every cluster lands atomically in
    one split; singletons fall back to their own id, reproducing the
    plain deterministic split. Scale shape: the clustered-node → rep
    map is sparse (dup clusters are a small fraction of any corpus) and
    broadcasts once via ray.put; membership is then a pure per-batch
    function — no shuffle beyond the tiny (split, label) partials."""
    cl = cosine_dup_clusters(sf_dir)
    rep_ref = ray.put(dict(zip(cl["node"].to_numpy(),
                               cl["cluster_id"].to_numpy())))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(rep_ref)
        rep = (df["vec_id"].map(lut).fillna(df["vec_id"])
               .astype(np.int64))
        return pd.DataFrame({
            "split": np.where(rep % 10 < 8, "train", "val"),
            "label": df["label"].to_numpy(np.int64)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label"]) \
        .map_batches(tag, batch_format="pandas")
    out = reduce_sink(ds, ["split", "label"],
                      {"vecs": ("label", "size")}).to_pandas()
    return out.sort_values(["split", "label"], ignore_index=True)


@register("tpch_q21_sole_late_supplier", sql="""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
o AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM f GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM f JOIN o USING (l_orderkey)
     JOIN supplier ON s_suppkey = l_suppkey
WHERE f.late = 1 AND o.n_supp > 1 AND o.n_late = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
def tpch_q21_sole_late_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21-shaped correlated EXISTS + NOT-EXISTS (the hardest
    standard join shape): suppliers who were the ONLY late supplier on
    a multi-supplier finished order (late = shipped >90 days after the
    order date; the dataset has no commit/receipt dates, so lateness is
    date-arithmetic on the columns that exist). Re-expression: the two
    correlated subqueries collapse to per-order aggregates — n_supp and
    n_late over the per-(order, supplier) late flag — joined back to
    the flag table; EXISTS ⇔ n_supp > 1, NOT EXISTS ⇔ n_late = 1.
    Only (order, supplier, flag) partials and O(orders) aggregate rows
    shuffle; raw lineitem never re-shuffles after the first join."""
    import datetime as _dt

    import pyarrow.dataset as pds
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"],
                             filter=pds.field("o_orderstatus") == "F")
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def late_flag(batch: pa.Table) -> pa.Table:
        cutoff = pc.add(batch["o_orderdate"],
                        pa.scalar(_dt.timedelta(days=90)))
        late = pc.cast(pc.greater(batch["l_shipdate"], cutoff), pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"], "late": late})

    f = reduce_sink(j.map_batches(late_flag, batch_format="pyarrow"),
                    ["l_orderkey", "l_suppkey"], {"late": ("late", "max")})
    per_order = reduce_sink(f, ["l_orderkey"],
                            {"n_supp": ("late", "size"),
                             "n_late": ("late", "sum")})
    fo = f.join(per_order, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("l_orderkey",))

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[(df["late"] == 1) & (df["n_supp"] > 1)
                  & (df["n_late"] == 1)]
        return keep[["l_suppkey"]]

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    named = (fo.map_batches(qualify, batch_format="pandas")
             .join(sup, join_type="inner", num_partitions=8,
                   on=("l_suppkey",), right_on=("s_suppkey",)))
    agg = reduce_sink(named, ["s_name"],
                      {"numwait": ("s_name", "size")}).to_pandas()
    return (agg.sort_values(["numwait", "s_name"],
                            ascending=[False, True], kind="mergesort")
            .head(20).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Completing the TPC-H 22 (Q3/5/6/10/14/17/18/21 live above). Where the
# fixture lacks a TPC-H column (no partsupp table, no l_commitdate /
# l_receiptdate / l_shipmode / c_phone / comments), the query keeps the
# ORIGINAL's distributed pattern over the columns that exist and the
# docstring says exactly what was adapted; the oracle runs the identical
# adapted SQL, so the correctness gate is unchanged.
# ---------------------------------------------------------------------------


@register("tpch_q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0,
             2) AS sum_base,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_disc_dm,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_charge_mu,
       ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
             / (100.0 * COUNT(*)), 6) AS avg_price,
       ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
             / (100.0 * COUNT(*)), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06'
GROUP BY l_returnflag, l_linestatus""")
def tpch_q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 (pricing summary): ONE pruned scan, every aggregate a
    per-batch integer partial (cents for base price/discount, exact
    decimal grids deci-milli for disc price and micro for charge — the
    3-factor product has 6 decimal digits, so the scaled value is
    integral and rint can never sit on a .5 boundary), and the three
    averages are ONE float division each over the exact sums — the
    classic partial+final aggregate at its widest (8 measures, one
    shuffle of |flags×status| partial rows per block)."""
    import datetime as _dt

    import pyarrow.dataset as pds

    def measures(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        t = df["l_tax"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty": df["l_quantity"].to_numpy(np.float64),
            "base_c": np.rint(p * 100).astype(np.int64),
            "disc_dm": np.rint(p * (1 - d) * 10000).astype(np.int64),
            "charge_mu": np.rint(p * (1 - d) * (1 + t)
                                 * 1000000).astype(np.int64),
            "disc_c": np.rint(d * 100).astype(np.int64)})

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        filter=(pds.field("l_shipdate")
                <= _dt.datetime(2001, 8, 6)))
    agg = reduce_sink(ds.map_batches(measures, batch_format="pandas"),
                      ["l_returnflag", "l_linestatus"],
                      {"sum_qty": ("qty", "sum"),
                       "base_c": ("base_c", "sum"),
                       "sum_disc_dm": ("disc_dm", "sum"),
                       "sum_charge_mu": ("charge_mu", "sum"),
                       "disc_c": ("disc_c", "sum"),
                       "count_order": ("qty", "size")}).to_pandas()
    n = agg["count_order"].to_numpy(np.float64)
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "l_linestatus": agg["l_linestatus"],
        "sum_qty": agg["sum_qty"].round(2),
        "sum_base": (agg["base_c"].to_numpy(np.int64) / 100.0).round(2),
        "sum_disc_dm": agg["sum_disc_dm"].astype(np.int64),
        "sum_charge_mu": agg["sum_charge_mu"].astype(np.int64),
        "avg_qty": textstats.round_half_away(
            agg["sum_qty"].to_numpy(np.float64) / n, 6),
        "avg_price": textstats.round_half_away(
            agg["base_c"].to_numpy(np.int64) / (100.0 * n), 6),
        "avg_disc": textstats.round_half_away(
            agg["disc_c"].to_numpy(np.int64) / (100.0 * n), 6),
        "count_order": agg["count_order"].astype(np.int64)})
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


@register("tpch_q4_priority_check", sql="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""")
def tpch_q4_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 (order priority checking). Adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped more than 60 days
    after o_orderdate — the EXISTS decorrelation is identical: the
    quarter's orders join lineitem once, the per-order MAX(late) flag
    reduces the fact to |orders| rows, and only (priority, count)
    partials reach the driver. Priority rides the per-order reduce as
    an extra key so no second join back to orders is needed."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1997, 4, 1))))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def late_flag(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["l_shipdate"].to_numpy("datetime64[ns]")
                > df["o_orderdate"].to_numpy("datetime64[ns]")
                + np.timedelta64(60, "D")).astype(np.int64)
        # the join coalesces the right key into l_orderkey (Ray 2.49)
        return pd.DataFrame({"l_orderkey": df["l_orderkey"],
                             "o_orderpriority": df["o_orderpriority"],
                             "late": late})

    per_order = reduce_sink(
        j.map_batches(late_flag, batch_format="pandas"),
        ["l_orderkey", "o_orderpriority"], {"late": ("late", "max")})
    hit = per_order.filter(expr="late == 1")
    agg = reduce_sink(hit, ["o_orderpriority"],
                      {"order_count": ("late", "size")}).to_pandas()
    agg["order_count"] = agg["order_count"].astype(np.int64)
    return agg.sort_values("o_orderpriority", ignore_index=True)


@register("tpch_q12_ship_class", sql="""
SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY
            THEN 'slow' ELSE 'fast' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1""")
def tpch_q12_ship_class(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 (shipping modes / priority). Adapted: no l_shipmode or
    receipt/commit dates in the fixture, so lines class as fast/slow by
    ship latency (>= 30 days after order) — the pattern is unchanged:
    year filter pushed into the lineitem scan, ONE join to orders, the
    high/low priority CASE counts reduce as two integer partials per
    (block, class)."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1))))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        slow = (df["l_shipdate"].to_numpy("datetime64[ns]")
                >= df["o_orderdate"].to_numpy("datetime64[ns]")
                + np.timedelta64(30, "D"))
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy()
        return pd.DataFrame({
            "ship_class": np.where(slow, "slow", "fast"),
            "high_line_count": high.astype(np.int64),
            "low_line_count": (~high).astype(np.int64)})

    agg = reduce_sink(j.map_batches(classify, batch_format="pandas"),
                      ["ship_class"],
                      {"high_line_count": ("high_line_count", "sum"),
                       "low_line_count": ("low_line_count", "sum")}) \
        .to_pandas()
    for c in ("high_line_count", "low_line_count"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("ship_class", ignore_index=True)


@register("tpch_q15_top_supplier", sql="""
WITH rev AS (SELECT l_suppkey,
                    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)) AS total_dm
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1997-04-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(total_dm AS BIGINT) AS total_revenue_dm
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_dm = (SELECT MAX(total_dm) FROM rev)
ORDER BY s_suppkey""")
def tpch_q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 (top supplier = the revenue view + its global MAX):
    the quarter's revenue reduces to ONE integer partial per (block,
    suppkey); the view is |suppliers|-sized, its MAX comes back as one
    scalar via a streaming Dataset.max (no driver materialization of
    the view), and only the winner rows — ties included, hence the
    deterministic suppkey order — are collected and joined to the
    supplier dim driver-side."""
    import datetime as _dt

    import pyarrow.dataset as pds

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1997, 4, 1))))
    view = reduce_sink(li.map_batches(rev_dm, batch_format="pandas"),
                       ["l_suppkey"],
                       {"total_dm": ("rev_dm", "sum")}).materialize()
    best = view.max("total_dm")
    winners = view.filter(expr=f"total_dm == {best}").to_pandas()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue_dm"] = out["total_dm"].astype(np.int64)
    return out[["s_suppkey", "s_name", "total_revenue_dm"]] \
        .sort_values("s_suppkey", ignore_index=True)


@register("tpch_q7_nation_volume", sql="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev_dm) AS BIGINT) AS revenue_dm
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT) AS rev_dm
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01') shipping
GROUP BY supp_nation, cust_nation, l_year""")
def tpch_q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the 2-year ship
    window is pushed into the fact scan; orders and customer attach via
    auto_join (broadcast below the size limit, hash join above — the
    only shuffles a 6-table join needs); supplier→nation and the
    nation-name map are tiny broadcast dicts applied map-side, so the
    symmetric nation-pair predicate filters rows before any partials
    ship. Output partials are |2 pairs × years| rows per block."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk2nk_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_nationkey"].astype(int))))
    nk2name_ref = ray.put(nk2name)
    pair = {"NATION_1": "NATION_2", "NATION_2": "NATION_1"}

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1)))) \
        .map_batches(rev_dm, batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = auto_join(auto_join(li, orders, on="l_orderkey",
                            right_on="o_orderkey"),
                  cust, on="o_custkey", right_on="c_custkey")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        sk2nk = ray.get(sk2nk_ref)
        nknm = ray.get(nk2name_ref)
        sn = df["l_suppkey"].map(sk2nk).map(nknm)
        cn = df["c_nationkey"].map(nknm)
        keep = sn.map(pair).eq(cn)
        df = df[keep.fillna(False)]
        return pd.DataFrame({"supp_nation": sn[keep.fillna(False)],
                             "cust_nation": cn[keep.fillna(False)],
                             "l_year": df["l_year"].to_numpy(np.int64),
                             "rev_dm": df["rev_dm"].to_numpy(np.int64)})

    agg = reduce_sink(j.map_batches(classify, batch_format="pandas"),
                      ["supp_nation", "cust_nation", "l_year"],
                      {"revenue_dm": ("rev_dm", "sum")}).to_pandas()
    if "revenue_dm" not in agg.columns:
        # all-empty block sets lose their schema on to_pandas();
        # zero qualifying symmetric flows is a legal tiny-scale answer
        return pd.DataFrame(
            {"supp_nation": pd.Series([], dtype=object),
             "cust_nation": pd.Series([], dtype=object),
             "l_year": pd.Series([], dtype=np.int64),
             "revenue_dm": pd.Series([], dtype=np.int64)})
    agg["revenue_dm"] = agg["revenue_dm"].astype(np.int64)
    return agg.sort_values(["supp_nation", "cust_nation", "l_year"],
                           ignore_index=True)


@register("tpch_q8_market_share", sql="""
SELECT l_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                           THEN rev_dm ELSE 0 END) AS DOUBLE)
             / SUM(rev_dm), 6) AS mkt_share
FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS l_year,
             n1.n_name AS supp_nation,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT) AS rev_dm
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
GROUP BY l_year""")
def tpch_q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 (national market share within a region, 8 tables): the
    PROMO partkey set and supplier→nation map broadcast once and prune
    the fact map-side; orders (date window pushed into its scan) and
    customer attach via auto_join; the ASIA nation set filters
    customers map-side. Both numerator and denominator reduce in ONE
    pass as (year, nation_dm, total_dm) integer partials; the share is
    one float division per year on the driver, written identically in
    the oracle."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia_nk = set(nat.merge(reg[reg["r_name"] == "ASIA"],
                            left_on="n_regionkey",
                            right_on="r_regionkey")["n_nationkey"]
                  .astype(int))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sk2name = {int(s): nk2name[int(n)]
               for s, n in zip(sup["s_suppkey"], sup["s_nationkey"])}
    promo = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filters=[("p_type", "==", "PROMO")]).to_pandas()
    promo_ref = ray.put(set(promo["p_partkey"].astype(int)))
    sk2name_ref = ray.put(sk2name)
    asia_ref = ray.put(asia_nk)

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_partkey"].isin(ray.get(promo_ref)).to_numpy()
        df = df[keep]
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(rev_dm, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1998, 1, 1))))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = auto_join(auto_join(li, orders, on="l_orderkey",
                            right_on="o_orderkey"),
                  cust, on="o_custkey", right_on="c_custkey")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["c_nationkey"].isin(ray.get(asia_ref)).to_numpy()
        df = df[keep]
        is_nat = df["l_suppkey"].map(ray.get(sk2name_ref)) \
            .eq("NATION_5").to_numpy()
        rev = df["rev_dm"].to_numpy(np.int64)
        return pd.DataFrame({
            "l_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            "nat_dm": np.where(is_nat, rev, 0),
            "tot_dm": rev})

    agg = reduce_sink(j.map_batches(split, batch_format="pandas"),
                      ["l_year"], {"nat_dm": ("nat_dm", "sum"),
                                   "tot_dm": ("tot_dm", "sum")}) \
        .to_pandas()
    return pd.DataFrame({
        "l_year": agg["l_year"].astype(np.int64),
        "mkt_share": textstats.round_half_away(
            agg["nat_dm"].to_numpy(np.float64)
            / agg["tot_dm"].to_numpy(np.float64), 6)}) \
        .sort_values("l_year", ignore_index=True)


@register("tpch_q9_nation_profit", sql="""
SELECT nation, o_year, CAST(SUM(amount_dm) AS BIGINT) AS profit_dm
FROM (SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)
             - CAST(ROUND(p_retailprice * 0.6 * 10000) AS BIGINT)
               * CAST(l_quantity AS BIGINT) AS amount_dm
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%') profit
GROUP BY nation, o_year""")
def tpch_q9_nation_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 (product-type profit by nation/year). Adapted: the
    fixture has no partsupp, so supply cost = 0.6 × p_retailprice —
    integerized PER UNIT then multiplied by the integral quantity, so
    both engines compute the identical integer amount. The 'red'
    partkey→unit-cost dict broadcasts once and prunes the fact
    map-side (profit needs the part attribute anyway, the classic
    map-side dimension join); orders attaches via auto_join for the
    year; supplier→nation-name is a broadcast dict; (nation, year)
    integer partials are all that shuffle."""
    from webalizer_ray.stages.join import auto_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"]).to_pandas()
    red = part[part["p_name"].str.contains("red")]
    cost_dm = np.rint(red["p_retailprice"].to_numpy(np.float64)
                      * 0.6 * 10000).astype(np.int64)
    pk2cost_ref = ray.put(dict(zip(red["p_partkey"].astype(int),
                                   cost_dm)))
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk2name_ref = ray.put({int(s): nk2name[int(n)] for s, n in
                           zip(sup["s_suppkey"], sup["s_nationkey"])})

    def amount(df: pd.DataFrame) -> pd.DataFrame:
        pk2cost = ray.get(pk2cost_ref)
        unit = df["l_partkey"].map(pk2cost)
        df = df[unit.notna()]
        unit = unit.dropna().to_numpy(np.int64)
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "nation": df["l_suppkey"].map(ray.get(sk2name_ref)),
            "amount_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)
            - unit * q})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(amount, batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def add_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": df["nation"],
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            "amount_dm": df["amount_dm"].to_numpy(np.int64)})

    agg = reduce_sink(j.map_batches(add_year, batch_format="pandas"),
                      ["nation", "o_year"],
                      {"profit_dm": ("amount_dm", "sum")}).to_pandas()
    agg["profit_dm"] = agg["profit_dm"].astype(np.int64)
    return agg.sort_values(["nation", "o_year"], ignore_index=True)


@register("tpch_q11_important_parts", sql="""
WITH val AS (SELECT l_partkey,
                    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS value_c
             FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name = 'NATION_3'
             GROUP BY l_partkey)
SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
FROM val WHERE value_c > (SELECT SUM(value_c) * 0.001 FROM val)""")
def tpch_q11_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 (important stock: HAVING against a GLOBAL aggregate).
    Adapted: no partsupp, so a part's "inventory value" is its shipped
    extendedprice (exact cents) from NATION_3's suppliers — the
    pattern is intact: the nation's supplier set broadcasts and
    filters the fact map-side, the per-part view reduces once and is
    materialized, its global total comes back as ONE streaming scalar,
    and the threshold filter runs distributed over the view (the view
    is |parts|-sized and never gathers to the driver before the
    filter)."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == "NATION_3", "n_nationkey"]
             .iloc[0])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    keep_ref = ray.put(set(
        sup.loc[sup["s_nationkey"] == nk, "s_suppkey"].astype(int)))

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_suppkey"].isin(ray.get(keep_ref))]
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(cents, batch_format="pandas")
    view = reduce_sink(li, ["l_partkey"],
                       {"value_c": ("c", "sum")}).materialize()
    thresh = view.sum("value_c") * 0.001
    out = view.filter(expr=f"value_c > {thresh!r}").to_pandas()
    out["value_c"] = out["value_c"].astype(np.int64)
    return out.sort_values("l_partkey", ignore_index=True)


@register("tpch_q13_order_distribution", sql="""
WITH co AS (SELECT o_custkey, COUNT(*) AS c_count FROM orders
            WHERE o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY o_custkey)
SELECT CAST(COALESCE(c_count, 0) AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN co ON c_custkey = o_custkey
GROUP BY 1""")
def tpch_q13_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 (customer order-count distribution). Adapted: the
    comment NOT LIKE filter becomes priority <> '4-NOT SPECIFIED'.
    The LEFT JOIN's only job is the zero bucket, so it never runs:
    per-customer counts reduce (|customers| rows max), the histogram
    is a second O(distinct counts) reduce, and the c_count=0 row is
    total customers (a parquet-metadata count, zero data bytes) minus
    the customers the histogram covered — exact, join-free."""
    import pyarrow.dataset as pds

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pds.field("o_orderpriority") != "4-NOT SPECIFIED")
    co = reduce_sink(orders, ["o_custkey"],
                     {"c_count": ("o_custkey", "size")})
    hist = reduce_sink(co, ["c_count"],
                       {"custdist": ("c_count", "size")}).to_pandas()
    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    zero = n_cust - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame({"c_count": [0],
                                              "custdist": [zero]})],
                         ignore_index=True)
    for c in ("c_count", "custdist"):
        hist[c] = hist[c].astype(np.int64)
    return hist.sort_values("c_count", ignore_index=True)


@register("tpch_q16_supplier_cnt", sql="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
def tpch_q16_supplier_cnt(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 (supplier count by part attributes). Adapted: the
    part–supplier relation comes from lineitem (no partsupp) and the
    complaint-comment exclusion becomes s_acctbal < 0. The qualifying
    partkey→(brand, type, size) map and the excluded-supplier set
    broadcast once and apply map-side; the COUNT(DISTINCT) is the
    two-phase exact distinct (per-batch dedup, then each (group,
    suppkey) pair counted in exactly one bucket) — the same machinery
    as A10, never a driver set."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"]).to_pandas()
    ok = part[(part["p_brand"] != "Brand#1") & (part["p_type"] != "PROMO")
              & part["p_size"].isin(range(1, 9))]
    attr_ref = ray.put({int(k): (b, t, int(s)) for k, b, t, s in
                        zip(ok["p_partkey"], ok["p_brand"],
                            ok["p_type"], ok["p_size"])})
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad_ref = ray.put(set(
        sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].astype(int)))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        attrs = df["l_partkey"].map(ray.get(attr_ref))
        keep = attrs.notna() & ~df["l_suppkey"].isin(ray.get(bad_ref))
        attrs = attrs[keep]
        return pd.DataFrame({
            "p_brand": attrs.str[0].to_numpy(object),
            "p_type": attrs.str[1].to_numpy(object),
            "p_size": attrs.str[2].to_numpy(np.int64),
            "l_suppkey": df.loc[keep, "l_suppkey"]
            .to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"]) \
        .map_batches(attach, batch_format="pandas")
    out = distinct_count(li, ["p_brand", "p_type", "p_size"],
                         "l_suppkey", alias="supplier_cnt").to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort",
        ignore_index=True)


@register("tpch_q19_disjunctive_revenue", sql="""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_dm
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""")
def tpch_q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 (three OR'd brand/size/quantity branches — the
    disjunctive-predicate pattern no single pushed filter expresses):
    the three brands' partkey→(brand, size) map broadcasts once; each
    branch evaluates as a vectorized mask inside map_batches and the
    disjunction keeps a row if ANY branch holds; revenue reduces to
    ONE scalar partial per block. Adapted: container/shipmode columns
    don't exist, brand/size/qty carry the three-branch shape."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand",
                                  "p_size"]).to_pandas()
    sel = part[part["p_brand"].isin(["Brand#1", "Brand#2", "Brand#3"])]
    attr_ref = ray.put({int(k): (b, int(s)) for k, b, s in
                        zip(sel["p_partkey"], sel["p_brand"],
                            sel["p_size"])})
    branches = [("Brand#1", 5, 1, 11), ("Brand#2", 10, 10, 20),
                ("Brand#3", 15, 20, 30)]

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        attrs = df["l_partkey"].map(ray.get(attr_ref))
        df = df[attrs.notna()]
        attrs = attrs.dropna()
        brand = attrs.str[0].to_numpy(object)
        size = attrs.str[1].to_numpy(np.int64)
        q = df["l_quantity"].to_numpy(np.float64)
        keep = np.zeros(len(df), dtype=bool)
        for b, smax, qlo, qhi in branches:
            keep |= ((brand == b) & (size >= 1) & (size <= smax)
                     & (q >= qlo) & (q <= qhi))
        p = df.loc[keep, "l_extendedprice"].to_numpy(np.float64)
        d = df.loc[keep, "l_discount"].to_numpy(np.float64)
        dm = np.rint(p * (1 - d) * 10000).astype(np.int64)
        return pd.DataFrame({"rev_dm": [int(dm.sum())]})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(rev, batch_format="pandas")
    return pd.DataFrame({"revenue_dm":
                         np.array([li.sum("rev_dm")], dtype=np.int64)})


@register("tpch_q20_heavy_shippers", sql="""
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7' AND s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 30)
ORDER BY s_suppkey""")
def tpch_q20_heavy_shippers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 (nested IN over a grouped HAVING aggregate). Adapted:
    no partsupp/availqty, so a supplier qualifies by shipping > 30
    units of some 'red' part in 1997 — the shape is intact: the date
    window is pushed into the fact scan, the red partkey set broadcasts
    and prunes map-side, quantities reduce per (supplier, part) as
    exact integral-float partials, the HAVING filter runs distributed,
    and only the qualifying supplier KEYS (≤ |suppliers| rows) reach
    the driver for the final nation semi-join."""
    import pyarrow.dataset as pds

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    red_ref = ray.put(set(
        part.loc[part["p_name"].str.contains("red"), "p_partkey"]
        .astype(int)))
    import datetime as _dt

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(ray.get(red_ref))]
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "qty": df["l_quantity"].to_numpy(np.float64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1)))) \
        .map_batches(prune, batch_format="pandas")
    per_ps = reduce_sink(li, ["l_suppkey", "l_partkey"],
                         {"qty": ("qty", "sum")})
    heavy = per_ps.filter(expr="qty > 30") \
        .select_columns(["l_suppkey"]).to_pandas()
    keys = set(heavy["l_suppkey"].astype(int))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name",
                                 "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == "NATION_7", "n_nationkey"]
             .iloc[0])
    out = sup[(sup["s_nationkey"] == nk)
              & sup["s_suppkey"].isin(keys)]
    return out[["s_suppkey", "s_name"]] \
        .sort_values("s_suppkey", ignore_index=True)


@register("tpch_q22_dormant_customers", sql="""
WITH act AS (SELECT c_custkey,
                    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
                    CAST(c_nationkey % 5 AS BIGINT) AS cntrycode
             FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)),
pos AS (SELECT SUM(bal_c) AS sum_c, COUNT(*) AS n FROM act
        WHERE bal_c > 0)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(bal_c) / 100.0, 2) AS totacctbal
FROM act, pos
WHERE bal_c * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode""")
def tpch_q22_dormant_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 (global-average threshold + NOT EXISTS anti-join).
    Adapted: country code = c_nationkey % 5 (no c_phone) and "no
    orders" is windowed to orders since 2000 (every fixture customer
    has SOME order). The above-average test is the exact integer
    cross-multiplication bal_c·n > Σbal_c — no float average can
    disagree between engines; the anti-join is a LEFT OUTER against
    per-customer recent-order counts (only key-level aggregates
    shuffle), null ⇒ dormant."""
    import datetime as _dt

    import pyarrow.dataset as pds

    def code_bal(df: pd.DataFrame) -> pd.DataFrame:
        code = (df["c_nationkey"].to_numpy(np.int64)) % 5
        keep = code <= 2
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(np.int64)[keep],
            "bal_c": np.rint(df["c_acctbal"].to_numpy(np.float64)
                             * 100).astype(np.int64)[keep],
            "cntrycode": code[keep]})

    act = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey",
                                   "c_acctbal"]) \
        .map_batches(code_bal, batch_format="pandas").materialize()

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["bal_c"] > 0, "bal_c"].to_numpy(np.int64)
        return pd.DataFrame({"sum_c": [int(p.sum())], "n": [len(p)]})

    pos = act.map_batches(pos_partial, batch_format="pandas")
    sum_c, n = pos.sum("sum_c"), pos.sum("n")

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pds.field("o_orderdate") >= _dt.datetime(2000, 1, 1))
    per_cust = reduce_sink(recent, ["o_custkey"],
                           {"n_ord": ("o_custkey", "size")})
    j = act.join(per_cust, join_type="left_outer", num_partitions=8,
                 on=("c_custkey",), right_on=("o_custkey",))

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["bal_c"].to_numpy(np.int64) * n > sum_c) \
            & df["n_ord"].isna().to_numpy()
        df = df[keep]
        return pd.DataFrame({
            "cntrycode": df["cntrycode"].to_numpy(np.int64),
            "numcust": np.ones(len(df), dtype=np.int64),
            "bal_c": df["bal_c"].to_numpy(np.int64)})

    agg = reduce_sink(j.map_batches(qualify, batch_format="pandas"),
                      ["cntrycode"], {"numcust": ("numcust", "sum"),
                                      "bal_c": ("bal_c", "sum")}) \
        .to_pandas()
    return pd.DataFrame({
        "cntrycode": agg["cntrycode"].astype(np.int64),
        "numcust": agg["numcust"].astype(np.int64),
        "totacctbal": (agg["bal_c"].to_numpy(np.int64) / 100.0)
        .round(2)}).sort_values("cntrycode", ignore_index=True)


@register("tpch_q2_min_cost_supplier", sql="""
WITH ps AS (SELECT l_partkey, l_suppkey,
                   MIN(CAST(ROUND(l_extendedprice / l_quantity * 100)
                            AS BIGINT)) AS cost_c
            FROM lineitem GROUP BY l_partkey, l_suppkey),
eligible AS (SELECT ps.l_partkey, ps.cost_c, s_suppkey,
                    ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name
             FROM ps JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'EUROPE'),
best AS (SELECT l_partkey, MIN(cost_c) AS min_c FROM eligible
         GROUP BY l_partkey)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey,
       CAST(e.cost_c AS BIGINT) AS cost_c
FROM part p JOIN eligible e ON e.l_partkey = p.p_partkey
     JOIN best b ON b.l_partkey = e.l_partkey
                AND e.cost_c = b.min_c
WHERE p.p_size = 15 AND p.p_type = 'LARGE'
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 10""")
def tpch_q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 (min-cost supplier: the correlated-MIN join). Adapted:
    no partsupp, so a (part, supplier) unit cost is the MIN shipped
    extendedprice/quantity in cents — rounded HALF-AWAY on both sides
    because a float unit price CAN sit exactly on a .5 cent boundary
    (e.g. 2500/8), where numpy's half-even rint would disagree with
    SQL ROUND. The fact reduces once to (part, supplier, min-cost)
    partials; the EUROPE supplier attrs broadcast map-side; the
    per-part MIN is a second key-level reduce joined back by
    (part, cost) equality — ties survive exactly as in SQL; only the
    ORDER BY/LIMIT 10 winners reach the driver."""
    from webalizer_ray.stages.join import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    eur = nat.merge(reg[reg["r_name"] == "EUROPE"],
                    left_on="n_regionkey", right_on="r_regionkey")
    nk2name = dict(zip(eur["n_nationkey"].astype(int), eur["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    sup = sup[sup["s_nationkey"].isin(nk2name.keys())]
    sup_ref = ray.put({int(k): (round(float(b), 2), nm,
                                nk2name[int(n)])
                       for k, b, nm, n in
                       zip(sup["s_suppkey"], sup["s_acctbal"],
                           sup["s_name"], sup["s_nationkey"])})
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size",
                                  "p_type"]).to_pandas()
    want = set(part.loc[(part["p_size"] == 15)
                        & (part["p_type"] == "LARGE"),
                        "p_partkey"].astype(int))
    want_ref = ray.put(want)

    def unit_cost(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(ray.get(want_ref))]
        c = textstats.round_half_away(
            df["l_extendedprice"].to_numpy(np.float64)
            / df["l_quantity"].to_numpy(np.float64) * 100, 0) \
            .astype(np.int64)
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "cost_c": c})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice"]) \
        .map_batches(unit_cost, batch_format="pandas")
    ps = reduce_sink(li, ["l_partkey", "l_suppkey"],
                     {"cost_c": ("cost_c", "min")})

    def eur_only(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_suppkey"].isin(ray.get(sup_ref)).to_numpy()
        return df[keep]

    eligible = ps.map_batches(eur_only,
                              batch_format="pandas").materialize()
    best = reduce_sink(eligible, ["l_partkey"],
                       {"min_c": ("cost_c", "min")})
    winners = auto_join(eligible, best, on="l_partkey") \
        .filter(expr="cost_c == min_c").to_pandas()
    if "l_suppkey" not in winners.columns:
        # all-empty block sets lose their schema on to_pandas();
        # no eligible supplier at tiny scale -> empty result
        return pd.DataFrame(
            {"s_acctbal": pd.Series([], dtype=np.float64),
             "s_name": pd.Series([], dtype=object),
             "n_name": pd.Series([], dtype=object),
             "p_partkey": pd.Series([], dtype=np.int64),
             "cost_c": pd.Series([], dtype=np.int64)})

    attrs = winners["l_suppkey"].map(ray.get(sup_ref))
    winners["s_acctbal"] = attrs.str[0].astype(np.float64)
    winners["s_name"] = attrs.str[1]
    winners["n_name"] = attrs.str[2]
    winners["p_partkey"] = winners["l_partkey"].astype(np.int64)
    winners["cost_c"] = winners["cost_c"].astype(np.int64)
    out = winners.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], kind="mergesort") \
        .head(10).reset_index(drop=True)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey",
                "cost_c"]]


@register("retention_event_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0, 2)
       AS value_sum
FROM events WHERE ts >= TIMESTAMP '2024-01-16'
GROUP BY event_type""")
def retention_event_counts(sf_dir: str) -> pd.DataFrame:
    """Row-level TTL retention (state/maintain.py:apply_retention):
    events land in a scratch store as TIME-SORTED files, the TTL pass
    classifies every file from parquet FOOTER statistics alone (wholly
    expired → unlink with zero data bytes read, wholly retained →
    byte-untouched; only the one straddling boundary file is
    rewritten), and the aggregate reads the RETAINED FILES — the
    oracle's WHERE proves the physical expiry kept exactly the right
    rows. Per-invocation scratch keeps reruns deterministic."""
    from webalizer_ray.state.maintain import apply_retention

    scratch = tempfile.mkdtemp(prefix="wr_ttl_")
    _events(sf_dir, ["ts", "event_type", "value"]) \
        .sort("ts").write_parquet(scratch)
    apply_retention(scratch, "ts", "2024-01-16")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "c": np.rint(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    agg = reduce_sink(
        rd.read_parquet(scratch).map_batches(cents,
                                             batch_format="pandas"),
        ["event_type"], {"hits": ("c", "size"), "c": ("c", "sum")}) \
        .to_pandas()
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "hits": agg["hits"].astype(np.int64),
        "value_sum": (agg["c"].to_numpy(np.int64) / 100.0).round(2)}) \
        .sort_values("event_type", ignore_index=True)


@register("compacted_event_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
       AS value_c
FROM events GROUP BY event_type""")
def compacted_event_counts(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction (state/maintain.py:compact_dir): events
    land as MANY small files (the steady drip every streaming ingest
    produces), the compactor bin-packs them into ~target-row outputs
    with a self-healing two-phase publish, and the aggregate reads the
    COMPACTED store — matching the oracle over the original table
    proves compaction moved every row exactly once. The query asserts
    the file count actually shrank so a no-op compactor can't pass."""
    from webalizer_ray.state.maintain import compact_dir

    scratch = tempfile.mkdtemp(prefix="wr_cmp_")
    _events(sf_dir, ["event_type", "value"]) \
        .repartition(24).write_parquet(scratch)
    n_before = len([f for f in os.listdir(scratch)
                    if f.endswith(".parquet")])
    compact_dir(scratch, target_rows=10_000_000)
    n_after = len([f for f in os.listdir(scratch)
                   if f.endswith(".parquet")])
    assert n_after < n_before, (n_before, n_after)

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "c": np.rint(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    agg = reduce_sink(
        rd.read_parquet(scratch).map_batches(cents,
                                             batch_format="pandas"),
        ["event_type"], {"hits": ("c", "size"),
                         "value_c": ("c", "sum")}).to_pandas()
    agg["hits"] = agg["hits"].astype(np.int64)
    agg["value_c"] = agg["value_c"].astype(np.int64)
    return agg.sort_values("event_type", ignore_index=True)


@register("rfm_segments", sql="""
WITH u AS (SELECT user_id,
                  date_diff('day', MAX(CAST(ts AS DATE)),
                            DATE '2024-01-31') AS rec,
                  COUNT(*) AS freq,
                  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS mon_c
           FROM events GROUP BY 1),
s AS (SELECT NTILE(5) OVER (ORDER BY -rec, user_id) AS r_score,
             NTILE(5) OVER (ORDER BY freq, user_id) AS f_score,
             NTILE(5) OVER (ORDER BY mon_c, user_id) AS m_score
      FROM u)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS users
FROM s GROUP BY 1, 2, 3""")
def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation (recency/frequency/monetary quintiles — the
    classic CRM customer grading): ONE per-user reduce produces the
    three integer metrics, then THREE chained scan.global_rank passes
    rank the SAME dataset by each metric (range-partitioned ranks, no
    global sort, each pass appends a rank column); quintiles are the
    SQL-NTILE closed form over rank and the 5×5×5-bounded segment
    histogram is all that leaves the cluster. Recency ranks by -rec so
    5 = most recent, matching the other two directions."""
    anchor = np.datetime64("2024-01-31", "D").astype(np.int64)

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"],
            "last_day": day,
            "one": np.ones(len(df), dtype=np.int64),
            "mon_c": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(metrics, batch_format="pandas"),
        ["user_id"], {"last_day": ("last_day", "max"),
                      "freq": ("one", "sum"),
                      "mon_c": ("mon_c", "sum")})

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # -rec = last_day - anchor (ascending == most-recent-last)
        df["neg_rec"] = (df["last_day"].to_numpy(np.int64)
                         - anchor).astype(np.float64)
        df["freq_f"] = df["freq"].to_numpy(np.int64) \
            .astype(np.float64)
        df["mon_f"] = df["mon_c"].to_numpy(np.int64) \
            .astype(np.float64)
        return df

    u = u.map_batches(keys, batch_format="pandas").materialize()
    n = u.count()
    ranked = scan.global_rank(u, "neg_rec", "user_id",
                              out_col="r_rnk", num_buckets=8)
    ranked = scan.global_rank(ranked, "freq_f", "user_id",
                              out_col="f_rnk", num_buckets=8)
    ranked = scan.global_rank(ranked, "mon_f", "user_id",
                              out_col="m_rnk", num_buckets=8)

    q, rem = divmod(n, 5)
    big = rem * (q + 1)

    def ntile(r: np.ndarray) -> np.ndarray:
        return np.where(r <= big, (r - 1) // max(q + 1, 1) + 1,
                        rem + (r - big - 1) // max(q, 1) + 1) \
            .astype(np.int64)

    def scores(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "r_score": ntile(df["r_rnk"].to_numpy(np.int64)),
            "f_score": ntile(df["f_rnk"].to_numpy(np.int64)),
            "m_score": ntile(df["m_rnk"].to_numpy(np.int64)),
            "one": np.ones(len(df), dtype=np.int64)})

    agg = reduce_sink(ranked.map_batches(scores, batch_format="pandas"),
                      ["r_score", "f_score", "m_score"],
                      {"users": ("one", "sum")}).to_pandas()
    for c in agg.columns:
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values(["r_score", "f_score", "m_score"],
                           ignore_index=True)


@register("daily_trend_mann_kendall", sql="""
WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
           FROM events GROUP BY 1),
s AS (SELECT SUM(CASE WHEN b.cnt > a.cnt THEN 1
                      WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS s,
             (SELECT COUNT(*) FROM d) AS n
      FROM d a JOIN d b ON b.day > a.day),
ties AS (SELECT SUM(t * (t - 1) * (2 * t + 5)) AS corr
         FROM (SELECT COUNT(*) AS t FROM d GROUP BY cnt
               HAVING COUNT(*) > 1) tt)
SELECT CAST(s.s AS BIGINT) AS s_stat, CAST(s.n AS BIGINT) AS n_days,
       ROUND((s.s - CASE WHEN s.s > 0 THEN 1
                         WHEN s.s < 0 THEN -1 ELSE 0 END)
             / sqrt((s.n * (s.n - 1) * (2 * s.n + 5)
                     - COALESCE(ties.corr, 0)) / 18.0), 6) AS z
FROM s, ties""")
def daily_trend_mann_kendall(sf_dir: str) -> pd.DataFrame:
    """Mann–Kendall trend test over the daily event-count series (the
    non-parametric is-traffic-growing test; robust to outliers where
    the OLS trend is not). Heavy work = ONE daily count reduce; the
    O(days²) sign-pair sum, the tie-corrected variance (all integer
    arithmetic) and the continuity-corrected z run on the driver in
    the oracle's exact expression order — one sqrt, one division."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    x = daily["cnt"].to_numpy(np.int64)
    n = len(x)
    diff = np.sign(x[None, :] - x[:, None])
    s = int(np.triu(diff, 1).sum())
    _, t = np.unique(x, return_counts=True)
    t = t[t > 1].astype(np.int64)
    corr = int((t * (t - 1) * (2 * t + 5)).sum())
    var = (n * (n - 1) * (2 * n + 5) - corr) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    z = textstats.round_half_away(
        np.array([(s - cc) / np.sqrt(var)]), 6)[0]
    return pd.DataFrame({"s_stat": np.array([s], dtype=np.int64),
                         "n_days": np.array([n], dtype=np.int64),
                         "z": [z]})


@register("daily_value_drawdown", sql="""
WITH d AS (SELECT CAST(ts AS DATE) AS day,
                  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
           FROM events GROUP BY 1),
r1 AS (SELECT day, SUM(c) OVER (ORDER BY day) AS run FROM d),
r AS (SELECT day, run, MAX(run) OVER (ORDER BY day) AS peak FROM r1)
SELECT CAST(MAX(peak - run) AS BIGINT) AS max_drawdown_c,
       strftime((SELECT MIN(day) FROM r
                 WHERE peak - run = (SELECT MAX(peak - run) FROM r)),
                '%Y-%m-%d') AS trough_day
FROM r""")
def daily_value_drawdown(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of the cumulative daily value series (largest
    peak-to-trough drop — the monitoring statistic for 'when did the
    running total fall furthest behind its best day'). Exact integer
    cents end to end: daily sums reduce once, the O(days) cumsum /
    cummax / argmax run on the driver, first trough day breaks ties
    exactly as the oracle's MIN(day)."""
    daily = reduce_sink(
        _events(sf_dir, ["ts", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "day": df["ts"].to_numpy().astype("datetime64[D]")
                .astype(np.int64),
                "c": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    run = daily["c"].to_numpy(np.int64).cumsum()
    peak = np.maximum.accumulate(run)
    dd = peak - run
    best = int(dd.max())
    trough = daily["day"].to_numpy(np.int64)[dd == best].min()
    return pd.DataFrame({
        "max_drawdown_c": np.array([best], dtype=np.int64),
        "trough_day": [pd.Timestamp(np.datetime64(int(trough), "D"))
                       .strftime("%Y-%m-%d")]})


@register("daily_acf", sql="""
WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
           FROM events GROUP BY 1),
p AS (SELECT l.lag, a.cnt AS x, b.cnt AS y
      FROM (SELECT UNNEST(generate_series(1, 7)) AS lag) l
           JOIN d a ON true
           JOIN d b ON b.day = a.day + l.lag * INTERVAL 1 DAY),
m AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx,
             SUM(y * y) AS syy
      FROM p GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
             6) AS acf
FROM m""")
def daily_acf(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation of daily event counts at lags 1–7 (the weekly-
    seasonality screen: a spike at lag 7 means day-of-week structure).
    Defined as the exact Pearson correlation over (x_t, x_{t+k}) pairs
    so every moment is an INTEGER — the heavy work is the one daily
    reduce; the driver computes the closed form in the oracle's
    expression order, one sqrt + one division per lag. Calendar gaps
    pair by real day arithmetic, not row adjacency."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    day = daily["day"].to_numpy(np.int64)
    cnt = daily["cnt"].to_numpy(np.int64)
    pos = {d: i for i, d in enumerate(day)}
    rows = []
    for lag in range(1, 8):
        pair = [(cnt[i], cnt[pos[d + lag]]) for i, d in enumerate(day)
                if d + lag in pos]
        if not pair:
            continue
        x = np.array([p[0] for p in pair], dtype=np.int64)
        y = np.array([p[1] for p in pair], dtype=np.int64)
        n = len(x)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = np.sqrt((n * int((x * x).sum()) - int(x.sum()) ** 2)
                      * 1.0 * (n * int((y * y).sum())
                               - int(y.sum()) ** 2))
        rows.append({"lag": np.int64(lag),
                     "acf": textstats.round_half_away(
                         np.array([num / den]), 6)[0]})
    return pd.DataFrame(rows).sort_values("lag", ignore_index=True)


@register("decayed_type_popularity", sql="""
WITH a AS (SELECT event_type,
                  date_diff('day', CAST(ts AS DATE),
                            DATE '2024-01-31') AS age,
                  COUNT(*) AS cnt
           FROM events GROUP BY 1, 2)
SELECT event_type, ROUND(SUM(cnt * POWER(0.9, age)), 6) AS score
FROM a GROUP BY event_type""")
def decayed_type_popularity(sf_dir: str) -> pd.DataFrame:
    """Time-decayed popularity (recency-weighted ranking — the
    freshness signal feed rankers use, where yesterday counts 0.9× of
    today): counts reduce per (type, integer age-in-days) — a ≤
    |types|×|days| table no matter the corpus size — and the decay
    fold Σ cnt·0.9^age happens on that tiny aggregate; rounding to 6dp
    absorbs the sub-1e-12 float-order difference between engines on a
    30-term sum."""
    anchor = np.datetime64("2024-01-31", "D").astype(np.int64)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"],
                             "age": anchor - day})

    a = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                    .map_batches(keyed, batch_format="pandas"),
                    ["event_type", "age"],
                    {"cnt": ("age", "size")}).to_pandas()
    a["w"] = a["cnt"].to_numpy(np.int64) \
        * np.power(0.9, a["age"].to_numpy(np.float64))
    out = a.groupby("event_type", sort=True)["w"].sum().reset_index()
    return pd.DataFrame({
        "event_type": out["event_type"],
        "score": textstats.round_half_away(
            out["w"].to_numpy(np.float64), 6)})


@register("geo_nearby_customer_pairs", sql="""
WITH p AS (SELECT c_custkey AS id,
                  (c_custkey * 2654435761) % 180000 - 90000 AS x,
                  (c_custkey * 2246822519) % 360000 - 180000 AS y
           FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x)
      + (a.y - b.y) * (a.y - b.y) <= 5000 * 5000""")
def geo_nearby_customer_pairs(sf_dir: str) -> pd.DataFrame:
    """Spatial distance join (stages/spatial.py:grid_distance_join):
    all customer pairs within 5000 integer units of each other, from
    deterministic hash-derived milli-degree coordinates both engines
    compute with the same modular arithmetic. The grid join replicates
    each point to its 3×3 cell neighborhood (cell width = radius, so
    no qualifying pair can escape) and each cell pairs its HOME points
    against the replicas with id_a < id_b — every pair meets exactly
    once; the oracle is the brute-force O(n²) self-join over the same
    integer predicate, so recall is provably exact, not approximate."""
    from webalizer_ray.stages.spatial import grid_distance_join

    def to_points(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({"id": k,
                             "x": (k * 2654435761) % 180000 - 90000,
                             "y": (k * 2246822519) % 360000 - 180000})

    pts = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"]) \
        .map_batches(to_points, batch_format="pandas")
    out = grid_distance_join(pts, radius=5000).to_pandas()
    if "id_a" not in out.columns:
        # Ray drops the schema of all-empty block sets on to_pandas();
        # an empty pair set is a legal answer at tiny scale
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "dist_sq": pd.Series([],
                                                  dtype=np.int64)})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


@register("als_part_recommendations")
def als_part_recommendations(sf_dir: str) -> pd.DataFrame:
    """ALS collaborative filtering (stages/recommend.py): factorize the
    customer×part purchase-quantity matrix (implicit ratings =
    per-(customer, part) shipped quantity) and recommend each of the 10
    lowest-numbered customers their top UNSEEN part. Iterative least
    squares — not SQL-expressible, rows-only driver check; pytest
    proves the solver recovers a planted low-rank matrix and that
    RMSE falls with sweeps. Item factors stay the broadcast side; the
    user dimension never gathers (only the 10 requested users' factors
    reach the driver)."""
    from webalizer_ray.stages.recommend import als_fit

    from webalizer_ray.stages.join import auto_join
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user": df["o_custkey"].to_numpy(np.int64),
            "item": df["l_partkey"].to_numpy(np.int64),
            "rating": np.log1p(df["l_quantity"]
                               .to_numpy(np.float64))})

    ratings = reduce_sink(j.map_batches(keyed, batch_format="pandas"),
                          ["user", "item"],
                          {"rating": ("rating", "sum")})
    uf, vf = als_fit(ratings, k=8, iters=3, reg=0.1)

    want = np.arange(1, 11, dtype=np.int64)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["user"].isin(want)]

    sel = uf.map_batches(pick, batch_format="pandas").to_pandas() \
        .sort_values("user", ignore_index=True)
    seen = ratings.map_batches(pick, batch_format="pandas") \
        .to_pandas()[["user", "item"]]
    fcols = [f"f{d}" for d in range(8)]
    scores = sel[fcols].to_numpy(np.float64) \
        @ vf[fcols].to_numpy(np.float64).T          # (10, |items|)
    items = vf["item"].to_numpy(np.int64)
    rows = []
    for idx, u in enumerate(sel["user"]):
        s = textstats.round_half_away(scores[idx], 6)
        mask = ~np.isin(items, seen.loc[seen["user"] == u, "item"]
                        .to_numpy(np.int64))
        # deterministic: rounded score desc, then partkey asc
        order = np.lexsort((items[mask], -s[mask]))
        best = order[0]
        rows.append({"c_custkey": np.int64(u),
                     "p_partkey": items[mask][best],
                     "score": s[mask][best]})
    return pd.DataFrame(rows)


@register("debounced_event_counts", sql="""
WITH w AS (SELECT event_type,
                  epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id, event_type
                     ORDER BY ts) AS gap_us
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS kept
FROM w WHERE gap_us IS NULL OR gap_us >= 300 * 1000000
GROUP BY event_type""")
def debounced_event_counts(sf_dir: str) -> pd.DataFrame:
    """Debounce / alert-throttle (suppress a (user, type) event that
    fires within 300 s of the previous one — the monitoring dedup
    every alerting pipeline applies before paging): gaps compute as
    exact integer microseconds against the previous RAW event inside
    the user-hash bucket ((user, type, ts) is unique in the fixture,
    so ordering is total); only (type, kept) partials shuffle. The
    stateful kept-chain variant (gap vs previous KEPT event) is the
    same bucket pass with a per-group scan; the LAG form is the
    SQL-checkable one."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["ts", "user_id", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    def kept(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = (g["user_id"].to_numpy(np.int64)
                == np.roll(g["user_id"].to_numpy(np.int64), 1))
        same &= (g["event_type"].to_numpy(object)
                 == np.roll(g["event_type"].to_numpy(object), 1))
        same[0] = False
        gap = us - np.roll(us, 1)
        keep = ~same | (gap >= 300 * 1_000_000)
        out = pd.DataFrame({"event_type": g["event_type"].
                            to_numpy(object)[keep]})
        c = out.groupby("event_type", sort=False).size() \
            .rename("kept").reset_index()
        c["kept"] = c["kept"].astype(np.int64)
        return c

    agg = reduce_sink(
        (ds.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(kept, batch_format="pandas")),
        ["event_type"], {"kept": ("kept", "sum")}).to_pandas()
    agg["kept"] = agg["kept"].astype(np.int64)
    return agg.sort_values("event_type", ignore_index=True)


@register("locf_filled_value_sum", sql="""
WITH v AS (SELECT user_id, ts, event_id, event_type,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE CAST(ROUND(value * 100) AS BIGINT)
                  END AS c
           FROM events),
f AS (SELECT event_type,
             LAST_VALUE(c IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS fc
      FROM v)
SELECT event_type, CAST(COUNT(fc) AS BIGINT) AS filled_rows,
       CAST(SUM(fc) AS BIGINT) AS filled_c
FROM f GROUP BY event_type""")
def locf_filled_value_sum(sf_dir: str) -> pd.DataFrame:
    """Forward-fill imputation (LOCF — last observation carried
    forward along each user's timeline; 'error' rows model the sensor
    dropouts): users hash to buckets so every timeline ffills in ONE
    vectorized pandas groupby pass over (ts, event_id)-ordered rows
    (exact integer cents carry forward — no float drift); rows before
    a user's first observation stay null and drop from both count and
    sum, exactly as the oracle's IGNORE NULLS window."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["ts", "event_id", "user_id", "event_type",
                          "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.float64)
        c[df["event_type"].to_numpy(object) == "error"] = np.nan
        out = pd.DataFrame({"user_id": df["user_id"],
                            "ts": df["ts"],
                            "event_id": df["event_id"],
                            "event_type": df["event_type"], "c": c})
        out["_h"] = key_bucket(out, ["user_id"], 64)
        return out

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        g["fc"] = g.groupby("user_id", sort=False)["c"].ffill()
        got = g[g["fc"].notna()]
        out = got.groupby("event_type", sort=False)["fc"] \
            .agg(filled_rows="size", filled_c="sum").reset_index()
        out["filled_rows"] = out["filled_rows"].astype(np.int64)
        out["filled_c"] = out["filled_c"].astype(np.int64)
        return out

    agg = reduce_sink(
        (ds.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(fill, batch_format="pandas")),
        ["event_type"], {"filled_rows": ("filled_rows", "sum"),
                         "filled_c": ("filled_c", "sum")}).to_pandas()
    for c in ("filled_rows", "filled_c"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("event_type", ignore_index=True)


@register("late_event_rate", sql="""
WITH w AS (SELECT event_type,
                  MAX(epoch_us(ts)) OVER
                    (ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS wm_us,
                  epoch_us(ts) AS us
           FROM events)
SELECT event_type,
       CAST(SUM(CASE WHEN wm_us > us + 600 * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS late,
       CAST(COUNT(*) AS BIGINT) AS total
FROM w GROUP BY event_type""")
def late_event_rate(sf_dir: str) -> pd.DataFrame:
    """Watermark lateness audit (the W5 streaming semantic made
    queryable): processing order = event_id, the watermark is the
    running MAX event time over everything that arrived BEFORE a row,
    and a row is late when it trails the watermark by more than the
    600 s allowed lateness. The running max is a distributed TWO-LEVEL
    PREFIX SCAN (the max twin of scan.range_prefix_sum): event_ids
    range-bucket by fixed width, per-bucket maxima reduce to the
    driver (O(buckets) rows), exclusive prefix maxima broadcast back,
    and each bucket finishes with a local shifted cummax — no task
    ever sees the whole stream. Exact integer microseconds end to
    end."""
    from webalizer_ray.stages.aggregate import reduce_sink as _rs

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])
    width = 4096

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "us": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64),
            "event_type": df["event_type"],
            "_bk": df["event_id"].to_numpy(np.int64) // width})

    b = ds.map_batches(bucketed, batch_format="pandas").materialize()
    maxima = _rs(b, ["_bk"], {"mx": ("us", "max")}).to_pandas() \
        .sort_values("_bk", ignore_index=True)
    # exclusive prefix max over the O(buckets) driver rows
    run = np.maximum.accumulate(maxima["mx"].to_numpy(np.int64))
    prior = {int(k): int(v) for k, v in
             zip(maxima["_bk"].to_numpy(np.int64)[1:], run[:-1])}
    prior_ref = ray.put(prior)

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        us = g["us"].to_numpy(np.int64)
        # watermark BEFORE each row: shifted local cummax seeded with
        # the prior buckets' max (first bucket has no predecessor)
        seed = ray.get(prior_ref).get(int(g["_bk"].iat[0]))
        local = np.maximum.accumulate(us)
        wm = np.empty_like(us)
        wm[1:] = local[:-1]
        wm[0] = np.iinfo(np.int64).min if seed is None else seed
        if seed is not None:
            wm = np.maximum(wm, seed)
        # wm > us + lateness (never wm - lateness: the INT64_MIN
        # sentinel on the first-ever row would wrap)
        late = (wm > us + 600 * 1_000_000).astype(np.int64)
        out = pd.DataFrame({"event_type": g["event_type"],
                            "late": late,
                            "total": np.ones(len(g), dtype=np.int64)})
        r = out.groupby("event_type", sort=False).sum().reset_index()
        for c in ("late", "total"):
            r[c] = r[c].astype(np.int64)
        return r

    agg = _rs(b.groupby("_bk").map_groups(classify,
                                          batch_format="pandas"),
              ["event_type"], {"late": ("late", "sum"),
                               "total": ("total", "sum")}).to_pandas()
    for c in ("late", "total"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("event_type", ignore_index=True)


@register("vocab_zipf_slope", sql=r"""
WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
r AS (SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk
      FROM c QUALIFY rnk <= 100),
m AS (SELECT COUNT(*) AS n, SUM(ln(rnk)) AS sx, SUM(ln(cnt)) AS sy,
             SUM(ln(rnk) * ln(cnt)) AS sxy,
             SUM(ln(rnk) * ln(rnk)) AS sxx
      FROM r)
SELECT CAST(n AS BIGINT) AS n_ranks,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       AS zipf_slope
FROM m""")
def vocab_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law fit over the corpus vocabulary (the log-log
    rank-frequency slope; natural text sits near −1, so the statistic
    is a corpus-health check — synthetic or templated text shows a
    flatter curve). The distributed part is the word-count reduce and
    the exact block-local top-100 (each word lives in one aggregate
    row, so bucket-local top-k partials union ⊇ the global top-k);
    the 100-point OLS runs on the driver in the oracle's expression
    order — 6-dp rounding absorbs float-order drift on the 100-term
    log sums."""
    ds = _docs(sf_dir, ["text"]).map_batches(_word_count_partials,
                                             batch_format="pandas")
    agg = reduce_sink(ds, ["word"], {"cnt": ("cnt", "sum")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return top_n_pandas(df, "word", "cnt", 100)

    cand = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    top = top_n_pandas(cand, "word", "cnt", 100)
    n = len(top)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(top["cnt"].to_numpy(np.float64))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame({
        "n_ranks": np.array([n], dtype=np.int64),
        "zipf_slope": textstats.round_half_away(
            np.array([slope]), 6)})


@register("knn_bfs_levels", sql="""
WITH RECURSIVE sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
e AS (SELECT node AS src, neighbor AS dst FROM r WHERE rank <= 2
      UNION SELECT neighbor, node FROM r WHERE rank <= 2),
walk(node, level) AS (
  SELECT DISTINCT src, 0 FROM e WHERE src IN (0, 1, 2)
  UNION
  SELECT e.dst, w.level + 1 FROM e JOIN walk w ON e.src = w.node
  WHERE w.level < 6),
best AS (SELECT node, MIN(level) AS level FROM walk GROUP BY node)
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS nodes
FROM best GROUP BY level""")
def knn_bfs_levels(sf_dir: str) -> pd.DataFrame:
    """Multi-source BFS over the exact k-NN similarity graph
    (stages/graph.py:bfs_levels — hop distance from seed vectors
    {0,1,2}, capped at 6; the reachability/expansion primitive behind
    'how far does influence spread from these examples'). Each
    superstep is ONE frontier⋈edges join + a key-level MIN reduce;
    state and frontier stay distributed, the driver sees one count per
    round. Oracle: recursive-CTE MIN(level) over the identical
    undirected top-2 edge set with the same depth cap."""
    from webalizer_ray.stages.graph import bfs_levels

    g = knn_graph(sf_dir)[["node", "neighbor"]]
    edges = pd.DataFrame({
        "src": np.concatenate([g["node"].to_numpy(np.int64),
                               g["neighbor"].to_numpy(np.int64)]),
        "dst": np.concatenate([g["neighbor"].to_numpy(np.int64),
                               g["node"].to_numpy(np.int64)])}) \
        .drop_duplicates(ignore_index=True)
    state = bfs_levels(edges, roots=[0, 1, 2], max_depth=6)
    out = reduce_sink(state, ["level"],
                      {"nodes": ("level", "size")}).to_pandas()
    for c in ("level", "nodes"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("level", ignore_index=True)


@register("user_type_triples", sql="""
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
t AS (SELECT a.event_type AS ta, b.event_type AS tb,
             c.event_type AS tc
      FROM d a
      JOIN d b ON a.user_id = b.user_id
               AND a.event_type < b.event_type
      JOIN d c ON a.user_id = c.user_id
               AND b.event_type < c.event_type)
SELECT ta AS item_a, tb AS item_b, tc AS item_c,
       COUNT(*) AS support
FROM t GROUP BY 1, 2, 3
HAVING 2 * COUNT(*) >= (SELECT n FROM nu)
ORDER BY item_a, item_b, item_c""")
def user_type_triples(sf_dir: str) -> pd.DataFrame:
    """Frequent 3-itemsets over user baskets (A-Priori,
    stages/itemsets.py): event-type triples co-occurring in the
    activity of >= 50% of users. Oracle: the unpruned triple
    self-join with the same integer-cross-multiplied HAVING —
    identical output by downward closure."""
    from webalizer_ray.stages.itemsets import frequent_triples

    ds = _events(sf_dir, ["user_id", "event_type"])
    return frequent_triples(ds, basket_col="user_id",
                            item_col="event_type", num=1, den=2)


@register("doc_term_triples", sql=r"""
WITH d AS (SELECT DISTINCT doc_id,
                  unnest(regexp_extract_all(text, '\S+')) AS w
           FROM documents),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
t AS (SELECT a.w AS ta, b.w AS tb, c.w AS tc
      FROM d a
      JOIN d b ON a.doc_id = b.doc_id AND a.w < b.w
      JOIN d c ON a.doc_id = c.doc_id AND b.w < c.w)
SELECT ta AS item_a, tb AS item_b, tc AS item_c,
       COUNT(*) AS support
FROM t GROUP BY 1, 2, 3
HAVING 2 * COUNT(*) >= (SELECT n FROM nd)
ORDER BY item_a, item_b, item_c""")
def doc_term_triples(sf_dir: str) -> pd.DataFrame:
    """Frequent term 3-itemsets over document baskets (A-Priori,
    stages/itemsets.py) — the text-mining form of market-basket
    analysis: word triples co-occurring in >= 50% of documents. Here
    the downward-closure prune genuinely bites (words below the pair
    threshold never enter the triple expansion); word split is the
    corpus-wide \S+ convention shared with vocab/BPE/Zipf. Oracle:
    unpruned triple self-join over distinct (doc, word) with the
    identical integer-cross-multiplied HAVING."""
    from webalizer_ray.stages.itemsets import frequent_triples

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(r"\S+")
        n = toks.str.len().to_numpy()
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), n),
            "w": np.concatenate(toks.to_numpy())
            if n.sum() else np.array([], dtype=object)})

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas")
    return frequent_triples(rows, basket_col="doc_id", item_col="w",
                            num=1, den=2)


@register("daily_ewma_counts", sql="""
WITH RECURSIVE daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY day),
ord AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i
        FROM daily),
w(i, day, s) AS (
  SELECT i, day, y FROM ord WHERE i = 1
  UNION ALL
  SELECT o.i, o.day,
         CAST(0.2 AS DOUBLE) * o.y + CAST(0.8 AS DOUBLE) * w.s
  FROM ord o JOIN w ON o.i = w.i + 1)
SELECT day, ROUND(s, 6) AS ewma FROM w ORDER BY day""")
def daily_ewma_counts(sf_dir: str) -> pd.DataFrame:
    """Exponentially-weighted moving average of the daily event volume
    (α = 0.2; s₁ = y₁, sₜ = αyₜ + (1−α)sₜ₋₁) — the standard streaming
    trend smoother dashboards and alert baselines run on. Scale shape
    shared with changepoint/ACF/periodicity: the heavy work is ONE
    distributed daily-count reduce (O(days) rows at any corpus size);
    the recursion is inherently sequential so it runs driver-side in
    EXACTLY the oracle's float expression order (same multiply-add
    per step → bit-identical doubles). Oracle: recursive CTE over the
    row-numbered day series."""
    from webalizer_ray.stages import textstats

    ds = _events(sf_dir, ["ts"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    daily = reduce_sink(ds, ["date"], {"y": ("ts", "size")}) \
        .to_pandas().sort_values("date", ignore_index=True)
    y = daily["y"].to_numpy(np.float64)
    s = np.empty(len(y))
    if len(y):
        s[0] = y[0]
        for i in range(1, len(y)):
            s[i] = 0.2 * y[i] + 0.8 * s[i - 1]
    return pd.DataFrame({
        "day": daily["date"],
        "ewma": textstats.round_half_away(s, 6)})


@register("fd_profile_docs", sql="""
WITH pairs AS (
  SELECT 'lang->source' AS fd, lang AS x, source AS y FROM documents
  UNION ALL SELECT 'source->lang', source, lang FROM documents
  UNION ALL SELECT 'lang->nchars', lang, CAST(n_chars AS VARCHAR)
            FROM documents
  UNION ALL SELECT 'nchars->lang', CAST(n_chars AS VARCHAR), lang
            FROM documents
  UNION ALL SELECT 'source->nchars', source, CAST(n_chars AS VARCHAR)
            FROM documents
  UNION ALL SELECT 'nchars->source', CAST(n_chars AS VARCHAR), source
            FROM documents),
d AS (SELECT DISTINCT fd, x, y FROM pairs),
k AS (SELECT fd, x, COUNT(*) AS rhs FROM d GROUP BY fd, x)
SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
       CAST(MAX(rhs) AS BIGINT) AS max_rhs
FROM k GROUP BY fd ORDER BY fd""")
def fd_profile_docs(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency discovery (the data-profiling primitive
    behind schema normalization and data-contract inference, cf.
    Papenbrock et al. VLDB 2015): for every ordered column pair among
    (lang, source, n_chars), how many LHS keys exist, how many have
    more than one distinct RHS value (FD violations), and the worst
    fan-out. One melt pass emits all six candidates' (fd, x, y) rows;
    a two-phase distinct reduce makes each (fd, x, y) one row
    globally, per-key RHS counts and the per-FD rollup are ordinary
    keyed partials — neither rows nor keys reach the driver until the
    six-row summary. Values compare as strings (str(int) ==
    CAST(BIGINT AS VARCHAR)) so typed columns profile uniformly."""
    cands = [("lang->source", "lang", "source"),
             ("source->lang", "source", "lang"),
             ("lang->nchars", "lang", "n_chars"),
             ("nchars->lang", "n_chars", "lang"),
             ("source->nchars", "source", "n_chars"),
             ("nchars->source", "n_chars", "source")]

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for fd, xc, yc in cands:
            frames.append(pd.DataFrame({
                "fd": fd,
                "x": df[xc].astype(str).to_numpy(),
                "y": df[yc].astype(str).to_numpy()}))
        return pd.concat(frames, ignore_index=True).drop_duplicates()

    ds = _docs(sf_dir, ["lang", "source", "n_chars"]) \
        .map_batches(melt, batch_format="pandas")
    # two-phase distinct: after this reduce each (fd, x, y) is ONE row
    d = reduce_sink(ds, ["fd", "x", "y"], {"c": ("fd", "size")})
    rhs = reduce_sink(d, ["fd", "x"], {"rhs": ("c", "size")})

    def viol(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "fd": df["fd"],
            "k": np.ones(len(df), np.int64),
            "v": (df["rhs"].to_numpy(np.int64) > 1).astype(np.int64),
            "m": df["rhs"].to_numpy(np.int64)})

    out = reduce_sink(rhs.map_batches(viol, batch_format="pandas"),
                      ["fd"], {"n_keys": ("k", "sum"),
                               "n_violating_keys": ("v", "sum"),
                               "max_rhs": ("m", "max")}).to_pandas()
    for c in ("n_keys", "n_violating_keys", "max_rhs"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("fd", ignore_index=True)


@register("knn_sssp_distances", sql="""
WITH RECURSIVE sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor, cosine,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
e0 AS (SELECT node AS src, neighbor AS dst,
              CAST(1000000 - ROUND(cosine * 1000000, 0) AS BIGINT) AS w
       FROM r WHERE rank <= 2),
e AS (SELECT src, dst, w FROM e0 UNION SELECT dst, src, w FROM e0),
walk(node, cost, depth) AS (
  SELECT DISTINCT src, CAST(0 AS BIGINT), 0 FROM e WHERE src IN (0, 1, 2)
  UNION
  SELECT e.dst, w2.cost + e.w, w2.depth + 1
  FROM e JOIN walk w2 ON e.src = w2.node WHERE w2.depth < 4)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(cost) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node""")
def knn_sssp_distances(sf_dir: str) -> pd.DataFrame:
    """Weighted shortest-path distances (Bellman-Ford,
    stages/graph.py:sssp_distances) from seed vectors {0,1,2} over
    the exact k-NN graph, edge weight = integer micro-dissimilarity
    1e6 − round(cosine·1e6) (exact int64 path sums — no float
    accumulation to disagree on), capped at 4 hops. Each superstep is
    one relax groupby + one settle groupby; the improvement-only
    frontier re-expands late improvements (tested). Oracle:
    recursive-CTE walk carrying (node, cost, depth < 4), MIN(cost)
    at the end — identical hop-cap semantics."""
    from webalizer_ray.stages.graph import sssp_distances

    g = knn_graph(sf_dir)[["node", "neighbor", "cosine"]]
    w = (1_000_000
         - np.rint(g["cosine"].to_numpy(np.float64) * 1e6)) \
        .astype(np.int64)
    edges = pd.DataFrame({
        "src": np.concatenate([g["node"].to_numpy(np.int64),
                               g["neighbor"].to_numpy(np.int64)]),
        "dst": np.concatenate([g["neighbor"].to_numpy(np.int64),
                               g["node"].to_numpy(np.int64)]),
        "w": np.concatenate([w, w])}) \
        .drop_duplicates(subset=["src", "dst"], ignore_index=True)
    state = sssp_distances(edges, roots=[0, 1, 2], max_hops=4)
    out = state.to_pandas()
    for c in ("node", "dist"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("node", ignore_index=True)


@register("knn_outlier_scores", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, cosine,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims)
SELECT node AS vec_id, cosine AS knn3_cosine
FROM r WHERE rank = 3
ORDER BY knn3_cosine, vec_id LIMIT 20""")
def knn_outlier_scores(sf_dir: str) -> pd.DataFrame:
    """k-distance outlier scores (Ramaswamy et al. SIGMOD 2000): each
    vector's cosine to its 3rd nearest neighbor, lowest-first — the
    embedding-space quality gate that surfaces the 20 most isolated
    vectors (corrupted / off-distribution points) before training.
    Reuses the brute-force top-k combiner (per-batch local top-4, tiny
    global merge) as the parity baseline; the LSH / IVF paths in
    stages/ann.py are the scale route, exactly the ann_topk split.
    The rank-3 VALUE is tie-safe across engines: the 9-dp ranking
    refines the oracle's 6-dp ordering, so the 3rd-largest 6-dp
    cosine is identical however 6-dp ties are broken."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    vecs = np.stack(tbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, vecs, k=4)   # 3 neighbors + self
    out["node"] = ids[out["query_id"].to_numpy()]
    # drop the self edge by IDENTITY, not rank (an exact-duplicate
    # vector with a smaller id outranks self)
    out = out[out["node"] != out["vec_id"]].copy()
    out = out.sort_values(["node", "rank"], ignore_index=True)
    out["nn"] = out.groupby("node", sort=False).cumcount() + 1
    out = out[out["nn"] == 3]
    res = pd.DataFrame({
        "vec_id": out["node"].to_numpy(np.int64),
        "knn3_cosine": out["cosine"].round(6)})
    return res.sort_values(["knn3_cosine", "vec_id"],
                           ignore_index=True).head(20)


@register("geo_dbscan_cluster_sizes", sql="""
WITH RECURSIVE p AS (
  SELECT c_custkey AS id,
         (c_custkey * 2654435761) % 180000 - 90000 AS x,
         (c_custkey * 2246822519) % 360000 - 180000 AS y
  FROM customer),
e AS (SELECT a.id AS ia, b.id AS ib
      FROM p a JOIN p b ON a.id != b.id
      WHERE (a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) <= 5000 * 5000),
deg AS (SELECT ia AS id, COUNT(*) AS n FROM e GROUP BY ia),
core AS (SELECT id FROM deg WHERE n >= 2),
ce AS (SELECT ia, ib FROM e
       WHERE ia IN (SELECT id FROM core)
         AND ib IN (SELECT id FROM core)),
walk(node, rep) AS (
  SELECT id, id FROM core
  UNION
  SELECT ce.ib, w.rep FROM ce JOIN walk w ON ce.ia = w.node),
comp AS (SELECT node, MIN(rep) AS rep FROM walk GROUP BY node),
border AS (
  SELECT e.ia AS node, MIN(c.rep) AS rep
  FROM e JOIN comp c ON e.ib = c.node
  WHERE e.ia NOT IN (SELECT id FROM core)
  GROUP BY e.ia),
member AS (SELECT node, rep FROM comp
           UNION ALL SELECT node, rep FROM border)
SELECT CAST(rep AS BIGINT) AS cluster_rep,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM member GROUP BY rep
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM p WHERE id NOT IN (SELECT node FROM member)
ORDER BY cluster_rep""")
def geo_dbscan_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Grid DBSCAN (Ester et al. KDD 1996) composed from two existing
    primitives: the EXACT ε-neighborhood pair set comes from the grid
    distance join (stages/spatial.py — cell width = ε, every
    qualifying pair meets exactly once) and core-core clusters from
    connected components (stages/dedup.py). minPts = 3 (core iff ≥ 2
    neighbors within ε = 5000); border points attach to the MIN
    cluster rep among their core neighbors — textbook DBSCAN leaves
    multi-cluster border ties scan-order-dependent, the min rule makes
    the labeling deterministic and SQL-checkable. Core-id set and the
    core→rep map broadcast once (the sparse-map pattern shared with
    the leakage-safe split); only (id, deg) and (node, rep) partials
    shuffle. Output: one (cluster_rep = min member id, n_points) row
    per cluster including borders, plus a cluster_rep = -1 noise row.
    Oracle: recursive-CTE min-label closure over the identical
    integer-predicate edge set."""
    from webalizer_ray.stages.spatial import dbscan_labels

    def to_points(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({"id": k,
                             "x": (k * 2654435761) % 180000 - 90000,
                             "y": (k * 2246822519) % 360000 - 180000})

    pts = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"]) \
        .map_batches(to_points, batch_format="pandas")
    member, n_noise = dbscan_labels(pts, radius=5000, min_pts=3)
    sizes = member.groupby("rep").size().reset_index(name="n_points") \
        if len(member) else pd.DataFrame(
            {"rep": pd.Series(dtype=np.int64),
             "n_points": pd.Series(dtype=np.int64)})
    out = pd.concat([
        pd.DataFrame({"cluster_rep": sizes["rep"].to_numpy(np.int64),
                      "n_points": sizes["n_points"]
                      .to_numpy(np.int64)}),
        pd.DataFrame({"cluster_rep": np.array([-1], np.int64),
                      "n_points": np.array([n_noise], np.int64)})],
        ignore_index=True)
    return out.sort_values("cluster_rep", ignore_index=True)


@register("linear_interp_value_sum", sql="""
WITH v AS (SELECT user_id, ts, event_id, event_type,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE CAST(ROUND(value * 100) AS BIGINT)
                  END AS c
           FROM events),
w AS (SELECT event_type, c,
        epoch_us(ts) AS t,
        LAST_VALUE(c IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
        LAST_VALUE(CASE WHEN c IS NOT NULL THEN epoch_us(ts) END
                   IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        FIRST_VALUE(c IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc,
        FIRST_VALUE(CASE WHEN c IS NOT NULL THEN epoch_us(ts) END
                    IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM v),
i AS (SELECT event_type,
             CAST(pc AS DOUBLE)
             + (CAST(nc AS DOUBLE) - CAST(pc AS DOUBLE))
               * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                 AS interp
      FROM w WHERE c IS NULL AND pc IS NOT NULL AND nc IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS interp_rows,
       CAST(SUM(CAST(ROUND(interp * 10000, 0) AS BIGINT)) AS BIGINT)
           AS interp_qsum
FROM i GROUP BY event_type ORDER BY event_type""")
def linear_interp_value_sum(sf_dir: str) -> pd.DataFrame:
    """Time-weighted linear-interpolation imputation (the upgrade of
    LOCF for dropout gaps): each 'error' row between two of its
    user's observations takes pc + (nc − pc)·(Δt_prev/Δt_span) —
    exact-µs times and integer-cent endpoints feed ONE float
    expression both engines evaluate in the same order, then each row
    quantizes to an int64 tenth-milli-cent so the per-type SUM is
    exact under any summation order (the Q1 micro-quantization rule:
    rint can't sit on a .5 that the rational value doesn't). Rows
    before a user's first / after its last observation stay null and
    drop, exactly like the oracle's IGNORE NULLS frames. User-hash
    buckets make the whole fill one vectorized cythonized
    groupby-shift/ffill/bfill pass per bucket."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["ts", "event_id", "user_id", "event_type",
                          "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100)
        c[df["event_type"].to_numpy(object) == "error"] = np.nan
        out = pd.DataFrame({
            "user_id": df["user_id"], "ts": df["ts"],
            "event_id": df["event_id"],
            "event_type": df["event_type"], "c": c,
            "t": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64)})
        out["_h"] = key_bucket(out, ["user_id"], 64)
        return out

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        tc = g["t"].where(g["c"].notna()).astype(np.float64)
        g["pc"] = grp["c"].shift()
        g["pc"] = grp["pc"].ffill()
        g["pt"] = tc.groupby(g["user_id"], sort=False).shift()
        g["pt"] = g.groupby("user_id", sort=False)["pt"].ffill()
        g["nc"] = grp["c"].shift(-1)
        g["nc"] = g.groupby("user_id", sort=False)["nc"].bfill()
        g["nt"] = tc.groupby(g["user_id"], sort=False).shift(-1)
        g["nt"] = g.groupby("user_id", sort=False)["nt"].bfill()
        m = g["c"].isna() & g["pc"].notna() & g["nc"].notna()
        s = g[m]
        pc = s["pc"].to_numpy(np.float64)
        nc = s["nc"].to_numpy(np.float64)
        val = pc + (nc - pc) * ((s["t"].to_numpy(np.float64)
                                 - s["pt"].to_numpy(np.float64))
                                / (s["nt"].to_numpy(np.float64)
                                   - s["pt"].to_numpy(np.float64)))
        return pd.DataFrame({
            "event_type": s["event_type"].to_numpy(),
            "interp_rows": np.ones(len(s), np.int64),
            "interp_qsum": np.rint(val * 10000).astype(np.int64)})

    agg = reduce_sink(
        (ds.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(interp, batch_format="pandas")),
        ["event_type"], {"interp_rows": ("interp_rows", "sum"),
                         "interp_qsum": ("interp_qsum", "sum")}) \
        .to_pandas()
    for c in ("interp_rows", "interp_qsum"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("event_type", ignore_index=True)


@register("knn_mutual_pairs", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor, cosine,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
t1 AS (SELECT node, neighbor, cosine FROM r WHERE rank = 1)
SELECT a.node AS id_a, a.neighbor AS id_b, a.cosine AS cosine
FROM t1 a JOIN t1 b ON a.node = b.neighbor AND a.neighbor = b.node
WHERE a.node < a.neighbor
ORDER BY id_a""")
def knn_mutual_pairs(sf_dir: str) -> pd.DataFrame:
    """Reciprocal best matches (mutual nearest neighbors): pairs that
    are each other's top-1 — the high-precision match criterion
    record-linkage and bitext-mining pipelines use before any
    threshold tuning (cf. Artetxe & Schwenk, margin-based mining).
    Pure composition: derive rank-1 edges from the already
    oracle-exact knn_graph and keep the symmetric ones with one
    self-merge of the tiny edge list."""
    g = knn_graph(sf_dir)
    t1 = g[g["rank"] == 1][["node", "neighbor", "cosine"]]
    m = t1.merge(t1, left_on=["node", "neighbor"],
                 right_on=["neighbor", "node"], suffixes=("", "_r"))
    m = m[m["node"] < m["neighbor"]]
    out = pd.DataFrame({
        "id_a": m["node"].to_numpy(np.int64),
        "id_b": m["neighbor"].to_numpy(np.int64),
        "cosine": m["cosine"].to_numpy(np.float64)})
    return out.sort_values("id_a", ignore_index=True)


@register("part_name_entity_clusters", sql="""
WITH RECURSIVE n AS (SELECT DISTINCT p_name AS key FROM part),
e0 AS (SELECT a.key AS a, b.key AS b FROM n a JOIN n b ON a.key < b.key
       WHERE levenshtein(a.key, b.key) <= 2),
e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
walk(node, rep) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.b, w.rep FROM e JOIN walk w ON e.a = w.node),
comp AS (SELECT node, MIN(rep) AS rep FROM walk GROUP BY node),
sizes AS (SELECT rep, COUNT(*) AS sz FROM comp GROUP BY rep),
hist AS (SELECT sz AS cluster_size,
                CAST(COUNT(*) AS BIGINT) AS n_clusters
         FROM sizes GROUP BY sz
         UNION ALL
         SELECT 1, (SELECT COUNT(*) FROM n)
                   - (SELECT COUNT(*) FROM comp))
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
FROM hist GROUP BY cluster_size ORDER BY cluster_size""")
def part_name_entity_clusters(sf_dir: str) -> pd.DataFrame:
    """End-to-end entity resolution composed from two verified
    primitives: PassJoin edit-distance matching (exact recall at
    k <= 2) supplies the match edges, connected components folds them
    into entities, and names outside every match pair stay singleton
    entities by arithmetic (total − clustered) — no second scan.
    Cluster rep = min member (string order == the sorted-factorize
    integer order CC runs on), so the size histogram is deterministic
    on both engines. Oracle: brute-force levenshtein self-join +
    recursive-CTE min-label closure + the same singleton fold."""
    from webalizer_ray.stages.dedup import connected_components
    from webalizer_ray.stages.simjoin import edit_distance_join

    names = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"]).map_batches(
        lambda df: df.rename(columns={"p_name": "key"}),
        batch_format="pandas")
    n_names = reduce_sink(names, ["key"],
                          {"c": ("key", "size")}).count()
    pairs = edit_distance_join(names, k=2)
    if not len(pairs):
        return pd.DataFrame({
            "cluster_size": np.array([1], np.int64),
            "n_clusters": np.array([n_names], np.int64)})
    # factorize pair-endpoint strings in SORTED order so min int id
    # == min string — the rep convention the oracle's MIN(rep) uses
    vocab = np.unique(np.concatenate([pairs["a"].to_numpy(object),
                                      pairs["b"].to_numpy(object)]))
    comp = connected_components(pd.DataFrame({
        "id_a": np.searchsorted(vocab, pairs["a"].to_numpy(object)),
        "id_b": np.searchsorted(vocab, pairs["b"].to_numpy(object))}))
    sizes = comp.groupby("cluster_id").size().value_counts() \
        .sort_index()
    hist = pd.DataFrame({
        "cluster_size": sizes.index.to_numpy(np.int64),
        "n_clusters": sizes.to_numpy(np.int64)})
    singletons = n_names - len(comp)
    hist = pd.concat([hist, pd.DataFrame(
        {"cluster_size": np.array([1], np.int64),
         "n_clusters": np.array([singletons], np.int64)})],
        ignore_index=True)
    out = hist.groupby("cluster_size", as_index=False)["n_clusters"] \
        .sum().sort_values("cluster_size", ignore_index=True)
    return out.astype(np.int64)


@register("user_value_skyline", sql="""
WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                      AS value_cents
           FROM events GROUP BY user_id)
SELECT a.user_id, a.n_events, a.value_cents
FROM u a
WHERE NOT EXISTS (
  SELECT 1 FROM u b
  WHERE b.n_events >= a.n_events AND b.value_cents >= a.value_cents
    AND (b.n_events > a.n_events OR b.value_cents > a.value_cents))
ORDER BY user_id""")
def user_value_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto frontier (Börzsönyi et al., ICDE 2001): users
    undominated on (activity, spend) — the multi-criteria 'best'
    operator behind leaderboards and trade-off exploration. The
    per-user aggregate is the usual cents-quantized partial reduce;
    the skyline itself is mergeable (stages/skyline.py), so only
    block-local frontiers reach the driver. Oracle: the textbook
    NOT EXISTS dominance anti-join."""
    from webalizer_ray.stages.skyline import skyline_2d

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "_one": np.ones(len(df), np.int64),
            "value_cents": np.rint(df["value"].to_numpy() * 100)
            .astype(np.int64)})

    per_user = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(cents, batch_format="pandas"),
        ["user_id"], {"n_events": ("_one", "sum"),
                      "value_cents": ("value_cents", "sum")})
    out = skyline_2d(per_user, "n_events", "value_cents")
    for c in ("user_id", "n_events", "value_cents"):
        out[c] = out[c].astype(np.int64)
    return out[["user_id", "n_events", "value_cents"]] \
        .sort_values("user_id", ignore_index=True)


@register("chi_square_type_hour", sql="""
WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rn FROM c GROUP BY 1),
k AS (SELECT hour, CAST(SUM(n) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
g AS (SELECT r.event_type, k.hour, COALESCE(c.n, 0) AS observed,
             (r.rn * k.cn) / t.tot AS expected
      FROM r CROSS JOIN k CROSS JOIN t
      LEFT JOIN c ON c.event_type = r.event_type AND c.hour = k.hour)
SELECT event_type, hour, CAST(observed AS BIGINT) AS observed,
       ROUND(expected, 6) AS expected,
       ROUND((observed - expected) * (observed - expected) / expected,
             6) AS contrib
FROM g ORDER BY event_type, hour""")
def chi_square_type_hour(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence test cells (event_type x hour-of-day):
    observed vs expected-under-independence and each cell's χ²
    contribution. The heavy work is ONE contingency count reduce
    (output = |types| x 24 at ANY corpus size); the closed form runs
    on the tiny table in oracle expression order — integer marginal
    products divided once, (o-e)*(o-e)/e with e computed exactly
    once, so both engines execute the identical float expression
    tree. Zero-observed cells are materialized from the marginal
    cross product (textbook χ² sums over ALL cells)."""
    obs = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(_with_time_cols({"hour"}), batch_format="pyarrow"),
        ["event_type", "hour"], {"n": ("hour", "size")}).to_pandas()
    rn = obs.groupby("event_type")["n"].sum()
    cn = obs.groupby("hour")["n"].sum()
    tot = int(obs["n"].sum())
    grid = pd.MultiIndex.from_product(
        [sorted(rn.index), sorted(cn.index)],
        names=["event_type", "hour"]).to_frame(index=False)
    grid = grid.merge(obs, how="left").fillna({"n": 0})
    o = grid["n"].to_numpy(np.int64)
    e = (rn.loc[grid["event_type"]].to_numpy(np.int64)
         * cn.loc[grid["hour"]].to_numpy(np.int64)) / tot
    return pd.DataFrame({
        "event_type": grid["event_type"],
        "hour": grid["hour"].to_numpy(np.int64),
        "observed": o,
        "expected": np.round(e, 6),
        "contrib": np.round((o - e) * (o - e) / e, 6),
    }).sort_values(["event_type", "hour"], ignore_index=True)


@register("user_max_streak", sql="""
WITH d AS (SELECT DISTINCT user_id,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS day
           FROM events),
r AS (SELECT user_id, day,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY day) AS BIGINT) AS rn
      FROM d),
i AS (SELECT user_id, day - rn AS island,
             CAST(COUNT(*) AS BIGINT) AS len
      FROM r GROUP BY 1, 2)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM i GROUP BY user_id ORDER BY user_id""")
def user_max_streak(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-active-day streak per user (the classic
    gaps-and-islands ROW_NUMBER trick, run distributed): phase 1 is an
    exact two-phase DISTINCT of (user, day) — only deduped day rows
    shuffle; phase 2 buckets by user (a user's days never span
    buckets) and finds islands with one vectorized scan per bucket
    (island id = day − rank-within-user, constant within a run of
    consecutive days). Only per-user (max_streak, active_days) rows
    leave the cluster."""
    def days(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64)})

    distinct = reduce_sink(
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(days, batch_format="pandas"),
        ["user_id", "day"], {"_n": ("day", "size")})

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "day"], ignore_index=True)
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        isl = np.cumsum(new)
        lens = pd.DataFrame({"user_id": u, "isl": isl}) \
            .groupby(["user_id", "isl"], sort=False).size() \
            .reset_index(name="len")
        out = lens.groupby("user_id", sort=False) \
            .agg(max_streak=("len", "max"), active_days=("len", "sum")) \
            .reset_index()
        return out.astype(np.int64)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    out = (distinct.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_")
           .map_groups(lambda g: streaks(g.drop(columns=["bucket_"])),
                       batch_format="pandas")).to_pandas()
    return out.sort_values("user_id", ignore_index=True)


@register("value_equidepth_hist", sql="""
WITH r AS (SELECT value, event_id,
                  NTILE(10) OVER (ORDER BY value, event_id) AS bin
           FROM events)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM r GROUP BY bin ORDER BY bin""")
def value_equidepth_hist(sf_dir: str) -> pd.DataFrame:
    """Equi-depth (NTILE) histogram of event value — the
    optimizer-statistics / quantile-binning primitive. Bin assignment
    is the SQL-NTILE closed form over scan.global_rank's exact
    (value, event_id) rank (range-bucketed ranks, NO global sort
    shuffle — equal values can't straddle buckets, so ranks and
    therefore bins are bit-identical to the window function); bin
    boundaries and the cents mass come from one reduce over the
    10-row key space. Nothing but 10 summary rows reaches the
    driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.rint(df["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)
        return df

    u = _events(sf_dir, ["event_id", "value"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    n = u.count()
    ranked = scan.global_rank(u, "value", "event_id", out_col="rnk",
                              num_buckets=16)

    q, rem = divmod(n, 10)
    big = rem * (q + 1)

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rnk"].to_numpy(np.int64)
        df = df.copy()
        df["bin"] = np.where(
            r <= big, (r - 1) // max(q + 1, 1) + 1,
            rem + (r - big - 1) // max(q, 1) + 1).astype(np.int64)
        return df

    out = reduce_sink(
        ranked.map_batches(binned, batch_format="pandas"),
        ["bin"], {"n": ("rnk", "size"), "lo": ("value", "min"),
                  "hi": ("value", "max"),
                  "value_cents": ("cents", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    out["lo"] = out["lo"].round(6)
    out["hi"] = out["hi"].round(6)
    return out[["bin", "n", "lo", "hi", "value_cents"]] \
        .sort_values("bin", ignore_index=True)


@register("view_click_daily_crosscorr", sql="""
WITH RECURSIVE
b AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                            MIN(CAST(ts AS DATE))) AS BIGINT) AS d0,
             CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) AS span
      FROM events),
spine(t) AS (SELECT CAST(0 AS BIGINT)
             UNION ALL
             SELECT t + 1 FROM spine
             WHERE t < (SELECT span FROM b)),
c AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS BIGINT)
             - (SELECT d0 FROM b) AS t,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY 1, 2),
sp AS (SELECT s.t, COALESCE(x.n, 0) AS xs, COALESCE(y.n, 0) AS ys
       FROM spine s
       LEFT JOIN c x ON x.t = s.t AND x.event_type = 'view'
       LEFT JOIN c y ON y.t = s.t AND y.event_type = 'click'),
l AS (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS lag),
p AS (SELECT l.lag, a.xs AS xv, b2.ys AS yv
      FROM l JOIN sp a ON TRUE
             JOIN sp b2 ON b2.t = a.t + l.lag),
m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xv) AS BIGINT) AS sx,
             CAST(SUM(yv) AS BIGINT) AS sy,
             CAST(SUM(xv * xv) AS BIGINT) AS sxx,
             CAST(SUM(yv * yv) AS BIGINT) AS syy,
             CAST(SUM(xv * yv) AS BIGINT) AS sxy
      FROM p GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN ROUND((n * sxy - sx * sy) /
                       sqrt(((n * sxx - sx * sx) * 1.0)
                            * (n * syy - sy * sy)), 6)
            END AS r
FROM m ORDER BY lag""")
def view_click_daily_crosscorr(sf_dir: str) -> pd.DataFrame:
    """Lagged cross-correlation between two daily event series (does
    'view' volume lead 'click' volume?): r(L) = Pearson(view_t,
    click_{t+L}) for L = 0..7 over a FULL day spine (zero-count days
    included — the textbook CCF needs the gaps). The cluster does ONE
    (day, type) contingency reduce — |days| x 2 rows at any corpus
    size; the per-lag sums are exact int64 over that tiny table, and
    the closed form runs in oracle expression order so both engines
    execute the identical float tree."""
    def daily(df: pd.DataFrame) -> pd.DataFrame:
        # keep ALL types: the spine bounds come from the full table and
        # the contingency stays |days| x |types| — still tiny
        return pd.DataFrame({
            "t": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64),
            "event_type": df["event_type"]})

    counts = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(daily, batch_format="pandas"),
        ["t", "event_type"], {"n": ("t", "size")}).to_pandas()
    d0 = int(counts["t"].min())
    d1 = int(counts["t"].max())

    span = d1 - d0 + 1
    xs = np.zeros(span, dtype=np.int64)
    ys = np.zeros(span, dtype=np.int64)
    for col, arr in (("view", xs), ("click", ys)):
        sub = counts[counts["event_type"] == col]
        arr[sub["t"].to_numpy(np.int64) - d0] = \
            sub["n"].to_numpy(np.int64)

    rows = []
    for lag in range(8):
        xv, yv = xs[:span - lag], ys[lag:]
        n = int(len(xv))
        sx, sy = int(xv.sum()), int(yv.sum())
        sxx, syy = int((xv * xv).sum()), int((yv * yv).sum())
        sxy = int((xv * yv).sum())
        va, vb = n * sxx - sx * sx, n * syy - sy * sy
        r = float(textstats.round_half_away(
            np.array([(n * sxy - sx * sy)
                      / np.sqrt((va * 1.0) * vb)]), 6)[0]) \
            if va > 0 and vb > 0 else None
        rows.append((lag, n, r))
    return pd.DataFrame(rows, columns=["lag", "n_days", "r"]) \
        .astype({"lag": np.int64, "n_days": np.int64})


@register("spearman_activity_value", sql="""
WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS y
           FROM events GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
r AS (SELECT 2 * CAST(RANK() OVER (ORDER BY x) AS BIGINT)
             + CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) - 1
             - ((SELECT n FROM nn) + 1) AS cx,
             2 * CAST(RANK() OVER (ORDER BY y) AS BIGINT)
             + CAST(COUNT(*) OVER (PARTITION BY y) AS BIGINT) - 1
             - ((SELECT n FROM nn) + 1) AS cy
      FROM u),
m AS (SELECT CAST(SUM(cx * cy) AS BIGINT) AS sxy,
             CAST(SUM(cx * cx) AS BIGINT) AS sxx,
             CAST(SUM(cy * cy) AS BIGINT) AS syy
      FROM r)
SELECT (SELECT n FROM nn) AS users,
       CASE WHEN sxx > 0 AND syy > 0
            THEN ROUND(sxy / sqrt((sxx * 1.0) * syy), 6) END AS rho
FROM m""")
def spearman_activity_value(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation (tie-averaged) between per-user
    activity and spend — the robust dependence screen Pearson can't
    give on heavy-tailed data. Exact everywhere: tie-averaged ranks
    are kept INTEGER by doubling (2·avgrank = 2·minrank + ties − 1)
    and centering by the constant mean n+1, so every moment is an
    int64 sum and the single float division happens once, in oracle
    expression order. Distribution: one per-user reduce, two
    scan.global_rank passes (no global sort), per-key tie stats as a
    second tiny reduce — the x map (distinct activity counts) and the
    ties-only y map broadcast; only 3 scalar moments leave."""
    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "_one": np.ones(len(df), np.int64),
            "y": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(cents, batch_format="pandas"),
        ["user_id"], {"x": ("_one", "sum"), "y": ("y", "sum")})

    def floats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["x_f"] = df["x"].to_numpy(np.int64).astype(np.float64)
        df["y_f"] = df["y"].to_numpy(np.int64).astype(np.float64)
        return df

    u = u.map_batches(floats, batch_format="pandas").materialize()
    n = u.count()
    ranked = scan.global_rank(u, "x_f", "user_id", out_col="rx",
                              num_buckets=8)
    ranked = scan.global_rank(ranked, "y_f", "user_id", out_col="ry",
                              num_buckets=8).materialize()

    # per-key tie stats: RANK() = min(row_number) over the key, ties =
    # count.  x has few distinct values (activity counts) -> full map;
    # y is near-unique -> broadcast ONLY the tied keys (rows with
    # ties=1 use ry directly: 2*minrank+0 = 2*row_number)
    xstats = reduce_sink(ranked, ["x"],
                         {"mn": ("rx", "min"), "ct": ("rx", "size")}) \
        .to_pandas()
    xmap = {int(k): 2 * int(m) + int(c) - 1 - (n + 1)
            for k, m, c in zip(xstats["x"], xstats["mn"], xstats["ct"])}
    ystats = reduce_sink(ranked, ["y"],
                         {"mn": ("ry", "min"), "ct": ("ry", "size")}) \
        .map_batches(lambda df: df[df["ct"] > 1],
                     batch_format="pandas").to_pandas()
    # no tied y at all -> empty blocks lose their schema (Ray 2.49)
    ymap = {} if ystats.empty else \
        {int(k): 2 * int(m) + int(c) - 1 - (n + 1)
         for k, m, c in zip(ystats["y"], ystats["mn"], ystats["ct"])}

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["x"].map(xmap).to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        cy = 2 * df["ry"].to_numpy(np.int64) - (n + 1)
        tied = df["y"].map(ymap)
        cy = np.where(tied.notna(), tied.fillna(0).to_numpy(np.int64),
                      cy)
        return pd.DataFrame({"k": [0],
                             "sxy": [int((cx * cy).sum())],
                             "sxx": [int((cx * cx).sum())],
                             "syy": [int((cy * cy).sum())]})

    mom = reduce_sink(ranked.map_batches(moments, batch_format="pandas"),
                      ["k"], {"sxy": ("sxy", "sum"),
                              "sxx": ("sxx", "sum"),
                              "syy": ("syy", "sum")}).to_pandas()
    sxy, sxx, syy = (int(mom[c].iloc[0]) for c in ("sxy", "sxx", "syy"))
    rho = float(textstats.round_half_away(
        np.array([sxy / np.sqrt((sxx * 1.0) * syy)]), 6)[0]) \
        if sxx > 0 and syy > 0 else None
    return pd.DataFrame({"users": np.array([n], np.int64),
                         "rho": [rho]})


@register("winsorized_value_by_type", sql="""
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
q AS (SELECT event_type,
             quantile_disc(cents, 0.05) AS lo,
             quantile_disc(cents, 0.95) AS hi
      FROM c GROUP BY 1),
w AS (SELECT c.event_type,
             CASE WHEN cents < lo THEN lo
                  WHEN cents > hi THEN hi ELSE cents END AS v
      FROM c JOIN q USING (event_type))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS wsum_cents,
       ROUND(CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS BIGINT), 6)
           AS wmean_cents
FROM w GROUP BY 1 ORDER BY 1""")
def winsorized_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Winsorized (5%/95%-clipped) mean per event type — the robust
    location estimate outlier-heavy metrics need. Cents quantization
    makes the column bounded-cardinality, so ONE (type, cents, count)
    histogram reduce is a lossless summary: the discrete quantile
    bounds (DuckDB quantile_disc = 1-based rank ceil(q*n)) AND the
    clipped integer sum both come off the histogram on the driver —
    no second pass, nothing float until the single final division."""
    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hist = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(cents, batch_format="pandas"),
        ["event_type", "cents"], {"cnt": ("cents", "size")}).to_pandas()

    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents", ignore_index=True)
        v = g["cents"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        cum = c.cumsum()
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, int(np.ceil(0.05 * n)),
                                   side="left")])
        hi = int(v[np.searchsorted(cum, int(np.ceil(0.95 * n)),
                                   side="left")])
        wsum = int((np.clip(v, lo, hi) * c).sum())
        rows.append((et, n, wsum, float(textstats.round_half_away(
            np.array([wsum / float(n)]), 6)[0])))
    return pd.DataFrame(rows, columns=["event_type", "n", "wsum_cents",
                                       "wmean_cents"]) \
        .astype({"n": np.int64, "wsum_cents": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("theil_sen_daily_slope", sql="""
WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS t,
                  CAST(COUNT(*) AS BIGINT) AS hits
           FROM events GROUP BY 1),
p AS (SELECT (b.hits - a.hits) / (b.t - a.t) AS slope
      FROM d a JOIN d b ON b.t > a.t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(median(slope), 6) AS slope
FROM p""")
def theil_sen_daily_slope(sf_dir: str) -> pd.DataFrame:
    """Theil–Sen trend estimator over the daily hit series — the
    median of all pairwise slopes, robust where the OLS trend
    (per-group OLS query) is dragged by single-day spikes. The
    cluster does ONE daily-count reduce (|days| rows at any corpus
    size); the O(D²) pair enumeration runs on that tiny series via
    one triu broadcast, and the median mirrors DuckDB quantile_cont:
    order statistic at rank q(m−1), lo + (hi−lo)·frac."""
    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(
            lambda df: pd.DataFrame(
                {"t": df["ts"].to_numpy().astype("datetime64[D]")
                 .astype(np.int64)}), batch_format="pandas"),
        ["t"], {"hits": ("t", "size")}).to_pandas() \
        .sort_values("t", ignore_index=True)
    t = d["t"].to_numpy(np.int64)
    h = d["hits"].to_numpy(np.int64)
    i, j = np.triu_indices(len(t), k=1)
    slopes = np.sort((h[j] - h[i]) / (t[j] - t[i]))
    m = len(slopes)
    r = 0.5 * (m - 1)
    lo = int(np.floor(r))
    med = slopes[lo] + (slopes[min(lo + 1, m - 1)] - slopes[lo]) \
        * (r - lo)
    return pd.DataFrame({
        "n_pairs": np.array([m], np.int64),
        "slope": [float(textstats.round_half_away(
            np.array([med]), 6)[0])]})


@register("view_to_purchase_latency", sql="""
WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'view' GROUP BY 1),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t0
      GROUP BY 1),
d AS (SELECT p.user_id, p.t1 - v.t0 AS delta
      FROM p JOIN v ON p.user_id = v.user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS users,
       CAST(quantile_disc(delta, 0.5) AS BIGINT) AS p50_us,
       CAST(quantile_disc(delta, 0.9) AS BIGINT) AS p90_us
FROM d""")
def view_to_purchase_latency(sf_dir: str) -> pd.DataFrame:
    """Time-to-convert distribution: per user, first 'view' → first
    later 'purchase', then EXACT p50/p90 of the unbounded int64
    latency WITHOUT collecting it — scan.global_rank ranks the
    deltas (range-bucketed, no global sort) and the quantile_disc
    order statistic is just the row where rank == ceil(q·n): a
    distributed SELECTION, the scale path for exact percentiles the
    bounded-histogram trick can't serve. Per-user firsts run inside
    user-hash buckets (users never span buckets)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_type": df["event_type"],
            "us": df["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64),
            "bucket_": (df["user_id"].to_numpy(np.int64) % 32)
            .astype(np.int32)})

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        vm = g[g["event_type"] == "view"].groupby("user_id")["us"].min()
        pu = g[g["event_type"] == "purchase"]
        t0 = pu["user_id"].map(vm)
        pu = pu[t0.notna() & (pu["us"] > t0)]
        if pu.empty:
            return pd.DataFrame({"user_id": pd.Series([], np.int64),
                                 "delta": pd.Series([], np.int64)})
        t1 = pu.groupby("user_id")["us"].min()
        out = pd.DataFrame({"user_id": t1.index.to_numpy(np.int64),
                            "delta": (t1 - vm.loc[t1.index])
                            .to_numpy(np.int64)})
        return out

    dd = (_events(sf_dir, ["user_id", "event_type", "ts"])
          .map_batches(prep, batch_format="pandas")
          .groupby("bucket_")
          .map_groups(lambda g: deltas(g), batch_format="pandas")
          .map_batches(lambda df: df.assign(
              delta_f=df["delta"].astype(np.float64)),
              batch_format="pandas")
          .materialize())
    n = dd.count()
    if n == 0:
        return pd.DataFrame({"users": np.array([0], np.int64),
                             "p50_us": [None], "p90_us": [None]})
    targets = {int(np.ceil(0.5 * n)), int(np.ceil(0.9 * n))}
    ranked = scan.global_rank(dd, "delta_f", "user_id", out_col="rnk",
                              num_buckets=8)
    hits = ranked.map_batches(
        lambda df: df[df["rnk"].isin(list(targets))],
        batch_format="pandas").to_pandas()
    by_rank = dict(zip(hits["rnk"].astype(int), hits["delta"]))
    return pd.DataFrame({
        "users": np.array([n], np.int64),
        "p50_us": np.array([by_rank[int(np.ceil(0.5 * n))]], np.int64),
        "p90_us": np.array([by_rank[int(np.ceil(0.9 * n))]], np.int64)})


@register("user_top3_types", sql="""
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c)
SELECT user_id, STRING_AGG(event_type, ',' ORDER BY rn) AS top_types
FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""")
def user_top3_types(sf_dir: str) -> pd.DataFrame:
    """Ordered STRING_AGG of each user's top-3 event types (count
    desc, name asc) — the per-entity ranked-list aggregate profile
    tables are made of. One (user, type) reduce bounds the data at
    |users|×|types|; the rank-filter-concat runs inside user-hash
    buckets so a user's rows never split, and only one string row
    per user leaves."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"]),
        ["user_id", "event_type"], {"n": ("event_type", "size")})

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          ignore_index=True)
        top = g.groupby("user_id", sort=False).head(3)
        out = top.groupby("user_id", sort=False)["event_type"] \
            .agg(",".join).reset_index(name="top_types")
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    out = (per.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_")
           .map_groups(lambda g: concat(g.drop(columns=["bucket_"])),
                       batch_format="pandas")).to_pandas()
    return out.sort_values("user_id", ignore_index=True)


@register("ks_test_view_purchase", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
           FROM events WHERE event_type IN ('view', 'purchase')),
h AS (SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(g2) AS BIGINT) AS c2
      FROM c GROUP BY 1),
cum AS (SELECT SUM(c1) OVER (ORDER BY cents) AS f1,
               SUM(c2) OVER (ORDER BY cents) AS f2
        FROM h),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM h),
m AS (SELECT CAST(MAX(ABS(f1 * (SELECT n2 FROM t)
                          - f2 * (SELECT n1 FROM t))) AS BIGINT) AS d_num
      FROM cum)
SELECT n1, n2, d_num,
       ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d
FROM t, m""")
def ks_test_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the 'view' and
    'purchase' value distributions — the distribution-shift test you
    run before trusting a segment comparison. Cents quantization makes
    the value column bounded-cardinality, so ONE (cents, c1, c2)
    histogram reduce is a lossless summary of BOTH empirical CDFs; the
    sup-distance maximizes the INTEGER cross-product |F1·n2 − F2·n1|
    over the tiny histogram (no float CDF can disagree between
    engines) and divides exactly once at the end."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        is_v = (df["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "g1": is_v.astype(np.int64),
            "g2": (~is_v).astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("g1", "sum"), "c2": ("g2", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64)
    c2 = h["c2"].to_numpy(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    # Python-int cross products: exact at any scale, no int64 overflow.
    f1, f2 = c1.cumsum(), c2.cumsum()
    d_num = max(abs(int(a) * n2 - int(b) * n1) for a, b in zip(f1, f2))
    return pd.DataFrame({
        "n1": np.array([n1], np.int64),
        "n2": np.array([n2], np.int64),
        "d_num": np.array([d_num], np.int64),
        "ks_d": [float(textstats.round_half_away(
            d_num / (float(n1) * n2), 6))]})


@register("gini_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM events GROUP BY 1),
r AS (SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, user_id) AS rn
      FROM u),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(SUM(rn * cents) AS BIGINT) AS s1
      FROM r)
SELECT n, total_cents,
       ROUND(CAST(2 * s1 - (n + 1) * total_cents AS DOUBLE)
             / (CAST(n AS DOUBLE) * total_cents), 6) AS gini
FROM s""")
def gini_user_value(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-user total value — the concentration
    metric curation uses to detect a corpus dominated by a few heavy
    sources. One per-user cents reduce bounds the data at |users|;
    scan.global_rank assigns the exact sorted position WITHOUT a
    global sort (ties share equal cents, so the rank-weighted sum is
    permutation-invariant among them and the (cents, user_id) tiebreak
    is cosmetic); per-block integer partials (n, Σcents, Σ rnk·cents)
    close the standard formula G = (2·S1 − (n+1)·T) / (n·T) with ONE
    division on the driver."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}), batch_format="pandas"),
        ["user_id"], {"cents": ("cents", "sum")}) \
        .map_batches(lambda df: df.assign(
            cents_f=df["cents"].astype(np.float64)),
            batch_format="pandas")
    ranked = scan.global_rank(per, "cents_f", "user_id", out_col="rn",
                              num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # Overflow-guarded Σ rnk·cents: rank offsets to the batch min
        # (bucket-local rank spans, never the global n), chunked sums
        # folded into a Python int, and the unbounded rmin·Σc term
        # carried as exact Python arithmetic; transport splits the
        # result into two int64 words so no column ever wraps.
        if len(df) == 0:
            return pd.DataFrame({"n": pd.Series([], np.int64),
                                 "total": pd.Series([], np.int64),
                                 "s1_hi": pd.Series([], np.int64),
                                 "s1_lo": pd.Series([], np.int64)})
        c = df["cents"].to_numpy(np.int64)
        r = df["rn"].to_numpy(np.int64)
        rmin = int(r.min())
        rel = (r - rmin) * c
        s1 = 0
        for i in range(0, len(rel), 16384):
            s1 += int(rel[i:i + 16384].sum())
        total = int(c.sum())
        s1 += rmin * total
        hi, lo = divmod(s1, 1 << 62)
        return pd.DataFrame({"n": [len(df)], "total": [total],
                             "s1_hi": [hi], "s1_lo": [lo]})

    p = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    n, total = int(p["n"].sum()), int(p["total"].sum())
    s1 = sum(int(h) * (1 << 62) + int(l)
             for h, l in zip(p["s1_hi"], p["s1_lo"]))
    gini = (2 * s1 - (n + 1) * total) / (float(n) * total)
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "total_cents": np.array([total], np.int64),
        "gini": [float(textstats.round_half_away(gini, 6))]})


@register("welch_t_view_purchase", sql="""
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type IN ('view', 'purchase')),
m AS (SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN event_type = 'view' THEN cents ELSE 0
                      END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents
                      ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN event_type = 'view' THEN cents * cents
                      ELSE 0 END) AS BIGINT) AS q1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                      cents * cents ELSE 0 END) AS BIGINT) AS q2
      FROM c)
SELECT n1, n2,
       ROUND(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2, 6)
           AS mean_diff_cents,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT((CAST(q1 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) / n1 * s1) / (n1 - 1) / n1
                    + (CAST(q2 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) / n2 * s2) / (n2 - 1) / n2),
             6) AS t_stat
FROM m""")
def welch_t_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Welch's unequal-variance two-sample t statistic between 'view'
    and 'purchase' values — the continuous-metric sibling of the A/B
    proportion z-test. Everything that shuffles is six INTEGER moments
    (n, Σcents, Σcents² per arm) combined associatively; the float
    closed form runs once on the driver in the oracle's exact
    expression order so no accumulation-order drift exists to round
    away."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        v = (df["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "n1": [int(v.sum())], "n2": [int((~v).sum())],
            "s1": [int(c[v].sum())], "s2": [int(c[~v].sum())],
            "q1": [int((c[v] * c[v]).sum())],
            "q2": [int((c[~v] * c[~v]).sum())]})

    p = _events(sf_dir, ["event_type", "value"]) \
        .map_batches(partial, batch_format="pandas").to_pandas()
    n1, n2 = int(p["n1"].sum()), int(p["n2"].sum())
    s1, s2 = int(p["s1"].sum()), int(p["s2"].sum())
    q1, q2 = int(p["q1"].sum()), int(p["q2"].sum())
    md = s1 / n1 - s2 / n2
    t = md / np.sqrt((q1 - s1 / n1 * s1) / (n1 - 1) / n1
                     + (q2 - s2 / n2 * s2) / (n2 - 1) / n2)
    return pd.DataFrame({
        "n1": np.array([n1], np.int64),
        "n2": np.array([n2], np.int64),
        "mean_diff_cents": [float(textstats.round_half_away(md, 6))],
        "t_stat": [float(textstats.round_half_away(float(t), 6))]})


@register("pareto_share_users", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM events GROUP BY 1),
r AS (SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, user_id DESC)
                 AS rd
      FROM u),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents FROM r)
SELECT n, total_cents,
       CAST((SELECT SUM(cents) FROM r
             WHERE rd <= CAST(CEIL(0.01 * n) AS BIGINT)) AS BIGINT)
           AS top1_cents,
       CAST((SELECT SUM(cents) FROM r
             WHERE rd <= CAST(CEIL(0.10 * n) AS BIGINT)) AS BIGINT)
           AS top10_cents,
       ROUND(CAST((SELECT SUM(cents) FROM r
                   WHERE rd <= CAST(CEIL(0.01 * n) AS BIGINT))
                  AS DOUBLE) / total_cents, 6) AS top1_share,
       ROUND(CAST((SELECT SUM(cents) FROM r
                   WHERE rd <= CAST(CEIL(0.10 * n) AS BIGINT))
                  AS DOUBLE) / total_cents, 6) AS top10_share
FROM s""")
def pareto_share_users(sf_dir: str) -> pd.DataFrame:
    """Share of total value held by the top 1% and top 10% of users —
    the concentration cut curation teams quote next to [[Gini]]. One
    per-user reduce bounds the data at |users|; scan.global_rank gives
    each user's exact ASCENDING position (the oracle's descending
    ROW_NUMBER is its mirror rd = n − rn + 1, tiebreaks reversed in
    lockstep), and ONE partial pass sums cents above the two rank
    thresholds — only six integers reach the driver after the rank."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}), batch_format="pandas"),
        ["user_id"], {"cents": ("cents", "sum")}) \
        .map_batches(lambda df: df.assign(
            cents_f=df["cents"].astype(np.float64)),
            batch_format="pandas").materialize()
    n = per.count()
    k1 = int(np.ceil(0.01 * n))
    k10 = int(np.ceil(0.10 * n))
    ranked = scan.global_rank(per, "cents_f", "user_id", out_col="rn",
                              num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy(np.int64)
        rd_ = n - df["rn"].to_numpy(np.int64) + 1
        return pd.DataFrame({
            "total": [int(c.sum())],
            "t1": [int(c[rd_ <= k1].sum())],
            "t10": [int(c[rd_ <= k10].sum())]})

    p = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    total, t1, t10 = (int(p["total"].sum()), int(p["t1"].sum()),
                      int(p["t10"].sum()))
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "total_cents": np.array([total], np.int64),
        "top1_cents": np.array([t1], np.int64),
        "top10_cents": np.array([t10], np.int64),
        "top1_share": [float(textstats.round_half_away(t1 / total, 6))],
        "top10_share": [float(textstats.round_half_away(
            t10 / total, 6))]})


@register("usage_graphs_meta", sql=None)  # pixel rendering — not SQL
def usage_graphs_meta(sf_dir: str) -> pd.DataFrame:
    """S10 end to end: renders the four usage PNGs (graphs.c analogs —
    daily/hourly/yearly bars + category pie) from event aggregates and
    returns one deterministic fingerprint row per graph (dimensions,
    CRC32 of the encoded bytes, ink pixel count). The aggregates are
    the cluster work (pruned reads, partial-combine reduces); rendering
    is a driver-side O(KB) finishing step over ≤31/24/12-row tables."""
    import zlib

    from webalizer_ray.pipelines import graphs as G

    def agg(key_fn, key_name):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({key_name: key_fn(df)})
            out["value"] = df["value"].to_numpy(np.float64)
            return out
        return reduce_sink(
            _events(sf_dir, ["ts", "value"])
            .map_batches(part, batch_format="pandas"),
            [key_name], {"hits": ("value", "size"),
                         "kb": ("value", "sum")}).to_pandas() \
            .sort_values(key_name, ignore_index=True)

    daily = agg(lambda df: df["ts"].dt.strftime("%Y-%m-%d"), "date")
    hourly = agg(lambda df: df["ts"].dt.hour.astype(np.int64), "hour")
    monthly = agg(lambda df: df["ts"].dt.strftime("%Y-%m"), "month")
    cats = reduce_sink(_events(sf_dir, ["event_type"]),
                       ["event_type"],
                       {"hits": ("event_type", "size")}).to_pandas()
    imgs = {
        "daily_usage.png": G.daily_usage_graph(daily),
        "hourly_usage.png": G.hourly_usage_graph(hourly),
        "usage.png": G.yearly_index_graph(monthly),
        "ctry_usage.png": G.category_pie(cats, key_col="event_type"),
    }
    rows = []
    bg = np.array(G.BG, np.uint8)
    for name in sorted(imgs):
        im = imgs[name]
        rows.append((name, im.shape[1], im.shape[0],
                     zlib.crc32(G.encode_png(im)) & 0xFFFFFFFF,
                     int((im != bg).any(axis=2).sum())))
    return pd.DataFrame(rows, columns=["graph", "width", "height",
                                       "crc32", "ink_px"]) \
        .astype({"width": np.int64, "height": np.int64,
                 "crc32": np.int64, "ink_px": np.int64})


@register("daily_user_overlap", sql="""
WITH du AS (SELECT DISTINCT
                CAST(date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS BIGINT) AS t,
                user_id
            FROM events),
n AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nd FROM du GROUP BY 1),
i AS (SELECT a.t AS t, CAST(COUNT(*) AS BIGINT) AS inter
      FROM du a JOIN du b
        ON b.user_id = a.user_id AND b.t = a.t + 1
      GROUP BY 1)
SELECT n1.t AS t, n1.nd AS n_day, n2.nd AS n_next,
       COALESCE(i.inter, 0) AS inter,
       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / (n1.nd + n2.nd - COALESCE(i.inter, 0)), 6) AS jaccard
FROM n n1 JOIN n n2 ON n2.t = n1.t + 1
LEFT JOIN i ON i.t = n1.t
ORDER BY t""")
def daily_user_overlap(sf_dir: str) -> pd.DataFrame:
    """Day-over-day user-set Jaccard — the retention-overlap series
    behind churn dashboards, and a set-similarity JOIN the engine runs
    without ever joining the fact table: ONE distinct (user, day)
    reduce bounds the data at users×days; consecutive-day intersections
    count INSIDE user-hash buckets (each user's sorted day list answers
    every adjacent pair via one vectorized isin — a user's days never
    split); only (day, inter) and (day, nd) key-level partials shuffle
    and the O(days) merge closes on the driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "t": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64)})

    du = reduce_sink(
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "t"], {"c": ("t", "size")})

    def inter_partial(g: pd.DataFrame) -> pd.DataFrame:
        # one sort, one shifted compare: a (user, day) row scores an
        # intersection for day d iff the SAME user's next sorted day is
        # d+1 — no per-user loop
        g = g.sort_values(["user_id", "t"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        hit = (u[1:] == u[:-1]) & (t[1:] == t[:-1] + 1)
        ts_hit = t[:-1][hit]
        if not len(ts_hit):
            return pd.DataFrame({"t": pd.Series([], np.int64),
                                 "inter": pd.Series([], np.int64)})
        vals, cnt = np.unique(ts_hit, return_counts=True)
        return pd.DataFrame({"t": vals.astype(np.int64),
                             "inter": cnt.astype(np.int64)})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    inter = reduce_sink(
        du.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: inter_partial(g), batch_format="pandas"),
        ["t"], {"inter": ("inter", "sum")}).to_pandas()
    nd = reduce_sink(du, ["t"], {"nd": ("t", "size")}).to_pandas() \
        .sort_values("t", ignore_index=True)
    nxt = nd.rename(columns={"t": "t_", "nd": "n_next"})
    nxt["t"] = nxt["t_"] - 1
    out = nd.merge(nxt[["t", "n_next"]], on="t", how="inner") \
        .merge(inter, on="t", how="left")
    out["inter"] = out["inter"].fillna(0).astype(np.int64)
    denom = out["nd"] + out["n_next"] - out["inter"]
    out["jaccard"] = textstats.round_half_away(
        out["inter"].to_numpy(np.float64) / denom.to_numpy(np.float64),
        6)
    return out.rename(columns={"nd": "n_day"}) \
        .astype({"t": np.int64, "n_day": np.int64,
                 "n_next": np.int64}) \
        [["t", "n_day", "n_next", "inter", "jaccard"]] \
        .sort_values("t", ignore_index=True)


@register("top_events_per_user_capped", sql="""
WITH c AS (SELECT event_id, user_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ROUND(value * 100) DESC,
                                              event_id) AS rn
           FROM events)
SELECT event_id, user_id, cents
FROM c WHERE rn <= 2
ORDER BY cents DESC, event_id LIMIT 10""")
def top_events_per_user_capped(sf_dir: str) -> pd.DataFrame:
    """Diversity-constrained global top-N: the 10 highest-value events
    with AT MOST 2 per user (the anti-flood rule every feed/leaderboard
    needs so one hot key can't fill the list). Per-user cap runs inside
    user-hash buckets (vectorized sort + groupby head, users never
    split); survivors are ≤ 2·|users| rows, and per-batch local top-10
    partials bound what the driver merges to B×10 — the same exact
    bucket-local⊇global argument as the flagship top-N."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "bucket_": (df["user_id"].to_numpy(np.int64) % 32)
            .astype(np.int32)})

    def cap_and_local_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "cents", "event_id"],
                          ascending=[True, False, True],
                          ignore_index=True)
        kept = g.groupby("user_id", sort=False).head(2)
        return kept.sort_values(["cents", "event_id"],
                                ascending=[False, True]).head(10) \
            [["event_id", "user_id", "cents"]]

    out = (_events(sf_dir, ["event_id", "user_id", "value"])
           .map_batches(prep, batch_format="pandas")
           .groupby("bucket_")
           .map_groups(lambda g: cap_and_local_top(g),
                       batch_format="pandas")).to_pandas()
    return out.sort_values(["cents", "event_id"],
                           ascending=[False, True],
                           ignore_index=True).head(10)


@register("dow_seasonality_index", sql="""
WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS t,
                  CAST(COUNT(*) AS BIGINT) AS hits
           FROM events GROUP BY 1),
w AS (SELECT (t + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS days,
             CAST(SUM(hits) AS BIGINT) AS hits
      FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(days) AS BIGINT) AS all_days,
               CAST(SUM(hits) AS BIGINT) AS all_hits FROM w)
SELECT dow, days, hits,
       ROUND((CAST(hits AS DOUBLE) / days)
             / (CAST(all_hits AS DOUBLE) / all_days), 6) AS idx
FROM w, tot ORDER BY dow""")
def dow_seasonality_index(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality index: each weekday's average daily
    traffic relative to the overall daily average (1.0 = flat). The dow
    derives as plain epoch-day arithmetic ((t+4) % 7, 0 = Sunday) on
    BOTH engines so neither's calendar convention can disagree; one
    daily reduce bounds the cluster output at O(days), the 7-row fold
    and two-division index run on the driver in oracle order."""
    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(
            lambda df: pd.DataFrame(
                {"t": df["ts"].to_numpy().astype("datetime64[D]")
                 .astype(np.int64)}), batch_format="pandas"),
        ["t"], {"hits": ("t", "size")}).to_pandas()
    d["dow"] = (d["t"] + 4) % 7
    w = d.groupby("dow", as_index=False).agg(days=("t", "size"),
                                             hits=("hits", "sum"))
    all_days, all_hits = int(w["days"].sum()), int(w["hits"].sum())
    w["idx"] = textstats.round_half_away(
        (w["hits"].to_numpy(np.float64) / w["days"].to_numpy(np.float64))
        / (all_hits / float(all_days)), 6)
    return w.astype({"dow": np.int64, "days": np.int64,
                     "hits": np.int64}).sort_values("dow",
                                                    ignore_index=True)


@register("user_type_entropy_mean", sql="""
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
u AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS tot
      FROM c GROUP BY 1),
e AS (SELECT c.user_id,
             SUM(-(CAST(n AS DOUBLE) / tot)
                 * LOG2(CAST(n AS DOUBLE) / tot)) AS h
      FROM c JOIN u USING (user_id) GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS users,
       ROUND(SUM(h) / COUNT(*), 6) AS mean_entropy
FROM e""")
def user_type_entropy_mean(sf_dir: str) -> pd.DataFrame:
    """Mean Shannon entropy (bits) of each user's event-type mix — the
    behavioral-diversity profile (0 = single-type bots, log2|types| =
    uniform). One (user, type) reduce bounds the data; per-user
    entropies vectorize inside user-hash buckets (|types| ≤ handful per
    user) and only (Σh, n_users) scalar partials reach the driver.
    Sub-1e-12 accumulation-order drift dies in the 6-dp round."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"]),
        ["user_id", "event_type"], {"n": ("event_type", "size")})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.float64)
        tot = g.groupby("user_id")["n"].transform("sum") \
            .to_numpy(np.float64)
        p = n / tot
        h = pd.DataFrame({"user_id": g["user_id"],
                          "term": -p * np.log2(p)}) \
            .groupby("user_id")["term"].sum()
        return pd.DataFrame({"users": [len(h)],
                             "h_sum": [float(h.sum())]})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    p = (per.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: partial(g.drop(columns=["bucket_"])),
                     batch_format="pandas")).to_pandas()
    users = int(p["users"].sum())
    return pd.DataFrame({
        "users": np.array([users], np.int64),
        "mean_entropy": [float(textstats.round_half_away(
            float(p["h_sum"].sum()) / users, 6))]})


@register("hopping_window_stats", sql="""
WITH e AS (SELECT epoch_us(ts) // 900000000 AS slot,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
x AS (SELECT e.slot - k.k AS wslot, e.cents
      FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) k)
SELECT CAST(wslot AS BIGINT) AS window_slot,
       CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(cents) AS BIGINT) AS cents_sum
FROM x GROUP BY wslot""")
def hopping_window_stats(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) window aggregate — 1 h windows advancing every
    15 min, the standard streaming-telemetry rate view that a tumbling
    bucket cannot express (each event belongs to exactly window/hop = 4
    overlapping windows). Scale shape: the 4x expansion happens INSIDE
    map_batches as a numpy tile (never a row loop) and is immediately
    collapsed to per-(window) partials within the batch, so at most
    4 x |distinct windows per batch| rows shuffle — not 4x the corpus.
    Values quantize to exact integer cents so the float order can't
    drift between engines."""
    hop_us, n_hops = 900_000_000, 4

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        slot = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // hop_us
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        wslot = (slot[None, :] - np.arange(n_hops, dtype=np.int64)[:, None]
                 ).ravel()
        c = np.tile(cents, n_hops)
        g = pd.DataFrame({"window_slot": wslot, "cents": c}) \
            .groupby("window_slot", sort=False)
        out = g.agg(hits=("cents", "size"), cents_sum=("cents", "sum"))
        return out.reset_index()

    agg = reduce_sink(
        _events(sf_dir, ["ts", "value"]).map_batches(
            partial, batch_format="pandas"),
        ["window_slot"],
        {"hits": ("hits", "sum"), "cents_sum": ("cents_sum", "sum")})
    out = agg.to_pandas()
    out["window_slot"] = out["window_slot"].astype(np.int64)
    out["hits"] = out["hits"].astype(np.int64)
    out["cents_sum"] = out["cents_sum"].astype(np.int64)
    return out


@register("ols_value_hour_dow", sql="""
WITH b AS (SELECT CAST(hour(ts) AS BIGINT) AS x1,
                  (epoch_us(ts) // 86400000000 + 4) % 7 AS x2,
                  CAST(ROUND(value * 100) AS BIGINT) AS y
           FROM events),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS s2y FROM b),
d AS (SELECT
  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)
      AS det,
  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)
      AS d0,
  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)
      AS d1,
  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)
      AS d2
  FROM m)
SELECT ROUND(d0 / det / 100, 6) AS intercept,
       ROUND(d1 / det / 100, 6) AS beta_hour,
       ROUND(d2 / det / 100, 6) AS beta_dow
FROM d""")
def ols_value_hour_dow(sf_dir: str) -> pd.DataFrame:
    """Multi-feature linear regression (value ~ hour + day-of-week)
    solved exactly from distributed moments: each block emits ONE
    9-integer partial (the Gram matrix X'X and X'y entries — hour, dow
    and cents are all integers, so every moment combines exactly in
    any order), and the 3x3 normal equations solve via Cramer's rule
    written out as the IDENTICAL expression on both engines — bit-exact
    with zero float accumulation anywhere in the distributed part.
    The general-p pattern (p^2 floats per block, driver solve) is what
    stages/recommend.py's ALS uses; p=3 stays oracle-expressible."""
    day_us = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        x1 = (us // 3_600_000_000) % 24
        x2 = (us // day_us + 4) % 7
        y = np.rint(t["value"].to_numpy(zero_copy_only=False)
                    .astype(np.float64) * 100).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(y))], "s1": [x1.sum()], "s2": [x2.sum()],
            "s11": [(x1 * x1).sum()], "s22": [(x2 * x2).sum()],
            "s12": [(x1 * x2).sum()], "sy": [y.sum()],
            "s1y": [(x1 * y).sum()], "s2y": [(x2 * y).sum()]})

    p = _events(sf_dir, ["ts", "value"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    n = float(p["n"].sum())
    s1, s2 = float(p["s1"].sum()), float(p["s2"].sum())
    s11, s22 = float(p["s11"].sum()), float(p["s22"].sum())
    s12, sy = float(p["s12"].sum()), float(p["sy"].sum())
    s1y, s2y = float(p["s1y"].sum()), float(p["s2y"].sum())
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    d0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y))
    d1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2))
    d2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2))
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "intercept": [float(r6(d0 / det / 100, 6))],
        "beta_hour": [float(r6(d1 / det / 100, 6))],
        "beta_dow": [float(r6(d2 / det / 100, 6))]})


@register("dsir_importance_top_docs", sql=r"""
WITH w AS (SELECT doc_id, lang,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS ct
      FROM w GROUP BY word),
t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v,
             CAST(SUM(cr) AS DOUBLE) AS tr,
             CAST(SUM(ct) AS DOUBLE) AS tt FROM c),
r AS (SELECT word, LN((ct + 1) / (tt + v)) - LN((cr + 1) / (tr + v)) AS lr
      FROM c, t),
s AS (SELECT w.doc_id, ROUND(SUM(r.lr), 6) AS dsir_score
      FROM w JOIN r USING (word) GROUP BY w.doc_id)
SELECT doc_id, dsir_score FROM s
ORDER BY dsir_score DESC, doc_id LIMIT 20""")
def dsir_importance_top_docs(sf_dir: str) -> pd.DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    each raw document by the log importance ratio of a target-domain
    unigram LM (here: the lang='en' slice) against the raw-corpus LM,
    both Laplace-smoothed over the shared vocabulary, and keep the
    top-20. (The paper hashes n-grams into a fixed-width bucket space;
    word-level features keep the op oracle-expressible — swapping in a
    hash of the word changes one line.) Scale shape: ONE (word, raw,
    target) count reduce builds both LMs (target counts ride the same
    partial — no second scan), the vocabulary-sized log-ratio table
    broadcasts once via ray.put, scoring is a batch-local hash-map
    lookup, and only per-batch top-20 partials reach the driver."""
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def wc(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna()
        is_t = np.repeat(
            (df["lang"] == "en").to_numpy(), lens).astype(np.int64)
        g = (pd.DataFrame({"word": flat.to_numpy(), "ct": is_t})
             .groupby("word", sort=False)["ct"].agg(["size", "sum"]))
        return pd.DataFrame({"word": g.index.to_numpy(),
                             "cr": g["size"].to_numpy(np.int64),
                             "ct": g["sum"].to_numpy(np.int64)})

    vocab = reduce_sink(docs.map_batches(wc, batch_format="pandas"),
                        ["word"],
                        {"cr": ("cr", "sum"), "ct": ("ct", "sum")}) \
        .to_pandas()
    v = float(len(vocab))
    tr = float(vocab["cr"].sum())
    tt = float(vocab["ct"].sum())
    # identical float path to the oracle: ln(smoothed) - ln(smoothed)
    lr = (np.log((vocab["ct"].to_numpy(np.float64) + 1) / (tt + v))
          - np.log((vocab["cr"].to_numpy(np.float64) + 1) / (tr + v)))
    lr_ref = ray.put(pd.Series(lr, index=vocab["word"].to_numpy()))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lr_ref)
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        s = (pd.DataFrame({"doc_id": doc,
                           "lr": flat.map(table).to_numpy(np.float64)})
             .groupby("doc_id", sort=False)["lr"].sum())
        part = pd.DataFrame({
            "doc_id": s.index.to_numpy(np.int64),
            "dsir_score": textstats.round_half_away(
                s.to_numpy(np.float64), 6)})
        return top_n_pandas(part, "doc_id", "dsir_score", 20)

    cand = docs.map_batches(score, batch_format="pandas").to_pandas()
    # rounding happens BEFORE selection on both engines so a hairline
    # tie can't flip which doc makes the cut
    out = cand.sort_values(["dsir_score", "doc_id"],
                           ascending=[False, True],
                           kind="mergesort").head(20)
    return out.reset_index(drop=True)


@register("user_trailing_1h_value", sql="""
WITH b AS (SELECT event_id, user_id, ts,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT event_id,
       CAST(SUM(cents) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS BIGINT) AS trailing_cents
FROM b""")
def user_trailing_1h_value(sf_dir: str) -> pd.DataFrame:
    """RANGE-frame window aggregate (per-user trailing 1-hour value
    sum) — the interval frame the existing ROWS-frame moving average
    cannot express: the window holds however many events fall in the
    last hour, including same-timestamp peers. Scale shape: users hash
    into buckets (a user never spans buckets), each bucket sorts once
    and answers every row with two vectorized searchsorteds against
    the bucket's prefix-sum — no per-row loop, no global sort, and
    only (event_id, sum) rows leave the task. Exact integer cents."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    hour_us = 3_600_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def window(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((us, uid))
        us, cents, uid, eid = us[order], cents[order], uid[order], \
            eid[order]
        prefix = np.concatenate(([0], np.cumsum(cents)))
        # the lexsorted array is time-sorted only WITHIN each user run:
        # shift every run onto a shared strictly-increasing axis with
        # gaps wider than the frame, so one global searchsorted answers
        # every row and a query can never fall into a neighboring user
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        run_min, run_max = us[starts], us[ends - 1]
        span = run_max - run_min
        base = np.concatenate(
            ([0], np.cumsum(span[:-1] + 2 * hour_us + 2)))
        adj = us - run_min[run_of] + base[run_of]
        left = np.searchsorted(adj, adj - hour_us, side="left")
        right = np.searchsorted(adj, adj, side="right")
        return pd.DataFrame({
            "event_id": eid,
            "trailing_cents": prefix[right] - prefix[left]})

    out = (ds.map_batches(with_bucket, batch_format="pandas")
           .groupby("bucket_")
           .map_groups(lambda g: window(g.drop(columns=["bucket_"])),
                       batch_format="pandas")).to_pandas()
    out["trailing_cents"] = out["trailing_cents"].astype(np.int64)
    return out.sort_values("event_id", ignore_index=True)


@register("naive_bayes_lang_confusion", sql=r"""
WITH w AS (SELECT doc_id, lang,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2),
totl AS (SELECT lang, CAST(SUM(c) AS DOUBLE) AS tot FROM c GROUP BY lang),
v AS (SELECT CAST(COUNT(DISTINCT word) AS DOUBLE) AS v FROM c),
pri AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS nd
        FROM documents GROUP BY lang),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
dw AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM w GROUP BY 1, 2),
sc AS (SELECT dw.doc_id, totl.lang,
              SUM(dw.cnt * LN((COALESCE(c.c, 0) + 1) / (totl.tot + v.v)))
              + ANY_VALUE(LN(pri.nd / nd.n)) AS score
       FROM dw
       CROSS JOIN totl
       LEFT JOIN c ON c.lang = totl.lang AND c.word = dw.word
       JOIN pri ON pri.lang = totl.lang, v, nd
       GROUP BY dw.doc_id, totl.lang),
pred AS (SELECT doc_id, lang AS pred_lang
         FROM sc
         QUALIFY ROW_NUMBER() OVER (
             PARTITION BY doc_id
             ORDER BY ROUND(score, 9) DESC, lang) = 1)
SELECT d.lang AS true_lang, p.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2""")
def naive_bayes_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes (Laplace-smoothed) trained and evaluated
    in-corpus, reported as a confusion matrix — the classical generative
    text classifier as a distributed pipeline. Scale shape: ONE
    (lang, word) count reduce trains every class at once (the table is
    vocab x |langs|, never corpus-sized); the log-likelihood matrix and
    log-priors broadcast once via ray.put; scoring is a batch-local
    hash-map lookup per class with argmax on 9-dp-rounded scores and
    smaller-label tiebreak (so engines can't disagree on hairline
    ties); only (true, pred, n) partials shuffle. Oracle: the identical
    smoothed closed form in relational algebra."""
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def wc(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna()
        lang = np.repeat(df["lang"].to_numpy(), lens)
        g = (pd.DataFrame({"lang": lang, "word": flat.to_numpy()})
             .groupby(["lang", "word"], sort=False).size())
        out = g.reset_index()
        out.columns = ["lang", "word", "c"]
        # per-batch doc-count partials ride along as sentinel rows
        # (word = NUL can never appear in \S+ tokens)
        nd = df.groupby("lang").size().reset_index()
        nd.columns = ["lang", "c"]
        nd["word"] = "\x00"
        return pd.concat([out, nd[["lang", "word", "c"]]],
                         ignore_index=True)

    agg = reduce_sink(docs.map_batches(wc, batch_format="pandas"),
                      ["lang", "word"], {"c": ("c", "sum")}).to_pandas()
    is_sent = agg["word"] == "\x00"
    nd = agg[is_sent].set_index("lang")["c"].astype(float)
    cnt = agg[~is_sent]
    langs = sorted(nd.index)
    v = float(cnt["word"].nunique())
    tot = cnt.groupby("lang")["c"].sum().astype(float)
    n_docs = float(nd.sum())
    # one log-likelihood Series per class + its unseen-word default;
    # identical float path to the oracle: LN((c+1)/(tot+v))
    tables = {}
    for l in langs:
        sub = cnt[cnt["lang"] == l]
        tl = float(tot.get(l, 0.0))
        tables[l] = (
            pd.Series(np.log((sub["c"].to_numpy(np.float64) + 1)
                             / (tl + v)),
                      index=sub["word"].to_numpy()),
            float(np.log(1.0 / (tl + v))),
            float(np.log(float(nd[l]) / n_docs)))
    tab_ref = ray.put(tables)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tabs = ray.get(tab_ref)
        words = df["text"].fillna("").str.split()
        # zero-token docs have no likelihood terms and drop out of the
        # oracle's word join — mirror that
        keep = words.str.len() > 0
        df, words = df[keep.to_numpy()], words[keep]
        lens = words.str.len().to_numpy()
        flat = words.explode().dropna()
        doc = np.repeat(np.arange(len(df)), lens)
        scores = np.empty((len(df), len(langs)), np.float64)
        for j, l in enumerate(langs):
            tab, dflt, lp = tabs[l]
            per_tok = flat.map(tab).to_numpy(np.float64)
            per_tok = np.where(np.isnan(per_tok), dflt, per_tok)
            s = np.zeros(len(df), np.float64)
            np.add.at(s, doc, per_tok)
            scores[:, j] = s + lp
        r9 = textstats.round_half_away(scores, 9)
        pred_j = np.argmax(r9, axis=1)  # argmax takes FIRST max:
        # langs sorted ascending = the oracle's smaller-label tiebreak
        g = (pd.DataFrame({
            "true_lang": df["lang"].to_numpy(),
            "pred_lang": np.asarray(langs, object)[pred_j]})
            .groupby(["true_lang", "pred_lang"], sort=False).size())
        out = g.reset_index()
        out.columns = ["true_lang", "pred_lang", "n"]
        return out

    out = reduce_sink(docs.map_batches(score, batch_format="pandas"),
                      ["true_lang", "pred_lang"],
                      {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out


@register("logreg_purchase_coefs")
def logreg_purchase_coefs(sf_dir: str) -> pd.DataFrame:
    """Distributed logistic regression by IRLS / Newton's method
    (rows-only: iterative float fitting has no SQL form): predict
    P(event_type = 'purchase') from (hour, value). Every iteration is
    ONE streaming pass where each block emits a 3-float gradient and a
    3x3 Hessian partial (15 floats per block total — the GLM sibling
    of the OLS Gram pattern); the driver solves the 3x3 Newton step.
    p features cost O(p^2) floats per block at any corpus size.
    Deterministic given the fixed iteration count; coefficients are
    reported at 4 dp with a planted-separation recovery test in
    tests/test_regression_ops.py."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def features(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = ((us // 3_600_000_000) % 24).astype(np.float64)
        val = t["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = (pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        # fixed affine scaling keeps the Hessian well-conditioned
        # without a data-dependent (order-sensitive) standardization
        return pd.DataFrame({"x1": hour / 24.0, "x2": val / 100.0,
                             "y": y})

    feats = ds.map_batches(features, batch_format="pyarrow") \
        .materialize()
    w = np.zeros(3, np.float64)

    for _ in range(8):
        w_ref = ray.put(w.copy())

        def newton_partial(df: pd.DataFrame) -> pd.DataFrame:
            wv = ray.get(w_ref)
            X = np.column_stack([np.ones(len(df)),
                                 df["x1"].to_numpy(np.float64),
                                 df["x2"].to_numpy(np.float64)])
            y = df["y"].to_numpy(np.float64)
            p = 1.0 / (1.0 + np.exp(-(X @ wv)))
            grad = X.T @ (y - p)
            r = p * (1.0 - p)
            H = X.T @ (X * r[:, None])
            out = {f"g{i}": [grad[i]] for i in range(3)}
            out.update({f"h{i}{j}": [H[i, j]]
                        for i in range(3) for j in range(i, 3)})
            return pd.DataFrame(out)

        p = feats.map_batches(newton_partial,
                              batch_format="pandas").to_pandas()
        grad = np.array([p[f"g{i}"].sum() for i in range(3)])
        H = np.zeros((3, 3))
        for i in range(3):
            for j in range(i, 3):
                H[i, j] = H[j, i] = p[f"h{i}{j}"].sum()
        # ridge jitter keeps the solve stable if a class is rare
        w = w + np.linalg.solve(H + 1e-9 * np.eye(3), grad)

    return pd.DataFrame({
        "term": ["intercept", "hour_frac", "value_scaled"],
        "coef": np.round(w, 4)})


@register("doc_top_keywords", sql=r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
tf AS (SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM w GROUP BY 1, 2),
df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM w GROUP BY word),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.word,
             ROUND(tf.tf * LN(nd.n / df.df), 6) AS score
      FROM tf JOIN df USING (word), nd)
SELECT doc_id, word, score, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY score DESC, word) AS rnk
      FROM s)
WHERE rnk <= 3""")
def doc_top_keywords(sf_dir: str) -> pd.DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF — the
    per-doc flavor of the corpus-level tfidf_top_terms, and the
    standard tagging/snippet primitive. Scale shape: pass 1 reduces
    (word, doc-frequency) partials — docs never span parquet batches,
    so per-batch distinct-doc counts combine exactly — and the
    vocabulary-sized IDF table broadcasts once via ray.put; pass 2
    computes each batch's TF and top-3 entirely locally (one sort +
    groupby-head per batch, no per-doc loop); scores round BEFORE the
    rank on both engines so hairline ties can't flip membership."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = float(docs.count())

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        u = pd.DataFrame({"doc": doc, "word": flat.to_numpy()}) \
            .drop_duplicates()
        g = u.groupby("word", sort=False).size()
        return pd.DataFrame({"word": g.index.to_numpy(),
                             "df": g.to_numpy(np.int64)})

    dfs = reduce_sink(docs.map_batches(df_partial, batch_format="pandas"),
                      ["word"], {"df": ("df", "sum")}).to_pandas()
    idf = ray.put(pd.Series(
        np.log(n_docs / dfs["df"].to_numpy(np.float64)),
        index=dfs["word"].to_numpy()))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(idf)
        words = df["text"].fillna("").str.split()
        lens = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna()
        doc = np.repeat(df["doc_id"].to_numpy(), lens)
        tf = (pd.DataFrame({"doc_id": doc, "word": flat.to_numpy()})
              .groupby(["doc_id", "word"], sort=False).size()
              .reset_index())
        tf.columns = ["doc_id", "word", "tf"]
        score = (tf["tf"].to_numpy(np.float64)
                 * tf["word"].map(table).to_numpy(np.float64))
        tf["score"] = textstats.round_half_away(score, 6)
        tf = tf.sort_values(["doc_id", "score", "word"],
                            ascending=[True, False, True],
                            kind="mergesort")
        tf["rnk"] = tf.groupby("doc_id", sort=False).cumcount() + 1
        out = tf[tf["rnk"] <= 3]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "word": out["word"].to_numpy(),
            "score": out["score"].to_numpy(np.float64),
            "rnk": out["rnk"].to_numpy(np.int64)})

    out = docs.map_batches(topk, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "rnk"], ignore_index=True)


@register("weighted_median_price_by_flag", sql="""
WITH b AS (SELECT l_returnflag AS flag,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                  CAST(l_quantity AS BIGINT) AS qty
           FROM lineitem),
h AS (SELECT flag, cents, SUM(qty) AS w FROM b GROUP BY 1, 2),
c AS (SELECT flag, cents,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM h)
SELECT flag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents
FROM c WHERE 2 * cum >= tot GROUP BY flag""")
def weighted_median_price_by_flag(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median unit price per return flag — the
    weighted-quantile aggregate SQL has no built-in for: the smallest
    price whose cumulative weight covers half the total. Scale shape
    shared with the winsorized mean: ONE lossless (flag, cents,
    Σweight) histogram reduce (bounded by distinct prices, not rows);
    the per-flag cumulative scan runs on that tiny table, and the
    half-total test is the INTEGER cross-multiplication 2·cum ≥ tot so
    no float division can disagree between engines."""
    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "flag": df["l_returnflag"].to_numpy(),
            "cents": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy(np.float64))
            .astype(np.int64)})

    hist = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_extendedprice",
                                 "l_quantity"])
        .map_batches(cents, batch_format="pandas"),
        ["flag", "cents"], {"w": ("qty", "sum")}).to_pandas()
    hist = hist.sort_values(["flag", "cents"], ignore_index=True)
    cum = hist.groupby("flag", sort=False)["w"].cumsum().to_numpy(np.int64)
    tot = hist.groupby("flag", sort=False)["w"].transform("sum") \
        .to_numpy(np.int64)
    ok = hist[2 * cum >= tot]
    out = ok.groupby("flag", sort=False)["cents"].min().reset_index()
    out.columns = ["flag", "wmedian_cents"]
    out["wmedian_cents"] = out["wmedian_cents"].astype(np.int64)
    return out


@register("value_mode_geo_harm_by_type", sql="""
WITH b AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
h AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
mode AS (SELECT event_type, cents AS mode_cents
         FROM h QUALIFY ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY n DESC, cents) = 1),
m AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(LN(cents)) AS sln, SUM(1.0 / cents) AS sinv
      FROM b GROUP BY event_type)
SELECT m.event_type, mode.mode_cents,
       ROUND(EXP(m.sln / m.n), 6) AS geo_mean_cents,
       ROUND(m.n / m.sinv, 6) AS harm_mean_cents
FROM m JOIN mode USING (event_type)""")
def value_mode_geo_harm_by_type(sf_dir: str) -> pd.DataFrame:
    """Mode, geometric mean and harmonic mean of the value per event
    type — the aggregate trio SQL exposes unevenly (no MODE tiebreak
    guarantee, no geo/harm builtins) and webalizer-style reports want
    for rate-like measures. Scale shape: the mode comes EXACTLY off
    the same lossless (type, cents, n) histogram the weighted median
    uses (highest count, smallest value on ties — deterministic on
    both engines); ln- and reciprocal-sums ride as per-batch float
    partials (values are strictly positive cents)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        t = df["event_type"].to_numpy()
        g = (pd.DataFrame({"event_type": t, "cents": cents})
             .groupby(["event_type", "cents"], sort=False).size()
             .reset_index())
        g.columns = ["event_type", "cents", "n"]
        return g

    hist = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                       ["event_type", "cents"],
                       {"n": ("n", "sum")}).to_pandas()
    # mode: highest count, smallest cents — deterministic tie rule
    m = hist.sort_values(["event_type", "n", "cents"],
                         ascending=[True, False, True], kind="mergesort") \
        .groupby("event_type", sort=False).head(1) \
        .rename(columns={"cents": "mode_cents"})[["event_type",
                                                  "mode_cents"]]
    c = hist["cents"].to_numpy(np.float64)
    n = hist["n"].to_numpy(np.float64)
    moments = pd.DataFrame({
        "event_type": hist["event_type"],
        "n": n, "sln": np.log(c) * n, "sinv": n / c})
    mm = moments.groupby("event_type", sort=False).sum().reset_index()
    r6 = textstats.round_half_away
    out = mm.merge(m, on="event_type")
    return pd.DataFrame({
        "event_type": out["event_type"],
        "mode_cents": out["mode_cents"].astype(np.int64),
        "geo_mean_cents": r6(np.exp(out["sln"].to_numpy(np.float64)
                                    / out["n"].to_numpy(np.float64)), 6),
        "harm_mean_cents": r6(out["n"].to_numpy(np.float64)
                              / out["sinv"].to_numpy(np.float64), 6)})


@register("holt_linear_daily", sql="""
WITH RECURSIVE daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY day),
ord AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i
        FROM daily),
w(i, day, l, b) AS (
  SELECT o1.i, o1.day, o1.y, o2.y - o1.y
  FROM ord o1 JOIN ord o2 ON o2.i = 2 WHERE o1.i = 1
  UNION ALL
  SELECT o.i, o.day,
         0.5 * o.y + 0.5 * (w.l + w.b),
         0.3 * ((0.5 * o.y + 0.5 * (w.l + w.b)) - w.l) + 0.7 * w.b
  FROM ord o JOIN w ON o.i = w.i + 1)
SELECT day, ROUND(l, 6) AS level, ROUND(b, 6) AS trend
FROM w ORDER BY day""")
def holt_linear_daily(sf_dir: str) -> pd.DataFrame:
    """Holt's double exponential smoothing (level + linear trend,
    α = 0.5, β = 0.3, l₁ = y₁, b₁ = y₂ − y₁) over the daily event
    volume — the EWMA's trend-aware sibling that short-horizon
    forecasts build on. Scale shape identical to the EWMA: ONE
    distributed daily-count reduce (O(days) at any corpus size), and
    the inherently-sequential recursion runs driver-side in EXACTLY
    the oracle's float expression order — including recomputing the
    new level inside the trend update the way the CTE spells it, so
    every double is bit-identical. Fewer than two days -> empty
    result on both engines (the CTE base case needs y₂)."""
    ds = _events(sf_dir, ["ts"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    daily = reduce_sink(ds, ["date"], {"y": ("ts", "size")}) \
        .to_pandas().sort_values("date", ignore_index=True)
    y = daily["y"].to_numpy(np.float64)
    if len(y) < 2:
        return pd.DataFrame({"day": pd.Series([], dtype=object),
                             "level": pd.Series([], dtype=np.float64),
                             "trend": pd.Series([], dtype=np.float64)})
    l = np.empty(len(y))
    b = np.empty(len(y))
    l[0], b[0] = y[0], y[1] - y[0]
    for i in range(1, len(y)):
        l_new = 0.5 * y[i] + 0.5 * (l[i - 1] + b[i - 1])
        b[i] = 0.3 * ((0.5 * y[i] + 0.5 * (l[i - 1] + b[i - 1]))
                      - l[i - 1]) + 0.7 * b[i - 1]
        l[i] = l_new
    r6 = textstats.round_half_away
    return pd.DataFrame({"day": daily["date"], "level": r6(l, 6),
                         "trend": r6(b, 6)})


@register("weighted_doc_sample", sql="""
WITH p AS (SELECT doc_id,
                  LN((((doc_id * 2654435761) % 4294967296) + 1)
                     / 4294967296.0) / n_chars AS prio
           FROM documents)
SELECT doc_id, ROUND(prio, 9) AS priority FROM p
ORDER BY ROUND(prio, 9) DESC, doc_id LIMIT 10""")
def weighted_doc_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res, 2006): each item draws a deterministic uniform u from the
    shared Knuth hash and the k largest priorities u^(1/w) are the
    weighted sample — here w = n_chars, so longer documents are
    proportionally more likely, reproducibly. Ranking by ln(u)/w is
    the monotone-equivalent form (one ln instead of a pow, and the
    closed form both engines spell identically); priorities round to
    9 dp BEFORE the cut with doc_id tiebreak so a hairline tie can't
    flip membership. Zero shuffle: per-batch local top-10 partials,
    driver merges B x 10 rows."""
    def prio(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(scan._KNUTH)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 1) / float(1 << 32)
        w = batch["n_chars"].to_numpy().astype(np.float64)
        part = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "priority": textstats.round_half_away(np.log(u) / w, 9)})
        return top_n_pandas(part, "doc_id", "priority", 10)

    cand = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        prio, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["priority", "doc_id"],
                           ascending=[False, True],
                           kind="mergesort").head(10)
    return out.reset_index(drop=True)


@register("daily_seasonal_decompose", sql="""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 - 19723 AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(CAST(d AS DOUBLE)) AS sx, SUM(y) AS sy,
             SUM(CAST(d AS DOUBLE) * y) AS sxy,
             SUM(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) AS sxx
      FROM daily),
f AS (SELECT d, y,
             (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)
                 * CAST(d AS DOUBLE)
             + (s.sy - (s.n * s.sxy - s.sx * s.sy)
                       / (s.n * s.sxx - s.sx * s.sx) * s.sx) / s.n AS fit
      FROM daily, s),
sea AS (SELECT (d + 19723 + 4) % 7 AS dow, AVG(y - fit) AS seasonal
        FROM f GROUP BY 1)
SELECT CAST(f.d + 19723 AS BIGINT) AS epoch_day,
       CAST(f.y AS BIGINT) AS observed,
       ROUND(f.fit, 6) AS trend,
       ROUND(sea.seasonal, 6) AS seasonal,
       ROUND(f.y - f.fit - sea.seasonal, 6) AS residual
FROM f JOIN sea ON (f.d + 19723 + 4) % 7 = sea.dow""")
def daily_seasonal_decompose(sf_dir: str) -> pd.DataFrame:
    """Classical seasonal decomposition of the daily event volume:
    observed = linear trend (OLS over centered epoch days — centered
    at the corpus epoch for conditioning, like value_trend_ols) +
    day-of-week seasonal (mean detrended value per dow, the additive
    analog of the seasonality index) + residual — the anomaly input
    real monitoring evaluates instead of the raw series. Scale shape
    shared with the EWMA family: the heavy work is ONE daily-count
    reduce; trend, seasonal and residual are closed forms over the
    O(days) table, written identically on both engines."""
    epoch_2024 = 19723  # days: TIMESTAMP '2024-01-01' / 86400s

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86_400_000_000 - epoch_2024
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"d": u, "y": c.astype(np.int64)})

    daily = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["d"], {"y": ("y", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    d = daily["d"].to_numpy(np.float64)
    y = daily["y"].to_numpy(np.float64)
    n = float(len(d))
    sx, sy = d.sum(), y.sum()
    sxy, sxx = (d * y).sum(), (d * d).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fit = slope * d + (sy - slope * sx) / n
    dow = ((daily["d"].to_numpy(np.int64) + epoch_2024 + 4) % 7)
    det = y - fit
    sea = pd.DataFrame({"dow": dow, "det": det}) \
        .groupby("dow")["det"].mean()
    seasonal = sea.reindex(dow).to_numpy(np.float64)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "epoch_day": (daily["d"].to_numpy(np.int64) + epoch_2024),
        "observed": daily["y"].to_numpy(np.int64),
        "trend": r6(fit, 6),
        "seasonal": r6(seasonal, 6),
        "residual": r6(y - fit - seasonal, 6)})


@register("knn_kcore_sizes")
def knn_kcore_sizes(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition of the k-NN similarity graph (rows-only:
    the iterative peel has no SQL form; pytest proves parity against
    a driver-side brute-force peel on planted graphs): how many nodes
    survive at min-degree 1, 2 and 3 — the embedding-space density
    diagnostic that separates tight semantic clusters (deep cores)
    from thin hubs. Each peel round is ONE distributed degree reduce
    over the surviving edges with the under-k set broadcast back
    (stages/graph.py:kcore_nodes); rounds bound by peel depth."""
    from webalizer_ray.stages import graph

    e = knn_graph(sf_dir)[["node", "neighbor"]]
    a = np.minimum(e["node"].to_numpy(np.int64),
                   e["neighbor"].to_numpy(np.int64))
    b = np.maximum(e["node"].to_numpy(np.int64),
                   e["neighbor"].to_numpy(np.int64))
    canon = pd.DataFrame({"src": a, "dst": b}).drop_duplicates()
    rows = []
    for k in (1, 2, 3):
        nodes = graph.kcore_nodes(canon, k)
        rows.append((k, len(nodes)))
    return pd.DataFrame({
        "k": np.array([r[0] for r in rows], np.int64),
        "core_nodes": np.array([r[1] for r in rows], np.int64)})


@register("did_uplift_estimate", sql="""
WITH b AS (SELECT user_id % 2 AS arm,
                  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
                      AS post,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
m AS (SELECT arm, post, CAST(SUM(cents) AS DOUBLE) AS s,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM b GROUP BY arm, post),
w AS (SELECT
  MAX(CASE WHEN arm = 1 AND post = 1 THEN s / n END) AS b_post,
  MAX(CASE WHEN arm = 1 AND post = 0 THEN s / n END) AS b_pre,
  MAX(CASE WHEN arm = 0 AND post = 1 THEN s / n END) AS a_post,
  MAX(CASE WHEN arm = 0 AND post = 0 THEN s / n END) AS a_pre
  FROM m)
SELECT ROUND(((b_post - b_pre) - (a_post - a_pre)) / 100, 6)
           AS did_estimate,
       ROUND((b_post - b_pre) / 100, 6) AS treated_delta,
       ROUND((a_post - a_pre) / 100, 6) AS control_delta
FROM w""")
def did_uplift_estimate(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences uplift estimate (the quasi-
    experimental causal workhorse; arm = user hash parity as in the
    A/B z-test, period split mid-month): DiD = (treated post − pre) −
    (control post − pre) on mean event value, removing both the level
    difference between arms and the common time shock. Scale shape:
    ONE streaming pass where each block emits 4 (arm, period) integer
    (Σcents, n) partials; the four means and the closed form happen
    once on the driver in oracle expression order."""
    cut = np.datetime64("2024-01-16T00:00:00")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (df["user_id"].to_numpy(np.int64) % 2)
        post = (df["ts"].to_numpy("datetime64[us]") >= cut) \
            .astype(np.int64)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        g = (pd.DataFrame({"arm": arm, "post": post, "cents": cents})
             .groupby(["arm", "post"], sort=False)["cents"]
             .agg(["sum", "size"]).reset_index())
        g.columns = ["arm", "post", "s", "n"]
        return g

    m = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pandas"),
        ["arm", "post"], {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .to_pandas()
    mean = {(int(r["arm"]), int(r["post"])):
            float(r["s"]) / float(r["n"]) for _, r in m.iterrows()}
    b_post, b_pre = mean[(1, 1)], mean[(1, 0)]
    a_post, a_pre = mean[(0, 1)], mean[(0, 0)]
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "did_estimate": [float(r6(((b_post - b_pre)
                                   - (a_post - a_pre)) / 100, 6))],
        "treated_delta": [float(r6((b_post - b_pre) / 100, 6))],
        "control_delta": [float(r6((a_post - a_pre) / 100, 6))]})


@register("daily_cusum_peak", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM daily),
c AS (SELECT d,
             s.n * SUM(y) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
             - ROW_NUMBER() OVER (ORDER BY d) * s.sy AS t
      FROM daily, s)
SELECT CAST(d AS BIGINT) AS epoch_day,
       CAST(ABS(t) AS BIGINT) AS cusum_scaled
FROM c ORDER BY ABS(t) DESC, d LIMIT 1""")
def daily_cusum_peak(sf_dir: str) -> pd.DataFrame:
    """CUSUM change detection (Page 1954) on the daily volume —
    the sequential-detection sibling of the two-segment changepoint:
    the day where the cumulative deviation from the series mean peaks.
    Everything stays INTEGER by cross-multiplying the mean away:
    n·cumsum(y) − t·Σy = n·Σ_{i≤t}(y_i − ȳ), so the peak and its
    argmax (smallest day on ties) are bit-exact on both engines —
    no float CDF, no rounding guard needed. Scale shape: ONE daily
    reduce; the scan is O(days) on the driver."""
    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"d": u, "y": c.astype(np.int64)})

    daily = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["d"], {"y": ("y", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    y = daily["y"].to_numpy(np.int64)
    n, sy = np.int64(len(y)), y.sum()
    t = n * np.cumsum(y) - (np.arange(len(y), dtype=np.int64) + 1) * sy
    a = np.abs(t)
    i = int(np.argmax(a))  # first max = smallest day on ties
    return pd.DataFrame({
        "epoch_day": [np.int64(daily["d"].iloc[i])],
        "cusum_scaled": [np.int64(a[i])]})


@register("type_user_ndv_hll")
def type_user_ndv_hll(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate distinct count (HLL per event type) —
    the mergeable-summary path for per-key NDV when the keys are too
    many or the sets too large for the exact two-phase distinct
    (which stays the small-cardinality baseline; pytest pins each
    estimate within 5% of it). ONE pass: each batch emits one
    (type, registers) sketch partial per type it saw; register-max
    merges are associative, so only |types| x 16 KiB ever shuffles."""
    from webalizer_ray.stages.sketch import HyperLogLog

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = pd.util.hash_array(g["user_id"].to_numpy(np.int64))
            rows.append({"event_type": t,
                         "hll": HyperLogLog.from_hashes(h).to_bytes()})
        return pd.DataFrame({
            "event_type": pd.Series([r["event_type"] for r in rows],
                                    dtype="string"),
            "hll": pd.Series([r["hll"] for r in rows], dtype=object)})

    parts = _events(sf_dir, ["event_type", "user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    out = []
    for t, g in parts.groupby("event_type"):
        sk = HyperLogLog()
        for b in g["hll"]:
            sk = sk.merge(HyperLogLog.from_bytes(b))
        out.append((t, int(round(sk.count()))))
    out.sort()
    return pd.DataFrame({
        "event_type": [r[0] for r in out],
        "ndv_users_est": np.array([r[1] for r in out], np.int64)})


@register("source_concentration_hhi", sql="""
WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
           FROM documents GROUP BY source),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
       ROUND(SUM((n / tot) * (n / tot)), 6) AS hhi
FROM c, t""")
def source_concentration_hhi(sf_dir: str) -> pd.DataFrame:
    """Herfindahl–Hirschman concentration index of the corpus source
    mix — the one-number answer to "is this corpus dominated by a few
    sources?" that data cards report next to the source table (1/HHI
    is the effective number of sources). Scale shape: per-batch
    (source, n) partials reduce once; shares and the Σshare² closed
    form run on the |sources|-row aggregate in oracle expression
    order."""
    agg = reduce_sink(
        _docs(sf_dir, ["source"]).map_batches(
            lambda df: df.groupby("source", sort=False).size()
            .reset_index(name="n"), batch_format="pandas"),
        ["source"], {"n": ("n", "sum")}).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    tot = n.sum()
    sh = n / tot
    return pd.DataFrame({
        "n_sources": [np.int64(len(agg))],
        "hhi": [float(textstats.round_half_away(
            float((sh * sh).sum()), 6))]})


@register("bloom_semijoin_orders", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'""")
def bloom_semijoin_orders(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter semi-join reduction — the classic scan-side prune
    ahead of a distributed join: the build side's keys (BUILDING
    customers) fold into per-batch Bloom partials that OR-merge on the
    driver (a few KiB however many keys) and broadcast once; the fact
    scan drops every order whose custkey definitely isn't in the dim
    BEFORE the join, so only candidate rows (matches + the filter's
    false positives) pay the shuffle. The exact hash join afterwards
    removes false positives — output is provably identical to the
    plain join, which is exactly what the oracle checks."""
    from webalizer_ray.stages.join import auto_join
    from webalizer_ray.stages.sketch import BloomFilter

    dim = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda df: df[df["c_mktsegment"] == "BUILDING"]
                     [["c_custkey"]], batch_format="pandas") \
        .materialize()

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["c_custkey"].to_numpy(np.int64))
        bf = BloomFilter(log2m=16, k=7).add_hashes(h)
        return pd.DataFrame({"bloom": pd.Series([bf.to_bytes()],
                                                dtype=object)})

    parts = dim.map_batches(bloom_partial,
                            batch_format="pandas").to_pandas()
    bf = BloomFilter(log2m=16, k=7)
    for blob in parts["bloom"]:
        bf = bf.merge(BloomFilter.from_bytes(blob, log2m=16, k=7))
    bf_ref = ray.put(bf.to_bytes())

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter.from_bytes(ray.get(bf_ref), log2m=16, k=7)
        keys = df["o_custkey"].to_numpy(np.int64)
        m = f.contains_hashes(pd.util.hash_array(keys))
        out = df[m]
        return pd.DataFrame({
            "o_custkey": out["o_custkey"].to_numpy(np.int64),
            "cents": np.rint(out["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})

    fact = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]) \
        .map_batches(prefilter, batch_format="pandas")
    joined = auto_join(fact, dim, on="o_custkey", right_on="c_custkey")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "s": [df["cents"].to_numpy(np.int64).sum()]})

    p = joined.map_batches(agg, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_orders": [np.int64(p["n"].sum())],
        "total_cents": [np.int64(p["s"].sum())]})


@register("copurchased_part_pairs", sql="""
WITH d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem),
pr AS (SELECT a.p AS part_a, b.p AS part_b,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
       GROUP BY 1, 2)
SELECT part_a, part_b, n FROM pr
ORDER BY n DESC, part_a, part_b LIMIT 10""")
def copurchased_part_pairs(sf_dir: str) -> pd.DataFrame:
    """Top co-purchased part pairs — the market-basket pattern at real
    catalog cardinality (|parts| in the thousands, not the events
    table's five types): a two-phase distinct makes each (order, part)
    one row globally, orders hash into buckets (an order never spans
    buckets), the pair expansion is ONE vectorized self-merge per
    bucket bounded by items-per-order squared, and only (a, b, n)
    partials shuffle into the final count + top-10 (deterministic
    (n DESC, a, b) order on both engines — counts are integers, so no
    rounding guard is needed)."""
    from webalizer_ray.stages.aggregate import distinct_count  # noqa: F401

    d = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_partkey"])
        .map_batches(lambda df: df.drop_duplicates(),
                     batch_format="pandas"),
        ["l_orderkey", "l_partkey"], {"c": ("l_partkey", "size")})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["l_orderkey"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["l_orderkey", "l_partkey"]].merge(
            g[["l_orderkey", "l_partkey"]], on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
               .size().reset_index(name="n"))
        out.columns = ["part_a", "part_b", "n"]
        return out

    agg = reduce_sink(
        (d.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: pairs(g.drop(columns=["bucket_"])),
                     batch_format="pandas")),
        ["part_a", "part_b"], {"n": ("n", "sum")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "part_a", "part_b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(10)

    cand = agg.map_batches(local_top, batch_format="pandas").to_pandas()
    out = cand.sort_values(["n", "part_a", "part_b"],
                           ascending=[False, True, True],
                           kind="mergesort").head(10)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


@register("markov_stationary_types", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
t AS (SELECT prev AS f, event_type AS tt, CAST(COUNT(*) AS DOUBLE) AS c
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT f, SUM(c) AS tot FROM t GROUP BY f),
p1 AS (SELECT t.f, t.tt, t.c / rt.tot AS p FROM t JOIN rt USING (f)),
p2 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p1 a JOIN p1 b ON a.tt = b.f GROUP BY 1, 2),
p4 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p2 a JOIN p2 b ON a.tt = b.f GROUP BY 1, 2),
p8 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p4 a JOIN p4 b ON a.tt = b.f GROUP BY 1, 2),
p16 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
        FROM p8 a JOIN p8 b ON a.tt = b.f GROUP BY 1, 2),
p32 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
        FROM p16 a JOIN p16 b ON a.tt = b.f GROUP BY 1, 2),
ns AS (SELECT CAST(COUNT(DISTINCT f) AS DOUBLE) AS n FROM t)
SELECT p32.tt AS event_type,
       ROUND(SUM(p32.p / ns.n), 6) AS stationary_p
FROM p32, ns GROUP BY p32.tt ORDER BY event_type""")
def markov_stationary_types(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain — where
    a user's behavior settles if the observed transition dynamics
    keep running (the long-run type mix, distinct from the empirical
    mix whenever the chain has slow states). The heavy work is the
    SAME per-user sort+shift transition reduce as event_transitions;
    the |types|² row-normalized matrix is then raised to the 32nd
    power by FIVE squarings (driver-side numpy here; chained
    aggregate CTEs in the oracle — the identical association order,
    uniform start vector, so both engines walk the same float path
    to the rounding guard)."""
    t = event_transitions(sf_dir)
    sources = sorted(t["from_type"].unique())
    all_types = sorted(set(sources) | set(t["to_type"].unique()))
    piv = t.pivot_table(index="from_type", columns="to_type",
                        values="cnt", fill_value=0, aggfunc="sum") \
        .reindex(index=all_types, columns=all_types, fill_value=0)
    P = piv.to_numpy(np.float64)
    row = P.sum(axis=1, keepdims=True)
    # never-source types keep an all-zero row: the oracle's join on
    # a.tt = b.f drops flows routed through them, which is exactly
    # what a zero row does to an ordinary matmul
    P = np.divide(P, row, out=np.zeros_like(P), where=row > 0)
    M = P.copy()
    for _ in range(5):          # M = P^32 by repeated squaring
        M = M @ M
    n = float(len(sources))
    pi = M.sum(axis=0) / n      # uniform start over source states
    out = pd.DataFrame({"event_type": all_types,
                        "stationary_p": textstats.round_half_away(
                            pi, 6)})
    # oracle rows exist iff the type is reachable in exactly 32 steps
    # (the join chain only materializes positive-probability paths) —
    # filter on the UNROUNDED mass so a rounds-to-zero row survives
    out = out[pi > 0].reset_index(drop=True)
    return out.sort_values("event_type", ignore_index=True)


#: Poisson(1) CDF ladder shared verbatim with the oracle SQL
_POIS1_CDF = (0.36787944117144233, 0.7357588823428847,
              0.9196986029286058, 0.9810118431238462,
              0.9963401531726563, 0.9994058151824183,
              0.9999167588507119, 0.9999897508033253)


@register("bootstrap_value_mean_ci", sql="""
WITH r AS (SELECT unnest(generate_series(1, 100)) AS rep),
b AS (SELECT e.event_id, CAST(ROUND(e.value * 100) AS BIGINT) AS cents,
             r.rep,
             (((e.event_id + r.rep) * 2654435761) % 4294967296)
                 / 4294967296.0 AS u
      FROM events e CROSS JOIN r),
w AS (SELECT rep, cents,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.9999167588507119 THEN 6
                  WHEN u < 0.9999897508033253 THEN 7
                  ELSE 8 END AS k
      FROM b),
m AS (SELECT rep,
             ROUND(SUM(k * cents) * 1.0 / SUM(k), 6) AS mean_cents
      FROM w GROUP BY rep),
o AS (SELECT mean_cents,
             ROW_NUMBER() OVER (ORDER BY mean_cents) AS rn FROM m)
SELECT MAX(CASE WHEN rn = 3 THEN mean_cents END) AS ci_lo_cents,
       MAX(CASE WHEN rn = 98 THEN mean_cents END) AS ci_hi_cents
FROM o""")
def bootstrap_value_mean_ci(sf_dir: str) -> pd.DataFrame:
    """Deterministic Poisson bootstrap 95% CI for the mean event value
    (Chamandy et al. 2012's streaming bootstrap, made reproducible):
    each of 100 resamples weights every row by a Poisson(1) draw
    derived from the shared Knuth hash of (event_id + rep), so the
    'randomness' is a pure function both engines evaluate identically
    — u is an exact dyadic double and the CDF ladder constants are
    shared verbatim, so every weight matches bit-for-bit and the CI is
    oracle-checkable (uncertainty quantification usually isn't). Scale
    shape: the 100x expansion never materializes — each batch computes
    its (rep, Σk·cents, Σk) integer partials from a (rows × 100)
    vectorized weight matrix and ships 100 rows; resampled means and
    the order statistics happen on the 100-row table."""
    reps = 100

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.int64)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        r = np.arange(1, reps + 1, dtype=np.uint64)
        h = ((ids.astype(np.uint64)[:, None] + r[None, :])
             * np.uint64(2654435761)) % np.uint64(1 << 32)
        u = h.astype(np.float64) / float(1 << 32)
        k = np.searchsorted(np.asarray(_POIS1_CDF), u.ravel(),
                            side="right").reshape(u.shape) \
            .astype(np.int64)
        return pd.DataFrame({
            "rep": np.arange(1, reps + 1, dtype=np.int64),
            "skc": (k * cents[:, None]).sum(axis=0),
            "sk": k.sum(axis=0)})

    m = reduce_sink(
        _events(sf_dir, ["event_id", "value"]).map_batches(
            partial, batch_format="pandas"),
        ["rep"], {"skc": ("skc", "sum"), "sk": ("sk", "sum")}) \
        .to_pandas()
    means = np.sort(textstats.round_half_away(
        m["skc"].to_numpy(np.float64) / m["sk"].to_numpy(np.float64),
        6))
    return pd.DataFrame({"ci_lo_cents": [float(means[2])],
                         "ci_hi_cents": [float(means[97])]})


@register("user_value_lorenz", sql="""
WITH u AS (SELECT user_id,
                  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
           FROM events GROUP BY 1),
r AS (SELECT c, NTILE(10) OVER (ORDER BY c, user_id) AS decile FROM u),
d AS (SELECT decile, SUM(c) AS s FROM r GROUP BY decile),
t AS (SELECT SUM(s) AS tot FROM d)
SELECT CAST(decile AS BIGINT) AS decile,
       ROUND(SUM(s) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
             * 1.0 / tot, 6) AS cum_share
FROM d, t ORDER BY decile""")
def user_value_lorenz(sf_dir: str) -> pd.DataFrame:
    """Lorenz curve of per-user value (the curve the Gini coefficient
    integrates): cumulative share of total value held by each
    ascending user decile. Per-user cents reduce once; decile
    assignment is the SQL-NTILE closed form over scan.global_rank's
    exact (cents, user_id) rank — no global sort shuffle — and only
    the 10-row decile mass table reaches the driver, where the
    cumulative shares divide exact integer sums."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "c": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
            batch_format="pandas"),
        ["user_id"], {"c": ("c", "sum")}).materialize()
    n = per.count()
    ranked = scan.global_rank(per, "c", "user_id", out_col="rnk",
                              num_buckets=8)
    q, rem = divmod(n, 10)
    big = rem * (q + 1)

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rnk"].to_numpy(np.int64)
        return pd.DataFrame({
            "decile": np.where(
                r <= big, (r - 1) // max(q + 1, 1) + 1,
                rem + (r - big - 1) // max(q, 1) + 1).astype(np.int64),
            "s": df["c"].to_numpy(np.int64)})

    d = reduce_sink(ranked.map_batches(binned, batch_format="pandas"),
                    ["decile"], {"s": ("s", "sum")}).to_pandas() \
        .sort_values("decile", ignore_index=True)
    s = d["s"].to_numpy(np.int64)
    tot = float(s.sum())
    return pd.DataFrame({
        "decile": d["decile"].to_numpy(np.int64),
        "cum_share": textstats.round_half_away(
            np.cumsum(s).astype(np.float64) * 1.0 / tot, 6)})


@register("transition_association_rules", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
t AS (SELECT prev AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT SUM(c) AS n FROM t),
rt AS (SELECT from_type, SUM(c) AS rowc FROM t GROUP BY 1),
ct AS (SELECT to_type, SUM(c) AS colc FROM t GROUP BY 1)
SELECT t.from_type, t.to_type,
       ROUND(t.c / tot.n, 6) AS support,
       ROUND(t.c / rt.rowc, 6) AS confidence,
       ROUND((t.c / rt.rowc) / (ct.colc / tot.n), 6) AS lift
FROM t JOIN rt USING (from_type) JOIN ct USING (to_type), tot""")
def transition_association_rules(sf_dir: str) -> pd.DataFrame:
    """Sequential association rules over consecutive-event transitions
    (support / confidence / lift per from→to rule — the Agrawal-style
    rule metrics on the SAME transition reduce the Markov family
    shares, so the only distributed work is one sort+shift per user
    bucket). Marginals and the three ratios are closed forms over the
    |types|² aggregate, written identically on both engines."""
    t = event_transitions(sf_dir)
    c = t["cnt"].to_numpy(np.float64)
    n = c.sum()
    rowc = t.groupby("from_type")["cnt"].transform("sum") \
        .to_numpy(np.float64)
    colc = t.groupby("to_type")["cnt"].transform("sum") \
        .to_numpy(np.float64)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "from_type": t["from_type"],
        "to_type": t["to_type"],
        "support": r6(c / n, 6),
        "confidence": r6(c / rowc, 6),
        "lift": r6((c / rowc) / (colc / n), 6)})


@register("user_value_percentile_bands", sql="""
WITH u AS (SELECT user_id,
                  SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
           FROM events GROUP BY 1),
t AS (SELECT COUNT(*) AS n FROM u),
w AS (SELECT c, CAST(RANK() OVER (ORDER BY c) AS BIGINT) AS rmin,
             CAST(COUNT(*) OVER (ORDER BY c) AS BIGINT) AS rle
      FROM u)
SELECT CAST(LEAST(19, CAST(FLOOR((rmin - 1) * 20.0 / (n - 1))
                           AS BIGINT)) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(rle) AS BIGINT) AS sum_rank_le
FROM w, t GROUP BY 1 ORDER BY 1""")
def user_value_percentile_bands(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK / CUME_DIST as closed forms over the exact global
    rank — users histogrammed into 20 equal-width percent-rank bands.
    SQL's tie semantics are reproduced exactly from integer rank
    statistics: PERCENT_RANK = (rank_min − 1)/(n − 1) where rank_min is
    the ties-low RANK(), and SUM(rank_le) carries CUME_DIST·n (the
    ties-high count of rows ≤ c, integer so no float summation-order
    risk). Per-user cents reduce once, scan.global_rank assigns unique
    (c, user_id) ranks with no global sort shuffle, a per-distinct-value
    reduce recovers rank_min/rank_le/count for each tie group, and only
    the ≤|distinct sums| tie table then the 20-row band aggregate ever
    shuffle — the band cut (rmin−1)·20.0/(n−1) is one float expression
    evaluated with identical operands on both engines, so FLOOR cannot
    disagree."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "c": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
            batch_format="pandas"),
        ["user_id"], {"c": ("c", "sum")}).materialize()
    n = per.count()
    ranked = scan.global_rank(per, "c", "user_id", out_col="rnk",
                              num_buckets=8)
    ties = reduce_sink(
        ranked.map_batches(
            lambda df: pd.DataFrame({
                "c": df["c"].to_numpy(np.int64),
                "rmin": df["rnk"].to_numpy(np.int64),
                "rle": df["rnk"].to_numpy(np.int64),
                "cnt": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["c"], {"rmin": ("rmin", "min"), "rle": ("rle", "max"),
                "cnt": ("cnt", "sum")})

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        rmin = df["rmin"].to_numpy(np.int64)
        band = np.minimum(
            19, np.floor((rmin - 1) * 20.0 / (n - 1)).astype(np.int64))
        return pd.DataFrame({
            "band": band,
            "n_users": df["cnt"].to_numpy(np.int64),
            "sum_rank_le": df["rle"].to_numpy(np.int64)
            * df["cnt"].to_numpy(np.int64)})

    out = reduce_sink(ties.map_batches(bands, batch_format="pandas"),
                      ["band"], {"n_users": ("n_users", "sum"),
                                 "sum_rank_le": ("sum_rank_le", "sum")}) \
        .to_pandas()
    return out.sort_values("band", ignore_index=True)


@register("events_grouping_sets", sql="""
WITH b AS (SELECT event_type,
                  (CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE)) AS BIGINT) + 4) % 7
                      AS dow,
                  CAST(hour(ts) AS BIGINT) AS hour,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(dow, -1) AS dow, COALESCE(hour, -1) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM b
GROUP BY GROUPING SETS ((event_type, dow), (event_type, hour),
                        (dow), ())
ORDER BY 1, 2, 3""")
def events_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """Arbitrary GROUPING SETS lattice in ONE pass — unlike the CUBE
    query (events_cube, the full 2^k lattice), this computes a
    hand-picked non-cube set {(type, dow), (type, hour), (dow), ()}
    the way a reporting layer asks for exactly the rollups it renders.
    Every batch emits partials for each set with rolled-up dims as
    sentinels ('ALL'/−1 — never colliding because each set's sentinel
    pattern is unique), so a single shuffle of ≤ Σ|set cardinalities|
    partial rows serves all four granularities; re-running one groupby
    per set would re-read the raw input four times. dow uses the
    convention-free (epoch_day + 4) % 7 arithmetic shared with
    dow_seasonality_index."""
    def partials(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str)
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        dow = (day + 4) % 7
        hour = df["ts"].dt.hour.to_numpy(np.int64)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        all_t = pd.Series(np.repeat("ALL", len(df)))
        neg = np.full(len(df), -1, dtype=np.int64)
        frames = []
        for t, d, h in [(et, dow, hour * 0 - 1),
                        (et, neg, hour),
                        (all_t, dow, neg),
                        (all_t, neg, neg)]:
            frames.append(pd.DataFrame({
                "event_type": t.to_numpy() if hasattr(t, "to_numpy")
                else t,
                "dow": d, "hour": h, "n": 1, "cents": cents}))
        allf = pd.concat(frames, ignore_index=True)
        return allf.groupby(["event_type", "dow", "hour"], sort=False) \
            .agg(n=("n", "sum"), cents=("cents", "sum")).reset_index()

    out = reduce_sink(
        _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
            partials, batch_format="pandas"),
        ["event_type", "dow", "hour"],
        {"n": ("n", "sum"), "cents": ("cents", "sum")}).to_pandas()
    return out.sort_values(["event_type", "dow", "hour"],
                           ignore_index=True)


@register("user_trailing_1h_distinct_types", sql="""
WITH w AS (SELECT e.event_id,
        (SELECT COUNT(DISTINCT e2.event_type) FROM events e2
         WHERE e2.user_id = e.user_id
           AND e2.ts >= e.ts - INTERVAL 1 HOUR
           AND e2.ts <= e.ts) AS k
   FROM events e)
SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY 1 ORDER BY 1""")
def user_trailing_1h_distinct_types(sf_dir: str) -> pd.DataFrame:
    """Windowed COUNT(DISTINCT) — for every event, the number of
    distinct event types its user emitted in the trailing hour
    (RANGE-frame inclusive bounds matching user_trailing_1h_value; SQL
    window functions cannot express DISTINCT aggregates, so the oracle
    is the correlated range subquery). The distributed form exploits
    the bounded type alphabet: inside each user-hash bucket, one
    per-type pass computes the running last-seen timestamp (a
    peer-group max then segment cummax, so equal-timestamp rows see
    each other exactly like a RANGE frame), and k is the count of
    types whose last-seen falls inside [t − 1h, t]. |types| vectorized
    passes per bucket, zero per-row Python; only the tiny (k, n)
    histogram partials leave the buckets."""
    def k_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        types = g["event_type"].to_numpy()
        new_user = np.ones(len(g), bool)
        new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user)
        lo = ts - 3_600_000_000
        k = np.zeros(len(g), np.int64)
        sentinel = np.iinfo(np.int64).min
        frame = pd.DataFrame({"seg": seg, "ts": ts})
        for t in np.unique(types):
            masked = np.where(types == t, ts, sentinel)
            # peer-group max first: equal-ts rows of the same user see
            # each other regardless of sort position (RANGE semantics)
            peer = pd.Series(masked).groupby(
                [frame["seg"], frame["ts"]]).transform("max")
            last = peer.groupby(frame["seg"]).cummax().to_numpy()
            k += last >= lo
        h = pd.Series(k).value_counts()
        return pd.DataFrame({"k": h.index.to_numpy(np.int64),
                             "n": h.to_numpy(np.int64)})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    parts = (_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
             .map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_")
             .map_groups(lambda g: k_hist(g.drop(columns=["bucket_"])),
                         batch_format="pandas"))
    out = reduce_sink(parts, ["k"], {"n": ("n", "sum")}).to_pandas()
    return out.sort_values("k", ignore_index=True)


@register("session_concurrency_hist", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
      FROM sid GROUP BY user_id, sid),
b AS (SELECT st AS ts, 1 AS net FROM s
      UNION ALL SELECT en, -1 FROM s),
g AS (SELECT ts, CAST(SUM(net) AS BIGINT) AS net FROM b GROUP BY ts),
c AS (SELECT epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (ORDER BY ts) AS next_us,
             CAST(SUM(net) OVER (ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS conc
      FROM g)
SELECT conc, CAST(SUM(next_us - us) AS BIGINT) AS dur_us
FROM c WHERE conc > 0 AND next_us IS NOT NULL
GROUP BY 1 ORDER BY 1""")
def session_concurrency_hist(sf_dir: str) -> pd.DataFrame:
    """Concurrency DURATION histogram — exact microseconds the system
    spent with exactly k sessions live (peak_concurrent_sessions'
    sweep-line, but the full time-weighted distribution a capacity
    planner actually bills against, not just the max). Sessions reduce
    to intervals in the user-hash bucket; intervals collapse to
    per-distinct-timestamp net (+starts −ends) partials; the running
    concurrency rides the same two-level range scan as the peak query
    (day-width buckets, O(buckets) totals to the driver). The segment
    length needs each boundary's SUCCESSOR timestamp, which the scan's
    bucket metadata already yields for free: the driver pairs every
    bucket with the NEXT non-empty bucket's first timestamp (O(days)
    rows), so each bucket closes its own last segment without any task
    seeing the whole boundary stream. Zero-length sessions (st == en)
    net to 0 and correctly contribute no time; the global last
    boundary has conc 0 (every start has an end) and is masked on both
    engines."""
    sess = _sessionized_events(sf_dir)
    iv = reduce_sink(sess, ["user_id", "sid"],
                     {"st": ("ts", "min"), "en": ("ts", "max")})
    day_us = 86_400_000_000

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        st = df["st"].to_numpy("datetime64[us]").astype(np.int64)
        en = df["en"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "ts_us": np.concatenate([st, en]),
            "net": np.concatenate([np.ones(len(st), np.int64),
                                   -np.ones(len(en), np.int64)])})
        return out.groupby("ts_us", as_index=False).sum()

    per_ts = reduce_sink(
        iv.map_batches(boundaries, batch_format="pandas"),
        ["ts_us"], {"net": ("net", "sum")})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bk"] = df["ts_us"].to_numpy(np.int64) // day_us
        return df

    tagged = per_ts.map_batches(tag, batch_format="pandas")
    meta = reduce_sink(tagged, ["_bk"],
                       {"net": ("net", "sum"),
                        "first_ts": ("ts_us", "min")}).to_pandas() \
        .sort_values("_bk", ignore_index=True)
    off = dict(zip(
        meta["_bk"],
        meta["net"].cumsum().shift(fill_value=0).astype(np.int64)))
    nxt_first = dict(zip(meta["_bk"].to_numpy()[:-1],
                         meta["first_ts"].to_numpy()[1:]))

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts_us", ignore_index=True)
        bk = int(g["_bk"].iat[0])
        ts = g["ts_us"].to_numpy(np.int64)
        conc = off[bk] + np.cumsum(g["net"].to_numpy(np.int64))
        nxt = np.empty(len(ts), np.int64)
        nxt[:-1] = ts[1:]
        # last segment of the bucket extends to the next non-empty
        # bucket's first boundary; the global last boundary has conc 0
        nxt[-1] = int(nxt_first.get(bk, ts[-1]))
        keep = conc > 0
        h = pd.DataFrame({"conc": conc[keep], "dur_us": (nxt - ts)[keep]})
        return h.groupby("conc", as_index=False).sum()

    parts = tagged.groupby("_bk").map_groups(hist_bucket,
                                             batch_format="pandas")
    out = reduce_sink(parts, ["conc"],
                      {"dur_us": ("dur_us", "sum")}).to_pandas()
    return out.sort_values("conc", ignore_index=True) \
        .astype({"conc": np.int64, "dur_us": np.int64})


@register("kruskal_wallis_value_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
tot AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS tc FROM hh GROUP BY 1),
r AS (SELECT c, CAST(2 * (SUM(tc) OVER (ORDER BY c) - tc) + tc + 1
                     AS BIGINT) AS mr2
      FROM tot),
rg AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
              CAST(SUM(cnt * mr2) AS BIGINT) AS r2
       FROM hh JOIN r USING (c) GROUP BY g),
t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM((r2 / 2.0) * (r2 / 2.0) / n_g) AS s FROM rg),
tie AS (SELECT CAST(SUM(tc * tc * tc - tc) AS HUGEINT) AS t3 FROM tot)
SELECT n, k,
       ROUND(12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1), 6) AS h,
       CASE WHEN t3 = CAST(n AS HUGEINT) * n * n - n THEN 0.0
            ELSE ROUND((12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1))
                       / (1.0 - CAST(t3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)), 6)
       END AS h_tie
FROM t, tie""")
def kruskal_wallis_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Kruskal–Wallis H across event types (the rank-based one-way
    ANOVA — 'do the k value distributions differ?' without normality).
    Cents quantization again makes ONE (type, cents) contingency
    reduce a lossless summary: midranks come from the total histogram
    as DOUBLED integers (2·midrank = 2·cum_before + tc + 1 — no .5
    float ever exists), per-group rank sums R2 = Σ cnt·mr2 stay exact
    BIGINTs, and both engines close H = 12/(N(N+1))·Σ(R_g²/n_g) −
    3(N+1) plus the tie correction 1 − Σ(t³−t)/(N³−N) from those
    identical integers in the identical expression order. The only
    cross-engine float risk is the k-term group sum (k ≈ 4), bounded
    well below the 6-dp round."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["c", "g"], ignore_index=True)
    tot = hh.groupby("c", sort=True)["cnt"].sum()
    tc = tot.to_numpy(np.int64)
    cumb = np.cumsum(tc) - tc
    mr2 = dict(zip(tot.index.to_numpy(),
                   (2 * cumb + tc + 1).astype(np.int64)))
    hh["mr2"] = hh["c"].map(mr2).astype(np.int64)
    rg = hh.assign(prod=hh["cnt"] * hh["mr2"]) \
        .groupby("g", sort=True).agg(n_g=("cnt", "sum"),
                                     r2=("prod", "sum"))
    n = int(rg["n_g"].sum())
    k = len(rg)
    s = float(sum((r2 / 2.0) * (r2 / 2.0) / n_g
                  for r2, n_g in zip(rg["r2"], rg["n_g"])))
    h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1)
    t3 = int(sum(int(t) ** 3 - int(t) for t in tc))
    r6 = textstats.round_half_away
    if t3 == n ** 3 - n:
        h_tie = 0.0
    else:
        h_tie = r6(h / (1.0 - float(t3) / (float(n) * n * n - n)), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "k": np.array([k], np.int64),
                         "h": [float(r6(h, 6))],
                         "h_tie": [float(h_tie)]})


@register("cramer_von_mises_view_purchase", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
           FROM events WHERE event_type IN ('view', 'purchase')),
h AS (SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(g2) AS BIGINT) AS c2
      FROM c GROUP BY 1),
cum AS (SELECT c1, c2,
               CAST(SUM(c1) OVER (ORDER BY cents) AS HUGEINT) AS f1,
               CAST(SUM(c2) OVER (ORDER BY cents) AS HUGEINT) AS f2
        FROM h),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM h),
s AS (SELECT CAST(SUM(CAST(c1 + c2 AS HUGEINT)
                      * (f1 * (SELECT n2 FROM t)
                         - f2 * (SELECT n1 FROM t))
                      * (f1 * (SELECT n2 FROM t)
                         - f2 * (SELECT n1 FROM t))) AS HUGEINT) AS s_num
      FROM cum)
SELECT n1, n2, CAST(s_num AS DOUBLE) AS s_num,
       ROUND(CAST(s_num AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2) * (n1 + n2)), 9)
           AS cvm_t
FROM t, s""")
def cramer_von_mises_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Two-sample Cramér–von Mises statistic between the view and
    purchase value distributions — KS's integral sibling (sensitive to
    body shifts where KS only sees the sup). Same lossless cents
    histogram as ks_test_view_purchase; the ECDF difference at every
    combined sample point is the INTEGER cross product D = F1·n2 −
    F2·n1, and T = Σ tc·D² / (n1·n2·(n1+n2)²) accumulates tc·D² in
    exact Python/HUGEINT integers (D² overflows int64 by design —
    both engines go 128-bit+), so the statistic is one identical
    division from an exact integer on both sides."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        is_v = (df["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "g1": is_v.astype(np.int64),
            "g2": (~is_v).astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("g1", "sum"), "c2": ("g2", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64)
    c2 = h["c2"].to_numpy(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    f1, f2 = c1.cumsum(), c2.cumsum()
    s_num = sum(int(a + b) * (int(fa) * n2 - int(fb) * n1) ** 2
                for a, b, fa, fb in zip(c1, c2, f1, f2))
    r9 = textstats.round_half_away
    t = r9(float(s_num)
           / (float(n1) * n2 * (n1 + n2) * (n1 + n2)), 9)
    return pd.DataFrame({"n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "s_num": [float(s_num)],
                         "cvm_t": [float(t)]})


@register("brown_forsythe_value_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_g
        FROM hh),
med AS (SELECT g, MIN(n_g) AS n_g,
               MIN(CASE WHEN 2 * cm >= n_g THEN c END)
               + MIN(CASE WHEN 2 * cm >= n_g + 1 THEN c END) AS med2
        FROM cum GROUP BY g),
z AS (SELECT hh.g, MIN(m.n_g) AS n,
             MIN(m.med2) AS med2,
             CAST(SUM(cnt * ABS(2 * c - m.med2)) AS BIGINT) AS s_abs,
             CAST(SUM(cnt * (2 * c - m.med2) * (2 * c - m.med2))
                  AS BIGINT) AS q_abs
      FROM hh JOIN med m ON hh.g = m.g GROUP BY hh.g),
sc AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
              CAST(COUNT(*) AS BIGINT) AS k,
              CAST(SUM(s_abs) AS HUGEINT) AS stot,
              CAST(SUM(q_abs) AS HUGEINT) AS qtot,
              SUM(CAST(s_abs AS DOUBLE) * s_abs / n) AS sb
       FROM z)
SELECT g AS event_type, n, med2, s_abs, q_abs,
       CASE WHEN CAST(qtot AS DOUBLE) - sb = 0.0 THEN 0.0
            ELSE ROUND(((nn - k) * (sb - CAST(stot AS DOUBLE) * stot
                                         / nn))
                       / ((k - 1) * (CAST(qtot AS DOUBLE) - sb)), 6)
       END AS f
FROM z, sc ORDER BY 1""")
def brown_forsythe_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Brown–Forsythe test (Levene with median centers) — 'do the
    event types have equal value VARIANCE?', the robust
    heteroscedasticity check run before trusting a pooled comparison.
    Everything derives from the one (type, cents) contingency reduce:
    each group's median comes off its histogram as a DOUBLED integer
    (med2 = lower-middle + upper-middle via the 2·cum ≥ n half-total
    test — the same trick as weighted_median_price_by_flag, so the
    even-n .5 never exists), the absolute deviations z = |2c − med2|
    stay integers, and the one-way ANOVA F over z closes from exact
    per-group moments (S_g, Q_g — BIGINT) in identical expression
    order; doubling z scales between and within by the same 4, so F
    is unchanged. Per-type rows carry the exact integers; F rides as
    a constant column."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["g", "c"], ignore_index=True)
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n_g = int(cnt.sum())
        cm = np.cumsum(cnt)
        a = int(c[np.searchsorted(2 * cm, n_g, side="left")])
        b = int(c[np.searchsorted(2 * cm, n_g + 1, side="left")])
        med2 = a + b
        dev = 2 * c - med2
        s_abs = int(np.abs(dev) @ cnt)
        q_abs = int((dev * dev) @ cnt)
        rows.append((g, n_g, med2, s_abs, q_abs))
    out = pd.DataFrame(rows, columns=["event_type", "n", "med2",
                                      "s_abs", "q_abs"])
    nn, k = int(out["n"].sum()), len(out)
    stot, qtot = int(out["s_abs"].sum()), int(out["q_abs"].sum())
    sb = float(sum(float(s) * s / n
                   for s, n in zip(out["s_abs"], out["n"])))
    w = float(qtot) - sb
    r6 = textstats.round_half_away
    f = 0.0 if w == 0.0 else r6(
        ((nn - k) * (sb - float(stot) * stot / nn)) / ((k - 1) * w), 6)
    out["f"] = float(f)
    for col in ("n", "med2", "s_abs", "q_abs"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


@register("jw_fuzzy_part_lookup", sql="""
WITH nm AS (SELECT DISTINCT p_name FROM part),
pr AS (SELECT substr(p_name, 1, 2) || substr(p_name, 4, 1)
              || substr(p_name, 3, 1) || substr(p_name, 5) AS probe
       FROM (SELECT p_name FROM part ORDER BY p_partkey LIMIT 10)),
sc AS (SELECT probe, p_name,
              ROUND(jaro_winkler_similarity(probe, p_name), 6) AS sim
       FROM pr CROSS JOIN nm),
best AS (SELECT probe, p_name AS best_name, sim,
                ROW_NUMBER() OVER (PARTITION BY probe
                                   ORDER BY sim DESC, p_name) AS rn
         FROM sc)
SELECT probe, best_name, sim FROM best WHERE rn = 1 ORDER BY probe""")
def jw_fuzzy_part_lookup(sf_dir: str) -> pd.DataFrame:
    """Fuzzy entity lookup by Jaro–Winkler similarity — K corrupted
    probe strings (the 10 lowest-partkey part names with chars 3/4
    transposed, the classic typo JW was designed for) each resolve to
    their best-scoring catalog name. The scoring kernel
    (simjoin.jaro_winkler) is verified bit-identical to DuckDB's
    jaro_winkler_similarity, similarities round to 6 dp BEFORE the
    argmax with name tiebreak, so the winner can't flip on a hairline.
    Scale shape: the K probes broadcast once (ray.put), every batch of
    the DISTINCT-name table scores locally and emits only its K best
    (sim, name) partials, the driver merges B×K rows — the catalog
    never gathers. JW itself is per-pair Python (inherently
    character-sequential, same caveat as the ANN probe loops — fine
    while K is small; block-level cost is K·|batch| short-string
    comparisons)."""
    probes_df = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]) \
        .map_batches(lambda df: df.sort_values("p_partkey").head(10),
                     batch_format="pandas").to_pandas() \
        .sort_values("p_partkey", ignore_index=True).head(10)
    probes = [n[:2] + n[3] + n[2] + n[4:]
              for n in probes_df["p_name"]]
    probes_ref = ray.put(probes)
    r6 = textstats.round_half_away

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ps = ray.get(probes_ref)
        names = df["p_name"].tolist()
        rows = []
        for p in ps:
            best_sim, best_name = -1.0, None
            for nme in names:
                s = float(r6(simjoin.jaro_winkler(p, nme), 6))
                if s > best_sim or (s == best_sim
                                    and nme < best_name):
                    best_sim, best_name = s, nme
            rows.append((p, best_name, best_sim))
        return pd.DataFrame(rows,
                            columns=["probe", "best_name", "sim"])

    distinct = reduce_sink(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"]),
        ["p_name"], {"n": ("p_name", "size")})
    parts = distinct.map_batches(score, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["probe", "sim", "best_name"],
                            ascending=[True, False, True],
                            kind="mergesort") \
        .groupby("probe", as_index=False).first()
    return out.sort_values("probe", ignore_index=True)


@register("holt_winters_dow_daily", sql="""
WITH RECURSIVE
daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1),
bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS d FROM bounds),
g AS (SELECT spine.d, COALESCE(daily.y, 0.0) AS y,
             ROW_NUMBER() OVER (ORDER BY spine.d) - 1 AS i
      FROM spine LEFT JOIN daily USING (d)),
init AS (SELECT SUM(y) / 7.0 AS l0 FROM g WHERE i < 7),
w(i, d, l, b, s1, s2, s3, s4, s5, s6, s7, fc) AS (
  SELECT 6, MAX(CASE WHEN i = 6 THEN d END), MAX(l0),
         CAST(0 AS DOUBLE),
         MAX(CASE WHEN i = 0 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 1 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 2 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 3 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 4 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 5 THEN y END) - MAX(l0),
         MAX(CASE WHEN i = 6 THEN y END) - MAX(l0),
         CAST(0 AS DOUBLE)
  FROM g, init WHERE i < 7
  UNION ALL
  SELECT g.i, g.d,
         0.3 * (g.y - w.s1) + 0.7 * (w.l + w.b),
         0.2 * ((0.3 * (g.y - w.s1) + 0.7 * (w.l + w.b)) - w.l)
             + 0.8 * w.b,
         w.s2, w.s3, w.s4, w.s5, w.s6, w.s7,
         0.4 * (g.y - (0.3 * (g.y - w.s1) + 0.7 * (w.l + w.b)))
             + 0.6 * w.s1,
         w.l + w.b + w.s1
  FROM g JOIN w ON g.i = w.i + 1)
SELECT CAST(d AS BIGINT) AS epoch_day,
       ROUND(fc, 6) AS forecast, ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend
FROM w WHERE i >= 7 ORDER BY epoch_day""")
def holt_winters_dow_daily(sf_dir: str) -> pd.DataFrame:
    """Holt–Winters ADDITIVE triple exponential smoothing with weekly
    (period-7) seasonality over the zero-filled daily event volume —
    holt_linear_daily's seasonal big sibling, the standard short-term
    forecaster for strongly day-of-week-cyclic traffic (α=0.3, β=0.2,
    γ=0.4; l₀ = mean of week 1, b₀ = 0, s_i = y_i − l₀). The daily
    series is gap-filled on the observed [min, max] day spine (a
    recursion over a series with silent days skipped would misalign
    the seasonal queue). Scale shape: ONE distributed daily reduce,
    then the inherently-sequential recursion replays driver-side in
    the recursive CTE's float expression order — y is integer-valued
    (counts) so the week-1 mean's summation order cannot differ, and
    every later operand is bit-identical, making all three smoothed
    components oracle-checkable at 6 dp. The seasonal state rides as
    an explicit 7-slot rotating queue in BOTH engines (columns
    s1..s7 in the CTE, a deque in numpy). Under 8 observed days →
    empty result on both sides."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    if not len(daily):
        return pd.DataFrame(
            {"epoch_day": pd.Series([], dtype=np.int64),
             "forecast": pd.Series([], dtype=np.float64),
             "level": pd.Series([], dtype=np.float64),
             "trend": pd.Series([], dtype=np.float64)})
    spine = np.arange(int(daily["d"].iloc[0]),
                      int(daily["d"].iloc[-1]) + 1, dtype=np.int64)
    y = np.zeros(len(spine), np.float64)
    y[np.searchsorted(spine, daily["d"].to_numpy(np.int64))] = \
        daily["y"].to_numpy(np.float64)
    if len(y) < 8:
        return pd.DataFrame(
            {"epoch_day": pd.Series([], dtype=np.int64),
             "forecast": pd.Series([], dtype=np.float64),
             "level": pd.Series([], dtype=np.float64),
             "trend": pd.Series([], dtype=np.float64)})
    l0 = float(y[:7].sum()) / 7.0
    l, b = l0, 0.0
    s = [float(y[i]) - l0 for i in range(7)]
    rows = []
    for i in range(7, len(y)):
        yi = float(y[i])
        s1 = s[0]
        fc = l + b + s1
        l_new = 0.3 * (yi - s1) + 0.7 * (l + b)
        b_new = 0.2 * ((0.3 * (yi - s1) + 0.7 * (l + b)) - l) \
            + 0.8 * b
        s_new = 0.4 * (yi - (0.3 * (yi - s1) + 0.7 * (l + b))) \
            + 0.6 * s1
        s = s[1:] + [s_new]
        l, b = l_new, b_new
        rows.append((int(spine[i]), fc, l, b))
    r6 = textstats.round_half_away
    out = pd.DataFrame(rows, columns=["epoch_day", "forecast",
                                      "level", "trend"])
    for c in ("forecast", "level", "trend"):
        out[c] = r6(out[c].to_numpy(np.float64), 6)
    out["epoch_day"] = out["epoch_day"].astype(np.int64)
    return out


@register("session_business_hours_overlap", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, epoch_us(MIN(ts)) AS a, epoch_us(MAX(ts)) AS b
      FROM sid GROUP BY user_id, sid),
g AS (SELECT (a // 86400000000 + 4) % 7 AS dow, b - a AS dur,
             (28800000000 * (b // 86400000000)
              + LEAST(GREATEST(b % 86400000000 - 32400000000, 0),
                      28800000000))
             - (28800000000 * (a // 86400000000)
                + LEAST(GREATEST(a % 86400000000 - 32400000000, 0),
                        28800000000)) AS biz
      FROM s)
SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(dur) AS BIGINT) AS total_us,
       CAST(SUM(biz) AS BIGINT) AS business_us
FROM g GROUP BY 1 ORDER BY 1""")
def session_business_hours_overlap(sf_dir: str) -> pd.DataFrame:
    """Interval-overlap aggregate: how much of each session's span
    fell inside business hours (09:00–17:00 UTC daily), grouped by
    the session's start day-of-week — the windowed-overlap join
    pattern (sessions × a periodic calendar) WITHOUT materializing
    calendar windows or expanding per-day rows. The trick is the
    closed-form prefix function f(t) = 8h·floor(t/1d) +
    clip(tod(t) − 9h, 0, 8h) = business-microseconds before t, so a
    session [a, b] overlaps exactly f(b) − f(a) — one vectorized
    integer expression per interval, identical in SQL, exact to the
    microsecond, valid across any number of midnights. Zero shuffle
    beyond the session reduce; only 7 (dow, sums) partials per block
    leave the cluster."""
    sess = _sessionized_events(sf_dir)
    iv = reduce_sink(sess, ["user_id", "sid"],
                     {"st": ("ts", "min"), "en": ("ts", "max")})
    day_us = 86_400_000_000
    h8, h9 = 28_800_000_000, 32_400_000_000

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        a = df["st"].to_numpy("datetime64[us]").astype(np.int64)
        b = df["en"].to_numpy("datetime64[us]").astype(np.int64)

        def f(t):
            return h8 * (t // day_us) + np.clip(
                t % day_us - h9, 0, h8)

        part = pd.DataFrame({
            "dow": ((a // day_us + 4) % 7).astype(np.int64),
            "sessions": np.ones(len(a), np.int64),
            "total_us": b - a,
            "business_us": f(b) - f(a)})
        return part.groupby("dow", as_index=False).sum()

    out = reduce_sink(
        iv.map_batches(overlap, batch_format="pandas"),
        ["dow"], {"sessions": ("sessions", "sum"),
                  "total_us": ("total_us", "sum"),
                  "business_us": ("business_us", "sum")}).to_pandas()
    return out.sort_values("dow", ignore_index=True)


@register("mann_whitney_view_purchase", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
           FROM events WHERE event_type IN ('view', 'purchase')),
h AS (SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(g2) AS BIGINT) AS c2
      FROM c GROUP BY 1),
cum AS (SELECT cents, c1, c2,
               CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS f2
        FROM h),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 + c2) AS BIGINT) AS n FROM h),
u AS (SELECT CAST(SUM(CAST(c1 AS HUGEINT) * (2 * (f2 - c2) + c2))
              AS HUGEINT) AS u2 FROM cum),
tie AS (SELECT CAST(SUM(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2)
                        - (c1 + c2)) AS HUGEINT) AS t3 FROM h)
SELECT n1, n2, CAST(u2 AS BIGINT) AS u2,
       CASE WHEN (n + 1) - CAST(t3 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) = 0.0 THEN 0.0
            ELSE ROUND((CAST(u2 AS DOUBLE) / 2
                        - CAST(n1 AS DOUBLE) * n2 / 2)
                       / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                              * ((n + 1) - CAST(t3 AS DOUBLE)
                                 / (CAST(n AS DOUBLE) * (n - 1)))), 6)
       END AS z,
       ROUND(1.0 - CAST(u2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2), 6) AS r_rb
FROM t, u, tie""")
def mann_whitney_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the view and
    purchase value distributions, with the rank-biserial effect size
    — the nonparametric location test that completes the KS/CvM/
    Welch family. U₁ = #{(x, y): x > y} + ½#{x = y} comes exactly off
    the shared cents histogram as a DOUBLED integer: 2U₁ =
    Σ_v c1_v·(2·F2_before(v) + c2_v) (ties contribute their half
    pairs without any .5 existing), accumulated 128-bit on both
    engines. The normal-approximation z uses the tie-corrected
    variance n1·n2/12·((N+1) − Σ(t³−t)/(N(N−1))) and r_rb = 1 −
    2U/(n1n2), each a single identical float expression from exact
    integers (no continuity correction, documented convention);
    all-tied input short-circuits z to 0 on both sides."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        is_v = (df["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "g1": is_v.astype(np.int64),
            "g2": (~is_v).astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("g1", "sum"), "c2": ("g2", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64)
    c2 = h["c2"].to_numpy(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    n = n1 + n2
    f2b = c2.cumsum() - c2          # exclusive other-sample CDF
    u2 = sum(int(a) * (2 * int(fb) + int(b))
             for a, b, fb in zip(c1, c2, f2b))
    t3 = sum(int(a + b) ** 3 - int(a + b) for a, b in zip(c1, c2))
    r6 = textstats.round_half_away
    tf = (n + 1) - float(t3) / (float(n) * (n - 1))
    if tf == 0.0:
        z = 0.0
    else:
        z = r6((float(u2) / 2 - float(n1) * n2 / 2)
               / np.sqrt(float(n1) * n2 / 12.0 * tf), 6)
    r_rb = r6(1.0 - float(u2) / (float(n1) * n2), 6)
    return pd.DataFrame({"n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "u2": np.array([u2], np.int64),
                         "z": [float(z)], "r_rb": [float(r_rb)]})


@register("boxplot_stats_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM hh),
q AS (SELECT g, MIN(n) AS n,
             MIN(CASE WHEN 4 * cm >= n THEN c END) AS q1,
             MIN(CASE WHEN 2 * cm >= n THEN c END) AS q2,
             MIN(CASE WHEN 4 * cm >= 3 * n THEN c END) AS q3
      FROM cum GROUP BY g),
f AS (SELECT g, n, q1, q2, q3, q3 - q1 AS iqr,
             2 * q1 - 3 * (q3 - q1) AS lo2,
             2 * q3 + 3 * (q3 - q1) AS hi2 FROM q)
SELECT f.g AS event_type, f.n, f.q1, f.q2, f.q3, f.iqr,
       CAST(SUM(CASE WHEN 2 * hh.c < f.lo2 OR 2 * hh.c > f.hi2
                     THEN hh.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MIN(CASE WHEN 2 * hh.c >= f.lo2 THEN hh.c END)
            AS BIGINT) AS whisker_lo,
       CAST(MAX(CASE WHEN 2 * hh.c <= f.hi2 THEN hh.c END)
            AS BIGINT) AS whisker_hi
FROM hh JOIN f ON hh.g = f.g
GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1""")
def boxplot_stats_by_type(sf_dir: str) -> pd.DataFrame:
    """Tukey boxplot statistics per event type — quartiles, IQR,
    1.5·IQR fences, whisker endpoints (most extreme values INSIDE the
    fences) and outlier counts, i.e. everything a box-and-whisker
    render needs, computed exactly. Quantiles use the lower
    (ceil(p·n)-th order statistic) convention via the integer
    half/quarter-total tests 4·cum ≥ n / 2·cum ≥ n / 4·cum ≥ 3n over
    the per-type cents histogram (the same lossless reduce as the
    median/mode family — no interpolated float quantile exists to
    disagree), and the 1.5·IQR fences are DOUBLED integers (2q₁ −
    3·IQR, 2q₃ + 3·IQR) compared against 2c, so fence membership is
    pure integer arithmetic on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["g", "c"], ignore_index=True)
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        cm = np.cumsum(cnt)
        q1 = int(c[np.searchsorted(4 * cm, n, side="left")])
        q2 = int(c[np.searchsorted(2 * cm, n, side="left")])
        q3 = int(c[np.searchsorted(4 * cm, 3 * n, side="left")])
        iqr = q3 - q1
        lo2, hi2 = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr
        out_mask = (2 * c < lo2) | (2 * c > hi2)
        n_out = int(cnt[out_mask].sum())
        inside_lo = c[2 * c >= lo2]
        inside_hi = c[2 * c <= hi2]
        rows.append((g, n, q1, q2, q3, iqr, n_out,
                     int(inside_lo.min()), int(inside_hi.max())))
    out = pd.DataFrame(rows, columns=[
        "event_type", "n", "q1", "q2", "q3", "iqr", "n_outliers",
        "whisker_lo", "whisker_hi"])
    for col in out.columns[1:]:
        out[col] = out[col].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


@register("proportional_seat_allocation", sql="""
WITH t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM t),
a AS (SELECT event_type, cnt,
             CAST((10000 * cnt) // tot AS BIGINT) AS fl,
             CAST((10000 * cnt) % tot AS BIGINT) AS rem
      FROM t, s),
k AS (SELECT CAST(10000 - SUM(fl) AS BIGINT) AS extra FROM a),
r AS (SELECT event_type, cnt, fl, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rn
      FROM a)
SELECT event_type, cnt,
       CAST(fl + CASE WHEN rn <= k.extra THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM r, k ORDER BY event_type""")
def proportional_seat_allocation(sf_dir: str) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment: split a budget of
    10 000 'seats' (sampling slots, rate-limit shares, shard quotas)
    across event types proportionally to their counts so the seats sum
    EXACTLY to the budget — the integer-allocation operator behind
    quota sampling and mixture rebalancing that naive rounding
    breaks. Pure integer arithmetic end to end: floor share =
    B·cnt // N, the B − Σfloor leftover seats go to the largest
    remainders (B·cnt mod N) with type-name tiebreak — both engines
    rank the identical integer pairs. One type-count reduce is the
    only distributed work."""
    t = reduce_sink(
        _events(sf_dir, ["event_type"]),
        ["event_type"], {"cnt": ("event_type", "size")}).to_pandas() \
        .sort_values("event_type", ignore_index=True)
    budget = 10_000
    cnt = t["cnt"].to_numpy(np.int64)
    tot = int(cnt.sum())
    fl = (budget * cnt) // tot
    rem = (budget * cnt) % tot
    extra = budget - int(fl.sum())
    order = np.lexsort((t["event_type"].to_numpy(), -rem))
    seats = fl.copy()
    seats[order[:extra]] += 1
    out = pd.DataFrame({"event_type": t["event_type"],
                        "cnt": cnt.astype(np.int64),
                        "seats": seats.astype(np.int64)})
    return out.sort_values("event_type", ignore_index=True)


_HIT_STEPS = 12
_HIT_SQL_BASE = """
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
t AS (SELECT prev AS f, event_type AS tt, CAST(COUNT(*) AS DOUBLE) AS c
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT f, SUM(c) AS tot FROM t GROUP BY f),
p1 AS (SELECT t.f, t.tt, t.c / rt.tot AS p FROM t JOIN rt USING (f)),
h0 AS (SELECT f AS type, CAST(0 AS DOUBLE) AS h FROM rt)"""
_HIT_SQL_STEP = """,
h{k} AS (SELECT p.f AS type,
              CASE WHEN p.f = 'purchase' THEN CAST(0 AS DOUBLE)
                   ELSE 1.0 + SUM(p.p * COALESCE(h.h, 0.0)) END AS h
         FROM p1 p LEFT JOIN h{prev} h ON p.tt = h.type
         GROUP BY p.f)"""
_HIT_SQL = _HIT_SQL_BASE + "".join(
    _HIT_SQL_STEP.format(k=k, prev=k - 1)
    for k in range(1, _HIT_STEPS + 1)) + f"""
SELECT type AS event_type, ROUND(h, 6) AS exp_steps
FROM h{_HIT_STEPS} ORDER BY event_type"""


@register("markov_hitting_time_purchase", sql=_HIT_SQL)
def markov_hitting_time_purchase(sf_dir: str) -> pd.DataFrame:
    """Expected number of steps from each event type to the next
    'purchase' under the observed transition chain, truncated at 12
    value-iteration sweeps (h ← 1 + P·h with h(purchase) ≡ 0 — the
    truncated Neumann series of the absorbing-chain hitting time,
    so the statistic is well-defined and finite even when some state
    can't reach purchase). Deterministic state convention shared with
    the oracle: target types that are never a SOURCE contribute 0
    (COALESCE — they have no observed dynamics to continue through).
    The heavy work is the same per-user transition reduce as the
    stationary query; the 12 sweeps run driver-side on the |types|²
    matrix while the oracle walks 12 chained CTEs — identical
    association order, so both float paths agree to the 6-dp guard."""
    t = event_transitions(sf_dir)
    sources = sorted(t["from_type"].unique())
    tot = t.groupby("from_type")["cnt"].sum()
    h = {s: 0.0 for s in sources}
    pr = {(r.from_type, r.to_type): r.cnt / float(tot[r.from_type])
          for r in t.itertuples()}
    for _ in range(_HIT_STEPS):
        nh = {}
        for s in sources:
            if s == "purchase":
                nh[s] = 0.0
                continue
            acc = 0.0
            for (f, tt), p in sorted(pr.items()):
                if f == s:
                    acc += p * h.get(tt, 0.0)
            nh[s] = 1.0 + acc
        h = nh
    r6 = textstats.round_half_away
    out = pd.DataFrame({"event_type": sources,
                        "exp_steps": [float(r6(h[s], 6))
                                      for s in sources]})
    return out.sort_values("event_type", ignore_index=True)


@register("pettitt_change_day", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
u AS (SELECT t.d AS t,
             CAST(SUM(SIGN(a.y - b.y)) AS BIGINT) AS u_t
      FROM daily t JOIN daily a ON a.d <= t.d
                   JOIN daily b ON b.d > t.d
      GROUP BY t.d),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_days FROM daily),
best AS (SELECT t, u_t, ABS(u_t) AS k,
                ROW_NUMBER() OVER (ORDER BY ABS(u_t) DESC, t) AS rn
         FROM u)
SELECT CAST(t AS BIGINT) AS change_day, u_t, CAST(k AS BIGINT) AS k,
       ROUND(LEAST(1.0, 2.0 * EXP(-6.0 * k * k
             / (CAST(t_days AS DOUBLE) * t_days * t_days
                + CAST(t_days AS DOUBLE) * t_days))), 6) AS p_approx
FROM best, n WHERE rn = 1""")
def pettitt_change_day(sf_dir: str) -> pd.DataFrame:
    """Pettitt change-point test on the daily event volume — the
    rank-based (Mann-Whitney-family) single change-point detector,
    CUSUM's nonparametric sibling: U_t = Σ_{i≤t}Σ_{j>t} sgn(y_i−y_j)
    over the observed-day series, the split maximizing |U_t| is the
    change point (first day on ties, both engines rank the identical
    integers), and the classic approximation p ≈ 2·exp(−6K²/(T³+T²))
    is one shared float expression. ONE distributed daily reduce
    bounds the data at O(days); the O(T²) sign matrix runs
    driver-side in numpy on integers (the oracle spells the same sums
    as a triple self-join). Observed days only — a silent day is not
    a zero observation in a rank test (documented convention)."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    y = daily["y"].to_numpy(np.int64)
    t_days = len(y)
    if t_days < 2:
        return pd.DataFrame(
            {"change_day": pd.Series([], dtype=np.int64),
             "u_t": pd.Series([], dtype=np.int64),
             "k": pd.Series([], dtype=np.int64),
             "p_approx": pd.Series([], dtype=np.float64)})
    sgn = np.sign(y[:, None] - y[None, :]).astype(np.int64)
    # U_t = Σ_{i<=t} Σ_{j>t} sgn(y_i − y_j): direct masked sums over
    # the tiny T×T integer matrix (T = observed days)
    u = np.array([int(sgn[:t + 1, t + 1:].sum())
                  for t in range(t_days - 1)], np.int64)
    k = np.abs(u)
    i = int(np.lexsort((daily["d"].to_numpy()[:-1], -k))[0])
    kk = int(k[i])
    p = textstats.round_half_away(
        min(1.0, 2.0 * np.exp(-6.0 * kk * kk
                              / (float(t_days) * t_days * t_days
                                 + float(t_days) * t_days))), 6)
    return pd.DataFrame({
        "change_day": np.array([int(daily["d"].iloc[i])], np.int64),
        "u_t": np.array([int(u[i])], np.int64),
        "k": np.array([kk], np.int64),
        "p_approx": [float(p)]})


@register("cochran_armitage_purchase_by_hour", sql="""
WITH b AS (SELECT CAST(hour(ts) AS BIGINT) AS w,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS s
           FROM events),
g AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(s) AS BIGINT) AS s_i
      FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(s_i) AS BIGINT) AS n1,
             CAST(SUM(w * n_i) AS BIGINT) AS w1,
             CAST(SUM(w * w * n_i) AS BIGINT) AS w2,
             CAST(SUM(w * s_i) AS BIGINT) AS traw FROM g),
i AS (SELECT n, n1,
             CAST(n AS HUGEINT) * traw - CAST(n1 AS HUGEINT) * w1 AS a,
             CAST(n AS HUGEINT) * w2 - CAST(w1 AS HUGEINT) * w1 AS bb
      FROM t)
SELECT n, n1, CAST(a AS BIGINT) AS a, CAST(bb AS BIGINT) AS b,
       CASE WHEN a = 0 OR bb = 0 OR n1 = 0 OR n1 = n THEN 0.0
            ELSE ROUND(CAST(a AS DOUBLE)
                       / sqrt(CAST(n1 AS DOUBLE) * (n - n1)
                              * CAST(bb AS DOUBLE) / (n - 1)), 6)
       END AS z
FROM i""")
def cochran_armitage_purchase_by_hour(sf_dir: str) -> pd.DataFrame:
    """Cochran–Armitage trend test: does the purchase PROPORTION rise
    or fall monotonically across the ordered hours of day? (The
    dose-response test — chi-square sees any deviation, CA targets the
    ordered trend with scores w = 0..23.) The entire statistic closes
    from FOUR integer moments of one (hour, count, successes) reduce:
    A = N·Σw·s_i − N1·Σw·n_i and B = N·Σw²n_i − (Σw n_i)² are exact
    (HUGEINT/Python-int), z = A/√(N1(N−N1)B/(N−1)) is one shared
    float expression, degenerate inputs (no / all purchases, constant
    hour) short-circuit to 0 on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "w": df["ts"].dt.hour.to_numpy(np.int64),
            "s": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["w"], {"n_i": ("s", "size"), "s_i": ("s", "sum")}) \
        .to_pandas().sort_values("w", ignore_index=True)
    w = g["w"].to_numpy(np.int64)
    n_i = g["n_i"].to_numpy(np.int64)
    s_i = g["s_i"].to_numpy(np.int64)
    n, n1 = int(n_i.sum()), int(s_i.sum())
    w1 = int((w * n_i).sum())
    w2 = int((w * w * n_i).sum())
    traw = int((w * s_i).sum())
    a = n * traw - n1 * w1
    b = n * w2 - w1 * w1
    r6 = textstats.round_half_away
    if a == 0 or b == 0 or n1 == 0 or n1 == n:
        z = 0.0
    else:
        z = r6(float(a) / np.sqrt(float(n1) * (n - n1)
                                  * float(b) / (n - 1)), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "n1": np.array([n1], np.int64),
                         "a": np.array([a], np.int64),
                         "b": np.array([b], np.int64),
                         "z": [float(z)]})


@register("runs_test_daily", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
cum AS (SELECT d, y,
               CAST(SUM(1) OVER (ORDER BY y, d) AS BIGINT) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS t FROM daily),
med AS (SELECT MIN(y) AS m FROM cum WHERE 2 * r >= t),
sgn AS (SELECT d, CASE WHEN y > m THEN 1 ELSE -1 END AS s
        FROM daily, med WHERE y <> m),
runs AS (SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM sgn),
agg AS (SELECT CAST(SUM(CASE WHEN prev IS NULL OR s <> prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS r,
               CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM runs)
SELECT r, na, nb,
       CASE WHEN na = 0 OR nb = 0 THEN 0.0
            ELSE ROUND((r - (2.0 * na * nb / (na + nb) + 1))
                       / sqrt(2.0 * na * nb
                              * (2.0 * na * nb - na - nb)
                              / (CAST(na + nb AS DOUBLE) * (na + nb)
                                 * (na + nb - 1))), 6)
       END AS z
FROM agg""")
def runs_test_daily(sf_dir: str) -> pd.DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily volume
    around its median — too FEW runs means trending/clustered days,
    too many means oscillation; the classic 'is this series i.i.d.?'
    gate before trusting an i.i.d.-assuming test. Days dichotomize
    against the LOWER median (the 2·cum ≥ n order statistic — same
    integer convention as the boxplot family), median-equal days drop
    (the standard convention), runs count by day-ordered sign changes
    (pure integers), and z closes from (R, n_above, n_below) in one
    shared float expression with a one-sided-empty short-circuit.
    ONE daily reduce is the only distributed work."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    y = daily["y"].to_numpy(np.int64)
    t = len(y)
    ys = np.sort(y)
    m = int(ys[np.searchsorted(2 * np.arange(1, t + 1), t,
                               side="left")])
    keep = y != m
    s = np.where(y[keep] > m, 1, -1)
    na = int((s == 1).sum())
    nb = int((s == -1).sum())
    r = int(1 + (s[1:] != s[:-1]).sum()) if len(s) else 0
    r6 = textstats.round_half_away
    if na == 0 or nb == 0:
        z = 0.0
    else:
        z = r6((r - (2.0 * na * nb / (na + nb) + 1))
               / np.sqrt(2.0 * na * nb * (2.0 * na * nb - na - nb)
                         / (float(na + nb) * (na + nb)
                            * (na + nb - 1))), 6)
    return pd.DataFrame({"r": np.array([r], np.int64),
                         "na": np.array([na], np.int64),
                         "nb": np.array([nb], np.int64),
                         "z": [float(z)]})


@register("markov_entropy_rate", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
t AS (SELECT prev AS f, event_type AS tt, CAST(COUNT(*) AS DOUBLE) AS c
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT f, SUM(c) AS tot FROM t GROUP BY f),
p1 AS (SELECT t.f, t.tt, t.c / rt.tot AS p FROM t JOIN rt USING (f)),
p2 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p1 a JOIN p1 b ON a.tt = b.f GROUP BY 1, 2),
p4 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p2 a JOIN p2 b ON a.tt = b.f GROUP BY 1, 2),
p8 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
       FROM p4 a JOIN p4 b ON a.tt = b.f GROUP BY 1, 2),
p16 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
        FROM p8 a JOIN p8 b ON a.tt = b.f GROUP BY 1, 2),
p32 AS (SELECT a.f, b.tt, SUM(a.p * b.p) AS p
        FROM p16 a JOIN p16 b ON a.tt = b.f GROUP BY 1, 2),
ns AS (SELECT CAST(COUNT(DISTINCT f) AS DOUBLE) AS n FROM t),
pi AS (SELECT p32.tt AS type, SUM(p32.p / ns.n) AS pi
       FROM p32, ns GROUP BY 1),
ent AS (SELECT f, -SUM(p * LN(p)) AS hrow FROM p1 GROUP BY f)
SELECT ROUND(SUM(pi.pi * ent.hrow), 6) AS entropy_rate_nats
FROM pi JOIN ent ON ent.f = pi.type""")
def markov_entropy_rate(sf_dir: str) -> pd.DataFrame:
    """Entropy rate of the event-type Markov chain, H = −Σᵢ πᵢ Σⱼ
    Pᵢⱼ ln Pᵢⱼ nats/step — how unpredictable the NEXT event is given
    the current one (the sequence-compressibility number; the
    user_type_entropy query is the memoryless upper bound). Reuses
    the stationary machinery verbatim: π = uniform-start P³² mass
    (five squarings, same association order as the chained CTEs) and
    per-row transition entropies off the single per-user transition
    reduce; only source states carry dynamics, so target-only types
    join away identically on both engines."""
    t = event_transitions(sf_dir)
    sources = sorted(t["from_type"].unique())
    all_types = sorted(set(sources) | set(t["to_type"].unique()))
    piv = t.pivot_table(index="from_type", columns="to_type",
                        values="cnt", fill_value=0, aggfunc="sum") \
        .reindex(index=all_types, columns=all_types, fill_value=0)
    P = piv.to_numpy(np.float64)
    row = P.sum(axis=1, keepdims=True)
    P = np.divide(P, row, out=np.zeros_like(P), where=row > 0)
    M = P.copy()
    for _ in range(5):
        M = M @ M
    n = float(len(sources))
    pi = M.sum(axis=0) / n
    hrow = np.where(
        P > 0, -P * np.log(np.where(P > 0, P, 1.0)), 0.0).sum(axis=1)
    # only source rows have dynamics (zero rows contribute hrow 0 and
    # the oracle's ent join drops them — same mass either way)
    h = float((pi * hrow).sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({"entropy_rate_nats": [float(r6(h, 6))]})


@register("kendall_tau_daily", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
pairs AS (SELECT CAST(SUM(SIGN(a.v - b.v) * SIGN(a.p - b.p))
                      AS BIGINT) AS cd
          FROM daily a JOIN daily b ON a.d < b.d),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
tv AS (SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n1
       FROM (SELECT COUNT(*) AS c FROM daily GROUP BY v)),
tp AS (SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n2
       FROM (SELECT COUNT(*) AS c FROM daily GROUP BY p))
SELECT n, cd, n1, n2,
       CASE WHEN (n * (n - 1) / 2 - n1) * (n * (n - 1) / 2 - n2) = 0
            THEN 0.0
            ELSE ROUND(CAST(cd AS DOUBLE)
                       / sqrt(CAST(n * (n - 1) / 2 - n1 AS DOUBLE)
                              * (n * (n - 1) / 2 - n2)), 6)
       END AS tau_b
FROM t, pairs, tv, tp""")
def kendall_tau_daily(sf_dir: str) -> pd.DataFrame:
    """Kendall τ-b between the daily view and purchase volumes —
    Spearman's concordance-counting sibling (robust to any monotone
    rescaling, with the proper tie correction). ONE daily conditional
    reduce bounds everything at O(days); C − D = Σ_{i<j}
    sgn(Δv)·sgn(Δp) and both tie terms are exact integers off the
    tiny day table (numpy outer signs ≡ the oracle's triangular
    self-join), and τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) is one shared
    float expression with a constant-margin short-circuit."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "v": (et == "view").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)})

    daily = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"v": ("v", "sum"), "p": ("p", "sum")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    v = daily["v"].to_numpy(np.int64)
    p = daily["p"].to_numpy(np.int64)
    n = len(daily)
    sv = np.sign(v[:, None] - v[None, :])
    sp = np.sign(p[:, None] - p[None, :])
    iu = np.triu_indices(n, k=1)
    cd = int((sv[iu] * sp[iu]).sum())
    n1 = int(sum(c * (c - 1) // 2
                 for c in pd.Series(v).value_counts()))
    n2 = int(sum(c * (c - 1) // 2
                 for c in pd.Series(p).value_counts()))
    n0 = n * (n - 1) // 2
    r6 = textstats.round_half_away
    if (n0 - n1) * (n0 - n2) == 0:
        tau = 0.0
    else:
        tau = r6(float(cd) / np.sqrt(float(n0 - n1) * (n0 - n2)), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "cd": np.array([cd], np.int64),
                         "n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "tau_b": [float(tau)]})


@register("wilcoxon_signed_rank_daily", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
diff AS (SELECT v - p AS dd, ABS(v - p) AS ad FROM daily
         WHERE v <> p),
h AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS tc,
             CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM diff GROUP BY ad),
r AS (SELECT ad, tc, pos,
             CAST(2 * (SUM(tc) OVER (ORDER BY ad) - tc) + tc + 1
                  AS BIGINT) AS mr2
      FROM h),
agg AS (SELECT CAST(SUM(tc) AS BIGINT) AS n,
               CAST(SUM(pos * mr2) AS BIGINT) AS w2,
               CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS t3
        FROM r)
SELECT n, w2,
       CAST(2 * w2 - n * (n + 1) AS BIGINT) AS num,
       CAST(2 * n * (n + 1) * (2 * n + 1) - t3 AS BIGINT) AS var48,
       CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - t3 = 0 THEN 0.0
            ELSE ROUND((CAST(2 * w2 - n * (n + 1) AS DOUBLE) / 4)
                       / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - t3
                                   AS DOUBLE) / 48.0), 6)
       END AS z
FROM agg""")
def wilcoxon_signed_rank_daily(sf_dir: str) -> pd.DataFrame:
    """Wilcoxon signed-rank test on the PAIRED daily (views −
    purchases) differences — the nonparametric paired-t: are views
    systematically above purchases day by day? Zero differences drop
    (standard convention), |d| midranks come off the tiny difference
    histogram as DOUBLED integers (the same 2·cum + tc + 1 trick as
    Kruskal–Wallis), the doubled statistic W2 = Σ mr2·[d>0] stays
    integral, and z closes from the integer pair (num = 2W2 −
    n(n+1), var48 = 2n(n+1)(2n+1) − Σ(t³−t)) in one shared float
    expression (normal approximation with tie correction, no
    continuity correction — documented)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "v": (et == "view").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)})

    daily = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"v": ("v", "sum"), "p": ("p", "sum")}).to_pandas()
    dd = (daily["v"] - daily["p"]).to_numpy(np.int64)
    dd = dd[dd != 0]
    ad = np.abs(dd)
    h = pd.DataFrame({"ad": ad, "pos": (dd > 0).astype(np.int64)}) \
        .groupby("ad", sort=True).agg(tc=("pos", "size"),
                                      pos=("pos", "sum"))
    tc = h["tc"].to_numpy(np.int64)
    pos = h["pos"].to_numpy(np.int64)
    mr2 = 2 * (np.cumsum(tc) - tc) + tc + 1
    n = int(tc.sum())
    w2 = int((pos * mr2).sum())
    t3 = int(sum(int(t) ** 3 - int(t) for t in tc))
    num = 2 * w2 - n * (n + 1)
    var48 = 2 * n * (n + 1) * (2 * n + 1) - t3
    r6 = textstats.round_half_away
    z = 0.0 if var48 == 0 else r6(
        (float(num) / 4) / np.sqrt(float(var48) / 48.0), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "w2": np.array([w2], np.int64),
                         "num": np.array([num], np.int64),
                         "var48": np.array([var48], np.int64),
                         "z": [float(z)]})


@register("jensen_shannon_type_hours", sql="""
WITH h AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(SUM(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS BIGINT) AS cv,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS cp
           FROM events WHERE event_type IN ('view', 'purchase')
           GROUP BY 1),
t AS (SELECT CAST(SUM(cv) AS BIGINT) AS nv,
             CAST(SUM(cp) AS BIGINT) AS np FROM h),
pq AS (SELECT cv / CAST(nv AS DOUBLE) AS p,
              cp / CAST(np AS DOUBLE) AS q
       FROM h, t),
d AS (SELECT SUM(CASE WHEN p > 0
                      THEN 0.5 * p * LN(p / ((p + q) / 2))
                      ELSE 0.0 END
                 + CASE WHEN q > 0
                        THEN 0.5 * q * LN(q / ((p + q) / 2))
                        ELSE 0.0 END) AS jsd
      FROM pq)
SELECT ROUND(jsd, 6) AS jsd_nats FROM d""")
def jensen_shannon_type_hours(sf_dir: str) -> pd.DataFrame:
    """Jensen–Shannon divergence between the hour-of-day profiles of
    views and purchases — the symmetric, always-finite distribution
    distance (bounded by ln 2) that corpus-mix monitoring uses where
    KL blows up on empty cells. One 24-row conditional reduce is the
    only distributed work; both engines normalize with the identical
    division and evaluate the identical 0·ln 0 = 0 guarded
    expression over ≤24 terms, far inside the 6-dp round."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        return pd.DataFrame({
            "hr": df["ts"].dt.hour.to_numpy(np.int64),
            "cv": (df["event_type"] == "view")
            .to_numpy().astype(np.int64),
            "cp": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["hr"], {"cv": ("cv", "sum"), "cp": ("cp", "sum")}) \
        .to_pandas().sort_values("hr", ignore_index=True)
    cv = h["cv"].to_numpy(np.float64)
    cp = h["cp"].to_numpy(np.float64)
    p = cv / float(int(cv.sum()))
    q = cp / float(int(cp.sum()))
    m = (p + q) / 2
    terms = np.where(p > 0, 0.5 * p * np.log(
        np.where(p > 0, p, 1.0) / np.where(m > 0, m, 1.0)), 0.0) \
        + np.where(q > 0, 0.5 * q * np.log(
            np.where(q > 0, q, 1.0) / np.where(m > 0, m, 1.0)), 0.0)
    r6 = textstats.round_half_away
    return pd.DataFrame({"jsd_nats": [float(r6(float(terms.sum()),
                                               6))]})


@register("theil_index_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS x
           FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS xt FROM u),
s AS (SELECT SUM(CASE WHEN x > 0
                      THEN x * LN(x * CAST(n AS DOUBLE) / xt)
                      ELSE 0.0 END) AS sx
      FROM u, t)
SELECT n, xt, ROUND(sx / xt, 6) AS theil_t
FROM t, s""")
def theil_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Theil T inequality index of per-user total value — the
    Gini's information-theoretic sibling (0 = perfect equality, ln n
    = one user holds everything), decomposable across subgroups in a
    way Gini isn't. T = (1/X)·Σ xᵢ·ln(xᵢ·n/X) over the per-user
    cents reduce: the scalars (n, X) come from one tiny aggregate,
    then per-batch float partials Σ x·ln(x·n/X) accumulate with the
    broadcast scalars — identical term values on both engines, sum
    order differing only at ~1e-11 relative against the 6-dp guard.
    Non-positive users contribute 0 (the x·ln x limit)."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "x": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["user_id"], {"x": ("x", "sum")}).materialize()
    scal = per.map_batches(
        lambda df: pd.DataFrame({
            "n": [np.int64(len(df))],
            "xt": [np.int64(df["x"].sum())]}),
        batch_format="pandas").to_pandas()
    n, xt = int(scal["n"].sum()), int(scal["xt"].sum())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.float64)
        term = np.where(x > 0,
                        x * np.log(np.where(x > 0, x, 1.0)
                                   * float(n) / xt), 0.0)
        return pd.DataFrame({"sx": [float(term.sum())]})

    sx = float(per.map_batches(partial, batch_format="pandas")
               .to_pandas()["sx"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "xt": np.array([xt], np.int64),
                         "theil_t": [float(r6(sx / xt, 6))]})


@register("friedman_test_types_by_day", sql="""
WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type AS g,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT d FROM d0),
types AS (SELECT DISTINCT g FROM d0),
grid AS (SELECT days.d, types.g, COALESCE(d0.c, 0) AS c
         FROM days CROSS JOIN types
         LEFT JOIN d0 ON d0.d = days.d AND d0.g = types.g),
r AS (SELECT d, g,
             CAST(2 * RANK() OVER (PARTITION BY d ORDER BY c) - 1
                  + COUNT(*) OVER (PARTITION BY d, c) AS BIGINT) AS r2
      FROM grid),
agg AS (SELECT g, CAST(SUM(r2) AS BIGINT) AS rj FROM r GROUP BY g),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM days),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk FROM types),
den AS (SELECT CAST(SUM(r2 * r2) AS BIGINT) AS s2 FROM r),
num AS (SELECT CAST(SUM((rj - tt * (kk + 1))
                        * (rj - tt * (kk + 1))) AS BIGINT) AS nm
        FROM agg, t, k)
SELECT tt AS n_days, kk AS n_types, nm, s2,
       CASE WHEN s2 - tt * kk * (kk + 1) * (kk + 1) = 0 THEN 0.0
            ELSE ROUND(CAST((kk - 1) * nm AS DOUBLE)
                       / (s2 - tt * kk * (kk + 1) * (kk + 1)), 6)
       END AS chi2
FROM t, k, num, den""")
def friedman_test_types_by_day(sf_dir: str) -> pd.DataFrame:
    """Friedman test — the within-block rank ANOVA: do the event
    types keep the same volume ORDERING day after day, or does the
    daily ranking shuffle? Each day is a block; the k type-counts
    (zero-filled — an absent type ranks lowest, which is the point)
    rank within their day as DOUBLED midrank integers (2·rank_min − 1
    + tie_count), so the tie-general statistic χ² = (k−1)·Σ(R2ⱼ −
    T(k+1))² / (Σr2² − Tk(k+1)²) is a ratio of EXACT integers with
    one shared division; an all-tied grid short-circuits to 0. One
    (day, type) reduce bounds the distributed work at O(days·k)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str)})

    d0 = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "g"], {"c": ("d", "size")}).to_pandas()
    days = np.sort(d0["d"].unique())
    types = np.sort(d0["g"].unique())
    grid = d0.pivot_table(index="d", columns="g", values="c",
                          fill_value=0, aggfunc="sum") \
        .reindex(index=days, columns=types, fill_value=0) \
        .to_numpy(np.int64)
    tt, kk = len(days), len(types)
    # doubled midranks per day: 2*rank_min - 1 + tie_count
    order = np.argsort(grid, axis=1, kind="stable")
    r2 = np.empty_like(grid)
    for ti in range(tt):                     # tiny T×k loop
        row = grid[ti]
        for j in range(kk):
            smaller = int((row < row[j]).sum())
            tie = int((row == row[j]).sum())
            r2[ti, j] = 2 * smaller + 1 + tie
    _ = order
    rj = r2.sum(axis=0).astype(np.int64)
    s2 = int((r2.astype(np.int64) ** 2).sum())
    nm = int(((rj - tt * (kk + 1)) ** 2).sum())
    den = s2 - tt * kk * (kk + 1) * (kk + 1)
    r6 = textstats.round_half_away
    chi2 = 0.0 if den == 0 else r6(float((kk - 1) * nm) / den, 6)
    return pd.DataFrame({"n_days": np.array([tt], np.int64),
                         "n_types": np.array([kk], np.int64),
                         "nm": np.array([nm], np.int64),
                         "s2": np.array([s2], np.int64),
                         "chi2": [float(chi2)]})


@register("cohen_kappa_period_modal_type", sql="""
WITH b AS (SELECT user_id, event_type AS g,
                  epoch_us(ts) // 86400000000 AS d FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
pc AS (SELECT user_id, CASE WHEN d < cut THEN 0 ELSE 1 END AS per, g,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM b, sp GROUP BY 1, 2, 3),
m AS (SELECT user_id, per, g,
             ROW_NUMBER() OVER (PARTITION BY user_id, per
                                ORDER BY c DESC, g) AS rn
      FROM pc),
modal AS (SELECT user_id, per, g FROM m WHERE rn = 1),
paired AS (SELECT a.user_id, a.g AS g1, b2.g AS g2
           FROM modal a JOIN modal b2 ON a.user_id = b2.user_id
           WHERE a.per = 0 AND b2.per = 1),
conf AS (SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS c
         FROM paired GROUP BY 1, 2),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN g1 = g2 THEN c ELSE 0 END)
                  AS BIGINT) AS agree FROM conf),
marg AS (SELECT CAST(SUM(r.rc * col.cc) AS BIGINT) AS pe_num
         FROM (SELECT g1, SUM(c) AS rc FROM conf GROUP BY 1) r
         JOIN (SELECT g2, SUM(c) AS cc FROM conf GROUP BY 1) col
           ON r.g1 = col.g2)
SELECT n, agree, pe_num,
       CASE WHEN n * n - pe_num = 0 THEN 1.0
            ELSE ROUND(CAST(n * agree - pe_num AS DOUBLE)
                       / (n * n - pe_num), 6)
       END AS kappa
FROM t, marg""")
def cohen_kappa_period_modal_type(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa between each user's MODAL event type in the
    first and second half of the date range — chance-corrected
    behavioral consistency ('do users keep their dominant behavior?'),
    the agreement statistic with the marginal-frequency correction a
    raw match-rate lacks. Modal types break ties by smallest name
    (round-free integer argmax on both engines); only users active in
    BOTH halves pair up; kappa = (N·Σdiag − Σrᵢcᵢ)/(N² − Σrᵢcᵢ) is a
    ratio of exact integers with one shared division (degenerate
    all-one-cell margins → 1.0). Scale shape: the (user, period,
    type) reduce and per-user-bucket argmax keep everything
    partitioned by user; only the k×k confusion partials shuffle."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str)})

    base = _events(sf_dir, ["ts", "user_id", "event_type"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def with_per(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "per": (df["d"] >= cut).astype(np.int64),
            "g": df["g"]})

    pc = reduce_sink(base.map_batches(with_per, batch_format="pandas"),
                     ["user_id", "per", "g"], {"c": ("per", "size")})

    def modal(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "per", "c", "g"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        return df.groupby(["user_id", "per"], as_index=False).first() \
            [["user_id", "per", "g"]]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def pair_conf(g: pd.DataFrame) -> pd.DataFrame:
        m = modal(g.drop(columns=["bucket_"]))
        p0 = m[m["per"] == 0][["user_id", "g"]].rename(
            columns={"g": "g1"})
        p1 = m[m["per"] == 1][["user_id", "g"]].rename(
            columns={"g": "g2"})
        j = p0.merge(p1, on="user_id")
        out = j.groupby(["g1", "g2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out

    conf = reduce_sink(
        pc.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(pair_conf,
                                       batch_format="pandas"),
        ["g1", "g2"], {"c": ("c", "sum")}).to_pandas()
    n = int(conf["c"].sum())
    agree = int(conf[conf["g1"] == conf["g2"]]["c"].sum())
    rmarg = conf.groupby("g1")["c"].sum()
    cmarg = conf.groupby("g2")["c"].sum()
    pe_num = int(sum(int(rmarg.get(g, 0)) * int(cmarg.get(g, 0))
                     for g in set(rmarg.index) | set(cmarg.index)))
    r6 = textstats.round_half_away
    kappa = 1.0 if n * n - pe_num == 0 else \
        r6(float(n * agree - pe_num) / (n * n - pe_num), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "agree": np.array([agree], np.int64),
                         "pe_num": np.array([pe_num], np.int64),
                         "kappa": [float(kappa)]})


@register("mcnemar_purchase_periods", sql="""
WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS s
           FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
u AS (SELECT user_id,
             CAST(MAX(CASE WHEN d < cut THEN s ELSE 0 END)
                  AS BIGINT) AS p1,
             CAST(MAX(CASE WHEN d >= cut THEN s ELSE 0 END)
                  AS BIGINT) AS p2
      FROM b, sp GROUP BY user_id),
cells AS (SELECT CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0
                          END) AS BIGINT) AS b10,
                 CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0
                          END) AS BIGINT) AS c01,
                 CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0
                          END) AS BIGINT) AS a11,
                 CAST(SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0
                          END) AS BIGINT) AS d00
          FROM u)
SELECT a11, b10, c01, d00,
       CASE WHEN b10 + c01 = 0 THEN 0.0
            ELSE ROUND(CAST((b10 - c01) * (b10 - c01) AS DOUBLE)
                       / (b10 + c01), 6)
       END AS chi2
FROM cells""")
def mcnemar_purchase_periods(sf_dir: str) -> pd.DataFrame:
    """McNemar's test on paired per-user purchase indicators between
    the two halves of the date range — did the purchasing POPULATION
    shift (conversions gained vs lost), the within-subject test a
    two-sample proportion z gets wrong because the halves share
    users. One per-user reduce (MAX of the purchase flag per period —
    partials combine exactly), the 2×2 concordance cells are
    integers, and χ² = (b−c)²/(b+c) (no continuity correction,
    documented) is one shared division with a b+c=0 short-circuit."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64),
            "s": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    base = _events(sf_dir, ["ts", "user_id", "event_type"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "p1": np.where(df["d"] < cut, df["s"], 0),
            "p2": np.where(df["d"] >= cut, df["s"], 0)})

    u = reduce_sink(base.map_batches(flags, batch_format="pandas"),
                    ["user_id"], {"p1": ("p1", "max"),
                                  "p2": ("p2", "max")})

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        p1 = df["p1"].to_numpy(np.int64)
        p2 = df["p2"].to_numpy(np.int64)
        return pd.DataFrame({
            "a11": [np.int64(((p1 == 1) & (p2 == 1)).sum())],
            "b10": [np.int64(((p1 == 1) & (p2 == 0)).sum())],
            "c01": [np.int64(((p1 == 0) & (p2 == 1)).sum())],
            "d00": [np.int64(((p1 == 0) & (p2 == 0)).sum())]})

    c = u.map_batches(cells, batch_format="pandas").to_pandas().sum()
    a11, b10 = int(c["a11"]), int(c["b10"])
    c01, d00 = int(c["c01"]), int(c["d00"])
    r6 = textstats.round_half_away
    chi2 = 0.0 if b10 + c01 == 0 else \
        r6(float((b10 - c01) * (b10 - c01)) / (b10 + c01), 6)
    return pd.DataFrame({"a11": np.array([a11], np.int64),
                         "b10": np.array([b10], np.int64),
                         "c01": np.array([c01], np.int64),
                         "d00": np.array([d00], np.int64),
                         "chi2": [float(chi2)]})


@register("daily_period_power", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS d FROM b),
g AS (SELECT spine.d - (SELECT mn FROM b) AS t,
             COALESCE(daily.y, 0) AS y
      FROM spine LEFT JOIN daily ON daily.d = spine.d),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(y AS DOUBLE)) AS sy FROM g),
per AS (SELECT UNNEST(generate_series(2, 14)) AS p),
dft AS (SELECT per.p,
               SUM((y - m.sy / m.n)
                   * COS(2 * PI() * g.t / per.p)) AS c,
               SUM((y - m.sy / m.n)
                   * SIN(2 * PI() * g.t / per.p)) AS s
        FROM g, m, per GROUP BY per.p, m.n)
SELECT CAST(p AS BIGINT) AS period_days,
       ROUND((c * c + s * s) / ((SELECT n FROM m)
                                * CAST((SELECT n FROM m) AS DOUBLE)),
             6) AS power
FROM dft ORDER BY 1""")
def daily_period_power(sf_dir: str) -> pd.DataFrame:
    """Oracle-backed periodogram: spectral power of the mean-detrended
    daily volume at candidate periods 2–14 days (the Goertzel-style
    explicit DFT — event_periodicity's rFFT finds the same peaks but
    can't be SQL-checked; this one can, and the weekly cycle shows as
    the period-7 spike). One daily reduce; the zero-filled spine,
    the shared per-term cos/sin operands (2·π·t/p evaluated in the
    identical order, both libm), and power = (C² + S²)/T² close
    driver-side; ≤ 13·T float terms, far inside the 6-dp round."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].iloc[0]), int(daily["d"].iloc[-1])
    y = np.zeros(hi - lo + 1, np.float64)
    y[daily["d"].to_numpy(np.int64) - lo] = \
        daily["y"].to_numpy(np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    x = y - float(y.sum()) / n
    r6 = textstats.round_half_away
    rows = []
    for p in range(2, 15):
        c = float((x * np.cos(2 * np.pi * t / p)).sum())
        s = float((x * np.sin(2 * np.pi * t / p)).sum())
        rows.append((p, float(r6((c * c + s * s)
                                 / (n * float(n)), 6))))
    return pd.DataFrame(rows, columns=["period_days", "power"]) \
        .astype({"period_days": np.int64})


@register("pot_exceedance_clusters", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
r AS (SELECT d, y,
             CAST(SUM(1) OVER (ORDER BY y, d) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n FROM daily),
thr AS (SELECT MIN(y) AS t FROM r WHERE 10 * rk >= 9 * n),
ex AS (SELECT d, y,
              d - ROW_NUMBER() OVER (ORDER BY d) AS island
       FROM daily, thr WHERE y > t),
cl AS (SELECT island, CAST(COUNT(*) AS BIGINT) AS len,
              CAST(SUM(y) AS BIGINT) AS tot,
              CAST(MIN(d) AS BIGINT) AS start_d
       FROM ex GROUP BY island),
best AS (SELECT len, tot, start_d,
                ROW_NUMBER() OVER (ORDER BY tot DESC, start_d) AS rn
         FROM cl)
SELECT (SELECT CAST(t AS BIGINT) FROM thr) AS threshold,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exceed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cl) AS n_clusters,
       (SELECT CAST(MAX(len) AS BIGINT) FROM cl) AS max_run_len,
       (SELECT tot FROM best WHERE rn = 1) AS best_cluster_sum,
       (SELECT start_d FROM best WHERE rn = 1) AS best_cluster_day""")
def pot_exceedance_clusters(sf_dir: str) -> pd.DataFrame:
    """Peaks-over-threshold exceedance clustering — the extreme-value
    view of the daily series: days above the P90 volume threshold
    (lower-convention integer quantile, 10·cum ≥ 9n) group into
    CALENDAR-consecutive clusters (the d − row_number gaps-and-islands
    identity, so a silent or sub-threshold day breaks the run), and
    the capacity answer is how many storms, how long the longest, and
    which burst carried the most volume (earliest on ties). Pure
    integer arithmetic off the one daily reduce on both engines."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    y = daily["y"].to_numpy(np.int64)
    d = daily["d"].to_numpy(np.int64)
    n = len(y)
    ys = np.sort(y)
    thr = int(ys[np.searchsorted(10 * np.arange(1, n + 1), 9 * n,
                                 side="left")])
    mask = y > thr
    ex_d = d[mask]
    ex_y = y[mask]
    if not len(ex_d):
        return pd.DataFrame({
            "threshold": np.array([thr], np.int64),
            "n_exceed": np.array([0], np.int64),
            "n_clusters": np.array([0], np.int64),
            "max_run_len": pd.array([None], dtype="Int64"),
            "best_cluster_sum": pd.array([None], dtype="Int64"),
            "best_cluster_day": pd.array([None], dtype="Int64")})
    island = ex_d - np.arange(1, len(ex_d) + 1)
    cl = pd.DataFrame({"island": island, "y": ex_y, "d": ex_d}) \
        .groupby("island").agg(length=("y", "size"), tot=("y", "sum"),
                               start_d=("d", "min"))
    best = cl.sort_values(["tot", "start_d"],
                          ascending=[False, True]).iloc[0]
    return pd.DataFrame({
        "threshold": np.array([thr], np.int64),
        "n_exceed": np.array([int(mask.sum())], np.int64),
        "n_clusters": np.array([len(cl)], np.int64),
        "max_run_len": np.array([int(cl["length"].max())], np.int64),
        "best_cluster_sum": np.array([int(best["tot"])], np.int64),
        "best_cluster_day": np.array([int(best["start_d"])],
                                     np.int64)})


@register("moments_skew_kurtosis_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM hh),
q AS (SELECT g, MIN(n) AS n,
             MIN(CASE WHEN 4 * cm >= n THEN c END) AS q1,
             MIN(CASE WHEN 2 * cm >= n THEN c END) AS q2,
             MIN(CASE WHEN 4 * cm >= 3 * n THEN c END) AS q3
      FROM cum GROUP BY g),
mom AS (SELECT g, CAST(SUM(cnt * c) AS BIGINT) AS s1,
               CAST(SUM(cnt * c * c) AS HUGEINT) AS s2,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c)
                    AS HUGEINT) AS s3,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c * c)
                    AS HUGEINT) AS s4
        FROM hh GROUP BY g)
SELECT q.g AS event_type, q.n, q.q1, q.q2, q.q3, mom.s1,
       CASE WHEN q.q3 = q.q1 THEN 0.0
            ELSE ROUND(CAST(q.q3 + q.q1 - 2 * q.q2 AS DOUBLE)
                       / (q.q3 - q.q1), 6) END AS bowley_skew,
       CASE WHEN CAST(s2 AS DOUBLE) / q.n
                 - (CAST(s1 AS DOUBLE) / q.n)
                 * (CAST(s1 AS DOUBLE) / q.n) = 0.0 THEN 0.0
            ELSE ROUND((CAST(s4 AS DOUBLE) / q.n
                        - 4 * (CAST(s3 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n)
                        + 6 * (CAST(s2 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n)
                        - 3 * (CAST(s1 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n)
                          * (CAST(s1 AS DOUBLE) / q.n))
                       / ((CAST(s2 AS DOUBLE) / q.n
                           - (CAST(s1 AS DOUBLE) / q.n)
                           * (CAST(s1 AS DOUBLE) / q.n))
                          * (CAST(s2 AS DOUBLE) / q.n
                             - (CAST(s1 AS DOUBLE) / q.n)
                             * (CAST(s1 AS DOUBLE) / q.n)))
                       - 3.0, 6)
       END AS kurtosis_excess
FROM q JOIN mom ON q.g = mom.g ORDER BY 1""")
def moments_skew_kurtosis_by_type(sf_dir: str) -> pd.DataFrame:
    """Distribution-shape profile per event type: Bowley (quartile)
    skewness — the robust skew measure, exact integers over the
    boxplot family's quantile convention — and moment excess
    kurtosis from the raw power sums S1..S4 (128-bit integers; the
    central-moment expansion m4/m2² − 3 is evaluated with the
    IDENTICAL division-by-n operand order on both engines, so the
    cancellation-prone floats agree bit-for-bit). One (type, cents)
    contingency reduce feeds both statistics; constant columns
    (q3 = q1 or zero variance) short-circuit to 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["g", "c"], ignore_index=True)
    r6 = textstats.round_half_away
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        cm = np.cumsum(cnt)
        q1 = int(c[np.searchsorted(4 * cm, n, side="left")])
        q2 = int(c[np.searchsorted(2 * cm, n, side="left")])
        q3 = int(c[np.searchsorted(4 * cm, 3 * n, side="left")])
        s1 = sum(int(a) * int(b) for a, b in zip(cnt, c))
        s2 = sum(int(a) * int(b) ** 2 for a, b in zip(cnt, c))
        s3 = sum(int(a) * int(b) ** 3 for a, b in zip(cnt, c))
        s4 = sum(int(a) * int(b) ** 4 for a, b in zip(cnt, c))
        bow = 0.0 if q3 == q1 else \
            r6(float(q3 + q1 - 2 * q2) / (q3 - q1), 6)
        m1 = float(s1) / n
        m2 = float(s2) / n - m1 * m1
        if m2 == 0.0:
            kur = 0.0
        else:
            m4 = float(s4) / n - 4 * (float(s3) / n) * m1 \
                + 6 * (float(s2) / n) * m1 * m1 \
                - 3 * m1 * m1 * m1 * m1
            kur = r6(m4 / (m2 * m2) - 3.0, 6)
        rows.append((g, n, q1, q2, q3, s1, float(bow), float(kur)))
    out = pd.DataFrame(rows, columns=[
        "event_type", "n", "q1", "q2", "q3", "s1", "bowley_skew",
        "kurtosis_excess"])
    for col in ("n", "q1", "q2", "q3", "s1"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


@register("user_burstiness_mean", sql="""
WITH o AS (SELECT user_id,
                  (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                  // 1000000 AS gap_s
           FROM events),
g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_s) AS BIGINT) AS s,
             CAST(SUM(gap_s * gap_s) AS HUGEINT) AS sq
      FROM o WHERE gap_s IS NOT NULL GROUP BY user_id),
b AS (SELECT CASE WHEN s = 0 THEN 0.0
                  ELSE (sqrt(CAST(n * sq - CAST(s AS HUGEINT) * s
                                  AS DOUBLE)) - s)
                       / (sqrt(CAST(n * sq - CAST(s AS HUGEINT) * s
                                    AS DOUBLE)) + s)
             END AS bu
      FROM g)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(SUM(bu) / COUNT(*), 6) AS mean_burstiness
FROM b""")
def user_burstiness_mean(sf_dir: str) -> pd.DataFrame:
    """Mean burstiness of user inter-event times, B = (σ−μ)/(σ+μ)
    per user (Goh & Barabási 2008: −1 = metronome, 0 = Poisson,
    → 1 = extreme bursts) — the temporal-pattern fingerprint that
    session statistics miss. Gaps quantize to integer SECONDS
    (floor division, shared convention) inside the user-hash bucket;
    the n in σ/μ cancels, so B = (√R − S)/(√R + S) with R = n·Σg² −
    S² an EXACT ≥0 integer (128-bit — g² alone would overflow int64)
    and one shared sqrt; the all-zero-gap user pins to 0. Only
    per-user (n, S, Σg²) partials leave the buckets; the final mean
    is a bounded float sum against the 6-dp guard."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = np.where(same, (us - np.roll(us, 1)) // 1_000_000, 0)
        d = pd.DataFrame({"user_id": uid[same], "g": gap[same]})
        if not len(d):
            return pd.DataFrame({"bu": pd.Series([], np.float64)})
        agg = d.assign(sq=d["g"].astype(object) ** 2) \
            .groupby("user_id").agg(n=("g", "size"), s=("g", "sum"),
                                    sq=("sq", "sum"))
        bu = []
        for n, s, sq in zip(agg["n"], agg["s"], agg["sq"]):
            n, s, sq = int(n), int(s), int(sq)
            if s == 0:
                bu.append(0.0)
                continue
            root = np.sqrt(float(n * sq - s * s))
            bu.append((root - s) / (root + s))
        return pd.DataFrame({"bu": np.array(bu, np.float64)})

    bu = (ds.map_batches(with_bucket, batch_format="pandas")
          .groupby("bucket_")
          .map_groups(per_user, batch_format="pandas")).to_pandas()
    r6 = textstats.round_half_away
    n_users = len(bu)
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "mean_burstiness": [float(r6(float(bu["bu"].sum()) / n_users,
                                     6))]})


@register("term_occurrence_counts", sql="""
WITH terms AS (SELECT unnest(['scan', 'join', 'merge', 'sort',
                              'hash']) AS term),
c AS (SELECT t.term, d.source,
             (length(d.text) - length(replace(d.text, t.term, '')))
             // length(t.term) AS k
      FROM documents d CROSS JOIN terms t)
SELECT term, source, CAST(SUM(k) AS BIGINT) AS occurrences,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs
FROM c GROUP BY 1, 2 ORDER BY 1, 2""")
def term_occurrence_counts(sf_dir: str) -> pd.DataFrame:
    """Multi-pattern substring counting — total NON-OVERLAPPING
    occurrences and containing-doc counts for a broadcast term
    dictionary, per source (the dictionary-scan primitive behind
    contamination screens and keyword dashboards). Arrow's
    count_substring kernel is non-overlapping by definition, which is
    exactly the oracle's replace-arithmetic (len − len(replace))/len,
    so the counts are integer-identical. One vectorized kernel per
    term per batch (|terms| broadcast once), only (term, source)
    partials shuffle."""
    terms = ["scan", "join", "merge", "sort", "hash"]
    terms_ref = ray.put(terms)

    def count(batch: pa.Table) -> pd.DataFrame:
        ts = ray.get(terms_ref)
        src = batch["source"].to_pandas()
        frames = []
        for term in ts:
            k = pc.count_substring(batch["text"], term) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            frames.append(pd.DataFrame({
                "term": term, "source": src, "k": k,
                "d": (k > 0).astype(np.int64)}))
        allf = pd.concat(frames, ignore_index=True)
        return allf.groupby(["term", "source"], as_index=False) \
            .agg(occurrences=("k", "sum"), docs=("d", "sum"))

    out = reduce_sink(
        _docs(sf_dir, ["text", "source"]).map_batches(
            count, batch_format="pyarrow"),
        ["term", "source"], {"occurrences": ("occurrences", "sum"),
                             "docs": ("docs", "sum")}).to_pandas()
    return out.sort_values(["term", "source"], ignore_index=True)


@register("word_length_hist", sql=r"""
WITH w AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS wd
           FROM documents)
SELECT CAST(length(wd) AS BIGINT) AS len,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w WHERE length(wd) > 0 GROUP BY 1 ORDER BY 1""")
def word_length_hist(sf_dir: str) -> pd.DataFrame:
    """Corpus word-length histogram — the tokenizer-health profile
    (a long tail of 50-char 'words' means markup leaked through
    cleaning). Fully Arrow-vectorized: split_pattern_regex explodes
    each batch to a list column, utf8_length runs on the FLATTENED
    child array with no Python per-token work, empties drop on both
    engines, and only (len, n) partials — bounded by the longest
    word — ever shuffle."""
    def lens(batch: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), r"\s+")
        flat = pc.list_flatten(words)
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ln = ln[ln > 0]
        u, c = np.unique(ln, return_counts=True)
        return pd.DataFrame({"len": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    out = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(lens,
                                            batch_format="pyarrow"),
        ["len"], {"n": ("n", "sum")}).to_pandas()
    return out.sort_values("len", ignore_index=True)


@register("char_entropy_by_source", sql="""
WITH ch AS (SELECT source, unnest(string_split(text, '')) AS c
            FROM documents),
h AS (SELECT source, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM ch GROUP BY 1, 2),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM h GROUP BY 1)
SELECT h.source, t.tot AS n_chars,
       ROUND(-SUM((n / CAST(tot AS DOUBLE))
                  * LOG2(n / CAST(tot AS DOUBLE))), 6) AS entropy_bits
FROM h JOIN t ON h.source = t.source
GROUP BY h.source, t.tot ORDER BY 1""")
def char_entropy_by_source(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the CHARACTER distribution per source —
    the cheapest gibberish/compressibility screen (natural prose sits
    ≈4 bits; base64 blobs or repeated padding stand out immediately).
    Each batch concatenates its per-source texts and histograms raw
    bytes with ONE np.frombuffer + bincount (no per-char Python, no
    unnest explosion — the oracle pays that instead); only ≤256
    (source, byte, n) partials per batch shuffle and the entropy
    closes over the tiny aggregate with the shared p·log₂p
    expression."""
    def hist(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for src, grp in df.groupby("source", sort=False):
            b = np.frombuffer("".join(grp["text"].tolist())
                              .encode("utf-8"), np.uint8)
            cnt = np.bincount(b, minlength=256)
            nz = np.nonzero(cnt)[0]
            frames.append(pd.DataFrame({
                "source": src, "byte": nz.astype(np.int64),
                "n": cnt[nz].astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "byte": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    h = reduce_sink(
        _docs(sf_dir, ["text", "source"]).map_batches(
            hist, batch_format="pandas"),
        ["source", "byte"], {"n": ("n", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    rows = []
    for src, grp in h.groupby("source", sort=True):
        n = grp["n"].to_numpy(np.float64)
        tot = int(n.sum())
        p = n / float(tot)
        ent = float(-(p * np.log2(p)).sum())
        rows.append((src, tot, float(r6(ent, 6))))
    return pd.DataFrame(rows, columns=["source", "n_chars",
                                       "entropy_bits"]) \
        .astype({"n_chars": np.int64})


@register("region_share_rollup", sql="""
WITH rev AS (SELECT c_nationkey AS nk,
                    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS cents
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY 1),
j AS (SELECT r.r_name AS region, n.n_name AS nation, rev.cents
      FROM rev JOIN nation n ON rev.nk = n.n_nationkey
               JOIN region r ON n.n_regionkey = r.r_regionkey),
t AS (SELECT region, nation, cents,
             CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
                 AS rtot,
             CAST(SUM(cents) OVER () AS BIGINT) AS gtot FROM j)
SELECT region, nation, cents,
       ROUND(CAST(cents AS DOUBLE) / rtot, 6)
           AS nation_share_of_region,
       ROUND(CAST(rtot AS DOUBLE) / gtot, 6)
           AS region_share_of_total
FROM t ORDER BY 1, 2""")
def region_share_rollup(sf_dir: str) -> pd.DataFrame:
    """Hierarchical percent-of-parent rollup (RATIO_TO_REPORT):
    nation revenue with its share of the region and the region's
    share of the grand total — the two-level drill-down every BI
    report renders. Scale shape: the fact table reduces per
    nationkey with the customer→nation map broadcast once (ray.put
    — the dimension side, never shuffled); the 25-row aggregate
    joins names and computes both share levels driver-side with
    exact integer cents and one rounded division per row."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"].to_numpy(np.int64),
                                cust["c_nationkey"]
                                .to_numpy(np.int64))))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        nk = df["o_custkey"].map(cmap).to_numpy(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        return pd.DataFrame({"nk": nk, "cents": cents}) \
            .groupby("nk", as_index=False).sum()

    rev = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        ["nk"], {"cents": ("cents", "sum")}).to_pandas()
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    reg = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    j = rev.merge(nat, left_on="nk", right_on="n_nationkey") \
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    j = j.rename(columns={"r_name": "region", "n_name": "nation"})
    rtot = j.groupby("region")["cents"].transform("sum")
    gtot = int(j["cents"].sum())
    r6 = textstats.round_half_away
    out = pd.DataFrame({
        "region": j["region"], "nation": j["nation"],
        "cents": j["cents"].astype(np.int64),
        "nation_share_of_region": r6(
            j["cents"].to_numpy(np.float64)
            / rtot.to_numpy(np.float64), 6),
        "region_share_of_total": r6(
            rtot.to_numpy(np.float64) / float(gtot), 6)})
    return out.sort_values(["region", "nation"], ignore_index=True)


@register("rate_limit_audit", sql="""
WITH c AS (SELECT e.user_id, e.ts, e.event_id,
                  (SELECT COUNT(*) FROM events e2
                   WHERE e2.user_id = e.user_id
                     AND epoch_us(e2.ts) > epoch_us(e.ts) - 300000000
                     AND (e2.ts < e.ts OR (e2.ts = e.ts
                          AND e2.event_id <= e.event_id))) AS k
           FROM events e)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k > 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS violations,
       CAST(MAX(k) AS BIGINT) AS max_burst,
       ROUND(CAST(SUM(CASE WHEN k > 5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS violation_rate
FROM c""")
def rate_limit_audit(sf_dir: str) -> pd.DataFrame:
    """Sliding-window rate-limit audit: for every event, how many
    events its user fired in the trailing 5 minutes (arrival order =
    (ts, event_id), self included, strict 300 s lookback) — the
    would-this-trip-a-limiter question asked over the historical log,
    with violations counted above a burst budget of 5. Same bucket
    machinery as user_trailing_1h_value: users hash into buckets,
    each bucket sorts ONCE by (user, ts, id) and shifts every user
    run onto a shared monotonic axis with gaps wider than the
    window, so a single searchsorted against (adj − 300s + 1µs)
    answers every row — the positional index minus the boundary IS
    the burst size, which also encodes the equal-timestamp id≤ tie
    rule for free. Only four partial scalars leave each bucket."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    win = 300_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, us, uid))
        us, uid = us[order], uid[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        run_min, run_max = us[starts], us[ends - 1]
        span = run_max - run_min
        base = np.concatenate(
            ([0], np.cumsum(span[:-1] + 2 * win + 2)))
        adj = us - run_min[run_of] + base[run_of]
        left = np.searchsorted(adj, adj - win + 1, side="left")
        k = np.arange(len(adj)) - left + 1
        return pd.DataFrame({
            "n_events": [np.int64(len(k))],
            "violations": [np.int64((k > 5).sum())],
            "max_burst": [np.int64(k.max() if len(k) else 0)]})

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_")
             .map_groups(lambda g: audit(g.drop(columns=["bucket_"])),
                         batch_format="pandas")).to_pandas()
    n = int(parts["n_events"].sum())
    viol = int(parts["violations"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "violations": np.array([viol], np.int64),
        "max_burst": np.array([int(parts["max_burst"].max())],
                              np.int64),
        "violation_rate": [float(r6(float(viol) / n, 6))]})


@register("stratified_split_exact_counts", sql="""
WITH d AS (SELECT doc_id, lang,
                  (doc_id * 2654435761) % 4294967296 AS h
           FROM documents),
t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
s AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
             CAST(SUM(n) // 10 AS BIGINT) AS b FROM t),
a AS (SELECT lang, n, (b * n) // tot AS fl, (b * n) % tot AS rem
      FROM t, s),
k AS (SELECT CAST(MIN(b) - SUM(fl) AS BIGINT) AS extra FROM a,
      (SELECT b FROM s) x(b)),
r AS (SELECT lang, n,
             CAST(fl + CASE WHEN ROW_NUMBER()
                                 OVER (ORDER BY rem DESC, lang)
                            <= k.extra THEN 1 ELSE 0 END
                  AS BIGINT) AS n_val
      FROM a, k),
rk AS (SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY h, doc_id) AS rn
       FROM d),
sel AS (SELECT rk.lang, rk.doc_id
        FROM rk JOIN r USING (lang) WHERE rk.rn <= r.n_val)
SELECT r.lang, r.n, r.n_val,
       CAST(COALESCE(SUM(sel.doc_id), 0) AS BIGINT) AS val_id_sum
FROM r LEFT JOIN sel ON r.lang = sel.lang
GROUP BY r.lang, r.n, r.n_val ORDER BY r.lang""")
def stratified_split_exact_counts(sf_dir: str) -> pd.DataFrame:
    """EXACT stratified validation split: a global 10% budget
    apportioned across language strata by largest remainder (so the
    val set is exactly tot//10 docs — per-stratum hash thresholds
    can't promise that), each stratum's members chosen as its n_val
    smallest (Knuth-hash, doc_id) keys — deterministic, reproducible,
    and order-free. Scale path is two passes, NO per-stratum sort:
    pass 1 reduces (lang, high-byte-of-hash) 256-bin counts, the
    driver finds each stratum's cut bin from the tiny table; pass 2
    sums sub-cut-bin members map-side and gathers ONLY the cut bin
    (~1/256 of the stratum) to resolve the boundary exactly by
    (h, doc_id). The val_id_sum checksum proves membership equality
    against the oracle's ROW_NUMBER form, not just counts."""
    knuth = np.uint64(2654435761)
    mod = np.uint64(1 << 32)

    def keyed(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * knuth) % mod
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang": batch["lang"].to_pandas(),
            "h": h.astype(np.int64),
            "bin": (h >> np.uint64(24)).astype(np.int64)})

    d = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        keyed, batch_format="pyarrow").materialize()
    bins = reduce_sink(d, ["lang", "bin"],
                       {"n": ("bin", "size")}).to_pandas()
    t = bins.groupby("lang", sort=True)["n"].sum()
    tot = int(t.sum())
    budget = tot // 10
    n_arr = t.to_numpy(np.int64)
    fl = (budget * n_arr) // tot
    rem = (budget * n_arr) % tot
    extra = budget - int(fl.sum())
    order = np.lexsort((np.asarray(t.index), -rem))
    nv = fl.copy()
    nv[order[:extra]] += 1
    n_val = dict(zip(t.index, nv))
    # per-stratum cut bin + how many needed inside it
    cut_bin, need_in = {}, {}
    for lang, grp in bins.groupby("lang"):
        grp = grp.sort_values("bin")
        cum = grp["n"].cumsum()
        target = int(n_val[lang])
        if target == 0:
            cut_bin[lang], need_in[lang] = -1, 0
            continue
        idx = int(np.searchsorted(cum.to_numpy(), target,
                                  side="left"))
        cut_bin[lang] = int(grp["bin"].iloc[idx])
        before = int(cum.iloc[idx - 1]) if idx else 0
        need_in[lang] = target - before
    cb_ref = ray.put((cut_bin, need_in))

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        cb, _ = ray.get(cb_ref)
        cut = df["lang"].map(cb).fillna(-1).to_numpy(np.int64)
        b = df["bin"].to_numpy(np.int64)
        below = b < cut
        sub = df[below].groupby("lang", as_index=False) \
            .agg(id_sum=("doc_id", "sum"))
        sub["kind"] = "sum"
        sub["h"] = np.int64(0)
        sub = sub.rename(columns={"id_sum": "doc_id"})
        edge = df[b == cut][["lang", "doc_id", "h"]].copy()
        edge["kind"] = "edge"
        return pd.concat([sub[["lang", "doc_id", "h", "kind"]],
                          edge[["lang", "doc_id", "h", "kind"]]],
                         ignore_index=True)

    parts = d.map_batches(pass2, batch_format="pandas").to_pandas()
    rows = []
    for lang in t.index:
        p = parts[parts["lang"] == lang]
        ssum = int(p[p["kind"] == "sum"]["doc_id"].sum())
        edge = p[p["kind"] == "edge"].sort_values(
            ["h", "doc_id"], kind="mergesort")
        take = edge.head(need_in[lang])
        rows.append((lang, int(t[lang]), int(n_val[lang]),
                     ssum + int(take["doc_id"].sum())))
    return pd.DataFrame(rows, columns=["lang", "n", "n_val",
                                       "val_id_sum"]) \
        .astype({"n": np.int64, "n_val": np.int64,
                 "val_id_sum": np.int64}) \
        .sort_values("lang", ignore_index=True)


@register("nearest_view_gap_bands", sql="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'),
nb AS (SELECT p.event_id,
              (SELECT MIN(ABS(epoch_us(v.ts) - epoch_us(p.ts)))
               FROM v WHERE v.user_id = p.user_id) AS gap
       FROM p),
b AS (SELECT CASE WHEN gap IS NULL THEN -1
                  WHEN gap < 1000000 THEN 0
                  WHEN gap < 60000000 THEN 1
                  WHEN gap < 600000000 THEN 2
                  WHEN gap < 3600000000 THEN 3
                  ELSE 4 END AS band
      FROM nb)
SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1""")
def nearest_view_gap_bands(sf_dir: str) -> pd.DataFrame:
    """BIDIRECTIONAL as-of join: for every purchase, the nearest
    view by |Δt| in EITHER direction (the symmetric sibling of
    asof_last_view_gap's backward-only rule — attribution wants
    'closest context', not 'last click'), histogrammed into
    sub-second/minute/10-min/hour/beyond bands (integer µs
    thresholds, band −1 = user never viewed). Scale shape: both
    streams co-locate in the user-hash bucket; the bucket sorts views
    ONCE onto the per-user gap-shifted axis and a single searchsorted
    gives each purchase its floor/ceiling view — min of the two
    candidate deltas IS the global minimum because views are sorted;
    only ≤6 (band, n) partials leave each bucket."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    big = np.int64(1 << 62)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])].copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def bands(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        isv = (g["event_type"] == "view").to_numpy()
        order = np.lexsort((us, uid))
        us, uid, isv = us[order], uid[order], isv[order]
        # shared monotonic axis: per-user offset with gaps wider than
        # any real in-user delta, so cross-user neighbors are either
        # detected by uid mismatch or lose on distance anyway
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        run_min, run_max = us[starts], us[ends - 1]
        span = run_max - run_min
        gap_w = (int(span.max()) if len(span) else 0) + 2
        base = np.concatenate(([0], np.cumsum(span[:-1] + gap_w)))
        adj = us - run_min[run_of] + base[run_of]
        v_adj, v_uid = adj[isv], uid[isv]
        p_adj, p_uid = adj[~isv], uid[~isv]
        nmax = len(v_adj)
        if nmax == 0:
            gap = np.full(len(p_adj), big)
        else:
            pos = np.searchsorted(v_adj, p_adj, side="right")
            prev_i = np.clip(pos - 1, 0, nmax - 1)
            next_i = np.clip(pos, 0, nmax - 1)
            d_prev = np.where(
                (pos - 1 >= 0) & (v_uid[prev_i] == p_uid),
                p_adj - v_adj[prev_i], big)
            d_next = np.where(
                (pos < nmax) & (v_uid[next_i] == p_uid),
                v_adj[next_i] - p_adj, big)
            gap = np.minimum(d_prev, d_next)
        band = np.select(
            [gap >= big, gap < 1_000_000, gap < 60_000_000,
             gap < 600_000_000, gap < 3_600_000_000],
            [-1, 0, 1, 2, 3], default=4).astype(np.int64)
        u, c = np.unique(band, return_counts=True)
        return pd.DataFrame({"band": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: bands(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["band"], {"n": ("n", "sum")}).to_pandas()
    return out.sort_values("band", ignore_index=True)


@register("user_sequence_anomaly_topk", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
t AS (SELECT prev AS f, event_type AS tt, CAST(COUNT(*) AS DOUBLE) AS c
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT f, SUM(c) AS tot FROM t GROUP BY f),
p1 AS (SELECT t.f, t.tt, t.c / rt.tot AS p FROM t JOIN rt USING (f)),
ut AS (SELECT user_id, prev AS f, event_type AS tt FROM o
       WHERE prev IS NOT NULL),
ll AS (SELECT ut.user_id, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(SUM(LN(p1.p)) / COUNT(*), 6) AS mean_ll
       FROM ut JOIN p1 ON ut.f = p1.f AND ut.tt = p1.tt
       GROUP BY ut.user_id HAVING COUNT(*) >= 5)
SELECT user_id, n, mean_ll FROM ll
ORDER BY mean_ll, user_id LIMIT 10""")
def user_sequence_anomaly_topk(sf_dir: str) -> pd.DataFrame:
    """Sequence-anomaly scoring: each user's event stream scored by
    its mean log-likelihood under the GLOBAL transition chain — the
    bot/fraud screen that surfaces users whose type-to-type dynamics
    least resemble everyone else's (low mean ln P = improbable
    paths). Two passes, both scale-shaped: the shared transition
    reduce builds P, the |types|² ln P table broadcasts once, and the
    second per-user-bucket sort+shift emits only (user, n, Σln p)
    partials; users under 5 transitions drop (no evidence), scores
    round to 6 dp BEFORE the ascending top-10 cut with user_id
    tiebreak so a hairline can't flip membership."""
    t = event_transitions(sf_dir)
    tot = t.groupby("from_type")["cnt"].sum()
    types = sorted(set(t["from_type"]) | set(t["to_type"]))
    idx = {g: i for i, g in enumerate(types)}
    lnp_mat = np.full((len(types), len(types)), np.nan)
    for r in t.itertuples():
        lnp_mat[idx[r.from_type], idx[r.to_type]] = \
            float(np.log(r.cnt / float(tot[r.from_type])))
    lnp_ref = ray.put((idx, lnp_mat))

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def score(g: pd.DataFrame) -> pd.DataFrame:
        tidx, mat = ray.get(lnp_ref)
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        code = g["event_type"].map(tidx).to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        m = same[1:]
        if not m.any():
            return pd.DataFrame({"user_id": pd.Series([], np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sll": pd.Series([],
                                                  dtype=np.float64)})
        lp = mat[code[:-1][m], code[1:][m]]   # vectorized lookup
        return pd.DataFrame({"user_id": uid[1:][m], "lp": lp}) \
            .groupby("user_id", as_index=False) \
            .agg(n=("lp", "size"), sll=("lp", "sum"))

    parts = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: score(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum"), "sll": ("sll", "sum")}) \
        .to_pandas()
    parts = parts[parts["n"] >= 5].copy()
    r6 = textstats.round_half_away
    parts["mean_ll"] = r6(parts["sll"].to_numpy(np.float64)
                          / parts["n"].to_numpy(np.float64), 6)
    out = parts.sort_values(["mean_ll", "user_id"],
                            kind="mergesort").head(10)
    return out[["user_id", "n", "mean_ll"]].reset_index(drop=True) \
        .astype({"user_id": np.int64, "n": np.int64})


@register("daily_wow_change", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS d FROM b),
g AS (SELECT spine.d, COALESCE(daily.y, 0) AS y
      FROM spine LEFT JOIN daily ON daily.d = spine.d),
w AS (SELECT d, y, LAG(y, 7) OVER (ORDER BY d) AS y7 FROM g)
SELECT CAST(d AS BIGINT) AS epoch_day, CAST(y AS BIGINT) AS y,
       CAST(y7 AS BIGINT) AS y_prev_week,
       ROUND(CAST(y - y7 AS DOUBLE) / y7, 6) AS wow_pct
FROM w WHERE y7 > 0 ORDER BY 1""")
def daily_wow_change(sf_dir: str) -> pd.DataFrame:
    """Week-over-week daily growth: each day against the SAME WEEKDAY
    a week earlier on the zero-filled spine (the seasonal-aware
    growth readout — day-over-day compares Monday to Sunday and lies).
    One daily reduce; the LAG-7 alignment is an index shift on the
    tiny spine; days whose comparison point is 0 drop on both
    engines (no NULL-vs-NaN ambiguity in the hash)."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].iloc[0]), int(daily["d"].iloc[-1])
    y = np.zeros(hi - lo + 1, np.int64)
    y[daily["d"].to_numpy(np.int64) - lo] = \
        daily["y"].to_numpy(np.int64)
    d = np.arange(lo, hi + 1, dtype=np.int64)
    y7 = np.empty_like(y)
    y7[:7] = -1
    y7[7:] = y[:-7]
    keep = y7 > 0
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "epoch_day": d[keep],
        "y": y[keep],
        "y_prev_week": y7[keep],
        "wow_pct": r6((y[keep] - y7[keep]).astype(np.float64)
                      / y7[keep].astype(np.float64), 6)})


@register("type_share_of_user_total", sql="""
WITH c AS (SELECT user_id, event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS tot
      FROM c GROUP BY 1),
s AS (SELECT c.event_type, c.c / CAST(u.tot AS DOUBLE) AS share
      FROM c JOIN u USING (user_id) WHERE u.tot > 0)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(share), 6) AS share_sum
FROM s GROUP BY 1 ORDER BY 1""")
def type_share_of_user_total(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-group-total at FACT-TABLE scale: every event's value
    as a share of its user's lifetime value, aggregated per type —
    'which event types eat users' wallets' normalized per user so
    whales don't drown the signal. The classic distributed-window
    problem (SUM OVER (PARTITION BY user) needs every row twice):
    solved in ONE co-partitioned pass — the user-hash bucket computes
    its users' totals AND the per-row shares in the same task
    (transform), so fact rows never meet a join or a second shuffle;
    only (type, n, Σshare) partials leave. Each share is the
    identical c/tot double on both engines; the per-type float sum's
    order differs only at ~1e-12 against the 6-dp guard."""
    ds = _events(sf_dir, ["user_id", "event_type", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def shares(g: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        tot = pd.Series(c).groupby(
            g["user_id"].to_numpy(np.int64)).transform("sum") \
            .to_numpy(np.int64)
        keep = tot > 0
        part = pd.DataFrame({
            "event_type": g["event_type"].to_numpy()[keep],
            "n": 1,
            "share": c[keep] / tot[keep].astype(np.float64)})
        return part.groupby("event_type", as_index=False) \
            .agg(n=("n", "sum"), share=("share", "sum"))

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: shares(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"),
                         "share": ("share", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    out["share_sum"] = r6(out["share"].to_numpy(np.float64), 6)
    return out[["event_type", "n", "share_sum"]] \
        .astype({"n": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("ar1_daily_forecast", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (SELECT UNNEST(generate_series(mn, mx)) AS d FROM b),
g AS (SELECT spine.d, CAST(COALESCE(daily.y, 0) AS DOUBLE) AS y
      FROM spine LEFT JOIN daily ON daily.d = spine.d),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS t, SUM(y) / COUNT(*) AS mu
      FROM g),
l AS (SELECT y, LAG(y) OVER (ORDER BY d) AS yp,
             LAST_VALUE(y) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS ylast
      FROM g),
s AS (SELECT SUM(CASE WHEN yp IS NOT NULL
                      THEN (y - m.mu) * (yp - m.mu) ELSE 0 END) AS num,
             SUM((y - m.mu) * (y - m.mu)) AS den,
             MIN(ylast) AS ylast
      FROM l, m)
SELECT t, ROUND(mu, 6) AS mean,
       CASE WHEN den = 0 THEN 0.0 ELSE ROUND(num / den, 6) END
           AS phi,
       CASE WHEN den = 0 THEN ROUND(mu, 6)
            ELSE ROUND(mu + (num / den) * (ylast - mu), 6)
       END AS forecast
FROM s, m""")
def ar1_daily_forecast(sf_dir: str) -> pd.DataFrame:
    """AR(1) fit + one-step forecast for the daily volume: φ is the
    lag-1 autocovariance over the full-series variance (the Yule-
    Walker estimate with the ACF denominator convention, matching
    daily_acf) on the zero-filled spine, and tomorrow's forecast is
    μ + φ(y_T − μ) — the minimal autoregressive baseline every
    fancier forecaster must beat. One daily reduce; μ, φ and the
    forecast are shared float expressions over the identical per-day
    operands (y integer-valued, so μ's summation order can't
    differ); constant series short-circuits φ to 0."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].iloc[0]), int(daily["d"].iloc[-1])
    y = np.zeros(hi - lo + 1, np.float64)
    y[daily["d"].to_numpy(np.int64) - lo] = \
        daily["y"].to_numpy(np.float64)
    t = len(y)
    mu = float(y.sum()) / t
    num = float(((y[1:] - mu) * (y[:-1] - mu)).sum())
    den = float(((y - mu) * (y - mu)).sum())
    r6 = textstats.round_half_away
    if den == 0.0:
        phi, fc = 0.0, r6(mu, 6)
    else:
        phi = r6(num / den, 6)
        fc = r6(mu + (num / den) * (float(y[-1]) - mu), 6)
    return pd.DataFrame({"t": np.array([t], np.int64),
                         "mean": [float(r6(mu, 6))],
                         "phi": [float(phi)],
                         "forecast": [float(fc)]})


@register("event_value_by_mktsegment", sql="""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1""")
def event_value_by_mktsegment(sf_dir: str) -> pd.DataFrame:
    """Cross-dataset dimension enrichment: the event stream joined to
    the TPC-H customer dimension on user_id = c_custkey, rolled up by
    market segment — the canonical 'behavioral fact × CRM dimension'
    star join. The dimension side broadcasts ONCE (ray.put of the
    custkey→segment map — never shuffled, never per-batch); each
    fact batch maps segments and emits (segment, n, cents) partials
    plus distinct (segment, user) pairs for the exact two-phase
    user count. Integer cents end to end."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"].to_numpy(np.int64),
                                cust["c_mktsegment"])))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["user_id"].map(cmap)
        keep = seg.notna()
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)[keep.to_numpy()]
        return pd.DataFrame({
            "segment": seg[keep].to_numpy(),
            "user_id": df["user_id"].to_numpy(np.int64)[
                keep.to_numpy()],
            "n": 1, "cents": cents})

    tagged = _events(sf_dir, ["user_id", "value"]).map_batches(
        partial, batch_format="pandas")
    agg = reduce_sink(tagged, ["segment"],
                      {"n_events": ("n", "sum"),
                       "cents": ("cents", "sum")}).to_pandas()
    users = reduce_sink(
        reduce_sink(tagged, ["segment", "user_id"],
                    {"n": ("n", "sum")}),
        ["segment"], {"n_users": ("n", "size")}).to_pandas()
    out = agg.merge(users, on="segment")
    return out[["segment", "n_events", "n_users", "cents"]] \
        .astype({"n_events": np.int64, "n_users": np.int64,
                 "cents": np.int64}) \
        .sort_values("segment", ignore_index=True)


@register("hill_tail_index_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS x
           FROM events GROUP BY 1),
top AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, user_id) AS rn
        FROM u WHERE x > 0),
kref AS (SELECT x AS xk FROM top WHERE rn = 101),
h AS (SELECT SUM(LN(CAST(x AS DOUBLE) / (SELECT xk FROM kref))) / 100
          AS inv_alpha
      FROM top WHERE rn <= 100)
SELECT ROUND(inv_alpha, 6) AS inv_alpha,
       ROUND(1.0 / inv_alpha, 6) AS alpha
FROM h WHERE EXISTS (SELECT 1 FROM kref)""")
def hill_tail_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Hill estimator of the heavy-tail index of per-user total value
    (k = 100): α̂⁻¹ = (1/k)Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top order
    statistics — the standard 'how Pareto is my whale curve' number
    that decides whether mean-based capacity planning is even valid
    (α ≤ 2 → infinite variance). Scale shape: per-user cents reduce,
    then each block ships only its local top-101 (value, user)
    partials — the union provably contains the global top-101 — and
    the driver computes the 100-term shared-operand ln sum. Ties are
    value-ties, so the multiset of top values (all that enters the
    formula) is deterministic; fewer than 101 positive users →
    empty result on both engines."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "x": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["user_id"], {"x": ("x", "sum")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["x"] > 0]
        return df.sort_values(["x", "user_id"],
                              ascending=[False, True]).head(101)

    cand = per.map_batches(local_top, batch_format="pandas") \
        .to_pandas().sort_values(["x", "user_id"],
                                 ascending=[False, True],
                                 kind="mergesort").head(101)
    if len(cand) < 101:
        return pd.DataFrame({"inv_alpha": pd.Series([],
                                                    dtype=np.float64),
                             "alpha": pd.Series([],
                                                dtype=np.float64)})
    x = cand["x"].to_numpy(np.float64)
    xk = float(x[100])
    inv_alpha = float(np.log(x[:100] / xk).sum()) / 100
    r6 = textstats.round_half_away
    return pd.DataFrame({"inv_alpha": [float(r6(inv_alpha, 6))],
                         "alpha": [float(r6(1.0 / inv_alpha, 6))]})


@register("geometric_gof_sessions_per_user", sql=f"""
WITH ns AS ({_NS_SQL}),
k AS (SELECT user_id, CAST(SUM(ns) AS BIGINT) AS k
      FROM ns GROUP BY user_id),
h AS (SELECT LEAST(k, 10) AS kb, CAST(COUNT(*) AS BIGINT) AS o
      FROM k GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN kb < 10 THEN kb * o ELSE 0 END)
                  AS BIGINT) AS sk_head,
             (SELECT CAST(COALESCE(SUM(k.k), 0) AS BIGINT) FROM k
              WHERE k.k >= 10) AS sk_tail
      FROM h),
p AS (SELECT n, CAST(n AS DOUBLE) / (sk_head + sk_tail) AS ph FROM t),
e AS (SELECT h.kb, h.o,
             CASE WHEN h.kb < 10
                  THEN p.n * p.ph * POWER(1 - p.ph, h.kb - 1)
                  ELSE p.n * POWER(1 - p.ph, 9) END AS ex
      FROM h, p)
SELECT (SELECT n FROM p) AS n_users,
       ROUND((SELECT ph FROM p), 6) AS p_hat,
       ROUND(SUM((o - ex) * (o - ex) / ex), 6) AS chi2
FROM e""")
def geometric_gof_sessions_per_user(sf_dir: str) -> pd.DataFrame:
    """Goodness-of-fit of the sessions-per-user distribution to a
    geometric law (the memoryless return-visit model: each user quits
    with probability p after any session) — method-of-moments
    p̂ = n/Σk, expected bins E_k = n·p̂(1−p̂)^{k−1} for k = 1..9 with
    the tail lumped at k ≥ 10, and Pearson χ² over the observed
    bins. The sessions-per-user reduce is the same bucket-local
    sessionize as user_sessions; the bin histogram is O(10); p̂ and
    every expected count are shared float expressions (libm pow on
    identical operands) against the 6-dp round."""
    sess = _sessionized_events(sf_dir)
    per = reduce_sink(sess, ["user_id"],
                      {"k": ("sid", "max")}).to_pandas()
    k = per["k"].to_numpy(np.int64)
    n = len(k)
    kb = np.minimum(k, 10)
    o = pd.Series(kb).value_counts().sort_index()
    ph = float(n) / int(k.sum())
    r6 = textstats.round_half_away
    chi2 = 0.0
    for kbin, obs in o.items():
        if kbin < 10:
            ex = n * ph * (1 - ph) ** (int(kbin) - 1)
        else:
            ex = n * (1 - ph) ** 9
        chi2 += (int(obs) - ex) * (int(obs) - ex) / ex
    return pd.DataFrame({"n_users": np.array([n], np.int64),
                         "p_hat": [float(r6(ph, 6))],
                         "chi2": [float(r6(chi2, 6))]})


@register("poisson_mixture_user_day_counts", sql="""
WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS k
           FROM events GROUP BY 1, 2),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(k AS DOUBLE)) / COUNT(*) AS m1,
             SUM(CAST(k * (k - 1) AS DOUBLE)) / COUNT(*) AS m2,
             SUM(CAST(k * (k - 1) * (k - 2) AS DOUBLE)) / COUNT(*)
                 AS m3
      FROM c),
e AS (SELECT n, m1, m2, m3,
             CASE WHEN m2 - m1 * m1 = 0 THEN 0.0
                  ELSE (m3 - m1 * m2) / (m2 - m1 * m1) END AS e1,
             CASE WHEN m2 - m1 * m1 = 0 THEN 0.0
                  ELSE (m1 * m3 - m2 * m2) / (m2 - m1 * m1) END AS e2
      FROM m)
SELECT e.n, ROUND(e.m1, 6) AS m1,
       CASE WHEN m2 - m1 * m1 = 0 OR e1 * e1 - 4 * e2 < 0
            THEN ROUND(m1, 6)
            ELSE ROUND((e1 + sqrt(e1 * e1 - 4 * e2)) / 2, 6)
       END AS lambda_hi,
       CASE WHEN m2 - m1 * m1 = 0 OR e1 * e1 - 4 * e2 < 0
            THEN ROUND(m1, 6)
            ELSE ROUND((e1 - sqrt(e1 * e1 - 4 * e2)) / 2, 6)
       END AS lambda_lo,
       CASE WHEN m2 - m1 * m1 = 0 OR e1 * e1 - 4 * e2 <= 0 THEN 1.0
            ELSE ROUND((m1 - (e1 - sqrt(e1 * e1 - 4 * e2)) / 2)
                       / sqrt(e1 * e1 - 4 * e2), 6)
       END AS w_hi
FROM e""")
def poisson_mixture_user_day_counts(sf_dir: str) -> pd.DataFrame:
    """Two-component Poisson mixture fit to (user, day) activity
    counts by Prony's method — a CLOSED-FORM model fit (no EM, no
    iteration): the factorial moments m_r = E[K(K−1)…] of a Poisson
    mixture are the weighted power sums Σwᵢλᵢʳ, so the two rates are
    the roots of x² − e₁x + e₂ with e₁, e₂ solving the 2×2 Hankel
    system — separating casual from power usage intensity
    deterministically. One (user, day) count reduce (active pairs
    only, documented); the three factorial-moment sums are exact
    integers before one division each; degenerate (pure Poisson /
    negative discriminant) collapses to λ = m₁, w = 1 on both
    engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "d"], {"k": ("d", "size")}).to_pandas()
    k = c["k"].to_numpy(np.int64)
    n = len(k)
    s1 = int(k.sum())
    s2 = int((k * (k - 1)).sum())
    s3 = int((k * (k - 1) * (k - 2)).sum())
    m1 = float(s1) / n
    m2 = float(s2) / n
    m3 = float(s3) / n
    r6 = textstats.round_half_away
    var = m2 - m1 * m1
    if var == 0:
        lam_hi = lam_lo = r6(m1, 6)
        w_hi = 1.0
    else:
        e1 = (m3 - m1 * m2) / var
        e2 = (m1 * m3 - m2 * m2) / var
        disc = e1 * e1 - 4 * e2
        if disc < 0:
            lam_hi = lam_lo = r6(m1, 6)
            w_hi = 1.0
        else:
            lam_hi = r6((e1 + np.sqrt(disc)) / 2, 6)
            lam_lo = r6((e1 - np.sqrt(disc)) / 2, 6)
            w_hi = 1.0 if disc == 0 else \
                r6((m1 - (e1 - np.sqrt(disc)) / 2) / np.sqrt(disc), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "m1": [float(r6(m1, 6))],
                         "lambda_hi": [float(lam_hi)],
                         "lambda_lo": [float(lam_lo)],
                         "w_hi": [float(w_hi)]})


@register("user_cross_fact_profile", sql="""
WITH e AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS en,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS ec
           FROM events GROUP BY 1),
o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS onn,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS oc
      FROM orders GROUP BY 1),
j AS (SELECT COALESCE(e.k, o.k) AS k, en, ec, onn, oc
      FROM e FULL JOIN o ON e.k = o.k),
cls AS (SELECT CASE WHEN en IS NOT NULL AND onn IS NOT NULL
                    THEN 'both'
                    WHEN en IS NOT NULL THEN 'events_only'
                    ELSE 'orders_only' END AS presence,
               COALESCE(en, 0) AS en, COALESCE(ec, 0) AS ec,
               COALESCE(onn, 0) AS onn, COALESCE(oc, 0) AS oc
        FROM j)
SELECT presence, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(en) AS BIGINT) AS n_events,
       CAST(SUM(ec) AS BIGINT) AS event_cents,
       CAST(SUM(onn) AS BIGINT) AS n_orders,
       CAST(SUM(oc) AS BIGINT) AS order_cents
FROM cls GROUP BY 1 ORDER BY 1""")
def user_cross_fact_profile(sf_dir: str) -> pd.DataFrame:
    """Multi-fact FULL OUTER profile: every key's presence across TWO
    fact tables (behavioral events vs commercial orders) classified
    into both / events_only / orders_only with per-class volume — the
    identity-coverage audit run before any cross-fact model join.
    The FULL OUTER never materializes per-key rows on the driver:
    both per-key reduces UNION with presence flags, ONE keyed reduce
    merges them (max flags + sums — associative), classification is
    map-side, and only 3 class partials per block shuffle."""
    ev = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "k": df["user_id"].to_numpy(np.int64),
                "en": np.ones(len(df), np.int64),
                "ec": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64),
                "onn": np.zeros(len(df), np.int64),
                "oc": np.zeros(len(df), np.int64),
                "fe": np.ones(len(df), np.int64),
                "fo": np.zeros(len(df), np.int64)}),
            batch_format="pandas"),
        ["k"], {"en": ("en", "sum"), "ec": ("ec", "sum"),
                "onn": ("onn", "sum"), "oc": ("oc", "sum"),
                "fe": ("fe", "max"), "fo": ("fo", "max")})
    orders = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda df: pd.DataFrame({
                "k": df["o_custkey"].to_numpy(np.int64),
                "en": np.zeros(len(df), np.int64),
                "ec": np.zeros(len(df), np.int64),
                "onn": np.ones(len(df), np.int64),
                "oc": np.rint(df["o_totalprice"]
                              .to_numpy(np.float64) * 100)
                .astype(np.int64),
                "fe": np.zeros(len(df), np.int64),
                "fo": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["k"], {"en": ("en", "sum"), "ec": ("ec", "sum"),
                "onn": ("onn", "sum"), "oc": ("oc", "sum"),
                "fe": ("fe", "max"), "fo": ("fo", "max")})
    merged = reduce_sink(
        ev.union(orders), ["k"],
        {"en": ("en", "sum"), "ec": ("ec", "sum"),
         "onn": ("onn", "sum"), "oc": ("oc", "sum"),
         "fe": ("fe", "max"), "fo": ("fo", "max")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        pres = np.select(
            [(df["fe"] == 1) & (df["fo"] == 1), df["fe"] == 1],
            ["both", "events_only"], default="orders_only")
        out = df.assign(presence=pres, n_users=np.int64(1))
        return out.groupby("presence", as_index=False).agg(
            n_users=("n_users", "sum"), n_events=("en", "sum"),
            event_cents=("ec", "sum"), n_orders=("onn", "sum"),
            order_cents=("oc", "sum"))

    out = reduce_sink(
        merged.map_batches(classify, batch_format="pandas"),
        ["presence"],
        {"n_users": ("n_users", "sum"), "n_events": ("n_events", "sum"),
         "event_cents": ("event_cents", "sum"),
         "n_orders": ("n_orders", "sum"),
         "order_cents": ("order_cents", "sum")}).to_pandas()
    return out.sort_values("presence", ignore_index=True)


@register("value_percentile_of_probes", sql="""
WITH h AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
pr AS (SELECT UNNEST([100, 500, 1000, 5000, 10000]) AS probe),
s AS (SELECT pr.probe,
             CAST(COALESCE(SUM(CASE WHEN h.c < pr.probe
                                    THEN h.cnt END), 0)
                  AS BIGINT) AS below,
             CAST(COALESCE(SUM(CASE WHEN h.c = pr.probe
                                    THEN h.cnt END), 0)
                  AS BIGINT) AS at_probe
      FROM pr LEFT JOIN h ON TRUE GROUP BY pr.probe)
SELECT CAST(probe AS BIGINT) AS probe_cents, below, at_probe,
       ROUND(CAST(2 * below + at_probe AS DOUBLE)
             / (2 * (SELECT n FROM t)), 6) AS percentile
FROM s ORDER BY 1""")
def value_percentile_of_probes(sf_dir: str) -> pd.DataFrame:
    """Inverse-CDF probe lookup: at fixed score thresholds (¢100 …
    ¢10 000), what fraction of events falls below — the score-banding
    table a pricing/alerting rule consults ('is $50 high?'), with the
    midrank tie convention (below + ½·at) kept in DOUBLED integers so
    no .5 float ever exists. One cents histogram reduce; the probe
    scan is O(probes × |histogram|) on the tiny aggregate."""
    h = reduce_sink(
        _events(sf_dir, ["value"]).map_batches(
            lambda df: pd.DataFrame({
                "c": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values("c", ignore_index=True)
    c = h["c"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    r6 = textstats.round_half_away
    rows = []
    for probe in (100, 500, 1000, 5000, 10000):
        below = int(cnt[c < probe].sum())
        at = int(cnt[c == probe].sum())
        rows.append((probe, below, at,
                     float(r6((2 * below + at) / (2.0 * n), 6))))
    return pd.DataFrame(rows, columns=["probe_cents", "below",
                                       "at_probe", "percentile"]) \
        .astype({"probe_cents": np.int64, "below": np.int64,
                 "at_probe": np.int64})


@register("trimmed_mean_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    - cnt AS BIGINT) AS cb,
               CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM hh),
kept AS (SELECT g, n, n // 10 AS k,
                GREATEST(0, LEAST(cb + cnt, n - n // 10)
                            - GREATEST(cb, n // 10)) AS kc, c
         FROM cum),
agg AS (SELECT g, MIN(n) AS n, MIN(k) AS k,
               CAST(SUM(kc) AS BIGINT) AS n_kept,
               CAST(SUM(kc * c) AS BIGINT) AS sum_kept
        FROM kept GROUP BY g)
SELECT g AS event_type, n, CAST(k AS BIGINT) AS k, n_kept, sum_kept,
       ROUND(CAST(sum_kept AS DOUBLE) / n_kept, 6) AS trimmed_mean
FROM agg ORDER BY 1""")
def trimmed_mean_by_type(sf_dir: str) -> pd.DataFrame:
    """10% symmetric trimmed mean per event type — the
    outlier-robust center (winsorize clamps, trimming DROPS the
    tails) computed EXACTLY from the lossless cents histogram: each
    bin keeps max(0, min(cb+cnt, n−k) − max(cb, k)) of its members
    (pure integer rank clipping, k = n//10), so the kept count and
    kept sum are exact integers and the mean is one shared division.
    No sort, no per-row pass — the same one-reduce shape as the
    median/mode family."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["g", "c"], ignore_index=True)
    r6 = textstats.round_half_away
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        k = n // 10
        cb = np.cumsum(cnt) - cnt
        kc = np.maximum(
            0, np.minimum(cb + cnt, n - k) - np.maximum(cb, k))
        n_kept = int(kc.sum())
        s_kept = int((kc * c).sum())
        rows.append((g, n, k, n_kept, s_kept,
                     float(r6(float(s_kept) / n_kept, 6))))
    out = pd.DataFrame(rows, columns=["event_type", "n", "k",
                                      "n_kept", "sum_kept",
                                      "trimmed_mean"])
    for col in ("n", "k", "n_kept", "sum_kept"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


@register("blomqvist_beta_daily", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS v,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
rv AS (SELECT d, v, p,
              CAST(SUM(1) OVER (ORDER BY v, d) AS BIGINT) AS r,
              CAST(COUNT(*) OVER () AS BIGINT) AS t FROM daily),
mv AS (SELECT MIN(v) AS m FROM rv WHERE 2 * r >= t),
rp AS (SELECT d, p, CAST(SUM(1) OVER (ORDER BY p, d) AS BIGINT) AS r,
              CAST(COUNT(*) OVER () AS BIGINT) AS t FROM daily),
mp AS (SELECT MIN(p) AS m FROM rp WHERE 2 * r >= t),
sg AS (SELECT SIGN(daily.v - mv.m) * SIGN(daily.p - mp.m) AS s
       FROM daily, mv, mp),
agg AS (SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS disc
        FROM sg)
SELECT conc, disc,
       CASE WHEN conc + disc = 0 THEN 0.0
            ELSE ROUND(CAST(conc - disc AS DOUBLE) / (conc + disc), 6)
       END AS beta
FROM agg""")
def blomqvist_beta_daily(sf_dir: str) -> pd.DataFrame:
    """Blomqvist's β (medial correlation) between the daily view and
    purchase series: the sign-concordance of each day against the
    two LOWER medians — the crudest, most robust dependence measure
    (quadrant test), closing the Pearson/Spearman/Kendall/β family.
    Medians use the shared 2·cum ≥ n order-statistic convention,
    days on either median drop (sign 0), and β = (C − D)/(C + D) is
    one division over exact integer quadrant counts from the one
    daily reduce."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "v": (et == "view").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)})

    daily = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"v": ("v", "sum"), "p": ("p", "sum")}).to_pandas()
    v = daily["v"].to_numpy(np.int64)
    p = daily["p"].to_numpy(np.int64)
    t = len(daily)

    def lower_median(a):
        s = np.sort(a)
        return int(s[np.searchsorted(2 * np.arange(1, t + 1), t,
                                     side="left")])

    mv, mp = lower_median(v), lower_median(p)
    s = np.sign(v - mv) * np.sign(p - mp)
    conc = int((s == 1).sum())
    disc = int((s == -1).sum())
    r6 = textstats.round_half_away
    beta = 0.0 if conc + disc == 0 else \
        r6(float(conc - disc) / (conc + disc), 6)
    return pd.DataFrame({"conc": np.array([conc], np.int64),
                         "disc": np.array([disc], np.int64),
                         "beta": [float(beta)]})


@register("record_days_count", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
r AS (SELECT d, y,
             MAX(y) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prevmax
      FROM daily),
rec AS (SELECT d, y FROM r WHERE prevmax IS NULL OR y > prevmax)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(MAX(d) AS BIGINT) AS last_record_day,
       (SELECT CAST(MAX(y) AS BIGINT) FROM daily) AS max_y
FROM rec""")
def record_days_count(sf_dir: str) -> pd.DataFrame:
    """Record-breaking days: how often the daily volume set a new
    all-time high, and when it last did — the novelty statistic
    (an i.i.d. series expects ~ln T records; a trending series far
    more, a stale one goes quiet). Pure integer running-max scan
    over the one daily reduce; the first day is a record by
    convention on both engines."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    y = daily["y"].to_numpy(np.int64)
    d = daily["d"].to_numpy(np.int64)
    runmax = np.maximum.accumulate(y)
    is_rec = np.r_[True, y[1:] > runmax[:-1]]
    return pd.DataFrame({
        "n_days": np.array([len(y)], np.int64),
        "n_records": np.array([int(is_rec.sum())], np.int64),
        "last_record_day": np.array([int(d[is_rec][-1])], np.int64),
        "max_y": np.array([int(y.max())], np.int64)})


@register("weekly_churn_retention", sql="""
WITH uw AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 // 7 AS w
            FROM events),
b AS (SELECT MIN(w) AS wmin, MAX(w) AS wmax FROM uw),
f AS (SELECT u.user_id, u.w,
             EXISTS(SELECT 1 FROM uw n WHERE n.user_id = u.user_id
                    AND n.w = u.w + 1) AS nxt,
             EXISTS(SELECT 1 FROM uw p WHERE p.user_id = u.user_id
                    AND p.w = u.w - 1) AS prv
      FROM uw u)
SELECT CAST(w AS BIGINT) AS week,
       CAST(COUNT(*) AS BIGINT) AS active,
       CAST(SUM(CASE WHEN w < (SELECT wmax FROM b) AND nxt
                     THEN 1 ELSE 0 END) AS BIGINT) AS retained,
       CAST(SUM(CASE WHEN w < (SELECT wmax FROM b) AND NOT nxt
                     THEN 1 ELSE 0 END) AS BIGINT) AS churned,
       CAST(SUM(CASE WHEN w > (SELECT wmin FROM b) AND NOT prv
                     THEN 1 ELSE 0 END) AS BIGINT) AS new_users
FROM f GROUP BY w ORDER BY 1""")
def weekly_churn_retention(sf_dir: str) -> pd.DataFrame:
    """Weekly churn decomposition: per epoch-week, the active users
    split into retained (also active next week), churned (not), and
    new (not active the week before) — THE growth-accounting table
    (net change = new − churned). Conventions shared with the
    oracle: the last observed week produces no retained/churned (no
    next week to test), the first produces no new. Scale shape: one
    distinct (user, week) reduce, then the user-hash bucket answers
    both neighbor-presence tests from each user's OWN sorted week
    row (next/prev row ±1 — weeks are unique per user, so adjacency
    is a shift compare, no join); only per-week flag partials
    shuffle."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "w": (us // 86_400_000_000 // 7).astype(np.int64)}) \
            .drop_duplicates()

    uw = reduce_sink(ds.map_batches(pairs, batch_format="pyarrow"),
                     ["user_id", "w"], {"n": ("w", "size")})
    bounds = uw.map_batches(
        lambda df: pd.DataFrame({"mn": [df["w"].min()],
                                 "mx": [df["w"].max()]}),
        batch_format="pandas").to_pandas()
    wmin, wmax = int(bounds["mn"].min()), int(bounds["mx"].max())

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "w"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        same_n = np.zeros(len(g), bool)
        same_n[:-1] = (u[:-1] == u[1:]) & (w[1:] == w[:-1] + 1)
        same_p = np.zeros(len(g), bool)
        same_p[1:] = (u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1)
        part = pd.DataFrame({
            "week": w,
            "active": 1,
            "retained": ((w < wmax) & same_n).astype(np.int64),
            "churned": ((w < wmax) & ~same_n).astype(np.int64),
            "new_users": ((w > wmin) & ~same_p).astype(np.int64)})
        return part.groupby("week", as_index=False).sum()

    out = reduce_sink(
        uw.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: flags(g.drop(columns=["bucket_",
                                                    "n"])),
                    batch_format="pandas"),
        ["week"], {"active": ("active", "sum"),
                   "retained": ("retained", "sum"),
                   "churned": ("churned", "sum"),
                   "new_users": ("new_users", "sum")}).to_pandas()
    return out.sort_values("week", ignore_index=True)


@register("dau_mau_stickiness", sql="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
           FROM events),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM d GROUP BY 1),
mau AS (SELECT days.day,
               CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS mau
        FROM days JOIN d ON d.day > days.day - 30
                        AND d.day <= days.day
        GROUP BY days.day)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
       ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day ORDER BY 1""")
def dau_mau_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU/MAU stickiness per day — the engagement-frequency ratio
    (1.0 = everyone active monthly shows up daily) that WAU's 7-day
    machinery extends to the 30-day window: the distinct (day, user)
    reduce bounds the data, each pair flat-maps to its ≤30 window
    anchors for the rolling-distinct MAU (exact two-phase distinct —
    no sketch), DAU reuses the same pair table, and the ratio is one
    shared division per observed day."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "day": (us // 86_400_000_000).astype(np.int64),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()

    pairs = reduce_sink(ds.map_batches(day_pairs,
                                       batch_format="pyarrow"),
                        ["day", "user_id"], {"n": ("day", "size")})
    dau = reduce_sink(pairs, ["day"], {"dau": ("n", "size")}) \
        .to_pandas()
    days = np.sort(dau["day"].to_numpy(np.int64))
    days_ref = ray.put(days)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        anchors = ray.get(days_ref)
        d = df["day"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        lo = np.searchsorted(anchors, d, side="left")
        hi = np.searchsorted(anchors, d + 30, side="left")
        reps = (hi - lo).astype(np.int64)
        cum = np.cumsum(reps)
        starts = np.repeat(cum - reps, reps)
        offs = np.arange(cum[-1] if len(df) else 0) - starts
        a_idx = np.repeat(lo, reps) + offs
        return pd.DataFrame({"anchor": anchors[a_idx],
                             "user_id": np.repeat(u, reps)}) \
            .drop_duplicates()

    mau = distinct_count(
        pairs.map_batches(expand, batch_format="pandas"),
        ["anchor"], "user_id", "mau").to_pandas() \
        .rename(columns={"anchor": "day"})
    out = dau.merge(mau, on="day")
    r6 = textstats.round_half_away
    out["stickiness"] = r6(out["dau"].to_numpy(np.float64)
                           / out["mau"].to_numpy(np.float64), 6)
    out["day"] = pd.to_datetime(out["day"] * 86_400_000_000,
                                unit="us").dt.strftime("%Y-%m-%d")
    return out[["day", "dau", "mau", "stickiness"]] \
        .astype({"dau": np.int64, "mau": np.int64}) \
        .sort_values("day", ignore_index=True)


@register("type_daily_cov_matrix", sql="""
WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type AS g,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
t AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS t FROM d0),
m AS (SELECT g, CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss FROM d0 GROUP BY g),
x AS (SELECT a.g AS ga, b.g AS gb,
             CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
      FROM d0 a JOIN d0 b ON a.d = b.d AND a.g < b.g GROUP BY 1, 2),
pairs AS (SELECT ga, gb, sxy FROM x
          UNION ALL SELECT g, g, ss FROM m)
SELECT p.ga AS type_a, p.gb AS type_b,
       ROUND((p.sxy - CAST(ma.s AS DOUBLE) * mb.s / t.t) / t.t, 6)
           AS cov,
       CASE WHEN (ma.ss - CAST(ma.s AS DOUBLE) * ma.s / t.t)
                 * (mb.ss - CAST(mb.s AS DOUBLE) * mb.s / t.t) = 0
            THEN 0.0
            ELSE ROUND((p.sxy - CAST(ma.s AS DOUBLE) * mb.s / t.t)
                       / sqrt((ma.ss - CAST(ma.s AS DOUBLE) * ma.s
                               / t.t)
                              * (mb.ss - CAST(mb.s AS DOUBLE) * mb.s
                                 / t.t)), 6)
       END AS corr
FROM pairs p JOIN m ma ON p.ga = ma.g JOIN m mb ON p.gb = mb.g, t
ORDER BY 1, 2""")
def type_daily_cov_matrix(sf_dir: str) -> pd.DataFrame:
    """Covariance and correlation matrix of the daily volumes across
    event types — the multivariate co-movement profile ('do errors
    spike with clicks?') behind any cross-metric alerting rule. The
    zero-filled cross products need NO day spine: absent days
    contribute 0 to Σyₐy_b, so the one (day, type) reduce plus a
    same-day pair join of the TINY aggregate carries everything;
    marginal and cross moments stay exact integers, and cov/corr
    are shared float expressions over identical operands (population
    convention, ÷T observed days). Upper triangle incl. diagonal,
    |types|² rows total."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str)})

    d0 = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "g"], {"c": ("d", "size")}).to_pandas()
    t = int(d0["d"].nunique())
    types = sorted(d0["g"].unique())
    grid = d0.pivot_table(index="d", columns="g", values="c",
                          fill_value=0, aggfunc="sum") \
        .reindex(columns=types, fill_value=0).to_numpy(np.int64)
    r6 = textstats.round_half_away
    rows = []
    for i, ga in enumerate(types):
        for j in range(i, len(types)):
            gb = types[j]
            sxy = int((grid[:, i] * grid[:, j]).sum())
            sa, sb = int(grid[:, i].sum()), int(grid[:, j].sum())
            ssa = int((grid[:, i] * grid[:, i]).sum())
            ssb = int((grid[:, j] * grid[:, j]).sum())
            cov = r6((sxy - float(sa) * sb / t) / t, 6)
            va = ssa - float(sa) * sa / t
            vb = ssb - float(sb) * sb / t
            corr = 0.0 if va * vb == 0 else \
                r6((sxy - float(sa) * sb / t) / np.sqrt(va * vb), 6)
            rows.append((ga, gb, float(cov), float(corr)))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "cov",
                                       "corr"]) \
        .sort_values(["type_a", "type_b"], ignore_index=True)


@register("seasonal_residual_anomalies", sql="""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 - 19723 AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(CAST(d AS DOUBLE)) AS sx, SUM(y) AS sy,
             SUM(CAST(d AS DOUBLE) * y) AS sxy,
             SUM(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) AS sxx
      FROM daily),
f AS (SELECT d, y,
             (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)
                 * CAST(d AS DOUBLE)
             + (s.sy - (s.n * s.sxy - s.sx * s.sy)
                       / (s.n * s.sxx - s.sx * s.sx) * s.sx) / s.n
                 AS fit
      FROM daily, s),
sea AS (SELECT (d + 19723 + 4) % 7 AS dow, AVG(y - fit) AS seasonal
        FROM f GROUP BY 1),
r AS (SELECT CAST(f.d + 19723 AS BIGINT) AS epoch_day,
             CAST(f.y AS BIGINT) AS observed,
             ROUND(f.y - f.fit - sea.seasonal, 6) AS residual
      FROM f JOIN sea ON (f.d + 19723 + 4) % 7 = sea.dow)
SELECT epoch_day, observed, residual
FROM r ORDER BY ABS(residual) DESC, epoch_day LIMIT 3""")
def seasonal_residual_anomalies(sf_dir: str) -> pd.DataFrame:
    """Top-3 anomalous days AFTER removing trend and weekly
    seasonality — what daily_seasonal_decompose exists for: the raw
    series' biggest days are just Mondays; the biggest RESIDUALS are
    incidents. Reuses the decompose pipeline verbatim (same one
    daily reduce, same closed-form float path) and ranks on the
    6-dp-ROUNDED residual magnitude with day tiebreak, so the cut
    is deterministic on both engines."""
    dec = daily_seasonal_decompose(sf_dir)
    dec = dec.assign(absr=dec["residual"].abs())
    out = dec.sort_values(["absr", "epoch_day"],
                          ascending=[False, True],
                          kind="mergesort").head(3)
    return out[["epoch_day", "observed", "residual"]] \
        .reset_index(drop=True)


@register("type_activity_span", sql="""
WITH d0 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d
            FROM events),
g AS (SELECT event_type, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days,
             CAST(MIN(d) AS BIGINT) AS first_day,
             CAST(MAX(d) AS BIGINT) AS last_day
      FROM d0 GROUP BY 1)
SELECT event_type, n_days, first_day, last_day,
       ROUND(CAST(n_days AS DOUBLE) / (last_day - first_day + 1), 6)
           AS coverage
FROM g ORDER BY 1""")
def type_activity_span(sf_dir: str) -> pd.DataFrame:
    """Per-type activity span and sparsity: first/last active day,
    distinct active days, and coverage = active/(span) — the
    data-availability profile consulted before trusting any per-type
    time series (a 0.3-coverage type can't feed a daily model).
    One (type, day) distinct reduce; min/max/count combine as
    ordinary partials; a single shared division per type."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "d": (us // 86_400_000_000).astype(np.int64)}) \
            .drop_duplicates()

    pairs = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["event_type", "d"], {"n": ("d", "size")})
    g = reduce_sink(pairs, ["event_type"],
                    {"n_days": ("d", "size"),
                     "first_day": ("d", "min"),
                     "last_day": ("d", "max")}).to_pandas()
    r6 = textstats.round_half_away
    g["coverage"] = r6(
        g["n_days"].to_numpy(np.float64)
        / (g["last_day"].to_numpy(np.int64)
           - g["first_day"].to_numpy(np.int64) + 1), 6)
    return g.astype({"n_days": np.int64, "first_day": np.int64,
                     "last_day": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("purchase_rate_stump_split", sql="""
WITH g AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS s
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS BIGINT) AS ss FROM g),
th AS (SELECT UNNEST(generate_series(0, 22)) AS cut),
pre AS (SELECT th.cut,
               CAST(SUM(CASE WHEN g.h <= th.cut THEN g.n
                             ELSE 0 END) AS BIGINT) AS nl,
               CAST(SUM(CASE WHEN g.h <= th.cut THEN g.s
                             ELSE 0 END) AS BIGINT) AS sl
        FROM th, g GROUP BY th.cut),
ig AS (SELECT cut, nl, sl,
              (CASE WHEN ss = 0 OR ss = nn THEN 0.0
                    ELSE -(CAST(ss AS DOUBLE) / nn)
                         * LN(CAST(ss AS DOUBLE) / nn)
                         - (CAST(nn - ss AS DOUBLE) / nn)
                         * LN(CAST(nn - ss AS DOUBLE) / nn) END)
              - (CAST(nl AS DOUBLE) / nn)
                * (CASE WHEN nl = 0 OR sl = 0 OR sl = nl THEN 0.0
                        ELSE -(CAST(sl AS DOUBLE) / nl)
                             * LN(CAST(sl AS DOUBLE) / nl)
                             - (CAST(nl - sl AS DOUBLE) / nl)
                             * LN(CAST(nl - sl AS DOUBLE) / nl) END)
              - (CAST(nn - nl AS DOUBLE) / nn)
                * (CASE WHEN nn - nl = 0 OR ss - sl = 0
                             OR ss - sl = nn - nl THEN 0.0
                        ELSE -(CAST(ss - sl AS DOUBLE) / (nn - nl))
                             * LN(CAST(ss - sl AS DOUBLE) / (nn - nl))
                             - (CAST((nn - nl) - (ss - sl) AS DOUBLE)
                                / (nn - nl))
                             * LN(CAST((nn - nl) - (ss - sl)
                                       AS DOUBLE) / (nn - nl)) END)
                  AS gain
       FROM pre, t),
best AS (SELECT cut, nl, sl, gain,
                ROW_NUMBER() OVER (ORDER BY ROUND(gain, 9) DESC, cut)
                    AS rn
         FROM ig)
SELECT CAST(cut AS BIGINT) AS best_cut_hour, nl AS n_left,
       sl AS s_left, ROUND(gain, 6) AS info_gain
FROM best WHERE rn = 1""")
def purchase_rate_stump_split(sf_dir: str) -> pd.DataFrame:
    """Decision-stump split finder: the hour-of-day threshold whose
    binary split (hour ≤ h vs >) maximizes information gain on the
    purchase label — the C4.5/CART inner loop as a standalone
    operator, the first thing feature-importance tooling computes.
    All 23 candidate splits evaluate from ONE 24-row (hour, n,
    successes) reduce via prefix integers; the three guarded binary
    entropies are one shared float expression, and the argmax ranks
    on the 9-dp-ROUNDED gain with smallest-hour tiebreak so a
    hairline can't flip the winner."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": df["ts"].dt.hour.to_numpy(np.int64),
            "s": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["h"], {"n": ("s", "size"), "s": ("s", "sum")}) \
        .to_pandas().sort_values("h", ignore_index=True)
    full = np.zeros(24, np.int64)
    suc = np.zeros(24, np.int64)
    full[g["h"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
    suc[g["h"].to_numpy(np.int64)] = g["s"].to_numpy(np.int64)
    nn, ss = int(full.sum()), int(suc.sum())

    def hent(s, n):
        if n == 0 or s == 0 or s == n:
            return 0.0
        return -(float(s) / n) * np.log(float(s) / n) \
            - (float(n - s) / n) * np.log(float(n - s) / n)

    r9 = textstats.round_half_away
    h_root = hent(ss, nn)
    best = None
    for cut in range(23):
        nl = int(full[:cut + 1].sum())
        sl = int(suc[:cut + 1].sum())
        gain = h_root - (float(nl) / nn) * hent(sl, nl) \
            - (float(nn - nl) / nn) * hent(ss - sl, nn - nl)
        key = (-r9(gain, 9), cut)
        if best is None or key < best[0]:
            best = (key, cut, nl, sl, gain)
    _, cut, nl, sl, gain = best
    return pd.DataFrame({
        "best_cut_hour": np.array([cut], np.int64),
        "n_left": np.array([nl], np.int64),
        "s_left": np.array([sl], np.int64),
        "info_gain": [float(r9(gain, 6))]})


@register("heaps_law_sources", sql=r"""
WITH w AS (SELECT source,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1, 2),
g AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hapax
      FROM c GROUP BY 1),
f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
             SUM(LN(CAST(n_tokens AS DOUBLE))) AS sx,
             SUM(LN(CAST(vocab AS DOUBLE))) AS sy,
             SUM(LN(CAST(n_tokens AS DOUBLE))
                 * LN(CAST(vocab AS DOUBLE))) AS sxy,
             SUM(LN(CAST(n_tokens AS DOUBLE))
                 * LN(CAST(n_tokens AS DOUBLE))) AS sxx
      FROM g)
SELECT g.source, g.n_tokens, g.vocab, g.hapax,
       CASE WHEN f.k * f.sxx - f.sx * f.sx = 0 THEN 0.0
            ELSE ROUND((f.k * f.sxy - f.sx * f.sy)
                       / (f.k * f.sxx - f.sx * f.sx), 6)
       END AS heaps_beta
FROM g, f ORDER BY g.source""")
def heaps_law_sources(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary growth across sources: per-source token
    count, distinct vocabulary, hapax legomena (once-words — the
    OCR-garbage / topic-breadth signal), plus the fitted Heaps
    exponent β from the log-log OLS of vocab on tokens over the
    source points (natural prose sits β ≈ 0.4–0.6; β → 1 screams
    unique-token noise). One (source, word) count reduce bounds
    everything at vocabulary cardinality; per-source rollups are
    integer partials, and β is the shared closed-form OLS over
    ≤|sources| log points (constant column, degenerate-variance
    guard)."""
    def words(batch: pa.Table) -> pd.DataFrame:
        src = batch["source"].to_pandas()
        w = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), r"\s+")
        counts = pc.list_value_length(w).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(w).to_pandas()
        rep = np.repeat(src.to_numpy(), counts)
        df = pd.DataFrame({"source": rep, "word": flat})
        df = df[df["word"].str.len() > 0]
        return df.groupby(["source", "word"], as_index=False) \
            .size().rename(columns={"size": "cnt"})

    c = reduce_sink(
        _docs(sf_dir, ["text", "source"]).map_batches(
            words, batch_format="pyarrow"),
        ["source", "word"], {"cnt": ("cnt", "sum")})

    g = reduce_sink(
        c.map_batches(
            lambda df: df.assign(one=(df["cnt"] == 1)
                                 .astype(np.int64))
            .groupby("source", as_index=False)
            .agg(n_tokens=("cnt", "sum"), vocab=("cnt", "size"),
                 hapax=("one", "sum")),
            batch_format="pandas"),
        ["source"], {"n_tokens": ("n_tokens", "sum"),
                     "vocab": ("vocab", "sum"),
                     "hapax": ("hapax", "sum")}).to_pandas() \
        .sort_values("source", ignore_index=True)
    k = len(g)
    x = np.log(g["n_tokens"].to_numpy(np.float64))
    y = np.log(g["vocab"].to_numpy(np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxy = float((x * y).sum())
    sxx = float((x * x).sum())
    den = k * sxx - sx * sx
    r6 = textstats.round_half_away
    beta = 0.0 if den == 0 else r6((k * sxy - sx * sy) / den, 6)
    g["heaps_beta"] = float(beta)
    return g.astype({"n_tokens": np.int64, "vocab": np.int64,
                     "hapax": np.int64})


@register("lincoln_petersen_user_estimate", sql="""
WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d
           FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
u AS (SELECT user_id,
             CAST(MAX(CASE WHEN d < cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS p1,
             CAST(MAX(CASE WHEN d >= cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS p2
      FROM b, sp GROUP BY user_id),
c AS (SELECT CAST(SUM(p1) AS BIGINT) AS n1,
             CAST(SUM(p2) AS BIGINT) AS n2,
             CAST(SUM(p1 * p2) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM u)
SELECT n1, n2, m, observed,
       CASE WHEN m = 0 THEN 0.0
            ELSE ROUND(CAST(n1 AS DOUBLE) * n2 / m, 6) END AS n_hat,
       ROUND(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 6)
           AS n_hat_chapman
FROM c""")
def lincoln_petersen_user_estimate(sf_dir: str) -> pd.DataFrame:
    """Capture–recapture population estimate: treat the two halves of
    the date range as capture occasions and estimate the TOTAL user
    population (including never-seen users) as N̂ = n₁n₂/m — the
    ecology-textbook mark–recapture estimator applied to 'how many
    users exist if each half samples them independently', with
    Chapman's bias-corrected (n₁+1)(n₂+1)/(m+1) − 1 alongside. One
    per-user MAX-flag reduce (the same shape as McNemar); the four
    cells are exact integers; both estimates are single shared
    divisions (m = 0 pins the raw estimate to 0)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64)})

    base = _events(sf_dir, ["ts", "user_id"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "p1": (df["d"] < cut).astype(np.int64),
            "p2": (df["d"] >= cut).astype(np.int64)})

    u = reduce_sink(base.map_batches(flags, batch_format="pandas"),
                    ["user_id"], {"p1": ("p1", "max"),
                                  "p2": ("p2", "max")}).to_pandas()
    n1 = int(u["p1"].sum())
    n2 = int(u["p2"].sum())
    m = int((u["p1"] * u["p2"]).sum())
    obs = len(u)
    r6 = textstats.round_half_away
    n_hat = 0.0 if m == 0 else r6(float(n1) * n2 / m, 6)
    chap = r6(float(n1 + 1) * (n2 + 1) / (m + 1) - 1, 6)
    return pd.DataFrame({"n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "m": np.array([m], np.int64),
                         "observed": np.array([obs], np.int64),
                         "n_hat": [float(n_hat)],
                         "n_hat_chapman": [float(chap)]})


@register("weekend_purchase_odds_ratio", sql="""
WITH b AS (SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS s
           FROM events),
c AS (SELECT CAST(SUM(CASE WHEN wkd = 1 AND s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN wkd = 1 AND s = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bb,
             CAST(SUM(CASE WHEN wkd = 0 AND s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cc,
             CAST(SUM(CASE WHEN wkd = 0 AND s = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM b)
SELECT a, bb AS b, cc AS c, d,
       CASE WHEN bb * cc = 0 THEN 0.0
            ELSE ROUND(CAST(a AS DOUBLE) * d
                       / (CAST(bb AS DOUBLE) * cc), 6) END
           AS odds_ratio,
       CASE WHEN a * bb * cc * d = 0 THEN 0.0
            ELSE ROUND(EXP(LN(CAST(a AS DOUBLE) * d
                              / (CAST(bb AS DOUBLE) * cc))
                           - 1.96 * sqrt(1.0 / a + 1.0 / bb
                                         + 1.0 / cc + 1.0 / d)), 6)
       END AS ci_lo,
       CASE WHEN a * bb * cc * d = 0 THEN 0.0
            ELSE ROUND(EXP(LN(CAST(a AS DOUBLE) * d
                              / (CAST(bb AS DOUBLE) * cc))
                           + 1.96 * sqrt(1.0 / a + 1.0 / bb
                                         + 1.0 / cc + 1.0 / d)), 6)
       END AS ci_hi
FROM c""")
def weekend_purchase_odds_ratio(sf_dir: str) -> pd.DataFrame:
    """Odds ratio of purchasing on weekends vs weekdays with the
    Woolf 95% log-CI — the epidemiology-standard 2×2 effect size
    (an OR CI excluding 1 = the weekend effect is real). One pass of
    four integer cell partials per block ((epoch+4)%7 ∈ {0,6} is the
    shared Sunday/Saturday test); OR = ad/bc and exp(ln OR ±
    1.96·√(Σ1/cell)) are shared float expressions; any empty cell
    short-circuits the CI (and bc = 0 the OR) to 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wkd = ((us // 86_400_000_000 + 4) % 7)
        wkd = ((wkd == 0) | (wkd == 6)).astype(np.int64)
        s = (df["event_type"] == "purchase").to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({
            "a": [np.int64(((wkd == 1) & (s == 1)).sum())],
            "b": [np.int64(((wkd == 1) & (s == 0)).sum())],
            "c": [np.int64(((wkd == 0) & (s == 1)).sum())],
            "d": [np.int64(((wkd == 0) & (s == 0)).sum())]})

    cells = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(prep, batch_format="pandas").to_pandas().sum()
    a, b = int(cells["a"]), int(cells["b"])
    c, d = int(cells["c"]), int(cells["d"])
    r6 = textstats.round_half_away
    if b * c == 0:
        orr = 0.0
    else:
        orr = r6(float(a) * d / (float(b) * c), 6)
    if a * b * c * d == 0:
        lo = hi = 0.0
    else:
        lnor = np.log(float(a) * d / (float(b) * c))
        se = np.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
        lo = r6(np.exp(lnor - 1.96 * se), 6)
        hi = r6(np.exp(lnor + 1.96 * se), 6)
    return pd.DataFrame({"a": np.array([a], np.int64),
                         "b": np.array([b], np.int64),
                         "c": np.array([c], np.int64),
                         "d": np.array([d], np.int64),
                         "odds_ratio": [float(orr)],
                         "ci_lo": [float(lo)], "ci_hi": [float(hi)]})


@register("daily_vmr_by_type", sql="""
WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type AS g,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
t AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS t FROM d0),
m AS (SELECT g, CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss FROM d0 GROUP BY g)
SELECT g AS event_type, (SELECT t FROM t) AS t_days, s, ss,
       ROUND(CAST(s AS DOUBLE) / (SELECT t FROM t), 6) AS mean,
       CASE WHEN s = 0 THEN 0.0
            ELSE ROUND((CAST(ss AS DOUBLE) / (SELECT t FROM t)
                        - (CAST(s AS DOUBLE) / (SELECT t FROM t))
                        * (CAST(s AS DOUBLE) / (SELECT t FROM t)))
                       / (CAST(s AS DOUBLE) / (SELECT t FROM t)), 6)
       END AS vmr
FROM m ORDER BY 1""")
def daily_vmr_by_type(sf_dir: str) -> pd.DataFrame:
    """Variance-to-mean ratio (index of dispersion) of each type's
    daily counts over the GLOBAL observed-day universe (absent days
    are real zeros and contribute only through T) — the Poisson
    diagnostic: VMR ≈ 1 means memoryless arrivals, ≫ 1 means
    bursty/clustered days, ≪ 1 means scheduled/quota-like. Integer
    (Σc, Σc²) moments off the one (day, type) reduce; mean and the
    population VMR are shared float expressions with a zero-count
    guard."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str)})

    d0 = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "g"], {"c": ("d", "size")}).to_pandas()
    t = int(d0["d"].nunique())
    r6 = textstats.round_half_away
    rows = []
    for g, grp in d0.groupby("g", sort=True):
        c = grp["c"].to_numpy(np.int64)
        s, ss = int(c.sum()), int((c * c).sum())
        mean = float(s) / t
        vmr = 0.0 if s == 0 else \
            r6((float(ss) / t - mean * mean) / mean, 6)
        rows.append((g, t, s, ss, float(r6(mean, 6)), float(vmr)))
    return pd.DataFrame(rows, columns=["event_type", "t_days", "s",
                                       "ss", "mean", "vmr"]) \
        .astype({"t_days": np.int64, "s": np.int64, "ss": np.int64})


@register("session_type_never_pairs", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sid),
types AS (SELECT DISTINCT event_type AS g FROM st),
seen AS (SELECT DISTINCT a.event_type AS ga, b.event_type AS gb
         FROM st a JOIN st b ON a.user_id = b.user_id
                            AND a.sid = b.sid
                            AND a.event_type < b.event_type),
cnt AS (SELECT event_type AS g,
               CAST(COUNT(DISTINCT user_id || '#' || sid) AS BIGINT)
                   AS sessions
        FROM st GROUP BY 1)
SELECT ta.g AS type_a, tb.g AS type_b,
       ca.sessions AS sessions_a, cb.sessions AS sessions_b
FROM types ta JOIN types tb ON ta.g < tb.g
JOIN cnt ca ON ca.g = ta.g JOIN cnt cb ON cb.g = tb.g
WHERE NOT EXISTS (SELECT 1 FROM seen
                  WHERE seen.ga = ta.g AND seen.gb = tb.g)
ORDER BY 1, 2""")
def session_type_never_pairs(sf_dir: str) -> pd.DataFrame:
    """Anti-pattern mining: type pairs that NEVER share a session —
    the co-absence complement of session_type_pairs (a pair of
    features that never co-fire is a product-flow wall or an
    instrumentation bug). The distinct (session, type) reduce and
    the within-bucket pair self-merge are the market-basket
    machinery verbatim; the driver subtracts the observed pair set
    from the |types|² universe and annotates each type's session
    support. Empty result = every pair co-occurs (the common case on
    dense data; planted walls surface it)."""
    sess = _sessionized_events(sf_dir)

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "sid", "event_type"]].drop_duplicates()

    st = reduce_sink(
        sess.map_batches(strip, batch_format="pandas"),
        ["user_id", "sid", "event_type"], {"n": ("sid", "size")})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        j = g.merge(g, on=["user_id", "sid"])
        j = j[j["event_type_x"] < j["event_type_y"]]
        return j[["event_type_x", "event_type_y"]].drop_duplicates() \
            .rename(columns={"event_type_x": "ga",
                             "event_type_y": "gb"})

    seen = reduce_sink(
        st.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: pairs(g.drop(columns=["bucket_", "n"])),
                    batch_format="pandas"),
        ["ga", "gb"], {"n": ("ga", "size")}).to_pandas()
    seen_set = set(zip(seen["ga"], seen["gb"]))
    cnt = reduce_sink(st, ["event_type"],
                      {"sessions": ("n", "size")}).to_pandas()
    support = dict(zip(cnt["event_type"], cnt["sessions"]))
    types = sorted(support)
    rows = [(a, b, int(support[a]), int(support[b]))
            for i, a in enumerate(types) for b in types[i + 1:]
            if (a, b) not in seen_set]
    return pd.DataFrame(rows, columns=["type_a", "type_b",
                                       "sessions_a", "sessions_b"]) \
        .astype({"sessions_a": np.int64, "sessions_b": np.int64}) \
        .sort_values(["type_a", "type_b"], ignore_index=True)


@register("cross_fact_value_corr", sql="""
WITH e AS (SELECT user_id AS k,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS x
           FROM events GROUP BY 1),
o AS (SELECT o_custkey AS k,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1),
j AS (SELECT e.x, o.y FROM e JOIN o ON e.k = o.k),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM j)
SELECT n, CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0
            THEN 0.0
            ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)),
                       6)
       END AS pearson_r
FROM m""")
def cross_fact_value_corr(sf_dir: str) -> pd.DataFrame:
    """Cross-fact value correlation: does a user's BEHAVIORAL spend
    (event value) track their COMMERCIAL spend (order totals)? —
    the identity-resolution sanity number computed over users
    present in both facts. Both per-key reduces stay distributed;
    the inner join happens inside user-hash buckets; per-block
    moment partials use the gini-style two-word (hi, lo) int64
    transport because Σxy/Σx²/Σy² overflow a single int64 by design
    (the oracle goes HUGEINT), so Pearson closes from EXACT integers
    with one shared division."""
    ev = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "k": df["user_id"].to_numpy(np.int64),
                "x": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64),
                "y": np.zeros(len(df), np.int64),
                "fe": np.ones(len(df), np.int64),
                "fo": np.zeros(len(df), np.int64)}),
            batch_format="pandas"),
        ["k"], {"x": ("x", "sum"), "y": ("y", "sum"),
                "fe": ("fe", "max"), "fo": ("fo", "max")})
    orders = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda df: pd.DataFrame({
                "k": df["o_custkey"].to_numpy(np.int64),
                "x": np.zeros(len(df), np.int64),
                "y": np.rint(df["o_totalprice"]
                             .to_numpy(np.float64) * 100)
                .astype(np.int64),
                "fe": np.zeros(len(df), np.int64),
                "fo": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["k"], {"x": ("x", "sum"), "y": ("y", "sum"),
                "fe": ("fe", "max"), "fo": ("fo", "max")})
    merged = reduce_sink(
        ev.union(orders), ["k"],
        {"x": ("x", "sum"), "y": ("y", "sum"),
         "fe": ("fe", "max"), "fo": ("fo", "max")})

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["fe"] == 1) & (df["fo"] == 1)]
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        xo = x.astype(object)
        yo = y.astype(object)
        sxy = int((xo * yo).sum()) if len(x) else 0
        sxx = int((xo * xo).sum()) if len(x) else 0
        syy = int((yo * yo).sum()) if len(y) else 0
        row = {"n": [np.int64(len(df))],
               "sx": [np.int64(x.sum() if len(x) else 0)],
               "sy": [np.int64(y.sum() if len(y) else 0)]}
        for name, v in (("sxy", sxy), ("sxx", sxx), ("syy", syy)):
            hi, lo = divmod(v, 1 << 62)
            row[name + "_hi"] = [np.int64(hi)]
            row[name + "_lo"] = [np.int64(lo)]
        return pd.DataFrame(row)

    p = merged.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())

    def word(sfx):
        return sum(int(h) * (1 << 62) + int(l)
                   for h, l in zip(p[sfx + "_hi"], p[sfx + "_lo"]))

    sxy, sxx, syy = word("sxy"), word("sxx"), word("syy")
    r6 = textstats.round_half_away
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r = 0.0 if den == 0 else \
        r6(float(n * sxy - sx * sy)
           / np.sqrt(float(n * sxx - sx * sx)
                     * float(n * syy - sy * sy)), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "sum_x": np.array([sx], np.int64),
                         "sum_y": np.array([sy], np.int64),
                         "pearson_r": [float(r)]})


@register("qq_slope_view_purchase", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS g2
           FROM events WHERE event_type IN ('view', 'purchase')),
h AS (SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(g2) AS BIGINT) AS c2 FROM c GROUP BY 1),
cum AS (SELECT cents,
               CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS f1,
               CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS f2
        FROM h),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM h),
q AS (SELECT UNNEST(generate_series(1, 9)) AS q),
dec AS (SELECT q.q,
               (SELECT MIN(cents) FROM cum, t
                WHERE 10 * f1 >= q.q * n1) AS qv,
               (SELECT MIN(cents) FROM cum, t
                WHERE 10 * f2 >= q.q * n2) AS qp
        FROM q),
f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
             SUM(CAST(qv AS DOUBLE)) AS sx,
             SUM(CAST(qp AS DOUBLE)) AS sy,
             SUM(CAST(qv AS DOUBLE) * qp) AS sxy,
             SUM(CAST(qv AS DOUBLE) * qv) AS sxx
      FROM dec)
SELECT CAST(dec.q AS BIGINT) AS q, CAST(dec.qv AS BIGINT) AS view_q,
       CAST(dec.qp AS BIGINT) AS purchase_q,
       CASE WHEN f.k * f.sxx - f.sx * f.sx = 0 THEN 0.0
            ELSE ROUND((f.k * f.sxy - f.sx * f.sy)
                       / (f.k * f.sxx - f.sx * f.sx), 6)
       END AS qq_slope
FROM dec, f ORDER BY 1""")
def qq_slope_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Q–Q comparison of the view and purchase value distributions:
    the nine deciles of each (lower-convention integer order
    statistics, 10·cum ≥ q·n) paired up, plus the OLS slope of the
    Q–Q line — the location-scale read ('purchases are views shifted
    AND stretched 1.4×') that a KS p-value can't give. One shared
    cents histogram; deciles are exact integers; the slope is the
    shared closed-form OLS over nine points (constant column,
    degenerate guard)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])]
        is_v = (df["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "g1": is_v.astype(np.int64),
            "g2": (~is_v).astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("g1", "sum"), "c2": ("g2", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c = h["cents"].to_numpy(np.int64)
    f1 = h["c1"].to_numpy(np.int64).cumsum()
    f2 = h["c2"].to_numpy(np.int64).cumsum()
    n1, n2 = int(f1[-1]), int(f2[-1])
    rows = []
    for q in range(1, 10):
        qv = int(c[np.searchsorted(10 * f1, q * n1, side="left")])
        qp = int(c[np.searchsorted(10 * f2, q * n2, side="left")])
        rows.append((q, qv, qp))
    dec = pd.DataFrame(rows, columns=["q", "view_q", "purchase_q"])
    x = dec["view_q"].to_numpy(np.float64)
    y = dec["purchase_q"].to_numpy(np.float64)
    k = float(len(dec))
    sx, sy = float(x.sum()), float(y.sum())
    sxy, sxx = float((x * y).sum()), float((x * x).sum())
    den = k * sxx - sx * sx
    r6 = textstats.round_half_away
    slope = 0.0 if den == 0 else r6((k * sxy - sx * sy) / den, 6)
    dec["qq_slope"] = float(slope)
    return dec.astype({"q": np.int64, "view_q": np.int64,
                       "purchase_q": np.int64})


@register("circadian_concentration", sql="""
WITH b AS (SELECT user_id,
                  2 * PI() * (epoch_us(ts) % 86400000000)
                      / 86400000000.0 AS th
           FROM events),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COS(th)) AS c, SUM(SIN(th)) AS s FROM b),
u AS (SELECT user_id, COUNT(*) AS n, SUM(COS(th)) AS c,
             SUM(SIN(th)) AS s
      FROM b GROUP BY user_id),
ur AS (SELECT AVG(sqrt(c * c + s * s) / n) AS mean_r,
              CAST(COUNT(*) AS BIGINT) AS n_users FROM u)
SELECT g.n AS n_events,
       ROUND(sqrt(g.c * g.c + g.s * g.s) / g.n, 6) AS r_global,
       ROUND((CASE WHEN atan2(g.s, g.c) < 0
                   THEN atan2(g.s, g.c) + 2 * PI()
                   ELSE atan2(g.s, g.c) END)
             / (2 * PI()) * 24, 6) AS mean_hour,
       ur.n_users, ROUND(ur.mean_r, 6) AS mean_user_r
FROM g, ur""")
def circadian_concentration(sf_dir: str) -> pd.DataFrame:
    """Circular statistics of event time-of-day: the mean resultant
    length R̄ = |Σe^{iθ}|/n (1 = everything at one instant, 0 =
    uniform around the clock), the circular mean hour via atan2, and
    the per-user average R̄ ('how clockwork are individuals') — the
    CORRECT way to average times-of-day, where naive means call
    23:50/00:10 'noon'. θ = 2π·(µs-of-day)/day is a shared per-row
    expression; per-batch (n, Σcos, Σsin) partials make the global
    resultant one reduce, and the per-user resultants vectorize in
    the same pass via a keyed reduce — float sums bounded well
    inside the 6-dp round."""
    ds = _events(sf_dir, ["ts", "user_id"])
    day_us = 86_400_000_000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        th = 2 * np.pi * (us % day_us) / float(day_us)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64),
            "c": np.cos(th), "s": np.sin(th)})

    per = reduce_sink(
        ds.map_batches(prep, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum"), "c": ("c", "sum"),
                      "s": ("s", "sum")}).to_pandas()
    n = int(per["n"].sum())
    cg, sg = float(per["c"].sum()), float(per["s"].sum())
    r6 = textstats.round_half_away
    r_global = r6(np.sqrt(cg * cg + sg * sg) / n, 6)
    a = float(np.arctan2(sg, cg))
    if a < 0:
        a = a + 2 * np.pi
    mean_hour = r6(a / (2 * np.pi) * 24, 6)
    ur = (np.sqrt(per["c"].to_numpy(np.float64) ** 2
                  + per["s"].to_numpy(np.float64) ** 2)
          / per["n"].to_numpy(np.float64))
    n_users = len(per)
    mean_user_r = r6(float(ur.sum()) / n_users, 6)
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "r_global": [float(r_global)],
        "mean_hour": [float(mean_hour)],
        "n_users": np.array([n_users], np.int64),
        "mean_user_r": [float(mean_user_r)]})


@register("dup_rate_by_source", sql="""
WITH h AS (SELECT source, md5(text) AS fp,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS docs,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS dup_docs,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END)
            AS BIGINT) AS removable,
       ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                  AS DOUBLE) / SUM(cnt), 6) AS dup_rate
FROM h GROUP BY 1 ORDER BY 1""")
def dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate pressure per source: the share of docs whose
    text appears more than once WITHIN their source, and how many a
    dedup pass would remove — the per-provider quality scorecard
    that decides which feeds need cleaning (a 30%-dup source is a
    scraper bug, not content). Docs fingerprint map-side (md5 of the
    text — the oracle's function, hex-string equality); only
    (source, fp, cnt) aggregate rows shuffle, never text; the
    per-source rollup is integer partials plus one division."""
    import hashlib

    def fp(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in texts],
            "cnt": np.ones(len(texts), np.int64)})

    h = reduce_sink(
        _docs(sf_dir, ["text", "source"]).map_batches(
            fp, batch_format="pyarrow"),
        ["source", "fp"], {"cnt": ("cnt", "sum")})

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        dup = np.where(df["cnt"] > 1, df["cnt"], 0)
        return pd.DataFrame({
            "source": df["source"],
            "docs": df["cnt"].to_numpy(np.int64),
            "dup_docs": dup.astype(np.int64),
            "removable": np.where(df["cnt"] > 1, df["cnt"] - 1, 0)
            .astype(np.int64)}).groupby("source", as_index=False) \
            .sum()

    out = reduce_sink(
        h.map_batches(rollup, batch_format="pandas"),
        ["source"], {"docs": ("docs", "sum"),
                     "dup_docs": ("dup_docs", "sum"),
                     "removable": ("removable", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    out["dup_rate"] = r6(out["dup_docs"].to_numpy(np.float64)
                         / out["docs"].to_numpy(np.float64), 6)
    return out.astype({"docs": np.int64, "dup_docs": np.int64,
                       "removable": np.int64}) \
        .sort_values("source", ignore_index=True)


@register("source_vocab_jaccard", sql=r"""
WITH w AS (SELECT DISTINCT source,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab
      FROM w GROUP BY 1),
inter AS (SELECT a.source AS sa, b.source AS sb,
                 CAST(COUNT(*) AS BIGINT) AS both
          FROM w a JOIN w b ON a.word = b.word
                           AND a.source < b.source
          GROUP BY 1, 2)
SELECT i.sa AS source_a, i.sb AS source_b, i.both,
       va.vocab AS vocab_a, vb.vocab AS vocab_b,
       ROUND(CAST(i.both AS DOUBLE)
             / (va.vocab + vb.vocab - i.both), 6) AS jaccard
FROM inter i JOIN v va ON i.sa = va.source
             JOIN v vb ON i.sb = vb.source
ORDER BY 1, 2""")
def source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mix
    similarity matrix ('are these two crawls the same content?')
    computed on WORD SETS, so it survives reordering and dedup.
    Scale shape: the distinct (source, word) reduce bounds the data
    at vocabulary cardinality; intersections come from a per-WORD
    expansion (each word's ≤|sources| list self-merges inside its
    hash bucket — the same bounded-alphabet trick as the co-purchase
    pass), so no all-pairs document work ever happens; only
    (source_a, source_b, both) partials shuffle. Pairs that share
    nothing simply don't appear (matching the oracle's inner
    join)."""
    def words(batch: pa.Table) -> pd.DataFrame:
        src = batch["source"].to_pandas()
        w = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), r"\s+")
        counts = pc.list_value_length(w).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(w).to_pandas()
        rep = np.repeat(src.to_numpy(), counts)
        df = pd.DataFrame({"source": rep, "word": flat})
        df = df[df["word"].str.len() > 0].drop_duplicates()
        return df

    sw = reduce_sink(
        _docs(sf_dir, ["text", "source"]).map_batches(
            words, batch_format="pyarrow"),
        ["source", "word"], {"n": ("word", "size")})
    v = reduce_sink(sw, ["source"], {"vocab": ("n", "size")}) \
        .to_pandas()
    vocab = dict(zip(v["source"], v["vocab"]))

    def wbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = pd.util.hash_array(
            df["word"].to_numpy(object)).astype(np.int64) % 64
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        j = g.merge(g, on="word")
        j = j[j["source_x"] < j["source_y"]]
        out = j.groupby(["source_x", "source_y"], as_index=False) \
            .size().rename(columns={"size": "both",
                                    "source_x": "sa",
                                    "source_y": "sb"})
        return out

    inter = reduce_sink(
        sw.map_batches(wbucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: pairs(g.drop(columns=["bucket_",
                                                    "n"])),
                    batch_format="pandas"),
        ["sa", "sb"], {"both": ("both", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    inter["vocab_a"] = inter["sa"].map(vocab).astype(np.int64)
    inter["vocab_b"] = inter["sb"].map(vocab).astype(np.int64)
    inter["jaccard"] = r6(
        inter["both"].to_numpy(np.float64)
        / (inter["vocab_a"].to_numpy(np.int64)
           + inter["vocab_b"].to_numpy(np.int64)
           - inter["both"].to_numpy(np.int64)).astype(np.float64), 6)
    out = inter.rename(columns={"sa": "source_a", "sb": "source_b"})
    return out[["source_a", "source_b", "both", "vocab_a",
                "vocab_b", "jaccard"]] \
        .astype({"both": np.int64}) \
        .sort_values(["source_a", "source_b"], ignore_index=True)


@register("exp_growth_fit_daily", sql="""
WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
b AS (SELECT MIN(d) AS mn FROM daily),
g AS (SELECT CAST(d - (SELECT mn FROM b) AS DOUBLE) AS t,
             LN(CAST(y AS DOUBLE)) AS ly
      FROM daily WHERE y > 0),
f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(t) AS sx,
             SUM(ly) AS sy, SUM(t * ly) AS sxy, SUM(t * t) AS sxx
      FROM g)
SELECT CAST(k AS BIGINT) AS n_days,
       CASE WHEN k * sxx - sx * sx = 0 THEN 0.0
            ELSE ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
       END AS daily_growth_rate,
       CASE WHEN k * sxx - sx * sx = 0
                 OR (k * sxy - sx * sy) / (k * sxx - sx * sx) <= 0
            THEN 0.0
            ELSE ROUND(LN(2) / ((k * sxy - sx * sy)
                                / (k * sxx - sx * sx)), 6)
       END AS doubling_days
FROM f""")
def exp_growth_fit_daily(sf_dir: str) -> pd.DataFrame:
    """Exponential growth fit: log-linear OLS of the daily volume
    (positive days only — ln 0 is not a data point) giving the
    continuous daily growth rate and the doubling time ln 2 / rate —
    what 'are we growing 5% a day?' actually asks, which the LINEAR
    trend query systematically underestimates on compounding data.
    One daily reduce; the closed-form OLS over (day-index, ln y)
    shares every operand; non-positive slope pins doubling_days to
    0 on both engines."""
    ds = _events(sf_dir, ["ts"])

    def day_col(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"d": (us // 86_400_000_000)
                             .astype(np.int64)})

    daily = reduce_sink(ds.map_batches(day_col, batch_format="pyarrow"),
                        ["d"], {"y": ("d", "size")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    daily = daily[daily["y"] > 0]
    mn = int(daily["d"].min())
    t = (daily["d"].to_numpy(np.int64) - mn).astype(np.float64)
    ly = np.log(daily["y"].to_numpy(np.float64))
    k = float(len(daily))
    sx, sy = float(t.sum()), float(ly.sum())
    sxy, sxx = float((t * ly).sum()), float((t * t).sum())
    den = k * sxx - sx * sx
    r6 = textstats.round_half_away
    if den == 0:
        rate, dbl = 0.0, 0.0
    else:
        raw = (k * sxy - sx * sy) / den
        rate = r6(raw, 6)
        dbl = 0.0 if raw <= 0 else r6(np.log(2) / raw, 6)
    return pd.DataFrame({
        "n_days": np.array([int(k)], np.int64),
        "daily_growth_rate": [float(rate)],
        "doubling_days": [float(dbl)]})


@register("log2_value_histogram", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
b AS (SELECT CASE WHEN cents <= 0 THEN -1
                  ELSE length(printf('%b', cents)) - 1 END AS band
      FROM c)
SELECT CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1""")
def log2_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Log-scale (powers-of-two) value histogram: band = ⌊log₂ c⌋
    computed as BIT LENGTH − 1, never as a float log — floor(log2(8))
    can land on 2.999… and misbin every power of two; the bit trick
    is exact by construction on both engines (the oracle uses the
    binary printf length). Non-positive cents pin to band −1. The
    standard heavy-tail-friendly binning for value dashboards; one
    map-side band + (band, n) partials."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        pos = c > 0
        band = np.full(len(c), -1, np.int64)
        # vectorized bit length: int64→float64 is EXACT for cents
        # (< 2^53), and frexp's exponent − 1 IS floor(log2)
        _, ex = np.frexp(c[pos].astype(np.float64))
        band[pos] = ex - 1
        return pd.DataFrame({"band": band})

    out = reduce_sink(
        _events(sf_dir, ["value"]).map_batches(
            prep, batch_format="pandas"),
        ["band"], {"n": ("band", "size")}).to_pandas()
    return out.sort_values("band", ignore_index=True)


@register("modal_hour_share_mean", sql="""
WITH c AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS h,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
tot AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS t
        FROM c GROUP BY 1),
m AS (SELECT c.user_id, c.n,
             ROW_NUMBER() OVER (PARTITION BY c.user_id
                                ORDER BY c.n DESC, c.h) AS rn
      FROM c),
s AS (SELECT m.user_id, m.n AS modal_n, tot.t
      FROM m JOIN tot ON m.user_id = tot.user_id WHERE m.rn = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(SUM(CAST(modal_n AS DOUBLE) / t) / COUNT(*), 6)
           AS mean_modal_share
FROM s""")
def modal_hour_share_mean(sf_dir: str) -> pd.DataFrame:
    """Behavioral focus: the average share of a user's events that
    fall in their SINGLE busiest hour-of-day (1.0 = everyone has one
    ritual hour, 1/24 = uniform) — the per-user sibling of the
    circadian resultant that survives multimodal schedules. One
    (user, hour) reduce; the argmax (count DESC, hour ASC tiebreak)
    and the share happen inside the per-user rows of the tiny
    aggregate; only the (Σshare, n_users) scalars leave."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "h": df["ts"].dt.hour.to_numpy(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "h"], {"n": ("h", "size")})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def share(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "h"],
                          ascending=[True, False, True],
                          kind="mergesort")
        top = g.groupby("user_id", as_index=False).first()
        tot = g.groupby("user_id", as_index=False)["n"].sum() \
            .rename(columns={"n": "t"})
        j = top.merge(tot, on="user_id")
        return pd.DataFrame({
            "sshare": [float((j["n"] / j["t"]).sum())],
            "n_users": [np.int64(len(j))]})

    p = (c.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: share(g.drop(columns=["bucket_"])),
                     batch_format="pandas")).to_pandas()
    n_users = int(p["n_users"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "mean_modal_share": [float(r6(float(p["sshare"].sum())
                                      / n_users, 6))]})


@register("session_size_hist", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS k
      FROM sid GROUP BY 1, 2)
SELECT k AS session_events, CAST(COUNT(*) AS BIGINT) AS sessions
FROM s GROUP BY 1 ORDER BY 1""")
def session_size_hist(sf_dir: str) -> pd.DataFrame:
    """Events-per-session distribution — the engagement-depth
    histogram behind bounce analysis (k = 1) and the long tail of
    marathon sessions. Sessions count inside the user-hash bucket
    (sessions never span buckets), so only (k, sessions) histogram
    partials leave the cluster; pure integers."""
    sess = _sessionized_events(sf_dir)
    per = reduce_sink(sess, ["user_id", "sid"],
                      {"k": ("sid", "size")})
    out = reduce_sink(per, ["k"], {"sessions": ("k", "size")}) \
        .to_pandas().rename(columns={"k": "session_events"})
    return out.sort_values("session_events", ignore_index=True) \
        .astype({"session_events": np.int64, "sessions": np.int64})


@register("duplicate_event_groups", sql="""
WITH g AS (SELECT user_id, event_type, ts,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_groups,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END)
            AS BIGINT) AS extra_rows,
       CAST(MAX(cnt) AS BIGINT) AS worst_group
FROM g""")
def duplicate_event_groups(sf_dir: str) -> pd.DataFrame:
    """Idempotency audit: (user, type, timestamp) groups carrying
    more than one event row — the at-least-once-delivery residue an
    exactly-once pipeline must quantify before anyone trusts raw
    counts (extra_rows IS the overcount). One keyed reduce at group
    cardinality; the rollup is integer partials (count, dup flag,
    extras, max) that combine associatively."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_type": df["event_type"].astype(str),
            "ts": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64)})

    g = reduce_sink(
        _events(sf_dir, ["user_id", "event_type", "ts"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "event_type", "ts"], {"cnt": ("ts", "size")})

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_groups": [np.int64(len(cnt))],
            "dup_groups": [np.int64((cnt > 1).sum())],
            "extra_rows": [np.int64(np.where(cnt > 1, cnt - 1, 0)
                                    .sum())],
            "worst_group": [np.int64(cnt.max() if len(cnt) else 0)]})

    p = g.map_batches(rollup, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_groups": np.array([int(p["n_groups"].sum())], np.int64),
        "dup_groups": np.array([int(p["dup_groups"].sum())],
                               np.int64),
        "extra_rows": np.array([int(p["extra_rows"].sum())],
                               np.int64),
        "worst_group": np.array([int(p["worst_group"].max())],
                                np.int64)})


_AUDIT_COLS = {
    "events": ["event_id", "user_id", "event_type", "value"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderpriority"],
    "customer": ["c_custkey", "c_nationkey", "c_mktsegment"],
}
_AUDIT_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS tbl, '{c}' AS col, "
    f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv FROM {t}"
    for t, cols in _AUDIT_COLS.items() for c in cols) + \
    " ORDER BY tbl, col"


@register("constant_columns_audit", sql=_AUDIT_SQL)
def constant_columns_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table degenerate-dimension audit: row count and exact
    NDV for every audited column of events/orders/customer, the
    'is this column secretly constant (or secretly a key)' profile
    schema-drift monitoring diffs between loads. Each column is its
    own two-phase exact distinct (value-keyed reduce, then a
    count) — native dtypes end to end, no stringly casts to disagree
    on; |columns| independent small pipelines, each shuffling only
    keyed partials."""
    rows = []
    for tbl, cols in _AUDIT_COLS.items():
        path = f"{sf_dir}/{tbl}.parquet"
        if tbl == "events":
            base = _events(sf_dir, cols)
        else:
            base = rd.read_parquet(path, columns=cols)
        n_rows = base.count()
        for c in cols:
            d = reduce_sink(base.select_columns([c]), [c],
                            {"n": (c, "size")})
            ndv = int(d.count())
            rows.append((tbl, c, int(n_rows), ndv))
    out = pd.DataFrame(rows, columns=["tbl", "col", "n_rows", "ndv"])
    return out.astype({"n_rows": np.int64, "ndv": np.int64}) \
        .sort_values(["tbl", "col"], ignore_index=True)


@register("peak_events_60s", sql="""
WITH k AS (SELECT e.ts, e.event_id,
                  (SELECT COUNT(*) FROM events e2
                   WHERE epoch_us(e2.ts) > epoch_us(e.ts) - 60000000
                     AND (e2.ts < e.ts OR (e2.ts = e.ts
                          AND e2.event_id <= e.event_id))) AS k
           FROM events e),
best AS (SELECT k, epoch_us(ts) AS us,
                ROW_NUMBER() OVER (ORDER BY k DESC, ts, event_id)
                    AS rn
         FROM k)
SELECT CAST(k AS BIGINT) AS peak_count,
       CAST(us AS BIGINT) AS window_end_us
FROM best WHERE rn = 1""")
def peak_events_60s(sf_dir: str) -> pd.DataFrame:
    """Global peak burst: the largest number of events in ANY
    trailing 60-second window across the whole stream (arrival order
    (ts, id), self included, strict lookback) and when it ended —
    peak RPS for capacity planning, where the hourly table's average
    hides 100× spikes. Unlike the per-user rate-limit audit this
    window is GLOBAL, so the partition is TIME: events bucket by
    minute, each event also replicates as context to the NEXT bucket
    (everything a home row's window can reach lies in bucket ∪
    predecessor-context by construction), one searchsorted per bucket
    answers every home row, and only (max, argmin-ts) partials leave.
    2× replication bounded, no global sort."""
    ds = _events(sf_dir, ["event_id", "ts"])
    win = 60_000_000

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        b = us // win
        home = pd.DataFrame({"bucket_": b, "us": us, "eid": eid,
                             "home": np.ones(len(us), np.int64)})
        ctx = pd.DataFrame({"bucket_": b + 1, "us": us, "eid": eid,
                            "home": np.zeros(len(us), np.int64)})
        return pd.concat([home, ctx], ignore_index=True)

    def local_peak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["us", "eid"], ignore_index=True)
        us = g["us"].to_numpy(np.int64)
        is_home = g["home"].to_numpy(np.int64) == 1
        lo = np.searchsorted(us, us - win, side="right")
        k = np.arange(len(us)) - lo + 1
        k = k[is_home]
        hus = us[is_home]
        if not len(k):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "us": pd.Series([],
                                                 dtype=np.int64)})
        best = np.lexsort((hus, -k))[0]
        return pd.DataFrame({"k": [np.int64(k[best])],
                             "us": [np.int64(hus[best])]})

    p = (ds.map_batches(expand, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: local_peak(
             g.drop(columns=["bucket_"])),
             batch_format="pandas")).to_pandas()
    p = p.sort_values(["k", "us"], ascending=[False, True],
                      kind="mergesort").head(1)
    return pd.DataFrame({
        "peak_count": np.array([int(p["k"].iloc[0])], np.int64),
        "window_end_us": np.array([int(p["us"].iloc[0])], np.int64)})


@register("longest_quiet_gap", sql="""
WITH o AS (SELECT epoch_us(ts) AS us,
                  LEAD(epoch_us(ts)) OVER (ORDER BY ts, event_id)
                      AS nxt
           FROM events),
g AS (SELECT us, nxt - us AS gap FROM o WHERE nxt IS NOT NULL),
best AS (SELECT us, gap,
                ROW_NUMBER() OVER (ORDER BY gap DESC, us) AS rn
         FROM g)
SELECT CAST(gap AS BIGINT) AS gap_us, CAST(us AS BIGINT) AS start_us
FROM best WHERE rn = 1""")
def longest_quiet_gap(sf_dir: str) -> pd.DataFrame:
    """The longest silence in the global stream — the maximum gap
    between consecutive events and when it started (earliest on
    ties): the outage/ingest-stall detector ('did we really receive
    nothing for 40 minutes?'). Time-range buckets answer their
    INTERIOR gaps with one vectorized diff; the cross-bucket seams
    close on the driver from each non-empty bucket's (min, max)
    metadata — O(buckets) rows, the same stitch as the concurrency
    histogram, so no task ever sees the whole stream and there is
    no global sort."""
    ds = _events(sf_dir, ["ts"])
    width = 3_600_000_000  # 1h range buckets

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"us": us, "bucket_": us // width})

    def interior(g: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(g["us"].to_numpy(np.int64))
        if len(us) > 1:
            d = np.diff(us)
            i = int(np.lexsort((us[:-1], -d))[0])
            gap, start = int(d[i]), int(us[i])
        else:
            gap, start = -1, -1
        return pd.DataFrame({
            "gap": [np.int64(gap)], "start": [np.int64(start)],
            "mn": [np.int64(us[0])], "mx": [np.int64(us[-1])]})

    p = (ds.map_batches(tag, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: interior(g.drop(columns=["bucket_"])),
                     batch_format="pandas")).to_pandas()
    # seam gaps between consecutive non-empty buckets (driver,
    # O(buckets)): sort by bucket min
    p = p.sort_values("mn", ignore_index=True)
    cands = list(zip(p["gap"].astype(int), p["start"].astype(int)))
    mx = p["mx"].to_numpy(np.int64)
    mn = p["mn"].to_numpy(np.int64)
    for i in range(len(p) - 1):
        cands.append((int(mn[i + 1] - mx[i]), int(mx[i])))
    cands = [(g, s) for g, s in cands if g >= 0]
    gap, start = max(cands, key=lambda t: (t[0], -t[1]))
    return pd.DataFrame({
        "gap_us": np.array([gap], np.int64),
        "start_us": np.array([start], np.int64)})


@register("cents_last_digit_chi2", sql="""
WITH d AS (SELECT CAST(ROUND(value * 100) AS BIGINT) % 10 AS digit
           FROM events WHERE value > 0),
h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS o FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM h)
SELECT CAST(h.digit AS BIGINT) AS digit, h.o,
       ROUND(SUM((o - CAST(n AS DOUBLE) / 10)
                 * (o - CAST(n AS DOUBLE) / 10)
                 / (CAST(n AS DOUBLE) / 10))
             OVER (), 6) AS chi2
FROM h, t ORDER BY 1""")
def cents_last_digit_chi2(sf_dir: str) -> pd.DataFrame:
    """Last-digit uniformity audit: the terminal cents digit should
    be ~uniform for organic amounts — psychological pricing (.99),
    hand-entered rounding, or synthesized data all bend it, which is
    why auditors test last digits where Benford tests first ones.
    One 10-bin integer histogram; Pearson χ² against uniform is a
    shared float expression riding every row as a window constant."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"digit": c[df["value"]
                                        .to_numpy(np.float64) > 0]
                             % 10})

    h = reduce_sink(
        _events(sf_dir, ["value"]).map_batches(
            prep, batch_format="pandas"),
        ["digit"], {"o": ("digit", "size")}).to_pandas() \
        .sort_values("digit", ignore_index=True)
    o = h["o"].to_numpy(np.int64)
    n = int(o.sum())
    e = float(n) / 10
    chi2 = float(((o - e) * (o - e) / e).sum())
    r6 = textstats.round_half_away
    h["chi2"] = float(r6(chi2, 6))
    return h.astype({"digit": np.int64, "o": np.int64})


@register("type_reach_ratio", sql="""
WITH v AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS volume,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS reach
           FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS all_users
      FROM events)
SELECT event_type, volume, reach,
       ROUND(CAST(reach AS DOUBLE) / t.all_users, 6) AS penetration,
       ROUND(CAST(volume AS DOUBLE) / reach, 6) AS events_per_user
FROM v, t ORDER BY 1""")
def type_reach_ratio(sf_dir: str) -> pd.DataFrame:
    """Reach vs volume per event type: distinct-user penetration
    (what share of the user base ever does this) against intensity
    (events per reached user) — the split that separates a
    broad-shallow feature from a narrow-deep one when raw volume
    looks identical. Exact two-phase distinct per type plus one
    global distinct; volumes are ordinary count partials; two shared
    divisions per row."""
    ds = _events(sf_dir, ["event_type", "user_id"])
    vol = reduce_sink(ds, ["event_type"],
                      {"volume": ("user_id", "size")}).to_pandas()
    reach = distinct_count(ds, ["event_type"], "user_id", "reach") \
        .to_pandas()
    pairs = reduce_sink(ds, ["user_id"], {"n": ("user_id", "size")})
    all_users = int(pairs.count())
    out = vol.merge(reach, on="event_type")
    r6 = textstats.round_half_away
    out["penetration"] = r6(out["reach"].to_numpy(np.float64)
                            / float(all_users), 6)
    out["events_per_user"] = r6(out["volume"].to_numpy(np.float64)
                                / out["reach"]
                                .to_numpy(np.float64), 6)
    return out.astype({"volume": np.int64, "reach": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("purchase_frequency_dist", sql="""
WITH p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
h AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS users FROM p GROUP BY k),
t AS (SELECT CAST(SUM(users) AS BIGINT) AS buyers,
             CAST(SUM(CASE WHEN k >= 2 THEN users ELSE 0 END)
                  AS BIGINT) AS repeaters
      FROM h)
SELECT h.k AS purchases, h.users,
       ROUND(CAST(t.repeaters AS DOUBLE) / t.buyers, 6)
           AS repeat_rate
FROM h, t ORDER BY 1""")
def purchase_frequency_dist(sf_dir: str) -> pd.DataFrame:
    """Purchase-frequency distribution with the repeat rate — the
    one-and-done vs loyal split (the empirical input to any
    Pareto/NBD-style repeat-buying model). Per-user purchase counts
    reduce once; the frequency histogram is a second tiny reduce;
    the repeat rate (buyers with ≥2 / all buyers) rides every row
    as a shared-constant division."""
    per = reduce_sink(
        _events(sf_dir, ["event_type", "user_id"]).map_batches(
            lambda df: df[df["event_type"] == "purchase"]
            [["user_id"]], batch_format="pandas"),
        ["user_id"], {"k": ("user_id", "size")})
    h = reduce_sink(per, ["k"], {"users": ("k", "size")}) \
        .to_pandas().sort_values("k", ignore_index=True)
    buyers = int(h["users"].sum())
    repeaters = int(h[h["k"] >= 2]["users"].sum())
    r6 = textstats.round_half_away
    h = h.rename(columns={"k": "purchases"})
    h["repeat_rate"] = float(r6(float(repeaters) / buyers, 6))
    return h.astype({"purchases": np.int64, "users": np.int64})


@register("hill_diversity_types", sql="""
WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS q0 FROM c),
s AS (SELECT SUM(-(n / CAST(tot AS DOUBLE))
                 * LN(n / CAST(tot AS DOUBLE))) AS h,
             SUM((n / CAST(tot AS DOUBLE))
                 * (n / CAST(tot AS DOUBLE))) AS simpson
      FROM c, t)
SELECT t.q0, ROUND(EXP(s.h), 6) AS q1_exp_shannon,
       ROUND(1.0 / s.simpson, 6) AS q2_inv_simpson
FROM t, s""")
def hill_diversity_types(sf_dir: str) -> pd.DataFrame:
    """Hill diversity numbers of the event-type mix — the ecology
    triple on one axis: q0 = richness (how many types), q1 =
    exp(Shannon) (effective types weighting all), q2 = inverse
    Simpson (effective DOMINANT types) — the standard way to say
    'we log 12 types but effectively run on 3'. One type-count
    reduce; shares, entropy and Simpson close as shared float
    expressions over ≤|types| terms."""
    c = reduce_sink(
        _events(sf_dir, ["event_type"]),
        ["event_type"], {"n": ("event_type", "size")}).to_pandas() \
        .sort_values("event_type", ignore_index=True)
    n = c["n"].to_numpy(np.float64)
    tot = int(n.sum())
    p = n / float(tot)
    h = float((-(p) * np.log(p)).sum())
    simpson = float((p * p).sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "q0": np.array([len(c)], np.int64),
        "q1_exp_shannon": [float(r6(np.exp(h), 6))],
        "q2_inv_simpson": [float(r6(1.0 / simpson, 6))]})


@register("tenure_churn_hazard", sql="""
WITH uw AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 // 7 AS w
            FROM events),
b AS (SELECT MAX(w) AS wmax FROM uw),
u AS (SELECT user_id, CAST(MIN(w) AS BIGINT) AS f,
             CAST(MAX(w) AS BIGINT) AS l
      FROM uw GROUP BY 1),
lf AS (SELECT l - f AS tenure,
              CASE WHEN l < (SELECT wmax FROM b) THEN 1 ELSE 0 END
                  AS churned
       FROM u),
ten AS (SELECT UNNEST(generate_series(
            0, (SELECT CAST(MAX(tenure) AS BIGINT) FROM lf))) AS t),
hz AS (SELECT ten.t,
              CAST(SUM(CASE WHEN lf.tenure >= ten.t THEN 1 ELSE 0
                       END) AS BIGINT) AS at_risk,
              CAST(SUM(CASE WHEN lf.tenure = ten.t
                            AND lf.churned = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS events
       FROM ten, lf GROUP BY ten.t)
SELECT CAST(t AS BIGINT) AS tenure_weeks, at_risk, events,
       ROUND(CAST(events AS DOUBLE) / at_risk, 6) AS hazard
FROM hz WHERE at_risk > 0 ORDER BY 1""")
def tenure_churn_hazard(sf_dir: str) -> pd.DataFrame:
    """Discrete-time churn hazard by tenure: for each whole week of
    user lifetime, the probability of churning EXACTLY then given
    survival so far — the survival-analysis view of retention (a
    week-2 hazard spike is an onboarding cliff), with users still
    active in the final observed week treated as CENSORED (they
    haven't churned, they ran out of observation — counting them as
    deaths is the classic retention mistake). One per-user (first,
    last) week reduce; the O(max-tenure) risk table closes
    driver-side from exact integers."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "w": (us // 86_400_000_000 // 7).astype(np.int64)}) \
            .drop_duplicates()

    u = reduce_sink(ds.map_batches(pairs, batch_format="pyarrow"),
                    ["user_id"], {"f": ("w", "min"),
                                  "l": ("w", "max")}).to_pandas()
    wmax = int(u["l"].max())
    tenure = (u["l"] - u["f"]).to_numpy(np.int64)
    churned = (u["l"] < wmax).to_numpy()
    r6 = textstats.round_half_away
    rows = []
    for t in range(int(tenure.max()) + 1):
        at_risk = int((tenure >= t).sum())
        ev = int(((tenure == t) & churned).sum())
        if at_risk > 0:
            rows.append((t, at_risk, ev,
                         float(r6(float(ev) / at_risk, 6))))
    return pd.DataFrame(rows, columns=["tenure_weeks", "at_risk",
                                       "events", "hazard"]) \
        .astype({"tenure_weeks": np.int64, "at_risk": np.int64,
                 "events": np.int64})


@register("youden_threshold_value", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS pos
           FROM events),
h AS (SELECT cents, CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(1 - pos) AS BIGINT) AS q FROM c GROUP BY 1),
cum AS (SELECT cents,
               CAST(SUM(p) OVER (ORDER BY cents) AS BIGINT) AS fp_,
               CAST(SUM(q) OVER (ORDER BY cents) AS BIGINT) AS fq_
        FROM h),
t AS (SELECT CAST(SUM(p) AS BIGINT) AS np_,
             CAST(SUM(q) AS BIGINT) AS nq_ FROM h),
j AS (SELECT cents, (np_ - fp_) * nq_ - (nq_ - fq_) * np_ AS j_num,
             np_ - fp_ AS tp, nq_ - fq_ AS fp, fp_ AS fn_, fq_ AS tn,
             ROW_NUMBER() OVER (
                 ORDER BY (np_ - fp_) * nq_ - (nq_ - fq_) * np_
                     DESC, cents) AS rn
      FROM cum, t)
SELECT CAST(cents AS BIGINT) AS best_cut_cents,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn_ AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       ROUND(CAST(j_num AS DOUBLE)
             / ((SELECT np_ FROM t) * CAST((SELECT nq_ FROM t)
                                           AS DOUBLE)), 6) AS youden_j
FROM j WHERE rn = 1""")
def youden_threshold_value(sf_dir: str) -> pd.DataFrame:
    """Optimal classification threshold by Youden's J: the value cut
    that best separates purchases from the rest (predict positive
    when value > cut), maximizing TPR − FPR — the operating point an
    AUC alone doesn't give you. The argmax runs on the INTEGER
    cross product J_num = TP·N₋ − FP·N₊ over the shared cents
    histogram (no float rate can reorder candidates), smallest cut
    on ties; the confusion cells at the winner are exact and J
    divides once at the end."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        pos = (df["event_type"] == "purchase").to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "p": pos, "q": 1 - pos})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"p": ("p", "sum"), "q": ("q", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    p = h["p"].to_numpy(np.int64)
    q = h["q"].to_numpy(np.int64)
    np_, nq_ = int(p.sum()), int(q.sum())
    fp_ = p.cumsum()
    fq_ = q.cumsum()
    tp = np_ - fp_
    fpos = nq_ - fq_
    j_num = tp * nq_ - fpos * np_
    i = int(np.lexsort((h["cents"].to_numpy(), -j_num))[0])
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "best_cut_cents": np.array([int(h["cents"].iloc[i])],
                                   np.int64),
        "tp": np.array([int(tp[i])], np.int64),
        "fp": np.array([int(fpos[i])], np.int64),
        "fn": np.array([int(fp_[i])], np.int64),
        "tn": np.array([int(fq_[i])], np.int64),
        "youden_j": [float(r6(float(int(j_num[i]))
                              / (np_ * float(nq_)), 6))]})


@register("ltv_targeting_auc", sql="""
WITH u0 AS (SELECT user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pc
            FROM events GROUP BY 1),
tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
              CAST(SUM(pc) AS BIGINT) AS tpc FROM u0),
u AS (SELECT user_id, x,
             CASE WHEN pc * (SELECT nu FROM tp) > (SELECT tpc FROM tp)
                  THEN 1 ELSE 0 END AS buyer
      FROM u0),
h AS (SELECT x, CAST(SUM(buyer) AS BIGINT) AS b,
             CAST(SUM(1 - buyer) AS BIGINT) AS nb
      FROM u GROUP BY 1),
cum AS (SELECT b, nb,
               CAST(SUM(nb) OVER (ORDER BY x) AS BIGINT) AS fnb
        FROM h),
t AS (SELECT CAST(SUM(b) AS BIGINT) AS n1,
             CAST(SUM(nb) AS BIGINT) AS n2 FROM h),
a AS (SELECT CAST(SUM(CAST(b AS HUGEINT) * (2 * (fnb - nb) + nb))
              AS HUGEINT) AS u2 FROM cum)
SELECT (SELECT n1 FROM t) AS buyers, (SELECT n2 FROM t) AS others,
       CASE WHEN (SELECT n1 FROM t) * (SELECT n2 FROM t) = 0 THEN 0.0
            ELSE ROUND(CAST(u2 AS DOUBLE)
                       / (2.0 * (SELECT n1 FROM t)
                          * (SELECT n2 FROM t)), 6)
       END AS auc
FROM a""")
def ltv_targeting_auc(sf_dir: str) -> pd.DataFrame:
    """Targeting power of lifetime value: the probability a random
    BUYER out-spends a random non-buyer (ties half) — the
    Mann-Whitney AUC at USER grain, i.e. 'if we target by LTV, how
    well does it find HEAVY purchasers' — the positive class is
    users with an above-average purchase count, decided by the
    integer cross-multiplication pc·n_users > total_purchases (the
    Q22 trick: no float average exists to disagree, and both classes
    are guaranteed non-empty on non-constant data). Reuses the
    doubled-integer rank machinery on the per-user cents histogram
    (2U = Σ b·(2F₋ + nb) exact 128-bit); one division closes AUC;
    a single-class degenerate input returns 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "x": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "pc": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"x": ("x", "sum"), "pc": ("pc", "sum")}) \
        .materialize()
    tot = u.map_batches(
        lambda df: pd.DataFrame({"nu": [np.int64(len(df))],
                                 "tpc": [np.int64(df["pc"].sum())]}),
        batch_format="pandas").to_pandas()
    nu, tpc = int(tot["nu"].sum()), int(tot["tpc"].sum())
    h = reduce_sink(
        u.map_batches(
            lambda df: pd.DataFrame({
                "x": df["x"],
                "b": (df["pc"].to_numpy(np.int64) * nu > tpc)
                .astype(np.int64),
                "nb": (df["pc"].to_numpy(np.int64) * nu <= tpc)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["x"], {"b": ("b", "sum"), "nb": ("nb", "sum")}) \
        .to_pandas().sort_values("x", ignore_index=True)
    b = h["b"].to_numpy(np.int64)
    nb = h["nb"].to_numpy(np.int64)
    n1, n2 = int(b.sum()), int(nb.sum())
    fnb = nb.cumsum() - nb
    u2 = sum(int(bb) * (2 * int(f) + int(n))
             for bb, f, n in zip(b, fnb, nb))
    r6 = textstats.round_half_away
    auc = 0.0 if n1 * n2 == 0 else \
        r6(float(u2) / (2.0 * n1 * n2), 6)
    return pd.DataFrame({
        "buyers": np.array([n1], np.int64),
        "others": np.array([n2], np.int64),
        "auc": [float(auc)]})


@register("daily_return_probability", sql="""
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events),
b AS (SELECT MAX(d) AS dmax FROM ud),
f AS (SELECT u.user_id, u.d,
             EXISTS(SELECT 1 FROM ud n WHERE n.user_id = u.user_id
                    AND n.d = u.d + 1) AS nxt
      FROM ud u WHERE u.d < (SELECT dmax FROM b))
SELECT CAST(COUNT(*) AS BIGINT) AS active_days,
       CAST(SUM(CASE WHEN nxt THEN 1 ELSE 0 END) AS BIGINT)
           AS returned,
       ROUND(CAST(SUM(CASE WHEN nxt THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS return_prob
FROM f""")
def daily_return_probability(sf_dir: str) -> pd.DataFrame:
    """Day-over-day activity persistence: P(user active tomorrow |
    active today) over all (user, day) activations — the single
    number behind every 'sticky product' claim, and the transition
    parameter a two-state activity Markov model needs. Same
    shift-compare trick as the weekly churn decomposition, at DAILY
    grain: the distinct (user, day) reduce sorts inside the user
    bucket and next-day presence is next-row == d+1 (days unique per
    user), last observed day excluded (no tomorrow to test). Only
    two scalar partials per bucket."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "d": (us // 86_400_000_000).astype(np.int64)}) \
            .drop_duplicates()

    ud = reduce_sink(ds.map_batches(pairs, batch_format="pyarrow"),
                     ["user_id", "d"], {"n": ("d", "size")})
    bounds = ud.map_batches(
        lambda df: pd.DataFrame({"mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    dmax = int(bounds["mx"].max())

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "d"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        nxt = np.zeros(len(g), bool)
        nxt[:-1] = (u[:-1] == u[1:]) & (d[1:] == d[:-1] + 1)
        keep = d < dmax
        return pd.DataFrame({
            "active_days": [np.int64(keep.sum())],
            "returned": [np.int64((nxt & keep).sum())]})

    p = (ud.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: flags(g.drop(columns=["bucket_",
                                                     "n"])),
                     batch_format="pandas")).to_pandas()
    active = int(p["active_days"].sum())
    ret = int(p["returned"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "active_days": np.array([active], np.int64),
        "returned": np.array([ret], np.int64),
        "return_prob": [float(r6(float(ret) / active, 6))]})


@register("type_hour_entropy", sql="""
WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
      FROM h GROUP BY 1)
SELECT h.event_type, t.tot AS n_events,
       ROUND(SUM(-(h.n / CAST(t.tot AS DOUBLE))
                 * LOG2(h.n / CAST(t.tot AS DOUBLE))), 6)
           AS hour_entropy_bits,
       ROUND(EXP(SUM(-(h.n / CAST(t.tot AS DOUBLE))
                     * LN(h.n / CAST(t.tot AS DOUBLE)))), 6)
           AS effective_hours
FROM h JOIN t USING (event_type)
GROUP BY h.event_type, t.tot ORDER BY 1""")
def type_hour_entropy(sf_dir: str) -> pd.DataFrame:
    """Schedule concentration per type: Shannon entropy of each
    type's hour-of-day profile (log₂ 24 ≈ 4.58 bits = round-the-
    clock, 0 = a cron job) plus the effective number of active hours
    (exp of the nat entropy — the Hill q1 on the clock axis). One
    (type, hour) reduce; both statistics are shared guarded float
    expressions over ≤24 terms per type."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "hr": df["ts"].dt.hour.to_numpy(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["event_type", "hr"], {"n": ("hr", "size")}).to_pandas()
    r6 = textstats.round_half_away
    rows = []
    for g, grp in h.groupby("event_type", sort=True):
        n = grp["n"].to_numpy(np.float64)
        tot = int(n.sum())
        p = n / float(tot)
        bits = float((-(p) * np.log2(p)).sum())
        nats = float((-(p) * np.log(p)).sum())
        rows.append((g, tot, float(r6(bits, 6)),
                     float(r6(np.exp(nats), 6))))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "hour_entropy_bits",
                                       "effective_hours"]) \
        .astype({"n_events": np.int64})


@register("inter_purchase_gap_quantiles", sql="""
WITH p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
g AS (SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id)))
              // 1000000 AS gap_s
      FROM p),
h AS (SELECT gap_s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
cum AS (SELECT gap_s, cnt,
               CAST(SUM(cnt) OVER (ORDER BY gap_s) AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n_gaps,
       (SELECT CAST(MIN(gap_s) AS BIGINT) FROM cum
        WHERE 2 * cm >= n) AS p50_s,
       (SELECT CAST(MIN(gap_s) AS BIGINT) FROM cum
        WHERE 10 * cm >= 9 * n) AS p90_s,
       (SELECT CAST(MIN(gap_s) AS BIGINT) FROM cum) AS min_s,
       (SELECT CAST(MAX(gap_s) AS BIGINT) FROM cum) AS max_s""")
def inter_purchase_gap_quantiles(sf_dir: str) -> pd.DataFrame:
    """Inter-purchase cadence: exact quantiles of the time between a
    user's consecutive purchases (second-quantized like burstiness)
    — the re-order cycle behind replenishment reminders and
    churn-risk clocks ('median buyer returns in 6 days; this one is
    at 20'). Per-user purchase gaps compute inside user buckets;
    the lossless gap histogram is the only thing that shuffles, and
    p50/p90 are the shared 2·cum ≥ n / 10·cum ≥ 9n integer order
    statistics — no interpolated float quantile exists to
    disagree."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"].copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = ((us - np.roll(us, 1)) // 1_000_000)[same]
        u, c = np.unique(gap, return_counts=True)
        return pd.DataFrame({"gap_s": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    h = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: gaps(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["gap_s"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("gap_s", ignore_index=True)
    gap_s = h["gap_s"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p50 = int(gap_s[np.searchsorted(2 * cm, n, side="left")])
    p90 = int(gap_s[np.searchsorted(10 * cm, 9 * n, side="left")])
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "p50_s": np.array([p50], np.int64),
        "p90_s": np.array([p90], np.int64),
        "min_s": np.array([int(gap_s[0])], np.int64),
        "max_s": np.array([int(gap_s[-1])], np.int64)})


@register("type_rle_compression_mean", sql="""
WITH o AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN prev IS NULL
                           OR event_type <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM o GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(runs) AS BIGINT) AS n_runs,
       ROUND(SUM(CAST(runs AS DOUBLE) / n) / COUNT(*), 6)
           AS mean_rle_ratio
FROM u""")
def type_rle_compression_mean(sf_dir: str) -> pd.DataFrame:
    """Behavioral repetitiveness: each user's type sequence
    run-length-encodes to runs/n of its length (1.0 = never repeats
    the same action twice in a row, → 0 = long monotonous streaks —
    the bot/grinding smell), averaged over users. The same per-user
    sort+shift as the transition reduce; only (n, runs) integer
    partials per user leave the bucket and the mean is one bounded
    float sum."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def rle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        new_run = np.ones(len(g), bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        agg = pd.DataFrame({"user_id": uid,
                            "n": 1,
                            "runs": new_run.astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        return pd.DataFrame({
            "n_users": [np.int64(len(agg))],
            "n_events": [np.int64(agg["n"].sum())],
            "n_runs": [np.int64(agg["runs"].sum())],
            "sratio": [float((agg["runs"] / agg["n"]).sum())]})

    p = (ds.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: rle(g.drop(columns=["bucket_"])),
                     batch_format="pandas")).to_pandas()
    n_users = int(p["n_users"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "n_events": np.array([int(p["n_events"].sum())], np.int64),
        "n_runs": np.array([int(p["n_runs"].sum())], np.int64),
        "mean_rle_ratio": [float(r6(float(p["sratio"].sum())
                                    / n_users, 6))]})


@register("type_share_shift_wow", sql="""
WITH b AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 // 7 AS w FROM events),
mx AS (SELECT MAX(w) AS wmax FROM b),
c AS (SELECT event_type,
             CAST(SUM(CASE WHEN w = (SELECT wmax FROM mx) - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS prev_n,
             CAST(SUM(CASE WHEN w = (SELECT wmax FROM mx)
                           THEN 1 ELSE 0 END) AS BIGINT) AS last_n
      FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(prev_n) AS BIGINT) AS pt,
             CAST(SUM(last_n) AS BIGINT) AS lt FROM c)
SELECT event_type, prev_n, last_n,
       ROUND(CAST(prev_n AS DOUBLE) / t.pt, 6) AS prev_share,
       ROUND(CAST(last_n AS DOUBLE) / t.lt, 6) AS last_share,
       ROUND(CAST(last_n AS DOUBLE) / t.lt
             - CAST(prev_n AS DOUBLE) / t.pt, 6) AS delta
FROM c, t WHERE prev_n + last_n > 0 ORDER BY 1""")
def type_share_shift_wow(sf_dir: str) -> pd.DataFrame:
    """Mix-shift monitor: each type's share of the FINAL observed
    week against the week before (the 'what changed in the release'
    readout — volume growth hides composition swings; this isolates
    them). One conditional (type, two-week) reduce; shares and
    deltas are shared divisions over exact integers; types absent
    from both weeks drop."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "w": (us // 86_400_000_000 // 7).astype(np.int64)})

    base = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    wmax = int(base.map_batches(
        lambda df: pd.DataFrame({"mx": [df["w"].max()]}),
        batch_format="pandas").to_pandas()["mx"].max())

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "prev_n": (w == wmax - 1).astype(np.int64),
            "last_n": (w == wmax).astype(np.int64)})

    c = reduce_sink(base.map_batches(flags, batch_format="pandas"),
                    ["event_type"], {"prev_n": ("prev_n", "sum"),
                                     "last_n": ("last_n", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    c = c[c["prev_n"] + c["last_n"] > 0].reset_index(drop=True)
    pt, lt = int(c["prev_n"].sum()), int(c["last_n"].sum())
    r6 = textstats.round_half_away
    c["prev_share"] = r6(c["prev_n"].to_numpy(np.float64) / pt, 6)
    c["last_share"] = r6(c["last_n"].to_numpy(np.float64) / lt, 6)
    c["delta"] = r6(c["last_n"].to_numpy(np.float64) / lt
                    - c["prev_n"].to_numpy(np.float64) / pt, 6)
    return c.astype({"prev_n": np.int64, "last_n": np.int64})


@register("value_gini_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    - cnt AS BIGINT) AS cb,
               CAST(SUM(CAST(cnt AS HUGEINT) * c)
                    OVER (PARTITION BY g ORDER BY c)
                    - CAST(cnt AS HUGEINT) * c AS HUGEINT) AS sb
        FROM hh),
agg AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(CAST(cnt AS HUGEINT) * c) AS HUGEINT) AS s,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * cb
                        - CAST(cnt AS HUGEINT) * sb) AS HUGEINT)
                   AS mad_num
        FROM cum GROUP BY g)
SELECT g AS event_type, n, CAST(s AS BIGINT) AS total_cents,
       CASE WHEN s = 0 THEN 0.0
            ELSE ROUND(CAST(mad_num AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6)
       END AS gini
FROM agg ORDER BY 1""")
def value_gini_by_type(sf_dir: str) -> pd.DataFrame:
    """Within-type value inequality: the Gini coefficient of each
    type's event values — is 'purchase' revenue broad-based or a few
    whale receipts? (the global Gini can't say which TYPE carries
    the concentration). Exact O(V) closed form over the sorted cents
    histogram: Σᵢ<ⱼ cᵢcⱼ(xⱼ−xᵢ) = Σⱼ cⱼ(xⱼ·C₍<ⱼ₎ − S₍<ⱼ₎) with
    count/sum prefix integers (128-bit — the cross terms overflow
    int64 by design), G = Σᵢ<ⱼ/(n·total) (the |Δ| double-count and
    the mean-normalization 2 cancel); all-equal values pin 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["g", "c"], ignore_index=True)
    r6 = textstats.round_half_away
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = [int(x) for x in grp["cnt"]]
        c = [int(x) for x in grp["c"]]
        n = sum(cnt)
        s = sum(a * b for a, b in zip(cnt, c))
        cb, sb, mad = 0, 0, 0
        for a, x in zip(cnt, c):
            mad += a * x * cb - a * sb
            cb += a
            sb += a * x
        gini = 0.0 if s == 0 else \
            r6(float(mad) / (float(n) * float(s)), 6)
        rows.append((g, n, s, float(gini)))
    return pd.DataFrame(rows, columns=["event_type", "n",
                                       "total_cents", "gini"]) \
        .astype({"n": np.int64, "total_cents": np.int64})


@register("user_activity_zipf_slope", sql="""
WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
top AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
        FROM u),
f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
             SUM(LN(CAST(rk AS DOUBLE))) AS sx,
             SUM(LN(CAST(n AS DOUBLE))) AS sy,
             SUM(LN(CAST(rk AS DOUBLE)) * LN(CAST(n AS DOUBLE)))
                 AS sxy,
             SUM(LN(CAST(rk AS DOUBLE)) * LN(CAST(rk AS DOUBLE)))
                 AS sxx
      FROM top WHERE rk <= 100)
SELECT CAST(k AS BIGINT) AS k,
       CASE WHEN k * sxx - sx * sx = 0 THEN 0.0
            ELSE ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
       END AS zipf_slope
FROM f""")
def user_activity_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf rank-frequency slope of USER activity (top-100 users):
    how power-law the engagement curve is (slope ≈ −1 = classic
    Zipf; near 0 = egalitarian usage) — the per-user sibling of the
    vocabulary Zipf fit, consulted before sampling or quota design.
    Per-block top-100 (count, user) partials provably contain the
    global top; rank ties break by user_id so both engines rank the
    identical integer pairs; the log-log OLS is a shared closed
    form."""
    per = reduce_sink(
        _events(sf_dir, ["user_id"]),
        ["user_id"], {"n": ("user_id", "size")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "user_id"],
                              ascending=[False, True]).head(100)

    cand = per.map_batches(local_top, batch_format="pandas") \
        .to_pandas().sort_values(["n", "user_id"],
                                 ascending=[False, True],
                                 kind="mergesort").head(100)
    k = len(cand)
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(cand["n"].to_numpy(np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxy, sxx = float((x * y).sum()), float((x * x).sum())
    den = k * sxx - sx * sx
    r6 = textstats.round_half_away
    slope = 0.0 if den == 0 else r6((k * sxy - sx * sy) / den, 6)
    return pd.DataFrame({"k": np.array([k], np.int64),
                         "zipf_slope": [float(slope)]})


@register("orders_anova_by_priority", sql="""
WITH v AS (SELECT o_orderpriority AS g,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
      FROM v GROUP BY g),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s) AS HUGEINT) AS st,
             CAST(SUM(q) AS HUGEINT) AS qt,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
      FROM m)
SELECT m.g AS priority, m.n, CAST(m.s AS BIGINT) AS sum_cents,
       CASE WHEN CAST(t.qt AS DOUBLE) - t.sb = 0.0 THEN 0.0
            ELSE ROUND(((t.nn - t.k)
                        * (t.sb - CAST(t.st AS DOUBLE)
                           * CAST(t.st AS DOUBLE) / t.nn))
                       / ((t.k - 1)
                          * (CAST(t.qt AS DOUBLE) - t.sb)), 6)
       END AS f
FROM m, t ORDER BY 1""")
def orders_anova_by_priority(sf_dir: str) -> pd.DataFrame:
    """Classic one-way ANOVA across order priorities on the ORDERS
    fact: do urgency classes differ in mean order value? Per-group
    integer moments (n, Σc, Σc² — 128-bit for the squares) come from
    one reduce; between = Σ Sg²/ng − S²/N and within = ΣQ − Σ Sg²/ng
    close as shared float expressions (the same moment algebra as
    Brown–Forsythe, here on raw values with means as centers); F
    rides every per-priority row as a constant column, zero-within
    short-circuits to 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["o_orderpriority"].astype(str),
            "c": np.rint(df["o_totalprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    base = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"]) \
        .map_batches(prep, batch_format="pandas")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, grp in df.groupby("g", sort=False):
            c = grp["c"].to_numpy(np.int64)
            co = c.astype(object)
            q = int((co * co).sum())
            hi, lo = divmod(q, 1 << 62)
            out.append((g, len(c), int(c.sum()), hi, lo))
        return pd.DataFrame(out, columns=["g", "n", "s", "q_hi",
                                          "q_lo"])

    p = reduce_sink(
        base.map_batches(moments, batch_format="pandas"),
        ["g"], {"n": ("n", "sum"), "s": ("s", "sum"),
                "q_hi": ("q_hi", "sum"), "q_lo": ("q_lo", "sum")}) \
        .to_pandas().sort_values("g", ignore_index=True)
    n_g = p["n"].to_numpy(np.int64)
    s_g = [int(x) for x in p["s"]]
    q_g = [int(h) * (1 << 62) + int(l)
           for h, l in zip(p["q_hi"], p["q_lo"])]
    nn, k = int(n_g.sum()), len(p)
    st, qt = sum(s_g), sum(q_g)
    sb = float(sum(float(s) * s / n for s, n in zip(s_g, n_g)))
    w = float(qt) - sb
    r6 = textstats.round_half_away
    f = 0.0 if w == 0.0 else r6(
        ((nn - k) * (sb - float(st) * st / nn)) / ((k - 1) * w), 6)
    out = pd.DataFrame({"priority": p["g"],
                        "n": n_g.astype(np.int64),
                        "sum_cents": np.array(s_g, np.int64),
                        "f": float(f)})
    return out.sort_values("priority", ignore_index=True)


@register("ltv_quartile_mobility", sql="""
WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
u AS (SELECT user_id,
             CAST(SUM(CASE WHEN d < cut THEN c ELSE 0 END)
                  AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN d >= cut THEN c ELSE 0 END)
                  AS BIGINT) AS x2,
             CAST(MAX(CASE WHEN d < cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS p1,
             CAST(MAX(CASE WHEN d >= cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS p2
      FROM b, sp GROUP BY user_id),
bth AS (SELECT x1, x2 FROM u WHERE p1 = 1 AND p2 = 1),
h1 AS (SELECT x1 AS v, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM bth GROUP BY 1),
c1 AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cm,
              CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h1),
k1 AS (SELECT MIN(CASE WHEN 4 * cm >= n THEN v END) AS q1,
              MIN(CASE WHEN 2 * cm >= n THEN v END) AS q2,
              MIN(CASE WHEN 4 * cm >= 3 * n THEN v END) AS q3
       FROM c1),
h2 AS (SELECT x2 AS v, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM bth GROUP BY 1),
c2 AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cm,
              CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h2),
k2 AS (SELECT MIN(CASE WHEN 4 * cm >= n THEN v END) AS q1,
              MIN(CASE WHEN 2 * cm >= n THEN v END) AS q2,
              MIN(CASE WHEN 4 * cm >= 3 * n THEN v END) AS q3
       FROM c2),
cls AS (SELECT 1 + CASE WHEN x1 > k1.q1 THEN 1 ELSE 0 END
                 + CASE WHEN x1 > k1.q2 THEN 1 ELSE 0 END
                 + CASE WHEN x1 > k1.q3 THEN 1 ELSE 0 END AS qa,
               1 + CASE WHEN x2 > k2.q1 THEN 1 ELSE 0 END
                 + CASE WHEN x2 > k2.q2 THEN 1 ELSE 0 END
                 + CASE WHEN x2 > k2.q3 THEN 1 ELSE 0 END AS qb
        FROM bth, k1, k2),
mat AS (SELECT qa, qb, CAST(COUNT(*) AS BIGINT) AS n
        FROM cls GROUP BY 1, 2),
im AS (SELECT SUM(CASE WHEN qa = qb THEN n ELSE 0 END) AS diag,
              SUM(n) AS tot FROM mat)
SELECT CAST(mat.qa AS BIGINT) AS q_first, CAST(mat.qb AS BIGINT)
           AS q_second, mat.n,
       ROUND(CAST(im.diag AS DOUBLE) / im.tot, 6) AS immobility
FROM mat, im ORDER BY 1, 2""")
def ltv_quartile_mobility(sf_dir: str) -> pd.DataFrame:
    """Value-quartile mobility matrix: users active in BOTH halves of
    the date range classified into spend quartiles per half, and the
    4×4 transition counts between them — the income-mobility table
    for engagement ('do Q1 users stay Q1?'), with the immobility
    share (diagonal mass) as the headline. Quartile cuts use the
    boxplot family's lower-convention integer order statistics over
    each half's spend histogram, and bucket = 1 + #cuts strictly
    below, so ties bind identically on both engines — no NTILE
    row-ranking ambiguity. One per-user reduce + two tiny
    histograms."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    base = _events(sf_dir, ["ts", "user_id", "value"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def halves(df: pd.DataFrame) -> pd.DataFrame:
        first = df["d"] < cut
        return pd.DataFrame({
            "user_id": df["user_id"],
            "x1": np.where(first, df["c"], 0),
            "x2": np.where(first, 0, df["c"]),
            "p1": first.astype(np.int64),
            "p2": (~first).astype(np.int64)})

    u = reduce_sink(base.map_batches(halves, batch_format="pandas"),
                    ["user_id"],
                    {"x1": ("x1", "sum"), "x2": ("x2", "sum"),
                     "p1": ("p1", "max"), "p2": ("p2", "max")}) \
        .to_pandas()
    u = u[(u["p1"] == 1) & (u["p2"] == 1)]

    def cuts(x):
        vals, cnt = np.unique(x, return_counts=True)
        cm = np.cumsum(cnt)
        n = int(cm[-1])
        return (int(vals[np.searchsorted(4 * cm, n, "left")]),
                int(vals[np.searchsorted(2 * cm, n, "left")]),
                int(vals[np.searchsorted(4 * cm, 3 * n, "left")]))

    x1 = u["x1"].to_numpy(np.int64)
    x2 = u["x2"].to_numpy(np.int64)
    a1, a2, a3 = cuts(x1)
    b1, b2, b3 = cuts(x2)
    qa = 1 + (x1 > a1).astype(np.int64) + (x1 > a2) + (x1 > a3)
    qb = 1 + (x2 > b1).astype(np.int64) + (x2 > b2) + (x2 > b3)
    mat = pd.DataFrame({"q_first": qa, "q_second": qb, "n": 1}) \
        .groupby(["q_first", "q_second"], as_index=False).sum()
    diag = int(mat[mat["q_first"] == mat["q_second"]]["n"].sum())
    tot = int(mat["n"].sum())
    r6 = textstats.round_half_away
    mat["immobility"] = float(r6(float(diag) / tot, 6))
    return mat.astype({"q_first": np.int64, "q_second": np.int64,
                       "n": np.int64}) \
        .sort_values(["q_first", "q_second"], ignore_index=True)


@register("part_size_price_corr", sql="""
WITH p AS (SELECT CAST(p_size AS BIGINT) AS x,
                  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
           FROM part),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM p)
SELECT n, CAST(sx AS BIGINT) AS sum_size,
       CAST(sy AS BIGINT) AS sum_price_cents,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0
            THEN 0.0
            ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)),
                       6)
       END AS pearson_r
FROM m""")
def part_size_price_corr(sf_dir: str) -> pd.DataFrame:
    """Dimension-table sanity correlation: does part size track
    retail price in the catalog? — the quick 'is this attribute
    informative or noise' check a feature-selection pass starts
    with, on the PART dimension (catalogs are small enough that the
    exact answer is cheap, but the moment partials still distribute
    the same way as the cross-fact Pearson: 128-bit integers, one
    shared division)."""
    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["p_size"].to_numpy(np.int64)
        y = np.rint(df["p_retailprice"].to_numpy(np.float64)
                    * 100).astype(np.int64)
        xo, yo = x.astype(object), y.astype(object)
        row = {"n": [np.int64(len(x))],
               "sx": [np.int64(x.sum() if len(x) else 0)],
               "sy": [np.int64(y.sum() if len(y) else 0)]}
        for name, v in (("sxy", int((xo * yo).sum()) if len(x)
                         else 0),
                        ("sxx", int((xo * xo).sum()) if len(x)
                         else 0),
                        ("syy", int((yo * yo).sum()) if len(y)
                         else 0)):
            hi, lo = divmod(v, 1 << 62)
            row[name + "_hi"] = [np.int64(hi)]
            row[name + "_lo"] = [np.int64(lo)]
        return pd.DataFrame(row)

    p = rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_size", "p_retailprice"]) \
        .map_batches(moments, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())

    def word(sfx):
        return sum(int(h) * (1 << 62) + int(l)
                   for h, l in zip(p[sfx + "_hi"], p[sfx + "_lo"]))

    sxy, sxx, syy = word("sxy"), word("sxx"), word("syy")
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r6 = textstats.round_half_away
    r = 0.0 if den == 0 else \
        r6(float(n * sxy - sx * sy)
           / np.sqrt(float(n * sxx - sx * sx)
                     * float(n * syy - sy * sy)), 6)
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "sum_size": np.array([sx], np.int64),
        "sum_price_cents": np.array([sy], np.int64),
        "pearson_r": [float(r)]})


@register("props_k_uniformity", sql=r"""
WITH v AS (SELECT CAST(regexp_extract(props, '"k": (\d+)', 1)
                       AS BIGINT) AS k
           FROM events WHERE props LIKE '%"k"%'),
b AS (SELECT k // 10 AS band FROM v),
h AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nb FROM h)
SELECT CAST(h.band AS BIGINT) AS band, h.o,
       ROUND(SUM((o - CAST(n AS DOUBLE) / nb)
                 * (o - CAST(n AS DOUBLE) / nb)
                 / (CAST(n AS DOUBLE) / nb)) OVER (), 6) AS chi2
FROM h, t ORDER BY 1""")
def props_k_uniformity(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload profiling: extract the JSON integer
    from the props column (vectorized Arrow regex — never a per-row
    json.loads), band it by tens, and χ²-test the band histogram
    against uniform — the drift check for instrumented payload
    fields ('did the client start clamping k?'). Rows without the
    key drop on both engines; the expected count uses the OBSERVED
    band count so the test is well-defined under partial coverage."""
    def prep(t: pa.Table) -> pd.DataFrame:
        ext = pc.extract_regex(t["props"], r'"k": (?P<v>\d+)')
        v = pc.struct_field(ext, "v")
        mask = pc.is_valid(v).to_numpy(zero_copy_only=False)
        k = pd.to_numeric(
            pd.Series(v.to_pandas()[mask])).to_numpy(np.int64)
        return pd.DataFrame({"band": k // 10})

    h = reduce_sink(
        _events(sf_dir, ["props"]).map_batches(
            prep, batch_format="pyarrow"),
        ["band"], {"o": ("band", "size")}).to_pandas() \
        .sort_values("band", ignore_index=True)
    o = h["o"].to_numpy(np.int64)
    n = int(o.sum())
    nb = len(h)
    e = float(n) / nb
    chi2 = float(((o - e) * (o - e) / e).sum())
    r6 = textstats.round_half_away
    h["chi2"] = float(r6(chi2, 6))
    return h.astype({"band": np.int64, "o": np.int64})


@register("think_time_quantiles", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
g AS (SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                  PARTITION BY user_id, sid ORDER BY ts, event_id)))
              // 1000000 AS gap_s
      FROM sid),
h AS (SELECT gap_s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
cum AS (SELECT gap_s, cnt,
               CAST(SUM(cnt) OVER (ORDER BY gap_s) AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n_gaps,
       (SELECT CAST(MIN(gap_s) AS BIGINT) FROM cum
        WHERE 2 * cm >= n) AS p50_s,
       (SELECT CAST(MIN(gap_s) AS BIGINT) FROM cum
        WHERE 10 * cm >= 9 * n) AS p90_s,
       (SELECT CAST(MAX(gap_s) AS BIGINT) FROM cum) AS max_s""")
def think_time_quantiles(sf_dir: str) -> pd.DataFrame:
    """Intra-session think time: exact quantiles of the
    second-quantized gap between consecutive events INSIDE one
    session (the human pacing signal — cross-session gaps are
    absence, not thinking, and the 30-min sessionizer bounds max at
    1799 s by construction). Gaps compute in the same bucket-local
    sessionize; only the lossless gap histogram shuffles; p50/p90
    are the shared integer order-statistic tests."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        # sessionize and take gaps in ONE bucket-local pass — a
        # map_batches over the sessionize output could see a session
        # split across blocks and drop its boundary gap
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        same_user = np.zeros(len(g), bool)
        same_user[1:] = uid[1:] == uid[:-1]
        gap_us = us - np.roll(us, 1)
        in_sess = same_user & (gap_us < 1_800_000_000)
        gap = (gap_us // 1_000_000)[in_sess]
        u, c = np.unique(gap, return_counts=True)
        return pd.DataFrame({"gap_s": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    h = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: gaps(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["gap_s"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("gap_s", ignore_index=True)
    gap_s = h["gap_s"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p50 = int(gap_s[np.searchsorted(2 * cm, n, side="left")])
    p90 = int(gap_s[np.searchsorted(10 * cm, 9 * n, side="left")])
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "p50_s": np.array([p50], np.int64),
        "p90_s": np.array([p90], np.int64),
        "max_s": np.array([int(gap_s[-1])], np.int64)})


@register("conversion_by_session_ordinal", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, LEAST(sid, 10) AS ordinal,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM sid GROUP BY user_id, sid)
SELECT CAST(ordinal AS BIGINT) AS session_ordinal,
       CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(conv) AS BIGINT) AS converted,
       ROUND(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 6) AS conv_rate
FROM s GROUP BY ordinal ORDER BY 1""")
def conversion_by_session_ordinal(sf_dir: str) -> pd.DataFrame:
    """Conversion by session ORDINAL: does the first session convert
    or the fifth? (the onboarding-funnel shape — ordinal 10 lumps
    the tail) — per-session purchase flags roll up inside the
    bucket-local sessionize (sessions never span buckets, sid IS
    the per-user ordinal), so only (ordinal, sessions, converted)
    partials shuffle; one shared division per row."""
    sess = _sessionized_events(sf_dir)

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        # NOTE: a session may span blocks of the sessionize output,
        # so the per-(user, sid) MAX must be a KEYED reduce — a
        # block-local rollup would double-count split sessions
        return pd.DataFrame({
            "user_id": df["user_id"],
            "sid": df["sid"].to_numpy(np.int64),
            "conv": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)})

    per = reduce_sink(sess.map_batches(rows, batch_format="pandas"),
                      ["user_id", "sid"], {"conv": ("conv", "max")})

    def band(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ordinal": np.minimum(df["sid"].to_numpy(np.int64), 10),
            "sessions": np.ones(len(df), np.int64),
            "converted": df["conv"].to_numpy(np.int64)})

    out = reduce_sink(
        per.map_batches(band, batch_format="pandas"),
        ["ordinal"], {"sessions": ("sessions", "sum"),
                      "converted": ("converted", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    out = out.rename(columns={"ordinal": "session_ordinal"})
    out["conv_rate"] = r6(out["converted"].to_numpy(np.float64)
                          / out["sessions"].to_numpy(np.float64), 6)
    return out.astype({"session_ordinal": np.int64,
                       "sessions": np.int64,
                       "converted": np.int64}) \
        .sort_values("session_ordinal", ignore_index=True)


@register("session_value_quantiles", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id, value,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM (SELECT user_id, event_type, ts, event_id, value,
                          CASE WHEN prev_ts IS NULL
                                    OR epoch_us(ts) - epoch_us(prev_ts)
                                       >= 1800000000
                               THEN 1 ELSE 0 END AS ns
                   FROM (SELECT user_id, event_type, ts, event_id,
                                value,
                                LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                                    AS prev_ts
                         FROM events))),
s AS (SELECT user_id, sid,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM sid GROUP BY 1, 2),
h AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM s GROUP BY 1),
cum AS (SELECT cents, cnt,
               CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n_sessions,
       (SELECT CAST(MIN(cents) AS BIGINT) FROM cum
        WHERE 4 * cm >= n) AS p25_cents,
       (SELECT CAST(MIN(cents) AS BIGINT) FROM cum
        WHERE 2 * cm >= n) AS p50_cents,
       (SELECT CAST(MIN(cents) AS BIGINT) FROM cum
        WHERE 4 * cm >= 3 * n) AS p75_cents,
       (SELECT CAST(MAX(cents) AS BIGINT) FROM cum) AS max_cents""")
def session_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Session-basket size: exact quartiles of per-session total
    value — the 'how much is one visit worth' distribution pricing
    and caching decisions key on (per-EVENT quantiles hide that a
    session bundles many). Per-session cents roll up as a KEYED
    reduce (sessions may split across sessionize-output blocks);
    the lossless session-value histogram is the only shuffle; the
    quartiles are the shared lower-convention integer tests."""
    sess = _sessionized_events_with_value(sf_dir)
    per = reduce_sink(sess, ["user_id", "sid"],
                      {"cents": ("cents", "sum")})
    h = reduce_sink(per, ["cents"], {"cnt": ("cents", "size")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    cents = h["cents"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p25 = int(cents[np.searchsorted(4 * cm, n, side="left")])
    p50 = int(cents[np.searchsorted(2 * cm, n, side="left")])
    p75 = int(cents[np.searchsorted(4 * cm, 3 * n, side="left")])
    return pd.DataFrame({
        "n_sessions": np.array([n], np.int64),
        "p25_cents": np.array([p25], np.int64),
        "p50_cents": np.array([p50], np.int64),
        "p75_cents": np.array([p75], np.int64),
        "max_cents": np.array([int(cents[-1])], np.int64)})


def _sessionized_events_with_value(sf_dir: str,
                                   num_buckets: int = 32):
    """Sessionize carrying integer cents (the value-aware sibling of
    _sessionized_events — same bucket-local vectorized pass)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64)
                         % num_buckets).astype(np.int32)
        return df

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        g["sid"] = ns.groupby(g["user_id"], sort=False).cumsum() \
            .astype(np.int64)
        g["cents"] = np.rint(g["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)
        return g[["user_id", "sid", "cents"]]

    return (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_").map_groups(sessionize,
                                           batch_format="pandas"))


@register("first_session_value_share", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id, value,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM (SELECT user_id, ts, event_id, value,
                          CASE WHEN prev_ts IS NULL
                                    OR epoch_us(ts) - epoch_us(prev_ts)
                                       >= 1800000000
                               THEN 1 ELSE 0 END AS ns
                   FROM (SELECT user_id, ts, event_id, value,
                                LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                                    AS prev_ts
                         FROM events))),
u AS (SELECT user_id,
             CAST(SUM(CASE WHEN sid = 1
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS first_c,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS total_c
      FROM sid GROUP BY user_id),
f AS (SELECT first_c, total_c FROM u WHERE total_c > 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(SUM(CAST(first_c AS DOUBLE) / total_c) / COUNT(*), 6)
           AS mean_first_share,
       ROUND(CAST(SUM(first_c) AS DOUBLE) / SUM(total_c), 6)
           AS pooled_first_share
FROM f""")
def first_session_value_share(sf_dir: str) -> pd.DataFrame:
    """How front-loaded is user value: the share of each user's
    lifetime cents earned in their FIRST session, both per-user mean
    (every user votes equally) and pooled (dollars vote) — the two
    disagree exactly when whales behave differently, which is the
    insight. Session 1 membership and both sums come from the
    value-carrying bucket-local sessionize; only per-user (first,
    total) integer partials leave; zero-value users drop."""
    sess = _sessionized_events_with_value(sf_dir)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        first = df["sid"].to_numpy(np.int64) == 1
        return pd.DataFrame({
            "user_id": df["user_id"],
            "first_c": np.where(first, df["cents"], 0),
            "total_c": df["cents"].to_numpy(np.int64)})

    u = reduce_sink(sess.map_batches(split, batch_format="pandas"),
                    ["user_id"], {"first_c": ("first_c", "sum"),
                                  "total_c": ("total_c", "sum")}) \
        .to_pandas()
    u = u[u["total_c"] > 0]
    n = len(u)
    r6 = textstats.round_half_away
    mean_share = r6(float((u["first_c"] / u["total_c"]).sum()) / n,
                    6)
    pooled = r6(float(int(u["first_c"].sum()))
                / int(u["total_c"].sum()), 6)
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "mean_first_share": [float(mean_share)],
        "pooled_first_share": [float(pooled)]})


@register("first_event_type_dist", sql="""
WITH f AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS users
FROM f WHERE rn = 1 GROUP BY 1 ORDER BY 1""")
def first_event_type_dist(sf_dir: str) -> pd.DataFrame:
    """First-touch distribution: which event type begins each user's
    lifetime — the acquisition-mix table attribution models anchor
    on. The per-user argmin((ts, event_id)) happens inside the
    user-hash bucket (one sort, first row per user); only (type,
    users) partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        top = g.groupby("user_id", as_index=False).first()
        return top.groupby("event_type", as_index=False).size() \
            .rename(columns={"size": "users"})

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: first(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["event_type"], {"users": ("users", "sum")}).to_pandas()
    return out.astype({"users": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("type_hour_residuals_topk", sql="""
WITH c AS (SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h,
                  CAST(COUNT(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2),
rm AS (SELECT g, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
cm AS (SELECT h, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
r AS (SELECT c.g, c.h, c.o,
             (c.o - CAST(rm.rt AS DOUBLE) * cm.ct / t.n)
             / sqrt(CAST(rm.rt AS DOUBLE) * cm.ct / t.n) AS resid
      FROM c JOIN rm ON c.g = rm.g JOIN cm ON c.h = cm.h, t),
best AS (SELECT g, h, o, resid,
                ROW_NUMBER() OVER (ORDER BY ABS(ROUND(resid, 9))
                                   DESC, g, h) AS rn
         FROM r)
SELECT g AS event_type, CAST(h AS BIGINT) AS hour, o,
       ROUND(resid, 6) AS std_residual
FROM best WHERE rn <= 10 ORDER BY rn""")
def type_hour_residuals_topk(sf_dir: str) -> pd.DataFrame:
    """The actionable half of the χ² independence test: the ten
    (type, hour) cells with the largest standardized residuals
    (o − e)/√e — χ² says THAT type and hour interact, the residual
    table says WHERE ('errors spike at 03:00'). Same single
    contingency reduce as chi_square_type_hour; residuals are
    shared float expressions over exact integer marginals, ranked
    on the 9-dp-ROUNDED magnitude with (type, hour) tiebreak."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "h": df["ts"].dt.hour.to_numpy(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "h"], {"o": ("h", "size")}).to_pandas()
    rt = c.groupby("g")["o"].sum()
    ct = c.groupby("h")["o"].sum()
    n = int(c["o"].sum())
    e = (c["g"].map(rt).to_numpy(np.float64)
         * c["h"].map(ct).to_numpy(np.float64) / n)
    resid = (c["o"].to_numpy(np.float64) - e) / np.sqrt(e)
    r9 = textstats.round_half_away
    c = c.assign(resid=resid, key=np.abs(r9(resid, 9)))
    c = c.sort_values(["key", "g", "h"],
                      ascending=[False, True, True],
                      kind="mergesort").head(10)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "event_type": c["g"].to_numpy(),
        "hour": c["h"].to_numpy(np.int64),
        "o": c["o"].to_numpy(np.int64),
        "std_residual": r6(c["resid"].to_numpy(np.float64), 6)}) \
        .reset_index(drop=True)


@register("source_lang_entropy", sql="""
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM c GROUP BY 1)
SELECT c.source, t.tot AS n_docs, t.n_langs,
       ROUND(SUM(-(c.n / CAST(t.tot AS DOUBLE))
                 * LOG2(c.n / CAST(t.tot AS DOUBLE))), 6)
           AS lang_entropy_bits
FROM c JOIN t USING (source)
GROUP BY c.source, t.tot, t.n_langs ORDER BY 1""")
def source_lang_entropy(sf_dir: str) -> pd.DataFrame:
    """Language-mix entropy per source — the corpus-governance
    number: a crawl claiming 'multilingual' at 0.2 bits is
    monolingual with noise, and a spike in a known-English feed's
    entropy is a pipeline bug. One (source, lang) count reduce;
    entropy closes as the shared guarded p·log₂p expression per
    source."""
    c = reduce_sink(
        _docs(sf_dir, ["source", "lang"]),
        ["source", "lang"], {"n": ("lang", "size")}).to_pandas()
    r6 = textstats.round_half_away
    rows = []
    for src, grp in c.groupby("source", sort=True):
        n = grp["n"].to_numpy(np.float64)
        tot = int(n.sum())
        p = n / float(tot)
        ent = float((-(p) * np.log2(p)).sum())
        rows.append((src, tot, len(grp), float(r6(ent, 6))))
    return pd.DataFrame(rows, columns=["source", "n_docs",
                                       "n_langs",
                                       "lang_entropy_bits"]) \
        .astype({"n_docs": np.int64, "n_langs": np.int64})


@register("doc_length_quartiles_by_lang", sql="""
WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2),
cum AS (SELECT lang, v, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY v)
                    AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT)
                   AS n
        FROM h)
SELECT lang, MIN(n) AS n_docs,
       CAST(MIN(CASE WHEN 4 * cm >= n THEN v END) AS BIGINT) AS q1,
       CAST(MIN(CASE WHEN 2 * cm >= n THEN v END) AS BIGINT) AS q2,
       CAST(MIN(CASE WHEN 4 * cm >= 3 * n THEN v END) AS BIGINT)
           AS q3
FROM cum GROUP BY lang ORDER BY 1""")
def doc_length_quartiles_by_lang(sf_dir: str) -> pd.DataFrame:
    """Document-length quartiles per language (exact, the boxplot
    family's lower-convention order statistics over the n_chars
    histogram) — the length-prior tokenizer budgeting and
    per-language packing quotas read from; a language whose median
    halves between crawls changed its extraction, not its prose.
    One (lang, n_chars) reduce; integer rank tests close the
    quartiles."""
    h = reduce_sink(
        _docs(sf_dir, ["lang", "n_chars"]),
        ["lang", "n_chars"], {"cnt": ("n_chars", "size")}) \
        .to_pandas().sort_values(["lang", "n_chars"],
                                 ignore_index=True)
    rows = []
    for lang, grp in h.groupby("lang", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        v = grp["n_chars"].to_numpy(np.int64)
        n = int(cnt.sum())
        cm = np.cumsum(cnt)
        q1 = int(v[np.searchsorted(4 * cm, n, side="left")])
        q2 = int(v[np.searchsorted(2 * cm, n, side="left")])
        q3 = int(v[np.searchsorted(4 * cm, 3 * n, side="left")])
        rows.append((lang, n, q1, q2, q3))
    return pd.DataFrame(rows, columns=["lang", "n_docs", "q1",
                                       "q2", "q3"]) \
        .astype({"n_docs": np.int64, "q1": np.int64,
                 "q2": np.int64, "q3": np.int64})


@register("embedding_norm_profile", sql="""
WITH n AS (SELECT ROUND(sqrt(list_dot_product(
                      CAST(embedding AS DOUBLE[]),
                      CAST(embedding AS DOUBLE[]))), 9) AS nrm
           FROM embeddings)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(SUM(nrm) / COUNT(*), 6) AS mean_norm,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm,
       CAST(SUM(CASE WHEN nrm >= 0.99 AND nrm <= 1.01
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unit
FROM n""")
def embedding_norm_profile(sf_dir: str) -> pd.DataFrame:
    """Embedding hygiene check: the L2-norm profile of the vector
    column — 'are these unit-normalized?' decides whether cosine and
    dot-product retrieval agree, and a norm tail is the first sign
    of a bad encoder batch. Each row's norm computes vectorized
    (float32 widens exactly to float64 on both engines) and ROUNDS
    TO 9 DP before any aggregate or band test, so min/max/band
    membership compare identical doubles; per-batch (n, Σ, min,
    max, in-band) partials are all that shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    r9 = textstats.round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        nrm = r9(np.sqrt((m * m).sum(axis=1)), 9)
        return pd.DataFrame({
            "n": [np.int64(len(nrm))],
            "s": [float(nrm.sum())],
            "mn": [float(nrm.min())],
            "mx": [float(nrm.max())],
            "unit": [np.int64(((nrm >= 0.99)
                               & (nrm <= 1.01)).sum())]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_vectors": np.array([n], np.int64),
        "mean_norm": [float(r6(float(p["s"].sum()) / n, 6))],
        "min_norm": [float(r6(float(p["mn"].min()), 6))],
        "max_norm": [float(r6(float(p["mx"].max()), 6))],
        "n_unit": np.array([int(p["unit"].sum())], np.int64)})


@register("embedding_fisher_ratio", sql="""
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
s2 AS (SELECT SUM(list_dot_product(v, v)) AS tot2,
              CAST(COUNT(*) AS BIGINT) AS n FROM e),
dims AS (SELECT UNNEST(generate_series(
             1, (SELECT MAX(len(v)) FROM e))) AS dim),
d AS (SELECT e.label, dims.dim, SUM(e.v[dims.dim]) AS s
      FROM e, dims GROUP BY 1, 2),
cn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nc
       FROM e GROUP BY 1),
mu AS (SELECT d.label, SUM(d.s * d.s) / MIN(cn.nc) AS nc_mu2
       FROM d JOIN cn USING (label) GROUP BY d.label),
gm AS (SELECT SUM(s) AS gs, dim FROM d GROUP BY dim),
g2 AS (SELECT SUM(gs * gs) AS g2 FROM gm),
agg AS (SELECT (SELECT SUM(nc_mu2) FROM mu) AS bsum,
               (SELECT tot2 FROM s2) AS tot2,
               (SELECT g2 FROM g2) AS g2,
               (SELECT CAST(n AS DOUBLE) FROM s2) AS n)
SELECT CAST(n AS BIGINT) AS n_vectors,
       ROUND(tot2 - bsum, 6) AS within_ss,
       ROUND(bsum - g2 / n, 6) AS between_ss,
       CASE WHEN tot2 - bsum = 0.0 THEN 0.0
            ELSE ROUND((bsum - g2 / n) / (tot2 - bsum), 6)
       END AS fisher_ratio
FROM agg""")
def embedding_fisher_ratio(sf_dir: str) -> pd.DataFrame:
    """Label separability of the embedding space: trace(S_between) /
    trace(S_within) — the Fisher-criterion scalar ('do the classes
    actually occupy different regions?') that predicts linear-probe
    accuracy before training anything. Everything closes from three
    moment families (Σ‖x‖², per-label per-dim sums, counts) via the
    scatter identities Σ‖x−μ_c‖² = Σ‖x‖² − Σn_c‖μ_c‖² — per-batch
    partials are (labels × dims) floats, no vector ever gathers;
    the oracle pays an UNNEST WITH ORDINALITY instead. Collapsed
    within-scatter pins the ratio to 0."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        rows = []
        tot2 = float((m * m).sum())
        for lb in np.unique(lab):
            sel = m[lab == lb]
            rows.append((int(lb), len(sel), sel.sum(axis=0), 0.0))
        out = pd.DataFrame(rows, columns=["label", "nc", "s", "z"])
        out["tot2"] = 0.0
        out.loc[out.index[:1], "tot2"] = tot2
        return out[["label", "nc", "s", "tot2"]]

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    tot2 = float(p["tot2"].sum())
    n = int(p["nc"].sum())
    sums = {}
    counts = {}
    for lb, grp in p.groupby("label"):
        counts[lb] = int(grp["nc"].sum())
        sums[lb] = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
    bsum = float(sum(float((s * s).sum()) / counts[lb]
                     for lb, s in sums.items()))
    gs = np.sum(np.stack(list(sums.values())), axis=0)
    g2 = float((gs * gs).sum())
    r6 = textstats.round_half_away
    within = tot2 - bsum
    between = bsum - g2 / float(n)
    ratio = 0.0 if within == 0.0 else r6(between / within, 6)
    return pd.DataFrame({
        "n_vectors": np.array([n], np.int64),
        "within_ss": [float(r6(within, 6))],
        "between_ss": [float(r6(between, 6))],
        "fisher_ratio": [float(ratio)]})


@register("value_lag1_corr_within_user", sql="""
WITH o AS (SELECT user_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(ROUND(LAG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       * 100) AS BIGINT) AS pc
           FROM events),
p AS (SELECT pc AS x, c AS y FROM o WHERE pc IS NOT NULL),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM p)
SELECT n,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0
            THEN 0.0
            ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)),
                       6)
       END AS lag1_r
FROM m""")
def value_lag1_corr_within_user(sf_dir: str) -> pd.DataFrame:
    """Spend persistence at transaction grain: Pearson between each
    event's value and the SAME user's previous event value — do
    amounts cluster within a user's stream (habitual spenders) or
    reset every event? Consecutive pairs come from the shared
    per-user sort+shift; the moment partials ride the two-word
    128-bit transport (Σxy overflows int64 by design); one shared
    division closes r."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        c = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        x = np.roll(c, 1)[same].astype(object)
        y = c[same].astype(object)
        row = {"n": [np.int64(len(y))],
               "sx": [np.int64(int(x.sum()) if len(x) else 0)],
               "sy": [np.int64(int(y.sum()) if len(y) else 0)]}
        for name, v in (("sxy", int((x * y).sum()) if len(x) else 0),
                        ("sxx", int((x * x).sum()) if len(x) else 0),
                        ("syy", int((y * y).sum()) if len(y)
                         else 0)):
            hi, lo = divmod(v, 1 << 62)
            row[name + "_hi"] = [np.int64(hi)]
            row[name + "_lo"] = [np.int64(lo)]
        return pd.DataFrame(row)

    p = (ds.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_")
         .map_groups(lambda g: moments(g.drop(columns=["bucket_"])),
                     batch_format="pandas")).to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())

    def word(sfx):
        return sum(int(h) * (1 << 62) + int(l)
                   for h, l in zip(p[sfx + "_hi"], p[sfx + "_lo"]))

    sxy, sxx, syy = word("sxy"), word("sxx"), word("syy")
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r6 = textstats.round_half_away
    r = 0.0 if den == 0 else \
        r6(float(n * sxy - sx * sy)
           / np.sqrt(float(n * sxx - sx * sx)
                     * float(n * syy - sy * sy)), 6)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "lag1_r": [float(r)]})


@register("lineitem_qty_discount_mi", sql="""
WITH b AS (SELECT CAST(l_quantity AS BIGINT) // 10 AS qb,
                  CAST(ROUND(l_discount * 100) AS BIGINT) // 2 AS db
           FROM lineitem),
c AS (SELECT qb, db, CAST(COUNT(*) AS BIGINT) AS o
      FROM b GROUP BY 1, 2),
rm AS (SELECT qb, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
cm AS (SELECT db, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c)
SELECT (SELECT n FROM t) AS n_items,
       ROUND(SUM((c.o / CAST(t.n AS DOUBLE))
                 * LN(c.o * CAST(t.n AS DOUBLE)
                      / (CAST(rm.rt AS DOUBLE) * cm.ct))), 6)
           AS mi_nats
FROM c JOIN rm USING (qb) JOIN cm USING (db), t""")
def lineitem_qty_discount_mi(sf_dir: str) -> pd.DataFrame:
    """Pricing-policy dependence on the LINEITEM fact: mutual
    information between quantity bands (tens) and discount bands
    (2%-wide) — 0 nats means discounts ignore volume, anything
    above means a volume-discount schedule exists (the
    frequentist-free sibling of a χ² on the same grid). One banded
    contingency reduce; MI closes over exact integer marginals with
    the shared p·ln(pn/rc) expression."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qb": df["l_quantity"].to_numpy(np.int64) // 10,
            "db": np.rint(df["l_discount"].to_numpy(np.float64)
                          * 100).astype(np.int64) // 2})

    c = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_quantity", "l_discount"])
        .map_batches(prep, batch_format="pandas"),
        ["qb", "db"], {"o": ("qb", "size")}).to_pandas()
    rt = c.groupby("qb")["o"].sum()
    ct = c.groupby("db")["o"].sum()
    n = int(c["o"].sum())
    o = c["o"].to_numpy(np.float64)
    e = (c["qb"].map(rt).to_numpy(np.float64)
         * c["db"].map(ct).to_numpy(np.float64))
    mi = float(((o / n) * np.log(o * float(n) / e)).sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({"n_items": np.array([n], np.int64),
                         "mi_nats": [float(r6(mi, 6))]})


@register("daily_median_value_series", sql="""
WITH h AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
cum AS (SELECT d, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY d ORDER BY c)
                    AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER (PARTITION BY d) AS BIGINT) AS n
        FROM h)
SELECT CAST(d AS BIGINT) AS epoch_day, MIN(n) AS n_events,
       CAST(MIN(CASE WHEN 2 * cm >= n THEN c END) AS BIGINT)
           AS median_cents
FROM cum GROUP BY d ORDER BY 1""")
def daily_median_value_series(sf_dir: str) -> pd.DataFrame:
    """Daily MEDIAN value series — the robust center per day that a
    mean series can't give (one whale day doesn't move it), the
    monitoring input for 'did typical transaction size shift'.
    Per-(day, cents) histogram reduce, then each day's lower-median
    order statistic (2·cum ≥ n) closes from integers; O(days ×
    distinct cents) aggregate, no per-day sort of raw rows."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["d", "c"], ignore_index=True)
    rows = []
    for d, grp in h.groupby("d", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        cm = np.cumsum(cnt)
        med = int(c[np.searchsorted(2 * cm, n, side="left")])
        rows.append((int(d), n, med))
    return pd.DataFrame(rows, columns=["epoch_day", "n_events",
                                       "median_cents"]) \
        .astype({"epoch_day": np.int64, "n_events": np.int64,
                 "median_cents": np.int64})


@register("single_type_user_share", sql="""
WITH u AS (SELECT user_id,
                  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS single_type_users,
       CAST(SUM(CASE WHEN k = 1 THEN n ELSE 0 END) AS BIGINT)
           AS their_events,
       ROUND(CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS share
FROM u""")
def single_type_user_share(sf_dir: str) -> pd.DataFrame:
    """Monomaniac share: users who only ever emit ONE event type —
    the scripted-client / shallow-integration signal (human usage
    mixes types; a 40% single-type share means the 'users' metric
    counts a lot of cron). Exact per-user distinct-type counts via
    the two-phase (user, type) reduce; only per-user (k, n) rows
    then three scalars shuffle."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    ut = reduce_sink(ds, ["user_id", "event_type"],
                     {"n": ("event_type", "size")})
    u = reduce_sink(ut, ["user_id"],
                    {"k": ("event_type", "size"),
                     "n": ("n", "sum")}).to_pandas()
    n_users = len(u)
    single = u[u["k"] == 1]
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "single_type_users": np.array([len(single)], np.int64),
        "their_events": np.array([int(single["n"].sum())],
                                 np.int64),
        "share": [float(r6(float(len(single)) / n_users, 6))]})


@register("orders_per_capita_by_nation", sql="""
WITH cu AS (SELECT c_nationkey AS nk,
                   CAST(COUNT(*) AS BIGINT) AS customers
            FROM customer GROUP BY 1),
o AS (SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS orders
      FROM orders JOIN customer c ON o_custkey = c.c_custkey
      GROUP BY 1)
SELECT n.n_name AS nation, cu.customers,
       COALESCE(o.orders, 0) AS orders,
       ROUND(CAST(COALESCE(o.orders, 0) AS DOUBLE) / cu.customers,
             6) AS orders_per_customer
FROM cu JOIN nation n ON cu.nk = n.n_nationkey
LEFT JOIN o ON cu.nk = o.nk
ORDER BY 1""")
def orders_per_capita_by_nation(sf_dir: str) -> pd.DataFrame:
    """Per-capita ordering intensity by nation — raw order counts
    rank big markets first; dividing by the customer base finds
    where ENGAGEMENT is highest (the per-capita normalization every
    geo comparison needs). Customer→nation broadcast once; orders
    reduce per nationkey; the 25-row rollup joins names driver-side
    with a LEFT join so customer-only nations keep zero orders."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"].to_numpy(np.int64),
                                cust["c_nationkey"]
                                .to_numpy(np.int64))))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        nk = df["o_custkey"].map(cmap).to_numpy(np.int64)
        return pd.DataFrame({"nk": nk}).groupby(
            "nk", as_index=False).size() \
            .rename(columns={"size": "orders"})

    o = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"])
        .map_batches(partial, batch_format="pandas"),
        ["nk"], {"orders": ("orders", "sum")}).to_pandas()
    cu = cust.groupby("c_nationkey", as_index=False).size() \
        .rename(columns={"c_nationkey": "nk", "size": "customers"})
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    j = cu.merge(o, on="nk", how="left").fillna({"orders": 0}) \
        .merge(nat, left_on="nk", right_on="n_nationkey")
    r6 = textstats.round_half_away
    out = pd.DataFrame({
        "nation": j["n_name"],
        "customers": j["customers"].astype(np.int64),
        "orders": j["orders"].astype(np.int64),
        "orders_per_customer": r6(
            j["orders"].to_numpy(np.float64)
            / j["customers"].to_numpy(np.float64), 6)})
    return out.sort_values("nation", ignore_index=True)


@register("type_signature_time", sql="""
WITH c AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                  CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
best AS (SELECT event_type, dow, hr, n,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, dow, hr) AS rn
         FROM c)
SELECT event_type, CAST(dow AS BIGINT) AS dow,
       CAST(hr AS BIGINT) AS hour, n
FROM best WHERE rn = 1 ORDER BY 1""")
def type_signature_time(sf_dir: str) -> pd.DataFrame:
    """Each type's signature cell: the single (day-of-week, hour)
    slot where it fires most — the one-line answer to 'when does
    this thing happen' that a full heatmap buries. One 168-cell
    contingency per type; integer argmax with (count DESC, dow, hr)
    tiebreak on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "dow": ((us // 86_400_000_000 + 4) % 7)
            .astype(np.int64),
            "hr": df["ts"].dt.hour.to_numpy(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["event_type", "dow", "hr"], {"n": ("hr", "size")}) \
        .to_pandas()
    c = c.sort_values(["event_type", "n", "dow", "hr"],
                      ascending=[True, False, True, True],
                      kind="mergesort")
    out = c.groupby("event_type", as_index=False).first() \
        .rename(columns={"hr": "hour"})
    return out[["event_type", "dow", "hour", "n"]] \
        .astype({"dow": np.int64, "hour": np.int64, "n": np.int64}) \
        .sort_values("event_type", ignore_index=True)


@register("order_to_ship_lag_quantiles", sql="""
WITH l AS (SELECT l_orderkey,
                  epoch_us(l_shipdate) // 86400000000 AS sd
           FROM lineitem),
o AS (SELECT o_orderkey,
             epoch_us(o_orderdate) // 86400000000 AS od
      FROM orders),
g AS (SELECT l.sd - o.od AS lag_d
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey),
h AS (SELECT lag_d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1),
cum AS (SELECT lag_d, cnt,
               CAST(SUM(cnt) OVER (ORDER BY lag_d) AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n_items,
       (SELECT CAST(MIN(lag_d) AS BIGINT) FROM cum
        WHERE 2 * cm >= n) AS p50_days,
       (SELECT CAST(MIN(lag_d) AS BIGINT) FROM cum
        WHERE 10 * cm >= 9 * n) AS p90_days,
       (SELECT CAST(MIN(lag_d) AS BIGINT) FROM cum) AS min_days,
       (SELECT CAST(MAX(lag_d) AS BIGINT) FROM cum) AS max_days""")
def order_to_ship_lag_quantiles(sf_dir: str) -> pd.DataFrame:
    """Fulfillment latency: exact quantiles of the order-to-ship lag
    in whole days across every line item — the SLA distribution a
    mean lag hides (p90 is the promise customers feel). The
    fact-to-fact join runs through auto_join's hash machinery
    (lineitem co-partitions with orders on orderkey — no broadcast
    of a fact table); day lags reduce to a lossless histogram and
    the quantiles are the shared integer order-statistic tests."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "sd": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000}),
        batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "od": df["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000}),
        batch_format="pandas")
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def lag_hist(df: pd.DataFrame) -> pd.DataFrame:
        lag = df["sd"].to_numpy(np.int64) \
            - df["od"].to_numpy(np.int64)
        u, c = np.unique(lag, return_counts=True)
        return pd.DataFrame({"lag_d": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    h = reduce_sink(j.map_batches(lag_hist, batch_format="pandas"),
                    ["lag_d"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("lag_d", ignore_index=True)
    lag_d = h["lag_d"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p50 = int(lag_d[np.searchsorted(2 * cm, n, side="left")])
    p90 = int(lag_d[np.searchsorted(10 * cm, 9 * n, side="left")])
    return pd.DataFrame({
        "n_items": np.array([n], np.int64),
        "p50_days": np.array([p50], np.int64),
        "p90_days": np.array([p90], np.int64),
        "min_days": np.array([int(lag_d[0])], np.int64),
        "max_days": np.array([int(lag_d[-1])], np.int64)})


@register("tax_band_revenue", sql="""
WITH b AS (SELECT CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      AS cents
           FROM lineitem)
SELECT tax_pct, CAST(COUNT(*) AS BIGINT) AS items,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(cents * tax_pct) AS BIGINT) AS tax_cents_x100
FROM b GROUP BY 1 ORDER BY 1""")
def tax_band_revenue(sf_dir: str) -> pd.DataFrame:
    """Tax incidence profile: items, revenue and collected tax per
    whole-percent tax band — the effective-rate table a finance
    reconciliation checks against the ledger (Σ tax_cents_x100/100
    must match remitted tax to the cent). Percent bands and all
    three measures are exact integers off one map-side banding; the
    tax amount keeps the ×100 scaling so no division ever rounds."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        tax = np.rint(df["l_tax"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        return pd.DataFrame({"tax_pct": tax, "items": 1,
                             "revenue_cents": cents,
                             "tax_cents_x100": cents * tax})

    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_tax", "l_extendedprice"])
        .map_batches(prep, batch_format="pandas"),
        ["tax_pct"], {"items": ("items", "sum"),
                      "revenue_cents": ("revenue_cents", "sum"),
                      "tax_cents_x100": ("tax_cents_x100", "sum")}) \
        .to_pandas()
    return out.astype({"tax_pct": np.int64, "items": np.int64,
                       "revenue_cents": np.int64,
                       "tax_cents_x100": np.int64}) \
        .sort_values("tax_pct", ignore_index=True)


@register("suppliers_per_part_hist", sql="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS k
      FROM ps GROUP BY 1)
SELECT k AS n_suppliers, CAST(COUNT(*) AS BIGINT) AS parts
FROM c GROUP BY 1 ORDER BY 1""")
def suppliers_per_part_hist(sf_dir: str) -> pd.DataFrame:
    """Supply-chain redundancy: how many distinct suppliers actually
    shipped each part (from observed line items) — the
    single-sourced tail (k = 1) is the supply-risk list procurement
    wants. Two-phase exact distinct (part, supplier) then a
    per-part count histogram; only keyed aggregates shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    ps = reduce_sink(ds, ["l_partkey", "l_suppkey"],
                     {"n": ("l_suppkey", "size")})
    c = reduce_sink(ps, ["l_partkey"], {"k": ("n", "size")})
    out = reduce_sink(c, ["k"], {"parts": ("k", "size")}) \
        .to_pandas().rename(columns={"k": "n_suppliers"})
    return out.astype({"n_suppliers": np.int64, "parts": np.int64}) \
        .sort_values("n_suppliers", ignore_index=True)


@register("lines_per_order_hist", sql="""
WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
           FROM lineitem GROUP BY 1)
SELECT k AS n_lines, CAST(COUNT(*) AS BIGINT) AS orders
FROM c GROUP BY 1 ORDER BY 1""")
def lines_per_order_hist(sf_dir: str) -> pd.DataFrame:
    """Basket-width distribution on the commercial fact: line items
    per order — the order-complexity profile batch sizing and
    packing heuristics key on. Per-order counts then a count
    histogram; two keyed reduces, integers end to end."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    c = reduce_sink(ds, ["l_orderkey"], {"k": ("l_orderkey", "size")})
    out = reduce_sink(c, ["k"], {"orders": ("k", "size")}) \
        .to_pandas().rename(columns={"k": "n_lines"})
    return out.astype({"n_lines": np.int64, "orders": np.int64}) \
        .sort_values("n_lines", ignore_index=True)


@register("value_by_session_position", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id, value,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM (SELECT user_id, ts, event_id, value,
                          CASE WHEN prev_ts IS NULL
                                    OR epoch_us(ts) - epoch_us(prev_ts)
                                       >= 1800000000
                               THEN 1 ELSE 0 END AS ns
                   FROM (SELECT user_id, ts, event_id, value,
                                LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                                    AS prev_ts
                         FROM events))),
r AS (SELECT value,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, sid) AS sz
      FROM sid),
p AS (SELECT CASE WHEN sz = 1 THEN 'only'
                  WHEN rn = 1 THEN 'first'
                  WHEN rn = sz THEN 'last'
                  ELSE 'middle' END AS pos,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM r)
SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents,
       ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 6)
           AS mean_cents
FROM p GROUP BY 1 ORDER BY 1""")
def value_by_session_position(sf_dir: str) -> pd.DataFrame:
    """Where in a session the money happens: events classified as
    first / middle / last (single-event sessions = 'only') with
    count, exact cents and mean — closers vs openers is the
    commerce question entry/exit TYPE tables can't answer (they
    count, this one weighs). Position classes compute inside the
    bucket-local sessionize in ONE pass (position = index within
    the session run); only 4 class partials per bucket shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = us - np.roll(us, 1)
        new_sess = ~(same & (gap < 1_800_000_000))
        sess_id = np.cumsum(new_sess)
        # position within session run
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(g)]
        sz = np.repeat(ends - starts, ends - starts)
        rn = np.arange(len(g)) - np.repeat(starts, ends - starts) + 1
        pos = np.select(
            [sz == 1, rn == 1, rn == sz],
            ["only", "first", "last"], default="middle")
        _ = sess_id
        part = pd.DataFrame({"pos": pos, "n": 1, "cents": cents})
        return part.groupby("pos", as_index=False).sum()

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: classify(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["pos"], {"n": ("n", "sum"), "cents": ("cents", "sum")}) \
        .to_pandas()
    r6 = textstats.round_half_away
    out["mean_cents"] = r6(out["cents"].to_numpy(np.float64)
                           / out["n"].to_numpy(np.float64), 6)
    return out.astype({"n": np.int64, "cents": np.int64}) \
        .sort_values("pos", ignore_index=True)


@register("benford_second_digit_orders", sql="""
WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 2, 1)
                       AS BIGINT) AS digit
           FROM orders
           WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 10),
h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS o FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM h),
e AS (SELECT h.digit, h.o,
             (SELECT SUM(LOG(1.0 + 1.0 / (10 * k.k + h.digit)))
              FROM (SELECT UNNEST(generate_series(1, 9)) AS k) k)
                 * (SELECT n FROM t) AS ex
      FROM h)
SELECT CAST(digit AS BIGINT) AS digit, o,
       ROUND(ex, 6) AS expected,
       ROUND(SUM((o - ex) * (o - ex) / ex) OVER (), 6) AS chi2
FROM e ORDER BY 1""")
def benford_second_digit_orders(sf_dir: str) -> pd.DataFrame:
    """Benford SECOND-digit audit on order totals — the forensic
    follow-up to the first-digit law (fabricated amounts often pass
    first-digit but fail second; P(d) = Σₖ log₁₀(1 + 1/(10k+d))).
    Digits come from the exact integer-cents decimal string on both
    engines (no float log10 near a power of ten); expected counts
    and χ² are shared float expressions over the 10-bin histogram."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        c = c[c >= 10]
        digit = np.array([int(str(int(x))[1]) for x in c], np.int64)
        return pd.DataFrame({"digit": digit})

    h = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["digit"], {"o": ("digit", "size")}).to_pandas() \
        .sort_values("digit", ignore_index=True)
    n = int(h["o"].sum())
    r6 = textstats.round_half_away
    expect = {d: float(sum(np.log10(1.0 + 1.0 / (10 * k + d))
                           for k in range(1, 10))) * n
              for d in range(10)}
    h["expected"] = r6(np.array([expect[int(d)]
                                 for d in h["digit"]]), 6)
    chi2 = float(sum((int(o) - expect[int(d)]) ** 2 / expect[int(d)]
                     for d, o in zip(h["digit"], h["o"])))
    h["chi2"] = float(r6(chi2, 6))
    return h.astype({"digit": np.int64, "o": np.int64})


@register("event_value_top1pct_share", sql="""
WITH h AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
cum AS (SELECT c, cnt,
               CAST(SUM(cnt) OVER (ORDER BY c DESC) AS BIGINT)
                   AS cm_top,
               CAST(SUM(CAST(cnt AS HUGEINT) * c)
                    OVER (ORDER BY c DESC) AS HUGEINT) AS s_top
        FROM h),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CAST(cnt AS HUGEINT) * c) AS HUGEINT) AS s
      FROM h),
k AS (SELECT CAST(n // 100 AS BIGINT) AS k FROM t),
cutbin AS (SELECT MAX(c) AS cut FROM cum, k WHERE cm_top >= k.k),
parts AS (SELECT (SELECT COALESCE(SUM(CAST(cnt AS HUGEINT) * c), 0)
                  FROM h, cutbin WHERE c > cut) AS above,
                 (SELECT cm_top - cnt FROM cum, cutbin
                  WHERE c = cut) AS cnt_above)
SELECT (SELECT k FROM k) AS k_events,
       CASE WHEN (SELECT k FROM k) = 0 THEN 0.0
            ELSE ROUND(CAST(above + ((SELECT k FROM k) - cnt_above)
                            * (SELECT cut FROM cutbin) AS DOUBLE)
                       / CAST((SELECT s FROM t) AS DOUBLE), 6)
       END AS top1pct_share
FROM parts""")
def event_value_top1pct_share(sf_dir: str) -> pd.DataFrame:
    """Event-grain value concentration: the share of ALL value held
    by the top 1% of events (k = n//100 largest; ties at the cut
    value fill the remaining slots at exactly the cut price — pure
    integer partial-bin arithmetic, the same rank-clipping trick as
    the trimmed mean but from the top). The user-level Pareto table
    says whales exist; this says whether single TRANSACTIONS carry
    the book. One histogram reduce; 128-bit sums; one division."""
    h = reduce_sink(
        _events(sf_dir, ["value"]).map_batches(
            lambda df: pd.DataFrame({
                "c": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values("c", ascending=False, ignore_index=True)
    cnt = [int(x) for x in h["cnt"]]
    c = [int(x) for x in h["c"]]
    n = sum(cnt)
    s = sum(a * b for a, b in zip(cnt, c))
    k = n // 100
    r6 = textstats.round_half_away
    if k == 0:
        return pd.DataFrame({"k_events": np.array([0], np.int64),
                             "top1pct_share": [0.0]})
    cm = 0
    above = 0
    for a, x in zip(cnt, c):
        if cm + a >= k:
            cut = x
            cnt_above = cm
            break
        cm += a
        above += a * x
    share = r6(float(above + (k - cnt_above) * cut) / float(s), 6)
    return pd.DataFrame({"k_events": np.array([k], np.int64),
                         "top1pct_share": [float(share)]})


@register("conservation_audit", sql="""
WITH base AS (SELECT event_type,
                     epoch_us(ts) // 86400000000 AS d, user_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS c
              FROM events),
by_type AS (SELECT CAST(SUM(tc) AS BIGINT) AS t FROM
            (SELECT SUM(c) AS tc FROM base GROUP BY event_type)),
by_day AS (SELECT CAST(SUM(tc) AS BIGINT) AS t FROM
           (SELECT SUM(c) AS tc FROM base GROUP BY d)),
by_user AS (SELECT CAST(SUM(tc) AS BIGINT) AS t FROM
            (SELECT SUM(c) AS tc FROM base GROUP BY user_id))
SELECT (SELECT t FROM by_type) AS total_by_type,
       (SELECT t FROM by_day) AS total_by_day,
       (SELECT t FROM by_user) AS total_by_user,
       CAST(CASE WHEN (SELECT t FROM by_type)
                      = (SELECT t FROM by_day)
                  AND (SELECT t FROM by_day)
                      = (SELECT t FROM by_user)
                 THEN 1 ELSE 0 END AS BIGINT) AS conserved""")
def conservation_audit(sf_dir: str) -> pd.DataFrame:
    """Aggregation-conservation self-audit: the grand total of cents
    recomputed through THREE independent rollup paths (by type, by
    day, by user) with a machine-checkable agreement flag — the
    invariant every report page implicitly assumes and a lossy
    filter or double-counting join silently breaks. Each path is
    its own keyed reduce re-aggregated to a scalar; exact integers
    make 'equal' meaningful."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "d": (us // 86_400_000_000).astype(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    base = _events(sf_dir, ["ts", "event_type", "user_id", "value"]) \
        .map_batches(prep, batch_format="pandas").materialize()

    def total_via(key):
        agg = reduce_sink(base, [key], {"tc": ("c", "sum")})
        sc = agg.map_batches(
            lambda df: pd.DataFrame({"t": [np.int64(df["tc"].sum())]}),
            batch_format="pandas").to_pandas()
        return int(sc["t"].sum())

    t_type = total_via("event_type")
    t_day = total_via("d")
    t_user = total_via("user_id")
    return pd.DataFrame({
        "total_by_type": np.array([t_type], np.int64),
        "total_by_day": np.array([t_day], np.int64),
        "total_by_user": np.array([t_user], np.int64),
        "conserved": np.array(
            [1 if t_type == t_day == t_user else 0], np.int64)})


@register("order_status_by_year", sql="""
WITH b AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                  o_orderstatus AS st FROM orders),
c AS (SELECT yr, st, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
t AS (SELECT yr, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.yr, c.st AS status, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.tot, 6) AS share
FROM c JOIN t USING (yr) ORDER BY 1, 2""")
def order_status_by_year(sf_dir: str) -> pd.DataFrame:
    """Order-status mix by year — the fulfillment-state drift table
    ('F'inished share should approach 1 as cohorts age; a year whose
    open share grows is a backlog). One (year, status) reduce;
    shares divide against per-year totals."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["o_orderdate"].to_numpy("datetime64[us]") \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pd.DataFrame({"yr": yr.astype(np.int64),
                             "st": df["o_orderstatus"].astype(str)})

    c = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_orderstatus"])
        .map_batches(prep, batch_format="pandas"),
        ["yr", "st"], {"n": ("st", "size")}).to_pandas()
    tot = c.groupby("yr")["n"].transform("sum")
    r6 = textstats.round_half_away
    out = pd.DataFrame({
        "yr": c["yr"].astype(np.int64),
        "status": c["st"],
        "n": c["n"].astype(np.int64),
        "share": r6(c["n"].to_numpy(np.float64)
                    / tot.to_numpy(np.float64), 6)})
    return out.sort_values(["yr", "status"], ignore_index=True)


@register("active_days_per_user_hist", sql="""
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d FROM events),
c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
      FROM ud GROUP BY 1)
SELECT k AS active_days, CAST(COUNT(*) AS BIGINT) AS users
FROM c GROUP BY 1 ORDER BY 1""")
def active_days_per_user_hist(sf_dir: str) -> pd.DataFrame:
    """Engagement depth: the distribution of distinct active days
    per user — the habit histogram (a spike at 1 is drive-by
    traffic; mass in the tail is the habit cohort retention dollars
    chase). Two-phase distinct (user, day) then per-user counts
    then a count histogram; integers end to end."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "d": (us // 86_400_000_000).astype(np.int64)}) \
            .drop_duplicates()

    ud = reduce_sink(ds.map_batches(pairs, batch_format="pyarrow"),
                     ["user_id", "d"], {"n": ("d", "size")})
    c = reduce_sink(ud, ["user_id"], {"k": ("n", "size")})
    out = reduce_sink(c, ["k"], {"users": ("k", "size")}) \
        .to_pandas().rename(columns={"k": "active_days"})
    return out.astype({"active_days": np.int64, "users": np.int64}) \
        .sort_values("active_days", ignore_index=True)


@register("order_value_by_basket_width", sql="""
WITH w AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
           FROM lineitem GROUP BY 1),
j AS (SELECT w.n_lines,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM w JOIN orders o ON w.l_orderkey = o.o_orderkey)
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS orders,
       CAST(SUM(cents) AS BIGINT) AS cents,
       ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 6)
           AS mean_cents
FROM j GROUP BY 1 ORDER BY 1""")
def order_value_by_basket_width(sf_dir: str) -> pd.DataFrame:
    """Order value as a function of basket width: does a 7-line
    order cost 7× a 1-line order or do wide baskets skew cheap? —
    the width-value curve pricing and free-shipping thresholds read.
    The per-order line count joins order headers through auto_join's
    hash machinery (both facts co-partition on orderkey); integer
    cents and one shared division per width."""
    from webalizer_ray.stages.join import auto_join

    w = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey"]),
        ["l_orderkey"], {"n_lines": ("l_orderkey", "size")})
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "cents": np.rint(df["o_totalprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)}),
        batch_format="pandas")
    j = auto_join(w, orders, on="l_orderkey",
                  right_on="o_orderkey")
    out = reduce_sink(
        j.map_batches(
            lambda df: pd.DataFrame({
                "n_lines": df["n_lines"].to_numpy(np.int64),
                "orders": np.ones(len(df), np.int64),
                "cents": df["cents"].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["n_lines"], {"orders": ("orders", "sum"),
                      "cents": ("cents", "sum")}).to_pandas()
    r6 = textstats.round_half_away
    out["mean_cents"] = r6(out["cents"].to_numpy(np.float64)
                           / out["orders"].to_numpy(np.float64), 6)
    return out.astype({"n_lines": np.int64, "orders": np.int64,
                       "cents": np.int64}) \
        .sort_values("n_lines", ignore_index=True)


@register("first_purchase_session_ordinal_hist", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
fp AS (SELECT user_id, CAST(MIN(sid) AS BIGINT) AS first_sid
       FROM sid WHERE event_type = 'purchase' GROUP BY user_id)
SELECT CAST(LEAST(first_sid, 10) AS BIGINT) AS ordinal,
       CAST(COUNT(*) AS BIGINT) AS users
FROM fp GROUP BY 1 ORDER BY 1""")
def first_purchase_session_ordinal_hist(sf_dir: str) -> pd.DataFrame:
    """Time-to-convert in SESSIONS: the session ordinal of each
    user's FIRST purchase (capped at 10) — 'most buyers convert in
    session 1' vs 'conversion needs five visits' sets the whole
    nurture strategy; the per-session rate table can't distinguish
    a new converter from a repeat one. MIN(sid) over purchase rows
    is a keyed reduce (split-session safe); only the ≤10-bin
    histogram shuffles."""
    sess = _sessionized_events(sf_dir)

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "sid": df["sid"].to_numpy(np.int64)[keep]})

    fp = reduce_sink(sess.map_batches(rows, batch_format="pandas"),
                     ["user_id"], {"first_sid": ("sid", "min")})

    def band(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ordinal": np.minimum(df["first_sid"]
                                  .to_numpy(np.int64), 10),
            "users": np.ones(len(df), np.int64)})

    out = reduce_sink(fp.map_batches(band, batch_format="pandas"),
                      ["ordinal"], {"users": ("users", "sum")}) \
        .to_pandas()
    return out.astype({"ordinal": np.int64, "users": np.int64}) \
        .sort_values("ordinal", ignore_index=True)


@register("post_purchase_reengagement_quantiles", sql="""
WITH p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
g AS (SELECT (SELECT MIN(epoch_us(v.ts)) - epoch_us(p.ts) FROM v
              WHERE v.user_id = p.user_id AND v.ts > p.ts) AS lag_us
      FROM p),
s AS (SELECT lag_us // 1000000 AS lag_s FROM g
      WHERE lag_us IS NOT NULL),
h AS (SELECT lag_s, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM s GROUP BY 1),
cum AS (SELECT lag_s, cnt,
               CAST(SUM(cnt) OVER (ORDER BY lag_s) AS BIGINT) AS cm,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM cum) AS n_pairs,
       (SELECT CAST(MIN(lag_s) AS BIGINT) FROM cum
        WHERE 2 * cm >= n) AS p50_s,
       (SELECT CAST(MIN(lag_s) AS BIGINT) FROM cum
        WHERE 10 * cm >= 9 * n) AS p90_s""")
def post_purchase_reengagement_quantiles(sf_dir: str) -> pd.DataFrame:
    """Post-purchase re-engagement: exact quantiles of the time from
    each purchase to the same user's NEXT view — the forward-looking
    mirror of last-view attribution (does buying end the session or
    start browsing?). Both streams co-locate in the user bucket;
    one searchsorted on the gap-shifted axis finds each purchase's
    successor view; strictly-later convention (ties excluded) is
    shared; purchases with no later view drop; the second-quantized
    lag histogram closes the quantiles."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    big = np.int64(1 << 62)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])].copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def lags(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        isv = (g["event_type"] == "view").to_numpy()
        order = np.lexsort((us, uid))
        us, uid, isv = us[order], uid[order], isv[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        run_min, run_max = us[starts], us[ends - 1]
        span = run_max - run_min
        gap_w = (int(span.max()) if len(span) else 0) + 2
        base = np.concatenate(([0], np.cumsum(span[:-1] + gap_w)))
        adj = us - run_min[run_of] + base[run_of]
        v_adj, v_uid = adj[isv], uid[isv]
        p_adj, p_uid = adj[~isv], uid[~isv]
        nmax = len(v_adj)
        if nmax == 0 or len(p_adj) == 0:
            return pd.DataFrame(
                {"lag_s": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)})
        pos = np.searchsorted(v_adj, p_adj, side="right")
        nxt = np.clip(pos, 0, nmax - 1)
        lag = np.where((pos < nmax) & (v_uid[nxt] == p_uid),
                       v_adj[nxt] - p_adj, big)
        lag = lag[lag < big] // 1_000_000
        u, c = np.unique(lag, return_counts=True)
        return pd.DataFrame({"lag_s": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    h = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: lags(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["lag_s"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("lag_s", ignore_index=True)
    lag_s = h["lag_s"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p50 = int(lag_s[np.searchsorted(2 * cm, n, side="left")])
    p90 = int(lag_s[np.searchsorted(10 * cm, 9 * n, side="left")])
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "p50_s": np.array([p50], np.int64),
        "p90_s": np.array([p90], np.int64)})


_HAAR_LEVELS = 5          # 32-day dyadic window → 5 detail scales


def _haar_level_sql(prev: str, name: str) -> str:
    return (f"{name} AS (SELECT j // 2 AS j, "
            f"SUM(CASE WHEN j % 2 = 0 THEN v ELSE -v END) AS dd, "
            f"SUM(v) AS v FROM {prev} GROUP BY 1)")


_HAAR_SQL = ("""
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
x AS (SELECT g.i AS j, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS v
      FROM generate_series(0, 31) g(i)
      LEFT JOIN (SELECT day - (SELECT MIN(day) FROM d) AS i, cnt
                 FROM d) o ON o.i = g.i),
""" + ",\n".join(_haar_level_sql(p, n) for p, n in
                 zip(["x", "l1", "l2", "l3", "l4"],
                     ["l1", "l2", "l3", "l4", "l5"])) + "\n"
             + "\nUNION ALL ".join(
                 f"SELECT CAST({k} AS BIGINT) AS level, "
                 f"CAST(SUM(dd * dd) AS BIGINT) AS energy, "
                 f"CAST(COUNT(*) AS BIGINT) AS n_coeffs FROM l{k}"
                 for k in range(1, _HAAR_LEVELS + 1))
             + "\nORDER BY level")


@register("haar_daily_energy", sql=_HAAR_SQL)
def haar_daily_energy(sf_dir: str) -> pd.DataFrame:
    """Haar wavelet energy spectrum of the daily event-count series —
    at WHICH time scale does the variance live? Level 1 (day-pair
    details) is daily noise, level 3 (~week) is weekly structure,
    level 5 is trend; a level-3 spike means day-of-week seasonality,
    a level-5 spike means drift (the multi-scale sibling of
    daily_acf's single-lag view). One per-day reduce is the only
    distributed work (O(days) rows shuffle); the driver folds the
    32-day dyadic window (missing days are true zeros, days ≥ 32
    from the first fall outside the window — documented) with the
    UNNORMALIZED Haar transform d=a−b, s=a+b so every coefficient
    and every energy is an exact INTEGER on both engines."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    cnt = daily["cnt"].to_numpy(np.int64)
    x = np.zeros(32, dtype=np.int64)
    if len(day):                    # empty input → all-zero window
        idx = day - day.min()
        keep = idx < 32
        x[idx[keep]] = cnt[keep]
    rows = []
    arr = x
    for lvl in range(1, _HAAR_LEVELS + 1):
        dd = arr[0::2] - arr[1::2]
        arr = arr[0::2] + arr[1::2]
        rows.append((lvl, int((dd.astype(object) ** 2).sum()), len(dd)))
    return pd.DataFrame(rows, columns=["level", "energy", "n_coeffs"]) \
        .astype({"level": np.int64, "energy": np.int64,
                 "n_coeffs": np.int64})


@register("twoway_anova_value", sql="""
WITH v AS (SELECT event_type AS a,
                  CAST(dayofweek(ts) AS BIGINT) AS b,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS c
           FROM events),
cell AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(c) AS HUGEINT) AS s,
                CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
         FROM v GROUP BY a, b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS nc,
               CAST(SUM(s) AS HUGEINT) AS st,
               CAST(SUM(q) AS HUGEINT) AS qt,
               SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sc
        FROM cell),
ma AS (SELECT CAST(COUNT(*) AS BIGINT) AS ka,
              SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sa
       FROM (SELECT a, SUM(n) AS n, SUM(s) AS s FROM cell GROUP BY a)),
mb AS (SELECT CAST(COUNT(*) AS BIGINT) AS kb,
              SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
       FROM (SELECT b, SUM(n) AS n, SUM(s) AS s FROM cell GROUP BY b)),
f AS (SELECT nn, ka, kb, nc,
             CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nn AS cm,
             CAST(qt AS DOUBLE) - sc AS ss_within,
             CAST(qt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nn AS ss_tot,
             sa, sb, sc
      FROM tot, ma, mb)
SELECT nn AS n, ka AS k_type, kb AS k_dow,
       ROUND((sa - cm) / ss_tot, 6) AS eta2_type,
       ROUND((sb - cm) / ss_tot, 6) AS eta2_dow,
       ROUND((sc - sa - sb + cm) / ss_tot, 6) AS eta2_interaction,
       ROUND(((sc - sa - sb + cm) / ((ka - 1) * (kb - 1)))
             / (ss_within / (nn - nc)), 6) AS f_interaction
FROM f""")
def twoway_anova_value(sf_dir: str) -> pd.DataFrame:
    """Two-way ANOVA of event value over TYPE × DAY-OF-WEEK with the
    interaction term — does the weekend effect differ BY event type
    (the question neither one-way ANOVA can pose)? Sequential
    (Type-I, mains-then-interaction) convention on the cell-means
    identity: SS_AB = SS_cells − SS_A − SS_B, SS_within = SS_total −
    SS_cells; in an unbalanced design this is the stated convention,
    not the unique answer. ONE (type, dow) cell-moment reduce (≤
    |types|×7 rows, Σc² in two int64 words) is all that shuffles.
    Outputs are the SCALE-FREE η² fractions and F (O(1) values where
    a 6dp round absorbs float-order noise) — raw SS in cents² sit at
    ~1e11 where one ULP already exceeds any fixed tolerance."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]")
        # DuckDB dayofweek: 0=Sunday; 1970-01-01 was a Thursday (=4)
        dow = (ts.astype("datetime64[D]").astype(np.int64) + 4) % 7
        return pd.DataFrame({
            "a": df["event_type"].astype(str),
            "b": dow.astype(np.int64),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    base = _events(sf_dir, ["event_type", "ts", "value"]) \
        .map_batches(prep, batch_format="pandas")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (a, b), grp in df.groupby(["a", "b"], sort=False):
            c = grp["c"].to_numpy(np.int64).astype(object)
            hi, lo = divmod(int((c * c).sum()), 1 << 62)
            out.append((a, b, len(c), int(c.sum()), hi, lo))
        return pd.DataFrame(out, columns=["a", "b", "n", "s",
                                          "q_hi", "q_lo"])

    cell = reduce_sink(
        base.map_batches(moments, batch_format="pandas"),
        ["a", "b"], {"n": ("n", "sum"), "s": ("s", "sum"),
                     "q_hi": ("q_hi", "sum"), "q_lo": ("q_lo", "sum")}) \
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    n_c = cell["n"].to_numpy(np.int64)
    s_c = np.array([int(v) for v in cell["s"]], dtype=object)
    q_c = [int(h) * (1 << 62) + int(l)
           for h, l in zip(cell["q_hi"], cell["q_lo"])]
    nn = int(n_c.sum())
    nc = len(cell)
    st = int(s_c.sum())
    qt = sum(q_c)
    sc = float(sum(float(int(s)) * int(s) / int(n)
                   for s, n in zip(s_c, n_c)))
    ga = cell.assign(s=[int(v) for v in s_c]) \
        .groupby("a", sort=True).agg(n=("n", "sum"), s=("s", "sum"))
    gb = cell.assign(s=[int(v) for v in s_c]) \
        .groupby("b", sort=True).agg(n=("n", "sum"), s=("s", "sum"))
    sa = float(sum(float(int(s)) * int(s) / int(n)
                   for s, n in zip(ga["s"], ga["n"])))
    sb = float(sum(float(int(s)) * int(s) / int(n)
                   for s, n in zip(gb["s"], gb["n"])))
    ka, kb = len(ga), len(gb)
    cm = float(st) * st / nn
    ss_within = float(qt) - sc
    ss_tot = float(qt) - cm
    ss_ab = sc - sa - sb + cm
    r = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([nn], np.int64),
        "k_type": np.array([ka], np.int64),
        "k_dow": np.array([kb], np.int64),
        "eta2_type": [float(r(np.array([(sa - cm) / ss_tot]), 6)[0])],
        "eta2_dow": [float(r(np.array([(sb - cm) / ss_tot]), 6)[0])],
        "eta2_interaction": [float(r(np.array([ss_ab / ss_tot]),
                                     6)[0])],
        "f_interaction": [float(r(np.array(
            [(ss_ab / ((ka - 1) * (kb - 1)))
             / (ss_within / (nn - nc))]), 6)[0])]})


@register("twonn_intrinsic_dim", sql="""
WITH d AS (
  SELECT a.vec_id AS node, b.vec_id AS nb,
         list_distance(CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])) AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, dist,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY dist, nb) AS rk
      FROM d),
t AS (SELECT node, MAX(CASE WHEN rk = 1 THEN dist END) AS r1,
             MAX(CASE WHEN rk = 2 THEN dist END) AS r2
      FROM r WHERE rk <= 2 GROUP BY node),
k AS (SELECT ROUND(LN(r2 / r1), 9) AS lr FROM t WHERE r1 > 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(COUNT(*) / SUM(lr), 4) AS intrinsic_dim
FROM k""")
def twonn_intrinsic_dim(sf_dir: str) -> pd.DataFrame:
    """Two-NN intrinsic dimension of the embedding manifold (Facco
    et al. 2017): ID = n / Σ ln(r2/r1) over each point's two nearest
    EUCLIDEAN neighbors — tells whether 32-dim vectors actually live
    on a 4-dim manifold (then aggressive PQ/LSH compression is safe)
    or genuinely fill the space. The full (small) matrix broadcasts
    once via ray.put; each batch computes chunked diff-based
    distances (no |a|²+|b|²−2ab cancellation exactly where r1→0
    matters) and emits ONE (r1, r2) row per point — the only thing
    that ever shuffles. Exact-duplicate points (r1 = 0) are excluded
    on both engines; per-point log ratios round at 9dp before the
    sum so addition order cannot flip the 4dp headline."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)
    ref = ray.put((ids, mat))

    def two_nn(df: pd.DataFrame) -> pd.DataFrame:
        rids, rmat = ray.get(ref)
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        xid = df["vec_id"].to_numpy(np.int64)
        best = np.full((len(x), 2), np.inf)
        for lo in range(0, len(rmat), 1024):
            chunk = rmat[lo:lo + 1024]
            cid = rids[lo:lo + 1024]
            d = np.sqrt(((x[:, None, :] - chunk[None, :, :]) ** 2)
                        .sum(axis=2))
            d[xid[:, None] == cid[None, :]] = np.inf   # self by id
            top = np.sort(np.concatenate(
                [best, np.partition(d, min(1, d.shape[1] - 1),
                                    axis=1)[:, :2]], axis=1),
                axis=1)[:, :2]
            best = top
        return pd.DataFrame({"r1": best[:, 0], "r2": best[:, 1]})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = ds.map_batches(two_nn, batch_format="pandas").to_pandas()
    keep = pairs["r1"].to_numpy() > 0.0
    lr = textstats.round_half_away(
        np.log(pairs["r2"].to_numpy()[keep]
               / pairs["r1"].to_numpy()[keep]), 9)
    n = int(keep.sum())
    dim = float(textstats.round_half_away(
        np.array([n / float(lr.sum())]), 4)[0])
    return pd.DataFrame({"n_points": np.array([n], np.int64),
                         "intrinsic_dim": [dim]})


@register("knn_hubness_hist", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
e AS (SELECT neighbor FROM r WHERE rank <= 2),
deg AS (SELECT v.vec_id, COUNT(e.neighbor) AS d
        FROM embeddings v LEFT JOIN e ON e.neighbor = v.vec_id
        GROUP BY v.vec_id)
SELECT CAST(d AS BIGINT) AS in_degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1 ORDER BY 1""")
def knn_hubness_hist(sf_dir: str) -> pd.DataFrame:
    """Hubness of the exact cosine 2-NN graph: the k-occurrence
    (in-degree) distribution (Radovanović et al. 2010) — a long right
    tail means a few 'hub' vectors appear in everyone's neighbor
    list, the classic high-dim pathology that silently degrades kNN
    dedup/classification; anti-hubs (in-degree 0) are never anyone's
    neighbor. Edges come from the same broadcast-matrix local-top-k
    combiner as knn_graph; the histogram folds the ≤ 2N-row edge
    list, with zero-degree nodes recovered from the id universe —
    every output value an exact integer."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    vecs = np.stack(tbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, vecs, k=3)     # k+1: self in there
    out["node"] = ids[out["query_id"].to_numpy()]
    out = out[out["node"] != out["vec_id"]].copy()
    out = out.sort_values(["node", "rank"], ignore_index=True)
    out["rank"] = (out.groupby("node", sort=False).cumcount() + 1) \
        .astype(np.int64)
    edges = out[out["rank"] <= 2]
    deg = edges["vec_id"].value_counts()
    n_zero = len(ids) - len(deg)
    hist = deg.value_counts().sort_index()
    in_deg = hist.index.to_numpy(np.int64)
    n_nodes = hist.to_numpy(np.int64)
    if n_zero:
        in_deg = np.r_[np.int64(0), in_deg]
        n_nodes = np.r_[np.int64(n_zero), n_nodes]
    return pd.DataFrame({"in_degree": in_deg.astype(np.int64),
                         "n_nodes": n_nodes.astype(np.int64)})


@register("session_type_trigrams", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
w AS (SELECT event_type AS t1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id, sid
                                       ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id, sid
                                       ORDER BY ts, event_id) AS t3
      FROM sid),
g AS (SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w WHERE t3 IS NOT NULL GROUP BY 1),
r AS (SELECT trigram, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, trigram) AS rk
      FROM g)
SELECT trigram, n FROM r WHERE rk <= 15 ORDER BY n DESC, trigram""")
def session_type_trigrams(sf_dir: str) -> pd.DataFrame:
    """Sequential motif mining: the top-15 SLIDING type trigrams
    within sessions (every consecutive a>b>c, not just the session
    head that top_session_paths reports) — 'view>view>purchase' vs
    'view>error>view' is the difference between a working funnel and
    a rage loop. Sessionize and slide in ONE bucket-local pass (a
    map over the sessionize output could see a session split across
    blocks and drop its seam trigrams); only (trigram, n) partials —
    cardinality ≤ |types|³ — shuffle; top-15 resolves on the driver
    with (n desc, trigram asc) ties pinned on both engines."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def trigrams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        n = len(g)
        if n < 3:
            return pd.DataFrame({"trigram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        cont = np.zeros(n, bool)      # row continues previous session
        cont[1:] = (uid[1:] == uid[:-1]) \
            & ((us[1:] - us[:-1]) < 1_800_000_000)
        ok = cont[1:-1] & cont[2:]    # start i: i+1 and i+2 continue
        i = np.flatnonzero(ok)
        tri = pd.Series(et[i]).str.cat(
            [pd.Series(et[i + 1]), pd.Series(et[i + 2])], sep=">")
        c = tri.value_counts()
        return pd.DataFrame({"trigram": c.index.to_numpy(object),
                             "n": c.to_numpy(np.int64)})

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(trigrams,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["trigram"], {"n": ("n", "sum")}) \
        .to_pandas()
    out = out.sort_values(["n", "trigram"], ascending=[False, True],
                          ignore_index=True).head(15)
    out["n"] = out["n"].astype(np.int64)
    return out


@register("knn_degree_assortativity", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
e AS (SELECT node, neighbor FROM r WHERE rank <= 2),
ind AS (SELECT v.vec_id AS id,
               CAST(2 + COUNT(e2.neighbor) AS BIGINT) AS deg
        FROM embeddings v LEFT JOIN e e2 ON e2.neighbor = v.vec_id
        GROUP BY v.vec_id),
p AS (SELECT du.deg AS x, dw.deg AS y
      FROM e JOIN ind du ON du.id = e.node
             JOIN ind dw ON dw.id = e.neighbor),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p)
SELECT n AS n_edges,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0
            THEN 0.0
            ELSE ROUND((n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * 1.0
                              * (n * syy - sy * sy)), 6)
       END AS assortativity
FROM m""")
def knn_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the exact cosine 2-NN graph (Newman
    2002): Pearson correlation of endpoint TOTAL degrees (out-degree
    is 2 for every node, so deg = 2 + in-degree) over the DIRECTED
    edge list — negative means hubs point at loners (the typical kNN
    disassortativity that makes hub contamination spread), positive
    means a dense core. Same broadcast local-top-k edges as
    knn_graph; every moment is an INTEGER over the ≤ 2N edge rows,
    the closed form evaluates in oracle order, zero variance pins
    0."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    vecs = np.stack(tbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, vecs, k=3)
    out["node"] = ids[out["query_id"].to_numpy()]
    out = out[out["node"] != out["vec_id"]].copy()
    out = out.sort_values(["node", "rank"], ignore_index=True)
    out["rank"] = (out.groupby("node", sort=False).cumcount() + 1) \
        .astype(np.int64)
    edges = out[out["rank"] <= 2]
    indeg = edges["vec_id"].value_counts()
    deg = pd.Series(2, index=pd.Index(ids, name="id"), dtype=np.int64) \
        .add(indeg.reindex(ids).fillna(0).astype(np.int64).to_numpy())
    x = deg.loc[edges["node"].to_numpy()].to_numpy(np.int64)
    y = deg.loc[edges["vec_id"].to_numpy()].to_numpy(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    a = 0.0 if den == 0 else float(textstats.round_half_away(
        np.array([(n * sxy - sx * sy) / np.sqrt(den * 1.0)]), 6)[0])
    return pd.DataFrame({"n_edges": np.array([n], np.int64),
                         "assortativity": [a]})


@register("readability_by_source", sql=r"""
WITH d AS (SELECT source,
                  len(regexp_extract_all(text, '\S+')) AS w,
                  GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)
                      AS s,
                  len(regexp_extract_all(lower(text), '[aeiou]+')) AS y
           FROM documents),
f AS (SELECT source,
             ROUND(206.835 - 1.015 * (w * 1.0 / s)
                   - 84.6 * (y * 1.0 / w), 6) AS fl
      FROM d WHERE w > 0)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(SUM(fl) / COUNT(*), 4) AS mean_flesch
FROM f GROUP BY source ORDER BY source""")
def readability_by_source(sf_dir: str) -> pd.DataFrame:
    """Flesch reading-ease profile per source (the readability prior
    a curation pipeline reads before mixing corpora — legalese
    scores ~30, chat ~80): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words) with the standard cheap proxies (words =
    \\S+ runs, sentences = [.!?] count floored at 1, syllables =
    maximal vowel runs — identical RE2 counts on both engines). One
    vectorized Arrow pass per batch (three count_substring_regex
    kernels, zero Python per row); per-doc scores round at 6dp
    before the per-source partial sums so addition order cannot move
    the 4dp mean."""
    def feats(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        w = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        s = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(text, r"[.!?]"),
                    pa.int64()), pa.scalar(1, pa.int64()))
        y = pc.cast(pc.count_substring_regex(
            pc.utf8_lower(text), r"[aeiou]+"), pa.int64())
        wn = w.to_numpy(zero_copy_only=False).astype(np.float64)
        sn = s.to_numpy(zero_copy_only=False).astype(np.float64)
        yn = y.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = wn > 0
        fl = textstats.round_half_away(
            206.835 - 1.015 * (wn[keep] / sn[keep])
            - 84.6 * (yn[keep] / wn[keep]), 6)
        src = batch["source"].to_pandas().to_numpy(object)[keep]
        return pa.table({"source": pa.array(src, pa.string()),
                         "fl": pa.array(fl, pa.float64())})

    out = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(feats, batch_format="pyarrow"),
        ["source"], {"n_docs": ("fl", "size"), "sfl": ("fl", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    mean = textstats.round_half_away(
        out["sfl"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 4)
    return pd.DataFrame({"source": out["source"],
                         "n_docs": out["n_docs"].astype(np.int64),
                         "mean_flesch": mean})


@register("discount_cap_whatif", sql="""
WITH l AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS dpct,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
b AS (SELECT dpct, CAST(SUM(cents) AS BIGINT) AS cents
      FROM l GROUP BY dpct),
a AS (SELECT CAST(SUM(cents * (100 - dpct)) AS BIGINT) AS actual_dm
      FROM b)
SELECT g.cap AS cap_pct,
       CAST(SUM(b.cents * (100 - LEAST(b.dpct, g.cap))) AS BIGINT)
           AS revenue_dm,
       CAST(SUM(b.cents * (100 - LEAST(b.dpct, g.cap)))
            - MAX(a.actual_dm) AS BIGINT) AS uplift_dm
FROM generate_series(0, 10) g(cap), b, a
GROUP BY g.cap ORDER BY g.cap""")
def discount_cap_whatif(sf_dir: str) -> pd.DataFrame:
    """What-if pricing curve: total revenue if line discounts were
    CAPPED at d% for every d in 0..10 — the uplift column is what
    finance reads to price a discount-policy change (cap at the
    observed max = uplift 0 by construction). Revenue in integer
    deci-milli units (cents × percent) so every figure is EXACT: the
    heavy fact table folds to an 11-row (discount-band, cents)
    aggregate in one reduce, and the 11×11 cap fold happens on that
    tiny table — same numbers on any execution order."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dpct": np.rint(df["l_discount"].to_numpy(np.float64)
                            * 100).astype(np.int64),
            "cents": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})

    b = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_discount", "l_extendedprice"])
        .map_batches(prep, batch_format="pandas"),
        ["dpct"], {"cents": ("cents", "sum")}).to_pandas()
    dpct = b["dpct"].to_numpy(np.int64)
    cents = np.array([int(v) for v in b["cents"]], dtype=object)
    actual = int((cents * (100 - dpct)).sum())
    caps = np.arange(11, dtype=np.int64)
    rev = np.array([int((cents * (100 - np.minimum(dpct, c))).sum())
                    for c in caps], dtype=np.int64)
    return pd.DataFrame({"cap_pct": caps,
                         "revenue_dm": rev,
                         "uplift_dm": (rev - actual).astype(np.int64)})


@register("user_median_thinktime_hist", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
g AS (SELECT user_id,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                  PARTITION BY user_id, sid ORDER BY ts, event_id)))
             // 1000000 AS gap_s
      FROM sid),
gg AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
r AS (SELECT user_id, gap_s,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY gap_s) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS cnt
      FROM gg),
m AS (SELECT gap_s AS med FROM r WHERE rn = (cnt + 1) // 2)
SELECT CAST(LEAST(med // 60, 30) AS BIGINT) AS minute_band,
       CAST(COUNT(*) AS BIGINT) AS users
FROM m GROUP BY 1 ORDER BY 1""")
def user_median_thinktime_hist(sf_dir: str) -> pd.DataFrame:
    """Per-USER median think time, banded by minute (capped at 30):
    the pooled think-time quantiles hide whether slow gaps come from
    a few slow users or everyone — this is the distribution of each
    user's OWN typical pace (two-level order statistics: a median
    inside every user, then a histogram across users). Sessionize,
    gap extraction AND the per-user lower-median all happen in ONE
    bucket-local pass (a user's rows never span buckets); only the
    ≤31-bin histogram partials shuffle. Lower-median convention
    (rank ⌈n/2⌉) on both engines — never an averaging MEDIAN()."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def medians(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        empty = pd.DataFrame({"minute_band": pd.Series([],
                                                       dtype=np.int64),
                              "users": pd.Series([], dtype=np.int64)})
        if n < 2:
            return empty
        cont = (uid[1:] == uid[:-1]) \
            & ((us[1:] - us[:-1]) < 1_800_000_000)
        gap = (us[1:] - us[:-1])[cont] // 1_000_000
        guid = uid[1:][cont]
        if not len(gap):
            return empty
        order = np.lexsort((gap, guid))
        gap, guid = gap[order], guid[order]
        starts = np.flatnonzero(np.r_[True, guid[1:] != guid[:-1]])
        cnts = np.diff(np.r_[starts, len(guid)])
        med = gap[starts + (cnts - 1) // 2]   # lower median (⌈n/2⌉)
        band = np.minimum(med // 60, 30)
        u, c = np.unique(band, return_counts=True)
        return pd.DataFrame({"minute_band": u.astype(np.int64),
                             "users": c.astype(np.int64)})

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(medians,
                                            batch_format="pandas"))
    return reduce_sink(parts, ["minute_band"],
                       {"users": ("users", "sum")}).to_pandas() \
        .astype({"minute_band": np.int64, "users": np.int64}) \
        .sort_values("minute_band", ignore_index=True)


_PERC_THRESHOLDS = (0.3, 0.4, 0.5)


def _perc_sql_one(t: float, g: str) -> tuple[str, str]:
    ctes = f"""
p{g} AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) >= {t}),
e{g} AS (SELECT id_a AS u, id_b AS v FROM p{g}
         UNION SELECT id_b, id_a FROM p{g}),
w{g}(node, reach) AS (
  SELECT u, u FROM e{g}
  UNION
  SELECT e.u, w.reach FROM e{g} e JOIN w{g} w ON w.node = e.v),
c{g} AS (SELECT node, MIN(reach) AS cid FROM w{g} GROUP BY node)"""
    row = f"""
SELECT {t} AS threshold,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p{g}) AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c{g}) AS n_nodes,
       (SELECT CAST(COUNT(DISTINCT cid) AS BIGINT) FROM c{g})
           AS n_clusters,
       COALESCE((SELECT CAST(MAX(cnt) AS BIGINT) FROM
                 (SELECT COUNT(*) AS cnt FROM c{g} GROUP BY cid)),
                0) AS largest"""
    return ctes, row


_PERC_SQL = ("WITH RECURSIVE "
             + ",".join(_perc_sql_one(t, str(i))[0]
                        for i, t in enumerate(_PERC_THRESHOLDS))
             + "\nUNION ALL".join(_perc_sql_one(t, str(i))[1]
                                  for i, t in enumerate(_PERC_THRESHOLDS))
             + "\nORDER BY threshold")


@register("cosine_percolation_curve", sql=_PERC_SQL)
def cosine_percolation_curve(sf_dir: str) -> pd.DataFrame:
    """Percolation curve of the embedding similarity graph: component
    structure at cosine thresholds 0.3/0.4/0.5 — THE table you read
    before picking a near-dup clustering threshold (too low and one
    giant component swallows the corpus: watch `largest` blow up;
    too high and dups survive: `n_pairs` → 0). Candidate pairs
    generate ONCE at the loosest threshold via hyperplane LSH
    (k=3, L=64 → per-pair miss ≈ 2e-7 at cos 0.3 — deterministic
    full recall on this fixture); each threshold then filters the
    tiny verified pair list and runs union-find, so the quadratic
    work never repeats."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = dedup.cosine_dup_pairs_lsh(
        ds, threshold=min(_PERC_THRESHOLDS), n_planes=3, n_tables=64)
    rows = []
    for t in _PERC_THRESHOLDS:
        sub = pairs[pairs["cosine"] >= t]
        comp = dedup.connected_components(sub)
        largest = int(comp["cluster_id"].value_counts().max()) \
            if len(comp) else 0
        rows.append((float(t), len(sub), len(comp),
                     comp["cluster_id"].nunique() if len(comp) else 0,
                     largest))
    return pd.DataFrame(rows, columns=["threshold", "n_pairs",
                                       "n_nodes", "n_clusters",
                                       "largest"]) \
        .astype({"threshold": np.float64, "n_pairs": np.int64,
                 "n_nodes": np.int64, "n_clusters": np.int64,
                 "largest": np.int64})


@register("cross_source_dup_groups", sql="""
WITH h AS (SELECT md5(text) AS fp, source FROM documents),
g AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM h GROUP BY fp),
d AS (SELECT * FROM g WHERE n_docs > 1)
SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups,
       CAST(COALESCE(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS cross_groups,
       CAST(COALESCE(SUM(CASE WHEN n_sources > 1 THEN n_docs
                              ELSE 0 END), 0) AS BIGINT)
           AS docs_in_cross,
       CASE WHEN COUNT(*) = 0 THEN 0.0
            ELSE ROUND(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
                       * 1.0 / COUNT(*), 6)
       END AS cross_share
FROM d""")
def cross_source_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Provenance leakage audit: of the exact-duplicate text groups,
    how many SPAN sources? Within-source dups are scraper bugs you
    fix per feed; cross-source dups mean the same document entered
    through two providers — the case that defeats per-source dedup
    quotas and silently double-weights content (and, for train/eval
    feeds, the contamination vector). Texts fingerprint map-side
    (md5, the oracle's function); the chain is three keyed reduces —
    (fp, source, n) → per-fp (docs, distinct sources) → four global
    scalars — so only aggregates ever shuffle, never text."""
    import hashlib

    def fp(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame({
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in texts],
            "source": batch["source"].to_pandas()})

    per_pair = reduce_sink(
        _docs(sf_dir, ["text", "source"])
        .map_batches(fp, batch_format="pyarrow"),
        ["fp", "source"], {"n": ("source", "size")})
    per_fp = reduce_sink(
        per_pair.map_batches(
            lambda df: pd.DataFrame(
                {"fp": df["fp"], "n_docs": df["n"].astype(np.int64),
                 "n_sources": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["fp"], {"n_docs": ("n_docs", "sum"),
                 "n_sources": ("n_sources", "sum")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["n_docs"] > 1]
        cross = d["n_sources"].to_numpy(np.int64) > 1
        return pd.DataFrame({
            "dup_groups": [np.int64(len(d))],
            "cross_groups": [np.int64(cross.sum())],
            "docs_in_cross": [np.int64(
                d["n_docs"].to_numpy(np.int64)[cross].sum())]})

    t = per_fp.map_batches(fold, batch_format="pandas").to_pandas() \
        .sum()
    dg, cg, dc = (int(t["dup_groups"]), int(t["cross_groups"]),
                  int(t["docs_in_cross"]))
    share = 0.0 if dg == 0 else float(textstats.round_half_away(
        np.array([cg * 1.0 / dg]), 6)[0])
    return pd.DataFrame({"dup_groups": np.array([dg], np.int64),
                         "cross_groups": np.array([cg], np.int64),
                         "docs_in_cross": np.array([dc], np.int64),
                         "cross_share": [share]})


@register("hapax_share_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS hapax,
       CAST(SUM(n) AS BIGINT) AS tokens,
       ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
             6) AS hapax_share
FROM c GROUP BY source ORDER BY source""")
def hapax_share_by_source(sf_dir: str) -> pd.DataFrame:
    """Lexical richness per source: the hapax-legomena share (words
    occurring exactly once ÷ vocabulary) — natural prose sits near
    40-60%, template/boilerplate feeds collapse toward 0, OCR noise
    inflates toward 1 (every typo is a new 'word'); the single-number
    complement of the Heaps-law curve. Per-batch (source, word)
    combiner partials → one keyed reduce builds the per-source
    vocabulary table → per-source integer rollup; tokens never
    shuffle individually."""
    def wc(df: pd.DataFrame) -> pd.DataFrame:
        s = df.set_index("source")["text"].fillna("").str.split() \
            .explode().dropna()
        vc = s.groupby([s.index, s.values]).size()
        idx = vc.index
        return pd.DataFrame({"source": idx.get_level_values(0),
                             "word": idx.get_level_values(1),
                             "n": vc.to_numpy(np.int64)})

    c = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(wc, batch_format="pandas"),
        ["source", "word"], {"n": ("n", "sum")})
    per_src = reduce_sink(
        c.map_batches(
            lambda df: pd.DataFrame(
                {"source": df["source"],
                 "vocab": np.ones(len(df), np.int64),
                 "hapax": (df["n"].to_numpy(np.int64) == 1)
                 .astype(np.int64),
                 "tokens": df["n"].astype(np.int64)}),
            batch_format="pandas"),
        ["source"], {"vocab": ("vocab", "sum"),
                     "hapax": ("hapax", "sum"),
                     "tokens": ("tokens", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    share = textstats.round_half_away(
        per_src["hapax"].to_numpy(np.float64)
        / per_src["vocab"].to_numpy(np.float64), 6)
    out = per_src.astype({"vocab": np.int64, "hapax": np.int64,
                          "tokens": np.int64})
    out["hapax_share"] = share
    return out


@register("cuped_value_adjustment", sql="""
WITH b AS (SELECT user_id,
                  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1
                       END AS post,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
u AS (SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(SUM(CASE WHEN post = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN post = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS y
      FROM b GROUP BY user_id),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
                  AS HUGEINT) AS sx1,
             CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END)
                  AS HUGEINT) AS sy1,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1
      FROM u)
SELECT n, n1,
       ROUND((n * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS theta,
       ROUND(((n * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (n * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((n * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS variance_reduction,
       ROUND(((CAST(sy1 AS DOUBLE) / n1
               - CAST(sy - sy1 AS DOUBLE) / (n - n1))
              - ((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * (CAST(sx1 AS DOUBLE) / n1
                   - CAST(sx - sx1 AS DOUBLE) / (n - n1))) / 100, 6)
           AS cuped_effect_dollars
FROM m""")
def cuped_value_adjustment(sf_dir: str) -> pd.DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013 — the
    standard pre-experiment covariate adjustment every large
    experimentation platform runs): X = each user's PRE-period spend,
    Y = post-period spend, θ = cov(X,Y)/var(X); the adjusted metric
    Y − θ(X − X̄) shrinks variance by exactly ρ² (reported, = how
    much smaller the experiment could be), and the θ-adjusted
    arm difference is the effect estimate the unadjusted DiD/z-test
    queries can't denoise. Arm/period conventions shared with
    did_uplift_estimate. One user-grain keyed reduce builds (x, y);
    the nine global moments fold as per-block integer partials with
    the quadratics in two int64 words (Σxy overflows by design) and
    exact python-int recombination — O(blocks) scalar rows reach
    the driver, never users."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    split_us = np.datetime64("2024-01-16", "us").astype(np.int64)

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        post = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            >= split_us
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "x": np.where(post, 0, cents),
            "y": np.where(post, cents, 0)})

    users = reduce_sink(ds.map_batches(xy, batch_format="pandas"),
                        ["user_id"], {"x": ("x", "sum"),
                                      "y": ("y", "sum")})

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64).astype(object)
        y = df["y"].to_numpy(np.int64).astype(object)
        arm1 = (df["user_id"].to_numpy(np.int64) % 2) == 1
        row = {"n": len(df), "sx": int(x.sum()), "sy": int(y.sum()),
               "n1": int(arm1.sum()),
               "sx1": int(x[arm1].sum()) if arm1.any() else 0,
               "sy1": int(y[arm1].sum()) if arm1.any() else 0}
        for name, v in (("sxy", (x * y).sum()), ("sxx", (x * x).sum()),
                        ("syy", (y * y).sum())):
            hi, lo = divmod(int(v), 1 << 62)
            row[f"{name}_hi"], row[f"{name}_lo"] = hi, lo
        return pd.DataFrame([row])

    p = users.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    n1 = int(p["n1"].sum())
    sx = sum(int(v) for v in p["sx"])
    sy = sum(int(v) for v in p["sy"])
    sx1 = sum(int(v) for v in p["sx1"])
    sy1 = sum(int(v) for v in p["sy1"])
    sxy, sxx, syy = (
        sum(int(h) * (1 << 62) + int(l)
            for h, l in zip(p[f"{k}_hi"], p[f"{k}_lo"]))
        for k in ("sxy", "sxx", "syy"))
    num = n * float(sxy) - float(sx) * float(sy)
    vx = n * float(sxx) - float(sx) * float(sx)
    vy = n * float(syy) - float(sy) * float(sy)
    theta = num / vx
    rho2 = (num * num) / (vx * vy)
    eff = (((float(sy1) / n1 - float(sy - sy1) / (n - n1))
            - theta * (float(sx1) / n1 - float(sx - sx1) / (n - n1)))
           / 100)
    r = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "n1": np.array([n1], np.int64),
        "theta": [float(r(np.array([theta]), 6)[0])],
        "variance_reduction": [float(r(np.array([rho2]), 6)[0])],
        "cuped_effect_dollars": [float(r(np.array([eff]), 6)[0])]})


@register("ship_sla_miss_by_priority", sql="""
WITH j AS (SELECT o.o_orderpriority AS priority,
                  epoch_us(l.l_shipdate) // 86400000000
                  - epoch_us(o.o_orderdate) // 86400000000 AS lag_d
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN lag_d > 7 THEN 1 ELSE 0 END) AS BIGINT)
           AS misses,
       ROUND(SUM(CASE WHEN lag_d > 7 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS miss_share
FROM j GROUP BY priority ORDER BY priority""")
def ship_sla_miss_by_priority(sf_dir: str) -> pd.DataFrame:
    """Fulfillment SLA scorecard: the share of line items shipping
    MORE than 7 days after the order, by order priority — the lag
    quantiles say how slow shipping is overall; this says whether
    URGENT actually ships faster (if miss_share is flat across
    priorities, the priority field is decorative). Same fact-to-fact
    orderkey join as the lag-quantile query (auto_join — no fact
    broadcast); day lags and miss flags are exact integers, one
    per-priority rollup shuffles."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "sd": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000}),
        batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "priority": df["o_orderpriority"].astype(str),
            "od": df["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000}),
        batch_format="pandas")
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        lag = df["sd"].to_numpy(np.int64) - df["od"].to_numpy(np.int64)
        return pd.DataFrame({
            "priority": df["priority"],
            "n_lines": np.ones(len(df), np.int64),
            "misses": (lag > 7).astype(np.int64)})

    out = reduce_sink(j.map_batches(flags, batch_format="pandas"),
                      ["priority"], {"n_lines": ("n_lines", "sum"),
                                     "misses": ("misses", "sum")}) \
        .to_pandas().sort_values("priority", ignore_index=True)
    out = out.astype({"n_lines": np.int64, "misses": np.int64})
    out["miss_share"] = textstats.round_half_away(
        out["misses"].to_numpy(np.float64)
        / out["n_lines"].to_numpy(np.float64), 6)
    return out


@register("transition_dwell_time", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
p AS (SELECT LAG(event_type) OVER w AS from_type,
             event_type AS to_type,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000
                 AS gap_s
      FROM sid
      WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(gap_s) AS BIGINT) AS total_s,
       ROUND(SUM(gap_s) * 1.0 / COUNT(*), 4) AS mean_s
FROM p WHERE from_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2""")
def transition_dwell_time(sf_dir: str) -> pd.DataFrame:
    """WHERE session time goes: the transition matrix weighted by
    dwell — mean seconds spent on type A before moving to B within a
    session (the count-only transition matrix says views lead to
    purchases; this says whether that step takes 5 seconds or 5
    minutes — the hesitation map). Sessionize, shift and gap in ONE
    bucket-local pass (seam transitions survive block splits); only
    ≤|types|² (from, to, n, Σgap) integer partials shuffle; the mean
    is one rounded division on the tiny matrix."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def dwell(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        if len(g) < 2:
            return pd.DataFrame({"from_type": pd.Series([], object),
                                 "to_type": pd.Series([], object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "total_s": pd.Series([],
                                                      dtype=np.int64)})
        cont = (uid[1:] == uid[:-1]) \
            & ((us[1:] - us[:-1]) < 1_800_000_000)
        gap = (us[1:] - us[:-1])[cont] // 1_000_000
        d = pd.DataFrame({"from_type": et[:-1][cont],
                          "to_type": et[1:][cont], "gap": gap})
        out = d.groupby(["from_type", "to_type"], sort=False).agg(
            n=("gap", "size"), total_s=("gap", "sum")).reset_index()
        return out.astype({"n": np.int64, "total_s": np.int64})

    parts = (ds.map_batches(with_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(dwell,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["from_type", "to_type"],
                      {"n": ("n", "sum"),
                       "total_s": ("total_s", "sum")}) \
        .to_pandas().sort_values(["from_type", "to_type"],
                                 ignore_index=True)
    out = out.astype({"n": np.int64, "total_s": np.int64})
    out["mean_s"] = textstats.round_half_away(
        out["total_s"].to_numpy(np.float64)
        / out["n"].to_numpy(np.float64), 4)
    return out


@register("energy_distance_view_purchase", sql="""
WITH h AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                ELSE 0 END) AS BIGINT) AS a,
                  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END) AS BIGINT) AS b
           FROM events WHERE event_type IN ('view', 'purchase')
           GROUP BY 1),
t AS (SELECT CAST(SUM(a) AS HUGEINT) AS n,
             CAST(SUM(b) AS HUGEINT) AS m FROM h),
s AS (SELECT c, SUM(a) OVER (ORDER BY c) AS ca,
             SUM(b) OVER (ORDER BY c) AS cb,
             LEAD(c) OVER (ORDER BY c) AS nc
      FROM h),
g AS (SELECT
  SUM(CAST(nc - c AS HUGEINT)
      * (CAST(ca AS HUGEINT) * (t.m - cb)
         + CAST(cb AS HUGEINT) * (t.n - ca))) AS sxy,
  SUM(CAST(nc - c AS HUGEINT)
      * (CAST(ca AS HUGEINT) * (t.n - ca))) AS sxx,
  SUM(CAST(nc - c AS HUGEINT)
      * (CAST(cb AS HUGEINT) * (t.m - cb))) AS syy
  FROM s, t WHERE nc IS NOT NULL)
SELECT CAST(t.n AS BIGINT) AS n_view, CAST(t.m AS BIGINT) AS n_purchase,
       ROUND((2.0 * (CAST(g.sxy AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * CAST(t.m AS DOUBLE)))
              - 2.0 * CAST(g.sxx AS DOUBLE)
                / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))
              - 2.0 * CAST(g.syy AS DOUBLE)
                / (CAST(t.m AS DOUBLE) * CAST(t.m AS DOUBLE))) / 100,
             6) AS energy_distance_dollars
FROM g, t""")
def energy_distance_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Energy distance between the view and purchase value
    distributions (Székely & Rizzo 2004): D² = 2E|X−Y| − E|X−X'| −
    E|Y−Y'| — a true METRIC on distributions in dollar units,
    sensitive to tail differences the KS sup-norm can't weigh
    (completes the two-sample family: KS, CvM, MW, Welch are tests,
    this is the distance). Every pairwise-|Δ| expectation collapses
    to the exact O(V) prefix identity Σ gap_k·(crossings at k) over
    the shared cents histogram — the gini trick, two samples at
    once — with 128-bit cross terms in python ints; three exact
    integers in, one rounded division out."""
    def h(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["event_type"].isin(("view", "purchase")).to_numpy()
        d = df[keep]
        isv = (d["event_type"] == "view").to_numpy()
        return pd.DataFrame({
            "c": np.rint(d["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "a": isv.astype(np.int64),
            "b": (~isv).astype(np.int64)})

    hist = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(h, batch_format="pandas"),
        ["c"], {"a": ("a", "sum"), "b": ("b", "sum")}) \
        .to_pandas().sort_values("c", ignore_index=True)
    c = hist["c"].to_numpy(np.int64)
    a = hist["a"].to_numpy(np.int64)
    b = hist["b"].to_numpy(np.int64)
    n, m = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a), np.cumsum(b)
    gap = (c[1:] - c[:-1]).astype(object)
    cao, cbo = ca[:-1].astype(object), cb[:-1].astype(object)
    sxy = int((gap * (cao * (m - cbo) + cbo * (n - cao))).sum())
    sxx = int((gap * (cao * (n - cao))).sum())
    syy = int((gap * (cbo * (m - cbo))).sum())
    e = (2.0 * (float(sxy) / (float(n) * float(m)))
         - 2.0 * float(sxx) / (float(n) * float(n))
         - 2.0 * float(syy) / (float(m) * float(m))) / 100
    return pd.DataFrame({
        "n_view": np.array([n], np.int64),
        "n_purchase": np.array([m], np.int64),
        "energy_distance_dollars": [float(textstats.round_half_away(
            np.array([e]), 6)[0])]})


@register("theil_decomposition_by_nation", sql="""
WITH o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                  o_custkey
           FROM orders),
j AS (SELECT n.n_name AS nation, o.c FROM o
      JOIN customer cu ON cu.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = cu.c_nationkey),
g AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS l
      FROM j GROUP BY nation),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS HUGEINT) AS st FROM g),
w AS (SELECT
  SUM((CAST(s AS DOUBLE) / CAST(st AS DOUBLE))
      * (l / CAST(s AS DOUBLE) - LN(CAST(s AS DOUBLE) / n)))
      AS t_within,
  SUM((CAST(s AS DOUBLE) / CAST(st AS DOUBLE))
      * LN((CAST(s AS DOUBLE) / CAST(st AS DOUBLE))
           * (CAST(nn AS DOUBLE) / n))) AS t_between
  FROM g, t)
SELECT g.nation, g.n AS n_orders, CAST(g.s AS BIGINT) AS sum_cents,
       ROUND(g.l / CAST(g.s AS DOUBLE)
             - LN(CAST(g.s AS DOUBLE) / g.n), 6) AS t_g,
       ROUND(w.t_between, 6) AS t_between,
       ROUND(w.t_within, 6) AS t_within
FROM g, w ORDER BY g.nation""")
def theil_decomposition_by_nation(sf_dir: str) -> pd.DataFrame:
    """Theil-T inequality DECOMPOSITION of order value across
    customer nations: T = T_between + Σ share·T_g — the one
    inequality index that splits exactly into 'nations differ from
    each other' vs 'inequality inside each nation' (a Gini can't);
    t_between ≈ 0 says geographic segmentation explains nothing.
    Customer→nation resolves map-side via broadcast dicts (the fact
    table never shuffles for the dimension); per-nation partials are
    (n, Σc, Σ c·ln c) with T_g = L/S − ln(S/n) closing the
    within-group term from three aggregates — identical expression
    order on both engines, 6dp on O(1) outputs."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]) \
        .to_pandas()
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                    nat["n_name"].astype(str)))
    cmap_ref = ray.put({
        int(k): nmap[int(v)]
        for k, v in zip(cust["c_custkey"].to_numpy(np.int64),
                        cust["c_nationkey"].to_numpy(np.int64))})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        c = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        d = pd.DataFrame({
            "nation": df["o_custkey"].map(cmap),
            "n": np.ones(len(df), np.int64), "s": c,
            "l": c.astype(np.float64) * np.log(c.astype(np.float64))})
        return d.groupby("nation", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), l=("l", "sum"))

    g = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice", "o_custkey"])
        .map_batches(partial, batch_format="pandas"),
        ["nation"], {"n": ("n", "sum"), "s": ("s", "sum"),
                     "l": ("l", "sum")}) \
        .to_pandas().sort_values("nation", ignore_index=True)
    n_g = g["n"].to_numpy(np.int64)
    s_g = np.array([int(v) for v in g["s"]], dtype=object)
    l_g = g["l"].to_numpy(np.float64)
    nn, st = int(n_g.sum()), int(s_g.sum())
    share = np.array([float(int(s)) / float(st) for s in s_g])
    t_g = l_g / np.array([float(int(s)) for s in s_g]) \
        - np.log(np.array([float(int(s)) for s in s_g])
                 / n_g.astype(np.float64))
    t_within = float((share * t_g).sum())
    t_between = float((share * np.log(
        share * (float(nn) / n_g.astype(np.float64)))).sum())
    r = textstats.round_half_away
    return pd.DataFrame({
        "nation": g["nation"],
        "n_orders": n_g.astype(np.int64),
        "sum_cents": np.array([int(v) for v in s_g], np.int64),
        "t_g": r(t_g, 6),
        "t_between": float(r(np.array([t_between]), 6)[0]),
        "t_within": float(r(np.array([t_within]), 6)[0])})


@register("return_rate_by_discount", sql="""
SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS returned,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS return_rate
FROM lineitem GROUP BY 1 ORDER BY 1""")
def return_rate_by_discount(sf_dir: str) -> pd.DataFrame:
    """Return rate by discount band — the moral-hazard check: if
    deeply-discounted lines come back MORE often, discounts are
    buying regret, not revenue (read next to the discount-cap
    what-if). One pruned two-column scan, 11 integer partial rows,
    one rounded division per band."""
    def flags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "discount_pct": np.rint(
                df["l_discount"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "n_lines": np.ones(len(df), np.int64),
            "returned": (df["l_returnflag"].to_numpy(object) == "R")
            .astype(np.int64)})

    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_discount", "l_returnflag"])
        .map_batches(flags, batch_format="pandas"),
        ["discount_pct"], {"n_lines": ("n_lines", "sum"),
                           "returned": ("returned", "sum")}) \
        .to_pandas().sort_values("discount_pct", ignore_index=True)
    out = out.astype({"discount_pct": np.int64, "n_lines": np.int64,
                      "returned": np.int64})
    out["return_rate"] = textstats.round_half_away(
        out["returned"].to_numpy(np.float64)
        / out["n_lines"].to_numpy(np.float64), 6)
    return out


_TIMEOUTS_S = (300, 900, 1800, 3600)

_TIMEOUT_SQL = "\nUNION ALL ".join(f"""
SELECT {t} AS timeout_s, CAST(SUM(ns) AS BIGINT) AS n_sessions,
       ROUND(COUNT(*) * 1.0 / SUM(ns), 4) AS mean_events
FROM (SELECT CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts)
                          >= {t * 1_000_000}
                  THEN 1 ELSE 0 END AS ns
      FROM (SELECT ts, LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
            FROM events))""" for t in _TIMEOUTS_S) + "\nORDER BY timeout_s"


@register("session_timeout_calibration", sql=_TIMEOUT_SQL)
def session_timeout_calibration(sf_dir: str) -> pd.DataFrame:
    """Calibration curve for the session-timeout knob: session count
    and mean events/session at 5/15/30/60-minute gaps — the table
    you read BEFORE trusting any 30-minute-window metric (if
    n_sessions still drops steeply between 30 and 60 min, the
    '30-minute visit' is an artifact of the knob, not of behavior;
    the reference hard-codes 1800 s — this measures that choice).
    ONE bucket-local sort+gap pass evaluates all four thresholds on
    the same gap array; only 4 (timeout, sessions, events) integer
    partials per bucket shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        gap = np.full(n, np.int64(1 << 62))
        if n > 1:
            same = uid[1:] == uid[:-1]
            gap[1:] = np.where(same, us[1:] - us[:-1],
                               np.int64(1 << 62))
        rows = [(t, int((gap >= t * 1_000_000).sum()), n)
                for t in _TIMEOUTS_S]
        return pd.DataFrame(rows, columns=["timeout_s", "n_sessions",
                                           "n_events"])

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(counts, batch_format="pandas"),
        ["timeout_s"], {"n_sessions": ("n_sessions", "sum"),
                        "n_events": ("n_events", "sum")}) \
        .to_pandas().sort_values("timeout_s", ignore_index=True)
    mean = textstats.round_half_away(
        out["n_events"].to_numpy(np.float64)
        / out["n_sessions"].to_numpy(np.float64), 4)
    return pd.DataFrame({
        "timeout_s": out["timeout_s"].astype(np.int64),
        "n_sessions": out["n_sessions"].astype(np.int64),
        "mean_events": mean})


@register("escalating_spend_share", sql="""
WITH o AS (SELECT o_custkey AS c,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
                  o_orderdate AS od, o_orderkey AS k
           FROM orders),
w AS (SELECT c, v,
             ROW_NUMBER() OVER (PARTITION BY c ORDER BY od, k) AS rn,
             COUNT(*) OVER (PARTITION BY c) AS cnt,
             MAX(v) OVER (PARTITION BY c ORDER BY od, k
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prevmax,
             LAG(v) OVER (PARTITION BY c ORDER BY od, k) AS prev
      FROM o),
per AS (SELECT c,
               MAX(CASE WHEN rn = cnt AND v > prevmax THEN 1 ELSE 0
                        END) AS last_is_max,
               MIN(CASE WHEN rn > 1 AND v <= prev THEN 0 ELSE 1
                        END) AS monotone
        FROM w GROUP BY c HAVING MAX(cnt) >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_customers,
       CAST(SUM(last_is_max) AS BIGINT) AS last_is_max_n,
       ROUND(SUM(last_is_max) * 1.0 / COUNT(*), 6)
           AS last_is_max_share,
       CAST(SUM(monotone) AS BIGINT) AS monotone_n,
       ROUND(SUM(monotone) * 1.0 / COUNT(*), 6) AS monotone_share
FROM per""")
def escalating_spend_share(sf_dir: str) -> pd.DataFrame:
    """Escalating-spend detector over multi-order customers: the
    share whose LAST order is their strict lifetime maximum (growing
    trust — upsell is working) and the share whose whole order
    sequence is strictly increasing (the rare monotone climbers) —
    per-entity ORDER-dependent booleans no value histogram can
    recover. Customers hash-bucket; one vectorized sort + grouped
    cummax/shift per bucket computes both flags; only three integer
    partials per bucket shuffle. Ties lose (strict >) on both
    engines."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate",
                 "o_orderkey"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c": df["o_custkey"].to_numpy(np.int64),
            "v": np.rint(df["o_totalprice"].to_numpy(np.float64)
                         * 100).astype(np.int64),
            "od": df["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64),
            "k": df["o_orderkey"].to_numpy(np.int64),
            "bucket_": (df["o_custkey"].to_numpy(np.int64) % 32)
            .astype(np.int32)})

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "od", "k"], kind="mergesort")
        grp = g.groupby("c", sort=False)
        cnt = grp["v"].transform("size").to_numpy(np.int64)
        prevmax = grp["v"].cummax().groupby(g["c"], sort=False) \
            .shift(1)
        prev = grp["v"].shift(1)
        is_last = grp.cumcount().to_numpy(np.int64) == cnt - 1
        multi = cnt >= 2
        last_is_max = (is_last & multi
                       & (g["v"] > prevmax).to_numpy())
        broke = ((g["v"] <= prev) & prev.notna()).to_numpy()
        per = pd.DataFrame({"c": g["c"], "broke": broke,
                            "lim": last_is_max, "multi": multi}) \
            .groupby("c", sort=False).agg(
            broke=("broke", "any"), lim=("lim", "any"),
            multi=("multi", "any"))
        per = per[per["multi"]]
        return pd.DataFrame({
            "n_multi": [np.int64(len(per))],
            "lim_n": [np.int64(per["lim"].sum())],
            "mono_n": [np.int64((~per["broke"]).sum())]})

    p = (ds.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_").map_groups(flags, batch_format="pandas")) \
        .to_pandas().sum()
    n, lim_n, mono_n = (int(p["n_multi"]), int(p["lim_n"]),
                        int(p["mono_n"]))
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_multi_customers": np.array([n], np.int64),
        "last_is_max_n": np.array([lim_n], np.int64),
        "last_is_max_share": [float(r(np.array([lim_n / n]), 6)[0])],
        "monotone_n": np.array([mono_n], np.int64),
        "monotone_share": [float(r(np.array([mono_n / n]), 6)[0])]})


def all_queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def all_oracle_sql():
    # two oracles read deterministic /tmp fixtures by absolute path —
    # make sure they exist even if the caller runs SQL before the
    # corresponding Ray query (cheap, idempotent, atomic publish)
    _evolved_dir()
    _skewed_dir()
    return {name: sql for name, (_, sql) in REGISTRY.items()
            if sql is not None}
