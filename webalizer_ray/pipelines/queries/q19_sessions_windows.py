"""Driver-contract queries (chunk 19/19): session & window family.

Carved out of q01_core (VERDICT r4 item 6 — chunk-size bar): the W1/W2
visit-window sessionization queries over the events stream (30-min gap,
>= rule), the W4 out-of-order policies, tumbling/rolling/sliding window
aggregates, and the session-derived path/pair/bounce/gap analytics.
Shared session SQL fragments and the sessionized-events helper come
from q01_core (single source of truth for the gap rule).
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _events,
    np,
    pa,
    pc,
    pd,
    rd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
    _SESS_SQL,
    _per_session_rollup,
    _sessionized_events,
    _with_time_cols,
)


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
