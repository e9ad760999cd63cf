"""Driver-contract queries (chunk 5/18).
Sections:
  - vectorized bit length: int64→float64 is EXACT for cents
  - seam gaps between consecutive non-empty buckets (driver,
  - sessionize and take gaps in ONE bucket-local pass — a
  - NOTE: a session may span blocks of the sessionize output,
  - position within session run
  - DuckDB dayofweek: 0=Sunday; 1970-01-01 was a Thursday (=4)
  - recall decay — document and start the curve at 0.4)
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
    _events,
    ann,
    dedup,
    distinct_count,
    np,
    pa,
    pc,
    pd,
    pq,
    ray,
    rd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
    _sessionized_events,
)



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
    generate ONCE at the loosest threshold, then each threshold
    filters the tiny verified pair list and runs union-find, so the
    quadratic work never repeats. Pair source is size-adaptive: at
    cos 0.3 a random high-dim pair collides per plane with p ≈ 0.5,
    so sign-LSH cannot separate signal from noise and degenerates
    to all-pairs WITH bucketing overhead (measured 35 s vs 3 s at
    2 000 vectors) — below the cutoff the blocked exact generator
    wins; above it, LSH with enough planes for the tighter
    effective threshold is the only option and the curve should
    start at 0.4+."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n_vecs = ds.count()
    if n_vecs <= 50_000:
        pairs = dedup.cosine_dup_pairs(
            ds, threshold=min(_PERC_THRESHOLDS))
    else:   # scale path: LSH candidates (loose thresholds get slow
            # recall decay — document and start the curve at 0.4)
        pairs = dedup.cosine_dup_pairs_lsh(
            ds, threshold=min(_PERC_THRESHOLDS), n_planes=3,
            n_tables=64)
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
