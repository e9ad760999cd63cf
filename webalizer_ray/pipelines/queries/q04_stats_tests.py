"""Driver-contract queries (chunk 4/18).
Sections:
  - last segment of the bucket extends to the next non-empty
  - U_t = Σ_{i<=t} Σ_{j>t} sgn(y_i − y_j): direct masked sums over
  - only source rows have dynamics (zero rows contribute hrow 0 and
  - doubled midranks per day: 2*rank_min - 1 + tie_count
  - per-stratum cut bin + how many needed inside it
  - shared monotonic axis: per-user offset with gaps wider than
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
    _events,
    distinct_count,
    np,
    pa,
    pc,
    pd,
    ray,
    rd,
    reduce_sink,
    register,
    simjoin,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
    _sessionized_events,
    event_transitions,
)
from webalizer_ray.pipelines.queries.q03_tpch_ml import (  # noqa: F401
    daily_seasonal_decompose,
)



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
