"""Driver-contract queries (chunk 3/18).
Sections:
  - all-empty block sets lose their schema on to_pandas();
  - Ray drops the schema of all-empty block sets on to_pandas();
  - deterministic: rounded score desc, then partkey asc
  - exclusive prefix max over the O(buckets) driver rows
  - two-phase distinct: after this reduce each (fd, x, y) is ONE row
  - drop the self edge by IDENTITY, not rank (an exact-duplicate
  - factorize pair-endpoint strings in SORTED order so min int id
  - keep ALL types: the spine bounds come from the full table and
  - per-key tie stats: RANK() = min(row_number) over the key, ties =
  - Python-int cross products: exact at any scale, no int64 overflow.
  - Overflow-guarded Σ rnk·cents: rank offsets to the batch min
  - one sort, one shifted compare: a (user, day) row scores an
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    join_partitions,
    REGISTRY,
    _docs,
    _events,
    ann,
    np,
    os,
    pa,
    pc,
    pd,
    pq,
    ray,
    rd,
    reduce_sink,
    register,
    scan,
    tempfile,
    textstats,
    top_n_pandas,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _with_time_cols,
    _word_count_partials,
    event_transitions,
    knn_graph,
)



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
    j = act.join(per_cust, join_type="left_outer", num_partitions=join_partitions(),
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
    # materialize between the chained passes: each global_rank samples
    # AND count-reduces its input, so a lazy chain re-executes the
    # previous pass's shuffle for every one of those consumptions
    ranked = scan.global_rank(u, "neg_rec", "user_id",
                              out_col="r_rnk",
                              num_buckets=8).materialize()
    ranked = scan.global_rank(ranked, "freq_f", "user_id",
                              out_col="f_rnk",
                              num_buckets=8).materialize()
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

    # raw per-lineitem rating rows go straight to als_fit: the shard
    # seal pre-sums duplicate (user, item) pairs exactly (user-complete
    # shards), so the old global reduce_sink — which shrank 600k rows
    # by 0.1% for the price of a full shuffle — is gone (r5).
    # Materialized once: consumed by the ALS scatter AND `seen` below.
    ratings = j.map_batches(keyed, batch_format="pandas").materialize()
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

    # r4: edges stream as a DATASET end to end — the kNN graph comes
    # back node-partitioned from ann.knn_graph(as_dataset=True) and
    # each batch symmetrizes ITS edges; duplicate (src, dst) rows are
    # harmless under BFS's key-level MIN, so no global dedup shuffle
    # (the last O(corpus) driver pull, VERDICT r3 item 1, is gone)
    g = ann.knn_graph(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        k=2, as_dataset=True)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df["node"].to_numpy(np.int64)
        b = df["neighbor"].to_numpy(np.int64)
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    edges = g.map_batches(sym, batch_format="pandas")
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

    # r4: Dataset edges end to end (see knn_bfs_levels) — duplicate
    # (src, dst) rows carry the IDENTICAL weight (cosine is symmetric
    # and the micro-dissimilarity is a pure function of it), so they
    # are harmless under Bellman-Ford's MIN relax and no global dedup
    # shuffle is needed
    g = ann.knn_graph(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        k=2, as_dataset=True)

    def sym_w(df: pd.DataFrame) -> pd.DataFrame:
        a = df["node"].to_numpy(np.int64)
        b = df["neighbor"].to_numpy(np.int64)
        w = (1_000_000
             - np.rint(df["cosine"].to_numpy(np.float64) * 1e6)) \
            .astype(np.int64)
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a]),
                             "w": np.concatenate([w, w])})

    edges = g.map_batches(sym_w, batch_format="pandas")
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
    CRC32 of the encoded bytes, ink pixel count). Rows-only: PNG
    encoding is byte-level work no SQL reproduces; test_graphs pins
    pixel-exact round-trips and deterministic renders. The aggregates are
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


@register("logreg_purchase_coefs", sql="""
WITH f AS (SELECT CAST(epoch_us(ts) // 3600000000 % 24 AS DOUBLE)
                      / 24.0 AS x1,
                  value / 100.0 AS x2,
                  CASE WHEN event_type = 'purchase'
                       THEN 1.0 ELSE 0.0 END AS y
           FROM events),
w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
s1 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w0 w)),
w1 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s1) , w0 w),
s2 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w1 w)),
w2 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s2) , w1 w),
s3 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w2 w)),
w3 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s3) , w2 w),
s4 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w3 w)),
w4 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s4) , w3 w),
s5 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w4 w)),
w5 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s5) , w4 w),
s6 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w5 w)),
w6 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s6) , w5 w),
s7 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w6 w)),
w7 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s7) , w6 w),
s8 AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,
         SUM((y - p) * x2) AS g2,
         SUM(p * (1 - p)) AS h00,
         SUM(p * (1 - p) * x1) AS h01,
         SUM(p * (1 - p) * x2) AS h02,
         SUM(p * (1 - p) * x1 * x1) AS h11,
         SUM(p * (1 - p) * x1 * x2) AS h12,
         SUM(p * (1 - p) * x2 * x2) AS h22
  FROM (SELECT f.*,
               1.0 / (1.0 + EXP(-(w.b0 + w.b1 * f.x1 + w.b2 * f.x2)))
                   AS p
        FROM f CROSS JOIN w7 w)),
w8 AS (
  SELECT w.b0 + ((a11 * a22 - a12 * a12) * g0
               + (a02 * a12 - a01 * a22) * g1
               + (a01 * a12 - a02 * a11) * g2) / det AS b0,
         w.b1 + ((a02 * a12 - a01 * a22) * g0
               + (a00 * a22 - a02 * a02) * g1
               + (a01 * a02 - a00 * a12) * g2) / det AS b1,
         w.b2 + ((a01 * a12 - a02 * a11) * g0
               + (a01 * a02 - a00 * a12) * g1
               + (a00 * a11 - a01 * a01) * g2) / det AS b2
  FROM (SELECT g0, g1, g2,
               h00 + 1e-9 AS a00, h01 AS a01, h02 AS a02,
               h11 + 1e-9 AS a11, h12 AS a12, h22 + 1e-9 AS a22,
               (h00 + 1e-9) * ((h11 + 1e-9) * (h22 + 1e-9) - h12 * h12)
             - h01 * (h01 * (h22 + 1e-9) - h12 * h02)
             + h02 * (h01 * h12 - (h11 + 1e-9) * h02) AS det
        FROM s8) , w7 w)
SELECT t.term, t.coef FROM (
  SELECT 'intercept' AS term, ROUND(b0, 4) AS coef, 0 AS o FROM w8
  UNION ALL
  SELECT 'hour_frac', ROUND(b1, 4), 1 FROM w8
  UNION ALL
  SELECT 'value_scaled', ROUND(b2, 4), 2 FROM w8) t
ORDER BY t.o""")
def logreg_purchase_coefs(sf_dir: str) -> pd.DataFrame:
    """Distributed logistic regression by IRLS / Newton's method:
    predict
    P(event_type = 'purchase') from (hour, value). Every iteration is
    ONE streaming pass where each block emits a 3-float gradient and a
    3x3 Hessian partial (15 floats per block total — the GLM sibling
    of the OLS Gram pattern); the driver solves the 3x3 Newton step.
    p features cost O(p^2) floats per block at any corpus size.
    Deterministic given the fixed iteration count. Oracle (r3): the
    8 Newton steps unrolled as chained CTEs — per-step gradient/
    Hessian SUMs over the same features, the jittered 3×3 solve as a
    closed-form adjugate; LAPACK-vs-adjugate round-off stays far
    below the 4 dp report. Planted-separation recovery test in
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


@register("knn_kcore_sizes", sql="""
WITH RECURSIVE sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
kr AS (SELECT node, neighbor, cosine,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
canon AS (SELECT DISTINCT LEAST(node, neighbor) AS src,
                 GREATEST(node, neighbor) AS dst
          FROM kr WHERE rank <= 2 AND node != neighbor),
und AS (SELECT src AS n, dst AS m FROM canon
        UNION ALL SELECT dst, src FROM canon),
p1(iter, node) AS (
  SELECT 0, n FROM (SELECT DISTINCT n FROM und)
  UNION ALL
  SELECT p.iter + 1, p.node FROM p1 p
  WHERE p.iter < 100 AND p.node IN (
    SELECT n FROM (
      SELECT u.n, COUNT(*) AS c FROM und u
      WHERE u.n IN (SELECT node FROM p1 q WHERE q.iter = p.iter)
        AND u.m IN (SELECT node FROM p1 q WHERE q.iter = p.iter)
      GROUP BY u.n) WHERE c >= 1)),
p2(iter, node) AS (
  SELECT 0, n FROM (SELECT DISTINCT n FROM und)
  UNION ALL
  SELECT p.iter + 1, p.node FROM p2 p
  WHERE p.iter < 100 AND p.node IN (
    SELECT n FROM (
      SELECT u.n, COUNT(*) AS c FROM und u
      WHERE u.n IN (SELECT node FROM p2 q WHERE q.iter = p.iter)
        AND u.m IN (SELECT node FROM p2 q WHERE q.iter = p.iter)
      GROUP BY u.n) WHERE c >= 2)),
p3(iter, node) AS (
  SELECT 0, n FROM (SELECT DISTINCT n FROM und)
  UNION ALL
  SELECT p.iter + 1, p.node FROM p3 p
  WHERE p.iter < 100 AND p.node IN (
    SELECT n FROM (
      SELECT u.n, COUNT(*) AS c FROM und u
      WHERE u.n IN (SELECT node FROM p3 q WHERE q.iter = p.iter)
        AND u.m IN (SELECT node FROM p3 q WHERE q.iter = p.iter)
      GROUP BY u.n) WHERE c >= 3))
SELECT k, core_nodes FROM (
SELECT 1 AS k, (SELECT CAST(COUNT(*) AS BIGINT) FROM p1 WHERE iter = 100) AS core_nodes
UNION ALL
SELECT 2 AS k, (SELECT CAST(COUNT(*) AS BIGINT) FROM p2 WHERE iter = 100) AS core_nodes
UNION ALL
SELECT 3 AS k, (SELECT CAST(COUNT(*) AS BIGINT) FROM p3 WHERE iter = 100) AS core_nodes
) ORDER BY k""")
def knn_kcore_sizes(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition of the k-NN similarity graph. Oracle
    (r3): the peel as a DuckDB RECURSIVE CTE — each iteration
    re-emits exactly the nodes with ≥ k surviving neighbors, capped
    at 100 rounds (a fixpoint re-emits itself, so overshooting is
    harmless and an emptied core simply stops recursing); pytest
    additionally proves parity against a driver-side brute-force
    peel on planted graphs. Reported: how many nodes
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


@register("type_user_ndv_hll", sql="""
WITH src AS MATERIALIZED (SELECT event_type, user_id AS u FROM events),
h0 AS (SELECT event_type, CAST((CAST(u AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z0
       FROM src),
h1 AS (SELECT event_type, CAST((((CAST((xor(z0, z0 >> 30)) >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296 + (CAST((xor(z0, z0 >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929)) % 18446744073709551616 AS UBIGINT) AS z1 FROM h0),
h2 AS (SELECT event_type, CAST((((CAST((xor(z1, z1 >> 27)) >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296 + (CAST((xor(z1, z1 >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931)) % 18446744073709551616 AS UBIGINT) AS z2 FROM h1),
hx AS MATERIALIZED (SELECT event_type, xor(z2, z2 >> 31) AS h FROM h2),
regs AS MATERIALIZED (
  SELECT event_type, CAST(h >> 50 AS BIGINT) AS idx,
         MAX(CASE WHEN (h & 1125899906842623) = 0 THEN 51
                  ELSE 50 - (length(bin(h & 1125899906842623)) - 1)
             END) AS r
  FROM hx GROUP BY event_type, idx),
est AS (
  SELECT event_type, 
         16384.0 * 16384.0 * (0.7213 / (1.0 + 1.079 / 16384.0))
             / ((16384 - COUNT(*)) + SUM(POWER(2.0, -r))) AS e,
         16384 - COUNT(*) AS zeros
  FROM regs GROUP BY event_type)
SELECT event_type, CAST(ROUND(CASE WHEN e <= 2.5 * 16384 AND zeros > 0
                 THEN 16384.0 * LN(16384.0 / zeros) ELSE e END)
           AS BIGINT) AS ndv_users_est
FROM est ORDER BY event_type""")
def type_user_ndv_hll(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate distinct count (HLL per event type) —
    the mergeable-summary path for per-key NDV when the keys are too
    many or the sets too large for the exact two-phase distinct
    (which stays the small-cardinality baseline; pytest pins each
    estimate within 5% of it; SplitMix64 hashing gives it a
    bit-exact SQL oracle — see distinct_users_hll). ONE pass: each
    batch emits one
    (type, registers) sketch partial per type it saw; register-max
    merges are associative, so only |types| x 16 KiB ever shuffles."""
    from webalizer_ray.stages.sketch import HyperLogLog, splitmix64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = splitmix64(g["user_id"].to_numpy(np.int64)
                           .astype(np.uint64))
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
