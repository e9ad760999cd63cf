"""Driver-contract queries (chunk 6/18).
Sections:
  - reduceat segments ending before the next start are the
  - seam gaps between adjacent buckets (buckets are disjoint time
  - churn needs yesterday's active counts: emit (day+1, active)
  - per (user) partials: max sid = session count (sids are
  - global last day (cheap metadata pass)
  - two-phase distincts via reduce on each fingerprint column
  - rank of true label under (sim desc, label asc): count of
  - Ray drops the schema of all-empty block sets: zero flagged
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
    scan,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
    _bm25_topk,
    _lang_rx,
    _sessionized_events,
)
from webalizer_ray.pipelines.queries.q02_relational_media import (  # noqa: F401
    centroid_confusion,
)



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


@register("centroid_label_ari", sql="""
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
                ORDER BY sim DESC, pred_label) AS rk FROM s),
conf AS (SELECT true_label, pred_label,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM r WHERE rk = 1 GROUP BY 1, 2),
ix AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS idx FROM conf),
ra AS (SELECT CAST(SUM(a * (a - 1) / 2) AS BIGINT) AS sa
       FROM (SELECT SUM(n) AS a FROM conf GROUP BY true_label)),
rb AS (SELECT CAST(SUM(b * (b - 1) / 2) AS BIGINT) AS sb
       FROM (SELECT SUM(n) AS b FROM conf GROUP BY pred_label)),
tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM conf)
SELECT tt.nn AS n_points, ix.idx AS pair_index,
       CASE WHEN 0.5 * (ra.sa + rb.sb)
                 - CAST(ra.sa AS DOUBLE) * rb.sb
                   / (tt.nn * (tt.nn - 1) / 2) = 0 THEN 1.0
            ELSE ROUND((ix.idx - CAST(ra.sa AS DOUBLE) * rb.sb
                        / (tt.nn * (tt.nn - 1) / 2))
                       / (0.5 * (ra.sa + rb.sb)
                          - CAST(ra.sa AS DOUBLE) * rb.sb
                            / (tt.nn * (tt.nn - 1) / 2)), 6)
       END AS ari
FROM ix, ra, rb, tt""")
def centroid_label_ari(sf_dir: str) -> pd.DataFrame:
    """Adjusted Rand Index between the nearest-centroid clustering
    and the true labels (Hubert & Arabie 1985): chance-corrected
    pair agreement — accuracy/confusion can look fine while ARI
    exposes a clustering no better than chance (ARI 0) or flags a
    label permutation as perfect (ARI 1, which plain accuracy
    scores 0). Reuses centroid_confusion's assignment (9dp-rounded
    cosine argmax, smaller-label ties); every C(·,2) pair count is
    an exact integer off the ≤|labels|² contingency; one guarded
    rounded division closes it."""
    conf = centroid_confusion(sf_dir)
    n_ij = conf["n"].to_numpy(np.int64)
    idx = int((n_ij * (n_ij - 1) // 2).sum())
    a = conf.groupby("true_label")["n"].sum().to_numpy(np.int64)
    b = conf.groupby("pred_label")["n"].sum().to_numpy(np.int64)
    sa = int((a * (a - 1) // 2).sum())
    sb = int((b * (b - 1) // 2).sum())
    nn = int(n_ij.sum())
    cn2 = nn * (nn - 1) // 2
    exp = float(sa) * sb / cn2
    den = 0.5 * (sa + sb) - exp
    ari = 1.0 if den == 0 else float(textstats.round_half_away(
        np.array([(idx - exp) / den]), 6)[0])
    return pd.DataFrame({"n_points": np.array([nn], np.int64),
                         "pair_index": np.array([idx], np.int64),
                         "ari": [ari]})


@register("ranker_agreement_rbo", sql=r"""
WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS dl
           FROM documents),
n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+'))
                        AS term
             FROM documents)
       WHERE term IN ('table', 'hash', 'merge') GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             ROUND(SUM(ln((n.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / n.avgdl))),
                 6) AS score
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
vec AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                   AS vr
        FROM vs QUALIFY vr <= 50),
mm AS (SELECT GREATEST(lex.lr, vec.vr) AS m
       FROM lex JOIN vec ON lex.doc_id = vec.doc_id)
SELECT CAST((SELECT COUNT(*) FROM mm) AS BIGINT) AS n_common,
       ROUND((1.0 - 0.9) / 0.9
             * SUM((SELECT COUNT(*) FROM mm WHERE m <= g.d)
                   * 1.0 / g.d * POWER(0.9, g.d)), 6) AS rbo_50
FROM generate_series(1, 50) g(d)""")
def ranker_agreement_rbo(sf_dir: str) -> pd.DataFrame:
    """Rank-Biased Overlap (Webber et al. TOIS 2010) between the
    BM25 and cosine top-50 rankings — DO the lexical and vector
    rankers agree, before you bother fusing them? (RRF fuses; RBO
    measures: ≈1 means the second index is redundant, ≈0 means they
    see different corpora — the indefinite-ranking overlap measure
    built for exactly this.) Both legs are the same distributed
    top-50 per-batch partials as hybrid_search_rrf (ranks over
    rounded scores with id ties, so no float noise flips a rank);
    the truncated p=0.9 RBO folds the two tiny rank lists driver-
    side via each common doc's max-rank threshold."""
    lex = _bm25_topk(sf_dir, k=50)
    lex_rank = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}
    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    query = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    vec = ann.brute_force_topk(ds, query, k=50)
    vec_rank = {int(v): int(r)
                for v, r in zip(vec["vec_id"], vec["rank"])}
    common = set(lex_rank) & set(vec_rank)
    m = np.array(sorted(max(lex_rank[i], vec_rank[i])
                        for i in common), dtype=np.int64)
    depth = np.arange(1, 51, dtype=np.int64)
    ov = np.searchsorted(m, depth, side="right").astype(np.float64)
    rbo = (1.0 - 0.9) / 0.9 * float(
        (ov * 1.0 / depth * np.power(0.9, depth.astype(np.float64)))
        .sum())
    return pd.DataFrame({
        "n_common": np.array([len(common)], np.int64),
        "rbo_50": [float(textstats.round_half_away(
            np.array([rbo]), 6)[0])]})


_PACF_CK = "\n".join(f"""
c{k} AS (SELECT CAST(SUM(a.v * b.v) AS BIGINT) AS sxy,
                CAST(SUM(a.v) AS BIGINT) AS sh,
                CAST(SUM(b.v) AS BIGINT) AS st,
                CAST(COUNT(*) AS BIGINT) AS np
         FROM x a JOIN x b ON b.i = a.i + {k}),""" for k in (1, 2, 3))

_PACF_SQL = f"""
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
x AS (SELECT g.i AS i, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS v
      FROM generate_series(0, 4000) g(i)
      CROSS JOIN sp
      LEFT JOIN (SELECT day - (SELECT MIN(day) FROM d) AS i, cnt
                 FROM d) o ON o.i = g.i
      WHERE g.i <= sp.d1 - sp.d0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS q FROM x),
{_PACF_CK}
rr AS (SELECT
  (c1.sxy - (CAST(m.s AS DOUBLE) / m.n) * (c1.sh + c1.st)
   + c1.np * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n))
  / (m.q - 2 * (CAST(m.s AS DOUBLE) / m.n) * m.s
     + m.n * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n)) AS r1,
  (c2.sxy - (CAST(m.s AS DOUBLE) / m.n) * (c2.sh + c2.st)
   + c2.np * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n))
  / (m.q - 2 * (CAST(m.s AS DOUBLE) / m.n) * m.s
     + m.n * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n)) AS r2,
  (c3.sxy - (CAST(m.s AS DOUBLE) / m.n) * (c3.sh + c3.st)
   + c3.np * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n))
  / (m.q - 2 * (CAST(m.s AS DOUBLE) / m.n) * m.s
     + m.n * (CAST(m.s AS DOUBLE) / m.n)
           * (CAST(m.s AS DOUBLE) / m.n)) AS r3
  FROM m, c1, c2, c3),
dl AS (SELECT r1, r2, r3,
              (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
       FROM rr),
dl2 AS (SELECT r1, r2, r3, phi22,
               r1 - phi22 * r1 AS a1
        FROM dl)
SELECT 1 AS lag, ROUND(r1, 6) AS pacf FROM dl2
UNION ALL SELECT 2, ROUND(phi22, 6) FROM dl2
UNION ALL SELECT 3, ROUND((r3 - a1 * r2 - phi22 * r1)
                          / (1 - a1 * r1 - phi22 * r2), 6) FROM dl2
ORDER BY lag"""


@register("daily_pacf", sql=_PACF_SQL)
def daily_pacf(sf_dir: str) -> pd.DataFrame:
    """PARTIAL autocorrelation of the daily count series at lags 1–3
    via Durbin–Levinson (Box-Jenkins AR-order identification: the
    ACF says lag-2 correlates; the PACF says whether that is a real
    AR(2) term or just lag-1 echoing twice — the cutoff point is the
    AR order to fit). Series is the zero-filled [min_day, max_day]
    calendar window (gaps are true zeros); biased autocovariances
    r_k = c_k/c_0 close from INTEGER moments (Σv, Σv², Σ lag
    products) in the identical expression order on both engines, the
    3-step recursion runs on three scalars."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    cnt = daily["cnt"].to_numpy(np.int64)
    d0 = day.min()
    v = np.zeros(int(day.max() - d0) + 1, dtype=np.int64)
    v[day - d0] = cnt
    n, s, qq = len(v), int(v.sum()), int((v * v).sum())
    mu = float(s) / n
    c0 = qq - 2 * mu * s + n * mu * mu
    r = []
    for k in (1, 2, 3):
        a, b = v[:-k], v[k:]
        sxy = int((a * b).sum())
        num = sxy - mu * (int(a.sum()) + int(b.sum())) \
            + len(a) * mu * mu
        r.append(num / c0)
    r1, r2, r3 = r
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    a1 = r1 - phi22 * r1
    phi33 = (r3 - a1 * r2 - phi22 * r1) / (1 - a1 * r1 - phi22 * r2)
    rd = textstats.round_half_away
    return pd.DataFrame({
        "lag": np.array([1, 2, 3], np.int64),
        "pacf": [float(rd(np.array([x]), 6)[0])
                 for x in (r1, phi22, phi33)]})


@register("second_order_purchase_prob", sql=f"""
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
      FROM sid)
SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n_contexts,
       CAST(SUM(CASE WHEN t3 = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase_next,
       ROUND(SUM(CASE WHEN t3 = 'purchase' THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS p_purchase
FROM w WHERE t3 IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""")
def second_order_purchase_prob(sf_dir: str) -> pd.DataFrame:
    """Second-order next-event prediction: P(next = purchase │ last
    TWO events) for every (t1, t2) context — if rows with the same
    t2 but different t1 disagree, the process is genuinely order-2
    and a first-order Markov model (the transition-matrix queries)
    under-predicts; this is the conditional-probability table a
    next-best-action ranker reads. Same ONE bucket-local
    sessionize+slide pass as the trigram motif query (seam windows
    survive block splits); only ≤|types|² context partials
    shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def contexts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        n = len(g)
        if n < 3:
            return pd.DataFrame(
                {"t1": pd.Series([], object),
                 "t2": pd.Series([], object),
                 "n_contexts": pd.Series([], dtype=np.int64),
                 "n_purchase_next": pd.Series([], dtype=np.int64)})
        cont = np.zeros(n, bool)
        cont[1:] = (uid[1:] == uid[:-1]) \
            & ((us[1:] - us[:-1]) < 1_800_000_000)
        ok = cont[1:-1] & cont[2:]
        i = np.flatnonzero(ok)
        d = pd.DataFrame({
            "t1": et[i], "t2": et[i + 1],
            "n_contexts": np.ones(len(i), np.int64),
            "n_purchase_next": (et[i + 2] == "purchase")
            .astype(np.int64)})
        return d.groupby(["t1", "t2"], sort=False, as_index=False) \
            .sum()

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(contexts,
                                       batch_format="pandas"),
        ["t1", "t2"], {"n_contexts": ("n_contexts", "sum"),
                       "n_purchase_next": ("n_purchase_next", "sum")}) \
        .to_pandas().sort_values(["t1", "t2"], ignore_index=True)
    out = out.astype({"n_contexts": np.int64,
                      "n_purchase_next": np.int64})
    out["p_purchase"] = textstats.round_half_away(
        out["n_purchase_next"].to_numpy(np.float64)
        / out["n_contexts"].to_numpy(np.float64), 6)
    return out


@register("volatility_clustering_acf", sql="""
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
x AS (SELECT g.i AS i, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS v
      FROM generate_series(0, 4000) g(i)
      CROSS JOIN sp
      LEFT JOIN (SELECT day - (SELECT MIN(day) FROM d) AS i, cnt
                 FROM d) o ON o.i = g.i
      WHERE g.i <= sp.d1 - sp.d0),
a AS (SELECT x.i - 1 AS i, ABS(x.v - p.v) AS v
      FROM x JOIN x p ON p.i = x.i - 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS q FROM a),
c1 AS (SELECT CAST(SUM(l.v * r.v) AS BIGINT) AS sxy,
              CAST(SUM(l.v) AS BIGINT) AS sh,
              CAST(SUM(r.v) AS BIGINT) AS st,
              CAST(COUNT(*) AS BIGINT) AS np
       FROM a l JOIN a r ON r.i = l.i + 1)
SELECT m.n AS n_changes,
       ROUND((c1.sxy - (CAST(m.s AS DOUBLE) / m.n) * (c1.sh + c1.st)
              + c1.np * (CAST(m.s AS DOUBLE) / m.n)
                      * (CAST(m.s AS DOUBLE) / m.n))
             / (m.q - 2 * (CAST(m.s AS DOUBLE) / m.n) * m.s
                + m.n * (CAST(m.s AS DOUBLE) / m.n)
                      * (CAST(m.s AS DOUBLE) / m.n)), 6)
           AS abs_change_acf1
FROM m, c1""")
def volatility_clustering_acf(sf_dir: str) -> pd.DataFrame:
    """Volatility clustering test: lag-1 autocorrelation of the
    ABSOLUTE day-over-day count changes — the plain ACF can be flat
    while |Δ| is autocorrelated (turbulent days follow turbulent
    days: the ARCH effect), which decides whether capacity planning
    can use a constant error band or needs a volatility model. Same
    zero-filled calendar window and integer-moment biased-ACF
    expression as daily_pacf, applied to the |Δ| series; only the
    O(days) daily reduce is distributed."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    cnt = daily["cnt"].to_numpy(np.int64)
    d0 = day.min()
    v = np.zeros(int(day.max() - d0) + 1, dtype=np.int64)
    v[day - d0] = cnt
    a = np.abs(np.diff(v))
    n, s, qq = len(a), int(a.sum()), int((a * a).sum())
    mu = float(s) / n
    c0 = qq - 2 * mu * s + n * mu * mu
    l, rr = a[:-1], a[1:]
    sxy = int((l * rr).sum())
    num = sxy - mu * (int(l.sum()) + int(rr.sum())) + len(l) * mu * mu
    return pd.DataFrame({
        "n_changes": np.array([n], np.int64),
        "abs_change_acf1": [float(textstats.round_half_away(
            np.array([num / c0]), 6)[0])]})


@register("unit_price_consistency", sql="""
WITH l AS (SELECT l_partkey AS p,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep,
                  CAST(l_quantity AS BIGINT) AS q
           FROM lineitem WHERE l_quantity > 0),
r AS (SELECT p, ep // gcd(ep, q) AS num, q // gcd(ep, q) AS den
      FROM l),
g AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(DISTINCT (num, den)) AS BIGINT) AS n_prices
      FROM r GROUP BY p)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN n_prices > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS inconsistent_parts,
       ROUND(SUM(CASE WHEN n_prices > 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS inconsistent_share,
       CAST(MAX(n_prices) AS BIGINT) AS max_prices_per_part
FROM g""")
def unit_price_consistency(sf_dir: str) -> pd.DataFrame:
    """Unit-price consistency audit: does the same part always sell
    at one unit price? Each line's unit price is the EXACT rational
    extendedprice/quantity kept as a gcd-REDUCED integer fraction —
    no float division can ever alias two prices that differ in the
    12th decimal or split one that doesn't (the failure mode of a
    ROUND(ep/qty, k) audit). Fractions reduce map-side (vectorized
    np.gcd); the per-part distinct count is the exact two-phase
    distinct; four global scalars close it."""
    def frac(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.int64)
        keep = q > 0
        ep = np.rint(df["l_extendedprice"].to_numpy(np.float64)
                     * 100).astype(np.int64)[keep]
        q = q[keep]
        g = np.gcd(ep, q)
        return pd.DataFrame({
            "p": df["l_partkey"].to_numpy(np.int64)[keep],
            "num": ep // g, "den": q // g})

    per_part = distinct_count(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice",
                                 "l_quantity"])
        .map_batches(frac, batch_format="pandas")
        .map_batches(lambda df: df.assign(
            price=df["num"].astype(str) + "/" + df["den"].astype(str)),
            batch_format="pandas"),
        ["p"], "price", alias="n_prices")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        np_ = df["n_prices"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_parts": [np.int64(len(df))],
            "inconsistent": [np.int64((np_ > 1).sum())],
            "max_prices": [np.int64(np_.max()) if len(df)
                           else np.int64(0)]})

    t = per_part.map_batches(fold, batch_format="pandas").to_pandas()
    n_parts = int(t["n_parts"].sum())
    inc = int(t["inconsistent"].sum())
    mx = int(t["max_prices"].max())
    return pd.DataFrame({
        "n_parts": np.array([n_parts], np.int64),
        "inconsistent_parts": np.array([inc], np.int64),
        "inconsistent_share": [float(textstats.round_half_away(
            np.array([inc * 1.0 / n_parts]), 6)[0])],
        "max_prices_per_part": np.array([mx], np.int64)})


@register("chars_per_token_by_lang", sql=r"""
WITH d AS (SELECT lang,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                      AS x,
                  CAST(n_chars AS BIGINT) AS y
           FROM documents),
m AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM d GROUP BY lang)
SELECT lang, n AS n_docs,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
           AS chars_per_token,
       ROUND(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
           AS r2
FROM m ORDER BY lang""")
def chars_per_token_by_lang(sf_dir: str) -> pd.DataFrame:
    """Tokenizer-cost planner: the OLS chars-per-token slope and R²
    per language — the conversion factor that turns a byte budget
    into a token budget (and the R² says whether one linear factor
    is safe per language, or the corpus mixes scripts the tokenizer
    fragments). x = whitespace tokens (the shared TOKEN_RX
    convention), y = the n_chars column; per-lang INTEGER moments
    reduce once, two rounded divisions close slope and fit."""
    def feats(batch: pa.Table) -> pd.DataFrame:
        x = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        y = batch["n_chars"].to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                          "n": np.ones(len(x), np.int64),
                          "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x, "syy": y * y})
        return d.groupby("lang", as_index=False).sum()

    m = reduce_sink(
        _docs(sf_dir, ["lang", "text", "n_chars"])
        .map_batches(feats, batch_format="pyarrow"),
        ["lang"], {k: (k, "sum")
                   for k in ("n", "sx", "sy", "sxy", "sxx", "syy")}) \
        .to_pandas().sort_values("lang", ignore_index=True)
    n = m["n"].to_numpy(np.int64)
    sx, sy = m["sx"].to_numpy(np.int64), m["sy"].to_numpy(np.int64)
    sxy = m["sxy"].to_numpy(np.int64)
    sxx, syy = m["sxx"].to_numpy(np.int64), m["syy"].to_numpy(np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    vx = (n * sxx - sx * sx).astype(np.float64)
    vy = (n * syy - sy * sy).astype(np.float64)
    r = textstats.round_half_away
    return pd.DataFrame({"lang": m["lang"],
                         "n_docs": n.astype(np.int64),
                         "chars_per_token": r(num / vx, 6),
                         "r2": r((num * num) / (vx * vy), 6)})


@register("neyman_allocation_by_type", sql="""
WITH v AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
      FROM v GROUP BY event_type),
w AS (SELECT event_type, n,
             CAST(ROUND(sqrt(CAST(n * q - s * s AS DOUBLE)), 0)
                  AS BIGINT) AS wt
      FROM m),
t AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w),
a AS (SELECT event_type, n, wt,
             CAST((1000 * wt) // tw AS BIGINT) AS fl,
             CAST((1000 * wt) % tw AS BIGINT) AS rem
      FROM w, t),
k AS (SELECT CAST(1000 - SUM(fl) AS BIGINT) AS extra FROM a),
r AS (SELECT event_type, n, wt, fl, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rn
      FROM a)
SELECT event_type, n AS n_events, wt AS weight,
       CAST(fl + CASE WHEN rn <= k.extra THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r, k ORDER BY event_type""")
def neyman_allocation_by_type(sf_dir: str) -> pd.DataFrame:
    """Neyman-optimal stratified sampling allocation: split a
    1000-row sample budget across event types ∝ N_h·σ_h (minimum-
    variance stratification — proportional allocation oversamples
    big LOW-variance strata; Neyman sends the budget where the
    variance is). N_h σ_h = √(n·Σc² − (Σc)²) from one integer
    cell-moment reduce, rounded HALF-AWAY to an integer weight so
    the Hamilton largest-remainder apportionment (shared convention
    with proportional_seat_allocation) runs in EXACT integer
    arithmetic — the allocation sums to precisely 1000 and no float
    boundary can flip a seat between engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, grp in df.groupby("event_type", sort=False):
            c = grp["c"].to_numpy(np.int64).astype(object)
            hi, lo = divmod(int((c * c).sum()), 1 << 62)
            out.append((g, len(c), int(c.sum()), hi, lo))
        return pd.DataFrame(out, columns=["event_type", "n", "s",
                                          "q_hi", "q_lo"])

    m = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas")
        .map_batches(moments, batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"), "s": ("s", "sum"),
                         "q_hi": ("q_hi", "sum"),
                         "q_lo": ("q_lo", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    n = m["n"].to_numpy(np.int64)
    s = [int(v) for v in m["s"]]
    qq = [int(h) * (1 << 62) + int(l)
          for h, l in zip(m["q_hi"], m["q_lo"])]
    wt = np.array([int(textstats.round_half_away(
        np.array([np.sqrt(float(int(nn) * q - ss * ss))]), 0)[0])
        for nn, ss, q in zip(n, s, qq)], dtype=np.int64)
    tw = int(wt.sum())
    fl = (1000 * wt) // tw
    rem = (1000 * wt) % tw
    extra = 1000 - int(fl.sum())
    order = np.lexsort((m["event_type"].to_numpy(object), -rem))
    bonus = np.zeros(len(m), np.int64)
    bonus[order[:extra]] = 1
    return pd.DataFrame({"event_type": m["event_type"],
                         "n_events": n.astype(np.int64),
                         "weight": wt,
                         "alloc": (fl + bonus).astype(np.int64)})


@register("label_silhouette_mean", sql="""
WITH pts AS (SELECT vec_id, CAST(label AS BIGINT) AS lab,
                    CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
pd_ AS (SELECT a.vec_id AS i, a.lab AS la, b.lab AS lb,
               list_distance(a.v, b.v) AS d
        FROM pts a JOIN pts b ON a.vec_id != b.vec_id),
agg AS (SELECT i, la, lb, SUM(d) AS sd, COUNT(*) AS c
        FROM pd_ GROUP BY i, la, lb),
ab AS (SELECT i, la,
              MAX(CASE WHEN lb = la THEN sd / c END) AS a,
              MIN(CASE WHEN lb != la THEN sd / c END) AS b
       FROM agg GROUP BY i, la),
s AS (SELECT CASE WHEN a IS NULL THEN 0.0
                  ELSE (b - a) / GREATEST(a, b) END AS sil
      FROM ab)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(SUM(sil) / COUNT(*), 6) AS mean_silhouette
FROM s""")
def label_silhouette_mean(sf_dir: str) -> pd.DataFrame:
    """Mean silhouette of the TRUE labels in embedding space
    (Rousseeuw 1987): s = (b−a)/max(a,b) per point, a = mean
    distance to own label, b = nearest other label's mean — the
    geometry-level answer to 'are these labels even separable?'
    that ARI/confusion (which judge a CLASSIFIER) can't give.
    Broadcast-matrix batches compute chunked distances with
    per-label reduceat sums — each point emits one (Σs) partial;
    singleton labels score 0 by the sklearn convention on both
    engines. The aggregate-only scale path is davies_bouldin_index
    below (no N² work)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label", "embedding"])
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    labs = np.asarray(tbl["label"], dtype=np.int64)
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)
    order = np.argsort(labs, kind="mergesort")
    ids_s, labs_s, mat_s = ids[order], labs[order], mat[order]
    uniq, starts = np.unique(labs_s, return_index=True)
    cnts = np.diff(np.append(starts, len(labs_s)))
    ref = ray.put((ids_s, labs_s, mat_s, uniq, starts, cnts))

    def sil(df: pd.DataFrame) -> pd.DataFrame:
        rids, rlabs, rmat, ulab, st, ct = ray.get(ref)
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        xid = df["vec_id"].to_numpy(np.int64)
        xlab = df["label"].to_numpy(np.int64)
        sums = np.zeros((len(x), len(ulab)))
        for lo in range(0, len(rmat), 1024):
            chunk = rmat[lo:lo + 1024]
            d = np.sqrt(((x[:, None, :] - chunk[None, :, :]) ** 2)
                        .sum(axis=2))
            d[xid[:, None] == rids[lo:lo + 1024][None, :]] = 0.0
            cl = rlabs[lo:lo + 1024]
            cstarts = np.searchsorted(cl, ulab)
            seg = np.zeros((len(x), len(ulab)))
            valid = cstarts < d.shape[1]
            red = np.add.reduceat(d, np.minimum(
                cstarts, d.shape[1] - 1), axis=1)
            # reduceat segments ending before the next start are the
            # per-label sums; labels absent from this chunk get 0
            nxt = np.r_[cstarts[1:], d.shape[1]]
            empty = nxt <= cstarts
            red[:, empty] = 0.0
            seg[:, valid] = red[:, valid]
            sums += seg
        li = np.searchsorted(ulab, xlab)
        n_own = ct[li]
        own = sums[np.arange(len(x)), li]
        a = np.where(n_own > 1, own / np.maximum(n_own - 1, 1),
                     np.nan)
        other = sums / ct[None, :]
        other[np.arange(len(x)), li] = np.inf
        b = other.min(axis=1)
        s = np.where(np.isnan(a), 0.0,
                     (b - a) / np.maximum(a, b))
        return pd.DataFrame({"ssum": [float(s.sum())],
                             "n": [np.int64(len(s))]})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    p = ds.map_batches(sil, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    mean = float(p["ssum"].sum()) / n
    return pd.DataFrame({
        "n_points": np.array([n], np.int64),
        "mean_silhouette": [float(textstats.round_half_away(
            np.array([mean]), 6)[0])]})


@register("davies_bouldin_index", sql="""
WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS x
           FROM embeddings),
cent AS (SELECT label AS clabel, list(m ORDER BY dim) AS cvec
         FROM (SELECT label, dim, SUM(x) / COUNT(*) AS m
               FROM u GROUP BY label, dim) GROUP BY label),
pts AS (SELECT CAST(label AS BIGINT) AS lab,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
sl AS (SELECT p.lab, SUM(list_distance(p.v, c.cvec)) / COUNT(*) AS s
       FROM pts p JOIN cent c ON c.clabel = p.lab GROUP BY p.lab),
cd AS (SELECT CAST(a.clabel AS BIGINT) AS i,
              CAST(b.clabel AS BIGINT) AS j,
              list_distance(a.cvec, b.cvec) AS d
       FROM cent a JOIN cent b ON a.clabel != b.clabel),
rij AS (SELECT cd.i, MAX((si.s + sj.s) / cd.d) AS r
        FROM cd JOIN sl si ON si.lab = cd.i
                JOIN sl sj ON sj.lab = cd.j
        GROUP BY cd.i)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       ROUND(SUM(r) / COUNT(*), 6) AS davies_bouldin
FROM rij""")
def davies_bouldin_index(sf_dir: str) -> pd.DataFrame:
    """Davies–Bouldin index of the true labels — the AGGREGATE-ONLY
    cluster-quality metric (lower = tighter, better-separated): mean
    over clusters of the worst (σᵢ+σⱼ)/‖cᵢ−cⱼ‖ ratio. Everything
    reduces to L centroids + L mean dispersions — per-label
    (sum-vector, count) partials then one broadcast-centroid
    distance pass — so unlike the silhouette there is NO pairwise
    work at any scale; the L² fold runs on L scalars."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        order = np.argsort(lab, kind="mergesort")
        m, lab = m[order], lab[order]
        uniq, starts = np.unique(lab, return_index=True)
        sv = np.add.reduceat(m, starts, axis=0)
        cnt = np.diff(np.append(starts, len(lab)))
        d = m.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uniq, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "s": sv.ravel(), "n": np.repeat(cnt, d).astype(np.int64)})

    agg = reduce_sink(ds.map_batches(sums, batch_format="pandas"),
                      ["label", "dim"],
                      {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .to_pandas()
    agg["m"] = agg["s"] / agg["n"]
    piv = agg.pivot(index="label", columns="dim", values="m") \
        .sort_index()
    labels = piv.index.to_numpy(np.int64)
    C = piv.to_numpy(np.float64)
    c_ref = ray.put((labels, C))

    def disp(df: pd.DataFrame) -> pd.DataFrame:
        labs, cm = ray.get(c_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        li = np.searchsorted(labs, df["label"].to_numpy(np.int64))
        d = np.sqrt(((m - cm[li]) ** 2).sum(axis=1))
        out = pd.DataFrame({"label": labs[li], "sd": d,
                            "n": np.ones(len(d), np.int64)})
        return out.groupby("label", as_index=False).sum()

    sl = reduce_sink(ds.map_batches(disp, batch_format="pandas"),
                     ["label"], {"sd": ("sd", "sum"),
                                 "n": ("n", "sum")}) \
        .to_pandas().sort_values("label", ignore_index=True)
    s = sl["sd"].to_numpy(np.float64) / sl["n"].to_numpy(np.float64)
    L = len(s)
    cd = np.sqrt(((C[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(cd, np.inf)
    r = ((s[:, None] + s[None, :]) / cd).max(axis=1)
    db = float(r.sum()) / L
    return pd.DataFrame({
        "n_clusters": np.array([L], np.int64),
        "davies_bouldin": [float(textstats.round_half_away(
            np.array([db]), 6)[0])]})


@register("knn_label_homophily", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, CAST(a.label AS BIGINT) AS la,
         b.vec_id AS neighbor, CAST(b.label AS BIGINT) AS lb,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, la, lb,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
e AS (SELECT la, lb FROM r WHERE rank <= 2),
lc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nl
       FROM embeddings GROUP BY label),
t AS (SELECT CAST(SUM(nl) AS BIGINT) AS n,
             CAST(SUM(nl * (nl - 1)) AS BIGINT) AS same_pairs
      FROM lc),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
                 AS same_n
      FROM e)
SELECT m.n_edges, m.same_n,
       ROUND(m.same_n * 1.0 / m.n_edges, 6) AS homophily,
       ROUND(t.same_pairs * 1.0 / (t.n * (t.n - 1)), 6) AS expected,
       ROUND((m.same_n * 1.0 / m.n_edges)
             / (t.same_pairs * 1.0 / (t.n * (t.n - 1))), 6) AS lift
FROM m, t""")
def knn_label_homophily(sf_dir: str) -> pd.DataFrame:
    """Label homophily of the exact cosine 2-NN graph: the share of
    edges joining SAME-label points, against the chance rate
    Σ n_l(n_l−1)/(n(n−1)) — lift ≫ 1 is the 'a kNN classifier will
    work here' screen (and the geometric complement of silhouette:
    this reads the GRAPH, that reads distances). Same broadcast
    local-top-k edges as knn_graph; every quantity is an exact
    integer, three rounded divisions close the row."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    labs = pd.Series(np.asarray(tbl["label"], dtype=np.int64),
                     index=ids)
    vecs = np.stack(tbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, vecs, k=3)
    out["node"] = ids[out["query_id"].to_numpy()]
    out = out[out["node"] != out["vec_id"]].copy()
    out = out.sort_values(["node", "rank"], ignore_index=True)
    out["rank"] = (out.groupby("node", sort=False).cumcount() + 1) \
        .astype(np.int64)
    e = out[out["rank"] <= 2]
    la = labs.loc[e["node"].to_numpy()].to_numpy(np.int64)
    lb = labs.loc[e["vec_id"].to_numpy()].to_numpy(np.int64)
    n_edges, same_n = len(e), int((la == lb).sum())
    nl = labs.value_counts().to_numpy(np.int64)
    n = int(nl.sum())
    same_pairs = int((nl * (nl - 1)).sum())
    r = textstats.round_half_away
    hom = same_n * 1.0 / n_edges
    exp = same_pairs * 1.0 / (n * (n - 1))
    return pd.DataFrame({
        "n_edges": np.array([n_edges], np.int64),
        "same_n": np.array([same_n], np.int64),
        "homophily": [float(r(np.array([hom]), 6)[0])],
        "expected": [float(r(np.array([exp]), 6)[0])],
        "lift": [float(r(np.array([hom / exp]), 6)[0])]})


@register("simpson_discount_qty_audit", sql="""
WITH l AS (SELECT p.p_brand AS b,
                  CAST(ROUND(li.l_discount * 100) AS BIGINT) AS x,
                  CAST(li.l_quantity AS BIGINT) AS y
           FROM lineitem li JOIN part p
             ON p.p_partkey = li.l_partkey),
m AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM l GROUP BY b),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy,
             CAST(SUM(sxy) AS BIGINT) AS sxy,
             CAST(SUM(sxx) AS BIGINT) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n_brands,
             SUM(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 AS wnum,
             SUM(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 AS wden
      FROM m)
SELECT n_brands, n AS n_lines,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
           AS slope_overall,
       ROUND(wnum / wden, 6) AS slope_within,
       CAST(CASE WHEN (ROUND((n * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * sy)
                             / (n * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * sx), 6) > 0)
                      != (ROUND(wnum / wden, 6) > 0)
            THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
FROM t""")
def simpson_discount_qty_audit(sf_dir: str) -> pd.DataFrame:
    """Simpson's-paradox audit on the discount→quantity relation:
    the OVERALL OLS slope vs the pooled WITHIN-brand (fixed-effects)
    slope Σ(n·Σxy−ΣxΣy) / Σ(n·Σxx−Σx²) — if the signs disagree,
    brand mix confounds the pricing read and every brand-blind
    elasticity number is wrong-signed. Brand resolves through the
    part join map-side; per-brand INTEGER moments reduce once; the
    flip flag compares the 6dp-ROUNDED slopes so both engines judge
    identical values."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).to_pandas()
    bmap_ref = ray.put(dict(zip(
        part["p_partkey"].to_numpy(np.int64),
        part["p_brand"].astype(str))))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        x = np.rint(df["l_discount"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        y = df["l_quantity"].to_numpy(np.int64)
        d = pd.DataFrame({
            "b": df["l_partkey"].map(bmap),
            "n": np.ones(len(x), np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return d.groupby("b", as_index=False).sum()

    m = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_discount",
                                 "l_quantity"])
        .map_batches(moments, batch_format="pandas"),
        ["b"], {k: (k, "sum")
                for k in ("n", "sx", "sy", "sxy", "sxx")}).to_pandas()
    n_b = m["n"].to_numpy(np.int64)
    sx = m["sx"].to_numpy(np.int64)
    sy = m["sy"].to_numpy(np.int64)
    sxy = m["sxy"].to_numpy(np.int64)
    sxx = m["sxx"].to_numpy(np.int64)
    N = int(n_b.sum())
    SX, SY = int(sx.sum()), int(sy.sum())
    SXY, SXX = int(sxy.sum()), int(sxx.sum())
    so = (N * float(SXY) - float(SX) * SY) \
        / (N * float(SXX) - float(SX) * SX)
    wnum = float((n_b.astype(np.float64) * sxy
                  - sx.astype(np.float64) * sy).sum())
    wden = float((n_b.astype(np.float64) * sxx
                  - sx.astype(np.float64) * sx).sum())
    sw = wnum / wden
    r = textstats.round_half_away
    so_r = float(r(np.array([so]), 6)[0])
    sw_r = float(r(np.array([sw]), 6)[0])
    return pd.DataFrame({
        "n_brands": np.array([len(m)], np.int64),
        "n_lines": np.array([N], np.int64),
        "slope_overall": [so_r],
        "slope_within": [sw_r],
        "sign_flip": np.array([int((so_r > 0) != (sw_r > 0))],
                              np.int64)})


@register("tail_dependence_views_purchases", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                ELSE 0 END) AS BIGINT) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END) AS BIGINT) AS p
           FROM events GROUP BY user_id),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
hv AS (SELECT v, COUNT(*) AS c FROM u GROUP BY v),
cv AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cm FROM hv),
qv AS (SELECT MIN(v) AS q FROM cv, n WHERE 10 * cm >= 9 * n.n),
hp AS (SELECT p, COUNT(*) AS c FROM u GROUP BY p),
cp AS (SELECT p, SUM(c) OVER (ORDER BY p) AS cm FROM hp),
qp AS (SELECT MIN(p) AS q FROM cp, n WHERE 10 * cm >= 9 * n.n),
f AS (SELECT CAST(SUM(CASE WHEN u.p > qp.q THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cond,
             CAST(SUM(CASE WHEN u.p > qp.q AND u.v > qv.q THEN 1
                           ELSE 0 END) AS BIGINT) AS n_joint
      FROM u, qv, qp)
SELECT n.n AS n_users, CAST(qv.q AS BIGINT) AS view_q90,
       CAST(qp.q AS BIGINT) AS purchase_q90,
       f.n_cond, f.n_joint,
       CASE WHEN f.n_cond = 0 THEN 0.0
            ELSE ROUND(f.n_joint * 1.0 / f.n_cond, 6) END AS lambda_u
FROM n, qv, qp, f""")
def tail_dependence_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Upper-tail dependence between per-user view and purchase
    counts: λ_U = P(views > q90_v │ purchases > q90_p) — correlation
    says heavy viewers buy more ON AVERAGE; this asks whether the
    EXTREMES coincide (the copula question behind 'target the top
    decile'): λ_U ≈ 0.1 means the tails are nearly independent and
    top-decile viewers are the wrong purchase-whale proxy. One
    user-grain reduce; exact lower-convention integer q90 cuts off
    the count histograms (10·cum ≥ 9·n); strict > on both sides;
    every figure an integer until one guarded division."""
    u = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "v": (df["event_type"] == "view").to_numpy()
                .astype(np.int64),
                "p": (df["event_type"] == "purchase").to_numpy()
                .astype(np.int64)}), batch_format="pandas"),
        ["user_id"], {"v": ("v", "sum"), "p": ("p", "sum")}) \
        .to_pandas()
    n = len(u)

    def q90(x: np.ndarray) -> int:
        vals, cnts = np.unique(x, return_counts=True)
        cm = np.cumsum(cnts)
        return int(vals[np.searchsorted(10 * cm, 9 * n, side="left")])

    v = u["v"].to_numpy(np.int64)
    p = u["p"].to_numpy(np.int64)
    qv, qp = q90(v), q90(p)
    n_cond = int((p > qp).sum())
    n_joint = int(((p > qp) & (v > qv)).sum())
    lam = 0.0 if n_cond == 0 else float(textstats.round_half_away(
        np.array([n_joint * 1.0 / n_cond]), 6)[0])
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "view_q90": np.array([qv], np.int64),
        "purchase_q90": np.array([qp], np.int64),
        "n_cond": np.array([n_cond], np.int64),
        "n_joint": np.array([n_joint], np.int64),
        "lambda_u": [lam]})


_SEMIVAR_CK = "\nUNION ALL ".join(f"""
SELECT {k} AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS ssq,
       ROUND(SUM((a.v - b.v) * (a.v - b.v)) * 1.0 / (2 * COUNT(*)), 4)
           AS gamma
FROM x a JOIN x b ON b.i = a.i + {k}""" for k in range(1, 8))


@register("daily_semivariogram", sql=f"""
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
x AS (SELECT g.i AS i, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS v
      FROM generate_series(0, 4000) g(i)
      CROSS JOIN sp
      LEFT JOIN (SELECT day - (SELECT MIN(day) FROM d) AS i, cnt
                 FROM d) o ON o.i = g.i
      WHERE g.i <= sp.d1 - sp.d0)
{_SEMIVAR_CK}
ORDER BY lag""")
def daily_semivariogram(sf_dir: str) -> pd.DataFrame:
    """Semivariogram of the daily count series at lags 1–7:
    γ(k) = Σ(x_{{t+k}}−x_t)² / 2n_k — the geostatistics view of
    temporal structure (read the RANGE where γ plateaus = how many
    days apart two counts stop informing each other, and the lag-7
    dip = weekly periodicity). Unlike the ACF it needs NO mean
    estimate, so every sum is an exact INTEGER and only the final
    division rounds; the O(days) daily reduce is the only
    distributed work."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame(
            {"day": df["ts"].to_numpy().astype("datetime64[D]")
             .astype(np.int64)}), batch_format="pandas"),
        ["day"], {"cnt": ("day", "size")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    cnt = daily["cnt"].to_numpy(np.int64)
    d0 = day.min()
    v = np.zeros(int(day.max() - d0) + 1, dtype=np.int64)
    v[day - d0] = cnt
    rows = []
    for k in range(1, 8):
        d2 = (v[k:] - v[:-k]).astype(object)
        ssq = int((d2 * d2).sum())
        npair = len(v) - k
        rows.append((k, npair, ssq, float(textstats.round_half_away(
            np.array([ssq * 1.0 / (2 * npair)]), 4)[0])))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "ssq",
                                       "gamma"]) \
        .astype({"lag": np.int64, "n_pairs": np.int64,
                 "ssq": np.int64})


@register("gibrat_growth_test", sql="""
WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d
           FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
u AS (SELECT user_id,
             CAST(SUM(CASE WHEN d < cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN d >= cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM b, sp GROUP BY user_id),
l AS (SELECT LN(CAST(x AS DOUBLE)) AS lx, LN(CAST(y AS DOUBLE)) AS ly
      FROM u WHERE x > 0 AND y > 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(lx) AS sx,
             SUM(ly) AS sy, SUM(lx * ly) AS sxy,
             SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy
      FROM l)
SELECT n AS n_users,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           AS gibrat_slope,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m""")
def gibrat_growth_test(sf_dir: str) -> pd.DataFrame:
    """Gibrat's-law test on user activity: OLS of ln(second-half
    events) on ln(first-half events) over users active in BOTH
    halves — slope 1 means growth is proportional to size (the
    rich-get-richer null every 'power users are pulling away' claim
    must beat); slope < 1 is mean reversion (big users cool off).
    Period split shared with ltv_quartile_mobility; one user-grain
    keyed reduce, then float log moments whose ln() inputs are
    identical integers on both engines; 6dp on the O(1) slope."""
    ds = _events(sf_dir, ["user_id", "ts"])
    span = ds.map_batches(
        lambda df: pd.DataFrame({
            "lo": [df["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).min() // 86_400_000_000],
            "hi": [df["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).max() // 86_400_000_000]}),
        batch_format="pandas").to_pandas()
    cut = (int(span["lo"].min()) + int(span["hi"].max()) + 1) // 2

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        pre = d < cut
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "x": pre.astype(np.int64),
            "y": (~pre).astype(np.int64)})

    u = reduce_sink(ds.map_batches(xy, batch_format="pandas"),
                    ["user_id"], {"x": ("x", "sum"),
                                  "y": ("y", "sum")})

    def logm(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        keep = (x > 0) & (y > 0)
        lx = np.log(x[keep].astype(np.float64))
        ly = np.log(y[keep].astype(np.float64))
        return pd.DataFrame({
            "n": [np.int64(keep.sum())], "sx": [float(lx.sum())],
            "sy": [float(ly.sum())], "sxy": [float((lx * ly).sum())],
            "sxx": [float((lx * lx).sum())],
            "syy": [float((ly * ly).sum())]})

    p = u.map_batches(logm, batch_format="pandas").to_pandas().sum()
    n = int(p["n"])
    sx, sy, sxy, sxx, syy = (float(p[k]) for k in
                             ("sx", "sy", "sxy", "sxx", "syy"))
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "gibrat_slope": [float(r(np.array([num / vx]), 6)[0])],
        "r2": [float(r(np.array([(num * num) / (vx * vy)]), 6)[0])]})


@register("self_excitation_screen", sql="""
WITH g AS (SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER (
               ORDER BY ts, event_id)) AS gap_us
           FROM events),
t AS (SELECT CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
                 AS span_us,
             CAST(COUNT(*) AS BIGINT) AS n FROM events),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(CASE WHEN gap_us < 60000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_short
      FROM g WHERE gap_us IS NOT NULL)
SELECT m.n_gaps, m.n_short,
       ROUND(m.n_short * 1.0 / m.n_gaps, 6) AS short_share,
       ROUND(1.0 - exp(-(CAST(t.n - 1 AS DOUBLE)
                         / (CAST(t.span_us AS DOUBLE) / 1000000))
                       * 60.0), 6) AS poisson_share,
       ROUND((m.n_short * 1.0 / m.n_gaps)
             / (1.0 - exp(-(CAST(t.n - 1 AS DOUBLE)
                            / (CAST(t.span_us AS DOUBLE) / 1000000))
                          * 60.0)), 6) AS excess_ratio
FROM m, t""")
def self_excitation_screen(sf_dir: str) -> pd.DataFrame:
    """Self-excitation (Hawkes) screen on the GLOBAL arrival stream:
    the observed share of inter-event gaps under 60 s against the
    Poisson null 1−e^(−λ·60) at the same overall rate — an excess
    ratio ≫ 1 means events trigger events (retry storms, cascades)
    and capacity sized to the average rate WILL saturate. The total
    order lives in time buckets: gaps compute bucket-locally and the
    seam gap between adjacent buckets reconstructs from O(buckets)
    (first_ts, last_ts, n) metadata rows — the longest_quiet_gap
    partition pattern — so no global sort ever runs; integers in,
    two identical float expressions out."""
    ds = _events(sf_dir, ["event_id", "ts"])
    bucket_us = 3_600_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "us": us, "event_id": df["event_id"].to_numpy(np.int64),
            "bucket_": (us // bucket_us).astype(np.int64)})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        us = g["us"].to_numpy(np.int64)
        gap = us[1:] - us[:-1]
        return pd.DataFrame({
            "bucket": [np.int64(g["bucket_"].iloc[0])],
            "n": [np.int64(len(us))],
            "first_us": [np.int64(us[0])],
            "last_us": [np.int64(us[-1])],
            "n_short": [np.int64((gap < 60_000_000).sum())],
            "n_gaps": [np.int64(len(gap))]})

    meta = (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_").map_groups(local,
                                           batch_format="pandas")) \
        .to_pandas().sort_values("bucket", ignore_index=True)
    # seam gaps between adjacent buckets (buckets are disjoint time
    # ranges, so the seam gap is last_of_prev -> first_of_next)
    seam = meta["first_us"].to_numpy(np.int64)[1:] \
        - meta["last_us"].to_numpy(np.int64)[:-1]
    n_short = int(meta["n_short"].sum()) \
        + int((seam < 60_000_000).sum())
    n_gaps = int(meta["n_gaps"].sum()) + len(seam)
    n = int(meta["n"].sum())
    span_us = int(meta["last_us"].max() - meta["first_us"].min())
    lam = float(n - 1) / (float(span_us) / 1_000_000)
    poisson = 1.0 - np.exp(-lam * 60.0)
    share = n_short * 1.0 / n_gaps
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n_gaps], np.int64),
        "n_short": np.array([n_short], np.int64),
        "short_share": [float(r(np.array([share]), 6)[0])],
        "poisson_share": [float(r(np.array([poisson]), 6)[0])],
        "excess_ratio": [float(r(np.array([share / poisson]),
                                 6)[0])]})


@register("sentence_dup_rate", sql="""
WITH s AS (SELECT trim(u.s, ' ') AS sent
           FROM documents,
                unnest(string_split_regex(text, '[.!?]')) u(s)),
k AS (SELECT md5(sent) AS fp FROM s
      WHERE length(sent) >= 20),
g AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY fp)
SELECT CAST(SUM(n) AS BIGINT) AS n_sentences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS repeated_groups,
       ROUND(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) * 1.0 / SUM(n),
             6) AS repeated_share
FROM g""")
def sentence_dup_rate(sf_dir: str) -> pd.DataFrame:
    """SENTENCE-grain duplicate rate: split every document on
    [.!?], keep trimmed sentences ≥ 20 chars, fingerprint, count
    repeats — document-level dedup misses the boilerplate case
    (the same disclaimer sentence in 10 000 otherwise-unique pages),
    and repeated_share is the first number a C4-style sentence-dedup
    pass would report. Sentences fingerprint map-side (md5 — the
    oracle's function, only hashes shuffle); one keyed reduce plus a
    scalar fold."""
    import hashlib

    def fps(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("").str.split(r"[.!?]", regex=True) \
            .explode().str.strip(" ")
        s = s[s.str.len() >= 20]
        return pd.DataFrame({
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in s],
            "n": np.ones(len(s), np.int64)})

    g = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(fps,
                                            batch_format="pandas"),
        ["fp"], {"n": ("n", "sum")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        rep = n > 1
        return pd.DataFrame({
            "n_sentences": [np.int64(n.sum())],
            "n_distinct": [np.int64(len(n))],
            "repeated_groups": [np.int64(rep.sum())],
            "repeated_sent": [np.int64(n[rep].sum())]})

    t = g.map_batches(fold, batch_format="pandas").to_pandas().sum()
    ns = int(t["n_sentences"])
    return pd.DataFrame({
        "n_sentences": np.array([ns], np.int64),
        "n_distinct": np.array([int(t["n_distinct"])], np.int64),
        "repeated_groups": np.array([int(t["repeated_groups"])],
                                    np.int64),
        "repeated_share": [float(textstats.round_half_away(
            np.array([int(t["repeated_sent"]) * 1.0 / ns]), 6)[0])]})


@register("order_shipment_fragmentation", sql="""
WITH f AS (SELECT l_orderkey AS k,
                  CAST(COUNT(*) AS BIGINT) AS n_lines,
                  CAST(COUNT(DISTINCT l_shipdate) AS BIGINT)
                      AS n_ship_days
           FROM lineitem GROUP BY l_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN n_ship_days = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS single_batch,
       ROUND(SUM(CASE WHEN n_ship_days = 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS single_batch_share,
       ROUND(SUM(n_ship_days) * 1.0 / COUNT(*), 4)
           AS mean_shipments,
       CAST(MAX(n_ship_days) AS BIGINT) AS max_shipments
FROM f""")
def order_shipment_fragmentation(sf_dir: str) -> pd.DataFrame:
    """Shipment fragmentation: of multi-line orders' line items, how
    many distinct ship DATES does an order use? single_batch_share
    near 1 means the warehouse consolidates (one box); a high mean
    means customers get a dribble of partial shipments — the
    fulfillment-cost and experience read neither the lag quantiles
    nor the SLA table give. Per-order distinct ship-days is the
    exact two-phase distinct; the scalar fold never moves rows."""
    per = distinct_count(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_shipdate"])
        .map_batches(lambda df: pd.DataFrame({
            "k": df["l_orderkey"].to_numpy(np.int64),
            "sd": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000}),
            batch_format="pandas"),
        ["k"], "sd", alias="n_ship_days")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        nd = df["n_ship_days"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_orders": [np.int64(len(nd))],
            "single": [np.int64((nd == 1).sum())],
            "ship_sum": [np.int64(nd.sum())],
            "ship_max": [np.int64(nd.max()) if len(nd)
                         else np.int64(0)]})

    t = per.map_batches(fold, batch_format="pandas").to_pandas()
    n = int(t["n_orders"].sum())
    single = int(t["single"].sum())
    ssum = int(t["ship_sum"].sum())
    smax = int(t["ship_max"].max())
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_orders": np.array([n], np.int64),
        "single_batch": np.array([single], np.int64),
        "single_batch_share": [float(r(np.array([single * 1.0 / n]),
                                       6)[0])],
        "mean_shipments": [float(r(np.array([ssum * 1.0 / n]),
                                   4)[0])],
        "max_shipments": np.array([smax], np.int64)})


@register("abc_part_classification", sql="""
WITH r AS (SELECT l_partkey AS p,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM r),
w AS (SELECT p, rev,
             CAST(COALESCE(SUM(rev) OVER (
                 ORDER BY rev DESC, p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS cum_prev
      FROM r),
c AS (SELECT CASE WHEN 100 * cum_prev < 80 * t.tot THEN 'A'
                  WHEN 100 * cum_prev < 95 * t.tot THEN 'B'
                  ELSE 'C' END AS abc, rev
      FROM w, t)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       ROUND(SUM(rev) * 1.0 / MAX(t.tot), 6) AS revenue_share
FROM c, t GROUP BY abc ORDER BY abc""")
def abc_part_classification(sf_dir: str) -> pd.DataFrame:
    """ABC inventory classification of parts by revenue (the 80/15/5
    Pareto cut every warehouse runs): class A = parts whose
    cumulative revenue prefix sits under 80% of total, B under 95%,
    C the tail — the boundary is decided by the EXCLUSIVE prefix in
    integer cross-multiplication (100·cum_prev < 80·total), so no
    float share can flip a part's class between engines; ties pinned
    by (revenue desc, partkey). The heavy fact folds to one per-part
    reduce; the classification runs on that aggregate."""
    per = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice"])
        .map_batches(lambda df: pd.DataFrame({
            "p": df["l_partkey"].to_numpy(np.int64),
            "rev": np.rint(df["l_extendedprice"]
                           .to_numpy(np.float64) * 100)
            .astype(np.int64)}), batch_format="pandas"),
        ["p"], {"rev": ("rev", "sum")}).to_pandas()
    per = per.sort_values(["rev", "p"], ascending=[False, True],
                          ignore_index=True)
    rev = np.array([int(v) for v in per["rev"]], dtype=object)
    tot = int(rev.sum())
    cum_prev = np.concatenate(([0], np.cumsum(rev)[:-1]))
    abc = np.where(100 * cum_prev < 80 * tot, "A",
                   np.where(100 * cum_prev < 95 * tot, "B", "C"))
    out = pd.DataFrame({"abc": abc, "rev": per["rev"]
                        .to_numpy(np.int64)}) \
        .groupby("abc", as_index=False).agg(
        n_parts=("rev", "size"), revenue_cents=("rev", "sum"))
    out["revenue_share"] = textstats.round_half_away(
        out["revenue_cents"].to_numpy(np.float64) / float(tot), 6)
    return out.astype({"n_parts": np.int64,
                       "revenue_cents": np.int64}) \
        .sort_values("abc", ignore_index=True)


#: anchored BEFORE the earliest fixture date so day indices stay
#: non-negative — DuckDB's // truncates toward zero while numpy's
#: floors, so negative day indices would silently diverge
_FISCAL_ANCHOR = "1995-01-01"


@register("fiscal_445_revenue", sql=f"""
WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000
                  - epoch_us(TIMESTAMP '{_FISCAL_ANCHOR}')
                    // 86400000000 AS di,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
f AS (SELECT CAST(di // 364 AS BIGINT) AS fy,
             CAST(di % 364 AS BIGINT) AS pos, c
      FROM o),
p AS (SELECT fy,
             CAST(3 * (pos // 91)
                  + CASE WHEN pos % 91 < 28 THEN 0
                         WHEN pos % 91 < 56 THEN 1 ELSE 2 END
                  + 1 AS BIGINT) AS period, c
      FROM f)
SELECT fy AS fiscal_year, period AS fiscal_period,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(c) AS BIGINT) AS revenue_cents
FROM p GROUP BY 1, 2 ORDER BY 1, 2""")
def fiscal_445_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue rolled up to a 4-4-5 FISCAL calendar (the retail
    reporting standard: every period holds whole weeks so same-period
    comparisons aren't distorted by weekday mix — the distortion a
    Gregorian month rollup bakes in). Pure integer day arithmetic
    anchored at 1995-01-01 (before every fixture date, keeping day
    indices non-negative — DuckDB // truncates, numpy floors, and
    negatives would diverge): 364-day fiscal years, 91-day quarters
    split 28/28/35 — identical expressions on both engines; one
    (year, period) keyed reduce is all that shuffles."""
    anchor = np.datetime64(_FISCAL_ANCHOR, "D").astype(np.int64)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        di = (df["o_orderdate"].to_numpy("datetime64[us]")
              .astype(np.int64) // 86_400_000_000) - anchor
        fy = di // 364
        pos = di % 364
        q = pos // 91
        qpos = pos % 91
        period = 3 * q + np.where(qpos < 28, 0,
                                  np.where(qpos < 56, 1, 2)) + 1
        return pd.DataFrame({
            "fiscal_year": fy.astype(np.int64),
            "fiscal_period": period.astype(np.int64),
            "n_orders": np.ones(len(di), np.int64),
            "revenue_cents": np.rint(
                df["o_totalprice"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    return reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["fiscal_year", "fiscal_period"],
        {"n_orders": ("n_orders", "sum"),
         "revenue_cents": ("revenue_cents", "sum")}).to_pandas() \
        .astype({"fiscal_year": np.int64, "fiscal_period": np.int64,
                 "n_orders": np.int64, "revenue_cents": np.int64}) \
        .sort_values(["fiscal_year", "fiscal_period"],
                     ignore_index=True)


@register("growth_accounting_daily", sql="""
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events),
f AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY user_id),
s AS (SELECT ud.user_id, ud.d, f.first_d,
             LAG(ud.d) OVER (PARTITION BY ud.user_id ORDER BY ud.d)
                 AS prev_d
      FROM ud JOIN f USING (user_id)),
act AS (SELECT d,
               CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_u,
               CAST(SUM(CASE WHEN d > first_d AND prev_d = d - 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS retained,
               CAST(SUM(CASE WHEN d > first_d AND prev_d < d - 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS resurrected,
               CAST(COUNT(*) AS BIGINT) AS dau
        FROM s GROUP BY d),
ch AS (SELECT d + 1 AS d, CAST(COUNT(*) AS BIGINT) AS was_active
       FROM ud GROUP BY ud.d)
SELECT CAST(act.d AS BIGINT) AS day, act.dau, act.new_u,
       act.retained, act.resurrected,
       CAST(COALESCE(ch.was_active, 0) - act.retained AS BIGINT)
           AS churned,
       CASE WHEN COALESCE(ch.was_active, 0) - act.retained = 0
            THEN 0.0
            ELSE ROUND((act.new_u + act.resurrected) * 1.0
                       / (COALESCE(ch.was_active, 0) - act.retained),
                       4)
       END AS quick_ratio
FROM act LEFT JOIN ch ON ch.d = act.d
ORDER BY day""")
def growth_accounting_daily(sf_dir: str) -> pd.DataFrame:
    """Daily growth accounting (the Social-Capital identity every
    growth team reports): DAU = new + retained + resurrected, next
    to the day's churn (active yesterday, silent today) and the
    quick ratio (new+resurrected)/churned — >1 means the user base
    compounds, <1 means marketing refills a leaky bucket. The
    retention queries give single probabilities; this is the full
    per-day ledger with the identity built in. One (user, day)
    distinct, then per-user LAG classification inside user-hash
    buckets; only ≤days×4 integer partials shuffle."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def ud(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        out = pd.DataFrame({"user_id": df["user_id"]
                            .to_numpy(np.int64), "d": d}) \
            .drop_duplicates()
        out["bucket_"] = (out["user_id"] % 32).astype(np.int32)
        return out

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "d"]) \
            .sort_values(["user_id", "d"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        prev = np.where(same, np.r_[np.int64(0), d[:-1]],
                        np.int64(-(1 << 60)))
        new_u = ~same  # first row of each user run = first-seen day
        retained = same & (prev == d - 1)
        resurrected = same & (prev < d - 1)
        rows = pd.DataFrame({
            "day": d, "dau": np.ones(len(d), np.int64),
            "new_u": new_u.astype(np.int64),
            "retained": retained.astype(np.int64),
            "resurrected": resurrected.astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        # churn needs yesterday's active counts: emit (day+1, active)
        act = pd.DataFrame({"day": d + 1,
                            "was_active": np.ones(len(d), np.int64)}) \
            .groupby("day", as_index=False).sum()
        return rows.merge(act, on="day", how="outer").fillna(0) \
            .astype(np.int64)

    out = reduce_sink(
        ds.map_batches(ud, batch_format="pandas")
        .groupby("bucket_").map_groups(classify,
                                       batch_format="pandas"),
        ["day"], {k: (k, "sum") for k in
                  ("dau", "new_u", "retained", "resurrected",
                   "was_active")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    out = out[out["dau"] > 0].reset_index(drop=True)
    churned = (out["was_active"] - out["retained"]) \
        .to_numpy(np.int64)
    gained = (out["new_u"] + out["resurrected"]).to_numpy(np.int64)
    qr = np.where(churned == 0, 0.0,
                  textstats.round_half_away(
                      gained / np.maximum(churned, 1).astype(
                          np.float64), 4))
    return pd.DataFrame({
        "day": out["day"].astype(np.int64),
        "dau": out["dau"].astype(np.int64),
        "new_u": out["new_u"].astype(np.int64),
        "retained": out["retained"].astype(np.int64),
        "resurrected": out["resurrected"].astype(np.int64),
        "churned": churned,
        "quick_ratio": qr})


@register("user_lifecycle_states", sql="""
WITH ud AS (SELECT user_id,
                   MIN(epoch_us(ts) // 86400000000) AS first_d,
                   MAX(epoch_us(ts) // 86400000000) AS last_d
            FROM events GROUP BY user_id),
mx AS (SELECT MAX(last_d) AS today FROM ud),
st AS (SELECT CASE
         WHEN today - first_d < 7 THEN 'new'
         WHEN today - last_d < 7 THEN 'active'
         WHEN today - last_d < 14 THEN 'at_risk'
         ELSE 'churned' END AS state
       FROM ud, mx)
SELECT state, CAST(COUNT(*) AS BIGINT) AS users
FROM st GROUP BY state ORDER BY state""")
def user_lifecycle_states(sf_dir: str) -> pd.DataFrame:
    """Lifecycle-state snapshot as of the corpus' last day (the CRM
    segmentation every retention play targets): new (< 7 days
    tenure), active (seen this week), at_risk (silent 7–13 days),
    churned (≥ 14 days silent) — tenure beats recency so a brand-new
    user is 'new' even if seen today. One user-grain (min, max)
    keyed reduce; the banding folds four integers."""
    u = reduce_sink(
        _events(sf_dir, ["user_id", "ts"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "first_d": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000,
                "last_d": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000}),
            batch_format="pandas"),
        ["user_id"], {"first_d": ("first_d", "min"),
                      "last_d": ("last_d", "max")}).to_pandas()
    today = int(u["last_d"].max())
    first = u["first_d"].to_numpy(np.int64)
    last = u["last_d"].to_numpy(np.int64)
    state = np.where(today - first < 7, "new",
                     np.where(today - last < 7, "active",
                              np.where(today - last < 14, "at_risk",
                                       "churned")))
    c = pd.Series(state).value_counts().sort_index()
    return pd.DataFrame({"state": c.index.to_numpy(object),
                         "users": c.to_numpy(np.int64)})


@register("invoice_reconciliation_audit", sql="""
WITH l AS (SELECT l_orderkey AS k,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                  * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)) AS u
           FROM lineitem),
s AS (SELECT k, CAST(SUM(u) AS BIGINT) AS line_u FROM l GROUP BY k),
j AS (SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS hdr_c,
             CAST(ROUND(s.line_u / 10000.0) AS BIGINT) AS line_c
      FROM orders o JOIN s ON s.k = o.o_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN line_c = hdr_c THEN 1 ELSE 0 END)
            AS BIGINT) AS exact_match,
       CAST(SUM(CASE WHEN ABS(line_c - hdr_c) <= 1
                          AND line_c != hdr_c THEN 1 ELSE 0 END)
            AS BIGINT) AS off_by_rounding,
       CAST(SUM(CASE WHEN line_c - hdr_c > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS lines_over,
       CAST(SUM(CASE WHEN hdr_c - line_c > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS header_over,
       ROUND(SUM(CASE WHEN line_c = hdr_c THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS match_share
FROM j""")
def invoice_reconciliation_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-fact VALUE reconciliation: recompute every order's
    total from its lines as the EXACT integer
    Σ ep_cents·(100−disc%)·(100+tax%), round once to cents, and
    compare against the header's o_totalprice — the ledger audit
    that catches silent drift between a fact table and its rollup
    (FK audits check existence; this checks the money). Off-by-one
    cents are split out as rounding, larger gaps keep their sign
    (which side overstates). One per-order line reduce + the
    orderkey join; six integers and one division out."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_tax"]).map_batches(
        lambda df: pd.DataFrame({
            "k": df["l_orderkey"].to_numpy(np.int64),
            "u": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy(np.float64)
                             * 100).astype(np.int64))
            * (100 + np.rint(df["l_tax"].to_numpy(np.float64)
                             * 100).astype(np.int64))}),
        batch_format="pandas")
    s = reduce_sink(li, ["k"], {"u": ("u", "sum")})
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "hdr_c": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
        batch_format="pandas")
    j = auto_join(s, orders, on="k", right_on="o_orderkey")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        line_c = textstats.round_half_away(
            df["u"].to_numpy(np.float64) / 10000.0, 0) \
            .astype(np.int64)
        hdr = df["hdr_c"].to_numpy(np.int64)
        d = line_c - hdr
        return pd.DataFrame({
            "n": [np.int64(len(d))],
            "exact": [np.int64((d == 0).sum())],
            "round1": [np.int64(((np.abs(d) <= 1) & (d != 0)).sum())],
            "lover": [np.int64((d > 1).sum())],
            "hover": [np.int64((d < -1).sum())]})

    t = j.map_batches(fold, batch_format="pandas").to_pandas().sum()
    n = int(t["n"])
    return pd.DataFrame({
        "n_orders": np.array([n], np.int64),
        "exact_match": np.array([int(t["exact"])], np.int64),
        "off_by_rounding": np.array([int(t["round1"])], np.int64),
        "lines_over": np.array([int(t["lover"])], np.int64),
        "header_over": np.array([int(t["hover"])], np.int64),
        "match_share": [float(textstats.round_half_away(
            np.array([int(t["exact"]) * 1.0 / n]), 6)[0])]})


@register("markdown_depth_by_brand", sql="""
WITH l AS (SELECT p.p_brand AS brand,
                  CAST(ROUND(li.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(li.l_discount * 100) AS BIGINT))
                      AS real_dm,
                  CAST(li.l_quantity AS BIGINT)
                  * CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                  * 100 AS list_dm
           FROM lineitem li JOIN part p
             ON p.p_partkey = li.l_partkey)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(real_dm) AS BIGINT) AS realized_dm,
       CAST(SUM(list_dm) AS BIGINT) AS list_dm,
       ROUND(1.0 - SUM(real_dm) * 1.0 / SUM(list_dm), 6)
           AS markdown_depth
FROM l GROUP BY brand ORDER BY brand""")
def markdown_depth_by_brand(sf_dir: str) -> pd.DataFrame:
    """Markdown depth per brand: 1 − realized/list revenue, where
    realized = Σ ep·(1−disc) and list = Σ qty·retail — both kept in
    exact integer deci-milli units so the depth is a single rounded
    division (the merchandising health read: a brand living at 30%
    markdown is a clearance brand whatever its list price says).
    Part attributes broadcast map-side; one per-brand reduce."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"]).to_pandas()
    pmap_ref = ray.put({
        int(k): (b, int(round(float(rp) * 100)))
        for k, b, rp in zip(part["p_partkey"].to_numpy(np.int64),
                            part["p_brand"].astype(str),
                            part["p_retailprice"]
                            .to_numpy(np.float64))})

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        pmap = ray.get(pmap_ref)
        info = df["l_partkey"].map(pmap)
        brand = info.str[0]
        retail = info.str[1].to_numpy(np.int64)
        ep = np.rint(df["l_extendedprice"].to_numpy(np.float64)
                     * 100).astype(np.int64)
        dp = np.rint(df["l_discount"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        q = df["l_quantity"].to_numpy(np.int64)
        d = pd.DataFrame({
            "brand": brand,
            "n_lines": np.ones(len(df), np.int64),
            "realized_dm": ep * (100 - dp),
            "list_dm": q * retail * 100})
        return d.groupby("brand", as_index=False).sum()

    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice",
                                 "l_discount", "l_quantity"])
        .map_batches(prep, batch_format="pandas"),
        ["brand"], {"n_lines": ("n_lines", "sum"),
                    "realized_dm": ("realized_dm", "sum"),
                    "list_dm": ("list_dm", "sum")}).to_pandas() \
        .sort_values("brand", ignore_index=True)
    out = out.astype({"n_lines": np.int64, "realized_dm": np.int64,
                      "list_dm": np.int64})
    out["markdown_depth"] = textstats.round_half_away(
        1.0 - out["realized_dm"].to_numpy(np.float64)
        / out["list_dm"].to_numpy(np.float64), 6)
    return out


@register("payday_revenue_curve", sql="""
WITH o AS (SELECT CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
d AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(c) AS BIGINT) AS revenue_cents
      FROM o GROUP BY dom),
t AS (SELECT CAST(SUM(CASE WHEN dom <= 15 THEN revenue_cents
                           ELSE 0 END) AS BIGINT) AS h1,
             CAST(SUM(CASE WHEN dom > 15 THEN revenue_cents
                           ELSE 0 END) AS BIGINT) AS h2
      FROM d)
SELECT d.dom, d.n_orders, d.revenue_cents,
       ROUND(t.h1 * 1.0 / t.h2, 6) AS first_half_ratio
FROM d, t ORDER BY d.dom""")
def payday_revenue_curve(sf_dir: str) -> pd.DataFrame:
    """Day-of-month revenue curve with the first-half/second-half
    ratio riding every row — the payday-cycle read (a spike at
    1–3 and 15–17 means salary-timed spending; promotions scheduled
    late-month fight the wallet). One ≤31-row integer reduce; the
    ratio is a single rounded division on two integer halves."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy("datetime64[us]")
        dom = (d.astype("datetime64[D]")
               - d.astype("datetime64[M]")).astype(np.int64) + 1
        return pd.DataFrame({
            "dom": dom,
            "n_orders": np.ones(len(dom), np.int64),
            "revenue_cents": np.rint(
                df["o_totalprice"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    d = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["dom"], {"n_orders": ("n_orders", "sum"),
                  "revenue_cents": ("revenue_cents", "sum")}) \
        .to_pandas().sort_values("dom", ignore_index=True)
    d = d.astype({"dom": np.int64, "n_orders": np.int64,
                  "revenue_cents": np.int64})
    rev = d["revenue_cents"].to_numpy(np.int64)
    dom = d["dom"].to_numpy(np.int64)
    h1 = int(rev[dom <= 15].sum())
    h2 = int(rev[dom > 15].sum())
    d["first_half_ratio"] = float(textstats.round_half_away(
        np.array([h1 * 1.0 / h2]), 6)[0])
    return d


@register("code_switching_by_source", sql=f"""
WITH s AS (SELECT source,
    len(regexp_extract_all(lower(text), '{_lang_rx("en")}')) AS s_en,
    len(regexp_extract_all(lower(text), '{_lang_rx("de")}')) AS s_de,
    len(regexp_extract_all(lower(text), '{_lang_rx("fr")}')) AS s_fr,
    len(regexp_extract_all(lower(text), '{_lang_rx("es")}')) AS s_es
    FROM documents),
f AS (SELECT source,
             (CASE WHEN s_en >= 3 THEN 1 ELSE 0 END
              + CASE WHEN s_de >= 3 THEN 1 ELSE 0 END
              + CASE WHEN s_fr >= 3 THEN 1 ELSE 0 END
              + CASE WHEN s_es >= 3 THEN 1 ELSE 0 END) AS n_langs
      FROM s)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS mixed_docs,
       ROUND(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS mixed_share
FROM f GROUP BY source ORDER BY source""")
def code_switching_by_source(sf_dir: str) -> pd.DataFrame:
    """Code-switching (mixed-language) rate per source: a document
    counts as mixed when ≥ 2 languages each clear 3 stopword hits —
    the governance flag a single-label language-ID cannot raise
    (lang_id_docs picks the argmax and hides the mixture), and mixed
    docs are what poison monolingual training quotas. Same stopword
    alternations as lang_id (both engines RE2); one vectorized count
    pass, per-source integer partials."""
    rxs = {lang: _lang_rx(lang) for lang in ("en", "de", "fr", "es")}

    def flags(batch: pa.Table) -> pd.DataFrame:
        low = pc.utf8_lower(batch["text"])
        n_langs = None
        for rx in rxs.values():
            hit = (pc.cast(pc.count_substring_regex(low, rx),
                           pa.int64()).to_numpy(zero_copy_only=False)
                   >= 3).astype(np.int64)
            n_langs = hit if n_langs is None else n_langs + hit
        return pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "n_docs": np.ones(len(n_langs), np.int64),
            "mixed_docs": (n_langs >= 2).astype(np.int64)})

    out = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(flags, batch_format="pyarrow"),
        ["source"], {"n_docs": ("n_docs", "sum"),
                     "mixed_docs": ("mixed_docs", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    out = out.astype({"n_docs": np.int64, "mixed_docs": np.int64})
    out["mixed_share"] = textstats.round_half_away(
        out["mixed_docs"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 6)
    return out


@register("volume_pricing_ladder", sql="""
WITH l AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep
           FROM lineitem WHERE l_quantity > 0)
SELECT q AS quantity, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(ep) AS BIGINT) AS revenue_cents,
       ROUND(SUM(ep) * 1.0 / (SUM(q * 100)), 6) AS unit_price_dollars
FROM l GROUP BY q ORDER BY q""")
def volume_pricing_ladder(sf_dir: str) -> pd.DataFrame:
    """Volume-pricing ladder: mean UNIT price at every order
    quantity — a downward ladder is a real quantity-discount
    schedule, a flat one means the qty×discount MI was association
    without a price mechanism. Unit price = Σep / Σ(q·100) with
    both sums exact integers per quantity rung, so the single
    division is the only rounding anywhere; one ≤50-row reduce."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.int64)
        keep = q > 0
        return pd.DataFrame({
            "quantity": q[keep],
            "n_lines": np.ones(int(keep.sum()), np.int64),
            "revenue_cents": np.rint(
                df["l_extendedprice"].to_numpy(np.float64)[keep]
                * 100).astype(np.int64),
            "qsum": q[keep] * 100})

    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pandas"),
        ["quantity"], {"n_lines": ("n_lines", "sum"),
                       "revenue_cents": ("revenue_cents", "sum"),
                       "qsum": ("qsum", "sum")}).to_pandas() \
        .sort_values("quantity", ignore_index=True)
    out["unit_price_dollars"] = textstats.round_half_away(
        out["revenue_cents"].to_numpy(np.float64)
        / out["qsum"].to_numpy(np.float64), 6)
    return out.astype({"quantity": np.int64, "n_lines": np.int64,
                       "revenue_cents": np.int64}) \
        .drop(columns=["qsum"])


@register("horvitz_thompson_audit", sql="""
WITH e AS (SELECT event_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events),
s AS (SELECT c FROM e
      WHERE (event_id * 2654435761) % 4294967296 < 1073741824),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS exact_cents,
             CAST(COUNT(*) AS BIGINT) AS n FROM e),
h AS (SELECT CAST(SUM(c) AS BIGINT) AS samp_cents,
             CAST(COUNT(*) AS BIGINT) AS n_samp FROM s)
SELECT t.n, h.n_samp, t.exact_cents,
       CAST(h.samp_cents * 4 AS BIGINT) AS ht_estimate_cents,
       ROUND((h.samp_cents * 4 - t.exact_cents) * 1.0
             / t.exact_cents, 6) AS rel_error
FROM t, h""")
def horvitz_thompson_audit(sf_dir: str) -> pd.DataFrame:
    """Horvitz–Thompson estimator audit: estimate total event value
    from the deterministic p=1/4 Bernoulli sample (the same Knuth
    multiplicative-hash membership as sampled_docs, reproducible in
    SQL) by inverse-probability weighting, next to the exact total —
    rel_error is the empirical answer to 'can we run this dashboard
    on a 25% sample?'. Both the census and sample sums are single
    integer partials; the ×4 weight and one division close it."""
    from webalizer_ray.stages import scan

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.int64).astype(np.uint64)
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        h = (ids * np.uint64(scan._KNUTH)) % np.uint64(1 << 32)
        keep = h < np.uint64(1 << 30)
        return pd.DataFrame({
            "n": [np.int64(len(c))],
            "exact_cents": [np.int64(c.sum())],
            "n_samp": [np.int64(keep.sum())],
            "samp_cents": [np.int64(c[keep].sum())]})

    t = _events(sf_dir, ["event_id", "value"]) \
        .map_batches(sums, batch_format="pandas").to_pandas().sum()
    exact = int(t["exact_cents"])
    ht = int(t["samp_cents"]) * 4
    return pd.DataFrame({
        "n": np.array([int(t["n"])], np.int64),
        "n_samp": np.array([int(t["n_samp"])], np.int64),
        "exact_cents": np.array([exact], np.int64),
        "ht_estimate_cents": np.array([ht], np.int64),
        "rel_error": [float(textstats.round_half_away(
            np.array([(ht - exact) * 1.0 / exact]), 6)[0])]})


@register("cramers_v_segment_priority", sql="""
WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
           FROM orders o JOIN customer c
             ON c.c_custkey = o.o_custkey),
cell AS (SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n
         FROM j GROUP BY seg, pri),
rr AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS rn FROM cell
       GROUP BY seg),
cc AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS cn FROM cell
       GROUP BY pri),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST((SELECT COUNT(*) FROM rr) AS BIGINT) AS r,
             CAST((SELECT COUNT(*) FROM cc) AS BIGINT) AS c
      FROM cell),
x AS (SELECT SUM((cell.n - CAST(rr.rn AS DOUBLE) * cc.cn / t.nn)
                 * (cell.n - CAST(rr.rn AS DOUBLE) * cc.cn / t.nn)
                 / (CAST(rr.rn AS DOUBLE) * cc.cn / t.nn)) AS chi2
      FROM cell JOIN rr USING (seg) JOIN cc USING (pri), t)
SELECT t.nn AS n, t.r AS n_segments, t.c AS n_priorities,
       ROUND(x.chi2, 4) AS chi2,
       ROUND(sqrt(x.chi2 / (t.nn * (LEAST(t.r, t.c) - 1))), 6)
           AS cramers_v
FROM x, t""")
def cramers_v_segment_priority(sf_dir: str) -> pd.DataFrame:
    """Cramér's V between customer market segment and order priority
    — the BOUNDED [0,1] association strength a raw chi² can't give
    (chi² grows with n, so 'significant' is guaranteed at scale; V
    says whether the association MATTERS). Segment resolves through
    a broadcast customer map; the ≤ r×c cell reduce is all that
    shuffles; chi² and V close from identical float expressions over
    integer cells."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(
        cust["c_custkey"].to_numpy(np.int64),
        cust["c_mktsegment"].astype(str))))

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        d = pd.DataFrame({"seg": df["o_custkey"].map(cmap),
                          "pri": df["o_orderpriority"].astype(str),
                          "n": np.ones(len(df), np.int64)})
        return d.groupby(["seg", "pri"], as_index=False).sum()

    cell = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
        .map_batches(cells, batch_format="pandas"),
        ["seg", "pri"], {"n": ("n", "sum")}).to_pandas()
    piv = cell.pivot(index="seg", columns="pri", values="n") \
        .fillna(0).astype(np.int64)
    o = piv.to_numpy(np.float64)
    rn = o.sum(axis=1, keepdims=True)
    cn = o.sum(axis=0, keepdims=True)
    nn = int(o.sum())
    e = rn * cn / nn
    chi2 = float((((o - e) ** 2) / e).sum())
    r_, c_ = o.shape
    v = np.sqrt(chi2 / (nn * (min(r_, c_) - 1)))
    rd_ = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([nn], np.int64),
        "n_segments": np.array([r_], np.int64),
        "n_priorities": np.array([c_], np.int64),
        "chi2": [float(rd_(np.array([chi2]), 4)[0])],
        "cramers_v": [float(rd_(np.array([v]), 6)[0])]})


@register("distance_concentration_profile", sql="""
WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
pd_ AS (SELECT CAST(ROUND(list_distance(a.v, b.v) * 100) AS BIGINT)
                   AS band
        FROM pts a JOIN pts b ON a.vec_id < b.vec_id),
h AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pd_ GROUP BY band),
c AS (SELECT band, cnt,
             CAST(SUM(cnt) OVER (ORDER BY band) AS BIGINT) AS cm,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM h),
q AS (SELECT (SELECT MAX(n) FROM c) AS n_pairs,
             (SELECT MIN(band) FROM c WHERE 100 * cm >= n) AS p1,
             (SELECT MIN(band) FROM c WHERE 2 * cm >= n) AS p50,
             (SELECT MIN(band) FROM c WHERE 100 * cm >= 99 * n)
                 AS p99)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(p1 AS BIGINT) AS p1_band, CAST(p50 AS BIGINT) AS p50_band,
       CAST(p99 AS BIGINT) AS p99_band,
       ROUND((p99 - p1) * 1.0 / p50, 6) AS relative_contrast
FROM q""")
def distance_concentration_profile(sf_dir: str) -> pd.DataFrame:
    """Distance-concentration diagnostic: exact banded percentiles
    (p1/p50/p99 of centi-rounded pairwise Euclidean distances) and
    the relative contrast (p99−p1)/p50 — the curse-of-dimensionality
    meter (contrast → 0 means all points grow equidistant and every
    distance-based method — kNN, LSH, dedup thresholds — stops
    discriminating; read next to twonn_intrinsic_dim). Each batch
    counts pairs against the broadcast matrix with a strict id<id
    guard so every unordered pair lands in exactly ONE histogram
    partial; quantiles close on the tiny band table with the shared
    integer order-statistic convention."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)
    ref = ray.put((ids, mat))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        rids, rmat = ray.get(ref)
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        xid = df["vec_id"].to_numpy(np.int64)
        bands = []
        for lo in range(0, len(rmat), 1024):
            chunk = rmat[lo:lo + 1024]
            cid = rids[lo:lo + 1024]
            d = np.sqrt(((x[:, None, :] - chunk[None, :, :]) ** 2)
                        .sum(axis=2))
            keep = xid[:, None] < cid[None, :]
            bands.append(textstats.round_half_away(
                d[keep] * 100, 0).astype(np.int64))
        b = np.concatenate(bands) if bands else \
            np.array([], np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"band": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    h = reduce_sink(ds.map_batches(hist, batch_format="pandas"),
                    ["band"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("band", ignore_index=True)
    band = h["band"].to_numpy(np.int64)
    cnt = h["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cm = np.cumsum(cnt)
    p1 = int(band[np.searchsorted(100 * cm, n, side="left")])
    p50 = int(band[np.searchsorted(2 * cm, n, side="left")])
    p99 = int(band[np.searchsorted(100 * cm, 99 * n, side="left")])
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "p1_band": np.array([p1], np.int64),
        "p50_band": np.array([p50], np.int64),
        "p99_band": np.array([p99], np.int64),
        "relative_contrast": [float(textstats.round_half_away(
            np.array([(p99 - p1) * 1.0 / p50]), 6)[0])]})


@register("bot_user_detector", sql="""
WITH o AS (SELECT user_id, ts, event_id, hour(ts) AS hr,
                  epoch_us(ts) - epoch_us(LAG(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id))
                      AS gap_us
           FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT hr) AS BIGINT) AS n_hours,
             CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
             CAST(SUM(CASE WHEN gap_us < 2000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_short
      FROM o GROUP BY user_id),
f AS (SELECT n_events,
             CASE WHEN n_events >= 50
                       AND (n_hours <= 2 OR 2 * n_short > n_gaps)
                  THEN 1 ELSE 0 END AS bot
      FROM u)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(bot) AS BIGINT) AS flagged_users,
       CAST(SUM(CASE WHEN bot = 1 THEN n_events ELSE 0 END)
            AS BIGINT) AS flagged_events,
       ROUND(SUM(CASE WHEN bot = 1 THEN n_events ELSE 0 END) * 1.0
             / SUM(n_events), 6) AS flagged_event_share
FROM f""")
def bot_user_detector(sf_dir: str) -> pd.DataFrame:
    """Composite bot detector: flag users with ≥ 50 events that are
    EITHER clock-bound (≤ 2 distinct hours of day — the cron
    signature) OR machine-paced (> half their gaps under 2 s) — the
    exclusion list every 'real user' metric needs first; single
    signals (hour entropy, burstiness) each miss one bot species.
    All three features compute in ONE bucket-local pass per user
    (counts, per-run distinct hours, shift gaps); the rule is pure
    integer comparisons (2·n_short > n_gaps — no float share), so
    engines can't disagree at the boundary."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def feats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        hr = (us // 3_600_000_000) % 24
        n = len(g)
        d = pd.DataFrame({"uid": uid, "hr": hr})
        per = d.groupby("uid").agg(
            n_events=("hr", "size"),
            n_hours=("hr", "nunique"))
        same = np.zeros(n, bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = us - np.roll(us, 1)
        short = pd.DataFrame({
            "uid": uid[same],
            "n_gaps": np.ones(int(same.sum()), np.int64),
            "n_short": (gap[same] < 2_000_000).astype(np.int64)}) \
            .groupby("uid").sum()
        per = per.join(short, how="left").fillna(0).astype(np.int64)
        bot = (per["n_events"] >= 50) \
            & ((per["n_hours"] <= 2)
               | (2 * per["n_short"] > per["n_gaps"]))
        return pd.DataFrame({
            "n_users": [np.int64(len(per))],
            "flagged_users": [np.int64(bot.sum())],
            "flagged_events": [np.int64(
                per["n_events"][bot].sum())],
            "total_events": [np.int64(per["n_events"].sum())]})

    t = (ds.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_").map_groups(feats,
                                        batch_format="pandas")) \
        .to_pandas().sum()
    return pd.DataFrame({
        "n_users": np.array([int(t["n_users"])], np.int64),
        "flagged_users": np.array([int(t["flagged_users"])],
                                  np.int64),
        "flagged_events": np.array([int(t["flagged_events"])],
                                   np.int64),
        "flagged_event_share": [float(textstats.round_half_away(
            np.array([int(t["flagged_events"]) * 1.0
                      / int(t["total_events"])]), 6)[0])]})


@register("dedup_storage_savings", sql="""
WITH h AS (SELECT md5(text) AS fp, CAST(n_chars AS BIGINT) AS b
           FROM documents),
g AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(MAX(b) AS BIGINT) AS b
      FROM h GROUP BY fp)
SELECT CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_groups,
       CAST(SUM(cnt - 1) AS BIGINT) AS docs_removable,
       CAST(SUM((cnt - 1) * b) AS BIGINT) AS chars_removable,
       ROUND(SUM((cnt - 1) * b) * 1.0 / SUM(cnt * b), 6)
           AS char_savings_share
FROM g""")
def dedup_storage_savings(sf_dir: str) -> pd.DataFrame:
    """Dedup savings forecast: exactly how many documents and
    characters an exact-dedup pass would delete (keep one per
    fingerprint group) and the corpus-wide savings share — the
    capacity-planning number that decides whether dedup is worth a
    full rewrite pass before training. Fingerprints map-side; one
    keyed reduce; identical texts share n_chars so MAX is exact."""
    import hashlib

    def fp(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame({
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in texts],
            "cnt": np.ones(len(texts), np.int64),
            "b": batch["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    g = reduce_sink(
        _docs(sf_dir, ["text", "n_chars"])
        .map_batches(fp, batch_format="pyarrow"),
        ["fp"], {"cnt": ("cnt", "sum"), "b": ("b", "max")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        dup = cnt > 1
        return pd.DataFrame({
            "dup_groups": [np.int64(dup.sum())],
            "docs_removable": [np.int64((cnt - 1).sum())],
            "chars_removable": [np.int64(((cnt - 1) * b).sum())],
            "total_chars": [np.int64((cnt * b).sum())]})

    t = g.map_batches(fold, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame({
        "dup_groups": np.array([int(t["dup_groups"])], np.int64),
        "docs_removable": np.array([int(t["docs_removable"])],
                                   np.int64),
        "chars_removable": np.array([int(t["chars_removable"])],
                                    np.int64),
        "char_savings_share": [float(textstats.round_half_away(
            np.array([int(t["chars_removable"]) * 1.0
                      / int(t["total_chars"])]), 6)[0])]})


@register("kpi_tree_decomposition", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
t AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
             CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT)
                 AS sessions,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS purchases
      FROM sid),
v AS (SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM events WHERE event_type = 'purchase')
SELECT t.users, t.sessions, t.purchases, v.rev_cents,
       ROUND(t.sessions * 1.0 / t.users, 6) AS sessions_per_user,
       ROUND(t.purchases * 1.0 / t.sessions, 6)
           AS purchases_per_session,
       ROUND(v.rev_cents * 1.0 / t.purchases / 100, 6)
           AS aov_dollars,
       ROUND(v.rev_cents * 1.0 / t.users / 100, 6)
           AS revenue_per_user
FROM t, v""")
def kpi_tree_decomposition(sf_dir: str) -> pd.DataFrame:
    """The multiplicative KPI tree (the growth equation):
    revenue/user = sessions/user × purchases/session × AOV — when
    revenue moves, this table says WHICH lever moved (traffic
    frequency, conversion, or basket), which no single metric
    answers. Session counts come from the bucket-local sessionize
    (each user's sessions resolve in one task); four exact integers
    feed three rounded divisions whose product identity the reader
    can check by construction."""
    sess = _sessionized_events(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        # per (user) partials: max sid = session count (sids are
        # 1..k within a user); purchases count — all vectorized
        d = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "sid": df["sid"].to_numpy(np.int64),
            "is_p": (df["event_type"] == "purchase").to_numpy()
            .astype(np.int64)})
        g = d.groupby("user_id", as_index=False).agg(
            n_sess=("sid", "max"), purchases=("is_p", "sum"))
        return g.astype({"n_sess": np.int64, "purchases": np.int64})

    per_user = reduce_sink(
        sess.map_batches(part, batch_format="pandas"),
        ["user_id"], {"n_sess": ("n_sess", "max"),
                      "purchases": ("purchases", "sum")}).to_pandas()
    users = len(per_user)
    sessions = int(per_user["n_sess"].sum())
    purchases = int(per_user["purchases"].sum())
    rev = _events(sf_dir, ["event_type", "value"]).map_batches(
        lambda df: pd.DataFrame({"c": [np.int64(np.rint(
            df.loc[df["event_type"] == "purchase", "value"]
            .to_numpy(np.float64) * 100).sum())]}),
        batch_format="pandas").to_pandas()
    rev_cents = int(rev["c"].sum())
    r = textstats.round_half_away
    return pd.DataFrame({
        "users": np.array([users], np.int64),
        "sessions": np.array([sessions], np.int64),
        "purchases": np.array([purchases], np.int64),
        "rev_cents": np.array([rev_cents], np.int64),
        "sessions_per_user": [float(r(np.array(
            [sessions * 1.0 / users]), 6)[0])],
        "purchases_per_session": [float(r(np.array(
            [purchases * 1.0 / sessions]), 6)[0])],
        "aov_dollars": [float(r(np.array(
            [rev_cents * 1.0 / purchases / 100]), 6)[0])],
        "revenue_per_user": [float(r(np.array(
            [rev_cents * 1.0 / users / 100]), 6)[0])]})


@register("dow_variance_explained_daily", sql="""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM events GROUP BY 1),
w AS (SELECT CAST((day + 4) % 7 AS BIGINT) AS dow, rev FROM d),
g AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS s,
             CAST(SUM(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS q
      FROM w GROUP BY dow),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS HUGEINT) AS st,
             CAST(SUM(q) AS HUGEINT) AS qt,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
      FROM g)
SELECT nn AS n_days,
       ROUND((sb - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nn)
             / (CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nn), 6)
           AS dow_r2
FROM t""")
def dow_variance_explained_daily(sf_dir: str) -> pd.DataFrame:
    """How much of DAILY revenue variance does day-of-week alone
    explain? R² of the seven weekday means over the daily revenue
    series — the forecasting-baseline quality number (R² ≈ 0.8 means
    a naive weekday-profile forecast is already strong; ≈ 0.1 means
    the series is driven by something else and seasonal models will
    disappoint). Distinct from the event-grain ANOVA: the UNIT is a
    day, so daily volume aggregation happens first. One daily
    reduce, seven integer moment rows, one rounded ratio."""
    daily = reduce_sink(
        _events(sf_dir, ["ts", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "day": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000,
                "rev": np.rint(df["value"].to_numpy(np.float64)
                               * 100).astype(np.int64)}),
            batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    rev = np.array([int(v) for v in daily["rev"]], dtype=object)
    dow = (day + 4) % 7
    nn = len(day)
    st = int(rev.sum())
    qt = int((rev * rev).sum())
    sb = 0.0
    for w in range(7):
        m = dow == w
        if m.any():
            s = int(rev[m].sum())
            sb += float(s) * s / int(m.sum())
    cm = float(st) * st / nn
    r2 = (sb - cm) / (float(qt) - cm)
    return pd.DataFrame({
        "n_days": np.array([nn], np.int64),
        "dow_r2": [float(textstats.round_half_away(
            np.array([r2]), 6)[0])]})


@register("dup_cluster_label_purity", sql="""
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
comp AS (SELECT node, MIN(reach) AS cid FROM walk GROUP BY node),
lab AS (SELECT comp.cid, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels
        FROM comp JOIN embeddings e ON e.vec_id = comp.node
        GROUP BY comp.cid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN n_labels > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS mixed_clusters,
       CAST(SUM(CASE WHEN n_labels > 1 THEN n_nodes ELSE 0 END)
            AS BIGINT) AS nodes_in_mixed,
       ROUND(SUM(CASE WHEN n_labels > 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS mixed_share
FROM lab""")
def dup_cluster_label_purity(sf_dir: str) -> pd.DataFrame:
    """Label purity of the cosine near-dup clusters (threshold 0.4):
    a cluster spanning MULTIPLE labels means near-identical vectors
    carry different labels — either label noise or a taxonomy too
    fine for the embedding, and in a training pipeline these are the
    'same example, two answers' contradictions SemDeDup-style
    pruning must resolve BEFORE sampling one per cluster. Pairs from
    the exact blocked generator (the parity baseline; LSH is the
    documented scale path), union-find clusters, one label join,
    four scalars."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = dedup.cosine_dup_pairs(ds, threshold=0.4)
    comp = dedup.connected_components(pairs)
    labs = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label"]).to_pandas()
    lab_of = dict(zip(labs["vec_id"].to_numpy(np.int64),
                      labs["label"].to_numpy(np.int64)))
    comp = comp.assign(label=comp["node"].map(lab_of))
    g = comp.groupby("cluster_id").agg(n_nodes=("node", "size"),
                                       n_labels=("label", "nunique"))
    n_clusters = len(g)
    mixed = g["n_labels"] > 1
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_clusters": np.array([n_clusters], np.int64),
        "mixed_clusters": np.array([int(mixed.sum())], np.int64),
        "nodes_in_mixed": np.array(
            [int(g["n_nodes"][mixed].sum())], np.int64),
        "mixed_share": [float(r(np.array(
            [int(mixed.sum()) * 1.0 / n_clusters]), 6)[0])]})


@register("arrival_vs_activity_divergence", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id, ns FROM ({_NS_SQL})),
a AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(ns) AS BIGINT) AS n_start
      FROM sid GROUP BY 1),
t AS (SELECT CAST(SUM(n_all) AS BIGINT) AS ta,
             CAST(SUM(n_start) AS BIGINT) AS ts_ FROM a),
j AS (SELECT (n_all * 1.0 / t.ta) AS p, (n_start * 1.0 / t.ts_) AS q
      FROM a, t),
k AS (SELECT SUM(CASE WHEN p > 0
                      THEN p * LN(2 * p / (p + q)) ELSE 0 END) AS kp,
             SUM(CASE WHEN q > 0
                      THEN q * LN(2 * q / (p + q)) ELSE 0 END) AS kq
      FROM j)
SELECT (SELECT ta FROM t) AS n_events,
       (SELECT ts_ FROM t) AS n_sessions,
       ROUND(0.5 * (kp + kq), 6) AS js_divergence
FROM k""")
def arrival_vs_activity_divergence(sf_dir: str) -> pd.DataFrame:
    """Arrival vs activity clock: Jensen–Shannon divergence between
    the hour-of-day profile of SESSION STARTS and of ALL events —
    near 0 means visits and work share one clock (sizing on the
    arrival curve is safe); a big gap means sessions start at one
    hour and run long into others, so staffing to arrivals
    understaffs the tail. Session-start flags are the sessionize
    ns column (computed in the user buckets); two 24-bin integer
    histograms shuffle; the JS formula evaluates identically on both
    engines with 0·ln0 = 0 pinned."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def hists(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        ns = np.ones(len(g), np.int64)
        if len(g) > 1:
            cont = (uid[1:] == uid[:-1]) \
                & ((us[1:] - us[:-1]) < 1_800_000_000)
            ns[1:] = (~cont).astype(np.int64)
        hr = (us // 3_600_000_000) % 24
        d = pd.DataFrame({"hr": hr,
                          "n_all": np.ones(len(g), np.int64),
                          "n_start": ns})
        return d.groupby("hr", as_index=False).sum()

    a = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(hists, batch_format="pandas"),
        ["hr"], {"n_all": ("n_all", "sum"),
                 "n_start": ("n_start", "sum")}).to_pandas() \
        .sort_values("hr", ignore_index=True)
    ta = int(a["n_all"].sum())
    ts_ = int(a["n_start"].sum())
    p = a["n_all"].to_numpy(np.float64) / ta
    q = a["n_start"].to_numpy(np.float64) / ts_
    m = p + q
    kp = float(np.where(p > 0, p * np.log(
        np.where(p > 0, 2 * p / np.where(m > 0, m, 1), 1)), 0.0)
        .sum())
    kq = float(np.where(q > 0, q * np.log(
        np.where(q > 0, 2 * q / np.where(m > 0, m, 1), 1)), 0.0)
        .sum())
    return pd.DataFrame({
        "n_events": np.array([ta], np.int64),
        "n_sessions": np.array([ts_], np.int64),
        "js_divergence": [float(textstats.round_half_away(
            np.array([0.5 * (kp + kq)]), 6)[0])]})


_SESS_FLAGS_SQL = f"""
SELECT user_id, sid,
       CAST(COUNT(*) AS BIGINT) AS depth,
       CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS has_p,
       FIRST(event_type ORDER BY ts, event_id) AS entry_type
FROM (SELECT user_id, event_type, ts, event_id,
             SUM(ns) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM ({_NS_SQL}))
GROUP BY user_id, sid"""


def _session_flag_rows(sf_dir: str) -> rd.Dataset:
    """(depth, entry type, has_purchase) per session, computed in ONE
    bucket-local pass (sessions never straddle user-hash buckets)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        n = len(g)
        ns = np.ones(n, bool)
        if n > 1:
            ns[1:] = ~((uid[1:] == uid[:-1])
                       & ((us[1:] - us[:-1]) < 1_800_000_000))
        starts = np.flatnonzero(ns)
        depth = np.diff(np.r_[starts, n])
        run = np.repeat(np.arange(len(starts)), depth)
        has_p = np.zeros(len(starts), np.int64)
        np.maximum.at(has_p, run, (et == "purchase").astype(np.int64))
        return pd.DataFrame({
            "depth": depth.astype(np.int64),
            "entry": et[starts],
            "has_p": has_p})

    return (ds.map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket_").map_groups(flags,
                                           batch_format="pandas"))


@register("conversion_by_session_depth", sql=f"""
WITH s AS ({_SESS_FLAGS_SQL})
SELECT CAST(LEAST(depth, 10) AS BIGINT) AS depth_band,
       CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(has_p) AS BIGINT) AS converted,
       ROUND(SUM(has_p) * 1.0 / COUNT(*), 6) AS conversion
FROM s GROUP BY 1 ORDER BY 1""")
def conversion_by_session_depth(sf_dir: str) -> pd.DataFrame:
    """Conversion rate by session DEPTH band (1..10+): does longer
    browsing actually convert, or do deep sessions mean lostness?
    The ordinal query asks which VISIT converts; this asks how much
    ENGAGEMENT within a visit pays — the curve that justifies (or
    kills) engagement-maximizing ranking. Depth, entry and purchase
    flags all fall out of one bucket-local sessionize; only the
    ≤10-band integer partials shuffle."""
    s = _session_flag_rows(sf_dir)

    def band(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "depth_band": np.minimum(df["depth"].to_numpy(np.int64),
                                     10),
            "sessions": np.ones(len(df), np.int64),
            "converted": df["has_p"].to_numpy(np.int64)})

    out = reduce_sink(s.map_batches(band, batch_format="pandas"),
                      ["depth_band"],
                      {"sessions": ("sessions", "sum"),
                       "converted": ("converted", "sum")}) \
        .to_pandas().sort_values("depth_band", ignore_index=True)
    out = out.astype({"depth_band": np.int64, "sessions": np.int64,
                      "converted": np.int64})
    out["conversion"] = textstats.round_half_away(
        out["converted"].to_numpy(np.float64)
        / out["sessions"].to_numpy(np.float64), 6)
    return out


@register("conversion_by_entry_type", sql=f"""
WITH s AS ({_SESS_FLAGS_SQL})
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(has_p) AS BIGINT) AS converted,
       ROUND(SUM(has_p) * 1.0 / COUNT(*), 6) AS conversion
FROM s GROUP BY 1 ORDER BY 1""")
def conversion_by_entry_type(sf_dir: str) -> pd.DataFrame:
    """Conversion rate by session ENTRY type — the landing-page
    optimizer table (bounce_rate_by_entry says who leaves
    immediately; this says who eventually BUYS — the two rankings
    disagree exactly when a low-bounce entry attracts browsers, not
    buyers). Entry = first event of the session by (ts, event_id);
    same single bucket-local pass; ≤|types| partials shuffle."""
    s = _session_flag_rows(sf_dir)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "entry_type": df["entry"].astype(str),
            "sessions": np.ones(len(df), np.int64),
            "converted": df["has_p"].to_numpy(np.int64)})

    out = reduce_sink(s.map_batches(agg, batch_format="pandas"),
                      ["entry_type"],
                      {"sessions": ("sessions", "sum"),
                       "converted": ("converted", "sum")}) \
        .to_pandas().sort_values("entry_type", ignore_index=True)
    out = out.astype({"sessions": np.int64, "converted": np.int64})
    out["conversion"] = textstats.round_half_away(
        out["converted"].to_numpy(np.float64)
        / out["sessions"].to_numpy(np.float64), 6)
    return out


@register("forecast_backtest_daily", sql="""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM events GROUP BY 1),
sp AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
              (MIN(day) + MAX(day) + 1) // 2 AS cut FROM d),
x AS (SELECT g.i + sp.d0 AS day,
             CAST(COALESCE(o.rev, 0) AS BIGINT) AS rev
      FROM generate_series(0, 4000) g(i)
      CROSS JOIN sp
      LEFT JOIN d o ON o.day = g.i + sp.d0
      WHERE g.i <= sp.d1 - sp.d0),
tr AS (SELECT CAST((day + 4) % 7 AS BIGINT) AS dow,
              SUM(rev) AS s, COUNT(*) AS n
       FROM x, sp WHERE day < cut GROUP BY 1),
te AS (SELECT x.day, x.rev,
              LAG(x.rev) OVER (ORDER BY x.day) AS prev,
              CAST((x.day + 4) % 7 AS BIGINT) AS dow
       FROM x),
e AS (SELECT te.rev, te.prev,
             CAST(tr.s AS DOUBLE) / tr.n AS dowmean
      FROM te JOIN tr ON tr.dow = te.dow, sp
      WHERE te.day >= sp.cut)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test_days,
       ROUND(SUM(ABS(rev - prev)) * 1.0 / COUNT(*), 2)
           AS mae_naive_cents,
       ROUND(SUM(ABS(rev - dowmean)) / COUNT(*), 2)
           AS mae_dow_cents,
       CASE WHEN ROUND(SUM(ABS(rev - dowmean)) / COUNT(*), 2)
                 < ROUND(SUM(ABS(rev - prev)) * 1.0 / COUNT(*), 2)
            THEN 'dow_profile' ELSE 'naive' END AS winner
FROM e""")
def forecast_backtest_daily(sf_dir: str) -> pd.DataFrame:
    """One-step-ahead forecast BACKTEST on daily revenue: train on
    the first half, score the second half with (a) the naive
    yesterday-equals-today forecast and (b) the weekday-profile mean
    — the empirical answer to 'is a seasonal model worth building'
    (dow_r2 said variance is explained IN-SAMPLE; this is the
    out-of-sample test that actually decides). Zero-filled calendar
    series; train means are per-dow integer sums; both MAEs close as
    identical float expressions, winner compared on the ROUNDED
    values so engines agree at the boundary."""
    daily = reduce_sink(
        _events(sf_dir, ["ts", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "day": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000,
                "rev": np.rint(df["value"].to_numpy(np.float64)
                               * 100).astype(np.int64)}),
            batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")}).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    rev_map = dict(zip(day, (int(v) for v in daily["rev"])))
    d0, d1 = int(day.min()), int(day.max())
    cut = (d0 + d1 + 1) // 2
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    rev = np.array([rev_map.get(int(d), 0) for d in days],
                   dtype=np.int64)
    dow = (days + 4) % 7
    train = days < cut
    dowmean = {}
    for w in range(7):
        m = train & (dow == w)
        if m.any():
            dowmean[w] = float(int(rev[m].sum())) / int(m.sum())
    test = days >= cut
    t_idx = np.flatnonzero(test)
    prev = rev[t_idx - 1]
    actual = rev[t_idx]
    dmean = np.array([dowmean[int(w)] for w in dow[t_idx]])
    n = len(t_idx)
    mae_naive = float(np.abs(actual - prev).sum()) * 1.0 / n
    mae_dow = float(np.abs(actual - dmean).sum()) / n
    r = textstats.round_half_away
    mn = float(r(np.array([mae_naive]), 2)[0])
    md = float(r(np.array([mae_dow]), 2)[0])
    return pd.DataFrame({
        "n_test_days": np.array([n], np.int64),
        "mae_naive_cents": [mn],
        "mae_dow_cents": [md],
        "winner": ["dow_profile" if md < mn else "naive"]})


@register("error_hangover_effect", sql="""
WITH ud AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                            END) AS had_error
            FROM events GROUP BY 1, 2),
mx AS (SELECT MAX(d) AS last_d FROM ud),
j AS (SELECT a.had_error,
             CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS back
      FROM ud a LEFT JOIN ud b
        ON b.user_id = a.user_id AND b.d = a.d + 1, mx
      WHERE a.d < mx.last_d),
g AS (SELECT had_error, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(back) AS BIGINT) AS returned
      FROM j GROUP BY had_error)
SELECT
  (SELECT n FROM g WHERE had_error = 1) AS n_error_days,
  (SELECT n FROM g WHERE had_error = 0) AS n_clean_days,
  ROUND((SELECT returned * 1.0 / n FROM g WHERE had_error = 1), 6)
      AS p_return_after_error,
  ROUND((SELECT returned * 1.0 / n FROM g WHERE had_error = 0), 6)
      AS p_return_after_clean,
  ROUND((SELECT returned * 1.0 / n FROM g WHERE had_error = 1)
        / (SELECT returned * 1.0 / n FROM g WHERE had_error = 0), 6)
      AS risk_ratio""")
def error_hangover_effect(sf_dir: str) -> pd.DataFrame:
    """Error hangover: P(user returns tomorrow │ hit an error today)
    vs P(returns │ clean day), with the risk ratio — the
    reliability-to-retention bridge (a ratio well under 1 prices an
    error in churned users, the number an SLO debate needs). Unit =
    (user, active-day); last day excluded (no tomorrow to test);
    tomorrow-lookup is the day-shift compare inside user buckets —
    only four integers leave them."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def ud(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64), "d": d,
            "had_error": (df["event_type"] == "error").to_numpy()
            .astype(np.int64)})
        out = out.groupby(["user_id", "d"], as_index=False).max()
        out["bucket_"] = (out["user_id"] % 32).astype(np.int32)
        return out

    # global last day (cheap metadata pass)
    last_d = int(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({"m": [df["ts"]
                                       .to_numpy("datetime64[us]")
                                       .astype(np.int64).max()
                                       // 86_400_000_000]}),
        batch_format="pandas").to_pandas()["m"].max())

    def shift(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "d"], as_index=False) \
            .max().sort_values(["user_id", "d"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        he = g["had_error"].to_numpy(np.int64)
        nxt = np.zeros(len(g), np.int64)
        if len(g) > 1:
            nxt[:-1] = ((uid[1:] == uid[:-1])
                        & (d[1:] == d[:-1] + 1)).astype(np.int64)
        keep = d < last_d
        he, nxt = he[keep], nxt[keep]
        return pd.DataFrame({
            "n_err": [np.int64((he == 1).sum())],
            "ret_err": [np.int64(nxt[he == 1].sum())],
            "n_cln": [np.int64((he == 0).sum())],
            "ret_cln": [np.int64(nxt[he == 0].sum())]})

    t = (ds.map_batches(ud, batch_format="pandas")
         .groupby("bucket_").map_groups(shift,
                                        batch_format="pandas")) \
        .to_pandas().sum()
    ne, re_, nc, rc = (int(t["n_err"]), int(t["ret_err"]),
                       int(t["n_cln"]), int(t["ret_cln"]))
    pe = re_ * 1.0 / ne
    pc_ = rc * 1.0 / nc
    r = textstats.round_half_away
    return pd.DataFrame({
        "n_error_days": np.array([ne], np.int64),
        "n_clean_days": np.array([nc], np.int64),
        "p_return_after_error": [float(r(np.array([pe]), 6)[0])],
        "p_return_after_clean": [float(r(np.array([pc_]), 6)[0])],
        "risk_ratio": [float(r(np.array([pe / pc_]), 6)[0])]})


@register("bpe_fertility_by_lang", sql=r"""
WITH d AS (SELECT lang,
                  CAST(len(regexp_extract_all(text, '\S+'))
                       AS BIGINT) AS w,
                  CAST(len(regexp_extract_all(
                      text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]'))
                       AS BIGINT) AS p
           FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS words,
       CAST(SUM(p) AS BIGINT) AS pieces,
       ROUND(SUM(p) * 1.0 / SUM(w), 6) AS fertility
FROM d GROUP BY lang ORDER BY lang""")
def bpe_fertility_by_lang(sf_dir: str) -> pd.DataFrame:
    """Tokenizer FERTILITY per language: BPE-ish pieces per
    whitespace word (the standard tokenizer-equity metric — a
    language at fertility 2.4 pays 2.4× the context budget of one at
    1.1 for the same words, the compute-fairness number multilingual
    training reads). Both counts are the shared RE2 kernels
    (TOKEN_RX, BPE_RX) in one zero-copy Arrow pass; per-lang integer
    sums, one rounded division."""
    def feats(batch: pa.Table) -> pd.DataFrame:
        w = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        p = pc.cast(pc.count_substring_regex(
            batch["text"], textstats.BPE_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pd.DataFrame({"lang": batch["lang"].to_pandas(),
                             "n_docs": np.ones(len(w), np.int64),
                             "words": w, "pieces": p}) \
            .groupby("lang", as_index=False).sum()

    out = reduce_sink(
        _docs(sf_dir, ["lang", "text"])
        .map_batches(feats, batch_format="pyarrow"),
        ["lang"], {"n_docs": ("n_docs", "sum"),
                   "words": ("words", "sum"),
                   "pieces": ("pieces", "sum")}).to_pandas() \
        .sort_values("lang", ignore_index=True)
    out = out.astype({"n_docs": np.int64, "words": np.int64,
                      "pieces": np.int64})
    out["fertility"] = textstats.round_half_away(
        out["pieces"].to_numpy(np.float64)
        / out["words"].to_numpy(np.float64), 6)
    return out


@register("type_staleness_audit", sql="""
WITH t AS (SELECT event_type,
                  CAST(MAX(epoch_us(ts)) // 86400000000 AS BIGINT)
                      AS last_d,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY event_type),
mx AS (SELECT MAX(last_d) AS today FROM t)
SELECT event_type, t.n AS n_events,
       CAST(mx.today - t.last_d AS BIGINT) AS stale_days,
       CAST(CASE WHEN mx.today - t.last_d >= 2 THEN 1 ELSE 0 END
            AS BIGINT) AS stale_flag
FROM t, mx ORDER BY event_type""")
def type_staleness_audit(sf_dir: str) -> pd.DataFrame:
    """Freshness SLO table: how many days each event type lags the
    newest data (a feed whose last record is 3 days old while others
    are current means ITS producer broke, not traffic — the per-
    stream staleness page every ingestion on-call works from; the
    global late-rate can't isolate the broken stream). One per-type
    (max ts, count) reduce; pure integer day arithmetic."""
    t = reduce_sink(
        _events(sf_dir, ["event_type", "ts"]).map_batches(
            lambda df: pd.DataFrame({
                "event_type": df["event_type"].astype(str),
                "last_d": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000,
                "n_events": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["event_type"], {"last_d": ("last_d", "max"),
                         "n_events": ("n_events", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    today = int(t["last_d"].max())
    stale = (today - t["last_d"].to_numpy(np.int64)).astype(np.int64)
    return pd.DataFrame({
        "event_type": t["event_type"],
        "n_events": t["n_events"].astype(np.int64),
        "stale_days": stale,
        "stale_flag": (stale >= 2).astype(np.int64)})


@register("canonical_dedup_uplift", sql=r"""
WITH r AS (SELECT md5(text) AS raw_fp,
                  md5(trim(regexp_replace(lower(text), '\s+', ' ',
                                          'g'), ' ')) AS can_fp
           FROM documents),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS raw_distinct,
             CAST(COUNT(DISTINCT can_fp) AS BIGINT) AS can_distinct
      FROM r)
SELECT n AS n_docs,
       CAST(n - raw_distinct AS BIGINT) AS raw_dups,
       CAST(n - can_distinct AS BIGINT) AS canonical_dups,
       CAST(raw_distinct - can_distinct AS BIGINT) AS uplift_docs,
       ROUND((raw_distinct - can_distinct) * 1.0 / n, 6)
           AS uplift_share
FROM a""")
def canonical_dedup_uplift(sf_dir: str) -> pd.DataFrame:
    """Canonicalization uplift for exact dedup: how many MORE
    duplicates appear once text is lowercased and whitespace-
    collapsed before fingerprinting — the cheap preprocessing
    decision (uplift ≈ 0 means byte-dedup already suffices; a big
    uplift means the corpus is full of trivially-reformatted copies
    and the canonical pass pays for itself). Both fingerprints
    compute in one map-side pass (identical RE2 normalization on
    both engines); two exact two-phase distincts close the row."""
    import hashlib
    import re

    ws = re.compile(r"\s+")

    def fps(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame({
            "raw_fp": [hashlib.md5(t.encode()).hexdigest()
                       for t in texts],
            "can_fp": [hashlib.md5(ws.sub(" ", t.lower())
                                   .strip(" ").encode()).hexdigest()
                       for t in texts],
            "n": np.ones(len(texts), np.int64)})

    ds = _docs(sf_dir, ["text"]).map_batches(fps,
                                             batch_format="pyarrow")
    # two-phase distincts via reduce on each fingerprint column
    rd_ = reduce_sink(ds.map_batches(
        lambda df: df[["raw_fp"]].assign(
            n=np.ones(len(df), np.int64)), batch_format="pandas"),
        ["raw_fp"], {"n": ("n", "sum")})
    cd_ = reduce_sink(ds.map_batches(
        lambda df: df[["can_fp"]].assign(
            n=np.ones(len(df), np.int64)), batch_format="pandas"),
        ["can_fp"], {"n": ("n", "sum")})

    def fold(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "distinct": [np.int64(len(df))],
                "total": [np.int64(df["n"].sum())]})
        return f

    tr = rd_.map_batches(fold("raw_fp"),
                         batch_format="pandas").to_pandas().sum()
    tc = cd_.map_batches(fold("can_fp"),
                         batch_format="pandas").to_pandas().sum()
    n = int(tr["total"])
    rawd, cand = int(tr["distinct"]), int(tc["distinct"])
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "raw_dups": np.array([n - rawd], np.int64),
        "canonical_dups": np.array([n - cand], np.int64),
        "uplift_docs": np.array([rawd - cand], np.int64),
        "uplift_share": [float(textstats.round_half_away(
            np.array([(rawd - cand) * 1.0 / n]), 6)[0])]})


@register("props_key_coverage", sql=r"""
WITH e AS (SELECT event_type,
                  CASE WHEN regexp_extract(props, '"k": (\d+)', 1)
                            != '' THEN 1 ELSE 0 END AS has_k
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(has_k) AS BIGINT) AS with_key,
       ROUND(SUM(has_k) * 1.0 / COUNT(*), 6) AS coverage
FROM e GROUP BY event_type ORDER BY event_type""")
def props_key_coverage(sf_dir: str) -> pd.DataFrame:
    """Semi-structured completeness audit: per event type, the share
    of rows whose props JSON actually carries the `k` field — the
    null-rate table for schemaless payloads (a type at 40% coverage
    means its producer only sometimes attaches the field, and every
    props-derived metric silently drops the rest). One vectorized
    regex-presence pass; per-type integer partials."""
    def flags(batch: pa.Table) -> pd.DataFrame:
        ext = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        has = pc.is_valid(ext).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "n_events": np.ones(len(has), np.int64),
            "with_key": has})

    out = reduce_sink(
        _events(sf_dir, ["event_type", "props"])
        .map_batches(flags, batch_format="pyarrow"),
        ["event_type"], {"n_events": ("n_events", "sum"),
                         "with_key": ("with_key", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    out = out.astype({"n_events": np.int64, "with_key": np.int64})
    out["coverage"] = textstats.round_half_away(
        out["with_key"].to_numpy(np.float64)
        / out["n_events"].to_numpy(np.float64), 6)
    return out


@register("centroid_label_mrr", sql="""
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
r AS (SELECT vec_id, true_label, pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, pred_label) AS rk
      FROM s),
m AS (SELECT CAST(rk AS BIGINT) AS rank_of_true FROM r
      WHERE pred_label = true_label)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(SUM(1.0 / rank_of_true) / COUNT(*), 6) AS mrr,
       CAST(SUM(CASE WHEN rank_of_true = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS top1,
       CAST(SUM(CASE WHEN rank_of_true <= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS top2
FROM m""")
def centroid_label_mrr(sf_dir: str) -> pd.DataFrame:
    """Mean reciprocal rank of the TRUE label under the centroid
    similarity ranking (plus top-1/top-2 hits) — the retrieval view
    of classification: accuracy says right-or-wrong, MRR says HOW
    wrong (true label second vs last changes whether a rerank stage
    can rescue it). Same 9dp-rounded cosine + smaller-label tie
    convention as centroid_confusion; per-batch matmul ranks against
    the broadcast L×d centroid matrix; one (Σ1/rank, hits) partial
    per batch shuffles."""
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
                      {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .to_pandas()
    agg["m"] = agg["s"] / agg["n"]
    piv = agg.pivot(index="label", columns="dim", values="m") \
        .sort_index()
    labels = piv.index.to_numpy(np.int64)
    C = piv.to_numpy(np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put((labels, Cn))

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        labs, cn = ray.get(c_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ cn.T, 9)
        # rank of true label under (sim desc, label asc): count of
        # labels strictly better, plus equal-sim smaller labels
        li = np.searchsorted(labs, df["label"].to_numpy(np.int64))
        true_sim = sims[np.arange(len(m)), li]
        better = (sims > true_sim[:, None]).sum(axis=1)
        tie_before = ((sims == true_sim[:, None])
                      & (labs[None, :] < labs[li][:, None])) \
            .sum(axis=1)
        rk = better + tie_before + 1
        return pd.DataFrame({
            "n": [np.int64(len(rk))],
            "inv_sum": [float((1.0 / rk).sum())],
            "top1": [np.int64((rk == 1).sum())],
            "top2": [np.int64((rk <= 2).sum())]})

    t = ds.map_batches(ranks, batch_format="pandas").to_pandas() \
        .sum()
    n = int(t["n"])
    return pd.DataFrame({
        "n_points": np.array([n], np.int64),
        "mrr": [float(textstats.round_half_away(
            np.array([float(t["inv_sum"]) / n]), 6)[0])],
        "top1": np.array([int(t["top1"])], np.int64),
        "top2": np.array([int(t["top2"])], np.int64)})


@register("session_oscillation_rate", sql=f"""
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
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tri,
             CAST(SUM(CASE WHEN t1 = t3 AND t1 != t2 THEN 1 ELSE 0
                           END) AS BIGINT) AS aba
      FROM w WHERE t3 IS NOT NULL)
SELECT n_tri AS n_trigrams, aba AS aba_trigrams,
       ROUND(aba * 1.0 / n_tri, 6) AS oscillation_rate
FROM g""")
def session_oscillation_rate(sf_dir: str) -> pd.DataFrame:
    """Oscillation (A→B→A) share of sliding session trigrams — the
    rage-toggle signal: users bouncing between two states (view↔
    error, click↔view) instead of progressing; the motif TOP-15
    can miss it when the oscillation spreads across many distinct
    (A,B) pairs, so this folds ALL of them into one rate. Same
    bucket-local sessionize+slide pass; two integers and one
    division."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def tri(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        n = len(g)
        if n < 3:
            return pd.DataFrame({"n_tri": [np.int64(0)],
                                 "aba": [np.int64(0)]})
        cont = np.zeros(n, bool)
        cont[1:] = (uid[1:] == uid[:-1]) \
            & ((us[1:] - us[:-1]) < 1_800_000_000)
        ok = cont[1:-1] & cont[2:]
        i = np.flatnonzero(ok)
        aba = (et[i] == et[i + 2]) & (et[i] != et[i + 1])
        return pd.DataFrame({"n_tri": [np.int64(len(i))],
                             "aba": [np.int64(aba.sum())]})

    t = (ds.map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_").map_groups(tri, batch_format="pandas")) \
        .to_pandas().sum()
    n_tri, aba = int(t["n_tri"]), int(t["aba"])
    return pd.DataFrame({
        "n_trigrams": np.array([n_tri], np.int64),
        "aba_trigrams": np.array([aba], np.int64),
        "oscillation_rate": [float(textstats.round_half_away(
            np.array([aba * 1.0 / n_tri]), 6)[0])]})


@register("capacity_utilization_profile", sql="""
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hb,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
sp AS (SELECT MIN(hb) AS h0, MAX(hb) AS h1,
              CAST(MAX(n) AS BIGINT) AS peak,
              CAST(SUM(n) AS BIGINT) AS total FROM h)
SELECT CAST(h1 - h0 + 1 AS BIGINT) AS span_hours,
       total AS n_events, peak AS peak_hour_events,
       ROUND(total * 1.0 / ((h1 - h0 + 1) * peak), 6)
           AS utilization,
       ROUND(peak * (h1 - h0 + 1) * 1.0 / total, 6)
           AS overprovision_factor
FROM sp""")
def capacity_utilization_profile(sf_dir: str) -> pd.DataFrame:
    """Capacity utilization: actual volume ÷ (span-hours × peak-hour
    rate) — the fraction of peak-sized provisioning that ever gets
    used (utilization 0.15 means a fleet sized to the worst hour
    idles 85% of the time; the overprovision factor is its
    reciprocal — the autoscaling business case in one number). One
    hour-bucket count reduce; empty hours count via the span, not by
    materializing them."""
    h = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(
            lambda df: pd.DataFrame({
                "hb": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 3_600_000_000,
                "n": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        ["hb"], {"n": ("n", "sum")}).to_pandas()
    hb = h["hb"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    span = int(hb.max() - hb.min()) + 1
    total = int(n.sum())
    peak = int(n.max())
    r = textstats.round_half_away
    return pd.DataFrame({
        "span_hours": np.array([span], np.int64),
        "n_events": np.array([total], np.int64),
        "peak_hour_events": np.array([peak], np.int64),
        "utilization": [float(r(np.array(
            [total * 1.0 / (span * peak)]), 6)[0])],
        "overprovision_factor": [float(r(np.array(
            [peak * span * 1.0 / total]), 6)[0])]})


@register("bot_value_contamination", sql="""
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS c,
                  hour(ts) AS hr,
                  epoch_us(ts) - epoch_us(LAG(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id))
                      AS gap_us
           FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT hr) AS BIGINT) AS n_hours,
             CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
             CAST(SUM(CASE WHEN gap_us < 2000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_short
      FROM o GROUP BY user_id),
b AS (SELECT user_id,
             CASE WHEN n_events >= 50
                       AND (n_hours <= 2 OR 2 * n_short > n_gaps)
                  THEN 1 ELSE 0 END AS bot
      FROM u),
j AS (SELECT o.event_type, o.c, b.bot FROM o JOIN b USING (user_id))
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN bot = 1 THEN c ELSE 0 END) AS BIGINT)
           AS bot_cents,
       ROUND(SUM(CASE WHEN bot = 1 THEN c ELSE 0 END) * 1.0
             / SUM(c), 6) AS bot_value_share
FROM j GROUP BY event_type ORDER BY event_type""")
def bot_value_contamination(sf_dir: str) -> pd.DataFrame:
    """Dollars at risk in every value metric: per event type, the
    value share attributable to bot-flagged users (same integer rule
    as bot_user_detector) — a 20% bot share in 'purchase' value
    means every revenue dashboard overstates by a fifth; the flag
    count alone can't price that. The per-user rule computes in one
    bucket-local pass; flagged user ids broadcast back over a second
    pruned pass; only (type, cents) partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def bots(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        hr = (us // 3_600_000_000) % 24
        d = pd.DataFrame({"uid": uid, "hr": hr})
        per = d.groupby("uid").agg(n_events=("hr", "size"),
                                   n_hours=("hr", "nunique"))
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = us - np.roll(us, 1)
        short = pd.DataFrame({
            "uid": uid[same],
            "n_gaps": np.ones(int(same.sum()), np.int64),
            "n_short": (gap[same] < 2_000_000).astype(np.int64)}) \
            .groupby("uid").sum()
        per = per.join(short, how="left").fillna(0).astype(np.int64)
        bot = (per["n_events"] >= 50) \
            & ((per["n_hours"] <= 2)
               | (2 * per["n_short"] > per["n_gaps"]))
        return pd.DataFrame({"user_id": per.index[bot]
                             .to_numpy(np.int64)})

    flagged = (ds.map_batches(with_bucket, batch_format="pandas")
               .groupby("bucket_").map_groups(bots,
                                              batch_format="pandas")) \
        .to_pandas()
    # Ray drops the schema of all-empty block sets: zero flagged
    # bots is a legitimate answer, not a missing column
    ids = flagged["user_id"].tolist() \
        if "user_id" in flagged.columns else []
    bot_set = ray.put(set(ids))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(bot_set)
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        is_bot = df["user_id"].isin(bs).to_numpy()
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "total_cents": c,
            "bot_cents": np.where(is_bot, c, 0)}) \
            .groupby("event_type", as_index=False).sum()

    out = reduce_sink(
        _events(sf_dir, ["user_id", "event_type", "value"])
        .map_batches(split, batch_format="pandas"),
        ["event_type"], {"total_cents": ("total_cents", "sum"),
                         "bot_cents": ("bot_cents", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    out = out.astype({"total_cents": np.int64, "bot_cents": np.int64})
    out["bot_value_share"] = textstats.round_half_away(
        out["bot_cents"].to_numpy(np.float64)
        / out["total_cents"].to_numpy(np.float64), 6)
    return out


@register("atkinson_index_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS x
           FROM events GROUP BY 1),
p AS (SELECT CAST(x AS DOUBLE) AS x FROM u WHERE x > 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
             SUM(LN(x)) AS sln, SUM(1.0 / x) AS sinv FROM p)
SELECT 1.0 AS epsilon, n AS n_users,
       ROUND(1.0 - EXP(sln / n) / (sx / n), 6) AS atkinson FROM m
UNION ALL
SELECT 2.0 AS epsilon, n AS n_users,
       ROUND(1.0 - (n / sinv) / (sx / n), 6) AS atkinson FROM m
ORDER BY epsilon""")
def atkinson_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Atkinson inequality index of per-user total value at ε=1 and
    ε=2 — the WELFARE-weighted member of the inequality family (Gini
    and Theil are positional/information-theoretic): A(ε) answers
    "what share of total value could society discard and be equally
    well off under equal split?", with ε=1 the geometric-mean form
    (1 − geomean/mean) and ε=2 the harmonic form — ε picks how much
    the bottom of the distribution matters, which is exactly the
    policy knob Gini lacks. Same per-user cents reduce as
    [[theil_index_user_value]]; each batch then emits a 4-scalar
    partial (n, Σx, Σln x, Σ1/x over x>0) so the heavy work is one
    keyed reduce and the driver folds a handful of floats — identical
    ln/reciprocal term values on both engines, order noise ~1e-15
    against the 6-dp guard."""
    per = reduce_sink(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64),
                "x": np.rint(df["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)}),
            batch_format="pandas"),
        ["user_id"], {"x": ("x", "sum")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.float64)
        x = x[x > 0]
        return pd.DataFrame({
            "n": [np.int64(len(x))], "sx": [float(x.sum())],
            "sln": [float(np.log(x).sum())],
            "sinv": [float((1.0 / x).sum())]})

    p = per.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sx, sln = float(p["sx"].sum()), float(p["sln"].sum())
    sinv = float(p["sinv"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "epsilon": [1.0, 2.0],
        "n_users": np.array([n, n], np.int64),
        "atkinson": [float(r6(1.0 - np.exp(sln / n) / (sx / n), 6)),
                     float(r6(1.0 - (n / sinv) / (sx / n), 6))]})


@register("taylor_power_law_types", sql="""
WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
t AS (SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS tt
      FROM events),
m AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM c GROUP BY 1),
v AS (SELECT LN(CAST(s1 AS DOUBLE) / tt) AS lm,
             LN(CAST(s2 AS DOUBLE) / tt
                - (CAST(s1 AS DOUBLE) / tt)
                  * (CAST(s1 AS DOUBLE) / tt)) AS lv
      FROM m, t
      WHERE s1 > 0 AND CAST(s2 AS DOUBLE) / tt
            - (CAST(s1 AS DOUBLE) / tt)
              * (CAST(s1 AS DOUBLE) / tt) > 0),
o AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(lm) AS sx,
             SUM(lv) AS sy, SUM(lm * lm) AS sxx,
             SUM(lm * lv) AS sxy, SUM(lv * lv) AS syy FROM v)
SELECT CAST(k AS BIGINT) AS n_types,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
       ROUND((sy - sx * ((k * sxy - sx * sy)
                         / (k * sxx - sx * sx))) / k, 6)
           AS intercept,
       ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
             / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2
FROM o""")
def taylor_power_law_types(sf_dir: str) -> pd.DataFrame:
    """Taylor's power law across event types: Var(daily count) ∝
    Mean(daily count)^b — the variance–mean scaling exponent ecology
    and ops both read. b≈1 means Poisson-like (independent arrivals:
    provision ∝ mean), b→2 means bursty/clustered (swings scale with
    volume SQUARED — a popular type needs proportionally MORE
    headroom, and a mean-based capacity model underprovisions exactly
    the types that matter). Population moments per type come from the
    (type, day) count reduce — zero-filling the calendar is FREE
    because zero days change neither Σc nor Σc², only the common day
    denominator T — then the ln-ln OLS across k types solves on k
    pairs of identical-integer-derived doubles in the oracle's
    expression order."""
    a = reduce_sink(_events(sf_dir, ["ts", "event_type"]).map_batches(
        lambda df: pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64)}), batch_format="pandas"),
        ["event_type", "day"], {"c": ("day", "size")}).to_pandas()
    tt = float(a["day"].nunique())
    g = a.groupby("event_type", sort=True)
    s1 = g["c"].sum().to_numpy(np.int64)
    s2 = g["c"].apply(lambda s: int((s.to_numpy(np.int64) ** 2).sum())) \
        .to_numpy(np.int64)
    mean = s1.astype(np.float64) / tt
    var = s2.astype(np.float64) / tt - mean * mean
    keep = (s1 > 0) & (var > 0)
    lm, lv = np.log(mean[keep]), np.log(var[keep])
    k = float(len(lm))
    sx, sy = float(lm.sum()), float(lv.sum())
    sxx, sxy = float((lm * lm).sum()), float((lm * lv).sum())
    syy = float((lv * lv).sum())
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - sx * ((k * sxy - sx * sy)
                            / (k * sxx - sx * sx))) / k
    r2 = ((k * sxy - sx * sy) * (k * sxy - sx * sy)
          / ((k * sxx - sx * sx) * (k * syy - sy * sy)))
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_types": np.array([int(k)], np.int64),
        "slope": [float(r6(slope, 6))],
        "intercept": [float(r6(intercept, 6))],
        "r2": [float(r6(r2, 6))]})


@register("order_backlog_monthly", sql="""
WITH f AS (SELECT l_orderkey, strftime(MAX(l_shipdate), '%Y-%m') AS fm
           FROM lineitem GROUP BY 1),
p AS (SELECT strftime(o_orderdate, '%Y-%m') AS m,
             CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY 1),
q AS (SELECT fm AS m, CAST(COUNT(*) AS BIGINT) AS c
      FROM f GROUP BY 1),
months AS (SELECT m FROM p UNION SELECT m FROM q),
g AS (SELECT months.m, COALESCE(p.c, 0) AS pc, COALESCE(q.c, 0) AS fc
      FROM months LEFT JOIN p ON p.m = months.m
                  LEFT JOIN q ON q.m = months.m)
SELECT m AS month,
       CAST(SUM(pc) OVER (ORDER BY m) AS BIGINT) AS placed_cum,
       CAST(SUM(fc) OVER (ORDER BY m) AS BIGINT) AS fulfilled_cum,
       CAST(SUM(pc - fc) OVER (ORDER BY m) AS BIGINT) AS backlog
FROM g ORDER BY m""")
def order_backlog_monthly(sf_dir: str) -> pd.DataFrame:
    """Open-order BACKLOG curve by month-end: cumulative orders
    placed minus cumulative orders fully shipped (an order counts
    fulfilled in the month of its LAST lineitem shipment). Rising
    backlog = fulfillment falling behind intake — the operations
    number the order-to-ship lag quantiles can't show because lag
    only exists for orders that DID ship. No join needed anywhere:
    the placed histogram comes from orders alone and the fulfilled
    histogram from the per-order max-shipdate reduce alone (an order
    with no lineitems simply never leaves the backlog); the driver
    cumsums ≤|months| integer rows."""
    placed = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"]).map_batches(
            lambda df: pd.DataFrame({
                "m": df["o_orderdate"].dt.strftime("%Y-%m")}),
            batch_format="pandas"),
        ["m"], {"pc": ("m", "size")}).to_pandas()
    fmax = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda df: pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "d": df["l_shipdate"].to_numpy("datetime64[us]")
                .astype("datetime64[D]").astype(np.int64)}),
            batch_format="pandas"),
        ["l_orderkey"], {"d": ("d", "max")})
    fulfilled = reduce_sink(fmax.map_batches(
        lambda df: pd.DataFrame({
            "m": np.datetime_as_string(
                df["d"].to_numpy(np.int64).astype("datetime64[D]")
                .astype("datetime64[M]"))}),
        batch_format="pandas"),
        ["m"], {"fc": ("m", "size")}).to_pandas()
    g = placed.merge(fulfilled, on="m", how="outer").fillna(0) \
        .sort_values("m", ignore_index=True)
    pc = g["pc"].to_numpy(np.int64)
    fc = g["fc"].to_numpy(np.int64)
    return pd.DataFrame({
        "month": g["m"],
        "placed_cum": np.cumsum(pc),
        "fulfilled_cum": np.cumsum(fc),
        "backlog": np.cumsum(pc - fc)})


@register("brand_rank_stability", sql="""
WITH b AS (SELECT l_partkey, epoch_us(l_shipdate) // 86400000000 AS d,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                      AS r
           FROM lineitem),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
j AS (SELECT p_brand AS brand,
             CAST(SUM(CASE WHEN d < cut THEN r ELSE 0 END)
                  AS BIGINT) AS r1,
             CAST(SUM(CASE WHEN d >= cut THEN r ELSE 0 END)
                  AS BIGINT) AS r2
      FROM b JOIN part ON p_partkey = l_partkey, sp GROUP BY 1),
pr AS (SELECT SIGN(a.r1 - bb.r1) AS s1, SIGN(a.r2 - bb.r2) AS s2
       FROM j a JOIN j bb ON a.brand < bb.brand),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN s1 * s2 > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN s1 * s2 < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN s1 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1,
             CAST(SUM(CASE WHEN s2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS t2
      FROM pr),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM j)
SELECT nb AS n_brands, nc AS concordant, nd AS discordant,
       ROUND((nc - nd) / SQRT((n0 - t1) * 1.0 * (n0 - t2)), 6)
           AS tau_b
FROM m, k""")
def brand_rank_stability(sf_dir: str) -> pd.DataFrame:
    """Kendall tau-b between brand revenue RANKINGS in the first vs
    second half of the shipdate span — is the brand league table
    stable period over period (tau→1: rankings are signal, last
    period predicts next) or churning (tau→0: rank-based shelf/buy
    decisions are fitting noise)? Same (min+max+1)//2 day cut as
    [[gibrat_growth_test]]; revenue in exact deci-milli-cent integers
    via the broadcast part→brand map, so the per-(brand, half) reduce
    emits ≤2·|brands| integer rows and the all-pairs tau over ~25
    brands is trivial on BOTH engines — concordant/discordant/tie
    counts are exact integer sign comparisons, one sqrt at the end."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    span = li.map_batches(
        lambda df: pd.DataFrame({
            "lo": [df["l_shipdate"].to_numpy("datetime64[us]")
                   .astype(np.int64).min() // 86_400_000_000],
            "hi": [df["l_shipdate"].to_numpy("datetime64[us]")
                   .astype(np.int64).max() // 86_400_000_000]}),
        batch_format="pandas").to_pandas()
    cut = (int(span["lo"].min()) + int(span["hi"].max()) + 1) // 2
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    brand_of = dict(zip(part["p_partkey"].to_pylist(),
                        part["p_brand"].to_pylist()))
    bref = ray.put(brand_of)

    def halves(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bref)
        d = df["l_shipdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        r = (np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100)
             .astype(np.int64)
             * (100 - np.rint(df["l_discount"].to_numpy(np.float64)
                              * 100).astype(np.int64)))
        pre = d < cut
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).astype(str),
            "r1": np.where(pre, r, 0),
            "r2": np.where(pre, 0, r)})

    j = reduce_sink(li.map_batches(halves, batch_format="pandas"),
                    ["brand"], {"r1": ("r1", "sum"),
                                "r2": ("r2", "sum")}) \
        .to_pandas().sort_values("brand", ignore_index=True)
    r1 = j["r1"].to_numpy(np.int64)
    r2 = j["r2"].to_numpy(np.int64)
    nb = len(j)
    ia, ib = np.triu_indices(nb, k=1)
    s1 = np.sign(r1[ia] - r1[ib])
    s2 = np.sign(r2[ia] - r2[ib])
    n0 = len(ia)
    nc = int(((s1 * s2) > 0).sum())
    nd = int(((s1 * s2) < 0).sum())
    t1, t2 = int((s1 == 0).sum()), int((s2 == 0).sum())
    tau = (nc - nd) / np.sqrt((n0 - t1) * 1.0 * (n0 - t2))
    return pd.DataFrame({
        "n_brands": np.array([nb], np.int64),
        "concordant": np.array([nc], np.int64),
        "discordant": np.array([nd], np.int64),
        "tau_b": [float(textstats.round_half_away(tau, 6))]})
