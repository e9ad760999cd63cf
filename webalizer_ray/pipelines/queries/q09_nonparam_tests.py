"""Driver-contract queries (chunk 9/18).
Sections:
  - southwest exclusive 2-D cumulative: pairs below-left of (i,j)
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
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
    _sessionized_events,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _DAILY_SQL,
    _daily_counts,
)



@register("jonckheere_priority_value", sql="""
WITH c AS (SELECT CASE o_orderpriority
                  WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                  WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                  ELSE 5 END AS g,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
h AS (SELECT cents,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(SUM(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1),
cum AS (SELECT c1, c2, c3, c4, c5,
               SUM(c1) OVER (ORDER BY cents) - c1 AS f1,
               SUM(c2) OVER (ORDER BY cents) - c2 AS f2,
               SUM(c3) OVER (ORDER BY cents) - c3 AS f3,
               SUM(c4) OVER (ORDER BY cents) - c4 AS f4
        FROM h),
jj AS (SELECT CAST(SUM(
            CAST(c2 AS HUGEINT) * (2 * f1 + c1)
          + CAST(c3 AS HUGEINT) * (2 * f1 + c1 + 2 * f2 + c2)
          + CAST(c4 AS HUGEINT) * (2 * f1 + c1 + 2 * f2 + c2
                                   + 2 * f3 + c3)
          + CAST(c5 AS HUGEINT) * (2 * f1 + c1 + 2 * f2 + c2
                                   + 2 * f3 + c3 + 2 * f4 + c4))
            AS HUGEINT) AS j2 FROM cum),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c3) AS BIGINT) AS n3,
             CAST(SUM(c4) AS BIGINT) AS n4,
             CAST(SUM(c5) AS BIGINT) AS n5,
             CAST(SUM(tt) AS BIGINT) AS n,
             CAST(SUM(CAST(tt AS HUGEINT) * (tt - 1) * (2 * tt + 5))
                  AS HUGEINT) AS ta,
             CAST(SUM(CAST(tt AS HUGEINT) * (tt - 1) * (tt - 2))
                  AS HUGEINT) AS tb,
             CAST(SUM(CAST(tt AS HUGEINT) * (tt - 1)) AS HUGEINT) AS tc
      FROM h),
f AS (SELECT n, j2,
             CAST(n AS HUGEINT) * n
             - (CAST(n1 AS HUGEINT) * n1 + CAST(n2 AS HUGEINT) * n2
                + CAST(n3 AS HUGEINT) * n3 + CAST(n4 AS HUGEINT) * n4
                + CAST(n5 AS HUGEINT) * n5) AS dd,
             CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)
                  - (CAST(n1 AS HUGEINT) * (n1 - 1) * (2 * n1 + 5)
                     + CAST(n2 AS HUGEINT) * (n2 - 1) * (2 * n2 + 5)
                     + CAST(n3 AS HUGEINT) * (n3 - 1) * (2 * n3 + 5)
                     + CAST(n4 AS HUGEINT) * (n4 - 1) * (2 * n4 + 5)
                     + CAST(n5 AS HUGEINT) * (n5 - 1) * (2 * n5 + 5))
                  - ta AS DOUBLE) / 72.0
             + CAST((CAST(n1 AS HUGEINT) * (n1 - 1) * (n1 - 2)
                     + CAST(n2 AS HUGEINT) * (n2 - 1) * (n2 - 2)
                     + CAST(n3 AS HUGEINT) * (n3 - 1) * (n3 - 2)
                     + CAST(n4 AS HUGEINT) * (n4 - 1) * (n4 - 2)
                     + CAST(n5 AS HUGEINT) * (n5 - 1) * (n5 - 2)) * tb
                    AS DOUBLE)
               / (36.0 * n * (n - 1) * (n - 2))
             + CAST((CAST(n1 AS HUGEINT) * (n1 - 1)
                     + CAST(n2 AS HUGEINT) * (n2 - 1)
                     + CAST(n3 AS HUGEINT) * (n3 - 1)
                     + CAST(n4 AS HUGEINT) * (n4 - 1)
                     + CAST(n5 AS HUGEINT) * (n5 - 1)) * tc AS DOUBLE)
               / (8.0 * n * (n - 1)) AS var
      FROM jj, t)
SELECT n, CAST(j2 AS BIGINT) AS j2,
       ROUND(CASE WHEN var > 0
                  THEN CAST(2 * j2 - dd AS DOUBLE) / (4.0 * SQRT(var))
                  ELSE 0 END, 6) AS z,
       CAST(CASE WHEN var > 0
                  AND ABS(CAST(2 * j2 - dd AS DOUBLE)
                          / (4.0 * SQRT(var))) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS ordered_rejected
FROM f""")
def jonckheere_priority_value(sf_dir: str) -> pd.DataFrame:
    """Jonckheere–Terpstra test for an ORDERED alternative across the
    five order-priority levels (1-URGENT → 5-LOW): does order value
    stochastically rise or fall as priority relaxes? Kruskal–Wallis
    only answers "some level differs somewhere"; JT pools the
    C(5,2) = 10 pairwise Mann–Whitney counts IN the a-priori
    direction, so a consistent monotone drift that is too small for
    any single pairwise test reaches significance — the right screen
    for "do customers pay for urgency". J* = Σ_{i<j} U_ij with ½
    ties comes exactly off ONE (priority, cents) contingency as a
    DOUBLED integer — per cents value v, 2J gains
    Σ_{i<j} c_j(v)·(2·F_i(<v) + c_i(v)) via exclusive cumulative
    sums over the shared sorted grid, 128-bit on both engines. The
    null moments use the full Hollander–Wolfe tie-corrected
    variance (A/72 + B/(36N(N−1)(N−2)) + C/(8N(N−1)) from exact
    integer group/tie sums) and E = (N²−Σnᵢ²)/4, so
    z = (2·2J − (N²−Σnᵢ²))/(4√Var) is one identical float
    expression from exact integers on both sides."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        pr = df["o_orderpriority"].to_numpy()
        g = np.full(len(df), 5, np.int64)
        for i, p in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM",
                               "4-NOT SPECIFIED"]):
            g[pr == p] = i + 1
        return pd.DataFrame({
            "g": g,
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "cnt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "cents"], {"cnt": ("cnt", "sum")}).to_pandas()
    piv = h.pivot_table(index="cents", columns="g", values="cnt",
                        aggfunc="sum", fill_value=0) \
        .reindex(columns=[1, 2, 3, 4, 5], fill_value=0).sort_index()
    cm = piv.to_numpy(np.int64)          # V × 5 contingency
    fm = cm.cumsum(axis=0) - cm          # exclusive per-group CDF
    j2 = 0
    for j in range(1, 5):
        acc = np.zeros(len(cm), np.int64)
        for i in range(j):
            acc += 2 * fm[:, i] + cm[:, i]
        j2 += int((cm[:, j].astype(object) * acc.astype(object)).sum())
    ni = [int(v) for v in cm.sum(axis=0)]
    n = sum(ni)
    tt = cm.sum(axis=1).astype(object)
    ta = int((tt * (tt - 1) * (2 * tt + 5)).sum())
    tb = int((tt * (tt - 1) * (tt - 2)).sum())
    tc = int((tt * (tt - 1)).sum())
    dd = n * n - sum(v * v for v in ni)
    ga = n * (n - 1) * (2 * n + 5) \
        - sum(v * (v - 1) * (2 * v + 5) for v in ni) - ta
    gb = sum(v * (v - 1) * (v - 2) for v in ni) * tb
    gc = sum(v * (v - 1) for v in ni) * tc
    var = float(ga) / 72.0 \
        + float(gb) / (36.0 * n * (n - 1) * (n - 2)) \
        + float(gc) / (8.0 * n * (n - 1))
    z = float(2 * j2 - dd) / (4.0 * np.sqrt(var)) if var > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "j2": np.array([j2], np.int64),
        "z": [float(rha(z, 6))],
        "ordered_rejected": np.array(
            [1 if var > 0 and abs(z) > 1.959964 else 0], np.int64)})


@register("page_trend_weekday", sql="""
WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
w AS (SELECT (d + 4) // 7 AS wk, (d + 4) % 7 AS dow, y FROM d),
cw AS (SELECT wk FROM w GROUP BY wk HAVING COUNT(*) = 7),
r AS (SELECT w.wk, w.dow,
             2 * RANK() OVER (PARTITION BY w.wk ORDER BY w.y)
             + (COUNT(*) OVER (PARTITION BY w.wk, w.y) - 1) AS rk2
      FROM w JOIN cw ON w.wk = cw.wk),
s AS (SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS b,
             CAST(COALESCE(SUM((dow + 1) * rk2), 0) AS BIGINT) AS l2
      FROM r)
SELECT b AS n_weeks, l2,
       ROUND(CASE WHEN b > 0
                  THEN CAST(l2 - 224 * b AS DOUBLE)
                       / (2.0 * SQRT(CAST(b AS DOUBLE) * 392.0 / 3.0))
                  ELSE 0 END, 6) AS z,
       CAST(CASE WHEN b > 0
                  AND ABS(CAST(l2 - 224 * b AS DOUBLE)
                          / (2.0 * SQRT(CAST(b AS DOUBLE)
                                        * 392.0 / 3.0))) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS trend_rejected
FROM s""")
def page_trend_weekday(sf_dir: str) -> pd.DataFrame:
    """Page's L test for a MONOTONE weekday trend in daily volume:
    blocks are complete Sunday-aligned epoch weeks ((d+4)//7 — pure
    integer arithmetic, no calendar library has to agree), ordered
    treatments are the 7 positions Sun..Sat, data are the daily
    counts midranked WITHIN each week. Friedman (which this repo
    already runs across event types) only says "the weekdays
    differ"; Page's L = Σ_w Σ_j (j+1)·r_{wj} is its ordered-
    alternative counterpart — it detects the through-the-week ramp
    (or weekend decay) that per-dow means hint at but never test,
    and because ranking is per-block it is immune to week-to-week
    level shifts, launches and outages that wreck a pooled dow
    ANOVA. Midranks double to exact integers (2r = 2·RANK +
    (ties−1)) so L2 = 2L is an exact integer on both engines;
    E[L] = 112b and Var[L] = 392b/3 for k = 7 give
    z = (L2 − 224b)/(2√(392b/3)) as one shared float expression.
    Weeks missing a day (including zero-event days, which never
    reach the daily reduce) drop out as incomplete blocks on both
    sides; the week grid is calendar-bounded so everything after
    the (epoch_day, count) reduce is driver-side postage-stamp
    arithmetic at any event scale."""
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
    dv = daily["d"].to_numpy(np.int64)
    df = pd.DataFrame({"wk": (dv + 4) // 7, "dow": (dv + 4) % 7,
                       "y": daily["y"].to_numpy(np.int64)})
    sizes = df.groupby("wk")["y"].transform("size")
    df = df[sizes == 7]
    b = int(df["wk"].nunique())
    if b == 0:
        l2, z = 0, 0.0
    else:
        rk = df.groupby("wk")["y"].rank(method="average")
        rk2 = np.rint(2 * rk.to_numpy(np.float64)).astype(np.int64)
        l2 = int(((df["dow"].to_numpy(np.int64) + 1) * rk2).sum())
        z = float(l2 - 224 * b) \
            / (2.0 * np.sqrt(float(b) * 392.0 / 3.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weeks": np.array([b], np.int64),
        "l2": np.array([l2], np.int64),
        "z": [float(rha(z, 6))],
        "trend_rejected": np.array(
            [1 if b > 0 and abs(z) > 1.959964 else 0], np.int64)})


@register("ansari_bradley_weekend_scale", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd
           FROM events),
h AS (SELECT cents,
             CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(SUM(1 - wkd) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1),
cum AS (SELECT c1, tt,
               SUM(tt) OVER (ORDER BY cents) - tt AS f,
               SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2,
               SUM(tt) OVER () AS n
        FROM h),
sc AS (SELECT c1, tt, n1, n2, n,
              (n + 1) - ABS(2 * f + tt - n) AS s2v
       FROM cum),
agg AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2, MAX(n) AS n,
               CAST(SUM(CAST(c1 AS HUGEINT) * s2v) AS HUGEINT) AS t2,
               CAST(SUM(CAST(tt AS HUGEINT) * s2v) AS HUGEINT) AS s1,
               CAST(SUM(CAST(tt AS HUGEINT) * s2v * s2v) AS HUGEINT)
                   AS s2
        FROM sc)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
       CAST(t2 AS BIGINT) AS ab2,
       ROUND((CAST(t2 AS DOUBLE) - CAST(n1 AS DOUBLE) * s1 / n)
             / SQRT(CAST(n1 AS DOUBLE) * n2
                    * CAST(n * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z,
       CAST(CASE WHEN ABS((CAST(t2 AS DOUBLE)
                           - CAST(n1 AS DOUBLE) * s1 / n)
                          / SQRT(CAST(n1 AS DOUBLE) * n2
                                 * CAST(n * s2 - s1 * s1 AS DOUBLE)
                                 / (CAST(n AS DOUBLE) * n * (n - 1))))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS scale_rejected
FROM agg""")
def ansari_bradley_weekend_scale(sf_dir: str) -> pd.DataFrame:
    """Ansari–Bradley rank test of SCALE between weekend and weekday
    event values — are weekend transactions more spread out, not just
    shifted? The location family (Mann–Whitney, Hodges–Lehmann,
    Welch) is blind to a pure dispersion change, and the parametric
    variance tests (Bartlett) are wrecked by the heavy value tail;
    AB scores each observation by its distance from the pooled
    EDGES, a_j = (N+1)/2 − |r_j − (N+1)/2|, so a sample concentrated
    in the middle (low dispersion) collects large scores. Everything
    is exact off ONE (cents, weekend) histogram: doubled midranks
    2r_v = 2F(<v) + t_v + 1 make the doubled score
    s2_v = (N+1) − |2F+t−N| an integer per value, and the general
    linear-rank permutation moments E[T] = n1·S1/N,
    Var[T] = n1n2(N·S2 − S1²)/(N²(N−1)) (S1 = Σt·s, S2 = Σt·s²,
    128-bit on both engines) absorb ties with no special casing.
    z < 0 ⇒ weekend values MORE dispersed (low edge scores)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "c1": wkd, "c2": 1 - wkd,
            "tt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("c1", "sum"), "c2": ("c2", "sum"),
                    "tt": ("tt", "sum")}).to_pandas() \
        .sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64).astype(object)
    tt = h["tt"].to_numpy(np.int64).astype(object)
    n1 = int(c1.sum())
    n = int(tt.sum())
    n2 = n - n1
    f = tt.cumsum() - tt
    s2v = (n + 1) - abs(2 * f + tt - n)
    t2 = int((c1 * s2v).sum())
    s1 = int((tt * s2v).sum())
    s2 = int((tt * s2v * s2v).sum())
    num = float(t2) - float(n1) * s1 / n
    den = np.sqrt(float(n1) * n2 * float(n * s2 - s1 * s1)
                  / (float(n) * n * (n - 1)))
    z = num / den
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n2], np.int64),
        "ab2": np.array([t2], np.int64),
        "z": [float(rha(z, 6))],
        "scale_rejected": np.array(
            [1 if abs(z) > 1.959964 else 0], np.int64)})


@register("mood_median_test_by_type", sql="""
WITH c AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
h AS (SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2),
tot AS (SELECT cents, CAST(SUM(cnt) AS BIGINT) AS tv FROM h GROUP BY 1),
cum AS (SELECT cents, SUM(tv) OVER (ORDER BY cents) AS cm,
               SUM(tv) OVER () AS n
        FROM tot),
med AS (SELECT MIN(CASE WHEN cm >= (n + 1) // 2 THEN cents END) AS m
        FROM cum),
per AS (SELECT h.g, CAST(SUM(h.cnt) AS BIGINT) AS ni,
               CAST(SUM(CASE WHEN h.cents > med.m
                             THEN h.cnt ELSE 0 END) AS BIGINT) AS ai
        FROM h CROSS JOIN med GROUP BY 1),
ab AS (SELECT CAST(SUM(ai) AS BIGINT) AS a,
              CAST(SUM(ni) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS k
       FROM per),
x2 AS (SELECT ab.k, ab.n, ab.a, med.m,
              SUM(POWER(ai - CAST(ni AS DOUBLE) * a / n, 2)
                  / (CAST(ni AS DOUBLE) * a / n)
                  + POWER((ni - ai)
                          - CAST(ni AS DOUBLE) * (n - a) / n, 2)
                    / (CAST(ni AS DOUBLE) * (n - a) / n)) AS chi2
       FROM per CROSS JOIN ab CROSS JOIN med
       GROUP BY 1, 2, 3, 4)
SELECT k, n, CAST(m AS BIGINT) AS grand_median_cents,
       a AS n_above, ROUND(chi2, 6) AS chi2,
       CAST(CASE WHEN chi2 > CASE k WHEN 2 THEN 3.841459
                                    WHEN 3 THEN 5.991465
                                    WHEN 4 THEN 7.814728
                                    WHEN 5 THEN 9.487729
                                    ELSE 11.070498 END
                 THEN 1 ELSE 0 END AS BIGINT) AS median_rejected
FROM x2""")
def mood_median_test_by_type(sf_dir: str) -> pd.DataFrame:
    """Mood's median test across event types: split every value at
    the GRAND low median (smallest cents whose cumulative count
    reaches ⌈N/2⌉ — an exact order statistic off the shared
    histogram, no interpolation to disagree over) and chi²-test the
    k×2 above/not-above table. Kruskal–Wallis already compares mean
    ranks, but it can reject on shape alone; the median test asks
    the blunter, more robust question — do the types' MEDIANS differ
    — and survives arbitrarily heavy tails because each value only
    contributes one bit. Ties AT the median count as not-above
    (documented convention, same on both engines). Per-type
    (above, total) pairs are exact integers off one (type, cents)
    contingency; chi² = Σ (O−E)²/E with E = nᵢA/N rational, the only
    float the final shared expression, rejected at the χ²_{k−1} 5%
    point via a small CASE ladder."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "cnt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "cents"], {"cnt": ("cnt", "sum")}).to_pandas()
    tot = h.groupby("cents")["cnt"].sum().sort_index()
    cm = tot.cumsum()
    n = int(tot.sum())
    m = int(cm.index[np.searchsorted(cm.to_numpy(), (n + 1) // 2)])
    per = h.groupby("g").apply(
        lambda d: pd.Series({
            "ni": int(d["cnt"].sum()),
            "ai": int(d.loc[d["cents"] > m, "cnt"].sum())}),
        include_groups=False).reset_index().sort_values("g")
    k = len(per)
    a = int(per["ai"].sum())
    chi2 = 0.0
    for _, r in per.iterrows():
        ni, ai = int(r["ni"]), int(r["ai"])
        e1 = float(ni) * a / n
        e2 = float(ni) * (n - a) / n
        chi2 += (ai - e1) ** 2 / e1 + ((ni - ai) - e2) ** 2 / e2
    crit = {2: 3.841459, 3: 5.991465, 4: 7.814728,
            5: 9.487729}.get(k, 11.070498)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "k": np.array([k], np.int64),
        "n": np.array([n], np.int64),
        "grand_median_cents": np.array([m], np.int64),
        "n_above": np.array([a], np.int64),
        "chi2": [float(rha(chi2, 6))],
        "median_rejected": np.array(
            [1 if chi2 > crit else 0], np.int64)})


@register("inclan_tiao_variance_break", sql=f"""
WITH {_DAILY_SQL},
st AS (SELECT MAX(n) AS n, CAST(SUM(y) AS BIGINT) AS s FROM x),
e AS (SELECT x.t, st.n * x.y - st.s AS f FROM x CROSS JOIN st),
c AS (SELECT t, CAST(SUM(CAST(f AS HUGEINT) * f)
                     OVER (ORDER BY t) AS HUGEINT) AS ck,
             CAST(SUM(CAST(f AS HUGEINT) * f) OVER () AS HUGEINT) AS cn
      FROM e),
dv AS (SELECT c.t, ck, cn, st.n,
              ABS(CAST(st.n * ck - c.t * cn AS DOUBLE))
              / (CAST(st.n AS DOUBLE) * cn) AS dk
       FROM c CROSS JOIN st WHERE c.t < st.n),
top AS (SELECT * FROM dv ORDER BY dk DESC, t LIMIT 1),
dd AS (SELECT strftime(ts, '%Y-%m-%d') AS dt FROM events GROUP BY 1),
dr AS (SELECT dt, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT)
                      AS t
       FROM dd)
SELECT top.n AS n_days, dr.dt AS break_date,
       ROUND(top.dk, 6) AS d_abs,
       ROUND(SQRT(top.n / 2.0) * top.dk, 6) AS it_stat,
       CAST(CASE WHEN SQRT(top.n / 2.0) * top.dk > 1.358
                 THEN 1 ELSE 0 END AS BIGINT) AS var_break_rejected
FROM top JOIN dr ON dr.t = top.t""")
def inclan_tiao_variance_break(sf_dir: str) -> pd.DataFrame:
    """Inclán–Tiao centered CUSUM-of-squares locator for a VARIANCE
    regime break in the daily series: D_k = C_k/C_n − k/n over
    cumulative squared mean-deviations, stat = √(n/2)·max|D_k|
    against the 1.358 Brownian-bridge 5% point. Pettitt and the
    level CUSUM find where the MEAN shifted; this finds where the
    VOLATILITY changed — the day traffic went from steady to
    erratic (autoscaler flapping, a retry storm, a noisy tenant)
    even when the average is flat. Deviations scale to exact
    integers f_t = n·y_t − S, so C_k is an exact 128-bit cumulative
    and every D_k numerator n·C_k − k·C_n is integer — the only
    float is the final shared ratio. Ties on |D_k| break to the
    earliest day on both engines; the whole scan is
    calendar-bounded."""
    y = _daily_counts(sf_dir)
    n = len(y)
    s = int(y.sum())
    f = (n * y.astype(object) - s)
    fsq = f * f
    ck = fsq.cumsum()
    cn = int(fsq.sum())
    k = np.arange(1, n + 1, dtype=object)
    num = n * ck - k * cn
    dk = np.abs(num[: n - 1].astype(np.float64)) / (float(n) * cn)
    i = int(np.argmax(dk))  # first max = earliest day
    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "date", pc.strftime(batch["ts"], format="%Y-%m-%d"))
    dts = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["date"], {"y": ("date", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    stat = np.sqrt(n / 2.0) * dk[i]
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "break_date": [dts["date"].iloc[i]],
        "d_abs": [float(rha(dk[i], 6))],
        "it_stat": [float(rha(stat, 6))],
        "var_break_rejected": np.array(
            [1 if stat > 1.358 else 0], np.int64)})


@register("allan_variance_daily", sql=f"""
WITH {_DAILY_SQL},
taus AS (SELECT * FROM (VALUES (1), (2), (4), (8)) t(m)),
b AS (SELECT taus.m, (x.t - 1) // taus.m AS blk,
             CAST(SUM(x.y) AS BIGINT) AS bs,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM x CROSS JOIN taus GROUP BY 1, 2),
c AS (SELECT m, blk, bs FROM b WHERE cnt = m),
p AS (SELECT m, bs,
             LEAD(bs) OVER (PARTITION BY m ORDER BY blk) AS bs1
      FROM c),
s AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS mm,
             CAST(SUM(CASE WHEN bs1 IS NOT NULL
                           THEN CAST(bs1 - bs AS HUGEINT) * (bs1 - bs)
                           ELSE 0 END) AS HUGEINT) AS num
      FROM p GROUP BY 1)
SELECT CAST(m AS BIGINT) AS tau_days, mm AS n_blocks,
       ROUND(CASE WHEN mm > 1
                  THEN CAST(num AS DOUBLE)
                       / (2.0 * (mm - 1) * m * m)
                  ELSE 0 END, 6) AS avar
FROM s ORDER BY 1""")
def allan_variance_daily(sf_dir: str) -> pd.DataFrame:
    """Allan variance of the daily count series at τ = 1, 2, 4, 8
    days: AVAR(τ) = Σ(B̄_{i+1}−B̄_i)²/(2(M−1)) over means of
    consecutive complete τ-day index blocks. The clock-stability
    view of traffic noise the single-number VMR can't give — HOW
    AVAR falls with τ names the noise: ∝1/τ is white arrival noise
    that averaging provisions away, flat is flicker (correlated
    drift averaging can't beat), RISING is random-walk growth where
    longer planning windows are WORSE. Block sums are exact
    integers, so AVAR = Σ(B_{i+1}−B_i)²/(2(M−1)τ²) has an exact
    128-bit numerator on both engines; blocks are defined on the
    day INDEX (documented — the grid is the observed days), the
    trailing incomplete block drops, and the whole table is
    calendar-bounded driver-side arithmetic after the one daily
    reduce."""
    y = _daily_counts(sf_dir).astype(object)
    rha = textstats.round_half_away
    rows = []
    for m in (1, 2, 4, 8):
        mm = len(y) // m
        if mm >= 1:
            bs = np.array([int(y[i * m:(i + 1) * m].sum())
                           for i in range(mm)], dtype=object)
        else:
            bs = np.array([], dtype=object)
        if mm > 1:
            num = int(((bs[1:] - bs[:-1]) ** 2).sum())
            avar = float(num) / (2.0 * (mm - 1) * m * m)
        else:
            avar = 0.0
        rows.append((m, mm, float(rha(avar, 6))))
    return pd.DataFrame({
        "tau_days": np.array([r[0] for r in rows], np.int64),
        "n_blocks": np.array([r[1] for r in rows], np.int64),
        "avar": [r[2] for r in rows]})


@register("lin_ccc_views_clicks", sql="""
WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(SUM(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM c),
f AS (SELECT n,
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cov,
             CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vx,
             CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vy,
             CAST(CAST(sx - sy AS HUGEINT) * (sx - sy) AS DOUBLE)
                 AS gap2
      FROM s)
SELECT n AS n_days,
       ROUND(2.0 * cov / (vx + vy + gap2), 6) AS ccc,
       ROUND(cov / SQRT(vx * vy), 6) AS pearson,
       ROUND(2.0 * cov / (vx + vy + gap2)
             / (cov / SQRT(vx * vy)), 6) AS c_b
FROM f""")
def lin_ccc_views_clicks(sf_dir: str) -> pd.DataFrame:
    """Lin's concordance correlation between the daily view and
    click series: ρ_c = 2s_xy/(s_x² + s_y² + (x̄−ȳ)²). Pearson
    answers "do they CO-MOVE"; Lin answers "do they AGREE on the
    45° line" — the right check when clicks are supposed to track
    views one-for-one (a mirror feed, a dual-write migration, a
    replicated counter): a feed that doubles every number has
    r = 1 but ρ_c ≪ 1, and the bias-correction factor
    C_b = ρ_c/r isolates how much of the disagreement is pure
    location/scale shift vs noise. The shared n² denominator
    cancels, so ρ_c = 2(nS_xy−S_xS_y) / ((nS_xx−S_x²) +
    (nS_yy−S_y²) + (S_x−S_y)²) is a ratio of exact 128-bit
    integers off one (date, type) reduce — the only floats are the
    three final shared expressions."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["ts"].dt.strftime("%Y-%m-%d")
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": dt,
            "x": (et == "view").astype(np.int64),
            "y": (et == "click").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    x = c["x"].to_numpy(np.int64).astype(object)
    y = c["y"].to_numpy(np.int64).astype(object)
    n = len(c)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    cov = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    gap2 = float((sx - sy) * (sx - sy))
    ccc = 2.0 * cov / (vx + vy + gap2)
    pearson = cov / np.sqrt(vx * vy)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "ccc": [float(rha(ccc, 6))],
        "pearson": [float(rha(pearson, 6))],
        "c_b": [float(rha(ccc / pearson, 6))]})


@register("nb_fit_hourly_purchases", sql="""
WITH p AS (SELECT epoch_us(ts) // 3600000000 AS h
           FROM events WHERE event_type = 'purchase'),
sp AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
grid AS (SELECT MIN(h) AS h0, MAX(h) AS h1,
                CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n
         FROM sp),
c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM p GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nz,
             CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
             CAST(COALESCE(SUM(y * y), 0) AS HUGEINT) AS syy
      FROM c),
f AS (SELECT grid.n, s.nz, s.sy,
             CAST(s.sy AS DOUBLE) / grid.n AS m,
             CAST(grid.n * s.syy
                  - CAST(s.sy AS HUGEINT) * s.sy AS DOUBLE)
             / (CAST(grid.n AS DOUBLE) * (grid.n - 1)) AS s2
      FROM grid CROSS JOIN s)
SELECT n AS n_hours, CAST(n - nz AS BIGINT) AS zero_hours,
       ROUND(m, 6) AS mean_rate,
       ROUND(s2 / m, 6) AS vmr,
       ROUND(CASE WHEN s2 > m THEN m * m / (s2 - m) ELSE 0 END, 6)
           AS nb_r,
       ROUND(CASE WHEN s2 > m
                  THEN n * POWER((m * m / (s2 - m))
                                 / (m * m / (s2 - m) + m),
                                 m * m / (s2 - m))
                  ELSE 0 END, 6) AS nb_expected_zero_hours
FROM f""")
def nb_fit_hourly_purchases(sf_dir: str) -> pd.DataFrame:
    """Negative-binomial method-of-moments fit of hourly purchase
    arrivals over the full observed hour span (zeros included — the
    spine is min..max event hour, and zero hours cost nothing since
    they add to neither ΣY nor ΣY²): size r = m²/(s²−m),
    p = r/(r+m). The Poisson dispersion test already REJECTS
    equidispersion; this names the replacement model capacity math
    actually needs — r is the burstiness knob (r→∞ recovers
    Poisson, small r means a few hours carry the load), and the
    NB-predicted zero-hour count n·p^r against the OBSERVED zero
    hours is the instant zero-inflation check: observed ≫ predicted
    means dead-of-night hours need their own regime, not a fatter
    tail. Mean and variance come from exact integer sums on the
    span-bounded grid; every output is one shared float
    expression."""
    def prep(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        h = us // 3_600_000_000
        ph = h[et == "purchase"]
        u, c = np.unique(ph, return_counts=True)
        return pd.DataFrame({
            "h": np.concatenate([u, [h.min(), h.max()]]),
            "y": np.concatenate([c.astype(np.int64), [0, 0]])})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow"),
        ["h"], {"y": ("y", "sum")}).to_pandas() \
        .sort_values("h", ignore_index=True)
    h0, h1 = int(c["h"].iloc[0]), int(c["h"].iloc[-1])
    n = h1 - h0 + 1
    yv = c.loc[c["y"] > 0, "y"].to_numpy(np.int64).astype(object)
    nz = len(yv)
    sy = int(yv.sum())
    syy = int((yv * yv).sum())
    m = float(sy) / n
    s2 = float(n * syy - sy * sy) / (float(n) * (n - 1))
    rha = textstats.round_half_away
    if s2 > m:
        r = m * m / (s2 - m)
        ez = n * (r / (r + m)) ** r
    else:
        r, ez = 0.0, 0.0
    return pd.DataFrame({
        "n_hours": np.array([n], np.int64),
        "zero_hours": np.array([n - nz], np.int64),
        "mean_rate": [float(rha(m, 6))],
        "vmr": [float(rha(s2 / m, 6))],
        "nb_r": [float(rha(r, 6))],
        "nb_expected_zero_hours": [float(rha(ez, 6))]})


@register("kpss_level_daily", sql=f"""
WITH {_DAILY_SQL},
st AS (SELECT MAX(n) AS n, CAST(SUM(y) AS BIGINT) AS s,
              CAST(SUM(y * y) AS HUGEINT) AS ss
       FROM x),
c AS (SELECT t, CAST(SUM(y) OVER (ORDER BY t) AS BIGINT) AS cy
      FROM x),
p AS (SELECT CAST(SUM(CAST(st.n * c.cy - c.t * st.s AS HUGEINT)
                      * (st.n * c.cy - c.t * st.s)) AS HUGEINT) AS sp2
      FROM c CROSS JOIN st)
SELECT st.n AS n_days,
       ROUND(CAST(sp2 AS DOUBLE)
             / (CAST(st.n AS DOUBLE) * st.n
                * CAST(st.n * st.ss - CAST(st.s AS HUGEINT) * st.s
                       AS DOUBLE)), 6) AS kpss_eta,
       CAST(CASE WHEN CAST(sp2 AS DOUBLE)
                      / (CAST(st.n AS DOUBLE) * st.n
                         * CAST(st.n * st.ss
                                - CAST(st.s AS HUGEINT) * st.s
                                AS DOUBLE)) > 0.463
                 THEN 1 ELSE 0 END AS BIGINT) AS stationarity_rejected
FROM p CROSS JOIN st""")
def kpss_level_daily(sf_dir: str) -> pd.DataFrame:
    """KPSS level-stationarity test on daily counts: η = n⁻²ΣS_t²/σ̂²
    over partial sums of mean-deviations, against the 0.463 5%
    point. The NULL here is stationarity — the mirror of the unit-
    root tests — so KPSS catches what they structurally cannot: a
    series that wanders (trend, random walk, slow regime drift)
    REJECTS here while a unit-root test merely fails to reject its
    own null. Read together with adf_daily as the classic 2×2:
    both reject ⇒ structural break / neither model fits; only KPSS
    rejects ⇒ non-stationary; only ADF rejects ⇒ stationary. The
    long-run variance uses the lag-0 estimator (documented
    convention — σ̂² = Σ(y−ȳ)²/n, no Bartlett window, exact off
    integer sums), partial sums scale to exact integers
    n·C_t − t·S, so η is one shared float ratio of exact 128-bit
    integers on the calendar-bounded grid."""
    y = _daily_counts(sf_dir).astype(object)
    n = len(y)
    s = int(y.sum())
    ss = int((y * y).sum())
    cy = y.cumsum()
    t = np.arange(1, n + 1, dtype=object)
    sp2 = int(((n * cy - t * s) ** 2).sum())
    eta = float(sp2) / (float(n) * n * float(n * ss - s * s))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "kpss_eta": [float(rha(eta, 6))],
        "stationarity_rejected": np.array(
            [1 if eta > 0.463 else 0], np.int64)})


@register("adf_daily", sql=f"""
WITH {_DAILY_SQL},
pr AS (SELECT y AS x0, LEAD(y) OVER (ORDER BY t) - y AS dy FROM x),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x0) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(CAST(x0 AS HUGEINT) * x0) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x0 AS HUGEINT) * dy) AS HUGEINT) AS sxy
      FROM pr WHERE dy IS NOT NULL),
f AS (SELECT m,
             CAST(m * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vx,
             CAST(m * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vy,
             CAST(m * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy
      FROM s)
SELECT m AS n_pairs,
       ROUND(cxy / vx, 6) AS beta,
       ROUND((cxy / vx)
             / SQRT(m * ((vy - cxy * cxy / vx) / m / (m - 2)) / vx),
             6) AS adf_t,
       CAST(CASE WHEN (cxy / vx)
                      / SQRT(m * ((vy - cxy * cxy / vx)
                                  / m / (m - 2)) / vx) < -2.86
                 THEN 1 ELSE 0 END AS BIGINT) AS unit_root_rejected
FROM f""")
def adf_daily(sf_dir: str) -> pd.DataFrame:
    """Dickey–Fuller unit-root test (lag-0, with constant) on daily
    counts: regress Δy_t on y_{t−1}, t-statistic on β against the
    −2.86 asymptotic 5% DF point (documented convention — the DF
    distribution, not Student's t). β near 0 ⇒ shocks PERSIST (a
    launch-day jump becomes the new level — forecast with
    differences); β strongly negative ⇒ mean reversion (spikes decay
    — capacity can plan on the mean). The complement of
    kpss_level_daily; the AR(1) forecast query assumes the answer,
    this tests it. All five regression sums are exact integers off
    the (date, count) reduce; β, its standard error
    √(m·s²/Σ(x−x̄)²) and the t-ratio are shared float expressions
    of the exact moments vx, vy, cxy."""
    y = _daily_counts(sf_dir).astype(object)
    x0 = y[:-1]
    dy = y[1:] - y[:-1]
    m = len(x0)
    sx, sy = int(x0.sum()), int(dy.sum())
    sxx = int((x0 * x0).sum())
    syy = int((dy * dy).sum())
    sxy = int((x0 * dy).sum())
    vx = float(m * sxx - sx * sx)
    vy = float(m * syy - sy * sy)
    cxy = float(m * sxy - sx * sy)
    beta = cxy / vx
    t = beta / np.sqrt(m * ((vy - cxy * cxy / vx) / m / (m - 2)) / vx)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([m], np.int64),
        "beta": [float(rha(beta, 6))],
        "adf_t": [float(rha(t, 6))],
        "unit_root_rejected": np.array(
            [1 if t < -2.86 else 0], np.int64)})


@register("quade_test_types_by_day", sql="""
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
rg AS (SELECT d, MAX(c) - MIN(c) AS rng FROM grid GROUP BY d),
q AS (SELECT d,
            CAST(2 * RANK() OVER (ORDER BY rng) - 1
                 + COUNT(*) OVER (PARTITION BY rng) AS BIGINT) AS q2
      FROM rg),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk FROM types),
b AS (SELECT CAST(COUNT(*) AS BIGINT) AS bb FROM days),
s AS (SELECT r.g, q.q2 * (r.r2 - (k.kk + 1)) AS s4
      FROM r JOIN q ON r.d = q.d CROSS JOIN k),
tj AS (SELECT g, CAST(SUM(s4) AS BIGINT) AS t4 FROM s GROUP BY g),
agg AS (SELECT (SELECT CAST(SUM(CAST(s4 AS HUGEINT) * s4) AS HUGEINT)
                FROM s) AS a16,
               (SELECT CAST(SUM(CAST(t4 AS HUGEINT) * t4) AS HUGEINT)
                FROM tj) AS tsq)
SELECT bb AS n_days, kk AS n_types,
       CAST(tsq AS BIGINT) AS num16b,
       CASE WHEN bb * a16 - tsq <= 0 THEN 0.0
            ELSE ROUND(CAST((bb - 1) * tsq AS DOUBLE)
                       / CAST(bb * a16 - tsq AS DOUBLE), 6)
       END AS f_stat,
       CAST(kk - 1 AS BIGINT) AS df1,
       CAST((bb - 1) * (kk - 1) AS BIGINT) AS df2
FROM agg, b, k""")
def quade_test_types_by_day(sf_dir: str) -> pd.DataFrame:
    """Quade test across event types with days as blocks — the
    RANGE-WEIGHTED Friedman: each day's within-day type ranks are
    multiplied by the rank of that day's spread (max−min count), so
    high-contrast days carry more evidence and near-tied days carry
    almost none. Friedman throws that information away (a day where
    views beat clicks by 3 counts votes as loudly as one where they
    beat by 3000); for small k (here 3 types) Quade is the more
    powerful block test. Doubled midranks within days (the Friedman
    convention) and doubled midranks of the integer ranges across
    days make S4_bj = q2_b·(r2_bj − (k+1)) = 4·Q_b(r_bj−(k+1)/2)
    exact integers, so F = (b−1)·ΣT_j² / (b·ΣS² − ΣT_j²) is a ratio
    of exact 128-bit integers with one shared division (perfectly
    consistent orderings short-circuit the zero denominator to 0);
    reported with its F(k−1, (b−1)(k−1)) degrees of freedom. One
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
    bb, kk = len(days), len(types)
    r2 = np.empty_like(grid)
    for ti in range(bb):                     # tiny b×k loop
        row = grid[ti]
        for j in range(kk):
            r2[ti, j] = 2 * int((row < row[j]).sum()) + 1 \
                + int((row == row[j]).sum())
    rng = grid.max(axis=1) - grid.min(axis=1)
    q2 = np.array([2 * int((rng < v).sum()) + 1 + int((rng == v).sum())
                   for v in rng], np.int64)
    s4 = q2[:, None] * (r2 - (kk + 1))
    t4 = s4.sum(axis=0).astype(object)
    a16 = int((s4.astype(object) ** 2).sum())
    tsq = int((t4 * t4).sum())
    den = bb * a16 - tsq
    f = 0.0 if den <= 0 else float((bb - 1) * tsq) / float(den)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([bb], np.int64),
        "n_types": np.array([kk], np.int64),
        "num16b": np.array([tsq], np.int64),
        "f_stat": [float(rha(f, 6)) if den > 0 else 0.0],
        "df1": np.array([kk - 1], np.int64),
        "df2": np.array([(bb - 1) * (kk - 1)], np.int64)})


@register("brunner_munzel_weekend_value", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd
           FROM events),
h AS (SELECT cents,
             CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(SUM(1 - wkd) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1),
cum AS (SELECT c1, c2,
               2 * (SUM(tt) OVER (ORDER BY cents) - tt) + tt + 1
                   AS m2,
               2 * (SUM(c1) OVER (ORDER BY cents) - c1) + c1 + 1
                   AS w21,
               2 * (SUM(c2) OVER (ORDER BY cents) - c2) + c2 + 1
                   AS w22,
               SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        FROM h),
agg AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               CAST(SUM(CAST(c1 AS HUGEINT) * m2) AS HUGEINT) AS t1,
               CAST(SUM(CAST(c2 AS HUGEINT) * m2) AS HUGEINT) AS t2,
               CAST(SUM(CAST(c1 AS HUGEINT) * (m2 - w21)) AS HUGEINT)
                   AS a11,
               CAST(SUM(CAST(c1 AS HUGEINT) * (m2 - w21) * (m2 - w21))
                    AS HUGEINT) AS a21,
               CAST(SUM(CAST(c2 AS HUGEINT) * (m2 - w22)) AS HUGEINT)
                   AS a12,
               CAST(SUM(CAST(c2 AS HUGEINT) * (m2 - w22) * (m2 - w22))
                    AS HUGEINT) AS a22
        FROM cum),
f AS (SELECT n1, n2,
             CAST(t1 AS DOUBLE) / (2.0 * n1) AS r1,
             CAST(t2 AS DOUBLE) / (2.0 * n2) AS r2m,
             (CAST(a21 AS DOUBLE)
              - 2.0 * (CAST(t1 AS DOUBLE) / n1 - (n1 + 1)) * a11
              + (CAST(t1 AS DOUBLE) / n1 - (n1 + 1))
                * (CAST(t1 AS DOUBLE) / n1 - (n1 + 1)) * n1)
             / (4.0 * (n1 - 1)) AS s1sq,
             (CAST(a22 AS DOUBLE)
              - 2.0 * (CAST(t2 AS DOUBLE) / n2 - (n2 + 1)) * a12
              + (CAST(t2 AS DOUBLE) / n2 - (n2 + 1))
                * (CAST(t2 AS DOUBLE) / n2 - (n2 + 1)) * n2)
             / (4.0 * (n2 - 1)) AS s2sq
      FROM agg)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
       ROUND((r2m - (n2 + 1) / 2.0) / n1, 6) AS p_hat,
       ROUND(CASE WHEN n1 * s1sq + n2 * s2sq > 0
                  THEN CAST(n1 AS DOUBLE) * n2 * (r2m - r1)
                       / ((n1 + n2) * SQRT(n1 * s1sq + n2 * s2sq))
                  ELSE 0 END, 6) AS w,
       ROUND(CASE WHEN n1 * s1sq + n2 * s2sq > 0
                  THEN (n1 * s1sq + n2 * s2sq)
                       * (n1 * s1sq + n2 * s2sq)
                       / ((n1 * s1sq) * (n1 * s1sq) / (n1 - 1)
                          + (n2 * s2sq) * (n2 * s2sq) / (n2 - 1))
                  ELSE 0 END, 6) AS df,
       CAST(CASE WHEN n1 * s1sq + n2 * s2sq > 0
                  AND ABS(CAST(n1 AS DOUBLE) * n2 * (r2m - r1)
                          / ((n1 + n2)
                             * SQRT(n1 * s1sq + n2 * s2sq)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS bm_rejected
FROM f""")
def brunner_munzel_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Brunner–Munzel test of weekend vs weekday event values — the
    heteroscedasticity-proof replacement for Mann–Whitney. MW's
    variance assumes the two samples share a dispersion; when
    weekend values are both shifted AND differently spread (exactly
    what ansari_bradley detects), MW's z is miscalibrated. BM
    estimates p̂ = P(weekend < weekday) + ½P(=) directly from mean
    pooled ranks and studentizes with EACH sample's own placement
    variance S_i² = Var(R − R^(i)), plus a Welch-style df. All
    inputs ride ONE (cents, weekend) histogram: pooled and
    within-sample doubled midranks make every placement
    a = 2R − 2R^(i) an exact integer, and each S_i² expands to
    (A2 − 2μA1 + μ²n)/(4(n−1)) over exact 128-bit sums A1 = Σc·a,
    A2 = Σc·a² with μ = T/n − (n+1) — shared float expressions,
    degenerate all-tied input short-circuits to 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "c1": wkd, "c2": 1 - wkd,
            "tt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("c1", "sum"), "c2": ("c2", "sum"),
                    "tt": ("tt", "sum")}).to_pandas() \
        .sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64).astype(object)
    c2 = h["c2"].to_numpy(np.int64).astype(object)
    tt = h["tt"].to_numpy(np.int64).astype(object)
    n1, n2 = int(c1.sum()), int(c2.sum())
    m2 = 2 * (tt.cumsum() - tt) + tt + 1
    w21 = 2 * (c1.cumsum() - c1) + c1 + 1
    w22 = 2 * (c2.cumsum() - c2) + c2 + 1
    t1 = int((c1 * m2).sum())
    t2 = int((c2 * m2).sum())
    a11 = int((c1 * (m2 - w21)).sum())
    a21 = int((c1 * (m2 - w21) * (m2 - w21)).sum())
    a12 = int((c2 * (m2 - w22)).sum())
    a22 = int((c2 * (m2 - w22) * (m2 - w22)).sum())
    r1 = float(t1) / (2.0 * n1)
    r2m = float(t2) / (2.0 * n2)
    mu1 = float(t1) / n1 - (n1 + 1)
    mu2 = float(t2) / n2 - (n2 + 1)
    s1sq = (float(a21) - 2.0 * mu1 * a11 + mu1 * mu1 * n1) \
        / (4.0 * (n1 - 1))
    s2sq = (float(a22) - 2.0 * mu2 * a12 + mu2 * mu2 * n2) \
        / (4.0 * (n2 - 1))
    pool = n1 * s1sq + n2 * s2sq
    if pool > 0:
        w = float(n1) * n2 * (r2m - r1) / ((n1 + n2) * np.sqrt(pool))
        df = pool * pool / ((n1 * s1sq) * (n1 * s1sq) / (n1 - 1)
                            + (n2 * s2sq) * (n2 * s2sq) / (n2 - 1))
    else:
        w, df = 0.0, 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n2], np.int64),
        "p_hat": [float(rha((r2m - (n2 + 1) / 2.0) / n1, 6))],
        "w": [float(rha(w, 6))],
        "df": [float(rha(df, 6))],
        "bm_rejected": np.array(
            [1 if pool > 0 and abs(w) > 1.959964 else 0], np.int64)})


@register("goh_barabasi_gaps", sql="""
WITH o AS (SELECT user_id, ts, event_id,
                  (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                  // 1000000 AS g
           FROM events),
p AS (SELECT g,
             LAG(g) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS g0
      FROM o),
gs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(g) AS BIGINT) AS s,
              CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS ss
       FROM o WHERE g IS NOT NULL),
ps AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              CAST(SUM(g0) AS BIGINT) AS sx,
              CAST(SUM(g) AS BIGINT) AS sy,
              CAST(SUM(CAST(g0 AS HUGEINT) * g0) AS HUGEINT) AS sxx,
              CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS syy,
              CAST(SUM(CAST(g0 AS HUGEINT) * g) AS HUGEINT) AS sxy
       FROM p WHERE g IS NOT NULL AND g0 IS NOT NULL),
f AS (SELECT gs.n, ps.m,
             CAST(gs.s AS DOUBLE) / gs.n AS mu,
             SQRT(CAST(gs.n * gs.ss - CAST(gs.s AS HUGEINT) * gs.s
                       AS DOUBLE)
                  / (CAST(gs.n AS DOUBLE) * (gs.n - 1))) AS sd,
             CAST(ps.m * ps.sxy - CAST(ps.sx AS HUGEINT) * ps.sy
                  AS DOUBLE) AS cxy,
             CAST(ps.m * ps.sxx - CAST(ps.sx AS HUGEINT) * ps.sx
                  AS DOUBLE) AS vx,
             CAST(ps.m * ps.syy - CAST(ps.sy AS HUGEINT) * ps.sy
                  AS DOUBLE) AS vy
      FROM gs CROSS JOIN ps)
SELECT n AS n_gaps, m AS n_pairs,
       ROUND((sd - mu) / (sd + mu), 6) AS burstiness_b,
       ROUND(CASE WHEN vx > 0 AND vy > 0
                  THEN cxy / SQRT(vx * vy) ELSE 0 END, 6)
           AS memory_r
FROM f""")
def goh_barabasi_gaps(sf_dir: str) -> pd.DataFrame:
    """Goh–Barabási (B, M) characterization of user think-time gaps
    — the two-number fingerprint of an arrival process. Burstiness
    B = (σ−μ)/(σ+μ) ∈ (−1, 1): 0 is Poisson, →1 is bursty
    (sessions of rapid fire separated by silence), <0 is
    pacemaker-regular. Memory M = Pearson(gᵢ, gᵢ₊₁) over CONSECUTIVE
    gap pairs within the same user: positive means long gaps follow
    long gaps (the correlated-idleness a session timeout exploits),
    negative means alternation. Together they separate regimes the
    AD-exponentiality verdict lumps: heavy-tailed-but-memoryless
    (B high, M≈0, timeout works) vs correlated (M>0, timeout
    over-segments). Gaps quantize to integer seconds inside
    user-hash buckets and pairs form locally (second LAG over the
    same (ts, event_id) order), so only six exact 128-bit sums per
    bucket reach the driver; B and M are shared float expressions
    of exact integers."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = (us - np.roll(us, 1)) // 1_000_000
        gv = gap[same].astype(object)
        pair = same & np.roll(same, 1)
        pair[0] = False
        gy = gap[pair].astype(object)
        gx = np.roll(gap, 1)[pair].astype(object)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "n": [len(gv)], "s": [int(gv.sum())],
            "ss": [int((gv * gv).sum())],
            "m": [len(gy)], "sx": [int(gx.sum())],
            "sy": [int(gy.sum())], "sxx": [int((gx * gx).sum())],
            "syy": [int((gy * gy).sum())],
            "sxy": [int((gx * gy).sum())]})

    agg = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(partial, batch_format="pandas"),
        ["k"], {c: (c, "sum") for c in
                ["n", "s", "ss", "m", "sx", "sy", "sxx", "syy",
                 "sxy"]}).to_pandas()
    r = agg.iloc[0]
    n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
    m, sx, sy = int(r["m"]), int(r["sx"]), int(r["sy"])
    sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
    mu = float(s) / n
    sd = np.sqrt(float(n * ss - s * s) / (float(n) * (n - 1)))
    cxy = float(m * sxy - sx * sy)
    vx = float(m * sxx - sx * sx)
    vy = float(m * syy - sy * sy)
    mem = cxy / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "n_pairs": np.array([m], np.int64),
        "burstiness_b": [float(rha((sd - mu) / (sd + mu), 6))],
        "memory_r": [float(rha(mem, 6))]})


@register("weibull_shape_thinktime", sql="""
WITH o AS (SELECT user_id,
                  (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                  // 1000000 AS g
           FROM events),
c AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM o WHERE g >= 1 GROUP BY g),
r AS (SELECT g, CAST(SUM(cnt) OVER (ORDER BY g) AS BIGINT) AS b,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM c),
pt AS (SELECT LN(CAST(g AS DOUBLE)) AS x,
              LN(-LN(1.0 - CAST(b AS DOUBLE) / n)) AS y, n
       FROM r WHERE b < n),
s AS (SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pt),
f AS (SELECT n, m,
             (m * sxy - sx * sy) / (m * sxx - sx * sx) AS k
      FROM s)
SELECT n AS n_gaps, m AS n_points,
       ROUND(k, 6) AS weibull_k,
       ROUND(EXP(-((SELECT sy FROM s)
                   - k * (SELECT sx FROM s)) / m / k), 6)
           AS weibull_lambda_s,
       CAST(CASE WHEN k < 1.0 THEN 1 ELSE 0 END AS BIGINT)
           AS clumpy
FROM f""")
def weibull_shape_thinktime(sf_dir: str) -> pd.DataFrame:
    """Weibull probability-plot fit of user think-time gaps: regress
    ln(−ln(1−F)) on ln(g) over the distinct-second gap CDF — the
    slope IS the shape k̂, the intercept gives the scale
    λ̂ = exp(−a/k). Where ad_exponential_gaps only REJECTS
    memorylessness, the Weibull shape says what replaced it and by
    how much: k < 1 is the clumpy burst-and-silence hazard (the
    longer idle, the longer still to wait — session timeouts should
    be generous), k = 1 recovers exponential, k > 1 is
    quasi-periodic polling. One point per DISTINCT gap second
    (documented convention; the top bin F = 1 drops), so the
    regression grid is value-bounded (≤ observed span in seconds)
    regardless of event count; the CDF heights b/n are exact
    integer ratios off the same (gap, count) contingency the AD
    test rides, and the OLS closed form is a shared float
    expression."""
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
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
        gap = np.where(same, (us - np.roll(us, 1)) // 1_000_000, 0)
        gap = gap[same]
        gap = gap[gap >= 1]
        return pd.DataFrame({"g": gap}).groupby(
            "g", as_index=False).size().rename(
            columns={"size": "cnt"})

    c = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(gaps, batch_format="pandas"),
        ["g"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("g", ignore_index=True)
    gv = c["g"].to_numpy(np.int64)
    b = np.cumsum(c["cnt"].to_numpy(np.int64))
    n = int(b[-1])
    keep = b < n
    x = np.log(gv[keep].astype(np.float64))
    y = np.log(-np.log(1.0 - b[keep].astype(np.float64) / n))
    m = len(x)
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    k = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    lam = np.exp(-(sy - k * sx) / m / k)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "n_points": np.array([m], np.int64),
        "weibull_k": [float(rha(k, 6))],
        "weibull_lambda_s": [float(rha(lam, 6))],
        "clumpy": np.array([1 if k < 1.0 else 0], np.int64)})


@register("snht_break_daily", sql=f"""
WITH {_DAILY_SQL},
st AS (SELECT MAX(n) AS n, CAST(SUM(y) AS BIGINT) AS s,
              CAST(SUM(y * y) AS HUGEINT) AS ss
       FROM x),
c AS (SELECT t, CAST(SUM(y) OVER (ORDER BY t) AS BIGINT) AS cy
      FROM x),
tk AS (SELECT c.t, st.n,
              CAST(st.n AS DOUBLE)
              * CAST(CAST(st.n * c.cy - c.t * st.s AS HUGEINT)
                     * (st.n * c.cy - c.t * st.s) AS DOUBLE)
              / (CAST(c.t AS DOUBLE) * (st.n - c.t)
                 * CAST(st.n * st.ss - CAST(st.s AS HUGEINT) * st.s
                        AS DOUBLE)) AS tstat
       FROM c CROSS JOIN st WHERE c.t < st.n),
top AS (SELECT * FROM tk ORDER BY tstat DESC, t LIMIT 1),
dd AS (SELECT strftime(ts, '%Y-%m-%d') AS dt FROM events GROUP BY 1),
dr AS (SELECT dt, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT)
                      AS t
       FROM dd)
SELECT top.n AS n_days, dr.dt AS break_date,
       ROUND(top.tstat, 6) AS t_max,
       CAST(CASE WHEN top.tstat > 7.65 THEN 1 ELSE 0 END AS BIGINT)
           AS break_rejected
FROM top JOIN dr ON dr.t = top.t""")
def snht_break_daily(sf_dir: str) -> pd.DataFrame:
    """Standard Normal Homogeneity Test (Alexandersson) on daily
    counts: T_k = k·z̄₁² + (n−k)·z̄₂² maximized over split points,
    which collapses to n·(n·C_k − k·S)² / (k(n−k)(n·ΣY²−S²)) —
    numerator exact 128-bit integers off the cumulative daily sums.
    Completes the homogeneity trio: rank-based Pettitt is most
    sensitive mid-series, Buishand's range in the middle, SNHT at
    the ENDS — a level shift in the first or last few days (a
    deploy that landed just before the window edge) that Pettitt's
    rank sum barely moves maximizes T near the boundary. Flag at
    7.65, the ≈5% point for the ~30-day grids a monthly events
    window produces (documented; same constant both engines so the
    verdict bit cannot straddle). Ties on T break to the earliest
    day; everything after the daily reduce is calendar-bounded."""
    y = _daily_counts(sf_dir).astype(object)
    n = len(y)
    s = int(y.sum())
    ss = int((y * y).sum())
    cy = y.cumsum()
    k = np.arange(1, n + 1, dtype=object)
    u = (n * cy - k * s)[: n - 1]
    kk = np.arange(1, n, dtype=np.float64)
    t = float(n) * (u * u).astype(np.float64) \
        / (kk * (n - kk) * float(n * ss - s * s))
    i = int(np.argmax(t))
    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "date", pc.strftime(batch["ts"], format="%Y-%m-%d"))
    dts = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["date"], {"y": ("date", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "break_date": [dts["date"].iloc[i]],
        "t_max": [float(rha(t[i], 6))],
        "break_rejected": np.array(
            [1 if t[i] > 7.65 else 0], np.int64)})


@register("buishand_range_daily", sql=f"""
WITH {_DAILY_SQL},
st AS (SELECT MAX(n) AS n, CAST(SUM(y) AS BIGINT) AS s,
              CAST(SUM(y * y) AS HUGEINT) AS ss
       FROM x),
c AS (SELECT t, CAST(SUM(y) OVER (ORDER BY t) AS BIGINT) AS cy
      FROM x),
u AS (SELECT st.n, st.s, st.ss,
             CAST(MAX(st.n * c.cy - c.t * st.s) AS HUGEINT) AS umax,
             CAST(MIN(st.n * c.cy - c.t * st.s) AS HUGEINT) AS umin,
             CAST(MAX(ABS(st.n * c.cy - c.t * st.s)) AS HUGEINT)
                 AS uabs
      FROM c CROSS JOIN st GROUP BY 1, 2, 3)
SELECT n AS n_days,
       ROUND(CAST(GREATEST(umax, 0) - LEAST(umin, 0) AS DOUBLE)
             / (SQRT(CAST(n AS DOUBLE))
                * SQRT(CAST(n * ss - CAST(s AS HUGEINT) * s
                            AS DOUBLE))), 6) AS r_scaled,
       ROUND(CAST(uabs AS DOUBLE)
             / (SQRT(CAST(n AS DOUBLE))
                * SQRT(CAST(n * ss - CAST(s AS HUGEINT) * s
                            AS DOUBLE))), 6) AS q_scaled,
       CAST(CASE WHEN CAST(GREATEST(umax, 0) - LEAST(umin, 0)
                           AS DOUBLE)
                      / (SQRT(CAST(n AS DOUBLE))
                         * SQRT(CAST(n * ss
                                     - CAST(s AS HUGEINT) * s
                                     AS DOUBLE))) > 1.50
                 THEN 1 ELSE 0 END AS BIGINT) AS break_rejected
FROM u""")
def buishand_range_daily(sf_dir: str) -> pd.DataFrame:
    """Buishand rescaled range test on daily counts: cumulative
    mean-deviations P_k, R = (max P − min P)/(σ̂√n) and the
    one-sided Q = max|P|/(σ̂√n). The middle member of the
    homogeneity trio (Pettitt = rank-robust mid-series, SNHT =
    end-sensitive): a single clean level shift makes the partial-sum
    path a tent whose height IS the evidence, and unlike the
    locator tests this reports the path RANGE, which also reacts to
    a shift-and-return (up for a week, back down) that leaves every
    single-split statistic lukewarm. Partial sums scale to exact
    integers U_k = n·C_k − k·S (U_n = 0, so the k = 0 anchor is
    free: max is clamped ≥ 0, min ≤ 0); σ̂ is the population sd off
    the same integer sums, flag at 1.50, the ≈5% point for
    ~30-day grids (documented convention, shared constant)."""
    y = _daily_counts(sf_dir).astype(object)
    n = len(y)
    s = int(y.sum())
    ss = int((y * y).sum())
    cy = y.cumsum()
    k = np.arange(1, n + 1, dtype=object)
    u = n * cy - k * s
    umax = max(int(u.max()), 0)
    umin = min(int(u.min()), 0)
    uabs = int(max(abs(int(u.max())), abs(int(u.min()))))
    den = np.sqrt(float(n)) * np.sqrt(float(n * ss - s * s))
    r = float(umax - umin) / den
    q = float(uabs) / den
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "r_scaled": [float(rha(r, 6))],
        "q_scaled": [float(rha(q, 6))],
        "break_rejected": np.array(
            [1 if r > 1.50 else 0], np.int64)})


@register("cronbach_alpha_hour_profile", sql="""
WITH uh AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
nn AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM uh),
hi AS (SELECT h, CAST(SUM(c) AS BIGINT) AS si,
              CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ssi
       FROM uh GROUP BY h),
ut AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS t FROM uh GROUP BY 1),
ts AS (SELECT CAST(SUM(t) AS BIGINT) AS st,
              CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt
       FROM ut),
agg AS (SELECT nn.n,
               CAST(SUM(nn.n * hi.ssi
                        - CAST(hi.si AS HUGEINT) * hi.si) AS HUGEINT)
                   AS num
        FROM hi CROSS JOIN nn GROUP BY 1)
SELECT agg.n AS n_users,
       CAST(24 AS BIGINT) AS k_items,
       CAST(num AS BIGINT) AS item_var_num,
       CAST(agg.n * ts.stt - CAST(ts.st AS HUGEINT) * ts.st
            AS BIGINT) AS total_var_num,
       ROUND(24.0 / 23.0
             * (1.0 - CAST(num AS DOUBLE)
                      / CAST(agg.n * ts.stt
                             - CAST(ts.st AS HUGEINT) * ts.st
                             AS DOUBLE)), 6) AS alpha
FROM agg CROSS JOIN ts""")
def cronbach_alpha_hour_profile(sf_dir: str) -> pd.DataFrame:
    """Cronbach's alpha treating the 24 hour-of-day activity counts
    as a 24-item instrument measured on every user: α =
    k/(k−1)·(1 − Σᵢσᵢ²/σ_T²). The psychometric question transposed
    to telemetry — do the hours measure ONE latent "how active is
    this user" trait (α near 1: any few hours of data rank users
    reliably, sampling is safe) or do different hours capture
    different populations (α low: night and day users are different
    people, and any hour-sampled metric is biased)? Absent
    (user, hour) cells are true zeros and cost nothing — they add
    to neither ΣX nor ΣX² — and the n(n−1) variance denominators
    cancel, so α = (24/23)(1 − Σ(n·SSᵢ−Sᵢ²)/(n·ΣT²−(ΣT)²)) is a
    ratio of exact 128-bit integers off one (user, hour) reduce
    plus its two marginals; k = 24 is fixed by the clock
    (documented), only per-hour and per-user partials shuffle."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "h": df["ts"].dt.hour.to_numpy(np.int64),
            "c": np.ones(len(df), np.int64)})

    uh = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "h"], {"c": ("c", "sum")}).to_pandas()
    n = int(uh["user_id"].nunique())
    hi = uh.groupby("h")["c"].agg(
        si="sum", ssi=lambda v: int(
            (v.to_numpy(np.int64).astype(object) ** 2).sum()))
    num = sum(n * int(r["ssi"]) - int(r["si"]) ** 2
              for _, r in hi.iterrows())
    ut = uh.groupby("user_id")["c"].sum()
    st = int(ut.sum())
    stt = int((ut.to_numpy(np.int64).astype(object) ** 2).sum())
    den = n * stt - st * st
    alpha = 24.0 / 23.0 * (1.0 - float(num) / float(den))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "k_items": np.array([24], np.int64),
        "item_var_num": np.array([num], np.int64),
        "total_var_num": np.array([den], np.int64),
        "alpha": [float(rha(alpha, 6))]})


@register("split_half_hour_reliability", sql="""
WITH uh AS (SELECT user_id,
                   CAST(SUM(CASE WHEN hour(ts) % 2 = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS o,
                   CAST(SUM(CASE WHEN hour(ts) % 2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS e
            FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(o) AS BIGINT) AS sx,
             CAST(SUM(e) AS BIGINT) AS sy,
             CAST(SUM(CAST(o AS HUGEINT) * o) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS syy,
             CAST(SUM(CAST(o AS HUGEINT) * e) AS HUGEINT) AS sxy
      FROM uh),
f AS (SELECT n,
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
             CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vx,
             CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vy
      FROM s)
SELECT n AS n_users,
       ROUND(CASE WHEN vx > 0 AND vy > 0
                  THEN cxy / SQRT(vx * vy) ELSE 0 END, 6)
           AS r_halves,
       ROUND(CASE WHEN vx > 0 AND vy > 0
                  THEN 2.0 * (cxy / SQRT(vx * vy))
                       / (1.0 + cxy / SQRT(vx * vy))
                  ELSE 0 END, 6) AS spearman_brown
FROM f""")
def split_half_hour_reliability(sf_dir: str) -> pd.DataFrame:
    """Split-half reliability of user activity: correlate each
    user's ODD-hour event count with their EVEN-hour count across
    users, then Spearman–Brown-boost 2r/(1+r) to full-length
    reliability. The operational question Cronbach's α answers in
    aggregate, posed concretely: if you could only afford to meter
    half the clock (alternate-hour sampling, a half-rate shard),
    would the user ranking survive? r_halves IS that fidelity, and
    the boosted coefficient predicts the full-instrument value —
    read against cronbach_alpha_hour_profile, a large gap flags a
    pathological odd/even split (e.g. on-the-hour batch jobs).
    One per-user two-column reduce; Pearson over users is the
    standard exact-moments expression, all 128-bit integers until
    the final shared floats."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.hour.to_numpy(np.int64)
        odd = (h % 2 == 1).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "o": odd, "e": 1 - odd})

    uh = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"o": ("o", "sum"), "e": ("e", "sum")}) \
        .to_pandas()
    o = uh["o"].to_numpy(np.int64).astype(object)
    e = uh["e"].to_numpy(np.int64).astype(object)
    n = len(uh)
    sx, sy = int(o.sum()), int(e.sum())
    sxx, syy = int((o * o).sum()), int((e * e).sum())
    sxy = int((o * e).sum())
    cxy = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    if vx > 0 and vy > 0:
        r = cxy / np.sqrt(vx * vy)
        sb = 2.0 * r / (1.0 + r)
    else:
        r, sb = 0.0, 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "r_halves": [float(rha(r, 6))],
        "spearman_brown": [float(rha(sb, 6))]})


@register("taub_somers_qty_discount", sql="""
WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS dd,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1, 2),
pairs AS (SELECT
    CAST(SUM(CASE WHEN b.q < a.q AND b.dd < a.dd
                  THEN CAST(a.cnt AS HUGEINT) * b.cnt
                  ELSE 0 END) AS HUGEINT) AS nc,
    CAST(SUM(CASE WHEN b.q < a.q AND b.dd > a.dd
                  THEN CAST(a.cnt AS HUGEINT) * b.cnt
                  ELSE 0 END) AS HUGEINT) AS nd
    FROM cells a CROSS JOIN cells b),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
rt AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS t2
       FROM (SELECT SUM(cnt) AS t FROM cells GROUP BY q)),
ct AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS t2
       FROM (SELECT SUM(cnt) AS t FROM cells GROUP BY dd)),
f AS (SELECT n, nc, nd,
             CAST(CAST(n AS HUGEINT) * (n - 1) AS HUGEINT) AS p2,
             rt.t2 AS rt2, ct.t2 AS ct2
      FROM pairs, tot, rt, ct)
SELECT n, CAST(nc AS BIGINT) AS concordant,
       CAST(nd AS BIGINT) AS discordant,
       ROUND(2.0 * CAST(nc - nd AS DOUBLE)
             / SQRT(CAST(p2 - rt2 AS DOUBLE)
                    * CAST(p2 - ct2 AS DOUBLE)), 6) AS tau_b,
       ROUND(2.0 * CAST(nc - nd AS DOUBLE)
             / CAST(p2 - ct2 AS DOUBLE), 6) AS somers_d_qty,
       ROUND(2.0 * CAST(nc - nd AS DOUBLE)
             / CAST(p2 - rt2 AS DOUBLE), 6) AS somers_d_disc
FROM f""")
def taub_somers_qty_discount(sf_dir: str) -> pd.DataFrame:
    """Kendall's τ-b and BOTH Somers' D directions between lineitem
    quantity and discount — the ordinal-association panel on a
    value-bounded grid (quantity 1..50 × discount 0..10¢ ⇒ ≤ 550
    cells, so after one distributed contingency reduce the
    'all-pairs' computation is a 550² cell join, not an N² row
    join, at ANY row scale). τ-b symmetrizes; the two Somers' D
    asymmetrize it into the actionable readings: D(qty|disc) is
    'how much does quantity respond per discount step' (the
    pricing-ladder lever) while D(disc|qty) is 'how well does
    quantity predict the discount granted' (the leakage audit —
    high means reps pre-concede on big orders). Concordant/
    discordant pair counts are exact 128-bit cell-product sums;
    tie terms Σt(t−1) stay doubled so τ_b = 2(C−D)/√((n(n−1)−Tr)
    (n(n−1)−Tc)) is one shared float expression over exact
    integers. Complements the MI query (association strength) with
    signed DIRECTION and the γ query (tie-blind) with tie-aware
    calibration."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "q": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64),
            "dd": np.rint(df["l_discount"].to_numpy(np.float64)
                          * 100).astype(np.int64),
            "cnt": np.ones(len(df), np.int64)})

    cells = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_quantity", "l_discount"])
        .map_batches(prep, batch_format="pandas"),
        ["q", "dd"], {"cnt": ("cnt", "sum")}).to_pandas()
    qs = np.sort(cells["q"].unique())
    ds = np.sort(cells["dd"].unique())
    m = cells.pivot_table(index="q", columns="dd", values="cnt",
                          fill_value=0, aggfunc="sum") \
        .reindex(index=qs, columns=ds, fill_value=0) \
        .to_numpy(np.int64).astype(object)
    # southwest exclusive 2-D cumulative: pairs below-left of (i,j)
    cs = m.cumsum(axis=0).cumsum(axis=1)
    sw = np.zeros_like(m)
    sw[1:, 1:] = cs[:-1, :-1]
    ne_flip = np.flip(m, axis=1)
    csf = ne_flip.cumsum(axis=0).cumsum(axis=1)
    se = np.zeros_like(m)
    se[1:, 1:] = csf[:-1, :-1]
    se = np.flip(se, axis=1)          # pairs below-right of (i,j)
    nc = int((m * sw).sum())
    nd = int((m * se).sum())
    n = int(m.sum())
    rt2 = int(sum(int(t) * (int(t) - 1) for t in m.sum(axis=1)))
    ct2 = int(sum(int(t) * (int(t) - 1) for t in m.sum(axis=0)))
    p2 = n * (n - 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "concordant": np.array([nc], np.int64),
        "discordant": np.array([nd], np.int64),
        "tau_b": [float(rha(2.0 * float(nc - nd)
                            / np.sqrt(float(p2 - rt2)
                                      * float(p2 - ct2)), 6))],
        "somers_d_qty": [float(rha(2.0 * float(nc - nd)
                                   / float(p2 - ct2), 6))],
        "somers_d_disc": [float(rha(2.0 * float(nc - nd)
                                    / float(p2 - rt2), 6))]})


@register("van_elteren_weekend_value", sql="""
WITH c AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd
           FROM events),
h AS (SELECT g, cents,
             CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1, 2),
cum AS (SELECT g, c1, tt,
               2 * (SUM(tt) OVER (PARTITION BY g ORDER BY cents)
                    - tt) + tt + 1 AS m2,
               SUM(c1) OVER (PARTITION BY g) AS m1,
               SUM(tt) OVER (PARTITION BY g) AS mm
        FROM h),
strat AS (SELECT g, MAX(m1) AS m1, MAX(mm) AS mm,
                 MAX(mm) - MAX(m1) AS n2,
                 CAST(SUM(CAST(c1 AS HUGEINT) * m2) AS HUGEINT) AS w2,
                 CAST(SUM(CAST(tt AS HUGEINT) * tt * tt - tt)
                      AS HUGEINT) AS t3
          FROM cum GROUP BY g),
per AS (SELECT g,
               CAST(w2 AS DOUBLE) / (2.0 * (mm + 1)) AS te,
               CAST(m1 AS DOUBLE) / 2.0 AS ee,
               CAST(m1 AS DOUBLE) * n2 / 12.0
               * ((mm + 1) - CAST(t3 AS DOUBLE)
                             / (CAST(mm AS DOUBLE) * (mm - 1)))
               / (CAST(mm + 1 AS DOUBLE) * (mm + 1)) AS vv
        FROM strat WHERE m1 > 0 AND n2 > 0 AND mm > 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       ROUND(SUM(te), 6) AS t_weighted,
       ROUND(SUM(ee), 6) AS e_null,
       ROUND((SUM(te) - SUM(ee)) / SQRT(SUM(vv)), 6) AS z,
       CAST(CASE WHEN ABS((SUM(te) - SUM(ee)) / SQRT(SUM(vv)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS shift_rejected
FROM per""")
def van_elteren_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Van Elteren stratified Wilcoxon test: weekend vs weekday
    VALUE shift WITHIN each event type, combined with the
    locally-best 1/(M_s+1) weights. The rank analog of the CMH
    pooled odds ratio already in the registry — the pooled
    Mann–Whitney can declare a weekend effect that is really a MIX
    effect (weekends skew toward purchases, purchases are worth
    more); stratifying by type deconfounds, and the weighting makes
    the combination optimal rather than ad hoc. Per stratum the
    doubled rank-sum W2 = Σc₁(2F+t+1), its null mean m₁(M+1)/2 and
    the tie-corrected variance m₁n₂/12·((M+1) − Σ(t³−t)/(M(M−1)))
    all come exactly off one (type, cents, weekend) contingency;
    strata with an empty arm or M ≤ 1 drop on both engines, and
    the three per-stratum terms are shared float expressions summed
    over the k ≤ 5 strata."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "g": df["event_type"].astype(str),
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "c1": wkd, "tt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "cents"], {"c1": ("c1", "sum"), "tt": ("tt", "sum")}) \
        .to_pandas().sort_values(["g", "cents"], ignore_index=True)
    te = ee = vv = 0.0
    k = 0
    for g, grp in h.groupby("g", sort=True):
        c1 = grp["c1"].to_numpy(np.int64).astype(object)
        tt = grp["tt"].to_numpy(np.int64).astype(object)
        m1 = int(c1.sum())
        mm = int(tt.sum())
        n2 = mm - m1
        if m1 == 0 or n2 == 0 or mm <= 1:
            continue
        m2 = 2 * (tt.cumsum() - tt) + tt + 1
        w2 = int((c1 * m2).sum())
        t3 = int((tt * tt * tt - tt).sum())
        k += 1
        te += float(w2) / (2.0 * (mm + 1))
        ee += float(m1) / 2.0
        vv += float(m1) * n2 / 12.0 \
            * ((mm + 1) - float(t3) / (float(mm) * (mm - 1))) \
            / (float(mm + 1) * (mm + 1))
    z = (te - ee) / np.sqrt(vv)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_strata": np.array([k], np.int64),
        "t_weighted": [float(rha(te, 6))],
        "e_null": [float(rha(ee, 6))],
        "z": [float(rha(z, 6))],
        "shift_rejected": np.array(
            [1 if abs(z) > 1.959964 else 0], np.int64)})


@register("lepage_weekend_value", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd
           FROM events),
h AS (SELECT cents,
             CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1),
cum AS (SELECT c1, tt,
               2 * (SUM(tt) OVER (ORDER BY cents) - tt) + tt + 1
                   AS m2,
               SUM(tt) OVER (ORDER BY cents) - tt AS f,
               SUM(c1) OVER () AS n1, SUM(tt) OVER () AS n
        FROM h),
agg AS (SELECT MAX(n1) AS n1, MAX(n) AS n,
               CAST(SUM(CAST(c1 AS HUGEINT) * m2) AS HUGEINT) AS t1,
               CAST(SUM(CAST(c1 AS HUGEINT)
                        * ((n + 1) - ABS(2 * f + tt - n)))
                    AS HUGEINT) AS t2,
               CAST(SUM(CAST(tt AS HUGEINT)
                        * ((n + 1) - ABS(2 * f + tt - n)))
                    AS HUGEINT) AS s1,
               CAST(SUM(CAST(tt AS HUGEINT)
                        * ((n + 1) - ABS(2 * f + tt - n))
                        * ((n + 1) - ABS(2 * f + tt - n)))
                    AS HUGEINT) AS s2,
               CAST(SUM(CAST(tt AS HUGEINT) * tt * tt - tt)
                    AS HUGEINT) AS t3
        FROM cum),
f2 AS (SELECT n1, n - n1 AS n2, n, t1, t2,
              CAST(t1 - n1 * (n + 1) AS DOUBLE) / 2.0
              / SQRT(CAST(n1 AS DOUBLE) * (n - n1) / 12.0
                     * ((n + 1) - CAST(t3 AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * (n - 1))))
                  AS zw,
              (CAST(t2 AS DOUBLE) - CAST(n1 AS DOUBLE) * s1 / n)
              / SQRT(CAST(n1 AS DOUBLE) * (n - n1)
                     * CAST(n * s2 - s1 * s1 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * (n - 1))) AS zab
       FROM agg)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
       ROUND(zw, 6) AS z_wilcoxon, ROUND(zab, 6) AS z_ansari,
       ROUND(zw * zw + zab * zab, 6) AS lepage_l,
       CAST(CASE WHEN zw * zw + zab * zab > 5.991465
                 THEN 1 ELSE 0 END AS BIGINT) AS ls_rejected
FROM f2""")
def lepage_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Lepage joint location-scale test weekend vs weekday: L =
    z²_Wilcoxon + z²_Ansari–Bradley ~ χ²₂. The single-number gate
    for "is the weekend value distribution the SAME" that catches
    both failure modes at once — a pure shift (Wilcoxon alone
    flags), a pure spread change (AB alone), or the sneaky
    mixed case where each component sits at a non-significant
    1.5σ but their sum is decisive. The two z's come off ONE
    shared (cents, weekend) histogram: the doubled-midrank
    Wilcoxon numerator (T1 − n₁(N+1))/2 with tie-corrected
    variance, and the AB edge-score statistic with permutation
    moments, both exact 128-bit integer sums into shared float
    expressions — so the panel's components reconcile exactly
    with the standalone mann_whitney/ansari_bradley entries."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "c1": wkd, "tt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("c1", "sum"), "tt": ("tt", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64).astype(object)
    tt = h["tt"].to_numpy(np.int64).astype(object)
    n1 = int(c1.sum())
    n = int(tt.sum())
    n2 = n - n1
    f = tt.cumsum() - tt
    m2 = 2 * f + tt + 1
    s2v = (n + 1) - abs(2 * f + tt - n)
    t1 = int((c1 * m2).sum())
    t2 = int((c1 * s2v).sum())
    s1 = int((tt * s2v).sum())
    s2 = int((tt * s2v * s2v).sum())
    t3 = int((tt * tt * tt - tt).sum())
    zw = float(t1 - n1 * (n + 1)) / 2.0 \
        / np.sqrt(float(n1) * n2 / 12.0
                  * ((n + 1) - float(t3) / (float(n) * (n - 1))))
    zab = (float(t2) - float(n1) * s1 / n) \
        / np.sqrt(float(n1) * n2 * float(n * s2 - s1 * s1)
                  / (float(n) * n * (n - 1)))
    lp = zw * zw + zab * zab
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n2], np.int64),
        "z_wilcoxon": [float(rha(zw, 6))],
        "z_ansari": [float(rha(zab, 6))],
        "lepage_l": [float(rha(lp, 6))],
        "ls_rejected": np.array(
            [1 if lp > 5.991465 else 0], np.int64)})


@register("cucconi_weekend_value", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd
           FROM events),
h AS (SELECT cents,
             CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM c GROUP BY 1),
cum AS (SELECT c1, tt,
               2 * (SUM(tt) OVER (ORDER BY cents) - tt) + tt + 1
                   AS m2,
               SUM(c1) OVER () AS n1, SUM(tt) OVER () AS n
        FROM h),
agg AS (SELECT MAX(n1) AS n1, MAX(n) AS n,
               CAST(SUM(CAST(c1 AS HUGEINT) * m2 * m2) AS HUGEINT)
                   AS q4,
               CAST(SUM(CAST(c1 AS HUGEINT)
                        * (2 * (n + 1) - m2) * (2 * (n + 1) - m2))
                    AS HUGEINT) AS q4c
        FROM cum),
f AS (SELECT n1, n - n1 AS n2, n,
             (1.5 * CAST(q4 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (n + 1) * (2 * n + 1))
             / SQRT(CAST(n1 AS DOUBLE) * (n - n1) * (n + 1)
                    * (2 * n + 1) * (8 * n + 11) / 5.0) AS u,
             (1.5 * CAST(q4c AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (n + 1) * (2 * n + 1))
             / SQRT(CAST(n1 AS DOUBLE) * (n - n1) * (n + 1)
                    * (2 * n + 1) * (8 * n + 11) / 5.0) AS v,
             2.0 * (CAST(n AS DOUBLE) * n - 4)
             / ((2.0 * n + 1) * (8 * n + 11)) - 1.0 AS rho
      FROM agg)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(n2 AS BIGINT) AS n_weekday,
       ROUND(u, 6) AS u, ROUND(v, 6) AS v,
       ROUND((u * u + v * v - 2.0 * rho * u * v)
             / (2.0 * (1.0 - rho * rho)), 6) AS cucconi_c,
       CAST(CASE WHEN (u * u + v * v - 2.0 * rho * u * v)
                      / (2.0 * (1.0 - rho * rho)) > 2.995732
                 THEN 1 ELSE 0 END AS BIGINT) AS ls_rejected
FROM f""")
def cucconi_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Cucconi joint location-scale test weekend vs weekday — the
    1968 squared-ranks one-shot that modern comparisons score at or
    above Lepage's power, from completely different machinery: U
    standardizes the weekend sample's Σ(squared midranks), V its
    Σ(squared CONTRARY ranks N+1−R), and C = (U²+V²−2ρUV)/(2(1−ρ²))
    with the exact null correlation ρ = 2(N²−4)/((2N+1)(8N+11))−1;
    under H₀, P(C>c) = e^{−c}, so the 5% gate is ln 20 ≈ 2.9957.
    A shift drives U and V apart antisymmetrically, a spread change
    drives them together — C sees both. Quadrupled squared ranks
    Σc₁·(2R)² and Σc₁·(2(N+1)−2R)² are exact 128-bit integers off
    the same histogram the Lepage panel rides (both engines round
    the big int→double conversion identically); read the two
    queries together as method triangulation on the same
    question."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "c1": wkd, "tt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"c1": ("c1", "sum"), "tt": ("tt", "sum")}) \
        .to_pandas().sort_values("cents", ignore_index=True)
    c1 = h["c1"].to_numpy(np.int64).astype(object)
    tt = h["tt"].to_numpy(np.int64).astype(object)
    n1 = int(c1.sum())
    n = int(tt.sum())
    n2 = n - n1
    m2 = 2 * (tt.cumsum() - tt) + tt + 1
    q4 = int((c1 * m2 * m2).sum())
    mc = 2 * (n + 1) - m2
    q4c = int((c1 * mc * mc).sum())
    den = np.sqrt(float(n1) * n2 * (n + 1)
                  * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (1.5 * float(q4) - float(n1) * (n + 1) * (2 * n + 1)) / den
    v = (1.5 * float(q4c) - float(n1) * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (float(n) * n - 4) / ((2.0 * n + 1) * (8 * n + 11)) \
        - 1.0
    cstat = (u * u + v * v - 2.0 * rho * u * v) \
        / (2.0 * (1.0 - rho * rho))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n2], np.int64),
        "u": [float(rha(u, 6))],
        "v": [float(rha(v, 6))],
        "cucconi_c": [float(rha(cstat, 6))],
        "ls_rejected": np.array(
            [1 if cstat > 2.995732 else 0], np.int64)})


_VCP_SQL = """
c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
             CAST(SUM(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cl,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS p
      FROM events GROUP BY 1),
g AS (SELECT v, cl, p,
             CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT) AS t
      FROM c)"""


@register("partial_corr_views_purchases", sql=f"""
WITH {_VCP_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
             CAST(SUM(CAST(p AS HUGEINT) * p) AS HUGEINT) AS spp,
             CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
             CAST(SUM(CAST(v AS HUGEINT) * p) AS HUGEINT) AS svp,
             CAST(SUM(CAST(v AS HUGEINT) * t) AS HUGEINT) AS svt,
             CAST(SUM(CAST(p AS HUGEINT) * t) AS HUGEINT) AS spt
      FROM g),
r AS (SELECT n,
             CAST(n * svp - CAST(sv AS HUGEINT) * sp AS DOUBLE)
             / SQRT(CAST(n * svv - CAST(sv AS HUGEINT) * sv
                         AS DOUBLE)
                    * CAST(n * spp - CAST(sp AS HUGEINT) * sp
                           AS DOUBLE)) AS rvp,
             CAST(n * svt - CAST(sv AS HUGEINT) * st AS DOUBLE)
             / SQRT(CAST(n * svv - CAST(sv AS HUGEINT) * sv
                         AS DOUBLE)
                    * CAST(n * stt - CAST(st AS HUGEINT) * st
                           AS DOUBLE)) AS rvt,
             CAST(n * spt - CAST(sp AS HUGEINT) * st AS DOUBLE)
             / SQRT(CAST(n * spp - CAST(sp AS HUGEINT) * sp
                         AS DOUBLE)
                    * CAST(n * stt - CAST(st AS HUGEINT) * st
                           AS DOUBLE)) AS rpt
      FROM s)
SELECT n AS n_days,
       ROUND(rvp, 6) AS r_raw,
       ROUND(rvt, 6) AS r_views_trend,
       ROUND(rpt, 6) AS r_purchases_trend,
       ROUND((rvp - rvt * rpt)
             / SQRT((1.0 - rvt * rvt) * (1.0 - rpt * rpt)), 6)
           AS r_partial
FROM r""")
def partial_corr_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Partial correlation of daily views and purchases CONTROLLING
    for the day index — is the view-purchase coupling real, or are
    both just riding the same growth/decay trend? Two series that
    each drift upward correlate strongly while being causally
    unrelated; partialling out t removes exactly that shared-clock
    confounder: r_vp·t = (r_vp − r_vt·r_pt)/√((1−r_vt²)(1−r_pt²)).
    Raw minus partial is literally "how much of the correlation was
    trend" — the number the distance-correlation and Granger
    queries each assume has already been checked. All three
    pairwise r's are shared float expressions over exact 128-bit
    moments off ONE (date, type) reduce, with t the ROW_NUMBER day
    index on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "v": (et == "view").astype(np.int64),
            "cl": (et == "click").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"v": ("v", "sum"), "cl": ("cl", "sum"),
                 "p": ("p", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    v = c["v"].to_numpy(np.int64).astype(object)
    p = c["p"].to_numpy(np.int64).astype(object)
    n = len(c)
    t = np.arange(1, n + 1, dtype=object)
    sv, sp, st = int(v.sum()), int(p.sum()), int(t.sum())
    svv, spp, stt = int((v * v).sum()), int((p * p).sum()), \
        int((t * t).sum())
    svp, svt, spt = int((v * p).sum()), int((v * t).sum()), \
        int((p * t).sum())
    rvp = float(n * svp - sv * sp) / np.sqrt(
        float(n * svv - sv * sv) * float(n * spp - sp * sp))
    rvt = float(n * svt - sv * st) / np.sqrt(
        float(n * svv - sv * sv) * float(n * stt - st * st))
    rpt = float(n * spt - sp * st) / np.sqrt(
        float(n * spp - sp * sp) * float(n * stt - st * st))
    rp = (rvp - rvt * rpt) / np.sqrt((1.0 - rvt * rvt)
                                     * (1.0 - rpt * rpt))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "r_raw": [float(rha(rvp, 6))],
        "r_views_trend": [float(rha(rvt, 6))],
        "r_purchases_trend": [float(rha(rpt, 6))],
        "r_partial": [float(rha(rp, 6))]})


@register("mediation_views_clicks_purchases", sql=f"""
WITH {_VCP_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(cl) AS BIGINT) AS sm,
             CAST(SUM(p) AS BIGINT) AS sy,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
             CAST(SUM(CAST(cl AS HUGEINT) * cl) AS HUGEINT) AS smm,
             CAST(SUM(CAST(p AS HUGEINT) * p) AS HUGEINT) AS syy,
             CAST(SUM(CAST(v AS HUGEINT) * cl) AS HUGEINT) AS svm,
             CAST(SUM(CAST(v AS HUGEINT) * p) AS HUGEINT) AS svy,
             CAST(SUM(CAST(cl AS HUGEINT) * p) AS HUGEINT) AS smy
      FROM g),
m AS (SELECT n,
             CAST(n * svv - CAST(sv AS HUGEINT) * sv AS DOUBLE) / n
                 AS sxx,
             CAST(n * smm - CAST(sm AS HUGEINT) * sm AS DOUBLE) / n
                 AS smm2,
             CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) / n
                 AS syy2,
             CAST(n * svm - CAST(sv AS HUGEINT) * sm AS DOUBLE) / n
                 AS sxm,
             CAST(n * svy - CAST(sv AS HUGEINT) * sy AS DOUBLE) / n
                 AS sxy,
             CAST(n * smy - CAST(sm AS HUGEINT) * sy AS DOUBLE) / n
                 AS smy2
      FROM s),
f AS (SELECT n,
             sxm / sxx AS a,
             (smm2 - sxm * sxm / sxx) / (n - 2) / sxx AS se_a2,
             (sxx * smy2 - sxm * sxy)
             / (sxx * smm2 - sxm * sxm) AS b,
             (smm2 * sxy - sxm * smy2)
             / (sxx * smm2 - sxm * sxm) AS cp,
             sxy / sxx AS ctot,
             sxx, smm2, syy2, sxm, sxy, smy2
      FROM m),
f2 AS (SELECT n, a, b, cp, ctot, se_a2,
              (syy2 - cp * sxy - b * smy2) / (n - 3) * sxx
              / (sxx * smm2 - sxm * sxm) AS se_b2
       FROM f)
SELECT n AS n_days,
       ROUND(a, 6) AS a_views_to_clicks,
       ROUND(b, 6) AS b_clicks_to_purch,
       ROUND(ctot, 6) AS c_total,
       ROUND(cp, 6) AS c_direct,
       ROUND(a * b / SQRT(b * b * se_a2 + a * a * se_b2), 6)
           AS sobel_z,
       ROUND(a * b / ctot, 6) AS prop_mediated,
       CAST(CASE WHEN ABS(a * b / SQRT(b * b * se_a2
                                       + a * a * se_b2)) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS mediation_rejected
FROM f2""")
def mediation_views_clicks_purchases(sf_dir: str) -> pd.DataFrame:
    """Baron–Kenny mediation with the Sobel test on the daily grid:
    do views drive purchases THROUGH clicks? Path a (clicks ~
    views), path b and direct c′ (purchases ~ views + clicks,
    2-predictor OLS via the closed normal equations), total c
    (purchases ~ views); indirect effect a·b, Sobel
    z = ab/√(b²SE_a² + a²SE_b²), and the proportion mediated ab/c.
    The funnel query counts view→click→purchase chains per user;
    this asks the AGGREGATE routing question — if the daily
    view-purchase relation flows through clicks (c′ ≈ 0, prop ≈ 1)
    then the click pipeline is the bottleneck to optimize, while
    c′ ≫ 0 means a second path (direct deep-links) carries real
    volume. Every centered moment is an exact 128-bit integer
    scaled once by n; a, b, c′, the two standard errors and the
    Sobel ratio are the same closed-form float cascade on both
    engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "v": (et == "view").astype(np.int64),
            "cl": (et == "click").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"v": ("v", "sum"), "cl": ("cl", "sum"),
                 "p": ("p", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    v = c["v"].to_numpy(np.int64).astype(object)
    m = c["cl"].to_numpy(np.int64).astype(object)
    y = c["p"].to_numpy(np.int64).astype(object)
    n = len(c)
    sv, sm, sy = int(v.sum()), int(m.sum()), int(y.sum())
    svv, smm, syy = int((v * v).sum()), int((m * m).sum()), \
        int((y * y).sum())
    svm, svy, smy = int((v * m).sum()), int((v * y).sum()), \
        int((m * y).sum())
    sxx = float(n * svv - sv * sv) / n
    smm2 = float(n * smm - sm * sm) / n
    syy2 = float(n * syy - sy * sy) / n
    sxm = float(n * svm - sv * sm) / n
    sxy = float(n * svy - sv * sy) / n
    smy2 = float(n * smy - sm * sy) / n
    a = sxm / sxx
    se_a2 = (smm2 - sxm * sxm / sxx) / (n - 2) / sxx
    det = sxx * smm2 - sxm * sxm
    b = (sxx * smy2 - sxm * sxy) / det
    cp = (smm2 * sxy - sxm * smy2) / det
    ctot = sxy / sxx
    se_b2 = (syy2 - cp * sxy - b * smy2) / (n - 3) * sxx / det
    sobel = a * b / np.sqrt(b * b * se_a2 + a * a * se_b2)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "a_views_to_clicks": [float(rha(a, 6))],
        "b_clicks_to_purch": [float(rha(b, 6))],
        "c_total": [float(rha(ctot, 6))],
        "c_direct": [float(rha(cp, 6))],
        "sobel_z": [float(rha(sobel, 6))],
        "prop_mediated": [float(rha(a * b / ctot, 6))],
        "mediation_rejected": np.array(
            [1 if abs(sobel) > 1.959964 else 0], np.int64)})


@register("reset_quadratic_daily", sql=f"""
WITH {_DAILY_SQL},
s AS (SELECT MAX(n) AS n,
             CAST(SUM(t) AS HUGEINT) AS m1,
             CAST(SUM(t * t) AS HUGEINT) AS m2,
             CAST(SUM(t * t * t) AS HUGEINT) AS m3,
             CAST(SUM(CAST(t AS HUGEINT) * t * t * t) AS HUGEINT)
                 AS m4,
             CAST(SUM(y) AS HUGEINT) AS y0,
             CAST(SUM(t * y) AS HUGEINT) AS y1,
             CAST(SUM(CAST(t AS HUGEINT) * t * y) AS HUGEINT) AS y2,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS yy
      FROM x),
dets AS (SELECT n, y0, y1, y2, yy, m1, m2,
             n * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2)
             + m2 * (m1 * m3 - m2 * m2) AS det,
             y0 * (m2 * m4 - m3 * m3) - m1 * (y1 * m4 - m3 * y2)
             + m2 * (y1 * m3 - m2 * y2) AS d0,
             n * (y1 * m4 - y2 * m3) - y0 * (m1 * m4 - m3 * m2)
             + m2 * (m1 * y2 - y1 * m2) AS d1,
             n * (m2 * y2 - m3 * y1) - m1 * (m1 * y2 - m3 * y0)
             + y0 * (m1 * m3 - m2 * m2) AS d2
      FROM s),
f AS (SELECT n,
             (CAST(n * yy - y0 * y0 AS DOUBLE)
              - CAST(n * y1 - m1 * y0 AS DOUBLE)
                * CAST(n * y1 - m1 * y0 AS DOUBLE)
                / CAST(n * m2 - m1 * m1 AS DOUBLE)) / n AS ssr1,
             CAST(det * yy - (d0 * y0 + d1 * y1 + d2 * y2)
                  AS DOUBLE) / CAST(det AS DOUBLE) AS ssr2
      FROM dets)
SELECT n AS n_days,
       ROUND(ssr1, 6) AS ssr_linear,
       ROUND(ssr2, 6) AS ssr_quadratic,
       ROUND(CASE WHEN ssr2 > 0
                  THEN (ssr1 - ssr2) / (ssr2 / (n - 3))
                  ELSE 0 END, 6) AS f_stat,
       CAST(n - 3 AS BIGINT) AS df2,
       CAST(CASE WHEN ssr2 > 0
                  AND (ssr1 - ssr2) / (ssr2 / (n - 3)) > 4.21
                 THEN 1 ELSE 0 END AS BIGINT) AS curvature_rejected
FROM f""")
def reset_quadratic_daily(sf_dir: str) -> pd.DataFrame:
    """RESET-style curvature test on the daily trend: F-test of the
    t² term, i.e. SSR(linear) vs SSR(quadratic) with
    F = (SSR₁−SSR₂)/(SSR₂/(n−3)). Chow asks "did the line BREAK",
    Durbin–Watson asks "do residuals cluster" — this asks the prior
    question: is a LINE even the right functional form, or is
    growth accelerating/saturating (in which case the OLS slope,
    the Theil–Sen slope, and every forecast anchored on them are
    systematically biased at the window edges where capacity
    decisions live). The quadratic fit solves by Cramer's rule on
    the 3×3 integer moment matrix, so every determinant is an EXACT
    128-bit integer and SSR₂ = (det·ΣY² − ΣDᵢYᵢ)/det has an exact
    integer numerator — no iterative fit, one shared float division
    each side. Flag at 4.21, the F(1, ~27) 5% point for the
    ~30-day grids this table yields (documented constant)."""
    y = _daily_counts(sf_dir).astype(object)
    n = len(y)
    t = np.arange(1, n + 1, dtype=object)
    m1, m2, m3, m4 = int(t.sum()), int((t * t).sum()), \
        int((t ** 3).sum()), int((t ** 4).sum())
    y0, y1, y2 = int(y.sum()), int((t * y).sum()), \
        int((t * t * y).sum())
    yy = int((y * y).sum())
    det = n * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2) \
        + m2 * (m1 * m3 - m2 * m2)
    d0 = y0 * (m2 * m4 - m3 * m3) - m1 * (y1 * m4 - m3 * y2) \
        + m2 * (y1 * m3 - m2 * y2)
    d1 = n * (y1 * m4 - y2 * m3) - y0 * (m1 * m4 - m3 * m2) \
        + m2 * (m1 * y2 - y1 * m2)
    d2 = n * (m2 * y2 - m3 * y1) - m1 * (m1 * y2 - m3 * y0) \
        + y0 * (m1 * m3 - m2 * m2)
    ssr1 = (float(n * yy - y0 * y0)
            - float(n * y1 - m1 * y0) * float(n * y1 - m1 * y0)
            / float(n * m2 - m1 * m1)) / n
    ssr2 = float(det * yy - (d0 * y0 + d1 * y1 + d2 * y2)) \
        / float(det)
    f = (ssr1 - ssr2) / (ssr2 / (n - 3)) if ssr2 > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "ssr_linear": [float(rha(ssr1, 6))],
        "ssr_quadratic": [float(rha(ssr2, 6))],
        "f_stat": [float(rha(f, 6))],
        "df2": np.array([n - 3], np.int64),
        "curvature_rejected": np.array(
            [1 if ssr2 > 0 and f > 4.21 else 0], np.int64)})


@register("cooks_distance_top_days", sql=f"""
WITH {_DAILY_SQL},
s AS (SELECT MAX(n) AS n, CAST(SUM(t) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(t * y) AS HUGEINT) AS sxy
      FROM x),
f AS (SELECT n, sx, sy, sxx,
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                 AS b1,
             CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                 AS vx,
             (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
              - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx
                       AS DOUBLE)) / n AS ssr
      FROM s),
per AS (SELECT x.t, x.y, f.n,
               x.y - (f.b1 * x.t
                      + (f.sy - f.b1 * f.sx) / f.n) AS e,
               1.0 / f.n + (x.t - CAST(f.sx AS DOUBLE) / f.n)
                           * (x.t - CAST(f.sx AS DOUBLE) / f.n)
                           / (f.vx / f.n) AS h,
               f.ssr / (f.n - 2) AS s2
        FROM x CROSS JOIN f),
cd AS (SELECT t, y, n,
              ROUND(e, 6) AS resid, ROUND(h, 6) AS leverage,
              ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)),
                    6) AS cooks_d
       FROM per),
dd AS (SELECT strftime(ts, '%Y-%m-%d') AS dt FROM events GROUP BY 1),
dr AS (SELECT dt, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT)
                      AS t
       FROM dd)
SELECT dr.dt AS date, CAST(cd.y AS BIGINT) AS hits,
       cd.resid, cd.leverage, cd.cooks_d
FROM cd JOIN dr ON dr.t = cd.t
ORDER BY cd.cooks_d DESC, dr.dt LIMIT 3""")
def cooks_distance_top_days(sf_dir: str) -> pd.DataFrame:
    """Cook's distance of every day against the daily-count OLS
    trend, top-3: D_i = e_i²h_i/(p·s²(1−h_i)²) with leverage
    h_i = 1/n + (t_i−t̄)²/S_xx. The MAD outlier screen and Grubbs
    flag days that are far from the MEAN; Cook's D flags the days
    that are STEERING THE TREND — an extreme first or last day
    (high leverage) can tilt the slope while sitting closer to the
    line than a mid-series spike, which is exactly the failure mode
    of growth estimates on short windows. Residual, leverage and D
    are closed-form per-row float expressions off the five exact
    regression integers (no refit per day — the hat identity does
    the leave-one-out); D is rounded to 6dp BEFORE ranking so ties
    break to the earliest date identically on both engines."""
    y = _daily_counts(sf_dir)
    n = len(y)
    yo = y.astype(object)
    t = np.arange(1, n + 1, dtype=object)
    sx, sy = int(t.sum()), int(yo.sum())
    sxx, syy = int((t * t).sum()), int((yo * yo).sum())
    sxy = int((t * yo).sum())
    b1 = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    vx = float(n * sxx - sx * sx)
    ssr = (float(n * syy - sy * sy)
           - float(n * sxy - sx * sy) * float(n * sxy - sx * sy)
           / float(n * sxx - sx * sx)) / n
    tf = np.arange(1, n + 1, dtype=np.float64)
    e = y.astype(np.float64) - (b1 * tf + (sy - b1 * sx) / n)
    h = 1.0 / n + (tf - float(sx) / n) ** 2 / (vx / n)
    s2 = ssr / (n - 2)
    rha = textstats.round_half_away
    d6 = rha(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "date", pc.strftime(batch["ts"], format="%Y-%m-%d"))
    dts = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["date"], {"y": ("date", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    out = pd.DataFrame({
        "date": dts["date"].to_numpy(),
        "hits": y.astype(np.int64),
        "resid": rha(e, 6),
        "leverage": rha(h, 6),
        "cooks_d": d6})
    return out.sort_values(["cooks_d", "date"],
                           ascending=[False, True],
                           kind="mergesort").head(3) \
        .reset_index(drop=True)


def _top20_words(sf_dir: str) -> list:
    """Corpus top-20 words by count (cnt DESC, word ASC — the
    vocab_top_words tie rule) off the distributed (word, count)
    reduce; the reduced table is vocabulary-bounded."""
    def wc(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split()
        return pd.DataFrame({"word": np.concatenate(words.values)
                             if len(words) else np.array([], str)}) \
            .groupby("word", as_index=False).size() \
            .rename(columns={"size": "c"})

    cnt = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(wc,
                                            batch_format="pandas"),
        ["word"], {"c": ("c", "sum")}).to_pandas()
    return cnt.sort_values(["c", "word"], ascending=[False, True],
                           kind="mergesort").head(20)["word"].tolist()


@register("church_adaptation_top_words", sql=r"""
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
            FROM documents),
tok AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS word,
               unnest(range(1, len(ws) + 1)) AS i
        FROM w0),
cnt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1),
top AS (SELECT word FROM cnt ORDER BY c DESC, word LIMIT 20),
dw AS (SELECT t.word, t.doc_id,
              MAX(CASE WHEN 2 * t.i <= t.n THEN 1 ELSE 0 END) AS h1,
              MAX(CASE WHEN 2 * t.i > t.n THEN 1 ELSE 0 END) AS h2
       FROM tok t JOIN top USING (word) GROUP BY 1, 2),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs FROM documents),
agg AS (SELECT word,
               CAST(SUM(h1) AS BIGINT) AS d1,
               CAST(SUM(h2) AS BIGINT) AS d2,
               CAST(SUM(h1 * h2) AS BIGINT) AS d12
        FROM dw GROUP BY 1)
SELECT word, d1, d2, d12,
       ROUND(CASE WHEN d1 > 0
                  THEN CAST(d12 AS DOUBLE) / d1 ELSE 0 END, 6)
           AS p_adapt,
       ROUND(CAST(d2 AS DOUBLE) / ndocs, 6) AS p_prior,
       ROUND(CASE WHEN d1 > 0 AND d2 > 0
                  THEN (CAST(d12 AS DOUBLE) / d1)
                       / (CAST(d2 AS DOUBLE) / ndocs)
                  ELSE 0 END, 6) AS adaptation_boost
FROM agg CROSS JOIN nd ORDER BY word""")
def church_adaptation_top_words(sf_dir: str) -> pd.DataFrame:
    """Church adaptation ("one occurrence begets another", Church
    2000) for the corpus top-20 words: P(word in a doc's SECOND
    half | it appeared in the FIRST half) against the prior
    P(in second half of any doc). The corpus-level frequency tables
    treat every token as independent; adaptation_boost ≫ 1 is the
    within-document burstiness that violates that — exactly the
    property that makes naive unigram LMs misprice repeated
    entities and makes dedup miss internally-duplicated docs
    (boost near the top of this table is the boilerplate signature
    at DOCUMENT granularity, complementing the cross-doc
    sentence_dup_rate). Two passes: the (word, count) reduce picks
    the shortlist with the vocab_top_words tie rule, then the
    20-word set broadcasts into a per-doc half-membership pass —
    only (word, d1, d2, d12) integer partials shuffle. Halves split
    at token ⌊n/2⌋ (middle token → second half, documented)."""
    top = _top20_words(sf_dir)
    tset = set(top)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {w: [0, 0, 0] for w in tset}
        for txt in df["text"]:
            toks = txt.split()
            h = len(toks) // 2
            first = tset.intersection(toks[:h])
            second = tset.intersection(toks[h:])
            for w in first:
                rows[w][0] += 1
            for w in second:
                rows[w][1] += 1
            for w in first & second:
                rows[w][2] += 1
        return pd.DataFrame({
            "word": list(rows),
            "d1": [v[0] for v in rows.values()],
            "d2": [v[1] for v in rows.values()],
            "d12": [v[2] for v in rows.values()]})

    agg = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pandas"),
        ["word"], {"d1": ("d1", "sum"), "d2": ("d2", "sum"),
                   "d12": ("d12", "sum")}).to_pandas()
    nd = int(_docs(sf_dir, ["doc_id"]).count())
    agg = agg.set_index("word").reindex(top).fillna(0).astype(
        {"d1": np.int64, "d2": np.int64, "d12": np.int64}) \
        .reset_index().sort_values("word", ignore_index=True)
    rha = textstats.round_half_away
    d1 = agg["d1"].to_numpy(np.int64)
    d2 = agg["d2"].to_numpy(np.int64)
    d12 = agg["d12"].to_numpy(np.int64)
    p_adapt = np.where(d1 > 0, d12 / np.maximum(d1, 1), 0.0)
    p_prior = d2 / nd
    boost = np.where((d1 > 0) & (d2 > 0),
                     p_adapt / np.where(d2 > 0, p_prior, 1.0), 0.0)
    return pd.DataFrame({
        "word": agg["word"],
        "d1": d1, "d2": d2, "d12": d12,
        "p_adapt": rha(p_adapt, 6),
        "p_prior": rha(p_prior, 6),
        "adaptation_boost": rha(boost, 6)})


@register("keyword_fronting_top_words", sql=r"""
WITH w0 AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
            FROM documents),
tok AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS word,
               unnest(range(1, len(ws) + 1)) AS i
        FROM w0),
cnt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1),
top AS (SELECT word FROM cnt ORDER BY c DESC, word LIMIT 20),
fo AS (SELECT t.word, t.doc_id,
              CAST(MIN(t.i) AS DOUBLE) / MIN(t.n) AS relpos
       FROM tok t JOIN top USING (word) GROUP BY 1, 2)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(relpos), 6) AS mean_first_relpos
FROM fo GROUP BY 1 ORDER BY 1""")
def keyword_fronting_top_words(sf_dir: str) -> pd.DataFrame:
    """Keyword fronting: for each corpus top-20 word, the mean
    relative position (first occurrence index / doc length) across
    the docs that contain it. Frequency tables say WHICH words
    dominate; position says WHERE they live — words that
    consistently front (mean ≪ 0.5) are title/lede/boilerplate-
    header material, words that trail are signature/footer
    material, and both are what a quality-filter or
    template-stripping pass should target before the body text is
    judged. Same two-pass shape as the adaptation query (shortlist
    reduce → broadcast membership pass); per-(doc, word) first
    positions are exact integers, only (word, Σrelpos, count)
    partials shuffle, and the relpos convention i/n is shared
    (1-based index over whitespace tokens)."""
    top = _top20_words(sf_dir)
    tset = set(top)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc = {w: [0.0, 0] for w in tset}
        for txt in df["text"]:
            toks = txt.split()
            n = len(toks)
            seen = {}
            for i, w in enumerate(toks, 1):
                if w in tset and w not in seen:
                    seen[w] = i
            for w, i in seen.items():
                acc[w][0] += float(i) / n
                acc[w][1] += 1
        return pd.DataFrame({
            "word": list(acc),
            "s": [v[0] for v in acc.values()],
            "c": [v[1] for v in acc.values()]})

    agg = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pandas"),
        ["word"], {"s": ("s", "sum"), "c": ("c", "sum")}).to_pandas()
    agg = agg[agg["c"] > 0].sort_values("word", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "word": agg["word"],
        "n_docs": agg["c"].to_numpy(np.int64),
        "mean_first_relpos": rha(
            agg["s"].to_numpy(np.float64)
            / agg["c"].to_numpy(np.float64), 6)})


_NEWUSER_SQL = """
dd AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id FROM events),
fu AS (SELECT user_id, MIN(dt) AS dt FROM dd GROUP BY 1),
nt AS (SELECT dt, CAST(COUNT(*) AS BIGINT) AS nu FROM fu GROUP BY 1),
grid AS (SELECT dt FROM dd GROUP BY dt),
gz AS (SELECT grid.dt, COALESCE(nt.nu, 0) AS nu
       FROM grid LEFT JOIN nt USING (dt))"""


@register("bass_diffusion_fit", sql=f"""
WITH {_NEWUSER_SQL},
o AS (SELECT nu,
             CAST(SUM(nu) OVER (ORDER BY dt) - nu AS BIGINT) AS cum
      FROM gz),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cum) AS HUGEINT) AS m1,
             CAST(SUM(CAST(cum AS HUGEINT) * cum) AS HUGEINT) AS m2,
             CAST(SUM(CAST(cum AS HUGEINT) * cum * cum) AS HUGEINT)
                 AS m3,
             CAST(SUM(CAST(cum AS HUGEINT) * cum * cum * cum)
                  AS HUGEINT) AS m4,
             CAST(SUM(nu) AS HUGEINT) AS y0,
             CAST(SUM(CAST(nu AS HUGEINT) * cum) AS HUGEINT) AS y1,
             CAST(SUM(CAST(nu AS HUGEINT) * cum * cum) AS HUGEINT)
                 AS y2
      FROM o),
dets AS (SELECT n, y0,
             n * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2)
             + m2 * (m1 * m3 - m2 * m2) AS det,
             y0 * (m2 * m4 - m3 * m3) - m1 * (y1 * m4 - m3 * y2)
             + m2 * (y1 * m3 - m2 * y2) AS d0,
             n * (y1 * m4 - y2 * m3) - y0 * (m1 * m4 - m3 * m2)
             + m2 * (m1 * y2 - y1 * m2) AS d1,
             n * (m2 * y2 - m3 * y1) - m1 * (m1 * y2 - m3 * y0)
             + y0 * (m1 * m3 - m2 * m2) AS d2
      FROM s),
co AS (SELECT n, CAST(y0 AS BIGINT) AS users,
              CASE WHEN det <> 0
                   THEN CAST(d0 AS DOUBLE) / CAST(det AS DOUBLE)
                   ELSE 0 END AS a,
              CASE WHEN det <> 0
                   THEN CAST(d1 AS DOUBLE) / CAST(det AS DOUBLE)
                   ELSE 0 END AS b,
              CASE WHEN det <> 0
                   THEN CAST(d2 AS DOUBLE) / CAST(det AS DOUBLE)
                   ELSE 0 END AS c
       FROM dets),
dv AS (SELECT n, users, a, b, c, b * b - 4.0 * a * c AS disc
       FROM co),
mm AS (SELECT n, users, a, b, c, disc,
              CASE WHEN c <> 0 AND disc > 0
                   THEN (-b - SQRT(disc)) / (2.0 * c)
                   ELSE 0 END AS m
       FROM dv),
fin AS (SELECT n, users, a, b, c, m,
               CASE WHEN m > 0 THEN a / m ELSE 0 END AS p,
               CASE WHEN m > 0 THEN -c * m ELSE 0 END AS q
        FROM mm)
SELECT n AS n_days, users AS n_users,
       ROUND(a, 6) AS a, ROUND(b, 6) AS b, ROUND(c, 6) AS c,
       ROUND(CASE WHEN p > 0 AND q > 0 THEN m ELSE 0 END, 6)
           AS m_saturation,
       ROUND(CASE WHEN p > 0 AND q > 0 THEN p ELSE 0 END, 6)
           AS p_innovation,
       ROUND(CASE WHEN p > 0 AND q > 0 THEN q ELSE 0 END, 6)
           AS q_imitation,
       ROUND(CASE WHEN p > 0 AND q > 0
                  THEN LN(q / p) / (p + q) ELSE 0 END, 6)
           AS t_peak_days,
       CAST(CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS bass_valid
FROM fin""")
def bass_diffusion_fit(sf_dir: str) -> pd.DataFrame:
    """Discrete Bass diffusion fit on daily NEW-user arrivals:
    n_t = a + b·N_{t−1} + c·N²_{t−1} solved exactly, then
    re-parameterized to the Bass constants — market size m (the
    positive root of a + bm + cm² = 0, minus-root convention),
    innovation p = a/m (adoption from outside: ads, search),
    imitation q = −c·m (adoption driven by existing users:
    referrals, network effects), and the peak-adoption forecast
    t* = ln(q/p)/(p+q) days from launch. The cumulative-users
    curve says how many came; Bass says WHY (p vs q names the
    channel) and WHEN it ends (m is the ceiling — the number the
    cumulative curve only reveals after it's too late to matter).
    First-seen dates reduce associatively (MIN per user, then a
    (date, count) reduce over the zero-filled observed-day grid);
    the quadratic regression solves by Cramer on exact 128-bit
    integer moments — no iterative fit — and the root/ratio cascade
    is shared float expressions with degenerate fits flagged
    bass_valid = 0 identically on both engines."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "dt": df["ts"].dt.strftime("%Y-%m-%d")})

    first = reduce_sink(ds.map_batches(prep, batch_format="pandas"),
                        ["user_id"], {"dt": ("dt", "min")})

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("dt", as_index=False).size() \
            .rename(columns={"size": "nu"})

    nt = reduce_sink(first.map_batches(cnt, batch_format="pandas"),
                     ["dt"], {"nu": ("nu", "sum")}).to_pandas()
    grid = reduce_sink(ds.map_batches(prep, batch_format="pandas"),
                       ["dt"], {"user_id": ("user_id", "size")}) \
        .to_pandas()[["dt"]]
    g = grid.merge(nt, on="dt", how="left").fillna(0) \
        .sort_values("dt", ignore_index=True)
    nu = g["nu"].to_numpy(np.int64).astype(object)
    cum = nu.cumsum() - nu
    n = len(g)
    m1, m2 = int(cum.sum()), int((cum * cum).sum())
    m3, m4 = int((cum ** 3).sum()), int((cum ** 4).sum())
    y0, y1, y2 = int(nu.sum()), int((nu * cum).sum()), \
        int((nu * cum * cum).sum())
    det = n * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m3 * m2) \
        + m2 * (m1 * m3 - m2 * m2)
    rha = textstats.round_half_away
    a = b = c = mv = p = q = tp = 0.0
    valid = 0
    if det != 0:
        d0 = y0 * (m2 * m4 - m3 * m3) - m1 * (y1 * m4 - m3 * y2) \
            + m2 * (y1 * m3 - m2 * y2)
        d1 = n * (y1 * m4 - y2 * m3) - y0 * (m1 * m4 - m3 * m2) \
            + m2 * (m1 * y2 - y1 * m2)
        d2 = n * (m2 * y2 - m3 * y1) - m1 * (m1 * y2 - m3 * y0) \
            + y0 * (m1 * m3 - m2 * m2)
        a = float(d0) / float(det)
        b = float(d1) / float(det)
        c = float(d2) / float(det)
        disc = b * b - 4.0 * a * c
        if c != 0 and disc > 0:
            mv = (-b - np.sqrt(disc)) / (2.0 * c)
        if mv > 0:
            p, q = a / mv, -c * mv
        if p > 0 and q > 0:
            valid = 1
            tp = np.log(q / p) / (p + q)
        else:
            mv = p = q = 0.0
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_users": np.array([y0], np.int64),
        "a": [float(rha(a, 6))], "b": [float(rha(b, 6))],
        "c": [float(rha(c, 6))],
        "m_saturation": [float(rha(mv, 6))],
        "p_innovation": [float(rha(p, 6))],
        "q_imitation": [float(rha(q, 6))],
        "t_peak_days": [float(rha(tp, 6))],
        "bass_valid": np.array([valid], np.int64)})


@register("arrival_gini_concentration", sql=f"""
WITH {_NEWUSER_SQL},
r AS (SELECT nu, CAST(ROW_NUMBER() OVER (ORDER BY nu, dt) AS BIGINT)
                     AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM gz),
s AS (SELECT MAX(n) AS n,
             CAST(SUM(nu) AS BIGINT) AS tot,
             CAST(SUM(CAST(i AS HUGEINT) * nu) AS HUGEINT) AS iw,
             CAST(MAX(nu) AS BIGINT) AS mx
      FROM r)
SELECT n AS n_days, tot AS n_users,
       ROUND(CAST(2 * iw - CAST(n + 1 AS HUGEINT) * tot AS DOUBLE)
             / (CAST(n AS DOUBLE) * tot), 6) AS gini_arrivals,
       ROUND(CAST(mx AS DOUBLE) / tot, 6) AS peak_day_share
FROM s""")
def arrival_gini_concentration(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of NEW-user arrival timing over the
    zero-filled observed-day grid (plus the peak day's share):
    G near 0 means steady signup flow, G near 1 means adoption
    arrived as a burst — launch-day spike, a press hit, a bot
    cohort. The companion readout to bass_diffusion_fit: Bass
    assumes a smooth p/q mixture, and a high arrival Gini is the
    pre-check that says the curve is event-driven instead, so m
    and t* shouldn't be trusted. G = (2Σi·c₍ᵢ₎ − (n+1)ΣC)/(n·ΣC)
    over ascending-sorted day counts is exact integer arithmetic
    (ties commute in Σi·c, zero days shift ranks identically on
    both engines); peak share is an exact ratio."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "dt": df["ts"].dt.strftime("%Y-%m-%d")})

    first = reduce_sink(ds.map_batches(prep, batch_format="pandas"),
                        ["user_id"], {"dt": ("dt", "min")})

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("dt", as_index=False).size() \
            .rename(columns={"size": "nu"})

    nt = reduce_sink(first.map_batches(cnt, batch_format="pandas"),
                     ["dt"], {"nu": ("nu", "sum")}).to_pandas()
    grid = reduce_sink(ds.map_batches(prep, batch_format="pandas"),
                       ["dt"], {"user_id": ("user_id", "size")}) \
        .to_pandas()[["dt"]]
    g = grid.merge(nt, on="dt", how="left").fillna(0) \
        .sort_values("dt", ignore_index=True)
    nu = np.sort(g["nu"].to_numpy(np.int64)).astype(object)
    n = len(nu)
    tot = int(nu.sum())
    iw = int((np.arange(1, n + 1, dtype=object) * nu).sum())
    gini = float(2 * iw - (n + 1) * tot) / (float(n) * tot)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_users": np.array([tot], np.int64),
        "gini_arrivals": [float(rha(gini, 6))],
        "peak_day_share": [float(rha(
            float(int(max(nu))) / tot, 6))]})


@register("t_closeness_audit", sql="""
WITH cell AS (SELECT hour(ts) AS hr, dayofweek(ts) AS dow,
                     event_type AS s, CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2, 3),
grp AS (SELECT hr, dow, CAST(SUM(c) AS BIGINT) AS ng
        FROM cell GROUP BY 1, 2),
gdist AS (SELECT s, CAST(SUM(c) AS BIGINT) AS cg FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
dev AS (SELECT grp.hr, grp.dow, grp.ng,
               CAST(SUM(ABS(CAST(COALESCE(cell.c, 0) AS HUGEINT)
                            * tot.n
                            - CAST(gdist.cg AS HUGEINT) * grp.ng))
                    AS HUGEINT) AS num
        FROM grp CROSS JOIN gdist CROSS JOIN tot
        LEFT JOIN cell ON cell.hr = grp.hr AND cell.dow = grp.dow
                      AND cell.s = gdist.s
        GROUP BY 1, 2, 3),
tg AS (SELECT ng,
              CAST(num AS DOUBLE)
              / (2.0 * ng * (SELECT n FROM tot)) AS t
       FROM dev)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(MAX(t), 6) AS t_max,
       ROUND(AVG(t), 6) AS t_mean,
       CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_over_02
FROM tg""")
def t_closeness_audit(sf_dir: str) -> pd.DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007) completing
    the k-anonymity → l-diversity → t-closeness privacy triad in
    the registry: per QI group (hour, weekday), the total-variation
    distance between the group's event-TYPE distribution and the
    global one. k and l stop re-identification and bare attribute
    disclosure; t-closeness stops the subtler skew leak — a group
    can hold 50 users and 3 distinct types (passing both audits)
    while being 95% 'purchase', which tells an attacker what
    members of that hour-slot DO. TVD is the categorical EMD:
    t_g = ½Σ|c_i/n_g − C_i/N| has exact integer numerators
    |c_i·N − C_i·n_g| (zero-filled cells free on both engines via
    the group×type lattice), so each t is one shared float ratio;
    the audit folds the group table to four scalars — rows never
    reach the driver. Weekday numbering differs between engines but
    only labels groups, never membership."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hr": df["ts"].dt.hour.to_numpy(np.int64),
            "dow": df["ts"].dt.dayofweek.to_numpy(np.int64),
            "s": df["event_type"].astype(str),
            "c": np.ones(len(df), np.int64)})

    cell = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["hr", "dow", "s"], {"c": ("c", "sum")}).to_pandas()
    n = int(cell["c"].sum())
    glob = cell.groupby("s")["c"].sum()
    piv = cell.pivot_table(index=["hr", "dow"], columns="s",
                           values="c", fill_value=0, aggfunc="sum") \
        .reindex(columns=glob.index, fill_value=0)
    ng = piv.sum(axis=1).to_numpy(np.int64).astype(object)
    cg = glob.to_numpy(np.int64).astype(object)
    cm = piv.to_numpy(np.int64).astype(object)
    num = np.abs(cm * n - cg[None, :] * ng[:, None]).sum(axis=1)
    t = np.array([float(v) for v in num]) \
        / (2.0 * ng.astype(np.float64) * n)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_groups": np.array([len(t)], np.int64),
        "t_max": [float(rha(t.max(), 6))],
        "t_mean": [float(rha(t.mean(), 6))],
        "groups_over_02": np.array([int((t > 0.2).sum())], np.int64)})


@register("generalization_tradeoff_audit", sql="""
WITH fine AS (SELECT event_type, hour(ts) AS hr, dayofweek(ts) AS dow,
                     CAST(COUNT(*) AS BIGINT) AS ng
              FROM events GROUP BY 1, 2, 3),
coarse AS (SELECT event_type, hour(ts) // 6 AS band,
                  CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                            IN (0, 6) THEN 1 ELSE 0 END AS wkd,
                  CAST(COUNT(*) AS BIGINT) AS ng
           FROM events GROUP BY 1, 2, 3),
f AS (SELECT 'fine_type_hour_dow' AS level,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CAST(ng AS HUGEINT) * ng) AS BIGINT) AS dm_cost,
             CAST(SUM(CASE WHEN ng < 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS groups_lt5,
             CAST(SUM(CASE WHEN ng < 5 THEN ng ELSE 0 END) AS BIGINT)
                 AS rows_at_risk
      FROM fine),
c AS (SELECT 'coarse_type_band_wkd' AS level,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CAST(ng AS HUGEINT) * ng) AS BIGINT) AS dm_cost,
             CAST(SUM(CASE WHEN ng < 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS groups_lt5,
             CAST(SUM(CASE WHEN ng < 5 THEN ng ELSE 0 END) AS BIGINT)
                 AS rows_at_risk
      FROM coarse)
SELECT * FROM f UNION ALL SELECT * FROM c ORDER BY level""")
def generalization_tradeoff_audit(sf_dir: str) -> pd.DataFrame:
    """The anonymization COST-BENEFIT table: k-anonymity risk vs
    discernibility penalty at two QI generalization levels —
    fine (type, hour, weekday) and coarse (type, 6h-band,
    weekend-flag). Generalizing always helps privacy (fewer
    sub-5 groups, fewer rows at risk) and always hurts utility;
    the discernibility metric DM = Σn_g² (Bayardo–Agrawal) prices
    that utility loss as the number of record pairs made mutually
    indistinguishable. Publishing both rows side by side is the
    actual decision artifact a release review needs: if coarse
    zeroes rows_at_risk while DM only doubles, generalize; if DM
    explodes, suppress the stragglers instead. All integers off
    two contingency reduces; the audit folds each group table to
    four scalars so neither rows nor groups reach the driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "et": df["event_type"].astype(str),
            "hr": df["ts"].dt.hour.to_numpy(np.int64),
            "dow": df["ts"].dt.dayofweek.to_numpy(np.int64),
            "band": df["ts"].dt.hour.to_numpy(np.int64) // 6,
            "wkd": np.isin((day + 4) % 7, (0, 6)).astype(np.int64),
            "c": np.ones(len(df), np.int64)})

    ds = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(prep, batch_format="pandas")
    rows = []
    for level, keys in [("fine_type_hour_dow", ["et", "hr", "dow"]),
                        ("coarse_type_band_wkd",
                         ["et", "band", "wkd"])]:
        g = reduce_sink(ds, keys, {"c": ("c", "sum")}).to_pandas()
        ng = g["c"].to_numpy(np.int64).astype(object)
        rows.append((level, len(g), int((ng * ng).sum()),
                     int((g["c"] < 5).sum()),
                     int(g.loc[g["c"] < 5, "c"].sum())))
    rows.sort()
    return pd.DataFrame({
        "level": [r[0] for r in rows],
        "n_groups": np.array([r[1] for r in rows], np.int64),
        "dm_cost": np.array([r[2] for r in rows], np.int64),
        "groups_lt5": np.array([r[3] for r in rows], np.int64),
        "rows_at_risk": np.array([r[4] for r in rows], np.int64)})


def _session_size_hist_pd(sf_dir: str) -> pd.DataFrame:
    """(session_events k, sessions c) histogram via the shared
    bucket-hash sessionizer; only histogram partials leave the
    cluster."""
    sess = _sessionized_events(sf_dir)
    per = reduce_sink(sess, ["user_id", "sid"],
                      {"k": ("sid", "size")})
    return reduce_sink(per, ["k"], {"c": ("k", "size")}).to_pandas() \
        .sort_values("k", ignore_index=True) \
        .astype({"k": np.int64, "c": np.int64})


_SESS_HIST_SQL = f"""
sid AS (SELECT user_id, ts, event_id,
               SUM(ns) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS k
      FROM sid GROUP BY 1, 2),
h AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1)"""


@register("session_mean_residual_life", sql=f"""
WITH {_SESS_HIST_SQL},
th AS (SELECT UNNEST([1, 2, 5, 10]) AS t),
r AS (SELECT th.t,
             CAST(SUM(CASE WHEN h.k > th.t THEN h.c ELSE 0 END)
                  AS BIGINT) AS at_risk,
             CAST(SUM(CASE WHEN h.k > th.t
                           THEN (h.k - th.t) * h.c ELSE 0 END)
                  AS BIGINT) AS excess
      FROM h CROSS JOIN th GROUP BY 1)
SELECT CAST(t AS BIGINT) AS after_events, at_risk,
       ROUND(CASE WHEN at_risk > 0
                  THEN CAST(excess AS DOUBLE) / at_risk
                  ELSE 0 END, 6) AS mean_remaining_events
FROM r ORDER BY 1""")
def session_mean_residual_life(sf_dir: str) -> pd.DataFrame:
    """Mean residual life of sessions: once a session has survived
    past t ∈ {1, 2, 5, 10} events, how many MORE events should the
    system expect? The size histogram says how long sessions WERE;
    MRL is the forward-looking version infra actually provisions
    on — cache/prefetch budgets and sticky-routing TTLs key on
    E[remaining | alive], and its SHAPE is diagnostic: rising MRL
    (heavy tail) means long sessions predict longer still — never
    evict a warm session's state — while falling MRL means
    engagement burns out and eager eviction is safe. Exact integer
    sums Σ(k−t)·c over the (k, sessions) histogram from the shared
    bucket-hash sessionizer (sessions never span buckets); one
    shared float division per threshold row."""
    h = _session_size_hist_pd(sf_dir)
    k = h["k"].to_numpy(np.int64).astype(object)
    c = h["c"].to_numpy(np.int64).astype(object)
    rha = textstats.round_half_away
    rows = []
    for t in (1, 2, 5, 10):
        sel = k > t
        at_risk = int(c[sel].sum())
        excess = int(((k[sel] - t) * c[sel]).sum())
        mrl = float(excess) / at_risk if at_risk > 0 else 0.0
        rows.append((t, at_risk, float(rha(mrl, 6))))
    return pd.DataFrame({
        "after_events": np.array([r[0] for r in rows], np.int64),
        "at_risk": np.array([r[1] for r in rows], np.int64),
        "mean_remaining_events": [r[2] for r in rows]})


@register("session_position_hazard", sql=f"""
WITH {_SESS_HIST_SQL},
pos AS (SELECT UNNEST(range(1, 11)) AS p),
r AS (SELECT pos.p,
             CAST(SUM(CASE WHEN h.k >= pos.p THEN h.c ELSE 0 END)
                  AS BIGINT) AS at_risk,
             CAST(SUM(CASE WHEN h.k = pos.p THEN h.c ELSE 0 END)
                  AS BIGINT) AS ended
      FROM h CROSS JOIN pos GROUP BY 1)
SELECT CAST(p AS BIGINT) AS position, at_risk, ended,
       ROUND(CASE WHEN at_risk > 0
                  THEN CAST(ended AS DOUBLE) / at_risk
                  ELSE 0 END, 6) AS hazard
FROM r ORDER BY 1""")
def session_position_hazard(sf_dir: str) -> pd.DataFrame:
    """Discrete dropout hazard by session position: P(session ends
    at exactly its p-th event | it reached p), for p = 1..10. The
    size histogram shows the marginal; the hazard shows WHERE the
    product loses people — a spike at p = 2 (classic
    pogo-sticking) is invisible in means and medians, and a flat
    hazard certifies geometric session lengths (the memoryless
    assumption geometric_gof_sessions_per_user tests for session
    COUNTS, here checked for session DEPTHS). h_p = c_p / Σ_{{k≥p}}c_k
    is an exact integer ratio per row off the same shared
    sessionizer histogram; companion to session_mean_residual_life
    (hazard is the derivative view, MRL the integral view of the
    same survival curve)."""
    h = _session_size_hist_pd(sf_dir)
    k = h["k"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    rha = textstats.round_half_away
    rows = []
    for p in range(1, 11):
        at_risk = int(c[k >= p].sum())
        ended = int(c[k == p].sum())
        hz = float(ended) / at_risk if at_risk > 0 else 0.0
        rows.append((p, at_risk, ended, float(rha(hz, 6))))
    return pd.DataFrame({
        "position": np.array([r[0] for r in rows], np.int64),
        "at_risk": np.array([r[1] for r in rows], np.int64),
        "ended": np.array([r[2] for r in rows], np.int64),
        "hazard": [r[3] for r in rows]})


@register("position_decay_attribution", sql="""
WITH t AS (SELECT user_id, ts AS vts, event_id AS vid,
                  event_type AS tt
           FROM events WHERE event_type IN ('view', 'click')),
p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'),
pairs AS (SELECT pid, tt, pts, vts, vid,
                 COUNT(*) OVER (PARTITION BY pid) AS n,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts, vid) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts DESC, vid DESC)
                     AS rl,
                 SUM(POWER(2.0, -(CAST(epoch_us(pts) - epoch_us(vts)
                                       AS DOUBLE) / 1800000000.0)))
                     OVER (PARTITION BY pid) AS wsum
          FROM p JOIN t ON p.user_id = t.user_id
               AND t.vts <= p.pts
               AND t.vts > p.pts - INTERVAL 1 HOUR),
c AS (SELECT tt,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rf = 1 OR rl = 1 THEN 0.4
                  ELSE 0.2 / (n - 2) END AS uc,
             POWER(2.0, -(CAST(epoch_us(pts) - epoch_us(vts)
                               AS DOUBLE) / 1800000000.0)) / wsum
                 AS dc
      FROM pairs)
SELECT tt AS touch_type, CAST(COUNT(*) AS BIGINT) AS touches,
       ROUND(SUM(uc), 4) AS u_shaped_credit,
       ROUND(SUM(dc), 4) AS time_decay_credit
FROM c GROUP BY 1 ORDER BY 1""")
def position_decay_attribution(sf_dir: str) -> pd.DataFrame:
    """U-shaped (position-based 40/20/40) and time-decay (30-minute
    half-life) attribution of purchases to their 1-hour window of
    view AND click touches, credited by touch TYPE — completing the
    five standard marketing models (attribution_by_hour already
    carries first/last/linear). The models answer different
    budget questions: U-shaped prices discovery and closing
    equally; time-decay prices recency — and the spread between
    their per-type credits IS the sensitivity analysis ("does the
    click channel's value depend on the model?") that a single
    model hides. Same bucket-hash machinery as the existing
    attribution: one composite-key searchsorted per bucket finds
    every window, position ties break by event_id, decay weights
    share the exact-µs exponent 2^(−Δ/1800s) and normalize within
    each purchase; credits round at 4dp like linear_credit."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(
            ("purchase", "view", "click"))].copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    hour_us = np.int64(3_600_000_000)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"tt": pd.Series([], dtype=str),
                             "touches": pd.Series([], dtype=np.int64),
                             "uc": pd.Series([], dtype=np.float64),
                             "dc": pd.Series([], dtype=np.float64)})

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        is_p = (g["event_type"] == "purchase").to_numpy()
        if not is_p.any() or is_p.all():
            return _empty()
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        is_p = (g["event_type"] == "purchase").to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        if int(uranks.max(initial=0) + 1) > (2 ** 63 - 1) // int(span):
            raise ValueError("composite key overflow")
        key = uranks * span + base
        tkey = key[~is_p]
        ttyp = g["event_type"].to_numpy()[~is_p]
        pkey = key[is_p]
        lo = np.searchsorted(tkey, pkey - hour_us, side="right")
        hi = np.searchsorted(tkey, pkey, side="right")
        n = hi - lo
        has = n > 0
        if not has.any():
            return _empty()
        reps = n[has]
        offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
        pos = np.arange(reps.sum()) - np.repeat(offs, reps)
        flat = np.repeat(lo[has], reps) + pos
        kk = np.repeat(reps, reps).astype(np.float64)
        uc = np.where(kk == 1, 1.0,
                      np.where(kk == 2, 0.5,
                               np.where((pos == 0) | (pos == kk - 1),
                                        0.4, 0.2 / np.maximum(
                                            kk - 2, 1))))
        delta = (np.repeat(pkey[has], reps) - tkey[flat]) \
            .astype(np.float64)
        w = 2.0 ** (-(delta / 1_800_000_000.0))
        wsum = np.add.reduceat(w, offs)
        dc = w / np.repeat(wsum, reps)
        part = pd.DataFrame({"tt": ttyp[flat],
                             "touches": np.int64(1),
                             "uc": uc, "dc": dc})
        return part.groupby("tt", as_index=False).sum() \
            .astype({"touches": np.int64})

    parts = (ds.map_batches(keep_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(credit,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["tt"],
                      {"touches": ("touches", "sum"),
                       "uc": ("uc", "sum"),
                       "dc": ("dc", "sum")}).to_pandas() \
        .sort_values("tt", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "touch_type": out["tt"],
        "touches": out["touches"].astype(np.int64),
        "u_shaped_credit": rha(out["uc"].to_numpy(np.float64), 4),
        "time_decay_credit": rha(out["dc"].to_numpy(np.float64), 4)})


@register("conversion_path_length_hist", sql="""
WITH t AS (SELECT user_id, ts AS vts, event_id AS vid FROM events
           WHERE event_type IN ('view', 'click')),
p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'),
n AS (SELECT p.pid,
             CAST(COUNT(t.vid) AS BIGINT) AS k
      FROM p LEFT JOIN t ON p.user_id = t.user_id
           AND t.vts <= p.pts
           AND t.vts > p.pts - INTERVAL 1 HOUR
      GROUP BY 1),
b AS (SELECT CASE WHEN k >= 5 THEN 5 ELSE k END AS path_len,
             pid
      FROM n)
SELECT CAST(path_len AS BIGINT) AS path_len,
       CAST(COUNT(*) AS BIGINT) AS purchases
FROM b GROUP BY 1 ORDER BY 1""")
def conversion_path_length_hist(sf_dir: str) -> pd.DataFrame:
    """Conversion path length histogram: touches (views + clicks) in
    each purchase's 1-hour window, banded 0..4 and 5+. The
    attribution models DIVIDE credit; this shows what there is to
    divide — path_len = 0 is the direct/dark-traffic share no
    touch model can explain (the ceiling on any attribution
    analysis), 1 means single-touch (all five models agree there),
    and a fat 5+ band is where model choice actually moves budget.
    Same window/tie conventions as the attribution queries; counts
    come off one searchsorted per user-hash bucket as exact
    integers, zero-touch purchases included via the left join."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(
            ("purchase", "view", "click"))].copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    hour_us = np.int64(3_600_000_000)

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        is_p = (g["event_type"] == "purchase").to_numpy()
        if not is_p.any():
            return pd.DataFrame({
                "path_len": pd.Series([], dtype=np.int64),
                "purchases": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        is_p = (g["event_type"] == "purchase").to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        key = uranks * span + base
        tkey = key[~is_p]
        pkey = key[is_p]
        lo = np.searchsorted(tkey, pkey - hour_us, side="right")
        hi = np.searchsorted(tkey, pkey, side="right")
        k = np.minimum(hi - lo, 5)
        u, c = np.unique(k, return_counts=True)
        return pd.DataFrame({"path_len": u.astype(np.int64),
                             "purchases": c.astype(np.int64)})

    parts = (ds.map_batches(keep_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(hist,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["path_len"],
                      {"purchases": ("purchases", "sum")}).to_pandas()
    return out.sort_values("path_len", ignore_index=True) \
        .astype({"path_len": np.int64, "purchases": np.int64})


@register("stl_strengths_daily", sql="""
WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS BIGINT)
                          AS d,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(d * d) AS HUGEINT) AS sxx,
             CAST(SUM(d * y) AS HUGEINT) AS sxy
      FROM daily),
f AS (SELECT d, y,
             CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
             / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                 * CAST(d AS DOUBLE)
             + (CAST(s.sy AS DOUBLE)
                - CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
                  / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                  * s.sx) / s.n AS fit
      FROM daily CROSS JOIN s),
sea AS (SELECT (d + 4) % 7 AS dow, AVG(y - fit) AS seasonal
        FROM f GROUP BY 1),
comp AS (SELECT f.y - f.fit - sea.seasonal AS r,
                f.y - sea.seasonal AS desea,
                f.y - f.fit AS detr
         FROM f JOIN sea ON (f.d + 4) % 7 = sea.dow),
v AS (SELECT AVG(r * r) - AVG(r) * AVG(r) AS vr,
             AVG(desea * desea) - AVG(desea) * AVG(desea) AS vds,
             AVG(detr * detr) - AVG(detr) * AVG(detr) AS vdt,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM comp)
SELECT n AS n_days,
       ROUND(GREATEST(0.0, 1.0 - vr / vds), 6) AS trend_strength,
       ROUND(GREATEST(0.0, 1.0 - vr / vdt), 6) AS seasonal_strength,
       ROUND(vr, 6) AS resid_var
FROM v""")
def stl_strengths_daily(sf_dir: str) -> pd.DataFrame:
    """Hyndman's trend and seasonal STRENGTH summary of the daily
    decomposition: F_T = max(0, 1 − Var(R)/Var(deseasonalized)),
    F_S = max(0, 1 − Var(R)/Var(detrended)). The
    daily_seasonal_decompose query emits the full component table;
    these two numbers are the triage that decides what to DO with
    it — F_S ≫ F_T says schedule around the weekly rhythm (dow-aware
    autoscaling), F_T ≫ F_S says provision for growth, both small
    says the series is noise and any seasonal-aware machinery is
    wasted complexity. Exactly the classification robustness
    monitors (tsfeatures) run fleet-wide to route series to
    forecasting models. Same trend/seasonal conventions as the
    decompose query (OLS on epoch days, additive dow means of the
    detrended series, (d+4)%7 weekday arithmetic); variances are
    population moments over the calendar-bounded component table."""
    epoch_2024 = 19723

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
    _ = epoch_2024
    d = daily["d"].to_numpy(np.int64).astype(object)
    yv = daily["y"].to_numpy(np.int64).astype(object)
    n = len(daily)
    sx, sy = int(d.sum()), int(yv.sum())
    sxx, sxy = int((d * d).sum()), int((d * yv).sum())
    df = daily["d"].to_numpy(np.float64)
    yf = daily["y"].to_numpy(np.float64)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    fit = slope * df + (float(sy) - slope * sx) / n
    dow = (daily["d"].to_numpy(np.int64) + 4) % 7
    det = yf - fit
    sea = pd.DataFrame({"dow": dow, "det": det}) \
        .groupby("dow")["det"].mean()
    seasonal = sea.reindex(dow).to_numpy(np.float64)
    r = yf - fit - seasonal
    desea = yf - seasonal
    detr = yf - fit
    vr = (r * r).mean() - r.mean() * r.mean()
    vds = (desea * desea).mean() - desea.mean() * desea.mean()
    vdt = (detr * detr).mean() - detr.mean() * detr.mean()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "trend_strength": [float(rha(max(0.0, 1.0 - vr / vds), 6))],
        "seasonal_strength": [float(rha(max(0.0, 1.0 - vr / vdt),
                                        6))],
        "resid_var": [float(rha(vr, 6))]})


@register("dow_profile_stability", sql=f"""
WITH {_DAILY_SQL},
hh AS (SELECT (SELECT MAX(n) FROM x) AS n),
hv AS (SELECT CASE WHEN 2 * t <= (SELECT n FROM hh) THEN 0 ELSE 1 END
                   AS half,
              (t - 1) % 7 AS slot, y
       FROM x),
m AS (SELECT slot,
             CAST(SUM(CASE WHEN half = 0 THEN y ELSE 0 END)
                  AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN half = 1 THEN y ELSE 0 END)
                  AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM hv GROUP BY 1),
mm AS (SELECT slot, CAST(s1 AS DOUBLE) / c1 AS m1,
              CAST(s2 AS DOUBLE) / c2 AS m2
       FROM m WHERE c1 > 0 AND c2 > 0),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
               SUM(m1) AS a1, SUM(m2) AS a2,
               SUM(m1 * m1) AS q1, SUM(m2 * m2) AS q2,
               SUM(m1 * m2) AS q12
        FROM mm)
SELECT k AS n_slots,
       ROUND(CASE WHEN (k * q1 - a1 * a1) > 0
                   AND (k * q2 - a2 * a2) > 0
                  THEN (k * q12 - a1 * a2)
                       / SQRT((k * q1 - a1 * a1)
                              * (k * q2 - a2 * a2))
                  ELSE 0 END, 6) AS profile_corr
FROM agg""")
def dow_profile_stability(sf_dir: str) -> pd.DataFrame:
    """Stability of the weekly profile itself: Pearson correlation
    between the first-half and second-half mean counts per
    within-week slot ((t−1) mod 7 on the observed-day index — pure
    arithmetic both engines). The seasonal-strength number assumes
    ONE fixed weekly shape; this is the check — a profile that
    correlates near 1 across halves is a stable rhythm worth
    encoding in autoscaling schedules, while low correlation means
    the "seasonality" the decomposition extracted is actually
    regime drift (e.g. the weekend dip appeared mid-window) and
    dow-keyed plans will misfire. Per-slot sums/counts are exact
    integers; the 7-point correlation is a shared float expression;
    slots missing from either half drop identically."""
    y = _daily_counts(sf_dir)
    n = len(y)
    t = np.arange(1, n + 1)
    half = (2 * t > n).astype(np.int64)
    slot = (t - 1) % 7
    m1 = np.zeros(7, np.float64)
    m2 = np.zeros(7, np.float64)
    ok = np.zeros(7, bool)
    for s in range(7):
        a = y[(slot == s) & (half == 0)]
        b = y[(slot == s) & (half == 1)]
        if len(a) > 0 and len(b) > 0:
            ok[s] = True
            m1[s] = float(int(a.sum())) / len(a)
            m2[s] = float(int(b.sum())) / len(b)
    m1, m2 = m1[ok], m2[ok]
    k = int(ok.sum())
    a1, a2 = m1.sum(), m2.sum()
    q1, q2 = (m1 * m1).sum(), (m2 * m2).sum()
    q12 = (m1 * m2).sum()
    vx, vy = k * q1 - a1 * a1, k * q2 - a2 * a2
    r = (k * q12 - a1 * a2) / np.sqrt(vx * vy) \
        if vx > 0 and vy > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_slots": np.array([k], np.int64),
        "profile_corr": [float(rha(r, 6))]})


@register("hoeffding_d_views_purchases", sql=f"""
WITH {_VCP_SQL},
g2 AS (SELECT t, v AS x, p AS y FROM g),
rk AS (SELECT t, x, y,
              2 * RANK() OVER (ORDER BY x) - 1
              + COUNT(*) OVER (PARTITION BY x) AS r2,
              2 * RANK() OVER (ORDER BY y) - 1
              + COUNT(*) OVER (PARTITION BY y) AS s2
       FROM g2),
q AS (SELECT a.t, MAX(a.r2) AS r2, MAX(a.s2) AS s2,
             CAST(SUM(CASE WHEN b.x < a.x AND b.y < a.y THEN 4
                           WHEN b.x = a.x AND b.y = a.y THEN 1
                           WHEN (b.x = a.x AND b.y < a.y)
                             OR (b.x < a.x AND b.y = a.y) THEN 2
                           ELSE 0 END) AS BIGINT) AS q4
      FROM rk a JOIN rk b ON b.t <> a.t
      GROUP BY a.t, a.x, a.y),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(q4 - 4 AS HUGEINT) * (q4 - 8))
                  AS HUGEINT) AS d1x,
             CAST(SUM(CAST(r2 - 2 AS HUGEINT) * (r2 - 4)
                      * (s2 - 2) * (s2 - 4)) AS HUGEINT) AS d2x,
             CAST(SUM(CAST(r2 - 4 AS HUGEINT) * (s2 - 4)
                      * (q4 - 4)) AS HUGEINT) AS d3x
      FROM q)
SELECT n AS n_days,
       ROUND(30.0 * (CAST((n - 2) AS DOUBLE) * (n - 3)
                         * CAST(d1x AS DOUBLE)
                     + CAST(d2x AS DOUBLE)
                     - 2.0 * (n - 2) * CAST(d3x AS DOUBLE))
             / (16.0 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)),
             6) AS hoeffding_d
FROM s""")
def hoeffding_d_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Hoeffding's D between daily views and purchases — the 1948
    omnibus independence test, consistent against EVERY dependence
    alternative with continuous margins (Pearson needs linear,
    Spearman monotone, and even distance correlation can be
    weak on oscillating relationships). D > 0 flags dependence of
    any shape; near 0 supports independence. The bivariate
    concordance counts Q quarter-weight ties (4/2/1 integer
    weights, j ≠ i), midranks double to integers, so the three
    Hollander–Wolfe sums D1, D2, D3 are exact 128-bit integers at a
    common ×16 scale and D is ONE shared float expression. The
    O(n²) pair pass lives on the calendar-bounded daily grid —
    driver-side postage stamp at any event volume."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "x": (et == "view").astype(np.int64),
            "y": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    x = c["x"].to_numpy(np.int64)
    y = c["y"].to_numpy(np.int64)
    n = len(c)
    r2 = np.array([2 * int((x < v).sum()) + 1 + int((x == v).sum())
                   for v in x], dtype=object)
    s2 = np.array([2 * int((y < v).sum()) + 1 + int((y == v).sum())
                   for v in y], dtype=object)
    q4 = np.empty(n, dtype=object)
    for i in range(n):
        lt = (x < x[i]) & (y < y[i])
        eq = (x == x[i]) & (y == y[i])
        half = ((x == x[i]) & (y < y[i])) | ((x < x[i]) & (y == y[i]))
        q4[i] = 4 * int(lt.sum()) + (int(eq.sum()) - 1) \
            + 2 * int(half.sum())
    d1x = int(((q4 - 4) * (q4 - 8)).sum())
    d2x = int(((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)).sum())
    d3x = int(((r2 - 4) * (s2 - 4) * (q4 - 4)).sum())
    d = 30.0 * (float((n - 2)) * (n - 3) * float(d1x) + float(d2x)
                - 2.0 * (n - 2) * float(d3x)) \
        / (16.0 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "hoeffding_d": [float(rha(d, 6))]})


@register("chatterjee_xi_views_purchases", sql=f"""
WITH {_VCP_SQL},
g2 AS (SELECT t, v AS x, p AS y FROM g),
o AS (SELECT y, ROW_NUMBER() OVER (ORDER BY x, t) AS i,
             COUNT(*) OVER (ORDER BY y) AS r,
             COUNT(*) OVER (ORDER BY y DESC) AS l,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM g2),
d AS (SELECT n, r, l, LEAD(r) OVER (ORDER BY i) AS r1 FROM o),
s AS (SELECT MAX(n) AS n,
             CAST(SUM(CASE WHEN r1 IS NOT NULL
                           THEN ABS(r1 - r) ELSE 0 END) AS HUGEINT)
                 AS num,
             CAST(SUM(CAST(l AS HUGEINT) * (n - l))
                  AS HUGEINT) AS den2
      FROM d)
SELECT n AS n_days,
       ROUND(1.0 - CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
                   / (2.0 * CAST(den2 AS DOUBLE)), 6)
           AS xi
FROM s""")
def chatterjee_xi_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Chatterjee's ξ (2020) of daily purchases AGAINST views — the
    modern rank correlation that converges to 0 iff independent and
    to 1 iff purchases are a measurable FUNCTION of views, monotone
    or not. Unlike every symmetric coefficient in the registry
    (Pearson, Spearman, dCor, Hoeffding), ξ is deliberately
    asymmetric — it measures "does knowing views determine
    purchases", the direction a forecaster actually cares about —
    and it needs no kernel, no bandwidth, no O(n²) pass: sort by x,
    walk the y-ranks. Tie conventions exact on both engines: x-ties
    order by date (documented, replacing the paper's random
    tiebreak with a deterministic one), r = #{{y_j ≤ y_i}},
    l = #{{y_j ≥ y_i}} via rank windows, and
    ξ = 1 − n·Σ|r_{{i+1}}−r_i| / (2Σl(n−l)) is an exact integer
    ratio with one shared float division."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "x": (et == "view").astype(np.int64),
            "y": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    c = c.reset_index().rename(columns={"index": "t"})
    c = c.sort_values(["x", "t"], kind="mergesort",
                      ignore_index=True)
    y = c["y"].to_numpy(np.int64)
    n = len(y)
    r = np.array([int((y <= v).sum()) for v in y], dtype=object)
    lv = np.array([int((y >= v).sum()) for v in y], dtype=object)
    num = int(np.abs(r[1:] - r[:-1]).sum())
    den2 = int((lv * (n - lv)).sum())
    xi = 1.0 - float(n) * float(num) / (2.0 * float(den2))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "xi": [float(rha(xi, 6))]})


@register("dagostino_k2_value_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM v GROUP BY 1, 2),
mom AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * c) AS BIGINT) AS s1,
               CAST(SUM(cnt * c * c) AS HUGEINT) AS s2,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c)
                    AS HUGEINT) AS s3,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c * c)
                    AS HUGEINT) AS s4
        FROM hh GROUP BY g),
st AS (SELECT g, n,
              CAST(s1 AS DOUBLE) / n AS m1,
              CAST(s2 AS DOUBLE) / n AS r2,
              CAST(s3 AS DOUBLE) / n AS r3,
              CAST(s4 AS DOUBLE) / n AS r4
       FROM mom),
cm AS (SELECT g, n,
              r2 - m1 * m1 AS m2,
              r3 - 3 * r2 * m1 + 2 * m1 * m1 * m1 AS m3,
              r4 - 4 * r3 * m1 + 6 * r2 * m1 * m1
                 - 3 * m1 * m1 * m1 * m1 AS m4
       FROM st),
gg AS (SELECT g, n,
              m3 / sqrt(m2 * m2 * m2) AS g1,
              m4 / (m2 * m2) AS b2k
       FROM cm WHERE m2 > 0),
z1c AS (SELECT g, n, g1, b2k,
               g1 * SQRT((n + 1.0) * (n + 3) / (6.0 * (n - 2)))
                   AS yy,
               -1.0 + SQRT(2.0 * (3.0 * (CAST(n AS DOUBLE) * n
                                         + 27 * n - 70)
                                  * (n + 1) * (n + 3)
                                  / ((n - 2.0) * (n + 5) * (n + 7)
                                     * (n + 9)) - 1.0)) AS w2
        FROM gg),
z1 AS (SELECT g, n,
              (1.0 / SQRT(0.5 * LN(w2)))
              * LN(yy / SQRT(2.0 / (w2 - 1.0))
                   + SQRT((yy / SQRT(2.0 / (w2 - 1.0)))
                          * (yy / SQRT(2.0 / (w2 - 1.0))) + 1.0))
                  AS z1
       FROM z1c),
z2c AS (SELECT g, n, z1,
               (b2k - 3.0 * (n - 1) / (n + 1))
               / SQRT(24.0 * n * (n - 2) * (n - 3)
                      / ((n + 1.0) * (n + 1) * (n + 3) * (n + 5)))
                   AS xx,
               6.0 + 8.0 / (6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2)
                            / ((n + 7.0) * (n + 9))
                            * SQRT(6.0 * (n + 3) * (n + 5)
                                   / (n * (n - 2.0) * (n - 3))))
                   * (2.0 / (6.0 * (CAST(n AS DOUBLE) * n - 5 * n
                                    + 2)
                             / ((n + 7.0) * (n + 9))
                             * SQRT(6.0 * (n + 3) * (n + 5)
                                    / (n * (n - 2.0) * (n - 3))))
                      + SQRT(1.0 + 4.0
                             / ((6.0 * (CAST(n AS DOUBLE) * n
                                        - 5 * n + 2)
                                 / ((n + 7.0) * (n + 9))
                                 * SQRT(6.0 * (n + 3) * (n + 5)
                                        / (n * (n - 2.0)
                                           * (n - 3))))
                                * (6.0 * (CAST(n AS DOUBLE) * n
                                          - 5 * n + 2)
                                   / ((n + 7.0) * (n + 9))
                                   * SQRT(6.0 * (n + 3) * (n + 5)
                                          / (n * (n - 2.0)
                                             * (n - 3)))))))
                   AS a
        FROM z1c JOIN z1 USING (g, n)),
z2 AS (SELECT g, n, z1,
              ((1.0 - 2.0 / (9.0 * a))
               - CBRT((1.0 - 2.0 / a)
                      / (1.0 + xx * SQRT(2.0 / (a - 4.0)))))
              / SQRT(2.0 / (9.0 * a)) AS z2
       FROM z2c)
SELECT g AS event_type, n,
       ROUND(z1, 6) AS z_skew,
       ROUND(z2, 6) AS z_kurt,
       ROUND(z1 * z1 + z2 * z2, 6) AS k2_stat,
       CAST(CASE WHEN z1 * z1 + z2 * z2 > 5.991465
                 THEN 1 ELSE 0 END AS BIGINT) AS normal_rejected
FROM z2 ORDER BY 1""")
def dagostino_k2_value_by_type(sf_dir: str) -> pd.DataFrame:
    """D'Agostino–Pearson K² omnibus normality test per event type —
    the properly CALIBRATED version of the Jarque–Bera already in
    the registry: JB compares n·g²/6 to its asymptotic χ² and
    over-rejects badly below n ≈ 2000, while K² first pushes sample
    skewness through D'Agostino's 1970 Johnson-SU transform and
    sample kurtosis through Anscombe–Glynn's Wilson–Hilferty cube
    root, each to a bona fide standard normal AT THE OBSERVED n,
    then sums the squares. Reading the two side by side is itself
    the diagnostic: JB-rejects-K²-accepts is the finite-sample
    artifact zone. Power sums ride the same exact (type, cents)
    contingency as JB; the transform cascade is one deterministic
    shared float expression per type (cbrt on both engines handles
    the negative-base cube root identically)."""
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
    rha = textstats.round_half_away
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        s1 = sum(int(a) * int(b) for a, b in zip(cnt, c))
        s2 = sum(int(a) * int(b) ** 2 for a, b in zip(cnt, c))
        s3 = sum(int(a) * int(b) ** 3 for a, b in zip(cnt, c))
        s4 = sum(int(a) * int(b) ** 4 for a, b in zip(cnt, c))
        m1 = float(s1) / n
        r2, r3, r4 = float(s2) / n, float(s3) / n, float(s4) / n
        m2 = r2 - m1 * m1
        if m2 <= 0:
            continue
        m3 = r3 - 3 * r2 * m1 + 2 * m1 * m1 * m1
        m4 = r4 - 4 * r3 * m1 + 6 * r2 * m1 * m1 \
            - 3 * m1 * m1 * m1 * m1
        g1 = m3 / np.sqrt(m2 * m2 * m2)
        b2k = m4 / (m2 * m2)
        yy = g1 * np.sqrt((n + 1.0) * (n + 3) / (6.0 * (n - 2)))
        w2 = -1.0 + np.sqrt(
            2.0 * (3.0 * (float(n) * n + 27 * n - 70)
                   * (n + 1) * (n + 3)
                   / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
                   - 1.0))
        alpha = np.sqrt(2.0 / (w2 - 1.0))
        z1 = (1.0 / np.sqrt(0.5 * np.log(w2))) \
            * np.log(yy / alpha
                     + np.sqrt((yy / alpha) * (yy / alpha) + 1.0))
        xx = (b2k - 3.0 * (n - 1) / (n + 1)) \
            / np.sqrt(24.0 * n * (n - 2) * (n - 3)
                      / ((n + 1.0) * (n + 1) * (n + 3) * (n + 5)))
        beta1 = 6.0 * (float(n) * n - 5 * n + 2) \
            / ((n + 7.0) * (n + 9)) \
            * np.sqrt(6.0 * (n + 3) * (n + 5)
                      / (n * (n - 2.0) * (n - 3)))
        a = 6.0 + 8.0 / beta1 * (2.0 / beta1
                                 + np.sqrt(1.0 + 4.0
                                           / (beta1 * beta1)))
        z2 = ((1.0 - 2.0 / (9.0 * a))
              - np.cbrt((1.0 - 2.0 / a)
                        / (1.0 + xx * np.sqrt(2.0 / (a - 4.0))))) \
            / np.sqrt(2.0 / (9.0 * a))
        k2 = z1 * z1 + z2 * z2
        rows.append((g, n, float(rha(z1, 6)), float(rha(z2, 6)),
                     float(rha(k2, 6)),
                     1 if k2 > 5.991465 else 0))
    return pd.DataFrame(rows, columns=[
        "event_type", "n", "z_skew", "z_kurt", "k2_stat",
        "normal_rejected"]).astype(
        {"n": np.int64, "normal_rejected": np.int64})


@register("geary_ratio_value_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM v GROUP BY 1, 2),
mom AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * c) AS BIGINT) AS s1,
               CAST(SUM(cnt * c * c) AS HUGEINT) AS s2
        FROM hh GROUP BY g),
md AS (SELECT hh.g,
              CAST(SUM(CAST(hh.cnt AS HUGEINT)
                       * ABS(mom.n * hh.c - mom.s1)) AS HUGEINT)
                  AS adev
       FROM hh JOIN mom ON hh.g = mom.g GROUP BY 1),
f AS (SELECT mom.g, mom.n,
             CAST(md.adev AS DOUBLE)
             / (CAST(mom.n AS DOUBLE)
                * SQRT(CAST(mom.n * mom.s2
                            - CAST(mom.s1 AS HUGEINT) * mom.s1
                            AS DOUBLE))) AS a
      FROM mom JOIN md ON mom.g = md.g)
SELECT g AS event_type, n,
       ROUND(a, 6) AS geary_a,
       ROUND((a - SQRT(2.0 / PI())) * SQRT(CAST(n AS DOUBLE))
             / 0.2661, 6) AS z,
       CAST(CASE WHEN ABS((a - SQRT(2.0 / PI()))
                          * SQRT(CAST(n AS DOUBLE)) / 0.2661)
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS normal_rejected
FROM f ORDER BY 1""")
def geary_ratio_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Geary's ratio test of normality per event type: a = (mean
    absolute deviation)/(population sd), E[a] = √(2/π) ≈ 0.7979
    under normality, z = (a − √(2/π))·√n/0.2661. The
    moment-family tests (JB, K²) lean on 3rd/4th powers that a
    handful of extreme cents dominate; Geary's a uses FIRST
    absolute moments, so it detects the common heavy-tail
    departure (a < 0.7979) with far better small-sample stability —
    the classical pairing is exactly K² + Geary, agreeing = settled.
    Exactness: Σc·|n·v − S| clears the fractional mean, so the mean
    absolute deviation has an exact 128-bit integer numerator off
    the same (type, cents) contingency, and a = A/(n√(nS₂−S₁²)) is
    one shared float expression with √(2/π) spelled identically on
    both engines."""
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
    rha = textstats.round_half_away
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64).astype(object)
        c = grp["c"].to_numpy(np.int64).astype(object)
        n = int(cnt.sum())
        s1 = int((cnt * c).sum())
        s2 = int((cnt * c * c).sum())
        adev = int((cnt * np.abs(n * c - s1)).sum())
        a = float(adev) / (float(n)
                           * np.sqrt(float(n * s2 - s1 * s1)))
        z = (a - np.sqrt(2.0 / np.pi)) * np.sqrt(float(n)) / 0.2661
        rows.append((g, n, float(rha(a, 6)), float(rha(z, 6)),
                     1 if abs(z) > 1.959964 else 0))
    return pd.DataFrame(rows, columns=[
        "event_type", "n", "geary_a", "z", "normal_rejected"]) \
        .astype({"n": np.int64, "normal_rejected": np.int64})


@register("foster_stuart_records_daily", sql=f"""
WITH {_DAILY_SQL},
r AS (SELECT t, y,
             MAX(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING) AS pmax,
             MIN(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING) AS pmin
      FROM x),
s AS (SELECT CAST(SUM(CASE WHEN pmax IS NOT NULL AND y > pmax
                           THEN 1 ELSE 0 END) AS BIGINT) AS u,
             CAST(SUM(CASE WHEN pmin IS NOT NULL AND y < pmin
                           THEN 1 ELSE 0 END) AS BIGINT) AS l,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r),
h AS (SELECT SUM(2.0 / t) AS vard
      FROM x WHERE t >= 2)
SELECT n AS n_days, u AS upper_records, l AS lower_records,
       CAST(u - l AS BIGINT) AS d_stat,
       ROUND(CASE WHEN vard > 0
                  THEN CAST(u - l AS DOUBLE) / SQRT(vard)
                  ELSE 0 END, 6) AS z,
       CAST(CASE WHEN vard > 0
                  AND ABS(CAST(u - l AS DOUBLE) / SQRT(vard))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS trend_rejected
FROM s, h""")
def foster_stuart_records_daily(sf_dir: str) -> pd.DataFrame:
    """Foster–Stuart records test for trend in daily counts: count
    the days that set a new running MAX (upper records) and a new
    running MIN (lower records); under exchangeability
    E[U−L] = 0 with Var = Σ2/t, so z = (U−L)/√(Σ2/t). The
    records lens is what makes it distinct from the OLS/Theil–Sen/
    Cox–Stuart trend family: only EXTREME-setting days vote, so a
    trend expressed purely in the peaks (each launch day slightly
    out-records the last while the median day never moves — the
    capacity-relevant kind) is detected even when middle-of-
    distribution tests read flat, and record counts are invariant
    to any monotone transform of the counts. Record indicators are
    exact integers off strict running extrema (first day is no
    record, ties do NOT set records — documented convention both
    engines); the harmonic variance is one small shared float
    sum on the calendar-bounded grid."""
    y = _daily_counts(sf_dir)
    n = len(y)
    u = l = 0
    cmax, cmin = y[0], y[0]
    for v in y[1:]:
        if v > cmax:
            u += 1
            cmax = v
        if v < cmin:
            l += 1
            cmin = v
    vard = float(sum(2.0 / t for t in range(2, n + 1)))
    z = float(u - l) / np.sqrt(vard) if vard > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "upper_records": np.array([u], np.int64),
        "lower_records": np.array([l], np.int64),
        "d_stat": np.array([u - l], np.int64),
        "z": [float(rha(z, 6))],
        "trend_rejected": np.array(
            [1 if vard > 0 and abs(z) > 1.959964 else 0],
            np.int64)})


@register("spearman_acf1_daily", sql=f"""
WITH {_DAILY_SQL},
r AS (SELECT t,
             2 * RANK() OVER (ORDER BY y) - 1
             + COUNT(*) OVER (PARTITION BY y) AS r2
      FROM x),
p AS (SELECT r2 AS a, LEAD(r2) OVER (ORDER BY t) AS b FROM r),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(a) AS BIGINT) AS sx,
             CAST(SUM(b) AS BIGINT) AS sy,
             CAST(SUM(CAST(a AS HUGEINT) * a) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(b AS HUGEINT) * b) AS HUGEINT) AS syy,
             CAST(SUM(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sxy
      FROM p WHERE b IS NOT NULL)
SELECT m AS n_pairs,
       ROUND(CASE WHEN (m * sxx - CAST(sx AS HUGEINT) * sx) > 0
                   AND (m * syy - CAST(sy AS HUGEINT) * sy) > 0
                  THEN CAST(m * sxy - CAST(sx AS HUGEINT) * sy
                            AS DOUBLE)
                       / SQRT(CAST(m * sxx
                                   - CAST(sx AS HUGEINT) * sx
                                   AS DOUBLE)
                              * CAST(m * syy
                                     - CAST(sy AS HUGEINT) * sy
                                     AS DOUBLE))
                  ELSE 0 END, 6) AS rho1,
       CAST(CASE WHEN (m * sxx - CAST(sx AS HUGEINT) * sx) > 0
                  AND (m * syy - CAST(sy AS HUGEINT) * sy) > 0
                  AND ABS(CAST(m * sxy - CAST(sx AS HUGEINT) * sy
                               AS DOUBLE)
                          / SQRT(CAST(m * sxx
                                      - CAST(sx AS HUGEINT) * sx
                                      AS DOUBLE)
                                 * CAST(m * syy
                                        - CAST(sy AS HUGEINT) * sy
                                        AS DOUBLE)))
                      * SQRT(CAST(m AS DOUBLE) - 1) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS momentum_rejected
FROM s""")
def spearman_acf1_daily(sf_dir: str) -> pd.DataFrame:
    """Rank (Spearman) lag-1 autocorrelation of daily counts:
    Pearson over consecutive pairs of GLOBAL midranks, flagged via
    the √(m−1)·|ρ| normal approximation. The robust cousin of the
    moment ACF already in the registry — one launch-day spike
    inflates/deflates the Pearson ACF quadratically but moves each
    rank by at most its ordinal step, so ρ_rank ≫ ρ_moment says the
    TYPICAL day carries momentum (smoothing/forecasting will pay
    off) while ρ_moment ≫ ρ_rank says the apparent persistence is a
    few heavy days (handle the outliers instead). Midranks double
    to exact integers, consecutive pairs come off one LEAD, and the
    correlation is the standard exact-moments expression over
    128-bit sums; degenerate constant series short-circuit to 0."""
    y = _daily_counts(sf_dir)
    n = len(y)
    r2 = np.array([2 * int((y < v).sum()) + 1 + int((y == v).sum())
                   for v in y], dtype=object)
    a, b = r2[:-1], r2[1:]
    m = n - 1
    sx, sy = int(a.sum()), int(b.sum())
    sxx, syy = int((a * a).sum()), int((b * b).sum())
    sxy = int((a * b).sum())
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    if vx > 0 and vy > 0:
        rho = float(m * sxy - sx * sy) / np.sqrt(float(vx)
                                                 * float(vy))
        rej = 1 if abs(rho) * np.sqrt(float(m) - 1) > 1.959964 else 0
    else:
        rho, rej = 0.0, 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([m], np.int64),
        "rho1": [float(rha(rho, 6))],
        "momentum_rejected": np.array([rej], np.int64)})


_USER_CENTS_SQL = """
u AS (SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS v
      FROM events GROUP BY 1)"""


@register("lorenz_asymmetry_user_value", sql=f"""
WITH {_USER_CENTS_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS tot
      FROM u),
cl AS (SELECT s.n, s.tot,
              CAST(SUM(CASE WHEN s.n * u.v < s.tot
                            THEN 1 ELSE 0 END) AS BIGINT) AS m,
              CAST(SUM(CASE WHEN s.n * u.v = s.tot
                            THEN 1 ELSE 0 END) AS BIGINT) AS e,
              CAST(SUM(CASE WHEN s.n * u.v < s.tot
                            THEN u.v ELSE 0 END) AS HUGEINT) AS lm,
              CAST(SUM(CASE WHEN s.n * u.v = s.tot
                            THEN u.v ELSE 0 END) AS HUGEINT) AS le
       FROM u CROSS JOIN s GROUP BY 1, 2)
SELECT n AS n_users,
       ROUND((m + 0.5 * e) / CAST(n AS DOUBLE), 6) AS f_mu,
       ROUND((CAST(lm AS DOUBLE) + 0.5 * CAST(le AS DOUBLE))
             / tot, 6) AS l_mu,
       ROUND((m + 0.5 * e) / CAST(n AS DOUBLE)
             + (CAST(lm AS DOUBLE) + 0.5 * CAST(le AS DOUBLE))
               / tot, 6) AS lac,
       CAST(CASE WHEN (m + 0.5 * e) / CAST(n AS DOUBLE)
                      + (CAST(lm AS DOUBLE)
                         + 0.5 * CAST(le AS DOUBLE)) / tot > 1.0
                 THEN 1 ELSE 0 END AS BIGINT) AS giant_driven
FROM cl""")
def lorenz_asymmetry_user_value(sf_dir: str) -> pd.DataFrame:
    """Lorenz asymmetry coefficient of user lifetime value:
    S = F(μ) + L(μ), the point where the Lorenz curve runs parallel
    to the equality diagonal. Gini says HOW MUCH revenue
    concentration there is; LAC says WHO causes it — S > 1 means
    the inequality is driven by a few GIANT accounts (key-account
    risk: churn of one whale moves revenue) while S < 1 means it's
    driven by many near-zero users (activation problem: the long
    tail never converts). Two populations with identical Gini
    routinely sit on opposite sides of 1, so this is the missing
    half of every inequality readout already in the registry
    (gini/palma/hoover/theil/atkinson). Mean comparisons clear the
    fraction via n·v vs ΣV (exact integers); users exactly AT the
    mean count half to both F and L (documented convention both
    engines)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "v": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"v": ("v", "sum")}).to_pandas()
    v = u["v"].to_numpy(np.int64).astype(object)
    n = len(v)
    tot = int(v.sum())
    below = n * v < tot
    equal = n * v == tot
    m, e = int(below.sum()), int(equal.sum())
    lm, le = int(v[below].sum()), int(v[equal].sum())
    f_mu = (m + 0.5 * e) / float(n)
    l_mu = (float(lm) + 0.5 * float(le)) / tot
    lac = f_mu + l_mu
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "f_mu": [float(rha(f_mu, 6))],
        "l_mu": [float(rha(l_mu, 6))],
        "lac": [float(rha(lac, 6))],
        "giant_driven": np.array([1 if lac > 1.0 else 0],
                                 np.int64)})


@register("effective_users_concentration", sql=f"""
WITH {_USER_CENTS_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS HUGEINT) AS tot,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sq,
             CAST(MAX(v) AS BIGINT) AS mx
      FROM u)
SELECT n AS n_users,
       ROUND(CAST(tot * tot AS DOUBLE) / CAST(sq AS DOUBLE), 6)
           AS effective_users,
       ROUND(CAST(tot * tot AS DOUBLE) / CAST(sq AS DOUBLE)
             / CAST(n AS DOUBLE), 6) AS effective_share,
       ROUND(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           AS berger_parker_share
FROM s""")
def effective_users_concentration(sf_dir: str) -> pd.DataFrame:
    """Effective number of revenue-bearing users — the Hill-number
    (inverse-Simpson) view of concentration: N_eff = (ΣV)²/ΣV² is
    how many EQUAL-sized accounts would produce the same
    concentration, the single most communicable concentration
    number ('we have 40k users but effectively 900 customers').
    effective_share = N_eff/n is the diversity ratio, and the
    Berger–Parker share (largest single account / total) bounds the
    worst-case single-churn revenue hit. The same quantity
    1/Σshare² that HHI inverts, but at USER grain where the HHI
    query works at source grain — and unlike Gini it composes:
    N_eff is additive-safe under partitioning. Three exact 128-bit
    integers off one per-user reduce; ratios are the only floats."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "v": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"v": ("v", "sum")}).to_pandas()
    v = u["v"].to_numpy(np.int64).astype(object)
    n = len(v)
    tot = int(v.sum())
    sq = int((v * v).sum())
    mx = int(v.max())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "effective_users": [float(rha(float(tot * tot)
                                      / float(sq), 6))],
        "effective_share": [float(rha(float(tot * tot) / float(sq)
                                      / float(n), 6))],
        "berger_parker_share": [float(rha(float(mx) / float(tot),
                                          6))]})


@register("monthly_wip_littles_law", sql="""
WITH j AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(o.o_orderdate AS DATE))
                       AS BIGINT) AS od,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(l.l_shipdate AS DATE))
                       AS BIGINT) AS sd
           FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
bounds AS (SELECT MIN(od) AS lo, MAX(sd) AS hi FROM j),
months AS (SELECT strftime(m, '%Y-%m') AS month,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(m AS DATE)) AS BIGINT) AS ms,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(m + INTERVAL 1 MONTH AS DATE))
                       AS BIGINT) AS me
           FROM (SELECT UNNEST(generate_series(
                     date_trunc('month', DATE '1970-01-01'
                         + (SELECT CAST(lo AS INTEGER)
                            FROM bounds)),
                     date_trunc('month', DATE '1970-01-01'
                         + (SELECT CAST(hi AS INTEGER)
                            FROM bounds)),
                     INTERVAL 1 MONTH)) AS m)),
w AS (SELECT months.month, months.me - months.ms AS dim,
             CAST(COALESCE(SUM(GREATEST(0,
                 LEAST(j.sd, months.me)
                 - GREATEST(j.od, months.ms))), 0) AS BIGINT) AS wd
      FROM months LEFT JOIN j
           ON j.sd > months.ms AND j.od < months.me
      GROUP BY 1, 2)
SELECT month, wd AS wip_line_days,
       CAST(dim AS BIGINT) AS days_in_month,
       ROUND(CAST(wd AS DOUBLE) / dim, 6) AS avg_in_flight
FROM w ORDER BY 1""")
def monthly_wip_littles_law(sf_dir: str) -> pd.DataFrame:
    """Monthly work-in-progress: the average number of lineitems
    IN FLIGHT (ordered, not yet shipped) each calendar month,
    computed exactly as Σ per-lineitem day-overlap with the month
    over days-in-month — the Little's-law L that pairs with the
    lag quantiles (W) and order counts (λ) already in the registry.
    Lag statistics say each item waits ~3 months; WIP says how much
    INVENTORY/CAPACITY that queue ties up at once and how it
    trends — the number a warehouse sizes against. Per-lineitem
    intervals [orderdate, shipdate) are exact epoch-day integers,
    overlap is GREATEST/LEAST integer arithmetic (same-day
    order+ship contributes 0, documented), the month grid spans
    min order → max ship month, and only (month, line-day)
    partials reach the reduce — the interval table never
    materializes anywhere."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def days(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "od": df["o_orderdate"].to_numpy("datetime64[D]")
            .astype(np.int64),
            "sd": df["l_shipdate"].to_numpy("datetime64[D]")
            .astype(np.int64)})

    jd = j.map_batches(days, batch_format="pandas")
    b = reduce_sink(jd.map_batches(
        lambda df: pd.DataFrame({"k": [0],
                                 "lo": [df["od"].min()],
                                 "hi": [df["sd"].max()]}),
        batch_format="pandas"),
        ["k"], {"lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas()
    lo, hi = int(b["lo"].iloc[0]), int(b["hi"].iloc[0])
    m0 = np.datetime64(np.datetime64(lo, "D"), "M")
    m1 = np.datetime64(np.datetime64(hi, "D"), "M")
    mg = np.arange(m0, m1 + 1)
    ms = mg.astype("datetime64[D]").astype(np.int64)
    me = (mg + 1).astype("datetime64[D]").astype(np.int64)
    labels = [str(m) for m in mg]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        od = df["od"].to_numpy(np.int64)
        sd = df["sd"].to_numpy(np.int64)
        out = []
        for i in range(len(ms)):   # month grid is calendar-bounded
            ov = np.minimum(sd, me[i]) - np.maximum(od, ms[i])
            w = int(np.maximum(ov, 0).sum())
            if w:
                out.append((labels[i], w))
        return pd.DataFrame(out, columns=["month", "wd"]) \
            if out else pd.DataFrame({"month": pd.Series([],
                                                         dtype=str),
                                      "wd": pd.Series([],
                                                      dtype=np.int64)})

    w = reduce_sink(jd.map_batches(partial, batch_format="pandas"),
                    ["month"], {"wd": ("wd", "sum")}).to_pandas()
    out = pd.DataFrame({"month": labels,
                        "days_in_month": (me - ms).astype(np.int64)})
    out = out.merge(w, on="month", how="left").fillna(0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "month": out["month"],
        "wip_line_days": out["wd"].astype(np.int64),
        "days_in_month": out["days_in_month"],
        "avg_in_flight": rha(out["wd"].to_numpy(np.float64)
                             / out["days_in_month"]
                             .to_numpy(np.float64), 6)}) \
        .sort_values("month", ignore_index=True)
