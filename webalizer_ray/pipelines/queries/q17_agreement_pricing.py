"""Driver-contract queries (chunk 17/18).
Sections:
  - The kappa paradox on the two outlier rules' daily verdicts +
  - Workforce management: SIPP per-hour Erlang-C staffing + the
  - Group-sequential design: the O'Brien–Fleming vs Pocock boundary
  - Coupon collecting the event types: the inclusion-exclusion
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _events,
    np,
    pd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _SESS_SQL,
)
from webalizer_ray.pipelines.queries.q15_markov_aggregation import (  # noqa: F401
    _MC_SQL,
    _daily_counts_full,
    _daily_revenue_cents,
    _mc_stats,
    _wkd_type_mix,
)
from webalizer_ray.pipelines.queries.q16_forecast_verify import (  # noqa: F401
    _erlang_c,
    _fisher,
    _part_month_pq,
)



_PQPANEL_SQL = """
pm AS (SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m')
           AS mon,
              SUM(CAST(ROUND(l_extendedprice * 100, 0)
                       AS BIGINT)) AS c,
              SUM(CAST(l_quantity AS BIGINT)) AS q
       FROM lineitem GROUP BY 1, 2),
mi AS (SELECT mon, ROW_NUMBER() OVER (ORDER BY mon) - 1 AS i
       FROM (SELECT DISTINCT mon FROM pm)),
px AS (SELECT pm.pk, mi.i,
              CAST(ROUND(10000.0 * pm.c / pm.q, 0) AS BIGINT)
                  AS p,
              pm.q
       FROM pm JOIN mi USING (mon)),
mt AS (SELECT CAST(MAX(i) AS BIGINT) AS t FROM mi),
bf AS (SELECT a.i AS s, b.i AS t,
              SQRT((CAST(SUM(b.p * a.q) AS DOUBLE)
                    / SUM(a.p * a.q))
                   * (CAST(SUM(b.p * b.q) AS DOUBLE)
                      / SUM(a.p * b.q))) AS f
       FROM px a JOIN px b ON b.pk = a.pk
       GROUP BY 1, 2)"""


@register("chain_drift_fisher", sql=f"""
WITH {_PQPANEL_SQL},
ch AS (SELECT EXP(SUM(LN(f))) AS cf,
              CAST(COUNT(*) AS BIGINT) AS links
       FROM bf WHERE t = s + 1),
fx AS (SELECT f FROM bf, mt WHERE s = 0 AND bf.t = mt.t)
SELECT (SELECT CAST(t AS BIGINT) FROM mt) AS final_month_idx,
       ROUND((SELECT f FROM fx), 6) AS fixed_base_fisher,
       ROUND((SELECT cf FROM ch), 6) AS chained_fisher,
       ROUND((SELECT cf FROM ch) / (SELECT f FROM fx), 6)
           AS drift_ratio,
       (SELECT links FROM ch) AS n_links""")
def chain_drift_fisher(sf_dir: str) -> pd.DataFrame:
    """Chain drift, demonstrated on the Fisher index the registry
    already computes: the direct base→final matched-part Fisher
    beside the PRODUCT of month-over-month Fisher links. Fisher
    is 'ideal' (passes both reversal tests) yet still fails
    TRANSITIVITY — under price bouncing with quantity response
    (promotions: price dips, quantity surges, both revert) the
    chained index drifts systematically away from the direct
    one, because each link weights the dip by the surged
    quantities on the way down but the reverted ones on the way
    up. drift_ratio ≠ 1 is that failure measured on this data,
    and it is the reason scanner-data CPI programs abandoned
    simple chaining — a dashboard that chains week-over-week
    price relatives inherits exactly this bias. Matched parts
    per link (the panel's consecutive-month overlap); exact
    integer p·q cross-products; same 1e-4-cent quantization as
    the Laspeyres/Paasche/Fisher row."""
    pm = _part_month_pq(sf_dir)
    mt = int(pm["i"].max())
    fixed = _fisher(pm, 0, mt)
    chained = 1.0
    for i in range(1, mt + 1):
        chained *= _fisher(pm, i - 1, i)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "final_month_idx": np.array([mt], np.int64),
        "fixed_base_fisher": [float(rha(fixed, 6))],
        "chained_fisher": [float(rha(chained, 6))],
        "drift_ratio": [float(rha(chained / fixed, 6))],
        "n_links": np.array([mt], np.int64)})


@register("geks_price_index", sql=f"""
WITH {_PQPANEL_SQL},
gk AS (SELECT AVG(LN(a.f) + LN(b.f)) AS lg
       FROM mi k
       JOIN bf a ON a.s = 0 AND a.t = k.i
       JOIN bf b ON b.s = k.i AND b.t = (SELECT t FROM mt)),
fx AS (SELECT f FROM bf, mt WHERE s = 0 AND bf.t = mt.t),
ch AS (SELECT EXP(SUM(LN(f))) AS cf FROM bf WHERE t = s + 1)
SELECT ROUND(EXP((SELECT lg FROM gk)), 6) AS geks_index,
       ROUND((SELECT f FROM fx), 6) AS fixed_base_fisher,
       ROUND((SELECT cf FROM ch), 6) AS chained_fisher,
       ROUND(EXP((SELECT lg FROM gk))
             / (SELECT f FROM fx), 6) AS geks_over_fixed""")
def geks_price_index(sf_dir: str) -> pd.DataFrame:
    """The GEKS repair: the multilateral index that resolves the
    chain-drift row's dilemma by construction —
    GEKS(0,T) = exp(mean over bridge months k of
    ln F(0,k) + ln F(k,T)) — every month serves as the base
    once, so the result is TRANSITIVE (chaining GEKS indices
    reproduces the direct one identically), which is the
    property Fisher chaining lacks and the reason GEKS is the
    method scanner-data CPI programs actually adopted (with a
    rolling window, Ivancic–de Haan–Fox). Printing it between
    the fixed-base and chained Fishers shows where the
    principled compromise lands: it uses every month's data
    (like chaining) without the bounce bias (like the fixed
    base, but without privileging one arbitrary base month).
    Note F(k,k) = 1 contributes honestly to the mean. Same
    bilateral Fisher table; matched parts per pair."""
    pm = _part_month_pq(sf_dir)
    mt = int(pm["i"].max())
    lg = []
    for k in range(0, mt + 1):
        lg.append(np.log(_fisher(pm, 0, k))
                  + np.log(_fisher(pm, k, mt)))
    geks = float(np.exp(np.mean(lg)))
    fixed = _fisher(pm, 0, mt)
    chained = 1.0
    for i in range(1, mt + 1):
        chained *= _fisher(pm, i - 1, i)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "geks_index": [float(rha(geks, 6))],
        "fixed_base_fisher": [float(rha(fixed, 6))],
        "chained_fisher": [float(rha(chained, 6))],
        "geks_over_fixed": [float(rha(geks / fixed, 6))]})


# ---------------------------------------------------------------------------
# The kappa paradox on the two outlier rules' daily verdicts +
# AC1's resistance to it
# ---------------------------------------------------------------------------

def _rule_agreement_cells(sf_dir: str):
    """(a, b, c, d) agreement table of the classic-boxplot vs
    Hampel daily outlier flags over all days (a = both flag,
    d = neither), off the medcouple family's pinned stats."""
    dr = _daily_revenue_cents(sf_dir)
    v = dr["c"].to_numpy(np.int64)
    med, q1, q3, mc = _mc_stats(v)
    iqr = q3 - q1
    cl = (v < q1 - 1.5 * iqr) | (v > q3 + 1.5 * iqr)
    ad = np.sort(np.abs(v - med))
    mad = float(ad[(len(ad) - 1) // 2])
    hp = np.abs(v - med) > 3.0 * 1.4826 * mad
    a = int((cl & hp).sum())
    b = int((cl & ~hp).sum())
    c_ = int((~cl & hp).sum())
    d = int((~cl & ~hp).sum())
    return a, b, c_, d


_RULEAGREE_SQL = f"""
{_MC_SQL},
mad AS (SELECT ad AS mad FROM (
           SELECT ABS(rk.c - md.m) AS ad,
                  ROW_NUMBER() OVER (ORDER BY ABS(rk.c - md.m))
                      AS i,
                  COUNT(*) OVER () AS n
           FROM rk CROSS JOIN md)
        WHERE i = (n - 1) // 2 + 1),
fg AS (SELECT CASE WHEN rk.c < fen.q1 - 1.5 * (fen.q3 - fen.q1)
                     OR rk.c > fen.q3 + 1.5 * (fen.q3 - fen.q1)
                   THEN 1 ELSE 0 END AS cl,
              CASE WHEN ABS(rk.c - fen.m)
                        > 3.0 * 1.4826 * mad.mad
                   THEN 1 ELSE 0 END AS hp
       FROM rk CROSS JOIN fen CROSS JOIN mad),
ag AS (SELECT
    CAST(SUM(cl * hp) AS DOUBLE) AS a,
    CAST(SUM(cl * (1 - hp)) AS DOUBLE) AS b,
    CAST(SUM((1 - cl) * hp) AS DOUBLE) AS c,
    CAST(SUM((1 - cl) * (1 - hp)) AS DOUBLE) AS d,
    CAST(COUNT(*) AS DOUBLE) AS n
    FROM fg)"""


@register("kappa_paradox_outlier_rules", sql=f"""
WITH {_RULEAGREE_SQL},
st AS (SELECT a, b, c, d, n,
              (a + d) / n AS po,
              ((a + b) / n) * ((a + c) / n)
              + ((c + d) / n) * ((b + d) / n) AS pe
       FROM ag)
SELECT ROUND(po, 6) AS raw_agreement,
       ROUND((po - pe) / (1.0 - pe), 6) AS kappa,
       ROUND((a - d) / n, 6) AS prevalence_index,
       ROUND((b - c) / n, 6) AS bias_index,
       ROUND(2.0 * po - 1.0, 6) AS pabak,
       CAST(CASE WHEN po > 0.8
                  AND (po - pe) / (1.0 - pe) < 0.4
                 THEN 1 ELSE 0 END AS BIGINT) AS paradox
FROM st""")
def kappa_paradox_outlier_rules(sf_dir: str) -> pd.DataFrame:
    """The kappa paradox, staged on the registry's own two
    outlier judges: the classic-boxplot and Hampel daily flags
    agree on almost every day (raw_agreement near 1 — most days
    are normal and both say so), yet Cohen's κ can be LOW,
    because κ's chance correction charges the raters for the
    extreme prevalence: when 'outlier' is rare, agreeing on the
    common negative is deemed nearly worthless and κ is driven
    by the handful of flagged days. Byrt–Bishop–Carlin's
    diagnosis columns make the mechanism explicit — the
    prevalence index (how lopsided the shared base rate is) is
    the culprit when large-negative, the bias index (do the
    rules flag at different RATES) the other suspect — and
    PABAK = 2·po − 1 is κ with both artifacts removed, the
    'what κ would say at balanced margins' counterfactual. The
    paradox flag (agreement > .8 with κ < .4) is the textbook
    definition; read with the AC1 row for the statistic that
    doesn't crater. Same pinned fences and MAD as the
    disagreement table."""
    a, b, c_, d = _rule_agreement_cells(sf_dir)
    n = a + b + c_ + d
    po = (a + d) / n
    pe = ((a + b) / n) * ((a + c_) / n) \
        + ((c_ + d) / n) * ((b + d) / n)
    kappa = (po - pe) / (1.0 - pe)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "raw_agreement": [float(rha(po, 6))],
        "kappa": [float(rha(kappa, 6))],
        "prevalence_index": [float(rha((a - d) / n, 6))],
        "bias_index": [float(rha((b - c_) / n, 6))],
        "pabak": [float(rha(2.0 * po - 1.0, 6))],
        "paradox": np.array(
            [1 if po > 0.8 and kappa < 0.4 else 0], np.int64)})


@register("ac1_vs_kappa_outlier_rules", sql=f"""
WITH {_RULEAGREE_SQL},
st AS (SELECT a, b, c, d, n,
              (a + d) / n AS po,
              ((a + b) / n) * ((a + c) / n)
              + ((c + d) / n) * ((b + d) / n) AS pe,
              ((a + b) / n + (a + c) / n) / 2.0 AS pi
       FROM ag)
SELECT ROUND((po - pe) / (1.0 - pe), 6) AS kappa,
       ROUND((po - 2.0 * pi * (1.0 - pi))
             / (1.0 - 2.0 * pi * (1.0 - pi)), 6) AS gwet_ac1,
       ROUND((po - 2.0 * pi * (1.0 - pi))
             / (1.0 - 2.0 * pi * (1.0 - pi))
             - (po - pe) / (1.0 - pe), 6) AS ac1_minus_kappa
FROM st""")
def ac1_vs_kappa_outlier_rules(sf_dir: str) -> pd.DataFrame:
    """Gwet's AC1 on the same agreement table — the statistic
    built to survive the paradox the κ row stages. The repair is
    in the chance model: κ assumes raters guess according to
    their own MARGINS (so at 95% 'normal' prevalence, chance
    agreement is ~90% and almost nothing is left to credit);
    AC1 models chance as guessing proportional to the
    uncertainty 2π(1−π), which vanishes at extreme prevalence
    instead of exploding — exactly the regime rare-event
    monitoring lives in. ac1_minus_kappa is the paradox priced
    in agreement units: near zero at balanced prevalence, large
    when κ is being punished for the base rate rather than for
    disagreement. The registry's AC1 row on period-modal types
    uses the same construction; here the two statistics judge
    the SAME pair of judges, which is the cleanest way to see
    that the choice of chance model, not the data, drives the
    verdict."""
    a, b, c_, d = _rule_agreement_cells(sf_dir)
    n = a + b + c_ + d
    po = (a + d) / n
    pe = ((a + b) / n) * ((a + c_) / n) \
        + ((c_ + d) / n) * ((b + d) / n)
    kappa = (po - pe) / (1.0 - pe)
    pi = ((a + b) / n + (a + c_) / n) / 2.0
    pe1 = 2.0 * pi * (1.0 - pi)
    ac1 = (po - pe1) / (1.0 - pe1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "kappa": [float(rha(kappa, 6))],
        "gwet_ac1": [float(rha(ac1, 6))],
        "ac1_minus_kappa": [float(rha(ac1 - kappa, 6))]})


# ---------------------------------------------------------------------------
# Workforce management: SIPP per-hour Erlang-C staffing + the
# flat-staffing comparison
# ---------------------------------------------------------------------------

def _hourly_load(sf_dir: str):
    """(per-hour-of-day offered erlangs a_h, mean session
    duration) from one sessionize pass; λ_h = session starts in
    clock hour h over days in span."""
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
        gap = us - np.roll(us, 1)
        sid = np.cumsum((~same) | (gap >= 1_800_000_000))
        per = pd.DataFrame({"sid": sid, "us": us}) \
            .groupby("sid").agg(st=("us", "min"),
                                en=("us", "max"))
        st = per["st"].to_numpy(np.int64)
        return pd.DataFrame({
            "h": (st % 86_400_000_000) // 3_600_000_000,
            "n": np.ones(len(per), np.int64),
            "dur": (per["en"] - per["st"]).to_numpy(np.int64)
            // 1_000_000})

    agg = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["h"], {"n": ("n", "sum"), "dur": ("dur", "sum")}) \
        .to_pandas().sort_values("h", ignore_index=True)
    yd = _daily_counts_full(sf_dir)
    ndays = len(yd)
    mean_dur = float(agg["dur"].sum()) / int(agg["n"].sum())
    hours = np.arange(24, dtype=np.int64)
    nmap = dict(zip(agg["h"].to_numpy(np.int64),
                    agg["n"].to_numpy(np.int64)))
    a = np.array([nmap.get(int(h), 0) / ndays * mean_dur
                  / 3600.0 for h in hours])
    return hours, a, mean_dur


_SIPP_SQL = f"""
s AS ({_SESS_SQL}),
per AS (SELECT user_id, sid,
               MIN(epoch_us(ts)) AS st, MAX(epoch_us(ts)) AS en
        FROM s GROUP BY 1, 2),
hh AS (SELECT (st % 86400000000) // 3600000000 AS h,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM((en - st) // 1000000) AS BIGINT) AS dur
       FROM per GROUP BY 1),
nd AS (SELECT MAX(epoch_us(ts)) // 86400000000
              - MIN(epoch_us(ts)) // 86400000000 + 1 AS d
       FROM events),
md AS (SELECT CAST(SUM(dur) AS DOUBLE) / SUM(n) AS mean_dur
       FROM hh),
ah AS (SELECT CAST(g.range AS BIGINT) AS h,
              COALESCE(hh.n, 0) / CAST(nd.d AS DOUBLE)
                  * md.mean_dur / 3600.0 AS a
       FROM range(0, 24) g
       LEFT JOIN hh ON hh.h = g.range
       CROSS JOIN nd CROSS JOIN md),
eb(h, s, b) AS (
  SELECT h, 1, a / (1.0 + a) FROM ah WHERE a > 0
  UNION ALL
  SELECT eb.h, eb.s + 1,
         ah.a * eb.b / (eb.s + 1 + ah.a * eb.b)
  FROM eb JOIN ah ON ah.h = eb.h WHERE eb.s < 50),
ec AS (SELECT eb.h, eb.s, ah.a,
              CASE WHEN eb.s > ah.a
                   THEN eb.s * eb.b
                        / (eb.s - ah.a * (1.0 - eb.b))
                   ELSE 1.0 END AS c
       FROM eb JOIN ah ON ah.h = eb.h),
rq AS (SELECT h, MIN(s) AS sreq FROM ec
       WHERE c <= 0.2 AND s > a GROUP BY h)"""


@register("sipp_staffing_by_hour", sql=f"""
WITH RECURSIVE {_SIPP_SQL}
SELECT ah.h AS hour,
       ROUND(ah.a, 6) AS offered_erlangs,
       CAST(COALESCE(rq.sreq, 0) AS BIGINT) AS servers_required,
       ROUND(CASE WHEN rq.sreq IS NOT NULL
                  THEN ah.a / rq.sreq END, 6) AS occupancy
FROM ah LEFT JOIN rq USING (h) ORDER BY ah.h""")
def sipp_staffing_by_hour(sf_dir: str) -> pd.DataFrame:
    """The SIPP staffing table (Stationary Independent Period by
    Period — the workforce-management standard): each clock
    hour's offered load from the measured session arrivals and
    the shared mean handle time, with the smallest server count
    meeting the 20%-wait Erlang-C target and the resulting
    occupancy. The occupancy column is the row worth reading
    twice: quiet hours run LOW occupancy at their minimum
    feasible staff — the integer-server granularity and the
    √a safety margin both bite hardest at small a, so an
    off-peak agent is mathematically condemned to idle — which
    is why blended queues and skill-based routing exist, and
    why judging night-shift 'productivity' against day-shift
    occupancy is an arithmetic error, not a management insight.
    Zero-load hours print 0 required (nothing arrives),
    NULL occupancy. Per-hour Erlang-B recursion in one
    multi-row recursive CTE; same sessionize pass conventions
    as the peak-load rows."""
    hours, a, mean_dur = _hourly_load(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for h in range(24):
        if a[h] > 0:
            cs = _erlang_c(float(a[h]))
            sreq = min(s for s in cs
                       if s > a[h] and cs[s] <= 0.2)
            rows.append((h, float(rha(a[h], 6)), sreq,
                         float(rha(a[h] / sreq, 6))))
        else:
            rows.append((h, 0.0, 0, np.nan))
    return pd.DataFrame(rows, columns=[
        "hour", "offered_erlangs", "servers_required",
        "occupancy"]).astype({"hour": np.int64,
                              "servers_required": np.int64})


@register("sipp_vs_flat_staffing", sql=f"""
WITH RECURSIVE {_SIPP_SQL},
tot AS (SELECT CAST(SUM(sreq) AS BIGINT) AS sipp_hours,
               CAST(MAX(sreq) AS BIGINT) AS peak_s
        FROM rq),
am AS (SELECT AVG(a) AS abar FROM ah),
ebm(s, b) AS (
  SELECT 1, (SELECT abar FROM am)
            / (1.0 + (SELECT abar FROM am))
  UNION ALL
  SELECT s + 1, (SELECT abar FROM am) * b
                / (s + 1 + (SELECT abar FROM am) * b)
  FROM ebm WHERE s < 50),
sm AS (SELECT MIN(s) AS s_mean FROM ebm, am
       WHERE s > am.abar
         AND s * b / (s - am.abar * (1.0 - b)) <= 0.2),
un AS (SELECT CAST(COUNT(*) AS BIGINT) AS under
       FROM rq, sm WHERE rq.sreq > sm.s_mean)
SELECT (SELECT sipp_hours FROM tot) AS sipp_server_hours,
       (SELECT CAST(peak_s * 24 AS BIGINT) FROM tot)
           AS flat_peak_server_hours,
       (SELECT CAST(s_mean * 24 AS BIGINT) FROM sm)
           AS flat_mean_server_hours,
       ROUND((SELECT CAST(peak_s * 24 AS DOUBLE) FROM tot)
             / (SELECT sipp_hours FROM tot), 6)
           AS peak_overstaff_ratio,
       (SELECT under FROM un) AS mean_understaffed_hours""")
def sipp_vs_flat_staffing(sf_dir: str) -> pd.DataFrame:
    """The comparison that justifies hour-by-hour scheduling:
    total server-hours per day under the SIPP table against the
    two flat policies a roster without WFM tooling defaults to
    — staff-to-peak all day (meets the target everywhere,
    peak_overstaff_ratio prices the idle capacity bought) and
    staff-to-the-MEAN load (cheapest-looking, but
    mean_understaffed_hours counts the clock hours where it
    silently misses the service target — the nonlinearity
    lesson again: Erlang-C is convex in load, so staffing to
    the average load does NOT deliver the average service
    level, it delivers target misses exactly when customers
    are present in numbers). The pair of failure modes brackets
    why interval staffing exists at all. Same per-hour loads
    and recursion; the mean-load requirement via its own
    pinned 50-step recursion."""
    hours, a, mean_dur = _hourly_load(sf_dir)
    sreqs = {}
    for h in range(24):
        if a[h] > 0:
            cs = _erlang_c(float(a[h]))
            sreqs[h] = min(s for s in cs
                           if s > a[h] and cs[s] <= 0.2)
    sipp_hours = sum(sreqs.values())
    peak_s = max(sreqs.values())
    abar = float(a.mean())
    csm = _erlang_c(abar)
    s_mean = min(s for s in csm if s > abar and csm[s] <= 0.2)
    under = sum(1 for h, s in sreqs.items() if s > s_mean)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "sipp_server_hours": np.array([sipp_hours], np.int64),
        "flat_peak_server_hours": np.array([peak_s * 24],
                                           np.int64),
        "flat_mean_server_hours": np.array([s_mean * 24],
                                           np.int64),
        "peak_overstaff_ratio": [float(rha(
            peak_s * 24 / sipp_hours, 6))],
        "mean_understaffed_hours": np.array([under], np.int64)})


# ---------------------------------------------------------------------------
# Group-sequential design: the O'Brien–Fleming vs Pocock boundary
# table on the cumulative weekend-effect path
# ---------------------------------------------------------------------------

def _cumulative_weekly_z(sf_dir: str):
    """Per complete Sunday-aligned week k: the cumulative (weeks
    1..k) weekend-vs-weekday purchase-share z."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "wk": (day + 4) // 7,
            "dow": (day + 4) % 7,
            "wkd": np.isin((day + 4) % 7, (0, 6))
            .astype(np.int64),
            "n": np.ones(len(df), np.int64),
            "p": (df["event_type"] == "purchase")
            .to_numpy().astype(np.int64)}) \
            .groupby(["wk", "dow", "wkd"], as_index=False).sum()

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["wk", "dow", "wkd"],
        {"n": ("n", "sum"), "p": ("p", "sum")}).to_pandas()
    full = g.groupby("wk")["dow"].nunique()
    weeks = sorted(int(w) for w in full[full == 7].index)
    out = []
    c1n = c1p = c0n = c0p = 0
    for w in weeks:
        sub = g[g["wk"] == w]
        c1n += int(sub[sub["wkd"] == 1]["n"].sum())
        c1p += int(sub[sub["wkd"] == 1]["p"].sum())
        c0n += int(sub[sub["wkd"] == 0]["n"].sum())
        c0p += int(sub[sub["wkd"] == 0]["p"].sum())
        p1 = c1p / c1n
        p0 = c0p / c0n
        v = p1 * (1 - p1) / c1n + p0 * (1 - p0) / c0n
        out.append((w, (p1 - p0) / np.sqrt(v)))
    return out


_CUMZ_SQL = """
b AS (SELECT (epoch_us(ts) // 86400000000 + 4) // 7 AS wk,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS wkd,
             CASE WHEN event_type = 'purchase'
                  THEN 1 ELSE 0 END AS p
      FROM events),
cw AS (SELECT wk FROM b GROUP BY wk
       HAVING COUNT(DISTINCT dow) = 7),
wq AS (SELECT b.wk, b.wkd, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(b.p) AS BIGINT) AS pp
       FROM b JOIN cw USING (wk) GROUP BY 1, 2),
ix AS (SELECT wk, ROW_NUMBER() OVER (ORDER BY wk) AS k,
              COUNT(*) OVER () AS kk
       FROM (SELECT DISTINCT wk FROM wq)),
cm AS (SELECT ix.wk, ix.k, ix.kk,
              SUM(CASE WHEN w2.wkd = 1 THEN w2.n END) AS n1,
              SUM(CASE WHEN w2.wkd = 1 THEN w2.pp END) AS p1,
              SUM(CASE WHEN w2.wkd = 0 THEN w2.n END) AS n0,
              SUM(CASE WHEN w2.wkd = 0 THEN w2.pp END) AS p0
       FROM ix JOIN wq w2 ON w2.wk <= ix.wk
       GROUP BY 1, 2, 3),
zz AS (SELECT wk, k, kk,
              (CAST(p1 AS DOUBLE) / n1 - CAST(p0 AS DOUBLE) / n0)
              / SQRT((CAST(p1 AS DOUBLE) / n1)
                     * (1.0 - CAST(p1 AS DOUBLE) / n1) / n1
                     + (CAST(p0 AS DOUBLE) / n0)
                       * (1.0 - CAST(p0 AS DOUBLE) / n0) / n0)
                  AS z
       FROM cm)"""


@register("obrien_fleming_monitor", sql=f"""
WITH {_CUMZ_SQL}
SELECT CAST(wk AS BIGINT) AS epoch_week,
       CAST(k AS BIGINT) AS analysis_k,
       ROUND(z, 6) AS cumulative_z,
       ROUND(1.959964 * SQRT(CAST(kk AS DOUBLE) / k), 6)
           AS obf_boundary,
       CAST(CASE WHEN ABS(z) > 1.959964
                      * SQRT(CAST(kk AS DOUBLE) / k)
                 THEN 1 ELSE 0 END AS BIGINT) AS obf_crossed,
       CAST(CASE WHEN ABS(z) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS naive_crossed
FROM zz ORDER BY k""")
def obrien_fleming_monitor(sf_dir: str) -> pd.DataFrame:
    """The group-sequential design the peeking-audit row (which
    REPLAYS naive weekly looks) exists to motivate: the same
    cumulative weekend-effect z path scored against
    O'Brien–Fleming boundaries z_α·√(K/k) — enormous early
    (at the first of five looks the bar is ≈4.4σ), relaxing to
    essentially the fixed-sample 1.96 at the final analysis.
    This is the design that makes interim monitoring FREE in
    power terms: almost no α is spent early, so the final test
    is nearly as sharp as never having peeked, at the price of
    early stops requiring overwhelming evidence — the standard
    choice for confirmatory trials, and the correct discipline
    for any dashboard that insists on weekly looks at a
    running experiment. naive_crossed beside obf_crossed shows
    on each week which looks the 1.96 habit would have 'won'
    that the design correctly refuses. Classic OBF shape
    (Lan–DeMets α-spending refines it; the √(K/k) form is the
    pinned textbook boundary); complete Sunday-aligned weeks;
    exact cumulative counts."""
    zs = _cumulative_weekly_z(sf_dir)
    kk = len(zs)
    rha = textstats.round_half_away
    rows = []
    for k, (wk, z) in enumerate(zs, 1):
        bnd = 1.959964 * np.sqrt(kk / k)
        rows.append((wk, k, float(rha(z, 6)),
                     float(rha(bnd, 6)),
                     1 if abs(z) > bnd else 0,
                     1 if abs(z) > 1.959964 else 0))
    return pd.DataFrame(rows, columns=[
        "epoch_week", "analysis_k", "cumulative_z",
        "obf_boundary", "obf_crossed", "naive_crossed"]) \
        .astype({"epoch_week": np.int64, "analysis_k": np.int64,
                 "obf_crossed": np.int64,
                 "naive_crossed": np.int64})


@register("pocock_vs_obf_verdict", sql=f"""
WITH {_CUMZ_SQL},
pc AS (SELECT kk,
              CASE kk WHEN 1 THEN 1.959964 WHEN 2 THEN 2.178
                      WHEN 3 THEN 2.289 WHEN 4 THEN 2.361
                      WHEN 5 THEN 2.413 WHEN 6 THEN 2.453
                      WHEN 7 THEN 2.485 WHEN 8 THEN 2.512
                      WHEN 9 THEN 2.535 WHEN 10 THEN 2.555
                      END AS pb
       FROM (SELECT DISTINCT kk FROM zz)),
fs AS (SELECT
    (SELECT MIN(k) FROM zz, pc WHERE ABS(z) > pc.pb)
        AS k_pocock,
    (SELECT MIN(k) FROM zz
     WHERE ABS(z) > 1.959964 * SQRT(CAST(kk AS DOUBLE) / k))
        AS k_obf,
    (SELECT MIN(k) FROM zz WHERE ABS(z) > 1.959964)
        AS k_naive)
SELECT (SELECT CAST(kk AS BIGINT) FROM pc) AS n_analyses,
       (SELECT ROUND(pb, 6) FROM pc) AS pocock_boundary,
       (SELECT CAST(k_pocock AS BIGINT) FROM fs)
           AS first_cross_pocock,
       (SELECT CAST(k_obf AS BIGINT) FROM fs) AS first_cross_obf,
       (SELECT CAST(k_naive AS BIGINT) FROM fs)
           AS first_cross_naive""")
def pocock_vs_obf_verdict(sf_dir: str) -> pd.DataFrame:
    """The two classic boundary SHAPES compared on one path:
    Pocock (one flat critical value at every look — the table
    constant for K analyses, 2.413 at K = 5) against OBF's
    decaying √(K/k), with the first crossing analysis under
    each and under the naive 1.96 habit. The shapes encode
    opposite philosophies: Pocock buys the best chance of
    stopping EARLY by paying a stiff final bar (a trial ending
    at full size with z = 2.2 is declared null under Pocock —
    the famously awkward outcome), OBF protects the final
    analysis and demands near-certainty to stop early.
    first_cross_naive ≤ both, always — the gap between the
    naive column and the designed ones is the α-inflation the
    peeking rows price, here shown as WHERE it bites on the
    calendar. Pinned Pocock constants for K ≤ 10 (Pocock 1977
    table); K beyond the table raises rather than degrading
    anti-conservatively. NULLs when never crossed."""
    zs = _cumulative_weekly_z(sf_dir)
    kk = len(zs)
    # pinned Pocock group-sequential constants, two-sided alpha=.05
    # (Pocock 1977 table, K <= 10). Beyond the table we FAIL rather
    # than silently reuse a smaller-K constant, which would be
    # anti-conservative (ADVICE r2) — the SQL CASE mirrors this by
    # yielding NULL past K=10.
    _pocock = {1: 1.959964, 2: 2.178, 3: 2.289, 4: 2.361, 5: 2.413,
               6: 2.453, 7: 2.485, 8: 2.512, 9: 2.535, 10: 2.555}
    if kk not in _pocock:
        raise ValueError(
            f"Pocock constant table pinned for K<=10 analyses; got "
            f"K={kk} complete weeks — extend the table (Pocock 1977) "
            f"rather than reusing a smaller-K constant")
    pb = _pocock[kk]
    k_p = k_o = k_n = None
    for k, (wk, z) in enumerate(zs, 1):
        if k_p is None and abs(z) > pb:
            k_p = k
        if k_o is None and abs(z) > 1.959964 * np.sqrt(kk / k):
            k_o = k
        if k_n is None and abs(z) > 1.959964:
            k_n = k
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_analyses": np.array([kk], np.int64),
        "pocock_boundary": [float(rha(pb, 6))],
        "first_cross_pocock": pd.array([k_p], dtype="Int64"),
        "first_cross_obf": pd.array([k_o], dtype="Int64"),
        "first_cross_naive": pd.array([k_n], dtype="Int64")})


# ---------------------------------------------------------------------------
# Coupon collecting the event types: the inclusion-exclusion
# expectation vs observed completion + the censoring-honest KM
# ---------------------------------------------------------------------------

def _completion_obs(sf_dir: str) -> pd.DataFrame:
    """Per user: events until all 5 types seen (t, completed
    flag; censored users carry their total event count)."""
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        first = pd.DataFrame({
            "uid": uid,
            "ty": g["event_type"].to_numpy(),
            "rn": g.groupby("user_id").cumcount().to_numpy() + 1})
        fo = first.groupby(["uid", "ty"])["rn"].min().reset_index()
        per = fo.groupby("uid").agg(k=("ty", "size"),
                                    t=("rn", "max"))
        tot = first.groupby("uid")["rn"].max()
        out = pd.DataFrame({
            "uid": per.index.to_numpy(np.int64),
            "t": np.where(per["k"].to_numpy() == 5,
                          per["t"].to_numpy(np.int64),
                          tot.reindex(per.index)
                          .to_numpy(np.int64)),
            "ev": (per["k"].to_numpy() == 5).astype(np.int64)})
        return out

    return reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id",
                         "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["uid"], {"t": ("t", "max"), "ev": ("ev", "max")}) \
        .to_pandas().sort_values("uid", ignore_index=True)


_COMPLETE_SQL = """
sq AS (SELECT user_id, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn
       FROM events),
fo AS (SELECT user_id, event_type, MIN(rn) AS fr
       FROM sq GROUP BY 1, 2),
pu AS (SELECT fo.user_id, COUNT(*) AS k, MAX(fo.fr) AS tc
       FROM fo GROUP BY 1),
tt AS (SELECT user_id, MAX(rn) AS tot FROM sq GROUP BY 1),
ob AS (SELECT pu.user_id,
              CASE WHEN pu.k = 5 THEN pu.tc ELSE tt.tot END AS t,
              CASE WHEN pu.k = 5 THEN 1 ELSE 0 END AS ev
       FROM pu JOIN tt USING (user_id))"""


@register("coupon_collector_types", sql=f"""
WITH {_COMPLETE_SQL},
pt AS (SELECT event_type,
              CAST(COUNT(*) AS DOUBLE)
              / (SELECT COUNT(*) FROM events) AS p,
              ROW_NUMBER() OVER (ORDER BY event_type) AS rn
       FROM events GROUP BY event_type),
ms AS (SELECT m.range AS m,
              SUM(CASE WHEN (m.range >> (pt.rn - 1)) & 1 = 1
                       THEN pt.p ELSE 0 END) AS ps,
              SUM(CASE WHEN (m.range >> (pt.rn - 1)) & 1 = 1
                       THEN 1 ELSE 0 END) AS sz
       FROM range(1, 32) m CROSS JOIN pt
       GROUP BY m.range),
ex AS (SELECT SUM(CASE WHEN sz % 2 = 1 THEN 1.0 / ps
                       ELSE -1.0 / ps END) AS et
       FROM ms),
oc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
              CAST(SUM(ev) AS BIGINT) AS nc,
              AVG(CASE WHEN ev = 1
                       THEN CAST(t AS DOUBLE) END) AS mt
       FROM ob)
SELECT (SELECT nu FROM oc) AS n_users,
       (SELECT nc FROM oc) AS n_completers,
       ROUND((SELECT et FROM ex), 6) AS expected_events,
       ROUND((SELECT mt FROM oc), 6) AS observed_mean_completers,
       ROUND((SELECT mt FROM oc) / (SELECT et FROM ex), 6)
           AS observed_over_expected""")
def coupon_collector_types(sf_dir: str) -> pd.DataFrame:
    """The coupon-collector expectation for the event-type
    repertoire: how many events a type-random user would need to
    see all five types, computed EXACTLY for the unequal
    observed type mix by inclusion–exclusion —
    E[T] = Σ over the 31 nonempty type subsets of
    (−1)^(|S|+1)/P(S) — beside the observed mean among users who
    actually completed. The comparison is a sequencing test the
    repertoire-saturation row (present) can't make: observed ≈
    expected says journeys sample types as if independently
    (order is noise, model the mix); observed well ABOVE says
    types arrive in structured phases (users exhaust one
    behavior before discovering the next — onboarding shapes
    the sequence); BELOW says anti-clustering — early sessions
    are deliberately exploratory tours. The completers-only
    mean is censoring-biased LOW by construction (the honest
    version is the KM row alongside), which is why the ratio
    here UNDERSTATES any structure verdict — stated, not
    hidden. 31-term closed form over the bitmask subsets, both
    engines; (ts, event_id) ordering pinned."""
    obs = _completion_obs(sf_dir)
    c = _wkd_type_mix(sf_dir)
    tot = int(c["c1"].sum()) + int(c["c2"].sum())
    ps = sorted((str(t), (int(a) + int(b)) / tot)
                for t, a, b in zip(c["ty"], c["c1"], c["c2"]))
    k = len(ps)
    et = 0.0
    for m in range(1, 1 << k):
        s = sum(ps[i][1] for i in range(k) if (m >> i) & 1)
        sz = bin(m).count("1")
        et += (1.0 if sz % 2 == 1 else -1.0) / s
    comp = obs[obs["ev"] == 1]
    mt = float(comp["t"].mean())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([len(obs)], np.int64),
        "n_completers": np.array([len(comp)], np.int64),
        "expected_events": [float(rha(et, 6))],
        "observed_mean_completers": [float(rha(mt, 6))],
        "observed_over_expected": [float(rha(mt / et, 6))]})


@register("repertoire_completion_km", sql=f"""
WITH {_COMPLETE_SQL},
e AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS ending
      FROM ob GROUP BY t),
r AS (SELECT t, d,
             (SELECT COUNT(*) FROM ob)
             - COALESCE(SUM(ending) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
      FROM e),
km AS (SELECT t,
              PRODUCT(1.0 - d / CAST(n_risk AS DOUBLE))
                  OVER (ORDER BY t) AS s
       FROM r WHERE d > 0),
md AS (SELECT MIN(t) AS m FROM km WHERE s <= 0.5),
nv AS (SELECT AVG(CASE WHEN ev = 1
                       THEN CAST(t AS DOUBLE) END) AS mt,
              CAST(SUM(1 - ev) AS BIGINT) AS cen,
              CAST(COUNT(*) AS BIGINT) AS nu
       FROM ob)
SELECT (SELECT CAST(m AS BIGINT) FROM md) AS km_median_events,
       ROUND((SELECT mt FROM nv), 6) AS naive_completer_mean,
       ROUND(CAST((SELECT cen FROM nv) AS DOUBLE)
             / (SELECT nu FROM nv), 6) AS censored_share,
       CAST(CASE WHEN (SELECT m FROM md) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT)
           AS median_beyond_observation""")
def repertoire_completion_km(sf_dir: str) -> pd.DataFrame:
    """The censoring-honest read of events-to-full-repertoire:
    Kaplan–Meier over ALL users, with never-completers censored
    at their observed event count, beside the naive
    completers-only mean. The naive number answers 'among users
    who finished, how fast' — survivorship in its purest form:
    users with many events are over-represented among
    completers, and slow explorers who haven't finished yet are
    silently excluded, so the naive mean can sit far BELOW the
    KM median that respects the still-running journeys.
    censored_share is how much of the population the naive
    number ignores; median_beyond_observation = 1 is the
    honest extreme where most users haven't completed and no
    finite median is knowable yet — the answer 'we don't know,
    and anyone quoting the completers' mean is measuring the
    fast tail'. Same life-table machinery as the
    time-to-purchase KM; integer event-count timescale."""
    obs = _completion_obs(sf_dir)
    t = obs["t"].to_numpy(np.int64)
    ev = obs["ev"].to_numpy(np.int64)
    e = pd.DataFrame({"t": t, "d": ev,
                      "one": np.ones(len(t), np.int64)}) \
        .groupby("t").agg(d=("d", "sum"),
                          ending=("one", "sum")).reset_index() \
        .sort_values("t", ignore_index=True)
    n = len(obs)
    n_risk = n - np.concatenate(
        ([0], np.cumsum(e["ending"].to_numpy(np.int64))[:-1]))
    keep = e["d"].to_numpy(np.int64) > 0
    tk = e["t"].to_numpy(np.int64)[keep]
    dk = e["d"].to_numpy(np.int64)[keep]
    nk = n_risk[keep]
    s = np.cumprod(1.0 - dk / nk.astype(np.float64))
    med = tk[s <= 0.5]
    comp = obs[obs["ev"] == 1]
    mt = float(comp["t"].mean())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "km_median_events": pd.array(
            [int(med[0]) if len(med) else None], dtype="Int64"),
        "naive_completer_mean": [float(rha(mt, 6))],
        "censored_share": [float(rha(
            float((1 - ev).sum()) / n, 6))],
        "median_beyond_observation": np.array(
            [0 if len(med) else 1], np.int64)})
