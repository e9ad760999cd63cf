"""Driver-contract queries (chunk 14/18).
Sections:
  - Randomness audits on cent digits: Knuth's serial-pair and gap tests
  - Nonparametric smoothing: circular Nadaraya–Watson purchase rate by
  - Extremal dependence in time: the Ferro–Segers extremal index and
  - Canonical correlation: the daily demand block (views, clicks) vs
  - Net dollar retention: the SaaS waterfall applied to weekly user
  - Anytime-valid inference: the Beta(1/2,1/2) e-value for the weekend
  - Conversion technology: Cobb–Douglas purchases ~ views^a · clicks^b
  - Distributional source similarity: pairwise Jensen–Shannon + the
  - Time-rescaling validation of the circadian rate model (Brown et al.)
  - Nestedness of the user × event-type incidence matrix (NODF) and the
  - each unordered pair fires once via the strict >;
  - Power-law discipline (Clauset–Shalizi–Newman): ML alpha with KS
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
    ray,
    rd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q07_fits_audits import (  # noqa: F401
    _source_word_counts,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _DAILY_SQL,
    _daily_counts,
)
from webalizer_ray.pipelines.queries.q11_forecast_supply import (  # noqa: F401
    _RMST_SQL,
    _dayvec,
    _rmst_tables,
)
from webalizer_ray.pipelines.queries.q13_decision_resample import (  # noqa: F401
    _ASQ,
    _XPE_SQL,
    _as_upper_q,
    _cross_elasticities,
)



@register("substitute_complement_census", sql=f"""
WITH {_XPE_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN cross_ > 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS substitutes,
       CAST(SUM(CASE WHEN cross_ < -0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS complements,
       CAST(SUM(CASE WHEN cross_ >= -0.5 AND cross_ <= 0.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS neutral,
       ROUND(AVG(cross_), 6) AS mean_cross,
       ROUND(AVG(own), 6) AS mean_own
FROM el""")
def substitute_complement_census(sf_dir: str) -> pd.DataFrame:
    """The census over every qualifying brand pair: how much of
    the catalog behaves as substitutes (cross > +0.5), complements
    (< −0.5), or neutral — the one-row market-structure summary
    pricing strategy starts from. A substitute-heavy catalog means
    brand-level price cuts mostly cannibalize sibling brands
    (portfolio revenue barely moves — exactly the risk-pooling
    row's correlation story seen from the demand side); a
    neutral-dominated census says brands are separate markets and
    per-brand optimization is safe. mean_own should be negative
    if the realized-price panel carries real demand signal at all
    — a near-zero mean_own is the honest warning that these
    monthly prices are mostly mix effects, qualifying BOTH
    elasticity tables. ±0.5 band documented; same panel, pair
    filter and adjugate."""
    el = _cross_elasticities(sf_dir)
    c = el["cross"].to_numpy(np.float64)
    o = el["own"].to_numpy(np.float64)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([len(el)], np.int64),
        "substitutes": np.array([int((c > 0.5).sum())], np.int64),
        "complements": np.array([int((c < -0.5).sum())], np.int64),
        "neutral": np.array(
            [int(((c >= -0.5) & (c <= 0.5)).sum())], np.int64),
        "mean_cross": [float(rha(float(c.mean()), 6))],
        "mean_own": [float(rha(float(o.mean()), 6))]})


# ---------------------------------------------------------------------------
# Randomness audits on cent digits: Knuth's serial-pair and gap tests
# ---------------------------------------------------------------------------

#: per-user event stream in (ts, event_id) order with the last cent
#: digit and its in-user position.
_DIGSTREAM_SQL = """
s AS (SELECT user_id,
             ABS(CAST(ROUND(value * 100) AS BIGINT)) % 10 AS dig,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events)"""


@register("digit_serial_pair_test", sql=f"""
WITH {_DIGSTREAM_SQL},
pr AS (SELECT s.dig AS d2, p.dig AS d1
       FROM s JOIN s p ON p.user_id = s.user_id
                      AND p.pos = s.pos - 1),
ct AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS o
       FROM pr GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM ct),
rm AS (SELECT d1, SUM(o) AS m FROM ct GROUP BY 1),
cm AS (SELECT d2, SUM(o) AS m FROM ct GROUP BY 1),
x2 AS (SELECT SUM((ct.o - CAST(rm.m AS DOUBLE) * cm.m / tot.n)
                  * (ct.o - CAST(rm.m AS DOUBLE) * cm.m / tot.n)
                  / (CAST(rm.m AS DOUBLE) * cm.m / tot.n)) AS x,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS nr,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM cm) AS nc
       FROM ct JOIN rm ON rm.d1 = ct.d1
               JOIN cm ON cm.d2 = ct.d2, tot)
SELECT (SELECT n FROM tot) AS n_pairs,
       ROUND(x, 6) AS chi2,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
       CAST(CASE WHEN x > 103.009509 AND (nr - 1) * (nc - 1) = 81
                 THEN 1
                 WHEN (nr - 1) * (nc - 1) != 81 THEN 0
                 ELSE 0 END AS BIGINT) AS rejected
FROM x2""")
def digit_serial_pair_test(sf_dir: str) -> pd.DataFrame:
    """Knuth's serial test adapted to a fabrication audit: the
    10×10 contingency of CONSECUTIVE last-cent-digit pairs within
    each user's (ts, event_id)-ordered stream, χ² against
    independence (expected = row×col/n, so the marginal heaping
    the Benford/heaping rows already measure is conditioned away
    — this detects only SEQUENTIAL structure). The fabrication
    signature it catches and the marginal tests cannot: a human
    inventing amounts avoids repeating the digit they just typed
    (too-few diagonal cells) and cycles through 'random-looking'
    favorites — both invisible to any single-digit histogram. df
    is (r−1)(c−1) with the observed alphabet (81 when all ten
    digits occur; the flag only fires on the full-alphabet df,
    documented). Only (d1, d2, count) cells shuffle; cells are
    exact integers."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        dig = np.abs(np.rint(g["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)) % 10
        same = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        d1 = np.roll(dig, 1)
        out = pd.DataFrame({"d1": d1[same], "d2": dig[same],
                            "o": np.ones(int(same.sum()),
                                         np.int64)})
        return out.groupby(["d1", "d2"], as_index=False).sum()

    num_buckets = 32
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    ct = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(prep,
                                       batch_format="pandas"),
        ["d1", "d2"], {"o": ("o", "sum")}).to_pandas()
    n = int(ct["o"].sum())
    rm = ct.groupby("d1")["o"].sum()
    cm = ct.groupby("d2")["o"].sum()
    x = 0.0
    for _, r in ct.iterrows():
        e = float(rm[r["d1"]]) * float(cm[r["d2"]]) / n
        x += (float(r["o"]) - e) ** 2 / e
    df_ = (len(rm) - 1) * (len(cm) - 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "chi2": [float(rha(x, 6))],
        "df": np.array([df_], np.int64),
        "rejected": np.array(
            [1 if df_ == 81 and x > 103.009509 else 0], np.int64)})


@register("digit_gap_test_zero", sql=f"""
WITH {_DIGSTREAM_SQL},
z AS (SELECT user_id, pos,
             LAG(pos) OVER (PARTITION BY user_id ORDER BY pos)
                 AS prev
      FROM s WHERE dig = 0),
gp AS (SELECT LEAST(pos - prev - 1, 10) AS k
       FROM z WHERE prev IS NOT NULL),
ob AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS o FROM gp GROUP BY 1),
p0 AS (SELECT SUM(CASE WHEN dig = 0 THEN 1.0 ELSE 0 END)
           / COUNT(*) AS p
       FROM s),
gt AS (SELECT CAST(SUM(o) AS BIGINT) AS g FROM ob),
kk AS (SELECT UNNEST(generate_series(0, 10)) AS k),
ex AS (SELECT kk.k,
              CASE WHEN kk.k < 10
                   THEN gt.g * POW(1.0 - p0.p, kk.k) * p0.p
                   ELSE gt.g * POW(1.0 - p0.p, 10) END AS e,
              COALESCE((SELECT o FROM ob WHERE ob.k = kk.k), 0)
                  AS o
       FROM kk, gt, p0)
SELECT (SELECT g FROM gt) AS n_gaps,
       ROUND((SELECT p FROM p0), 6) AS p_zero,
       ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
       CAST(9 AS BIGINT) AS df,
       CAST(CASE WHEN SUM((o - e) * (o - e) / e) > 16.918978
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM ex""")
def digit_gap_test_zero(sf_dir: str) -> pd.DataFrame:
    """Knuth's gap test on the zero digit: run lengths between
    consecutive 0-ending values within a user's stream, χ² against
    the Geometric(p̂₀) law that independence implies (bins 0–9 and
    10+, p̂₀ the marginal zero rate, df = 11−1−1 = 9 for the
    estimated parameter, documented). This is the other half of
    the serial test's coverage: the 10×10 pair table sees only
    lag-1 structure, while gap lengths aggregate ALL lags — a
    fabricator who sprinkles round amounts 'every so often' at
    deliberately regular intervals produces an under-dispersed
    gap histogram (missing short and long gaps) with a clean pair
    table. Together with the Benford/heaping family this
    completes the audit ladder: marginal shape → pairwise
    sequence → full gap process. Exact integer gap counts; the
    geometric expectations are shared float expressions."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        dig = np.abs(np.rint(g["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)) % 10
        uid = g["user_id"].to_numpy(np.int64)
        pos = np.arange(len(g))
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        start = np.where(first, pos, 0)
        start = np.maximum.accumulate(start)
        inpos = pos - start + 1
        zmask = dig == 0
        zu, zp = uid[zmask], inpos[zmask]
        prev_same = np.concatenate([[False], zu[1:] == zu[:-1]])
        gaps = np.minimum(zp[1:][prev_same[1:]]
                          - zp[:-1][prev_same[1:]] - 1, 10) \
            if len(zp) > 1 else np.array([], np.int64)
        out = pd.DataFrame({"k": gaps,
                            "o": np.ones(len(gaps), np.int64)})
        nz = pd.DataFrame({"k": np.full(1, -1, np.int64),
                           "o": np.array([int(zmask.sum())],
                                         np.int64)})
        nt = pd.DataFrame({"k": np.full(1, -2, np.int64),
                           "o": np.array([len(g)], np.int64)})
        return pd.concat([out.groupby("k", as_index=False).sum(),
                          nz, nt], ignore_index=True)

    num_buckets = 32
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    ob = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(prep,
                                       batch_format="pandas"),
        ["k"], {"o": ("o", "sum")}).to_pandas()
    nz = int(ob[ob["k"] == -1]["o"].iloc[0])
    nt = int(ob[ob["k"] == -2]["o"].iloc[0])
    ob = ob[ob["k"] >= 0]
    p = nz / nt
    g_tot = int(ob["o"].sum())
    omap = dict(zip(ob["k"].astype(int), ob["o"].astype(int)))
    x = 0.0
    for k in range(11):
        e = g_tot * ((1.0 - p) ** k * p if k < 10
                     else (1.0 - p) ** 10)
        o = omap.get(k, 0)
        x += (o - e) ** 2 / e
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([g_tot], np.int64),
        "p_zero": [float(rha(p, 6))],
        "chi2": [float(rha(x, 6))],
        "df": np.array([9], np.int64),
        "rejected": np.array([1 if x > 16.918978 else 0],
                             np.int64)})


# ---------------------------------------------------------------------------
# Nonparametric smoothing: circular Nadaraya–Watson purchase rate by
# hour + the bandwidth-sensitivity audit
# ---------------------------------------------------------------------------

#: hourly (purchases, events) counts plus the circular Gaussian
#: kernel smooth on the 24-hour grid at bandwidth {bw}.
_NW_SQL = """
h AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
gr AS (SELECT UNNEST(generate_series(0, 23)) AS g),
kw AS (SELECT gr.g, h.hr, h.k, h.n,
              EXP(-(LEAST(ABS(gr.g - h.hr),
                          24 - ABS(gr.g - h.hr))
                    * LEAST(ABS(gr.g - h.hr),
                            24 - ABS(gr.g - h.hr)))
                  / (2.0 * {bw} * {bw})) AS w
       FROM gr JOIN h ON TRUE),
sm AS (SELECT g, SUM(w * k) / SUM(w * n) AS rate_smooth
       FROM kw GROUP BY 1)"""


def _hour_kn(sf_dir: str):
    """(k, n) purchase / total counts on the 0..23 hour grid."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hr": df["ts"].dt.hour.to_numpy(np.int64),
            "k": (df["event_type"].to_numpy()
                  == "purchase").astype(np.int64),
            "n": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["hr"], {"k": ("k", "sum"), "n": ("n", "sum")}).to_pandas()
    k = np.zeros(24, np.int64)
    n = np.zeros(24, np.int64)
    k[h["hr"].to_numpy(np.int64)] = h["k"].to_numpy(np.int64)
    n[h["hr"].to_numpy(np.int64)] = h["n"].to_numpy(np.int64)
    return k, n


def _nw_smooth(k, n, bw):
    """Circular Gaussian NW smooth of k/n on the 24-hour grid."""
    g = np.arange(24, dtype=np.float64)
    d = np.abs(g[:, None] - g[None, :])
    d = np.minimum(d, 24 - d)
    w = np.exp(-(d * d) / (2.0 * bw * bw))
    return (w * k[None, :]).sum(axis=1) \
        / (w * n[None, :]).sum(axis=1)


@register("nw_purchase_rate_by_hour", sql=f"""
WITH {_NW_SQL.format(bw=1.5)}
SELECT h.hr AS hour, h.n AS events,
       ROUND(CAST(h.k AS DOUBLE) / h.n, 6) AS rate_raw,
       ROUND(sm.rate_smooth, 6) AS rate_smooth,
       ROUND(CAST(h.k AS DOUBLE) / h.n - sm.rate_smooth, 6)
           AS residual
FROM h JOIN sm ON sm.g = h.hr ORDER BY h.hr""")
def nw_purchase_rate_by_hour(sf_dir: str) -> pd.DataFrame:
    """Circular Nadaraya–Watson smooth of the purchase rate over
    the 24-hour clock (Gaussian kernel, bandwidth 1.5 h,
    wrap-around distance so 23:00 borrows from 00:00 — the
    discontinuity every tabular hourly report silently inserts at
    midnight). The kernel weight runs over COUNTS (Σw·k / Σw·n),
    so thin hours are shrunk toward their neighbors in proportion
    to their actual sample sizes rather than equally — the
    statistically honest version of the moving average a
    dashboard would apply to the rate column. residual = raw −
    smooth isolates single-hour effects from the circadian sweep:
    a large residual at a single hour against a smooth
    neighborhood is an on-the-hour artifact (batch jobs, cron
    retries), which the raw profile can't distinguish from shape.
    Exact integer counts; the 24×24 kernel matrix is closed-form
    on both engines."""
    k, n = _hour_kn(sf_dir)
    sm = _nw_smooth(k, n, 1.5)
    rha = textstats.round_half_away
    mask = n > 0
    hrs = np.arange(24)[mask]
    return pd.DataFrame({
        "hour": hrs.astype(np.int64),
        "events": n[mask],
        "rate_raw": rha(k[mask] / n[mask], 6),
        "rate_smooth": rha(sm[mask], 6),
        "residual": rha(k[mask] / n[mask] - sm[mask], 6)})


@register("nw_bandwidth_sensitivity", sql=f"""
WITH hh AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS k,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
bw AS (SELECT UNNEST([0.75, 1.5, 3.0]) AS b),
gr AS (SELECT UNNEST(generate_series(0, 23)) AS g),
kw AS (SELECT bw.b, gr.g, hh.hr, hh.k, hh.n,
              EXP(-(LEAST(ABS(gr.g - hh.hr),
                          24 - ABS(gr.g - hh.hr))
                    * LEAST(ABS(gr.g - hh.hr),
                            24 - ABS(gr.g - hh.hr)))
                  / (2.0 * bw.b * bw.b)) AS w
       FROM bw CROSS JOIN gr JOIN hh ON TRUE),
sm AS (SELECT b, g, SUM(w * k) / SUM(w * n) AS s
       FROM kw GROUP BY 1, 2),
rg AS (SELECT sm.b, sm.g, sm.s,
              LEAD(sm.s) OVER (PARTITION BY sm.b ORDER BY sm.g)
                  AS s1,
              CAST(hh.k AS DOUBLE) / hh.n AS raw
       FROM sm JOIN hh ON hh.hr = sm.g),
ag AS (SELECT b,
              COALESCE(SUM(CASE WHEN s1 IS NOT NULL
                                THEN (s1 - s) * (s1 - s) END),
                       0.0) AS rough,
              MAX(ABS(raw - s)) AS maxdev
       FROM rg GROUP BY 1)
SELECT ROUND(b, 6) AS bandwidth_h,
       ROUND(rough, 9) AS roughness,
       ROUND(maxdev, 6) AS max_abs_residual
FROM ag ORDER BY b""")
def nw_bandwidth_sensitivity(sf_dir: str) -> pd.DataFrame:
    """The bandwidth-choice audit at h = 0.75 / 1.5 / 3: curve
    roughness (Σ of squared first differences around the clock's
    observed hours) against the max |raw − smooth| residual —
    the bias–variance dial made visible. Reading the two columns
    down the rows: roughness collapsing while max-residual grows
    slowly means the circadian shape is genuinely smooth and the
    wide bandwidth is safe (report the stable curve); roughness
    AND residual both jumping between 1.5 and 3 means real
    structure lives at the ~2-hour scale (lunch dips, shift
    boundaries) and the wide kernel is erasing signal, not
    noise. No bandwidth is 'correct' — the audit's point is that
    the CHOICE should be made looking at this table rather than
    inherited from a default. Same kernel matrix per bandwidth;
    hours with no events drop from residual/roughness terms
    identically."""
    k, n = _hour_kn(sf_dir)
    rha = textstats.round_half_away
    rows = []
    mask = n > 0
    for bw in (0.75, 1.5, 3.0):
        sm = _nw_smooth(k, n, bw)
        s_obs = sm[mask]
        rough = float(((s_obs[1:] - s_obs[:-1]) ** 2).sum())
        maxdev = float(np.abs(k[mask] / n[mask] - s_obs).max())
        rows.append((float(rha(bw, 6)), float(rha(rough, 9)),
                     float(rha(maxdev, 6))))
    return pd.DataFrame(rows, columns=[
        "bandwidth_h", "roughness", "max_abs_residual"])


# ---------------------------------------------------------------------------
# Extremal dependence in time: the Ferro–Segers extremal index and
# the declustered incident rate
# ---------------------------------------------------------------------------

#: exceedance days of the daily-count 90th percentile (the POT
#: family's exact threshold convention) and their interexceedance
#: times.
_FS_SQL = """
daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
r AS (SELECT d, y,
             CAST(SUM(1) OVER (ORDER BY y, d) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n FROM daily),
thr AS (SELECT MIN(y) AS t FROM r WHERE 10 * rk >= 8 * n),
ex AS (SELECT d FROM daily, thr WHERE y > thr.t),
it AS (SELECT d - LAG(d) OVER (ORDER BY d) AS t FROM ex),
tt AS (SELECT CAST(t AS DOUBLE) AS t FROM it WHERE t IS NOT NULL),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              SUM(t) AS s1, SUM(t * t) AS s2,
              SUM(t - 1.0) AS d1,
              SUM((t - 1.0) * (t - 2.0)) AS d2,
              MAX(t) AS tmax
       FROM tt),
th AS (SELECT m, tmax,
              CASE WHEN tmax <= 2.0
                   THEN LEAST(1.0, 2.0 * s1 * s1 / (m * s2))
                   ELSE LEAST(1.0, 2.0 * d1 * d1 / (m * d2))
              END AS theta
       FROM st WHERE m >= 2)"""


@register("ferro_segers_extremal_index", sql=f"""
WITH {_FS_SQL}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exceed,
       ROUND((SELECT CAST(t AS DOUBLE) FROM thr), 6)
           AS threshold,
       CAST(tmax AS BIGINT) AS max_gap_days,
       ROUND(theta, 6) AS theta,
       ROUND(1.0 / theta, 6) AS mean_cluster_size,
       CAST(CASE WHEN tmax <= 2.0 THEN 1 ELSE 0 END AS BIGINT)
           AS small_gap_variant
FROM th""")
def ferro_segers_extremal_index(sf_dir: str) -> pd.DataFrame:
    """The Ferro–Segers intervals estimator of the extremal index
    θ on daily-count exceedances of the 80th-percentile
    threshold (one decile below the POT family's, trading a
    little threshold bias for a workable gap sample, documented): the moment ratio of interexceedance
    times (the max-gap ≤ 2 variant switch implemented exactly as
    published, flagged in the output). θ is the number the whole
    extreme-value family implicitly conditions on: GPD/Gumbel/
    return-level fits assume exceedances are independent, but hot
    days CLUSTER (a launch week is one event, not five), and θ is
    precisely the reciprocal mean cluster size — θ = 0.4 means
    the 12 'extreme days' are ~5 independent episodes, every iid
    return-period statement in the registry is optimistic by the
    same factor, and mean_cluster_size is the staffing number (an
    incident, once begun, runs 1/θ days). Needs ≥ 2 gaps; exact
    integer day gaps; shared moment expressions."""
    e = _daily_counts_sorted_days(sf_dir)
    d = e["d"].to_numpy(np.int64)
    yv = e["c"].to_numpy(np.int64)
    n = len(d)
    order = np.lexsort((d, yv))
    rk = np.empty(n, np.int64)
    rk[order] = np.arange(1, n + 1)
    cand = yv[10 * rk >= 8 * n]
    thr = int(cand.min())
    exd = np.sort(d[yv > thr])
    if len(exd) < 3:
        return pd.DataFrame(columns=[
            "n_exceed", "threshold", "max_gap_days", "theta",
            "mean_cluster_size", "small_gap_variant"])
    t = np.diff(exd).astype(np.float64)
    m = len(t)
    tmax = float(t.max())
    if tmax <= 2.0:
        theta = min(1.0, 2.0 * t.sum() ** 2 / (m * (t * t).sum()))
        variant = 1
    else:
        theta = min(1.0, 2.0 * (t - 1.0).sum() ** 2
                    / (m * ((t - 1.0) * (t - 2.0)).sum()))
        variant = 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_exceed": np.array([len(exd)], np.int64),
        "threshold": [float(rha(float(thr), 6))],
        "max_gap_days": np.array([int(tmax)], np.int64),
        "theta": [float(rha(theta, 6))],
        "mean_cluster_size": [float(rha(1.0 / theta, 6))],
        "small_gap_variant": np.array([variant], np.int64)})


def _daily_counts_sorted_days(sf_dir: str) -> pd.DataFrame:
    """(d, c) daily counts sorted by day."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"d": us // 86_400_000_000,
                             "c": np.ones(len(us), np.int64)})

    return reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)


@register("declustered_incident_rate", sql=f"""
WITH {_FS_SQL},
wd AS (SELECT CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS days
       FROM daily),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM ex)
SELECT ne.ne AS n_exceed_days, wd.days AS window_days,
       ROUND(CAST(ne.ne AS DOUBLE) / wd.days, 6) AS day_rate,
       ROUND(th.theta * ne.ne, 6) AS independent_incidents,
       ROUND(th.theta * ne.ne / wd.days, 6) AS incident_rate,
       ROUND(wd.days / (th.theta * ne.ne), 6)
           AS days_between_incidents,
       ROUND(CAST(wd.days AS DOUBLE) / ne.ne, 6)
           AS naive_days_between
FROM th, wd, ne""")
def declustered_incident_rate(sf_dir: str) -> pd.DataFrame:
    """The operational consequence of θ: the window's extreme days
    collapse to θ·N independent INCIDENTS, and the two recurrence
    numbers a capacity review confuses are printed side by side —
    naive_days_between (window/N: 'an extreme day every X days',
    what a threshold-alert count reports) and days_between_
    incidents (window/θN: how often a NEW episode actually
    begins). The gap between them is pure clustering: if extreme
    days come in 3-day runs, alerts fire 3× per genuine incident
    and the pager statistics triple-count — right-sizing on-call
    load and post-mortem cadence needs the θ-adjusted figure,
    while intra-incident staffing needs mean_cluster_size from
    the companion row. Same threshold, exceedance set and θ;
    exact integer day counts."""
    fs = ferro_segers_extremal_index(sf_dir)
    if len(fs) == 0:
        return pd.DataFrame(columns=[
            "n_exceed_days", "window_days", "day_rate",
            "independent_incidents", "incident_rate",
            "days_between_incidents", "naive_days_between"])
    e = _daily_counts_sorted_days(sf_dir)
    d = e["d"].to_numpy(np.int64)
    days = int(d.max() - d.min() + 1)
    ne = int(fs["n_exceed"].iloc[0])
    e2 = _daily_counts_sorted_days(sf_dir)
    yv = e2["c"].to_numpy(np.int64)
    n = len(yv)
    order = np.lexsort((e2["d"].to_numpy(np.int64), yv))
    rk = np.empty(n, np.int64)
    rk[order] = np.arange(1, n + 1)
    thr = int(yv[10 * rk >= 8 * n].min())
    exd = np.sort(e2["d"].to_numpy(np.int64)[yv > thr])
    t = np.diff(exd).astype(np.float64)
    m = len(t)
    tmax = float(t.max())
    if tmax <= 2.0:
        theta = min(1.0, 2.0 * t.sum() ** 2 / (m * (t * t).sum()))
    else:
        theta = min(1.0, 2.0 * (t - 1.0).sum() ** 2
                    / (m * ((t - 1.0) * (t - 2.0)).sum()))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_exceed_days": np.array([ne], np.int64),
        "window_days": np.array([days], np.int64),
        "day_rate": [float(rha(ne / days, 6))],
        "independent_incidents": [float(rha(theta * ne, 6))],
        "incident_rate": [float(rha(theta * ne / days, 6))],
        "days_between_incidents": [float(rha(
            days / (theta * ne), 6))],
        "naive_days_between": [float(rha(days / ne, 6))]})


# ---------------------------------------------------------------------------
# Canonical correlation: the daily demand block (views, clicks) vs
# the outcome block (purchases, errors)
# ---------------------------------------------------------------------------

def _cca_moments(sf_dir: str):
    """(n, Sxx, Sxy, Syy) centered cross-product matrices of the
    daily 4-vector (views, clicks | purchases, errors)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "d": us // 86_400_000_000,
            "x1": (et == "view").astype(np.int64),
            "x2": (et == "click").astype(np.int64),
            "y1": (et == "purchase").astype(np.int64),
            "y2": (et == "error").astype(np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {c: (c, "sum") for c in ["x1", "x2", "y1", "y2"]}) \
        .to_pandas().sort_values("d", ignore_index=True)
    lo, hi = int(e["d"].min()), int(e["d"].max())
    n = hi - lo + 1
    M = np.zeros((n, 4), np.float64)
    idx = e["d"].to_numpy(np.int64) - lo
    for j, c in enumerate(["x1", "x2", "y1", "y2"]):
        M[idx, j] = e[c].to_numpy(np.int64)
    Mc = M - M.sum(axis=0) / n
    S = Mc.T @ Mc
    return n, S[:2, :2], S[:2, 2:], S[2:, 2:]


def _cca_eigs(sxx, sxy, syy):
    """(M = Sxx⁻¹SxySyy⁻¹Syx, M' = Syy⁻¹SyxSxx⁻¹Sxy, λ+, λ−) via
    the explicit 2×2 adjugate in the oracle's operation order."""
    detx = sxx[0, 0] * sxx[1, 1] - sxx[0, 1] * sxx[0, 1]
    dety = syy[0, 0] * syy[1, 1] - syy[0, 1] * syy[0, 1]
    A = np.array([
        [(sxx[1, 1] * sxy[0, 0] - sxx[0, 1] * sxy[1, 0]) / detx,
         (sxx[1, 1] * sxy[0, 1] - sxx[0, 1] * sxy[1, 1]) / detx],
        [(sxx[0, 0] * sxy[1, 0] - sxx[0, 1] * sxy[0, 0]) / detx,
         (sxx[0, 0] * sxy[1, 1] - sxx[0, 1] * sxy[0, 1]) / detx]])
    B = np.array([
        [(syy[1, 1] * sxy[0, 0] - syy[0, 1] * sxy[0, 1]) / dety,
         (syy[1, 1] * sxy[1, 0] - syy[0, 1] * sxy[1, 1]) / dety],
        [(syy[0, 0] * sxy[0, 1] - syy[0, 1] * sxy[0, 0]) / dety,
         (syy[0, 0] * sxy[1, 1] - syy[0, 1] * sxy[1, 0]) / dety]])
    M = A @ B
    Mp = B @ A
    tr = M[0, 0] + M[1, 1]
    det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    disc = np.sqrt(max(tr * tr - 4.0 * det, 0.0))
    return M, Mp, (tr + disc) / 2.0, max((tr - disc) / 2.0, 0.0)


_CCA_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS x2,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS y1,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                           ELSE 0 END) AS BIGINT) AS y2
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT COALESCE(e.x1, 0) AS x1, COALESCE(e.x2, 0) AS x2,
             COALESCE(e.y1, 0) AS y1, COALESCE(e.y2, 0) AS y2
      FROM cal LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              SUM(CAST(x1 AS DOUBLE)) AS s1,
              SUM(CAST(x2 AS DOUBLE)) AS s2,
              SUM(CAST(y1 AS DOUBLE)) AS s3,
              SUM(CAST(y2 AS DOUBLE)) AS s4,
              SUM(CAST(x1 AS DOUBLE) * x1) AS s11,
              SUM(CAST(x1 AS DOUBLE) * x2) AS s12,
              SUM(CAST(x2 AS DOUBLE) * x2) AS s22,
              SUM(CAST(y1 AS DOUBLE) * y1) AS s33,
              SUM(CAST(y1 AS DOUBLE) * y2) AS s34,
              SUM(CAST(y2 AS DOUBLE) * y2) AS s44,
              SUM(CAST(x1 AS DOUBLE) * y1) AS s13,
              SUM(CAST(x1 AS DOUBLE) * y2) AS s14,
              SUM(CAST(x2 AS DOUBLE) * y1) AS s23,
              SUM(CAST(x2 AS DOUBLE) * y2) AS s24
       FROM g),
cm AS (SELECT n,
              s11 - s1 * s1 / n AS xx11, s12 - s1 * s2 / n AS xx12,
              s22 - s2 * s2 / n AS xx22,
              s33 - s3 * s3 / n AS yy11, s34 - s3 * s4 / n AS yy12,
              s44 - s4 * s4 / n AS yy22,
              s13 - s1 * s3 / n AS xy11, s14 - s1 * s4 / n AS xy12,
              s23 - s2 * s3 / n AS xy21, s24 - s2 * s4 / n AS xy22
       FROM mo),
ab AS (SELECT n, xx11, xx12, xx22, yy11, yy12, yy22,
              xy11, xy12, xy21, xy22,
              (xx22 * xy11 - xx12 * xy21)
                  / (xx11 * xx22 - xx12 * xx12) AS a11,
              (xx22 * xy12 - xx12 * xy22)
                  / (xx11 * xx22 - xx12 * xx12) AS a12,
              (xx11 * xy21 - xx12 * xy11)
                  / (xx11 * xx22 - xx12 * xx12) AS a21,
              (xx11 * xy22 - xx12 * xy12)
                  / (xx11 * xx22 - xx12 * xx12) AS a22,
              (yy22 * xy11 - yy12 * xy12)
                  / (yy11 * yy22 - yy12 * yy12) AS b11,
              (yy22 * xy21 - yy12 * xy22)
                  / (yy11 * yy22 - yy12 * yy12) AS b12,
              (yy11 * xy12 - yy12 * xy11)
                  / (yy11 * yy22 - yy12 * yy12) AS b21,
              (yy11 * xy22 - yy12 * xy21)
                  / (yy11 * yy22 - yy12 * yy12) AS b22
       FROM cm),
mm AS (SELECT *,
              a11 * b11 + a12 * b21 AS m11,
              a11 * b12 + a12 * b22 AS m12,
              a21 * b11 + a22 * b21 AS m21,
              a21 * b12 + a22 * b22 AS m22,
              b11 * a11 + b12 * a21 AS p11,
              b11 * a12 + b12 * a22 AS p12,
              b21 * a11 + b22 * a21 AS p21,
              b21 * a12 + b22 * a22 AS p22
       FROM ab),
ei AS (SELECT *,
              ((m11 + m22) + SQRT(GREATEST(
                  (m11 + m22) * (m11 + m22)
                  - 4.0 * (m11 * m22 - m12 * m21), 0.0))) / 2.0
                  AS l1,
              GREATEST(((m11 + m22) - SQRT(GREATEST(
                  (m11 + m22) * (m11 + m22)
                  - 4.0 * (m11 * m22 - m12 * m21), 0.0))) / 2.0,
                  0.0) AS l2
       FROM mm)"""


@register("cca_demand_outcome_daily", sql=f"""
WITH {_CCA_SQL}
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(SQRT(l1), 6) AS rho1,
       ROUND(SQRT(l2), 6) AS rho2,
       ROUND((1.0 - l1) * (1.0 - l2), 6) AS wilks_lambda,
       ROUND(-(n - 3.5) * LN((1.0 - l1) * (1.0 - l2)), 6)
           AS bartlett_chi2,
       CAST(CASE WHEN -(n - 3.5)
                      * LN((1.0 - l1) * (1.0 - l2)) > 9.487729
                 THEN 1 ELSE 0 END AS BIGINT) AS blocks_related
FROM ei""")
def cca_demand_outcome_daily(sf_dir: str) -> pd.DataFrame:
    """Canonical correlation between the daily DEMAND block
    (views, clicks) and OUTCOME block (purchases, errors): the
    largest correlation achievable between any linear combination
    of one block and any of the other — closed-form here because
    2×2 blocks make Sxx⁻¹SxySyy⁻¹Syx an explicit quadratic
    eigenproblem. The pairwise-correlation family (present, six
    pairs) can materially UNDERSTATE block coupling: if purchases
    track views−clicks (browse-without-buying intent), every
    single pairwise r is modest while ρ₁ is large — CCA finds the
    combination. ρ₂ is the residual second channel; Wilks' Λ with
    Bartlett's χ²₄ (−(n−(p+q+3)/2)lnΛ, 9.487 documented) tests
    the blocks' independence as a whole, one test replacing four
    marginally-read r's (the multiplicity discipline applied to
    the correlation matrix). Zero-filled calendar; 14 exact
    moments; the quadratic root is a shared expression."""
    n, sxx, sxy, syy = _cca_moments(sf_dir)
    _, _, l1, l2 = _cca_eigs(sxx, sxy, syy)
    wil = (1.0 - l1) * (1.0 - l2)
    bart = -(n - 3.5) * np.log(wil)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "rho1": [float(rha(np.sqrt(l1), 6))],
        "rho2": [float(rha(np.sqrt(l2), 6))],
        "wilks_lambda": [float(rha(wil, 6))],
        "bartlett_chi2": [float(rha(bart, 6))],
        "blocks_related": np.array(
            [1 if bart > 9.487729 else 0], np.int64)})


@register("cca_canonical_weights", sql=f"""
WITH {_CCA_SQL},
wv AS (SELECT *,
              CASE WHEN m12 = 0 AND l1 - m11 = 0 THEN 1.0
                   ELSE m12 END AS wr1,
              CASE WHEN m12 = 0 AND l1 - m11 = 0 THEN 0.0
                   ELSE l1 - m11 END AS wr2,
              CASE WHEN p12 = 0 AND l1 - p11 = 0 THEN 1.0
                   ELSE p12 END AS vr1,
              CASE WHEN p12 = 0 AND l1 - p11 = 0 THEN 0.0
                   ELSE l1 - p11 END AS vr2
       FROM ei),
nw AS (SELECT *,
              SQRT((wr1 * wr1 * xx11 + 2.0 * wr1 * wr2 * xx12
                    + wr2 * wr2 * xx22) / (n - 1.0)) AS wnorm,
              SQRT((vr1 * vr1 * yy11 + 2.0 * vr1 * vr2 * yy12
                    + vr2 * vr2 * yy22) / (n - 1.0)) AS vnorm
       FROM wv),
sg AS (SELECT *,
              CASE WHEN wr1 / wnorm < 0
                        OR (wr1 = 0 AND wr2 / wnorm < 0)
                   THEN -1.0 ELSE 1.0 END AS ws,
              CASE WHEN vr1 / vnorm < 0
                        OR (vr1 = 0 AND vr2 / vnorm < 0)
                   THEN -1.0 ELSE 1.0 END AS vs
       FROM nw),
fin AS (SELECT n, l1,
               ws * wr1 / wnorm AS w1, ws * wr2 / wnorm AS w2,
               vs * vr1 / vnorm AS v1, vs * vr2 / vnorm AS v2,
               xx11, xx12, xx22
        FROM sg)
SELECT ROUND(w1, 6) AS w_views, ROUND(w2, 6) AS w_clicks,
       ROUND(v1, 6) AS v_purchases, ROUND(v2, 6) AS v_errors,
       ROUND((xx11 * w1 + xx12 * w2) / (n - 1.0)
             / SQRT(xx11 / (n - 1.0)), 6) AS load_views,
       ROUND((xx12 * w1 + xx22 * w2) / (n - 1.0)
             / SQRT(xx22 / (n - 1.0)), 6) AS load_clicks,
       ROUND((POW((xx11 * w1 + xx12 * w2) / (n - 1.0)
                  / SQRT(xx11 / (n - 1.0)), 2)
              + POW((xx12 * w1 + xx22 * w2) / (n - 1.0)
                    / SQRT(xx22 / (n - 1.0)), 2)) / 2.0 * l1, 6)
           AS redundancy_x
FROM fin""")
def cca_canonical_weights(sf_dir: str) -> pd.DataFrame:
    """The first canonical DIRECTIONS behind ρ₁, with the sign and
    scale pinned (unit sample variance of each variate; leading
    nonzero weight positive — canonical weights are otherwise
    defined only up to sign/scale, so the convention is part of
    the contract). The weights are the interpretation ρ₁ alone
    withholds: w ≈ (+, −) on (views, clicks) says the demand
    combination that best predicts outcomes is views-minus-clicks
    (unconverted browsing); v's sign pattern on (purchases,
    errors) says whether that intent resolves into buying or
    breakage. Loadings (correlations of each raw variable with
    the variate) guard against the classic weights-vs-loadings
    misread under collinearity — a variable can carry a large
    weight yet a small loading when it acts as a suppressor — and
    redundancy_x = mean squared loading × ρ₁² is the honest
    'share of block variance the other block explains', the
    number naive readers think ρ₁² is. Eigenvector via the
    (m12, λ−m11) row with the degenerate fallback pinned."""
    n, sxx, sxy, syy = _cca_moments(sf_dir)
    M, Mp, l1, _ = _cca_eigs(sxx, sxy, syy)

    def direction(Mat, S):
        wr = np.array([Mat[0, 1], l1 - Mat[0, 0]])
        if wr[0] == 0 and wr[1] == 0:
            wr = np.array([1.0, 0.0])
        norm = np.sqrt((wr @ S @ wr) / (n - 1.0))
        w = wr / norm
        if w[0] < 0 or (wr[0] == 0 and w[1] < 0):
            w = -w
        return w

    w = direction(M, sxx)
    v = direction(Mp, syy)
    lv = (sxx @ w) / (n - 1.0) \
        / np.sqrt(np.diag(sxx) / (n - 1.0))
    red = float((lv ** 2).mean()) * l1
    rha = textstats.round_half_away
    return pd.DataFrame({
        "w_views": [float(rha(w[0], 6))],
        "w_clicks": [float(rha(w[1], 6))],
        "v_purchases": [float(rha(v[0], 6))],
        "v_errors": [float(rha(v[1], 6))],
        "load_views": [float(rha(lv[0], 6))],
        "load_clicks": [float(rha(lv[1], 6))],
        "redundancy_x": [float(rha(red, 6))]})


# ---------------------------------------------------------------------------
# Net dollar retention: the SaaS waterfall applied to weekly user
# value
# ---------------------------------------------------------------------------

#: per-(user, week) value cents with adjacent-week pairs per user
#: (weeks are epoch-day // 7, documented).
_NDR_SQL = """
uw AS (SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS w,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                   AS BIGINT) AS c
       FROM events GROUP BY 1, 2),
pairs AS (SELECT a.w AS w0, a.user_id, a.c AS c0,
                 COALESCE(b.c, 0) AS c1
          FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id
                                  AND b.w = a.w + 1
          WHERE a.w < (SELECT MAX(w) FROM uw))"""


def _ndr_pairs(sf_dir: str) -> pd.DataFrame:
    """(w0, user_id, c0, c1) adjacent-week value pairs."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "w": us // 86_400_000_000 // 7,
            "c": np.rint(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    uw = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "w"], {"c": ("c", "sum")}).to_pandas()
    wmax = int(uw["w"].max())
    a = uw[uw["w"] < wmax].rename(columns={"w": "w0", "c": "c0"})
    b = uw.rename(columns={"c": "c1"})
    b = b.assign(w0=b["w"] - 1)[["user_id", "w0", "c1"]]
    p = a.merge(b, on=["user_id", "w0"], how="left")
    p["c1"] = p["c1"].fillna(0).astype(np.int64)
    return p[["w0", "user_id", "c0", "c1"]]


@register("net_dollar_retention_weekly", sql=f"""
WITH {_NDR_SQL},
ag AS (SELECT w0,
              CAST(COUNT(*) AS BIGINT) AS base_users,
              CAST(SUM(c0) AS BIGINT) AS base_c,
              CAST(SUM(c1) AS BIGINT) AS next_c,
              CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS kept_c
       FROM pairs GROUP BY 1)
SELECT CAST(w0 AS BIGINT) AS week, base_users,
       ROUND(base_c / 100.0, 2) AS base_value,
       ROUND(next_c / 100.0, 2) AS next_value,
       ROUND(CAST(next_c AS DOUBLE) / base_c * 100.0, 6)
           AS ndr_pct,
       ROUND(CAST(kept_c AS DOUBLE) / base_c * 100.0, 6)
           AS grr_pct
FROM ag ORDER BY w0""")
def net_dollar_retention_weekly(sf_dir: str) -> pd.DataFrame:
    """Net and gross dollar retention per adjacent week pair: for
    the cohort of users with any value in week w, their value in
    w+1 as a share of their week-w value (NDR — expansion can push
    it over 100%) and the per-user min(c₀, c₁) share (GRR — the
    expansion-blind floor; per-user capping is what separates it
    from NDR, and the gap between the two columns IS the
    expansion). The retention family (present) counts USERS; these
    weight by dollars, and the two diverge exactly when churn is
    value-skewed — 95% user retention with 60% GRR means the
    whales are the ones leaving, the single most actionable churn
    read there is. Weeks are epoch-day//7 (documented — no
    partial-week ISO subtleties); all arithmetic exact integer
    cents; new users in w+1 are by construction excluded (NDR is
    a same-cohort measure, acquisition lives elsewhere)."""
    p = _ndr_pairs(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for w0, g in p.groupby("w0"):
        c0 = g["c0"].to_numpy(np.int64)
        c1 = g["c1"].to_numpy(np.int64)
        base = int(c0.sum())
        nxt = int(c1.sum())
        kept = int(np.minimum(c0, c1).sum())
        rows.append((int(w0), len(g),
                     float(rha(base / 100.0, 2)),
                     float(rha(nxt / 100.0, 2)),
                     float(rha(nxt / base * 100.0, 6)),
                     float(rha(kept / base * 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "week", "base_users", "base_value", "next_value",
        "ndr_pct", "grr_pct"]).astype({
            "week": np.int64, "base_users": np.int64}) \
        .sort_values("week", ignore_index=True)


@register("ndr_waterfall_split", sql=f"""
WITH {_NDR_SQL},
cl AS (SELECT c0, c1,
              CASE WHEN c1 = 0 THEN 'churned'
                   WHEN c1 < c0 THEN 'contracted'
                   WHEN c1 = c0 THEN 'flat'
                   ELSE 'expanded' END AS bucket
       FROM pairs),
tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS base FROM cl)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS user_weeks,
       ROUND(CAST(SUM(c0) AS DOUBLE)
             / (SELECT base FROM tot) * 100.0, 6)
           AS base_share_pct,
       ROUND(CAST(SUM(c1) - SUM(c0) AS DOUBLE)
             / (SELECT base FROM tot) * 100.0, 6)
           AS ndr_contribution_pct
FROM cl GROUP BY 1 ORDER BY bucket""")
def ndr_waterfall_split(sf_dir: str) -> pd.DataFrame:
    """The NDR waterfall pooled over all adjacent-week user pairs:
    each user-week classified churned / contracted / flat /
    expanded, with the share of base value each bucket holds and
    its signed CONTRIBUTION to NDR−100% (the buckets' columns sum
    to the pooled NDR minus 100 by construction — an identity a
    reader can check on the output). This is the decomposition
    the single NDR number hides: NDR 98% from '3% churn, no
    movement otherwise' (a leak — plug retention) and NDR 98%
    from '20% churn offset by 17% expansion' (an engine —
    concentrate on the expanders' playbook) demand opposite
    strategies, and base_share_pct says whether the churned
    bucket is many small users or few large ones. Same exact
    cents; bucket rule pinned on integer comparisons so both
    engines classify identically."""
    p = _ndr_pairs(sf_dir)
    c0 = p["c0"].to_numpy(np.int64)
    c1 = p["c1"].to_numpy(np.int64)
    base = int(c0.sum())
    bucket = np.where(c1 == 0, "churned",
                      np.where(c1 < c0, "contracted",
                               np.where(c1 == c0, "flat",
                                        "expanded")))
    rha = textstats.round_half_away
    rows = []
    for b in sorted(set(bucket)):
        m = bucket == b
        rows.append((b, int(m.sum()),
                     float(rha(int(c0[m].sum()) / base * 100.0,
                               6)),
                     float(rha((int(c1[m].sum())
                                - int(c0[m].sum()))
                               / base * 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "bucket", "user_weeks", "base_share_pct",
        "ndr_contribution_pct"]).astype({"user_weeks": np.int64})


# ---------------------------------------------------------------------------
# Anytime-valid inference: the Beta(1/2,1/2) e-value for the weekend
# purchase share + the e-process trajectory
# ---------------------------------------------------------------------------

#: cumulative-by-day weekend/total purchase counts and the
#: calendar-exact null share p0.
_EPROC_SQL = """
p AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS wkd
      FROM events WHERE event_type = 'purchase'),
w AS (SELECT MIN(d) AS lo, MAX(d) AS hi
      FROM (SELECT epoch_us(ts) // 86400000000 AS d FROM events)),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM w),
p0 AS (SELECT SUM(CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1.0
                       ELSE 0 END) / COUNT(*) AS p
       FROM cal),
dd AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(wkd) AS BIGINT) AS x
       FROM p GROUP BY 1),
cum AS (SELECT d,
               CAST(SUM(n) OVER (ORDER BY d) AS BIGINT) AS n,
               CAST(SUM(x) OVER (ORDER BY d) AS BIGINT) AS x
        FROM dd),
ev AS (SELECT cum.d, cum.n, cum.x,
              (lgamma(cum.x + 0.5) + lgamma(cum.n - cum.x + 0.5)
               - lgamma(cum.n + 1.0) - lgamma(0.5) - lgamma(0.5)
               + lgamma(1.0))
              - (cum.x * LN(p0.p)
                 + (cum.n - cum.x) * LN(1.0 - p0.p)) AS lne
       FROM cum, p0)"""


def _eprocess(sf_dir: str):
    """(days, cum n, cum x, ln E_t, p0) of the weekend-share
    e-process."""
    from math import lgamma
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        pur = df["event_type"].to_numpy() == "purchase"
        wkd = np.isin((d + 4) % 7, (0, 6))
        return pd.DataFrame({
            "d": d, "lo": d, "hi": d,
            "n": pur.astype(np.int64),
            "x": (pur & wkd).astype(np.int64)})

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"n": ("n", "sum"), "x": ("x", "sum"),
                "lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas().sort_values("d", ignore_index=True)
    lo = int(g["lo"].min())
    hi = int(g["hi"].max())
    days = np.arange(lo, hi + 1, dtype=np.int64)
    p0 = float(np.isin((days + 4) % 7, (0, 6)).sum()) / len(days)
    g = g[g["n"] > 0]
    d = g["d"].to_numpy(np.int64)
    n = np.cumsum(g["n"].to_numpy(np.int64))
    x = np.cumsum(g["x"].to_numpy(np.int64))
    lg = np.vectorize(lgamma)
    lne = (lg(x + 0.5) + lg(n - x + 0.5) - lg(n + 1.0)
           - lgamma(0.5) - lgamma(0.5) + lgamma(1.0)) \
        - (x * np.log(p0) + (n - x) * np.log(1.0 - p0))
    return d, n, x, lne, p0


@register("evalue_weekend_purchase", sql=f"""
WITH {_EPROC_SQL},
fin AS (SELECT n, x, lne FROM ev
        ORDER BY d DESC LIMIT 1)
SELECT n AS n_purchases, x AS weekend_purchases,
       ROUND((SELECT p FROM p0), 6) AS null_share,
       ROUND(lne / LN(10.0), 6) AS log10_e,
       ROUND(LEAST(EXP(-lne), 1.0), 6) AS anytime_p,
       CAST(CASE WHEN lne > LN(20.0) THEN 1 ELSE 0 END AS BIGINT)
           AS rejected_e20
FROM fin""")
def evalue_weekend_purchase(sf_dir: str) -> pd.DataFrame:
    """The e-value for the weekend purchase share: the Beta(½,½)
    mixture martingale E = BetaBinom(x; n)/Binom(x; n, p₀) — the
    modern third way in this registry's peeking family. The fixed
    z-test is only valid at ONE pre-registered look; O'Brien–
    Fleming (present) patches a FINITE schedule of looks; the
    e-value is valid at EVERY stopping time by Ville's inequality
    (P(sup E ≥ 1/α) ≤ α), so anytime_p = min(1, 1/E) can be read
    continuously forever with no schedule at all — and unlike the
    Bayesian row's posterior probability it carries a frequentist
    type-I guarantee. E ≥ 20 (anytime p ≤ 0.05, documented) is
    the safe-reject line. Jeffreys Beta(½,½) mixture in closed
    lgamma form; p₀ from calendar-day exposure exactly as the
    C-test row."""
    d, n, x, lne, p0 = _eprocess(sf_dir)
    rha = textstats.round_half_away
    le = float(lne[-1])
    return pd.DataFrame({
        "n_purchases": np.array([int(n[-1])], np.int64),
        "weekend_purchases": np.array([int(x[-1])], np.int64),
        "null_share": [float(rha(p0, 6))],
        "log10_e": [float(rha(le / np.log(10.0), 6))],
        "anytime_p": [float(rha(min(np.exp(-le), 1.0), 6))],
        "rejected_e20": np.array(
            [1 if le > np.log(20.0) else 0], np.int64)})


@register("eprocess_trajectory_weekend", sql=f"""
WITH {_EPROC_SQL},
mx AS (SELECT d, lne FROM ev
       ORDER BY ROUND(lne, 9) DESC, d LIMIT 1),
fin AS (SELECT lne FROM ev ORDER BY d DESC LIMIT 1),
ab AS (SELECT CAST(SUM(CASE WHEN lne > LN(20.0) THEN 1 ELSE 0 END)
                   AS BIGINT) AS days_above
       FROM ev),
n0 AS (SELECT CAST(MIN(d) AS BIGINT) AS d0 FROM ev)
SELECT CAST(mx.d - n0.d0 + 1 AS BIGINT) AS peak_day_index,
       ROUND(mx.lne / LN(10.0), 6) AS peak_log10_e,
       ROUND((SELECT lne FROM fin) / LN(10.0), 6) AS final_log10_e,
       ROUND((mx.lne - (SELECT lne FROM fin)) / LN(10.0), 6)
           AS log10_peak_minus_final,
       ab.days_above AS days_above_e20
FROM mx, ab, n0""")
def eprocess_trajectory_weekend(sf_dir: str) -> pd.DataFrame:
    """The e-process TRAJECTORY summarized: where the evidence
    peaked, where it ended, the peak/final ratio, and how many
    days sat above the E = 20 line. This is the anytime claim
    made concrete: unlike the cumulative z-path (present), whose
    mid-window excursions are exactly the false alarms the
    peeking audit counts, ANY day this process crossed 20 was a
    legitimate stopping day — days_above_e20 > 0 with final
    below 20 means a sequential experimenter could have validly
    stopped and declared, while the fixed-sample analyst cannot
    (the price of never stopping). log10_peak_minus_final is
    the gambler's regret — the decades of evidence-capital the
    martingale gave back after its high-water mark; a large value marks an
    effect that faded (early-window novelty), the temporal read
    a single final e-value hides. Peak argmax rounds 9dp with
    earliest-day ties."""
    d, n, x, lne, p0 = _eprocess(sf_dir)
    rha = textstats.round_half_away
    lk = rha(lne, 9)
    order = sorted(range(len(d)), key=lambda i: (-lk[i], d[i]))
    pk = order[0]
    le_fin = float(lne[-1])
    return pd.DataFrame({
        "peak_day_index": np.array([int(d[pk] - d[0] + 1)],
                                   np.int64),
        "peak_log10_e": [float(rha(lne[pk] / np.log(10.0), 6))],
        "final_log10_e": [float(rha(le_fin / np.log(10.0), 6))],
        "log10_peak_minus_final": [float(rha(
            (lne[pk] - le_fin) / np.log(10.0), 6))],
        "days_above_e20": np.array(
            [int((lne > np.log(20.0)).sum())], np.int64)})


# ---------------------------------------------------------------------------
# Conversion technology: Cobb–Douglas purchases ~ views^a · clicks^b
# with the constant-returns test + TFP drift
# ---------------------------------------------------------------------------

#: log panel on days where all three series are positive, plus the
#: 3-parameter OLS moments (const, ln views, ln clicks).
_CD_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
lg AS (SELECT d, LN(CAST(v AS DOUBLE)) AS u1,
              LN(CAST(c AS DOUBLE)) AS u2,
              LN(CAST(y AS DOUBLE)) AS yy
       FROM e WHERE v > 0 AND c > 0 AND y > 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(u1) AS s1, SUM(u2) AS s2,
             SUM(u1 * u1) AS s11, SUM(u1 * u2) AS s12,
             SUM(u2 * u2) AS s22,
             SUM(yy) AS t0, SUM(u1 * yy) AS t1,
             SUM(u2 * yy) AS t2, SUM(yy * yy) AS ty2
      FROM lg),
dv AS (SELECT n, t0, t1, t2, ty2, s1, s2, s11, s12, s22,
              n * (s11 * s22 - s12 * s12)
              - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2) AS det,
              t0 * (s11 * s22 - s12 * s12)
              - s1 * (t1 * s22 - t2 * s12)
              + s2 * (t1 * s12 - t2 * s11) AS det0,
              n * (t1 * s22 - t2 * s12)
              - t0 * (s1 * s22 - s2 * s12)
              + s2 * (s1 * t2 - s2 * t1) AS det1,
              n * (s11 * t2 - s12 * t1)
              - s1 * (s1 * t2 - s2 * t1)
              + t0 * (s1 * s12 - s11 * s2) AS det2
       FROM m),
fit AS (SELECT n, det0 / det AS c0, det1 / det AS a,
               det2 / det AS b,
               ty2 - (det0 / det) * t0 - (det1 / det) * t1
                   - (det2 / det) * t2 AS ssr_u,
               ty2 - t0 * t0 / n AS sst,
               t0, t1, t2, s1, s2, s11, s12, s22
        FROM dv WHERE det != 0),
rs AS (SELECT fit.*,
              (SELECT SUM((lg.yy - lg.u2)
                          * (lg.u1 - lg.u2)) FROM lg)
              - (SELECT SUM(lg.yy - lg.u2) FROM lg)
                * (SELECT SUM(lg.u1 - lg.u2) FROM lg) / n AS czw,
              (SELECT SUM((lg.u1 - lg.u2) * (lg.u1 - lg.u2))
               FROM lg)
              - (SELECT SUM(lg.u1 - lg.u2) FROM lg)
                * (SELECT SUM(lg.u1 - lg.u2) FROM lg) / n AS cww,
              (SELECT SUM((lg.yy - lg.u2) * (lg.yy - lg.u2))
               FROM lg)
              - (SELECT SUM(lg.yy - lg.u2) FROM lg)
                * (SELECT SUM(lg.yy - lg.u2) FROM lg) / n AS czz
       FROM fit)"""


def _cd_fit(sf_dir: str):
    """(n, c0, a, b, ssr_u, sst, ssr_r, log-panel arrays)."""
    g = _dayvec(sf_dir)
    v = g["x"].to_numpy(np.int64)
    c = g["y"].to_numpy(np.int64)
    y = g["z"].to_numpy(np.int64)
    keep = (v > 0) & (c > 0) & (y > 0)
    u1 = np.log(v[keep].astype(np.float64))
    u2 = np.log(c[keep].astype(np.float64))
    yy = np.log(y[keep].astype(np.float64))
    d = g["d"].to_numpy(np.int64)[keep]
    n = len(u1)
    s1, s2 = u1.sum(), u2.sum()
    s11, s12 = (u1 * u1).sum(), (u1 * u2).sum()
    s22 = (u2 * u2).sum()
    t0, t1, t2 = yy.sum(), (u1 * yy).sum(), (u2 * yy).sum()
    ty2 = (yy * yy).sum()
    det = n * (s11 * s22 - s12 * s12) \
        - s1 * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s12 - s11 * s2)
    det0 = t0 * (s11 * s22 - s12 * s12) \
        - s1 * (t1 * s22 - t2 * s12) \
        + s2 * (t1 * s12 - t2 * s11)
    det1 = n * (t1 * s22 - t2 * s12) \
        - t0 * (s1 * s22 - s2 * s12) \
        + s2 * (s1 * t2 - s2 * t1)
    det2 = n * (s11 * t2 - s12 * t1) \
        - s1 * (s1 * t2 - s2 * t1) \
        + t0 * (s1 * s12 - s11 * s2)
    c0, a, b = det0 / det, det1 / det, det2 / det
    ssr_u = ty2 - c0 * t0 - a * t1 - b * t2
    sst = ty2 - t0 * t0 / n
    z = yy - u2
    w = u1 - u2
    czw = (z * w).sum() - z.sum() * w.sum() / n
    cww = (w * w).sum() - w.sum() ** 2 / n
    czz = (z * z).sum() - z.sum() ** 2 / n
    ssr_r = czz - czw * czw / cww
    return (n, c0, a, b, ssr_u, sst, ssr_r, d, u1, u2, yy)


@register("cobb_douglas_conversion", sql=f"""
WITH {_CD_SQL}
SELECT n AS n_days,
       ROUND(a, 6) AS alpha_views,
       ROUND(b, 6) AS beta_clicks,
       ROUND(a + b, 6) AS returns_to_scale,
       ROUND(1.0 - ssr_u / sst, 6) AS r2,
       ROUND(((czz - czw * czw / cww) - ssr_u)
             / (ssr_u / (n - 3.0)), 6) AS f_crs,
       CAST(CASE WHEN ((czz - czw * czw / cww) - ssr_u)
                      / (ssr_u / (n - 3.0)) > 3.97
                 THEN 1 ELSE 0 END AS BIGINT) AS crs_rejected
FROM rs""")
def cobb_douglas_conversion(sf_dir: str) -> pd.DataFrame:
    """Cobb–Douglas conversion technology: purchases ~ views^α ·
    clicks^β on the daily log panel (days with all three positive,
    documented), with the constant-returns-to-scale restriction
    α + β = 1 tested by the exact restriction F (the restricted
    model collapses to the single-regressor ln(y/c) ~ ln(v/c), so
    both SSRs are closed-form). RTS is the scaling law every
    growth plan implicitly assumes: α+β ≈ 1 means doubling
    traffic doubles purchases (the linear extrapolation in every
    forecast deck is fine); α+β < 1 is diminishing conversion at
    scale (marginal traffic is worse traffic — paid acquisition
    will underdeliver its spreadsheet); > 1 is the
    network-effect/virality regime. α vs β also ranks the
    funnel's binding input. F against ~3.97 (F(1,60) order,
    documented as the reference point); 3×3 adjugate and centered
    restricted moments shared with the oracle."""
    (n, c0, a, b, ssr_u, sst, ssr_r, *_ ) = _cd_fit(sf_dir)
    f = (ssr_r - ssr_u) / (ssr_u / (n - 3.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "alpha_views": [float(rha(a, 6))],
        "beta_clicks": [float(rha(b, 6))],
        "returns_to_scale": [float(rha(a + b, 6))],
        "r2": [float(rha(1.0 - ssr_u / sst, 6))],
        "f_crs": [float(rha(f, 6))],
        "crs_rejected": np.array([1 if f > 3.97 else 0],
                                 np.int64)})


@register("cobb_douglas_tfp_drift", sql=f"""
WITH {_CD_SQL},
res AS (SELECT lg.d,
               lg.yy - rs.c0 - rs.a * lg.u1 - rs.b * lg.u2 AS e
        FROM lg, rs),
ix AS (SELECT e, CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE)
           AS t
       FROM res),
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(t) AS st, SUM(e) AS se,
              SUM(t * t) AS stt, SUM(t * e) AS ste,
              SUM(e * e) AS see
       FROM ix),
sl AS (SELECT n,
              (n * ste - st * se) / (n * stt - st * st) AS b,
              (see - se * se / n
               - ((n * ste - st * se) / (n * stt - st * st))
                 * (ste - st * se / n)) / (n - 2.0)
                  / (stt - st * st / n) AS se2
       FROM tr)
SELECT n AS n_days,
       ROUND((EXP(b) - 1.0) * 100.0, 6) AS tfp_growth_pct_day,
       ROUND(b / SQRT(se2), 6) AS trend_t,
       CAST(CASE WHEN ABS(b / SQRT(se2)) > 1.96 THEN 1 ELSE 0 END
            AS BIGINT) AS drifting
FROM sl""")
def cobb_douglas_tfp_drift(sf_dir: str) -> pd.DataFrame:
    """The Solow residual of the conversion technology: e_t = ln y
    − fitted, the day's conversion EFFICIENCY net of both volume
    inputs, regressed on time. This is the question raw
    purchases-per-view trends cannot answer — purchases can grow
    solely because traffic grew (moving along the production
    function), while TFP drift is the function itself shifting:
    tfp_growth_pct_day > 0 with significance says the product
    converts better at equal traffic than it used to (UX wins,
    pricing, mix), the cleanest product-improvement KPI in the
    registry because the Cobb–Douglas fit absorbs the scale
    effects that contaminate every ratio trend. iid slope SE
    (documented — the Newey–West row shows how to harden it);
    residuals from the shared fit, time index over qualifying
    days."""
    (n, c0, a, b, ssr_u, sst, ssr_r, d, u1, u2, yy) = \
        _cd_fit(sf_dir)
    e = yy - c0 - a * u1 - b * u2
    t = np.arange(1, n + 1, dtype=np.float64)
    st, se = t.sum(), e.sum()
    stt, ste = (t * t).sum(), (t * e).sum()
    see = (e * e).sum()
    bs = (n * ste - st * se) / (n * stt - st * st)
    se2 = (see - se * se / n - bs * (ste - st * se / n)) \
        / (n - 2.0) / (stt - st * st / n)
    tt = bs / np.sqrt(se2)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "tfp_growth_pct_day": [float(rha(
            (np.exp(bs) - 1.0) * 100.0, 6))],
        "trend_t": [float(rha(tt, 6))],
        "drifting": np.array([1 if abs(tt) > 1.96 else 0],
                             np.int64)})


# ---------------------------------------------------------------------------
# Distributional source similarity: pairwise Jensen–Shannon + the
# JSD-vs-Jaccard disagreement audit
# ---------------------------------------------------------------------------

def _source_pair_stats(sf_dir: str) -> pd.DataFrame:
    """Per source pair (a < b): JSD in bits (exact, no smoothing —
    zero-frequency words contribute their ½·p·ln2 mass via the
    identity) and vocabulary Jaccard. Pairs are bounded by
    sources²; the word reduce is the same (source, word, n) the
    vocab-Jaccard row rides."""
    c = _source_word_counts(sf_dir).to_pandas()
    tot = c.groupby("source")["y"].sum()
    piv = {}
    for src, g in c.groupby("source"):
        piv[src] = dict(zip(g["word"],
                            g["y"].astype(np.int64)))
    srcs = sorted(piv)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            pa, pb = piv[a], piv[b]
            ta, tb = float(tot[a]), float(tot[b])
            shared = set(pa) & set(pb)
            sa = sb = 0.0
            shared_pa = shared_pb = 0.0
            for wd in sorted(shared):
                p = pa[wd] / ta
                qv = pb[wd] / tb
                sa += p * np.log(2.0 * p / (p + qv))
                sb += qv * np.log(2.0 * qv / (p + qv))
                shared_pa += p
                shared_pb += qv
            jsd = 0.5 * (sa + sb) \
                + 0.5 * np.log(2.0) * ((1.0 - shared_pa)
                                       + (1.0 - shared_pb))
            jac = len(shared) / len(set(pa) | set(pb))
            rows.append((a, b, jsd / np.log(2.0), jac))
    return pd.DataFrame(rows, columns=["a", "b", "jsd_bits",
                                       "jaccard"])


_JSD_SQL = r"""
w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
          AS word
      FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM c GROUP BY 1),
sh AS (SELECT a.source AS sa, b.source AS sb,
              SUM((CAST(a.n AS DOUBLE) / ta.tot)
                  * LN(2.0 * (CAST(a.n AS DOUBLE) / ta.tot)
                       / (CAST(a.n AS DOUBLE) / ta.tot
                          + CAST(b.n AS DOUBLE) / tb.tot))) AS la,
              SUM((CAST(b.n AS DOUBLE) / tb.tot)
                  * LN(2.0 * (CAST(b.n AS DOUBLE) / tb.tot)
                       / (CAST(a.n AS DOUBLE) / ta.tot
                          + CAST(b.n AS DOUBLE) / tb.tot))) AS lb,
              SUM(CAST(a.n AS DOUBLE) / ta.tot) AS ma,
              SUM(CAST(b.n AS DOUBLE) / tb.tot) AS mb,
              CAST(COUNT(*) AS BIGINT) AS nshared
       FROM c a JOIN c b ON b.word = a.word
                        AND a.source < b.source
                JOIN t ta ON ta.source = a.source
                JOIN t tb ON tb.source = b.source
       GROUP BY 1, 2),
pr AS (SELECT sh.sa, sh.sb,
              (0.5 * (sh.la + sh.lb)
               + 0.5 * LN(2.0) * ((1.0 - sh.ma)
                                  + (1.0 - sh.mb))) / LN(2.0)
                  AS jsd_bits,
              CAST(sh.nshared AS DOUBLE)
                  / (ta.v + tb.v - sh.nshared) AS jaccard
       FROM sh JOIN t ta ON ta.source = sh.sa
               JOIN t tb ON tb.source = sh.sb)"""


@register("source_jsd_extreme_pairs", sql=f"""
WITH {_JSD_SQL},
cl AS (SELECT 'closest' AS kind, sa, sb, jsd_bits, jaccard,
              ROW_NUMBER() OVER (ORDER BY ROUND(jsd_bits, 9),
                                 sa, sb) AS rnk
       FROM pr),
fa AS (SELECT 'farthest' AS kind, sa, sb, jsd_bits, jaccard,
              ROW_NUMBER() OVER (ORDER BY ROUND(jsd_bits, 9) DESC,
                                 sa, sb) AS rnk
       FROM pr)
SELECT kind, CAST(rnk AS BIGINT) AS rnk,
       sa AS source_a, sb AS source_b,
       ROUND(jsd_bits, 6) AS jsd_bits,
       ROUND(jaccard, 6) AS vocab_jaccard
FROM (SELECT * FROM cl WHERE rnk <= 3
      UNION ALL SELECT * FROM fa WHERE rnk <= 3)
ORDER BY kind, rnk""")
def source_jsd_extreme_pairs(sf_dir: str) -> pd.DataFrame:
    """The three closest and three farthest source pairs by
    Jensen–Shannon divergence between their word DISTRIBUTIONS
    (bits; exact — a word one source lacks contributes its ½p·ln2
    mass through the JSD identity, so no smoothing convention
    leaks into the number). The set-based vocab Jaccard (present)
    sees which words exist; JSD sees how they're USED — the
    dedup/mixture planner's question, since two sources can share
    90% of vocabulary yet serve disjoint registers. Closest pairs
    are the merge/dedup candidates (near-identical distributions
    mean marginal diversity value); farthest pairs anchor the
    mixture's diversity. JSD's boundedness (≤ 1 bit) makes the
    numbers comparable across any corpus; Jaccard is printed
    beside for the contrast the audit row formalizes. 9dp
    rankings with lexicographic ties; sources²-bounded pair
    loop over the shared word reduce."""
    p = _source_pair_stats(sf_dir)
    rha = textstats.round_half_away
    p = p.assign(k=rha(p["jsd_bits"].to_numpy(), 9))
    cl = p.sort_values(["k", "a", "b"], kind="mergesort").head(3)
    fa = p.sort_values(["k", "a", "b"],
                       ascending=[False, True, True],
                       kind="mergesort").head(3)
    rows = []
    for kind, sub in [("closest", cl), ("farthest", fa)]:
        for r, (_, row) in enumerate(sub.iterrows(), 1):
            rows.append((kind, r, row["a"], row["b"],
                         float(rha(row["jsd_bits"], 6)),
                         float(rha(row["jaccard"], 6))))
    return pd.DataFrame(rows, columns=[
        "kind", "rnk", "source_a", "source_b", "jsd_bits",
        "vocab_jaccard"]).astype({"rnk": np.int64})


@register("jsd_jaccard_disagreement", sql=f"""
WITH {_JSD_SQL},
xy AS (SELECT sa, sb, jsd_bits, jaccard,
              jsd_bits - (1.0 - jaccard) AS dis
       FROM pr),
rk AS (SELECT RANK() OVER (ORDER BY jsd_bits)
              + (COUNT(*) OVER (PARTITION BY jsd_bits) - 1) / 2.0
                  AS rx,
              RANK() OVER (ORDER BY 1.0 - jaccard)
              + (COUNT(*) OVER (PARTITION BY jaccard) - 1) / 2.0
                  AS ry
       FROM xy),
sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              (COUNT(*) * SUM(rx * ry) - SUM(rx) * SUM(ry))
              / SQRT((COUNT(*) * SUM(rx * rx)
                      - SUM(rx) * SUM(rx))
                     * (COUNT(*) * SUM(ry * ry)
                        - SUM(ry) * SUM(ry))) AS rho
       FROM rk),
mx AS (SELECT sa, sb, jsd_bits, jaccard, dis FROM xy
       ORDER BY ROUND(dis, 9) DESC, sa, sb LIMIT 1)
SELECT sp.n AS n_pairs,
       ROUND(sp.rho, 6) AS spearman_jsd_vs_setdist,
       mx.sa AS top_source_a, mx.sb AS top_source_b,
       ROUND(mx.jaccard, 6) AS top_jaccard,
       ROUND(mx.jsd_bits, 6) AS top_jsd_bits,
       ROUND(mx.dis, 6) AS top_disagreement
FROM sp, mx""")
def jsd_jaccard_disagreement(sf_dir: str) -> pd.DataFrame:
    """The audit closing the set-vs-distribution gap: Spearman
    between JSD and set distance (1 − Jaccard) across all source
    pairs, plus the pair where usage divergence most EXCEEDS what
    vocabulary overlap predicts (both measures live in [0, 1], so
    dis = jsd_bits − (1−J) is a like-for-like excess). ρ ≈ 1 says
    the cheap set measure is a safe proxy and the expensive
    distributional pass can be skipped at scale; the top-
    disagreement pair is the counterexample worth reading
    regardless — same words, different registers (shared
    vocabulary deployed at wildly different rates: template text
    vs prose built from the same tokens), which is exactly the
    pair a dedup keyed on vocabulary overlap would wrongly
    merge. Average ranks as everywhere; 9dp argmax with
    lexicographic ties."""
    p = _source_pair_stats(sf_dir)
    x = p["jsd_bits"].to_numpy(np.float64)
    jac = p["jaccard"].to_numpy(np.float64)
    y = 1.0 - jac
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    n = len(x)
    rho = (n * (rx * ry).sum() - rx.sum() * ry.sum()) \
        / np.sqrt((n * (rx * rx).sum() - rx.sum() ** 2)
                  * (n * (ry * ry).sum() - ry.sum() ** 2))
    dis = x - y
    rha = textstats.round_half_away
    dk = rha(dis, 9)
    order = sorted(range(n),
                   key=lambda i: (-dk[i], p["a"].iloc[i],
                                  p["b"].iloc[i]))
    t = order[0]
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "spearman_jsd_vs_setdist": [float(rha(rho, 6))],
        "top_source_a": [p["a"].iloc[t]],
        "top_source_b": [p["b"].iloc[t]],
        "top_jaccard": [float(rha(jac[t], 6))],
        "top_jsd_bits": [float(rha(x[t], 6))],
        "top_disagreement": [float(rha(dis[t], 6))]})


# ---------------------------------------------------------------------------
# Time-rescaling validation of the circadian rate model (Brown et al.)
# ---------------------------------------------------------------------------

#: purchases rescaled through the doubly-empirical compensator:
#: Λ(t) = (purchases on prior days) + (day's total) · H(time of day),
#: H = pooled hourly CDF with linear within-hour interpolation.
_TRESC_SQL = """
p AS (SELECT epoch_us(ts) AS us,
             epoch_us(ts) // 86400000000 AS d,
             CAST(hour(ts) AS BIGINT) AS h,
             (epoch_us(ts) % 3600000000) / 3600000000.0 AS frac
      FROM events WHERE event_type = 'purchase'),
hp AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1),
ht AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hp),
hc AS (SELECT h, c,
              CAST(SUM(c) OVER (ORDER BY h) - c AS DOUBLE)
                  / (SELECT n FROM ht) AS cdf_lo,
              CAST(c AS DOUBLE) / (SELECT n FROM ht) AS mass
       FROM hp),
dt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS nd FROM p GROUP BY 1),
dc AS (SELECT d, nd,
              CAST(SUM(nd) OVER (ORDER BY d) - nd AS BIGINT)
                  AS before
       FROM dt),
lam AS (SELECT p.us,
               dc.before + dc.nd * (hc.cdf_lo
                                    + hc.mass * p.frac) AS l
        FROM p JOIN dc ON dc.d = p.d JOIN hc ON hc.h = p.h),
gp AS (SELECT l - LAG(l) OVER (ORDER BY l, us) AS g FROM lam),
uu AS (SELECT 1.0 - EXP(-g) AS u FROM gp WHERE g IS NOT NULL)"""


def _rescaled_u(sf_dir: str) -> np.ndarray:
    """Sorted u_i = 1 − exp(−rescaled gaps) of the purchase
    process under the doubly-empirical circadian compensator."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["event_type"].to_numpy() == "purchase"
        us = df["ts"].to_numpy("datetime64[us]") \
            .astype(np.int64)[k]
        return pd.DataFrame({"us": us})

    pu = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep.__wrapped__ if hasattr(prep, "__wrapped__")
                     else prep, batch_format="pandas")
        .map_batches(lambda df: df.assign(
            c=np.ones(len(df), np.int64)), batch_format="pandas"),
        ["us"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("us", ignore_index=True)
    us = np.repeat(pu["us"].to_numpy(np.int64),
                   pu["c"].to_numpy(np.int64))
    d = us // 86_400_000_000
    h = (us % 86_400_000_000) // 3_600_000_000
    frac = (us % 3_600_000_000) / 3_600_000_000.0
    n = len(us)
    hcnt = np.bincount(h.astype(int), minlength=24)
    mass = hcnt / n
    cdf_lo = np.concatenate([[0.0], np.cumsum(mass)[:-1]])
    dvals, didx, dcnt = np.unique(d, return_inverse=True,
                                  return_counts=True)
    before = np.concatenate([[0], np.cumsum(dcnt)[:-1]])
    lam = before[didx] + dcnt[didx] * (cdf_lo[h] + mass[h] * frac)
    order = np.lexsort((us, lam))
    lam_s = lam[order]
    g = np.diff(lam_s)
    return np.sort(1.0 - np.exp(-g))


@register("time_rescaling_ks_purchases", sql=f"""
WITH {_TRESC_SQL},
os_ AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS i,
               COUNT(*) OVER () AS n
        FROM uu),
ks AS (SELECT MAX(GREATEST(CAST(i AS DOUBLE) / n - u,
                           u - (CAST(i AS DOUBLE) - 1) / n))
           AS dstat,
              CAST(MAX(n) AS BIGINT) AS n
       FROM os_)
SELECT n AS n_gaps,
       ROUND(dstat, 6) AS ks_stat,
       ROUND(dstat * SQRT(CAST(n AS DOUBLE)), 6) AS ks_scaled,
       CAST(CASE WHEN dstat * SQRT(CAST(n AS DOUBLE)) > 1.358
                 THEN 1 ELSE 0 END AS BIGINT) AS model_rejected
FROM ks""")
def time_rescaling_ks_purchases(sf_dir: str) -> pd.DataFrame:
    """The time-rescaling theorem (Brown et al.) applied to the
    purchase process: run every arrival through the compensator of
    the doubly-empirical circadian model — each day keeps its own
    observed volume, the within-day shape is the pooled hourly
    profile with linear within-hour interpolation — and the
    transformed gaps must be Exp(1) (u = 1−e^(−g) uniform) IF the
    model captures the process. The KS test against uniform is
    therefore a VALIDATION of the entire hourly-profile family the
    registry builds on: rejection here means purchases carry
    structure beyond day volume × time-of-day (micro-bursts,
    within-hour waves — the Ripley/Clark–Evans clustering measured
    AFTER the circadian explanation is spent, which those
    unadjusted tests cannot separate from rush hours). 1.358/√n
    asymptotic point; self-fit bias noted (the profile is
    estimated from the same data — conservative at these counts).
    Compensator pieces are a broadcastable day table + 24-cell
    profile; gaps sort once."""
    u = _rescaled_u(sf_dir)
    n = len(u)
    i = np.arange(1, n + 1, dtype=np.float64)
    dstat = float(np.maximum(i / n - u, u - (i - 1) / n).max())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "ks_stat": [float(rha(dstat, 6))],
        "ks_scaled": [float(rha(dstat * np.sqrt(n), 6))],
        "model_rejected": np.array(
            [1 if dstat * np.sqrt(n) > 1.358 else 0], np.int64)})


@register("rescaled_gap_moments", sql=f"""
WITH {_TRESC_SQL},
gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(g) AS s1, SUM(g * g) AS s2
       FROM gp WHERE g IS NOT NULL)
SELECT n AS n_gaps,
       ROUND(s1 / n, 6) AS mean_gap,
       ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1.0)) / (s1 / n), 6)
           AS cv_gap,
       ROUND((s2 - s1 * s1 / n) / (n - 1.0) / (s1 / n), 6)
           AS dispersion_index,
       CAST(CASE WHEN (s2 - s1 * s1 / n) / (n - 1.0)
                      / (s1 / n) > 1.0 THEN 1 ELSE 0 END
            AS BIGINT) AS overdispersed
FROM gm""")
def rescaled_gap_moments(sf_dir: str) -> pd.DataFrame:
    """Moments of the same rescaled gaps: under the model they are
    Exp(1), so mean ≈ 1 and CV ≈ 1 — and the DIRECTION of the
    violation diagnoses what the KS row only detects. CV > 1
    (overdispersed) is residual clustering: arrivals bunch beyond
    what day volume and time-of-day explain — retry storms, cart
    races, social triggers — and the capacity answer is queueing
    headroom at sub-hour scale. CV < 1 is regularity: arrivals
    are MORE evenly spaced than the model (rate limiting,
    batch-release cadence, inventory drops on a schedule). The
    unadjusted burstiness family (Goh–Barabási, CE) cannot make
    this distinction because the circadian cycle itself induces
    CV > 1 in raw gaps; rescaling spends that explanation first.
    Same compensator and gap set; exact shared float sums."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["event_type"].to_numpy() == "purchase"
        us = df["ts"].to_numpy("datetime64[us]") \
            .astype(np.int64)[k]
        return pd.DataFrame({"us": us})

    pu = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas")
        .map_batches(lambda df: df.assign(
            c=np.ones(len(df), np.int64)), batch_format="pandas"),
        ["us"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("us", ignore_index=True)
    usv = np.repeat(pu["us"].to_numpy(np.int64),
                    pu["c"].to_numpy(np.int64))
    d = usv // 86_400_000_000
    h = (usv % 86_400_000_000) // 3_600_000_000
    frac = (usv % 3_600_000_000) / 3_600_000_000.0
    n0 = len(usv)
    hcnt = np.bincount(h.astype(int), minlength=24)
    mass = hcnt / n0
    cdf_lo = np.concatenate([[0.0], np.cumsum(mass)[:-1]])
    dvals, didx, dcnt = np.unique(d, return_inverse=True,
                                  return_counts=True)
    before = np.concatenate([[0], np.cumsum(dcnt)[:-1]])
    lam = before[didx] + dcnt[didx] * (cdf_lo[h] + mass[h] * frac)
    order = np.lexsort((usv, lam))
    g = np.diff(lam[order])
    n = len(g)
    s1, s2 = float(g.sum()), float((g * g).sum())
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1.0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "mean_gap": [float(rha(mean, 6))],
        "cv_gap": [float(rha(np.sqrt(var) / mean, 6))],
        "dispersion_index": [float(rha(var / mean, 6))],
        "overdispersed": np.array(
            [1 if var / mean > 1.0 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Nestedness of the user × event-type incidence matrix (NODF) and the
# adoption-ladder audit
# ---------------------------------------------------------------------------

#: per-user type-set signature (5-bit mask over the alphabetical
#: type order click/error/purchase/signup/view) with counts — the
#: whole incidence structure compresses to ≤ 32 rows, so every
#: pairwise computation is O(32²) however many users exist.
_NODF_SQL = """
um AS (SELECT user_id,
              CAST(MAX(CASE WHEN event_type = 'click' THEN 1
                            ELSE 0 END)
                   + 2 * MAX(CASE WHEN event_type = 'error' THEN 1
                                  ELSE 0 END)
                   + 4 * MAX(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END)
                   + 8 * MAX(CASE WHEN event_type = 'signup'
                                  THEN 1 ELSE 0 END)
                   + 16 * MAX(CASE WHEN event_type = 'view' THEN 1
                                   ELSE 0 END) AS BIGINT) AS m
       FROM events GROUP BY 1),
sg AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt,
              CAST(bit_count(m) AS BIGINT) AS deg
       FROM um GROUP BY 1)"""


def _signature_table(sf_dir: str) -> pd.DataFrame:
    """(mask, cnt, deg) signature rows."""
    def prep2(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        bit = np.select(
            [et == "click", et == "error", et == "purchase",
             et == "signup", et == "view"],
            [1, 2, 4, 8, 16], 0).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "b": bit, "one": np.ones(len(et), np.int64)})

    ub = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(prep2, batch_format="pandas"),
        ["user_id", "b"], {"one": ("one", "max")}).to_pandas()
    mask = ub.groupby("user_id")["b"].sum()
    sig = mask.value_counts().rename_axis("m").rename("cnt") \
        .reset_index()
    sig["m"] = sig["m"].astype(np.int64)
    sig["cnt"] = sig["cnt"].astype(np.int64)
    sig["deg"] = np.array([bin(int(v)).count("1")
                           for v in sig["m"]], np.int64)
    return sig.sort_values("m", ignore_index=True)


@register("user_type_nestedness_nodf", sql=f"""
WITH {_NODF_SQL},
tu AS (SELECT CAST(SUM(cnt) AS BIGINT) AS u FROM sg),
rowp AS (SELECT COALESCE(SUM(
                  CAST(a.cnt AS DOUBLE) * b.cnt * 100.0
                  * bit_count(a.m & b.m) / b.deg), 0.0) AS s
        FROM sg a JOIN sg b ON a.deg > b.deg),
tv AS (SELECT t.b AS bit,
              CAST(SUM(CASE WHEN (sg.m // t.b) % 2 = 1
                            THEN sg.cnt ELSE 0 END) AS BIGINT)
                  AS nu
       FROM sg CROSS JOIN (SELECT UNNEST([1, 2, 4, 8, 16]) AS b) t
       GROUP BY 1),
colp AS (SELECT COALESCE(SUM(
                 100.0 * (SELECT CAST(COALESCE(SUM(sg.cnt), 0)
                              AS DOUBLE)
                          FROM sg
                          WHERE (sg.m // x.bit) % 2 = 1
                            AND (sg.m // y.bit) % 2 = 1) / y.nu),
                 0.0) AS s
        FROM tv x JOIN tv y ON x.nu > y.nu AND y.nu > 0)
SELECT (SELECT u FROM tu) AS n_users,
       ROUND((SELECT s FROM rowp)
             / ((SELECT CAST(u AS DOUBLE) * (u - 1) / 2 FROM tu)),
             6) AS nodf_rows,
       ROUND((SELECT s FROM colp) / 10.0, 6) AS nodf_cols,
       ROUND(((SELECT s FROM rowp) + (SELECT s FROM colp))
             / ((SELECT CAST(u AS DOUBLE) * (u - 1) / 2 FROM tu)
                + 10.0), 6) AS nodf_total
FROM tu""")
def user_type_nestedness_nodf(sf_dir: str) -> pd.DataFrame:
    """NODF nestedness of the user × event-type incidence matrix
    — ecology's standard question asked of feature adoption: do
    lighter users' type sets sit INSIDE heavier users' sets (a
    single adoption ladder, NODF → 100) or do users specialize in
    disjoint repertoires (NODF → 0)? Row part: every unequal-
    degree user pair scores 100·|A∩B|/deg(smaller), equal-degree
    pairs score 0 (the decreasing-fill requirement), averaged
    over ALL pairs; column part mirrors it over the five types'
    prevalence; total is the pooled raw-sum ratio — all exactly
    the Almeida-Neto definition. The repertoire/entropy rows say
    how MANY types users touch; NODF says whether WHICH types
    follows one canonical order, which decides if onboarding is a
    ladder or a menu. The O(users²) pair sum collapses to ≤ 32²
    signature pairs weighted by count products — exact at any
    user scale; bit arithmetic identical both engines."""
    sig = _signature_table(sf_dir)
    m = sig["m"].to_numpy(np.int64)
    cnt = sig["cnt"].to_numpy(np.int64)
    deg = sig["deg"].to_numpy(np.int64)
    u = int(cnt.sum())
    srow = 0.0
    for i in range(len(m)):
        for j in range(len(m)):
            if deg[i] > deg[j]:
                ov = bin(int(m[i]) & int(m[j])).count("1")
                srow += float(cnt[i]) * cnt[j] * 100.0 \
                    * ov / deg[j]
    bits = [1, 2, 4, 8, 16]
    nu = {b: int(cnt[(m & b) > 0].sum()) for b in bits}
    scol = 0.0
    for bx in bits:
        for by in bits:
            if bx == by:
                continue
            if nu[bx] > nu[by] > 0:
                both = int(cnt[((m & bx) > 0)
                               & ((m & by) > 0)].sum())
                scol += 100.0 * both / nu[by]
            # each unordered pair fires once via the strict >;
            # prevalence ties contribute 0 — matching the SQL join
    rha = textstats.round_half_away
    npairs = u * (u - 1) / 2.0
    return pd.DataFrame({
        "n_users": np.array([u], np.int64),
        "nodf_rows": [float(rha(srow / npairs, 6))],
        "nodf_cols": [float(rha(scol / 10.0, 6))],
        "nodf_total": [float(rha((srow + scol)
                                 / (npairs + 10.0), 6))]})


@register("adoption_ladder_audit", sql=f"""
WITH {_NODF_SQL},
tv AS (SELECT t.b AS bit,
              CAST(SUM(CASE WHEN (sg.m // t.b) % 2 = 1
                            THEN sg.cnt ELSE 0 END) AS BIGINT)
                  AS nu
       FROM sg CROSS JOIN (SELECT UNNEST([1, 2, 4, 8, 16]) AS b) t
       GROUP BY 1),
lad AS (SELECT bit, ROW_NUMBER() OVER (ORDER BY nu DESC, bit)
            AS rnk
        FROM tv),
pref AS (SELECT CAST(SUM(CASE WHEN lad.rnk <= k.k THEN lad.bit
                              ELSE 0 END) AS BIGINT) AS pm,
                k.k
         FROM lad CROSS JOIN (SELECT UNNEST(generate_series(0, 5))
                                  AS k) k
         GROUP BY k.k),
nest AS (SELECT CAST(SUM(sg.cnt) AS BIGINT) AS n_nested
         FROM sg JOIN pref ON pref.pm = sg.m),
tu AS (SELECT CAST(SUM(cnt) AS BIGINT) AS u FROM sg),
viol AS (SELECT sg.m, sg.cnt FROM sg
         WHERE NOT EXISTS (SELECT 1 FROM pref
                           WHERE pref.pm = sg.m)
         ORDER BY sg.cnt DESC, sg.m LIMIT 1)
SELECT (SELECT u FROM tu) AS n_users,
       ROUND(CAST((SELECT n_nested FROM nest) AS DOUBLE)
             / (SELECT u FROM tu) * 100.0, 6) AS ladder_pct,
       CAST(COALESCE((SELECT m FROM viol), -1) AS BIGINT)
           AS top_violation_mask,
       CAST(COALESCE((SELECT cnt FROM viol), 0) AS BIGINT)
           AS top_violation_users""")
def adoption_ladder_audit(sf_dir: str) -> pd.DataFrame:
    """The ladder made explicit: order types by user prevalence
    (ties by bit, pinned), and count users whose ENTIRE type set
    is a prefix of that ladder — the perfectly nested users NODF
    averages over. ladder_pct near 100 with the NODF row high is
    a clean staged-adoption story (ship onboarding in ladder
    order); a moderate NODF with low ladder_pct means nesting is
    only statistical, and the top violating signature — the most
    common set that skips a rung — is the product insight (e.g.
    purchase-without-click cohorts). The violation mask is the
    5-bit signature itself (click=1, error=2, purchase=4,
    signup=8, view=16, documented), −1 when every user is on the
    ladder. All from the same ≤ 32-row signature table."""
    sig = _signature_table(sf_dir)
    m = sig["m"].to_numpy(np.int64)
    cnt = sig["cnt"].to_numpy(np.int64)
    bits = [1, 2, 4, 8, 16]
    nu = {b: int(cnt[(m & b) > 0].sum()) for b in bits}
    ladder = sorted(bits, key=lambda b: (-nu[b], b))
    prefixes = {0}
    pm = 0
    for b in ladder:
        pm |= b
        prefixes.add(pm)
    u = int(cnt.sum())
    nested = int(cnt[np.isin(m, list(prefixes))].sum())
    viol = [(int(c), int(mm)) for mm, c in zip(m, cnt)
            if int(mm) not in prefixes]
    if viol:
        viol.sort(key=lambda t: (-t[0], t[1]))
        vm, vc = viol[0][1], viol[0][0]
    else:
        vm, vc = -1, 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([u], np.int64),
        "ladder_pct": [float(rha(nested / u * 100.0, 6))],
        "top_violation_mask": np.array([vm], np.int64),
        "top_violation_users": np.array([vc], np.int64)})


# ---------------------------------------------------------------------------
# Power-law discipline (Clauset–Shalizi–Newman): ML alpha with KS
# + the Vuong test against a lognormal
# ---------------------------------------------------------------------------

#: events-per-user spectrum (k, users) with the PL/lognormal ML
#: ingredients; xmin fixed at 1, continuous approximation with
#: xmin' = 0.5 (documented).
_PLAW_SQL = """
uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
       FROM events GROUP BY 1),
sp AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS f
       FROM uc GROUP BY 1),
mo AS (SELECT CAST(SUM(f) AS BIGINT) AS n,
              SUM(f * LN(k / 0.5)) AS slx,
              SUM(f * LN(CAST(k AS DOUBLE))) AS sl,
              SUM(f * LN(CAST(k AS DOUBLE))
                  * LN(CAST(k AS DOUBLE))) AS sll
       FROM sp),
fit AS (SELECT n, slx, sl, sll,
               1.0 + n / slx AS alpha,
               sl / n AS mu,
               sll / n - (sl / n) * (sl / n) AS sg2
        FROM mo)"""


def _user_spectrum(sf_dir: str):
    """Sorted (k, f) events-per-user spectrum."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "k": np.ones(len(df), np.int64)})

    uc = reduce_sink(
        _events(sf_dir, ["user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"k": ("k", "sum")}).to_pandas()
    sp = uc["k"].value_counts().rename_axis("k").rename("f") \
        .reset_index().sort_values("k", ignore_index=True)
    return (sp["k"].to_numpy(np.int64),
            sp["f"].to_numpy(np.int64))


@register("zipf_ml_alpha_user_activity", sql=f"""
WITH {_PLAW_SQL},
ks AS (SELECT MAX(GREATEST(
           ABS(CAST(cum AS DOUBLE) / n
               - (1.0 - POW(k / 0.5, 1.0 - alpha))),
           ABS(CAST(cum - f AS DOUBLE) / n
               - (1.0 - POW(k / 0.5, 1.0 - alpha))))) AS d
       FROM (SELECT sp.k, sp.f,
                    SUM(sp.f) OVER (ORDER BY sp.k) AS cum
             FROM sp) c, fit),
rg AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sp) AS nv,
              SUM(sp.f * LN(CAST(sp.k AS DOUBLE))) AS sx,
              SUM(sp.f * LN(CAST(sp.f AS DOUBLE))) AS sy,
              SUM(sp.f * LN(CAST(sp.k AS DOUBLE))
                  * LN(CAST(sp.k AS DOUBLE))) AS sxx,
              SUM(sp.f * LN(CAST(sp.k AS DOUBLE))
                  * LN(CAST(sp.f AS DOUBLE))) AS sxy,
              CAST(SUM(sp.f) AS DOUBLE) AS w
       FROM sp)
SELECT fit.n AS n_users,
       ROUND(fit.alpha, 6) AS alpha_ml,
       ROUND(-(rg.w * rg.sxy - rg.sx * rg.sy)
             / (rg.w * rg.sxx - rg.sx * rg.sx), 6)
           AS alpha_regression,
       ROUND(fit.alpha
             - (-(rg.w * rg.sxy - rg.sx * rg.sy)
                / (rg.w * rg.sxx - rg.sx * rg.sx)), 6)
           AS csn_bias_gap,
       ROUND((SELECT d FROM ks), 6) AS ks_dist
FROM fit, rg""")
def zipf_ml_alpha_user_activity(sf_dir: str) -> pd.DataFrame:
    """The Clauset–Shalizi–Newman discipline applied to the
    events-per-user distribution: the ML tail exponent α̂ = 1 +
    n/Σln(xᵢ/(x_min−½)) (continuous approximation at x_min = 1,
    documented) beside the log-log regression slope every Zipf
    plot eyeballs — csn_bias_gap is CSN's headline point made
    measurable: regression on a log-log frequency plot is a
    BIASED estimator of α (correlated, heteroskedastic errors in
    the tail), routinely off by tenths, and this row prints the
    bias on the caller's own data rather than citing the paper.
    ks_dist is the fitted-CDF Kolmogorov distance off the exact
    count histogram (both step sides checked) — the absolute-fit
    number that, per CSN, must accompany any power-law claim.
    The regression weights each (k, f) cell by its user count,
    matching the user-activity Zipf row's convention. Bounded
    spectrum; shared float expressions."""
    k, f = _user_spectrum(sf_dir)
    n = int(f.sum())
    slx = float((f * np.log(k / 0.5)).sum())
    alpha = 1.0 + n / slx
    lk = np.log(k.astype(np.float64))
    lf = np.log(f.astype(np.float64))
    w = float(f.sum())
    sx = float((f * lk).sum())
    sy = float((f * lf).sum())
    sxx = float((f * lk * lk).sum())
    sxy = float((f * lk * lf).sum())
    areg = -(w * sxy - sx * sy) / (w * sxx - sx * sx)
    cum = np.cumsum(f)
    fcdf = 1.0 - np.power(k / 0.5, 1.0 - alpha)
    d = float(np.maximum(np.abs(cum / n - fcdf),
                         np.abs((cum - f) / n - fcdf)).max())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "alpha_ml": [float(rha(alpha, 6))],
        "alpha_regression": [float(rha(areg, 6))],
        "csn_bias_gap": [float(rha(alpha - areg, 6))],
        "ks_dist": [float(rha(d, 6))]})


@register("powerlaw_vs_lognormal_vuong", sql=f"""
WITH {_PLAW_SQL},
pw AS (SELECT sp.k, sp.f,
              (LN(fit.alpha - 1.0) - LN(0.5)
               - fit.alpha * LN(sp.k / 0.5))
              - (-LN(CAST(sp.k AS DOUBLE))
                 - 0.5 * LN(2.0 * PI() * fit.sg2)
                 - (LN(CAST(sp.k AS DOUBLE)) - fit.mu)
                   * (LN(CAST(sp.k AS DOUBLE)) - fit.mu)
                   / (2.0 * fit.sg2)) AS r
       FROM sp, fit),
vs AS (SELECT CAST(SUM(f) AS BIGINT) AS n,
              SUM(f * r) AS sr, SUM(f * r * r) AS srr
       FROM pw)
SELECT n AS n_users,
       ROUND(sr, 6) AS loglik_ratio,
       ROUND(sr / SQRT(srr - sr * sr / n), 6) AS vuong_z,
       CAST(CASE WHEN sr / SQRT(srr - sr * sr / n) > 1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS powerlaw_wins,
       CAST(CASE WHEN sr / SQRT(srr - sr * sr / n) < -1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS lognormal_wins
FROM vs""")
def powerlaw_vs_lognormal_vuong(sf_dir: str) -> pd.DataFrame:
    """THE Clauset question — 'is it actually a power law?' — as
    the Vuong likelihood-ratio test between the ML power law and
    the ML lognormal on the same per-user counts (both continuous
    densities at the observed integers, a like-for-like
    comparison, documented). The sign convention every fitted-
    power-law claim should face: vuong_z insignificant (the
    overwhelmingly common outcome, per CSN's survey of published
    'power laws') means the data cannot distinguish the two and
    any infinite-variance/scale-free rhetoric is unearned —
    operationally it matters because lognormal tails thin out
    eventually (capacity planning can use a finite ceiling) while
    a true α < 2 power law cannot. loglik_ratio's sign picks the
    winner only when z clears ±1.96. Pointwise log-ratios
    weighted by the exact spectrum; Vuong's normalization
    √(Σr² − (Σr)²/n); shared ML parameters from one moment
    pass."""
    k, f = _user_spectrum(sf_dir)
    n = int(f.sum())
    slx = float((f * np.log(k / 0.5)).sum())
    alpha = 1.0 + n / slx
    lk = np.log(k.astype(np.float64))
    mu = float((f * lk).sum()) / n
    sg2 = float((f * lk * lk).sum()) / n - mu * mu
    r = (np.log(alpha - 1.0) - np.log(0.5)
         - alpha * np.log(k / 0.5)) \
        - (-lk - 0.5 * np.log(2.0 * np.pi * sg2)
           - (lk - mu) ** 2 / (2.0 * sg2))
    sr = float((f * r).sum())
    srr = float((f * r * r).sum())
    z = sr / np.sqrt(srr - sr * sr / n)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "loglik_ratio": [float(rha(sr, 6))],
        "vuong_z": [float(rha(z, 6))],
        "powerlaw_wins": np.array([1 if z > 1.96 else 0],
                                  np.int64),
        "lognormal_wins": np.array([1 if z < -1.96 else 0],
                                   np.int64)})


# ---------------------------------------------------------------------------
# Text data-quality: unbalanced-span and truncation audits
# ---------------------------------------------------------------------------

@register("unbalanced_span_audit_by_source", sql=r"""
WITH d AS (SELECT source,
                  LENGTH(text)
                  - LENGTH(REPLACE(text, '(', '')) AS po,
                  LENGTH(text)
                  - LENGTH(REPLACE(text, ')', '')) AS pc,
                  LENGTH(text)
                  - LENGTH(REPLACE(text, '"', '')) AS q
           FROM documents WHERE text IS NOT NULL)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN po != pc THEN 1 ELSE 0 END) AS BIGINT)
           AS paren_unbalanced,
       CAST(SUM(CASE WHEN q % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS quote_odd,
       ROUND(SUM(CASE WHEN po != pc OR q % 2 = 1 THEN 1
                      ELSE 0 END) * 100.0 / COUNT(*), 6)
           AS broken_pct
FROM d GROUP BY source ORDER BY source""")
def unbalanced_span_audit_by_source(sf_dir: str) -> pd.DataFrame:
    """Structural text QA per source: documents whose parentheses
    don't balance or whose double-quote count is odd — the
    mechanical signature of mid-span truncation, bad HTML
    stripping, or concatenation seams, and a cheap high-precision
    screen the statistical quality scorer (present) doesn't
    encode (a perfectly fluent doc cut mid-quotation sails
    through perplexity-style features). The per-source grouping
    is the point: broken spans clustering in ONE source indict
    that source's extraction pipeline rather than the corpus;
    uniform low rates are ambient noise. Count arithmetic via
    LENGTH-difference (exact, vectorized, no regex engine
    variance); null texts excluded identically."""
    def prep(t: pa.Table) -> pd.DataFrame:
        txt = t["text"].to_pandas().astype(str)
        src = t["source"].to_pandas()
        keep = t["text"].is_valid().to_pandas()
        txt, src = txt[keep], src[keep]
        po = txt.str.count(r"\(").to_numpy(np.int64)
        pc = txt.str.count(r"\)").to_numpy(np.int64)
        qn = txt.str.count('"').to_numpy(np.int64)
        return pd.DataFrame({
            "source": src.to_numpy(),
            "n": np.ones(len(txt), np.int64),
            "pb": (po != pc).astype(np.int64),
            "qo": (qn % 2 == 1).astype(np.int64),
            "ei": ((po != pc) | (qn % 2 == 1)).astype(np.int64)})

    g = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(prep, batch_format="pyarrow"),
        ["source"], {"n": ("n", "sum"), "pb": ("pb", "sum"),
                     "qo": ("qo", "sum"), "ei": ("ei", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "source": g["source"],
        "n_docs": g["n"].astype(np.int64),
        "paren_unbalanced": g["pb"].astype(np.int64),
        "quote_odd": g["qo"].astype(np.int64),
        "broken_pct": rha(g["ei"].to_numpy(np.int64) * 100.0
                          / g["n"].to_numpy(np.int64), 6)})


@register("truncation_audit_by_source", sql=r"""
WITH d AS (SELECT source,
                  CASE WHEN regexp_matches(RTRIM(text),
                                           '[.!?]$')
                       THEN 0 ELSE 1 END AS tr,
                  LENGTH(text) AS ln
           FROM documents
           WHERE text IS NOT NULL AND RTRIM(text) != '')
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tr) AS BIGINT) AS truncated,
       ROUND(SUM(tr) * 100.0 / COUNT(*), 6) AS truncated_pct,
       ROUND(CASE WHEN SUM(tr) > 0 AND SUM(1 - tr) > 0 THEN
                 (CAST(SUM(CASE WHEN tr = 1 THEN ln ELSE 0 END)
                       AS DOUBLE) / SUM(tr))
                 / (CAST(SUM(CASE WHEN tr = 0 THEN ln ELSE 0 END)
                         AS DOUBLE) / SUM(1 - tr)) END, 6)
           AS len_ratio_trunc_vs_ok
FROM d GROUP BY source ORDER BY source""")
def truncation_audit_by_source(sf_dir: str) -> pd.DataFrame:
    """Terminal-punctuation truncation audit: the share of each
    source's documents that do NOT end in sentence-final
    punctuation after trailing-whitespace strip — the classic
    clipped-crawl / length-capped-extraction signature — and the
    mean-length ratio of truncated vs clean docs, which is the
    diagnostic second column: ratio ≫ 1 (truncated docs are the
    LONG ones) is a hard length cap in the pipeline — the single
    worst artifact for long-context training since it
    systematically removes exactly the long-document endings —
    while ratio ≈ 1 is random clipping (transport errors). NULL
    ratio when either class is empty, identically on both
    engines; empty-after-strip docs excluded from the base."""
    def prep(t: pa.Table) -> pd.DataFrame:
        txt = t["text"].to_pandas()
        src = t["source"].to_pandas()
        keep = txt.notna()
        txt, src = txt[keep].astype(str), src[keep]
        stripped = txt.str.rstrip()
        keep2 = stripped != ""
        txt, src, stripped = txt[keep2], src[keep2], \
            stripped[keep2]
        tr = (~stripped.str.contains(r"[.!?]$", regex=True)) \
            .astype(np.int64).to_numpy()
        ln = txt.str.len().to_numpy(np.int64)
        return pd.DataFrame({
            "source": src.to_numpy(),
            "n": np.ones(len(txt), np.int64), "tr": tr,
            "lt": np.where(tr == 1, ln, 0),
            "lo": np.where(tr == 0, ln, 0)})

    g = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(prep, batch_format="pyarrow"),
        ["source"], {"n": ("n", "sum"), "tr": ("tr", "sum"),
                     "lt": ("lt", "sum"), "lo": ("lo", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    n = g["n"].to_numpy(np.int64)
    tr = g["tr"].to_numpy(np.int64)
    lt = g["lt"].to_numpy(np.int64)
    lo = g["lo"].to_numpy(np.int64)
    ok = n - tr
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where((tr > 0) & (ok > 0),
                         (lt / np.maximum(tr, 1))
                         / (lo / np.maximum(ok, 1)), np.nan)
    return pd.DataFrame({
        "source": g["source"],
        "n_docs": n,
        "truncated": tr,
        "truncated_pct": rha(tr * 100.0 / n, 6),
        "len_ratio_trunc_vs_ok": rha(ratio, 6)})


# ---------------------------------------------------------------------------
# VaR backtesting: Kupiec proportion-of-failures + Christoffersen
# independence on daily revenue
# ---------------------------------------------------------------------------

#: zero-filled daily revenue cents, the train-half 10% empirical VaR
#: (rational rank), and the test-half exception sequence in day
#: order.
_VAR_SQL = """
d AS (SELECT epoch_us(ts) // 86400000000 AS day,
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
tr AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn
       FROM x, sp WHERE day < cut),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM tr),
vq AS (SELECT rev AS var10 FROM tr, nt
       WHERE rn = (nt.nt + 9) // 10),
te AS (SELECT day,
              CASE WHEN rev < (SELECT var10 FROM vq) THEN 1
                   ELSE 0 END AS e
       FROM x, sp WHERE day >= cut)"""


def _var_exceptions(sf_dir: str):
    """(var10 cents, exception 0/1 array in day order over the
    test half)."""
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
    rev = np.array([rev_map.get(int(dd), 0) for dd in days],
                   np.int64)
    train = np.sort(rev[days < cut])
    nt = len(train)
    var10 = int(train[(nt + 9) // 10 - 1])
    e = (rev[days >= cut] < var10).astype(np.int64)
    return var10, e


@register("var_backtest_kupiec", sql=f"""
WITH {_VAR_SQL},
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(e) AS BIGINT) AS xx
       FROM te),
lr AS (SELECT n, xx,
              -2.0 * (((n - xx) * LN(0.9) + xx * LN(0.1))
                      - (CASE WHEN xx = 0 THEN 0
                              ELSE xx * LN(CAST(xx AS DOUBLE) / n)
                         END
                         + CASE WHEN xx = n THEN 0
                                ELSE (n - xx)
                                     * LN(1.0 - CAST(xx AS DOUBLE)
                                          / n) END)) AS pof
       FROM ag)
SELECT (SELECT CAST(var10 AS DOUBLE) / 100 FROM vq)
           AS var10_value,
       n AS n_test_days, xx AS exceptions,
       ROUND(CAST(xx AS DOUBLE) / n * 100.0, 6) AS exception_pct,
       ROUND(pof, 6) AS kupiec_lr,
       CAST(CASE WHEN pof > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
           AS var_rejected
FROM lr""")
def var_backtest_kupiec(sf_dir: str) -> pd.DataFrame:
    """Kupiec's proportion-of-failures backtest of a historical
    daily-revenue VaR: the 10% empirical quantile of the TRAIN
    half becomes the risk line, and the TEST half's exception
    count faces the binomial likelihood ratio against p = 0.1
    (χ²₁; the 0·ln0 = 0 limits pinned identically). This is the
    regulatory-grade version of the question every 'bad day'
    threshold in a revenue dashboard begs: a threshold calibrated
    to fire 10% of the time that fires 25% out-of-sample isn't a
    risk measure, it's history worship — and the Kupiec LR is the
    exact significance of that gap, two-sided (too FEW exceptions
    also rejects: an over-conservative line hides real risk
    appetite). Strict-below exception rule, rational train rank
    (⌈0.1·n⌉), same zero-filled spine and midpoint split as the
    forecast-backtest family."""
    var10, e = _var_exceptions(sf_dir)
    n = len(e)
    x = int(e.sum())
    ll0 = (n - x) * np.log(0.9) + x * np.log(0.1)
    ll1 = (0.0 if x == 0 else x * np.log(x / n)) \
        + (0.0 if x == n else (n - x) * np.log(1.0 - x / n))
    pof = -2.0 * (ll0 - ll1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "var10_value": [var10 / 100],
        "n_test_days": np.array([n], np.int64),
        "exceptions": np.array([x], np.int64),
        "exception_pct": [float(rha(x / n * 100.0, 6))],
        "kupiec_lr": [float(rha(pof, 6))],
        "var_rejected": np.array([1 if pof > 3.841459 else 0],
                                 np.int64)})


@register("var_backtest_christoffersen", sql=f"""
WITH {_VAR_SQL},
pr AS (SELECT e, LAG(e) OVER (ORDER BY day) AS pe FROM te),
ct AS (SELECT
    CAST(SUM(CASE WHEN pe = 0 AND e = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n00,
    CAST(SUM(CASE WHEN pe = 0 AND e = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n01,
    CAST(SUM(CASE WHEN pe = 1 AND e = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n10,
    CAST(SUM(CASE WHEN pe = 1 AND e = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n11
       FROM pr WHERE pe IS NOT NULL),
pp AS (SELECT n00, n01, n10, n11,
              CAST(n01 + n11 AS DOUBLE)
                  / (n00 + n01 + n10 + n11) AS pi,
              CASE WHEN n00 + n01 > 0
                   THEN CAST(n01 AS DOUBLE) / (n00 + n01) END
                  AS pi0,
              CASE WHEN n10 + n11 > 0
                   THEN CAST(n11 AS DOUBLE) / (n10 + n11) END
                  AS pi1
       FROM ct),
lr AS (SELECT n00, n01, n10, n11, pi, pi0, pi1,
              -2.0 * (((n00 + n10) * (CASE WHEN pi = 1 THEN 0
                           ELSE LN(1.0 - pi) END)
                       + (n01 + n11) * (CASE WHEN pi = 0 THEN 0
                              ELSE LN(pi) END))
                      - (CASE WHEN n00 = 0 OR pi0 IS NULL
                              OR pi0 = 1 THEN
                              CASE WHEN n00 = 0 THEN 0
                                   ELSE n00 * LN(1.0 - pi0) END
                              ELSE n00 * LN(1.0 - pi0) END
                         + CASE WHEN n01 = 0 OR pi0 = 0 THEN 0
                                ELSE n01 * LN(pi0) END
                         + CASE WHEN n10 = 0 OR pi1 IS NULL
                                OR pi1 = 1 THEN 0
                                ELSE n10 * LN(1.0 - pi1) END
                         + CASE WHEN n11 = 0 OR pi1 IS NULL
                                OR pi1 = 0 THEN 0
                                ELSE n11 * LN(pi1) END))
                  AS lrc
       FROM pp)
SELECT n00, n01, n10, n11,
       ROUND(pi0, 6) AS p_exception_after_calm,
       ROUND(pi1, 6) AS p_exception_after_exception,
       ROUND(lrc, 6) AS christoffersen_lr,
       CAST(CASE WHEN lrc > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
           AS clustering_rejected
FROM lr""")
def var_backtest_christoffersen(sf_dir: str) -> pd.DataFrame:
    """Christoffersen's independence test on the same exception
    sequence: a first-order Markov likelihood ratio asking whether
    an exception TODAY raises the chance of one TOMORROW
    (π₁ vs π₀). Kupiec only counts exceptions; a VaR line can pass
    the count test perfectly while its exceptions arrive in runs —
    which for revenue risk means drawdown EPISODES (the model
    misses volatility persistence, exactly what the ARCH rows
    detect in the underlying series), and a week of consecutive
    bad days is a different solvency event than the same count
    scattered. p_exception_after_exception ≫ p_exception_after_
    calm is the readable form of the verdict. All 0·ln0 limits
    pinned; one-state-absent degenerate tables produce the
    restricted-likelihood limits identically on both engines."""
    var10, e = _var_exceptions(sf_dir)
    pe, ce = e[:-1], e[1:]
    n00 = int(((pe == 0) & (ce == 0)).sum())
    n01 = int(((pe == 0) & (ce == 1)).sum())
    n10 = int(((pe == 1) & (ce == 0)).sum())
    n11 = int(((pe == 1) & (ce == 1)).sum())
    tot = n00 + n01 + n10 + n11
    pi = (n01 + n11) / tot
    pi0 = n01 / (n00 + n01) if (n00 + n01) > 0 else np.nan
    pi1 = n11 / (n10 + n11) if (n10 + n11) > 0 else np.nan

    def xlny(x, y):
        return 0.0 if x == 0 or y <= 0 else x * np.log(y)

    ll0 = xlny(n00 + n10, 1.0 - pi) + xlny(n01 + n11, pi)
    ll1 = (xlny(n00, 1.0 - pi0) if not np.isnan(pi0) else 0.0) \
        + (xlny(n01, pi0) if not np.isnan(pi0) else 0.0) \
        + (xlny(n10, 1.0 - pi1) if not np.isnan(pi1) else 0.0) \
        + (xlny(n11, pi1) if not np.isnan(pi1) else 0.0)
    lrc = -2.0 * (ll0 - ll1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n00": np.array([n00], np.int64),
        "n01": np.array([n01], np.int64),
        "n10": np.array([n10], np.int64),
        "n11": np.array([n11], np.int64),
        "p_exception_after_calm": [float(rha(pi0, 6))],
        "p_exception_after_exception": [float(rha(pi1, 6))],
        "christoffersen_lr": [float(rha(lrc, 6))],
        "clustering_rejected": np.array(
            [1 if lrc > 3.841459 else 0], np.int64)})


# ---------------------------------------------------------------------------
# One-way MANOVA across weekdays on the daily (views, clicks,
# purchases) vector
# ---------------------------------------------------------------------------

def _manova_moments(sf_dir: str):
    """(n, k, W, B, group table) with W/B the 3×3 within/between
    SSCP matrices over dow groups."""
    g = _dayvec(sf_dir)
    d = g["d"].to_numpy(np.int64)
    X = np.stack([g["x"].to_numpy(np.int64),
                  g["y"].to_numpy(np.int64),
                  g["z"].to_numpy(np.int64)], axis=1) \
        .astype(np.float64)
    dow = (d + 4) % 7
    n = len(d)
    T = X.T @ X
    tot = X.sum(axis=0)
    Wm = T.copy()
    Bsum = np.zeros((3, 3))
    groups = []
    for gg in range(7):
        m = dow == gg
        ng = int(m.sum())
        if ng == 0:
            continue
        Sg = X[m].sum(axis=0)
        Wm -= np.outer(Sg, Sg) / ng
        Bsum += np.outer(Sg, Sg) / ng
        groups.append((gg, ng, Sg))
    B = Bsum - np.outer(tot, tot) / n
    return n, len(groups), Wm, B, groups, tot


def _det3(M):
    return (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
            - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
            + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))


_MANOVA_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS x2,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS x3
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST((cal.d + 4) % 7 AS BIGINT) AS dow,
             CAST(COALESCE(e.x1, 0) AS DOUBLE) AS x1,
             CAST(COALESCE(e.x2, 0) AS DOUBLE) AS x2,
             CAST(COALESCE(e.x3, 0) AS DOUBLE) AS x3
      FROM cal LEFT JOIN e ON e.d = cal.d),
gs AS (SELECT dow, CAST(COUNT(*) AS DOUBLE) AS ng,
              SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3
       FROM g GROUP BY 1),
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              SUM(x1) AS t1, SUM(x2) AS t2, SUM(x3) AS t3,
              SUM(x1 * x1) AS t11, SUM(x1 * x2) AS t12,
              SUM(x1 * x3) AS t13, SUM(x2 * x2) AS t22,
              SUM(x2 * x3) AS t23, SUM(x3 * x3) AS t33
       FROM g),
bw AS (SELECT tt.n,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM gs) AS k,
              tt.t11 - (SELECT SUM(s1 * s1 / ng) FROM gs) AS w11,
              tt.t12 - (SELECT SUM(s1 * s2 / ng) FROM gs) AS w12,
              tt.t13 - (SELECT SUM(s1 * s3 / ng) FROM gs) AS w13,
              tt.t22 - (SELECT SUM(s2 * s2 / ng) FROM gs) AS w22,
              tt.t23 - (SELECT SUM(s2 * s3 / ng) FROM gs) AS w23,
              tt.t33 - (SELECT SUM(s3 * s3 / ng) FROM gs) AS w33,
              (SELECT SUM(s1 * s1 / ng) FROM gs)
                  - tt.t1 * tt.t1 / tt.n AS b11,
              (SELECT SUM(s1 * s2 / ng) FROM gs)
                  - tt.t1 * tt.t2 / tt.n AS b12,
              (SELECT SUM(s1 * s3 / ng) FROM gs)
                  - tt.t1 * tt.t3 / tt.n AS b13,
              (SELECT SUM(s2 * s2 / ng) FROM gs)
                  - tt.t2 * tt.t2 / tt.n AS b22,
              (SELECT SUM(s2 * s3 / ng) FROM gs)
                  - tt.t2 * tt.t3 / tt.n AS b23,
              (SELECT SUM(s3 * s3 / ng) FROM gs)
                  - tt.t3 * tt.t3 / tt.n AS b33
       FROM tt)"""


@register("manova_dow_dayvectors", sql=f"""
WITH {_MANOVA_SQL},
dt AS (SELECT n, k,
              w11 * (w22 * w33 - w23 * w23)
              - w12 * (w12 * w33 - w23 * w13)
              + w13 * (w12 * w23 - w22 * w13) AS detw,
              (w11 + b11) * ((w22 + b22) * (w33 + b33)
                             - (w23 + b23) * (w23 + b23))
              - (w12 + b12) * ((w12 + b12) * (w33 + b33)
                               - (w23 + b23) * (w13 + b13))
              + (w13 + b13) * ((w12 + b12) * (w23 + b23)
                               - (w22 + b22) * (w13 + b13))
                  AS dett
       FROM bw)
SELECT CAST(n AS BIGINT) AS n_days, k AS n_groups,
       ROUND(detw / dett, 6) AS wilks_lambda,
       ROUND(-(n - 1.0 - (3 + CAST(k AS DOUBLE)) / 2.0)
             * LN(detw / dett), 6) AS bartlett_chi2,
       CAST(3 * (k - 1) AS BIGINT) AS df,
       CAST(CASE WHEN k = 7
                  AND -(n - 1.0 - (3 + CAST(k AS DOUBLE)) / 2.0)
                      * LN(detw / dett) > 28.869299
                 THEN 1
                 WHEN k != 7 THEN 0
                 ELSE 0 END AS BIGINT) AS dow_effect
FROM dt""")
def manova_dow_dayvectors(sf_dir: str) -> pd.DataFrame:
    """One-way MANOVA of the daily (views, clicks, purchases)
    vector across weekdays: Wilks' Λ = det(W)/det(W+B) with
    Bartlett's χ² approximation on 3(k−1) df. Hotelling's T²
    (present) compares TWO groups (weekend/weekday); MANOVA asks
    the full seven-level question, and the multivariate framing
    matters for the same reason it did there — a dow effect can
    live entirely in the MIX (Fridays browse-heavy, Sundays
    buy-heavy at identical totals), invisible to seven univariate
    ANOVAs but loud in Λ. Rejection licenses the per-dow models
    the seasonal family builds; failure says the weekday
    machinery (dow profiles, trading-day adjustment, VBH splits)
    is modeling noise. 3×3 determinants in closed form;
    zero-filled calendar; the rejection point (28.869, df 18)
    applies at the full k = 7, flagged only then. Exact-moment
    SSCPs; one reduce."""
    n, k, Wm, B, groups, tot = _manova_moments(sf_dir)
    detw = _det3(Wm)
    dett = _det3(Wm + B)
    lam = detw / dett
    bart = -(n - 1.0 - (3 + k) / 2.0) * np.log(lam)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_groups": np.array([k], np.int64),
        "wilks_lambda": [float(rha(lam, 6))],
        "bartlett_chi2": [float(rha(bart, 6))],
        "df": np.array([3 * (k - 1)], np.int64),
        "dow_effect": np.array(
            [1 if k == 7 and bart > 28.869299 else 0], np.int64)})


@register("dow_centroid_mahalanobis", sql=f"""
WITH {_MANOVA_SQL},
iv AS (SELECT n, k, w11, w12, w13, w22, w23, w33,
              (w11 * (w22 * w33 - w23 * w23)
               - w12 * (w12 * w33 - w23 * w13)
               + w13 * (w12 * w23 - w22 * w13))
                  / POW(n - k, 3) AS dets
       FROM bw),
ce AS (SELECT gs.dow, gs.ng,
              gs.s1 / gs.ng - tt.t1 / tt.n AS d1,
              gs.s2 / gs.ng - tt.t2 / tt.n AS d2,
              gs.s3 / gs.ng - tt.t3 / tt.n AS d3,
              gs.s1 / gs.ng AS m1, gs.s2 / gs.ng AS m2,
              gs.s3 / gs.ng AS m3
       FROM gs, tt),
dm AS (SELECT ce.dow, ce.ng, ce.m1, ce.m2, ce.m3,
              (ce.d1 * ((iv.w22 / (iv.n - iv.k))
                        * (iv.w33 / (iv.n - iv.k))
                        - (iv.w23 / (iv.n - iv.k))
                          * (iv.w23 / (iv.n - iv.k)))
               + ce.d2 * ((iv.w23 / (iv.n - iv.k))
                          * (iv.w13 / (iv.n - iv.k))
                          - (iv.w12 / (iv.n - iv.k))
                            * (iv.w33 / (iv.n - iv.k)))
               + ce.d3 * ((iv.w12 / (iv.n - iv.k))
                          * (iv.w23 / (iv.n - iv.k))
                          - (iv.w22 / (iv.n - iv.k))
                            * (iv.w13 / (iv.n - iv.k))))
                  * ce.d1 / iv.dets
              + (ce.d1 * ((iv.w23 / (iv.n - iv.k))
                          * (iv.w13 / (iv.n - iv.k))
                          - (iv.w12 / (iv.n - iv.k))
                            * (iv.w33 / (iv.n - iv.k)))
                 + ce.d2 * ((iv.w11 / (iv.n - iv.k))
                            * (iv.w33 / (iv.n - iv.k))
                            - (iv.w13 / (iv.n - iv.k))
                              * (iv.w13 / (iv.n - iv.k)))
                 + ce.d3 * ((iv.w12 / (iv.n - iv.k))
                            * (iv.w13 / (iv.n - iv.k))
                            - (iv.w11 / (iv.n - iv.k))
                              * (iv.w23 / (iv.n - iv.k))))
                  * ce.d2 / iv.dets
              + (ce.d1 * ((iv.w12 / (iv.n - iv.k))
                          * (iv.w23 / (iv.n - iv.k))
                          - (iv.w22 / (iv.n - iv.k))
                            * (iv.w13 / (iv.n - iv.k)))
                 + ce.d2 * ((iv.w12 / (iv.n - iv.k))
                            * (iv.w13 / (iv.n - iv.k))
                            - (iv.w11 / (iv.n - iv.k))
                              * (iv.w23 / (iv.n - iv.k)))
                 + ce.d3 * ((iv.w11 / (iv.n - iv.k))
                            * (iv.w22 / (iv.n - iv.k))
                            - (iv.w12 / (iv.n - iv.k))
                              * (iv.w12 / (iv.n - iv.k))))
                  * ce.d3 / iv.dets AS d2stat
       FROM ce, iv)
SELECT dow, CAST(ng AS BIGINT) AS n_days,
       ROUND(m1, 6) AS mean_views,
       ROUND(m2, 6) AS mean_clicks,
       ROUND(m3, 6) AS mean_purchases,
       ROUND(d2stat, 6) AS mahalanobis_d2
FROM dm ORDER BY dow""")
def dow_centroid_mahalanobis(sf_dir: str) -> pd.DataFrame:
    """The per-weekday centroid table behind the MANOVA verdict:
    each dow's mean day-vector and its Mahalanobis D² from the
    grand mean under the POOLED WITHIN covariance W/(n−k) — the
    localization Λ can't give (Λ says weekdays differ; this says
    WHICH ones carry the difference, in units that respect the
    day-vector's correlation structure, so a Sunday that's merely
    'scaled-down Wednesday' scores small D² while an
    equal-volume day with an aberrant MIX scores large). Read
    with the mixing-matrix idiom: the max-D² dow is where per-dow
    modeling pays first. Adjugate 3×3 inverse in the oracle's
    exact operation order (the mahalanobis_outlier_days
    precedent); same SSCP reduce as the MANOVA row."""
    n, k, Wm, B, groups, tot = _manova_moments(sf_dir)
    S = Wm / (n - k)
    dets = _det3(S)
    adj = np.array([
        [S[1, 1] * S[2, 2] - S[1, 2] * S[1, 2],
         S[1, 2] * S[0, 2] - S[0, 1] * S[2, 2],
         S[0, 1] * S[1, 2] - S[1, 1] * S[0, 2]],
        [S[1, 2] * S[0, 2] - S[0, 1] * S[2, 2],
         S[0, 0] * S[2, 2] - S[0, 2] * S[0, 2],
         S[0, 1] * S[0, 2] - S[0, 0] * S[1, 2]],
        [S[0, 1] * S[1, 2] - S[1, 1] * S[0, 2],
         S[0, 1] * S[0, 2] - S[0, 0] * S[1, 2],
         S[0, 0] * S[1, 1] - S[0, 1] * S[0, 1]]])
    gm = tot / n
    rha = textstats.round_half_away
    rows = []
    for gg, ng, Sg in groups:
        mvec = Sg / ng
        dv = mvec - gm
        d2 = float(dv @ adj @ dv) / dets
        rows.append((gg, ng, float(rha(mvec[0], 6)),
                     float(rha(mvec[1], 6)),
                     float(rha(mvec[2], 6)),
                     float(rha(d2, 6))))
    return pd.DataFrame(rows, columns=[
        "dow", "n_days", "mean_views", "mean_clicks",
        "mean_purchases", "mahalanobis_d2"]).astype(
        {"dow": np.int64, "n_days": np.int64}) \
        .sort_values("dow", ignore_index=True)


# ---------------------------------------------------------------------------
# Rank aggregation across metrics: Borda consensus for brands + the
# metric-agreement panel
# ---------------------------------------------------------------------------

def _brand_metric_ranks(sf_dir: str) -> pd.DataFrame:
    """Per brand: revenue cents, quantity cents, order count, and
    each metric's dense rank (1 = best; ties by brand name,
    pinned) — one join-reduce, brands-bounded."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = ray.put(dict(zip(part["p_partkey"]
                                .to_numpy(np.int64),
                                part["p_brand"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).to_numpy(),
            "rev": np.rint(df["l_extendedprice"]
                           .to_numpy(np.float64) * 100)
            .astype(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy(np.float64)
                           * 100).astype(np.int64),
            "ordk": df["l_orderkey"].to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity", "l_orderkey"]) \
        .map_batches(prep, batch_format="pandas")
    agg = reduce_sink(li, ["brand"],
                      {"rev": ("rev", "sum"),
                       "qty": ("qty", "sum")}).to_pandas()
    orders = reduce_sink(
        reduce_sink(li, ["brand", "ordk"],
                    {"rev": ("rev", "size")}),
        ["brand"], {"rev": ("rev", "size")}).to_pandas() \
        .rename(columns={"rev": "n_orders"})
    g = agg.merge(orders, on="brand")
    for col, rk in [("rev", "r_rev"), ("qty", "r_qty"),
                    ("n_orders", "r_ord")]:
        order = g.sort_values([col, "brand"],
                              ascending=[False, True],
                              kind="mergesort")
        g[rk] = pd.Series(np.arange(1, len(g) + 1, dtype=np.int64),
                          index=order.index)
    return g


_BORDA_SQL = """
pb AS (SELECT p_partkey, p_brand FROM part),
bm AS (SELECT pb.p_brand AS brand,
              CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                            AS BIGINT)) AS BIGINT) AS rev,
              CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                   AS BIGINT) AS qty,
              CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                  AS n_orders
       FROM lineitem JOIN pb ON l_partkey = p_partkey
       GROUP BY 1),
rk AS (SELECT brand, rev, qty, n_orders,
              ROW_NUMBER() OVER (ORDER BY rev DESC, brand)
                  AS r_rev,
              ROW_NUMBER() OVER (ORDER BY qty DESC, brand)
                  AS r_qty,
              ROW_NUMBER() OVER (ORDER BY n_orders DESC, brand)
                  AS r_ord
       FROM bm)"""


@register("brand_metric_borda_consensus", sql=f"""
WITH {_BORDA_SQL}
SELECT brand,
       CAST(r_rev AS BIGINT) AS rank_revenue,
       CAST(r_qty AS BIGINT) AS rank_quantity,
       CAST(r_ord AS BIGINT) AS rank_orders,
       CAST(r_rev + r_qty + r_ord AS BIGINT) AS borda_score,
       CAST(ROW_NUMBER() OVER (ORDER BY r_rev + r_qty + r_ord,
                               brand) AS BIGINT) AS consensus_rank
FROM rk ORDER BY consensus_rank""")
def brand_metric_borda_consensus(sf_dir: str) -> pd.DataFrame:
    """Borda rank aggregation of brands across three business
    metrics — revenue, quantity, distinct orders — each producing
    its own 'top brands' list, with the consensus being the
    minimum-total-rank ordering (Borda is the unique positional
    rule minimizing total Kendall displacement to the inputs
    under mild conditions). The practical problem it solves is
    ambient in every business review: three dashboards rank
    brands three ways and the meeting argues about which list is
    'right'; the Borda table shows all three ranks side by side
    PLUS the aggregate, making metric-specific outliers readable
    at a glance (a brand 2nd in orders but 15th in revenue is a
    low-ticket volume brand — the disagreement IS the insight).
    Deterministic (value desc, brand) tie-breaks everywhere;
    consensus ties resolved lexicographically; brands-bounded."""
    g = _brand_metric_ranks(sf_dir)
    g["borda"] = (g["r_rev"] + g["r_qty"]
                  + g["r_ord"]).astype(np.int64)
    g = g.sort_values(["borda", "brand"], kind="mergesort",
                      ignore_index=True)
    return pd.DataFrame({
        "brand": g["brand"],
        "rank_revenue": g["r_rev"].astype(np.int64),
        "rank_quantity": g["r_qty"].astype(np.int64),
        "rank_orders": g["r_ord"].astype(np.int64),
        "borda_score": g["borda"],
        "consensus_rank": np.arange(1, len(g) + 1,
                                    dtype=np.int64)})


@register("metric_rank_agreement_panel", sql=f"""
WITH {_BORDA_SQL},
bc AS (SELECT brand, r_rev, r_qty, r_ord,
              ROW_NUMBER() OVER (ORDER BY r_rev + r_qty + r_ord,
                                 brand) AS r_con
       FROM rk),
pr AS (SELECT a.brand AS ba, b.brand AS bb,
              SIGN(CAST(b.r_rev AS DOUBLE) - a.r_rev) AS s_rev,
              SIGN(CAST(b.r_qty AS DOUBLE) - a.r_qty) AS s_qty,
              SIGN(CAST(b.r_ord AS DOUBLE) - a.r_ord) AS s_ord,
              SIGN(CAST(b.r_con AS DOUBLE) - a.r_con) AS s_con
       FROM bc a JOIN bc b ON a.brand < b.brand),
np_ AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM pr)
SELECT ROUND(SUM(s_rev * s_qty) / (SELECT m FROM np_), 6)
           AS tau_rev_qty,
       ROUND(SUM(s_rev * s_ord) / (SELECT m FROM np_), 6)
           AS tau_rev_orders,
       ROUND(SUM(s_qty * s_ord) / (SELECT m FROM np_), 6)
           AS tau_qty_orders,
       ROUND(SUM(s_rev * s_con) / (SELECT m FROM np_), 6)
           AS tau_revenue_consensus,
       ROUND(SUM(s_qty * s_con) / (SELECT m FROM np_), 6)
           AS tau_quantity_consensus,
       ROUND(SUM(s_ord * s_con) / (SELECT m FROM np_), 6)
           AS tau_orders_consensus
FROM pr""")
def metric_rank_agreement_panel(sf_dir: str) -> pd.DataFrame:
    """Kendall tau between every metric pair and between each
    metric and the Borda consensus — the which-dashboard-can-
    stand-alone audit. The three pairwise taus say how much the
    metrics genuinely disagree (τ ≈ 1 everywhere means the Borda
    exercise was unnecessary and ANY list serves); the three
    consensus taus RANK THE METRICS as proxies — the metric with
    the highest τ-to-consensus is the single list to publish when
    only one fits on the slide, chosen by agreement rather than
    seniority of the revenue team. Ranks are the permutations
    from the consensus row (distinct by construction — tau needs
    no tie correction here, documented); O(brands²) sign pairs,
    exact."""
    g = _brand_metric_ranks(sf_dir)
    g["borda"] = g["r_rev"] + g["r_qty"] + g["r_ord"]
    order = g.sort_values(["borda", "brand"], kind="mergesort")
    g["r_con"] = pd.Series(np.arange(1, len(g) + 1,
                                     dtype=np.int64),
                           index=order.index)
    cols = {"rev_qty": ("r_rev", "r_qty"),
            "rev_orders": ("r_rev", "r_ord"),
            "qty_orders": ("r_qty", "r_ord"),
            "revenue_consensus": ("r_rev", "r_con"),
            "quantity_consensus": ("r_qty", "r_con"),
            "orders_consensus": ("r_ord", "r_con")}
    n = len(g)
    ii, jj = np.triu_indices(n, k=1)
    rha = textstats.round_half_away
    out = {}
    for name, (c1, c2) in cols.items():
        a = g[c1].to_numpy(np.int64)
        b = g[c2].to_numpy(np.int64)
        s = (np.sign(a[jj] - a[ii])
             * np.sign(b[jj] - b[ii])).sum()
        out[f"tau_{name}"] = [float(rha(s / len(ii), 6))]
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Fisher's exact test on the segment × urgency 2×2, with the chi-square
# calibration audit
# ---------------------------------------------------------------------------

#: the 2×2: AUTOMOBILE-segment orders vs others × 1-URGENT priority
#: vs others.
_FISHER_SQL = """
ct AS (SELECT
    CAST(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                   AND o.o_orderpriority = '1-URGENT'
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                   AND o.o_orderpriority != '1-URGENT'
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN c.c_mktsegment != 'AUTOMOBILE'
                   AND o.o_orderpriority = '1-URGENT'
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN c.c_mktsegment != 'AUTOMOBILE'
                   AND o.o_orderpriority != '1-URGENT'
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
       FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)"""


def _fisher_table(sf_dir: str):
    """(a, b, c, d) counts of the segment × urgency table."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"]
                                .to_numpy(np.int64),
                                cust["c_mktsegment"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["o_custkey"].map(cmap)
        keep = seg.notna().to_numpy()
        auto = (seg.to_numpy() == "AUTOMOBILE")[keep]
        urg = (df["o_orderpriority"].to_numpy()
               == "1-URGENT")[keep]
        return pd.DataFrame({
            "g": np.zeros(int(keep.sum()), np.int64),
            "a": (auto & urg).astype(np.int64),
            "b": (auto & ~urg).astype(np.int64),
            "c": (~auto & urg).astype(np.int64),
            "d": (~auto & ~urg).astype(np.int64)})

    t = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {k: (k, "sum") for k in "abcd"}).to_pandas()
    return (int(t["a"].iloc[0]), int(t["b"].iloc[0]),
            int(t["c"].iloc[0]), int(t["d"].iloc[0]))


def _fisher_exact_p(a, b, c, d):
    """(two-sided exact p, mid-p) with the 1+1e-7 relative
    tolerance convention on 'as-or-less-probable' tables."""
    from math import lgamma
    r1, r2 = a + b, c + d
    c1 = a + c
    n = r1 + r2

    def logp(k):
        return (lgamma(r1 + 1) + lgamma(r2 + 1) + lgamma(c1 + 1)
                + lgamma(n - c1 + 1) - lgamma(n + 1)
                - lgamma(k + 1) - lgamma(r1 - k + 1)
                - lgamma(c1 - k + 1) - lgamma(r2 - c1 + k + 1))

    lo = max(0, c1 - r2)
    hi = min(r1, c1)
    lp_obs = logp(a)
    thresh = lp_obs + np.log(1 + 1e-7)
    p = 0.0
    p_at = 0.0
    for k in range(lo, hi + 1):
        lp = logp(k)
        if lp <= thresh:
            p += np.exp(lp)
        if k == a:
            p_at = np.exp(lp)
    return min(p, 1.0), min(p - p_at / 2.0, 1.0)


@register("fisher_exact_segment_urgent", sql=f"""
WITH {_FISHER_SQL},
mg AS (SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
              a + b + c + d AS n
       FROM ct),
kk AS (SELECT mg.*, k.k
       FROM mg JOIN (SELECT UNNEST(generate_series(0, 2000000))
                         AS k) k
         ON k.k >= GREATEST(0, mg.c1 - mg.r2)
        AND k.k <= LEAST(mg.r1, mg.c1)),
lp AS (SELECT k, a, b, c, d, r1, r2, c1, n,
              lgamma(r1 + 1.0) + lgamma(r2 + 1.0)
              + lgamma(c1 + 1.0) + lgamma(n - c1 + 1.0)
              - lgamma(n + 1.0) - lgamma(k + 1.0)
              - lgamma(r1 - k + 1.0) - lgamma(c1 - k + 1.0)
              - lgamma(r2 - c1 + k + 1.0) AS l
       FROM kk),
ob AS (SELECT l AS lobs FROM lp WHERE k = a),
ag AS (SELECT MAX(lp.a) AS a, MAX(lp.b) AS b, MAX(lp.c) AS c,
              MAX(lp.d) AS d,
              SUM(CASE WHEN lp.l <= (SELECT lobs FROM ob)
                            + LN(1.0 + 1e-7)
                       THEN EXP(lp.l) ELSE 0 END) AS p,
              SUM(CASE WHEN lp.k = lp.a THEN EXP(lp.l)
                       ELSE 0 END) AS pat
       FROM lp)
SELECT CAST(a AS BIGINT) AS n11, CAST(b AS BIGINT) AS n12,
       CAST(c AS BIGINT) AS n21, CAST(d AS BIGINT) AS n22,
       ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
           AS odds_ratio,
       ROUND(LEAST(p, 1.0), 6) AS exact_p,
       ROUND(LEAST(p - pat / 2.0, 1.0), 6) AS midp
FROM ag""")
def fisher_exact_segment_urgent(sf_dir: str) -> pd.DataFrame:
    """Fisher's exact test on the AUTOMOBILE-segment × 1-URGENT
    2×2 — the conditional-exact classic the registry's
    contingency family (Cramér's V, λ, U, CMH) has been working
    around: all margins conditioned away, the null distribution
    is hypergeometric, and the two-sided p sums every table
    as-or-less probable than the observed one (with the standard
    1+1e-7 relative tolerance so ties at the observed probability
    are included identically on both engines — the convention R's
    fisher.test pins). mid-p beside it as in the binomial C-test
    row. The O(margin) lgamma sum is exact at any count; the 2×2
    itself is one four-counter reduce. Sample odds ratio printed
    (zero-cell tables would need Haldane's +½; flagged by the
    raw cells being visible)."""
    a, b, c, d = _fisher_table(sf_dir)
    p, midp = _fisher_exact_p(a, b, c, d)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n11": np.array([a], np.int64),
        "n12": np.array([b], np.int64),
        "n21": np.array([c], np.int64),
        "n22": np.array([d], np.int64),
        "odds_ratio": [float(rha(a * d / (b * c), 6))],
        "exact_p": [float(rha(p, 6))],
        "midp": [float(rha(midp, 6))]})


@register("fisher_vs_chi2_calibration", sql=f"""
WITH {_FISHER_SQL},
mg AS (SELECT a, b, c, d,
              CAST(a + b AS DOUBLE) AS r1,
              CAST(c + d AS DOUBLE) AS r2,
              CAST(a + c AS DOUBLE) AS c1,
              CAST(b + d AS DOUBLE) AS c2,
              CAST(a + b + c + d AS DOUBLE) AS n
       FROM ct),
x2 AS (SELECT *,
              n * POW(a * d - CAST(b AS DOUBLE) * c, 2)
                  / (r1 * r2 * c1 * c2) AS chi2,
              n * POW(GREATEST(ABS(a * d - CAST(b AS DOUBLE) * c)
                               - n / 2.0, 0.0), 2)
                  / (r1 * r2 * c1 * c2) AS yates
       FROM mg),
pp AS (SELECT chi2, yates,
              2.0 * {_ASQ.format(v="SQRT(chi2)")} AS p_chi2,
              2.0 * {_ASQ.format(v="SQRT(yates)")} AS p_yates
       FROM x2)
SELECT ROUND(chi2, 6) AS chi2_stat,
       ROUND(p_chi2, 6) AS chi2_p,
       ROUND(yates, 6) AS yates_stat,
       ROUND(p_yates, 6) AS yates_p
FROM pp""")
def fisher_vs_chi2_calibration(sf_dir: str) -> pd.DataFrame:
    """The chi-square approximations on the same 2×2, for reading
    against the exact row: the plain Pearson χ² (anti-conservative
    on discrete tables) and Yates' continuity correction (usually
    over-conservative — it was invented to mimic Fisher and tends
    to overshoot). The three-way comparison with exact_p is the
    calibration lesson in one row: at these cell sizes the plain
    χ² p typically undershoots the exact p and Yates overshoots
    it, bracketing the truth — which is why 'use exact for small
    cells' is the rule, and why the mid-p often lands closest to
    the plain χ² (the known correspondence). χ²₁ tail via
    2·Q(√x) through the registry's pinned A&S polynomial, so
    both engines share one approximation."""
    a, b, c, d = _fisher_table(sf_dir)
    r1, r2 = float(a + b), float(c + d)
    c1, c2 = float(a + c), float(b + d)
    n = r1 + r2
    det = a * d - float(b) * c
    chi2 = n * det * det / (r1 * r2 * c1 * c2)
    yd = max(abs(det) - n / 2.0, 0.0)
    yates = n * yd * yd / (r1 * r2 * c1 * c2)
    p_chi2 = 2.0 * _as_upper_q(np.sqrt(chi2))
    p_yates = 2.0 * _as_upper_q(np.sqrt(yates))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "chi2_stat": [float(rha(chi2, 6))],
        "chi2_p": [float(rha(p_chi2, 6))],
        "yates_stat": [float(rha(yates, 6))],
        "yates_p": [float(rha(p_yates, 6))]})


# ---------------------------------------------------------------------------
# Shapiro–Francia normality: trend residuals + the levels-vs-logs
# verdict on daily revenue
# ---------------------------------------------------------------------------

#: A&S 26.2.22 inverse-normal rational approximation (|ε| < 3e-3),
#: pinned as the registry's Φ⁻¹ — both engines share it exactly.
_INVNORM = ("(CASE WHEN ({p}) < 0.5 THEN "
            "-(SQRT(-2.0 * LN(({p})))"
            " - (2.30753 + 0.27061 * SQRT(-2.0 * LN(({p}))))"
            "   / (1.0 + 0.99229 * SQRT(-2.0 * LN(({p})))"
            "      + 0.04481 * SQRT(-2.0 * LN(({p})))"
            "        * SQRT(-2.0 * LN(({p})))))"
            " ELSE "
            "(SQRT(-2.0 * LN(1.0 - ({p})))"
            " - (2.30753 + 0.27061 * SQRT(-2.0 * LN(1.0 - ({p}))))"
            "   / (1.0 + 0.99229 * SQRT(-2.0 * LN(1.0 - ({p})))"
            "      + 0.04481 * SQRT(-2.0 * LN(1.0 - ({p})))"
            "        * SQRT(-2.0 * LN(1.0 - ({p}))))) END)")


def _invnorm(p):
    """Python mirror of the pinned A&S 26.2.22 Φ⁻¹."""
    p = np.asarray(p, np.float64)
    pl = np.where(p < 0.5, p, 1.0 - p)
    t = np.sqrt(-2.0 * np.log(pl))
    x = t - (2.30753 + 0.27061 * t) \
        / (1.0 + 0.99229 * t + 0.04481 * t * t)
    return np.where(p < 0.5, -x, x)


def _sf_wprime(vals: np.ndarray) -> float:
    """Shapiro–Francia W′ = r²(sorted values, Blom normal scores
    Φ⁻¹((i−3/8)/(n+1/4)))."""
    x = np.sort(vals.astype(np.float64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    m = _invnorm((i - 0.375) / (n + 0.25))
    num = n * (x * m).sum() - x.sum() * m.sum()
    den = (n * (x * x).sum() - x.sum() ** 2) \
        * (n * (m * m).sum() - m.sum() ** 2)
    return num * num / den


_SF_RESID_SQL = f"""
{_DAILY_SQL},
mo AS (SELECT MAX(n) AS n,
              CAST(SUM(t) AS HUGEINT) AS st,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(t * t) AS HUGEINT) AS stt,
              CAST(SUM(t * y) AS HUGEINT) AS sty
       FROM x),
fit AS (SELECT n,
               CAST(n * sty - st * sy AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               CAST(sy AS DOUBLE) / n
               - (CAST(n * sty - st * sy AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE))
                 * (CAST(st AS DOUBLE) / n) AS a
        FROM mo),
rs AS (SELECT x.y - fit.a - fit.b * x.t AS e FROM x, fit),
os_ AS (SELECT e,
               CAST(ROW_NUMBER() OVER (ORDER BY e) AS DOUBLE)
                   AS i,
               CAST(COUNT(*) OVER () AS DOUBLE) AS n
        FROM rs),
sc AS (SELECT e, n,
              {_INVNORM.format(p="(i - 0.375) / (n + 0.25)")} AS m
       FROM os_),
ww AS (SELECT MAX(n) AS n,
              SUM(e) AS se, SUM(m) AS sm,
              SUM(e * e) AS see, SUM(m * m) AS smm,
              SUM(e * m) AS sem
       FROM sc)"""


@register("shapiro_francia_daily_residuals", sql=f"""
WITH {_SF_RESID_SQL}
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(POW(n * sem - se * sm, 2)
             / ((n * see - se * se) * (n * smm - sm * sm)), 6)
           AS w_prime,
       ROUND((n * sem - se * sm)
             / SQRT((n * see - se * se) * (n * smm - sm * sm)),
             6) AS qq_corr,
       CAST(CASE WHEN POW(n * sem - se * sm, 2)
                      / ((n * see - se * se)
                         * (n * smm - sm * sm)) < 0.95
                 THEN 1 ELSE 0 END AS BIGINT)
           AS nonnormal_flag
FROM ww""")
def shapiro_francia_daily_residuals(sf_dir: str) -> pd.DataFrame:
    """Shapiro–Francia W′ on the daily-trend residuals: the squared
    correlation between the residual order statistics and Blom
    normal scores Φ⁻¹((i−⅜)/(n+¼)) — the assumption-check under
    every z, t and CI the daily family prints (Newey–West fixes
    the SE's autocorrelation, BP/White its variance structure;
    this is the third leg, distributional shape). W′ is the
    QQ-plot straightness as a number: 0.99+ is textbook-normal,
    and the flag at < 0.95 (documented heuristic — the exact
    critical value is n-dependent and the registry pins the
    statistic, not Royston's table) marks the regime where the
    robust alternatives (Theil–Sen, Yuen, sign-based tests)
    aren't optional. Φ⁻¹ is the A&S 26.2.22 rational
    approximation pinned as a shared expression, so both engines
    compute the identical scores — no quantile-function library
    variance."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = y.mean() - b * t.mean()
    e = y - a - b * t
    w = _sf_wprime(e)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "w_prime": [float(rha(w, 6))],
        "qq_corr": [float(rha(np.sqrt(w) if w >= 0 else np.nan,
                              6))],
        "nonnormal_flag": np.array([1 if w < 0.95 else 0],
                                   np.int64)})


@register("levels_vs_logs_normality", sql=f"""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM events GROUP BY 1),
pv AS (SELECT CAST(rev AS DOUBLE) AS v,
              LN(CAST(rev AS DOUBLE)) AS lv
       FROM d WHERE rev > 0),
r1 AS (SELECT v AS x,
              CAST(ROW_NUMBER() OVER (ORDER BY v) AS DOUBLE) AS i,
              CAST(COUNT(*) OVER () AS DOUBLE) AS n
       FROM pv),
s1 AS (SELECT x, n,
              {_INVNORM.format(p="(i - 0.375) / (n + 0.25)")} AS m
       FROM r1),
w1 AS (SELECT MAX(n) AS n, SUM(x) AS sx, SUM(m) AS sm,
              SUM(x * x) AS sxx, SUM(m * m) AS smm,
              SUM(x * m) AS sxm
       FROM s1),
r2 AS (SELECT lv AS x,
              CAST(ROW_NUMBER() OVER (ORDER BY lv) AS DOUBLE)
                  AS i,
              CAST(COUNT(*) OVER () AS DOUBLE) AS n
       FROM pv),
s2 AS (SELECT x, n,
              {_INVNORM.format(p="(i - 0.375) / (n + 0.25)")} AS m
       FROM r2),
w2 AS (SELECT MAX(n) AS n, SUM(x) AS sx, SUM(m) AS sm,
              SUM(x * x) AS sxx, SUM(m * m) AS smm,
              SUM(x * m) AS sxm
       FROM s2)
SELECT CAST(w1.n AS BIGINT) AS n_days,
       ROUND(POW(w1.n * w1.sxm - w1.sx * w1.sm, 2)
             / ((w1.n * w1.sxx - w1.sx * w1.sx)
                * (w1.n * w1.smm - w1.sm * w1.sm)), 6)
           AS w_levels,
       ROUND(POW(w2.n * w2.sxm - w2.sx * w2.sm, 2)
             / ((w2.n * w2.sxx - w2.sx * w2.sx)
                * (w2.n * w2.smm - w2.sm * w2.sm)), 6)
           AS w_logs,
       CAST(CASE WHEN POW(w2.n * w2.sxm - w2.sx * w2.sm, 2)
                      / ((w2.n * w2.sxx - w2.sx * w2.sx)
                         * (w2.n * w2.smm - w2.sm * w2.sm))
                      > POW(w1.n * w1.sxm - w1.sx * w1.sm, 2)
                        / ((w1.n * w1.sxx - w1.sx * w1.sx)
                           * (w1.n * w1.smm - w1.sm * w1.sm))
                 THEN 1 ELSE 0 END AS BIGINT) AS logs_win
FROM w1, w2""")
def levels_vs_logs_normality(sf_dir: str) -> pd.DataFrame:
    """The modeling-scale verdict: Shapiro–Francia W′ of daily
    revenue in LEVELS vs in LOGS (positive days). This settles,
    with one comparison, the question implicit in half the daily
    family — whether additive machinery (means, OLS bands,
    z-intervals) should run on revenue or on log-revenue:
    revenue-like quantities are typically right-skewed products
    of factors, so w_logs > w_levels (logs_win = 1) is the
    expected verdict, and its SIZE says how much distortion the
    levels-scale dashboards carry (w_levels 0.85 vs w_logs 0.99
    means every levels-scale sigma-band is materially wrong in
    the upper tail). When levels win instead, revenue is
    sum-dominated (many small orders — CLT already did the work)
    and log-transforming would be cargo cult. Same pinned Φ⁻¹
    scores; exact cents input."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "day": us // 86_400_000_000,
            "rev": np.rint(df["value"].to_numpy(np.float64)
                           * 100).astype(np.int64)})

    d = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")}).to_pandas()
    rev = d["rev"].to_numpy(np.int64)
    rev = rev[rev > 0].astype(np.float64)
    w_lvl = _sf_wprime(rev)
    w_log = _sf_wprime(np.log(rev))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([len(rev)], np.int64),
        "w_levels": [float(rha(w_lvl, 6))],
        "w_logs": [float(rha(w_log, 6))],
        "logs_win": np.array([1 if w_log > w_lvl else 0],
                             np.int64)})


# ---------------------------------------------------------------------------
# Statistical process control: the daily error-rate p-chart with
# Western Electric run rules
# ---------------------------------------------------------------------------

#: daily (n, errors) with the varying-limit p-chart z-scores
#: z_d = (p_d − p̄)/√(p̄(1−p̄)/n_d).
_PCHART_SQL = """
d AS (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                           ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY 1),
pb AS (SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS p FROM d),
z AS (SELECT day, n, x,
             CAST(x AS DOUBLE) / n AS pd,
             (CAST(x AS DOUBLE) / n - pb.p)
                 / SQRT(pb.p * (1.0 - pb.p) / n) AS z
      FROM d, pb)"""


def _pchart_z(sf_dir: str):
    """(day array, n, x, pbar, z) in day order."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "day": us // 86_400_000_000,
            "n": np.ones(len(us), np.int64),
            "x": (df["event_type"].to_numpy()
                  == "error").astype(np.int64)})

    d = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["day"], {"n": ("n", "sum"), "x": ("x", "sum")}) \
        .to_pandas().sort_values("day", ignore_index=True)
    day = d["day"].to_numpy(np.int64)
    n = d["n"].to_numpy(np.int64)
    x = d["x"].to_numpy(np.int64)
    pbar = float(x.sum()) / float(n.sum())
    z = (x / n - pbar) / np.sqrt(pbar * (1.0 - pbar) / n)
    return day, n, x, pbar, z


@register("p_chart_daily_errors", sql=f"""
WITH {_PCHART_SQL}
SELECT day - (SELECT MIN(day) FROM d) + 1 AS day_index,
       n AS events, x AS errors,
       ROUND(pd, 6) AS p,
       ROUND((SELECT p FROM pb), 6) AS p_bar,
       ROUND((SELECT p FROM pb)
             + 3.0 * SQRT((SELECT p FROM pb)
                          * (1.0 - (SELECT p FROM pb)) / n), 6)
           AS ucl,
       ROUND(GREATEST((SELECT p FROM pb)
                      - 3.0 * SQRT((SELECT p FROM pb)
                                   * (1.0 - (SELECT p FROM pb))
                                   / n), 0.0), 6) AS lcl,
       CAST(CASE WHEN ABS(z) > 3.0 THEN 1 ELSE 0 END AS BIGINT)
           AS beyond_3sigma
FROM z ORDER BY day""")
def p_chart_daily_errors(sf_dir: str) -> pd.DataFrame:
    """The Shewhart p-chart on the daily error rate with
    VARYING control limits — p̄ ± 3√(p̄(1−p̄)/n_d), so heavy days
    get tighter limits exactly in proportion to their information
    content. This is the piece the fixed-threshold error alerting
    (present: SLO burn, anomaly scores) doesn't do: a 2% error
    day is an incident when the day carried 50k events and noise
    when it carried 200, and the chart prices that difference per
    day rather than per policy. LCL clamps at 0 (a below-LCL day
    on an unclamped chart would be the 'too good — check the
    telemetry' signal; with clamping it surfaces via the z in the
    rules row). One (n, x) reduce; the chart is calendar-bounded
    output."""
    day, n, x, pbar, z = _pchart_z(sf_dir)
    rha = textstats.round_half_away
    sig = np.sqrt(pbar * (1.0 - pbar) / n)
    return pd.DataFrame({
        "day_index": (day - day.min() + 1).astype(np.int64),
        "events": n, "errors": x,
        "p": rha(x / n, 6),
        "p_bar": rha(np.full(len(n), pbar), 6),
        "ucl": rha(pbar + 3.0 * sig, 6),
        "lcl": rha(np.maximum(pbar - 3.0 * sig, 0.0), 6),
        "beyond_3sigma": (np.abs(z) > 3.0).astype(np.int64)})


@register("western_electric_rules_errors", sql=f"""
WITH {_PCHART_SQL},
lg AS (SELECT day, z,
              LAG(z, 1) OVER (ORDER BY day) AS z1,
              LAG(z, 2) OVER (ORDER BY day) AS z2,
              SUM(CASE WHEN z > 0 THEN 1 ELSE 0 END)
                  OVER (ORDER BY day
                        ROWS 7 PRECEDING) AS pos8,
              SUM(CASE WHEN z < 0 THEN 1 ELSE 0 END)
                  OVER (ORDER BY day
                        ROWS 7 PRECEDING) AS neg8,
              ROW_NUMBER() OVER (ORDER BY day) AS i
       FROM z),
fl AS (SELECT i, z,
              CASE WHEN ABS(z) > 3 THEN 1 ELSE 0 END AS r1,
              CASE WHEN i >= 3 AND
                   ((CASE WHEN z > 2 THEN 1 ELSE 0 END
                     + CASE WHEN z1 > 2 THEN 1 ELSE 0 END
                     + CASE WHEN z2 > 2 THEN 1 ELSE 0 END) >= 2
                    OR
                    (CASE WHEN z < -2 THEN 1 ELSE 0 END
                     + CASE WHEN z1 < -2 THEN 1 ELSE 0 END
                     + CASE WHEN z2 < -2 THEN 1 ELSE 0 END) >= 2)
                   THEN 1 ELSE 0 END AS r2,
              CASE WHEN i >= 8 AND (pos8 = 8 OR neg8 = 8)
                   THEN 1 ELSE 0 END AS r4
       FROM lg)
SELECT CAST(SUM(r1) AS BIGINT) AS rule1_days,
       CAST(SUM(r2) AS BIGINT) AS rule2_days,
       CAST(SUM(r4) AS BIGINT) AS rule4_days,
       CAST(COALESCE(MIN(CASE WHEN r1 = 1 THEN i END), -1)
            AS BIGINT) AS first_rule1_day,
       CAST(COALESCE(MIN(CASE WHEN r2 = 1 THEN i END), -1)
            AS BIGINT) AS first_rule2_day,
       CAST(COALESCE(MIN(CASE WHEN r4 = 1 THEN i END), -1)
            AS BIGINT) AS first_rule4_day
FROM fl""")
def western_electric_rules_errors(sf_dir: str) -> pd.DataFrame:
    """Western Electric run rules replayed on the p-chart's z
    sequence: rule 1 (a point beyond 3σ — the catastrophic day),
    rule 2 (2 of 3 consecutive beyond 2σ on the same side — the
    developing shift rule 1 misses until it's worse), and rule 4
    (8 consecutive on the same side of center — the small
    sustained drift NO sigma rule catches, because eight
    half-sigma days never trip a limit yet P(8 same side) ≈ 0.8%
    under control). The three rules are the classic sensitivity
    ladder — spike / shift / drift — and the first-trigger day
    indices say which failure mode arrived first, which is the
    diagnosis (a rule-4-first history is slow regression,
    rule-1-first is incident-driven). Strict same-side signs
    (z = 0 breaks a run); windowed flags evaluated only once
    their full window exists (i ≥ 3, i ≥ 8), pinned identically;
    −1 when a rule never fired."""
    day, n, x, pbar, z = _pchart_z(sf_dir)
    nn = len(z)
    r1 = np.abs(z) > 3
    r2 = np.zeros(nn, bool)
    r4 = np.zeros(nn, bool)
    for i in range(nn):
        if i >= 2:
            tri = z[i - 2:i + 1]
            if (tri > 2).sum() >= 2 or (tri < -2).sum() >= 2:
                r2[i] = True
        if i >= 7:
            w = z[i - 7:i + 1]
            if (w > 0).all() or (w < 0).all():
                r4[i] = True

    def first(v):
        idx = np.flatnonzero(v)
        return int(idx[0] + 1) if len(idx) else -1

    return pd.DataFrame({
        "rule1_days": np.array([int(r1.sum())], np.int64),
        "rule2_days": np.array([int(r2.sum())], np.int64),
        "rule4_days": np.array([int(r4.sum())], np.int64),
        "first_rule1_day": np.array([first(r1)], np.int64),
        "first_rule2_day": np.array([first(r2)], np.int64),
        "first_rule4_day": np.array([first(r4)], np.int64)})


# ---------------------------------------------------------------------------
# Downside-risk ratios on daily revenue: Omega/Sortino at the mean +
# the Omega curve at the quartiles
# ---------------------------------------------------------------------------

def _daily_rev_filled(sf_dir: str) -> np.ndarray:
    """Zero-filled daily revenue cents."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "day": us // 86_400_000_000,
            "rev": np.rint(df["value"].to_numpy(np.float64)
                           * 100).astype(np.int64)})

    d = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")}).to_pandas()
    day = d["day"].to_numpy(np.int64)
    lo, hi = int(day.min()), int(day.max())
    rev = np.zeros(hi - lo + 1, np.int64)
    rev[day - lo] = d["rev"].to_numpy(np.int64)
    return rev


_OMEGA_SQL = """
d AS (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM events GROUP BY 1),
sp AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
x AS (SELECT CAST(COALESCE(d.rev, 0) AS BIGINT) AS rev
      FROM sp CROSS JOIN UNNEST(generate_series(sp.lo, sp.hi))
          AS g(day)
      LEFT JOIN d ON d.day = g.day)"""


@register("omega_sortino_daily_revenue", sql=f"""
WITH {_OMEGA_SQL},
mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(CAST(rev AS DOUBLE)) / COUNT(*) AS mu
       FROM x),
ag AS (SELECT mn.n, mn.mu,
              SUM(GREATEST(rev - mn.mu, 0.0)) AS up,
              SUM(GREATEST(mn.mu - rev, 0.0)) AS dn,
              SUM(POW(GREATEST(mn.mu - rev, 0.0), 2)) AS dn2
       FROM x, mn GROUP BY 1, 2)
SELECT n AS n_days,
       ROUND(mu / 100.0, 2) AS mean_daily,
       ROUND(CASE WHEN dn > 0 THEN up / dn END, 6)
           AS omega_at_mean,
       ROUND(SQRT(dn2 / n) / 100.0, 6) AS downside_dev,
       ROUND((up / n) / SQRT(dn2 / n), 6) AS upside_over_ddev
FROM ag""")
def omega_sortino_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Omega and Sortino-style downside ratios of daily revenue at
    the mean threshold: Ω = Σ(x−θ)₊/Σ(θ−x)₊ (the ratio of
    upside mass to downside mass — by construction 1 exactly at
    θ = mean, so the informative columns are the PIECES) and the
    downside deviation √(E[(θ−x)₊²]), the denominator the
    Sortino convention uses because symmetric SD double-counts
    good surprises as risk. Every sigma-based headroom rule in
    the registry implicitly treats a great day and a terrible day
    as equal evidence of volatility; downside_dev is the number
    to substitute when the question is 'how bad do bad days get',
    and upside_over_ddev is the asymmetry read (high = gains
    come in spikes while losses are shallow — the lottery
    profile; low = the reverse, quiet gains with crash risk).
    Zero-filled calendar, exact cent partial moments."""
    rev = _daily_rev_filled(sf_dir).astype(np.float64)
    n = len(rev)
    mu = rev.sum() / n
    up = float(np.maximum(rev - mu, 0.0).sum())
    dn = float(np.maximum(mu - rev, 0.0).sum())
    dn2 = float((np.maximum(mu - rev, 0.0) ** 2).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "mean_daily": [float(rha(mu / 100.0, 2))],
        "omega_at_mean": [float(rha(up / dn, 6))
                          if dn > 0 else np.nan],
        "downside_dev": [float(rha(np.sqrt(dn2 / n) / 100.0, 6))],
        "upside_over_ddev": [float(rha((up / n)
                                       / np.sqrt(dn2 / n), 6))]})


@register("omega_curve_daily_revenue", sql=f"""
WITH {_OMEGA_SQL},
os_ AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
               COUNT(*) OVER () AS n
        FROM x),
qq AS (SELECT p.num,
              (SELECT CAST(rev AS DOUBLE) FROM os_
               WHERE rn = (p.num * (SELECT MAX(n) FROM os_)
                           + 3) // 4) AS th
       FROM (SELECT UNNEST([1, 2, 3]) AS num) p),
ag AS (SELECT qq.num, qq.th,
              SUM(GREATEST(x.rev - qq.th, 0.0)) AS up,
              SUM(GREATEST(qq.th - x.rev, 0.0)) AS dn
       FROM x, qq GROUP BY 1, 2)
SELECT CAST(num * 25 AS BIGINT) AS threshold_pctile,
       ROUND(th / 100.0, 2) AS threshold_value,
       ROUND(CASE WHEN dn > 0 THEN up / dn END, 6) AS omega
FROM ag ORDER BY num""")
def omega_curve_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """The Omega curve at the revenue quartiles — Ω(θ) as θ sweeps
    q25/q50/q75 (rational ⌈p·n⌉ order-statistic thresholds). The
    curve's DECAY RATE is the distribution's whole risk story in
    three points (Ω is a monotone transform of the full CDF, so
    unlike any single ratio it cannot hide tail shape): Ω(q25)
    large and Ω(q75) still near 1 means mass sits tight above the
    lower quartile — a floor business; Ω collapsing between q25
    and q50 means the median is barely defended. Two revenue
    streams with equal mean and SD routinely have visibly
    different Omega curves, which is the standard argument for
    this diagnostic over moment summaries. Exact integer
    thresholds; shared partial-moment expressions."""
    rev = _daily_rev_filled(sf_dir).astype(np.float64)
    n = len(rev)
    srt = np.sort(rev)
    rha = textstats.round_half_away
    rows = []
    for num in (1, 2, 3):
        r = (num * n + 3) // 4
        th = float(srt[r - 1])
        up = float(np.maximum(rev - th, 0.0).sum())
        dn = float(np.maximum(th - rev, 0.0).sum())
        rows.append((num * 25, float(rha(th / 100.0, 2)),
                     float(rha(up / dn, 6)) if dn > 0
                     else np.nan))
    return pd.DataFrame(rows, columns=[
        "threshold_pctile", "threshold_value", "omega"]).astype(
        {"threshold_pctile": np.int64})


# ---------------------------------------------------------------------------
# The ABC × XYZ cross matrix: where inventory policy actually lives
# ---------------------------------------------------------------------------

#: per-part ABC revenue class (cum-prev 80/95 rule, rev-desc/partkey
#: ties) joined to the XYZ monthly-demand-CV class (0.5/1.0 cuts) —
#: both parent queries' conventions verbatim.
_ABCXYZ_SQL = """
r AS (SELECT l_partkey AS p,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM r),
w AS (SELECT p, rev,
             CAST(COALESCE(SUM(rev) OVER (
                 ORDER BY rev DESC, p
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT)
                 AS cum_prev
      FROM r),
ab AS (SELECT p, rev,
              CASE WHEN 100 * cum_prev < 80 * t.tot THEN 'A'
                   WHEN 100 * cum_prev < 95 * t.tot THEN 'B'
                   ELSE 'C' END AS abc
       FROM w, t),
q AS (SELECT l_partkey AS pk,
             strftime(l_shipdate, '%Y-%m') AS m,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
      FROM lineitem),
mm AS (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS nm FROM q),
pm AS (SELECT pk, m, CAST(SUM(qc) AS BIGINT) AS qv
       FROM q GROUP BY 1, 2),
ps AS (SELECT pk, CAST(SUM(qv) AS BIGINT) AS s1,
              CAST(SUM(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS s2
       FROM pm GROUP BY 1),
xy AS (SELECT pk,
              CASE WHEN sqrt(CAST(nm * s2 - CAST(s1 AS HUGEINT)
                                  * s1 AS DOUBLE)
                             / (nm * (nm - 1.0)))
                        / (CAST(s1 AS DOUBLE) / nm) < 0.5 THEN 'X'
                   WHEN sqrt(CAST(nm * s2 - CAST(s1 AS HUGEINT)
                                  * s1 AS DOUBLE)
                             / (nm * (nm - 1.0)))
                        / (CAST(s1 AS DOUBLE) / nm) < 1.0 THEN 'Y'
                   ELSE 'Z' END AS xyz
       FROM ps, mm),
cx AS (SELECT ab.abc, xy.xyz, ab.rev
       FROM ab JOIN xy ON xy.pk = ab.p)"""


def _abcxyz_cells(sf_dir: str) -> pd.DataFrame:
    """(abc, xyz, n_parts, rev) cell table, parents' conventions."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity", "l_shipdate"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p": df["l_partkey"].to_numpy(np.int64),
            "rev": np.rint(df["l_extendedprice"]
                           .to_numpy(np.float64) * 100)
            .astype(np.int64),
            "m": df["l_shipdate"].dt.strftime("%Y-%m").to_numpy(),
            "qc": np.rint(df["l_quantity"].to_numpy(np.float64)
                          * 100).astype(np.int64)})

    base = li.map_batches(prep, batch_format="pandas")
    revs = reduce_sink(base, ["p"],
                       {"rev": ("rev", "sum")}).to_pandas()
    pmv = reduce_sink(base, ["p", "m"],
                      {"qc": ("qc", "sum")}).to_pandas()
    nm = pmv["m"].nunique()
    revs = revs.sort_values(["rev", "p"],
                            ascending=[False, True],
                            kind="mergesort", ignore_index=True)
    tot = int(revs["rev"].sum())
    cum_prev = np.concatenate(
        [[0], np.cumsum(revs["rev"].to_numpy(np.int64))[:-1]])
    abc = np.where(100 * cum_prev < 80 * tot, "A",
                   np.where(100 * cum_prev < 95 * tot, "B", "C"))
    amap = dict(zip(revs["p"], abc))
    ps = pmv.groupby("p").agg(
        s1=("qc", "sum"),
        s2=("qc", lambda v: int((v.astype(object) ** 2).sum()))) \
        .reset_index()
    s1 = ps["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = np.array([float(v) for v in ps["s2"]], np.float64)
    cov = np.sqrt((nm * s2 - s1 * s1) / (nm * (nm - 1.0))) \
        / (s1 / nm)
    xyz = np.where(cov < 0.5, "X", np.where(cov < 1.0, "Y", "Z"))
    xmap = dict(zip(ps["p"], xyz))
    rmap = dict(zip(revs["p"], revs["rev"].astype(int)))
    rows = {}
    for p in revs["p"]:
        key = (amap[p], xmap[p])
        n0, r0 = rows.get(key, (0, 0))
        rows[key] = (n0 + 1, r0 + rmap[p])
    return pd.DataFrame(
        [(a, x, n, r) for (a, x), (n, r) in sorted(rows.items())],
        columns=["abc", "xyz", "n_parts", "rev"])


@register("abc_xyz_matrix", sql=f"""
WITH {_ABCXYZ_SQL},
tt AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM cx)
SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(rev) AS DOUBLE)
             / (SELECT tot FROM tt) * 100.0, 6) AS revenue_pct
FROM cx GROUP BY 1, 2 ORDER BY 1, 2""")
def abc_xyz_matrix(sf_dir: str) -> pd.DataFrame:
    """The ABC × XYZ cross-classification — the nine-cell map
    where inventory policy actually lives, built from BOTH parent
    queries' conventions verbatim (ABC: cumulative-previous 80/95
    revenue rule with rev-desc/partkey ties; XYZ: monthly-demand
    CV at 0.5/1.0). The parents each give a one-axis marginal;
    every operations textbook's point is that the DIAGONAL
    interaction is the decision: AX (high revenue, steady) is the
    automate-replenishment cell, AZ (high revenue, erratic) is
    where forecasting fails exactly where it matters most and
    safety stock or make-to-order takes over, CX is candidate
    for consolidation, CZ for discontinuation review.
    revenue_pct per cell says how much of the business sits in
    each policy regime. Part-keyed join of the two classifiers;
    cells exact."""
    c = _abcxyz_cells(sf_dir)
    tot = int(c["rev"].sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "abc": c["abc"], "xyz": c["xyz"],
        "n_parts": c["n_parts"].astype(np.int64),
        "revenue_pct": rha(c["rev"].to_numpy(np.int64)
                           / tot * 100.0, 6)})


@register("abc_xyz_policy_exposure", sql=f"""
WITH {_ABCXYZ_SQL},
tt AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot,
              CAST(COUNT(*) AS BIGINT) AS np_ FROM cx)
SELECT (SELECT np_ FROM tt) AS n_parts,
       ROUND(CAST(SUM(CASE WHEN xyz = 'X' AND abc IN ('A', 'B')
                           THEN rev ELSE 0 END) AS DOUBLE)
             / (SELECT tot FROM tt) * 100.0, 6)
           AS automatable_rev_pct,
       ROUND(CAST(SUM(CASE WHEN abc = 'A' AND xyz = 'Z'
                           THEN rev ELSE 0 END) AS DOUBLE)
             / (SELECT tot FROM tt) * 100.0, 6)
           AS az_exposure_pct,
       CAST(SUM(CASE WHEN abc = 'C' AND xyz = 'Z' THEN 1
                     ELSE 0 END) AS BIGINT) AS cz_review_parts,
       ROUND(CAST(SUM(CASE WHEN xyz = 'Z' THEN rev ELSE 0 END)
                  AS DOUBLE)
             / (SELECT tot FROM tt) * 100.0, 6)
           AS erratic_rev_pct
FROM cx""")
def abc_xyz_policy_exposure(sf_dir: str) -> pd.DataFrame:
    """The one-row policy exposure summary off the same matrix:
    automatable_rev_pct (A/B revenue in steady X demand — the
    share a vanilla reorder-point system can carry),
    az_exposure_pct (the high-stakes forecasting-fails cell: the
    revenue fraction whose demand is both large and erratic — the
    risk-pooling and newsvendor rows are precisely the tools for
    THIS slice), cz_review_parts (the discontinue-candidate
    count), and the total erratic revenue share. Reading
    automatable vs az is the staffing decision in two numbers:
    70/5 runs on autopilot with a small exceptions desk, 40/25
    needs demand planners. Same part-keyed classification."""
    c = _abcxyz_cells(sf_dir)
    tot = int(c["rev"].sum())
    npar = int(c["n_parts"].sum())

    def cell_rev(pred):
        m = c.apply(pred, axis=1)
        return int(c[m]["rev"].sum())

    auto = cell_rev(lambda r: r["xyz"] == "X"
                    and r["abc"] in ("A", "B"))
    az = cell_rev(lambda r: r["abc"] == "A" and r["xyz"] == "Z")
    errat = cell_rev(lambda r: r["xyz"] == "Z")
    cz = int(c[(c["abc"] == "C")
               & (c["xyz"] == "Z")]["n_parts"].sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_parts": np.array([npar], np.int64),
        "automatable_rev_pct": [float(rha(auto / tot * 100.0,
                                          6))],
        "az_exposure_pct": [float(rha(az / tot * 100.0, 6))],
        "cz_review_parts": np.array([cz], np.int64),
        "erratic_rev_pct": [float(rha(errat / tot * 100.0, 6))]})


# ---------------------------------------------------------------------------
# Survival-curve shape: Keyfitz entropy + mean residual life at day 7
# on the time-to-first-purchase KM grid
# ---------------------------------------------------------------------------

@register("keyfitz_entropy_purchase_cohorts", sql=f"""
WITH {_RMST_SQL},
ag AS (SELECT cohort,
              SUM(s) AS rmst,
              SUM(CASE WHEN s > 0 AND s < 1 THEN -s * LN(s)
                       ELSE 0 END) AS hnum
       FROM su GROUP BY 1)
SELECT cohort,
       ROUND(rmst, 6) AS rmst14_days,
       ROUND(hnum / rmst, 6) AS keyfitz_h
FROM ag ORDER BY cohort""")
def keyfitz_entropy_purchase_cohorts(sf_dir: str) -> pd.DataFrame:
    """Keyfitz's life-table entropy H = −ΣS ln S / ΣS on the same
    restricted 0–13 KM grid the RMST row integrates — the SHAPE
    number the RMST level hides. Two cohorts can share RMST = 8
    days with opposite dynamics: H → 0 is the rectangular curve
    (everyone converts at nearly the same day — conversion is a
    scheduled event, so time the nudge once), H near 1 is
    exponential-like (constant hazard — conversion is memoryless
    and a nudge is equally valuable every day). Demography reads
    H as the percentage change in life expectancy per
    proportional hazard reduction, which translates directly: at
    H = 0.2, a 10% across-the-board conversion-hazard lift buys
    only a 2% RMST change — the effort-sizing number. Terms with
    S = 1 or S = 0 contribute exactly 0 (pinned); same carried-
    forward grid conventions."""
    lt = _rmst_tables(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for cohort, (n, ev14, su) in sorted(lt.items()):
        rmst = float(su.sum())
        hnum = float(np.where((su > 0) & (su < 1),
                              -su * np.log(np.where(su > 0, su,
                                                    1.0)),
                              0.0).sum())
        rows.append((cohort, float(rha(rmst, 6)),
                     float(rha(hnum / rmst, 6))))
    return pd.DataFrame(rows, columns=[
        "cohort", "rmst14_days", "keyfitz_h"])


@register("purchase_mrl_at_day7_cohorts", sql=f"""
WITH {_RMST_SQL},
ag AS (SELECT cohort,
              SUM(s) AS rmst,
              SUM(CASE WHEN u >= 7 THEN s ELSE 0 END) AS tail,
              MAX(CASE WHEN u = 7 THEN s END) AS s7
       FROM su GROUP BY 1)
SELECT cohort,
       ROUND(s7, 6) AS survival_at_7,
       ROUND(CASE WHEN s7 > 0 THEN tail / s7 END, 6)
           AS mrl7_days,
       ROUND(tail / rmst * 100.0, 6) AS rmst_share_after_7_pct
FROM ag ORDER BY cohort""")
def purchase_mrl_at_day7_cohorts(sf_dir: str) -> pd.DataFrame:
    """Mean residual life at day 7 on the restricted grid:
    m(7) = Σ_{{u=7..13}} S(u)/S(7) — the expected additional
    purchase-free days (within the fortnight) for a user who
    hasn't bought after one week. This is the re-anchored
    question the unconditional RMST can't answer and lifecycle
    marketing actually asks: the day-7 non-converter is a
    DIFFERENT population than the day-0 signup (the eager buyers
    have left the risk set), and m(7) ≈ 7 (its maximum) says
    week-one non-buyers essentially never convert in week two —
    reallocate the budget — while m(7) well below says week two
    still works. survival_at_7 sizes that population;
    rmst_share_after_7_pct is the complementary aggregate view.
    NULL when no one survives to day 7, identically both
    engines."""
    lt = _rmst_tables(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for cohort, (n, ev14, su) in sorted(lt.items()):
        rmst = float(su.sum())
        tail = float(su[7:].sum())
        s7 = float(su[7])
        mrl = tail / s7 if s7 > 0 else np.nan
        rows.append((cohort, float(rha(s7, 6)),
                     float(rha(mrl, 6)),
                     float(rha(tail / rmst * 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "cohort", "survival_at_7", "mrl7_days",
        "rmst_share_after_7_pct"])


# ---------------------------------------------------------------------------
# Serial-number inference: the German-tank user estimate + the
# ID-space validity audit
# ---------------------------------------------------------------------------

@register("german_tank_user_estimate", sql="""
WITH u AS (SELECT DISTINCT user_id FROM events),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(user_id) AS BIGINT) AS m,
             CAST(MIN(user_id) AS BIGINT) AS mn
      FROM u)
SELECT k AS observed_users, m AS max_id, mn AS min_id,
       ROUND(m + CAST(m AS DOUBLE) / k - 1.0, 6) AS n_hat,
       ROUND(SQRT(CAST(m AS DOUBLE) * GREATEST(m - k, 0)
                  * (m + 1)
                  / (k * CAST(k + 2 AS DOUBLE)
                     * k)), 6) AS se_approx,
       ROUND(CAST(k AS DOUBLE) / (m - mn + 1) * 100.0, 6)
           AS sample_fraction_pct
FROM s""")
def german_tank_user_estimate(sf_dir: str) -> pd.DataFrame:
    """The German-tank (serial-number) estimate of the TOTAL user
    population from observed IDs: under sequential assignment and
    uniform sampling, the UMVU estimator is N̂ = m + m/k − 1 (max
    plus the average observed gap). This triangulates the
    capture-recapture family from an entirely different
    assumption set — Lincoln–Petersen/Schnabel need recaptures
    across occasions, Good–Toulmin needs the frequency spectrum,
    the tank estimator needs only that the ID column is a
    sequence — and when all three agree the audience-size claim
    is assumption-robust in a way no single method provides. The
    approximate SE uses the known variance N(N−k)(N+1)/(k(k+2))/k
    order with N̂ plugged in (documented). VALIDITY IS NOT
    ASSUMED: the companion audit row decides whether the
    sequential-assignment premise holds at all; quote this
    number only with that row green. Distinct-ID reduce only."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum")}).to_pandas()
    ids = u["user_id"].to_numpy(np.int64)
    k = len(ids)
    m = int(ids.max())
    mn = int(ids.min())
    n_hat = m + m / k - 1.0
    se = np.sqrt(float(m) * max(m - k, 0) * (m + 1)
                 / (k * float(k + 2) * k))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "observed_users": np.array([k], np.int64),
        "max_id": np.array([m], np.int64),
        "min_id": np.array([mn], np.int64),
        "n_hat": [float(rha(n_hat, 6))],
        "se_approx": [float(rha(se, 6))],
        "sample_fraction_pct": [float(rha(
            k / (m - mn + 1) * 100.0, 6))]})


@register("id_space_validity_audit", sql="""
WITH u AS (SELECT DISTINCT user_id AS i FROM events),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(i) AS BIGINT) AS m,
             CAST(MIN(i) AS BIGINT) AS mn
      FROM u),
gp AS (SELECT i - LAG(i) OVER (ORDER BY i) AS g FROM u),
ga AS (SELECT CAST(MAX(g) AS BIGINT) AS gmax,
              SUM(CAST(g AS DOUBLE) * g) AS g2,
              CAST(COUNT(*) AS BIGINT) AS ng
       FROM gp WHERE g IS NOT NULL)
SELECT s.k AS observed_users,
       ROUND(CAST(s.k AS DOUBLE) / (s.m - s.mn + 1) * 100.0, 6)
           AS density_pct,
       ga.gmax AS largest_gap,
       ROUND(ga.g2 / ga.ng
             / POW(CAST(s.m - s.mn AS DOUBLE) / ga.ng, 2), 6)
           AS gap_dispersion,
       CAST(CASE WHEN CAST(s.k AS DOUBLE) / (s.m - s.mn + 1)
                      > 0.5
                  AND ga.g2 / ga.ng
                      / POW(CAST(s.m - s.mn AS DOUBLE) / ga.ng, 2)
                      < 3.0
                 THEN 1 ELSE 0 END AS BIGINT)
           AS tank_estimator_valid
FROM s, ga""")
def id_space_validity_audit(sf_dir: str) -> pd.DataFrame:
    """The audit that licenses (or revokes) the tank estimate: ID
    density over the observed span, the largest gap, and the gap
    dispersion E[g²]/E[g]² (≈2 for uniform random sampling of a
    dense sequence — geometric-ish gaps; ≫2 means the ID space is
    block-allocated or sharded, e.g. per-region ranges, where the
    'average gap' is a fiction and N̂ silently estimates the
    wrong universe; the 1.0 floor means perfectly consecutive).
    The flag (density > 50% AND dispersion < 3, documented
    heuristics) is deliberately conservative: serial-number
    inference is the classic example of a method that is
    EXACTLY right under its assumptions and wildly wrong one
    assumption away, so the audit row exists to be consulted
    before the estimate row is quoted — the same
    estimate-plus-license pattern as the IV/Hausman pair."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64)})

    u = reduce_sink(
        _events(sf_dir, ["user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    ids = u["user_id"].to_numpy(np.int64)
    k = len(ids)
    m, mn = int(ids.max()), int(ids.min())
    g = np.diff(ids).astype(np.float64)
    ng = len(g)
    g2 = float((g * g).sum())
    disp = (g2 / ng) / ((m - mn) / ng) ** 2
    dens = k / (m - mn + 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "observed_users": np.array([k], np.int64),
        "density_pct": [float(rha(dens * 100.0, 6))],
        "largest_gap": np.array([int(g.max())], np.int64),
        "gap_dispersion": [float(rha(disp, 6))],
        "tank_estimator_valid": np.array(
            [1 if dens > 0.5 and disp < 3.0 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Behavioral re-identification risk: quasi-identifier uniqueness +
# the attribute-attribution ladder
# ---------------------------------------------------------------------------

#: per-user behavioral quasi-identifier: 5-bit type mask, modal
#: 6-hour band (ties to the smallest band), and activity decile
#: (events desc, user_id ties, ((rank−1)·10)//n + 1).
_BQI_SQL = """
tb AS (SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_click,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_error,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_purch,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_signup,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_view,
              CAST(COUNT(*) AS BIGINT) AS n_ev
       FROM events GROUP BY 1),
hb AS (SELECT user_id, hour(ts) // 6 AS band,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM events GROUP BY 1, 2),
mh AS (SELECT user_id, band FROM (
           SELECT user_id, band,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY n DESC, band) AS rn
           FROM hb) q WHERE rn = 1),
qi AS (SELECT tb.user_id,
              CAST(CASE WHEN c_click > 0 THEN 1 ELSE 0 END
                   + CASE WHEN c_error > 0 THEN 2 ELSE 0 END
                   + CASE WHEN c_purch > 0 THEN 4 ELSE 0 END
                   + CASE WHEN c_signup > 0 THEN 8 ELSE 0 END
                   + CASE WHEN c_view > 0 THEN 16 ELSE 0 END
                   AS BIGINT) AS mask,
              CAST(mh.band AS BIGINT) AS band,
              CAST((ROW_NUMBER() OVER (ORDER BY tb.n_ev DESC,
                                       tb.user_id) - 1) * 10
                   // (SELECT COUNT(*) FROM tb) + 1 AS BIGINT)
                  AS decile
       FROM tb JOIN mh ON mh.user_id = tb.user_id)"""


def _bqi_table(sf_dir: str) -> pd.DataFrame:
    """(user_id, mask, band, decile)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        bit = np.select(
            [et == "click", et == "error", et == "purchase",
             et == "signup", et == "view"],
            [1, 2, 4, 8, 16], 0).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "b": bit,
            "band": df["ts"].dt.hour.to_numpy(np.int64) // 6,
            "one": np.ones(len(et), np.int64)})

    base = _events(sf_dir, ["user_id", "ts", "event_type"]) \
        .map_batches(prep, batch_format="pandas")
    ub = reduce_sink(base, ["user_id", "b"],
                     {"one": ("one", "max")}).to_pandas()
    mask = ub.groupby("user_id")["b"].sum().rename("mask")
    hb = reduce_sink(base, ["user_id", "band"],
                     {"one": ("one", "sum")}).to_pandas() \
        .rename(columns={"one": "n"})
    hb = hb.sort_values(["user_id", "n", "band"],
                        ascending=[True, False, True],
                        kind="mergesort")
    mh = hb.drop_duplicates("user_id").set_index("user_id")["band"]
    nev = reduce_sink(base, ["user_id"],
                      {"one": ("one", "sum")}).to_pandas() \
        .rename(columns={"one": "n_ev"})
    nev = nev.sort_values(["n_ev", "user_id"],
                          ascending=[False, True],
                          kind="mergesort", ignore_index=True)
    n = len(nev)
    nev["decile"] = ((np.arange(n, dtype=np.int64)) * 10 // n
                     + 1).astype(np.int64)
    out = nev[["user_id", "decile"]].copy()
    out["mask"] = mask.loc[out["user_id"]].to_numpy(np.int64)
    out["band"] = mh.loc[out["user_id"]].to_numpy(np.int64)
    return out


@register("behavioral_uniqueness_risk", sql=f"""
WITH {_BQI_SQL},
gr AS (SELECT mask, band, decile,
              CAST(COUNT(*) AS BIGINT) AS sz
       FROM qi GROUP BY 1, 2, 3),
ag AS (SELECT CAST(SUM(sz) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS combos,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS uniq,
              CAST(SUM(CASE WHEN sz <= 5 THEN sz ELSE 0 END)
                   AS BIGINT) AS small
       FROM gr)
SELECT n AS n_users, combos AS n_combos,
       ROUND(CAST(uniq AS DOUBLE) / n * 100.0, 6)
           AS unique_users_pct,
       ROUND(CAST(small AS DOUBLE) / n * 100.0, 6)
           AS in_groups_le5_pct
FROM ag""")
def behavioral_uniqueness_risk(sf_dir: str) -> pd.DataFrame:
    """Re-identification risk from BEHAVIOR alone: the share of
    users unique (and in groups ≤ 5) on the quasi-identifier
    (event-type repertoire mask, modal 6-hour band, activity
    decile) — three attributes any 'anonymized' analytics export
    leaks without containing a single direct identifier. The
    k-anonymity audit (present) grades declared quasi-identifier
    columns; this row makes the sharper point the privacy
    literature keeps re-proving (Sweeney, de Montjoye): DERIVED
    behavioral coarsenings re-identify too, and a 15-category
    pattern space can single out users at scale because the
    group-size distribution is heavy-tailed, not uniform. All
    three attributes use pinned tie rules (smallest band,
    (events desc, user_id) decile ranks) so the partition is
    identical on both engines."""
    t = _bqi_table(sf_dir)
    sz = t.groupby(["mask", "band", "decile"]).size()
    n = len(t)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "n_combos": np.array([len(sz)], np.int64),
        "unique_users_pct": [float(rha(
            int((sz == 1).sum()) / n * 100.0, 6))],
        "in_groups_le5_pct": [float(rha(
            int(sz[sz <= 5].sum()) / n * 100.0, 6))]})
