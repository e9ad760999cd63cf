"""Driver-contract queries (chunk 15/18).
Sections:
  - Markov mixing structure: Dobrushin contraction + per-state memory
  - Aggregation bias (the modifiable-temporal-unit problem): correlation
  - Temporal concentration: how few days carry the revenue / the errors
  - Inference for the Gini: exact jackknife SE + the cohort contrast
  - Broken-stick trend: continuous piecewise-linear fit with a free
  - Front-door identification: views → clicks → purchases, with the
  - Binomial interval calibration: the Wald/Wilson/Agresti–Coull panel
  - Transition symmetry: Bowker's test on the directly-follows matrix
  - Robust scale tests, median-centered: Fligner–Killeen normal scores
  - Watson's U² on the daily clock: two-sample view-vs-purchase +
  - Trend-regression remedies: Goldfeld–Quandt variance ordering +
  - Binary lattice autocorrelation: join counts + Getis–Ord Gi*
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
    _SESS_SQL,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _DAILY_SQL,
    _daily_counts,
    _ols_int_sums,
    _ols_ssr,
)
from webalizer_ray.pipelines.queries.q10_session_bias import (  # noqa: F401
    _HW_RING_SQL,
    _SESS_OUTCOME_SQL,
    _hourweek_ring,
)
from webalizer_ray.pipelines.queries.q11_forecast_supply import (  # noqa: F401
    _dayvec,
)
from webalizer_ray.pipelines.queries.q13_decision_resample import (  # noqa: F401
    _ASQ,
    _DF_SQL,
    _QGEN,
    _as_upper_q,
    _df_counts,
    _norm_q,
)
from webalizer_ray.pipelines.queries.q14_randomness_kernels import (  # noqa: F401
    _BQI_SQL,
    _INVNORM,
    _bqi_table,
    _det3,
    _invnorm,
)



@register("uniqueness_attribution_ladder", sql=f"""
WITH {_BQI_SQL},
full_ AS (SELECT 'none' AS dropped,
                 CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS uniq,
                 CAST(SUM(sz) AS BIGINT) AS n
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM qi
                GROUP BY mask, band, decile) g),
dm AS (SELECT 'types' AS dropped,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS uniq,
              CAST(SUM(sz) AS BIGINT) AS n
       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM qi
             GROUP BY band, decile) g),
db AS (SELECT 'hourband' AS dropped,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS uniq,
              CAST(SUM(sz) AS BIGINT) AS n
       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM qi
             GROUP BY mask, decile) g),
dd AS (SELECT 'decile' AS dropped,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS uniq,
              CAST(SUM(sz) AS BIGINT) AS n
       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM qi
             GROUP BY mask, band) g)
SELECT dropped,
       ROUND(CAST(uniq AS DOUBLE) / n * 100.0, 6) AS unique_pct
FROM (SELECT * FROM full_ UNION ALL SELECT * FROM dm
      UNION ALL SELECT * FROM db UNION ALL SELECT * FROM dd)
ORDER BY dropped""")
def uniqueness_attribution_ladder(sf_dir: str) -> pd.DataFrame:
    """The generalization ladder: uniqueness re-computed with each
    attribute dropped in turn. The drop that collapses uniqueness
    most is the attribute DRIVING re-identifiability — the
    actionable output, because privacy engineering proceeds by
    generalizing ONE field (coarsen deciles to quintiles, merge
    bands) and this table says which generalization buys the most
    protection per unit of analytic value destroyed. Reading it
    with the risk row: if dropping 'decile' barely moves
    uniqueness, the activity level was nearly redundant given the
    other two and publishing it was free risk. Same pinned
    partition; four grouping passes over the same user table."""
    t = _bqi_table(sf_dir)
    n = len(t)
    rha = textstats.round_half_away
    rows = []
    specs = {"none": ["mask", "band", "decile"],
             "types": ["band", "decile"],
             "hourband": ["mask", "decile"],
             "decile": ["mask", "band"]}
    for name in sorted(specs):
        sz = t.groupby(specs[name]).size()
        rows.append((name, float(rha(
            int((sz == 1).sum()) / n * 100.0, 6))))
    return pd.DataFrame(rows, columns=["dropped", "unique_pct"])


# ---------------------------------------------------------------------------
# Markov mixing structure: Dobrushin contraction + per-state memory
# on the within-session transition chain
# ---------------------------------------------------------------------------

@register("dobrushin_mixing_types", sql=f"""
WITH {_DF_SQL},
rt AS (SELECT a, CAST(SUM(n) AS BIGINT) AS tot
       FROM df GROUP BY 1),
ty AS (SELECT DISTINCT b AS t FROM df
       UNION SELECT DISTINCT a FROM df),
pm AS (SELECT rt.a, ty.t,
              CAST(COALESCE(df.n, 0) AS DOUBLE) / rt.tot AS p
       FROM rt CROSS JOIN ty
       LEFT JOIN df ON df.a = rt.a AND df.b = ty.t),
pr AS (SELECT x.a AS a1, y.a AS a2,
              SUM(ABS(x.p - y.p)) / 2.0 AS tv
       FROM pm x JOIN pm y ON y.t = x.t AND x.a < y.a
       GROUP BY 1, 2),
mx AS (SELECT a1, a2, tv FROM pr
       ORDER BY ROUND(tv, 9) DESC, a1, a2 LIMIT 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_states,
       ROUND((SELECT tv FROM mx), 6) AS dobrushin_delta,
       (SELECT a1 FROM mx) AS extreme_state_a,
       (SELECT a2 FROM mx) AS extreme_state_b,
       ROUND(CASE WHEN (SELECT tv FROM mx) < 1.0
                  THEN LN(100.0)
                       / -LN((SELECT tv FROM mx)) END, 6)
           AS steps_to_1pct_bound""")
def dobrushin_mixing_types(sf_dir: str) -> pd.DataFrame:
    """Dobrushin's ergodicity coefficient of the within-session
    type-transition chain: δ = max over state pairs of the total-
    variation distance between their next-step rows. δ is the
    chain's one-step CONTRACTION rate — after k steps any two
    starting states' distributions are within δᵏ — so
    steps_to_1pct_bound = ln 100/−ln δ upper-bounds the mixing
    time with no eigendecomposition (closed form where the
    spectral gap is not). The operational read the stationary/
    entropy rows (present) don't give: δ near 1 means where a
    session IS strongly determines where it GOES for many steps
    (deep funnel memory — attribution windows must be long, and
    the extreme state pair names the two most divergent
    contexts); δ small means the session forgets its state almost
    immediately and any beyond-one-step journey modeling is
    decoration. Rows from the directly-follows counts with the
    session family's exact conventions; absorbing/unseen cells
    are honest zeros; 9dp argmax with lexicographic ties."""
    df = _df_counts(sf_dir)
    states = sorted(set(df["a"]))
    allt = sorted(set(df["a"]) | set(df["b"]))
    cnt = {(a, b): int(n)
           for a, b, n in zip(df["a"], df["b"], df["n"])}
    tot = {a: sum(cnt.get((a, t), 0) for t in allt)
           for a in states}
    P = {a: np.array([cnt.get((a, t), 0) / tot[a]
                      for t in allt]) for a in states}
    rha = textstats.round_half_away
    best = None
    for i, a1 in enumerate(states):
        for a2 in states[i + 1:]:
            tv = float(np.abs(P[a1] - P[a2]).sum()) / 2.0
            key = (-float(rha(tv, 9)), a1, a2)
            if best is None or key < best[0]:
                best = (key, a1, a2, tv)
    _, a1, a2, delta = best
    steps = (np.log(100.0) / -np.log(delta)
             if delta < 1.0 else np.nan)
    return pd.DataFrame({
        "n_states": np.array([len(states)], np.int64),
        "dobrushin_delta": [float(rha(delta, 6))],
        "extreme_state_a": [a1],
        "extreme_state_b": [a2],
        "steps_to_1pct_bound": [float(rha(steps, 6))]})


@register("markov_state_memory_types", sql=f"""
WITH {_DF_SQL},
rt AS (SELECT a, CAST(SUM(n) AS BIGINT) AS tot
       FROM df GROUP BY 1),
ty AS (SELECT DISTINCT b AS t FROM df
       UNION SELECT DISTINCT a FROM df),
mg AS (SELECT b AS t, CAST(SUM(n) AS BIGINT) AS m FROM df
       GROUP BY 1),
mt AS (SELECT CAST(SUM(m) AS BIGINT) AS tot FROM mg),
pm AS (SELECT rt.a, ty.t,
              CAST(COALESCE(df.n, 0) AS DOUBLE) / rt.tot AS p,
              CAST(COALESCE(mg.m, 0) AS DOUBLE)
                  / (SELECT tot FROM mt) AS q
       FROM rt CROSS JOIN ty
       LEFT JOIN df ON df.a = rt.a AND df.b = ty.t
       LEFT JOIN mg ON mg.t = ty.t)
SELECT a AS state, CAST(MAX(rt2.tot) AS BIGINT) AS n_out,
       ROUND(SUM(ABS(p - q)) / 2.0, 6) AS tv_from_marginal
FROM pm JOIN rt rt2 USING (a)
GROUP BY a ORDER BY a""")
def markov_state_memory_types(sf_dir: str) -> pd.DataFrame:
    """Per-state memory: the total-variation distance between each
    state's next-step row and the POOLED next-step marginal — how
    much knowing the current event type changes the next-step
    forecast at all. This decomposes the Dobrushin scalar into
    its per-state sources (Dobrushin is the max PAIRWISE spread;
    a state can be far from one sibling yet close to the
    marginal, and it's the marginal gap that prices the VALUE of
    conditioning): tv ≈ 0 states are where a Markov model earns
    nothing over the base-rate forecast, and the high-tv states
    are exactly where the transition-matrix machinery (present)
    pays its complexity. n_out sizes the evidence behind each
    row. Same transition counts and zero-cell conventions."""
    df = _df_counts(sf_dir)
    states = sorted(set(df["a"]))
    allt = sorted(set(df["a"]) | set(df["b"]))
    cnt = {(a, b): int(n)
           for a, b, n in zip(df["a"], df["b"], df["n"])}
    marg = {t: 0 for t in allt}
    for (a, b), n in cnt.items():
        marg[b] += n
    mtot = sum(marg.values())
    q = np.array([marg[t] / mtot for t in allt])
    rha = textstats.round_half_away
    rows = []
    for a in states:
        tot = sum(cnt.get((a, t), 0) for t in allt)
        p = np.array([cnt.get((a, t), 0) / tot for t in allt])
        rows.append((a, tot,
                     float(rha(float(np.abs(p - q).sum()) / 2.0,
                               6))))
    return pd.DataFrame(rows, columns=[
        "state", "n_out", "tv_from_marginal"]).astype(
        {"n_out": np.int64})


# ---------------------------------------------------------------------------
# Aggregation bias (the modifiable-temporal-unit problem): correlation
# and slope of views→purchases across day/week/month grains
# ---------------------------------------------------------------------------

def _grain_moments(sf_dir: str):
    """{grain: (n, sx, sy, sxx, syy, sxy)} exact integer moments of
    (views, purchases) at day (zero-filled), week (day//7) and
    month grains — weeks/months aggregate the same filled spine."""
    g = _dayvec(sf_dir)
    d = g["d"].to_numpy(np.int64)
    x = g["x"].to_numpy(np.int64)
    z = g["z"].to_numpy(np.int64)
    out = {}
    frames = {
        "day": pd.DataFrame({"k": d, "x": x, "z": z}),
        "triday": pd.DataFrame({"k": d // 3, "x": x, "z": z})
        .groupby("k", as_index=False).sum(),
        "week": pd.DataFrame({"k": d // 7, "x": x, "z": z})
        .groupby("k", as_index=False).sum()}
    for grain, f in frames.items():
        xv = f["x"].to_numpy(np.int64).astype(object)
        zv = f["z"].to_numpy(np.int64).astype(object)
        n = len(f)
        out[grain] = (n, int(xv.sum()), int(zv.sum()),
                      int((xv * xv).sum()), int((zv * zv).sum()),
                      int((xv * zv).sum()))
    return out


_GRAIN_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS z
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
g AS (SELECT cal.d, COALESCE(e.x, 0) AS x, COALESCE(e.z, 0) AS z
      FROM (SELECT UNNEST(generate_series(lo, hi)) AS d
            FROM sp) cal
      LEFT JOIN e ON e.d = cal.d),
gr AS (SELECT 'day' AS grain, CAST(d AS VARCHAR) AS k, x, z FROM g
       UNION ALL
       SELECT 'triday', CAST(d // 3 AS VARCHAR), x, z FROM g
       UNION ALL
       SELECT 'week', CAST(d // 7 AS VARCHAR), x, z FROM g),
ag AS (SELECT grain, k, CAST(SUM(x) AS BIGINT) AS x,
              CAST(SUM(z) AS BIGINT) AS z
       FROM gr GROUP BY 1, 2),
mo AS (SELECT grain, CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS sx,
              CAST(SUM(z) AS HUGEINT) AS sz,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
              CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
              CAST(SUM(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz
       FROM ag GROUP BY 1)"""


@register("aggregation_bias_ladder", sql=f"""
WITH {_GRAIN_SQL}
SELECT grain, CAST(n AS BIGINT) AS n_units,
       ROUND(CAST(n * sxz - sx * sz AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * szz - sz * sz AS DOUBLE)), 6)
           AS pearson_r,
       ROUND(CAST(n * sxz - sx * sz AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6)
           AS slope_purch_per_view
FROM mo ORDER BY grain""")
def aggregation_bias_ladder(sf_dir: str) -> pd.DataFrame:
    """The modifiable-temporal-unit problem measured: the
    views–purchases Pearson r and OLS slope at day, 3-day and week
    grains over the SAME underlying spine (the window spans one
    calendar month, so the rungs stop at weeks; a longer window
    would extend the ladder upward). Correlations
    mechanically inflate under aggregation (averaging washes out
    unit-level noise while preserving shared trend), which is the
    temporal twin of the ecological fallacy — a monthly r of 0.95
    says almost nothing about whether high-view DAYS convert, and
    this ladder prints how much of any reported correlation is
    grain artifact: r climbing steeply up the ladder while the
    SLOPE stays flat is pure noise-averaging (the relationship is
    real and stable, only its apparent tightness is
    grain-dependent); the slope itself drifting across grains is
    the serious warning that the relationship operates at a
    specific timescale and cross-grain extrapolation is invalid.
    Exact HUGEINT moments per grain; rungs are day//3 and day//7
    aggregations of the zero-filled day spine."""
    mos = _grain_moments(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for grain in sorted(mos):
        n, sx, sz, sxx, szz, sxz = mos[grain]
        num = float(n * sxz - sx * sz)
        r = num / np.sqrt(float(n * sxx - sx * sx)
                          * float(n * szz - sz * sz))
        b = num / float(n * sxx - sx * sx)
        rows.append((grain, n, float(rha(r, 6)),
                     float(rha(b, 6))))
    return pd.DataFrame(rows, columns=[
        "grain", "n_units", "pearson_r",
        "slope_purch_per_view"]).astype({"n_units": np.int64})


@register("aggregation_r2_inflation", sql=f"""
WITH {_GRAIN_SQL},
rr AS (SELECT grain,
              POW(CAST(n * sxz - sx * sz AS DOUBLE), 2)
              / (CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * szz - sz * sz AS DOUBLE)) AS r2
       FROM mo)
SELECT ROUND((SELECT r2 FROM rr WHERE grain = 'day'), 6)
           AS r2_day,
       ROUND((SELECT r2 FROM rr WHERE grain = 'triday'), 6)
           AS r2_triday,
       ROUND((SELECT r2 FROM rr WHERE grain = 'week'), 6)
           AS r2_week,
       ROUND((SELECT r2 FROM rr WHERE grain = 'triday')
             / (SELECT r2 FROM rr WHERE grain = 'day'), 6)
           AS triday_over_day,
       ROUND((SELECT r2 FROM rr WHERE grain = 'week')
             / (SELECT r2 FROM rr WHERE grain = 'day'), 6)
           AS week_over_day""")
def aggregation_r2_inflation(sf_dir: str) -> pd.DataFrame:
    """The inflation factors in one row: R² at each grain and the
    3-day/day and week/day ratios — the number to divide by when
    someone quotes a monthly-grain R² as evidence of a daily-grain
    mechanism. The classic empirical regularity (Robinson 1950's
    ecological correlations ran 0.77 aggregated vs 0.20
    individual) shows up here as ratios well above 1 whenever
    unit-level noise dominates shared trend; a ratio near 1 is
    the useful negative result — the relationship is
    scale-invariant and any grain's estimate transfers. Same
    moments; the three R²'s are one shared expression."""
    mos = _grain_moments(sf_dir)
    r2 = {}
    for grain in mos:
        n, sx, sz, sxx, szz, sxz = mos[grain]
        num = float(n * sxz - sx * sz)
        r2[grain] = num * num / (float(n * sxx - sx * sx)
                                 * float(n * szz - sz * sz))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "r2_day": [float(rha(r2["day"], 6))],
        "r2_triday": [float(rha(r2["triday"], 6))],
        "r2_week": [float(rha(r2["week"], 6))],
        "triday_over_day": [float(rha(r2["triday"] / r2["day"],
                                      6))],
        "week_over_day": [float(rha(r2["week"] / r2["day"],
                                    6))]})


# ---------------------------------------------------------------------------
# Temporal concentration: how few days carry the revenue / the errors
# ---------------------------------------------------------------------------

def _day_metric_conc(sf_dir: str, metric: str):
    """(days sorted by metric desc with day numbers, totals) for
    metric ∈ {revenue, errors}."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        if metric == "revenue":
            v = np.rint(df["value"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        else:
            v = (df["event_type"].to_numpy()
                 == "error").astype(np.int64)
        return pd.DataFrame({"day": us // 86_400_000_000,
                             "v": v})

    d = reduce_sink(
        _events(sf_dir, ["ts", "value", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["day"], {"v": ("v", "sum")}).to_pandas()
    return d


def _conc_row(d: pd.DataFrame):
    """(n_days, k50, k80, top_share, top5_maxrun) with desc-value/
    day-asc ordering pinned."""
    d = d.sort_values(["v", "day"], ascending=[False, True],
                      kind="mergesort", ignore_index=True)
    v = d["v"].to_numpy(np.int64)
    day = d["day"].to_numpy(np.int64)
    tot = int(v.sum())
    cum = np.cumsum(v)
    k50 = int(np.searchsorted(cum, (tot + 1) // 2) + 1)
    k80 = int(np.searchsorted(cum, -(-4 * tot // 5)) + 1)
    top_share = v[0] / tot * 100.0
    top5 = np.sort(day[:5])
    runs = 1
    best = 1
    for i in range(1, len(top5)):
        if top5[i] == top5[i - 1] + 1:
            runs += 1
            best = max(best, runs)
        else:
            runs = 1
    return len(d), k50, k80, top_share, best


_CONC_SQL = """
d AS (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM({metric}) AS BIGINT) AS v
      FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS nd FROM d),
o AS (SELECT day, v,
             SUM(v) OVER (ORDER BY v DESC, day
                          ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY v DESC, day) AS rn
      FROM d),
k5 AS (SELECT MIN(rn) AS k FROM o, tot
       WHERE 2 * cum >= tot.t),
k8 AS (SELECT MIN(rn) AS k FROM o, tot
       WHERE 5 * cum >= 4 * tot.t),
t5 AS (SELECT day FROM o WHERE rn <= 5),
rg AS (SELECT day, day - ROW_NUMBER() OVER (ORDER BY day) AS grp
       FROM t5),
mr AS (SELECT CAST(MAX(c) AS BIGINT) AS best
       FROM (SELECT COUNT(*) AS c FROM rg GROUP BY grp) q)"""


@register("revenue_day_concentration", sql=f"""
WITH {_CONC_SQL.format(
    metric="CAST(ROUND(value * 100) AS BIGINT)")}
SELECT (SELECT nd FROM tot) AS n_days,
       CAST((SELECT k FROM k5) AS BIGINT) AS days_for_50pct,
       CAST((SELECT k FROM k8) AS BIGINT) AS days_for_80pct,
       ROUND((SELECT MAX(v) FROM d) * 100.0
             / (SELECT t FROM tot), 6) AS top_day_share_pct,
       (SELECT best FROM mr) AS top5_max_run""")
def revenue_day_concentration(sf_dir: str) -> pd.DataFrame:
    """Temporal revenue concentration: the fewest days carrying 50%
    and 80% of window revenue (days ranked by revenue, desc-value/
    day ties pinned), the single biggest day's share, and the
    longest CONSECUTIVE run among the top-5 days. The user-Lorenz
    family (present) asks who earns the money; this asks WHEN —
    and the contiguity column is the diagnosis the counts alone
    miss: top-5 days forming a 4-day run is one launch/campaign
    event (revenue is event-driven — plan around launches, and a
    'bad month' may just lack one), while five scattered
    singletons are structural weekly peaks (revenue is
    rhythm-driven — staff the rhythm). days_for_50pct ≈ n/2 is
    the calm uniform benchmark. Exact integer cumulative ranks;
    ceil thresholds via integer arithmetic (2·cum ≥ t,
    5·cum ≥ 4t)."""
    d = _day_metric_conc(sf_dir, "revenue")
    n, k50, k80, ts_, best = _conc_row(d)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "days_for_50pct": np.array([k50], np.int64),
        "days_for_80pct": np.array([k80], np.int64),
        "top_day_share_pct": [float(rha(ts_, 6))],
        "top5_max_run": np.array([best], np.int64)})


@register("error_day_concentration", sql=f"""
WITH {_CONC_SQL.format(
    metric="CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")}
SELECT (SELECT nd FROM tot) AS n_days,
       CAST((SELECT k FROM k5) AS BIGINT) AS days_for_50pct,
       CAST((SELECT k FROM k8) AS BIGINT) AS days_for_80pct,
       ROUND((SELECT MAX(v) FROM d) * 100.0
             / (SELECT t FROM tot), 6) AS top_day_share_pct,
       (SELECT best FROM mr) AS top5_max_run""")
def error_day_concentration(sf_dir: str) -> pd.DataFrame:
    """The same concentration profile for ERRORS — the incident-
    shape complement to the extremal-index row: θ says whether
    extreme days cluster; this says how much of the total error
    BUDGET those days consume. days_for_50pct = 2 with a top-day
    share of 35% means half the quarter's errors were two
    incidents (postmortem those two days and the error program is
    half done); days_for_50pct near n/2 means errors are ambient
    (no postmortem will move the number — invest in systemic
    hardening instead). The top5_max_run column again separates
    one multi-day outage from repeated independent bad days.
    Identical rank/threshold machinery on the error counter."""
    d = _day_metric_conc(sf_dir, "errors")
    n, k50, k80, ts_, best = _conc_row(d)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "days_for_50pct": np.array([k50], np.int64),
        "days_for_80pct": np.array([k80], np.int64),
        "top_day_share_pct": [float(rha(ts_, 6))],
        "top5_max_run": np.array([best], np.int64)})


# ---------------------------------------------------------------------------
# Inference for the Gini: exact jackknife SE + the cohort contrast
# ---------------------------------------------------------------------------

def _gini_jack(cents: np.ndarray, counts: np.ndarray):
    """(n, G, jackknife SE) from a (value, count) histogram.
    Leave-one-out Ginis are tie-invariant (removing any member of
    an equal-value group yields the same G₍ⱼ₎ — the rank shift and
    the suffix change cancel), so the O(n) jackknife collapses to
    O(distinct values)."""
    order = np.argsort(cents, kind="mergesort")
    v = cents[order].astype(np.float64)
    c = counts[order].astype(np.float64)
    n = float(c.sum())
    T = float((v * c).sum())
    bc = np.concatenate([[0.0], np.cumsum(c)[:-1]])
    bs = np.concatenate([[0.0], np.cumsum(v * c)[:-1]])
    # rank-weighted sum S1 = Σ over members of rank·value:
    # group ranks run bc+1..bc+c → Σranks = c·bc + c(c+1)/2
    s1 = float(((c * bc + c * (c + 1) / 2.0) * v).sum())
    g = (2.0 * s1 - (n + 1.0) * T) / (n * T)
    # LOO at the LAST member of each group: r = bc + c
    r = bc + c
    s1m = s1 - (r * v + (T - bs - c * v))
    tm = T - v
    gj = (2.0 * s1m - n * tm) / ((n - 1.0) * tm)
    gbar = float((c * gj).sum()) / n
    var = (n - 1.0) / n * float((c * (gj - gbar) ** 2).sum())
    return int(n), g, np.sqrt(var)


def _user_cents_hist(sf_dir: str, cohort: bool):
    """(cents, count[, cohort]) histogram of per-user totals;
    cohort = first-touch weekend/weekday (RMST convention)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "np_": (df["event_type"].to_numpy()
                    == "purchase").astype(np.int64)})

    per = reduce_sink(
        _events(sf_dir, ["user_id", "value", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"cents": ("cents", "sum"),
                      "np_": ("np_", "sum")}).to_pandas()
    if cohort:
        per["cohort"] = np.where(
            per["user_id"].to_numpy(np.int64) % 2 == 1, "arm1",
            "arm0")
        return per.groupby(["cohort", "cents"]).size() \
            .rename("n").reset_index()
    return per.groupby("cents").size().rename("n").reset_index()


#: per-group (value, count) histogram with the closed-form
#: leave-one-out Gini per distinct value (tie-invariant; evaluated
#: at each group's last member).
_GINIJK_SQL = """
u AS (SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS np_
      FROM events GROUP BY 1),
uc AS (SELECT {grp} AS grp, cents,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM u GROUP BY 1, 2),
pw AS (SELECT grp, cents, c,
              CAST(SUM(c) OVER w - c AS DOUBLE) AS bc,
              CAST(SUM(c * cents) OVER w - c * cents AS DOUBLE)
                  AS bs,
              CAST(SUM(c) OVER (PARTITION BY grp) AS DOUBLE) AS n,
              CAST(SUM(c * cents) OVER (PARTITION BY grp)
                   AS DOUBLE) AS t
       FROM uc
       WINDOW w AS (PARTITION BY grp ORDER BY cents
                    ROWS UNBOUNDED PRECEDING)),
s1 AS (SELECT grp, MAX(n) AS n, MAX(t) AS t,
              SUM((c * bc + c * (c + 1) / 2.0) * cents) AS s1
       FROM pw GROUP BY 1),
lo AS (SELECT pw.grp, pw.c,
              (2.0 * (s1.s1 - ((pw.bc + pw.c) * pw.cents
                               + (s1.t - pw.bs
                                  - pw.c * pw.cents)))
               - s1.n * (s1.t - pw.cents))
              / ((s1.n - 1.0) * (s1.t - pw.cents)) AS gj,
              s1.n AS n, s1.t AS t, s1.s1 AS s1v
       FROM pw JOIN s1 USING (grp)),
ag AS (SELECT grp, MAX(n) AS n, MAX(t) AS t, MAX(s1v) AS s1v,
              SUM(c * gj) / MAX(n) AS gbar,
              SUM(c * gj * gj) AS gj2, SUM(c * gj) AS gjs
       FROM lo GROUP BY 1),
fin AS (SELECT grp, CAST(n AS BIGINT) AS nb,
               (2.0 * s1v - (n + 1.0) * t) / (n * t) AS g,
               SQRT((n - 1.0) / n
                    * (gj2 - gjs * gjs / n)) AS se
        FROM ag)"""


@register("gini_user_value_jackknife", sql=f"""
WITH {_GINIJK_SQL.format(grp="'all'")}
SELECT nb AS n_users,
       ROUND(g, 6) AS gini,
       ROUND(se, 6) AS se_jack,
       ROUND(g - 1.96 * se, 6) AS ci_lo,
       ROUND(g + 1.96 * se, 6) AS ci_hi
FROM fin""")
def gini_user_value_jackknife(sf_dir: str) -> pd.DataFrame:
    """The error bar the Gini row (present) has been printing
    without: the delete-one jackknife SE of the per-user value
    Gini, computed EXACTLY in O(distinct values) — leave-one-out
    Ginis are tie-invariant (removing any member of an
    equal-value group gives the same G₍ⱼ₎ because the rank shift
    and suffix change cancel, proven in the helper), so the n
    leave-outs collapse onto the bounded cents histogram with
    count weights. A Gini of 0.62 ± 0.004 and one of 0.62 ± 0.08
    license entirely different conclusions about concentration
    drift, and the jackknife is the standard inequality-inference
    tool precisely because the Gini's influence function makes
    plug-in variance formulas unwieldy. Same rank-weighted-sum
    formula as the point-estimate row, digit-for-digit."""
    h = _user_cents_hist(sf_dir, cohort=False)
    n, g, se = _gini_jack(h["cents"].to_numpy(np.int64),
                          h["n"].to_numpy(np.int64))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "gini": [float(rha(g, 6))],
        "se_jack": [float(rha(se, 6))],
        "ci_lo": [float(rha(g - 1.96 * se, 6))],
        "ci_hi": [float(rha(g + 1.96 * se, 6))]})


@register("gini_aa_calibration", sql=f"""
WITH {_GINIJK_SQL.format(
    grp="CASE WHEN user_id % 2 = 1 THEN 'arm1' "
        "ELSE 'arm0' END")}
SELECT (SELECT nb FROM fin WHERE grp = 'arm1') AS n_arm1,
       (SELECT nb FROM fin WHERE grp = 'arm0') AS n_arm0,
       ROUND((SELECT g FROM fin WHERE grp = 'arm1'), 6)
           AS gini_arm1,
       ROUND((SELECT g FROM fin WHERE grp = 'arm0'), 6)
           AS gini_arm0,
       ROUND((SELECT g FROM fin WHERE grp = 'arm1')
             - (SELECT g FROM fin WHERE grp = 'arm0'), 6)
           AS gini_gap,
       ROUND(CASE WHEN POW((SELECT se FROM fin
                            WHERE grp = 'arm1'), 2)
                       + POW((SELECT se FROM fin
                              WHERE grp = 'arm0'), 2) > 0
                  THEN ((SELECT g FROM fin WHERE grp = 'arm1')
                        - (SELECT g FROM fin WHERE grp = 'arm0'))
                       / SQRT(POW((SELECT se FROM fin
                                   WHERE grp = 'arm1'), 2)
                              + POW((SELECT se FROM fin
                                     WHERE grp = 'arm0'), 2))
                  END, 6) AS gap_z,
       CAST(CASE WHEN ABS(((SELECT g FROM fin
                            WHERE grp = 'arm1')
                           - (SELECT g FROM fin
                              WHERE grp = 'arm0'))
                          / SQRT(POW((SELECT se FROM fin
                                      WHERE grp = 'arm1'), 2)
                                 + POW((SELECT se FROM fin
                                        WHERE grp = 'arm0'),
                                       2))) > 1.96
                 THEN 1 ELSE 0 END AS BIGINT)
           AS false_positive""")
def gini_aa_calibration(sf_dir: str) -> pd.DataFrame:
    """The A/A calibration of the jackknife SE: split users by
    the registry's A/B arm convention (user_id parity — a null
    split by construction), compute each arm's Gini with its
    jackknife SE, and test the gap. Under the null the gap
    should be insignificant ~95% of the time, so this row
    VALIDATES the error bar the jackknife row prints — the same
    discipline aa_test_calibration applies to the mean applied
    to an inequality functional, where SE miscalibration is far
    likelier (the Gini's influence function is unbounded above).
    false_positive = 1 on a null split is the warning that
    Gini-difference claims elsewhere need wider bands than the
    jackknife suggests. Independent-sample z; same tie-invariant
    O(distinct-values) jackknife per arm."""
    h = _user_cents_hist(sf_dir, cohort=True)
    res = {}
    for grp, g in h.groupby("cohort"):
        res[grp] = _gini_jack(g["cents"].to_numpy(np.int64),
                              g["n"].to_numpy(np.int64))
    n1, g1, s1 = res["arm1"]
    n0, g0, s0 = res["arm0"]
    gap = g1 - g0
    den = np.sqrt(s1 * s1 + s0 * s0)
    z = gap / den if den > 0 else np.nan
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_arm1": np.array([n1], np.int64),
        "n_arm0": np.array([n0], np.int64),
        "gini_arm1": [float(rha(g1, 6))],
        "gini_arm0": [float(rha(g0, 6))],
        "gini_gap": [float(rha(gap, 6))],
        "gap_z": [float(rha(z, 6))],
        "false_positive": np.array(
            [1 if not np.isnan(z) and abs(z) > 1.96 else 0],
            np.int64)})


# ---------------------------------------------------------------------------
# Broken-stick trend: continuous piecewise-linear fit with a free
# knot + the slope-change test at the chosen knot
# ---------------------------------------------------------------------------

def _broken_stick(sf_dir: str):
    """Scan every interior knot k (3 ≤ k ≤ n−3) of the continuous
    two-slope model y ~ a + b·t + c·(t−k)₊ (3-param closed-form
    OLS per knot); return (n, sst, sse_line, best knot, a, b, c,
    sse_best) with 9dp/smallest-knot tie pinning."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    sy, syy = y.sum(), (y * y).sum()
    st, stt, sty = t.sum(), (t * t).sum(), (t * y).sum()
    b_line = (n * sty - st * sy) / (n * stt - st * st)
    sse_line = (syy - sy * sy / n) \
        - b_line * (sty - st * sy / n)
    sst = syy - sy * sy / n
    rha = textstats.round_half_away
    best = None
    for k in range(3, n - 2):
        u = np.maximum(t - k, 0.0)
        s2 = u.sum()
        s12 = (t * u).sum()
        s22 = (u * u).sum()
        t2 = (u * y).sum()
        det = n * (stt * s22 - s12 * s12) \
            - st * (st * s22 - s12 * s2) \
            + s2 * (st * s12 - stt * s2)
        if det == 0:
            continue
        det0 = sy * (stt * s22 - s12 * s12) \
            - st * (sty * s22 - t2 * s12) \
            + s2 * (sty * s12 - t2 * stt)
        det1 = n * (sty * s22 - t2 * s12) \
            - sy * (st * s22 - s2 * s12) \
            + s2 * (st * t2 - s2 * sty)
        det2 = n * (stt * t2 - s12 * sty) \
            - st * (st * t2 - s2 * sty) \
            + sy * (st * s12 - stt * s2)
        a, b, c = det0 / det, det1 / det, det2 / det
        sse = syy - a * sy - b * sty - c * t2
        key = (float(rha(sse, 9)), k)
        if best is None or key < best[0]:
            best = (key, k, a, b, c, sse)
    _, k, a, b, c, sse = best
    return n, sst, sse_line, k, a, b, c, sse


_BSTICK_SQL = f"""
{_DAILY_SQL},
mo AS (SELECT MAX(n) AS n,
              SUM(CAST(y AS DOUBLE)) AS sy,
              SUM(CAST(y AS DOUBLE) * y) AS syy,
              SUM(CAST(t AS DOUBLE)) AS st,
              SUM(CAST(t AS DOUBLE) * t) AS stt,
              SUM(CAST(t AS DOUBLE) * y) AS sty
       FROM x),
kk AS (SELECT UNNEST(generate_series(3,
           (SELECT CAST(n AS BIGINT) FROM mo) - 3)) AS k),
km AS (SELECT kk.k,
              SUM(GREATEST(x.t - kk.k, 0.0)) AS s2,
              SUM(x.t * GREATEST(x.t - kk.k, 0.0)) AS s12,
              SUM(GREATEST(x.t - kk.k, 0.0)
                  * GREATEST(x.t - kk.k, 0.0)) AS s22,
              SUM(x.y * GREATEST(x.t - kk.k, 0.0)) AS t2
       FROM kk JOIN x ON TRUE GROUP BY 1),
fit AS (SELECT km.k, mo.n, mo.sy, mo.syy, mo.sty,
               (mo.sy * (mo.stt * km.s22 - km.s12 * km.s12)
                - mo.st * (mo.sty * km.s22 - km.t2 * km.s12)
                + km.s2 * (mo.sty * km.s12 - km.t2 * mo.stt))
               / (mo.n * (mo.stt * km.s22 - km.s12 * km.s12)
                  - mo.st * (mo.st * km.s22 - km.s12 * km.s2)
                  + km.s2 * (mo.st * km.s12 - mo.stt * km.s2))
                   AS a,
               (mo.n * (mo.sty * km.s22 - km.t2 * km.s12)
                - mo.sy * (mo.st * km.s22 - km.s2 * km.s12)
                + km.s2 * (mo.st * km.t2 - km.s2 * mo.sty))
               / (mo.n * (mo.stt * km.s22 - km.s12 * km.s12)
                  - mo.st * (mo.st * km.s22 - km.s12 * km.s2)
                  + km.s2 * (mo.st * km.s12 - mo.stt * km.s2))
                   AS b,
               (mo.n * (mo.stt * km.t2 - km.s12 * mo.sty)
                - mo.st * (mo.st * km.t2 - km.s2 * mo.sty)
                + mo.sy * (mo.st * km.s12 - mo.stt * km.s2))
               / (mo.n * (mo.stt * km.s22 - km.s12 * km.s12)
                  - mo.st * (mo.st * km.s22 - km.s12 * km.s2)
                  + km.s2 * (mo.st * km.s12 - mo.stt * km.s2))
                   AS c,
               km.t2
        FROM km, mo),
sse AS (SELECT k, a, b, c,
               syy - a * sy - b * sty - c * t2 AS sse
        FROM fit),
bst AS (SELECT * FROM sse
        ORDER BY ROUND(sse, 9), k LIMIT 1)"""


@register("broken_stick_daily_trend", sql=f"""
WITH {_BSTICK_SQL},
ln_ AS (SELECT (mo.n * mo.sty - mo.st * mo.sy)
               / (mo.n * mo.stt - mo.st * mo.st) AS bl,
               mo.syy - mo.sy * mo.sy / mo.n AS sst,
               (mo.syy - mo.sy * mo.sy / mo.n)
               - ((mo.n * mo.sty - mo.st * mo.sy)
                  / (mo.n * mo.stt - mo.st * mo.st))
                 * (mo.sty - mo.st * mo.sy / mo.n) AS ssel
        FROM mo)
SELECT CAST((SELECT n FROM mo) AS BIGINT) AS n_days,
       CAST(bst.k AS BIGINT) AS knot_day,
       ROUND(bst.b, 6) AS slope_before,
       ROUND(bst.b + bst.c, 6) AS slope_after,
       ROUND(bst.c, 6) AS slope_change,
       ROUND(bst.sse, 6) AS sse_broken,
       ROUND((SELECT ssel FROM ln_), 6) AS sse_line,
       ROUND(1.0 - bst.sse / (SELECT sst FROM ln_), 6) AS r2
FROM bst""")
def broken_stick_daily_trend(sf_dir: str) -> pd.DataFrame:
    """Continuous piecewise-linear ('broken-stick') fit of the
    daily counts with a FREE knot: scan every interior day, fit
    y ~ a + b·t + c·(t−k)₊ in closed form, keep the global-SSE
    minimizer. This is the slope sibling of the mean-shift
    changepoint family (present): Pettitt/CUSUM/optimal-2cp find
    LEVEL breaks, but growth inflections — the thing a trajectory
    review actually asks about ('when did growth slow?') — are
    CONTINUOUS at the break and invisible to level methods, while
    the broken stick's c is directly the slope change in
    events/day per day. Against SETAR (also present), the knot is
    in TIME, not in lagged level: a calendar inflection (pricing
    change, competitor launch) vs a dynamic regime. O(days)
    knots × closed 3×3 adjugate each; 9dp SSE tie → earliest
    knot; interior margin of 3 days each side."""
    n, sst, sse_line, k, a, b, c, sse = _broken_stick(sf_dir)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "knot_day": np.array([k], np.int64),
        "slope_before": [float(rha(b, 6))],
        "slope_after": [float(rha(b + c, 6))],
        "slope_change": [float(rha(c, 6))],
        "sse_broken": [float(rha(sse, 6))],
        "sse_line": [float(rha(sse_line, 6))],
        "r2": [float(rha(1.0 - sse / sst, 6))]})


@register("broken_stick_significance", sql=f"""
WITH {_BSTICK_SQL},
ln_ AS (SELECT (mo.syy - mo.sy * mo.sy / mo.n)
               - ((mo.n * mo.sty - mo.st * mo.sy)
                  / (mo.n * mo.stt - mo.st * mo.st))
                 * (mo.sty - mo.st * mo.sy / mo.n) AS ssel,
               mo.n AS n
        FROM mo)
SELECT CAST(bst.k AS BIGINT) AS knot_day,
       ROUND(CASE WHEN bst.sse > 0
                  THEN ((SELECT ssel FROM ln_) - bst.sse)
                       / (bst.sse / ((SELECT n FROM ln_) - 3.0))
                  END, 6) AS f_naive,
       CAST(CASE WHEN bst.sse <= 0
                 THEN CASE WHEN (SELECT ssel FROM ln_) > 0
                           THEN 1 ELSE 0 END
                 WHEN ((SELECT ssel FROM ln_) - bst.sse)
                      / (bst.sse / ((SELECT n FROM ln_) - 3.0))
                      > 4.0 THEN 1 ELSE 0 END AS BIGINT)
           AS naive_rejected,
       CAST(CASE WHEN bst.sse <= 0
                 THEN CASE WHEN (SELECT ssel FROM ln_) > 0
                           THEN 1 ELSE 0 END
                 WHEN ((SELECT ssel FROM ln_) - bst.sse)
                      / (bst.sse / ((SELECT n FROM ln_) - 3.0))
                      > 8.0 THEN 1 ELSE 0 END AS BIGINT)
           AS davies_rejected
FROM bst""")
def broken_stick_significance(sf_dir: str) -> pd.DataFrame:
    """The honesty row for the broken stick: the naive F for the
    extra parameter (against ~F(1, n−3), 4.0 reference) and the
    same statistic against a DOUBLED critical value (8.0) as a
    Davies-style correction — because the knot was CHOSEN by the
    same scan the test evaluates, the naive F's null distribution
    is wrong (the nuisance parameter k vanishes under H₀; Davies'
    bound and simulation studies put the honest critical for a
    scanned single knot at roughly twice the pointwise value,
    documented as the convention here). naive_rejected = 1 with
    davies_rejected = 0 is the selection-inflation zone — exactly
    the zone where trajectory reviews invent inflection
    narratives from noise — and reporting BOTH flags makes the
    claim's strength explicit rather than buried in a method
    footnote. Same scan and SSEs as the fit row."""
    n, sst, sse_line, k, a, b, c, sse = _broken_stick(sf_dir)
    if sse > 0:
        f = (sse_line - sse) / (sse / (n - 3.0))
        nr = 1 if f > 4.0 else 0
        dr = 1 if f > 8.0 else 0
    else:        # the stick fits exactly: trivially significant
        f = np.nan
        nr = dr = 1 if sse_line > 0 else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "knot_day": np.array([k], np.int64),
        "f_naive": [float(rha(f, 6))],
        "naive_rejected": np.array([nr], np.int64),
        "davies_rejected": np.array([dr], np.int64)})


# ---------------------------------------------------------------------------
# Front-door identification: views → clicks → purchases, with the
# testable no-direct-effect check
# ---------------------------------------------------------------------------

def _fd_moments(sf_dir: str):
    """(n + centered moments of the daily v/c/p triple)."""
    g = _dayvec(sf_dir)
    v = g["x"].to_numpy(np.int64).astype(np.float64)
    c = g["y"].to_numpy(np.int64).astype(np.float64)
    p = g["z"].to_numpy(np.int64).astype(np.float64)
    n = float(len(v))
    def cc(a, b):
        return float((a * b).sum()) - a.sum() * b.sum() / n
    return (n, cc(v, v), cc(c, c), cc(p, p), cc(v, c),
            cc(v, p), cc(c, p))


_FD_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS p
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
g AS (SELECT COALESCE(e.v, 0) AS v, COALESCE(e.c, 0) AS c,
             COALESCE(e.p, 0) AS p
      FROM (SELECT UNNEST(generate_series(lo, hi)) AS d
            FROM sp) cal
      LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              SUM(CAST(v AS DOUBLE)) AS sv,
              SUM(CAST(c AS DOUBLE)) AS sc,
              SUM(CAST(p AS DOUBLE)) AS spp,
              SUM(CAST(v AS DOUBLE) * v) AS svv,
              SUM(CAST(c AS DOUBLE) * c) AS scc,
              SUM(CAST(p AS DOUBLE) * p) AS sppp,
              SUM(CAST(v AS DOUBLE) * c) AS svc,
              SUM(CAST(v AS DOUBLE) * p) AS svp,
              SUM(CAST(c AS DOUBLE) * p) AS scp
       FROM g),
cm AS (SELECT n,
              svv - sv * sv / n AS cvv,
              scc - sc * sc / n AS ccc,
              sppp - spp * spp / n AS cpp,
              svc - sv * sc / n AS cvc,
              svp - sv * spp / n AS cvp,
              scp - sc * spp / n AS ccp
       FROM mo)"""


@register("front_door_views_purchases", sql=f"""
WITH {_FD_SQL},
fd AS (SELECT n, cvv, ccc, cpp, cvc, cvp, ccp,
              cvc / cvv AS b1,
              (cvv * ccp - cvc * cvp)
                  / (cvv * ccc - cvc * cvc) AS b2,
              cvp / cvv AS b_ols
       FROM cm WHERE cvv * ccc - cvc * cvc != 0)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(b1, 6) AS clicks_per_view,
       ROUND(b2, 6) AS purchases_per_click_adj,
       ROUND(b1 * b2, 6) AS b_front_door,
       ROUND(b_ols, 6) AS b_ols,
       ROUND(b1 * b2 - b_ols, 6) AS fd_minus_ols
FROM fd""")
def front_door_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Pearl's front-door identification on the daily funnel: the
    effect of views on purchases routed through the MEDIATOR
    clicks — b_fd = slope(clicks~views) × slope(purchases~clicks
    ADJUSTING for views) — the linear front-door formula, which
    identifies the causal effect even when views and purchases
    share an unobserved confounder (ambient demand), PROVIDED the
    mediator is shielded (confounder doesn't touch clicks given
    views) and carries the whole effect. With the IV row this
    completes the identification triangle on one triple: OLS
    (assumes no confounding), IV (assumes the weekend exclusion),
    front-door (assumes mediator completeness) — three estimates
    under three DIFFERENT untestable assumptions, and their
    agreement pattern is the evidence: all three close together
    is as near causal-robustness as observational data gets;
    front-door siding with IV against OLS quantifies the
    confounding both corrections remove. Centered moments,
    two-regressor closed form for the adjusted stage."""
    n, cvv, ccc, cpp, cvc, cvp, ccp = _fd_moments(sf_dir)
    b1 = cvc / cvv
    det = cvv * ccc - cvc * cvc
    b2 = (cvv * ccp - cvc * cvp) / det
    b_ols = cvp / cvv
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([int(n)], np.int64),
        "clicks_per_view": [float(rha(b1, 6))],
        "purchases_per_click_adj": [float(rha(b2, 6))],
        "b_front_door": [float(rha(b1 * b2, 6))],
        "b_ols": [float(rha(b_ols, 6))],
        "fd_minus_ols": [float(rha(b1 * b2 - b_ols, 6))]})


@register("front_door_direct_effect_check", sql=f"""
WITH {_FD_SQL},
fd AS (SELECT n, cvv, ccc, cpp, cvc, cvp, ccp,
              (ccc * cvp - cvc * ccp)
                  / (cvv * ccc - cvc * cvc) AS bdir,
              (cvv * ccp - cvc * cvp)
                  / (cvv * ccc - cvc * cvc) AS b2
       FROM cm WHERE cvv * ccc - cvc * cvc != 0),
s2 AS (SELECT *,
              (cpp - bdir * cvp - b2 * ccp) / (n - 3.0) AS sig2
       FROM fd)
SELECT ROUND(bdir, 6) AS direct_views_coef,
       ROUND(bdir / SQRT(sig2 * ccc
                         / (cvv * ccc - cvc * cvc)), 6)
           AS direct_t,
       CAST(CASE WHEN ABS(bdir / SQRT(sig2 * ccc
                          / (cvv * ccc - cvc * cvc))) <= 1.96
                 THEN 1 ELSE 0 END AS BIGINT)
           AS front_door_supported
FROM s2""")
def front_door_direct_effect_check(sf_dir: str) -> pd.DataFrame:
    """The front-door's TESTABLE implication, tested: in
    purchases ~ clicks + views, the views coefficient must be ≈ 0
    if clicks carry the whole effect (the completeness half of
    the front-door premise — unlike 'no unobserved confounding',
    this one leaves a fingerprint in the data). direct_t inside
    ±1.96 (front_door_supported = 1) means the mediator-
    completeness assumption survives its one observable check and
    the b_fd number deserves its seat in the triangle; a large
    direct coefficient says views move purchases through paths
    that skip clicking (saved carts, phone orders) and the
    front-door estimate inherits exactly that omission as bias.
    Homoskedastic OLS t (documented; the HAC row shows the
    hardening); the two-regressor coefficient and its variance
    share the same centered 2×2 adjugate."""
    n, cvv, ccc, cpp, cvc, cvp, ccp = _fd_moments(sf_dir)
    det = cvv * ccc - cvc * cvc
    bdir = (ccc * cvp - cvc * ccp) / det
    b2 = (cvv * ccp - cvc * cvp) / det
    sig2 = (cpp - bdir * cvp - b2 * ccp) / (n - 3.0)
    t = bdir / np.sqrt(sig2 * ccc / det)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "direct_views_coef": [float(rha(bdir, 6))],
        "direct_t": [float(rha(t, 6))],
        "front_door_supported": np.array(
            [1 if abs(t) <= 1.96 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Binomial interval calibration: the Wald/Wilson/Agresti–Coull panel
# on the rarest type + ranking reliability of the type histogram
# ---------------------------------------------------------------------------

_TYPESHARE_SQL = """
c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM c)"""


def _type_counts(sf_dir: str):
    """Sorted (type, count) ascending by (count, type)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ty": df["event_type"].to_numpy(),
                             "k": np.ones(len(df), np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["ty"], {"k": ("k", "sum")}).to_pandas() \
        .sort_values(["k", "ty"], ignore_index=True)
    return c


@register("binomial_interval_panel_rarest_type", sql=f"""
WITH {_TYPESHARE_SQL},
r AS (SELECT event_type, k, (SELECT n FROM t) AS n FROM c
      ORDER BY k, event_type LIMIT 1),
p AS (SELECT event_type, k, n,
             CAST(k AS DOUBLE) / n AS ph FROM r)
SELECT event_type AS rarest_type, k AS count_,
       CAST(n AS BIGINT) AS n_events,
       ROUND(ph, 6) AS share,
       ROUND(GREATEST(ph - 1.96 * SQRT(ph * (1 - ph) / n), 0.0),
             6) AS wald_lo,
       ROUND(ph + 1.96 * SQRT(ph * (1 - ph) / n), 6) AS wald_hi,
       ROUND(((ph + 1.96 * 1.96 / (2 * n))
              - 1.96 * SQRT(ph * (1 - ph) / n
                            + 1.96 * 1.96 / (4 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
       ROUND(((ph + 1.96 * 1.96 / (2 * n))
              + 1.96 * SQRT(ph * (1 - ph) / n
                            + 1.96 * 1.96 / (4 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi,
       CAST(CASE WHEN ph - 1.96 * SQRT(ph * (1 - ph) / n) < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS wald_clipped
FROM p""")
def binomial_interval_panel_rarest_type(sf_dir: str) \
        -> pd.DataFrame:
    """The don't-use-Wald lesson on live data: the rarest event
    type's share with its Wald and Wilson 95% intervals side by
    side. At small p̂ the Wald interval's actual coverage craters
    (the Brown–Cai–DasGupta result: erratic, often below 90% at
    nominal 95%) and its lower limit goes NEGATIVE — flagged here
    rather than silently clipped — while Wilson's score inversion
    keeps near-nominal coverage by construction. The registry's
    many proportion CIs default to Wilson-grade machinery; this
    row is the demonstration of WHY, priced on the caller's own
    rarest category, where the two intervals visibly disagree.
    Rarest = min (count, type) ties lexicographic; identical
    closed forms both engines."""
    c = _type_counts(sf_dir)
    n = int(c["k"].sum())
    ty = c["ty"].iloc[0]
    k = int(c["k"].iloc[0])
    ph = k / n
    z = 1.96
    wl = ph - z * np.sqrt(ph * (1 - ph) / n)
    wh = ph + z * np.sqrt(ph * (1 - ph) / n)
    den = 1 + z * z / n
    ctr = ph + z * z / (2 * n)
    hw = z * np.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "rarest_type": [ty],
        "count_": np.array([k], np.int64),
        "n_events": np.array([n], np.int64),
        "share": [float(rha(ph, 6))],
        "wald_lo": [float(rha(max(wl, 0.0), 6))],
        "wald_hi": [float(rha(wh, 6))],
        "wilson_lo": [float(rha((ctr - hw) / den, 6))],
        "wilson_hi": [float(rha((ctr + hw) / den, 6))],
        "wald_clipped": np.array([1 if wl < 0 else 0], np.int64)})


@register("type_share_ranking_reliability", sql=f"""
WITH {_TYPESHARE_SQL},
r AS (SELECT event_type, k, (SELECT n FROM t) AS n,
             ROW_NUMBER() OVER (ORDER BY k, event_type) AS rn
      FROM c),
w AS (SELECT event_type, k, n, rn,
             CAST(k AS DOUBLE) / n AS ph
      FROM r),
iv AS (SELECT event_type, k, rn, n, ph,
              ((ph + 1.96 * 1.96 / (2 * n))
               - 1.96 * SQRT(ph * (1 - ph) / n
                             + 1.96 * 1.96 / (4 * n * n)))
              / (1 + 1.96 * 1.96 / n) AS lo,
              ((ph + 1.96 * 1.96 / (2 * n))
               + 1.96 * SQRT(ph * (1 - ph) / n
                             + 1.96 * 1.96 / (4 * n * n)))
              / (1 + 1.96 * 1.96 / n) AS hi
       FROM w)
SELECT a.event_type AS type_lo, b.event_type AS type_hi,
       ROUND(a.ph, 6) AS share_lo, ROUND(b.ph, 6) AS share_hi,
       CAST(CASE WHEN a.hi >= b.lo THEN 0 ELSE 1 END AS BIGINT)
           AS rank_reliable
FROM iv a JOIN iv b ON b.rn = a.rn + 1
ORDER BY a.rn""")
def type_share_ranking_reliability(sf_dir: str) -> pd.DataFrame:
    """Ranking reliability of the event-type histogram: for each
    ADJACENT pair in the frequency ordering, whether the two
    Wilson intervals are disjoint (rank_reliable = 1) or overlap
    (the ordering of those two bars is not statistically
    established). Every frequency table implies a ranking and
    most consumers read it as fact; this row marks exactly which
    rank boundaries are load-bearing — 'errors are our
    third-most-common event' may be a coin flip against
    fourth-most, and any alerting or prioritization keyed to
    rank position inherits that fragility. The disjoint-interval
    criterion is conservative (stricter than a pairwise test,
    documented) — a flagged-unreliable boundary might survive a
    direct test, but a flagged-reliable one is safe. Same Wilson
    closed form; (count, type) ordering pinned."""
    c = _type_counts(sf_dir)
    n = int(c["k"].sum())
    z = 1.96
    rha = textstats.round_half_away
    rows = []
    ph = c["k"].to_numpy(np.int64) / n
    den = 1 + z * z / n
    ctr = ph + z * z / (2 * n)
    hw = z * np.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
    lo = (ctr - hw) / den
    hi = (ctr + hw) / den
    for i in range(len(c) - 1):
        rows.append((c["ty"].iloc[i], c["ty"].iloc[i + 1],
                     float(rha(ph[i], 6)),
                     float(rha(ph[i + 1], 6)),
                     0 if hi[i] >= lo[i + 1] else 1))
    return pd.DataFrame(rows, columns=[
        "type_lo", "type_hi", "share_lo", "share_hi",
        "rank_reliable"]).astype({"rank_reliable": np.int64})


# ---------------------------------------------------------------------------
# Transition symmetry: Bowker's test on the directly-follows matrix
# + the per-pair net-flow decomposition
# ---------------------------------------------------------------------------

def _flow_pairs(sf_dir: str) -> list:
    """Unordered off-diagonal type pairs (u < v) with both directed
    directly-follows counts — the shared input of the Bowker and
    net-flow rows, from the session family's exact conventions."""
    df = _df_counts(sf_dir)
    cnt = {(a, b): int(n)
           for a, b, n in zip(df["a"], df["b"], df["n"])}
    pairs = sorted({tuple(sorted((a, b)))
                    for a, b in cnt if a != b})
    out = []
    for u, v in pairs:
        nab, nba = cnt.get((u, v), 0), cnt.get((v, u), 0)
        if nab + nba > 0:
            out.append((u, v, nab, nba))
    return out


#: unordered pair counts off _DF_SQL: one row per {u,v} with at least
#: one observed direction; nab = n(u→v), nba = n(v→u), u < v.
_FLOWPAIR_SQL = """
pr AS (SELECT x.a, x.b, x.n AS nab,
              CAST(COALESCE(y.n, 0) AS BIGINT) AS nba
       FROM df x LEFT JOIN df y ON y.a = x.b AND y.b = x.a
       WHERE x.a < x.b
       UNION ALL
       SELECT y.b AS a, y.a AS b, CAST(0 AS BIGINT) AS nab,
              y.n AS nba
       FROM df y LEFT JOIN df x ON x.a = y.b AND x.b = y.a
       WHERE y.a > y.b AND x.a IS NULL)"""


@register("bowker_symmetry_transitions", sql=f"""
WITH {_DF_SQL},
{_FLOWPAIR_SQL},
tm AS (SELECT a, b,
              POW(CAST(nab - nba AS DOUBLE), 2)
                  / (nab + nba) AS term
       FROM pr),
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
              SUM(term) AS chi2 FROM tm),
wh AS (SELECT k, chi2,
              (POW(chi2 / k, 1.0 / 3.0)
               - (1.0 - 2.0 / (9.0 * k)))
              / SQRT(2.0 / (9.0 * k)) AS z
       FROM ag),
mx AS (SELECT a, b FROM tm
       ORDER BY ROUND(term, 9) DESC, a, b LIMIT 1)
SELECT k AS n_pairs,
       ROUND(chi2, 6) AS bowker_chi2,
       ROUND({_QGEN.format(x="z")}, 6) AS p_wh,
       CAST(CASE WHEN {_QGEN.format(x="z")} < 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS asymmetric,
       (SELECT a FROM mx) AS top_pair_a,
       (SELECT b FROM mx) AS top_pair_b
FROM wh""")
def bowker_symmetry_transitions(sf_dir: str) -> pd.DataFrame:
    """Bowker's test of symmetry on the within-session directly-
    follows matrix: χ² = Σ over unordered type pairs of
    (n_uv − n_vu)²/(n_uv + n_vu), df = pairs with at least one
    observed direction. The question McNemar asks of a 2×2,
    asked of the whole k×k transition table at once: is the
    session graph a two-way street (A→B about as often as B→A —
    browsing, oscillation) or a directed FUNNEL (flows run one
    way)? The Markov family (stationary dist, entropy rate,
    Dobrushin — present) all condition on the matrix as given;
    this is the test that the matrix's directionality itself is
    real rather than sampling noise, which is exactly what a
    process-mining arrow diagram silently assumes when it draws
    A→B but not B→A. Since df varies with the observed pair set,
    the p-value uses the Wilson–Hilferty cube-root normalization
    ((χ²/k)^⅓ ≈ normal) through the registry's pinned A&S
    26.2.17 tail — one shared approximation in both engines, 9dp
    argmax for the most asymmetric pair, lexicographic ties."""
    pairs = _flow_pairs(sf_dir)
    k = len(pairs)
    chi2 = 0.0
    best = None
    for u, v, nab, nba in pairs:
        term = float(nab - nba) ** 2 / (nab + nba)
        chi2 += term
        rha9 = float(textstats.round_half_away(term, 9))
        key = (-rha9, u, v)
        if best is None or key < best[0]:
            best = (key, u, v)
    z = ((chi2 / k) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * k))) \
        / np.sqrt(2.0 / (9.0 * k))
    p = _norm_q(z)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([k], np.int64),
        "bowker_chi2": [float(rha(chi2, 6))],
        "p_wh": [float(rha(p, 6))],
        "asymmetric": np.array([1 if p < 0.05 else 0], np.int64),
        "top_pair_a": [best[1]],
        "top_pair_b": [best[2]]})


@register("transition_net_flow", sql=f"""
WITH {_DF_SQL},
{_FLOWPAIR_SQL},
zz AS (SELECT a, b, nab, nba,
              CAST(nab - nba AS BIGINT) AS net,
              CAST(nab - nba AS DOUBLE)
                  / SQRT(CAST(nab + nba AS DOUBLE)) AS z
       FROM pr)
SELECT a AS type_a, b AS type_b,
       CAST(nab AS BIGINT) AS n_ab,
       CAST(nba AS BIGINT) AS n_ba, net,
       ROUND(z, 6) AS direction_z,
       ROUND(2.0 * {_ASQ.format(v="ABS(z)")}, 6)
           AS p_two_sided
FROM zz ORDER BY ABS(net) DESC, a, b""")
def transition_net_flow(sf_dir: str) -> pd.DataFrame:
    """The per-pair decomposition Bowker's scalar hides: for each
    unordered type pair, both directed counts, the net flow
    n_uv − n_vu, and the conditional direction z — under
    symmetry, each of the n_uv + n_vu traversals picks a
    direction as a fair coin, so z = net/√(n_uv+n_vu) is the
    exact McNemar normal score and Bowker's χ² is literally
    Σ z² over these rows. Ordered by |net| so the top row names
    the single most directed edge in the session graph — the
    place where the journey has an arrow (view→purchase strongly
    positive is the healthy funnel; error→view dominating
    view→error says errors bounce users back to browsing rather
    than ending sessions). Pairs the arrow DIAGRAM (process
    footprint/heuristics rows) with the arrow's statistical
    license, one row per edge. Integer nets; |net| then
    lexicographic ordering pinned both engines."""
    pairs = _flow_pairs(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for u, v, nab, nba in pairs:
        net = nab - nba
        z = float(net) / np.sqrt(float(nab + nba))
        rows.append((u, v, nab, nba, net,
                     float(rha(z, 6)),
                     float(rha(2.0 * _as_upper_q(abs(z)), 6))))
    rows.sort(key=lambda r: (-abs(r[4]), r[0], r[1]))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_ab", "n_ba", "net",
        "direction_z", "p_two_sided"]).astype(
            {"n_ab": np.int64, "n_ba": np.int64,
             "net": np.int64})


# ---------------------------------------------------------------------------
# Robust scale tests, median-centered: Fligner–Killeen normal scores
# + Conover squared ranks on weekend vs weekday value
# ---------------------------------------------------------------------------

def _absdev_hist(sf_dir: str):
    """Pooled histogram of |cents − group lower median| with
    weekend/weekday counts — the shared input of the FK and
    Conover rows. Median-centering (the registry's (n+1)//2 lower
    median, as in the Mood row) keeps every deviation an exact
    integer, so cross-group rank ties are exact on both engines;
    only (cents, flag) partials ever shuffle."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "wkd": wkd,
            "c1": wkd, "c2": 1 - wkd,
            "tt": np.ones(len(df), np.int64)})

    h0 = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["wkd", "cents"],
        {"c1": ("c1", "sum"), "c2": ("c2", "sum"),
         "tt": ("tt", "sum")}).to_pandas() \
        .sort_values(["wkd", "cents"], ignore_index=True)
    meds = {}
    for g in (0, 1):
        sub = h0[h0["wkd"] == g]
        cm = sub["tt"].cumsum()
        ng = int(sub["tt"].sum())
        meds[g] = int(sub["cents"].to_numpy(np.int64)[
            (cm >= (ng + 1) // 2).to_numpy().argmax()])
    h0["u"] = np.abs(h0["cents"].to_numpy(np.int64)
                     - h0["wkd"].map(meds).to_numpy(np.int64))
    h = h0.groupby("u", as_index=False)[["c1", "c2", "tt"]] \
        .sum().sort_values("u", ignore_index=True)
    return h


#: (u, c1, c2, tt) histogram of |cents − per-group lower median|
#: with pooled midranks r = F(<u) + (t+1)/2 — FK/Conover shared CTE.
_ABSDEV_SQL = """
c AS (SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS wkd,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
h0 AS (SELECT wkd, cents, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM c GROUP BY 1, 2),
cum0 AS (SELECT wkd, cents,
                SUM(cnt) OVER (PARTITION BY wkd
                               ORDER BY cents) AS cm,
                SUM(cnt) OVER (PARTITION BY wkd) AS ng
         FROM h0),
med AS (SELECT wkd, MIN(CASE WHEN cm >= (ng + 1) // 2
                             THEN cents END) AS m
        FROM cum0 GROUP BY wkd),
uv AS (SELECT c.wkd, ABS(c.cents - med.m) AS u
       FROM c JOIN med USING (wkd)),
h AS (SELECT u, CAST(SUM(wkd) AS BIGINT) AS c1,
             CAST(SUM(1 - wkd) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM uv GROUP BY 1),
rk AS (SELECT u, c1, c2, tt,
              SUM(tt) OVER (ORDER BY u) - tt
                  + (tt + 1) / 2.0 AS r,
              SUM(c1) OVER () AS n1,
              SUM(c2) OVER () AS n2,
              SUM(tt) OVER () AS n
       FROM h)"""


@register("fligner_killeen_weekend_scale", sql=f"""
WITH {_ABSDEV_SQL},
sc AS (SELECT c1, tt, n1, n2, n,
              {_INVNORM.format(p="0.5 + r / (2.0 * (n + 1))")}
                  AS a
       FROM rk),
ag AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2, MAX(n) AS n,
              SUM(c1 * a) AS s1a,
              SUM(tt * a) AS sa,
              SUM(tt * a * a) AS saa
       FROM sc),
st AS (SELECT n1, n2, n,
              (n1 * POW(s1a / n1 - sa / n, 2)
               + n2 * POW((sa - s1a) / n2 - sa / n, 2))
              / ((saa - n * POW(sa / n, 2)) / (n - 1)) AS x2
       FROM ag)
SELECT CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n2 AS BIGINT) AS n_weekday,
       ROUND(x2, 6) AS fk_chi2,
       ROUND(2.0 * {_ASQ.format(v="SQRT(x2)")}, 6) AS p,
       CAST(CASE WHEN 2.0 * {_ASQ.format(v="SQRT(x2)")} < 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS scale_rejected
FROM st""")
def fligner_killeen_weekend_scale(sf_dir: str) -> pd.DataFrame:
    """Fligner–Killeen normal-scores test of scale between weekend
    and weekday values — the test R's var.test docs actually
    recommend when normality is in doubt, and the third corner of
    the scale-test triangle this registry already runs: Bartlett
    (efficient, wrecked by heavy tails), Ansari–Bradley (rank
    edge scores, needs near-equal medians), FK (median-centers
    each group FIRST, then scores pooled ranks of the absolute
    deviations through Φ⁻¹(½ + r/(2(N+1)))). Median-centering is
    what buys its famous robustness: a location shift between
    groups never masquerades as a scale difference, so this row
    stays valid even where the AB row's equal-median premise
    wobbles. X² = Σ n_g(Ā_g − ā)²/s² on 1 df; the lower median
    in integer cents keeps deviations exact, Φ⁻¹ is the pinned
    A&S 26.2.22 rational and the χ²₁ tail the pinned 2·Q(√x),
    so both engines share every approximation."""
    h = _absdev_hist(sf_dir)
    c1 = h["c1"].to_numpy(np.float64)
    tt = h["tt"].to_numpy(np.float64)
    n1 = float(c1.sum())
    n = float(tt.sum())
    n2 = n - n1
    f = tt.cumsum() - tt
    r = f + (tt + 1) / 2.0
    a = _invnorm(0.5 + r / (2.0 * (n + 1)))
    s1a = float((c1 * a).sum())
    sa = float((tt * a).sum())
    saa = float((tt * a * a).sum())
    x2 = (n1 * (s1a / n1 - sa / n) ** 2
          + n2 * ((sa - s1a) / n2 - sa / n) ** 2) \
        / ((saa - n * (sa / n) ** 2) / (n - 1))
    p = 2.0 * _as_upper_q(np.sqrt(x2))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([int(n1)], np.int64),
        "n_weekday": np.array([int(n2)], np.int64),
        "fk_chi2": [float(rha(x2, 6))],
        "p": [float(rha(p, 6))],
        "scale_rejected": np.array([1 if p < 0.05 else 0],
                                   np.int64)})


@register("conover_squared_ranks_weekend", sql=f"""
WITH {_ABSDEV_SQL},
sq AS (SELECT c1, tt, n1, n2, n, r * r AS q FROM rk),
ag AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2, MAX(n) AS n,
              SUM(c1 * q) AS s1q,
              SUM(tt * q) AS sq_,
              SUM(tt * q * q) AS sqq
       FROM sq),
st AS (SELECT n1, n2, n,
              (POW(s1q, 2) / n1 + POW(sq_ - s1q, 2) / n2
               - n * POW(sq_ / n, 2))
              / ((sqq - n * POW(sq_ / n, 2)) / (n - 1)) AS t
       FROM ag)
SELECT CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n2 AS BIGINT) AS n_weekday,
       ROUND(t, 6) AS conover_t,
       ROUND(2.0 * {_ASQ.format(v="SQRT(t)")}, 6) AS p,
       CAST(CASE WHEN 2.0 * {_ASQ.format(v="SQRT(t)")} < 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS scale_rejected
FROM st""")
def conover_squared_ranks_weekend(sf_dir: str) -> pd.DataFrame:
    """Conover's squared-ranks test on the same median-centered
    deviations — the fourth scale test, and the one that WEIGHTS
    the tail: squaring the pooled midranks makes the statistic
    increasingly sensitive to the largest deviations, where FK's
    normal scores grow only like √(2 ln N). Reading the pair is
    the diagnostic: FK rejecting while Conover doesn't says the
    dispersion difference lives in the BODY of the value
    distribution (typical transactions spread differently);
    Conover rejecting while FK doesn't says it lives in the
    EXTREMES (weekend's big-ticket tail is fatter, the case a
    revenue-risk reader cares about). T = (Σ S_g²/n_g − N·q̄²)/D²
    with D² the variance of the squared midranks — ties need no
    correction beyond the midranks themselves, which the shared
    integer-cents histogram makes exact; χ²₁ tail via the pinned
    2·Q(√x) in both engines."""
    h = _absdev_hist(sf_dir)
    c1 = h["c1"].to_numpy(np.float64)
    tt = h["tt"].to_numpy(np.float64)
    n1 = float(c1.sum())
    n = float(tt.sum())
    n2 = n - n1
    f = tt.cumsum() - tt
    q = (f + (tt + 1) / 2.0) ** 2
    s1q = float((c1 * q).sum())
    sq_ = float((tt * q).sum())
    sqq = float((tt * q * q).sum())
    t = (s1q ** 2 / n1 + (sq_ - s1q) ** 2 / n2
         - n * (sq_ / n) ** 2) \
        / ((sqq - n * (sq_ / n) ** 2) / (n - 1))
    p = 2.0 * _as_upper_q(np.sqrt(t))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([int(n1)], np.int64),
        "n_weekday": np.array([int(n2)], np.int64),
        "conover_t": [float(rha(t, 6))],
        "p": [float(rha(p, 6))],
        "scale_rejected": np.array([1 if p < 0.05 else 0],
                                   np.int64)})


# ---------------------------------------------------------------------------
# Watson's U² on the daily clock: two-sample view-vs-purchase +
# one-sample purchase uniformity
# ---------------------------------------------------------------------------

@register("watson_u2_view_purchase_hours", sql="""
WITH b AS (SELECT (epoch_us(ts) % 86400000000) // 1000000 AS sod,
                  event_type
           FROM events WHERE event_type IN ('view', 'purchase')),
c AS (SELECT sod,
             CAST(SUM(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END) AS BIGINT) AS nv,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS np
      FROM b GROUP BY 1),
t AS (SELECT nv + np AS tt,
             SUM(nv) OVER (ORDER BY sod) AS cv,
             SUM(np) OVER (ORDER BY sod) AS cp,
             (SELECT SUM(nv) FROM c) AS n1,
             (SELECT SUM(np) FROM c) AS n2
      FROM c),
d AS (SELECT tt,
             cv / CAST(n1 AS DOUBLE)
                 - cp / CAST(n2 AS DOUBLE) AS dk,
             n1, n2
      FROM t),
ag AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
              CAST(MAX(n1) + MAX(n2) AS DOUBLE) AS n,
              SUM(tt * dk) AS sd,
              SUM(tt * dk * dk) AS sdd
       FROM d),
u AS (SELECT n1, n2,
             n1 * CAST(n2 AS DOUBLE) / (n * n)
                 * (sdd - sd * sd / n) AS u2
      FROM ag)
SELECT CAST(n1 AS BIGINT) AS n_view,
       CAST(n2 AS BIGINT) AS n_purchase,
       ROUND(u2, 6) AS watson_u2,
       CAST(CASE WHEN u2 > 0.187 THEN 1 ELSE 0 END AS BIGINT)
           AS rejected
FROM u""")
def watson_u2_view_purchase_hours(sf_dir: str) -> pd.DataFrame:
    """Two-sample Watson U² on second-of-day: the Cramér–von Mises
    analog of the Kuiper row (present), completing on the circle
    the same KS-vs-CvM pairing the linear families run. Kuiper's V
    reads only the two EXTREME ECDF gaps; U² integrates the
    squared gap over the whole day, centered by its mean —
    U² = n₁n₂/N²·(Σt·d² − (Σt·d)²/N) — which keeps it rotation-
    invariant (the centering term absorbs where midnight cuts the
    circle) and makes it the more powerful test when views and
    purchases differ DIFFUSELY across many hours rather than at
    one sharp phase. Kuiper rejecting while Watson doesn't →
    a single localized clock divergence (one campaign hour);
    Watson-only → a broad morning/evening mix shift. Asymptotic
    5% point 0.187 (Stephens); ECDFs on the ≤86 400-row
    second-of-day grid, calendar-bounded at any event scale."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin(["view", "purchase"])
        d = df[m]
        us = d["ts"].to_numpy("datetime64[us]").astype(np.int64)
        sod = (us % 86_400_000_000) // 1_000_000
        return pd.DataFrame({
            "sod": sod,
            "nv": (d["event_type"] == "view").to_numpy(np.int64),
            "np_": (d["event_type"] == "purchase")
            .to_numpy(np.int64)}) \
            .groupby("sod", as_index=False).sum()

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["sod"], {"nv": ("nv", "sum"), "np_": ("np_", "sum")}) \
        .to_pandas().sort_values("sod", ignore_index=True)
    n1 = int(c["nv"].sum())
    n2 = int(c["np_"].sum())
    n = float(n1 + n2)
    tt = (c["nv"] + c["np_"]).to_numpy(np.float64)
    dk = c["nv"].to_numpy(np.int64).cumsum() / float(n1) \
        - c["np_"].to_numpy(np.int64).cumsum() / float(n2)
    sd = float((tt * dk).sum())
    sdd = float((tt * dk * dk).sum())
    u2 = n1 * float(n2) / (n * n) * (sdd - sd * sd / n)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_view": np.array([n1], np.int64),
        "n_purchase": np.array([n2], np.int64),
        "watson_u2": [float(rha(u2, 6))],
        "rejected": np.array([1 if u2 > 0.187 else 0], np.int64)})


@register("watson_u2_purchase_uniformity", sql="""
WITH b AS (SELECT (epoch_us(ts) % 86400000000) // 1000000 AS sod
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT sod, CAST(COUNT(*) AS BIGINT) AS tt
      FROM b GROUP BY 1),
r AS (SELECT sod / 86400.0 AS u, tt,
             SUM(tt) OVER (ORDER BY sod) AS bb,
             SUM(tt) OVER (ORDER BY sod) - tt AS aa,
             SUM(tt) OVER () AS n
      FROM c),
tm AS (SELECT n, u, tt,
              CAST(bb AS HUGEINT) * bb
                  - CAST(aa AS HUGEINT) * aa AS odd1,
              (CAST(bb AS HUGEINT) * (2 * CAST(bb AS HUGEINT) - 1)
                   * (2 * CAST(bb AS HUGEINT) + 1)
               - CAST(aa AS HUGEINT) * (2 * CAST(aa AS HUGEINT) - 1)
                   * (2 * CAST(aa AS HUGEINT) + 1)) / 3 AS odd2
       FROM r),
ag AS (SELECT MAX(n) AS n,
              SUM(tt * u * u) AS suu,
              SUM(u * CAST(odd1 AS DOUBLE)) AS so1,
              CAST(SUM(odd2) AS DOUBLE) AS so2,
              SUM(tt * u) AS su
       FROM tm),
u2 AS (SELECT n,
              suu - so1 / n + so2 / (4.0 * CAST(n AS DOUBLE) * n)
              + 1.0 / (12.0 * n)
              - n * POW(su / n - 0.5, 2) AS v
       FROM ag)
SELECT CAST(n AS BIGINT) AS n_purchases,
       ROUND(v, 6) AS watson_u2,
       CAST(CASE WHEN v > 0.187 THEN 1 ELSE 0 END AS BIGINT)
           AS nonuniform
FROM u2""")
def watson_u2_purchase_uniformity(sf_dir: str) -> pd.DataFrame:
    """One-sample Watson U² of purchase time-of-day against the
    uniform clock — the OMNIBUS complement of the resultant-based
    circadian rows: a mean-direction statistic (Rayleigh-style
    concentration) is blind to any symmetric multimodal shape, and
    the classic failure case is exactly a commerce clock with a
    lunch peak opposite an evening peak whose resultants cancel to
    ≈0. U² = Σᵢ(u₍ᵢ₎−(2i−1)/(2n))² + 1/(12n) − n(ū−½)² detects
    ANY departure and is rotation-invariant, so midnight's
    position in the data is irrelevant. Tied seconds are handled
    exactly by block-summing the order-statistic terms over the
    second-of-day histogram: Σ(2i−1) = b²−(a−1)² and
    Σ(2i−1)² = [m(2m−1)(2m+1)/3] differences in 128-bit on both
    engines, so the statistic is exact-rational up to the shared
    u = sod/86400 grid. 5% point 0.187 (same Stephens table as
    the two-sample row — the asymptotic distributions coincide)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "purchase"]
        us = d["ts"].to_numpy("datetime64[us]").astype(np.int64)
        sod = (us % 86_400_000_000) // 1_000_000
        return pd.DataFrame({
            "sod": sod,
            "tt": np.ones(len(d), np.int64)}) \
            .groupby("sod", as_index=False).sum()

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["sod"], {"tt": ("tt", "sum")}) \
        .to_pandas().sort_values("sod", ignore_index=True)
    tt = c["tt"].to_numpy(np.int64).astype(object)
    n = int(tt.sum())
    u = c["sod"].to_numpy(np.int64) / 86400.0
    bb = tt.cumsum()
    aa = bb - tt
    odd1 = bb * bb - aa * aa
    odd2 = (bb * (2 * bb - 1) * (2 * bb + 1)
            - aa * (2 * aa - 1) * (2 * aa + 1)) // 3
    suu = float((tt.astype(np.float64) * u * u).sum())
    so1 = float((u * odd1.astype(np.float64)).sum())
    so2 = float(odd2.sum())
    su = float((tt.astype(np.float64) * u).sum())
    v = suu - so1 / n + so2 / (4.0 * float(n) * n) \
        + 1.0 / (12.0 * n) - n * (su / n - 0.5) ** 2
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_purchases": np.array([n], np.int64),
        "watson_u2": [float(rha(v, 6))],
        "nonuniform": np.array([1 if v > 0.187 else 0],
                               np.int64)})


# ---------------------------------------------------------------------------
# Trend-regression remedies: Goldfeld–Quandt variance ordering +
# Prais–Winsten AR(1) FGLS on the daily series
# ---------------------------------------------------------------------------

@register("goldfeld_quandt_daily", sql=f"""
WITH {_DAILY_SQL},
sp AS (SELECT y, t, n, n // 5 AS c, (n - n // 5) // 2 AS n1
       FROM x),
seg AS (SELECT y, t,
               CASE WHEN t <= n1 THEN 0
                    WHEN t > n - (n - c - n1) THEN 1 END AS h
        FROM sp),
s AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(t * y) AS HUGEINT) AS sxy
      FROM seg WHERE h IS NOT NULL GROUP BY h),
r AS (SELECT h, n,
             (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
              - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
             / n AS ssr
      FROM s),
f AS (SELECT (SELECT n FROM r WHERE h = 0) AS na,
             (SELECT n FROM r WHERE h = 1) AS nb,
             (SELECT ssr FROM r WHERE h = 1)
                 / ((SELECT n FROM r WHERE h = 1) - 2)
             / ((SELECT ssr FROM r WHERE h = 0)
                / ((SELECT n FROM r WHERE h = 0) - 2)) AS gq),
z AS (SELECT na, nb, gq,
             LN(gq) / SQRT(2.0 / (na - 2) + 2.0 / (nb - 2)) AS zz
      FROM f)
SELECT CAST(na AS BIGINT) AS n_early,
       CAST(nb AS BIGINT) AS n_late,
       ROUND(gq, 6) AS gq_f,
       ROUND(zz, 6) AS z,
       ROUND(2.0 * {_QGEN.format(x="ABS(zz)")}, 6) AS p,
       CAST(CASE WHEN 2.0 * {_QGEN.format(x="ABS(zz)")} < 0.05
                 THEN 1 ELSE 0 END AS BIGINT)
           AS heteroscedastic
FROM z""")
def goldfeld_quandt_daily(sf_dir: str) -> pd.DataFrame:
    """Goldfeld–Quandt test on the daily trend, ordered by TIME:
    fit the trend separately on the earliest and latest thirds-ish
    (middle n/5 days dropped — the classic gap that sharpens the
    contrast), F = ratio of late to early residual variance. The
    registry's other heteroscedasticity tests condition on the
    REGRESSOR (Breusch–Pagan on fitted values, White on squares);
    GQ ordered by time answers the operational question those
    can't: is the series becoming NOISIER as the product grows —
    variance creeping up with volume is exactly what invalidates
    a control-limit band calibrated on early data, and F >> 1
    here says recalibrate the bands, not the mean. Per-segment
    SSRs from the same exact integer sufficient statistics as the
    Chow row (which splits at the SAME point but compares MEANS —
    the two rows together separate 'level broke' from 'noise
    grew'). Since the F critical depends on both df, the pinned
    p uses Fisher's log-variance normalization
    z = ln F/√(2/d₁+2/d₂) through the shared A&S tail."""
    y = _daily_counts(sf_dir)
    n = len(y)
    c = n // 5
    n1 = (n - c) // 2
    n2 = n - c - n1
    ya, yb = y[:n1], y[n - n2:]
    ssra = _ols_ssr(*_ols_int_sums(ya, 1))
    ssrb = _ols_ssr(*_ols_int_sums(yb, n - n2 + 1))
    gq = (ssrb / (n2 - 2)) / (ssra / (n1 - 2))
    z = np.log(gq) / np.sqrt(2.0 / (n1 - 2) + 2.0 / (n2 - 2))
    p = 2.0 * _norm_q(abs(z))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_early": np.array([n1], np.int64),
        "n_late": np.array([n2], np.int64),
        "gq_f": [float(rha(gq, 6))],
        "z": [float(rha(z, 6))],
        "p": [float(rha(p, 6))],
        "heteroscedastic": np.array([1 if p < 0.05 else 0],
                                    np.int64)})


@register("prais_winsten_daily", sql=f"""
WITH {_DAILY_SQL},
mo AS (SELECT MAX(n) AS n,
              CAST(SUM(t) AS HUGEINT) AS st,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(t * t) AS HUGEINT) AS stt,
              CAST(SUM(t * y) AS HUGEINT) AS sty
       FROM x),
ab AS (SELECT n,
              CAST(n * sty - st * sy AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE) AS b
       FROM mo),
abi AS (SELECT n, b,
               (CAST((SELECT sy FROM mo) AS DOUBLE)
                - b * CAST((SELECT st FROM mo) AS DOUBLE)) / n AS a
        FROM ab),
e AS (SELECT x.t, x.y - abi.a - abi.b * x.t AS e,
             LAG(x.y - abi.a - abi.b * x.t)
                 OVER (ORDER BY x.t) AS el
      FROM x CROSS JOIN abi),
rh AS (SELECT SUM(e * el) / SUM(el * el) AS rho
       FROM e WHERE el IS NOT NULL),
tr AS (SELECT x.t,
              CASE WHEN x.t = 1 THEN SQRT(1 - rho * rho) * x.y
                   ELSE x.y - rho * LAG(CAST(x.y AS DOUBLE))
                       OVER (ORDER BY x.t) END AS ys,
              CASE WHEN x.t = 1 THEN SQRT(1 - rho * rho) * x.t
                   ELSE x.t - rho * (x.t - 1) END AS xs,
              CASE WHEN x.t = 1 THEN SQRT(1 - rho * rho)
                   ELSE 1 - rho END AS cs
       FROM x CROSS JOIN rh),
nm AS (SELECT SUM(cs * cs) AS scc, SUM(cs * xs) AS scx,
              SUM(cs * ys) AS scy, SUM(xs * xs) AS sxx,
              SUM(xs * ys) AS sxy
       FROM tr),
pw AS (SELECT (scc * sxy - scx * scy)
                  / (scc * sxx - scx * scx) AS b_pw
       FROM nm),
co AS (SELECT SUM(cs * cs) AS scc, SUM(cs * xs) AS scx,
              SUM(cs * ys) AS scy, SUM(xs * xs) AS sxx,
              SUM(xs * ys) AS sxy
       FROM tr JOIN x USING (t) WHERE x.t > 1),
cob AS (SELECT (scc * sxy - scx * scy)
                   / (scc * sxx - scx * scx) AS b_co
        FROM co)
SELECT (SELECT CAST(n AS BIGINT) FROM mo) AS n_days,
       ROUND((SELECT rho FROM rh), 6) AS rho,
       ROUND((SELECT b FROM abi), 6) AS slope_ols,
       ROUND((SELECT b_co FROM cob), 6) AS slope_co,
       ROUND((SELECT b_pw FROM pw), 6) AS slope_pw""")
def prais_winsten_daily(sf_dir: str) -> pd.DataFrame:
    """Prais–Winsten AR(1) FGLS on the daily trend — the remedy
    sibling of the Newey–West row: NW keeps the OLS slope and
    widens its SE to survive autocorrelation, PW TRANSFORMS the
    regression (quasi-differencing by the residual lag-1 ρ̂) so
    the estimate itself regains efficiency, and the difference
    between the two slopes is the practical price of serial
    correlation in the point estimate rather than the band. Both
    the Cochrane–Orcutt slope (drops day 1) and the PW slope
    (keeps it, weighted √(1−ρ²)) are reported because at
    trend-length T≈30 the single rescued observation visibly
    moves the estimate — the textbook small-T lesson (CO can
    even flip weak trends) made concrete; slope_ols beside them
    completes the triangle. One FGLS pass (no iteration) with
    ρ̂ = Σeₜeₜ₋₁/Σeₜ₋₁², both regressions solved by the same
    2×2 normal equations in the oracle's operation order."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = (y.sum() - b * t.sum()) / n
    e = y - a - b * t
    rho = float((e[1:] * e[:-1]).sum() / (e[:-1] * e[:-1]).sum())
    s = np.sqrt(1 - rho * rho)
    ys = np.concatenate(([s * y[0]], y[1:] - rho * y[:-1]))
    xs = np.concatenate(([s * t[0]], t[1:] - rho * t[:-1]))
    cs = np.concatenate(([s], np.full(n - 1, 1 - rho)))

    def biv(cs_, xs_, ys_):
        scc = (cs_ * cs_).sum()
        scx = (cs_ * xs_).sum()
        scy = (cs_ * ys_).sum()
        sxx = (xs_ * xs_).sum()
        sxy = (xs_ * ys_).sum()
        return (scc * sxy - scx * scy) / (scc * sxx - scx * scx)

    b_pw = float(biv(cs, xs, ys))
    b_co = float(biv(cs[1:], xs[1:], ys[1:]))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "rho": [float(rha(rho, 6))],
        "slope_ols": [float(rha(b, 6))],
        "slope_co": [float(rha(b_co, 6))],
        "slope_pw": [float(rha(b_pw, 6))]})


# ---------------------------------------------------------------------------
# Binary lattice autocorrelation: join counts + Getis–Ord Gi*
# hotspots on the hour-of-week ring
# ---------------------------------------------------------------------------

@register("join_counts_hourweek", sql=f"""
WITH {_HW_RING_SQL},
sv AS (SELECT x, COUNT(*) AS c FROM lat GROUP BY x),
cm AS (SELECT x, SUM(c) OVER (ORDER BY x) AS f FROM sv),
md AS (SELECT MIN(CASE WHEN f >= 84 THEN x END) AS m FROM cm),
hot AS (SELECT r.hw,
               CASE WHEN r.x > md.m THEN 1 ELSE 0 END AS h,
               CASE WHEN r.nx > md.m THEN 1 ELSE 0 END AS nh
        FROM ring r CROSS JOIN md),
jc AS (SELECT CAST(SUM(h * nh) AS BIGINT) AS bb,
              CAST(SUM(CASE WHEN h <> nh THEN 1 ELSE 0 END)
                   AS BIGINT) AS bw,
              CAST(SUM(h) AS BIGINT) AS n1
       FROM hot),
mo AS (SELECT bb, bw, n1, 168 - n1 AS n2,
              168.0 * n1 * (n1 - 1) / (168.0 * 167) AS ebb,
              0.25 * (672.0 * n1 * (n1 - 1) / (168.0 * 167)
                      + 1344.0 * n1 * (n1 - 1) * (n1 - 2)
                        / (168.0 * 167 * 166)
                      + 110880.0 * n1 * (n1 - 1) * (n1 - 2)
                        * (n1 - 3)
                        / (168.0 * 167 * 166 * 165))
              - POW(168.0 * n1 * (n1 - 1) / (168.0 * 167), 2)
                  AS vbb,
              336.0 * n1 * (168 - n1) / (168.0 * 167) AS ebw,
              0.25 * (1344.0 * n1 * (168 - n1) / (168.0 * 167)
                      + 1344.0 * n1 * (168 - n1) * 166
                        / (168.0 * 167 * 166)
                      + 4.0 * 110880.0 * n1 * (n1 - 1)
                        * (168 - n1) * (167 - n1)
                        / (168.0 * 167 * 166 * 165))
              - POW(336.0 * n1 * (168 - n1) / (168.0 * 167), 2)
                  AS vbw
       FROM jc)
SELECT n1 AS n_hot, bb AS bb_joins, bw AS bw_joins,
       ROUND(ebb, 6) AS e_bb,
       ROUND((bb - ebb) / SQRT(vbb), 6) AS z_bb,
       ROUND(ebw, 6) AS e_bw,
       ROUND((bw - ebw) / SQRT(vbw), 6) AS z_bw,
       CAST(CASE WHEN (bb - ebb) / SQRT(vbb) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS hot_clustered
FROM mo""")
def join_counts_hourweek(sf_dir: str) -> pd.DataFrame:
    """Join-count statistics on the hour-of-week ring, binarized
    at the lattice lower median (hot = busier than the median
    cell): BB = hot–hot adjacencies, BW = hot–cold boundaries,
    with EXACT hypergeometric-randomization moments. This is the
    spatial-autocorrelation question asked of the BINARY pattern —
    Moran/Geary (present) weight big cells quadratically, so one
    monster hour can carry their z; join counts ask only whether
    the hot SET is contiguous: BB above its null says busy hours
    arrive in blocks (staff whole shifts), BW below its null says
    few transitions (clean on/off-peak boundaries — a two-tier
    rate card fits), while BB ≈ E[BB] says 'hot' scatters and any
    peak/off-peak dichotomy is a fiction of the colormap. The
    Cliff–Ord variances with ring weight moments S0/S1/S2 =
    336/672/2688 reduce to the stated closed forms (verified by
    exhaustive arrangement enumeration in the pinning suite);
    84th-smallest lower median, strict > for hot, both engines."""
    r = _hourweek_ring(sf_dir)
    x = r["x"].to_numpy(np.int64)
    nx = r["nx"].to_numpy(np.int64)
    m = int(np.sort(x)[83])
    h = (x > m).astype(np.int64)
    nh = (nx > m).astype(np.int64)
    bb = int((h * nh).sum())
    bw = int((h != nh).sum())
    n1 = int(h.sum())
    n2 = 168 - n1
    ebb = 168.0 * n1 * (n1 - 1) / (168.0 * 167)
    vbb = 0.25 * (672.0 * n1 * (n1 - 1) / (168.0 * 167)
                  + 1344.0 * n1 * (n1 - 1) * (n1 - 2)
                  / (168.0 * 167 * 166)
                  + 110880.0 * n1 * (n1 - 1) * (n1 - 2)
                  * (n1 - 3) / (168.0 * 167 * 166 * 165)) \
        - (168.0 * n1 * (n1 - 1) / (168.0 * 167)) ** 2
    ebw = 336.0 * n1 * n2 / (168.0 * 167)
    vbw = 0.25 * (1344.0 * n1 * n2 / (168.0 * 167)
                  + 1344.0 * n1 * n2 * 166 / (168.0 * 167 * 166)
                  + 4.0 * 110880.0 * n1 * (n1 - 1) * n2
                  * (n2 - 1) / (168.0 * 167 * 166 * 165)) \
        - ebw ** 2
    rha = textstats.round_half_away
    z_bb = (bb - ebb) / np.sqrt(vbb)
    return pd.DataFrame({
        "n_hot": np.array([n1], np.int64),
        "bb_joins": np.array([bb], np.int64),
        "bw_joins": np.array([bw], np.int64),
        "e_bb": [float(rha(ebb, 6))],
        "z_bb": [float(rha(z_bb, 6))],
        "e_bw": [float(rha(ebw, 6))],
        "z_bw": [float(rha((bw - ebw) / np.sqrt(vbw), 6))],
        "hot_clustered": np.array(
            [1 if z_bb > 1.959964 else 0], np.int64)})


@register("getis_ord_hotspots_hourweek", sql=f"""
WITH {_HW_RING_SQL},
w3 AS (SELECT a.hw, a.x,
              p.x + a.x + b.x AS s3
       FROM lat a
       JOIN lat b ON b.hw = (a.hw + 1) % 168
       JOIN lat p ON p.hw = (a.hw + 167) % 168),
mo AS (SELECT CAST(SUM(x) AS DOUBLE) / 168 AS mu,
              (CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE)
               - 168 * POW(CAST(SUM(x) AS DOUBLE) / 168, 2))
              / 168 AS v
       FROM lat),
z AS (SELECT hw, s3,
             (s3 - 3.0 * mu)
                 / SQRT(v * (3.0 * 165.0 / 167.0)) AS gz
      FROM w3 CROSS JOIN mo)
SELECT CAST(hw // 24 AS BIGINT) AS dow,
       CAST(hw % 24 AS BIGINT) AS hour,
       CAST(s3 AS BIGINT) AS window_events,
       ROUND(gz, 6) AS gi_z
FROM z ORDER BY ROUND(gz, 9) DESC, hw LIMIT 5""")
def getis_ord_hotspots_hourweek(sf_dir: str) -> pd.DataFrame:
    """Getis–Ord Gi* hotspots: for every hour-of-week cell, the
    z-score of its 3-hour centered window sum against the exact
    permutation null (mean 3x̄, variance 3σ²(n−3)/(n−1) — drawing
    3 cells without replacement from the 168, which is precisely
    what Gi*'s (nS₁ᵢ−W²)/(n−1) denominator reduces to for this
    weight row, so the printed z is exact, not asymptotic-only).
    The LOCAL complement of the global rows: Moran/join-counts
    say WHETHER hot hours clump; this names WHERE — the top-5
    windows are the shift-scheduling answer ('Tuesday 19–21h is
    a 4.2σ hotspot'), and because Gi* includes the cell itself it
    flags sustained 3-hour loads rather than single-hour spikes
    (a lone monster hour flanked by quiet neighbors scores lower
    than three solidly-busy hours — the roster-relevant shape).
    Cyclic ±1 window on the same ring lattice; 9dp ordering with
    hw ties, DuckDB Sunday-0 dow decoding on both engines."""
    r = _hourweek_ring(sf_dir)
    x = r["x"].to_numpy(np.int64)
    s3 = np.roll(x, 1) + x + np.roll(x, -1)
    mu = float(x.sum()) / 168
    v = (float((x.astype(object) * x).sum()) - 168 * mu ** 2) / 168
    gz = (s3 - 3.0 * mu) / np.sqrt(v * (3.0 * 165.0 / 167.0))
    rha = textstats.round_half_away
    df = pd.DataFrame({
        "hw": np.arange(168, dtype=np.int64),
        "dow": np.arange(168, dtype=np.int64) // 24,
        "hour": np.arange(168, dtype=np.int64) % 24,
        "window_events": s3.astype(np.int64),
        "gi_z": [float(rha(g, 6)) for g in gz],
        "k9": [float(rha(g, 9)) for g in gz]})
    df = df.sort_values(["k9", "hw"], ascending=[False, True],
                        ignore_index=True).head(5)
    return df[["dow", "hour", "window_events", "gi_z"]]


# ---------------------------------------------------------------------------
# L1 trend fitting: exact LAD line + the quantile-regression
# corridor on daily counts
# ---------------------------------------------------------------------------

def _pair_lines(y: np.ndarray):
    """All O(n²) candidate (slope, intercept, i, j) lines through
    day pairs — the LP-basic solutions among which an exact L1 /
    check-loss optimum always lies. Calendar-bounded: n days keeps
    the scan driver-side postage-stamp work at any event scale."""
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    yy = y.astype(np.float64)
    ii, jj = np.triu_indices(n, k=1)
    sl = (yy[jj] - yy[ii]) / (t[jj] - t[ii])
    ic = yy[ii] - sl * t[ii]
    return t, yy, sl, ic, ii, jj


@register("lad_trend_daily", sql=f"""
WITH {_DAILY_SQL},
pr AS (SELECT a.t AS t1, b.t AS t2,
              CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS sl,
              a.y - CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) * a.t
                  AS ic
       FROM x a JOIN x b ON b.t > a.t),
sad AS (SELECT pr.t1, pr.t2, pr.sl, pr.ic,
               SUM(ABS(x.y - pr.ic - pr.sl * x.t)) AS sad
        FROM pr CROSS JOIN x GROUP BY 1, 2, 3, 4),
best AS (SELECT * FROM sad
         ORDER BY ROUND(sad, 9), t1, t2 LIMIT 1),
mo AS (SELECT MAX(n) AS n,
              CAST(SUM(t) AS HUGEINT) AS st,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(t * t) AS HUGEINT) AS stt,
              CAST(SUM(t * y) AS HUGEINT) AS sty
       FROM x),
ob AS (SELECT n,
              CAST(n * sty - st * sy AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE) AS b
       FROM mo),
oi AS (SELECT n, b,
              (CAST((SELECT sy FROM mo) AS DOUBLE)
               - b * CAST((SELECT st FROM mo) AS DOUBLE)) / n AS a
       FROM ob),
osad AS (SELECT SUM(ABS(x.y - oi.a - oi.b * x.t)) AS sad_ols,
                MAX(oi.b) AS b_ols
         FROM x CROSS JOIN oi)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM x) AS n_days,
       ROUND((SELECT sl FROM best), 6) AS slope_lad,
       ROUND((SELECT ic FROM best), 6) AS intercept_lad,
       ROUND((SELECT sad FROM best), 6) AS sad_lad,
       ROUND((SELECT b_ols FROM osad), 6) AS slope_ols,
       ROUND((SELECT sad_ols FROM osad), 6) AS sad_ols""")
def lad_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Exact least-absolute-deviations trend on daily counts — the
    MEDIAN line beside the registry's mean line (OLS), rank line
    (Theil–Sen) and quasi-differenced line (Prais–Winsten). An L1
    optimum always sits at an LP basic solution, i.e. a line
    through two data points, so scanning all O(n²) day pairs and
    summing |residuals| finds the EXACT minimizer — no iterative
    reweighting, no solver, and both engines agree to the last
    bit of the 9dp tie rule (earliest pair wins among equal-SAD
    optima, which exist whenever the LP optimum is a face rather
    than a vertex). sad_ols beside sad_lad prices the mean line
    in the median line's own currency: the gap is what squared-
    loss efficiency costs in absolute-error terms, and a large
    slope_lad/slope_ols disagreement is the one-number outlier
    alarm — a handful of spike days steer OLS but cannot steer
    the L1 fit. O(n³) with n = calendar days: postage-stamp."""
    y = _daily_counts(sf_dir)
    n = len(y)
    t, yy, sl, ic, ii, jj = _pair_lines(y)
    sad = np.abs(yy[None, :] - ic[:, None]
                 - sl[:, None] * t[None, :]).sum(axis=1)
    rha = textstats.round_half_away
    order = np.lexsort((jj, ii,
                        np.asarray(rha(sad, 9), np.float64)))
    k = order[0]
    b = (n * (t * yy).sum() - t.sum() * yy.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = (yy.sum() - b * t.sum()) / n
    sad_ols = float(np.abs(yy - a - b * t).sum())
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "slope_lad": [float(rha(sl[k], 6))],
        "intercept_lad": [float(rha(ic[k], 6))],
        "sad_lad": [float(rha(sad[k], 6))],
        "slope_ols": [float(rha(b, 6))],
        "sad_ols": [float(rha(sad_ols, 6))]})


@register("quantile_regression_corridor_daily", sql=f"""
WITH {_DAILY_SQL},
pr AS (SELECT a.t AS t1, b.t AS t2,
              CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS sl,
              a.y - CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) * a.t
                  AS ic
       FROM x a JOIN x b ON b.t > a.t),
ta AS (SELECT 0.25 AS tau UNION ALL SELECT 0.75),
lo AS (SELECT ta.tau, pr.t1, pr.t2, pr.sl, pr.ic,
              SUM(CASE WHEN x.y >= pr.ic + pr.sl * x.t
                       THEN ta.tau * (x.y - pr.ic - pr.sl * x.t)
                       ELSE (1 - ta.tau)
                            * (pr.ic + pr.sl * x.t - x.y)
                  END) AS loss
       FROM pr CROSS JOIN x CROSS JOIN ta
       GROUP BY 1, 2, 3, 4, 5),
best AS (SELECT tau, sl, ic, loss FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY tau
                ORDER BY ROUND(loss, 9), t1, t2) AS rn
            FROM lo) WHERE rn = 1)
SELECT tau, ROUND(sl, 6) AS slope,
       ROUND(ic, 6) AS intercept,
       ROUND(loss, 6) AS check_loss
FROM best ORDER BY tau""")
def quantile_regression_corridor_daily(sf_dir: str) -> pd.DataFrame:
    """The quantile-regression corridor: exact τ = 0.25 and
    τ = 0.75 trend lines on daily counts by the same pair-scan
    (a check-loss optimum is also an LP basic solution, so the
    two-point scan is exact at any τ). The corridor answers what
    no single trend line can: whether the DISTRIBUTION of daily
    volume is fanning out — slope(0.75) > slope(0.25) means good
    days are improving faster than bad days are (widening spread,
    the same verdict the Goldfeld–Quandt row reaches through
    residual variances, but expressed in interpretable
    events/day-per-day units and robust to the tail), while
    parallel corridor edges certify a pure location trend where
    mean machinery suffices. Reading slope(0.25) alone is the
    pessimist's KPI: the trend of a reliably-bad day, the number
    capacity floors should be planned on. Ties: 9dp loss then
    earliest pair, per τ, both engines."""
    y = _daily_counts(sf_dir)
    t, yy, sl, ic, ii, jj = _pair_lines(y)
    resid = yy[None, :] - ic[:, None] - sl[:, None] * t[None, :]
    rha = textstats.round_half_away
    rows = []
    for tau in (0.25, 0.75):
        loss = np.where(resid >= 0, tau * resid,
                        (tau - 1) * resid).sum(axis=1)
        order = np.lexsort((jj, ii,
                            np.asarray(rha(loss, 9), np.float64)))
        k = order[0]
        rows.append((tau, float(rha(sl[k], 6)),
                     float(rha(ic[k], 6)),
                     float(rha(loss[k], 6))))
    return pd.DataFrame(rows, columns=[
        "tau", "slope", "intercept", "check_loss"])


# ---------------------------------------------------------------------------
# Process capability on fulfillment latency: per-priority Cpk +
# the normality gap that prices the index's hidden assumption
# ---------------------------------------------------------------------------

def _lag_prio_hist(sf_dir: str) -> pd.DataFrame:
    """(priority, lag_days, cnt) histogram of order→ship lag — the
    shared input of the capability rows. Fact-to-fact through
    auto_join on orderkey; the lag range is bounded (TPC-H ships
    within ~4 months) so the histogram is spec-bounded, not
    data-bounded, and only its partials shuffle."""
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
        columns=["o_orderkey", "o_orderdate",
                 "o_orderpriority"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "od": df["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "prio": df["o_orderpriority"]}),
        batch_format="pandas")
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "prio": df["prio"],
            "lag_d": df["sd"].to_numpy(np.int64)
            - df["od"].to_numpy(np.int64),
            "cnt": np.ones(len(df), np.int64)})
        return out.groupby(["prio", "lag_d"],
                           as_index=False).sum()

    return reduce_sink(
        j.map_batches(hist, batch_format="pandas"),
        ["prio", "lag_d"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values(["prio", "lag_d"], ignore_index=True)


#: shared (priority, lag, cnt) histogram off the orderkey join.
_LAGPRIO_SQL = """
l AS (SELECT l_orderkey,
             epoch_us(l_shipdate) // 86400000000 AS sd
      FROM lineitem),
o AS (SELECT o_orderkey,
             epoch_us(o_orderdate) // 86400000000 AS od,
             o_orderpriority AS prio
      FROM orders),
h AS (SELECT o.prio, l.sd - o.od AS lag_d,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM l JOIN o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2)"""


@register("process_capability_ship_lag", sql=f"""
WITH {_LAGPRIO_SQL},
mo AS (SELECT prio,
              CAST(SUM(cnt) AS BIGINT) AS n,
              CAST(SUM(cnt * lag_d) AS HUGEINT) AS s1,
              CAST(SUM(cnt * lag_d * lag_d) AS HUGEINT) AS s2,
              CAST(SUM(CASE WHEN lag_d > 90 THEN cnt ELSE 0 END)
                   AS BIGINT) AS bad
       FROM h GROUP BY 1),
st AS (SELECT prio, n, bad,
              CAST(s1 AS DOUBLE) / n AS mu,
              SQRT((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                  AS sd
       FROM mo)
SELECT prio AS priority, n AS n_items,
       ROUND(mu, 6) AS mean_lag_days,
       ROUND(sd, 6) AS sd_lag_days,
       ROUND(LEAST((90.0 - mu) / (3.0 * sd),
                   (mu - 0.0) / (3.0 * sd)), 6) AS cpk,
       ROUND(CAST(bad AS DOUBLE) / n * 1e6, 6) AS observed_ppm
FROM st ORDER BY prio""")
def process_capability_ship_lag(sf_dir: str) -> pd.DataFrame:
    """Process-capability index of the order→ship lag per order
    priority against a [0, 90]-day spec: Cpk = min(USL−μ, μ−LSL)/3σ
    — the SPC family's answer to 'can this process MEET the
    promise', which the control-chart rows (present) never ask:
    a p-chart certifies stability around whatever mean the
    process has; Cpk compares the process's natural ±3σ spread to
    the spec the customer was sold. Cpk ≥ 1.33 is the classic
    'capable' bar, < 1 means the process ships late in the normal
    course of business, and a 1-URGENT row with lower Cpk than
    5-LOW is the indictment a mean-lag comparison soft-pedals —
    priority labels that don't buy tighter DELIVERY are pricing
    theater. observed_ppm beside it is the empirical defect rate
    the index claims to summarize (read with the normality-gap
    row). Exact integer day-lag moments per priority; only the
    bounded (priority, lag) histogram leaves the cluster."""
    h = _lag_prio_hist(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for prio, g in h.groupby("prio", sort=True):
        c = g["cnt"].to_numpy(np.int64).astype(object)
        d = g["lag_d"].to_numpy(np.int64).astype(object)
        n = int(c.sum())
        s1 = int((c * d).sum())
        s2 = int((c * d * d).sum())
        bad = int(c[np.asarray(d > 90, bool)].sum())
        mu = float(s1) / n
        sd = np.sqrt((float(s2) - float(s1) * s1 / n) / (n - 1))
        cpk = min((90.0 - mu) / (3.0 * sd),
                  (mu - 0.0) / (3.0 * sd))
        rows.append((prio, n, float(rha(mu, 6)),
                     float(rha(sd, 6)), float(rha(cpk, 6)),
                     float(rha(bad / n * 1e6, 6))))
    return pd.DataFrame(rows, columns=[
        "priority", "n_items", "mean_lag_days", "sd_lag_days",
        "cpk", "observed_ppm"]).astype({"n_items": np.int64})


@register("capability_normality_gap", sql=f"""
WITH {_LAGPRIO_SQL},
mo AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
              CAST(SUM(cnt * lag_d) AS HUGEINT) AS s1,
              CAST(SUM(cnt * lag_d * lag_d) AS HUGEINT) AS s2,
              CAST(SUM(CASE WHEN lag_d > 90 THEN cnt ELSE 0 END)
                   AS BIGINT) AS bad
       FROM h),
st AS (SELECT n, bad,
              CAST(s1 AS DOUBLE) / n AS mu,
              SQRT((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                  AS sd
       FROM mo),
pr AS (SELECT n, bad, mu, sd,
              {_ASQ.format(v="((90.0 - mu) / sd)")}
              + {_ASQ.format(v="((mu - 0.0) / sd)")} AS p_norm
       FROM st)
SELECT n AS n_items,
       ROUND(LEAST((90.0 - mu) / (3.0 * sd),
                   (mu - 0.0) / (3.0 * sd)), 6) AS cpk,
       ROUND(CAST(bad AS DOUBLE) / n * 1e6, 6) AS observed_ppm,
       ROUND(p_norm * 1e6, 6) AS normal_implied_ppm,
       ROUND(CAST(bad AS DOUBLE) / n / p_norm, 6)
           AS ppm_ratio
FROM pr""")
def capability_normality_gap(sf_dir: str) -> pd.DataFrame:
    """The assumption under every Cpk, priced: the pooled lag's
    observed out-of-spec rate beside the rate a NORMAL process
    with the same μ, σ would imply (Q((USL−μ)/σ) + Q((μ−LSL)/σ),
    the tail areas the 'Cpk ⇒ defect ppm' conversion tables are
    computed from). The order→ship lag is roughly UNIFORM over
    its window — platykurtic, hard-edged — so the normal model
    hallucinates a long tail that isn't there (or, flipped,
    under-predicts edge mass); ppm_ratio far from 1 is the
    one-number demonstration that a capability index quoted
    without a distribution check converts to defect rates off by
    orders of magnitude. This is the Shapiro–Francia lesson
    (levels-vs-logs row) replayed in the SPC family, where the
    stakes are contractual ppm commitments. Same exact moments
    and pinned A&S tail on both engines."""
    h = _lag_prio_hist(sf_dir)
    c = h["cnt"].to_numpy(np.int64).astype(object)
    d = h["lag_d"].to_numpy(np.int64).astype(object)
    n = int(c.sum())
    s1 = int((c * d).sum())
    s2 = int((c * d * d).sum())
    bad = int(c[np.asarray(d > 90, bool)].sum())
    mu = float(s1) / n
    sd = np.sqrt((float(s2) - float(s1) * s1 / n) / (n - 1))
    cpk = min((90.0 - mu) / (3.0 * sd), (mu - 0.0) / (3.0 * sd))
    p_norm = _as_upper_q((90.0 - mu) / sd) \
        + _as_upper_q((mu - 0.0) / sd)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_items": np.array([n], np.int64),
        "cpk": [float(rha(cpk, 6))],
        "observed_ppm": [float(rha(bad / n * 1e6, 6))],
        "normal_implied_ppm": [float(rha(p_norm * 1e6, 6))],
        "ppm_ratio": [float(rha(bad / n / p_norm, 6))]})


# ---------------------------------------------------------------------------
# Lifecycle marginal homogeneity: Stuart–Maxwell on first-vs-last
# session outcome + the per-level marginal-shift decomposition
# ---------------------------------------------------------------------------

def _first_last_outcomes(sf_dir: str) -> pd.DataFrame:
    """(first_outcome, last_outcome, n) over users with ≥ 2 visit
    sessions; outcomes on the registry's canonical 0/1/2 scale
    (view-only / clicked / purchased). Sessionize-once inside
    user-hash buckets; only the ≤ 9-cell table leaves the driver."""
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
        et = g["event_type"].to_numpy()
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = us - np.roll(us, 1)
        ns = (~same) | (gap >= 1_800_000_000)
        sid = np.cumsum(ns)
        lvl = np.where(et == "purchase", 2,
                       np.where(et == "click", 1, 0))
        oc = pd.DataFrame({"sid": sid, "uid": uid, "lvl": lvl}) \
            .groupby("sid", sort=True).agg(uid=("uid", "first"),
                                           oc=("lvl", "max"))
        fl = oc.groupby("uid").agg(f=("oc", "first"),
                                   l=("oc", "last"),
                                   k=("oc", "size"))
        fl = fl[fl["k"] >= 2]
        out = pd.DataFrame({"f": fl["f"].to_numpy(np.int64),
                            "l": fl["l"].to_numpy(np.int64),
                            "n": np.ones(len(fl), np.int64)})
        return out.groupby(["f", "l"], as_index=False)["n"].sum()

    return reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id",
                         "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["f", "l"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values(["f", "l"], ignore_index=True)


#: 3×3 (first outcome, last outcome) counts over ≥2-session users.
_FIRSTLAST_SQL = f"""
{_SESS_OUTCOME_SQL},
fl AS (SELECT user_id, ARG_MIN(oc, sid) AS f,
              ARG_MAX(oc, sid) AS l, COUNT(*) AS k
       FROM so GROUP BY 1),
ct AS (SELECT f, l, CAST(COUNT(*) AS BIGINT) AS n
       FROM fl WHERE k >= 2 GROUP BY 1, 2)"""


def _fl_cell(ct: pd.DataFrame):
    cnt = {(int(f), int(l)): int(n)
           for f, l, n in zip(ct["f"], ct["l"], ct["n"])}
    r = [sum(cnt.get((i, j), 0) for j in range(3))
         for i in range(3)]
    c = [sum(cnt.get((j, i), 0) for j in range(3))
         for i in range(3)]
    return cnt, r, c


@register("stuart_maxwell_first_last_outcome", sql=f"""
WITH {_FIRSTLAST_SQL},
cc AS (SELECT
    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nu,
    CAST(COALESCE(SUM(CASE WHEN f = 0 THEN n END), 0) AS BIGINT)
        AS r0,
    CAST(COALESCE(SUM(CASE WHEN f = 1 THEN n END), 0) AS BIGINT)
        AS r1,
    CAST(COALESCE(SUM(CASE WHEN l = 0 THEN n END), 0) AS BIGINT)
        AS c0,
    CAST(COALESCE(SUM(CASE WHEN l = 1 THEN n END), 0) AS BIGINT)
        AS c1,
    CAST(COALESCE(SUM(CASE WHEN f = 0 AND l = 0 THEN n END), 0)
         AS BIGINT) AS n00,
    CAST(COALESCE(SUM(CASE WHEN f = 1 AND l = 1 THEN n END), 0)
         AS BIGINT) AS n11,
    CAST(COALESCE(SUM(CASE WHEN f = 0 AND l = 1 THEN n END), 0)
         AS BIGINT) AS n01,
    CAST(COALESCE(SUM(CASE WHEN f = 1 AND l = 0 THEN n END), 0)
         AS BIGINT) AS n10
    FROM ct),
sm AS (SELECT nu,
              CAST(r0 - c0 AS DOUBLE) AS d1,
              CAST(r1 - c1 AS DOUBLE) AS d2,
              CAST(r0 + c0 - 2 * n00 AS DOUBLE) AS v11,
              CAST(r1 + c1 - 2 * n11 AS DOUBLE) AS v22,
              -CAST(n01 + n10 AS DOUBLE) AS v12
       FROM cc),
st AS (SELECT nu,
              CASE WHEN v11 * v22 - v12 * v12 > 0 THEN
                  (d1 * d1 * v22 - 2 * d1 * d2 * v12
                   + d2 * d2 * v11) / (v11 * v22 - v12 * v12)
              END AS x2
       FROM sm)
SELECT nu AS n_users,
       ROUND(x2, 6) AS sm_chi2,
       ROUND(EXP(-x2 / 2.0), 6) AS p,
       CAST(CASE WHEN EXP(-x2 / 2.0) < 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS mix_shifted
FROM st""")
def stuart_maxwell_first_last_outcome(sf_dir: str) -> pd.DataFrame:
    """Stuart–Maxwell marginal-homogeneity test on each returning
    user's FIRST vs LAST session outcome (the canonical 0/1/2
    view-only/clicked/purchased scale): is the outcome MIX of
    where users end up the same as where they started? This is
    the k-category McNemar — the Bowker row asks if the paired
    table is symmetric cell-by-cell, SM asks only if its margins
    moved, the weaker hypothesis lifecycle reporting actually
    cares about ('are journeys graduating up the funnel or
    sliding back'), and it can hold while symmetry fails. PAIRING
    per user is the power move over comparing two independent
    snapshots: each user is their own control, so a population
    whose composition churns doesn't confound the shift.
    χ² = d′V⁻¹d on the reduced 2-vector (drop level 2), V from
    the paired counts, df = 2 — whose tail is EXACTLY e^(−x/2),
    so for once both engines share a closed form, not an
    approximation; singular V ⇒ NULL (degenerate agreement).
    Only the 3×3 table leaves the cluster."""
    cnt, r, c = _fl_cell(_first_last_outcomes(sf_dir))
    nu = sum(cnt.values())
    d1 = float(r[0] - c[0])
    d2 = float(r[1] - c[1])
    v11 = float(r[0] + c[0] - 2 * cnt.get((0, 0), 0))
    v22 = float(r[1] + c[1] - 2 * cnt.get((1, 1), 0))
    v12 = -float(cnt.get((0, 1), 0) + cnt.get((1, 0), 0))
    det = v11 * v22 - v12 * v12
    rha = textstats.round_half_away
    if det > 0:
        x2 = (d1 * d1 * v22 - 2 * d1 * d2 * v12
              + d2 * d2 * v11) / det
        p = float(np.exp(-x2 / 2.0))
        return pd.DataFrame({
            "n_users": np.array([nu], np.int64),
            "sm_chi2": [float(rha(x2, 6))],
            "p": [float(rha(p, 6))],
            "mix_shifted": np.array([1 if p < 0.05 else 0],
                                    np.int64)})
    return pd.DataFrame({
        "n_users": np.array([nu], np.int64),
        "sm_chi2": [np.nan], "p": [np.nan],
        "mix_shifted": np.array([0], np.int64)})


@register("outcome_marginal_shift", sql=f"""
WITH {_FIRSTLAST_SQL},
lv AS (SELECT CAST(r.range AS BIGINT) AS oc FROM range(0, 3) r),
mg AS (SELECT lv.oc,
              CAST(COALESCE((SELECT SUM(n) FROM ct
                             WHERE f = lv.oc), 0) AS BIGINT) AS rf,
              CAST(COALESCE((SELECT SUM(n) FROM ct
                             WHERE l = lv.oc), 0) AS BIGINT) AS cl,
              CAST(COALESCE((SELECT SUM(n) FROM ct
                             WHERE f = lv.oc AND l = lv.oc), 0)
                   AS BIGINT) AS dg
       FROM lv),
z AS (SELECT oc, rf, cl, cl - rf AS net,
             CASE WHEN rf + cl - 2 * dg > 0 THEN
                 CAST(cl - rf AS DOUBLE)
                 / SQRT(CAST(rf + cl - 2 * dg AS DOUBLE)) END AS zz
      FROM mg)
SELECT oc AS outcome, rf AS n_first, cl AS n_last,
       CAST(net AS BIGINT) AS net,
       ROUND(zz, 6) AS shift_z,
       ROUND(2.0 * {_ASQ.format(v="ABS(zz)")}, 6) AS p_two_sided
FROM z ORDER BY oc""")
def outcome_marginal_shift(sf_dir: str) -> pd.DataFrame:
    """The per-level decomposition of the Stuart–Maxwell scalar:
    for each outcome level, how many returning users STARTED
    there vs ENDED there, the integer net, and the McNemar-style
    z — under marginal homogeneity the users who changed level in
    or out of category i are a fair coin, so z = net/√(in+out) =
    net/√(r_i+c_i−2n_ii) exactly. Positive net at level 2 with
    negative at level 0 is the funnel WORKING across lifetimes
    (journeys graduate from browsing to buying); the reverse
    pattern — ending lower than they began — is the
    novelty-decay signature that a single retention curve can't
    distinguish from uniform churn. Levels with no movers print
    NULL z (no evidence either way) rather than 0; zero-filled
    level spine so all three rows always appear, both engines."""
    cnt, r, c = _fl_cell(_first_last_outcomes(sf_dir))
    rha = textstats.round_half_away
    rows = []
    for i in range(3):
        dg = cnt.get((i, i), 0)
        mov = r[i] + c[i] - 2 * dg
        if mov > 0:
            z = float(c[i] - r[i]) / np.sqrt(float(mov))
            zz = float(rha(z, 6))
            pp = float(rha(2.0 * _as_upper_q(abs(z)), 6))
        else:
            zz = pp = np.nan
        rows.append((i, r[i], c[i], c[i] - r[i], zz, pp))
    return pd.DataFrame(rows, columns=[
        "outcome", "n_first", "n_last", "net", "shift_z",
        "p_two_sided"]).astype({
            "outcome": np.int64, "n_first": np.int64,
            "n_last": np.int64, "net": np.int64})


# ---------------------------------------------------------------------------
# Online drift detection on daily volume: Page–Hinkley + the EWMA
# control chart
# ---------------------------------------------------------------------------

@register("page_hinkley_daily", sql=f"""
WITH {_DAILY_SQL},
rv AS (SELECT t, y,
              AVG(CAST(y AS DOUBLE)) OVER (ORDER BY t) AS ra
       FROM x),
mm AS (SELECT t, SUM(y - ra) OVER (ORDER BY t) AS m FROM rv),
ph AS (SELECT t, m,
              m - LEAST(MIN(m) OVER (ORDER BY t), 0) AS up,
              GREATEST(MAX(m) OVER (ORDER BY t), 0) - m AS dn
       FROM mm),
up AS (SELECT up, t FROM ph
       ORDER BY ROUND(up, 9) DESC, t LIMIT 1),
dn AS (SELECT dn, t FROM ph
       ORDER BY ROUND(dn, 9) DESC, t LIMIT 1),
sd AS (SELECT SQRT((CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)
                    - CAST(SUM(y) AS DOUBLE) * SUM(y) / MAX(n))
                   / (MAX(n) - 1)) AS s,
              CAST(MAX(n) AS BIGINT) AS n
       FROM x)
SELECT sd.n AS n_days,
       ROUND((SELECT up FROM up), 6) AS ph_up_max,
       (SELECT CAST(t AS BIGINT) FROM up) AS ph_up_day,
       ROUND((SELECT dn FROM dn), 6) AS ph_down_max,
       (SELECT CAST(t AS BIGINT) FROM dn) AS ph_down_day,
       CAST(CASE WHEN (SELECT up FROM up) / sd.s > 3.0
                   OR (SELECT dn FROM dn) / sd.s > 3.0
                 THEN 1 ELSE 0 END AS BIGINT) AS drift_detected
FROM sd""")
def page_hinkley_daily(sf_dir: str) -> pd.DataFrame:
    """Page–Hinkley drift detector on daily volume — the ONLINE
    member of the changepoint family: CUSUM/Pettitt/optimal-2cp
    (present) are offline, centering every deviation on the
    FULL-sample mean, i.e. on information a monitor watching the
    stream would not have had; PH accumulates deviations from the
    RUNNING mean (mₜ = Σ(xₛ − x̄ₛ), x̄ₛ the mean of the first s
    days), so ph_up = mₜ − min(m, 0) is exactly the alarm value a
    deployed detector would have shown on day t. Comparing
    ph_up_day with the offline CUSUM peak day measures DETECTION
    LATENCY — how many days after the break an online monitor
    could first have known — which is the operational number a
    postmortem's 'when was this knowable' question needs. δ = 0
    (pure drift, no tolerance band), alarm normalized by the
    sample sd with the standard 3σ bar; running min clamped to
    include the m₀ = 0 start; 9dp-earliest argmax both engines."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    ra = np.cumsum(y) / np.arange(1, n + 1)
    m = np.cumsum(y - ra)
    up = m - np.minimum(np.minimum.accumulate(m), 0.0)
    dn = np.maximum(np.maximum.accumulate(m), 0.0) - m
    s = np.sqrt((float((y * y).sum())
                 - float(y.sum()) * y.sum() / n) / (n - 1))
    rha = textstats.round_half_away
    ku = np.lexsort((np.arange(n),
                     -np.asarray(rha(up, 9), np.float64)))[0]
    kd = np.lexsort((np.arange(n),
                     -np.asarray(rha(dn, 9), np.float64)))[0]
    det = 1 if (up[ku] / s > 3.0 or dn[kd] / s > 3.0) else 0
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "ph_up_max": [float(rha(up[ku], 6))],
        "ph_up_day": np.array([ku + 1], np.int64),
        "ph_down_max": [float(rha(dn[kd], 6))],
        "ph_down_day": np.array([kd + 1], np.int64),
        "drift_detected": np.array([det], np.int64)})


@register("ewma_chart_daily", sql=f"""
WITH {_DAILY_SQL},
mo AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
              CAST(SUM(y) AS DOUBLE) / MAX(n) AS mu,
              SQRT((CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)
                    - CAST(SUM(y) AS DOUBLE) * SUM(y) / MAX(n))
                   / (MAX(n) - 1)) AS s
       FROM x),
w AS (SELECT t, SUM(y * POW(1.25, t)) OVER (ORDER BY t) AS cw
      FROM x),
z AS (SELECT w.t,
             0.2 * POW(0.8, w.t) * w.cw + POW(0.8, w.t) * mo.mu
                 AS z,
             mo.mu + 3.0 * mo.s
                 * SQRT(0.2 / 1.8 * (1.0 - POW(0.64, w.t)))
                 AS ucl,
             mo.mu - 3.0 * mo.s
                 * SQRT(0.2 / 1.8 * (1.0 - POW(0.64, w.t)))
                 AS lcl,
             mo.mu AS mu, mo.s AS s
      FROM w CROSS JOIN mo)
SELECT (SELECT n FROM mo) AS n_days,
       (SELECT CAST(MIN(t) AS BIGINT) FROM z WHERE z > ucl)
           AS first_up_signal,
       (SELECT CAST(MIN(t) AS BIGINT) FROM z WHERE z < lcl)
           AS first_down_signal,
       ROUND((SELECT MAX(ABS(z - mu) / (ucl - mu)) FROM z), 6)
           AS max_limit_ratio,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM z
                              WHERE z > ucl OR z < lcl)
                 THEN 0 ELSE 1 END AS BIGINT) AS in_control""")
def ewma_chart_daily(sf_dir: str) -> pd.DataFrame:
    """EWMA control chart (λ = 0.2, L = 3) on daily volume — the
    chart between the registry's two others: the p-chart reacts
    to single-day SPIKES but a string of half-σ days never trips
    a Shewhart limit, and CUSUM-style statistics have no natural
    per-day control band; the EWMA zₜ = λxₜ + (1−λ)zₜ₋₁ carries
    geometric memory, so small sustained drifts accumulate into
    a limit crossing within a few days while one outlier decays
    by 0.8 per day. The limits use the EXACT time-varying
    variance λ/(2−λ)(1−(1−λ)^{2t}) — the early-t tightening that
    fixed-limit EWMA charts get wrong precisely where a fresh
    chart is most likely to be read. Recursion closed to
    zₜ = 0.2·0.8ᵗ·Σxₛ1.25ˢ + 0.8ᵗμ so both engines share one
    windowed expression ((1.25)³⁰ ≈ 800: no overflow at calendar
    length); z₀ anchored at the sample mean as the in-control
    target, first crossing day per side, NULL when never."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    mu = float(y.sum()) / n
    s = np.sqrt((float((y * y).sum())
                 - float(y.sum()) * y.sum() / n) / (n - 1))
    cw = np.cumsum(y * np.power(1.25, t))
    z = 0.2 * np.power(0.8, t) * cw + np.power(0.8, t) * mu
    hw = 3.0 * s * np.sqrt(0.2 / 1.8
                           * (1.0 - np.power(0.64, t)))
    upd = np.where(z > mu + hw)[0]
    dnd = np.where(z < mu - hw)[0]
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "first_up_signal": pd.array(
            [int(upd[0]) + 1 if len(upd) else None],
            dtype="Int64"),
        "first_down_signal": pd.array(
            [int(dnd[0]) + 1 if len(dnd) else None],
            dtype="Int64"),
        "max_limit_ratio": [float(rha(
            float(np.max(np.abs(z - mu) / hw)), 6))],
        "in_control": np.array(
            [0 if len(upd) or len(dnd) else 1], np.int64)})


# ---------------------------------------------------------------------------
# The distance zoo on one pair: weekend vs weekday type mix under
# TV / Hellinger / Bhattacharyya / JSD + the per-type TV attribution
# ---------------------------------------------------------------------------

def _wkd_type_mix(sf_dir: str) -> pd.DataFrame:
    """(event_type, weekend count, weekday count) — the shared
    two-distribution input of the distance rows."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        wkd = np.isin((day + 4) % 7, (0, 6)).astype(np.int64)
        return pd.DataFrame({
            "ty": df["event_type"],
            "c1": wkd, "c2": 1 - wkd}) \
            .groupby("ty", as_index=False).sum()

    return reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["ty"], {"c1": ("c1", "sum"), "c2": ("c2", "sum")}) \
        .to_pandas().sort_values("ty", ignore_index=True)


_WKDMIX_SQL = """
mx AS (SELECT event_type AS ty,
              CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000 + 4)
                                 % 7 IN (0, 6)
                            THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000 + 4)
                                 % 7 IN (0, 6)
                            THEN 0 ELSE 1 END) AS BIGINT) AS c2
       FROM events GROUP BY 1),
pq AS (SELECT ty, c1, c2,
              CAST(c1 AS DOUBLE) / SUM(c1) OVER () AS p,
              CAST(c2 AS DOUBLE) / SUM(c2) OVER () AS q
       FROM mx)"""


@register("distribution_distance_panel_weekend", sql=f"""
WITH {_WKDMIX_SQL},
ag AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
              CAST(SUM(c2) AS BIGINT) AS n2,
              SUM(ABS(p - q)) / 2.0 AS tv,
              SUM(SQRT(p * q)) AS bc,
              SUM(CASE WHEN p > 0 THEN p * LN(2.0 * p / (p + q))
                       ELSE 0 END) / 2.0
              + SUM(CASE WHEN q > 0 THEN q * LN(2.0 * q / (p + q))
                         ELSE 0 END) / 2.0 AS jsd_nats
       FROM pq),
st AS (SELECT n1, n2, tv, bc, jsd_nats,
              SQRT(GREATEST(1.0 - bc, 0.0)) AS h
       FROM ag)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       ROUND(tv, 6) AS tv,
       ROUND(h, 6) AS hellinger,
       ROUND(bc, 6) AS bhattacharyya_coef,
       ROUND(jsd_nats / LN(2.0), 6) AS jsd_bits,
       CAST(CASE WHEN h * h <= tv + 1e-12
                  AND tv <= h * SQRT(2.0) + 1e-12
                 THEN 1 ELSE 0 END AS BIGINT) AS chain_holds
FROM st""")
def distribution_distance_panel_weekend(sf_dir: str) \
        -> pd.DataFrame:
    """The distance zoo priced on ONE pair of distributions — the
    weekend vs weekday event-type mix under total variation,
    Hellinger, the Bhattacharyya coefficient, and JSD in bits —
    because 'how different are the mixes' has no unitless answer
    until a metric is named, and the choice changes the number by
    design: TV is the operational bound (no classifier, alert, or
    A/B split can be distinguished more often than TV), Hellinger
    squares small differences so it forgives many tiny shifts TV
    adds up, BC is the overlap a Bayes-error bound reads, JSD the
    bits a log-loss model gains from knowing the day class. The
    chain_holds column verifies H² ≤ TV ≤ √2·H LIVE on the data —
    the inequality every 'metrics roughly agree' intuition rests
    on, printed rather than assumed, and the position of TV
    within its [H², √2H] bracket says whether the divergence is
    few-large-gaps (near the top) or many-small-gaps (near the
    bottom). One (type, day-class) count table; zero-count types
    contribute 0·ln terms by the pinned limit convention."""
    m = _wkd_type_mix(sf_dir)
    n1 = int(m["c1"].sum())
    n2 = int(m["c2"].sum())
    p = m["c1"].to_numpy(np.float64) / n1
    q = m["c2"].to_numpy(np.float64) / n2
    tv = float(np.abs(p - q).sum()) / 2.0
    bc = float(np.sqrt(p * q).sum())
    h = np.sqrt(max(1.0 - bc, 0.0))
    mm = (p + q)
    # 0·ln(0) limit convention: evaluate the log only on positive
    # entries so zero-count types don't emit divide/invalid warnings
    # (ADVICE r2)
    jsd = 0.0
    for a in (p, q):
        pos = a > 0
        jsd += float((a[pos] * np.log(2.0 * a[pos] / mm[pos])).sum()) / 2.0
    rha = textstats.round_half_away
    chain = 1 if (h * h <= tv + 1e-12
                  and tv <= h * np.sqrt(2.0) + 1e-12) else 0
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n2], np.int64),
        "tv": [float(rha(tv, 6))],
        "hellinger": [float(rha(h, 6))],
        "bhattacharyya_coef": [float(rha(bc, 6))],
        "jsd_bits": [float(rha(jsd / np.log(2.0), 6))],
        "chain_holds": np.array([chain], np.int64)})


@register("distance_attribution_weekend_types", sql=f"""
WITH {_WKDMIX_SQL},
tv AS (SELECT SUM(ABS(p - q)) / 2.0 AS tv FROM pq)
SELECT ty AS event_type,
       ROUND(p, 6) AS p_weekend,
       ROUND(q, 6) AS p_weekday,
       ROUND(ABS(p - q) / 2.0, 6) AS tv_contribution,
       ROUND(ABS(p - q) / 2.0 / (SELECT tv FROM tv), 6)
           AS share_of_tv
FROM pq ORDER BY ROUND(ABS(p - q), 9) DESC, ty""")
def distance_attribution_weekend_types(sf_dir: str) \
        -> pd.DataFrame:
    """The per-type decomposition the panel's scalars hide: TV is
    a SUM of per-category gaps |pᵢ−qᵢ|/2, so unlike Hellinger or
    JSD it attributes exactly — each row's tv_contribution adds
    to the panel's tv, and share_of_tv names which event types
    CARRY the weekend effect. The top row is the actionable
    output (if 'purchase' carries 60% of the divergence, the
    weekend is a conversion phenomenon and staffing/caching
    decisions keyed to raw traffic miss it; if 'error' leads,
    weekends have an operational signature, not a behavioral
    one). Both shares printed so the sign is readable — a type
    can carry TV by being over-represented on EITHER side.
    9dp-gap then type ordering pinned; same shared mix table."""
    m = _wkd_type_mix(sf_dir)
    n1 = int(m["c1"].sum())
    n2 = int(m["c2"].sum())
    p = m["c1"].to_numpy(np.float64) / n1
    q = m["c2"].to_numpy(np.float64) / n2
    tv = float(np.abs(p - q).sum()) / 2.0
    rha = textstats.round_half_away
    df = pd.DataFrame({
        "event_type": m["ty"],
        "p_weekend": [float(rha(v, 6)) for v in p],
        "p_weekday": [float(rha(v, 6)) for v in q],
        "tv_contribution": [float(rha(abs(a - b) / 2.0, 6))
                            for a, b in zip(p, q)],
        "share_of_tv": [float(rha(abs(a - b) / 2.0 / tv, 6))
                        for a, b in zip(p, q)],
        "k9": [float(rha(abs(a - b), 9)) for a, b in zip(p, q)]})
    df = df.sort_values(["k9", "event_type"],
                        ascending=[False, True],
                        ignore_index=True)
    return df.drop(columns=["k9"])


# ---------------------------------------------------------------------------
# Error bars for reported points: Cameron–Trivedi overdispersion on
# the hourly purchase grid + Brookmeyer–Crowley median survival CI
# ---------------------------------------------------------------------------

@register("cameron_trivedi_hourly_purchases", sql="""
WITH b AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(hour(ts) AS BIGINT) AS h
           FROM events WHERE event_type = 'purchase'),
sp AS (SELECT MIN(epoch_us(ts) // 86400000000) AS d0,
              MAX(epoch_us(ts) // 86400000000) AS d1
       FROM events),
gr AS (SELECT (SELECT d0 FROM sp) + dd.range AS d,
              CAST(hh.range AS BIGINT) AS h
       FROM range(0, 20000) dd, range(0, 24) hh
       WHERE dd.range <= (SELECT d1 - d0 FROM sp)),
y AS (SELECT gr.d, gr.h,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS y
      FROM gr LEFT JOIN (SELECT d, h, COUNT(*) AS n
                         FROM b GROUP BY 1, 2) c
      ON c.d = gr.d AND c.h = gr.h),
mu AS (SELECT h, AVG(CAST(y AS DOUBLE)) AS m FROM y GROUP BY h),
w AS (SELECT y.y, mu.m,
             POW(y.y - mu.m, 2) - y.y AS w
      FROM y JOIN mu USING (h)),
a1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
              SUM(w * m) / SUM(m * m) AS al1,
              SUM(w * m * m) / SUM(m * m * m * m) AS al2
       FROM w),
se AS (SELECT nc, al1, al2,
              SQRT((SELECT SUM(POW(w.w - a1.al1 * w.m, 2))
                    FROM w) / (nc - 1)
                   / (SELECT SUM(m * m) FROM w)) AS se1,
              SQRT((SELECT SUM(POW(w.w - a1.al2 * w.m * w.m, 2))
                    FROM w) / (nc - 1)
                   / (SELECT SUM(m * m * m * m) FROM w)) AS se2
       FROM a1)
SELECT nc AS n_cells,
       ROUND(al1, 6) AS alpha_nb1,
       ROUND(al1 / se1, 6) AS t_nb1,
       ROUND(al2, 6) AS alpha_nb2,
       ROUND(al2 / se2, 6) AS t_nb2,
       CAST(CASE WHEN al2 / se2 > 1.644854
                 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
FROM se""")
def cameron_trivedi_hourly_purchases(sf_dir: str) -> pd.DataFrame:
    """Cameron–Trivedi regression-based overdispersion test on the
    zero-filled (day, hour) purchase grid with the hour-of-day
    Poisson fit μ̂ₕ: the auxiliary no-intercept OLS of
    w = (y−μ̂)² − y on g(μ̂), in BOTH variance laws — g = μ (NB1:
    Var = μ(1+α), overdispersion as a constant factor) and g = μ²
    (NB2: Var = μ + αμ², overdispersion growing with volume).
    The dispersion-index rows (present) say THAT variance exceeds
    the mean; this pair says WHICH LAW it follows, and the choice
    is operational: under NB1 every Poisson-based alert band is
    uniformly √(1+α) too tight, under NB2 the busy hours are
    disproportionately under-banded and peak-hour alerts fire
    spuriously while quiet-hour ones sleep. α > 0 with t > 1.645
    (one-sided — overdispersion is the directional hypothesis)
    is the licensed verdict; comparing t₁ vs t₂ picks the better
    variance model the same way the Vuong row picks between tail
    laws. Zero days are real zeros (full min–max day spine ×
    24 h); exact counts, one small grid on the driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        isp = (df["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "d": day, "h": df["ts"].dt.hour.to_numpy(np.int64),
            "y": isp.astype(np.int64),
            "dmin": day, "dmax": day})

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "h"], {"y": ("y", "sum")}).to_pandas()
    d0, d1 = int(g["d"].min()), int(g["d"].max())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    full = pd.MultiIndex.from_product(
        [days, np.arange(24, dtype=np.int64)], names=["d", "h"])
    y = g.set_index(["d", "h"])["y"].reindex(full, fill_value=0) \
        .astype(np.float64)
    yv = y.to_numpy()
    hv = full.get_level_values("h").to_numpy()
    mu_h = pd.Series(yv).groupby(hv).mean()
    m = mu_h.reindex(hv).to_numpy()
    w = (yv - m) ** 2 - yv
    nc = len(yv)
    al1 = float((w * m).sum() / (m * m).sum())
    al2 = float((w * m * m).sum() / (m ** 4).sum())
    se1 = np.sqrt(float(((w - al1 * m) ** 2).sum()) / (nc - 1)
                  / float((m * m).sum()))
    se2 = np.sqrt(float(((w - al2 * m * m) ** 2).sum()) / (nc - 1)
                  / float((m ** 4).sum()))
    rha = textstats.round_half_away
    t2 = al2 / se2
    return pd.DataFrame({
        "n_cells": np.array([nc], np.int64),
        "alpha_nb1": [float(rha(al1, 6))],
        "t_nb1": [float(rha(al1 / se1, 6))],
        "alpha_nb2": [float(rha(al2, 6))],
        "t_nb2": [float(rha(t2, 6))],
        "overdispersed": np.array([1 if t2 > 1.644854 else 0],
                                  np.int64)})


@register("km_median_ci_first_purchase", sql="""
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
e AS (SELECT t, SUM(ev) AS d, COUNT(*) AS ending
      FROM obs GROUP BY t),
r AS (SELECT t, d,
             (SELECT COUNT(*) FROM obs)
             - COALESCE(SUM(ending) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
      FROM e),
km AS (SELECT t, d, n_risk,
              PRODUCT(1.0 - d / CAST(n_risk AS DOUBLE))
                  OVER (ORDER BY t) AS s,
              SUM(CASE WHEN n_risk > d THEN
                      CAST(d AS DOUBLE)
                      / (n_risk * CAST(n_risk - d AS DOUBLE))
                  ELSE 0 END) OVER (ORDER BY t) AS gw
       FROM r WHERE d > 0),
band AS (SELECT t, s,
                POW(s - 0.5, 2) <= 3.841459 * s * s * gw AS inb
         FROM km)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM obs) AS n_users,
       (SELECT CAST(MIN(t) AS BIGINT) FROM band
        WHERE s <= 0.5) AS median_day,
       (SELECT CAST(MIN(t) AS BIGINT) FROM band
        WHERE inb) AS ci_lo_day,
       (SELECT CAST(MAX(t) AS BIGINT) FROM band
        WHERE inb) AS ci_hi_day,
       CAST(CASE WHEN (SELECT MAX(t) FROM band WHERE inb)
                      = (SELECT MAX(t) FROM band)
                 THEN 1 ELSE 0 END AS BIGINT) AS ci_open_ended""")
def km_median_ci_first_purchase(sf_dir: str) -> pd.DataFrame:
    """Brookmeyer–Crowley confidence interval for the KM median
    time-to-first-purchase — the error bar the survival family's
    point medians have been printing without. The construction
    INVERTS the test of S(t) = ½: every event time where
    (S(t)−½)² ≤ z²·V̂(S(t)) (Greenwood variance) is a day the
    data cannot distinguish from the median, and the CI is that
    set's span — which is why median CIs from survival data are
    characteristically ASYMMETRIC and can be open-ended on the
    right (flagged, not fudged: censoring means the data may
    never rule out 'the median is beyond follow-up', the honest
    answer a ±1.96·SE band around the point would hide). The
    Greenwood sum skips saturated terms (n = d) where S hits 0
    with zero product-variance, the same limit convention both
    engines pin. One life table, O(days), reusing the KM row's
    exact reduce."""
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
            .agg(d=("ev", "sum"),
                 ending=("ev", "size")).reset_index()
        return g.astype({"d": np.int64, "ending": np.int64})

    e = reduce_sink(u.map_batches(obs_partial,
                                  batch_format="pandas"),
                    ["t"], {"d": ("d", "sum"),
                            "ending": ("ending", "sum")}) \
        .to_pandas().sort_values("t", ignore_index=True)
    n_users = int(e["ending"].sum())
    n_risk = n_users - np.concatenate(
        ([0], np.cumsum(e["ending"].to_numpy(np.int64))[:-1]))
    d = e["d"].to_numpy(np.int64)
    keep = d > 0
    t = e["t"].to_numpy(np.int64)[keep]
    dk = d[keep]
    nk = n_risk[keep]
    s = np.cumprod(1.0 - dk / nk.astype(np.float64))
    den = nk * np.maximum(nk - dk, 1).astype(np.float64)
    gw = np.cumsum(np.where(nk > dk, dk / den, 0.0))
    inb = (s - 0.5) ** 2 <= 3.841459 * s * s * gw
    med = t[s <= 0.5]
    lo = t[inb]
    out = {
        "n_users": np.array([n_users], np.int64),
        "median_day": pd.array(
            [int(med[0]) if len(med) else None], dtype="Int64"),
        "ci_lo_day": pd.array(
            [int(lo[0]) if len(lo) else None], dtype="Int64"),
        "ci_hi_day": pd.array(
            [int(lo[-1]) if len(lo) else None], dtype="Int64"),
        "ci_open_ended": np.array(
            [1 if len(lo) and lo[-1] == t[-1] else 0], np.int64)}
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# The M-competition champions, backtested: theta method + damped-
# trend Holt on a 7-day holdout
# ---------------------------------------------------------------------------

@register("theta_forecast_daily", sql=f"""
WITH RECURSIVE {_DAILY_SQL},
tr AS (SELECT t, CAST(y AS DOUBLE) AS y FROM x
       WHERE t <= (SELECT MAX(n) FROM x) - 7),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              SUM(t) AS sx, SUM(y) AS sy,
              SUM(t * t) AS sxx, SUM(t * y) AS sxy
       FROM tr),
ab AS (SELECT m,
              (m * sxy - sx * sy) / (m * sxx - sx * sx) AS b
       FROM nn),
ai AS (SELECT m, b,
              ((SELECT sy FROM nn) - b * (SELECT sx FROM nn)) / m
                  AS a
       FROM ab),
th AS (SELECT tr.t, 2.0 * tr.y - (ai.a + ai.b * tr.t) AS z
       FROM tr CROSS JOIN ai),
w(i, l) AS (
  SELECT 1, z FROM th WHERE t = 1
  UNION ALL
  SELECT th.t, 0.2 * th.z + 0.8 * w.l
  FROM th JOIN w ON th.t = w.i + 1),
fin AS (SELECT l FROM w ORDER BY i DESC LIMIT 1),
nv AS (SELECT y FROM tr ORDER BY t DESC LIMIT 1),
te AS (SELECT t, CAST(y AS DOUBLE) AS y FROM x
       WHERE t > (SELECT MAX(n) FROM x) - 7),
fc AS (SELECT te.t, te.y,
              0.5 * (ai.a + ai.b * te.t)
              + 0.5 * (SELECT l FROM fin) AS f,
              (SELECT y FROM nv) AS fn
       FROM te CROSS JOIN ai),
mae AS (SELECT AVG(ABS(y - f)) AS mt, AVG(ABS(y - fn)) AS mn
        FROM fc),
ins AS (SELECT AVG(ABS(c.y - p.y)) AS mi
        FROM tr c JOIN tr p ON p.t = c.t - 1)
SELECT (SELECT m FROM ai) AS n_train,
       ROUND((SELECT mt FROM mae), 6) AS mae_theta,
       ROUND((SELECT mn FROM mae), 6) AS mae_naive,
       ROUND((SELECT mt FROM mae) / (SELECT mi FROM ins), 6)
           AS mase_theta,
       CAST(CASE WHEN (SELECT mt FROM mae) < (SELECT mn FROM mae)
                 THEN 1 ELSE 0 END AS BIGINT) AS beats_naive""")
def theta_forecast_daily(sf_dir: str) -> pd.DataFrame:
    """The theta method (Assimakopoulos–Nikolopoulos), backtested
    on a 7-day holdout of daily volume — the method that WON the
    M3 competition outright and remains the one-line benchmark
    every fancier forecaster must beat. Pinned as the original
    construction, not the SES-with-drift equivalence: the θ = 0
    line (pure OLS trend, all curvature removed) and the θ = 2
    line (curvatures doubled, smoothed by SES at α = 0.2, flat
    extrapolation) are averaged, so the forecast is half
    long-run trend, half short-run level — which is exactly WHY
    it wins on noisy business series: it commits fully to
    neither. MASE denominator is the in-sample naive MAE (the
    registry's mase panel convention), mae_naive the last-value
    holdout baseline, and beats_naive the honest one-bit verdict
    — the M3 finding was that on monthly/daily business data
    this row usually reads 1 while rich models often read 0.
    Train = all but the final week; SES recursion driver-side in
    the oracle CTE's exact float order."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    m = n - 7
    tr = y[:m]
    t = np.arange(1, m + 1, dtype=np.float64)
    b = (m * (t * tr).sum() - t.sum() * tr.sum()) \
        / (m * (t * t).sum() - t.sum() ** 2)
    a = (tr.sum() - b * t.sum()) / m
    z = 2.0 * tr - (a + b * t)
    l = z[0]
    for i in range(1, m):
        l = 0.2 * z[i] + 0.8 * l
    tt = np.arange(m + 1, n + 1, dtype=np.float64)
    f = 0.5 * (a + b * tt) + 0.5 * l
    te = y[m:]
    mt = float(np.abs(te - f).mean())
    mn = float(np.abs(te - tr[-1]).mean())
    mi = float(np.abs(np.diff(tr)).mean())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_train": np.array([m], np.int64),
        "mae_theta": [float(rha(mt, 6))],
        "mae_naive": [float(rha(mn, 6))],
        "mase_theta": [float(rha(mt / mi, 6))],
        "beats_naive": np.array([1 if mt < mn else 0], np.int64)})


@register("damped_holt_daily", sql=f"""
WITH RECURSIVE {_DAILY_SQL},
tr AS (SELECT t, CAST(y AS DOUBLE) AS y FROM x
       WHERE t <= (SELECT MAX(n) FROM x) - 7),
w(i, l, b, lu, bu) AS (
  SELECT a.t, a.y, b2.y - a.y, a.y, b2.y - a.y
  FROM tr a JOIN tr b2 ON b2.t = 2 WHERE a.t = 1
  UNION ALL
  SELECT o.t,
         0.5 * o.y + 0.5 * (w.l + 0.9 * w.b),
         0.3 * ((0.5 * o.y + 0.5 * (w.l + 0.9 * w.b)) - w.l)
             + 0.7 * 0.9 * w.b,
         0.5 * o.y + 0.5 * (w.lu + w.bu),
         0.3 * ((0.5 * o.y + 0.5 * (w.lu + w.bu)) - w.lu)
             + 0.7 * w.bu
  FROM tr o JOIN w ON o.t = w.i + 1),
fin AS (SELECT l, b, lu, bu FROM w ORDER BY i DESC LIMIT 1),
te AS (SELECT t, CAST(y AS DOUBLE) AS y,
              t - ((SELECT MAX(n) FROM x) - 7) AS h
       FROM x WHERE t > (SELECT MAX(n) FROM x) - 7),
fc AS (SELECT te.h, te.y,
              fin.l + fin.b * 0.9 * (1.0 - POW(0.9, te.h)) / 0.1
                  AS fd,
              fin.lu + fin.bu * te.h AS fh
       FROM te CROSS JOIN fin),
mae AS (SELECT AVG(ABS(y - fd)) AS md, AVG(ABS(y - fh)) AS mh
        FROM fc)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train,
       ROUND((SELECT md FROM mae), 6) AS mae_damped,
       ROUND((SELECT mh FROM mae), 6) AS mae_holt,
       ROUND((SELECT md FROM mae) / (SELECT mh FROM mae), 6)
           AS mae_ratio,
       CAST(CASE WHEN (SELECT md FROM mae) < (SELECT mh FROM mae)
                 THEN 1 ELSE 0 END AS BIGINT) AS damping_wins""")
def damped_holt_daily(sf_dir: str) -> pd.DataFrame:
    """Damped-trend Holt (φ = 0.9) against plain Holt on the same
    7-day holdout — the OTHER M-competition lesson: an estimated
    linear trend extrapolated straight is the single most
    reliable way to blow up a multi-step forecast, because the
    trend is fit to history but applied to the future at full
    strength forever; damping decays its contribution
    geometrically (h-step drift b·φ(1−φʰ)/(1−φ) instead of b·h),
    conceding a little on genuinely trending series to avoid
    catastrophic over-shoot on the rest — which is why damped
    exponential smoothing is the default auto-forecast in
    practice. Both recursions share one pass (α = 0.5, β = 0.3,
    the registry's Holt constants; φ multiplies the carried trend
    in level, update, and forecast), so the printed mae_ratio
    isolates the effect of φ alone. damping_wins is the live
    verdict on whether this series' week-ahead trend was signal
    or rope to hang by."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    m = n - 7
    tr = y[:m]
    l, b = tr[0], tr[1] - tr[0]
    lu, bu = tr[0], tr[1] - tr[0]
    for i in range(1, m):
        ln = 0.5 * tr[i] + 0.5 * (l + 0.9 * b)
        b = 0.3 * ((0.5 * tr[i] + 0.5 * (l + 0.9 * b)) - l) \
            + 0.7 * 0.9 * b
        l = ln
        lun = 0.5 * tr[i] + 0.5 * (lu + bu)
        bu = 0.3 * ((0.5 * tr[i] + 0.5 * (lu + bu)) - lu) \
            + 0.7 * bu
        lu = lun
    h = np.arange(1, 8, dtype=np.float64)
    fd = l + b * 0.9 * (1.0 - np.power(0.9, h)) / 0.1
    fh = lu + bu * h
    te = y[m:]
    md = float(np.abs(te - fd).mean())
    mh = float(np.abs(te - fh).mean())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_train": np.array([m], np.int64),
        "mae_damped": [float(rha(md, 6))],
        "mae_holt": [float(rha(mh, 6))],
        "mae_ratio": [float(rha(md / mh, 6))],
        "damping_wins": np.array([1 if md < mh else 0],
                                 np.int64)})


# ---------------------------------------------------------------------------
# Covariance-structure equality: Box's M on weekend vs weekday day
# vectors + the generalized-variance decomposition
# ---------------------------------------------------------------------------

#: per-(weekend flag) SSCP moments of the zero-filled daily
#: (views, clicks, purchases) vectors.
_BOXM_SQL = """
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
g AS (SELECT CASE WHEN (cal.d + 4) % 7 IN (0, 6)
                  THEN 1 ELSE 0 END AS wkd,
             CAST(COALESCE(e.x1, 0) AS DOUBLE) AS x1,
             CAST(COALESCE(e.x2, 0) AS DOUBLE) AS x2,
             CAST(COALESCE(e.x3, 0) AS DOUBLE) AS x3
      FROM cal LEFT JOIN e ON e.d = cal.d),
gs AS (SELECT wkd, CAST(COUNT(*) AS DOUBLE) AS ng,
              SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3,
              SUM(x1 * x1) AS t11, SUM(x1 * x2) AS t12,
              SUM(x1 * x3) AS t13, SUM(x2 * x2) AS t22,
              SUM(x2 * x3) AS t23, SUM(x3 * x3) AS t33
       FROM g GROUP BY 1),
cv AS (SELECT wkd, ng,
              (t11 - s1 * s1 / ng) / (ng - 1) AS c11,
              (t12 - s1 * s2 / ng) / (ng - 1) AS c12,
              (t13 - s1 * s3 / ng) / (ng - 1) AS c13,
              (t22 - s2 * s2 / ng) / (ng - 1) AS c22,
              (t23 - s2 * s3 / ng) / (ng - 1) AS c23,
              (t33 - s3 * s3 / ng) / (ng - 1) AS c33
       FROM gs),
dt AS (SELECT wkd, ng,
              c11 * (c22 * c33 - c23 * c23)
              - c12 * (c12 * c33 - c23 * c13)
              + c13 * (c12 * c23 - c22 * c13) AS det,
              c11, c22, c33
       FROM cv),
pl AS (SELECT SUM(ng) AS n,
              (SUM((ng - 1) * c11)) / (SUM(ng) - 2) AS p11,
              (SUM((ng - 1) * c12)) / (SUM(ng) - 2) AS p12,
              (SUM((ng - 1) * c13)) / (SUM(ng) - 2) AS p13,
              (SUM((ng - 1) * c22)) / (SUM(ng) - 2) AS p22,
              (SUM((ng - 1) * c23)) / (SUM(ng) - 2) AS p23,
              (SUM((ng - 1) * c33)) / (SUM(ng) - 2) AS p33
       FROM cv)"""


@register("box_m_weekend_dayvec", sql=f"""
WITH {_BOXM_SQL},
pd AS (SELECT n,
              p11 * (p22 * p33 - p23 * p23)
              - p12 * (p12 * p33 - p23 * p13)
              + p13 * (p12 * p23 - p22 * p13) AS detp
       FROM pl),
m AS (SELECT pd.n, pd.detp,
             (pd.n - 2) * LN(pd.detp)
             - (SELECT SUM((ng - 1) * LN(det)) FROM dt) AS bm,
             (SELECT SUM(1.0 / (ng - 1)) FROM dt) AS sinv,
             (SELECT MAX(CASE WHEN wkd = 1 THEN ng END)
              FROM dt) AS n1,
             (SELECT MAX(CASE WHEN wkd = 0 THEN ng END)
              FROM dt) AS n0
      FROM pd),
st AS (SELECT n, n1, n0, bm,
              (1.0 - (sinv - 1.0 / (n - 2)) * 26.0 / 24.0) * bm
                  AS x2
       FROM m),
wh AS (SELECT n, n1, n0, bm, x2,
              (POW(x2 / 6.0, 1.0 / 3.0)
               - (1.0 - 2.0 / 54.0)) / SQRT(2.0 / 54.0) AS z
       FROM st)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n0 AS BIGINT) AS n_weekday,
       ROUND(bm, 6) AS box_m,
       ROUND(x2, 6) AS chi2,
       ROUND({_QGEN.format(x="z")}, 6) AS p_wh,
       CAST(CASE WHEN {_QGEN.format(x="z")} < 0.05
                 THEN 1 ELSE 0 END AS BIGINT)
           AS cov_equal_rejected
FROM wh""")
def box_m_weekend_dayvec(sf_dir: str) -> pd.DataFrame:
    """Box's M test of covariance-matrix equality between weekend
    and weekday daily (views, clicks, purchases) vectors — the
    assumption check under the registry's Hotelling T² and
    MANOVA rows, which pool a single within-group covariance:
    if weekend days don't just shift the centroid but RESHAPE
    the cloud (tighter view–purchase coupling, fatter click
    variance), the pooled-covariance machinery mis-weights
    exactly the comparisons it was built for — the multivariate
    version of checking equal variances before a t-test, with
    the same asymmetry (it matters most when group sizes
    differ, 2:5 here by construction). M = (N−k)ln|Sp| −
    Σ(n_g−1)ln|S_g| with Box's χ² scaling constant
    (2p²+3p−1)/(6(p+1)(k−1)) = 26/24 at p = 3, k = 2, df = 6;
    Wilson–Hilferty p through the pinned A&S tail (Box's test is
    famously also a normality detector — read with the
    Shapiro–Francia rows). Closed-form 3×3 determinants, exact-
    moment SSCPs, zero-filled calendar, one reduce."""
    g = _dayvec(sf_dir)
    d = g["d"].to_numpy(np.int64)
    X = np.stack([g["x"].to_numpy(np.int64),
                  g["y"].to_numpy(np.int64),
                  g["z"].to_numpy(np.int64)], axis=1) \
        .astype(np.float64)
    wkd = np.isin((d + 4) % 7, (0, 6))
    n = len(d)
    rha = textstats.round_half_away
    dets, ngs, covs = {}, {}, {}
    for flag, m in (1, wkd), (0, ~wkd):
        ng = int(m.sum())
        Xg = X[m]
        Sg = Xg.sum(axis=0)
        A = Xg.T @ Xg - np.outer(Sg, Sg) / ng
        C = A / (ng - 1)
        dets[flag] = _det3(C)
        ngs[flag] = ng
        covs[flag] = C
    Sp = ((ngs[1] - 1) * covs[1] + (ngs[0] - 1) * covs[0]) \
        / (n - 2)
    bm = (n - 2) * np.log(_det3(Sp)) \
        - ((ngs[1] - 1) * np.log(dets[1])
           + (ngs[0] - 1) * np.log(dets[0]))
    sinv = 1.0 / (ngs[1] - 1) + 1.0 / (ngs[0] - 1)
    x2 = (1.0 - (sinv - 1.0 / (n - 2)) * 26.0 / 24.0) * bm
    z = ((x2 / 6.0) ** (1.0 / 3.0) - (1.0 - 2.0 / 54.0)) \
        / np.sqrt(2.0 / 54.0)
    p = _norm_q(z)
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_weekend": np.array([ngs[1]], np.int64),
        "n_weekday": np.array([ngs[0]], np.int64),
        "box_m": [float(rha(bm, 6))],
        "chi2": [float(rha(x2, 6))],
        "p_wh": [float(rha(p, 6))],
        "cov_equal_rejected": np.array(
            [1 if p < 0.05 else 0], np.int64)})


@register("generalized_variance_ratio_weekend", sql=f"""
WITH {_BOXM_SQL}
SELECT ROUND((SELECT det FROM dt WHERE wkd = 1)
             / (SELECT det FROM dt WHERE wkd = 0), 6)
           AS gen_var_ratio,
       ROUND((SELECT c11 FROM dt WHERE wkd = 1)
             / (SELECT c11 FROM dt WHERE wkd = 0), 6)
           AS view_var_ratio,
       ROUND((SELECT c22 FROM dt WHERE wkd = 1)
             / (SELECT c22 FROM dt WHERE wkd = 0), 6)
           AS click_var_ratio,
       ROUND((SELECT c33 FROM dt WHERE wkd = 1)
             / (SELECT c33 FROM dt WHERE wkd = 0), 6)
           AS purchase_var_ratio""")
def generalized_variance_ratio_weekend(sf_dir: str) \
        -> pd.DataFrame:
    """The localization Box's M can't give: the weekend/weekday
    GENERALIZED variance ratio det(S₁)/det(S₀) — the volume
    ratio of the two day-vector scatter ellipsoids, Wilks'
    'generalized variance' being the one scalar that captures
    joint spread including correlation structure — beside the
    three per-component variance ratios. Reading the four
    together separates the two ways covariances can differ: all
    three component ratios near 1 with gen_var_ratio far from 1
    means the VOLUMES match component-wise but the CORRELATION
    shape differs (weekend metrics co-move differently — e.g.
    purchases decouple from views), while one component ratio
    carrying the whole effect says a single metric's volatility
    (not the structure) drives Box's rejection and a univariate
    variance fix suffices. Same per-group covariance entries as
    the M row, ratios in the oracle's division order."""
    g = _dayvec(sf_dir)
    d = g["d"].to_numpy(np.int64)
    X = np.stack([g["x"].to_numpy(np.int64),
                  g["y"].to_numpy(np.int64),
                  g["z"].to_numpy(np.int64)], axis=1) \
        .astype(np.float64)
    wkd = np.isin((d + 4) % 7, (0, 6))
    covs = {}
    for flag, m in (1, wkd), (0, ~wkd):
        ng = int(m.sum())
        Xg = X[m]
        Sg = Xg.sum(axis=0)
        covs[flag] = (Xg.T @ Xg - np.outer(Sg, Sg) / ng) \
            / (ng - 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "gen_var_ratio": [float(rha(
            _det3(covs[1]) / _det3(covs[0]), 6))],
        "view_var_ratio": [float(rha(
            covs[1][0, 0] / covs[0][0, 0], 6))],
        "click_var_ratio": [float(rha(
            covs[1][1, 1] / covs[0][1, 1], 6))],
        "purchase_var_ratio": [float(rha(
            covs[1][2, 2] / covs[0][2, 2], 6))]})


# ---------------------------------------------------------------------------
# Multiple comparisons done right: Tukey HSD over dow pairs + the
# simultaneous-interval width panel
# ---------------------------------------------------------------------------

def _daily_counts_full(sf_dir: str) -> pd.DataFrame:
    """(epoch day, count) zero-filled over the min–max calendar —
    the spine the dow group tests need (quiet days are real
    zeros). Calendar-bounded driver table."""
    def prep(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = us // 86_400_000_000
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"d": u, "y": c.astype(np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["d"], {"y": ("y", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    days = np.arange(int(e["d"].min()), int(e["d"].max()) + 1,
                     dtype=np.int64)
    y = e.set_index("d")["y"].reindex(days, fill_value=0)
    return pd.DataFrame({"d": days,
                         "y": y.to_numpy(np.int64)})


#: zero-filled daily counts with dow groups + pooled MSE moments.
_DOWMSE_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST((cal.d + 4) % 7 AS BIGINT) AS dow,
             CAST(COALESCE(e.y, 0) AS DOUBLE) AS y
      FROM cal LEFT JOIN e ON e.d = cal.d),
gs AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS ng,
              SUM(y) AS s, SUM(y * y) AS ss
       FROM g GROUP BY 1),
ms AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
              SUM(ss - s * s / ng) / (SUM(ng) - 7) AS mse
       FROM gs)"""


@register("tukey_hsd_dow_pairs", sql=f"""
WITH {_DOWMSE_SQL},
pr AS (SELECT a.dow AS da, b.dow AS db,
              a.s / a.ng AS ma, b.s / b.ng AS mb,
              ABS(a.s / a.ng - b.s / b.ng)
                  / SQRT(ms.mse / 2.0 * (1.0 / a.ng + 1.0 / b.ng))
                  AS q
       FROM gs a JOIN gs b ON b.dow > a.dow CROSS JOIN ms)
SELECT da AS dow_a, db AS dow_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND(q, 6) AS q_stat,
       CAST(CASE WHEN q > 4.170 THEN 1 ELSE 0 END AS BIGINT)
           AS significant
FROM pr ORDER BY da, db""")
def tukey_hsd_dow_pairs(sf_dir: str) -> pd.DataFrame:
    """Tukey–Kramer HSD over all 21 weekday pairs of daily volume
    — the post-hoc step the registry's omnibus dow rows stop
    short of: ANOVA/Friedman/MANOVA (present) can only say 'the
    weekdays differ'; which PAIRS differ is the schedulable
    fact, and testing 21 pairs at per-pair α = .05 would
    expect one false 'Friday ≠ Tuesday' per report even under
    the null. The studentized-range calibration controls the
    familywise rate over exactly this pair set, which is why
    HSD — not 21 t-tests — is the standard follow-up.
    q = |ȳᵢ−ȳⱼ|/√(MSE/2·(1/nᵢ+1/nⱼ)) with the pooled MSE on
    N−7 df; the 4.170 bar is q₀.₀₅ for k = 7 at ν = ∞ (honest
    caveat: slightly anti-conservative at small ν, stated not
    hidden). Zero-filled calendar so quiet days count; exact
    group moments, one reduce, 21-row output."""
    yd = _daily_counts_full(sf_dir)
    d = yd["d"].to_numpy(np.int64)
    y = yd["y"].to_numpy(np.float64)
    dow = (d + 4) % 7
    ngs = {}
    means = {}
    sse = 0.0
    for k in range(7):
        m = dow == k
        ngs[k] = int(m.sum())
        means[k] = float(y[m].sum()) / ngs[k]
        sse += float((y[m] * y[m]).sum()) \
            - float(y[m].sum()) ** 2 / ngs[k]
    mse = sse / (len(d) - 7)
    rha = textstats.round_half_away
    rows = []
    for a in range(7):
        for b in range(a + 1, 7):
            qs = abs(means[a] - means[b]) \
                / np.sqrt(mse / 2.0 * (1.0 / ngs[a]
                                       + 1.0 / ngs[b]))
            rows.append((a, b, float(rha(means[a], 6)),
                         float(rha(means[b], 6)),
                         float(rha(qs, 6)),
                         1 if qs > 4.170 else 0))
    return pd.DataFrame(rows, columns=[
        "dow_a", "dow_b", "mean_a", "mean_b", "q_stat",
        "significant"]).astype({
            "dow_a": np.int64, "dow_b": np.int64,
            "significant": np.int64})


@register("simultaneous_interval_widths_dow", sql=f"""
WITH {_DOWMSE_SQL},
pr AS (SELECT a.dow AS da, b.dow AS db,
              a.s / a.ng - b.s / b.ng AS diff,
              SQRT(ms.mse * (1.0 / a.ng + 1.0 / b.ng)) AS se
       FROM gs a JOIN gs b ON b.dow > a.dow CROSS JOIN ms),
mx AS (SELECT * FROM pr
       ORDER BY ROUND(ABS(diff), 9) DESC, da, db LIMIT 1)
SELECT da AS dow_a, db AS dow_b,
       ROUND(diff, 6) AS mean_diff,
       ROUND(4.170 / SQRT(2.0) * se, 6) AS hw_tukey,
       ROUND({_INVNORM.format(p="1.0 - 0.025 / 21.0")} * se, 6)
           AS hw_bonferroni,
       ROUND(SQRT(12.591587) * se, 6) AS hw_scheffe,
       CAST(CASE WHEN 4.170 / SQRT(2.0)
                      < {_INVNORM.format(p="1.0 - 0.025 / 21.0")}
                 THEN 1 ELSE 0 END AS BIGINT) AS tukey_tightest
FROM mx""")
def simultaneous_interval_widths_dow(sf_dir: str) -> pd.DataFrame:
    """The multiple-comparison zoo priced on one contrast: the
    largest dow mean difference with its 95% SIMULTANEOUS
    interval half-width under Tukey (studentized range,
    q/√2·se), Bonferroni (z at α/2m for the m = 21 pairs, via
    the pinned A&S Φ⁻¹) and Scheffé (√χ²₆ — valid for EVERY
    linear contrast, not just pairs). The ordering is the
    lesson: Tukey < Bonferroni < Scheffé is guaranteed here
    because each method buys protection over a strictly larger
    hypothesis family, and the printed widths show what that
    insurance costs in events/day — a report that quotes the
    Scheffé band for a simple pairwise claim is paying ~20% in
    width for contrasts it never tests, while quoting the
    per-pair t band (narrower than all three) is buying no
    familywise protection at all. tukey_tightest printed as a
    live check of the inequality, same se in all three."""
    yd = _daily_counts_full(sf_dir)
    d = yd["d"].to_numpy(np.int64)
    y = yd["y"].to_numpy(np.float64)
    dow = (d + 4) % 7
    ngs, means = {}, {}
    sse = 0.0
    for k in range(7):
        m = dow == k
        ngs[k] = int(m.sum())
        means[k] = float(y[m].sum()) / ngs[k]
        sse += float((y[m] * y[m]).sum()) \
            - float(y[m].sum()) ** 2 / ngs[k]
    mse = sse / (len(d) - 7)
    rha = textstats.round_half_away
    best = None
    for a in range(7):
        for b in range(a + 1, 7):
            diff = means[a] - means[b]
            key = (-float(rha(abs(diff), 9)), a, b)
            if best is None or key < best[0]:
                se = np.sqrt(mse * (1.0 / ngs[a] + 1.0 / ngs[b]))
                best = (key, a, b, diff, se)
    _, a, b, diff, se = best
    zb = float(_invnorm(1.0 - 0.025 / 21.0))
    return pd.DataFrame({
        "dow_a": np.array([a], np.int64),
        "dow_b": np.array([b], np.int64),
        "mean_diff": [float(rha(diff, 6))],
        "hw_tukey": [float(rha(4.170 / np.sqrt(2.0) * se, 6))],
        "hw_bonferroni": [float(rha(zb * se, 6))],
        "hw_scheffe": [float(rha(np.sqrt(12.591587) * se, 6))],
        "tukey_tightest": np.array(
            [1 if 4.170 / np.sqrt(2.0) < zb else 0], np.int64)})


# ---------------------------------------------------------------------------
# Skew-aware outlier fences: the medcouple-adjusted boxplot + the
# three-rule disagreement table on daily revenue
# ---------------------------------------------------------------------------

def _daily_revenue_cents(sf_dir: str) -> pd.DataFrame:
    """(date, revenue cents) — exact integer daily revenue."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)}).groupby("dt", as_index=False).sum()

    return reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)


def _mc_stats(v: np.ndarray):
    """(med, q1, q3, mc) under the registry's pinned conventions:
    med = mean of the two central order stats, quartiles = lowest
    value with 4·F ≥ n / 3n, medcouple = lower median of the
    kernel over straddling pairs with distinct values."""
    n = len(v)
    sv = np.sort(v).astype(np.float64)
    med = (sv[(n - 1) // 2] + sv[n // 2]) / 2.0
    cm = np.arange(1, n + 1)
    q1 = float(sv[np.searchsorted(4 * cm, n)])
    q3 = float(sv[np.searchsorted(4 * cm, 3 * n)])
    lo = sv[sv <= med]
    hi = sv[sv >= med]
    a = np.repeat(lo, len(hi))
    b = np.tile(hi, len(lo))
    keep = a < b
    h = (b[keep] + a[keep] - 2.0 * med) / (b[keep] - a[keep])
    hs = np.sort(h)
    mc = float(hs[(len(hs) - 1) // 2]) if len(hs) else 0.0
    return med, q1, q3, mc


_MC_SQL = """
dr AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                   AS BIGINT) AS c
       FROM events GROUP BY 1),
rk AS (SELECT dt, c,
              ROW_NUMBER() OVER (ORDER BY c) AS i,
              COUNT(*) OVER () AS n
       FROM dr),
md AS (SELECT (MAX(CASE WHEN i = (n - 1) // 2 + 1 THEN c END)
               + MAX(CASE WHEN i = n // 2 + 1 THEN c END)) / 2.0
                  AS m,
              MIN(CASE WHEN 4 * i >= n THEN c END) AS q1,
              MIN(CASE WHEN 4 * i >= 3 * n THEN c END) AS q3
       FROM rk),
hk AS (SELECT (CAST(b.c AS DOUBLE) + a.c - 2.0 * md.m)
                  / (CAST(b.c AS DOUBLE) - a.c) AS h
       FROM rk a CROSS JOIN rk b CROSS JOIN md
       WHERE a.c <= md.m AND b.c >= md.m AND a.c < b.c),
mc AS (SELECT h AS mc FROM hk
       ORDER BY h LIMIT 1
       OFFSET (SELECT ((COUNT(*) - 1) // 2) FROM hk)),
fen AS (SELECT md.m, md.q1, md.q3, mc.mc,
               CASE WHEN mc.mc >= 0
                    THEN md.q1 - 1.5 * EXP(-4.0 * mc.mc)
                         * (md.q3 - md.q1)
                    ELSE md.q1 - 1.5 * EXP(-3.0 * mc.mc)
                         * (md.q3 - md.q1) END AS alo,
               CASE WHEN mc.mc >= 0
                    THEN md.q3 + 1.5 * EXP(3.0 * mc.mc)
                         * (md.q3 - md.q1)
                    ELSE md.q3 + 1.5 * EXP(4.0 * mc.mc)
                         * (md.q3 - md.q1) END AS ahi
        FROM md CROSS JOIN mc)"""


@register("medcouple_adjusted_fences_daily", sql=f"""
WITH {_MC_SQL}
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM rk) AS n_days,
       ROUND(mc, 6) AS medcouple,
       CAST(q1 AS BIGINT) AS q1_cents,
       CAST(q3 AS BIGINT) AS q3_cents,
       ROUND(q1 - 1.5 * (q3 - q1), 6) AS classic_lo,
       ROUND(q3 + 1.5 * (q3 - q1), 6) AS classic_hi,
       ROUND(alo, 6) AS adjusted_lo,
       ROUND(ahi, 6) AS adjusted_hi
FROM fen""")
def medcouple_adjusted_fences_daily(sf_dir: str) -> pd.DataFrame:
    """The medcouple and the Hubert–Vandervieren skew-adjusted
    boxplot fences on daily revenue. The classic 1.5·IQR fence
    (the boxplot rows' rule) silently assumes symmetry — on a
    right-skewed revenue series it brands every strong sales day
    an 'outlier' while genuine low-side anomalies hide inside
    the fence. The medcouple MC = med{(b+a−2m)/(b−a)} over
    median-straddling pairs is the robust skewness (25%
    breakdown, scale-free), and e^{±3MC}/e^{∓4MC} fence scaling
    stretches the fence on the long-tail side and tightens it on
    the short side, calibrated so ~0.7% of observations flag
    under the actual skewed null instead of the symmetric one.
    Both fence pairs printed: the gap between classic_hi and
    adjusted_hi is, in cents, how much 'good day' the symmetric
    rule was mislabeling. Pinned conventions: central-pair
    median, lowest-value-with-4F≥kn quartiles, lower-median
    kernel, distinct-value straddling pairs; O(days²) pair scan
    is calendar-bounded."""
    dr = _daily_revenue_cents(sf_dir)
    v = dr["c"].to_numpy(np.int64)
    med, q1, q3, mc = _mc_stats(v)
    iqr = q3 - q1
    if mc >= 0:
        alo = q1 - 1.5 * np.exp(-4.0 * mc) * iqr
        ahi = q3 + 1.5 * np.exp(3.0 * mc) * iqr
    else:
        alo = q1 - 1.5 * np.exp(-3.0 * mc) * iqr
        ahi = q3 + 1.5 * np.exp(4.0 * mc) * iqr
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([len(v)], np.int64),
        "medcouple": [float(rha(mc, 6))],
        "q1_cents": np.array([int(q1)], np.int64),
        "q3_cents": np.array([int(q3)], np.int64),
        "classic_lo": [float(rha(q1 - 1.5 * iqr, 6))],
        "classic_hi": [float(rha(q3 + 1.5 * iqr, 6))],
        "adjusted_lo": [float(rha(alo, 6))],
        "adjusted_hi": [float(rha(ahi, 6))]})


@register("outlier_rule_disagreement_daily", sql=f"""
WITH {_MC_SQL},
mad AS (SELECT ad AS mad FROM (
           SELECT ABS(rk.c - md.m) AS ad,
                  ROW_NUMBER() OVER (ORDER BY ABS(rk.c - md.m))
                      AS i,
                  COUNT(*) OVER () AS n
           FROM rk CROSS JOIN md)
        WHERE i = (n - 1) // 2 + 1),
fl AS (SELECT rk.dt, rk.c,
              CASE WHEN rk.c < fen.q1 - 1.5 * (fen.q3 - fen.q1)
                     OR rk.c > fen.q3 + 1.5 * (fen.q3 - fen.q1)
                   THEN 1 ELSE 0 END AS classic_flag,
              CASE WHEN rk.c < fen.alo OR rk.c > fen.ahi
                   THEN 1 ELSE 0 END AS adjusted_flag,
              CASE WHEN ABS(rk.c - fen.m)
                        > 3.0 * 1.4826 * mad.mad
                   THEN 1 ELSE 0 END AS hampel_flag
       FROM rk CROSS JOIN fen CROSS JOIN mad)
SELECT dt AS day, c AS revenue_cents,
       CAST(classic_flag AS BIGINT) AS classic_flag,
       CAST(adjusted_flag AS BIGINT) AS adjusted_flag,
       CAST(hampel_flag AS BIGINT) AS hampel_flag
FROM fl
WHERE classic_flag + adjusted_flag + hampel_flag > 0
ORDER BY dt""")
def outlier_rule_disagreement_daily(sf_dir: str) -> pd.DataFrame:
    """The disagreement table: every day flagged by AT LEAST ONE
    of the three standard outlier rules — classic 1.5·IQR,
    medcouple-adjusted fences, Hampel 3·MAD — with all three
    verdicts side by side, because in practice 'is this day an
    outlier' is answered by whichever rule the dashboard
    happened to implement, and the rules genuinely disagree on
    skewed data: classic-only flags are the symmetric rule's
    skew artifacts (usually strong-but-normal sales days),
    Hampel-only flags mark days far from the MEDIAN that the
    quartile-based fences tolerate, and a day flagged by all
    three is an outlier no methodological quibble can rescue —
    the triage order an anomaly review should actually use.
    Same pinned median/quartile/MC conventions as the fence row;
    MAD uses the SQL-rank lower median of |c − med|."""
    dr = _daily_revenue_cents(sf_dir)
    v = dr["c"].to_numpy(np.int64)
    med, q1, q3, mc = _mc_stats(v)
    iqr = q3 - q1
    if mc >= 0:
        alo = q1 - 1.5 * np.exp(-4.0 * mc) * iqr
        ahi = q3 + 1.5 * np.exp(3.0 * mc) * iqr
    else:
        alo = q1 - 1.5 * np.exp(-3.0 * mc) * iqr
        ahi = q3 + 1.5 * np.exp(4.0 * mc) * iqr
    ad = np.sort(np.abs(v - med))
    mad = float(ad[(len(ad) - 1) // 2])
    cl = (v < q1 - 1.5 * iqr) | (v > q3 + 1.5 * iqr)
    aj = (v < alo) | (v > ahi)
    hp = np.abs(v - med) > 3.0 * 1.4826 * mad
    keep = cl | aj | hp
    return pd.DataFrame({
        "day": dr["dt"].to_numpy()[keep],
        "revenue_cents": v[keep],
        "classic_flag": cl[keep].astype(np.int64),
        "adjusted_flag": aj[keep].astype(np.int64),
        "hampel_flag": hp[keep].astype(np.int64)})


# ---------------------------------------------------------------------------
# Isotonic regression: monotone conversion-by-depth via the exact
# minimax characterization + the pooled level sets
# ---------------------------------------------------------------------------

def _depth_conv(sf_dir: str) -> pd.DataFrame:
    """(depth bucket ≤10, sessions, converted sessions) over visit
    sessions — the weighted input of the isotonic rows."""
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
        isp = (g["event_type"] == "purchase").to_numpy()
        per = pd.DataFrame({"sid": sid, "p": isp}) \
            .groupby("sid").agg(n=("p", "size"), c=("p", "max"))
        out = pd.DataFrame({
            "db": np.minimum(per["n"].to_numpy(np.int64), 10),
            "cnt": np.ones(len(per), np.int64),
            "conv": per["c"].to_numpy().astype(np.int64)})
        return out.groupby("db", as_index=False).sum()

    return reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id",
                         "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["db"], {"cnt": ("cnt", "sum"), "conv": ("conv", "sum")}) \
        .to_pandas().sort_values("db", ignore_index=True)


_DEPTHCONV_SQL = f"""
s AS ({_SESS_SQL}),
per AS (SELECT user_id, sid, COUNT(*) AS n,
               MAX(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS c
        FROM s GROUP BY 1, 2),
dc AS (SELECT LEAST(n, 10) AS db,
              CAST(COUNT(*) AS BIGINT) AS cnt,
              CAST(SUM(c) AS BIGINT) AS conv
       FROM per GROUP BY 1),
av AS (SELECT h.db AS h, j.db AS j,
              SUM(d.conv) * 1.0 / SUM(d.cnt) AS m
       FROM dc h JOIN dc j ON j.db >= h.db
       JOIN dc d ON d.db BETWEEN h.db AND j.db
       GROUP BY 1, 2),
mx AS (SELECT i.db AS i, av.j, MAX(av.m) AS mx
       FROM dc i JOIN av ON av.h <= i.db AND av.j >= i.db
       GROUP BY 1, 2),
iso AS (SELECT i AS db, MIN(mx) AS iso FROM mx GROUP BY i)"""


def _iso_fit(dc: pd.DataFrame):
    """Exact weighted isotonic fit via the minimax formula
    ŷᵢ = min_{j≥i} max_{h≤i} wmean(h..j)."""
    db = dc["db"].to_numpy(np.int64)
    cnt = dc["cnt"].to_numpy(np.int64)
    conv = dc["conv"].to_numpy(np.int64)
    k = len(db)
    iso = np.empty(k)
    for i in range(k):
        best = np.inf
        for j in range(i, k):
            mx = -np.inf
            for h in range(0, i + 1):
                m = conv[h:j + 1].sum() / cnt[h:j + 1].sum()
                mx = max(mx, m)
            best = min(best, mx)
        iso[i] = best
    return db, cnt, conv, iso


@register("isotonic_conversion_by_depth", sql=f"""
WITH {_DEPTHCONV_SQL}
SELECT dc.db AS depth, dc.cnt AS sessions,
       ROUND(dc.conv * 1.0 / dc.cnt, 6) AS raw_rate,
       ROUND(iso.iso, 6) AS isotonic_rate,
       CAST(CASE WHEN ROUND(dc.conv * 1.0 / dc.cnt, 9)
                      <> ROUND(iso.iso, 9)
                 THEN 1 ELSE 0 END AS BIGINT) AS pooled
FROM dc JOIN iso USING (db) ORDER BY dc.db""")
def isotonic_conversion_by_depth(sf_dir: str) -> pd.DataFrame:
    """Weighted isotonic regression of session conversion rate on
    session depth (events per visit, 10+ capped): the raw
    conversion-by-depth table (present as a registry row) read
    under the MONOTONE hypothesis — deeper engagement shouldn't
    convert worse — with the PAVA fit computed EXACTLY through
    the minimax characterization ŷᵢ = min_{j≥i} max_{h≤i}
    mean(h..j), which needs no sequential pooling loop and so
    pins identically in SQL (one O(K³) scan over ≤10 depth
    buckets) and numpy. Where raw == isotonic the monotone story
    holds and the raw rate is simultaneously the best monotone
    estimate; pooled = 1 rows are where raw rates INVERT and
    PAVA flattens them into a level set — small-n jitter at rare
    depths gets borrowed strength from its neighbors, which is
    the practical value: the isotonic column is the
    depth-conversion curve you can safely put in front of a
    product decision, monotone by construction and closer in MSE
    to the truth than the raw curve whenever the true curve is
    monotone (the PAVA guarantee)."""
    db, cnt, conv, iso = _iso_fit(_depth_conv(sf_dir))
    rha = textstats.round_half_away
    raw = conv / cnt
    return pd.DataFrame({
        "depth": db,
        "sessions": cnt,
        "raw_rate": [float(rha(v, 6)) for v in raw],
        "isotonic_rate": [float(rha(v, 6)) for v in iso],
        "pooled": np.array(
            [1 if float(rha(a, 9)) != float(rha(b, 9)) else 0
             for a, b in zip(raw, iso)], np.int64)})


@register("isotonic_depth_level_sets", sql=f"""
WITH {_DEPTHCONV_SQL},
rr AS (SELECT dc.db, dc.cnt, dc.conv,
              ROUND(iso.iso, 9) AS v
       FROM dc JOIN iso USING (db)),
ch AS (SELECT db, cnt, conv, v,
              CASE WHEN v = LAG(v) OVER (ORDER BY db)
                   THEN 0 ELSE 1 END AS brk
       FROM rr),
bl AS (SELECT db, cnt, conv, v,
              SUM(brk) OVER (ORDER BY db) AS blk
       FROM ch)
SELECT CAST(MIN(db) AS BIGINT) AS depth_lo,
       CAST(MAX(db) AS BIGINT) AS depth_hi,
       CAST(SUM(cnt) AS BIGINT) AS sessions,
       ROUND(SUM(conv) * 1.0 / SUM(cnt), 6) AS pooled_rate
FROM bl GROUP BY blk ORDER BY depth_lo""")
def isotonic_depth_level_sets(sf_dir: str) -> pd.DataFrame:
    """The PAVA solution's level sets: maximal runs of adjacent
    depth buckets sharing one isotonic value, with the pooled
    rate (which PAVA guarantees equals the weighted mean of the
    pooled raw rates — printed from the raw counts as the live
    check of that identity). The blocks ARE the statistically
    honest granularity of the depth→conversion story: within a
    block the data cannot support ordering claims ('6-event
    sessions convert better than 5-event' is noise if 5–7 share
    a block), and the number of blocks is the number of
    genuinely distinct engagement tiers the funnel supports —
    the segmentation a depth-targeted nudge campaign should use
    instead of per-depth cells. 9dp value equality defines the
    runs on both engines; same minimax fit."""
    db, cnt, conv, iso = _iso_fit(_depth_conv(sf_dir))
    rha = textstats.round_half_away
    v9 = [float(rha(v, 9)) for v in iso]
    rows = []
    start = 0
    for i in range(1, len(db) + 1):
        if i == len(db) or v9[i] != v9[start]:
            c = int(cnt[start:i].sum())
            rows.append((int(db[start]), int(db[i - 1]), c,
                         float(rha(int(conv[start:i].sum())
                                   / c, 6))))
            start = i
    return pd.DataFrame(rows, columns=[
        "depth_lo", "depth_hi", "sessions", "pooled_rate"]) \
        .astype({"depth_lo": np.int64, "depth_hi": np.int64,
                 "sessions": np.int64})


# ---------------------------------------------------------------------------
# Information decomposition: interaction information + conditional
# independence on the binarized (views, purchases, weekend) triple
# ---------------------------------------------------------------------------

#: 8-cell counts of (views>med, purchases>med, weekend) over the
#: zero-filled calendar.
_BINDAY_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS x3
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d,
             CAST(COALESCE(e.x1, 0) AS BIGINT) AS x1,
             CAST(COALESCE(e.x3, 0) AS BIGINT) AS x3
      FROM cal LEFT JOIN e ON e.d = cal.d),
mv AS (SELECT MIN(x1) AS m FROM (
          SELECT x1, ROW_NUMBER() OVER (ORDER BY x1) AS i,
                 COUNT(*) OVER () AS n FROM g)
       WHERE 2 * i >= n),
mp AS (SELECT MIN(x3) AS m FROM (
          SELECT x3, ROW_NUMBER() OVER (ORDER BY x3) AS i,
                 COUNT(*) OVER () AS n FROM g)
       WHERE 2 * i >= n),
b AS (SELECT CASE WHEN g.x1 > mv.m THEN 1 ELSE 0 END AS v,
             CASE WHEN g.x3 > mp.m THEN 1 ELSE 0 END AS p,
             CASE WHEN (g.d + 4) % 7 IN (0, 6)
                  THEN 1 ELSE 0 END AS w
      FROM g CROSS JOIN mv CROSS JOIN mp),
ct AS (SELECT v, p, w, CAST(COUNT(*) AS BIGINT) AS c
       FROM b GROUP BY 1, 2, 3),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ct)"""


@register("interaction_information_daily", sql=f"""
WITH {_BINDAY_SQL},
vp AS (SELECT v, p, CAST(SUM(c) AS BIGINT) AS c
       FROM ct GROUP BY 1, 2),
mi AS (SELECT SUM(vp.c * 1.0 / nn.n * LOG2(
                  vp.c * 1.0 * nn.n
                  / ((SELECT SUM(c) FROM vp a WHERE a.v = vp.v)
                     * 1.0
                     * (SELECT SUM(c) FROM vp b WHERE b.p = vp.p))
              )) AS i_vp
       FROM vp CROSS JOIN nn),
mic AS (SELECT SUM(ct.c * 1.0 / nn.n * LOG2(
                   ct.c * 1.0
                   * (SELECT SUM(c) FROM ct w2 WHERE w2.w = ct.w)
                   / ((SELECT SUM(c) FROM ct a
                       WHERE a.v = ct.v AND a.w = ct.w) * 1.0
                      * (SELECT SUM(c) FROM ct b
                         WHERE b.p = ct.p AND b.w = ct.w))
               )) AS i_vp_w
        FROM ct CROSS JOIN nn)
SELECT (SELECT n FROM nn) AS n_days,
       ROUND((SELECT i_vp FROM mi), 6) AS mi_vp_bits,
       ROUND((SELECT i_vp_w FROM mic), 6) AS mi_vp_given_w_bits,
       ROUND((SELECT i_vp FROM mi)
             - (SELECT i_vp_w FROM mic), 6) AS interaction_bits,
       CAST(CASE WHEN (SELECT i_vp FROM mi)
                      > (SELECT i_vp_w FROM mic)
                 THEN 1 ELSE 0 END AS BIGINT)
           AS weekend_redundant""")
def interaction_information_daily(sf_dir: str) -> pd.DataFrame:
    """Interaction information of the binarized daily triple
    (views > median, purchases > median, weekend): I(V;P) beside
    I(V;P|W) and their difference — the three-variable question
    the pairwise dependence zoo (nine measures, present) cannot
    ask: is the view–purchase association EXPLAINED BY the
    weekly calendar, or does it live within day classes?
    interaction > 0 (redundancy) means weekend status carries a
    chunk of what V says about P — the association partly rides
    the shared weekly cycle, and any causal read of raw v–p
    correlation double-counts the calendar (the information-
    theoretic face of the confounder the partial-correlation and
    front-door rows fight); interaction < 0 (synergy) is the
    stranger, stronger finding that conditioning on the day
    class REVEALS dependence the marginal hides — V and P
    interact differently on weekends than weekdays, licensing
    the per-day-class models. All three numbers in bits from one
    8-cell table; 0·log0 cells drop by the grouped-sum
    convention; lower-median binarization over the zero-filled
    calendar pinned both engines."""
    g = _dayvec(sf_dir)
    d = g["d"].to_numpy(np.int64)
    x1 = g["x"].to_numpy(np.int64)
    x3 = g["z"].to_numpy(np.int64)
    n = len(d)
    mv = int(np.sort(x1)[(n + 1) // 2 - 1])
    mp = int(np.sort(x3)[(n + 1) // 2 - 1])
    v = (x1 > mv).astype(np.int64)
    p = (x3 > mp).astype(np.int64)
    w = np.isin((d + 4) % 7, (0, 6)).astype(np.int64)
    ct = {}
    for vi, pi, wi in zip(v, p, w):
        ct[(vi, pi, wi)] = ct.get((vi, pi, wi), 0) + 1

    def mi2(cells):
        tot = sum(cells.values())
        rv = {}
        cp = {}
        for (a, b2), c in cells.items():
            rv[a] = rv.get(a, 0) + c
            cp[b2] = cp.get(b2, 0) + c
        s = 0.0
        for (a, b2), c in cells.items():
            s += c / tot * np.log2(c * tot / (rv[a] * cp[b2]))
        return s

    vp = {}
    for (vi, pi, wi), c in ct.items():
        vp[(vi, pi)] = vp.get((vi, pi), 0) + c
    i_vp = mi2(vp)
    i_vp_w = 0.0
    for wi in (0, 1):
        cells = {(a, b2): c for (a, b2, w2), c in ct.items()
                 if w2 == wi}
        nw = sum(cells.values())
        if nw:
            i_vp_w += nw / n * mi2(cells)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "mi_vp_bits": [float(rha(i_vp, 6))],
        "mi_vp_given_w_bits": [float(rha(i_vp_w, 6))],
        "interaction_bits": [float(rha(i_vp - i_vp_w, 6))],
        "weekend_redundant": np.array(
            [1 if i_vp > i_vp_w else 0], np.int64)})
