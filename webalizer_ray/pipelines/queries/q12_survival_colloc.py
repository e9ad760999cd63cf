"""Driver-contract queries (chunk 12/18).
Sections:
  - Nelson–Aalen cumulative hazard vs Kaplan–Meier (tie-heavy discrete
  - Distribution-free quantile confidence intervals (order-statistic
  - Collocation scoring beyond PMI: Dunning G² + t-score/Dice panel
  - SRE error-budget machinery: multi-window burn-rate alerts + budget
  - Superposed-epoch analysis around the busiest / quietest days
  - Graded ranking metrics for vector retrieval: nDCG@10 + ERR@10 with
  - Risk pooling across brand demands (the portfolio effect inventory
  - Weekday-composition (trading-day) adjustment: month revenue and the
  - Cointegration: Engle–Granger two-step + error-correction model on
  - Threshold autoregression: SETAR(2) regime persistence + threshold
  - smallest x with 10*cum >= q*m  (cum = rank in sorted)
  - Rousseeuw–Croux Qn robust scale (exact k-th pairwise difference)
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
    _events,
    ann,
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
from webalizer_ray.pipelines.queries.q07_fits_audits import (  # noqa: F401
    _source_word_counts,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _DAILY_SQL,
    _daily_counts,
)
from webalizer_ray.pipelines.queries.q10_session_bias import (  # noqa: F401
    _daily_counts_vec,
)
from webalizer_ray.pipelines.queries.q11_forecast_supply import (  # noqa: F401
    _dayvec,
    _dayvec_vy,
    _seg_lo,
)



# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard vs Kaplan–Meier (tie-heavy discrete
# days are exactly where the two estimators diverge)
# ---------------------------------------------------------------------------

#: time-to-first-purchase life table (censor at last seen), with both
#: the KM product and the NA hazard sum accumulated in ascending-day
#: order on both engines.
_NAKM_SQL = """
pu AS (SELECT user_id,
              MIN(epoch_us(ts) // 86400000000) AS fd,
              MAX(epoch_us(ts) // 86400000000) AS ld,
              MIN(CASE WHEN event_type = 'purchase'
                       THEN epoch_us(ts) // 86400000000 END) AS pd
       FROM events GROUP BY 1),
ev AS (SELECT CASE WHEN pd IS NOT NULL THEN pd - fd
                   ELSE ld - fd END AS t,
              CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ep
       FROM pu),
lt AS (SELECT t, CAST(SUM(ep) AS BIGINT) AS dth,
              CAST(SUM(1 - ep) AS BIGINT) AS cen
       FROM ev GROUP BY t),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
ar AS (SELECT lt.t, lt.dth,
              tot.n - COALESCE(SUM(lt.dth + lt.cen)
                  OVER (ORDER BY lt.t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS rsk
       FROM lt, tot),
es AS (SELECT t, dth, rsk,
              PRODUCT(1.0 - CAST(dth AS DOUBLE) / rsk)
                  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS km,
              SUM(CAST(dth AS DOUBLE) / rsk)
                  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS na_h
       FROM ar)"""


@register("nelson_aalen_first_purchase", sql=f"""
WITH {_NAKM_SQL}
SELECT CAST(t AS BIGINT) AS day_t, CAST(rsk AS BIGINT) AS at_risk,
       dth AS d_purchase,
       ROUND(na_h, 6) AS cum_hazard,
       ROUND(EXP(-na_h), 6) AS fh_survival,
       ROUND(km, 6) AS km_survival,
       ROUND(EXP(-na_h) - km, 6) AS fh_minus_km
FROM es WHERE dth > 0 ORDER BY t""")
def nelson_aalen_first_purchase(sf_dir: str) -> pd.DataFrame:
    """Nelson–Aalen cumulative hazard for time-to-first-purchase,
    with the Fleming–Harrington survival exp(−H) printed beside
    Kaplan–Meier. The two are asymptotically identical but NOT in
    tie-heavy data — and integer-day event data is maximally
    tie-heavy, so this table shows the divergence where it
    actually bites: exp(−H) ≥ KM always (1−x ≤ e^−x per factor),
    and the gap grows with each day's d/r. H itself is the
    quantity with the clean interpretation the KM curve lacks —
    expected number of purchases per user by day t if re-entry
    were allowed — and its increments ARE the discrete hazard the
    session/tenure hazard queries report elsewhere, tying the
    families together. Both accumulations run in ascending-day
    order (windowed SUM/PRODUCT ↔ cumsum/cumprod)."""
    lt = _nakm_table(sf_dir)
    lt = lt[lt["dth"] > 0]
    rha = textstats.round_half_away
    return pd.DataFrame({
        "day_t": lt["t"].astype(np.int64),
        "at_risk": lt["rsk"].astype(np.int64),
        "d_purchase": lt["dth"].astype(np.int64),
        "cum_hazard": [float(rha(v, 6)) for v in lt["na_h"]],
        "fh_survival": [float(rha(np.exp(-v), 6))
                        for v in lt["na_h"]],
        "km_survival": [float(rha(v, 6)) for v in lt["km"]],
        "fh_minus_km": [float(rha(np.exp(-h) - k, 6))
                        for h, k in zip(lt["na_h"], lt["km"])]})


def _nakm_table(sf_dir: str) -> pd.DataFrame:
    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        et = df["event_type"].to_numpy()
        SENT = np.int64(1 << 60)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "fd": day, "ld": day,
            "pd_": np.where(et == "purchase", day, SENT)}) \
            .groupby("user_id", as_index=False) \
            .agg(fd=("fd", "min"), ld=("ld", "max"),
                 pd_=("pd_", "min"))

    pu = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"fd": ("fd", "min"), "ld": ("ld", "max"),
                      "pd_": ("pd_", "min")}).to_pandas()
    SENT = np.int64(1 << 60)
    fd = pu["fd"].to_numpy(np.int64)
    ld = pu["ld"].to_numpy(np.int64)
    pdy = pu["pd_"].to_numpy(np.int64)
    has_p = pdy < SENT
    t = np.where(has_p, pdy - fd, ld - fd)
    ep = has_p.astype(np.int64)
    n = len(pu)
    lt = pd.DataFrame({"t": t, "dth": ep, "cen": 1 - ep}) \
        .groupby("t", as_index=False).sum() \
        .sort_values("t", ignore_index=True)
    gone = (lt["dth"] + lt["cen"]).cumsum().shift(
        1, fill_value=0).to_numpy(np.int64)
    lt["rsk"] = n - gone
    lt["km"] = np.cumprod(1.0 - lt["dth"].to_numpy(np.float64)
                          / lt["rsk"].to_numpy(np.float64))
    lt["na_h"] = np.cumsum(lt["dth"].to_numpy(np.float64)
                           / lt["rsk"].to_numpy(np.float64))
    return lt


@register("na_km_divergence", sql=f"""
WITH {_NAKM_SQL},
mx AS (SELECT MAX(EXP(-na_h) - km) AS max_gap FROM es),
last AS (SELECT * FROM es ORDER BY t DESC LIMIT 1)
SELECT (SELECT n FROM tot) AS n_users,
       ROUND((SELECT na_h FROM last), 6) AS final_cum_hazard,
       ROUND(EXP(-(SELECT na_h FROM last)), 6) AS final_fh,
       ROUND((SELECT km FROM last), 6) AS final_km,
       ROUND((SELECT max_gap FROM mx), 6) AS max_gap,
       CAST(CASE WHEN (SELECT max_gap FROM mx) >= -1e-12
                 THEN 1 ELSE 0 END AS BIGINT) AS inequality_holds""")
def na_km_divergence(sf_dir: str) -> pd.DataFrame:
    """The estimator-divergence verdict: final cumulative hazard,
    both survival endpoints, the maximum exp(−H) − KM gap over
    the curve, and a printed check of the theoretical inequality
    exp(−H) ≥ KM (each factor satisfies e^{−d/r} ≥ 1 − d/r). The
    practical reading: when max_gap is material, per-day death
    fractions d/r are large and BOTH estimators are strained —
    the analysis grain is too coarse for the event density, and
    the honest fix is finer time units, not a different
    estimator. A near-zero max_gap certifies every KM-based
    number in the registry against the estimator-choice
    objection. Same life table, one row."""
    lt = _nakm_table(sf_dir)
    n = int((lt["dth"] + lt["cen"]).sum())
    gap = np.exp(-lt["na_h"].to_numpy(np.float64)) \
        - lt["km"].to_numpy(np.float64)
    rha = textstats.round_half_away
    last = lt.iloc[-1]
    mg = float(gap.max())
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "final_cum_hazard": [float(rha(last["na_h"], 6))],
        "final_fh": [float(rha(np.exp(-last["na_h"]), 6))],
        "final_km": [float(rha(last["km"], 6))],
        "max_gap": [float(rha(mg, 6))],
        "inequality_holds": np.array(
            [1 if mg >= -1e-12 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Distribution-free quantile confidence intervals (order-statistic
# ranks + exact binomial coverage)
# ---------------------------------------------------------------------------

def _order_stat_ci(hist: pd.DataFrame, n: int, p: float):
    """(point, lo, hi, l, u, coverage) for quantile p from a sorted
    cents histogram: Wald-rank order statistics l/u, exact binomial
    coverage Σ C(n,k)p^k(1-p)^(n-k) over the O(√n) ranks between
    them (lgamma arithmetic — no factorials materialize)."""
    from math import lgamma
    c = hist["c"].to_numpy(np.int64)
    cm = np.cumsum(hist["cnt"].to_numpy(np.int64))
    mu = n * p
    sd = np.sqrt(n * p * (1.0 - p))
    l = max(1, int(np.floor(mu - 1.959964 * sd)))
    u = min(n, int(np.ceil(mu + 1.959964 * sd)) + 1)
    point = int(c[np.searchsorted(cm, int(np.ceil(mu)))]) \
        if p != 0.5 else int(c[np.searchsorted(cm, (n + 1) // 2)])
    lo = int(c[np.searchsorted(cm, l)])
    hi = int(c[np.searchsorted(cm, u)])
    cov = 0.0
    for k in range(l, u):
        cov += float(np.exp(lgamma(n + 1.0) - lgamma(k + 1.0)
                            - lgamma(n - k + 1.0)
                            + k * np.log(p)
                            + (n - k) * np.log(1.0 - p)))
    return point, lo, hi, l, u, min(cov, 1.0)


def _value_cents_hist(sf_dir: str) -> tuple[pd.DataFrame, int]:
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cc = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"c": cc}).groupby("c").size() \
            .reset_index(name="cnt").astype(np.int64)

    hist = reduce_sink(
        _events(sf_dir, ["value"])
        .map_batches(prep, batch_format="pandas"),
        ["c"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("c", ignore_index=True)
    return hist, int(hist["cnt"].sum())


_QCI_SQL_TMPL = """
hh AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM events GROUP BY 1),
cum AS (SELECT c, cnt, SUM(cnt) OVER (ORDER BY c) AS cm,
               (SELECT SUM(cnt) FROM hh) AS n
        FROM hh),
rk AS (SELECT MAX(n) AS n,
              GREATEST(1, CAST(FLOOR({p} * MAX(n)
                  - 1.959964 * SQRT(MAX(n) * {p} * (1.0 - {p})))
                  AS BIGINT)) AS l,
              LEAST(MAX(n), CAST(CEIL({p} * MAX(n)
                  + 1.959964 * SQRT(MAX(n) * {p} * (1.0 - {p})))
                  AS BIGINT) + 1) AS u
       FROM cum),
pt AS (SELECT
    (SELECT MIN(c) FROM cum, rk WHERE cm >= {point_rank}) AS point,
    (SELECT MIN(c) FROM cum, rk WHERE cm >= rk.l) AS lo,
    (SELECT MIN(c) FROM cum, rk WHERE cm >= rk.u) AS hi),
cov AS (SELECT SUM(EXP(lgamma(rk.n + 1.0) - lgamma(k.k + 1.0)
                       - lgamma(rk.n - k.k + 1.0)
                       + k.k * LN({p})
                       + (rk.n - k.k) * LN(1.0 - {p}))) AS cv
        FROM rk, LATERAL (SELECT UNNEST(generate_series(
                          CAST(rk.l AS BIGINT),
                          CAST(rk.u - 1 AS BIGINT))) AS k) k)
SELECT (SELECT n FROM rk) AS n,
       ROUND((SELECT point FROM pt) / 100.0, 6) AS point,
       ROUND((SELECT lo FROM pt) / 100.0, 6) AS ci_lo,
       ROUND((SELECT hi FROM pt) / 100.0, 6) AS ci_hi,
       (SELECT CAST(l AS BIGINT) FROM rk) AS rank_lo,
       (SELECT CAST(u AS BIGINT) FROM rk) AS rank_hi,
       ROUND(LEAST((SELECT cv FROM cov), 1.0), 6) AS coverage"""


@register("median_exact_ci_value",
          sql="WITH " + _QCI_SQL_TMPL.format(
              p="0.5", point_rank="(rk.n + 1) // 2"))
def median_exact_ci_value(sf_dir: str) -> pd.DataFrame:
    """Distribution-free confidence interval for the MEDIAN event
    value: order statistics [x₍ₗ₎, x₍ᵤ₎] at Wald ranks
    n/2 ± 1.96·√n/2, with the ACHIEVED coverage computed exactly
    as the binomial sum Σ C(n,k)/2ⁿ over the enclosed ranks —
    no normality, no bootstrap, no assumption beyond iid. This is
    the error bar the registry's many exact quantile tables have
    been printing without: a median is worthless operationally
    until you know it's ±2¢ vs ±2$. The coverage sum spans only
    O(√n) ranks, so the lgamma arithmetic stays trivial at any
    scale, and the interval endpoints are exact integers off the
    bounded cents histogram. Lower-median point convention as
    everywhere in the suite."""
    hist, n = _value_cents_hist(sf_dir)
    point, lo, hi, l, u, cov = _order_stat_ci(hist, n, 0.5)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "point": [float(rha(point / 100.0, 6))],
        "ci_lo": [float(rha(lo / 100.0, 6))],
        "ci_hi": [float(rha(hi / 100.0, 6))],
        "rank_lo": np.array([l], np.int64),
        "rank_hi": np.array([u], np.int64),
        "coverage": [float(rha(cov, 6))]})


@register("p90_exact_ci_value",
          sql="WITH " + _QCI_SQL_TMPL.format(
              p="0.9", point_rank="CAST(CEIL(0.9 * rk.n) "
                                  "AS BIGINT)"))
def p90_exact_ci_value(sf_dir: str) -> pd.DataFrame:
    """The same order-statistic machinery at p90 — where it matters
    more and is used less: tail quantiles have WIDER rank
    intervals (√(p(1−p)n) shrinks but the density out there is
    thin, so the VALUE interval balloons), and printing ci_lo/
    ci_hi next to every p90 latency/value SLO is the difference
    between a target and a coin flip. The binomial coverage at
    p = 0.9 is asymmetric by nature; the exact sum reports what
    the Wald ranks actually achieve rather than the nominal 95%.
    Point estimate uses the ceil(0.9n) rank (the suite's upper
    quantile convention)."""
    hist, n = _value_cents_hist(sf_dir)
    point, lo, hi, l, u, cov = _order_stat_ci(hist, n, 0.9)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "point": [float(rha(point / 100.0, 6))],
        "ci_lo": [float(rha(lo / 100.0, 6))],
        "ci_hi": [float(rha(hi / 100.0, 6))],
        "rank_lo": np.array([l], np.int64),
        "rank_hi": np.array([u], np.int64),
        "coverage": [float(rha(cov, 6))]})


# ---------------------------------------------------------------------------
# Collocation scoring beyond PMI: Dunning G² + t-score/Dice panel
# ---------------------------------------------------------------------------

def _bigram_tables(sf_dir: str, min_count: int = 5):
    """(candidates cb>=min_count with w1/w2 bigram-position
    marginals attached, N total bigram tokens). Marginals are
    vocabulary-bounded reduces filtered to candidate words."""
    def grams(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        rows = []
        for ws in words:
            rows.extend(zip(ws[:-1], ws[1:]))
        if not rows:
            return pd.DataFrame(columns=["w1", "w2", "cb"])
        return pd.DataFrame(rows, columns=["w1", "w2"]) \
            .groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "cb"})

    bc = reduce_sink(
        _docs(sf_dir, ["text"])
        .map_batches(grams, batch_format="pandas"),
        ["w1", "w2"], {"cb": ("cb", "sum")})
    nn = int(bc.map_batches(
        lambda df: pd.DataFrame({"s": [df["cb"].sum()]}),
        batch_format="pandas").to_pandas()["s"].sum())
    cand = bc.map_batches(
        lambda df: df[df["cb"] >= min_count],
        batch_format="pandas").to_pandas()
    m1 = reduce_sink(
        bc.map_batches(lambda df: pd.DataFrame(
            {"w1": df["w1"], "c1": df["cb"]}),
            batch_format="pandas"),
        ["w1"], {"c1": ("c1", "sum")}).map_batches(
        lambda df, need=set(cand["w1"]): df[df["w1"].isin(need)],
        batch_format="pandas").to_pandas()
    m2 = reduce_sink(
        bc.map_batches(lambda df: pd.DataFrame(
            {"w2": df["w2"], "c2": df["cb"]}),
            batch_format="pandas"),
        ["w2"], {"c2": ("c2", "sum")}).map_batches(
        lambda df, need=set(cand["w2"]): df[df["w2"].isin(need)],
        batch_format="pandas").to_pandas()
    out = cand.merge(m1, on="w1").merge(m2, on="w2")
    return out, nn


#: shared SQL: bigram counts with first/second-position marginals
#: over BIGRAM tokens (not unigrams — the Dunning contingency is on
#: the bigram sample space), min count 5.
_COLL_SQL = r"""
t AS (SELECT regexp_extract_all(lower(text), '\S+') AS w
      FROM documents),
bg AS (SELECT w[i] AS w1, w[i + 1] AS w2
       FROM t, LATERAL (SELECT unnest(generate_series(1,
                        len(w) - 1)) AS i) g),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
       FROM bg GROUP BY 1, 2),
nn AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM bc),
m1 AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1
       FROM bc GROUP BY 1),
m2 AS (SELECT w2, CAST(SUM(cb) AS BIGINT) AS c2
       FROM bc GROUP BY 1),
cand AS (SELECT bc.w1, bc.w2, bc.cb, m1.c1, m2.c2, nn.n
         FROM bc JOIN m1 USING (w1) JOIN m2 USING (w2), nn
         WHERE bc.cb >= 5)"""


@register("bigram_llr_collocations", sql=f"""
WITH {_COLL_SQL},
sc AS (SELECT w1, w2, cb, c1, c2, n,
              2.0 * (cb * LN(CAST(cb AS DOUBLE) * n
                             / (CAST(c1 AS DOUBLE) * c2))
                     + CASE WHEN c1 - cb > 0
                            THEN (c1 - cb)
                                 * LN(CAST(c1 - cb AS DOUBLE) * n
                                      / (CAST(c1 AS DOUBLE)
                                         * (n - c2)))
                            ELSE 0 END
                     + CASE WHEN c2 - cb > 0
                            THEN (c2 - cb)
                                 * LN(CAST(c2 - cb AS DOUBLE) * n
                                      / (CAST(n - c1 AS DOUBLE)
                                         * c2))
                            ELSE 0 END
                     + CASE WHEN n - c1 - c2 + cb > 0
                            THEN (n - c1 - c2 + cb)
                                 * LN(CAST(n - c1 - c2 + cb
                                           AS DOUBLE) * n
                                      / (CAST(n - c1 AS DOUBLE)
                                         * (n - c2)))
                            ELSE 0 END) AS llr,
              LN((CAST(cb AS DOUBLE) / n)
                 / ((CAST(c1 AS DOUBLE) / n)
                    * (CAST(c2 AS DOUBLE) / n))) AS pmi
       FROM cand),
rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(llr, 6) DESC,
                                    w1, w2) AS rr
       FROM sc)
SELECT w1, w2, cb AS cnt, ROUND(llr, 6) AS llr,
       ROUND(pmi, 6) AS pmi
FROM rk WHERE rr <= 15 ORDER BY llr DESC, w1, w2""")
def bigram_llr_collocations(sf_dir: str) -> pd.DataFrame:
    """Dunning (1993) log-likelihood-ratio collocations: top-15
    bigrams by the 2×2 G² against independence on the bigram
    sample space, with each pair's PMI printed beside it. This is
    the scorer that fixed PMI's famous failure — PMI is maximized
    by pairs seen ONCE (it divides by both rarities), so
    [[bigram_pmi]] needs its min-count crutch, while G² weights
    evidence by frequency and is χ²-calibrated, making scores
    comparable across corpus sizes. Reading the two columns
    together is the diagnostic: high-G²/modest-PMI pairs are
    high-volume grammatical glue, high-PMI/modest-G² are rare
    technical terms — a vocab/tokenizer pipeline wants them
    segregated exactly this way. Zero cells contribute 0 (the
    0·ln0 convention, guarded identically); marginals are
    bigram-POSITION counts, and ranking rounds G² at 6dp with
    word ties."""
    cand, nn = _bigram_tables(sf_dir)
    cb = cand["cb"].to_numpy(np.float64)
    c1 = cand["c1"].to_numpy(np.float64)
    c2 = cand["c2"].to_numpy(np.float64)
    n = float(nn)

    def term(k, e_num, e_den):
        with np.errstate(divide="ignore", invalid="ignore"):
            v = k * np.log(k * n / (e_num * e_den))
        return np.where(k > 0, v, 0.0)

    llr = 2.0 * (term(cb, c1, c2)
                 + term(c1 - cb, c1, n - c2)
                 + term(c2 - cb, n - c1, c2)
                 + term(n - c1 - c2 + cb, n - c1, n - c2))
    pmi = np.log((cb / n) / ((c1 / n) * (c2 / n)))
    rha = textstats.round_half_away
    out = cand.assign(llr=rha(llr, 6), pmi=rha(pmi, 6))
    out = out.sort_values(["llr", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(15)
    return pd.DataFrame({
        "w1": out["w1"].to_numpy(),
        "w2": out["w2"].to_numpy(),
        "cnt": out["cb"].to_numpy(np.int64),
        "llr": out["llr"].to_numpy(np.float64),
        "pmi": out["pmi"].to_numpy(np.float64)})


@register("collocation_tscore_dice", sql=f"""
WITH {_COLL_SQL},
sc AS (SELECT w1, w2, cb,
              (cb - CAST(c1 AS DOUBLE) * c2 / n)
                  / SQRT(CAST(cb AS DOUBLE)) AS tsc,
              2.0 * cb / (CAST(c1 AS DOUBLE) + c2) AS dice
       FROM cand),
rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(tsc, 6) DESC,
                                    w1, w2) AS rr
       FROM sc)
SELECT w1, w2, cb AS cnt, ROUND(tsc, 6) AS t_score,
       ROUND(dice, 6) AS dice
FROM rk WHERE rr <= 15 ORDER BY t_score DESC, w1, w2""")
def collocation_tscore_dice(sf_dir: str) -> pd.DataFrame:
    """The other two classical collocation scorers on the same
    candidates: the t-score (k−E)/√k — Church & Hanks' confidence
    measure, which unlike PMI REWARDS volume and so surfaces the
    workhorse collocations a phrase tokenizer should merge first —
    and Dice 2k/(c1+c2), the symmetric association used by
    phrase-table builders because it is invariant to corpus size
    entirely. Three scorers (with [[bigram_llr_collocations]])
    triangulate: pairs ranked high by ALL THREE are safe merges;
    PMI-only pairs are rare-term noise; t-only pairs are frequency
    artifacts. Same exact bigram-position marginals; 6dp-rounded
    rank with word ties."""
    cand, nn = _bigram_tables(sf_dir)
    cb = cand["cb"].to_numpy(np.float64)
    c1 = cand["c1"].to_numpy(np.float64)
    c2 = cand["c2"].to_numpy(np.float64)
    n = float(nn)
    tsc = (cb - c1 * c2 / n) / np.sqrt(cb)
    dice = 2.0 * cb / (c1 + c2)
    rha = textstats.round_half_away
    out = cand.assign(tsc=rha(tsc, 6), dice=rha(dice, 6))
    out = out.sort_values(["tsc", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(15)
    return pd.DataFrame({
        "w1": out["w1"].to_numpy(),
        "w2": out["w2"].to_numpy(),
        "cnt": out["cb"].to_numpy(np.int64),
        "t_score": out["tsc"].to_numpy(np.float64),
        "dice": out["dice"].to_numpy(np.float64)})


# ---------------------------------------------------------------------------
# SRE error-budget machinery: multi-window burn-rate alerts + budget
# timeline (SLO = 99% non-error events, documented constant)
# ---------------------------------------------------------------------------

#: zero-filled hourly (events, errors) spine over the event-hour span.
_SLO_SQL = """
e AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                           ELSE 0 END) AS BIGINT) AS err
      FROM events GROUP BY 1),
sp AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS h FROM sp),
g AS (SELECT cal.h, CAST(cal.h - sp.lo AS BIGINT) AS i,
             COALESCE(e.n, 0) AS n, COALESCE(e.err, 0) AS err
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.h = cal.h)"""


@register("slo_burn_rate_alerts", sql=f"""
WITH {_SLO_SQL},
w AS (SELECT i, h,
             SUM(n) OVER (ORDER BY i ROWS BETWEEN 5 PRECEDING
                          AND CURRENT ROW) AS n6,
             SUM(err) OVER (ORDER BY i ROWS BETWEEN 5 PRECEDING
                            AND CURRENT ROW) AS e6,
             SUM(n) OVER (ORDER BY i ROWS BETWEEN 0 PRECEDING
                          AND CURRENT ROW) AS n1,
             SUM(err) OVER (ORDER BY i ROWS BETWEEN 0 PRECEDING
                            AND CURRENT ROW) AS e1,
             SUM(n) OVER (ORDER BY i ROWS BETWEEN 71 PRECEDING
                          AND CURRENT ROW) AS n72,
             SUM(err) OVER (ORDER BY i ROWS BETWEEN 71 PRECEDING
                            AND CURRENT ROW) AS e72
      FROM g),
pol AS (SELECT 'page' AS policy, 6 AS long_w, i, h,
               CASE WHEN n6 > 0 AND n1 > 0
                         AND (CAST(e6 AS DOUBLE) / n6) / 0.01 > 6.0
                         AND (CAST(e1 AS DOUBLE) / n1) / 0.01 > 6.0
                    THEN 1 ELSE 0 END AS fired,
               CASE WHEN n6 > 0
                    THEN (CAST(e6 AS DOUBLE) / n6) / 0.01
                    ELSE 0 END AS burn
        FROM w WHERE i >= 5
        UNION ALL
        SELECT 'ticket', 72, i, h,
               CASE WHEN n72 > 0 AND n6 > 0
                         AND (CAST(e72 AS DOUBLE) / n72) / 0.01
                             > 1.0
                         AND (CAST(e6 AS DOUBLE) / n6) / 0.01
                             > 1.0
                    THEN 1 ELSE 0 END,
               CASE WHEN n72 > 0
                    THEN (CAST(e72 AS DOUBLE) / n72) / 0.01
                    ELSE 0 END
        FROM w WHERE i >= 71)
SELECT policy, CAST(COUNT(*) AS BIGINT) AS n_hours_evaluated,
       CAST(SUM(fired) AS BIGINT) AS hours_fired,
       CAST(COALESCE(MIN(CASE WHEN fired = 1 THEN h END), 0)
            AS BIGINT) AS first_fire_epoch_hour,
       ROUND(MAX(burn), 6) AS max_long_burn
FROM pol GROUP BY policy ORDER BY policy""")
def slo_burn_rate_alerts(sf_dir: str) -> pd.DataFrame:
    """The Google-SRE multi-window multi-burn-rate alert policy
    replayed over the event stream against a 99% non-error SLO:
    'page' fires when BOTH the 6h and 1h windows burn budget at
    >6×, 'ticket' when both 72h and 6h burn at >1×. The two-window
    trick is the entire point — a long window alone alerts hours
    after the bleeding stopped, a short window alone pages on
    every blip; requiring both gives fast trigger AND fast reset,
    and replaying the policy on history (hours_fired, first fire)
    is how an SRE team tunes thresholds BEFORE wiring the pager.
    Exact integer window sums on the zero-filled hourly spine;
    only complete windows evaluate; empty-window guards identical
    on both engines."""
    g = _slo_spine(sf_dir)
    rows = []
    for policy, lw, sw, thr in (("page", 6, 1, 6.0),
                                ("ticket", 72, 6, 1.0)):
        n = g["n"].to_numpy(np.int64)
        er = g["err"].to_numpy(np.int64)
        cn = np.concatenate([[0], np.cumsum(n)])
        ce = np.concatenate([[0], np.cumsum(er)])

        def wsum(c, w, t):
            return int(c[t + 1] - c[max(0, t + 1 - w)])

        fired = 0
        first = 0
        mx = 0.0
        cnt = 0
        for t in range(lw - 1, len(g)):
            nl, el = wsum(cn, lw, t), wsum(ce, lw, t)
            ns, es = wsum(cn, sw, t), wsum(ce, sw, t)
            bl = (el / nl) / 0.01 if nl > 0 else 0.0
            bs = (es / ns) / 0.01 if ns > 0 else 0.0
            mx = max(mx, bl)
            cnt += 1
            if nl > 0 and ns > 0 and bl > thr and bs > thr:
                fired += 1
                if first == 0:
                    first = int(g["h"].iloc[t])
        rows.append((policy, cnt, fired, first,
                     float(textstats.round_half_away(mx, 6))))
    return pd.DataFrame(rows, columns=[
        "policy", "n_hours_evaluated", "hours_fired",
        "first_fire_epoch_hour", "max_long_burn"]) \
        .astype({"n_hours_evaluated": np.int64,
                 "hours_fired": np.int64,
                 "first_fire_epoch_hour": np.int64}) \
        .sort_values("policy", ignore_index=True)


def _slo_spine(sf_dir: str) -> pd.DataFrame:
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "h": (us // 3_600_000_000).astype(np.int64),
            "n": np.ones(len(df), np.int64),
            "err": (df["event_type"].to_numpy() == "error")
            .astype(np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["h"], {"n": ("n", "sum"), "err": ("err", "sum")}) \
        .to_pandas().sort_values("h", ignore_index=True)
    lo, hi = int(e["h"].min()), int(e["h"].max())
    cal = pd.DataFrame({"h": np.arange(lo, hi + 1,
                                       dtype=np.int64)})
    return cal.merge(e, on="h", how="left").fillna(0) \
        .astype({"n": np.int64, "err": np.int64})


@register("error_budget_timeline", sql=f"""
WITH {_SLO_SQL},
d AS (SELECT h // 24 AS day, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(err) AS BIGINT) AS err
      FROM g GROUP BY 1),
tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM d),
cu AS (SELECT day, SUM(n) OVER (ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS cn,
              SUM(err) OVER (ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS ce
       FROM d)
SELECT CAST(day AS BIGINT) AS epoch_day,
       CAST(cn AS BIGINT) AS cum_events,
       CAST(ce AS BIGINT) AS cum_errors,
       ROUND(CAST(ce AS DOUBLE) / cn, 6) AS cum_error_rate,
       ROUND(CAST(ce AS DOUBLE) / (0.01 * tt.tot) * 100.0, 6)
           AS budget_consumed_pct,
       CAST(CASE WHEN CAST(ce AS DOUBLE) / (0.01 * tt.tot) > 1.0
                 THEN 1 ELSE 0 END AS BIGINT) AS over_budget
FROM cu, tt ORDER BY day""")
def error_budget_timeline(sf_dir: str) -> pd.DataFrame:
    """The error-budget burn-down: per day, cumulative errors as a
    percent of the FULL period's 1% budget, with the over-budget
    flag. This is the chart an SLO review opens with — the
    [[slo_burn_rate_alerts]] replay says when a pager would have
    fired; this says whether the period as a whole kept its
    promise and WHEN the budget crossed 100% (every feature
    launch after that day was, by policy, frozen). Day buckets
    are epoch-hour//24 so both tables share the same clock;
    cumulative sums are exact integers with two rounded float
    expressions."""
    g = _slo_spine(sf_dir)
    d = g.assign(day=g["h"] // 24).groupby("day",
                                           as_index=False).sum()
    d = d.sort_values("day", ignore_index=True)
    tot = int(d["n"].sum())
    cn = d["n"].cumsum().to_numpy(np.int64)
    ce = d["err"].cumsum().to_numpy(np.int64)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "epoch_day": d["day"].to_numpy(np.int64),
        "cum_events": cn,
        "cum_errors": ce,
        "cum_error_rate": [float(rha(e / n, 6))
                           for e, n in zip(ce, cn)],
        "budget_consumed_pct": [
            float(rha(e / (0.01 * tot) * 100.0, 6)) for e in ce],
        "over_budget": (ce / (0.01 * tot) > 1.0)
        .astype(np.int64)})


# ---------------------------------------------------------------------------
# Superposed-epoch analysis around the busiest / quietest days
# ---------------------------------------------------------------------------

def _epoch_profile(sf_dir: str, top: bool) -> pd.DataFrame:
    x = _daily_counts_vec(sf_dir)
    lo = _seg_lo(sf_dir)
    n = len(x)
    order = np.lexsort((np.arange(n),
                        -x if top else x))
    anchors = np.sort(order[:5])
    gmean = float(x.sum()) / n
    rha = textstats.round_half_away
    rows = []
    for o in range(-3, 4):
        vals = [int(x[a + o]) for a in anchors
                if 0 <= a + o < n]
        if vals:
            m = float(sum(vals)) / len(vals)
            rows.append((o, len(vals), float(rha(m, 6)),
                         float(rha(m / gmean, 6))))
    return pd.DataFrame(rows, columns=[
        "offset", "n_anchors", "mean_count", "ratio_to_global"]) \
        .astype({"offset": np.int64, "n_anchors": np.int64})


_EPOCH_SQL_TMPL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d, CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN e ON e.d = cal.d),
gm AS (SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS m FROM g),
an AS (SELECT d FROM g ORDER BY x {dirn}, d LIMIT 5),
os AS (SELECT CAST(UNNEST(generate_series(-3, 3)) AS BIGINT)
           AS o),
pr AS (SELECT os.o, g.x
       FROM an CROSS JOIN os JOIN g ON g.d = an.d + os.o)
SELECT o AS "offset", CAST(COUNT(*) AS BIGINT) AS n_anchors,
       ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_count,
       ROUND((CAST(SUM(x) AS DOUBLE) / COUNT(*))
             / (SELECT m FROM gm), 6) AS ratio_to_global
FROM pr GROUP BY o ORDER BY o"""


@register("superposed_epoch_peak_days",
          sql="WITH " + _EPOCH_SQL_TMPL.format(dirn="DESC"))
def superposed_epoch_peak_days(sf_dir: str) -> pd.DataFrame:
    """Superposed-epoch analysis (the geophysics event-study): align
    the 5 busiest days at offset 0 and average the surrounding
    ±3-day count profile. The SHAPE around a spike is what a
    single-day anomaly list can't show and capacity planning
    needs: symmetric shoulders mean spikes ride multi-day waves
    (scale up a day early), a sharp peak with NEGATIVE lobes
    means spikes borrow demand from neighbors (pantry loading —
    total volume is conserved and chasing the peak overprovisions
    every other day). Anchors pick by integer count with
    earlier-day ties; truncated windows average over the anchors
    that exist (n_anchors says how many); exact integer sums
    throughout."""
    return _epoch_profile(sf_dir, top=True)


@register("superposed_epoch_trough_days",
          sql="WITH " + _EPOCH_SQL_TMPL.format(dirn="ASC"))
def superposed_epoch_trough_days(sf_dir: str) -> pd.DataFrame:
    """The same alignment around the 5 QUIETEST days — the
    asymmetry read: if peak shoulders are broad but trough
    shoulders are sharp, busy periods are regimes while outages/
    holidays are point events (retry traffic returns immediately,
    so post-trough catch-up capacity matters more than
    pre-trough); troughs with elevated +1 ratios quantify that
    rebound directly. Identical machinery, ascending anchor
    pick."""
    return _epoch_profile(sf_dir, top=False)


# ---------------------------------------------------------------------------
# Graded ranking metrics for vector retrieval: nDCG@10 + ERR@10 with
# label-match relevance (the 20 smallest vec_ids as the query set)
# ---------------------------------------------------------------------------

#: per-(query, rank<=10) retrieved rows with binary label relevance —
#: 9dp-rounded cosine, vec_id ties, self excluded.
_RANKEVAL_SQL = """
q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlab,
             CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings ORDER BY vec_id LIMIT 20),
s AS (SELECT q.qid, q.qlab, e.vec_id,
             CAST(e.label AS BIGINT) AS lab,
             ROUND(list_cosine_similarity(q.qe,
                   CAST(e.embedding AS DOUBLE[])), 9) AS cos
      FROM q JOIN embeddings e ON e.vec_id != q.qid),
r AS (SELECT qid, qlab, vec_id, lab,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rk
      FROM s),
t AS (SELECT qid, rk,
             CASE WHEN lab = qlab THEN 1 ELSE 0 END AS rel
      FROM r WHERE rk <= 10),
nrel AS (SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS nr
         FROM q JOIN embeddings e
           ON e.vec_id != q.qid
          AND CAST(e.label AS BIGINT) = q.qlab
         GROUP BY q.qid)"""


@register("ndcg_at10_knn_labels", sql=f"""
WITH {_RANKEVAL_SQL},
dcg AS (SELECT qid,
               SUM(rel / (LN(rk + 1.0) / LN(2.0))) AS dcg,
               CAST(SUM(rel) AS BIGINT) AS hits
        FROM t GROUP BY 1),
idcg AS (SELECT nrel.qid,
                SUM(1.0 / (LN(k.k + 1.0) / LN(2.0))) AS idcg
         FROM nrel, LATERAL (SELECT UNNEST(generate_series(1,
                             CAST(LEAST(10, nrel.nr) AS BIGINT)))
                             AS k) k
         WHERE nrel.nr > 0 GROUP BY 1),
pq AS (SELECT dcg.qid,
              CASE WHEN idcg.idcg > 0 THEN dcg.dcg / idcg.idcg
                   ELSE 0.0 END AS ndcg,
              dcg.hits
       FROM dcg LEFT JOIN idcg USING (qid))
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(SUM(ndcg) / COUNT(*), 6) AS mean_ndcg10,
       ROUND(CAST(SUM(hits) AS DOUBLE) / (10.0 * COUNT(*)), 6)
           AS mean_precision10
FROM pq""")
def ndcg_at10_knn_labels(sf_dir: str) -> pd.DataFrame:
    """nDCG@10 of brute-force cosine retrieval scored with
    same-label relevance, over the fixed 20-smallest-vec_id query
    set. Precision@10 (printed beside it) treats rank 1 and rank
    10 as equal; nDCG's log discount is what every production
    search ranker is actually optimized against, and the
    IDCG normalization (ideal = min(10, #same-label others) hits
    up top) makes queries with rare labels comparable to ones
    with abundant labels — without it, label-frequency imbalance
    masquerades as ranking quality. Same 9dp-cosine/vec_id-tie
    conventions as the ANN family; per-query partials are tiny
    and the metric folds driver-side."""
    rows = _rankeval_rows(sf_dir)
    rha = textstats.round_half_away
    nd = []
    ph = []
    for qid, (rels, nr) in sorted(rows.items()):
        dcg = sum(r / (np.log(i + 2.0) / np.log(2.0))
                  for i, r in enumerate(rels))
        ideal = min(10, nr)
        idcg = sum(1.0 / (np.log(k + 1.0) / np.log(2.0))
                   for k in range(1, ideal + 1))
        nd.append(dcg / idcg if idcg > 0 else 0.0)
        ph.append(sum(rels))
    return pd.DataFrame({
        "n_queries": np.array([len(nd)], np.int64),
        "mean_ndcg10": [float(rha(sum(nd) / len(nd), 6))],
        "mean_precision10": [float(rha(sum(ph)
                                       / (10.0 * len(nd)), 6))]})


def _rankeval_rows(sf_dir: str):
    """{qid: ([rel at ranks 1..10], n_same_label_others)}."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id",
                                     ignore_index=True)
    qs = df.head(20)
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    lab = df["label"].to_numpy(np.int64)
    vid = df["vec_id"].to_numpy(np.int64)
    out = {}
    for _, qrow in qs.iterrows():
        qv = np.asarray(qrow["embedding"], np.float64)
        qv = qv / np.linalg.norm(qv)
        cos = textstats.round_half_away(Mn @ qv, 9)
        mask = vid != int(qrow["vec_id"])
        order = np.lexsort((vid[mask],
                            -np.asarray(cos)[mask]))
        top = order[:10]
        rels = (lab[mask][top] == int(qrow["label"])) \
            .astype(int).tolist()
        nr = int((lab[mask] == int(qrow["label"])).sum())
        out[int(qrow["vec_id"])] = (rels, nr)
    return out


@register("err_at10_knn_labels", sql=f"""
WITH {_RANKEVAL_SQL},
c AS (SELECT qid, rk, rel,
             COALESCE(SUM(rel) OVER (PARTITION BY qid ORDER BY rk
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS prior
      FROM t),
e1 AS (SELECT qid,
              SUM(rel * 0.5 * POWER(0.5, prior) / rk) AS err,
              COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0)
                  AS frank
       FROM c GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(SUM(err) / COUNT(*), 6) AS mean_err10,
       ROUND(SUM(CASE WHEN frank > 0 THEN 1.0 / frank
                      ELSE 0.0 END) / COUNT(*), 6) AS mean_rr10
FROM e1""")
def err_at10_knn_labels(sf_dir: str) -> pd.DataFrame:
    """Expected reciprocal rank @10 on the same retrieval: the
    cascade-model metric (Chapelle 2009) where a user scans down
    and stops at each relevant hit with probability R (binary
    relevance → R = ½), so ERR = Σ (1/i)·R·(1−R)^{#rel above}.
    The cascade discount is the behavioral one nDCG's log is not:
    a second relevant hit below a first is worth little because
    the user already left — which is exactly the redundancy
    story [[topk_intralist_diversity]] measures geometrically,
    here measured behaviorally. mean_rr10 (reciprocal rank of the
    first hit, 0 when none in top-10) is the degenerate cascade
    for comparison. Same rows; prior-relevance exponent is an
    integer window count."""
    rows = _rankeval_rows(sf_dir)
    rha = textstats.round_half_away
    errs = []
    rrs = []
    for qid, (rels, nr) in sorted(rows.items()):
        prior = 0
        err = 0.0
        frank = 0
        for i, r in enumerate(rels, start=1):
            if r:
                err += (1.0 / i) * 0.5 * (0.5 ** prior)
                if frank == 0:
                    frank = i
                prior += 1
        errs.append(err)
        rrs.append(1.0 / frank if frank else 0.0)
    return pd.DataFrame({
        "n_queries": np.array([len(errs)], np.int64),
        "mean_err10": [float(rha(sum(errs) / len(errs), 6))],
        "mean_rr10": [float(rha(sum(rrs) / len(rrs), 6))]})


# ---------------------------------------------------------------------------
# Risk pooling across brand demands (the portfolio effect inventory
# centralization banks on)
# ---------------------------------------------------------------------------

#: per-(brand, day) qty-cents with per-brand and pooled variance
#: moments over the full shipping calendar (zeros free), all exact.
_POOL_SQL = """
pb AS (SELECT p_partkey, p_brand FROM part),
d AS (SELECT pb.p_brand AS brand,
             epoch_us(l_shipdate) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS qc
      FROM lineitem JOIN pb ON l_partkey = p_partkey
      GROUP BY 1, 2),
sp AS (SELECT MAX(day) - MIN(day) + 1 AS dd
       FROM (SELECT epoch_us(l_shipdate) // 86400000000 AS day
             FROM lineitem)),
bm AS (SELECT brand,
              CAST(SUM(qc) AS HUGEINT) AS s1,
              CAST(SUM(CAST(qc AS HUGEINT) * qc) AS HUGEINT) AS s2
       FROM d GROUP BY 1),
pool AS (SELECT day, CAST(SUM(qc) AS BIGINT) AS qc
         FROM d GROUP BY 1),
pm AS (SELECT CAST(SUM(qc) AS HUGEINT) AS s1,
              CAST(SUM(CAST(qc AS HUGEINT) * qc) AS HUGEINT) AS s2
       FROM pool),
sig AS (SELECT
    (SELECT SUM(SQRT(CAST(sp.dd * bm.s2 - bm.s1 * bm.s1
                          AS DOUBLE)
                     / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0))))
     FROM bm, sp) AS sum_sigma,
    (SELECT SUM(CAST(sp.dd * bm.s2 - bm.s1 * bm.s1 AS DOUBLE)
                / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0)))
     FROM bm, sp) AS sum_var,
    (SELECT SQRT(CAST(sp.dd * pm.s2 - pm.s1 * pm.s1 AS DOUBLE)
                 / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0)))
     FROM pm, sp) AS sigma_pool,
    (SELECT CAST(sp.dd * pm.s2 - pm.s1 * pm.s1 AS DOUBLE)
            / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0))
     FROM pm, sp) AS var_pool,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM bm) AS k)"""


@register("risk_pooling_brands", sql=f"""
WITH {_POOL_SQL}
SELECT k AS n_brands,
       ROUND(sum_sigma / 100.0, 6) AS sum_brand_sigma,
       ROUND(sigma_pool / 100.0, 6) AS pooled_sigma,
       ROUND(sum_sigma / sigma_pool, 6) AS pooling_factor,
       ROUND((1.0 - sigma_pool / sum_sigma) * 100.0, 6)
           AS safety_stock_reduction_pct,
       ROUND((var_pool - sum_var) / (sum_sigma * sum_sigma
                                     - sum_var), 6)
           AS implied_avg_correlation
FROM sig""")
def risk_pooling_brands(sf_dir: str) -> pd.DataFrame:
    """The risk-pooling (portfolio) effect across brand demands:
    Σσ_brand vs σ(pooled demand). Centralizing inventory holds
    safety stock against the POOLED σ, so
    safety_stock_reduction_pct is the direct payoff of one
    warehouse over per-brand stocking (√k for independent equal
    brands), and implied_avg_correlation — solved exactly from
    σ²_pool = Σσ² + ρ·(（Σσ)²−Σσ²) — is the number that says how
    much of the theoretical √k benefit demand co-movement
    (seasonality, promotions) claws back: ρ → 1 kills pooling
    entirely, the [[bullwhip_qty_ratio]] mechanism seen from the
    variance side. All variances are the exact dd·Σx²−(Σx)²
    integer form over the shared shipping calendar (zero days
    free); sums over 25 brand scalars close it."""
    bm, (ps1, ps2), dd = _pool_moments(sf_dir)
    sig = [float(np.sqrt(float(dd * s2 - s1 * s1)
                         / (float(dd) * (dd - 1.0))))
           for s1, s2 in bm]
    var = [float(dd * s2 - s1 * s1) / (float(dd) * (dd - 1.0))
           for s1, s2 in bm]
    sum_sigma = float(sum(sig))
    sum_var = float(sum(var))
    var_pool = float(dd * ps2 - ps1 * ps1) \
        / (float(dd) * (dd - 1.0))
    sigma_pool = float(np.sqrt(var_pool))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_brands": np.array([len(bm)], np.int64),
        "sum_brand_sigma": [float(rha(sum_sigma / 100.0, 6))],
        "pooled_sigma": [float(rha(sigma_pool / 100.0, 6))],
        "pooling_factor": [float(rha(sum_sigma / sigma_pool, 6))],
        "safety_stock_reduction_pct": [
            float(rha((1.0 - sigma_pool / sum_sigma) * 100.0,
                      6))],
        "implied_avg_correlation": [
            float(rha((var_pool - sum_var)
                      / (sum_sigma * sum_sigma - sum_var), 6))]})


def _pool_moments(sf_dir: str):
    """([(s1, s2) per brand], (s1, s2) pooled, day span)."""
    pb = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = ray.put(dict(zip(pb["p_partkey"].to_numpy(np.int64),
                                pb["p_brand"])))

    def day_demand(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).to_numpy(),
            "day": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "qc": np.rint(df["l_quantity"].to_numpy(np.float64)
                          * 100).astype(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])
    d = reduce_sink(li.map_batches(day_demand,
                                   batch_format="pandas"),
                    ["brand", "day"], {"qc": ("qc", "sum")}) \
        .to_pandas()
    dd = int(d["day"].max()) - int(d["day"].min()) + 1
    bm = []
    for b, g in d.groupby("brand"):
        qc = g["qc"].to_numpy(np.int64).astype(object)
        bm.append((int(qc.sum()), int((qc * qc).sum())))
    pool = d.groupby("day")["qc"].sum()
    pq_ = pool.to_numpy(np.int64).astype(object)
    return bm, (int(pq_.sum()), int((pq_ * pq_).sum())), dd


@register("pooling_curve_by_k", sql=f"""
WITH {_POOL_SQL},
bs AS (SELECT brand,
              SQRT(CAST(sp.dd * bm.s2 - bm.s1 * bm.s1 AS DOUBLE)
                   / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0)))
                  AS sigma,
              ROW_NUMBER() OVER (ORDER BY brand) AS rn
       FROM bm, sp),
ks AS (SELECT UNNEST([5, 10, 25]) AS kk),
sub AS (SELECT ks.kk, bs.brand FROM ks JOIN bs ON bs.rn <= ks.kk),
pv AS (SELECT sub.kk, d.day, CAST(SUM(d.qc) AS BIGINT) AS qc
       FROM sub JOIN d ON d.brand = sub.brand
       GROUP BY 1, 2),
pm2 AS (SELECT kk, CAST(SUM(qc) AS HUGEINT) AS s1,
               CAST(SUM(CAST(qc AS HUGEINT) * qc) AS HUGEINT)
                   AS s2
        FROM pv GROUP BY 1),
ss AS (SELECT ks.kk, SUM(bs.sigma) AS sum_sigma
       FROM ks JOIN bs ON bs.rn <= ks.kk GROUP BY 1)
SELECT CAST(pm2.kk AS BIGINT) AS k_brands,
       ROUND(ss.sum_sigma
             / SQRT(CAST(sp.dd * pm2.s2 - pm2.s1 * pm2.s1
                         AS DOUBLE)
                    / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0))), 6)
           AS pooling_factor,
       ROUND(SQRT(CAST(pm2.kk AS DOUBLE)), 6) AS iid_bound
FROM pm2 JOIN ss ON pm2.kk = ss.kk, sp ORDER BY 1""")
def pooling_curve_by_k(sf_dir: str) -> pd.DataFrame:
    """The pooling-factor CURVE at k = 5, 10, 25 brands
    (alphabetically first k — fixed, documented), each against its
    iid upper bound √k. The gap between the curve and √k is the
    empirical diversification ceiling: if the factor saturates by
    k=10, consolidating beyond ten brands buys nothing and the
    warehouse-count decision has its answer; tracking the curve
    vs √k is exactly how a portfolio manager reads diversification
    benefit, transplanted to demand. Same exact per-brand/pooled
    variance machinery restricted to nested brand prefixes."""
    pb = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = ray.put(dict(zip(pb["p_partkey"].to_numpy(np.int64),
                                pb["p_brand"])))

    def day_demand(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).to_numpy(),
            "day": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "qc": np.rint(df["l_quantity"].to_numpy(np.float64)
                          * 100).astype(np.int64)})

    d = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_quantity"])
        .map_batches(day_demand, batch_format="pandas"),
        ["brand", "day"], {"qc": ("qc", "sum")}).to_pandas()
    dd = int(d["day"].max()) - int(d["day"].min()) + 1
    brands = sorted(d["brand"].unique())
    sig = {}
    for b, g in d.groupby("brand"):
        qc = g["qc"].to_numpy(np.int64).astype(object)
        s1, s2 = int(qc.sum()), int((qc * qc).sum())
        sig[b] = float(np.sqrt(float(dd * s2 - s1 * s1)
                               / (float(dd) * (dd - 1.0))))
    rha = textstats.round_half_away
    rows = []
    for k in (5, 10, 25):
        sub = set(brands[:k])
        pool = d[d["brand"].isin(sub)].groupby("day")["qc"].sum()
        pv = pool.to_numpy(np.int64).astype(object)
        s1, s2 = int(pv.sum()), int((pv * pv).sum())
        sp_ = float(np.sqrt(float(dd * s2 - s1 * s1)
                            / (float(dd) * (dd - 1.0))))
        ssum = float(sum(sig[b] for b in brands[:k]))
        rows.append((k, float(rha(ssum / sp_, 6)),
                     float(rha(np.sqrt(float(k)), 6))))
    return pd.DataFrame(rows, columns=[
        "k_brands", "pooling_factor", "iid_bound"]) \
        .astype({"k_brands": np.int64})


# ---------------------------------------------------------------------------
# Weekday-composition (trading-day) adjustment: month revenue and the
# daily event mean re-weighted to a balanced week
# ---------------------------------------------------------------------------

@register("dow_adjusted_monthly_revenue", sql="""
WITH li AS (SELECT epoch_us(l_shipdate) // 86400000000 AS d,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS cents
            FROM lineitem),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM li),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d,
             strftime(DATE '1970-01-01' + cal.d * INTERVAL 1 DAY,
                      '%Y-%m') AS m,
             (cal.d + 4) % 7 AS dow,
             CAST(COALESCE(SUM(li.cents), 0) AS BIGINT) AS rev
      FROM cal LEFT JOIN li ON li.d = cal.d
      GROUP BY 1, 2, 3),
md AS (SELECT m, dow, CAST(COUNT(*) AS BIGINT) AS nd,
              CAST(SUM(rev) AS BIGINT) AS rev
       FROM g GROUP BY 1, 2),
mm AS (SELECT m, CAST(SUM(nd) AS BIGINT) AS days,
              CAST(SUM(rev) AS BIGINT) AS rev,
              SUM(CAST(rev AS DOUBLE) / nd) / 7.0 AS adj
       FROM md GROUP BY 1)
SELECT m AS month, days,
       ROUND(CAST(rev AS DOUBLE) / days / 100.0, 6)
           AS raw_daily_mean,
       ROUND(adj / 100.0, 6) AS dow_adjusted_mean,
       ROUND((CAST(rev AS DOUBLE) / days - adj) / adj * 100.0, 6)
           AS composition_bias_pct
FROM mm ORDER BY m""")
def dow_adjusted_monthly_revenue(sf_dir: str) -> pd.DataFrame:
    """Trading-day adjustment of monthly revenue: each month's raw
    mean daily revenue beside the weekday-BALANCED mean (average
    of the month's seven per-dow daily means). A 31-day month
    with five Fridays mechanically out-earns one with four, and
    composition_bias_pct is exactly that artifact — the ±1-5%
    month-over-month wiggle finance dashboards routinely narrate
    as demand when it is calendar arithmetic. This is the X-11
    trading-day correction reduced to its identifiable core,
    computed exactly: day spine zero-filled over the global span
    (partial edge months keep their observed days — documented),
    per-(month, dow) integer revenue sums, and the adjustment is
    seven divisions per month."""
    d = _lineitem_day_rev(sf_dir)
    lo, hi = int(d["d"].min()), int(d["d"].max())
    cal = pd.DataFrame({"d": np.arange(lo, hi + 1,
                                       dtype=np.int64)})
    g = cal.merge(d, on="d", how="left").fillna(0)
    g["rev"] = g["rev"].astype(np.int64)
    dt = pd.to_datetime(g["d"], unit="D")
    g["m"] = dt.dt.strftime("%Y-%m")
    g["dow"] = (g["d"] + 4) % 7
    md = g.groupby(["m", "dow"], as_index=False).agg(
        nd=("rev", "size"), rev=("rev", "sum"))
    rha = textstats.round_half_away
    rows = []
    for m, mg in md.groupby("m"):
        days = int(mg["nd"].sum())
        rev = int(mg["rev"].sum())
        raw = float(rev) / days
        adj = float(sum(float(int(r)) / int(n)
                        for r, n in zip(mg["rev"], mg["nd"]))) \
            / 7.0
        rows.append((m, days, float(rha(raw / 100.0, 6)),
                     float(rha(adj / 100.0, 6)),
                     float(rha((raw - adj) / adj * 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "month", "days", "raw_daily_mean", "dow_adjusted_mean",
        "composition_bias_pct"]).astype({"days": np.int64}) \
        .sort_values("month", ignore_index=True)


def _lineitem_day_rev(sf_dir: str) -> pd.DataFrame:
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "d": df["l_shipdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "rev": np.rint(df["l_extendedprice"]
                           .to_numpy(np.float64) * 100)
            .astype(np.int64)})

    return reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_shipdate",
                                 "l_extendedprice"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"rev": ("rev", "sum")}).to_pandas()


@register("dow_adjusted_event_mean", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d, (cal.d + 4) % 7 AS dow,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN e ON e.d = cal.d),
dw AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
              CAST(SUM(x) AS BIGINT) AS s
       FROM g GROUP BY 1),
f AS (SELECT CAST(SUM(nd) AS BIGINT) AS days,
             CAST(SUM(s) AS BIGINT) AS tot,
             SUM(CAST(s AS DOUBLE) / nd) / 7.0 AS adj,
             CAST(MAX(nd) AS BIGINT) AS nd_max,
             CAST(MIN(nd) AS BIGINT) AS nd_min
      FROM dw)
SELECT days, ROUND(CAST(tot AS DOUBLE) / days, 6) AS raw_mean,
       ROUND(adj, 6) AS dow_adjusted_mean,
       ROUND((CAST(tot AS DOUBLE) / days - adj) / adj * 100.0, 6)
           AS composition_bias_pct,
       nd_max, nd_min
FROM f""")
def dow_adjusted_event_mean(sf_dir: str) -> pd.DataFrame:
    """The same correction for the event window itself: the raw
    mean daily event count vs the weekday-balanced mean over the
    whole span, with the dow-count imbalance (nd_max vs nd_min)
    that drives the gap. Any span that isn't a whole number of
    weeks over-represents some weekdays — a 30-day window carries
    5 of two weekdays and 4 of five — and every 'average daily
    events' number in the registry inherits that tilt;
    composition_bias_pct prices it and the balanced mean is the
    comparable-across-windows replacement. Exact integer per-dow
    sums; seven divisions."""
    x = _daily_counts_vec(sf_dir)
    lo = _seg_lo(sf_dir)
    d = np.arange(lo, lo + len(x), dtype=np.int64)
    dow = (d + 4) % 7
    rha = textstats.round_half_away
    nd = np.array([(dow == k).sum() for k in range(7)],
                  np.int64)
    s = np.array([int(x[dow == k].sum()) for k in range(7)],
                 np.int64)
    days = int(nd.sum())
    tot = int(s.sum())
    raw = float(tot) / days
    adj = float(sum(float(int(si)) / int(ni)
                    for si, ni in zip(s, nd))) / 7.0
    return pd.DataFrame({
        "days": np.array([days], np.int64),
        "raw_mean": [float(rha(raw, 6))],
        "dow_adjusted_mean": [float(rha(adj, 6))],
        "composition_bias_pct": [float(rha((raw - adj) / adj
                                           * 100.0, 6))],
        "nd_max": np.array([int(nd.max())], np.int64),
        "nd_min": np.array([int(nd.min())], np.int64)})


# ---------------------------------------------------------------------------
# Cointegration: Engle–Granger two-step + error-correction model on
# daily views/purchases
# ---------------------------------------------------------------------------

#: zero-filled daily (i, x=views, y=purchases) + the cointegrating
#: OLS y ~ a + b·x from exact integer moments, residuals as shared
#: float expressions per day.
_COINT_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS i,
             COALESCE(e.v, 0) AS v, COALESCE(e.y, 0) AS y
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(v) AS HUGEINT) AS sv,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(v * v) AS HUGEINT) AS svv,
              CAST(SUM(y * y) AS HUGEINT) AS syy,
              CAST(SUM(v * y) AS HUGEINT) AS svy
       FROM g),
fit AS (SELECT CAST(n AS BIGINT) AS n,
               CAST(n * svy - sv * sy AS DOUBLE)
                   / CAST(n * svv - sv * sv AS DOUBLE) AS b,
               CAST(sy AS DOUBLE) / n
               - (CAST(n * svy - sv * sy AS DOUBLE)
                  / CAST(n * svv - sv * sv AS DOUBLE))
                 * (CAST(sv AS DOUBLE) / n) AS a,
               CAST(n * svy - sv * sy AS DOUBLE)
               * CAST(n * svy - sv * sy AS DOUBLE)
               / (CAST(n * svv - sv * sv AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        FROM mo),
res AS (SELECT g.i, g.v, g.y,
               g.y - fit.a - fit.b * g.v AS r
        FROM g, fit)"""


@register("engle_granger_views_purchases", sql=f"""
WITH {_COINT_SQL},
dr AS (SELECT a.r AS e0, b.r - a.r AS de
       FROM res a JOIN res b ON b.i = a.i + 1),
eg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              SUM(e0 * de) / SUM(e0 * e0) AS beta,
              SUM(e0 * e0) AS se2
       FROM dr),
ss AS (SELECT eg.m, eg.beta, eg.se2,
              SUM((dr.de - eg.beta * dr.e0)
                  * (dr.de - eg.beta * dr.e0)) / (eg.m - 1.0)
                  AS s2
       FROM dr, eg GROUP BY 1, 2, 3)
SELECT (SELECT n FROM fit) AS n_days,
       ROUND((SELECT b FROM fit), 6) AS coint_beta,
       ROUND((SELECT r2 FROM fit), 6) AS coint_r2,
       ROUND(beta / SQRT(s2 / se2), 6) AS eg_tstat,
       CAST(CASE WHEN beta / SQRT(s2 / se2) < -3.37
                 THEN 1 ELSE 0 END AS BIGINT) AS cointegrated
FROM ss""")
def engle_granger_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Engle–Granger two-step cointegration test between daily
    views and purchases: OLS the levels, then Dickey–Fuller the
    residuals (no constant — residuals are mean-zero by
    construction) against the −3.37 EG 5% point for two variables
    (documented asymptotic; the plain DF point would be too
    lenient because the residuals were FITTED to look
    stationary). Levels correlation between trending series is
    the textbook spurious-regression trap — this is the test
    that separates 'both grew' from 'tethered together', and
    only in the tethered case does the levels ratio mean
    anything. Cointegrating slope and R² from exact integer
    moments; residual products are shared float expressions;
    reads with [[adf_daily]]/[[kpss_level_daily]] which
    establish the I(1)-ness this test presumes."""
    g = _dayvec_vy(sf_dir)
    n = len(g)
    v = g["v"].to_numpy(np.int64).astype(object)
    y = g["y"].to_numpy(np.int64).astype(object)
    sv, sy = int(v.sum()), int(y.sum())
    svv, syy = int((v * v).sum()), int((y * y).sum())
    svy = int((v * y).sum())
    b = float(n * svy - sv * sy) / float(n * svv - sv * sv)
    a = float(sy) / n - b * (float(sv) / n)
    r2 = float(n * svy - sv * sy) ** 2 \
        / (float(n * svv - sv * sv) * float(n * syy - sy * sy))
    r = g["y"].to_numpy(np.float64) - a \
        - b * g["v"].to_numpy(np.float64)
    e0 = r[:-1]
    de = r[1:] - r[:-1]
    m = len(e0)
    beta = float((e0 * de).sum()) / float((e0 * e0).sum())
    s2 = float(((de - beta * e0) * (de - beta * e0)).sum()) \
        / (m - 1.0)
    t = beta / np.sqrt(s2 / float((e0 * e0).sum()))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "coint_beta": [float(rha(b, 6))],
        "coint_r2": [float(rha(r2, 6))],
        "eg_tstat": [float(rha(t, 6))],
        "cointegrated": np.array([1 if t < -3.37 else 0],
                                 np.int64)})


@register("ecm_views_purchases", sql=f"""
WITH {_COINT_SQL},
dd AS (SELECT b.y - a.y AS dy, b.v - a.v AS dx, a.r AS ec
       FROM res a JOIN res b ON b.i = a.i + 1),
m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              SUM(dx) AS s1, SUM(ec) AS s2, SUM(dy) AS sy,
              SUM(dx * dx) AS s11, SUM(dx * ec) AS s12,
              SUM(ec * ec) AS s22,
              SUM(dx * dy) AS s1y, SUM(ec * dy) AS s2y
       FROM dd),
ce AS (SELECT m,
              (m * s11 - s1 * s1) AS c11,
              (m * s12 - s1 * s2) AS c12,
              (m * s22 - s2 * s2) AS c22,
              (m * s1y - s1 * sy) AS c1y,
              (m * s2y - s2 * sy) AS c2y,
              (m * SUM_DY_SQ - sy * sy) AS cyy
       FROM (SELECT m2.*, (SELECT SUM(dy * dy) FROM dd)
                     AS SUM_DY_SQ
             FROM m2)),
sol AS (SELECT m,
               (c1y * c22 - c2y * c12)
                   / (c11 * c22 - c12 * c12) AS gamma,
               (c2y * c11 - c1y * c12)
                   / (c11 * c22 - c12 * c12) AS alpha,
               ((c1y * c22 - c2y * c12) * c1y
                + (c2y * c11 - c1y * c12) * c2y)
               / ((c11 * c22 - c12 * c12) * cyy) AS r2
        FROM ce)
SELECT m AS n_obs, ROUND(alpha, 6) AS alpha_adjust,
       ROUND(gamma, 6) AS gamma_shortrun,
       ROUND(r2, 6) AS r2,
       ROUND(CASE WHEN alpha > -1 AND alpha < 0
                  THEN LN(0.5) / LN(1.0 + alpha) ELSE 0 END, 6)
           AS halflife_days
FROM sol""")
def ecm_views_purchases(sf_dir: str) -> pd.DataFrame:
    """The error-correction model the Granger representation
    theorem promises whenever cointegration holds:
    Δpurchases = c + γ·Δviews + α·ec_{t−1}. γ is the SHORT-RUN
    pass-through (today's extra views → today's extra purchases);
    α is the speed at which deviations from the long-run levels
    relationship die — α ∈ (−1, 0) with halflife ln½/ln(1+α) is
    the number that says how long a purchase shortfall persists
    before the relationship pulls it back, and α ≈ 0 despite a
    'cointegrated' verdict means the correction is too slow to
    matter operationally. Two-regressor OLS in closed form
    (centered 2×2 cross-moments, one determinant); residual
    series shared with [[engle_granger_views_purchases]]."""
    g = _dayvec_vy(sf_dir)
    n = len(g)
    v = g["v"].to_numpy(np.int64).astype(object)
    y = g["y"].to_numpy(np.int64).astype(object)
    sv, sy = int(v.sum()), int(y.sum())
    svv = int((v * v).sum())
    svy = int((v * y).sum())
    b = float(n * svy - sv * sy) / float(n * svv - sv * sv)
    a = float(sy) / n - b * (float(sv) / n)
    r = g["y"].to_numpy(np.float64) - a \
        - b * g["v"].to_numpy(np.float64)
    dy = np.diff(g["y"].to_numpy(np.float64))
    dx = np.diff(g["v"].to_numpy(np.float64))
    ec = r[:-1]
    m = len(dy)
    s1, s2, syv = float(dx.sum()), float(ec.sum()), float(dy.sum())
    c11 = m * float((dx * dx).sum()) - s1 * s1
    c12 = m * float((dx * ec).sum()) - s1 * s2
    c22 = m * float((ec * ec).sum()) - s2 * s2
    c1y = m * float((dx * dy).sum()) - s1 * syv
    c2y = m * float((ec * dy).sum()) - s2 * syv
    cyy = m * float((dy * dy).sum()) - syv * syv
    det = c11 * c22 - c12 * c12
    gamma = (c1y * c22 - c2y * c12) / det
    alpha = (c2y * c11 - c1y * c12) / det
    r2 = ((c1y * c22 - c2y * c12) * c1y
          + (c2y * c11 - c1y * c12) * c2y) / (det * cyy)
    rha = textstats.round_half_away
    hl = float(np.log(0.5) / np.log(1.0 + alpha)) \
        if -1 < alpha < 0 else 0.0
    return pd.DataFrame({
        "n_obs": np.array([m], np.int64),
        "alpha_adjust": [float(rha(alpha, 6))],
        "gamma_shortrun": [float(rha(gamma, 6))],
        "r2": [float(rha(r2, 6))],
        "halflife_days": [float(rha(hl, 6))]})


# ---------------------------------------------------------------------------
# Threshold autoregression: SETAR(2) regime persistence + threshold
# scan on the daily series
# ---------------------------------------------------------------------------

#: lagged pairs (x = y_{t-1}, y = y_t) over the zero-filled calendar,
#: with per-regime exact integer moments given a threshold.
_SETAR_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS i,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
pr AS (SELECT a.x AS x0, b.x AS y1
       FROM g a JOIN g b ON b.i = a.i + 1)"""


def _setar_pairs(sf_dir: str):
    x = _daily_counts_vec(sf_dir)
    return x[:-1].astype(np.int64), x[1:].astype(np.int64)


def _ar_sse(x0, y1):
    """(sse, slope, n) of y1 ~ a + b*x0 from exact integer moments;
    zero-variance regimes return slope 0 and SSE = Syy/n-centered."""
    n = len(x0)
    xo = x0.astype(object)
    yo = y1.astype(object)
    sx, sy = int(xo.sum()), int(yo.sum())
    sxx = int((xo * xo).sum())
    syy = int((yo * yo).sum())
    sxy = int((xo * yo).sum())
    cxx = float(n * sxx - sx * sx)
    cyy = float(n * syy - sy * sy)
    cxy = float(n * sxy - sx * sy)
    if cxx == 0:
        return cyy / n, 0.0, n
    return (cyy - cxy * cxy / cxx) / n, cxy / cxx, n


@register("setar2_daily", sql=f"""
WITH {_SETAR_SQL},
hh AS (SELECT x0, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM pr GROUP BY 1),
th AS (SELECT MIN(x0) AS tau FROM
       (SELECT x0, SUM(cnt) OVER (ORDER BY x0) AS cm,
               (SELECT SUM(cnt) FROM hh) AS m
        FROM hh)
       WHERE 2 * cm >= m),
rg AS (SELECT CASE WHEN pr.x0 <= th.tau THEN 0 ELSE 1 END AS r,
              pr.x0, pr.y1
       FROM pr, th),
mo AS (SELECT r, CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x0) AS HUGEINT) AS sx,
              CAST(SUM(y1) AS HUGEINT) AS sy,
              CAST(SUM(x0 * x0) AS HUGEINT) AS sxx,
              CAST(SUM(y1 * y1) AS HUGEINT) AS syy,
              CAST(SUM(x0 * y1) AS HUGEINT) AS sxy
       FROM rg GROUP BY 1),
fits AS (SELECT r, CAST(n AS BIGINT) AS n,
                CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                     ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE)
                END AS b,
                CASE WHEN n * sxx - sx * sx = 0
                     THEN CAST(n * syy - sy * sy AS DOUBLE)
                          / CAST(n AS DOUBLE) / n
                     ELSE (CAST(n * syy - sy * sy AS DOUBLE)
                           - CAST(n * sxy - sx * sy AS DOUBLE)
                             * CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE))
                          / CAST(n AS DOUBLE)
                END AS sse
         FROM mo),
pool AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(x0) AS HUGEINT) AS sx,
                CAST(SUM(y1) AS HUGEINT) AS sy,
                CAST(SUM(x0 * x0) AS HUGEINT) AS sxx,
                CAST(SUM(y1 * y1) AS HUGEINT) AS syy,
                CAST(SUM(x0 * y1) AS HUGEINT) AS sxy
         FROM pr),
pf AS (SELECT (CAST(n * syy - sy * sy AS DOUBLE)
               - CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
              / CAST(n AS DOUBLE) AS sse,
              CAST(n AS BIGINT) AS m
       FROM pool),
fin AS (SELECT (SELECT tau FROM th) AS tau,
               (SELECT n FROM fits WHERE r = 0) AS n_low,
               (SELECT n FROM fits WHERE r = 1) AS n_high,
               (SELECT b FROM fits WHERE r = 0) AS b_low,
               (SELECT b FROM fits WHERE r = 1) AS b_high,
               (SELECT SUM(sse) FROM fits) AS sse_split,
               (SELECT sse FROM pf) AS sse_pool,
               (SELECT m FROM pf) AS m)
SELECT CAST(tau AS BIGINT) AS tau, CAST(n_low AS BIGINT)
           AS n_low,
       CAST(n_high AS BIGINT) AS n_high,
       ROUND(b_low, 6) AS b_low, ROUND(b_high, 6) AS b_high,
       ROUND((sse_pool - sse_split)
             / (sse_split / (m - 4.0)), 6) AS lr_stat,
       CAST(CASE WHEN (sse_pool - sse_split)
                      / (sse_split / (m - 4.0)) > 5.991465
                 THEN 1 ELSE 0 END AS BIGINT)
           AS nonlinear_rejected
FROM fin""")
def setar2_daily(sf_dir: str) -> pd.DataFrame:
    """SETAR(2): a separate AR(1) below and above the lagged-value
    median. [[ar1_daily_forecast]] fits ONE persistence
    coefficient; threshold autoregression asks whether quiet days
    and busy days even obey the same dynamics — b_high ≫ b_low is
    momentum that only exists under load (congestion/retry
    feedback: busy days self-perpetuate, so provisioning must
    plan on runs, not draws), while b_low ≈ b_high retires the
    regime story with one number. The regime split is the exact
    lower median of the lagged values; per-regime fits are exact
    integer-moment closed forms; the comparison statistic
    (SSE_pool − SSE_split)/(SSE_split/(m−4)) is read against the
    χ²₂ 5% point (documented asymptotic — 2 extra parameters).
    SSEs here are per-observation normalized, identical both
    engines."""
    x0, y1 = _setar_pairs(sf_dir)
    m = len(x0)
    srt = np.sort(x0)
    tau = int(srt[(m + 1) // 2 - 1])
    lo = x0 <= tau
    sse_l, b_l, n_l = _ar_sse(x0[lo], y1[lo])
    sse_h, b_h, n_h = _ar_sse(x0[~lo], y1[~lo])
    sse_p, _, _ = _ar_sse(x0, y1)
    lr = (sse_p - (sse_l + sse_h)) \
        / ((sse_l + sse_h) / (m - 4.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "tau": np.array([tau], np.int64),
        "n_low": np.array([n_l], np.int64),
        "n_high": np.array([n_h], np.int64),
        "b_low": [float(rha(b_l, 6))],
        "b_high": [float(rha(b_h, 6))],
        "lr_stat": [float(rha(lr, 6))],
        "nonlinear_rejected": np.array(
            [1 if lr > 5.991465 else 0], np.int64)})


@register("tar_threshold_scan_daily", sql=f"""
WITH {_SETAR_SQL},
hh AS (SELECT x0, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM pr GROUP BY 1),
qs AS (SELECT CAST(UNNEST(generate_series(1, 9)) AS BIGINT)
           AS q),
taus AS (SELECT qs.q,
                (SELECT MIN(x0) FROM
                 (SELECT x0, SUM(cnt) OVER (ORDER BY x0) AS cm,
                         (SELECT SUM(cnt) FROM hh) AS m
                  FROM hh)
                 WHERE 10 * cm >= qs.q * m) AS tau
         FROM qs),
sc AS (SELECT taus.q, taus.tau,
              CASE WHEN pr.x0 <= taus.tau THEN 0 ELSE 1 END AS r,
              pr.x0, pr.y1
       FROM pr CROSS JOIN taus),
mo AS (SELECT q, tau, r, CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x0) AS HUGEINT) AS sx,
              CAST(SUM(y1) AS HUGEINT) AS sy,
              CAST(SUM(x0 * x0) AS HUGEINT) AS sxx,
              CAST(SUM(y1 * y1) AS HUGEINT) AS syy,
              CAST(SUM(x0 * y1) AS HUGEINT) AS sxy
       FROM sc GROUP BY 1, 2, 3),
fs AS (SELECT q, tau,
              SUM(CASE WHEN n * sxx - sx * sx = 0
                       THEN CAST(n * syy - sy * sy AS DOUBLE)
                            / CAST(n AS DOUBLE) / n
                       ELSE (CAST(n * syy - sy * sy AS DOUBLE)
                             - CAST(n * sxy - sx * sy AS DOUBLE)
                               * CAST(n * sxy - sx * sy
                                      AS DOUBLE)
                               / CAST(n * sxx - sx * sx
                                      AS DOUBLE))
                            / CAST(n AS DOUBLE)
                  END) AS sse,
              CAST(MIN(n) AS BIGINT) AS n_min
       FROM mo GROUP BY 1, 2),
bst AS (SELECT q FROM fs WHERE n_min >= 3
        ORDER BY ROUND(sse, 9), q LIMIT 1)
SELECT q AS decile, CAST(tau AS BIGINT) AS tau,
       CAST(n_min AS BIGINT) AS n_min_regime,
       ROUND(sse, 6) AS sse,
       CAST(CASE WHEN q = (SELECT q FROM bst) THEN 1 ELSE 0 END
            AS BIGINT) AS best
FROM fs ORDER BY q""")
def tar_threshold_scan_daily(sf_dir: str) -> pd.DataFrame:
    """The threshold-location scan behind [[setar2_daily]]: split
    SSE at each decile of the lagged value, best split flagged
    (≥3 obs per regime, SSE rounded 9dp, smaller decile ties).
    Tong's SETAR methodology estimates τ by exactly this grid
    profile, and the CURVE is the diagnosis: a sharp V at one
    decile is a genuine regime boundary (an operational capacity
    cliff at that load level), a flat profile says the median
    split in the main query was arbitrary and the 'regimes' are
    a smooth nonlinearity no threshold model will pin down.
    Same exact per-regime moment machinery, nine candidate
    thresholds."""
    x0, y1 = _setar_pairs(sf_dir)
    m = len(x0)
    srt = np.sort(x0)
    rha = textstats.round_half_away
    rows = []
    for q in range(1, 10):
        # smallest x with 10*cum >= q*m  (cum = rank in sorted)
        idx = int(np.ceil(q * m / 10.0)) - 1
        tau = int(srt[idx])
        lo = x0 <= tau
        if lo.sum() == 0 or (~lo).sum() == 0:
            continue
        sse_l, _, n_l = _ar_sse(x0[lo], y1[lo])
        sse_h, _, n_h = _ar_sse(x0[~lo], y1[~lo])
        rows.append((q, tau, min(n_l, n_h),
                     float(rha(sse_l + sse_h, 9))))
    ok = [r for r in rows if r[2] >= 3]
    best_q = min(ok, key=lambda r: (r[3], r[0]))[0] if ok else -1
    return pd.DataFrame({
        "decile": np.array([r[0] for r in rows], np.int64),
        "tau": np.array([r[1] for r in rows], np.int64),
        "n_min_regime": np.array([r[2] for r in rows], np.int64),
        "sse": [float(rha(r[3], 6)) for r in rows],
        "best": np.array([1 if r[0] == best_q else 0
                          for r in rows], np.int64)})


# ---------------------------------------------------------------------------
# Rousseeuw–Croux Qn robust scale (exact k-th pairwise difference)
# ---------------------------------------------------------------------------

def _qn_from_hist(v: np.ndarray, c: np.ndarray) -> tuple:
    """(qn_raw_int, n, sd, mad_int) from a sorted value histogram.
    Qn raw = k-th smallest pairwise |difference| (k = C(h,2),
    h = n//2+1), found by binary search on integer t with an O(V)
    two-pointer pair count per probe — no pair ever materializes.
    MAD and lower median use the suite's conventions."""
    co = c.astype(object)
    n = int(co.sum())
    cum = np.cumsum(co)
    med = int(v[np.searchsorted(cum, (n + 1) // 2)])
    dev = np.abs(v - med)
    order = np.argsort(dev, kind="mergesort")
    dcum = np.cumsum(co[order])
    mad = int(dev[order][np.searchsorted(dcum, (n + 1) // 2)])
    s1 = int((co * v.astype(object)).sum())
    s2 = int((co * v.astype(object) * v.astype(object)).sum())
    sd = float(np.sqrt(float(n * s2 - s1 * s1)
                       / (float(n) * (n - 1.0))))
    h = n // 2 + 1
    k = h * (h - 1) // 2

    def pairs_le(t: int) -> int:
        tot = 0
        lo = 0
        hi = 0
        for i in range(len(v)):
            while v[i] - v[lo] > t:
                lo += 1
            while hi < len(v) and v[hi] - v[i] <= t:
                hi += 1
            w = int(cum[hi - 1]) - (int(cum[lo - 1]) if lo else 0)
            tot += int(c[i]) * w
        return (tot - n) // 2

    lo_t, hi_t = 0, int(v[-1] - v[0])
    while lo_t < hi_t:
        mid = (lo_t + hi_t) // 2
        if pairs_le(mid) >= k:
            hi_t = mid
        else:
            lo_t = mid + 1
    return lo_t, n, sd, mad


_QN_SQL_TMPL = """
pd AS (SELECT a.{g} AS g, b.c - a.c AS d,
              CAST(a.cnt AS HUGEINT) * b.cnt AS p
       FROM hh a JOIN hh b ON a.{g} = b.{g} AND b.c > a.c
       UNION ALL
       SELECT {g} AS g, 0, CAST(cnt AS HUGEINT) * (cnt - 1) / 2
       FROM hh),
pc AS (SELECT g, d, CAST(SUM(p) AS HUGEINT) AS p
       FROM pd GROUP BY 1, 2),
nn AS (SELECT {g} AS g, CAST(SUM(cnt) AS BIGINT) AS n
       FROM hh GROUP BY 1),
kk AS (SELECT g, n, ((n // 2 + 1) * (n // 2)) / 2 AS k FROM nn),
qn AS (SELECT pc.g, MIN(pc.d) AS qn_raw
       FROM (SELECT g, d, SUM(p) OVER (PARTITION BY g ORDER BY d)
                 AS cm
             FROM pc) pc JOIN kk ON pc.g = kk.g
       WHERE pc.cm >= kk.k GROUP BY 1)"""


@register("qn_scale_value_by_type", sql=f"""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM v GROUP BY 1, 2),
{_QN_SQL_TMPL.format(g="g")},
md AS (SELECT g, MIN(c) AS med FROM
       (SELECT g, c, SUM(cnt) OVER (PARTITION BY g ORDER BY c)
            AS cm,
               SUM(cnt) OVER (PARTITION BY g) AS n
        FROM hh)
       WHERE 2 * cm >= n GROUP BY 1),
ad AS (SELECT hh.g, ABS(hh.c - md.med) AS dev, hh.cnt
       FROM hh JOIN md USING (g)),
mad AS (SELECT g, MIN(dev) AS mad FROM
        (SELECT g, dev, SUM(cnt) OVER (PARTITION BY g ORDER BY dev)
             AS cm,
                SUM(cnt) OVER (PARTITION BY g) AS n
         FROM (SELECT g, dev, CAST(SUM(cnt) AS BIGINT) AS cnt
               FROM ad GROUP BY 1, 2))
        WHERE 2 * cm >= n GROUP BY 1),
mo AS (SELECT g, CAST(SUM(cnt) AS HUGEINT) AS n,
              CAST(SUM(cnt * c) AS HUGEINT) AS s1,
              CAST(SUM(CAST(cnt AS HUGEINT) * c * c) AS HUGEINT)
                  AS s2
       FROM hh GROUP BY 1)
SELECT mo.g AS event_type, CAST(mo.n AS BIGINT) AS n,
       ROUND(SQRT(CAST(mo.n * mo.s2 - mo.s1 * mo.s1 AS DOUBLE)
                  / (CAST(mo.n AS DOUBLE) * (mo.n - 1.0)))
             / 100.0, 6) AS sd,
       ROUND(1.4826 * mad.mad / 100.0, 6) AS mad_scaled,
       ROUND(2.2219 * qn.qn_raw / 100.0, 6) AS qn_scaled,
       ROUND(2.2219 * qn.qn_raw
             / (1.4826 * NULLIF(mad.mad, 0)), 6) AS qn_over_mad
FROM mo JOIN mad USING (g) JOIN qn USING (g)
ORDER BY mo.g""")
def qn_scale_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Rousseeuw–Croux Qn scale of event value per type, beside SD
    and scaled MAD. Qn is the robust-scale endgame: 50% breakdown
    like MAD but ~82% Gaussian efficiency (MAD: 37%) AND no
    symmetry assumption — MAD is built around a center, so for
    skewed value distributions it reports the half-width of the
    WRONG interval, while Qn is a pure pairwise-spread functional.
    qn_over_mad far from 1 flags exactly that asymmetry bite.
    The distributed trick: Qn's k-th smallest pairwise |diff|
    never materializes pairs — a binary search on integer t with
    an O(V) two-pointer count per probe runs off the bounded
    cents histogram (the oracle enumerates diffs since V is small
    there; both land on the same exact integer). Consistency
    constants 2.2219/1.4826, finite-sample corrections omitted
    (documented)."""
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
        v = grp["c"].to_numpy(np.int64)
        c = grp["cnt"].to_numpy(np.int64)
        qn_raw, n, sd, mad = _qn_from_hist(v, c)
        rows.append((g, n, float(rha(sd / 100.0, 6)),
                     float(rha(1.4826 * mad / 100.0, 6)),
                     float(rha(2.2219 * qn_raw / 100.0, 6)),
                     float(rha(2.2219 * qn_raw
                               / (1.4826 * mad), 6))
                     if mad else None))
    return pd.DataFrame(rows, columns=[
        "event_type", "n", "sd", "mad_scaled", "qn_scaled",
        "qn_over_mad"]).astype({"n": np.int64})


@register("qn_scale_daily_counts", sql=f"""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
gg AS (SELECT CAST(COALESCE(e.x, 0) AS BIGINT) AS c
       FROM cal LEFT JOIN e ON e.d = cal.d),
hh AS (SELECT 1 AS g, c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM gg GROUP BY 2),
{_QN_SQL_TMPL.format(g="g")},
mo AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
              CAST(SUM(cnt * c) AS HUGEINT) AS s1,
              CAST(SUM(CAST(cnt AS HUGEINT) * c * c) AS HUGEINT)
                  AS s2
       FROM hh)
SELECT CAST(mo.n AS BIGINT) AS n_days,
       ROUND(SQRT(CAST(mo.n * mo.s2 - mo.s1 * mo.s1 AS DOUBLE)
                  / (CAST(mo.n AS DOUBLE) * (mo.n - 1.0))), 6)
           AS sd,
       CAST(qn.qn_raw AS BIGINT) AS qn_raw,
       ROUND(2.2219 * qn.qn_raw, 6) AS qn_scaled,
       ROUND(2.2219 * qn.qn_raw
             / SQRT(CAST(mo.n * mo.s2 - mo.s1 * mo.s1 AS DOUBLE)
                    / (CAST(mo.n AS DOUBLE) * (mo.n - 1.0))), 6)
           AS qn_over_sd
FROM mo, qn""")
def qn_scale_daily_counts(sf_dir: str) -> pd.DataFrame:
    """Qn volatility of the daily count series — the robust
    day-to-day spread every capacity rule of thumb wants instead
    of the SD it uses: one launch day inflates the SD
    quadratically and then every σ-based headroom rule
    overprovisions for a year, while Qn (50% breakdown) ignores
    it. qn_over_sd is the direct audit: ≈1 says the SD is trustworthy;
    ≪1 says the measured 'volatility' is a handful of days and
    robust headroom would be much cheaper. Same binary-search
    pairwise-order-statistic machinery on the zero-filled daily
    histogram."""
    x = _daily_counts_vec(sf_dir)
    hh = pd.DataFrame({"c": x}).groupby("c").size() \
        .reset_index(name="cnt").astype(np.int64) \
        .sort_values("c", ignore_index=True)
    v = hh["c"].to_numpy(np.int64)
    c = hh["cnt"].to_numpy(np.int64)
    qn_raw, n, sd, _ = _qn_from_hist(v, c)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "sd": [float(rha(sd, 6))],
        "qn_raw": np.array([qn_raw], np.int64),
        "qn_scaled": [float(rha(2.2219 * qn_raw, 6))],
        "qn_over_sd": [float(rha(2.2219 * qn_raw / sd, 6))]})


# ---------------------------------------------------------------------------
# Chain-ladder development (actuarial reserving transplanted to the
# order→shipment revenue triangle)
# ---------------------------------------------------------------------------

#: cohort = order month index i, development lag k = ship month −
#: order month capped at 6 (6+ bucket), negative lags (causality
#: violations) excluded; C_{i,k} = cumulative shipped cents through
#: lag k. All integers until the age-to-age ratios.
_CHAINLADDER_SQL = """
li AS (SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           AS om,
              (year(l.l_shipdate) * 12 + month(l.l_shipdate))
           AS sm,
              CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           AS cents
       FROM lineitem l JOIN orders o
         ON l.l_orderkey = o.o_orderkey),
base AS (SELECT MIN(om) AS o0 FROM li),
inc AS (SELECT om - base.o0 AS i,
               LEAST(sm - om, 6) AS k,
               CAST(SUM(cents) AS BIGINT) AS rev
        FROM li, base WHERE sm >= om GROUP BY 1, 2),
mx AS (SELECT MAX(i + k) AS mm FROM inc),
grid AS (SELECT i.i, k.k
         FROM (SELECT DISTINCT i FROM inc) i
         CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS k) k,
              mx
         WHERE i.i + k.k <= mx.mm),
cum AS (SELECT g.i, g.k,
               CAST(COALESCE(SUM(inc.rev), 0) AS BIGINT) AS c
        FROM grid g LEFT JOIN inc
          ON inc.i = g.i AND inc.k <= g.k
        GROUP BY 1, 2),
fac AS (SELECT a.k,
               CAST(SUM(b.c) AS HUGEINT) AS num,
               CAST(SUM(a.c) AS HUGEINT) AS den
        FROM cum a JOIN cum b ON b.i = a.i AND b.k = a.k + 1, mx
        WHERE a.i + a.k + 1 <= mx.mm AND a.k < 6
        GROUP BY 1)"""


@register("chain_ladder_factors", sql=f"""
WITH {_CHAINLADDER_SQL}
SELECT CAST(k AS BIGINT) AS dev_lag,
       ROUND(CAST(den AS DOUBLE) / 100.0, 6) AS cum_at_lag,
       ROUND(CAST(num AS DOUBLE) / 100.0, 6) AS cum_at_next,
       ROUND(CAST(num AS DOUBLE) / den, 6) AS age_to_age
FROM fac ORDER BY k""")
def chain_ladder_factors(sf_dir: str) -> pd.DataFrame:
    """Chain-ladder age-to-age development factors on the order→
    shipment revenue triangle: cohorts are order months, and
    f_k = ΣC_{i,k+1}/ΣC_{i,k} over every cohort old enough to
    show both columns — the volume-weighted fraction by which
    cohort revenue still grows after k months. This is actuarial
    reserving's core verbatim, and it answers the revenue-ops
    question the lag-quantile family can't: not 'how late do
    items ship' but 'how much of a month's booked revenue is
    STILL UNSHIPPED k months later', with f_k → 1 marking where a
    cohort is effectively closed. Lags cap at a 6+ bucket
    (nothing dropped), ship-before-order rows are excluded (the
    causality-audit population), and every numerator/denominator
    is an exact integer cents sum."""
    cum, mm = _ladder_cum(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for k in range(6):
        el = cum[(cum["k"] == k) & (cum["i"] + k + 1 <= mm)]
        nx = cum[(cum["k"] == k + 1)
                 & (cum["i"] + k + 1 <= mm)]
        den = int(el["c"].sum())
        num = int(nx["c"].sum())
        if den > 0:
            rows.append((k, float(rha(den / 100.0, 6)),
                         float(rha(num / 100.0, 6)),
                         float(rha(num / den, 6))))
    return pd.DataFrame(rows, columns=[
        "dev_lag", "cum_at_lag", "cum_at_next", "age_to_age"]) \
        .astype({"dev_lag": np.int64})


def _ladder_cum(sf_dir: str):
    """(cumulative triangle frame (i, k, c), max observable i+k)."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate",
                 "l_extendedprice"]).map_batches(
        lambda df: pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "sm": df["l_shipdate"].dt.year.to_numpy(np.int64)
            * 12 + df["l_shipdate"].dt.month.to_numpy(np.int64),
            "cents": np.rint(df["l_extendedprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)}),
        batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "om": df["o_orderdate"].dt.year.to_numpy(np.int64)
            * 12 + df["o_orderdate"].dt.month
            .to_numpy(np.int64)}),
        batch_format="pandas")
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def inc_part(df: pd.DataFrame) -> pd.DataFrame:
        om = df["om"].to_numpy(np.int64)
        sm = df["sm"].to_numpy(np.int64)
        keep = sm >= om
        lag = np.minimum(sm[keep] - om[keep], 6)
        return pd.DataFrame({
            "om": om[keep], "k": lag,
            "rev": df["cents"].to_numpy(np.int64)[keep]}) \
            .groupby(["om", "k"], as_index=False)["rev"].sum()

    inc = reduce_sink(
        j.map_batches(inc_part, batch_format="pandas"),
        ["om", "k"], {"rev": ("rev", "sum")}).to_pandas()
    o0 = int(inc["om"].min())
    inc["i"] = inc["om"] - o0
    mm = int((inc["i"] + inc["k"]).max())
    rows = []
    for i, g in inc.groupby("i"):
        kmax = min(6, mm - int(i))
        cums = {}
        run = 0
        gk = dict(zip(g["k"], g["rev"]))
        for k in range(kmax + 1):
            run += int(gk.get(k, 0))
            rows.append((int(i), k, run))
    return pd.DataFrame(rows, columns=["i", "k", "c"]), mm


@register("chain_ladder_reserve", sql=f"""
WITH {_CHAINLADDER_SQL},
ff AS (SELECT k, CAST(num AS DOUBLE) / den AS f FROM fac),
lat AS (SELECT cum.i, mx.mm,
               LEAST(6, mx.mm - cum.i) AS li
        FROM (SELECT DISTINCT i FROM cum) cum, mx),
rep AS (SELECT lat.i, lat.li, cum.c
        FROM lat JOIN cum ON cum.i = lat.i AND cum.k = lat.li),
ult AS (SELECT rep.i, rep.c,
               rep.c * COALESCE(
                   (SELECT PRODUCT(ff.f) FROM ff
                    WHERE ff.k >= rep.li), 1.0) AS u
        FROM rep)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cohorts,
       ROUND(SUM(CAST(c AS DOUBLE)) / 100.0, 6)
           AS reported_total,
       ROUND(SUM(u) / 100.0, 6) AS ultimate_total,
       ROUND((SUM(u) - SUM(CAST(c AS DOUBLE))) / 100.0, 6)
           AS reserve,
       ROUND((SUM(u) - SUM(CAST(c AS DOUBLE)))
             / SUM(CAST(c AS DOUBLE)) * 100.0, 6)
           AS reserve_pct
FROM ult""")
def chain_ladder_reserve(sf_dir: str) -> pd.DataFrame:
    """The chain-ladder projection: run each cohort's latest
    observed cumulative revenue through the remaining age-to-age
    factors to 'ultimate', and report the implied reserve — the
    revenue already ORDERED but not yet shipped that standard
    month-of-shipment reporting hasn't seen. This is IBNR
    reserving applied to fulfillment: reserve_pct is the
    systematic understatement of every recent month in a
    ship-date-based revenue dashboard, and it is exactly the
    correction a finance close should apply to the last k months
    rather than waiting for them to develop. Factors multiply in
    a windowed PRODUCT over the ≤6-row factor table; recent
    cohorts (fewer observed lags) get longer factor chains by
    construction."""
    cum, mm = _ladder_cum(sf_dir)
    facs = {}
    for k in range(6):
        el = cum[(cum["k"] == k) & (cum["i"] + k + 1 <= mm)]
        nx = cum[(cum["k"] == k + 1)
                 & (cum["i"] + k + 1 <= mm)]
        den = int(el["c"].sum())
        if den > 0:
            facs[k] = int(nx["c"].sum()) / den
    rep_tot = 0
    ult_tot = 0.0
    ncoh = 0
    for i in sorted(cum["i"].unique()):
        li = min(6, mm - int(i))
        c = int(cum[(cum["i"] == i)
                    & (cum["k"] == li)]["c"].iloc[0])
        f = 1.0
        for k in range(li, 6):
            if k in facs:
                f *= facs[k]
        rep_tot += c
        ult_tot += c * f
        ncoh += 1
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_cohorts": np.array([ncoh], np.int64),
        "reported_total": [float(rha(rep_tot / 100.0, 6))],
        "ultimate_total": [float(rha(ult_tot / 100.0, 6))],
        "reserve": [float(rha((ult_tot - rep_tot) / 100.0, 6))],
        "reserve_pct": [float(rha((ult_tot - rep_tot) / rep_tot
                                  * 100.0, 6))]})


# ---------------------------------------------------------------------------
# Exact Bayesian A/B: P(weekend purchase rate > weekday) in closed
# form, plus the normal approximation audited against it
# ---------------------------------------------------------------------------

#: weekend/weekday (n, purchases) and Beta(k+1, n-k+1) posterior
#: parameters under uniform priors.
_BAYES_AB_SQL = """
b AS (SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
          AS we,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
          AS y
      FROM events),
gg AS (SELECT we, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(y) AS BIGINT) AS k
       FROM b GROUP BY 1),
pp AS (SELECT
    (SELECT k FROM gg WHERE we = 1) + 1 AS a1,
    (SELECT n - k FROM gg WHERE we = 1) + 1 AS b1,
    (SELECT k FROM gg WHERE we = 0) + 1 AS a0,
    (SELECT n - k FROM gg WHERE we = 0) + 1 AS b0,
    (SELECT n FROM gg WHERE we = 1) AS n1,
    (SELECT n FROM gg WHERE we = 0) AS n0)"""


def _bayes_ab_counts(sf_dir: str):
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        dow = (df["ts"].dt.dayofweek.to_numpy(np.int64) + 1) % 7
        return pd.DataFrame({
            "we": ((dow == 0) | (dow == 6)).astype(np.int64),
            "n": np.ones(len(df), np.int64),
            "k": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})

    g = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["we"], {"n": ("n", "sum"), "k": ("k", "sum")}).to_pandas()
    n1 = int(g[g["we"] == 1]["n"].iloc[0])
    k1 = int(g[g["we"] == 1]["k"].iloc[0])
    n0 = int(g[g["we"] == 0]["n"].iloc[0])
    k0 = int(g[g["we"] == 0]["k"].iloc[0])
    return n1, k1, n0, k0


def _p_beta_gt(a1, b1, a0, b0) -> float:
    """Exact P(X > Y), X~Beta(a1,b1), Y~Beta(a0,b0) (Cook 2005):
    Σ_{i<a1} B(a0+i, b0+b1)/((b1+i)·B(1+i, b1)·B(a0, b0))."""
    from math import lgamma

    def lnb(x, y):
        return lgamma(x) + lgamma(y) - lgamma(x + y)

    tot = 0.0
    for i in range(int(a1)):
        tot += float(np.exp(lnb(a0 + i, b0 + b1)
                            - np.log(b1 + i) - lnb(1 + i, b1)
                            - lnb(a0, b0)))
    return tot


@register("bayes_ab_weekend_purchase", sql=f"""
WITH {_BAYES_AB_SQL},
sm AS (SELECT SUM(EXP(
           (lgamma(pp.a0 + i.i) + lgamma(pp.b0 + pp.b1)
            - lgamma(pp.a0 + i.i + pp.b0 + pp.b1))
           - LN(pp.b1 + i.i)
           - (lgamma(1.0 + i.i) + lgamma(CAST(pp.b1 AS DOUBLE))
              - lgamma(1.0 + i.i + pp.b1))
           - (lgamma(CAST(pp.a0 AS DOUBLE))
              + lgamma(CAST(pp.b0 AS DOUBLE))
              - lgamma(CAST(pp.a0 + pp.b0 AS DOUBLE))))) AS p
       FROM pp, LATERAL (SELECT UNNEST(generate_series(0,
                         CAST(pp.a1 - 1 AS BIGINT))) AS i) i)
SELECT (SELECT n1 FROM pp) AS n_weekend,
       (SELECT n0 FROM pp) AS n_weekday,
       ROUND(CAST((SELECT a1 - 1 FROM pp) AS DOUBLE)
             / (SELECT n1 FROM pp), 6) AS rate_weekend,
       ROUND(CAST((SELECT a0 - 1 FROM pp) AS DOUBLE)
             / (SELECT n0 FROM pp), 6) AS rate_weekday,
       ROUND(sm.p, 6) AS p_weekend_better,
       CAST(CASE WHEN sm.p > 0.95 OR sm.p < 0.05 THEN 1 ELSE 0
            END AS BIGINT) AS decisive_95
FROM sm""")
def bayes_ab_weekend_purchase(sf_dir: str) -> pd.DataFrame:
    """EXACT Bayesian A/B readout: P(weekend purchase rate >
    weekday rate) under independent Beta(k+1, n−k+1) posteriors,
    by Cook's closed-form sum — no simulation, no approximation,
    the number a Bayesian dashboard actually wants to print. The
    frequentist weekend family (odds ratios, MH strata, the
    peeking audit) answers 'is the difference surprising under a
    null'; this answers the decision-facing question 'how sure
    are we the weekend is better', which is legitimate to read
    continuously — the Bayesian posterior doesn't suffer the
    peeking problem the OBF machinery exists to patch. The sum
    has a1 = weekend-purchases+1 lgamma terms (fine at audit
    scale; the normal-approx query is the documented large-n
    path)."""
    n1, k1, n0, k0 = _bayes_ab_counts(sf_dir)
    p = _p_beta_gt(k1 + 1, n1 - k1 + 1, k0 + 1, n0 - k0 + 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([n1], np.int64),
        "n_weekday": np.array([n0], np.int64),
        "rate_weekend": [float(rha(k1 / n1, 6))],
        "rate_weekday": [float(rha(k0 / n0, 6))],
        "p_weekend_better": [float(rha(p, 6))],
        "decisive_95": np.array(
            [1 if (p > 0.95 or p < 0.05) else 0], np.int64)})


@register("bayes_ab_normal_approx", sql=f"""
WITH {_BAYES_AB_SQL},
mo AS (SELECT CAST(a1 AS DOUBLE) / (a1 + b1) AS m1,
              CAST(a0 AS DOUBLE) / (a0 + b0) AS m0,
              CAST(a1 AS DOUBLE) * b1
              / ((CAST(a1 AS DOUBLE) + b1)
                 * (CAST(a1 AS DOUBLE) + b1)
                 * (a1 + b1 + 1.0)) AS v1,
              CAST(a0 AS DOUBLE) * b0
              / ((CAST(a0 AS DOUBLE) + b0)
                 * (CAST(a0 AS DOUBLE) + b0)
                 * (a0 + b0 + 1.0)) AS v0
       FROM pp),
zz AS (SELECT (m1 - m0) / SQRT(v1 + v0) AS z FROM mo),
ph AS (SELECT z, ABS(z) AS az,
              1.0 / (1.0 + 0.2316419 * ABS(z)) AS t
       FROM zz),
pn AS (SELECT CASE WHEN z >= 0
              THEN 1.0 - (0.39894228040143267 * EXP(-(az * az)
                          / 2.0))
                   * (t * (0.319381530 + t * (-0.356563782
                      + t * (1.781477937 + t * (-1.821255978
                      + t * 1.330274429)))))
              ELSE (0.39894228040143267 * EXP(-(az * az) / 2.0))
                   * (t * (0.319381530 + t * (-0.356563782
                      + t * (1.781477937 + t * (-1.821255978
                      + t * 1.330274429)))))
              END AS p
       FROM ph),
ex AS (SELECT SUM(EXP(
           (lgamma(pp.a0 + i.i) + lgamma(pp.b0 + pp.b1)
            - lgamma(pp.a0 + i.i + pp.b0 + pp.b1))
           - LN(pp.b1 + i.i)
           - (lgamma(1.0 + i.i) + lgamma(CAST(pp.b1 AS DOUBLE))
              - lgamma(1.0 + i.i + pp.b1))
           - (lgamma(CAST(pp.a0 AS DOUBLE))
              + lgamma(CAST(pp.b0 AS DOUBLE))
              - lgamma(CAST(pp.a0 + pp.b0 AS DOUBLE))))) AS p
       FROM pp, LATERAL (SELECT UNNEST(generate_series(0,
                         CAST(pp.a1 - 1 AS BIGINT))) AS i) i)
SELECT ROUND((SELECT z FROM zz), 6) AS z,
       ROUND((SELECT p FROM pn), 6) AS p_normal,
       ROUND((SELECT p FROM ex), 6) AS p_exact,
       ROUND(ABS((SELECT p FROM pn) - (SELECT p FROM ex)), 6)
           AS abs_error
FROM pn LIMIT 1""")
def bayes_ab_normal_approx(sf_dir: str) -> pd.DataFrame:
    """The moment-matched normal approximation to the same
    posterior comparison — Φ((m₁−m₀)/√(v₁+v₀)) with exact Beta
    means/variances — audited against the exact sum. abs_error is
    the number that licenses the approximation at scale: the
    closed-form sum costs O(successes) lgamma terms, untenable at
    10⁹ purchases, while the normal path is O(1); seeing the
    error at ~1e-4 here (counts in the hundreds) is the evidence
    that switching to the approximation for bigger counts loses
    nothing, and the documented scale path for
    [[bayes_ab_weekend_purchase]]. Same A&S 26.2.17 normal tail
    as the FDR battery."""
    n1, k1, n0, k0 = _bayes_ab_counts(sf_dir)
    a1, b1 = k1 + 1, n1 - k1 + 1
    a0, b0 = k0 + 1, n0 - k0 + 1
    m1 = a1 / (a1 + b1)
    m0 = a0 / (a0 + b0)
    v1 = a1 * b1 / ((float(a1) + b1) * (float(a1) + b1)
                    * (a1 + b1 + 1.0))
    v0 = a0 * b0 / ((float(a0) + b0) * (float(a0) + b0)
                    * (a0 + b0 + 1.0))
    z = (m1 - m0) / np.sqrt(v1 + v0)
    az = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    tail = (0.39894228040143267 * np.exp(-(az * az) / 2.0)) \
        * (t * (0.319381530 + t * (-0.356563782
           + t * (1.781477937 + t * (-1.821255978
           + t * 1.330274429)))))
    p_n = 1.0 - tail if z >= 0 else tail
    p_e = _p_beta_gt(a1, b1, a0, b0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "z": [float(rha(z, 6))],
        "p_normal": [float(rha(p_n, 6))],
        "p_exact": [float(rha(p_e, 6))],
        "abs_error": [float(rha(abs(p_n - p_e), 6))]})


# ---------------------------------------------------------------------------
# Good–Toulmin unseen-species extrapolation (Efron–Thisted): how many
# NEW words / users would doubling the sample reveal
# ---------------------------------------------------------------------------

@register("good_toulmin_new_words_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(lower(text),
                                 '\S+')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
sp AS (SELECT source, n AS r, CAST(COUNT(*) AS BIGINT) AS vr
       FROM c GROUP BY 1, 2),
gt AS (SELECT source,
              CAST(SUM(CASE WHEN r % 2 = 1 THEN vr ELSE -vr END)
                   AS BIGINT) AS delta,
              CAST(SUM(vr) AS BIGINT) AS vocab,
              CAST(SUM(CASE WHEN r = 1 THEN vr ELSE 0 END)
                   AS BIGINT) AS v1
       FROM sp GROUP BY 1)
SELECT source, vocab, v1, delta AS predicted_new_words,
       ROUND(CAST(delta AS DOUBLE) / vocab * 100.0, 6)
           AS growth_pct
FROM gt ORDER BY source""")
def good_toulmin_new_words_by_source(sf_dir: str) -> pd.DataFrame:
    """Good–Toulmin extrapolation per source: the expected number
    of NEW word types a second, equal-sized sample would reveal,
    Δ = V₁ − V₂ + V₃ − … (the alternating frequency-spectrum sum
    — Efron & Thisted's 'how many words did Shakespeare know'
    estimator at t = 1, where it is exactly unbiased and needs no
    smoothing). This is the prospective question the richness
    panel can't answer: Heaps/Herdan FIT the past curve,
    Good–Toulmin PREDICTS the next doubling from the spectrum's
    fine structure, and growth_pct is the crawl-budget number —
    a source predicting 2% new vocabulary on doubling is
    exhausted regardless of how 'rich' its static indices look.
    The sum is exact integers off the same (source, word) reduce
    as the richness family; negative values are possible by
    design (V₂ > V₁ says the spectrum is past its hapax peak) and
    are reported, not clamped."""
    def sp(df: pd.DataFrame) -> pd.DataFrame:
        y = df["y"].to_numpy(np.int64)
        sign = np.where(y % 2 == 1, 1, -1).astype(np.int64)
        return pd.DataFrame({
            "source": df["source"],
            "delta": sign,
            "vocab": np.ones(len(df), np.int64),
            "v1": (y == 1).astype(np.int64)}) \
            .groupby("source", as_index=False).sum()

    m = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(sp, batch_format="pandas"),
        ["source"], {"delta": ("delta", "sum"),
                     "vocab": ("vocab", "sum"),
                     "v1": ("v1", "sum")}).to_pandas() \
        .sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "source": m["source"],
        "vocab": m["vocab"].astype(np.int64),
        "v1": m["v1"].astype(np.int64),
        "predicted_new_words": m["delta"].astype(np.int64),
        "growth_pct": [float(rha(int(d) / int(v) * 100.0, 6))
                       for d, v in zip(m["delta"], m["vocab"])]})


@register("good_toulmin_new_users", sql="""
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
sp AS (SELECT n AS r, CAST(COUNT(*) AS BIGINT) AS vr
       FROM c GROUP BY 1),
gt AS (SELECT CAST(SUM(CASE WHEN r % 2 = 1 THEN vr ELSE -vr END)
                   AS BIGINT) AS delta,
              CAST(SUM(vr) AS BIGINT) AS users,
              CAST(SUM(CASE WHEN r = 1 THEN vr ELSE 0 END)
                   AS BIGINT) AS v1,
              CAST(SUM(CASE WHEN r = 2 THEN vr ELSE 0 END)
                   AS BIGINT) AS v2
       FROM sp)
SELECT users AS observed_users, v1 AS single_event_users, v2,
       delta AS predicted_new_users,
       ROUND(CAST(delta AS DOUBLE) / users * 100.0, 6)
           AS growth_pct
FROM gt""")
def good_toulmin_new_users(sf_dir: str) -> pd.DataFrame:
    """The same estimator on the user-frequency spectrum: how many
    NEVER-SEEN users would appear if the observed event volume
    doubled. Lincoln–Petersen and Schnabel (already in the
    registry) estimate the closed population you're sampling
    FROM; Good–Toulmin predicts the yield of more sampling
    without assuming the population is closed at all — the
    audience-ceiling question as a forward difference. The
    reading is operational: growth_pct near zero says the event
    stream has saturated its audience and volume growth is pure
    re-engagement; a large value prices acquisition headroom.
    Exact alternating integer sum over the bounded
    events-per-user spectrum; negative values reported (past the
    singleton peak) rather than clamped."""
    def sp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["user_id"])
        .map_batches(sp, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum")}).to_pandas()
    n = c["n"].to_numpy(np.int64)
    users = len(c)
    v1 = int((n == 1).sum())
    v2 = int((n == 2).sum())
    delta = int(np.where(n % 2 == 1, 1, -1).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "observed_users": np.array([users], np.int64),
        "single_event_users": np.array([v1], np.int64),
        "v2": np.array([v2], np.int64),
        "predicted_new_users": np.array([delta], np.int64),
        "growth_pct": [float(rha(delta / users * 100.0, 6))]})


# ---------------------------------------------------------------------------
# Label mixing on the kNN graph: full mixing matrix + Newman
# categorical assortativity (the degree-corrected homophily)
# ---------------------------------------------------------------------------

def _knn_label_edges(sf_dir: str):
    """(la, lb) label pairs of the k=2 kNN edge set — the exact
    knn_label_homophily recipe (brute-force top-k, self filtered,
    re-ranked, rank <= 2)."""
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
    out["rank"] = (out.groupby("node", sort=False).cumcount()
                   + 1).astype(np.int64)
    e = out[out["rank"] <= 2]
    la = labs.loc[e["node"].to_numpy()].to_numpy(np.int64)
    lb = labs.loc[e["vec_id"].to_numpy()].to_numpy(np.int64)
    return la, lb


#: directed k=2 kNN edge set with endpoint labels — identical CTE to
#: knn_label_homophily's.
_KNN_EDGE_SQL = """
sims AS (
  SELECT a.vec_id AS node, CAST(a.label AS BIGINT) AS la,
         b.vec_id AS neighbor, CAST(b.label AS BIGINT) AS lb,
         ROUND(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, la, lb,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor)
                 AS rank
      FROM sims),
e AS (SELECT la, lb FROM r WHERE rank <= 2),
mm AS (SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS m
       FROM e GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(m) AS BIGINT) AS mt FROM mm),
oa AS (SELECT la, CAST(SUM(m) AS BIGINT) AS ma
       FROM mm GROUP BY 1),
ob AS (SELECT lb, CAST(SUM(m) AS BIGINT) AS mb
       FROM mm GROUP BY 1)"""


@register("knn_label_mixing_matrix", sql=f"""
WITH {_KNN_EDGE_SQL}
SELECT mm.la AS from_label, mm.lb AS to_label, mm.m AS edges,
       ROUND(CAST(mm.m AS DOUBLE) / tot.mt, 6) AS share,
       ROUND((CAST(oa.ma AS DOUBLE) / tot.mt)
             * (CAST(ob.mb AS DOUBLE) / tot.mt), 6) AS expected,
       ROUND((CAST(mm.m AS DOUBLE) / tot.mt)
             / ((CAST(oa.ma AS DOUBLE) / tot.mt)
                * (CAST(ob.mb AS DOUBLE) / tot.mt)), 6) AS lift
FROM mm JOIN oa USING (la) JOIN ob USING (lb), tot
ORDER BY mm.la, mm.lb""")
def knn_label_mixing_matrix(sf_dir: str) -> pd.DataFrame:
    """The full label-mixing matrix of the kNN graph: for every
    (from-label, to-label) pair, the edge share against the
    degree-product expectation. [[knn_label_homophily]] collapses
    this to one diagonal number; the off-diagonal structure is
    where the retrieval failure modes live — a lift ≫ 1 between
    two specific labels means the embedding CONFUSES exactly that
    pair (their regions interlock), which is actionable (mine
    hard negatives from that pair) where a global homophily drop
    is not. Same k=2 edge construction and 6dp-cosine/neighbor-tie
    conventions; the matrix is ≤|labels|² integer counts."""
    la, lb = _knn_label_edges(sf_dir)
    mm = pd.DataFrame({"la": la, "lb": lb}) \
        .groupby(["la", "lb"]).size().reset_index(name="m")
    mt = int(mm["m"].sum())
    oa = mm.groupby("la")["m"].sum()
    ob = mm.groupby("lb")["m"].sum()
    rha = textstats.round_half_away
    rows = []
    for _, r0 in mm.sort_values(["la", "lb"]).iterrows():
        sa = int(oa[r0["la"]]) / mt
        sb = int(ob[r0["lb"]]) / mt
        sh = int(r0["m"]) / mt
        rows.append((int(r0["la"]), int(r0["lb"]), int(r0["m"]),
                     float(rha(sh, 6)), float(rha(sa * sb, 6)),
                     float(rha(sh / (sa * sb), 6))))
    return pd.DataFrame(rows, columns=[
        "from_label", "to_label", "edges", "share", "expected",
        "lift"]).astype({"from_label": np.int64,
                         "to_label": np.int64,
                         "edges": np.int64})


@register("knn_label_assortativity", sql=f"""
WITH {_KNN_EDGE_SQL},
qq AS (SELECT SUM(CASE WHEN mm.la = mm.lb
                       THEN CAST(mm.m AS DOUBLE) / tot.mt
                       ELSE 0 END) AS tr,
              (SELECT SUM((CAST(oa.ma AS DOUBLE) / tot2.mt)
                          * (CAST(ob.mb AS DOUBLE) / tot2.mt))
               FROM oa JOIN ob ON oa.la = ob.lb, tot tot2)
                  AS ab
       FROM mm, tot)
SELECT ROUND(tr, 6) AS diagonal_share,
       ROUND(ab, 6) AS expected_diagonal,
       ROUND(tr - ab, 6) AS modularity_q,
       ROUND((tr - ab) / (1.0 - ab), 6) AS assortativity_r
FROM qq""")
def knn_label_assortativity(sf_dir: str) -> pd.DataFrame:
    """Newman's categorical assortativity r = (tr e − Σaᵢbᵢ)/
    (1 − Σaᵢbᵢ) and the un-normalized modularity Q of the label
    partition on the kNN graph. Homophily's lift corrects for
    GLOBAL label frequencies; r additionally corrects for the
    graph's realized degree mixing (labels that attract many
    edges inflate the diagonal even under random wiring among
    those edges), and its normalization puts every embedding
    space on the same [−1, 1] scale — THE comparable number for
    'did the new encoder separate classes better', where raw
    homophily moves with k and label balance. Q is the same
    quantity a community-detection pass would maximize, so this
    row also scores the label partition AS a community structure.
    Same exact edge counts; four shared float expressions."""
    la, lb = _knn_label_edges(sf_dir)
    mm = pd.DataFrame({"la": la, "lb": lb}) \
        .groupby(["la", "lb"]).size().reset_index(name="m")
    mt = int(mm["m"].sum())
    tr = float(mm[mm["la"] == mm["lb"]]["m"].sum()) / mt
    oa = mm.groupby("la")["m"].sum()
    ob = mm.groupby("lb")["m"].sum()
    ab = float(sum((int(oa.get(l_, 0)) / mt)
                   * (int(ob.get(l_, 0)) / mt)
                   for l_ in set(oa.index) | set(ob.index)))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "diagonal_share": [float(rha(tr, 6))],
        "expected_diagonal": [float(rha(ab, 6))],
        "modularity_q": [float(rha(tr - ab, 6))],
        "assortativity_r": [float(rha((tr - ab) / (1.0 - ab),
                                      6))]})


# ---------------------------------------------------------------------------
# Compositional data analysis (Aitchison): the daily event-type mix
# as log-ratio geometry
# ---------------------------------------------------------------------------

#: per-day per-type counts with the +1/2 zero-replacement convention,
#: log-ratios between type pairs over the zero-filled calendar.
_AITCHISON_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type AS g,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
ty AS (SELECT DISTINCT g FROM e),
g AS (SELECT cal.d, ty.g,
             CAST(COALESCE(e.c, 0) AS BIGINT) + 0.5 AS c
      FROM cal CROSS JOIN ty
      LEFT JOIN e ON e.d = cal.d AND e.g = ty.g),
pr AS (SELECT a.d, a.g AS g1, b.g AS g2,
              LN(a.c / b.c) AS lr
       FROM g a JOIN g b ON a.d = b.d AND a.g < b.g),
vm AS (SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS n,
              SUM(lr) AS s1, SUM(lr * lr) AS s2
       FROM pr GROUP BY 1, 2)"""


@register("aitchison_variation_matrix", sql=f"""
WITH {_AITCHISON_SQL}
SELECT g1 AS type_a, g2 AS type_b, n AS n_days,
       ROUND((s2 - s1 * s1 / n) / (n - 1.0), 6) AS var_logratio,
       ROUND(EXP(-(s2 - s1 * s1 / n) / (n - 1.0)), 6)
           AS proportionality
FROM vm ORDER BY g1, g2""")
def aitchison_variation_matrix(sf_dir: str) -> pd.DataFrame:
    """Aitchison's variation matrix on the daily event-type mix:
    for every type pair, Var(ln(cᵢ/cⱼ)) across days. Correlating
    raw type SHARES is the textbook compositional fallacy (shares
    sum to 1, so spurious negative correlation is built in — it
    contaminates every share-based trend in any registry); the
    log-ratio variance is the coordinate-free dependence measure
    Aitchison geometry licenses: ≈0 means two types scale in
    lockstep (one underlying driver — alerting on both is
    redundant), large means independent drivers. The
    proportionality column e^{−var} maps it onto (0,1] for
    reading. Zeros take the +½ count convention (documented);
    log-ratios are per-day float expressions over exact integer
    counts on the zero-filled calendar."""
    vm = _aitchison_pairs(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for (g1, g2), (n, s1, s2) in sorted(vm.items()):
        v = (s2 - s1 * s1 / n) / (n - 1.0)
        rows.append((g1, g2, n, float(rha(v, 6)),
                     float(rha(np.exp(-v), 6))))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_days", "var_logratio",
        "proportionality"]).astype({"n_days": np.int64})


def _aitchison_pairs(sf_dir: str):
    """{(g1, g2): (n_days, Σlr, Σlr²)} with g1 < g2, +0.5 zeros."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str),
            "c": np.ones(len(df), np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "g"], {"c": ("c", "sum")}).to_pandas()
    lo, hi = int(e["d"].min()), int(e["d"].max())
    types = sorted(e["g"].unique())
    days = np.arange(lo, hi + 1, dtype=np.int64)
    mat = {}
    for t in types:
        sub = e[e["g"] == t].set_index("d")["c"]
        col = np.full(len(days), 0.5, np.float64)
        idx = sub.index.to_numpy(np.int64) - lo
        col[idx] = sub.to_numpy(np.int64) + 0.5
        mat[t] = col
    out = {}
    for i, g1 in enumerate(types):
        for g2 in types[i + 1:]:
            lr = np.log(mat[g1] / mat[g2])
            out[(g1, g2)] = (len(days), float(lr.sum()),
                             float((lr * lr).sum()))
    return out


@register("compositional_total_variance", sql=f"""
WITH {_AITCHISON_SQL},
vv AS (SELECT g1, g2,
              (s2 - s1 * s1 / n) / (n - 1.0) AS v
       FROM vm),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM ty),
tv AS (SELECT SUM(v) / (SELECT k FROM k) AS totvar FROM vv),
ex AS (SELECT * FROM vv
       ORDER BY ROUND(v, 9) DESC, g1, g2 LIMIT 1),
mn AS (SELECT * FROM vv
       ORDER BY ROUND(v, 9) ASC, g1, g2 LIMIT 1)
SELECT (SELECT k FROM k) AS n_types,
       ROUND((SELECT totvar FROM tv), 6) AS total_variance,
       (SELECT g1 || '/' || g2 FROM ex) AS most_independent_pair,
       ROUND((SELECT v FROM ex), 6) AS max_var_logratio,
       (SELECT g1 || '/' || g2 FROM mn) AS most_proportional_pair,
       ROUND((SELECT v FROM mn), 6) AS min_var_logratio""")
def compositional_total_variance(sf_dir: str) -> pd.DataFrame:
    """Aitchison total variance of the daily mix —
    totvar = (1/2k)ΣΣ Var(ln cᵢ/cⱼ), the single scalar measuring
    how much the COMPOSITION (not the volume) of traffic moves
    day to day — with the extreme pairs named. This is the
    mix-stability number the share-of-traffic dashboards
    approximate badly: volume can double while totvar ≈ 0 (same
    mix, bigger days — scale capacity uniformly) or volume can be
    flat while totvar is large (the mix churns — per-type
    capacity and per-type models are mandatory). Extreme pairs
    round at 9dp before the argmin/argmax with lexicographic
    ties; the (1/2k) convention uses ordered-pair symmetry with
    our g1<g2 sum counted once, i.e. Σ_{i<j}v/k."""
    vm = _aitchison_pairs(sf_dir)
    k = len(set(g for p in vm for g in p))
    rha = textstats.round_half_away
    vs = {}
    for (g1, g2), (n, s1, s2) in vm.items():
        vs[(g1, g2)] = (s2 - s1 * s1 / n) / (n - 1.0)
    totvar = sum(vs.values()) / k
    items = [(float(rha(v, 9)), g1, g2)
             for (g1, g2), v in vs.items()]
    mx = sorted(items, key=lambda t: (-t[0], t[1], t[2]))[0]
    mn = sorted(items, key=lambda t: (t[0], t[1], t[2]))[0]
    return pd.DataFrame({
        "n_types": np.array([k], np.int64),
        "total_variance": [float(rha(totvar, 6))],
        "most_independent_pair": [f"{mx[1]}/{mx[2]}"],
        "max_var_logratio": [float(rha(vs[(mx[1], mx[2])], 6))],
        "most_proportional_pair": [f"{mn[1]}/{mn[2]}"],
        "min_var_logratio": [float(rha(vs[(mn[1], mn[2])], 6))]})


# ---------------------------------------------------------------------------
# Heteroskedasticity audit of the daily trend (Breusch–Pagan / White)
# ---------------------------------------------------------------------------

#: OLS y ~ a + b·t on the daily counts (same _DAILY_SQL spine as the
#: trend family), residuals e and u = e² as shared per-day expressions.
_HET_SQL = f"""
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
r AS (SELECT CAST(x.t AS DOUBLE) AS t,
             (x.y - fit.a - fit.b * x.t)
             * (x.y - fit.a - fit.b * x.t) AS u
      FROM x, fit)"""


@register("breusch_pagan_daily", sql=f"""
WITH {_HET_SQL},
su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(t) AS st, SUM(t * t) AS stt,
              SUM(u) AS su, SUM(u * u) AS suu,
              SUM(t * u) AS stu
       FROM r)
SELECT n AS n_days,
       ROUND((n * stu - st * su) / (n * stt - st * st), 6)
           AS var_slope,
       ROUND(n * (n * stu - st * su) * (n * stu - st * su)
             / ((n * stt - st * st) * (n * suu - su * su)), 6)
           AS bp_lm,
       CAST(CASE WHEN n * (n * stu - st * su) * (n * stu - st * su)
                      / ((n * stt - st * st) * (n * suu - su * su))
                      > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
           AS bp_rejected
FROM su""")
def breusch_pagan_daily(sf_dir: str) -> pd.DataFrame:
    """Koenker's studentized Breusch–Pagan test on the daily-count
    trend: regress the squared OLS residuals u = e² on the day index
    and report LM = n·R² against χ²₁ (3.841). The trend family's
    inference problem has TWO halves — Newey–West (present) repairs
    the slope SE for autocorrelation, but every OLS interval in the
    registry also assumes the error VARIANCE is flat across the
    window, and growth data is the canonical violator (variance
    scales with level, so late-window days are noisier). var_slope
    gives the direction: >0 means dispersion grows with time, i.e.
    prediction bands that widen toward 'now' — exactly where a
    dashboard reads them. Koenker's n·R² form is used (no normality
    assumption), documented against the original ESS/2 variant.
    Exact integer OLS moments; u is a shared float expression per
    day; same no-zero-fill _DAILY_SQL spine as the trend family."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = y.mean() - b * t.mean()
    u = (y - a - b * t) ** 2
    st, stt = t.sum(), (t * t).sum()
    su, suu, stu = u.sum(), (u * u).sum(), (t * u).sum()
    num = n * stu - st * su
    lm = n * num * num / ((n * stt - st * st) * (n * suu - su * su))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "var_slope": [float(rha(num / (n * stt - st * st), 6))],
        "bp_lm": [float(rha(lm, 6))],
        "bp_rejected": np.array([1 if lm > 3.841459 else 0],
                                np.int64)})


@register("white_test_daily", sql=f"""
WITH {_HET_SQL},
su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(t) AS s1, SUM(t * t) AS s2,
              SUM(t * t * t) AS s3, SUM(t * t * t * t) AS s4,
              SUM(u) AS su, SUM(u * u) AS suu,
              SUM(t * u) AS s1u, SUM(t * t * u) AS s2u
       FROM r),
ce AS (SELECT n,
              s2 - s1 * s1 / n AS a11,
              s3 - s1 * s2 / n AS a12,
              s4 - s2 * s2 / n AS a22,
              s1u - s1 * su / n AS b1,
              s2u - s2 * su / n AS b2,
              suu - su * su / n AS stot
       FROM su),
sv AS (SELECT n, stot,
              (a22 * b1 - a12 * b2)
                  / (a11 * a22 - a12 * a12) AS c1,
              (a11 * b2 - a12 * b1)
                  / (a11 * a22 - a12 * a12) AS c2,
              b1, b2
       FROM ce)
SELECT n AS n_days,
       ROUND((c1 * b1 + c2 * b2) / stot, 6) AS aux_r2,
       ROUND(n * (c1 * b1 + c2 * b2) / stot, 6) AS white_lm,
       CAST(CASE WHEN n * (c1 * b1 + c2 * b2) / stot > 5.991465
                 THEN 1 ELSE 0 END AS BIGINT) AS white_rejected
FROM sv""")
def white_test_daily(sf_dir: str) -> pd.DataFrame:
    """White's general heteroskedasticity test on the same daily
    trend: the auxiliary regression adds t² beside t (for a
    single-regressor model White's regressors are exactly the level
    and its square), LM = n·R² against χ²₂ (5.991). Read WITH
    breusch_pagan_daily: BP's single linear term only sees variance
    that drifts monotonically with time — a mid-window variance
    bulge (launch-period chaos that settles) or U-shape (noisy
    edges, calm middle) is invisible to it, and the t² term is what
    catches exactly those. White significant where BP is not is the
    U-shape signature; both significant with similar LM says the
    linear story suffices and the direction is var_slope's sign.
    Two-regressor OLS in the closed centered-2×2 adjugate form the
    ECM batch established; t⁴ sums stay well inside HUGEINT at
    calendar scale."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = y.mean() - b * t.mean()
    u = (y - a - b * t) ** 2
    s1, s2 = t.sum(), (t * t).sum()
    s3, s4 = (t ** 3).sum(), (t ** 4).sum()
    su, suu = u.sum(), (u * u).sum()
    s1u, s2u = (t * u).sum(), (t * t * u).sum()
    a11 = s2 - s1 * s1 / n
    a12 = s3 - s1 * s2 / n
    a22 = s4 - s2 * s2 / n
    b1 = s1u - s1 * su / n
    b2 = s2u - s2 * su / n
    stot = suu - su * su / n
    det = a11 * a22 - a12 * a12
    c1 = (a22 * b1 - a12 * b2) / det
    c2 = (a11 * b2 - a12 * b1) / det
    r2 = (c1 * b1 + c2 * b2) / stot
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "aux_r2": [float(rha(r2, 6))],
        "white_lm": [float(rha(n * r2, 6))],
        "white_rejected": np.array([1 if n * r2 > 5.991465 else 0],
                                   np.int64)})


# ---------------------------------------------------------------------------
# Tail-index cross-check: Pickands and the DEdH moment estimator
# beside Hill on the per-user value tail
# ---------------------------------------------------------------------------

#: per-user positive cent totals ranked descending (value-ties broken
#: by user_id; only the value multiset enters any estimator).
_TAIL_TOP_SQL = """
u AS (SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1),
top AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, user_id) AS rn
        FROM u WHERE x > 0)"""


def _user_value_top(sf_dir: str, m: int) -> np.ndarray:
    """Top-m per-user cent totals, descending. Each block ships only
    its local top-m (value, user) rows — the union provably contains
    the global top-m — so driver work is O(blocks·m), never O(users).
    Shared by the Pickands/DEdH estimators; same reduce as
    [[hill_tail_index_user_value]]."""
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
                              ascending=[False, True]).head(m)

    return per.map_batches(local_top, batch_format="pandas") \
        .to_pandas().sort_values(["x", "user_id"],
                                 ascending=[False, True],
                                 kind="mergesort").head(m)["x"] \
        .to_numpy(np.float64)


@register("pickands_tail_index_user_value", sql=f"""
WITH {_TAIL_TOP_SQL},
p AS (SELECT (SELECT CAST(x AS DOUBLE) FROM top WHERE rn = 25) AS xa,
             (SELECT CAST(x AS DOUBLE) FROM top WHERE rn = 50) AS xb,
             (SELECT CAST(x AS DOUBLE) FROM top WHERE rn = 100) AS xc),
xi AS (SELECT CASE WHEN xa - xb > 0 AND xb - xc > 0
                   THEN LN((xa - xb) / (xb - xc)) / LN(2.0)
                   ELSE NULL END AS xi
       FROM p WHERE xc IS NOT NULL)
SELECT CAST(25 AS BIGINT) AS k,
       ROUND(xi, 6) AS xi_pickands,
       ROUND(CASE WHEN xi > 0 THEN 1.0 / xi ELSE NULL END, 6)
           AS alpha_pickands
FROM xi""")
def pickands_tail_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Pickands' estimator of the extreme-value index on the same
    per-user value tail Hill reads: ξ̂ = ln((X₍ₖ₎−X₍₂ₖ₎)/(X₍₂ₖ₎−X₍₄ₖ₎))
    / ln 2 at k = 25 (so the deepest order statistic is the same
    top-100 Hill uses). The point of the cross-check: Hill is ONLY
    consistent for ξ > 0 — fed a light-tailed sample it still
    happily prints a finite α, and nothing in its output warns you.
    Pickands is valid for EVERY max-domain-of-attraction (ξ of any
    sign), so ξ̂_P near 0 or negative while Hill reports α ≈ 2–3 is
    the signature that the 'Pareto whale curve' is actually
    exponential-ish and Hill's number is an artifact. Degenerate
    spacings (tied order statistics) yield NULL on both engines
    rather than ±inf; fewer than 100 positive users → empty."""
    x = _user_value_top(sf_dir, 100)
    if len(x) < 100:
        return pd.DataFrame({
            "k": pd.Series([], dtype=np.int64),
            "xi_pickands": pd.Series([], dtype=np.float64),
            "alpha_pickands": pd.Series([], dtype=np.float64)})
    xa, xb, xc = x[24], x[49], x[99]
    rha = textstats.round_half_away
    if xa - xb > 0 and xb - xc > 0:
        xi = float(np.log((xa - xb) / (xb - xc)) / np.log(2.0))
        alpha = float(rha(1.0 / xi, 6)) if xi > 0 else np.nan
        xi_r = float(rha(xi, 6))
    else:
        xi_r, alpha = np.nan, np.nan
    return pd.DataFrame({"k": np.array([25], np.int64),
                         "xi_pickands": [xi_r],
                         "alpha_pickands": [alpha]})


@register("dedh_moment_tail_index_user_value", sql=f"""
WITH {_TAIL_TOP_SQL},
kref AS (SELECT CAST(x AS DOUBLE) AS xk FROM top WHERE rn = 101),
m AS (SELECT SUM(LN(CAST(x AS DOUBLE) / (SELECT xk FROM kref))) / 100
          AS m1,
      SUM(LN(CAST(x AS DOUBLE) / (SELECT xk FROM kref))
          * LN(CAST(x AS DOUBLE) / (SELECT xk FROM kref))) / 100
          AS m2
      FROM top WHERE rn <= 100)
SELECT ROUND(m1, 6) AS m1_hill,
       ROUND(m2, 6) AS m2,
       ROUND(m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2), 6) AS xi_moment,
       ROUND(1.0 - 0.5 / (1.0 - m1 * m1 / m2), 6) AS pareto_gap
FROM m WHERE EXISTS (SELECT 1 FROM kref)""")
def dedh_moment_tail_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Dekkers–Einmahl–de Haan moment estimator at k = 100:
    ξ̂ = M₁ + 1 − ½/(1 − M₁²/M₂) with M_r the r-th log-spacing moment
    over the top-100 — the third corner of the tail triangle. M₁ IS
    Hill's inv_alpha (printed as m1_hill so the rows tie together
    digit-for-digit), and pareto_gap = ξ̂ − M₁ is the exact
    correction the second moment buys: a strict Pareto tail has
    M₂ = 2M₁² making the gap 0, so a materially negative gap says
    the log-spacings are under-dispersed relative to Pareto — the
    tail is lighter than Hill assumes and ξ̂_moment (valid for all
    ξ, like Pickands but far lower-variance) is the number to
    trust. Same top-101 candidate machinery and shared-operand ln
    sums; fewer than 101 positive users → empty both engines."""
    x = _user_value_top(sf_dir, 101)
    if len(x) < 101:
        return pd.DataFrame({
            "m1_hill": pd.Series([], dtype=np.float64),
            "m2": pd.Series([], dtype=np.float64),
            "xi_moment": pd.Series([], dtype=np.float64),
            "pareto_gap": pd.Series([], dtype=np.float64)})
    lx = np.log(x[:100] / x[100])
    m1 = float(lx.sum()) / 100
    m2 = float((lx * lx).sum()) / 100
    gap = 1.0 - 0.5 / (1.0 - m1 * m1 / m2)
    rha = textstats.round_half_away
    return pd.DataFrame({"m1_hill": [float(rha(m1, 6))],
                         "m2": [float(rha(m2, 6))],
                         "xi_moment": [float(rha(m1 + gap, 6))],
                         "pareto_gap": [float(rha(gap, 6))]})


# ---------------------------------------------------------------------------
# Richness completion: ACE estimator + exact hypergeometric rarefaction
# per source
# ---------------------------------------------------------------------------

@register("ace_richness_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
s AS (SELECT source,
             CAST(SUM(CASE WHEN n <= 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s_rare,
             CAST(SUM(CASE WHEN n > 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s_abund,
             CAST(SUM(CASE WHEN n <= 10 THEN n ELSE 0 END)
                  AS BIGINT) AS n_rare,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN n <= 10 THEN n * (n - 1) ELSE 0 END)
                  AS BIGINT) AS sk
      FROM c GROUP BY source),
e AS (SELECT source, s_rare, s_abund, n_rare, f1,
             1.0 - CAST(f1 AS DOUBLE) / n_rare AS cov,
             sk
      FROM s)
SELECT source, s_rare, s_abund, n_rare, f1,
       ROUND(cov, 6) AS coverage_ace,
       ROUND(CASE WHEN cov > 0 THEN GREATEST(
                 (s_rare / cov) * sk
                 / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,
                 0.0) ELSE NULL END, 6) AS gamma2,
       ROUND(CASE WHEN cov > 0 THEN
                 s_abund + s_rare / cov
                 + (f1 / cov) * GREATEST(
                     (s_rare / cov) * sk
                     / (CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,
                     0.0)
             ELSE NULL END, 6) AS ace
FROM e ORDER BY source""")
def ace_richness_by_source(sf_dir: str) -> pd.DataFrame:
    """ACE (abundance-based coverage estimator, Chao & Lee 1992) of
    true vocabulary size per source — the third corner of the
    richness triangle beside Chao1 and jackknife1 (present). Chao1
    reads only F1/F2; ACE uses the WHOLE rare spectrum (types with
    count ≤ 10): sample coverage C = 1 − F1/N_rare estimates the
    probability mass the rare types already capture, Ŝ = S_abund +
    S_rare/C + (F1/C)·γ² with γ² the rare-type CV correcting for
    heterogeneous word frequencies. The practical read: when ACE ≫
    Chao1, the rare-word frequencies are highly uneven (γ² large) and
    Chao1 — which is a LOWER bound — is badly low, so crawl-budget
    decisions keyed on chao1 understate what's left. All-singleton
    degenerate sources (C = 0) yield NULL on both engines. Exact
    integer spectrum sums on the same (source, word, n) reduce."""
    def prof(df: pd.DataFrame) -> pd.DataFrame:
        n = df["y"].to_numpy(np.int64)
        rare = n <= 10
        g = pd.DataFrame({
            "source": df["source"],
            "s_rare": rare.astype(np.int64),
            "s_abund": (~rare).astype(np.int64),
            "n_rare": np.where(rare, n, 0),
            "f1": (n == 1).astype(np.int64),
            "sk": np.where(rare, n * (n - 1), 0)}) \
            .groupby("source", as_index=False).sum()
        return g

    s = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(prof, batch_format="pandas"),
        ["source"], {c: (c, "sum") for c in
                     ["s_rare", "s_abund", "n_rare", "f1", "sk"]}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    sr = s["s_rare"].to_numpy(np.int64).astype(np.float64)
    sa = s["s_abund"].to_numpy(np.int64).astype(np.float64)
    nr = s["n_rare"].to_numpy(np.int64).astype(np.float64)
    f1 = s["f1"].to_numpy(np.int64).astype(np.float64)
    sk = s["sk"].to_numpy(np.int64).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cov = 1.0 - f1 / nr
        g2 = np.maximum((sr / cov) * sk / (nr * (nr - 1)) - 1.0, 0.0)
        ace = sa + sr / cov + (f1 / cov) * g2
    g2 = np.where(cov > 0, g2, np.nan)
    ace = np.where(cov > 0, ace, np.nan)
    return pd.DataFrame({
        "source": s["source"],
        "s_rare": s["s_rare"].astype(np.int64),
        "s_abund": s["s_abund"].astype(np.int64),
        "n_rare": s["n_rare"].astype(np.int64),
        "f1": s["f1"].astype(np.int64),
        "coverage_ace": rha(cov, 6),
        "gamma2": rha(g2, 6),
        "ace": rha(ace, 6)})


@register("rarefaction_curve_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
sp AS (SELECT source, n AS k, CAST(COUNT(*) AS BIGINT) AS fk
       FROM c GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(k * fk) AS BIGINT) AS nn,
               CAST(SUM(fk) AS BIGINT) AS s,
               CAST(MAX(k) AS BIGINT) AS kmax
        FROM sp GROUP BY 1),
mm AS (SELECT source, nn, s, kmax, pct,
              CAST(nn * pct // 100 AS BIGINT) AS m
       FROM tot CROSS JOIN (SELECT UNNEST([25, 50]) AS pct)),
jj AS (SELECT mm.source, mm.pct, mm.nn, mm.m,
              UNNEST(generate_series(0, mm.kmax - 1)) AS j
       FROM mm),
cl AS (SELECT source, pct, j + 1 AS k,
              SUM(CASE WHEN nn - m - j > 0
                       THEN LN(CAST(nn - m - j AS DOUBLE)
                               / (nn - j)) ELSE 0 END)
                  OVER (PARTITION BY source, pct ORDER BY j) AS lr,
              nn - m AS kcap
       FROM jj),
term AS (SELECT sp.source, cl.pct,
                SUM(CASE WHEN sp.k <= cl.kcap
                         THEN sp.fk * EXP(cl.lr) ELSE 0 END) AS kept
         FROM sp JOIN cl ON cl.source = sp.source
                        AND cl.k = sp.k
         GROUP BY 1, 2)
SELECT mm.source, CAST(mm.pct AS BIGINT) AS pct, mm.m,
       mm.s AS observed_types,
       ROUND(mm.s - term.kept, 6) AS expected_types,
       ROUND((mm.s - term.kept) / mm.s * 100.0, 6) AS retained_pct
FROM mm JOIN term ON term.source = mm.source
                 AND term.pct = mm.pct
ORDER BY mm.source, pct""")
def rarefaction_curve_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact hypergeometric rarefaction per source: the expected
    number of word types a subsample of m = 25% / 50% of the tokens
    would contain, E[S_m] = S − Σ_k F_k·C(N−k, m)/C(N, m). This is
    the INTERPOLATION mirror of Good–Toulmin's extrapolation
    (present): observed vocab comparisons between sources are
    confounded by corpus size (more tokens mechanically show more
    types — Heaps), and rarefying every source to the same m is the
    ecology-standard fair comparison. retained_pct is the read: a
    source keeping 95% of its types at half the tokens is
    singleton-poor (vocabulary saturated), one keeping 60% is still
    in Heaps growth. The binomial ratio is computed as
    exp(Σ_{j<k} ln((N−m−j)/(N−j))) — k terms, not m — so both
    engines run the identical O(k_max) cumulative log sum per
    source (well-conditioned ratios near ln(1−m/N), no lgamma
    implementation skew), with types deeper than k > N−m
    contributing exactly 0. Spectrum F_k rides the (source, word,
    n) reduce; everything after is O(distinct counts)."""
    def spec(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "y"], sort=False).size() \
            .rename("fk").reset_index() \
            .rename(columns={"y": "k"})
        g["fk"] = g["fk"].astype(np.int64)
        return g

    sp = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(spec, batch_format="pandas"),
        ["source", "k"], {"fk": ("fk", "sum")}).to_pandas()
    rha = textstats.round_half_away
    rows = []
    for src, g in sp.groupby("source"):
        k = g["k"].to_numpy(np.int64)
        fk = g["fk"].to_numpy(np.int64)
        nn = int((k * fk).sum())
        s = int(fk.sum())
        kmax = int(k.max())
        for pct in (25, 50):
            m = nn * pct // 100
            j = np.arange(kmax, dtype=np.float64)
            num = nn - m - j
            lr = np.cumsum(np.where(num > 0,
                                    np.log(np.maximum(num, 1.0)
                                           / (nn - j)), 0.0))
            kcap = nn - m
            keep = k <= kcap
            kept = float((fk[keep] * np.exp(lr[k[keep] - 1])).sum())
            rows.append((src, pct, m, s, float(rha(s - kept, 6)),
                         float(rha((s - kept) / s * 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "source", "pct", "m", "observed_types", "expected_types",
        "retained_pct"]).astype({
            "pct": np.int64, "m": np.int64,
            "observed_types": np.int64}) \
        .sort_values(["source", "pct"], ignore_index=True)


# ---------------------------------------------------------------------------
# Method comparison: Passing–Bablok and log-ratio Bland–Altman on the
# daily views/clicks pair
# ---------------------------------------------------------------------------

#: the _VC_MOM_SQL zero-filled calendar, with the day index kept so
#: pairs (a.d < b.d) are well-defined.
_VC_DAY_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d, COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y
      FROM cal LEFT JOIN e ON e.d = cal.d)"""


@register("passing_bablok_views_clicks", sql=f"""
WITH {_VC_DAY_SQL},
pr AS (SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
       FROM g a JOIN g b ON b.d > a.d
       WHERE b.x != a.x),
val AS (SELECT s FROM pr WHERE s != -1.0),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
              CAST(SUM(CASE WHEN s < -1.0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS k
       FROM val),
os AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM val),
bsel AS (SELECT nv, k,
                CASE WHEN nv % 2 = 1
                     THEN (SELECT s FROM os
                           WHERE rn = (nv + 1) // 2 + k)
                     ELSE ((SELECT s FROM os
                            WHERE rn = nv // 2 + k)
                           + (SELECT s FROM os
                              WHERE rn = nv // 2 + 1 + k)) / 2.0
                END AS b
         FROM st WHERE nv > 0),
ri AS (SELECT g.y - bsel.b * g.x AS r,
              ROW_NUMBER() OVER (ORDER BY g.y - bsel.b * g.x)
                  AS rn,
              COUNT(*) OVER () AS n
       FROM g, bsel)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM ri) AS n_days,
       nv AS n_slopes, k AS k_offset,
       ROUND(b, 6) AS pb_slope,
       ROUND(CASE WHEN (SELECT MAX(n) FROM ri) % 2 = 1
                  THEN (SELECT r FROM ri WHERE rn =
                        ((SELECT MAX(n) FROM ri) + 1) // 2)
                  ELSE ((SELECT r FROM ri WHERE rn =
                         (SELECT MAX(n) FROM ri) // 2)
                        + (SELECT r FROM ri WHERE rn =
                           (SELECT MAX(n) FROM ri) // 2 + 1)) / 2.0
             END, 6) AS pb_intercept
FROM bsel""")
def passing_bablok_views_clicks(sf_dir: str) -> pd.DataFrame:
    """Passing–Bablok regression of daily clicks on daily views —
    the NONPARAMETRIC member of the errors-in-variables family
    beside Deming/RMA (present): the shifted median of all pairwise
    slopes, with the classical offset K = #{slopes < −1} making the
    estimator invariant to swapping the axes (the property OLS
    lacks and Deming only gets under the right λ). Where Deming
    assumes Gaussian errors in both coordinates, PB assumes only
    continuity — a handful of outlier days (launch spikes) that
    drag every moment-based slope leave the slope median untouched,
    so pb_slope far from slope_deming IS the outlier diagnosis.
    Conventions pinned on both engines: vertical pairs (equal x)
    excluded, slopes exactly −1 excluded (the classical rule — they
    cannot be ranked against their own negation), even-count
    medians average the two middle order statistics, intercept =
    median(y − b·x) over all days. O(days²) pairs is calendar-
    bounded arithmetic, never row-scale."""
    g = _dayvec(sf_dir)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    y = g["y"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    ii, jj = np.triu_indices(n, k=1)
    dx = x[jj] - x[ii]
    keep = dx != 0
    s = (y[jj] - y[ii])[keep] / dx[keep]
    s = s[s != -1.0]
    nv = len(s)
    if nv == 0:
        return pd.DataFrame(columns=[
            "n_days", "n_slopes", "k_offset", "pb_slope",
            "pb_intercept"])
    k = int((s < -1.0).sum())
    s.sort()
    if nv % 2 == 1:
        b = float(s[(nv + 1) // 2 + k - 1])
    else:
        b = float(s[nv // 2 + k - 1] + s[nv // 2 + k]) / 2.0
    r = np.sort(y - b * x)
    if n % 2 == 1:
        a = float(r[(n + 1) // 2 - 1])
    else:
        a = float(r[n // 2 - 1] + r[n // 2]) / 2.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_slopes": np.array([nv], np.int64),
        "k_offset": np.array([k], np.int64),
        "pb_slope": [float(rha(b, 6))],
        "pb_intercept": [float(rha(a, 6))]})


@register("bland_altman_views_clicks", sql=f"""
WITH {_VC_DAY_SQL},
lr AS (SELECT LN(CAST(y AS DOUBLE) / x) AS dl
       FROM g WHERE x > 0 AND y > 0),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dl) AS s1,
             SUM(dl * dl) AS s2
      FROM lr),
p AS (SELECT n, s1 / n AS bias,
             SQRT((s2 - s1 * s1 / n) / (n - 1.0)) AS sd
      FROM s WHERE n > 1)
SELECT n AS n_days_pos,
       ROUND(bias, 6) AS bias_logratio,
       ROUND(EXP(bias), 6) AS ratio_geomean,
       ROUND(bias - 1.96 * sd, 6) AS loa_lo,
       ROUND(bias + 1.96 * sd, 6) AS loa_hi,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lr, p
        WHERE dl < bias - 1.96 * sd OR dl > bias + 1.96 * sd)
           AS outside_days
FROM p""")
def bland_altman_views_clicks(sf_dir: str) -> pd.DataFrame:
    """Bland–Altman limits of agreement on the DAILY LOG-RATIO
    ln(clicks/views) — the agreement read the regression family
    structurally can't give. A slope near the overall CTR with high
    r² still permits individual days whose click yield is half or
    double the norm; BA asks the per-day question directly: bias is
    the geometric-mean log-yield (exp(bias) = the typical
    clicks-per-view), and the 1.96·SD limits bound where ~95% of
    days should land if the relationship is stable. outside_days is
    the actionable list-length: days beyond the limits are exactly
    the tracking-outage / bot-burst candidates the daily-anomaly
    queries hunt with thresholds — here they fall out of the
    method-comparison frame with no tuning. Log ratios (not raw
    differences) because click volume scales with view volume, the
    proportional-error case Bland & Altman's log variant exists
    for. Zero-count days are excluded (log undefined) and counted
    out of n_days_pos; ≤1 positive day → empty on both engines."""
    g = _dayvec(sf_dir)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    y = g["y"].to_numpy(np.int64).astype(np.float64)
    keep = (x > 0) & (y > 0)
    dl = np.log(y[keep] / x[keep])
    n = len(dl)
    if n <= 1:
        return pd.DataFrame(columns=[
            "n_days_pos", "bias_logratio", "ratio_geomean",
            "loa_lo", "loa_hi", "outside_days"])
    s1, s2 = float(dl.sum()), float((dl * dl).sum())
    bias = s1 / n
    sd = np.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days_pos": np.array([n], np.int64),
        "bias_logratio": [float(rha(bias, 6))],
        "ratio_geomean": [float(rha(np.exp(bias), 6))],
        "loa_lo": [float(rha(lo, 6))],
        "loa_hi": [float(rha(hi, 6))],
        "outside_days": np.array(
            [int(((dl < lo) | (dl > hi)).sum())], np.int64)})


# ---------------------------------------------------------------------------
# Temporal point-process summaries: Ripley's K and Clark–Evans on
# purchase arrival times
# ---------------------------------------------------------------------------

#: second-quantized purchase arrival histogram (s, c) — the point
#: pattern both summaries read; bounded by window seconds, not rows.
_PP_HIST_SQL = """
h AS (SELECT epoch_us(ts) // 1000000 AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
t AS (SELECT MIN(s) AS lo, MAX(s) AS hi,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(MAX(s) - MIN(s) + 1 AS BIGINT) AS tt
      FROM h)"""


def _purchase_second_hist(sf_dir: str):
    """Sorted (seconds, counts) int64 arrays for purchase events.
    Only (second, count) partials shuffle; the driver array is
    bounded by the window's distinct seconds, never by row count."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["event_type"].to_numpy() == "purchase"
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)[k]
        return pd.DataFrame({"s": us // 1_000_000,
                             "c": np.ones(int(k.sum()), np.int64)})

    hh = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["s"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("s", ignore_index=True)
    return hh["s"].to_numpy(np.int64), hh["c"].to_numpy(np.int64)


@register("ripley_k_purchase_times", sql=f"""
WITH {_PP_HIST_SQL},
hs AS (SELECT UNNEST([60, 600, 3600]) AS hw),
pw AS (SELECT hs.hw,
              CAST(SUM(a.c * b.c) AS BIGINT) - (SELECT n FROM t)
                  AS pairs
       FROM hs JOIN h a ON TRUE
               JOIN h b ON b.s BETWEEN a.s - hs.hw
                                   AND a.s + hs.hw
       GROUP BY 1)
SELECT CAST(pw.hw AS BIGINT) AS h_seconds, t.n AS n_points,
       pw.pairs AS pairs_within,
       ROUND(CAST(t.tt AS DOUBLE) * pw.pairs
             / (CAST(t.n AS DOUBLE) * (t.n - 1)), 6) AS k_hat,
       ROUND(2.0 * pw.hw - CAST(pw.hw AS DOUBLE) * pw.hw / t.tt, 6)
           AS k_csr,
       ROUND(CAST(t.tt AS DOUBLE) * pw.pairs
             / (CAST(t.n AS DOUBLE) * (t.n - 1))
             / (2.0 * pw.hw - CAST(pw.hw AS DOUBLE) * pw.hw / t.tt),
             6) AS cluster_ratio
FROM pw, t ORDER BY h_seconds""")
def ripley_k_purchase_times(sf_dir: str) -> pd.DataFrame:
    """Ripley's K-function on the 1-D purchase arrival pattern at
    h = 1 min / 10 min / 1 h: K̂(h) = T·(ordered pairs within h)/
    (n(n−1)) against the EXACT bounded-window CSR reference
    K_csr = 2h − h²/T (for U,V uniform on [0,T], P(|U−V|≤h) is
    exactly 2h/T − h²/T², so no ad-hoc edge correction is needed —
    the boundary is priced into the null). The multi-scale read is
    what the burst/self-excitation queries can't give: those test
    ONE timescale each, while the cluster_ratio profile across h
    localizes WHERE clustering lives — ratio ≫ 1 at 60 s decaying
    by 1 h is micro-bursting (retry storms, cart double-fires),
    flat elevation through 1 h is session-level demand waves, and
    the capacity consequence differs (queue buffers vs fleet
    scaling). Second-quantized times (documented); pair counts are
    exact integers off the (s, c) histogram via prefix sums — the
    O(n²) pair sum is never materialized on either engine."""
    s, c = _purchase_second_hist(sf_dir)
    n = int(c.sum())
    if n < 2:
        return pd.DataFrame(columns=[
            "h_seconds", "n_points", "pairs_within", "k_hat",
            "k_csr", "cluster_ratio"])
    tt = int(s[-1] - s[0] + 1)
    pc = np.concatenate([[0], np.cumsum(c)])
    rha = textstats.round_half_away
    rows = []
    for hw in (60, 600, 3600):
        lo = np.searchsorted(s, s - hw, side="left")
        hi = np.searchsorted(s, s + hw, side="right")
        within = pc[hi] - pc[lo]
        pairs = int((c * within).sum()) - n
        k_hat = float(tt) * pairs / (float(n) * (n - 1))
        k_csr = 2.0 * hw - float(hw) * hw / tt
        rows.append((hw, n, pairs, float(rha(k_hat, 6)),
                     float(rha(k_csr, 6)),
                     float(rha(k_hat / k_csr, 6))))
    return pd.DataFrame(rows, columns=[
        "h_seconds", "n_points", "pairs_within", "k_hat", "k_csr",
        "cluster_ratio"]).astype({
            "h_seconds": np.int64, "n_points": np.int64,
            "pairs_within": np.int64})


@register("clark_evans_purchase_times", sql=f"""
WITH {_PP_HIST_SQL},
nn AS (SELECT s, c, LAG(s) OVER (ORDER BY s) AS ps,
              LEAD(s) OVER (ORDER BY s) AS ns
       FROM h),
d AS (SELECT CASE WHEN c > 1 THEN 0
                  ELSE LEAST(COALESCE(s - ps, 4611686018427387904),
                             COALESCE(ns - s, 4611686018427387904))
             END AS dist, c
      FROM nn),
st AS (SELECT SUM(CAST(dist AS DOUBLE) * c) / (SELECT n FROM t)
           AS mean_nn
       FROM d)
SELECT t.n AS n_points, t.tt AS window_s,
       ROUND(st.mean_nn, 6) AS mean_nn_s,
       ROUND(CAST(t.tt AS DOUBLE) / (2.0 * t.n), 6) AS expected_nn_s,
       ROUND(st.mean_nn / (CAST(t.tt AS DOUBLE) / (2.0 * t.n)), 6)
           AS ce_ratio,
       ROUND((st.mean_nn - CAST(t.tt AS DOUBLE) / (2.0 * t.n))
             / (CAST(t.tt AS DOUBLE) / (2.0 * t.n) / SQRT(t.n)), 6)
           AS z,
       CAST(CASE WHEN (st.mean_nn
                       - CAST(t.tt AS DOUBLE) / (2.0 * t.n))
                      / (CAST(t.tt AS DOUBLE) / (2.0 * t.n)
                         / SQRT(t.n)) < -1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS clustered
FROM t, st WHERE t.n >= 2""")
def clark_evans_purchase_times(sf_dir: str) -> pd.DataFrame:
    """Clark–Evans aggregation index adapted to the 1-D arrival
    line: R = (mean nearest-neighbor gap)/(T/2n), the CSR
    expectation for a Poisson process of the observed intensity
    (NN distance ~ Exp(2λ), mean 1/2λ). One number beside Ripley's
    multi-scale curve: R ≪ 1 says the TYPICAL purchase has another
    purchase much closer than chance — clustering as experienced
    per event, which an hourly-count dispersion test dilutes when
    bursts are shorter than the bucket. The z-score uses the
    exponential's SD = mean, so SE = (T/2n)/√n (documented; the
    classic 2-D CE normal approximation, boundary one-sidedness
    ignored on both engines identically). Same-second co-arrivals
    have NN distance exactly 0 — at purchase rates where that is
    common, R collapses toward 0 and says so honestly. All
    distances are integer seconds off the shared histogram."""
    s, c = _purchase_second_hist(sf_dir)
    n = int(c.sum())
    if n < 2:
        return pd.DataFrame(columns=[
            "n_points", "window_s", "mean_nn_s", "expected_nn_s",
            "ce_ratio", "z", "clustered"])
    tt = int(s[-1] - s[0] + 1)
    big = np.int64(4611686018427387904)
    prev_gap = np.concatenate([[big], np.diff(s)])
    next_gap = np.concatenate([np.diff(s), [big]])
    dist = np.where(c > 1, np.int64(0),
                    np.minimum(prev_gap, next_gap))
    mean_nn = float((dist.astype(np.float64) * c).sum()) / n
    exp_nn = float(tt) / (2.0 * n)
    z = (mean_nn - exp_nn) / (exp_nn / np.sqrt(n))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_points": np.array([n], np.int64),
        "window_s": np.array([tt], np.int64),
        "mean_nn_s": [float(rha(mean_nn, 6))],
        "expected_nn_s": [float(rha(exp_nn, 6))],
        "ce_ratio": [float(rha(mean_nn / exp_nn, 6))],
        "z": [float(rha(z, 6))],
        "clustered": np.array([1 if z < -1.96 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Link prediction on the kNN graph: Adamic–Adar + the RA/Jaccard panel
# ---------------------------------------------------------------------------

def _knn_undirected(sf_dir: str):
    """Undirected k=2 kNN edge set as a (u < v) DataFrame plus the
    vec_id→label Series — the _knn_label_edges recipe with node ids
    kept. Driver work is bounded by the GRAPH (2 edges per node),
    never by event rows; the distance computation is the
    distributed brute_force_topk stage."""
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
    out["rank"] = (out.groupby("node", sort=False).cumcount()
                   + 1).astype(np.int64)
    e = out[out["rank"] <= 2]
    u = np.minimum(e["node"].to_numpy(np.int64),
                   e["vec_id"].to_numpy(np.int64))
    v = np.maximum(e["node"].to_numpy(np.int64),
                   e["vec_id"].to_numpy(np.int64))
    ue = pd.DataFrame({"u": u, "v": v}).drop_duplicates(
        ignore_index=True)
    return ue, labs


def _link_scores(sf_dir: str) -> pd.DataFrame:
    """Non-adjacent distance-2 pairs with common-neighbor count,
    degrees and the AA/RA sums (exact same candidate set and
    float expressions as the SQL oracle)."""
    ue, labs = _knn_undirected(sf_dir)
    adj = pd.concat([ue.rename(columns={"u": "a", "v": "b"}),
                     ue.rename(columns={"v": "a", "u": "b"})
                     [["a", "b"]]], ignore_index=True)
    deg = adj.groupby("a").size().rename("d")
    two = adj.merge(adj, on="b", suffixes=("_1", "_2"))
    two = two[two["a_1"] < two["a_2"]]
    edge_keys = set(zip(ue["u"], ue["v"]))
    two = two[[(a, b) not in edge_keys
               for a, b in zip(two["a_1"], two["a_2"])]]
    dw = deg.loc[two["b"].to_numpy()].to_numpy(np.float64)
    two = two.assign(aa=1.0 / np.log(dw), ra=1.0 / dw)
    sc = two.groupby(["a_1", "a_2"]).agg(
        common=("b", "size"), aa=("aa", "sum"),
        ra=("ra", "sum")).reset_index() \
        .rename(columns={"a_1": "u", "a_2": "v"})
    sc["du"] = deg.loc[sc["u"].to_numpy()].to_numpy(np.int64)
    sc["dv"] = deg.loc[sc["v"].to_numpy()].to_numpy(np.int64)
    sc["same_label"] = (labs.loc[sc["u"].to_numpy()].to_numpy()
                        == labs.loc[sc["v"].to_numpy()]
                        .to_numpy()).astype(np.int64)
    return sc


#: shared candidate CTE: undirected k=2 kNN edges, degrees,
#: non-adjacent distance-2 pairs with AA/RA sums.
_LINKPRED_SQL = """
sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor)
                 AS rank
      FROM sims),
de AS (SELECT node, neighbor FROM r WHERE rank <= 2),
ue AS (SELECT DISTINCT LEAST(node, neighbor) AS u,
               GREATEST(node, neighbor) AS v
       FROM de),
adj AS (SELECT u AS a, v AS b FROM ue
        UNION ALL SELECT v, u FROM ue),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d
        FROM adj GROUP BY 1),
cand AS (SELECT x.a AS u, y.a AS v, x.b AS w
         FROM adj x JOIN adj y ON x.b = y.b AND x.a < y.a
         WHERE NOT EXISTS (SELECT 1 FROM ue
                           WHERE ue.u = x.a AND ue.v = y.a)),
sc AS (SELECT cand.u, cand.v,
              CAST(COUNT(*) AS BIGINT) AS common,
              SUM(1.0 / LN(CAST(deg.d AS DOUBLE))) AS aa,
              SUM(1.0 / deg.d) AS ra
       FROM cand JOIN deg ON deg.a = cand.w GROUP BY 1, 2),
scd AS (SELECT sc.*, du.d AS du, dv.d AS dv,
               CASE WHEN lu.label = lv.label THEN 1 ELSE 0 END
                   AS same_label
        FROM sc JOIN deg du ON du.a = sc.u
                JOIN deg dv ON dv.a = sc.v
                JOIN embeddings lu ON lu.vec_id = sc.u
                JOIN embeddings lv ON lv.vec_id = sc.v)"""


@register("adamic_adar_link_prediction", sql=f"""
WITH {_LINKPRED_SQL}
SELECT u, v, common, ROUND(aa, 6) AS aa_score,
       ROUND(ra, 6) AS ra_score,
       CAST(same_label AS BIGINT) AS same_label
FROM scd
ORDER BY ROUND(aa, 9) DESC, u, v LIMIT 10""")
def adamic_adar_link_prediction(sf_dir: str) -> pd.DataFrame:
    """Adamic–Adar link prediction on the k=2 kNN graph: for every
    NON-adjacent distance-2 pair, AA = Σ_{w∈Γ(u)∩Γ(v)} 1/ln(deg w),
    top-10. These are the edges the graph is 'missing' — pairs the
    embedding puts two hops apart that shared-neighborhood evidence
    says belong together — and the same_label column turns the list
    into an embedding audit the mixing-matrix family can't do at
    pair grain: a predicted link with same_label=0 is a SPECIFIC
    retrieval confusion candidate (the two docs will co-appear in
    each other's expanded neighborhoods), where homophily only says
    confusion exists somewhere. AA's 1/ln(deg) weighting is the
    canonical hub discount — a shared low-degree neighbor is strong
    evidence, a shared hub is nearly none. Common neighbors have
    deg ≥ 2 by construction so ln(deg) > 0 always; ranking rounds
    at 9dp with (u, v) lexicographic ties; same 6dp-cosine k=2
    edge recipe as the label-mixing family."""
    sc = _link_scores(sf_dir)
    rha = textstats.round_half_away
    sc = sc.assign(aak=rha(sc["aa"].to_numpy(), 9)) \
        .sort_values(["aak", "u", "v"],
                     ascending=[False, True, True],
                     kind="mergesort").head(10)
    return pd.DataFrame({
        "u": sc["u"].to_numpy(np.int64),
        "v": sc["v"].to_numpy(np.int64),
        "common": sc["common"].to_numpy(np.int64),
        "aa_score": rha(sc["aa"].to_numpy(), 6),
        "ra_score": rha(sc["ra"].to_numpy(), 6),
        "same_label": sc["same_label"].to_numpy(np.int64)})


@register("link_prediction_scorer_panel", sql=f"""
WITH {_LINKPRED_SQL},
aa10 AS (SELECT u, v FROM scd
         ORDER BY ROUND(aa, 9) DESC, u, v LIMIT 10)
SELECT scd.u, scd.v, scd.common,
       ROUND(scd.ra, 6) AS ra_score,
       ROUND(CAST(scd.common AS DOUBLE)
             / (scd.du + scd.dv - scd.common), 6) AS jaccard,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM aa10
                              WHERE aa10.u = scd.u
                                AND aa10.v = scd.v)
                 THEN 1 ELSE 0 END AS BIGINT) AS in_aa_top10
FROM scd
ORDER BY ROUND(scd.ra, 9) DESC, scd.u, scd.v LIMIT 10""")
def link_prediction_scorer_panel(sf_dir: str) -> pd.DataFrame:
    """The resource-allocation top-10 over the same candidate set,
    with each pair's neighborhood Jaccard and whether it also made
    the AA top-10. Three scorers triangulate exactly as the
    collocation panel does for bigrams: RA's 1/deg discounts hubs
    HARDER than AA's 1/ln(deg), so pairs that hold rank under both
    are hub-independent evidence (safe merge/link), pairs high on
    AA but gone from RA owe their score to one busy hub, and
    Jaccard — which normalizes by total neighborhood size —
    separates 'share most of their few neighbors' (tight local
    cluster) from 'share 3 of 40'. in_aa_top10 makes the scorer
    agreement explicit in the output instead of requiring a
    cross-query join. Identical candidate CTE, 9dp rank rounding,
    lexicographic ties."""
    sc = _link_scores(sf_dir)
    rha = textstats.round_half_away
    aa10 = sc.assign(aak=rha(sc["aa"].to_numpy(), 9)) \
        .sort_values(["aak", "u", "v"],
                     ascending=[False, True, True],
                     kind="mergesort").head(10)
    aa_keys = set(zip(aa10["u"], aa10["v"]))
    out = sc.assign(rak=rha(sc["ra"].to_numpy(), 9)) \
        .sort_values(["rak", "u", "v"],
                     ascending=[False, True, True],
                     kind="mergesort").head(10)
    jac = out["common"].to_numpy(np.float64) \
        / (out["du"].to_numpy(np.int64)
           + out["dv"].to_numpy(np.int64)
           - out["common"].to_numpy(np.int64))
    return pd.DataFrame({
        "u": out["u"].to_numpy(np.int64),
        "v": out["v"].to_numpy(np.int64),
        "common": out["common"].to_numpy(np.int64),
        "ra_score": rha(out["ra"].to_numpy(), 6),
        "jaccard": rha(jac, 6),
        "in_aa_top10": np.array(
            [1 if (a, b) in aa_keys else 0
             for a, b in zip(out["u"], out["v"])], np.int64)})


# ---------------------------------------------------------------------------
# Conditional heteroskedasticity: Engle's ARCH-LM + McLeod–Li on the
# daily-trend residuals
# ---------------------------------------------------------------------------

@register("arch_lm_daily", sql=f"""
WITH {_HET_SQL},
pr AS (SELECT a.u AS u1, b.u AS u0
       FROM r a JOIN r b ON b.t = a.t - 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(u0) AS sx, SUM(u1) AS sy,
             SUM(u0 * u0) AS sxx, SUM(u1 * u1) AS syy,
             SUM(u0 * u1) AS sxy
      FROM pr),
f AS (SELECT m,
             (m * sxy - sx * sy) / (m * sxx - sx * sx) AS alpha1,
             (m * sxy - sx * sy) * (m * sxy - sx * sy)
                 / ((m * sxx - sx * sx) * (m * syy - sy * sy))
                 AS r2
      FROM s)
SELECT m AS n_pairs,
       ROUND(alpha1, 6) AS alpha1,
       ROUND(r2, 6) AS arch_r2,
       ROUND(m * r2, 6) AS arch_lm,
       CAST(CASE WHEN m * r2 > 3.841459 THEN 1 ELSE 0 END
            AS BIGINT) AS arch_rejected
FROM f""")
def arch_lm_daily(sf_dir: str) -> pd.DataFrame:
    """Engle's ARCH(1) LM test on the daily-trend residuals:
    regress today's squared residual on yesterday's, LM = m·R²
    against χ²₁. This completes the variance-structure triptych —
    Breusch–Pagan/White ask whether variance moves with TIME (a
    deterministic schedule), this asks whether it moves with its
    own PAST (volatility clustering): alpha1 ≈ 0.4 means a shock
    day begets a noisy next day regardless of where in the window
    it falls, which is the regime where an EWMA/GARCH-style
    variance forecast beats every constant band the registry's
    anomaly queries draw, and alpha1 is directly the ARCH(1)
    coefficient a variance forecaster would seed with. Distinct
    from volatility_clustering_acf (|Δcount| autocorrelation —
    level changes), this conditions on the TREND residual so a
    steep growth slope can't masquerade as volatility. Same
    _HET_SQL residual spine; single-regressor closed form."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = y.mean() - b * t.mean()
    u = (y - a - b * t) ** 2
    u0, u1 = u[:-1], u[1:]
    m = len(u0)
    sx, sy = u0.sum(), u1.sum()
    sxx, syy = (u0 * u0).sum(), (u1 * u1).sum()
    sxy = (u0 * u1).sum()
    alpha1 = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    r2 = (m * sxy - sx * sy) ** 2 \
        / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([m], np.int64),
        "alpha1": [float(rha(alpha1, 6))],
        "arch_r2": [float(rha(r2, 6))],
        "arch_lm": [float(rha(m * r2, 6))],
        "arch_rejected": np.array(
            [1 if m * r2 > 3.841459 else 0], np.int64)})


@register("mcleod_li_daily", sql=f"""
WITH {_HET_SQL},
mu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(u) / COUNT(*)
           AS ubar
       FROM r),
den AS (SELECT SUM((r.u - mu.ubar) * (r.u - mu.ubar)) AS d0
        FROM r, mu),
lag AS (SELECT UNNEST([1, 2, 3, 4, 5]) AS k),
rk AS (SELECT lag.k,
              SUM((a.u - mu.ubar) * (b.u - mu.ubar))
                  / (SELECT d0 FROM den) AS rk
       FROM lag JOIN r a ON TRUE
                JOIN r b ON b.t = a.t - lag.k, mu
       GROUP BY lag.k),
q AS (SELECT (SELECT MAX(n) FROM mu) AS n,
             SUM(rk * rk / ((SELECT MAX(n) FROM mu) - k)) AS s,
             MAX(CASE WHEN k = 1 THEN rk END) AS r1
      FROM rk)
SELECT n AS n_days,
       ROUND(r1, 6) AS r1_sq_resid,
       ROUND(n * (n + 2.0) * s, 6) AS q_stat,
       CAST(CASE WHEN n * (n + 2.0) * s > 11.070498
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM q""")
def mcleod_li_daily(sf_dir: str) -> pd.DataFrame:
    """McLeod–Li portmanteau test: Ljung–Box Q over lags 1–5 of the
    SQUARED trend residuals against χ²₅ (11.07). The ARCH-LM row
    tests one lag with a regression; this sums autocorrelation
    evidence across a working week of lags, catching conditional-
    variance structure at horizons the single-lag test misses
    (e.g. volatility that echoes at the weekly cadence — lag-5
    in business-day-dominated data). Read the pair as the
    standard diagnostic ladder: McLeod–Li significant + ARCH-LM
    significant with alpha1 large → ARCH(1) is an adequate model;
    McLeod–Li significant but lag-1 clean → the clustering lives
    at longer lags and a higher-order variance model is needed.
    Distinct from ljung_box_daily, which tests the LEVEL series —
    a series can pass that (no linear forecastability) while
    failing this (forecastable RISK), the classic GARCH
    signature. Same spine; r_k uses the full-series centered
    denominator both engines."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = y.mean() - b * t.mean()
    u = (y - a - b * t) ** 2
    ubar = u.sum() / n
    d0 = ((u - ubar) ** 2).sum()
    s = 0.0
    r1 = 0.0
    for k in range(1, 6):
        if k >= n:       # no lag-k pairs; SQL's inner join emits none
            break
        rk = ((u[k:] - ubar) * (u[:-k] - ubar)).sum() / d0
        if k == 1:
            r1 = rk
        s += rk * rk / (n - k)
    q = n * (n + 2.0) * s
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "r1_sq_resid": [float(rha(r1, 6))],
        "q_stat": [float(rha(q, 6))],
        "rejected": np.array([1 if q > 11.070498 else 0],
                             np.int64)})


# ---------------------------------------------------------------------------
# Paired circular statistics: per-user view-hour vs purchase-hour
# alignment on the 24 h clock
# ---------------------------------------------------------------------------

#: per-user circular mean angles of view hours and purchase hours
#: (users with at least one of each), as atan2 of the trig sums.
_CIRC_PAIR_SQL = """
per AS (SELECT user_id,
               SUM(CASE WHEN event_type = 'view'
                        THEN SIN(2 * PI() * hour(ts) / 24)
                        ELSE 0 END) AS vs,
               SUM(CASE WHEN event_type = 'view'
                        THEN COS(2 * PI() * hour(ts) / 24)
                        ELSE 0 END) AS vc,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN SIN(2 * PI() * hour(ts) / 24)
                        ELSE 0 END) AS ps,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN COS(2 * PI() * hour(ts) / 24)
                        ELSE 0 END) AS pc,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                             ELSE 0 END) AS BIGINT) AS nv,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END) AS BIGINT) AS np
        FROM events GROUP BY 1),
ab AS (SELECT ATAN2(vs, vc) AS a, ATAN2(ps, pc) AS b
       FROM per WHERE nv > 0 AND np > 0)"""


@register("circular_corr_view_purchase_hours", sql=f"""
WITH {_CIRC_PAIR_SQL},
mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              ATAN2(SUM(SIN(a)), SUM(COS(a))) AS abar,
              ATAN2(SUM(SIN(b)), SUM(COS(b))) AS bbar
       FROM ab),
cc AS (SELECT mn.n, mn.abar, mn.bbar,
              SUM(SIN(ab.a - mn.abar) * SIN(ab.b - mn.bbar)) AS sab,
              SUM(SIN(ab.a - mn.abar) * SIN(ab.a - mn.abar)) AS saa,
              SUM(SIN(ab.b - mn.bbar) * SIN(ab.b - mn.bbar)) AS sbb
       FROM ab, mn GROUP BY 1, 2, 3)
SELECT n AS n_users,
       ROUND(((abar / (2 * PI()) * 24) + 24) % 24, 6)
           AS mean_view_hour,
       ROUND(((bbar / (2 * PI()) * 24) + 24) % 24, 6)
           AS mean_purchase_hour,
       ROUND(sab / SQRT(saa * sbb), 6) AS circ_corr
FROM cc WHERE n >= 2 AND saa > 0 AND sbb > 0""")
def circular_corr_view_purchase_hours(sf_dir: str) -> pd.DataFrame:
    """Jammalamadaka–SenGupta circular-circular correlation between
    each user's circular-mean VIEW hour and circular-mean PURCHASE
    hour: ρ = Σsin(aᵤ−ā)sin(bᵤ−b̄)/√(Σsin²·Σsin²). The circadian
    family (concentration, harmonic fit) describes the population
    clock; this is the PAIRED question — do night-browsing users
    also buy at night — which a linear correlation of hour numbers
    cannot ask: hour 23 and hour 1 are 2 apart on the clock but 22
    apart to Pearson, so any population straddling midnight
    (exactly where e-commerce peaks) shreds the linear version.
    ρ ≈ 0 with both means well-defined says browsing and buying
    clocks decouple (purchase timing driven by something else —
    paydays, price drops), which changes when to SEND the nudge.
    Per-user trig sums reduce distributed; angles are atan2 of
    exact sums; n users of each-type activity; degenerate zero
    spread yields no row on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        hr = df["ts"].dt.hour.to_numpy(np.int64)
        th = 2 * np.pi * hr / 24
        isv = (et == "view").astype(np.float64)
        isp = (et == "purchase").astype(np.float64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "vs": np.sin(th) * isv, "vc": np.cos(th) * isv,
            "ps": np.sin(th) * isp, "pc": np.cos(th) * isp,
            "nv": isv.astype(np.int64), "np_": isp.astype(np.int64)})

    per = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {c: (c, "sum") for c in
                      ["vs", "vc", "ps", "pc", "nv", "np_"]}) \
        .to_pandas()
    per = per[(per["nv"] > 0) & (per["np_"] > 0)]
    a = np.arctan2(per["vs"].to_numpy(np.float64),
                   per["vc"].to_numpy(np.float64))
    b = np.arctan2(per["ps"].to_numpy(np.float64),
                   per["pc"].to_numpy(np.float64))
    n = len(a)
    if n < 2:
        return pd.DataFrame(columns=[
            "n_users", "mean_view_hour", "mean_purchase_hour",
            "circ_corr"])
    abar = np.arctan2(np.sin(a).sum(), np.cos(a).sum())
    bbar = np.arctan2(np.sin(b).sum(), np.cos(b).sum())
    sa, sb = np.sin(a - abar), np.sin(b - bbar)
    saa, sbb = float((sa * sa).sum()), float((sb * sb).sum())
    if saa <= 0 or sbb <= 0:
        return pd.DataFrame(columns=[
            "n_users", "mean_view_hour", "mean_purchase_hour",
            "circ_corr"])
    rho = float((sa * sb).sum()) / np.sqrt(saa * sbb)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "mean_view_hour": [float(rha((abar / (2 * np.pi) * 24 + 24)
                                     % 24, 6))],
        "mean_purchase_hour": [float(rha((bbar / (2 * np.pi) * 24
                                          + 24) % 24, 6))],
        "circ_corr": [float(rha(rho, 6))]})


@register("circular_shift_view_purchase_hours", sql=f"""
WITH {_CIRC_PAIR_SQL},
dl AS (SELECT SIN(b) * COS(a) - COS(b) * SIN(a) AS sd,
              COS(b) * COS(a) + SIN(b) * SIN(a) AS cd
       FROM ab),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(sd) AS ss, SUM(cd) AS sc
       FROM dl),
p AS (SELECT n, ATAN2(ss, sc) AS mu,
             SQRT(ss * ss + sc * sc) / n AS rbar
      FROM st WHERE n >= 2)
SELECT n AS n_users,
       ROUND(mu / (2 * PI()) * 24, 6) AS mean_shift_hours,
       ROUND(rbar, 6) AS resultant,
       ROUND(n * rbar * rbar, 6) AS rayleigh_z,
       CAST(CASE WHEN n * rbar * rbar > 2.995732 THEN 1 ELSE 0 END
            AS BIGINT) AS consistent_shift
FROM p""")
def circular_shift_view_purchase_hours(sf_dir: str) -> pd.DataFrame:
    """The wrapped per-user shift δᵤ = purchase-hour − view-hour
    angle, summarized by its circular mean (in hours, ∈ (−12, 12])
    and resultant length, with the Rayleigh test z = n·R̄² for
    whether a consistent shift exists at all (p ≈ e^(−z), flag at
    −ln 0.05). This answers what the correlation row deliberately
    doesn't: ρ says the clocks co-vary, δ says by HOW MUCH and in
    which direction — a tight +3 h shift (R̄ near 1, Rayleigh
    significant) means users reliably buy three hours after their
    browsing window closes, so conversion nudges trail the view
    peak by that lag; Rayleigh-insignificant with ρ high is the
    subtler read (aligned clocks, user-specific offsets that
    cancel). sin/cos of the difference computed via the angle-sum
    identities from the SAME per-user trig sums — no second pass
    over events; wrap-around arithmetic exact on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        hr = df["ts"].dt.hour.to_numpy(np.int64)
        th = 2 * np.pi * hr / 24
        isv = (et == "view").astype(np.float64)
        isp = (et == "purchase").astype(np.float64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "vs": np.sin(th) * isv, "vc": np.cos(th) * isv,
            "ps": np.sin(th) * isp, "pc": np.cos(th) * isp,
            "nv": isv.astype(np.int64), "np_": isp.astype(np.int64)})

    per = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {c: (c, "sum") for c in
                      ["vs", "vc", "ps", "pc", "nv", "np_"]}) \
        .to_pandas()
    per = per[(per["nv"] > 0) & (per["np_"] > 0)]
    a = np.arctan2(per["vs"].to_numpy(np.float64),
                   per["vc"].to_numpy(np.float64))
    b = np.arctan2(per["ps"].to_numpy(np.float64),
                   per["pc"].to_numpy(np.float64))
    n = len(a)
    if n < 2:
        return pd.DataFrame(columns=[
            "n_users", "mean_shift_hours", "resultant",
            "rayleigh_z", "consistent_shift"])
    sd = np.sin(b) * np.cos(a) - np.cos(b) * np.sin(a)
    cd = np.cos(b) * np.cos(a) + np.sin(b) * np.sin(a)
    ss, sc = float(sd.sum()), float(cd.sum())
    mu = np.arctan2(ss, sc)
    rbar = np.sqrt(ss * ss + sc * sc) / n
    z = n * rbar * rbar
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "mean_shift_hours": [float(rha(mu / (2 * np.pi) * 24, 6))],
        "resultant": [float(rha(rbar, 6))],
        "rayleigh_z": [float(rha(z, 6))],
        "consistent_shift": np.array(
            [1 if z > 2.995732 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Survey-weighting audit: Kish design effect + weight-trimming what-if
# on token-count document weights
# ---------------------------------------------------------------------------

def _doc_weight_sums(sf_dir: str, by_source: bool) -> pd.DataFrame:
    """Exact integer weight moments (n, Σw, Σw², max w) of positive
    token counts, optionally per source — one pruned scan, partials
    only."""
    keys = ["source"] if by_source else []

    def partial(t: pa.Table) -> pd.DataFrame:
        w = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = w > 0
        d = {"n": np.ones(int(m.sum()), np.int64),
             "s1": w[m], "s2": w[m] * w[m], "mx": w[m]}
        if by_source:
            d["source"] = t["source"].to_numpy(
                zero_copy_only=False)[m]
        return pd.DataFrame(d)

    cols = ["source", "text"] if by_source else ["text"]
    agg = {"n": ("n", "sum"), "s1": ("s1", "sum"),
           "s2": ("s2", "sum"), "mx": ("mx", "max")}
    ds = _docs(sf_dir, cols).map_batches(partial,
                                         batch_format="pyarrow")
    if by_source:
        return reduce_sink(ds, keys, agg).to_pandas() \
            .sort_values("source", ignore_index=True)
    return reduce_sink(ds.map_batches(
        lambda df: df.assign(g=np.int64(0)), batch_format="pandas"),
        ["g"], agg).to_pandas()


@register("kish_design_effect_docs", sql=r"""
WITH t AS (SELECT source,
                  len(regexp_extract_all(text, '\S+')) AS w
           FROM documents),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(w) AS BIGINT) AS s1,
             CAST(SUM(w * w) AS HUGEINT) AS s2,
             CAST(MAX(w) AS BIGINT) AS mx
      FROM t WHERE w > 0 GROUP BY 1)
SELECT source, n AS n_docs,
       ROUND(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             / (CAST(s1 AS DOUBLE) * s1), 6) AS deff,
       ROUND(CAST(s1 AS DOUBLE) * s1 / CAST(s2 AS DOUBLE), 6)
           AS n_eff,
       ROUND(SQRT(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                  / (CAST(s1 AS DOUBLE) * s1) - 1.0), 6) AS cv_w,
       ROUND(CAST(mx AS DOUBLE) / s1 * 100.0, 6)
           AS max_weight_share_pct
FROM s ORDER BY source""")
def kish_design_effect_docs(sf_dir: str) -> pd.DataFrame:
    """Kish's design effect of token-count weighting per source:
    deff = 1 + cv²(w) = n·Σw²/(Σw)², with n_eff = n/deff the
    effective sample size. Every token-weighted corpus statistic in
    the registry (the weighted sample, any per-token mixture rate)
    is implicitly an unequal-weight survey estimate, and its
    variance is deff× the equal-weight case — a source with 500
    docs at deff 4 contributes the statistical information of 125:
    quoting doc counts as evidence sizes overstates certainty by
    exactly this factor. max_weight_share_pct is the degenerate-
    case flag deff alone hides (deff 2 from many mid-length docs
    vs deff 2 from ONE giant doc are different risks — the giant
    doc is a single point of failure for every estimate). Exact
    integer moments (Σw² in HUGEINT); one pruned text scan."""
    s = _doc_weight_sums(sf_dir, by_source=True)
    n = s["n"].to_numpy(np.int64).astype(np.float64)
    s1 = s["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = s["s2"].to_numpy(np.int64).astype(np.float64)
    mx = s["mx"].to_numpy(np.int64).astype(np.float64)
    deff = n * s2 / (s1 * s1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "source": s["source"],
        "n_docs": s["n"].astype(np.int64),
        "deff": rha(deff, 6),
        "n_eff": rha(s1 * s1 / s2, 6),
        "cv_w": rha(np.sqrt(deff - 1.0), 6),
        "max_weight_share_pct": rha(mx / s1 * 100.0, 6)})
