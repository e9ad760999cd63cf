"""Driver-contract queries (chunk 13/18).
Sections:
  - Newsvendor stocking: critical-fractile quantiles + the empirical
  - Jackknife audit of the ratio estimator: leave-one-unit-out vs the
  - Trend-robustness completion: the Sen-slope confidence interval and
  - Weekly harmonic phase: cross-phase of views vs purchases, and the
  - Robust two-sample location: Yuen's trimmed-t on weekend vs weekday
  - Exact conditional rate inference: the binomial C-test on the weekend
  - Ranking metrics beyond AUC: average precision + partial AUC in the
  - Forecast-evaluation inference: Diebold–Mariano on the backtest's two
  - Menzerath–Altmann law: sentence length vs mean word length
  - Quantile treatment effects: Doksum's shift function weekend vs
  - Partial rank correlation: Kendall and the three-estimator panel for
  - Reliability growth on the error stream: Laplace trend test +
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
    pq,
    ray,
    rd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
)
from webalizer_ray.pipelines.queries.q07_fits_audits import (  # noqa: F401
    _source_word_counts,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _DAILY_SQL,
    _daily_counts,
)
from webalizer_ray.pipelines.queries.q11_forecast_supply import (  # noqa: F401
    _dayvec,
)
from webalizer_ray.pipelines.queries.q12_survival_colloc import (  # noqa: F401
    _doc_weight_sums,
)



@register("weight_trimming_whatif_docs", sql=r"""
WITH t AS (SELECT len(regexp_extract_all(text, '\S+')) AS w
           FROM documents),
tp AS (SELECT CAST(w AS BIGINT) AS w FROM t WHERE w > 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(w) AS BIGINT) AS s1,
             CAST(SUM(w * w) AS HUGEINT) AS s2
      FROM tp),
c AS (SELECT n, s1, s2, 5.0 * s1 / n AS cap FROM m),
tc AS (SELECT LEAST(CAST(tp.w AS DOUBLE), c.cap) AS wc,
              CASE WHEN tp.w > c.cap THEN 1 ELSE 0 END AS tr,
              CAST(tp.w AS DOUBLE) AS w
       FROM tp, c),
a AS (SELECT SUM(wc) AS sc1, SUM(wc * wc) AS sc2,
             CAST(SUM(tr) AS BIGINT) AS trimmed,
             SUM(w - wc) AS moved
      FROM tc)
SELECT m.n AS n_docs, ROUND(c.cap, 6) AS cap_tokens,
       a.trimmed AS docs_trimmed,
       ROUND(a.moved / m.s1 * 100.0, 6) AS mass_trimmed_pct,
       ROUND(CAST(m.n AS DOUBLE) * CAST(m.s2 AS DOUBLE)
             / (CAST(m.s1 AS DOUBLE) * m.s1), 6) AS deff_before,
       ROUND(m.n * a.sc2 / (a.sc1 * a.sc1), 6) AS deff_after,
       ROUND((a.sc1 * a.sc1 / a.sc2)
             / (CAST(m.s1 AS DOUBLE) * m.s1 / CAST(m.s2 AS DOUBLE))
             * 100.0 - 100.0, 6) AS neff_gain_pct
FROM m, c, a""")
def weight_trimming_whatif_docs(sf_dir: str) -> pd.DataFrame:
    """The standard survey remedy priced on this corpus: cap
    weights at 5× the mean (the common trimming rule) and report
    the design effect before/after, the doc count touched, and the
    weight mass moved. Trimming trades bias for variance —
    neff_gain_pct is the variance payoff (how much effective
    sample the cap buys back), mass_trimmed_pct bounds the bias
    exposure (the fraction of token mass whose influence is
    deliberately understated). The decision read: large n_eff gain
    at small mass moved is the free-lunch region where trimming is
    obviously right; both large means the corpus genuinely IS its
    few giant docs and capping rewrites the estimand, so fix the
    corpus (split the giants) rather than the weights. Same exact
    moments; the cap is a shared float expression so LEAST/min
    agree bit-for-bit."""
    m = _doc_weight_sums(sf_dir, by_source=False)
    n = int(m["n"].iloc[0])
    s1 = int(m["s1"].iloc[0])
    s2 = float(int(m["s2"].iloc[0]))
    cap = 5.0 * s1 / n

    def capped(t: pa.Table) -> pd.DataFrame:
        w = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        w = w[w > 0].astype(np.float64)
        wc = np.minimum(w, cap)
        return pd.DataFrame({
            "g": np.zeros(len(w), np.int64),
            "sc1": wc, "sc2": wc * wc,
            "tr": (w > cap).astype(np.int64), "moved": w - wc})

    a = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(capped,
                                            batch_format="pyarrow"),
        ["g"], {"sc1": ("sc1", "sum"), "sc2": ("sc2", "sum"),
                "tr": ("tr", "sum"),
                "moved": ("moved", "sum")}).to_pandas()
    sc1 = float(a["sc1"].iloc[0])
    sc2 = float(a["sc2"].iloc[0])
    rha = textstats.round_half_away
    deff_b = float(n) * s2 / (float(s1) * s1)
    neff_b = float(s1) * s1 / s2
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "cap_tokens": [float(rha(cap, 6))],
        "docs_trimmed": np.array([int(a["tr"].iloc[0])], np.int64),
        "mass_trimmed_pct": [float(rha(
            float(a["moved"].iloc[0]) / s1 * 100.0, 6))],
        "deff_before": [float(rha(deff_b, 6))],
        "deff_after": [float(rha(n * sc2 / (sc1 * sc1), 6))],
        "neff_gain_pct": [float(rha(
            (sc1 * sc1 / sc2) / neff_b * 100.0 - 100.0, 6))]})


# ---------------------------------------------------------------------------
# Newsvendor stocking: critical-fractile quantiles + the empirical
# cost curve on daily shipped demand
# ---------------------------------------------------------------------------

def _brand_day_demand(sf_dir: str):
    """(brand, day, qc) nonzero daily shipped quantity cents per
    brand, plus the global ship-day window dd — the safety-stock
    family's zero-day convention (zeros contribute via dd, never
    materialized). Driver rows are calendar×brands bounded."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = ray.put(dict(zip(part["p_partkey"].to_numpy(np.int64),
                                part["p_brand"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        us = df["l_shipdate"].to_numpy("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).to_numpy(),
            "day": us // 86_400_000_000,
            "qc": np.rint(df["l_quantity"].to_numpy(np.float64)
                          * 100).astype(np.int64),
            "lo": us // 86_400_000_000,
            "hi": us // 86_400_000_000})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_shipdate"]) \
        .map_batches(prep, batch_format="pandas")
    d = reduce_sink(li, ["brand", "day"],
                    {"qc": ("qc", "sum"), "lo": ("lo", "min"),
                     "hi": ("hi", "max")}).to_pandas()
    dd = int(d["hi"].max() - d["lo"].min() + 1)
    return d[["brand", "day", "qc"]], dd


def _empirical_q(vals: np.ndarray, zeros: int, r: int) -> int:
    """r-th smallest (1-based) of the zero-filled series given the
    sorted nonzero values and the zero count."""
    return 0 if r <= zeros else int(vals[r - zeros - 1])


def _ou_sums(vals: np.ndarray, zeros: int, q: int, dd: int):
    """Exact E[(q−D)+]·dd and E[(D−q)+]·dd integer cent sums."""
    le = vals[vals <= q]
    gt = vals[vals > q]
    over = q * (zeros + len(le)) - int(le.sum())
    under = int(gt.sum()) - q * len(gt)
    return over, under, zeros + len(le)


@register("newsvendor_stock_by_brand", sql="""
WITH pb AS (SELECT p_partkey, p_brand FROM part),
d AS (SELECT pb.p_brand AS brand,
             epoch_us(l_shipdate) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS qc
      FROM lineitem JOIN pb ON l_partkey = p_partkey
      GROUP BY 1, 2),
sp AS (SELECT MAX(day) - MIN(day) + 1 AS dd
       FROM (SELECT epoch_us(l_shipdate) // 86400000000 AS day
             FROM lineitem)),
bz AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS nd,
              (SELECT dd FROM sp) AS dd
       FROM d GROUP BY 1),
rk AS (SELECT brand, nd, dd, dd - nd AS z,
              (4 * dd + 4) // 5 AS r
       FROM bz),
qs AS (SELECT d.brand, d.qc,
              ROW_NUMBER() OVER (PARTITION BY d.brand
                                 ORDER BY d.qc) AS rn
       FROM d),
qq AS (SELECT rk.brand, rk.dd, rk.z, rk.r,
              CASE WHEN rk.r <= rk.z THEN 0
                   ELSE (SELECT qc FROM qs
                         WHERE qs.brand = rk.brand
                           AND qs.rn = rk.r - rk.z) END AS q
       FROM rk),
oo AS (SELECT qq.brand, qq.dd, qq.z, qq.q,
              qq.q * (qq.z + CAST(SUM(CASE WHEN d.qc <= qq.q
                                           THEN 1 ELSE 0 END)
                                  AS BIGINT))
              - CAST(SUM(CASE WHEN d.qc <= qq.q THEN d.qc
                              ELSE 0 END) AS BIGINT) AS over_c,
              CAST(SUM(CASE WHEN d.qc > qq.q THEN d.qc ELSE 0 END)
                   AS BIGINT)
              - qq.q * CAST(SUM(CASE WHEN d.qc > qq.q THEN 1
                                     ELSE 0 END) AS BIGINT)
                  AS under_c,
              qq.z + CAST(SUM(CASE WHEN d.qc <= qq.q THEN 1
                                   ELSE 0 END) AS BIGINT) AS n_le
       FROM qq JOIN d ON d.brand = qq.brand
       GROUP BY 1, 2, 3, 4)
SELECT brand, CAST(dd AS BIGINT) AS days,
       CAST(z AS BIGINT) AS zero_days,
       ROUND(q / 100.0, 6) AS q_star_units,
       ROUND(CAST(n_le AS DOUBLE) / dd, 6) AS service_level,
       ROUND(over_c / 100.0 / dd, 6) AS exp_overage_units,
       ROUND(under_c / 100.0 / dd, 6) AS exp_underage_units
FROM oo ORDER BY brand""")
def newsvendor_stock_by_brand(sf_dir: str) -> pd.DataFrame:
    """Newsvendor stocking quantity per brand at the 0.8 critical
    fractile (underage:overage cost ratio 4:1, documented): q* =
    the ⌈0.8·dd⌉-th smallest zero-filled daily shipped demand. The
    safety-stock row prices ONE normal-theory recipe (μ+zσ√L);
    the newsvendor is the distribution-free decision answer — it
    reads the empirical quantile directly, so the multimodal /
    zero-inflated daily demand that wrecks the Gaussian σ (most
    brands ship nothing most days: see zero_days) is priced
    correctly by construction. exp_overage/underage_units are the
    exact empirical expectations at q* — the daily units you'd
    scrap vs short — and service_level is the achieved F(q*),
    which can overshoot 0.8 exactly when demand has atoms (many
    tied days), the honest discreteness read. Integer rank
    arithmetic ((4·dd+4)//5, no float ceil), exact cent sums;
    zero days enter through counts, never materialized."""
    d, dd = _brand_day_demand(sf_dir)
    rha = textstats.round_half_away
    rows = []
    r = (4 * dd + 4) // 5
    for brand, g in d.groupby("brand"):
        vals = np.sort(g["qc"].to_numpy(np.int64))
        z = dd - len(vals)
        q = _empirical_q(vals, z, r)
        over, under, n_le = _ou_sums(vals, z, q, dd)
        rows.append((brand, dd, z, float(rha(q / 100.0, 6)),
                     float(rha(n_le / dd, 6)),
                     float(rha(over / 100.0 / dd, 6)),
                     float(rha(under / 100.0 / dd, 6))))
    return pd.DataFrame(rows, columns=[
        "brand", "days", "zero_days", "q_star_units",
        "service_level", "exp_overage_units",
        "exp_underage_units"]).astype({
            "days": np.int64, "zero_days": np.int64}) \
        .sort_values("brand", ignore_index=True)


@register("newsvendor_cost_curve", sql="""
WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                       AS BIGINT) AS qc
           FROM lineitem GROUP BY 1),
sp AS (SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS dd,
              CAST(COUNT(*) AS BIGINT) AS nd
       FROM d),
fr AS (SELECT UNNEST([1, 7, 4, 9, 19]) AS num,
              UNNEST([2, 10, 5, 10, 20]) AS den),
rk AS (SELECT fr.num, fr.den, sp.dd, sp.dd - sp.nd AS z,
              (fr.num * sp.dd + fr.den - 1) // fr.den AS r
       FROM fr, sp),
qs AS (SELECT qc, ROW_NUMBER() OVER (ORDER BY qc) AS rn FROM d),
qq AS (SELECT rk.num, rk.den, rk.dd, rk.z,
              CASE WHEN rk.r <= rk.z THEN 0
                   ELSE (SELECT qc FROM qs
                         WHERE qs.rn = rk.r - rk.z) END AS q
       FROM rk),
oo AS (SELECT qq.num, qq.den, qq.dd, qq.q,
              qq.q * (qq.z + CAST(SUM(CASE WHEN d.qc <= qq.q
                                           THEN 1 ELSE 0 END)
                                  AS BIGINT))
              - CAST(SUM(CASE WHEN d.qc <= qq.q THEN d.qc
                              ELSE 0 END) AS BIGINT) AS over_c,
              CAST(SUM(CASE WHEN d.qc > qq.q THEN d.qc ELSE 0 END)
                   AS BIGINT)
              - qq.q * CAST(SUM(CASE WHEN d.qc > qq.q THEN 1
                                     ELSE 0 END) AS BIGINT)
                  AS under_c
       FROM qq JOIN d ON TRUE GROUP BY 1, 2, 3, 4, qq.z),
cc AS (SELECT num, den, q,
              ROUND(CAST(num AS DOUBLE) / den, 6) AS fractile,
              (1 * over_c + 4 * under_c) AS cost_c, dd
       FROM oo)
SELECT fractile, ROUND(q / 100.0, 6) AS q_units,
       ROUND(cost_c / 100.0 / dd, 6) AS daily_cost_units,
       CAST(CASE WHEN cost_c = (SELECT MIN(cost_c) FROM cc)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_optimal
FROM cc ORDER BY fractile""")
def newsvendor_cost_curve(sf_dir: str) -> pd.DataFrame:
    """The empirical newsvendor cost curve on TOTAL daily shipped
    demand: stock the q at fractiles 0.5/0.7/0.8/0.9/0.95 and pay
    1·overage + 4·underage per unit per day — the theorem check ON
    the output: with cu/(cu+co) = 0.8, the 0.8-fractile row should
    carry is_optimal=1, and seeing it do so on real (discrete,
    zero-inflated) demand is the evidence the critical-fractile
    rule survives departure from the textbook's continuous F. The
    curve's SHAPE is the operational content: flat between 0.7 and
    0.9 means stocking precision barely matters (atoms dominate),
    a sharp V says the fractile choice is worth real money.
    Rational rank arithmetic per fractile ((num·dd+den−1)//den);
    exact integer cent cost sums; ties in cost keep every argmin
    row flagged — identical on both engines."""
    d, dd = _brand_day_demand(sf_dir)
    tot = d.groupby("day")["qc"].sum()
    vals = np.sort(tot.to_numpy(np.int64))
    z = dd - len(vals)
    rha = textstats.round_half_away
    rows = []
    for num, den in [(1, 2), (7, 10), (4, 5), (9, 10), (19, 20)]:
        r = (num * dd + den - 1) // den
        q = _empirical_q(vals, z, r)
        over, under, _ = _ou_sums(vals, z, q, dd)
        cost = 1 * over + 4 * under
        rows.append((float(rha(num / den, 6)),
                     float(rha(q / 100.0, 6)),
                     float(rha(cost / 100.0 / dd, 6)), cost))
    mn = min(c for *_, c in rows)
    return pd.DataFrame(
        [(f, qv, cu, 1 if c == mn else 0)
         for f, qv, cu, c in rows],
        columns=["fractile", "q_units", "daily_cost_units",
                 "is_optimal"]).astype({"is_optimal": np.int64}) \
        .sort_values("fractile", ignore_index=True)


# ---------------------------------------------------------------------------
# Jackknife audit of the ratio estimator: leave-one-unit-out vs the
# delta method, and the unit-of-independence question
# ---------------------------------------------------------------------------

def _unit_vc(sf_dir: str, unit: str) -> pd.DataFrame:
    """Per-unit (v, c) view/click totals; unit ∈ {user, day}."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        if unit == "user":
            key = df["user_id"].to_numpy(np.int64)
        else:
            key = df["ts"].to_numpy("datetime64[us]") \
                .astype(np.int64) // 86_400_000_000
        return pd.DataFrame({
            "k": key,
            "v": (et == "view").astype(np.int64),
            "c": (et == "click").astype(np.int64)})

    cols = ["user_id", "event_type"] if unit == "user" \
        else ["ts", "event_type"]
    g = reduce_sink(
        _events(sf_dir, cols).map_batches(prep,
                                          batch_format="pandas"),
        ["k"], {"v": ("v", "sum"), "c": ("c", "sum")}).to_pandas()
    return g[g["v"] > 0]


def _jack_ratio(g: pd.DataFrame):
    """(n, Sc/Sv, jackknife SE, jackknife bias) via the exact
    leave-one-out sums; units holding the whole view total are
    skipped in the leave-out sum (degenerate denominator)."""
    v = g["v"].to_numpy(np.int64).astype(np.float64)
    c = g["c"].to_numpy(np.int64).astype(np.float64)
    n = len(v)
    sv, sc = float(v.sum()), float(c.sum())
    r = sc / sv
    keep = (sv - v) > 0
    ri = (sc - c[keep]) / (sv - v[keep])
    m = len(ri)
    if m < 2:            # SQL row guard: WHERE js.m >= 2
        return n, r, np.nan, np.nan
    rbar = float(ri.sum()) / m
    var_jk = (m - 1.0) / m * float(((ri - rbar) ** 2).sum())
    bias = (m - 1.0) * (rbar - r)
    return n, r, np.sqrt(var_jk), bias


_JACK_SQL = """
usr AS (SELECT {key} AS k,
               CAST(SUM(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM events GROUP BY 1),
f AS (SELECT * FROM usr WHERE v > 0),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS sv,
               CAST(SUM(c) AS BIGINT) AS sc
        FROM f),
lo AS (SELECT (CAST(tot.sc AS DOUBLE) - f.c)
              / (CAST(tot.sv AS DOUBLE) - f.v) AS ri
       FROM f, tot WHERE tot.sv - f.v > 0),
js AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, SUM(ri) AS s1,
              SUM(ri * ri) AS s2
       FROM lo),
jk AS (SELECT tot.n, tot.sv, tot.sc,
              CAST(tot.sc AS DOUBLE) / tot.sv AS r,
              js.m, js.s1 / js.m AS rbar,
              SQRT((js.m - 1.0) / js.m
                   * (js.s2 - js.s1 * js.s1 / js.m)) AS se_jk,
              (js.m - 1.0) * (js.s1 / js.m
                              - CAST(tot.sc AS DOUBLE) / tot.sv)
                  AS bias
       FROM tot, js WHERE js.m >= 2)"""


@register("jackknife_ctr_audit", sql=f"""
WITH {_JACK_SQL.format(key="user_id")},
mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS HUGEINT) AS sv,
               CAST(SUM(c) AS HUGEINT) AS sc,
               CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
               CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc,
               CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS svc
        FROM f),
dm AS (SELECT n,
              SQRT(((CAST(n * scc - sc * sc AS DOUBLE)
                     / (n * (n - 1.0)))
                    - 2.0 * (CAST(sc AS DOUBLE) / sv)
                      * (CAST(n * svc - sv * sc AS DOUBLE)
                         / (n * (n - 1.0)))
                    + (CAST(sc AS DOUBLE) / sv)
                      * (CAST(sc AS DOUBLE) / sv)
                      * (CAST(n * svv - sv * sv AS DOUBLE)
                         / (n * (n - 1.0))))
                   / (n * (CAST(sv AS DOUBLE) / n)
                        * (CAST(sv AS DOUBLE) / n))) AS se_d
       FROM mom)
SELECT jk.n AS n_users, ROUND(jk.r, 6) AS ctr,
       ROUND(dm.se_d, 6) AS se_delta,
       ROUND(jk.se_jk, 6) AS se_jack,
       ROUND(jk.se_jk / dm.se_d, 6) AS jack_over_delta,
       ROUND(jk.bias, 9) AS jack_bias,
       ROUND(jk.r - jk.bias, 6) AS bias_corrected_ctr
FROM jk, dm""")
def jackknife_ctr_audit(sf_dir: str) -> pd.DataFrame:
    """Leave-one-USER-out jackknife of the CTR ratio Σc/Σv beside
    the delta-method SE (present as its own row): the jackknife
    makes no linearization, so jack_over_delta ≈ 1 is the evidence
    that LICENSES the delta method's O(1) formula at scale where
    n leave-outs are untenable — and a material gap flags exactly
    the heavy-tailed-denominator case (a few users with enormous
    view counts) where the linearization is strained. The
    jackknife also buys what delta structurally can't: a bias
    estimate ((n−1)(R̄₍·₎ − R); the ratio estimator is O(1/n)
    biased) and the bias-corrected CTR. The leave-out sums ARE
    distributable — broadcast (Σv, Σc), then ΣR₍ᵢ₎ and ΣR₍ᵢ₎² are
    ordinary per-unit partials; two passes, no per-unit loop on
    the driver. Units holding the entire view total are skipped
    (degenerate denominator) identically on both engines."""
    g = _unit_vc(sf_dir, "user")
    n, r, se_jk, bias = _jack_ratio(g)
    if np.isnan(se_jk):
        return pd.DataFrame(columns=[
            "n_users", "ctr", "se_delta", "se_jack",
            "jack_over_delta", "jack_bias", "bias_corrected_ctr"])
    v = g["v"].to_numpy(np.int64).astype(object)
    c = g["c"].to_numpy(np.int64).astype(object)
    sv, sc = int(v.sum()), int(c.sum())
    svv = int((v * v).sum())
    scc = int((c * c).sum())
    svc = int((v * c).sum())
    var_c = float(n * scc - sc * sc) / (n * (n - 1.0))
    var_v = float(n * svv - sv * sv) / (n * (n - 1.0))
    cov = float(n * svc - sv * sc) / (n * (n - 1.0))
    vbar = float(sv) / n
    se_d = np.sqrt((var_c - 2.0 * r * cov + r * r * var_v)
                   / (n * vbar * vbar))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "ctr": [float(rha(r, 6))],
        "se_delta": [float(rha(se_d, 6))],
        "se_jack": [float(rha(se_jk, 6))],
        "jack_over_delta": [float(rha(se_jk / se_d, 6))],
        "jack_bias": [float(rha(bias, 9))],
        "bias_corrected_ctr": [float(rha(r - bias, 6))]})


@register("cluster_jackknife_ctr_units", sql=f"""
WITH u1 AS (WITH {_JACK_SQL.format(key="user_id")}
            SELECT 'user' AS unit, n, r, se_jk FROM jk),
u2 AS (WITH {_JACK_SQL.format(
    key="epoch_us(ts) // 86400000000")}
       SELECT 'day' AS unit, n, r, se_jk FROM jk)
SELECT unit, n AS n_units, ROUND(r, 6) AS ctr,
       ROUND(se_jk, 6) AS se_jack
FROM (SELECT * FROM u1 UNION ALL SELECT * FROM u2)
ORDER BY unit""")
def cluster_jackknife_ctr_units(sf_dir: str) -> pd.DataFrame:
    """The same jackknife run at TWO choices of the independence
    unit — users and days — because the SE of a ratio is only
    defined relative to what you imagine resampling. The point
    estimate is identical in both rows (it's the same Σc/Σv);
    only the uncertainty moves, and the direction is the
    diagnosis: day-clustered SE ≫ user SE means click propensity
    shocks are TEMPORAL (site changes, outages — all users move
    together within a day, so days are the honest unit and the
    dashboard's user-based CI is too tight); ≈ equal says
    within-day correlation is negligible and the cheaper user
    unit is safe. This is the cluster-robust question asked with
    the estimator itself instead of a variance formula. Same
    leave-out machinery and degenerate-unit skip per row."""
    rha = textstats.round_half_away
    rows = []
    for unit in ["day", "user"]:
        g = _unit_vc(sf_dir, unit)
        n, r, se_jk, _ = _jack_ratio(g)
        if np.isnan(se_jk):
            continue
        rows.append((unit, n, float(rha(r, 6)),
                     float(rha(se_jk, 6))))
    return pd.DataFrame(rows, columns=[
        "unit", "n_units", "ctr", "se_jack"]).astype(
        {"n_units": np.int64}) \
        .sort_values("unit", ignore_index=True)


# ---------------------------------------------------------------------------
# Trend-robustness completion: the Sen-slope confidence interval and
# Van Belle–Hughes trend homogeneity across weekdays
# ---------------------------------------------------------------------------

@register("theil_sen_slope_ci", sql="""
WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS t,
                  CAST(COUNT(*) AS BIGINT) AS hits
           FROM events GROUP BY 1),
p AS (SELECT (b.hits - a.hits) / (b.t - a.t) AS slope
      FROM d a JOIN d b ON b.t > a.t),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
ties AS (SELECT COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0)
             AS corr
         FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt
               FROM d GROUP BY hits HAVING COUNT(*) > 1) q),
cw AS (SELECT nn.n, CAST(COUNT(*) AS BIGINT) AS m,
              1.96 * SQRT((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ties.corr) / 18.0) AS c
       FROM p, nn, ties GROUP BY nn.n, ties.corr),
rk AS (SELECT m, n,
              GREATEST(CAST(CEIL((m - c) / 2.0) AS BIGINT), 1)
                  AS rlo,
              LEAST(CAST(FLOOR((m + c) / 2.0 + 1) AS BIGINT), m)
                  AS rhi
       FROM cw),
os_ AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn
        FROM p)
SELECT rk.n AS n_days, rk.m AS n_pairs,
       ROUND((SELECT median(slope) FROM p), 6) AS slope,
       rk.rlo AS rank_lo, rk.rhi AS rank_hi,
       ROUND((SELECT slope FROM os_ WHERE rn = rk.rlo), 6) AS ci_lo,
       ROUND((SELECT slope FROM os_ WHERE rn = rk.rhi), 6) AS ci_hi,
       CAST(CASE WHEN (SELECT slope FROM os_ WHERE rn = rk.rlo) > 0
                   OR (SELECT slope FROM os_ WHERE rn = rk.rhi) < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS excludes_zero
FROM rk""")
def theil_sen_slope_ci(sf_dir: str) -> pd.DataFrame:
    """The distribution-free confidence interval the Theil–Sen point
    estimate (present) has been printing without: Sen's 1968
    order-statistic interval — ranks (M∓C)/2 of the sorted pairwise
    slopes with C = 1.96·√Var(S) and Var(S) the tie-corrected
    Mann–Kendall variance. This is the slope sibling of the
    median-CI family's argument: a robust slope is operationally
    worthless until you know whether it's ±2 or ±200 events/day,
    and the interval needs NO error-distribution assumption — the
    randomness comes from the MK sign statistic, so the same Var(S)
    that powers the trend TEST inverts into slope bounds
    (excludes_zero therefore agrees with the MK verdict up to the
    continuity correction, a consistency worth reading). Gilbert's
    rounding (lower rank up, upper down) pinned identically;
    O(days²) pairs is calendar arithmetic; tie correction exact
    integers."""
    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(
            lambda df: pd.DataFrame(
                {"t": df["ts"].to_numpy().astype("datetime64[D]")
                 .astype(np.int64)}), batch_format="pandas"),
        ["t"], {"hits": ("t", "size")}).to_pandas() \
        .sort_values("t", ignore_index=True)
    t = d["t"].to_numpy(np.int64)
    x = d["hits"].to_numpy(np.int64)
    n = len(t)
    ii, jj = np.triu_indices(n, k=1)
    slopes = (x[jj] - x[ii]).astype(np.float64) / (t[jj] - t[ii])
    slopes.sort()
    m = len(slopes)
    _, tc = np.unique(x, return_counts=True)
    tc = tc[tc > 1].astype(np.int64)
    corr = int((tc * (tc - 1) * (2 * tc + 5)).sum())
    c = 1.96 * np.sqrt((n * (n - 1) * (2 * n + 5) - corr) / 18.0)
    rlo = max(int(np.ceil((m - c) / 2.0)), 1)
    rhi = min(int(np.floor((m + c) / 2.0 + 1)), m)
    idx = 0.5 * (m - 1)
    lo_i = int(np.floor(idx))
    med = slopes[lo_i] + (slopes[min(lo_i + 1, m - 1)]
                          - slopes[lo_i]) * (idx - lo_i)
    ci_lo, ci_hi = float(slopes[rlo - 1]), float(slopes[rhi - 1])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_pairs": np.array([m], np.int64),
        "slope": [float(rha(med, 6))],
        "rank_lo": np.array([rlo], np.int64),
        "rank_hi": np.array([rhi], np.int64),
        "ci_lo": [float(rha(ci_lo, 6))],
        "ci_hi": [float(rha(ci_hi, 6))],
        "excludes_zero": np.array(
            [1 if ci_lo > 0 or ci_hi < 0 else 0], np.int64)})


@register("vanbelle_hughes_dow_homogeneity", sql="""
WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS t,
                  CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS g,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
sg AS (SELECT a.g,
              CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
                            WHEN b.cnt < a.cnt THEN -1
                            ELSE 0 END) AS BIGINT) AS s
       FROM d a JOIN d b ON b.g = a.g AND b.t > a.t
       GROUP BY 1),
ng AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
tg AS (SELECT g, COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0)
           AS corr
       FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS tt
             FROM d GROUP BY g, cnt HAVING COUNT(*) > 1) q
       GROUP BY 1),
zg AS (SELECT ng.g,
              sg.s / SQRT((ng.n * (ng.n - 1) * (2 * ng.n + 5)
                           - COALESCE(tg.corr, 0)) / 18.0) AS z
       FROM ng JOIN sg ON sg.g = ng.g
               LEFT JOIN tg ON tg.g = ng.g
       WHERE ng.n >= 3),
ch AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
              SUM(z * z) AS tot,
              SUM(z) * SUM(z) / COUNT(*) AS trend
       FROM zg)
SELECT k AS n_groups,
       ROUND(tot, 6) AS chi2_total,
       ROUND(trend, 6) AS chi2_trend,
       ROUND(tot - trend, 6) AS chi2_homog,
       CAST(CASE WHEN tot - trend <= 12.591587 THEN 1 ELSE 0 END
            AS BIGINT) AS homogeneous,
       CAST(CASE WHEN trend > 3.841459 THEN 1 ELSE 0 END
            AS BIGINT) AS common_trend_rejected
FROM ch""")
def vanbelle_hughes_dow_homogeneity(sf_dir: str) -> pd.DataFrame:
    """Van Belle–Hughes decomposition of the Mann–Kendall evidence
    across weekdays: per-dow MK Z statistics (plain S/√Var, no
    continuity correction — the decomposition identity needs it,
    documented), χ²_total = ΣZ², χ²_trend = kZ̄² (1 df), and
    χ²_homog = total − trend (k−1 df, 12.59 at k=7). This is the
    question the seasonal MK (present) silently assumes away:
    seasonal Kendall SUMS the per-season statistics, which is only
    the right test when every weekday trends the SAME way —
    χ²_homog significant says Mondays grow while Saturdays shrink
    (workweek product vs leisure product diverging), the sum
    masks it, and per-dow slopes are the honest report.
    homogeneous=1 + common_trend_rejected=1 is the license to
    quote ONE trend number. Weekdays with <3 observed days drop
    from the sums identically on both engines; exact integer S
    and tie-corrected variances per group."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].to_numpy().astype("datetime64[D]")
        t = days.astype(np.int64)
        return pd.DataFrame({
            "t": t,
            "g": (t + 4) % 7,
            "cnt": np.ones(len(t), np.int64)})

    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["t", "g"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("t", ignore_index=True)
    zs = []
    for g, gg in d.groupby("g"):
        x = gg["cnt"].to_numpy(np.int64)
        ng = len(x)
        if ng < 3:
            continue
        diff = np.sign(x[None, :] - x[:, None])
        s = int(np.triu(diff, 1).sum())
        _, tc = np.unique(x, return_counts=True)
        tc = tc[tc > 1].astype(np.int64)
        corr = int((tc * (tc - 1) * (2 * tc + 5)).sum())
        var = (ng * (ng - 1) * (2 * ng + 5) - corr) / 18.0
        zs.append(s / np.sqrt(var))
    z = np.array(zs, np.float64)
    k = len(z)
    tot = float((z * z).sum())
    trend = float(z.sum()) ** 2 / k
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_groups": np.array([k], np.int64),
        "chi2_total": [float(rha(tot, 6))],
        "chi2_trend": [float(rha(trend, 6))],
        "chi2_homog": [float(rha(tot - trend, 6))],
        "homogeneous": np.array(
            [1 if tot - trend <= 12.591587 else 0], np.int64),
        "common_trend_rejected": np.array(
            [1 if trend > 3.841459 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Weekly harmonic phase: cross-phase of views vs purchases, and the
# per-type weekly-structure panel
# ---------------------------------------------------------------------------

#: centered projection of a zero-filled daily series onto the 7-day
#: harmonic: a = Σ(x−x̄)cos(2πi/7), b = Σ(x−x̄)sin(2πi/7).
#: 1/7 is generally not a Fourier frequency of n, so this is the raw
#: projection of the CENTERED series (documented), identical on both
#: engines; amplitude 2√(a²+b²)/n, phase atan2(b, a).
_WK_HARM_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp)"""


def _weekly_harm(y: np.ndarray):
    """(amp, phase, peak_day) of the centered 7-day projection."""
    n = len(y)
    i = np.arange(n, dtype=np.float64)
    th = 2 * np.pi * i / 7
    xc = y - y.sum() / n
    a = float((xc * np.cos(th)).sum())
    b = float((xc * np.sin(th)).sum())
    amp = 2.0 * np.sqrt(a * a + b * b) / n
    ph = np.arctan2(b, a)
    peak = (ph * 7 / (2 * np.pi) + 7) % 7
    return amp, ph, peak


@register("weekly_harmonic_phase_views_purchases", sql=f"""
WITH {_WK_HARM_SQL},
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS i,
             CAST(COALESCE(SUM(CASE WHEN e.event_type = 'view'
                                    THEN e.c END), 0) AS BIGINT)
                 AS x,
             CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                    THEN e.c END), 0) AS BIGINT)
                 AS z
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d
      GROUP BY 1),
mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(x) / CAST(COUNT(*) AS DOUBLE) AS mx,
              SUM(z) / CAST(COUNT(*) AS DOUBLE) AS mz
       FROM g),
pr AS (SELECT mn.n,
              SUM((g.x - mn.mx) * COS(2 * PI() * g.i / 7)) AS ax,
              SUM((g.x - mn.mx) * SIN(2 * PI() * g.i / 7)) AS bx,
              SUM((g.z - mn.mz) * COS(2 * PI() * g.i / 7)) AS az,
              SUM((g.z - mn.mz) * SIN(2 * PI() * g.i / 7)) AS bz
       FROM g, mn GROUP BY 1),
ph AS (SELECT n,
              2.0 * SQRT(ax * ax + bx * bx) / n AS ampx,
              2.0 * SQRT(az * az + bz * bz) / n AS ampz,
              ATAN2(bx, ax) AS phx, ATAN2(bz, az) AS phz
       FROM pr)
SELECT n AS n_days,
       ROUND(ampx, 6) AS amp_views,
       ROUND(ampz, 6) AS amp_purchases,
       ROUND((phx * 7 / (2 * PI()) + 7) % 7, 6) AS peak_day_views,
       ROUND((phz * 7 / (2 * PI()) + 7) % 7, 6)
           AS peak_day_purchases,
       ROUND((((phz - phx) * 7 / (2 * PI()) + 3.5 + 7) % 7) - 3.5,
             6) AS lag_days,
       ROUND(ampz / ampx, 6) AS amp_ratio
FROM ph""")
def weekly_harmonic_phase_views_purchases(sf_dir: str) \
        -> pd.DataFrame:
    """The weekly cycle of views and purchases compared in the
    FREQUENCY domain: each zero-filled daily series is projected
    onto the 7-day harmonic (centered raw projection — 1/7 is not
    a Fourier frequency of an arbitrary n, documented), giving per
    series an amplitude and a phase, and the phase DIFFERENCE
    wrapped to (−3.5, 3.5] days is the single number the whole
    cross-correlation family circles around: at the weekly rhythm,
    how many days do purchases trail views? The time-domain
    crosscorr (present) mixes every frequency into one curve —
    a +2-day weekly lag plus a same-day daily response smear each
    other there, while the harmonic isolates the weekly component
    exactly. amp_ratio < 1 says the purchase week-cycle is flatter
    than the view cycle (weekend browsing converts on weekdays —
    demand shifting, not scaling). Phase wrap arithmetic keeps
    every operand positive so fmod and Python %% agree."""
    g = _dayvec(sf_dir)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    z = g["z"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    ampx, phx, pkx = _weekly_harm(x)
    ampz, phz, pkz = _weekly_harm(z)
    lag = (((phz - phx) * 7 / (2 * np.pi)) + 3.5 + 7) % 7 - 3.5
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "amp_views": [float(rha(ampx, 6))],
        "amp_purchases": [float(rha(ampz, 6))],
        "peak_day_views": [float(rha(pkx, 6))],
        "peak_day_purchases": [float(rha(pkz, 6))],
        "lag_days": [float(rha(lag, 6))],
        "amp_ratio": [float(rha(ampz / ampx, 6))]})


@register("weekly_harmonic_by_type", sql=f"""
WITH {_WK_HARM_SQL},
ty AS (SELECT DISTINCT event_type FROM e),
g AS (SELECT ty.event_type, CAST(cal.d - sp.lo AS BIGINT) AS i,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS y
      FROM cal CROSS JOIN sp CROSS JOIN ty
      LEFT JOIN e ON e.d = cal.d AND e.event_type = ty.event_type),
mn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              SUM(y) / CAST(COUNT(*) AS DOUBLE) AS my
       FROM g GROUP BY 1),
pr AS (SELECT g.event_type, mn.n, mn.my,
              SUM((g.y - mn.my) * COS(2 * PI() * g.i / 7)) AS a,
              SUM((g.y - mn.my) * SIN(2 * PI() * g.i / 7)) AS b
       FROM g JOIN mn ON mn.event_type = g.event_type
       GROUP BY 1, 2, 3)
SELECT event_type, n AS n_days,
       ROUND(my, 6) AS mean_daily,
       ROUND(2.0 * SQRT(a * a + b * b) / n, 6) AS weekly_amp,
       ROUND(2.0 * SQRT(a * a + b * b) / n / my * 100.0, 6)
           AS rel_amp_pct,
       ROUND((ATAN2(b, a) * 7 / (2 * PI()) + 7) % 7, 6)
           AS peak_day
FROM pr ORDER BY event_type""")
def weekly_harmonic_by_type(sf_dir: str) -> pd.DataFrame:
    """The same 7-day projection per event type: weekly amplitude,
    its share of the mean (rel_amp_pct — the comparable number
    across types of very different volume), and the peak day in
    the cycle. The dow-profile queries (present) give the seven
    raw bars; the harmonic compresses them to the two numbers a
    capacity planner actually uses — swing size and swing timing —
    and makes cross-type reading immediate: errors peaking half a
    cycle from views is load-following failure, signups with twice
    the rel_amp of views is a weekend-acquisition product.
    peak_day is in continuous cycle-position units (0 = the
    window's first day), consistent with the cross-phase row.
    Zero-filled per-type calendar; one pruned reduce."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "d": us // 86_400_000_000,
            "g": df["event_type"].astype(str),
            "c": np.ones(len(df), np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "g"], {"c": ("c", "sum")}).to_pandas()
    lo, hi = int(e["d"].min()), int(e["d"].max())
    n = hi - lo + 1
    rha = textstats.round_half_away
    rows = []
    for ty in sorted(e["g"].unique()):
        sub = e[e["g"] == ty]
        y = np.zeros(n, np.float64)
        y[sub["d"].to_numpy(np.int64) - lo] = \
            sub["c"].to_numpy(np.int64)
        my = y.sum() / n
        amp, ph, peak = _weekly_harm(y)
        rows.append((ty, n, float(rha(my, 6)), float(rha(amp, 6)),
                     float(rha(amp / my * 100.0, 6)),
                     float(rha(peak, 6))))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_days", "mean_daily", "weekly_amp",
        "rel_amp_pct", "peak_day"]).astype({"n_days": np.int64})


# ---------------------------------------------------------------------------
# Robust two-sample location: Yuen's trimmed-t on weekend vs weekday
# event value, with the trim-level profile
# ---------------------------------------------------------------------------

#: weekend/weekday cents histogram with per-bin cumulative ranks and
#: the Yuen order-statistic machinery at trim levels 0/10/20%.
_YUEN_SQL = """
c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS grp
      FROM events),
hh AS (SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS n
       FROM c GROUP BY 1, 2),
o AS (SELECT grp, cents, n,
             SUM(n) OVER (PARTITION BY grp ORDER BY cents) - n
                 AS below,
             SUM(n) OVER (PARTITION BY grp) AS nn
      FROM hh),
tp AS (SELECT UNNEST([0, 10, 20]) AS trim_pct),
ob AS (SELECT o.*, tp.trim_pct,
              o.nn * tp.trim_pct // 100 AS g
       FROM o CROSS JOIN tp),
xs AS (SELECT grp, trim_pct, g, nn,
              MIN(CASE WHEN below + n >= g + 1 THEN cents END)
                  AS xlo,
              MIN(CASE WHEN below + n >= nn - g THEN cents END)
                  AS xhi,
              CAST(SUM(GREATEST(LEAST(below + n, nn - g)
                                - GREATEST(below, g), 0) * cents)
                   AS HUGEINT) AS ts1,
              CAST(SUM(GREATEST(LEAST(below + n, nn - g)
                                - GREATEST(below, g), 0)
                       * cents * cents) AS HUGEINT) AS ts2
       FROM ob GROUP BY 1, 2, 3, 4),
ys AS (SELECT grp, trim_pct, nn, g, nn - 2 * g AS h,
              CAST(ts1 AS DOUBLE) / (nn - 2 * g) AS mt,
              (CAST(ts2 + g * xlo * xlo + g * xhi * xhi AS DOUBLE)
               - CAST(ts1 + g * xlo + g * xhi AS DOUBLE)
                 * CAST(ts1 + g * xlo + g * xhi AS DOUBLE) / nn)
                  AS ssdw
       FROM xs),
yt AS (SELECT a.trim_pct,
              a.nn AS n1, b.nn AS n0, a.h AS h1, b.h AS h0,
              (a.mt - b.mt) / 100.0 AS delta_units,
              (a.mt - b.mt)
              / SQRT(a.ssdw / (a.h * (a.h - 1.0))
                     + b.ssdw / (b.h * (b.h - 1.0))) AS t,
              (a.ssdw / (a.h * (a.h - 1.0))
               + b.ssdw / (b.h * (b.h - 1.0)))
              * (a.ssdw / (a.h * (a.h - 1.0))
                 + b.ssdw / (b.h * (b.h - 1.0)))
              / ((a.ssdw / (a.h * (a.h - 1.0)))
                 * (a.ssdw / (a.h * (a.h - 1.0))) / (a.h - 1.0)
                 + (b.ssdw / (b.h * (b.h - 1.0)))
                   * (b.ssdw / (b.h * (b.h - 1.0))) / (b.h - 1.0))
                  AS df
       FROM ys a JOIN ys b ON a.trim_pct = b.trim_pct
       WHERE a.grp = 1 AND b.grp = 0)"""


def _yuen_groups(sf_dir: str, trim_pct: int):
    """Per-group (nn, h, trimmed-mean cents, winsorized SSD) from the
    exact (grp, cents, n) histogram at the given trim percent —
    Python ints throughout (counts × cents² overflow int64 at
    target scale)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wkd = np.isin((us // 86_400_000_000 + 4) % 7, (0, 6))
        return pd.DataFrame({
            "grp": wkd.astype(np.int64),
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "n": np.ones(len(df), np.int64)})

    hist = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["grp", "cents"], {"n": ("n", "sum")}).to_pandas()
    out = {}
    for grp, gdf in hist.groupby("grp"):
        gdf = gdf.sort_values("cents", ignore_index=True)
        cents = [int(v) for v in gdf["cents"]]
        cnt = [int(v) for v in gdf["n"]]
        nn = sum(cnt)
        g = nn * trim_pct // 100
        h = nn - 2 * g
        below = 0
        ts1 = ts2 = 0
        xlo = xhi = None
        for cv, nv in zip(cents, cnt):
            if xlo is None and below + nv >= g + 1:
                xlo = cv
            if xhi is None and below + nv >= nn - g:
                xhi = cv
            inc = max(0, min(below + nv, nn - g) - max(below, g))
            ts1 += inc * cv
            ts2 += inc * cv * cv
            below += nv
        w1 = ts1 + g * xlo + g * xhi
        w2 = ts2 + g * xlo * xlo + g * xhi * xhi
        ssdw = float(w2) - float(w1) * float(w1) / nn
        out[int(grp)] = (nn, h, float(ts1) / h, ssdw)
    return out


def _yuen_t(out):
    """(delta_units, t, df) from the two-group Yuen stats."""
    n1, h1, mt1, ssd1 = out[1]
    n0, h0, mt0, ssd0 = out[0]
    d1 = ssd1 / (h1 * (h1 - 1.0))
    d0 = ssd0 / (h0 * (h0 - 1.0))
    t = (mt1 - mt0) / np.sqrt(d1 + d0)
    df = (d1 + d0) ** 2 / (d1 * d1 / (h1 - 1.0)
                           + d0 * d0 / (h0 - 1.0))
    return (mt1 - mt0) / 100.0, t, df


@register("yuen_trimmed_t_weekend_value", sql=f"""
WITH {_YUEN_SQL}
SELECT n1 AS n_weekend, n0 AS n_weekday,
       h1 AS h_weekend, h0 AS h_weekday,
       ROUND(delta_units, 6) AS delta_units,
       ROUND(t, 6) AS yuen_t, ROUND(df, 6) AS df,
       CAST(CASE WHEN ABS(t) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
           AS rejected
FROM yt WHERE trim_pct = 20""")
def yuen_trimmed_t_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Yuen's 20%-trimmed-means t-test on weekend vs weekday event
    value — the robust-LOCATION member the weekend family is
    missing: Welch (present) compares means that one whale order
    can drag; Mann–Whitney/Brunner–Munzel (present) switch to a
    stochastic-dominance hypothesis entirely. Yuen keeps the
    location question but answers it about the CENTRAL 60%:
    trimmed means with winsorized variances, d = SSD_w/(h(h−1)),
    Welch–Satterthwaite df on the trimmed counts. Everything is
    exact integer order-statistic arithmetic off the bounded
    (grp, cents, count) histogram — trim counts g = ⌊0.2n⌋, the
    interior sum via per-bin rank-overlap, winsorization adds
    g copies of the exact boundary order statistics — so no
    per-row sort ever happens; |t| against 1.96 (normal approx at
    these df, documented). Read with the profile row."""
    out = _yuen_groups(sf_dir, 20)
    delta, t, df = _yuen_t(out)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([out[1][0]], np.int64),
        "n_weekday": np.array([out[0][0]], np.int64),
        "h_weekend": np.array([out[1][1]], np.int64),
        "h_weekday": np.array([out[0][1]], np.int64),
        "delta_units": [float(rha(delta, 6))],
        "yuen_t": [float(rha(t, 6))],
        "df": [float(rha(df, 6))],
        "rejected": np.array([1 if abs(t) > 1.96 else 0],
                             np.int64)})


@register("yuen_trim_profile_weekend_value", sql=f"""
WITH {_YUEN_SQL}
SELECT CAST(trim_pct AS BIGINT) AS trim_pct,
       ROUND(delta_units, 6) AS delta_units,
       ROUND(t, 6) AS t_stat, ROUND(df, 6) AS df,
       CAST(CASE WHEN ABS(t) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
           AS rejected
FROM yt ORDER BY trim_pct""")
def yuen_trim_profile_weekend_value(sf_dir: str) -> pd.DataFrame:
    """The same statistic at trim 0/10/20% — the robustness profile
    that turns one verdict into a diagnosis. Trim 0 IS Welch's
    test exactly (g = 0 collapses winsorization to nothing; the
    row should agree with the standalone Welch query, a cross-
    check on the output). Significance APPEARING as trim grows
    means outliers were masking a real central-mass shift (the
    whales pull the naive means together); significance
    DISAPPEARING means the 'weekend effect' WAS the whales — a
    few giant weekend orders, not a behavioral shift — and any
    launch decision should target that segment, not the
    population. delta_units moving monotonically with trim is the
    tail-asymmetry read. Same exact histogram machinery at each
    level."""
    rha = textstats.round_half_away
    rows = []
    for tp_ in (0, 10, 20):
        out = _yuen_groups(sf_dir, tp_)
        delta, t, df = _yuen_t(out)
        rows.append((tp_, float(rha(delta, 6)), float(rha(t, 6)),
                     float(rha(df, 6)), 1 if abs(t) > 1.96 else 0))
    return pd.DataFrame(rows, columns=[
        "trim_pct", "delta_units", "t_stat", "df",
        "rejected"]).astype({"trim_pct": np.int64,
                             "rejected": np.int64})


# ---------------------------------------------------------------------------
# Exact conditional rate inference: the binomial C-test on the weekend
# purchase rate + VanderWeele E-value sensitivity
# ---------------------------------------------------------------------------

#: weekend/weekday purchase counts and calendar-day exposures over
#: the observed window.
_RATE2_SQL = """
p AS (SELECT epoch_us(ts) // 86400000000 AS d
      FROM events WHERE event_type = 'purchase'),
w AS (SELECT MIN(d) AS lo, MAX(d) AS hi
      FROM (SELECT epoch_us(ts) // 86400000000 AS d FROM events)),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM w),
ex AS (SELECT CAST(SUM(CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1
                            ELSE 0 END) AS BIGINT) AS d1,
              CAST(SUM(CASE WHEN (d + 4) % 7 IN (0, 6) THEN 0
                            ELSE 1 END) AS BIGINT) AS d0
       FROM cal),
ct AS (SELECT CAST(SUM(CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1
                            ELSE 0 END) AS BIGINT) AS x1,
              CAST(SUM(CASE WHEN (d + 4) % 7 IN (0, 6) THEN 0
                            ELSE 1 END) AS BIGINT) AS x0
       FROM p)"""


@register("poisson_exact_weekend_purchase_test", sql=f"""
WITH {_RATE2_SQL},
pp AS (SELECT ct.x1, ct.x0, ct.x1 + ct.x0 AS n,
              CAST(ex.d1 AS DOUBLE) / (ex.d1 + ex.d0) AS p0
       FROM ct, ex),
pm AS (SELECT pp.n, pp.x1, pp.p0, k.k,
              EXP(lgamma(pp.n + 1.0) - lgamma(k.k + 1.0)
                  - lgamma(pp.n - k.k + 1.0)
                  + k.k * LN(pp.p0)
                  + (pp.n - k.k) * LN(1.0 - pp.p0)) AS pk
       FROM pp JOIN (SELECT UNNEST(generate_series(0, 1000000))
                         AS k) k ON k.k <= pp.n),
ts_ AS (SELECT MAX(n) AS n, MAX(x1) AS x1, MAX(p0) AS p0,
               SUM(CASE WHEN k <= x1 THEN pk ELSE 0 END)
                   AS lo_tail,
               SUM(CASE WHEN k >= x1 THEN pk ELSE 0 END)
                   AS hi_tail,
               SUM(CASE WHEN k = x1 THEN pk ELSE 0 END) AS atx
        FROM pm)
SELECT CAST(n AS BIGINT) AS n_purchases,
       CAST(x1 AS BIGINT) AS weekend_purchases,
       ROUND(p0, 6) AS null_weekend_share,
       ROUND(LEAST(2.0 * LEAST(lo_tail, hi_tail), 1.0), 6)
           AS exact_p,
       ROUND(LEAST(2.0 * LEAST(lo_tail - atx / 2.0,
                               hi_tail - atx / 2.0), 1.0), 6)
           AS midp,
       ROUND((x1 - n * p0) / SQRT(n * p0 * (1.0 - p0)), 6)
           AS z_approx
FROM ts_""")
def poisson_exact_weekend_purchase_test(sf_dir: str) \
        -> pd.DataFrame:
    """The EXACT conditional test of the weekend purchase rate: given
    N total purchases, under equal per-day rates the weekend count
    is Binomial(N, p₀ = weekend-days/total-days) — the classical
    C-test for comparing two Poisson rates, conditioning away the
    nuisance baseline entirely. The weekend family's z-tests and
    Bayes row all approximate; this one is the ground truth they
    approximate TO, with all three calibrations printed: exact
    (double-the-smaller-tail, capped at 1 — convention documented),
    mid-p (half the observed atom removed — the recommended
    compromise for discrete tests, less conservative without the
    z-test's anti-conservatism), and the z. exact_p ≫ z-p at small
    counts is the discreteness gap the normal approximation hides.
    O(N) lgamma tail sums (audit-scale, same caveat as the
    Bayesian-AB exact row); exposure p₀ counts CALENDAR days so a
    partial final week is priced correctly."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        wkd = np.isin((d + 4) % 7, (0, 6))
        pur = df["event_type"].to_numpy() == "purchase"
        return pd.DataFrame({
            "g": np.zeros(len(d), np.int64),
            "x1": (pur & wkd).astype(np.int64),
            "x0": (pur & ~wkd).astype(np.int64),
            "lo": d, "hi": d})

    a = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {"x1": ("x1", "sum"), "x0": ("x0", "sum"),
                "lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas()
    x1, x0 = int(a["x1"].iloc[0]), int(a["x0"].iloc[0])
    lo, hi = int(a["lo"].iloc[0]), int(a["hi"].iloc[0])
    days = np.arange(lo, hi + 1, dtype=np.int64)
    d1 = int(np.isin((days + 4) % 7, (0, 6)).sum())
    d0 = len(days) - d1
    n = x1 + x0
    p0 = d1 / (d1 + d0)
    from math import lgamma
    k = np.arange(n + 1, dtype=np.float64)
    lg = np.vectorize(lgamma)
    logpk = (lgamma(n + 1.0) - lg(k + 1.0) - lg(n - k + 1.0)
             + k * np.log(p0) + (n - k) * np.log(1.0 - p0))
    pk = np.exp(logpk)
    lo_tail = float(pk[:x1 + 1].sum())
    hi_tail = float(pk[x1:].sum())
    atx = float(pk[x1])
    exact = min(2.0 * min(lo_tail, hi_tail), 1.0)
    midp = min(2.0 * min(lo_tail - atx / 2.0,
                         hi_tail - atx / 2.0), 1.0)
    z = (x1 - n * p0) / np.sqrt(n * p0 * (1.0 - p0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_purchases": np.array([n], np.int64),
        "weekend_purchases": np.array([x1], np.int64),
        "null_weekend_share": [float(rha(p0, 6))],
        "exact_p": [float(rha(exact, 6))],
        "midp": [float(rha(midp, 6))],
        "z_approx": [float(rha(z, 6))]})


@register("weekend_rate_ratio_evalue", sql=f"""
WITH {_RATE2_SQL},
rr AS (SELECT ct.x1, ct.x0, ex.d1, ex.d0,
              (CAST(ct.x1 AS DOUBLE) / ex.d1)
              / (CAST(ct.x0 AS DOUBLE) / ex.d0) AS r,
              SQRT(1.0 / ct.x1 + 1.0 / ct.x0) AS se
       FROM ct, ex WHERE ct.x1 > 0 AND ct.x0 > 0),
tr AS (SELECT x1, x0, r, se,
              EXP(LN(r) - 1.96 * se) AS lo,
              EXP(LN(r) + 1.96 * se) AS hi,
              CASE WHEN r >= 1 THEN r ELSE 1.0 / r END AS rstar
       FROM rr),
ev AS (SELECT x1, x0, r, lo, hi, rstar,
              rstar + SQRT(rstar * (rstar - 1.0)) AS e_point,
              CASE WHEN lo <= 1.0 AND hi >= 1.0 THEN 1.0
                   WHEN r >= 1
                   THEN lo + SQRT(lo * (lo - 1.0))
                   ELSE 1.0 / hi + SQRT((1.0 / hi)
                                        * (1.0 / hi - 1.0)) END
                  AS e_ci
       FROM tr)
SELECT CAST(x1 AS BIGINT) AS weekend_purchases,
       CAST(x0 AS BIGINT) AS weekday_purchases,
       ROUND(r, 6) AS rate_ratio,
       ROUND(lo, 6) AS rr_ci_lo, ROUND(hi, 6) AS rr_ci_hi,
       ROUND(e_point, 6) AS evalue_point,
       ROUND(e_ci, 6) AS evalue_ci
FROM ev""")
def weekend_rate_ratio_evalue(sf_dir: str) -> pd.DataFrame:
    """VanderWeele's E-value for the weekend/weekday purchase rate
    ratio: E = RR* + √(RR*(RR*−1)) with RR* the ratio oriented
    above 1 — the minimum strength of association an UNMEASURED
    confounder would need with both 'being a weekend' and
    purchasing to explain the observed ratio away entirely. The
    whole weekend family tests whether the difference is real
    given the data; the E-value answers the next question a
    skeptical reviewer asks — could it be campaigns/paydays/batch
    jobs rather than the weekend itself? evalue_ci runs the same
    formula on the CI bound nearer the null (1.0 exactly when the
    CI crosses 1 — no confounding needed at all), which is the
    robust headline number. Poisson log-CI (1/x1 + 1/x0) on
    calendar-day exposures; the orientation fold for RR < 1 is
    pinned identically on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        d = us // 86_400_000_000
        wkd = np.isin((d + 4) % 7, (0, 6))
        pur = df["event_type"].to_numpy() == "purchase"
        return pd.DataFrame({
            "g": np.zeros(len(d), np.int64),
            "x1": (pur & wkd).astype(np.int64),
            "x0": (pur & ~wkd).astype(np.int64),
            "lo": d, "hi": d})

    a = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {"x1": ("x1", "sum"), "x0": ("x0", "sum"),
                "lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas()
    x1, x0 = int(a["x1"].iloc[0]), int(a["x0"].iloc[0])
    if x1 == 0 or x0 == 0:
        return pd.DataFrame(columns=[
            "weekend_purchases", "weekday_purchases", "rate_ratio",
            "rr_ci_lo", "rr_ci_hi", "evalue_point", "evalue_ci"])
    lo_d, hi_d = int(a["lo"].iloc[0]), int(a["hi"].iloc[0])
    days = np.arange(lo_d, hi_d + 1, dtype=np.int64)
    d1 = int(np.isin((days + 4) % 7, (0, 6)).sum())
    d0 = len(days) - d1
    r = (x1 / d1) / (x0 / d0)
    se = np.sqrt(1.0 / x1 + 1.0 / x0)
    lo = np.exp(np.log(r) - 1.96 * se)
    hi = np.exp(np.log(r) + 1.96 * se)
    rstar = r if r >= 1 else 1.0 / r
    e_point = rstar + np.sqrt(rstar * (rstar - 1.0))
    if lo <= 1.0 <= hi:
        e_ci = 1.0
    elif r >= 1:
        e_ci = lo + np.sqrt(lo * (lo - 1.0))
    else:
        ih = 1.0 / hi
        e_ci = ih + np.sqrt(ih * (ih - 1.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "weekend_purchases": np.array([x1], np.int64),
        "weekday_purchases": np.array([x0], np.int64),
        "rate_ratio": [float(rha(r, 6))],
        "rr_ci_lo": [float(rha(lo, 6))],
        "rr_ci_hi": [float(rha(hi, 6))],
        "evalue_point": [float(rha(e_point, 6))],
        "evalue_ci": [float(rha(e_ci, 6))]})


# ---------------------------------------------------------------------------
# Ranking metrics beyond AUC: average precision + partial AUC in the
# low-FPR screening regime (value as the purchase score)
# ---------------------------------------------------------------------------

def _score_hist(sf_dir: str) -> pd.DataFrame:
    """(cents, tp, n) histogram of event value with purchase labels,
    cents DESCENDING — the bounded structure every threshold metric
    reads; only (cents, tp, n) partials shuffle."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "tp": (df["event_type"].to_numpy()
                   == "purchase").astype(np.int64),
            "n": np.ones(len(df), np.int64)})

    return reduce_sink(
        _events(sf_dir, ["value", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["c"], {"tp": ("tp", "sum"), "n": ("n", "sum")}) \
        .to_pandas().sort_values("c", ascending=False,
                                 ignore_index=True)


@register("average_precision_value_purchase", sql="""
WITH h AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(tp) AS BIGINT) AS np,
             CAST(SUM(n) AS BIGINT) AS ntot
      FROM h),
o AS (SELECT tp, SUM(tp) OVER (ORDER BY c DESC) AS ctp,
             SUM(n) OVER (ORDER BY c DESC) AS cn
      FROM h)
SELECT t.np AS n_pos, t.ntot AS n_events,
       ROUND(CAST(t.np AS DOUBLE) / t.ntot, 6) AS base_rate,
       ROUND(SUM((CAST(o.tp AS DOUBLE) / t.np)
                 * (CAST(o.ctp AS DOUBLE) / o.cn)), 6)
           AS average_precision,
       ROUND(SUM((CAST(o.tp AS DOUBLE) / t.np)
                 * (CAST(o.ctp AS DOUBLE) / o.cn))
             / (CAST(t.np AS DOUBLE) / t.ntot), 6)
           AS ap_over_baseline
FROM o, t GROUP BY t.np, t.ntot""")
def average_precision_value_purchase(sf_dir: str) -> pd.DataFrame:
    """Average precision of event value as a purchase ranker: AP =
    Σ ΔR·P over descending value thresholds, with tied scores
    collapsed into one step (the only tie convention that is
    permutation-free, documented). AP is the precision-recall
    mirror of the Mann–Whitney AUC (present) and the one to trust
    under class imbalance: AUC's baseline is 0.5 regardless of how
    rare purchases are, so a lazy ranker scores 0.8 while
    surfacing garbage at the top; AP's baseline is the base rate
    itself, and ap_over_baseline is the honest lift the ranking
    buys. A large AUC with modest ap_over_baseline is the
    signature of a ranker good in the bulk and useless at the top
    — the exact opposite of what a targeting list needs. Exact
    integer cumsums off the bounded cents histogram."""
    h = _score_hist(sf_dir)
    tp = h["tp"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    n_pos = int(tp.sum())
    ntot = int(n.sum())
    ctp = np.cumsum(tp)
    cn = np.cumsum(n)
    ap = float(((tp / n_pos) * (ctp / cn)).sum())
    base = n_pos / ntot
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pos": np.array([n_pos], np.int64),
        "n_events": np.array([ntot], np.int64),
        "base_rate": [float(rha(base, 6))],
        "average_precision": [float(rha(ap, 6))],
        "ap_over_baseline": [float(rha(ap / base, 6))]})


@register("partial_auc_value_purchase", sql="""
WITH h AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(tp) AS BIGINT) AS np,
             CAST(SUM(n - tp) AS BIGINT) AS nn
      FROM h),
cu AS (SELECT c,
              CAST(SUM(tp) OVER (ORDER BY c DESC) AS DOUBLE)
                  / t.np AS tpr,
              CAST(SUM(n - tp) OVER (ORDER BY c DESC) AS DOUBLE)
                  / t.nn AS fpr
       FROM h, t),
seg AS (SELECT tpr, fpr,
               COALESCE(LAG(tpr) OVER (ORDER BY c DESC), 0.0)
                   AS ptpr,
               COALESCE(LAG(fpr) OVER (ORDER BY c DESC), 0.0)
                   AS pfpr
        FROM cu),
ar AS (SELECT SUM(CASE
                  WHEN pfpr >= 0.2 THEN 0.0
                  WHEN fpr <= 0.2
                  THEN (fpr - pfpr) * (tpr + ptpr) / 2.0
                  ELSE (0.2 - pfpr)
                       * (ptpr + (ptpr + (tpr - ptpr)
                                  * (0.2 - pfpr) / (fpr - pfpr)))
                       / 2.0
                  END) AS pauc
       FROM seg)
SELECT (SELECT np FROM t) AS n_pos, (SELECT nn FROM t) AS n_neg,
       ROUND(pauc, 6) AS pauc_fpr02,
       ROUND(pauc / 0.02, 6) AS pauc_over_random,
       ROUND(0.5 * (1.0 + (pauc - 0.02) / (0.2 - 0.02)), 6)
           AS mcclish_standardized
FROM ar""")
def partial_auc_value_purchase(sf_dir: str) -> pd.DataFrame:
    """Partial AUC of the value ranker restricted to FPR ≤ 0.2 —
    the only region a deployed screen ever operates in. Full AUC
    (present) integrates performance at FPR levels no fraud/
    targeting gate would tolerate, so two rankers with equal AUC
    can differ 2× where it matters; pAUC integrates the exact
    trapezoid area of the tie-collapsed ROC up to FPR 0.2, with
    linear interpolation inside the crossing step (vertical
    segments are area-free so equal-FPR steps cost nothing).
    pauc_over_random = pAUC/0.02 is the times-better-than-chance
    read in the screening regime; McClish's standardization maps
    it onto the familiar [0.5, 1] AUC scale for cross-study
    comparison. Same bounded histogram; the running cumsums,
    LAG-pair trapezoids and the boundary split are identical
    float expressions on both engines."""
    h = _score_hist(sf_dir)
    tp = h["tp"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    fp = n - tp
    n_pos = int(tp.sum())
    n_neg = int(fp.sum())
    tpr = np.cumsum(tp) / n_pos
    fpr = np.cumsum(fp) / n_neg
    ptpr = np.concatenate([[0.0], tpr[:-1]])
    pfpr = np.concatenate([[0.0], fpr[:-1]])
    pauc = 0.0
    for i in range(len(tpr)):
        if pfpr[i] >= 0.2:
            continue
        if fpr[i] <= 0.2:
            pauc += (fpr[i] - pfpr[i]) * (tpr[i] + ptpr[i]) / 2.0
        else:
            ti = ptpr[i] + (tpr[i] - ptpr[i]) \
                * (0.2 - pfpr[i]) / (fpr[i] - pfpr[i])
            pauc += (0.2 - pfpr[i]) * (ptpr[i] + ti) / 2.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pos": np.array([n_pos], np.int64),
        "n_neg": np.array([n_neg], np.int64),
        "pauc_fpr02": [float(rha(pauc, 6))],
        "pauc_over_random": [float(rha(pauc / 0.02, 6))],
        "mcclish_standardized": [float(rha(
            0.5 * (1.0 + (pauc - 0.02) / 0.18), 6))]})


# ---------------------------------------------------------------------------
# Forecast-evaluation inference: Diebold–Mariano on the backtest's two
# forecasters + MASE scale-free skill
# ---------------------------------------------------------------------------

#: the forecast_backtest_daily split, re-exposed with the per-test-day
#: loss differential d_t = |e_naive| − |e_dow| as an ordered series.
_DM_SQL = """
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
tr AS (SELECT CAST((day + 4) % 7 AS BIGINT) AS dow,
              SUM(rev) AS s, COUNT(*) AS n
       FROM x, sp WHERE day < cut GROUP BY 1),
te AS (SELECT x.day, x.rev,
              LAG(x.rev) OVER (ORDER BY x.day) AS prev,
              CAST((x.day + 4) % 7 AS BIGINT) AS dow
       FROM x),
ls AS (SELECT te.day,
              ABS(te.rev - te.prev)
              - ABS(te.rev - CAST(tr.s AS DOUBLE) / tr.n) AS dl
       FROM te JOIN tr ON tr.dow = te.dow, sp
       WHERE te.day >= sp.cut)"""


def _loss_diff(sf_dir: str):
    """Ordered test-day loss differentials d_t (naive minus dow)
    plus the training series, mirroring forecast_backtest_daily."""
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
    t_idx = np.flatnonzero(days >= cut)
    actual = rev[t_idx].astype(np.float64)
    prev = rev[t_idx - 1].astype(np.float64)
    dmean = np.array([dowmean[int(w)] for w in dow[t_idx]])
    dl = np.abs(actual - prev) - np.abs(actual - dmean)
    return dl, rev, train, actual, prev, dmean


@register("diebold_mariano_naive_vs_dow", sql=f"""
WITH {_DM_SQL},
mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(dl) / COUNT(*) AS dbar
       FROM ls),
ce AS (SELECT ls.day, ls.dl - mn.dbar AS e FROM ls, mn),
lg AS (SELECT e,
              LAG(e, 1) OVER (ORDER BY day) AS e1,
              LAG(e, 2) OVER (ORDER BY day) AS e2
       FROM ce),
gm AS (SELECT (SELECT SUM(e * e) FROM lg) AS g0,
              (SELECT SUM(e * e1) FROM lg WHERE e1 IS NOT NULL)
                  AS g1,
              (SELECT SUM(e * e2) FROM lg WHERE e2 IS NOT NULL)
                  AS g2),
st AS (SELECT mn.n, mn.dbar,
              (gm.g0 + 2.0 * ((1.0 - 1.0 / 3.0) * gm.g1
                              + (1.0 - 2.0 / 3.0) * gm.g2))
                  / mn.n AS lrv
       FROM mn, gm)
SELECT n AS n_test_days,
       ROUND(dbar, 6) AS mean_loss_diff_cents,
       ROUND(lrv, 6) AS lrv,
       ROUND(dbar / SQRT(lrv / n) * SQRT((n - 1.0) / n), 6)
           AS dm_hln,
       CAST(CASE WHEN ABS(dbar / SQRT(lrv / n)
                          * SQRT((n - 1.0) / n)) > 1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM st""")
def diebold_mariano_naive_vs_dow(sf_dir: str) -> pd.DataFrame:
    """Diebold–Mariano test on the backtest's two forecasters: the
    MAE comparison (present) says WHICH forecaster's error is
    lower; DM says whether that difference is distinguishable from
    test-window luck, which is the question that decides whether
    to BUILD the seasonal model. The loss differential d_t =
    |e_naive| − |e_dow| is autocorrelated by construction (both
    forecasts miss the same shock days), so the variance uses a
    Bartlett lag-2 long-run estimate (documented — the lag-5 NW
    machinery elsewhere is overkill for a half-window series), and
    the Harvey–Leybourne–Newbold h=1 small-sample factor
    √((n−1)/n) is applied. mean_loss_diff > 0 with significant=1
    is the full license: the dow profile beats naive by more than
    noise. Same split/zero-fill/train-mean conventions as the
    backtest row, digit-for-digit."""
    dl, *_ = _loss_diff(sf_dir)
    n = len(dl)
    dbar = float(dl.sum()) / n
    e = dl - dbar
    g0 = float((e * e).sum())
    g1 = float((e[1:] * e[:-1]).sum())
    g2 = float((e[2:] * e[:-2]).sum())
    lrv = (g0 + 2.0 * ((2.0 / 3.0) * g1 + (1.0 / 3.0) * g2)) / n
    dm = dbar / np.sqrt(lrv / n) * np.sqrt((n - 1.0) / n)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_test_days": np.array([n], np.int64),
        "mean_loss_diff_cents": [float(rha(dbar, 6))],
        "lrv": [float(rha(lrv, 6))],
        "dm_hln": [float(rha(dm, 6))],
        "significant": np.array([1 if abs(dm) > 1.96 else 0],
                                np.int64)})


@register("mase_forecast_panel", sql=f"""
WITH {_DM_SQL},
sc AS (SELECT SUM(ABS(a.rev - b.rev))
           / CAST(COUNT(*) AS DOUBLE) AS scale
       FROM x a JOIN x b ON b.day = a.day - 1, sp
       WHERE a.day < sp.cut AND a.day > sp.d0),
er AS (SELECT SUM(ABS(te.rev - te.prev))
           / CAST(COUNT(*) AS DOUBLE) AS mae_naive,
              SUM(ABS(te.rev - CAST(tr.s AS DOUBLE) / tr.n))
           / CAST(COUNT(*) AS DOUBLE) AS mae_dow,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM te JOIN tr ON tr.dow = te.dow, sp
       WHERE te.day >= sp.cut)
SELECT er.n AS n_test_days,
       ROUND(sc.scale, 6) AS insample_naive_mae_cents,
       ROUND(er.mae_naive / sc.scale, 6) AS mase_naive,
       ROUND(er.mae_dow / sc.scale, 6) AS mase_dow,
       CAST(CASE WHEN er.mae_dow / sc.scale < 1.0
                 THEN 1 ELSE 0 END AS BIGINT) AS dow_beats_scale
FROM er, sc""")
def mase_forecast_panel(sf_dir: str) -> pd.DataFrame:
    """MASE (Hyndman–Koehler) for both backtest forecasters: each
    test-window MAE divided by the TRAINING-window one-step naive
    MAE. Raw MAE in cents is incomparable across series and
    regimes — MASE is the scale-free skill score forecasting
    practice standardized on: < 1 means beating the in-sample
    naive walk, and mase_naive itself ≈ 1 is the stationarity
    sanity check (test-window naive error matching train-window
    naive error — a big gap flags regime change between the
    halves, which invalidates ANY train/test forecast comparison
    including the DM row's). The scale denominator uses only
    train-interior day pairs (both endpoints before the cut);
    same zero-filled spine."""
    dl, rev, train, actual, prev, dmean = _loss_diff(sf_dir)
    n = len(actual)
    tr_idx = np.flatnonzero(train)[1:]
    scale = float(np.abs(rev[tr_idx].astype(np.float64)
                         - rev[tr_idx - 1]).sum()) / len(tr_idx)
    mae_naive = float(np.abs(actual - prev).sum()) / n
    mae_dow = float(np.abs(actual - dmean).sum()) / n
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_test_days": np.array([n], np.int64),
        "insample_naive_mae_cents": [float(rha(scale, 6))],
        "mase_naive": [float(rha(mae_naive / scale, 6))],
        "mase_dow": [float(rha(mae_dow / scale, 6))],
        "dow_beats_scale": np.array(
            [1 if mae_dow / scale < 1.0 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Menzerath–Altmann law: sentence length vs mean word length
# ---------------------------------------------------------------------------

#: per-sentence (x = word count, ch = non-whitespace chars) rows;
#: sentence = [.!?]+ split, word = \S+, so Σ word lengths ==
#: LENGTH(sentence minus whitespace) with no word-level unnest.
_MENZ_SQL = r"""
s AS (SELECT source,
             unnest(regexp_split_to_array(text, '[.!?]+')) AS sent
      FROM documents),
st AS (SELECT source,
              CAST(len(regexp_extract_all(sent, '\S+')) AS BIGINT)
                  AS x,
              CAST(LENGTH(REGEXP_REPLACE(sent, '\s+', '', 'g'))
                   AS BIGINT) AS ch
       FROM s),
f AS (SELECT source, x, ch FROM st WHERE x > 0)"""


def _sentence_hist(sf_dir: str) -> pd.DataFrame:
    """(source, x, ch, n) sentence histogram — bounded by distinct
    (word-count, char-count) pairs, never by corpus rows."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["source", "text"]].copy()
        t["sent"] = t["text"].fillna("").str.split(r"[.!?]+")
        t = t[["source", "sent"]].explode("sent").dropna()
        x = t["sent"].str.count(r"\S+").to_numpy(np.int64)
        ch = t["sent"].str.replace(r"\s+", "", regex=True) \
            .str.len().to_numpy(np.int64)
        keep = x > 0
        g = pd.DataFrame({
            "source": t["source"].to_numpy()[keep],
            "x": x[keep], "ch": ch[keep],
            "n": np.ones(int(keep.sum()), np.int64)}) \
            .groupby(["source", "x", "ch"], as_index=False).sum()
        return g

    return reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(prep, batch_format="pandas"),
        ["source", "x", "ch"], {"n": ("n", "sum")}).to_pandas()


@register("menzerath_altmann_fit_by_source", sql=f"""
WITH {_MENZ_SQL},
m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(LN(CAST(x AS DOUBLE))) AS s1,
             SUM(1.0 / x) AS s2,
             SUM(LN(CAST(x AS DOUBLE)) * LN(CAST(x AS DOUBLE)))
                 AS s11,
             SUM(LN(CAST(x AS DOUBLE)) / x) AS s12,
             SUM(1.0 / (CAST(x AS DOUBLE) * x)) AS s22,
             SUM(LN(CAST(ch AS DOUBLE) / x)) AS t0,
             SUM(LN(CAST(x AS DOUBLE))
                 * LN(CAST(ch AS DOUBLE) / x)) AS t1,
             SUM(LN(CAST(ch AS DOUBLE) / x) / x) AS t2,
             SUM(LN(CAST(ch AS DOUBLE) / x)
                 * LN(CAST(ch AS DOUBLE) / x)) AS ty2
      FROM f GROUP BY source HAVING COUNT(*) >= 10),
dv AS (SELECT source, n, t0, ty2,
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
              + t0 * (s1 * s12 - s11 * s2) AS det2,
              t1, t2
       FROM m),
fit AS (SELECT source, n,
               det0 / det AS beta0, det1 / det AS beta1,
               det2 / det AS beta2,
               ((det0 / det) * t0 + (det1 / det) * t1
                + (det2 / det) * t2 - t0 * t0 / n)
               / (ty2 - t0 * t0 / n) AS r2
        FROM dv WHERE det != 0)
SELECT source, n AS n_sentences,
       ROUND(EXP(beta0), 6) AS a,
       ROUND(beta1, 6) AS b,
       ROUND(beta2, 6) AS c,
       ROUND(r2, 6) AS r2,
       CAST(CASE WHEN beta1 < 0 THEN 1 ELSE 0 END AS BIGINT)
           AS law_holds
FROM fit ORDER BY source""")
def menzerath_altmann_fit_by_source(sf_dir: str) -> pd.DataFrame:
    """Menzerath–Altmann law per source: the bigger the construct,
    the smaller its constituents — mean word length y against
    sentence length x in the full three-parameter form
    y = a·x^b·e^{c/x}, fit as ln y = ln a + b·ln x + c/x by the
    closed 3×3 adjugate solve the Almon batch established. In
    natural prose b is reliably negative (longer sentences are
    built from shorter words — the information-flow compensation
    the law describes); b ≥ 0 (law_holds = 0) marks a source as
    non-prose — ID dumps, codegen, template boilerplate — which
    complements brevity-law (frequency vs length) with the
    STRUCTURAL axis frequency can't see: a source can obey Zipf
    abbreviation while flunking Menzerath. Sentences are [.!?]+
    splits, Σword-lengths computed as whitespace-stripped LENGTH
    so no word-level explode happens; the sentence histogram
    reduce is bounded by distinct (x, ch) pairs; sources under 10
    sentences or with degenerate design drop identically."""
    h = _sentence_hist(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for src, g in h.groupby("source"):
        x = g["x"].to_numpy(np.int64).astype(np.float64)
        ch = g["ch"].to_numpy(np.int64).astype(np.float64)
        w = g["n"].to_numpy(np.int64).astype(np.float64)
        n = float(w.sum())
        if n < 10:
            continue
        u1, u2 = np.log(x), 1.0 / x
        yv = np.log(ch / x)
        s1, s2 = float((w * u1).sum()), float((w * u2).sum())
        s11 = float((w * u1 * u1).sum())
        s12 = float((w * u1 * u2).sum())
        s22 = float((w * u2 * u2).sum())
        t0 = float((w * yv).sum())
        t1 = float((w * u1 * yv).sum())
        t2 = float((w * u2 * yv).sum())
        ty2 = float((w * yv * yv).sum())
        det = n * (s11 * s22 - s12 * s12) \
            - s1 * (s1 * s22 - s12 * s2) \
            + s2 * (s1 * s12 - s11 * s2)
        if det == 0:
            continue
        det0 = t0 * (s11 * s22 - s12 * s12) \
            - s1 * (t1 * s22 - t2 * s12) \
            + s2 * (t1 * s12 - t2 * s11)
        det1 = n * (t1 * s22 - t2 * s12) \
            - t0 * (s1 * s22 - s2 * s12) \
            + s2 * (s1 * t2 - s2 * t1)
        det2 = n * (s11 * t2 - s12 * t1) \
            - s1 * (s1 * t2 - s2 * t1) \
            + t0 * (s1 * s12 - s11 * s2)
        b0, b1, b2 = det0 / det, det1 / det, det2 / det
        r2 = (b0 * t0 + b1 * t1 + b2 * t2 - t0 * t0 / n) \
            / (ty2 - t0 * t0 / n)
        rows.append((src, int(n), float(rha(np.exp(b0), 6)),
                     float(rha(b1, 6)), float(rha(b2, 6)),
                     float(rha(r2, 6)), 1 if b1 < 0 else 0))
    return pd.DataFrame(rows, columns=[
        "source", "n_sentences", "a", "b", "c", "r2",
        "law_holds"]).astype({"n_sentences": np.int64,
                              "law_holds": np.int64}) \
        .sort_values("source", ignore_index=True)


@register("menzerath_curve_global", sql=f"""
WITH {_MENZ_SQL}
SELECT LEAST(x, 15) AS x_words,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       ROUND(AVG(CAST(ch AS DOUBLE) / x), 6) AS mean_word_len
FROM f GROUP BY 1 ORDER BY 1""")
def menzerath_curve_global(sf_dir: str) -> pd.DataFrame:
    """The raw Menzerath curve pooled over the corpus: mean word
    length at each sentence length (15+ capped into one bucket),
    averaging the per-sentence mean (the regression target, not
    the char-pooled ratio — documented; they differ when long
    sentences mix short and long words). This is the table the
    per-source fit row summarizes — read them together the way
    the threshold-scan family pairs curve and verdict: a clean
    monotone decline supports the power-law read, a U-shape at
    large x (words lengthening again in run-on sentences) is the
    signature of concatenated/un-punctuated text where the
    'sentence' split itself broke, and flags the preprocessing
    rather than the prose."""
    h = _sentence_hist(sf_dir)
    xb = np.minimum(h["x"].to_numpy(np.int64), 15)
    y = h["ch"].to_numpy(np.int64) / h["x"].to_numpy(np.int64)
    w = h["n"].to_numpy(np.int64)
    g = pd.DataFrame({"x_words": xb, "wy": y * w, "n": w}) \
        .groupby("x_words", as_index=False).sum()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "x_words": g["x_words"].to_numpy(np.int64),
        "n_sentences": g["n"].to_numpy(np.int64),
        "mean_word_len": rha(g["wy"].to_numpy(np.float64)
                             / g["n"].to_numpy(np.float64), 6)})


# ---------------------------------------------------------------------------
# Quantile treatment effects: Doksum's shift function weekend vs
# weekday value, with the shape audit
# ---------------------------------------------------------------------------

def _group_cents_hist(sf_dir: str):
    """{grp: (sorted cents array, counts array)} for weekend(1) /
    weekday(0) event values — the same bounded histogram the Yuen
    batch reduces."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wkd = np.isin((us // 86_400_000_000 + 4) % 7, (0, 6))
        return pd.DataFrame({
            "grp": wkd.astype(np.int64),
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "n": np.ones(len(df), np.int64)})

    hist = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["grp", "cents"], {"n": ("n", "sum")}).to_pandas()
    out = {}
    for grp, g in hist.groupby("grp"):
        g = g.sort_values("cents", ignore_index=True)
        out[int(grp)] = (g["cents"].to_numpy(np.int64),
                         g["n"].to_numpy(np.int64))
    return out


def _rank_value(cents, counts, rank):
    """Value at the 1-based order-statistic rank via cum counts."""
    cum = np.cumsum(counts)
    return int(cents[np.searchsorted(cum, rank)])


#: per-group quantile/CI order statistics at rational ranks off the
#: weekend/weekday cents histogram.
_SHIFT_SQL = """
c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS grp
      FROM events),
h AS (SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1, 2),
o AS (SELECT grp, cents, n,
             SUM(n) OVER (PARTITION BY grp ORDER BY cents) AS cum,
             SUM(n) OVER (PARTITION BY grp) AS nn
      FROM h),
pp AS (SELECT UNNEST(generate_series(1, {nq})) AS num,
              {den} AS den),
rk AS (SELECT o.grp, pp.num, MAX(o.nn) AS nn,
              (pp.num * MAX(o.nn) + pp.den - 1) // pp.den AS rp,
              GREATEST(CAST(CEIL(pp.num * MAX(o.nn) * 1.0 / pp.den
                                 - 1.96 * SQRT(pp.num * MAX(o.nn)
                                               * 1.0 / pp.den
                                               * (1.0 - pp.num
                                                  * 1.0 / pp.den)))
                            AS BIGINT), 1) AS rlo,
              LEAST(CAST(CEIL(pp.num * MAX(o.nn) * 1.0 / pp.den
                              + 1.96 * SQRT(pp.num * MAX(o.nn)
                                            * 1.0 / pp.den
                                            * (1.0 - pp.num * 1.0
                                               / pp.den)))
                         AS BIGINT) + 1, MAX(o.nn)) AS rhi
       FROM o CROSS JOIN pp GROUP BY o.grp, pp.num, pp.den),
qv AS (SELECT rk.grp, rk.num,
              MIN(CASE WHEN o.cum >= rk.rp THEN o.cents END) AS qp,
              MIN(CASE WHEN o.cum >= rk.rlo THEN o.cents END)
                  AS qlo,
              MIN(CASE WHEN o.cum >= rk.rhi THEN o.cents END)
                  AS qhi
       FROM rk JOIN o ON o.grp = rk.grp
       GROUP BY 1, 2)"""


def _shift_table(sf_dir: str, nq: int, den: int):
    """Per-quantile (num, Δ cents, conservative CI) rows."""
    hists = _group_cents_hist(sf_dir)
    rows = []
    for num in range(1, nq + 1):
        vals = {}
        for grp in (0, 1):
            cents, counts = hists[grp]
            nn = int(counts.sum())
            rp = (num * nn + den - 1) // den
            p = num * nn * 1.0 / den
            s = 1.96 * np.sqrt(num * nn * 1.0 / den
                               * (1.0 - num * 1.0 / den))
            rlo = max(int(np.ceil(p - s)), 1)
            rhi = min(int(np.ceil(p + s)) + 1, nn)
            vals[grp] = (_rank_value(cents, counts, rp),
                         _rank_value(cents, counts, rlo),
                         _rank_value(cents, counts, rhi))
        qp1, qlo1, qhi1 = vals[1]
        qp0, qlo0, qhi0 = vals[0]
        rows.append((num, qp1, qp0, qp1 - qp0,
                     qlo1 - qhi0, qhi1 - qlo0))
    return rows


@register("doksum_shift_weekend_value", sql=f"""
WITH {_SHIFT_SQL.format(nq=9, den=10)}
SELECT a.num AS decile,
       ROUND(a.qp / 100.0, 6) AS q_weekend,
       ROUND(b.qp / 100.0, 6) AS q_weekday,
       ROUND((a.qp - b.qp) / 100.0, 6) AS delta_units,
       ROUND((a.qlo - b.qhi) / 100.0, 6) AS delta_ci_lo,
       ROUND((a.qhi - b.qlo) / 100.0, 6) AS delta_ci_hi,
       CAST(CASE WHEN a.qlo - b.qhi > 0 OR a.qhi - b.qlo < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM qv a JOIN qv b ON b.num = a.num
WHERE a.grp = 1 AND b.grp = 0
ORDER BY a.num""")
def doksum_shift_weekend_value(sf_dir: str) -> pd.DataFrame:
    """Doksum's shift function at the deciles: Δ(p) = Q_weekend(p) −
    Q_weekday(p) with distribution-free order-statistic CIs per
    side combined conservatively ([lo₁−hi₀, hi₁−lo₀] — Bonferroni-
    flavored, documented). The scalar weekend tests (Welch, Yuen,
    Mann–Whitney, Wasserstein — all present) each compress the
    comparison to one number; the shift function answers WHERE the
    distributions differ: Δ flat across deciles is a pure location
    shift (every test above agrees and any one suffices), Δ
    growing with p says the weekend effect lives in the upper tail
    (big orders get bigger — the whales again, now localized), and
    Δ of mixed sign is the crossing case where a mean test is
    structurally meaningless. Rational rank arithmetic for the
    point (⌈Np⌉ via integer division), Wald ranks for the CI off
    the same bounded cents histogram; exact integer order
    statistics throughout."""
    rows = _shift_table(sf_dir, 9, 10)
    rha = textstats.round_half_away
    return pd.DataFrame(
        [(num, float(rha(q1 / 100.0, 6)), float(rha(q0 / 100.0, 6)),
          float(rha(d / 100.0, 6)), float(rha(lo / 100.0, 6)),
          float(rha(hi / 100.0, 6)), 1 if lo > 0 or hi < 0 else 0)
         for num, q1, q0, d, lo, hi in rows],
        columns=["decile", "q_weekend", "q_weekday", "delta_units",
                 "delta_ci_lo", "delta_ci_hi", "significant"]) \
        .astype({"decile": np.int64, "significant": np.int64})


@register("shift_function_shape_audit", sql=f"""
WITH {_SHIFT_SQL.format(nq=19, den=20)},
dl AS (SELECT a.num, (a.qp - b.qp) / 100.0 AS d
       FROM qv a JOIN qv b ON b.num = a.num
       WHERE a.grp = 1 AND b.grp = 0),
lg AS (SELECT num, d, LAG(d) OVER (ORDER BY num) AS pd_
       FROM dl),
ag AS (SELECT MIN(d) AS mn, MAX(d) AS mx,
              MAX(CASE WHEN num = 10 THEN d END) AS med,
              CAST(SUM(CASE WHEN pd_ IS NOT NULL AND d < pd_
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS decreases,
              CAST(SUM(CASE WHEN pd_ IS NOT NULL
                             AND ((d > 0 AND pd_ < 0)
                                  OR (d < 0 AND pd_ > 0))
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS sign_changes
       FROM lg)
SELECT ROUND(mn, 6) AS min_delta,
       ROUND(mx, 6) AS max_delta,
       ROUND(med, 6) AS median_delta,
       ROUND(mx - mn, 6) AS delta_range,
       CAST(CASE WHEN decreases = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS monotone_nondecreasing,
       sign_changes
FROM ag""")
def shift_function_shape_audit(sf_dir: str) -> pd.DataFrame:
    """The shift function's SHAPE at the ventiles, summarized into
    the model-selection verdict: delta_range ≈ 0 licenses the
    location-shift model every scalar test implicitly assumes;
    monotone_nondecreasing = 1 with a material range is the
    location-SCALE signature (weekend values are a stretched
    version of weekday values — model the ratio, not the
    difference); sign_changes > 0 is the crossing case where
    'weekend values are higher' is false at some quantiles no
    matter what the mean says. median_delta anchors the scale.
    Same histogram and rank machinery at the finer 19-point
    grid; differences in whole value units."""
    rows = _shift_table(sf_dir, 19, 20)
    d = np.array([r[3] / 100.0 for r in rows], np.float64)
    decr = int((np.diff(d) < 0).sum())
    sc = int((np.sign(d[1:]) * np.sign(d[:-1]) < 0).sum())
    med = float(d[9])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "min_delta": [float(rha(float(d.min()), 6))],
        "max_delta": [float(rha(float(d.max()), 6))],
        "median_delta": [float(rha(med, 6))],
        "delta_range": [float(rha(float(d.max() - d.min()), 6))],
        "monotone_nondecreasing": np.array(
            [1 if decr == 0 else 0], np.int64),
        "sign_changes": np.array([sc], np.int64)})


# ---------------------------------------------------------------------------
# Partial rank correlation: Kendall and the three-estimator panel for
# views ~ purchases given clicks
# ---------------------------------------------------------------------------

def _kendall_tau_b(x: np.ndarray, y: np.ndarray) -> float:
    """Tie-corrected tau-b via the O(n²) sign sum (calendar-bounded)."""
    n = len(x)
    ii, jj = np.triu_indices(n, k=1)
    s = int((np.sign(x[jj] - x[ii])
             * np.sign(y[jj] - y[ii])).sum())
    n0 = n * (n - 1) // 2
    _, tx = np.unique(x, return_counts=True)
    _, ty = np.unique(y, return_counts=True)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    return s / np.sqrt(float(n0 - n1) * (n0 - n2))


_TAU_SQL = """
  (SELECT SUM(SIGN(b.{x} - a.{x}) * SIGN(b.{y} - a.{y}))
   FROM g a JOIN g b ON b.d > a.d)
  / SQRT(((SELECT CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1) / 2
           FROM g)
          - (SELECT COALESCE(SUM(CAST(t * (t - 1) AS DOUBLE) / 2),
                             0)
             FROM (SELECT COUNT(*) AS t FROM g GROUP BY {x}
                   HAVING COUNT(*) > 1) q1))
         * ((SELECT CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1) / 2
             FROM g)
            - (SELECT COALESCE(SUM(CAST(t * (t - 1) AS DOUBLE)
                                   / 2), 0)
               FROM (SELECT COUNT(*) AS t FROM g GROUP BY {y}
                     HAVING COUNT(*) > 1) q2)))"""

_DAYVEC_G_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS y,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS z
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d, COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y,
             COALESCE(e.z, 0) AS z
      FROM cal LEFT JOIN e ON e.d = cal.d)"""


@register("partial_kendall_views_purchases", sql=f"""
WITH {_DAYVEC_G_SQL},
tt AS (SELECT
  {_TAU_SQL.format(x="x", y="z")} AS txz,
  {_TAU_SQL.format(x="x", y="y")} AS txy,
  {_TAU_SQL.format(x="y", y="z")} AS tyz)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_days,
       ROUND(txz, 6) AS tau_views_purchases,
       ROUND(txy, 6) AS tau_views_clicks,
       ROUND(tyz, 6) AS tau_clicks_purchases,
       ROUND((txz - txy * tyz)
             / SQRT((1.0 - txy * txy) * (1.0 - tyz * tyz)), 6)
           AS partial_tau
FROM tt""")
def partial_kendall_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Partial Kendall tau of daily views and purchases CONTROLLING
    for clicks: τ_xy·z = (τxy − τxz·τyz)/√((1−τxz²)(1−τyz²)) on
    tie-corrected tau-b's. The Pearson partial (present) asks the
    same does-the-funnel-explain-it question but inherits moment
    fragility — one launch day can manufacture or destroy the
    partialled-out relationship; the Kendall version depends only
    on concordance ORDER, so it survives any monotone
    transformation and any magnitude of spike. partial_tau ≈ 0
    with raw τ_vp large is the clean mediation read (views move
    purchases only through clicks — the funnel is the whole
    story); partial_tau staying large says a second path exists
    (direct demand that skips clicking — e.g. repeat buyers).
    Zero-filled calendar triple; O(days²) sign sums exact
    integers; tau-b tie terms per variable."""
    g = _dayvec(sf_dir)
    x = g["x"].to_numpy(np.int64)
    y = g["y"].to_numpy(np.int64)
    z = g["z"].to_numpy(np.int64)
    txz = _kendall_tau_b(x, z)
    txy = _kendall_tau_b(x, y)
    tyz = _kendall_tau_b(y, z)
    pt = (txz - txy * tyz) / np.sqrt((1.0 - txy * txy)
                                     * (1.0 - tyz * tyz))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([len(x)], np.int64),
        "tau_views_purchases": [float(rha(txz, 6))],
        "tau_views_clicks": [float(rha(txy, 6))],
        "tau_clicks_purchases": [float(rha(tyz, 6))],
        "partial_tau": [float(rha(pt, 6))]})


@register("partial_corr_panel_views_purchases", sql=f"""
WITH {_DAYVEC_G_SQL},
rnk AS (SELECT d,
               RANK() OVER (ORDER BY x)
               + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
               RANK() OVER (ORDER BY y)
               + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry,
               RANK() OVER (ORDER BY z)
               + (COUNT(*) OVER (PARTITION BY z) - 1) / 2.0 AS rz,
               CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y,
               CAST(z AS DOUBLE) AS z
        FROM g),
pc AS (SELECT 'pearson' AS metric,
              (COUNT(*) * SUM(x * z) - SUM(x) * SUM(z))
              / SQRT((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                     * (COUNT(*) * SUM(z * z) - SUM(z) * SUM(z)))
                  AS rxz,
              (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
              / SQRT((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                     * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)))
                  AS rxy,
              (COUNT(*) * SUM(y * z) - SUM(y) * SUM(z))
              / SQRT((COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))
                     * (COUNT(*) * SUM(z * z) - SUM(z) * SUM(z)))
                  AS ryz
       FROM rnk
       UNION ALL
       SELECT 'spearman',
              (COUNT(*) * SUM(rx * rz) - SUM(rx) * SUM(rz))
              / SQRT((COUNT(*) * SUM(rx * rx) - SUM(rx) * SUM(rx))
                     * (COUNT(*) * SUM(rz * rz)
                        - SUM(rz) * SUM(rz))),
              (COUNT(*) * SUM(rx * ry) - SUM(rx) * SUM(ry))
              / SQRT((COUNT(*) * SUM(rx * rx) - SUM(rx) * SUM(rx))
                     * (COUNT(*) * SUM(ry * ry)
                        - SUM(ry) * SUM(ry))),
              (COUNT(*) * SUM(ry * rz) - SUM(ry) * SUM(rz))
              / SQRT((COUNT(*) * SUM(ry * ry) - SUM(ry) * SUM(ry))
                     * (COUNT(*) * SUM(rz * rz)
                        - SUM(rz) * SUM(rz)))
       FROM rnk)
SELECT metric, ROUND(rxz, 6) AS raw_corr,
       ROUND((rxz - rxy * ryz)
             / SQRT((1.0 - rxy * rxy) * (1.0 - ryz * ryz)), 6)
           AS partial_corr,
       ROUND(rxz - (rxz - rxy * ryz)
             / SQRT((1.0 - rxy * rxy) * (1.0 - ryz * ryz)), 6)
           AS mediation_drop
FROM pc ORDER BY metric""")
def partial_corr_panel_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Pearson and Spearman partial correlations of (views,
    purchases | clicks) side by side — the triangulation idiom the
    collocation and link-prediction panels use, applied to
    mediation: when all the partials (including the Kendall row's)
    agree the funnel explains the relationship, the conclusion is
    estimator-robust; Pearson partial collapsing while the rank
    partials hold is the moment-fragility signature (a spike day
    manufactured the Pearson mediation — distrust it); the
    reverse (rank partials near zero, Pearson holding) flags a
    relationship carried by extreme days only. mediation_drop =
    raw − partial is how much co-movement the click path absorbs
    under each estimator. Spearman uses average ranks (RANK() +
    (ties−1)/2 — identical to pandas method='average'); the
    partial formula is one shared expression across rows."""
    g = _dayvec(sf_dir)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    y = g["y"].to_numpy(np.int64).astype(np.float64)
    z = g["z"].to_numpy(np.int64).astype(np.float64)

    def pearson(a, b):
        n = len(a)
        num = n * (a * b).sum() - a.sum() * b.sum()
        den = np.sqrt((n * (a * a).sum() - a.sum() ** 2)
                      * (n * (b * b).sum() - b.sum() ** 2))
        return num / den

    rha = textstats.round_half_away
    rows = []
    for metric in ["pearson", "spearman"]:
        if metric == "spearman":
            a = pd.Series(x).rank(method="average").to_numpy()
            b = pd.Series(y).rank(method="average").to_numpy()
            c = pd.Series(z).rank(method="average").to_numpy()
        else:
            a, b, c = x, y, z
        rxz = pearson(a, c)
        rxy = pearson(a, b)
        ryz = pearson(b, c)
        part = (rxz - rxy * ryz) / np.sqrt((1.0 - rxy * rxy)
                                           * (1.0 - ryz * ryz))
        rows.append((metric, float(rha(rxz, 6)),
                     float(rha(part, 6)),
                     float(rha(rxz - part, 6))))
    return pd.DataFrame(rows, columns=[
        "metric", "raw_corr", "partial_corr",
        "mediation_drop"]).sort_values("metric",
                                       ignore_index=True)


# ---------------------------------------------------------------------------
# Reliability growth on the error stream: Laplace trend test +
# Crow–AMSAA power-law process MLE
# ---------------------------------------------------------------------------

#: error arrival offsets in seconds from the GLOBAL event-window
#: start, shifted +1 so the power-law log never sees zero.
_RELIA_SQL = """
w AS (SELECT MIN(epoch_us(ts) // 1000000) AS lo,
             MAX(epoch_us(ts) // 1000000) AS hi
      FROM events),
er AS (SELECT epoch_us(ts) // 1000000 - w.lo + 1 AS t, w.hi - w.lo
           + 1 AS tt
       FROM events, w WHERE event_type = 'error')"""


def _error_offsets(sf_dir: str):
    """(sorted second offsets + 1, window length) for error events
    — offsets reduce distributed, only the error subset reaches
    the driver (audit-bounded; at full scale this family rides the
    same second-histogram reduce as the point-process batch)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 1_000_000
        return pd.DataFrame({
            "g": np.zeros(len(s), np.int64), "lo": s, "hi": s})

    bounds = reduce_sink(
        _events(sf_dir, ["ts"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {"lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas()
    lo = int(bounds["lo"].iloc[0])
    hi = int(bounds["hi"].iloc[0])

    def prep2(df: pd.DataFrame) -> pd.DataFrame:
        k = df["event_type"].to_numpy() == "error"
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)[k]
        return pd.DataFrame({"s": us // 1_000_000 - lo + 1,
                             "c": np.ones(int(k.sum()), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep2, batch_format="pandas"),
        ["s"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("s", ignore_index=True)
    return (h["s"].to_numpy(np.int64), h["c"].to_numpy(np.int64),
            hi - lo + 1)


@register("laplace_trend_errors", sql=f"""
WITH {_RELIA_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(t AS DOUBLE)) AS st, MAX(tt) AS tt
      FROM er)
SELECT n AS n_errors, CAST(tt AS BIGINT) AS window_s,
       ROUND(st / n / tt, 6) AS mean_position,
       ROUND(SQRT(12.0 * n) * (st / n / tt - 0.5), 6) AS laplace_u,
       CAST(CASE WHEN SQRT(12.0 * n) * (st / n / tt - 0.5) < -1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS improving,
       CAST(CASE WHEN SQRT(12.0 * n) * (st / n / tt - 0.5) > 1.96
                 THEN 1 ELSE 0 END AS BIGINT) AS deteriorating
FROM s WHERE n > 0""")
def laplace_trend_errors(sf_dir: str) -> pd.DataFrame:
    """The Laplace trend test on raw error ARRIVAL TIMES: U =
    √(12n)·(t̄/T − ½), exactly centered under a homogeneous
    Poisson process (arrivals uniform on the window ⇒ mean
    position ½). This is the reliability engineer's trend test
    and strictly sharper than Mann–Kendall on daily error counts
    (present) for rate drift: MK discards within-day timing and
    pays a rank discount, while U uses every arrival's exact
    position — a 20% rate decline that MK needs months to flag
    moves U within weeks. improving = arrivals skew EARLY (the
    error process is cooling — fixes outpace regressions);
    deteriorating = the skew the on-call rota feels before the
    daily graph shows it. Global event window as exposure so
    quiet tails count as evidence; second-offset sums are exact
    integers."""
    s, c, tt = _error_offsets(sf_dir)
    n = int(c.sum())
    if n == 0:
        return pd.DataFrame(columns=[
            "n_errors", "window_s", "mean_position", "laplace_u",
            "improving", "deteriorating"])
    st = float((s.astype(np.float64) * c).sum())
    mp = st / n / tt
    u = np.sqrt(12.0 * n) * (mp - 0.5)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_errors": np.array([n], np.int64),
        "window_s": np.array([tt], np.int64),
        "mean_position": [float(rha(mp, 6))],
        "laplace_u": [float(rha(u, 6))],
        "improving": np.array([1 if u < -1.96 else 0], np.int64),
        "deteriorating": np.array([1 if u > 1.96 else 0],
                                  np.int64)})


@register("crow_amsaa_errors", sql=f"""
WITH {_RELIA_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(LN(CAST(tt AS DOUBLE) / t)) AS slog,
             MAX(tt) AS tt
      FROM er),
f AS (SELECT n, tt, n / slog AS beta FROM s WHERE slog > 0)
SELECT n AS n_errors,
       ROUND(beta, 6) AS beta,
       ROUND(n / POW(CAST(tt AS DOUBLE), beta), 9) AS lambda_scale,
       ROUND(1.0 / beta, 6) AS mtbf_ratio,
       CAST(CASE WHEN beta < 1.0 THEN 1 ELSE 0 END AS BIGINT)
           AS reliability_growth
FROM f""")
def crow_amsaa_errors(sf_dir: str) -> pd.DataFrame:
    """Crow–AMSAA power-law process fitted to the error stream by
    exact MLE: N(t) = λt^β with β̂ = n/Σln(T/tᵢ) — the standard
    reliability-growth model (MIL-HDBK-189) whose β answers the
    question the Laplace row only signs: HOW FAST is the error
    process improving. β < 1 is growth with instantaneous MTBF
    running 1/β times the cumulative average (mtbf_ratio — the
    honest current-state correction to any availability number
    computed from lifetime totals: at β = 0.5 the system is
    currently failing half as often as its history suggests);
    β > 1 is wear-out/regression accumulation. The pair is the
    diagnostic ladder: Laplace detects, Crow–AMSAA quantifies and
    extrapolates. Offsets shifted +1 s so the log never sees the
    window-opening event; Σln(T/tᵢ) is a shared-operand float sum
    over the error subset only."""
    s, c, tt = _error_offsets(sf_dir)
    n = int(c.sum())
    slog = float((np.log(float(tt) / s.astype(np.float64))
                  * c).sum())
    if n == 0 or slog <= 0:
        return pd.DataFrame(columns=[
            "n_errors", "beta", "lambda_scale", "mtbf_ratio",
            "reliability_growth"])
    beta = n / slog
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_errors": np.array([n], np.int64),
        "beta": [float(rha(beta, 6))],
        "lambda_scale": [float(rha(n / float(tt) ** beta, 9))],
        "mtbf_ratio": [float(rha(1.0 / beta, 6))],
        "reliability_growth": np.array(
            [1 if beta < 1.0 else 0], np.int64)})


# ---------------------------------------------------------------------------
# DiD robustness: placebo-in-time + parallel-pre-trends diagnostic
# ---------------------------------------------------------------------------

def _did_cell_means(sf_dir: str, lo, cut, hi) -> dict:
    """{(arm, post): mean cents} for events in [lo, hi) split at
    cut — the did_uplift_estimate reduce with a configurable
    window."""
    lo64 = np.datetime64(lo)
    cut64 = np.datetime64(cut)
    hi64 = np.datetime64(hi)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]")
        keep = (ts >= lo64) & (ts < hi64)
        arm = (df["user_id"].to_numpy(np.int64) % 2)[keep]
        post = (ts[keep] >= cut64).astype(np.int64)
        cents = np.rint(df["value"].to_numpy(np.float64)
                        * 100).astype(np.int64)[keep]
        g = (pd.DataFrame({"arm": arm, "post": post,
                           "cents": cents})
             .groupby(["arm", "post"], sort=False)["cents"]
             .agg(["sum", "size"]).reset_index())
        g.columns = ["arm", "post", "s", "n"]
        return g

    m = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["arm", "post"], {"s": ("s", "sum"),
                          "n": ("n", "sum")}).to_pandas()
    return {(int(r["arm"]), int(r["post"])):
            float(r["s"]) / float(r["n"]) for _, r in m.iterrows()}


@register("did_placebo_in_time", sql="""
WITH bp AS (SELECT user_id % 2 AS arm,
                   CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 0
                        ELSE 1 END AS post,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events WHERE ts < TIMESTAMP '2024-01-16'),
mp AS (SELECT arm, post, CAST(SUM(cents) AS DOUBLE) AS s,
              CAST(COUNT(*) AS DOUBLE) AS n
       FROM bp GROUP BY arm, post),
wp AS (SELECT
  (MAX(CASE WHEN arm = 1 AND post = 1 THEN s / n END)
   - MAX(CASE WHEN arm = 1 AND post = 0 THEN s / n END))
  - (MAX(CASE WHEN arm = 0 AND post = 1 THEN s / n END)
     - MAX(CASE WHEN arm = 0 AND post = 0 THEN s / n END))
      AS placebo
  FROM mp),
br AS (SELECT user_id % 2 AS arm,
              CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0
                   ELSE 1 END AS post,
              CAST(ROUND(value * 100) AS BIGINT) AS cents
       FROM events),
mr AS (SELECT arm, post, CAST(SUM(cents) AS DOUBLE) AS s,
              CAST(COUNT(*) AS DOUBLE) AS n
       FROM br GROUP BY arm, post),
wr AS (SELECT
  (MAX(CASE WHEN arm = 1 AND post = 1 THEN s / n END)
   - MAX(CASE WHEN arm = 1 AND post = 0 THEN s / n END))
  - (MAX(CASE WHEN arm = 0 AND post = 1 THEN s / n END)
     - MAX(CASE WHEN arm = 0 AND post = 0 THEN s / n END))
      AS realeff
  FROM mr)
SELECT ROUND(wp.placebo / 100, 6) AS placebo_estimate,
       ROUND(wr.realeff / 100, 6) AS real_estimate,
       ROUND(ABS(wp.placebo) / ABS(wr.realeff), 6)
           AS placebo_abs_ratio,
       CAST(CASE WHEN ABS(wp.placebo) <= 0.5 * ABS(wr.realeff)
                 THEN 1 ELSE 0 END AS BIGINT) AS placebo_passed
FROM wp, wr""")
def did_placebo_in_time(sf_dir: str) -> pd.DataFrame:
    """The placebo-in-time test every DiD referee asks for: re-run
    the did_uplift_estimate machinery entirely INSIDE the
    pre-period (fake treatment boundary at its midpoint, Jan 8 for
    the Jan 1–16 pre-window). Since no treatment happened there,
    the placebo DiD estimates pure differential drift between the
    arms — the exact bias DiD's parallel-trends assumption rules
    out by fiat. placebo_abs_ratio is the honest effect-size
    deflator: a 'real' estimate only deserves belief in excess of
    what the placebo shows the design manufactures from nothing;
    the ≤50% screen is the conventional rough gate (documented —
    the pre-trend row gives the formal test). Same arm hash,
    cent rounding and four-cell closed form as the parent row."""
    p = _did_cell_means(sf_dir, "1970-01-01", "2024-01-08",
                        "2024-01-16")
    r = _did_cell_means(sf_dir, "1970-01-01", "2024-01-16",
                        "2100-01-01")
    plc = ((p[(1, 1)] - p[(1, 0)])
           - (p[(0, 1)] - p[(0, 0)])) / 100
    real = ((r[(1, 1)] - r[(1, 0)])
            - (r[(0, 1)] - r[(0, 0)])) / 100
    rha = textstats.round_half_away
    return pd.DataFrame({
        "placebo_estimate": [float(rha(plc, 6))],
        "real_estimate": [float(rha(real, 6))],
        "placebo_abs_ratio": [float(rha(abs(plc) / abs(real), 6))],
        "placebo_passed": np.array(
            [1 if abs(plc) <= 0.5 * abs(real) else 0], np.int64)})


@register("did_pretrend_slope_gap", sql="""
WITH p AS (SELECT user_id % 2 AS arm,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events WHERE ts < TIMESTAMP '2024-01-16'),
dm AS (SELECT arm, d, SUM(cents) AS s,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2),
t0 AS (SELECT MIN(d) AS d0 FROM dm),
xy AS (SELECT arm, CAST(d - t0.d0 AS DOUBLE) AS t,
              CAST(s AS DOUBLE) / n AS y
       FROM dm, t0),
rg AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS nd,
              SUM(t) AS st, SUM(y) AS sy, SUM(t * t) AS stt,
              SUM(t * y) AS sty, SUM(y * y) AS syy
       FROM xy GROUP BY 1),
fit AS (SELECT arm, nd,
               (nd * sty - st * sy) / (nd * stt - st * st) AS b,
               (syy - sy * sy / nd
                - ((nd * sty - st * sy) / (nd * stt - st * st))
                  * (sty - st * sy / nd)) / (nd - 2.0)
                   / (stt - st * st / nd) AS se2
        FROM rg)
SELECT ROUND(a.b / 100, 6) AS slope_treated,
       ROUND(c.b / 100, 6) AS slope_control,
       ROUND((a.b - c.b) / 100, 6) AS slope_gap,
       ROUND((a.b - c.b) / SQRT(a.se2 + c.se2), 6) AS gap_t,
       CAST(CASE WHEN ABS((a.b - c.b) / SQRT(a.se2 + c.se2))
                      <= 1.96 THEN 1 ELSE 0 END AS BIGINT)
           AS parallel_ok
FROM fit a, fit c WHERE a.arm = 1 AND c.arm = 0""")
def did_pretrend_slope_gap(sf_dir: str) -> pd.DataFrame:
    """The formal parallel-pre-trends test: per-arm OLS slope of
    daily mean value over the pre-period (days equally weighted,
    documented), the slope GAP, and its t against the combined
    slope SEs. This is the assumption did_uplift_estimate rents
    without paying — DiD is unbiased only if the arms would have
    drifted in parallel absent treatment, and the pre-period is
    the one place that's testable. parallel_ok = 1 plus
    placebo_passed = 1 together are the full robustness
    certificate; gap_t large means the DiD estimate absorbs a
    drift differential of slope_gap PER DAY, so the bias scales
    with the post-window length — quantified, not just flagged.
    Closed-form per-arm OLS with residual-variance SEs, shared
    day spine; four integer-moment reduces only."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]")
        keep = ts < np.datetime64("2024-01-16")
        d = ts.astype(np.int64)[keep] // 86_400_000_000
        arm = (df["user_id"].to_numpy(np.int64) % 2)[keep]
        cents = np.rint(df["value"].to_numpy(np.float64)
                        * 100).astype(np.int64)[keep]
        g = pd.DataFrame({"arm": arm, "d": d, "s": cents,
                          "n": np.ones(len(d), np.int64)}) \
            .groupby(["arm", "d"], as_index=False).sum()
        return g

    dm = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["arm", "d"], {"s": ("s", "sum"),
                       "n": ("n", "sum")}).to_pandas()
    d0 = int(dm["d"].min())
    fits = {}
    for arm, g in dm.groupby("arm"):
        t = (g["d"].to_numpy(np.int64) - d0).astype(np.float64)
        y = g["s"].to_numpy(np.int64).astype(np.float64) \
            / g["n"].to_numpy(np.int64)
        nd = len(t)
        st, sy = t.sum(), y.sum()
        stt, sty = (t * t).sum(), (t * y).sum()
        syy = (y * y).sum()
        b = (nd * sty - st * sy) / (nd * stt - st * st)
        se2 = (syy - sy * sy / nd
               - b * (sty - st * sy / nd)) / (nd - 2.0) \
            / (stt - st * st / nd)
        fits[int(arm)] = (b, se2)
    b1, se1 = fits[1]
    b0, se0 = fits[0]
    gt = (b1 - b0) / np.sqrt(se1 + se0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "slope_treated": [float(rha(b1 / 100, 6))],
        "slope_control": [float(rha(b0 / 100, 6))],
        "slope_gap": [float(rha((b1 - b0) / 100, 6))],
        "gap_t": [float(rha(gt, 6))],
        "parallel_ok": np.array([1 if abs(gt) <= 1.96 else 0],
                                np.int64)})


# ---------------------------------------------------------------------------
# Representation similarity: linear CKA between embedding-dimension
# splits
# ---------------------------------------------------------------------------

#: long-form (vec_id, i, x) embedding entries; split membership is a
#: CASE on the 1-based position. Centered cross-Gram entries come
#: from raw moments: C[i,j] = S_xy[i,j] − S_x[i]·S_y[j]/n.
_CKA_SQL = """
l AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(UNNEST(embedding) AS DOUBLE) AS x
      FROM embeddings),
n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM l),
a AS (SELECT vec_id, i - ({off_a}) AS i, x FROM l
      WHERE {cond_a}),
b AS (SELECT vec_id, i - ({off_b}) AS i, x FROM l
      WHERE {cond_b}),
ma AS (SELECT i, SUM(x) AS s FROM a GROUP BY 1),
mb AS (SELECT i, SUM(x) AS s FROM b GROUP BY 1),
gab AS (SELECT a.i AS ia, b.i AS ib, SUM(a.x * b.x) AS s
        FROM a JOIN b ON b.vec_id = a.vec_id GROUP BY 1, 2),
gaa AS (SELECT a.i AS ia, a2.i AS ib, SUM(a.x * a2.x) AS s
        FROM a JOIN a a2 ON a2.vec_id = a.vec_id GROUP BY 1, 2),
gbb AS (SELECT b.i AS ia, b2.i AS ib, SUM(b.x * b2.x) AS s
        FROM b JOIN b b2 ON b2.vec_id = b.vec_id GROUP BY 1, 2),
fab AS (SELECT SUM((gab.s - ma.s * mb.s / n.n)
                   * (gab.s - ma.s * mb.s / n.n)) AS f
        FROM gab JOIN ma ON ma.i = gab.ia
                 JOIN mb ON mb.i = gab.ib, n),
faa AS (SELECT SUM((gaa.s - m1.s * m2.s / n.n)
                   * (gaa.s - m1.s * m2.s / n.n)) AS f
        FROM gaa JOIN ma m1 ON m1.i = gaa.ia
                 JOIN ma m2 ON m2.i = gaa.ib, n),
fbb AS (SELECT SUM((gbb.s - m1.s * m2.s / n.n)
                   * (gbb.s - m1.s * m2.s / n.n)) AS f
        FROM gbb JOIN mb m1 ON m1.i = gbb.ia
                 JOIN mb m2 ON m2.i = gbb.ib, n)"""


def _cka_split(sf_dir: str, mask_fn):
    """Linear CKA between the two dim-groups mask_fn selects (True
    → group A). Per-batch d×d partial moment matrices reduce; the
    driver sees only d² sums."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding"])
    X = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)
    n, d = X.shape
    sel = np.array([mask_fn(i + 1) for i in range(d)], bool)
    A, B = X[:, sel], X[:, ~sel]
    sa, sb = A.sum(axis=0), B.sum(axis=0)
    cab = A.T @ B - np.outer(sa, sb) / n
    caa = A.T @ A - np.outer(sa, sa) / n
    cbb = B.T @ B - np.outer(sb, sb) / n
    fab = float((cab * cab).sum())
    faa = float((caa * caa).sum())
    fbb = float((cbb * cbb).sum())
    return n, d, fab / np.sqrt(faa * fbb)


@register("cka_embedding_halves", sql=f"""
WITH {_CKA_SQL.format(off_a=0, cond_a="i <= 32",
                      off_b=32, cond_b="i > 32")}
SELECT (SELECT n FROM n) AS n_vectors,
       CAST(64 AS BIGINT) AS dim,
       ROUND((SELECT f FROM fab)
             / SQRT((SELECT f FROM faa)
                    * (SELECT f FROM fbb)), 6) AS cka
FROM n LIMIT 1""")
def cka_embedding_halves(sf_dir: str) -> pd.DataFrame:
    """Linear CKA (centered kernel alignment, Kornblith et al.)
    between the FIRST 32 and LAST 32 embedding dimensions:
    ‖Y_cᵀX_c‖²_F / (‖X_cᵀX_c‖_F·‖Y_cᵀY_c‖_F), the standard
    do-two-representations-encode-the-same-geometry score,
    invariant to rotation and isotropic scaling of either half.
    Read against matryoshka_prefix_recall (present): that query
    measures whether the PREFIX alone retrieves well; CKA says
    whether the suffix carries anything the prefix doesn't — CKA
    near 1 means the back half is geometrically redundant and
    32-dim truncation is near-free (storage and ANN cost halve),
    near 0 means the halves encode complementary structure and
    truncation throws information away no recall metric at small
    k will notice. Gram entries from raw moments (C = S_xy −
    s_x s_y/n) so each batch ships d×d partials — no vector ever
    re-shuffles; identical float expressions both engines."""
    n, d, cka = _cka_split(sf_dir, lambda i: i <= 32)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_vectors": np.array([n], np.int64),
        "dim": np.array([d], np.int64),
        "cka": [float(rha(cka, 6))]})


@register("cka_embedding_even_odd", sql=f"""
WITH {_CKA_SQL.format(off_a=0, cond_a="i % 2 = 1",
                      off_b=0, cond_b="i % 2 = 0")}
SELECT (SELECT n FROM n) AS n_vectors,
       ROUND((SELECT f FROM fab)
             / SQRT((SELECT f FROM faa)
                    * (SELECT f FROM fbb)), 6) AS cka_even_odd
FROM n LIMIT 1""")
def cka_embedding_even_odd(sf_dir: str) -> pd.DataFrame:
    """The same CKA for the even/odd dimension interleave — the
    control split. An arbitrary rotation of a generic embedding
    makes ANY fixed split statistically alike, so even/odd CKA ≈
    first/last CKA is the null reading; even/odd CKA high while
    first/last CKA is low is the matryoshka signature (variance
    and structure front-loaded into early dimensions — exactly
    what truncation-trained encoders produce, and what licenses
    prefix indexes), because interleaving samples both structure
    regimes into each half while the contiguous split separates
    them. The PCA-spectrum row shows the variance ordering; this
    pair shows whether the GEOMETRY (not just scale) orders with
    dimension index. Dim re-indexing within each half is
    irrelevant to CKA (Frobenius norms are permutation-
    invariant), so the position offsets need no alignment."""
    n, d, cka = _cka_split(sf_dir, lambda i: i % 2 == 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_vectors": np.array([n], np.int64),
        "cka_even_odd": [float(rha(cka, 6))]})


# ---------------------------------------------------------------------------
# Design analysis for the weekend rate comparison: MDE/power audit +
# Gelman–Carlin Type S/M retrodesign
# ---------------------------------------------------------------------------

def _as_upper_q(v):
    """A&S 26.2.17 upper-tail Q(v) for v ≥ 0 — the same polynomial
    the BH battery and Bayesian-AB rows use, so every engine pair
    shares one approximation."""
    t = 1.0 / (1.0 + 0.2316419 * v)
    return (0.39894228040143267 * np.exp(-(v * v) / 2.0)) \
        * (t * (0.319381530 + t * (-0.356563782
           + t * (1.781477937 + t * (-1.821255978
           + t * 1.330274429)))))


def _norm_q(x):
    """General upper tail P(Z > x)."""
    return _as_upper_q(x) if x >= 0 else 1.0 - _as_upper_q(-x)


#: shared A&S upper-tail macro (v must be the absolute argument).
_ASQ = ("(0.39894228040143267 * EXP(-(({v}) * ({v})) / 2.0)"
        " * ((1.0 / (1.0 + 0.2316419 * ({v})))"
        " * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ({v})))"
        " * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * ({v})))"
        " * (1.781477937 + (1.0 / (1.0 + 0.2316419 * ({v})))"
        " * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * ({v})))"
        " * 1.330274429))))))")

_QGEN = ("(CASE WHEN ({x}) >= 0 THEN "
         + _ASQ.format(v="({x})")
         + " ELSE 1.0 - " + _ASQ.format(v="(-({x}))") + " END)")


@register("weekend_mde_power_audit", sql=f"""
WITH {_RATE2_SQL},
se AS (SELECT ct.x1, ct.x0, ex.d1, ex.d0,
              (CAST(ct.x1 AS DOUBLE) / ex.d1)
              / (CAST(ct.x0 AS DOUBLE) / ex.d0) AS rr,
              SQRT(1.0 / ct.x1 + 1.0 / ct.x0) AS se
       FROM ct, ex WHERE ct.x1 > 0 AND ct.x0 > 0)
SELECT CAST(x1 AS BIGINT) AS weekend_purchases,
       CAST(x0 AS BIGINT) AS weekday_purchases,
       ROUND(rr, 6) AS rate_ratio,
       ROUND(se, 6) AS se_log,
       ROUND((EXP(2.801585 * se) - 1.0) * 100.0, 6)
           AS mde_rel_pct_80,
       ROUND((EXP(3.241516 * se) - 1.0) * 100.0, 6)
           AS mde_rel_pct_90,
       ROUND(POW(2.801585 * se / LN(1.05), 2), 6)
           AS exposure_multiple_5pct
FROM se""")
def weekend_mde_power_audit(sf_dir: str) -> pd.DataFrame:
    """The design-analysis numbers the weekend testing family
    implies but never prints: at the observed purchase volumes,
    the minimum detectable relative lift at 80%/90% power
    (MDE = exp((z_{{α/2}}+z_β)·SE_log) − 1 with the Poisson log-RR
    SE √(1/x₁+1/x₀); constants 1.96+0.8416, 1.96+1.2816
    documented) and the exposure multiple needed to detect a +5%
    lift — how many times the CURRENT data volume the experiment
    must accumulate, since SE² scales as 1/volume. The operational
    read is brutal and useful: an MDE_80 of 40% means every
    non-significant weekend verdict in the registry was nearly
    foreordained regardless of truth, and exposure_multiple says
    whether waiting is even viable (8× = two more months, 300× =
    redesign the metric). One reduce shared with the exact-test
    batch."""
    r = weekend_rate_ratio_evalue(sf_dir)
    if len(r) == 0:
        return pd.DataFrame(columns=[
            "weekend_purchases", "weekday_purchases", "rate_ratio",
            "se_log", "mde_rel_pct_80", "mde_rel_pct_90",
            "exposure_multiple_5pct"])
    x1 = int(r["weekend_purchases"].iloc[0])
    x0 = int(r["weekday_purchases"].iloc[0])
    rr = float(r["rate_ratio"].iloc[0])
    se = np.sqrt(1.0 / x1 + 1.0 / x0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "weekend_purchases": np.array([x1], np.int64),
        "weekday_purchases": np.array([x0], np.int64),
        "rate_ratio": [rr],
        "se_log": [float(rha(se, 6))],
        "mde_rel_pct_80": [float(rha(
            (np.exp(2.801585 * se) - 1.0) * 100.0, 6))],
        "mde_rel_pct_90": [float(rha(
            (np.exp(3.241516 * se) - 1.0) * 100.0, 6))],
        "exposure_multiple_5pct": [float(rha(
            (2.801585 * se / np.log(1.05)) ** 2, 6))]})


@register("weekend_type_s_m_retrodesign", sql=f"""
WITH {_RATE2_SQL},
se AS (SELECT SQRT(1.0 / ct.x1 + 1.0 / ct.x0) AS se
       FROM ct, ex WHERE ct.x1 > 0 AND ct.x0 > 0),
th AS (SELECT se, LN(1.05) / se AS th FROM se),
ph AS (SELECT se, th,
              {_QGEN.format(x="1.96 - th")} AS pw1,
              {_ASQ.format(v="(1.96 + th)")} AS pw2,
              0.39894228040143267
              * EXP(-((1.96 - th) * (1.96 - th)) / 2.0) AS f1,
              0.39894228040143267
              * EXP(-((1.96 + th) * (1.96 + th)) / 2.0) AS f2
       FROM th)
SELECT ROUND(th, 6) AS theta,
       ROUND(pw1 + pw2, 6) AS power_5pct,
       ROUND(pw2 / (pw1 + pw2), 6) AS type_s_prob,
       ROUND((th * pw1 + f1 + f2 - th * pw2)
             / ((pw1 + pw2) * th), 6) AS exaggeration_ratio
FROM ph""")
def weekend_type_s_m_retrodesign(sf_dir: str) -> pd.DataFrame:
    """Gelman–Carlin retrodesign for the weekend rate comparison,
    anchored at a true +5% lift (the same anchor as the MDE row):
    with θ = ln(1.05)/SE, the probability the test is significant
    at all (power), the probability a significant result has the
    WRONG SIGN (Type S = Φ(−1.96−θ)/power — the 'weekends are
    worse, p<0.05' headline that is pure noise), and the
    exaggeration ratio E[|estimate| | significant]/truth (Type M —
    the winner's-curse factor by which published-if-significant
    effects overstate reality). At low power these are shocking:
    power 0.1 ⇒ exaggeration ≈ 3× and Type S up to ~10% — the
    quantitative case for why underpowered dashboard wins
    shouldn't be shipped. Truncated-normal moments in closed form
    (θ·Q(a−θ)+φ(a−θ)+φ(a+θ)−θ·Q(a+θ)); all tails share the A&S
    26.2.17 polynomial already pinned across the registry."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wkd = np.isin((us // 86_400_000_000 + 4) % 7, (0, 6))
        pur = df["event_type"].to_numpy() == "purchase"
        return pd.DataFrame({
            "g": np.zeros(len(us), np.int64),
            "x1": (pur & wkd).astype(np.int64),
            "x0": (pur & ~wkd).astype(np.int64)})

    a = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {"x1": ("x1", "sum"), "x0": ("x0", "sum")}) \
        .to_pandas()
    x1, x0 = int(a["x1"].iloc[0]), int(a["x0"].iloc[0])
    if x1 == 0 or x0 == 0:
        return pd.DataFrame(columns=[
            "theta", "power_5pct", "type_s_prob",
            "exaggeration_ratio"])
    se = np.sqrt(1.0 / x1 + 1.0 / x0)
    th = np.log(1.05) / se
    pw1 = _norm_q(1.96 - th)
    pw2 = _as_upper_q(1.96 + th)
    f1 = 0.39894228040143267 * np.exp(-((1.96 - th) ** 2) / 2.0)
    f2 = 0.39894228040143267 * np.exp(-((1.96 + th) ** 2) / 2.0)
    power = pw1 + pw2
    rha = textstats.round_half_away
    return pd.DataFrame({
        "theta": [float(rha(th, 6))],
        "power_5pct": [float(rha(power, 6))],
        "type_s_prob": [float(rha(pw2 / power, 6))],
        "exaggeration_ratio": [float(rha(
            (th * pw1 + f1 + f2 - th * pw2) / (power * th), 6))]})


# ---------------------------------------------------------------------------
# Process mining: the alpha-algorithm footprint matrix + Heuristics
# Miner dependency graph on within-session directly-follows pairs
# ---------------------------------------------------------------------------

#: directly-follows counts: consecutive events within the same visit
#: session (1800 s rule, (ts, event_id) order) as ordered type pairs.
_DF_SQL = f"""
sx AS (SELECT user_id, event_type, ts, event_id,
              SUM(ns) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
       FROM ({_NS_SQL})),
oo AS (SELECT event_type,
              LEAD(event_type) OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) AS nxt
       FROM sx),
df AS (SELECT event_type AS a, nxt AS b,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM oo WHERE nxt IS NOT NULL GROUP BY 1, 2)"""


def _df_counts(sf_dir: str) -> pd.DataFrame:
    """(a, b, n) directly-follows counts via the bucketed
    sessionize-once idiom — per-bucket vectorized shift, only
    (a, b, n) partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id",
                          "event_type"])
    num_buckets = 32

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        sid = ((~same) | (gap_s >= 1800.0)).cumsum()
        nxt_sid = sid.shift(-1)
        nxt_ty = g["event_type"].shift(-1)
        keep = sid.eq(nxt_sid)
        out = pd.DataFrame({
            "a": g["event_type"].to_numpy()[keep.to_numpy()],
            "b": nxt_ty.to_numpy()[keep.to_numpy()],
            "n": np.ones(int(keep.sum()), np.int64)})
        return out.groupby(["a", "b"], as_index=False).sum()

    bucketed = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(pairs, batch_format="pandas")
    return reduce_sink(bucketed, ["a", "b"],
                       {"n": ("n", "sum")}).to_pandas()


@register("process_footprint_matrix", sql=f"""
WITH {_DF_SQL},
ty AS (SELECT DISTINCT event_type AS t FROM events),
pr AS (SELECT x.t AS ta, y.t AS tb FROM ty x JOIN ty y
       ON x.t <= y.t),
m AS (SELECT pr.ta, pr.tb,
             COALESCE((SELECT n FROM df
                       WHERE df.a = pr.ta AND df.b = pr.tb), 0)
                 AS nab,
             COALESCE((SELECT n FROM df
                       WHERE df.a = pr.tb AND df.b = pr.ta), 0)
                 AS nba
      FROM pr)
SELECT ta AS type_a, tb AS type_b,
       CAST(nab AS BIGINT) AS n_ab, CAST(nba AS BIGINT) AS n_ba,
       CASE WHEN ta = tb THEN
                 CASE WHEN nab > 0 THEN '||' ELSE '#' END
            WHEN nab > 0 AND nba > 0 THEN '||'
            WHEN nab > 0 THEN '->'
            WHEN nba > 0 THEN '<-'
            ELSE '#' END AS relation
FROM m ORDER BY ta, tb""")
def process_footprint_matrix(sf_dir: str) -> pd.DataFrame:
    """The alpha-algorithm footprint of the session event log: for
    every type pair, the directly-follows evidence classified into
    the four van-der-Aalst relations — a→b (causality: a precedes
    b, never the reverse), a←b, a‖b (both orders observed —
    concurrency or a loop), a#b (never adjacent). This is the
    process-DISCOVERY reading of the transition counts the Markov
    family (present) treats probabilistically: the Markov matrix
    says HOW OFTEN signup follows view; the footprint says whether
    the log could have been generated by a process where signup
    CAUSALLY requires view (strict '->'), which is the artifact a
    conformance checker or model miner consumes. Self-pairs use
    the same adjacent-repeat rule ('||' iff a length-1 loop was
    ever observed). Directly-follows = consecutive events inside
    one 1800 s visit session in (ts, event_id) order — the
    session family's exact conventions; only (a, b, n) partials
    shuffle."""
    df = _df_counts(sf_dir)
    cnt = {(a, b): int(n)
           for a, b, n in zip(df["a"], df["b"], df["n"])}
    types = sorted(set(df["a"]) | set(df["b"])
                   | set(_events(sf_dir, ["event_type"])
                         .map_batches(
                             lambda d: pd.DataFrame(
                                 {"t": d["event_type"].unique()}),
                             batch_format="pandas")
                         .to_pandas()["t"].unique()))
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i:]:
            nab = cnt.get((ta, tb), 0)
            nba = cnt.get((tb, ta), 0)
            if ta == tb:
                rel = "||" if nab > 0 else "#"
            elif nab > 0 and nba > 0:
                rel = "||"
            elif nab > 0:
                rel = "->"
            elif nba > 0:
                rel = "<-"
            else:
                rel = "#"
            rows.append((ta, tb, nab, nba, rel))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_ab", "n_ba", "relation"]).astype(
        {"n_ab": np.int64, "n_ba": np.int64})


@register("heuristics_dependency_graph", sql=f"""
WITH {_DF_SQL},
ty AS (SELECT DISTINCT event_type AS t FROM events),
pr AS (SELECT x.t AS ta, y.t AS tb FROM ty x JOIN ty y ON TRUE),
m AS (SELECT pr.ta, pr.tb,
             COALESCE((SELECT n FROM df
                       WHERE df.a = pr.ta AND df.b = pr.tb), 0)
                 AS nab,
             COALESCE((SELECT n FROM df
                       WHERE df.a = pr.tb AND df.b = pr.ta), 0)
                 AS nba
      FROM pr)
SELECT ta AS type_a, tb AS type_b,
       CAST(nab AS BIGINT) AS n_ab,
       ROUND(CASE WHEN ta = tb
                  THEN CAST(nab AS DOUBLE) / (nab + 1)
                  ELSE CAST(nab - nba AS DOUBLE) / (nab + nba + 1)
             END, 6) AS dependency
FROM m ORDER BY ta, tb""")
def heuristics_dependency_graph(sf_dir: str) -> pd.DataFrame:
    """Heuristics Miner dependency measure over the same directly-
    follows counts: dep(a,b) = (|a>b| − |b>a|)/(|a>b| + |b>a| + 1)
    for a≠b and |a>a|/(|a>a|+1) for self-loops — the noise-robust
    refinement the footprint needs at scale: the footprint's '->'
    flips to '||' on ONE stray reversed pair (and event logs
    always have a few), while the dependency measure degrades
    smoothly — dep 0.95 with thousands of observations is
    near-certain causality however many stray reversals exist,
    and the +1 denominator automatically discounts pairs with
    little evidence (5−0 observations give 0.83, not 1.0). A
    miner thresholds this table (commonly at 0.9) to draw the
    causal net; emitting the full T×T grid keeps the query
    deterministic and lets the threshold live downstream. Same
    session/adjacency conventions."""
    df = _df_counts(sf_dir)
    cnt = {(a, b): int(n)
           for a, b, n in zip(df["a"], df["b"], df["n"])}
    types = sorted(set(_events(sf_dir, ["event_type"])
                       .map_batches(
                           lambda d: pd.DataFrame(
                               {"t": d["event_type"].unique()}),
                           batch_format="pandas")
                       .to_pandas()["t"].unique()))
    rha = textstats.round_half_away
    rows = []
    for ta in types:
        for tb in types:
            nab = cnt.get((ta, tb), 0)
            nba = cnt.get((tb, ta), 0)
            if ta == tb:
                dep = nab / (nab + 1.0)
            else:
                dep = (nab - nba) / (nab + nba + 1.0)
            rows.append((ta, tb, nab, float(rha(dep, 6))))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_ab", "dependency"]).astype(
        {"n_ab": np.int64})


# ---------------------------------------------------------------------------
# Interaction structure of the dow × hour-band value table: Tukey's
# one-degree-of-freedom non-additivity + Mandel's row-linear test
# ---------------------------------------------------------------------------

#: complete 7×4 table of mean value cents by (dow, 6-hour band).
_DOWBAND_SQL = """
c AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS g,
             hour(ts) // 6 AS h,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
y AS (SELECT g, h, CAST(s AS DOUBLE) / n AS y FROM c),
gm AS (SELECT SUM(y) / 28.0 AS mu FROM y),
rm AS (SELECT g, SUM(y) / 4.0 AS m FROM y GROUP BY 1),
cm AS (SELECT h, SUM(y) / 7.0 AS m FROM y GROUP BY 1),
ab AS (SELECT y.g, y.h, y.y,
              rm.m - gm.mu AS alpha, cm.m - gm.mu AS beta,
              y.y - rm.m - cm.m + gm.mu AS r
       FROM y JOIN rm ON rm.g = y.g
              JOIN cm ON cm.h = y.h, gm)"""


def _dowband_table(sf_dir: str):
    """(7×4 mean-cents matrix, alpha, beta, mu) or None if any cell
    is empty (the tests need the complete table, documented)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "g": (us // 86_400_000_000 + 4) % 7,
            "h": df["ts"].dt.hour.to_numpy(np.int64) // 6,
            "s": np.rint(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64),
            "n": np.ones(len(us), np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g", "h"], {"s": ("s", "sum"),
                     "n": ("n", "sum")}).to_pandas()
    if len(c) < 28:
        return None
    Y = np.zeros((7, 4), np.float64)
    for _, row in c.iterrows():
        Y[int(row["g"]), int(row["h"])] = \
            float(row["s"]) / float(row["n"])
    mu = Y.sum() / 28.0
    alpha = Y.sum(axis=1) / 4.0 - mu
    beta = Y.sum(axis=0) / 7.0 - mu
    return Y, alpha, beta, mu


@register("tukey_additivity_dow_hourband", sql=f"""
WITH {_DOWBAND_SQL},
ss AS (SELECT SUM(alpha * beta * y) AS num,
              SUM(alpha * alpha) / 4.0 AS sa,
              SUM(beta * beta) / 7.0 AS sb,
              SUM(r * r) AS ssr
       FROM ab),
f AS (SELECT num / (sa * sb) AS lam,
             num * num / (sa * sb) AS ssna,
             ssr
      FROM ss)
SELECT ROUND(lam, 6) AS lambda_hat,
       ROUND(ssna, 6) AS ss_nonadd,
       ROUND(ssr - ssna, 6) AS ss_resid,
       ROUND(CASE WHEN ssr - ssna > 0
                  THEN ssna / ((ssr - ssna) / 17.0) END, 6)
           AS f_stat,
       CAST(CASE WHEN ssr - ssna <= 0
                 THEN CASE WHEN ssna > 0 THEN 1 ELSE 0 END
                 WHEN ssna / ((ssr - ssna) / 17.0) > 4.451322
                 THEN 1 ELSE 0 END AS BIGINT) AS nonadditive
FROM f""")
def tukey_additivity_dow_hourband(sf_dir: str) -> pd.DataFrame:
    """Tukey's one-degree-of-freedom test for non-additivity on the
    7×4 table of mean event value by weekday × 6-hour band —
    testable WITHOUT replication, which is exactly the
    single-cell-mean situation every pivot-table dashboard is in.
    The two-way ANOVA family (present) asks whether dow and hour
    effects exist; this asks whether they ADD — and the specific
    alternative Tukey powers against is the multiplicative one
    (cell ≈ μ + α + β + λαβ), i.e. 'evenings amplify the weekend
    effect' rather than sitting beside it. λ̂'s practical payload
    is the Tukey transformation ladder: a significant λ̂ suggests
    re-analyzing value^(1−λ̂μ) where effects become additive, the
    classical variance-stabilization hint. F against F(1,17)
    (4.451, documented); empty cells yield no row on both engines
    (complete-table requirement documented). Cell means are exact
    integer ratios; Σαβy, Σα², Σβ² shared float expressions."""
    t = _dowband_table(sf_dir)
    if t is None:
        return pd.DataFrame(columns=[
            "lambda_hat", "ss_nonadd", "ss_resid", "f_stat",
            "nonadditive"])
    Y, alpha, beta, mu = t
    num = float((alpha[:, None] * beta[None, :] * Y).sum())
    sa = float((alpha * alpha).sum())
    sb = float((beta * beta).sum())
    R = Y - Y.mean(axis=1, keepdims=True) \
        - Y.mean(axis=0, keepdims=True) + mu
    ssr = float((R * R).sum())
    ssna = num * num / (sa * sb)
    lam = num / (sa * sb)
    if ssr - ssna > 0:
        f = ssna / ((ssr - ssna) / 17.0)
        nonadd = 1 if f > 4.451322 else 0
    else:            # pure-interaction table: residual exhausted
        f = np.nan
        nonadd = 1 if ssna > 0 else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "lambda_hat": [float(rha(lam, 6))],
        "ss_nonadd": [float(rha(ssna, 6))],
        "ss_resid": [float(rha(ssr - ssna, 6))],
        "f_stat": [float(rha(f, 6))],
        "nonadditive": np.array([nonadd], np.int64)})


@register("mandel_row_slopes_dow_hourband", sql=f"""
WITH {_DOWBAND_SQL},
sb AS (SELECT SUM(beta * beta) / 7.0 AS sb FROM ab),
bs AS (SELECT g, SUM(y * beta) / (SELECT sb FROM sb) AS b
       FROM ab GROUP BY g),
ms AS (SELECT SUM((b - 1.0) * (b - 1.0))
              * (SELECT sb FROM sb) AS ssm
       FROM bs),
rr AS (SELECT SUM(r * r) AS ssr FROM ab),
ff AS (SELECT ms.ssm, rr.ssr,
              CASE WHEN rr.ssr - ms.ssm > 0
                   THEN (ms.ssm / 6.0)
                        / ((rr.ssr - ms.ssm) / 12.0) END AS f
       FROM ms, rr)
SELECT bs.g AS dow, ROUND(bs.b, 6) AS row_slope,
       ROUND((SELECT ssm FROM ms), 6) AS ss_mandel,
       ROUND((SELECT f FROM ff), 6) AS mandel_f,
       CAST(CASE WHEN (SELECT ssr - ssm FROM ff) <= 0
                 THEN CASE WHEN (SELECT ssm FROM ms) > 0
                           THEN 1 ELSE 0 END
                 WHEN (SELECT f FROM ff) > 2.996120
                 THEN 1 ELSE 0 END AS BIGINT) AS slopes_differ
FROM bs ORDER BY bs.g""")
def mandel_row_slopes_dow_hourband(sf_dir: str) -> pd.DataFrame:
    """Mandel's row-linear (bundle-of-lines) decomposition on the
    same table: each weekday's slope b_g = Σ_h y_gh β_h / Σβ²
    against the hour-band profile, SS = Σ(b_g−1)²Σβ², F on
    (6, 12) df (2.996). Tukey's 1-df test only powers against
    ONE interaction pattern (λαβ); Mandel generalizes to each row
    having its own AMPLITUDE on the shared column profile — the
    natural structure here: b_Sat ≈ 1.6 means Saturday traces the
    same intra-day value curve as everyone else but 60% steeper
    (the whole hour effect amplifies on weekends), which is
    actionable as a multiplicative model where a significant
    Tukey F alone leaves the form open. Per-row slopes ARE the
    output (the bundle), with the global F repeated per row in
    the table idiom the blocking/Erlang tables use. Same complete-
    table guard and exact cell means."""
    t = _dowband_table(sf_dir)
    if t is None:
        return pd.DataFrame(columns=[
            "dow", "row_slope", "ss_mandel", "mandel_f",
            "slopes_differ"])
    Y, alpha, beta, mu = t
    sb = float((beta * beta).sum())
    b = (Y * beta[None, :]).sum(axis=1) / sb
    ssm = float(((b - 1.0) ** 2).sum()) * sb
    R = Y - Y.mean(axis=1, keepdims=True) \
        - Y.mean(axis=0, keepdims=True) + mu
    ssr = float((R * R).sum())
    if ssr - ssm > 0:
        f = (ssm / 6.0) / ((ssr - ssm) / 12.0)
        differ = 1 if f > 2.996120 else 0
    else:            # row-linear structure exhausts the residual
        f = np.nan
        differ = 1 if ssm > 0 else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "dow": np.arange(7, dtype=np.int64),
        "row_slope": rha(b, 6),
        "ss_mandel": [float(rha(ssm, 6))] * 7,
        "mandel_f": [float(rha(f, 6))] * 7,
        "slopes_differ": np.full(7, differ, np.int64)})


# ---------------------------------------------------------------------------
# Long memory: GPH log-periodogram estimator + the four-estimator
# triangulation panel
# ---------------------------------------------------------------------------

#: periodogram of the zero-filled daily counts at the first
#: m = ⌊√n⌋ Fourier frequencies, with the GPH regressor
#: ln(4 sin²(λ/2)).
_GPH_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS t,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(x) / CAST(COUNT(*) AS DOUBLE) AS mu
       FROM g),
jj AS (SELECT UNNEST(generate_series(1, CAST(FLOOR(SQRT(
           (SELECT n FROM nn))) AS BIGINT))) AS j),
pg AS (SELECT jj.j,
              SUM((g.x - nn.mu)
                  * COS(2 * PI() * jj.j * g.t
                        / (SELECT n FROM nn))) AS a,
              SUM((g.x - nn.mu)
                  * SIN(2 * PI() * jj.j * g.t
                        / (SELECT n FROM nn))) AS b
       FROM jj CROSS JOIN g, nn GROUP BY jj.j),
li AS (SELECT j,
              LN((a * a + b * b)
                 / (2 * PI() * (SELECT n FROM nn))) AS ly,
              LN(4.0 * SIN(PI() * j / (SELECT n FROM nn))
                     * SIN(PI() * j / (SELECT n FROM nn))) AS lx
       FROM pg WHERE a * a + b * b > 0),
rg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
              SUM(lx) AS sx, SUM(ly) AS sy,
              SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
       FROM li)
"""


def _gph_d(sf_dir: str):
    """(n_days, m, d̂, SE_theory) of the GPH log-periodogram fit."""
    y = _daily_counts_filled(sf_dir)
    n = len(y)
    mu = y.sum() / n
    xc = y - mu
    t = np.arange(n, dtype=np.float64)
    m = int(np.floor(np.sqrt(n)))
    lxs, lys = [], []
    for j in range(1, m + 1):
        w = 2 * np.pi * j * t / n
        a = float((xc * np.cos(w)).sum())
        b = float((xc * np.sin(w)).sum())
        p = a * a + b * b
        if p <= 0:
            continue
        lys.append(np.log(p / (2 * np.pi * n)))
        lxs.append(np.log(4.0 * np.sin(np.pi * j / n) ** 2))
    lx = np.array(lxs)
    ly = np.array(lys)
    mm = len(lx)
    sx, sy = lx.sum(), ly.sum()
    sxx, sxy = (lx * lx).sum(), (lx * ly).sum()
    slope = (mm * sxy - sx * sy) / (mm * sxx - sx * sx)
    se = np.sqrt((np.pi ** 2 / 6.0)
                 / (sxx - sx * sx / mm))
    return n, mm, -slope, se


def _daily_counts_filled(sf_dir: str) -> np.ndarray:
    """Zero-filled daily event counts over the calendar window."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"d": us // 86_400_000_000,
                             "c": np.ones(len(us), np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas()
    lo, hi = int(e["d"].min()), int(e["d"].max())
    y = np.zeros(hi - lo + 1, np.float64)
    y[e["d"].to_numpy(np.int64) - lo] = e["c"].to_numpy(np.int64)
    return y


@register("gph_log_periodogram_daily", sql=f"""
WITH {_GPH_SQL}
SELECT (SELECT n FROM nn) AS n_days, m AS n_freqs,
       ROUND(-(m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
           AS d_gph,
       ROUND(SQRT((PI() * PI() / 6.0)
                  / (sxx - sx * sx / m)), 6) AS se_d,
       ROUND(0.5 - (m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
           AS h_gph,
       CAST(CASE WHEN ABS((m * sxy - sx * sy)
                          / (m * sxx - sx * sx)) < 0.5
                 THEN 1 ELSE 0 END AS BIGINT) AS stationary
FROM rg""")
def gph_log_periodogram_daily(sf_dir: str) -> pd.DataFrame:
    """Geweke–Porter-Hudak log-periodogram estimator of the
    fractional-integration order d on the daily counts: regress
    ln I(λⱼ) on ln(4sin²(λⱼ/2)) over the first ⌊√n⌋ Fourier
    frequencies; d̂ = −slope, SE from the theoretical π²/6
    log-periodogram error variance (documented — no residual
    estimate needed). The third canonical long-memory estimator
    beside aggregated-variance and DFA (present), and the only
    SEMIPARAMETRIC one: aggvar and DFA both lean on scaling
    across ALL timescales, so short-range AR structure biases
    them, while GPH reads only the lowest frequencies where
    short-range dynamics flatten out. d ∈ (0, 0.5) is stationary
    long memory (shocks decay hyperbolically — capacity
    provisioning must look much further back than any ARMA fit
    implies); d ≥ 0.5 corroborates the ADF/KPSS nonstationarity
    verdicts from the frequency side. Centered trig sums on the
    zero-filled calendar; zero-power frequencies drop identically
    on both engines."""
    n, m, d, se = _gph_d(sf_dir)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_freqs": np.array([m], np.int64),
        "d_gph": [float(rha(d, 6))],
        "se_d": [float(rha(se, 6))],
        "h_gph": [float(rha(d + 0.5, 6))],
        "stationary": np.array([1 if abs(d) < 0.5 else 0],
                               np.int64)})


@register("long_memory_triangulation", sql=f"""
WITH gp AS (SELECT h_gph FROM ({{GPH}}) t),
av AS (SELECT MAX(hurst_av) AS h FROM ({{AV}}) t),
df_ AS (SELECT MAX(dfa_alpha) AS h FROM ({{DFA}}) t),
rs AS (SELECT MAX(hurst) AS h FROM ({{RS}}) t),
al AS (SELECT gp.h_gph AS h_gph, av.h AS h_aggvar,
              df_.h AS h_dfa, rs.h AS h_rs
       FROM gp, av, df_, rs)
SELECT ROUND(h_gph, 6) AS h_gph,
       ROUND(h_aggvar, 6) AS h_aggvar,
       ROUND(h_dfa, 6) AS h_dfa,
       ROUND(h_rs, 6) AS h_rs,
       ROUND(GREATEST(h_gph, h_aggvar, h_dfa, h_rs)
             - LEAST(h_gph, h_aggvar, h_dfa, h_rs), 6)
           AS max_gap,
       CAST(CASE WHEN GREATEST(h_gph, h_aggvar, h_dfa, h_rs)
                      - LEAST(h_gph, h_aggvar, h_dfa, h_rs)
                      < 0.15 THEN 1 ELSE 0 END AS BIGINT)
           AS consistent
FROM al""")
def long_memory_triangulation(sf_dir: str) -> pd.DataFrame:
    """The four long-memory estimators in one row — GPH (H =
    d + ½), aggregated variance, DFA, and rescaled range — with
    the max pairwise gap and a consistency flag (< 0.15, a
    documented heuristic band). Long-memory estimation is
    notoriously estimator-sensitive: R/S biases high on
    short-range correlation, aggvar biases low on trends, DFA
    detrends but over-smooths at short windows, GPH is unbiased
    at low frequencies but high-variance at small m. Agreement
    across all four is therefore REAL evidence of hyperbolic
    persistence (no single method's artifact survives the other
    three), while a wide spread diagnoses WHICH contaminant is
    present by who disagrees: R/S alone high → short-range AR;
    aggvar alone low → a trend the others detrend away. The
    estimator-agreement audit idiom, applied to the H family."""
    rha = textstats.round_half_away
    _, _, d, _ = _gph_d(sf_dir)
    h_gph = float(rha(d + 0.5, 6))
    h_av = float(REGISTRY["aggvar_hurst_daily"][0](sf_dir)
                 ["hurst_av"].iloc[0])
    h_dfa = float(REGISTRY["dfa_alpha_daily"][0](sf_dir)
                  ["dfa_alpha"].iloc[0])
    h_rs = float(REGISTRY["hurst_exponent_daily"][0](sf_dir)
                 ["hurst"].iloc[0])
    hs = [h_gph, h_av, h_dfa, h_rs]
    gap = max(hs) - min(hs)
    return pd.DataFrame({
        "h_gph": [h_gph], "h_aggvar": [h_av],
        "h_dfa": [h_dfa], "h_rs": [h_rs],
        "max_gap": [float(rha(gap, 6))],
        "consistent": np.array([1 if gap < 0.15 else 0],
                               np.int64)})


def _fill_triangulation_sql():
    gph = f"WITH {_GPH_SQL} SELECT ROUND(0.5 - (m * sxy - sx * sy)" \
        " / (m * sxx - sx * sx), 6) AS h_gph FROM rg"
    sql = REGISTRY["long_memory_triangulation"][1]
    sql = sql.replace("{GPH}", gph) \
        .replace("{AV}", REGISTRY["aggvar_hurst_daily"][1]) \
        .replace("{DFA}", REGISTRY["dfa_alpha_daily"][1]) \
        .replace("{RS}", REGISTRY["hurst_exponent_daily"][1])
    REGISTRY["long_memory_triangulation"] = (
        REGISTRY["long_memory_triangulation"][0], sql)


_fill_triangulation_sql()


# ---------------------------------------------------------------------------
# Entropy-bias estimation: plugin vs Miller–Madow vs Chao–Shen word
# entropy per source
# ---------------------------------------------------------------------------

def _entropy_panel_raw(sf_dir: str):
    """[(source, n, s, f1, h_plugin, h_chao_shen)] at full float
    precision (NaN Chao–Shen for all-singleton sources)."""
    def prof(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            s=("word", "size"),
            n=("y", "sum"),
            f1=("y", lambda v: int((v == 1).sum()))).reset_index()
        for col in ["s", "n", "f1"]:
            g[col] = g[col].astype(np.int64)
        return g

    t = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(prof, batch_format="pandas"),
        ["source"], {"s": ("s", "sum"), "n": ("n", "sum"),
                     "f1": ("f1", "sum")}).to_pandas() \
        .set_index("source")
    counts = _source_word_counts(sf_dir).to_pandas()
    out = []
    for src in sorted(t.index):
        k = counts[counts["source"] == src]["y"] \
            .to_numpy(np.int64).astype(np.float64)
        n = float(t.loc[src, "n"])
        s = float(t.loc[src, "s"])
        f1 = float(t.loc[src, "f1"])
        p = k / n
        hp = float(-(p * np.log(p)).sum())
        cov = 1.0 - f1 / n
        if cov > 0:
            pt = cov * p
            hcs = float((-(pt * np.log(pt))
                         / (1.0 - np.power(1.0 - pt, n))).sum())
        else:
            hcs = np.nan
        out.append((src, n, s, f1, hp, hcs))
    return out


@register("entropy_bias_panel_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS k
      FROM w GROUP BY 1, 2),
t AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f1
      FROM c GROUP BY 1),
pl AS (SELECT c.source,
              -SUM((CAST(c.k AS DOUBLE) / t.n)
                   * LN(CAST(c.k AS DOUBLE) / t.n)) AS h_plugin,
              SUM(CASE WHEN 1.0 - CAST(t.f1 AS DOUBLE) / t.n > 0
                       THEN -((1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                              * CAST(c.k AS DOUBLE) / t.n)
                            * LN((1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                                 * CAST(c.k AS DOUBLE) / t.n)
                            / (1.0 - POW(1.0
                               - (1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                                 * CAST(c.k AS DOUBLE) / t.n, t.n))
                       ELSE NULL END) AS h_cs
       FROM c JOIN t ON t.source = c.source
       GROUP BY 1)
SELECT t.source, t.n AS n_tokens, t.s AS n_types, t.f1,
       ROUND(1.0 - CAST(t.f1 AS DOUBLE) / t.n, 6) AS coverage,
       ROUND(pl.h_plugin, 6) AS h_plugin,
       ROUND(pl.h_plugin + (t.s - 1.0) / (2.0 * t.n), 6)
           AS h_miller_madow,
       ROUND(pl.h_cs, 6) AS h_chao_shen,
       ROUND(pl.h_cs - pl.h_plugin, 6) AS bias_gap
FROM t JOIN pl ON pl.source = t.source
ORDER BY t.source""")
def entropy_bias_panel_by_source(sf_dir: str) -> pd.DataFrame:
    """Word-distribution entropy per source by three estimators:
    the plugin −Σp̂ ln p̂ (what every entropy row in any registry
    silently uses), Miller–Madow (plugin + (S−1)/2n, the
    first-order bias correction), and Chao–Shen (coverage-adjusted
    Horvitz–Thompson: shrink p̂ by Good's coverage C = 1−F₁/n,
    then weight each term by its inclusion probability
    1−(1−Cp̂)ⁿ). The plugin is biased LOW by up to ln-scale
    amounts exactly when the richness family says the source is
    undersampled — unseen words carry entropy the sample can't
    show — so cross-source diversity comparisons on plugin
    entropy systematically flatter small sources. bias_gap is the
    size of that correction; Chao–Shen reuses the SAME F₁/n
    coverage the ACE/Good–Turing rows are built on, tying the
    information-theory and unseen-species families together.
    All-singleton degenerate sources yield NULL Chao–Shen on
    both engines. Rides the (source, word, k) reduce; nats."""
    raw = _entropy_panel_raw(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for src, n, s, f1, hp, hcs in raw:
        cov = 1.0 - f1 / n
        rows.append((src, int(n), int(s), int(f1),
                     float(rha(cov, 6)), float(rha(hp, 6)),
                     float(rha(hp + (s - 1.0) / (2.0 * n), 6)),
                     float(rha(hcs, 6)),
                     float(rha(hcs - hp, 6))))
    return pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_types", "f1", "coverage",
        "h_plugin", "h_miller_madow", "h_chao_shen",
        "bias_gap"]).astype({"n_tokens": np.int64,
                             "n_types": np.int64,
                             "f1": np.int64})


@register("entropy_bias_coverage_link", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS k
      FROM w GROUP BY 1, 2),
t AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f1
      FROM c GROUP BY 1),
pl AS (SELECT c.source,
              -SUM((CAST(c.k AS DOUBLE) / t.n)
                   * LN(CAST(c.k AS DOUBLE) / t.n)) AS hp,
              SUM(-((1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                    * CAST(c.k AS DOUBLE) / t.n)
                  * LN((1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                       * CAST(c.k AS DOUBLE) / t.n)
                  / (1.0 - POW(1.0
                     - (1.0 - CAST(t.f1 AS DOUBLE) / t.n)
                       * CAST(c.k AS DOUBLE) / t.n, t.n))) AS hcs
       FROM c JOIN t ON t.source = c.source
       WHERE t.f1 < t.n
       GROUP BY 1),
xy AS (SELECT CAST(t.f1 AS DOUBLE) / t.n AS x,
              pl.hcs - pl.hp AS y
       FROM t JOIN pl ON pl.source = t.source),
rk AS (SELECT RANK() OVER (ORDER BY x)
              + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
              RANK() OVER (ORDER BY y)
              + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
       FROM xy),
sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns,
              (COUNT(*) * SUM(rx * ry) - SUM(rx) * SUM(ry))
              / SQRT((COUNT(*) * SUM(rx * rx)
                      - SUM(rx) * SUM(rx))
                     * (COUNT(*) * SUM(ry * ry)
                        - SUM(ry) * SUM(ry))) AS rho
       FROM rk),
mx AS (SELECT t.source, pl.hcs - pl.hp AS gap
       FROM t JOIN pl ON pl.source = t.source
       ORDER BY ROUND(pl.hcs - pl.hp, 9) DESC, t.source LIMIT 1)
SELECT sp.ns AS n_sources,
       ROUND(sp.rho, 6) AS spearman_deficit_vs_gap,
       mx.source AS most_biased_source,
       ROUND(mx.gap, 6) AS max_bias_gap
FROM sp, mx""")
def entropy_bias_coverage_link(sf_dir: str) -> pd.DataFrame:
    """The cross-source audit closing the loop: Spearman rank
    correlation between each source's coverage DEFICIT (F₁/n —
    the unseen-species family's undersampling signal) and its
    entropy bias gap (Chao–Shen − plugin). Theory says these move
    together (the bias is a function of the missing mass); seeing
    ρ ≈ 1 on the output is the empirical license to use F₁/n
    alone as a cheap entropy-trustworthiness screen at scales
    where the full Chao–Shen sum over the vocabulary is
    inconvenient — and the most-biased source is named with its
    gap, which is the concrete 'this diversity number is
    understated by X nats' caveat a corpus card should carry.
    Average ranks match pandas method='average'; argmax rounds
    9dp with source ties lexicographic; sources with F₁ = n drop
    from both engines."""
    raw = [(src, f1 / n, hcs - hp)
           for src, n, s, f1, hp, hcs in _entropy_panel_raw(sf_dir)
           if f1 < n]
    srcs = [r[0] for r in raw]
    x = np.array([r[1] for r in raw], np.float64)
    y = np.array([r[2] for r in raw], np.float64)
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    ns = len(rx)
    rho = (ns * (rx * ry).sum() - rx.sum() * ry.sum()) \
        / np.sqrt((ns * (rx * rx).sum() - rx.sum() ** 2)
                  * (ns * (ry * ry).sum() - ry.sum() ** 2))
    rha = textstats.round_half_away
    gk = rha(y, 9)
    order = sorted(range(ns), key=lambda i: (-gk[i], srcs[i]))
    top = order[0]
    return pd.DataFrame({
        "n_sources": np.array([ns], np.int64),
        "spearman_deficit_vs_gap": [float(rha(rho, 6))],
        "most_biased_source": [srcs[top]],
        "max_bias_gap": [float(rha(y[top], 6))]})


# ---------------------------------------------------------------------------
# Instrumental variables: the Wald/2SLS conversion slope with the
# weekend instrument + Durbin–Wu–Hausman endogeneity test
# ---------------------------------------------------------------------------

#: zero-filled daily (z = weekend dummy, x = views, y = purchases)
#: with the centered cross-moments every IV formula reads.
_IV_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CASE WHEN (cal.d + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END
          AS z,
             COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y
      FROM cal LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              SUM(CAST(z AS DOUBLE)) AS sz,
              SUM(CAST(x AS DOUBLE)) AS sx,
              SUM(CAST(y AS DOUBLE)) AS sy,
              SUM(CAST(z AS DOUBLE) * z) AS szz,
              SUM(CAST(x AS DOUBLE) * x) AS sxx,
              SUM(CAST(y AS DOUBLE) * y) AS syy,
              SUM(CAST(z AS DOUBLE) * x) AS szx,
              SUM(CAST(z AS DOUBLE) * y) AS szy,
              SUM(CAST(x AS DOUBLE) * y) AS sxy
       FROM g),
cm AS (SELECT n, sx / n AS mx, sy / n AS my,
              szz - sz * sz / n AS czz,
              sxx - sx * sx / n AS cxx,
              syy - sy * sy / n AS cyy,
              szx - sz * sx / n AS czx,
              szy - sz * sy / n AS czy,
              sxy - sx * sy / n AS cxy
       FROM mo)"""


@register("wald_iv_purchases_per_view", sql=f"""
WITH {_IV_SQL},
iv AS (SELECT n, mx, my, czz, cxx, cyy, czx, czy, cxy,
              czy / czx AS b_iv, cxy / cxx AS b_ols
       FROM cm WHERE czx != 0),
fs AS (SELECT *,
              (czx * czx / czz)
              / ((cxx - czx * czx / czz) / (n - 2.0)) AS f_first
       FROM iv)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(b_ols, 6) AS b_ols,
       ROUND(b_iv, 6) AS b_iv,
       ROUND(f_first, 6) AS first_stage_f,
       CAST(CASE WHEN f_first > 10.0 THEN 1 ELSE 0 END AS BIGINT)
           AS instrument_strong,
       ROUND(my - b_iv * mx, 6) AS iv_intercept
FROM fs""")
def wald_iv_purchases_per_view(sf_dir: str) -> pd.DataFrame:
    """The Wald/just-identified-2SLS estimate of purchases-per-view
    using the weekend dummy as instrument on the zero-filled daily
    panel: b_IV = cov(z,y)/cov(z,x) — equivalently the ratio of
    weekend/weekday mean DIFFERENCES. Every OLS conversion slope
    in the registry is confounded by demand shocks that move views
    and purchases together (a launch day raises both, inflating
    'purchases per view'); the instrument isolates only the view
    variation induced by the weekly schedule. The exclusion
    restriction (weekend affects purchases ONLY through views) is
    illustrative and stated, not assumed silently — which is
    precisely how IV results should be read, and the E-value row
    prices its violation. first_stage_f is the Stock–Yogo weak-
    instrument gate (> 10, documented): below it, b_IV's bias
    toward OLS plus its variance make the whole exercise
    decorative. Ten raw moments, centered closed forms, one
    reduce."""
    g = _dayvec(sf_dir)
    d0 = g["d"].to_numpy(np.int64)
    z = np.isin((d0 + 4) % 7, (0, 6)).astype(np.float64)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    y = g["z"].to_numpy(np.int64).astype(np.float64)
    n = float(len(z))
    czz = (z * z).sum() - z.sum() ** 2 / n
    cxx = (x * x).sum() - x.sum() ** 2 / n
    czx = (z * x).sum() - z.sum() * x.sum() / n
    czy = (z * y).sum() - z.sum() * y.sum() / n
    cxy = (x * y).sum() - x.sum() * y.sum() / n
    if czx == 0:
        return pd.DataFrame(columns=[
            "n_days", "b_ols", "b_iv", "first_stage_f",
            "instrument_strong", "iv_intercept"])
    b_iv = czy / czx
    b_ols = cxy / cxx
    f_first = (czx * czx / czz) \
        / ((cxx - czx * czx / czz) / (n - 2.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([int(n)], np.int64),
        "b_ols": [float(rha(b_ols, 6))],
        "b_iv": [float(rha(b_iv, 6))],
        "first_stage_f": [float(rha(f_first, 6))],
        "instrument_strong": np.array(
            [1 if f_first > 10.0 else 0], np.int64),
        "iv_intercept": [float(rha(
            y.sum() / n - b_iv * x.sum() / n, 6))]})


@register("durbin_wu_hausman_views", sql=f"""
WITH {_IV_SQL},
iv AS (SELECT n, czz, cxx, cyy, czx, czy, cxy,
              czy / czx AS b_iv, cxy / cxx AS b_ols
       FROM cm WHERE czx != 0),
s2 AS (SELECT *,
              (cyy - 2.0 * b_iv * cxy + b_iv * b_iv * cxx)
                  / (n - 2.0) AS sig2
       FROM iv),
hh AS (SELECT n, b_iv, b_ols, sig2,
              sig2 * czz / (czx * czx) - sig2 / cxx AS dv
       FROM s2)
SELECT ROUND(b_iv - b_ols, 6) AS slope_gap,
       ROUND(sig2, 6) AS sigma2_iv,
       ROUND((b_iv - b_ols) * (b_iv - b_ols) / dv, 6)
           AS hausman_stat,
       CAST(CASE WHEN (b_iv - b_ols) * (b_iv - b_ols) / dv
                      > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
           AS endogeneity_rejected
FROM hh WHERE dv > 0""")
def durbin_wu_hausman_views(sf_dir: str) -> pd.DataFrame:
    """Durbin–Wu–Hausman contrast on the same pair: H =
    (b_IV − b_OLS)²/(V_IV − V_OLS) against χ²₁, with both
    variances under the IV residual σ̂² (the classical Hausman
    assumption that makes the variance difference the variance OF
    the difference, documented). This is the test that decides
    which slope to QUOTE: failing to reject says views are
    effectively exogenous for this outcome and the far more
    precise OLS slope is the right headline (IV's variance
    penalty bought nothing); rejecting certifies the confounding
    the IV row hypothesizes and makes b_IV the defensible number
    despite its width. The pair therefore forms a decision
    procedure, not two estimates: strong first stage → Hausman →
    pick. Degenerate non-positive variance gaps (possible in
    finite samples) yield no row on both engines."""
    g = _dayvec(sf_dir)
    d0 = g["d"].to_numpy(np.int64)
    z = np.isin((d0 + 4) % 7, (0, 6)).astype(np.float64)
    x = g["x"].to_numpy(np.int64).astype(np.float64)
    y = g["z"].to_numpy(np.int64).astype(np.float64)
    n = float(len(z))
    czz = (z * z).sum() - z.sum() ** 2 / n
    cxx = (x * x).sum() - x.sum() ** 2 / n
    cyy = (y * y).sum() - y.sum() ** 2 / n
    czx = (z * x).sum() - z.sum() * x.sum() / n
    czy = (z * y).sum() - z.sum() * y.sum() / n
    cxy = (x * y).sum() - x.sum() * y.sum() / n
    if czx == 0:
        return pd.DataFrame(columns=[
            "slope_gap", "sigma2_iv", "hausman_stat",
            "endogeneity_rejected"])
    b_iv = czy / czx
    b_ols = cxy / cxx
    sig2 = (cyy - 2.0 * b_iv * cxy + b_iv * b_iv * cxx) / (n - 2.0)
    dv = sig2 * czz / (czx * czx) - sig2 / cxx
    if dv <= 0:
        return pd.DataFrame(columns=[
            "slope_gap", "sigma2_iv", "hausman_stat",
            "endogeneity_rejected"])
    h = (b_iv - b_ols) ** 2 / dv
    rha = textstats.round_half_away
    return pd.DataFrame({
        "slope_gap": [float(rha(b_iv - b_ols, 6))],
        "sigma2_iv": [float(rha(sig2, 6))],
        "hausman_stat": [float(rha(h, 6))],
        "endogeneity_rejected": np.array(
            [1 if h > 3.841459 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Model validation without a holdout: PRESS/predicted-R² for the
# daily trend + exact LOO cross-validation of the dow-mean model
# ---------------------------------------------------------------------------

@register("press_predicted_r2_daily", sql=f"""
WITH {_DAILY_SQL},
mo AS (SELECT MAX(n) AS n,
              CAST(SUM(t) AS HUGEINT) AS st,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(t * t) AS HUGEINT) AS stt,
              CAST(SUM(t * y) AS HUGEINT) AS sty,
              CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
       FROM x),
fit AS (SELECT n,
               CAST(n * sty - st * sy AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               CAST(sy AS DOUBLE) / n AS my,
               CAST(st AS DOUBLE) / n AS mt,
               CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n
                   AS ctt,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                   AS sst
        FROM mo),
pr AS (SELECT fit.n, fit.sst,
              SUM(POW((x.y - fit.my - fit.b * (x.t - fit.mt))
                      / (1.0 - (1.0 / fit.n
                                + (x.t - fit.mt) * (x.t - fit.mt)
                                  / fit.ctt)), 2)) AS press,
              SUM(POW(x.y - fit.my - fit.b * (x.t - fit.mt), 2))
                  AS sse
       FROM x, fit GROUP BY 1, 2)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(1.0 - sse / sst, 6) AS r2,
       ROUND(press, 6) AS press,
       ROUND(1.0 - press / sst, 6) AS predicted_r2,
       ROUND((1.0 - sse / sst) - (1.0 - press / sst), 6)
           AS optimism_gap
FROM pr""")
def press_predicted_r2_daily(sf_dir: str) -> pd.DataFrame:
    """PRESS and predicted R² for the daily-count trend: each
    residual inflated by its leverage, eᵢ/(1−hᵢᵢ) with hᵢᵢ = 1/n +
    (tᵢ−t̄)²/Sₜₜ — the EXACT leave-one-out prediction errors of
    OLS, no refitting (the hat-matrix identity). Every R² in the
    registry is an in-sample number; predicted R² is what the fit
    would score on days it never saw, and optimism_gap is the
    overfitting tax made visible. For a 2-parameter line on ~90
    days the gap should be small — seeing a LARGE one localizes
    influence at the window edges (leverage is maximal there, so
    an anomalous first/last day silently owns the fit, the same
    pathology cooks_distance flags pointwise but here priced in
    R² units a dashboard reader understands). Exact integer
    moments; the leverage expression is shared per day."""
    y = _daily_counts(sf_dir).astype(np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    my, mt = y.sum() / n, t.sum() / n
    ctt = (t * t).sum() - t.sum() ** 2 / n
    sst = (y * y).sum() - y.sum() ** 2 / n
    e = y - my - b * (t - mt)
    h = 1.0 / n + (t - mt) ** 2 / ctt
    press = float(((e / (1.0 - h)) ** 2).sum())
    sse = float((e * e).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "r2": [float(rha(1.0 - sse / sst, 6))],
        "press": [float(rha(press, 6))],
        "predicted_r2": [float(rha(1.0 - press / sst, 6))],
        "optimism_gap": [float(rha(press / sst - sse / sst, 6))]})


@register("loo_cv_dow_model_daily", sql="""
WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS d,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1),
dd AS (SELECT CAST((d + 4) % 7 AS BIGINT) AS dow, y FROM d0),
gm AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS ng,
              CAST(SUM(y) AS HUGEINT) AS sg
       FROM dd GROUP BY 1),
er AS (SELECT dd.y,
              CAST(gm.sg AS DOUBLE) / gm.ng AS fit_in,
              CASE WHEN gm.ng > 1
                   THEN (CAST(gm.sg AS DOUBLE) - dd.y)
                        / (gm.ng - 1) END AS fit_loo
       FROM dd JOIN gm ON gm.dow = dd.dow),
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(ABS(y - fit_in)) / COUNT(*) AS mae_in,
              SUM(ABS(y - fit_loo))
                  / SUM(CASE WHEN fit_loo IS NOT NULL THEN 1
                             ELSE 0 END) AS mae_loo,
              CAST(SUM(CASE WHEN fit_loo IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS dropped
       FROM er)
SELECT n AS n_days, dropped AS singleton_days,
       ROUND(mae_in, 6) AS mae_insample,
       ROUND(mae_loo, 6) AS mae_loo,
       ROUND(mae_loo / mae_in, 6) AS optimism_factor
FROM ag""")
def loo_cv_dow_model_daily(sf_dir: str) -> pd.DataFrame:
    """Exact leave-one-out cross-validation of the dow-profile
    model on daily counts — for group means the LOO prediction is
    closed-form, (S_g − yᵢ)/(n_g − 1), so the full CV runs with no
    refitting and no randomness. The dow_variance_explained /
    backtest rows grade this model in-sample or on one split;
    LOO grades it on EVERY day with the day excluded, and
    optimism_factor = MAE_loo/MAE_in is the honest inflation a
    7-parameter model extracts from ~13 observations per
    parameter (for group means the theoretical factor is exactly
    n_g/(n_g−1) per group under the identity — observing more
    than that means the dow means are carried by single unusual
    days). Days whose weekday appears only once drop from the
    LOO average (no leave-out prediction exists) and are counted
    honestly. Same no-zero-fill daily spine; integer group
    sums."""
    y = _daily_counts(sf_dir).astype(np.float64)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"d": us // 86_400_000_000,
                             "c": np.ones(len(us), np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    d = e["d"].to_numpy(np.int64)
    yv = e["c"].to_numpy(np.int64).astype(np.float64)
    dow = (d + 4) % 7
    mae_in_n = 0.0
    mae_loo_n = 0.0
    n_loo = 0
    dropped = 0
    for g in range(7):
        m = dow == g
        ng = int(m.sum())
        if ng == 0:
            continue
        sg = yv[m].sum()
        mae_in_n += np.abs(yv[m] - sg / ng).sum()
        if ng > 1:
            loo = (sg - yv[m]) / (ng - 1)
            mae_loo_n += np.abs(yv[m] - loo).sum()
            n_loo += ng
        else:
            dropped += 1
    n = len(yv)
    mae_in = mae_in_n / n
    mae_loo = mae_loo_n / n_loo
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "singleton_days": np.array([dropped], np.int64),
        "mae_insample": [float(rha(mae_in, 6))],
        "mae_loo": [float(rha(mae_loo, 6))],
        "optimism_factor": [float(rha(mae_loo / mae_in, 6))]})


# ---------------------------------------------------------------------------
# Proportional-reduction-in-error association: Goodman–Kruskal λ and
# Theil's uncertainty coefficient on segment × priority
# ---------------------------------------------------------------------------

def _seg_prio_table(sf_dir: str) -> pd.DataFrame:
    """(segment, priority, n) contingency cells for orders joined to
    customers — only 25 cells ever reach the driver."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"]
                                .to_numpy(np.int64),
                                cust["c_mktsegment"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["o_custkey"].map(cmap)
        keep = seg.notna()
        return pd.DataFrame({
            "seg": seg[keep].to_numpy(),
            "pri": df["o_orderpriority"].to_numpy()[
                keep.to_numpy()],
            "n": np.ones(int(keep.sum()), np.int64)})

    return reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
        .map_batches(prep, batch_format="pandas"),
        ["seg", "pri"], {"n": ("n", "sum")}).to_pandas()


_SEGPRI_SQL = """
ct AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       GROUP BY 1, 2)"""


@register("goodman_kruskal_lambda_segment_priority", sql=f"""
WITH {_SEGPRI_SQL},
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM ct),
rmax AS (SELECT seg, MAX(n) AS m FROM ct GROUP BY 1),
cmax AS (SELECT pri, MAX(n) AS m FROM ct GROUP BY 1),
rmarg AS (SELECT seg, SUM(n) AS m FROM ct GROUP BY 1),
cmarg AS (SELECT pri, SUM(n) AS m FROM ct GROUP BY 1),
ag AS (SELECT (SELECT SUM(m) FROM rmax) AS srm,
              (SELECT SUM(m) FROM cmax) AS scm,
              (SELECT MAX(m) FROM rmarg) AS mr,
              (SELECT MAX(m) FROM cmarg) AS mc,
              (SELECT nn FROM tot) AS nn)
SELECT CAST(nn AS BIGINT) AS n_orders,
       ROUND(CAST(srm - mc AS DOUBLE) / (nn - mc), 6)
           AS lambda_priority_given_segment,
       ROUND(CAST(scm - mr AS DOUBLE) / (nn - mr), 6)
           AS lambda_segment_given_priority,
       ROUND(CAST(srm - mc + scm - mr AS DOUBLE)
             / (2.0 * nn - mc - mr), 6) AS lambda_symmetric
FROM ag""")
def goodman_kruskal_lambda_segment_priority(sf_dir: str) \
        -> pd.DataFrame:
    """Goodman–Kruskal λ on the market-segment × order-priority
    table: the proportional reduction in PREDICTION ERROR from
    knowing the other variable, the association measure with an
    operational meaning Cramér's V (present, same table) lacks
    entirely — V can be comfortably 'significant' while λ = 0,
    which happens exactly when every segment's modal priority is
    the same: the association exists but is USELESS for
    prediction, so a routing rule keyed on segment would change
    nothing. Both directions printed (λ is asymmetric — segments
    may predict priority without the reverse) plus the symmetric
    blend. Exact integer modal/marginal sums over the 25-cell
    table; the contingency reduce is the only distributed work."""
    ct = _seg_prio_table(sf_dir)
    nn = int(ct["n"].sum())
    srm = int(ct.groupby("seg")["n"].max().sum())
    scm = int(ct.groupby("pri")["n"].max().sum())
    mr = int(ct.groupby("seg")["n"].sum().max())
    mc = int(ct.groupby("pri")["n"].sum().max())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_orders": np.array([nn], np.int64),
        "lambda_priority_given_segment": [float(rha(
            (srm - mc) / (nn - mc), 6))],
        "lambda_segment_given_priority": [float(rha(
            (scm - mr) / (nn - mr), 6))],
        "lambda_symmetric": [float(rha(
            (srm - mc + scm - mr) / (2.0 * nn - mc - mr), 6))]})


@register("uncertainty_coefficient_segment_priority", sql=f"""
WITH {_SEGPRI_SQL},
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM ct),
hr AS (SELECT -SUM((CAST(m AS DOUBLE) / tot.nn)
                   * LN(CAST(m AS DOUBLE) / tot.nn)) AS h
       FROM (SELECT seg, SUM(n) AS m FROM ct GROUP BY 1) q, tot
       GROUP BY tot.nn),
hc AS (SELECT -SUM((CAST(m AS DOUBLE) / tot.nn)
                   * LN(CAST(m AS DOUBLE) / tot.nn)) AS h
       FROM (SELECT pri, SUM(n) AS m FROM ct GROUP BY 1) q, tot
       GROUP BY tot.nn),
hj AS (SELECT -SUM((CAST(n AS DOUBLE) / tot.nn)
                   * LN(CAST(n AS DOUBLE) / tot.nn)) AS h
       FROM ct, tot GROUP BY tot.nn),
mi AS (SELECT hr.h + hc.h - hj.h AS i, hr.h AS hr, hc.h AS hc
       FROM hr, hc, hj)
SELECT ROUND(i, 6) AS mutual_info_nats,
       ROUND(i / hc, 6) AS u_priority_given_segment,
       ROUND(i / hr, 6) AS u_segment_given_priority,
       ROUND(2.0 * i / (hr + hc), 6) AS u_symmetric
FROM mi""")
def uncertainty_coefficient_segment_priority(sf_dir: str) \
        -> pd.DataFrame:
    """Theil's uncertainty coefficient on the same table: U(c|r) =
    I(r;c)/H(c), the share of the target's ENTROPY the predictor
    removes — λ's information-theoretic sibling, and the two
    disagree in a diagnostic way: λ only credits changes in the
    MODAL prediction, so association spread across non-modal
    cells scores λ = 0 but U > 0 (knowing the segment genuinely
    narrows the distribution without flipping the best guess —
    valuable for probabilistic routing, worthless for a
    deterministic rule). Reading λ and U together therefore
    separates 'useful for hard decisions' from 'useful for soft
    scores', which no single association number does. Both
    asymmetric directions plus the symmetric 2I/(H_r+H_c); plugin
    entropies in nats over the tiny exact table (the bias the
    entropy-panel row prices is negligible at 25 cells vs 10⁴
    orders, noted)."""
    ct = _seg_prio_table(sf_dir)
    nn = float(ct["n"].sum())
    pr = ct.groupby("seg")["n"].sum().to_numpy(np.int64) / nn
    pc = ct.groupby("pri")["n"].sum().to_numpy(np.int64) / nn
    pj = ct["n"].to_numpy(np.int64) / nn
    hr = float(-(pr * np.log(pr)).sum())
    hc = float(-(pc * np.log(pc)).sum())
    hj = float(-(pj * np.log(pj)).sum())
    i = hr + hc - hj
    rha = textstats.round_half_away
    return pd.DataFrame({
        "mutual_info_nats": [float(rha(i, 6))],
        "u_priority_given_segment": [float(rha(i / hc, 6))],
        "u_segment_given_priority": [float(rha(i / hr, 6))],
        "u_symmetric": [float(rha(2.0 * i / (hr + hc), 6))]})


# ---------------------------------------------------------------------------
# Cross-price elasticity: substitutes and complements in the brand
# catalog
# ---------------------------------------------------------------------------

#: monthly (brand, ln unit price, ln quantity) panel + the pairwise
#: two-regressor moments for ln q_a ~ ln p_a + ln p_b.
_XPE_SQL = """
pb AS (SELECT p_partkey, p_brand FROM part),
m AS (SELECT pb.p_brand AS brand,
             strftime(l_shipdate, '%Y-%m') AS mon,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) AS rev
      FROM lineitem JOIN pb ON l_partkey = p_partkey
      GROUP BY 1, 2),
lp AS (SELECT brand, mon, LN(q) AS lq, LN(rev / q) AS lp
       FROM m WHERE q > 0),
pr AS (SELECT a.brand AS ba, b.brand AS bb,
              CAST(COUNT(*) AS BIGINT) AS n,
              SUM(a.lp) AS s1, SUM(b.lp) AS s2,
              SUM(a.lp * a.lp) AS s11, SUM(a.lp * b.lp) AS s12,
              SUM(b.lp * b.lp) AS s22,
              SUM(a.lq) AS t0, SUM(a.lp * a.lq) AS t1,
              SUM(b.lp * a.lq) AS t2
       FROM lp a JOIN lp b ON b.mon = a.mon
                          AND b.brand != a.brand
       GROUP BY 1, 2 HAVING COUNT(*) >= 10),
dv AS (SELECT ba, bb, n,
              n * (s11 * s22 - s12 * s12)
              - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2) AS det,
              n * (t1 * s22 - t2 * s12)
              - t0 * (s1 * s22 - s2 * s12)
              + s2 * (s1 * t2 - s2 * t1) AS det1,
              n * (s11 * t2 - s12 * t1)
              - s1 * (s1 * t2 - s2 * t1)
              + t0 * (s1 * s12 - s11 * s2) AS det2
       FROM pr),
el AS (SELECT ba, bb, n, det1 / det AS own, det2 / det AS cross_
       FROM dv WHERE det != 0)"""


def _cross_elasticities(sf_dir: str) -> pd.DataFrame:
    """(ba, bb, n, own, cross) from the brand×month panel —
    driver work bounded by brands²×months, never rows."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = ray.put(dict(zip(part["p_partkey"]
                                .to_numpy(np.int64),
                                part["p_brand"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        mon = df["l_shipdate"].dt.strftime("%Y-%m")
        return pd.DataFrame({
            "brand": df["l_partkey"].map(bmap).to_numpy(),
            "mon": mon.to_numpy(),
            "q": df["l_quantity"].to_numpy(np.float64),
            "rev": df["l_extendedprice"].to_numpy(np.float64)})

    m = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_quantity",
                                 "l_extendedprice", "l_shipdate"])
        .map_batches(prep, batch_format="pandas"),
        ["brand", "mon"], {"q": ("q", "sum"),
                           "rev": ("rev", "sum")}).to_pandas()
    m = m[m["q"] > 0]
    m["lq"] = np.log(m["q"].to_numpy(np.float64))
    m["lp"] = np.log(m["rev"].to_numpy(np.float64)
                     / m["q"].to_numpy(np.float64))
    j = m.merge(m, on="mon", suffixes=("_a", "_b"))
    j = j[j["brand_a"] != j["brand_b"]]
    rows = []
    for (ba, bb), g in j.groupby(["brand_a", "brand_b"]):
        n = len(g)
        if n < 10:
            continue
        u1 = g["lp_a"].to_numpy(np.float64)
        u2 = g["lp_b"].to_numpy(np.float64)
        yv = g["lq_a"].to_numpy(np.float64)
        s1, s2 = u1.sum(), u2.sum()
        s11, s12 = (u1 * u1).sum(), (u1 * u2).sum()
        s22 = (u2 * u2).sum()
        t0, t1, t2 = yv.sum(), (u1 * yv).sum(), (u2 * yv).sum()
        det = n * (s11 * s22 - s12 * s12) \
            - s1 * (s1 * s22 - s12 * s2) \
            + s2 * (s1 * s12 - s11 * s2)
        if det == 0:
            continue
        det1 = n * (t1 * s22 - t2 * s12) \
            - t0 * (s1 * s22 - s2 * s12) \
            + s2 * (s1 * t2 - s2 * t1)
        det2 = n * (s11 * t2 - s12 * t1) \
            - s1 * (s1 * t2 - s2 * t1) \
            + t0 * (s1 * s12 - s11 * s2)
        rows.append((ba, bb, n, det1 / det, det2 / det))
    return pd.DataFrame(rows, columns=["ba", "bb", "n", "own",
                                       "cross"])


@register("cross_price_elasticity_top_pairs", sql=f"""
WITH {_XPE_SQL}
SELECT ba AS brand_q, bb AS brand_p, n AS n_months,
       ROUND(own, 6) AS own_elasticity,
       ROUND(cross_, 6) AS cross_elasticity
FROM el
ORDER BY ROUND(ABS(cross_), 9) DESC, ba, bb LIMIT 10""")
def cross_price_elasticity_top_pairs(sf_dir: str) -> pd.DataFrame:
    """Cross-price elasticities from the monthly brand panel:
    ln q_a ~ ln p_a + ln p_b per ordered brand pair (the proper
    two-regressor specification — a raw ln q_a on ln p_b slope
    would launder brand a's OWN price moves through whatever
    correlation the two price series share), top-10 by |cross|.
    The own-price row (present) prices a brand against itself;
    the cross term is the market-structure number: cross > 0 says
    b's price hikes push demand INTO a (substitutes — a's pricing
    must watch b), cross < 0 says they move together (complements
    — bundle them). Unit price is the revenue-weighted realized
    price rev/q per month (the only price the ledger knows,
    documented). Pairs need ≥ 10 common months; 3×3 adjugate per
    pair on a brands²-bounded panel; 9dp |cross| ranking with
    lexicographic ties."""
    el = _cross_elasticities(sf_dir)
    rha = textstats.round_half_away
    el = el.assign(k=rha(np.abs(el["cross"].to_numpy()), 9)) \
        .sort_values(["k", "ba", "bb"],
                     ascending=[False, True, True],
                     kind="mergesort").head(10)
    return pd.DataFrame({
        "brand_q": el["ba"].to_numpy(),
        "brand_p": el["bb"].to_numpy(),
        "n_months": el["n"].to_numpy(np.int64),
        "own_elasticity": rha(el["own"].to_numpy(), 6),
        "cross_elasticity": rha(el["cross"].to_numpy(), 6)})
