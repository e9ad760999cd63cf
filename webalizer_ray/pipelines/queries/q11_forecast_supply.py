"""Driver-contract queries (chunk 11/18).
Sections:
  - Intermittent-demand forecasting + inventory policy (the operators the
  - L-moments: robust shape statistics via exact probability-weighted
  - Cooperative-game attribution: session channel coalitions + Shapley
  - Stein shrinkage of the hourly mean-value profile + split-half backtest
  - ss == 0 (perfectly flat profile) -> SQL's 1 - inf -> GREATEST 0
  - Competing risks: Aalen–Johansen cumulative incidence (purchase vs
  - Peaks-over-threshold: GPD method-of-moments fit + return levels
  - refit unrounded parameters (the registered row is rounded)
  - Probabilistic-forecast verification: Brier + Murphy decomposition of
  - Dagum (1997) Gini decomposition by market segment: within + net
  - Kneser–Ney statistics: absolute-discount estimate + continuation
  - Sequential-testing peeking audit: daily z-path vs O'Brien–Fleming
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
    _events,
    np,
    pd,
    ray,
    rd,
    reduce_sink,
    register,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
)
from webalizer_ray.pipelines.queries.q08_rank_dominance import (  # noqa: F401
    _part_month_demand,
)
from webalizer_ray.pipelines.queries.q10_session_bias import (  # noqa: F401
    _daily_counts_vec,
)



# ---------------------------------------------------------------------------
# Intermittent-demand forecasting + inventory policy (the operators the
# Syntetos–Boylan quadrant table routes TO)
# ---------------------------------------------------------------------------

@register("croston_sba_top_parts", sql="""
WITH q AS (SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m')
               AS m,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
           FROM lineitem),
pm AS (SELECT pk, m, CAST(SUM(qc) AS BIGINT) AS q
       FROM q GROUP BY 1, 2),
mi AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) - 1 AS idx
       FROM (SELECT DISTINCT m FROM pm)),
s AS (SELECT pk, idx, q FROM pm JOIN mi USING (m)),
r AS (SELECT pk, q, idx,
             ROW_NUMBER() OVER (PARTITION BY pk ORDER BY idx) AS rn,
             COUNT(*) OVER (PARTITION BY pk) AS k,
             idx - LAG(idx) OVER (PARTITION BY pk ORDER BY idx)
                 AS gap
      FROM s),
w AS (SELECT pk, k,
             CASE WHEN rn = 1 THEN POWER(0.9, k - 1)
                  ELSE 0.1 * POWER(0.9, k - rn) END AS wt,
             q,
             CASE WHEN rn = 1 THEN idx + 1 ELSE gap END AS iv
      FROM r WHERE k >= 2),
a AS (SELECT pk, MAX(k) AS k, SUM(wt * q) AS z, SUM(wt * iv) AS p
      FROM w GROUP BY 1),
f AS (SELECT pk, k, ROUND(p, 6) AS p_hat,
             ROUND(z / p / 100.0, 6) AS croston_fc,
             ROUND(0.95 * z / p / 100.0, 6) AS sba_fc
      FROM a),
rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY sba_fc DESC, pk)
           AS rr
       FROM f)
SELECT CAST(pk AS BIGINT) AS part_key,
       CAST(k AS BIGINT) AS n_demand_months, p_hat, croston_fc,
       sba_fc
FROM rk WHERE rr <= 10 ORDER BY sba_fc DESC, part_key""")
def croston_sba_top_parts(sf_dir: str) -> pd.DataFrame:
    """Croston's method with the Syntetos–Boylan approximation —
    the forecaster the quadrant table routes intermittent/lumpy
    parts TO (plain exponential smoothing biases toward zero right
    after each demand spike; Croston smooths demand SIZE and
    demand INTERVAL separately and forecasts their ratio, SBA's
    (1−α/2) factor removes Croston's documented positive bias).
    The trick that makes it distributed-exact: a constant-α EWMA
    has the closed form Σ wⱼxⱼ with wⱼ = 0.9^(k−1) at init and
    0.1·0.9^(k−j) after, so NO sequential recursion runs anywhere
    — both engines evaluate one weighted sum per part over the
    nonzero-month rows only (zeros never materialize; the interval
    sequence IS the gap between demand months, init interval from
    the virtual month −1). Top-10 by 6dp-rounded SBA rate with
    part-key ties; single-demand-month parts are excluded (k ≥ 2)
    identically."""
    pm = _part_month_demand(sf_dir)
    months = reduce_sink(pm, ["m"], {"c": ("m", "size")}) \
        .to_pandas().sort_values("m", ignore_index=True)
    midx_ref = ray.put({m: i for i, m
                        in enumerate(months["m"].tolist())})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        midx = ray.get(midx_ref)
        df = df.copy()
        df["idx"] = df["m"].map(midx).astype(np.int64)
        df["bucket_"] = (df["pk"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return df.drop(columns=["m"])

    def croston(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pk", "idx"], ignore_index=True)
        rows = []
        for pk, d in g.groupby("pk", sort=False):
            k = len(d)
            if k < 2:
                continue
            idx = d["idx"].to_numpy(np.int64)
            q = d["q"].to_numpy(np.int64)
            rn = np.arange(1, k + 1)
            wt = np.where(rn == 1, 0.9 ** (k - 1),
                          0.1 * 0.9 ** (k - rn).astype(np.float64))
            iv = np.empty(k, np.float64)
            iv[0] = idx[0] + 1
            iv[1:] = np.diff(idx)
            z = float((wt * q).sum())
            p = float((wt * iv).sum())
            rows.append((int(pk), k, p, z))
        if not rows:
            return pd.DataFrame(columns=["part_key",
                                         "n_demand_months",
                                         "p_hat", "croston_fc",
                                         "sba_fc"])
        rha = textstats.round_half_away
        out = pd.DataFrame(rows, columns=["part_key",
                                          "n_demand_months", "p",
                                          "z"])
        out["p_hat"] = [float(rha(v, 6)) for v in out["p"]]
        out["croston_fc"] = [float(rha(z / p / 100.0, 6))
                             for z, p in zip(out["z"], out["p"])]
        out["sba_fc"] = [float(rha(0.95 * z / p / 100.0, 6))
                         for z, p in zip(out["z"], out["p"])]
        out = out.sort_values(["sba_fc", "part_key"],
                              ascending=[False, True],
                              kind="mergesort").head(10)
        return out[["part_key", "n_demand_months", "p_hat",
                    "croston_fc", "sba_fc"]] \
            .astype({"part_key": np.int64,
                     "n_demand_months": np.int64})

    parts = pm.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket_") \
        .map_groups(lambda g: croston(g.drop(columns=["bucket_"])),
                    batch_format="pandas").to_pandas()
    return parts.sort_values(["sba_fc", "part_key"],
                             ascending=[False, True],
                             kind="mergesort").head(10) \
        .reset_index(drop=True) \
        .astype({"part_key": np.int64, "n_demand_months": np.int64})


@register("safety_stock_by_brand", sql="""
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
bm AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS nd,
              CAST(SUM(qc) AS HUGEINT) AS s1,
              CAST(SUM(CAST(qc AS HUGEINT) * qc) AS HUGEINT) AS s2
       FROM d GROUP BY 1),
lg AS (SELECT pb.p_brand AS brand,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(epoch_us(l.l_shipdate) // 86400000000
                       - epoch_us(o.o_orderdate) // 86400000000)
                   AS BIGINT) AS slag
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                       JOIN pb ON l.l_partkey = pb.p_partkey
       WHERE epoch_us(l.l_shipdate) // 86400000000
             >= epoch_us(o.o_orderdate) // 86400000000
       GROUP BY 1),
st AS (SELECT bm.brand, bm.nd,
              CAST(bm.s1 AS DOUBLE) / sp.dd / 100.0 AS mu,
              SQRT(CAST(sp.dd * bm.s2 - bm.s1 * bm.s1 AS DOUBLE)
                   / (CAST(sp.dd AS DOUBLE) * (sp.dd - 1.0)))
              / 100.0 AS sigma,
              CAST(lg.slag AS DOUBLE) / lg.n AS lead_d
       FROM bm JOIN lg ON bm.brand = lg.brand, sp)
SELECT brand, nd AS demand_days,
       ROUND(mu, 6) AS mu_daily, ROUND(sigma, 6) AS sigma_daily,
       ROUND(lead_d, 6) AS lead_days,
       ROUND(1.644854 * sigma * SQRT(lead_d), 6) AS safety_stock,
       ROUND(mu * lead_d + 1.644854 * sigma * SQRT(lead_d), 6)
           AS reorder_point
FROM st ORDER BY brand""")
def safety_stock_by_brand(sf_dir: str) -> pd.DataFrame:
    """Classical (z·σ√L) safety stock and reorder point per brand
    at a 95% cycle-service level: daily demand mean/σ over the
    full shipping calendar (zero days are free — they add to
    neither integer sum), lead time as each brand's own mean
    order-to-ship lag. This is the query that turns three
    descriptive families already in the registry (demand
    variability, lag quantiles, bullwhip) into the number a
    warehouse actually sets: ROP = μ·L + z·σ√L. The √L
    independence assumption is documented (daily demands iid
    within the lead window — exactly what the long-memory battery
    tests); all demand moments are exact HUGEINT off the
    (brand, day) reduce, the lag mean is an exact integer ratio,
    and the fact-to-fact lag join runs through auto_join's hash
    machinery with the part dimension broadcast once. Items that
    ship BEFORE their order date (the population
    causality_violations_audit counts) are excluded from the lead
    estimate on both engines — a policy can't plan on negative
    lead times."""
    from webalizer_ray.stages.join import auto_join

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
                    ["brand", "day"], {"qc": ("qc", "sum")})
    bounds = d.map_batches(
        lambda df: pd.DataFrame({"mn": [df["day"].min()],
                                 "mx": [df["day"].max()]}),
        batch_format="pandas").to_pandas()
    dd = int(bounds["mx"].max()) - int(bounds["mn"].min()) + 1

    def mom(df: pd.DataFrame) -> pd.DataFrame:
        qc = df["qc"].to_numpy(np.int64)
        return pd.DataFrame({"brand": df["brand"], "nd": 1,
                             "s1": qc, "s2": qc * qc}) \
            .groupby("brand", as_index=False).sum()

    bm = reduce_sink(d.map_batches(mom, batch_format="pandas"),
                     ["brand"], {"nd": ("nd", "sum"),
                                 "s1": ("s1", "sum"),
                                 "s2": ("s2", "sum")}).to_pandas()

    lij = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_shipdate"]) \
        .map_batches(lambda df: pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "pk": df["l_partkey"].to_numpy(np.int64),
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
    j = auto_join(lij, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def lag_part(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bmap_ref)
        lag = df["sd"].to_numpy(np.int64) \
            - df["od"].to_numpy(np.int64)
        keep = lag >= 0
        return pd.DataFrame({
            "brand": df["pk"][keep].map(bmap).to_numpy(),
            "n": np.ones(int(keep.sum()), np.int64),
            "slag": lag[keep]}) \
            .groupby("brand", as_index=False).sum()

    lg = reduce_sink(j.map_batches(lag_part,
                                   batch_format="pandas"),
                     ["brand"], {"n": ("n", "sum"),
                                 "slag": ("slag", "sum")}) \
        .to_pandas()
    m = bm.merge(lg, on="brand").sort_values("brand",
                                             ignore_index=True)
    rha = textstats.round_half_away
    rows = []
    for _, r in m.iterrows():
        s1, s2 = int(r["s1"]), int(r["s2"])
        mu = float(s1) / dd / 100.0
        sigma = float(np.sqrt(float(dd * s2 - s1 * s1)
                              / (float(dd) * (dd - 1.0)))) / 100.0
        lead = float(int(r["slag"])) / int(r["n"])
        saf = 1.644854 * sigma * float(np.sqrt(lead))
        rows.append((r["brand"], int(r["nd"]), float(rha(mu, 6)),
                     float(rha(sigma, 6)), float(rha(lead, 6)),
                     float(rha(saf, 6)),
                     float(rha(mu * lead + saf, 6))))
    return pd.DataFrame(rows, columns=[
        "brand", "demand_days", "mu_daily", "sigma_daily",
        "lead_days", "safety_stock", "reorder_point"]) \
        .astype({"demand_days": np.int64})


# ---------------------------------------------------------------------------
# L-moments: robust shape statistics via exact probability-weighted
# moments off the cents histogram (falling-factorial hockey-stick sums)
# ---------------------------------------------------------------------------

#: per-type PWMs b0..b3 from the (type, cents) contingency. The key
#: identity: for a histogram bin occupying sorted positions a..b,
#: Σ(i−1)^(r) telescopes to m^(r+1)/(r+1) differences — so every PWM
#: numerator is an exact integer and NO sorted sample is ever
#: materialized. λ1=b0, λ2=2b1−b0, λ3=6b2−6b1+b0, λ4=20b3−30b2+12b1−b0.
_LMOM_SQL = """
v AS (SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT)
          AS c
      FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM v GROUP BY 1, 2),
cum AS (SELECT g, c, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY c)
                    AS HUGEINT) AS cm
        FROM hh),
pw AS (SELECT g,
              CAST(SUM(cnt * c) AS HUGEINT) AS s1,
              CAST(SUM(c * ((cm * (cm - 1)) / 2
                    - ((cm - cnt) * (cm - cnt - 1)) / 2))
                   AS HUGEINT) AS bb1,
              CAST(SUM(c * ((cm * (cm - 1) * (cm - 2)) / 3
                    - ((cm - cnt) * (cm - cnt - 1)
                       * (cm - cnt - 2)) / 3)) AS HUGEINT) AS bb2,
              CAST(SUM(c * ((cm * (cm - 1) * (cm - 2) * (cm - 3))
                            / 4
                    - ((cm - cnt) * (cm - cnt - 1) * (cm - cnt - 2)
                       * (cm - cnt - 3)) / 4)) AS HUGEINT) AS bb3,
              CAST(MAX(cm) AS BIGINT) AS n
       FROM cum GROUP BY g),
lam AS (SELECT g, n,
               CAST(s1 AS DOUBLE) / n AS l1,
               2.0 * (CAST(bb1 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1.0)))
               - CAST(s1 AS DOUBLE) / n AS l2,
               6.0 * (CAST(bb2 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1.0) * (n - 2.0)))
               - 6.0 * (CAST(bb1 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (n - 1.0)))
               + CAST(s1 AS DOUBLE) / n AS l3,
               20.0 * (CAST(bb3 AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1.0) * (n - 2.0)
                          * (n - 3.0)))
               - 30.0 * (CAST(bb2 AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (n - 1.0)
                            * (n - 2.0)))
               + 12.0 * (CAST(bb1 AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (n - 1.0)))
               - CAST(s1 AS DOUBLE) / n AS l4
        FROM pw)"""


def _lmoments_by_type(sf_dir: str) -> pd.DataFrame:
    """(g, n, l1, l2, l3, l4) per event type in cents units, PWM
    numerators exact Python ints off the (type, cents) histogram."""
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
        c = grp["c"].to_numpy(np.int64).astype(object)
        cnt = grp["cnt"].to_numpy(np.int64).astype(object)
        cm = np.cumsum(cnt)
        a0 = cm - cnt
        s1 = int((cnt * c).sum())
        bb1 = int((c * ((cm * (cm - 1)) // 2
                        - (a0 * (a0 - 1)) // 2)).sum())
        bb2 = int((c * ((cm * (cm - 1) * (cm - 2)) // 3
                        - (a0 * (a0 - 1) * (a0 - 2)) // 3)).sum())
        bb3 = int((c * ((cm * (cm - 1) * (cm - 2) * (cm - 3)) // 4
                        - (a0 * (a0 - 1) * (a0 - 2) * (a0 - 3))
                        // 4)).sum())
        n = int(cm[-1])
        b0 = float(s1) / n
        b1 = float(bb1) / (float(n) * (n - 1.0))
        b2 = float(bb2) / (float(n) * (n - 1.0) * (n - 2.0))
        b3 = float(bb3) / (float(n) * (n - 1.0) * (n - 2.0)
                           * (n - 3.0))
        rows.append((g, n, b0, 2.0 * b1 - b0,
                     6.0 * b2 - 6.0 * b1 + b0,
                     20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0))
    return pd.DataFrame(rows, columns=["g", "n", "l1", "l2", "l3",
                                       "l4"])


@register("l_moments_value_by_type", sql=f"""
WITH {_LMOM_SQL}
SELECT g AS event_type, n,
       ROUND(l1 / 100.0, 6) AS l1_mean,
       ROUND(l2 / 100.0, 6) AS l2_scale,
       ROUND(CASE WHEN l1 = 0 THEN 0.0 ELSE l2 / l1 END, 6)
           AS l_cv,
       ROUND(CASE WHEN l2 = 0 THEN 0.0 ELSE l3 / l2 END, 6)
           AS tau3,
       ROUND(CASE WHEN l2 = 0 THEN 0.0 ELSE l4 / l2 END, 6)
           AS tau4
FROM lam ORDER BY g""")
def l_moments_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Sample L-moments of event value per type (Hosking 1990):
    L-scale, L-CV, L-skewness τ₃ and L-kurtosis τ₄. These are the
    robust replacements for the moment panel already in the suite
    — classical skew/kurtosis raise observations to the 3rd/4th
    power so ONE extreme cent value dominates them and their
    sample estimators are wildly biased below n~10⁴, while
    L-moments are LINEAR in the order statistics (bounded
    influence, |τ₃|,|τ₄| < 1 always, finite whenever the mean is).
    τ₃/τ₄ disagreeing with the moment skew/kurtosis verdict is the
    flag that the classical numbers were tail artifacts. The
    distributed trick: PWM numerators telescope per histogram bin
    via the hockey-stick identity Σ(i−1)^(r) = m^(r+1)/(r+1), so
    every numerator is an exact (128-bit) integer off the same
    (type, cents) contingency the moment panel uses — no sorted
    sample, no rank shuffle."""
    lam = _lmoments_by_type(sf_dir)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "event_type": lam["g"],
        "n": lam["n"].astype(np.int64),
        "l1_mean": [float(rha(v / 100.0, 6)) for v in lam["l1"]],
        "l2_scale": [float(rha(v / 100.0, 6)) for v in lam["l2"]],
        "l_cv": [float(rha(l2 / l1 if l1 != 0 else 0.0, 6))
                 for l1, l2 in zip(lam["l1"], lam["l2"])],
        "tau3": [float(rha(l3 / l2 if l2 != 0 else 0.0, 6))
                 for l2, l3 in zip(lam["l2"], lam["l3"])],
        "tau4": [float(rha(l4 / l2 if l2 != 0 else 0.0, 6))
                 for l2, l4 in zip(lam["l2"], lam["l4"])]})


@register("l_ratio_diagram_by_type", sql=f"""
WITH {_LMOM_SQL},
tr AS (SELECT g, n,
              CASE WHEN l2 = 0 THEN 0.0 ELSE l3 / l2 END AS t3,
              CASE WHEN l2 = 0 THEN 0.0 ELSE l4 / l2 END AS t4
       FROM lam),
fam AS (SELECT * FROM (VALUES
            ('uniform', 0.0, 0.0),
            ('normal', 0.0, 0.122602),
            ('logistic', 0.0, 0.166667),
            ('gumbel', 0.169925, 0.150375),
            ('exponential', 0.333333, 0.166667))
        AS t(fname, f3, f4)),
d AS (SELECT g, n, t3, t4, fname,
             ROUND(SQRT((t3 - f3) * (t3 - f3)
                        + (t4 - f4) * (t4 - f4)), 9) AS dist
      FROM tr CROSS JOIN fam),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY dist, fname) AS rr
       FROM d)
SELECT g AS event_type, n, ROUND(t3, 6) AS tau3,
       ROUND(t4, 6) AS tau4, fname AS nearest_family,
       ROUND(dist, 6) AS nearest_dist
FROM rk WHERE rr = 1 ORDER BY g""")
def l_ratio_diagram_by_type(sf_dir: str) -> pd.DataFrame:
    """The L-moment ratio diagram read as a classifier: each event
    type's (τ₃, τ₄) point against the theoretical points of
    uniform/normal/logistic/Gumbel/exponential, nearest family by
    Euclidean distance (9dp-rounded before the argmin, name ties
    ascending). This is hydrology's standard distribution-selection
    tool (Hosking & Wallis 1997) transplanted to value modeling:
    where a KS test answers "is it exactly normal — no", the
    diagram answers the USEFUL question "which family is least
    wrong", and nearest_dist prices the residual misfit. A type
    landing near exponential justifies the memoryless pricing
    approximations other queries assume; one far from ALL five
    families says parametric value models are a mistake for it.
    Same exact PWM machinery as [[l_moments_value_by_type]]."""
    lam = _lmoments_by_type(sf_dir)
    fams = [("uniform", 0.0, 0.0), ("normal", 0.0, 0.122602),
            ("logistic", 0.0, 0.166667),
            ("gumbel", 0.169925, 0.150375),
            ("exponential", 0.333333, 0.166667)]
    rha = textstats.round_half_away
    rows = []
    for _, r in lam.iterrows():
        t3 = r["l3"] / r["l2"] if r["l2"] != 0 else 0.0
        t4 = r["l4"] / r["l2"] if r["l2"] != 0 else 0.0
        cand = sorted(
            ((float(rha(np.sqrt((t3 - f3) * (t3 - f3)
                                + (t4 - f4) * (t4 - f4)), 9)),
              name) for name, f3, f4 in fams))
        dist, name = cand[0]
        rows.append((r["g"], int(r["n"]), float(rha(t3, 6)),
                     float(rha(t4, 6)), name, float(rha(dist, 6))))
    return pd.DataFrame(rows, columns=[
        "event_type", "n", "tau3", "tau4", "nearest_family",
        "nearest_dist"]).astype({"n": np.int64})


# ---------------------------------------------------------------------------
# Cooperative-game attribution: session channel coalitions + Shapley
# ---------------------------------------------------------------------------

#: per-session channel bitmask (click=1, error=2, signup=4, view=8 —
#: alphabetical) and conversion flag, aggregated to the 16-coalition
#: table. Sessions share the registry's 30-min >= gap rule.
_COALITION_SQL = f"""
sid AS (SELECT user_id, event_type,
               SUM(ns) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM ({_NS_SQL})),
ses AS (SELECT user_id, sid,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                   END)
               + 2 * MAX(CASE WHEN event_type = 'error' THEN 1
                              ELSE 0 END)
               + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1
                              ELSE 0 END)
               + 8 * MAX(CASE WHEN event_type = 'view' THEN 1
                              ELSE 0 END) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS conv
        FROM sid GROUP BY 1, 2),
co AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(conv) AS BIGINT) AS k
       FROM ses GROUP BY 1)"""


def _coalition_table(sf_dir: str) -> pd.DataFrame:
    """(mask, n, k) over sessions — sessionize + bitmask + conv flag
    inside user-hash buckets; only ≤16 (mask, counts) partials leave
    the cluster."""
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
        sid = np.cumsum((~same) | (gap >= 1_800_000_000))
        bit = (np.where(et == "click", 1, 0)
               + np.where(et == "error", 2, 0)
               + np.where(et == "signup", 4, 0)
               + np.where(et == "view", 8, 0)).astype(np.int64)
        conv = (et == "purchase").astype(np.int64)
        ses = pd.DataFrame({"sid": sid, "bit": bit, "conv": conv})
        agg = ses.groupby("sid", sort=False).agg(
            mask=("bit", lambda b: int(np.bitwise_or.reduce(
                b.to_numpy(np.int64)) if len(b) else 0)),
            conv=("conv", "max"))
        out = agg.groupby("mask", as_index=False).agg(
            n=("conv", "size"), k=("conv", "sum"))
        return out.astype({"mask": np.int64, "n": np.int64,
                           "k": np.int64})

    return reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id",
                         "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: partial(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["mask"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas().sort_values("mask", ignore_index=True)


def _mask_label(m: int) -> str:
    parts = [nm for bit, nm in ((1, "click"), (2, "error"),
                                (4, "signup"), (8, "view"))
             if m & bit]
    return "+".join(parts) if parts else "none"


@register("session_coalition_conversion", sql=f"""
WITH {_COALITION_SQL}
SELECT CAST(mask AS BIGINT) AS mask,
       SUBSTR(CASE WHEN mask % 2 = 1 THEN '+click' ELSE '' END
              || CASE WHEN mask // 2 % 2 = 1 THEN '+error'
                      ELSE '' END
              || CASE WHEN mask // 4 % 2 = 1 THEN '+signup'
                      ELSE '' END
              || CASE WHEN mask // 8 % 2 = 1 THEN '+view'
                      ELSE '' END || '|none',
              2,
              CASE WHEN mask = 0 THEN 4
                   ELSE LENGTH(CASE WHEN mask % 2 = 1
                                    THEN '+click' ELSE '' END
                        || CASE WHEN mask // 2 % 2 = 1
                                THEN '+error' ELSE '' END
                        || CASE WHEN mask // 4 % 2 = 1
                                THEN '+signup' ELSE '' END
                        || CASE WHEN mask // 8 % 2 = 1
                                THEN '+view' ELSE '' END) - 1
              END) AS channels,
       n AS n_sessions, k AS conversions,
       ROUND(CAST(k AS DOUBLE) / n, 6) AS conv_rate
FROM co ORDER BY mask""")
def session_coalition_conversion(sf_dir: str) -> pd.DataFrame:
    """The coalition table attribution models are fit ON: for every
    observed combination of non-purchase channel types present in a
    session (click/error/signup/view as a 4-bit mask), how many
    sessions looked like that and what fraction converted. Reading
    it raw already settles arguments no single-model attribution
    can: if 'view' alone converts at 2% but 'click+view' at 9%,
    the click's marginal contribution is visible BEFORE any model
    assumptions, and non-monotonicities (adding a channel LOWERS
    conversion, e.g. +error) are exposed rather than averaged
    away. Sessionize + bitmask run inside user-hash buckets; only
    ≤16 coalition rows ever leave the cluster, making this
    constant-size at any scale."""
    co = _coalition_table(sf_dir)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "mask": co["mask"].astype(np.int64),
        "channels": [_mask_label(int(m)) for m in co["mask"]],
        "n_sessions": co["n"].astype(np.int64),
        "conversions": co["k"].astype(np.int64),
        "conv_rate": [float(rha(int(k) / int(n), 6))
                      for k, n in zip(co["k"], co["n"])]})


@register("shapley_attribution_channels", sql=f"""
WITH {_COALITION_SQL},
lat AS (SELECT CAST(r.range AS BIGINT) AS m,
               COALESCE(co.n, 0) AS n, COALESCE(co.k, 0) AS k
        FROM range(0, 16) r LEFT JOIN co ON co.mask = r.range),
vv AS (SELECT m, CASE WHEN m = 0 THEN 0.0
                      WHEN n > 0 THEN CAST(k AS DOUBLE) / n
                      ELSE 0.0 END AS v
       FROM lat),
ch AS (SELECT UNNEST([1, 2, 4, 8]) AS c),
pairs AS (SELECT ch.c,
                 (s.m % 2) + (s.m // 2 % 2) + (s.m // 4 % 2)
                 + (s.m // 8 % 2) AS sz,
                 t.v - s.v AS dv
          FROM ch JOIN vv s ON (s.m // ch.c) % 2 = 0
                  JOIN vv t ON t.m = s.m + ch.c),
phi AS (SELECT c,
               SUM(CASE sz WHEN 0 THEN 6.0 / 24.0
                           WHEN 1 THEN 2.0 / 24.0
                           WHEN 2 THEN 2.0 / 24.0
                           ELSE 6.0 / 24.0 END * dv) AS phi
        FROM pairs GROUP BY c),
tot AS (SELECT SUM(ABS(phi)) AS s FROM phi)
SELECT CASE c WHEN 1 THEN 'click' WHEN 2 THEN 'error'
              WHEN 4 THEN 'signup' ELSE 'view' END AS channel,
       ROUND(phi, 6) AS shapley_value,
       ROUND(CASE WHEN tot.s != 0 THEN ABS(phi) / tot.s
                  ELSE 0.0 END, 6) AS abs_share
FROM phi, tot ORDER BY channel""")
def shapley_attribution_channels(sf_dir: str) -> pd.DataFrame:
    """Shapley-value channel attribution (the cooperative-game
    model behind every 'data-driven attribution' product): each
    channel's credit is its average marginal lift to session
    conversion over all 2³ coalitions of the other channels,
    weighted |S|!(k−1−|S|)!/k!. Unlike last-touch (order-biased)
    and unlike the registry's Markov removal effects (which need
    the chain assumption), Shapley is the unique allocation that
    is symmetric, null-player-zero and EFFICIENT — the values sum
    exactly to v(full) − v(∅) (which is 0 whenever the all-channel
    coalition is unobserved, so abs_share normalizes by Σ|φ|: the
    share of attribution MAGNITUDE, sign read from shapley_value).
    Conventions pinned on both engines:
    v(∅) = 0 (no channels earn no credit; pure-purchase sessions
    exist but are the game's baseline), unobserved coalitions
    contribute v = 0, and a NEGATIVE Shapley value (error's
    expected sign) is real information: that touch actively
    destroys conversions. Rides the ≤16-row coalition table —
    the game solves driver-side in constant space."""
    co = _coalition_table(sf_dir)
    nv = {int(m): (int(n), int(k))
          for m, n, k in zip(co["mask"], co["n"], co["k"])}
    v = {}
    for m in range(16):
        if m == 0:
            v[m] = 0.0
        elif m in nv and nv[m][0] > 0:
            v[m] = float(nv[m][1]) / nv[m][0]
        else:
            v[m] = 0.0
    w = {0: 6.0 / 24.0, 1: 2.0 / 24.0, 2: 2.0 / 24.0,
         3: 6.0 / 24.0}
    names = {1: "click", 2: "error", 4: "signup", 8: "view"}
    phis = {}
    for c in (1, 2, 4, 8):
        tot = 0.0
        for s in range(16):
            if (s // c) % 2 == 0:
                sz = (s % 2) + (s // 2 % 2) + (s // 4 % 2) \
                    + (s // 8 % 2)
                tot += w[sz] * (v[s + c] - v[s])
        phis[c] = tot
    ssum = sum(abs(p) for p in phis.values())
    rha = textstats.round_half_away
    rows = sorted((names[c], float(rha(p, 6)),
                   float(rha(abs(p) / ssum if ssum != 0 else 0.0,
                             6)))
                  for c, p in phis.items())
    return pd.DataFrame(rows, columns=["channel", "shapley_value",
                                       "abs_share"])


# ---------------------------------------------------------------------------
# Stein shrinkage of the hourly mean-value profile + split-half backtest
# ---------------------------------------------------------------------------

def _hour_value_moments(events_sql_filter: str = "") -> str:
    """SQL for per-hour (n, Σc, Σc²) cents moments over events."""
    return f"""
hm AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                   AS BIGINT) AS s1,
              CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                            AS HUGEINT)
                       * CAST(ROUND(value * 100) AS BIGINT))
                   AS HUGEINT) AS s2
       FROM events {events_sql_filter} GROUP BY 1)"""


def _js_shrink(hm: pd.DataFrame) -> tuple[pd.DataFrame, float]:
    """Positive-part James–Stein on per-hour mean cents with the
    equal-variance approximation (n̄ = N/k): returns the frame with
    raw/js mean columns (cents floats) and the shrink factor."""
    k = len(hm)
    n = hm["n"].to_numpy(np.float64)
    s1 = hm["s1"].to_numpy(np.float64)
    s2 = hm["s2"].to_numpy(np.float64)
    xbar = s1 / n
    m = float(xbar.sum()) / k
    nn = float(n.sum())
    s2w = float((s2 - s1 * s1 / n).sum()) / (nn - k)
    var_mean = s2w / (nn / k)
    ss = float(((xbar - m) * (xbar - m)).sum())
    # ss == 0 (perfectly flat profile) -> SQL's 1 - inf -> GREATEST 0
    c = 1.0 - (k - 3) * var_mean / ss if ss > 0 else 0.0
    c = c if c > 0 else 0.0
    out = hm.copy()
    out["raw"] = xbar
    out["js"] = m + c * (xbar - m)
    return out, c


@register("james_stein_hourly_value", sql=f"""
WITH {_hour_value_moments()},
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             SUM(CAST(s1 AS DOUBLE) / n) / COUNT(*) AS m,
             SUM(CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * s1 / n)
             / (SUM(n) - COUNT(*)) AS s2w
      FROM hm),
ss AS (SELECT SUM((CAST(s1 AS DOUBLE) / n - g.m)
                  * (CAST(s1 AS DOUBLE) / n - g.m)) AS ss
       FROM hm, g),
cf AS (SELECT GREATEST(0.0, 1.0 - (g.k - 3) * (g.s2w / (g.nn
                       * 1.0 / g.k)) / ss.ss) AS c
       FROM g, ss)
SELECT h AS hour, n,
       ROUND(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS raw_mean,
       ROUND((g.m + cf.c * (CAST(s1 AS DOUBLE) / n - g.m))
             / 100.0, 6) AS js_mean,
       ROUND(cf.c, 6) AS shrink_c
FROM hm, g, cf ORDER BY h""")
def james_stein_hourly_value(sf_dir: str) -> pd.DataFrame:
    """Positive-part James–Stein shrinkage of the 24 hourly mean
    event values toward their grand mean — the estimator that
    DOMINATES the raw per-hour means in total squared error
    whenever k ≥ 4, no matter what the true hourly profile is
    (Stein's paradox: the 3am mean borrows strength from 23 hours
    it has nothing to do with, and the ensemble still wins). The
    practical point for every per-cell table in this registry:
    raw per-cell means overfit exactly in proportion to
    (k−3)·Var(mean)/Spread, which is what shrink_c measures —
    c ≈ 1 says the hourly profile is real signal, c near 0 says
    the whole table is noise around one number. Equal-variance
    approximation (n̄ = N/k) documented; within-hour variance
    pools the exact integer (n, Σc, Σc²) moments; the same few
    float expressions run on a 24-row frame in both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({
            "h": df["ts"].dt.hour.to_numpy(np.int64),
            "n": np.ones(len(df), np.int64), "s1": c,
            "s2": c * c})

    hm = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["h"], {"n": ("n", "sum"), "s1": ("s1", "sum"),
                "s2": ("s2", "sum")}).to_pandas() \
        .sort_values("h", ignore_index=True)
    out, c = _js_shrink(hm)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "hour": out["h"].astype(np.int64),
        "n": out["n"].astype(np.int64),
        "raw_mean": [float(rha(v / 100.0, 6)) for v in out["raw"]],
        "js_mean": [float(rha(v / 100.0, 6)) for v in out["js"]],
        "shrink_c": float(rha(c, 6))})


@register("james_stein_backtest_halves", sql=f"""
WITH b AS (SELECT ts, value, epoch_us(ts) // 86400000000 AS d
           FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
h1 AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                   AS BIGINT) AS s1,
              CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                            AS HUGEINT)
                       * CAST(ROUND(value * 100) AS BIGINT))
                   AS HUGEINT) AS s2
       FROM b, sp WHERE d < cut GROUP BY 1),
h2 AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
              CAST(COUNT(*) AS BIGINT) AS n2,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                   AS BIGINT) AS t1
       FROM b, sp WHERE d >= cut GROUP BY 1),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             SUM(CAST(s1 AS DOUBLE) / n) / COUNT(*) AS m,
             SUM(CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * s1 / n)
             / (SUM(n) - COUNT(*)) AS s2w
      FROM h1),
ss AS (SELECT SUM((CAST(s1 AS DOUBLE) / n - g.m)
                  * (CAST(s1 AS DOUBLE) / n - g.m)) AS ss
       FROM h1, g),
cf AS (SELECT GREATEST(0.0, 1.0 - (g.k - 3) * (g.s2w / (g.nn
                       * 1.0 / g.k)) / ss.ss) AS c
       FROM g, ss),
ev AS (SELECT h1.h,
              CAST(h1.s1 AS DOUBLE) / h1.n AS raw,
              g.m + cf.c * (CAST(h1.s1 AS DOUBLE) / h1.n - g.m)
                  AS js,
              CAST(h2.t1 AS DOUBLE) / h2.n2 AS truth
       FROM h1 JOIN h2 USING (h), g, cf),
fin AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_eval,
               SUM((raw - truth) * (raw - truth)) / 10000.0
                   AS sse_raw,
               SUM((js - truth) * (js - truth)) / 10000.0
                   AS sse_js
        FROM ev)
SELECT k_eval, (SELECT ROUND(c, 6) FROM cf) AS shrink_c,
       ROUND(sse_raw, 6) AS sse_raw, ROUND(sse_js, 6) AS sse_js,
       CAST(CASE WHEN sse_js < sse_raw THEN 1 ELSE 0 END
            AS BIGINT) AS js_wins,
       ROUND((1.0 - sse_js / sse_raw) * 100.0, 6)
           AS improvement_pct
FROM fin""")
def james_stein_backtest_halves(sf_dir: str) -> pd.DataFrame:
    """The Efron–Morris demonstration run on this data's own
    calendar: fit raw and JS-shrunk hourly means on the FIRST half
    of the date range, score both against the second half's
    realized hourly means, report total squared error of each.
    This is shrinkage's receipts — Stein's theorem guarantees
    expected dominance, the backtest shows whether it cashed out
    HERE, and improvement_pct is the exact fraction of
    hourly-profile MSE that was pure overfit (the same fraction
    every downstream per-hour budget allocation was wasting).
    Half-split shares the registry's (min+max+1)//2 day cut;
    moments are exact integers per half; only hours observed in
    both halves score (k_eval)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "h": df["ts"].dt.hour.to_numpy(np.int64),
            "n": np.ones(len(df), np.int64), "s1": c,
            "s2": c * c})

    base = _events(sf_dir, ["ts", "value"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["half"] = (df["d"] >= cut).astype(np.int64)
        return df.drop(columns=["d"])

    hm = reduce_sink(base.map_batches(tag, batch_format="pandas"),
                     ["half", "h"],
                     {"n": ("n", "sum"), "s1": ("s1", "sum"),
                      "s2": ("s2", "sum")}).to_pandas()
    h1 = hm[hm["half"] == 0].sort_values("h", ignore_index=True)
    h2 = hm[hm["half"] == 1].sort_values("h", ignore_index=True)
    fit, c = _js_shrink(h1[["h", "n", "s1", "s2"]])
    ev = fit.merge(
        pd.DataFrame({"h": h2["h"],
                      "truth": h2["s1"].to_numpy(np.float64)
                      / h2["n"].to_numpy(np.float64)}), on="h")
    sse_raw = float(((ev["raw"] - ev["truth"]) ** 2).sum()) \
        / 10000.0
    sse_js = float(((ev["js"] - ev["truth"]) ** 2).sum()) / 10000.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "k_eval": np.array([len(ev)], np.int64),
        "shrink_c": [float(rha(c, 6))],
        "sse_raw": [float(rha(sse_raw, 6))],
        "sse_js": [float(rha(sse_js, 6))],
        "js_wins": np.array([1 if sse_js < sse_raw else 0],
                            np.int64),
        "improvement_pct": [float(rha((1.0 - sse_js / sse_raw)
                                      * 100.0, 6))]})


# ---------------------------------------------------------------------------
# Competing risks: Aalen–Johansen cumulative incidence (purchase vs
# error as first terminal event; naive cause-specific KM for contrast)
# ---------------------------------------------------------------------------

#: per-user first event day, first purchase/error days, last day →
#: (t, cause) with cause 1=purchase, 2=error, 0=censored-at-last-seen;
#: same-day purchase/error ties resolve to purchase (pd <= ed).
_CRISK_SQL = """
pu AS (SELECT user_id,
              MIN(epoch_us(ts) // 86400000000) AS fd,
              MAX(epoch_us(ts) // 86400000000) AS ld,
              MIN(CASE WHEN event_type = 'purchase'
                       THEN epoch_us(ts) // 86400000000 END) AS pd,
              MIN(CASE WHEN event_type = 'error'
                       THEN epoch_us(ts) // 86400000000 END) AS ed
       FROM events GROUP BY 1),
ev AS (SELECT CASE WHEN pd IS NOT NULL AND (ed IS NULL OR pd <= ed)
                   THEN pd - fd
                   WHEN ed IS NOT NULL THEN ed - fd
                   ELSE ld - fd END AS t,
              CASE WHEN pd IS NOT NULL AND (ed IS NULL OR pd <= ed)
                   THEN 1
                   WHEN ed IS NOT NULL THEN 2 ELSE 0 END AS cause
       FROM pu),
lt AS (SELECT t,
              CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d1,
              CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d2,
              CAST(SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS dc
       FROM ev GROUP BY t),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
ar AS (SELECT t, d1, d2, dc,
              tot.n - COALESCE(SUM(d1 + d2 + dc)
                  OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS rsk
       FROM lt, tot),
f AS (SELECT *, 1.0 - CAST(d1 + d2 AS DOUBLE) / rsk AS fac,
             1.0 - CAST(d1 AS DOUBLE) / rsk AS fac1,
             1.0 - CAST(d2 AS DOUBLE) / rsk AS fac2
      FROM ar),
s AS (SELECT *,
             COALESCE(PRODUCT(fac) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 1.0) AS sm,
             PRODUCT(fac) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS surv,
             PRODUCT(fac1) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS km1,
             PRODUCT(fac2) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS km2
      FROM f),
cr AS (SELECT *,
              SUM(sm * d1 / rsk) OVER (ORDER BY t
                  ROWS UNBOUNDED PRECEDING) AS cif1,
              SUM(sm * d2 / rsk) OVER (ORDER BY t
                  ROWS UNBOUNDED PRECEDING) AS cif2
       FROM s)"""


def _crisk_table(sf_dir: str) -> pd.DataFrame:
    """Aalen–Johansen life table (driver-side, O(days) rows) off one
    per-user (first, last, first-purchase, first-error) reduce."""
    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        et = df["event_type"].to_numpy()
        SENT = np.int64(1 << 60)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "fd": day, "ld": day,
            "pd_": np.where(et == "purchase", day, SENT),
            "ed": np.where(et == "error", day, SENT)}) \
            .groupby("user_id", as_index=False) \
            .agg(fd=("fd", "min"), ld=("ld", "max"),
                 pd_=("pd_", "min"), ed=("ed", "min"))

    pu = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"fd": ("fd", "min"), "ld": ("ld", "max"),
                      "pd_": ("pd_", "min"), "ed": ("ed", "min")}) \
        .to_pandas()
    SENT = np.int64(1 << 60)
    fd = pu["fd"].to_numpy(np.int64)
    ld = pu["ld"].to_numpy(np.int64)
    pdy = pu["pd_"].to_numpy(np.int64)
    ed = pu["ed"].to_numpy(np.int64)
    is_p = (pdy < SENT) & (pdy <= ed)
    is_e = (~is_p) & (ed < SENT)
    t = np.where(is_p, pdy - fd, np.where(is_e, ed - fd, ld - fd))
    cause = np.where(is_p, 1, np.where(is_e, 2, 0))
    lt = pd.DataFrame({"t": t, "cause": cause}) \
        .groupby(["t", "cause"]).size().unstack(fill_value=0)
    lt = lt.reindex(columns=[0, 1, 2], fill_value=0)
    lt.columns = ["dc", "d1", "d2"]
    lt = lt.reset_index().sort_values("t", ignore_index=True)
    n = len(pu)
    gone = (lt["d1"] + lt["d2"] + lt["dc"]).cumsum().shift(
        1, fill_value=0).to_numpy(np.int64)
    lt["rsk"] = n - gone
    rsk = lt["rsk"].to_numpy(np.float64)
    d1 = lt["d1"].to_numpy(np.float64)
    d2 = lt["d2"].to_numpy(np.float64)
    fac = 1.0 - (d1 + d2) / rsk
    surv = np.cumprod(fac)
    sm = np.empty_like(surv)
    sm[0] = 1.0
    sm[1:] = surv[:-1]
    lt["sm"] = sm
    lt["surv"] = surv
    lt["km1"] = np.cumprod(1.0 - d1 / rsk)
    lt["km2"] = np.cumprod(1.0 - d2 / rsk)
    lt["cif1"] = np.cumsum(sm * d1 / rsk)
    lt["cif2"] = np.cumsum(sm * d2 / rsk)
    lt["n_users"] = n
    return lt


@register("competing_risk_cif_daily", sql=f"""
WITH {_CRISK_SQL}
SELECT CAST(t AS BIGINT) AS day_t, CAST(rsk AS BIGINT) AS at_risk,
       d1 AS d_purchase, d2 AS d_error, dc AS censored,
       ROUND(cif1, 6) AS cif_purchase,
       ROUND(cif2, 6) AS cif_error,
       ROUND(1.0 - km1, 6) AS naive_km_purchase
FROM cr ORDER BY t""")
def competing_risk_cif_daily(sf_dir: str) -> pd.DataFrame:
    """Aalen–Johansen cumulative incidence of a user's FIRST
    terminal event — purchase vs error as competing causes, clock
    starting at the user's first event, never-reached users
    right-censored at last seen. The existing KM query asks "when
    do users purchase"; this asks the question funnels actually
    face — purchase and error-abandonment REMOVE users from the
    same at-risk pool, and the naive cause-specific 1−KM
    (shipped here as naive_km_purchase for contrast) treats the
    competitor as censoring and provably OVERSTATES incidence:
    CIF_purchase ≤ 1−KM always, with the gap growing with
    competitor hazard. Same-day ties resolve to purchase on both
    engines; the life table is O(days) off one per-user 4-column
    reduce; both cumulative products multiply in ascending-t order
    on both engines (windowed PRODUCT ↔ np.cumprod)."""
    lt = _crisk_table(sf_dir)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "day_t": lt["t"].astype(np.int64),
        "at_risk": lt["rsk"].astype(np.int64),
        "d_purchase": lt["d1"].astype(np.int64),
        "d_error": lt["d2"].astype(np.int64),
        "censored": lt["dc"].astype(np.int64),
        "cif_purchase": [float(rha(v, 6)) for v in lt["cif1"]],
        "cif_error": [float(rha(v, 6)) for v in lt["cif2"]],
        "naive_km_purchase": [float(rha(1.0 - v, 6))
                              for v in lt["km1"]]})


@register("competing_risk_final_shares", sql=f"""
WITH {_CRISK_SQL},
last AS (SELECT * FROM cr ORDER BY t DESC LIMIT 1)
SELECT (SELECT n FROM tot) AS n_users,
       ROUND(cif1, 6) AS cif_purchase_final,
       ROUND(cif2, 6) AS cif_error_final,
       ROUND(surv, 6) AS surv_final,
       ROUND(cif1 + cif2 + surv, 6) AS identity_check,
       ROUND((1.0 - km1) + (1.0 - km2), 6) AS naive_sum,
       ROUND((1.0 - km1) + (1.0 - km2) - cif1 - cif2, 6)
           AS naive_overcount
FROM last""")
def competing_risk_final_shares(sf_dir: str) -> pd.DataFrame:
    """The competing-risks identity in one row: final
    CIF_purchase + CIF_error + S(∞) = 1 (identity_check prints it
    — Aalen–Johansen partitions every user exactly once), against
    the naive cause-specific KM totals whose sum EXCEEDS the
    combined event probability (naive_overcount is the mass
    double-counted by treating each competitor as censoring — the
    arithmetic proof the two naive curves can't both be read as
    probabilities). This number is the calibration error baked
    into any 'X% of users eventually purchase' claim computed
    cause-by-cause. Same life table, last row."""
    lt = _crisk_table(sf_dir)
    last = lt.iloc[-1]
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([int(last["n_users"])], np.int64),
        "cif_purchase_final": [float(rha(last["cif1"], 6))],
        "cif_error_final": [float(rha(last["cif2"], 6))],
        "surv_final": [float(rha(last["surv"], 6))],
        "identity_check": [float(rha(last["cif1"] + last["cif2"]
                                     + last["surv"], 6))],
        "naive_sum": [float(rha((1.0 - last["km1"])
                                + (1.0 - last["km2"]), 6))],
        "naive_overcount": [float(rha(
            (1.0 - last["km1"]) + (1.0 - last["km2"])
            - last["cif1"] - last["cif2"], 6))]})


# ---------------------------------------------------------------------------
# Peaks-over-threshold: GPD method-of-moments fit + return levels
# ---------------------------------------------------------------------------

#: exact p95 threshold (20·cum ≥ 19·n convention) and integer moments
#: of the strict exceedances, all off the bounded cents histogram.
_GPD_SQL = """
v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM v GROUP BY 1),
cum AS (SELECT c, cnt, SUM(cnt) OVER (ORDER BY c) AS cm,
               (SELECT SUM(cnt) FROM hh) AS n
        FROM hh),
thr AS (SELECT MIN(c) AS u, MAX(n) AS n FROM cum
        WHERE 20 * cm >= 19 * n),
ex AS (SELECT hh.c - thr.u AS y, hh.cnt
       FROM hh, thr WHERE hh.c > thr.u),
mo AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ne,
              CAST(SUM(cnt * y) AS HUGEINT) AS s1,
              CAST(SUM(CAST(cnt AS HUGEINT) * y * y) AS HUGEINT)
                  AS s2
       FROM ex),
fit AS (SELECT thr.u, thr.n, mo.ne,
               CAST(s1 AS DOUBLE) / ne AS m,
               CAST(ne * s2 - s1 * s1 AS DOUBLE)
                   / (ne * (ne - 1.0)) AS s2v
        FROM thr, mo),
par AS (SELECT u, n, ne, m,
               0.5 * (1.0 - m * m / s2v) AS xi,
               0.5 * m * (m * m / s2v + 1.0) AS beta
        FROM fit)"""


@register("gpd_fit_value_tail", sql=f"""
WITH {_GPD_SQL}
SELECT CAST(n AS BIGINT) AS n_events, CAST(u AS BIGINT)
           AS u_cents,
       CAST(ne AS BIGINT) AS n_exceed,
       ROUND(m / 100.0, 6) AS mean_excess,
       ROUND(xi, 6) AS xi, ROUND(beta / 100.0, 6) AS beta,
       CAST(CASE WHEN xi > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS heavy_tail
FROM par""")
def gpd_fit_value_tail(sf_dir: str) -> pd.DataFrame:
    """Generalized-Pareto fit to event-value exceedances over the
    exact p95 threshold, by method of moments (ξ = ½(1 − m²/s²),
    β = ½m(m²/s² + 1) — closed form, no optimizer). This is the
    Pickands–Balkema–de Haan step the registry's tail family has
    been circling: the mean-excess CURVE diagnoses, the Hill index
    assumes power-law, the tail conditional mean describes the
    observed sample — the GPD fit is what lets you EXTRAPOLATE
    beyond it, and ξ's sign is the single most consequential bit
    in risk modeling (ξ > 0 heavy tail with possibly infinite
    variance, ξ < 0 a finite endpoint, ξ ≈ 0 exponential).
    Threshold uses the suite's exact 20·cum ≥ 19·n quantile
    convention; exceedance moments are exact 128-bit integers off
    the bounded cents histogram; MoM requires finite s² and is
    documented as biased when true ξ > 0.25 — read against
    [[hill_tail_index_user_value]]."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"c": c}).groupby("c").size() \
            .reset_index(name="cnt").astype(np.int64)

    hh = reduce_sink(
        _events(sf_dir, ["value"])
        .map_batches(prep, batch_format="pandas"),
        ["c"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("c", ignore_index=True)
    c = hh["c"].to_numpy(np.int64)
    cnt = hh["cnt"].to_numpy(np.int64).astype(object)
    cm = np.cumsum(cnt)
    n = int(cm[-1])
    u = int(c[np.argmax(20 * cm >= 19 * n)])
    mask = c > u
    y = (c[mask] - u).astype(object)
    w = cnt[mask]
    ne = int(w.sum())
    s1 = int((w * y).sum())
    s2 = int((w * y * y).sum())
    m = float(s1) / ne
    s2v = float(ne * s2 - s1 * s1) / (ne * (ne - 1.0))
    xi = 0.5 * (1.0 - m * m / s2v)
    beta = 0.5 * m * (m * m / s2v + 1.0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "u_cents": np.array([u], np.int64),
        "n_exceed": np.array([ne], np.int64),
        "mean_excess": [float(rha(m / 100.0, 6))],
        "xi": [float(rha(xi, 6))],
        "beta": [float(rha(beta / 100.0, 6))],
        "heavy_tail": np.array([1 if xi > 0 else 0], np.int64)})


@register("value_return_levels", sql=f"""
WITH {_GPD_SQL},
mx AS (SELECT MAX(c) AS cmax FROM hh),
tt AS (SELECT CAST(UNNEST([10000, 100000, 1000000]) AS BIGINT)
           AS t)
SELECT tt.t AS one_in_n_events,
       ROUND(CASE WHEN ABS(xi) < 1e-9
                  THEN (u + beta * LN(tt.t * (CAST(ne AS DOUBLE)
                                              / n))) / 100.0
                  ELSE (u + beta / xi
                        * (POWER(tt.t * (CAST(ne AS DOUBLE) / n),
                                 xi) - 1.0)) / 100.0
             END, 6) AS return_level,
       ROUND(CAST(mx.cmax AS DOUBLE) / 100.0, 6) AS observed_max
FROM par, mx, tt ORDER BY tt.t""")
def value_return_levels(sf_dir: str) -> pd.DataFrame:
    """GPD return levels: the event value expected to be exceeded
    once per 10⁴ / 10⁵ / 10⁶ events, extrapolated from the fitted
    tail (x_T = u + β/ξ·((λT)^ξ − 1), exponential-limit branch when
    |ξ| < 1e-9, λ = exceedance rate). This is the number quantile
    tables structurally cannot give — an empirical p99.9999 needs
    10⁶ observations PER cell, the GPD gets it from the 5% tail —
    and the honest read is return_level vs observed_max: a 10⁶
    level far above the observed max is the fit saying 'you
    haven't seen your tail yet', which is precisely the fraud- and
    payment-limit question. Same exact histogram machinery as
    [[gpd_fit_value_tail]]; both engines branch on the identical
    ξ guard."""
    fit = gpd_fit_value_tail(sf_dir)
    n = int(fit["n_events"].iloc[0])
    u = int(fit["u_cents"].iloc[0])
    ne = int(fit["n_exceed"].iloc[0])
    # refit unrounded parameters (the registered row is rounded)
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"c": c}).groupby("c").size() \
            .reset_index(name="cnt").astype(np.int64)

    hh = reduce_sink(
        _events(sf_dir, ["value"])
        .map_batches(prep, batch_format="pandas"),
        ["c"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("c", ignore_index=True)
    c = hh["c"].to_numpy(np.int64)
    cnt = hh["cnt"].to_numpy(np.int64).astype(object)
    cmax = int(c[-1])
    mask = c > u
    y = (c[mask] - u).astype(object)
    w = cnt[mask]
    s1 = int((w * y).sum())
    s2 = int((w * y * y).sum())
    m = float(s1) / ne
    s2v = float(ne * s2 - s1 * s1) / (ne * (ne - 1.0))
    xi = 0.5 * (1.0 - m * m / s2v)
    beta = 0.5 * m * (m * m / s2v + 1.0)
    lam = float(ne) / n
    rha = textstats.round_half_away
    rows = []
    for t in (10_000, 100_000, 1_000_000):
        if abs(xi) < 1e-9:
            rl = (u + beta * float(np.log(t * lam))) / 100.0
        else:
            rl = (u + beta / xi * (float(t * lam) ** xi - 1.0)) \
                / 100.0
        rows.append((t, float(rha(rl, 6)),
                     float(rha(float(cmax) / 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "one_in_n_events", "return_level", "observed_max"]) \
        .astype({"one_in_n_events": np.int64})


# ---------------------------------------------------------------------------
# Probabilistic-forecast verification: Brier + Murphy decomposition of
# the hour-of-week purchase forecaster, split-half design
# ---------------------------------------------------------------------------

#: forecaster = half-1 purchase rate per hour-of-week cell, scored on
#: half-2 events in cells observed in half 1; per-cell (p, n2, k2).
_BRIER_SQL = """
b AS (SELECT (dayofweek(ts) * 24 + hour(ts)) AS hw,
             epoch_us(ts) // 86400000000 AS d,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
      FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
h1 AS (SELECT hw, CAST(COUNT(*) AS BIGINT) AS n1,
              CAST(SUM(y) AS BIGINT) AS k1
       FROM b, sp WHERE d < cut GROUP BY 1),
h2 AS (SELECT hw, CAST(COUNT(*) AS BIGINT) AS n2,
              CAST(SUM(y) AS BIGINT) AS k2
       FROM b, sp WHERE d >= cut GROUP BY 1),
cells AS (SELECT h2.hw, CAST(k1 AS DOUBLE) / n1 AS p, n2, k2
          FROM h1 JOIN h2 USING (hw)),
tot AS (SELECT CAST(SUM(n2) AS BIGINT) AS nn,
               CAST(SUM(k2) AS BIGINT) AS kk
        FROM cells)"""


def _brier_cells(sf_dir: str) -> pd.DataFrame:
    """(hw, p, n2, k2) per scored hour-of-week cell."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        dow = (df["ts"].dt.dayofweek.to_numpy(np.int64) + 1) % 7
        return pd.DataFrame({
            "hw": dow * 24 + df["ts"].dt.hour.to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64),
            "y": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})

    base = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "half": (df["d"] >= cut).astype(np.int64),
            "hw": df["hw"], "n": 1, "k": df["y"]})

    hm = reduce_sink(base.map_batches(tag, batch_format="pandas"),
                     ["half", "hw"],
                     {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas()
    h1 = hm[hm["half"] == 0]
    h2 = hm[hm["half"] == 1]
    cells = h1.merge(h2, on="hw", suffixes=("1", "2"))
    cells["p"] = cells["k1"].to_numpy(np.float64) \
        / cells["n1"].to_numpy(np.float64)
    return cells[["hw", "p", "n2", "k2"]] \
        .sort_values("hw", ignore_index=True)


@register("brier_murphy_hourweek", sql=f"""
WITH {_BRIER_SQL},
sc AS (SELECT SUM(n2 * p * p - 2.0 * p * k2 + k2) AS bsum,
              SUM(n2 * (p - CAST(k2 AS DOUBLE) / n2)
                  * (p - CAST(k2 AS DOUBLE) / n2)) AS rel,
              SUM(n2 * (CAST(k2 AS DOUBLE) / n2
                        - CAST(tot.kk AS DOUBLE) / tot.nn)
                  * (CAST(k2 AS DOUBLE) / n2
                     - CAST(tot.kk AS DOUBLE) / tot.nn)) AS res
       FROM cells, tot),
fin AS (SELECT tot.nn,
               bsum / tot.nn AS brier, rel / tot.nn AS rel,
               res / tot.nn AS res,
               (CAST(tot.kk AS DOUBLE) / tot.nn)
               * (1.0 - CAST(tot.kk AS DOUBLE) / tot.nn) AS unc
        FROM sc, tot)
SELECT nn AS n_scored, ROUND(brier, 6) AS brier,
       ROUND(rel, 6) AS reliability, ROUND(res, 6) AS resolution,
       ROUND(unc, 6) AS uncertainty,
       ROUND(rel - res + unc, 6) AS identity_check,
       ROUND(1.0 - brier / unc, 6) AS brier_skill
FROM fin""")
def brier_murphy_hourweek(sf_dir: str) -> pd.DataFrame:
    """Murphy (1973) decomposition of the Brier score for the
    hour-of-week purchase forecaster (rates fitted on the first
    calendar half, scored on the second): Brier = reliability −
    resolution + uncertainty, with identity_check printing the
    right side so the decomposition is verified ON the output.
    The three terms answer different engineering questions:
    reliability ≈ 0 says the fitted rates mean what they say
    (miscalibration is fixable by recalibration alone);
    resolution is the only term a better FEATURE can improve —
    a forecaster with zero resolution is climatology no matter
    how calibrated; uncertainty is the floor nobody can beat.
    brier_skill = 1 − Brier/UNC is the standard skill score
    (negative = worse than predicting the base rate — the week
    profile actively misleads). Per-event squared errors collapse
    to n·p² − 2pk + k per cell, so only per-cell integer counts
    move; cells unseen in half 1 are unscored on both engines."""
    cells = _brier_cells(sf_dir)
    p = cells["p"].to_numpy(np.float64)
    n2 = cells["n2"].to_numpy(np.float64)
    k2 = cells["k2"].to_numpy(np.float64)
    nn = float(n2.sum())
    kk = float(k2.sum())
    brier = float((n2 * p * p - 2.0 * p * k2 + k2).sum()) / nn
    rel = float((n2 * (p - k2 / n2) * (p - k2 / n2)).sum()) / nn
    obar = kk / nn
    res = float((n2 * (k2 / n2 - obar) * (k2 / n2 - obar)).sum()) \
        / nn
    unc = obar * (1.0 - obar)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_scored": np.array([int(nn)], np.int64),
        "brier": [float(rha(brier, 6))],
        "reliability": [float(rha(rel, 6))],
        "resolution": [float(rha(res, 6))],
        "uncertainty": [float(rha(unc, 6))],
        "identity_check": [float(rha(rel - res + unc, 6))],
        "brier_skill": [float(rha(1.0 - brier / unc, 6))]})


@register("forecast_calibration_bins_hourweek", sql=f"""
WITH {_BRIER_SQL},
bins AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
                n2, k2, p
         FROM cells)
SELECT bin, CAST(SUM(n2) AS BIGINT) AS n_scored,
       ROUND(SUM(n2 * p) / SUM(n2), 6) AS mean_forecast,
       ROUND(CAST(SUM(k2) AS DOUBLE) / SUM(n2), 6) AS observed,
       ROUND(SUM(n2 * p) / SUM(n2)
             - CAST(SUM(k2) AS DOUBLE) / SUM(n2), 6) AS gap
FROM bins GROUP BY 1 ORDER BY 1""")
def forecast_calibration_bins_hourweek(sf_dir: str) -> pd.DataFrame:
    """The reliability diagram behind [[brier_murphy_hourweek]]'s
    one-number reliability: scored events bucketed by forecast
    decile, mean forecast vs realized purchase rate per bucket.
    The SHAPE is the diagnosis the scalar can't give — a rotated
    S says the half-1 rates are overconfident at both ends
    (shrinkage, e.g. [[james_stein_hourly_value]]'s c, would fix
    it), a uniform offset says the base rate drifted between
    halves (recalibrate the intercept, the profile is fine).
    Same per-cell counts, ≤10 rows out."""
    cells = _brier_cells(sf_dir)
    cells = cells.assign(
        bin=np.minimum((cells["p"].to_numpy(np.float64) * 10)
                       .astype(np.int64), 9))
    g = cells.groupby("bin")
    rha = textstats.round_half_away
    rows = []
    for b, d in g:
        n2 = d["n2"].to_numpy(np.float64)
        k2 = d["k2"].to_numpy(np.float64)
        p = d["p"].to_numpy(np.float64)
        mf = float((n2 * p).sum()) / float(n2.sum())
        ob = float(k2.sum()) / float(n2.sum())
        rows.append((int(b), int(n2.sum()), float(rha(mf, 6)),
                     float(rha(ob, 6)), float(rha(mf - ob, 6))))
    return pd.DataFrame(rows, columns=[
        "bin", "n_scored", "mean_forecast", "observed", "gap"]) \
        .astype({"bin": np.int64, "n_scored": np.int64})


# ---------------------------------------------------------------------------
# Dagum (1997) Gini decomposition by market segment: within + net
# between + transvariation, exact pairwise |x−y| sums from histograms
# ---------------------------------------------------------------------------

#: per-user total value cents tagged with mktsegment, reduced to
#: (seg, cents, cnt) histograms; all pairwise-difference sums are
#: HUGEINT cross products over ordered (seg_a <= seg_b) histogram
#: joins — population-pair Gini convention (divides n², includes
#: self-pairs as zeros) so Dagum's identity holds exactly.
_DAGUM_SQL = """
uv AS (SELECT e.user_id, c.c_mktsegment AS seg,
              CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT))
                   AS BIGINT) AS cents
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2),
h AS (SELECT seg, cents AS c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM uv GROUP BY 1, 2),
gm AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
              CAST(SUM(cnt * c) AS HUGEINT) AS s
       FROM h GROUP BY 1),
pw AS (SELECT a.seg AS sa, b.seg AS sb,
              CAST(SUM(CAST(a.cnt AS HUGEINT) * b.cnt
                       * ABS(a.c - b.c)) AS HUGEINT) AS sd,
              CAST(SUM(CASE WHEN a.c > b.c
                            THEN CAST(a.cnt AS HUGEINT) * b.cnt
                                 * (a.c - b.c)
                            ELSE 0 END) AS HUGEINT) AS dgt
       FROM h a JOIN h b ON a.seg <= b.seg
       GROUP BY 1, 2),
tt AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
              CAST(SUM(s) AS HUGEINT) AS s
       FROM gm)"""


def _dagum_tables(sf_dir: str):
    """((seg, n, s) frame, {(sa, sb): (sd, dgt)} exact int cross
    sums with sa <= sb and dgt = Σ(x_a − x_b)+)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"]
                                .to_numpy(np.int64),
                                cust["c_mktsegment"])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["user_id"].map(cmap)
        keep = seg.notna().to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "seg": seg[keep].to_numpy(),
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64)[keep]})

    uv = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "seg"], {"cents": ("cents", "sum")})
    h = reduce_sink(
        uv.map_batches(lambda df: pd.DataFrame(
            {"seg": df["seg"], "c": df["cents"], "cnt": 1}),
            batch_format="pandas"),
        ["seg", "c"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values(["seg", "c"], ignore_index=True)
    segs = sorted(h["seg"].unique())
    hs = {s: (h[h["seg"] == s]["c"].to_numpy(np.int64),
              h[h["seg"] == s]["cnt"].to_numpy(np.int64))
          for s in segs}
    gm = pd.DataFrame({
        "seg": segs,
        "n": [int(hs[s][1].sum()) for s in segs],
        "s": [int((hs[s][0].astype(object)
                   * hs[s][1].astype(object)).sum())
              for s in segs]})

    def cross(va, ca, vb, cb):
        """Exact (Σ|x−y|, Σ(x−y)+) over the ordered product of two
        sorted histograms, via prefix sums (no pair expansion)."""
        cumc = np.concatenate([[0], np.cumsum(cb.astype(object))])
        cums = np.concatenate([[0], np.cumsum(
            (vb.astype(object) * cb.astype(object)))])
        idx = np.searchsorted(vb, va, side="right")
        below_c = cumc[idx]
        below_s = cums[idx]
        tot_c = int(cumc[-1])
        tot_s = int(cums[-1])
        vao = va.astype(object)
        cao = ca.astype(object)
        dgt = int((cao * (vao * below_c - below_s)).sum())
        pgt = int((cao * ((tot_s - below_s)
                          - vao * (tot_c - below_c))).sum())
        return dgt + pgt, dgt

    pw = {}
    for i, sa in enumerate(segs):
        for sb in segs[i:]:
            pw[(sa, sb)] = cross(*hs[sa], *hs[sb])
    return gm, pw


@register("dagum_gini_decomposition_segments", sql=f"""
WITH {_DAGUM_SQL},
gw AS (SELECT SUM((CAST(pw.sd AS DOUBLE)
                   / (CAST(gm.n AS DOUBLE) * gm.n)
                   / (2.0 * CAST(gm.s AS DOUBLE) / gm.n))
                  * (CAST(gm.n AS DOUBLE) / tt.n)
                  * (CAST(gm.s AS DOUBLE) / tt.s)) AS gw
       FROM pw JOIN gm ON pw.sa = gm.seg AND pw.sb = gm.seg, tt),
gb AS (SELECT SUM((CAST(pw.sd AS DOUBLE)
                   / (CAST(a.n AS DOUBLE) * b.n)
                   / (CAST(a.s AS DOUBLE) / a.n
                      + CAST(b.s AS DOUBLE) / b.n))
                  * ((CAST(a.n AS DOUBLE) / tt.n)
                     * (CAST(b.s AS DOUBLE) / tt.s)
                     + (CAST(b.n AS DOUBLE) / tt.n)
                     * (CAST(a.s AS DOUBLE) / tt.s))
                  * (ABS(2.0 * CAST(pw.dgt AS DOUBLE) - pw.sd)
                     / pw.sd)) AS gnb,
              SUM((CAST(pw.sd AS DOUBLE)
                   / (CAST(a.n AS DOUBLE) * b.n)
                   / (CAST(a.s AS DOUBLE) / a.n
                      + CAST(b.s AS DOUBLE) / b.n))
                  * ((CAST(a.n AS DOUBLE) / tt.n)
                     * (CAST(b.s AS DOUBLE) / tt.s)
                     + (CAST(b.n AS DOUBLE) / tt.n)
                     * (CAST(a.s AS DOUBLE) / tt.s))
                  * (1.0 - ABS(2.0 * CAST(pw.dgt AS DOUBLE)
                               - pw.sd) / pw.sd)) AS gt
       FROM pw JOIN gm a ON pw.sa = a.seg
               JOIN gm b ON pw.sb = b.seg, tt
       WHERE pw.sa < pw.sb),
tg AS (SELECT (SELECT CAST(SUM(CASE WHEN sa = sb THEN sd
                                    ELSE 2 * sd END) AS DOUBLE)
               FROM pw)
              / (CAST(tt.n AS DOUBLE) * tt.n)
              / (2.0 * CAST(tt.s AS DOUBLE) / tt.n) AS g
       FROM tt)
SELECT (SELECT n FROM tt) AS n_users,
       ROUND(tg.g, 6) AS gini_total,
       ROUND(gw.gw, 6) AS g_within,
       ROUND(gb.gnb, 6) AS g_between_net,
       ROUND(gb.gt, 6) AS g_transvariation,
       ROUND(gw.gw + gb.gnb + gb.gt, 6) AS identity_check,
       ROUND(gb.gnb / tg.g, 6) AS between_share
FROM tg, gw, gb""")
def dagum_gini_decomposition_segments(sf_dir: str) -> pd.DataFrame:
    """Dagum's three-way Gini decomposition of user value by market
    segment: within-group + NET between-group + transvariation.
    Theil decomposes cleanly but forces an entropy metric; Gini
    decomposes with a remainder, and Dagum's insight was that the
    remainder IS a statistic — transvariation measures how much
    the segments' value distributions OVERLAP (rich users of poor
    segments out-earning poor users of rich segments). The
    actionable split: high between_share means segment membership
    predicts value (segment-level pricing works), high
    transvariation means the segments interleave and per-segment
    strategies misfire on exactly the overlapping mass.
    identity_check prints Gw+Gnb+Gt, which equals the total Gini
    EXACTLY under the population-pair convention (n², self-pairs
    zero) used on both engines; every Δ_jh is an exact HUGEINT
    pairwise-|x−y| sum computed from per-segment histograms by
    prefix sums — no pair ever expands."""
    gm, pw = _dagum_tables(sf_dir)
    nn = int(gm["n"].sum())
    ss = int(gm["s"].sum())
    g_tot_num = sum((sd if sa == sb else 2 * sd)
                    for (sa, sb), (sd, _) in pw.items())
    g = float(g_tot_num) / (float(nn) * nn) \
        / (2.0 * float(ss) / nn)
    gwv = 0.0
    for _, r in gm.iterrows():
        sd, _ = pw[(r["seg"], r["seg"])]
        nj, sj = int(r["n"]), int(r["s"])
        gjj = float(sd) / (float(nj) * nj) \
            / (2.0 * float(sj) / nj)
        gwv += gjj * (float(nj) / nn) * (float(sj) / ss)
    gnb = 0.0
    gt = 0.0
    idx = {r["seg"]: (int(r["n"]), int(r["s"]))
           for _, r in gm.iterrows()}
    for (sa, sb), (sd, dgt) in pw.items():
        if sa >= sb:
            continue
        na, sva = idx[sa]
        nb, svb = idx[sb]
        gjh = float(sd) / (float(na) * nb) \
            / (float(sva) / na + float(svb) / nb)
        wgt = (float(na) / nn) * (float(svb) / ss) \
            + (float(nb) / nn) * (float(sva) / ss)
        d = abs(2.0 * float(dgt) - float(sd)) / float(sd)
        gnb += gjh * wgt * d
        gt += gjh * wgt * (1.0 - d)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([nn], np.int64),
        "gini_total": [float(rha(g, 6))],
        "g_within": [float(rha(gwv, 6))],
        "g_between_net": [float(rha(gnb, 6))],
        "g_transvariation": [float(rha(gt, 6))],
        "identity_check": [float(rha(gwv + gnb + gt, 6))],
        "between_share": [float(rha(gnb / g, 6))]})


@register("segment_pair_affluence", sql=f"""
WITH {_DAGUM_SQL}
SELECT pw.sa AS seg_a, pw.sb AS seg_b,
       ROUND(CAST(a.s AS DOUBLE) / a.n / 100.0, 6) AS mean_a,
       ROUND(CAST(b.s AS DOUBLE) / b.n / 100.0, 6) AS mean_b,
       ROUND(CAST(pw.sd AS DOUBLE) / (CAST(a.n AS DOUBLE) * b.n)
             / (CAST(a.s AS DOUBLE) / a.n
                + CAST(b.s AS DOUBLE) / b.n), 6) AS gini_jh,
       ROUND(ABS(2.0 * CAST(pw.dgt AS DOUBLE) - pw.sd) / pw.sd, 6)
           AS dagum_d,
       ROUND(1.0 - ABS(2.0 * CAST(pw.dgt AS DOUBLE) - pw.sd)
             / pw.sd, 6) AS overlap
FROM pw JOIN gm a ON pw.sa = a.seg JOIN gm b ON pw.sb = b.seg
WHERE pw.sa < pw.sb ORDER BY 1, 2""")
def segment_pair_affluence(sf_dir: str) -> pd.DataFrame:
    """The pairwise table behind the Dagum decomposition: for each
    segment pair, the between-group Gini G_jh, Dagum's relative
    economic affluence D (1 = the richer segment's every user
    out-earns the poorer's every user; 0 = complete
    distributional overlap) and its complement as an overlap
    score. This is the distance matrix for segments-as-
    distributions — two segments with equal means can still have
    D near 0 (interchangeable) or G_jh large (same center, very
    different spreads), which is exactly what a mean-per-segment
    table hides. Same exact HUGEINT cross sums; ten driver rows."""
    gm, pw = _dagum_tables(sf_dir)
    idx = {r["seg"]: (int(r["n"]), int(r["s"]))
           for _, r in gm.iterrows()}
    rha = textstats.round_half_away
    rows = []
    for (sa, sb), (sd, dgt) in sorted(pw.items()):
        if sa >= sb:
            continue
        na, sva = idx[sa]
        nb, svb = idx[sb]
        gjh = float(sd) / (float(na) * nb) \
            / (float(sva) / na + float(svb) / nb)
        d = abs(2.0 * float(dgt) - float(sd)) / float(sd)
        rows.append((sa, sb,
                     float(rha(float(sva) / na / 100.0, 6)),
                     float(rha(float(svb) / nb / 100.0, 6)),
                     float(rha(gjh, 6)), float(rha(d, 6)),
                     float(rha(1.0 - d, 6))))
    return pd.DataFrame(rows, columns=[
        "seg_a", "seg_b", "mean_a", "mean_b", "gini_jh",
        "dagum_d", "overlap"])


# ---------------------------------------------------------------------------
# Kneser–Ney statistics: absolute-discount estimate + continuation
# probability (the language-modeling pair behind every modern smoother)
# ---------------------------------------------------------------------------

@register("kneser_ney_discount_by_source", sql=r"""
WITH t AS (SELECT source, regexp_extract_all(lower(text), '\S+')
               AS w
           FROM documents),
bg AS (SELECT source, w[i] AS w1, w[i + 1] AS w2
       FROM t, LATERAL (SELECT unnest(generate_series(1,
                        len(w) - 1)) AS i) g),
bc AS (SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
       FROM bg GROUP BY 1, 2, 3)
SELECT source,
       CAST(SUM(cb) AS BIGINT) AS bigram_tokens,
       CAST(COUNT(*) AS BIGINT) AS bigram_types,
       CAST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
       CAST(SUM(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n2,
       ROUND(CASE WHEN SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END)
                       + 2 * SUM(CASE WHEN cb = 2 THEN 1 ELSE 0
                                 END) = 0 THEN 0.0
                  ELSE CAST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0
                                END) AS DOUBLE)
                       / (SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END)
                          + 2.0 * SUM(CASE WHEN cb = 2 THEN 1
                                      ELSE 0 END))
             END, 6) AS kn_discount
FROM bc GROUP BY source ORDER BY source""")
def kneser_ney_discount_by_source(sf_dir: str) -> pd.DataFrame:
    """The Chen–Goodman absolute-discount estimate D = n₁/(n₁+2n₂)
    per source, from the bigram count-of-counts — the single
    parameter that turns raw bigram counts into a Kneser–Ney
    language model, derivable in closed form from leave-one-out
    likelihood (no training loop). Beyond LM-building, D is a
    corpus diagnostic the richness family misses: it measures how
    much of the PAIR vocabulary is singleton mass (D → 1 means
    bigrams barely repeat — topical, diverse text; D ≪ 1 means
    heavy bigram reuse — boilerplate), which is the right
    smoothing-difficulty read for deciding how much held-out mass
    a per-source LM needs. Bigrams form inside docs (numpy shift),
    the (source, w1, w2) reduce makes each pair row global, and
    per-block count-of-counts partials are disjoint integers."""
    def grams(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        rows = []
        for src, ws in zip(df["source"], words):
            rows.extend((src, a, b) for a, b in zip(ws[:-1],
                                                    ws[1:]))
        if not rows:
            return pd.DataFrame(columns=["source", "w1", "w2",
                                         "cb"])
        out = pd.DataFrame(rows, columns=["source", "w1", "w2"])
        return out.groupby(["source", "w1", "w2"],
                           as_index=False).size() \
            .rename(columns={"size": "cb"})

    bc = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(grams, batch_format="pandas"),
        ["source", "w1", "w2"], {"cb": ("cb", "sum")})

    def cc(df: pd.DataFrame) -> pd.DataFrame:
        cb = df["cb"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": df["source"], "tok": cb,
            "typ": np.ones(len(df), np.int64),
            "n1": (cb == 1).astype(np.int64),
            "n2": (cb == 2).astype(np.int64)}) \
            .groupby("source", as_index=False).sum()

    m = reduce_sink(bc.map_batches(cc, batch_format="pandas"),
                    ["source"],
                    {"tok": ("tok", "sum"), "typ": ("typ", "sum"),
                     "n1": ("n1", "sum"), "n2": ("n2", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    den = m["n1"].to_numpy(np.int64) \
        + 2 * m["n2"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": m["source"],
        "bigram_tokens": m["tok"].astype(np.int64),
        "bigram_types": m["typ"].astype(np.int64),
        "n1": m["n1"].astype(np.int64),
        "n2": m["n2"].astype(np.int64),
        "kn_discount": [
            float(rha(float(a) / (a + 2.0 * b), 6))
            if a + 2 * b > 0 else 0.0
            for a, b in zip(m["n1"], m["n2"])]})


@register("kn_continuation_top_words", sql=r"""
WITH t AS (SELECT regexp_extract_all(lower(text), '\S+') AS w
           FROM documents),
u AS (SELECT unnest(w) AS word FROM t),
uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
       FROM u GROUP BY 1),
bg AS (SELECT w[i] AS w1, w[i + 1] AS w2
       FROM t, LATERAL (SELECT unnest(generate_series(1,
                        len(w) - 1)) AS i) g),
bt AS (SELECT DISTINCT w1, w2 FROM bg),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bt),
ct AS (SELECT w2 AS word, CAST(COUNT(*) AS BIGINT) AS n_ctx
       FROM bt GROUP BY 1),
rk AS (SELECT word, n_ctx,
              ROW_NUMBER() OVER (ORDER BY n_ctx DESC, word) AS rr
       FROM ct)
SELECT rk.word, rk.n_ctx AS n_contexts, uc.c AS unigram_count,
       ROUND(CAST(rk.n_ctx AS DOUBLE) / nb.b, 6)
           AS p_continuation
FROM rk JOIN uc ON uc.word = rk.word, nb
WHERE rk.rr <= 10 ORDER BY rk.n_ctx DESC, rk.word""")
def kn_continuation_top_words(sf_dir: str) -> pd.DataFrame:
    """Kneser–Ney continuation probability: top-10 words by the
    number of DISTINCT left contexts they follow, normalized by
    total bigram types. This is the famous 'Francisco' correction
    — a word can be frequent (high unigram count) yet nearly
    useless as a back-off prediction because it only ever follows
    one word; P_cont replaces raw frequency with context
    diversity, and reading n_contexts against unigram_count in
    this table directly exposes which high-frequency words are
    glue (high both) versus bound collocates (high count, few
    contexts). Ranking is by the INTEGER context count with word
    ties, so no float ever decides order; bigrams dedupe in the
    (w1, w2) reduce and only per-word context counts + the
    vocabulary-bounded unigram table move."""
    def grams(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        rows = []
        for ws in words:
            rows.extend(zip(ws[:-1], ws[1:]))
        if not rows:
            return pd.DataFrame(columns=["w1", "w2", "n"])
        out = pd.DataFrame(rows, columns=["w1", "w2"])
        out = out.drop_duplicates()
        out["n"] = np.int64(1)
        return out

    bt = reduce_sink(
        _docs(sf_dir, ["text"])
        .map_batches(grams, batch_format="pandas"),
        ["w1", "w2"], {"n": ("n", "size")})
    ctx = reduce_sink(
        bt.map_batches(lambda df: pd.DataFrame(
            {"word": df["w2"], "n_ctx": np.ones(len(df),
                                                np.int64)}),
            batch_format="pandas"),
        ["word"], {"n_ctx": ("n_ctx", "sum")})
    btot = int(ctx.map_batches(
        lambda df: pd.DataFrame({"b": [df["n_ctx"].sum()]}),
        batch_format="pandas").to_pandas()["b"].sum())

    def topp(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_ctx", "word"],
                              ascending=[False, True],
                              kind="mergesort").head(10)

    cand = ctx.map_batches(topp, batch_format="pandas") \
        .to_pandas().sort_values(["n_ctx", "word"],
                                 ascending=[False, True],
                                 kind="mergesort").head(10)

    def ucnt(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        rows = []
        for ws in words:
            rows.extend(ws)
        if not rows:
            return pd.DataFrame(columns=["word", "c"])
        return pd.Series(rows).value_counts().rename_axis("word") \
            .reset_index(name="c")

    need = set(cand["word"])
    uc = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(ucnt,
                                            batch_format="pandas"),
        ["word"], {"c": ("c", "sum")}).map_batches(
        lambda df: df[df["word"].isin(need)],
        batch_format="pandas").to_pandas()
    out = cand.merge(uc, on="word")
    rha = textstats.round_half_away
    return pd.DataFrame({
        "word": out["word"],
        "n_contexts": out["n_ctx"].astype(np.int64),
        "unigram_count": out["c"].astype(np.int64),
        "p_continuation": [float(rha(int(v) / btot, 6))
                           for v in out["n_ctx"]]})


# ---------------------------------------------------------------------------
# Sequential-testing peeking audit: daily z-path vs O'Brien–Fleming
# ---------------------------------------------------------------------------

#: daily cumulative two-proportion z of weekend-vs-weekday purchase
#: share: per-day (weekend, n, k) partials, window-cumulated, pooled-z
#: with zero guards; OBF boundary 1.959964*sqrt(D/k) at D total looks.
_PEEK_SQL = """
b AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                 AS we,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
      FROM events),
dd AS (SELECT d, we, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(y) AS BIGINT) AS k
       FROM b GROUP BY 1, 2),
days AS (SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT)
             AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS nd
         FROM (SELECT DISTINCT d FROM dd)),
cu AS (SELECT days.d, days.i, days.nd,
              SUM(CASE WHEN dd.we = 1 THEN dd.n ELSE 0 END)
                  OVER w AS n1,
              SUM(CASE WHEN dd.we = 1 THEN dd.k ELSE 0 END)
                  OVER w AS k1,
              SUM(CASE WHEN dd.we = 0 THEN dd.n ELSE 0 END)
                  OVER w AS n0,
              SUM(CASE WHEN dd.we = 0 THEN dd.k ELSE 0 END)
                  OVER w AS k0
       FROM days JOIN dd ON dd.d = days.d
       WINDOW w AS (ORDER BY days.d
                    ROWS UNBOUNDED PRECEDING)),
cu2 AS (SELECT d, i, nd, MAX(n1) AS n1, MAX(k1) AS k1,
               MAX(n0) AS n0, MAX(k0) AS k0
        FROM cu GROUP BY 1, 2, 3),
zp AS (SELECT d, i, nd, n1, n0,
              CASE WHEN n1 > 0 AND n0 > 0
                        AND k1 + k0 > 0 AND k1 + k0 < n1 + n0
                   THEN (CAST(k1 AS DOUBLE) / n1
                         - CAST(k0 AS DOUBLE) / n0)
                        / SQRT((CAST(k1 + k0 AS DOUBLE)
                                / (n1 + n0))
                               * (1.0 - CAST(k1 + k0 AS DOUBLE)
                                        / (n1 + n0))
                               * (1.0 / n1 + 1.0 / n0))
                   ELSE 0.0 END AS z
       FROM cu2)"""


@register("peeking_audit_daily_path", sql=f"""
WITH {_PEEK_SQL}
SELECT CAST(d AS BIGINT) AS epoch_day, i AS look,
       ROUND(z, 6) AS z,
       CAST(CASE WHEN ABS(z) > 1.959964 THEN 1 ELSE 0 END
            AS BIGINT) AS naive_sig,
       CAST(CASE WHEN ABS(z) > 1.959964
                      * SQRT(CAST(nd AS DOUBLE) / i)
                 THEN 1 ELSE 0 END AS BIGINT) AS obf_sig
FROM zp ORDER BY i""")
def peeking_audit_daily_path(sf_dir: str) -> pd.DataFrame:
    """The daily z-path an experimenter watching the weekend-purchase
    'experiment' would see: cumulative two-proportion z after each
    day, flagged against the fixed 1.96 line (what a dashboard
    does) and against the O'Brien–Fleming group-sequential boundary
    1.96·√(D/k) (what a statistician licenses). The path makes the
    peeking problem VISIBLE: a z that wanders over 1.96 mid-window
    and back is exactly the excursion the fixed line wrongly calls,
    while the OBF boundary starts brutally high and relaxes to
    ~1.96 only at the planned end — early stopping is allowed only
    for effects large enough to survive it. Cumulative counts are
    exact integers via one per-(day, weekend) reduce; the z and
    boundary are shared float expressions with degenerate-day
    guards identical on both engines."""
    return _peek_path(sf_dir)[0]


@register("peeking_audit_summary", sql=f"""
WITH {_PEEK_SQL},
fl AS (SELECT i, z, nd,
              CASE WHEN ABS(z) > 1.959964 THEN 1 ELSE 0 END AS ns,
              CASE WHEN ABS(z) > 1.959964
                        * SQRT(CAST(nd AS DOUBLE) / i)
                   THEN 1 ELSE 0 END AS os
       FROM zp)
SELECT MAX(nd) AS n_looks,
       CAST(SUM(ns) AS BIGINT) AS naive_crossings,
       CAST(COALESCE(MIN(CASE WHEN ns = 1 THEN i END), 0)
            AS BIGINT) AS first_naive_look,
       CAST(SUM(os) AS BIGINT) AS obf_crossings,
       CAST(COALESCE(MIN(CASE WHEN os = 1 THEN i END), 0)
            AS BIGINT) AS first_obf_look,
       ROUND(MAX(CASE WHEN i = nd THEN z END), 6) AS final_z
FROM fl""")
def peeking_audit_summary(sf_dir: str) -> pd.DataFrame:
    """The peeking audit's verdict row: how many of the daily looks
    a fixed-1.96 dashboard would have flagged versus how many
    survive the O'Brien–Fleming boundary, with the first crossing
    look for each. naive_crossings > 0 with obf_crossings = 0 is
    the canonical false-alarm signature (the dashboard would have
    'shipped the weekend effect' that the sequential design says
    is noise); both positive with first_obf_look ≪ n_looks is a
    real effect large enough for early stopping. Read with
    [[aa_test_calibration]] (which calibrates the machinery) and
    [[sprt_crossing_day]] (the always-valid alternative). Same
    exact cumulative-count machinery, one row."""
    return _peek_path(sf_dir)[1]


def _peek_path(sf_dir: str):
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        dow = (df["ts"].dt.dayofweek.to_numpy(np.int64) + 1) % 7
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "we": ((dow == 0) | (dow == 6)).astype(np.int64),
            "n": np.ones(len(df), np.int64),
            "k": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})

    dd = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d", "we"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas()
    days = np.sort(dd["d"].unique())
    nd = len(days)
    n1 = k1 = n0 = k0 = 0
    rows = []
    for i, d in enumerate(days, start=1):
        cur = dd[dd["d"] == d]
        for _, r in cur.iterrows():
            if int(r["we"]) == 1:
                n1 += int(r["n"])
                k1 += int(r["k"])
            else:
                n0 += int(r["n"])
                k0 += int(r["k"])
        if n1 > 0 and n0 > 0 and 0 < k1 + k0 < n1 + n0:
            pp = float(k1 + k0) / (n1 + n0)
            z = (float(k1) / n1 - float(k0) / n0) \
                / np.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n0))
        else:
            z = 0.0
        rows.append((int(d), i, z))
    rha = textstats.round_half_away
    path = pd.DataFrame({
        "epoch_day": [r[0] for r in rows],
        "look": np.array([r[1] for r in rows], np.int64),
        "z": [float(rha(r[2], 6)) for r in rows],
        "naive_sig": np.array(
            [1 if abs(r[2]) > 1.959964 else 0 for r in rows],
            np.int64),
        "obf_sig": np.array(
            [1 if abs(r[2]) > 1.959964 * np.sqrt(float(nd) / r[1])
             else 0 for r in rows], np.int64)})
    path["epoch_day"] = path["epoch_day"].astype(np.int64)
    ns = path["naive_sig"].to_numpy()
    os_ = path["obf_sig"].to_numpy()
    summary = pd.DataFrame({
        "n_looks": np.array([nd], np.int64),
        "naive_crossings": np.array([int(ns.sum())], np.int64),
        "first_naive_look": np.array(
            [int(path["look"][ns == 1].min()) if ns.any() else 0],
            np.int64),
        "obf_crossings": np.array([int(os_.sum())], np.int64),
        "first_obf_look": np.array(
            [int(path["look"][os_ == 1].min()) if os_.any()
             else 0], np.int64),
        "final_z": [float(path["z"].iloc[-1])]})
    return path, summary


# ---------------------------------------------------------------------------
# Multivariate day-vectors: Mahalanobis outliers + Hotelling T²
# (closed-form 3×3 inverse — no linear-algebra library in the oracle)
# ---------------------------------------------------------------------------

#: per-day (views, clicks, purchases) count vectors over the full
#: zero-filled calendar, with all 3x3 scatter moments as exact
#: integers (n·Σxy − ΣxΣy scaling).
_DAYVEC_SQL = """
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

#: covariance entries from integer moments of a (x, y, z) frame —
#: population covariance over n rows (divides n, matching both
#: engines; the Mahalanobis/Hotelling scale factors absorb n−1
#: conventions explicitly where they appear).
_COV3 = """
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(z) AS HUGEINT) AS sz,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy,
             CAST(SUM(z * z) AS HUGEINT) AS szz,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * z) AS HUGEINT) AS sxz,
             CAST(SUM(y * z) AS HUGEINT) AS syz
      FROM g),
cv AS (SELECT CAST(n AS BIGINT) AS n,
              CAST(sx AS DOUBLE) / n AS mx,
              CAST(sy AS DOUBLE) / n AS my,
              CAST(sz AS DOUBLE) / n AS mz,
              CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1.0))
                  AS a,
              CAST(n * syy - sy * sy AS DOUBLE) / (n * (n - 1.0))
                  AS b,
              CAST(n * szz - sz * sz AS DOUBLE) / (n * (n - 1.0))
                  AS c,
              CAST(n * sxy - sx * sy AS DOUBLE) / (n * (n - 1.0))
                  AS f,
              CAST(n * sxz - sx * sz AS DOUBLE) / (n * (n - 1.0))
                  AS gg,
              CAST(n * syz - sy * sz AS DOUBLE) / (n * (n - 1.0))
                  AS h
       FROM m),
inv AS (SELECT *,
               a * (b * c - h * h) - f * (f * c - h * gg)
               + gg * (f * h - b * gg) AS det,
               (b * c - h * h) AS i11, (gg * h - f * c) AS i12,
               (f * h - b * gg) AS i13, (a * c - gg * gg) AS i22,
               (f * gg - a * h) AS i23, (a * b - f * f) AS i33
        FROM cv)"""


def _dayvec(sf_dir: str) -> pd.DataFrame:
    """Zero-filled daily (d, x=views, y=clicks, z=purchases)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "d": (us // 86_400_000_000).astype(np.int64),
            "x": (et == "view").astype(np.int64),
            "y": (et == "click").astype(np.int64),
            "z": (et == "purchase").astype(np.int64)})

    e = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["d"], {"x": ("x", "sum"), "y": ("y", "sum"),
                "z": ("z", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(e["d"].min()), int(e["d"].max())
    cal = pd.DataFrame({"d": np.arange(lo, hi + 1,
                                       dtype=np.int64)})
    return cal.merge(e, on="d", how="left").fillna(0) \
        .astype({"x": np.int64, "y": np.int64, "z": np.int64})


def _cov3(g: pd.DataFrame):
    """(n, means, sample-covariance entries, inverse-scaled entries,
    det) mirroring the SQL's closed-form adjugate."""
    n = len(g)
    X = [g["x"].to_numpy(np.int64).astype(object),
         g["y"].to_numpy(np.int64).astype(object),
         g["z"].to_numpy(np.int64).astype(object)]
    s = [int(v.sum()) for v in X]
    mom = {}
    keys = [("a", 0, 0), ("b", 1, 1), ("c", 2, 2), ("f", 0, 1),
            ("gg", 0, 2), ("h", 1, 2)]
    for k, i, j in keys:
        sij = int((X[i] * X[j]).sum())
        mom[k] = float(n * sij - s[i] * s[j]) / (n * (n - 1.0))
    a, b, c = mom["a"], mom["b"], mom["c"]
    f, gg, h = mom["f"], mom["gg"], mom["h"]
    det = a * (b * c - h * h) - f * (f * c - h * gg) \
        + gg * (f * h - b * gg)
    inv = {"i11": b * c - h * h, "i12": gg * h - f * c,
           "i13": f * h - b * gg, "i22": a * c - gg * gg,
           "i23": f * gg - a * h, "i33": a * b - f * f}
    means = [float(v) / n for v in s]
    return n, means, mom, inv, det


@register("mahalanobis_outlier_days", sql=f"""
WITH {_DAYVEC_SQL},
{_COV3},
md AS (SELECT g.d,
              ((g.x - mx) * (i11 * (g.x - mx) + i12 * (g.y - my)
                             + i13 * (g.z - mz))
               + (g.y - my) * (i12 * (g.x - mx) + i22 * (g.y - my)
                               + i23 * (g.z - mz))
               + (g.z - mz) * (i13 * (g.x - mx) + i23 * (g.y - my)
                               + i33 * (g.z - mz))) / det AS d2
       FROM g, inv),
rk AS (SELECT d, ROUND(d2, 6) AS d2,
              ROW_NUMBER() OVER (ORDER BY ROUND(d2, 6) DESC, d)
                  AS rr
       FROM md)
SELECT CAST(d AS BIGINT) AS epoch_day, d2 AS mahalanobis_d2,
       CAST(CASE WHEN d2 > 11.344867 THEN 1 ELSE 0 END AS BIGINT)
           AS outlier_chi2_99
FROM rk WHERE rr <= 5 ORDER BY d2 DESC, epoch_day""")
def mahalanobis_outlier_days(sf_dir: str) -> pd.DataFrame:
    """Top-5 multivariate outlier days by Mahalanobis D² of the
    (views, clicks, purchases) daily vector — the outlier the
    univariate screens (Grubbs, MAD, residual top-k) structurally
    miss: a day with NORMAL totals but an impossible MIX (clicks
    without views, purchases without clicks) sits at huge D² while
    passing every per-column test. The 3×3 covariance inverts in
    closed form (adjugate/det over the exact n·Σxy − ΣxΣy integer
    moments), so the oracle needs no linear algebra; D² is
    flagged at the χ²₃ 99% point (11.344867), the standard
    reference under multivariate normality (documented
    approximation). Ranking rounds D² at 6dp with day ties."""
    g = _dayvec(sf_dir)
    n, means, mom, inv, det = _cov3(g)
    dx = g["x"].to_numpy(np.float64) - means[0]
    dy = g["y"].to_numpy(np.float64) - means[1]
    dz = g["z"].to_numpy(np.float64) - means[2]
    d2 = (dx * (inv["i11"] * dx + inv["i12"] * dy
                + inv["i13"] * dz)
          + dy * (inv["i12"] * dx + inv["i22"] * dy
                  + inv["i23"] * dz)
          + dz * (inv["i13"] * dx + inv["i23"] * dy
                  + inv["i33"] * dz)) / det
    rha = textstats.round_half_away
    out = pd.DataFrame({"epoch_day": g["d"].astype(np.int64),
                        "d2": rha(d2, 6)})
    out = out.sort_values(["d2", "epoch_day"],
                          ascending=[False, True],
                          kind="mergesort").head(5)
    return pd.DataFrame({
        "epoch_day": out["epoch_day"].to_numpy(np.int64),
        "mahalanobis_d2": out["d2"].to_numpy(np.float64),
        "outlier_chi2_99": (out["d2"].to_numpy(np.float64)
                            > 11.344867).astype(np.int64)})


@register("hotelling_t2_weekend_dayvec", sql=f"""
WITH {_DAYVEC_SQL},
wk AS (SELECT g.*, CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1
                        ELSE 0 END AS we
       FROM g),
gm AS (SELECT we, CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS sx,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(z) AS HUGEINT) AS sz,
              CAST(SUM(x * x) AS HUGEINT) AS sxx,
              CAST(SUM(y * y) AS HUGEINT) AS syy,
              CAST(SUM(z * z) AS HUGEINT) AS szz,
              CAST(SUM(x * y) AS HUGEINT) AS sxy,
              CAST(SUM(x * z) AS HUGEINT) AS sxz,
              CAST(SUM(y * z) AS HUGEINT) AS syz
       FROM wk GROUP BY 1),
pool AS (SELECT
    (SELECT CAST(n AS BIGINT) FROM gm WHERE we = 1) AS n1,
    (SELECT CAST(n AS BIGINT) FROM gm WHERE we = 0) AS n0,
    (SELECT CAST(sx AS DOUBLE) / n FROM gm WHERE we = 1)
        - (SELECT CAST(sx AS DOUBLE) / n FROM gm WHERE we = 0)
        AS dx,
    (SELECT CAST(sy AS DOUBLE) / n FROM gm WHERE we = 1)
        - (SELECT CAST(sy AS DOUBLE) / n FROM gm WHERE we = 0)
        AS dy,
    (SELECT CAST(sz AS DOUBLE) / n FROM gm WHERE we = 1)
        - (SELECT CAST(sz AS DOUBLE) / n FROM gm WHERE we = 0)
        AS dz,
    (SELECT SUM(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
     FROM gm) AS wxx,
    (SELECT SUM(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
     FROM gm) AS wyy,
    (SELECT SUM(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)
     FROM gm) AS wzz,
    (SELECT SUM(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
     FROM gm) AS wxy,
    (SELECT SUM(CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
     FROM gm) AS wxz,
    (SELECT SUM(CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n)
     FROM gm) AS wyz),
sc AS (SELECT n1, n0, dx, dy, dz,
              wxx / (n1 + n0 - 2.0) AS a,
              wyy / (n1 + n0 - 2.0) AS b,
              wzz / (n1 + n0 - 2.0) AS c,
              wxy / (n1 + n0 - 2.0) AS f,
              wxz / (n1 + n0 - 2.0) AS gg,
              wyz / (n1 + n0 - 2.0) AS h
       FROM pool),
t2 AS (SELECT n1, n0,
              (CAST(n1 AS DOUBLE) * n0 / (n1 + n0))
              * ((dx * ((b * c - h * h) * dx + (gg * h - f * c)
                        * dy + (f * h - b * gg) * dz)
                  + dy * ((gg * h - f * c) * dx
                          + (a * c - gg * gg) * dy
                          + (f * gg - a * h) * dz)
                  + dz * ((f * h - b * gg) * dx
                          + (f * gg - a * h) * dy
                          + (a * b - f * f) * dz))
                 / (a * (b * c - h * h) - f * (f * c - h * gg)
                    + gg * (f * h - b * gg))) AS t2
       FROM sc)
SELECT n1 AS weekend_days, n0 AS weekday_days,
       ROUND(t2, 6) AS t2,
       ROUND(t2 * (n1 + n0 - 3.0 - 1.0)
             / (3.0 * (n1 + n0 - 2.0)), 6) AS f_stat,
       CAST(CASE WHEN t2 * (n1 + n0 - 3.0 - 1.0)
                      / (3.0 * (n1 + n0 - 2.0)) > 2.975154
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected_f05
FROM t2""")
def hotelling_t2_weekend_dayvec(sf_dir: str) -> pd.DataFrame:
    """Hotelling's T² comparing the weekend vs weekday MEAN
    (views, clicks, purchases) day-vector — the multivariate
    t-test. The registry tests the weekend effect one metric at a
    time (Welch, Mann–Whitney, odds ratios, Hodges–Lehmann…), but
    five marginal tests at 5% is a multiplicity bleed AND they
    miss correlated displacement: weekends shifting the mix along
    the views–clicks covariance direction can be invisible in
    every marginal while T² sees it. Pooled within-group
    covariance from exact integer moments, closed-form 3×3
    adjugate inverse, F = T²(n−p−1)/(p(n−2)) against F(3,·) at
    5% (2.975154 for large df, documented constant); the weekend
    flag uses (epoch_day+4)%7 — 1970-01-01 was a Thursday."""
    g = _dayvec(sf_dir)
    we = ((g["d"].to_numpy(np.int64) + 4) % 7)
    g = g.assign(we=((we == 0) | (we == 6)).astype(np.int64))
    moms = {}
    for w in (0, 1):
        sub = g[g["we"] == w]
        n = len(sub)
        X = [sub["x"].to_numpy(np.int64).astype(object),
             sub["y"].to_numpy(np.int64).astype(object),
             sub["z"].to_numpy(np.int64).astype(object)]
        s = [int(v.sum()) for v in X]
        pr = {}
        for k, i, j in [("xx", 0, 0), ("yy", 1, 1), ("zz", 2, 2),
                        ("xy", 0, 1), ("xz", 0, 2), ("yz", 1, 2)]:
            pr[k] = int((X[i] * X[j]).sum())
        moms[w] = (n, s, pr)
    n1, s1, p1 = moms[1]
    n0, s0, p0 = moms[0]
    d = [float(s1[i]) / n1 - float(s0[i]) / n0 for i in range(3)]
    df2 = n1 + n0 - 2.0

    def wsum(k, i, j):
        return (float(p1[k]) - float(s1[i]) * s1[j] / n1) \
            + (float(p0[k]) - float(s0[i]) * s0[j] / n0)

    a = wsum("xx", 0, 0) / df2
    b = wsum("yy", 1, 1) / df2
    c = wsum("zz", 2, 2) / df2
    f = wsum("xy", 0, 1) / df2
    gg = wsum("xz", 0, 2) / df2
    h = wsum("yz", 1, 2) / df2
    det = a * (b * c - h * h) - f * (f * c - h * gg) \
        + gg * (f * h - b * gg)
    dx, dy, dz = d
    quad = (dx * ((b * c - h * h) * dx + (gg * h - f * c) * dy
                  + (f * h - b * gg) * dz)
            + dy * ((gg * h - f * c) * dx + (a * c - gg * gg) * dy
                    + (f * gg - a * h) * dz)
            + dz * ((f * h - b * gg) * dx + (f * gg - a * h) * dy
                    + (a * b - f * f) * dz)) / det
    t2 = (float(n1) * n0 / (n1 + n0)) * quad
    fstat = t2 * (n1 + n0 - 3.0 - 1.0) / (3.0 * (n1 + n0 - 2.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "weekend_days": np.array([n1], np.int64),
        "weekday_days": np.array([n0], np.int64),
        "t2": [float(rha(t2, 6))],
        "f_stat": [float(rha(fstat, 6))],
        "rejected_f05": np.array([1 if fstat > 2.975154 else 0],
                                 np.int64)})


# ---------------------------------------------------------------------------
# Spectral inference: Fisher's g exact periodicity test + Bartlett's
# cumulative-periodogram white-noise test on the daily stream
# ---------------------------------------------------------------------------

#: periodogram of the zero-filled daily counts at Fourier frequencies
#: j = 1..(n-1)/2. Constant offsets are exactly orthogonal to every
#: j >= 1 over a full length-n window, so no mean-centering is needed
#: and the trig sums run on raw integer counts.
_PGRAM_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT)
          AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
fr AS (SELECT CAST(UNNEST(generate_series(1, (n - 1) // 2))
              AS BIGINT) AS j
       FROM nn),
pg AS (SELECT fr.j,
              (POWER(SUM(g.x * COS(2 * PI() * fr.j * g.i / nn.n)),
                     2)
               + POWER(SUM(g.x * SIN(2 * PI() * fr.j * g.i
                                     / nn.n)), 2)) / MAX(nn.n)
                  AS ii
       FROM g CROSS JOIN fr CROSS JOIN nn GROUP BY fr.j)"""


def _periodogram(sf_dir: str):
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    m = (n - 1) // 2
    t = np.arange(n, dtype=np.float64)
    xs = x.astype(np.float64)
    iis = []
    for j in range(1, m + 1):
        cr = float((xs * np.cos(2 * np.pi * j * t / n)).sum())
        ci = float((xs * np.sin(2 * np.pi * j * t / n)).sum())
        iis.append((cr ** 2 + ci ** 2) / n)
    return n, m, np.array(iis)


@register("fisher_g_daily", sql=f"""
WITH {_PGRAM_SQL},
gs AS (SELECT MAX(ii) / SUM(ii) AS gg,
              CAST(COUNT(*) AS BIGINT) AS m,
              SUM(ii) AS tot
       FROM pg),
pk AS (SELECT j, ii FROM pg, gs
       ORDER BY ROUND(ii, 9) DESC, j LIMIT 1),
pv AS (SELECT LEAST(1.0, SUM(
           POWER(-1.0, k + 1)
           * EXP(lgamma(m + 1.0) - lgamma(k + 1.0)
                 - lgamma(m - k + 1.0))
           * POWER(1.0 - k * gg, m - 1.0))) AS p
       FROM gs, (SELECT CAST(UNNEST(generate_series(1, 400))
                        AS BIGINT) AS k) ks
       WHERE k <= m AND k * gg < 1.0)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
       gs.m AS n_freqs, pk.j AS peak_j,
       ROUND(CAST((SELECT n FROM nn) AS DOUBLE) / pk.j, 6)
           AS peak_period_days,
       ROUND(gs.gg, 6) AS fisher_g,
       ROUND(pv.p, 6) AS p_value,
       CAST(CASE WHEN pv.p < 0.05 THEN 1 ELSE 0 END AS BIGINT)
           AS periodic_rejected
FROM gs, pk, pv""")
def fisher_g_daily(sf_dir: str) -> pd.DataFrame:
    """Fisher's g-test for a hidden periodicity in the daily stream:
    the largest periodogram ordinate's share of total power, with
    its EXACT null distribution P(g>x) = Σ(−1)^{k−1}C(m,k)(1−kx)^{m−1}
    (no asymptotics, no simulation — the rare closed-form exact
    test). The registry's spectral family describes (period power,
    flatness, harmonic fit); this one DECIDES: p < .05 certifies
    the weekly (or whatever peak_period_days says) line is real
    against a white-noise null that accounts for having scanned
    ALL frequencies — the same multiple-comparisons discipline
    [[bh_fdr_hourweek_purchase]] applies to cells, applied to the
    spectrum. Constant offsets are exactly orthogonal to every
    Fourier frequency over the full window, so raw integer counts
    feed the trig sums; both engines evaluate the identical
    truncated alternating series via lgamma."""
    n, m, iis = _periodogram(sf_dir)
    tot = float(iis.sum())
    gg = float(iis.max()) / tot
    rha = textstats.round_half_away
    order = np.lexsort((np.arange(1, m + 1),
                        -rha(iis, 9)))
    pk = int(order[0]) + 1
    p = 0.0
    for k in range(1, m + 1):
        if k * gg >= 1.0:
            break
        from math import lgamma
        p += (-1.0) ** (k + 1) \
            * float(np.exp(lgamma(m + 1.0) - lgamma(k + 1.0)
                           - lgamma(m - k + 1.0))) \
            * (1.0 - k * gg) ** (m - 1.0)
    p = min(1.0, p)
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "n_freqs": np.array([m], np.int64),
        "peak_j": np.array([pk], np.int64),
        "peak_period_days": [float(rha(float(n) / pk, 6))],
        "fisher_g": [float(rha(gg, 6))],
        "p_value": [float(rha(p, 6))],
        "periodic_rejected": np.array([1 if p < 0.05 else 0],
                                      np.int64)})


@register("bartlett_cumper_daily", sql=f"""
WITH {_PGRAM_SQL},
tot AS (SELECT SUM(ii) AS s, CAST(COUNT(*) AS BIGINT) AS m
        FROM pg),
cp AS (SELECT j, SUM(ii) OVER (ORDER BY j
                 ROWS UNBOUNDED PRECEDING) / tot.s
           - CAST(j AS DOUBLE) / tot.m AS dev
       FROM pg, tot),
mx AS (SELECT j, ABS(dev) AS adev FROM cp
       ORDER BY ROUND(ABS(dev), 9) DESC, j LIMIT 1)
SELECT tot.m AS n_freqs, mx.j AS max_dev_j,
       ROUND(mx.adev, 6) AS d_stat,
       ROUND(mx.adev * SQRT(CAST(tot.m AS DOUBLE)), 6)
           AS kolmogorov_stat,
       CAST(CASE WHEN mx.adev * SQRT(CAST(tot.m AS DOUBLE))
                      > 1.358 THEN 1 ELSE 0 END AS BIGINT)
           AS white_noise_rejected
FROM tot, mx""")
def bartlett_cumper_daily(sf_dir: str) -> pd.DataFrame:
    """Bartlett's cumulative-periodogram white-noise test: under
    iid noise the normalized cumulative periodogram climbs the
    diagonal, and its max deviation obeys the Kolmogorov bound
    (√m·D > 1.358 rejects at 5%). Fisher's g only sees power
    concentrated at ONE line; Bartlett's D catches the broadband
    alternatives g misses — slow spectral tilt (long memory: mass
    piles at low j, D peaks early) or multi-line seasonality with
    no single dominant peak — so the PAIR brackets the null from
    both sides: g rejects ⇒ a line, D rejects with modest g ⇒
    colored noise, neither ⇒ the daily stream is spectrally flat
    and every forecasting query beyond the mean is decoration.
    max_dev_j localizes WHERE the spectrum departs; same
    periodogram CTE, cumulative in ascending-j order on both
    engines."""
    n, m, iis = _periodogram(sf_dir)
    tot = float(iis.sum())
    dev = np.cumsum(iis) / tot \
        - np.arange(1, m + 1, dtype=np.float64) / m
    adev = np.abs(dev)
    rha = textstats.round_half_away
    order = np.lexsort((np.arange(1, m + 1), -rha(adev, 9)))
    jmx = int(order[0])
    d = float(adev[jmx])
    kol = d * float(np.sqrt(float(m)))
    return pd.DataFrame({
        "n_freqs": np.array([m], np.int64),
        "max_dev_j": np.array([jmx + 1], np.int64),
        "d_stat": [float(rha(d, 6))],
        "kolmogorov_stat": [float(rha(kol, 6))],
        "white_noise_rejected": np.array(
            [1 if kol > 1.358 else 0], np.int64)})


# ---------------------------------------------------------------------------
# Autocorrelation-honest inference: Newey–West trend SE + effective
# sample size for the daily mean
# ---------------------------------------------------------------------------

@register("newey_west_trend_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT)
          AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(i) AS HUGEINT) AS si,
              CAST(SUM(x) AS HUGEINT) AS sx,
              CAST(SUM(CAST(i AS HUGEINT) * i) AS HUGEINT) AS sii,
              CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six
       FROM g),
fit AS (SELECT n,
               CAST(n * six - si * sx AS DOUBLE)
                   / CAST(n * sii - si * si AS DOUBLE) AS b,
               CAST(sx AS DOUBLE) / n
                   - (CAST(n * six - si * sx AS DOUBLE)
                      / CAST(n * sii - si * si AS DOUBLE))
                     * (CAST(si AS DOUBLE) / n) AS a,
               CAST(n * sii - si * si AS DOUBLE) / n AS sxx,
               CAST(si AS DOUBLE) / n AS ibar
        FROM mo),
u AS (SELECT g.i, (g.i - fit.ibar)
                  * (g.x - fit.a - fit.b * g.i) AS u
      FROM g, fit),
g0 AS (SELECT SUM(u * u) AS s FROM u),
gl AS (SELECT l.l, SUM(a.u * b.u) AS s
       FROM (SELECT UNNEST([1, 2, 3, 4, 5]) AS l) l
       JOIN u a ON TRUE JOIN u b ON b.i = a.i - l.l
       GROUP BY l.l),
nw AS (SELECT (SELECT s FROM g0)
              + 2.0 * SUM((1.0 - gl.l / 6.0) * gl.s) AS s
       FROM gl),
ee AS (SELECT SUM((g.x - fit.a - fit.b * g.i)
                  * (g.x - fit.a - fit.b * g.i)) AS sse
       FROM g, fit)
SELECT fit.n AS n_days, ROUND(fit.b, 6) AS slope,
       ROUND(SQRT(ee.sse / (fit.n - 2.0))
             / SQRT(fit.n * fit.sxx), 6) AS se_ols,
       ROUND(SQRT(nw.s) / (fit.n * fit.sxx), 6) AS se_nw,
       ROUND(SQRT(nw.s) / (fit.n * fit.sxx)
             / (SQRT(ee.sse / (fit.n - 2.0))
                / SQRT(fit.n * fit.sxx)), 6) AS se_inflation,
       ROUND(fit.b / (SQRT(nw.s) / (fit.n * fit.sxx)), 6) AS z_nw,
       CAST(CASE WHEN ABS(fit.b / (SQRT(nw.s)
                                   / (fit.n * fit.sxx)))
                      > 1.959964 THEN 1 ELSE 0 END AS BIGINT)
           AS trend_rejected_nw
FROM fit, nw, ee""")
def newey_west_trend_daily(sf_dir: str) -> pd.DataFrame:
    """OLS daily trend with Newey–West (HAC, Bartlett kernel, lag 5)
    standard errors beside the iid-OLS ones. The trend family here
    (OLS, Theil–Sen, Mann–Kendall, Cox–Stuart) all assume
    exchangeable errors; autocorrelated days — which
    [[daily_acf]] / the long-memory battery usually confirm —
    make the naive slope SE too small by exactly se_inflation, and
    that factor is how many 'significant growth' readouts on
    autocorrelated dashboards are fiction. The slope itself is an
    exact integer ratio; the score autocovariances Σu_t·u_{t−l}
    are O(days·6) float products over the calendar-bounded
    residual vector (residuals never leave the driver/oracle), and
    Var(b) = S_NW/(n·Sxx)² with the identical expression order on
    both engines."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    i = np.arange(n, dtype=np.int64).astype(object)
    xo = x.astype(object)
    si, sx = int(i.sum()), int(xo.sum())
    sii, six = int((i * i).sum()), int((i * xo).sum())
    b = float(n * six - si * sx) / float(n * sii - si * si)
    a = float(sx) / n - b * (float(si) / n)
    sxx = float(n * sii - si * si) / n
    ibar = float(si) / n
    ii = np.arange(n, dtype=np.float64)
    res = x.astype(np.float64) - a - b * ii
    u = (ii - ibar) * res
    s = float((u * u).sum())
    for lag in (1, 2, 3, 4, 5):
        s += 2.0 * (1.0 - lag / 6.0) \
            * float((u[lag:] * u[:-lag]).sum())
    sse = float((res * res).sum())
    se_ols = float(np.sqrt(sse / (n - 2.0))) \
        / float(np.sqrt(n * sxx))
    se_nw = float(np.sqrt(s)) / (n * sxx)
    rha = textstats.round_half_away
    z_nw = b / se_nw
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "slope": [float(rha(b, 6))],
        "se_ols": [float(rha(se_ols, 6))],
        "se_nw": [float(rha(se_nw, 6))],
        "se_inflation": [float(rha(se_nw / se_ols, 6))],
        "z_nw": [float(rha(z_nw, 6))],
        "trend_rejected_nw": np.array(
            [1 if abs(z_nw) > 1.959964 else 0], np.int64)})


@register("effective_sample_size_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT)
          AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(x * x) AS HUGEINT) AS ss
       FROM g),
l1 AS (SELECT CAST(SUM((mo.n * a.x - mo.s)
                       * (mo.n * b.x - mo.s)) AS DOUBLE) AS num
       FROM g a JOIN g b ON b.i = a.i + 1, mo),
st AS (SELECT CAST(mo.n AS BIGINT) AS n,
              l1.num / CAST(mo.n * (mo.n * mo.ss - mo.s * mo.s)
                            AS DOUBLE) AS rho,
              CAST(mo.n * mo.ss - mo.s * mo.s AS DOUBLE)
                  / (CAST(mo.n AS DOUBLE) * (mo.n - 1.0)) AS var,
              CAST(mo.s AS DOUBLE) / mo.n AS mean
       FROM mo, l1),
f AS (SELECT n, rho, mean,
             n * (1.0 - rho) / (1.0 + rho) AS neff,
             SQRT(var) AS sd
      FROM st)
SELECT n AS n_days, ROUND(rho, 6) AS rho1,
       ROUND(neff, 6) AS n_eff,
       ROUND(mean, 6) AS mean_daily,
       ROUND(sd / SQRT(CAST(n AS DOUBLE)), 6) AS se_naive,
       ROUND(sd / SQRT(neff), 6) AS se_corrected,
       ROUND(mean - 1.959964 * sd / SQRT(neff), 6) AS ci_lo,
       ROUND(mean + 1.959964 * sd / SQRT(neff), 6) AS ci_hi
FROM f""")
def effective_sample_size_daily(sf_dir: str) -> pd.DataFrame:
    """Effective sample size of the daily series under AR(1)
    dependence: n_eff = n(1−ρ₁)/(1+ρ₁). [[daily_acf]] draws the
    whole correlogram; this turns its first bar into the ONE
    number every 'mean ± CI over n days' claim silently needs —
    at ρ₁ = 0.5, thirty days carry the information of ten, and
    se_corrected/se_naive = √(n/n_eff) is the factor by which
    every daily-mean error bar on this data is too narrow. The
    lag-1 autocovariance uses the (n·x−S) integer scaling over
    the zero-filled calendar join (numerator exact before ONE
    float division); the corrected CI uses the sample sd and the
    same 1.959964 both engines."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    xo = x.astype(object)
    s, ss = int(xo.sum()), int((xo * xo).sum())
    num = int(((n * xo[:-1] - s) * (n * xo[1:] - s)).sum())
    rho = float(num) / float(n * (n * ss - s * s))
    var = float(n * ss - s * s) / (float(n) * (n - 1.0))
    mean = float(s) / n
    neff = n * (1.0 - rho) / (1.0 + rho)
    sd = float(np.sqrt(var))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "rho1": [float(rha(rho, 6))],
        "n_eff": [float(rha(neff, 6))],
        "mean_daily": [float(rha(mean, 6))],
        "se_naive": [float(rha(sd / np.sqrt(float(n)), 6))],
        "se_corrected": [float(rha(sd / np.sqrt(neff), 6))],
        "ci_lo": [float(rha(mean - 1.959964 * sd / np.sqrt(neff),
                            6))],
        "ci_hi": [float(rha(mean + 1.959964 * sd / np.sqrt(neff),
                            6))]})


# ---------------------------------------------------------------------------
# Zero-inflated Poisson: MoM fit + in-sample likelihood referee
# ---------------------------------------------------------------------------

#: hourly purchase counts on the full event-hour grid (same span and
#: zero-fill conventions as nb_fit_hourly_purchases) reduced to the
#: count-of-counts histogram (k, n_k) including the zero row.
_ZIP_SQL = """
p AS (SELECT epoch_us(ts) // 3600000000 AS h
      FROM events WHERE event_type = 'purchase'),
sp AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
grid AS (SELECT CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n FROM sp),
c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM p GROUP BY 1),
hh AS (SELECT y AS k, CAST(COUNT(*) AS BIGINT) AS nk
       FROM c GROUP BY 1
       UNION ALL
       SELECT 0 AS k, grid.n - (SELECT COUNT(*) FROM c) AS nk
       FROM grid),
mo AS (SELECT CAST(SUM(nk) AS BIGINT) AS n,
              CAST(SUM(nk * k) AS HUGEINT) AS sy,
              CAST(SUM(CAST(nk AS HUGEINT) * k * k) AS HUGEINT)
                  AS syy,
              CAST(SUM(CASE WHEN k = 0 THEN nk ELSE 0 END)
                   AS BIGINT) AS n0
       FROM hh),
fit AS (SELECT n, n0,
               CAST(sy AS DOUBLE) / n AS m,
               CAST(n * syy - sy * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1.0)) AS s2
        FROM mo),
par AS (SELECT n, n0, m, s2,
               CASE WHEN s2 > m AND m > 0
                    THEN (s2 + m * m - m) / m ELSE 0 END AS lam,
               CASE WHEN s2 > m AND m > 0
                    THEN 1.0 - m / ((s2 + m * m - m) / m)
                    ELSE 0 END AS pi
        FROM fit)"""


@register("zip_fit_hourly_purchases", sql=f"""
WITH {_ZIP_SQL}
SELECT n AS n_hours, n0 AS zero_hours,
       ROUND(m, 6) AS mean_rate, ROUND(s2, 6) AS var_rate,
       CAST(CASE WHEN s2 > m AND m > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS fit_ok,
       ROUND(lam, 6) AS zip_lambda, ROUND(pi, 6) AS zip_pi,
       ROUND(CAST(n0 AS DOUBLE) / n, 6) AS p0_obs,
       ROUND(CASE WHEN s2 > m AND m > 0
                  THEN pi + (1.0 - pi) * EXP(-lam)
                  ELSE 0 END, 6) AS p0_zip,
       ROUND(EXP(-m), 6) AS p0_poisson
FROM par""")
def zip_fit_hourly_purchases(sf_dir: str) -> pd.DataFrame:
    """Zero-inflated Poisson moment fit to hourly purchase counts:
    λ = (s²+m²−m)/m, π = 1−m/λ — closed form, the model
    [[nb_fit_hourly_purchases]]'s zero-check points to when excess
    zeros come from a SEPARATE off-switch (dead hours: outages,
    closed markets) rather than fat-tailed rates. The three-way
    zero read is the diagnosis: p0_obs ≈ p0_poisson means no zero
    problem at all; p0_zip ≈ p0_obs ≫ p0_poisson with π ≫ 0 says
    a π-fraction of hours are structurally off — and that fraction
    is a different business problem (availability) than a low rate
    (demand). Same full-hour-grid zero-fill conventions as the NB
    fit; all moments exact integers off the bounded count-of-counts
    histogram."""
    hh, n = _hour_purchase_hist(sf_dir)
    k = hh["k"].to_numpy(np.int64).astype(object)
    nk = hh["nk"].to_numpy(np.int64).astype(object)
    sy = int((nk * k).sum())
    syy = int((nk * k * k).sum())
    n0 = int(hh[hh["k"] == 0]["nk"].sum())
    m = float(sy) / n
    s2 = float(n * syy - sy * sy) / (float(n) * (n - 1.0))
    ok = 1 if (s2 > m and m > 0) else 0
    lam = (s2 + m * m - m) / m if ok else 0.0
    pi = 1.0 - m / lam if ok else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_hours": np.array([n], np.int64),
        "zero_hours": np.array([n0], np.int64),
        "mean_rate": [float(rha(m, 6))],
        "var_rate": [float(rha(s2, 6))],
        "fit_ok": np.array([ok], np.int64),
        "zip_lambda": [float(rha(lam, 6))],
        "zip_pi": [float(rha(pi, 6))],
        "p0_obs": [float(rha(n0 / n, 6))],
        "p0_zip": [float(rha(pi + (1.0 - pi) * np.exp(-lam), 6))
                   if ok else 0.0],
        "p0_poisson": [float(rha(np.exp(-m), 6))]})


def _hour_purchase_hist(sf_dir: str):
    """((k, nk) count-of-counts incl. the zero row, n grid hours)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        h = (us // 3_600_000_000).astype(np.int64)
        return pd.DataFrame({
            "h": h,
            "y": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})

    hc = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["h"], {"y": ("y", "sum")}).to_pandas()
    n = int(hc["h"].max()) - int(hc["h"].min()) + 1
    pos = hc[hc["y"] > 0]
    hh = pos.groupby("y").size().reset_index(name="nk") \
        .rename(columns={"y": "k"})
    n0 = n - len(pos)
    hh = pd.concat([hh, pd.DataFrame({"k": [0], "nk": [n0]})],
                   ignore_index=True).sort_values(
        "k", ignore_index=True).astype(np.int64)
    return hh, n


@register("zip_vs_poisson_ll_hourly", sql=f"""
WITH {_ZIP_SQL},
pp AS (SELECT n, m,
              CASE WHEN pi > 0 THEN lam ELSE m END AS lam,
              CASE WHEN pi > 0 THEN pi ELSE 0.0 END AS pi
       FROM par),
ll AS (SELECT
    SUM(nk * (k * LN(pp.m) - pp.m - lgamma(k + 1.0))) AS ll_p,
    SUM(nk * CASE WHEN k = 0
                  THEN LN(pp.pi + (1.0 - pp.pi)
                          * EXP(-pp.lam))
                  ELSE LN(1.0 - pp.pi) + k * LN(pp.lam)
                       - pp.lam - lgamma(k + 1.0) END) AS ll_z
       FROM hh, pp)
SELECT (SELECT n FROM par) AS n_hours,
       ROUND(ll_p, 6) AS ll_poisson, ROUND(ll_z, 6) AS ll_zip,
       ROUND(ll_z - ll_p, 6) AS llr,
       ROUND((2.0 * 1 - 2.0 * ll_p) - (2.0 * 2 - 2.0 * ll_z), 6)
           AS aic_delta,
       CAST(CASE WHEN (2.0 * 1 - 2.0 * ll_p)
                      - (2.0 * 2 - 2.0 * ll_z) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS zip_wins_aic
FROM ll""")
def zip_vs_poisson_ll_hourly(sf_dir: str) -> pd.DataFrame:
    """The likelihood referee for the zero-inflation question:
    in-sample log-likelihood of the MoM-fitted ZIP versus the
    plain Poisson at the same data, and the AIC difference that
    charges ZIP for its extra parameter. Moment fits can look
    better by construction; the AIC read is the honest one — a
    positive aic_delta says the off-switch parameter pays for
    itself in fit, zero-ish says [[zip_fit_hourly_purchases]]'s π
    is absorbing noise. Both likelihoods are exact sums over the
    count-of-counts histogram (k·lnλ − λ − lgamma(k+1) per cell —
    never per hour), so the referee costs O(distinct counts) on
    both engines. When the moment fit is degenerate (s² ≤ m) the
    ZIP collapses to its π = 0, λ = m Poisson limit, making
    llr = 0 and aic_delta = −2 — the penalty with nothing bought,
    which is itself the verdict."""
    hh, n = _hour_purchase_hist(sf_dir)
    zf = zip_fit_hourly_purchases(sf_dir).iloc[0]
    from math import lgamma
    m = float(zf["mean_rate"])
    # recompute unrounded params (registered row rounds at 6dp)
    k = hh["k"].to_numpy(np.int64).astype(object)
    nk = hh["nk"].to_numpy(np.int64).astype(object)
    sy = int((nk * k).sum())
    syy = int((nk * k * k).sum())
    m = float(sy) / n
    s2 = float(n * syy - sy * sy) / (float(n) * (n - 1.0))
    if s2 > m and m > 0:
        lam = (s2 + m * m - m) / m
        pi = 1.0 - m / lam
    else:
        lam, pi = m, 0.0
    ll_p = ll_z = 0.0
    for kk, nn_ in zip(hh["k"], hh["nk"]):
        kk, nn_ = int(kk), int(nn_)
        ll_p += nn_ * (kk * np.log(m) - m - lgamma(kk + 1.0))
        if kk == 0:
            ll_z += nn_ * np.log(pi + (1.0 - pi) * np.exp(-lam))
        else:
            ll_z += nn_ * (np.log(1.0 - pi) + kk * np.log(lam)
                           - lam - lgamma(kk + 1.0))
    aic_delta = (2.0 * 1 - 2.0 * ll_p) - (2.0 * 2 - 2.0 * ll_z)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_hours": np.array([n], np.int64),
        "ll_poisson": [float(rha(ll_p, 6))],
        "ll_zip": [float(rha(ll_z, 6))],
        "llr": [float(rha(ll_z - ll_p, 6))],
        "aic_delta": [float(rha(aic_delta, 6))],
        "zip_wins_aic": np.array([1 if aic_delta > 0 else 0],
                                 np.int64)})


# ---------------------------------------------------------------------------
# Errors-in-variables: Deming regression + attenuation audit on the
# daily views/clicks pair
# ---------------------------------------------------------------------------

#: daily (views, clicks) integer moments over the zero-filled calendar
#: (the granger/crosscorr calendar idiom), n·Σ−ΣΣ scaled, exact.
_VC_MOM_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y
      FROM cal LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS sx,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(x * x) AS HUGEINT) AS sxx,
              CAST(SUM(y * y) AS HUGEINT) AS syy,
              CAST(SUM(x * y) AS HUGEINT) AS sxy
       FROM g),
cm AS (SELECT CAST(n AS BIGINT) AS n,
              CAST(sx AS DOUBLE) / n AS mx,
              CAST(sy AS DOUBLE) / n AS my,
              CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
              CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
              CAST(n * sxy - sx * sy AS DOUBLE) AS cxy
       FROM mo)"""


@register("deming_regression_views_clicks", sql=f"""
WITH {_VC_MOM_SQL},
dm AS (SELECT n, mx, my, cxy,
              cxy / cxx AS b_ols,
              (cyy - cxx + SQRT((cyy - cxx) * (cyy - cxx)
                                + 4.0 * cxy * cxy))
                  / (2.0 * cxy) AS b_dem,
              CASE WHEN cxy >= 0 THEN SQRT(cyy / cxx)
                   ELSE -SQRT(cyy / cxx) END AS b_rma
       FROM cm WHERE cxy != 0)
SELECT n AS n_days,
       ROUND(b_ols, 6) AS slope_ols,
       ROUND(b_dem, 6) AS slope_deming,
       ROUND(b_rma, 6) AS slope_rma,
       ROUND(my - b_dem * mx, 6) AS intercept_deming,
       ROUND(b_ols / b_dem, 6) AS ols_over_deming
FROM dm""")
def deming_regression_views_clicks(sf_dir: str) -> pd.DataFrame:
    """Deming (λ=1 errors-in-variables) regression of daily clicks
    on daily views, beside OLS and the reduced-major-axis slope.
    Every OLS fit in this registry treats its x as measured
    without error; daily VIEW counts are themselves noisy
    realizations of demand, and OLS attenuates the slope by the
    reliability ratio while Deming's closed form
    β = (Syy−Sxx+√((Syy−Sxx)²+4Sxy²))/2Sxy splits the noise
    symmetrically. The three slopes bracket the truth under their
    respective error models (OLS: all noise in y; RMA: variance
    ratio = slope; Deming λ=1: equal noise), so a downstream
    'clicks per view' coefficient should be quoted as the OLS–
    Deming range, not a point. Five exact HUGEINT moments off the
    zero-filled calendar; identical float expressions; the
    degenerate Sxy = 0 day-pattern emits no row on both engines."""
    g = _dayvec(sf_dir)
    n = len(g)
    x = g["x"].to_numpy(np.int64).astype(object)
    y = g["y"].to_numpy(np.int64).astype(object)
    sx, sy = int(x.sum()), int(y.sum())
    cxx = float(n * int((x * x).sum()) - sx * sx)
    cyy = float(n * int((y * y).sum()) - sy * sy)
    cxy = float(n * int((x * y).sum()) - sx * sy)
    if cxy == 0:
        return pd.DataFrame(columns=[
            "n_days", "slope_ols", "slope_deming", "slope_rma",
            "intercept_deming", "ols_over_deming"])
    b_ols = cxy / cxx
    b_dem = (cyy - cxx + np.sqrt((cyy - cxx) * (cyy - cxx)
                                 + 4.0 * cxy * cxy)) / (2.0 * cxy)
    b_rma = np.sqrt(cyy / cxx) if cxy >= 0 \
        else -np.sqrt(cyy / cxx)
    mx, my = float(sx) / n, float(sy) / n
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "slope_ols": [float(rha(b_ols, 6))],
        "slope_deming": [float(rha(b_dem, 6))],
        "slope_rma": [float(rha(b_rma, 6))],
        "intercept_deming": [float(rha(my - b_dem * mx, 6))],
        "ols_over_deming": [float(rha(b_ols / b_dem, 6))]})


@register("attenuation_audit_views_clicks", sql=f"""
WITH {_VC_MOM_SQL},
au AS (SELECT n,
              cxy / cxx AS b_yx,
              cxy / cyy AS b_xy,
              (cxy / cxx) * (cxy / cyy) AS r2,
              (cyy - cxx + SQRT((cyy - cxx) * (cyy - cxx)
                                + 4.0 * cxy * cxy))
                  / (2.0 * cxy) AS b_dem
       FROM cm WHERE cxy != 0)
SELECT n AS n_days,
       ROUND(b_yx, 6) AS slope_y_on_x,
       ROUND(1.0 / b_xy, 6) AS inv_slope_x_on_y,
       ROUND(r2, 6) AS r2,
       ROUND(1.0 - b_yx / (1.0 / b_xy), 6) AS regression_gap,
       CAST(CASE WHEN (b_yx <= b_dem AND b_dem <= 1.0 / b_xy)
                      OR (1.0 / b_xy <= b_dem AND b_dem <= b_yx)
                 THEN 1 ELSE 0 END AS BIGINT) AS deming_bracketed,
       ROUND((1.0 - b_yx / b_dem) * 100.0, 6) AS attenuation_pct
FROM au""")
def attenuation_audit_views_clicks(sf_dir: str) -> pd.DataFrame:
    """The Frisch regression-bounds audit: the clicks~views OLS
    slope and the INVERSE of the views~clicks OLS slope bound
    every errors-in-variables slope from below and above, their
    product is exactly r², and regression_gap = 1 − r² is the
    width of ignorance measurement noise imposes — when it is
    wide, ANY single-slope causal claim between these series is
    underdetermined by the data, full stop. deming_bracketed
    verifies the λ=1 solution lands inside the Frisch bounds (an
    on-output consistency proof of the [[deming_regression_views_
    clicks]] algebra), and attenuation_pct prices how much of the
    naive slope a symmetric-noise model says is measurement
    artifact. Same five exact moments, one row."""
    g = _dayvec(sf_dir)
    n = len(g)
    x = g["x"].to_numpy(np.int64).astype(object)
    y = g["y"].to_numpy(np.int64).astype(object)
    sx, sy = int(x.sum()), int(y.sum())
    cxx = float(n * int((x * x).sum()) - sx * sx)
    cyy = float(n * int((y * y).sum()) - sy * sy)
    cxy = float(n * int((x * y).sum()) - sx * sy)
    if cxy == 0:
        return pd.DataFrame(columns=[
            "n_days", "slope_y_on_x", "inv_slope_x_on_y", "r2",
            "regression_gap", "deming_bracketed",
            "attenuation_pct"])
    b_yx = cxy / cxx
    b_xy = cxy / cyy
    b_dem = (cyy - cxx + np.sqrt((cyy - cxx) * (cyy - cxx)
                                 + 4.0 * cxy * cxy)) / (2.0 * cxy)
    inv = 1.0 / b_xy
    brack = 1 if ((b_yx <= b_dem <= inv) or (inv <= b_dem <= b_yx)) \
        else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "slope_y_on_x": [float(rha(b_yx, 6))],
        "inv_slope_x_on_y": [float(rha(inv, 6))],
        "r2": [float(rha(b_yx * b_xy, 6))],
        "regression_gap": [float(rha(1.0 - b_yx / inv, 6))],
        "deming_bracketed": np.array([brack], np.int64),
        "attenuation_pct": [float(rha((1.0 - b_yx / b_dem)
                                      * 100.0, 6))]})


# ---------------------------------------------------------------------------
# Distributed-lag models: Koyck adstock (MoM) + Almon polynomial lag
# ---------------------------------------------------------------------------

@register("koyck_adstock_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                ELSE 0 END) AS BIGINT) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, COALESCE(e.v, 0) AS v,
             COALESCE(e.y, 0) AS y
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(v) AS HUGEINT) AS sv,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(v * v) AS HUGEINT) AS svv
       FROM g),
cc AS (SELECT l.h,
              CAST(SUM((mo.n * a.v - mo.sv)
                       * (mo.n * b.y - mo.sy)) AS DOUBLE) AS c
       FROM (SELECT UNNEST([0, 1, 2]) AS h) l
       JOIN g a ON TRUE JOIN g b ON b.i = a.i + l.h, mo
       GROUP BY l.h),
par AS (SELECT (SELECT CAST(n AS BIGINT) FROM mo) AS n,
               (SELECT c FROM cc WHERE h = 0) AS c0,
               (SELECT c FROM cc WHERE h = 1) AS c1,
               (SELECT c FROM cc WHERE h = 2) AS c2,
               (SELECT CAST(n * svv - sv * sv AS DOUBLE)
                FROM mo) AS cvv),
f AS (SELECT n, c0, c1, cvv,
             CASE WHEN c1 != 0 THEN c2 / c1 ELSE 0 END AS lam
      FROM par)
SELECT n AS n_days,
       ROUND(lam, 6) AS lambda,
       CAST(CASE WHEN lam > 0 AND lam < 1 THEN 1 ELSE 0 END
            AS BIGINT) AS fit_ok,
       ROUND(CASE WHEN lam > 0 AND lam < 1
                  THEN LN(0.5) / LN(lam) ELSE 0 END, 6)
           AS half_life_days,
       ROUND(CASE WHEN lam > 0 AND lam < 1
                  THEN 1.0 / (1.0 - lam) ELSE 0 END, 6)
           AS carryover_mult,
       ROUND(c0 / cvv, 6) AS beta_immediate
FROM f""")
def koyck_adstock_daily(sf_dir: str) -> pd.DataFrame:
    """Koyck geometric-adstock identification by method of moments:
    under y_t = α + βΣλᵏv_{t−k} + noise with weakly dependent v,
    the view→purchase cross-covariance decays geometrically, so
    λ̂ = ccov(2)/ccov(1) — the carryover rate read directly off
    two lags of the cross-covariance the registry's crosscorr
    query already draws. λ converts to the two numbers media
    planning runs on: half_life_days (how long a view keeps
    paying) and carryover_mult = 1/(1−λ) (total effect per unit
    of immediate effect — the factor last-click measurement
    underbills by). All three cross-covariances use the
    n·x−S integer scaling over the zero-filled calendar (exact
    HUGEINT before single divisions); fit_ok guards λ outside
    (0,1), where the geometric model is self-declared wrong."""
    g = _dayvec_vy(sf_dir)
    n = len(g)
    v = g["v"].to_numpy(np.int64).astype(object)
    y = g["y"].to_numpy(np.int64).astype(object)
    sv, sy = int(v.sum()), int(y.sum())
    zv = n * v - sv
    zy = n * y - sy
    cc = [float((zv[:len(zv) - h if h else None]
                 * (zy[h:] if h else zy)).sum())
          for h in (0, 1, 2)]
    cvv = float(n * int((v * v).sum()) - sv * sv)
    lam = cc[2] / cc[1] if cc[1] != 0 else 0.0
    ok = 1 if 0 < lam < 1 else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "lambda": [float(rha(lam, 6))],
        "fit_ok": np.array([ok], np.int64),
        "half_life_days": [float(rha(np.log(0.5) / np.log(lam),
                                     6)) if ok else 0.0],
        "carryover_mult": [float(rha(1.0 / (1.0 - lam), 6))
                           if ok else 0.0],
        "beta_immediate": [float(rha(cc[0] / cvv, 6))]})


def _dayvec_vy(sf_dir: str) -> pd.DataFrame:
    """Zero-filled daily (i, v=views, y=purchases)."""
    g = _dayvec(sf_dir)
    return pd.DataFrame({
        "i": np.arange(len(g), dtype=np.int64),
        "v": g["x"].to_numpy(np.int64),
        "y": g["z"].to_numpy(np.int64)})


@register("almon_lag_views_purchases", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                ELSE 0 END) AS BIGINT) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, COALESCE(e.v, 0) AS v,
             COALESCE(e.y, 0) AS y
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
zz AS (SELECT a.i, MAX(a.y) AS y,
              CAST(SUM(b.v) AS BIGINT) AS z0,
              CAST(SUM((a.i - b.i) * b.v) AS BIGINT) AS z1,
              CAST(SUM((a.i - b.i) * (a.i - b.i) * b.v)
                   AS BIGINT) AS z2
       FROM g a JOIN g b ON b.i BETWEEN a.i - 6 AND a.i
       WHERE a.i >= 6 GROUP BY a.i),
mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(z0) AS HUGEINT) AS s0,
              CAST(SUM(z1) AS HUGEINT) AS s1,
              CAST(SUM(z2) AS HUGEINT) AS s2,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(z0 * z0) AS HUGEINT) AS s00,
              CAST(SUM(z0 * z1) AS HUGEINT) AS s01,
              CAST(SUM(z0 * z2) AS HUGEINT) AS s02,
              CAST(SUM(z1 * z1) AS HUGEINT) AS s11,
              CAST(SUM(z1 * z2) AS HUGEINT) AS s12,
              CAST(SUM(z2 * z2) AS HUGEINT) AS s22,
              CAST(SUM(z0 * y) AS HUGEINT) AS sy0,
              CAST(SUM(z1 * y) AS HUGEINT) AS sy1,
              CAST(SUM(z2 * y) AS HUGEINT) AS sy2
       FROM zz),
cv AS (SELECT CAST(n AS BIGINT) AS n,
              CAST(n * s00 - s0 * s0 AS DOUBLE) AS a,
              CAST(n * s11 - s1 * s1 AS DOUBLE) AS b,
              CAST(n * s22 - s2 * s2 AS DOUBLE) AS c,
              CAST(n * s01 - s0 * s1 AS DOUBLE) AS f,
              CAST(n * s02 - s0 * s2 AS DOUBLE) AS gg,
              CAST(n * s12 - s1 * s2 AS DOUBLE) AS h,
              CAST(n * sy0 - s0 * sy AS DOUBLE) AS r0,
              CAST(n * sy1 - s1 * sy AS DOUBLE) AS r1,
              CAST(n * sy2 - s2 * sy AS DOUBLE) AS r2
       FROM mo),
sol AS (SELECT n,
               a * (b * c - h * h) - f * (f * c - h * gg)
               + gg * (f * h - b * gg) AS det,
               r0 * (b * c - h * h) + r1 * (gg * h - f * c)
               + r2 * (f * h - b * gg) AS n0,
               r0 * (gg * h - f * c) + r1 * (a * c - gg * gg)
               + r2 * (f * gg - a * h) AS n1,
               r0 * (f * h - b * gg) + r1 * (f * gg - a * h)
               + r2 * (a * b - f * f) AS n2
        FROM cv),
ks AS (SELECT CAST(UNNEST(generate_series(0, 6)) AS BIGINT) AS k)
SELECT ks.k AS lag,
       ROUND((n0 + n1 * ks.k + n2 * ks.k * ks.k) / det, 6)
           AS weight,
       ROUND((7 * n0 + 21 * n1 + 91 * n2) / det, 6)
           AS total_effect,
       (SELECT CAST(k2.k AS BIGINT)
        FROM ks k2, sol s2
        ORDER BY ROUND((s2.n0 + s2.n1 * k2.k
                        + s2.n2 * k2.k * k2.k) / s2.det, 6) DESC,
                 k2.k LIMIT 1) AS peak_lag
FROM ks, sol ORDER BY ks.k""")
def almon_lag_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Almon polynomial distributed lag: purchases regressed on the
    past week of views with the 7 lag weights constrained to a
    quadratic w_k = c₀+c₁k+c₂k² — 3 parameters instead of 7, the
    classical fix for the collinearity that makes unconstrained
    lag regressions explode. Where [[koyck_adstock_daily]] FORCES
    monotone geometric decay, Almon lets the data choose a hump —
    peak_lag > 0 is purchase latency no geometric model can
    express (the crosscorr query suggests it; this fits it), and
    total_effect = Σw_k is the week-long multiplier. The trick:
    the constraint collapses the design to 3 integer-valued
    regressors (lag-weighted view sums), so the whole fit is a
    closed-form 3×3 adjugate solve over exact n·Σ−ΣΣ HUGEINT
    moments — same machinery as the Mahalanobis family, no linear
    algebra library anywhere. Complete 7-day windows only
    (t ≥ 6); weights round at 6dp before the peak argmax with
    smallest-lag ties."""
    g = _dayvec_vy(sf_dir)
    n_all = len(g)
    v = g["v"].to_numpy(np.int64)
    y = g["y"].to_numpy(np.int64)
    rows = []
    for t in range(6, n_all):
        w = v[t - 6:t + 1][::-1]
        k = np.arange(7, dtype=np.int64)
        rows.append((int(y[t]), int(w.sum()), int((k * w).sum()),
                     int((k * k * w).sum())))
    n = len(rows)
    yv = np.array([r[0] for r in rows], np.int64).astype(object)
    z = [np.array([r[j] for r in rows], np.int64).astype(object)
         for j in (1, 2, 3)]
    s = [int(zz.sum()) for zz in z]
    sy = int(yv.sum())
    cm = {}
    for (nm, i, j) in [("a", 0, 0), ("b", 1, 1), ("c", 2, 2),
                       ("f", 0, 1), ("gg", 0, 2), ("h", 1, 2)]:
        cm[nm] = float(n * int((z[i] * z[j]).sum()) - s[i] * s[j])
    r = [float(n * int((z[i] * yv).sum()) - s[i] * sy)
         for i in range(3)]
    a, b, c = cm["a"], cm["b"], cm["c"]
    f, gg, h = cm["f"], cm["gg"], cm["h"]
    det = a * (b * c - h * h) - f * (f * c - h * gg) \
        + gg * (f * h - b * gg)
    n0 = r[0] * (b * c - h * h) + r[1] * (gg * h - f * c) \
        + r[2] * (f * h - b * gg)
    n1 = r[0] * (gg * h - f * c) + r[1] * (a * c - gg * gg) \
        + r[2] * (f * gg - a * h)
    n2 = r[0] * (f * h - b * gg) + r[1] * (f * gg - a * h) \
        + r[2] * (a * b - f * f)
    rha = textstats.round_half_away
    ww = [float(rha((n0 + n1 * k + n2 * k * k) / det, 6))
          for k in range(7)]
    tot = float(rha((7 * n0 + 21 * n1 + 91 * n2) / det, 6))
    peak = int(np.lexsort((np.arange(7), -np.array(ww)))[0])
    return pd.DataFrame({
        "lag": np.arange(7, dtype=np.int64),
        "weight": ww,
        "total_effect": tot,
        "peak_lag": np.int64(peak)})


# ---------------------------------------------------------------------------
# Benford practitioner closures: Nigrini MAD conformity + distortion
# factor on order totals
# ---------------------------------------------------------------------------

@register("benford_mad_conformity_orders", sql="""
WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100,
                              0) AS BIGINT) AS VARCHAR), 1, 1)
                       AS BIGINT) AS digit
           FROM orders
           WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
lat AS (SELECT CAST(r.range AS BIGINT) AS digit,
               COALESCE(c.n, 0) AS n
        FROM range(1, 10) r LEFT JOIN c ON c.digit = r.range),
dev AS (SELECT SUM(ABS(CAST(n AS DOUBLE) / t.tot
                       - LN(1.0 + 1.0 / digit) / LN(10.0)))
            / 9.0 AS mad,
               SUM(POWER(CAST(n AS DOUBLE)
                         - t.tot * (LN(1.0 + 1.0 / digit)
                                    / LN(10.0)), 2)
                   / (t.tot * (LN(1.0 + 1.0 / digit)
                               / LN(10.0)))) AS chi2
        FROM lat, t)
SELECT t.tot AS n, ROUND(dev.mad, 6) AS mad,
       ROUND(dev.chi2, 6) AS chi2,
       CAST(CASE WHEN dev.chi2 > 15.507313 THEN 1 ELSE 0 END
            AS BIGINT) AS chi2_rejected,
       CASE WHEN dev.mad < 0.006 THEN 'close'
            WHEN dev.mad < 0.012 THEN 'acceptable'
            WHEN dev.mad < 0.015 THEN 'marginal'
            ELSE 'nonconformity' END AS conformity
FROM dev, t""")
def benford_mad_conformity_orders(sf_dir: str) -> pd.DataFrame:
    """Nigrini's MAD conformity verdict for the first digits of
    order totals, printed BESIDE the χ² the registry's Benford
    family uses — because the two disagree by design at scale:
    χ² grows linearly with n, so at 10⁹ orders it rejects every
    real dataset ('the excess-power problem'), while
    MAD = mean|obs−exp| is scale-FREE and Nigrini's published
    bands (<.006 close, <.012 acceptable, <.015 marginal) are the
    audit-practice standard. chi2_rejected=1 with
    conformity='close' is the expected large-n reading and is
    precisely why an auditor must not ship the χ² number alone.
    Digits come from the exact cent integer's decimal string (no
    float log); the 9-cell lattice zero-fills so absent digits
    deviate by their full expectation on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(np.float64)
                    * 100).astype(np.int64)
        c = c[c > 0]
        dig = np.array([int(str(v)[0]) for v in c], np.int64)
        return pd.DataFrame({"digit": dig}).groupby(
            "digit").size().reset_index(name="n") \
            .astype(np.int64)

    c = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["digit"], {"n": ("n", "sum")}).to_pandas()
    lat = pd.DataFrame({"digit": np.arange(1, 10,
                                           dtype=np.int64)}) \
        .merge(c, on="digit", how="left").fillna(0)
    n = lat["n"].to_numpy(np.float64)
    tot = float(n.sum())
    exp = np.log(1.0 + 1.0 / lat["digit"].to_numpy(np.float64)) \
        / np.log(10.0)
    mad = float(np.abs(n / tot - exp).sum()) / 9.0
    chi2 = float(((n - tot * exp) ** 2 / (tot * exp)).sum())
    band = "close" if mad < 0.006 else \
        "acceptable" if mad < 0.012 else \
        "marginal" if mad < 0.015 else "nonconformity"
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([int(tot)], np.int64),
        "mad": [float(rha(mad, 6))],
        "chi2": [float(rha(chi2, 6))],
        "chi2_rejected": np.array(
            [1 if chi2 > 15.507313 else 0], np.int64),
        "conformity": [band]})


@register("benford_distortion_factor_orders", sql="""
WITH v AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
               AS c
           FROM orders
           WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 >= 10),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS DOUBLE)
                 / POWER(10, LENGTH(CAST(c AS VARCHAR)) - 2))
                 AS sc
      FROM v),
f AS (SELECT n, sc / n AS am, 90.0 / LN(10.0) AS em FROM m)
SELECT n, ROUND(am, 6) AS actual_mean,
       ROUND(em, 6) AS expected_mean,
       ROUND((am - em) / em * 100.0, 6) AS distortion_pct,
       CASE WHEN am < em THEN 'understated'
            WHEN am > em THEN 'overstated'
            ELSE 'neutral' END AS direction
FROM f""")
def benford_distortion_factor_orders(sf_dir: str) -> pd.DataFrame:
    """Nigrini's distortion factor: collapse every order total to
    its two-digit mantissa (c/10^(digits−2) ∈ [10,100)) and
    compare the mean against the Benford expectation
    90/ln10 ≈ 39.0865. Where digit tests ask 'does the SHAPE
    conform', DF asks the dollar question digit tests can't:
    are the numbers systematically nudged low or high WITHIN
    their magnitude — the classic signatures being understated
    (just-below-threshold invoices, skimmed revenue) vs
    overstated figures, with distortion_pct the estimated average
    nudge in percent. The mantissa uses the cent integer's
    decimal length — no float log10, so powers of ten can't
    misclassify; values below 10 cents (no 2-digit mantissa)
    are excluded identically on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(np.float64)
                    * 100).astype(np.int64)
        c = c[c >= 10]
        sc = np.array([v / 10.0 ** (len(str(v)) - 2)
                       for v in c], np.float64)
        return pd.DataFrame({"n": [len(c)], "sc": [float(sc.sum())]})

    m = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"]) \
        .map_batches(prep, batch_format="pandas").to_pandas()
    n = int(m["n"].sum())
    sc = float(m["sc"].sum())
    am = sc / n
    em = 90.0 / np.log(10.0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "actual_mean": [float(rha(am, 6))],
        "expected_mean": [float(rha(em, 6))],
        "distortion_pct": [float(rha((am - em) / em * 100.0, 6))],
        "direction": ["understated" if am < em else
                      "overstated" if am > em else "neutral"]})


# ---------------------------------------------------------------------------
# Restricted mean survival time by first-touch cohort (weekend vs
# weekday first event), time to first purchase
# ---------------------------------------------------------------------------

#: per-cohort KM life tables for time-to-first-purchase, cohort =
#: weekday-ness of the user's FIRST event day; censoring at last seen
#: day; S(u) carried forward onto the 0..13 day grid for RMST(14).
_RMST_SQL = """
pu AS (SELECT user_id,
              MIN(epoch_us(ts) // 86400000000) AS fd,
              MAX(epoch_us(ts) // 86400000000) AS ld,
              MIN(CASE WHEN event_type = 'purchase'
                       THEN epoch_us(ts) // 86400000000 END) AS pd
       FROM events GROUP BY 1),
ev AS (SELECT CASE WHEN (fd + 4) % 7 IN (0, 6) THEN 'weekend'
                   ELSE 'weekday' END AS cohort,
              CASE WHEN pd IS NOT NULL THEN pd - fd
                   ELSE ld - fd END AS t,
              CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ep
       FROM pu),
lt AS (SELECT cohort, t,
              CAST(SUM(ep) AS BIGINT) AS dth,
              CAST(SUM(1 - ep) AS BIGINT) AS cen
       FROM ev GROUP BY 1, 2),
tot AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n
        FROM ev GROUP BY 1),
ar AS (SELECT lt.cohort, lt.t, lt.dth,
              tot.n - COALESCE(SUM(lt.dth + lt.cen)
                  OVER (PARTITION BY lt.cohort ORDER BY lt.t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS rsk
       FROM lt JOIN tot USING (cohort)),
sv AS (SELECT cohort, t,
              PRODUCT(1.0 - CAST(dth AS DOUBLE) / rsk)
                  OVER (PARTITION BY cohort ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS s
       FROM ar),
grid AS (SELECT tot.cohort, CAST(r.range AS BIGINT) AS u
         FROM range(0, 14) r, tot),
su AS (SELECT grid.cohort, grid.u,
              COALESCE((SELECT s FROM sv
                        WHERE sv.cohort = grid.cohort
                          AND sv.t <= grid.u
                        ORDER BY sv.t DESC LIMIT 1), 1.0) AS s
       FROM grid)"""


@register("rmst_first_purchase_cohorts", sql=f"""
WITH {_RMST_SQL},
ag AS (SELECT cohort, SUM(s) AS rmst FROM su GROUP BY 1),
ct AS (SELECT ev.cohort,
              CAST(SUM(CASE WHEN ep = 1 AND t < 14 THEN 1
                            ELSE 0 END) AS BIGINT) AS events14
       FROM ev GROUP BY 1)
SELECT tot.cohort, tot.n AS n_users, ct.events14,
       ROUND(ag.rmst, 6) AS rmst14_days
FROM tot JOIN ag USING (cohort) JOIN ct USING (cohort)
ORDER BY cohort""")
def rmst_first_purchase_cohorts(sf_dir: str) -> pd.DataFrame:
    """Restricted mean survival time to first purchase at τ=14 days
    per first-touch cohort (users whose FIRST event fell on a
    weekend vs a weekday). RMST = ∫₀^τ S(u)du is the
    estimand the survival-methods literature now recommends OVER
    hazard ratios: it is the average purchase-free days in the
    first two weeks, a number with units a PM can act on, and it
    stays valid when hazards cross (where a hazard ratio is
    uninterpretable). Low RMST = faster conversion. KM products
    multiply in ascending-day order on both engines; S carries
    forward onto the fixed 0..13 grid so the integral is a plain
    14-term sum; cohort assignment uses (epoch_day+4)%7."""
    lt = _rmst_tables(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for cohort, (n, ev14, su) in sorted(lt.items()):
        rows.append((cohort, n, ev14, float(rha(su.sum(), 6))))
    return pd.DataFrame(rows, columns=[
        "cohort", "n_users", "events14", "rmst14_days"]) \
        .astype({"n_users": np.int64, "events14": np.int64})


def _rmst_tables(sf_dir: str):
    """{cohort: (n_users, events<14, S(u) array u=0..13)}."""
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
    coh = np.where(((fd + 4) % 7 == 0) | ((fd + 4) % 7 == 6),
                   "weekend", "weekday")
    out = {}
    for c in ("weekday", "weekend"):
        m = coh == c
        if not m.any():
            continue
        tc, ec = t[m], ep[m]
        n = int(m.sum())
        lt = pd.DataFrame({"t": tc, "dth": ec, "cen": 1 - ec}) \
            .groupby("t", as_index=False).sum() \
            .sort_values("t", ignore_index=True)
        gone = (lt["dth"] + lt["cen"]).cumsum().shift(
            1, fill_value=0).to_numpy(np.int64)
        rsk = n - gone
        fac = 1.0 - lt["dth"].to_numpy(np.float64) / rsk
        s = np.cumprod(fac)
        ts = lt["t"].to_numpy(np.int64)
        su = np.ones(14, np.float64)
        for u in range(14):
            idx = np.searchsorted(ts, u, side="right") - 1
            if idx >= 0:
                su[u] = s[idx]
        ev14 = int(((tc < 14) & (ec == 1)).sum())
        out[c] = (n, ev14, su)
    return out


@register("rmst_cohort_contrast", sql=f"""
WITH {_RMST_SQL},
ag AS (SELECT cohort, SUM(s) AS rmst FROM su GROUP BY 1),
med AS (SELECT cohort,
               COALESCE(MIN(CASE WHEN s <= 0.5 THEN t END), -1)
                   AS med_t
        FROM sv GROUP BY 1)
SELECT COALESCE((SELECT ROUND(rmst, 6) FROM ag
                 WHERE cohort = 'weekend'), 0.0) AS rmst_weekend,
       COALESCE((SELECT ROUND(rmst, 6) FROM ag
                 WHERE cohort = 'weekday'), 0.0) AS rmst_weekday,
       ROUND(COALESCE((SELECT rmst FROM ag
                       WHERE cohort = 'weekend'), 0.0)
             - COALESCE((SELECT rmst FROM ag
                         WHERE cohort = 'weekday'), 0.0), 6)
           AS rmst_diff,
       CAST(COALESCE((SELECT med_t FROM med
                      WHERE cohort = 'weekend'), -1) AS BIGINT)
           AS median_t_weekend,
       CAST(COALESCE((SELECT med_t FROM med
                      WHERE cohort = 'weekday'), -1) AS BIGINT)
           AS median_t_weekday""")
def rmst_cohort_contrast(sf_dir: str) -> pd.DataFrame:
    """The cohort contrast in one row: ΔRMST (weekend-first minus
    weekday-first purchase-free days over the first fortnight) and
    each cohort's median time-to-purchase (−1 = the KM curve never
    reaches 0.5 — the median DOESN'T EXIST, which is itself the
    common case in conversion data and the reason RMST, which
    always exists, is the right primary number). A negative
    rmst_diff says weekend acquirers convert faster; median rows
    flag when the popular 'median time to convert' metric is
    undefined and any dashboard printing one is interpolating
    fiction. Same life tables; KM medians use the smallest day
    with S ≤ 0.5."""
    lt = _rmst_tables(sf_dir)
    rha = textstats.round_half_away
    rms = {c: float(su.sum()) for c, (n, ev14, su) in lt.items()}
    meds = _rmst_medians(sf_dir)
    return pd.DataFrame({
        "rmst_weekend": [float(rha(rms.get("weekend", 0.0), 6))],
        "rmst_weekday": [float(rha(rms.get("weekday", 0.0), 6))],
        "rmst_diff": [float(rha(rms.get("weekend", 0.0)
                                - rms.get("weekday", 0.0), 6))],
        "median_t_weekend": np.array(
            [meds.get("weekend", -1)], np.int64),
        "median_t_weekday": np.array(
            [meds.get("weekday", -1)], np.int64)})


def _rmst_medians(sf_dir: str) -> dict:
    """Smallest event day with KM S <= 0.5 per cohort, -1 if never."""
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
    coh = np.where(((fd + 4) % 7 == 0) | ((fd + 4) % 7 == 6),
                   "weekend", "weekday")
    out = {}
    for c in ("weekday", "weekend"):
        m = coh == c
        if not m.any():
            continue
        lt = pd.DataFrame({"t": t[m], "dth": ep[m],
                           "cen": 1 - ep[m]}) \
            .groupby("t", as_index=False).sum() \
            .sort_values("t", ignore_index=True)
        n = int(m.sum())
        gone = (lt["dth"] + lt["cen"]).cumsum().shift(
            1, fill_value=0).to_numpy(np.int64)
        fac = 1.0 - lt["dth"].to_numpy(np.float64) / (n - gone)
        s = np.cumprod(fac)
        hit = np.where(s <= 0.5)[0]
        out[c] = int(lt["t"].iloc[hit[0]]) if len(hit) else -1
    return out


# ---------------------------------------------------------------------------
# Kleinberg two-state burst detection on the daily stream (exact
# Viterbi path via forward+backward costs — no backtracking table)
# ---------------------------------------------------------------------------

#: two-state automaton: base rate λ0 = mean daily count, burst rate
#: λ1 = 2λ0 (Kleinberg s = 2), entering a burst costs γ·ln(n) with
#: γ = 1, leaving is free. Day costs are Poisson NLL with the
#: state-independent lgamma(x+1) term dropped (cancels in every
#: comparison). The optimal path is recovered WITHOUT a backtracking
#: table: state*(t) = argmin_s fwd_s(t) + bwd_s(t), ties → state 0,
#: with the margin rounded at 9dp so both engines break identically.
_BURST_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS i,
             CAST(cal.d AS BIGINT) AS d,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
pr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS DOUBLE) / COUNT(*) AS l0,
              2.0 * (CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS l1,
              LN(CAST(COUNT(*) AS DOUBLE)) AS gam
       FROM g),
nl AS (SELECT g.i, g.d, g.x,
              pr.l0 - g.x * LN(pr.l0) AS n0,
              pr.l1 - g.x * LN(pr.l1) AS n1
       FROM g, pr),
fw AS (
  SELECT i, d, x, n0, n1,
         n0 AS f0, (SELECT gam FROM pr) + n1 AS f1
  FROM nl WHERE i = 0
  UNION ALL
  SELECT nl.i, nl.d, nl.x, nl.n0, nl.n1,
         LEAST(fw.f0, fw.f1) + nl.n0,
         LEAST(fw.f1, fw.f0 + (SELECT gam FROM pr)) + nl.n1
  FROM nl JOIN fw ON nl.i = fw.i + 1),
bw AS (
  SELECT i, CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1
  FROM nl WHERE i = (SELECT n - 1 FROM pr)
  UNION ALL
  SELECT nl.i,
         LEAST(bw.b0 + nx.n0,
               bw.b1 + (SELECT gam FROM pr) + nx.n1),
         LEAST(bw.b1 + nx.n1, bw.b0 + nx.n0)
  FROM nl JOIN bw ON nl.i = bw.i - 1
          JOIN nl nx ON nx.i = nl.i + 1),
st AS (SELECT fw.i, fw.d, fw.x,
              CASE WHEN ROUND((fw.f1 + bw.b1)
                              - (fw.f0 + bw.b0), 9) < 0
                   THEN 1 ELSE 0 END AS burst
       FROM fw JOIN bw ON fw.i = bw.i)"""


@register("kleinberg_burst_days", sql=f"""
WITH RECURSIVE {_BURST_SQL}
SELECT d AS epoch_day, x AS events,
       CAST(burst AS BIGINT) AS burst
FROM st WHERE burst = 1 ORDER BY d""")
def kleinberg_burst_days(sf_dir: str) -> pd.DataFrame:
    """Kleinberg (2002) two-state burst detection on the daily
    stream: the exact minimum-cost state path of an automaton that
    pays Poisson NLL at rate λ0 (quiet) or 2λ0 (burst) each day
    plus ln(n) to ENTER a burst. Unlike every thresholded anomaly
    query in the registry (z-scores, Grubbs, residual top-k),
    Kleinberg's answer is a globally optimal SEGMENTATION — one
    spike day can't open a burst unless it pays the entry toll,
    and adjacent hot days merge instead of alerting twice. The
    distributed trick is recovering the Viterbi path with NO
    backtracking table: state*(t) = argmin fwd+bwd, computed by
    two O(days) recursions that both engines run in the identical
    ascending/descending order (recursive CTE ↔ sequential loop),
    with the margin rounded at 9dp and ties to quiet. The
    state-independent lgamma term is dropped — it cancels in
    every comparison."""
    return _burst_path(sf_dir)[0]


@register("kleinberg_burst_intervals", sql=f"""
WITH RECURSIVE {_BURST_SQL},
bi AS (SELECT i, d, x,
              i - ROW_NUMBER() OVER (ORDER BY i) AS grp
       FROM st WHERE burst = 1),
iv AS (SELECT MIN(d) AS start_day, MAX(d) AS end_day,
              CAST(COUNT(*) AS BIGINT) AS len_days,
              CAST(SUM(x) AS BIGINT) AS events
       FROM bi GROUP BY grp)
SELECT CAST(start_day AS BIGINT) AS start_day,
       CAST(end_day AS BIGINT) AS end_day, len_days, events,
       ROUND((CAST(events AS DOUBLE) / len_days)
             / (SELECT l0 FROM pr), 6) AS rate_ratio
FROM iv ORDER BY start_day""")
def kleinberg_burst_intervals(sf_dir: str) -> pd.DataFrame:
    """The burst segmentation rolled into intervals
    (gaps-and-islands over the optimal state path): start/end day,
    length, events inside, and the realized rate ratio against
    the base rate. This is the table an incident review or a
    trending-topics pipeline actually consumes — 'the week of the
    14th ran 2.3× base for 6 days' — and rate_ratio ≫ 2 on a
    surviving interval means the burst was so strong even the
    conservative s=2 automaton understates it. Same exact
    forward/backward costs; interval math is pure integer
    arithmetic on the flagged days."""
    return _burst_path(sf_dir)[1]


def _burst_path(sf_dir: str):
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    l0 = float(x.sum()) / n
    l1 = 2.0 * l0
    gam = float(np.log(float(n)))
    n0 = l0 - x * np.log(l0)
    n1 = l1 - x * np.log(l1)
    f0 = np.empty(n)
    f1 = np.empty(n)
    f0[0] = n0[0]
    f1[0] = gam + n1[0]
    for t in range(1, n):
        f0[t] = min(f0[t - 1], f1[t - 1]) + n0[t]
        f1[t] = min(f1[t - 1], f0[t - 1] + gam) + n1[t]
    b0 = np.zeros(n)
    b1 = np.zeros(n)
    for t in range(n - 2, -1, -1):
        b0[t] = min(b0[t + 1] + n0[t + 1],
                    b1[t + 1] + gam + n1[t + 1])
        b1[t] = min(b1[t + 1] + n1[t + 1], b0[t + 1] + n0[t + 1])
    rha = textstats.round_half_away
    margin = rha((f1 + b1) - (f0 + b0), 9)
    burst = np.asarray(margin) < 0
    # epoch days: reconstruct from the daily reduce bounds
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas()
    lo = int(daily["d"].min())
    days = np.arange(lo, lo + n, dtype=np.int64)
    path = pd.DataFrame({
        "epoch_day": days[burst],
        "events": x[burst].astype(np.int64),
        "burst": np.ones(int(burst.sum()), np.int64)})
    ivs = []
    t = 0
    while t < n:
        if burst[t]:
            s = t
            while t + 1 < n and burst[t + 1]:
                t += 1
            ev = int(x[s:t + 1].sum())
            ln_ = t - s + 1
            ivs.append((int(days[s]), int(days[t]), ln_, ev,
                        float(rha((ev / ln_) / l0, 6))))
        t += 1
    intervals = pd.DataFrame(ivs, columns=[
        "start_day", "end_day", "len_days", "events",
        "rate_ratio"])
    if len(ivs):
        intervals = intervals.astype({
            "start_day": np.int64, "end_day": np.int64,
            "len_days": np.int64, "events": np.int64})
    return path, intervals


# ---------------------------------------------------------------------------
# Exact multi-changepoint segmentation of the daily series + BIC
# regime-count selection (the "how many regimes" question the
# single-break family can't answer)
# ---------------------------------------------------------------------------

#: prefix sums of the zero-filled daily counts; segment SSE in the
#: closed form (S2j−S2i) − (Sj−Si)²/(j−i) so the exhaustive scan
#: never touches raw rows. Calendar-bounded: n = days, the O(n²)
#: breakpoint scan is exact and small at any event volume.
_SEG_SQL = """
e AS (SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT CAST(cal.d - sp.lo AS BIGINT) AS i,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
ps AS (SELECT i + 1 AS p,
              CAST(SUM(x) OVER (ORDER BY i) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) OVER (ORDER BY i)
                   AS HUGEINT) AS s2
       FROM g
       UNION ALL SELECT 0, 0, 0),
seg AS (SELECT a.p AS i, b.p AS j,
               CAST(b.s2 - a.s2 AS DOUBLE)
               - CAST((b.s - a.s) * (b.s - a.s) AS DOUBLE)
                 / (b.p - a.p) AS sse,
               CAST(b.s - a.s AS DOUBLE) / (b.p - a.p) AS mu
        FROM ps a JOIN ps b ON b.p > a.p)"""


@register("optimal_2cp_segmentation_daily", sql=f"""
WITH {_SEG_SQL},
two AS (SELECT s1.j AS a, s2.j AS b,
               s1.sse + s2.sse + s3.sse AS sse,
               s1.mu AS m1, s2.mu AS m2, s3.mu AS m3
        FROM seg s1
        JOIN seg s2 ON s2.i = s1.j
        JOIN seg s3 ON s3.i = s2.j, nn
        WHERE s1.i = 0 AND s3.j = nn.n),
best AS (SELECT * FROM two
         ORDER BY ROUND(sse, 9), a, b LIMIT 1),
flat AS (SELECT sse FROM seg, nn WHERE i = 0 AND j = nn.n)
SELECT (SELECT CAST(lo + a AS BIGINT) FROM best, sp) AS break1_day,
       (SELECT CAST(lo + b AS BIGINT) FROM best, sp) AS break2_day,
       ROUND((SELECT m1 FROM best), 6) AS mean_seg1,
       ROUND((SELECT m2 FROM best), 6) AS mean_seg2,
       ROUND((SELECT m3 FROM best), 6) AS mean_seg3,
       ROUND((SELECT sse FROM best), 6) AS sse3,
       ROUND(1.0 - (SELECT sse FROM best) / (SELECT sse FROM flat),
             6) AS var_explained""")
def optimal_2cp_segmentation_daily(sf_dir: str) -> pd.DataFrame:
    """GLOBALLY optimal 2-changepoint (3-regime) least-squares
    segmentation of the daily series by exhaustive scan — the
    registry's break tests (Pettitt, Chow, SNHT, Buishand) each
    find ONE break and inherit masking bias when there are two
    (a rise-then-fall can test as 'no break' because the halves
    average out); the exact O(n²) scan over both breakpoints has
    no such failure mode, and n is CALENDAR days, so exhaustive
    stays cheap at any event volume. Segment SSEs come from the
    closed prefix-sum form (S2ⱼ−S2ᵢ)−(Sⱼ−Sᵢ)²/(j−i) — exact
    HUGEINT sums, one float division per candidate segment —
    and the argmin rounds SSE at 9dp with lexicographic
    breakpoint ties, identical on both engines. var_explained
    against the flat model sizes the regimes."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    lo = _seg_lo(sf_dir)
    s = np.concatenate([[0], np.cumsum(x.astype(object))])
    s2 = np.concatenate([[0], np.cumsum((x.astype(object)
                                         * x.astype(object)))])

    def sse(i, j):
        return float(int(s2[j] - s2[i])) \
            - float(int((s[j] - s[i]) * (s[j] - s[i]))) / (j - i)

    rha = textstats.round_half_away
    best = None
    for a in range(1, n - 1):
        for b in range(a + 1, n):
            v = float(rha(sse(0, a) + sse(a, b) + sse(b, n), 9))
            key = (v, a, b)
            if best is None or key < best:
                best = key
    v, a, b = best
    flat = sse(0, n)
    return pd.DataFrame({
        "break1_day": np.array([lo + a], np.int64),
        "break2_day": np.array([lo + b], np.int64),
        "mean_seg1": [float(rha(float(int(s[a] - s[0])) / a, 6))],
        "mean_seg2": [float(rha(float(int(s[b] - s[a]))
                                / (b - a), 6))],
        "mean_seg3": [float(rha(float(int(s[n] - s[b]))
                                / (n - b), 6))],
        "sse3": [float(rha(sse(0, a) + sse(a, b) + sse(b, n), 6))],
        "var_explained": [float(rha(
            1.0 - (sse(0, a) + sse(a, b) + sse(b, n)) / flat, 6))]})


def _seg_lo(sf_dir: str) -> int:
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas()
    return int(daily["d"].min())


@register("segment_count_bic_daily", sql=f"""
WITH {_SEG_SQL},
k1 AS (SELECT 1 AS k, sse FROM seg, nn WHERE i = 0 AND j = nn.n),
k2 AS (SELECT 2 AS k, MIN(ROUND(s1.sse + s2.sse, 9)) AS sse
       FROM seg s1 JOIN seg s2 ON s2.i = s1.j, nn
       WHERE s1.i = 0 AND s2.j = nn.n),
k3 AS (SELECT 3 AS k, MIN(ROUND(s1.sse + s2.sse + s3.sse, 9))
           AS sse
       FROM seg s1 JOIN seg s2 ON s2.i = s1.j
                   JOIN seg s3 ON s3.i = s2.j, nn
       WHERE s1.i = 0 AND s3.j = nn.n),
al AS (SELECT * FROM k1 UNION ALL SELECT * FROM k2
       UNION ALL SELECT * FROM k3),
bi AS (SELECT al.k, al.sse,
              nn.n * LN(al.sse / nn.n)
              + (2.0 * al.k - 1.0) * LN(CAST(nn.n AS DOUBLE))
                  AS bic
       FROM al, nn),
ch AS (SELECT k FROM bi ORDER BY ROUND(bic, 9), k LIMIT 1)
SELECT CAST(bi.k AS BIGINT) AS k, ROUND(bi.sse, 6) AS sse,
       ROUND(bi.bic, 6) AS bic,
       CAST(CASE WHEN bi.k = (SELECT k FROM ch) THEN 1 ELSE 0 END
            AS BIGINT) AS chosen
FROM bi ORDER BY bi.k""")
def segment_count_bic_daily(sf_dir: str) -> pd.DataFrame:
    """BIC model selection over 1, 2 and 3 mean-regimes for the
    daily series: each k's GLOBALLY optimal SSE (exhaustive, same
    prefix-sum closed form) scored by n·ln(SSE/n) + (2k−1)·ln n
    (k means + k−1 breakpoints — convention documented). This is
    the referee the changepoint family needs: a significant
    Pettitt break AND k=1 chosen here means the break exists but
    is too small to earn its parameters; k=3 chosen certifies the
    rise-then-fall shape that single-break tests mask on. Per-k
    SSEs round at 9dp before the min (and BIC before the argmin,
    smallest-k ties) so both engines pick identical models."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    s = np.concatenate([[0], np.cumsum(x.astype(object))])
    s2 = np.concatenate([[0], np.cumsum((x.astype(object)
                                         * x.astype(object)))])

    def sse(i, j):
        return float(int(s2[j] - s2[i])) \
            - float(int((s[j] - s[i]) * (s[j] - s[i]))) / (j - i)

    rha = textstats.round_half_away
    sse1 = float(rha(sse(0, n), 9))
    sse2 = min(float(rha(sse(0, a) + sse(a, n), 9))
               for a in range(1, n))
    sse3 = min(float(rha(sse(0, a) + sse(a, b) + sse(b, n), 9))
               for a in range(1, n - 1)
               for b in range(a + 1, n))
    rows = []
    bics = []
    for k, ssek in ((1, sse1), (2, sse2), (3, sse3)):
        bic = n * float(np.log(ssek / n)) \
            + (2.0 * k - 1.0) * float(np.log(float(n)))
        bics.append(float(rha(bic, 9)))
        rows.append((k, float(rha(ssek, 6)), float(rha(bic, 6))))
    chosen = int(np.lexsort((np.array([1, 2, 3]),
                             np.array(bics)))[0]) + 1
    return pd.DataFrame({
        "k": np.array([r[0] for r in rows], np.int64),
        "sse": [r[1] for r in rows],
        "bic": [r[2] for r in rows],
        "chosen": np.array([1 if r[0] == chosen else 0
                            for r in rows], np.int64)})


# ---------------------------------------------------------------------------
# Oaxaca–Blinder decomposition of the cross-segment value gap
# ---------------------------------------------------------------------------

#: per-user (events n, value cents) for the two alphabetically-first
#: market segments (AUTOMOBILE vs BUILDING — fixed, documented), with
#: per-group OLS of value on activity from exact integer moments.
_OAXACA_SQL = """
uv AS (SELECT e.user_id, c.c_mktsegment AS seg,
              CAST(COUNT(*) AS BIGINT) AS x,
              CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT))
                   AS BIGINT) AS y
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
       GROUP BY 1, 2),
gm AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS sx,
              CAST(SUM(y) AS HUGEINT) AS sy,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
              CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
       FROM uv GROUP BY 1),
fit AS (SELECT seg, n,
               CAST(sx AS DOUBLE) / n AS mx,
               CAST(sy AS DOUBLE) / n AS my,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
               END AS b
        FROM gm),
ab0 AS (SELECT
    (SELECT n FROM fit WHERE seg = 'AUTOMOBILE') AS na,
    (SELECT mx FROM fit WHERE seg = 'AUTOMOBILE') AS mxa,
    (SELECT my FROM fit WHERE seg = 'AUTOMOBILE') AS mya,
    (SELECT b FROM fit WHERE seg = 'AUTOMOBILE') AS ba,
    (SELECT n FROM fit WHERE seg = 'BUILDING') AS nb,
    (SELECT mx FROM fit WHERE seg = 'BUILDING') AS mxb,
    (SELECT my FROM fit WHERE seg = 'BUILDING') AS myb,
    (SELECT b FROM fit WHERE seg = 'BUILDING') AS bb),
ab AS (SELECT COALESCE(na, 0) AS na, COALESCE(mxa, 0.0) AS mxa,
              COALESCE(mya, 0.0) AS mya, COALESCE(ba, 0.0) AS ba,
              COALESCE(nb, 0) AS nb, COALESCE(mxb, 0.0) AS mxb,
              COALESCE(myb, 0.0) AS myb, COALESCE(bb, 0.0) AS bb
       FROM ab0)"""


@register("oaxaca_blinder_value_gap", sql=f"""
WITH {_OAXACA_SQL}
SELECT na AS n_automobile, nb AS n_building,
       ROUND((mya - myb) / 100.0, 6) AS gap,
       ROUND(bb * (mxa - mxb) / 100.0, 6) AS explained_ref_b,
       ROUND(((mya - ba * mxa) - (myb - bb * mxb)
              + (ba - bb) * mxa) / 100.0, 6) AS unexplained_ref_b,
       ROUND(ba * (mxa - mxb) / 100.0, 6) AS explained_ref_a,
       ROUND(((mya - ba * mxa) - (myb - bb * mxb)
              + (ba - bb) * mxb) / 100.0, 6) AS unexplained_ref_a,
       ROUND((ba * (mxa - mxb) - bb * (mxa - mxb)) / 100.0, 6)
           AS reference_sensitivity
FROM ab""")
def oaxaca_blinder_value_gap(sf_dir: str) -> pd.DataFrame:
    """Oaxaca–Blinder two-fold decomposition of the mean user-value
    gap between the AUTOMOBILE and BUILDING segments, with
    activity (event count) as the endowment: how much of the gap
    is because one segment's users simply DO more (explained,
    priced at the reference group's slope) versus earning
    differently per action (unexplained — the 'structure' term a
    segment-pricing decision acts on). Both reference choices are
    printed because the decomposition is index-number ambiguous —
    reference_sensitivity = (βa−βb)(x̄a−x̄b) is exactly the
    disagreement, and when it rivals the gap itself the two-fold
    story is unstable and the three-fold query is the honest one.
    Per-group slopes are exact integer-moment ratios; the
    arithmetic identity explained+unexplained = gap holds to
    float round-off by construction on both engines."""
    f = _oaxaca_fits(sf_dir)
    (na, mxa, mya, ba), (nb_, mxb, myb, bb) = f["AUTOMOBILE"], \
        f["BUILDING"]
    rha = textstats.round_half_away
    gap = mya - myb
    return pd.DataFrame({
        "n_automobile": np.array([na], np.int64),
        "n_building": np.array([nb_], np.int64),
        "gap": [float(rha(gap / 100.0, 6))],
        "explained_ref_b": [float(rha(bb * (mxa - mxb) / 100.0,
                                      6))],
        "unexplained_ref_b": [float(rha(
            ((mya - ba * mxa) - (myb - bb * mxb)
             + (ba - bb) * mxa) / 100.0, 6))],
        "explained_ref_a": [float(rha(ba * (mxa - mxb) / 100.0,
                                      6))],
        "unexplained_ref_a": [float(rha(
            ((mya - ba * mxa) - (myb - bb * mxb)
             + (ba - bb) * mxb) / 100.0, 6))],
        "reference_sensitivity": [float(rha(
            (ba * (mxa - mxb) - bb * (mxa - mxb)) / 100.0, 6))]})


def _oaxaca_fits(sf_dir: str):
    """{seg: (n, mean_x, mean_y_cents, slope)} for the two fixed
    segments, from one broadcast-join reduce."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    keep = cust["c_mktsegment"].isin(["AUTOMOBILE", "BUILDING"])
    cmap_ref = ray.put(dict(zip(
        cust["c_custkey"][keep].to_numpy(np.int64),
        cust["c_mktsegment"][keep])))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["user_id"].map(cmap)
        k = seg.notna().to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[k],
            "seg": seg[k].to_numpy(),
            "x": np.ones(int(k.sum()), np.int64),
            "y": np.rint(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)[k]})

    uv = reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "seg"], {"x": ("x", "sum"),
                             "y": ("y", "sum")}).to_pandas()
    out = {}
    for seg, d in uv.groupby("seg"):
        n = len(d)
        x = d["x"].to_numpy(np.int64).astype(object)
        y = d["y"].to_numpy(np.int64).astype(object)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        den = n * sxx - sx * sx
        b = float(n * sxy - sx * sy) / float(den) if den != 0 \
            else 0.0
        out[seg] = (n, float(sx) / n, float(sy) / n, b)
    for seg in ("AUTOMOBILE", "BUILDING"):
        out.setdefault(seg, (0, 0.0, 0.0, 0.0))
    return out


@register("oaxaca_threefold_value_gap", sql=f"""
WITH {_OAXACA_SQL}
SELECT ROUND((mya - myb) / 100.0, 6) AS gap,
       ROUND(bb * (mxa - mxb) / 100.0, 6) AS endowment,
       ROUND(((mya - ba * mxa) - (myb - bb * mxb)
              + (ba - bb) * mxb) / 100.0, 6) AS coefficient,
       ROUND((ba - bb) * (mxa - mxb) / 100.0, 6) AS interaction,
       ROUND((bb * (mxa - mxb)
              + ((mya - ba * mxa) - (myb - bb * mxb)
                 + (ba - bb) * mxb)
              + (ba - bb) * (mxa - mxb)) / 100.0, 6)
           AS identity_check
FROM ab""")
def oaxaca_threefold_value_gap(sf_dir: str) -> pd.DataFrame:
    """The three-fold (Winsborough–Dickinson) version: gap =
    endowment (B's slope × activity difference) + coefficient
    (slope/intercept difference at B's activity) + interaction
    ((βa−βb)(x̄a−x̄b) — the part that exists only because BOTH
    differ, which the two-fold folds into whichever term its
    reference choice favors). identity_check re-adds the three
    parts on the output so the decomposition audits itself. A
    large interaction is the substantive finding the two-fold
    can't express: the high-activity segment ALSO monetizes each
    action differently, so activity-boosting and pricing levers
    compound rather than add. Same exact per-group moments."""
    f = _oaxaca_fits(sf_dir)
    (na, mxa, mya, ba), (nb_, mxb, myb, bb) = f["AUTOMOBILE"], \
        f["BUILDING"]
    rha = textstats.round_half_away
    endw = bb * (mxa - mxb)
    coef = (mya - ba * mxa) - (myb - bb * mxb) + (ba - bb) * mxb
    inter = (ba - bb) * (mxa - mxb)
    return pd.DataFrame({
        "gap": [float(rha((mya - myb) / 100.0, 6))],
        "endowment": [float(rha(endw / 100.0, 6))],
        "coefficient": [float(rha(coef / 100.0, 6))],
        "interaction": [float(rha(inter / 100.0, 6))],
        "identity_check": [float(rha((endw + coef + inter)
                                     / 100.0, 6))]})
