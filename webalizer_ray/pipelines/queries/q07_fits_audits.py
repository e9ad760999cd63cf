"""Driver-contract queries (chunk 7/18).
Sections:
  - top-2 values (ties leave the margin unchanged)
  - python ints: n*sxx overflows int64 at full scale
  - one marker per WORD (not per (source, word) row) so the
  - child-only keys (orphans) are a different audit's subject and
  - a pk's (pk, nk) rows may land in different hash buckets, so
  - score histogram: fold |c - med| cells
  - truncate each session at its FIRST purchase
  - drop orders with no line items (the SQL inner join drops
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    REGISTRY,
    _docs,
    _events,
    distinct_count,
    np,
    pd,
    pq,
    ray,
    rd,
    reduce_sink,
    register,
    textstats,
    top_n_pandas,
)



@register("granger_views_purchases_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) FILTER (event_type = 'view')
                       AS BIGINT) AS v,
                  CAST(COUNT(*) FILTER (event_type = 'purchase')
                       AS BIGINT) AS p
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d, COALESCE(e.v, 0) AS v, COALESCE(e.p, 0) AS p
      FROM cal LEFT JOIN e USING (d)),
pr AS (SELECT a.p AS y, b.p AS x1, b.v AS x2
       FROM g a JOIN g b ON b.d = a.d - 1),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS s2y FROM pr),
d AS (SELECT n, sy, s1y, s2y, syy,
  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)
      AS det,
  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)
      AS d0,
  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)
      AS d1,
  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)
      AS d2
  FROM m)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(d0 / det, 6) AS intercept,
       ROUND(d1 / det, 6) AS beta_prev_purchases,
       ROUND(d2 / det, 6) AS beta_prev_views,
       ROUND(1.0 - (syy - (d0 / det) * sy - (d1 / det) * s1y
                    - (d2 / det) * s2y)
                   / (syy - sy * sy / n), 6) AS r2
FROM d""")
def granger_views_purchases_daily(sf_dir: str) -> pd.DataFrame:
    """Granger-style lagged regression on the daily stream: purchases
    today ~ purchases yesterday + VIEWS yesterday, over the
    zero-filled calendar. The cross-correlation query says views and
    purchases co-move; this asks the causal-screen question — does
    yesterday's view count predict today's purchases AFTER
    controlling for purchase momentum (β_prev_views ≠ 0 is the
    lead-indicator license for spend forecasting off traffic). One
    daily (view, purchase) count reduce; the 3×3 normal equations
    solve via Cramer's rule written as the IDENTICAL integer-moment
    expression on both engines, same pattern as
    [[ols_value_hour_dow]]."""
    daily = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                        .map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "v": (df["event_type"] == "view").to_numpy(np.int64),
            "p": (df["event_type"] == "purchase")
            .to_numpy(np.int64)}), batch_format="pandas"),
        ["d"], {"v": ("v", "sum"), "p": ("p", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    cal = np.arange(lo, hi + 1, dtype=np.int64)
    v = np.zeros(len(cal), np.int64)
    p = np.zeros(len(cal), np.int64)
    idx = daily["d"].to_numpy(np.int64) - lo
    v[idx] = daily["v"].to_numpy(np.int64)
    p[idx] = daily["p"].to_numpy(np.int64)
    y, x1, x2 = p[1:], p[:-1], v[:-1]
    n = float(len(y))
    s1, s2 = float(x1.sum()), float(x2.sum())
    s11, s22 = float((x1 * x1).sum()), float((x2 * x2).sum())
    s12, sy = float((x1 * x2).sum()), float(y.sum())
    syy = float((y * y).sum())
    s1y, s2y = float((x1 * y).sum()), float((x2 * y).sum())
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    d0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y))
    d1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2))
    d2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2))
    r2 = 1.0 - (syy - (d0 / det) * sy - (d1 / det) * s1y
                - (d2 / det) * s2y) / (syy - sy * sy / n)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([int(n)], np.int64),
        "intercept": [float(r6(d0 / det, 6))],
        "beta_prev_purchases": [float(r6(d1 / det, 6))],
        "beta_prev_views": [float(r6(d2 / det, 6))],
        "r2": [float(r6(r2, 6))]})


@register("lognormal_doc_length_fit", sql="""
WITH h AS (SELECT lang, n_chars AS c, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM documents WHERE n_chars > 0 GROUP BY 1, 2),
m AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n,
             SUM(cnt * LN(c)) AS s1,
             SUM(cnt * LN(c) * LN(c)) AS s2,
             SUM(cnt * LN(c) * LN(c) * LN(c)) AS s3,
             SUM(cnt * LN(c) * LN(c) * LN(c) * LN(c)) AS s4
      FROM h GROUP BY 1),
c AS (SELECT lang, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                 + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s3 / n) * (s1 / n)
                 + 6 * (s2 / n) * (s1 / n) * (s1 / n)
                 - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)
                 AS m4
      FROM m)
SELECT lang, n AS n_docs, ROUND(mu, 6) AS ln_mean,
       ROUND(SQRT(m2), 6) AS ln_sd,
       ROUND(m3 / (m2 * SQRT(m2)), 6) AS ln_skew,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS ln_kurt_excess,
       ROUND(n / 6.0 * ((m3 / (m2 * SQRT(m2)))
                        * (m3 / (m2 * SQRT(m2)))
                        + (m4 / (m2 * m2) - 3.0)
                          * (m4 / (m2 * m2) - 3.0) / 4), 6)
           AS jarque_bera
FROM c ORDER BY lang""")
def lognormal_doc_length_fit(sf_dir: str) -> pd.DataFrame:
    """Is document length LOG-normal per language? — the assumption
    behind every "cap at μ+3σ in log space" length filter and behind
    modeling token budgets with a lognormal. Jarque–Bera on
    z = ln(n_chars): skew and excess kurtosis of z should both be ~0
    if lognormal holds; a huge JB says the filter's tails are wrong
    (e.g. a second mode of stub docs). The reduce is a (lang,
    n_chars) contingency — bounded by distinct lengths, not corpus
    size — and every ln term is computed from the same integer on
    both engines, with central moments expanded in the IDENTICAL
    operand order ([[moments_skew_kurtosis_by_type]]'s pattern)."""
    h = reduce_sink(
        _docs(sf_dir, ["lang", "n_chars"]).filter(
            lambda r: r["n_chars"] > 0).map_batches(
            lambda df: pd.DataFrame({
                "lang": df["lang"].astype(str),
                "c": df["n_chars"].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["lang", "c"], {"cnt": ("c", "size")}).to_pandas() \
        .sort_values(["lang", "c"], ignore_index=True)
    rows = []
    r6 = textstats.round_half_away
    for lang, g in h.groupby("lang", sort=True):
        cnt = g["cnt"].to_numpy(np.float64)
        z = np.log(g["c"].to_numpy(np.int64).astype(np.float64))
        n = float(cnt.sum())
        s1 = float((cnt * z).sum())
        s2 = float((cnt * z * z).sum())
        s3 = float((cnt * z * z * z).sum())
        s4 = float((cnt * z * z * z * z).sum())
        mu = s1 / n
        m2 = s2 / n - (s1 / n) * (s1 / n)
        m3 = (s3 / n - 3 * (s1 / n) * (s2 / n)
              + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        m4 = (s4 / n - 4 * (s3 / n) * (s1 / n)
              + 6 * (s2 / n) * (s1 / n) * (s1 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        skew = m3 / (m2 * np.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
        rows.append({
            "lang": lang, "n_docs": np.int64(n),
            "ln_mean": float(r6(mu, 6)),
            "ln_sd": float(r6(np.sqrt(m2), 6)),
            "ln_skew": float(r6(skew, 6)),
            "ln_kurt_excess": float(r6(kurt, 6)),
            "jarque_bera": float(r6(
                n / 6.0 * (skew * skew + kurt * kurt / 4), 6))})
    return pd.DataFrame(rows)


@register("centroid_margin_hist", sql="""
WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS x
           FROM embeddings),
c AS (SELECT label AS clabel, list(m ORDER BY dim) AS cvec
      FROM (SELECT label, dim, SUM(x) / COUNT(*) AS m
            FROM u GROUP BY label, dim) GROUP BY label),
s AS (SELECT e.vec_id, CAST(c.clabel AS BIGINT) AS pred_label,
             ROUND(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), c.cvec), 9) AS sim
      FROM embeddings e CROSS JOIN c),
r AS (SELECT vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY sim DESC, pred_label) AS rk FROM s),
mg AS (SELECT a.vec_id,
              CAST(ROUND((a.sim - b.sim) * 1000) AS BIGINT) // 50
                  AS band,
              a.sim - b.sim AS margin
       FROM r a JOIN r b ON a.vec_id = b.vec_id
       WHERE a.rk = 1 AND b.rk = 2)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(margin), 6) AS mean_margin
FROM mg GROUP BY band ORDER BY band""")
def centroid_margin_hist(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid CONFIDENCE profile: histogram of the top-1
    minus top-2 cosine margin per vector, in 0.05-wide bands. The
    confusion matrix says how often the classifier is wrong; the
    margin distribution says how often it is GUESSING — mass piled
    near margin 0 means small perturbations (quantization, a
    re-embed) will flip assignments wholesale, which is the
    go/no-go for SemDeDup-style cluster pruning. Same broadcast
    centroid matrix as [[centroid_confusion]]; each batch does one
    matmul and a two-value partial sort, sims round to 9 dp before
    the margin so both engines band identical doubles; only ≤41
    (band, count, Σmargin) partials shuffle."""
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
                      {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    agg["m"] = agg["s"] / agg["n"]
    piv = agg.pivot(index="label", columns="dim", values="m").sort_index()
    C = piv.to_numpy(np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put(Cn)

    def margins(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"band": np.array([], np.int64),
                                 "n": np.array([], np.int64),
                                 "s": np.array([], np.float64)})
        cn = ray.get(c_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ cn.T, 9)
        # top-2 values (ties leave the margin unchanged)
        part = np.partition(sims, sims.shape[1] - 2, axis=1)
        marg = part[:, -1] - part[:, -2]
        band = np.rint(marg * 1000).astype(np.int64) // 50
        out = pd.DataFrame({"band": band, "margin": marg})
        g = out.groupby("band", as_index=False).agg(
            n=("margin", "size"), s=("margin", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    out = reduce_sink(ds.map_batches(margins, batch_format="pandas"),
                      ["band"], {"n": ("n", "sum"), "s": ("s", "sum")}) \
        .to_pandas().sort_values("band", ignore_index=True)
    out["mean_margin"] = textstats.round_half_away(
        out["s"].to_numpy(np.float64) / out["n"].to_numpy(np.float64), 6)
    return out[["band", "n", "mean_margin"]] \
        .astype({"band": np.int64, "n": np.int64})


@register("l_diversity_audit", sql="""
WITH g AS (SELECT event_type, hour(ts) AS hr, dayofweek(ts) AS dow,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
           FROM events GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_violating,
       CAST(MIN(l) AS BIGINT) AS min_distinct
FROM g""")
def l_diversity_audit(sf_dir: str) -> pd.DataFrame:
    """l-diversity (l=3) over the same quasi-identifier tuple as
    [[k_anonymity_audit]], sensitive attribute = user_id: a QI group
    can pass k-anonymity with 50 rows and still expose everyone if
    all 50 belong to ONE user (Machanavajjhala 2007's homogeneity
    attack — the failure mode row-count audits can't see). The heavy
    step is the exact two-phase distinct per group (per-batch dedup →
    disjoint hash buckets → disjoint counts), then the COUNT TABLE
    folds to three integers with per-batch partials — neither events
    nor groups reach the driver. Weekday numbering differs between
    engines but induces the identical partition."""
    def qi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "hr": df["ts"].dt.hour.astype(np.int64),
            "dow": df["ts"].dt.dayofweek.astype(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64)})

    groups = distinct_count(
        _events(sf_dir, ["ts", "event_type", "user_id"])
        .map_batches(qi, batch_format="pandas"),
        ["event_type", "hr", "dow"], "user_id", "l")

    def audit_partial(df: pd.DataFrame) -> pd.DataFrame:
        lv = df["l"].to_numpy(np.int64)
        if not len(lv):
            return pd.DataFrame({"n_groups": np.array([], np.int64),
                                 "groups_violating": np.array([], np.int64),
                                 "min_distinct": np.array([], np.int64)})
        return pd.DataFrame({
            "n_groups": [np.int64(len(lv))],
            "groups_violating": [np.int64((lv < 3).sum())],
            "min_distinct": [np.int64(lv.min())]})

    p = groups.map_batches(audit_partial,
                           batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_groups": [np.int64(p["n_groups"].sum())],
        "groups_violating": [np.int64(p["groups_violating"].sum())],
        "min_distinct": [np.int64(p["min_distinct"].min())]})


@register("negative_balance_order_gap", sql="""
WITH oc AS (SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1),
c AS (SELECT c_custkey AS ck,
             CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS neg
      FROM customer),
j AS (SELECT c.neg, COALESCE(oc.n_orders, 0) AS n_orders,
             COALESCE(oc.cents, 0) AS cents,
             CASE WHEN oc.ck IS NULL THEN 0 ELSE 1 END AS has_o
      FROM c LEFT JOIN oc ON c.ck = oc.ck)
SELECT CAST(neg AS BIGINT) AS neg_balance,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(has_o) AS BIGINT) AS n_with_orders,
       CAST(SUM(n_orders) AS BIGINT) AS orders,
       ROUND(SUM(n_orders) * 1.0 / COUNT(*), 6) AS orders_per_customer,
       ROUND(SUM(cents) * 1.0 / COUNT(*) / 100, 6) AS spend_per_customer
FROM j GROUP BY 1 ORDER BY 1""")
def negative_balance_order_gap(sf_dir: str) -> pd.DataFrame:
    """Do customers in the red stop ordering? — per balance-sign
    group: customer count, share with any order, orders and spend
    per customer (zero-order customers in the DENOMINATOR, the part
    a naive inner-join average silently drops — that's the whole
    credit-risk read). No LEFT join is needed at scale: the
    per-customer order reduce inner-joins to balance flags for the
    with-order numerators, and customer-only partials supply the
    full denominators; the two 2-row tables combine on the driver."""
    from webalizer_ray.stages.join import auto_join
    oc = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(lambda df: pd.DataFrame({
            "ck": df["o_custkey"].to_numpy(np.int64),
            "n_orders": np.ones(len(df), np.int64),
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
            batch_format="pandas"),
        ["ck"], {"n_orders": ("n_orders", "sum"),
                 "cents": ("cents", "sum")})
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .map_batches(lambda df: pd.DataFrame({
            "ck": df["c_custkey"].to_numpy(np.int64),
            "neg": (df["c_acctbal"].to_numpy(np.float64) < 0)
            .astype(np.int64)}), batch_format="pandas")
    denom = reduce_sink(cust, ["neg"],
                        {"n_customers": ("neg", "size")}).to_pandas()
    num = reduce_sink(
        auto_join(cust, oc, on="ck"), ["neg"],
        {"n_with_orders": ("ck", "size"),
         "orders": ("n_orders", "sum"),
         "cents": ("cents", "sum")}).to_pandas()
    out = denom.merge(num, on="neg", how="left").fillna(0) \
        .sort_values("neg", ignore_index=True)
    nc = out["n_customers"].to_numpy(np.int64)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "neg_balance": out["neg"].to_numpy(np.int64),
        "n_customers": nc,
        "n_with_orders": out["n_with_orders"].to_numpy(np.int64),
        "orders": out["orders"].to_numpy(np.int64),
        "orders_per_customer": r6(
            out["orders"].to_numpy(np.float64) * 1.0 / nc, 6),
        "spend_per_customer": r6(
            out["cents"].to_numpy(np.float64) * 1.0 / nc / 100, 6)})


@register("supplier_hhi_by_nation", sql="""
WITH sv AS (SELECT l_suppkey AS sk,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM lineitem GROUP BY 1),
j AS (SELECT n_name, sv.cents
      FROM sv JOIN supplier ON s_suppkey = sk
              JOIN nation ON n_nationkey = s_nationkey),
t AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(cents) AS BIGINT) AS tot,
             CAST(MAX(cents) AS BIGINT) AS mx,
             SUM(CAST(cents AS DOUBLE) * cents) AS s2
      FROM j GROUP BY 1)
SELECT n_name AS nation, n_suppliers,
       ROUND(s2 / (CAST(tot AS DOUBLE) * tot), 6) AS hhi,
       ROUND(CAST(mx AS DOUBLE) / tot, 6) AS top_share
FROM t ORDER BY 1""")
def supplier_hhi_by_nation(sf_dir: str) -> pd.DataFrame:
    """Supply-concentration risk per nation: Herfindahl index and
    top-supplier share of shipped value — an HHI near 1 means one
    supplier IS that nation's supply chain (the single-point-of-
    failure screen sourcing reads before the next contract round;
    the source-mix HHI asks this of documents, this asks it of
    money). Per-supplier cents reduce off lineitem, supplier→nation
    via the broadcast dimension map, then per-nation 4-scalar
    partials (count, Σc, max, Σc² as identical-term doubles) — the
    fact tables never reach the driver."""
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nname = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    nation_of = {k: nname[v] for k, v in
                 zip(sup["s_suppkey"].to_pylist(),
                     sup["s_nationkey"].to_pylist())}
    nref = ray.put(nation_of)
    sv = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_suppkey", "l_extendedprice"])
        .map_batches(lambda df: pd.DataFrame({
            "sk": df["l_suppkey"].to_numpy(np.int64),
            "cents": np.rint(df["l_extendedprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)}), batch_format="pandas"),
        ["sk"], {"cents": ("cents", "sum")})

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(nref)
        c = df["cents"].to_numpy(np.int64)
        return pd.DataFrame({
            "nation": df["sk"].map(nm).astype(str),
            "n_suppliers": np.ones(len(df), np.int64),
            "tot": c, "mx": c,
            "s2": c.astype(np.float64) * c})

    t = reduce_sink(sv.map_batches(per_nation, batch_format="pandas"),
                    ["nation"],
                    {"n_suppliers": ("n_suppliers", "sum"),
                     "tot": ("tot", "sum"), "mx": ("mx", "max"),
                     "s2": ("s2", "sum")}) \
        .to_pandas().sort_values("nation", ignore_index=True)
    r6 = textstats.round_half_away
    tot = t["tot"].to_numpy(np.int64)
    return pd.DataFrame({
        "nation": t["nation"],
        "n_suppliers": t["n_suppliers"].to_numpy(np.int64),
        "hhi": r6(t["s2"].to_numpy(np.float64)
                  / (tot.astype(np.float64) * tot), 6),
        "top_share": r6(t["mx"].to_numpy(np.float64) / tot, 6)})


@register("lang_word_affinity", sql=r"""
WITH w AS (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2),
p AS (SELECT a.lang AS la, b.lang AS lb,
             CAST(COUNT(*) AS BIGINT) AS shared_words,
             SUM(CAST(a.c AS DOUBLE) * b.c) AS dot
      FROM c a JOIN c b ON a.word = b.word AND a.lang < b.lang
      GROUP BY 1, 2),
n AS (SELECT lang, SUM(CAST(c AS DOUBLE) * c) AS s2
      FROM c GROUP BY 1)
SELECT la AS lang_a, lb AS lang_b, shared_words,
       ROUND(dot / (SQRT(na.s2) * SQRT(nb.s2)), 6) AS cosine
FROM p JOIN n na ON na.lang = la JOIN n nb ON nb.lang = lb
ORDER BY 1, 2""")
def lang_word_affinity(sf_dir: str) -> pd.DataFrame:
    """Pairwise language CONFUSABILITY: cosine similarity between
    per-language word-frequency vectors (the `\\S+` corpus token
    convention). A high-cosine pair shares surface vocabulary — it
    predicts exactly where the n-gram language-ID will bleed and
    where code-switching detection needs margin; the confusion
    matrix shows the errors, this shows the GEOMETRY causing them.
    Scale path: the vocabulary never reaches the driver — after the
    (lang, word) reduce, words hash into buckets (a word's rows all
    land together), each bucket pivots to a W×L count matrix and
    emits one L×L Gram partial (M'M), so only ≤buckets·L² scalars
    shuffle; integer products stay exact in float64."""
    from webalizer_ray.stages.aggregate import key_bucket

    def wc(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("lang")["text"].fillna("").str.split() \
            .explode().dropna()
        vc = ex.groupby([ex.index, ex.values]).size()
        out = vc.reset_index()
        out.columns = ["lang", "word", "c"]
        out["c"] = out["c"].astype(np.int64)
        return out

    c = reduce_sink(_docs(sf_dir, ["lang", "text"])
                    .map_batches(wc, batch_format="pandas"),
                    ["lang", "word"], {"c": ("c", "sum")})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = key_bucket(df, ["word"], 64)
        return df

    def gram(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index="word", columns="lang", values="c",
                            fill_value=0, aggfunc="sum")
        langs = [str(x) for x in piv.columns]
        M = piv.to_numpy(np.float64)
        G = M.T @ M
        NZ = (M > 0).astype(np.int64)
        S = NZ.T @ NZ                   # shared-word counts
        rows = []
        for i, la in enumerate(langs):
            for jj in range(i, len(langs)):
                rows.append({"la": la, "lb": langs[jj],
                             "dot": G[i, jj],
                             "shared": np.int64(S[i, jj])})
        return pd.DataFrame(rows)

    t = reduce_sink(c.map_batches(tag, batch_format="pandas")
                    .groupby("_b").map_groups(gram,
                                              batch_format="pandas"),
                    ["la", "lb"], {"dot": ("dot", "sum"),
                                   "shared": ("shared", "sum")}) \
        .to_pandas()
    s2 = {r.la: r.dot for r in t.itertuples() if r.la == r.lb}
    off = t[t["la"] < t["lb"]].sort_values(["la", "lb"],
                                           ignore_index=True)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "lang_a": off["la"], "lang_b": off["lb"],
        "shared_words": off["shared"].to_numpy(np.int64),
        "cosine": [float(r6(d / (np.sqrt(s2[a]) * np.sqrt(s2[b])), 6))
                   for a, b, d in zip(off["la"], off["lb"],
                                      off["dot"])]})


@register("part_type_hierarchy_revenue", sql="""
WITH pt AS MATERIALIZED (SELECT p_partkey, string_split(p_type, ' ')[1] AS cat
            FROM part),
rev AS (SELECT cat, CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                  AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN pt ON p_partkey = l_partkey GROUP BY 1),
np AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_parts
       FROM pt GROUP BY 1),
t AS (SELECT SUM(cents) AS tot FROM rev)
SELECT np.cat AS category, np.n_parts,
       CAST(COALESCE(rev.cents, 0) AS BIGINT) AS revenue_cents,
       ROUND(COALESCE(rev.cents, 0) / CAST(tot AS DOUBLE), 6)
           AS revenue_share
FROM np LEFT JOIN rev ON np.cat = rev.cat, t ORDER BY 1""")
def part_type_hierarchy_revenue(sf_dir: str) -> pd.DataFrame:
    """Category rollup on the part-type HIERARCHY (level-1 word of
    the 3-word p_type): catalog breadth vs revenue share per
    category — the assortment-planning read (a category holding 20%
    of the catalog but 5% of revenue is shelf space to reclaim; the
    ABC query ranks individual parts, this judges the taxonomy
    level buyers actually budget by). Broadcast part→category map,
    one cents reduce over lineitem, catalog counts straight off the
    dimension table; categories absent from lineitem stay visible
    with zero revenue."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    cats = [t.split(" ")[0] for t in part["p_type"].to_pylist()]
    cat_of = dict(zip(part["p_partkey"].to_pylist(), cats))
    cref = ray.put(cat_of)
    rev = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice"])
        .map_batches(lambda df: pd.DataFrame({
            "cat": df["l_partkey"].map(ray.get(cref)).astype(str),
            "cents": np.rint(df["l_extendedprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)}), batch_format="pandas"),
        ["cat"], {"cents": ("cents", "sum")}).to_pandas()
    np_ = pd.Series(cats).value_counts().rename_axis("cat") \
        .rename("n_parts").reset_index().sort_values(
        "cat", ignore_index=True)
    out = np_.merge(rev, on="cat", how="left").fillna(0)
    tot = float(out["cents"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "category": out["cat"],
        "n_parts": out["n_parts"].to_numpy(np.int64),
        "revenue_cents": out["cents"].to_numpy(np.int64),
        "revenue_share": r6(out["cents"].to_numpy(np.float64) / tot,
                            6)})


@register("order_cadence_regularity", sql="""
WITH g AS (SELECT o_custkey,
                  date_diff('day', LAG(o_orderdate) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap
           FROM orders),
s AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s,
             CAST(SUM(gap * gap) AS BIGINT) AS ssq
      FROM g WHERE gap IS NOT NULL GROUP BY 1
      HAVING COUNT(*) >= 2),
b AS (SELECT CASE
          WHEN s = 0 THEN 'clockwork'
          WHEN SQRT(CAST(n * ssq - s * s AS DOUBLE)) / s < 0.25
              THEN 'clockwork'
          WHEN SQRT(CAST(n * ssq - s * s AS DOUBLE)) / s < 0.5
              THEN 'regular'
          WHEN SQRT(CAST(n * ssq - s * s AS DOUBLE)) / s < 1.0
              THEN 'loose'
          ELSE 'sporadic' END AS band, n, s FROM s),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM b)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6) AS mean_gap_days,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot), 6) AS share
FROM b, t GROUP BY band ORDER BY band""")
def order_cadence_regularity(sf_dir: str) -> pd.DataFrame:
    """Order-cadence regularity bands: each customer's inter-order
    day gaps (sorted order dates; the gap multiset is tie-order
    invariant) reduce to integer moments (n, Σgap, Σgap²), and the
    coefficient of variation sqrt(n·ssq − s²)/s — computed with the
    IDENTICAL operand order in both engines so the <0.25/<0.5/<1.0
    band cuts agree bit-for-bit — classifies buyers clockwork /
    regular / loose / sporadic. The subscription-detection read the
    plain gap-quantile query can't give: quantiles pool all gaps,
    this scores rhythm PER customer. Gaps compute inside custkey
    buckets; only 4 band rows of integer partials leave."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey",
                                  "o_orderdate"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["o_custkey"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return df

    def bands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        day = (g["o_orderdate"].to_numpy("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        cust = g["o_custkey"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = cust[1:] == cust[:-1]
        gap = (day - np.roll(day, 1))[same]
        gg = pd.DataFrame({"c": cust[same], "g": gap,
                           "g2": gap * gap})
        st = gg.groupby("c", sort=False).agg(
            n=("g", "size"), s=("g", "sum"), ssq=("g2", "sum"))
        st = st[st["n"] >= 2]
        n = st["n"].to_numpy(np.int64)
        s = st["s"].to_numpy(np.int64)
        ssq = st["ssq"].to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            cv = np.sqrt((n * ssq - s * s).astype(np.float64)) / s
        band = np.select(
            [s == 0, cv < 0.25, cv < 0.5, cv < 1.0],
            ["clockwork", "clockwork", "regular", "loose"],
            default="sporadic")
        out = pd.DataFrame({"band": band, "n": n, "s": s})
        return out.groupby("band", as_index=False).agg(
            n_customers=("band", "size"), sum_n=("n", "sum"),
            sum_s=("s", "sum"))

    t = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: bands(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["band"], {"n_customers": ("n_customers", "sum"),
                   "sum_n": ("sum_n", "sum"),
                   "sum_s": ("sum_s", "sum")}).to_pandas() \
        .sort_values("band", ignore_index=True)
    tot = int(t["n_customers"].sum())
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "band": t["band"],
        "n_customers": t["n_customers"].to_numpy(np.int64),
        "mean_gap_days": r6(t["sum_s"].to_numpy(np.float64)
                            / t["sum_n"].to_numpy(np.int64), 6),
        "share": r6(t["n_customers"].to_numpy(np.float64) / tot, 6)})


@register("type_repertoire_saturation", sql="""
WITH r AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
f AS (SELECT user_id, rn,
             CASE WHEN row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY rn) = 1 THEN 1 ELSE 0 END AS new
      FROM r WHERE rn <= 20),
c AS (SELECT user_id, rn,
             CAST(SUM(new) OVER (PARTITION BY user_id
                                 ORDER BY rn) AS BIGINT) AS d
      FROM f)
SELECT CAST(rn AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(d) AS BIGINT) AS sum_distinct,
       ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS mean_distinct
FROM c GROUP BY rn ORDER BY k""")
def type_repertoire_saturation(sf_dir: str) -> pd.DataFrame:
    """Repertoire saturation curve: mean distinct event types a user
    has touched after their k-th event (k ≤ 20), over users with ≥k
    events — the exploration read ('users discover 3.2 of our
    actions in their first 10 events, then the curve flattens')
    behind onboarding and feature-discovery work; the static
    type-histogram can't show WHEN variety stops growing. Per-user
    cumulative-first-occurrence counts compute inside user-hash
    buckets off one stable (ts, event_id) sort; only 20 rows of
    (n_users, Σdistinct) integer partials shuffle, and the mean is
    one exact integer division per k."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return df

    def curve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        rn = g.groupby("user_id", sort=False).cumcount() \
            .to_numpy(np.int64) + 1
        new = (~g.duplicated(["user_id", "event_type"])) \
            .to_numpy(bool).astype(np.int64)
        keep = rn <= 20
        gg = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64)[keep],
                           "k": rn[keep], "new": new[keep]})
        gg["d"] = gg.groupby("u", sort=False)["new"].cumsum()
        return gg.groupby("k", as_index=False).agg(
            n_users=("d", "size"), sum_distinct=("d", "sum"))

    t = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: curve(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["k"], {"n_users": ("n_users", "sum"),
                "sum_distinct": ("sum_distinct", "sum")}).to_pandas() \
        .sort_values("k", ignore_index=True)
    r6 = textstats.round_half_away
    return pd.DataFrame({
        "k": t["k"].to_numpy(np.int64),
        "n_users": t["n_users"].to_numpy(np.int64),
        "sum_distinct": t["sum_distinct"].to_numpy(np.int64),
        "mean_distinct": r6(t["sum_distinct"].to_numpy(np.float64)
                            / t["n_users"].to_numpy(np.int64), 6)})


@register("price_elasticity_by_brand", sql="""
WITH q AS (SELECT l_partkey,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
           FROM lineitem GROUP BY 1),
x AS (SELECT p_brand AS brand,
             CAST(ROUND(LN(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                        * 1000000, 0) AS BIGINT) AS xq,
             CAST(ROUND(LN(qty) * 1000000, 0) AS BIGINT) AS yq
      FROM q JOIN part ON p_partkey = l_partkey),
m AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx,
             CAST(SUM(yq * yq) AS BIGINT) AS syy,
             CAST(SUM(xq * yq) AS BIGINT) AS sxy
      FROM x GROUP BY 1)
SELECT brand, n AS n_parts,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity,
       ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM m WHERE n >= 3 AND n * sxx - sx * sx > 0
       AND n * syy - sy * sy > 0
ORDER BY brand""")
def price_elasticity_by_brand(sf_dir: str) -> pd.DataFrame:
    """Cross-part price elasticity per brand: OLS slope of ln(total
    quantity sold) on ln(retail price) across a brand's parts — the
    pricing read ('brand X moves −1.8% volume per +1% price, brand Y
    is inelastic') that the discount-band queries can't give because
    they vary the discount, not the base price. Both lns are taken
    of exact integers (price cents, summed quantity) and quantized
    to 1e-6 BEFORE any aggregation, so every moment (Σx, Σx², Σxy…)
    is an exact integer on both engines and the slope/r² are single
    identical float divisions — no float-sum ordering anywhere. One
    per-part qty reduce; part→(brand, price) is a broadcast map;
    only 25 brand rows of integer moment partials shuffle."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand",
                                  "p_retailprice"])
    rha = textstats.round_half_away
    cents = rha(part["p_retailprice"].to_numpy() * 100, 0) \
        .astype(np.int64)
    xq_all = rha(np.log(cents) * 1e6, 0).astype(np.int64)
    keys = part["p_partkey"].to_numpy()
    brand_ref = ray.put(dict(zip(keys, part["p_brand"].to_pylist())))
    xq_ref = ray.put(dict(zip(keys, xq_all)))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        b = df["l_partkey"].map(ray.get(brand_ref)).astype(str)
        xq = df["l_partkey"].map(ray.get(xq_ref)).to_numpy(np.int64)
        yq = rha(np.log(df["qty"].to_numpy(np.int64)) * 1e6, 0) \
            .astype(np.int64)
        g = pd.DataFrame({"brand": b, "n": 1, "sx": xq, "sy": yq,
                          "sxx": xq * xq, "syy": yq * yq,
                          "sxy": xq * yq})
        return g.groupby("brand", as_index=False).sum()

    qty = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_quantity"])
        .map_batches(lambda df: pd.DataFrame({
            "l_partkey": df["l_partkey"],
            "qty": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64)}), batch_format="pandas"),
        ["l_partkey"], {"qty": ("qty", "sum")})
    m = reduce_sink(qty.map_batches(moments, batch_format="pandas"),
                    ["brand"], {"n": ("n", "sum"), "sx": ("sx", "sum"),
                                "sy": ("sy", "sum"),
                                "sxx": ("sxx", "sum"),
                                "syy": ("syy", "sum"),
                                "sxy": ("sxy", "sum")}).to_pandas() \
        .sort_values("brand", ignore_index=True)
    rows = []
    for r in m.itertuples():
        # python ints: n*sxx overflows int64 at full scale
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxx, syy, sxy = int(r.sxx), int(r.syy), int(r.sxy)
        num = n * sxy - sx * sy
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        if n < 3 or dxx <= 0 or dyy <= 0:
            continue
        rows.append((r.brand, n, float(rha(float(num) / float(dxx), 6)),
                     float(rha((float(num) * float(num))
                               / (float(dxx) * float(dyy)), 6))))
    return pd.DataFrame(rows, columns=["brand", "n_parts",
                                       "elasticity", "r2"]) \
        .astype({"n_parts": np.int64})


@register("hurst_exponent_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
sz AS (SELECT UNNEST([5, 10, 15]) AS s),
w AS (SELECT sz.s AS s, i // sz.s AS win, (i % sz.s) + 1 AS k, x
      FROM g CROSS JOIN sz
      WHERE i < ((SELECT hi - lo + 1 FROM sp) // sz.s) * sz.s),
c AS (SELECT s, win, k, x,
             SUM(x) OVER (PARTITION BY s, win ORDER BY k) AS cum,
             SUM(x) OVER (PARTITION BY s, win) AS sw,
             SUM(x * x) OVER (PARTITION BY s, win) AS sxx
      FROM w),
r AS (SELECT s, win,
             CAST(MAX(s * cum - k * sw)
                  - MIN(s * cum - k * sw) AS BIGINT) AS rng,
             CAST(MAX(s * sxx - sw * sw) AS BIGINT) AS dd
      FROM c GROUP BY 1, 2),
l AS (SELECT s, ROUND(LOG2(rng / SQRT(CAST(dd AS DOUBLE))), 9) AS lrs
      FROM r WHERE dd > 0),
ms AS (SELECT CAST(s AS BIGINT) AS win_size,
              CAST(COUNT(*) AS BIGINT) AS n_windows,
              ROUND(AVG(lrs), 6) AS mean_log2_rs,
              LOG2(CAST(s AS DOUBLE)) AS t
       FROM l GROUP BY s),
fit AS (SELECT (COUNT(*) * SUM(t * mean_log2_rs)
                - SUM(t) * SUM(mean_log2_rs))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) AS h
        FROM ms)
SELECT win_size, n_windows, mean_log2_rs,
       ROUND((SELECT h FROM fit), 6) AS hurst
FROM ms ORDER BY win_size""")
def hurst_exponent_daily(sf_dir: str) -> pd.DataFrame:
    """Hurst exponent of the daily event stream via rescaled-range
    (R/S) analysis (Hurst 1951; Mandelbrot–Wallis pox plot): split
    the zero-filled daily series into complete windows of 5/10/15
    days, per window take R = range of cumulative deviations and
    S = population std, and fit log2(R/S) ~ H·log2(size). H≈0.5 is
    memoryless, H→1 is long-range persistence — the load-planning
    read daily_acf can't give (ACF sees one lag at a time; H sees
    the aggregate scaling law burst-capacity rules depend on).
    Every R and S numerator is EXACT integer arithmetic
    (n·cumsum_k − k·Σx and n·Σx² − (Σx)², so R/S = rng/√D is one
    identical float op per window on both engines); per-window
    log2 is rounded at 9dp before the tiny per-size mean. Only the
    daily count histogram shuffles ([[granger_views_purchases_daily]]
    calendar idiom)."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["d"].to_numpy(np.int64) - lo] = \
        daily["c"].to_numpy(np.int64)
    rha = textstats.round_half_away
    out = []
    for s in (5, 10, 15):
        nw = len(x) // s
        lrs = []
        for w in range(nw):
            seg = x[w * s:(w + 1) * s]
            sw, sxx = int(seg.sum()), int((seg * seg).sum())
            dd = s * sxx - sw * sw
            if dd <= 0:
                continue
            cum = np.cumsum(seg)
            num = s * cum - np.arange(1, s + 1, dtype=np.int64) * sw
            rng = int(num.max() - num.min())
            lrs.append(float(rha(np.log2(rng / np.sqrt(float(dd))),
                                 9)))
        if lrs:
            out.append((s, len(lrs),
                        float(rha(sum(lrs) / len(lrs), 6)),
                        float(np.log2(float(s)))))
    t = np.array([o[3] for o in out])
    m = np.array([o[2] for o in out])
    n = float(len(out))
    h = ((n * float((t * m).sum()) - float(t.sum()) * float(m.sum()))
         / (n * float((t * t).sum()) - float(t.sum()) ** 2))
    return pd.DataFrame({
        "win_size": np.array([o[0] for o in out], np.int64),
        "n_windows": np.array([o[1] for o in out], np.int64),
        "mean_log2_rs": [o[2] for o in out],
        "hurst": float(rha(h, 6))})


@register("acctbal_ks_customer_vs_supplier", sql="""
WITH c AS (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS nc
           FROM customer GROUP BY 1),
s AS (SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS ns
      FROM supplier GROUP BY 1),
m AS (SELECT v, CAST(SUM(nc) AS BIGINT) AS nc,
             CAST(SUM(ns) AS BIGINT) AS ns
      FROM (SELECT v, nc, 0 AS ns FROM c
            UNION ALL SELECT v, 0 AS nc, ns FROM s)
      GROUP BY v),
cum AS (SELECT v, SUM(nc) OVER (ORDER BY v) AS cc,
               SUM(ns) OVER (ORDER BY v) AS cs,
               (SELECT SUM(nc) FROM c) AS tc,
               (SELECT SUM(ns) FROM s) AS ts
        FROM m),
d AS (SELECT v, ABS(cc * ts - cs * tc) AS num, tc, ts FROM cum)
SELECT CAST(MAX(tc) AS BIGINT) AS n_customers,
       CAST(MAX(ts) AS BIGINT) AS n_suppliers,
       ROUND(CAST(MAX(num) AS DOUBLE) / (MAX(tc) * MAX(ts)), 6)
           AS ks_stat,
       ROUND((SELECT MIN(v) FROM d
              WHERE num = (SELECT MAX(num) FROM d)) / 100.0, 2)
           AS ks_at_balance
FROM d""")
def acctbal_ks_customer_vs_supplier(sf_dir: str) -> pd.DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    customer and supplier account-balance distributions — the
    cross-TABLE distributional audit ('are supplier balances drawn
    from the same generator as customer balances, or does one side
    carry a different credit profile?') that the within-events KS
    can't see. Balances quantize to integer cents, so the CDF gap
    |F_c − F_s| = |cc·ts − cs·tc|/(tc·ts) has an EXACT integer
    numerator; the max and its location (smallest balance achieving
    it) are integer comparisons — zero float ambiguity. Only two
    domain-bounded cents histograms shuffle."""
    def hist(table: str, col: str) -> pd.DataFrame:
        return reduce_sink(
            rd.read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=[col])
            .map_batches(lambda df, c=col: pd.DataFrame({
                "v": textstats.round_half_away(
                    df[c].to_numpy(np.float64) * 100, 0)
                .astype(np.int64), "n": 1}), batch_format="pandas"),
            ["v"], {"n": ("n", "sum")}).to_pandas()

    hc = hist("customer", "c_acctbal").rename(columns={"n": "nc"})
    hs = hist("supplier", "s_acctbal").rename(columns={"n": "ns"})
    m = hc.merge(hs, on="v", how="outer").fillna(0) \
        .sort_values("v", ignore_index=True)
    cc = m["nc"].to_numpy(np.int64).cumsum()
    cs = m["ns"].to_numpy(np.int64).cumsum()
    tc, ts = int(cc[-1]), int(cs[-1])
    num = np.abs(cc * ts - cs * tc)
    mx = int(num.max())
    at = int(m["v"].to_numpy(np.int64)[num == mx].min())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_customers": np.array([tc], np.int64),
        "n_suppliers": np.array([ts], np.int64),
        "ks_stat": [float(rha(mx / float(tc * ts), 6))],
        "ks_at_balance": [float(rha(at / 100.0, 2))]})


@register("linenumber_price_profile", sql="""
SELECT CAST(l_linenumber AS BIGINT) AS line_pos,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / COUNT(*), 6) AS mean_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0, 6) AS mean_price
FROM lineitem GROUP BY 1 ORDER BY 1""")
def linenumber_price_profile(sf_dir: str) -> pd.DataFrame:
    """Basket-position profile off l_linenumber (the line's ordinal
    within its order): line count, quantity and revenue per
    position, with exact-integer means — the basket-composition
    read ('line 1 is the anchor item; lines 5–7 are cheap add-ons')
    that per-order width histograms can't show because they ignore
    WHERE in the order a line sits. Position count is bounded (≤7),
    so only 7 rows of integer partials shuffle."""
    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_linenumber", "l_quantity",
                                 "l_extendedprice"])
        .map_batches(lambda df: pd.DataFrame({
            "line_pos": df["l_linenumber"].to_numpy(np.int64),
            "n_lines": 1,
            "qty_sum": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64),
            "revenue_cents": np.rint(
                df["l_extendedprice"].to_numpy(np.float64) * 100)
            .astype(np.int64)}), batch_format="pandas"),
        ["line_pos"], {"n_lines": ("n_lines", "sum"),
                       "qty_sum": ("qty_sum", "sum"),
                       "revenue_cents": ("revenue_cents", "sum")}) \
        .to_pandas().sort_values("line_pos", ignore_index=True)
    rha = textstats.round_half_away
    n = out["n_lines"].to_numpy(np.int64)
    return pd.DataFrame({
        "line_pos": out["line_pos"].to_numpy(np.int64),
        "n_lines": n,
        "qty_sum": out["qty_sum"].to_numpy(np.int64),
        "revenue_cents": out["revenue_cents"].to_numpy(np.int64),
        "mean_qty": rha(out["qty_sum"].to_numpy(np.float64) / n, 6),
        "mean_price": rha(out["revenue_cents"].to_numpy(np.float64)
                          / n / 100.0, 6)})


@register("month_end_order_loading", sql="""
WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CASE WHEN o_orderdate >= date_trunc('month',
                           o_orderdate) + INTERVAL 1 MONTH
                           - INTERVAL 3 DAY
                       THEN 1 ELSE 0 END AS last3
           FROM orders)
SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(last3) AS BIGINT) AS n_last3,
       ROUND(CAST(SUM(last3) AS DOUBLE) / COUNT(*), 6)
           AS last3_share
FROM o GROUP BY 1 ORDER BY 1""")
def month_end_order_loading(sf_dir: str) -> pd.DataFrame:
    """Month-end loading: share of each month's orders placed in its
    LAST 3 calendar days — the quota-gaming / quarter-stuffing
    screen (a flat daily rate puts ~10% of a 30-day month there;
    persistent 20%+ means order entry bunches at the close and
    fulfillment inherits a synthetic spike). Calendar-aware flag
    computes per batch (days-in-month vectorized); only per-month
    integer (n, n_last3) partials shuffle and the share is one
    exact division."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"]
        return pd.DataFrame({
            "month": d.dt.strftime("%Y-%m"),
            "n_orders": 1,
            "n_last3": (d.dt.day > d.dt.days_in_month - 3)
            .to_numpy(np.int64)})

    out = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
        .map_batches(prep, batch_format="pandas"),
        ["month"], {"n_orders": ("n_orders", "sum"),
                    "n_last3": ("n_last3", "sum")}).to_pandas() \
        .sort_values("month", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "month": out["month"],
        "n_orders": out["n_orders"].to_numpy(np.int64),
        "n_last3": out["n_last3"].to_numpy(np.int64),
        "last3_share": rha(out["n_last3"].to_numpy(np.float64)
                           / out["n_orders"].to_numpy(np.int64), 6)})


@register("turning_point_test_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d AS i, CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN e ON e.d = cal.d),
t AS (SELECT x, LAG(x) OVER (ORDER BY i) AS p,
             LEAD(x) OVER (ORDER BY i) AS nx
      FROM g),
c AS (SELECT CAST(SUM(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                           AND ((x > p AND x > nx)
                                OR (x < p AND x < nx))
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM t)
SELECT n AS n_days, tp AS turning_points,
       ROUND(2.0 * (n - 2) / 3.0, 6) AS expected,
       ROUND((tp - 2.0 * (n - 2) / 3.0)
             / SQRT((16.0 * n - 29) / 90.0), 6) AS z_score
FROM c""")
def turning_point_test_daily(sf_dir: str) -> pd.DataFrame:
    """Turning-point randomness test on the zero-filled daily count
    series: count strict local maxima+minima; an i.i.d. series has
    E[T] = 2(n−2)/3 and Var = (16n−29)/90 (Kendall's classic test).
    Too FEW turning points = trend/momentum, too MANY = alternating
    over-correction — a one-number randomness screen orthogonal to
    [[daily_trend_mann_kendall]] (which only sees monotone trend)
    and the runs test (which needs a median split). The turning
    count is exact integer comparisons on both engines; only the
    daily histogram shuffles."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["d"].to_numpy(np.int64) - lo] = \
        daily["c"].to_numpy(np.int64)
    n = len(x)
    mid, left, right = x[1:-1], x[:-2], x[2:]
    tp = int((((mid > left) & (mid > right))
              | ((mid < left) & (mid < right))).sum())
    exp = 2.0 * (n - 2) / 3.0
    z = (tp - exp) / np.sqrt((16.0 * n - 29) / 90.0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "turning_points": np.array([tp], np.int64),
        "expected": [float(rha(exp, 6))],
        "z_score": [float(rha(z, 6))]})


@register("type_audience_jaccard", sql="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
       FROM ut GROUP BY 1),
pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
              CAST(COUNT(*) AS BIGINT) AS inter
       FROM ut a JOIN ut b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
       GROUP BY 1, 2)
SELECT sa.event_type AS type_a, sb.event_type AS type_b,
       sa.n AS users_a, sb.n AS users_b,
       CAST(COALESCE(pr.inter, 0) AS BIGINT) AS users_both,
       ROUND(COALESCE(pr.inter, 0)
             / CAST(sa.n + sb.n - COALESCE(pr.inter, 0) AS DOUBLE),
             6) AS jaccard
FROM sz sa JOIN sz sb ON sa.event_type < sb.event_type
LEFT JOIN pr ON pr.ta = sa.event_type AND pr.tb = sb.event_type
ORDER BY 1, 2""")
def type_audience_jaccard(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap matrix: exact pairwise Jaccard between the
    USER SETS of each event-type pair — the cross-sell / cannibal
    read ('view and purchase audiences overlap 60%, purchase and
    error only 8%') that per-type reach counts can't give. Users
    hash-bucket once; inside each bucket a 0/1 user×type incidence
    matrix yields MᵀM pair-intersection partials (diagonal = set
    sizes), so only T² tiny integer rows shuffle — never user ids.
    Zero-overlap pairs stay visible."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"]).copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        piv = pd.crosstab(g["user_id"], g["event_type"])
        types = [str(t) for t in piv.columns]
        M = (piv.to_numpy() > 0).astype(np.int64)
        G = M.T @ M
        rows = []
        for i, ta in enumerate(types):
            for j in range(i, len(types)):
                rows.append((ta, types[j], int(G[i, j])))
        return pd.DataFrame(rows, columns=["ta", "tb", "inter"])

    t = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: pairs(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["ta", "tb"], {"inter": ("inter", "sum")}).to_pandas()
    sizes = {r.ta: int(r.inter) for r in t.itertuples()
             if r.ta == r.tb}
    inter = {(r.ta, r.tb): int(r.inter) for r in t.itertuples()
             if r.ta < r.tb}
    rha = textstats.round_half_away
    names = sorted(sizes)
    rows = []
    for i, ta in enumerate(names):
        for tb in names[i + 1:]:
            na, nb = sizes[ta], sizes[tb]
            ib = inter.get((ta, tb), 0)
            rows.append((ta, tb, na, nb, ib,
                         float(rha(ib / float(na + nb - ib), 6))))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "users_a", "users_b", "users_both",
        "jaccard"]).astype({"users_a": np.int64,
                            "users_b": np.int64,
                            "users_both": np.int64})


@register("first_vs_repeat_revenue_by_month", sql="""
WITH f AS (SELECT o_custkey, MIN(o_orderdate) AS fd
           FROM orders GROUP BY 1),
o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CASE WHEN o_orderdate = f.fd THEN 1 ELSE 0 END AS isf,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN f ON orders.o_custkey = f.o_custkey)
SELECT month,
       CAST(SUM(isf) AS BIGINT) AS first_orders,
       CAST(COUNT(*) - SUM(isf) AS BIGINT) AS repeat_orders,
       CAST(SUM(isf * cents) AS BIGINT) AS first_cents,
       CAST(SUM((1 - isf) * cents) AS BIGINT) AS repeat_cents,
       ROUND(CAST(SUM(isf * cents) AS DOUBLE) / SUM(cents), 6)
           AS first_revenue_share
FROM o GROUP BY 1 ORDER BY 1""")
def first_vs_repeat_revenue_by_month(sf_dir: str) -> pd.DataFrame:
    """Acquisition-vs-retention revenue mix: each month's order cents
    split into FIRST orders (placed on the customer's earliest order
    date — ties on that date all count as first, deterministically)
    vs repeat orders. The growth-accounting read at the revenue
    grain ('40% of March revenue was new logos') that
    [[new_vs_returning_daily]] gives only at the event-count grain.
    Per-customer first dates come from one min-reduce and join back
    via [[auto_join]] (broadcast under 1M customers, distributed
    hash above); only per-month integer cents partials shuffle."""
    from webalizer_ray.stages.join import auto_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    first = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate"]),
        ["o_custkey"], {"fd": ("o_orderdate", "min")})

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        isf = (df["o_orderdate"].to_numpy("datetime64[us]")
               == df["fd"].to_numpy("datetime64[us]")) \
            .astype(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        return pd.DataFrame({
            "month": df["o_orderdate"].dt.strftime("%Y-%m"),
            "first_orders": isf, "repeat_orders": 1 - isf,
            "first_cents": isf * cents,
            "repeat_cents": (1 - isf) * cents})

    out = reduce_sink(
        auto_join(orders, first, on="o_custkey")
        .map_batches(prep, batch_format="pandas"),
        ["month"], {"first_orders": ("first_orders", "sum"),
                    "repeat_orders": ("repeat_orders", "sum"),
                    "first_cents": ("first_cents", "sum"),
                    "repeat_cents": ("repeat_cents", "sum")}) \
        .to_pandas().sort_values("month", ignore_index=True)
    rha = textstats.round_half_away
    fc = out["first_cents"].to_numpy(np.int64)
    rc = out["repeat_cents"].to_numpy(np.int64)
    return pd.DataFrame({
        "month": out["month"],
        "first_orders": out["first_orders"].to_numpy(np.int64),
        "repeat_orders": out["repeat_orders"].to_numpy(np.int64),
        "first_cents": fc, "repeat_cents": rc,
        "first_revenue_share": rha(fc.astype(np.float64) / (fc + rc),
                                   6)})


@register("punctuation_profile_by_source", sql="""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       ROUND(1000.0 * SUM(length(text)
                          - length(replace(text, '.', '')))
             / SUM(n_chars), 6) AS periods_per_1k,
       ROUND(1000.0 * SUM(length(text)
                          - length(replace(text, ',', '')))
             / SUM(n_chars), 6) AS commas_per_1k,
       ROUND(1000.0 * SUM(length(text)
                          - length(replace(text, '?', '')))
             / SUM(n_chars), 6) AS questions_per_1k,
       ROUND(1000.0 * SUM(length(text)
                          - length(replace(text, '!', '')))
             / SUM(n_chars), 6) AS exclaims_per_1k
FROM documents GROUP BY 1 ORDER BY 1""")
def punctuation_profile_by_source(sf_dir: str) -> pd.DataFrame:
    """Punctuation fingerprint per corpus source: periods, commas,
    question and exclamation marks per 1 000 characters — the text
    forensics read ('source B is all exclamation marks and no
    commas — marketing copy, downweight it') that char-entropy and
    stopword-ratio quality scores blur together. Literal
    substring counts are vectorized per batch; only per-source
    integer (docs, chars, 4 counts) partials shuffle and every rate
    is one exact integer division."""
    import re as _re

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].astype(str)
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "n_docs": 1,
            "chars": df["n_chars"].to_numpy(np.int64),
            "periods": t.str.count(_re.escape("."))
            .to_numpy(np.int64),
            "commas": t.str.count(",").to_numpy(np.int64),
            "questions": t.str.count(_re.escape("?"))
            .to_numpy(np.int64),
            "exclaims": t.str.count("!").to_numpy(np.int64)})

    out = reduce_sink(
        _docs(sf_dir, ["source", "text", "n_chars"])
        .map_batches(prep, batch_format="pandas"),
        ["source"], {"n_docs": ("n_docs", "sum"),
                     "chars": ("chars", "sum"),
                     "periods": ("periods", "sum"),
                     "commas": ("commas", "sum"),
                     "questions": ("questions", "sum"),
                     "exclaims": ("exclaims", "sum")}).to_pandas() \
        .sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    ch = out["chars"].to_numpy(np.float64)
    return pd.DataFrame({
        "source": out["source"],
        "n_docs": out["n_docs"].to_numpy(np.int64),
        "chars": out["chars"].to_numpy(np.int64),
        "periods_per_1k": rha(1000.0 * out["periods"].to_numpy(
            np.int64) / ch, 6),
        "commas_per_1k": rha(1000.0 * out["commas"].to_numpy(
            np.int64) / ch, 6),
        "questions_per_1k": rha(1000.0 * out["questions"].to_numpy(
            np.int64) / ch, 6),
        "exclaims_per_1k": rha(1000.0 * out["exclaims"].to_numpy(
            np.int64) / ch, 6)})


@register("embedding_anisotropy", sql="""
WITH x AS (SELECT SQRT(list_inner_product(
                      CAST(embedding AS DOUBLE[]),
                      CAST(embedding AS DOUBLE[]))) AS nrm,
                  CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
d AS (SELECT UNNEST(e) / nrm AS comp,
             UNNEST(generate_series(1, 64)) AS dim
      FROM x),
s AS (SELECT dim, SUM(comp) AS sc FROM d GROUP BY dim),
agg AS (SELECT SUM(sc * sc) AS s2 FROM s),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
SELECT n.n AS n_vectors,
       ROUND((agg.s2 - n.n) / (CAST(n.n AS DOUBLE) * (n.n - 1)), 6)
           AS mean_pairwise_cosine,
       ROUND(SQRT(agg.s2) / n.n, 6) AS mean_direction_norm
FROM agg, n""")
def embedding_anisotropy(sf_dir: str) -> pd.DataFrame:
    """Anisotropy of the embedding space: mean cosine between ALL
    pairs of unit-normalized vectors, computed WITHOUT pair
    expansion via the sum-vector identity Σ_{i≠j} uᵢ·uⱼ =
    ‖Σu‖² − n — the Ethayarajh (2019) 'embeddings live in a narrow
    cone' diagnostic. High anisotropy means raw cosine similarities
    are inflated by a common direction and every cosine threshold
    (dedup, ANN, clustering) needs recentering; mean_direction_norm
    = ‖Σu‖/n is the companion 'how far off-center' number. Each
    batch emits one 64-float sum partial + a count — O(dim) bytes
    shuffle regardless of corpus size."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M = M / np.sqrt((M * M).sum(axis=1, keepdims=True))
        s = M.sum(axis=0)
        out = {f"s{d}": [s[d]] for d in range(M.shape[1])}
        out["n"] = [len(M)]
        out["one_"] = [1]
        return pd.DataFrame(out)

    aggs = {f"s{d}": (f"s{d}", "sum") for d in range(64)}
    aggs["n"] = ("n", "sum")
    t = reduce_sink(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding"])
        .map_batches(partial, batch_format="pandas"),
        ["one_"], aggs).to_pandas()
    n = int(t["n"].iloc[0])
    s2 = float(sum(float(t[f"s{d}"].iloc[0]) ** 2
                   for d in range(64)))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_vectors": np.array([n], np.int64),
        "mean_pairwise_cosine": [float(rha(
            (s2 - n) / (float(n) * (n - 1)), 6))],
        "mean_direction_norm": [float(rha(np.sqrt(s2) / n, 6))]})


_FK_RELS = [
    # (rel name, child table, child key col, parent table, parent key col)
    ("customer_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation_regionkey", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier_nationkey", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def _fk_rel_sql(rel, ct, ck, pt, pk):
    return f"""
  SELECT '{rel}' AS rel,
         CAST(SUM(c.n) AS BIGINT) AS child_rows,
         CAST(COUNT(*) AS BIGINT) AS child_keys,
         CAST(COUNT(*) FILTER (WHERE p.k IS NULL) AS BIGINT)
             AS orphan_keys,
         CAST(COALESCE(SUM(c.n) FILTER (WHERE p.k IS NULL), 0)
              AS BIGINT) AS orphan_rows
  FROM (SELECT {ck} AS k, COUNT(*) AS n FROM {ct} GROUP BY 1) c
  LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {pt}) p USING (k)"""


@register("fk_orphan_matrix", sql=(
    "\nUNION ALL".join(_fk_rel_sql(*r) for r in _FK_RELS)
    + "\nORDER BY rel"))
def fk_orphan_matrix(sf_dir: str) -> pd.DataFrame:
    """Star-schema referential-integrity audit: every FK relation in
    the schema (lineitem→orders/part/supplier, orders→customer,
    customer/supplier→nation, nation→region) checked in ONE tagged
    union-reduce — the whole-warehouse version of the single-relation
    validate_fk_orders contract check, the audit a nightly load runs
    before publishing. No fact-table join: each child batch collapses
    to (rel, key, row_count) via value_counts, each parent batch to
    distinct (rel, key); one groupby over key-level rows max-combines
    the parent-presence flag, and a second tiny reduce per relation
    counts distinct child keys, orphan keys (child key absent from
    parent) and orphan rows. Only distinct keys ever shuffle — at
    100 TB the fact tables stream through the per-batch value_counts
    and never leave their readers."""
    def child_fn(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            vc = df[col].value_counts()
            return pd.DataFrame({
                "k": vc.index.to_numpy(np.int64),
                "n_child": vc.to_numpy(np.int64),
                "parent": np.int64(0)})
        return f

    def parent_fn(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            k = df[col].drop_duplicates().to_numpy(np.int64)
            return pd.DataFrame({"k": k, "n_child": np.int64(0),
                                 "parent": np.int64(1)})
        return f

    parts = []
    for rel, ct, ck, pt, pk in _FK_RELS:
        cds = rd.read_parquet(f"{sf_dir}/{ct}.parquet", columns=[ck]) \
            .map_batches(child_fn(ck), batch_format="pandas") \
            .add_column("rel", lambda df, r=rel: r,
                        batch_format="pandas")
        pds = rd.read_parquet(f"{sf_dir}/{pt}.parquet", columns=[pk]) \
            .map_batches(parent_fn(pk), batch_format="pandas") \
            .add_column("rel", lambda df, r=rel: r,
                        batch_format="pandas")
        parts.extend([cds, pds])
    both = parts[0].union(*parts[1:])
    per_key = reduce_sink(both, ["rel", "k"],
                          {"n_child": ("n_child", "sum"),
                           "parent": ("parent", "max")})

    def rel_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_child"] > 0]
        orphan = df["parent"].eq(0)
        g = df.groupby("rel", sort=False)
        out = pd.DataFrame({
            "child_rows": g["n_child"].sum().astype(np.int64),
            "child_keys": g.size().astype(np.int64),
            "orphan_keys": df[orphan].groupby("rel", sort=False)
            .size().reindex(g.size().index, fill_value=0)
            .astype(np.int64),
            "orphan_rows": df[orphan].groupby("rel", sort=False)
            ["n_child"].sum().reindex(g.size().index, fill_value=0)
            .astype(np.int64)})
        return out.reset_index()

    out = reduce_sink(
        per_key.map_batches(rel_partial, batch_format="pandas"),
        ["rel"], {"child_rows": ("child_rows", "sum"),
                  "child_keys": ("child_keys", "sum"),
                  "orphan_keys": ("orphan_keys", "sum"),
                  "orphan_rows": ("orphan_rows", "sum")}).to_pandas()
    return out[["rel", "child_rows", "child_keys", "orphan_keys",
                "orphan_rows"]].sort_values("rel", ignore_index=True)


@register("orderkey_keyspace", sql="""
WITH d AS (SELECT DISTINCT o_orderkey AS k FROM orders),
g AS (SELECT k - LAG(k) OVER (ORDER BY k) AS gap FROM d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MIN(k) AS BIGINT) AS key_min,
       CAST(MAX(k) AS BIGINT) AS key_max,
       ROUND(COUNT(*) * 1.0 / (MAX(k) - MIN(k) + 1), 6) AS density,
       CAST(COALESCE((SELECT MAX(gap) FROM g), 0) AS BIGINT) AS max_gap
FROM d""")
def orderkey_keyspace(sf_dir: str) -> pd.DataFrame:
    """Surrogate-keyspace density and max-gap scan over distinct
    o_orderkey — the ID-allocation audit (density ≪ 1 means the
    sequence burns keys or rows were purged; a huge max_gap pinpoints
    a lost allocation range or a botched restore). Computed without a
    global sort of the keys: each key hashes to its RANGE bucket
    (k // 4096), per-bucket map_groups dedups and sorts only its own
    bounded slice and emits (bucket, kmin, kmax, cnt, max internal
    gap); the driver stitches cross-bucket gaps from the O(keyspace /
    4096) summary rows — bucket summaries are ~5 orders of magnitude
    smaller than the fact table, and a second bucketing level drops in
    if even those outgrow one node."""
    W = 4096

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].drop_duplicates().to_numpy(np.int64)
        return pd.DataFrame({"k": k, "bucket_": k // W})

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(np.int64))
        gap = np.int64(np.diff(k).max()) if len(k) > 1 else np.int64(0)
        return pd.DataFrame({
            "bucket_": [np.int64(g["bucket_"].iloc[0])],
            "kmin": [k[0]], "kmax": [k[-1]],
            "cnt": [np.int64(len(k))], "gap_in": [gap]})

    b = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey"])
         .map_batches(with_bucket, batch_format="pandas")
         .groupby("bucket_").map_groups(summarize,
                                        batch_format="pandas")
         .to_pandas().sort_values("bucket_", ignore_index=True))
    n = int(b["cnt"].sum())
    kmin, kmax = int(b["kmin"].iloc[0]), int(b["kmax"].iloc[-1])
    cross = (b["kmin"].to_numpy(np.int64)[1:]
             - b["kmax"].to_numpy(np.int64)[:-1]) \
        if len(b) > 1 else np.array([0], np.int64)
    max_gap = max(int(b["gap_in"].max()), int(cross.max())) \
        if len(b) else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_keys": np.array([n], np.int64),
        "key_min": np.array([kmin], np.int64),
        "key_max": np.array([kmax], np.int64),
        "density": [float(rha(n / (kmax - kmin + 1), 6))],
        "max_gap": np.array([max_gap], np.int64)})


@register("wasserstein_weekday_weekend", sql="""
WITH b AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                  CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                      AS we
           FROM events),
g AS (SELECT c, SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS na,
             SUM(we) AS nb
      FROM b GROUP BY c),
t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM g),
s AS (SELECT c, SUM(na) OVER (ORDER BY c) AS ca,
             SUM(nb) OVER (ORDER BY c) AS cb,
             LEAD(c) OVER (ORDER BY c) AS cn
      FROM g)
SELECT CAST(t.ta AS BIGINT) AS n_weekday,
       CAST(t.tb AS BIGINT) AS n_weekend,
       ROUND(SUM(ABS(s.ca * t.tb - s.cb * t.ta) * (s.cn - s.c))
             / (t.ta * t.tb * 100.0), 6) AS w1
FROM s, t WHERE s.cn IS NOT NULL GROUP BY t.ta, t.tb""")
def wasserstein_weekday_weekend(sf_dir: str) -> pd.DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between the
    weekday and weekend `value` distributions — the
    magnitude-weighted drift number the KS / Cramér-von Mises /
    energy screens can't give: W1 is literally 'average dollars each
    event would have to move' so a 0.40 here is a business-sized
    shift even when KS (which only sees the worst CDF gap) stays
    flat. Values cents-quantized so W1 = Σ |CA·tb − CB·ta| · gap /
    (ta·tb·100) has an exact integer numerator, accumulated in
    Python ints (CA·tb overflows int64 at 100 TB row counts). Only
    (cents, na, nb) rows shuffle — distinct cents is bounded by the
    value range, not the row count — and the closed-form runs on
    that tiny sorted table."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        we = (df["ts"].dt.dayofweek >= 5).to_numpy()
        g = pd.DataFrame({"c": c, "na": (~we).astype(np.int64),
                          "nb": we.astype(np.int64)}) \
            .groupby("c", sort=False).sum().reset_index()
        return g

    g = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["c"], {"na": ("na", "sum"), "nb": ("nb", "sum")}) \
        .to_pandas().sort_values("c", ignore_index=True)
    cs = [int(x) for x in g["c"]]
    na = [int(x) for x in g["na"]]
    nb = [int(x) for x in g["nb"]]
    ta, tb = sum(na), sum(nb)
    num = 0
    ca = cb = 0
    for i in range(len(cs) - 1):
        ca += na[i]
        cb += nb[i]
        num += abs(ca * tb - cb * ta) * (cs[i + 1] - cs[i])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekday": np.array([ta], np.int64),
        "n_weekend": np.array([tb], np.int64),
        "w1": [float(rha(num / (ta * tb * 100.0), 6))]})


@register("goodman_kruskal_gamma_hour_value", sql="""
WITH b AS (SELECT CAST(hour(ts) AS BIGINT) AS h,
                  CAST(FLOOR(value / 20) AS BIGINT) AS v
           FROM events),
c AS (SELECT h, v, COUNT(*) AS n FROM b GROUP BY h, v),
p AS (SELECT SUM(CASE WHEN c2.h > c1.h AND c2.v > c1.v
                      THEN c1.n * c2.n ELSE 0 END) AS conc,
             SUM(CASE WHEN c2.h > c1.h AND c2.v < c1.v
                      THEN c1.n * c2.n ELSE 0 END) AS disc
      FROM c c1, c c2)
SELECT CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       ROUND((conc - disc) * 1.0 / (conc + disc), 6) AS gamma
FROM p""")
def goodman_kruskal_gamma_hour_value(sf_dir: str) -> pd.DataFrame:
    """Goodman–Kruskal gamma between hour-of-day and the $20 value
    band — the ordinal-association read ('do later hours carry
    bigger tickets, monotonically?') that Cramér's V (nominal, sees
    no order) and Pearson-on-raw (linear, outlier-hostile) both
    miss; unlike Kendall's tau it ignores the massive tie mass a
    24×K contingency table carries, so it stays interpretable when
    most pairs tie. Each batch emits (hour, band, n) partials; the
    global 24×K table is tiny and concordant/discordant pair counts
    come from one vectorized pass over its cell pairs in Python ints
    (n_ij · n_i'j' overflows int64 at 100 TB)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "h": df["ts"].dt.hour.to_numpy(np.int64),
            "v": np.floor(df["value"].to_numpy(np.float64) / 20)
            .astype(np.int64)}) \
            .groupby(["h", "v"], sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["h", "v"], {"n": ("n", "sum")}).to_pandas()
    cells = [(int(h), int(v), int(n))
             for h, v, n in zip(c["h"], c["v"], c["n"])]
    conc = disc = 0
    for h1, v1, n1 in cells:
        for h2, v2, n2 in cells:
            if h2 > h1:
                if v2 > v1:
                    conc += n1 * n2
                elif v2 < v1:
                    disc += n1 * n2
    rha = textstats.round_half_away
    return pd.DataFrame({
        "concordant": np.array([conc], np.int64),
        "discordant": np.array([disc], np.int64),
        "gamma": [float(rha((conc - disc) / (conc + disc), 6))]})


def _source_word_counts(sf_dir: str) -> rd.Dataset:
    """(source, word, y) with one row per distinct pair globally —
    per-batch value_counts combiner, then the bucketed combine."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["source", "text"]].copy()
        t["word"] = t["text"].fillna("").str.split()
        t = t[["source", "word"]].explode("word").dropna()
        vc = t.groupby(["source", "word"], sort=False).size() \
            .rename("y").reset_index()
        vc["y"] = vc["y"].astype(np.int64)
        return vc

    return reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pandas"),
        ["source", "word"], {"y": ("y", "sum")})


@register("yule_k_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(10000.0 * (SUM(n * n) - SUM(n)) / (SUM(n) * SUM(n)), 6)
           AS yule_k
FROM c GROUP BY source ORDER BY source""")
def yule_k_by_source(sf_dir: str) -> pd.DataFrame:
    """Yule's K vocabulary-richness characteristic per corpus source
    — K = 10⁴·(Σ c_w² − N)/N², the repeat-rate statistic that is
    (unlike type-token ratio, Heaps' slope or hapax share, all
    already in the suite) provably length-insensitive, so a source
    that is 100× bigger can be compared directly; a high K flags
    template/boilerplate text whose few types dominate. After the
    (source, word) combine each pair lives in exactly one block, so
    per-block (Σc, Σc², types) int partials are disjoint and the
    driver folds them in Python ints (c² overflows int64 once a
    word passes ~3B occurrences)."""
    def sp(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False)["y"]
        out = pd.DataFrame({
            "n_tokens": g.sum().astype(np.int64),
            "n_types": g.size().astype(np.int64),
            "s2": df.assign(sq=df["y"].to_numpy(np.int64) ** 2)
            .groupby("source", sort=False)["sq"].sum()
            .astype(np.int64)})
        return out.reset_index()

    parts = _source_word_counts(sf_dir) \
        .map_batches(sp, batch_format="pandas").to_pandas()
    g = parts.groupby("source", sort=True)
    rows = []
    rha = textstats.round_half_away
    for src, d in g:
        n = sum(int(x) for x in d["n_tokens"])
        s2 = sum(int(x) for x in d["s2"])
        rows.append((src, n, int(d["n_types"].sum()),
                     float(rha(10000.0 * (s2 - n) / (n * n), 6))))
    return pd.DataFrame(rows, columns=["source", "n_tokens",
                                       "n_types", "yule_k"]) \
        .astype({"n_tokens": np.int64, "n_types": np.int64})


@register("source_keyness_logodds", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, COUNT(*) AS y FROM w GROUP BY 1, 2),
tw AS (SELECT word, SUM(y) AS cw FROM c GROUP BY word),
ts AS (SELECT source, SUM(y) AS ns FROM c GROUP BY source),
v AS (SELECT COUNT(*) AS vv, SUM(cw) AS nt FROM tw),
z AS (SELECT c.source, c.word, c.y,
             LN((c.y + 1.0) / (ts.ns + v.vv - c.y - 1.0))
             - LN((tw.cw - c.y + 1.0)
                  / (v.nt - ts.ns + v.vv - (tw.cw - c.y) - 1.0))
                 AS delta,
             SQRT(1.0 / (c.y + 1) + 1.0 / (tw.cw - c.y + 1)) AS sd
      FROM c JOIN tw USING (word) JOIN ts USING (source), v),
r AS (SELECT source, word, y, ROUND(delta / sd, 6) AS z,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY ROUND(delta / sd, 6) DESC,
                                         word) AS rk
      FROM z)
SELECT source, word, CAST(y AS BIGINT) AS n_in_source,
       z AS z_logodds
FROM r WHERE rk <= 5 ORDER BY source, z_logodds DESC, word""")
def source_keyness_logodds(sf_dir: str) -> pd.DataFrame:
    """Monroe et al. (2008) 'Fightin' Words' keyness: top-5 most
    source-distinctive words by the z-scored log-odds-ratio with a
    +1 Dirichlet prior, each source against the rest of the corpus
    — the corpus-forensics read tf-idf and info-gain get wrong
    because neither controls the variance of rare words (tf-idf
    crowns a word seen twice; the prior + z-score here shrink it).
    Counts reduce to one (source, word) row globally; a per-word
    map_groups attaches the corpus count so rest = cw − y needs no
    second join; per-source token totals and vocab size are O(1)
    scalars broadcast into the scoring batches; z is rounded to 6dp
    BEFORE ranking so both engines break ties identically; and
    block-local top-5-per-source partials are a superset of the
    global answer because rows are globally unique."""
    per_pair = _source_word_counts(sf_dir)

    def attach_cw(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cw"] = np.int64(g["y"].sum())
        # one marker per WORD (not per (source, word) row) so the
        # global vocab size is a disjoint per-block sum downstream
        w1 = np.zeros(len(g), np.int64)
        w1[0] = 1
        g["w1_"] = w1
        return g

    with_cw = per_pair.groupby("word") \
        .map_groups(attach_cw, batch_format="pandas").materialize()

    def src_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False)["y"]
        out = pd.DataFrame({"ns": g.sum().astype(np.int64)}) \
            .reset_index()
        out["words"] = np.int64(0)
        return pd.concat([out, pd.DataFrame(
            {"source": ["\x00total"],
             "ns": [np.int64(0)],
             "words": [np.int64(df["w1_"].sum())]})],
            ignore_index=True)

    sp = with_cw.map_batches(src_partial,
                             batch_format="pandas").to_pandas() \
        .groupby("source", sort=False).sum()
    vv = int(sp["words"].sum())
    sp = sp.drop(index="\x00total", errors="ignore")
    ns_map = sp["ns"].astype(np.int64).to_dict()
    nt = int(sp["ns"].sum())

    def score(df: pd.DataFrame) -> pd.DataFrame:
        y = df["y"].to_numpy(np.float64)
        cw = df["cw"].to_numpy(np.float64)
        ns = df["source"].map(ns_map).to_numpy(np.float64)
        delta = np.log((y + 1.0) / (ns + vv - y - 1.0)) \
            - np.log((cw - y + 1.0)
                     / (nt - ns + vv - (cw - y) - 1.0))
        sd = np.sqrt(1.0 / (y + 1) + 1.0 / (cw - y + 1))
        out = pd.DataFrame({
            "source": df["source"], "word": df["word"],
            "n_in_source": df["y"].to_numpy(np.int64),
            "z_logodds": textstats.round_half_away(delta / sd, 6)})
        return out.sort_values(["z_logodds", "word"],
                               ascending=[False, True]) \
            .groupby("source", sort=False).head(5)

    cand = with_cw.map_batches(score,
                               batch_format="pandas").to_pandas()
    return cand.sort_values(["z_logodds", "word"],
                            ascending=[False, True]) \
        .groupby("source", sort=False).head(5) \
        .sort_values(["source", "z_logodds", "word"],
                     ascending=[True, False, True],
                     ignore_index=True)


@register("permutation_entropy_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d AS i, CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN e ON e.d = cal.d),
t AS (SELECT x, LEAD(x, 1) OVER (ORDER BY i) AS x1,
             LEAD(x, 2) OVER (ORDER BY i) AS x2
      FROM g),
p AS (SELECT 4 * CASE WHEN x1 > x THEN 1 ELSE 0 END
             + 2 * CASE WHEN x2 > x THEN 1 ELSE 0 END
             + CASE WHEN x2 > x1 THEN 1 ELSE 0 END AS pat
      FROM t WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
c AS (SELECT pat, COUNT(*) AS n FROM p GROUP BY pat),
tt AS (SELECT SUM(n) AS nt FROM c)
SELECT CAST(tt.nt AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS BIGINT) AS distinct_patterns,
       ROUND(-SUM((n * 1.0 / tt.nt) * LN(n * 1.0 / tt.nt)), 6)
           AS perm_entropy
FROM c, tt GROUP BY tt.nt""")
def permutation_entropy_daily(sf_dir: str) -> pd.DataFrame:
    """Permutation entropy (Bandt–Pompe, order 3) of the zero-filled
    daily count series: Shannon entropy of the ordinal comparison
    pattern of each 3-day window — the complexity screen that reads
    the SHAPE of local motion (every window reduced to 'which of the
    three days was highest/lowest'), immune to any monotone
    transform of the counts, catching regularity that survives the
    turning-point and runs tests (a strict weekly sawtooth passes
    both yet collapses PE to near zero). Ties resolve by the
    explicit x_later > x_earlier comparison on BOTH engines, so the
    8-way pattern id is exact integer arithmetic; only the daily
    histogram shuffles and the entropy is closed-form on ≤8 rows."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["d"].to_numpy(np.int64) - lo] = \
        daily["c"].to_numpy(np.int64)
    x0, x1, x2 = x[:-2], x[1:-1], x[2:]
    pat = 4 * (x1 > x0) + 2 * (x2 > x0) + (x2 > x1)
    cnt = np.bincount(pat.astype(np.int64), minlength=8)
    cnt = cnt[cnt > 0]
    nt = int(cnt.sum())
    pr = cnt / nt
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_windows": np.array([nt], np.int64),
        "distinct_patterns": np.array([len(cnt)], np.int64),
        "perm_entropy": [float(rha(-(pr * np.log(pr)).sum(), 6))]})


@register("kendall_w_brand_months", sql="""
WITH bm AS (SELECT p.p_brand AS brand,
                   strftime(l.l_shipdate, '%Y-%m') AS mon,
                   SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                            AS BIGINT)) AS cents
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2),
grid AS (SELECT b.brand, m.mon, COALESCE(bm.cents, 0) AS cents
         FROM (SELECT DISTINCT p_brand AS brand FROM part) b
         CROSS JOIN (SELECT DISTINCT mon FROM bm) m
         LEFT JOIN bm ON bm.brand = b.brand AND bm.mon = m.mon),
r AS (SELECT brand, mon,
             ROW_NUMBER() OVER (PARTITION BY mon
                                ORDER BY cents DESC, brand) AS rk
      FROM grid),
rb AS (SELECT brand, SUM(rk) AS rsum FROM r GROUP BY brand),
mm AS (SELECT COUNT(DISTINCT mon) AS m FROM bm),
nn AS (SELECT COUNT(*) AS n
       FROM (SELECT DISTINCT p_brand FROM part)),
s AS (SELECT SUM((2 * rsum - mm.m * (nn.n + 1))
                 * (2 * rsum - mm.m * (nn.n + 1))) AS d2
      FROM rb, mm, nn)
SELECT CAST(nn.n AS BIGINT) AS n_brands,
       CAST(mm.m AS BIGINT) AS n_months,
       ROUND(3.0 * s.d2
             / (mm.m * mm.m * (nn.n * nn.n * nn.n - nn.n)), 6)
           AS kendall_w
FROM s, mm, nn""")
def kendall_w_brand_months(sf_dir: str) -> pd.DataFrame:
    """Kendall's coefficient of concordance W across the monthly
    brand-revenue rankings: do all months agree on which brands sell
    most (W→1, a stable market) or does the leaderboard reshuffle
    every month (W→0, promo-driven churn)? This is the m-ranker
    generalization the pairwise tools in the suite (RBO between two
    rankers, month-pair rank stability) can't give — one number for
    ALL months at once. Revenue in integer cents; brand-months with
    no sales zero-fill from the full brand list so every month ranks
    the same n; ties break by (cents DESC, brand) identically on
    both engines so ranks are exact integers and W = 3·ΣD²/(m²(n³−n))
    with D = 2R_b − m(n+1) has an exact integer numerator. Only 25
    brand × month integer partials shuffle; part→brand rides along
    as a broadcast dict."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    brands = sorted(set(part["p_brand"].to_pylist()))
    bmap_ref = ray.put(dict(zip(part["p_partkey"].to_numpy(),
                                part["p_brand"].to_pylist())))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "brand": df["l_partkey"].map(ray.get(bmap_ref))
            .astype(str),
            "mon": df["l_shipdate"].dt.strftime("%Y-%m"),
            "cents": np.rint(df["l_extendedprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)})
        return g.groupby(["brand", "mon"], as_index=False).sum()

    bm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pandas"),
        ["brand", "mon"], {"cents": ("cents", "sum")}).to_pandas()
    months = sorted(bm["mon"].unique())
    grid = bm.set_index(["brand", "mon"])["cents"] \
        .reindex(pd.MultiIndex.from_product(
            [brands, months], names=["brand", "mon"]), fill_value=0) \
        .reset_index()
    n, m = len(brands), len(months)
    rsum = {b: 0 for b in brands}
    for mon, d in grid.groupby("mon"):
        d = d.sort_values(["cents", "brand"],
                          ascending=[False, True])
        for rk, b in enumerate(d["brand"], start=1):
            rsum[b] += rk
    d2 = sum((2 * rsum[b] - m * (n + 1)) ** 2 for b in brands)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_brands": np.array([n], np.int64),
        "n_months": np.array([m], np.int64),
        "kendall_w": [float(rha(
            3.0 * d2 / (m * m * (n ** 3 - n)), 6))]})


@register("price_index_monthly", sql="""
WITH pm AS (SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m')
                       AS mon,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem GROUP BY 1, 2),
pq2 AS (SELECT pk, mon, CAST(ROUND(10000.0 * c / q, 0) AS BIGINT)
                            AS p, q
        FROM pm),
b AS (SELECT MIN(mon) AS bm FROM pm),
base AS (SELECT pk, p AS p0, q AS q0 FROM pq2, b WHERE mon = b.bm),
j AS (SELECT t.mon, t.p AS pt, t.q AS qt, base.p0, base.q0
      FROM pq2 t JOIN base USING (pk), b WHERE t.mon <> b.bm)
SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_parts_matched,
       ROUND(SUM(pt * q0) * 1.0 / SUM(p0 * q0), 6) AS laspeyres,
       ROUND(SUM(pt * qt) * 1.0 / SUM(p0 * qt), 6) AS paasche,
       ROUND(SQRT((SUM(pt * q0) * 1.0 / SUM(p0 * q0))
                  * (SUM(pt * qt) * 1.0 / SUM(p0 * qt))), 6)
           AS fisher
FROM j GROUP BY mon ORDER BY mon""")
def price_index_monthly(sf_dir: str) -> pd.DataFrame:
    """Matched-basket price indices per month against the first
    month: Laspeyres (base-quantity weights — 'what would the old
    basket cost now'), Paasche (current weights) and Fisher (their
    geometric mean) over parts sold in BOTH months — the
    inflation-vs-mix decomposition the per-brand markdown and
    elasticity queries can't give, and the honest version of the
    unit-value ratio (which mix shifts contaminate). Per-part unit
    prices are quantized to 1e-4 cents with the SAME double
    expression both engines round half-away, so every basket sum
    Σp·q is an exact integer cross-product and each index is one
    float division; per-(part, month) reduce → per-part map_groups
    pairs each month with the base row (no join shuffle) → per-month
    integer partials. Python-int final sums dodge int64 overflow at
    100 TB basket totals."""
    rha = textstats.round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mon": df["l_shipdate"].dt.strftime("%Y-%m"),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64),
            "q": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64)})
        return g.groupby(["pk", "mon"], as_index=False).sum()

    pm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice", "l_quantity"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mon"], {"c": ("c", "sum"),
                        "q": ("q", "sum")}).materialize()
    bm = pm.map_batches(
        lambda df: pd.DataFrame({"bm": [df["mon"].min()]}),
        batch_format="pandas").to_pandas()["bm"].min()

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        p = rha(10000.0 * g["c"].to_numpy(np.float64)
                / g["q"].to_numpy(np.float64), 0).astype(np.int64)
        g = g.assign(p=p)
        b = g[g["mon"] == bm]
        if not len(b):
            return pd.DataFrame({"mon": [], "n": [], "ptq0": [],
                                 "p0q0": [], "ptqt": [], "p0qt": []})
        p0 = np.int64(b["p"].iloc[0])
        q0 = np.int64(b["q"].iloc[0])
        t = g[g["mon"] != bm]
        pt = t["p"].to_numpy(np.int64)
        qt = t["q"].to_numpy(np.int64)
        return pd.DataFrame({
            "mon": t["mon"].to_numpy(), "n": np.int64(1),
            "ptq0": pt * q0, "p0q0": p0 * q0,
            "ptqt": pt * qt, "p0qt": p0 * qt})

    j = reduce_sink(
        pm.groupby("pk").map_groups(per_part, batch_format="pandas"),
        ["mon"], {"n": ("n", "sum"), "ptq0": ("ptq0", "sum"),
                  "p0q0": ("p0q0", "sum"), "ptqt": ("ptqt", "sum"),
                  "p0qt": ("p0qt", "sum")}).to_pandas() \
        .sort_values("mon", ignore_index=True)
    las = j["ptq0"].astype(object) / j["p0q0"].astype(object)
    paa = j["ptqt"].astype(object) / j["p0qt"].astype(object)
    return pd.DataFrame({
        "mon": j["mon"],
        "n_parts_matched": j["n"].astype(np.int64),
        "laspeyres": rha(las.to_numpy(np.float64), 6),
        "paasche": rha(paa.to_numpy(np.float64), 6),
        "fisher": rha(np.sqrt(las.to_numpy(np.float64)
                              * paa.to_numpy(np.float64)), 6)})


@register("timestamp_heaping_audit", sql="""
WITH s AS (SELECT CAST(date_part('second', ts) AS BIGINT) AS sec,
                  CAST(date_part('minute', ts) AS BIGINT) AS mi
           FROM events),
h AS (SELECT sec, COUNT(*) AS n FROM s GROUP BY sec),
t AS (SELECT SUM(n) AS nt FROM h)
SELECT CAST(t.nt AS BIGINT) AS n_events,
       ROUND(SUM((n - t.nt / 60.0) * (n - t.nt / 60.0)
                 / (t.nt / 60.0)), 6) AS chi2_seconds,
       (SELECT ROUND(SUM(CASE WHEN mi % 5 = 0 THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) FROM s)
           AS share_minute_mult5,
       (SELECT ROUND(SUM(CASE WHEN sec = 0 THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) FROM s)
           AS share_second_zero
FROM h, t GROUP BY t.nt""")
def timestamp_heaping_audit(sf_dir: str) -> pd.DataFrame:
    """Timestamp-heaping forensics: χ² of the seconds-of-minute
    histogram against uniform, plus the :00-second and
    multiple-of-5-minute shares — the 'are these timestamps real or
    reconstructed?' screen (batch loaders, manual backfills and
    log-rotation stamps pile onto round marks; genuine event streams
    are second-uniform). Heaping silently breaks every
    gap/session/burst query downstream, which is why it's a
    first-class audit. Each batch emits one 60-bin integer histogram
    row (O(60) bytes regardless of batch size); the χ² is
    closed-form on the single combined row."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].dt.second.to_numpy(np.int64)
        mi = df["ts"].dt.minute.to_numpy(np.int64)
        h = np.bincount(sec, minlength=60).astype(np.int64)
        out = {f"s{i}": [h[i]] for i in range(60)}
        out["m5"] = [np.int64((mi % 5 == 0).sum())]
        out["one_"] = [1]
        return pd.DataFrame(out)

    aggs = {f"s{i}": (f"s{i}", "sum") for i in range(60)}
    aggs["m5"] = ("m5", "sum")
    t = reduce_sink(
        _events(sf_dir, ["ts"])
        .map_batches(partial, batch_format="pandas"),
        ["one_"], aggs).to_pandas()
    h = np.array([int(t[f"s{i}"].iloc[0]) for i in range(60)],
                 np.float64)
    n = h.sum()
    e = n / 60.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_events": np.array([int(n)], np.int64),
        "chi2_seconds": [float(rha(((h - e) ** 2 / e).sum(), 6))],
        "share_minute_mult5": [float(rha(
            int(t["m5"].iloc[0]) / n, 6))],
        "share_second_zero": [float(rha(h[0] / n, 6))]})


@register("lang_segregation_index", sql="""
WITH c AS (SELECT source, lang, COUNT(*) AS n
           FROM documents GROUP BY 1, 2),
s AS (SELECT source, SUM(n) AS ns FROM c GROUP BY source),
l AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY lang),
t AS (SELECT SUM(n) AS nt FROM c),
grid AS (SELECT l.lang, s.source, COALESCE(c.n, 0) AS nsl,
                s.ns, l.nl, t.nt
         FROM l CROSS JOIN s
         LEFT JOIN c ON c.source = s.source AND c.lang = l.lang, t)
SELECT lang, CAST(MAX(nl) AS BIGINT) AS n_docs,
       ROUND(SUM(ABS(nsl * (nt - nl) - (ns - nsl) * nl))
             / (2.0 * MAX(nl) * MAX(nt - nl)), 6) AS dissimilarity
FROM grid GROUP BY lang ORDER BY lang""")
def lang_segregation_index(sf_dir: str) -> pd.DataFrame:
    """Duncan index of dissimilarity per language across corpus
    sources: the share of a language's documents that would have to
    MOVE to a different source for the language to be spread like
    the rest of the corpus — the 'is Japanese basically one
    crawl?' concentration read that per-source language entropy
    blurs (entropy can't say one language is ghettoized while
    another with the same entropy is merely small). D = Σ_s
    |n_sl·(N−N_l) − (n_s−n_sl)·N_l| / (2·N_l·(N−N_l)) has an exact
    integer numerator folded in Python ints; only (source, lang)
    count partials shuffle and the sources×langs grid is tiny."""
    c = reduce_sink(
        _docs(sf_dir, ["source", "lang"]).map_batches(
            lambda df: df.groupby(["source", "lang"], as_index=False)
            .size().rename(columns={"size": "n"}),
            batch_format="pandas"),
        ["source", "lang"], {"n": ("n", "sum")}).to_pandas()
    ns = c.groupby("source")["n"].sum().to_dict()
    nl = c.groupby("lang")["n"].sum().to_dict()
    nt = int(c["n"].sum())
    cell = {(s, lg): int(n)
            for s, lg, n in zip(c["source"], c["lang"], c["n"])}
    rha = textstats.round_half_away
    rows = []
    for lg in sorted(nl):
        nld = int(nl[lg])
        ml = nt - nld
        num = sum(abs(cell.get((s, lg), 0) * ml
                      - (int(ns[s]) - cell.get((s, lg), 0)) * nld)
                  for s in ns)
        rows.append((lg, nld, float(rha(num / (2.0 * nld * ml), 6))))
    return pd.DataFrame(rows,
                        columns=["lang", "n_docs", "dissimilarity"]) \
        .astype({"n_docs": np.int64})


@register("discount_icc_orders", sql="""
WITH l AS (SELECT l_orderkey AS k,
                  CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d
           FROM lineitem),
g AS (SELECT k, COUNT(*) AS nj, SUM(d) AS sj, SUM(d * d) AS qj
      FROM l GROUP BY k),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
             CAST(SUM(nj) AS BIGINT) AS nn,
             CAST(SUM(sj) AS BIGINT) AS ss,
             CAST(SUM(qj) AS BIGINT) AS qq,
             CAST(SUM(nj * nj) AS BIGINT) AS n2,
             CAST(SUM(CAST(232792560 * sj * sj / nj AS BIGINT))
                  AS BIGINT) AS tm
      FROM g)
SELECT kk AS n_orders, nn AS n_lines,
       ROUND((tm / 232792560.0 - ss * ss * 1.0 / nn) / (kk - 1), 6)
           AS msb,
       ROUND((qq - tm / 232792560.0) / (nn - kk), 6) AS msw,
       ROUND(((tm / 232792560.0 - ss * ss * 1.0 / nn) / (kk - 1)
              - (qq - tm / 232792560.0) / (nn - kk))
             / ((tm / 232792560.0 - ss * ss * 1.0 / nn) / (kk - 1)
                + ((nn - n2 * 1.0 / nn) / (kk - 1) - 1)
                * (qq - tm / 232792560.0) / (nn - kk)), 6) AS icc
FROM a""")
def discount_icc_orders(sf_dir: str) -> pd.DataFrame:
    """Intraclass correlation of line discounts within orders —
    one-way random-effects ANOVA: does the discount belong to the
    ORDER (negotiated per deal → ICC→1) or to the LINE (per-item
    promos → ICC→0)? That attribution decides whether discount
    analytics should aggregate at order or line grain, a question
    none of the discount-band/Simpson audits answer. Every ANOVA
    moment is an exact integer: the awkward Σ S_j²/n_j is scaled by
    lcm(1..20) = 232 792 560 so each per-order term is an exact
    ≤2^53 integer (orders cap out at 17 lines), and MSB/MSW/ICC are
    the same closed-form double expression over those integers on
    both engines. Per-order (n, ΣD, ΣD²) partials reduce first, so
    only one row per order shuffles, then per-block scalar
    partials fold driver-side in Python ints."""
    M = 232792560

    def per_order_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = np.rint(df["l_discount"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        g = pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64),
                          "nj": np.int64(1), "sj": d, "qj": d * d})
        return g.groupby("k", as_index=False).sum()

    per_order = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_discount"])
        .map_batches(per_order_partial, batch_format="pandas"),
        ["k"], {"nj": ("nj", "sum"), "sj": ("sj", "sum"),
                "qj": ("qj", "sum")})

    def scalars(df: pd.DataFrame) -> pd.DataFrame:
        nj = df["nj"].to_numpy(np.int64)
        sj = df["sj"].to_numpy(np.int64)
        return pd.DataFrame({
            "kk": [np.int64(len(df))], "nn": [nj.sum()],
            "ss": [sj.sum()], "qq": [df["qj"].sum()],
            "n2": [(nj * nj).sum()],
            "tm": [np.rint(M * sj.astype(np.float64) ** 2
                           / nj).astype(np.int64).sum()]})

    p = per_order.map_batches(scalars,
                              batch_format="pandas").to_pandas()
    kk = int(p["kk"].sum())
    nn = int(p["nn"].sum())
    ss = int(p["ss"].sum())
    qq = int(p["qq"].sum())
    n2 = int(p["n2"].sum())
    tm = int(p["tm"].sum())
    msb = (tm / float(M) - ss * ss * 1.0 / nn) / (kk - 1)
    msw = (qq - tm / float(M)) / (nn - kk)
    n0 = (nn - n2 * 1.0 / nn) / (kk - 1)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_orders": np.array([kk], np.int64),
        "n_lines": np.array([nn], np.int64),
        "msb": [float(rha(msb, 6))],
        "msw": [float(rha(msw, 6))],
        "icc": [float(rha((msb - msw)
                          / (msb + (n0 - 1) * msw), 6))]})


@register("spectral_flatness_daily", sql="""
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
        FROM g, m, per GROUP BY per.p, m.n),
pw AS (SELECT p, (c * c + s * s)
                 / ((SELECT n FROM m)
                    * CAST((SELECT n FROM m) AS DOUBLE)) AS power
       FROM dft)
SELECT CAST(COUNT(*) AS BIGINT) AS n_periods,
       ROUND(EXP(AVG(LN(power))) / AVG(power), 6) AS flatness,
       (SELECT CAST(p AS BIGINT) FROM pw
        ORDER BY ROUND(power, 6) DESC, p LIMIT 1) AS peak_period,
       (SELECT ROUND(MAX(power) / (SELECT SUM(power) FROM pw), 6)
        FROM pw) AS peak_share
FROM pw""")
def spectral_flatness_daily(sf_dir: str) -> pd.DataFrame:
    """Wiener entropy (spectral flatness) of the daily-volume
    periodogram over candidate periods 2–14 days: geometric /
    arithmetic mean of spectral power — the one-number 'is traffic
    rhythmic or noise?' verdict on top of [[daily_period_power]]'s
    13-row spectrum (flatness→1 white noise, →0 a single dominant
    cycle), plus the dominant period and its power share. Powers
    are rounded to 6dp BEFORE the argmax so both engines break
    near-ties identically. Same Goertzel-style partials: only
    (day, count) rows shuffle, the DFT runs on the zero-filled
    series driver-side where it is O(13·days)."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    y = np.zeros(hi - lo + 1, np.float64)
    y[daily["d"].to_numpy(np.int64) - lo] = \
        daily["c"].to_numpy(np.float64)
    n = len(y)
    yc = y - y.sum() / n
    t = np.arange(n, dtype=np.float64)
    pows = []
    for p in range(2, 15):
        w = 2 * np.pi * t / p
        c = (yc * np.cos(w)).sum()
        s = (yc * np.sin(w)).sum()
        pows.append((c * c + s * s) / (n * float(n)))
    pows = np.array(pows)
    rha = textstats.round_half_away
    pr = rha(pows, 6)
    peak_i = int(np.lexsort((np.arange(len(pr)), -pr))[0])
    return pd.DataFrame({
        "n_periods": np.array([len(pows)], np.int64),
        "flatness": [float(rha(
            np.exp(np.log(pows).mean()) / pows.mean(), 6))],
        "peak_period": np.array([peak_i + 2], np.int64),
        "peak_share": [float(rha(pows.max() / pows.sum(), 6))]})


@register("priority_escalation_matrix", sql="""
WITH s AS (SELECT o_custkey AS c, o_orderpriority AS p,
                  LAG(o_orderpriority) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
t AS (SELECT prev AS from_priority, p AS to_priority,
             COUNT(*) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
SELECT from_priority, to_priority, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_priority), 6)
           AS row_share
FROM t ORDER BY 1, 2""")
def priority_escalation_matrix(sf_dir: str) -> pd.DataFrame:
    """Order-priority Markov matrix over each customer's SUCCESSIVE
    orders (ties broken (o_orderdate, o_orderkey) identically on
    both engines): does a customer who just placed a 1-URGENT order
    stay urgent (sticky service tier) or regress to the mix
    (priority is per-shipment noise)? The per-customer sequential
    read none of the static priority histograms give — it's the
    orders-table sibling of the event-type transition matrix, but
    keyed by business entity, not session. Customers hash into 32
    coarse buckets so each transition is counted inside one
    map_groups sort; only (from, to, n) integer partials shuffle
    and the row-normalization is one exact division per cell."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderpriority",
                                  "o_orderdate", "o_orderkey"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["o_custkey"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        same = g["o_custkey"].eq(g["o_custkey"].shift())
        prev = g["o_orderpriority"].shift()
        t = pd.DataFrame({"from_priority": prev[same],
                          "to_priority": g["o_orderpriority"][same]})
        out = t.groupby(["from_priority", "to_priority"],
                        as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(transitions,
                                       batch_format="pandas"),
        ["from_priority", "to_priority"], {"n": ("n", "sum")}) \
        .to_pandas().sort_values(["from_priority", "to_priority"],
                                 ignore_index=True)
    tot = out.groupby("from_priority")["n"].transform("sum")
    rha = textstats.round_half_away
    out["n"] = out["n"].astype(np.int64)
    out["row_share"] = rha(out["n"].to_numpy(np.float64)
                           / tot.to_numpy(np.float64), 6)
    return out


def _part_month_cents(sf_dir: str) -> rd.Dataset:
    """(pk, mi, c): per-part per-month revenue cents with the month
    as an integer index y*12+m — one row per pair globally."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"]
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mi": (d.dt.year * 12 + d.dt.month).to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64)})
        return g.groupby(["pk", "mi"], as_index=False).sum()

    return reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mi"], {"c": ("c", "sum")})


@register("revenue_by_part_vintage", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   strftime(l_shipdate, '%Y-%m') AS mon,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c
            FROM lineitem GROUP BY 1, 2, 3),
f AS (SELECT pk, MIN(mi) AS m0 FROM pm GROUP BY pk),
v AS (SELECT pm.mon, CASE WHEN pm.mi - f.m0 < 3 THEN 'new'
                          WHEN pm.mi - f.m0 < 12 THEN 'recent'
                          ELSE 'mature' END AS vintage, pm.c
      FROM pm JOIN f USING (pk))
SELECT mon, vintage, CAST(SUM(c) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM v GROUP BY 1, 2 ORDER BY 1, 2""")
def revenue_by_part_vintage(sf_dir: str) -> pd.DataFrame:
    """Catalog-vintage revenue decomposition: each month's revenue
    split by how old the selling part is (new < 3 months since its
    first-ever sale, recent < 12, mature ≥ 12) — the
    'is growth coming from new SKUs or the back catalog?' read, the
    part-side mirror of the first-vs-repeat customer split. The
    per-(part, month) cents reduce runs first so a part's whole
    history sits in one map_groups call where its launch month is a
    local min — no self-join; only (month, vintage) integer
    partials shuffle afterwards."""
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        mi = g["mi"].to_numpy(np.int64)
        age = mi - mi.min()
        vintage = np.where(age < 3, "new",
                           np.where(age < 12, "recent", "mature"))
        return pd.DataFrame({"mi": mi, "vintage": vintage,
                             "revenue_cents": g["c"]
                             .to_numpy(np.int64),
                             "n_parts": np.int64(1)})

    out = reduce_sink(
        _part_month_cents(sf_dir).groupby("pk")
        .map_groups(per_part, batch_format="pandas"),
        ["mi", "vintage"],
        {"revenue_cents": ("revenue_cents", "sum"),
         "n_parts": ("n_parts", "sum")}).to_pandas()
    mi = out["mi"].to_numpy(np.int64)
    out["mon"] = [f"{(m - 1) // 12}-{(m - 1) % 12 + 1:02d}"
                  for m in mi]
    return out[["mon", "vintage", "revenue_cents", "n_parts"]] \
        .astype({"revenue_cents": np.int64, "n_parts": np.int64}) \
        .sort_values(["mon", "vintage"], ignore_index=True)


@register("part_lifecycle_hist", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi
            FROM lineitem GROUP BY 1, 2),
p AS (SELECT pk, MAX(mi) - MIN(mi) AS span,
             COUNT(*) AS active
      FROM pm GROUP BY pk)
SELECT CAST(span AS BIGINT) AS span_months,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(active * 1.0), 6) AS avg_active_months,
       ROUND(AVG(active * 1.0 / (span + 1)), 6) AS avg_fill_rate
FROM p GROUP BY span ORDER BY span""")
def part_lifecycle_hist(sf_dir: str) -> pd.DataFrame:
    """Part lifecycle histogram: distribution of each SKU's selling
    span (months between first and last sale) with how densely it
    actually sold inside that span (avg active months and fill
    rate) — separates the always-on staple (span 80, fill ~1) from
    the zombie SKU that sold twice three years apart (span 36, fill
    0.05), a distinction total-revenue rankings hide. Each part's
    span/active-count is local to its map_groups call after the
    (part, month) dedup reduce; only (span, n, Σactive, Σfill)
    partials shuffle, with the fill-rate sum kept exact as an
    integer pair (active, span+1) folded via per-span lcm-free
    rational accumulation in Python Fractions driver-side."""
    from fractions import Fraction

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        mi = g["mi"].to_numpy(np.int64)
        span = int(mi.max() - mi.min())
        return pd.DataFrame({"span_months": [np.int64(span)],
                             "active": [np.int64(len(np.unique(mi)))],
                             "n_parts": [np.int64(1)]})

    cells = reduce_sink(
        _part_month_cents(sf_dir).groupby("pk")
        .map_groups(per_part, batch_format="pandas"),
        ["span_months", "active"],
        {"n_parts": ("n_parts", "sum")}).to_pandas()
    rha = textstats.round_half_away
    out = []
    for span, d in cells.groupby("span_months", sort=True):
        n = int(d["n_parts"].sum())
        act = sum(int(a) * int(k)
                  for a, k in zip(d["active"], d["n_parts"]))
        fill = sum((Fraction(int(a), span + 1) * int(k)
                    for a, k in zip(d["active"], d["n_parts"])),
                   Fraction(0))
        out.append((int(span), n, float(rha(act / n, 6)),
                    float(rha(float(fill) / n, 6))))
    return pd.DataFrame(out, columns=["span_months", "n_parts",
                                      "avg_active_months",
                                      "avg_fill_rate"]) \
        .astype({"span_months": np.int64, "n_parts": np.int64})


_CHILDLESS_RELS = [
    ("customers_without_orders", "customer", "c_custkey",
     "orders", "o_custkey"),
    ("nations_without_customers", "nation", "n_nationkey",
     "customer", "c_nationkey"),
    ("orders_without_lineitems", "orders", "o_orderkey",
     "lineitem", "l_orderkey"),
    ("parts_never_sold", "part", "p_partkey",
     "lineitem", "l_partkey"),
    ("suppliers_never_used", "supplier", "s_suppkey",
     "lineitem", "l_suppkey"),
]


def _childless_rel_sql(rel, pt, pk, ct, ck):
    return f"""
  SELECT '{rel}' AS rel,
         CAST(COUNT(*) AS BIGINT) AS parent_keys,
         CAST(COUNT(*) FILTER (WHERE c.k IS NULL) AS BIGINT)
             AS childless
  FROM (SELECT DISTINCT {pk} AS k FROM {pt}) p
  LEFT JOIN (SELECT DISTINCT {ck} AS k FROM {ct}) c USING (k)"""


@register("childless_parents_audit", sql=(
    "\nUNION ALL".join(_childless_rel_sql(*r)
                       for r in _CHILDLESS_RELS)
    + "\nORDER BY rel"))
def childless_parents_audit(sf_dir: str) -> pd.DataFrame:
    """The reverse of [[fk_orphan_matrix]]: parents with ZERO
    children — customers who never ordered, orders with no line
    items (a broken load: every order must carry lines), parts
    never sold, suppliers never used, nations with no customers.
    Orphans break joins; childless parents break BUSINESS
    assumptions (dead catalog weight, registration-only accounts,
    half-loaded orders) and silently shrink every inner join in the
    suite. Same key-level tag-union: both sides collapse to
    distinct keys per batch, one groupby max-combines presence
    bits, a second tiny reduce counts per relation — fact tables
    never shuffle."""
    def side_fn(col, is_parent):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            k = df[col].drop_duplicates().to_numpy(np.int64)
            return pd.DataFrame({
                "k": k,
                "p": np.int64(1 if is_parent else 0),
                "ch": np.int64(0 if is_parent else 1)})
        return f

    parts = []
    for rel, pt, pk, ct, ck in _CHILDLESS_RELS:
        pds = rd.read_parquet(f"{sf_dir}/{pt}.parquet",
                              columns=[pk]) \
            .map_batches(side_fn(pk, True), batch_format="pandas") \
            .add_column("rel", lambda df, r=rel: r,
                        batch_format="pandas")
        cds = rd.read_parquet(f"{sf_dir}/{ct}.parquet",
                              columns=[ck]) \
            .map_batches(side_fn(ck, False), batch_format="pandas") \
            .add_column("rel", lambda df, r=rel: r,
                        batch_format="pandas")
        parts.extend([pds, cds])
    per_key = reduce_sink(parts[0].union(*parts[1:]), ["rel", "k"],
                          {"p": ("p", "max"), "ch": ("ch", "max")})
    # child-only keys (orphans) are a different audit's subject and
    # drop out of the parent filter below

    def rel_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p"].eq(1)]
        g = df.groupby("rel", sort=False)
        return pd.DataFrame({
            "parent_keys": g.size().astype(np.int64),
            "childless": df[df["ch"].eq(0)]
            .groupby("rel", sort=False).size()
            .reindex(g.size().index, fill_value=0)
            .astype(np.int64)}).reset_index()

    out = reduce_sink(
        per_key.map_batches(rel_partial, batch_format="pandas"),
        ["rel"], {"parent_keys": ("parent_keys", "sum"),
                  "childless": ("childless", "sum")}).to_pandas()
    return out[["rel", "parent_keys", "childless"]] \
        .sort_values("rel", ignore_index=True)


@register("hour_of_week_coverage", sql="""
WITH e AS (SELECT event_type,
                  dayofweek(ts) * 24 + hour(ts) AS cell
           FROM events),
c AS (SELECT event_type, cell, COUNT(*) AS n FROM e GROUP BY 1, 2),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS nonempty,
             CAST(MIN(n) AS BIGINT) AS min_cell
      FROM c GROUP BY event_type)
SELECT event_type, n_events,
       CAST(168 - nonempty AS BIGINT) AS empty_cells,
       min_cell,
       ROUND(168.0 * EXP(-(n_events / 168.0)), 6)
           AS expected_empty
FROM t ORDER BY event_type""")
def hour_of_week_coverage(sf_dir: str) -> pd.DataFrame:
    """Hour-of-week coverage audit per event type: how many of the
    168 weekly cells never fire, against the Poisson expectation
    168·e^(−n/168) — far MORE empty cells than expected means the
    producer only runs on a schedule (a batch job masquerading as
    an event stream, or an SDK dark outside business hours), which
    the 24-bin hourly χ² can't see because it folds all days
    together. Plus the thinnest live cell as the worst-case
    monitoring floor. One (type, cell) integer reduce — at most
    types×168 rows shuffle regardless of input size."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dow = (df["ts"].dt.dayofweek + 1) % 7  # match SQL: Sun=0
        g = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "cell": (dow * 24 + df["ts"].dt.hour)
            .to_numpy(np.int64)}) \
            .groupby(["event_type", "cell"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "cell"], {"n": ("n", "sum")}).to_pandas()
    rha = textstats.round_half_away
    rows = []
    for et, d in c.groupby("event_type", sort=True):
        n = int(d["n"].sum())
        rows.append((et, n, 168 - len(d), int(d["n"].min()),
                     float(rha(168.0 * np.exp(-(n / 168.0)), 6))))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "empty_cells", "min_cell",
                                       "expected_empty"]) \
        .astype({"n_events": np.int64, "empty_cells": np.int64,
                 "min_cell": np.int64})


@register("term_burstiness_top", sql=r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
dc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
a AS (SELECT word, SUM(c) AS cf, COUNT(*) AS df,
             SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS df2
      FROM dc GROUP BY word)
SELECT word, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
       ROUND(cf * 1.0 / df, 6) AS burstiness,
       ROUND(df2 * 1.0 / df, 6) AS adaptation
FROM a ORDER BY cf DESC, word LIMIT 20""")
def term_burstiness_top(sf_dir: str) -> pd.DataFrame:
    """Church–Gale burstiness for the corpus top-20 words: mean
    occurrences per CONTAINING doc (cf/df) and the adaptation
    probability P(k≥2 | k≥1) — the 'once a word appears it keeps
    appearing' diagnostic that separates topical words (bursty,
    adaptation→1) from function words (Poisson-flat) even when
    their raw frequencies are identical; it's the term-level prior
    behind why tf saturation (BM25's k1) works. Docs are atomic
    within a batch, so per-(doc, word) counts complete locally and
    only (word, cf, df, df2) partials shuffle; after the combine
    each word is globally unique, so block-local top-20 partials
    cover the global top-20 exactly."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["doc_id", "text"]].copy()
        t["word"] = t["text"].fillna("").str.split()
        t = t[["doc_id", "word"]].explode("word").dropna()
        dc = t.groupby(["doc_id", "word"], sort=False).size()
        g = dc.rename("c").reset_index()
        out = g.groupby("word", sort=False).agg(
            cf=("c", "sum"), df=("c", "size"))
        out["df2"] = g[g["c"] >= 2].groupby("word", sort=False) \
            .size().reindex(out.index, fill_value=0)
        return out.astype(np.int64).reset_index()

    agg = reduce_sink(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas"),
        ["word"], {"cf": ("cf", "sum"), "df": ("df", "sum"),
                   "df2": ("df2", "sum")}).materialize()

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return top_n_pandas(df, "word", "cf", 20)

    cand = agg.map_batches(local_top,
                           batch_format="pandas").to_pandas()
    top = top_n_pandas(cand, "word", "cf", 20)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "word": top["word"].to_numpy(),
        "cf": top["cf"].to_numpy(np.int64),
        "df": top["df"].to_numpy(np.int64),
        "burstiness": rha(top["cf"].to_numpy(np.float64)
                          / top["df"].to_numpy(np.float64), 6),
        "adaptation": rha(top["df2"].to_numpy(np.float64)
                          / top["df"].to_numpy(np.float64), 6)})


@register("part_sourcing_nations", sql="""
WITH ps AS (SELECT DISTINCT l.l_partkey AS pk, s.s_nationkey AS nk
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey),
c AS (SELECT pk, COUNT(*) AS nations FROM ps GROUP BY pk)
SELECT CAST(nations AS BIGINT) AS n_source_nations,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM c GROUP BY nations ORDER BY nations""")
def part_sourcing_nations(sf_dir: str) -> pd.DataFrame:
    """Supply-chain geographic concentration: for each part, how
    many DISTINCT NATIONS its suppliers ship from, histogrammed —
    the single-country-exposure screen ([[suppliers_per_part_hist]]
    counts suppliers, but five suppliers in one nation is still one
    port strike away from a stockout; this collapses the supplier
    hop through the s_suppkey→s_nationkey broadcast dict). Each
    batch emits distinct (part, nation) pairs, the combine leaves
    one row per pair, and the per-part distinct count is a disjoint
    per-group size — only pair rows and then (nations, n_parts)
    integers shuffle."""
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nmap_ref = ray.put(dict(zip(
        sup["s_suppkey"].to_numpy(),
        sup["s_nationkey"].to_numpy().astype(np.int64))))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "nk": df["l_suppkey"].map(ray.get(nmap_ref))
            .to_numpy(np.int64),
            "one_": np.int64(1)})
        return out.drop_duplicates(subset=["pk", "nk"])

    per_pair = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_suppkey"])
        .map_batches(pairs, batch_format="pandas"),
        ["pk", "nk"], {"one_": ("one_", "max")})

    # a pk's (pk, nk) rows may land in different hash buckets, so
    # count nations per part with a second full-key reduce
    cnt = reduce_sink(per_pair, ["pk"],
                      {"one_": ("one_", "sum")}).to_pandas()
    h = cnt.groupby("one_", sort=True).size().rename("n_parts") \
        .reset_index().rename(columns={"one_": "n_source_nations"})
    return h.astype({"n_source_nations": np.int64,
                     "n_parts": np.int64})


@register("conformal_value_coverage", sql="""
WITH e AS (SELECT event_type AS t,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                  event_id % 2 = 0 AS cal
           FROM events),
calv AS (SELECT t, c,
                ROW_NUMBER() OVER (PARTITION BY t ORDER BY c) AS rk,
                COUNT(*) OVER (PARTITION BY t) AS n
         FROM e WHERE cal),
med AS (SELECT t, MAX(n) AS n_cal,
               MAX(CASE WHEN rk = (n + 1) // 2 THEN c END) AS med
        FROM calv GROUP BY t),
sc AS (SELECT calv.t, ABS(calv.c - med.med) AS s,
              ROW_NUMBER() OVER (PARTITION BY calv.t
                                 ORDER BY ABS(calv.c - med.med))
                  AS rk,
              med.n_cal
       FROM calv JOIN med ON med.t = calv.t),
q AS (SELECT t, MAX(n_cal) AS n_cal,
             MAX(CASE WHEN rk = LEAST(CAST(CEIL(0.9 * (n_cal + 1))
                                           AS BIGINT), n_cal)
                      THEN s END) AS qhat
      FROM sc GROUP BY t),
tst AS (SELECT e.t, COUNT(*) AS n_test,
               SUM(CASE WHEN ABS(e.c - med.med) <= q.qhat
                        THEN 1 ELSE 0 END) AS cov
        FROM e JOIN med ON med.t = e.t JOIN q ON q.t = e.t
        WHERE NOT e.cal GROUP BY e.t)
SELECT tst.t AS event_type, CAST(q.n_cal AS BIGINT) AS n_cal,
       CAST(tst.n_test AS BIGINT) AS n_test,
       CAST(med.med AS BIGINT) AS median_cents,
       CAST(q.qhat AS BIGINT) AS qhat_cents,
       ROUND(cov * 1.0 / tst.n_test, 6) AS coverage
FROM tst JOIN med ON med.t = tst.t JOIN q ON q.t = tst.t
ORDER BY 1""")
def conformal_value_coverage(sf_dir: str) -> pd.DataFrame:
    """Split-conformal prediction-interval audit per event type:
    calibrate on even event_ids (point prediction = low median,
    nonconformity = |value − median|, q̂ = the ⌈0.9(n+1)⌉-th
    smallest score — the distribution-free 90% band), then measure
    ACTUAL coverage on the odd half. The finite-sample guarantee
    says coverage ≥ 0.9 no matter the distribution; a type that
    lands at 0.84 has drifted between halves — the
    model-free monitoring primitive that turns the suite's drift
    detectors into a decision rule with a guarantee. Everything is
    integer order statistics on cents histograms: one
    (type, cents, split) count reduce shuffles — distinct cents is
    bounded by the value range — and medians, score quantiles and
    coverage all fold from the same histogram driver-side."""
    import math

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "t": df["event_type"].astype(str),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64),
            "cal": (df["event_id"].to_numpy(np.int64) % 2 == 0)
            .astype(np.int64)}) \
            .groupby(["t", "c", "cal"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    h = reduce_sink(
        _events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["t", "c", "cal"], {"n": ("n", "sum")}).to_pandas()
    rha = textstats.round_half_away
    rows = []
    for t, d in h.groupby("t", sort=True):
        cal = d[d["cal"] == 1].sort_values("c")
        tst = d[d["cal"] == 0].sort_values("c")
        cv = cal["c"].to_numpy(np.int64)
        cn = cal["n"].to_numpy(np.int64)
        n_cal = int(cn.sum())
        cum = cn.cumsum()
        med = int(cv[np.searchsorted(cum, (n_cal + 1) // 2,
                                     side="left")])
        # score histogram: fold |c - med| cells
        s = np.abs(cv - med)
        sh = pd.DataFrame({"s": s, "n": cn}) \
            .groupby("s", sort=True).sum()
        scum = sh["n"].to_numpy(np.int64).cumsum()
        k = min(int(math.ceil(0.9 * (n_cal + 1))), n_cal)
        qhat = int(sh.index.to_numpy(np.int64)[
            np.searchsorted(scum, k, side="left")])
        n_test = int(tst["n"].sum())
        cov = int(tst["n"][np.abs(tst["c"].to_numpy(np.int64)
                                  - med) <= qhat].sum())
        rows.append((t, n_cal, n_test, med, qhat,
                     float(rha(cov / n_test, 6))))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_cal", "n_test", "median_cents",
        "qhat_cents", "coverage"]) \
        .astype({"n_cal": np.int64, "n_test": np.int64,
                 "median_cents": np.int64, "qhat_cents": np.int64})


@register("sprt_crossing_day", sql="""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS n,
                  SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS k
           FROM events GROUP BY 1),
c AS (SELECT day,
             SUM(k) OVER (ORDER BY day) AS kk,
             SUM(n) OVER (ORDER BY day) AS nn
      FROM d),
l AS (SELECT day,
             kk * LN(0.20 / 0.15)
             + (nn - kk) * LN(0.80 / 0.85) AS llr
      FROM c)
SELECT CAST((SELECT COUNT(*) FROM l) AS BIGINT) AS n_days,
       CAST(COALESCE(MIN(CASE WHEN ABS(llr) >= LN(19.0)
                               THEN day END), -1) AS BIGINT)
           AS first_cross_day,
       (SELECT CASE WHEN llr >= LN(19.0) THEN 'accept_h1'
                    WHEN llr <= -LN(19.0) THEN 'accept_h0'
                    ELSE 'continue' END
        FROM l ORDER BY day DESC LIMIT 1) AS decision,
       (SELECT ROUND(llr, 6) FROM l ORDER BY day DESC LIMIT 1)
           AS final_llr
FROM l""")
def sprt_crossing_day(sf_dir: str) -> pd.DataFrame:
    """Wald's sequential probability ratio test on the daily
    purchase share — H0: p = 0.15 vs H1: p = 0.20 with α = β = 0.05
    boundaries ±ln 19: which calendar day does the evidence cross,
    and what's the verdict at stream end? This is the SEQUENTIAL
    companion the fixed-horizon z-test and CUSUM peak can't give —
    SPRT is the optimal stopping rule (fewest expected samples at
    either hypothesis), the statistic a streaming monitor would
    actually run. LLR = K·ln(p1/p0) + (N−K)·ln(q1/q0) over exact
    cumulative integers, so both engines compare the identical
    doubles against the boundary; only (day, n, k) integer partials
    shuffle and the scan is O(days) driver-side."""
    daily = reduce_sink(
        _events(sf_dir, ["ts", "event_type"]).map_batches(
            lambda df: pd.DataFrame({
                "day": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 86_400_000_000,
                "n": np.int64(1),
                "k": (df["event_type"] == "purchase")
                .to_numpy().astype(np.int64)}),
            batch_format="pandas"),
        ["day"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas().sort_values("day", ignore_index=True)
    kk = daily["k"].to_numpy(np.int64).cumsum()
    nn = daily["n"].to_numpy(np.int64).cumsum()
    a = np.log(0.20 / 0.15)
    b = np.log(0.80 / 0.85)
    llr = kk * a + (nn - kk) * b
    bound = np.log(19.0)
    cross = np.nonzero(np.abs(llr) >= bound)[0]
    first = int(daily["day"].iloc[cross[0]]) if len(cross) else -1
    final = float(llr[-1])
    decision = "accept_h1" if final >= bound else \
        ("accept_h0" if final <= -bound else "continue")
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([len(daily)], np.int64),
        "first_cross_day": np.array([first], np.int64),
        "decision": [decision],
        "final_llr": [float(rha(final, 6))]})


@register("table_freshness_matrix", sql="""
WITH spans AS (
  SELECT 'events' AS tbl,
         MIN(epoch_us(ts) // 86400000000) AS lo,
         MAX(epoch_us(ts) // 86400000000) AS hi
  FROM events
  UNION ALL
  SELECT 'lineitem',
         MIN(epoch_us(l_shipdate) // 86400000000),
         MAX(epoch_us(l_shipdate) // 86400000000)
  FROM lineitem
  UNION ALL
  SELECT 'orders',
         MIN(epoch_us(o_orderdate) // 86400000000),
         MAX(epoch_us(o_orderdate) // 86400000000)
  FROM orders)
SELECT tbl, CAST(lo AS BIGINT) AS min_day,
       CAST(hi AS BIGINT) AS max_day,
       CAST(hi - lo AS BIGINT) AS span_days,
       CAST(MAX(hi) OVER () - hi AS BIGINT) AS days_behind
FROM spans ORDER BY tbl""")
def table_freshness_matrix(sf_dir: str) -> pd.DataFrame:
    """Cross-TABLE freshness matrix: epoch-day range of every
    date-bearing table and how many days each lags the freshest one
    — the warehouse-level load audit ([[type_staleness_audit]]
    watches streams WITHIN events; this catches a whole table whose
    loader died, the failure mode that poisons every cross-table
    join with silent partial truth). Each table contributes one
    (min, max) scalar partial per batch; three rows total reach the
    driver."""
    def span_fn(col, tbl, is_us):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            d = df[col].to_numpy("datetime64[us]").astype(np.int64) \
                // 86_400_000_000
            return pd.DataFrame({"tbl": [tbl],
                                 "lo": [np.int64(d.min())],
                                 "hi": [np.int64(d.max())]})
        return f

    parts = [
        _events(sf_dir, ["ts"]).map_batches(
            span_fn("ts", "events", True), batch_format="pandas"),
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_shipdate"]).map_batches(
            span_fn("l_shipdate", "lineitem", False),
            batch_format="pandas"),
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"]).map_batches(
            span_fn("o_orderdate", "orders", False),
            batch_format="pandas"),
    ]
    out = reduce_sink(parts[0].union(*parts[1:]), ["tbl"],
                      {"lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas().sort_values("tbl", ignore_index=True)
    gmax = int(out["hi"].max())
    return pd.DataFrame({
        "tbl": out["tbl"],
        "min_day": out["lo"].astype(np.int64),
        "max_day": out["hi"].astype(np.int64),
        "span_days": (out["hi"] - out["lo"]).astype(np.int64),
        "days_behind": (gmax - out["hi"]).astype(np.int64)})


@register("order_ship_dow_matrix", sql="""
WITH fs AS (SELECT l_orderkey AS k, MIN(l_shipdate) AS sd
            FROM lineitem GROUP BY 1),
j AS (SELECT dayofweek(o.o_orderdate) AS order_dow,
             dayofweek(fs.sd) AS ship_dow,
             date_diff('day', o.o_orderdate, fs.sd) AS lag
      FROM orders o JOIN fs ON fs.k = o.o_orderkey)
SELECT CAST(order_dow AS BIGINT) AS order_dow,
       CAST(ship_dow AS BIGINT) AS ship_dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(lag * 1.0), 6) AS avg_lag_days
FROM j GROUP BY 1, 2 ORDER BY 1, 2""")
def order_ship_dow_matrix(sf_dir: str) -> pd.DataFrame:
    """Operational-rhythm matrix: day-of-week an order is PLACED ×
    day-of-week its FIRST line ships, with mean lag per cell — the
    warehouse-cadence read ('Friday orders don't move until
    Tuesday') that the global lag quantiles average away. The
    order↔lines pairing is a tag-union reduce on orderkey (orders
    contribute the order day via max, lines the min ship day via
    min — no join shuffle of the wider tables), then a 49-cell
    integer reduce; day-of-week from epoch day as (d+4) mod 7 which
    equals SQL's Sunday=0 convention."""
    BIG = np.int64(1 << 60)

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        return pd.DataFrame({"k": df["o_orderkey"]
                             .to_numpy(np.int64),
                             "od": d, "sd": BIG})

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        g = pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64),
                          "od": np.int64(-1), "sd": d})
        return g.groupby("k", as_index=False) \
            .agg(od=("od", "max"), sd=("sd", "min"))

    both = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(o_side, batch_format="pandas").union(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_shipdate"])
        .map_batches(l_side, batch_format="pandas"))
    per_order = reduce_sink(both, ["k"], {"od": ("od", "max"),
                                          "sd": ("sd", "min")})

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["od"] >= 0) & (df["sd"] < BIG)]
        od = df["od"].to_numpy(np.int64)
        sd = df["sd"].to_numpy(np.int64)
        g = pd.DataFrame({"order_dow": (od + 4) % 7,
                          "ship_dow": (sd + 4) % 7,
                          "n": np.int64(1), "lag": sd - od})
        return g.groupby(["order_dow", "ship_dow"],
                         as_index=False).sum()

    out = reduce_sink(
        per_order.map_batches(cell_partial, batch_format="pandas"),
        ["order_dow", "ship_dow"],
        {"n": ("n", "sum"), "lag": ("lag", "sum")}).to_pandas() \
        .sort_values(["order_dow", "ship_dow"], ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "order_dow": out["order_dow"].astype(np.int64),
        "ship_dow": out["ship_dow"].astype(np.int64),
        "n": out["n"].astype(np.int64),
        "avg_lag_days": rha(out["lag"].to_numpy(np.float64)
                            / out["n"].to_numpy(np.float64), 6)})


@register("eb_purchase_rate_prior", sql="""
WITH u AS (SELECT user_id, COUNT(*) AS n,
                  SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS k
           FROM events GROUP BY user_id),
m AS (SELECT COUNT(*) AS uu, AVG(k * 1.0 / n) AS m1,
             AVG(k * k * 1.0 / (n * n)) AS m2
      FROM u)
SELECT CAST(uu AS BIGINT) AS n_users, ROUND(m1, 6) AS raw_mean,
       ROUND(m2 - m1 * m1, 6) AS raw_var,
       ROUND(m1 * (m1 * (1 - m1) / (m2 - m1 * m1) - 1), 6)
           AS alpha,
       ROUND((1 - m1) * (m1 * (1 - m1) / (m2 - m1 * m1) - 1), 6)
           AS beta
FROM m""")
def eb_purchase_rate_prior(sf_dir: str) -> pd.DataFrame:
    """Empirical-Bayes prior for per-user purchase rates: fit a
    Beta(α, β) to the population of raw rates by method of moments
    — the data-derived prior that makes small-sample user rates
    rankable (a 1/1 user shrinks toward the population mean, a
    40/200 user barely moves), the principled version of the
    fixed-strength smoothing the target-encoding query hardcodes.
    Per-user (n, k) pairs collapse to (n, k)-cell counts — bounded
    by the activity range, not the user count — and the exact
    rate moments fold from cells via Python Fractions, so the only
    float steps are the final closed-form α, β expressions both
    engines evaluate from the same values."""
    from fractions import Fraction

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.int64(1),
            "k": (df["event_type"] == "purchase").to_numpy()
            .astype(np.int64)})
        return g.groupby("user_id", as_index=False).sum()

    per_u = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum"), "k": ("k", "sum")})
    cells = reduce_sink(
        per_u.map_batches(
            lambda df: df.assign(u=np.int64(1))
            .groupby(["n", "k"], as_index=False)["u"].sum(),
            batch_format="pandas"),
        ["n", "k"], {"u": ("u", "sum")}).to_pandas()
    uu = int(cells["u"].sum())
    m1 = sum((Fraction(int(k), int(n)) * int(c)
              for n, k, c in zip(cells["n"], cells["k"],
                                 cells["u"])), Fraction(0)) / uu
    m2 = sum((Fraction(int(k) ** 2, int(n) ** 2) * int(c)
              for n, k, c in zip(cells["n"], cells["k"],
                                 cells["u"])), Fraction(0)) / uu
    m1f, m2f = float(m1), float(m2)
    var = m2f - m1f * m1f
    rha = textstats.round_half_away
    s = m1f * (1 - m1f) / var - 1
    return pd.DataFrame({
        "n_users": np.array([uu], np.int64),
        "raw_mean": [float(rha(m1f, 6))],
        "raw_var": [float(rha(var, 6))],
        "alpha": [float(rha(m1f * s, 6))],
        "beta": [float(rha((1 - m1f) * s, 6))]})


@register("doclen_ks_matrix_top", sql="""
WITH h AS (SELECT source, n_chars AS v, COUNT(*) AS n
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, SUM(n) AS tot FROM h GROUP BY source),
vals AS (SELECT DISTINCT n_chars AS v FROM documents),
grid AS (SELECT s.source, vals.v, COALESCE(h.n, 0) AS n
         FROM (SELECT DISTINCT source FROM documents) s
         CROSS JOIN vals
         LEFT JOIN h ON h.source = s.source AND h.v = vals.v),
cum AS (SELECT source, v,
               SUM(n) OVER (PARTITION BY source ORDER BY v) AS c
        FROM grid),
pairs AS MATERIALIZED (SELECT a.source AS sa, b.source AS sb,
                 ABS(a.c * tb.tot - b.c * ta.tot) AS num,
                 ta.tot AS ta_t, tb.tot AS tb_t
          FROM cum a
          JOIN cum b ON a.v = b.v AND a.source < b.source
          JOIN t ta ON ta.source = a.source
          JOIN t tb ON tb.source = b.source),
ks AS (SELECT sa, sb, MAX(num) AS mnum, MAX(ta_t) AS ta_t,
              MAX(tb_t) AS tb_t
       FROM pairs GROUP BY sa, sb)
SELECT sa AS source_a, sb AS source_b,
       ROUND(mnum * 1.0 / (ta_t * tb_t), 6) AS ks
FROM ks ORDER BY mnum * 1.0 / (ta_t * tb_t) DESC, sa, sb
LIMIT 10""")
def doclen_ks_matrix_top(sf_dir: str) -> pd.DataFrame:
    """Corpus-homogeneity matrix: exact two-sample KS distance
    between every PAIR of sources over the doc-length distribution,
    top-10 most dissimilar pairs — the 'these two crawls are not
    the same kind of text' screen that per-source means and even
    per-source quantiles miss (two sources can share a median while
    one is bimodal). The KS gap |c_a·t_b − c_b·t_a| is an exact
    integer at every grid point, so ordering is stable across
    engines; only (source, length, count) histogram rows shuffle —
    bounded by sources × distinct lengths — and the 190-pair max
    scan is vectorized on the driver's tiny grid."""
    h = reduce_sink(
        _docs(sf_dir, ["source", "n_chars"]).map_batches(
            lambda df: df.groupby(["source", "n_chars"],
                                  as_index=False).size()
            .rename(columns={"size": "n"}),
            batch_format="pandas"),
        ["source", "n_chars"], {"n": ("n", "sum")}).to_pandas()
    piv = h.pivot_table(index="source", columns="n_chars",
                        values="n", fill_value=0, aggfunc="sum") \
        .sort_index(axis=1)
    cum = piv.to_numpy(np.int64).cumsum(axis=1)
    tot = cum[:, -1]
    srcs = list(piv.index)
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            num = int(np.abs(cum[i].astype(object) * int(tot[j])
                             - cum[j].astype(object)
                             * int(tot[i])).max())
            rows.append((srcs[i], srcs[j],
                         num / (int(tot[i]) * int(tot[j]))))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    rha = textstats.round_half_away
    top = rows[:10]
    return pd.DataFrame({
        "source_a": [r[0] for r in top],
        "source_b": [r[1] for r in top],
        "ks": [float(rha(r[2], 6)) for r in top]})


@register("word_bigram_entropy_by_source", sql=r"""
WITH t AS (SELECT source, regexp_extract_all(text, '\S+') AS w
           FROM documents),
p AS (SELECT source, unnest(generate_series(1, len(w) - 1)) AS i, w
      FROM t WHERE len(w) >= 2),
bg AS (SELECT source, w[i] AS w1, w[i + 1] AS w2 FROM p),
c12 AS (SELECT source, w1, w2, COUNT(*) AS n
        FROM bg GROUP BY 1, 2, 3),
c1 AS (SELECT source, w1, SUM(n) AS m FROM c12 GROUP BY 1, 2),
a AS (SELECT source, SUM(n * LN(n)) AS la,
             CAST(SUM(n) AS BIGINT) AS nb
      FROM c12 GROUP BY source),
b AS (SELECT source, SUM(m * LN(m)) AS lb FROM c1 GROUP BY source)
SELECT a.source, a.nb AS n_bigrams,
       ROUND((b.lb - a.la) / a.nb, 6) AS cond_entropy_nats,
       ROUND(EXP((b.lb - a.la) / a.nb), 6) AS perplexity
FROM a JOIN b ON b.source = a.source ORDER BY a.source""")
def word_bigram_entropy_by_source(sf_dir: str) -> pd.DataFrame:
    """Word-level conditional entropy H(next word | word) per
    source, with its perplexity — how PREDICTABLE each source's
    text is one word ahead: template/boilerplate mills collapse
    toward perplexity ≈ 1 while organic prose stays high, a
    sequence-structure read the bag-of-words richness metrics
    (Yule's K, hapax share, char entropy) cannot see because they
    ignore order. Uses the identity H = (Σm·ln m − Σn·ln n)/N over
    bigram counts n and first-word marginals m, so only
    (source, w1, w2, n) count partials shuffle — bounded by
    vocab², not corpus size — and both ln-sums fold over the
    materialized unique rows."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_1, rows_2 = [], [], []
        for src, txt in zip(df["source"], df["text"]):
            w = str(txt).split()
            if len(w) < 2:
                continue
            rows_s.extend([src] * (len(w) - 1))
            rows_1.extend(w[:-1])
            rows_2.extend(w[1:])
        g = pd.DataFrame({"source": rows_s, "w1": rows_1,
                          "w2": rows_2})
        out = g.groupby(["source", "w1", "w2"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    c12 = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pandas"),
        ["source", "w1", "w2"], {"n": ("n", "sum")}).materialize()

    def a_part(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"],
                          "la": n * np.log(n), "nb": df["n"]
                          .to_numpy(np.int64)})
        return g.groupby("source", as_index=False).sum()

    def m_part(g: pd.DataFrame) -> pd.DataFrame:
        m = float(g["n"].sum())
        return pd.DataFrame({"source": [g["source"].iloc[0]],
                             "lb": [m * np.log(m)]})

    a = c12.map_batches(a_part, batch_format="pandas").to_pandas() \
        .groupby("source", sort=True).sum()
    b = c12.groupby(["source", "w1"]) \
        .map_groups(m_part, batch_format="pandas").to_pandas() \
        .groupby("source", sort=True).sum()
    rha = textstats.round_half_away
    h = (b["lb"].to_numpy(np.float64)
         - a["la"].to_numpy(np.float64)) \
        / a["nb"].to_numpy(np.float64)
    return pd.DataFrame({
        "source": a.index.to_numpy(),
        "n_bigrams": a["nb"].to_numpy(np.int64),
        "cond_entropy_nats": rha(h, 6),
        "perplexity": rha(np.exp(h), 6)})


_MARKOV_STEP = """x{k} AS MATERIALIZED (
  SELECT r.removed, r.ch, r.v + COALESCE(sx.sv, 0.0) AS v
  FROM rvec r LEFT JOIN (
    SELECT q.removed, q.frm AS ch,
           SUM(q.p * x.v ORDER BY q.to_) AS sv
    FROM qmat q JOIN x{prev} x
      ON x.removed = q.removed AND x.ch = q.to_
    GROUP BY q.removed, q.frm) sx
  ON sx.removed = r.removed AND sx.ch = r.ch),
"""

#: the 32 unrolled Neumann steps are generated, not baked in —
#: chunk-size discipline; the SQL text is identical either way
_MARKOV_SQL = """
WITH e AS (SELECT user_id, ts, event_id, event_type AS et FROM events),
o AS (SELECT *, LAG(ts) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM e),
ns AS (SELECT *, CASE WHEN pts IS NULL
                       OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                      THEN 1 ELSE 0 END AS brk FROM o),
sid AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS s
        FROM ns),
tp AS (SELECT *, SUM(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, s ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sp FROM sid),
keep AS MATERIALIZED (SELECT * FROM tp
         WHERE sp = 0 OR (et = 'purchase' AND sp = 1)),
seq AS MATERIALIZED (SELECT *, LAG(et) OVER
            (PARTITION BY user_id, s ORDER BY ts, event_id) AS prev,
          ROW_NUMBER() OVER (PARTITION BY user_id, s
              ORDER BY ts DESC, event_id DESC) AS rlast
        FROM keep),
tr AS MATERIALIZED (SELECT COALESCE(prev, 'start_') AS frm, et AS to_ FROM seq
       UNION ALL
       SELECT et, 'null_' FROM seq
       WHERE rlast = 1 AND et != 'purchase'),
cnt AS MATERIALIZED (SELECT frm, to_, COUNT(*) AS n FROM tr GROUP BY frm, to_),
rs AS (SELECT frm, SUM(n) AS total FROM cnt GROUP BY frm),
pt AS (SELECT c.frm, c.to_, CAST(c.n AS DOUBLE) / r.total AS p
       FROM cnt c JOIN rs r ON r.frm = c.frm),
channels AS (
  SELECT DISTINCT ch FROM (
    SELECT frm AS ch FROM cnt UNION SELECT to_ FROM cnt)
  WHERE ch NOT IN ('start_', 'purchase', 'null_')),
rem AS MATERIALIZED (SELECT '__base__' AS removed
        UNION ALL SELECT ch FROM channels),
qmat AS MATERIALIZED (SELECT rem.removed, pt.frm, pt.to_, pt.p
         FROM rem, pt
         WHERE pt.frm IN (SELECT ch FROM channels)
           AND pt.to_ IN (SELECT ch FROM channels)
           AND pt.frm != rem.removed AND pt.to_ != rem.removed),
rvec AS MATERIALIZED (SELECT rem.removed, c.ch,
                COALESCE((SELECT p FROM pt
                          WHERE pt.frm = c.ch AND pt.to_ = 'purchase'
                            AND c.ch != rem.removed), 0.0) AS v
         FROM rem, channels c),
svec AS MATERIALIZED (SELECT rem.removed, pt.to_ AS ch, pt.p
         FROM rem, pt
         WHERE pt.frm = 'start_'
           AND pt.to_ IN (SELECT ch FROM channels)
           AND pt.to_ != rem.removed),
sconv AS MATERIALIZED (SELECT COALESCE(SUM(p), 0.0) AS v FROM pt
          WHERE frm = 'start_' AND to_ = 'purchase'),
x0 AS MATERIALIZED (SELECT removed, ch, v FROM rvec),
""" + "".join(
    _MARKOV_STEP.format(k=k, prev=k - 1) for k in range(1, 33)
) + """sx AS (SELECT x.removed, SUM(s.p * x.v ORDER BY s.ch) AS sv
       FROM svec s JOIN x32 x
         ON x.removed = s.removed AND x.ch = s.ch
       GROUP BY x.removed),
conv AS (SELECT rem.removed,
                (SELECT v FROM sconv) + COALESCE(sx.sv, 0.0) AS cv
         FROM rem LEFT JOIN sx ON sx.removed = rem.removed),
re AS (SELECT removed AS channel,
              GREATEST(0.0, ((SELECT cv FROM conv
                              WHERE removed = '__base__') - cv)
                            / (SELECT cv FROM conv
                               WHERE removed = '__base__')) AS r
       FROM conv WHERE removed != '__base__'),
tot AS (SELECT SUM(r ORDER BY channel) AS t FROM re)
SELECT channel, ROUND(r, 6) AS removal_effect,
       CASE WHEN (SELECT t FROM tot) > 0
            THEN ROUND(r / (SELECT t FROM tot), 6) ELSE 0.0
       END AS attribution_share
FROM re ORDER BY channel"""


@register("markov_removal_attribution", sql=_MARKOV_SQL)
def markov_removal_attribution(sf_dir: str) -> pd.DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014): model
    each visit-window session as a first-order chain over event
    types, truncated at the first 'purchase' (conversion) or
    session end (null); a channel's credit is how much total
    conversion probability DISAPPEARS when journeys through it are
    failed — the data-driven alternative to last-touch that the
    suite's hitting-time and stationary queries don't provide
    (they describe the chain, this prices each state). Transition
    counts come from the same 32-way user-bucket sessionize
    map_groups as the funnel — only (from, to, n) integer partials
    shuffle; the tiny per-removal chains run on the driver.

    ORACLE (r5): the absorbing-chain solve is defined as the K=32
    Neumann truncation x = Σ_{k<=32} Q^k R (exact for journeys of
    ≤ 32 steps; longer journeys carry negligible mass) computed with
    per-row left-fold sums in ascending to-channel order, so the
    DuckDB oracle replays it bit-for-bit with 32 unrolled
    matrix-vector CTEs — the PageRank unrolled-SQL pattern. The
    planted-chain pytest parity test still pins the semantics.

    Output: one row per non-purchase channel with its removal
    effect and normalized attribution share."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift())
        gap_s = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        ns = (~same) | (gap_s >= 1800.0)
        sid = ns.cumsum()
        et = g["event_type"].astype(str)
        # truncate each session at its FIRST purchase
        is_p = et.eq("purchase")
        seen_p = is_p.groupby(sid, sort=False).cumsum()
        keep = (seen_p == 0) | (is_p & (seen_p == 1))
        et, sid = et[keep], sid[keep]
        first = ~sid.duplicated()
        last = ~sid.duplicated(keep="last")
        frm = et.shift().where(~first, "start_")
        to = et.copy()
        rows = pd.DataFrame({"frm": frm, "to": to})
        # session-end absorption for sessions not ending in purchase
        ends = pd.DataFrame({"frm": et[last & ~et.eq("purchase")],
                             "to": "null_"})
        out = pd.concat([rows, ends], ignore_index=True) \
            .groupby(["frm", "to"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    cnt = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(transitions,
                                       batch_format="pandas"),
        ["frm", "to"], {"n": ("n", "sum")}).to_pandas()
    cnt = cnt.sort_values(["frm", "to"], ignore_index=True)
    channels = sorted((set(cnt["frm"]) | set(cnt["to"]))
                      - {"start_", "purchase", "null_"})
    chset = set(channels)
    rowsum = cnt.groupby("frm")["n"].sum().to_dict()
    # shared-expression transition probabilities (CAST(n AS DOUBLE)/rs)
    pt = [(f, t, float(n) / float(rowsum[f]))
          for f, t, n in zip(cnt["frm"], cnt["to"], cnt["n"])]

    K = 32

    def conv_prob(removed=None):
        # x = Σ_{k<=K} Q^k R via K left-fold updates, Q rows walked in
        # ascending to-channel order — the exact op order the oracle's
        # SUM(p*v ORDER BY to_) replays
        R = {c: 0.0 for c in channels}
        Qrows = {c: [] for c in channels}
        s_rows, s_conv = [], 0.0
        for f, t, p in pt:              # sorted by (frm, to)
            if t == removed:
                continue
            if f == "start_":
                if t == "purchase":
                    s_conv += p
                elif t in chset:
                    s_rows.append((t, p))
            elif f in chset and f != removed:
                if t == "purchase":
                    R[f] = p
                elif t in chset:
                    Qrows[f].append((t, p))
        x = dict(R)
        for _ in range(K):
            nx = {}
            for i in channels:
                acc = R[i]
                for t, p in Qrows[i]:
                    acc = acc + p * x[t]
                nx[i] = acc
            x = nx
        acc = s_conv
        for t, p in s_rows:             # ascending channel
            acc = acc + p * x[t]
        return acc

    base = conv_prob()
    rha = textstats.round_half_away
    re = {c: max(0.0, (base - conv_prob(c)) / base)
          for c in channels}
    tot = 0.0
    for c in channels:                  # SUM(r ORDER BY channel)
        tot = tot + re[c]
    return pd.DataFrame({
        "channel": channels,
        "removal_effect": [float(rha(re[c], 6)) for c in channels],
        "attribution_share": [
            float(rha(re[c] / tot, 6)) if tot > 0 else 0.0
            for c in channels]})


@register("seasonal_mann_kendall_dow", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d AS d, (cal.d + 4) % 7 AS dow,
             CAST(COALESCE(e.c, 0) AS BIGINT) AS x
      FROM cal LEFT JOIN e ON e.d = cal.d),
s AS (SELECT SUM(CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END) AS st
      FROM g a JOIN g b ON a.dow = b.dow AND a.d < b.d),
n AS (SELECT dow, COUNT(*) AS ng FROM g GROUP BY dow),
t AS (SELECT dow, x, COUNT(*) AS tt FROM g GROUP BY dow, x),
v AS (SELECT SUM(ng * (ng - 1.0) * (2 * ng + 5) / 18) AS v1
      FROM n),
tc AS (SELECT COALESCE(SUM(tt * (tt - 1.0) * (2 * tt + 5) / 18), 0)
           AS v2
       FROM t WHERE tt > 1)
SELECT CAST(s.st AS BIGINT) AS s_total,
       ROUND(v.v1 - tc.v2, 6) AS var_total,
       ROUND(CASE WHEN s.st > 0
                  THEN (s.st - 1) / SQRT(v.v1 - tc.v2)
                  WHEN s.st < 0
                  THEN (s.st + 1) / SQRT(v.v1 - tc.v2)
                  ELSE 0.0 END, 6) AS z_score
FROM s, v, tc""")
def seasonal_mann_kendall_dow(sf_dir: str) -> pd.DataFrame:
    """SEASONAL Mann–Kendall trend test (Hirsch–Slack): the S
    statistic summed within each day-of-week subseries of the
    zero-filled daily counts, with the tie-corrected variance — the
    trend detector that a strong weekly cycle cannot fool, unlike
    the plain MK already in the suite where Monday-vs-Sunday pairs
    masquerade as trend. S is exact integer comparisons; ties enter
    the variance through exact (dow, value) run counts; the
    continuity-corrected z is one closed-form expression over those
    integers. Only the daily histogram shuffles; the O(Σn_g²) pair
    scan runs on the driver's bounded-horizon series."""
    daily = reduce_sink(_events(sf_dir, ["ts"]).map_batches(
        lambda df: pd.DataFrame({
            "d": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000, "c": 1}),
        batch_format="pandas"),
        ["d"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("d", ignore_index=True)
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["d"].to_numpy(np.int64) - lo] = \
        daily["c"].to_numpy(np.int64)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    dow = (days + 4) % 7
    s_total = 0
    v1 = 0.0
    v2 = 0.0
    for g in range(7):
        xg = x[dow == g]
        ng = len(xg)
        if ng < 2:
            continue
        diff = np.sign(xg[None, :] - xg[:, None])
        s_total += int(np.triu(diff, 1).sum())
        v1 += ng * (ng - 1.0) * (2 * ng + 5) / 18
        _, t = np.unique(xg, return_counts=True)
        t = t[t > 1]
        v2 += float((t * (t - 1.0) * (2 * t + 5) / 18).sum())
    var = v1 - v2
    z = 0.0 if s_total == 0 else \
        (s_total - 1) / np.sqrt(var) if s_total > 0 else \
        (s_total + 1) / np.sqrt(var)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "s_total": np.array([s_total], np.int64),
        "var_total": [float(rha(var, 6))],
        "z_score": [float(rha(z, 6))]})


@register("return_recidivism", sql="""
WITH r AS (SELECT l_orderkey AS k,
                  MAX(CASE WHEN l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS r
           FROM lineitem GROUP BY 1),
o AS (SELECT o.o_custkey AS c, o.o_orderdate AS d,
             o.o_orderkey AS k, r.r
      FROM orders o JOIN r ON r.k = o.o_orderkey),
s AS (SELECT c, r, LAG(r) OVER (PARTITION BY c
                                ORDER BY d, k) AS pr
      FROM o),
t AS (SELECT pr, r, COUNT(*) AS n
      FROM s WHERE pr IS NOT NULL GROUP BY 1, 2)
SELECT CAST(COALESCE(SUM(CASE WHEN pr = 0 AND r = 0
                              THEN n END), 0) AS BIGINT) AS n00,
       CAST(COALESCE(SUM(CASE WHEN pr = 0 AND r = 1
                              THEN n END), 0) AS BIGINT) AS n01,
       CAST(COALESCE(SUM(CASE WHEN pr = 1 AND r = 0
                              THEN n END), 0) AS BIGINT) AS n10,
       CAST(COALESCE(SUM(CASE WHEN pr = 1 AND r = 1
                              THEN n END), 0) AS BIGINT) AS n11,
       ROUND(SUM(CASE WHEN pr = 1 AND r = 1 THEN n END) * 1.0
             / SUM(CASE WHEN pr = 1 THEN n END), 6)
           AS p_after_return,
       ROUND(SUM(CASE WHEN pr = 0 AND r = 1 THEN n END) * 1.0
             / SUM(CASE WHEN pr = 0 THEN n END), 6)
           AS p_after_clean,
       ROUND(SUM(CASE WHEN pr = 1 AND r = 1 THEN n END) * 1.0
             * SUM(CASE WHEN pr = 0 AND r = 0 THEN n END)
             / (SUM(CASE WHEN pr = 1 AND r = 0 THEN n END) * 1.0
                * SUM(CASE WHEN pr = 0 AND r = 1 THEN n END)), 6)
           AS odds_ratio
FROM t""")
def return_recidivism(sf_dir: str) -> pd.DataFrame:
    """Return recidivism: is a customer whose LAST order contained
    a returned line more likely to return again on the next one?
    The 2×2 transition over each customer's chronological order
    sequence with the conditional rates and odds ratio — the
    serial-returner screen that the static return-rate-by-discount
    table can't express because it has no memory. Per-order return
    flags reduce from lineitem, pair with (custkey, date) via a
    tag-union reduce on orderkey (no wide join), customers hash
    into 32 buckets for the in-group lag; only 4 integer cells plus
    exact divisions leave the driver."""
    BIG = np.int64(1 << 60)

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "k": df["l_orderkey"].to_numpy(np.int64),
            "c": np.int64(-1), "d": np.int64(-1),
            "r": (df["l_returnflag"] == "R").to_numpy()
            .astype(np.int64), "hl": np.int64(1)})
        return g.groupby("k", as_index=False).max()

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["o_orderkey"].to_numpy(np.int64),
            "c": df["o_custkey"].to_numpy(np.int64),
            "d": df["o_orderdate"].to_numpy("datetime64[us]")
            .astype(np.int64) // 86_400_000_000,
            "r": np.int64(0), "hl": np.int64(0)})

    both = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(l_side, batch_format="pandas").union(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate"])
        .map_batches(o_side, batch_format="pandas"))
    per_order = reduce_sink(both, ["k"],
                            {"c": ("c", "max"), "d": ("d", "max"),
                             "r": ("r", "max"), "hl": ("hl", "max")})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # drop orders with no line items (the SQL inner join drops
        # them too) and stray line-only keys
        df = df[(df["c"] >= 0) & (df["hl"] == 1)].copy()
        df["bucket_"] = (df["c"].to_numpy() % 32).astype(np.int32)
        return df

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "d", "k"], kind="mergesort")
        same = g["c"].eq(g["c"].shift())
        pr = g["r"].shift()
        t = pd.DataFrame({"pr": pr[same].astype(np.int64),
                          "r": g["r"][same].astype(np.int64)})
        out = t.groupby(["pr", "r"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    t = reduce_sink(
        per_order.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(cells,
                                       batch_format="pandas"),
        ["pr", "r"], {"n": ("n", "sum")}).to_pandas()
    n = {(int(a), int(b)): int(c)
         for a, b, c in zip(t["pr"], t["r"], t["n"])}
    n00, n01 = n.get((0, 0), 0), n.get((0, 1), 0)
    n10, n11 = n.get((1, 0), 0), n.get((1, 1), 0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n00": np.array([n00], np.int64),
        "n01": np.array([n01], np.int64),
        "n10": np.array([n10], np.int64),
        "n11": np.array([n11], np.int64),
        "p_after_return": [float(rha(n11 / (n10 + n11), 6))],
        "p_after_clean": [float(rha(n01 / (n00 + n01), 6))],
        "odds_ratio": [float(rha(n11 * 1.0 * n00
                                 / (n10 * 1.0 * n01), 6))]})


@register("pantry_loading_gap", sql="""
WITH s AS (SELECT o_custkey AS c,
                  CAST(FLOOR(o_totalprice) AS BIGINT) AS usd,
                  epoch_us(o_orderdate) // 86400000000 AS d,
                  o_orderkey AS k
           FROM orders),
p AS (SELECT usd,
             LEAD(d) OVER (PARTITION BY c ORDER BY d, k) - d AS gap
      FROM s QUALIFY gap IS NOT NULL),
o AS (SELECT usd, gap, ROW_NUMBER() OVER (ORDER BY usd) AS rk,
             COUNT(*) OVER () AS n
      FROM p),
th AS (SELECT MAX(CASE WHEN rk = CAST(CEIL(0.25 * n) AS BIGINT)
                       THEN usd END) AS q25,
              MAX(CASE WHEN rk = CAST(CEIL(0.75 * n) AS BIGINT)
                       THEN usd END) AS q75
       FROM o)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(th.q25 AS BIGINT) AS q25_usd,
       CAST(th.q75 AS BIGINT) AS q75_usd,
       ROUND(AVG(CASE WHEN usd >= th.q75 THEN gap * 1.0 END), 6)
           AS avg_gap_after_large,
       ROUND(AVG(CASE WHEN usd <= th.q25 THEN gap * 1.0 END), 6)
           AS avg_gap_after_small,
       ROUND(AVG(CASE WHEN usd >= th.q75 THEN gap * 1.0 END)
             / AVG(CASE WHEN usd <= th.q25 THEN gap * 1.0 END), 6)
           AS gap_ratio
FROM p, th GROUP BY th.q25, th.q75""")
def pantry_loading_gap(sf_dir: str) -> pd.DataFrame:
    """Pantry-loading screen: does a LARGE order postpone the next
    one? Mean days-to-next-order after top-quartile orders vs after
    bottom-quartile ones — gap_ratio > 1 is stock-up behavior
    (demand pulled forward, so a promo's lift is partly borrowed
    from next month), ≈ 1 means order size and timing are
    independent; the cadence-regularity queries can't see this
    because they ignore size. Order values floor to whole dollars
    so the quartile thresholds are exact order statistics on a
    RANGE-bounded histogram (stable at any row count), and the
    conditional gap means are exact integer sums; consecutive-order
    pairs form inside 32-way customer buckets."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_orderkey", "o_totalprice"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["o_custkey"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate",
                           "o_orderkey"], kind="mergesort")
        d = g["o_orderdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        usd = np.floor(g["o_totalprice"].to_numpy(np.float64)) \
            .astype(np.int64)
        same = g["o_custkey"].eq(g["o_custkey"].shift(-1)) \
            .to_numpy()
        gap = np.empty(len(g), np.int64)
        gap[:-1] = d[1:] - d[:-1]
        out = pd.DataFrame({"usd": usd[same], "gap": gap[same],
                            "n": np.int64(1)})
        return out.groupby("usd", as_index=False).sum()

    h = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(pairs,
                                       batch_format="pandas"),
        ["usd"], {"n": ("n", "sum"), "gap": ("gap", "sum")}) \
        .to_pandas().sort_values("usd", ignore_index=True)
    import math
    n = int(h["n"].sum())
    cum = h["n"].to_numpy(np.int64).cumsum()
    usd = h["usd"].to_numpy(np.int64)
    q25 = int(usd[np.searchsorted(
        cum, int(math.ceil(0.25 * n)), side="left")])
    q75 = int(usd[np.searchsorted(
        cum, int(math.ceil(0.75 * n)), side="left")])
    lg = h[h["usd"] >= q75]
    sm = h[h["usd"] <= q25]
    gl = int(lg["gap"].sum()) / int(lg["n"].sum())
    gs = int(sm["gap"].sum()) / int(sm["n"].sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "q25_usd": np.array([q25], np.int64),
        "q75_usd": np.array([q75], np.int64),
        "avg_gap_after_large": [float(rha(gl, 6))],
        "avg_gap_after_small": [float(rha(gs, 6))],
        "gap_ratio": [float(rha(gl / gs, 6))]})


@register("brand_loyalty_share", sql="""
WITH cb AS (SELECT o.o_custkey AS c, p.p_brand AS b,
                   SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                            AS BIGINT)) AS cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2),
t AS (SELECT c, MAX(cents) AS top_c, SUM(cents) AS tot_c,
             COUNT(*) AS n_brands
      FROM cb GROUP BY c),
j AS (SELECT cu.c_mktsegment AS seg, t.top_c * 1.0 / t.tot_c
                 AS share, t.n_brands
      FROM t JOIN customer cu ON cu.c_custkey = t.c)
SELECT seg AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(AVG(share), 6) AS avg_top_brand_share,
       ROUND(AVG(n_brands * 1.0), 6) AS avg_brands
FROM j GROUP BY seg ORDER BY seg""")
def brand_loyalty_share(sf_dir: str) -> pd.DataFrame:
    """Brand loyalty by market segment: the average share of a
    customer's lifetime spend that goes to their single favourite
    brand (and how many brands they touch) — the
    wallet-concentration read that segment revenue totals hide (two
    segments with equal revenue can be all-loyalists vs all
    switchers, and only the first defends price increases).
    lineitem pairs with its order's customer through auto_join
    (broadcast under 1M build rows, distributed hash join above —
    the strategy switch, not the query, owns that decision);
    part→brand rides as a broadcast dict; per-customer max/total
    cents reduce to exact integers and only per-segment share sums
    cross the wire."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    bmap_ref = ray.put(dict(zip(part["p_partkey"].to_numpy(),
                                part["p_brand"].to_pylist())))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    smap_ref = ray.put(dict(zip(cust["c_custkey"].to_numpy(),
                                cust["c_mktsegment"].to_pylist())))

    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_extendedprice"]) \
        .map_batches(lambda df: pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "b": df["l_partkey"].map(ray.get(bmap_ref)).astype(str),
            "cents": np.rint(df["l_extendedprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)}), batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = auto_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")
    cb = reduce_sink(
        joined.map_batches(lambda df: df.groupby(
            ["o_custkey", "b"], as_index=False)["cents"].sum(),
            batch_format="pandas"),
        ["o_custkey", "b"], {"cents": ("cents", "sum")})

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False)["cents"]
        return pd.DataFrame({"top_c": g.max().astype(np.int64),
                             "tot_c": g.sum().astype(np.int64),
                             "n_brands": g.size().astype(np.int64)}
                            ).reset_index()

    t = reduce_sink(
        cb.map_batches(per_cust, batch_format="pandas"),
        ["o_custkey"], {"top_c": ("top_c", "max"),
                        "tot_c": ("tot_c", "sum"),
                        "n_brands": ("n_brands", "sum")})

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        seg = df["o_custkey"].map(ray.get(smap_ref)).astype(str)
        return pd.DataFrame({
            "mktsegment": seg, "n_customers": np.int64(1),
            "share": df["top_c"].to_numpy(np.float64)
            / df["tot_c"].to_numpy(np.float64),
            "n_brands": df["n_brands"].to_numpy(np.int64)}) \
            .groupby("mktsegment", as_index=False).sum()

    out = reduce_sink(
        t.map_batches(seg_partial, batch_format="pandas"),
        ["mktsegment"], {"n_customers": ("n_customers", "sum"),
                         "share": ("share", "sum"),
                         "n_brands": ("n_brands", "sum")}) \
        .to_pandas().sort_values("mktsegment", ignore_index=True)
    rha = textstats.round_half_away
    nc = out["n_customers"].to_numpy(np.float64)
    return pd.DataFrame({
        "mktsegment": out["mktsegment"],
        "n_customers": out["n_customers"].astype(np.int64),
        "avg_top_brand_share": rha(out["share"].to_numpy(np.float64)
                                   / nc, 6),
        "avg_brands": rha(out["n_brands"].to_numpy(np.float64)
                          / nc, 6)})


@register("supplier_leadtime_reliability", sql="""
WITH j AS (SELECT l.l_suppkey AS s,
                  date_diff('day', o.o_orderdate, l.l_shipdate)
                      AS lag
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey),
a AS (SELECT s, COUNT(*) AS n, SUM(lag) AS sl,
             SUM(lag * lag) AS sql_
      FROM j GROUP BY s)
SELECT s AS suppkey, CAST(n AS BIGINT) AS n_lines,
       ROUND(sl * 1.0 / n, 6) AS mean_lag_days,
       ROUND(SQRT(n * sql_ - sl * sl) / sl, 6) AS cv
FROM a
ORDER BY ROUND(SQRT(n * sql_ - sl * sl) / sl, 6) DESC, s
LIMIT 10""")
def supplier_leadtime_reliability(sf_dir: str) -> pd.DataFrame:
    """Supplier lead-time RELIABILITY: the ten suppliers with the
    most erratic order→ship lag (coefficient of variation of lag
    days), not the slowest — procurement can plan around a
    consistently slow supplier but not an erratic one, which is why
    the mean-lag rankings and the global lag quantiles miss the
    real operational risk. Lag comes from the lineitem→orders
    auto_join (strategy switch owns broadcast-vs-hash); per-supplier
    integer moments (n, Σlag, Σlag²) reduce exactly and CV =
    √(nΣx²−(Σx)²)/Σx is the same operand-order expression both
    engines; CV is rounded BEFORE ranking so ties break identically."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    joined = auto_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        lag = (df["l_shipdate"].to_numpy("datetime64[us]")
               .astype(np.int64)
               - df["o_orderdate"].to_numpy("datetime64[us]")
               .astype(np.int64)) // 86_400_000_000
        g = pd.DataFrame({"s": df["l_suppkey"].to_numpy(np.int64),
                          "n": np.int64(1), "sl": lag,
                          "sq": lag * lag})
        return g.groupby("s", as_index=False).sum()

    a = reduce_sink(
        joined.map_batches(moments, batch_format="pandas"),
        ["s"], {"n": ("n", "sum"), "sl": ("sl", "sum"),
                "sq": ("sq", "sum")}).materialize()
    rha = textstats.round_half_away

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        sl = df["sl"].to_numpy(np.float64)
        sq = df["sq"].to_numpy(np.float64)
        out = pd.DataFrame({
            "suppkey": df["s"].to_numpy(np.int64),
            "n_lines": df["n"].to_numpy(np.int64),
            "mean_lag_days": rha(sl / n, 6),
            "cv": rha(np.sqrt(n * sq - sl * sl) / sl, 6)})
        return out.sort_values(["cv", "suppkey"],
                               ascending=[False, True]).head(10)

    cand = a.map_batches(local_top,
                         batch_format="pandas").to_pandas()
    return cand.sort_values(["cv", "suppkey"],
                            ascending=[False, True],
                            ignore_index=True).head(10)


@register("circadian_harmonic_fit", sql="""
WITH hb AS (SELECT event_type AS t, hour(ts) AS h,
                   COUNT(*) AS n, SUM(value) AS y
            FROM events GROUP BY 1, 2),
s AS (SELECT t,
             SUM(n * 1.0) AS w,
             SUM(y) AS sy,
             SUM(n * COS(2 * PI() * h / 24)) AS sc,
             SUM(n * SIN(2 * PI() * h / 24)) AS ss,
             SUM(n * COS(2 * PI() * h / 24)
                 * COS(2 * PI() * h / 24)) AS scc,
             SUM(n * SIN(2 * PI() * h / 24)
                 * SIN(2 * PI() * h / 24)) AS sss,
             SUM(n * COS(2 * PI() * h / 24)
                 * SIN(2 * PI() * h / 24)) AS scs,
             SUM(y * COS(2 * PI() * h / 24)) AS syc,
             SUM(y * SIN(2 * PI() * h / 24)) AS sys
      FROM hb GROUP BY t),
d AS (SELECT t, w, sy,
             w * (scc * sss - scs * scs)
             - sc * (sc * sss - scs * ss)
             + ss * (sc * scs - scc * ss) AS det,
             sy * (scc * sss - scs * scs)
             - sc * (syc * sss - scs * sys)
             + ss * (syc * scs - scc * sys) AS det_m,
             w * (syc * sss - scs * sys)
             - sy * (sc * sss - scs * ss)
             + ss * (sc * sys - syc * ss) AS det_b1,
             w * (scc * sys - syc * scs)
             - sc * (sc * sys - syc * ss)
             + sy * (sc * scs - scc * ss) AS det_b2
      FROM s)
SELECT t AS event_type,
       ROUND(det_m / det, 6) AS mesor,
       ROUND(SQRT((det_b1 / det) * (det_b1 / det)
                  + (det_b2 / det) * (det_b2 / det)), 6)
           AS amplitude,
       ROUND(((ATAN2(det_b2 / det, det_b1 / det) / (2 * PI()) * 24)
              + 24) % 24, 6) AS acrophase_hour
FROM d ORDER BY t""")
def circadian_harmonic_fit(sf_dir: str) -> pd.DataFrame:
    """Cosinor (single-harmonic circadian) fit of `value` on
    hour-of-day per event type: mesor (rhythm-adjusted mean),
    amplitude and acrophase (the clock hour where the fitted cosine
    peaks) — the CIRCULAR regression the hourly bar table can't
    give: it reads '3.2 dollars of swing peaking at 14:37' directly,
    handles unbalanced hour traffic correctly via weighted least
    squares, and is the standard chronobiology parameterization.
    The 3×3 normal equations use only per-(type, hour) (n, Σv)
    partials — cos/sin of the 24 fixed angles are compile-time
    constants — and both engines evaluate the same Cramer
    determinant expressions from the same 24-term sums."""
    hb = reduce_sink(
        _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            lambda df: pd.DataFrame({
                "t": df["event_type"].astype(str),
                "h": df["ts"].dt.hour.to_numpy(np.int64),
                "n": np.int64(1),
                "y": df["value"].to_numpy(np.float64)})
            .groupby(["t", "h"], as_index=False).sum(),
            batch_format="pandas"),
        ["t", "h"], {"n": ("n", "sum"), "y": ("y", "sum")}) \
        .to_pandas()
    rha = textstats.round_half_away
    rows = []
    for t, d in hb.groupby("t", sort=True):
        h = d["h"].to_numpy(np.float64)
        n = d["n"].to_numpy(np.float64)
        y = d["y"].to_numpy(np.float64)
        th = 2 * np.pi * h / 24
        c, s = np.cos(th), np.sin(th)
        w, sy = n.sum(), y.sum()
        sc, ss = (n * c).sum(), (n * s).sum()
        scc, sss = (n * c * c).sum(), (n * s * s).sum()
        scs = (n * c * s).sum()
        syc, sys_ = (y * c).sum(), (y * s).sum()
        det = w * (scc * sss - scs * scs) \
            - sc * (sc * sss - scs * ss) \
            + ss * (sc * scs - scc * ss)
        det_m = sy * (scc * sss - scs * scs) \
            - sc * (syc * sss - scs * sys_) \
            + ss * (syc * scs - scc * sys_)
        det_b1 = w * (syc * sss - scs * sys_) \
            - sy * (sc * sss - scs * ss) \
            + ss * (sc * sys_ - syc * ss)
        det_b2 = w * (scc * sys_ - syc * scs) \
            - sc * (sc * sys_ - syc * ss) \
            + sy * (sc * scs - scc * ss)
        m = det_m / det
        b1, b2 = det_b1 / det, det_b2 / det
        amp = np.sqrt(b1 * b1 + b2 * b2)
        phase = (np.arctan2(b2, b1) / (2 * np.pi) * 24 + 24) % 24
        rows.append((t, float(rha(m, 6)), float(rha(amp, 6)),
                     float(rha(phase, 6))))
    return pd.DataFrame(rows, columns=["event_type", "mesor",
                                       "amplitude",
                                       "acrophase_hour"])


@register("aa_test_calibration", sql="""
WITH e AS (SELECT event_id % 2 = 0 AS a,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                  CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END AS k
           FROM events),
g AS (SELECT a, COUNT(*) AS n, SUM(c) AS sc, SUM(c * c) AS scc,
             SUM(k) AS sk
      FROM e GROUP BY a),
w AS (SELECT MAX(CASE WHEN a THEN n END) AS na,
             MAX(CASE WHEN NOT a THEN n END) AS nb,
             MAX(CASE WHEN a THEN sc END) AS sca,
             MAX(CASE WHEN NOT a THEN sc END) AS scb,
             MAX(CASE WHEN a THEN scc END) AS scca,
             MAX(CASE WHEN NOT a THEN scc END) AS sccb,
             MAX(CASE WHEN a THEN sk END) AS ska,
             MAX(CASE WHEN NOT a THEN sk END) AS skb
      FROM g)
SELECT 'purchase_rate' AS metric, CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND(ska * 1.0 / na, 6) AS stat_a,
       ROUND(skb * 1.0 / nb, 6) AS stat_b,
       ROUND((ska * 1.0 / na - skb * 1.0 / nb)
             / SQRT(((ska + skb) * 1.0 / (na + nb))
                    * (1 - (ska + skb) * 1.0 / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 6) AS z
FROM w
UNION ALL
SELECT 'value_mean_usd', CAST(na AS BIGINT), CAST(nb AS BIGINT),
       ROUND(sca / 100.0 / na, 6),
       ROUND(scb / 100.0 / nb, 6),
       ROUND((sca * 1.0 / na - scb * 1.0 / nb)
             / SQRT((na * scca - sca * sca * 1.0)
                    / (na * 1.0 * (na - 1)) / na
                    + (nb * sccb - scb * scb * 1.0)
                    / (nb * 1.0 * (nb - 1)) / nb), 6)
FROM w ORDER BY metric""")
def aa_test_calibration(sf_dir: str) -> pd.DataFrame:
    """A/A null-experiment calibration: split events by event_id
    parity — two arms that by construction have NO true difference
    — and run the platform's own z-tests (purchase rate, mean
    value). |z| landing inside ±2 is the certificate that the
    pipeline's variance math, bucketing and data plumbing are
    sound; an A/A that 'detects' an effect means every real A/B
    readout from the same machinery is untrustworthy. The standard
    pre-launch audit none of the real-effect tests in the suite
    substitute for. Exact integer (n, Σc, Σc², k) moments per arm;
    both engines evaluate the identical z expressions."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a = (df["event_id"].to_numpy(np.int64) % 2 == 0) \
            .astype(np.int64)
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        k = (df["event_type"] == "purchase").to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({"a": a, "n": np.int64(1), "sc": c,
                             "scc": c * c, "sk": k}) \
            .groupby("a", as_index=False).sum()

    g = reduce_sink(
        _events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["a"], {"n": ("n", "sum"), "sc": ("sc", "sum"),
                "scc": ("scc", "sum"), "sk": ("sk", "sum")}) \
        .to_pandas().set_index("a")
    na, nb = int(g.loc[1, "n"]), int(g.loc[0, "n"])
    sca, scb = int(g.loc[1, "sc"]), int(g.loc[0, "sc"])
    scca, sccb = int(g.loc[1, "scc"]), int(g.loc[0, "scc"])
    ska, skb = int(g.loc[1, "sk"]), int(g.loc[0, "sk"])
    rha = textstats.round_half_away
    pp = (ska + skb) * 1.0 / (na + nb)
    z_p = (ska * 1.0 / na - skb * 1.0 / nb) \
        / np.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    z_v = (sca * 1.0 / na - scb * 1.0 / nb) \
        / np.sqrt((na * scca - sca * sca * 1.0)
                  / (na * 1.0 * (na - 1)) / na
                  + (nb * sccb - scb * scb * 1.0)
                  / (nb * 1.0 * (nb - 1)) / nb)
    return pd.DataFrame({
        "metric": ["purchase_rate", "value_mean_usd"],
        "n_a": np.array([na, na], np.int64),
        "n_b": np.array([nb, nb], np.int64),
        "stat_a": [float(rha(ska * 1.0 / na, 6)),
                   float(rha(sca / 100.0 / na, 6))],
        "stat_b": [float(rha(skb * 1.0 / nb, 6)),
                   float(rha(scb / 100.0 / nb, 6))],
        "z": [float(rha(z_p, 6)), float(rha(z_v, 6))]})


@register("mean_excess_curve", sql="""
WITH v AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c
           FROM events),
o AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rk,
             COUNT(*) OVER () AS n
      FROM v),
th AS (SELECT p, MAX(CASE WHEN rk = CAST(CEIL(p * n) AS BIGINT)
                          THEN c END) AS u
       FROM o CROSS JOIN (SELECT UNNEST([0.90, 0.925, 0.95,
                                         0.975, 0.99]) AS p)
       GROUP BY p)
SELECT th.p, CAST(th.u AS BIGINT) AS threshold_cents,
       CAST(COUNT(*) FILTER (WHERE v.c > th.u) AS BIGINT)
           AS n_exceed,
       ROUND(SUM(CASE WHEN v.c > th.u THEN v.c - th.u END) * 1.0
             / COUNT(*) FILTER (WHERE v.c > th.u) / 100.0, 6)
           AS mean_excess_usd
FROM v CROSS JOIN th GROUP BY th.p, th.u ORDER BY th.p""")
def mean_excess_curve(sf_dir: str) -> pd.DataFrame:
    """Mean-excess (mean residual life) curve of event values over
    the p90–p99 exact-cents thresholds — the third classic EVT
    diagnostic next to the suite's Hill index and POT clusters: a
    RISING curve certifies a genuinely heavy (GPD ξ>0) tail, flat
    is exponential, falling is a bounded tail, and its slope
    ξ/(1−ξ) gives the capacity-planning severity read one number
    at a time. Thresholds are exact order statistics and every
    conditional sum is exact integer arithmetic on the SAME cents
    histogram — one (cents, count) reduce bounded by the value
    range serves all five thresholds."""
    h = reduce_sink(
        _events(sf_dir, ["value"]).map_batches(
            lambda df: pd.DataFrame({
                "c": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
                "n": np.int64(1)})
            .groupby("c", as_index=False).sum(),
            batch_format="pandas"),
        ["c"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values("c", ignore_index=True)
    import math
    c = h["c"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    cum = n.cumsum()
    tot = int(cum[-1])
    rha = textstats.round_half_away
    rows = []
    for p in [0.90, 0.925, 0.95, 0.975, 0.99]:
        u = int(c[np.searchsorted(cum, int(math.ceil(p * tot)),
                                  side="left")])
        m = c > u
        ne = int(n[m].sum())
        ex = int((n[m] * (c[m] - u)).sum())
        rows.append((p, u, ne, float(rha(ex / ne / 100.0, 6))))
    return pd.DataFrame(rows, columns=[
        "p", "threshold_cents", "n_exceed", "mean_excess_usd"]) \
        .astype({"threshold_cents": np.int64,
                 "n_exceed": np.int64})
