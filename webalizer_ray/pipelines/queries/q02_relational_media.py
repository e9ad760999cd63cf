"""Driver-contract queries (chunk 2/18).
Sections:
  - argmax with smaller-label tiebreak: labels ascend, argmax
  - composite int64 key (user_rank * span + relative_ts) makes
  - equal-length intervals sorted by start ⇒ ends are sorted too,
  - the observed-day set bounds window anchors (match the oracle's
  - multiply by y ONCE after the full sum — SUM(x) * y in oracle order
  - the oracle reads the same deterministic fixture path via DuckDB's
  - the indexed path must reproduce the scan path bit-for-bit → same oracle
  - per-invocation scratch store: the query itself stays fully
  - Float discipline: revenue = l_extendedprice * (1 - l_discount) is a
  - vectorized HAVING — a row-lambda filter here costs a Python call
  - composite int64 key (user_rank * span + relative_ts): ONE
  - scalar partials ride as a sentinel row so one reduce serves
"""
# fmt: off
from webalizer_ray.pipelines.queries._shared import (  # noqa: F401
    np_lookup,
    REGISTRY,
    _docs,
    _events,
    ann,
    dedup,
    distinct_count,
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
)
from webalizer_ray.pipelines.queries._dedup_sql import (  # noqa: F401
    DUP_CLUSTER_SIZES_SQL as _DUP_CLUSTER_SIZES_SQL,
    INCR_FUZZY_SQL as _INCR_FUZZY_SQL,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _BM25_TERMS,
    _NS_SQL,
    _bm25_topk,
    _sessionized_events,
    _with_time_cols,
    cosine_dup_clusters,
    knn_graph,
    minhash_dup_clusters,
)



@register("value_trend_ols", sql="""
WITH b AS (SELECT CAST(epoch_us(ts)
                       - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
                  / 86400000000.0 AS x,
                  value AS y FROM events),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx FROM b)
SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept
FROM s""")
def value_trend_ols(sf_dir: str) -> pd.DataFrame:
    """Distributed OLS trend line (value vs time-in-days) via the
    normal equations over the same scalar-moment partials as the
    correlation — the two-coefficient special case of the classifier's
    Hessian-partial pattern, oracle-backed because the closed form is
    written out explicitly on both sides. x is centered at the corpus
    epoch (2024-01-01): days-since-Unix-epoch (~19700) makes
    n·Σx² − (Σx)² cancel catastrophically and the engines disagree
    past the rounding guard."""
    ds = _events(sf_dir, ["ts", "value"])
    epoch_us_2024 = 1704067200000000  # TIMESTAMP '2024-01-01' in µs

    def partial(t: pa.Table) -> pd.DataFrame:
        x = ((pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
              - epoch_us_2024).astype(np.float64) / 86400000000.0)
        y = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(x))], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = float(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxy, sxx = float(p["sxy"].sum()), float(p["sxx"].sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
    return pd.DataFrame({
        "slope": [float(textstats.round_half_away(slope, 6))],
        "intercept": [float(textstats.round_half_away(intercept, 6))]})


@register("snapshot_diff_users", sql="""
WITH a AS (SELECT user_id, ROUND(SUM(value), 2) AS v FROM events
           WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
b AS (SELECT user_id, ROUND(SUM(value), 2) AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
j AS (SELECT CASE WHEN a.user_id IS NULL THEN 'added'
                  WHEN b.user_id IS NULL THEN 'removed'
                  WHEN a.v <> b.v THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL JOIN b ON a.user_id = b.user_id)
SELECT status, COUNT(*) AS n FROM j GROUP BY status""")
def snapshot_diff_users(sf_dir: str) -> pd.DataFrame:
    """Snapshot diff (the table-compare every incremental store needs
    after a backfill): per-user value between the month's two halves,
    classified added / removed / changed / unchanged. Scale shape: ONE
    streaming pass computes both periods' partials (a period flag
    rides each row, conditional sums combine exactly); the classify is
    map-side on the per-user aggregate and only (status, n) partials
    reach the driver — no second scan, no join of raw rows."""
    cut = np.datetime64("2024-01-16T00:00:00")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        in_a = (df["ts"].to_numpy() < cut)
        v = df["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "va": np.where(in_a, v, 0.0),
            "vb": np.where(in_a, 0.0, v),
            "na": in_a.astype(np.int64),
            "nb": (~in_a).astype(np.int64)})

    agg = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pandas"),
        ["user_id"], {"va": ("va", "sum"), "vb": ("vb", "sum"),
                      "na": ("na", "sum"), "nb": ("nb", "sum")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        has_a = df["na"].to_numpy() > 0
        has_b = df["nb"].to_numpy() > 0
        va = textstats.round_half_away(df["va"].to_numpy(np.float64), 2)
        vb = textstats.round_half_away(df["vb"].to_numpy(np.float64), 2)
        status = np.where(~has_a, "added",
                          np.where(~has_b, "removed",
                                   np.where(va != vb, "changed",
                                            "unchanged")))
        c = pd.Series(status).value_counts()
        return pd.DataFrame({"status": c.index.to_numpy(),
                             "n": c.to_numpy(np.int64)})

    out = reduce_sink(agg.map_batches(classify, batch_format="pandas"),
                      ["status"], {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("status", ignore_index=True)


@register("centroid_confusion", sql="""
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
                ORDER BY sim DESC, pred_label) AS rk FROM s)
SELECT true_label, pred_label, COUNT(*) AS n
FROM r WHERE rk = 1 GROUP BY 1, 2""")
def centroid_confusion(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid classification + confusion matrix (the
    Rocchio/prototype classifier — also SemDeDup's assignment step):
    per-label centroids reduce from (sum-vector, count) partials, the
    |labels|×dim centroid matrix broadcasts once, each batch assigns
    by one cosine matmul (similarities rounded to 9 dp so float noise
    can't flip an argmax between engines; ties break on the smaller
    label), and only (true, pred, n) partials shuffle."""
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
    labels = piv.index.to_numpy(np.int64)
    C = piv.to_numpy(np.float64)                    # (L, d)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put((labels, Cn))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        labs, cn = ray.get(c_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ cn.T, 9)               # (n, L)
        # argmax with smaller-label tiebreak: labels ascend, argmax
        # returns the FIRST max — matches ORDER BY sim DESC, label
        pred = labs[np.argmax(sims, axis=1)]
        g = pd.DataFrame({"true_label": df["label"].to_numpy(np.int64),
                          "pred_label": pred}) \
            .groupby(["true_label", "pred_label"], sort=False).size()
        out = g.rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    out = reduce_sink(ds.map_batches(assign, batch_format="pandas"),
                      ["true_label", "pred_label"],
                      {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["true_label", "pred_label"],
                           ignore_index=True)


@register("event_periodicity", sql="""
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS bucket,
                  CAST(COUNT(*) AS DOUBLE) AS n
           FROM events GROUP BY 1),
ext AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi,
               CAST(MAX(bucket) - MIN(bucket) + 1 AS DOUBLE) AS nn
        FROM b),
t AS (SELECT u.t,
             COALESCE(b.n, 0) - (SELECT SUM(n) FROM b)
                 / (SELECT nn FROM ext) AS x
      FROM (SELECT unnest(range(0, (SELECT CAST(nn AS BIGINT)
                                    FROM ext))) AS t) u
      LEFT JOIN b ON b.bucket = (SELECT lo FROM ext) + u.t),
ks AS (SELECT unnest(range(1, (SELECT CAST(nn AS BIGINT) FROM ext)
                              // 2 + 1)) AS k),
pw AS (SELECT ks.k,
              POWER(SUM(t.x * COS(2 * PI() * ks.k * t.t
                                  / (SELECT nn FROM ext))), 2)
            + POWER(SUM(t.x * SIN(2 * PI() * ks.k * t.t
                                  / (SELECT nn FROM ext))), 2) AS p
       FROM ks CROSS JOIN t GROUP BY ks.k),
pick AS (SELECT k, p FROM pw ORDER BY p DESC, k LIMIT 1)
SELECT ROUND((SELECT nn FROM ext) / (SELECT k FROM pick), 4)
           AS dominant_period_hours,
       ROUND((SELECT p FROM pick) / (SELECT SUM(p) FROM pw), 6)
           AS power_share,
       (SELECT CAST(nn AS BIGINT) FROM ext) AS series_hours""")
def event_periodicity(sf_dir: str) -> pd.DataFrame:
    """Seasonality detection: dominant period of the event-arrival
    series (the diurnal/weekly-pattern check every traffic report
    implies). Scale shape: the heavy work is ONE distributed
    count-per-hour-bucket reduce (only (bucket, n) partials shuffle —
    the series is a few hundred points per month regardless of corpus
    size); the periodogram (mean-detrended rFFT) runs on that tiny
    series driver-side. Returns the dominant period in hours and its
    share of non-DC spectral power. Oracle: the direct DFT sums
    SUM(x·cos)² + SUM(x·sin)² per bin in SQL — algebraically equal to
    |rfft|², associativity noise far below the 6 dp rounding."""
    ds = _events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        b = us // 3_600_000_000
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    agg = reduce_sink(ds.map_batches(partial, batch_format="pyarrow"),
                      ["bucket"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values("bucket")
    lo, hi = int(agg["bucket"].min()), int(agg["bucket"].max())
    series = np.zeros(hi - lo + 1)
    series[agg["bucket"].to_numpy() - lo] = agg["n"].to_numpy(np.float64)
    x = series - series.mean()
    power = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), d=1.0)          # cycles per hour
    k = 1 + int(np.argmax(power[1:]))               # skip DC
    period = 1.0 / freqs[k]
    share = float(power[k] / power[1:].sum()) if power[1:].sum() > 0 \
        else 0.0
    return pd.DataFrame({
        "dominant_period_hours": [float(textstats.round_half_away(
            period, 4))],
        "power_share": [float(textstats.round_half_away(share, 6))],
        "series_hours": [np.int64(len(series))]})


@register("embedding_pca_spectrum", sql=None)  # eigendecomposition — not SQL
def embedding_pca_spectrum(sf_dir: str) -> pd.DataFrame:
    """PCA spectrum + whitening check for the embedding table (the
    retrieval-pipeline preprocessing of Jégou & Chum 2012): covariance
    from ONE streaming pass of (Σx, Σxxᵀ, n) moment partials — nothing
    bigger than d² floats per block shuffles. Rows-only: the
    eigendecomposition has no SQL equivalent; test_whiten pins the
    spectrum against numpy.linalg.eigh on the gathered matrix and the
    whitened covariance ≈ identity. Eigendecomposition runs on
    the driver, then a stateless whitening matmul pass whose output
    covariance the query verifies is the identity (per-dim variance
    reported, must be ~1)."""
    from webalizer_ray.stages.whiten import (
        covariance_moments, pca_spectrum, whiten)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mean, cov, n = covariance_moments(ds)
    eigvals, eigvecs = pca_spectrum(cov)
    wds = whiten(ds, mean, eigvals, eigvecs)
    _, wcov, _ = covariance_moments(wds)
    return pd.DataFrame({
        "dim": np.arange(len(eigvals), dtype=np.int64),
        "eigenvalue": textstats.round_half_away(eigvals, 6),
        "whitened_var": textstats.round_half_away(np.diag(wcov), 6)})


@register("type_hour_mi", sql="""
WITH j AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
                  COUNT(*) AS nxy FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
t AS (SELECT SUM(nxy) AS n FROM j)
SELECT ROUND(SUM(CAST(nxy AS DOUBLE) / n
                 * ln(CAST(nxy AS DOUBLE) * n / (nx * ny))), 6) AS mi
FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t""")
def type_hour_mi(sf_dir: str) -> pd.DataFrame:
    """Mutual information between event type and hour-of-day (the
    dependence screen feature-selection and drift monitors use, next
    of kin to the bigram PMI table). Scale shape: the corpus reduces
    to the joint (type, hour, n) histogram — |types|×24 rows — via
    per-batch count partials; marginals and the MI closed form run on
    that tiny table with the float expression in oracle order."""
    ds = _events(sf_dir, ["ts", "event_type"]).map_batches(
        _with_time_cols({"hour"}), batch_format="pyarrow")
    j = reduce_sink(ds.map_batches(
        lambda t: pa.table({"x": t["event_type"], "y": t["hour"],
                            "one": pa.array(np.ones(t.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow"),
        ["x", "y"], {"nxy": ("one", "sum")}).to_pandas()
    n = float(j["nxy"].sum())
    nx = j.groupby("x")["nxy"].transform("sum").to_numpy(np.float64)
    ny = j.groupby("y")["nxy"].transform("sum").to_numpy(np.float64)
    nxy = j["nxy"].to_numpy(np.float64)
    mi = float((nxy / n * np.log(nxy * n / (nx * ny))).sum())
    return pd.DataFrame({"mi": [float(textstats.round_half_away(mi, 6))]})


@register("padding_waste_by_bucket", sql=r"""
WITH t AS (SELECT len(regexp_extract_all(text, '\S+')) AS n_tokens
           FROM documents),
b AS (SELECT n_tokens,
             CAST(CEIL(CAST(n_tokens AS DOUBLE) / 64) AS BIGINT)
                 AS bucket
      FROM t)
SELECT bucket, COUNT(*) AS docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
           AS padding_waste
FROM b GROUP BY bucket""")
def padding_waste_by_bucket(sf_dir: str) -> pd.DataFrame:
    """Length-bucketed batching profile (the padding-waste report
    behind inference/training batch planners): docs bucketed by
    64-token length bands; padding waste = what batching each bucket
    to its longest member costs. Token counts are the Arrow regex
    kernel; only (bucket, docs, Σtokens, max) partials shuffle; the
    waste expression is closed-form on the tiny aggregate."""
    def partial(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bucket = np.ceil(n / 64.0).astype(np.int64)
        return pa.table({"bucket": bucket, "n_tokens": n,
                         "one": np.ones(len(n), np.int64)})

    agg = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pyarrow"),
        ["bucket"], {"docs": ("one", "sum"), "tokens": ("n_tokens", "sum"),
                     "max_tokens": ("n_tokens", "max")}).to_pandas()
    for c in ["docs", "tokens", "max_tokens"]:
        agg[c] = agg[c].astype(np.int64)
    agg["padding_waste"] = (agg["docs"] * agg["max_tokens"]
                            - agg["tokens"]).astype(np.int64)
    return agg.sort_values("bucket", ignore_index=True)


@register("value_trend_by_type", sql="""
WITH b AS (SELECT event_type,
                  CAST(epoch_us(ts)
                       - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
                  / 86400000000.0 AS x,
                  value AS y FROM events),
s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM b GROUP BY 1)
SELECT event_type,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
FROM s""")
def value_trend_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS trend (grouped version of value_trend_ols — the
    per-segment drift report): the five scalar moments reduce PER
    EVENT TYPE as ordinary keyed partials, so the shuffle carries
    |types| × 5 floats per block and the slope closed form runs on the
    tiny per-type table in oracle expression order."""
    ds = _events(sf_dir, ["ts", "value", "event_type"])
    epoch_us_2024 = 1704067200000000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = ((df["ts"].astype("int64").to_numpy() - epoch_us_2024)
             .astype(np.float64) / 86400000000.0)
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": np.int64(1), "sx": x, "sy": y,
                          "sxy": x * y, "sxx": x * x})
        return g.groupby("event_type", sort=False).sum().reset_index()

    agg = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                      ["event_type"],
                      {"n": ("n", "sum"), "sx": ("sx", "sum"),
                       "sy": ("sy", "sum"), "sxy": ("sxy", "sum"),
                       "sxx": ("sxx", "sum")}).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy, sxx = (agg["sxy"].to_numpy(np.float64),
                agg["sxx"].to_numpy(np.float64))
    agg["slope"] = textstats.round_half_away(
        (n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    return agg[["event_type", "slope"]] \
        .sort_values("event_type", ignore_index=True)


@register("view_purchase_1h_conversion", sql="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT CAST(COUNT(*) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN EXISTS (
            SELECT 1 FROM p WHERE p.user_id = v.user_id
              AND p.ts > v.ts
              AND p.ts <= v.ts + INTERVAL 1 HOUR)
            THEN 1 ELSE 0 END) AS BIGINT) AS converted
FROM v""")
def view_purchase_1h_conversion(sf_dir: str) -> pd.DataFrame:
    """Attribution-window conversion (EXISTS within a time window —
    the ad-attribution primitive): for every view, did the same user
    purchase within the next hour? Scale shape: both event streams
    co-locate in the user-hash bucket; inside each bucket ONE
    vectorized searchsorted of purchase timestamps answers every view
    (no pairwise expansion); only two scalar partials per bucket reach
    the driver."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    num_buckets = 32
    hour_us = 3_600_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "purchase"])].copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def convert(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        is_v = (g["event_type"] == "view").to_numpy()
        # composite int64 key (user_rank * span + relative_ts) makes
        # ONE sorted array searchable per (user, window) with plain
        # searchsorted — no per-user Python loop, no pair expansion
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        # int64 headroom: users-per-bucket × time-span must fit; at a
        # month span (~2.7e12 µs) that is ~3e6 users per bucket — raise
        # num_buckets before this ever binds at scale
        if int(uranks.max(initial=0) + 1) > (2 ** 63 - 1) // int(span):
            raise ValueError("composite key overflow: raise num_buckets")
        key = uranks * span + base
        pk = np.sort(key[~is_v])
        vk = key[is_v]
        left = np.searchsorted(pk, vk, side="right")
        right = np.searchsorted(pk, vk + hour_us, side="right")
        return pd.DataFrame({
            "views": [np.int64(len(vk))],
            "converted": [np.int64(int((right > left).sum()))]})

    p = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(convert, batch_format="pandas") \
        .to_pandas()
    return pd.DataFrame({"views": [np.int64(p["views"].sum())],
                         "converted": [np.int64(p["converted"].sum())]})


@register("analyze_events", sql="""
SELECT 'event_id' AS col, COUNT(*) AS n,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS nulls,
       COUNT(DISTINCT event_id) AS ndv,
       ROUND(MIN(event_id), 6) AS min_num,
       ROUND(MAX(event_id), 6) AS max_num
FROM events
UNION ALL
SELECT 'user_id', COUNT(*),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT user_id), ROUND(MIN(user_id), 6),
       ROUND(MAX(user_id), 6) FROM events
UNION ALL
SELECT 'value', COUNT(*),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT value), ROUND(MIN(value), 6),
       ROUND(MAX(value), 6) FROM events
UNION ALL
SELECT 'event_type', COUNT(*),
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT event_type), NULL, NULL FROM events""")
def analyze_events(sf_dir: str) -> pd.DataFrame:
    """ANALYZE-style table profile (the stats collection every
    optimizer and data-quality gate runs): per column — row count,
    nulls, exact NDV, numeric min/max. One streaming pass emits a
    single partial row per (block, column) for count/null/min/max; NDV
    reuses the exact two-phase distinct (only distinct values shuffle,
    then per-bucket counts). At extreme cardinality swap NDV to the
    HLL sketch (`distinct_users_hll` shows the path)."""
    cols = ["event_id", "user_id", "value", "event_type"]
    ds = _events(sf_dir, cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            num = s.dtype.kind in "if"
            rows.append({
                "col": c, "n": np.int64(len(s)),
                "nulls": np.int64(s.isna().sum()),
                "min_num": float(s.min()) if num and len(s) else np.nan,
                "max_num": float(s.max()) if num and len(s) else np.nan})
        return pd.DataFrame(rows)

    agg = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                      ["col"], {"n": ("n", "sum"),
                                "nulls": ("nulls", "sum"),
                                "min_num": ("min_num", "min"),
                                "max_num": ("max_num", "max")}).to_pandas()
    ndvs = {}
    for c in cols:
        one = distinct_count(ds.map_batches(
            lambda t, c=c: pa.table(
                {"g": pa.array(np.zeros(t.num_rows, np.int64)),
                 c: t[c]}), batch_format="pyarrow"),
            ["g"], c, "ndv").to_pandas()
        ndvs[c] = np.int64(one["ndv"].iloc[0]) if len(one) else np.int64(0)
    agg["ndv"] = agg["col"].map(ndvs).astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    agg["nulls"] = agg["nulls"].astype(np.int64)
    for c in ["min_num", "max_num"]:
        agg[c] = textstats.round_half_away(
            agg[c].to_numpy(np.float64), 6)
    return agg[["col", "n", "nulls", "ndv", "min_num", "max_num"]] \
        .sort_values("col", ignore_index=True)


@register("join_cardinality_estimate", sql="""
WITH l AS (SELECT o_custkey AS k, COUNT(*) AS nl FROM orders GROUP BY 1),
r AS (SELECT c_custkey AS k, COUNT(*) AS nr FROM customer GROUP BY 1)
SELECT CAST(SUM(nl * nr) AS BIGINT) AS join_rows,
       CAST(MAX(nl * nr) AS BIGINT) AS max_key_rows,
       CAST(COUNT(*) AS BIGINT) AS matching_keys
FROM l JOIN r USING (k)""")
def join_cardinality_estimate(sf_dir: str) -> pd.DataFrame:
    """Join-explosion guard (run BEFORE a big join): the exact output
    cardinality of orders⋈customer from per-key count histograms —
    Σ nl·nr — plus the hottest key's contribution. Only (key, count)
    aggregates shuffle (never the fact rows), so the guard costs two
    keyed reduces and a count-table join; max_key_rows is what tells
    you to reach for skew_join."""
    lo = reduce_sink(rd.read_parquet(f"{sf_dir}/orders.parquet",
                                     columns=["o_custkey"]),
                     ["o_custkey"], {"nl": ("o_custkey", "size")})
    ro = reduce_sink(rd.read_parquet(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey"]),
                     ["c_custkey"], {"nr": ("c_custkey", "size")})
    j = lo.join(ro, join_type="inner", num_partitions=4,
                on=("o_custkey",), right_on=("c_custkey",)).to_pandas()
    prod = (j["nl"].to_numpy(np.int64) * j["nr"].to_numpy(np.int64))
    return pd.DataFrame({
        "join_rows": [np.int64(prod.sum())],
        "max_key_rows": [np.int64(prod.max() if len(prod) else 0)],
        "matching_keys": [np.int64(len(j))]})


@register("user_activity_islands", sql="""
WITH iv AS (SELECT user_id, ts AS s,
                   ts + INTERVAL 5 MINUTE AS e FROM events),
o AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv),
g AS (SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
      FROM o),
m AS (SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
      FROM g GROUP BY user_id, island)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS islands,
       CAST(SUM(epoch_us(en) - epoch_us(st)) // 1000000 AS BIGINT)
           AS covered_s
FROM m GROUP BY user_id""")
def user_activity_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands (merge overlapping intervals): each event opens
    a 5-minute activity interval; overlapping intervals per user merge
    into islands, reporting island count and covered seconds. The
    classic hard-SQL window pattern, computed here as ONE vectorized
    cummax/flag/segment-reduce inside the user-hash bucket (a user's
    intervals never span buckets); only (user, islands, covered)
    aggregates shuffle."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id"])
    num_buckets = 32
    win_us = 5 * 60 * 1_000_000

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy()
                         % num_buckets).astype(np.int32)
        return df

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        s = g["ts"].astype("int64").to_numpy()
        e = s + win_us
        same = uid == np.roll(uid, 1)
        if len(same):
            same[0] = False
        # equal-length intervals sorted by start ⇒ ends are sorted too,
        # so the running max end within a user IS the previous end —
        # the general cummax degenerates to one roll
        prev_e = np.roll(e, 1)
        new_island = (~same) | (s > prev_e)
        island_id = np.cumsum(new_island) - 1
        m = pd.DataFrame({"uid": uid, "isl": island_id, "s": s, "e": e}) \
            .groupby("isl", sort=False).agg(
                uid=("uid", "first"), st=("s", "min"), en=("e", "max"))
        cov_us = (m["en"] - m["st"]).groupby(m["uid"]).sum()
        cnt = m.groupby("uid", sort=False).size()
        return pd.DataFrame({
            "user_id": cnt.index.to_numpy(np.int64),
            "islands": cnt.to_numpy(np.int64),
            "covered_s": (cov_us.loc[cnt.index].to_numpy(np.int64)
                          // 1_000_000)})

    out = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(islands, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id", ignore_index=True)


@register("weekly_active_users", sql="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau
FROM days JOIN d ON d.day > days.day - 7 AND d.day <= days.day
GROUP BY days.day""")
def weekly_active_users(sf_dir: str) -> pd.DataFrame:
    """7-day rolling distinct users (WAU — the rolling COUNT DISTINCT
    that SQL window frames cannot express): the corpus reduces to
    distinct (day, user) pairs; each pair flat-maps to the ≤7 window
    anchors it supports; a second exact distinct collapses users seen
    on several days of one window. Only (day, user) pairs — bounded by
    users × days — ever shuffle, never events."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // 86_400_000_000).astype(np.int64)
        df = pd.DataFrame({"day": day,
                           "user_id": t["user_id"].to_numpy(
                               zero_copy_only=False)}).drop_duplicates()
        return df

    pairs = reduce_sink(ds.map_batches(day_pairs, batch_format="pyarrow"),
                        ["day", "user_id"], {"n": ("day", "size")})
    # the observed-day set bounds window anchors (match the oracle's
    # "days" table = days with ≥1 event)
    days = sorted(reduce_sink(pairs, ["day"], {"n": ("n", "size")})
                  .to_pandas()["day"].tolist())
    days_ref = ray.put(np.array(days, np.int64))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        anchors = ray.get(days_ref)
        d = df["day"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        # each (day, user) supports anchors in [day, day+6] ∩ observed
        lo = np.searchsorted(anchors, d, side="left")
        hi = np.searchsorted(anchors, d + 7, side="left")
        reps = (hi - lo).astype(np.int64)
        cum = np.cumsum(reps)
        starts = np.repeat(cum - reps, reps)
        offs = np.arange(cum[-1] if len(df) else 0) - starts
        a_idx = np.repeat(lo, reps) + offs
        return pd.DataFrame({"anchor": anchors[a_idx],
                             "user_id": np.repeat(u, reps)}) \
            .drop_duplicates()

    wau = distinct_count(
        pairs.map_batches(expand, batch_format="pandas"),
        ["anchor"], "user_id", "wau").to_pandas()
    wau["day"] = pd.to_datetime(wau["anchor"] * 86_400_000_000,
                                unit="us").dt.strftime("%Y-%m-%d")
    wau["wau"] = wau["wau"].astype(np.int64)
    return wau[["day", "wau"]].sort_values("day", ignore_index=True)


@register("monthly_unpivot", sql="""
WITH m AS (SELECT strftime(ts, '%Y-%m') AS month,
                  CAST(COUNT(*) AS BIGINT) AS hits,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
                  CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d'))
                       AS BIGINT) AS days
           FROM events GROUP BY 1)
SELECT month, metric, val
FROM m UNPIVOT (val FOR metric IN (hits, users, days))""")
def monthly_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt (the inverse of hour_type_pivot, completing the
    reshape family): the monthly wide aggregate — itself a partials
    reduce — melts to (month, metric, val) long form batch-locally.
    The melt is pure pandas on the tiny aggregate; nothing extra
    shuffles."""
    ds = _events(sf_dir, ["ts", "user_id"]).map_batches(
        _with_time_cols({"month", "date"}), batch_format="pyarrow")
    agg = reduce_sink(ds, ["month"],
                      {"hits": ("ts", "size")}).to_pandas()
    users = distinct_count(ds, ["month"], "user_id", "users").to_pandas()
    days = distinct_count(ds, ["month"], "date", "days").to_pandas()
    wide = agg.merge(users, on="month").merge(days, on="month")
    wide = wide[["month", "hits", "users", "days"]]
    for c in ["hits", "users", "days"]:
        wide[c] = wide[c].astype(np.int64)
    long = wide.melt(id_vars=["month"], var_name="metric",
                     value_name="val")
    long["val"] = long["val"].astype(np.int64)
    return long.sort_values(["month", "metric"], ignore_index=True)


@register("weighted_sample_docs", sql=r"""
WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS w
           FROM documents),
k AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
             ROUND(ln((((doc_id * 2654435761) % 4294967296) + 1)
                      / 4294967297.0) / w, 9) AS key
      FROM t WHERE w > 0)
SELECT doc_id, w FROM k ORDER BY key DESC, doc_id LIMIT 50""")
def weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis 2006: top-k by u^(1/w), here the order-equivalent
    ln(u)/w): u comes from the same Knuth multiplicative hash the
    shuffle oracle uses, so the draw is reproducible across runs,
    cluster sizes AND engines. Per-batch local top-k partials are
    mergeable (block-layout invariant); keys round to 9 dp with a
    doc_id tiebreak so libm ulp differences can't flip the cut."""
    k = 50

    def partial(t: pa.Table) -> pd.DataFrame:
        w = pc.cast(pc.count_substring_regex(
            t["text"], textstats.TOKEN_RX), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = w > 0
        ids, w = ids[m], w[m]
        u = ((ids * 2654435761) % 4294967296 + 1) / 4294967297.0
        key = textstats.round_half_away(np.log(u) / w, 9)
        df = pd.DataFrame({"doc_id": ids, "w": w, "key": key})
        return df.sort_values(["key", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    cand = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["key", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(k)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["w"] = out["w"].astype(np.int64)
    return out[["doc_id", "w"]].reset_index(drop=True)


_SKEW_VERSION = 2


def _skewed_dir() -> str:
    """Deterministic zipf-ish join fixture (60% of probe rows share one
    hot key) — built once per user under /tmp, same publish convention
    as the evolved store. x values are dyadic (int/64) so float sums
    are EXACT under any summation order — the join's output block
    order varies run to run, and a non-dyadic sum at a rounding
    boundary would flip the last digit against the oracle."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_skew_u{uid}_v{_SKEW_VERSION}")
    marker = os.path.join(d, "dim.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(3)
        n = 20000
        k = np.where(rng.random(n) < 0.6, 7,
                     rng.integers(0, 50, n)).astype(np.int64)
        probe = pa.table({"k": k,
                          "rid": np.arange(n, dtype=np.int64),
                          "x": rng.integers(-6400, 6400, n) / 64.0})
        dim = pa.table({"rk": np.arange(50, dtype=np.int64),
                        "y": np.arange(50, dtype=np.float64) * 2.0})
        for name, t in [("probe", probe), ("dim", dim)]:
            tmp = os.path.join(d, f".{name}-{os.getpid()}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.parquet"))
    return d


@register("skewed_join_totals", sql=None)  # filled in below
def skewed_join_totals(sf_dir: str) -> pd.DataFrame:
    """Salted skew join (stages/join.py:skew_join): 60% of probe rows
    share one hot key, which a plain hash join funnels through a
    single partition; salting spreads the hot key across num_salts
    sub-partitions while the build side replicates only its hot rows —
    every pair still meets exactly once (the per-key totals prove it
    against DuckDB's join over the same files)."""
    from webalizer_ray.stages.join import skew_join

    d = _skewed_dir()
    probe = rd.read_parquet(f"{d}/probe.parquet")
    dim = rd.read_parquet(f"{d}/dim.parquet")
    j = skew_join(probe, dim, on="k", right_on="rk", salt_src="rid",
                  num_salts=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False).agg(
            n=("rid", "size"), xs=("x", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = reduce_sink(j.map_batches(partial, batch_format="pandas"),
                      ["k"], {"n": ("n", "sum"), "xs": ("xs", "sum")}) \
        .to_pandas()
    # multiply by y ONCE after the full sum — SUM(x) * y in oracle order
    dim_pd = pq.read_table(f"{d}/dim.parquet").to_pandas()
    agg = agg.merge(dim_pd, left_on="k", right_on="rk")
    agg["n"] = agg["n"].astype(np.int64)
    agg["xy_sum"] = textstats.round_half_away(
        agg["xs"].to_numpy(np.float64) * agg["y"].to_numpy(np.float64), 2)
    return agg[["k", "n", "xy_sum"]].sort_values("k", ignore_index=True)


REGISTRY["skewed_join_totals"] = (
    skewed_join_totals,
    f"""SELECT k, COUNT(*) AS n, ROUND(SUM(x) * y, 2) AS xy_sum
FROM read_parquet('{os.path.join(tempfile.gettempdir(), "wr_skew_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_SKEW_VERSION))}/probe.parquet') p
JOIN read_parquet('{os.path.join(tempfile.gettempdir(), "wr_skew_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_SKEW_VERSION))}/dim.parquet') d
  ON k = rk
GROUP BY k, y""")


_EVOLVED_VERSION = 1


def _evolved_dir() -> str:
    """Deterministic 3-generation parquet store whose schema widened
    over time (gen1: id,val · gen2: +tag · gen3: +score) — the
    schema-evolution fixture, built once per user under /tmp with the
    same atomic-publish convention as _media_ds."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_evolved_u{uid}_v{_EVOLVED_VERSION}")
    marker = os.path.join(d, "gen3.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        ids1 = np.arange(0, 100, dtype=np.int64)
        ids2 = np.arange(100, 200, dtype=np.int64)
        ids3 = np.arange(200, 300, dtype=np.int64)
        gens = [
            ("gen1", pa.table({"id": ids1, "val": ids1 * 0.5})),
            ("gen2", pa.table({"id": ids2, "val": ids2 * 0.5,
                               "tag": pa.array([f"t{i % 3}"
                                                for i in ids2])})),
            ("gen3", pa.table({"id": ids3, "val": ids3 * 0.5,
                               "tag": pa.array([f"t{i % 3}"
                                                for i in ids3]),
                               "score": ids3 * 0.25})),
        ]
        for name, t in gens:
            tmp = os.path.join(d, f".{name}-{os.getpid()}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.parquet"))
    return d


@register("evolved_store_profile", sql=None)  # filled in below
def evolved_store_profile(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution read (union-by-name): three file generations
    with widening schemas unify from footers only; missing columns
    materialize as typed nulls in a zero-copy Arrow align pass; the
    profile reduces as per-batch scalar partials. Oracle: DuckDB's own
    read_parquet(..., union_by_name=true) over the same files."""
    from webalizer_ray.sources.readers import read_parquet_unified

    ds = read_parquet_unified(_evolved_dir())

    def partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": [np.int64(t.num_rows)],
            "n_tag": [np.int64(t.num_rows - t["tag"].null_count)],
            "n_score": [np.int64(t.num_rows - t["score"].null_count)],
            "val_sum": [float(pc.sum(t["val"]).as_py() or 0.0)]})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_rows": [np.int64(p["n_rows"].sum())],
        "n_tag": [np.int64(p["n_tag"].sum())],
        "n_score": [np.int64(p["n_score"].sum())],
        "val_sum": [float(textstats.round_half_away(
            float(p["val_sum"].sum()), 2))]})


# the oracle reads the same deterministic fixture path via DuckDB's
# union_by_name (built on first query() call; queries run before oracles)
REGISTRY["evolved_store_profile"] = (
    evolved_store_profile,
    f"""SELECT COUNT(*) AS n_rows, COUNT(tag) AS n_tag,
       COUNT(score) AS n_score, ROUND(SUM(val), 2) AS val_sum
FROM read_parquet('{os.path.join(tempfile.gettempdir(), "wr_evolved_u" + str(os.getuid() if hasattr(os, "getuid") else 0) + "_v" + str(_EVOLVED_VERSION))}/*.parquet', union_by_name=true)""")


_BM25_INDEX_VERSION = 1


def _bm25_index_dir(sf_dir: str) -> str:
    """Per-(user, corpus, version) index path; build once, reuse —
    the index store is the point of the indexed path."""
    import hashlib
    docs = f"{sf_dir}/documents.parquet"
    st = os.stat(docs)
    tag = hashlib.sha1(
        f"{os.path.abspath(docs)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_BM25_INDEX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_bm25idx_u{uid}_{tag}")


@register("bm25_search_indexed", sql=None)  # oracle attached below
def bm25_search_indexed(sf_dir: str) -> pd.DataFrame:
    """BM25 over a PERSISTED term-sharded inverted index
    (stages/invindex.py): the corpus scan is paid once at build; a
    query reads only the term-hash buckets its terms live in, with a
    term predicate pushed into the scan — query cost ∝ matched
    postings, not corpus size. Same scoring math and oracle as
    bm25_search (the scan path); df comes from the postings in hand."""
    from webalizer_ray.stages.invindex import build_index, query_index

    idx = _bm25_index_dir(sf_dir)
    if not os.path.exists(os.path.join(idx, "_meta.json")):
        build_index(_docs(sf_dir, ["doc_id", "text"]), idx)
    return query_index(idx, list(_BM25_TERMS), k=10)


#: Morton interleave as a generated SQL expression (bit i of x at 2i,
#: bit i of y at 2i+1) — integer arithmetic, exact on both sides.
_Z_BITS = 12
_Z_EXPR = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS))


@register("zorder_curve_hist", sql=f"""
WITH q AS (SELECT CAST(hour(ts) AS BIGINT) AS x,
                  CAST(NTILE(4096) OVER (ORDER BY value, event_id) - 1
                       AS BIGINT) AS y
           FROM events),
z AS (SELECT ({_Z_EXPR}) AS z FROM q)
SELECT CAST(z >> 12 AS BIGINT) AS zbucket, COUNT(*) AS n
FROM z GROUP BY zbucket""")
def zorder_curve_hist(sf_dir: str) -> pd.DataFrame:
    """Z-order curve assignment (the OPTIMIZE ZORDER BY layout key):
    hour × value-NTILE interleaved into a Morton code, histogrammed by
    curve bucket. The NTILE quantization rides the distributed ORDER BY
    rank (scan.global_rank — only bucket counts reach the driver), the
    interleave is a vectorized per-batch transform, and only (zbucket,
    n) partials shuffle. stages/layout.py applies the same curve as a
    physical re-layout; the pruning win is asserted in tests from
    parquet footer stats."""
    from webalizer_ray.stages.layout import interleave_bits2

    ds = _events(sf_dir, ["event_id", "ts", "value"]).map_batches(
        _with_time_cols({"hour"}), batch_format="pyarrow")
    n_rows = _events(sf_dir, ["event_id"]).count()
    ranked = scan.global_rank(ds, "value", "event_id", num_buckets=16)

    k = 4096
    q, rem = divmod(n_rows, k)
    big = rem * (q + 1)

    def zbucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rnk"].to_numpy(np.int64)
        ntile = np.where(r <= big, (r - 1) // max(q + 1, 1) + 1,
                         rem + (r - big - 1) // max(q, 1) + 1)
        z = interleave_bits2(df["hour"].to_numpy(np.int64),
                             ntile.astype(np.int64) - 1, bits=_Z_BITS)
        return pd.DataFrame({"zbucket": z >> 12,
                             "one": np.ones(len(df), np.int64)})

    agg = reduce_sink(ranked.map_batches(zbucket, batch_format="pandas"),
                      ["zbucket"], {"n": ("one", "sum")}).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values("zbucket", ignore_index=True)


# the indexed path must reproduce the scan path bit-for-bit → same oracle
REGISTRY["bm25_search_indexed"] = (bm25_search_indexed,
                                   REGISTRY["bm25_search"][1])


@register("bm25_search_index_appended", sql=None)  # oracle attached below
def bm25_search_index_appended(sf_dir: str) -> pd.DataFrame:
    """Incremental index MAINTENANCE: build the inverted index over 3/4
    of the corpus, append_index the remaining 1/4 as a second segment
    (no rebuild — the LSM pattern), query the segmented index. The
    oracle is the FULL-corpus bm25_search SQL, so the green row proves
    append+query ≡ rebuild bit-for-bit (collection stats are summed
    across segments, df comes from the unioned postings). Fresh scratch
    store per invocation — the append is what's under test."""
    import shutil

    from webalizer_ray.stages.invindex import (
        append_index,
        build_index,
        query_index,
    )

    idx = tempfile.mkdtemp(prefix="wr_bm25app_")
    try:
        def part(keep_mod0: bool):
            def f(t: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(3)),
                             pa.scalar(0))
                return t.filter(m if keep_mod0 else pc.invert(m))
            return f

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        build_index(docs.map_batches(part(False),
                                     batch_format="pyarrow"), idx)
        append_index(docs.map_batches(part(True),
                                      batch_format="pyarrow"),
                     idx, run_tag="r2")
        return query_index(idx, list(_BM25_TERMS), k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


REGISTRY["bm25_search_index_appended"] = (bm25_search_index_appended,
                                          REGISTRY["bm25_search"][1])


@register("mmr_diverse_topk", sql="""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = 0),
pool AS (SELECT e.vec_id,
                ROUND(list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]), q.qe), 9) AS rel,
                CAST(e.embedding AS DOUBLE[]) AS emb
         FROM embeddings e CROSS JOIN q
         ORDER BY rel DESC, e.vec_id LIMIT 50),
p1 AS (SELECT vec_id, rel, emb FROM pool
       ORDER BY ROUND(0.7 * rel, 9) DESC, vec_id LIMIT 1),
p2 AS (SELECT c.vec_id, c.rel, c.emb FROM pool c
       WHERE c.vec_id NOT IN (SELECT vec_id FROM p1)
       ORDER BY ROUND(0.7 * c.rel - 0.3 * (
           SELECT MAX(ROUND(list_cosine_similarity(c.emb, s.emb), 9))
           FROM (SELECT vec_id, emb FROM p1) s), 9) DESC, c.vec_id LIMIT 1),
p3 AS (SELECT c.vec_id, c.rel, c.emb FROM pool c
       WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2)
       ORDER BY ROUND(0.7 * c.rel - 0.3 * (
           SELECT MAX(ROUND(list_cosine_similarity(c.emb, s.emb), 9))
           FROM (SELECT vec_id, emb FROM p1 UNION ALL SELECT vec_id, emb FROM p2) s), 9) DESC, c.vec_id LIMIT 1),
p4 AS (SELECT c.vec_id, c.rel, c.emb FROM pool c
       WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2 UNION ALL SELECT vec_id FROM p3)
       ORDER BY ROUND(0.7 * c.rel - 0.3 * (
           SELECT MAX(ROUND(list_cosine_similarity(c.emb, s.emb), 9))
           FROM (SELECT vec_id, emb FROM p1 UNION ALL SELECT vec_id, emb FROM p2 UNION ALL SELECT vec_id, emb FROM p3) s), 9) DESC, c.vec_id LIMIT 1),
p5 AS (SELECT c.vec_id, c.rel, c.emb FROM pool c
       WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2 UNION ALL SELECT vec_id FROM p3 UNION ALL SELECT vec_id FROM p4)
       ORDER BY ROUND(0.7 * c.rel - 0.3 * (
           SELECT MAX(ROUND(list_cosine_similarity(c.emb, s.emb), 9))
           FROM (SELECT vec_id, emb FROM p1 UNION ALL SELECT vec_id, emb FROM p2 UNION ALL SELECT vec_id, emb FROM p3 UNION ALL SELECT vec_id, emb FROM p4) s), 9) DESC, c.vec_id LIMIT 1)
SELECT vec_id, ROUND(rel, 6) AS relevance,
       CAST(rank AS BIGINT) AS rank FROM (
SELECT vec_id, rel, 1 AS rank FROM p1 UNION ALL SELECT vec_id, rel, 2 AS rank FROM p2 UNION ALL SELECT vec_id, rel, 3 AS rank FROM p3 UNION ALL SELECT vec_id, rel, 4 AS rank FROM p4 UNION ALL SELECT vec_id, rel, 5 AS rank FROM p5
) ORDER BY rank""")
def mmr_diverse_topk(sf_dir: str) -> pd.DataFrame:
    """Diversity-aware retrieval (Maximal Marginal Relevance, SIGIR'98
    — the dedup-at-serving-time counterpart of the corpus dedup ops):
    distributed relevance top-pool partials feed a driver-side greedy
    loop over the tiny pool. Oracle: the k=5 greedy unrolled as five
    chained CTEs (argmax of 0.7·rel − 0.3·max-sim-to-chosen, ties by
    id) over the same top-50 pool via list_cosine_similarity — an
    independent SQL replay of the exact selection. pytest additionally
    proves λ=1 reduces to plain top-k and a planted near-duplicate is
    demoted."""
    from webalizer_ray.stages.ann import mmr_select

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))
                   ["embedding"].to_pylist()[0], np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return mmr_select(ds, q, k=5, pool=50, lam=0.7)


@register("incremental_fuzzy_dedup_counts", sql=_INCR_FUZZY_SQL)
def incremental_fuzzy_dedup_counts(sf_dir: str) -> pd.DataFrame:
    """Cross-run FUZZY dedup (near-dup corpus refresh).  Oracle (r4;
    previously rows-only): with SplitMix64 shingle hashing the DuckDB
    oracle replays both runs — run A feeds the first 60% of the
    corpus, run B the rest plus 15 planted light edits of run-A docs;
    a B doc drops iff a band-signature tuple collides with an A doc
    AND the Broder estimate ≥ 0.5 — and reproduces the per-round
    (input, kept, dropped) counts exactly.  The band/signature stores
    persist between runs (idempotent run-tagged files — a rerun of
    the same round converges to identical bytes), candidates come
    from LSH band collisions against PRIOR runs only, and the verify
    is a distributed signature merge; test_incremental_fuzzy
    additionally pins planted-dup drops, idempotent same-run reruns,
    and exact-refeed knockout."""
    import shutil

    from webalizer_ray.stages.dedup import incremental_minhash_dedup

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cut = int(len(docs) * 0.6)
    run_a = docs.iloc[:cut]
    edits = docs.iloc[:15].copy()
    edits["doc_id"] = edits["doc_id"] + 100_000
    edits["text"] = edits["text"] + " zz"
    run_b = pd.concat([docs.iloc[cut:], edits], ignore_index=True)

    # per-invocation scratch store: the query itself stays fully
    # deterministic (re-invocations can't see earlier rounds' files);
    # cross-run persistence semantics are covered by the store's own
    # tests (test_incremental_fuzzy.py)
    store = tempfile.mkdtemp(prefix="wr_fz_")
    try:
        rows = []
        for rid, frame in [("a", run_a), ("b", run_b)]:
            kept, drops = incremental_minhash_dedup(
                rd.from_pandas(frame), store, rid, threshold=0.5)
            # Dataset contract (r3): counts are distributed scalars
            rows.append({"round": rid,
                         "input_docs": np.int64(len(frame)),
                         "kept": np.int64(kept.count()),
                         "dropped": np.int64(drops.count())})
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@register("compression_ratio_docs", sql=None)  # zlib — not SQL
def compression_ratio_docs(sf_dir: str) -> pd.DataFrame:
    """Compressibility quality signal (Gopher-family filter: templated
    or repetitive text deflates far below natural prose): per-doc zlib
    ratio as a stateless map_batches pass — per-payload C-speed
    compression is inherent row work, same exemption as media decode.
    Rows-only; pytest plants repetitive-vs-natural texts."""
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.add_compression_ratio, batch_format="pandas") \
        .to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "compression_ratio"]] \
        .sort_values("doc_id", ignore_index=True)


@register("dup_cluster_sizes", sql=_DUP_CLUSTER_SIZES_SQL)
def dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Duplicate-cluster size histogram (the dedup report's headline
    table): connected components over the MinHash candidate graph,
    folded to (cluster_size, n_clusters).  Oracle (r4): the SQL
    replays the SplitMix64 MinHash chain, closes the pair graph with
    a recursive CTE, and folds the same histogram."""
    cl = minhash_dup_clusters(sf_dir)
    sizes = cl.groupby("cluster_id").size()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({
        "cluster_size": hist.index.to_numpy(np.int64),
        "n_clusters": hist.to_numpy(np.int64)})


_VEC_INDEX_VERSION = 1


def _vec_index_dir(sf_dir: str) -> str:
    """Per-(user, corpus, version) IVF store path; build once, reuse —
    the persisted store is the point of the indexed path."""
    import hashlib
    emb = f"{sf_dir}/embeddings.parquet"
    st = os.stat(emb)
    tag = hashlib.sha1(
        f"{os.path.abspath(emb)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_VEC_INDEX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_vecidx_u{uid}_{tag}")


@register("ann_topk_indexed", sql=None)  # oracle attached below
def ann_topk_indexed(sf_dir: str) -> pd.DataFrame:
    """Cosine top-k over a PERSISTED IVF cell store
    (stages/vecindex.py): clustering is paid once at build; a query
    loads only the k x d centroid matrix and scans JUST its probed
    cell= directories. Probing ALL cells here makes the answer exactly
    the brute-force scan's — same oracle as ann_topk; the pruning win
    at nprobe < k is proven by the delete-unprobed-cells test."""
    from webalizer_ray.stages import vecindex

    idx = _vec_index_dir(sf_dir)
    if not os.path.exists(os.path.join(idx, "_meta.json")):
        vecindex.build(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]), idx)
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    out = vecindex.query(idx, queries, k=5, nprobe=None)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]] \
        .sort_values(["query_id", "rank"], ignore_index=True)


REGISTRY["ann_topk_indexed"] = (ann_topk_indexed, REGISTRY["ann_topk"][1])


@register("events_stats_meta", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(value), 2) AS value_min, ROUND(MAX(value), 2) AS value_max,
       CAST(MIN(user_id) AS BIGINT) AS user_id_min,
       CAST(MAX(user_id) AS BIGINT) AS user_id_max,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS ts_min,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS ts_max
FROM events""")
def events_stats_meta(sf_dir: str) -> pd.DataFrame:
    """COUNT/MIN/MAX from parquet FOOTERS only (aggregate pushdown to
    row-group statistics, sources/readers.py:footer_aggregate): O(files)
    footer reads instead of O(rows) data bytes — the test suite proves
    no data page is touched by corrupting them all in place. Exact:
    stat-less columns fall back to a pruned per-file scan."""
    from webalizer_ray.sources.readers import footer_aggregate

    out = footer_aggregate(f"{sf_dir}/events.parquet",
                           ["value", "user_id", "ts"])
    return pd.DataFrame({
        "n_rows": out["n_rows"].astype(np.int64),
        "value_min": out["value_min"].astype(np.float64).round(2),
        "value_max": out["value_max"].astype(np.float64).round(2),
        "user_id_min": out["user_id_min"].astype(np.int64),
        "user_id_max": out["user_id_max"].astype(np.int64),
        "ts_min": [out["ts_min"][0].strftime("%Y-%m-%d %H:%M:%S.%f")],
        "ts_max": [out["ts_max"][0].strftime("%Y-%m-%d %H:%M:%S.%f")],
    })


@register("scd2_order_segments", sql="""
WITH dim AS (
  SELECT c_custkey, gen,
         CASE gen WHEN 0 THEN TIMESTAMP '1970-01-01'
                  WHEN 1 THEN TIMESTAMP '1996-01-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  ELSE TIMESTAMP '1998-06-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY END AS vfrom,
         CASE gen WHEN 0 THEN TIMESTAMP '1996-01-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  WHEN 1 THEN TIMESTAMP '1998-06-01'
                           + (c_custkey % 365) * INTERVAL 1 DAY
                  ELSE TIMESTAMP '2200-01-01' END AS vto
  FROM customer CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS gen))
SELECT CAST(d.gen AS BIGINT) AS gen, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.vfrom AND o.o_orderdate < d.vto
GROUP BY gen""")
def scd2_order_segments(sf_dir: str) -> pd.DataFrame:
    """SCD2 temporal-validity join (stages/join.py:temporal_join):
    orders pick the customer-segment GENERATION valid at order date —
    point-in-time-correct enrichment, the thing a current-values join
    gets wrong. Dimension = 3 deterministic generations per customer
    with boundaries derived arithmetically from the key (identical
    expression in the oracle). Revenue in integer cents so sums are
    exact under any summation order."""
    from webalizer_ray.stages.join import temporal_join

    day_us = np.int64(86_400_000_000)

    def gen_dim(df: pd.DataFrame) -> pd.DataFrame:
        c = np.repeat(df["c_custkey"].to_numpy(np.int64), 3)
        g = np.tile(np.array([0, 1, 2], np.int64), len(df))
        off = (c % 365) * day_us
        b1 = np.datetime64("1996-01-01", "us").astype(np.int64) + off
        b2 = np.datetime64("1998-06-01", "us").astype(np.int64) + off
        lo = np.datetime64("1970-01-01", "us").astype(np.int64)
        hi = np.datetime64("2200-01-01", "us").astype(np.int64)
        vfrom = np.where(g == 0, lo, np.where(g == 1, b1, b2))
        vto = np.where(g == 0, b1, np.where(g == 1, b2, hi))
        return pd.DataFrame({
            "o_custkey": c, "gen": g,
            "valid_from": vfrom.astype("datetime64[us]"),
            "valid_to": vto.astype("datetime64[us]")})

    dim = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"]) \
        .map_batches(gen_dim, batch_format="pandas")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "ts": df["o_orderdate"],
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})

    facts = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(cents, batch_format="pandas")

    joined = temporal_join(facts, dim, key="o_custkey", ts_col="ts",
                           how="inner")
    out = reduce_sink(joined, ["gen"],
                      {"n_orders": ("cents", "size"),
                       "revenue_cents": ("cents", "sum")}).to_pandas()
    out["gen"] = out["gen"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("gen", ignore_index=True)


_VSTORE_VERSION = 2


def _vstore_dir(sf_dir: str) -> str:
    import hashlib
    cust = f"{sf_dir}/customer.parquet"
    st = os.stat(cust)
    tag = hashlib.sha1(
        f"{os.path.abspath(cust)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_VSTORE_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"wr_vstore_u{uid}_{tag}")


def _build_vstore(sf_dir: str) -> str:
    """Deterministic 3-version store from customer: v1 = base
    (k, cents); v2 deletes k%7==0 and bumps k%5==0 by +10000; v3
    upserts k%3==0 to 555+k (re-inserting the k%21==0 keys v2
    deleted). Built once per (user, corpus, version); atomic
    staging+rename publish."""
    from webalizer_ray.state import versioned_store as vs

    out = _vstore_dir(sf_dir)
    if os.path.isdir(os.path.join(out, "_log")):
        return out

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].to_numpy(np.int64)
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"k": k, "grp": k % 10, "cents": cents})

    def delta2(df: pd.DataFrame) -> pd.DataFrame:
        r = base_rows(df)
        dele = r[r["k"] % 7 == 0].copy()
        dele["op"] = "delete"
        ups = r[(r["k"] % 5 == 0) & (r["k"] % 7 != 0)].copy()
        ups["cents"] = ups["cents"] + 10000
        ups["op"] = "upsert"
        out_ = pd.concat([dele, ups], ignore_index=True)
        out_["seq"] = out_["k"].to_numpy(np.int64)
        return out_[["k", "grp", "cents", "seq", "op"]]

    def delta3(df: pd.DataFrame) -> pd.DataFrame:
        r = base_rows(df)
        ups = r[r["k"] % 3 == 0].copy()
        ups["cents"] = 555 + ups["k"].to_numpy(np.int64)
        ups["op"] = "upsert"
        ups["seq"] = ups["k"].to_numpy(np.int64)
        return ups[["k", "grp", "cents", "seq", "op"]]

    cust = lambda: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    staging = out + f".staging-{os.getpid()}"
    import shutil
    shutil.rmtree(staging, ignore_errors=True)
    vs.init(cust().map_batches(base_rows, batch_format="pandas"),
            staging, key="k", num_buckets=8)
    vs.commit_changes(staging,
                      cust().map_batches(delta2, batch_format="pandas"))
    vs.commit_changes(staging,
                      cust().map_batches(delta3, batch_format="pandas"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("time_travel_counts", sql="""
WITH v1 AS (SELECT c_custkey AS k,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer),
u2 AS (SELECT k, cents + 10000 AS cents FROM v1
       WHERE k % 5 = 0 AND k % 7 <> 0),
v2 AS (SELECT k, cents FROM v1
       WHERE k % 7 <> 0 AND NOT (k % 5 = 0 AND k % 7 <> 0)
       UNION ALL SELECT k, cents FROM u2),
u3 AS (SELECT k, 555 + k AS cents FROM v1 WHERE k % 3 = 0),
v3 AS (SELECT k, cents FROM v2 WHERE k % 3 <> 0
       UNION ALL SELECT k, cents FROM u3)
SELECT * FROM (
  SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(cents) AS BIGINT) AS cents_sum FROM v1
  UNION ALL
  SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v2
  UNION ALL
  SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v3)
ORDER BY version""")
def time_travel_counts(sf_dir: str) -> pd.DataFrame:
    """Time travel over the versioned store (state/versioned_store.py):
    three committed versions read AS OF each version — one log-entry
    read resolves the exact immutable file list, no replay; the oracle
    reconstructs each version relationally from the same deterministic
    delta definitions. Integer cents so sums are exact in any order."""
    from webalizer_ray.state import versioned_store as vs

    store = _build_vstore(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [np.int64(len(df))],
            "s": [np.int64(df["cents"].sum()) if len(df) else np.int64(0)]})

    rows = []
    for v in (1, 2, 3):
        p = vs.read(store, v).map_batches(
            partial, batch_format="pandas").to_pandas()
        rows.append({"version": np.int64(v),
                     "n_rows": np.int64(p["n"].sum()),
                     "cents_sum": np.int64(p["s"].sum())})
    return pd.DataFrame(rows)


def best_sse_split(y: np.ndarray) -> tuple[int, float, float, float]:
    """Single change point by two-segment least squares: the split i
    (1-based, left segment = first i points) minimizing
    SSE(left)+SSE(right), computed in closed form from cumulative
    sums — O(T), no per-split re-scan. Cost rounded to 6 dp with
    smaller-i tiebreak so engines cannot disagree on hairline ties.
    Returns (i, cost, mean_before, mean_after)."""
    y = np.asarray(y, np.float64)
    n = len(y)
    if n < 2:
        raise ValueError("need >= 2 points")
    cs = np.cumsum(y)
    cs2 = np.cumsum(y * y)
    i = np.arange(1, n, dtype=np.float64)
    left = cs2[:-1] - cs[:-1] ** 2 / i
    right = (cs2[-1] - cs2[:-1]) - (cs[-1] - cs[:-1]) ** 2 / (n - i)
    cost = np.round(left + right, 6)
    k = int(np.argmin(cost))  # first minimum = smallest split index
    return (k + 1, float(cost[k]), float(cs[k] / (k + 1)),
            float((cs[-1] - cs[k]) / (n - k - 1)))


@register("changepoint_day", sql="""
WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY day),
ord AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i,
               COUNT(*) OVER () AS n,
               SUM(y) OVER (ORDER BY day) AS cs,
               SUM(y * y) OVER (ORDER BY day) AS cs2,
               SUM(y) OVER () AS tot, SUM(y * y) OVER () AS tot2
        FROM daily),
costs AS (SELECT day, i, ROUND((cs2 - cs * cs / i)
                 + ((tot2 - cs2) - (tot - cs) * (tot - cs) / (n - i)),
                 6) AS cost,
                 ROUND(cs / i, 4) AS mean_before,
                 ROUND((tot - cs) / (n - i), 4) AS mean_after
          FROM ord WHERE i < n)
SELECT day AS change_day, cost, mean_before, mean_after
FROM costs ORDER BY cost, i LIMIT 1""")
def changepoint_day(sf_dir: str) -> pd.DataFrame:
    """Change-point detection (two-segment least squares — the k=1
    case of binary segmentation / PELT): the level-shift monitor a
    telemetry pipeline runs on its daily volumes. Scale shape: the
    heavy work is ONE distributed daily-count reduce (the series is
    O(days) regardless of corpus size); the closed-form cumulative-sum
    scan runs on that tiny series driver-side — and is fully
    SQL-expressible, so the whole detector is oracle-backed."""
    ds = _events(sf_dir, ["ts"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    daily = reduce_sink(ds, ["date"], {"y": ("ts", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    y = daily["y"].to_numpy(np.float64)
    i, cost, mb, ma = best_sse_split(y)
    return pd.DataFrame({
        "change_day": [daily["date"].iloc[i - 1]],
        "cost": [round(cost, 6)],
        "mean_before": [round(mb, 4)],
        "mean_after": [round(ma, 4)]})


@register("ann_topk_pq", sql="""
WITH dims AS (SELECT unnest(range(1, 65)) AS i),
rawl AS MATERIALIZED (SELECT e.vec_id, d.i,
              CAST(embedding AS DOUBLE[])[d.i] AS v
       FROM embeddings e CROSS JOIN dims d),
nrm AS MATERIALIZED (SELECT vec_id, GREATEST(SQRT(SUM(v * v)), 1e-12) AS nv
       FROM rawl GROUP BY vec_id),
vn AS MATERIALIZED (SELECT l.vec_id, l.i, ROUND(l.v / n.nv, 9) AS v
      FROM rawl l JOIN nrm n USING (vec_id)),
cnt AS (SELECT LEAST(2048, COUNT(*)) AS n FROM embeddings),
samp AS MATERIALIZED (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rn
        FROM embeddings),
seeds AS (SELECT unnest(range(0, 256)) AS cw),
sv0 AS MATERIALIZED ((SELECT vec_id, i - 0 AS i, v FROM vn WHERE i BETWEEN 1 AND 4)),
s0c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv0 l ON l.vec_id = sp.vec_id),
s0a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a1 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a1)),
s0a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a2 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a2)),
s0a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a3 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a3)),
s0a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a4 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a4)),
s0a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a5 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a5)),
s0a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a6 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a6)),
s0a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a7 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a7)),
s0a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s0a8 a JOIN sv0 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s0c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s0a8)),
s0code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv0 l JOIN s0c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s0lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv0 WHERE vec_id < 3) q
  JOIN s0c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv1 AS MATERIALIZED ((SELECT vec_id, i - 4 AS i, v FROM vn WHERE i BETWEEN 5 AND 8)),
s1c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv1 l ON l.vec_id = sp.vec_id),
s1a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a1 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a1)),
s1a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a2 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a2)),
s1a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a3 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a3)),
s1a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a4 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a4)),
s1a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a5 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a5)),
s1a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a6 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a6)),
s1a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a7 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a7)),
s1a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s1a8 a JOIN sv1 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s1c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s1a8)),
s1code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv1 l JOIN s1c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s1lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv1 WHERE vec_id < 3) q
  JOIN s1c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv2 AS MATERIALIZED ((SELECT vec_id, i - 8 AS i, v FROM vn WHERE i BETWEEN 9 AND 12)),
s2c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv2 l ON l.vec_id = sp.vec_id),
s2a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a1 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a1)),
s2a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a2 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a2)),
s2a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a3 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a3)),
s2a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a4 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a4)),
s2a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a5 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a5)),
s2a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a6 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a6)),
s2a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a7 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a7)),
s2a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s2a8 a JOIN sv2 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s2c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s2a8)),
s2code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv2 l JOIN s2c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s2lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv2 WHERE vec_id < 3) q
  JOIN s2c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv3 AS MATERIALIZED ((SELECT vec_id, i - 12 AS i, v FROM vn WHERE i BETWEEN 13 AND 16)),
s3c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv3 l ON l.vec_id = sp.vec_id),
s3a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a1 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a1)),
s3a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a2 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a2)),
s3a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a3 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a3)),
s3a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a4 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a4)),
s3a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a5 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a5)),
s3a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a6 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a6)),
s3a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a7 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a7)),
s3a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s3a8 a JOIN sv3 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s3c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s3a8)),
s3code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv3 l JOIN s3c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s3lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv3 WHERE vec_id < 3) q
  JOIN s3c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv4 AS MATERIALIZED ((SELECT vec_id, i - 16 AS i, v FROM vn WHERE i BETWEEN 17 AND 20)),
s4c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv4 l ON l.vec_id = sp.vec_id),
s4a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a1 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a1)),
s4a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a2 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a2)),
s4a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a3 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a3)),
s4a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a4 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a4)),
s4a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a5 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a5)),
s4a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a6 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a6)),
s4a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a7 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a7)),
s4a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s4a8 a JOIN sv4 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s4c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s4a8)),
s4code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv4 l JOIN s4c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s4lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv4 WHERE vec_id < 3) q
  JOIN s4c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv5 AS MATERIALIZED ((SELECT vec_id, i - 20 AS i, v FROM vn WHERE i BETWEEN 21 AND 24)),
s5c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv5 l ON l.vec_id = sp.vec_id),
s5a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a1 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a1)),
s5a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a2 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a2)),
s5a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a3 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a3)),
s5a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a4 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a4)),
s5a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a5 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a5)),
s5a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a6 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a6)),
s5a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a7 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a7)),
s5a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s5a8 a JOIN sv5 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s5c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s5a8)),
s5code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv5 l JOIN s5c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s5lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv5 WHERE vec_id < 3) q
  JOIN s5c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv6 AS MATERIALIZED ((SELECT vec_id, i - 24 AS i, v FROM vn WHERE i BETWEEN 25 AND 28)),
s6c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv6 l ON l.vec_id = sp.vec_id),
s6a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a1 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a1)),
s6a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a2 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a2)),
s6a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a3 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a3)),
s6a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a4 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a4)),
s6a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a5 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a5)),
s6a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a6 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a6)),
s6a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a7 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a7)),
s6a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s6a8 a JOIN sv6 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s6c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s6a8)),
s6code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv6 l JOIN s6c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s6lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv6 WHERE vec_id < 3) q
  JOIN s6c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv7 AS MATERIALIZED ((SELECT vec_id, i - 28 AS i, v FROM vn WHERE i BETWEEN 29 AND 32)),
s7c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv7 l ON l.vec_id = sp.vec_id),
s7a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a1 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a1)),
s7a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a2 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a2)),
s7a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a3 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a3)),
s7a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a4 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a4)),
s7a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a5 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a5)),
s7a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a6 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a6)),
s7a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a7 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a7)),
s7a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s7a8 a JOIN sv7 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s7c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s7a8)),
s7code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv7 l JOIN s7c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s7lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv7 WHERE vec_id < 3) q
  JOIN s7c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv8 AS MATERIALIZED ((SELECT vec_id, i - 32 AS i, v FROM vn WHERE i BETWEEN 33 AND 36)),
s8c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv8 l ON l.vec_id = sp.vec_id),
s8a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a1 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a1)),
s8a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a2 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a2)),
s8a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a3 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a3)),
s8a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a4 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a4)),
s8a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a5 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a5)),
s8a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a6 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a6)),
s8a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a7 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a7)),
s8a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s8a8 a JOIN sv8 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s8c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s8a8)),
s8code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv8 l JOIN s8c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s8lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv8 WHERE vec_id < 3) q
  JOIN s8c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv9 AS MATERIALIZED ((SELECT vec_id, i - 36 AS i, v FROM vn WHERE i BETWEEN 37 AND 40)),
s9c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv9 l ON l.vec_id = sp.vec_id),
s9a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a1 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a1)),
s9a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a2 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a2)),
s9a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a3 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a3)),
s9a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a4 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a4)),
s9a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a5 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a5)),
s9a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a6 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a6)),
s9a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a7 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a7)),
s9a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s9a8 a JOIN sv9 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s9c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s9a8)),
s9code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv9 l JOIN s9c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s9lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv9 WHERE vec_id < 3) q
  JOIN s9c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv10 AS MATERIALIZED ((SELECT vec_id, i - 40 AS i, v FROM vn WHERE i BETWEEN 41 AND 44)),
s10c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv10 l ON l.vec_id = sp.vec_id),
s10a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a1 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a1)),
s10a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a2 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a2)),
s10a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a3 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a3)),
s10a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a4 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a4)),
s10a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a5 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a5)),
s10a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a6 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a6)),
s10a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a7 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a7)),
s10a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s10a8 a JOIN sv10 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s10c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s10a8)),
s10code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv10 l JOIN s10c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s10lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv10 WHERE vec_id < 3) q
  JOIN s10c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv11 AS MATERIALIZED ((SELECT vec_id, i - 44 AS i, v FROM vn WHERE i BETWEEN 45 AND 48)),
s11c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv11 l ON l.vec_id = sp.vec_id),
s11a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a1 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a1)),
s11a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a2 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a2)),
s11a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a3 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a3)),
s11a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a4 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a4)),
s11a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a5 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a5)),
s11a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a6 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a6)),
s11a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a7 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a7)),
s11a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s11a8 a JOIN sv11 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s11c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s11a8)),
s11code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv11 l JOIN s11c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s11lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv11 WHERE vec_id < 3) q
  JOIN s11c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv12 AS MATERIALIZED ((SELECT vec_id, i - 48 AS i, v FROM vn WHERE i BETWEEN 49 AND 52)),
s12c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv12 l ON l.vec_id = sp.vec_id),
s12a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a1 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a1)),
s12a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a2 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a2)),
s12a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a3 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a3)),
s12a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a4 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a4)),
s12a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a5 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a5)),
s12a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a6 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a6)),
s12a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a7 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a7)),
s12a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s12a8 a JOIN sv12 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s12c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s12a8)),
s12code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv12 l JOIN s12c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s12lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv12 WHERE vec_id < 3) q
  JOIN s12c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv13 AS MATERIALIZED ((SELECT vec_id, i - 52 AS i, v FROM vn WHERE i BETWEEN 53 AND 56)),
s13c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv13 l ON l.vec_id = sp.vec_id),
s13a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a1 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a1)),
s13a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a2 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a2)),
s13a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a3 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a3)),
s13a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a4 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a4)),
s13a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a5 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a5)),
s13a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a6 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a6)),
s13a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a7 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a7)),
s13a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s13a8 a JOIN sv13 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s13c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s13a8)),
s13code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv13 l JOIN s13c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s13lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv13 WHERE vec_id < 3) q
  JOIN s13c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv14 AS MATERIALIZED ((SELECT vec_id, i - 56 AS i, v FROM vn WHERE i BETWEEN 57 AND 60)),
s14c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv14 l ON l.vec_id = sp.vec_id),
s14a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a1 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a1)),
s14a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a2 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a2)),
s14a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a3 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a3)),
s14a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a4 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a4)),
s14a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a5 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a5)),
s14a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a6 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a6)),
s14a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a7 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a7)),
s14a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s14a8 a JOIN sv14 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s14c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s14a8)),
s14code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv14 l JOIN s14c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s14lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv14 WHERE vec_id < 3) q
  JOIN s14c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
sv15 AS MATERIALIZED ((SELECT vec_id, i - 60 AS i, v FROM vn WHERE i BETWEEN 61 AND 64)),
s15c0 AS MATERIALIZED (
  SELECT s.cw, l.i, l.v FROM seeds s
  JOIN samp sp ON sp.rn = (s.cw * (SELECT n FROM cnt)) // 256
  JOIN sv15 l ON l.vec_id = sp.vec_id),
s15a1 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c0 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c1 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a1 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c0 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a1)),
s15a2 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c1 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c2 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a2 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c1 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a2)),
s15a3 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c2 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c3 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a3 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c2 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a3)),
s15a4 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c3 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c4 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a4 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c3 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a4)),
s15a5 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c4 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c5 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a5 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c4 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a5)),
s15a6 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c5 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c6 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a6 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c5 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a6)),
s15a7 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c6 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c7 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a7 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c6 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a7)),
s15a8 AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c7 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15c8 AS MATERIALIZED (
  SELECT u.cw, u.i, ROUND(u.v, 9) AS v FROM (
    SELECT a.cw, l.i, AVG(l.v) AS v
    FROM s15a8 a JOIN sv15 l USING (vec_id) GROUP BY a.cw, l.i) u
  UNION ALL
  SELECT c.cw, c.i, c.v FROM s15c7 c
  WHERE c.cw NOT IN (SELECT DISTINCT cw FROM s15a8)),
s15code AS MATERIALIZED (
  SELECT vec_id, cw FROM (
    SELECT l.vec_id, c.cw,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
               ORDER BY ROUND(SUM(POWER(l.v - c.v, 2)), 9), c.cw) AS rnk
    FROM sv15 l JOIN s15c8 c ON c.i = l.i
    GROUP BY l.vec_id, c.cw) WHERE rnk = 1),
s15lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cw, ROUND(SUM(q.v * c.v), 9) AS dot
  FROM (SELECT vec_id, i, v FROM sv15 WHERE vec_id < 3) q
  JOIN s15c8 c ON c.i = q.i
  GROUP BY q.vec_id, c.cw),
simparts AS MATERIALIZED (
SELECT d.vec_id, l.query_id, l.dot FROM s0code d JOIN s0lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s1code d JOIN s1lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s2code d JOIN s2lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s3code d JOIN s3lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s4code d JOIN s4lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s5code d JOIN s5lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s6code d JOIN s6lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s7code d JOIN s7lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s8code d JOIN s8lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s9code d JOIN s9lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s10code d JOIN s10lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s11code d JOIN s11lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s12code d JOIN s12lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s13code d JOIN s13lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s14code d JOIN s14lut l ON l.cw = d.cw
UNION ALL
SELECT d.vec_id, l.query_id, l.dot FROM s15code d JOIN s15lut l ON l.cw = d.cw),
sims AS (SELECT query_id, vec_id, ROUND(SUM(dot), 9) AS cosine
         FROM simparts GROUP BY query_id, vec_id),
ranked AS (SELECT query_id, vec_id, cosine,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, vec_id) AS rank
           FROM sims)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 5""")
def ann_topk_pq(sf_dir: str) -> pd.DataFrame:
    """PQ/ADC cosine top-k (Jégou et al. TPAMI'11): vectors stored as
    16 uint8 codes (16x smaller than float32 — the scan/shuffle tier
    below SQ8's 4x); each query builds ONE (m, ks) partial-dot lookup
    table and every data vector costs m table lookups. Oracle (r3):
    quant._kmeans_np now follows the deterministic discipline (strided
    seeding, 9 dp rounding of distances/centroids/LUT partial dots),
    so SQL replays all 16 per-subspace codebook trainings, the
    encoding argmins, and the ADC lookup sums bit-for-bit — the
    QUANTIZED result, approximation error included. pytest pins
    recall >= 0.6 vs the exact path at these params (0.87 measured
    pre-determinism; re-measured in test)."""
    from webalizer_ray.stages import quant

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cb = quant.pq_train(ds, m=16, ks=256)
    out = quant.pq_topk(quant.pq_encode(ds, cb), cb, queries, k=5)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]] \
        .sort_values(["query_id", "rank"], ignore_index=True)


@register("forget_user_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       COUNT(DISTINCT user_id) AS users
FROM events WHERE user_id % 13 <> 0
GROUP BY event_type""")
def forget_user_counts(sf_dir: str) -> pd.DataFrame:
    """Right-to-be-forgotten (state/forget.py:scrub_parquet_dir): a
    COPY of the events table is physically scrubbed of every user with
    user_id %% 13 == 0 (key list derived from footer-only max — the
    GDPR request list stand-in), then aggregated from the scrubbed
    FILES — proving erasure happened in the bytes, not in a filter.
    Files without hits are skipped untouched (mtime-tested)."""
    import shutil

    from webalizer_ray.sources.readers import footer_aggregate
    from webalizer_ray.state.forget import scrub_parquet_dir

    work = tempfile.mkdtemp(prefix="wr_forget_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet",
                    os.path.join(work, "events.parquet"))
        umax = int(footer_aggregate(work, ["user_id"])["user_id_max"][0])
        keys = np.arange(0, umax + 1, 13, dtype=np.int64)
        scrub_parquet_dir(work, "user_id", keys)
        ds = rd.read_parquet(work, columns=["event_type", "user_id"])
        agg = reduce_sink(ds, ["event_type"],
                          {"hits": ("user_id", "size")}).to_pandas()
        users = distinct_count(ds, ["event_type"], "user_id",
                               "users").to_pandas()
        out = agg.merge(users, on="event_type")
        out["hits"] = out["hits"].astype(np.int64)
        out["users"] = out["users"].astype(np.int64)
        return out.sort_values("event_type", ignore_index=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
