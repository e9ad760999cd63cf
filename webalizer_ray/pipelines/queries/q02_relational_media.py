"""Driver-contract queries (chunk 2/17).
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


@register("incremental_fuzzy_dedup_counts", sql=None)  # MinHash — not SQL
def incremental_fuzzy_dedup_counts(sf_dir: str) -> pd.DataFrame:
    """Cross-run FUZZY dedup (near-dup corpus refresh). Rows-only:
    candidates come from SipHash'd MinHash band collisions (not
    SQL-replicable); test_incremental_fuzzy pins planted-dup drops,
    idempotent same-run reruns, and exact-refeed knockout. Run A feeds
    the first 60% of the corpus; run B feeds the rest plus 15 planted
    light edits of run-A docs. The band/signature stores persist
    between runs (idempotent run-tagged files — a rerun of the same
    round converges to identical bytes), candidates come from LSH band
    collisions against PRIOR runs only, and the verify is a
    distributed signature merge. The planted near-dups must be exactly
    the drops."""
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


@register("dup_cluster_sizes", sql=None)  # composition over LSH clusters
def dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Duplicate-cluster size histogram (the dedup report's headline
    table): connected components over the MinHash candidate graph,
    folded to (cluster_size, n_clusters). Pure composition of
    oracle/pytest-covered pieces; only (node, label) rows then the
    tiny histogram shuffle."""
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


# --- TPC-H join-breadth family: Q5 / Q10 / Q18 shapes ---------------------
# Float discipline: revenue = l_extendedprice * (1 - l_discount) is a
# ≤4-dp decimal; CAST(ROUND(rev * 10000) AS BIGINT) makes every revenue
# an exact int64 so group sums cannot depend on summation order.

@register("tpch_q5_region_revenue", sql="""
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_dm,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""")
def tpch_q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (6-table local-supplier volume): the date
    predicate is pushed into the orders scan; customer rides a
    distributed/auto join; the big lineitem side joins on orderkey;
    supplier and the ASIA nation/region dims are tiny and broadcast
    once (ray.put dicts in a map-side filter implementing the
    c_nationkey = s_nationkey correlation) — the fact table never
    shuffles for the dimension predicates."""
    import datetime as _dt

    import pyarrow.dataset as pds

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = nat.merge(reg[reg["r_name"] == "ASIA"],
                     left_on="n_regionkey", right_on="r_regionkey")
    nk2name = dict(zip(asia["n_nationkey"].astype(int),
                       asia["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk2nk_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_nationkey"].astype(int))))
    nk2name_ref = ray.put(nk2name)

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1997, 1, 1))))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    ordc = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(rev_dm, batch_format="pandas")
    joined = auto_join(items, ordc, on="l_orderkey",
                       right_on="o_orderkey")

    def local_filter(df: pd.DataFrame) -> pd.DataFrame:
        sk2nk = ray.get(sk2nk_ref)
        nknm = ray.get(nk2name_ref)
        snk = df["l_suppkey"].map(sk2nk)
        keep = snk.eq(df["c_nationkey"]) & snk.isin(nknm.keys())
        df = df[keep]
        return pd.DataFrame({
            "n_name": df["l_suppkey"].map(sk2nk).map(nknm),
            "rev_dm": df["rev_dm"].to_numpy(np.int64)})

    out = reduce_sink(joined.map_batches(local_filter,
                                         batch_format="pandas"),
                      ["n_name"], {"revenue_dm": ("rev_dm", "sum"),
                                   "n_items": ("rev_dm", "size")}) \
        .to_pandas()
    if "n_name" not in out.columns:
        # Ray drops the schema of all-empty block sets on
        # to_pandas(); zero qualifying flows is a legal tiny-scale
        # answer
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype=object),
             "revenue_dm": pd.Series([], dtype=np.int64),
             "n_items": pd.Series([], dtype=np.int64)})
    out["revenue_dm"] = out["revenue_dm"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("n_name", ignore_index=True)


@register("tpch_q10_returned_revenue", sql="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT)) AS BIGINT) AS revenue_dm
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_dm DESC, c.c_custkey LIMIT 20""")
def tpch_q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item revenue, top 20 customers):
    returnflag pushed into the lineitem scan and the date window into
    orders; revenue pre-reduces PER CUSTKEY before the customer
    dimension is consulted, so the top-N works on |customers| rows and
    the name/nation attributes join only onto the 20 winners (driver-
    side merge of a broadcast-scale dim). Integer revenue makes the
    DESC/custkey tiebreak engine-stable."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1996, 7, 1))))

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R") \
        .map_batches(rev_dm, batch_format="pandas")
    joined = auto_join(items, orders, on="l_orderkey",
                       right_on="o_orderkey")
    per_cust = reduce_sink(joined, ["o_custkey"],
                           {"revenue_dm": ("rev_dm", "sum")}).to_pandas()
    per_cust["revenue_dm"] = per_cust["revenue_dm"].astype(np.int64)
    top = per_cust.sort_values(["revenue_dm", "o_custkey"],
                               ascending=[False, True],
                               kind="mergesort").head(20)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out = out.sort_values(["revenue_dm", "c_custkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["c_custkey", "c_name", "n_name", "revenue_dm"]] \
        .reset_index(drop=True)


@register("tpch_q18_large_orders", sql="""
WITH big AS (SELECT l_orderkey,
                    CAST(SUM(l_quantity) AS BIGINT) AS qty
             FROM lineitem GROUP BY l_orderkey
             HAVING SUM(l_quantity) > 300)
SELECT c.c_custkey, b.l_orderkey AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       b.qty
FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_cents DESC, o_orderkey LIMIT 100""")
def tpch_q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume orders — HAVING over a grouped
    fact): per-order quantity sums reduce distributedly (only
    (orderkey, qty) partials shuffle), the HAVING filter shrinks the
    set to the rare giants, and ONLY those survivors join back to
    orders/customer (broadcast-scale after the filter). Quantities and
    cents are integers — exact under any order."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qty_int(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy(np.float64))
            .astype(np.int64)})

    per_order = reduce_sink(li.map_batches(qty_int,
                                           batch_format="pandas"),
                            ["l_orderkey"], {"qty": ("qty", "sum")})
    # vectorized HAVING — a row-lambda filter here costs a Python call
    # per order (measured 26 s → 4 s at sf0.1)
    big = per_order.map_batches(lambda df: df[df["qty"] > 300],
                                batch_format="pandas")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])
    joined = auto_join(orders, big, on="o_orderkey",
                       right_on="l_orderkey").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    out = joined.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["total_cents"] = np.rint(
        out["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
    out["orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    out["qty"] = out["qty"].astype(np.int64)
    out = out.sort_values(["total_cents", "o_orderkey"],
                          ascending=[False, True],
                          kind="mergesort").head(100)
    return out[["c_custkey", "o_orderkey", "orderdate", "total_cents",
                "qty"]].reset_index(drop=True)


@register("peak_concurrent_sessions", sql=f"""
WITH sid AS (SELECT user_id, event_type, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
s AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
      FROM sid GROUP BY user_id, sid),
b AS (SELECT st AS ts, 1 AS pos, 0 AS neg FROM s
      UNION ALL SELECT en, 0, 1 FROM s),
g AS (SELECT ts, SUM(pos) AS pos, SUM(neg) AS neg FROM b GROUP BY ts),
c AS (SELECT ts,
             SUM(pos - neg) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
               - (pos - neg) + pos AS conc
      FROM g)
SELECT CAST(conc AS BIGINT) AS peak,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS peak_ts
FROM c ORDER BY conc DESC, ts LIMIT 1""")
def peak_concurrent_sessions(sf_dir: str) -> pd.DataFrame:
    """Peak concurrency (the classic +1/-1 interval sweep — 'how many
    sessions were live at once, and when first'): sessions reduce to
    intervals inside the user-hash bucket, intervals flat-map to
    per-timestamp (starts, ends) partials, and the global running sum
    rides the TWO-LEVEL range prefix scan (stages/scan.py — bucket
    totals, driver offsets over O(buckets) rows, per-bucket cumsum) so
    no single task ever sees the whole boundary stream. Tie rule:
    starts apply before ends at an equal timestamp (touching sessions
    count as concurrent) — candidate peak at t = exclusive-cumsum +
    starts(t), identical expression in the oracle."""
    sess = _sessionized_events(sf_dir)
    iv = reduce_sink(sess, ["user_id", "sid"],
                     {"st": ("ts", "min"), "en": ("ts", "max")})

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        st = df["st"].to_numpy("datetime64[us]").astype(np.int64)
        en = df["en"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "ts_us": np.concatenate([st, en]),
            "pos": np.concatenate([np.ones(len(st), np.int64),
                                   np.zeros(len(en), np.int64)]),
            "neg": np.concatenate([np.zeros(len(st), np.int64),
                                   np.ones(len(en), np.int64)])})
        return out.groupby("ts_us", as_index=False).sum()

    per_ts = reduce_sink(iv.map_batches(boundaries,
                                        batch_format="pandas"),
                         ["ts_us"], {"pos": ("pos", "sum"),
                                     "neg": ("neg", "sum")})

    def add_net(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["net"] = df["pos"] - df["neg"]
        return df

    day_us = 86_400_000_000
    cum = scan.range_prefix_sum(
        per_ts.map_batches(add_net, batch_format="pandas"),
        key_col="ts_us", val_col="net", out_col="cum_excl",
        bucket_width=day_us)

    def local_peak(df: pd.DataFrame) -> pd.DataFrame:
        cand = df["cum_excl"].to_numpy(np.int64) \
            + df["pos"].to_numpy(np.int64)
        i = int(np.lexsort((df["ts_us"].to_numpy(), -cand))[0])
        return pd.DataFrame({"peak": [np.int64(cand[i])],
                             "ts_us": [np.int64(df["ts_us"].iloc[i])]})

    p = cum.map_batches(local_peak, batch_format="pandas").to_pandas()
    p = p.sort_values(["peak", "ts_us"], ascending=[False, True],
                      kind="mergesort").head(1)
    ts = pd.Timestamp(int(p["ts_us"].iloc[0]), unit="us")
    return pd.DataFrame({
        "peak": [np.int64(p["peak"].iloc[0])],
        "peak_ts": [ts.strftime("%Y-%m-%d %H:%M:%S.%f")]})


@register("attribution_by_hour", sql="""
WITH v AS (SELECT user_id, ts AS vts, event_id AS vid FROM events
           WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'),
pairs AS (SELECT pid, vts, vid,
                 COUNT(*) OVER (PARTITION BY pid) AS n,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts, vid) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY vts DESC, vid DESC) AS rl
          FROM p JOIN v ON p.user_id = v.user_id
               AND v.vts <= p.pts
               AND v.vts > p.pts - INTERVAL 1 HOUR)
SELECT CAST(hour(vts) AS BIGINT) AS hour,
       CAST(SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch,
       ROUND(SUM(1.0 / n), 4) AS linear_credit
FROM pairs GROUP BY hour""")
def attribution_by_hour(sf_dir: str) -> pd.DataFrame:
    """Multi-touch attribution (first-touch / last-touch / linear —
    the three standard marketing credit models) over the 1-hour
    pre-purchase window, credited to the touch's hour of day. Both
    event streams co-locate in the user-hash bucket; ONE composite-key
    searchsorted per bucket finds every purchase's view window (no
    join explosion — expansion is bounded by views-per-hour), ties at
    equal timestamps broken by view event_id so engines agree; only
    (hour, credit) partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("purchase", "view"))].copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return df

    hour_us = np.int64(3_600_000_000)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"hour": pd.Series([], dtype=np.int64),
                             "ft": pd.Series([], dtype=np.int64),
                             "lt": pd.Series([], dtype=np.int64),
                             "lin": pd.Series([], dtype=np.float64)})

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        is_v = (g["event_type"] == "view").to_numpy()
        if not is_v.any() or is_v.all():
            return _empty()
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        is_v = (g["event_type"] == "view").to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        # composite int64 key (user_rank * span + relative_ts): ONE
        # sorted view-key array answers every purchase window — same
        # overflow-guarded construction as view_purchase_1h_conversion
        base = us - us.min()
        span = np.int64(base.max()) + np.int64(hour_us) + 2
        uranks = np.searchsorted(np.unique(uid), uid).astype(np.int64)
        if int(uranks.max(initial=0) + 1) > (2 ** 63 - 1) // int(span):
            raise ValueError("composite key overflow: raise num_buckets")
        key = uranks * span + base
        vkey = key[is_v]          # nondecreasing (g sorted); ties keep
        vh = g["ts"].dt.hour.to_numpy(np.int64)[is_v]  # event_id order
        pkey = key[~is_v]
        lo = np.searchsorted(vkey, pkey - hour_us, side="right")
        hi = np.searchsorted(vkey, pkey, side="right")
        n = hi - lo
        has = n > 0
        if not has.any():
            return _empty()
        reps = n[has]
        # window expansion without a Python loop (repeat/arange trick);
        # bounded: a window holds at most one user's views of one hour
        offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
        flat = np.repeat(lo[has], reps) \
            + (np.arange(reps.sum()) - np.repeat(offs, reps))
        cat = pd.concat([
            pd.DataFrame({"hour": vh[lo[has]], "ft": np.int64(1),
                          "lt": np.int64(0), "lin": 0.0}),
            pd.DataFrame({"hour": vh[hi[has] - 1], "ft": np.int64(0),
                          "lt": np.int64(1), "lin": 0.0}),
            pd.DataFrame({"hour": vh[flat], "ft": np.int64(0),
                          "lt": np.int64(0),
                          "lin": np.repeat(1.0 / reps, reps)}),
        ], ignore_index=True)
        part = cat.groupby("hour", as_index=False).sum()
        part["ft"] = part["ft"].astype(np.int64)
        part["lt"] = part["lt"].astype(np.int64)
        return part

    parts = (ds.map_batches(keep_bucket, batch_format="pandas")
             .groupby("bucket_").map_groups(credit,
                                            batch_format="pandas"))
    out = reduce_sink(parts, ["hour"],
                      {"first_touch": ("ft", "sum"),
                       "last_touch": ("lt", "sum"),
                       "linear_credit": ("lin", "sum")}).to_pandas()
    out["first_touch"] = out["first_touch"].astype(np.int64)
    out["last_touch"] = out["last_touch"].astype(np.int64)
    out["linear_credit"] = out["linear_credit"].round(4)
    return out.sort_values("hour", ignore_index=True)


def _classifier_feats(sf_dir: str) -> rd.Dataset:
    from webalizer_ray.stages.classifier import doc_feature_frame

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        f = doc_feature_frame(df)
        q = textstats.add_quality_score(df)
        f["y"] = (q["quality_score"].to_numpy(np.float64)
                  >= 0.5).astype(np.float64)
        f["doc_id"] = df["doc_id"].to_numpy(np.int64)
        return f

    return docs.map_batches(featurize, batch_format="pandas")


@register("classifier_kfold_metrics", sql=None)  # iterative — not SQL
def classifier_kfold_metrics(sf_dir: str) -> pd.DataFrame:
    """Out-of-fold evaluation of the quality classifier: deterministic
    hash folds, per-fold IRLS training on the other k-1 folds, scalar
    accuracy/Brier partials — the no-leakage eval a model-based filter
    needs before its threshold is trusted. Rows-only (iterative);
    pytest proves fold partition, determinism and near-perfect CV
    accuracy on a separable planted set."""
    from webalizer_ray.stages.classifier import kfold_eval

    return kfold_eval(_classifier_feats(sf_dir), k=5, n_iter=10)


@register("classifier_calibration", sql=None)  # model scores — not SQL
def classifier_calibration(sf_dir: str) -> pd.DataFrame:
    """Reliability table + ECE terms for the quality classifier's
    scores: fixed-width score bins, (bin, n, sums) partials only.
    Rows-only; pytest pins the closed form on a hand-computable set
    and conservation of n across bins."""
    from webalizer_ray.stages.classifier import (
        FEATURE_COLS, _sigmoid, calibration_table, train_logreg)

    feats = _classifier_feats(sf_dir).materialize()
    w = train_logreg(feats, n_iter=10)

    def add_score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = _sigmoid(df[FEATURE_COLS].to_numpy(np.float64) @ w)
        return df

    return calibration_table(
        feats.map_batches(add_score, batch_format="pandas"))


@register("incremental_view_counts", sql="""
WITH v1 AS (SELECT c_custkey AS k, c_custkey % 10 AS grp,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer),
u2 AS (SELECT k, grp, cents + 10000 AS cents FROM v1
       WHERE k % 5 = 0 AND k % 7 <> 0),
v2 AS (SELECT k, grp, cents FROM v1
       WHERE k % 7 <> 0 AND NOT (k % 5 = 0 AND k % 7 <> 0)
       UNION ALL SELECT k, grp, cents FROM u2),
u3 AS (SELECT k, grp, 555 + k AS cents FROM v1 WHERE k % 3 = 0),
v3 AS (SELECT k, grp, cents FROM v2 WHERE k % 3 <> 0
       UNION ALL SELECT k, grp, cents FROM u3)
SELECT CAST(grp AS BIGINT) AS grp, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS s
FROM v3 GROUP BY grp""")
def incremental_view_counts(sf_dir: str) -> pd.DataFrame:
    """Incrementally-maintained materialized view
    (state/incremental_view.py): the per-group SUM/COUNT aggregate of
    the versioned store stays exact across commits by folding ONLY the
    touched buckets' old/new file partials (view(V) = view(V-1) − old
    + new) — untouched buckets contribute byte-identically because
    their files carry over by name. Oracle checks the view at the
    latest version; pytest proves incremental == full recompute and
    that untouched files are never read."""
    import shutil

    from webalizer_ray.state.incremental_view import read_view, refresh

    store = _build_vstore(sf_dir)
    view_dir = tempfile.mkdtemp(prefix="wr_iview_")
    try:
        refresh(store, view_dir, group_col="grp", val_col="cents")
        out = read_view(view_dir)
        out = out.rename(columns={"grp": "grp"})
        out["grp"] = out["grp"].astype(np.int64)
        return out.sort_values("grp", ignore_index=True)
    finally:
        shutil.rmtree(view_dir, ignore_errors=True)


@register("cumulative_users_by_day", sql="""
WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
           FROM events GROUP BY user_id),
d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY day)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d""")
def cumulative_users_by_day(sf_dir: str) -> pd.DataFrame:
    """Running distinct-user count (cumulative NDV — the 'total users
    ever seen' growth curve window frames cannot express as COUNT
    (DISTINCT) OVER): distinct collapses to each user's FIRST-SEEN day
    (one keyed min-reduce — only (user, day) partials shuffle), daily
    new-user counts follow, and the cumsum runs over the O(days)
    series on the driver."""
    ds = _events(sf_dir, ["ts", "user_id"]) \
        .map_batches(_with_time_cols({"date"}), batch_format="pyarrow")
    first = reduce_sink(ds, ["user_id"], {"day": ("date", "min")})
    daily = reduce_sink(first, ["day"],
                        {"new_users": ("user_id", "size")}).to_pandas() \
        .sort_values("day", ignore_index=True)
    daily["new_users"] = daily["new_users"].astype(np.int64)
    daily["cum_users"] = daily["new_users"].cumsum().astype(np.int64)
    return daily.rename(columns={"day": "day"})[
        ["day", "new_users", "cum_users"]]


_ZONEMAP_VERSION = 1


def _zonemap_dir(sf_dir: str) -> str:
    """ts-sorted 8-file re-layout of events + its zone map (the layout
    that makes time-range file pruning effective); built once per
    (user, corpus, version), atomic staging+rename."""
    import hashlib
    import shutil

    from webalizer_ray.stages.zonemap import build_zonemap

    ev = f"{sf_dir}/events.parquet"
    st = os.stat(ev)
    tag = hashlib.sha1(
        f"{os.path.abspath(ev)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_ZONEMAP_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    out = os.path.join(tempfile.gettempdir(), f"wr_zm_u{uid}_{tag}")
    if os.path.exists(os.path.join(out, "_zonemap.parquet")):
        return out
    staging = out + f".staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(os.path.join(staging, "data"))
    df = pq.read_table(ev).to_pandas() \
        .sort_values(["ts", "event_id"], ignore_index=True)
    for i, part in enumerate(np.array_split(df, 8)):
        part.to_parquet(os.path.join(staging, "data",
                                     f"f{i}.parquet"), index=False)
    build_zonemap(os.path.join(staging, "data"), ["ts", "value"],
                  os.path.join(staging, "_zonemap.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("zonemap_pruned_daily_hits", sql="""
SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS hits
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-16'
GROUP BY day""")
def zonemap_pruned_daily_hits(sf_dir: str) -> pd.DataFrame:
    """Range scan through the PERSISTED zone-map skipping index
    (stages/zonemap.py): file-level min/max rows built once from
    footers; the query reads the tiny index, skips every file whose
    interval misses the week, and pushes the same predicate into the
    surviving scans. Unknown files are never pruned; vanished mapped
    files raise. Pytest proves pruning by deleting the pruned files."""
    import datetime as _dt

    from webalizer_ray.stages.zonemap import pruned_scan

    d = _zonemap_dir(sf_dir)
    ds = pruned_scan(os.path.join(d, "data"),
                     os.path.join(d, "_zonemap.parquet"), "ts",
                     _dt.datetime(2024, 1, 10), _dt.datetime(2024, 1, 16),
                     columns=["ts"])
    out = reduce_sink(
        ds.map_batches(_with_time_cols({"date"}), batch_format="pyarrow"),
        ["date"], {"hits": ("ts", "size")}).to_pandas()
    out["hits"] = out["hits"].astype(np.int64)
    return out.rename(columns={"date": "day"}) \
        .sort_values("day", ignore_index=True)


@register("html_stripped_docs", sql=r"""
WITH aug AS (
  SELECT doc_id,
         '<html><head><script type="text/javascript">var x = 1 < 2;'
         || '</script><style>p { color: red; }</style></head><body><h1>'
         || 'Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
         || text || ' &amp; tail &lt;x&gt;</p><!-- trailing comment -->'
         || '</body></html>' AS t
  FROM documents),
clean AS (
  SELECT doc_id,
         trim(regexp_replace(
           replace(replace(replace(replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               t,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
           '\s+', ' ', 'g')) AS clean_text
  FROM aug)
SELECT doc_id, clean_text, CAST(len(clean_text) AS BIGINT) AS clean_len
FROM clean""")
def html_stripped_docs(sf_dir: str) -> pd.DataFrame:
    """HTML boilerplate extraction (the main-content step of a web
    corpus): documents wrapped in deterministic doc_id-derived HTML
    (script/style blocks, tags, comments, entities), then stripped by
    the IDENTICAL RE2 chain on both sides — byte-identical clean_text
    is the check, not just lengths (stages/textstats.py:strip_html)."""
    def augment(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = (
            '<html><head><script type="text/javascript">var x = 1 < 2;'
            "</script><style>p { color: red; }</style></head><body><h1>"
            "Doc " + df["doc_id"].astype(str) + "</h1><p>"
            + df["text"].fillna("")
            + " &amp; tail &lt;x&gt;</p><!-- trailing comment -->"
            "</body></html>")
        return df

    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(augment, batch_format="pandas") \
        .map_batches(textstats.strip_html, batch_format="pyarrow") \
        .to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["clean_len"] = out["clean_len"].astype(np.int64)
    return out[["doc_id", "clean_text", "clean_len"]] \
        .sort_values("doc_id", ignore_index=True)


_BLOOMIDX_VERSION = 1


def _bloomidx_dir(sf_dir: str) -> str:
    """user-hash-bucketed 8-file re-layout of events + a per-file
    Bloom index on user_id (point lookups prune to ~1 file); built
    once per (user, corpus, version), atomic staging+rename."""
    import hashlib
    import shutil

    from webalizer_ray.stages.zonemap import build_bloom_index

    ev = f"{sf_dir}/events.parquet"
    st = os.stat(ev)
    tag = hashlib.sha1(
        f"{os.path.abspath(ev)}|{st.st_size}|{st.st_mtime_ns}|"
        f"v{_BLOOMIDX_VERSION}".encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    out = os.path.join(tempfile.gettempdir(), f"wr_bloomidx_u{uid}_{tag}")
    if os.path.exists(os.path.join(out, "_bloom.parquet")):
        return out
    staging = out + f".staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(os.path.join(staging, "data"))
    df = pq.read_table(ev).to_pandas()
    for b in range(8):
        df[df["user_id"] % 8 == b].to_parquet(
            os.path.join(staging, "data", f"b{b}.parquet"), index=False)
    build_bloom_index(os.path.join(staging, "data"), "user_id",
                      os.path.join(staging, "_bloom.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(staging, out)
    return out


@register("bloom_point_user_stats", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       COUNT(DISTINCT event_type) AS types
FROM events WHERE user_id = 7""")
def bloom_point_user_stats(sf_dir: str) -> pd.DataFrame:
    """Point lookup through the PERSISTED per-file Bloom index
    (stages/zonemap.py:bloom_point_scan) over a user-bucketed layout:
    the tiny filter table routes the lookup to the files that might
    hold the key (no false negatives; the pushed equality predicate
    makes false positives wasted reads, never wrong rows). Pytest
    proves pruning by deleting the non-candidate files."""
    from webalizer_ray.stages.zonemap import bloom_point_scan

    d = _bloomidx_dir(sf_dir)
    ds = bloom_point_scan(os.path.join(d, "data"),
                          os.path.join(d, "_bloom.parquet"),
                          "user_id", np.int64(7),
                          columns=["user_id", "value", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hits": [np.int64(len(df))],
            "value_cents": [np.int64(np.rint(
                df["value"].to_numpy(np.float64) * 100).sum())
                if len(df) else np.int64(0)],
            "types": [df["event_type"].unique().tolist()]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    types = set()
    for t in p["types"]:
        types.update(t)
    return pd.DataFrame({
        "hits": [np.int64(p["hits"].sum())],
        "value_cents": [np.int64(p["value_cents"].sum())],
        "types": [np.int64(len(types))]})


@register("wap_published_counts", sql="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE value >= 0 GROUP BY event_type""")
def wap_published_counts(sf_dir: str) -> pd.DataFrame:
    """Write–Audit–Publish (state/wap.py): the events feed stages to
    an isolated directory, the data-contract gate audits the STAGED
    files (not-null, range, regex — one streaming pass), and only then
    does the atomic rename publish; the aggregate reads the PUBLISHED
    files, proving the gated copy is what serves. Pytest proves a
    failing batch never becomes visible."""
    import shutil

    from webalizer_ray.state.wap import write_audit_publish

    work = tempfile.mkdtemp(prefix="wr_wap_")
    out = os.path.join(work, "serving")
    try:
        ds = _events(sf_dir, ["event_id", "event_type", "value"])
        write_audit_publish(ds, out, {
            "event_id": {"not_null": True, "min": 0},
            "value": {"min": 0.0},
            "event_type": {"regex": r"^[a-z_]+$"}})
        pub = rd.read_parquet(out, columns=["event_type", "value"])

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("event_type", as_index=False).agg(
                hits=("value", "size"),
                value_cents=("value", lambda v: np.int64(
                    np.rint(v.to_numpy(np.float64) * 100).sum())))
            return g

        agg = reduce_sink(pub.map_batches(partial, batch_format="pandas"),
                          ["event_type"],
                          {"hits": ("hits", "sum"),
                           "value_cents": ("value_cents", "sum")}) \
            .to_pandas()
        agg["hits"] = agg["hits"].astype(np.int64)
        agg["value_cents"] = agg["value_cents"].astype(np.int64)
        return agg.sort_values("event_type", ignore_index=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register("dup_rate_by_threshold", sql="""
WITH p AS (SELECT ROUND(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) >= 0.3)
SELECT CAST(FLOOR(cosine * 20) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY band""")
def dup_rate_by_threshold(sf_dir: str) -> pd.DataFrame:
    """Dedup-threshold calibration curve: candidate-pair cosines
    banded into 0.05 steps — the table you read before PICKING the
    near-dup threshold (how many pairs does each cut keep?). Bands
    computed from the 6-dp-rounded similarity on both sides so band
    edges cannot flip between engines."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = dedup.cosine_dup_pairs(ds, threshold=0.3)
    band = np.floor(pairs["cosine"].to_numpy(np.float64) * 20) \
        .astype(np.int64)
    out = pd.DataFrame({"band": band}).groupby(
        "band", as_index=False).size().rename(columns={"size": "n_pairs"})
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("band", ignore_index=True)


@register("week_overlap_users_hll", sql="""
WITH src AS MATERIALIZED (
  SELECT CASE WHEN ts >= TIMESTAMP '2024-01-01'
               AND ts < TIMESTAMP '2024-01-08' THEN 'a'
              WHEN ts >= TIMESTAMP '2024-01-08'
               AND ts < TIMESTAMP '2024-01-15' THEN 'b' END AS week,
         user_id AS u
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'),
h0 AS (SELECT week, CAST((CAST(u AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT)
              AS z0 FROM src),
h1 AS (SELECT week, CAST((((CAST((xor(z0, z0 >> 30)) >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296 + (CAST((xor(z0, z0 >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929)) % 18446744073709551616 AS UBIGINT) AS z1 FROM h0),
h2 AS (SELECT week, CAST((((CAST((xor(z1, z1 >> 27)) >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296 + (CAST((xor(z1, z1 >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931)) % 18446744073709551616 AS UBIGINT) AS z2 FROM h1),
hx AS MATERIALIZED (SELECT week, xor(z2, z2 >> 31) AS h FROM h2),
regs AS MATERIALIZED (
  SELECT week, CAST(h >> 50 AS BIGINT) AS idx,
         MAX(CASE WHEN (h & 1125899906842623) = 0 THEN 51
                  ELSE 50 - (length(bin(h & 1125899906842623)) - 1)
             END) AS r
  FROM hx GROUP BY week, idx),
uregs AS MATERIALIZED (
  SELECT idx, MAX(r) AS r FROM regs GROUP BY idx),
ecnt AS (
  SELECT week,
         16384.0 * 16384.0 * (0.7213 / (1.0 + 1.079 / 16384.0))
             / ((16384 - COUNT(*)) + SUM(POWER(2.0, -r))) AS e,
         16384 - COUNT(*) AS zeros
  FROM regs GROUP BY week),
ucnt AS (
  SELECT 16384.0 * 16384.0 * (0.7213 / (1.0 + 1.079 / 16384.0))
             / ((16384 - COUNT(*)) + SUM(POWER(2.0, -r))) AS e,
         16384 - COUNT(*) AS zeros
  FROM uregs),
fixed AS (
  SELECT week, CASE WHEN e <= 2.5 * 16384 AND zeros > 0
               THEN 16384.0 * LN(16384.0 / zeros) ELSE e END AS c
  FROM ecnt),
ufix AS (
  SELECT CASE WHEN e <= 2.5 * 16384 AND zeros > 0
         THEN 16384.0 * LN(16384.0 / zeros) ELSE e END AS c
  FROM ucnt)
SELECT CAST(ROUND(a.c) AS BIGINT) AS users_a,
       CAST(ROUND(b.c) AS BIGINT) AS users_b,
       CAST(ROUND(un.c) AS BIGINT) AS users_union,
       CAST(ROUND(GREATEST(0.0, a.c + b.c - un.c)) AS BIGINT)
           AS users_overlap
FROM (SELECT c FROM fixed WHERE week = 'a') a,
     (SELECT c FROM fixed WHERE week = 'b') b,
     ufix un""")
def week_overlap_users_hll(sf_dir: str) -> pd.DataFrame:
    """Sketch set algebra: estimated user overlap between the first
    two weeks via HyperLogLog inclusion–exclusion
    (|A∩B| ≈ |A| + |B| − |A∪B|, union = elementwise register max —
    the mergeable-summary answer when two 10⁹-key sets live on
    different clusters and an exact presence-flag shuffle
    (purchase_week_user_setops) is too expensive). ONE pass computes
    both weeks' sketches (a week-tag per partial). Oracle (r3):
    SplitMix64 hashing lets SQL rebuild both weeks' registers AND the
    union registers (per-index MAX across weeks), replaying the
    inclusion–exclusion bit-for-bit; pytest additionally pins the
    estimate within 5% of the exact overlap."""
    import datetime as _dt

    from webalizer_ray.stages.sketch import HyperLogLog, splitmix64

    d0 = _dt.datetime(2024, 1, 1)
    d1 = d0 + _dt.timedelta(days=7)
    d2 = d0 + _dt.timedelta(days=14)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        ts = df["ts"]
        for tag, lo, hi in (("a", d0, d1), ("b", d1, d2)):
            u = df.loc[(ts >= lo) & (ts < hi), "user_id"].to_numpy()
            if len(u):
                h = splitmix64(u.astype(np.int64).astype(np.uint64))
                out.append({"week": tag,
                            "hll": HyperLogLog.from_hashes(h).to_bytes()})
        return pd.DataFrame(
            {"week": pd.Series([r["week"] for r in out], dtype="string"),
             "hll": pd.Series([r["hll"] for r in out], dtype=object)})

    parts = _events(sf_dir, ["ts", "user_id"]).map_batches(
        partial, batch_format="pandas").to_pandas()
    sk = {"a": HyperLogLog(), "b": HyperLogLog()}
    for _, r in parts.iterrows():
        sk[r["week"]] = sk[r["week"]].merge(
            HyperLogLog.from_bytes(r["hll"]))
    a, b = sk["a"].count(), sk["b"].count()
    union = sk["a"].merge(sk["b"]).count()
    inter = max(0.0, a + b - union)
    return pd.DataFrame({
        "users_a": [np.int64(round(a))],
        "users_b": [np.int64(round(b))],
        "users_union": [np.int64(round(union))],
        "users_overlap": [np.int64(round(inter))]})


def _image_dup_ds(columns=None):
    from webalizer_ray.stages.multimodal import (
        IMAGE_DUP_TABLE_VERSION,
        synth_image_dup_table,
    )
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(),
                     f"wr_imgdup_u{uid}_v{IMAGE_DUP_TABLE_VERSION}")
    marker = os.path.join(d, "images.parquet")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".images-{os.getpid()}.tmp")
        pq.write_table(synth_image_dup_table(), tmp)
        os.replace(tmp, marker)
    return rd.read_parquet(marker, columns=columns)


@register("media_image_dhash_pairs")
def media_image_dhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Perceptual near-dup IMAGE pairs: real pixels → 64-bit dHash in an
    actor-pool stage → chunk-banded Hamming pairs (n_chunks=8 >
    max_hamming=6, so recall is exact by pigeonhole — the distributed
    result provably equals brute force). Catches what byte/exact dedup
    cannot: the fixture plants format-converted (PPM↔BMP), 2×-upscaled
    and noised copies, all different bytes, same or near-same dHash.
    Rows-only (pixel hashing isn't SQL); pytest verifies equality with
    the driver-side brute-force pair set and that every planted variant
    pairs with its base."""
    from webalizer_ray.stages.multimodal import (
        MEDIA_BATCH_KWARGS,
        DHashImage,
    )
    hashed = _image_dup_ds(["media_id", "kind", "payload"]).map_batches(
        DHashImage, concurrency=(1, 2), **MEDIA_BATCH_KWARGS)
    return dedup.hamming64_pairs(hashed, id_col="media_id",
                                 hash_col="dhash", max_hamming=6,
                                 n_chunks=8)


@register("hybrid_search_rrf", sql=r"""
WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS dl
           FROM documents),
n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
             FROM documents)
       WHERE term IN ('table', 'hash', 'merge') GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             ROUND(SUM(ln((n.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / n.avgdl))), 6)
               AS score
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
vec AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vr
        FROM vs QUALIFY vr <= 50),
f AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + lr), 0) + COALESCE(1.0 / (60 + vr), 0)
               AS rrf,
             COALESCE(lr, 0) AS lex_rank, COALESCE(vr, 0) AS vec_rank
      FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(rrf, 9) AS rrf,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank
FROM f ORDER BY rrf DESC, doc_id LIMIT 10""")
def hybrid_search_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    SIGIR'09 — the standard way a RAG/search stack combines a lexical
    and a vector index): the BM25 leg and the exact-cosine leg each
    produce their distributed top-50 (per-batch top-k partials; only
    k rows per block reach the driver), then RRF fuses the two tiny
    rank lists driver-side: score = Σ 1/(60 + rank), absent leg
    contributes 0. Ranks on both engines are over 6-dp (BM25) / 9-dp
    (cosine) rounded scores with id tiebreaks, so no float noise can
    flip a rank; the fused score is one two-term double add."""
    lex = _bm25_topk(sf_dir, k=50)
    lex_rank = {int(d): r + 1 for r, d in enumerate(lex["doc_id"])}

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    query = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    vec = ann.brute_force_topk(ds, query, k=50)
    vec_rank = {int(v): int(r) for v, r in zip(vec["vec_id"], vec["rank"])}

    ids = sorted(set(lex_rank) | set(vec_rank))
    lr = np.array([lex_rank.get(i, 0) for i in ids], dtype=np.int64)
    vr = np.array([vec_rank.get(i, 0) for i in ids], dtype=np.int64)
    rrf = (np.where(lr > 0, 1.0 / (60.0 + lr), 0.0)
           + np.where(vr > 0, 1.0 / (60.0 + vr), 0.0))
    out = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                        "rrf": np.round(rrf, 9),
                        "lex_rank": lr, "vec_rank": vr})
    return (out.sort_values(["rrf", "doc_id"], ascending=[False, True],
                            kind="mergesort")
            .head(10).reset_index(drop=True))


@register("ab_test_conversion_ztest", sql="""
WITH u AS (SELECT user_id, user_id % 2 AS arm,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS conv
           FROM events GROUP BY user_id),
a AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_b
      FROM u)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM a""")
def ab_test_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    """Experiment analysis: two-proportion z-test on user-level purchase
    conversion under a deterministic id-parity assignment (the split a
    real experimenation system computes over billions of users). Per-user
    conversion flags are indicator-max partials (users never reach the
    driver); the four arm counts are the only rows that move; the
    z statistic is ONE closed-form expression written identically on
    both engines (integer counts in, one rounded double out)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "conv": (df["event_type"] == "purchase").astype(np.int64)})

    per_user = reduce_sink(ds.map_batches(flag, batch_format="pandas"),
                           ["user_id"], {"conv": ("conv", "max")})

    def arm_partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (df["user_id"].to_numpy(np.int64) % 2)
        c = df["conv"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_a": [np.int64((arm == 0).sum())],
            "n_b": [np.int64((arm == 1).sum())],
            "conv_a": [np.int64(c[arm == 0].sum())],
            "conv_b": [np.int64(c[arm == 1].sum())]})

    tot = per_user.map_batches(arm_partial,
                               batch_format="pandas").to_pandas().sum()
    n_a, n_b = float(tot["n_a"]), float(tot["n_b"])
    conv_a, conv_b = float(tot["conv_a"]), float(tot["conv_b"])
    p = (conv_a + conv_b) / (n_a + n_b)
    z = ((conv_a / n_a - conv_b / n_b)
         / np.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)))
    return pd.DataFrame({
        "n_a": [np.int64(tot["n_a"])], "n_b": [np.int64(tot["n_b"])],
        "conv_a": [np.int64(tot["conv_a"])],
        "conv_b": [np.int64(tot["conv_b"])],
        "z": [float(textstats.round_half_away(z, 6))]})


@register("k_anonymity_audit", sql="""
WITH g AS (SELECT event_type, hour(ts) AS hr, dayofweek(ts) AS dow,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_violating,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk
FROM g""")
def k_anonymity_audit(sf_dir: str) -> pd.DataFrame:
    """Privacy-governance audit: k-anonymity (k=5) over the
    quasi-identifier tuple (event_type, hour, weekday) — a release is
    k-anonymous when every QI group holds ≥ k rows, else the small
    groups re-identify individuals (Sweeney 2002). Group sizes are
    ordinary count partials; the audit then folds the COUNT TABLE (not
    the rows) to three integers with per-batch partial sums, so neither
    the events nor the group table ever reach the driver. The weekday
    NUMBERING differs between engines (pandas Monday=0, DuckDB
    Sunday=0) but the PARTITION it induces is identical, and only group
    sizes matter."""
    def qi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hr": df["ts"].dt.hour.astype(np.int64),
                             "dow": df["ts"].dt.dayofweek.astype(np.int64)})

    groups = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(qi, batch_format="pandas"),
        ["event_type", "hr", "dow"], {"n": ("hr", "size")})

    def audit_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        small = n < 5
        return pd.DataFrame({"n_groups": [np.int64(len(n))],
                             "groups_violating": [np.int64(small.sum())],
                             "rows_at_risk": [np.int64(n[small].sum())]})

    tot = groups.map_batches(audit_partial,
                             batch_format="pandas").to_pandas().sum()
    return pd.DataFrame({k: [np.int64(tot[k])]
                         for k in ("n_groups", "groups_violating",
                                   "rows_at_risk")})


@register("containment_quote_pairs", sql=r"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
sh AS (SELECT doc_id, array_to_string(toks[i:i+19], ' ') AS sp
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-19))
                        AS i) g),
d AS (SELECT DISTINCT doc_id, sp FROM sh),
cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM d a JOIN d b ON a.sp = b.sp AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
g3 AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g
       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-2))
                        AS i) gg),
dg AS (SELECT DISTINCT doc_id, g FROM g3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1),
inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS i
          FROM cand c JOIN dg x ON x.doc_id = c.id_a
               JOIN dg y ON y.doc_id = c.id_b AND y.g = x.g
          GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       ROUND(COALESCE(i.i, 0) / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6)
         AS containment,
       ROUND(COALESCE(i.i, 0)
             / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE), 6)
         AS jaccard
FROM cand c JOIN sz sa ON sa.doc_id = c.id_a
     JOIN sz sb ON sb.doc_id = c.id_b
     LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
WHERE COALESCE(i.i, 0) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= 0.8""")
def containment_quote_pairs(sf_dir: str) -> pd.DataFrame:
    """Quote/subset detection via n-gram CONTAINMENT, C(A,B) =
    |G₃(A)∩G₃(B)| / min(|G₃(A)|,|G₃(B)|) — the asymmetric cousin of
    Jaccard (Broder's resemblance vs containment split): a short doc
    quoted inside a long one scores containment ≈ 1 but low Jaccard,
    so symmetric dedup misses it. Candidates come from the
    DETERMINISTIC shared-20-token-span prefilter (itself oracle-backed
    — a containing pair shares its spans by construction, so recall
    vs this filter is exact, which is what makes the whole chain
    SQL-checkable, unlike the sampling-based MinHash candidates);
    the verify joins candidate texts back in-cluster and emits both
    measures so the containment-vs-jaccard gap is visible."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    cand = dedup.shared_span_pairs(docs, n=20)
    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64),
                          "containment": pd.Series(dtype=np.float64),
                          "jaccard": pd.Series(dtype=np.float64)})
    if not len(cand):
        return empty
    p = rd.from_pandas(cand[["id_a", "id_b"]])
    j = dedup.join_pairs_to_values(p, docs, "doc_id", "text")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b, ta, tb in zip(df["id_a"], df["id_b"],
                                df["text_a"], df["text_b"]):
            sa, sb = dedup.word_ngrams(ta, 3), dedup.word_ngrams(tb, 3)
            inter = len(sa & sb)
            cont = inter / min(len(sa), len(sb))
            if cont >= 0.8:
                jac = inter / (len(sa) + len(sb) - inter)
                rows.append((a, b,
                             float(textstats.round_half_away(cont, 6)),
                             float(textstats.round_half_away(jac, 6))))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "containment",
                                           "jaccard"]) \
            .astype({"id_a": np.int64, "id_b": np.int64})

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    if "id_a" not in out.columns or not len(out):
        return empty
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


@register("knn_triangle_stats", sql="""
WITH sims AS (
  SELECT a.vec_id AS node, b.vec_id AS neighbor,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (SELECT node, neighbor,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sims),
k AS (SELECT node, neighbor FROM r WHERE rank <= 2),
e AS (SELECT DISTINCT LEAST(node, neighbor) AS a,
                      GREATEST(node, neighbor) AS b FROM k),
nn AS (SELECT COUNT(DISTINCT x) AS n
       FROM (SELECT a AS x FROM e UNION ALL SELECT b AS x FROM e)),
tri AS (SELECT COUNT(*) AS t
        FROM e e1 JOIN e e2 ON e2.a = e1.b
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST(nn.n AS BIGINT) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(tri.t AS BIGINT) AS n_triangles
FROM nn CROSS JOIN tri""")
def knn_triangle_stats(sf_dir: str) -> pd.DataFrame:
    """Triangle census of the k-NN similarity graph — the standard
    embedding-space clustering diagnostic (many triangles = tight
    semantic clusters; a triangle-free kNN graph means the space is
    spread thin). Distributed node-iterator counting in
    graph.triangle_count: canonical edges → wedges by middle node →
    closing-edge check, each step a co-partitioned union+groupby (the
    CC/PageRank message pattern), only three scalars reach the driver.
    Oracle: triple self-join over the identical canonical edge set."""
    from webalizer_ray.stages import graph

    edges = knn_graph(sf_dir)[["node", "neighbor"]].rename(
        columns={"node": "id_a", "neighbor": "id_b"})
    st = graph.triangle_count(edges)
    return pd.DataFrame({"n_nodes": [np.int64(st["n_nodes"])],
                         "n_edges": [np.int64(st["n_edges"])],
                         "n_triangles": [np.int64(st["n_triangles"])]})


@register("events_table_checksum", sql="""
WITH d AS (SELECT (CAST(user_id AS HUGEINT) * 1000003
                   + CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT)
                     * 8191
                   + CAST(hour(ts) AS HUGEINT) * 131071
                   + CAST(ascii(event_type) * 131 + length(event_type)
                          AS HUGEINT) * 524287)
                  % 18446744073709551616 AS dig
           FROM events)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(dig) % 18446744073709551616 AS VARCHAR) AS checksum
FROM d""")
def events_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent content checksum — the replication/migration
    verifier: after copying a table between engines or clusters, two
    sides agree iff (n_rows, checksum) agree, no sort and no row
    transfer needed. The row digest is an ARITHMETIC closed form over
    integer-coerced fields (cents-quantized value, hour, a char-code
    fold of the type) in uint64 wrap-around — numpy's per-op wrapping
    and SQL's single end mod are congruent because +/× commute with
    mod 2⁶⁴ — and SUM is commutative, so any row order / any
    partitioning yields the identical checksum. One uint64 partial per
    batch reaches the driver."""
    M = 1 << 64

    def digest_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.uint64)
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0) \
            .astype(np.int64).astype(np.uint64)
        hr = df["ts"].dt.hour.to_numpy().astype(np.uint64)
        types = {t: np.uint64(ord(t[0]) * 131 + len(t))
                 for t in df["event_type"].unique()}
        tcode = df["event_type"].map(types).to_numpy(np.uint64)
        dig = (u * np.uint64(1000003) + cents * np.uint64(8191)
               + hr * np.uint64(131071) + tcode * np.uint64(524287))
        s = int(np.sum(dig, dtype=np.uint64))   # wrap == mod 2^64
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "s": [str(s)]})

    parts = _events(sf_dir, ["ts", "user_id", "event_type", "value"]) \
        .map_batches(digest_partial, batch_format="pandas").to_pandas()
    total = 0
    for s in parts["s"]:
        total = (total + int(s)) % M
    return pd.DataFrame({"n_rows": [np.int64(parts["n"].sum())],
                         "checksum": [str(total)]})


@register("target_encoded_event_types", sql="""
WITH c AS (SELECT event_type, event_id % 3 AS fold,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events),
f AS (SELECT event_type, fold, SUM(cents) AS s, COUNT(*) AS n
      FROM c GROUP BY 1, 2),
t AS (SELECT event_type, SUM(s) AS ts, SUM(n) AS tn FROM f GROUP BY 1)
SELECT f.event_type, CAST(f.fold AS BIGINT) AS fold,
       CAST(f.n AS BIGINT) AS n_rows,
       ROUND((t.ts - f.s) / (100.0 * (t.tn - f.n)), 6) AS enc
FROM f JOIN t USING (event_type)
WHERE t.tn > f.n""")
def target_encoded_event_types(sf_dir: str) -> pd.DataFrame:
    """Leakage-protected (out-of-fold) target encoding — the standard
    way a categorical feature absorbs a target without memorizing its
    own row: fold k's encoding of a category is the target mean over
    the OTHER folds, (tot − fold)/(n_tot − n_fold). Everything reduces
    to per-(category, fold) integer partials — the 2-dp value column is
    cent-quantized, so sums are EXACT in any order and partitioning
    (the dyadic-fixture lesson applied to real money columns); the one
    float division happens once per output row on both engines."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "fold": df["event_id"].to_numpy(np.int64) % 3,
            "s": cents,
        }).groupby(["event_type", "fold"], sort=False) \
            .agg(s=("s", "sum"), n=("s", "size")).reset_index()
        g["s"] = g["s"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    f = reduce_sink(ds.map_batches(partial, batch_format="pandas"),
                    ["event_type", "fold"],
                    {"s": ("s", "sum"), "n": ("n", "sum")}).to_pandas()
    t = f.groupby("event_type", sort=False) \
        .agg(ts=("s", "sum"), tn=("n", "sum")).reset_index()
    m = f.merge(t, on="event_type")
    m = m[m["tn"] > m["n"]].copy()
    m["enc"] = textstats.round_half_away(
        (m["ts"] - m["s"]).to_numpy(np.float64)
        / (100.0 * (m["tn"] - m["n"]).to_numpy(np.float64)), 6)
    m["n_rows"] = m["n"].astype(np.int64)
    m["fold"] = m["fold"].astype(np.int64)
    return m[["event_type", "fold", "n_rows", "enc"]] \
        .sort_values(["event_type", "fold"], ignore_index=True)


@register("benford_first_digit", sql="""
WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM events
           WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(n / CAST(t.tot AS DOUBLE), 6) AS observed,
       ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford
FROM c CROSS JOIN t""")
def benford_first_digit(sf_dir: str) -> pd.DataFrame:
    """Benford's-law digit audit — the classic fraud / synthetic-data
    smell test on a money column: the first significant digit of
    natural multiplicative data follows log10(1 + 1/d). Digits come
    from the EXACT cent integer (decimal-string head, no float log
    tricks that disagree at powers of ten), counts are ordinary
    partials, and both the observed share and the Benford expectation
    are one rounded expression per digit. The verdict (uniform-ish
    synthetic values ≠ Benford) is the point — the table is what an
    auditor reads."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def digit_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        d = cents[cents > 0]
        while (d >= 10).any():     # strip digits: O(log10 max) passes
            d = np.where(d >= 10, d // 10, d)
        g = pd.Series(d).value_counts()
        return pd.DataFrame({"digit": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    c = reduce_sink(ds.map_batches(digit_partial, batch_format="pandas"),
                    ["digit"], {"n": ("n", "sum")}).to_pandas()
    tot = float(c["n"].sum())
    c["observed"] = textstats.round_half_away(
        c["n"].to_numpy(np.float64) / tot, 6)
    c["benford"] = textstats.round_half_away(
        np.log(1.0 + 1.0 / c["digit"].to_numpy(np.float64))
        / np.log(10.0), 6)
    c["n"] = c["n"].astype(np.int64)
    return c.sort_values("digit", ignore_index=True)


@register("term_info_gain", sql=r"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
lab AS (SELECT doc_id,
               CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
                 AS y
        FROM t),
dw AS (SELECT DISTINCT doc_id, unnest(toks) AS w FROM t),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(y) AS DOUBLE) AS n1 FROM lab),
c AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS dt,
             CAST(SUM(y) AS DOUBLE) AS a
      FROM dw JOIN lab USING (doc_id) GROUP BY w),
ig AS (SELECT w,
  (CASE WHEN n1 / nn <= 0 OR n1 / nn >= 1 THEN 0
        ELSE -((n1 / nn) * ln(n1 / nn)
               + (1 - n1 / nn) * ln(1 - n1 / nn)) END)
  - (dt / nn) * (CASE WHEN a / dt <= 0 OR a / dt >= 1 THEN 0
                      ELSE -((a / dt) * ln(a / dt)
                             + (1 - a / dt) * ln(1 - a / dt)) END)
  - (CASE WHEN nn - dt = 0 THEN 0
          ELSE ((nn - dt) / nn)
               * (CASE WHEN (n1 - a) / (nn - dt) <= 0
                            OR (n1 - a) / (nn - dt) >= 1 THEN 0
                       ELSE -(((n1 - a) / (nn - dt))
                              * ln((n1 - a) / (nn - dt))
                              + (1 - (n1 - a) / (nn - dt))
                              * ln(1 - (n1 - a) / (nn - dt))) END) END)
    AS gain
  FROM c CROSS JOIN n)
SELECT w AS term, ROUND(gain, 6) AS info_gain
FROM ig ORDER BY ROUND(gain, 6) DESC, term LIMIT 10""")
def term_info_gain(sf_dir: str) -> pd.DataFrame:
    """Feature selection by information gain: IG(term; label) =
    H(label) − Σ_splits p(split)·H(label | term present/absent), the
    classic filter-method term ranker (and the decision-tree split
    criterion). Label = doc contains 'spark', so the top term must be
    'spark' itself (IG = H(label)) — a built-in sanity check. The heavy
    work is ONE distinct-(doc, term) count reduce carrying the label
    (vocab-sized output; the corpus never re-shuffles); the entropy
    closed form runs on that tiny table in the oracle's exact
    expression order, branches guarded the same way on both engines."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        y = np.array([1 if "spark" in (w or []) else 0 for w in words],
                     dtype=np.int64)
        dl = words.str.len().to_numpy(np.int64)
        flat = words.explode().dropna().to_numpy()
        pairs = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), dl),
            "w": flat,
            "y": np.repeat(y, dl)}).drop_duplicates(["doc_id", "w"])
        # scalar partials ride as a sentinel row so one reduce serves
        # both the per-term counts and (N, n1)
        head = pd.DataFrame({"doc_id": [np.int64(-1)], "w": ["\x00n"],
                             "y": [np.int64(y.sum())]})
        head["dt"] = np.int64(len(df))
        pairs["dt"] = np.int64(1)
        return pd.concat([pairs[["w", "dt", "y"]],
                          head[["w", "dt", "y"]]], ignore_index=True)

    st = reduce_sink(docs.map_batches(explode, batch_format="pandas"),
                     ["w"], {"dt": ("dt", "sum"), "a": ("y", "sum")}) \
        .to_pandas()
    tot = st[st["w"] == "\x00n"]
    nn, n1 = float(tot["dt"].iloc[0]), float(tot["a"].iloc[0])
    c = st[st["w"] != "\x00n"].copy()
    dt = c["dt"].to_numpy(np.float64)
    a = c["a"].to_numpy(np.float64)

    def h(p: np.ndarray) -> np.ndarray:
        p = np.asarray(p, dtype=np.float64)
        inner = (p > 0) & (p < 1)
        q = np.where(inner, p, 0.5)     # dummy where the branch is dead
        return np.where(inner, -(q * np.log(q)
                                 + (1 - q) * np.log(1 - q)), 0.0)

    with np.errstate(divide="ignore", invalid="ignore"):
        cond = h(np.where(nn - dt == 0, 0.0,
                          (n1 - a) / np.where(nn - dt == 0, 1.0,
                                              nn - dt)))
        gain = (h(n1 / nn) - (dt / nn) * h(a / dt)
                - np.where(nn - dt == 0, 0.0, ((nn - dt) / nn) * cond))
    c["info_gain"] = textstats.round_half_away(gain, 6)
    c["term"] = c["w"]
    return (c.sort_values(["info_gain", "term"],
                          ascending=[False, True], kind="mergesort")
            .head(10)[["term", "info_gain"]].reset_index(drop=True))


@register("survival_time_to_purchase", sql="""
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
e AS (SELECT t, SUM(ev) AS d, COUNT(*) AS ending FROM obs GROUP BY t),
r AS (SELECT t, d,
             (SELECT COUNT(*) FROM obs)
             - COALESCE(SUM(ending) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
      FROM e)
SELECT CAST(t AS BIGINT) AS t_day, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS events,
       ROUND(PRODUCT(1.0 - d / CAST(n_risk AS DOUBLE))
             OVER (ORDER BY t), 6) AS survival
FROM r WHERE d > 0""")
def survival_time_to_purchase(sf_dir: str) -> pd.DataFrame:
    """Survival analysis: Kaplan–Meier estimate of time from a user's
    first event to first purchase, RIGHT-CENSORED at the last seen day
    for users who never purchase — the estimator conversion-lag and
    churn studies actually need (a naive mean-over-converters is
    biased). Heavy work = ONE per-user (min purchase day, first day,
    last day) reduce; the (t, deaths, at-risk) life table is O(days)
    and the ordered product runs on the driver in the oracle's exact
    multiply order. d=0 rows contribute factor 1, so filtering them
    before or after the product is equivalent (both engines filter)."""
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
            .agg(d=("ev", "sum"), ending=("ev", "size")).reset_index()
        g["d"] = g["d"].astype(np.int64)
        g["ending"] = g["ending"].astype(np.int64)
        return g

    e = reduce_sink(u.map_batches(obs_partial, batch_format="pandas"),
                    ["t"], {"d": ("d", "sum"),
                            "ending": ("ending", "sum")}).to_pandas()
    e = e.sort_values("t", ignore_index=True)
    n_total = int(e["ending"].sum())
    before = np.concatenate(([0], np.cumsum(e["ending"].to_numpy())[:-1]))
    e["n_risk"] = n_total - before
    surv = 1.0
    out_rows = []
    for t, d, nr in zip(e["t"], e["d"], e["n_risk"]):
        surv = surv * (1.0 - float(d) / float(nr))
        if d > 0:
            out_rows.append((int(t), int(nr), int(d),
                             float(textstats.round_half_away(surv, 6))))
    return pd.DataFrame(out_rows, columns=["t_day", "n_risk", "events",
                                           "survival"]) \
        .astype({"t_day": np.int64, "n_risk": np.int64,
                 "events": np.int64})


@register("typo_part_name_pairs", sql="""
WITH n AS (SELECT DISTINCT p_name AS key FROM part)
SELECT a.key AS a, b.key AS b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS ed
FROM n a JOIN n b ON a.key < b.key
WHERE levenshtein(a.key, b.key) <= 2""")
def typo_part_name_pairs(sf_dir: str) -> pd.DataFrame:
    """Edit-distance fuzzy join (typo detection / entity resolution):
    all distinct part-name pairs within Levenshtein distance ≤ 2 via
    PassJoin segment signatures — k edits leave one of k+1 segments
    verbatim in any partner, so candidates come from a signature
    groupby (O(k·n) rows per key) and the banded-DP verify runs
    in-cluster; recall is exact, proven against the brute-force
    all-pairs oracle. Complements similar_part_names (set Jaccard):
    edit distance sees transpositions/typos that q-gram sets score
    leniently, and vice versa."""
    from webalizer_ray.stages.simjoin import edit_distance_join

    names = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"]).map_batches(
        lambda df: df.rename(columns={"p_name": "key"}),
        batch_format="pandas")
    return edit_distance_join(names, k=2)


@register("type_hour_chi2", sql="""
WITH j AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
                  COUNT(*) AS nxy FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
t AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n FROM j),
chi AS (SELECT SUM((nxy - nx * ny / n) * (nxy - nx * ny / n)
                   / (nx * ny / n)) AS c2,
               (SELECT COUNT(*) FROM mx) AS r,
               (SELECT COUNT(*) FROM my) AS c
        FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t)
SELECT ROUND(c2, 6) AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(sqrt(c2 / ((SELECT n FROM t)
                        * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6)
         AS cramers_v
FROM chi""")
def type_hour_chi2(sf_dir: str) -> pd.DataFrame:
    """Pearson χ² test of independence (event_type × hour) with
    Cramér's V effect size — the frequentist sibling of type_hour_mi
    (MI measures shared information, χ²/V calibrates deviation against
    sampling noise). Corpus reduces to the |types|×24 joint histogram
    (integer partials); the χ² sum and V run on the tiny table in the
    oracle's expression order. NOTE the missing-cell convention: only
    OBSERVED (x, y) cells enter the sum on both engines — a zero cell
    contributes its expected count; this implementation and the SQL
    share the same (documented) convention so the statistic matches."""
    def qi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": df["event_type"],
                             "y": df["ts"].dt.hour.astype(np.int64)})

    j = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                    .map_batches(qi, batch_format="pandas"),
                    ["x", "y"], {"nxy": ("x", "size")}).to_pandas()
    nx = j.groupby("x")["nxy"].sum()
    ny = j.groupby("y")["nxy"].sum()
    n = float(j["nxy"].sum())
    nxv = j["x"].map(nx).to_numpy(np.float64)
    nyv = j["y"].map(ny).to_numpy(np.float64)
    nxy = j["nxy"].to_numpy(np.float64)
    exp = nxv * nyv / n
    chi2 = float(np.sum((nxy - exp) * (nxy - exp) / exp))
    r, c = len(nx), len(ny)
    v = np.sqrt(chi2 / (n * float(min(r - 1, c - 1))))
    return pd.DataFrame({
        "chi2": [float(textstats.round_half_away(chi2, 6))],
        "dof": [np.int64((r - 1) * (c - 1))],
        "cramers_v": [float(textstats.round_half_away(v, 6))]})


@register("daily_events_gapfilled", sql="""
WITH b AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
span AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
         FROM b GROUP BY 1),
cal AS (SELECT event_type, CAST(unnest(generate_series(d0, d1,
                    INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
SELECT cal.event_type, strftime(cal.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS hits
FROM cal LEFT JOIN b ON b.event_type = cal.event_type
                    AND b.day = cal.day""")
def daily_events_gapfilled(sf_dir: str) -> pd.DataFrame:
    """Calendar densification (gap filling): the daily-count series per
    type with EXPLICIT zero rows for silent days — what every
    time-series consumer downstream (charting, anomaly z-scores,
    forecasting) assumes, and what a bare groupby cannot produce
    because absent groups yield no row. Heavy work = the one daily
    count reduce; the calendar expansion runs on the O(types × days)
    aggregate with numpy repeat/arange — no per-day loop, no extra
    shuffle."""
    def day_col(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "day": df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64)})

    b = reduce_sink(_events(sf_dir, ["ts", "event_type"])
                    .map_batches(day_col, batch_format="pandas"),
                    ["event_type", "day"],
                    {"n": ("day", "size")}).to_pandas()
    span = b.groupby("event_type")["day"].agg(["min", "max"])
    lens = (span["max"] - span["min"] + 1).to_numpy(np.int64)
    types = np.repeat(span.index.to_numpy(), lens)
    days = np.concatenate([np.arange(d0, d1 + 1, dtype=np.int64)
                           for d0, d1 in zip(span["min"], span["max"])])
    cal = pd.DataFrame({"event_type": types, "day": days})
    out = cal.merge(b, on=["event_type", "day"], how="left")
    out["hits"] = out["n"].fillna(0).astype(np.int64)
    out["day"] = pd.to_datetime(out["day"], unit="D") \
        .dt.strftime("%Y-%m-%d")
    return out[["event_type", "day", "hits"]] \
        .sort_values(["event_type", "day"], ignore_index=True)


@register("cohort_ltv_curve", sql="""
WITH um AS (SELECT user_id, (year(ts) * 12 + month(ts)) AS ym,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events),
uc AS (SELECT user_id, MIN(ym) AS cohort FROM um GROUP BY 1),
ca AS (SELECT cohort, ym - cohort AS age, SUM(cents) AS cents
       FROM um JOIN uc USING (user_id) GROUP BY 1, 2),
sz AS (SELECT cohort, COUNT(*) AS users FROM uc GROUP BY 1)
SELECT CAST(ca.cohort AS BIGINT) AS cohort_ym,
       CAST(age AS BIGINT) AS age_months,
       CAST(sz.users AS BIGINT) AS users,
       ROUND(SUM(ca.cents) OVER (PARTITION BY ca.cohort ORDER BY age)
             / (100.0 * sz.users), 6) AS cum_ltv
FROM ca JOIN sz USING (cohort)""")
def cohort_ltv_curve(sf_dir: str) -> pd.DataFrame:
    """Cohort lifetime-value curve: cumulative value per user by cohort
    age (the retention report's revenue twin). Per-(user, month) cent
    partials reduce first; each user's cohort (min month) and age
    offsets derive INSIDE the user-hash bucket so the fact rows never
    join back to a cohort table; the (cohort, age) table is O(months²)
    and the cumulative sum runs over exact integer cents — one division
    per output row on both engines."""
    ds = _events(sf_dir, ["ts", "user_id", "value"])

    def um_partial(df: pd.DataFrame) -> pd.DataFrame:
        ym = (df["ts"].dt.year * 12 + df["ts"].dt.month) \
            .to_numpy(np.int64)
        cents = textstats.round_half_away(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"], "ym": ym,
                          "cents": cents}) \
            .groupby(["user_id", "ym"], sort=False)["cents"].sum() \
            .reset_index()
        g["cents"] = g["cents"].astype(np.int64)
        return g

    um = reduce_sink(ds.map_batches(um_partial, batch_format="pandas"),
                     ["user_id", "ym"], {"cents": ("cents", "sum")})

    def bucket_cohort(df: pd.DataFrame) -> pd.DataFrame:
        cohort = df.groupby("user_id", sort=False)["ym"].transform("min")
        out = pd.DataFrame({"cohort": cohort.to_numpy(np.int64),
                            "age": df["ym"].to_numpy(np.int64)
                            - cohort.to_numpy(np.int64),
                            "cents": df["cents"].to_numpy(np.int64)})
        g = out.groupby(["cohort", "age"], sort=False)["cents"].sum() \
            .reset_index()
        g["users"] = np.int64(0)
        # cohort sizes ride as age = -1 sentinel rows (one per cohort
        # per bucket; users are bucket-disjoint so the final sum is
        # exact and never double-counts across age rows)
        users = df.groupby("user_id", sort=False)["ym"].min()
        u = users.value_counts().rename("users").reset_index() \
            .rename(columns={"ym": "cohort"})
        u["age"] = np.int64(-1)
        u["cents"] = np.int64(0)
        both = pd.concat([g, u[["cohort", "age", "cents", "users"]]],
                         ignore_index=True)
        both["cents"] = both["cents"].astype(np.int64)
        both["users"] = both["users"].astype(np.int64)
        return both

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from webalizer_ray.stages.aggregate import key_bucket
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    ca = reduce_sink(
        (um.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(bucket_cohort,
                                   batch_format="pandas")),
        ["cohort", "age"], {"cents": ("cents", "sum"),
                            "users": ("users", "sum")}).to_pandas()
    sz = ca[ca["age"] == -1].set_index("cohort")["users"]
    ca = ca[ca["age"] >= 0].sort_values(["cohort", "age"],
                                        ignore_index=True)
    ca["cum"] = ca.groupby("cohort")["cents"].cumsum()
    return pd.DataFrame({
        "cohort_ym": ca["cohort"].astype(np.int64),
        "age_months": ca["age"].astype(np.int64),
        "users": ca["cohort"].map(sz).astype(np.int64),
        "cum_ltv": textstats.round_half_away(
            ca["cum"].to_numpy(np.float64)
            / (100.0 * ca["cohort"].map(sz).to_numpy(np.float64)), 6)})


@register("event_type_lift", sql="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS nu FROM events),
m AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cab
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT ta, tb, CAST(cab AS BIGINT) AS users_both,
       ROUND(cab * nu / (ma.c * mb.c), 6) AS lift
FROM p JOIN m ma ON ma.event_type = ta
       JOIN m mb ON mb.event_type = tb CROSS JOIN n""")
def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rules lift over user baskets: lift(a,b) =
    P(a,b)/(P(a)P(b)) — >1 means the types co-occur in the same users
    beyond chance (the market-basket statistic behind
    recommendations). Distinct (user, type) pairs reduce two-phase;
    pair expansion is one vectorized self-merge INSIDE the user-hash
    bucket (types per user is bounded by |types|, so no blowup);
    margins and the lift expression run on the |types|²-sized table."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["user_id", "event_type"])

    def dedup_local(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().copy()
        d["_h"] = key_bucket(d, ["user_id"], 64)
        return d

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        pairs = d.merge(d, on="user_id")
        pairs = pairs[pairs["event_type_x"] < pairs["event_type_y"]]
        pc = pairs.groupby(["event_type_x", "event_type_y"],
                           sort=False).size().rename("cab").reset_index()
        pc.columns = ["ta", "tb", "cab"]
        marg = d.groupby("event_type", sort=False).size().rename("c") \
            .reset_index()
        out = pd.DataFrame({
            "ta": pd.concat([pc["ta"], marg["event_type"],
                             pd.Series(["\x00nu"])], ignore_index=True),
            "tb": pd.concat([pc["tb"],
                             pd.Series(["\x00m"] * len(marg)),
                             pd.Series(["\x00nu"])], ignore_index=True),
            "n": pd.concat([pc["cab"], marg["c"],
                            pd.Series([d["user_id"].nunique()])],
                           ignore_index=True).astype(np.int64)})
        return out

    st = reduce_sink(
        (ds.map_batches(dedup_local, batch_format="pandas")
         .groupby("_h").map_groups(bucket_stats, batch_format="pandas")),
        ["ta", "tb"], {"n": ("n", "sum")}).to_pandas()
    nu = float(st.loc[st["ta"] == "\x00nu", "n"].iloc[0])
    marg = st[st["tb"] == "\x00m"].set_index("ta")["n"]
    p = st[(st["tb"] != "\x00m") & (st["ta"] != "\x00nu")].copy()
    ca = p["ta"].map(marg).to_numpy(np.float64)
    cb = p["tb"].map(marg).to_numpy(np.float64)
    p["users_both"] = p["n"].astype(np.int64)
    p["lift"] = textstats.round_half_away(
        p["n"].to_numpy(np.float64) * nu / (ca * cb), 6)
    return p[["ta", "tb", "users_both", "lift"]] \
        .sort_values(["ta", "tb"], ignore_index=True)


@register("new_vs_returning_daily", sql="""
WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fday
           FROM events GROUP BY 1)
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN CAST(ts AS DATE) = fday THEN 1 ELSE 0 END)
            AS BIGINT) AS new_hits,
       CAST(SUM(CASE WHEN CAST(ts AS DATE) > fday THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_hits
FROM events JOIN f USING (user_id) GROUP BY 1""")
def new_vs_returning_daily(sf_dir: str) -> pd.DataFrame:
    """New-vs-returning daily split (the acquisition-vs-retention
    headline every traffic report leads with): a hit is 'new' iff it
    falls on its user's first-seen day. Per-(user, day) count partials
    reduce first; the first-seen day derives INSIDE the user-hash
    bucket (no join back to the fact rows); only (day, new, returning)
    partials leave the buckets."""
    from webalizer_ray.stages.aggregate import key_bucket

    ds = _events(sf_dir, ["ts", "user_id"])

    def ud_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"], "day": day}) \
            .groupby(["user_id", "day"], sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    ud = reduce_sink(ds.map_batches(ud_partial, batch_format="pandas"),
                     ["user_id", "day"], {"n": ("n", "sum")})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    def bucket_split(df: pd.DataFrame) -> pd.DataFrame:
        fday = df.groupby("user_id", sort=False)["day"].transform("min")
        new = df["day"].to_numpy(np.int64) == fday.to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        out = pd.DataFrame({"day": df["day"].to_numpy(np.int64),
                            "new_hits": np.where(new, n, 0),
                            "returning_hits": np.where(new, 0, n)})
        g = out.groupby("day", sort=False).sum().reset_index()
        for c in ("new_hits", "returning_hits"):
            g[c] = g[c].astype(np.int64)
        return g

    daily = reduce_sink(
        (ud.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(bucket_split, batch_format="pandas")),
        ["day"], {"new_hits": ("new_hits", "sum"),
                  "returning_hits": ("returning_hits", "sum")}) \
        .to_pandas()
    daily["day"] = pd.to_datetime(daily["day"], unit="D") \
        .dt.strftime("%Y-%m-%d")
    for c in ("new_hits", "returning_hits"):
        daily[c] = daily[c].astype(np.int64)
    return daily.sort_values("day", ignore_index=True)


@register("leakage_safe_split_counts", sql="""
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
cl AS (SELECT node, MIN(reach) AS rep FROM walk GROUP BY node),
r AS (SELECT e.vec_id, e.label, COALESCE(c.rep, e.vec_id) AS rep
      FROM embeddings e LEFT JOIN cl c ON c.node = e.vec_id)
SELECT CASE WHEN rep % 10 < 8 THEN 'train' ELSE 'val' END AS split,
       CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS vecs
FROM r GROUP BY split, label""")
def leakage_safe_split_counts(sf_dir: str) -> pd.DataFrame:
    """Cluster-aware (leakage-safe) train/val split: a doc-id hash split
    puts near-duplicates on BOTH sides of the cut — the eval set then
    scores memorization, not generalization. Fix: split on the near-dup
    CLUSTER representative (min id of the connected component over the
    verified cosine pair graph), so every cluster lands atomically in
    one split; singletons fall back to their own id, reproducing the
    plain deterministic split. Scale shape: the clustered-node → rep
    map is sparse (dup clusters are a small fraction of any corpus) and
    broadcasts once via ray.put; membership is then a pure per-batch
    function — no shuffle beyond the tiny (split, label) partials."""
    cl = cosine_dup_clusters(sf_dir)
    rep_ref = ray.put(dict(zip(cl["node"].to_numpy(),
                               cl["cluster_id"].to_numpy())))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(rep_ref)
        rep = (df["vec_id"].map(lut).fillna(df["vec_id"])
               .astype(np.int64))
        return pd.DataFrame({
            "split": np.where(rep % 10 < 8, "train", "val"),
            "label": df["label"].to_numpy(np.int64)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label"]) \
        .map_batches(tag, batch_format="pandas")
    out = reduce_sink(ds, ["split", "label"],
                      {"vecs": ("label", "size")}).to_pandas()
    return out.sort_values(["split", "label"], ignore_index=True)


@register("tpch_q21_sole_late_supplier", sql="""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
o AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM f GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM f JOIN o USING (l_orderkey)
     JOIN supplier ON s_suppkey = l_suppkey
WHERE f.late = 1 AND o.n_supp > 1 AND o.n_late = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
def tpch_q21_sole_late_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21-shaped correlated EXISTS + NOT-EXISTS (the hardest
    standard join shape): suppliers who were the ONLY late supplier on
    a multi-supplier finished order (late = shipped >90 days after the
    order date; the dataset has no commit/receipt dates, so lateness is
    date-arithmetic on the columns that exist). Re-expression: the two
    correlated subqueries collapse to per-order aggregates — n_supp and
    n_late over the per-(order, supplier) late flag — joined back to
    the flag table; EXISTS ⇔ n_supp > 1, NOT EXISTS ⇔ n_late = 1.
    Only (order, supplier, flag) partials and O(orders) aggregate rows
    shuffle; raw lineitem never re-shuffles after the first join."""
    import datetime as _dt

    import pyarrow.dataset as pds
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"],
                             filter=pds.field("o_orderstatus") == "F")
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def late_flag(batch: pa.Table) -> pa.Table:
        cutoff = pc.add(batch["o_orderdate"],
                        pa.scalar(_dt.timedelta(days=90)))
        late = pc.cast(pc.greater(batch["l_shipdate"], cutoff), pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"], "late": late})

    f = reduce_sink(j.map_batches(late_flag, batch_format="pyarrow"),
                    ["l_orderkey", "l_suppkey"], {"late": ("late", "max")})
    per_order = reduce_sink(f, ["l_orderkey"],
                            {"n_supp": ("late", "size"),
                             "n_late": ("late", "sum")})
    fo = f.join(per_order, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("l_orderkey",))

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[(df["late"] == 1) & (df["n_supp"] > 1)
                  & (df["n_late"] == 1)]
        return keep[["l_suppkey"]]

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    named = (fo.map_batches(qualify, batch_format="pandas")
             .join(sup, join_type="inner", num_partitions=8,
                   on=("l_suppkey",), right_on=("s_suppkey",)))
    agg = reduce_sink(named, ["s_name"],
                      {"numwait": ("s_name", "size")}).to_pandas()
    return (agg.sort_values(["numwait", "s_name"],
                            ascending=[False, True], kind="mergesort")
            .head(20).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Completing the TPC-H 22 (Q3/5/6/10/14/17/18/21 live above). Where the
# fixture lacks a TPC-H column (no partsupp table, no l_commitdate /
# l_receiptdate / l_shipmode / c_phone / comments), the query keeps the
# ORIGINAL's distributed pattern over the columns that exist and the
# docstring says exactly what was adapted; the oracle runs the identical
# adapted SQL, so the correctness gate is unchanged.
# ---------------------------------------------------------------------------


@register("tpch_q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0,
             2) AS sum_base,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_disc_dm,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_charge_mu,
       ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
             / (100.0 * COUNT(*)), 6) AS avg_price,
       ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT))
             / (100.0 * COUNT(*)), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06'
GROUP BY l_returnflag, l_linestatus""")
def tpch_q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 (pricing summary): ONE pruned scan, every aggregate a
    per-batch integer partial (cents for base price/discount, exact
    decimal grids deci-milli for disc price and micro for charge — the
    3-factor product has 6 decimal digits, so the scaled value is
    integral and rint can never sit on a .5 boundary), and the three
    averages are ONE float division each over the exact sums — the
    classic partial+final aggregate at its widest (8 measures, one
    shuffle of |flags×status| partial rows per block)."""
    import datetime as _dt

    import pyarrow.dataset as pds

    def measures(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        t = df["l_tax"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty": df["l_quantity"].to_numpy(np.float64),
            "base_c": np.rint(p * 100).astype(np.int64),
            "disc_dm": np.rint(p * (1 - d) * 10000).astype(np.int64),
            "charge_mu": np.rint(p * (1 - d) * (1 + t)
                                 * 1000000).astype(np.int64),
            "disc_c": np.rint(d * 100).astype(np.int64)})

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        filter=(pds.field("l_shipdate")
                <= _dt.datetime(2001, 8, 6)))
    agg = reduce_sink(ds.map_batches(measures, batch_format="pandas"),
                      ["l_returnflag", "l_linestatus"],
                      {"sum_qty": ("qty", "sum"),
                       "base_c": ("base_c", "sum"),
                       "sum_disc_dm": ("disc_dm", "sum"),
                       "sum_charge_mu": ("charge_mu", "sum"),
                       "disc_c": ("disc_c", "sum"),
                       "count_order": ("qty", "size")}).to_pandas()
    n = agg["count_order"].to_numpy(np.float64)
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "l_linestatus": agg["l_linestatus"],
        "sum_qty": agg["sum_qty"].round(2),
        "sum_base": (agg["base_c"].to_numpy(np.int64) / 100.0).round(2),
        "sum_disc_dm": agg["sum_disc_dm"].astype(np.int64),
        "sum_charge_mu": agg["sum_charge_mu"].astype(np.int64),
        "avg_qty": textstats.round_half_away(
            agg["sum_qty"].to_numpy(np.float64) / n, 6),
        "avg_price": textstats.round_half_away(
            agg["base_c"].to_numpy(np.int64) / (100.0 * n), 6),
        "avg_disc": textstats.round_half_away(
            agg["disc_c"].to_numpy(np.int64) / (100.0 * n), 6),
        "count_order": agg["count_order"].astype(np.int64)})
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


@register("tpch_q4_priority_check", sql="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""")
def tpch_q4_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 (order priority checking). Adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped more than 60 days
    after o_orderdate — the EXISTS decorrelation is identical: the
    quarter's orders join lineitem once, the per-order MAX(late) flag
    reduces the fact to |orders| rows, and only (priority, count)
    partials reach the driver. Priority rides the per-order reduce as
    an extra key so no second join back to orders is needed."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1997, 4, 1))))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def late_flag(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["l_shipdate"].to_numpy("datetime64[ns]")
                > df["o_orderdate"].to_numpy("datetime64[ns]")
                + np.timedelta64(60, "D")).astype(np.int64)
        # the join coalesces the right key into l_orderkey (Ray 2.49)
        return pd.DataFrame({"l_orderkey": df["l_orderkey"],
                             "o_orderpriority": df["o_orderpriority"],
                             "late": late})

    per_order = reduce_sink(
        j.map_batches(late_flag, batch_format="pandas"),
        ["l_orderkey", "o_orderpriority"], {"late": ("late", "max")})
    hit = per_order.filter(expr="late == 1")
    agg = reduce_sink(hit, ["o_orderpriority"],
                      {"order_count": ("late", "size")}).to_pandas()
    agg["order_count"] = agg["order_count"].astype(np.int64)
    return agg.sort_values("o_orderpriority", ignore_index=True)


@register("tpch_q12_ship_class", sql="""
SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY
            THEN 'slow' ELSE 'fast' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1""")
def tpch_q12_ship_class(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 (shipping modes / priority). Adapted: no l_shipmode or
    receipt/commit dates in the fixture, so lines class as fast/slow by
    ship latency (>= 30 days after order) — the pattern is unchanged:
    year filter pushed into the lineitem scan, ONE join to orders, the
    high/low priority CASE counts reduce as two integer partials per
    (block, class)."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1))))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        slow = (df["l_shipdate"].to_numpy("datetime64[ns]")
                >= df["o_orderdate"].to_numpy("datetime64[ns]")
                + np.timedelta64(30, "D"))
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy()
        return pd.DataFrame({
            "ship_class": np.where(slow, "slow", "fast"),
            "high_line_count": high.astype(np.int64),
            "low_line_count": (~high).astype(np.int64)})

    agg = reduce_sink(j.map_batches(classify, batch_format="pandas"),
                      ["ship_class"],
                      {"high_line_count": ("high_line_count", "sum"),
                       "low_line_count": ("low_line_count", "sum")}) \
        .to_pandas()
    for c in ("high_line_count", "low_line_count"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("ship_class", ignore_index=True)


@register("tpch_q15_top_supplier", sql="""
WITH rev AS (SELECT l_suppkey,
                    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)) AS total_dm
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1997-04-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(total_dm AS BIGINT) AS total_revenue_dm
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_dm = (SELECT MAX(total_dm) FROM rev)
ORDER BY s_suppkey""")
def tpch_q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 (top supplier = the revenue view + its global MAX):
    the quarter's revenue reduces to ONE integer partial per (block,
    suppkey); the view is |suppliers|-sized, its MAX comes back as one
    scalar via a streaming Dataset.max (no driver materialization of
    the view), and only the winner rows — ties included, hence the
    deterministic suppkey order — are collected and joined to the
    supplier dim driver-side."""
    import datetime as _dt

    import pyarrow.dataset as pds

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1997, 4, 1))))
    view = reduce_sink(li.map_batches(rev_dm, batch_format="pandas"),
                       ["l_suppkey"],
                       {"total_dm": ("rev_dm", "sum")}).materialize()
    best = view.max("total_dm")
    winners = view.filter(expr=f"total_dm == {best}").to_pandas()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue_dm"] = out["total_dm"].astype(np.int64)
    return out[["s_suppkey", "s_name", "total_revenue_dm"]] \
        .sort_values("s_suppkey", ignore_index=True)


@register("tpch_q7_nation_volume", sql="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev_dm) AS BIGINT) AS revenue_dm
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT) AS rev_dm
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01') shipping
GROUP BY supp_nation, cust_nation, l_year""")
def tpch_q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the 2-year ship
    window is pushed into the fact scan; orders and customer attach via
    auto_join (broadcast below the size limit, hash join above — the
    only shuffles a 6-table join needs); supplier→nation and the
    nation-name map are tiny broadcast dicts applied map-side, so the
    symmetric nation-pair predicate filters rows before any partials
    ship. Output partials are |2 pairs × years| rows per block."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk2nk_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_nationkey"].astype(int))))
    nk2name_ref = ray.put(nk2name)
    pair = {"NATION_1": "NATION_2", "NATION_2": "NATION_1"}

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1)))) \
        .map_batches(rev_dm, batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = auto_join(auto_join(li, orders, on="l_orderkey",
                            right_on="o_orderkey"),
                  cust, on="o_custkey", right_on="c_custkey")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        sk2nk = ray.get(sk2nk_ref)
        nknm = ray.get(nk2name_ref)
        sn = df["l_suppkey"].map(sk2nk).map(nknm)
        cn = df["c_nationkey"].map(nknm)
        keep = sn.map(pair).eq(cn)
        df = df[keep.fillna(False)]
        return pd.DataFrame({"supp_nation": sn[keep.fillna(False)],
                             "cust_nation": cn[keep.fillna(False)],
                             "l_year": df["l_year"].to_numpy(np.int64),
                             "rev_dm": df["rev_dm"].to_numpy(np.int64)})

    agg = reduce_sink(j.map_batches(classify, batch_format="pandas"),
                      ["supp_nation", "cust_nation", "l_year"],
                      {"revenue_dm": ("rev_dm", "sum")}).to_pandas()
    if "revenue_dm" not in agg.columns:
        # all-empty block sets lose their schema on to_pandas();
        # zero qualifying symmetric flows is a legal tiny-scale answer
        return pd.DataFrame(
            {"supp_nation": pd.Series([], dtype=object),
             "cust_nation": pd.Series([], dtype=object),
             "l_year": pd.Series([], dtype=np.int64),
             "revenue_dm": pd.Series([], dtype=np.int64)})
    agg["revenue_dm"] = agg["revenue_dm"].astype(np.int64)
    return agg.sort_values(["supp_nation", "cust_nation", "l_year"],
                           ignore_index=True)


@register("tpch_q8_market_share", sql="""
SELECT l_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                           THEN rev_dm ELSE 0 END) AS DOUBLE)
             / SUM(rev_dm), 6) AS mkt_share
FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS l_year,
             n1.n_name AS supp_nation,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT) AS rev_dm
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
GROUP BY l_year""")
def tpch_q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 (national market share within a region, 8 tables): the
    PROMO partkey set and supplier→nation map broadcast once and prune
    the fact map-side; orders (date window pushed into its scan) and
    customer attach via auto_join; the ASIA nation set filters
    customers map-side. Both numerator and denominator reduce in ONE
    pass as (year, nation_dm, total_dm) integer partials; the share is
    one float division per year on the driver, written identically in
    the oracle."""
    import datetime as _dt

    import pyarrow.dataset as pds

    from webalizer_ray.stages.join import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia_nk = set(nat.merge(reg[reg["r_name"] == "ASIA"],
                            left_on="n_regionkey",
                            right_on="r_regionkey")["n_nationkey"]
                  .astype(int))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sk2name = {int(s): nk2name[int(n)]
               for s, n in zip(sup["s_suppkey"], sup["s_nationkey"])}
    promo = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filters=[("p_type", "==", "PROMO")]).to_pandas()
    promo_ref = ray.put(set(promo["p_partkey"].astype(int)))
    sk2name_ref = ray.put(sk2name)
    asia_ref = ray.put(asia_nk)

    def rev_dm(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_partkey"].isin(ray.get(promo_ref)).to_numpy()
        df = df[keep]
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "rev_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(rev_dm, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pds.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pds.field("o_orderdate") < _dt.datetime(1998, 1, 1))))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = auto_join(auto_join(li, orders, on="l_orderkey",
                            right_on="o_orderkey"),
                  cust, on="o_custkey", right_on="c_custkey")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["c_nationkey"].isin(ray.get(asia_ref)).to_numpy()
        df = df[keep]
        is_nat = df["l_suppkey"].map(ray.get(sk2name_ref)) \
            .eq("NATION_5").to_numpy()
        rev = df["rev_dm"].to_numpy(np.int64)
        return pd.DataFrame({
            "l_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            "nat_dm": np.where(is_nat, rev, 0),
            "tot_dm": rev})

    agg = reduce_sink(j.map_batches(split, batch_format="pandas"),
                      ["l_year"], {"nat_dm": ("nat_dm", "sum"),
                                   "tot_dm": ("tot_dm", "sum")}) \
        .to_pandas()
    return pd.DataFrame({
        "l_year": agg["l_year"].astype(np.int64),
        "mkt_share": textstats.round_half_away(
            agg["nat_dm"].to_numpy(np.float64)
            / agg["tot_dm"].to_numpy(np.float64), 6)}) \
        .sort_values("l_year", ignore_index=True)


@register("tpch_q9_nation_profit", sql="""
SELECT nation, o_year, CAST(SUM(amount_dm) AS BIGINT) AS profit_dm
FROM (SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)
             - CAST(ROUND(p_retailprice * 0.6 * 10000) AS BIGINT)
               * CAST(l_quantity AS BIGINT) AS amount_dm
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%') profit
GROUP BY nation, o_year""")
def tpch_q9_nation_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 (product-type profit by nation/year). Adapted: the
    fixture has no partsupp, so supply cost = 0.6 × p_retailprice —
    integerized PER UNIT then multiplied by the integral quantity, so
    both engines compute the identical integer amount. The 'red'
    partkey→unit-cost dict broadcasts once and prunes the fact
    map-side (profit needs the part attribute anyway, the classic
    map-side dimension join); orders attaches via auto_join for the
    year; supplier→nation-name is a broadcast dict; (nation, year)
    integer partials are all that shuffle."""
    from webalizer_ray.stages.join import auto_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"]).to_pandas()
    red = part[part["p_name"].str.contains("red")] \
        .sort_values("p_partkey")
    cost_dm = np.rint(red["p_retailprice"].to_numpy(np.float64)
                      * 0.6 * 10000).astype(np.int64)
    pk2cost_ref = ray.put((red["p_partkey"].to_numpy(np.int64),
                           cost_dm))
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    sk2name_ref = ray.put((
        sup["s_suppkey"].to_numpy(np.int64),
        np.array([nk2name[int(n)] for n in sup["s_nationkey"]],
                 dtype=object)))

    def amount(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized map-side dimension joins: one searchsorted per
        # batch, no per-element Python dict hops (VERDICT r2 minor)
        pkeys, pcosts = ray.get(pk2cost_ref)
        hit, unit = np_lookup(pkeys, pcosts,
                              df["l_partkey"].to_numpy(np.int64))
        df = df[hit]
        unit = unit[hit]
        skeys, snames = ray.get(sk2name_ref)
        _, nation = np_lookup(skeys, snames,
                              df["l_suppkey"].to_numpy(np.int64))
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "nation": nation,
            "amount_dm": np.rint(p * (1 - d) * 10000).astype(np.int64)
            - unit * q})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(amount, batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def add_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": df["nation"],
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            "amount_dm": df["amount_dm"].to_numpy(np.int64)})

    agg = reduce_sink(j.map_batches(add_year, batch_format="pandas"),
                      ["nation", "o_year"],
                      {"profit_dm": ("amount_dm", "sum")}).to_pandas()
    agg["profit_dm"] = agg["profit_dm"].astype(np.int64)
    return agg.sort_values(["nation", "o_year"], ignore_index=True)


@register("tpch_q11_important_parts", sql="""
WITH val AS (SELECT l_partkey,
                    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS value_c
             FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name = 'NATION_3'
             GROUP BY l_partkey)
SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
FROM val WHERE value_c > (SELECT SUM(value_c) * 0.001 FROM val)""")
def tpch_q11_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 (important stock: HAVING against a GLOBAL aggregate).
    Adapted: no partsupp, so a part's "inventory value" is its shipped
    extendedprice (exact cents) from NATION_3's suppliers — the
    pattern is intact: the nation's supplier set broadcasts and
    filters the fact map-side, the per-part view reduces once and is
    materialized, its global total comes back as ONE streaming scalar,
    and the threshold filter runs distributed over the view (the view
    is |parts|-sized and never gathers to the driver before the
    filter)."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == "NATION_3", "n_nationkey"]
             .iloc[0])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    keep_ref = ray.put(set(
        sup.loc[sup["s_nationkey"] == nk, "s_suppkey"].astype(int)))

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_suppkey"].isin(ray.get(keep_ref))]
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(cents, batch_format="pandas")
    view = reduce_sink(li, ["l_partkey"],
                       {"value_c": ("c", "sum")}).materialize()
    thresh = view.sum("value_c") * 0.001
    out = view.filter(expr=f"value_c > {thresh!r}").to_pandas()
    out["value_c"] = out["value_c"].astype(np.int64)
    return out.sort_values("l_partkey", ignore_index=True)


@register("tpch_q13_order_distribution", sql="""
WITH co AS (SELECT o_custkey, COUNT(*) AS c_count FROM orders
            WHERE o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY o_custkey)
SELECT CAST(COALESCE(c_count, 0) AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN co ON c_custkey = o_custkey
GROUP BY 1""")
def tpch_q13_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 (customer order-count distribution). Adapted: the
    comment NOT LIKE filter becomes priority <> '4-NOT SPECIFIED'.
    The LEFT JOIN's only job is the zero bucket, so it never runs:
    per-customer counts reduce (|customers| rows max), the histogram
    is a second O(distinct counts) reduce, and the c_count=0 row is
    total customers (a parquet-metadata count, zero data bytes) minus
    the customers the histogram covered — exact, join-free."""
    import pyarrow.dataset as pds

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pds.field("o_orderpriority") != "4-NOT SPECIFIED")
    co = reduce_sink(orders, ["o_custkey"],
                     {"c_count": ("o_custkey", "size")})
    hist = reduce_sink(co, ["c_count"],
                       {"custdist": ("c_count", "size")}).to_pandas()
    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    zero = n_cust - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame({"c_count": [0],
                                              "custdist": [zero]})],
                         ignore_index=True)
    for c in ("c_count", "custdist"):
        hist[c] = hist[c].astype(np.int64)
    return hist.sort_values("c_count", ignore_index=True)


@register("tpch_q16_supplier_cnt", sql="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
def tpch_q16_supplier_cnt(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 (supplier count by part attributes). Adapted: the
    part–supplier relation comes from lineitem (no partsupp) and the
    complaint-comment exclusion becomes s_acctbal < 0. The qualifying
    partkey→(brand, type, size) map and the excluded-supplier set
    broadcast once and apply map-side; the COUNT(DISTINCT) is the
    two-phase exact distinct (per-batch dedup, then each (group,
    suppkey) pair counted in exactly one bucket) — the same machinery
    as A10, never a driver set."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"]).to_pandas()
    ok = part[(part["p_brand"] != "Brand#1") & (part["p_type"] != "PROMO")
              & part["p_size"].isin(range(1, 9))]
    attr_ref = ray.put({int(k): (b, t, int(s)) for k, b, t, s in
                        zip(ok["p_partkey"], ok["p_brand"],
                            ok["p_type"], ok["p_size"])})
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad_ref = ray.put(set(
        sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].astype(int)))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        attrs = df["l_partkey"].map(ray.get(attr_ref))
        keep = attrs.notna() & ~df["l_suppkey"].isin(ray.get(bad_ref))
        attrs = attrs[keep]
        return pd.DataFrame({
            "p_brand": attrs.str[0].to_numpy(object),
            "p_type": attrs.str[1].to_numpy(object),
            "p_size": attrs.str[2].to_numpy(np.int64),
            "l_suppkey": df.loc[keep, "l_suppkey"]
            .to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"]) \
        .map_batches(attach, batch_format="pandas")
    out = distinct_count(li, ["p_brand", "p_type", "p_size"],
                         "l_suppkey", alias="supplier_cnt").to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort",
        ignore_index=True)


@register("tpch_q19_disjunctive_revenue", sql="""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_dm
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""")
def tpch_q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 (three OR'd brand/size/quantity branches — the
    disjunctive-predicate pattern no single pushed filter expresses):
    the three brands' partkey→(brand, size) map broadcasts once; each
    branch evaluates as a vectorized mask inside map_batches and the
    disjunction keeps a row if ANY branch holds; revenue reduces to
    ONE scalar partial per block. Adapted: container/shipmode columns
    don't exist, brand/size/qty carry the three-branch shape."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand",
                                  "p_size"]).to_pandas()
    sel = part[part["p_brand"].isin(["Brand#1", "Brand#2", "Brand#3"])]
    attr_ref = ray.put({int(k): (b, int(s)) for k, b, s in
                        zip(sel["p_partkey"], sel["p_brand"],
                            sel["p_size"])})
    branches = [("Brand#1", 5, 1, 11), ("Brand#2", 10, 10, 20),
                ("Brand#3", 15, 20, 30)]

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        attrs = df["l_partkey"].map(ray.get(attr_ref))
        df = df[attrs.notna()]
        attrs = attrs.dropna()
        brand = attrs.str[0].to_numpy(object)
        size = attrs.str[1].to_numpy(np.int64)
        q = df["l_quantity"].to_numpy(np.float64)
        keep = np.zeros(len(df), dtype=bool)
        for b, smax, qlo, qhi in branches:
            keep |= ((brand == b) & (size >= 1) & (size <= smax)
                     & (q >= qlo) & (q <= qhi))
        p = df.loc[keep, "l_extendedprice"].to_numpy(np.float64)
        d = df.loc[keep, "l_discount"].to_numpy(np.float64)
        dm = np.rint(p * (1 - d) * 10000).astype(np.int64)
        return pd.DataFrame({"rev_dm": [int(dm.sum())]})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(rev, batch_format="pandas")
    return pd.DataFrame({"revenue_dm":
                         np.array([li.sum("rev_dm")], dtype=np.int64)})


@register("tpch_q20_heavy_shippers", sql="""
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7' AND s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 30)
ORDER BY s_suppkey""")
def tpch_q20_heavy_shippers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 (nested IN over a grouped HAVING aggregate). Adapted:
    no partsupp/availqty, so a supplier qualifies by shipping > 30
    units of some 'red' part in 1997 — the shape is intact: the date
    window is pushed into the fact scan, the red partkey set broadcasts
    and prunes map-side, quantities reduce per (supplier, part) as
    exact integral-float partials, the HAVING filter runs distributed,
    and only the qualifying supplier KEYS (≤ |suppliers| rows) reach
    the driver for the final nation semi-join."""
    import pyarrow.dataset as pds

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    red_ref = ray.put(set(
        part.loc[part["p_name"].str.contains("red"), "p_partkey"]
        .astype(int)))
    import datetime as _dt

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(ray.get(red_ref))]
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "qty": df["l_quantity"].to_numpy(np.float64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=((pds.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pds.field("l_shipdate") < _dt.datetime(1998, 1, 1)))) \
        .map_batches(prune, batch_format="pandas")
    per_ps = reduce_sink(li, ["l_suppkey", "l_partkey"],
                         {"qty": ("qty", "sum")})
    heavy = per_ps.filter(expr="qty > 30") \
        .select_columns(["l_suppkey"]).to_pandas()
    keys = set(heavy["l_suppkey"].astype(int))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name",
                                 "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == "NATION_7", "n_nationkey"]
             .iloc[0])
    out = sup[(sup["s_nationkey"] == nk)
              & sup["s_suppkey"].isin(keys)]
    return out[["s_suppkey", "s_name"]] \
        .sort_values("s_suppkey", ignore_index=True)
