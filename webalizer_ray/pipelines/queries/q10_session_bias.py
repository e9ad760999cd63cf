"""Driver-contract queries (chunk 10/18).
Sections:
  - sessions never span user-hash buckets, so sessionize AND
  - Multiple-testing control over the hour-of-week purchase-rate family
  - Active-day streak survival: continuation hazards + sBG heterogeneity fit
  - Spatial autocorrelation on the clock: Moran's I / Geary's C over the
  - Ratio-metric inference under user-level clustering (delta method)
  - Group-fairness audit of a threshold rule across market segments
  - External cluster validity: V-measure + Fowlkes–Mallows on the
  - Chance-corrected agreement beyond Cohen: Gwet's AC1 + Krippendorff's α
  - Long-memory cross-checks: DFA and aggregated-variance Hurst on the
  - Closed-form lexical-richness panel per source (Honoré/Sichel +
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
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _NS_SQL,
    _bm25_topk,
    _sessionized_events,
)
from webalizer_ray.pipelines.queries.q02_relational_media import (  # noqa: F401
    centroid_confusion,
)
from webalizer_ray.pipelines.queries.q07_fits_audits import (  # noqa: F401
    _source_word_counts,
)
from webalizer_ray.pipelines.queries.q09_nonparam_tests import (  # noqa: F401
    _SESS_HIST_SQL,
    _VCP_SQL,
    _session_size_hist_pd,
)



@register("bullwhip_qty_ratio", sql="""
WITH j AS (SELECT CAST(l.l_quantity AS BIGINT) AS q,
                  strftime(o.o_orderdate, '%Y-%m') AS om,
                  strftime(l.l_shipdate, '%Y-%m') AS sm
           FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
months AS (SELECT om AS m FROM j UNION SELECT sm FROM j),
od AS (SELECT months.m,
              CAST(COALESCE(SUM(CASE WHEN j.om = months.m
                                     THEN j.q END), 0) AS BIGINT)
                  AS oq,
              CAST(COALESCE(SUM(CASE WHEN j.sm = months.m
                                     THEN j.q END), 0) AS BIGINT)
                  AS sq
       FROM months LEFT JOIN j
            ON j.om = months.m OR j.sm = months.m
       GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(oq) AS BIGINT) AS so,
             CAST(SUM(CAST(oq AS HUGEINT) * oq) AS HUGEINT) AS soo,
             CAST(SUM(sq) AS BIGINT) AS ss,
             CAST(SUM(CAST(sq AS HUGEINT) * sq) AS HUGEINT) AS sss
      FROM od),
f AS (SELECT n,
             SQRT(CAST(n * soo - CAST(so AS HUGEINT) * so
                       AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
             / (CAST(so AS DOUBLE) / n) AS cov_o,
             SQRT(CAST(n * sss - CAST(ss AS HUGEINT) * ss
                       AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
             / (CAST(ss AS DOUBLE) / n) AS cov_s
      FROM s)
SELECT n AS n_months,
       ROUND(cov_o, 6) AS cov_ordered,
       ROUND(cov_s, 6) AS cov_shipped,
       ROUND(cov_s / cov_o, 6) AS bullwhip_ratio,
       CAST(CASE WHEN cov_s / cov_o > 1.0 THEN 1 ELSE 0 END
            AS BIGINT) AS amplifying
FROM f""")
def bullwhip_qty_ratio(sf_dir: str) -> pd.DataFrame:
    """Bullwhip ratio across the order→ship echelon: coefficient of
    variation of monthly SHIPPED quantity over CoV of monthly
    ORDERED quantity (same lineitems, keyed by ship date vs order
    date). Ratio > 1 is the bullwhip signature — fulfillment
    batches and backlog-flushes AMPLIFY demand variability
    upstream, so the warehouse experiences wilder swings than
    customers actually produced and safety stock computed from
    order variance will understock; < 1 means shipping smooths
    (level-loading works). Both monthly series share one month
    grid (union of order and ship months, zero-filled) so the CoVs
    are comparable; quantities are exact integers, so both
    variances ride exact 128-bit sums into one shared float
    cascade."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity",
                                  "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        om = df["o_orderdate"].dt.strftime("%Y-%m")
        sm = df["l_shipdate"].dt.strftime("%Y-%m")
        a = pd.DataFrame({"m": om, "oq": q, "sq": 0})
        b = pd.DataFrame({"m": sm, "oq": 0, "sq": q})
        return pd.concat([a, b], ignore_index=True) \
            .groupby("m", as_index=False).sum()

    od = reduce_sink(j.map_batches(partial, batch_format="pandas"),
                     ["m"], {"oq": ("oq", "sum"),
                             "sq": ("sq", "sum")}).to_pandas() \
        .sort_values("m", ignore_index=True)
    oq = od["oq"].to_numpy(np.int64).astype(object)
    sq = od["sq"].to_numpy(np.int64).astype(object)
    n = len(od)
    so, soo = int(oq.sum()), int((oq * oq).sum())
    ss, sss = int(sq.sum()), int((sq * sq).sum())
    cov_o = np.sqrt(float(n * soo - so * so)
                    / (float(n) * (n - 1))) / (float(so) / n)
    cov_s = np.sqrt(float(n * sss - ss * ss)
                    / (float(n) * (n - 1))) / (float(ss) / n)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_months": np.array([n], np.int64),
        "cov_ordered": [float(rha(cov_o, 6))],
        "cov_shipped": [float(rha(cov_s, 6))],
        "bullwhip_ratio": [float(rha(cov_s / cov_o, 6))],
        "amplifying": np.array([1 if cov_s / cov_o > 1.0 else 0],
                               np.int64)})


@register("inspection_paradox_gaps", sql="""
WITH o AS (SELECT user_id,
                  (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                  // 1000000 AS g
           FROM events),
c AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM o WHERE g >= 1 GROUP BY g),
s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(g * cnt) AS HUGEINT) AS s1,
             CAST(SUM(CAST(g AS HUGEINT) * g * cnt) AS HUGEINT)
                 AS s2
      FROM c)
SELECT n AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_gap_s,
       ROUND(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
           AS length_biased_mean_s,
       ROUND(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
           AS inspection_ratio,
       ROUND(CAST(s2 AS DOUBLE) / (2.0 * CAST(s1 AS DOUBLE)), 6)
           AS mean_residual_s
FROM s""")
def inspection_paradox_gaps(sf_dir: str) -> pd.DataFrame:
    """The inspection paradox on user think-time gaps: the gap a
    RANDOM MOMENT falls into has mean E[G²]/E[G] (length-biased),
    not E[G] — and the ratio between them is exactly 1 + CV². This
    is why "probe a random user, measure their current idle
    stretch" wildly overestimates typical idle time, why a
    randomly-timed health check lands in the long tail, and
    mean_residual = E[G²]/2E[G] is the expected wait until the
    user's NEXT event as seen by a random observer — the number a
    preemptive cache-warmer or connection-pool reaper should key
    on instead of the naive mean/2 (equal only for constant gaps).
    All three derived quantities are ratios of the same exact
    128-bit sums ΣG, ΣG² off the shared (gap, count) contingency
    (g ≥ 1 convention shared with the AD/Weibull family)."""
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
        ["g"], {"cnt": ("cnt", "sum")}).to_pandas()
    gv = c["g"].to_numpy(np.int64).astype(object)
    cnt = c["cnt"].to_numpy(np.int64).astype(object)
    n = int(cnt.sum())
    s1 = int((gv * cnt).sum())
    s2 = int((gv * gv * cnt).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "mean_gap_s": [float(rha(float(s1) / n, 6))],
        "length_biased_mean_s": [float(rha(float(s2) / float(s1),
                                           6))],
        "inspection_ratio": [float(rha(
            float(n) * float(s2) / (float(s1) * float(s1)), 6))],
        "mean_residual_s": [float(rha(
            float(s2) / (2.0 * float(s1)), 6))]})


@register("event_size_biased_sessions", sql=f"""
WITH {_SESS_HIST_SQL},
s2 AS (SELECT CAST(SUM(c) AS BIGINT) AS ns,
              CAST(SUM(k * c) AS HUGEINT) AS s1,
              CAST(SUM(CAST(k AS HUGEINT) * k * c) AS HUGEINT) AS sq,
              CAST(SUM(CASE WHEN k >= 10 THEN k * c ELSE 0 END)
                   AS HUGEINT) AS big
       FROM h)
SELECT ns AS n_sessions,
       ROUND(CAST(s1 AS DOUBLE) / ns, 6) AS mean_session_events,
       ROUND(CAST(sq AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
           AS event_weighted_mean,
       ROUND(CAST(sq AS DOUBLE) * ns
             / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
           AS size_bias_ratio,
       ROUND(CAST(big AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
           AS event_share_in_10plus
FROM s2""")
def event_size_biased_sessions(sf_dir: str) -> pd.DataFrame:
    """Size-biased session sampling: the session a RANDOM EVENT
    belongs to has mean length Σk²c/Σkc — not the session-average
    Σkc/Σc — and their ratio is the size-bias factor. This is the
    event-grain twin of the gap inspection paradox and the
    concrete correction for every "sample events, study their
    sessions" methodology: an event-sampled UX study oversamples
    marathon sessions by exactly this factor, and
    event_share_in_10plus (the fraction of all EVENTS living in
    10+-event sessions) is the per-event cost view the
    session-count histogram understates — 3% of sessions can carry
    40% of load. Exact 128-bit integer sums off the shared
    sessionizer's (k, sessions) histogram; one shared float ratio
    per column."""
    h = _session_size_hist_pd(sf_dir)
    k = h["k"].to_numpy(np.int64).astype(object)
    c = h["c"].to_numpy(np.int64).astype(object)
    ns = int(c.sum())
    s1 = int((k * c).sum())
    sq = int((k * k * c).sum())
    big = int((k * c)[k >= 10].sum()) if (k >= 10).any() else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_sessions": np.array([ns], np.int64),
        "mean_session_events": [float(rha(float(s1) / ns, 6))],
        "event_weighted_mean": [float(rha(float(sq) / float(s1),
                                          6))],
        "size_bias_ratio": [float(rha(
            float(sq) * ns / (float(s1) * float(s1)), 6))],
        "event_share_in_10plus": [float(rha(
            float(big) / float(s1), 6))]})


@register("session_pacing_by_depth", sql=f"""
WITH sid AS (SELECT user_id, ts, event_id,
                    SUM(ns) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
             FROM ({_NS_SQL})),
wk AS (SELECT user_id, sid, ts, event_id,
              COUNT(*) OVER (PARTITION BY user_id, sid) AS k,
              (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, sid
                   ORDER BY ts, event_id))) // 1000000 AS g
       FROM sid),
b AS (SELECT CASE WHEN k BETWEEN 2 AND 4 THEN '2-4'
                  WHEN k BETWEEN 5 AND 9 THEN '5-9'
                  ELSE '10+' END AS depth_band, g
      FROM wk WHERE g IS NOT NULL),
s AS (SELECT depth_band, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS HUGEINT) AS s1,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS s2
      FROM b GROUP BY 1)
SELECT depth_band, n AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_gap_s,
       ROUND(CASE WHEN n > 1 AND s1 > 0
                  THEN SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)
                            / (CAST(n AS DOUBLE) * (n - 1)))
                       / (CAST(s1 AS DOUBLE) / n)
                  ELSE 0 END, 6) AS gap_cv
FROM s ORDER BY 1""")
def session_pacing_by_depth(sf_dir: str) -> pd.DataFrame:
    """Intra-session pacing by engagement depth: within-session
    think-time gaps banded by the session's SIZE (2-4, 5-9, 10+
    events) — mean gap and its coefficient of variation per band.
    The duration and size histograms describe sessions from
    outside; pacing describes the rhythm inside — if deep sessions
    run STEADIER (low CV: absorbed users click metronomically)
    then per-session prefetch can commit after a few events, while
    a high 10+ band CV means marathon sessions alternate bursts
    and stalls and connection keep-alives must carry the idle
    spans. Gaps form inside the shared bucket-hash sessionizer
    (never span buckets), band is a pure function of the session's
    own size, and only (band, n, ΣG, ΣG²) exact 128-bit partials
    leave the cluster."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        # sessions never span user-hash buckets, so sessionize AND
        # extract within-session gaps inside ONE group pass — a
        # later map_batches could split a session across batches
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        same_user = np.zeros(len(g), bool)
        same_user[1:] = uid[1:] == uid[:-1]
        gap_all = (us - np.roll(us, 1)) // 1_000_000
        ns = (~same_user) | (gap_all * 1_000_000
                             >= 1_800_000_000)
        sid = np.cumsum(ns)
        same_sess = np.zeros(len(g), bool)
        same_sess[1:] = sid[1:] == sid[:-1]
        k = pd.Series(sid).groupby(sid, sort=False) \
            .transform("size").to_numpy(np.int64)
        gv = gap_all[same_sess].astype(object)
        kv = k[same_sess]
        band = np.where(kv <= 4, "2-4",
                        np.where(kv <= 9, "5-9", "10+"))
        df = pd.DataFrame({"depth_band": band, "g": gv})
        out = df.groupby("depth_band").agg(
            n=("g", "size"),
            s1=("g", lambda v: int(np.asarray(v, object).sum())),
            s2=("g", lambda v: int((np.asarray(v, object) ** 2)
                                   .sum()))).reset_index()
        return out.astype({"n": np.int64})

    s = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["depth_band"], {"n": ("n", "sum"), "s1": ("s1", "sum"),
                         "s2": ("s2", "sum")}).to_pandas() \
        .sort_values("depth_band", ignore_index=True)
    rha = textstats.round_half_away
    rows = []
    for _, r in s.iterrows():
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        mean = float(s1) / n
        cv = np.sqrt(float(n * s2 - s1 * s1)
                     / (float(n) * (n - 1))) / (float(s1) / n) \
            if n > 1 and s1 > 0 else 0.0
        rows.append((r["depth_band"], n, float(rha(mean, 6)),
                     float(rha(cv, 6))))
    return pd.DataFrame(rows, columns=["depth_band", "n_gaps",
                                       "mean_gap_s", "gap_cv"]) \
        .astype({"n_gaps": np.int64})


@register("vocab_novelty_curve", sql=r"""
WITH ids AS (SELECT doc_id,
                    CAST(ROW_NUMBER() OVER (ORDER BY doc_id)
                         AS BIGINT) AS r,
                    CAST(COUNT(*) OVER () AS BIGINT) AS nd
             FROM documents),
w AS (SELECT d.doc_id,
             unnest(regexp_extract_all(d.text, '\S+')) AS word
      FROM documents d),
fw AS (SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY 1),
bd AS (SELECT fw.word, (10 * (ids.r - 1)) // ids.nd AS decile
       FROM fw JOIN ids ON fw.first_doc = ids.doc_id),
nv AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_words
       FROM bd GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM fw)
SELECT CAST(decile AS BIGINT) AS decile, new_words,
       ROUND(CAST(new_words AS DOUBLE) / tot.v, 6) AS novelty_share,
       ROUND(CAST(SUM(new_words) OVER (ORDER BY decile) AS DOUBLE)
             / tot.v, 6) AS cum_vocab_share
FROM nv CROSS JOIN tot ORDER BY 1""")
def vocab_novelty_curve(sf_dir: str) -> pd.DataFrame:
    """Crawl-saturation curve: how much NEW vocabulary each
    successive decile of the corpus (in doc_id ingestion order)
    contributes — the empirical derivative of Heaps' law the
    fitted exponent only summarizes. A last-decile novelty share
    still near the first decile's means the crawl frontier is
    nowhere near exhausted (keep crawling); a collapsing tail says
    additional ingestion buys boilerplate, and the elbow is the
    budget cut point — the per-SOURCE Chao1/Good–Turing entries
    estimate what's missing, this shows the marginal return
    actually realized. Each word's first doc reduces associatively
    (MIN per word), deciles come from the doc-rank (10(r−1))//n_d
    convention on both engines, and only (word, min_doc) then
    (decile, count) partials shuffle — vocabulary-bounded."""
    ids = np.sort(_docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"]
                  .to_numpy(np.int64))
    nd = len(ids)

    def wmin(df: pd.DataFrame) -> pd.DataFrame:
        rows_w, rows_d = [], []
        for did, txt in zip(df["doc_id"], df["text"]):
            for w in set(txt.split()):
                rows_w.append(w)
                rows_d.append(did)
        return pd.DataFrame({"word": rows_w, "first_doc": rows_d}) \
            .groupby("word", as_index=False)["first_doc"].min()

    fw = reduce_sink(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(wmin, batch_format="pandas"),
        ["word"], {"first_doc": ("first_doc", "min")}).to_pandas()
    r = np.searchsorted(ids, fw["first_doc"].to_numpy(np.int64)) + 1
    dec = (10 * (r - 1)) // nd
    nv = pd.Series(dec).value_counts().sort_index()
    v = int(nv.sum())
    cum = nv.cumsum()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "decile": nv.index.to_numpy(np.int64),
        "new_words": nv.to_numpy(np.int64),
        "novelty_share": rha(nv.to_numpy(np.float64) / v, 6),
        "cum_vocab_share": rha(cum.to_numpy(np.float64) / v, 6)})


@register("matryoshka_prefix_recall", sql="""
WITH dims AS (SELECT UNNEST([8, 16, 32, 64]) AS d),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < 3),
full5 AS (SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY ROUND(list_cosine_similarity(q.qe,
                   CAST(e.embedding AS DOUBLE[])), 9) DESC,
                   e.vec_id) AS rank
    FROM q CROSS JOIN embeddings e) WHERE rank <= 5),
pre5 AS (SELECT d, query_id, vec_id FROM (
    SELECT dims.d, q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY dims.d, q.query_id
               ORDER BY ROUND(list_cosine_similarity(
                   q.qe[1:dims.d],
                   CAST(e.embedding AS DOUBLE[])[1:dims.d]), 9)
                   DESC, e.vec_id) AS rank
    FROM dims CROSS JOIN q CROSS JOIN embeddings e)
    WHERE rank <= 5),
hits AS (SELECT p.d, CAST(COUNT(*) AS BIGINT) AS hit
         FROM pre5 p JOIN full5 f
              ON p.query_id = f.query_id AND p.vec_id = f.vec_id
         GROUP BY 1),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q)
SELECT CAST(dims.d AS BIGINT) AS prefix_dim,
       COALESCE(hit, 0) AS hits,
       ROUND(CAST(COALESCE(hit, 0) AS DOUBLE) / (5.0 * nq.n), 6)
           AS recall_at_5
FROM dims LEFT JOIN hits ON dims.d = hits.d CROSS JOIN nq
ORDER BY 1""")
def matryoshka_prefix_recall(sf_dir: str) -> pd.DataFrame:
    """Matryoshka prefix-dimension recall curve: run the same
    brute-force cosine top-5 with only the first 8/16/32/64
    embedding dimensions and score recall@5 against the full-width
    answer. This is THE deployment decision for
    matryoshka-trained embeddings (and the honesty check for ones
    that aren't): if 16 of 64 dims already recall 0.9, the vector
    store can shrink 4× and the ANN distance loop speed up the
    same factor — the scale lever that matters more at 10⁹
    vectors than any index tuning. Reuses the registry's ANN
    conventions exactly (cosines rounded to 9 dp before ranking,
    ties by vec_id, same 3 probe queries), so the d = 64 row is a
    built-in self-test pinned at recall 1.0; prefix truncation is
    a zero-copy slice in the batch kernel and each dim level is
    one broadcast-matmul pass."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    nq = len(qids)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def topset(d: int) -> set:
        def trunc(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["embedding"] = df["embedding"].map(
                lambda v: np.asarray(v)[:d])
            return df

        out = ann.brute_force_topk(
            ds.map_batches(trunc, batch_format="pandas"),
            queries[:, :d], k=5)
        out["query_id"] = qids[out["query_id"].to_numpy()]
        return set(zip(out["query_id"], out["vec_id"]))

    full = topset(64)
    rha = textstats.round_half_away
    rows = []
    for d in (8, 16, 32, 64):
        hit = len(topset(d) & full)
        rows.append((d, hit, float(rha(hit / (5.0 * nq), 6))))
    return pd.DataFrame(rows, columns=["prefix_dim", "hits",
                                       "recall_at_5"]) \
        .astype({"prefix_dim": np.int64, "hits": np.int64})


@register("topk_intralist_diversity", sql="""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 3),
top5 AS (SELECT query_id, vec_id, emb FROM (
    SELECT q.query_id, e.vec_id,
           CAST(e.embedding AS DOUBLE[]) AS emb,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY ROUND(list_cosine_similarity(q.qe,
                   CAST(e.embedding AS DOUBLE[])), 9) DESC,
                   e.vec_id) AS rank
    FROM q CROSS JOIN embeddings e) WHERE rank <= 5),
pairs AS (SELECT a.query_id,
                 ROUND(list_cosine_similarity(a.emb, b.emb), 9)
                     AS s
          FROM top5 a JOIN top5 b
               ON a.query_id = b.query_id
              AND a.vec_id < b.vec_id)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(s), 6) AS mean_pairwise_cosine,
       ROUND(MAX(s), 6) AS max_pairwise_cosine
FROM pairs GROUP BY 1 ORDER BY 1""")
def topk_intralist_diversity(sf_dir: str) -> pd.DataFrame:
    """Intra-list diversity of the brute-force top-5: mean and max
    pairwise cosine AMONG each query's results. Recall measures
    whether the right neighbors are found; this measures whether
    they are five answers or one answer five times — the
    redundancy that the registry's MMR re-ranker exists to fix,
    quantified BEFORE anyone decides to pay MMR's extra pass
    (mean ≈ the query-result similarity itself means the list is a
    near-duplicate cluster; low mean means plain top-k is already
    diverse and MMR buys nothing). Same top-5 conventions as
    ann_topk (9 dp rounding, vec_id ties); the C(5,2) = 10 pair
    cosines per query are a driver-side postage stamp once the
    top-5 vectors come back from the broadcast-matmul pass."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtbl = tbl.filter(pc.less(tbl["vec_id"], 3))
    qids = np.asarray(qtbl["vec_id"])
    queries = np.stack(qtbl["embedding"].to_pandas().to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = ann.brute_force_topk(ds, queries, k=5)
    top["query_id"] = qids[top["query_id"].to_numpy()]
    emb = {int(v): np.asarray(e, np.float64)
           for v, e in zip(tbl["vec_id"].to_pandas(),
                           tbl["embedding"].to_pandas())
           if int(v) in set(top["vec_id"])}
    rha = textstats.round_half_away
    rows = []
    for qid, grp in top.groupby("query_id", sort=True):
        ids = sorted(grp["vec_id"].tolist())
        sims = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = emb[ids[i]], emb[ids[j]]
                s = float(np.dot(a, b)
                          / (np.linalg.norm(a)
                             * np.linalg.norm(b)))
                sims.append(round(s, 9))
        rows.append((int(qid), len(sims),
                     float(rha(sum(sims) / len(sims), 6)),
                     float(rha(max(sims), 6))))
    return pd.DataFrame(rows, columns=[
        "query_id", "n_pairs", "mean_pairwise_cosine",
        "max_pairwise_cosine"]).astype(
        {"query_id": np.int64, "n_pairs": np.int64})


@register("sttr_by_source", sql=r"""
WITH tok AS (SELECT doc_id, source,
                    unnest(regexp_extract_all(text, '\S+')) AS word,
                    unnest(range(1, len(regexp_extract_all(
                        text, '\S+')) + 1)) AS i
             FROM documents),
w AS (SELECT source, doc_id, (i - 1) // 25 AS win, word
      FROM tok),
ws AS (SELECT source, doc_id, win,
              CAST(COUNT(*) AS BIGINT) AS tokens,
              CAST(COUNT(DISTINCT word) AS BIGINT) AS types
       FROM w GROUP BY 1, 2, 3),
c AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(types) AS BIGINT) AS types_sum
      FROM ws WHERE tokens = 25 GROUP BY 1)
SELECT source, n_windows,
       ROUND(CAST(types_sum AS DOUBLE) / (25.0 * n_windows), 6)
           AS sttr
FROM c ORDER BY 1""")
def sttr_by_source(sf_dir: str) -> pd.DataFrame:
    """Standardized type-token ratio per source: mean TTR over
    consecutive complete 25-token windows (trailing remainder
    drops — documented; 25 fits this corpus's 10-99-token docs, the
    classic 100/1000 scale with the length bound). Raw TTR is
    worthless for comparing sources because it falls
    deterministically with length (Heaps), so a source of long
    docs always looks "poorer"; fixing the window size removes the
    confound entirely — THE richness number corpus linguists
    compare across corpora, and here the one that ranks feeds for
    training-mix diversity on equal footing. Per-window distinct
    counts are exact integers formed inside each doc's own batch
    (windows never span docs, docs never split), so STTR =
    Σtypes/(25·windows) is an exact integer ratio; only
    (source, windows, types) partials shuffle."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, txt in zip(df["source"], df["text"]):
            toks = txt.split()
            for w0 in range(0, len(toks) - len(toks) % 25, 25):
                rows.append((src, len(set(toks[w0:w0 + 25]))))
        out = pd.DataFrame(rows, columns=["source", "types"])
        if out.empty:
            return pd.DataFrame({
                "source": pd.Series([], dtype=str),
                "n_windows": pd.Series([], dtype=np.int64),
                "types_sum": pd.Series([], dtype=np.int64)})
        g = out.groupby("source").agg(
            n_windows=("types", "size"),
            types_sum=("types", "sum")).reset_index()
        return g.astype({"n_windows": np.int64,
                         "types_sum": np.int64})

    c = reduce_sink(
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pandas"),
        ["source"], {"n_windows": ("n_windows", "sum"),
                     "types_sum": ("types_sum", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "source": c["source"],
        "n_windows": c["n_windows"].astype(np.int64),
        "sttr": rha(c["types_sum"].to_numpy(np.float64)
                    / (25.0 * c["n_windows"].to_numpy(np.float64)),
                    6)})


@register("prf_expansion_terms", sql=r"""
WITH d AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS dl
           FROM documents),
n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id,
                    unnest(regexp_extract_all(text, '\S+')) AS term
             FROM documents)
       WHERE term IN ('table', 'hash', 'merge')
       GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             SUM(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * d.dl / n.avgdl)))
               AS score
      FROM tf JOIN df USING (term) JOIN d USING (doc_id)
      CROSS JOIN n
      GROUP BY tf.doc_id),
top AS (SELECT doc_id, score FROM s
        ORDER BY score DESC, doc_id LIMIT 10),
tot AS (SELECT SUM(score) AS z FROM top),
ft AS (SELECT t.doc_id,
              unnest(regexp_extract_all(doc.text, '\S+')) AS term
       FROM top t JOIN documents doc USING (doc_id)),
tl AS (SELECT ft.doc_id, ft.term, COUNT(*) AS tf,
              MIN(d.dl) AS dl
       FROM ft JOIN d USING (doc_id)
       WHERE ft.term NOT IN ('table', 'hash', 'merge')
       GROUP BY 1, 2),
wgt AS (SELECT tl.term,
               SUM((CAST(tl.tf AS DOUBLE) / tl.dl)
                   * (top.score / tot.z)) AS w
        FROM tl JOIN top USING (doc_id) CROSS JOIN tot
        GROUP BY 1)
SELECT term, ROUND(w, 6) AS rm1_weight
FROM wgt ORDER BY ROUND(w, 6) DESC, term LIMIT 10""")
def prf_expansion_terms(sf_dir: str) -> pd.DataFrame:
    """Pseudo-relevance feedback (RM1 relevance model) for the
    registry's standing probe query {table, hash, merge}: take the
    BM25 top-10 docs as pseudo-relevant, weight every OTHER term by
    Σ_d P(t|d)·P(d|q) with P(t|d) = tf/dl and P(d|q) the
    score-normalized BM25 posterior, emit the top-10 expansion
    terms. This is the classical query-expansion step between
    plain BM25 and the RRF hybrid already in the registry — the
    terms it surfaces are what a second-pass retrieval would add
    to fix vocabulary mismatch, and skew in this list (one doc
    dominating P(d|q)) is the known PRF failure mode worth
    monitoring. The first pass IS the existing two-pass BM25; the
    feedback pass touches exactly 10 documents fetched by id, so
    the expansion computation is a driver-side postage stamp;
    weights round to 6 dp BEFORE the final rank so ties break by
    term identically on both engines."""
    top = _bm25_topk(sf_dir, k=10)
    ids = top["doc_id"].tolist()
    scores = dict(zip(top["doc_id"], top["score"]))
    z = float(sum(scores.values()))
    import pyarrow.dataset as pds
    dt = pds.dataset(f"{sf_dir}/documents.parquet") \
        .to_table(columns=["doc_id", "text"],
                  filter=pds.field("doc_id").isin(ids)) \
        .to_pandas()
    qterms = {"table", "hash", "merge"}
    wgt: dict = {}
    for did, txt in zip(dt["doc_id"], dt["text"]):
        toks = txt.split()
        dl = len(toks)
        cnt = pd.Series(toks).value_counts()
        pq_d = scores[did] / z
        for term, tf in cnt.items():
            if term in qterms:
                continue
            wgt[term] = wgt.get(term, 0.0) \
                + (float(tf) / dl) * pq_d
    rha = textstats.round_half_away
    out = pd.DataFrame({"term": list(wgt),
                        "rm1_weight": [float(rha(v, 6))
                                       for v in wgt.values()]})
    return out.sort_values(["rm1_weight", "term"],
                           ascending=[False, True],
                           kind="mergesort").head(10) \
        .reset_index(drop=True)


@register("benford_second_order_orders", sql="""
WITH c AS (SELECT DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      AS cents
           FROM orders),
g AS (SELECT cents - LAG(cents) OVER (ORDER BY cents) AS gap
      FROM c),
d AS (SELECT CAST(SUBSTR(CAST(gap AS VARCHAR), 1, 1) AS BIGINT)
                 AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM g WHERE gap IS NOT NULL GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM d),
x AS (SELECT SUM(POWER(d.n - tot.nt * LOG10(1.0 + 1.0 / d.digit),
                       2)
                 / (tot.nt * LOG10(1.0 + 1.0 / d.digit))) AS chi2,
             MAX(tot.nt) AS nt
      FROM d CROSS JOIN tot)
SELECT nt AS n_gaps, ROUND(chi2, 6) AS chi2,
       CAST(CASE WHEN chi2 > 15.507313 THEN 1 ELSE 0 END AS BIGINT)
           AS benford2_rejected
FROM x""")
def benford_second_order_orders(sf_dir: str) -> pd.DataFrame:
    """Second-order Benford test on order totals: first digits of
    the gaps between consecutive SORTED distinct values, χ²
    against log₁₀(1+1/d) over digits 1-9 (5% point 15.507, 8 dof).
    The forensic escalation of the first/second-digit tests
    already in the registry — Nigrini's second-order test catches
    fabricated or post-processed data that PASSES first-order
    Benford (bootstrapped samples, rounded-then-jittered figures,
    currency-converted batches), because almost any genuine
    continuous process leaves near-Benford gap digits while
    re-rounded data collapses gaps onto few magnitudes. The key
    identity making it distributed-exact: in a sorted sample with
    ties, every nonzero difference is a consecutive DISTINCT-value
    gap exactly once — so the whole test rides the distinct-cents
    histogram (one exact reduce), gaps are integers, and the first
    digit extracts by string (no float log in the binning)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cents": np.unique(np.rint(
                df["o_totalprice"].to_numpy(np.float64) * 100)
                .astype(np.int64))})

    c = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"cents2": ("cents", "size")}).to_pandas() \
        .sort_values("cents", ignore_index=True)
    v = c["cents"].to_numpy(np.int64)
    gaps = (v[1:] - v[:-1])
    digit = np.array([int(str(int(g))[0]) for g in gaps], np.int64)
    nt = len(digit)
    chi2 = 0.0
    for dd in range(1, 10):
        n_d = int((digit == dd).sum())
        e = nt * np.log10(1.0 + 1.0 / dd)
        chi2 += (n_d - e) ** 2 / e
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([nt], np.int64),
        "chi2": [float(rha(chi2, 6))],
        "benford2_rejected": np.array(
            [1 if chi2 > 15.507313 else 0], np.int64)})


@register("value_heaping_audit", sql="""
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN cents % 100 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS dollar,
             CAST(SUM(CASE WHEN cents % 500 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS five,
             CAST(SUM(CASE WHEN cents % 1000 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS ten,
             CAST(SUM(CASE WHEN cents % 10000 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS hundred
      FROM c)
SELECT n AS n_orders,
       ROUND(CAST(dollar AS DOUBLE) / n, 6) AS share_whole_dollar,
       ROUND(CAST(five AS DOUBLE) / n, 6) AS share_5_dollar,
       ROUND(CAST(ten AS DOUBLE) / n, 6) AS share_10_dollar,
       ROUND(CAST(hundred AS DOUBLE) / n, 6) AS share_100_dollar,
       ROUND(CAST(dollar AS DOUBLE) / n / 0.01, 6)
           AS dollar_heaping_ratio,
       CAST(CASE WHEN CAST(dollar AS DOUBLE) / n > 0.02
                 THEN 1 ELSE 0 END AS BIGINT) AS heaping_flagged
FROM s""")
def value_heaping_audit(sf_dir: str) -> pd.DataFrame:
    """Value heaping audit on order totals: the share of amounts
    landing exactly on whole-dollar / $5 / $10 / $100 multiples,
    with the whole-dollar share expressed as a ratio to its 1%
    null expectation (cents uniform mod 100). The price-side twin
    of the timestamp-heaping audit: organic transaction amounts
    (quantity × unit price × (1−disc) × (1+tax)) almost never
    heap, so a dollar-heaping ratio ≫ 1 reveals manual entry,
    negotiated round-figure deals, or a rounding bug upstream —
    and WHICH multiple heaps (5 vs 10 vs 100) fingerprints the
    human habit vs the code path. A flag at 2% (2× null)
    separates noise from signal identically on both engines. Five
    exact integer counters off one pass; shares are the only
    floats."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "n": [len(cents)],
            "dollar": [int((cents % 100 == 0).sum())],
            "five": [int((cents % 500 == 0).sum())],
            "ten": [int((cents % 1000 == 0).sum())],
            "hundred": [int((cents % 10000 == 0).sum())]})

    s = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["k"], {c: (c, "sum") for c in
                ["n", "dollar", "five", "ten", "hundred"]}) \
        .to_pandas().iloc[0]
    n = int(s["n"])
    rha = textstats.round_half_away
    share = float(int(s["dollar"])) / n
    return pd.DataFrame({
        "n_orders": np.array([n], np.int64),
        "share_whole_dollar": [float(rha(share, 6))],
        "share_5_dollar": [float(rha(float(int(s["five"])) / n,
                                     6))],
        "share_10_dollar": [float(rha(float(int(s["ten"])) / n,
                                      6))],
        "share_100_dollar": [float(rha(float(int(s["hundred"]))
                                       / n, 6))],
        "dollar_heaping_ratio": [float(rha(share / 0.01, 6))],
        "heaping_flagged": np.array(
            [1 if share > 0.02 else 0], np.int64)})


_SESS_IV_SQL = f"""
sid AS (SELECT user_id, ts, event_id,
               SUM(ns) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM ({_NS_SQL})),
iv AS (SELECT epoch_us(MIN(ts)) AS st, epoch_us(MAX(ts)) AS en
       FROM sid GROUP BY user_id, sid)"""


@register("avg_concurrency_by_hour", sql=f"""
WITH {_SESS_IV_SQL},
span AS (SELECT (MIN(st) // 86400000000) AS d0,
                (MAX(en) // 86400000000) AS d1
         FROM iv),
hb AS (SELECT iv.st, iv.en,
              UNNEST(generate_series(iv.st // 3600000000,
                                     iv.en // 3600000000)) AS hb
       FROM iv),
ov AS (SELECT CAST(hb % 24 AS BIGINT) AS hour,
              CAST(SUM(LEAST(en, (hb + 1) * 3600000000)
                       - GREATEST(st, hb * 3600000000))
                   AS HUGEINT) AS us
       FROM hb GROUP BY 1),
nd AS (SELECT CAST(d1 - d0 + 1 AS BIGINT) AS n_days FROM span)
SELECT hour, CAST(COALESCE(ov.us, 0) AS BIGINT) AS session_us,
       nd.n_days,
       ROUND(CAST(COALESCE(ov.us, 0) AS DOUBLE)
             / (3600000000.0 * nd.n_days), 6) AS avg_concurrent
FROM (SELECT UNNEST(range(0, 24)) AS hour) h
LEFT JOIN ov USING (hour) CROSS JOIN nd
ORDER BY 1""")
def avg_concurrency_by_hour(sf_dir: str) -> pd.DataFrame:
    """Average concurrent sessions by hour of day — the offered
    traffic (in erlangs) per clock hour: Σ session-microseconds
    overlapping each hour-of-day bin over 3600s × observed days.
    peak_concurrent_sessions gives the single worst instant; this
    gives the sustained LOAD CURVE capacity is actually staffed
    against (an instantaneous peak of 40 during an hour that
    averages 3 is a blip to absorb, averaging 35 is a shift to
    staff). Session intervals come from the shared bucket-hash
    sessionizer (min/max per session — associative); each interval
    splits across its few spanned hour bins with exact integer-µs
    GREATEST/LEAST overlap, so only 24 (hour, µs) partials reach
    the driver at any scale; zero-activity hours stay as explicit
    zero rows."""
    sess = _sessionized_events(sf_dir)
    iv = reduce_sink(sess, ["user_id", "sid"],
                     {"st": ("ts", "min"), "en": ("ts", "max")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        st = df["st"].to_numpy("datetime64[us]").astype(np.int64)
        en = df["en"].to_numpy("datetime64[us]").astype(np.int64)
        hour_us = 3_600_000_000
        rows: dict = {}
        d0 = int(st.min()) // 86_400_000_000
        d1 = int(en.max()) // 86_400_000_000
        for s, e in zip(st, en):
            for hb in range(int(s) // hour_us,
                            int(e) // hour_us + 1):
                ov = min(int(e), (hb + 1) * hour_us) \
                    - max(int(s), hb * hour_us)
                h = hb % 24
                rows[h] = rows.get(h, 0) + ov
        out = pd.DataFrame({"hour": list(rows),
                            "us": list(rows.values())})
        out["d0"] = d0
        out["d1"] = d1
        return out

    p = reduce_sink(iv.map_batches(partial, batch_format="pandas"),
                    ["hour"], {"us": ("us", "sum"),
                               "d0": ("d0", "min"),
                               "d1": ("d1", "max")}).to_pandas()
    d0, d1 = int(p["d0"].min()), int(p["d1"].max())
    n_days = d1 - d0 + 1
    full = pd.DataFrame({"hour": np.arange(24, dtype=np.int64)})
    full = full.merge(p[["hour", "us"]], on="hour", how="left") \
        .fillna(0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "hour": full["hour"],
        "session_us": full["us"].astype(np.int64),
        "n_days": np.full(24, n_days, np.int64),
        "avg_concurrent": rha(full["us"].to_numpy(np.float64)
                              / (3_600_000_000.0 * n_days), 6)})


@register("erlang_blocking_table", sql=f"""
WITH RECURSIVE {_SESS_IV_SQL},
hb AS (SELECT iv.st, iv.en,
              UNNEST(generate_series(iv.st // 3600000000,
                                     iv.en // 3600000000)) AS hb
       FROM iv),
ov AS (SELECT hb % 24 AS hour,
              CAST(SUM(LEAST(en, (hb + 1) * 3600000000)
                       - GREATEST(st, hb * 3600000000))
                   AS HUGEINT) AS us
       FROM hb GROUP BY 1),
span AS (SELECT (MAX(en) // 86400000000)
                - (MIN(st) // 86400000000) + 1 AS n_days
         FROM iv),
load AS (SELECT MAX(CAST(us AS DOUBLE)
                    / (3600000000.0 * span.n_days)) AS a
         FROM ov CROSS JOIN span),
eb AS (SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS b, load.a FROM load
       UNION ALL
       SELECT k + 1, a * b / ((k + 1) + a * b), a
       FROM eb WHERE k < 8)
SELECT CAST(k AS BIGINT) AS servers,
       ROUND(a, 6) AS peak_erlangs,
       ROUND(b, 6) AS erlang_b_blocking,
       ROUND(CASE WHEN k > a * (1.0 - b)
                  THEN k * b / (k - a * (1.0 - b))
                  ELSE 1.0 END, 6) AS erlang_c_wait_prob
FROM eb WHERE k IN (1, 2, 4, 8) ORDER BY 1""")
def erlang_blocking_table(sf_dir: str) -> pd.DataFrame:
    """Erlang blocking table at the measured peak hour-of-day load:
    offered traffic a = max hourly average concurrency (erlangs),
    then the exact Erlang-B recursion B_k = aB/(k+aB) for
    k = 1..8 servers and the Erlang-C wait probability
    C = kB/(k − a(1−B)) (clamped to 1 when unstable). This turns
    the concurrency curve into the actual staffing/connection-pool
    answer: "how many workers until a peak-hour arrival is blocked
    <1% / queued <20%" — the century-old formula every sizing rule
    of thumb approximates, computed from the data's own a instead
    of a guess. The recursion runs in identical order on both
    engines (recursive CTE vs Python loop, same float sequence),
    so every row is bit-stable; upstream is the same exact
    integer-µs overlap machinery as avg_concurrency_by_hour."""
    conc = avg_concurrency_by_hour(sf_dir)
    a = float((conc["session_us"].to_numpy(np.float64)
               / (3_600_000_000.0
                  * conc["n_days"].to_numpy(np.float64))).max())
    rha = textstats.round_half_away
    rows = []
    b = 1.0
    for k in range(1, 9):
        b = a * b / (k + a * b)
        if k in (1, 2, 4, 8):
            cw = k * b / (k - a * (1.0 - b)) \
                if k > a * (1.0 - b) else 1.0
            rows.append((k, float(rha(a, 6)), float(rha(b, 6)),
                         float(rha(cw, 6))))
    return pd.DataFrame(rows, columns=[
        "servers", "peak_erlangs", "erlang_b_blocking",
        "erlang_c_wait_prob"]).astype({"servers": np.int64})


@register("winsorized_corr_views_purchases", sql=f"""
WITH {_VCP_SQL},
g2 AS (SELECT v AS x, p AS y FROM g),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(COUNT(*) // 10 AS BIGINT) AS tr
       FROM g2),
lim AS (SELECT nn.n, nn.tr,
        (SELECT x FROM g2 ORDER BY x LIMIT 1
         OFFSET (SELECT tr FROM nn)) AS lox,
        (SELECT x FROM g2 ORDER BY x DESC LIMIT 1
         OFFSET (SELECT tr FROM nn)) AS hix,
        (SELECT y FROM g2 ORDER BY y LIMIT 1
         OFFSET (SELECT tr FROM nn)) AS loy,
        (SELECT y FROM g2 ORDER BY y DESC LIMIT 1
         OFFSET (SELECT tr FROM nn)) AS hiy
        FROM nn),
w AS (SELECT GREATEST(LEAST(g2.x, lim.hix), lim.lox) AS x,
             GREATEST(LEAST(g2.y, lim.hiy), lim.loy) AS y
      FROM g2 CROSS JOIN lim),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM w)
SELECT s.n AS n_days, lim.tr AS winsorized_each_end,
       ROUND(CASE WHEN (s.n * s.sxx - CAST(s.sx AS HUGEINT) * s.sx)
                       > 0
                   AND (s.n * s.syy - CAST(s.sy AS HUGEINT) * s.sy)
                       > 0
                  THEN CAST(s.n * s.sxy
                            - CAST(s.sx AS HUGEINT) * s.sy
                            AS DOUBLE)
                       / SQRT(CAST(s.n * s.sxx
                                   - CAST(s.sx AS HUGEINT) * s.sx
                                   AS DOUBLE)
                              * CAST(s.n * s.syy
                                     - CAST(s.sy AS HUGEINT) * s.sy
                                     AS DOUBLE))
                  ELSE 0 END, 6) AS winsorized_r
FROM s CROSS JOIN lim""")
def winsorized_corr_views_purchases(sf_dir: str) -> pd.DataFrame:
    """10%-Winsorized correlation between daily views and purchases:
    clamp each variable at its own ⌊n/10⌋-th order statistics from
    both ends, then Pearson. The robust-correlation family's
    middle member — Pearson is wrecked by one launch-day pair,
    Spearman throws away ALL magnitude information; Winsorizing
    keeps magnitudes for the central 80% and only defuses the
    tails, so it answers "how correlated are TYPICAL days, in
    their own units". Because the clamp values are exact order
    statistics of integer counts, the winsorized series is still
    all integers and the correlation is the standard exact-moments
    expression over 128-bit sums — no float enters before the
    final shared ratio."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "x": (et == "view").astype(np.int64),
            "y": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}).to_pandas()
    x = c["x"].to_numpy(np.int64)
    y = c["y"].to_numpy(np.int64)
    n = len(c)
    tr = n // 10
    xs, ys = np.sort(x), np.sort(y)
    xw = np.clip(x, xs[tr], xs[n - 1 - tr]).astype(object)
    yw = np.clip(y, ys[tr], ys[n - 1 - tr]).astype(object)
    sx, sy = int(xw.sum()), int(yw.sum())
    sxx, syy = int((xw * xw).sum()), int((yw * yw).sum())
    sxy = int((xw * yw).sum())
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = float(n * sxy - sx * sy) / np.sqrt(float(vx) * float(vy)) \
        if vx > 0 and vy > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "winsorized_each_end": np.array([tr], np.int64),
        "winsorized_r": [float(rha(r, 6))]})


@register("biweight_midcorr_views_purchases", sql=f"""
WITH {_VCP_SQL},
g2 AS (SELECT v AS x, p AS y FROM g),
md AS (SELECT MEDIAN(x) AS mx, MEDIAN(y) AS my FROM g2),
ad AS (SELECT MEDIAN(ABS(g2.x - md.mx)) AS madx,
              MEDIAN(ABS(g2.y - md.my)) AS mady
       FROM g2 CROSS JOIN md),
u AS (SELECT (g2.x - md.mx) / (9.0 * ad.madx) AS ux,
             (g2.y - md.my) / (9.0 * ad.mady) AS uy,
             g2.x - md.mx AS dx, g2.y - md.my AS dy
      FROM g2 CROSS JOIN md CROSS JOIN ad),
w AS (SELECT dx, dy,
             CASE WHEN ABS(ux) < 1
                  THEN (1.0 - ux * ux) * (1.0 - ux * ux)
                  ELSE 0 END AS wx,
             CASE WHEN ABS(uy) < 1
                  THEN (1.0 - uy * uy) * (1.0 - uy * uy)
                  ELSE 0 END AS wy
      FROM u),
s AS (SELECT SUM(wx * dx * wy * dy) AS sxy,
             SUM(wx * dx * wx * dx) AS sxx,
             SUM(wy * dy * wy * dy) AS syy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w)
SELECT n AS n_days,
       ROUND(CASE WHEN sxx > 0 AND syy > 0
                  THEN sxy / SQRT(sxx * syy) ELSE 0 END, 6)
           AS bicor
FROM s""")
def biweight_midcorr_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Biweight midcorrelation (the WGCNA/co-expression standard)
    between daily views and purchases: deviations from the MEDIAN,
    down-weighted by Tukey's biweight (1−u²)² with u = dev/(9·MAD)
    and hard-zeroed beyond 9 MADs. The smooth counterpart to the
    Winsorized r — instead of clamping at a fixed quantile it
    fades influence continuously with outlyingness, so a day at
    4 MADs still votes (weakly) while a 20-MAD launch day is
    erased entirely; of the robust family it has the best
    efficiency at the normal model while keeping ~breakdown
    against heavy tails. Median and MAD use the interpolated-
    median convention both engines share; weights and products are
    the same float cascade over the calendar-bounded grid, with
    degenerate MAD = 0 short-circuiting to 0."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "x": (et == "view").astype(np.int64),
            "y": (et == "purchase").astype(np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}).to_pandas()
    x = c["x"].to_numpy(np.float64)
    y = c["y"].to_numpy(np.float64)
    n = len(c)
    mx, my = np.median(x), np.median(y)
    madx = np.median(np.abs(x - mx))
    mady = np.median(np.abs(y - my))
    rha = textstats.round_half_away
    if madx == 0 or mady == 0:
        return pd.DataFrame({"n_days": np.array([n], np.int64),
                             "bicor": [0.0]})
    ux = (x - mx) / (9.0 * madx)
    uy = (y - my) / (9.0 * mady)
    wx = np.where(np.abs(ux) < 1, (1.0 - ux * ux) ** 2, 0.0)
    wy = np.where(np.abs(uy) < 1, (1.0 - uy * uy) ** 2, 0.0)
    dx, dy = x - mx, y - my
    sxy = float((wx * dx * wy * dy).sum())
    sxx = float((wx * dx * wx * dx).sum())
    syy = float((wy * dy * wy * dy).sum())
    r = sxy / np.sqrt(sxx * syy) if sxx > 0 and syy > 0 else 0.0
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "bicor": [float(rha(r, 6))]})


_EMB_HALF_SQL = """
ids AS (SELECT vec_id,
               CASE WHEN 2 * (ROW_NUMBER() OVER (ORDER BY vec_id))
                         <= COUNT(*) OVER () THEN 0 ELSE 1 END AS h
        FROM embeddings),
ed AS (SELECT ids.h, dim.d AS d,
              CAST(e.embedding AS DOUBLE[])[dim.d] AS v
       FROM embeddings e JOIN ids USING (vec_id)
       CROSS JOIN (SELECT UNNEST(range(1, 65)) AS d) dim),
st AS (SELECT h, d, CAST(COUNT(*) AS BIGINT) AS n,
              SUM(v) AS s, SUM(v * v) AS ss
       FROM ed GROUP BY 1, 2)"""


@register("embedding_centroid_drift", sql=f"""
WITH {_EMB_HALF_SQL},
piv AS (SELECT d,
               MAX(CASE WHEN h = 0 THEN s / n END) AS m0,
               MAX(CASE WHEN h = 1 THEN s / n END) AS m1,
               MAX(CASE WHEN h = 0
                        THEN (n * ss - s * s) / (n * (n - 1.0))
                   END) AS v0,
               MAX(CASE WHEN h = 1
                        THEN (n * ss - s * s) / (n * (n - 1.0))
                   END) AS v1
        FROM st GROUP BY d),
agg AS (SELECT SUM((m1 - m0) * (m1 - m0)) AS shift2,
               SUM((v0 + v1) / 2.0) AS trace_var
        FROM piv),
nn AS (SELECT CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n0,
              CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n1
       FROM ids)
SELECT nn.n0 AS n_first_half, nn.n1 AS n_second_half,
       ROUND(SQRT(shift2), 6) AS centroid_shift_norm,
       ROUND(SQRT(shift2) / SQRT(trace_var), 6) AS shift_in_sigma
FROM agg CROSS JOIN nn""")
def embedding_centroid_drift(sf_dir: str) -> pd.DataFrame:
    """Embedding drift check: the L2 distance between the centroid
    of the FIRST half of vectors (by vec_id ingestion order) and
    the SECOND half, scaled by the pooled per-dimension sigma
    (√Σ(σ²₀+σ²₁)/2). Embedding tables silently mix encoder
    versions — a model redeploy mid-backfill shifts the whole
    space, and every downstream cosine threshold, ANN index and
    dedup cutoff calibrated on the old half silently miscalibrates
    on the new. The norm-profile and anisotropy queries describe
    the space's SHAPE; this is the two-sample check that the shape
    is the SAME space across ingestion time, with shift_in_sigma
    the effect size (≳0.1σ deserves a re-index). Per-dimension
    (n, Σv, Σv²) partials are the whole shuffle; the 64-dim
    centroid algebra is a driver-side postage stamp."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    order = np.argsort(ids, kind="stable")
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)[order]
    n = len(mat)
    h0 = mat[: n // 2]
    h1 = mat[n // 2:]
    m0, m1 = h0.sum(axis=0) / len(h0), h1.sum(axis=0) / len(h1)
    def svar(m):
        k = len(m)
        s = m.sum(axis=0)
        ss = (m * m).sum(axis=0)
        return (k * ss - s * s) / (k * (k - 1.0))
    shift2 = float(((m1 - m0) ** 2).sum())
    trace = float(((svar(h0) + svar(h1)) / 2.0).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_first_half": np.array([len(h0)], np.int64),
        "n_second_half": np.array([len(h1)], np.int64),
        "centroid_shift_norm": [float(rha(np.sqrt(shift2), 6))],
        "shift_in_sigma": [float(rha(np.sqrt(shift2)
                                     / np.sqrt(trace), 6))]})


@register("embedding_dim_drift_topk", sql=f"""
WITH {_EMB_HALF_SQL},
piv AS (SELECT d,
               MAX(CASE WHEN h = 0 THEN n END) AS n0,
               MAX(CASE WHEN h = 1 THEN n END) AS n1,
               MAX(CASE WHEN h = 0 THEN s / n END) AS m0,
               MAX(CASE WHEN h = 1 THEN s / n END) AS m1,
               MAX(CASE WHEN h = 0
                        THEN (n * ss - s * s) / (n * (n - 1.0))
                   END) AS v0,
               MAX(CASE WHEN h = 1
                        THEN (n * ss - s * s) / (n * (n - 1.0))
                   END) AS v1
        FROM st GROUP BY d),
z AS (SELECT d,
             ROUND((m1 - m0) / SQRT(v0 / n0 + v1 / n1), 6) AS zshift
      FROM piv)
SELECT CAST(d AS BIGINT) AS dim, zshift
FROM z ORDER BY ABS(zshift) DESC, d LIMIT 5""")
def embedding_dim_drift_topk(sf_dir: str) -> pd.DataFrame:
    """The top-5 DRIFTING embedding dimensions between ingestion
    halves: per-dimension Welch z of the mean shift,
    (μ₁−μ₀)/√(σ₀²/n₀+σ₁²/n₁), ranked by |z|. The global centroid
    check says THAT the space moved; this says WHERE — a handful
    of dimensions carrying all the drift is the fingerprint of a
    truncation/padding bug or a changed normalization layer (fix
    the writer), while drift smeared across all dims means a
    genuinely different encoder (re-embed or re-index). Same
    per-dimension sufficient-statistic shuffle as the centroid
    query; z rounds to 6 dp BEFORE ranking so ties break to the
    lowest dimension identically on both engines."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"])
    order = np.argsort(ids, kind="stable")
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()) \
        .astype(np.float64)[order]
    n = len(mat)
    h0 = mat[: n // 2]
    h1 = mat[n // 2:]
    n0, n1 = len(h0), len(h1)
    m0, m1 = h0.sum(axis=0) / n0, h1.sum(axis=0) / n1
    def svar(m):
        k = len(m)
        s = m.sum(axis=0)
        ss = (m * m).sum(axis=0)
        return (k * ss - s * s) / (k * (k - 1.0))
    v0, v1 = svar(h0), svar(h1)
    rha = textstats.round_half_away
    z = rha((m1 - m0) / np.sqrt(v0 / n0 + v1 / n1), 6)
    out = pd.DataFrame({"dim": np.arange(1, mat.shape[1] + 1,
                                         dtype=np.int64),
                        "zshift": z})
    out["absz"] = np.abs(out["zshift"])
    return out.sort_values(["absz", "dim"],
                           ascending=[False, True],
                           kind="mergesort").head(5) \
        .drop(columns=["absz"]).reset_index(drop=True)


@register("habit_lift_repeat_days", sql="""
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events),
sp AS (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi,
              CAST(COUNT(*) AS BIGINT) AS act
       FROM ud GROUP BY 1),
p1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS num
       FROM ud a JOIN ud b ON a.user_id = b.user_id
            AND b.d = a.d + 1),
p7 AS (SELECT CAST(COUNT(*) AS BIGINT) AS num
       FROM ud a JOIN ud b ON a.user_id = b.user_id
            AND b.d = a.d + 7),
d1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS den
       FROM ud a JOIN sp ON a.user_id = sp.user_id
       WHERE a.d + 1 <= sp.hi),
d7 AS (SELECT CAST(COUNT(*) AS BIGINT) AS den
       FROM ud a JOIN sp ON a.user_id = sp.user_id
       WHERE a.d + 7 <= sp.hi),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS users,
               CAST(SUM(act) AS BIGINT) AS act,
               CAST(SUM(hi - lo + 1) AS BIGINT) AS span
        FROM sp)
SELECT tot.users AS n_users, tot.act AS active_user_days,
       ROUND(CAST(tot.act AS DOUBLE) / tot.span, 6) AS base_rate,
       ROUND(CASE WHEN d1.den > 0
                  THEN CAST(p1.num AS DOUBLE) / d1.den
                  ELSE 0 END, 6) AS p_repeat_1d,
       ROUND(CASE WHEN d7.den > 0
                  THEN CAST(p7.num AS DOUBLE) / d7.den
                  ELSE 0 END, 6) AS p_repeat_7d,
       ROUND(CASE WHEN d1.den > 0
                  THEN (CAST(p1.num AS DOUBLE) / d1.den)
                       / (CAST(tot.act AS DOUBLE) / tot.span)
                  ELSE 0 END, 6) AS lift_1d,
       ROUND(CASE WHEN d7.den > 0
                  THEN (CAST(p7.num AS DOUBLE) / d7.den)
                       / (CAST(tot.act AS DOUBLE) / tot.span)
                  ELSE 0 END, 6) AS lift_7d
FROM tot, p1, p7, d1, d7""")
def habit_lift_repeat_days(sf_dir: str) -> pd.DataFrame:
    """Habit strength: P(a user active on day d is active again on
    d+1 / d+7 | the target day is inside their span), against the
    base in-span activity rate — lifts ≫ 1 at lag 7 but not lag 1
    are the WEEKLY-ritual signature (same-day-next-week usage the
    DAU/WAU ratio cannot see), lag-1 ≫ lag-7 is streak behavior.
    This is the per-user conditional the aggregate dow-seasonality
    index aggregates away: seasonality can be flat while every
    individual is perfectly weekly (staggered phases). All counts
    are exact integers off the (user, day) distinct reduce: the
    lag joins hit only same-user day pairs, denominators clip at
    each user's own last day so the window is never censored, and
    the base rate is active-days over summed spans (documented
    convention)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": us // 86_400_000_000}).drop_duplicates()
        return out

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "d"]) \
            .sort_values(["user_id", "d"], kind="mergesort")
        num1 = num7 = den1 = den7 = 0
        users = act = span = 0
        for _, grp in g.groupby("user_id", sort=False):
            dv = grp["d"].to_numpy(np.int64)
            s = set(dv.tolist())
            hi = int(dv.max())
            lo = int(dv.min())
            users += 1
            act += len(s)
            span += hi - lo + 1
            num1 += sum(1 for d in s if d + 1 in s)
            num7 += sum(1 for d in s if d + 7 in s)
            den1 += sum(1 for d in s if d + 1 <= hi)
            den7 += sum(1 for d in s if d + 7 <= hi)
        return pd.DataFrame({
            "k": [0], "users": [users], "act": [act],
            "span": [span], "num1": [num1], "num7": [num7],
            "den1": [den1], "den7": [den7]})

    s = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas")
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["k"], {c: (c, "sum") for c in
                ["users", "act", "span", "num1", "num7",
                 "den1", "den7"]}).to_pandas().iloc[0]
    users, act, span = int(s["users"]), int(s["act"]), \
        int(s["span"])
    num1, num7 = int(s["num1"]), int(s["num7"])
    den1, den7 = int(s["den1"]), int(s["den7"])
    base = float(act) / span
    p1 = float(num1) / den1 if den1 > 0 else 0.0
    p7 = float(num7) / den7 if den7 > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([users], np.int64),
        "active_user_days": np.array([act], np.int64),
        "base_rate": [float(rha(base, 6))],
        "p_repeat_1d": [float(rha(p1, 6))],
        "p_repeat_7d": [float(rha(p7, 6))],
        "lift_1d": [float(rha(p1 / base if den1 > 0 else 0.0, 6))],
        "lift_7d": [float(rha(p7 / base if den7 > 0 else 0.0,
                              6))]})


@register("weekday_creature_share", sql="""
WITH e AS (SELECT user_id,
                  (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
           FROM events),
c AS (SELECT user_id, dow, CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
u AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS tot,
             CAST(MAX(n) AS BIGINT) AS mx
      FROM c GROUP BY 1),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS eligible,
             CAST(SUM(CASE WHEN 2 * mx >= tot THEN 1 ELSE 0 END)
                  AS BIGINT) AS creatures
      FROM u WHERE tot >= 7)
SELECT eligible AS eligible_users, creatures,
       ROUND(CAST(creatures AS DOUBLE) / eligible, 6)
           AS creature_share
FROM f""")
def weekday_creature_share(sf_dir: str) -> pd.DataFrame:
    """Weekday creatures: among users with ≥ 7 events, the share
    whose single MODAL weekday carries at least half their
    activity (2·max ≥ total — exactly-half counts, documented).
    The individual-grain companion to habit_lift_repeat_days: the
    lift says rituals exist in aggregate, this counts the PEOPLE
    who are rituals — the segment whose churn looks like a
    one-week outage (they get one chance per week to come back),
    who should get day-of-week-targeted scheduling, and whose
    presence makes any weekday-split A/B assignment non-exchangeable.
    Pure integer comparison per user off one (user, dow) reduce;
    only the per-user (total, max) pairs fold to three scalars."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "dow": (day + 4) % 7,
            "n": np.ones(len(df), np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "dow"], {"n": ("n", "sum")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df.groupby("user_id")["n"].agg(["sum", "max"])
        u = u[u["sum"] >= 7]
        return pd.DataFrame({
            "k": [0], "eligible": [len(u)],
            "creatures": [int((2 * u["max"] >= u["sum"]).sum())]})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    s = reduce_sink(
        c.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(fold,
                                       batch_format="pandas"),
        ["k"], {"eligible": ("eligible", "sum"),
                "creatures": ("creatures", "sum")}) \
        .to_pandas().iloc[0]
    el, cr = int(s["eligible"]), int(s["creatures"])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "eligible_users": np.array([el], np.int64),
        "creatures": np.array([cr], np.int64),
        "creature_share": [float(rha(cr / el if el else 0.0, 6))]})


def _rdd_side(n, sx, sy, sxx, syy, sxy):
    """Closed-form local-linear intercept at x=0 and its SE² from
    exact integer sums (shared float cascade both engines)."""
    vx = float(n * sxx - sx * sx)
    cxy = float(n * sxy - sx * sy)
    b1 = cxy / vx
    b0 = (float(sy) - b1 * sx) / n
    ssr = (float(n * syy - sy * sy) - cxy * cxy / vx) / n
    s2 = ssr / (n - 2)
    se0 = s2 * (1.0 / n + (float(sx) / n) * (float(sx) / n)
                / (vx / n))
    return b0, b1, se0


_RDD_ONE_SQL = """
SELECT {c0} AS threshold_cents,
       MAX(CASE WHEN r = 0 THEN n END) AS n_left,
       MAX(CASE WHEN r = 1 THEN n END) AS n_right,
       ROUND(MAX(CASE WHEN r = 1 THEN b0 END)
             - MAX(CASE WHEN r = 0 THEN b0 END), 6) AS jump,
       ROUND(MAX(CASE WHEN r = 1 THEN b1 END)
             - MAX(CASE WHEN r = 0 THEN b1 END), 9) AS kink,
       ROUND((MAX(CASE WHEN r = 1 THEN b0 END)
              - MAX(CASE WHEN r = 0 THEN b0 END))
             / SQRT(MAX(CASE WHEN r = 0 THEN se0 END)
                    + MAX(CASE WHEN r = 1 THEN se0 END)), 6) AS z,
       CAST(CASE WHEN ABS((MAX(CASE WHEN r = 1 THEN b0 END)
                           - MAX(CASE WHEN r = 0 THEN b0 END))
                          / SQRT(MAX(CASE WHEN r = 0 THEN se0 END)
                                 + MAX(CASE WHEN r = 1
                                       THEN se0 END)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT)
           AS discontinuity_rejected
FROM (
  SELECT r, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS b1,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n AS b0,
         ((CAST(n * syy - sy * sy AS DOUBLE)
           - CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) / n) / (n - 2)
         * (1.0 / n + (CAST(sx AS DOUBLE) / n)
                      * (CAST(sx AS DOUBLE) / n)
                      / (CAST(n * sxx - sx * sx AS DOUBLE) / n))
             AS se0
  FROM (
    SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS HUGEINT) AS sx,
           CAST(SUM(y) AS HUGEINT) AS sy,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
    FROM ({pts}) GROUP BY 1))"""


_RDD_PTS_PRIORITY = """
SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) - {c0} AS x,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END AS y
FROM orders
WHERE ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT) - {c0})
      <= 5000000"""


@register("rdd_urgent_at_totalprice", sql=" UNION ALL ".join(
    _RDD_ONE_SQL.format(c0=c0, pts=_RDD_PTS_PRIORITY.format(c0=c0))
    for c0 in (20_000_000, 25_000_000)) + " ORDER BY 1")
def rdd_urgent_at_totalprice(sf_dir: str) -> pd.DataFrame:
    """Sharp regression-discontinuity estimate of the jump in
    P(order is URGENT/HIGH priority) at the $200k order-value
    mark, with a $250k PLACEBO threshold as the built-in
    falsification row: local linear fits on each side of the
    cutoff inside a +/-$50k band, jump = right intercept - left
    intercept at the cutoff, z from the two intercepts' OLS
    standard errors, plus the slope KINK. The bunching screen
    already in the registry tests whether the running variable is
    MANIPULATED at thresholds; RDD tests whether anything
    DOWNSTREAM actually changes there - a significant real-row
    jump with a null placebo is the causal signature of a policy
    keyed to the cutoff, while jump==placebo==0 certifies the
    threshold is decorative. Both sides' five regression moments
    are exact 128-bit integers (y is 0/1, x is centered cents);
    the intercept/SE cascade is one shared float expression per
    side."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        pri = df["o_orderpriority"].to_numpy()
        return pd.DataFrame({
            "cents": cents,
            "y": np.isin(pri, ("1-URGENT", "2-HIGH"))
            .astype(np.int64)})

    raw = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice", "o_orderpriority"])
        .map_batches(prep, batch_format="pandas"),
        ["cents", "y"], {"cnt": ("y", "size")}).to_pandas()
    rha = textstats.round_half_away
    rows = []
    for c0 in (20_000_000, 25_000_000):
        band = raw[(raw["cents"] - c0).abs() <= 5_000_000]
        x = (band["cents"] - c0).to_numpy(np.int64).astype(object)
        y = band["y"].to_numpy(np.int64).astype(object)
        w = band["cnt"].to_numpy(np.int64).astype(object)
        stats = {}
        for r, sel in ((0, x < 0), (1, x >= 0)):
            xs, ys, ws = x[sel], y[sel], w[sel]
            n = int(ws.sum())
            sx = int((ws * xs).sum())
            sy = int((ws * ys).sum())
            sxx = int((ws * xs * xs).sum())
            syy = int((ws * ys * ys).sum())
            sxy = int((ws * xs * ys).sum())
            stats[r] = _rdd_side(n, sx, sy, sxx, syy, sxy) + (n,)
        (b0l, b1l, sel_, nl) = stats[0]
        (b0r, b1r, ser, nr) = stats[1]
        jump = b0r - b0l
        z = jump / np.sqrt(sel_ + ser)
        rows.append((c0, nl, nr, float(rha(jump, 6)),
                     float(rha(b1r - b1l, 9)), float(rha(z, 6)),
                     1 if abs(z) > 1.959964 else 0))
    return pd.DataFrame(rows, columns=[
        "threshold_cents", "n_left", "n_right", "jump", "kink",
        "z", "discontinuity_rejected"]).astype(
        {"threshold_cents": np.int64, "n_left": np.int64,
         "n_right": np.int64, "discontinuity_rejected": np.int64})



@register("rdd_orders_at_acctbal_zero", sql="""
WITH cnt AS (SELECT c.c_custkey,
                    CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
                    CAST(COUNT(o.o_orderkey) AS BIGINT) AS y
             FROM customer c LEFT JOIN orders o
                  ON o.o_custkey = c.c_custkey
             GROUP BY 1, 2),
pts AS (SELECT x, y FROM cnt WHERE ABS(x) <= 50000),
sides AS (SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS HUGEINT) AS sx,
                 CAST(SUM(y) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT)
                     AS sxx,
                 CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT)
                     AS syy,
                 CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT)
                     AS sxy
          FROM pts GROUP BY 1),
fit AS (SELECT r, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS b1,
               (CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n
                   AS b0,
               ((CAST(n * syy - sy * sy AS DOUBLE)
                 - CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) / n)
               / (n - 2)
               * (1.0 / n + (CAST(sx AS DOUBLE) / n)
                            * (CAST(sx AS DOUBLE) / n)
                            / (CAST(n * sxx - sx * sx AS DOUBLE)
                               / n)) AS se0
        FROM sides)
SELECT MAX(CASE WHEN r = 0 THEN n END) AS n_left,
       MAX(CASE WHEN r = 1 THEN n END) AS n_right,
       ROUND(MAX(CASE WHEN r = 1 THEN b0 END)
             - MAX(CASE WHEN r = 0 THEN b0 END), 6) AS jump,
       ROUND((MAX(CASE WHEN r = 1 THEN b0 END)
              - MAX(CASE WHEN r = 0 THEN b0 END))
             / SQRT(MAX(CASE WHEN r = 0 THEN se0 END)
                    + MAX(CASE WHEN r = 1 THEN se0 END)), 6) AS z,
       CAST(CASE WHEN ABS((MAX(CASE WHEN r = 1 THEN b0 END)
                           - MAX(CASE WHEN r = 0 THEN b0 END))
                          / SQRT(MAX(CASE WHEN r = 0
                                     THEN se0 END)
                                 + MAX(CASE WHEN r = 1
                                       THEN se0 END)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT)
           AS discontinuity_rejected
FROM fit""")
def rdd_orders_at_acctbal_zero(sf_dir: str) -> pd.DataFrame:
    """Regression discontinuity of per-customer ORDER COUNT at zero
    account balance (±$500 band, local linear both sides): does
    crossing into the red actually change purchasing, or is the
    zero line decorative? The negative-balance queries already in
    the registry compare the two GROUPS wholesale — confounded by
    everything that correlates with being deep in debt; the RDD
    compares customers a few dollars either side of zero, where
    assignment is as-good-as-random, so a significant jump is
    credit policy biting (and its absence certifies balance is
    cosmetic for ordering). Zero-order customers enter via the
    LEFT join (they are the point of the question); all five
    moments per side are exact 128-bit integers off one customer
    reduce; same shared intercept/SE cascade as the totalprice
    RDD."""
    from webalizer_ray.stages.join import auto_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def ocnt(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).size() \
            .rename(columns={"size": "y"})

    oc = reduce_sink(orders.map_batches(ocnt,
                                        batch_format="pandas"),
                     ["o_custkey"], {"y": ("y", "sum")}) \
        .to_pandas()
    cu = cust.to_pandas()
    cu["x"] = np.rint(cu["c_acctbal"].to_numpy(np.float64)
                      * 100).astype(np.int64)
    m = cu.merge(oc, left_on="c_custkey", right_on="o_custkey",
                 how="left").fillna({"y": 0})
    _ = auto_join
    band = m[m["x"].abs() <= 50_000]
    x = band["x"].to_numpy(np.int64).astype(object)
    y = band["y"].to_numpy(np.int64).astype(object)
    stats = {}
    for r, sel in ((0, x < 0), (1, x >= 0)):
        xs, ys = x[sel], y[sel]
        n = len(xs)
        stats[r] = _rdd_side(n, int(xs.sum()), int(ys.sum()),
                             int((xs * xs).sum()),
                             int((ys * ys).sum()),
                             int((xs * ys).sum())) + (n,)
    (b0l, _b1l, sel_, nl) = stats[0]
    (b0r, _b1r, ser, nr) = stats[1]
    jump = b0r - b0l
    z = jump / np.sqrt(sel_ + ser)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_left": np.array([nl], np.int64),
        "n_right": np.array([nr], np.int64),
        "jump": [float(rha(jump, 6))],
        "z": [float(rha(z, 6))],
        "discontinuity_rejected": np.array(
            [1 if abs(z) > 1.959964 else 0], np.int64)})


@register("tail_conditional_mean_value", sql="""
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
h AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1),
cum AS (SELECT cents, cnt,
               CAST(SUM(cnt) OVER (ORDER BY cents DESC)
                    AS BIGINT) AS topcum,
               CAST(SUM(CAST(cents AS HUGEINT) * cnt)
                    OVER (ORDER BY cents DESC) AS HUGEINT) AS topsum,
               SUM(cnt) OVER () AS n,
               CAST(SUM(CAST(cents AS HUGEINT) * cnt) OVER ()
                    AS HUGEINT) AS tot
        FROM h),
m AS (SELECT MAX(n) AS n, MAX(tot) AS tot,
             CAST((MAX(n) + 19) // 20 AS BIGINT) AS m95,
             CAST((MAX(n) + 99) // 100 AS BIGINT) AS m99
      FROM cum),
t95 AS (SELECT m.m95,
               MIN(cum.topsum
                   - CAST(cum.cents AS HUGEINT)
                     * (cum.topcum - m.m95)) AS s
        FROM cum CROSS JOIN m WHERE cum.topcum >= m.m95
        GROUP BY 1),
t99 AS (SELECT m.m99,
               MIN(cum.topsum
                   - CAST(cum.cents AS HUGEINT)
                     * (cum.topcum - m.m99)) AS s
        FROM cum CROSS JOIN m WHERE cum.topcum >= m.m99
        GROUP BY 1)
SELECT m.n, t95.m95 AS n_top5pct, t99.m99 AS n_top1pct,
       ROUND(CAST(t95.s AS DOUBLE) / t95.m95 / 100.0, 6)
           AS tail_mean_95,
       ROUND(CAST(t99.s AS DOUBLE) / t99.m99 / 100.0, 6)
           AS tail_mean_99,
       ROUND(CAST(t95.s AS DOUBLE) / CAST(m.tot AS DOUBLE), 6)
           AS tail95_value_share
FROM m CROSS JOIN t95 CROSS JOIN t99""")
def tail_conditional_mean_value(sf_dir: str) -> pd.DataFrame:
    """Upper-tail conditional mean (the superquantile / CVaR dual)
    of event value: the exact mean of the ⌈n/20⌉ largest and
    ⌈n/100⌉ largest values, plus the top-5%'s share of ALL value.
    Quantile tables give the THRESHOLD the tail starts at; the
    conditional mean is the number coherent risk/revenue planning
    actually needs — "IF we land in the top-5% regime, how big is
    the average ticket" — and unlike the quantile it is
    tail-shape-sensitive (two distributions with the same p95
    differ wildly here when one is bounded and one is Pareto;
    read against the Hill/mean-excess EVT entries). Exactness: the
    descending cumulative (count, cent-sum) pair lets the
    boundary bin contribute exactly m − cum_before copies of its
    value, so both tail sums are exact 128-bit integers — the
    MIN() trick picks the first qualifying row without a window
    re-sort."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cents": np.rint(df["value"].to_numpy(np.float64)
                             * 100).astype(np.int64),
            "cnt": np.ones(len(df), np.int64)})

    h = reduce_sink(
        _events(sf_dir, ["value"])
        .map_batches(prep, batch_format="pandas"),
        ["cents"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("cents", ascending=False, ignore_index=True)
    cents = h["cents"].to_numpy(np.int64).astype(object)
    cnt = h["cnt"].to_numpy(np.int64).astype(object)
    n = int(cnt.sum())
    tot = int((cents * cnt).sum())
    topcum = cnt.cumsum()
    topsum = (cents * cnt).cumsum()
    rha = textstats.round_half_away

    def tail(m):
        i = int(np.argmax(topcum >= m))
        s = int(topsum[i]) - int(cents[i]) * (int(topcum[i]) - m)
        return s

    m95 = (n + 19) // 20
    m99 = (n + 99) // 100
    s95, s99 = tail(m95), tail(m99)
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "n_top5pct": np.array([m95], np.int64),
        "n_top1pct": np.array([m99], np.int64),
        "tail_mean_95": [float(rha(float(s95) / m95 / 100.0, 6))],
        "tail_mean_99": [float(rha(float(s99) / m99 / 100.0, 6))],
        "tail95_value_share": [float(rha(float(s95) / float(tot),
                                         6))]})


@register("drawdown_duration_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS v
           FROM events GROUP BY 1),
x AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT)
                    AS t
      FROM d),
pk AS (SELECT t, v,
              MAX(v) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS peak
       FROM x),
uw AS (SELECT t, CASE WHEN v < peak THEN 1 ELSE 0 END AS under
       FROM pk),
isl AS (SELECT t, under,
               t - CAST(ROW_NUMBER() OVER (PARTITION BY under
                                           ORDER BY t) AS BIGINT)
                   AS grp
        FROM uw),
runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS len
         FROM isl WHERE under = 1 GROUP BY grp)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS n_days,
       CAST(COALESCE((SELECT SUM(len) FROM runs), 0) AS BIGINT)
           AS underwater_days,
       CAST(COALESCE((SELECT MAX(len) FROM runs), 0) AS BIGINT)
           AS max_underwater_run,
       CAST((SELECT COUNT(*) FROM runs) AS BIGINT)
           AS n_drawdown_spells""")
def drawdown_duration_daily(sf_dir: str) -> pd.DataFrame:
    """Drawdown DURATION profile of daily revenue: days spent below
    the running peak, the longest single underwater spell, and the
    number of distinct spells. daily_value_drawdown measures how
    DEEP the worst slump went; duration measures how LONG slumps
    last — the dimension that separates a one-day crater that
    recovers tomorrow (deep, short: an incident) from a shallow
    six-week grind (the business-trend alarm), and
    max_underwater_run is the patience a "wait for recovery"
    policy would have needed. Pure integer machinery: exact cent
    daily sums, running max, and gaps-and-islands run lengths
    (t − rownum-within-state) identical on both engines over the
    calendar-bounded grid."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "v": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    d = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"v": ("v", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    v = d["v"].to_numpy(np.int64)
    n = len(v)
    peak = np.maximum.accumulate(v)
    under = v < peak
    runs = []
    cur = 0
    for u in under:
        if u:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "underwater_days": np.array([int(under.sum())], np.int64),
        "max_underwater_run": np.array(
            [max(runs) if runs else 0], np.int64),
        "n_drawdown_spells": np.array([len(runs)], np.int64)})


@register("markov_order_lr_test", sql="""
WITH o AS (SELECT user_id, event_type AS c,
                  LAG(event_type, 1) OVER w AS b,
                  LAG(event_type, 2) OVER w AS a
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
tri AS (SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE a IS NOT NULL GROUP BY 1, 2, 3),
mab AS (SELECT a, b, CAST(SUM(n) AS BIGINT) AS nab
        FROM tri GROUP BY 1, 2),
mbc AS (SELECT b, c, CAST(SUM(n) AS BIGINT) AS nbc
        FROM tri GROUP BY 1, 2),
mb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS nb FROM tri GROUP BY 1),
g AS (SELECT SUM(2.0 * tri.n
                 * LN(CAST(tri.n AS DOUBLE) * mb.nb
                      / (CAST(mab.nab AS DOUBLE) * mbc.nbc)))
          AS g2,
             CAST(SUM(tri.n) AS BIGINT) AS nt
      FROM tri JOIN mab USING (a, b) JOIN mbc USING (b, c)
      JOIN mb USING (b)),
df AS (SELECT CAST(SUM((ra - 1) * (rc - 1)) AS BIGINT) AS dof
       FROM (SELECT b,
                    COUNT(DISTINCT a) AS ra,
                    COUNT(DISTINCT c) AS rc
             FROM tri GROUP BY b))
SELECT nt AS n_trigrams, ROUND(g2, 6) AS g2, df.dof,
       ROUND(g2 / (2.0 * nt * LN(2.0)), 6) AS entropy_drop_bits
FROM g CROSS JOIN df""")
def markov_order_lr_test(sf_dir: str) -> pd.DataFrame:
    """Likelihood-ratio test of Markov order 2 vs order 1 on user
    event-type sequences: G² = 2Σ n(abc)·ln(n(abc)·n(·b·) /
    (n(ab·)·n(·bc))) — exactly the conditional-independence test
    a ⊥ c | b on the trigram table, with data-driven dof
    Σ_b (rows_b−1)(cols_b−1). The registry's Markov family
    (stationary dist, entropy rate, hitting times, removal
    attribution) all ASSUME memory-1; this is the test of that
    assumption, and G²/(2N·ln2) is the bits-per-event the
    order-1 model is leaving on the table — ≈0 certifies the whole
    family, large means funnels/attribution need 2-step context.
    Trigram counts are exact integers off one double-LAG pass
    (triples never cross users); marginals re-aggregate from the
    SAME trigram table so the identity Σ margins = N holds by
    construction on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same2 = np.zeros(len(df), bool)
        same2[2:] = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        a = np.roll(et, 2)[same2]
        b = np.roll(et, 1)[same2]
        c = et[same2]
        return pd.DataFrame({"a": a, "b": b, "c": c,
                             "n": np.ones(len(c), np.int64)})

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    tri = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(prep,
                                       batch_format="pandas"),
        ["a", "b", "c"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values(["a", "b", "c"], ignore_index=True)
    nab = tri.groupby(["a", "b"])["n"].sum()
    nbc = tri.groupby(["b", "c"])["n"].sum()
    nb = tri.groupby("b")["n"].sum()
    nt = int(tri["n"].sum())
    g2 = 0.0
    for _, r in tri.iterrows():
        n = int(r["n"])
        g2 += 2.0 * n * np.log(
            float(n) * int(nb[r["b"]])
            / (float(int(nab[(r["a"], r["b"])]))
               * int(nbc[(r["b"], r["c"])])))
    dof = int(sum(
        (tri[tri["b"] == b]["a"].nunique() - 1)
        * (tri[tri["b"] == b]["c"].nunique() - 1)
        for b in tri["b"].unique()))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_trigrams": np.array([nt], np.int64),
        "g2": [float(rha(g2, 6))],
        "dof": np.array([dof], np.int64),
        "entropy_drop_bits": [float(rha(
            g2 / (2.0 * nt * np.log(2.0)), 6))]})


@register("transition_drift_halves", sql="""
WITH bounds AS (SELECT MIN(epoch_us(ts)) AS lo,
                       MAX(epoch_us(ts)) AS hi
                FROM events),
o AS (SELECT e.user_id, e.event_type AS b,
             LAG(e.event_type) OVER (PARTITION BY e.user_id
                                     ORDER BY e.ts, e.event_id)
                 AS a,
             CASE WHEN 2 * epoch_us(e.ts)
                       <= (SELECT lo + hi FROM bounds)
                  THEN 0 ELSE 1 END AS h
      FROM events e),
bi AS (SELECT a, b, h, CAST(COUNT(*) AS BIGINT) AS n
       FROM o WHERE a IS NOT NULL GROUP BY 1, 2, 3),
lat AS (SELECT DISTINCT a, b FROM bi),
z AS (SELECT lat.a, lat.b,
             COALESCE(MAX(CASE WHEN bi.h = 0 THEN bi.n END), 0)
                 AS n0,
             COALESCE(MAX(CASE WHEN bi.h = 1 THEN bi.n END), 0)
                 AS n1
      FROM lat LEFT JOIN bi ON bi.a = lat.a AND bi.b = lat.b
      GROUP BY 1, 2),
ma AS (SELECT a, CAST(SUM(n0) AS BIGINT) AS t0,
              CAST(SUM(n1) AS BIGINT) AS t1
       FROM z GROUP BY 1),
tv AS (SELECT z.a, ma.t0, ma.t1,
              CAST(SUM(ABS(CAST(z.n0 AS HUGEINT) * ma.t1
                           - CAST(z.n1 AS HUGEINT) * ma.t0))
                   AS HUGEINT) AS num
       FROM z JOIN ma USING (a) GROUP BY 1, 2, 3)
SELECT a AS from_state, t0 AS n_first_half, t1 AS n_second_half,
       ROUND(CASE WHEN t0 > 0 AND t1 > 0
                  THEN CAST(num AS DOUBLE)
                       / (2.0 * CAST(t0 AS DOUBLE) * t1)
                  ELSE 0 END, 6) AS row_tvd
FROM tv ORDER BY 1""")
def transition_drift_halves(sf_dir: str) -> pd.DataFrame:
    """Drift of the behavior graph itself: per source state, the
    total-variation distance between the outgoing transition
    distribution in the FIRST half of the time window and the
    SECOND (split at the midpoint timestamp — exact integer-µs
    arithmetic; a transition belongs to the half of its later
    event, documented). Every Markov-based readout in the registry
    (stationary distribution, hitting times, removal attribution,
    and the order test above) fits ONE matrix to the whole window;
    a row_tvd of 0.2 on 'view' means view-followers rerouted
    mid-window — the matrix is time-varying and those numbers are
    averages of two regimes, not properties of one. TVD numerators
    |n₀·T₁ − n₁·T₀| are exact 128-bit integers on the zero-filled
    transition lattice; one shared float ratio per state row."""
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    ds = _events(sf_dir, ["event_id", "ts", "user_id",
                          "event_type"])
    b = reduce_sink(ds.map_batches(
        lambda df: pd.DataFrame({
            "k": [0],
            "lo": [df["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).min()],
            "hi": [df["ts"].to_numpy("datetime64[us]")
                   .astype(np.int64).max()]}),
        batch_format="pandas"),
        ["k"], {"lo": ("lo", "min"), "hi": ("hi", "max")}) \
        .to_pandas()
    lo, hi = int(b["lo"].iloc[0]), int(b["hi"].iloc[0])
    lohi = lo + hi            # broadcast scalar into the pass

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = np.zeros(len(df), bool)
        same[1:] = uid[1:] == uid[:-1]
        out = pd.DataFrame({
            "a": np.roll(et, 1)[same], "b": et[same],
            "h": (2 * us[same] > lohi).astype(np.int64),
            "n": np.ones(int(same.sum()), np.int64)})
        return out.groupby(["a", "b", "h"],
                           as_index=False)["n"].sum()

    pairs = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(prep,
                                       batch_format="pandas"),
        ["a", "b", "h"], {"n": ("n", "sum")}).to_pandas()
    z = pairs.groupby(["a", "b", "h"])["n"].sum().unstack(
        "h", fill_value=0).reindex(columns=[0, 1], fill_value=0)
    rha = textstats.round_half_away
    rows = []
    for a, grp in z.groupby(level="a"):
        n0 = grp[0].to_numpy(np.int64).astype(object)
        n1 = grp[1].to_numpy(np.int64).astype(object)
        t0, t1 = int(n0.sum()), int(n1.sum())
        num = int(np.abs(n0 * t1 - n1 * t0).sum())
        tvd = float(num) / (2.0 * float(t0) * t1) \
            if t0 > 0 and t1 > 0 else 0.0
        rows.append((a, t0, t1, float(rha(tvd, 6))))
    return pd.DataFrame(rows, columns=[
        "from_state", "n_first_half", "n_second_half",
        "row_tvd"]).astype({"n_first_half": np.int64,
                            "n_second_half": np.int64}) \
        .sort_values("from_state", ignore_index=True)


@register("fe_decomposition_value_hour", sql="""
WITH e AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS x,
                  CAST(ROUND(value * 100) AS BIGINT) AS y
           FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM e GROUP BY 1),
w AS (SELECT SUM(CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * sy / n) AS wxy,
             SUM(CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * sx / n) AS wxx,
             SUM((CAST(sx AS DOUBLE) / n)
                 * (CAST(sy AS DOUBLE) / n) * n) AS bxy0,
             SUM((CAST(sx AS DOUBLE) / n)
                 * (CAST(sx AS DOUBLE) / n) * n) AS bxx0,
             CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(sx) AS BIGINT) AS tx,
             CAST(SUM(sy) AS BIGINT) AS ty,
             CAST(SUM(sxx) AS HUGEINT) AS txx,
             CAST(SUM(sxy) AS HUGEINT) AS txy
      FROM u)
SELECT nt AS n_events,
       ROUND(wxy / wxx, 6) AS beta_within,
       ROUND((bxy0 - CAST(tx AS DOUBLE) * ty / nt)
             / (bxx0 - CAST(tx AS DOUBLE) * tx / nt), 6)
           AS beta_between,
       ROUND(CAST(nt * txy - CAST(tx AS HUGEINT) * ty AS DOUBLE)
             / CAST(nt * txx - CAST(tx AS HUGEINT) * tx AS DOUBLE),
             6) AS beta_pooled,
       ROUND(wxx / (CAST(nt * txx - CAST(tx AS HUGEINT) * tx
                         AS DOUBLE) / nt), 6) AS within_x_share
FROM w""")
def fe_decomposition_value_hour(sf_dir: str) -> pd.DataFrame:
    """Panel decomposition of the value~hour relationship: the
    WITHIN-user (fixed-effects) slope over user-demeaned data, the
    BETWEEN-user slope over user means, and the pooled OLS that
    blends them in proportion to the x-variance split (reported as
    within_x_share). This is the ecological-fallacy instrument:
    pooled and within can carry OPPOSITE signs — night owls may be
    big spenders (between +) while each individual spends less at
    night (within −) — and only the within slope answers "if THIS
    user shifts an hour, what happens", the question a scheduling
    intervention actually asks. Every per-user sufficient
    statistic (n, Σx, Σy, Σx², Σxy) is an exact integer; the
    within/between sums divide by each user's own n, so those two
    are shared per-user float expressions summed over the reduced
    user table, and the pooled slope stays a pure 128-bit integer
    ratio as cross-check."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "x": df["ts"].dt.hour.to_numpy(np.int64),
            "y": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")
        return pd.DataFrame({
            "user_id": list(g.groups),
            "n": g.size().to_numpy(np.int64),
            "sx": g["x"].sum().to_numpy(np.int64),
            "sy": g["y"].sum().to_numpy(np.int64),
            "sxx": [int((v.to_numpy(np.int64).astype(object) ** 2)
                        .sum()) for _, v in g["x"]],
            "sxy": [int((a.to_numpy(np.int64).astype(object)
                         * b.to_numpy(np.int64).astype(object))
                        .sum())
                    for (_, a), (_, b) in zip(g["x"], g["y"])]})

    u = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(prep, batch_format="pandas")
        .map_batches(stats, batch_format="pandas"),
        ["user_id"], {c: (c, "sum") for c in
                      ["n", "sx", "sy", "sxx", "sxy"]}).to_pandas()
    n = u["n"].to_numpy(np.int64).astype(object)
    sx = u["sx"].to_numpy(np.int64).astype(object)
    sy = u["sy"].to_numpy(np.int64).astype(object)
    sxx = u["sxx"].to_numpy(np.int64).astype(object)
    sxy = u["sxy"].to_numpy(np.int64).astype(object)
    nf = n.astype(np.float64)
    wxy = float((sxy.astype(np.float64)
                 - sx.astype(np.float64) * sy.astype(np.float64)
                 / nf).sum())
    wxx = float((sxx.astype(np.float64)
                 - sx.astype(np.float64) * sx.astype(np.float64)
                 / nf).sum())
    bxy0 = float(((sx.astype(np.float64) / nf)
                  * (sy.astype(np.float64) / nf) * nf).sum())
    bxx0 = float(((sx.astype(np.float64) / nf)
                  * (sx.astype(np.float64) / nf) * nf).sum())
    nt = int(n.sum())
    tx, ty = int(sx.sum()), int(sy.sum())
    txx, txy = int(sxx.sum()), int(sxy.sum())
    beta_w = wxy / wxx
    beta_b = (bxy0 - float(tx) * ty / nt) \
        / (bxx0 - float(tx) * tx / nt)
    beta_p = float(nt * txy - tx * ty) / float(nt * txx - tx * tx)
    share = wxx / (float(nt * txx - tx * tx) / nt)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_events": np.array([nt], np.int64),
        "beta_within": [float(rha(beta_w, 6))],
        "beta_between": [float(rha(beta_b, 6))],
        "beta_pooled": [float(rha(beta_p, 6))],
        "within_x_share": [float(rha(share, 6))]})


@register("slope_sign_consensus_value_hour", sql="""
WITH e AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS x,
                  CAST(ROUND(value * 100) AS BIGINT) AS y
           FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM e GROUP BY 1),
s AS (SELECT n * sxy - CAST(sx AS HUGEINT) * sy AS cov,
             n * sxx - CAST(sx AS HUGEINT) * sx AS vx
      FROM u WHERE n >= 10),
f AS (SELECT CAST(SUM(CASE WHEN vx > 0 AND cov > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN vx > 0 AND cov < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS neg
      FROM s)
SELECT pos + neg AS n_users_decided, pos AS positive_slopes,
       neg AS negative_slopes,
       ROUND(CASE WHEN pos + neg > 0
                  THEN CAST(pos AS DOUBLE) / (pos + neg)
                  ELSE 0 END, 6) AS positive_share,
       ROUND(CASE WHEN pos + neg > 0
                  THEN (2.0 * pos - (pos + neg))
                       / SQRT(CAST(pos + neg AS DOUBLE))
                  ELSE 0 END, 6) AS sign_z,
       CAST(CASE WHEN pos + neg > 0
                  AND ABS((2.0 * pos - (pos + neg))
                          / SQRT(CAST(pos + neg AS DOUBLE)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS consensus_rejected
FROM f""")
def slope_sign_consensus_value_hour(sf_dir: str) -> pd.DataFrame:
    """Per-user slope-sign consensus for value~hour: among users
    with ≥ 10 events, count whose OWN OLS slope is positive vs
    negative and sign-test the split against 50/50. The
    heterogeneity check behind the FE decomposition — a pooled or
    even within-user average slope of +2¢/hour could be every
    user at +2 (consensus: personalize nothing, shift everyone) or
    half at +20 and half at −16 (no consensus: a global
    hour-policy helps half and hurts half — segment first). The
    slope's SIGN needs no division: sign(n·Σxy − ΣxΣy) with
    n·Σx² − (Σx)² > 0 as the decidability guard, so every vote is
    an exact 128-bit integer comparison; ties (cov = 0) abstain
    on both engines."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "x": df["ts"].dt.hour.to_numpy(np.int64),
            "y": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")
        return pd.DataFrame({
            "user_id": list(g.groups),
            "n": g.size().to_numpy(np.int64),
            "sx": g["x"].sum().to_numpy(np.int64),
            "sy": g["y"].sum().to_numpy(np.int64),
            "sxx": [int((v.to_numpy(np.int64).astype(object) ** 2)
                        .sum()) for _, v in g["x"]],
            "sxy": [int((a.to_numpy(np.int64).astype(object)
                         * b.to_numpy(np.int64).astype(object))
                        .sum())
                    for (_, a), (_, b) in zip(g["x"], g["y"])]})

    u = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "value"])
        .map_batches(prep, batch_format="pandas")
        .map_batches(stats, batch_format="pandas"),
        ["user_id"], {c: (c, "sum") for c in
                      ["n", "sx", "sy", "sxx", "sxy"]}).to_pandas()
    u = u[u["n"] >= 10]
    n = u["n"].to_numpy(np.int64).astype(object)
    sx = u["sx"].to_numpy(np.int64).astype(object)
    sy = u["sy"].to_numpy(np.int64).astype(object)
    sxx = u["sxx"].to_numpy(np.int64).astype(object)
    sxy = u["sxy"].to_numpy(np.int64).astype(object)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    pos = int(((vx > 0) & (cov > 0)).sum())
    neg = int(((vx > 0) & (cov < 0)).sum())
    tot = pos + neg
    z = (2.0 * pos - tot) / np.sqrt(float(tot)) if tot > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users_decided": np.array([tot], np.int64),
        "positive_slopes": np.array([pos], np.int64),
        "negative_slopes": np.array([neg], np.int64),
        "positive_share": [float(rha(pos / tot if tot else 0.0,
                                     6))],
        "sign_z": [float(rha(z, 6))],
        "consensus_rejected": np.array(
            [1 if tot > 0 and abs(z) > 1.959964 else 0],
            np.int64)})


_SESS_OUTCOME_SQL = f"""
sid AS (SELECT user_id, ts, event_id, event_type,
               SUM(ns) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM ({_NS_SQL})),
so AS (SELECT user_id, sid,
              MAX(CASE WHEN event_type = 'purchase' THEN 2
                       WHEN event_type = 'click' THEN 1
                       ELSE 0 END) AS oc
       FROM sid GROUP BY 1, 2),
pr AS (SELECT user_id, oc,
              LAG(oc) OVER (PARTITION BY user_id ORDER BY sid)
                  AS prev
       FROM so)"""


def _session_outcome_pairs(sf_dir: str) -> pd.DataFrame:
    """(prev_outcome, outcome, n) over per-user consecutive session
    pairs; outcomes 0=view-only, 1=click-no-purchase, 2=purchase.
    Sessionize + classify + pair inside user-hash buckets."""
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
        u = oc["uid"].to_numpy(np.int64)
        o = oc["oc"].to_numpy(np.int64)
        pair = np.zeros(len(oc), bool)
        pair[1:] = u[1:] == u[:-1]
        out = pd.DataFrame({"prev": np.roll(o, 1)[pair],
                            "oc": o[pair],
                            "n": np.ones(int(pair.sum()),
                                         np.int64)})
        return out.groupby(["prev", "oc"], as_index=False)["n"] \
            .sum()

    return reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id",
                         "event_type"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(partial,
                                       batch_format="pandas"),
        ["prev", "oc"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values(["prev", "oc"], ignore_index=True)


@register("session_outcome_transitions", sql=f"""
WITH {_SESS_OUTCOME_SQL},
bi AS (SELECT prev, oc, CAST(COUNT(*) AS BIGINT) AS n
       FROM pr WHERE prev IS NOT NULL GROUP BY 1, 2),
ma AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS t FROM bi GROUP BY 1)
SELECT CAST(bi.prev AS BIGINT) AS from_outcome,
       CAST(bi.oc AS BIGINT) AS to_outcome, bi.n,
       ROUND(CAST(bi.n AS DOUBLE) / ma.t, 6) AS p
FROM bi JOIN ma USING (prev) ORDER BY 1, 2""")
def session_outcome_transitions(sf_dir: str) -> pd.DataFrame:
    """The SESSION-grain Markov chain: transitions between
    consecutive same-user session OUTCOMES (0 = view-only,
    1 = clicked-no-purchase, 2 = purchased). The event-level
    transition family answers "what happens next within a visit";
    this answers what the next VISIT will be — the chain retention
    and remarketing actually operate on (a hot 1→2 row prices
    abandoned-cart follow-ups; a sticky 0→0 diagonal says
    view-only users are a basin, not a funnel stage). Sessions
    classify by their strongest event (max of the 0/1/2 level —
    one integer reduce), pairs form inside user-hash buckets in
    sid order, and the matrix is exact integer counts with one
    shared row-normalization."""
    bi = _session_outcome_pairs(sf_dir)
    ma = bi.groupby("prev")["n"].sum()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "from_outcome": bi["prev"].astype(np.int64),
        "to_outcome": bi["oc"].astype(np.int64),
        "n": bi["n"].astype(np.int64),
        "p": [float(rha(int(r["n"]) / int(ma[r["prev"]]), 6))
              for _, r in bi.iterrows()]})


@register("purchase_momentum_sessions", sql=f"""
WITH {_SESS_OUTCOME_SQL},
bi AS (SELECT prev, oc FROM pr WHERE prev IS NOT NULL),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN oc = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS to2,
             CAST(SUM(CASE WHEN prev = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS from2,
             CAST(SUM(CASE WHEN prev = 2 AND oc = 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS rep
      FROM bi)
SELECT n_pairs, from2 AS prev_purchase_sessions,
       ROUND(CAST(to2 AS DOUBLE) / n_pairs, 6) AS base_rate,
       ROUND(CASE WHEN from2 > 0
                  THEN CAST(rep AS DOUBLE) / from2
                  ELSE 0 END, 6) AS p_repeat,
       ROUND(CASE WHEN from2 > 0 AND to2 > 0
                  THEN (CAST(rep AS DOUBLE) / from2)
                       / (CAST(to2 AS DOUBLE) / n_pairs)
                  ELSE 0 END, 6) AS momentum_lift,
       ROUND(CASE WHEN from2 > 0
                  THEN (CAST(rep AS DOUBLE) / from2
                        - CAST(to2 AS DOUBLE) / n_pairs)
                       / SQRT(CAST(to2 AS DOUBLE) / n_pairs
                              * (1.0 - CAST(to2 AS DOUBLE)
                                       / n_pairs) / from2)
                  ELSE 0 END, 6) AS z,
       CAST(CASE WHEN from2 > 0
                  AND ABS((CAST(rep AS DOUBLE) / from2
                           - CAST(to2 AS DOUBLE) / n_pairs)
                          / SQRT(CAST(to2 AS DOUBLE) / n_pairs
                                 * (1.0 - CAST(to2 AS DOUBLE)
                                          / n_pairs) / from2))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS momentum_rejected
FROM s""")
def purchase_momentum_sessions(sf_dir: str) -> pd.DataFrame:
    """Cross-session purchase momentum: P(a session purchases |
    the user's PREVIOUS session purchased) against the
    unconditional purchase-session rate, with lift and a binomial
    z against the base rate (documented null: repeat sessions are
    ordinary draws). This is the single most actionable cell of
    the session-outcome chain isolated and calibrated — lift > 1
    is the repeat-buyer flywheel (spend retention budget right
    after a purchase), lift < 1 is satiation (a purchase
    SUPPRESSES the next visit's intent, so post-purchase ads are
    burned money). Exact integer counts off the same bucketed
    session-pair machinery; every ratio is a shared float
    expression."""
    bi = _session_outcome_pairs(sf_dir)
    n_pairs = int(bi["n"].sum())
    to2 = int(bi.loc[bi["oc"] == 2, "n"].sum())
    from2 = int(bi.loc[bi["prev"] == 2, "n"].sum())
    rep = int(bi.loc[(bi["prev"] == 2) & (bi["oc"] == 2),
                     "n"].sum())
    base = float(to2) / n_pairs
    p_rep = float(rep) / from2 if from2 > 0 else 0.0
    lift = p_rep / base if from2 > 0 and to2 > 0 else 0.0
    z = (p_rep - base) / np.sqrt(base * (1.0 - base) / from2) \
        if from2 > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([n_pairs], np.int64),
        "prev_purchase_sessions": np.array([from2], np.int64),
        "base_rate": [float(rha(base, 6))],
        "p_repeat": [float(rha(p_rep, 6))],
        "momentum_lift": [float(rha(lift, 6))],
        "z": [float(rha(z, 6))],
        "momentum_rejected": np.array(
            [1 if from2 > 0 and abs(z) > 1.959964 else 0],
            np.int64)})


# ---------------------------------------------------------------------------
# Multiple-testing control over the hour-of-week purchase-rate family
# ---------------------------------------------------------------------------

#: per-cell two-sided binomial-z p-values for purchase rate across the
#: 168 hour-of-week cells, Abramowitz–Stegun 26.2.17 normal tail (no erf
#: in DuckDB), identical expression structure on both engines, 9 dp.
_HW_P_SQL = """
cells AS (SELECT dayofweek(ts) AS dow, hour(ts) AS hr,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS k
          FROM events GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(k) AS DOUBLE) / SUM(n) AS p0 FROM cells),
zc AS (SELECT ABS((CAST(k AS DOUBLE) / n - p0)
                  / SQRT(p0 * (1 - p0) / n)) AS az
       FROM cells, tot),
tv AS (SELECT az, 1.0 / (1.0 + 0.2316419 * az) AS t FROM zc),
pv AS (SELECT ROUND(LEAST(
           2.0 * (0.39894228040143267 * EXP(-(az * az) / 2.0))
               * (t * (0.319381530 + t * (-0.356563782
                  + t * (1.781477937 + t * (-1.821255978
                  + t * 1.330274429))))), 1.0), 9) AS p9
       FROM tv)"""


def _hourweek_purchase_pvals(sf_dir: str) -> np.ndarray:
    """Sorted 9-dp two-sided p-values, one per non-empty hour-of-week
    cell, for H0: the cell's purchase share equals the global share.
    Only per-cell (n, purchases) integer partials leave the cluster —
    the p-value arithmetic runs on a ≤168-row driver frame."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dow": df["ts"].dt.dayofweek.to_numpy(np.int64),
            "hr": df["ts"].dt.hour.to_numpy(np.int64),
            "n": np.ones(len(df), np.int64),
            "k": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})

    cells = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dow", "hr"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas()
    p0 = float(int(cells["k"].sum())) / int(cells["n"].sum())
    n = cells["n"].to_numpy(np.float64)
    k = cells["k"].to_numpy(np.float64)
    az = np.abs((k / n - p0) / np.sqrt(p0 * (1 - p0) / n))
    t = 1.0 / (1.0 + 0.2316419 * az)
    p = 2.0 * (0.39894228040143267 * np.exp(-(az * az) / 2.0)) \
        * (t * (0.319381530 + t * (-0.356563782
           + t * (1.781477937 + t * (-1.821255978
           + t * 1.330274429)))))
    p9 = textstats.round_half_away(np.minimum(p, 1.0), 9)
    return np.sort(p9.astype(np.float64))


@register("bh_fdr_hourweek_purchase", sql=f"""
WITH {_HW_P_SQL},
r AS (SELECT p9, ROW_NUMBER() OVER (ORDER BY p9) AS i,
             COUNT(*) OVER () AS m
      FROM pv),
f AS (SELECT CAST(MAX(m) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN p9 < 0.05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS naive_sig,
             CAST(COALESCE(MAX(CASE WHEN p9 <= 0.05 * CAST(i AS DOUBLE)
                                         / m
                                    THEN i END), 0) AS BIGINT) AS bh_sig,
             MIN(p9) AS min_p
      FROM r)
SELECT m, naive_sig, bh_sig, ROUND(min_p, 9) AS min_p,
       ROUND(CASE WHEN bh_sig > 0
                  THEN 0.05 * CAST(bh_sig AS DOUBLE) / m
                  ELSE 0 END, 9) AS bh_threshold
FROM f""")
def bh_fdr_hourweek_purchase(sf_dir: str) -> pd.DataFrame:
    """Benjamini–Hochberg FDR control over the 168-test hour-of-week
    purchase-rate family. Every per-cell readout in the registry
    (hourly tables, dow indexes, hour-of-week coverage) implicitly
    runs 168 comparisons at once — at α=0.05 a NULL lattice hands an
    analyst ~8 "significant" cells, and chasing them is how hourly
    scheduling folklore is born. The step-up count (largest i with
    p_(i) ≤ 0.05·i/m) is the number of cells that survive honest
    multiplicity control; naive_sig − bh_sig is the size of the
    false-discovery haircut. Only 168 (n, k) integer partials leave
    the cluster; p-values use the shared A&S 26.2.17 tail with 9-dp
    rounding so both engines compare identical doubles, and the
    step-up scan is a window max over the sorted vector."""
    ps = _hourweek_purchase_pvals(sf_dir)
    m = len(ps)
    i = np.arange(1, m + 1, dtype=np.float64)
    flag = ps <= 0.05 * i / m
    bh = int(np.max(np.where(flag)[0]) + 1) if flag.any() else 0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "m": np.array([m], np.int64),
        "naive_sig": np.array([int((ps < 0.05).sum())], np.int64),
        "bh_sig": np.array([bh], np.int64),
        "min_p": [float(rha(float(ps[0]), 9))],
        "bh_threshold": [float(rha(0.05 * float(bh) / m, 9))
                         if bh > 0 else 0.0]})


@register("storey_pi0_hourweek_purchase", sql=f"""
WITH {_HW_P_SQL},
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN p9 > 0.5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_above
      FROM pv),
c AS (SELECT m, n_above,
             LEAST(1.0, CAST(n_above AS DOUBLE)
                        / ((1.0 - 0.5) * m)) AS pi0c
      FROM s)
SELECT m, n_above, ROUND(pi0c, 6) AS pi0,
       ROUND(m * (1.0 - pi0c), 6) AS est_nonnull,
       ROUND(pi0c * m * 0.05, 6) AS exp_fp_naive05
FROM c""")
def storey_pi0_hourweek_purchase(sf_dir: str) -> pd.DataFrame:
    """Storey's π₀ over the same 168 p-values: the estimated share of
    hour-of-week cells where NOTHING is going on, from the density of
    p-values above λ=0.5 (true nulls are uniform, so the right half
    of the histogram counts them at rate 2·#{p>½}/m). BH says WHICH
    cells survive; π₀ says how much of the family is null AT ALL —
    π₀ ≈ 1 means the purchase rate is genuinely flat across the week
    and any per-cell story is noise, while π₀ ≈ 0.7 says ~50 cells
    carry real structure and a BH pass is worth reading.
    est_nonnull = m·(1−π₀) is the plug-in count of real effects;
    exp_fp_naive05 = π₀·m·0.05 prices the naive-threshold lie.
    Same 168-partial reduce, shared 9-dp p-vector, λ fixed at the
    conventional 0.5 (documented: no spline extrapolation)."""
    ps = _hourweek_purchase_pvals(sf_dir)
    m = len(ps)
    n_above = int((ps > 0.5).sum())
    pi0c = min(1.0, n_above / ((1.0 - 0.5) * m))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "m": np.array([m], np.int64),
        "n_above": np.array([n_above], np.int64),
        "pi0": [float(rha(pi0c, 6))],
        "est_nonnull": [float(rha(m * (1.0 - pi0c), 6))],
        "exp_fp_naive05": [float(rha(pi0c * m * 0.05, 6))]})


# ---------------------------------------------------------------------------
# Active-day streak survival: continuation hazards + sBG heterogeneity fit
# ---------------------------------------------------------------------------

#: maximal consecutive-active-day runs per user (gaps-and-islands on the
#: distinct (user, epoch-day) set), right-censored runs (ending on the
#: global max day — true length unknown) excluded, reduced to a length
#: histogram. Shared by the continuation-ratio and sBG-fit queries.
_STREAK_HIST_SQL = """
ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
       FROM events),
mx AS (SELECT MAX(d) AS dmax FROM ud),
i AS (SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY d) AS grp
      FROM ud),
st AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
              MAX(d) AS last_d
       FROM i GROUP BY 1, 2),
h AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS c
      FROM st, mx WHERE last_d < dmax GROUP BY 1)"""


def _streak_len_hist(sf_dir: str) -> pd.DataFrame:
    """(len, c) histogram of uncensored active-day streak lengths.
    Distinct (user, day) pairs reduce first; islands form inside
    user-hash buckets (a user's whole day set sits in one group, so
    run boundaries are a shift compare); only (len, count) partials
    leave the cluster — the histogram is calendar-bounded."""
    def prep(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "d": (us // 86_400_000_000).astype(np.int64)}) \
            .drop_duplicates()

    ud = reduce_sink(
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow"),
        ["user_id", "d"], {"n": ("d", "size")})
    bounds = ud.map_batches(
        lambda df: pd.DataFrame({"mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    dmax = int(bounds["mx"].max())

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "d"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        brk = np.ones(len(g), bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        sid = np.cumsum(brk)
        runs = pd.DataFrame({"sid": sid, "d": d}) \
            .groupby("sid").agg(len=("d", "size"), last=("d", "max"))
        runs = runs[runs["last"] < dmax]
        out = runs.groupby("len").size().reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return out

    return reduce_sink(
        ud.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: islands(g.drop(columns=["bucket_",
                                                      "n"])),
                    batch_format="pandas"),
        ["len"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("len", ignore_index=True)


@register("streak_continuation_ratios", sql=f"""
WITH {_STREAK_HIST_SQL},
ages AS (SELECT CAST(range AS BIGINT) AS age FROM range(1, 6)),
r AS (SELECT age,
             (SELECT COALESCE(SUM(c), 0) FROM h WHERE len >= age)
                 AS ar,
             (SELECT COALESCE(SUM(c), 0) FROM h WHERE len >= age + 1)
                 AS co
      FROM ages)
SELECT age, CAST(ar AS BIGINT) AS at_risk,
       CAST(co AS BIGINT) AS continued,
       ROUND(CAST(co AS DOUBLE) / ar, 6) AS ratio
FROM r WHERE ar > 0 ORDER BY 1""")
def streak_continuation_ratios(sf_dir: str) -> pd.DataFrame:
    """Discrete continuation hazard of active-day streaks: for each
    age a = 1..5, the share of streaks that reached a days and went
    on to day a+1. The session-position hazard answers "does the
    NEXT CLICK come"; this answers "does the user come back
    TOMORROW given a days of showing up" — the day-grain habit
    curve. A RISING ratio curve is the classic survivor-selection
    signature (long streaks belong to inherently persistent users,
    not users being trained), a flat curve is memoryless
    (geometric) streaking where "don't break the chain" mechanics
    have nothing to grab. Censored runs (touching the window's last
    day) are excluded on both engines; everything reduces through
    the calendar-bounded (len, count) histogram so at_risk /
    continued are exact integers at any scale."""
    h = _streak_len_hist(sf_dir)
    ln = h["len"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    rows = []
    for a in range(1, 6):
        ar = int(c[ln >= a].sum())
        co = int(c[ln >= a + 1].sum())
        if ar > 0:
            rows.append((a, ar, co,
                         float(textstats.round_half_away(co / ar,
                                                         6))))
    return pd.DataFrame(rows, columns=["age", "at_risk",
                                       "continued", "ratio"]) \
        .astype({"age": np.int64, "at_risk": np.int64,
                 "continued": np.int64})


@register("sbg_streak_churn_fit", sql=f"""
WITH {_STREAK_HIST_SQL},
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN len >= 2 THEN c ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN len >= 3 THEN c ELSE 0 END)
                  AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN len >= 4 THEN c ELSE 0 END)
                  AS BIGINT) AS n3
      FROM h),
s AS (SELECT n0, n1, n2, n3,
             CAST(n1 AS DOUBLE) / n0 AS s1,
             CAST(n2 AS DOUBLE) / n0 AS s2,
             CAST(n3 AS DOUBLE) / n0 AS s3
      FROM n),
f AS (SELECT *,
             CASE WHEN n1 > 0 AND n2 > 0 AND s2 / s1 > s1
                       AND s1 < 1 THEN 1 ELSE 0 END AS fit_ok,
             CASE WHEN n1 > 0 THEN s2 / s1 ELSE 0 END AS r2
      FROM s),
g AS (SELECT *,
             CASE WHEN fit_ok = 1
                  THEN (1.0 - r2) / (r2 - s1) ELSE 0 END AS ab
      FROM f)
SELECT n0 AS n_streaks, CAST(fit_ok AS BIGINT) AS fit_ok,
       ROUND(CASE WHEN fit_ok = 1 THEN ab * (1.0 - s1)
                  ELSE 0 END, 6) AS alpha,
       ROUND(CASE WHEN fit_ok = 1 THEN ab * s1 ELSE 0 END, 6)
           AS beta,
       ROUND(s1, 6) AS s1_obs, ROUND(s2, 6) AS s2_obs,
       ROUND(s3, 6) AS s3_obs,
       ROUND(CASE WHEN fit_ok = 1
                  THEN s2 * (ab * s1 + 2.0) / (ab + 2.0)
                  ELSE 0 END, 6) AS s3_sbg,
       ROUND(s1 * s1 * s1, 6) AS s3_geo
FROM g""")
def sbg_streak_churn_fit(sf_dir: str) -> pd.DataFrame:
    """Fader–Hardie shifted-beta-geometric fit to streak survival:
    each streak flips a coin with its OWN hidden continuation
    probability θ ~ Beta(β, α), so the population survival is
    S(t) = Π (β+k−1)/(α+β+k−1) with RISING observed ratios even
    though every individual is memoryless. α and β come in closed
    form from the first two survival points (s1 = β/(α+β),
    s2/s1 = (β+1)/(α+β+1) — two equations, exact algebra, no
    optimizer), then the model is SCORED on the held-out third
    point: |s3_sbg − s3_obs| vs |s3_geo − s3_obs| is a one-line
    model comparison between heterogeneous-memoryless and
    homogeneous-memoryless — if sBG wins, "average churn rate" is
    a fiction and any streak-based LTV math must integrate over
    the fitted Beta. fit_ok guards the degenerate cases (flat or
    falling ratios) identically on both engines; all survival
    counts are exact integers off the shared histogram."""
    h = _streak_len_hist(sf_dir)
    ln = h["len"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    n0 = int(c.sum())
    n1 = int(c[ln >= 2].sum())
    n2 = int(c[ln >= 3].sum())
    n3 = int(c[ln >= 4].sum())
    s1 = float(n1) / n0
    s2 = float(n2) / n0
    s3 = float(n3) / n0
    r2 = s2 / s1 if n1 > 0 else 0.0
    fit_ok = 1 if (n1 > 0 and n2 > 0 and r2 > s1 and s1 < 1) else 0
    ab = (1.0 - r2) / (r2 - s1) if fit_ok else 0.0
    alpha = ab * (1.0 - s1) if fit_ok else 0.0
    beta = ab * s1 if fit_ok else 0.0
    s3_sbg = s2 * (ab * s1 + 2.0) / (ab + 2.0) if fit_ok else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_streaks": np.array([n0], np.int64),
        "fit_ok": np.array([fit_ok], np.int64),
        "alpha": [float(rha(alpha, 6))],
        "beta": [float(rha(beta, 6))],
        "s1_obs": [float(rha(s1, 6))],
        "s2_obs": [float(rha(s2, 6))],
        "s3_obs": [float(rha(s3, 6))],
        "s3_sbg": [float(rha(s3_sbg, 6))],
        "s3_geo": [float(rha(s1 * s1 * s1, 6))]})


# ---------------------------------------------------------------------------
# Spatial autocorrelation on the clock: Moran's I / Geary's C over the
# cyclic 168-cell hour-of-week lattice (ring adjacency, ±1 hour)
# ---------------------------------------------------------------------------

#: zero-filled 168-cell hour-of-week count lattice with the cyclic
#: +1-hour neighbor joined on (hw+1) % 168. dow convention does not
#: matter for the STATISTICS (any consistent labeling yields the same
#: ring), but both engines must order cells the same way — the oracle
#: builds hw from DuckDB's dayofweek and Python mirrors it exactly by
#: shifting pandas' Monday-0 to Sunday-0.
_HW_RING_SQL = """
cnt AS (SELECT (dayofweek(ts) * 24 + hour(ts)) AS hw,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
lat AS (SELECT CAST(r.range AS BIGINT) AS hw,
               COALESCE(c.x, 0) AS x
        FROM range(0, 168) r LEFT JOIN cnt c ON c.hw = r.range),
ring AS (SELECT a.hw, a.x, b.x AS nx
         FROM lat a JOIN lat b ON b.hw = (a.hw + 1) % 168),
tot AS (SELECT CAST(SUM(x) AS HUGEINT) AS s,
               CAST(COUNT(*) AS HUGEINT) AS n FROM lat)"""


def _hourweek_ring(sf_dir: str) -> pd.DataFrame:
    """Zero-filled (hw, x, nx) ring lattice, hw = sunday0_dow*24+hour
    to match DuckDB's dayofweek. Only 168 (cell, count) partials
    leave the cluster regardless of event volume."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        dow = (df["ts"].dt.dayofweek.to_numpy(np.int64) + 1) % 7
        return pd.DataFrame({
            "hw": dow * 24 + df["ts"].dt.hour.to_numpy(np.int64),
            "n": np.ones(len(df), np.int64)})

    c = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["hw"], {"n": ("n", "sum")}).to_pandas()
    lat = pd.DataFrame({"hw": np.arange(168, dtype=np.int64)})
    lat = lat.merge(c, on="hw", how="left").fillna(0)
    x = lat["n"].to_numpy(np.int64)
    return pd.DataFrame({"hw": lat["hw"],
                         "x": x, "nx": np.roll(x, -1)})


@register("morans_i_hourweek", sql=f"""
WITH {_HW_RING_SQL},
m AS (SELECT CAST(SUM((n * r.x - s) * (n * r.nx - s)) AS DOUBLE)
          AS num,
             CAST(SUM((n * r.x - s) * (n * r.x - s)) AS DOUBLE)
          AS den
      FROM ring r, tot),
st AS (SELECT num / den AS i,
              -1.0 / (168.0 - 1.0) AS ei,
              (168.0 * 168.0 * (4.0 * 168) - 168.0 * (16.0 * 168)
               + 3.0 * (2.0 * 168) * (2.0 * 168))
              / ((2.0 * 168) * (2.0 * 168)
                 * (168.0 * 168.0 - 1.0))
              - (1.0 / (168.0 - 1.0)) * (1.0 / (168.0 - 1.0))
                  AS vi
      FROM m)
SELECT CAST(168 AS BIGINT) AS n_cells,
       ROUND(i, 6) AS moran_i, ROUND(ei, 6) AS expected_i,
       ROUND((i - ei) / SQRT(vi), 6) AS z,
       CAST(CASE WHEN (i - ei) / SQRT(vi) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS clustered
FROM st""")
def morans_i_hourweek(sf_dir: str) -> pd.DataFrame:
    """Moran's I over the hour-of-week activity lattice with cyclic
    ±1-hour ring adjacency — "is load at 9am Tuesday informative
    about 10am Tuesday" asked as one global statistic instead of
    168 eyeballed cells. On a ring, I reduces to the circular lag-1
    autocorrelation of cell counts, but the Moran framing buys the
    analytic null: E[I] = −1/(n−1) and the normality variance from
    the weight-matrix moments (S0=2n, S1=4n, S2=16n — exact for
    this W, stated in closed form on both engines). A significant
    positive I says hourly capacity can be planned on smooth
    block schedules; I ≈ E[I] says adjacent hours are as unrelated
    as random cells and per-hour independence assumptions hold.
    The cross/self products use the n·x−S integer scaling so both
    sums are exact HUGEINT before the single division; only 168
    count partials leave the cluster."""
    r = _hourweek_ring(sf_dir)
    x = r["x"].to_numpy(np.int64).astype(object)
    nx = r["nx"].to_numpy(np.int64).astype(object)
    n = 168
    s = int(x.sum())
    num = int(((n * x - s) * (n * nx - s)).sum())
    den = int(((n * x - s) * (n * x - s)).sum())
    i = float(num) / float(den)
    ei = -1.0 / (168.0 - 1.0)
    vi = (168.0 * 168.0 * (4.0 * 168) - 168.0 * (16.0 * 168)
          + 3.0 * (2.0 * 168) * (2.0 * 168)) \
        / ((2.0 * 168) * (2.0 * 168) * (168.0 * 168.0 - 1.0)) \
        - (1.0 / (168.0 - 1.0)) * (1.0 / (168.0 - 1.0))
    z = (i - ei) / np.sqrt(vi)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_cells": np.array([168], np.int64),
        "moran_i": [float(rha(i, 6))],
        "expected_i": [float(rha(ei, 6))],
        "z": [float(rha(z, 6))],
        "clustered": np.array([1 if z > 1.959964 else 0],
                              np.int64)})


@register("gearys_c_hourweek", sql=f"""
WITH {_HW_RING_SQL},
m AS (SELECT CAST(SUM((r.x - r.nx) * (r.x - r.nx)) AS HUGEINT)
          AS sd2,
             (SELECT CAST(SUM((n * l.x - s) * (n * l.x - s))
                          AS HUGEINT)
              FROM lat l, tot) AS den
      FROM ring r),
st AS (SELECT (168.0 * (168.0 - 1.0) * CAST(sd2 AS DOUBLE))
              / (2.0 * CAST(den AS DOUBLE)) AS c,
              ((2.0 * (4.0 * 168) + (16.0 * 168)) * (168.0 - 1.0)
               - 4.0 * (2.0 * 168) * (2.0 * 168))
              / (2.0 * (168.0 + 1.0) * (2.0 * 168) * (2.0 * 168))
                  AS vc
      FROM m)
SELECT CAST(168 AS BIGINT) AS n_cells,
       ROUND(c, 6) AS geary_c,
       ROUND((1.0 - c) / SQRT(vc), 6) AS z,
       CAST(CASE WHEN (1.0 - c) / SQRT(vc) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS clustered
FROM st""")
def gearys_c_hourweek(sf_dir: str) -> pd.DataFrame:
    """Geary's C on the same ring — the LOCAL-difference companion:
    where Moran's I cross-multiplies deviations from the global
    mean (dominated by which half of the week a cell sits in),
    C sums squared neighbor-to-neighbor steps, so it is the
    statistic sensitive to sharp hour-to-hour cliffs. I and C
    disagreeing is itself the finding: I high with C near 1 means
    broad day/night swells with jagged local texture (cache
    warmers help, per-hour autoscaling won't), I modest with C
    well below 1 means locally smooth creep (ramped autoscaling
    is safe). E[C] = 1; z is signed as (1−C)/sd so positive means
    clustering, matching the Moran readout. The step sum is raw
    integer (no mean involved), the denominator reuses the n·x−S
    scaling, and the normality variance comes from the same exact
    ring moments."""
    r = _hourweek_ring(sf_dir)
    x = r["x"].to_numpy(np.int64).astype(object)
    nx = r["nx"].to_numpy(np.int64).astype(object)
    n = 168
    s = int(x.sum())
    sd2 = int(((x - nx) * (x - nx)).sum())
    den = int(((n * x - s) * (n * x - s)).sum())
    c = (168.0 * (168.0 - 1.0) * float(sd2)) / (2.0 * float(den))
    vc = ((2.0 * (4.0 * 168) + (16.0 * 168)) * (168.0 - 1.0)
          - 4.0 * (2.0 * 168) * (2.0 * 168)) \
        / (2.0 * (168.0 + 1.0) * (2.0 * 168) * (2.0 * 168))
    z = (1.0 - c) / np.sqrt(vc)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_cells": np.array([168], np.int64),
        "geary_c": [float(rha(c, 6))],
        "z": [float(rha(z, 6))],
        "clustered": np.array([1 if z > 1.959964 else 0],
                              np.int64)})


# ---------------------------------------------------------------------------
# Ratio-metric inference under user-level clustering (delta method)
# ---------------------------------------------------------------------------

@register("delta_method_value_per_session", sql="""
WITH sv AS (SELECT user_id,
                   SUM(ns) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                   cents
            FROM (SELECT user_id, ts, event_id,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents,
                         CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) IS NULL
                                   OR epoch_us(ts) - epoch_us(
                                       LAG(ts) OVER (PARTITION BY
                                           user_id
                                           ORDER BY ts, event_id))
                                      >= 1800000000
                              THEN 1 ELSE 0 END AS ns
                  FROM events)),
ses AS (SELECT user_id, sid, CAST(SUM(cents) AS BIGINT) AS v
        FROM sv GROUP BY 1, 2),
usr AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS s,
               CAST(SUM(v) AS BIGINT) AS v,
               CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS vv2
        FROM ses GROUP BY 1),
mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS HUGEINT) AS ss,
               CAST(SUM(v) AS HUGEINT) AS svv,
               CAST(SUM(CAST(s AS HUGEINT) * s) AS HUGEINT) AS sss,
               CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sv2,
               CAST(SUM(CAST(s AS HUGEINT) * v) AS HUGEINT) AS ssv,
               CAST(SUM(vv2) AS HUGEINT) AS sx2
        FROM usr),
st AS (SELECT n, ss,
              CAST(svv AS DOUBLE) / CAST(ss AS DOUBLE) AS r,
              CAST(ss AS DOUBLE) / n AS sbar,
              CAST(n * sv2 - svv * svv AS DOUBLE)
                  / (n * (n - 1.0)) AS var_v,
              CAST(n * sss - ss * ss AS DOUBLE)
                  / (n * (n - 1.0)) AS var_s,
              CAST(n * ssv - ss * svv AS DOUBLE)
                  / (n * (n - 1.0)) AS cov_sv,
              CAST(ss * sx2 - svv * svv AS DOUBLE)
                  / (CAST(ss AS DOUBLE)
                     * (CAST(ss AS DOUBLE) - 1.0)) AS var_x
       FROM mom),
fin AS (SELECT n, ss, r,
               (var_v - 2.0 * r * cov_sv + r * r * var_s)
                   / (n * sbar * sbar) AS var_r,
               var_x / CAST(ss AS DOUBLE) AS var_naive
        FROM st)
SELECT n AS n_users, CAST(ss AS BIGINT) AS n_sessions,
       ROUND(r / 100.0, 6) AS value_per_session,
       ROUND(SQRT(var_r) / 100.0, 6) AS se_delta,
       ROUND(SQRT(var_naive) / 100.0, 6) AS se_naive,
       ROUND(var_r / var_naive, 6) AS design_effect,
       ROUND((r - 1.959964 * SQRT(var_r)) / 100.0, 6) AS ci_lo,
       ROUND((r + 1.959964 * SQRT(var_r)) / 100.0, 6) AS ci_hi
FROM fin""")
def delta_method_value_per_session(sf_dir: str) -> pd.DataFrame:
    """Delta-method standard error for value-per-session when the
    randomization unit is the USER (Deng et al.'s ratio-metric
    correction — the single most load-bearing formula in modern
    A/B infrastructure). Sessions of one user share that user's
    propensities, so treating each session as an independent
    observation understates the variance by the design effect;
    the delta method propagates user-level (sessions, value)
    covariance into Var(Σv/Σs). se_naive is the session-iid lie,
    design_effect = Var_delta/Var_naive is the factor every
    session-grain t-test on this data is anti-conservative by,
    and the CI is the one an experiment readout should print.
    Sessionization and per-session sums happen once inside
    user-hash buckets; the driver sees one row per user
    (s_u, v_u, Σv_sess²) and every moment is an exact
    integer before the few shared float expressions."""
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = uid[1:] == uid[:-1]
        gap = us - np.roll(us, 1)
        ns = (~same) | (gap >= 1_800_000_000)
        sid = np.cumsum(ns)
        ses = pd.DataFrame({"sid": sid, "uid": uid, "v": cents}) \
            .groupby("sid", sort=False).agg(uid=("uid", "first"),
                                            v=("v", "sum"))
        ses["vv2"] = ses["v"].to_numpy(np.int64) ** 2
        out = ses.groupby("uid").agg(
            s=("v", "size"), v=("v", "sum"), vv2=("vv2", "sum"))
        return out.reset_index().rename(columns={"uid": "user_id"})

    usr = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(lambda g: per_user(g.drop(columns=["bucket_"])),
                    batch_format="pandas"),
        ["user_id"], {"s": ("s", "sum"), "v": ("v", "sum"),
                      "vv2": ("vv2", "sum")}).to_pandas()
    n = len(usr)
    s = usr["s"].to_numpy(np.int64).astype(object)
    v = usr["v"].to_numpy(np.int64).astype(object)
    ss, svv = int(s.sum()), int(v.sum())
    sss, sv2 = int((s * s).sum()), int((v * v).sum())
    ssv = int((s * v).sum())
    sx2 = int(usr["vv2"].to_numpy(np.int64).astype(object).sum())
    r = float(svv) / float(ss)
    sbar = float(ss) / n
    var_v = float(n * sv2 - svv * svv) / (n * (n - 1.0))
    var_s = float(n * sss - ss * ss) / (n * (n - 1.0))
    cov_sv = float(n * ssv - ss * svv) / (n * (n - 1.0))
    var_x = float(ss * sx2 - svv * svv) \
        / (float(ss) * (float(ss) - 1.0))
    var_r = (var_v - 2.0 * r * cov_sv + r * r * var_s) \
        / (n * sbar * sbar)
    var_naive = var_x / float(ss)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "n_sessions": np.array([ss], np.int64),
        "value_per_session": [float(rha(r / 100.0, 6))],
        "se_delta": [float(rha(np.sqrt(var_r) / 100.0, 6))],
        "se_naive": [float(rha(np.sqrt(var_naive) / 100.0, 6))],
        "design_effect": [float(rha(var_r / var_naive, 6))],
        "ci_lo": [float(rha((r - 1.959964 * np.sqrt(var_r))
                            / 100.0, 6))],
        "ci_hi": [float(rha((r + 1.959964 * np.sqrt(var_r))
                            / 100.0, 6))]})


@register("delta_method_ctr_per_user", sql="""
WITH usr AS (SELECT user_id,
                    CAST(SUM(CASE WHEN event_type = 'view'
                                  THEN 1 ELSE 0 END) AS BIGINT)
                        AS v,
                    CAST(SUM(CASE WHEN event_type = 'click'
                                  THEN 1 ELSE 0 END) AS BIGINT)
                        AS c
             FROM events GROUP BY 1),
f AS (SELECT * FROM usr WHERE v > 0),
mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS HUGEINT) AS sv,
               CAST(SUM(c) AS HUGEINT) AS sc,
               CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv,
               CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc,
               CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS svc
        FROM f),
st AS (SELECT n, sv, sc,
              CAST(sc AS DOUBLE) / CAST(sv AS DOUBLE) AS r,
              CAST(sv AS DOUBLE) / n AS vbar,
              CAST(n * scc - sc * sc AS DOUBLE)
                  / (n * (n - 1.0)) AS var_c,
              CAST(n * svv - sv * sv AS DOUBLE)
                  / (n * (n - 1.0)) AS var_v,
              CAST(n * svc - sv * sc AS DOUBLE)
                  / (n * (n - 1.0)) AS cov_vc
       FROM mom),
fin AS (SELECT n, sv, r,
               (var_c - 2.0 * r * cov_vc + r * r * var_v)
                   / (n * vbar * vbar) AS var_r,
               r * r * (1.0 / CAST(sc AS DOUBLE)
                        + 1.0 / CAST(sv AS DOUBLE)) AS var_naive
        FROM st)
SELECT n AS n_users, CAST(sv AS BIGINT) AS n_views,
       ROUND(r, 6) AS ctr,
       ROUND(SQRT(var_r), 6) AS se_delta,
       ROUND(SQRT(var_naive), 6) AS se_naive,
       ROUND(var_r / var_naive, 6) AS design_effect
FROM fin""")
def delta_method_ctr_per_user(sf_dir: str) -> pd.DataFrame:
    """The canonical delta-method example: clicks-per-view
    Σclicks/Σviews with users as the independent unit. The naive
    SE treats the two totals as independent Poisson counts
    (Var(C/V) ≈ R²(1/C + 1/V) — the textbook ratio-of-counts
    formula, chosen over the binomial p(1−p)/N form because
    clicks here are sibling events, not marks on views, and the
    ratio can exceed 1); real users contribute correlated bundles
    of both, and the delta method's user-level (views, clicks)
    covariance is the honest variance. design_effect is the number
    to remember: a CTR experiment needs design_effect × the naive
    sample size, and every historical "significant" movement whose
    z was under √design_effect × 1.96 was noise. Users with zero
    views drop on both engines; per-user partials reduce in the
    cluster and six integer moments reach the driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "v": (et == "view").astype(np.int64),
            "c": (et == "click").astype(np.int64)})

    usr = reduce_sink(
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"v": ("v", "sum"), "c": ("c", "sum")}) \
        .to_pandas()
    usr = usr[usr["v"] > 0]
    n = len(usr)
    v = usr["v"].to_numpy(np.int64).astype(object)
    c = usr["c"].to_numpy(np.int64).astype(object)
    sv, sc = int(v.sum()), int(c.sum())
    svv, scc = int((v * v).sum()), int((c * c).sum())
    svc = int((v * c).sum())
    r = float(sc) / float(sv)
    vbar = float(sv) / n
    var_c = float(n * scc - sc * sc) / (n * (n - 1.0))
    var_v = float(n * svv - sv * sv) / (n * (n - 1.0))
    cov_vc = float(n * svc - sv * sc) / (n * (n - 1.0))
    var_r = (var_c - 2.0 * r * cov_vc + r * r * var_v) \
        / (n * vbar * vbar)
    var_naive = r * r * (1.0 / float(sc) + 1.0 / float(sv))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "n_views": np.array([sv], np.int64),
        "ctr": [float(rha(r, 6))],
        "se_delta": [float(rha(np.sqrt(var_r), 6))],
        "se_naive": [float(rha(np.sqrt(var_naive), 6))],
        "design_effect": [float(rha(var_r / var_naive, 6))]})


# ---------------------------------------------------------------------------
# Group-fairness audit of a threshold rule across market segments
# ---------------------------------------------------------------------------

#: confusion counts per market segment for the fixed rule
#: "predict purchase when cents >= global lower-median cents".
#: Threshold from the bounded cents histogram (exact at any scale),
#: facts join the broadcast custkey->segment dimension map-side.
_SEG_CONF_SQL = """
ec AS (SELECT c.c_mktsegment AS segment,
              CAST(ROUND(e.value * 100) AS BIGINT) AS cents,
              CASE WHEN e.event_type = 'purchase'
                   THEN 1 ELSE 0 END AS y
       FROM events e JOIN customer c ON e.user_id = c.c_custkey),
hist AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS c
         FROM ec GROUP BY 1),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
med AS (SELECT MIN(v) AS thr
        FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM hist),
             nn
        WHERE cum >= (n + 1) // 2),
seg AS (SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN cents >= thr
                             THEN 1 ELSE 0 END) AS BIGINT) AS pp,
               CAST(SUM(CASE WHEN cents >= thr AND y = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp
        FROM ec, med GROUP BY 1)"""


def _segment_confusion(sf_dir: str) -> tuple[pd.DataFrame, int]:
    """(per-segment confusion frame, threshold cents). Two passes:
    the bounded cents histogram fixes the exact lower-median
    threshold, then segment-tagged confusion partials reduce —
    the dimension broadcasts once via ray.put, never shuffles."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    cmap_ref = ray.put(dict(zip(cust["c_custkey"]
                                .to_numpy(np.int64),
                                cust["c_mktsegment"])))

    def cents_hist(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        keep = df["user_id"].map(cmap).notna().to_numpy()
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)[keep]
        out = pd.DataFrame({"v": cents}).groupby("v").size() \
            .reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return out

    ds = _events(sf_dir, ["user_id", "value", "event_type"])
    hist = reduce_sink(
        ds.map_batches(cents_hist, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("v", ignore_index=True)
    n = int(hist["c"].sum())
    cum = hist["c"].to_numpy(np.int64).cumsum()
    thr = int(hist["v"].to_numpy(np.int64)[
        np.searchsorted(cum, (n + 1) // 2)])

    def conf(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        seg = df["user_id"].map(cmap)
        keep = seg.notna().to_numpy()
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)[keep]
        y = (df["event_type"].to_numpy() == "purchase") \
            .astype(np.int64)[keep]
        pred = (cents >= thr).astype(np.int64)
        return pd.DataFrame({
            "segment": seg[keep].to_numpy(),
            "n": np.ones(keep.sum(), np.int64),
            "pos": y, "pp": pred, "tp": pred * y})

    seg = reduce_sink(
        ds.map_batches(conf, batch_format="pandas"),
        ["segment"], {"n": ("n", "sum"), "pos": ("pos", "sum"),
                      "pp": ("pp", "sum"), "tp": ("tp", "sum")}) \
        .to_pandas().sort_values("segment", ignore_index=True)
    return seg, thr


@register("equalized_odds_by_segment", sql=f"""
WITH {_SEG_CONF_SQL}
SELECT segment, n AS n_events,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS base_rate,
       ROUND(CAST(pp AS DOUBLE) / n, 6) AS ppr,
       ROUND(CAST(tp AS DOUBLE) / pos, 6) AS tpr,
       ROUND(CAST(pp - tp AS DOUBLE) / (n - pos), 6) AS fpr
FROM seg ORDER BY segment""")
def equalized_odds_by_segment(sf_dir: str) -> pd.DataFrame:
    """Per-market-segment error profile of one fixed decision rule
    (predict purchase when the event's value clears the global
    lower-median). This is the separation half of an ML bias
    audit: ppr is demographic parity (who gets flagged), tpr/fpr
    are equalized odds (who gets flagged CORRECTLY). A rule that
    looks neutral in aggregate routinely hides a segment whose
    purchases are systematically cheaper — low tpr there means the
    "high-intent" flag structurally misses that segment, and any
    downstream budget keyed to the flag underfunds it. The
    dimension broadcasts once; confusion cells are exact integer
    partials; the threshold is pinned by the bounded cents
    histogram so both engines audit the SAME rule."""
    seg, _ = _segment_confusion(sf_dir)
    n = seg["n"].to_numpy(np.int64)
    pos = seg["pos"].to_numpy(np.int64)
    pp = seg["pp"].to_numpy(np.int64)
    tp = seg["tp"].to_numpy(np.int64)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "segment": seg["segment"],
        "n_events": n,
        "base_rate": rha(pos / n, 6),
        "ppr": rha(pp / n, 6),
        "tpr": rha(tp / pos, 6),
        "fpr": rha((pp - tp) / (n - pos), 6)})


@register("fairness_impossibility_audit", sql=f"""
WITH {_SEG_CONF_SQL},
r AS (SELECT CAST(pos AS DOUBLE) / n AS base_rate,
             CAST(pp AS DOUBLE) / n AS ppr,
             CAST(tp AS DOUBLE) / pos AS tpr,
             CAST(pp - tp AS DOUBLE) / (n - pos) AS fpr,
             CAST(tp AS DOUBLE) / pp AS prec
      FROM seg)
SELECT (SELECT CAST(thr AS BIGINT) FROM med) AS thr_cents,
       CAST((SELECT COUNT(*) FROM seg) AS BIGINT) AS n_segments,
       ROUND(MAX(base_rate) - MIN(base_rate), 6) AS base_rate_gap,
       ROUND(MAX(ppr) - MIN(ppr), 6) AS dp_gap,
       ROUND(MAX(tpr) - MIN(tpr), 6) AS tpr_gap,
       ROUND(MAX(fpr) - MIN(fpr), 6) AS fpr_gap,
       ROUND(MAX(prec) - MIN(prec), 6) AS calib_gap
FROM r""")
def fairness_impossibility_audit(sf_dir: str) -> pd.DataFrame:
    """The Kleinberg–Chouldechova impossibility readout in one row:
    max-minus-min across segments of base rate, predicted-positive
    rate (demographic parity), TPR/FPR (equalized odds) and
    precision (calibration / predictive parity) for the same
    median-threshold rule. The theorem says that with unequal base
    rates NO rule can zero both the calibration gap and the
    equalized-odds gaps — so the actionable reading is relative:
    whichever gap dominates tells you which fairness criterion this
    rule already sacrifices, and base_rate_gap sizes the wiggle
    room (near-zero base-rate gap means the impossibility bites
    softly and both gaps could be closed). Same exact per-segment
    confusion cells; five segments make every max/min a 5-row
    driver scan."""
    seg, thr = _segment_confusion(sf_dir)
    n = seg["n"].to_numpy(np.float64)
    pos = seg["pos"].to_numpy(np.float64)
    pp = seg["pp"].to_numpy(np.float64)
    tp = seg["tp"].to_numpy(np.float64)
    base = pos / n
    ppr = pp / n
    tpr = tp / pos
    fpr = (pp - tp) / (n - pos)
    prec = tp / pp
    rha = textstats.round_half_away
    return pd.DataFrame({
        "thr_cents": np.array([thr], np.int64),
        "n_segments": np.array([len(seg)], np.int64),
        "base_rate_gap": [float(rha(base.max() - base.min(), 6))],
        "dp_gap": [float(rha(ppr.max() - ppr.min(), 6))],
        "tpr_gap": [float(rha(tpr.max() - tpr.min(), 6))],
        "fpr_gap": [float(rha(fpr.max() - fpr.min(), 6))],
        "calib_gap": [float(rha(prec.max() - prec.min(), 6))]})


# ---------------------------------------------------------------------------
# External cluster validity: V-measure + Fowlkes–Mallows on the
# nearest-centroid assignment vs true labels (same contingency as ARI)
# ---------------------------------------------------------------------------

#: nearest-centroid confusion contingency — the same assignment
#: convention as centroid_confusion / centroid_label_ari (9dp-rounded
#: cosine argmax, smaller-label ties).
_CENTROID_CONF_SQL = """
u AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
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
                ORDER BY sim DESC, pred_label) AS rk FROM s),
conf AS (SELECT true_label, pred_label,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM r WHERE rk = 1 GROUP BY 1, 2)"""


@register("v_measure_centroid_labels", sql=f"""
WITH {_CENTROID_CONF_SQL},
tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn,
              CAST(SUM(n) AS BIGINT) AS ni FROM conf),
pk AS (SELECT pred_label, CAST(SUM(n) AS BIGINT) AS nk
       FROM conf GROUP BY 1),
pc AS (SELECT true_label, CAST(SUM(n) AS BIGINT) AS nc
       FROM conf GROUP BY 1),
hc AS (SELECT -SUM((n / nn) * LN(CAST(n AS DOUBLE) / nk)) AS h_c_k,
              -SUM((n / nn) * LN(CAST(n AS DOUBLE) / nc)) AS h_k_c
       FROM conf JOIN pk USING (pred_label)
                 JOIN pc USING (true_label), tt),
hm AS (SELECT (SELECT -SUM((nc / nn) * LN(nc / nn)) FROM pc, tt)
                  AS h_c,
              (SELECT -SUM((nk / nn) * LN(nk / nn)) FROM pk, tt)
                  AS h_k),
hv AS (SELECT CASE WHEN h_c = 0 THEN 1.0
                   ELSE 1.0 - h_c_k / h_c END AS h,
              CASE WHEN h_k = 0 THEN 1.0
                   ELSE 1.0 - h_k_c / h_k END AS cm
       FROM hc, hm)
SELECT (SELECT ni FROM tt) AS n_points,
       ROUND(h, 6) AS homogeneity, ROUND(cm, 6) AS completeness,
       ROUND(CASE WHEN h + cm = 0 THEN 0.0
                  ELSE 2.0 * h * cm / (h + cm) END, 6) AS v_measure
FROM hv""")
def v_measure_centroid_labels(sf_dir: str) -> pd.DataFrame:
    """Homogeneity / completeness / V-measure (Rosenberg &
    Hirschberg 2007) of the nearest-centroid clustering against
    true labels. ARI scores pair agreement in one number; this
    decomposes WHY a clustering is wrong: low homogeneity = merged
    clusters (each cluster mixes labels — split them), low
    completeness = shattered labels (one label sprays across
    clusters — merge or re-k). The pair is the confusion-matrix
    diagnosis an ARI of 0.6 can't give, and V is their harmonic
    mean with the standard degenerate conventions (H=0 → 1,
    h+c=0 → 0) applied identically on both engines. Conditional
    and marginal entropies are float sums over the ≤|labels|²
    exact-integer contingency — nothing beyond the tiny confusion
    table ever reaches the driver."""
    conf = centroid_confusion(sf_dir)
    n = conf["n"].to_numpy(np.int64)
    nn = float(n.sum())
    nk = conf.merge(conf.groupby("pred_label", as_index=False)["n"]
                    .sum().rename(columns={"n": "nk"}),
                    on="pred_label")["nk"].to_numpy(np.int64)
    nc = conf.merge(conf.groupby("true_label", as_index=False)["n"]
                    .sum().rename(columns={"n": "nc"}),
                    on="true_label")["nc"].to_numpy(np.int64)
    h_c_k = float(-((n / nn) * np.log(n.astype(np.float64) / nk))
                  .sum())
    h_k_c = float(-((n / nn) * np.log(n.astype(np.float64) / nc))
                  .sum())
    a = conf.groupby("true_label")["n"].sum().to_numpy(np.int64)
    b = conf.groupby("pred_label")["n"].sum().to_numpy(np.int64)
    h_c = float(-((a / nn) * np.log(a / nn)).sum())
    h_k = float(-((b / nn) * np.log(b / nn)).sum())
    h = 1.0 if h_c == 0 else 1.0 - h_c_k / h_c
    cm = 1.0 if h_k == 0 else 1.0 - h_k_c / h_k
    v = 0.0 if h + cm == 0 else 2.0 * h * cm / (h + cm)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_points": np.array([int(n.sum())], np.int64),
        "homogeneity": [float(rha(h, 6))],
        "completeness": [float(rha(cm, 6))],
        "v_measure": [float(rha(v, 6))]})


@register("fowlkes_mallows_centroid_labels", sql=f"""
WITH {_CENTROID_CONF_SQL},
ix AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS idx FROM conf),
ra AS (SELECT CAST(SUM(a * (a - 1) / 2) AS BIGINT) AS sa
       FROM (SELECT SUM(n) AS a FROM conf GROUP BY true_label)),
rb AS (SELECT CAST(SUM(b * (b - 1) / 2) AS BIGINT) AS sb
       FROM (SELECT SUM(n) AS b FROM conf GROUP BY pred_label)),
tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM conf)
SELECT tt.nn AS n_points, ix.idx AS tp_pairs,
       ROUND(ix.idx / SQRT(CAST(ra.sa AS DOUBLE) * rb.sb), 6)
           AS fm,
       ROUND(SQRT(CAST(ra.sa AS DOUBLE) * rb.sb)
             / (tt.nn * (tt.nn - 1) / 2), 6) AS chance_fm
FROM ix, ra, rb, tt""")
def fowlkes_mallows_centroid_labels(sf_dir: str) -> pd.DataFrame:
    """Fowlkes–Mallows index on the same contingency: the geometric
    mean of pair-precision and pair-recall, FM = TP/√(TP+FP)(TP+FN)
    over co-clustered pairs. Its value next to ARI is the
    robustness check the clustering literature recommends — FM
    stays meaningful when cluster-count differs wildly from
    label-count (where Rand-family indices saturate), and
    FM >> chance_fm (its random-permutation expectation
    √(ΣC(a,2)·ΣC(b,2))/C(n,2)) is the calibrated read. All four
    pair counts are exact integers off the confusion table; two
    rounded float divisions close it."""
    conf = centroid_confusion(sf_dir)
    n_ij = conf["n"].to_numpy(np.int64)
    idx = int((n_ij * (n_ij - 1) // 2).sum())
    a = conf.groupby("true_label")["n"].sum().to_numpy(np.int64)
    b = conf.groupby("pred_label")["n"].sum().to_numpy(np.int64)
    sa = int((a * (a - 1) // 2).sum())
    sb = int((b * (b - 1) // 2).sum())
    nn = int(n_ij.sum())
    cn2 = nn * (nn - 1) // 2
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_points": np.array([nn], np.int64),
        "tp_pairs": np.array([idx], np.int64),
        "fm": [float(rha(idx / np.sqrt(float(sa) * sb), 6))],
        "chance_fm": [float(rha(np.sqrt(float(sa) * sb) / cn2,
                                6))]})


# ---------------------------------------------------------------------------
# Chance-corrected agreement beyond Cohen: Gwet's AC1 + Krippendorff's α
# ---------------------------------------------------------------------------

@register("gwet_ac1_period_modal_type", sql="""
WITH b AS (SELECT user_id, event_type AS g,
                  epoch_us(ts) // 86400000000 AS d FROM events),
sp AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS cut FROM b),
pc AS (SELECT user_id, CASE WHEN d < cut THEN 0 ELSE 1 END AS per, g,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM b, sp GROUP BY 1, 2, 3),
m AS (SELECT user_id, per, g,
             ROW_NUMBER() OVER (PARTITION BY user_id, per
                                ORDER BY c DESC, g) AS rn
      FROM pc),
modal AS (SELECT user_id, per, g FROM m WHERE rn = 1),
paired AS (SELECT a.user_id, a.g AS g1, b2.g AS g2
           FROM modal a JOIN modal b2 ON a.user_id = b2.user_id
           WHERE a.per = 0 AND b2.per = 1),
conf AS (SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS c
         FROM paired GROUP BY 1, 2),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN g1 = g2 THEN c ELSE 0 END)
                  AS BIGINT) AS agree FROM conf),
cats AS (SELECT g, CAST(SUM(rc) AS BIGINT) AS rc,
                CAST(SUM(cc) AS BIGINT) AS cc
         FROM (SELECT g1 AS g, SUM(c) AS rc, 0 AS cc
               FROM conf GROUP BY 1
               UNION ALL
               SELECT g2 AS g, 0 AS rc, SUM(c) AS cc
               FROM conf GROUP BY 1)
         GROUP BY 1),
q AS (SELECT CAST(COUNT(*) AS BIGINT) AS q FROM cats),
pe0 AS (SELECT SUM((CAST(rc + cc AS DOUBLE) / (2.0 * t.n))
                   * (1.0 - CAST(rc + cc AS DOUBLE)
                            / (2.0 * t.n))) AS pe_sum
        FROM cats, t),
pe AS (SELECT pe_sum / (q.q - 1.0) AS pe_g FROM pe0, q),
marg AS (SELECT CAST(SUM(rc * cc) AS BIGINT) AS pe_num FROM cats)
SELECT t.n, q.q AS q_categories,
       ROUND(CAST(t.agree AS DOUBLE) / t.n, 6) AS pa,
       ROUND((CAST(t.agree AS DOUBLE) / t.n - pe_g)
             / (1.0 - pe_g), 6) AS ac1,
       CASE WHEN t.n * t.n - marg.pe_num = 0 THEN 1.0
            ELSE ROUND(CAST(t.n * t.agree - marg.pe_num AS DOUBLE)
                       / (t.n * t.n - marg.pe_num), 6)
       END AS kappa,
       ROUND((CAST(t.agree AS DOUBLE) / t.n - pe_g)
             / (1.0 - pe_g)
             - CASE WHEN t.n * t.n - marg.pe_num = 0 THEN 1.0
                    ELSE CAST(t.n * t.agree - marg.pe_num AS DOUBLE)
                         / (t.n * t.n - marg.pe_num) END, 6)
           AS paradox_gap
FROM t, q, pe, marg""")
def gwet_ac1_period_modal_type(sf_dir: str) -> pd.DataFrame:
    """Gwet's AC1 on the same half-vs-half modal-type pairing as
    Cohen's kappa — the prevalence-robust chance correction. The
    kappa paradox: when one category dominates (here most users'
    modal type concentrates), kappa's chance term Σrᵢcᵢ/n² soars
    and kappa craters even at 90% raw agreement; AC1's chance term
    Σπ(1−π)/(q−1) instead models chance as raters guessing the
    RARE categories, so it stays interpretable under skew.
    paradox_gap = AC1 − kappa is the direct size of the artifact:
    near 0 says the marginals are balanced and kappa can be
    trusted, large says every kappa-based consistency readout on
    this table understates real agreement. Same exact confusion
    partials; both statistics and the gap come from one ≤5×5
    driver table."""
    conf = _period_modal_conf(sf_dir)
    n = int(conf["c"].sum())
    agree = int(conf[conf["g1"] == conf["g2"]]["c"].sum())
    rc = conf.groupby("g1")["c"].sum()
    cc = conf.groupby("g2")["c"].sum()
    cats = sorted(set(rc.index) | set(cc.index))
    pe_num = int(sum(int(rc.get(g, 0)) * int(cc.get(g, 0))
                     for g in cats))
    qn = len(cats)
    pi = np.array([(int(rc.get(g, 0)) + int(cc.get(g, 0)))
                   / (2.0 * n) for g in cats])
    pe_g = float((pi * (1.0 - pi)).sum() / (qn - 1.0))
    pa = float(agree) / n
    ac1 = (pa - pe_g) / (1.0 - pe_g)
    kappa = 1.0 if n * n - pe_num == 0 else \
        float(n * agree - pe_num) / (n * n - pe_num)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "q_categories": np.array([qn], np.int64),
        "pa": [float(rha(pa, 6))],
        "ac1": [float(rha(ac1, 6))],
        "kappa": [float(rha(kappa, 6))],
        "paradox_gap": [float(rha(ac1 - kappa, 6))]})


def _period_modal_conf(sf_dir: str) -> pd.DataFrame:
    """(g1, g2, c) confusion of first-half vs second-half modal
    event type per user — the cohen_kappa pairing, factored for
    reuse by the AC1 query."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": (us // 86_400_000_000).astype(np.int64),
            "g": df["event_type"].astype(str)})

    base = _events(sf_dir, ["ts", "user_id", "event_type"]) \
        .map_batches(prep, batch_format="pandas").materialize()
    bounds = base.map_batches(
        lambda df: pd.DataFrame({"mn": [df["d"].min()],
                                 "mx": [df["d"].max()]}),
        batch_format="pandas").to_pandas()
    cut = (int(bounds["mn"].min()) + int(bounds["mx"].max()) + 1) // 2

    def with_per(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "per": (df["d"] >= cut).astype(np.int64),
            "g": df["g"]})

    pc = reduce_sink(base.map_batches(with_per,
                                      batch_format="pandas"),
                     ["user_id", "per", "g"], {"c": ("per", "size")})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def pair_conf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["bucket_"])
        g = g.sort_values(["user_id", "per", "c", "g"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        m = g.groupby(["user_id", "per"], as_index=False).first() \
            [["user_id", "per", "g"]]
        p0 = m[m["per"] == 0][["user_id", "g"]].rename(
            columns={"g": "g1"})
        p1 = m[m["per"] == 1][["user_id", "g"]].rename(
            columns={"g": "g2"})
        return p0.merge(p1, on="user_id") \
            .groupby(["g1", "g2"], as_index=False).size() \
            .rename(columns={"size": "c"})

    return reduce_sink(
        pc.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(pair_conf,
                                       batch_format="pandas"),
        ["g1", "g2"], {"c": ("c", "sum")}).to_pandas()


@register("krippendorff_alpha_weekly_modal", sql="""
WITH b AS (SELECT user_id, event_type AS g,
                  epoch_us(ts) // 86400000000 // 7 AS w
           FROM events),
pc AS (SELECT user_id, w, g, CAST(COUNT(*) AS BIGINT) AS c
       FROM b GROUP BY 1, 2, 3),
mo AS (SELECT user_id, w, g,
              ROW_NUMBER() OVER (PARTITION BY user_id, w
                                 ORDER BY c DESC, g) AS rn
       FROM pc),
uw AS (SELECT user_id, w, g FROM mo WHERE rn = 1),
um AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
       FROM uw GROUP BY 1),
k AS (SELECT uw.user_id, uw.g, um.m
      FROM uw JOIN um USING (user_id) WHERE um.m >= 2),
nuc AS (SELECT user_id, m, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM k GROUP BY 1, 2, 3),
dom AS (SELECT m, CAST(SUM(c * (m - c)) AS BIGINT) AS s
        FROM nuc GROUP BY 1),
dot AS (SELECT SUM(CAST(s AS DOUBLE) / (m - 1)) AS sdo FROM dom),
nc AS (SELECT g, CAST(SUM(c) AS BIGINT) AS nc FROM nuc GROUP BY 1),
nt AS (SELECT CAST(SUM(nc) AS BIGINT) AS n FROM nc),
de AS (SELECT CAST(SUM(CAST(a.nc AS HUGEINT) * b.nc) AS HUGEINT)
           AS x
       FROM nc a JOIN nc b ON a.g <> b.g),
un AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units
       FROM um WHERE m >= 2)
SELECT nt.n AS n_ratings, un.n_units,
       ROUND(sdo / nt.n, 6) AS d_o,
       ROUND(CAST(x AS DOUBLE) / (nt.n * (nt.n - 1.0)), 6) AS d_e,
       ROUND(1.0 - (sdo / nt.n)
             / (CAST(x AS DOUBLE) / (nt.n * (nt.n - 1.0))), 6)
           AS alpha
FROM dot, nt, de, un""")
def krippendorff_alpha_weekly_modal(sf_dir: str) -> pd.DataFrame:
    """Krippendorff's α (nominal) with users as units and epoch-weeks
    as raters, each week "rating" the user with their modal event
    type that week. This is the agreement statistic built for
    MISSING data — users absent some weeks simply contribute fewer
    pairable values instead of being dropped wholesale (Cohen-style
    designs must discard anyone not seen in both halves; here a
    3-of-5-weeks user still votes with 3 values). α ≈ 1 says a
    user's dominant behavior is a stable trait; α ≈ 0 says weekly
    modal type is as informative as drawing from the global mix, so
    any per-user "preferred type" personalization is fitting noise.
    Observed disagreement groups per-unit integer numerators by
    rater-count m (Σ n_uc(m−n_uc) exact per m, ≤ #weeks groups)
    before the few float divisions; expected disagreement is one
    HUGEINT cross product of category totals."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "w": (us // 86_400_000_000 // 7).astype(np.int64),
            "g": df["event_type"].astype(str)})

    pc = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "w", "g"], {"c": ("w", "size")})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy(np.int64) % 32) \
            .astype(np.int32)
        return df

    def unit_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["bucket_"])
        g = g.sort_values(["user_id", "w", "c", "g"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        uw = g.groupby(["user_id", "w"], as_index=False).first() \
            [["user_id", "g"]]
        m = uw.groupby("user_id")["g"].size().rename("m")
        uw = uw.merge(m, on="user_id")
        uw = uw[uw["m"] >= 2]
        nuc = uw.groupby(["user_id", "m", "g"], as_index=False) \
            .size().rename(columns={"size": "c"})
        nuc["s"] = nuc["c"] * (nuc["m"] - nuc["c"])
        dom = nuc.groupby("m", as_index=False)["s"].sum()
        ncs = nuc.groupby("g", as_index=False)["c"].sum() \
            .rename(columns={"c": "nc"})
        units = pd.DataFrame({"n_units": [uw["user_id"].nunique()]})
        dom["kind"], ncs["kind"], units["kind"] = "dom", "nc", "un"
        return pd.concat([dom, ncs, units], ignore_index=True)

    parts = pc.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(unit_counts,
                                       batch_format="pandas") \
        .to_pandas()
    dom = parts[parts["kind"] == "dom"].groupby("m")["s"].sum()
    ncs = parts[parts["kind"] == "nc"].groupby("g")["nc"].sum()
    n_units = int(parts[parts["kind"] == "un"]["n_units"].sum())
    sdo = float(sum(float(int(s)) / (int(m) - 1)
                    for m, s in dom.items()))
    nc = ncs.to_numpy(np.int64).astype(object)
    n = int(nc.sum())
    x = int((nc.sum() ** 2 - (nc * nc).sum()))
    d_o = sdo / n
    d_e = float(x) / (n * (n - 1.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_ratings": np.array([n], np.int64),
        "n_units": np.array([n_units], np.int64),
        "d_o": [float(rha(d_o, 6))],
        "d_e": [float(rha(d_e, 6))],
        "alpha": [float(rha(1.0 - d_o / d_e, 6))]})


# ---------------------------------------------------------------------------
# Long-memory cross-checks: DFA and aggregated-variance Hurst on the
# daily stream (companions to the R/S estimate — three estimators
# agreeing is the publishable read; disagreeing names the artifact)
# ---------------------------------------------------------------------------

def _daily_counts_vec(sf_dir: str) -> np.ndarray:
    """Zero-filled daily count vector (calendar-bounded)."""
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
    return x


@register("dfa_alpha_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT)
          AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s FROM g),
p AS (SELECT i, nn.n * SUM(x) OVER (ORDER BY i)
              - CAST(i + 1 AS HUGEINT) * nn.s AS yy
      FROM g, nn),
sz AS (SELECT UNNEST([5, 10, 15]) AS s),
w AS (SELECT sz.s AS s, p.i // sz.s AS win,
             CAST((p.i % sz.s) + 1 AS HUGEINT) AS k, p.yy
      FROM p CROSS JOIN sz, nn
      WHERE p.i < (nn.n // sz.s) * sz.s),
m AS (SELECT s, win,
             CAST(SUM(k) AS HUGEINT) AS sk,
             CAST(SUM(k * k) AS HUGEINT) AS skk,
             CAST(SUM(yy) AS HUGEINT) AS sy,
             CAST(SUM(yy * yy) AS HUGEINT) AS syy,
             CAST(SUM(k * yy) AS HUGEINT) AS sky
      FROM w GROUP BY 1, 2),
v AS (SELECT s, win,
             ROUND((CAST(s * syy - sy * sy AS DOUBLE)
                    - CAST(s * sky - sk * sy AS DOUBLE)
                      * CAST(s * sky - sk * sy AS DOUBLE)
                      / CAST(s * skk - sk * sk AS DOUBLE))
                   / (s * s), 9) AS vb
      FROM m),
ms AS (SELECT CAST(s AS BIGINT) AS box_size,
              CAST(COUNT(*) AS BIGINT) AS n_boxes,
              ROUND(0.5 * LOG2(AVG(vb)), 6) AS log2_f,
              LOG2(CAST(s AS DOUBLE)) AS t
       FROM v GROUP BY s HAVING AVG(vb) > 0),
fit AS (SELECT (COUNT(*) * SUM(t * log2_f)
                - SUM(t) * SUM(log2_f))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) AS a
        FROM ms)
SELECT box_size, n_boxes, log2_f,
       ROUND((SELECT a FROM fit), 6) AS dfa_alpha
FROM ms ORDER BY box_size""")
def dfa_alpha_daily(sf_dir: str) -> pd.DataFrame:
    """Detrended fluctuation analysis (Peng et al. 1994) of the
    daily stream: integrate the mean-deviation profile, detrend a
    LINEAR fit inside each 5/10/15-day box, and fit
    log2 F(box) ~ α·log2 box. α is the R/S Hurst's modern
    replacement because R/S reads any deterministic trend as fake
    long memory — DFA subtracts the local trend first, so
    H_RS >> α is the diagnostic that "persistence" was really
    growth/decay, while α ≈ H_RS ≈ 0.5 jointly certify a
    short-memory stream. The profile uses the n·cumsum − i·S
    integer scaling (the n² factor shifts the intercept, never the
    slope); per-box SSE is the closed form A − B²/C over exact
    HUGEINT moments — no residual is ever materialized — and each
    box's value rounds at 9dp before the per-size mean, exactly
    the [[hurst_exponent_daily]] conventions. Only the daily count
    histogram shuffles."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    S = int(x.sum())
    yy = (n * np.cumsum(x.astype(object))
          - (np.arange(n, dtype=np.int64) + 1).astype(object) * S)
    rha = textstats.round_half_away
    rows = []
    for s in (5, 10, 15):
        nb = n // s
        k = np.arange(1, s + 1, dtype=np.int64).astype(object)
        sk, skk = int(k.sum()), int((k * k).sum())
        vbs = []
        for w in range(nb):
            seg = yy[w * s:(w + 1) * s]
            sy, syy2 = int(seg.sum()), int((seg * seg).sum())
            sky = int((k * seg).sum())
            a = s * syy2 - sy * sy
            b = s * sky - sk * sy
            c = s * skk - sk * sk
            vbs.append(float(rha(
                (float(a) - float(b) * float(b) / float(c))
                / (s * s), 9)))
        mv = sum(vbs) / len(vbs)
        if mv > 0:
            rows.append((s, nb, float(rha(0.5 * np.log2(mv), 6)),
                         float(np.log2(float(s)))))
    t = np.array([r[3] for r in rows])
    f = np.array([r[2] for r in rows])
    nf = float(len(rows))
    a = ((nf * float((t * f).sum()) - float(t.sum())
          * float(f.sum()))
         / (nf * float((t * t).sum()) - float(t.sum()) ** 2))
    return pd.DataFrame({
        "box_size": np.array([r[0] for r in rows], np.int64),
        "n_boxes": np.array([r[1] for r in rows], np.int64),
        "log2_f": [r[2] for r in rows],
        "dfa_alpha": float(rha(a, 6))})


@register("aggvar_hurst_daily", sql="""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM sp),
g AS (SELECT cal.d - sp.lo AS i, CAST(COALESCE(e.c, 0) AS BIGINT)
          AS x
      FROM cal CROSS JOIN sp LEFT JOIN e ON e.d = cal.d),
sz AS (SELECT UNNEST([1, 2, 3, 5]) AS m),
blk AS (SELECT sz.m AS m, g.i // sz.m AS b,
               CAST(SUM(g.x) AS HUGEINT) AS v
        FROM g CROSS JOIN sz
        WHERE g.i < ((SELECT hi - lo + 1 FROM sp) // sz.m) * sz.m
        GROUP BY 1, 2),
mo AS (SELECT m, CAST(COUNT(*) AS HUGEINT) AS nb,
              CAST(SUM(v) AS HUGEINT) AS sv,
              CAST(SUM(v * v) AS HUGEINT) AS svv
       FROM blk GROUP BY 1),
ms AS (SELECT CAST(m AS BIGINT) AS block_size,
              CAST(nb AS BIGINT) AS n_blocks,
              ROUND(LOG2(CAST(nb * svv - sv * sv AS DOUBLE)
                         / (CAST(nb AS DOUBLE) * (nb - 1.0)
                            * m * m)), 6) AS log2_var,
              LOG2(CAST(m AS DOUBLE)) AS t
       FROM mo WHERE nb * svv - sv * sv > 0),
fit AS (SELECT (COUNT(*) * SUM(t * log2_var)
                - SUM(t) * SUM(log2_var))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) AS sl
        FROM ms)
SELECT block_size, n_blocks, log2_var,
       ROUND(1.0 + (SELECT sl FROM fit) / 2.0, 6) AS hurst_av
FROM ms ORDER BY block_size""")
def aggvar_hurst_daily(sf_dir: str) -> pd.DataFrame:
    """Aggregated-variance Hurst (Beran 1994; the Taqqu–Teverovsky
    estimator battery's first member): average the daily series in
    non-overlapping blocks of m = 1/2/3/5 days and regress
    log2 Var(block means) on log2 m — short memory decays the
    variance like m⁻¹ (slope −1, H = 0.5), long memory decays it
    slower (slope 2H−2). This is the estimator that answers the
    OPERATIONAL question directly: "how much does weekly averaging
    actually smooth this stream" is exactly Var(m=5)/Var(m=1), so
    hurst_av is the number capacity planners implicitly assume
    when they size from weekly means. Read with
    [[dfa_alpha_daily]] and [[hurst_exponent_daily]]: three
    estimators agreeing ≈0.5 certifies short memory; aggvar and
    R/S high with DFA at 0.5 fingerprints a trend artifact. Block
    sums are exact HUGEINT; each variance is the nb·Σv²−(Σv)²
    integer form with one float division."""
    x = _daily_counts_vec(sf_dir)
    n = len(x)
    rha = textstats.round_half_away
    rows = []
    for m in (1, 2, 3, 5):
        nb = n // m
        v = x[:nb * m].astype(object).reshape(nb, m).sum(axis=1)
        sv, svv = int(v.sum()), int((v * v).sum())
        num = nb * svv - sv * sv
        if num > 0:
            lv = float(rha(np.log2(
                float(num) / (float(nb) * (nb - 1.0) * m * m)), 6))
            rows.append((m, nb, lv, float(np.log2(float(m)))))
    t = np.array([r[3] for r in rows])
    f = np.array([r[2] for r in rows])
    nf = float(len(rows))
    sl = ((nf * float((t * f).sum()) - float(t.sum())
           * float(f.sum()))
          / (nf * float((t * t).sum()) - float(t.sum()) ** 2))
    return pd.DataFrame({
        "block_size": np.array([r[0] for r in rows], np.int64),
        "n_blocks": np.array([r[1] for r in rows], np.int64),
        "log2_var": [r[2] for r in rows],
        "hurst_av": float(rha(1.0 + sl / 2.0, 6))})


# ---------------------------------------------------------------------------
# Closed-form lexical-richness panel per source (Honoré/Sichel +
# Brunet/Herdan/Guiraud — the length-corrected constants)
# ---------------------------------------------------------------------------

def _richness_marginals(sf_dir: str) -> pd.DataFrame:
    """Per-source (n_tokens, n_types, v1, v2) off the global
    (source, word) count reduce — each pair lives in exactly one
    block afterward, so per-block partials are disjoint and fold
    in exact Python ints."""
    def sp(df: pd.DataFrame) -> pd.DataFrame:
        y = df["y"].to_numpy(np.int64)
        df = df.assign(v1=(y == 1).astype(np.int64),
                       v2=(y == 2).astype(np.int64))
        g = df.groupby("source", sort=False)
        return pd.DataFrame({
            "n_tokens": g["y"].sum().astype(np.int64),
            "n_types": g["y"].size().astype(np.int64),
            "v1": g["v1"].sum().astype(np.int64),
            "v2": g["v2"].sum().astype(np.int64)}).reset_index()

    parts = _source_word_counts(sf_dir) \
        .map_batches(sp, batch_format="pandas").to_pandas()
    return parts.groupby("source", as_index=False).sum() \
        .sort_values("source", ignore_index=True)


@register("honore_sichel_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
m AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS v1,
             CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS v2
      FROM c GROUP BY 1)
SELECT source, n_tokens, n_types, v1, v2,
       ROUND(CASE WHEN v1 = n_types THEN 0.0
                  ELSE 100.0 * LN(CAST(n_tokens AS DOUBLE))
                       / (1.0 - CAST(v1 AS DOUBLE) / n_types)
             END, 6) AS honore_r,
       ROUND(CAST(v2 AS DOUBLE) / n_types, 6) AS sichel_s
FROM m ORDER BY source""")
def honore_sichel_by_source(sf_dir: str) -> pd.DataFrame:
    """Honoré's R and Sichel's S per source — the two
    frequency-spectrum constants built from the BOTTOM of the
    spectrum. Honoré's R = 100·ln N/(1−V₁/V) rewards hapax
    production (authorship studies' favorite because active
    vocabulary keeps minting one-offs); Sichel's S = V₂/V is
    empirically near-constant in natural text (~0.2–0.3 across
    genres and lengths), so a source whose S sits far off that
    band is flagged as synthetic/boilerplate by a one-number test
    that needs no reference corpus. Reads alongside the suite's
    STTR/Yule/hapax family: Yule uses the whole spectrum's second
    moment, these use its first two cells — disagreement localizes
    WHERE the spectrum is deformed. All four marginals are exact
    integers off the (source, word) reduce; degenerate all-hapax
    sources emit 0 identically on both engines."""
    m = _richness_marginals(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for _, r in m.iterrows():
        n, v = int(r["n_tokens"]), int(r["n_types"])
        v1, v2 = int(r["v1"]), int(r["v2"])
        hr = 0.0 if v1 == v else \
            100.0 * float(np.log(float(n))) / (1.0 - v1 / v)
        rows.append((r["source"], n, v, v1, v2,
                     float(rha(hr, 6)), float(rha(v2 / v, 6))))
    return pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_types", "v1", "v2", "honore_r",
        "sichel_s"]).astype({"n_tokens": np.int64,
                             "n_types": np.int64,
                             "v1": np.int64, "v2": np.int64})


@register("brunet_herdan_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
m AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM c GROUP BY 1)
SELECT source, n_tokens, n_types,
       ROUND(POWER(CAST(n_tokens AS DOUBLE),
                   POWER(CAST(n_types AS DOUBLE), -0.165)), 6)
           AS brunet_w,
       ROUND(LN(CAST(n_types AS DOUBLE))
             / LN(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c,
       ROUND(CAST(n_types AS DOUBLE)
             / SQRT(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r
FROM m ORDER BY source""")
def brunet_herdan_by_source(sf_dir: str) -> pd.DataFrame:
    """Brunet's W, Herdan's C and Guiraud's R per source — the
    length-CORRECTED richness constants, each encoding a different
    null for how vocabulary should grow with size: Guiraud assumes
    V ∝ √N, Herdan assumes the Heaps power law V = N^C (C IS the
    Heaps exponent read from a single point), Brunet's
    W = N^(V^−0.165) is the empirically flattest across lengths
    (lower = richer). The triple is the cross-check that makes
    cross-source comparison honest: if the three RANK sources
    differently, vocabulary growth violates the assumed law
    somewhere and raw-TTR comparisons were meaningless; if they
    agree, any of them is a safe mixing weight for training-data
    diversity. Two exact integer marginals per source, three
    shared float expressions, zero extra passes over the
    [[honore_sichel_by_source]] machinery."""
    m = _richness_marginals(sf_dir)
    rha = textstats.round_half_away
    rows = []
    for _, r in m.iterrows():
        n, v = int(r["n_tokens"]), int(r["n_types"])
        rows.append((
            r["source"], n, v,
            float(rha(float(n) ** (float(v) ** -0.165), 6)),
            float(rha(float(np.log(float(v)))
                      / float(np.log(float(n))), 6)),
            float(rha(float(v) / float(np.sqrt(float(n))), 6))))
    return pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_types", "brunet_w", "herdan_c",
        "guiraud_r"]).astype({"n_tokens": np.int64,
                              "n_types": np.int64})
