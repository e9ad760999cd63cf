"""Driver-contract queries (chunk 8/18).
Sections:
  - SQL (lo+hi)/2 is float division; match its threshold exactly
  - ascending rank with DESC user_id ties == reverse of the
  - per-block top-20 partials (each word appears in exactly one
  - recover the date for row i
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
    scan,
    textstats,
)
from webalizer_ray.pipelines.queries.q01_core import (  # noqa: F401
    _word_count_partials,
)
from webalizer_ray.pipelines.queries.q07_fits_audits import (  # noqa: F401
    _source_word_counts,
)



@register("price_volume_mix_bridge", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem GROUP BY 1, 2),
pq2 AS (SELECT pk, mi, q,
               CAST(ROUND(10000.0 * c / q, 0) AS BIGINT) AS p
        FROM pm),
sp AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM pm),
j AS (SELECT COALESCE(c.mi, p.mi + 1) AS mi,
             c.p AS p1, c.q AS q1, p.p AS p0, p.q AS q0
      FROM pq2 c FULL JOIN pq2 p
          ON p.pk = c.pk AND p.mi = c.mi - 1, sp
      WHERE COALESCE(c.mi, p.mi + 1) > sp.lo
        AND COALESCE(c.mi, p.mi + 1) <= sp.hi)
SELECT mi AS month_index,
       ROUND(SUM(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL
                      THEN q1 * (p1 - p0) END) / 1000000.0, 2)
           AS price_eff_usd,
       ROUND(SUM(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL
                      THEN p0 * (q1 - q0) END) / 1000000.0, 2)
           AS volume_eff_usd,
       ROUND(COALESCE(SUM(CASE WHEN p0 IS NULL
                                THEN p1 * q1 END), 0)
             / 1000000.0, 2) AS new_parts_usd,
       ROUND(-COALESCE(SUM(CASE WHEN p1 IS NULL
                                 THEN p0 * q0 END), 0)
             / 1000000.0, 2) AS lost_parts_usd,
       ROUND((COALESCE(SUM(p1 * q1), 0)
              - COALESCE(SUM(p0 * q0), 0)) / 1000000.0, 2)
           AS total_change_usd
FROM j GROUP BY mi ORDER BY mi""")
def price_volume_mix_bridge(sf_dir: str) -> pd.DataFrame:
    """FP&A price-volume-mix bridge: each month's revenue change
    vs the previous month decomposed into price effect (q₁·Δp over
    matched parts), volume effect (p₀·Δq), new-part revenue and
    lost-part drag — and because unit prices quantize to the same
    1e-4-cent integers on both engines, the four effects sum to the
    total change EXACTLY (the algebraic identity q₁Δp + p₀Δq =
    p₁q₁ − p₀q₀ holds in integer arithmetic, no 'unexplained'
    plug). This is the waterfall a finance review actually asks
    for; the price-index and vintage queries each show one slice of
    it. Per-part month pairing happens inside the part's own
    map_groups (its month list is local); only per-month integer
    partials shuffle; the global month span broadcasts as two
    scalars."""
    rha = textstats.round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"]
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mi": (d.dt.year * 12 + d.dt.month).to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64),
            "q": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64)})
        return g.groupby(["pk", "mi"], as_index=False).sum()

    pm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice", "l_quantity"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mi"], {"c": ("c", "sum"),
                       "q": ("q", "sum")}).materialize()
    span = pm.map_batches(
        lambda df: pd.DataFrame({"lo": [df["mi"].min()],
                                 "hi": [df["mi"].max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = int(span["lo"].min()), int(span["hi"].max())

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("mi")
        mi = g["mi"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        p = rha(10000.0 * g["c"].to_numpy(np.float64)
                / g["q"].to_numpy(np.float64), 0).astype(np.int64)
        by = {int(m): (int(pp), int(qq))
              for m, pp, qq in zip(mi, p, q)}
        rows = []
        months = set(by)
        for m in sorted(months | {m + 1 for m in months}):
            if m <= lo or m > hi:
                continue
            cur, prev = by.get(m), by.get(m - 1)
            if cur is None and prev is None:
                continue
            pe = ve = nw = lost = t1 = t0 = 0
            if cur and prev:
                pe = cur[1] * (cur[0] - prev[0])
                ve = prev[0] * (cur[1] - prev[1])
            elif cur:
                nw = cur[0] * cur[1]
            else:
                lost = prev[0] * prev[1]
            if cur:
                t1 = cur[0] * cur[1]
            if prev:
                t0 = prev[0] * prev[1]
            rows.append((m, pe, ve, nw, lost, t1 - t0))
        return pd.DataFrame(rows, columns=[
            "mi", "pe", "ve", "nw", "lost", "tot"]) \
            .astype(np.int64)

    out = reduce_sink(
        pm.groupby("pk").map_groups(per_part,
                                    batch_format="pandas"),
        ["mi"], {"pe": ("pe", "sum"), "ve": ("ve", "sum"),
                 "nw": ("nw", "sum"), "lost": ("lost", "sum"),
                 "tot": ("tot", "sum")}).to_pandas() \
        .sort_values("mi", ignore_index=True)
    return pd.DataFrame({
        "month_index": out["mi"].astype(np.int64),
        "price_eff_usd": rha(out["pe"].to_numpy(np.float64)
                             / 1e6, 2),
        "volume_eff_usd": rha(out["ve"].to_numpy(np.float64)
                              / 1e6, 2),
        "new_parts_usd": rha(out["nw"].to_numpy(np.float64)
                             / 1e6, 2),
        "lost_parts_usd": rha(-out["lost"].to_numpy(np.float64)
                              / 1e6, 2),
        "total_change_usd": rha(out["tot"].to_numpy(np.float64)
                                / 1e6, 2)})


@register("part_rank_movers", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c
            FROM lineitem GROUP BY 1, 2),
hi AS (SELECT MAX(mi) AS m1 FROM pm),
b AS (SELECT pk,
             COALESCE(MAX(CASE WHEN mi = m1 THEN c END), 0) AS c1,
             COALESCE(MAX(CASE WHEN mi = m1 - 1 THEN c END), 0)
                 AS c0
      FROM pm, hi GROUP BY pk
      HAVING MAX(CASE WHEN mi = m1 THEN c END) IS NOT NULL
          OR MAX(CASE WHEN mi = m1 - 1 THEN c END) IS NOT NULL),
r AS (SELECT pk, c1, c0,
             ROW_NUMBER() OVER (ORDER BY c1 DESC, pk) AS rk1,
             ROW_NUMBER() OVER (ORDER BY c0 DESC, pk) AS rk0
      FROM b)
SELECT pk AS partkey, CAST(rk0 AS BIGINT) AS rank_prev,
       CAST(rk1 AS BIGINT) AS rank_last,
       CAST(rk0 - rk1 AS BIGINT) AS rank_gain
FROM r ORDER BY ABS(rk0 - rk1) DESC, pk LIMIT 10""")
def part_rank_movers(sf_dir: str) -> pd.DataFrame:
    """Momentum screen: the ten parts whose revenue RANK moved most
    between the last two months (both ranks over the union of parts
    active in either month, zero revenue for the missing side, ties
    (cents DESC, partkey)) — rank deltas are the merchandiser's
    'what just took off / died' list, robust to the revenue scale
    drift that absolute-delta screens drown in. Only the last two
    months' (part, cents) rows survive the filter inside the
    per-part reduce; ranking runs on that two-column slice."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"]
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mi": (d.dt.year * 12 + d.dt.month).to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64)})
        return g.groupby(["pk", "mi"], as_index=False).sum()

    pm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mi"], {"c": ("c", "sum")}).materialize()
    m1 = int(pm.map_batches(
        lambda df: pd.DataFrame({"hi": [df["mi"].max()]}),
        batch_format="pandas").to_pandas()["hi"].max())
    last_two = pm.map_batches(
        lambda df: df[df["mi"].isin([m1, m1 - 1])],
        batch_format="pandas").to_pandas()
    b = last_two.pivot_table(index="pk", columns="mi", values="c",
                             fill_value=0, aggfunc="sum")
    c1 = b[m1].to_numpy(np.int64) if m1 in b else \
        np.zeros(len(b), np.int64)
    c0 = b[m1 - 1].to_numpy(np.int64) if (m1 - 1) in b else \
        np.zeros(len(b), np.int64)
    pk = b.index.to_numpy(np.int64)
    rk1 = np.lexsort((pk, -c1)).argsort() + 1
    rk0 = np.lexsort((pk, -c0)).argsort() + 1
    out = pd.DataFrame({"partkey": pk, "rank_prev": rk0,
                        "rank_last": rk1,
                        "rank_gain": rk0 - rk1})
    out["absg"] = out["rank_gain"].abs()
    out = out.sort_values(["absg", "partkey"],
                          ascending=[False, True]).head(10)
    return out.drop(columns="absg").reset_index(drop=True) \
        .astype({"rank_prev": np.int64, "rank_last": np.int64,
                 "rank_gain": np.int64})


@register("causality_violations_audit", sql="""
WITH ls AS (SELECT COUNT(*) FILTER
                       (WHERE l.l_shipdate < o.o_orderdate)
                       AS viol,
                   COUNT(*) AS tot
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey),
u AS (SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
                 AS s0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                 AS p0
      FROM events GROUP BY user_id),
uv AS (SELECT COUNT(*) FILTER (WHERE p0 IS NOT NULL
                               AND (s0 IS NULL OR p0 < s0))
                 AS u_viol,
              COUNT(*) AS u_tot
       FROM u)
SELECT CAST(ls.viol AS BIGINT) AS ship_before_order,
       CAST(ls.tot AS BIGINT) AS n_lines,
       ROUND(ls.viol * 1.0 / ls.tot, 6) AS ship_viol_share,
       CAST(uv.u_viol AS BIGINT) AS purchase_before_signup_users,
       CAST(uv.u_tot AS BIGINT) AS n_users
FROM ls, uv""")
def causality_violations_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-field CAUSALITY audit: line items shipped before their
    order was placed, and users whose first purchase precedes their
    first signup (or who purchase without ever signing up) — the
    arrow-of-time invariants that schema checks, FK audits and
    range audits all pass over because each field is individually
    valid; violations here mean clock skew between producers or a
    broken backfill, and they silently corrupt every lag/funnel
    metric downstream. Ship check rides the lineitem→orders
    auto_join as count partials; the user check is one min-reduce
    per user with sentinel timestamps; five scalars reach the
    driver."""
    from webalizer_ray.stages.join import auto_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, orders, on="l_orderkey",
                  right_on="o_orderkey")
    ls = j.map_batches(
        lambda df: pd.DataFrame({
            "viol": [np.int64((df["l_shipdate"].to_numpy()
                               < df["o_orderdate"].to_numpy())
                              .sum())],
            "tot": [np.int64(len(df))]}),
        batch_format="pandas").to_pandas().sum()

    BIG = np.int64(1 << 62)

    def u_partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "s0": np.where(et == "signup", ts, BIG),
            "p0": np.where(et == "purchase", ts, BIG)})
        return g.groupby("user_id", as_index=False).min()

    per_u = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(u_partial, batch_format="pandas"),
        ["user_id"], {"s0": ("s0", "min"), "p0": ("p0", "min")})
    uv = per_u.map_batches(
        lambda df: pd.DataFrame({
            "u_viol": [np.int64(((df["p0"] < BIG)
                                 & (df["p0"] < df["s0"]))
                                .sum())],
            "u_tot": [np.int64(len(df))]}),
        batch_format="pandas").to_pandas().sum()
    rha = textstats.round_half_away
    viol, tot = int(ls["viol"]), int(ls["tot"])
    return pd.DataFrame({
        "ship_before_order": np.array([viol], np.int64),
        "n_lines": np.array([tot], np.int64),
        "ship_viol_share": [float(rha(viol / tot, 6))],
        "purchase_before_signup_users":
            np.array([int(uv["u_viol"])], np.int64),
        "n_users": np.array([int(uv["u_tot"])], np.int64)})


@register("lexical_sophistication_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
g AS (SELECT word, SUM(n) AS cn FROM c GROUP BY word),
r AS (SELECT word, ROW_NUMBER() OVER (ORDER BY cn DESC, word)
                       AS rk
      FROM g)
SELECT c.source, CAST(SUM(c.n) AS BIGINT) AS n_tokens,
       ROUND(SUM(c.n * LN(r.rk)) / SUM(c.n), 6) AS mean_log_rank,
       ROUND(SUM(CASE WHEN r.rk <= 20 THEN c.n ELSE 0 END) * 1.0
             / SUM(c.n), 6) AS core20_share
FROM c JOIN r ON r.word = c.word
GROUP BY c.source ORDER BY c.source""")
def lexical_sophistication_by_source(sf_dir: str) -> pd.DataFrame:
    """Lexical sophistication per source: mean log CORPUS-RANK of
    its tokens (ranks over global counts, ties by word) plus the
    share drawn from the corpus top-20 'common core' — the
    reading-level read relative to THIS corpus's own norm: a source
    living in head vocabulary scores low even if its raw entropy is
    high, which is exactly the simple-vs-jargon distinction the
    per-source entropy and Yule's K miss. Global ranks come from
    the word-count reduce (vocab-bounded) and broadcast as a dict
    into the per-(source, word) scoring pass; only per-source
    (Σn, Σn·ln rk, core) partials shuffle."""
    wc = reduce_sink(
        _docs(sf_dir, ["text"]).map_batches(_word_count_partials,
                                            batch_format="pandas"),
        ["word"], {"cnt": ("cnt", "sum")}).to_pandas()
    wc = wc.sort_values(["cnt", "word"],
                        ascending=[False, True],
                        ignore_index=True)
    rank_ref = ray.put({w: i + 1 for i, w in enumerate(wc["word"])})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rk = df["word"].map(ray.get(rank_ref)).to_numpy(np.int64)
        n = df["y"].to_numpy(np.int64)
        g = pd.DataFrame({
            "source": df["source"], "n_tokens": n,
            "nlr": n * np.log(rk),
            "core": np.where(rk <= 20, n, 0).astype(np.int64)})
        return g.groupby("source", as_index=False).sum()

    out = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(score, batch_format="pandas"),
        ["source"], {"n_tokens": ("n_tokens", "sum"),
                     "nlr": ("nlr", "sum"),
                     "core": ("core", "sum")}).to_pandas() \
        .sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    nt = out["n_tokens"].to_numpy(np.float64)
    return pd.DataFrame({
        "source": out["source"],
        "n_tokens": out["n_tokens"].astype(np.int64),
        "mean_log_rank": rha(out["nlr"].to_numpy(np.float64)
                             / nt, 6),
        "core20_share": rha(out["core"].to_numpy(np.float64)
                            / nt, 6)})


@register("stochastic_dominance_check", sql="""
WITH b AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                  CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
                      END AS we
           FROM events),
g AS (SELECT c, SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS na,
             SUM(we) AS nb
      FROM b GROUP BY c),
t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM g),
s AS (SELECT c, SUM(na) OVER (ORDER BY c) AS ca,
             SUM(nb) OVER (ORDER BY c) AS cb,
             COALESCE(LEAD(c) OVER (ORDER BY c) - c, 0) AS gap
      FROM g),
i AS (SELECT c, ca, cb,
             COALESCE(SUM(ca * gap) OVER (
                 ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS ia,
             COALESCE(SUM(cb * gap) OVER (
                 ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS ib
      FROM s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
       CAST(SUM(CASE WHEN ca * t.tb > cb * t.ta
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS fsd_viol_ab,
       CAST(SUM(CASE WHEN cb * t.ta > ca * t.tb
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS fsd_viol_ba,
       CAST(SUM(CASE WHEN ia * t.tb > ib * t.ta
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS ssd_viol_ab,
       CAST(SUM(CASE WHEN ib * t.ta > ia * t.tb
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS ssd_viol_ba
FROM i, t GROUP BY t.ta, t.tb""")
def stochastic_dominance_check(sf_dir: str) -> pd.DataFrame:
    """First- and second-order stochastic dominance between the
    weekday (a) and weekend (b) value distributions, reported as
    exact VIOLATION COUNTS in each direction: zero fsd_viol_ab
    means weekday's CDF never sits above weekend's (weekday FSD —
    every expected-utility maximizer prefers it); when FSD fails
    both ways, zero ssd_viol counts settle it for risk-averse
    preferences via the CDF integrals — the decision-theoretic
    verdict that Wasserstein/KS magnitudes can't give (they
    measure HOW different, this says WHICH IS BETTER and for
    whom). Every comparison is an exact integer cross-product
    (c_a·t_b vs c_b·t_a and their gap-weighted integrals) on the
    shared cents grid; one (cents, na, nb) reduce serves all four
    counts."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        we = (df["ts"].dt.dayofweek >= 5).to_numpy()
        return pd.DataFrame({"c": c,
                             "na": (~we).astype(np.int64),
                             "nb": we.astype(np.int64)}) \
            .groupby("c", as_index=False).sum()

    g = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["c"], {"na": ("na", "sum"), "nb": ("nb", "sum")}) \
        .to_pandas().sort_values("c", ignore_index=True)
    cs = [int(x) for x in g["c"]]
    na = [int(x) for x in g["na"]]
    nb = [int(x) for x in g["nb"]]
    ta, tb = sum(na), sum(nb)
    ca = cb = 0
    ia = ib = 0
    f_ab = f_ba = s_ab = s_ba = 0
    prev_c = None
    for i, c in enumerate(cs):
        if prev_c is not None:
            gap = c - prev_c
            ia += pca * gap
            ib += pcb * gap
        ca += na[i]
        cb += nb[i]
        if ca * tb > cb * ta:
            f_ab += 1
        if cb * ta > ca * tb:
            f_ba += 1
        if ia * tb > ib * ta:
            s_ab += 1
        if ib * ta > ia * tb:
            s_ba += 1
        pca, pcb = ca, cb
        prev_c = c
    return pd.DataFrame({
        "n_grid": np.array([len(cs)], np.int64),
        "fsd_viol_ab": np.array([f_ab], np.int64),
        "fsd_viol_ba": np.array([f_ba], np.int64),
        "ssd_viol_ab": np.array([s_ab], np.int64),
        "ssd_viol_ba": np.array([s_ba], np.int64)})


@register("peak_minute_type_attribution", sql="""
WITH m AS (SELECT epoch_us(ts) // 60000000 AS mi,
                  event_type AS t, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
tm AS (SELECT mi, SUM(n) AS tot FROM m GROUP BY mi),
k AS (SELECT CAST(CEIL(0.01 * COUNT(*)) AS BIGINT) AS kk FROM tm),
top AS (SELECT mi FROM tm, k
        QUALIFY ROW_NUMBER() OVER (ORDER BY tot DESC, mi) <= kk),
agg AS (SELECT t, SUM(n) AS base,
               SUM(CASE WHEN top.mi IS NOT NULL THEN n ELSE 0 END)
                   AS peak
        FROM m LEFT JOIN top ON top.mi = m.mi GROUP BY t),
tt AS (SELECT SUM(base) AS tb, SUM(peak) AS tp FROM agg)
SELECT t AS event_type, CAST(base AS BIGINT) AS n_events,
       CAST(peak AS BIGINT) AS n_peak_events,
       ROUND(base * 1.0 / tt.tb, 6) AS base_share,
       ROUND(peak * 1.0 / tt.tp, 6) AS peak_share,
       ROUND((peak * 1.0 / tt.tp) / (base * 1.0 / tt.tb), 6)
           AS lift
FROM agg, tt ORDER BY t""")
def peak_minute_type_attribution(sf_dir: str) -> pd.DataFrame:
    """Peak-load attribution: within the top-1% busiest MINUTES,
    which event type is over-represented vs its everyday share —
    lift > 1 names the traffic class that actually drives
    provisioning peaks (and therefore cost), the question the
    peak-minute counter and per-type hourly tables can't answer
    because neither conditions on the peak itself. One
    (minute, type) integer reduce — minutes are horizon-bounded, so
    the driver-side rank-and-slice is scale-stable; shares and
    lifts are exact-integer divisions both engines evaluate
    identically."""
    m = reduce_sink(
        _events(sf_dir, ["ts", "event_type"]).map_batches(
            lambda df: pd.DataFrame({
                "mi": df["ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // 60_000_000,
                "t": df["event_type"].astype(str),
                "n": np.int64(1)})
            .groupby(["mi", "t"], as_index=False).sum(),
            batch_format="pandas"),
        ["mi", "t"], {"n": ("n", "sum")}).to_pandas()
    import math
    tm = m.groupby("mi", sort=False)["n"].sum().reset_index()
    kk = int(math.ceil(0.01 * len(tm)))
    tm = tm.sort_values(["n", "mi"], ascending=[False, True])
    top = set(tm["mi"].head(kk))
    m["peak"] = m["mi"].isin(top).to_numpy() * m["n"]
    agg = m.groupby("t", sort=True).agg(
        n_events=("n", "sum"), n_peak_events=("peak", "sum"))
    tb = int(agg["n_events"].sum())
    tp = int(agg["n_peak_events"].sum())
    rha = textstats.round_half_away
    base = agg["n_events"].to_numpy(np.int64)
    peak = agg["n_peak_events"].to_numpy(np.int64)
    return pd.DataFrame({
        "event_type": agg.index.to_numpy(),
        "n_events": base,
        "n_peak_events": peak.astype(np.int64),
        "base_share": rha(base * 1.0 / tb, 6),
        "peak_share": rha(peak * 1.0 / tp, 6),
        "lift": rha((peak * 1.0 / tp) / (base * 1.0 / tb), 6)})


@register("ltv_by_first_touch", sql="""
WITH e AS (SELECT user_id, event_type,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
u AS (SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS ft,
             SUM(c) AS cents
      FROM e GROUP BY user_id)
SELECT ft AS first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(SUM(cents) / 100.0 / COUNT(*), 6) AS avg_ltv_usd
FROM u GROUP BY ft ORDER BY ft""")
def ltv_by_first_touch(sf_dir: str) -> pd.DataFrame:
    """Acquisition-quality read: average lifetime value per user
    grouped by the user's VERY FIRST event type ((ts, event_id)
    tie order identical on both engines) — 'users who arrive
    through an error page are worth a third of those who arrive
    through signup' is the budget-allocation fact that the
    first-event-type histogram alone can't price. Users hash into
    32 buckets so each user's first event and value total resolve
    inside one map_groups sort; only (first_type, n, Σcents)
    integer partials shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id",
                          "event_type", "value"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        c = np.rint(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        first = ~g["user_id"].duplicated()
        t = pd.DataFrame({"user_id": g["user_id"], "c": c})
        cents = t.groupby("user_id", sort=False)["c"].sum()
        ft = g.loc[first].set_index("user_id")["event_type"]
        out = pd.DataFrame({"first_type": ft.astype(str),
                            "n_users": np.int64(1),
                            "cents": cents})
        return out.groupby("first_type", as_index=False).sum()

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(per_user,
                                       batch_format="pandas"),
        ["first_type"], {"n_users": ("n_users", "sum"),
                         "cents": ("cents", "sum")}).to_pandas() \
        .sort_values("first_type", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "first_type": out["first_type"],
        "n_users": out["n_users"].astype(np.int64),
        "avg_ltv_usd": rha(out["cents"].to_numpy(np.float64)
                           / 100.0
                           / out["n_users"].to_numpy(np.float64),
                           6)})


@register("weekend_warrior_segments", sql="""
WITH u AS (SELECT user_id, COUNT(*) AS n,
                  SUM(CASE WHEN dayofweek(ts) IN (0, 6)
                           THEN 1 ELSE 0 END) AS w,
                  SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS k
           FROM events GROUP BY user_id),
b AS (SELECT LEAST(CAST(FLOOR(w * 10.0 / n) AS BIGINT), 9)
                 AS band, n, k
      FROM u)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(SUM(k) * 1.0 / SUM(n), 6) AS purchase_rate
FROM b GROUP BY band ORDER BY band""")
def weekend_warrior_segments(sf_dir: str) -> pd.DataFrame:
    """Weekend-warrior segmentation: users bucketed by the SHARE of
    their own activity that happens on weekends (deciles 0–9), with
    each band's purchase rate — the behavioral-mix read the global
    weekend odds ratio collapses: the population can look
    weekend-neutral while a 20% weekend-only cohort converts twice
    as well, and that cohort is exactly who a weekend campaign
    should target. One (n, weekend, purchases) integer reduce per
    user, a closed-form band from exact integers, then a 10-row
    reduce — rates are single exact divisions."""
    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.int64(1),
            "w": (df["ts"].dt.dayofweek >= 5).to_numpy()
            .astype(np.int64),
            "k": (df["event_type"] == "purchase").to_numpy()
            .astype(np.int64)})
        return g.groupby("user_id", as_index=False).sum()

    u = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"n": ("n", "sum"), "w": ("w", "sum"),
                      "k": ("k", "sum")})

    def band_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        band = np.minimum(np.floor(w * 10.0 / n), 9) \
            .astype(np.int64)
        g = pd.DataFrame({"band": band, "n_users": np.int64(1),
                          "n_events": n,
                          "k": df["k"].to_numpy(np.int64)})
        return g.groupby("band", as_index=False).sum()

    out = reduce_sink(
        u.map_batches(band_partial, batch_format="pandas"),
        ["band"], {"n_users": ("n_users", "sum"),
                   "n_events": ("n_events", "sum"),
                   "k": ("k", "sum")}).to_pandas() \
        .sort_values("band", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "band": out["band"].astype(np.int64),
        "n_users": out["n_users"].astype(np.int64),
        "n_events": out["n_events"].astype(np.int64),
        "purchase_rate": rha(out["k"].to_numpy(np.float64)
                             / out["n_events"]
                             .to_numpy(np.float64), 6)})


@register("tost_equivalence_value", sql="""
WITH e AS (SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
                      END AS we,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS c
           FROM events),
g AS (SELECT we, COUNT(*) AS n, SUM(c) AS sc, SUM(c * c) AS scc
      FROM e GROUP BY we),
w AS (SELECT MAX(CASE WHEN we = 0 THEN n END) AS na,
             MAX(CASE WHEN we = 1 THEN n END) AS nb,
             MAX(CASE WHEN we = 0 THEN sc END) AS sca,
             MAX(CASE WHEN we = 1 THEN sc END) AS scb,
             MAX(CASE WHEN we = 0 THEN scc END) AS scca,
             MAX(CASE WHEN we = 1 THEN scc END) AS sccb
      FROM g),
d AS (SELECT na, nb,
             (sca * 1.0 / na - scb * 1.0 / nb) / 100.0 AS diff,
             SQRT((na * scca - sca * sca * 1.0)
                  / (na * 1.0 * (na - 1)) / na
                  + (nb * sccb - scb * scb * 1.0)
                  / (nb * 1.0 * (nb - 1)) / nb) / 100.0 AS se
      FROM w)
SELECT CAST(na AS BIGINT) AS n_weekday,
       CAST(nb AS BIGINT) AS n_weekend,
       ROUND(diff, 6) AS mean_diff_usd,
       ROUND((diff + 0.5) / se, 6) AS z_lower,
       ROUND((diff - 0.5) / se, 6) AS z_upper,
       CAST(CASE WHEN (diff + 0.5) / se > 1.644854
                 AND (diff - 0.5) / se < -1.644854
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM d""")
def tost_equivalence_value(sf_dir: str) -> pd.DataFrame:
    """TOST equivalence test: are weekday and weekend mean values
    EQUIVALENT within ±$0.50? Two one-sided z-tests against the
    margin (both must reject at α=0.05, z* = 1.644854) — the
    inferential mirror image of every difference test in the
    suite: 'not significantly different' is NOT evidence of
    sameness, and TOST is the test that actually certifies it
    (launch gates, parity migrations, do-no-harm checks). Exact
    integer (n, Σc, Σc²) moments per arm; both engines evaluate
    the identical diff/SE doubles, so the verdict bit can't
    straddle engines."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        we = (df["ts"].dt.dayofweek >= 5).to_numpy() \
            .astype(np.int64)
        return pd.DataFrame({"we": we, "n": np.int64(1), "sc": c,
                             "scc": c * c}) \
            .groupby("we", as_index=False).sum()

    g = reduce_sink(
        _events(sf_dir, ["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["we"], {"n": ("n", "sum"), "sc": ("sc", "sum"),
                 "scc": ("scc", "sum")}).to_pandas().set_index("we")
    na, nb = int(g.loc[0, "n"]), int(g.loc[1, "n"])
    sca, scb = int(g.loc[0, "sc"]), int(g.loc[1, "sc"])
    scca, sccb = int(g.loc[0, "scc"]), int(g.loc[1, "scc"])
    diff = (sca * 1.0 / na - scb * 1.0 / nb) / 100.0
    se = np.sqrt((na * scca - sca * sca * 1.0)
                 / (na * 1.0 * (na - 1)) / na
                 + (nb * sccb - scb * scb * 1.0)
                 / (nb * 1.0 * (nb - 1)) / nb) / 100.0
    zl, zu = (diff + 0.5) / se, (diff - 0.5) / se
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekday": np.array([na], np.int64),
        "n_weekend": np.array([nb], np.int64),
        "mean_diff_usd": [float(rha(diff, 6))],
        "z_lower": [float(rha(zl, 6))],
        "z_upper": [float(rha(zu, 6))],
        "equivalent": np.array(
            [1 if (zl > 1.644854 and zu < -1.644854) else 0],
            np.int64)})


@register("price_stickiness_monthly", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem GROUP BY 1, 2),
pq2 AS (SELECT pk, mi, CAST(ROUND(10000.0 * c / q, 0) AS BIGINT)
                           AS p
        FROM pm),
j AS (SELECT c.mi, CASE WHEN c.p = p.p THEN 1 ELSE 0 END AS same
      FROM pq2 c JOIN pq2 p ON p.pk = c.pk AND p.mi = c.mi - 1)
SELECT mi AS month_index, CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(same) AS BIGINT) AS n_unchanged,
       ROUND(SUM(same) * 1.0 / COUNT(*), 6) AS unchanged_share
FROM j GROUP BY mi ORDER BY mi""")
def price_stickiness_monthly(sf_dir: str) -> pd.DataFrame:
    """Price stickiness (Bils–Klenow micro-rigidity): each month,
    the share of parts sold in consecutive months whose quantized
    unit price did NOT move — the repricing-frequency read that the
    price INDEX hides completely (an index can drift 2% while 95%
    of prices froze and 5% jumped, or every price nudged; the
    business meaning differs). Same 1e-4-cent quantization as the
    index so 'unchanged' is an exact integer equality on both
    engines; consecutive-month pairs form inside each part's own
    map_groups; only per-month (matched, unchanged) integers
    shuffle."""
    rha = textstats.round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"]
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mi": (d.dt.year * 12 + d.dt.month).to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64),
            "q": df["l_quantity"].to_numpy(np.float64)
            .astype(np.int64)})
        return g.groupby(["pk", "mi"], as_index=False).sum()

    pm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice", "l_quantity"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mi"], {"c": ("c", "sum"), "q": ("q", "sum")})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("mi")
        mi = g["mi"].to_numpy(np.int64)
        p = rha(10000.0 * g["c"].to_numpy(np.float64)
                / g["q"].to_numpy(np.float64), 0).astype(np.int64)
        consec = mi[1:] == mi[:-1] + 1
        return pd.DataFrame({
            "mi": mi[1:][consec],
            "n_matched": np.int64(1),
            "n_unchanged": (p[1:] == p[:-1])[consec]
            .astype(np.int64)})

    out = reduce_sink(
        pm.groupby("pk").map_groups(per_part,
                                    batch_format="pandas"),
        ["mi"], {"n_matched": ("n_matched", "sum"),
                 "n_unchanged": ("n_unchanged", "sum")}) \
        .to_pandas().sort_values("mi", ignore_index=True)
    return pd.DataFrame({
        "month_index": out["mi"].astype(np.int64),
        "n_matched": out["n_matched"].astype(np.int64),
        "n_unchanged": out["n_unchanged"].astype(np.int64),
        "unchanged_share": rha(out["n_unchanged"]
                               .to_numpy(np.float64)
                               / out["n_matched"]
                               .to_numpy(np.float64), 6)})


@register("schnabel_user_estimate", sql="""
WITH uw AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS wk
            FROM events),
fw AS (SELECT user_id, MIN(wk) AS w0 FROM uw GROUP BY user_id),
j AS (SELECT uw.wk, CASE WHEN uw.wk > fw.w0 THEN 1 ELSE 0 END
                        AS recap
      FROM uw JOIN fw USING (user_id)),
wk_agg AS (SELECT wk, COUNT(*) AS ct, SUM(recap) AS rt
           FROM j GROUP BY wk),
m AS (SELECT wk, ct, rt,
             COALESCE(SUM(ct - rt) OVER (
                 ORDER BY wk ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS mt
      FROM wk_agg)
SELECT CAST(SUM(ct) AS BIGINT) AS total_captures,
       CAST(SUM(rt) AS BIGINT) AS total_recaptures,
       CAST((SELECT COUNT(*) FROM fw) AS BIGINT) AS distinct_users,
       ROUND(SUM(ct * mt) * 1.0 / SUM(rt), 6)
           AS schnabel_estimate
FROM m""")
def schnabel_user_estimate(sf_dir: str) -> pd.DataFrame:
    """Schnabel multi-sample capture–recapture estimate of the TRUE
    user population: treat each week as a capture occasion (caught
    C_t, already-marked M_t, recaptured R_t) and pool N̂ =
    Σ C_t·M_t / Σ R_t — the k-occasion upgrade of the two-period
    Lincoln–Petersen already in the suite, far more stable because
    every week contributes. N̂ well above the observed distinct
    count quantifies the users your logging only ever sees
    sporadically. All terms are exact integers from one
    (user, week) dedup: each user's first week resolves inside a
    32-way bucket, weekly (C, R) integer rows reduce, and the
    O(weeks) cumulative runs driver-side."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "wk": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 604_800_000_000}) \
            .drop_duplicates()
        g["bucket_"] = (g["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return g

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "wk"])
        w0 = g.groupby("user_id", sort=False)["wk"].transform("min")
        out = pd.DataFrame({"wk": g["wk"],
                            "ct": np.int64(1),
                            "rt": (g["wk"] > w0).to_numpy()
                            .astype(np.int64)})
        return out.groupby("wk", as_index=False).sum()

    wk = reduce_sink(
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(pairs, batch_format="pandas")
        .groupby("bucket_").map_groups(per_user,
                                       batch_format="pandas"),
        ["wk"], {"ct": ("ct", "sum"), "rt": ("rt", "sum")}) \
        .to_pandas().sort_values("wk", ignore_index=True)
    ct = wk["ct"].to_numpy(np.int64)
    rt = wk["rt"].to_numpy(np.int64)
    new = ct - rt
    mt = np.concatenate([[0], new.cumsum()[:-1]])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "total_captures": np.array([int(ct.sum())], np.int64),
        "total_recaptures": np.array([int(rt.sum())], np.int64),
        "distinct_users": np.array([int(new.sum())], np.int64),
        "schnabel_estimate": [float(rha(
            int((ct * mt).sum()) / int(rt.sum()), 6))]})


@register("sku_resurrections", sql="""
WITH pm AS (SELECT l_partkey AS pk,
                   year(l_shipdate) * 12 + month(l_shipdate) AS mi,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0)
                            AS BIGINT)) AS c
            FROM lineitem GROUP BY 1, 2),
j AS (SELECT pk, mi, c,
             mi - LAG(mi) OVER (PARTITION BY pk ORDER BY mi) - 1
                 AS gap
      FROM pm)
SELECT CASE WHEN gap BETWEEN 3 AND 5 THEN '03-05'
            WHEN gap BETWEEN 6 AND 11 THEN '06-11'
            ELSE '12+' END AS gap_band,
       CAST(COUNT(*) AS BIGINT) AS n_resurrections,
       CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_parts,
       ROUND(SUM(c) / 100.0, 2) AS comeback_month_revenue_usd
FROM j WHERE gap >= 3 GROUP BY 1 ORDER BY 1""")
def sku_resurrections(sf_dir: str) -> pd.DataFrame:
    """SKU resurrections: parts that went DORMANT for ≥3 straight
    months and then sold again, banded by dormancy length, with the
    comeback month's revenue — the zombie-catalog read that
    both the lifecycle fill-rate (an average) and the vintage split
    (age since launch) blur: a 12+-month resurrection usually means
    a returns re-stock, a data backfill, or a revived listing that
    deserves a second look, not organic demand. Gaps are exact
    month-index arithmetic inside each part's map_groups; only
    (band, counts, cents) partials shuffle. The distinct-parts
    count is exact because one part's resurrection events all live
    in its single group: per-band per-part dedup happens there."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"]
        g = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "mi": (d.dt.year * 12 + d.dt.month).to_numpy(np.int64),
            "c": np.rint(df["l_extendedprice"]
                         .to_numpy(np.float64) * 100)
            .astype(np.int64)})
        return g.groupby(["pk", "mi"], as_index=False).sum()

    pm = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pandas"),
        ["pk", "mi"], {"c": ("c", "sum")})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("mi")
        mi = g["mi"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        gap = mi[1:] - mi[:-1] - 1
        m = gap >= 3
        if not m.any():
            return pd.DataFrame({"gap_band": [], "n_res": [],
                                 "pk_first": [], "cents": []})
        band = np.where(gap[m] <= 5, "03-05",
                        np.where(gap[m] <= 11, "06-11", "12+"))
        out = pd.DataFrame({"gap_band": band, "n_res": np.int64(1),
                            "cents": c[1:][m]})
        agg = out.groupby("gap_band", as_index=False).sum()
        agg["pk_first"] = np.int64(1)  # one part per band per group
        return agg

    out = reduce_sink(
        pm.groupby("pk").map_groups(per_part,
                                    batch_format="pandas"),
        ["gap_band"], {"n_res": ("n_res", "sum"),
                       "pk_first": ("pk_first", "sum"),
                       "cents": ("cents", "sum")}).to_pandas() \
        .sort_values("gap_band", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "gap_band": out["gap_band"],
        "n_resurrections": out["n_res"].astype(np.int64),
        "n_parts": out["pk_first"].astype(np.int64),
        "comeback_month_revenue_usd": rha(
            out["cents"].to_numpy(np.float64) / 100.0, 2)})


@register("order_value_by_ordinal", sql="""
WITH s AS (SELECT o_custkey AS c,
                  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      AS cents,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate,
                                              o_orderkey) AS rn
           FROM orders)
SELECT LEAST(rn, 10) AS ordinal,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(cents) / 100.0 / COUNT(*), 6)
           AS avg_order_value_usd
FROM s GROUP BY 1 ORDER BY 1""")
def order_value_by_ordinal(sf_dir: str) -> pd.DataFrame:
    """Customer-maturity spend curve: average order value by the
    order's ORDINAL in its customer's chronological history (1st,
    2nd, … capped at 10+) — rising means trust compounds and
    retention spend pays for itself, falling means the first basket
    was the biggest and acquisition economics must price that in.
    This is the per-relationship curve the monthly first-vs-repeat
    split can't show (it mixes all ordinals ≥2). Ordinals come from
    one sort inside 32-way customer buckets with the same
    (o_orderdate, o_orderkey) tie rule as the SQL window; only 10
    (ordinal, n, Σcents) integer rows shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_orderkey", "o_totalprice"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["o_custkey"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def ordinals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate",
                           "o_orderkey"], kind="mergesort")
        rn = g.groupby("o_custkey", sort=False).cumcount() + 1
        cents = np.rint(g["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        out = pd.DataFrame({"ordinal": np.minimum(rn, 10)
                            .astype(np.int64),
                            "n_orders": np.int64(1),
                            "cents": cents})
        return out.groupby("ordinal", as_index=False).sum()

    out = reduce_sink(
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_").map_groups(ordinals,
                                       batch_format="pandas"),
        ["ordinal"], {"n_orders": ("n_orders", "sum"),
                      "cents": ("cents", "sum")}).to_pandas() \
        .sort_values("ordinal", ignore_index=True)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "ordinal": out["ordinal"].astype(np.int64),
        "n_orders": out["n_orders"].astype(np.int64),
        "avg_order_value_usd": rha(
            out["cents"].to_numpy(np.float64) / 100.0
            / out["n_orders"].to_numpy(np.float64), 6)})


@register("aha_moment_retention", sql="""
WITH uw AS (SELECT user_id, event_type,
                   epoch_us(ts) // 604800000000 AS wk
            FROM events),
u AS (SELECT user_id, MIN(wk) AS w0 FROM uw GROUP BY user_id),
r AS (SELECT u.user_id, u.w0,
             MAX(CASE WHEN uw.wk = u.w0 + 1 THEN 1 ELSE 0 END)
                 AS ret
      FROM u JOIN uw ON uw.user_id = u.user_id
      GROUP BY u.user_id, u.w0),
x AS (SELECT u.user_id, uw.event_type
      FROM u JOIN uw ON uw.user_id = u.user_id
          AND uw.wk = u.w0
      GROUP BY u.user_id, uw.event_type),
t AS (SELECT DISTINCT event_type FROM events),
g AS (SELECT t.event_type, r.user_id, r.ret,
             CASE WHEN x.user_id IS NULL THEN 0 ELSE 1 END AS exp
      FROM t CROSS JOIN r
      LEFT JOIN x ON x.user_id = r.user_id
          AND x.event_type = t.event_type)
SELECT event_type,
       CAST(SUM(exp) AS BIGINT) AS n_exposed,
       ROUND(SUM(CASE WHEN exp = 1 THEN ret END) * 1.0
             / SUM(exp), 6) AS ret_exposed,
       CAST(SUM(1 - exp) AS BIGINT) AS n_unexposed,
       ROUND(SUM(CASE WHEN exp = 0 THEN ret END) * 1.0
             / SUM(1 - exp), 6) AS ret_unexposed,
       ROUND((SUM(CASE WHEN exp = 1 THEN ret END) * 1.0
              / SUM(exp))
             / (SUM(CASE WHEN exp = 0 THEN ret END) * 1.0
                / SUM(1 - exp)), 6) AS lift
FROM g GROUP BY event_type ORDER BY event_type""")
def aha_moment_retention(sf_dir: str) -> pd.DataFrame:
    """'Aha-moment' screen: for each event type, week-1 retention
    of users who did that action in their FIRST week vs those who
    didn't — the correlational candidate list behind 'users who X
    in week one stick around', the single most-copied growth
    analysis of the last decade; the retention-cohort triangle
    can't produce it because it never conditions on week-0
    behavior. Each user's first week, week-0 type set and week-1
    activity all resolve inside one 32-way bucket pass; only
    (type, exposed, retained) integer cells shuffle and every rate
    is an exact division."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_type": df["event_type"].astype(str),
            "wk": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64) // 604_800_000_000}) \
            .drop_duplicates()
        g["bucket_"] = (g["user_id"].to_numpy() % 32) \
            .astype(np.int32)
        return g

    all_types = sorted(
        pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type"])["event_type"]
        .unique().to_pylist())

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "event_type",
                                      "wk"])
        w0 = g.groupby("user_id", sort=False)["wk"] \
            .transform("min")
        ret_u = g[g["wk"] == w0 + 1].groupby("user_id",
                                             sort=False).size()
        wk0 = g[g["wk"] == w0]
        users = g["user_id"].unique()
        ret = pd.Series(users).isin(ret_u.index).to_numpy() \
            .astype(np.int64)
        rows = []
        exp_sets = wk0.groupby("user_id", sort=False)["event_type"] \
            .agg(set)
        for t in all_types:
            exp = pd.Series(users).map(
                lambda u: 1 if t in exp_sets.get(u, ())
                else 0).to_numpy(np.int64)
            rows.append(pd.DataFrame({
                "event_type": t,
                "n_exposed": [np.int64(exp.sum())],
                "ret_exp": [np.int64((ret * exp).sum())],
                "n_unexposed": [np.int64((1 - exp).sum())],
                "ret_unexp": [np.int64((ret * (1 - exp)).sum())]}))
        return pd.concat(rows, ignore_index=True)

    out = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(pairs, batch_format="pandas")
        .groupby("bucket_").map_groups(per_user,
                                       batch_format="pandas"),
        ["event_type"], {"n_exposed": ("n_exposed", "sum"),
                         "ret_exp": ("ret_exp", "sum"),
                         "n_unexposed": ("n_unexposed", "sum"),
                         "ret_unexp": ("ret_unexp", "sum")}) \
        .to_pandas().sort_values("event_type", ignore_index=True)
    rha = textstats.round_half_away
    re_ = out["ret_exp"].to_numpy(np.float64) \
        / out["n_exposed"].to_numpy(np.float64)
    ru = out["ret_unexp"].to_numpy(np.float64) \
        / out["n_unexposed"].to_numpy(np.float64)
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n_exposed": out["n_exposed"].astype(np.int64),
        "ret_exposed": rha(re_, 6),
        "n_unexposed": out["n_unexposed"].astype(np.int64),
        "ret_unexposed": rha(ru, 6),
        "lift": rha(re_ / ru, 6)})


@register("double_payment_screen", sql="""
WITH s AS (SELECT o_custkey AS c, o_orderkey AS k,
                  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      AS cents,
                  epoch_us(o_orderdate) // 86400000000 AS d
           FROM orders),
p AS (SELECT a.k AS ka, b.k AS kb
      FROM s a JOIN s b
          ON a.c = b.c AND a.cents = b.cents AND a.k < b.k
          AND ABS(a.d - b.d) <= 7),
f AS (SELECT DISTINCT k
      FROM (SELECT ka AS k FROM p UNION ALL SELECT kb FROM p)),
fs AS (SELECT COALESCE(SUM(s.cents), 0) AS sc, COUNT(*) AS n
       FROM s JOIN f ON f.k = s.k)
SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_pairs,
       CAST(fs.n AS BIGINT) AS n_orders_flagged,
       ROUND(fs.sc / 100.0, 2) AS flagged_usd
FROM fs""")
def double_payment_screen(sf_dir: str) -> pd.DataFrame:
    """Duplicate-payment screen: pairs of orders by the SAME
    customer for the IDENTICAL amount (exact cents) within 7 days —
    the classic AP-audit red flag (double submission, retried
    charge, botched idempotency) that the amount-blind
    nearby-orders count can't isolate: two $9,999.37 orders three
    days apart are a different animal from two different baskets.
    Same-(customer, cents) groups are tiny, so pairs enumerate
    inside a 32-way customer-bucket map_groups with a sorted
    two-pointer — never an all-to-all — and only three scalars
    (pairs, flagged orders, flagged dollars) leave the cluster."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey",
                                  "o_orderdate", "o_totalprice"])

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket_"] = (df["o_custkey"].to_numpy() % 32) \
            .astype(np.int32)
        return df

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(g["o_totalprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
        d = g["o_orderdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        t = pd.DataFrame({"c": g["o_custkey"].to_numpy(np.int64),
                          "cents": cents, "d": d,
                          "k": g["o_orderkey"].to_numpy(np.int64)})
        t = t.sort_values(["c", "cents", "d", "k"],
                          kind="mergesort")
        n_pairs = 0
        flagged = set()
        fl_cents = 0
        for _, grp in t.groupby(["c", "cents"], sort=False):
            if len(grp) < 2:
                continue
            dd = grp["d"].to_numpy(np.int64)
            kk = grp["k"].to_numpy(np.int64)
            cc = int(grp["cents"].iloc[0])
            lo = 0
            for i in range(len(dd)):
                while dd[i] - dd[lo] > 7:
                    lo += 1
                if i > lo:
                    n_pairs += i - lo
                    for j in range(lo, i + 1):
                        if kk[j] not in flagged:
                            flagged.add(int(kk[j]))
                            fl_cents += cc
        return pd.DataFrame({"n_pairs": [np.int64(n_pairs)],
                             "n_flagged": [np.int64(len(flagged))],
                             "fl_cents": [np.int64(fl_cents)]})

    p = ds.map_batches(with_bucket, batch_format="pandas") \
        .groupby("bucket_").map_groups(scan,
                                       batch_format="pandas") \
        .to_pandas().sum()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_pairs": np.array([int(p["n_pairs"])], np.int64),
        "n_orders_flagged": np.array([int(p["n_flagged"])],
                                     np.int64),
        "flagged_usd": [float(rha(int(p["fl_cents"]) / 100.0,
                                  2))]})


@register("annual_seasonality_by_nation", sql="""
WITH j AS (SELECT n.n_name AS nation, month(o.o_orderdate) AS m,
                  SUM(CAST(ROUND(o.o_totalprice * 100, 0)
                           AS BIGINT)) AS cents
           FROM orders o
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           GROUP BY 1, 2),
f AS (SELECT nation, SUM(cents) AS tot,
             SUM(cents * COS(2 * PI() * (m - 1) / 12)) AS sc,
             SUM(cents * SIN(2 * PI() * (m - 1) / 12)) AS ss
      FROM j GROUP BY nation)
SELECT nation, ROUND(tot / 100.0, 2) AS total_usd,
       ROUND(SQRT(sc * sc + ss * ss) / 6 / 100.0, 6)
           AS amplitude_usd,
       ROUND(((ATAN2(ss / 6, sc / 6) / (2 * PI()) * 12) + 12)
             % 12 + 1, 6) AS peak_month
FROM f ORDER BY nation""")
def annual_seasonality_by_nation(sf_dir: str) -> pd.DataFrame:
    """ANNUAL revenue seasonality per customer nation: first
    harmonic of the month-of-year revenue profile — amplitude in
    dollars and the continuous peak month — the yearly cycle
    companion to the daily/weekly rhythm queries (none of which
    can say 'Brazil peaks in March, Japan in November', the
    calendar fact that drives inventory pre-positioning). With all
    12 bins present the balanced-design cosinor collapses to exact
    closed form (Σcos²=6, cross-terms vanish) — the same
    expression both engines evaluate over integer cents and 12
    fixed angles; custkey→nation resolves through two broadcast
    dicts, and only (nation, month) cent partials shuffle."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].to_numpy(),
                    nat["n_name"].to_pylist()))
    cmap_ref = ray.put({int(c): nmap[int(nk)]
                        for c, nk in zip(
                            cust["c_custkey"].to_numpy(),
                            cust["c_nationkey"].to_numpy())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "nation": df["o_custkey"].map(ray.get(cmap_ref))
            .astype(str),
            "m": df["o_orderdate"].dt.month.to_numpy(np.int64),
            "cents": np.rint(df["o_totalprice"]
                             .to_numpy(np.float64) * 100)
            .astype(np.int64)})
        return g.groupby(["nation", "m"], as_index=False).sum()

    j = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        ["nation", "m"], {"cents": ("cents", "sum")}).to_pandas()
    rha = textstats.round_half_away
    rows = []
    for nation, d in j.groupby("nation", sort=True):
        m = d["m"].to_numpy(np.float64)
        cents = d["cents"].to_numpy(np.float64)
        th = 2 * np.pi * (m - 1) / 12
        tot = cents.sum()
        sc = (cents * np.cos(th)).sum()
        ss = (cents * np.sin(th)).sum()
        amp = np.sqrt(sc * sc + ss * ss) / 6 / 100.0
        peak = (np.arctan2(ss / 6, sc / 6) / (2 * np.pi) * 12
                + 12) % 12 + 1
        rows.append((nation, float(rha(tot / 100.0, 2)),
                     float(rha(amp, 6)), float(rha(peak, 6))))
    return pd.DataFrame(rows, columns=["nation", "total_usd",
                                       "amplitude_usd",
                                       "peak_month"])


@register("preferential_attachment_parts", sql="""
WITH sp AS (SELECT MIN(epoch_us(l_shipdate)) AS lo,
                   MAX(epoch_us(l_shipdate)) AS hi
            FROM lineitem),
h AS (SELECT l_partkey AS pk,
             SUM(CASE WHEN epoch_us(l_shipdate)
                          < (sp.lo + sp.hi) / 2
                      THEN CAST(ROUND(l_extendedprice * 100, 0)
                                AS BIGINT) ELSE 0 END) AS c1,
             SUM(CASE WHEN epoch_us(l_shipdate)
                          >= (sp.lo + sp.hi) / 2
                      THEN CAST(ROUND(l_extendedprice * 100, 0)
                                AS BIGINT) ELSE 0 END) AS c2
      FROM lineitem, sp GROUP BY pk, sp.lo, sp.hi),
b AS (SELECT pk, c1, c2 FROM h WHERE c1 > 0),
r AS (SELECT pk,
             ROW_NUMBER() OVER (ORDER BY c1 DESC, pk) AS r1,
             ROW_NUMBER() OVER (ORDER BY c2 * 1.0 / c1 DESC, pk)
                 AS rg
      FROM b),
d AS (SELECT COUNT(*) AS n,
             SUM((r1 - rg) * (r1 - rg)) AS sd2
      FROM r)
SELECT CAST(n AS BIGINT) AS n_parts,
       ROUND(1 - 6.0 * sd2 / (n * (n * n - 1.0)), 6)
           AS spearman_rho
FROM d""")
def preferential_attachment_parts(sf_dir: str) -> pd.DataFrame:
    """Cumulative-advantage (rich-get-richer) screen: Spearman
    correlation across parts between first-half revenue RANK and
    second-half GROWTH rank (c2/c1, first-half sellers only) — a
    positive rho means already-big SKUs are compounding
    (recommendation/placement feedback loops), negative means
    mean reversion; the rank-movers list shows WHO moved, this
    says whether the SYSTEM has momentum. The time midpoint
    broadcasts as a scalar, per-part half-cents reduce exactly,
    and both ranks use the identical (value DESC, partkey) tie
    rule so Σd² is exact integer arithmetic."""
    span = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "lo": [df["l_shipdate"].to_numpy("datetime64[us]")
                   .astype(np.int64).min()],
            "hi": [df["l_shipdate"].to_numpy("datetime64[us]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = int(span["lo"].min()), int(span["hi"].max())
    mid = (lo + hi) // 2
    # SQL (lo+hi)/2 is float division; match its threshold exactly
    midf = (lo + hi) / 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["l_shipdate"].to_numpy("datetime64[us]") \
            .astype(np.int64)
        c = np.rint(df["l_extendedprice"].to_numpy(np.float64)
                    * 100).astype(np.int64)
        first = us < midf
        g = pd.DataFrame({"pk": df["l_partkey"].to_numpy(np.int64),
                          "c1": np.where(first, c, 0),
                          "c2": np.where(first, 0, c)})
        return g.groupby("pk", as_index=False).sum()

    h = reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pandas"),
        ["pk"], {"c1": ("c1", "sum"), "c2": ("c2", "sum")}) \
        .to_pandas()
    b = h[h["c1"] > 0].copy()
    pk = b["pk"].to_numpy(np.int64)
    c1 = b["c1"].to_numpy(np.int64)
    g = b["c2"].to_numpy(np.float64) / b["c1"].to_numpy(np.float64)
    r1 = np.lexsort((pk, -c1)).argsort() + 1
    rg = np.lexsort((pk, -g)).argsort() + 1
    n = len(b)
    sd2 = int(((r1 - rg).astype(object) ** 2).sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_parts": np.array([n], np.int64),
        "spearman_rho": [float(rha(
            1 - 6.0 * sd2 / (n * (n * n - 1.0)), 6))]})


@register("name_format_conformance", sql="""
SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN regexp_full_match(
                c_name, 'Customer#[0-9]{9}') THEN 1 ELSE 0 END)
            AS BIGINT) AS conforming,
       ROUND(SUM(CASE WHEN regexp_full_match(
                c_name, 'Customer#[0-9]{9}') THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS share
FROM customer
UNION ALL
SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN regexp_full_match(
                s_name, 'Supplier#[0-9]{9}') THEN 1 ELSE 0 END)
            AS BIGINT),
       ROUND(SUM(CASE WHEN regexp_full_match(
                s_name, 'Supplier#[0-9]{9}') THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6)
FROM supplier
UNION ALL
SELECT 'part', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN regexp_full_match(
                p_name, '[a-z ]+') THEN 1 ELSE 0 END)
            AS BIGINT),
       ROUND(SUM(CASE WHEN regexp_full_match(
                p_name, '[a-z ]+') THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6)
FROM part
ORDER BY tbl""")
def name_format_conformance(sf_dir: str) -> pd.DataFrame:
    """Name-format contract audit: share of rows whose surrogate
    name matches the generator's documented pattern
    (Customer#<9 digits>, Supplier#<9 digits>, lowercase-word part
    names) — the cheap canary for upstream format drift: one
    malformed batch from a new producer version shows up here
    before it breaks the regex-keyed parsers and fuzzy matchers
    downstream. Vectorized full-match per batch (compiled once per
    task), three integer partials per table."""
    import re as _re
    specs = [("customer", "c_name", r"Customer#[0-9]{9}"),
             ("part", "p_name", r"[a-z ]+"),
             ("supplier", "s_name", r"Supplier#[0-9]{9}")]
    rha = textstats.round_half_away
    rows = []
    for tbl, col, pat in specs:
        rx = _re.compile(pat)

        def f(df: pd.DataFrame, col=col, rx=rx) -> pd.DataFrame:
            ok = df[col].astype(str).map(
                lambda s: rx.fullmatch(s) is not None)
            return pd.DataFrame({
                "n": [np.int64(len(df))],
                "c": [np.int64(ok.sum())]})

        p = rd.read_parquet(f"{sf_dir}/{tbl}.parquet",
                            columns=[col]) \
            .map_batches(f, batch_format="pandas").to_pandas().sum()
        n, c = int(p["n"]), int(p["c"])
        rows.append((tbl, n, c, float(rha(c / n, 6))))
    return pd.DataFrame(rows, columns=["tbl", "n_rows",
                                       "conforming", "share"]) \
        .astype({"n_rows": np.int64, "conforming": np.int64})


@register("jarque_bera_value_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
hh AS (SELECT g, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
mom AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * c) AS BIGINT) AS s1,
               CAST(SUM(cnt * c * c) AS HUGEINT) AS s2,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c)
                    AS HUGEINT) AS s3,
               CAST(SUM(CAST(cnt AS HUGEINT) * c * c * c * c)
                    AS HUGEINT) AS s4
        FROM hh GROUP BY g),
st AS (SELECT g, n,
              CAST(s1 AS DOUBLE) / n AS m1,
              CAST(s2 AS DOUBLE) / n AS r2,
              CAST(s3 AS DOUBLE) / n AS r3,
              CAST(s4 AS DOUBLE) / n AS r4
       FROM mom),
cm AS (SELECT g, n,
              r2 - m1 * m1 AS m2,
              r3 - 3 * r2 * m1 + 2 * m1 * m1 * m1 AS m3,
              r4 - 4 * r3 * m1 + 6 * r2 * m1 * m1
                 - 3 * m1 * m1 * m1 * m1 AS m4
       FROM st),
jb AS (SELECT g, n,
              m3 / sqrt(m2 * m2 * m2) AS skew,
              m4 / (m2 * m2) - 3.0 AS exkurt
       FROM cm WHERE m2 > 0)
SELECT g AS event_type, n,
       ROUND(skew, 6) AS skewness,
       ROUND(exkurt, 6) AS excess_kurtosis,
       ROUND(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0), 6)
           AS jb_stat,
       CAST(CASE WHEN n / 6.0 * (skew * skew + exkurt * exkurt / 4.0)
                      > 5.991465 THEN 1 ELSE 0 END AS BIGINT)
           AS normal_rejected
FROM jb ORDER BY 1""")
def jarque_bera_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Jarque–Bera normality test per event type: the classic
    omnibus test JB = n/6·(g1² + g2²/4) over moment skewness g1 and
    excess kurtosis g2, rejected against the χ²₂ 5% critical value
    5.991465 — the gate a modeling team checks before reaching for
    z-intervals or Gaussian assumptions on the value column. Power
    sums S1..S4 reduce as exact integers off one (type, cents)
    contingency (distinct-cents bounded, so partials stay tiny at
    any row scale); skewness uses m3/√(m2³) so no transcendental
    pow() has to agree across engines, and every float expression
    evaluates in the IDENTICAL operand order both sides."""
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
    import math
    rows = []
    for g, grp in hh.groupby("g", sort=True):
        cnt = grp["cnt"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        s1 = sum(int(a) * int(b) for a, b in zip(cnt, c))
        s2 = sum(int(a) * int(b) ** 2 for a, b in zip(cnt, c))
        s3 = sum(int(a) * int(b) ** 3 for a, b in zip(cnt, c))
        s4 = sum(int(a) * int(b) ** 4 for a, b in zip(cnt, c))
        m1 = float(s1) / n
        r2, r3, r4 = float(s2) / n, float(s3) / n, float(s4) / n
        m2 = r2 - m1 * m1
        if m2 <= 0:
            continue
        m3 = r3 - 3 * r2 * m1 + 2 * m1 * m1 * m1
        m4 = r4 - 4 * r3 * m1 + 6 * r2 * m1 * m1 \
            - 3 * m1 * m1 * m1 * m1
        skew = m3 / math.sqrt(m2 * m2 * m2)
        exk = m4 / (m2 * m2) - 3.0
        jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
        rows.append((g, n, float(rha(skew, 6)), float(rha(exk, 6)),
                     float(rha(jb, 6)), 1 if jb > 5.991465 else 0))
    out = pd.DataFrame(rows, columns=[
        "event_type", "n", "skewness", "excess_kurtosis", "jb_stat",
        "normal_rejected"])
    out["n"] = out["n"].astype(np.int64)
    out["normal_rejected"] = out["normal_rejected"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


@register("bartlett_variance_by_type", sql="""
WITH v AS (SELECT event_type AS g,
                  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
mom AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
        FROM v GROUP BY g),
sv AS (SELECT g, n,
              CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                  / (n * (n - 1.0)) AS si2
       FROM mom WHERE n > 1),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS big_n,
               SUM((n - 1) * si2) AS pooled_num,
               SUM((n - 1) * ln(si2)) AS sum_lns,
               SUM(1.0 / (n - 1)) AS sum_inv
        FROM sv)
SELECT k, big_n,
       ROUND(((big_n - k) * ln(pooled_num / (big_n - k)) - sum_lns)
             / (1.0 + (sum_inv - 1.0 / (big_n - k))
                      / (3.0 * (k - 1))), 6) AS bartlett_x2,
       CAST(CASE WHEN ((big_n - k) * ln(pooled_num / (big_n - k))
                       - sum_lns)
                      / (1.0 + (sum_inv - 1.0 / (big_n - k))
                               / (3.0 * (k - 1)))
                      > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
           AS equal_var_rejected
FROM agg""")
def bartlett_variance_by_type(sf_dir: str) -> pd.DataFrame:
    """Bartlett's test of variance homogeneity across the event
    types — the normal-theory sharp counterpart to the already-shipped
    robust Brown–Forsythe screen: X² = [(N−k)·ln(Sp²) −
    Σ(nᵢ−1)·ln(Sᵢ²)]/C with the standard small-sample correction C,
    rejected against χ²₄'s 5% critical value 9.487729 (k=5 types).
    ANOVA's pooled-variance F is only trustworthy when this passes;
    a rejection says compare-by-type needs Welch machinery. Per-type
    (n, Σc, Σc²) reduce exactly in integer cents so each sample
    variance is a single float division; only k≈5 scalar terms ever
    combine in float, so the cross-group sums are noise-free at any
    row count."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"g": df["event_type"].astype(str),
                             "c": c, "c2": c * c})

    mom = reduce_sink(
        _events(sf_dir, ["event_type", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["g"], {"n": ("c", "size"), "s1": ("c", "sum"),
                "s2": ("c2", "sum")}).to_pandas() \
        .sort_values("g", ignore_index=True)
    import math
    k = 0
    big_n = 0
    pooled_num = 0.0
    sum_lns = 0.0
    sum_inv = 0.0
    for _, r in mom.iterrows():
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        if n <= 1:
            continue
        si2 = float(n * s2 - s1 * s1) / (n * (n - 1.0))
        k += 1
        big_n += n
        pooled_num += (n - 1) * si2
        sum_lns += (n - 1) * math.log(si2)
        sum_inv += 1.0 / (n - 1)
    x2 = ((big_n - k) * math.log(pooled_num / (big_n - k)) - sum_lns) \
        / (1.0 + (sum_inv - 1.0 / (big_n - k)) / (3.0 * (k - 1)))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "k": np.array([k], np.int64),
        "big_n": np.array([big_n], np.int64),
        "bartlett_x2": [float(rha(x2, 6))],
        "equal_var_rejected": np.array(
            [1 if x2 > 9.487729 else 0], np.int64)})


def _daily_counts(sf_dir: str) -> np.ndarray:
    """Daily event counts in date order (exact BIGINTs; the daily
    series is calendar-bounded so the driver-side array stays tiny
    at any row scale — only (date, count) partials ever shuffle)."""
    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "date", pc.strftime(batch["ts"], format="%Y-%m-%d"))

    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["date"], {"y": ("date", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    return d["y"].to_numpy(np.int64)


def _ols_int_sums(y: np.ndarray, t0: int = 0):
    """Exact integer OLS sufficient statistics of y on t=t0..t0+n-1."""
    n = len(y)
    t = range(t0, t0 + n)
    sx = sum(t)
    sy = int(y.sum())
    sxx = sum(v * v for v in t)
    syy = sum(int(v) * int(v) for v in y)
    sxy = sum(a * int(b) for a, b in zip(t, y))
    return n, sx, sy, sxx, syy, sxy


def _ols_ssr(n, sx, sy, sxx, syy, sxy) -> float:
    """Sum of squared OLS residuals from exact integer sums; the
    single float expression is shared verbatim with the oracle SQL."""
    return (float(n * syy - sy * sy)
            - float(n * sxy - sx * sy) * float(n * sxy - sx * sy)
            / float(n * sxx - sx * sx)) / n


@register("chow_break_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
x AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY dt) - 1 AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn FROM d),
seg AS (SELECT y, t, CASE WHEN 2 * t < nn THEN 0 ELSE 1 END AS h FROM x),
s AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(t * y) AS HUGEINT) AS sxy
      FROM seg GROUP BY h),
r AS (SELECT h, n,
             (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
              - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
             / n AS ssr
      FROM s),
fs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(t) AS BIGINT) AS sx,
              CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(t * t) AS HUGEINT) AS sxx,
              CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
              CAST(SUM(t * y) AS HUGEINT) AS sxy
       FROM seg),
fr AS (SELECT n,
              (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
               - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
              / n AS ssr_f
       FROM fs)
SELECT fr.n AS n_days,
       ROUND(fr.ssr_f, 6) AS ssr_full,
       ROUND(r0.ssr + r1.ssr, 6) AS ssr_split,
       ROUND(((fr.ssr_f - r0.ssr - r1.ssr) / 2.0)
             / ((r0.ssr + r1.ssr) / (fr.n - 4.0)), 6) AS f_chow,
       CAST(2 AS BIGINT) AS df1,
       fr.n - 4 AS df2
FROM fr, (SELECT ssr FROM r WHERE h = 0) r0,
     (SELECT ssr FROM r WHERE h = 1) r1""")
def chow_break_daily(sf_dir: str) -> pd.DataFrame:
    """Chow structural-break F-test on the daily event-count trend at
    the series midpoint: fit count ~ day OLS on the full window and
    on each half, F = [(SSR_full − SSR₁ − SSR₂)/k] / [(SSR₁+SSR₂)/
    (n−2k)] with k=2 — the confirmatory companion to the
    already-shipped Pettitt/changepoint locators (those find WHERE a
    shift is, this tests whether the regime split is statistically
    real). Every sufficient statistic (Σt, Σy, Σt², Σy², Σty per
    half) is exact integer arithmetic off the tiny (date, count)
    reduce; each SSR is ONE shared float expression evaluated in
    identical operand order on both engines."""
    y = _daily_counts(sf_dir)
    n = len(y)
    m = (n + 1) // 2  # first half: 2t < n  ⇔  t < n/2
    ssr0 = _ols_ssr(*_ols_int_sums(y[:m], 0))
    ssr1 = _ols_ssr(*_ols_int_sums(y[m:], m))
    ssr_f = _ols_ssr(*_ols_int_sums(y, 0))
    f = ((ssr_f - ssr0 - ssr1) / 2.0) / ((ssr0 + ssr1) / (n - 4.0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "ssr_full": [float(rha(ssr_f, 6))],
        "ssr_split": [float(rha(ssr0 + ssr1, 6))],
        "f_chow": [float(rha(f, 6))],
        "df1": np.array([2], np.int64),
        "df2": np.array([n - 4], np.int64)})


@register("durbin_watson_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
x AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY dt) - 1 AS BIGINT) AS t,
             y - LAG(y) OVER (ORDER BY dt) AS dy FROM d),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * t) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(t * y) AS HUGEINT) AS sxy,
             CAST(SUM(dy) AS BIGINT) AS sd1,
             CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS sd2
      FROM x),
b AS (SELECT n, sd1, sd2,
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                 AS slope,
             (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
              - CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
             / n AS ssr
      FROM s)
SELECT n AS n_days,
       ROUND((sd2 - 2 * slope * sd1 + (n - 1) * slope * slope)
             / ssr, 6) AS dw_stat,
       ROUND(1.0 - (sd2 - 2 * slope * sd1 + (n - 1) * slope * slope)
                   / ssr / 2.0, 6) AS rho1_approx
FROM b""")
def durbin_watson_daily(sf_dir: str) -> pd.DataFrame:
    """Durbin–Watson serial-correlation diagnostic on the residuals
    of the daily count ~ day OLS trend — the test that says whether
    the trend line's error bars (and every forecast built on it:
    AR1, Holt, Theil–Sen already in the registry) can treat days as
    independent, with ρ₁ ≈ 1 − DW/2 reported alongside. The key
    identity: residual first differences cancel the intercept, so
    Σ(eₜ−eₜ₋₁)² = ΣΔy² − 2b·ΣΔy + (n−1)b² — meaning the WHOLE
    statistic reduces to exact integer aggregates (ΣΔy, ΣΔy² via one
    LAG pass) plus the closed-form slope; no per-day float residual
    is ever materialized, and both engines evaluate one identical
    float expression."""
    y = _daily_counts(sf_dir)
    n, sx, sy, sxx, syy, sxy = _ols_int_sums(y, 0)
    dy = np.diff(y)
    sd1 = int(dy.sum())
    sd2 = sum(int(v) * int(v) for v in dy)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    ssr = _ols_ssr(n, sx, sy, sxx, syy, sxy)
    dw = (sd2 - 2 * slope * sd1 + (n - 1) * slope * slope) / ssr
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "dw_stat": [float(rha(dw, 6))],
        "rho1_approx": [float(rha(
            1.0 - (sd2 - 2 * slope * sd1 + (n - 1) * slope * slope)
            / ssr / 2.0, 6))]})


def _word_counts(sf_dir: str, keys: list[str]) -> rd.Dataset:
    """(keys..., word) -> cnt over whitespace tokens of documents.text
    (the registry-wide tokenization convention: regexp \\S+ both
    engines). Only (key, word, partial-count) rows shuffle — bounded
    by vocabulary, not corpus size."""
    def words(batch: pa.Table) -> pd.DataFrame:
        w = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), r"\s+")
        counts = pc.list_value_length(w).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(w).to_pandas()
        cols = {"word": flat}
        for k in keys:
            cols[k] = np.repeat(batch[k].to_pandas().to_numpy(),
                                counts)
        df = pd.DataFrame(cols)
        df = df[df["word"].str.len() > 0]
        return df.groupby(keys + ["word"], as_index=False) \
            .size().rename(columns={"size": "cnt"})

    return reduce_sink(
        _docs(sf_dir, ["text"] + keys).map_batches(
            words, batch_format="pyarrow"),
        keys + ["word"], {"cnt": ("cnt", "sum")})


@register("good_turing_unseen_by_source", sql=r"""
WITH w AS (SELECT source,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1, 2),
g AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM c GROUP BY 1)
SELECT source, n_tokens, vocab, n1, n2,
       ROUND(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
       ROUND(vocab + n1 * (n1 - 1.0) / (2.0 * (n2 + 1)), 6)
           AS chao1_richness
FROM g ORDER BY source""")
def good_turing_unseen_by_source(sf_dir: str) -> pd.DataFrame:
    """Good–Turing missing mass and Chao1 species richness per
    source: P₀ = N₁/N estimates the probability the NEXT token drawn
    from each source is a never-seen word (the coverage number that
    sizes open-vocabulary risk for tokenizer training), and the
    bias-corrected Chao1 = V + N₁(N₁−1)/(2(N₂+1)) estimates how much
    vocabulary the crawl hasn't collected yet — together the
    keep-crawling-or-stop signal per source. Everything derives from
    the singleton/doubleton counts of one (source, word) reduce;
    integers stay exact to any scale and the two final divisions are
    shared expressions."""
    c = _word_counts(sf_dir, ["source"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            one=(df["cnt"] == 1).astype(np.int64),
            two=(df["cnt"] == 2).astype(np.int64)) \
            .groupby("source", as_index=False) \
            .agg(n_tokens=("cnt", "sum"), vocab=("cnt", "size"),
                 n1=("one", "sum"), n2=("two", "sum"))

    g = reduce_sink(
        c.map_batches(roll, batch_format="pandas"),
        ["source"], {"n_tokens": ("n_tokens", "sum"),
                     "vocab": ("vocab", "sum"),
                     "n1": ("n1", "sum"), "n2": ("n2", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    rha = textstats.round_half_away
    g["p_unseen"] = [
        float(rha(float(a) / b, 6))
        for a, b in zip(g["n1"], g["n_tokens"])]
    g["chao1_richness"] = [
        float(rha(v + a * (a - 1.0) / (2.0 * (b + 1)), 6))
        for v, a, b in zip(g["vocab"], g["n1"], g["n2"])]
    return g.astype({"n_tokens": np.int64, "vocab": np.int64,
                     "n1": np.int64, "n2": np.int64})


@register("freq_of_freq_spectrum", sql=r"""
WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
b AS (SELECT CASE WHEN cnt > 10 THEN 11 ELSE cnt END AS freq_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(cnt) AS BIGINT) AS tokens
      FROM c GROUP BY 1)
SELECT CAST(freq_bucket AS BIGINT) AS freq_bucket, n_words, tokens,
       ROUND(CAST(tokens AS DOUBLE) / t.total, 6) AS token_mass_share
FROM b, t ORDER BY freq_bucket""")
def freq_of_freq_spectrum(sf_dir: str) -> pd.DataFrame:
    """Corpus frequency-of-frequencies spectrum N_r (words seen
    exactly r times, r = 1..10 plus an 11+ tail) with each bucket's
    share of total token mass — the raw input table of simple
    Good–Turing smoothing and the one chart that shows where a
    corpus's probability mass lives (a healthy crawl has a smooth
    hyperbolic N_r; spikes at specific r betray boilerplate
    duplication the dedup stages should have caught). One global
    (word, count) reduce; the spectrum is a second tiny reduce over
    vocabulary-bounded rows, all integer until the final share."""
    c = _word_counts(sf_dir, [])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        fb = np.minimum(df["cnt"].to_numpy(np.int64), 11)
        return pd.DataFrame({"freq_bucket": fb,
                             "one": np.ones(len(df), np.int64),
                             "tokens": df["cnt"].to_numpy(np.int64)}) \
            .groupby("freq_bucket", as_index=False).sum()

    b = reduce_sink(
        c.map_batches(roll, batch_format="pandas"),
        ["freq_bucket"], {"n_words": ("one", "sum"),
                          "tokens": ("tokens", "sum")}) \
        .to_pandas().sort_values("freq_bucket", ignore_index=True)
    total = int(b["tokens"].sum())
    rha = textstats.round_half_away
    b["token_mass_share"] = [
        float(rha(float(t) / total, 6)) for t in b["tokens"]]
    return b.astype({"freq_bucket": np.int64, "n_words": np.int64,
                     "tokens": np.int64})


@register("gumbel_weekly_max_fit", sql="""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
w AS (SELECT day // 7 AS wk, CAST(MAX(y) AS BIGINT) AS mx
      FROM d GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(mx) AS BIGINT) AS s1,
             CAST(SUM(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS s2,
             CAST(MAX(mx) AS BIGINT) AS obs_max
      FROM w),
p AS (SELECT k, obs_max,
             CAST(s1 AS DOUBLE) / k AS mean,
             sqrt(CAST(k * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                  / (k * (k - 1.0))) AS sd
      FROM s),
g AS (SELECT k, obs_max, mean, sd,
             sd * sqrt(6.0) / pi() AS beta
      FROM p),
m AS (SELECT k, obs_max, mean, sd, beta,
             mean - 0.5772156649015329 * beta AS mu
      FROM g)
SELECT k AS n_weeks, obs_max,
       ROUND(mean, 6) AS mean_weekly_max,
       ROUND(sd, 6) AS sd_weekly_max,
       ROUND(mu, 6) AS gumbel_mu,
       ROUND(beta, 6) AS gumbel_beta,
       ROUND(mu - beta * ln(-ln(1.0 - 1.0 / 52)), 6)
           AS ret_level_52w,
       ROUND(1.0 - exp(-exp(-(obs_max - mu) / beta)), 6)
           AS p_week_exceeds_obs_max
FROM m""")
def gumbel_weekly_max_fit(sf_dir: str) -> pd.DataFrame:
    """Extreme-value (Gumbel) fit on weekly block maxima of the
    daily event count, method of moments (β = s√6/π, μ = m − γβ),
    with the 52-week return level — the peak-day capacity number a
    once-a-year provisioning policy should hold — and the
    probability a random week beats the worst week seen so far.
    Complements the POT/mean-excess tail machinery with the
    block-maxima branch of EVT. Weeks are absolute epoch-day/7
    blocks (no calendar library has to agree across engines); block
    maxima reduce as exact integers, so only the final closed-form
    floats are shared expressions."""
    def prep(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch["ts"], pa.int64()),
                        86400000000)
        return pa.table({"day": day})

    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["day"], {"y": ("day", "size")}).to_pandas()
    d["wk"] = d["day"].to_numpy(np.int64) // 7
    w = d.groupby("wk")["y"].max()
    import math
    k = len(w)
    s1 = int(w.sum())
    s2 = sum(int(v) * int(v) for v in w)
    obs_max = int(w.max())
    mean = float(s1) / k
    sd = math.sqrt(float(k * s2 - s1 * s1) / (k * (k - 1.0)))
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weeks": np.array([k], np.int64),
        "obs_max": np.array([obs_max], np.int64),
        "mean_weekly_max": [float(rha(mean, 6))],
        "sd_weekly_max": [float(rha(sd, 6))],
        "gumbel_mu": [float(rha(mu, 6))],
        "gumbel_beta": [float(rha(beta, 6))],
        "ret_level_52w": [float(rha(
            mu - beta * math.log(-math.log(1.0 - 1.0 / 52)), 6))],
        "p_week_exceeds_obs_max": [float(rha(
            1.0 - math.exp(-math.exp(-(obs_max - mu) / beta)), 6))]})


@register("ljung_box_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
x0 AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT) AS t,
              CAST(COUNT(*) OVER () AS BIGINT) AS n,
              CAST(SUM(y) OVER () AS BIGINT) AS s FROM d),
x AS (SELECT t, n, n * y - s AS e FROM x0),
den AS (SELECT CAST(SUM(CAST(e AS HUGEINT) * e) AS HUGEINT) AS d0,
               MIN(n) AS n FROM x),
ks AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k),
num AS (SELECT ks.k,
               CAST(SUM(CAST(a.e AS HUGEINT) * b.e) AS HUGEINT) AS nk
        FROM ks JOIN x a ON TRUE JOIN x b ON b.t = a.t - ks.k
        GROUP BY ks.k),
q AS (SELECT SUM((CAST(nk AS DOUBLE) / d0.d0)
                 * (CAST(nk AS DOUBLE) / d0.d0)
                 / (d0.n - k)) AS srho,
             MIN(d0.n) AS n
      FROM num, den d0)
SELECT n AS n_days,
       ROUND(n * (n + 2.0) * srho, 6) AS lb_q,
       CAST(7 AS BIGINT) AS df,
       CAST(CASE WHEN n * (n + 2.0) * srho > 14.067140
                 THEN 1 ELSE 0 END AS BIGINT)
           AS white_noise_rejected
FROM q""")
def ljung_box_daily(sf_dir: str) -> pd.DataFrame:
    """Ljung–Box portmanteau test (m = 7 lags, one week) on the
    daily event counts: Q = n(n+2)Σρ̂ₖ²/(n−k) against the χ²₇ 5%
    critical value 14.067140 — the single-number verdict on whether
    the daily series is white noise that the per-lag ACF/PACF tables
    leave to eyeballing, and the standard pre-flight before trusting
    iid-based control limits. The trick for cross-engine exactness:
    scale deviations to integers (eₜ = n·yₜ − Σy), so every lag's
    autocovariance numerator and the denominator are EXACT integer
    aggregates; only the ≤7-term ρ² sum is float."""
    y = _daily_counts(sf_dir)
    n = len(y)
    s = int(y.sum())
    e = [int(v) * n - s for v in y]
    d0 = sum(v * v for v in e)
    srho = 0.0
    for k in range(1, 8):
        nk = sum(e[i] * e[i - k] for i in range(k, n))
        srho += (float(nk) / d0) * (float(nk) / d0) / (n - k)
    q = n * (n + 2.0) * srho
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "lb_q": [float(rha(q, 6))],
        "df": np.array([7], np.int64),
        "white_noise_rejected": np.array(
            [1 if q > 14.067140 else 0], np.int64)})


def _part_month_demand(sf_dir: str) -> rd.Dataset:
    """(l_partkey, month, integer centi-quantity) reduce — the shared
    demand grid of the inventory-classification queries. Only
    part×month partials shuffle (catalog × calendar bounded)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "m": df["l_shipdate"].dt.strftime("%Y-%m"),
            "q": np.rint(df["l_quantity"].to_numpy(np.float64) * 100)
            .astype(np.int64)}).groupby(["pk", "m"],
                                        as_index=False).sum()

    return reduce_sink(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate",
                                 "l_quantity"])
        .map_batches(prep, batch_format="pandas"),
        ["pk", "m"], {"q": ("q", "sum")})


@register("xyz_demand_classes", sql="""
WITH q AS (SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m') AS m,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
           FROM lineitem),
mm AS (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS nm FROM q),
pm AS (SELECT pk, m, CAST(SUM(qc) AS BIGINT) AS q FROM q GROUP BY 1, 2),
ps AS (SELECT pk, CAST(SUM(q) AS BIGINT) AS s1,
              CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS s2
       FROM pm GROUP BY 1),
cv AS (SELECT pk,
              sqrt(CAST(nm * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                   / (nm * (nm - 1.0)))
              / (CAST(s1 AS DOUBLE) / nm) AS cov
       FROM ps, mm),
cl AS (SELECT CASE WHEN cov < 0.5 THEN 'X'
                   WHEN cov < 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class,
              cov
       FROM cv)
SELECT xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(cov) / COUNT(*), 6) AS avg_cov
FROM cl GROUP BY 1 ORDER BY 1""")
def xyz_demand_classes(sf_dir: str) -> pd.DataFrame:
    """XYZ demand-variability classification of the part catalog —
    the planning-side complement to the revenue-side ABC already in
    the registry: coefficient of variation of each part's monthly
    demand over the FULL observed calendar (zero-demand months count
    as zeros, which is the whole point — they are what makes demand
    hard to plan), bucketed at the textbook 0.5/1.0 thresholds. X
    parts can run on simple reorder points, Z parts need safety
    stock or make-to-order. The zero-filled variance collapses to
    (M·Σq² − S1²)/(M(M−1)) over nonzero month partials only, so the
    demand grid never materializes: integer part×month partials in,
    three rows out."""
    pm = _part_month_demand(sf_dir)
    months = reduce_sink(pm, ["m"], {"c": ("m", "size")}).to_pandas()
    nm = len(months)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q"].to_numpy(np.int64)
        return pd.DataFrame({"pk": df["pk"].to_numpy(np.int64),
                             "s1": q, "s2": q * q}) \
            .groupby("pk", as_index=False).sum()

    ps = reduce_sink(
        pm.map_batches(stats, batch_format="pandas"),
        ["pk"], {"s1": ("s1", "sum"), "s2": ("s2", "sum")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        s1 = df["s1"].to_numpy(np.float64)
        s2 = df["s2"].to_numpy(np.float64)
        var = (nm * s2 - s1 * s1) / (nm * (nm - 1.0))
        cov = np.sqrt(var) / (s1 / nm)
        cls = np.where(cov < 0.5, "X", np.where(cov < 1.0, "Y", "Z"))
        return pd.DataFrame({"xyz_class": cls, "one": 1,
                             "cov": cov}) \
            .groupby("xyz_class", as_index=False).sum()

    out = reduce_sink(
        ps.map_batches(classify, batch_format="pandas"),
        ["xyz_class"], {"n_parts": ("one", "sum"),
                        "cov": ("cov", "sum")}).to_pandas() \
        .sort_values("xyz_class", ignore_index=True)
    rha = textstats.round_half_away
    out["avg_cov"] = [float(rha(s / n, 6))
                      for s, n in zip(out["cov"], out["n_parts"])]
    return out[["xyz_class", "n_parts", "avg_cov"]] \
        .astype({"n_parts": np.int64})


@register("syntetos_boylan_quadrants", sql="""
WITH q AS (SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m') AS m,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
           FROM lineitem),
mm AS (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS nm FROM q),
pm AS (SELECT pk, m, CAST(SUM(qc) AS BIGINT) AS q FROM q GROUP BY 1, 2),
ps AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_nz,
              CAST(SUM(q) AS BIGINT) AS s1,
              CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS s2
       FROM pm GROUP BY 1),
k AS (SELECT pk,
             CAST(nm AS DOUBLE) / n_nz AS adi,
             CASE WHEN n_nz < 2 THEN 0.0
                  ELSE (CAST(n_nz * s2 - CAST(s1 AS HUGEINT) * s1
                             AS DOUBLE) / (n_nz * (n_nz - 1.0)))
                       / ((CAST(s1 AS DOUBLE) / n_nz)
                          * (CAST(s1 AS DOUBLE) / n_nz))
             END AS cv2
      FROM ps, mm),
cl AS (SELECT CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
                   WHEN adi < 1.32 THEN 'erratic'
                   WHEN cv2 < 0.49 THEN 'intermittent'
                   ELSE 'lumpy' END AS quadrant, adi, cv2
       FROM k)
SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(adi) / COUNT(*), 6) AS avg_adi,
       ROUND(SUM(cv2) / COUNT(*), 6) AS avg_cv2
FROM cl GROUP BY 1 ORDER BY 1""")
def syntetos_boylan_quadrants(sf_dir: str) -> pd.DataFrame:
    """Syntetos–Boylan forecastability quadrants for the part
    catalog: average inter-demand interval (ADI = months / months
    WITH demand) against CV² of the nonzero monthly demand sizes,
    cut at the published 1.32 / 0.49 boundaries — smooth parts suit
    exponential smoothing, intermittent/lumpy parts need Croston-
    class methods, and a catalog that skews lumpy means the naive
    monthly forecast the revenue dashboards imply is structurally
    wrong. Unlike XYZ (which zero-fills), this intentionally
    separates the two failure modes: demand ARRIVING rarely (ADI)
    vs demand SIZE jumping around (CV²). Same part×month integer
    partials; single-nonzero-month parts get CV² = 0 by the n<2
    guard on both engines."""
    pm = _part_month_demand(sf_dir)
    months = reduce_sink(pm, ["m"], {"c": ("m", "size")}).to_pandas()
    nm = len(months)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q"].to_numpy(np.int64)
        return pd.DataFrame({"pk": df["pk"].to_numpy(np.int64),
                             "one": 1, "s1": q,
                             "s2": q * q}) \
            .groupby("pk", as_index=False).sum()

    ps = reduce_sink(
        pm.map_batches(stats, batch_format="pandas"),
        ["pk"], {"n_nz": ("one", "sum"), "s1": ("s1", "sum"),
                 "s2": ("s2", "sum")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        n_nz = df["n_nz"].to_numpy(np.int64)
        s1 = df["s1"].to_numpy(np.float64)
        s2 = df["s2"].to_numpy(np.float64)
        adi = float(nm) / n_nz
        mean = s1 / n_nz
        with np.errstate(divide="ignore", invalid="ignore"):
            cv2 = np.where(
                n_nz < 2, 0.0,
                ((n_nz * s2 - s1 * s1)
                 / (n_nz * (n_nz - 1.0))) / (mean * mean))
        quad = np.where(
            (adi < 1.32) & (cv2 < 0.49), "smooth",
            np.where(adi < 1.32, "erratic",
                     np.where(cv2 < 0.49, "intermittent", "lumpy")))
        return pd.DataFrame({"quadrant": quad, "one": 1,
                             "adi": adi, "cv2": cv2}) \
            .groupby("quadrant", as_index=False).sum()

    out = reduce_sink(
        ps.map_batches(classify, batch_format="pandas"),
        ["quadrant"], {"n_parts": ("one", "sum"),
                       "adi": ("adi", "sum"),
                       "cv2": ("cv2", "sum")}).to_pandas() \
        .sort_values("quadrant", ignore_index=True)
    rha = textstats.round_half_away
    out["avg_adi"] = [float(rha(s / n, 6))
                      for s, n in zip(out["adi"], out["n_parts"])]
    out["avg_cv2"] = [float(rha(s / n, 6))
                      for s, n in zip(out["cv2"], out["n_parts"])]
    return out[["quadrant", "n_parts", "avg_adi", "avg_cv2"]] \
        .astype({"n_parts": np.int64})


def _user_value_cents(sf_dir: str) -> pd.DataFrame:
    """Per-user total value in exact integer cents, sorted by
    (cents DESC, user_id) — the shared input of the inequality-index
    queries. User-bounded rows; only (user, partial-cents) shuffle."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "c": np.rint(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)}).groupby("user_id",
                                        as_index=False).sum()

    return reduce_sink(
        _events(sf_dir, ["user_id", "value"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values(["c", "user_id"], ascending=[False, True],
                     ignore_index=True)


@register("palma_ratio_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
r AS (SELECT c,
             CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id)
                  AS BIGINT) AS rt,
             CAST(ROW_NUMBER() OVER (ORDER BY c ASC, user_id DESC)
                  AS BIGINT) AS rb,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM u),
s AS (SELECT MIN(n) AS n_users,
             CAST(SUM(CASE WHEN rt * 10 <= n THEN c ELSE 0 END)
                  AS BIGINT) AS top10,
             CAST(SUM(CASE WHEN rb * 10 <= n * 4 THEN c ELSE 0 END)
                  AS BIGINT) AS bottom40,
             CAST(SUM(c) AS BIGINT) AS total
      FROM r)
SELECT n_users, top10 AS top10_cents, bottom40 AS bottom40_cents,
       ROUND(CAST(top10 AS DOUBLE) / bottom40, 6) AS palma_ratio,
       ROUND(CAST(top10 AS DOUBLE) / total, 6) AS top10_share
FROM s""")
def palma_ratio_user_value(sf_dir: str) -> pd.DataFrame:
    """Palma ratio of user monetary value: total value held by the
    top 10% of users divided by the bottom 40% — the inequality
    number practitioners quote when Gini feels too abstract, because
    it names WHO the revenue concentration lives with (Palma's
    observation: the middle 50% share is stable, all the action is
    in the tails). Joins the registry's Gini/Theil/Atkinson family
    with the tail-ratio view. Decile membership is integer rank
    arithmetic (r·10 ≤ n) with the (value, user_id) tie rule
    mirrored on both engines, so the cut is exact; cents sum as
    integers and only the final two divisions are float."""
    u = _user_value_cents(sf_dir)
    n = len(u)
    c = u["c"].to_numpy(np.int64)
    rt = np.arange(1, n + 1)
    top10 = int(c[rt * 10 <= n].sum())
    # ascending rank with DESC user_id ties == reverse of the
    # (c DESC, user_id ASC) order
    rb = np.arange(n, 0, -1)
    bottom40 = int(c[rb * 10 <= n * 4].sum())
    total = int(c.sum())
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "top10_cents": np.array([top10], np.int64),
        "bottom40_cents": np.array([bottom40], np.int64),
        "palma_ratio": [float(rha(float(top10) / bottom40, 6))],
        "top10_share": [float(rha(float(top10) / total, 6))]})


@register("hoover_index_user_value", sql="""
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s FROM u),
d AS (SELECT CAST(SUM(ABS(CAST(n * c - s AS HUGEINT))) AS HUGEINT)
                 AS sad,
             MIN(n) AS n, MIN(s) AS s
      FROM u, t)
SELECT n AS n_users,
       ROUND(CAST(sad AS DOUBLE) / (2.0 * n * s), 6)
           AS hoover_index
FROM d""")
def hoover_index_user_value(sf_dir: str) -> pd.DataFrame:
    """Hoover (Robin Hood) index of user value: the share of total
    revenue that would have to move from above-average users to
    below-average users to equalize everyone — the most operational
    of the inequality indices (it is literally the rebalancing
    volume), and the maximum vertical gap of the Lorenz curve the
    registry already draws. The classic float trap (deviations from
    a fractional mean) is eliminated by scaling: Σ|n·cᵤ − S| is an
    exact integer, and H = that / (2nS) is one shared division."""
    u = _user_value_cents(sf_dir)
    n = len(u)
    s = int(u["c"].sum())
    sad = sum(abs(n * int(v) - s) for v in u["c"])
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "hoover_index": [float(rha(float(sad) / (2.0 * n * s), 6))]})


@register("order_structuring_screen", sql="""
WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders
           WHERE o_totalprice < 300000.0),
g AS (SELECT ck, d, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(c) AS BIGINT) AS day_cents
      FROM o GROUP BY 1, 2
      HAVING COUNT(*) >= 2 AND SUM(c) >= 30000000)
SELECT CAST(COUNT(*) AS BIGINT) AS flagged_groups,
       CAST(COUNT(DISTINCT ck) AS BIGINT) AS flagged_customers,
       CAST(SUM(n_orders) AS BIGINT) AS orders_involved,
       CAST(SUM(day_cents) AS BIGINT) AS cents_involved,
       CAST(MAX(n_orders) AS BIGINT) AS max_orders_one_day
FROM g""")
def order_structuring_screen(sf_dir: str) -> pd.DataFrame:
    """Structuring (split-order) screen — the approval-evasion
    red flag the duplicate-payment screen cannot see: a customer
    placing TWO OR MORE same-day orders, each individually under
    the $300k approval threshold, whose same-day total crosses it.
    Classic AP control: one $450k purchase needs sign-off, three
    $150k orders sail through. The threshold predicate pushes into
    the scan, per-(customer, day) integer-cent partials reduce, and
    the HAVING collapses to five audit scalars — nothing but
    flagged-group rows ever reaches the driver."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ck": df["o_custkey"].to_numpy(np.int64),
            "d": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
            "one": np.int64(1),
            "c": np.rint(df["o_totalprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)}) \
            .groupby(["ck", "d"], as_index=False).sum()

    import pyarrow.dataset as pads
    g = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"],
                        filter=pads.field("o_totalprice") < 300000.0)
        .map_batches(prep, batch_format="pandas"),
        ["ck", "d"], {"n_orders": ("one", "sum"),
                      "day_cents": ("c", "sum")}).to_pandas()
    f = g[(g["n_orders"] >= 2) & (g["day_cents"] >= 30000000)]
    return pd.DataFrame({
        "flagged_groups": np.array([len(f)], np.int64),
        "flagged_customers": np.array(
            [f["ck"].nunique()], np.int64),
        "orders_involved": np.array(
            [int(f["n_orders"].sum())], np.int64),
        "cents_involved": np.array(
            [int(f["day_cents"].sum())], np.int64),
        "max_orders_one_day": np.array(
            [int(f["n_orders"].max()) if len(f) else 0], np.int64)})


@register("threshold_bunching_orders", sql="""
WITH t AS (SELECT unnest([10000000, 20000000, 30000000,
                          40000000]) AS thr),
o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders),
b AS (SELECT t.thr,
             CAST(SUM(CASE WHEN c >= thr - 500000 AND c < thr
                           THEN 1 ELSE 0 END) AS BIGINT) AS below,
             CAST(SUM(CASE WHEN c >= thr AND c < thr + 500000
                           THEN 1 ELSE 0 END) AS BIGINT) AS above
      FROM t JOIN o ON TRUE GROUP BY t.thr)
SELECT thr AS threshold_cents, below, above,
       CASE WHEN above = 0 THEN 0.0
            ELSE ROUND(CAST(below AS DOUBLE) / above, 6)
       END AS bunching_ratio
FROM b ORDER BY thr""")
def threshold_bunching_orders(sf_dir: str) -> pd.DataFrame:
    """Bunching estimator at round approval thresholds ($100k …
    $400k): order mass in the $5k window just BELOW each threshold
    vs just ABOVE it. Under an honest price process the ratio sits
    near 1; a spike below a limit is the public-finance bunching
    signature (Saez/Kleven) of people pricing to stay under an
    authority cutoff — the population-level counterpart to the
    per-group structuring screen. One scan, four vectorized window
    counts per batch, exact integers to the final ratio."""
    thrs = np.array([10000000, 20000000, 30000000, 40000000],
                    np.int64)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(np.float64)
                    * 100).astype(np.int64)
        rows = []
        for t in thrs:
            rows.append((int(t),
                         int(((c >= t - 500000) & (c < t)).sum()),
                         int(((c >= t) & (c < t + 500000)).sum())))
        return pd.DataFrame(rows, columns=["thr", "below", "above"])

    b = reduce_sink(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["thr"], {"below": ("below", "sum"),
                  "above": ("above", "sum")}).to_pandas() \
        .sort_values("thr", ignore_index=True)
    rha = textstats.round_half_away
    b["bunching_ratio"] = [
        0.0 if a == 0 else float(rha(float(bl) / a, 6))
        for bl, a in zip(b["below"], b["above"])]
    return b.rename(columns={"thr": "threshold_cents"}) \
        .astype({"threshold_cents": np.int64, "below": np.int64,
                 "above": np.int64})


@register("burrows_delta_nearest_source", sql=r"""
WITH w AS (SELECT source,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS sc
        FROM c GROUP BY 1),
tk AS (SELECT word FROM (SELECT word, SUM(cnt) AS wc FROM c
                         GROUP BY 1 ORDER BY wc DESC, word
                         LIMIT 30)),
grid AS (SELECT t.source, k.word,
                COALESCE(c.cnt, 0) * 1.0 / t.sc AS rf
         FROM tot t CROSS JOIN tk k
         LEFT JOIN c ON c.source = t.source AND c.word = k.word),
zs AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS k,
              SUM(rf) AS s1, SUM(rf * rf) AS s2
       FROM grid GROUP BY 1),
z AS (SELECT g.source, g.word,
             (g.rf - zs.s1 / zs.k)
             / sqrt((zs.s2 - zs.s1 * zs.s1 / zs.k) / (zs.k - 1))
                 AS zv
      FROM grid g JOIN zs ON g.word = zs.word),
d AS (SELECT a.source AS src, b.source AS other,
             SUM(ABS(a.zv - b.zv)) / CAST(COUNT(*) AS BIGINT)
                 AS delta
      FROM z a JOIN z b ON a.word = b.word
                        AND a.source <> b.source
      GROUP BY 1, 2),
nn AS (SELECT src, other, delta,
              ROW_NUMBER() OVER (PARTITION BY src
                                 ORDER BY delta, other) AS rn
       FROM d)
SELECT src AS source, other AS nearest_source,
       ROUND(delta, 6) AS burrows_delta
FROM nn WHERE rn = 1 ORDER BY src""")
def burrows_delta_nearest_source(sf_dir: str) -> pd.DataFrame:
    """Burrows' Delta stylometric nearest neighbour for every
    source: z-score the top-30 word relative frequencies across
    sources, Delta(i,j) = mean |zᵢ − zⱼ|, report each source's
    closest stylistic sibling — the attribution workhorse of
    computational stylometry (Burrows 2002), and operationally the
    detector for two 'different' feeds that are really the same
    producer behind two labels (candidates for cross-source dedup).
    The corpus-wide word counting is the distributed part (one
    (source, word) reduce, vocabulary-bounded); the z/Delta algebra
    runs on a sources×30 grid with the shared explicit-sums std
    formula so both engines evaluate identical expressions."""
    c = _word_counts(sf_dir, ["source"]).to_pandas()
    tot = c.groupby("source")["cnt"].sum()
    wc = c.groupby("word")["cnt"].sum().reset_index() \
        .sort_values(["cnt", "word"], ascending=[False, True],
                     ignore_index=True)
    top = wc["word"].head(30).tolist()
    sources = sorted(tot.index)
    piv = c[c["word"].isin(top)].pivot_table(
        index="source", columns="word", values="cnt",
        aggfunc="sum", fill_value=0) \
        .reindex(index=sources, columns=top, fill_value=0)
    rf = piv.to_numpy(np.float64) \
        / tot.reindex(sources).to_numpy(np.float64)[:, None]
    k = len(sources)
    s1 = rf.sum(axis=0)
    s2 = (rf * rf).sum(axis=0)
    sd = np.sqrt((s2 - s1 * s1 / k) / (k - 1))
    z = (rf - s1 / k) / sd
    rha = textstats.round_half_away
    rows = []
    for i, s in enumerate(sources):
        best, bd = None, None
        for j, o in enumerate(sources):
            if o == s:
                continue
            dj = float(np.abs(z[i] - z[j]).sum()
                       / z.shape[1])
            if bd is None or dj < bd or (dj == bd and o < best):
                best, bd = o, dj
        rows.append((s, best, float(rha(bd, 6))))
    return pd.DataFrame(rows, columns=[
        "source", "nearest_source", "burrows_delta"])


@register("kilgarriff_cbdf_by_source", sql=r"""
WITH w AS (SELECT source,
                  unnest(regexp_extract_all(text, '\S+')) AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w GROUP BY 1, 2),
m AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS wc FROM c GROUP BY 1),
t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS sc FROM c GROUP BY 1),
g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
grid AS (SELECT t.source, m.word, t.sc, m.wc, g.n,
                COALESCE(c.cnt, 0) AS o1
         FROM t CROSS JOIN m CROSS JOIN g
         LEFT JOIN c ON c.source = t.source AND c.word = m.word),
x AS (SELECT source, MIN(sc) AS sc,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             SUM((o1 - CAST(wc AS DOUBLE) * sc / n)
                 * (o1 - CAST(wc AS DOUBLE) * sc / n)
                 / (CAST(wc AS DOUBLE) * sc / n)
                 + ((wc - o1) - CAST(wc AS DOUBLE) * (n - sc) / n)
                   * ((wc - o1) - CAST(wc AS DOUBLE) * (n - sc) / n)
                   / (CAST(wc AS DOUBLE) * (n - sc) / n)) AS chi2
      FROM grid GROUP BY source)
SELECT source, sc AS n_tokens, n_words,
       ROUND(chi2, 6) AS chi2,
       ROUND(chi2 / (n_words - 1), 6) AS chi2_per_dof
FROM x ORDER BY source""")
def kilgarriff_cbdf_by_source(sf_dir: str) -> pd.DataFrame:
    """Kilgarriff's chi-by-degrees-of-freedom corpus-homogeneity
    measure: each source vs the rest of the corpus as a 2×V word
    contingency, χ²/dof ≈ 1 meaning the source is statistically the
    same language mix as everything else, large values flagging the
    outlier feeds whose distribution shift will distort training
    mixes (the comparing-corpora standard from Kilgarriff 2001).
    All observed/expected cells derive from the integer marginals of
    ONE (source, word) reduce; the per-source χ² sums over a
    vocabulary-bounded grid with every float expression shared
    verbatim between engines."""
    c = _word_counts(sf_dir, ["source"]).to_pandas()
    piv = c.pivot_table(index="source", columns="word",
                        values="cnt", aggfunc="sum", fill_value=0)
    piv = piv.sort_index()
    o1 = piv.to_numpy(np.int64)
    wc = o1.sum(axis=0)
    sc = o1.sum(axis=1)
    n = int(o1.sum())
    rha = textstats.round_half_away
    rows = []
    for i, s in enumerate(piv.index):
        e1 = wc.astype(np.float64) * int(sc[i]) / n
        e2 = wc.astype(np.float64) * (n - int(sc[i])) / n
        o2 = wc - o1[i]
        chi2 = float((((o1[i] - e1) * (o1[i] - e1)) / e1
                      + ((o2 - e2) * (o2 - e2)) / e2).sum())
        nw = o1.shape[1]
        rows.append((s, int(sc[i]), nw, float(rha(chi2, 6)),
                     float(rha(chi2 / (nw - 1), 6))))
    out = pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_words", "chi2", "chi2_per_dof"])
    return out.astype({"n_tokens": np.int64, "n_words": np.int64})


@register("siegel_repeated_median_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
x AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY dt) - 1 AS BIGINT)
                    AS t FROM d),
sl AS (SELECT a.t,
              MEDIAN((b.y - a.y) / CAST(b.t - a.t AS DOUBLE)) AS mi
       FROM x a JOIN x b ON a.t <> b.t GROUP BY a.t),
s AS (SELECT MEDIAN(mi) AS slope FROM sl),
ic AS (SELECT MEDIAN(x.y - s.slope * x.t) AS icpt,
              MIN(s.slope) AS slope,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM x, s)
SELECT n AS n_days,
       ROUND(slope, 6) AS siegel_slope,
       ROUND(icpt, 6) AS siegel_intercept
FROM ic""")
def siegel_repeated_median_daily(sf_dir: str) -> pd.DataFrame:
    """Siegel repeated-median trend of the daily event counts: for
    each day take the MEDIAN pairwise slope to every other day, then
    the median of those medians — 50% breakdown point versus
    Theil–Sen's 29%, i.e. the trend estimate that survives even when
    HALF the days are outage- or bot-corrupted (exactly the series a
    telemetry pipeline sees), with the repeated-median intercept.
    The daily series is calendar-bounded so the O(n²) pairwise grid
    is trivially small; slopes are integer-ratio floats and both
    engines share the interpolated even-count median convention."""
    y = _daily_counts(sf_dir)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    yf = y.astype(np.float64)
    mis = np.empty(n)
    for i in range(n):
        dy = yf - yf[i]
        dt = t - t[i]
        mis[i] = float(np.median(
            (dy[dt != 0]) / dt[dt != 0]))
    slope = float(np.median(mis))
    icpt = float(np.median(yf - slope * t))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "siegel_slope": [float(rha(slope, 6))],
        "siegel_intercept": [float(rha(icpt, 6))]})


@register("variance_ratio_daily", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
x AS (SELECT y,
             y - LAG(y, 1) OVER (ORDER BY dt) AS d1,
             y - LAG(y, 2) OVER (ORDER BY dt) AS d2,
             y - LAG(y, 5) OVER (ORDER BY dt) AS d5
      FROM d),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(d1) AS BIGINT) AS m1,
             CAST(SUM(d1) AS BIGINT) AS s1,
             CAST(SUM(CAST(d1 AS HUGEINT) * d1) AS HUGEINT) AS q1,
             CAST(COUNT(d2) AS BIGINT) AS m2,
             CAST(SUM(d2) AS BIGINT) AS s2,
             CAST(SUM(CAST(d2 AS HUGEINT) * d2) AS HUGEINT) AS q2,
             CAST(COUNT(d5) AS BIGINT) AS m5,
             CAST(SUM(d5) AS BIGINT) AS s5,
             CAST(SUM(CAST(d5 AS HUGEINT) * d5) AS HUGEINT) AS q5
      FROM x),
v AS (SELECT n,
             CAST(m1 * q1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / (m1 * (m1 - 1.0)) AS v1,
             CAST(m2 * q2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
                 / (m2 * (m2 - 1.0)) AS v2,
             CAST(m5 * q5 - CAST(s5 AS HUGEINT) * s5 AS DOUBLE)
                 / (m5 * (m5 - 1.0)) AS v5
      FROM s)
SELECT n AS n_days,
       ROUND(v2 / 2.0 / v1, 6) AS vr_q2,
       ROUND(v5 / 5.0 / v1, 6) AS vr_q5,
       ROUND((v5 / 5.0 / v1 - 1.0)
             * sqrt(n / (2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5))),
             6) AS z_q5
FROM v""")
def variance_ratio_daily(sf_dir: str) -> pd.DataFrame:
    """Lo–MacKinlay variance-ratio test on the daily count series:
    under a random walk the variance of q-day changes is q× the
    one-day variance, so VR(q) ≈ 1; VR < 1 means mean reversion
    (load balancing / quota clipping), VR > 1 means trending /
    momentum (viral growth, compounding incidents) — the scale-free
    companion to the Hurst exponent already in the registry, with
    the homoscedastic z statistic at q=5. Overlapping q-day
    differences are INTEGERS, so every variance comes from exact
    (count, Σd, Σd²) aggregates off one LAG pass; both engines share
    the closed-form ratio and z expressions."""
    y = _daily_counts(sf_dir)
    n = len(y)
    import math

    def var_of_diff(q: int) -> float:
        d = y[q:] - y[:-q]
        m = len(d)
        s = int(d.sum())
        qq = sum(int(v) * int(v) for v in d)
        return float(m * qq - s * s) / (m * (m - 1.0))

    v1 = var_of_diff(1)
    v2 = var_of_diff(2)
    v5 = var_of_diff(5)
    vr2 = v2 / 2.0 / v1
    vr5 = v5 / 5.0 / v1
    z5 = (vr5 - 1.0) * math.sqrt(
        n / (2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5)))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "vr_q2": [float(rha(vr2, 6))],
        "vr_q5": [float(rha(vr5, 6))],
        "z_q5": [float(rha(z5, 6))]})


@register("ad_exponential_gaps", sql="""
WITH o AS (SELECT user_id,
                  (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                  // 1000000 AS g
           FROM events),
c AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM o WHERE g >= 1 GROUP BY g),
r AS (SELECT g, cnt,
             CAST(SUM(cnt) OVER (ORDER BY g) AS BIGINT) AS b,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n,
             CAST(SUM(g * cnt) OVER () AS BIGINT) AS s
      FROM c),
t AS (SELECT MIN(n) AS n,
             MIN(CAST(s AS DOUBLE) / n) AS lam,
             SUM((CAST(b AS HUGEINT) * b
                  - CAST(b - cnt AS HUGEINT) * (b - cnt))
                 * ln(1.0 - exp(-g / (CAST(s AS DOUBLE) / n))))
                 AS t1,
             SUM((CAST(n - b + cnt AS HUGEINT) * (n - b + cnt)
                  - CAST(n - b AS HUGEINT) * (n - b))
                 * (-g / (CAST(s AS DOUBLE) / n))) AS t2
      FROM r)
SELECT n AS n_gaps,
       ROUND(lam, 6) AS lambda_mean_s,
       ROUND(-CAST(n AS DOUBLE) - (t1 + t2) / n, 6) AS ad_a2,
       CAST(CASE WHEN -CAST(n AS DOUBLE) - (t1 + t2) / n > 1.341
                 THEN 1 ELSE 0 END AS BIGINT)
           AS exponential_rejected
FROM t""")
def ad_exponential_gaps(sf_dir: str) -> pd.DataFrame:
    """Anderson–Darling goodness-of-fit of user think-time gaps to
    the exponential distribution (λ̂ = mean gap): the memoryless-
    arrival assumption underlying the 30-minute session timeout and
    every Poisson capacity model — if A² rejects (5% critical value
    1.341 for the estimated-λ case, Stephens 1974), think times are
    bursty/heavy-tailed and timeout calibration needs the empirical
    quantiles instead. The order-statistic sum collapses onto the
    (gap, count) CONTINGENCY: for a tied run at ranks a..b,
    Σ(2i−1) = b²−(a−1)², so no per-event ranking is ever
    materialized — gaps quantize per user inside hash buckets,
    only distinct-second counts shuffle, and ln(1−F) = −g/λ is
    exact algebra."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

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
        ds.map_batches(with_bucket, batch_format="pandas")
        .groupby("bucket_")
        .map_groups(gaps, batch_format="pandas"),
        ["g"], {"cnt": ("cnt", "sum")}).to_pandas() \
        .sort_values("g", ignore_index=True)
    import math
    gv = c["g"].to_numpy(np.int64)
    cnt = c["cnt"].to_numpy(np.int64)
    b = np.cumsum(cnt)
    n = int(b[-1])
    s = int((gv * cnt).sum())
    lam = float(s) / n
    t1 = 0.0
    t2 = 0.0
    for v, ct, bb in zip(gv, cnt, b):
        v, ct, bb = int(v), int(ct), int(bb)
        a = bb - ct
        t1 += (bb * bb - a * a) * math.log(
            1.0 - math.exp(-v / lam))
        t2 += ((n - a) * (n - a) - (n - bb) * (n - bb)) \
            * (-v / lam)
    a2 = -float(n) - (t1 + t2) / n
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_gaps": np.array([n], np.int64),
        "lambda_mean_s": [float(rha(lam, 6))],
        "ad_a2": [float(rha(a2, 6))],
        "exponential_rejected": np.array(
            [1 if a2 > 1.341 else 0], np.int64)})


@register("poisson_dispersion_hourly", sql="""
WITH h AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hb,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      FROM h),
x AS (SELECT n, s1,
             CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / s1 AS chi2
      FROM s)
SELECT n AS n_hour_buckets, s1 AS n_events,
       ROUND(chi2, 6) AS dispersion_chi2,
       ROUND(chi2 / (n - 1), 6) AS vmr,
       ROUND(sqrt(2.0 * chi2) - sqrt(2.0 * (n - 1) - 1.0), 6)
           AS z_normal_approx,
       CAST(CASE WHEN sqrt(2.0 * chi2)
                      - sqrt(2.0 * (n - 1) - 1.0) > 1.644854
                 THEN 1 ELSE 0 END AS BIGINT)
           AS overdispersed
FROM x""")
def poisson_dispersion_hourly(sf_dir: str) -> pd.DataFrame:
    """Poisson dispersion (index-of-dispersion) test over hourly
    arrival buckets: χ² = Σ(c−c̄)²/c̄ with the Wilson–Hilferty
    normal approximation z = √(2χ²) − √(2df−1), one-sided 5%
    verdict — the formal answer to 'can I size this system with a
    Poisson model?' that the per-type VMR tables describe but never
    test. Overdispersion (z > 1.645) certifies burst clustering and
    means capacity must be planned off the Gumbel/POT tail numbers,
    not the mean rate. Identity Σ(c−c̄)²/c̄ = (nΣc² − S²)/(nS)·n …
    evaluated as exact integers over calendar-bounded hour buckets;
    one shared float division and two shared sqrts."""
    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"hb": pc.strftime(batch["ts"],
                                           format="%Y-%m-%d %H")})

    h = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["hb"], {"c": ("hb", "size")}).to_pandas()
    import math
    c = h["c"].to_numpy(np.int64)
    n = len(c)
    s1 = int(c.sum())
    s2 = sum(int(v) * int(v) for v in c)
    chi2 = float(n * s2 - s1 * s1) / s1
    z = math.sqrt(2.0 * chi2) - math.sqrt(2.0 * (n - 1) - 1.0)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_hour_buckets": np.array([n], np.int64),
        "n_events": np.array([s1], np.int64),
        "dispersion_chi2": [float(rha(chi2, 6))],
        "vmr": [float(rha(chi2 / (n - 1), 6))],
        "z_normal_approx": [float(rha(z, 6))],
        "overdispersed": np.array(
            [1 if z > 1.644854 else 0], np.int64)})


@register("transfer_entropy_views_purchases", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(SUM(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END) AS BIGINT) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS p
           FROM events GROUP BY 1),
md AS (SELECT MEDIAN(v) AS mv, MEDIAN(p) AS mp FROM d),
b AS (SELECT dt, CASE WHEN v > md.mv THEN 1 ELSE 0 END AS x,
             CASE WHEN p > md.mp THEN 1 ELSE 0 END AS y
      FROM d, md),
l AS (SELECT x, y,
             LAG(x) OVER (ORDER BY dt) AS xp,
             LAG(y) OVER (ORDER BY dt) AS yp
      FROM b),
tr AS (SELECT x, y, xp, yp FROM l WHERE xp IS NOT NULL),
fwd AS (SELECT y AS tgt_next, yp AS tgt_prev, xp AS src_prev,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM tr GROUP BY 1, 2, 3),
fagg AS (SELECT SUM(CAST(c AS DOUBLE) * ln(
                 CAST(c AS DOUBLE)
                 * (SELECT SUM(c) FROM fwd f2
                    WHERE f2.tgt_prev = fwd.tgt_prev)
                 / ((SELECT SUM(c) FROM fwd f3
                     WHERE f3.tgt_prev = fwd.tgt_prev
                       AND f3.src_prev = fwd.src_prev)
                    * (SELECT SUM(c) FROM fwd f4
                       WHERE f4.tgt_prev = fwd.tgt_prev
                         AND f4.tgt_next = fwd.tgt_next)))
                 / ln(2.0)) / SUM(c) AS te,
                CAST(SUM(c) AS BIGINT) AS m
         FROM fwd),
bwd AS (SELECT x AS tgt_next, xp AS tgt_prev, yp AS src_prev,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM tr GROUP BY 1, 2, 3),
bagg AS (SELECT SUM(CAST(c AS DOUBLE) * ln(
                 CAST(c AS DOUBLE)
                 * (SELECT SUM(c) FROM bwd f2
                    WHERE f2.tgt_prev = bwd.tgt_prev)
                 / ((SELECT SUM(c) FROM bwd f3
                     WHERE f3.tgt_prev = bwd.tgt_prev
                       AND f3.src_prev = bwd.src_prev)
                    * (SELECT SUM(c) FROM bwd f4
                       WHERE f4.tgt_prev = bwd.tgt_prev
                         AND f4.tgt_next = bwd.tgt_next)))
                 / ln(2.0)) / SUM(c) AS te
         FROM bwd)
SELECT fagg.m AS n_transitions,
       ROUND(fagg.te, 6) AS te_views_to_purchases_bits,
       ROUND(bagg.te, 6) AS te_purchases_to_views_bits,
       ROUND(fagg.te - bagg.te, 6) AS net_flow_bits
FROM fagg, bagg""")
def transfer_entropy_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Transfer entropy between the daily view and purchase series
    (binarized at their medians, one-day memory): TE(X→Y) =
    Σ p(y',y,x)·log₂[p(y'|y,x)/p(y'|y)] — the DIRECTED,
    model-free counterpart to the linear Granger screen already in
    the registry (Schreiber 2000): a positive net flow views→
    purchases means browsing activity carries predictive information
    about tomorrow's buying beyond buying's own history, even when
    the relationship is nonlinear and a VAR would miss it. Every
    probability is a ratio of INTEGER transition counts over ≤8
    cells, so both engines evaluate log(c·N_y / (N_yx·N_y'y))
    exactly; the daily binarization shares the interpolated-median
    convention."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"]
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "v": (et == "view").astype(np.int64),
            "p": (et == "purchase").astype(np.int64)}) \
            .groupby("dt", as_index=False).sum()

    d = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"v": ("v", "sum"), "p": ("p", "sum")}).to_pandas() \
        .sort_values("dt", ignore_index=True)
    import math
    v = d["v"].to_numpy(np.int64)
    p = d["p"].to_numpy(np.int64)
    x = (v > np.median(v)).astype(np.int64)
    y = (p > np.median(p)).astype(np.int64)

    def te(src: np.ndarray, tgt: np.ndarray) -> float:
        nxt, prv, sp = tgt[1:], tgt[:-1], src[:-1]
        m = len(nxt)
        c3: dict = {}
        for a, bb, cc in zip(nxt, prv, sp):
            c3[(int(a), int(bb), int(cc))] = \
                c3.get((int(a), int(bb), int(cc)), 0) + 1
        n_y = {}
        n_yx = {}
        n_ny = {}
        for (a, bb, cc), ct in c3.items():
            n_y[bb] = n_y.get(bb, 0) + ct
            n_yx[(bb, cc)] = n_yx.get((bb, cc), 0) + ct
            n_ny[(a, bb)] = n_ny.get((a, bb), 0) + ct
        s = 0.0
        for (a, bb, cc), ct in sorted(c3.items()):
            s += float(ct) * math.log(
                float(ct) * n_y[bb]
                / (n_yx[(bb, cc)] * n_ny[(a, bb)])) / math.log(2.0)
        return s / m

    m = len(x) - 1
    fwd = te(x, y)
    bwd = te(y, x)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_transitions": np.array([m], np.int64),
        "te_views_to_purchases_bits": [float(rha(fwd, 6))],
        "te_purchases_to_views_bits": [float(rha(bwd, 6))],
        "net_flow_bits": [float(rha(fwd - bwd, 6))]})


@register("cochran_q_engagement", sql="""
WITH f AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS d,
                  MAX(CASE WHEN event_type = 'view'
                      THEN 1 ELSE 0 END) AS fv,
                  MAX(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS fc,
                  MAX(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS fp
           FROM events GROUP BY 1, 2),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(fv) AS BIGINT) AS g1,
             CAST(SUM(fc) AS BIGINT) AS g2,
             CAST(SUM(fp) AS BIGINT) AS g3,
             CAST(SUM(fv + fc + fp) AS BIGINT) AS sl,
             CAST(SUM((fv + fc + fp) * (fv + fc + fp))
                  AS BIGINT) AS sl2
      FROM f)
SELECT n_blocks, g1 AS view_days, g2 AS click_days,
       g3 AS purchase_days,
       ROUND(2.0 * ((3 * g1 - sl) * (3 * g1 - sl)
                    + (3 * g2 - sl) * (3 * g2 - sl)
                    + (3 * g3 - sl) * (3 * g3 - sl))
             / (3.0 * (3 * sl - sl2)), 6) AS cochran_q,
       CAST(CASE WHEN 2.0 * ((3 * g1 - sl) * (3 * g1 - sl)
                             + (3 * g2 - sl) * (3 * g2 - sl)
                             + (3 * g3 - sl) * (3 * g3 - sl))
                      / (3.0 * (3 * sl - sl2)) > 5.991465
                 THEN 1 ELSE 0 END AS BIGINT)
           AS parity_rejected
FROM s""")
def cochran_q_engagement(sf_dir: str) -> pd.DataFrame:
    """Cochran's Q test of engagement parity: do the same users
    reach view, click and purchase at equal rates, treating each
    user as their own matched block (the within-subjects design the
    independent per-type reach ratios ignore — 60% view vs 40%
    purchase reach means nothing until you know it's the SAME users
    flipping)? Q = (k−1)Σ(k·Gⱼ−S)² / (k(kΣLᵢ−ΣLᵢ²)) against χ²₂ —
    the fractional-mean trap removed by the k·Gⱼ−S scaling so the
    WHOLE statistic is a ratio of exact integers. Per-user binary
    reach flags reduce via max; only (n, G₁..G₃, ΣL, ΣL²) scalars
    leave the cluster."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": df["ts"].dt.strftime("%Y-%m-%d"),
            "fv": (et == "view").astype(np.int64),
            "fc": (et == "click").astype(np.int64),
            "fp": (et == "purchase").astype(np.int64)}) \
            .groupby(["user_id", "d"], as_index=False).max()

    f = reduce_sink(
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id", "d"], {"fv": ("fv", "max"), "fc": ("fc", "max"),
                           "fp": ("fp", "max")}).to_pandas()
    n = len(f)
    g1 = int(f["fv"].sum())
    g2 = int(f["fc"].sum())
    g3 = int(f["fp"].sum())
    li = (f["fv"] + f["fc"] + f["fp"]).to_numpy(np.int64)
    sl = int(li.sum())
    sl2 = int((li * li).sum())
    q = 2.0 * ((3 * g1 - sl) ** 2 + (3 * g2 - sl) ** 2
               + (3 * g3 - sl) ** 2) / (3.0 * (3 * sl - sl2))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_blocks": np.array([n], np.int64),
        "view_days": np.array([g1], np.int64),
        "click_days": np.array([g2], np.int64),
        "purchase_days": np.array([g3], np.int64),
        "cochran_q": [float(rha(q, 6))],
        "parity_rejected": np.array(
            [1 if q > 5.991465 else 0], np.int64)})


@register("logrank_first_touch_purchase", sql="""
WITH ft AS (SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events),
grp AS (SELECT user_id,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g
        FROM ft WHERE rn = 1),
u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fday,
             MAX(CAST(ts AS DATE)) AS lday,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS pday
      FROM events GROUP BY 1),
obs AS (SELECT CASE WHEN pday IS NOT NULL
                    THEN datediff('day', fday, pday)
                    ELSE datediff('day', fday, lday) END AS t,
               CASE WHEN pday IS NOT NULL THEN 1 ELSE 0 END AS ev,
               grp.g
        FROM u JOIN grp USING (user_id)),
c AS (SELECT t,
             CAST(SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT)
                 AS d1,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(g) AS BIGINT) AS e1,
             CAST(COUNT(*) AS BIGINT) AS e
      FROM obs GROUP BY t),
r AS (SELECT t, d1, d,
             SUM(e1) OVER (ORDER BY t DESC) AS n1,
             SUM(e) OVER (ORDER BY t DESC) AS n
      FROM c),
s AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             SUM((d * n1) / CAST(n AS DOUBLE)) AS e1x,
             SUM(CASE WHEN n > 1
                      THEN (CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d))
                           / (CAST(n AS DOUBLE) * n * (n - 1))
                      ELSE 0 END) AS v
      FROM r WHERE d > 0),
tot AS (SELECT CAST(SUM(g) AS BIGINT) AS n_view,
               CAST(SUM(1 - g) AS BIGINT) AS n_other,
               CAST(SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT)
                   AS deaths_view,
               CAST(SUM(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT)
                   AS deaths_other
        FROM obs)
SELECT tot.n_view, tot.n_other, tot.deaths_view, tot.deaths_other,
       ROUND(s.e1x, 6) AS e_view,
       ROUND(CASE WHEN s.v > 0
                  THEN (s.o1 - s.e1x) * (s.o1 - s.e1x) / s.v
                  ELSE 0 END, 6) AS logrank_chi2,
       CAST(CASE WHEN s.v > 0 AND (s.o1 - s.e1x) * (s.o1 - s.e1x) / s.v
                      > 3.841459
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM tot, s""")
def logrank_first_touch_purchase(sf_dir: str) -> pd.DataFrame:
    """Log-rank test: do users whose FIRST touch is a view convert to
    first purchase on a different clock than everyone else? The
    Kaplan–Meier query draws ONE survival curve; this is the
    censoring-correct two-sample comparison (Mantel–Cox) — naive
    mean-time-to-purchase comparisons are biased the moment a single
    non-converter is still being observed. At each distinct ending
    day t the 2×2 (group × died) table contributes O−E and
    hypergeometric variance; χ²₁ against 3.841. Distributed shape:
    per-user argmin/min/max reduce (first-touch rides a zero-padded
    "epoch|event_id|type" min-key so ties break exactly like the
    oracle's ROW_NUMBER), then a (t, g) contingency reduce — only the
    calendar-bounded risk grid reaches the driver."""
    sent = "9999-99-99"

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].dt.strftime("%Y-%m-%d")
        ep = (df["ts"].astype("int64") // 1000).astype(np.int64)
        key = (ep.map("{:020d}".format) + "|"
               + df["event_id"].map("{:020d}".format) + "|"
               + df["event_type"])
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "key": key, "d": d,
            "pd_": d.where(df["event_type"] == "purchase", sent)})

    u = reduce_sink(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["user_id"],
        {"fkey": ("key", "min"), "fday": ("d", "min"),
         "lday": ("d", "max"), "pday": ("pd_", "min")})

    def to_obs(df: pd.DataFrame) -> pd.DataFrame:
        g = (df["fkey"].str.split("|", n=2).str[2] == "view") \
            .astype(np.int64)
        ev = (df["pday"] != sent).astype(np.int64)
        end = df["pday"].where(ev.astype(bool), df["lday"])
        t = (pd.to_datetime(end) - pd.to_datetime(df["fday"])).dt.days \
            .astype(np.int64)
        out = pd.DataFrame({"t": t, "g": g, "ev": ev})
        return out.groupby(["t", "g"], as_index=False) \
            .agg(d=("ev", "sum"), e=("ev", "size"))

    c = reduce_sink(u.map_batches(to_obs, batch_format="pandas"),
                    ["t", "g"], {"d": ("d", "sum"), "e": ("e", "sum")}) \
        .to_pandas()
    piv = c.pivot_table(index="t", columns="g",
                        values=["d", "e"], aggfunc="sum", fill_value=0)
    for col in [("d", 0), ("d", 1), ("e", 0), ("e", 1)]:
        if col not in piv.columns:
            piv[col] = 0
    piv = piv.sort_index(ascending=False)
    d1 = piv[("d", 1)].to_numpy(np.int64)
    d = d1 + piv[("d", 0)].to_numpy(np.int64)
    n1 = piv[("e", 1)].to_numpy(np.int64).cumsum()
    n = n1 + piv[("e", 0)].to_numpy(np.int64).cumsum()
    m = d > 0
    d1, d, n1, n = d1[m], d[m], n1[m], n[m]
    o1 = int(d1.sum())
    e1x = float(((d * n1).astype(np.float64) / n).sum())
    mv = n > 1
    v = float((d[mv].astype(np.float64) * n1[mv] * (n[mv] - n1[mv])
               * (n[mv] - d[mv])
               / (n[mv].astype(np.float64) * n[mv] * (n[mv] - 1))).sum())
    chi2 = (o1 - e1x) * (o1 - e1x) / v if v > 0 else 0.0
    tot = c.groupby("g")[["d", "e"]].sum()
    nv = int(tot["e"].get(1, 0))
    no = int(tot["e"].get(0, 0))
    dv = int(tot["d"].get(1, 0))
    do = int(tot["d"].get(0, 0))
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_view": np.array([nv], np.int64),
        "n_other": np.array([no], np.int64),
        "deaths_view": np.array([dv], np.int64),
        "deaths_other": np.array([do], np.int64),
        "e_view": [float(rha(e1x, 6))],
        "logrank_chi2": [float(rha(chi2, 6))],
        "rejected": np.array([1 if v > 0 and chi2 > 3.841459 else 0],
                             np.int64)})


@register("purchase_mcf_curve", sql="""
WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fday,
                  MAX(CAST(ts AS DATE)) AS lday
           FROM events GROUP BY 1),
p AS (SELECT datediff('day', u.fday, CAST(e.ts AS DATE)) AS t,
             CAST(COUNT(*) AS BIGINT) AS purchases
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'purchase' GROUP BY 1),
spans AS (SELECT datediff('day', fday, lday) AS t,
                 CAST(COUNT(*) AS BIGINT) AS ending
          FROM u GROUP BY 1),
grid AS (SELECT t FROM p UNION SELECT t FROM spans),
g AS (SELECT grid.t, COALESCE(p.purchases, 0) AS purchases,
             COALESCE(spans.ending, 0) AS ending
      FROM grid LEFT JOIN p USING (t) LEFT JOIN spans USING (t)),
r AS (SELECT t, purchases,
             SUM(ending) OVER (ORDER BY t DESC) AS at_risk
      FROM g)
SELECT CAST(t AS BIGINT) AS day_offset,
       CAST(at_risk AS BIGINT) AS at_risk,
       CAST(purchases AS BIGINT) AS purchases,
       ROUND(SUM(purchases / CAST(at_risk AS DOUBLE))
             OVER (ORDER BY t), 6) AS mcf
FROM r ORDER BY t""")
def purchase_mcf_curve(sf_dir: str) -> pd.DataFrame:
    """Mean cumulative function for RECURRENT purchases (Nelson–Aalen
    for repeated events): expected cumulative purchases per user by
    day-offset since first seen, with each user at risk only while
    observed (first event → last event). The LTV curve answers this
    in dollars but ignores censoring entirely — users who joined late
    drag the tail down; the MCF divides each day's purchases by the
    users actually still under observation, the unbiased per-user
    purchase-intensity curve fleet-capacity models integrate.
    Distributed shape: per-(user, day) purchase partials and per-user
    span rows reduce inside user-hash buckets (offsets derive next to
    each user's min-day, never a fact-table join-back); the driver
    sees only the calendar-bounded offset grid, where at-risk is one
    reversed cumsum and the MCF one forward cumsum of exact-integer
    ratios."""
    um = reduce_sink(
        _events(sf_dir, ["ts", "user_id", "event_type"])
        .map_batches(lambda df: pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "d": df["ts"].dt.strftime("%Y-%m-%d"),
            "p": (df["event_type"] == "purchase").astype(np.int64)}),
            batch_format="pandas"),
        ["user_id", "d"], {"p": ("p", "sum")})

    def bucket_offsets(df: pd.DataFrame) -> pd.DataFrame:
        dd = pd.to_datetime(df["d"])
        fday = dd.groupby(df["user_id"]).transform("min")
        lday = dd.groupby(df["user_id"]).transform("max")
        t = (dd - fday).dt.days.astype(np.int64)
        pur = pd.DataFrame({"t": t, "purchases": df["p"].to_numpy(
            np.int64), "ending": np.int64(0)})
        pur = pur[pur["purchases"] > 0]
        span = (lday - fday).dt.days.astype(np.int64)
        sp = pd.DataFrame({"t": span, "u": df["user_id"]}) \
            .drop_duplicates(subset="u")
        ends = pd.DataFrame({"t": sp["t"],
                             "purchases": np.int64(0),
                             "ending": np.int64(1)})
        both = pd.concat([pur, ends], ignore_index=True)
        return both.groupby("t", as_index=False).sum()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from webalizer_ray.stages.aggregate import key_bucket
        df = df.copy()
        df["_h"] = key_bucket(df, ["user_id"], 64)
        return df

    g = reduce_sink(
        (um.map_batches(add_bucket, batch_format="pandas")
         .groupby("_h").map_groups(bucket_offsets,
                                   batch_format="pandas")),
        ["t"], {"purchases": ("purchases", "sum"),
                "ending": ("ending", "sum")}) \
        .to_pandas().sort_values("t", ignore_index=True)
    at_risk = g["ending"].to_numpy(np.int64)[::-1].cumsum()[::-1]
    inc = g["purchases"].to_numpy(np.float64) \
        / at_risk.astype(np.float64)
    return pd.DataFrame({
        "day_offset": g["t"].astype(np.int64),
        "at_risk": at_risk.astype(np.int64),
        "purchases": g["purchases"].astype(np.int64),
        "mcf": textstats.round_half_away(inc.cumsum(), 6)})


def _mh_band_cells(sf_dir: str) -> pd.DataFrame:
    """2×2 weekend×purchase cells per 6-hour band (4 strata): one
    pass of 16 integer partials; shares the (epoch+4)%7 ∈ {0,6}
    Sunday/Saturday test with the marginal odds-ratio query."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        band = (us % 86_400_000_000) // 21_600_000_000
        wkd = (us // 86_400_000_000 + 4) % 7
        wkd = ((wkd == 0) | (wkd == 6)).astype(np.int64)
        s = (df["event_type"] == "purchase").to_numpy() \
            .astype(np.int64)
        g = pd.DataFrame({
            "band": band,
            "a": ((wkd == 1) & (s == 1)).astype(np.int64),
            "b": ((wkd == 1) & (s == 0)).astype(np.int64),
            "c": ((wkd == 0) & (s == 1)).astype(np.int64),
            "d": ((wkd == 0) & (s == 0)).astype(np.int64)}) \
            .groupby("band", as_index=False).sum()
        for col in "abcd":
            g[col] = g[col].astype(np.int64)
        return g

    return reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["band"], {"a": ("a", "sum"), "b": ("b", "sum"),
                   "c": ("c", "sum"), "d": ("d", "sum")}) \
        .to_pandas().sort_values("band", ignore_index=True)


_MH_CELLS_SQL = """
b AS (SELECT (epoch_us(ts) % 86400000000) // 21600000000 AS band,
             CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                       IN (0, 6) THEN 1 ELSE 0 END AS wkd,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
      FROM events),
c AS (SELECT band,
             CAST(SUM(CASE WHEN wkd = 1 AND s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN wkd = 1 AND s = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bb,
             CAST(SUM(CASE WHEN wkd = 0 AND s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cc,
             CAST(SUM(CASE WHEN wkd = 0 AND s = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM b GROUP BY band)"""


@register("mh_weekend_purchase_strata", sql=f"""
WITH {_MH_CELLS_SQL}
SELECT CAST(band AS BIGINT) AS band, a, bb AS b, cc AS c, d,
       CASE WHEN bb * cc = 0 THEN 0.0
            ELSE ROUND(CAST(a AS DOUBLE) * d
                       / (CAST(bb AS DOUBLE) * cc), 6) END AS or_k
FROM c ORDER BY band""")
def mh_weekend_purchase_strata(sf_dir: str) -> pd.DataFrame:
    """Stratified 2×2 tables behind the Mantel–Haenszel analysis:
    weekend×purchase odds ratio WITHIN each 6-hour band. The marginal
    weekend OR confounds time-of-day with day-of-week (weekend traffic
    skews toward different hours); per-stratum ORs are the
    Simpson's-paradox diagnostic — if they agree with each other but
    not the marginal, the marginal is confounded. 16 integer cells is
    all that ever reaches the driver."""
    cells = _mh_band_cells(sf_dir)
    a = cells["a"].to_numpy(np.float64)
    b = cells["b"].to_numpy(np.float64)
    c = cells["c"].to_numpy(np.float64)
    d = cells["d"].to_numpy(np.float64)
    ork = np.where(b * c == 0, 0.0,
                   textstats.round_half_away(
                       np.where(b * c == 0, np.nan, a * d)
                       / np.where(b * c == 0, 1.0, b * c), 6))
    return pd.DataFrame({
        "band": cells["band"].astype(np.int64),
        "a": cells["a"].astype(np.int64),
        "b": cells["b"].astype(np.int64),
        "c": cells["c"].astype(np.int64),
        "d": cells["d"].astype(np.int64),
        "or_k": np.nan_to_num(ork)})


@register("cmh_woolf_weekend_purchase", sql=f"""
WITH {_MH_CELLS_SQL},
k AS (SELECT a, bb, cc, d, a + bb + cc + d AS n,
             a + 0.5 AS la, bb + 0.5 AS lb, cc + 0.5 AS lc,
             d + 0.5 AS ld
      FROM c),
w AS (SELECT *,
             1.0 / (1.0 / la + 1.0 / lb + 1.0 / lc + 1.0 / ld) AS wk,
             LN((la * ld) / (lb * lc)) AS lk
      FROM k),
s AS (SELECT CAST(SUM(a) AS BIGINT) AS sum_a,
             SUM(((a + bb) * (a + cc)) / CAST(n AS DOUBLE)) AS sum_e,
             SUM(CASE WHEN n > 1
                      THEN (CAST(a + bb AS DOUBLE) * (cc + d)
                            * (a + cc) * (bb + d))
                           / (CAST(n AS DOUBLE) * n * (n - 1))
                      ELSE 0 END) AS v,
             SUM((a * d) / CAST(n AS DOUBLE)) AS mh_num,
             SUM((bb * cc) / CAST(n AS DOUBLE)) AS mh_den,
             SUM(wk * lk * lk) AS wll,
             SUM(wk * lk) AS wl,
             SUM(wk) AS ws,
             CAST(COUNT(*) AS BIGINT) AS n_strata
      FROM w)
SELECT n_strata, sum_a,
       ROUND(sum_e, 6) AS expected_a,
       ROUND(CASE WHEN mh_den > 0 THEN mh_num / mh_den ELSE 0 END, 6)
           AS mh_or,
       ROUND(CASE WHEN v > 0
                  THEN (sum_a - sum_e) * (sum_a - sum_e) / v
                  ELSE 0 END, 6) AS cmh_chi2,
       CAST(CASE WHEN v > 0 AND (sum_a - sum_e) * (sum_a - sum_e) / v
                      > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
           AS cmh_rejected,
       ROUND(wll - wl * wl / ws, 6) AS woolf_chi2,
       CAST(CASE WHEN wll - wl * wl / ws > 7.814728
                 THEN 1 ELSE 0 END AS BIGINT) AS homogeneity_rejected
FROM s""")
def cmh_woolf_weekend_purchase(sf_dir: str) -> pd.DataFrame:
    """Cochran–Mantel–Haenszel pooled weekend→purchase odds ratio
    across 6-hour-band strata plus Woolf's homogeneity test — the
    complete confounding-aware readout: MH-OR is the common effect
    AFTER removing time-of-day, the CMH χ²₁ (no continuity
    correction) tests it against 1, and Woolf's χ²₃ over
    Haldane-corrected log-ORs asks whether "common" is even
    legitimate (heterogeneous strata mean report per-band ORs, not a
    pooled one). Every sum is over 4 strata of integer cells; the
    weighted-variance identity Σw·l² − (Σw·l)²/Σw keeps it one
    pass."""
    cells = _mh_band_cells(sf_dir)
    a = cells["a"].to_numpy(np.int64)
    b = cells["b"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    d = cells["d"].to_numpy(np.int64)
    n = a + b + c + d
    sum_a = int(a.sum())
    sum_e = float((((a + b) * (a + c)).astype(np.float64) / n).sum())
    mn = n > 1
    v = float(((a + b)[mn].astype(np.float64) * (c + d)[mn]
               * (a + c)[mn] * (b + d)[mn]
               / (n[mn].astype(np.float64) * n[mn] * (n[mn] - 1)))
              .sum())
    mh_num = float(((a * d).astype(np.float64) / n).sum())
    mh_den = float(((b * c).astype(np.float64) / n).sum())
    la, lb = a + 0.5, b + 0.5
    lc, ld = c + 0.5, d + 0.5
    wk = 1.0 / (1.0 / la + 1.0 / lb + 1.0 / lc + 1.0 / ld)
    lk = np.log((la * ld) / (lb * lc))
    wll = float((wk * lk * lk).sum())
    wl = float((wk * lk).sum())
    ws = float(wk.sum())
    cmh = (sum_a - sum_e) * (sum_a - sum_e) / v if v > 0 else 0.0
    woolf = wll - wl * wl / ws
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_strata": np.array([len(cells)], np.int64),
        "sum_a": np.array([sum_a], np.int64),
        "expected_a": [float(rha(sum_e, 6))],
        "mh_or": [float(rha(mh_num / mh_den if mh_den > 0 else 0.0,
                            6))],
        "cmh_chi2": [float(rha(cmh, 6))],
        "cmh_rejected": np.array(
            [1 if v > 0 and cmh > 3.841459 else 0], np.int64),
        "woolf_chi2": [float(rha(woolf, 6))],
        "homogeneity_rejected": np.array(
            [1 if woolf > 7.814728 else 0], np.int64)})


@register("chao1_richness_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(SUM(n) AS BIGINT) AS tokens,
       ROUND(COUNT(*)
             + (SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                * CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) - 1
                       AS DOUBLE))
               / (2.0 * (SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) + 1)),
             6) AS chao1,
       CAST(COUNT(*) + SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS jackknife1
FROM c GROUP BY source ORDER BY source""")
def chao1_richness_by_source(sf_dir: str) -> pd.DataFrame:
    """Chao1 (bias-corrected) and first-order jackknife estimates of
    the TRUE vocabulary size per source — how many word types the
    feed would reveal with infinite sampling, from just the
    singleton/doubleton counts (Chao 1984: unseen mass ≈ F1²/2F2).
    The observed-vocab and hapax tables say what you HAVE; these say
    what you're MISSING — a source whose chao1 is 3× its observed
    vocab is undersampled, one near 1× is exhausted (more crawl
    budget buys nothing). Rides the global (source, word, n) reduce;
    per-batch F1/F2/V partials are disjoint because each pair exists
    exactly once after the keyed combine."""
    def prof(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            vocab=("word", "size"),
            f1=("y", lambda s: int((s == 1).sum())),
            f2=("y", lambda s: int((s == 2).sum())),
            tokens=("y", "sum")).reset_index()
        for col in ["vocab", "f1", "f2", "tokens"]:
            g[col] = g[col].astype(np.int64)
        return g

    s = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(prof, batch_format="pandas"),
        ["source"], {"vocab": ("vocab", "sum"), "f1": ("f1", "sum"),
                     "f2": ("f2", "sum"),
                     "tokens": ("tokens", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    v = s["vocab"].to_numpy(np.int64)
    f1 = s["f1"].to_numpy(np.int64)
    f2 = s["f2"].to_numpy(np.int64)
    chao1 = v + (f1 * (f1 - 1).astype(np.float64)) / (2.0 * (f2 + 1))
    return pd.DataFrame({
        "source": s["source"],
        "vocab": v, "f1": f1, "f2": f2,
        "tokens": s["tokens"].astype(np.int64),
        "chao1": textstats.round_half_away(chao1, 6),
        "jackknife1": (v + f1).astype(np.int64)})


@register("brevity_law_by_source", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(LENGTH(word)) AS BIGINT) AS sx,
             SUM(LN(CAST(n AS DOUBLE))) AS sy,
             CAST(SUM(LENGTH(word) * LENGTH(word)) AS BIGINT) AS sxx,
             SUM(LN(CAST(n AS DOUBLE)) * LN(CAST(n AS DOUBLE)))
                 AS syy,
             SUM(LENGTH(word) * LN(CAST(n AS DOUBLE))) AS sxy
      FROM c GROUP BY source)
SELECT source, v AS vocab,
       ROUND(CAST(sx AS DOUBLE) / v, 6) AS mean_len,
       ROUND(CASE WHEN (v * sxx - sx * sx) * (v * syy - sy * sy) > 0
                  THEN (v * sxy - sx * sy)
                       / sqrt(CAST(v * sxx - sx * sx AS DOUBLE)
                              * (v * syy - sy * sy))
                  ELSE 0 END, 6) AS pearson_r,
       ROUND(CASE WHEN v * sxx - sx * sx > 0
                  THEN (v * sxy - sx * sy)
                       / CAST(v * sxx - sx * sx AS DOUBLE)
                  ELSE 0 END, 6) AS slope
FROM s ORDER BY source""")
def brevity_law_by_source(sf_dir: str) -> pd.DataFrame:
    """Zipf's law of abbreviation per source: frequent words should
    be SHORT (pearson_r of word length vs ln frequency over the
    vocabulary decisively negative in natural language, slope ≈ the
    information-theoretic cost per character). A source violating
    brevity — flat or positive correlation — is not natural prose:
    ID-heavy logs, codegen, or adversarial padding, which is exactly
    the text a tokenizer-budget model wants down-weighted. One
    integer/log sufficient-statistic reduce per source over the
    global (source, word, n) table; the correlation and OLS slope
    are single shared float expressions."""
    def sums(df: pd.DataFrame) -> pd.DataFrame:
        x = df["word"].str.len().to_numpy(np.int64)
        y = np.log(df["y"].to_numpy(np.float64))
        g = pd.DataFrame({"source": df["source"], "v": np.int64(1),
                          "sx": x, "sy": y, "sxx": x * x,
                          "syy": y * y, "sxy": x * y}) \
            .groupby("source", as_index=False).sum()
        for col in ["v", "sx", "sxx"]:
            g[col] = g[col].astype(np.int64)
        return g

    s = reduce_sink(
        _source_word_counts(sf_dir)
        .map_batches(sums, batch_format="pandas"),
        ["source"],
        {"v": ("v", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
         "sxx": ("sxx", "sum"), "syy": ("syy", "sum"),
         "sxy": ("sxy", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    v = s["v"].to_numpy(np.int64)
    sx = s["sx"].to_numpy(np.int64)
    sy = s["sy"].to_numpy(np.float64)
    sxx = s["sxx"].to_numpy(np.int64)
    syy = s["syy"].to_numpy(np.float64)
    sxy = s["sxy"].to_numpy(np.float64)
    dx = (v * sxx - sx * sx).astype(np.float64)
    dy = v * syy - sy * sy
    num = v * sxy - sx * sy
    r = np.where(dx * dy > 0, num / np.sqrt(np.where(
        dx * dy > 0, dx * dy, 1.0)), 0.0)
    slope = np.where(dx > 0, num / np.where(dx > 0, dx, 1.0), 0.0)
    return pd.DataFrame({
        "source": s["source"], "vocab": v,
        "mean_len": textstats.round_half_away(
            sx.astype(np.float64) / v, 6),
        "pearson_r": textstats.round_half_away(r, 6),
        "slope": textstats.round_half_away(slope, 6)})


@register("word_dispersion_top", sql=r"""
WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+'))
                      AS word
           FROM documents),
c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS y
      FROM w GROUP BY 1, 2),
tot AS (SELECT word, CAST(SUM(y) AS BIGINT) AS n FROM c GROUP BY 1),
top AS (SELECT word, n FROM tot ORDER BY n DESC, word LIMIT 20),
parts AS (SELECT source, CAST(SUM(y) AS BIGINT) AS ns
          FROM c GROUP BY 1),
big AS (SELECT CAST(SUM(ns) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM parts),
m AS (SELECT t.word, t.n, p.ns, COALESCE(c.y, 0) AS y,
             big.nn, big.k
      FROM top t CROSS JOIN parts p
      CROSS JOIN big
      LEFT JOIN c ON c.word = t.word AND c.source = p.source),
j AS (SELECT word, n,
             AVG(y / CAST(ns AS DOUBLE)) AS mu,
             SQRT(GREATEST(
                 AVG((y / CAST(ns AS DOUBLE))
                     * (y / CAST(ns AS DOUBLE)))
                 - AVG(y / CAST(ns AS DOUBLE))
                   * AVG(y / CAST(ns AS DOUBLE)), 0)) AS sd,
             SUM(ABS(ns / CAST(nn AS DOUBLE)
                     - y / CAST(n AS DOUBLE))) / 2.0 AS dp,
             MAX(k) AS k
      FROM m GROUP BY word, n)
SELECT word, n,
       ROUND(CASE WHEN mu > 0
                  THEN 1.0 - (sd / mu) / SQRT(k - 1.0)
                  ELSE 0 END, 6) AS juilland_d,
       ROUND(dp, 6) AS gries_dp
FROM j ORDER BY word""")
def word_dispersion_top(sf_dir: str) -> pd.DataFrame:
    """Corpus dispersion of the top-20 words across the 20 source
    feeds: Juilland's D (1 − CV/√(k−1) over per-part relative
    frequencies — 1 means perfectly even, 0 means one-feed-only) and
    Gries' deviation-of-proportions DP (how far the word's mass sits
    from the parts' size shares; robust to unequal part sizes where
    D is not). A 'the' with D≈1 is corpus glue; a high-frequency
    word with DP≈0.9 is one feed's boilerplate masquerading as
    common vocabulary — exactly what a training-mix dedup list
    wants. The word×part matrix is 20×k on the driver; everything
    upstream is the shared (source, word, n) reduce plus a top-N
    combine."""
    pairs = _source_word_counts(sf_dir)
    tot = reduce_sink(pairs, ["word"], {"n": ("y", "sum")})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "word"], ascending=[False, True],
                              ignore_index=True).head(20)

    # per-block top-20 partials (each word appears in exactly one
    # block after the keyed combine, so the union ⊇ the global top)
    tp = tot.map_batches(local_top, batch_format="pandas") \
        .to_pandas().sort_values(["n", "word"],
                                 ascending=[False, True],
                                 ignore_index=True).head(20)
    words = set(tp["word"])
    parts = reduce_sink(pairs, ["source"], {"ns": ("y", "sum")}) \
        .to_pandas().sort_values("source", ignore_index=True)
    sub = pairs.map_batches(
        lambda df, w=words: df[df["word"].isin(w)],
        batch_format="pandas").to_pandas()
    mat = sub.pivot_table(index="word", columns="source", values="y",
                          aggfunc="sum", fill_value=0) \
        .reindex(index=sorted(words),
                 columns=parts["source"], fill_value=0) \
        .to_numpy(np.float64)
    ns = parts["ns"].to_numpy(np.float64)
    nn = ns.sum()
    k = len(ns)
    n_w = tp.set_index("word").loc[sorted(words), "n"] \
        .to_numpy(np.float64)
    v = mat / ns
    mu = v.mean(axis=1)
    sd = np.sqrt(np.maximum((v * v).mean(axis=1) - mu * mu, 0))
    dd = np.where(mu > 0,
                  1.0 - (sd / np.where(mu > 0, mu, 1.0))
                  / np.sqrt(k - 1.0), 0.0)
    dp = np.abs(ns / nn - mat / n_w[:, None]).sum(axis=1) / 2.0
    return pd.DataFrame({
        "word": sorted(words),
        "n": n_w.astype(np.int64),
        "juilland_d": textstats.round_half_away(dd, 6),
        "gries_dp": textstats.round_half_away(dp, 6)})


@register("kuiper_hours_view_purchase", sql="""
WITH b AS (SELECT (epoch_us(ts) % 86400000000) // 1000000 AS sod,
                  event_type
           FROM events WHERE event_type IN ('view', 'purchase')),
c AS (SELECT sod,
             CAST(SUM(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END) AS BIGINT) AS nv,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS np
      FROM b GROUP BY 1),
t AS (SELECT SUM(nv) OVER (ORDER BY sod) AS cv,
             SUM(np) OVER (ORDER BY sod) AS cp,
             (SELECT SUM(nv) FROM c) AS n1,
             (SELECT SUM(np) FROM c) AS n2
      FROM c),
s AS (SELECT MAX(cv / CAST(n1 AS DOUBLE)
                 - cp / CAST(n2 AS DOUBLE)) AS dplus,
             MAX(cp / CAST(n2 AS DOUBLE)
                 - cv / CAST(n1 AS DOUBLE)) AS dminus,
             CAST(MAX(n1) AS BIGINT) AS n1,
             CAST(MAX(n2) AS BIGINT) AS n2
      FROM t),
f AS (SELECT n1, n2,
             GREATEST(dplus, 0) + GREATEST(dminus, 0) AS v,
             SQRT(n1 * CAST(n2 AS DOUBLE) / (n1 + n2)) AS sne
      FROM s)
SELECT n1 AS n_view, n2 AS n_purchase,
       ROUND(v, 6) AS kuiper_v,
       ROUND(v * (sne + 0.155 + 0.24 / sne), 6) AS kuiper_stat,
       CAST(CASE WHEN v * (sne + 0.155 + 0.24 / sne) > 1.747
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM f""")
def kuiper_hours_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kuiper test: do views and purchases follow the
    same time-of-day clock? Kuiper's V = D⁺ + D⁻ is the circular
    analog of Kolmogorov–Smirnov — equally sensitive at every phase
    (a KS run on seconds-since-midnight silently under-weights
    divergence near the arbitrary midnight cut; V is invariant to
    where the day is cut). Stephens' small-sample scaling
    V·(√Nₑ+0.155+0.24/√Nₑ) against the 1.747 (α=0.05) point. The
    empirical CDFs live on the second-of-day grid — ≤86 400 rows at
    ANY event scale, so the cumulative scan is calendar-bounded,
    never data-bounded."""
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
    cv = c["nv"].to_numpy(np.int64).cumsum()
    cp = c["np_"].to_numpy(np.int64).cumsum()
    diff = cv / float(n1) - cp / float(n2)
    v = max(float(diff.max()), 0.0) + max(float(-diff.min()), 0.0)
    sne = np.sqrt(n1 * float(n2) / (n1 + n2))
    stat = v * (sne + 0.155 + 0.24 / sne)
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_view": np.array([n1], np.int64),
        "n_purchase": np.array([n2], np.int64),
        "kuiper_v": [float(rha(v, 6))],
        "kuiper_stat": [float(rha(stat, 6))],
        "rejected": np.array([1 if stat > 1.747 else 0], np.int64)})


@register("distance_corr_views_purchases", sql="""
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
                  CAST(SUM(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
p AS (SELECT a.dt AS i, b.dt AS j,
             CAST(ABS(a.x - b.x) AS DOUBLE) AS ax,
             CAST(ABS(a.y - b.y) AS DOUBLE) AS ay
      FROM d a CROSS JOIN d b),
rm AS (SELECT i, AVG(ax) AS rax, AVG(ay) AS ray FROM p GROUP BY i),
gm AS (SELECT AVG(ax) AS gax, AVG(ay) AS gay,
              CAST(COUNT(*) AS BIGINT) AS n2
       FROM p),
c AS (SELECT (ax - ri.rax - rj.rax + gm.gax) AS ca,
             (ay - ri.ray - rj.ray + gm.gay) AS cb
      FROM p JOIN rm ri ON p.i = ri.i
             JOIN rm rj ON p.j = rj.i
      CROSS JOIN gm),
s AS (SELECT AVG(ca * cb) AS dcov2, AVG(ca * ca) AS dvx,
             AVG(cb * cb) AS dvy
      FROM c)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
       ROUND(dcov2, 6) AS dcov2,
       ROUND(dvx, 6) AS dvar_views,
       ROUND(dvy, 6) AS dvar_purchases,
       ROUND(CASE WHEN dvx * dvy > 0 AND dcov2 > 0
                  THEN SQRT(dcov2 / SQRT(dvx * dvy))
                  ELSE 0 END, 6) AS dcor
FROM s""")
def distance_corr_views_purchases(sf_dir: str) -> pd.DataFrame:
    """Székely distance correlation between the daily view and daily
    purchase series — the dependence measure that is ZERO if and
    only if the series are independent (Pearson misses every
    nonlinear/non-monotone coupling; Spearman every non-monotone
    one; dCor misses nothing with enough data). Double-centered
    pairwise-distance matrices, dCor² = dCov²/√(dVarₓ·dVar_y). The
    day grid is calendar-bounded, so the O(days²) matrices stay a
    driver-side postage stamp at any event scale — only (date, 2
    counts) partials reduce on the cluster."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dt": df["ts"].dt.strftime("%Y-%m-%d"),
            "x": (df["event_type"] == "view").astype(np.int64),
            "y": (df["event_type"] == "purchase").astype(np.int64)}) \
            .groupby("dt", as_index=False).sum()

    d = reduce_sink(
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(prep, batch_format="pandas"),
        ["dt"], {"x": ("x", "sum"), "y": ("y", "sum")}) \
        .to_pandas().sort_values("dt", ignore_index=True)
    x = d["x"].to_numpy(np.int64)
    y = d["y"].to_numpy(np.int64)
    n = len(d)
    ax = np.abs(x[:, None] - x[None, :]).astype(np.float64)
    ay = np.abs(y[:, None] - y[None, :]).astype(np.float64)
    rax = ax.mean(axis=1)
    ray_ = ay.mean(axis=1)
    ca = ax - rax[:, None] - rax[None, :] + ax.mean()
    cb = ay - ray_[:, None] - ray_[None, :] + ay.mean()
    dcov2 = float((ca * cb).mean())
    dvx = float((ca * ca).mean())
    dvy = float((cb * cb).mean())
    dcor = np.sqrt(dcov2 / np.sqrt(dvx * dvy)) \
        if dvx * dvy > 0 and dcov2 > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "dcov2": [float(rha(dcov2, 6))],
        "dvar_views": [float(rha(dvx, 6))],
        "dvar_purchases": [float(rha(dvy, 6))],
        "dcor": [float(rha(dcor, 6))]})


@register("hodges_lehmann_weekend_shift", sql="""
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
f AS (SELECT y, CASE WHEN (day + 4) % 7 IN (0, 6)
                     THEN 1 ELSE 0 END AS wkd
      FROM d),
we AS (SELECT y FROM f WHERE wkd = 1),
wd AS (SELECT y FROM f WHERE wkd = 0)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM we) AS n_weekend,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wd) AS n_weekday,
       ROUND((SELECT MEDIAN(y) FROM we), 6) AS median_weekend,
       ROUND((SELECT MEDIAN(y) FROM wd), 6) AS median_weekday,
       ROUND((SELECT MEDIAN(a.y - b.y)
              FROM we a CROSS JOIN wd b), 6) AS hl_shift""")
def hodges_lehmann_weekend_shift(sf_dir: str) -> pd.DataFrame:
    """Hodges–Lehmann estimator of the weekend traffic effect: the
    median of ALL weekend-day × weekday-day count differences — the
    location shift the Mann–Whitney test implicitly tests, with 29%
    breakdown and ~95% Gaussian efficiency. Median-of-differences ≠
    difference-of-medians: one outage Saturday drags the naive
    difference but barely moves HL. The day grid is
    calendar-bounded, so the O(days²) difference set is a
    driver-side constant; medians interpolate on even counts (the
    shared convention with DuckDB's MEDIAN)."""
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"day": us // 86_400_000_000,
                             "y": np.int64(1)}) \
            .groupby("day", as_index=False).sum()

    d = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pandas"),
        ["day"], {"y": ("y", "sum")}) \
        .to_pandas().sort_values("day", ignore_index=True)
    wkd = ((d["day"].to_numpy(np.int64) + 4) % 7)
    is_we = (wkd == 0) | (wkd == 6)
    we = d["y"].to_numpy(np.int64)[is_we]
    wd = d["y"].to_numpy(np.int64)[~is_we]
    diffs = (we[:, None] - wd[None, :]).ravel()
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_weekend": np.array([len(we)], np.int64),
        "n_weekday": np.array([len(wd)], np.int64),
        "median_weekend": [float(rha(np.median(we), 6))],
        "median_weekday": [float(rha(np.median(wd), 6))],
        "hl_shift": [float(rha(np.median(diffs), 6))]})


_DAILY_SQL = """
d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1),
x AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY dt) AS BIGINT) AS t,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d)"""


@register("sample_entropy_daily", sql=f"""
WITH {_DAILY_SQL},
st AS (SELECT MAX(n) AS n, CAST(SUM(y) AS BIGINT) AS s,
              CAST(SUM(y * y) AS HUGEINT) AS ss
       FROM x),
rr AS (SELECT n, 0.2 * SQRT(CAST(n * ss - s * s AS DOUBLE)) / n AS r
       FROM st),
v AS (SELECT t, y, LEAD(y, 1) OVER (ORDER BY t) AS y1,
             LEAD(y, 2) OVER (ORDER BY t) AS y2
      FROM x),
p AS (SELECT a.y AS ya, a.y1 AS ya1, a.y2 AS ya2,
             b.y AS yb, b.y1 AS yb1, b.y2 AS yb2, rr.r
      FROM v a JOIN v b ON a.t < b.t CROSS JOIN rr
      WHERE a.y2 IS NOT NULL AND b.y2 IS NOT NULL),
c AS (SELECT CAST(SUM(CASE WHEN ABS(ya - yb) <= r
                            AND ABS(ya1 - yb1) <= r
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN ABS(ya - yb) <= r
                            AND ABS(ya1 - yb1) <= r
                            AND ABS(ya2 - yb2) <= r
                           THEN 1 ELSE 0 END) AS BIGINT) AS a
      FROM p)
SELECT rr.n AS n_days, ROUND(rr.r, 6) AS tolerance_r,
       c.b AS m_matches, c.a AS m1_matches,
       ROUND(CASE WHEN c.a > 0 AND c.b > 0
                  THEN -LN(c.a / CAST(c.b AS DOUBLE))
                  ELSE 0 END, 6) AS sampen
FROM rr, c""")
def sample_entropy_daily(sf_dir: str) -> pd.DataFrame:
    """Sample entropy (m=2, r=0.2σ, Richman–Moorman) of the daily
    count series: −ln(A/B) where B counts template pairs matching
    for 2 consecutive days (Chebyshev ≤ r) and A those still
    matching on the 3rd. The REGULARITY verdict the ACF can't give:
    a perfectly periodic series has SampEn→0 even when its ACF looks
    rich, while white noise maxes out — low SampEn certifies the
    traffic is schedulable, high SampEn that yesterday's shape says
    nothing about tomorrow's. Self-match-free (i<j only), tolerance
    from the exact integer-sums population σ, O(days²) pairs on the
    calendar-bounded grid."""
    y = _daily_counts(sf_dir)
    n = len(y)
    s = int(y.sum())
    ss = int((y.astype(object) * y.astype(object)).sum())
    r = 0.2 * np.sqrt(float(n * ss - s * s)) / n
    yv = y[: n - 2]
    y1 = y[1: n - 1]
    y2 = y[2: n]
    m0 = (np.abs(yv[:, None] - yv[None, :]) <= r) \
        & (np.abs(y1[:, None] - y1[None, :]) <= r)
    m1 = m0 & (np.abs(y2[:, None] - y2[None, :]) <= r)
    iu = np.triu_indices(len(yv), k=1)
    b = int(m0[iu].sum())
    a = int(m1[iu].sum())
    samp = -np.log(a / float(b)) if a > 0 and b > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "tolerance_r": [float(rha(r, 6))],
        "m_matches": np.array([b], np.int64),
        "m1_matches": np.array([a], np.int64),
        "sampen": [float(rha(samp, 6))]})


@register("cox_stuart_trend_daily", sql=f"""
WITH {_DAILY_SQL},
h AS (SELECT MAX((n + 1) // 2) AS half, MAX(n) AS n FROM x),
p AS (SELECT a.y AS y0, b.y AS y1
      FROM x a JOIN h ON TRUE
      JOIN x b ON b.t = a.t + h.half
      WHERE a.t <= (SELECT n FROM h) // 2),
c AS (SELECT CAST(SUM(CASE WHEN y1 > y0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS s_plus,
             CAST(SUM(CASE WHEN y1 < y0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS s_minus
      FROM p)
SELECT (SELECT n FROM h) AS n_days, s_plus, s_minus,
       ROUND(CASE WHEN s_plus + s_minus > 0
                  THEN (2.0 * s_plus - (s_plus + s_minus))
                       / SQRT(CAST(s_plus + s_minus AS DOUBLE))
                  ELSE 0 END, 6) AS z,
       CAST(CASE WHEN s_plus + s_minus > 0
                  AND ABS((2.0 * s_plus - (s_plus + s_minus))
                          / SQRT(CAST(s_plus + s_minus AS DOUBLE)))
                      > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS trend_rejected
FROM c""")
def cox_stuart_trend_daily(sf_dir: str) -> pd.DataFrame:
    """Cox–Stuart sign test for monotone trend in daily counts: pair
    each first-half day with its second-half partner (offset
    ⌈n/2⌉, middle day dropped when odd), count sign agreements,
    binomial z against 1.96. The assumption-free sanity check on the
    parametric trend fits — it needs no linearity (vs OLS), no
    pairwise O(n²) slopes (vs Theil–Sen), survives any monotone
    transform of the counts, and ties simply drop out. Everything
    after the daily reduce is integer arithmetic on a
    calendar-bounded vector."""
    y = _daily_counts(sf_dir)
    n = len(y)
    half = (n + 1) // 2
    m = n // 2
    y0 = y[:m]
    y1 = y[half: half + m]
    sp = int((y1 > y0).sum())
    sm = int((y1 < y0).sum())
    tot = sp + sm
    z = (2.0 * sp - tot) / np.sqrt(float(tot)) if tot > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "s_plus": np.array([sp], np.int64),
        "s_minus": np.array([sm], np.int64),
        "z": [float(rha(z, 6))],
        "trend_rejected": np.array(
            [1 if tot > 0 and abs(z) > 1.959964 else 0], np.int64)})


@register("grubbs_outlier_daily", sql=f"""
WITH {_DAILY_SQL},
dd AS (SELECT dt, y FROM d),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(y) AS BIGINT) AS s,
              CAST(SUM(y * y) AS HUGEINT) AS ss
       FROM dd),
g AS (SELECT dd.dt, dd.y,
             ABS(dd.y - s / CAST(st.n AS DOUBLE)) AS dev,
             SQRT((st.n * ss - s * s)
                  / (CAST(st.n AS DOUBLE) * st.n * (st.n - 1)))
                 AS sd,
             st.n
      FROM dd CROSS JOIN st),
top AS (SELECT * FROM g ORDER BY dev DESC, dt LIMIT 1)
SELECT n AS n_days, dt AS outlier_date,
       CAST(y AS BIGINT) AS outlier_value,
       ROUND(dev, 6) AS abs_deviation,
       ROUND(sd, 6) AS sd,
       ROUND(CASE WHEN sd > 0 THEN dev / sd ELSE 0 END, 6)
           AS grubbs_g
FROM top""")
def grubbs_outlier_daily(sf_dir: str) -> pd.DataFrame:
    """Grubbs' statistic for the single most extreme day:
    G = max|y−ȳ|/s (sample s, n−1). The MAD screen lists every
    candidate; Grubbs names THE day a masking-prone z-score sweep
    would test first and calibrates how far out it sits in σ units —
    G beyond ≈3 on a quarter of dailies is the one-outage/one-launch
    signature worth a root-cause ticket. Sample sd via the explicit
    integer-sums formula √((nΣy²−(Σy)²)/(n·n·(n−1))); ties on the
    deviation break to the earliest date on both engines."""
    y = _daily_counts(sf_dir)
    n = len(y)
    s = int(y.sum())
    ss = int((y.astype(object) * y.astype(object)).sum())
    dev = np.abs(y - s / float(n))
    sd = np.sqrt((n * ss - s * s) / (float(n) * n * (n - 1)))
    i = int(np.argmax(dev))  # argmax returns FIRST max = earliest
    # recover the date for row i
    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "date", pc.strftime(batch["ts"], format="%Y-%m-%d"))
    dts = reduce_sink(
        _events(sf_dir, ["ts"]).map_batches(prep,
                                            batch_format="pyarrow"),
        ["date"], {"y": ("date", "size")}).to_pandas() \
        .sort_values("date", ignore_index=True)
    g = float(dev[i] / sd) if sd > 0 else 0.0
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "outlier_date": [dts["date"].iloc[i]],
        "outlier_value": np.array([y[i]], np.int64),
        "abs_deviation": [float(rha(dev[i], 6))],
        "sd": [float(rha(sd, 6))],
        "grubbs_g": [float(rha(g, 6))]})


@register("bartels_rank_test_daily", sql=f"""
WITH {_DAILY_SQL},
r AS (SELECT t, n,
             RANK() OVER (ORDER BY y)
             + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS rk
      FROM x),
v AS (SELECT t, n, rk, LEAD(rk) OVER (ORDER BY t) AS rk1 FROM r),
s AS (SELECT MAX(n) AS n,
             SUM(CASE WHEN rk1 IS NOT NULL
                      THEN (rk - rk1) * (rk - rk1) ELSE 0 END)
                 AS num,
             SUM((rk - (n + 1) / 2.0) * (rk - (n + 1) / 2.0)) AS den
      FROM v),
f AS (SELECT n, num / den AS rvn,
             SQRT(4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
                  / (5.0 * n * (n + 1) * (n - 1) * (n - 1))) AS se
      FROM s)
SELECT n AS n_days, ROUND(rvn, 6) AS rvn,
       ROUND((rvn - 2) / se, 6) AS z,
       CAST(CASE WHEN ABS((rvn - 2) / se) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS randomness_rejected
FROM f""")
def bartels_rank_test_daily(sf_dir: str) -> pd.DataFrame:
    """Bartels' rank von Neumann ratio test of randomness on daily
    counts: RVN = Σ(Rᵢ−Rᵢ₊₁)²/Σ(Rᵢ−R̄)² over midranks, E=2 under
    exchangeability, z via the exact Bartels variance. The
    nonparametric Durbin–Watson — it detects serial dependence the
    runs test's coarse binarization throws away, yet is immune to
    the heavy-tailed level outliers that poison the parametric DW
    (one launch-day spike is just one extreme RANK). RVN < 2 ⇒
    positively autocorrelated (momentum), > 2 ⇒ oscillating.
    Midranks are exact halves so every sum is exact in doubles on
    the calendar-bounded grid."""
    y = _daily_counts(sf_dir)
    n = len(y)
    rk = pd.Series(y).rank(method="average").to_numpy(np.float64)
    num = float(((rk[:-1] - rk[1:]) ** 2).sum())
    den = float(((rk - (n + 1) / 2.0) ** 2).sum())
    rvn = num / den
    se = np.sqrt(4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
                 / (5.0 * n * (n + 1) * (n - 1) * (n - 1)))
    z = (rvn - 2) / se
    rha = textstats.round_half_away
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "rvn": [float(rha(rvn, 6))],
        "z": [float(rha(z, 6))],
        "randomness_rejected": np.array(
            [1 if abs(z) > 1.959964 else 0], np.int64)})
