"""Hopping windows, multi-feature OLS and DSIR importance scoring:
planted-value tests (oracle parity runs in tools/check_oracle.py)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(d, ts_list, values, users=None, types=None):
    os.makedirs(d, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(ts_list, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64) if users is None
                            else np.asarray(users, np.int64)),
        "event_type": pa.array(["view"] * n if types is None else types),
        "value": pa.array(np.asarray(values, np.float64)),
        "props": pa.array(["{}"] * n)}),
        os.path.join(d, "events.parquet"))


def _write_docs(d, texts, langs):
    os.makedirs(d, exist_ok=True)
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array(np.array([len(t) for t in texts], np.int64)),
    }), os.path.join(d, "documents.parquet"))


def test_hopping_window_membership(ray_session, tmp_path):
    """One event belongs to exactly window/hop = 4 windows; two events
    one hop apart share exactly 3 of them."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T01:00:00", "us")   # exact slot edge
    d = str(tmp_path / "hop")
    _write_events(d, [t0, t0 + np.timedelta64(15, "m")], [1.0, 1.0])
    out = REGISTRY["hopping_window_stats"][0](d)
    slot0 = int(t0.astype("datetime64[us]").astype(np.int64)
                // 900_000_000)
    hits = dict(zip(out["window_slot"], out["hits"]))
    # event A covers slots slot0-3..slot0; B covers slot0-2..slot0+1
    assert sum(hits.values()) == 8
    assert hits[slot0 - 3] == 1 and hits[slot0 + 1] == 1
    for s in (slot0 - 2, slot0 - 1, slot0):
        assert hits[s] == 2


def test_hopping_window_cents_exact(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-05T12:07:00", "us")
    d = str(tmp_path / "hopc")
    _write_events(d, [t0], [12.34])
    out = REGISTRY["hopping_window_stats"][0](d)
    assert len(out) == 4
    assert (out["cents_sum"] == 1234).all()


def test_ols_recovers_planted_plane(ray_session, tmp_path):
    """value = 2 + 3*hour + 5*dow exactly -> coefficients recovered to
    the rounding guard (the moments are integer-exact)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")  # a Monday, dow=0
    ts, vals = [], []
    for day in range(7):
        for hour in range(24):
            t = t0 + np.timedelta64(day, "D") + np.timedelta64(hour, "h")
            dow = (int(t.astype("datetime64[D]").astype(np.int64)) + 4) % 7
            ts.append(t)
            vals.append(2.0 + 3.0 * hour + 5.0 * dow)
    d = str(tmp_path / "ols")
    _write_events(d, ts, vals)
    out = REGISTRY["ols_value_hour_dow"][0](d)
    assert abs(out["intercept"][0] - 2.0) < 1e-6
    assert abs(out["beta_hour"][0] - 3.0) < 1e-6
    assert abs(out["beta_dow"][0] - 5.0) < 1e-6


def test_dsir_ranks_target_like_docs_first(ray_session, tmp_path):
    """Docs written in the target slice's vocabulary outscore docs made
    of raw-only words, regardless of their own lang label."""
    from webalizer_ray.pipelines.queries import REGISTRY

    texts, langs = [], []
    for i in range(10):                    # the target domain: en docs
        texts.append("alpha beta gamma alpha beta")
        langs.append("en")
    for i in range(10):                    # raw-only background
        texts.append("zeta eta theta zeta eta")
        langs.append("de")
    # two probe docs, both labeled 'de': one target-like, one raw-like
    texts.append("alpha beta gamma")       # doc_id 20
    langs.append("de")
    texts.append("zeta eta theta")         # doc_id 21
    langs.append("de")
    d = str(tmp_path / "dsir")
    _write_docs(d, texts, langs)
    out = REGISTRY["dsir_importance_top_docs"][0](d)
    score = dict(zip(out["doc_id"], out["dsir_score"]))
    assert score[20] > score[21]
    # target-vocab docs occupy the head of the ranking
    top5 = out.head(5)["doc_id"].tolist()
    assert 21 not in top5


def test_trailing_window_boundary_and_isolation(ray_session, tmp_path):
    """RANGE frame is inclusive at exactly -1h, excludes older events,
    and never crosses users."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T06:00:00", "us")
    m = np.timedelta64(1, "m")
    # user 1: events at 0, +30min, +61min; user 2: one event at +30min
    ts = [t0, t0 + 30 * m, t0 + 61 * m, t0 + 60 * m, t0 + 30 * m]
    users = [1, 1, 1, 1, 2]
    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    d = str(tmp_path / "trail")
    _write_events(d, ts, vals, users=users)
    out = REGISTRY["user_trailing_1h_value"][0](d)
    got = dict(zip(out["event_id"], out["trailing_cents"]))
    assert got[0] == 100            # only itself
    assert got[1] == 300            # 1 + 2
    assert got[3] == 1100           # exactly 1h back: inclusive (1+2+8)
    assert got[2] == 1400           # 61 min drops event 0 (2+4+8)
    assert got[4] == 1600           # user 2 isolated


def test_naive_bayes_perfect_diagonal(ray_session, tmp_path):
    """Distinct vocabularies per language -> the confusion matrix is
    diagonal."""
    from webalizer_ray.pipelines.queries import REGISTRY

    texts, langs = [], []
    for i in range(8):
        texts.append("hund katze maus hund")
        langs.append("de")
        texts.append("dog cat mouse dog")
        langs.append("en")
    d = str(tmp_path / "nb")
    _write_docs(d, texts, langs)
    out = REGISTRY["naive_bayes_lang_confusion"][0](d)
    got = {(r.true_lang, r.pred_lang): r.n for r in out.itertuples()}
    assert got == {("de", "de"): 8, ("en", "en"): 8}


def test_logreg_recovers_planted_separation(ray_session, tmp_path):
    """Purchases planted at high values -> positive value coefficient
    and well-separated predicted probabilities."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    ts, vals, types = [], [], []
    for i in range(200):
        ts.append(t0 + (i % 24) * h)
        if i % 2 == 0:
            vals.append(90.0 + (i % 10))
            types.append("purchase")
        else:
            vals.append(1.0 + (i % 10))
            types.append("view")
    d = str(tmp_path / "logreg")
    _write_events(d, ts, vals, types=types)
    out = REGISTRY["logreg_purchase_coefs"][0](d)
    coef = dict(zip(out["term"], out["coef"]))
    assert coef["value_scaled"] > 0
    w0, w1, w2 = (coef["intercept"], coef["hour_frac"],
                  coef["value_scaled"])
    hi = 1 / (1 + np.exp(-(w0 + w1 * 0.5 + w2 * 0.95)))
    lo = 1 / (1 + np.exp(-(w0 + w1 * 0.5 + w2 * 0.05)))
    assert hi > 0.9 and lo < 0.1


def _write_lineitem(d, flags, prices, qtys):
    os.makedirs(d, exist_ok=True)
    n = len(flags)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_partkey": pa.array(np.ones(n, np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array(np.asarray(qtys, np.float64)),
        "l_extendedprice": pa.array(np.asarray(prices, np.float64)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(flags),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.array(["2024-01-05"] * n, dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def test_doc_keywords_rare_word_wins(ray_session, tmp_path):
    """A word unique to one doc outranks words shared by every doc
    (which have idf = 0 exactly)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    texts = ["common words here unicorn",
             "common words here",
             "common words here"]
    d = str(tmp_path / "kw")
    _write_docs(d, texts, ["en"] * 3)
    out = REGISTRY["doc_top_keywords"][0](d)
    top_doc0 = out[(out.doc_id == 0) & (out.rnk == 1)]["word"].iloc[0]
    assert top_doc0 == "unicorn"
    # shared-by-all words score exactly 0
    zero = out[out.word == "common"]["score"]
    assert (zero == 0.0).all()


def test_weighted_median_follows_weight(ray_session, tmp_path):
    """Median shifts to the heavily-weighted price, and the half-total
    boundary picks the smallest qualifying price."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "wm")
    # flag A: price 10 with weight 9, price 100 with weight 1 -> 10
    # flag B: equal weights 1/1 on 10 and 100 -> 2*cum>=tot at 10
    _write_lineitem(d, ["A", "A", "B", "B"],
                    [10.0, 100.0, 10.0, 100.0], [9, 1, 1, 1])
    out = REGISTRY["weighted_median_price_by_flag"][0](d)
    got = dict(zip(out["flag"], out["wmedian_cents"]))
    assert got == {"A": 1000, "B": 1000}


def test_mode_geo_harm_planted(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # type 'view': values 1,1,4,4 -> mode tie between 100 and 400
    # cents -> smallest (100); geo = exp(mean(ln)) = 200 cents;
    # harm = 4 / (2/100 + 2/400) = 160 cents
    ts = [t0 + i * s for i in range(4)]
    d = str(tmp_path / "mgh")
    _write_events(d, ts, [1.0, 1.0, 4.0, 4.0])
    out = REGISTRY["value_mode_geo_harm_by_type"][0](d)
    r = out.iloc[0]
    assert r["mode_cents"] == 100
    assert abs(r["geo_mean_cents"] - 200.0) < 1e-6
    assert abs(r["harm_mean_cents"] - 160.0) < 1e-6


def test_holt_tracks_planted_linear_trend(ray_session, tmp_path):
    """On an exactly linear series the trend estimate equals the slope
    and the level equals the series at every step."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = []
    for day in range(10):
        n = 10 + 2 * day          # y_t = 10 + 2t events on day t
        for j in range(n):
            ts.append(t0 + np.timedelta64(day, "D")
                      + np.timedelta64(j, "s"))
    d = str(tmp_path / "holt")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["holt_linear_daily"][0](d)
    # exact-linear input is a fixed point of Holt's recursion
    assert np.allclose(out["trend"].to_numpy(), 2.0, atol=1e-9)
    assert np.allclose(out["level"].to_numpy(),
                       10 + 2 * np.arange(10), atol=1e-9)


def _brute_kcore(edges, k):
    """Driver-side reference peel."""
    edges = set(map(tuple, edges))
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return np.array(sorted(deg), np.int64)
        edges = {(a, b) for a, b in edges
                 if a not in bad and b not in bad}
        if not edges:
            return np.array([], np.int64)


def test_kcore_planted_triangle_with_tail(ray_session):
    """Triangle 1-2-3 with a tail 3-4: 2-core = the triangle, the tail
    node peels, and peeling cascades (4 drops, then nothing else)."""
    from webalizer_ray.stages import graph

    e = pd.DataFrame({"src": [1, 2, 1, 3], "dst": [2, 3, 3, 4]})
    assert graph.kcore_nodes(e, 1).tolist() == [1, 2, 3, 4]
    assert graph.kcore_nodes(e, 2).tolist() == [1, 2, 3]
    assert graph.kcore_nodes(e, 3).tolist() == []


def test_kcore_cascading_peel_matches_bruteforce(ray_session):
    """A chain hung off a clique forces multi-round cascading removal;
    the distributed peel equals the reference at every k."""
    from webalizer_ray.stages import graph

    rng = np.random.RandomState(7)
    # 6-clique
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    # chain 5-10-11-12-13 (each peels in sequence at k=2)
    edges += [(5, 10), (10, 11), (11, 12), (12, 13)]
    # random sprinkles
    for _ in range(20):
        a, b = rng.randint(20, 40, 2)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    e = pd.DataFrame(edges, columns=["src", "dst"]).drop_duplicates()
    for k in (1, 2, 3, 4, 5):
        got = graph.kcore_nodes(e, k)
        want = _brute_kcore(e.values.tolist(), k)
        assert got.tolist() == want.tolist(), k


def test_weighted_sample_prefers_heavy_items(ray_session, tmp_path):
    """With overwhelming weight on a handful of docs, the A-Res top-k
    is dominated by them (deterministically, via the shared hash)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    texts = ["x" * 100000 if i < 5 else "x" for i in range(100)]
    d = str(tmp_path / "wsamp")
    _write_docs(d, texts, ["en"] * 100)
    out = REGISTRY["weighted_doc_sample"][0](d)
    # all five heavy docs make the sample of 10
    assert set(range(5)) <= set(out["doc_id"].tolist())


def test_seasonal_decompose_recovers_planted_components(ray_session,
                                                        tmp_path):
    """y = 100 + 3t + planted dow bump: residuals vanish and the bump
    lands in the seasonal column."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    bump = {0: 0, 1: 0, 2: 14, 3: 0, 4: 0, 5: 0, 6: 0}
    ts = []
    for day in range(14):
        t = t0 + np.timedelta64(day, "D")
        dow = (int(t.astype("datetime64[D]").astype(np.int64)) + 4) % 7
        n = 100 + 3 * day + bump[dow]
        for j in range(n):
            ts.append(t + np.timedelta64(j, "s"))
    d = str(tmp_path / "season")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["daily_seasonal_decompose"][0](d)
    # the bumped dow carries a clearly positive seasonal, others ~ -2
    by_dow = {}
    for r in out.itertuples():
        by_dow.setdefault((r.epoch_day + 4) % 7, []).append(r.seasonal)
    assert min(by_dow[2]) > 10
    # trend + seasonal explain the series: residuals are tiny
    assert np.abs(out["residual"].to_numpy()).max() < 1.0


def test_did_removes_level_and_time_effects(ray_session, tmp_path):
    """Planted: control 10->20 (common shock +10), treated 30->55
    (shock +10, uplift +15). DiD recovers exactly 15."""
    from webalizer_ray.pipelines.queries import REGISTRY

    pre = np.datetime64("2024-01-10T00:00:00", "us")
    post = np.datetime64("2024-01-20T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts, users, vals = [], [], []
    for i in range(50):
        # control arm: even user ids (arm 0)
        ts += [pre + i * s, post + i * s]
        users += [2, 2]
        vals += [10.0, 20.0]
        # treated arm: odd user ids (arm 1)
        ts += [pre + i * s, post + i * s]
        users += [3, 3]
        vals += [30.0, 55.0]
    d = str(tmp_path / "did")
    _write_events(d, ts, vals, users=users)
    out = REGISTRY["did_uplift_estimate"][0](d)
    assert abs(out["did_estimate"][0] - 15.0) < 1e-9
    assert abs(out["control_delta"][0] - 10.0) < 1e-9
    assert abs(out["treated_delta"][0] - 25.0) < 1e-9


def test_cusum_peaks_at_planted_shift(ray_session, tmp_path):
    """A level shift halfway through the series puts the CUSUM peak
    exactly on the last pre-shift day."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = []
    for day in range(20):
        n = 10 if day < 10 else 30
        for j in range(n):
            ts.append(t0 + np.timedelta64(day, "D")
                      + np.timedelta64(j, "s"))
    d = str(tmp_path / "cusum")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["daily_cusum_peak"][0](d)
    day0 = int(t0.astype("datetime64[D]").astype(np.int64))
    assert out["epoch_day"][0] == day0 + 9


def test_hll_per_group_within_tolerance(ray_session):
    """Each type's HLL estimate lands within 5% of the exact distinct
    user count at sf0.001."""
    from webalizer_ray.pipelines.queries import REGISTRY
    import duckdb

    sf = "/root/testdata/sf0.001"
    est = REGISTRY["type_user_ndv_hll"][0](sf)
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1").df()
    ex = dict(zip(exact["event_type"], exact["n"]))
    for r in est.itertuples():
        assert abs(r.ndv_users_est - ex[r.event_type]) \
            <= max(2, 0.05 * ex[r.event_type])


def test_hhi_bounds_and_direction(ray_session, tmp_path):
    """Single-source corpus -> HHI = 1; uniform 4 sources -> 0.25."""
    from webalizer_ray.pipelines.queries import REGISTRY
    import pyarrow.parquet as _pq

    def write(d, sources):
        os.makedirs(d, exist_ok=True)
        n = len(sources)
        _pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["t"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources),
            "n_chars": pa.array(np.ones(n, np.int64))}),
            os.path.join(d, "documents.parquet"))

    d1 = str(tmp_path / "one")
    write(d1, ["a"] * 8)
    out = REGISTRY["source_concentration_hhi"][0](d1)
    assert out["hhi"][0] == 1.0 and out["n_sources"][0] == 1
    d2 = str(tmp_path / "four")
    write(d2, ["a", "b", "c", "d"] * 2)
    out = REGISTRY["source_concentration_hhi"][0](d2)
    assert abs(out["hhi"][0] - 0.25) < 1e-9


def test_copurchase_pairs_dedup_within_order(ray_session, tmp_path):
    """Repeated (order, part) lines count the pair once per order."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "basket")
    # order 1 holds parts {10, 20} with part 10 on two lines;
    # order 2 holds {10, 20, 30}
    _write_lineitem_basket(d,
                           orders=[1, 1, 1, 2, 2, 2],
                           parts=[10, 10, 20, 10, 20, 30])
    out = REGISTRY["copurchased_part_pairs"][0](d)
    got = {(r.part_a, r.part_b): r.n for r in out.itertuples()}
    assert got[(10, 20)] == 2
    assert got[(10, 30)] == 1 and got[(20, 30)] == 1


def _write_lineitem_basket(d, orders, parts):
    os.makedirs(d, exist_ok=True)
    n = len(orders)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.asarray(orders, np.int64)),
        "l_partkey": pa.array(np.asarray(parts, np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(np.ones(n)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.array(["2024-01-05"] * n, dtype="datetime64[us]"),
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))


def test_markov_stationary_two_state_chain(ray_session, tmp_path):
    """Planted 2-state chain with P(a->b)=1/3, P(b->a)=2/3 -> the
    stationary distribution is (2/3, 1/3) up to 32-step convergence."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # one user; craft the sequence so transition COUNTS give the
    # desired probabilities: from a: a,a,b (x2 -> 4 aa, 2 ab);
    # from b: a,a,... arrange counts 2 ba, 1 bb
    seq = ["a", "a", "a", "b", "b", "a", "a", "b", "a"]
    # transitions: aa,aa,ab,bb,ba,aa,ab,ba -> aa=3,ab=2,bb=1,ba=2
    ts = [t0 + i * s for i in range(len(seq))]
    d = str(tmp_path / "markov")
    _write_events(d, ts, [1.0] * len(seq), types=seq)
    out = REGISTRY["markov_stationary_types"][0](d)
    got = dict(zip(out["event_type"], out["stationary_p"]))
    # P = [[3/5,2/5],[2/3,1/3]] -> pi = (5/8, 3/8) = (0.625, 0.375)
    assert abs(got["a"] - 0.625) < 1e-4
    assert abs(got["b"] - 0.375) < 1e-4


def test_bootstrap_ci_brackets_mean_and_shrinks(ray_session, tmp_path):
    """The CI brackets the sample mean, and widens with variance."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rng = np.random.RandomState(0)
    tight = 50.0 + rng.randn(400) * 0.5
    wide = 50.0 + rng.randn(400) * 20.0
    d1, d2 = str(tmp_path / "bt"), str(tmp_path / "bw")
    _write_events(d1, [t0 + i * s for i in range(400)],
                  np.abs(tight).tolist())
    _write_events(d2, [t0 + i * s for i in range(400)],
                  np.abs(wide).tolist())
    q = REGISTRY["bootstrap_value_mean_ci"][0]
    o1, o2 = q(d1), q(d2)
    m1 = np.abs(tight).mean() * 100
    assert o1["ci_lo_cents"][0] < m1 < o1["ci_hi_cents"][0]
    w1 = o1["ci_hi_cents"][0] - o1["ci_lo_cents"][0]
    w2 = o2["ci_hi_cents"][0] - o2["ci_lo_cents"][0]
    assert w2 > w1


def test_lorenz_uniform_is_diagonal(ray_session, tmp_path):
    """Equal per-user value -> the Lorenz curve is the diagonal."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(100)]
    d = str(tmp_path / "lorenz")
    _write_events(d, ts, [5.0] * 100, users=list(range(100)))
    out = REGISTRY["user_value_lorenz"][0](d)
    assert np.allclose(out["cum_share"].to_numpy(),
                       np.arange(1, 11) / 10.0, atol=1e-9)


def test_association_rules_hand_computed(ray_session, tmp_path):
    """Two-type chain with known transition counts -> exact
    support/confidence/lift."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # one user, sequence a a b a -> transitions aa, ab, ba (n=3)
    seq = ["a", "a", "b", "a"]
    ts = [t0 + i * s for i in range(len(seq))]
    d = str(tmp_path / "assoc")
    _write_events(d, ts, [1.0] * len(seq), types=seq)
    out = REGISTRY["transition_association_rules"][0](d)
    rows = {(r.from_type, r.to_type): r for r in out.itertuples()}
    # support: aa 1/3, ab 1/3, ba 1/3; confidence: aa 1/2, ab 1/2, ba 1
    assert abs(rows[("a", "a")].support - 1 / 3) < 1e-6
    assert abs(rows[("a", "b")].confidence - 0.5) < 1e-6
    assert abs(rows[("b", "a")].confidence - 1.0) < 1e-6
    # lift(b->a) = conf / P(to=a) = 1 / (2/3) = 1.5
    assert abs(rows[("b", "a")].lift - 1.5) < 1e-6


def test_percentile_bands_distinct_values(ray_session, tmp_path):
    """21 users with strictly increasing sums -> PERCENT_RANK bands are
    rank-1 clipped to 19, so band 19 holds exactly two users and every
    other band exactly one; CUME_DIST*n (sum_rank_le) equals the rank."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 21
    ts = [t0 + i * s for i in range(n)]
    d = str(tmp_path / "bands")
    _write_events(d, ts, [float(i + 1) for i in range(n)],
                  users=list(range(n)))
    out = REGISTRY["user_value_percentile_bands"][0](d)
    got = dict(zip(out["band"], out["n_users"]))
    assert got == {**{b: 1 for b in range(19)}, 19: 2}
    # distinct values: rank_le == rank, so per-band sums are exact
    rle = dict(zip(out["band"], out["sum_rank_le"]))
    assert rle[0] == 1 and rle[19] == 20 + 21


def test_percentile_bands_all_ties(ray_session, tmp_path):
    """Every user equal -> rank_min 1 for all, single band 0, and
    sum_rank_le = n*n (CUME_DIST == 1 for every row)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "bandtie")
    _write_events(d, [t0 + i * s for i in range(8)], [3.0] * 8,
                  users=list(range(8)))
    out = REGISTRY["user_value_percentile_bands"][0](d)
    assert out["band"].tolist() == [0]
    assert out["n_users"].tolist() == [8]
    assert out["sum_rank_le"].tolist() == [64]


def test_grouping_sets_lattice_consistency(ray_session, tmp_path):
    """Each grouping set partitions the input: n and cents summed
    within any one set equal the grand total, and the () row is the
    grand total itself."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-06T05:00:00", "us")  # a Saturday? fixed
    h = np.timedelta64(1, "h")
    types = ["view", "click", "view", "purchase", "click", "view"]
    ts = [t0 + i * 7 * h for i in range(len(types))]
    vals = [1.25, 2.50, 0.75, 10.00, 2.50, 1.25]
    d = str(tmp_path / "gsets")
    _write_events(d, ts, vals, types=types)
    out = REGISTRY["events_grouping_sets"][0](d)
    tot_n, tot_c = len(types), round(sum(vals) * 100)
    grand = out[(out["event_type"] == "ALL") & (out["dow"] == -1)
                & (out["hour"] == -1)]
    assert grand["n"].tolist() == [tot_n]
    assert grand["cents"].tolist() == [tot_c]
    td = out[(out["event_type"] != "ALL") & (out["dow"] >= 0)]
    th = out[(out["event_type"] != "ALL") & (out["hour"] >= 0)]
    dw = out[(out["event_type"] == "ALL") & (out["dow"] >= 0)]
    for part in (td, th, dw):
        assert part["n"].sum() == tot_n
        assert part["cents"].sum() == tot_c
    # the two type-level sets agree per type
    assert (td.groupby("event_type")["n"].sum().sort_index().tolist()
            == th.groupby("event_type")["n"].sum().sort_index().tolist())


def test_trailing_distinct_types_hand_case(ray_session, tmp_path):
    """a@0, b@30min, a@90min -> k = 1, 2, 2 (the 90min event sees b@30
    inside its trailing hour but not a@0)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    d = str(tmp_path / "tdist")
    _write_events(d, [t0, t0 + 30 * m, t0 + 90 * m], [1.0] * 3,
                  types=["a", "b", "a"])
    out = REGISTRY["user_trailing_1h_distinct_types"][0](d)
    assert dict(zip(out["k"], out["n"])) == {1: 1, 2: 2}


def test_trailing_distinct_types_range_peers(ray_session, tmp_path):
    """RANGE semantics: two same-user events at the SAME timestamp with
    different types both count each other -> k = 2 for both."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    d = str(tmp_path / "tpeer")
    _write_events(d, [t0, t0], [1.0, 1.0], types=["a", "b"])
    out = REGISTRY["user_trailing_1h_distinct_types"][0](d)
    assert dict(zip(out["k"], out["n"])) == {2: 2}


def test_concurrency_hist_hand_case(ray_session, tmp_path):
    """Two users: u0 live [0, 40min] (one session spanning a 20-min
    gap), u1 live [10min, 20min] -> conc 1 for 30min, conc 2 for
    10min. Durations are exact microseconds."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    ts = [t0, t0 + 20 * m, t0 + 40 * m, t0 + 10 * m, t0 + 20 * m]
    d = str(tmp_path / "conc")
    _write_events(d, ts, [1.0] * 5, users=[0, 0, 0, 1, 1])
    out = REGISTRY["session_concurrency_hist"][0](d)
    got = dict(zip(out["conc"], out["dur_us"]))
    assert got == {1: 30 * 60_000_000, 2: 10 * 60_000_000}


def test_concurrency_hist_zero_length_session(ray_session, tmp_path):
    """A single-event session (st == en) nets to zero time: only the
    other user's interval appears."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    d = str(tmp_path / "conc0")
    _write_events(d, [t0, t0 + 10 * m, t0 + 5 * m], [1.0] * 3,
                  users=[0, 0, 1])
    out = REGISTRY["session_concurrency_hist"][0](d)
    got = dict(zip(out["conc"], out["dur_us"]))
    assert got == {1: 10 * 60_000_000}


def test_concurrency_hist_cross_day_segment(ray_session, tmp_path):
    """A session straddling midnight exercises the bucket-stitch path:
    the last boundary of day 0's bucket must extend to day 1's first
    boundary."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T23:50:00", "us")
    m = np.timedelta64(1, "m")
    # u0: one session 23:50 -> 00:10 (+1d); u1 joins 00:00 -> 00:10
    ts = [t0, t0 + 20 * m, t0 + 10 * m, t0 + 20 * m]
    d = str(tmp_path / "concx")
    _write_events(d, ts, [1.0] * 4, users=[0, 0, 1, 1])
    out = REGISTRY["session_concurrency_hist"][0](d)
    got = dict(zip(out["conc"], out["dur_us"]))
    assert got == {1: 10 * 60_000_000, 2: 10 * 60_000_000}


def test_kruskal_wallis_planted_shift(ray_session, tmp_path):
    """Identical groups -> H == 0; a large planted shift between two
    groups -> H near the max (n-1 for two groups without ties)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 40
    ts = [t0 + i * s for i in range(n)]
    same = str(tmp_path / "kwsame")
    _write_events(same, ts, [float(i % 5) + 1 for i in range(n)],
                  types=["a", "b"] * (n // 2))
    o = REGISTRY["kruskal_wallis_value_by_type"][0](same)
    assert abs(o["h"][0]) < 1e-9 or o["h"][0] < 0.5  # near zero
    shifted = str(tmp_path / "kwshift")
    _write_events(shifted, ts,
                  [1.0 + i * 0.01 for i in range(20)]
                  + [100.0 + i * 0.01 for i in range(20)],
                  types=["a"] * 20 + ["b"] * 20)
    o2 = REGISTRY["kruskal_wallis_value_by_type"][0](shifted)
    # perfect separation, no ties: H = 12/(n(n+1)) * (sum R_g^2/n_g)
    # - 3(n+1) with R_a = 210, R_b = 610 -> H = 29.2682926...
    assert abs(o2["h"][0] - 29.268293) < 1e-5
    assert o2["h_tie"][0] == o2["h"][0]  # no ties -> correction = 1


def test_cvm_identical_vs_disjoint(ray_session, tmp_path):
    """Identical view/purchase samples -> T == 0; fully separated
    samples -> the closed-form maximum for n1 == n2 == n."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 10
    ts = [t0 + i * s for i in range(2 * n)]
    same = str(tmp_path / "cvmsame")
    _write_events(same, ts, [float(i % n) + 1 for i in range(2 * n)],
                  types=["view"] * n + ["purchase"] * n)
    o = REGISTRY["cramer_von_mises_view_purchase"][0](same)
    assert o["cvm_t"][0] == 0.0
    sep = str(tmp_path / "cvmsep")
    _write_events(sep, ts, [float(i + 1) for i in range(n)]
                  + [float(i + 101) for i in range(n)],
                  types=["view"] * n + ["purchase"] * n)
    o2 = REGISTRY["cramer_von_mises_view_purchase"][0](sep)
    # disjoint supports: D/(n*n) = f/n over the first sample's points
    # (f=1..n, n points each multiplicity 1) then stays 1 .. T =
    # sum over 2n points of (F-G)^2 / (2n)... closed form:
    # S = n^2 * (sum_{f=1}^{n-1} f^2 * 1 ... compute directly instead
    import numpy as _np
    f1 = _np.concatenate([_np.arange(1, n + 1), _np.full(n, n)])
    f2 = _np.concatenate([_np.zeros(n, int), _np.arange(1, n + 1)])
    s_num = int((( _np.int64(1)) * ((f1 * n - f2 * n) ** 2)).sum())
    expect = s_num / (n * n * (2 * n) ** 2)
    assert abs(o2["cvm_t"][0] - round(expect, 9)) < 1e-12


def test_brown_forsythe_equal_vs_spread(ray_session, tmp_path):
    """Equal spreads -> F ~ 0; one group with 100x the spread -> large
    F. Per-type integer moments are exact."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 30
    ts = [t0 + i * s for i in range(2 * n)]
    vals = [10.0 + (i % 3) for i in range(n)] \
        + [10.0 + 100.0 * (i % 3) for i in range(n)]
    d = str(tmp_path / "bf")
    _write_events(d, ts, vals, types=["a"] * n + ["b"] * n)
    out = REGISTRY["brown_forsythe_value_by_type"][0](d)
    rows = {r.event_type: r for r in out.itertuples()}
    # group a: cents 1000,1100,1200 x10 each; med2 = 2*1100
    assert rows["a"].med2 == 2200
    assert rows["a"].s_abs == 10 * 200 + 10 * 0 + 10 * 200
    assert rows["b"].med2 == 2 * 11000
    assert out["f"].iloc[0] > 50.0


def test_holt_winters_constant_series(ray_session, tmp_path):
    """A perfectly weekly-periodic series: after init, level stays at
    the weekly mean, trend stays 0, and the one-step forecast
    reproduces the series exactly."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    pattern = [10, 20, 30, 40, 30, 20, 10]
    ts, n_days = [], 21
    for i in range(n_days):
        ts.extend([t0 + i * day] * pattern[i % 7])
    d = str(tmp_path / "hw")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["holt_winters_dow_daily"][0](d)
    assert len(out) == n_days - 7
    # periodic input: s_i = y_i - mean, l = mean, b = 0 forever ->
    # forecast l + b + s1 = y exactly
    expect = [pattern[i % 7] for i in range(7, n_days)]
    assert np.allclose(out["forecast"].to_numpy(), expect, atol=1e-9)
    assert np.allclose(out["trend"].to_numpy(), 0.0, atol=1e-9)
    assert np.allclose(out["level"].to_numpy(), 160 / 7, atol=1e-9)


def test_holt_winters_too_short(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    d = str(tmp_path / "hwshort")
    _write_events(d, [t0 + i * day for i in range(5)], [1.0] * 5)
    assert len(REGISTRY["holt_winters_dow_daily"][0](d)) == 0


def test_business_hours_overlap_hand_case(ray_session, tmp_path):
    """Session 08:00->10:00 overlaps business hours for exactly 1h;
    one spanning midnight 16:30->09:30(+1d) overlaps 30min + 30min."""
    from webalizer_ray.pipelines.queries import REGISTRY

    h = np.timedelta64(1, "h")
    m = np.timedelta64(1, "m")
    # 2024-01-01 is a Monday -> dow 1 ((epoch+4)%7 is Sunday=0)
    a0 = np.datetime64("2024-01-01T08:00:00", "us")
    b0 = np.datetime64("2024-01-02T16:30:00", "us")
    d = str(tmp_path / "biz")
    # u0: events 08:00 and 10:00 gap 2h -> TWO single-event sessions?
    # no: gap 2h >= 30min splits sessions. keep events 20min apart.
    ts = [a0 + i * 20 * m for i in range(7)]          # 08:00..10:00
    ts += [b0 + i * 20 * m for i in range(52)]        # 16:30..+17h
    d = str(tmp_path / "biz")
    _write_events(d, ts, [1.0] * len(ts), users=[0] * 7 + [1] * 52)
    out = REGISTRY["session_business_hours_overlap"][0](d)
    rows = {int(r.dow): r for r in out.itertuples()}
    # Monday session 08:00-10:00: 1h business
    assert rows[1].business_us == 3_600_000_000
    assert rows[1].total_us == 2 * 3_600_000_000
    # Tuesday 16:30 -> Wed 09:30: 30min Tue + 30min Wed
    assert rows[2].business_us == 3_600_000_000
    assert rows[2].total_us == 17 * 3_600_000_000


def test_jw_fuzzy_lookup_recovers_original(ray_session, tmp_path):
    """Transposed probes resolve back to their source name when the
    catalog is distinctive enough."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "jw")
    os.makedirs(d, exist_ok=True)
    names = ["alpha bravo charlie", "delta echo foxtrot",
             "golf hotel india", "juliet kilo lima",
             "mike november oscar", "papa quebec romeo",
             "sierra tango uniform", "victor whiskey xray",
             "yankee zulu alpha", "bravo delta golf",
             "completely different", "another unrelated"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(len(names)), pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array(["b"] * len(names)),
        "p_type": pa.array(["t"] * len(names)),
        "p_size": pa.array([1] * len(names), pa.int32()),
        "p_retailprice": pa.array([1.0] * len(names))}),
        os.path.join(d, "part.parquet"))
    out = REGISTRY["jw_fuzzy_part_lookup"][0](d)
    by_probe = dict(zip(out["probe"], out["best_name"]))
    for n in names[:10]:
        probe = n[:2] + n[3] + n[2] + n[4:]
        assert by_probe[probe] == n
        assert out[out["probe"] == probe]["sim"].iloc[0] > 0.95


def test_mann_whitney_hand_case(ray_session, tmp_path):
    """view = {1,2,3}, purchase = {2,3,4}: U1 = #(x>y) + 0.5#(x=y)
    = 1 + 0.5*2 = 2 -> u2 = 4; r_rb = 1 - 2U/(n1 n2) = 1 - 4/9."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "mw")
    _write_events(d, [t0 + i * s for i in range(6)],
                  [1.0, 2.0, 3.0, 2.0, 3.0, 4.0],
                  types=["view"] * 3 + ["purchase"] * 3)
    out = REGISTRY["mann_whitney_view_purchase"][0](d)
    assert out["u2"][0] == 4
    assert abs(out["r_rb"][0] - round(1 - 4 / 9, 6)) < 1e-12
    # symmetric shift -> negative z (views below purchases)
    assert out["z"][0] < 0


def test_mann_whitney_all_tied(ray_session, tmp_path):
    """All values equal -> tie factor 0 -> z short-circuits to 0 and
    u2 = n1*n2 (all half-pairs)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "mwt")
    _write_events(d, [t0 + i * s for i in range(6)], [5.0] * 6,
                  types=["view"] * 3 + ["purchase"] * 3)
    out = REGISTRY["mann_whitney_view_purchase"][0](d)
    assert out["u2"][0] == 9 and out["z"][0] == 0.0


def test_boxplot_hand_case(ray_session, tmp_path):
    """1..8 plus an outlier 100: q1/q2/q3 = 2/4/6 (lower convention,
    n=9), fences [2-6, 6+6] -> 100 is the only outlier, whiskers
    hug the data range inside the fences."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    vals = [float(v) for v in range(1, 9)] + [100.0]
    d = str(tmp_path / "box")
    _write_events(d, [t0 + i * s for i in range(9)], vals)
    out = REGISTRY["boxplot_stats_by_type"][0](d)
    r = out.iloc[0]
    # cents: 100..800, 10000; n=9 -> ceil(9/4)=3rd=300? lower conv:
    # 4cm>=9 -> cm>=2.25 -> cm=3rd value? cm counts: 1,2,3.. -> first
    # c with 4*cm >= 9 is cm=3 -> c=300
    assert (r.q1, r.q2, r.q3) == (300, 500, 700)
    assert r.iqr == 400
    assert r.n_outliers == 1
    assert r.whisker_lo == 100 and r.whisker_hi == 800


def test_seat_allocation_sums_to_budget(ray_session, tmp_path):
    """Seats always sum to exactly 10000 and ordering follows the
    largest remainder."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    types = ["a"] * 1 + ["b"] * 2 + ["c"] * 4
    d = str(tmp_path / "seats")
    _write_events(d, [t0 + i * s for i in range(len(types))],
                  [1.0] * len(types), types=types)
    out = REGISTRY["proportional_seat_allocation"][0](d)
    assert out["seats"].sum() == 10000
    got = dict(zip(out["event_type"], out["seats"]))
    # 10000*{1,2,4}/7 = 1428.57, 2857.14, 5714.28 -> floors
    # 1428+2857+5714 = 9999, 1 extra to largest remainder (a: .571
    # *7=4, b: .142*7=1? rems: 10000%7=4, 20000%7=1, 40000%7=2) -> a
    assert got == {"a": 1429, "b": 2857, "c": 5714}


def test_markov_hitting_time_two_state(ray_session, tmp_path):
    """Chain a->purchase with prob 1: h(a) = 1; purchase->a->purchase
    ... h(purchase) = 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    seq = ["a", "purchase"] * 6
    d = str(tmp_path / "hit")
    _write_events(d, [t0 + i * s for i in range(len(seq))],
                  [1.0] * len(seq), types=seq)
    out = REGISTRY["markov_hitting_time_purchase"][0](d)
    got = dict(zip(out["event_type"], out["exp_steps"]))
    assert got["a"] == 1.0 and got["purchase"] == 0.0


def test_markov_hitting_time_geometric(ray_session, tmp_path):
    """a self-loops half the time: true h(a) = 2; the 12-sweep
    truncation gives 2 - 2^-11 on both engines (documented
    truncation, not the limit)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # transitions from a: a->a and a->purchase equally often
    seq = ["a", "a", "purchase", "a", "a", "purchase", "a"]
    d = str(tmp_path / "hitg")
    _write_events(d, [t0 + i * s for i in range(len(seq))],
                  [1.0] * len(seq), types=seq)
    out = REGISTRY["markov_hitting_time_purchase"][0](d)
    got = dict(zip(out["event_type"], out["exp_steps"]))
    # from 'a': P(a->a)=0.5? transitions: aa, ap, pa, aa, ap, pa ->
    # from a: aa x2, ap x2 -> 0.5 each. h converges to 2.
    assert abs(got["a"] - (2.0 - 2.0 ** -11)) < 1e-6


def test_pettitt_planted_level_shift(ray_session, tmp_path):
    """10 low days then 10 high days: the split at the boundary wins
    with |U| = 100 (all cross pairs signed the same way)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts = []
    for i in range(20):
        cnt = 2 if i < 10 else 9
        ts.extend([t0 + i * day] * cnt)
    d = str(tmp_path / "pett")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["pettitt_change_day"][0](d)
    assert out["k"][0] == 100
    # change day = last day of the first regime
    assert out["change_day"][0] == int(
        (t0 + 9 * day).astype("datetime64[D]").astype(np.int64))
    assert out["u_t"][0] == -100  # low regime first -> negative signs


def test_cochran_armitage_planted_trend(ray_session, tmp_path):
    """Purchase share rising with the hour -> strongly positive z;
    flat share -> A = 0 -> z short-circuits to 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")
    ts, types = [], []
    for hour in range(10):
        for j in range(10):
            ts.append(t0 + hour * h + j * s)
            types.append("purchase" if j < hour else "view")
    d = str(tmp_path / "ca")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["cochran_armitage_purchase_by_hour"][0](d)
    assert out["z"][0] > 3.0
    flat = str(tmp_path / "caflat")
    types2 = (["purchase"] * 5 + ["view"] * 5) * 10
    _write_events(flat, ts, [1.0] * len(ts), types=types2)
    out2 = REGISTRY["cochran_armitage_purchase_by_hour"][0](flat)
    assert out2["a"][0] == 0 and out2["z"][0] == 0.0


def test_runs_test_alternating_vs_blocked(ray_session, tmp_path):
    """Alternating high/low days -> maximum runs -> z > 0; two solid
    blocks -> exactly 2 runs -> z < 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")

    def build(pattern, name):
        ts = []
        for i, cnt in enumerate(pattern):
            ts.extend([t0 + i * day] * cnt)
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts))
        return d

    # ten alternating 2/9 days plus one median-3 day (dropped):
    # the survivors alternate perfectly -> R = na + nb = 10
    alt = build([2, 9] * 5 + [3], "runsalt")
    o1 = REGISTRY["runs_test_daily"][0](alt)
    assert (int(o1["na"][0]), int(o1["nb"][0])) == (5, 5)
    assert o1["r"][0] == 10
    assert o1["z"][0] > 0
    blk = build([2] * 6 + [9] * 6 + [3] * 0, "runsblk")
    o2 = REGISTRY["runs_test_daily"][0](blk)
    # lower median 2: the six 2-days drop (== median), only highs
    # remain -> one-sided -> z = 0. build with 3 values instead:
    blk2 = build([2, 2, 2, 3, 3, 3, 9, 9, 9, 9, 9, 9], "runsblk2")
    o2 = REGISTRY["runs_test_daily"][0](blk2)
    assert o2["r"][0] == 2 and o2["z"][0] < 0


def test_entropy_rate_deterministic_chain(ray_session, tmp_path):
    """A deterministic cycle a->b->a has zero entropy rate; a fair
    coin chain has ln 2."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    det = str(tmp_path / "entdet")
    seq = ["a", "b"] * 10
    _write_events(det, [t0 + i * s for i in range(len(seq))],
                  [1.0] * len(seq), types=seq)
    o = REGISTRY["markov_entropy_rate"][0](det)
    assert abs(o["entropy_rate_nats"][0]) < 1e-9
    coin = str(tmp_path / "entcoin")
    # 'a a b b' repeated: transitions aa, ab, bb, ba equally often
    seq2 = ["a", "a", "b", "b"] * 2 + ["a"]
    _write_events(coin, [t0 + i * s for i in range(len(seq2))],
                  [1.0] * len(seq2), types=seq2)
    o2 = REGISTRY["markov_entropy_rate"][0](coin)
    assert abs(o2["entropy_rate_nats"][0] - np.log(2)) < 1e-3


def test_kendall_tau_perfect_and_reversed(ray_session, tmp_path):
    """Views and purchases rising together -> tau_b = 1; purchases
    reversed -> tau_b = -1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")

    def build(vcounts, pcounts, name):
        ts, types = [], []
        for i, (vc, pc) in enumerate(zip(vcounts, pcounts)):
            ts.extend([t0 + i * day] * (vc + pc))
            types.extend(["view"] * vc + ["purchase"] * pc)
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts), types=types)
        return d

    up = build([1, 2, 3, 4, 5], [2, 3, 4, 5, 6], "ktup")
    o = REGISTRY["kendall_tau_daily"][0](up)
    assert o["tau_b"][0] == 1.0 and o["cd"][0] == 10
    down = build([1, 2, 3, 4, 5], [6, 5, 4, 3, 2], "ktdown")
    o2 = REGISTRY["kendall_tau_daily"][0](down)
    assert o2["tau_b"][0] == -1.0


def test_wilcoxon_hand_case(ray_session, tmp_path):
    """diffs (v-p) = +1, +2, -3, 0(dropped): |d| ranks 1,2,3 ->
    W+ = 1+2 = 3 -> w2 = (2*1+... doubled midranks 2r = 1*2? no
    ties: mr2 = 2r-? For distinct |d|: mr2 = 2*cum_before + 1 + 1 =
    2r. W2 = 2*3 = 6? check: ranks 1,2 positive -> W2 = 2+4 = 6."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    # day diffs: v-p = 1, 2, -3, 0
    vc, pc = [2, 3, 1, 2], [1, 1, 4, 2]
    ts, types = [], []
    for i, (a, b) in enumerate(zip(vc, pc)):
        ts.extend([t0 + i * day] * (a + b))
        types.extend(["view"] * a + ["purchase"] * b)
    d = str(tmp_path / "wsr")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["wilcoxon_signed_rank_daily"][0](d)
    assert out["n"][0] == 3
    assert out["w2"][0] == 6           # doubled W+ = 2*(1+2)
    assert out["num"][0] == 0          # 2*6 - 3*4 = 0 -> z = 0
    assert out["z"][0] == 0.0


def test_jsd_identical_and_disjoint(ray_session, tmp_path):
    """Identical hourly profiles -> JSD 0; disjoint hours -> ln 2."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    same = str(tmp_path / "jsdsame")
    ts = [t0 + ((i // 2) % 4) * h for i in range(16)]
    _write_events(same, ts, [1.0] * 16,
                  types=["view", "purchase"] * 8)
    o = REGISTRY["jensen_shannon_type_hours"][0](same)
    assert o["jsd_nats"][0] == 0.0
    dis = str(tmp_path / "jsddis")
    ts2 = [t0 + (0 if i < 8 else 12) * h for i in range(16)]
    _write_events(dis, ts2, [1.0] * 16,
                  types=["view"] * 8 + ["purchase"] * 8)
    o2 = REGISTRY["jensen_shannon_type_hours"][0](dis)
    assert abs(o2["jsd_nats"][0] - round(np.log(2), 6)) < 1e-9


def test_theil_equal_vs_concentrated(ray_session, tmp_path):
    """Equal users -> T = 0; everything on one of n users -> ln n."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    eq = str(tmp_path / "theileq")
    _write_events(eq, [t0 + i * s for i in range(8)], [5.0] * 8,
                  users=list(range(8)))
    o = REGISTRY["theil_index_user_value"][0](eq)
    assert o["theil_t"][0] == 0.0
    conc = str(tmp_path / "theilc")
    _write_events(conc, [t0 + i * s for i in range(8)],
                  [40.0] + [0.0] * 7, users=list(range(8)))
    o2 = REGISTRY["theil_index_user_value"][0](conc)
    assert abs(o2["theil_t"][0] - round(np.log(8), 6)) < 1e-9


def test_friedman_consistent_vs_shuffled(ray_session, tmp_path):
    """A stable daily ordering of 3 types maximizes chi2 = 2*T... for
    k=3 the max is 2*T*(k-1)/... just assert ordering: consistent
    ranking -> chi2 large; per-day-identical counts -> chi2 = 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")

    def build(counts_per_day, name):
        ts, types = [], []
        for i, counts in enumerate(counts_per_day):
            for g, c in counts.items():
                ts.extend([t0 + i * day] * c)
                types.extend([g] * c)
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts), types=types)
        return d

    stable = build([{"a": 1, "b": 5, "c": 9}] * 6, "frst")
    o = REGISTRY["friedman_test_types_by_day"][0](stable)
    # perfect consistency, no ties: chi2 = T*(k-1) = 12
    assert o["chi2"][0] == 12.0
    tied = build([{"a": 4, "b": 4, "c": 4}] * 6, "frtie")
    o2 = REGISTRY["friedman_test_types_by_day"][0](tied)
    assert o2["chi2"][0] == 0.0


def test_cohen_kappa_perfect_agreement(ray_session, tmp_path):
    """Users keep their modal type across halves -> kappa = 1 (two
    distinct modal types so margins aren't degenerate)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, types, users = [], [], []
    for u, g in [(0, "a"), (1, "b")]:
        for dd in (0, 10):   # both halves (cut splits 0..10 at 6)
            ts.append(t0 + dd * day)
            types.append(g)
            users.append(u)
    d = str(tmp_path / "kap")
    _write_events(d, ts, [1.0] * len(ts), users=users, types=types)
    out = REGISTRY["cohen_kappa_period_modal_type"][0](d)
    assert out["n"][0] == 2 and out["agree"][0] == 2
    assert out["kappa"][0] == 1.0


def test_cohen_kappa_systematic_swap(ray_session, tmp_path):
    """Both users swap their modal types between halves -> agreement
    0, kappa = (0 - pe)/(1 - pe) < 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, types, users = [], [], []
    for u, (g1, g2) in [(0, ("a", "b")), (1, ("b", "a"))]:
        ts.append(t0); types.append(g1); users.append(u)
        ts.append(t0 + 10 * day); types.append(g2); users.append(u)
    d = str(tmp_path / "kapswap")
    _write_events(d, ts, [1.0] * len(ts), users=users, types=types)
    out = REGISTRY["cohen_kappa_period_modal_type"][0](d)
    assert out["agree"][0] == 0 and out["kappa"][0] < 0


def test_mcnemar_hand_case(ray_session, tmp_path):
    """3 users convert only in H1, 1 only in H2, 1 in both, 1 never:
    b=3, c=1, chi2 = 4/4 = 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, types, users = [], [], []

    def add(u, dd, g):
        ts.append(t0 + dd * day); types.append(g); users.append(u)

    for u in (0, 1, 2):
        add(u, 0, "purchase"); add(u, 10, "view")
    add(3, 0, "view"); add(3, 10, "purchase")
    add(4, 0, "purchase"); add(4, 10, "purchase")
    add(5, 0, "view"); add(5, 10, "view")
    d = str(tmp_path / "mcn")
    _write_events(d, ts, [1.0] * len(ts), users=users, types=types)
    out = REGISTRY["mcnemar_purchase_periods"][0](d)
    assert (int(out["b10"][0]), int(out["c01"][0]),
            int(out["a11"][0]), int(out["d00"][0])) == (3, 1, 1, 1)
    assert out["chi2"][0] == 1.0


def test_period_power_weekly_signal(ray_session, tmp_path):
    """A clean 7-day cycle puts the spectral peak at period 7."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    pattern = [2, 2, 2, 2, 2, 12, 12]
    ts = []
    for i in range(28):
        ts.extend([t0 + i * day] * pattern[i % 7])
    d = str(tmp_path / "dft")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["daily_period_power"][0](d)
    assert len(out) == 13
    best = out.loc[out["power"].idxmax(), "period_days"]
    assert best == 7


def test_pot_clusters_hand_case(ray_session, tmp_path):
    """20 quiet days at 2-3 events + spikes on days 5,6 (sum 30) and
    day 12 (16): P90 threshold separates them into two clusters; the
    2-day run is longest and heaviest."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    # 30 days, 27 quiet (<=3) so the P90 order stat lands on 3
    counts = [2, 3, 2, 3, 2, 14, 16, 2, 3, 2, 3, 2, 16, 3, 2, 3, 2,
              3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3]
    ts = []
    for i, c in enumerate(counts):
        ts.extend([t0 + i * day] * c)
    d = str(tmp_path / "pot")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["pot_exceedance_clusters"][0](d)
    r = out.iloc[0]
    assert r.threshold == 3
    assert r.n_exceed == 3 and r.n_clusters == 2
    assert r.max_run_len == 2
    assert r.best_cluster_sum == 30
    assert r.best_cluster_day == int(
        (t0 + 5 * day).astype("datetime64[D]").astype(np.int64))


def test_moments_symmetric_vs_skewed(ray_session, tmp_path):
    """A symmetric two-point 50/50 mix has kurtosis_excess = -2 (the
    minimum) and Bowley 1? quartiles of {1x10, 3x10}: q1=1,q2=1,q3=3
    -> bowley = (3+1-2)/2 = 1. A heavy right tail gives positive
    moment kurtosis."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    sym = str(tmp_path / "momsym")
    _write_events(sym, [t0 + i * s for i in range(20)],
                  [1.0] * 10 + [3.0] * 10)
    o = REGISTRY["moments_skew_kurtosis_by_type"][0](sym)
    assert o["kurtosis_excess"][0] == -2.0
    assert o["bowley_skew"][0] == 1.0
    tail = str(tmp_path / "momtail")
    _write_events(tail, [t0 + i * s for i in range(21)],
                  [5.0] * 20 + [100.0])
    o2 = REGISTRY["moments_skew_kurtosis_by_type"][0](tail)
    assert o2["kurtosis_excess"][0] > 10


def test_burstiness_metronome_vs_bursty(ray_session, tmp_path):
    """Perfectly regular gaps -> B = -1 per user; highly variable
    gaps -> B approaches +1; mean reflects the mix."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    reg = str(tmp_path / "breg")
    _write_events(reg, [t0 + i * 60 * s for i in range(10)],
                  [1.0] * 10)
    o = REGISTRY["user_burstiness_mean"][0](reg)
    assert o["mean_burstiness"][0] == -1.0
    brs = str(tmp_path / "bbur")
    # gaps: 1s x99 then one huge 100-day gap: sigma/mu ~ sqrt(n-1)
    # -> B ~ (sqrt(99)-1)/(sqrt(99)+1) ~ 0.82
    ts = [t0 + i * s for i in range(100)] \
        + [t0 + np.timedelta64(100, "D")]
    _write_events(brs, ts, [1.0] * 101)
    o2 = REGISTRY["user_burstiness_mean"][0](brs)
    assert o2["mean_burstiness"][0] > 0.7


def test_rate_limit_audit_hand_case(ray_session, tmp_path):
    """7 events in one minute -> bursts 1..7, two violations (k=6,7);
    an event 301s later only sees itself."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * 10 * s for i in range(7)] + [t0 + 361 * s]
    d = str(tmp_path / "rl")
    _write_events(d, ts, [1.0] * 8)
    out = REGISTRY["rate_limit_audit"][0](d)
    assert out["n_events"][0] == 8
    assert out["max_burst"][0] == 7
    assert out["violations"][0] == 2
    # 361s after t0: events at 10..60s are all > 61s out of window?
    # window is (361-300, 361] = (61, 361]: t0+60s exactly at 60 < 61
    # -> excluded; only itself counts


def test_rate_limit_strict_boundary(ray_session, tmp_path):
    """An event exactly 300s earlier is OUTSIDE the strict window."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "rlb")
    _write_events(d, [t0, t0 + 300 * s, t0 + 599 * s], [1.0] * 3)
    out = REGISTRY["rate_limit_audit"][0](d)
    # event 2 sees only itself (t0 exactly 300s before: excluded);
    # event 3 sees event 2 (299s before) and itself
    assert out["max_burst"][0] == 2


def test_stratified_split_budget_and_membership(ray_session,
                                                tmp_path):
    """n_val sums to exactly tot // 10 and the checksum matches a
    brute-force recomputation of the smallest-hash members."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "strat")
    os.makedirs(d, exist_ok=True)
    n = 97
    langs = [("en", "de", "fr")[i % 3] for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x"] * n),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(np.ones(n, np.int64))}),
        os.path.join(d, "documents.parquet"))
    out = REGISTRY["stratified_split_exact_counts"][0](d)
    assert out["n_val"].sum() == n // 10
    # brute-force membership per lang
    h = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)
    for r in out.itertuples():
        ids = np.array([i for i in range(n)
                        if langs[i] == r.lang], np.int64)
        key = sorted(zip(h[ids].astype(np.int64), ids))
        expect = sum(i for _, i in key[:r.n_val])
        assert r.val_id_sum == expect


def test_nearest_view_bands_bidirectional(ray_session, tmp_path):
    """A purchase 90s AFTER its nearest view when an older view sits
    10min before: the forward-nearest must win (band 1, not 2); a
    user with no views lands in band -1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0, t0 + 600 * s, t0 + 690 * s,   # u0: view, purchase, view
          t0 + 5 * s]                        # u1: purchase, no view
    types = ["view", "purchase", "view", "purchase"]
    d = str(tmp_path / "nv")
    _write_events(d, ts, [1.0] * 4, users=[0, 0, 0, 1], types=types)
    out = REGISTRY["nearest_view_gap_bands"][0](d)
    got = dict(zip(out["band"], out["n"]))
    # u0's purchase: backward view 600s away, forward 90s -> band 2?
    # 90s = 9e7us -> band 2 (60s <= gap < 600s)
    assert got == {-1: 1, 2: 1}


def test_sequence_anomaly_rare_path_ranks_first(ray_session,
                                                tmp_path):
    """A user walking a rare transition repeatedly scores the lowest
    mean log-likelihood."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts, types, users = [], [], []
    # 20 normal users: a->b->a->b... (common transitions)
    i = 0
    for u in range(20):
        for k in range(8):
            ts.append(t0 + i * s); i += 1
            types.append("a" if k % 2 == 0 else "b")
            users.append(u)
    # 1 anomalous user: a->a->a... where a->a is rare globally
    for k in range(8):
        ts.append(t0 + i * s); i += 1
        types.append("a")
        users.append(99)
    d = str(tmp_path / "anom")
    _write_events(d, ts, [1.0] * len(ts), users=users, types=types)
    out = REGISTRY["user_sequence_anomaly_topk"][0](d)
    assert out["user_id"].iloc[0] == 99


def test_wow_change_planted(ray_session, tmp_path):
    """Second week doubles the first -> wow_pct = 1.0 on every day of
    week two."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts = []
    for i in range(14):
        ts.extend([t0 + i * day] * (3 if i < 7 else 6))
    d = str(tmp_path / "wow")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["daily_wow_change"][0](d)
    assert len(out) == 7
    assert (out["wow_pct"] == 1.0).all()
    assert (out["y_prev_week"] == 3).all()


def test_type_share_sums_to_user_count(ray_session, tmp_path):
    """Per-user shares sum to 1, so share_sum across types equals the
    number of contributing users."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # u0: a=1, b=3 (shares .25/.75); u1: a=10 (share 1)
    d = str(tmp_path / "tshare")
    _write_events(d, [t0, t0 + s, t0 + 2 * s], [1.0, 3.0, 10.0],
                  users=[0, 0, 1], types=["a", "b", "a"])
    out = REGISTRY["type_share_of_user_total"][0](d)
    got = dict(zip(out["event_type"], out["share_sum"]))
    assert got == {"a": 1.25, "b": 0.75}


def test_ar1_constant_and_alternating(ray_session, tmp_path):
    """Constant series -> phi 0, forecast = mean; alternating series
    -> phi near -1 and the forecast flips to the other level."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    const = str(tmp_path / "arc")
    ts = []
    for i in range(10):
        ts.extend([t0 + i * day] * 4)
    _write_events(const, ts, [1.0] * len(ts))
    o = REGISTRY["ar1_daily_forecast"][0](const)
    assert o["phi"][0] == 0.0 and o["forecast"][0] == 4.0
    alt = str(tmp_path / "ara")
    ts2 = []
    for i in range(10):
        ts2.extend([t0 + i * day] * (2 if i % 2 == 0 else 8))
    _write_events(alt, ts2, [1.0] * len(ts2))
    o2 = REGISTRY["ar1_daily_forecast"][0](alt)
    assert o2["phi"][0] < -0.7
    # last day is high (8) -> forecast swings below the mean
    assert o2["forecast"][0] < o2["mean"][0]


def test_mktsegment_join_conservation(ray_session):
    """Every event's user exists in customer at the test SFs, so
    segment rollups conserve the event count."""
    import pyarrow.parquet as pq2

    from webalizer_ray.pipelines.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["event_value_by_mktsegment"][0](sf)
    n_events = pq2.read_metadata(sf + "/events.parquet").num_rows
    assert out["n_events"].sum() == n_events
    assert (out["n_users"] >= 1).all()


def test_hill_exact_pareto(ray_session, tmp_path):
    """Exact Pareto-ish data x_i proportional to 1/i: the Hill
    estimate over the top-100 of 150 users recovers alpha ~ 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 150
    # user i gets value 10000/ (i+1) -> tail index 1
    vals = [10000.0 / (i + 1) for i in range(n)]
    d = str(tmp_path / "hill")
    _write_events(d, [t0 + i * s for i in range(n)], vals,
                  users=list(range(n)))
    out = REGISTRY["hill_tail_index_user_value"][0](d)
    assert len(out) == 1
    assert 0.8 < out["alpha"][0] < 1.3


def test_hill_too_few_users_empty(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "hillfew")
    _write_events(d, [t0 + i * s for i in range(5)], [1.0] * 5,
                  users=list(range(5)))
    assert len(REGISTRY["hill_tail_index_user_value"][0](d)) == 0


def test_geometric_gof_exact_geometric(ray_session, tmp_path):
    """Session counts drawn exactly proportional to a geometric law
    fit with small chi2; a flat (uniform) distribution fits badly."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")

    def build(counts, name):
        # counts[k] = number of users with k+1 sessions; sessions are
        # events 1h apart (each its own session)
        ts, users = [], []
        u = 0
        for k0, cnt in enumerate(counts):
            for _ in range(cnt):
                for j in range(k0 + 1):
                    ts.append(t0 + j * h + u * s)
                    users.append(u)
                u += 1
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts), users=users)
        return d

    # geometric p=0.5: 64, 32, 16, 8, 4, 2, 1 users of 1..7 sessions
    geo = build([64, 32, 16, 8, 4, 2, 1], "geo")
    o = REGISTRY["geometric_gof_sessions_per_user"][0](geo)
    assert abs(o["p_hat"][0] - 0.5) < 0.02
    assert o["chi2"][0] < 3.0
    flat = build([20, 20, 20, 20, 20], "flat")
    o2 = REGISTRY["geometric_gof_sessions_per_user"][0](flat)
    assert o2["chi2"][0] > o["chi2"][0]


def test_poisson_mixture_recovers_two_rates(ray_session, tmp_path):
    """Counts that are exactly the factorial-moment image of a
    2/8-rate half-half mixture: Prony recovers the two rates from
    planted per-(user, day) counts."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    s = np.timedelta64(1, "s")
    ts, users = [], []
    # deterministic "Poisson-like" counts: half the user-days at 2,
    # half at 8 -> the fitted atoms must straddle [2, 8] with mean 5
    u = 0
    for cnt in ([2] * 30 + [8] * 30):
        for j in range(cnt):
            ts.append(t0 + (u % 10) * day + j * s)
            users.append(u)
        u += 1
    d = str(tmp_path / "pmix")
    _write_events(d, ts, [1.0] * len(ts), users=users)
    out = REGISTRY["poisson_mixture_user_day_counts"][0](d)
    assert out["m1"][0] == 5.0
    # point masses at 2 and 8 have zero within-component variance;
    # a Poisson mixture with the same first three factorial moments
    # pulls the atoms inside — they must straddle the mean
    assert out["lambda_lo"][0] < 5.0 < out["lambda_hi"][0]
    assert 0.0 < out["w_hi"][0] < 1.0


def test_cross_fact_profile_classes(ray_session, tmp_path):
    """Planted keys in one, other, and both facts classify exactly."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "xfact")
    # events users: 0 (both), 1 (events_only)
    _write_events(d, [t0, t0 + s], [1.0, 2.0], users=[0, 1])
    # orders custkeys: 0 (both), 2 (orders_only)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([0, 2], pa.int64()),
        "o_orderstatus": pa.array(["F", "O"]),
        "o_totalprice": pa.array([10.0, 20.0]),
        "o_orderdate": pa.array(
            np.array(["1995-01-01", "1995-01-02"],
                     dtype="datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"])}),
        os.path.join(d, "orders.parquet"))
    out = REGISTRY["user_cross_fact_profile"][0](d)
    got = {r.presence: r for r in out.itertuples()}
    assert got["both"].n_users == 1
    assert got["both"].event_cents == 100
    assert got["both"].order_cents == 1000
    assert got["events_only"].n_users == 1
    assert got["orders_only"].n_users == 1
    assert got["orders_only"].order_cents == 2000


def test_probe_percentiles_hand(ray_session, tmp_path):
    """Values 1..9 dollars: probe $5 -> below=4, at=1 -> pct 0.5."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "probe")
    _write_events(d, [t0 + i * s for i in range(9)],
                  [float(i + 1) for i in range(9)])
    out = REGISTRY["value_percentile_of_probes"][0](d)
    row = out[out["probe_cents"] == 500].iloc[0]
    assert (row.below, row.at_probe) == (4, 1)
    assert row.percentile == 0.5
    assert out[out["probe_cents"] == 10000].iloc[0].percentile == 1.0


def test_trimmed_mean_drops_tails(ray_session, tmp_path):
    """20 values: 18 at $5 plus $0.01 and $100 -> 10% trim (k=2)
    drops both extremes entirely... k=2 drops the two smallest and
    two largest ranks: 0.01, one 5, one 5, 100 -> kept 16 fives."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    vals = [0.01] + [5.0] * 18 + [100.0]
    d = str(tmp_path / "trim")
    _write_events(d, [t0 + i * s for i in range(20)], vals)
    out = REGISTRY["trimmed_mean_by_type"][0](d)
    r = out.iloc[0]
    assert r.k == 2 and r.n_kept == 16
    assert r.trimmed_mean == 500.0


def test_blomqvist_concordant_vs_discordant(ray_session, tmp_path):
    """Views and purchases high on the same days -> beta = 1;
    opposite days -> beta = -1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")

    def build(vc, pc, name):
        ts, types = [], []
        for i, (a, b) in enumerate(zip(vc, pc)):
            ts.extend([t0 + i * day] * (a + b))
            types.extend(["view"] * a + ["purchase"] * b)
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts), types=types)
        return d

    con = build([1, 2, 8, 9], [1, 2, 8, 9], "bbc")
    o = REGISTRY["blomqvist_beta_daily"][0](con)
    assert o["beta"][0] == 1.0
    dis = build([1, 2, 8, 9], [9, 8, 2, 1], "bbd")
    o2 = REGISTRY["blomqvist_beta_daily"][0](dis)
    assert o2["beta"][0] == -1.0


def test_record_days_monotone_series(ray_session, tmp_path):
    """Strictly rising series: every day is a record; falling series
    after day 1: only the first is."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")

    def build(counts, name):
        ts = []
        for i, c in enumerate(counts):
            ts.extend([t0 + i * day] * c)
        d = str(tmp_path / name)
        _write_events(d, ts, [1.0] * len(ts))
        return d

    up = build([1, 2, 3, 4, 5], "recup")
    o = REGISTRY["record_days_count"][0](up)
    assert o["n_records"][0] == 5
    assert o["last_record_day"][0] == int(
        (t0 + 4 * day).astype("datetime64[D]").astype(np.int64))
    down = build([5, 4, 3, 2, 1], "recdown")
    o2 = REGISTRY["record_days_count"][0](down)
    assert o2["n_records"][0] == 1


def test_weekly_churn_hand_case(ray_session, tmp_path):
    """u0 active weeks 0,1; u1 only week 0; u2 only week 1:
    week0: active 2, retained 1 (u0), churned 1 (u1);
    week1: active 2, new 1 (u2), no retained/churned (last week)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    wk = np.timedelta64(7, "D")
    ts = [t0, t0 + wk, t0, t0 + wk]
    users = [0, 0, 1, 2]
    d = str(tmp_path / "churn")
    _write_events(d, ts, [1.0] * 4, users=users)
    out = REGISTRY["weekly_churn_retention"][0](d)
    assert len(out) == 2
    w0, w1 = out.iloc[0], out.iloc[1]
    assert (w0.active, w0.retained, w0.churned, w0.new_users) \
        == (2, 1, 1, 0)
    assert (w1.active, w1.retained, w1.churned, w1.new_users) \
        == (2, 0, 0, 1)


def test_stickiness_daily_user_is_one(ray_session, tmp_path):
    """One user active every day within a 30-day span: DAU = MAU = 1
    -> stickiness 1.0 every day."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    d = str(tmp_path / "stick")
    _write_events(d, [t0 + i * day for i in range(10)], [1.0] * 10)
    out = REGISTRY["dau_mau_stickiness"][0](d)
    assert (out["stickiness"] == 1.0).all()
    # two users alternating days -> MAU 2, DAU 1 -> 0.5 after both
    d2 = str(tmp_path / "stick2")
    _write_events(d2, [t0 + i * day for i in range(10)], [1.0] * 10,
                  users=[i % 2 for i in range(10)])
    o2 = REGISTRY["dau_mau_stickiness"][0](d2)
    assert (o2["stickiness"].iloc[1:] == 0.5).all()
    assert o2["stickiness"].iloc[0] == 1.0


def test_cov_matrix_perfect_and_anti(ray_session, tmp_path):
    """Two types moving identically -> corr 1; anti-phase -> -1;
    diagonal corr is 1 when variance > 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, types = [], []
    av = [1, 2, 3, 4]
    bv = [2, 4, 6, 8]
    cv = [4, 3, 2, 1]
    for i in range(4):
        ts.extend([t0 + i * day] * av[i]); types.extend(["a"] * av[i])
        ts.extend([t0 + i * day] * bv[i]); types.extend(["b"] * bv[i])
        ts.extend([t0 + i * day] * cv[i]); types.extend(["c"] * cv[i])
    d = str(tmp_path / "cov")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["type_daily_cov_matrix"][0](d)
    got = {(r.type_a, r.type_b): r.corr for r in out.itertuples()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("a", "a")] == 1.0


def test_seasonal_anomaly_planted_spike(ray_session, tmp_path):
    """A weekly-periodic series with one spiked day: the spike day is
    the top residual anomaly."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    pattern = [5, 6, 7, 8, 7, 6, 5]
    ts = []
    for i in range(28):
        cnt = pattern[i % 7] + (30 if i == 17 else 0)
        ts.extend([t0 + i * day] * cnt)
    d = str(tmp_path / "sanom")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["seasonal_residual_anomalies"][0](d)
    assert out["epoch_day"].iloc[0] == int(
        (t0 + 17 * day).astype("datetime64[D]").astype(np.int64))
    assert out["residual"].iloc[0] > 20


def test_activity_span_hand(ray_session, tmp_path):
    """Type active on days {0, 2, 4}: span 5, coverage 0.6."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    d = str(tmp_path / "span")
    _write_events(d, [t0, t0 + 2 * day, t0 + 4 * day, t0 + 2 * day],
                  [1.0] * 4)
    out = REGISTRY["type_activity_span"][0](d)
    r = out.iloc[0]
    assert r.n_days == 3
    assert r.last_day - r.first_day == 4
    assert r.coverage == 0.6


def test_stump_split_planted_boundary(ray_session, tmp_path):
    """Purchases only in hours 0-5, views only in 6-11: the perfect
    split is cut = 5 with IG = H(0.5)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")
    ts, types = [], []
    for hour in range(12):
        for j in range(5):
            ts.append(t0 + hour * h + j * s)
            types.append("purchase" if hour < 6 else "view")
    d = str(tmp_path / "stump")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["purchase_rate_stump_split"][0](d)
    assert out["best_cut_hour"][0] == 5
    assert abs(out["info_gain"][0] - round(np.log(2), 6)) < 1e-9
    assert out["s_left"][0] == 30 and out["n_left"][0] == 30


def test_heaps_hand_counts(ray_session, tmp_path):
    """Known token/vocab/hapax counts per source; two sources with
    V = N^0.5 exactly give beta = 0.5."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "heaps")
    # source A: 4 tokens, 2 distinct (V=2=4^0.5);
    # source B: 16 tokens, 4 distinct (V=4=16^0.5)
    texts = ["a a b b", " ".join(["w", "x", "y", "z"] * 4)]
    _write_docs_min_local(d, texts, ["A", "B"])
    out = REGISTRY["heaps_law_sources"][0](d)
    rows = {r.source: r for r in out.itertuples()}
    assert (rows["A"].n_tokens, rows["A"].vocab,
            rows["A"].hapax) == (4, 2, 0)
    assert (rows["B"].n_tokens, rows["B"].vocab,
            rows["B"].hapax) == (16, 4, 0)
    assert out["heaps_beta"].iloc[0] == 0.5


def _write_docs_min_local(d, texts, sources):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     np.int64)),
    }), os.path.join(d, "documents.parquet"))


def test_lincoln_petersen_closed_population(ray_session, tmp_path):
    """If every user appears in both halves, N-hat equals the
    observed population exactly."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, users = [], []
    for u in range(6):
        ts.extend([t0, t0 + 10 * day])
        users.extend([u, u])
    d = str(tmp_path / "lp")
    _write_events(d, ts, [1.0] * len(ts), users=users)
    out = REGISTRY["lincoln_petersen_user_estimate"][0](d)
    assert out["n_hat"][0] == 6.0
    assert out["m"][0] == 6
    # partial overlap: n1=4 (0..3), n2=4 (2..5), m=2 -> N-hat=8
    ts2, users2 = [], []
    for u in range(4):
        ts2.append(t0); users2.append(u)
    for u in range(2, 6):
        ts2.append(t0 + 10 * day); users2.append(u)
    d2 = str(tmp_path / "lp2")
    _write_events(d2, ts2, [1.0] * len(ts2), users=users2)
    o2 = REGISTRY["lincoln_petersen_user_estimate"][0](d2)
    assert o2["n_hat"][0] == 8.0 and o2["observed"][0] == 6


def test_odds_ratio_planted_effect(ray_session, tmp_path):
    """Weekend purchase odds 4x weekday: OR = 4 and the CI excludes
    1 with enough data."""
    from webalizer_ray.pipelines.queries import REGISTRY

    sat = np.datetime64("2024-01-06T12:00:00", "us")  # Saturday
    mon = np.datetime64("2024-01-08T12:00:00", "us")  # Monday
    s = np.timedelta64(1, "s")
    ts, types = [], []
    # weekend: 80 purchases, 20 views -> odds 4
    for i in range(100):
        ts.append(sat + i * s)
        types.append("purchase" if i < 80 else "view")
    # weekday: 50/50 -> odds 1
    for i in range(100):
        ts.append(mon + i * s)
        types.append("purchase" if i < 50 else "view")
    d = str(tmp_path / "orr")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["weekend_purchase_odds_ratio"][0](d)
    assert out["odds_ratio"][0] == 4.0
    assert out["ci_lo"][0] > 1.0


def test_vmr_regular_vs_bursty(ray_session, tmp_path):
    """Constant daily counts -> VMR 0; one huge day among zeros ->
    VMR far above 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, types = [], []
    for i in range(10):
        ts.extend([t0 + i * day] * 4)
        types.extend(["steady"] * 4)
    ts.extend([t0] * 40)
    types.extend(["bursty"] * 40)
    d = str(tmp_path / "vmr")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["daily_vmr_by_type"][0](d)
    got = {r.event_type: r.vmr for r in out.itertuples()}
    assert got["steady"] == 0.0
    assert got["bursty"] > 10.0


def test_never_pairs_planted_wall(ray_session, tmp_path):
    """Types a and b co-occur; type c lives in its own sessions ->
    the never-pairs are (a, c) and (b, c)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    hr = np.timedelta64(2, "h")
    ts = [t0, t0 + s, t0 + hr, t0 + hr + s]
    types = ["a", "b", "c", "c"]
    d = str(tmp_path / "wall")
    _write_events(d, ts, [1.0] * 4, types=types)
    out = REGISTRY["session_type_never_pairs"][0](d)
    got = set(zip(out["type_a"], out["type_b"]))
    assert got == {("a", "c"), ("b", "c")}


def test_cross_fact_corr_perfect_line(ray_session, tmp_path):
    """Order cents exactly 3x event cents per user -> r = 1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "xcorr")
    _write_events(d, [t0 + i * s for i in range(4)],
                  [1.0, 2.0, 3.0, 4.0], users=[0, 1, 2, 3])
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array(range(4), pa.int64()),
        "o_orderstatus": pa.array(["F"] * 4),
        "o_totalprice": pa.array([3.0, 6.0, 9.0, 12.0]),
        "o_orderdate": pa.array(
            np.array(["1995-01-01"] * 4, dtype="datetime64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4)}),
        os.path.join(d, "orders.parquet"))
    out = REGISTRY["cross_fact_value_corr"][0](d)
    assert out["pearson_r"][0] == 1.0
    assert out["n"][0] == 4


def test_qq_slope_scaled_distribution(ray_session, tmp_path):
    """Purchases exactly 2x the view values -> every purchase decile
    doubles the view decile and the Q-Q slope is 2."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    vals = [float(i + 1) for i in range(50)]
    ts = [t0 + i * s for i in range(100)]
    d = str(tmp_path / "qq")
    _write_events(d, ts, vals + [2 * v for v in vals],
                  types=["view"] * 50 + ["purchase"] * 50)
    out = REGISTRY["qq_slope_view_purchase"][0](d)
    assert (out["purchase_q"] == 2 * out["view_q"]).all()
    assert out["qq_slope"].iloc[0] == 2.0


def test_circadian_concentrated_vs_spread(ray_session, tmp_path):
    """All events at exactly 06:00 -> R = 1 and mean hour 6; events
    at two opposite hours -> R = 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T06:00:00", "us")
    day = np.timedelta64(1, "D")
    conc = str(tmp_path / "circ1")
    _write_events(conc, [t0 + i * day for i in range(8)], [1.0] * 8)
    o = REGISTRY["circadian_concentration"][0](conc)
    assert o["r_global"][0] == 1.0
    assert o["mean_hour"][0] == 6.0
    assert o["mean_user_r"][0] == 1.0
    # 06:00 and 18:00 are antipodal on the clock circle
    spread = str(tmp_path / "circ2")
    ts = [t0 + i * day for i in range(4)] \
        + [t0 + np.timedelta64(12, "h") + i * day for i in range(4)]
    _write_events(spread, ts, [1.0] * 8)
    o2 = REGISTRY["circadian_concentration"][0](spread)
    assert abs(o2["r_global"][0]) < 1e-9


def test_exp_growth_exact_doubling(ray_session, tmp_path):
    """Counts 1,2,4,8,16 -> growth rate exactly ln 2, doubling time
    exactly 1 day."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts = []
    for i, c in enumerate([1, 2, 4, 8, 16]):
        ts.extend([t0 + i * day] * c)
    d = str(tmp_path / "expg")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["exp_growth_fit_daily"][0](d)
    assert abs(out["daily_growth_rate"][0] - round(np.log(2), 6)) \
        < 1e-9
    assert out["doubling_days"][0] == 1.0


def test_log2_bands_exact_powers(ray_session, tmp_path):
    """Exact powers of two land in their own band (the float-log
    failure mode this operator avoids): $1.28 -> band 7, $2.56 ->
    band 8; $0.00 -> band -1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    d = str(tmp_path / "l2")
    _write_events(d, [t0 + i * s for i in range(4)],
                  [1.28, 2.56, 2.55, 0.0])
    out = REGISTRY["log2_value_histogram"][0](d)
    got = dict(zip(out["band"], out["n"]))
    assert got == {-1: 1, 7: 2, 8: 1}


def test_modal_hour_share_extremes(ray_session, tmp_path):
    """One-ritual-hour user -> share 1; a user spread over 4 hours
    evenly -> 0.25; mean = 0.625."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T09:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(4)]            # u0 all hour 9
    ts += [t0 + (i % 4) * h + i * s for i in range(4)]   # u1 spread
    d = str(tmp_path / "modal")
    _write_events(d, ts, [1.0] * 8, users=[0] * 4 + [1] * 4)
    out = REGISTRY["modal_hour_share_mean"][0](d)
    assert out["n_users"][0] == 2
    assert out["mean_modal_share"][0] == 0.625


def test_session_size_hist_hand(ray_session, tmp_path):
    """u0: one 3-event session + one singleton; u1: one 2-event
    session -> histogram {1:1, 2:1, 3:1}."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    hr = np.timedelta64(2, "h")
    ts = [t0, t0 + m, t0 + 2 * m, t0 + hr,
          t0 + 5 * m, t0 + 6 * m]
    d = str(tmp_path / "ssh")
    _write_events(d, ts, [1.0] * 6, users=[0, 0, 0, 0, 1, 1])
    out = REGISTRY["session_size_hist"][0](d)
    got = dict(zip(out["session_events"], out["sessions"]))
    assert got == {1: 1, 2: 1, 3: 1}


def test_duplicate_event_groups_planted(ray_session, tmp_path):
    """Three rows sharing (user, type, ts) plus two unique rows:
    1 dup group, 2 extras, worst 3."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0, t0, t0, t0 + s, t0 + 2 * s]
    d = str(tmp_path / "dupg")
    _write_events(d, ts, [1.0] * 5)
    out = REGISTRY["duplicate_event_groups"][0](d)
    r = out.iloc[0]
    assert (r.n_groups, r.dup_groups, r.extra_rows, r.worst_group) \
        == (3, 1, 2, 3)


def test_constant_columns_audit_shapes(ray_session):
    """NDV never exceeds rows; key columns are unique; every audited
    column appears."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["constant_columns_audit"][0](
        "/root/testdata/sf0.001")
    assert len(out) == 12
    assert (out["ndv"] <= out["n_rows"]).all()
    keys = out[out["col"].isin(["event_id", "o_orderkey",
                                "c_custkey"])]
    assert (keys["ndv"] == keys["n_rows"]).all()


def test_peak_60s_planted_burst(ray_session, tmp_path):
    """A 10-event burst inside one minute dominates a sparse
    background; window crossing a minute-bucket boundary still
    counts (context replication)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:30", "us")  # straddles
    s = np.timedelta64(1, "s")
    hr = np.timedelta64(1, "h")
    ts = [t0 + i * 5 * s for i in range(10)]   # 00:00:30..00:01:15
    ts += [t0 + 3 * hr, t0 + 5 * hr]
    d = str(tmp_path / "burst")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["peak_events_60s"][0](d)
    assert out["peak_count"][0] == 10
    assert out["window_end_us"][0] == int(
        (t0 + 45 * s).astype("datetime64[us]").astype(np.int64))


def test_longest_gap_cross_bucket(ray_session, tmp_path):
    """The longest silence spans several hour buckets: the seam
    stitch must find it."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    hr = np.timedelta64(1, "h")
    ts = [t0, t0 + 10 * m, t0 + 5 * hr, t0 + 5 * hr + 30 * m]
    d = str(tmp_path / "quiet")
    _write_events(d, ts, [1.0] * 4)
    out = REGISTRY["longest_quiet_gap"][0](d)
    assert out["gap_us"][0] == int(
        (5 * hr - 10 * m) / np.timedelta64(1, "us"))
    assert out["start_us"][0] == int(
        (t0 + 10 * m).astype("datetime64[us]").astype(np.int64))


def test_last_digit_uniform_vs_nines(ray_session, tmp_path):
    """Uniform last digits -> chi2 = 0; everything ending .x9 ->
    chi2 = 9n/... large."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    uni = str(tmp_path / "lduni")
    _write_events(uni, [t0 + i * s for i in range(20)],
                  [(100 + i % 10) / 100 for i in range(20)])
    o = REGISTRY["cents_last_digit_chi2"][0](uni)
    assert o["chi2"].iloc[0] == 0.0
    nines = str(tmp_path / "ld9")
    _write_events(nines, [t0 + i * s for i in range(20)],
                  [1.99] * 20)
    o2 = REGISTRY["cents_last_digit_chi2"][0](nines)
    # all mass on digit 9: chi2 = sum over 10 cells; observed cells
    # with 0 count don't appear in the histogram but the oracle only
    # sums observed rows too -> chi2 = (20-2)^2/2 = 162
    assert o2["chi2"].iloc[0] == 162.0


def test_reach_ratio_hand(ray_session, tmp_path):
    """Type a: 2 users x 3 events; type b: 1 user x 1 event; 2 users
    total -> penetration 1.0 / 0.5, intensity 3 / 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(7)]
    users = [0, 0, 0, 1, 1, 1, 1]
    types = ["a"] * 6 + ["b"]
    d = str(tmp_path / "reach")
    _write_events(d, ts, [1.0] * 7, users=users, types=types)
    out = REGISTRY["type_reach_ratio"][0](d)
    rows = {r.event_type: r for r in out.itertuples()}
    assert rows["a"].reach == 2 and rows["a"].penetration == 1.0
    assert rows["a"].events_per_user == 3.0
    assert rows["b"].penetration == 0.5


def test_purchase_frequency_repeat_rate(ray_session, tmp_path):
    """3 one-time buyers + 1 three-time buyer -> repeat rate 0.25."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts, users = [], []
    for u in range(3):
        ts.append(t0 + u * s); users.append(u)
    for j in range(3):
        ts.append(t0 + (10 + j) * s); users.append(9)
    d = str(tmp_path / "freq")
    _write_events(d, ts, [1.0] * 6, users=users,
                  types=["purchase"] * 6)
    out = REGISTRY["purchase_frequency_dist"][0](d)
    got = dict(zip(out["purchases"], out["users"]))
    assert got == {1: 3, 3: 1}
    assert out["repeat_rate"].iloc[0] == 0.25


def test_hill_diversity_uniform_vs_skewed(ray_session, tmp_path):
    """Four equal types -> q0 = q1 = q2 = 4; one dominant type pulls
    q2 below q1 below q0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    eq = str(tmp_path / "hilleq")
    _write_events(eq, [t0 + i * s for i in range(8)], [1.0] * 8,
                  types=["a", "b", "c", "d"] * 2)
    o = REGISTRY["hill_diversity_types"][0](eq)
    assert o["q0"][0] == 4
    assert o["q1_exp_shannon"][0] == 4.0
    assert o["q2_inv_simpson"][0] == 4.0
    sk = str(tmp_path / "hillsk")
    _write_events(sk, [t0 + i * s for i in range(10)], [1.0] * 10,
                  types=["a"] * 7 + ["b", "c", "d"])
    o2 = REGISTRY["hill_diversity_types"][0](sk)
    assert o2["q0"][0] == 4
    assert o2["q2_inv_simpson"][0] < o2["q1_exp_shannon"][0] < 4.0


def test_tenure_hazard_censoring(ray_session, tmp_path):
    """Users still active in the last observed week are censored:
    a cohort that never stops shows hazard 0 at every tenure."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    wk = np.timedelta64(7, "D")
    ts, users = [], []
    for u in range(4):
        for w in range(4):
            ts.append(t0 + w * wk)
            users.append(u)
    d = str(tmp_path / "haz0")
    _write_events(d, ts, [1.0] * len(ts), users=users)
    out = REGISTRY["tenure_churn_hazard"][0](d)
    assert (out["hazard"] == 0.0).all()
    # one user stops after week 0 while others continue -> hazard at
    # tenure 0 = 1/5
    ts.append(t0)
    users.append(99)
    d2 = str(tmp_path / "haz1")
    _write_events(d2, ts, [1.0] * len(ts), users=users)
    o2 = REGISTRY["tenure_churn_hazard"][0](d2)
    assert o2[o2["tenure_weeks"] == 0]["hazard"].iloc[0] == 0.2


def test_youden_perfect_separation(ray_session, tmp_path):
    """Purchases all above $5, others all below: the best cut sits at
    the top of the negatives and J = 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    vals = [1.0, 2.0, 3.0, 8.0, 9.0, 10.0]
    types = ["view"] * 3 + ["purchase"] * 3
    d = str(tmp_path / "youden")
    _write_events(d, [t0 + i * s for i in range(6)], vals,
                  types=types)
    out = REGISTRY["youden_threshold_value"][0](d)
    r = out.iloc[0]
    assert r.best_cut_cents == 300
    assert (r.tp, r.fp, r.fn, r.tn) == (3, 0, 0, 3)
    assert r.youden_j == 1.0


def test_ltv_auc_heavy_buyers_spend_more(ray_session, tmp_path):
    """Users with above-average purchase counts all out-spend the
    rest -> AUC = 1; reversing the spend flips it to 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts, users, types, vals = [], [], [], []
    i = 0
    # users 0,1: three purchases each, high value; users 2,3: one
    # view each, low value -> avg pc = 1.5, buyers = {0, 1}
    for u in (0, 1):
        for _ in range(3):
            ts.append(t0 + i * s); i += 1
            users.append(u); types.append("purchase")
            vals.append(50.0)
    for u in (2, 3):
        ts.append(t0 + i * s); i += 1
        users.append(u); types.append("view"); vals.append(1.0)
    d = str(tmp_path / "ltvauc")
    _write_events(d, ts, vals, users=users, types=types)
    out = REGISTRY["ltv_targeting_auc"][0](d)
    assert (out["buyers"][0], out["others"][0]) == (2, 2)
    assert out["auc"][0] == 1.0


def test_daily_return_prob_extremes(ray_session, tmp_path):
    """A user active every day -> 1.0; a user active on alternating
    days -> 0.0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    every = str(tmp_path / "ret1")
    _write_events(every, [t0 + i * day for i in range(5)], [1.0] * 5)
    o = REGISTRY["daily_return_probability"][0](every)
    assert o["return_prob"][0] == 1.0 and o["active_days"][0] == 4
    alt = str(tmp_path / "ret0")
    _write_events(alt, [t0 + 2 * i * day for i in range(5)],
                  [1.0] * 5)
    o2 = REGISTRY["daily_return_probability"][0](alt)
    assert o2["return_prob"][0] == 0.0


def test_type_hour_entropy_cron_vs_spread(ray_session, tmp_path):
    """A single-hour type -> 0 bits, 1 effective hour; a type spread
    over 4 hours evenly -> 2 bits, 4 effective hours."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T03:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(4)]
    ts += [t0 + (i % 4) * h + i * s for i in range(8)]
    types = ["cron"] * 4 + ["spread"] * 8
    d = str(tmp_path / "thent")
    _write_events(d, ts, [1.0] * 12, types=types)
    out = REGISTRY["type_hour_entropy"][0](d)
    rows = {r.event_type: r for r in out.itertuples()}
    assert rows["cron"].hour_entropy_bits == 0.0
    assert rows["cron"].effective_hours == 1.0
    assert rows["spread"].hour_entropy_bits == 2.0
    assert rows["spread"].effective_hours == 4.0


def test_inter_purchase_gaps_hand(ray_session, tmp_path):
    """u0 purchases at 0, 60s, 180s (gaps 60, 120); u1 at 0, 600s
    (gap 600): p50 = 120 (2cum>=3 at the 2nd of 3), max 600."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0, t0 + 60 * s, t0 + 180 * s, t0, t0 + 600 * s]
    users = [0, 0, 0, 1, 1]
    d = str(tmp_path / "ipg")
    _write_events(d, ts, [1.0] * 5, users=users,
                  types=["purchase"] * 5)
    out = REGISTRY["inter_purchase_gap_quantiles"][0](d)
    r = out.iloc[0]
    assert (r.n_gaps, r.min_s, r.max_s) == (3, 60, 600)
    assert r.p50_s == 120


def test_rle_monotonous_vs_alternating(ray_session, tmp_path):
    """All-same sequence -> ratio 1/n; perfect alternation -> 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    mono = str(tmp_path / "rlem")
    _write_events(mono, [t0 + i * s for i in range(8)], [1.0] * 8,
                  types=["a"] * 8)
    o = REGISTRY["type_rle_compression_mean"][0](mono)
    assert o["mean_rle_ratio"][0] == 0.125
    alt = str(tmp_path / "rlea")
    _write_events(alt, [t0 + i * s for i in range(8)], [1.0] * 8,
                  types=["a", "b"] * 4)
    o2 = REGISTRY["type_rle_compression_mean"][0](alt)
    assert o2["mean_rle_ratio"][0] == 1.0


def test_share_shift_planted_swing(ray_session, tmp_path):
    """Type a dominates week 1, type b week 2 -> opposite deltas of
    equal magnitude."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    wk = np.timedelta64(7, "D")
    ts, types = [], []
    for g, cnt in (("a", 8), ("b", 2)):
        ts.extend([t0] * cnt); types.extend([g] * cnt)
    for g, cnt in (("a", 2), ("b", 8)):
        ts.extend([t0 + wk] * cnt); types.extend([g] * cnt)
    d = str(tmp_path / "shift")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["type_share_shift_wow"][0](d)
    got = {r.event_type: r.delta for r in out.itertuples()}
    assert got["a"] == -0.6 and got["b"] == 0.6


def test_gini_by_type_equal_vs_concentrated(ray_session, tmp_path):
    """Equal values -> Gini 0; one value dominating -> Gini near
    (n-1)/n."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(8)]
    d = str(tmp_path / "ginit")
    _write_events(d, ts, [5.0] * 4 + [0.0, 0.0, 0.0, 40.0],
                  types=["eq"] * 4 + ["conc"] * 4)
    out = REGISTRY["value_gini_by_type"][0](d)
    got = {r.event_type: r.gini for r in out.itertuples()}
    assert got["eq"] == 0.0
    assert got["conc"] == 0.75   # (n-1)/n with all mass on one of 4


def test_zipf_slope_exact_power_law(ray_session, tmp_path):
    """Counts proportional to 1/rank give slope exactly -1 on the
    log-log fit (integer counts chosen as exact multiples)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts, users = [], []
    i = 0
    # user u gets 840/(u+1) events for u=0..7 (840 = lcm denominator)
    for u in range(8):
        for _ in range(840 // (u + 1)):
            ts.append(t0 + i * s); i += 1
            users.append(u)
    d = str(tmp_path / "zipfu")
    _write_events(d, ts, [1.0] * len(ts), users=users)
    out = REGISTRY["user_activity_zipf_slope"][0](d)
    assert abs(out["zipf_slope"][0] + 1.0) < 1e-6


def test_orders_anova_separated_groups(ray_session, tmp_path):
    """Two priorities with disjoint value levels -> F large; equal
    distributions -> F = 0 (between = 0)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    def write(prices, prios, name):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        n = len(prices)
        pq.write_table(pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array([0] * n, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_totalprice": pa.array(prices),
            "o_orderdate": pa.array(
                np.array(["1995-01-01"] * n, dtype="datetime64[us]"),
                pa.timestamp("us")),
            "o_orderpriority": pa.array(prios)}),
            os.path.join(d, "orders.parquet"))
        return d

    sep = write([10.0, 11.0, 10.0, 11.0, 100.0, 101.0, 100.0, 101.0],
                ["1-URGENT"] * 4 + ["5-LOW"] * 4, "anovasep")
    o = REGISTRY["orders_anova_by_priority"][0](sep)
    assert o["f"].iloc[0] > 100
    same = write([10.0, 20.0, 10.0, 20.0],
                 ["1-URGENT", "1-URGENT", "5-LOW", "5-LOW"],
                 "anovasame")
    o2 = REGISTRY["orders_anova_by_priority"][0](same)
    assert o2["f"].iloc[0] == 0.0


def test_quartile_mobility_perfect_persistence(ray_session,
                                               tmp_path):
    """Users keep their relative spend across halves -> all mass on
    the diagonal, immobility 1.0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    day = np.timedelta64(1, "D")
    ts, users, vals = [], [], []
    for u in range(8):
        for dd in (0, 10):
            ts.append(t0 + dd * day)
            users.append(u)
            vals.append(float((u + 1) * 10))
    d = str(tmp_path / "mob")
    _write_events(d, ts, vals, users=users)
    out = REGISTRY["ltv_quartile_mobility"][0](d)
    assert (out["q_first"] == out["q_second"]).all()
    assert out["immobility"].iloc[0] == 1.0
    assert out["n"].sum() == 8


def test_think_time_excludes_cross_session(ray_session, tmp_path):
    """Gaps of 60s and 120s inside a session count; the 2h gap to
    the next session does not; max is bounded below 1800."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    hr = np.timedelta64(2, "h")
    ts = [t0, t0 + 60 * s, t0 + 180 * s, t0 + hr, t0 + hr + 30 * s]
    d = str(tmp_path / "think")
    _write_events(d, ts, [1.0] * 5)
    out = REGISTRY["think_time_quantiles"][0](d)
    r = out.iloc[0]
    assert r.n_gaps == 3          # 60, 120, 30
    assert r.max_s == 120
    assert r.p50_s == 60


def test_conversion_ordinal_second_session_converts(ray_session,
                                                    tmp_path):
    """Every user converts only in session 2 -> rate 0 at ordinal 1,
    1.0 at ordinal 2."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    hr = np.timedelta64(2, "h")
    s = np.timedelta64(1, "s")
    ts, users, types = [], [], []
    for u in range(3):
        ts.append(t0 + u * s); users.append(u); types.append("view")
        ts.append(t0 + hr + u * s); users.append(u)
        types.append("purchase")
    d = str(tmp_path / "convo")
    _write_events(d, ts, [1.0] * len(ts), users=users, types=types)
    out = REGISTRY["conversion_by_session_ordinal"][0](d)
    got = {int(r.session_ordinal): r.conv_rate
           for r in out.itertuples()}
    assert got == {1: 0.0, 2: 1.0}


def test_session_value_quartiles_hand(ray_session, tmp_path):
    """Four sessions with totals 1, 2, 3, 100 dollars: p25 = 100c,
    p50 = 200c, p75 = 300c, max = 10000c."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    hr = np.timedelta64(2, "h")
    s = np.timedelta64(1, "s")
    ts, users, vals = [], [], []
    totals = [1.0, 2.0, 3.0, 100.0]
    for i, tot in enumerate(totals):
        # each session = two events summing to the total
        base = t0 + i * hr
        ts.extend([base, base + s])
        users.extend([0, 0])
        vals.extend([tot / 2, tot / 2])
    d = str(tmp_path / "svq")
    _write_events(d, ts, vals, users=users)
    out = REGISTRY["session_value_quantiles"][0](d)
    r = out.iloc[0]
    assert r.n_sessions == 4
    assert (r.p25_cents, r.p50_cents, r.p75_cents, r.max_cents) \
        == (100, 200, 300, 10000)


def test_first_session_share_mean_vs_pooled(ray_session, tmp_path):
    """A small user earning all value in session 1 and a whale
    earning none there: mean = 0.5, pooled ~ first/total dollars."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    hr = np.timedelta64(2, "h")
    s = np.timedelta64(1, "s")
    # u0: session1 $10, session2 $0 -> share 1
    # u1: session1 $0, session2 $90 -> share 0
    ts = [t0, t0 + hr, t0 + s, t0 + hr + s]
    users = [0, 0, 1, 1]
    vals = [10.0, 0.0, 0.0, 90.0]
    d = str(tmp_path / "fss")
    _write_events(d, ts, vals, users=users)
    out = REGISTRY["first_session_value_share"][0](d)
    assert out["mean_first_share"][0] == 0.5
    assert out["pooled_first_share"][0] == 0.1


def test_first_event_type_tiebreak(ray_session, tmp_path):
    """Two events at the same timestamp: the smaller event_id wins
    (file order writes ids 0..n)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    d = str(tmp_path / "ftt")
    _write_events(d, [t0, t0], [1.0, 1.0], types=["a", "b"])
    out = REGISTRY["first_event_type_dist"][0](d)
    assert dict(zip(out["event_type"], out["users"])) == {"a": 1}


def test_residuals_planted_hot_cell(ray_session, tmp_path):
    """One type concentrated at one hour against a uniform
    background: that cell tops the residual list with a positive
    residual."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    s = np.timedelta64(1, "s")
    ts, types = [], []
    i = 0
    for hour in range(6):
        for _ in range(5):
            ts.append(t0 + hour * h + i * s); i += 1
            types.append("bg")
    for _ in range(20):
        ts.append(t0 + 3 * h + i * s); i += 1
        types.append("spike")
    d = str(tmp_path / "resid")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["type_hour_residuals_topk"][0](d)
    top = out.iloc[0]
    assert (top.event_type, top.hour) == ("spike", 3)
    assert top.std_residual > 3


def test_lag1_corr_repeating_vs_alternating(ray_session, tmp_path):
    """A user repeating the same two values in order v,v,w,w,v,v...
    -> positive lag-1; strict alternation v,w,v,w -> negative."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rep = str(tmp_path / "lagrep")
    vals = ([1.0] * 4 + [9.0] * 4) * 2   # long runs -> same-pairs
    # dominate (the 2-2 pattern has HALF its pairs cross-level and
    # lag-1 ~ 0, not positive)
    _write_events(rep, [t0 + i * s for i in range(len(vals))], vals)
    o = REGISTRY["value_lag1_corr_within_user"][0](rep)
    assert o["lag1_r"][0] > 0.3
    alt = str(tmp_path / "lagalt")
    vals2 = [1.0, 9.0] * 8
    _write_events(alt, [t0 + i * s for i in range(len(vals2))],
                  vals2)
    o2 = REGISTRY["value_lag1_corr_within_user"][0](alt)
    assert o2["lag1_r"][0] < -0.9


def test_daily_median_robust_to_whale(ray_session, tmp_path):
    """A single $1000 whale event doesn't move its day's median."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    s = np.timedelta64(1, "s")
    day = np.timedelta64(1, "D")
    ts = [t0 + i * s for i in range(5)] \
        + [t0 + day + i * s for i in range(5)]
    vals = [5.0] * 5 + [5.0, 5.0, 5.0, 5.0, 1000.0]
    d = str(tmp_path / "dms")
    _write_events(d, ts, vals)
    out = REGISTRY["daily_median_value_series"][0](d)
    assert (out["median_cents"] == 500).all()


def test_single_type_share_hand(ray_session, tmp_path):
    """2 of 4 users emit only one type -> share 0.5."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0 + i * s for i in range(8)]
    users = [0, 0, 1, 1, 2, 2, 3, 3]
    types = ["a", "a", "b", "b", "a", "b", "b", "a"]
    d = str(tmp_path / "mono")
    _write_events(d, ts, [1.0] * 8, users=users, types=types)
    out = REGISTRY["single_type_user_share"][0](d)
    r = out.iloc[0]
    assert (r.n_users, r.single_type_users, r.their_events) \
        == (4, 2, 4)
    assert r.share == 0.5


def test_signature_time_planted(ray_session, tmp_path):
    """Type concentrated at Monday 09:00 signs there; tie between
    two cells resolves to the smaller (dow, hour)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    mon9 = np.datetime64("2024-01-01T09:00:00", "us")  # Monday
    s = np.timedelta64(1, "s")
    hr = np.timedelta64(1, "h")
    ts = [mon9 + i * s for i in range(5)]
    ts += [mon9 + 3 * hr, mon9 + 5 * hr]
    d = str(tmp_path / "sig")
    _write_events(d, ts, [1.0] * len(ts))
    out = REGISTRY["type_signature_time"][0](d)
    r = out.iloc[0]
    assert (int(r.dow), int(r.hour), int(r.n)) == (1, 9, 5)


def test_value_by_position_hand(ray_session, tmp_path):
    """3-event session ($1, $2, $4) + singleton ($8): first=1, mid=2,
    last=4, only=8."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    hr = np.timedelta64(2, "h")
    ts = [t0, t0 + m, t0 + 2 * m, t0 + hr]
    d = str(tmp_path / "vpos")
    _write_events(d, ts, [1.0, 2.0, 4.0, 8.0])
    out = REGISTRY["value_by_session_position"][0](d)
    got = {r.pos: (r.n, r.cents) for r in out.itertuples()}
    assert got == {"first": (1, 100), "middle": (1, 200),
                   "last": (1, 400), "only": (1, 800)}


def test_top1pct_share_planted(ray_session, tmp_path):
    """100 events of $1 plus nothing else: top 1% = 1 event holds
    exactly 1/100 of value; adding one $99 whale makes the top 1%
    (k=1, the whale) hold 99/199."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    flat = str(tmp_path / "tp1f")
    _write_events(flat, [t0 + i * s for i in range(100)],
                  [1.0] * 100)
    o = REGISTRY["event_value_top1pct_share"][0](flat)
    assert o["k_events"][0] == 1 and o["top1pct_share"][0] == 0.01
    whale = str(tmp_path / "tp1w")
    _write_events(whale, [t0 + i * s for i in range(101)],
                  [1.0] * 100 + [99.0])
    o2 = REGISTRY["event_value_top1pct_share"][0](whale)
    assert abs(o2["top1pct_share"][0] - round(99 / 199, 6)) < 1e-12


def test_markov_removal_attribution_planted(ray_session, tmp_path):
    """Planted journeys: view->purchase x2, click->purchase x1,
    view->end x1, click->end x1. Base conv = 3/5*2/3 + 2/5*1/2 = 0.6;
    removing view leaves 0.2 (RE=2/3), removing click leaves 0.4
    (RE=1/3); shares normalize to 2/3 and 1/3."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    gap = np.timedelta64(3600, "s")
    seqs = [["view", "purchase"], ["view", "purchase"],
            ["click", "purchase"], ["view"], ["click"]]
    ts, types = [], []
    cur = t0
    for seq in seqs:
        for i, e in enumerate(seq):
            ts.append(cur + i * s)
            types.append(e)
        cur = cur + gap
    d = str(tmp_path / "attr")
    _write_events(d, ts, [1.0] * len(ts), types=types)
    out = REGISTRY["markov_removal_attribution"][0](d)
    got_re = dict(zip(out["channel"], out["removal_effect"]))
    got_sh = dict(zip(out["channel"], out["attribution_share"]))
    assert set(out["channel"]) == {"view", "click"}
    assert abs(got_re["view"] - 2 / 3) < 1e-6
    assert abs(got_re["click"] - 1 / 3) < 1e-6
    assert abs(got_sh["view"] - 2 / 3) < 1e-6
    assert abs(got_sh["click"] - 1 / 3) < 1e-6
