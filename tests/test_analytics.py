"""Co-occurrence pairs, decile lift and rank-sum AUC: planted-value
tests + invariants (oracle parity runs in tools/check_oracle.py)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(d, ts_list, users, types, values=None):
    os.makedirs(d, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(ts_list, dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(np.array(users, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n) if values is None
                          else np.asarray(values, np.float64)),
        "props": pa.array(["{}"] * n)}),
        os.path.join(d, "events.parquet"))


def test_pairs_only_within_sessions(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    # user 1: {a,b} in one session, then {a,c} after a 2h gap;
    # b and c never share a session.
    ts = [t0, t0 + 5 * s, t0 + 7200 * s, t0 + 7205 * s]
    d = str(tmp_path / "pairs")
    _write_events(d, ts, [1, 1, 1, 1], ["a", "b", "a", "c"])
    out = REGISTRY["session_type_pairs"][0](d)
    got = {(r.type_a, r.type_b): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1}


def test_repeated_type_counts_once_per_session(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [t0, t0 + 1 * s, t0 + 2 * s, t0 + 3 * s]
    d = str(tmp_path / "dups")
    _write_events(d, ts, [1, 1, 1, 1], ["a", "a", "b", "b"])
    out = REGISTRY["session_type_pairs"][0](d)
    assert out["support"].tolist() == [1]  # (a,b) once, not 4x


def test_decile_lift_partitions_users(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["user_value_decile_lift"][0](SF)
    users = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert out["decile"].tolist() == list(range(1, 11))
    assert out["users"].sum() == users["user_id"].nunique()
    assert (out["buyers"] <= out["users"]).all()
    expect = np.round(out["buyers"] / out["users"], 6)
    assert np.allclose(out["buyer_rate"], expect, atol=1e-9)


def test_auc_extremes(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    n = 40
    ts = [t0 + i * s for i in range(n)]
    users = list(range(n))
    # perfect separation: purchases hold the top half of value
    types = ["view"] * (n // 2) + ["purchase"] * (n // 2)
    values = list(range(n))
    d1 = str(tmp_path / "perfect")
    _write_events(d1, ts, users, types, values)
    assert REGISTRY["auc_value_purchase"][0](d1)["auc"].iloc[0] == 1.0

    d2 = str(tmp_path / "inverted")
    _write_events(d2, ts, users, types[::-1], values)
    assert REGISTRY["auc_value_purchase"][0](d2)["auc"].iloc[0] == 0.0


def test_label_centroids_match_numpy(ray_session):
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["label_centroids"][0](SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    for lab, grp in emb.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        want = m.mean(axis=0)
        got = out[out["label"] == lab].sort_values("dim")["centroid"] \
            .to_numpy()
        assert np.allclose(got, np.round(want, 6), atol=1e-6)


def test_corr_and_ols_on_planted_line(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86400, "s")
    n = 50
    ts = [t0 + i * day for i in range(n)]
    x_days = np.arange(n, dtype=np.float64)
    values = 2.0 * x_days + 3.0          # exact line
    d = str(tmp_path / "line")
    _write_events(d, ts, list(range(n)), ["view"] * n, values)

    ols = REGISTRY["value_trend_ols"][0](d)
    assert abs(ols["slope"].iloc[0] - 2.0) < 1e-6
    assert abs(ols["intercept"].iloc[0] - 3.0) < 1e-6

    # value is a strictly increasing function of ts but not of hour;
    # plant an hour-aligned line for the corr check instead
    ts2 = [t0 + np.timedelta64(h, "h") for h in range(20)]
    vals2 = np.arange(20, dtype=np.float64) * 1.5 + 1
    d2 = str(tmp_path / "hline")
    _write_events(d2, ts2, list(range(20)), ["view"] * 20, vals2)
    corr = REGISTRY["hour_value_corr"][0](d2)
    assert abs(corr["corr"].iloc[0] - 1.0) < 1e-6


def test_snapshot_diff_all_statuses(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    a = np.datetime64("2024-01-05T00:00:00", "us")   # period A
    b = np.datetime64("2024-01-20T00:00:00", "us")   # period B
    # user 1: only A (removed) · user 2: only B (added)
    # user 3: both, same value (unchanged) · user 4: both, differs
    ts = [a, b, a, b, a, b]
    users = [1, 2, 3, 3, 4, 4]
    values = [1.0, 2.0, 5.0, 5.0, 1.0, 9.0]
    d = str(tmp_path / "snap")
    _write_events(d, ts, users, ["view"] * 6, values)
    out = REGISTRY["snapshot_diff_users"][0](d)
    got = dict(zip(out["status"], out["n"]))
    assert got == {"added": 1, "removed": 1, "unchanged": 1, "changed": 1}


def test_centroid_confusion_perfect_on_planted_blobs(ray_session,
                                                     tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    rng = np.random.default_rng(4)
    centers = np.eye(3, 8) * 10.0          # well-separated directions
    vecs, labels = [], []
    for lab in range(3):
        pts = centers[lab] + rng.normal(scale=0.05, size=(30, 8))
        vecs.extend(pts.astype(np.float32))
        labels.extend([lab] * 30)
    d = str(tmp_path / "blobs")
    os.makedirs(d)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(90, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.array(labels, np.int32))}),
        os.path.join(d, "embeddings.parquet"))

    out = REGISTRY["centroid_confusion"][0](d)
    offdiag = out[out["true_label"] != out["pred_label"]]["n"].sum()
    assert offdiag == 0
    assert out["n"].sum() == 90


def test_periodicity_detects_planted_24h_cycle(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rng = np.random.default_rng(6)
    ts = []
    # 20 days; events per hour follow a 24 h sinusoid (2..18 events)
    for h in range(20 * 24):
        lam = 10 + 8 * np.sin(2 * np.pi * h / 24.0)
        k = max(int(round(lam)), 0)
        for j in range(k):
            ts.append(t0 + np.timedelta64(h * 3600 + int(j * 60), "s"))
    n = len(ts)
    d = str(tmp_path / "daily")
    _write_events(d, ts, list(range(n)), ["view"] * n,
                  np.ones(n))
    out = REGISTRY["event_periodicity"][0](d)
    assert abs(out["dominant_period_hours"].iloc[0] - 24.0) < 1.3
    assert out["power_share"].iloc[0] > 0.5
    assert out["series_hours"].iloc[0] == 20 * 24


def test_periodicity_flat_series_low_share(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [t0 + np.timedelta64(h * 3600, "s") for h in range(240)]
    d = str(tmp_path / "flat")
    _write_events(d, ts, list(range(240)), ["view"] * 240,
                  np.ones(240))
    out = REGISTRY["event_periodicity"][0](d)
    # constant 1/hour: no periodic structure above noise
    assert out["power_share"].iloc[0] < 0.2


def test_mi_zero_for_independent_and_positive_for_coupled(ray_session,
                                                          tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    # coupled: type 'a' only at hour 1, 'b' only at hour 13
    ts, types = [], []
    for d in range(10):
        ts.append(t0 + np.timedelta64(d * 86400 + 3600, "s"))
        types.append("a")
        ts.append(t0 + np.timedelta64(d * 86400 + 13 * 3600, "s"))
        types.append("b")
    dd = str(tmp_path / "coupled")
    _write_events(dd, ts, list(range(len(ts))), types)
    mi_c = REGISTRY["type_hour_mi"][0](dd)["mi"].iloc[0]
    assert abs(mi_c - np.log(2)) < 1e-6   # perfect 2x2 coupling

    # independent: both types at both hours equally
    ts2, types2 = [], []
    for d in range(10):
        for h in (1, 13):
            for ty in ("a", "b"):
                ts2.append(t0 + np.timedelta64(d * 86400 + h * 3600
                                               + (0 if ty == "a" else 60),
                                               "s"))
                types2.append(ty)
    d2 = str(tmp_path / "indep")
    _write_events(d2, ts2, list(range(len(ts2))), types2)
    mi_i = REGISTRY["type_hour_mi"][0](d2)["mi"].iloc[0]
    assert abs(mi_i) < 1e-9


def test_weighted_sample_bias_and_invariance(ray_session):
    """Heavier docs must be overrepresented, and the draw must not
    depend on block layout (mergeable top-k partials)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out1 = REGISTRY["weighted_sample_docs"][0](SF)
    out2 = REGISTRY["weighted_sample_docs"][0](SF)  # deterministic
    assert out1["doc_id"].tolist() == out2["doc_id"].tolist()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pop_mean = docs["text"].str.split().str.len().mean()
    assert out1["w"].mean() > pop_mean * 1.1


def test_attribution_window_boundaries(ray_session, tmp_path):
    """Window is (view_ts, view_ts + 1h]: a purchase exactly at +1h
    converts, at +1h+1µs does not, at the same instant does not."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-10T12:00:00", "us")
    h = np.timedelta64(3600, "s")
    us1 = np.timedelta64(1, "us")
    rows = [
        (t0, 1, "view"), (t0 + h, 1, "purchase"),            # converts
        (t0, 2, "view"), (t0 + h + us1, 2, "purchase"),      # too late
        (t0, 3, "view"), (t0, 3, "purchase"),                # same µs: no
        (t0, 4, "view"), (t0 + h, 5, "purchase"),            # other user
    ]
    ts = [r[0] for r in rows]
    users = [r[1] for r in rows]
    types = [r[2] for r in rows]
    d = str(tmp_path / "attr")
    _write_events(d, ts, users, types)
    out = REGISTRY["view_purchase_1h_conversion"][0](d)
    assert out["views"].iloc[0] == 4
    assert out["converted"].iloc[0] == 1


def test_islands_merge_overlaps_exactly(ray_session, tmp_path):
    """Three overlapping 5-min intervals merge into one island; a
    6-min gap starts a second; equal boundary (s == prev end) merges
    (window end is inclusive via s > prev_e)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60, "s")
    ts = [t0, t0 + 2 * m, t0 + 4 * m,       # chain: one island, 9 min
          t0 + 15 * m,                      # gap > 5 min: new island
          t0 + 20 * m]                      # s == prev end: merges
    d = str(tmp_path / "isl")
    _write_events(d, ts, [1] * 5, ["view"] * 5)
    out = REGISTRY["user_activity_islands"][0](d)
    assert out["islands"].iloc[0] == 2
    # island 1: 0..9 min = 540 s; island 2: 15..25 min = 600 s
    assert out["covered_s"].iloc[0] == 540 + 600


def test_wau_window_semantics(ray_session, tmp_path):
    """A user active on day 0 counts toward anchors 0..6 only; two
    active days in one window count once."""
    from webalizer_ray.pipelines.queries import REGISTRY

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86400, "s")
    # user 1 on days 0 and 2; user 2 on day 9 (out of user 1's reach:
    # day 2 supports anchors 2..8 only)
    ts = [t0, t0 + 2 * day, t0 + 9 * day]
    d = str(tmp_path / "wau")
    _write_events(d, ts, [1, 1, 2], ["view"] * 3)
    out = REGISTRY["weekly_active_users"][0](d)
    got = dict(zip(out["day"], out["wau"]))
    # anchors = observed days only (01, 03, 10); user 1's two active
    # days collapse to one inside each window
    assert got == {"2024-01-01": 1, "2024-01-03": 1, "2024-01-10": 1}


def test_compression_ratio_direction(ray_session, tmp_path):
    import pyarrow as _pa
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "cr")
    os.makedirs(d)
    texts = ["spam " * 400,                       # highly repetitive
             ("quite varied natural language keeps introducing novel "
              "vocabulary tokens steadily without obvious repetition "
              "patterns anywhere forever onward mixing rare words")]
    pq.write_table(_pa.table({
        "doc_id": np.array([0, 1], np.int64),
        "text": texts,
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": np.array([len(t) for t in texts], np.int64)}),
        os.path.join(d, "documents.parquet"))
    out = REGISTRY["compression_ratio_docs"][0](d)
    r = dict(zip(out["doc_id"], out["compression_ratio"]))
    assert r[0] < 0.1 < r[1]


# ---------------------------------------------------------------------------
# change-point detection (two-segment least squares)
# ---------------------------------------------------------------------------

def test_best_sse_split_recovers_planted_shift():
    from webalizer_ray.pipelines.queries import best_sse_split

    rng = np.random.default_rng(11)
    y = np.concatenate([rng.normal(100, 2, 40), rng.normal(180, 2, 25)])
    i, cost, mb, ma = best_sse_split(y)
    assert i == 40                      # exact boundary recovered
    assert abs(mb - 100) < 2 and abs(ma - 180) < 2


def test_best_sse_split_flat_series_tiebreaks_smallest_index():
    from webalizer_ray.pipelines.queries import best_sse_split

    i, cost, mb, ma = best_sse_split(np.full(10, 7.0))
    assert i == 1 and cost == 0.0 and mb == ma == 7.0


# ---------------------------------------------------------------------------
# peak concurrent sessions (+1/-1 interval sweep)
# ---------------------------------------------------------------------------

def test_peak_concurrency_touching_sessions_count(ray_session, tmp_path):
    """A session ENDING at t and another STARTING at t are concurrent
    (starts apply before ends), and a single-event session is live at
    its instant."""
    from webalizer_ray.pipelines.queries import peak_concurrent_sessions

    ts = pd.to_datetime([
        "2024-01-01 10:00:00", "2024-01-01 10:10:00",  # user 1 session
        "2024-01-01 10:10:00",                          # user 2 touches
        "2024-01-01 09:00:00",                          # user 3 alone
    ])
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": np.array([1, 1, 2, 3], np.int64),
        "event_type": ["view"] * 4,
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    df.to_parquet(d / "events.parquet", index=False)

    out = peak_concurrent_sessions(str(d))
    assert out["peak"].iloc[0] == 2
    assert out["peak_ts"].iloc[0] == "2024-01-01 10:10:00.000000"


def test_attribution_planted_credits(ray_session, tmp_path):
    """One purchase at 10:30 with views at 09:50 and 10:05 in its
    (09:30, 10:30] window and one view at 09:00 outside it: first
    touch -> hour 9, last touch -> hour 10, linear 0.5 each."""
    from webalizer_ray.pipelines.queries import attribution_by_hour

    ts = pd.to_datetime(["2024-01-01 09:00:00", "2024-01-01 09:50:00",
                         "2024-01-01 10:05:00", "2024-01-01 10:30:00"])
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": np.array([1, 1, 1, 1], np.int64),
        "event_type": ["view", "view", "view", "purchase"],
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    df.to_parquet(d / "events.parquet", index=False)

    out = attribution_by_hour(str(d)).set_index("hour")
    assert out.loc[9, "first_touch"] == 1 and out.loc[9, "last_touch"] == 0
    assert out.loc[10, "first_touch"] == 0 and out.loc[10, "last_touch"] == 1
    assert out.loc[9, "linear_credit"] == 0.5
    assert out.loc[10, "linear_credit"] == 0.5
    assert 8 not in out.index  # the 09:00 view got no credit
