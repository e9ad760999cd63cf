"""CLI (S3), lookup manager (wcmgr analog) and history roll-up (S12)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from webalizer_ray import run as cli
from webalizer_ray.pipelines.history import read_history, update_history


@pytest.fixture(scope="module")
def run_out(ray_session, tiny_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_run"))
    rc = cli.main(["run", "--input", tiny_fixture, "--out", out,
                   "--no-actors", "--set", "num_buckets=4"])
    assert rc == 0
    return out


def test_cli_run_writes_sinks_and_metrics(run_out):
    assert os.path.exists(os.path.join(run_out, "metrics.json"))
    m = json.load(open(os.path.join(run_out, "metrics.json")))
    assert m["total_rec"] == m["parsed"] + m["bad"] + m["ignored"]
    assert os.path.exists(os.path.join(run_out, "sinks", "monthly.parquet"))


def test_cli_resume_run(ray_session, tiny_fixture, tmp_path):
    out = str(tmp_path / "o")
    assert cli.main(["run", "--input", tiny_fixture, "--out", out,
                     "--resume", "--no-actors",
                     "--set", "num_buckets=4"]) == 0
    assert os.path.exists(os.path.join(out, "state", "run_manifest.json"))
    # second invocation is a no-op resume
    assert cli.main(["run", "--input", tiny_fixture, "--out", out,
                     "--resume", "--no-actors",
                     "--set", "num_buckets=4"]) == 0
    man = json.load(open(os.path.join(out, "state", "run_manifest.json")))
    assert man["pass1"]["recomputed"] == 0
    assert man["pass2"]["recomputed"] == 0


def test_cli_ingest_log(ray_session, tiny_fixture, tmp_path):
    import ray.data as rd

    from webalizer_ray.sources.rawlog import write_transcript_log
    log_dir = str(tmp_path / "log")
    write_transcript_log(
        rd.read_parquet(os.path.join(tiny_fixture, "turns")), log_dir, "clf")
    out = str(tmp_path / "ing")
    assert cli.main(["ingest-log", "--log", log_dir, "--fmt", "clf",
                     "--out", out]) == 0
    got = pq.read_table(os.path.join(out, "turns"))
    want = pq.read_table(os.path.join(tiny_fixture, "turns"))
    assert got.num_rows == want.num_rows


def test_history_update_and_replace(run_out, tmp_path):
    sink = os.path.join(run_out, "sinks")
    monthly = pq.read_table(os.path.join(sink, "monthly.parquet")).to_pandas()
    daily = pq.read_table(os.path.join(sink, "daily.parquet")).to_pandas()
    hist = str(tmp_path / "history.parquet")

    h1 = update_history(monthly, daily, hist)
    assert set(h1["month"]) == set(monthly["month"])
    assert (h1["first_date"] <= h1["last_date"]).all()

    # a re-run of the same month REPLACES its row (month-to-date mode)
    monthly2 = monthly.copy()
    monthly2["hits"] = monthly2["hits"] + 5
    h2 = update_history(monthly2, daily, hist)
    assert len(h2) == len(h1)
    pd.testing.assert_series_equal(h2["hits"], h1["hits"] + 5,
                                   check_names=False)

    # a NEW month appends, old months keep their rows
    new_m = monthly.iloc[[0]].assign(month="2031-01")
    new_d = daily.iloc[[0]].assign(date="2031-01-07")
    h3 = update_history(new_m, new_d, hist)
    assert len(h3) == len(h1) + 1
    assert read_history(hist)["month"].is_monotonic_increasing


def test_lookup_manager_roundtrip(tmp_path, tiny_fixture):
    import shutil
    tbl = str(tmp_path / "tool_categories.parquet")
    shutil.copy(os.path.join(tiny_fixture, "tool_categories.parquet"), tbl)
    n0 = len(pq.read_table(tbl))
    assert cli.main(["lookup", "add", tbl, "newtool", "newcat"]) == 0
    df = pq.read_table(tbl).to_pandas()
    assert len(df) == n0 + 1
    assert df.set_index("tool").loc["newtool", "category"] == "newcat"
    # add existing key = upsert
    assert cli.main(["lookup", "add", tbl, "newtool", "other"]) == 0
    df = pq.read_table(tbl).to_pandas()
    assert len(df) == n0 + 1
    assert df.set_index("tool").loc["newtool", "category"] == "other"
    assert cli.main(["lookup", "del", tbl, "newtool"]) == 0
    assert len(pq.read_table(tbl)) == n0
    assert cli.main(["lookup", "list", tbl]) == 0


def test_lookup_ttl_purge(tmp_path, tiny_fixture):
    """CacheTTL analog: purge drops stamped entries older than the TTL;
    legacy entries without a timestamp are kept (unknown age != stale)."""
    import shutil
    import time

    import pandas as pd
    tbl = str(tmp_path / "tool_categories.parquet")
    shutil.copy(os.path.join(tiny_fixture, "tool_categories.parquet"), tbl)
    n0 = len(pq.read_table(tbl))            # legacy rows: no ts column
    assert cli.main(["lookup", "add", tbl, "fresh_tool", "cat"]) == 0
    # backdate a second entry to simulate an expired cache record
    assert cli.main(["lookup", "add", tbl, "stale_tool", "cat"]) == 0
    df = pq.read_table(tbl).to_pandas()
    df.loc[df["tool"] == "stale_tool", "ts"] = time.time() - 7200
    df.to_parquet(tbl, index=False)
    assert cli.main(["lookup", "purge", tbl, "3600"]) == 0
    out = pq.read_table(tbl).to_pandas()
    assert "stale_tool" not in set(out["tool"])
    assert "fresh_tool" in set(out["tool"])
    assert len(out) == n0 + 1               # legacy rows survive the purge
    # purged table still loads through the normal reader path
    from webalizer_ray.sources.readers import read_lookup_dicts
    shutil.copy(os.path.join(tiny_fixture, "role_groups.parquet"),
                str(tmp_path / "role_groups.parquet"))
    tc, rg = read_lookup_dicts(str(tmp_path))
    assert tc["fresh_tool"] == "cat" and "stale_tool" not in tc
    # pandas upsert kept values aligned
    assert pd.Series(list(tc.values())).notna().all()


def test_tsv_dumps_written(ray_session, tiny_fixture, lookups, tmp_path):
    """Dump* TSV analogs (S9): every small sink also lands as .tab."""
    import glob

    from webalizer_ray.config import PipelineConfig
    from webalizer_ray.pipelines.flagship import run_flagship
    out = str(tmp_path / "o")
    cfg = PipelineConfig(num_buckets=4, dump_tsv=True)
    res = run_flagship(tiny_fixture, out, cfg, lookups=lookups,
                       use_actors=False)
    tabs = glob.glob(os.path.join(out, "dumps", "*.tab"))
    assert len(tabs) >= 10
    monthly = pd.read_csv(os.path.join(out, "dumps", "monthly.tab"),
                          sep="\t")
    assert len(monthly) == len(res["sinks"]["monthly"])
    assert list(monthly.columns) == list(res["sinks"]["monthly"].columns)


def test_cli_profile_and_dedup(ray_session, tmp_path, capsys):
    """profile prints skew JSON; dedup writes kept ids and a funnel
    that detects a planted duplicate, incremental store skips it on
    the next run."""
    import numpy as np
    import pyarrow as pa

    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["same text here", "unique one", "another doc",
                          "same text here", "yet more words",
                          "final entry"])})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    assert cli.main(["profile", "--input", src, "--key", "doc_id"]) == 0
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prof["distinct_keys"] == 6 and prof["max_n"] == 1

    out = str(tmp_path / "dd")
    assert cli.main(["dedup", "--docs", src, "--out", out]) == 0
    funnel = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert funnel == {"total": 6, "kept": 5, "dropped": 1}
    kept = pq.read_table(os.path.join(out, "kept_ids")).to_pandas()
    assert set(kept["doc_id"]) == {0, 1, 2, 4, 5}

    store = str(tmp_path / "store")
    out2 = str(tmp_path / "dd2")
    assert cli.main(["dedup", "--docs", src, "--out", out2,
                     "--incremental-store", store, "--run-id", "a"]) == 0
    f1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert f1["kept"] == 5
    out3 = str(tmp_path / "dd3")
    assert cli.main(["dedup", "--docs", src, "--out", out3,
                     "--incremental-store", store, "--run-id", "b"]) == 0
    f2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert f2["kept"] == 0      # run b sees every fingerprint in store


def test_cli_query(ray_session, tmp_path, capsys):
    assert cli.main(["query", "--list"]) == 0
    listing = capsys.readouterr().out
    assert "hourly_events\toracle" in listing
    out = str(tmp_path / "q.parquet")
    assert cli.main(["query", "--name", "hourly_events",
                     "--sf-dir", "/root/testdata/sf0.001",
                     "--out", out]) == 0
    assert pq.read_table(out).num_rows == 24
    assert cli.main(["query", "--name", "nope"]) == 2


def test_cli_lookup_prefill(ray_session, tiny_fixture, tmp_path, capsys):
    """DNS-prepass analog: unseen tools get seeded as Unresolved; a
    second prefill is a no-op (+0)."""
    import shutil

    work = str(tmp_path / "fx")
    shutil.copytree(tiny_fixture, work)
    table = os.path.join(work, "tool_categories.parquet")
    before = pq.read_table(table).num_rows
    assert cli.main(["lookup", "prefill", table, work]) == 0
    first = capsys.readouterr().out
    added = int(first.splitlines()[-2].split("+")[1].split()[0])
    assert pq.read_table(table).num_rows == before + added
    assert cli.main(["lookup", "prefill", table, work]) == 0
    second = capsys.readouterr().out
    assert "prefill: +0 keys" in second


def test_cli_compact(ray_session, tmp_path, capsys):
    """Many tiny files -> few bigger ones, identical rows; idempotent
    atomic publish (rerun replaces, never appends)."""
    import numpy as np
    import pyarrow as pa

    src = str(tmp_path / "many")
    os.makedirs(src)
    for i in range(20):
        pq.write_table(pa.table({
            "k": pa.array(np.arange(i * 10, i * 10 + 10, dtype=np.int64))
        }), os.path.join(src, f"f{i}.parquet"))
    out = str(tmp_path / "compacted")
    for _ in range(2):   # second run must replace, not append
        assert cli.main(["compact", "--input", src, "--out", out,
                         "--num-files", "4"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 200 and res["files"] <= 4
    merged = pq.read_table(out).to_pandas()["k"].sort_values()
    assert list(merged) == list(range(200))


def test_cli_ingest_rerun_never_doubles(ray_session, tmp_path, capsys):
    """Rerunning ingest-log into the same out dir must not append-double
    the turns (same-lineage rerun is a marker no-op or a clean rewrite)."""
    log = str(tmp_path / "log")
    os.makedirs(log)
    with open(os.path.join(log, "a.log"), "w") as f:
        for i in range(10):
            f.write(f"conv{i % 2} [2024-01-01T00:0{i % 6}:00] {i} "
                    f"user tool_a \"ACTION=ask STATUS=200 KB=1.00\"\n")
    out = str(tmp_path / "o")
    for _ in range(2):
        assert cli.main(["ingest-log", "--log", log, "--fmt", "clf",
                         "--out", out]) == 0
    capsys.readouterr()
    import pyarrow.dataset as pads
    assert pads.dataset(os.path.join(out, "turns")).count_rows() == 10


def test_cli_selfcheck(ray_session, capsys):
    assert cli.main(["selfcheck", "--no-actors"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "PASS" and out["conserved"]


def test_cli_store_roundtrip(ray_session, tmp_path, capsys):
    """store init → apply → log → read-as-of → rollback → forget →
    vacuum end-to-end through the CLI (one JSON line per op)."""
    import json as _json

    from webalizer_ray import run as cli

    base = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "val": np.arange(10, dtype=np.int64) * 3})
    base.to_parquet(tmp_path / "base.parquet", index=False)
    ch = pd.DataFrame({"k": np.array([2, 5], np.int64),
                       "val": np.array([999, 0], np.int64),
                       "seq": np.array([1, 2], np.int64),
                       "op": ["upsert", "delete"]})
    ch.to_parquet(tmp_path / "ch.parquet", index=False)
    store = str(tmp_path / "store")

    assert cli.main(["store", "init", store, "--input",
                     str(tmp_path / "base.parquet"), "--key", "k",
                     "--num-buckets", "4"]) == 0
    assert cli.main(["store", "apply", store, "--input",
                     str(tmp_path / "ch.parquet")]) == 0
    assert cli.main(["store", "read", store, "--version", "2",
                     "--out", str(tmp_path / "v2")]) == 0
    v2 = pd.read_parquet(tmp_path / "v2")
    assert 5 not in v2["k"].to_numpy()
    assert v2.loc[v2["k"] == 2, "val"].iloc[0] == 999

    capsys.readouterr()
    assert cli.main(["store", "log", store]) == 0
    lines = [_json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert [e["version"] for e in lines] == [1, 2]

    assert cli.main(["store", "rollback", store, "--version", "1"]) == 0
    assert cli.main(["store", "forget", store, "--keys", "3"]) == 0
    assert cli.main(["store", "read", store, "--version", "3",
                     "--out", str(tmp_path / "v3")]) == 0
    v3 = pd.read_parquet(tmp_path / "v3")
    assert 3 not in v3["k"].to_numpy()      # forgotten from history
    assert 5 in v3["k"].to_numpy()          # rollback restored v1 state
    assert cli.main(["store", "vacuum", store, "--version", "3"]) == 0
