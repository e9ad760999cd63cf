"""Raw text-log ingestion round-trips (SURVEY.md S1/P1–P5 analogs)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from webalizer_ray.sources import rawlog

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _turns(fixture_dir):
    return (pads.dataset(os.path.join(fixture_dir, "turns")).to_table()
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)[COLS])


@pytest.mark.parametrize("fmt", ["clf", "squid", "w3c", "ftp", "jsonl"])
@pytest.mark.parametrize("compress", [False, True, "bz2"])
def test_roundtrip(ray_session, tiny_fixture, tmp_path, fmt, compress):
    """turns → log text (per-format grok grammar) → turns, exactly.

    The tiny fixture includes empty text, embedded quotes/brackets,
    unicode, the grammar's own delimiters, and null tools — the nasty
    cases for the escape discipline."""
    import ray.data as rd

    want = _turns(tiny_fixture)
    log_dir = str(tmp_path / f"log_{fmt}{compress}")
    rawlog.write_transcript_log(
        rd.read_parquet(os.path.join(tiny_fixture, "turns")),
        log_dir, fmt=fmt, compress=compress)
    got = (rawlog.read_transcript_log(log_dir, fmt=fmt).to_pandas()
           .sort_values(["conv_id", "turn_idx"], ignore_index=True)[COLS])
    pd.testing.assert_frame_equal(got, want)


def test_bad_lines_routed(ray_session, tmp_path):
    """Malformed lines → route=bad, counted not crashed (total_bad, P15)."""
    import ray.data as rd

    log_dir = str(tmp_path / "badlog")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "part-0.log"), "w") as f:
        f.write('c1 [2024-01-01T00:00:00.000000] 0 user - "hello"\n')
        f.write("THIS IS NOT A LOG LINE\n")
        f.write('c1 [2024-01-01T00:10:00.000000] 1 assistant - "hi"\n')
        f.write('c1 [not-a-date] 2 user - "x\n')  # unterminated quote
    ds = rawlog.read_transcript_log(log_dir, fmt="clf", include_bad=True)
    df = ds.to_pandas()
    assert (df["route"] == "bad").sum() == 2
    ok = df[df["route"] == "ok"]
    assert len(ok) == 2 and ok["tool"].isna().all()
    # default path drops bad rows
    assert len(rawlog.read_transcript_log(log_dir, fmt="clf").to_pandas()) == 2


def test_ftp_dialect_parse_and_bad_month(ray_session, tmp_path):
    """wu-ftpd xferlog timestamp grammar: month-name lookup, space-padded
    day; a bogus month name routes to bad instead of crashing."""
    log_dir = str(tmp_path / "ftp")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "part-0.log"), "w") as f:
        f.write('Mon Jul  7 12:34:56 2025 c1 0 user - "padded day"\n')
        f.write('Tue Dec 31 23:59:59 2024 c1 1 assistant search "hi"\n')
        f.write('Tue Foo 31 23:59:59 2024 c1 2 user - "bad month"\n')
        f.write("garbage line\n")
    df = (rawlog.read_transcript_log(log_dir, fmt="ftp", include_bad=True)
          .to_pandas())
    assert (df["route"] == "bad").sum() == 2
    ok = df[df["route"] == "ok"].sort_values("turn_idx")
    assert str(ok.iloc[0]["ts"]) == "2025-07-07 12:34:56"
    assert str(ok.iloc[1]["ts"]) == "2024-12-31 23:59:59"
    assert ok.iloc[1]["tool"] == "search"


def test_w3c_header_drives_field_order(ray_session, tmp_path):
    """#Fields order is honored (parse_record_w3c header-map analog)."""
    log_dir = str(tmp_path / "w3c")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "part-0.log"), "w") as f:
        f.write("#Fields: ts role conv_id tool turn_idx text\n")
        f.write("2024-01-01T00:00:00.000000 user c9 search 3 hello%20world\n")
    df = rawlog.read_transcript_log(log_dir, fmt="w3c").to_pandas()
    assert df.iloc[0]["conv_id"] == "c9"
    assert df.iloc[0]["turn_idx"] == 3
    assert df.iloc[0]["text"] == "hello world"


def test_rawlog_feeds_flagship(ray_session, tiny_fixture, lookups, tmp_path):
    """Ingested raw log produces the same flagship sinks as the parquet
    path — the LogType-selection contract: format in, same tables out."""
    import ray.data as rd

    from webalizer_ray.config import PipelineConfig
    from webalizer_ray.pipelines.flagship import run_flagship

    cfg = PipelineConfig(num_buckets=4, enrich_concurrency=(1, 2))
    out_pq = run_flagship(tiny_fixture, str(tmp_path / "out_pq"), cfg,
                          lookups=lookups, use_actors=False)

    log_dir = str(tmp_path / "log")
    rawlog.write_transcript_log(
        rd.read_parquet(os.path.join(tiny_fixture, "turns")), log_dir, "clf")
    in2 = str(tmp_path / "in2")
    os.makedirs(os.path.join(in2, "turns"))
    rawlog.read_transcript_log(log_dir, "clf") \
        .write_parquet(os.path.join(in2, "turns"))
    out_log = run_flagship(in2, str(tmp_path / "out_log"), cfg,
                           lookups=lookups, use_actors=False)
    for sink in ("monthly", "hourly", "per_tool", "status_hist"):
        a = out_pq["sinks"][sink].reset_index(drop=True)
        b = out_log["sinks"][sink].reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_uncastable_values_route_bad_not_crash(ray_session, tmp_path):
    """Lines that LOOK structured but carry uncastable values (bad date,
    int32-overflowing turn_idx, oversized epoch) must route to bad, not
    crash the job (code-review regression)."""
    log_dir = str(tmp_path / "badvals")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "part-0.log"), "w") as f:
        f.write('c1 [2024-01-01T00:00:00.000000] 0 user - "good"\n')
        f.write('c1 [not-a-date] 1 user - "terminated quote"\n')
        f.write('c1 [2024-01-01T00:00:01.000000] 99999999999 user - "idx"\n')
    df = rawlog.read_transcript_log(log_dir, "clf", include_bad=True) \
        .to_pandas()
    assert (df["route"] == "bad").sum() == 2
    assert (df["route"] == "ok").sum() == 1

    sq = str(tmp_path / "sq")
    os.makedirs(sq)
    with open(os.path.join(sq, "part-0.log"), "w") as f:
        f.write('1704067200000000 c1 0 user - "good"\n')
        f.write('99999999999999999999999999 c1 1 user - "epoch overflow"\n')
    df = rawlog.read_transcript_log(sq, "squid", include_bad=True).to_pandas()
    assert (df["route"] == "bad").sum() == 1


def test_w3c_mismatched_headers_rejected(ray_session, tmp_path):
    log_dir = str(tmp_path / "w3c2")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "a.log"), "w") as f:
        f.write("#Fields: conv_id turn_idx role tool ts text\nx\n")
    with open(os.path.join(log_dir, "b.log"), "w") as f:
        f.write("#Fields: ts conv_id turn_idx role tool text\nx\n")
    with pytest.raises(ValueError, match="disagree"):
        rawlog.read_transcript_log(log_dir, "w3c")


def test_nonresume_out_dir_reuse_refused(ray_session, tiny_fixture, lookups,
                                         tmp_path):
    from webalizer_ray.config import PipelineConfig
    from webalizer_ray.pipelines.flagship import run_flagship
    cfg = PipelineConfig(num_buckets=4)
    out = str(tmp_path / "o")
    run_flagship(tiny_fixture, out, cfg, lookups=lookups, use_actors=False)
    with pytest.raises(FileExistsError, match="resumable"):
        run_flagship(tiny_fixture, out, cfg, lookups=lookups,
                     use_actors=False)


def test_jsonl_lossless_and_bad_line_isolation(ray_session, tmp_path):
    """JSONL is the lossless dialect: whitespace/quotes/unicode in any
    field round-trip (the token-grid dialects reject these at serialize
    time); a malformed line poisons only itself — the batch falls back to
    per-line parse and routes exactly that line to bad."""
    import pandas as pd
    import ray.data as rd
    from webalizer_ray.sources import rawlog

    df = pd.DataFrame({
        "conv_id": ['c 1"', "c\t2"],          # whitespace + quote
        "turn_idx": pd.array([0, 1], dtype="int32"),
        "role": ["user x", "assistant"],
        "text": ['say "hi"\nnewline', "ünïcode ✓"],
        "tool": [None, "tool kit"],
        "ts": pd.to_datetime(["2024-01-01 00:00:07.179575",
                              "2024-02-03 04:05:06"], format="mixed")
              .astype("datetime64[us]"),
    })
    log_dir = str(tmp_path / "jsonl")
    rawlog.write_transcript_log(rd.from_pandas(df), log_dir, fmt="jsonl")
    got = (rawlog.read_transcript_log(log_dir, fmt="jsonl").to_pandas()
           .sort_values("turn_idx", ignore_index=True))
    pd.testing.assert_frame_equal(got[df.columns.tolist()], df)

    # splice a malformed line + a wrong-typed line into the shard
    import os
    shard = os.path.join(log_dir, sorted(os.listdir(log_dir))[0])
    with open(shard, "a", encoding="utf-8") as f:
        f.write("{not json at all\n")
        f.write('{"conv_id":"c3","turn_idx":"NOT_INT","role":"u",'
                '"text":"t","tool":null,"ts":"2024-01-01T00:00:00"}\n')
    all_rows = rawlog.read_transcript_log(log_dir, fmt="jsonl",
                                          include_bad=True).to_pandas()
    assert (all_rows["route"] == "bad").sum() == 2
    assert (all_rows["route"] == "ok").sum() == 2


def test_read_events_csv_roundtrip(ray_session, tmp_path):
    """CSV events ingestion reproduces the parquet table byte-for-byte
    after dtype coercion (ids int64, ts timestamp[us], value float64)."""
    import duckdb
    import pandas as pd

    from webalizer_ray.sources.events_adapter import read_events_csv

    src = "/root/testdata/sf0.001/events.parquet"
    csv = str(tmp_path / "events.csv")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{src}')) TO '{csv}' "
               f"(HEADER, DATEFORMAT '%Y-%m-%dT%H:%M:%S.%f')")
    a = read_events_csv(csv).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    b = pd.read_parquet(src).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
