"""CLI driver (SURVEY.md §2.1 S3 — the ``webalizer [...] logfile`` analog).

The reference's surface is ``webalizer [-c conf] [-p incremental]
[-F type] [-o outdir] [-q] [logfile]`` (webalizer.c:main() getopt
≈2900–3050 [verify]). Ours:

    python -m webalizer_ray.run run        --input DIR --out DIR
                                           [--resume] [--config FILE.json]
                                           [--no-actors] [--num-cpus N]
    python -m webalizer_ray.run ingest-log --log DIR --fmt clf|squid|w3c|ftp|jsonl
                                           --out DIR [--keep-bad]
    python -m webalizer_ray.run curate     --docs PARQUET --out DIR
                                           [--q-lo F] [--q-hi F]
                                           [--min-quality F]
    python -m webalizer_ray.run history    --out RUN_OUT_DIR [--hist FILE]
    python -m webalizer_ray.run lookup     <list|add|del|export> ...

``run --resume`` is the ``-p`` incremental mode (per-partition
checkpoints, state/checkpoint.py). ``ingest-log --fmt`` is ``-F``
LogType selection (sources/rawlog.py). ``lookup`` is the ``wcmgr``
DNS-cache manager analog (wcmgr.c [verify]) over the enrichment Parquet
tables. ``--config`` is ``-c webalizer.conf`` — a JSON object of
PipelineConfig fields.

This module OWNS the Ray session (guarded init); library code never
does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_config(path: str | None, overrides: list[str]):
    from webalizer_ray.config import DEFAULT_CONFIG, PipelineConfig

    kw = {}
    if path:
        with open(path) as f:
            kw.update(json.load(f))
    for kv in overrides:
        k, _, v = kv.partition("=")
        try:
            kw[k] = json.loads(v)
        except json.JSONDecodeError:
            kw[k] = v
    for k in ("ignore_conv_patterns", "ignore_tool_patterns",
              "ignore_role_patterns", "hide_tool_patterns",
              "hide_conv_patterns", "enrich_concurrency"):
        if k in kw and isinstance(kw[k], list):
            kw[k] = tuple(kw[k])
    return PipelineConfig(**kw) if kw else DEFAULT_CONFIG


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")


def cmd_run(args) -> int:
    _init_ray(args.num_cpus)
    cfg = load_config(args.config, args.set or [])
    if args.resume and getattr(args, "no_checkpoint", False):
        print("--resume and --no-checkpoint are mutually exclusive "
              "(resume NEEDS the durable parsed store)", file=sys.stderr)
        return 2
    if args.resume:
        from webalizer_ray.state.checkpoint import run_flagship_resumable
        res = run_flagship_resumable(args.input, args.out, cfg,
                                     use_actors=not args.no_actors)
        r = res["resume"]
        print(f"pass1: {len(r['pass1']['skipped'])} skipped, "
              f"{len(r['pass1']['recomputed'])} recomputed; "
              f"pass2: {len(r['pass2']['cached'])} cached, "
              f"{len(r['pass2']['recomputed'])} recomputed",
              file=sys.stderr)
    else:
        from webalizer_ray.pipelines.flagship import run_flagship
        res = run_flagship(args.input, args.out, cfg,
                           use_actors=not args.no_actors,
                           checkpoint="off" if getattr(
                               args, "no_checkpoint", False) else "on")
    print(json.dumps(res["metrics"], default=str))
    return 0


def cmd_ingest_log(args) -> int:
    _init_ray(args.num_cpus)
    from webalizer_ray.pipelines.curate import (
        lineage_key,
        load_marker,
        write_marker,
    )
    from webalizer_ray.sources.rawlog import read_transcript_log
    ds = read_transcript_log(args.log, fmt=args.fmt,
                             include_bad=args.keep_bad)
    dest = os.path.join(args.out, "turns")
    # rerun safety (write_parquet appends): same-lineage rerun is a
    # no-op, anything else wipes and reconverts
    key = lineage_key(ds, {"fmt": args.fmt, "keep_bad": args.keep_bad})
    cached = load_marker(args.out, "_INGEST.json", key)
    if cached is not None:
        print(json.dumps(cached))
        return 0
    if os.path.isdir(dest) and os.listdir(dest):
        import shutil
        shutil.rmtree(dest)
    if args.keep_bad:
        ds.write_parquet(dest, partition_cols=["route"])
    else:
        ds.write_parquet(dest)
    out = {"out": dest}
    write_marker(args.out, "_INGEST.json", key, out)
    print(json.dumps(out))
    return 0


def cmd_curate(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.pipelines.curate import run_curation
    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    res = run_curation(docs, args.out, q_lo=args.q_lo, q_hi=args.q_hi,
                       min_quality=args.min_quality)
    print(json.dumps(res))
    return 0


def cmd_prepare(args) -> int:
    """Full training-data prep: curate → (optional) decontaminate →
    deterministic shuffle → token-budget packing → partitioned write."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.pipelines.prepare import run_prepare
    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    val = rd.read_parquet(args.val, columns=["doc_id", "text"]) \
        if args.val else None
    res = run_prepare(docs, args.out, val=val,
                      token_budget=args.budget, seed=args.seed,
                      min_quality=args.min_quality)
    print(json.dumps(res))
    return 0


def cmd_profile(args) -> int:
    """Key-skew diagnostics over any parquet table column — run this
    BEFORE picking a partition/groupby key on big data. With --shards,
    a footer-only file-balance report instead (straggler detection)."""
    if args.shards:
        from webalizer_ray.sources.readers import shard_balance_report
        print(shard_balance_report(args.input).iloc[0].to_json())
        return 0
    if not args.key:
        raise SystemExit("profile: --key is required unless --shards")
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.stages.aggregate import key_skew_profile
    ds = rd.read_parquet(args.input, columns=[args.key])
    prof = key_skew_profile(ds, args.key)
    prof = {k: (round(v, 6) if isinstance(v, float) else v)
            for k, v in prof.items()}
    print(json.dumps({"key": args.key, **prof}))
    return 0


def cmd_corpus_card(args) -> int:
    """One-command corpus data card (the monthly-report analog for a
    training corpus): every section is a registry query, so the
    numbers inherit the oracle gate."""
    _init_ray(args.num_cpus)
    from webalizer_ray.pipelines.report import write_corpus_card
    card = write_corpus_card(args.sf_dir, args.out)
    print(json.dumps({"out": args.out,
                      "sections": sorted(card["sections"].keys())}))
    return 0


def cmd_graphs(args) -> int:
    """Render the four PNG usage graphs (S10 graphs.c analogs) from a
    flagship output directory's finished sinks — driver-side O(KB), no
    Ray session needed."""
    from webalizer_ray.pipelines.graphs import write_flagship_graphs
    cfg = load_config(getattr(args, "config", None),
                      getattr(args, "set", None) or [])
    written = write_flagship_graphs(args.out, config=cfg)
    print(json.dumps({"out": args.out,
                      "graphs": sorted(written.keys())}))
    return 0


def cmd_html_report(args) -> int:
    """Compose the static HTML report tree (index.html + one
    usage_YYYYMM.html per month, PNG graphs embedded) from a flagship
    output directory's sinks — driver-side, no Ray session. The
    Color* / GroupShading / GroupHighlight knobs come from --config /
    --set (webalizer.conf cosmetics analogs)."""
    from webalizer_ray.pipelines.htmlreport import write_html_report
    cfg = load_config(getattr(args, "config", None),
                      getattr(args, "set", None) or [])
    written = write_html_report(args.out, top_n=args.top_n, config=cfg)
    print(json.dumps({"out": args.out, "pages": sorted(written.keys())}))
    return 0


def cmd_search(args) -> int:
    """BM25 keyword search: builds (or reuses) the term-sharded
    inverted index, then answers from only the matching term buckets."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.stages.invindex import build_index, query_index
    idx = args.index_dir
    if not os.path.exists(os.path.join(idx, "_meta.json")):
        ds = rd.read_parquet(args.input, columns=[args.id_col,
                                                  args.text_col])
        build_index(ds, idx, text_col=args.text_col, id_col=args.id_col)
    out = query_index(idx, [t for t in args.terms.split(",") if t],
                      k=args.k)
    print(json.dumps({"terms": args.terms.split(","),
                      "hits": out.to_dict("records")}))
    return 0


def cmd_dedup(args) -> int:
    """Exact dedup of a documents table: writes the kept rows
    (partitioned parquet) + a JSON funnel; --incremental-store reuses
    fingerprints across runs (idempotent reruns)."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.stages.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )
    docs = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    total = docs.count()
    if args.incremental_store:
        kept = incremental_exact_dedup(
            docs, args.incremental_store, args.run_id,
            os.path.join(args.out, "kept_ids"),
            id_col=args.id_col, text_col=args.text_col)
        n_kept = kept.count()
    else:
        kept = exact_dedup(docs, text_col=args.text_col,
                           id_col=args.id_col)
        kept.write_parquet(os.path.join(args.out, "kept_ids"))
        n_kept = kept.count()
    print(json.dumps({"total": total, "kept": n_kept,
                      "dropped": total - n_kept}))
    return 0


def cmd_compact(args) -> int:
    """Small-files compaction: rewrite a parquet directory (e.g. an
    incremental store that accumulated one file per run) into
    ``--num-files`` bigger files — the maintenance op every
    checkpoint/store layout eventually needs. Streaming repartition,
    atomic publish (write to .tmp, rename)."""
    _init_ray(args.num_cpus)
    import shutil

    import ray.data as rd
    ds = rd.read_parquet(args.input)
    n = ds.count()
    tmp = args.out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(args.num_files).write_parquet(tmp,
                                                 compression="zstd")
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.replace(tmp, args.out)
    n_files = len([f for f in os.listdir(args.out)
                   if f.endswith(".parquet")])
    print(json.dumps({"rows": n, "files": n_files, "out": args.out}))
    return 0


def cmd_maintain(args) -> int:
    """In-place lake maintenance (state/maintain.py): TTL retention
    (footer-classified — wholly-expired files unlink without a data
    read) and/or small-file compaction (self-healing two-phase
    publish). ``--recover`` alone finishes any interrupted compaction.
    Unlike ``compact`` (copy-rewrite to a new dir), these mutate the
    store in place and touch only the files that must change."""
    _init_ray(args.num_cpus)
    from webalizer_ray.state import maintain

    report: dict = {"dir": args.dir}
    if args.recover or args.target_rows:
        report["recover"] = maintain.recover_compaction(args.dir)
    if args.ttl_cutoff:
        rep = maintain.apply_retention(args.dir, args.ttl_column,
                                       args.ttl_cutoff)
        report["ttl"] = {
            "removed": int(rep["removed"].sum()),
            "deleted_files": int((rep["action"] == "deleted").sum()),
            "rewritten": int((rep["action"] == "rewritten").sum()),
            "kept": int((rep["action"] == "kept").sum())}
    if args.target_rows:
        rep = maintain.compact_dir(args.dir,
                                   target_rows=args.target_rows)
        report["compact"] = {
            "compacted": int((rep["action"] == "compacted").sum()),
            "kept": int((rep["action"] == "kept").sum()),
            "bins": int(rep.loc[rep["bin"] >= 0, "bin"].nunique())}
    print(json.dumps(report))
    return 0


def cmd_query(args) -> int:
    """Run any registered pipeline query by name over a testdata-shaped
    table dir (``--list`` prints the catalog)."""
    from webalizer_ray.pipelines.queries import REGISTRY
    if args.list or not args.name:
        for name, (_, sql) in sorted(REGISTRY.items()):
            print(f"{name}\t{'oracle' if sql else 'rows-only'}")
        return 0
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; --list shows the catalog",
              file=sys.stderr)
        return 2
    _init_ray(args.num_cpus)
    out = REGISTRY[args.name][0](args.sf_dir)
    if args.out:
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       args.out)
        print(json.dumps({"query": args.name, "rows": len(out),
                          "out": args.out}))
    else:
        print(out.to_string(index=False, max_rows=args.max_rows))
    return 0


def cmd_selfcheck(args) -> int:
    """One-command install validation: build a tiny deterministic
    fixture, run the full engine AND the pure-pandas refmodel, compare
    every conservation metric — prints PASS/FAIL JSON, exit 0/1."""
    import tempfile

    import pyarrow.dataset as pads

    _init_ray(args.num_cpus)
    from webalizer_ray import fixtures
    from webalizer_ray.config import DEFAULT_CONFIG
    from webalizer_ray.pipelines.flagship import run_flagship
    from webalizer_ray.refmodel import run_refmodel

    d = tempfile.mkdtemp(prefix="wr_selfcheck_")
    fixtures.build_fixture_dir(d, scale="tiny")
    res = run_flagship(d, os.path.join(d, "out"), DEFAULT_CONFIG,
                       use_actors=not args.no_actors)
    turns = pads.dataset(os.path.join(d, "turns")).to_table().to_pandas()
    import pandas as pd
    lk = {}
    for name in ["tool_categories", "role_groups"]:
        t = pd.read_parquet(os.path.join(d, f"{name}.parquet"))
        lk[name] = dict(zip(t.iloc[:, 0], t.iloc[:, 1]))
    ref = run_refmodel(turns, DEFAULT_CONFIG, lk["tool_categories"],
                       lk["role_groups"])
    keys = ("total_rec", "bad", "ignored", "parsed", "sessions", "convs")
    diffs = {k: (res["metrics"][k], ref["metrics"][k]) for k in keys
             if res["metrics"][k] != ref["metrics"][k]}
    conserved = (res["metrics"]["total_rec"]
                 == res["metrics"]["parsed"] + res["metrics"]["bad"]
                 + res["metrics"]["ignored"])
    ok = not diffs and conserved
    print(json.dumps({"status": "PASS" if ok else "FAIL",
                      "metrics": res["metrics"],
                      "mismatches": diffs, "conserved": conserved},
                     default=str))
    return 0 if ok else 1


def cmd_history(args) -> int:
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.history import update_history
    sink = os.path.join(args.out, "sinks")
    monthly = pq.read_table(os.path.join(sink, "monthly.parquet")).to_pandas()
    daily = pq.read_table(os.path.join(sink, "daily.parquet")).to_pandas()
    hist = args.hist or os.path.join(args.out, "history.parquet")
    merged = update_history(monthly, daily, hist)
    print(merged.to_string(index=False))
    return 0


def cmd_lookup(args) -> int:
    """wcmgr analog: manage the enrichment lookup Parquet tables.

    ``add`` stamps each entry with its insertion time; ``purge TABLE
    TTL_SECONDS`` drops entries older than the TTL — the ``CacheTTL``
    staleness expiry of the reference's DNS cache (dns_resolv.c TTL
    check in resolve_dns() [verify]). Entries from tables written before
    timestamps existed (ts null) are kept by purge (unknown age ≠ stale).
    """
    import time as _time

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.flagship import _write_atomic

    path = args.table
    key, val = ("tool", "category") if "tool" in os.path.basename(path) \
        else ("role", "grp")
    df = (pq.read_table(path).to_pandas() if os.path.exists(path)
          else pd.DataFrame({key: [], val: []}, dtype=object))
    if args.op == "list":
        show = df.copy()
        if "ts" in show.columns:
            age = _time.time() - show["ts"]
            show["age_s"] = age.round(1)
            show = show.drop(columns=["ts"])
        print(show.to_string(index=False))
        return 0
    if args.op == "add":
        if "ts" not in df.columns:
            df["ts"] = np.nan
        df = df[df[key] != args.key]
        df = pd.concat([df, pd.DataFrame({key: [args.key],
                                          val: [args.value],
                                          "ts": [_time.time()]})],
                       ignore_index=True).sort_values(key,
                                                      ignore_index=True)
    elif args.op == "del":
        df = df[df[key] != args.key].reset_index(drop=True)
    elif args.op == "purge":
        ttl = float(args.key)
        if "ts" in df.columns:
            cutoff = _time.time() - ttl
            stale = df["ts"].notna() & (df["ts"] < cutoff)
            df = df[~stale].reset_index(drop=True)
    elif args.op == "export":
        df.to_csv(args.value or "/dev/stdout", index=False)
        return 0
    elif args.op == "import":
        # wcmgr import analog: bulk-load (key, value) records from a
        # CSV or Parquet file; imported entries win over existing ones
        # (same last-writer rule as ``add``), each stamped now.
        src = args.key
        if not src:
            raise SystemExit(
                "import: missing source path (CSV or Parquet)")
        inc = (pq.read_table(src).to_pandas()
               if src.endswith(".parquet") else pd.read_csv(src))
        cols = list(inc.columns)
        if key in cols and val in cols:
            inc = inc[[key, val]]
        elif len(cols) >= 2:
            inc = inc[cols[:2]]
            inc.columns = [key, val]
        else:
            raise SystemExit(
                f"import: {src} needs ({key},{val}) or two columns")
        inc = inc.dropna().astype(str).drop_duplicates(key, keep="last")
        if "ts" not in df.columns:
            df["ts"] = np.nan
        df = df[~df[key].isin(inc[key])]
        inc["ts"] = _time.time()
        df = pd.concat([df, inc], ignore_index=True) \
            .sort_values(key, ignore_index=True)
    elif args.op == "prefill":
        # DNS-resolver PRE-PASS analog (SURVEY §3.2, `webalizer -N10 -D
        # cache.db`): scan the turns store for distinct keys the lookup
        # table doesn't know yet and seed them (value = args.value or
        # "Unresolved"), so the main run's enrich stage hits the cache.
        # Distinct keys come from per-batch dedup partials — the turns
        # table never lands on the driver.
        _init_ray(getattr(args, "num_cpus", None))
        import ray.data as rd
        col = "tool" if key == "tool" else "role"
        seen = rd.read_parquet(os.path.join(args.key, "turns"),
                               columns=[col]) \
            .map_batches(lambda d: d.drop_duplicates(),
                         batch_format="pandas") \
            .to_pandas()[col].dropna().drop_duplicates()
        new = sorted(set(seen) - set(df[key]))
        if new:
            if "ts" not in df.columns:
                df["ts"] = np.nan
            df = pd.concat([df, pd.DataFrame(
                {key: new, val: args.value or "Unresolved",
                 "ts": _time.time()})], ignore_index=True) \
                .sort_values(key, ignore_index=True)
        print(f"prefill: +{len(new)} keys")
    _write_atomic(df, path)
    print(f"{args.op}: {len(df)} entries")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m webalizer_ray.run")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="flagship pipeline over a turns dir")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--resume", action="store_true",
                   help="incremental mode (-p): per-partition checkpoints")
    r.add_argument("--no-checkpoint", action="store_true",
                   dest="no_checkpoint",
                   help="single-pass throughput mode: fuse the parse "
                        "pass into the bucket shuffle (no durable "
                        "parsed store, no resume; same sinks/metrics)")
    r.add_argument("--config", help="JSON file of PipelineConfig fields")
    r.add_argument("--set", action="append", metavar="KEY=VAL",
                   help="config override (repeatable)")
    r.add_argument("--no-actors", action="store_true")
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_run)

    i = sub.add_parser("ingest-log", help="raw text log -> turns parquet")
    i.add_argument("--log", required=True)
    i.add_argument("--fmt", default="clf",
                   choices=["clf", "squid", "w3c", "ftp", "jsonl"])
    i.add_argument("--out", required=True)
    i.add_argument("--keep-bad", action="store_true")
    i.add_argument("--num-cpus", type=int, default=None)
    i.set_defaults(fn=cmd_ingest_log)

    c = sub.add_parser("curate", help="document curation: length band + "
                                      "quality gate + dedup -> route dirs")
    c.add_argument("--docs", required=True,
                   help="documents parquet file/dir (doc_id, text)")
    c.add_argument("--out", required=True)
    c.add_argument("--q-lo", type=float, default=0.05, dest="q_lo")
    c.add_argument("--q-hi", type=float, default=0.95, dest="q_hi")
    c.add_argument("--min-quality", type=float, default=0.38,
                   dest="min_quality")
    c.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    c.set_defaults(fn=cmd_curate)

    pp = sub.add_parser("prepare", help="training-data prep: curate -> "
                                        "decontaminate -> shuffle -> pack")
    pp.add_argument("--docs", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--val", default=None,
                    help="eval-set parquet for n-gram decontamination")
    pp.add_argument("--budget", type=int, default=2048)
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--min-quality", type=float, default=0.38,
                    dest="min_quality")
    pp.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    pp.set_defaults(fn=cmd_prepare)

    pr = sub.add_parser("profile", help="key-skew diagnostics over a "
                                        "parquet column (entropy/Gini/"
                                        "top-share)")
    pr.add_argument("--input", required=True, help="parquet file/dir")
    pr.add_argument("--key", help="column to profile")
    pr.add_argument("--shards", action="store_true",
                    help="footer-only file-balance report instead")
    pr.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    pr.set_defaults(fn=cmd_profile)

    cc = sub.add_parser("corpus-card", help="emit a corpus data card "
                                            "(card.json + card.md) from "
                                            "the oracle-checked sections")
    cc.add_argument("--sf-dir", required=True, dest="sf_dir",
                    help="dir holding documents.parquet")
    cc.add_argument("--out", required=True, help="output dir")
    cc.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    cc.set_defaults(fn=cmd_corpus_card)

    gr = sub.add_parser("graphs", help="render the PNG usage graphs "
                                       "(daily/hourly/yearly bars + "
                                       "category pie) from a flagship "
                                       "output dir's sinks")
    gr.add_argument("--out", required=True,
                    help="flagship output dir (reads <out>/sinks, "
                         "writes <out>/graphs)")
    gr.add_argument("--config", default=None,
                    help="JSON config file (Color* knobs)")
    gr.add_argument("--set", action="append", default=None,
                    help="config override key=value")
    gr.set_defaults(fn=cmd_graphs)

    hr = sub.add_parser("html-report", help="compose the static HTML "
                                            "report tree (index + month "
                                            "pages, graphs embedded) "
                                            "from a flagship output dir")
    hr.add_argument("--out", required=True,
                    help="flagship output dir (reads <out>/sinks)")
    hr.add_argument("--top-n", type=int, default=10, dest="top_n")
    hr.add_argument("--config", default=None,
                    help="JSON config file (Color*/GroupShading knobs)")
    hr.add_argument("--set", action="append", default=None,
                    help="config override key=value (repeatable)")
    hr.set_defaults(fn=cmd_html_report)

    se = sub.add_parser("search", help="BM25 keyword search over a "
                                       "documents table via a persisted "
                                       "inverted index")
    se.add_argument("--input", required=True, help="documents parquet")
    se.add_argument("--index-dir", required=True, dest="index_dir")
    se.add_argument("--terms", required=True,
                    help="comma-separated query terms")
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--text-col", default="text", dest="text_col")
    se.add_argument("--id-col", default="doc_id", dest="id_col")
    se.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    se.set_defaults(fn=cmd_search)

    dd = sub.add_parser("dedup", help="exact dedup of a documents table "
                                      "(optionally incremental across runs)")
    dd.add_argument("--docs", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--id-col", default="doc_id", dest="id_col")
    dd.add_argument("--text-col", default="text", dest="text_col")
    dd.add_argument("--incremental-store", default=None,
                    dest="incremental_store",
                    help="fingerprint store dir; enables cross-run dedup")
    dd.add_argument("--run-id", default="r1", dest="run_id")
    dd.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    dd.set_defaults(fn=cmd_dedup)

    cp = sub.add_parser("compact", help="rewrite a many-small-files "
                                        "parquet dir into fewer files")
    cp.add_argument("--input", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--num-files", type=int, default=8, dest="num_files")
    cp.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    cp.set_defaults(fn=cmd_compact)

    mt = sub.add_parser("maintain", help="in-place TTL retention and/or "
                                         "small-file compaction")
    mt.add_argument("--dir", required=True)
    mt.add_argument("--ttl-column", default="ts", dest="ttl_column")
    mt.add_argument("--ttl-cutoff", default=None, dest="ttl_cutoff",
                    help="delete rows with ttl-column < this timestamp")
    mt.add_argument("--compact-target-rows", type=int, default=None,
                    dest="target_rows")
    mt.add_argument("--recover", action="store_true",
                    help="only finish an interrupted compaction")
    mt.add_argument("--num-cpus", type=int, default=None,
                    dest="num_cpus")
    mt.set_defaults(fn=cmd_maintain)

    q = sub.add_parser("query", help="run a registered pipeline query "
                                     "by name (--list for the catalog)")
    q.add_argument("--name", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   dest="sf_dir")
    q.add_argument("--out", default=None,
                   help="write result parquet here instead of printing")
    q.add_argument("--max-rows", type=int, default=40, dest="max_rows")
    q.add_argument("--list", action="store_true")
    q.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    q.set_defaults(fn=cmd_query)

    sc = sub.add_parser("selfcheck", help="install validation: tiny "
                                          "fixture, engine vs refmodel")
    sc.add_argument("--no-actors", action="store_true")
    sc.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    sc.set_defaults(fn=cmd_selfcheck)

    h = sub.add_parser("history", help="update monthly history roll-up")
    h.add_argument("--out", required=True, help="a finished run's out dir")
    h.add_argument("--hist", default=None)
    h.set_defaults(fn=cmd_history)

    lk = sub.add_parser("lookup", help="manage enrichment lookup tables "
                                       "(wcmgr analog)")
    lk.add_argument("op", choices=["list", "add", "del", "purge",
                               "export", "import", "prefill"])
    lk.add_argument("table", help="path to tool_categories.parquet / "
                                  "role_groups.parquet")
    lk.add_argument("key", nargs="?",
                    help="entry key (add/del), TTL seconds (purge), "
                         "CSV/Parquet path (import), or fixture dir "
                         "holding turns/ (prefill)")
    lk.add_argument("value", nargs="?")
    lk.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    lk.set_defaults(fn=cmd_lookup)

    st = sub.add_parser("store", help="versioned table store: commit "
                                      "log, time travel, rollback, "
                                      "vacuum, GDPR forget")
    st.add_argument("op", choices=["init", "apply", "read", "log",
                                   "rollback", "vacuum", "forget"])
    st.add_argument("store", help="store directory")
    st.add_argument("--input", default=None,
                    help="parquet path (init base / apply changes)")
    st.add_argument("--key", default=None, help="key column (init)")
    st.add_argument("--version", type=int, default=None,
                    help="read as-of / rollback target / vacuum floor")
    st.add_argument("--keys", default=None,
                    help="comma-separated int keys (forget)")
    st.add_argument("--out", default=None, help="read output parquet")
    st.add_argument("--num-buckets", type=int, default=32,
                    dest="num_buckets")
    st.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    st.set_defaults(fn=cmd_store)
    return p


def cmd_store(args) -> int:
    """Versioned-store operations from the command line (the
    state-file manager the reference never had): init a base snapshot,
    apply CDC deltas as new versions, read AS OF any version, inspect
    the commit log, rollback (metadata-only), vacuum old history, and
    GDPR-forget keys from every version. One JSON line per op."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from webalizer_ray.state import versioned_store as vs

    if args.op == "init":
        if not args.input or not args.key:
            print("init needs --input and --key", file=sys.stderr)
            return 2
        v = vs.init(rd.read_parquet(args.input), args.store,
                    key=args.key, num_buckets=args.num_buckets)
        print(json.dumps({"op": "init", "version": v}))
    elif args.op == "apply":
        if not args.input:
            print("apply needs --input (changes with seq/op cols)",
                  file=sys.stderr)
            return 2
        v = vs.commit_changes(args.store, rd.read_parquet(args.input))
        print(json.dumps({"op": "apply", "version": v}))
    elif args.op == "read":
        ds = vs.read(args.store, args.version)
        if args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"op": "read", "rows": ds.count(),
                              "out": args.out}))
        else:
            print(ds.to_pandas().to_string(max_rows=40))
    elif args.op == "log":
        for e in vs.versions(args.store):
            print(json.dumps({k: e[k] for k in e
                              if k != "files"}))
    elif args.op == "rollback":
        if args.version is None:
            print("rollback needs --version", file=sys.stderr)
            return 2
        v = vs.rollback(args.store, args.version)
        print(json.dumps({"op": "rollback", "version": v,
                          "rolled_back_to": args.version}))
    elif args.op == "vacuum":
        if args.version is None:
            print("vacuum needs --version (keep floor)", file=sys.stderr)
            return 2
        stats = vs.vacuum(args.store, keep_from=args.version)
        print(json.dumps({"op": "vacuum", **stats}))
    elif args.op == "forget":
        if not args.keys:
            print("forget needs --keys", file=sys.stderr)
            return 2
        from webalizer_ray.state.forget import forget_keys
        rep = forget_keys(args.store,
                          [int(k) for k in args.keys.split(",")])
        print(json.dumps({"op": "forget",
                          "removed": int(rep["removed"].sum()),
                          "files_rewritten":
                              int(rep["rewritten"].sum())}))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
