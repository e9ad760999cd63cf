"""Cluster job entrypoint for the flagship pipeline.

Submit to a running Ray cluster (the north-rule deployment shape):

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python tools/job_flagship.py \
           --input /data/turns --out /data/out --resume

Inside a submitted job ``ray.init()`` with no address auto-connects to
the hosting cluster; run standalone (no cluster) it falls back to
local mode, so the same script is the single-node smoke test. The
pipeline itself is the resumable flagship: per-partition checkpoints
with lineage mean a re-submitted job skips finished units instead of
double-counting — kill the job, submit again, the digests match.

Prints one JSON line (the same metrics contract as bench.py) so the
submitting harness can scrape throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="fixture/turns dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="per-partition checkpoint resume (skip "
                         "finished units)")
    ap.add_argument("--config", default=None, help="PipelineConfig JSON")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="LOCAL fallback only; ignored on a cluster")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS") or args.num_cpus is None:
            ray.init()  # in-job: auto-connect to the hosting cluster
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)

    from webalizer_ray.run import load_config

    cfg = load_config(args.config, [])
    t0 = time.perf_counter()
    if args.resume:
        from webalizer_ray.state.checkpoint import run_flagship_resumable
        res = run_flagship_resumable(args.input, args.out, config=cfg)
    else:
        from webalizer_ray.pipelines.flagship import run_flagship
        res = run_flagship(args.input, args.out, config=cfg)
    wall = time.perf_counter() - t0

    metrics = dict(res.get("metrics", {})) if isinstance(res, dict) else {}
    total = int(metrics.get("total_rec", 0))
    print(json.dumps({
        "metric": "flagship wall sec (ray job)",
        "value": round(wall, 3), "unit": "sec",
        "turns": total,
        "turns_per_sec": int(total / wall) if total else None,
        "out": args.out, "resumed": bool(args.resume),
        "cluster_resources": {k: v for k, v in
                              ray.cluster_resources().items()
                              if k in ("CPU", "memory")},
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
