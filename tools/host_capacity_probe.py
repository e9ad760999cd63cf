"""Host parallel-capacity probe (evidence for BASELINE.md's scaling note).

A pure-CPU burn (no memory traffic, no I/O) measures how much real
parallelism this machine delivers at each process count. On a dedicated
32-core box the speedup column would read ≈ n; on this shared sandbox it
saturates well below 32, which is why the engine's scaling evidence uses
the (1, 4) CPU pair — the only N-vs-4N step that fits inside the host's
actual capacity (bench.py --scaling).

Usage: python tools/host_capacity_probe.py [counts...]
Prints one JSON line: {"1": speedup, "4": ..., ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def burn(_):
    x = 0
    for i in range(10**7):
        x += i * i
    return x


def main(counts) -> dict:
    t0 = time.time()
    burn(0)
    one = time.time() - t0
    out = {}
    for n in counts:
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(burn, range(n))
            dt = time.time() - t0
        out[str(n)] = round(one * n / dt, 1)
    return out


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    print(json.dumps(main(counts)))
