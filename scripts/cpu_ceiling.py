"""Pinned-workload CPU-ceiling control for the N→4N scaling protocol.

Measures this host's pure-CPU per-worker throughput ratio between the two
parallelism levels the crawl benchmark uses (6 fetch workers at 8 cpus,
24 at 32 cpus): each worker runs an identical parse-like workload
(sha1 + regex + small numpy) for a fixed wall window; the ceiling is
(agg24 / 24) / (agg6 / 6). Any end-to-end crawl scaling efficiency is
bounded above by this number on this host (shared memory bandwidth +
hypervisor steal), independent of engine design.

Usage: python scripts/cpu_ceiling.py [seconds_per_level]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import re
import sys
import time

_WORD = re.compile(r"\w+")


def _burn(args):
    seconds, seed = args
    import numpy as np
    rng = np.random.RandomState(seed)
    text = " ".join("w%d" % i for i in range(200))
    ops = 0
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        h = hashlib.sha1((text + str(ops)).encode()).hexdigest()
        _WORD.findall(text)
        a = rng.rand(256)
        (a * a).sum()
        ops += 1
    return ops


def level(p: int, seconds: float) -> float:
    with mp.Pool(p) as pool:
        t0 = time.perf_counter()
        ops = pool.map(_burn, [(seconds, i) for i in range(p)])
        _ = time.perf_counter() - t0
    return sum(ops) / seconds


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    import json
    lo_w, hi_w = 6, 24
    # interleave to dampen steal windows
    lo_runs, hi_runs = [], []
    for _ in range(3):
        lo_runs.append(level(lo_w, secs))
        hi_runs.append(level(hi_w, secs))
    lo = max(lo_runs)
    hi = max(hi_runs)
    print(json.dumps({
        "metric": "cpu_ceiling",
        "workers_lo": lo_w, "workers_hi": hi_w,
        "ops_per_sec_lo": round(lo, 1), "ops_per_sec_hi": round(hi, 1),
        "ops_lo_runs": [round(x, 1) for x in lo_runs],
        "ops_hi_runs": [round(x, 1) for x in hi_runs],
        "per_worker_ceiling": round((hi / hi_w) / (lo / lo_w), 3),
    }))
