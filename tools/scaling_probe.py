"""Host-health probe + scaling campaign gate (see BASELINE.md "Scaling protocol").

The sandbox VM shares an oversubscribed host: hypervisor steal arrives in
minute-scale bursts of 8-12 cores and per-core delivered speed swings ~15x
between windows. A scaling pair (N vs 4N workers) is only honest when BOTH
legs run in a verified-healthy window, so every campaign is gated by this
probe:

  1. 16-way pure-CPU burn for ~8 s must deliver >= 14.5 effective cores
     with ~0 steal (host is actually granting our vCPUs);
  2. the single-thread fused-window kernel rate is recorded as the window's
     *speed fingerprint* — both legs of a pair must agree within 25%.

Usage:
  python tools/scaling_probe.py            # one probe, prints JSON verdict
  python tools/scaling_probe.py --watch    # loop until healthy, then exec
                                           # `python bench.py --scaling` with
                                           # the current environment
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

NCPU = os.cpu_count() or 32


def _stat():
    with open("/proc/stat") as f:
        v = f.readline().split()
    busy = int(v[1]) + int(v[2]) + int(v[3])
    steal = int(v[8]) if len(v) > 8 else 0
    return busy, steal


def _burn(seconds: float) -> None:
    import numpy as np

    x = np.random.default_rng(0).standard_normal(4096)
    t0 = time.time()
    while time.time() - t0 < seconds:
        x = np.sqrt(np.abs(x) + 1.0)


def burn_probe(nproc: int = 16, seconds: float = 8.0) -> dict:
    """Effective cores delivered to an nproc-way pure-CPU burn."""
    b0, s0 = _stat()
    t0 = time.time()
    procs = [mp.Process(target=_burn, args=(seconds,)) for _ in range(nproc)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.time() - t0
    b1, s1 = _stat()
    return {
        "burn_nproc": nproc,
        "burn_effective_cores": round((b1 - b0) / 100.0 / wall, 1),
        "burn_steal_cores": round((s1 - s0) / 100.0 / wall, 1),
    }


def kernel_fingerprint(n: int = 120_000) -> float:
    """Single-thread fused-window kernel rate (turns/s) — the window's speed
    fingerprint. Pure in-process numpy, no Ray."""
    import numpy as np

    from chronoxtract_ray.kernels.windowed import FeatureSpec, compute_windowed_features

    rng = np.random.default_rng(7)
    ts = np.arange(n, dtype=np.int64) * 1_000_000
    vals = rng.standard_normal(n)
    t0 = time.time()
    compute_windowed_features(ts, vals, 60_000_000, FeatureSpec())
    return round(n / (time.time() - t0), 1)


def probe() -> dict:
    r = burn_probe()
    r["kernel_turns_per_s_1t"] = kernel_fingerprint()
    r["healthy"] = r["burn_effective_cores"] >= 14.5 and r["burn_steal_cores"] < 1.0
    r["ts"] = round(time.time(), 1)
    return r


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if "--watch" in sys.argv:
        while True:
            r = probe()
            print(json.dumps(r), flush=True)
            if r["healthy"]:
                os.execv(sys.executable, [sys.executable, "bench.py", "--scaling"])
            time.sleep(60)
    else:
        print(json.dumps(probe()))


if __name__ == "__main__":
    main()
