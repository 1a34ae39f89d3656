"""Host CPU-capacity microbenchmark — the reference frame for scaling numbers.

This sandbox VM advertises 32 vCPUs but is a shared-tenancy guest: aggregate
achievable throughput for memory-heavy numpy work is both sub-linear in
process count AND time-varying. Any build-scaling efficiency must be read
against the ceiling this microbenchmark measures AT THE SAME TIME.

Usage: python tools/cpu_capacity.py [N N ...]   (default 1 2 4 8 16 32)
Prints one JSON line: {"capacity": {N: best_aggregate_units_per_sec}, ...}
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

WORK = """
import numpy as np, time
t0=time.perf_counter()
a = np.random.default_rng(0).integers(0, 1<<40, 3_000_000)
for _ in range(12):
    b = np.sort(a); c = b.cumsum(); d = c.astype(np.float64)*1.5
print(time.perf_counter()-t0)
"""


def measure(n: int, trials: int = 3) -> float:
    best = 0.0
    for _ in range(trials):
        procs = [
            subprocess.Popen([sys.executable, "-c", WORK], stdout=subprocess.PIPE)
            for _ in range(n)
        ]
        times = [float(p.communicate()[0]) for p in procs]
        best = max(best, n / statistics.mean(times))
    return round(best, 2)


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    cap = {n: measure(n) for n in ns}
    out = {"capacity": cap}
    if 8 in cap and 32 in cap:
        out["ceiling_eff_8_to_32"] = round((cap[32] / cap[8]) / 4, 3)
    if 2 in cap and 8 in cap:
        out["ceiling_eff_2_to_8"] = round((cap[8] / cap[2]) / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
