"""Pure-CPU scaling calibration for the sandbox host.

The BASELINE.json contract is throughput scaling efficiency >= 0.8 from N
to 4N parallelism. Before attributing a shortfall to the engine, measure
what THIS host delivers for embarrassingly-parallel CPU-bound work with no
Spark, no JVM, no shuffles: K independent processes each doing identical
fixed work (integer hashing + numpy set-intersection, approximating the
scoring stage's profile). Efficiency = (ops/s at 4N) / (ops/s at N) / 4.

If this prints ~1.0, the host has no frequency/SMT ceiling and any engine
shortfall is real; if it prints c < 1, c is the honest ceiling to
normalize against.

Usage: python tools/cpu_calibration.py [n_low] [n_high]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORKER = r"""
import time, numpy as np
rng = np.random.default_rng(42)
arrs = [np.sort(rng.integers(0, 1 << 40, size=160)) for _ in range(64)]
t0 = time.time(); ops = 0
while time.time() - t0 < 15.0:
    for i in range(0, 64, 2):
        np.intersect1d(arrs[i], arrs[i + 1], assume_unique=True)
        h = 1469598103934665603
        for v in range(200):
            h = ((h ^ v) * 1099511628211) & ((1 << 64) - 1)
        ops += 1
print(ops / (time.time() - t0))
"""


def run_k(k: int) -> float:
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER], stdout=subprocess.PIPE, text=True)
        for _ in range(k)
    ]
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += float(out.strip().splitlines()[-1])
    return total


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    low = run_k(n_low)
    high = run_k(n_high)
    eff = (high / low) / (n_high / n_low)
    print(
        json.dumps(
            {
                "workload": "pure-CPU calibration (numpy intersect + int hashing), no Spark",
                "n_low": n_low,
                "ops_per_sec_low": round(low, 1),
                "n_high": n_high,
                "ops_per_sec_high": round(high, 1),
                "ceiling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
