"""Host-health microprobe: separates ENGINE regressions from HOST drift.

Measures (a) pure-compute speed on already-touched memory and (b)
first-touch allocation bandwidth — the two axes that have drifted on
this sandbox. Bench numbers recorded in BASELINE.md reference this
probe so a slow wall-clock can be attributed honestly.

Usage: python tools/host_probe.py
Healthy reference (round-3 first session): loop ~1.3s, sum ~0.05s,
alloc+add ~0.5s. Degraded host observed 2026-08-18: alloc+add ~60s
(first-touch page faults ~0.6 ms each) while loop/sum stayed normal.
"""

import time

import numpy as np


def main() -> None:
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    loop = time.time() - t0

    x = np.random.rand(5_000_000)  # small: warm the allocator
    x.sum()
    t0 = time.time()
    y = np.zeros(50_000_000)
    z = y + 1.0  # first-touch of ~800 MB fresh pages
    alloc = time.time() - t0
    t0 = time.time()
    z.sum()
    summ = time.time() - t0
    print({"py_loop_20M_s": round(loop, 2),
           "alloc_add_800MB_s": round(alloc, 2),
           "sum_400MB_s": round(summ, 3),
           "verdict": "DEGRADED (first-touch)" if alloc > 5 else "ok"})


if __name__ == "__main__":
    main()
