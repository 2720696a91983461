"""Environment ceiling probes backing BENCH.md's scaling analysis.

Two micro-benchmarks that bound what ANY job can show in this sandbox:
- cpu: pure-compute scaling across processes (no allocation in the loop)
- mem: fresh anonymous-page write throughput at 1/8/32 processes

Usage: python scripts/sandbox_probes.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _burn(_: int) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def _touch(sz_mb: int) -> float:
    t0 = time.time()
    a = np.empty(sz_mb * 1024 * 1024 // 8)
    a[:] = 1.0
    return time.time() - t0


def main() -> None:
    out: dict = {}
    for n in (8, 32):
        with mp.Pool(n) as p:
            iters = sum(p.map(_burn, range(n)))
        out[f"cpu_iters_{n}p"] = iters
    out["cpu_scaling_8_to_32"] = round(out["cpu_iters_32p"] / out["cpu_iters_8p"], 2)
    out["cpu_efficiency_8_to_32"] = round(out["cpu_scaling_8_to_32"] / 4.0, 2)

    for n in (1, 8, 32):
        with mp.Pool(n) as p:
            p.map(_touch, [1] * n)  # pool warm-up
            t0 = time.time()
            p.map(_touch, [200] * n)
            wall = time.time() - t0
        out[f"fresh_write_MBps_{n}p"] = round(n * 200 / wall)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
