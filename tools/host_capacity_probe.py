"""Spark-free host parallel-capacity probe.

Justifies the N→4N window used by tools/bench_scaling.py: measures how
aggregate numpy throughput scales with process count on this machine.
On an overcommitted/SMT host, throughput saturates well below nproc —
strong-scaling evidence must be taken inside the linear region.
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np

TASKS = 64


def work(_):
    v = np.arange(400_000, dtype=np.float64)
    for _ in range(300):
        v = np.sqrt(v * 1.0001 + 1.0)
    return float(v[-1])


def main() -> None:
    res = {}
    for nproc in (1, 2, 4, 8, 16, 32):
        with mp.Pool(nproc) as p:
            p.map(work, range(nproc))  # warm forks
            t0 = time.perf_counter()
            p.map(work, range(TASKS))
            res[nproc] = time.perf_counter() - t0
            print(f"nproc={nproc:2d} wall={res[nproc]:6.2f}s")
    for a, b in [(1, 4), (2, 8), (4, 16), (8, 32)]:
        print(f"{a}->{b}: speedup={res[a]/res[b]:.2f} efficiency={(res[a]/res[b])/4:.3f}")


if __name__ == "__main__":
    main()
