#!/usr/bin/env python
"""Memory-bandwidth scaling probe: N pinned processes each stream-copy a
256 MB numpy buffer for ~3 s; reports aggregate GB/s at each N.

Motivation (BENCH_SCALING.md): the index build's heavy stages are
memory-traffic-bound (Arrow IPC, varint packing, snappy/parquet encode,
tmpfs writes), so if this VM's effective DRAM bandwidth saturates at a low
stream count, no amount of process/JVM isolation makes the build scale past
that point — the ceiling is the box, not the engine. A real cluster adds
DRAM channels with every node; this box does not.

    python tools/membw_probe.py --levels 1 4 16
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

MB = 256
SECS = 3.0


def _worker(cpu: int, barrier: "mp.Barrier", q: mp.Queue) -> None:
    # wrap around the CPU count: a worker that died in sched_setaffinity
    # (level > nproc) would leave the barrier and q.get() waiting forever
    os.sched_setaffinity(0, {cpu % os.cpu_count()})
    src = np.ones(MB * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # prefault both buffers before the timed window
    barrier.wait()  # all procs enter the timed window together
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # copy reads src + writes dst: 2x traffic
    q.put(2.0 * n * MB / 1024.0 / dt)


def measure(n_procs: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n_procs)
    procs = [mp.Process(target=_worker, args=(i, barrier, q)) for i in range(n_procs)]
    for p in procs:
        p.start()
    # bounded wait: a crashed worker must surface as an error, not a hang
    total = sum(q.get(timeout=SECS * 10 + 30) for _ in procs)
    for p in procs:
        p.join()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    args = ap.parse_args()
    out = {}
    for n in args.levels:
        gbps = measure(n)
        out[str(n)] = round(gbps, 2)
        print(f"{n:3d} procs: {gbps:7.2f} GB/s aggregate "
              f"({gbps / n:6.2f} GB/s per proc)")
    print(json.dumps({"metric": "membw_scaling_gbps", **out}))


if __name__ == "__main__":
    main()
