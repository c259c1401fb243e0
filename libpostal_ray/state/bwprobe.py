"""The host memory-bandwidth probe — ONE implementation, shared by
``bench.py`` (per-run context number in the JSON) and
``BENCH/probe_bandwidth.py`` (the manual measure-before-trusting gate).

Why it exists: this host's DRAM is shared with invisible neighbors and
swings ~5.5 -> 0.3 GB/s on multi-minute timescales; single-threaded probes
read normal even while 32-way work is throttled 5x (BENCH/BASELINE.md,
session-5 section).  Only a MULTI-process aggregate copy reproduces the
regime real pipeline kernels run in — and only one shared parameterization
keeps the bench JSON number and the manual gate comparable.
"""

from __future__ import annotations

# one canonical parameterization: 8 procs x (2^26 bytes x 6 copies) x
# (read+write) = ~6.4 GB moved; ~1.2 s quiet, ~20 s fully interfered
PROCS = 8
SIZE = 2**26
COPIES = 6


def aggregate_bandwidth_gbps(
    procs: int = PROCS, size: int = SIZE, copies: int = COPIES
) -> tuple[float, float, list[float]]:
    """Run the aggregate memcpy probe; returns (gbps, wall_s, per_proc_s)."""
    import multiprocessing as mp
    import time

    import numpy as np

    def worker(q):
        a = np.empty(size, dtype=np.uint8)
        a[:] = 1
        t0 = time.perf_counter()
        for _ in range(copies):
            a.copy()
        q.put(time.perf_counter() - t0)

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(q,)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    gbps = round(procs * copies * size * 2 / 1e9 / wall, 2)
    return gbps, round(wall, 2), sorted(round(t, 2) for t in times)
