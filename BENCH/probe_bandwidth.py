# 8-way parallel memcpy probe: approximates the 32-way aggregate-bandwidth
# regime that single-threaded probes miss
import multiprocessing as mp, time, numpy as np
def worker(q):
    a = np.empty(2**26, dtype=np.uint8); a[:] = 1
    t0 = time.perf_counter()
    for _ in range(10): a.copy()
    q.put(time.perf_counter() - t0)
if __name__ == "__main__":
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(8)]
    t0 = time.perf_counter()
    [p.start() for p in ps]; times = [q.get() for _ in ps]; [p.join() for p in ps]
    wall = time.perf_counter() - t0
    total_gb = 8 * 10 * (2**26) * 2 / 1e9
    print(f"8-way aggregate: {total_gb/wall:.1f} GB/s (wall {wall:.1f}s, per-proc {min(times):.1f}-{max(times):.1f}s)")
