"""Measure aggregate memory bandwidth at k concurrent streams — the
physical magnitude of the single-box artifact in the 2v8 scaling
pairs (BENCH/SCALING_FLOOR.md).

local[2] vs local[8] runs 2 vs 8 concurrent task streams against the
SAME memory subsystem; the pipeline's fattest stages (wide-string
shuffles, tmpfs barrier I/O, Arrow batches) are bandwidth-heavy, so
the slice of work that runs at bus rate speeds up by the measured
aggregate-bandwidth ratio, not the core ratio. This script measures
that ratio directly: k processes each stream-copy a buffer far larger
than L3 for a fixed interval; aggregate GB/s per k is the machine's
R(k) curve. A real N→4N cluster multiplies buses with nodes (R scales
with the cluster); the single box cannot — which is exactly the
artifact the 1v4 pairing avoids (4 streams stay inside one bus's
clean regime).

Run EXCLUSIVELY: python scripts/measure_membw.py [k ...]
Defaults: 1 2 4 8. Results + arithmetic recorded in
BENCH/SCALING_FLOOR.md (round 5 addendum).
"""

import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 256
SECONDS = 6.0


def worker(q):
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # warm both buffers (fault pages in before timing)
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # copy reads + writes BUF bytes: count 2x traffic
    q.put(2 * n * BUF_MB / 1024.0 / dt)


def measure(k: int, reps: int = 3) -> float:
    best = 0.0
    for _ in range(reps):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(k)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        best = max(best, total)
    return best


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    base = None
    out = {}
    for k in ks:
        gbs = measure(k)
        out[k] = gbs
        if base is None:
            base = (k, gbs)
        print(f"k={k}: aggregate {gbs:6.1f} GB/s  "
              f"(x{gbs / out[ks[0]] :.2f} vs k={ks[0]})", flush=True)
    if 2 in out and 8 in out:
        print(f"R(8)/R(2) = {out[8]/out[2]:.2f} (ideal 4.00) — the 2v8 "
              "bus-bound speedup cap")
    if 1 in out and 4 in out:
        print(f"R(4)/R(1) = {out[4]/out[1]:.2f} (ideal 4.00) — the 1v4 "
              "bus-bound speedup cap")


if __name__ == "__main__":
    main()
