"""Measure aggregate DRAM streaming bandwidth vs process concurrency.

Why this exists (round 4): the two-cluster-size criterion compares the
extraction flagship at local[2] vs local[8]. r4l (the first 4M-row-era
run) showed the 8-thread legs losing ~20% per-CPU-second throughput
relative to the 2-thread legs (cpu_parity 0.787) with no fixed-overhead
share left to blame. The suspect is the guest's shared memory bus: if
aggregate streaming bandwidth stops growing past ~2 concurrent
processes, then ANY memory-streaming job — however well partitioned —
cannot show 4x wall scaling from 2 to 8 cores on this box, and the
honest criterion account is the bandwidth ceiling, not engine quality
(the same account BENCH/BASELINE.md already gives for the thin murmur3
mode, which saturates at 2 threads).

The probe: N worker processes (N in 1,2,4,8), each streaming a PRIVATE
256 MB uint64 buffer with the same numpy right_shift kernel as
bench._box_health, for a fixed wall window after a barrier. Reports
per-N aggregate GB/s (read+write traffic) and the scaling ratio vs N=1.
Private buffers mean zero sharing/false-sharing between workers — a
bus with headroom must scale aggregate bandwidth ~linearly.

Usage: python scripts/probe_bus_concurrency.py [seconds_per_level]
Prints one JSON line.
"""

import json
import multiprocessing as mp
import sys
import time


def _worker(barrier, stop_t, out_q):
    import numpy as np

    buf = np.empty(32 * 1024 * 1024, dtype=np.uint64)  # 256 MB
    buf[:] = 0x9E3779B97F4A7C15
    np.right_shift(buf, 1, out=buf)  # fault pages in before the barrier
    barrier.wait()
    iters = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < stop_t:
        np.right_shift(buf, 1, out=buf)
        iters += 1
    dt = time.perf_counter() - t0
    out_q.put(iters * buf.nbytes * 2 / dt / 1e9)  # read+write GB/s


def level(n: int, seconds: float) -> float:
    barrier = mp.Barrier(n)
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(barrier, seconds, q))
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    out = {"seconds_per_level": seconds, "aggregate_gbps": {}}
    for n in (1, 2, 4, 8):
        out["aggregate_gbps"][str(n)] = round(level(n, seconds), 2)
    base = out["aggregate_gbps"]["1"]
    out["scaling_vs_1"] = {
        k: round(v / base, 2) for k, v in out["aggregate_gbps"].items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
