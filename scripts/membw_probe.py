"""DRAM-bandwidth saturation probe — pins the single-box 8->32 scaling
ceiling as hardware (VERDICT r4 item 6).

N independent processes each stream-copy a 64 MiB buffer (far beyond
LLC) for a fixed window; aggregate copy bandwidth vs N shows where the
shared memory subsystem saturates.  If aggregate GB/s stops growing
between 8 and 32 workers, a 32-CPU run of any bandwidth-bound pipeline
on THIS box cannot be 4x an 8-CPU run — real clusters add memory
channels with nodes, one box does not.

Usage: python scripts/membw_probe.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

MB = 64  # per-worker buffer, MiB (LLC on this class of box is ~32-64 MB total)
SECONDS = 3.0


def _worker(q: mp.Queue, barrier, seconds: float, mb: int) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.uint64)
    b = np.empty_like(a)
    np.copyto(b, a)  # touch pages before timing
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    el = time.perf_counter() - t0
    # a stream copy reads a and writes b: 2x buffer traffic per pass
    q.put(n * mb * 2 / el)  # MiB/s for this worker


def measure(n_workers: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n_workers)
    procs = [
        mp.Process(target=_worker, args=(q, barrier, SECONDS, MB))
        for _ in range(n_workers)
    ]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / 1024.0  # GiB/s aggregate


def main() -> None:
    out = {}
    for n in (1, 2, 4, 8, 16, 32):
        out[str(n)] = round(measure(n), 2)
    agg8, agg32 = out["8"], out["32"]
    print(
        json.dumps(
            {
                "metric": "memcpy_aggregate_gib_per_sec",
                "per_workers": out,
                "ratio_32_over_8": round(agg32 / agg8, 3),
                "note": (
                    "ratio ~1.0 = memory subsystem saturated by 8 workers; "
                    "a 4x CPU step cannot yield 4x for bandwidth-bound work"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
