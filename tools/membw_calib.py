"""Memory-bandwidth scaling calibration: aggregate copy bandwidth with N
parallel workers. The CDC replay's profile is memory-traffic-dominated
(parquet decode -> shuffle serialize -> sort -> parquet encode moves each
byte many times), so the box's *bandwidth* scaling — not its core count —
bounds the replay's achievable N->4N efficiency.

Usage: python tools/membw_calib.py <workers> [mb_per_worker] -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, reps: int, q) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(reps):
        b[:] = a  # streaming copy: 1 read + 1 write per byte
    q.put(2.0 * mb * reps / (time.time() - t0))  # MB/s moved


def main() -> None:
    workers = int(sys.argv[1])
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = 8
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(mb, reps, q)) for _ in range(workers)]
    t0 = time.time()
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    agg = 2.0 * mb * reps * workers / wall
    print(json.dumps({"workers": workers, "agg_mb_s": round(agg, 1),
                      "wall_sec": round(wall, 2)}))


if __name__ == "__main__":
    main()
