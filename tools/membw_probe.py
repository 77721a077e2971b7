"""Memory-bandwidth probe: quantify this VM's shared-bus ceiling.

The scaling ladder's 8→32 efficiency (~0.3) is attributed to memory-bus
saturation, not to the Spark plan.  This probe measures that claim
WITHOUT Spark: N independent processes each run a STREAM-triad-style
numpy kernel (c = a + 0.5*b over arrays far larger than LLC), and the
aggregate bandwidth is summed.  If the hardware scaled linearly,
aggregate GB/s would grow ~N×; the measured curve shows where the
socket's bus saturates — the same knee the pipeline hits, since its
hot path (Arrow batches + parquet encode) is bandwidth-bound once
enough cores are scoring.

Usage: python tools/membw_probe.py [--levels 1 8 32] [--mb 256]
Prints one JSON line: {"levels": {N: aggregate_GBps}, ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _worker(mb: int, n_iter: int, q) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.zeros(n)
    c[:] = a + 0.5 * b  # touch everything once (page-in, untimed)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c[:] = a + 0.5 * b
    dt = time.perf_counter() - t0
    q.put(3 * a.nbytes * n_iter / dt / 1e9)  # 3 streams per triad


def measure(nproc: int, mb: int, n_iter: int) -> float:
    q = mp.get_context("spawn").Queue()
    ps = [
        mp.get_context("spawn").Process(target=_worker, args=(mb, n_iter, q))
        for _ in range(nproc)
    ]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    out = {}
    for n in args.levels:
        gbps = measure(n, args.mb, args.iters)
        out[n] = round(gbps, 1)
    scale = {
        f"{a}->{b}": round(out[b] / out[a] / (b / a), 3)
        for a, b in zip(args.levels, args.levels[1:])
    }
    print(json.dumps({
        "aggregate_triad_GBps": out,
        "bw_scaling_efficiency": scale,
        "array_mb_per_proc": args.mb,
    }))


if __name__ == "__main__":
    main()
