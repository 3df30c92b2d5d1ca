"""Parallel-capacity window probe (the r09 finding, made a tool).

A single-thread canary CANNOT certify a measurement window: r09 observed
a sustained hypervisor throttle where the solo rotate rate read "clean"
(~440k rows/s at 64d) while 24 threads TOGETHER achieved 0.3x of one
thread's rate — i.e. ~1/70th of nominal parallel capacity. Every
wall-clock number that feeds docs/SCALE.md or a cross-round bench
comparison must therefore carry BOTH readings:

- ``solo``:  best-of-3 single-thread rotate rows/s (BLAS pinned to 1);
- ``scale``: 24-thread aggregate rate / solo (clean host ~= 18-22x;
  below ~5x the window is throttle-bound and walls measure the
  hypervisor, not the code).

Usage:
    python tools/window_probe.py [--dim 64] [--gate 5]

Prints one JSON line; with --gate N exits 0 iff scale >= N (so hunt
loops can `while ! window_probe --gate 18; do sleep 300; done`).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def probe(dim: int = 64, seconds: float = 1.0, threads: int = 24) -> dict:
    from concurrent.futures import ThreadPoolExecutor

    from vectorchord_spark import kernels as K

    prev = K.set_blas_threads(1)
    cm = np.random.default_rng(0).standard_normal((20000, dim)).astype(
        np.float32
    )
    best = min(
        (lambda t0: (K.rotate(cm), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    solo = int(20000 / best)

    def work(_):
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < seconds:
            K.rotate(cm)
            n += 20000
        return n / (time.perf_counter() - t0)

    with ThreadPoolExecutor(threads) as ex:
        agg = sum(ex.map(work, range(threads)))
    if prev is not None and prev > 1:
        K.set_blas_threads(prev)
    return {
        "dim": dim,
        "solo_rotate_rows_per_s": solo,
        f"agg_{threads}t_rows_per_s": int(agg),
        "parallel_scale_24t": round(agg / max(solo, 1), 1),
    }


def main() -> None:
    dim, gate = 64, None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--dim":
            dim = int(args[i + 1])
        if a == "--gate":
            gate = float(args[i + 1])
    out = probe(dim=dim)
    print(json.dumps(out))
    if gate is not None and out["parallel_scale_24t"] < gate:
        sys.exit(1)


if __name__ == "__main__":
    main()
