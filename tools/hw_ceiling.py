"""Measure this box's intrinsic thread-scaling ceilings, independent of
Spark — the denominators for interpreting BENCH/BASELINE.md.

Two probes:
  cpu    register-bound spin (no memory traffic): isolates host steal /
         scheduler effects.
  membw  streaming 64MB numpy sums: isolates the single memory bus.

Prints one JSON line: aggregate work at 1/2/4/8/16 workers plus pairwise
efficiencies. On a real cluster, 4x executors bring 4x memory buses, so
the membw ceiling applies ONLY to same-box thread scaling.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

SECONDS = 6


def _spin(q):
    t0 = time.time()
    n = 0
    x = 1.0001
    while time.time() - t0 < SECONDS:
        for _ in range(100_000):
            x = x * 1.0000001 % 7
        n += 1
    q.put(n)


def _stream(q):
    import numpy as np

    buf = np.frombuffer(np.random.bytes(64 * 1024 * 1024), dtype=np.int64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        buf.sum()
        n += 1
    q.put(n * 64)  # MB streamed


def measure(fn, workers: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q,)) for _ in range(workers)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps) / SECONDS


def main() -> None:
    out: dict = {}
    for name, fn in (("cpu", _spin), ("membw_mb_per_s", _stream)):
        agg = {w: round(measure(fn, w), 1) for w in (1, 2, 4, 8, 16)}
        out[name] = agg
        out[f"{name}_eff_2_to_8"] = round((agg[8] / agg[2]) / 4, 3)
        out[f"{name}_eff_4_to_16"] = round((agg[16] / agg[4]) / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
