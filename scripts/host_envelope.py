"""Host-envelope controls for the scaling studies.

Two pure (Spark-free, JVM-free) probes, each run at 2 and 8 pinned
cores, measuring how the HOST itself scales:

- cpu: a register-resident floating-point loop — no memory traffic.
  Upper bound: what perfectly parallel compute gets on this box.
- membw: a streaming 64 MiB numpy copy per process — pure memory
  traffic. Lower bound: what bandwidth-bound work gets on this box.

Any real job lands between the two. The index build mixes compute
(regex, varint encode) with allocation/GC and shuffle (memory
streaming), so its ceiling on THIS BOX is strictly below the cpu
probe's 2->8 efficiency — the memory system is shared by every core.
On a real N -> 4N cluster each node brings its own memory channels,
so the membw bound scales ~1.0 by construction and the job's own
efficiency (partitioning / shuffle / skew) is the only limiter.

Writes benchmarks/host_envelope.json.
Usage: python scripts/host_envelope.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]


def _burn_cpu(q, dur: float) -> None:
    t_end = time.time() + dur
    n = 0
    x = 1.0
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 0.5
        n += 1
    q.put(n)


def _burn_membw(q, dur: float) -> None:
    buf = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
    buf[::4096] = 1  # fault pages in
    dst = np.empty_like(buf)
    t_end = time.time() + dur
    n = 0
    while time.time() < t_end:
        np.copyto(dst, buf)
        n += 1
    q.put(n * 64)  # MiB copied


def _run(target, nproc: int, dur: float) -> tuple[float, float]:
    q = mp.Queue()
    t0, s0 = _steal()
    ps = [mp.Process(target=target, args=(q, dur)) for _ in range(nproc)]
    for i, p in enumerate(ps):
        p.start()
        os.sched_setaffinity(p.pid, {i})
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    t1, s1 = _steal()
    return total / dur, 100.0 * (s1 - s0) / max(t1 - t0, 1)


def main() -> None:
    dur = 15.0
    out: dict = {"n_low": 2, "n_high": 8, "probes": {}}
    for name, fn, unit in (("cpu", _burn_cpu, "iters/s"),
                           ("membw", _burn_membw, "MiB/s")):
        lo, st_lo = _run(fn, 2, dur)
        hi, st_hi = _run(fn, 8, dur)
        out["probes"][name] = {
            "unit": unit,
            "rate_2core": round(lo, 1),
            "rate_8core": round(hi, 1),
            "speedup": round(hi / lo, 3),
            "scaling_efficiency": round((hi / lo) / 4.0, 3),
            "steal_pct": [round(st_lo, 1), round(st_hi, 1)],
        }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "benchmarks", "host_envelope.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
