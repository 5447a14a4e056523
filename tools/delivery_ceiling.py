"""Host delivery-ceiling probe at two widths (VERDICT r3 task 2 fallback).

Measures what this VM can physically deliver from N to 4N parallel workers,
independent of any engine: (a) a pure-compute spin (no memory traffic — the
vcpu-delivery ceiling) and (b) GIL-released sha256 hashing over a shared
64 MiB buffer (the memory-bandwidth ceiling). Both use one subprocess per
worker (like Spark's Python workers), warmed before timing.

The ratio `rate(4N) / rate(N) / 4` of each probe bounds the scaling
efficiency ANY engine can show between the same two widths on this box; a
rollup-job efficiency close to these bounds is host-limited, not
plan-limited. Run during a quiet window (check cal/steal first):

    python tools/delivery_ceiling.py 4 16
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _spin_worker(dur: float, out):
    # pure-Python integer spin: no memory bandwidth, no GIL sharing
    t_end = time.perf_counter() + dur
    n = 0
    x = 1
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10_000
    out.put(n)


def _hash_worker(dur: float, out):
    # sha256 over a 64 MiB buffer: releases the GIL, streams memory
    import hashlib
    buf = bytes(64 * 1024 * 1024)
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        hashlib.sha256(buf).digest()
        n += len(buf)
    out.put(n)


def _stream_worker(dur: float, out):
    # numpy large-array copy: pure memory streaming (read+write), the probe
    # that actually saturates the socket — sha256 at ~1.4 GB/s/core is
    # CPU-bound long before the memory system is
    import numpy as np
    src = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB
    dst = np.empty_like(src)
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
        n += src.nbytes * 2  # read + write
    out.put(n)


def _stream_warm_worker(dur: float, out):
    # _stream_worker with an in-process untimed warm loop: spawning fresh
    # processes per probe puts 512 MiB of first-touch page faults inside
    # (or racing) the timed window, which read 3-80 GB/s on an idle box.
    # Faulting everything in and streaming untimed for 1.5 s first gives
    # 174-238 GB/s repeatably at 16-wide on a healthy phase (r8).
    import numpy as np
    src = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB
    dst = np.empty_like(src)
    t_end = time.perf_counter() + 1.5
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
        n += src.nbytes * 2  # read + write
    out.put(n)


def stream_bw(width: int, dur: float = 2.0) -> float:
    """Delivered memory bandwidth (bytes/s) at `width` streams, warmed.
    The host-phase instrument for the scaling collector and bench gate."""
    return _run(width, _stream_warm_worker, dur)


def _run(width: int, worker, dur: float = 8.0) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(dur, q)) for _ in range(width)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / dur


def main():
    args = sys.argv[1:3]
    if len(args) == 1:
        raise SystemExit("usage: delivery_ceiling.py [LO HI] (both or neither)")
    lo, hi = (int(a) for a in (args or ("4", "16")))
    res = {"widths": [lo, hi]}
    for name, worker in (("spin", _spin_worker), ("hash_membw", _hash_worker),
                         ("stream_membw", _stream_worker)):
        # warm one short pass (first heavy op in a fresh process runs slow
        # on this VM — see BENCH/BASELINE.md), then time both widths
        # back-to-back so they see the same host phase
        _run(lo, worker, 1.0)
        r_lo = _run(lo, worker)
        r_hi = _run(hi, worker)
        res[name] = {
            f"rate_{lo}": r_lo, f"rate_{hi}": r_hi,
            "ratio": r_hi / r_lo,
            "ceiling_eff": r_hi / r_lo / (hi / lo),
        }
        print(f"{name}: {lo}-wide {r_lo:.3g}/s, {hi}-wide {r_hi:.3g}/s, "
              f"eff ceiling {res[name]['ceiling_eff']:.3f}", flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH",
                           "CEILING_%d_to_%d.json" % (lo, hi)), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
