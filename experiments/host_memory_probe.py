"""Host memory-path probes behind the round-5 scaling-variance diagnosis.

Three tiny, dependency-free measurements that separate the possible causes
of the narrow-leg core-seconds inflation seen in experiments/scale_probe.py
(same stage, same input, task core-seconds varying 2-4x run to run while
the guest is idle):

  triad  -- STREAM-triad-like steady-state bandwidth on a warmed buffer.
            Stable => the memory bus itself is not the noisy resource.
  fault  -- first-touch throughput on FRESH large allocations (the page
            fault + kernel zeroing path every new numpy/Arrow buffer pays).
            This is the number that swings: measured 0.12-1.2 GB/s on the
            same box minutes apart (2026-08-18), an 8x spread invisible to
            guest loadavg/steal.
  steal  -- /proc/stat busy/steal while a load runs, to rule hypervisor
            CPU steal in or out (measured <= 3.7% during legs: out).

Usage: python experiments/host_memory_probe.py [triad|fault|steal|all]

Findings (recorded in BASELINE.md "Round-5 variance investigation"):
fresh-page supply is the host-contended resource; kernels that reuse
buffers (the WAND query path with its per-shard decode cache) are immune,
kernels that first-touch GBs per run (encode/build) inherit the swing.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def triad(n: int = 64_000_000, passes: int = 6) -> None:
    """Steady-state bandwidth: a = b + 1.5*c over a ~1.5 GB working set."""
    b = np.random.rand(n)
    c = np.random.rand(n)
    a = np.empty(n)
    gb = n * 8 * 3 / 1e9
    for i in range(passes):
        t0 = time.perf_counter()
        np.multiply(c, 1.5, out=a)
        np.add(a, b, out=a)
        dt = time.perf_counter() - t0
        tag = " (includes first-touch of a)" if i == 0 else ""
        print(f"triad pass{i}: {dt*1000:6.0f} ms  {gb/dt:5.1f} GB/s{tag}")


def fault(mb: int = 256, passes: int = 10) -> None:
    """First-touch throughput on fresh allocations, sampled over time."""
    n = mb * 1_000_000 // 8
    for i in range(passes):
        t0 = time.perf_counter()
        a = np.zeros(n)  # mmap + kernel zero-fill on first touch
        a[:: 4096 // 8] += 1.0  # touch every page
        dt = time.perf_counter() - t0
        print(f"fault alloc{i}: {dt*1000:6.0f} ms  "
              f"{mb/1000/dt:5.2f} GB/s first-touch")
        del a
        time.sleep(0.5)


def steal(seconds: int = 10) -> None:
    """Whole-box busy/steal split from /proc/stat while this runs."""

    def snap() -> list[int]:
        with open("/proc/stat") as fh:
            return list(map(int, fh.readline().split()[1:9]))

    s0 = snap()
    t_end = time.time() + seconds
    x = np.random.rand(4_000_000)
    while time.time() < t_end:  # keep one core busy so steal has a target
        x = x * 1.0000001
    d = [b - a for a, b in zip(s0, snap())]
    tot = sum(d) or 1
    print(f"steal probe over {seconds}s: user {d[0]/tot*100:.1f}%  "
          f"sys {d[2]/tot*100:.1f}%  idle {d[3]/tot*100:.1f}%  "
          f"iowait {d[4]/tot*100:.1f}%  steal {d[7]/tot*100:.1f}%")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("triad", "all"):
        triad()
    if which in ("fault", "all"):
        fault()
    if which in ("steal", "all"):
        steal()
