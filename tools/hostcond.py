"""Host-condition sampling for benchmarks (VERDICT r03 #2).

The sandbox host shows bursty CPU steal (~10% sustained, multi-second
spikes) that lands multi-second stalls on whichever query happens to be
running. r03's driver bench read ~1.5x slower than r02 purely from host
drift, and the defense was narrative. These helpers make it evidence:
every bench pass samples /proc/stat (steal/idle jiffy counters) and
/proc/loadavg at start and end and publishes the deltas next to the
timings, so a later reader can separate plan regressions from host noise
without re-deriving the argument.
"""

from __future__ import annotations


def cpu_sample() -> tuple[int, int, int]:
    """(total_jiffies, idle_jiffies, steal_jiffies) from /proc/stat's
    aggregate cpu line. idle includes iowait."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), idle, steal


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def cpu_score(n: int = 2_000_000, reps: int = 5) -> float:
    """Single-thread CPU calibration in Mops/s (best of ``reps`` fixed
    numpy float64 multiply-add passes). Steal% only sees the hypervisor
    taking our vCPU; this also catches host FREQUENCY drift (the sandbox
    documents ~2x minute-to-minute CPU-speed swings), so two rounds'
    timings can be normalized instead of argued about. Best-of-reps
    because the score itself can eat a steal spike."""
    import time

    import numpy as np

    x = np.arange(n, dtype=np.float64)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x * 1.0000001 + 0.5
        s = float(y.sum())
        best = min(best, time.perf_counter() - t0)
    assert s > 0
    return round(2.0 * n / best / 1e6, 1)


class HostWindow:
    """Start/stop wrapper: percentage of host CPU time stolen (hypervisor
    ran someone else) and idle across the measured window."""

    def start(self) -> "HostWindow":
        self._t0, self._i0, self._s0 = cpu_sample()
        self.load1_start = load1()
        self.cpu_score_start = cpu_score()
        return self

    def stop(self) -> dict:
        t1, i1, s1 = cpu_sample()
        dt = max(t1 - self._t0, 1)
        return {
            "steal_pct": round(100.0 * (s1 - self._s0) / dt, 2),
            "idle_pct": round(100.0 * (i1 - self._i0) / dt, 2),
            "load1_start": self.load1_start,
            "load1_end": load1(),
            "cpu_score_start": self.cpu_score_start,
            "cpu_score_end": cpu_score(),
        }
