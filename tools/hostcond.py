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

_FAKE_SCORE_IDX = 0  # test hook cursor, see cpu_score


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
    because the score itself can eat a steal spike.

    Test hook: SPARK_GRAFT_FAKE_CPU_SCORES (comma-separated floats,
    consumed in order) substitutes the measured score so the bench's
    noisy-window re-run triggers can be forced deterministically in a
    unit test (VERDICT r05 #5 'forced-noise test'). Never set outside
    tests."""
    import os
    import time

    import numpy as np

    fake = os.environ.get("SPARK_GRAFT_FAKE_CPU_SCORES")
    if fake:
        global _FAKE_SCORE_IDX
        vals = [float(v) for v in fake.split(",")]
        v = vals[min(_FAKE_SCORE_IDX, len(vals) - 1)]
        _FAKE_SCORE_IDX += 1
        return v

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


# a pass whose single-thread calibration score moved more than this
# (relative, start→end) is suspect even at zero steal: the r05 driver
# bench fell 1221.6 → 850.0 Mops/s within one pass at 1.35% steal —
# frequency drift the steal counter cannot see (VERDICT r05 #5).
CAL_DRIFT_PCT = 20.0


def window_noisy(
    cond: dict,
    steal_threshold_pct: float,
    cal_drift_pct: float = CAL_DRIFT_PCT,
) -> str:
    """'' when the window was quiet, else the re-run trigger that fired:
    'steal' (hypervisor took the vCPU) or 'cal_drift' (single-thread
    calibration moved > cal_drift_pct start→end — frequency drift)."""
    if cond["steal_pct"] > steal_threshold_pct:
        return "steal"
    s0, s1 = cond["cpu_score_start"], cond["cpu_score_end"]
    if min(s0, s1) <= 0:
        return "cal_drift"
    if 100.0 * abs(s0 - s1) / max(s0, s1) > cal_drift_pct:
        return "cal_drift"
    return ""
