"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "tokens_per_sec": ...}

Execution sinks to the noop datasource so we measure engine time, not
driver collect. Flagship tokens/sec (the BASELINE.json metric) is derived
from the pipeline_features run: total emitted tokens / wall sec.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from audio_feature_extraction_spark.session import get_spark  # noqa: E402
from tools.hostcond import HostWindow, window_noisy  # noqa: E402

# a pass whose measured steal% exceeds this is suspect: up to MAX_PASSES
# total passes run (min-of-all kept per query) and every pass's host
# condition is published either way — the reader sees exactly how noisy
# the window was instead of a narrative about it. Threshold calibrated
# r04: a 4.8%-steal window measured the identical plans 65% slower than a
# 0.6%-steal window minutes later, so 5% was far too lax.
STEAL_THRESHOLD_PCT = 2.0
MAX_PASSES = 3
# the flagship number is a single measurement, so it gets a deeper retry
# budget: the r05 driver run kept a 6.78%-steal window because all 3
# retries were noisy (VERDICT r05 #5)
FLAGSHIP_MAX_PASSES = 6

# The headline IS the driver-gated head-50 (VERDICT r04 #6): derived from
# the registry, not a hand-maintained copy, so the bench and correctness
# sets coincide by construction — per-round comparisons never need a set
# intersection again, and a rotation automatically re-points the bench.
# (r04→r05 continuity: 36 of the 50 were in the r04 headline; the 12
# dropped non-head legacy queries — percentiles, asof_backward/salted/
# broadcast, session_stats, rolling_stats, running_totals, gauss_smooth,
# vector_kernel_stats, token_vocab, unigram_surprisal, trend_fit — remain
# check_entry-gated and coverable by pointing SPARK_GRAFT_BENCH_QUERIES at
# them explicitly.)
from tools.rotate_registry import HEAD_N  # noqa: E402

HEADLINE = list(entry_mod.queries())[:HEAD_N]
_extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
if _extra:
    HEADLINE = [q.strip() for q in _extra.split(",") if q.strip()]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # ANSI off for the measured session: runtime overflow/index checks cost
    # ~9% across the headline set and every query is verified value-identical
    # under ANSI-on by the correctness gate (tools/check_entry.py and the
    # driver both run ANSI-on sessions). This is the standard prod-perf knob,
    # not a semantics change.
    spark = get_spark(
        app_name="afe-bench", cores=cpus, shuffle_partitions=max(2 * cpus, 32),
        extra={"spark.sql.ansi.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm the JVM + parquet footers + Python worker pool once (excluded from
    # timings — worker fork/import cost is session setup, not engine time)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    import pandas as _pd  # noqa: F401

    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # one un-timed flagship execution: whichever query runs FIRST otherwise
    # pays the codegen/JIT compile of the window/join/agg paths for everyone
    # (measured: pipeline_features 2.4 s in slot 1 vs 1.5 s in slot 5 on the
    # same host window) — warm those paths once so position stops mattering
    entry_mod._pipeline(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    times_max: dict[str, float] = {}
    host_passes: list[dict] = []
    for pass_no in range(MAX_PASSES):
        hw = HostWindow().start()
        t_pass = time.time()
        for name in HEADLINE:
            # min of 2 back-to-back runs per query: the sandbox host shows
            # bursty CPU steal (~10% sustained, multi-second spikes) that
            # lands ~20 s stalls on whichever query is running; the min is
            # the engine's time, the max is the host's. Same plan both runs
            # — nothing is cached between them beyond the JVM/codegen warmup
            # any prod job has. BOTH are recorded (queries / queries_max).
            best, worst = float("inf"), 0.0
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best, worst = min(best, dt), max(worst, dt)
            times[name] = round(min(best, times.get(name, best)), 3)
            times_max[name] = round(max(worst, times_max.get(name, worst)), 3)
        cond = hw.stop()
        cond["pass_sec"] = round(time.time() - t_pass, 3)
        # retry the whole headline loop only when the measured window was
        # noisy (steal OR calibration drift >20% within the pass — the r05
        # driver window fell 1221.6→850.0 Mops/s at 1.35% steal, so steal
        # alone is an insufficient trigger) — the published result is then
        # min across passes, with every pass's condition + the trigger that
        # fired in the JSON for the reader to audit
        cond["noisy"] = window_noisy(cond, STEAL_THRESHOLD_PCT)
        host_passes.append(cond)
        if not cond["noisy"]:
            break

    # flagship throughput: tokens emitted per second through the full
    # point-in-time pipeline (the BASELINE.json headline metric).
    # TIME the noop sink of the FULL output — timing an agg of
    # sum(size(tokens)) would let ColumnPruning delete every window/feature
    # computation from the plan (tokens pass through untouched) and measure
    # scan+shuffle only. The token count itself is a data property, computed
    # OUTSIDE the timed region (same methodology as bench_scaling.py).
    from pyspark.sql import functions as F

    out = entry_mod._pipeline(spark, sf_dir)
    # same noisy-window policy as the query loop (the r05 first run showed
    # why: a 9.8%-steal window cut the headline tokens/s by a third): re-run
    # on steal, keep the min, publish every window's condition
    pipe_sec, pipe_conds = float("inf"), []
    for _ in range(FLAGSHIP_MAX_PASSES):
        hw_pipe = HostWindow().start()
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        cond = hw_pipe.stop()
        cond["pipeline_sec"] = round(dt, 3)
        cond["noisy"] = window_noisy(cond, STEAL_THRESHOLD_PCT)
        pipe_conds.append(cond)
        pipe_sec = min(pipe_sec, dt)
        if not cond["noisy"]:
            break
    pipe_cond = pipe_conds
    total_tokens = out.agg(F.sum(F.size("tokens"))).collect()[0][0] or 0
    tokens_per_sec = round(total_tokens / pipe_sec, 1) if pipe_sec > 0 else 0.0

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "feature_eng_headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_max": times_max,
                "sf": sf,
                "cpus": cpus,
                "tokens_per_sec": tokens_per_sec,
                "pipeline_tokens": int(total_tokens),
                "pipeline_sec": round(pipe_sec, 3),
                "timing": f"min_of_2_x{len(host_passes)}_passes",
                "host": {
                    "steal_threshold_pct": STEAL_THRESHOLD_PCT,
                    "passes": host_passes,
                    "pipeline": pipe_cond,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
