"""Per-query isolation bench (guide §1.4): noop-sink timing + plan capture.

NOT the driver contract — bench.py is frozen for measurement; this file
exists so optimization work can time ONE query at a time and save its
``explain("formatted")`` under plans/r07/ without running the whole
headline set.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--plans-dir plans/r07] [--suffix before] [--reps 2] [--no-time] \
        query [query ...]

Prints one JSON line: {"queries": {name: [sec, ...]}, "sf_dir": ...}.
Session config mirrors bench.py (ANSI off, 2*cpus shuffle partitions) so
numbers are comparable to the driver's run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from audio_feature_extraction_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="afe-bench-extra",
        cores=cpus,
        shuffle_partitions=max(2 * cpus, 32),
        extra={"spark.sql.ansi.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # same warmup as bench.py so first-query JIT cost doesn't pollute timings
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    import pandas as _pd  # noqa: F401

    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        df = qs[name](spark, sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
