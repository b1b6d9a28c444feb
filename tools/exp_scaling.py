"""One-off experiment: thread-mode local[N] vs separate-executor-JVM
local-cluster[W,C,M] scaling on the flagship pipeline. Usage:

    python tools/exp_scaling.py --master 'local[8]' --reps 2
    python tools/exp_scaling.py --master 'local-cluster[4,2,4096]' --reps 2

Prints one JSON line {master, times, tokens}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA_DIR = os.path.join(REPO, ".bench_data", "scaling")
SHUFFLE = 128
_SHM = "/dev/shm/spark-tmp"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from audio_feature_extraction_spark.plans.pipeline import feature_pipeline

    os.makedirs(_SHM, exist_ok=True)
    b = (
        SparkSession.builder.appName("afe-exp")
        .master(args.master)
        .config("spark.sql.shuffle.partitions", str(SHUFFLE))
        .config("spark.default.parallelism", str(SHUFFLE))
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "3g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.local.dir", _SHM)
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    seq = spark.read.parquet(os.path.join(DATA_DIR, "sequences.parquet"))
    ref = spark.read.parquet(os.path.join(DATA_DIR, "reference.parquet"))
    tokens = int(seq.agg(F.sum("n_tok")).collect()[0][0])

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        feature_pipeline(seq, ref).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        spark.sparkContext._jvm.System.gc()
    spark.stop()
    print(json.dumps({"master": args.master, "times": times, "tokens": tokens}))


if __name__ == "__main__":
    main()
