"""Measured skew evidence for asof_join(strategy='salted') — VERDICT r05 #7.

Generates a hot-key frame (90% of left rows on ONE source key) and times
the window (unsalted) strategy against salted at several salt counts on
the SAME input, verifying the results identical first. Prints one JSON
line; the numbers land in BENCH/BASELINE.md next to the salt-count
heuristic.

Run:  python tools/bench_skew.py [n_left] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from audio_feature_extraction_spark.operators.asof import asof_join  # noqa: E402
from audio_feature_extraction_spark.session import get_spark  # noqa: E402
from tools.hostcond import HostWindow, window_noisy  # noqa: E402


def build_frames(spark, n_left: int, hot_frac: float, n_keys: int = 32,
                 n_right_per_key: int = 512):
    """Left: n_left events, hot_frac of them on key 'src_hot'; right: a
    dense per-key reference series. Timestamps pseudo-random but
    deterministic (hash-derived)."""
    hot_cut = int(hot_frac * 1_000_000)
    left = (
        spark.range(n_left)
        .select(
            F.when(F.pmod(F.xxhash64("id"), 1_000_000) < hot_cut, F.lit("src_hot"))
            .otherwise(
                F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(1)), n_keys).cast("string"))
            )
            .alias("source"),
            F.pmod(F.xxhash64("id", F.lit(2)), 86_400_000_000).alias("ts_us"),
            F.col("id").alias("event_id"),
        )
    )
    right = (
        spark.range(n_keys + 1)
        .select(
            F.when(F.col("id") == n_keys, F.lit("src_hot"))
            .otherwise(F.concat(F.lit("src"), F.col("id").cast("string")))
            .alias("source")
        )
        .crossJoin(spark.range(n_right_per_key).select(F.col("id").alias("j")))
        .select(
            "source",
            (F.col("j") * (86_400_000_000 // n_right_per_key)).alias("ts_us"),
            (F.col("j").cast("double") / 7.0).alias("ref_val"),
        )
    )
    return left, right


def fingerprint(df):
    """Partition-invariant result fingerprint: xor of row hashes."""
    return df.select(
        F.xxhash64("event_id", "matched_ts", "ref_val").alias("h")
    ).agg(F.bit_xor("h")).first()[0]


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="afe-skew-bench", cores=cpus,
        shuffle_partitions=max(2 * cpus, 32),
        extra={"spark.sql.ansi.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    left, right = build_frames(spark, n_left, hot_frac)
    left = left.localCheckpoint()   # freeze inputs so every variant reads
    right = right.localCheckpoint() # identical materialized data

    variants = [("window_unsalted", dict(strategy="window"))]
    for s in (8, 16, 32):
        variants.append((f"salted_{s}", dict(strategy="salted", salt_buckets=s)))

    # correctness first: identical fingerprints across variants
    fps = {}
    for name, kw in variants:
        out = asof_join(left, right, ["source"], left_ts="ts_us", **kw)
        fps[name] = fingerprint(out)
    assert len(set(fps.values())) == 1, f"variant results differ: {fps}"

    results, conds = {}, {}
    for name, kw in variants:
        out = asof_join(left, right, ["source"], left_ts="ts_us", **kw)
        out.write.format("noop").mode("overwrite").save()  # warm codegen
        best, tries = float("inf"), []
        for _ in range(4):
            hw = HostWindow().start()
            t0 = time.time()
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            cond = hw.stop()
            cond["sec"] = round(dt, 3)
            cond["noisy"] = window_noisy(cond, 2.0)
            tries.append(cond)
            best = min(best, dt)
            if not cond["noisy"]:
                break
        results[name] = round(best, 3)
        conds[name] = tries

    print(json.dumps({
        "bench": "asof_salted_skew",
        "n_left": n_left,
        "hot_frac": hot_frac,
        "cpus": cpus,
        "sec": results,
        "fingerprint": fps[variants[0][0]],
        "host": conds,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
