"""SparkSession factory with scale-oriented defaults.

All engine code and tests obtain sessions here so the same conventions hold
everywhere:

- AQE on (runtime coalescing + skew-join splitting) — the 100 TB story depends
  on it; at local scale it also keeps tiny shuffles from fragmenting.
- Arrow on for every pandas-UDF boundary (the engine bans row-at-a-time Python).
- Session timezone pinned to UTC so event-time arithmetic is reproducible
  across engines (parity with the DuckDB oracle, which reads naive timestamps).
- ``spark.sql.shuffle.partitions`` sized to the core count (driver overridable);
  at cluster scale this is expected to be set per-job (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def get_spark(
    app_name: str = "afe-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """NOTE: ``getOrCreate`` returns any pre-existing in-process session and
    SILENTLY ignores every parameter here (master/cores/memory/extra are
    JVM-start-time settings). Callers that need a specific configuration
    must be the first session in the process — the benchmarks fork a
    subprocess per configuration for exactly this reason."""
    cores = cores or default_cpus()
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime partition coalescing + skew-join mitigation
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere a pandas UDF boundary exists
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # tokens arrays are fat rows: cap scan partition bytes BELOW the
        # 128 MB default so a partition of wide array rows still fits
        # executor memory at high SF (the default would make this a no-op)
        .config("spark.sql.files.maxPartitionBytes", "67108864")
        # ANSI on — the Spark 4 default and what the driver's session runs;
        # engine expressions must be ANSI-safe (try_element_at for possibly-
        # empty arrays, guarded divisions), so the local gate can't mask
        # environment-sensitive crashes (round-1 asof_broadcast lesson)
        .config("spark.sql.ansi.enabled", "true")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
