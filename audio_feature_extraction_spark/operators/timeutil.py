"""Event-time arithmetic helpers.

Parquet timestamps arrive as TIMESTAMP or TIMESTAMP_NTZ depending on the
session's ``spark.sql.parquet.inferTimestampNTZ.enabled``; ``unix_micros``
only accepts TIMESTAMP. All engine event-time math goes through
:func:`ts_micros` so either type works: NTZ is cast to TIMESTAMP first
(session-tz reinterpretation — harmless for the *differences* the engine
computes, which is all it ever does with these values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def tol_us(tolerance_sec: float | None) -> int | None:
    """Seconds → exact int64 microseconds for tolerance comparisons (one
    definition of the rounding rule, shared by every as-of strategy)."""
    if tolerance_sec is None:
        return None
    return int(round(tolerance_sec * 1_000_000))
