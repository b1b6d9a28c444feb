"""Vectorized per-entity numeric kernels (SURVEY.md §2.10 / §7.1-5).

The reference computes per-entity moment statistics over dense numpy columns
(`audio_feature_extraction_toolkit/core/feature_extractor.py:99-101,141-144`,
`04_feature_extraction_experiment/feature_extractor.py:368-374`). The engine
form is a Series→Series Arrow-batched ``pandas_udf`` over the vector column:
one Python crossing per Arrow batch, numpy float64 accumulation in fixed
(per-row) order so results are deterministic and partition-count-invariant.
This module is the template for every "true kernel" the built-ins can't
express (polyfit, filtfilt, spectral transforms — §2.10 table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
)

_STATS_T = StructType(
    [
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("l2", DoubleType()),
    ]
)


@F.pandas_udf(_STATS_T)
def _vec_stats(vs: pd.Series) -> pd.DataFrame:
    """Fully vectorized segmented stats: the batch's arrays are flattened
    into ONE values buffer + offsets, and all five stats are computed with
    ``np.<op>.reduceat`` segmented reductions — no interpreted per-row loop.

    NaN elements are MISSING (the engine's NaN→NULL policy applied
    element-wise): they contribute to no stat, and an all-NaN/empty/NULL row
    yields NULL stats. Population std is the same two-pass centered formula
    as the scalar reference (`((a-m)**2).mean()`), applied segment-wise.
    """
    n = len(vs)
    out = np.full((n, 5), np.nan, dtype=np.float64)
    if n == 0:
        return pd.DataFrame(out, columns=["mean", "std", "vmin", "vmax", "l2"])
    # Flatten: per-row work here is only len() + a pointer hand-off to
    # np.concatenate; all arithmetic below is segmented numpy.
    arrs = [
        np.atleast_1d(np.asarray(v, dtype=np.float64))
        if v is not None
        else np.empty(0, dtype=np.float64)
        for v in vs
    ]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
    nonempty = np.flatnonzero(lens > 0)
    if nonempty.size == 0:
        return pd.DataFrame(out, columns=["mean", "std", "vmin", "vmax", "l2"])
    flat = np.concatenate(arrs)
    # reduceat over the offsets of NON-empty rows only: empty rows add zero
    # length, so each segment [off[i], off[i+1]) is exactly one row's data.
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    offs = starts[nonempty]
    valid = ~np.isnan(flat)
    flat_z = np.where(valid, flat, 0.0)
    cnt = np.add.reduceat(valid.astype(np.float64), offs)
    has = cnt > 0
    rows = nonempty[has]
    cnt = cnt[has]
    s = np.add.reduceat(flat_z, offs)[has]
    mean = s / cnt
    out[rows, 0] = mean
    # two-pass centered population std, segment-wise
    mean_full = np.zeros(n, dtype=np.float64)
    mean_full[rows] = mean
    row_id = np.repeat(np.arange(n), lens)
    d = np.where(valid, flat - mean_full[row_id], 0.0)
    out[rows, 1] = np.sqrt(np.add.reduceat(d * d, offs)[has] / cnt)
    # min/max: NaN -> +/-inf sentinels so they never win a segment
    out[rows, 2] = np.minimum.reduceat(np.where(valid, flat, np.inf), offs)[has]
    out[rows, 3] = np.maximum.reduceat(np.where(valid, flat, -np.inf), offs)[has]
    out[rows, 4] = np.sqrt(np.add.reduceat(flat_z * flat_z, offs)[has])
    return pd.DataFrame(out, columns=["mean", "std", "vmin", "vmax", "l2"])


def vector_stats(col: str | Column) -> Column:
    """Per-row moment stats of a numeric array column as one struct column.

    Arrow-batched; elements are upcast to float64 before accumulating so a
    float32 storage type does not poison the statistics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _vec_stats(c.cast("array<double>"))
