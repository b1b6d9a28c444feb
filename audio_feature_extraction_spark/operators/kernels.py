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
    out = np.empty((len(vs), 5), dtype=np.float64)
    for i, v in enumerate(vs):
        # float64 accumulation in array order — reference float semantics.
        # NaN elements are MISSING (the engine's NaN→NULL policy applied
        # element-wise): without the filter one NaN poisons every stat to
        # NaN→NULL, which the SQL-oracle aggregates would not reproduce
        a = np.asarray(v, dtype=np.float64)
        a = a[~np.isnan(a)]
        if a.size == 0:
            out[i] = np.nan
            continue
        m = a.mean()
        out[i, 0] = m
        out[i, 1] = np.sqrt(((a - m) ** 2).mean())  # population std
        out[i, 2] = a.min()
        out[i, 3] = a.max()
        out[i, 4] = float(np.sqrt((a * a).sum()))
    return pd.DataFrame(out, columns=["mean", "std", "vmin", "vmax", "l2"])


def vector_stats(col: str | Column) -> Column:
    """Per-row moment stats of a numeric array column as one struct column.

    Arrow-batched; elements are upcast to float64 before accumulating so a
    float32 storage type does not poison the statistics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _vec_stats(c.cast("array<double>"))
