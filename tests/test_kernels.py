"""Unit tests for the Arrow vector-stats kernel (operators/kernels.py)."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators.kernels import vector_stats


def test_vector_stats_values_and_edges(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, []),  # empty → NaN stats, no crash
            (3, [-2.5]),
        ],
        "id int, v array<float>",
    )
    out = {
        r["id"]: r
        for r in df.select("id", vector_stats("v").alias("s")).select("id", "s.*").collect()
    }
    assert math.isclose(out[1]["mean"], 2.5)
    assert math.isclose(out[1]["std"], np.sqrt(1.25))
    assert (out[1]["vmin"], out[1]["vmax"]) == (1.0, 4.0)
    assert math.isclose(out[1]["l2"], math.sqrt(30.0))
    # NaN → NULL at the Arrow boundary — the engine's missing-value encoding
    # (SURVEY.md §1.2: reference NaN becomes nullable column)
    assert all(out[2][f] is None for f in ["mean", "std", "vmin", "vmax", "l2"])
    assert out[3]["std"] == 0.0 and out[3]["l2"] == 2.5


def test_vector_stats_plan_is_arrow_not_row_python(spark):
    df = spark.range(4).select(F.array(F.lit(1.0), F.lit(2.0)).alias("v"))
    plan = (
        df.select(vector_stats("v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_vec_stats_nan_elements_are_missing(spark):
    """NaN elements are filtered (element-wise NaN->missing policy): stats
    come from the finite elements; an all-NaN vector yields NULLs like an
    empty one."""
    from audio_feature_extraction_spark.operators.kernels import vector_stats

    df = spark.createDataFrame(
        [(1, [float("nan"), 1.0, 3.0]), (2, [float("nan")])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["s"] for r in
           df.select("vec_id", vector_stats("embedding").alias("s")).collect()}
    assert out[1]["mean"] == 2.0 and out[1]["vmin"] == 1.0 and out[1]["vmax"] == 3.0
    assert out[2]["mean"] is None and out[2]["l2"] is None
