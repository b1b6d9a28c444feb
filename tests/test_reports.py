"""Round-trip tests for the CSV/JSON report sinks (SURVEY.md S6/S7)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from audio_feature_extraction_spark.sources.reports import (
    write_csv_report,
    write_json_report,
    write_report,
)


@pytest.fixture()
def report_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "grp": ["a", "b", "c"],
                "n": [3, 1, 2],
                "avg_v": [1.5, -2.0, 0.25],
            }
        ),
        schema="grp string, n long, avg_v double",
    )


def test_csv_single_file_roundtrip(spark, report_df, tmp_path):
    path = str(tmp_path / "report.csv")
    got_path = write_csv_report(report_df, path)
    assert got_path == path and os.path.isfile(path)
    back = pd.read_csv(path).sort_values("grp").reset_index(drop=True)
    want = report_df.toPandas().sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)


def test_json_single_file_roundtrip(spark, report_df, tmp_path):
    path = str(tmp_path / "report.json")
    write_json_report(report_df, path)
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    back = pd.DataFrame(rows).sort_values("grp").reset_index(drop=True)
    want = report_df.toPandas().sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["grp", "n", "avg_v"]], want)


def test_partitioned_report_dir(spark, report_df, tmp_path):
    path = str(tmp_path / "report_dir")
    write_report(report_df.repartition(3), path, fmt="csv", single_file=False)
    assert os.path.isdir(path)
    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert len(parts) >= 1
    back = (
        spark.read.option("header", "true")
        .schema("grp string, n long, avg_v double")
        .csv(path)
        .toPandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    want = report_df.toPandas().sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)


def test_overwrite_and_errors(spark, report_df, tmp_path):
    path = str(tmp_path / "r.csv")
    write_csv_report(report_df, path)
    write_csv_report(report_df.where(F.col("grp") == "a"), path)  # overwrite ok
    assert len(pd.read_csv(path)) == 1
    with pytest.raises(FileExistsError):
        write_csv_report(report_df, path, overwrite=False)
    with pytest.raises(ValueError):
        write_report(report_df, str(tmp_path / "x"), fmt="parquet")
