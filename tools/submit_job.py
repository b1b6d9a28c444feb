"""Minimal spark-submit job: imports the engine from --py-files and runs the
flagship pipeline on TINY synthetic data. Prints one JSON line so the caller
can assert success. Must NOT rely on the repo being on sys.path — only the
shipped zip."""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from audio_feature_extraction_spark import datagen as dg
from audio_feature_extraction_spark.plans.pipeline import feature_pipeline


def main() -> None:
    # pin the engine's PORTABLE conventions on the cluster session (master/
    # memory stay cluster-provided): a DST-zone cluster default for
    # session.timeZone would shift NTZ event-time arithmetic across DST
    # transitions, making this smoke certify different semantics than every
    # get_spark-based gate
    spark = (
        SparkSession.builder.appName("afe-submit-smoke")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = feature_pipeline(
        dg.gen_sequences(spark, dg.TINY), dg.gen_reference(spark, dg.TINY)
    )
    # one pass for both numbers — count() then agg() would execute the
    # whole pipeline twice
    row = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("tokens")).alias("toks")
    ).collect()[0]
    print(json.dumps({"rows": int(row["n"]), "tokens": int(row["toks"] or 0)}))
    spark.stop()


if __name__ == "__main__":
    main()
