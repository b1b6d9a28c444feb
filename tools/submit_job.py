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
    spark = SparkSession.builder.appName("afe-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out = feature_pipeline(
        dg.gen_sequences(spark, dg.TINY), dg.gen_reference(spark, dg.TINY)
    )
    n = out.count()
    toks = out.agg(F.sum(F.size("tokens"))).collect()[0][0]
    print(json.dumps({"rows": int(n), "tokens": int(toks or 0)}))
    spark.stop()


if __name__ == "__main__":
    main()
