"""Bucketed-input co-location (SURVEY.md §4.2 / the 100 TB zero-shuffle shape).

At cluster scale the input lives in a bucketed/sorted Iceberg table. A scan of
a table bucketed by doc_id satisfies every per-doc_id window's
ClusteredDistribution, so with the broadcast as-of strategy the flagship
pipeline shuffles the fat token rows ZERO times — the only exchange left is
the slim reference-dimension aggregation feeding the broadcast.
"""

from __future__ import annotations

import re

import numpy as np

from audio_feature_extraction_spark import datagen as dg
from audio_feature_extraction_spark.plans.pipeline import feature_pipeline


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_scan_plus_broadcast_asof_is_zero_fat_shuffle(spark, tiny_df, tmp_path):
    seq, ref = tiny_df
    tbl = "seq_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        seq.write.bucketBy(8, "doc_id")
        .sortBy("doc_id", "ts")
        .option("path", str(tmp_path / tbl))
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    try:
        sb = spark.table(tbl)
        out = feature_pipeline(sb, ref, asof_strategy="broadcast")
        plan = _plan(out)

        # the fat side never hash-exchanges: no exchange keyed on doc_id alone
        fat_ex = re.findall(r"Exchange hashpartitioning\(doc_id#\d+, \d+\)", plan)
        assert not fat_ex, plan
        # at most the slim ref-side agg exchange remains
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan
        assert "BroadcastHashJoin" in plan, plan

        # semantics unchanged vs the window-strategy pipeline
        a = (
            out.toPandas()
            .sort_values(["doc_id", "seq"])
            .reset_index(drop=True)
        )
        b = (
            feature_pipeline(seq, ref)
            .toPandas()
            .sort_values(["doc_id", "seq"])
            .reset_index(drop=True)
        )
        fa = np.array(a["feature_vector"].tolist())
        fb = np.array(b["feature_vector"].tolist())
        assert np.allclose(fa, fb)
        assert all((x == y).all() for x, y in zip(a["tokens"], b["tokens"]))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
