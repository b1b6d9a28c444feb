import pandas as pd
from pyspark.sql import functions as F

from audio_feature_extraction_spark import datagen as dg
from audio_feature_extraction_spark.operators.binpack import (
    BIN_COL,
    partition_payload_stats,
    repartition_by_payload,
    with_bin_id,
)

TARGET = 2000  # tokens per bin — small so the tiny table makes many bins


def test_bin_payload_bound(tiny_df):
    seq, _ = tiny_df
    binned = with_bin_id(seq, target_payload_per_bin=TARGET)
    per_bin = (
        binned.groupBy(BIN_COL)
        .agg(F.sum("n_tok").alias("payload"), F.count(F.lit(1)).alias("rows"))
        .toPandas()
    )
    max_row = seq.agg(F.max("n_tok")).collect()[0][0]
    # greedy prefix packing: no bin exceeds target by more than one row
    assert (per_bin.payload <= TARGET + max_row).all()
    assert len(per_bin) > 1


def test_rows_preserved_and_deterministic(spark, tiny_df, tiny_pdf):
    seq, _ = tiny_df
    out = repartition_by_payload(seq, target_payload_per_bin=TARGET).toPandas()
    seq_pdf, _ = tiny_pdf
    assert len(out) == len(seq_pdf)
    a = out.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    b = seq_pdf.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
    assert (a.n_tok.to_numpy() == b.n_tok.to_numpy()).all()

    # bin ids are a pure function of (order, payload): invariant to input
    # partitioning
    b1 = (
        with_bin_id(seq.repartition(3), target_payload_per_bin=TARGET)
        .select("doc_id", "seq", BIN_COL)
        .toPandas()
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )
    b2 = (
        with_bin_id(seq.repartition(11), target_payload_per_bin=TARGET)
        .select("doc_id", "seq", BIN_COL)
        .toPandas()
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )
    assert (b1[BIN_COL].to_numpy() == b2[BIN_COL].to_numpy()).all()


def test_grouped_and_salted_binning(tiny_df):
    seq, _ = tiny_df
    binned = with_bin_id(
        seq, group_cols=["source"], target_payload_per_bin=TARGET, salt_groups=4
    )
    per_bin = binned.groupBy(BIN_COL).agg(F.sum("n_tok").alias("payload")).toPandas()
    max_row = seq.agg(F.max("n_tok")).collect()[0][0]
    assert (per_bin.payload <= TARGET + max_row).all()


def test_partition_payload_stats_shape(tiny_df):
    seq, _ = tiny_df
    out = repartition_by_payload(seq, target_payload_per_bin=TARGET, num_partitions=8)
    stats: pd.DataFrame = partition_payload_stats(out).toPandas()
    assert set(stats.columns) == {"partition_id", "rows", "payload"}
    assert stats.payload.sum() == seq.agg(F.sum("n_tok")).collect()[0][0]


def test_binpack_leading_zero_and_null_payload(spark):
    """Leading zero-payload rows land in bin 0 (not a stray bin -1), and a
    NULL payload counts as 0 instead of poisoning the running sum."""
    df = spark.createDataFrame(
        [("d0", 0, 0), ("d1", 1, None), ("d2", 2, 5), ("d3", 3, 5)],
        "doc_id string, seq int, n_tok int",
    )
    out = with_bin_id(
        df, payload_col="n_tok", order_cols=["doc_id", "seq"],
        group_cols=["doc_id"], target_payload_per_bin=4, mix=False,
        out="bin_id",
    ).toPandas()
    assert (out.bin_id >= 0).all()
    assert out.bin_id.notna().all()
