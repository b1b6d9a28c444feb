import os

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.sources.checkpoint import CheckpointTable


@pytest.fixture()
def ckpt(tmp_path):
    return CheckpointTable(str(tmp_path / "tbl"))


def _docs(tiny_df):
    seq, _ = tiny_df
    return seq.select("doc_id", "seq", "n_tok", "ts")


def test_snapshot_commit_and_read(spark, tiny_df, ckpt):
    df = _docs(tiny_df)
    first = df.where(F.col("doc_id") < "doc00000020")
    second = df.where(F.col("doc_id") >= "doc00000020")
    s0 = ckpt.write_snapshot(first, key_cols=["doc_id", "seq"], payload_col="n_tok",
                             watermark_col="ts")
    s1 = ckpt.write_snapshot(second, key_cols=["doc_id", "seq"], payload_col="n_tok",
                             watermark_col="ts")
    assert (s0, s1) == (0, 1)
    assert ckpt.committed_snapshots() == [0, 1]
    back = ckpt.read(spark)
    assert back.count() == df.count()
    m = ckpt.read_manifest(spark).toPandas()
    assert (m.rows > 0).all()
    assert m.payload.sum() == df.agg(F.sum("n_tok")).collect()[0][0]
    assert m.watermark_ts.notna().all()
    assert ckpt.verify(spark, key_cols=["doc_id", "seq"]).count() == 0


def test_uncommitted_invisible_and_aborted(spark, tiny_df, ckpt):
    df = _docs(tiny_df)
    ckpt.write_snapshot(df.limit(10), key_cols=["doc_id", "seq"])
    # simulate a crash: data written, manifest never committed
    crash_path = os.path.join(ckpt.data_dir, "snapshot_id=1")
    df.limit(5).write.parquet(crash_path)
    assert ckpt.committed_snapshots() == [0]
    assert ckpt.read(spark).count() == 10  # partial data invisible
    assert ckpt.next_snapshot_id() == 2  # no id collision with the partial dir
    assert ckpt.abort_uncommitted() == [1]
    assert not os.path.exists(crash_path)


def test_resume_is_byte_identical(spark, tiny_df, ckpt, tmp_path):
    """Kill after snapshot 0, resume, final table == single-shot run."""
    df = _docs(tiny_df)
    half = df.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)

    ckpt.write_snapshot(half, key_cols=["doc_id", "seq"], payload_col="n_tok")
    rest = ckpt.remaining(df, key_cols=["doc_id", "seq"])
    assert rest.count() == df.count() - half.count()
    ckpt.write_snapshot(rest, key_cols=["doc_id", "seq"], payload_col="n_tok")

    resumed = ckpt.read(spark).select("doc_id", "seq", "n_tok").toPandas()
    single = CheckpointTable(str(tmp_path / "single"))
    single.write_snapshot(df, key_cols=["doc_id", "seq"], payload_col="n_tok")
    oneshot = single.read(spark).select("doc_id", "seq", "n_tok").toPandas()

    a = resumed.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    b = oneshot.sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert a.equals(b)

    # resume on a complete table is a no-op
    assert ckpt.remaining(df, key_cols=["doc_id", "seq"]).count() == 0


def test_time_travel_read(spark, tiny_df, tmp_path):
    """VERSION AS OF analog: as_of_snapshot reads the table exactly as it
    stood after that snapshot committed; later snapshots are invisible."""
    import pytest

    tbl = CheckpointTable(str(tmp_path / "tt"))
    df = _docs(tiny_df)
    a = df.where(F.col("doc_id") < "doc00000020")
    b = df.where(F.col("doc_id") >= "doc00000020")
    tbl.write_snapshot(a, key_cols=["doc_id", "seq"])
    tbl.write_snapshot(b, key_cols=["doc_id", "seq"])
    assert tbl.read(spark, as_of_snapshot=0).count() == a.count()
    assert tbl.read(spark, as_of_snapshot=1).count() == df.count()
    assert tbl.read(spark).count() == df.count()
    m0 = tbl.read_manifest(spark, as_of_snapshot=0)
    assert m0.select("snapshot_id").distinct().collect() == [(0,)]
    with pytest.raises(FileNotFoundError):
        tbl.read(spark, as_of_snapshot=-1)
