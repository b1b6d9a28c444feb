"""Streaming tumbling/sliding frame aggs + custom stateful operator.

Parity model: the streaming plan drained with availableNow must equal the
equivalent batch aggregation on the same files (complete mode — watermark
late-drop is Spark-internal behavior, not re-tested here; state continuation
ACROSS micro-batches is exercised via maxFilesPerTrigger=1 with
order-insensitive cumulative asserts).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from audio_feature_extraction_spark.streaming.stateful import stream_running_totals
from audio_feature_extraction_spark.streaming.windows import (
    stream_sliding_agg,
    stream_tumbling_agg,
)

SCHEMA = "doc_id string, ts timestamp, n_tok int, value double"


def _drain(out, ckpt, name, mode):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out.sparkSession.table(name)


def _src(spark, tiny_df, tmp_path):
    seq, _ = tiny_df
    src = str(tmp_path / "src")
    seq.select("doc_id", "ts", "n_tok", "value").write.parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src), src


def test_stream_tumbling_matches_batch(spark, tiny_df, tmp_path):
    stream, src = _src(spark, tiny_df, tmp_path)
    out = stream_tumbling_agg(stream, keys=["doc_id"], size="60 seconds", agg_value="n_tok")
    got = _drain(out, str(tmp_path / "ck1"), "tumb", "complete").toPandas()

    batch = spark.read.parquet(src)
    want = (
        batch.groupBy(F.window("ts", "60 seconds"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("sum_value"))
        .select(
            F.col("window.start").alias("frame_start"),
            F.col("window.end").alias("frame_end"),
            "doc_id",
            "n_rows",
            "sum_value",
        )
        .toPandas()
    )
    key = ["doc_id", "frame_start", "frame_end", "n_rows", "sum_value"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)


def test_stream_sliding_overlap(spark, tiny_df, tmp_path):
    stream, src = _src(spark, tiny_df, tmp_path)
    out = stream_sliding_agg(
        stream, keys=["doc_id"], size="60 seconds", slide="30 seconds"
    )
    got = _drain(out, str(tmp_path / "ck2"), "slide", "complete").toPandas()
    batch = spark.read.parquet(src).toPandas()
    # every row lands in exactly size/slide = 2 overlapping frames
    assert got["n_rows"].sum() == 2 * len(batch)


def test_stateful_running_totals_across_batches(spark, tiny_df, tmp_path):
    seq, _ = tiny_df
    src = str(tmp_path / "src2")
    # two files -> two micro-batches with maxFilesPerTrigger=1; per-key
    # cumulative totals must carry GroupState across the batch boundary
    half = seq.where(F.col("seq") % 2 == 0)
    other = seq.where(F.col("seq") % 2 == 1)
    half.select("doc_id", "ts", "n_tok", "value").coalesce(1).write.parquet(f"{src}/a=1")
    other.select("doc_id", "ts", "n_tok", "value").coalesce(1).write.parquet(f"{src}/a=2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stream_running_totals(stream)
    got = _drain(out, str(tmp_path / "ck3"), "stt", "update").toPandas()

    want = (
        seq.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("cum_rows"),
            F.sum(F.col("n_tok").cast("long")).alias("cum_tokens"),
        )
        .toPandas()
    )
    # state continuation: the FINAL emitted cumulative row per key equals the
    # full-data batch totals (order of the two files is irrelevant — sums commute)
    final = got.sort_values("cum_rows").groupby("doc_id").last().reset_index()
    key = ["doc_id", "cum_rows", "cum_tokens"]
    g = final[key].sort_values("doc_id").reset_index(drop=True)
    w = want[key].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # and at least one key must have emitted twice (two batches touched it)
    assert (got.groupby("doc_id").size() >= 2).any()


def test_stateful_last_value_multichunk(spark, tmp_path):
    """One key's micro-batch spanning MANY Arrow chunks: last_value must be
    the non-null value at the global max ts, not whatever the last-arriving
    chunk held (chunks arrive in arbitrary shuffle order)."""
    import numpy as np

    n = 5000
    rng = np.random.default_rng(0)
    secs = rng.permutation(n)  # rows stored in shuffled event-time order
    pdf = pd.DataFrame(
        {
            "doc_id": "d0",
            "ts": pd.to_datetime(secs, unit="s"),
            "n_tok": 1,
            "value": [float(s) if s % 7 else None for s in secs],
        }
    )
    want_last = float(max(s for s in secs if s % 7))

    src = str(tmp_path / "src3")
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = stream_running_totals(stream)
        got = _drain(out, str(tmp_path / "ck4"), "stt_mc", "update").toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(got) == 1
    assert int(got.cum_rows.iloc[0]) == n
    assert float(got.last_value.iloc[0]) == want_last


def test_stream_interval_join_matches_batch(spark, tiny_df, tmp_path):
    """Watermarked stream-stream trailing-band join drained with availableNow
    equals the equivalent batch interval join on the same files."""
    from audio_feature_extraction_spark.streaming.joins import (
        stream_interval_join,
    )

    seq, _ = tiny_df
    lsrc, rsrc = str(tmp_path / "jl"), str(tmp_path / "jr")
    seq.where(F.col("seq") % 2 == 0).select("doc_id", "ts", "value").write.parquet(lsrc)
    seq.where(F.col("seq") % 2 == 1).select(
        "doc_id", F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    ).write.parquet(rsrc)

    ls = spark.readStream.schema("doc_id string, ts timestamp, value double").parquet(lsrc)
    rs = spark.readStream.schema(
        "doc_id string, r_ts timestamp, r_value double"
    ).parquet(rsrc)
    out = stream_interval_join(
        ls, rs, on=["doc_id"], lo_sec=0.0, hi_sec=120.0, watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sjoin").toPandas()

    lb = spark.read.parquet(lsrc)
    rb = spark.read.parquet(rsrc)
    want = lb.join(
        rb,
        (lb.doc_id == rb.doc_id)
        & (rb.r_ts >= lb.ts - F.expr("INTERVAL 120 SECONDS"))
        & (rb.r_ts <= lb.ts),
        "inner",
    ).drop(rb.doc_id).toPandas()

    key = ["doc_id", "ts", "r_ts", "value", "r_value"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0
    pd.testing.assert_frame_equal(g, w)


def test_stream_dedup_first_matches_batch_when_ordered(spark, tiny_df, tmp_path):
    """Single-partition event-time-ordered replay: streaming first-per-window
    must keep exactly the rows the batch first_per_window keeps."""
    from audio_feature_extraction_spark.operators.dedup import first_per_window
    from audio_feature_extraction_spark.streaming.dedup import stream_dedup_first

    seq, _ = tiny_df
    src = str(tmp_path / "dedup_src")
    (
        seq.select("doc_id", "ts", "n_tok", "value")
        .orderBy("ts", "n_tok")
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stream_dedup_first(
        stream, keys=["doc_id"], ts="ts", window="60 seconds", watermark="0 seconds"
    )
    got = (
        _drain(out, str(tmp_path / "ckd"), "dedup1", "append")
        .toPandas()
        .sort_values(["doc_id", "win_start"])
        .reset_index(drop=True)
    )
    batch = spark.read.parquet(src)
    want = (
        first_per_window(batch, keys=["doc_id"], ts="ts", window_sec=60.0)
        .toPandas()
        .sort_values(["doc_id", "win_start_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (
        pd.to_datetime(got.win_start).astype("int64") // 1000
        == want.win_start_us.to_numpy() // 1  # both µs-exact window starts
    ).all() or (
        pd.to_datetime(got.win_start).astype("datetime64[us]").astype("int64")
        == want.win_start_us.to_numpy()
    ).all()
    assert (got.ts.to_numpy() == want.ts.to_numpy()).all()
    gv, wv = got.value.to_numpy(), want.value.to_numpy()
    import numpy as np

    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


def test_stream_dedup_one_row_per_window(spark, tiny_df, tmp_path):
    """Multi-partition arrival: exactly ONE survivor per (key, window), and
    the (key, window) set equals the batch distinct set."""
    from audio_feature_extraction_spark.streaming.dedup import stream_dedup_first

    seq, _ = tiny_df
    src = str(tmp_path / "dedup_src2")
    seq.select("doc_id", "ts", "n_tok", "value").repartition(4).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stream_dedup_first(
        stream, keys=["doc_id"], ts="ts", window="60 seconds", watermark="0 seconds"
    )
    got = _drain(out, str(tmp_path / "ckd2"), "dedup2", "append").toPandas()
    assert not got.duplicated(["doc_id", "win_start"]).any()
    batch = spark.read.parquet(src).toPandas()
    want_pairs = {
        (d, pd.Timestamp(t).floor("60s"))
        for d, t in zip(batch.doc_id, batch.ts)
    }
    got_pairs = {(d, pd.Timestamp(t)) for d, t in zip(got.doc_id, got.win_start)}
    assert got_pairs == want_pairs


def test_interval_micros_covers_spark_units():
    from audio_feature_extraction_spark.streaming.dedup import _interval_micros

    assert _interval_micros("1 week") == 604_800_000_000
    assert _interval_micros("500 milliseconds") == 500_000
    assert _interval_micros("1 hour 30 minutes") == 5_400_000_000


def test_stream_asof_enrich_matches_batch(spark, tiny_df, tmp_path):
    """Streaming point-in-time enrichment drained with availableNow must
    equal the batch broadcast_arrow as-of on the same files, row for row."""
    from audio_feature_extraction_spark.operators.asof import (
        asof_join,
        dedupe_right,
    )
    from audio_feature_extraction_spark.streaming.asof import (
        stream_asof_enrich,
    )

    stream, src = _src(spark, tiny_df, tmp_path)
    batch = spark.read.parquet(src)
    ref = dedupe_right(
        batch.where(F.col("n_tok") % 3 == 0).select(
            "doc_id", F.col("ts").alias("rts"), F.col("value").alias("rv")
        ),
        on=["doc_id"], ts="rts",
    )
    out = stream_asof_enrich(
        stream, ref, on=["doc_id"], left_ts="ts", right_ts="rts",
        tolerance_sec=3600.0,
    )
    got = (
        _drain(out, str(tmp_path / "cka"), "senrich", "append")
        .toPandas()
        .sort_values(["doc_id", "ts"])
        .reset_index(drop=True)
    )
    want = (
        asof_join(
            batch.select("doc_id", "ts", "n_tok", "value"), ref,
            on=["doc_id"], left_ts="ts", right_ts="rts",
            tolerance_sec=3600.0, strategy="broadcast_arrow",
        )
        .toPandas()
        .sort_values(["doc_id", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "ts", "matched_ts", "rv"]],
        want[["doc_id", "ts", "matched_ts", "rv"]],
    )


def test_stream_asof_refreshing_parity_static_dim(spark, tiny_df, tmp_path):
    """On a STATIC dimension the refreshing foreachBatch form must produce
    exactly the rows of the pinned-snapshot plan / batch broadcast_arrow
    as-of (drained availableNow, all micro-batches concatenated)."""
    from audio_feature_extraction_spark.operators.asof import (
        asof_join,
        dedupe_right,
    )
    from audio_feature_extraction_spark.streaming.asof import (
        stream_asof_enrich_refreshing,
    )

    stream, src = _src(spark, tiny_df, tmp_path)
    batch = spark.read.parquet(src)
    ref = dedupe_right(
        batch.where(F.col("n_tok") % 3 == 0).select(
            "doc_id", F.col("ts").alias("rts"), F.col("value").alias("rv")
        ),
        on=["doc_id"], ts="rts",
    )
    got_parts = []
    fb = stream_asof_enrich_refreshing(
        load_reference=lambda: ref,
        write=lambda df, epoch: got_parts.append(df.toPandas()),
        on=["doc_id"], left_ts="ts", right_ts="rts", tolerance_sec=3600.0,
    )
    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckr1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        pd.concat(got_parts, ignore_index=True)
        .sort_values(["doc_id", "ts"])
        .reset_index(drop=True)
    )
    want = (
        asof_join(
            batch.select("doc_id", "ts", "n_tok", "value"), ref,
            on=["doc_id"], left_ts="ts", right_ts="rts",
            tolerance_sec=3600.0, strategy="broadcast_arrow",
        )
        .toPandas()
        .sort_values(["doc_id", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "ts", "matched_ts", "rv"]],
        want[["doc_id", "ts", "matched_ts", "rv"]],
    )


def test_stream_asof_refreshing_picks_up_new_snapshot(spark, tiny_df, tmp_path):
    """Mid-stream freshness: with maxFilesPerTrigger=1 (one micro-batch per
    source file) and a loader whose snapshot carries a version counter,
    every micro-batch must be enriched with a NEWER dimension version —
    the pinned-snapshot form by construction serves version 1 forever."""
    from audio_feature_extraction_spark.streaming.asof import (
        stream_asof_enrich_refreshing,
    )

    seq, _ = tiny_df
    src = str(tmp_path / "srcmulti")
    # several part files -> several micro-batches
    seq.select("doc_id", "ts", "n_tok", "value").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    versions = {"n": 0}

    def load_reference():
        versions["n"] += 1
        # dim rows valid from epoch 0 so every event matches; payload = the
        # snapshot version at load time
        return (
            spark.read.parquet(src)
            .select("doc_id").distinct()
            .select(
                "doc_id",
                F.timestamp_seconds(F.lit(0)).alias("rts"),
                F.lit(versions["n"]).alias("dim_version"),
            )
        )

    per_epoch: dict[int, set] = {}
    fb = stream_asof_enrich_refreshing(
        load_reference=load_reference,
        write=lambda df, epoch: per_epoch.setdefault(epoch, set()).update(
            df.toPandas().dim_version.dropna().astype(int).tolist()
        ),
        on=["doc_id"], left_ts="ts", right_ts="rts",
    )
    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckr2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(per_epoch) >= 2, "need multiple micro-batches to show refresh"
    # each micro-batch saw exactly one dim version, and versions advance
    seen = []
    for epoch in sorted(per_epoch):
        vs = per_epoch[epoch]
        assert len(vs) == 1, (epoch, vs)
        seen.append(vs.pop())
    assert seen == sorted(seen) and len(set(seen)) == len(seen), seen
    assert versions["n"] == len(per_epoch)


def test_stream_asof_refreshing_pins_snapshot_between_refreshes(
    spark, tiny_df, tmp_path
):
    """ADVICE r04: with refresh_every=2 the documented contract is 'up to
    2 triggers stale' — the NON-refresh trigger must reuse the FROZEN
    snapshot even when the live dimension source has been rewritten
    underneath (the kernel re-collects its input per micro-batch, so
    without an eager localCheckpoint it would read live state)."""
    from audio_feature_extraction_spark.streaming.asof import (
        stream_asof_enrich_refreshing,
    )

    seq, _ = tiny_df
    src = str(tmp_path / "srcpin")
    seq.select("doc_id", "ts", "n_tok", "value").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    dim = str(tmp_path / "dimpin")

    def write_dim(version: int) -> None:
        (
            spark.read.parquet(src)
            .select("doc_id").distinct()
            .select(
                "doc_id",
                F.timestamp_seconds(F.lit(0)).alias("rts"),
                F.lit(version).alias("dim_version"),
            )
            .write.mode("overwrite").parquet(dim)
        )

    write_dim(1)
    state = {"v": 1}
    per_epoch: dict[int, set] = {}

    def write(df, epoch):
        per_epoch.setdefault(epoch, set()).update(
            df.toPandas().dim_version.dropna().astype(int).tolist()
        )
        # rewrite the LIVE dimension after every micro-batch
        state["v"] += 1
        write_dim(state["v"])

    fb = stream_asof_enrich_refreshing(
        load_reference=lambda: spark.read.parquet(dim),
        write=write,
        on=["doc_id"], left_ts="ts", right_ts="rts",
        refresh_every=2,
    )
    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpin"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(per_epoch) == 3
    seen = []
    for epoch in sorted(per_epoch):
        vs = per_epoch[epoch]
        assert len(vs) == 1, (epoch, vs)
        seen.append(next(iter(vs)))
    # batch 0 refreshes (v1), batch 1 is pinned to v1 despite the live
    # source now holding v2, batch 2 refreshes and sees v3
    assert seen == [1, 1, 3], seen


def test_stream_asof_refreshing_rejects_bad_args(spark):
    from audio_feature_extraction_spark.streaming.asof import (
        stream_asof_enrich_refreshing,
    )
    import pytest

    with pytest.raises(ValueError, match="nearest"):
        stream_asof_enrich_refreshing(
            lambda: None, lambda df, e: None, on=["k"], direction="nearest"
        )
    with pytest.raises(ValueError, match="refresh_every"):
        stream_asof_enrich_refreshing(
            lambda: None, lambda df, e: None, on=["k"], refresh_every=0
        )
