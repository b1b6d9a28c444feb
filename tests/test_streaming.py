"""Streaming session_window vs batch gap-sessionization parity."""

from audio_feature_extraction_spark import datagen as dg
from audio_feature_extraction_spark.operators.sessionize import (
    session_bounds,
    with_session_id,
)
from audio_feature_extraction_spark.streaming.sessions import (
    run_available_now,
    stream_sessionize,
)

GAP = 30.0


def test_stream_sessions_match_batch(spark, tiny_df, tmp_path):
    seq, _ = tiny_df
    src = str(tmp_path / "src")
    seq.select("doc_id", "ts", "n_tok").write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id string, ts timestamp, n_tok int")
        .parquet(src)
    )
    out = stream_sessionize(
        stream, keys=["doc_id"], ts="ts", gap_sec=GAP, agg_value="n_tok"
    )
    got = run_available_now(out, str(tmp_path / "ckpt")).toPandas()

    sid = with_session_id(seq, keys=["doc_id"], ts="ts",
                          order=["ts", "seq"], gap_sec=GAP)
    want = session_bounds(sid, keys=["doc_id"], ts="ts").toPandas()

    key = ["doc_id", "session_start", "session_end", "n_rows"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert g.equals(w)
