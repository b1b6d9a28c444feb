"""Streaming document-quality scorer (streaming/quality.py): batch-twin
parity, math parity with the gated doc_perplexity query, unseen-vocab
behavior, and the LM-refresh cadence."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.streaming.quality import (
    corpus_bigram_lm,
    stream_doc_xent,
    stream_doc_xent_rebaselined,
)

SCHEMA = "doc_id long, text string"


def _docs_pdf(rng, n, vocab):
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [
                " ".join(
                    vocab[i]
                    for i in rng.integers(0, len(vocab), rng.integers(5, 25))
                )
                for _ in range(n)
            ],
        }
    )


@pytest.fixture()
def corpus(spark, tmp_path):
    rng = np.random.default_rng(61)
    pdf = _docs_pdf(rng, 40, [f"w{i}" for i in range(12)])
    path = str(tmp_path / "qsrc")
    spark.createDataFrame(pdf, schema=SCHEMA).repartition(3).write.parquet(
        path
    )
    return path, pdf


def test_stream_scores_equal_batch_twin(spark, corpus, tmp_path):
    """availableNow-drained stream output == the same function on the
    bounded frame, row for row (stateless projection — no watermark, no
    state)."""
    path, _ = corpus
    lm = corpus_bigram_lm(spark.read.parquet(path))
    got_parts = []
    q = (
        stream_doc_xent(
            spark.readStream.schema(SCHEMA).parquet(path), lm
        )
        .writeStream.foreachBatch(
            lambda df, e: got_parts.append(df.toPandas())
        )
        .option("checkpointLocation", str(tmp_path / "ckq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        pd.concat(got_parts, ignore_index=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        stream_doc_xent(spark.read.parquet(path), lm)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_scorer_matches_gated_doc_perplexity(spark):
    """Self-scoring the documents corpus with the pandas scorer must equal
    the gated doc_perplexity query's xent (same tokenization, add-k and V
    conventions; both are means over bigram instances)."""
    from audio_feature_extraction_spark.queries.textq import (
        _q_doc_perplexity,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    lm = corpus_bigram_lm(docs)
    got = (
        stream_doc_xent(docs, lm)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _q_doc_perplexity(spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.n_bigrams.tolist() == want.n_bigrams.tolist()
    # batch rounds at 1e-6; scorer is unrounded — compare at that grain
    assert np.allclose(got.xent, want.xent, atol=2e-6)


def test_unseen_vocab_scores_and_alarms_high(spark, corpus):
    """A document of brand-new words must still score (add-k smoothing)
    and read as maximal surprise — the admission-gate property."""
    path, pdf = corpus
    lm = corpus_bigram_lm(spark.read.parquet(path))
    new = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [999], "text": ["zz yy xx vv uu tt ss rr"]}
        ),
        schema=SCHEMA,
    )
    row = stream_doc_xent(new, lm).collect()[0]
    assert row["xent"] is not None and math.isfinite(row["xent"])
    # every bigram has an unseen context -> P = k/(k·V) = 1/V exactly:
    # the smoothed uniform floor, deterministic whatever the corpus
    assert math.isclose(row["xent"], math.log(lm["v"]), rel_tol=1e-12)
    # and it out-surprises the TYPICAL corpus doc (a rare continuation of
    # a seen context can individually beat 1/V on a tiny vocab, so the
    # mean — not the max — is the honest comparison)
    base = stream_doc_xent(spark.read.parquet(path), lm).agg(
        F.avg("xent")
    ).collect()[0][0]
    assert row["xent"] > base
    # single-token doc: no bigrams -> NULL xent, 0 n_bigrams
    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1000], "text": ["solo"]}), schema=SCHEMA
    )
    r1 = stream_doc_xent(one, lm).collect()[0]
    assert r1["xent"] is None and r1["n_bigrams"] == 0


def test_rebaselined_scorer_pins_and_refreshes(spark, corpus, tmp_path):
    """refresh_every=2: batch 1 scores against the LM of query start even
    though the reference was rewritten under it (collected LM = inherent
    pin); batch 2 refreshes and scores against the NEW reference."""
    path, pdf = corpus
    src = str(tmp_path / "qsrc2")
    spark.createDataFrame(pdf, schema=SCHEMA).repartition(3).write.parquet(
        src
    )
    ref_path = str(tmp_path / "refq")

    def write_ref(vocab_shift: int) -> None:
        rng = np.random.default_rng(71 + vocab_shift)
        rpdf = _docs_pdf(
            rng, 40, [f"w{i + vocab_shift}" for i in range(12)]
        )
        spark.createDataFrame(rpdf, schema=SCHEMA).write.mode(
            "overwrite"
        ).parquet(ref_path)

    write_ref(0)
    per_epoch: dict[int, float] = {}
    state = {"n": 0}

    def write(df, epoch):
        per_epoch[epoch] = float(
            df.agg(F.avg("xent")).collect()[0][0]
        )
        state["n"] += 1
        write_ref(state["n"] * 100)  # rewrite the live reference each batch

    fb = stream_doc_xent_rebaselined(
        load_reference=lambda: spark.read.parquet(ref_path),
        write=write,
        refresh_every=2,
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckq2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(per_epoch) == 3
    e = [per_epoch[k] for k in sorted(per_epoch)]
    # Deterministic discriminator: under a fully-DISJOINT-vocab LM every
    # bigram has an unseen context, so the mean xent is EXACTLY ln(V).
    # Batch 2 refreshed onto the disjoint reference -> exactly ln(12);
    # batch 1 did NOT refresh (pinned to the shared-vocab v0 LM) -> its
    # score is a data-dependent value away from that constant. Had batch 1
    # refreshed, it would sit at ln(12) too.
    floor = math.log(12)
    assert math.isclose(e[2], floor, rel_tol=1e-9), e
    assert not math.isclose(e[0], floor, rel_tol=1e-6), e
    assert not math.isclose(e[1], floor, rel_tol=1e-6), e

    with pytest.raises(ValueError, match="refresh_every"):
        stream_doc_xent_rebaselined(lambda: None, lambda d, x: None,
                                    refresh_every=0)


def test_lm_min_count_prunes_conservatively(spark, corpus):
    """min_count drops hapax bigrams from the LM: pruned-away bigrams
    score at most their unpruned probability (the conservative direction
    for an admission gate), and the LM shrinks."""
    path, pdf = corpus
    docs = spark.read.parquet(path)
    full = corpus_bigram_lm(docs)
    pruned = corpus_bigram_lm(docs, min_count=2)
    assert len(pruned["bigrams"]) < len(full["bigrams"])
    assert all(c >= 2 for c in pruned["bigrams"].values())
    # context totals re-derived from the kept table only
    assert all(
        cw == sum(c for (w1, _), c in pruned["bigrams"].items() if w1 == k)
        for k, cw in pruned["contexts"].items()
    )
    # scores under the pruned LM never read LESS surprising than under
    # the full LM for docs whose bigrams were pruned away entirely
    got_full = (
        stream_doc_xent(docs, full).toPandas().set_index("doc_id").xent
    )
    got_pruned = (
        stream_doc_xent(docs, pruned).toPandas().set_index("doc_id").xent
    )
    assert got_full.notna().equals(got_pruned.notna())


def test_stream_mixture_admit_parity_and_unseen(spark, tmp_path):
    """The streaming temperature-resampling admission (pinned per-source
    thresholds): availableNow drain == the batch resample with the same
    reference, row for row; unseen sources drop under the default."""
    from audio_feature_extraction_spark.operators.quality import (
        source_mixture_resample,
    )
    from audio_feature_extraction_spark.streaming.quality import (
        pinned_mixture_thresholds,
        stream_mixture_admit,
    )

    schema = "doc_id string, source string"
    rows = []
    for src, n in (("web", 3000), ("code", 300)):
        rows.extend((f"{src}-{i:06d}", src) for i in range(n))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source"])
    path = str(tmp_path / "mixsrc")
    spark.createDataFrame(pdf, schema=schema).repartition(3).write.parquet(
        path
    )
    ref = spark.read.parquet(path)
    thr = pinned_mixture_thresholds(ref, alpha=0.5)
    assert thr["code"] == 10_000  # smallest source keeps all

    got_parts = []
    q = (
        stream_mixture_admit(
            spark.readStream.schema(schema).parquet(path), thr
        )
        .writeStream.foreachBatch(
            lambda df, e: got_parts.append(df.toPandas())
        )
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .start()
    )
    q.awaitTermination(120)
    got = (
        pd.concat(got_parts)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        source_mixture_resample(ref, "doc_id", "source", 0.5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # unseen source: dropped by default, fully admitted at buckets
    extra = spark.createDataFrame(
        pd.DataFrame([("x-1", "books")], columns=["doc_id", "source"]),
        schema=schema,
    )
    assert stream_mixture_admit(extra, thr).count() == 0
    assert (
        stream_mixture_admit(extra, thr, unseen_threshold=10_000).count()
        == 1
    )

    # empty thresholds refuse loudly
    with pytest.raises(ValueError, match="non-empty"):
        stream_mixture_admit(extra, {})
