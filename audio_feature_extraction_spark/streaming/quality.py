"""Streaming document-quality scorer: per-document bigram cross-entropy
against a PINNED corpus LM — the admission gate a training-data ingestion
stream puts in front of NEW documents (the streaming form of the gated
`doc_perplexity` batch query, which scores a corpus against itself).

Shape: the LM (bigram counts, context totals, vocab size) is collected
once from the approved corpus (:func:`corpus_bigram_lm` — a distributed
count whose result is bounded by the corpus VOCABULARY, not its size;
prune with ``min_count`` at scale) and broadcast; scoring is a STATELESS
Arrow pandas_udf projection, so it runs identically on a streaming frame
(no watermark, no state store) and on a bounded one — the batch twin the
parity test runs is the same function. Unseen words/continuations are
exactly what add-k smoothing is for: P(w2|w1) = (c+k)/(cw+k·V) is defined
(and maximally surprising) for bigrams the corpus never saw, so brand-new
documents always score.

Snapshot contract (same as streaming/asof.py + streaming/drift.py, stated
loudly): the pinned form compares against the LM as of plan build
forever; :func:`stream_doc_xent_rebaselined` is the foreachBatch
refreshing variant (re-derive the LM from ``load_reference()`` every
``refresh_every`` triggers).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_bigram_lm(
    reference_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    min_count: int = 1,
) -> dict:
    """Collected LM snapshot from the approved corpus: bigram counts,
    context totals and vocab size, with the SAME tokenization (space
    split) and add-k convention as the batch `doc_perplexity` query.
    ``id_col`` must identify documents (bigrams never span documents) —
    a generated id CANNOT replace it: a monotonically_increasing_id
    projected beside the posexplode is re-evaluated per exploded row
    after projection collapse, silently splitting every doc into
    single-token fragments (the same Generate trap as
    similarity.fit_ivf_centroids' old update step — caught by the
    parity test).

    ``min_count`` drops bigrams rarer than the threshold BEFORE
    collecting (at 100 TB the hapax tail dominates the table; dropping it
    biases rare continuations toward the smoothed floor — the
    conservative direction for an admission gate). Context totals and V
    are computed from the KEPT table so probabilities stay a proper
    distribution over it."""
    from pyspark.sql import Window

    w = reference_df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_w1"),
    )
    wd = Window.partitionBy("_d").orderBy("_pos")
    bi = (
        w.withColumn("_w2", F.lead("_w1").over(wd))
        .where(F.col("_w2").isNotNull())
        .groupBy("_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
    )
    from ..operators.similarity import MAX_DRIVER_COLLECT_ROWS, collect_guarded

    pdf = collect_guarded(
        bi,
        "reference-corpus bigram LM",
        "a larger min_count (prunes the hapax tail before the collect)",
        MAX_DRIVER_COLLECT_ROWS,
    )
    bigrams = {
        (w1, w2): int(c)
        for w1, w2, c in zip(pdf["_w1"], pdf["_w2"], pdf["_c"])
    }
    contexts: dict[str, int] = {}
    vocab: set[str] = set()
    for (w1, w2), c in bigrams.items():
        contexts[w1] = contexts.get(w1, 0) + c
        vocab.add(w2)
    return {
        "bigrams": bigrams,
        "contexts": contexts,
        "v": max(len(vocab), 1),
        "add_k": float(add_k),
    }


def stream_doc_xent(
    df: DataFrame,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, xent) per document under the pinned LM — mean
    -ln P(w2|w1), add-k smoothed; docs with < 2 tokens get NULL xent.
    Stateless Arrow projection: valid on streaming AND bounded frames
    (the batch twin is literally this function)."""
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(
        (lm["bigrams"], lm["contexts"], lm["v"], lm["add_k"])
    )

    @pandas_udf("double")
    def _xent(texts: pd.Series) -> pd.Series:
        bigrams, contexts, v, k = bc.value
        kv = k * v
        out = []
        for t in texts:
            ws = t.split(" ") if t is not None else []
            n, nll = 0, 0.0
            for a, b in zip(ws, ws[1:]):
                nll -= math.log(
                    (bigrams.get((a, b), 0) + k) / (contexts.get(a, 0) + kv)
                )
                n += 1
            out.append(nll / n if n else None)
        return pd.Series(out, dtype="float64")

    n_bi = F.greatest(
        F.size(F.split(F.col(text_col), " ")) - F.lit(1), F.lit(0)
    )
    return df.select(
        F.col(id_col),
        n_bi.cast("long").alias("n_bigrams"),
        _xent(F.col(text_col)).alias("xent"),
    )


def stream_doc_xent_rebaselined(
    load_reference,
    write,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    min_count: int = 1,
    refresh_every: int = 1,
):
    """LM-REFRESHING foreachBatch form (the quality twin of
    streaming/asof's and streaming/drift's refreshing variants): re-derive
    the corpus LM from ``load_reference()`` every ``refresh_every``
    micro-batches and score each batch against the CURRENT LM — 'admit
    against the rolling approved corpus', where the pinned form admits
    against the corpus as of query start forever. ``load_reference`` must
    return a BOUNDED DataFrame each call."""
    if refresh_every < 1:
        raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")

    state: dict = {"lm": None, "calls": 0}

    def _fb(batch_df: DataFrame, epoch_id: int) -> None:
        if state["lm"] is None or state["calls"] % refresh_every == 0:
            ref = load_reference()
            assert not ref.isStreaming, (
                "load_reference must return a bounded DataFrame"
            )
            state["lm"] = corpus_bigram_lm(
                ref, text_col=text_col, add_k=add_k, min_count=min_count
            )
        state["calls"] += 1
        write(
            stream_doc_xent(
                batch_df, state["lm"], id_col=id_col, text_col=text_col
            ),
            epoch_id,
        )

    return _fb


# ---------------------------------------------- source-mixture admission


def pinned_mixture_thresholds(
    reference_df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    buckets: int = 10_000,
) -> dict[str, int]:
    """Collected per-source acceptance thresholds from the APPROVED
    reference corpus (quality.source_mixture_rates) — the pinned
    artifact the streaming admission filter applies. Bounded by the
    number of sources (the mixture operator's own contract); same
    staleness story as the pinned LM above: re-derive on a cadence via
    the foreachBatch pattern if live proportions drift."""
    from audio_feature_extraction_spark.operators.quality import (
        source_mixture_rates,
    )

    rows = source_mixture_rates(
        reference_df, source_col, alpha, buckets
    ).collect()
    return {r["source"]: int(r["accept_threshold"]) for r in rows}


def stream_mixture_admit(
    df: DataFrame,
    thresholds: dict[str, int],
    key_col: str = "doc_id",
    source_col: str = "source",
    buckets: int = 10_000,
    unseen_threshold: int = 0,
) -> DataFrame:
    """Temperature-resampling ADMISSION on a live stream: keep a row iff
    its key's md5 bucket < the pinned per-source threshold. A pure
    projection + filter — no watermark, no state, valid on streaming AND
    bounded frames (the batch twin is literally this function with the
    same thresholds, so admit(stream) == resample(batch) row-for-row
    when the thresholds came from the same reference). Sources absent
    from the pinned dict admit below ``unseen_threshold`` (default 0 =
    drop unseen sources — the conservative gate; pass ``buckets`` to
    admit them fully)."""
    from audio_feature_extraction_spark.operators.quality import hash_bucket

    if not thresholds:
        raise ValueError("thresholds must be non-empty — pin them from "
                         "pinned_mixture_thresholds(reference_df)")
    pairs: list = []
    for s, t in sorted(thresholds.items()):
        pairs.append(F.lit(s))
        pairs.append(F.lit(int(t)))
    m = F.create_map(*pairs)
    thr = F.coalesce(
        m[F.col(source_col)], F.lit(int(unseen_threshold))
    )
    return df.where(hash_bucket(F.col(key_col), buckets) < thr)
