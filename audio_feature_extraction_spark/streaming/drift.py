"""Streaming distribution-drift monitor: windowed PSI against a pinned
reference distribution (SURVEY.md §2.9 + the round-4 `drift_psi` batch
query's incremental form).

Each event-time window emits one row per key with the population
stability index of the window's value distribution vs the REFERENCE
period's — the gate a 100 TB ingestion pipeline puts in front of
training-data deltas (PSI < 0.1 stable / 0.1-0.25 moderate / > 0.25
shifted: stop the merge).

Snapshot contract (same as streaming/asof.py's pinned form, stated
loudly): the reference distribution is collected ONCE at plan build and
embedded as literals — a long-running query compares against the
reference as of query start; re-create the query (or wrap in
foreachBatch, see asof's refreshing variant) to re-baseline.

State is bounded: one row of n_bins+1 counters per (window, key) under
the watermark; the PSI fold itself is a stateless projection after the
windowed agg — identical expressions to the batch twin, so the
availableNow drain equals the batch computation row-for-row
(tests/test_streaming_drift.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_col(value: str, lo: float, hi: float, n_bins: int) -> Column:
    width = (hi - lo) / n_bins
    b = F.floor((F.col(value).cast("double") - F.lit(lo)) / F.lit(width))
    return F.greatest(F.least(b, F.lit(n_bins - 1)), F.lit(0)).cast("int")


def reference_proportions(
    reference_df: DataFrame,
    key: str,
    value: str,
    lo: float,
    hi: float,
    n_bins: int,
    eps: float = 1e-6,
) -> dict[str, list[float]]:
    """Per-key epsilon-clamped bin proportions of the reference period —
    the collected (driver-side, tiny: keys x n_bins doubles) snapshot the
    streaming plan embeds."""
    counts = (
        reference_df.select(
            F.col(key).alias("_k"),
            _bin_col(value, lo, hi, n_bins).alias("_bin"),
        )
        .groupBy("_k", "_bin")
        .count()
        .collect()
    )
    totals: dict[str, int] = {}
    per_bin: dict[str, dict[int, int]] = {}
    for r in counts:
        totals[r["_k"]] = totals.get(r["_k"], 0) + r["count"]
        per_bin.setdefault(r["_k"], {})[r["_bin"]] = r["count"]
    return {
        k: [
            max(per_bin[k].get(i, 0) / totals[k], eps)
            for i in range(n_bins)
        ]
        for k in totals
    }


def stream_drift_psi_rebaselined(
    load_reference,
    write,
    key: str = "event_type",
    value: str = "value",
    ts: str = "ts",
    size: str = "1 hour",
    lo: float = 0.0,
    hi: float = 600.0,
    n_bins: int = 12,
    eps: float = 1e-6,
    refresh_every: int = 1,
):
    """Baseline-REFRESHING form of :func:`stream_drift_psi` (the drift
    twin of streaming/asof.py's refreshing variant): returns a
    ``foreachBatch`` function that re-derives the reference proportions
    via ``load_reference()`` every ``refresh_every`` micro-batches and
    computes the windowed PSI of each micro-batch against the CURRENT
    baseline, handing the result to ``write(df, epoch_id)``.

    Semantics difference vs the pinned form, stated plainly: windows here
    are event-time windows WITHIN each micro-batch (foreachBatch sees a
    bounded frame; no cross-batch window state), and the baseline can
    move between triggers — the right shape for "compare today's delta
    against the rolling approved corpus", where the pinned form compares
    against the corpus as of query start forever.

    ``load_reference`` must return a BOUNDED DataFrame each call."""
    if refresh_every < 1:
        raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")

    state: dict = {"props": None, "calls": 0}

    def _fb(batch_df: DataFrame, epoch_id: int) -> None:
        if state["props"] is None or state["calls"] % refresh_every == 0:
            ref = load_reference()
            assert not ref.isStreaming, (
                "load_reference must return a bounded DataFrame"
            )
            state["props"] = reference_proportions(
                ref, key, value, lo, hi, n_bins, eps
            )
        state["calls"] += 1
        write(
            stream_drift_psi(
                batch_df, state["props"], key=key, value=value, ts=ts,
                size=size, lo=lo, hi=hi, n_bins=n_bins, eps=eps,
            ),
            epoch_id,
        )

    return _fb


def stream_drift_psi(
    stream_df: DataFrame,
    ref_props: dict[str, list[float]],
    key: str = "event_type",
    value: str = "value",
    ts: str = "ts",
    size: str = "1 hour",
    watermark: str = "2 hours",
    lo: float = 0.0,
    hi: float = 600.0,
    n_bins: int = 12,
    eps: float = 1e-6,
) -> DataFrame:
    """Windowed PSI per key vs the pinned reference proportions (from
    :func:`reference_proportions`). Works identically on a batch frame —
    the batch twin the parity test runs is this same function.

    Keys the reference never saw fall back to an all-eps reference (every
    observed value reads as maximal drift — the right alarm for an unseen
    category)."""
    n_bins_props = {k: len(v) for k, v in ref_props.items()}
    assert all(n == n_bins for n in n_bins_props.values()), n_bins_props

    binned = stream_df.select(
        F.col(ts), F.col(key), _bin_col(value, lo, hi, n_bins).alias("_bin")
    )
    if stream_df.isStreaming:
        binned = binned.withWatermark(ts, watermark)
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).alias(f"_c{i}")
        for i in range(n_bins)
    ]
    g = binned.groupBy(F.window(F.col(ts), size), F.col(key)).agg(*aggs)

    def ref_p(i: int) -> Column:
        expr = None
        for k, props in sorted(ref_props.items()):
            c = F.when(F.col(key) == k, F.lit(props[i]))
            expr = c if expr is None else expr.when(
                F.col(key) == k, F.lit(props[i])
            )
        fallback = F.lit(eps)
        return F.coalesce(expr, fallback) if expr is not None else fallback

    psi = None
    for i in range(n_bins):
        p = ref_p(i)
        q = F.greatest(
            F.col(f"_c{i}").cast("double") / F.col("_n").cast("double"),
            F.lit(eps),
        )
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    return g.select(
        F.col("window.start").alias("frame_start"),
        F.col("window.end").alias("frame_end"),
        F.col(key),
        F.col("_n").alias("n_rows"),
        psi.alias("psi"),
    )
