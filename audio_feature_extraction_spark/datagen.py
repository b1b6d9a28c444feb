"""Deterministic synthetic input tables (FIXTURES.md §1-2).

Schema follows the authoritative ``BASELINE.json`` ``input_hint``:

    sequences(doc_id string, seq int, tokens array<int32>, n_tok int,
              source string, ts timestamp, value double)

- ``tokens`` is the pre-tokenized payload (reference analog: audio samples,
  `audio_feature_extraction_toolkit/core/feature_extractor.py:41-56`); it must
  survive the pipeline **bit-identically** (int32).
- ``value`` is the per-row observed statistic with ~15% NULLs (analog of
  unvoiced/NaN F0, `core/feature_extractor.py:97-107`).
- ``source`` is skewed: ~60% of docs land on ``web`` to force skew handling.
- ``ts`` has session-sized gaps (analog of VAD silence gaps,
  `04_feature_extraction_experiment/process_audio.py:118-131`) and ~5%
  duplicate-timestamp ties (as-of tie cases). ``seq`` is the deterministic
  within-doc tiebreaker.

reference_events(source string, doc_id string, ts timestamp,
                 ref_vec array<double>)  — right side of the as-of join
(teacher-recording analog, `05_dtw_alignment_experiment/dtw_alignment.py:1377-1416`);
~30% of docs intentionally have NO reference rows (missing-partner case,
`dtw_alignment.py:1443-1472`).

Determinism: every row is a pure function of ``(seed, doc_index)`` via
``np.random.default_rng([seed, doc_index])`` — the driver-side pandas path and
the distributed mapInPandas path call the *same* per-doc function, so the
tables are identical regardless of partitioning. No wall-clock, no global RNG.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

SOURCES = ["teacher", "student01", "student02", "student03", "student04", "books"]
SKEW_SOURCE = "web"  # absorbs ~60% of docs

SEQ_SCHEMA = (
    "doc_id string, seq int, tokens array<int>, n_tok int, "
    "source string, ts timestamp, value double"
)
REF_SCHEMA = "source string, doc_id string, ts timestamp, ref_vec array<double>"

REF_VEC_DIM = 13  # per-coefficient MFCC-mean analog (core/feature_extractor.py:141-150)


@dataclass(frozen=True)
class GenConfig:
    n_docs: int = 40
    seed: int = 42
    min_rows: int = 3
    max_rows: int = 12
    min_tok: int = 16
    max_tok: int = 256
    null_frac: float = 0.15
    tie_frac: float = 0.05
    gap_break_frac: float = 0.25  # fraction of steps that open a >30s gap
    ref_doc_frac: float = 0.70  # docs that have reference (right-side) rows


TINY = GenConfig(n_docs=40, max_tok=64)
SMALL = GenConfig(n_docs=2000, max_tok=256)


def _doc_source(rng: np.random.Generator) -> str:
    if rng.random() < 0.60:
        return SKEW_SOURCE
    return SOURCES[int(rng.integers(0, len(SOURCES)))]


def doc_rows(doc_index: int, cfg: GenConfig) -> pd.DataFrame:
    """All sequence rows for one doc — a pure function of (seed, doc_index)."""
    rng = np.random.default_rng([cfg.seed, int(doc_index)])
    doc_id = f"doc{doc_index:08d}"
    source = _doc_source(rng)
    n_rows = int(rng.integers(cfg.min_rows, cfg.max_rows + 1))

    # event times: mostly small steps, some session-breaking gaps, some ties
    base = np.int64(doc_index) * 997_000_000  # microseconds offset per doc
    steps = np.where(
        rng.random(n_rows) < cfg.gap_break_frac,
        rng.integers(40_000_000, 120_000_000, n_rows),  # 40–120 s gap
        rng.integers(1_000_000, 10_000_000, n_rows),  # 1–10 s
    )
    ties = rng.random(n_rows) < cfg.tie_frac
    steps = np.where(ties, 0, steps)
    steps[0] = 0
    ts_us = base + np.cumsum(steps.astype(np.int64))
    ts = EPOCH + ts_us.astype("timedelta64[us]")

    value = rng.normal(0.0, 1.0, n_rows)
    value = np.where(rng.random(n_rows) < cfg.null_frac, np.nan, value)

    lengths = np.clip(
        np.exp(rng.normal(np.log(cfg.min_tok * 2), 0.9, n_rows)).astype(np.int64),
        cfg.min_tok,
        cfg.max_tok,
    )
    tokens = [
        rng.integers(-(2**31), 2**31 - 1, int(n), dtype=np.int64).astype(np.int32)
        for n in lengths
    ]

    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "seq": np.arange(n_rows, dtype=np.int32),
            "tokens": tokens,
            "n_tok": lengths.astype(np.int32),
            "source": source,
            "ts": pd.Series(ts),
            "value": value,
        }
    )


def ref_rows(doc_index: int, cfg: GenConfig) -> pd.DataFrame:
    """Reference (right-side) rows for one doc; empty for ~30% of docs."""
    rng = np.random.default_rng([cfg.seed + 1_000_003, int(doc_index)])
    doc_id = f"doc{doc_index:08d}"
    # source must agree with the sequences side → re-derive with the same stream
    src_rng = np.random.default_rng([cfg.seed, int(doc_index)])
    source = _doc_source(src_rng)
    if rng.random() > cfg.ref_doc_frac:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype="string"),
                "doc_id": pd.Series([], dtype="string"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "ref_vec": pd.Series([], dtype=object),
            }
        )
    n = int(rng.integers(2, 8))
    base = np.int64(doc_index) * 997_000_000
    ts_us = base + np.sort(rng.integers(-30_000_000, 90_000_000, n).astype(np.int64))
    ts_us = np.unique(ts_us)  # right side is deduped per (key, ts)
    ts = EPOCH + ts_us.astype("timedelta64[us]")
    vecs = [rng.normal(0.0, 1.0, REF_VEC_DIM) for _ in range(len(ts_us))]
    return pd.DataFrame(
        {"source": source, "doc_id": doc_id, "ts": pd.Series(ts), "ref_vec": vecs}
    )


def _concat(parts: list[pd.DataFrame], empty_schema: pd.DataFrame) -> pd.DataFrame:
    parts = [p for p in parts if len(p)]
    return pd.concat(parts, ignore_index=True) if parts else empty_schema


def gen_sequences_pdf(cfg: GenConfig = TINY) -> pd.DataFrame:
    return _concat([doc_rows(i, cfg) for i in range(cfg.n_docs)], doc_rows(0, cfg).iloc[:0])


def gen_reference_pdf(cfg: GenConfig = TINY) -> pd.DataFrame:
    return _concat([ref_rows(i, cfg) for i in range(cfg.n_docs)], ref_rows(0, cfg).iloc[:0])


def gen_sequences(spark, cfg: GenConfig = TINY, partitions: int | None = None):
    """Distributed generator: identical rows to :func:`gen_sequences_pdf`.

    spark.range over doc indices → mapInPandas calling the same pure per-doc
    function. This is the scale path (10^12-sequence analog): generation cost
    is spread over executors and never materializes on the driver.
    """
    parts = partitions or max(8, cfg.n_docs // 256)

    def gen(batches):
        for b in batches:
            for i in b["id"].to_numpy():
                yield doc_rows(int(i), cfg)

    return (
        spark.range(0, cfg.n_docs, 1, parts)
        .mapInPandas(gen, schema=SEQ_SCHEMA)
    )


def gen_reference(spark, cfg: GenConfig = TINY, partitions: int | None = None):
    parts = partitions or max(8, cfg.n_docs // 256)

    def gen(batches):
        for b in batches:
            for i in b["id"].to_numpy():
                r = ref_rows(int(i), cfg)
                if len(r):
                    yield r

    return (
        spark.range(0, cfg.n_docs, 1, parts)
        .mapInPandas(gen, schema=REF_SCHEMA)
    )
