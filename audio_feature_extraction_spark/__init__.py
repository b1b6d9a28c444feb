"""audio_feature_extraction_spark — a from-scratch, PySpark-native point-in-time
feature-engineering engine.

Capability parity target: chiy48308/audio_feature_extraction (see SURVEY.md).
The reference is a per-file audio feature loop (numpy/librosa); this engine
re-expresses its dataflow semantics — windowed per-entity sequence features,
gap sessionization, LOCF backfill, as-of alignment, grouped evaluation — as
idiomatic Spark DataFrame plans:

- ``operators.asof``       as-of / point-in-time join (union+window sorted merge,
                           cogroup-merge_asof kernel, salting for skew)
- ``operators.sessionize`` gap-based sessionization (VAD segment-merge analog)
- ``operators.backfill``   LOCF / backfill / fill strategies
- ``operators.windows``    lag/lead deltas, width-9 regression delta, rolling
                           stats, Savitzky-Golay, cumulative ops, pre-emphasis
- ``operators.binpack``    n_tok-aware payload-balanced repartitioning
- ``operators.dedup``      exact / MinHash-LSH / SimHash / n-gram Jaccard /
                           cross-doc substring-run (ExactSubstr) dedup
- ``operators.similarity`` brute-force + LSH-bucketed + IVF cell-pruned ANN;
                           Lloyd centroid fitting, regime-routed approx_topk,
                           cell-partitioned parquet index
- ``operators.dtw``        exact banded weighted-step DTW kernel (cogrouped
                           applyInPandas, anti-diagonal-vectorized DP)
- ``operators.text``       language-ID, quality scoring, token counting,
                           fingerprinting
- ``operators.multimodal`` opaque binary media columns + Arrow-batched decode
                           plumbing (decode kernels stubbed; see module docs)
- ``sources.checkpoint``   snapshot commits + per-partition lineage manifests,
                           anti-join resume (Iceberg-style; Parquet fallback)
- ``sources.reports``      CSV/JSON report sinks
- ``sources.config``       YAML/JSON experiment config + env overrides
- ``plans.pipeline``       the flagship end-to-end feature pipeline
- ``streaming``            session_window, tumbling/sliding frames, stateful
                           running totals, watermarked stream-stream interval
                           join

No per-row Python UDFs anywhere: column expressions first, Arrow-vectorized
pandas UDFs (applyInPandas / mapInPandas / cogroup) for true kernels only.
"""

__version__ = "0.1.0"

from audio_feature_extraction_spark.session import get_spark  # noqa: F401
