"""Pin the driver contract across refactors: queries() key ORDER (the
driver's correctness gate hashes the first 50 entries, so order is part of
the contract) and the exact oracle-SQL text per key.

Two pins, per tools/rotate_registry.py (VERDICT r03 #7):
- PINNED_CONTENT_SHA is order-INSENSITIVE (sorted by key) — a head-50
  rotation must leave it unchanged; it moves only when a query/oracle is
  added, removed, or edited (with a green tools/check_entry.py run to
  justify it).
- PINNED_SHA + PINNED_HEAD are order-sensitive — they move on every
  rotation; `python tools/rotate_registry.py <must-gate names>` prints the
  new values and asserts the names sit inside the head-50.
"""

from __future__ import annotations

import __spark_entry__ as em
from tools.rotate_registry import HEAD_N, content_sha, order_sha

PINNED_N = 105
PINNED_CONTENT_SHA = (
    "ce6b0450cfec5f72d2fc2a8bdce59dc19f1d195440955128ae53ada48c2c9c44"
)
PINNED_SHA = (
    "4685c59dcb934c33b0be1f68404e49bf418fb06964c7b1d32fe3b88ba8b8651a"
)
PINNED_HEAD = [
    "pipeline_features", "pricing_summary", "grouped_stats",
    "delta9", "savgol_smooth",
    "top1_per_group", "locf_fill", "sessionize", "asof_range_merge",
    "equi_join_fanout", "anti_join", "dedup_minhash_lsh", "dedup_exact",
    "ann_cosine_topk", "media_features",
    "cube_report", "text_features", "dtw_band_cost", "dedup_clusters",
    "tumbling_counts", "binpack_assign", "time_range_stats",
    "doc_repetition", "contamination", "stratified_sample",
    "json_props",
    "ann_topk_arrow", "packed_tokens", "eval_sample",
    # new in r05: rotated in over asof_nearest / dedup_clusters_star /
    # unigram_surprisal / dedup_containment / top_ngrams_by_source
    # (driver-green r04, family canaries retained)
    "substring_dedup", "ann_recall_fitted", "ann_auto_topk",
    "dataset_split", "emb_dedup_clusters", "doc_perplexity",
    "ann_recall_neardup",
    "trend_slope",
    # r05 rotation: bigram_lm in (the one never-driver-hashed query,
    # VERDICT r04 #1), trend_fit out (driver-green r04, trend_slope
    # canary retained)
    "ann_recall", "bm25_scores", "tfidf_topterms", "bigram_lm",
    # late-r04 additions, rotated in for the r04 driver hash (the 9
    # rotated out — percentiles, rolling_median, running_totals,
    # ann_ivf/lsh_topk, band_join, length_buckets, token_vocab,
    # packed_rollup — are driver-green in r01-r03)
    "hll_distinct", "weighted_sample", "key_skew", "cms_freq",
    "bloom_prune", "session_overlap", "drift_psi", "approx_quantiles",
    "zorder_prune",
]


def test_registry_contract_pinned():
    keys = list(em.queries())
    assert len(keys) == PINNED_N
    assert keys[:HEAD_N] == PINNED_HEAD
    osql = em.oracle_sql()
    assert set(osql) == set(keys)
    assert order_sha() == PINNED_SHA
    assert content_sha() == PINNED_CONTENT_SHA


def test_content_sha_is_rotation_invariant():
    """The content pin must not depend on dict order: recompute it over a
    reversed view and require the same digest — the property that makes a
    rotation diff reviewable (order pin moves, content pin doesn't)."""
    import hashlib

    osql = em.oracle_sql()
    h = hashlib.sha256()
    for k in sorted(list(em.queries())[::-1]):
        h.update(k.encode())
        h.update(osql.get(k, "").encode())
    assert h.hexdigest() == PINNED_CONTENT_SHA


def test_every_query_is_callable():
    for k, fn in em.queries().items():
        assert callable(fn), k
