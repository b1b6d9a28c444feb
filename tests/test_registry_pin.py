"""Pin the driver contract across refactors: queries() key ORDER (the
driver's correctness gate hashes the first 50 entries, so order is part of
the contract) and the exact oracle-SQL text per key. Any intentional
change must update the pinned hash here — with a green
tools/check_entry.py run to justify it."""

from __future__ import annotations

import hashlib

import __spark_entry__ as em

PINNED_N = 83
PINNED_SHA = "5ee0cb2a0086b2e9a59e9dd534abd388154626105588d8d3df52f8669abafb9f"
PINNED_HEAD = [
    "pipeline_features", "pricing_summary", "grouped_stats", "percentiles",
    "delta9", "rolling_median", "savgol_smooth", "running_totals",
    "top1_per_group", "locf_fill", "sessionize", "asof_range_merge",
    "equi_join_fanout", "anti_join", "dedup_minhash_lsh", "dedup_exact",
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk", "media_features",
    "cube_report", "text_features", "dtw_band_cost", "dedup_clusters",
    "band_join", "tumbling_counts", "sliding_counts", "token_slice",
    "emb_neardup", "binpack_assign", "delta9_centered", "delta9_second",
    "time_range_stats", "grouping_sets_report", "pivot_report",
    "doc_repetition", "contamination", "stratified_sample",
    "length_buckets", "token_vocab", "packed_rollup",
    "session_token_stats", "windowed_dedup", "json_props", "rank_stats",
    "ann_topk_arrow", "packed_tokens", "region_part_revenue",
    "capped_sessions", "eval_sample",
]


def test_registry_contract_pinned():
    keys = list(em.queries())
    assert len(keys) == PINNED_N
    assert keys[:50] == PINNED_HEAD
    osql = em.oracle_sql()
    assert set(osql) == set(keys)
    h = hashlib.sha256()
    for k in keys:
        h.update(k.encode())
        h.update(osql[k].encode())
    assert h.hexdigest() == PINNED_SHA


def test_every_query_is_callable():
    for k, fn in em.queries().items():
        assert callable(fn), k
