"""One-shot refactoring script: split __spark_entry__.py's query/oracle
pairs into audio_feature_extraction_spark/queries/ family modules, leaving
the entry module as registry only (VERDICT r02 item 7). Behavior-preserving
by construction: blocks are moved verbatim (ast line ranges, preceding
comments included), cross-module references become explicit imports, and
the registry pin test asserts the queries()/oracle_sql() contract hash is
unchanged."""

from __future__ import annotations

import ast
import os
import re

REPO = "/root/repo"
ENTRY = os.path.join(REPO, "__spark_entry__.py")
PKG = os.path.join(REPO, "audio_feature_extraction_spark", "queries")

# name -> module assignment
M = {}


def assign(mod: str, *names: str) -> None:
    for n in names:
        M[n] = mod


assign("common", "EV_GAP_SEC", "EV_TOL_SEC", "EV_GAP_US", "EV_TOL_US",
       "_WU", "_t", "_ev", "_uw", "DAY_US", "EVENT_TYPES")
assign("flagship", "_sequences_from_events", "_reference_from_events",
       "_pipeline", "_pipeline_scalar", "_SQL_PIPELINE")
assign("aggregates",
       "_q_pricing_summary", "_SQL_PRICING", "_q_grouped_stats",
       "_SQL_GROUPED_STATS", "_q_percentiles", "_SQL_PERCENTILES",
       "_q_bool_rates", "_SQL_BOOL_RATES", "_q_missing_rate",
       "_SQL_MISSING_RATE", "_q_corpus_stats", "_SQL_CORPUS_STATS",
       "_q_quality_score", "_SQL_QUALITY_SCORE", "_q_snr_stability",
       "_SQL_SNR_STABILITY", "_q_value_histogram", "_SQL_VALUE_HISTOGRAM",
       "_q_rollup_report", "_SQL_ROLLUP_REPORT", "_q_cube_report",
       "_SQL_CUBE_REPORT", "_q_grouping_sets", "_SQL_GROUPING_SETS",
       "_q_pivot_report", "_SQL_PIVOT_REPORT", "_q_count_distinct",
       "_SQL_COUNT_DISTINCT", "_q_vector_kernel", "_SQL_VECTOR_KERNEL")
assign("sessions",
       "_q_sessionize", "_SQL_SESSIONIZE", "_q_session_stats",
       "_SQL_SESSION_STATS", "_q_session_token_stats",
       "_SQL_SESSION_TOKEN_STATS", "_q_capped_sessions",
       "_SQL_CAPPED_SESSIONS")
assign("windowsq",
       "_q_locf_fill", "_SQL_LOCF_FILL", "_q_lag_lead_delta",
       "_SQL_LAG_LEAD_DELTA", "_duck_edge_lag", "_q_delta9", "_SQL_DELTA9",
       "_q_delta9_centered", "_duck_edge_lead", "_SQL_DELTA9_CENTERED",
       "_q_delta9_second", "_duck_delta9_expr", "_SQL_DELTA9_SECOND",
       "_q_rolling_stats", "_SQL_ROLLING_STATS", "_q_rolling_median",
       "_SQL_ROLLING_MEDIAN", "_q_savgol", "_sql_savgol",
       "_q_gauss_smooth", "_sql_gauss", "_q_preemph_zcr",
       "_SQL_PREEMPH_ZCR", "_q_running_totals", "_SQL_RUNNING_TOTALS",
       "_q_top1_per_group", "_SQL_TOP1", "_q_time_range_stats",
       "_SQL_TIME_RANGE_STATS", "_q_rank_stats", "_SQL_RANK_STATS",
       "TRIM_THRESH", "_q_trim_active", "_SQL_TRIM_ACTIVE", "_q_gate_clip",
       "_SQL_GATE_CLIP", "_q_robust_norm", "_SQL_ROBUST_NORM")
assign("asofq", "_asof_frames", "_q_asof", "_SQL_ASOF_BACKWARD",
       "_SQL_ASOF_FORWARD")
assign("joins",
       "_q_equi_join_fanout", "_SQL_EQUI_JOIN_FANOUT", "_q_anti_join",
       "_SQL_ANTI_JOIN", "BAND_HI_SEC", "BAND_HI_US", "_q_band_join",
       "_SQL_BAND_JOIN", "_q_region_part_revenue",
       "_SQL_REGION_PART_REVENUE", "_q_union_distinct",
       "_SQL_UNION_DISTINCT", "_q_intersect_users", "_SQL_INTERSECT_USERS")
assign("dedupq",
       "_q_dedup_exact", "_SQL_DEDUP_EXACT", "NGRAM_DF_CAP", "_sql_jaccard",
       "_SQL_JACCARD_BASE", "_q_dedup_ngram", "_q_dedup_clusters",
       "_sql_dedup_clusters", "_q_dedup_minhash", "_duck_word_hash",
       "_sql_simhash_cte", "_q_simhash", "_sql_simhash", "_q_simhash_pairs",
       "_sql_simhash_pairs", "_q_windowed_dedup", "_SQL_WINDOWED_DEDUP")
assign("textq",
       "_q_text_features", "_sql_text_features", "_q_doc_repetition",
       "_SQL_DOC_REPETITION", "_q_contamination", "_SQL_CONTAMINATION",
       "_q_length_buckets", "_SQL_LENGTH_BUCKETS", "_q_token_vocab",
       "_SQL_TOKEN_VOCAB", "_q_json_props", "_SQL_JSON_PROPS")
assign("similarityq",
       "_q_ann_topk", "_SQL_ANN_TOPK", "_q_lsh_topk", "_sql_ann_lsh",
       "IVF_CELLS", "IVF_NPROBE", "IVF_SEED", "_q_ivf_topk", "_sql_ann_ivf",
       "_q_ann_topk_arrow", "_SQL_ANN_TOPK_ARROW", "NEARDUP_COS",
       "NEARDUP_PLANT", "_emb_with_planted", "_q_emb_neardup",
       "_sql_emb_neardup", "_q_media_features", "_sql_media_features",
       "_q_frame_sample", "_SQL_FRAME_SAMPLE")
assign("samplingq", "_SAMPLE_RATES", "_SAMPLE_DEFAULT",
       "_q_stratified_sample", "_sql_stratified_sample", "_q_eval_sample",
       "_sql_eval_sample")
assign("tokensq", "_q_token_slice", "_SQL_TOKEN_SLICE", "BIN_CAP",
       "_q_binpack_assign", "_SQL_BINPACK_ASSIGN", "_q_packed_rollup",
       "_SQL_PACKED_ROLLUP", "PACK_CAP", "_q_packed_tokens",
       "_SQL_PACKED_TOKENS")
assign("streamsq", "TUMBLE_US", "SLIDE_US", "_q_tumbling_counts",
       "_SQL_TUMBLING_COUNTS", "_q_sliding_counts", "_SQL_SLIDING_COUNTS")
assign("dtwq", "_DTW_CAP", "_DTW_BAND", "_DTW_DW", "_DTW_SW",
       "_q_dtw_band_cost", "_SQL_DTW_BAND_COST")

MODULE_ORDER = ["common", "flagship", "aggregates", "sessions", "windowsq",
                "asofq", "joins", "dedupq", "textq", "similarityq",
                "samplingq", "tokensq", "streamsq", "dtwq"]

MODULE_DOC = {
    "common": "Shared helpers: table loaders, window specs, event-table constants.",
    "flagship": "Flagship point-in-time pipeline query + its oracle.",
    "aggregates": "Grouped/rollup/cube/pivot aggregations and corpus statistics.",
    "sessions": "Gap-based sessionization and per-session statistics.",
    "windowsq": "Per-entity ordered-window features (LOCF, deltas, rolling, smoothing, ranks).",
    "asofq": "Point-in-time as-of join queries (all strategies).",
    "joins": "Equi/anti/band/star joins and set operations.",
    "dedupq": "Exact and near-duplicate detection (jaccard, minhash-LSH, simhash, clusters).",
    "textq": "Text analysis: language-ID, quality, repetition, contamination, vocab.",
    "similarityq": "Embedding similarity search (brute force, LSH, IVF, Arrow) and multimodal.",
    "samplingq": "Deterministic stratified and fixed-size sampling.",
    "tokensq": "Token-array operators: slicing, bin-packing, packed batches.",
    "streamsq": "Batch twins of the streaming tumbling/sliding window aggregations.",
    "dtwq": "Exact banded weighted-DTW alignment kernel query.",
}

# alias/token -> import line (added to a module iff the token appears)
IMPORT_RULES = [
    (r"\bF\.", "from pyspark.sql import functions as F"),
    (r"\bW\.", "from audio_feature_extraction_spark.operators import windows as W"),
    (r"\b_D\.", "from audio_feature_extraction_spark.operators import dedup as _D"),
    (r"\b_M\.", "from audio_feature_extraction_spark.operators import multimodal as _M"),
    (r"\b_S\.", "from audio_feature_extraction_spark.operators import similarity as _S"),
    (r"\b_T\.", "from audio_feature_extraction_spark.operators import text as _T"),
    (r"\b_ST\.", "from audio_feature_extraction_spark.operators import stats as _ST"),
    (r"\b_Q\.", "from audio_feature_extraction_spark.operators import quality as _Q"),
    (r"\basof_join\b", "from audio_feature_extraction_spark.operators.asof import asof_join"),
    (r"\bdedupe_right\b", "from audio_feature_extraction_spark.operators.asof import dedupe_right"),
    (r"\bbackfill\b", "from audio_feature_extraction_spark.operators.backfill import backfill"),
    (r"\blocf\b", "from audio_feature_extraction_spark.operators.backfill import locf"),
    (r"\bsession_bounds\b", "from audio_feature_extraction_spark.operators.sessionize import session_bounds"),
    (r"\bwith_session_id\b", "from audio_feature_extraction_spark.operators.sessionize import with_session_id"),
    (r"\bts_micros\b", "from audio_feature_extraction_spark.operators.timeutil import ts_micros"),
    (r"\bfeature_pipeline\b", "from audio_feature_extraction_spark.plans.pipeline import feature_pipeline"),
    (r"\breference_from_events\b", "from audio_feature_extraction_spark.plans.from_events import reference_from_events"),
    (r"\bsequences_from_events\b", "from audio_feature_extraction_spark.plans.from_events import sequences_from_events"),
    (r"\bband_join_stats\b", "from audio_feature_extraction_spark.operators.rangejoin import band_join_stats"),
    (r"\btrim_to_active\b", "from audio_feature_extraction_spark.operators.windows import trim_to_active"),
    (r"\bwith_bin_id\b", "from audio_feature_extraction_spark.operators.binpack import with_bin_id"),
]

HEADER_BASE = (
    "from __future__ import annotations\n\n"
    "from pyspark.sql import DataFrame, SparkSession, Window\n"
)


def main() -> None:
    src = open(ENTRY).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # block name resolution
    def block_name(node) -> str | None:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return node.name
        if isinstance(node, ast.Assign):
            t = node.targets[0]
            if isinstance(t, ast.Name):
                return t.id
            if isinstance(t, ast.Tuple):  # IVF_CELLS, IVF_NPROBE, IVF_SEED
                return t.elts[0].id
        return None

    blocks: dict[str, list[str]] = {m: [] for m in MODULE_ORDER}
    keep_for_entry: list[tuple[int, int]] = []  # (start, end) 1-based
    prev_end = 0
    for node in tree.body:
        name = block_name(node)
        start = prev_end + 1  # include preceding comments/blank lines
        end = node.end_lineno
        prev_end = end
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            continue  # imports are regenerated per module
        if isinstance(node, ast.Expr) and node.lineno == 1:
            continue  # module docstring, re-emitted verbatim
        if name in ("entry", "queries", "oracle_sql"):
            keep_for_entry.append((start, end))
            continue
        if name is None:
            raise SystemExit(
                f"unnameable block at lines {node.lineno}-{node.end_lineno}"
            )
        mod = M.get(name)
        if mod is None:
            raise SystemExit(f"UNMAPPED top-level name: {name}")
        text = "".join(lines[start - 1:end])
        # strip leading blank lines, keep comments
        text = re.sub(r"^\n+", "", text)
        blocks[mod].append(text)

    # write package modules
    os.makedirs(PKG, exist_ok=True)
    defined_in = {n: m for n, m in M.items()}
    for mod in MODULE_ORDER:
        body = "\n\n".join(b.rstrip("\n") for b in blocks[mod]) + "\n"
        imports = [HEADER_BASE]
        for pat, line in IMPORT_RULES:
            if re.search(pat, body) and line not in imports:
                imports.append(line + "\n")
        # cross-module names
        needed: dict[str, set[str]] = {}
        for name, owner in defined_in.items():
            if owner == mod:
                continue
            if re.search(rf"\b{re.escape(name)}\b", body):
                needed.setdefault(owner, set()).add(name)
        cross = []
        for owner in MODULE_ORDER:
            if owner in needed:
                ns = ", ".join(sorted(needed[owner]))
                cross.append(f"from .{owner} import {ns}\n")
        doc = MODULE_DOC[mod]
        hdr = (
            f'"""{doc}\n\nSplit out of __spark_entry__.py (registry-only now); '
            "see that module's\ndocstring for the cross-engine oracle "
            'conventions all queries follow."""\n\n'
        )
        with open(os.path.join(PKG, f"{mod}.py"), "w") as f:
            f.write(hdr + "".join(imports) + "".join(cross) + "\n\n" + body)

    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write(
            '"""Query/oracle registry package: one module per operator '
            'family.\n\nThe ordered registry itself lives in '
            '__spark_entry__.py (order is part of\nthe driver contract).'
            '"""\n'
        )

    # rebuild __spark_entry__.py: docstring + registry imports + kept blocks
    docstring = "".join(lines[0:17])
    entry_blocks = []
    for s, e in keep_for_entry:
        t = "".join(lines[s - 1:e])
        entry_blocks.append(re.sub(r"^\n+", "", t))
    body = "\n\n".join(b.rstrip("\n") for b in entry_blocks) + "\n"
    # names referenced by the kept blocks (entry/queries/oracle_sql bodies)
    needed: dict[str, set[str]] = {}
    for name, owner in defined_in.items():
        if re.search(rf"\b{re.escape(name)}\b", body):
            needed.setdefault(owner, set()).add(name)
    imps = ["from __future__ import annotations\n\n",
            "from collections.abc import Callable\n\n",
            "from pyspark.sql import DataFrame, SparkSession\n"]
    for owner in MODULE_ORDER:
        if owner in needed:
            ns = sorted(needed[owner])
            line = f"from audio_feature_extraction_spark.queries.{owner} import (  # noqa: E501\n"
            for n in ns:
                line += f"    {n},\n"
            line += ")\n"
            imps.append(line)
    with open(ENTRY, "w") as f:
        f.write(docstring + "\n" + "".join(imps) + "\n\n" + body)
    print("split complete")


if __name__ == "__main__":
    main()
