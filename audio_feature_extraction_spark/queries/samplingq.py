"""Deterministic stratified and fixed-size sampling.

Split out of __spark_entry__.py (registry-only now); see that module's
docstring for the cross-engine oracle conventions all queries follow."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from audio_feature_extraction_spark.operators import quality as _Q
from .common import _t


_SAMPLE_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.1}

_SAMPLE_DEFAULT = 0.05

def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling: md5-bucket filter, zero shuffles,
    bit-reproducible across engines and partition layouts."""
    d = _t(spark, sf_dir, "documents")
    out = _Q.stratified_sample(
        d, "doc_id", "source", _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    )
    return out.select("doc_id", "source", "lang", "n_chars")

def _sql_stratified_sample() -> str:
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        " % 10000"
    )
    # round(), matching quality.stratified_sample's threshold derivation
    cases = " ".join(
        f"WHEN source = '{s}' THEN {round(r * 10000)}"
        for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {bucket} < (CASE {cases} ELSE {round(_SAMPLE_DEFAULT * 10000)} END)
"""

_WS_K = 5

def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus draw: A-ES weighted sampling without
    replacement, 5 docs per source with inclusion probability proportional
    to n_chars (operators/quality.py weighted_sample_per_stratum) —
    deterministic on any engine/layout via the md5-derived uniform."""
    d = _t(spark, sf_dir, "documents")
    out = _Q.weighted_sample_per_stratum(
        d, "doc_id", "n_chars", "source", _WS_K
    )
    return out.select(
        "source", "draw_rank", "doc_id", "n_chars", "sample_key"
    )

def _sql_weighted_sample() -> str:
    h = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    u = f"(({h}) + 1) / 1152921504606846976.0"
    return f"""
WITH k AS (
  SELECT source, doc_id, n_chars,
         ln({u}) / CAST(n_chars AS DOUBLE) AS wkey
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (
  SELECT source, doc_id, n_chars, wkey,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY wkey DESC, doc_id)
           AS rk
  FROM k)
SELECT source, CAST(rk AS INT) AS draw_rank, doc_id, n_chars,
       ROUND(wkey, 9) AS sample_key
FROM r WHERE rk <= {_WS_K}
"""

def _q_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size eval-set draw: exactly 3 docs per (source) stratum in
    deterministic md5-hash order — same rows on any engine/layout."""
    d = _t(spark, sf_dir, "documents")
    out = _Q.take_per_stratum(d, "doc_id", "source", 3, out_rank="draw_rank")
    return out.select("source", "draw_rank", "doc_id", "lang")

def _sql_eval_sample() -> str:
    h = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH ranked AS (
  SELECT source, doc_id, lang,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS draw_rank
  FROM documents)
SELECT source, CAST(draw_rank AS INT) AS draw_rank, doc_id, lang
FROM ranked WHERE draw_rank <= 3
"""


_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}

def _q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report (quality.dataset_split):
    md5-bucket range assignment — zero shuffles for the assignment itself,
    stable under corpus growth (a doc's split never flips when other docs
    arrive, the anti-contamination property random splits lack). One
    groupBy(split) for the report: docs, total words, distinct sources."""
    from pyspark.sql import functions as F

    d = _Q.dataset_split(
        _t(spark, sf_dir, "documents"), "doc_id", _SPLIT_FRACS
    )
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_words"),
        F.count_distinct("source").alias("n_sources"),
    )

def _sql_dataset_split() -> str:
    b = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS "
        "BIGINT) % 10000"
    )
    edges, cum = [], 0.0
    for name, frac in _SPLIT_FRACS.items():
        cum += frac
        edges.append((name, round(cum * 10000)))
    edges[-1] = (edges[-1][0], 10000)
    cases = " ".join(f"WHEN {b} < {hi} THEN '{name}'" for name, hi in edges)
    return f"""
SELECT CASE {cases} END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY 1
"""
