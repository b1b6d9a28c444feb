"""Token-array operators: slicing, bin-packing, packed batches.

Split out of __spark_entry__.py (registry-only now); see that module's
docstring for the cross-engine oracle conventions all queries follow."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from audio_feature_extraction_spark.operators.binpack import with_bin_id
from .common import _t
from .flagship import _sequences_from_events


# --------------------------------------------------------------------------
# token-array ops (O2 + bit-identity over the input_hint schema)
# --------------------------------------------------------------------------


def _q_token_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence truncation + array integrity (O2,
    feature_extraction_for_student.py:27): head slice, last element, exact
    int sum — all computed from the actual tokens array so any corruption
    in the array path shows up against the closed-form oracle."""
    seq = _sequences_from_events(spark, sf_dir)
    return seq.select(
        "doc_id",
        "seq",
        "n_tok",
        F.concat_ws(
            ",", F.slice("tokens", 1, F.least(F.lit(8), F.col("n_tok")))
        ).alias("head_csv"),
        F.try_element_at("tokens", F.lit(-1)).alias("tok_last"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("tok_sum"),
    )

_SQL_TOKEN_SLICE = """
WITH b AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id AS INT) AS seq,
         CAST((event_id % 31) + 2 AS INT) AS n_tok
  FROM events)
SELECT doc_id, seq, n_tok,
  array_to_string(range(1, LEAST(8, n_tok) + 1), ',') AS head_csv,
  n_tok AS tok_last,
  CAST(n_tok AS BIGINT) * (n_tok + 1) // 2 AS tok_sum
FROM b
"""

BIN_CAP = 20_000

def _q_binpack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    out = with_bin_id(
        d,
        payload_col="n_chars",
        order_cols=["doc_id"],
        group_cols=["lang"],
        target_payload_per_bin=BIN_CAP,
        mix=False,
        out="bin_id",
    )
    return out.select("doc_id", "lang", "bin_id")

_SQL_BINPACK_ASSIGN = f"""
SELECT doc_id, lang,
  CAST(FLOOR(GREATEST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {BIN_CAP}) AS INT) AS bin_id
FROM documents
"""

def _q_packed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-shape report over the bin-packed corpus: per (lang, bin), doc
    count, payload total, fill ratio vs the bin cap, and the ordered member
    list — the manifest a downstream trainer reads to schedule batches."""
    d = _t(spark, sf_dir, "documents")
    packed = with_bin_id(
        d,
        payload_col="n_chars",
        order_cols=["doc_id"],
        group_cols=["lang"],
        target_payload_per_bin=BIN_CAP,
        mix=False,
        out="bin_id",
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("payload"),
        F.round(F.sum("n_chars") / F.lit(BIN_CAP), 6).alias("fill_ratio"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("members"),
    )

_SQL_PACKED_ROLLUP = f"""
WITH packed AS (
  SELECT doc_id, lang, n_chars,
    CAST(FLOOR(GREATEST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {BIN_CAP}) AS INT) AS bin_id
  FROM documents)
SELECT lang, bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS payload,
  ROUND(SUM(n_chars) / {BIN_CAP}, 6) AS fill_ratio,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
FROM packed GROUP BY lang, bin_id
"""

PACK_CAP = 512  # tokens per packed training batch (n_tok is 2..32 here)

def _q_packed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer-facing packed batches: bin-pack the pre-tokenized sequences
    by cumulative n_tok per source, then emit per (source, bin) the packed
    stream's integrity fingerprint — md5 over the concatenated token CSVs in
    (doc_id, seq) order — plus row/token totals. The fingerprint is the
    per-partition lineage checksum a resumable 10^12-sequence run verifies
    against (north rule: per-partition lineage manifests; the checkpoint
    sink computes the same kind of digest)."""
    seq = _sequences_from_events(spark, sf_dir)
    packed = with_bin_id(
        seq,
        payload_col="n_tok",
        order_cols=["doc_id", "seq"],
        group_cols=["source"],
        target_payload_per_bin=PACK_CAP,
        mix=False,
        out="bin_id",
    )
    csv = F.array_join(F.col("tokens").cast("array<string>"), ",")
    return (
        packed.withColumn("_csv", csv)
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("batch_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("doc_id"), F.col("seq"), F.col("_csv")
                                )
                            )
                        ),
                        lambda s: s["_csv"],
                    ),
                    ",",
                )
            ).alias("pack_md5"),
        )
    )

_SQL_PACKED_TOKENS = f"""
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id AS INT) AS seq,
         CAST(event_id % 31 + 2 AS INT) AS n_tok,
         'src' || CAST(user_id % 4 AS VARCHAR) AS source
  FROM events),
packed AS (
  SELECT *,
    CAST(FLOOR(GREATEST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id, seq
                                 ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {PACK_CAP}) AS INT) AS bin_id,
    array_to_string(list_transform(generate_series(1, n_tok),
                                   x -> CAST(x AS VARCHAR)), ',') AS csv
  FROM s)
SELECT source, bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(SUM(n_tok) AS BIGINT) AS batch_tokens,
  md5(string_agg(csv, ',' ORDER BY doc_id, seq)) AS pack_md5
FROM packed GROUP BY source, bin_id
"""
