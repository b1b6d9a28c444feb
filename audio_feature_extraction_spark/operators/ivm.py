"""Incremental view maintenance for grouped count/sum aggregates.

At 100 TB, recomputing a corpus-level materialized view (counts, token
sums, per-source stats) after a small upsert means rescanning the whole
table. Count/sum (and anything derived from them: mean, rate, share) are
*self-maintainable*: the new view is a pure function of the OLD view and
the CDC delta — O(|delta|) work, the base table is never touched.

The delta shape is exactly what
:meth:`~audio_feature_extraction_spark.sources.checkpoint.CheckpointTable.diff_rows`
emits: one row per changed key with ``change`` ∈ ('I','U','D') and
``_old``/``_new`` payload structs. An update whose payload moved the row
to a DIFFERENT group is handled naturally: the old payload retracts from
its old group, the new payload inserts into its new one.

Reference analog: `04_feature_extraction_experiment/
experiment_data_manager.py` recomputes its summary stats from scratch on
every append; this operator is the scale-correct replacement.

Max/min are NOT self-maintainable under deletes (a retracted max needs a
rescan of its group); this module deliberately covers the algebraic
(count/sum) family only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_agg(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The batch view this module maintains: (group, n, s). Run it once at
    bootstrap; afterwards apply :func:`incremental_group_agg` per delta."""
    return df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("s"),
    )


def incremental_group_agg(
    base: DataFrame,
    cdc: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """New view = old view ⊕ delta, without touching the base table.

    ``base`` is a (g, n, s) frame from :func:`group_agg` (or a previous
    maintenance round); ``cdc`` is a ``diff_rows`` frame whose payload
    structs contain ``group_col`` and ``value_col``. Inserts and the new
    side of updates add (+1, +v); deletes and the old side of updates
    retract (-1, -v). One shuffle on the (tiny) delta + one outer join
    against the view — groups whose count reaches 0 drop out, exactly as
    a recompute would.
    """
    add = cdc.where(F.col("change").isin("I", "U")).select(
        F.col(f"_new.{group_col}").alias("g"),
        F.lit(1).alias("dn"),
        F.col(f"_new.{value_col}").cast("double").alias("dv"),
    )
    retract = cdc.where(F.col("change").isin("D", "U")).select(
        F.col(f"_old.{group_col}").alias("g"),
        F.lit(-1).alias("dn"),
        (-F.col(f"_old.{value_col}").cast("double")).alias("dv"),
    )
    delta = (
        add.unionByName(retract)
        .groupBy("g")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    merged = base.join(delta, "g", "full_outer").select(
        "g",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n"),
        (F.coalesce("s", F.lit(0.0)) + F.coalesce("dv", F.lit(0.0))).alias(
            "s"
        ),
    )
    return merged.where(F.col("n") > 0)
