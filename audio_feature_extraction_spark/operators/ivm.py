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
rescan of its group); the count/sum family above stays O(|delta|)
unconditionally. For max the module provides the standard DIRTY-FLAG
hybrid (:func:`group_max` / :func:`incremental_group_max` /
:func:`repair_dirty_max`): inserts maintain the max in O(|delta|); a
retraction that ties the group's current max only FLAGS the group dirty,
and the repair pass rescans JUST the dirty groups (a semi-join filter on
the base — partition-prunable at scale), never the whole table. Groups
whose retractions were all below the max never rescan anything.

Float drift & the re-baseline cadence contract: ``s`` is a running double
maintained by ± deltas, so across many rounds it accumulates FP error
relative to a recompute — catastrophically when a huge value is inserted
then deleted (the sum cancels exactly in math, not in doubles).
Counts (``n``) are exact longs and never drift. The contract: every N
maintenance rounds (pick N by how much drift the consumer tolerates;
the recompute is one scan of the base table) run
:func:`drift_report` against :func:`group_agg` of the current base and,
if any group exceeds tolerance, adopt the recomputed view
(:func:`rebaseline`). For exactly-representable value domains (ints,
scaled decimals) keep the value column DECIMAL upstream and drift is
zero by construction.
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


def drift_report(
    view: DataFrame,
    truth: DataFrame,
    abs_tol: float = 1e-6,
    rel_tol: float = 1e-9,
) -> DataFrame:
    """Groups where the maintained view disagrees with a fresh recompute
    beyond ``|s_view - s_true| > abs_tol + rel_tol·|s_true|`` (or any
    count/membership mismatch — counts are exact, so ANY ``n`` difference
    is a bug, not drift). ``truth`` is :func:`group_agg` over the current
    base table — the one scan the module docstring's cadence contract
    budgets for. Empty result = the view is within tolerance; non-empty =
    re-baseline now (see :func:`rebaseline`).

    One full-outer join on the (small: one row per group) frames — the
    check costs the recompute scan plus a broadcast-sized join, never a
    second base scan."""
    v = view.select(
        "g", F.col("n").alias("n_view"), F.col("s").alias("s_view")
    )
    t = truth.select(
        "g", F.col("n").alias("n_true"), F.col("s").alias("s_true")
    )
    j = v.join(t, "g", "full_outer")
    s_err = F.abs(F.coalesce("s_view", F.lit(0.0)) - F.coalesce("s_true", F.lit(0.0)))
    bad = (
        F.col("n_view").isNull()
        | F.col("n_true").isNull()
        | (F.col("n_view") != F.col("n_true"))
        | (s_err > F.lit(abs_tol) + F.lit(rel_tol) * F.abs(F.coalesce("s_true", F.lit(0.0))))
    )
    return j.where(bad).select(
        "g", "n_view", "n_true", "s_view", "s_true", s_err.alias("s_abs_err")
    )


def rebaseline(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The repair: adopt a fresh recompute as the new view. Alias of
    :func:`group_agg`, named for the cadence contract's vocabulary — after
    this, maintenance resumes from a drift-free (g, n, s) frame."""
    return group_agg(df, group_col, value_col)


# ------------------------------------------------------- max (dirty-flag)


def group_max(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The batch view the max family maintains: (g, n, mx, dirty=false).
    ``n`` rides along so group death is detectable without a rescan."""
    return (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col(value_col).cast("double")).alias("mx"),
        )
        .withColumn("dirty", F.lit(False))
    )


def incremental_group_max(
    base: DataFrame,
    cdc: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Dirty-flag incremental max: O(|delta|) always, with exactness
    bookkeeping instead of a silent lie.

    - Inserts (and the new side of updates) raise ``mx`` directly.
    - A retraction strictly BELOW the group's max cannot change it: no
      flag, still exact.
    - A retraction that TIES the running upper bound ``greatest(mx,
      add_max)`` invalidates it (the max may have been duplicated — only
      a rescan knows), so the group is flagged ``dirty`` and ``mx``
      becomes an upper bound ... UNLESS a concurrent insert STRICTLY
      above the batch's ret_max (and >= the old max) re-establishes an
      exact max, which also CLEANS a previously-dirty group (the insert
      survives any retraction in the batch and dominates any stale upper
      bound). The strict ``add_max > ret_max`` requirement is what makes
      this safe for LOG-STYLE CDC, where a batch may insert a value and
      retract that same value (``add_max == ret_max > mx``): such a
      batch flags the group dirty rather than adopting the
      inserted-then-deleted value as a "clean" max. (Snapshot-diff CDC —
      retracted rows always exist in the view's base, so
      ``ret_max <= mx`` — never hits this branch; the conservative flag
      only costs a repair rescan when it fires.)
    - ``n`` is maintained exactly (like :func:`incremental_group_agg`);
      groups reaching n = 0 drop.

    Consumers must treat ``dirty`` rows' ``mx`` as an upper bound and run
    :func:`repair_dirty_max` (a semi-join-pruned rescan of ONLY the dirty
    groups) before exact reads. One shuffle on the (tiny) delta + one
    outer join against the view."""
    add = cdc.where(F.col("change").isin("I", "U")).select(
        F.col(f"_new.{group_col}").alias("g"),
        F.col(f"_new.{value_col}").cast("double").alias("v"),
    )
    ret = cdc.where(F.col("change").isin("D", "U")).select(
        F.col(f"_old.{group_col}").alias("g"),
        F.col(f"_old.{value_col}").cast("double").alias("v"),
    )
    delta = (
        add.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_add"), F.max("v").alias("add_max"))
        .join(
            ret.groupBy("g").agg(
                F.count(F.lit(1)).alias("n_ret"),
                F.max("v").alias("ret_max"),
            ),
            "g",
            "full_outer",
        )
    )
    j = base.join(delta, "g", "full_outer")
    n = (
        F.coalesce("n", F.lit(0))
        + F.coalesce("n_add", F.lit(0))
        - F.coalesce("n_ret", F.lit(0))
    ).cast("long")
    # clean requires the insert to survive the batch's own retractions:
    # add_max must be STRICTLY above ret_max (== would mean the dominating
    # insert may itself have been retracted — the log-CDC trap) as well as
    # >= the old max.
    clean_by_add = (
        F.col("add_max").isNotNull()
        & (F.col("mx").isNull() | (F.col("add_max") >= F.col("mx")))
        & (F.col("ret_max").isNull() | (F.col("add_max") > F.col("ret_max")))
    )
    # the retraction invalidates when it ties the post-batch upper bound
    # greatest(mx, add_max) — comparing against the OLD mx alone would
    # miss a same-batch insert+retract of a value above it.
    ub = F.greatest("mx", "add_max")  # greatest ignores NULLs
    invalidated = F.col("ret_max").isNotNull() & (
        ub.isNull() | (F.col("ret_max") >= ub)
    )
    new_dirty = (
        F.coalesce("dirty", F.lit(False)) | invalidated
    ) & ~clean_by_add
    return (
        j.select(
            "g",
            n.alias("n"),
            F.greatest("mx", "add_max").alias("mx"),
            new_dirty.alias("dirty"),
        )
        .where(F.col("n") > 0)
    )


def repair_dirty_max(
    view: DataFrame, base: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The selective repair: rescan ONLY the dirty groups (left-semi
    filter on the base — with a group-partitioned/bucketed layout this
    prunes at file level) and splice the exact rows back. Clean groups
    never touch the base. After this every row is exact and
    ``dirty=false``; dirty groups whose rows all vanished drop."""
    dirty_g = view.where(F.col("dirty")).select(
        F.col("g").alias(group_col)
    )
    fresh = group_max(
        base.join(dirty_g, group_col, "left_semi"), group_col, value_col
    )
    return view.where(~F.col("dirty")).unionByName(fresh)
