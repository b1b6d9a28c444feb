"""Round-5 property/guard tests: interval-join fan-out guard, IVM drift
re-baseline, and the other VERDICT r04 / ADVICE items."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators.rangejoin import (
    interval_overlap_join,
)

US = 1_000_000
DAY = 86_400 * US


def _frames(spark, rng, n, max_len_us, id_prefix=("lid", "rid")):
    starts = rng.integers(-3 * DAY, 3 * DAY, n)
    lens = rng.integers(0, max_len_us, n)
    left = pd.DataFrame(
        {id_prefix[0]: range(n), "s1": starts, "e1": starts + lens}
    )
    starts2 = rng.integers(-3 * DAY, 3 * DAY, n)
    lens2 = rng.integers(0, max_len_us, n)
    right = pd.DataFrame(
        {id_prefix[1]: range(n), "s2": starts2, "e2": starts2 + lens2}
    )
    return left, right


def _brute(left, right):
    return {
        (int(a.lid), int(b.rid))
        for a in left.itertuples()
        for b in right.itertuples()
        if a.s1 <= b.e2 and b.s2 <= a.e1
    }


def test_interval_join_fanout_guard_fires_with_fix_named(spark):
    """A month-long interval at a 1 s bucket would explode to ~2.6 M rows;
    the guard must fail fast, name the offending side and a bucket_sec
    that fits (VERDICT r04 #5)."""
    rng = np.random.default_rng(11)
    left, right = _frames(spark, rng, 20, 2 * US)
    # make one RIGHT interval a month long
    right.loc[0, "e2"] = right.loc[0, "s2"] + 30 * DAY
    with pytest.raises(ValueError, match="right.*bucket_sec|bucket_sec.*right"):
        interval_overlap_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "s1", "e1", "s2", "e2",
            bucket_sec=1.0, max_fanout_per_row=512,
        )


def test_interval_join_widen_month_long_matches_bruteforce(spark):
    """on_excess='widen' auto-derives a cap-respecting bucket; the emitted
    pairs are bucket-invariant, so the result must equal brute force AND
    the unguarded run at a hand-picked big bucket."""
    rng = np.random.default_rng(13)
    left, right = _frames(spark, rng, 60, 5 * DAY)
    # a few month-long intervals on both sides
    for i in (0, 7):
        left.loc[i, "e1"] = left.loc[i, "s1"] + 31 * DAY
        right.loc[i, "e2"] = right.loc[i, "s2"] + 29 * DAY
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    widened = (
        interval_overlap_join(
            l, r, "s1", "e1", "s2", "e2",
            bucket_sec=60.0, max_fanout_per_row=64, on_excess="widen",
        )
        .select("lid", "rid").toPandas()
    )
    got = set(map(tuple, widened.values.tolist()))
    assert len(widened) == len(got), "duplicate pair emitted after widening"
    assert got == _brute(left, right)
    manual = (
        interval_overlap_join(
            l, r, "s1", "e1", "s2", "e2",
            bucket_sec=7 * 86_400.0, max_fanout_per_row=None,
        )
        .select("lid", "rid").toPandas()
    )
    assert set(map(tuple, manual.values.tolist())) == got


def test_interval_join_guard_quiet_within_cap(spark):
    """Short intervals under the default cap: guard on, no error, pairs
    exactly brute force (the guard must not perturb results)."""
    rng = np.random.default_rng(17)
    left, right = _frames(spark, rng, 50, 3 * US)
    got = (
        interval_overlap_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            "s1", "e1", "s2", "e2", bucket_sec=1.0,
        )
        .select("lid", "rid").toPandas()
    )
    assert set(map(tuple, got.values.tolist())) == _brute(left, right)


def test_interval_join_rejects_clashing_column_names(spark):
    """ADVICE r04: identical start/end names across the inputs are
    ambiguous at join resolution — the operator must say so up front."""
    df = spark.range(3).select(
        F.col("id"), F.lit(0).alias("s"), F.lit(10).alias("e")
    )
    with pytest.raises(ValueError, match="distinct"):
        interval_overlap_join(df, df, "s", "e", "s", "e")


def test_interval_join_rejects_bad_on_excess(spark):
    df = spark.range(1).select(
        F.lit(0).alias("s1"), F.lit(1).alias("e1")
    )
    df2 = spark.range(1).select(
        F.lit(0).alias("s2"), F.lit(1).alias("e2")
    )
    with pytest.raises(ValueError, match="on_excess"):
        interval_overlap_join(
            df, df2, "s1", "e1", "s2", "e2", on_excess="explode"
        )
