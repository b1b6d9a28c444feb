"""Round-6 property tests: source-mixture temperature resampling."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators.quality import (
    dyadic_pow,
    dyadic_pow_sql,
    source_mixture_rates,
    source_mixture_resample,
)


def _skewed_corpus(spark, sizes: dict[str, int]):
    rows = []
    for src, n in sizes.items():
        rows.extend((f"{src}-doc{i:07d}", src) for i in range(n))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source"])
    )


def test_dyadic_pow_matches_python_pow(spark):
    """The nested-sqrt product equals x**e bit-for-bit for dyadic e (each
    factor is a correctly-rounded sqrt chain; the only extra op is an
    IEEE-exact multiply — equality at 0 ulp is too strict for the
    multi-term products, so pin <= 1 ulp AND exactness for pure powers
    of two)."""
    xs = [0.017, 0.25, 0.5, 0.99, 1.0, 3.7, 1234.5]
    exps = [0.5, 0.25, 0.75, 0.375, 0.0, 1.0]
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    for e in exps:
        got = [
            r["y"]
            for r in df.select(
                dyadic_pow(F.col("x"), e).alias("y")
            ).collect()
        ]
        for x, g in zip(xs, got):
            want = x ** e
            assert g == pytest.approx(want, rel=1e-15), (x, e)
            if e in (0.0, 0.5, 0.25, 1.0):  # single chain: exact
                if e == 0.25:
                    want = math.sqrt(math.sqrt(x))
                elif e == 0.5:
                    want = math.sqrt(x)
                assert g == want, (x, e)


def test_dyadic_pow_rejects_non_dyadic():
    with pytest.raises(ValueError, match="dyadic"):
        dyadic_pow(F.lit(2.0), 0.7)
    with pytest.raises(ValueError, match="dyadic"):
        dyadic_pow_sql("x", 1 / 3)
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        dyadic_pow(F.lit(2.0), 1.5)


def test_source_mixture_realized_proportions_converge(spark):
    """The realized mixture k_s ∝ n_s^alpha: on a 100:10:1 skewed corpus
    the kept shares must match the temperature target within bucket
    quantization + hash noise (relative error < 5% per source)."""
    sizes = {"web": 20_000, "books": 2_000, "code": 200}
    df = _skewed_corpus(spark, sizes)
    for alpha in (0.5, 0.75):
        kept = (
            source_mixture_resample(df, "doc_id", "source", alpha)
            .groupBy("source")
            .count()
            .toPandas()
            .set_index("source")["count"]
        )
        t = {s: n ** alpha for s, n in sizes.items()}
        tot_t = sum(t.values())
        tot_k = kept.sum()
        for s, n in sizes.items():
            target_share = t[s] / tot_t
            realized_share = kept[s] / tot_k
            assert abs(realized_share - target_share) / target_share < 0.05, (
                alpha, s, realized_share, target_share
            )
    # alpha=1 keeps the natural mix: every row survives (rate 1 per source)
    kept_all = source_mixture_resample(df, "doc_id", "source", 1.0).count()
    assert kept_all == sum(sizes.values())


def test_source_mixture_monotone_and_stable_under_growth(spark):
    """Determinism contracts: (a) the kept set is identical across
    partition layouts; (b) growth of ANOTHER source can only shrink a
    source's threshold smoothly — and because acceptance is bucket <
    threshold, the kept set for any source is NESTED across threshold
    moves (monotone), never reshuffled."""
    sizes = {"web": 5_000, "code": 500}
    df = _skewed_corpus(spark, sizes)
    kept1 = set(
        r["doc_id"]
        for r in source_mixture_resample(
            df.repartition(1), "doc_id", "source", 0.5
        ).select("doc_id").collect()
    )
    kept7 = set(
        r["doc_id"]
        for r in source_mixture_resample(
            df.repartition(7), "doc_id", "source", 0.5
        ).select("doc_id").collect()
    )
    assert kept1 == kept7

    # grow web 4x: code keeps everything (still smallest? no — code IS
    # smallest; web's rate falls) -> web's kept set must be a SUBSET of
    # its old kept set, code's unchanged
    sizes_big = {"web": 20_000, "code": 500}
    df_big = _skewed_corpus(spark, sizes_big)
    kept_big = set(
        r["doc_id"]
        for r in source_mixture_resample(
            df_big, "doc_id", "source", 0.5
        ).select("doc_id").collect()
    )
    old_web = {d for d in kept1 if d.startswith("web")}
    new_web_among_old_corpus = {
        d for d in kept_big if d.startswith("web") and int(d[-7:]) < 5_000
    }
    assert new_web_among_old_corpus <= old_web
    assert {d for d in kept1 if d.startswith("code")} == {
        d for d in kept_big if d.startswith("code") and int(d[-7:]) < 500
    }


def test_source_mixture_rates_smallest_source_keeps_all(spark):
    df = _skewed_corpus(spark, {"a": 3_000, "b": 300})
    rates = source_mixture_rates(df, "source", 0.5).toPandas().set_index(
        "source"
    )
    assert rates.loc["b", "accept_threshold"] == 10_000  # keeps 100%
    # a's rate = sqrt(300/3000) = 0.31622... -> floor(3162.2) = 3162
    assert rates.loc["a", "accept_threshold"] == math.floor(
        math.sqrt(300 / 3000) * 10_000
    )


# ----------------------------------------------- split decontamination


def test_split_decontamination_planted_leak(spark):
    """A long span planted in one train doc and one val/test doc must come
    back as a contaminated pair with the exact distinct-shingle count;
    clean docs must not appear."""
    from audio_feature_extraction_spark.operators.quality import (
        dataset_split,
        split_decontamination,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # enough docs that the 80/10/10 hash split lands some on each side
    rows = [(f"doc{i}", f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f") for i in range(60)]
    df0 = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sp = dataset_split(df0, "doc_id").toPandas().set_index("doc_id")["split"]
    train_doc = next(d for d, s in sp.items() if s == "train")
    eval_doc = next(d for d, s in sp.items() if s != "train")
    rows = [
        (d, leak + " " + t if d in (train_doc, eval_doc) else t)
        for d, t in rows
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = split_decontamination(
        df, "doc_id", "text", n=5, min_overlap=2
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["eval_doc_id"] == eval_doc
    assert r["train_doc_id"] == train_doc
    assert r["eval_split"] == sp[eval_doc]
    # the planted 10-word span yields 6 distinct 5-gram shingles; the
    # junction shingles (leak tail + per-doc words) differ between the
    # two docs so exactly 6 are shared
    assert r["shared_shingles"] == 6


def test_split_decontamination_df_cap_drops_boilerplate(spark):
    """A shingle present in more than df_cap train docs is boilerplate:
    with the cap it must not create pairs on its own."""
    from audio_feature_extraction_spark.operators.quality import (
        split_decontamination,
    )

    boiler = "lorem ipsum dolor sit amet consectetur"
    rows = [(f"d{i}", boiler) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    uncapped = split_decontamination(df, "doc_id", "text", n=5, min_overlap=1)
    assert uncapped.count() > 0
    capped = split_decontamination(
        df, "doc_id", "text", n=5, min_overlap=1, df_cap=2
    )
    assert capped.count() == 0
