"""Dedup + text operators vs single-process python oracles on the driver
testdata (documents @ sf0.001, which contains planted near-duplicates)."""

import hashlib
import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators import dedup as D
from audio_feature_extraction_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


def _shingle_set(text: str, n: int = 3) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _jaccard_pairs(pdf: pd.DataFrame, threshold: float, n: int = 3):
    sets = {r.doc_id: _shingle_set(r.text, n) for r in pdf.itertuples()}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= threshold:
            out.add((a, b))
    return out


def test_exact_dedup(spark, docs, docs_pdf):
    got = D.exact_dedup(docs, "doc_id").toPandas()
    keys = docs_pdf.text.map(lambda t: " ".join(sorted(set(t.split(" ")))))
    want = (
        pd.DataFrame({"k": keys, "doc_id": docs_pdf.doc_id})
        .groupby("k")
        .agg(survivor_id=("doc_id", "min"), n_dupes=("doc_id", "size"))
        .reset_index()
    )
    assert len(got) == len(want)
    g = got.sort_values("dedup_key").reset_index(drop=True)
    w = want.sort_values("k").reset_index(drop=True)
    assert (g.survivor_id.to_numpy() == w.survivor_id.to_numpy()).all()
    assert (g.n_dupes.to_numpy() == w.n_dupes.to_numpy()).all()


def test_ngram_jaccard_pairs(docs, docs_pdf):
    got = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    want = _jaccard_pairs(docs_pdf, 0.8)
    assert set(zip(got.id_a, got.id_b)) == want
    assert len(want) > 0  # the testdata plants near-dups; don't pass vacuously


def test_ngram_df_cap_kills_stop_shingle_blowup(spark):
    """A stop-shingle shared by k docs produces k^2/2 candidate pairs when
    uncapped — the named 100 TB killer. With df_cap below k the hot shingle is
    dropped from the inverted index and the candidate set collapses."""
    k = 40
    rows = [
        (f"d{i:03d}", f"the quick brown u{i}a u{i}b u{i}c u{i}d") for i in range(k)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    # threshold=0 keeps EVERY candidate pair, making the blowup observable
    uncapped = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.0)
    assert uncapped.count() == k * (k - 1) // 2  # quadratic in the hot df
    capped = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, df_cap=8
    )
    assert capped.count() == 0  # hot shingle dropped -> no candidates at all


def test_minhash_lsh_matches_exact(docs, docs_pdf):
    got = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).toPandas()
    want = _jaccard_pairs(docs_pdf, 0.8)
    assert set(zip(got.id_a, got.id_b)) == want


def test_simhash_pairs_recall(docs, docs_pdf):
    """Banded candidates must equal brute-force hamming pairs (pigeonhole
    recall guarantee for max_hamming < bands)."""
    got = D.simhash_pairs(docs, "doc_id", "text", max_hamming=6).toPandas()
    sig = D.simhash(docs, "doc_id", "text").toPandas()
    sigs = dict(zip(sig.doc_id, sig.simhash))
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= 6
    }
    assert set(zip(got.id_a, got.id_b)) == want
    # planted near-dups should be caught by simhash too
    assert len(want) > 0


def test_simhash_portable_hash(spark):
    """Spark signature bit recipe matches a pure-python md5 recomputation."""
    txt = "the fast key order sort"
    df = spark.createDataFrame([("d0", txt)], "doc_id string, text string")
    got = D.simhash(df, "doc_id", "text").collect()[0].simhash
    sums = np.zeros(D.SIMHASH_BITS)
    for w in txt.split(" "):
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for i in range(D.SIMHASH_BITS):
            sums[i] += 1 if (h >> i) & 1 else -1
    want = sum(1 << i for i in range(D.SIMHASH_BITS) if sums[i] > 0)
    assert got == want


def test_token_counts_and_quality(docs, docs_pdf):
    got = docs.select(
        "doc_id",
        T.whitespace_token_count("text").alias("wc"),
        T.bpe_ish_token_count("text").alias("bc"),
        F.round(T.quality_score("text"), 6).alias("q"),
        T.lang_id("text").alias("lang_pred"),
        T.doc_fingerprint("text").alias("fp"),
        T.min_shingle_fingerprint("text").alias("msf"),
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf = docs_pdf.sort_values("doc_id").reset_index(drop=True)
    assert (got.wc.to_numpy() == pdf.text.map(lambda t: len(t.split(" "))).to_numpy()).all()
    import re

    pat = re.compile(T.BPE_ISH_PATTERN)
    assert (got.bc.to_numpy() == pdf.text.map(lambda t: len(pat.findall(t))).to_numpy()).all()
    assert got.q.between(0.0, 1.0).all()
    # vocabulary is English-y; the marker heuristic must be deterministic
    assert set(got.lang_pred) <= set(list(T.LANG_MARKERS) + ["und"])
    assert (got.fp == pdf.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())).all()
    want_msf = pdf.text.map(
        lambda t: min(
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in _shingle_set(t)
        )
    )
    assert (got.msf.to_numpy() == want_msf.to_numpy()).all()


def test_first_per_window_boundaries(spark):
    """Windowed dedup: exact-us bucketing — a row AT the window boundary
    starts the next window; ties break on the tiebreak column."""
    from datetime import datetime

    from audio_feature_extraction_spark.operators.dedup import first_per_window

    rows = [
        (1, 7, datetime(2024, 1, 1, 0, 0, 0)),   # win 0 first
        (2, 7, datetime(2024, 1, 1, 0, 59, 59)),  # win 0 dup
        (3, 7, datetime(2024, 1, 1, 1, 0, 0)),   # win 1 first (exact boundary)
        (5, 7, datetime(2024, 1, 1, 1, 0, 0)),   # tie: higher event_id loses
        (4, 8, datetime(2024, 1, 1, 0, 30, 0)),  # other key, own window
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = first_per_window(
        df, keys=["user_id"], ts="ts", window_sec=3600.0, tiebreak=["event_id"]
    )
    got = {(r["user_id"], r["event_id"]) for r in out.collect()}
    assert got == {(7, 1), (7, 3), (8, 4)}


def test_lang_id_cjk_substring_and_und(spark):
    """zh markers must fire on space-free CJK text (substring counting);
    out-of-lexicon text returns 'und', not a default language."""
    from audio_feature_extraction_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "我是学生他在北京的家"),       # 是/在/的 → zh
            (2, "the cat and the dog"),       # en
            (3, "quantum flux capacitor"),    # zero hits anywhere → und
        ],
        "doc_id long, text string",
    )
    out = dict(df.select("doc_id", lang_id("text").alias("l")).collect())
    assert out == {1: "zh", 2: "en", 3: "und"}


def test_connected_components_planted(spark):
    """Chain a-b-c plus pair d-e plus singleton f: min-label propagation
    must find {a,b,c}, {d,e}, {f} regardless of edge orientation or
    partitioning."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4)], "id_a long, id_b long"
    ).repartition(5)
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "id long"
    ).repartition(3)
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_chain(spark):
    """A 12-node path needs multiple propagation rounds; the driver loop
    must iterate to the fixpoint, not stop after one round."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    out = connected_components(edges, nodes).collect()
    assert all(r["cluster_id"] == 1 for r in out) and len(out) == n


def test_connected_components_no_edges(spark):
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components(empty, nodes).collect()
    assert {r["node"]: r["cluster_id"] for r in out} == {i: i for i in range(5)}


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star and min-label propagation must agree on random
    graphs (both = min reachable id)."""
    import random

    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    n = 30
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    a = {r["node"]: r["cluster_id"] for r in connected_components(e, nodes).collect()}
    b = {r["node"]: r["cluster_id"] for r in connected_components_star(e, nodes).collect()}
    assert a == b


def test_star_cc_long_chain(spark):
    """A 64-node path: star contraction must reach the fixpoint well inside
    the O(log n) budget (min-label would need 63 rounds)."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components_star,
    )

    n = 64
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    out = connected_components_star(e, nodes, max_iter=14).collect()
    assert len(out) == n and all(r["cluster_id"] == 1 for r in out)


def test_cc_out_of_universe_edges_ignored_consistently(spark):
    """Edges incident to ids absent from `nodes` are ignored by BOTH CC
    implementations — no relaying through, or labels landing on,
    out-of-universe ids (review finding r03)."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # x=99 outside the universe bridges 1-99-2: both impls must NOT merge
    edges = spark.createDataFrame(
        [(1, 99), (99, 2), (3, 4)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    for fn in (connected_components, connected_components_star):
        got = {r["node"]: r["cluster_id"] for r in fn(edges, nodes).collect()}
        assert got == {1: 1, 2: 2, 3: 3, 4: 3}, fn.__name__


def test_cc_raises_when_not_converged(spark):
    """Exhausting max_iter must raise, never return silently-partial
    labels."""
    import pytest

    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    n = 6
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, nodes, max_iter=1)
