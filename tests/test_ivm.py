"""Incremental view maintenance == recompute-from-scratch across a chain
of upserts/deletes (operators/ivm.py + CheckpointTable.diff_rows)."""

import numpy as np
import pandas as pd
import pytest

from audio_feature_extraction_spark.operators.ivm import (
    drift_report,
    group_agg,
    incremental_group_agg,
    rebaseline,
)
from audio_feature_extraction_spark.sources.checkpoint import CheckpointTable


@pytest.fixture()
def tbl(tmp_path):
    return CheckpointTable(str(tmp_path / "ivm_tbl"))


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "src", "val"])
    )


def _norm(pdf):
    return pdf.sort_values("g").reset_index(drop=True)


def test_ivm_matches_recompute_over_random_mutation_chain(spark, tbl):
    rng = np.random.default_rng(21)
    srcs = ["web", "book", "code"]

    def rand_rows(keys):
        return [
            (int(k), srcs[int(rng.integers(0, 3))],
             float(np.round(rng.normal(10, 5), 3)))
            for k in keys
        ]

    s0 = tbl.upsert(_mk(spark, rand_rows(range(40))), ["k"])
    view = group_agg(tbl.read_current(spark, ["k"], s0), "src", "val")
    prev = s0
    for step in range(4):
        # mutate: update a random subset, insert fresh keys, delete some
        upd = rand_rows(rng.choice(40, size=8, replace=False))
        ins = rand_rows(range(100 + step * 10, 100 + step * 10 + 5))
        tbl.upsert(_mk(spark, upd + ins), ["k"])
        dels = [(int(k), "", 0.0)
                for k in rng.choice(40, size=3, replace=False)]
        cur = tbl.delete(_mk(spark, dels), ["k"])

        cdc = tbl.diff_rows(spark, ["k"], prev, cur)
        view = incremental_group_agg(view, cdc, "src", "val")

        want = _norm(
            group_agg(tbl.read_current(spark, ["k"], cur), "src", "val")
            .toPandas()
        )
        got = _norm(view.toPandas())
        pd.testing.assert_frame_equal(
            got, want, check_exact=False, rtol=1e-12
        )
        prev = cur


def test_ivm_group_migration_and_group_death(spark, tbl):
    s0 = tbl.upsert(
        _mk(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 30.0)]), ["k"]
    )
    view = group_agg(tbl.read_current(spark, ["k"], s0), "src", "val")
    # move key 3 from group b to group a -> group b must DISAPPEAR
    s1 = tbl.upsert(_mk(spark, [(3, "a", 30.0)]), ["k"])
    cdc = tbl.diff_rows(spark, ["k"], s0, s1)
    view = incremental_group_agg(view, cdc, "src", "val")
    got = _norm(view.toPandas())
    assert got.g.tolist() == ["a"]
    assert got.n.tolist() == [3]
    assert abs(got.s[0] - 33.0) < 1e-12


def test_ivm_float_drift_detected_and_rebaselined(spark, tbl):
    """VERDICT r04 #4: adversarial magnitudes across rounds — inserting
    then deleting a 1e16 value cancels exactly in math but not in doubles
    (the small addends round away), so the maintained ``s`` drifts from a
    recompute. drift_report must flag EXACTLY the drifted group (counts
    stay exact), and rebaseline must clear it."""
    s = tbl.upsert(
        _mk(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 5.0)]), ["k"]
    )
    view = group_agg(tbl.read_current(spark, ["k"], s), "src", "val")
    prev = s
    for _ in range(3):  # many maintenance rounds, drift accumulates/persists
        s1 = tbl.upsert(_mk(spark, [(99, "a", 1e16)]), ["k"])
        view = incremental_group_agg(
            view, tbl.diff_rows(spark, ["k"], prev, s1), "src", "val"
        )
        s2 = tbl.delete(_mk(spark, [(99, "", 0.0)]), ["k"])
        view = incremental_group_agg(
            view, tbl.diff_rows(spark, ["k"], s1, s2), "src", "val"
        )
        prev = s2

    truth = group_agg(tbl.read_current(spark, ["k"], prev), "src", "val")
    rep = _norm(drift_report(view, truth).toPandas())
    assert rep.g.tolist() == ["a"]          # only the poisoned group drifts
    assert (rep.n_view == rep.n_true).all()  # counts are exact longs
    assert (rep.s_abs_err > 0.5).all()       # the 1e16 round-trip lost ~1.0

    fresh = rebaseline(tbl.read_current(spark, ["k"], prev), "src", "val")
    assert drift_report(fresh, truth).count() == 0


def test_ivm_identical_rewrite_is_noop(spark, tbl):
    s0 = tbl.upsert(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), ["k"])
    view = group_agg(tbl.read_current(spark, ["k"], s0), "src", "val")
    s1 = tbl.upsert(_mk(spark, [(1, "a", 1.0)]), ["k"])  # same values
    cdc = tbl.diff_rows(spark, ["k"], s0, s1)
    assert cdc.count() == 0  # fingerprint-equal -> no CDC row
    view = incremental_group_agg(view, cdc, "src", "val")
    want = _norm(
        group_agg(tbl.read_current(spark, ["k"], s1), "src", "val")
        .toPandas()
    )
    pd.testing.assert_frame_equal(_norm(view.toPandas()), want)


def test_ivm_max_dirty_flag_and_selective_repair(spark, tbl):
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
        repair_dirty_max,
    )

    s0 = tbl.upsert(
        _mk(
            spark,
            [
                (1, "a", 5.0), (2, "a", 9.0), (3, "a", 9.0),  # duplicated max
                (4, "b", 7.0), (5, "b", 3.0),
                (6, "c", 2.0),
            ],
        ),
        ["k"],
    )
    view = group_max(tbl.read_current(spark, ["k"], s0), "src", "val")

    # delete one copy of a's duplicated max AND b's non-max row
    s1 = tbl.delete(_mk(spark, [(2, "", 0.0), (5, "", 0.0)]), ["k"])
    view = incremental_group_max(
        view, tbl.diff_rows(spark, ["k"], s0, s1), "src", "val"
    )
    pdf = _norm(view.toPandas()).set_index("g")
    # a: retraction tied the max -> dirty, mx stays the 9.0 upper bound
    assert bool(pdf.loc["a", "dirty"]) and pdf.loc["a", "mx"] == 9.0
    # b: retraction was below the max -> exact, no flag
    assert not bool(pdf.loc["b", "dirty"]) and pdf.loc["b", "mx"] == 7.0
    assert not bool(pdf.loc["c", "dirty"])
    assert pdf.n.tolist() == [2, 1, 1]

    # repair rescans ONLY group a; result == recompute
    repaired = repair_dirty_max(
        view, tbl.read_current(spark, ["k"], s1), "src", "val"
    )
    want = _norm(
        group_max(tbl.read_current(spark, ["k"], s1), "src", "val").toPandas()
    )
    pd.testing.assert_frame_equal(_norm(repaired.toPandas()), want)
    # group a is still exact: its OTHER 9.0 survives
    assert want.set_index("g").loc["a", "mx"] == 9.0


def test_ivm_max_insert_dominates_and_cleans(spark, tbl):
    """A retraction of the max plus a concurrent bigger insert stays
    EXACT (the insert dominates), and a later dominating insert cleans a
    previously-dirty group without any rescan."""
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
    )

    s0 = tbl.upsert(_mk(spark, [(1, "a", 5.0), (2, "a", 3.0)]), ["k"])
    view = group_max(tbl.read_current(spark, ["k"], s0), "src", "val")
    # same round: delete the max (5.0) and insert 8.0 -> exact, clean
    tbl.delete(_mk(spark, [(1, "", 0.0)]), ["k"])
    s1 = tbl.upsert(_mk(spark, [(9, "a", 8.0)]), ["k"])
    view = incremental_group_max(
        view, tbl.diff_rows(spark, ["k"], s0, s1), "src", "val"
    )
    pdf = _norm(view.toPandas()).set_index("g")
    assert not bool(pdf.loc["a", "dirty"]) and pdf.loc["a", "mx"] == 8.0

    # now delete THE max (8.0) -> dirty upper bound 8.0
    s2 = tbl.delete(_mk(spark, [(9, "", 0.0)]), ["k"])
    view = incremental_group_max(
        view, tbl.diff_rows(spark, ["k"], s1, s2), "src", "val"
    )
    pdf = _norm(view.toPandas()).set_index("g")
    assert bool(pdf.loc["a", "dirty"]) and pdf.loc["a", "mx"] == 8.0
    # a dominating insert cleans it without repair
    s3 = tbl.upsert(_mk(spark, [(10, "a", 11.0)]), ["k"])
    view = incremental_group_max(
        view, tbl.diff_rows(spark, ["k"], s2, s3), "src", "val"
    )
    pdf = _norm(view.toPandas()).set_index("g")
    assert not bool(pdf.loc["a", "dirty"]) and pdf.loc["a", "mx"] == 11.0


def test_ivm_max_matches_recompute_over_random_chain(spark, tbl):
    """Across a random mutation chain, repair_dirty_max(view) == full
    recompute after EVERY round, and clean groups were already exact
    before the repair."""
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
        repair_dirty_max,
    )

    rng = np.random.default_rng(77)
    srcs = ["web", "book", "code"]

    def rand_rows(keys):
        return [
            (int(k), srcs[int(rng.integers(0, 3))],
             float(np.round(rng.normal(10, 5), 3)))
            for k in keys
        ]

    s = tbl.upsert(_mk(spark, rand_rows(range(30))), ["k"])
    view = group_max(tbl.read_current(spark, ["k"], s), "src", "val")
    prev = s
    for step in range(4):
        upd = rand_rows(rng.choice(30, size=6, replace=False))
        ins = rand_rows(range(200 + step * 10, 200 + step * 10 + 4))
        tbl.upsert(_mk(spark, upd + ins), ["k"])
        dels = [(int(k), "", 0.0)
                for k in rng.choice(30, size=3, replace=False)]
        cur = tbl.delete(_mk(spark, dels), ["k"])
        view = incremental_group_max(
            view, tbl.diff_rows(spark, ["k"], prev, cur), "src", "val"
        )
        base = tbl.read_current(spark, ["k"], cur)
        want = _norm(group_max(base, "src", "val").toPandas())
        got_pre = _norm(view.toPandas())
        # clean rows must ALREADY equal the recompute
        clean = got_pre[~got_pre.dirty].set_index("g")
        w = want.set_index("g")
        for g in clean.index:
            assert clean.loc[g, "mx"] == w.loc[g, "mx"], (step, g)
            assert clean.loc[g, "n"] == w.loc[g, "n"], (step, g)
        # dirty rows carry a valid upper bound
        for g in got_pre[got_pre.dirty].g:
            assert got_pre.set_index("g").loc[g, "mx"] >= w.loc[g, "mx"]
        view = repair_dirty_max(view, base, "src", "val")
        pd.testing.assert_frame_equal(_norm(view.toPandas()), want)
        prev = cur


def test_ivm_max_repair_is_noop_when_clean(spark, tbl):
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
        repair_dirty_max,
    )

    s0 = tbl.upsert(_mk(spark, [(1, "a", 5.0), (2, "b", 7.0)]), ["k"])
    view = group_max(tbl.read_current(spark, ["k"], s0), "src", "val")
    s1 = tbl.upsert(_mk(spark, [(3, "a", 6.0)]), ["k"])  # insert only
    view = incremental_group_max(
        view, tbl.diff_rows(spark, ["k"], s0, s1), "src", "val"
    )
    assert view.where("dirty").count() == 0
    repaired = repair_dirty_max(
        view, tbl.read_current(spark, ["k"], s1), "src", "val"
    )
    pd.testing.assert_frame_equal(
        _norm(repaired.toPandas()), _norm(view.toPandas())
    )


def _log_cdc(spark, rows):
    """Raw log-style CDC frame (change, _old, _new) — NOT snapshot-diff:
    a batch may insert a value and retract that same value, which
    diff_rows (snapshot semantics) can never emit."""
    schema = (
        "change string, "
        "_old struct<src:string,val:double>, "
        "_new struct<src:string,val:double>"
    )
    return spark.createDataFrame(rows, schema)


def test_ivm_max_log_cdc_insert_then_retract_same_value_flags_dirty(spark):
    """ADVICE r05 (medium): a log-CDC batch that inserts a value ABOVE the
    old max and retracts that same value in the same batch must NOT mark
    the inserted value as a clean max — the value no longer exists."""
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
        repair_dirty_max,
    )

    base = spark.createDataFrame(
        pd.DataFrame([(1, "a", 5.0), (2, "a", 3.0)], columns=["k", "src", "val"])
    )
    view = group_max(base, "src", "val")
    cdc = _log_cdc(
        spark,
        [
            ("I", None, ("a", 10.0)),
            ("D", ("a", 10.0), None),
        ],
    )
    view = incremental_group_max(view, cdc, "src", "val")
    pdf = _norm(view.toPandas()).set_index("g")
    # 10.0 was inserted AND retracted: mx=10.0 is only an upper bound and
    # the group MUST be dirty (true max is still 5.0; repair recovers it)
    assert bool(pdf.loc["a", "dirty"])
    assert pdf.loc["a", "mx"] == 10.0
    assert pdf.loc["a", "n"] == 2
    repaired = repair_dirty_max(view, base, "src", "val")
    rp = _norm(repaired.toPandas()).set_index("g")
    assert rp.loc["a", "mx"] == 5.0 and not bool(rp.loc["a", "dirty"])


def test_ivm_max_log_cdc_surviving_dominating_insert_stays_clean(spark):
    """The strict add_max > ret_max rule keeps the EXACT fast path: when
    the batch's dominating insert is strictly above everything it
    retracts, the insert survives and the group stays clean."""
    from audio_feature_extraction_spark.operators.ivm import (
        group_max,
        incremental_group_max,
    )

    base = spark.createDataFrame(
        pd.DataFrame([(1, "a", 5.0)], columns=["k", "src", "val"])
    )
    view = group_max(base, "src", "val")
    # insert 7 and 10 in the same batch, retract the 7 again (log-CDC):
    # the 10 survives any retraction in the batch -> exact, clean
    cdc = _log_cdc(
        spark,
        [
            ("I", None, ("a", 7.0)),
            ("I", None, ("a", 10.0)),
            ("D", ("a", 7.0), None),
        ],
    )
    view = incremental_group_max(view, cdc, "src", "val")
    pdf = _norm(view.toPandas()).set_index("g")
    assert not bool(pdf.loc["a", "dirty"])
    assert pdf.loc["a", "mx"] == 10.0
    assert pdf.loc["a", "n"] == 2
