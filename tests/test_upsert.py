"""MERGE/upsert + equality-delete + CDC diff on the checkpoint table
(Iceberg-v2 merge-on-read semantics over the plain-Parquet emulation —
see sources/checkpoint.py module docstring)."""

import pandas as pd
import pytest

from audio_feature_extraction_spark.sources.checkpoint import CheckpointTable


@pytest.fixture()
def tbl(tmp_path):
    return CheckpointTable(str(tmp_path / "utbl"))


def _pdf(rows):
    return pd.DataFrame(rows, columns=["k", "v"])


def _mk(spark, rows):
    return spark.createDataFrame(_pdf(rows))


def _cur(tbl, spark, as_of=None):
    return (
        tbl.read_current(spark, ["k"], as_of_snapshot=as_of)
        .select("k", "v")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def test_upsert_latest_wins_and_insert(spark, tbl):
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20), ("d", 4)]), ["k"])  # update b, insert d
    got = _cur(tbl, spark)
    want = _pdf([("a", 1), ("b", 20), ("c", 3), ("d", 4)])
    pd.testing.assert_frame_equal(got, want)


def test_time_travel_sees_pre_upsert_state(spark, tbl):
    s0 = tbl.upsert(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20)]), ["k"])
    got = _cur(tbl, spark, as_of=s0)
    pd.testing.assert_frame_equal(got, _pdf([("a", 1), ("b", 2)]))


def test_equality_delete_tombstone(spark, tbl):
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"])
    sd = tbl.delete(_mk(spark, [("b", 0)]), ["k"])
    got = _cur(tbl, spark)
    pd.testing.assert_frame_equal(got, _pdf([("a", 1), ("c", 3)]))
    # history before the delete still travels
    pre = _cur(tbl, spark, as_of=sd - 1)
    pd.testing.assert_frame_equal(pre, _pdf([("a", 1), ("b", 2), ("c", 3)]))
    # re-inserting after a delete resurrects the key
    tbl.upsert(_mk(spark, [("b", 99)]), ["k"])
    back = _cur(tbl, spark)
    pd.testing.assert_frame_equal(
        back, _pdf([("a", 1), ("b", 99), ("c", 3)])
    )


def test_plain_append_snapshots_read_as_upserts(spark, tbl):
    # a table that started life append-only (no _op column) upgrades in place
    tbl.write_snapshot(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    tbl.upsert(_mk(spark, [("a", 10)]), ["k"])
    got = _cur(tbl, spark)
    pd.testing.assert_frame_equal(got, _pdf([("a", 10), ("b", 2)]))


def test_diff_classifies_insert_update_delete(spark, tbl):
    s0 = tbl.upsert(_mk(spark, [("a", 1), ("b", 2), ("c", 3), ("e", 5)]),
                    ["k"])
    tbl.upsert(_mk(spark, [("b", 20), ("d", 4), ("e", 5)]), ["k"])
    s2 = tbl.delete(_mk(spark, [("c", 0)]), ["k"])
    d = (
        tbl.diff(spark, ["k"], s0, s2)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # e rewritten with IDENTICAL payload -> not reported; a untouched
    want = pd.DataFrame(
        {"k": ["b", "c", "d"], "change": ["U", "D", "I"]}
    )
    pd.testing.assert_frame_equal(d, want)


def test_diff_from_empty_is_all_inserts(spark, tbl):
    s0 = tbl.upsert(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    d = tbl.diff(spark, ["k"], None, s0).toPandas()
    assert sorted(d.k) == ["a", "b"]
    assert (d.change == "I").all()


def test_read_current_plan_single_exchange(spark, tbl):
    """The latest-wins view is one hash exchange + map-side
    WindowGroupLimit — no join, no second shuffle."""
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20)]), ["k"])
    plan = (
        tbl.read_current(spark, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_compact_preserves_current_view_and_prunes(spark, tbl):
    import os

    tbl.upsert(_mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20), ("d", 4)]), ["k"])
    tbl.delete(_mk(spark, [("c", 0)]), ["k"])
    before = _cur(tbl, spark)
    base = tbl.compact(spark, ["k"])
    assert tbl.base_snapshot() == base
    after = _cur(tbl, spark)
    pd.testing.assert_frame_equal(before, after)
    # pre-base time travel still works before expiry
    pre = _cur(tbl, spark, as_of=0)
    pd.testing.assert_frame_equal(pre, _pdf([("a", 1), ("b", 2), ("c", 3)]))
    # expiry reclaims the old dirs; current view unchanged
    dropped = tbl.expire_snapshots()
    assert dropped == [0, 1, 2]
    assert tbl.committed_snapshots() == [base]
    pd.testing.assert_frame_equal(_cur(tbl, spark), before)
    assert not os.path.isdir(tbl._snap_path(tbl.data_dir, 0))


def test_compact_crash_before_marker_is_harmless(spark, tbl, monkeypatch):
    """A crash between the compaction snapshot commit and the base-marker
    write must leave a fully correct table (redundant snapshot only)."""
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20)]), ["k"])
    before = _cur(tbl, spark)

    import os

    real_replace = os.replace

    def boom(src, dst):
        raise RuntimeError("crash before marker")

    monkeypatch.setattr(os, "replace", boom)
    try:
        tbl.compact(spark, ["k"])
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)
    assert tbl.base_snapshot() is None  # marker never landed
    pd.testing.assert_frame_equal(_cur(tbl, spark), before)
    # a retried compaction completes normally
    base = tbl.compact(spark, ["k"])
    assert tbl.base_snapshot() == base
    pd.testing.assert_frame_equal(_cur(tbl, spark), before)


def test_upsert_after_compact_wins_over_base(spark, tbl):
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2)]), ["k"])
    tbl.compact(spark, ["k"])
    tbl.expire_snapshots()
    tbl.upsert(_mk(spark, [("a", 10)]), ["k"])
    got = _cur(tbl, spark)
    pd.testing.assert_frame_equal(got, _pdf([("a", 10), ("b", 2)]))


def test_table_stats_reports_files_rows_and_shrinks_after_compaction(
    spark, tbl
):
    tbl.upsert(_mk(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"])
    tbl.upsert(_mk(spark, [("b", 20)]), ["k"])
    stats = tbl.table_stats(spark).toPandas()
    assert stats.snapshot_id.tolist() == [0, 1]
    assert stats.rows.tolist() == [3, 1]
    assert (stats.n_files > 0).all() and (stats.bytes > 0).all()
    tbl.compact(spark, ["k"])
    tbl.expire_snapshots()
    after = tbl.table_stats(spark).toPandas()
    assert len(after) == 1
    assert after.rows[0] == 3  # the full current view, one snapshot


def test_remaining_watermark_prune_skips_old_snapshots(spark, tmp_path):
    """remaining(input_min_ts=...) must anti-join against ONLY the
    snapshots whose manifest watermark reaches the input's time range —
    proven by a key that lives in an old (pruned) snapshot surviving the
    resume filter, while keys in kept snapshots still dedupe."""
    from audio_feature_extraction_spark.sources.checkpoint import (
        CheckpointTable,
    )

    t = CheckpointTable(str(tmp_path / "wm_tbl"))

    def day(d, keys):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": keys,
                    "ts": pd.Timestamp(f"2024-01-{d:02d} 12:00:00"),
                    "v": 1.0,
                }
            )
        )

    t.write_snapshot(day(1, ["a", "b"]), ["k"], watermark_col="ts")
    t.write_snapshot(day(10, ["c", "d"]), ["k"], watermark_col="ts")

    inp = day(11, ["a", "c", "e"])  # a: only in the day-1 snapshot

    # no prune hint: fully correct — both a and c dedupe
    full = sorted(t.remaining(inp, ["k"]).toPandas().k)
    assert full == ["e"]

    # prune at 2024-01-05: the day-1 snapshot (watermark 01-01) is
    # skipped entirely, so 'a' survives — evidence the old files were
    # never consulted; 'c' (kept snapshot) still dedupes
    pruned = sorted(
        t.remaining(inp, ["k"], input_min_ts="2024-01-05")
        .toPandas().k
    )
    assert pruned == ["a", "e"]

    # prune threshold below every watermark: identical to the full path
    all_kept = sorted(
        t.remaining(inp, ["k"], input_min_ts="2023-12-01")
        .toPandas().k
    )
    assert all_kept == ["e"]

    # threshold above every watermark: nothing to join, input unchanged
    none_kept = sorted(
        t.remaining(inp, ["k"], input_min_ts="2025-01-01")
        .toPandas().k
    )
    assert none_kept == ["a", "c", "e"]


def test_remaining_watermark_accepts_T_separated_iso(spark, tmp_path):
    """ADVICE r04: stored watermarks are space-separated (Spark's timestamp
    cast); a 'T'-separated input_min_ts must compare by TIME, not by
    separator byte ('T' > ' ' would wrongly prune a same-day snapshot whose
    watermark time-of-day is later than the input's)."""
    from audio_feature_extraction_spark.sources.checkpoint import (
        CheckpointTable,
    )

    t = CheckpointTable(str(tmp_path / "wmT_tbl"))
    t.write_snapshot(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": ["a", "b"],
                    "ts": pd.Timestamp("2024-01-01 12:00:00"),
                    "v": 1.0,
                }
            )
        ),
        ["k"], watermark_col="ts",
    )
    inp = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "e"],
                "ts": pd.Timestamp("2024-01-01 06:30:00"),
                "v": 1.0,
            }
        )
    )
    # wm 12:00 >= input 06:00 -> the snapshot MUST be consulted; the raw
    # byte compare ('2024-01-01 12..' < '2024-01-01T06..') would skip it
    # and let the committed key 'a' back into the resume set
    got = sorted(
        t.remaining(inp, ["k"], input_min_ts="2024-01-01T06:00:00")
        .toPandas().k
    )
    assert got == ["e"]
    # space-separated form: identical behavior
    got2 = sorted(
        t.remaining(inp, ["k"], input_min_ts="2024-01-01 06:00:00")
        .toPandas().k
    )
    assert got2 == ["e"]
