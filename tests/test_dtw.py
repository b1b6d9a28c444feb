"""Exact DTW kernel vs a brute-force per-cell DP oracle (SURVEY.md §2.10)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from audio_feature_extraction_spark.operators.dtw import (
    dtw_accumulate,
    dtw_join,
    dtw_pair,
    dtw_path,
)


def brute_force_acc(cost, diag_w=1.0, step_w=1.0, band=None):
    """Per-cell reference DP — the slow, obviously-correct form."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    ratio = n / m
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if band is not None and abs(i - j * ratio) > band:
                continue
            prev = min(
                acc[i - 1, j] * step_w,
                acc[i, j - 1] * step_w,
                acc[i - 1, j - 1] * diag_w,
            )
            acc[i, j] = cost[i - 1, j - 1] + prev
    return acc[1:, 1:]


@pytest.mark.parametrize("shape", [(1, 1), (5, 5), (7, 13), (20, 9)])
@pytest.mark.parametrize("weights", [(1.0, 1.0), (0.8, 1.2)])
@pytest.mark.parametrize("band", [None, 3])
def test_accumulate_matches_brute_force(shape, weights, band):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    cost = rng.uniform(0.1, 5.0, shape)
    dw, sw = weights
    got = dtw_accumulate(cost, dw, sw, band)
    want = brute_force_acc(cost, dw, sw, band)
    mask = np.isfinite(want)
    assert (np.isfinite(got) == mask).all()
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-12)


def test_identical_sequences_zero_distance():
    a = np.random.default_rng(1).normal(size=(12, 3))
    r = dtw_pair(a, a)
    assert r["dtw_dist"] == 0.0
    # all-diagonal path
    assert r["path_len"] == 12


def test_path_is_valid_warping():
    rng = np.random.default_rng(2)
    cost = rng.uniform(0.0, 1.0, (8, 11))
    acc = dtw_accumulate(cost)
    path = dtw_path(acc)
    assert path[0] == (0, 0) and path[-1] == (7, 10)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}  # monotone steps


def test_band_excludes_off_diagonal_cells():
    # the slope-scaled band keeps the ends feasible but blanks the corners
    cost = np.ones((10, 10))
    acc = dtw_accumulate(cost, band=2)
    assert np.isfinite(acc[-1, -1])  # the warping path itself exists
    assert not np.isfinite(acc[0, 9])  # |1 - 10| = 9 > band
    assert not np.isfinite(acc[9, 0])


def test_dtw_join_spark(spark):
    """Distributed cogrouped kernel == local kernel, plus the missing-partner
    case (key on one side only -> NULL distance)."""
    rng = np.random.default_rng(3)
    rows_l, rows_r, want = [], [], {}
    for key, (n, m) in {"a": (9, 9), "b": (6, 14), "c": (5, 0)}.items():
        fa = rng.normal(size=(n, 2))
        fb = rng.normal(size=(m, 2)) if m else np.zeros((0, 2))
        rows_l += [(key, i, float(fa[i, 0]), float(fa[i, 1])) for i in range(n)]
        rows_r += [(key, i, float(fb[i, 0]), float(fb[i, 1])) for i in range(m)]
        if m:
            want[key] = dtw_pair(fa, fb, 0.8, 1.2, band=8)
    schema = "k string, seq int, f0 double, f1 double"
    l = spark.createDataFrame(rows_l, schema).repartition(4)
    r = spark.createDataFrame(rows_r, schema).repartition(3)
    got = (
        dtw_join(
            l, r, on=["k"], order_col="seq", feature_cols=["f0", "f1"],
            diag_weight=0.8, step_weight=1.2, band=8,
        )
        .toPandas()
        .set_index("k")
    )
    assert len(got) == 3
    for key, w in want.items():
        assert got.loc[key, "n"] == w["n"] and got.loc[key, "m"] == w["m"]
        np.testing.assert_allclose(got.loc[key, "dtw_dist"], w["dtw_dist"])
        assert got.loc[key, "path_len"] == w["path_len"]
    assert pd.isna(got.loc["c", "dtw_dist"]) and got.loc["c", "m"] == 0


def test_dtw_path_respects_step_weights():
    """Regression (review-found): the backtrack must compare candidates with
    the SAME weights as the forward recurrence — every step's chosen
    predecessor must achieve the weighted minimum."""
    import numpy as np

    from audio_feature_extraction_spark.operators.dtw import (
        dtw_accumulate,
        dtw_path,
    )

    rng = np.random.default_rng(11)
    dw, sw = 0.8, 1.2
    for _ in range(25):
        cost = rng.random((rng.integers(3, 9), rng.integers(3, 9)))
        acc = dtw_accumulate(cost, diag_weight=dw, step_weight=sw)
        path = dtw_path(acc, diag_weight=dw, step_weight=sw)
        assert path[0] == (0, 0) and path[-1] == (
            acc.shape[0] - 1,
            acc.shape[1] - 1,
        )
        for (pi, pj), (i, j) in zip(path, path[1:]):
            if i == 0 or j == 0 or (pi, pj) == (0, 0):
                continue
            cands = {
                (i - 1, j - 1): acc[i - 1, j - 1] * dw,
                (i - 1, j): acc[i - 1, j] * sw,
                (i, j - 1): acc[i, j - 1] * sw,
            }
            assert cands[(pi, pj)] == min(cands.values()), (path, (i, j))
