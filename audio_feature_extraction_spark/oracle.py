"""Single-process numpy/pandas oracle for the flagship feature pipeline.

This module *defines* the semantics the Spark engine must reproduce
(`np.allclose` per entity×timestamp, bit-identical int32 ``tokens``, zero
temporal leakage). It mirrors the reference pipeline's dataflow:

- LOCF backfill of missing ``value``  (NaN-F0 analog,
  `audio_feature_extraction_toolkit/core/feature_extractor.py:97-107`;
  leading-NaN→0 analog of `04_feature_extraction_experiment/
  feature_extraction.py:125` nan_to_num)
- lag-1 delta  (np.diff analog, `04_…/feature_extractor.py:293`)
- width-9 regression delta, **trailing/causal** variant (librosa-delta analog,
  `core/feature_extractor.py:137-138`; made causal because the north rule
  requires zero temporal leakage — the centered variant exists in
  ``operators.windows.delta_centered`` and is excluded from this vector)
- trailing rolling mean / population std over 5 rows (local-stability analog,
  `04_…/feature_extractor.py:450-452`)
- gap-based sessionization, 30 s threshold (VAD segment merge analog,
  `04_…/process_audio.py:118-131`)
- running token total (np.cumsum analog, `05_…/dtw_alignment.py:151`)
- backward as-of match against reference_events within 300 s tolerance
  (DTW alignment analog, `dtw_alignment.py:789-849`; tolerance analog of
  max_time_difference, `dtw_alignment.py:44`)

Row order within a doc: (ts, seq) — seq breaks duplicate-timestamp ties.

feature_vector layout (10 doubles):
  [v_filled, delta1, delta9, roll_mean, roll_std,
   session_id, n_tok, cum_tokens, ref0, asof_lag_sec]
unmatched as-of → ref0 = 0.0, asof_lag_sec = -1.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GAP_SEC = 30.0
ASOF_TOL_SEC = 300.0
ROLL_WINDOW = 5
DELTA_HALF = 4  # width-9 regression; denominator 2*sum(k^2)=60

FEATURE_NAMES = [
    "v_filled",
    "delta1",
    "delta9",
    "roll_mean",
    "roll_std",
    "session_id",
    "n_tok",
    "cum_tokens",
    "ref0",
    "asof_lag_sec",
]


def locf(x: np.ndarray) -> np.ndarray:
    """Last-observation-carried-forward; leading NaNs → 0.0."""
    out = x.astype(np.float64).copy()
    last = 0.0
    seen = False
    for i in range(len(out)):
        if np.isnan(out[i]):
            out[i] = last if seen else 0.0
        else:
            last = out[i]
            seen = True
    return out


def delta_trailing9(x: np.ndarray) -> np.ndarray:
    """Causal width-9 regression delta: the centered librosa delta evaluated
    at t-4, using only rows ≤ t; start-of-sequence edge replicated."""
    n = len(x)
    xp = np.concatenate([np.full(2 * DELTA_HALF, x[0] if n else 0.0), x])
    d = np.zeros(n)
    for m in range(1, DELTA_HALF + 1):
        # x[t-4+m] - x[t-4-m], t indexes into xp at offset +8
        d += m * (xp[2 * DELTA_HALF - DELTA_HALF + m : 2 * DELTA_HALF - DELTA_HALF + m + n] - xp[2 * DELTA_HALF - DELTA_HALF - m : 2 * DELTA_HALF - DELTA_HALF - m + n])
    return d / 60.0


def session_ids(ts_us: np.ndarray, gap_sec: float = GAP_SEC) -> np.ndarray:
    gaps = np.diff(ts_us) / 1e6
    new = np.concatenate([[0], (gaps > gap_sec).astype(np.int64)])
    return np.cumsum(new)


def _roll_stats(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(x)
    mean = np.empty(n)
    std = np.empty(n)
    for i in range(n):
        lo = max(0, i - w + 1)
        win = x[lo : i + 1]
        m = win.mean()
        mean[i] = m
        std[i] = np.sqrt(((win - m) ** 2).mean())
    return mean, std


def oracle_features(seq_pdf: pd.DataFrame, ref_pdf: pd.DataFrame) -> pd.DataFrame:
    """Golden output: (doc_id, seq, ts, session_id, feature_vector, tokens)."""
    out_parts = []
    ref_by_key: dict[tuple[str, str], pd.DataFrame] = {}
    if len(ref_pdf):
        for key, g in ref_pdf.groupby(["source", "doc_id"], sort=False):
            ref_by_key[key] = g.sort_values("ts").reset_index(drop=True)

    for (doc_id,), g in seq_pdf.groupby(["doc_id"], sort=True):
        g = g.sort_values(["ts", "seq"], kind="mergesort").reset_index(drop=True)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = locf(g["value"].to_numpy())
        d1 = np.concatenate([[0.0], np.diff(v)]) if len(v) else v
        d9 = delta_trailing9(v)
        sid = session_ids(ts_us)
        rmean, rstd = _roll_stats(v, ROLL_WINDOW)
        cumtok = np.cumsum(g["n_tok"].to_numpy().astype(np.int64))

        source = g["source"].iloc[0]
        ref0 = np.zeros(len(g))
        lag_s = np.full(len(g), -1.0)
        rg = ref_by_key.get((source, doc_id))
        if rg is not None and len(rg):
            r_us = rg["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            idx = np.searchsorted(r_us, ts_us, side="right") - 1
            for i, j in enumerate(idx):
                if j >= 0:
                    lag = (ts_us[i] - r_us[j]) / 1e6
                    if lag <= ASOF_TOL_SEC:
                        ref0[i] = rg["ref_vec"].iloc[j][0]
                        lag_s[i] = lag

        fv = [
            np.array(
                [
                    v[i],
                    d1[i],
                    d9[i],
                    rmean[i],
                    rstd[i],
                    float(sid[i]),
                    float(g["n_tok"].iloc[i]),
                    float(cumtok[i]),
                    ref0[i],
                    lag_s[i],
                ]
            )
            for i in range(len(g))
        ]
        out_parts.append(
            pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "seq": g["seq"].to_numpy(),
                    "ts": g["ts"].to_numpy(),
                    "session_id": sid,
                    "feature_vector": fv,
                    "tokens": g["tokens"].to_list(),
                }
            )
        )
    return pd.concat(out_parts, ignore_index=True)
