"""Visualization sink (SURVEY.md §2.1 S9) — dependency-free SVG.

The reference renders PNG diagnostics with matplotlib (feature curves in
`04_feature_extraction_experiment/feature_extraction.py` and DTW path plots
in `05_dtw_alignment_experiment/dtw_alignment.py`). matplotlib isn't part of
this engine's runtime, and a plotting library has no business on a 1000-
executor cluster anyway — so the sink splits the work the Spark way:

- the AGGREGATION is distributed (histogram = one keyed agg via
  ``stats.histogram_counts``; curves are event-time downsampled with a
  modulo filter on a row-number window), so only O(bins) / O(max_points)
  rows ever reach the driver;
- the RENDER is a tiny driver-side SVG writer (plain XML text, no deps).

Outputs open in any browser, diff cleanly in git, and stay a few KB
regardless of input scale.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators.stats import histogram_counts

__all__ = ["render_histogram_svg", "render_line_svg"]

_W, _H, _PAD = 640, 360, 40


def _svg_doc(body: str, title: str) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" role="img">\n'
        f"<title>{html.escape(title)}</title>\n"
        f'<rect width="{_W}" height="{_H}" fill="white"/>\n'
        f"{body}\n</svg>\n"
    )


def _axes(label: str) -> str:
    x0, y0, x1, y1 = _PAD, _H - _PAD, _W - _PAD, _PAD
    return (
        f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="black"/>\n'
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="black"/>\n'
        f'<text x="{_W // 2}" y="{_H - 8}" text-anchor="middle" '
        f'font-size="12">{html.escape(label)}</text>'
    )


def _write(path: str, doc: str) -> str:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path


def render_histogram_svg(
    df: DataFrame,
    col: str,
    path: str,
    lo: float,
    hi: float,
    nbins: int = 40,
    title: str | None = None,
) -> str:
    """Distributed histogram → single small SVG bar chart at ``path``.
    Exactly ``nbins`` rows are collected, never the data."""
    rows = histogram_counts(df, col, lo, hi, nbins).collect()
    counts = {r["bucket"]: r["n"] for r in rows}
    peak = max(counts.values(), default=1)
    plot_w, plot_h = _W - 2 * _PAD, _H - 2 * _PAD
    bar_w = plot_w / nbins
    bars = []
    for b in range(nbins):
        n = counts.get(b, 0)
        h = 0 if peak == 0 else plot_h * n / peak
        x = _PAD + b * bar_w
        y = _H - _PAD - h
        bars.append(
            f'<rect x="{x:.2f}" y="{y:.2f}" width="{bar_w * 0.9:.2f}" '
            f'height="{h:.2f}" fill="steelblue">'
            f"<desc>bucket={b} n={n}</desc></rect>"
        )
    t = title or f"histogram of {col} [{lo}, {hi})"
    body = _axes(t) + "\n" + "\n".join(bars)
    return _write(path, _svg_doc(body, t))


def render_line_svg(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    max_points: int = 2000,
    title: str | None = None,
) -> str:
    """Distributed downsample → single small SVG polyline at ``path``.

    The x-range is grid-bucketed into ≤ ``max_points`` cells and each cell
    collapses to (min x, mean y) with one keyed agg — no global-order window
    (that would be a single task), no bound on input size, ≤ ``max_points``
    rows collected. NULL and NaN x/y rows are dropped (engine NaN→NULL
    policy — a NaN y would poison its cell's avg() into a malformed
    'nan,nan' polyline coordinate; a NaN x would corrupt the min/max
    range, matching the histogram_counts fix)."""
    x = F.col(x_col)
    if dict(df.dtypes).get(x_col, "").startswith("timestamp"):
        x = F.unix_micros(x.cast("timestamp")).cast("double")
    xd = x.cast("double")
    yd = F.col(y_col).cast("double")
    clean = df.where(
        xd.isNotNull() & ~F.isnan(xd) & yd.isNotNull() & ~F.isnan(yd)
    ).select(xd.alias("x"), yd.alias("y"))
    rng = clean.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    total = rng["n"]
    t = title or f"{y_col} over {x_col} ({total} rows, {max_points} cells)"
    if not total:
        return _write(path, _svg_doc(_axes(t), t))
    span = (rng["hi"] - rng["lo"]) or 1.0
    cell = F.least(
        F.floor((F.col("x") - F.lit(rng["lo"])) / F.lit(span) * max_points),
        F.lit(max_points - 1),
    ).cast("int")
    pts = (
        clean.groupBy(cell.alias("_cell"))
        .agg(F.min("x").alias("x"), F.avg("y").alias("y"))
        .orderBy("x")
        .collect()
    )
    xs = [r["x"] for r in pts]
    ys = [r["y"] for r in pts]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = min(ys), max(ys)
    x_span = (x_hi - x_lo) or 1.0
    y_span = (y_hi - y_lo) or 1.0
    plot_w, plot_h = _W - 2 * _PAD, _H - 2 * _PAD
    coords = " ".join(
        f"{_PAD + plot_w * (x - x_lo) / x_span:.2f},"
        f"{_H - _PAD - plot_h * (y - y_lo) / y_span:.2f}"
        for x, y in zip(xs, ys)
    )
    body = (
        _axes(t)
        + f'\n<polyline points="{coords}" fill="none" stroke="steelblue" '
        f'stroke-width="1.5"/>'
    )
    return _write(path, _svg_doc(body, t))
