"""SVG viz sink (S9): well-formed XML, bounded output, correct bar scaling."""

import math
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from audio_feature_extraction_spark.sources.viz import (
    render_histogram_svg,
    render_line_svg,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


def test_histogram_svg(spark, tmp_path):
    df = spark.range(1000).select((F.col("id") % 10).cast("double").alias("v"))
    out = render_histogram_svg(
        df, "v", str(tmp_path / "h.svg"), lo=0.0, hi=10.0, nbins=10
    )
    root = ET.parse(out).getroot()
    bars = [
        r
        for r in root.iter(f"{SVG_NS}rect")
        if r.get("fill") == "steelblue"
    ]
    assert len(bars) == 10
    # uniform data → all bars equal height = full plot height
    heights = {float(b.get("height")) for b in bars}
    assert len(heights) == 1 and heights.pop() > 0


def test_histogram_svg_clamps(spark, tmp_path):
    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,)], "v double")
    out = render_histogram_svg(
        df, "v", str(tmp_path / "c.svg"), lo=0.0, hi=1.0, nbins=4
    )
    descs = [d.text for d in ET.parse(out).getroot().iter(f"{SVG_NS}desc")]
    assert "bucket=0 n=1" in descs  # -5 clamps up into bucket 0
    assert "bucket=2 n=1" in descs  # 0.5 / width 0.25 → bucket 2
    assert "bucket=3 n=1" in descs  # 99 clamps down into the last bucket


def test_line_svg_bounded_points(spark, tmp_path):
    df = spark.range(50_000).select(
        F.col("id").cast("double").alias("x"),
        F.sin(F.col("id") / 1000.0).alias("y"),
    )
    out = render_line_svg(
        df, "x", "y", str(tmp_path / "l.svg"), max_points=100
    )
    root = ET.parse(out).getroot()
    poly = next(root.iter(f"{SVG_NS}polyline"))
    pts = poly.get("points").split()
    assert 0 < len(pts) <= 100
    # x coords must be sorted (orderBy before render)
    xs = [float(p.split(",")[0]) for p in pts]
    assert xs == sorted(xs)
    for p in pts:
        x, y = map(float, p.split(","))
        assert math.isfinite(x) and math.isfinite(y)


def test_line_svg_timestamp_axis(spark, tmp_path):
    df = spark.sql(
        "SELECT timestampadd(MINUTE, id, TIMESTAMP'2024-01-01') AS ts, "
        "CAST(id AS DOUBLE) AS y FROM range(100)"
    )
    out = render_line_svg(df, "ts", "y", str(tmp_path / "t.svg"), max_points=50)
    root = ET.parse(out).getroot()
    assert next(root.iter(f"{SVG_NS}polyline"), None) is not None


def test_line_svg_empty_input(spark, tmp_path):
    df = spark.createDataFrame([], "x double, y double")
    out = render_line_svg(df, "x", "y", str(tmp_path / "e.svg"))
    root = ET.parse(out).getroot()  # well-formed, no polyline
    assert next(root.iter(f"{SVG_NS}polyline"), None) is None
