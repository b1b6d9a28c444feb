"""Config source (S8): YAML/JSON load, dotted access, env overrides, spark conf."""

from __future__ import annotations

import json

from audio_feature_extraction_spark.sources.config import EngineConfig, load_config

YAML_TEXT = """\
asof:
  tolerance_sec: 172800.0
  direction: backward
sessionize:
  gap_sec: 28800
binpack:
  target_payload_per_bin: 4000000
spark:
  sql:
    shuffle:
      partitions: 64
    ansi:
      enabled: true
"""


def test_yaml_and_json_roundtrip(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(YAML_TEXT)
    cfg = EngineConfig.from_file(str(y), env={})
    assert cfg.get("asof.tolerance_sec") == 172800.0
    assert cfg.get("asof.direction") == "backward"
    assert cfg.get("sessionize.gap_sec") == 28800
    assert cfg.get("missing.key", "dflt") == "dflt"

    j = tmp_path / "c.json"
    j.write_text(json.dumps(cfg.data))
    cfg2 = EngineConfig.from_file(str(j), env={})
    assert cfg2.data == cfg.data
    assert load_config(str(j)) == cfg.data


def test_env_overrides(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(YAML_TEXT)
    cfg = EngineConfig.from_file(
        str(y),
        env={
            "AFE__asof__tolerance_sec": "60.5",
            "AFE__sessionize__gap_sec": "100",
            "AFE__newsec__flag": "true",
            "AFE__newsec__name": "abc",
            "UNRELATED": "x",
        },
    )
    assert cfg.get("asof.tolerance_sec") == 60.5
    assert cfg.get("sessionize.gap_sec") == 100
    assert cfg.get("newsec.flag") is True
    assert cfg.get("newsec.name") == "abc"
    assert cfg.get("asof.direction") == "backward"  # untouched


def test_spark_conf_flatten_and_apply(spark, tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(YAML_TEXT)
    cfg = EngineConfig.from_file(str(y), env={})
    flat = cfg.spark_conf()
    assert flat["spark.sql.shuffle.partitions"] == "64"
    assert flat["spark.sql.ansi.enabled"] == "true"

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        applied = cfg.apply_to_spark(spark)
        assert "spark.sql.shuffle.partitions" in applied
        assert spark.conf.get("spark.sql.shuffle.partitions") == "64"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_env_override_through_scalar(tmp_path):
    """Regression (review-found): an env override descending through an
    existing scalar section must replace it, not crash on int.__setitem__."""
    p = tmp_path / "c.json"
    p.write_text('{"vad": 3}')
    cfg = EngineConfig.from_file(str(p), env={"AFE__vad__aggressiveness": "2"})
    assert cfg.get("vad.aggressiveness") == 2
