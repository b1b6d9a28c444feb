"""Experiment-config source (SURVEY.md §2.1 S8).

The reference drives every run from a nested YAML file
(`04_feature_extraction_experiment/process_audio.py:14-16`,
`config/experiment_config.yaml:1-40`). The Spark-native twin:

- :func:`load_config` reads YAML or JSON into a nested dict (format by
  extension; YAML gated behind an import-try so the engine works without
  pyyaml);
- :class:`EngineConfig` wraps it with dotted-path access
  (``cfg.get("vad.aggressiveness", 3)``) and environment overrides
  (``AFE__vad__aggressiveness=2`` wins over the file — 12-factor style, the
  knob a cluster launcher actually has);
- keys under ``spark/`` are session conf and :meth:`apply_to_spark` sets them
  on an existing SparkSession (runtime-settable ones) — plan parameters stay
  plain values read at plan-build time.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession

ENV_PREFIX = "AFE"


def _parse_scalar(s: str) -> Any:
    """Env values arrive as strings; give them YAML-ish scalar typing."""
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", ""):
        return None
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def load_config(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - baked into this image
            raise RuntimeError(
                "pyyaml not installed; use a .json config or install pyyaml"
            ) from e
        return yaml.safe_load(text) or {}
    return json.loads(text)


class EngineConfig:
    def __init__(self, data: dict | None = None, env: dict[str, str] | None = None):
        self.data = dict(data or {})
        env = os.environ if env is None else env
        for k, v in env.items():
            if k.startswith(ENV_PREFIX + "__"):
                self._set_path(k[len(ENV_PREFIX) + 2 :].split("__"), _parse_scalar(v))

    @classmethod
    def from_file(cls, path: str, env: dict[str, str] | None = None) -> "EngineConfig":
        return cls(load_config(path), env)

    def _set_path(self, parts: list[str], value: Any) -> None:
        d = self.data
        for p in parts[:-1]:
            nxt = d.setdefault(p, {})
            if not isinstance(nxt, dict):
                # an env override descends through an existing scalar
                # (file: `vad: 3`, env: AFE__vad__aggressiveness=2) — the
                # override wins: replace the scalar with a section instead
                # of crashing on int.__setitem__
                nxt = {}
                d[p] = nxt
            d = nxt
        d[parts[-1]] = value

    def get(self, dotted: str, default: Any = None) -> Any:
        d: Any = self.data
        for p in dotted.split("."):
            if not isinstance(d, dict) or p not in d:
                return default
            d = d[p]
        return d

    def spark_conf(self) -> dict[str, str]:
        """Flatten the ``spark`` section back into ``spark.x.y`` conf keys."""
        out: dict[str, str] = {}

        def walk(prefix: str, d: Any) -> None:
            if isinstance(d, dict):
                for k, v in d.items():
                    walk(f"{prefix}.{k}", v)
            elif d is not None:
                out[prefix] = str(d).lower() if isinstance(d, bool) else str(d)

        walk("spark", self.data.get("spark", {}))
        return out

    def apply_to_spark(self, spark: SparkSession) -> list[str]:
        """Set runtime-settable conf on a live session; returns keys applied.
        Static conf (master, memory) must flow through session.get_spark's
        ``extra`` at build time instead — those raise and are skipped."""
        applied = []
        for k, v in self.spark_conf().items():
            try:
                spark.conf.set(k, v)
                applied.append(k)
            except Exception:  # noqa: BLE001 - static conf can't be re-set
                pass
        return applied
