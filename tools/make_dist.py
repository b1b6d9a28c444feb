"""Package the engine for ``spark-submit --py-files`` (north-rule launch path).

Produces ``dist/audio_feature_extraction_spark.zip`` containing the package
only (no tests/tools) — the artifact every executor's Python worker imports
on a real cluster. Usage:

    python tools/make_dist.py
    spark-submit --master <master> \\
        --py-files dist/audio_feature_extraction_spark.zip \\
        tools/submit_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "audio_feature_extraction_spark"


def make_dist(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(make_dist())
