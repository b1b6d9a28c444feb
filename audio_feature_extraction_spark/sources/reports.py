"""Human-readable report sinks (SURVEY.md §2.1 S6/S7).

The reference writes small per-run reports — a CSV summary table
(`evaluation/evaluator.py:131-140`) and JSON result dumps
(`05_dtw_alignment_experiment/dtw_alignment.py:1334-1357`). Here those are
thin wrappers over the native DataFrame writers so the sink participates in
the plan (no driver-side collect-and-loop):

- reports are usually SMALL (a rollup, not the corpus), so the default is
  ``single_file=True`` → ``coalesce(1)`` and the one part-file is renamed to
  the exact requested path — what a human or a downstream spreadsheet expects;
- ``single_file=False`` keeps the parallel multi-part layout for big exports —
  the 100 TB path writes partitioned and skips the rename.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

_FORMATS = {"csv", "json"}


def write_report(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    single_file: bool = True,
    overwrite: bool = True,
    **options: str,
) -> str:
    """Write ``df`` as a CSV/JSON report; returns the path actually written.

    ``single_file=True``: exactly one ordinary file at ``path`` (for CSV a
    header row is included by default). ``single_file=False``: a standard
    partitioned directory at ``path``.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    mode = "overwrite" if overwrite else "error"
    if fmt == "csv":
        options.setdefault("header", "true")

    if not single_file:
        df.write.mode(mode).options(**options).format(fmt).save(path)
        return path

    tmp = path + "._spark_report_tmp"
    df.coalesce(1).write.mode("overwrite").options(**options).format(fmt).save(tmp)
    parts = sorted(glob.glob(os.path.join(tmp, f"part-*.{fmt}"))) or sorted(
        glob.glob(os.path.join(tmp, "part-*"))
    )
    if len(parts) != 1:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"expected exactly one part file in {tmp}, got {parts}")
    if os.path.exists(path):
        if not overwrite:
            shutil.rmtree(tmp, ignore_errors=True)
            raise FileExistsError(path)
        (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(parts[0], path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def write_csv_report(df: DataFrame, path: str, **kw) -> str:
    """S6: CSV summary table (ref `evaluation/evaluator.py:131-140`)."""
    return write_report(df, path, fmt="csv", **kw)


def write_json_report(df: DataFrame, path: str, **kw) -> str:
    """S7: JSON-lines result dump (ref `dtw_alignment.py:1334-1357`)."""
    return write_report(df, path, fmt="json", **kw)
