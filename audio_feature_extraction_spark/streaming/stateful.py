"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's per-run accumulation (periodic result flush every 10 pairs,
`05_dtw_alignment_experiment/dtw_alignment.py:1323-1328`; running perf
counters `:50-80`) is the batch shadow of incremental per-key state. This is
the streaming-native form: per-key running totals (rows, tokens, last value)
carried across micro-batches in managed GroupState — Arrow-batched pandas on
the executor, no per-row Python, state bounded per key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "doc_id string, batch_rows long, cum_rows long, cum_tokens long, last_value double"
)
_STATE_SCHEMA = "cum_rows long, cum_tokens long, last_value double"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (doc_id,) = key
    if state.exists:
        cum_rows, cum_tokens, last_value = state.get
    else:
        cum_rows, cum_tokens, last_value = 0, 0, None

    # one key's micro-batch may span several Arrow chunks arriving in
    # arbitrary shuffle order — concat ALL chunks, sort once by event time,
    # then take the last non-null value, so last_value is the value at the
    # global max ts (per-chunk sorting alone is nondeterministic)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    batch_rows = 0
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            "ts", kind="mergesort"
        )
        batch_rows = len(pdf)
        cum_rows += len(pdf)
        cum_tokens += int(pdf["n_tok"].sum())
        v = pdf["value"].dropna()
        if len(v):
            last_value = float(v.iloc[-1])

    state.update((cum_rows, cum_tokens, last_value))
    yield pd.DataFrame(
        {
            "doc_id": [doc_id],
            "batch_rows": [batch_rows],
            "cum_rows": [cum_rows],
            "cum_tokens": [cum_tokens],
            "last_value": [last_value],
        }
    )


def stream_running_totals(stream_df: DataFrame) -> DataFrame:
    """Per-doc_id running (rows, tokens, LOCF value) across micro-batches.

    Input columns: doc_id, ts, n_tok, value. Emits one row per (key, batch)
    with the batch delta and the cumulative state — the incremental LOCF /
    running-total analog of the batch window operators.
    """
    return stream_df.groupBy("doc_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
