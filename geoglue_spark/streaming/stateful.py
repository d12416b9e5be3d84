"""Custom stateful streaming operators via applyInPandasWithState.

The reference is batch-only; these give its incremental semantics a true
streaming face for ingest pipelines:

  * streaming_dedup — exactly-once emission per key (e.g. image_id or
    phash): state = "seen" flag per key; duplicates arriving later are
    dropped. The streaming analog of dedup.exact_dedup_keep_first.
  * streaming_running_stats — running count/sum per key across micro-
    batches (the incremental rows/sec metrics ledger, I4, as a stream).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    key_col: str,
    emit_cols: list[str],
) -> DataFrame:
    """Emit only the FIRST row seen per key across the whole stream."""
    out_schema = ", ".join(f"{c} string" for c in [key_col] + list(emit_cols))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return iter(())
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
        if first is None:
            return iter(())
        state.update((1,))
        out = first[[key_col] + list(emit_cols)].astype(str)
        return iter([out])

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_running_stats(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Running (count, sum) per key, emitted once per micro-batch."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        # key cast to str: the declared output field is string, and a long
        # key (user_id, phash) would fail Arrow conversion at the first
        # micro-batch (streaming_dedup does the same)
        yield pd.DataFrame({key_col: [str(key[0])], "n": [n], "sum_value": [s]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=f"{key_col} string, n long, sum_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
