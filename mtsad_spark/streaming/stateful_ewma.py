"""Stateful streaming EWMA via ``applyInPandasWithState`` (SURVEY.md §2.8
custom stateful operator pattern).

Batch EWMA (operators/scoring.py) needs the whole ordered series; on a stream
the recursion state (last level, last event-time) is carried in the state
store per key instead, so each micro-batch only touches its new rows. Rows
inside a batch are sorted by event time before applying the recursion;
late/out-of-order rows ACROSS batches are handled by the upstream watermark
(drop) — the recursion itself is order-sensitive by definition.

State schema: (level double, last_ts long, n long). Output: one row per input
row with the updated level and one-step-ahead residual, same contract as the
batch form (resid_0 = 0).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ewma_level", DoubleType()),
        StructField("resid", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("last_ts", LongType()),
        StructField("n", LongType()),
    ]
)


def streaming_ewma(
    stream: DataFrame,
    alpha: float = 0.2,
    key_col: str = "source",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """groupBy(key).applyInPandasWithState EWMA over a (possibly watermarked)
    stream of (key, ts, value)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            level, last_ts, n = state.get
        else:
            level, last_ts, n = None, -(2**62), 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            # rows older than the recursion's frontier arrived out of order
            # ACROSS batches — applying them would corrupt the ordered
            # recursion, so they are dropped (watermark-style late-data
            # semantics; state carries last_ts precisely for this check)
            pdf = pdf[pdf[ts_col].astype("int64") > last_ts]
            out_level, out_resid = [], []
            for v in pdf[val_col].astype(float):
                if level is None:
                    resid = 0.0
                    level = v
                else:
                    resid = v - level
                    level = alpha * v + (1 - alpha) * level
                out_level.append(level)
                out_resid.append(resid)
                n += 1
            if len(pdf):
                last_ts = int(pdf[ts_col].astype("int64").iloc[-1])
            yield pd.DataFrame(
                {
                    "source": pdf[key_col] if key_col in pdf else key[0],
                    "ts": pdf[ts_col],
                    "value": pdf[val_col].astype(float),
                    "ewma_level": out_level,
                    "resid": out_resid,
                }
            )
        # only persist state once a real observation seeded the recursion —
        # otherwise a data-less batch would store a spurious 0.0 level that a
        # later batch would treat as a genuine prior
        if level is not None:
            state.update((float(level), last_ts, n))

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
