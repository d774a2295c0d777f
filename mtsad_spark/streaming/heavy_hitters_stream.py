"""Streaming heavy hitters via Misra–Gries state (SURVEY.md §2.8 custom
stateful operator pattern; frequency counterpart of stateful_ewma).

The BATCH op (operators/rollup.token_heavy_hitters) is exact because a token
vocabulary bounds the count frame. On an unbounded stream of raw keys (or
when per-key state must stay O(m) regardless of history), the classic
bounded-memory summary is Misra–Gries: m counters per key, with the
MERGEABLE-summaries combine (Agarwal et al., PODS'12) applied per
micro-batch — add the batch's exact counts, then subtract the (m+1)-th
largest counter from all and drop non-positives. State per key is exactly
(tokens[m], counts[m], n_total).

Guarantees carried to the output (and asserted in tests):

* every token with true frequency > n/(m+1) IS present in the summary;
* each reported count is an UNDER-estimate, short by at most the total
  decrement ``err`` (also ≤ n/(m+1)): true − err ≤ est ≤ true.

Each micro-batch APPENDS the key's full current summary snapshot
(key, token, est_count, err, n_total) — readers keep the rows with the
key's max n_total (file sinks cannot update in place).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("token", LongType()),
        StructField("est_count", LongType()),
        StructField("err", LongType()),
        StructField("n_total", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
        StructField("err", LongType()),
    ]
)


def _mg_merge(counters: dict[int, int], m: int) -> tuple[dict[int, int], int]:
    """Trim a counter dict to ≤ m entries, Misra–Gries style. Returns the
    trimmed dict and the decrement applied (the error this step added)."""
    if len(counters) <= m:
        return counters, 0
    dec = sorted(counters.values(), reverse=True)[m]
    out = {t: c - dec for t, c in counters.items() if c - dec > 0}
    return out, dec


def streaming_heavy_hitters(
    stream: DataFrame,
    m: int = 64,
    key_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """groupBy(key).applyInPandasWithState Misra–Gries over a stream of
    (key, tokens array) rows."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, n, err = state.get
            counters = dict(zip(toks, cnts))
        else:
            counters, n, err = {}, 0, 0
        from collections import Counter

        for pdf in pdfs:
            batch = Counter()
            for arr in pdf[tokens_col]:
                batch.update(int(t) for t in arr)
            n += sum(batch.values())
            for t, c in batch.items():
                counters[t] = counters.get(t, 0) + c
            counters, dec = _mg_merge(counters, m)
            err += dec
        state.update((list(counters), [counters[t] for t in counters], n, err))
        yield pd.DataFrame(
            {
                "source": key[0],
                "token": list(counters),
                "est_count": [counters[t] for t in counters],
                "err": err,
                "n_total": n,
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # each batch APPENDS its current summary snapshot (readers take
            # the max-n_total rows per key); true "update" mode would demand
            # an update-capable sink, which file sinks are not
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
