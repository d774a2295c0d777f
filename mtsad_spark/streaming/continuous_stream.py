"""Streaming ingest that MAINTAINS the continuous-aggregate tier tables
(north_star: continuous aggregates over an ever-growing ingest stream).

``foreachBatch`` is the canonical Structured-Streaming pattern for sinks
that need merge semantics Spark's append/update modes can't express: each
micro-batch is handed to plans/continuous.ContinuousAggregate.refresh, which
partial-merges it into the stored 1m/1h/1d tables (partition-pruned read +
dynamic-partition overwrite — at production scale an Iceberg MERGE INTO).

Exactly-once: the streaming checkpoint records the batch id; refresh is NOT
idempotent per batch (a replayed batch would double-merge), so the sink
skips batch ids it has already applied — the standard foreachBatch
transactional-sink discipline (batch id + table state move together).

Because LONG partials merge associatively, the streamed result is
bitwise-equal to one batch rebuild over the same rows — asserted in
tests/test_streaming.py (stream ≡ batch ≡ incremental).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mtsad_spark.plans.continuous import ContinuousAggregate


class StreamingContinuousAggregate:
    """foreachBatch sink wrapping ContinuousAggregate.refresh."""

    def __init__(self, agg: ContinuousAggregate):
        self.agg = agg
        self._applied_path = os.path.join(agg.base_dir, "_applied_batches.json")

    def _applied(self) -> set[int]:
        if os.path.exists(self._applied_path):
            with open(self._applied_path) as f:
                return set(json.load(f))
        return set()

    def _mark(self, batch_id: int) -> None:
        done = self._applied() | {batch_id}
        tmp = self._applied_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(done), f)
        os.replace(tmp, self._applied_path)  # atomic on POSIX

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._applied():
            return  # replayed micro-batch: the merge already landed
        self.agg.refresh(batch)
        self._mark(batch_id)

    def start(
        self, stream: DataFrame, checkpoint: str, trigger_available_now: bool = True
    ) -> StreamingQuery:
        w = stream.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()
