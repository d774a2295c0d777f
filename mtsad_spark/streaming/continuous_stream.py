"""Streaming ingest that MAINTAINS the continuous-aggregate tier tables
(north_star: continuous aggregates over an ever-growing ingest stream).

``foreachBatch`` is the canonical Structured-Streaming pattern for sinks
that need merge semantics Spark's append/update modes can't express: each
micro-batch is handed to plans/continuous.ContinuousAggregate.refresh, which
partial-merges it into the stored 1m/1h/1d tables (partition-pruned read +
dynamic-partition overwrite — at production scale an Iceberg MERGE INTO).

Delivery semantics — stated honestly (code-review r5): refresh is NOT
idempotent per batch (a replayed batch would double-merge), so the sink
skips batch ids it has already applied. Because the applied-ids marker and
the multi-tier table writes are SEPARATE non-transactional writes, a crash
BETWEEN the first tier write and the marker can still double-merge that one
batch on restart — the parquet backend is therefore at-least-once with
replay-skip, not exactly-once. True exactly-once needs the production
Iceberg path, where the merge and the batch id land in ONE snapshot commit
(MERGE INTO + snapshot summary property), or a rebuild from raw after an
unclean stop. Applied ids are scoped to the stream's checkpoint location,
so pointing a FRESH checkpoint (batch ids restart at 0) at an existing
table is detected rather than silently skipping real batches.

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

    def __init__(self, agg: ContinuousAggregate, checkpoint: str = "default"):
        self.agg = agg
        self.checkpoint = checkpoint
        self._applied_path = os.path.join(agg.base_dir, "_applied_batches.json")

    def _state(self) -> dict:
        if os.path.exists(self._applied_path):
            with open(self._applied_path) as f:
                return json.load(f)
        return {"checkpoint": self.checkpoint, "ids": []}

    def _applied(self) -> set[int]:
        st = self._state()
        if st["checkpoint"] != self.checkpoint:
            # a DIFFERENT stream (fresh checkpoint, batch ids restart at 0)
            # is writing into an existing table: its ids must not collide
            # with the old stream's — refuse loudly instead of silently
            # skipping real batches (code-review r5)
            raise ValueError(
                f"table {self.agg.base_dir!r} was fed by checkpoint "
                f"{st['checkpoint']!r}; refusing batch-id dedup against "
                f"checkpoint {self.checkpoint!r} — rebuild the table or "
                "resume the original checkpoint"
            )
        return set(st["ids"])

    def _mark(self, batch_id: int) -> None:
        done = sorted(self._applied() | {batch_id})
        tmp = self._applied_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"checkpoint": self.checkpoint, "ids": done}, f)
        os.replace(tmp, self._applied_path)  # atomic on POSIX

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._applied():
            return  # replayed micro-batch: the merge already landed
        self.agg.refresh(batch)
        self._mark(batch_id)

    def start(
        self, stream: DataFrame, checkpoint: str, trigger_available_now: bool = True
    ) -> StreamingQuery:
        self.checkpoint = checkpoint
        w = stream.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()
