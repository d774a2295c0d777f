"""Streaming exact dedup (training-data ingest path; batch counterpart:
operators/dedup.exact_dedup / drop_exact_dups).

A crawl/ingest stream re-delivers identical documents (retries, mirrors,
re-crawls). ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per
content hash and bounds the dedup state store by the watermark: two
duplicates arriving within the watermark window of each other dedup
exactly; a re-delivery later than the watermark is a fresh row (the standard
state-bounded trade — unbounded exact dedup across an infinite stream would
need unbounded state, which is exactly what the batch exact-dedup pass over
the accumulated corpus is for).

The content hash is md5 of the text (the batch operator's key), computed
BEFORE the dedup so state stores a 32-char hash per kept row, never the
document body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_drop_exact_dups(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup on a stream: rows whose ``text_col``
    md5 was already seen within the watermark window are dropped. Output
    carries ``content_hash`` for downstream joins/audits."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
