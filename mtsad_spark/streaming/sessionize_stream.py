"""Gap-based sessionization on streams via the built-in ``session_window``
(SURVEY.md §2.8; batch counterpart: driver_queries.sessionize_users).

Spark-first shape: ``session_window`` is a native Catalyst aggregation whose
state-store windows MERGE as events arrive — no custom stateful UDF needed
(contrast streaming/stateful_ewma.py, where the recursion genuinely isn't
expressible). The same expression runs in batch, so batch/stream parity is a
direct equality test, and the watermark bounds state: sessions close and
evict once event time passes ``watermark`` behind the max seen.

Semantics note: ``session_window`` keeps an event in the current session iff
its time is STRICTLY before (last event time + gap); an event at exactly the
gap boundary starts a new session. The classic cumulative-sum formulation
must use ``ts >= prev + gap`` as its boundary predicate to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """(key, session_start, session_end, n_events) — batch OR streaming
    input; event-time sessions with the given inactivity gap. session_end is
    the window end (= last event + gap), the native session_window contract."""
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form: watermark bounds the session state store (a session
    finalizes once event time moves ``watermark`` past its end; later-than-
    watermark stragglers are dropped, the standard trade)."""
    return sessionize(
        stream.withWatermark(ts_col, watermark), key_col, ts_col, gap
    )
