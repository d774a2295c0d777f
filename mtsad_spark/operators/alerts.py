"""Alert-episode extraction: point anomaly flags → merged anomaly INTERVALS.

The reference's detectors emit per-point anomaly labels (threshold over
z-score/EWMA/bitmap scores — e.g. ``/root/reference/statistication/main.py``'s
``outliers_*`` index arrays and ``tsbitmaps/tsbitmapper.py``'s binary
``predict``); an operations-grade engine reports *episodes*: maximal runs of
hot buckets with a merge-gap tolerance and a minimum duration, the exact
semantics of Prometheus's ``for:`` clause and of the interval-based anomaly
benchmarks (Numenta NAB, range-based precision/recall — Tatbul et al.,
NeurIPS'18). This module is the gaps-and-islands composition that turns any
boolean flag column produced by ``operators/scoring`` into such intervals.

Scale shape: the per-key ordered window runs over HOT TIER POINTS ONLY —
the flag filter lands first, so window input is a threshold-selected
subset of rollup buckets (bounded by retention × alert rate), never raw
rows. All outputs are integer algebra over bucket epochs; no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def episodes(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    bucket_width_s: int,
    hot_col: str = "is_hot",
    val_col: str | None = None,
    merge_gap: int = 0,
    min_len: int = 1,
) -> DataFrame:
    """Merge flagged buckets into alert episodes per key.

    An episode is a maximal set of hot buckets in which consecutive hot
    buckets are at most ``merge_gap + 1`` bucket widths apart (``merge_gap``
    cold or missing buckets inside an episode are tolerated — the
    "alert de-bounce" rule). Episodes with fewer than ``min_len`` hot
    buckets are dropped (the ``for:``-duration rule).

    Input rows are tier points carrying a boolean ``hot_col`` (compose from
    ``scoring.apply_threshold`` / rank cuts); ``bucket_col`` must be aligned
    to ``bucket_width_s``. Returns one row per (keys, episode):

    ``start_ts``/``end_ts`` (first/last hot bucket), ``n_hot`` (hot-bucket
    count), ``duration_s = end − start + width`` (wall span including the
    closing bucket), and — when ``val_col`` is given — ``peak_val``/
    ``sum_val`` over the hot buckets. Integer end-to-end: epochs are
    truncated LONG seconds of aligned buckets, counts/sums are BIGINT.
    """
    if merge_gap < 0 or min_len < 1 or bucket_width_s <= 0:
        raise ValueError("merge_gap >= 0, min_len >= 1, bucket_width_s > 0")
    vals = [val_col] if val_col else []
    hot = df.filter(F.col(hot_col)).select(*keys, bucket_col, *vals)
    # TIMESTAMP_NTZ needs the cast-to-TIMESTAMP hop before numeric (the
    # operators/joins._epoch lesson); aligned buckets make truncation exact.
    ep = F.expr(f"CAST(CAST({bucket_col} AS TIMESTAMP) AS LONG)")
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("_ep").over(w)
    new_ep = F.when(
        prev.isNull() | ((F.col("_ep") - prev) > (merge_gap + 1) * bucket_width_s),
        1,
    ).otherwise(0)
    flagged = (
        hot.withColumn("_ep", ep)
        .withColumn("_new", new_ep)
        .withColumn("_eid", F.sum("_new").over(cum))
    )
    aggs = [
        F.min(bucket_col).alias("start_ts"),
        F.max(bucket_col).alias("end_ts"),
        F.count(F.lit(1)).alias("n_hot"),
        (F.max("_ep") - F.min("_ep") + F.lit(bucket_width_s)).alias("duration_s"),
    ]
    if val_col:
        aggs += [F.max(val_col).alias("peak_val"), F.sum(val_col).alias("sum_val")]
    out = flagged.groupBy(*keys, "_eid").agg(*aggs)
    return out.filter(F.col("n_hot") >= min_len).drop("_eid")
