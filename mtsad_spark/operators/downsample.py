"""M4 visualization-grade downsampling (the "downsample" leg of the
rollup + downsample + retention tier design).

M4 (Jugel et al., VLDB 2014 — public) is the error-free line-chart
downsample: per time bucket keep exactly the 4 extremal points
(min-value, max-value, first, last); a line rendered through them is
pixel-identical to the full-resolution series at the chosen bucket-per-pixel
width. It is a pure hash aggregation (min/max/min_by/max_by — all algebraic,
map-side combined), so unlike LTTB (a sequential sweep) it scales like any
rollup and composes with the tier cascade.

Determinism: ``first``/``last`` pick by the order column, which must be a
total order per key (ties would make min_by arrival-order dependent — same
contract as every windowed operator here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    bucket_width_s: float,
) -> DataFrame:
    """Per (keys, bucket): ``(bucket_start, n, v_min, v_max, v_first,
    v_last, t_first, t_last)``. ``bucket_width_s`` is the bucket width in
    order-column units (seconds for timestamps) — pick series_span/pixels."""
    from .joins import _epoch

    b = df.withColumn(
        "_bk", F.floor(_epoch(df, order_col) / F.lit(float(bucket_width_s))).cast("long")
    )
    return (
        b.groupBy(*keys, "_bk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(val_col).alias("v_min"),
            F.max(val_col).alias("v_max"),
            F.min_by(val_col, order_col).alias("v_first"),
            F.max_by(val_col, order_col).alias("v_last"),
            F.min(order_col).alias("t_first"),
            F.max(order_col).alias("t_last"),
        )
        .withColumn("bucket_start", F.col("_bk") * F.lit(float(bucket_width_s)))
        .drop("_bk")
    )
