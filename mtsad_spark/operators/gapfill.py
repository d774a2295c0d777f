"""Gap-fill over rollup tiers (SURVEY.md W7/W8; north_star requirement).

A dense per-key bucket spine is generated with ``sequence() + explode`` (pure
Spark SQL — deterministic, no driver loop, spine size = keys × buckets which is
rollup-sized, not raw-data-sized). Missing buckets are then filled with

* LOCF — ``last(v, ignorenulls=True)`` over an unbounded-preceding row frame
  (reference analog: backfill/fillna, statistication/moving_average.py:85-86,
  prediction/main.py:39), or
* linear interpolation — bracket each gap with the previous/next observed
  point + its timestamp and interpolate; the four bracket columns come from
  two window functions each, all JVM-side.

Scale note: both fills are a single window over (key ORDER BY bucket). Rollup
rows per key are bounded (time-range / tier-width), so a per-key window is not
a skew risk the way raw-sequence windows are; for extreme spans, range-split
the spine by (key, coarse_chunk) and carry one halo row per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIERS


def dense_spine(rollup: DataFrame, keys: list[str], tier: str) -> DataFrame:
    """(keys..., bucket_ts) spine covering [min, max] bucket per key group."""
    _, step = TIERS[tier]
    bounds = rollup.groupBy(*keys).agg(
        F.min("bucket_ts").alias("_t0"), F.max("bucket_ts").alias("_t1")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_t0"),
                F.col("_t1"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias("bucket_ts"),
    )


def gap_fill(
    rollup: DataFrame,
    keys: list[str],
    tier: str,
    value_cols: list[str],
    method: str = "locf",
) -> DataFrame:
    """Return the rollup joined onto its dense spine with gaps filled.

    Adds ``gap_filled: boolean`` and ``fill_method: string``. Count-like
    columns are NOT invented for missing buckets: ``cnt`` is filled with 0,
    value columns per ``method``. Leading gaps (before the first observation)
    stay null under both methods (nothing to carry), matching a pandas
    ``ffill`` / ``interpolate(limit_area='inside')`` oracle.
    """
    if method not in ("locf", "linear", "none"):
        raise ValueError(f"unknown fill method {method!r}")
    spine = dense_spine(rollup, keys, tier)
    joined = spine.join(rollup.withColumn("_obs", F.lit(True)), [*keys, "bucket_ts"], "left")
    out = joined.withColumn("gap_filled", F.col("_obs").isNull()).drop("_obs")
    if "cnt" in rollup.columns:
        out = out.withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    if "tier" in rollup.columns:
        out = out.withColumn("tier", F.coalesce(F.col("tier"), F.lit(tier)))

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    if method == "locf":
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_prev))
    elif method == "linear":
        ts_obs = F.when(~F.col("gap_filled"), F.col("bucket_ts").cast("double"))
        out = (
            out.withColumn("_t_prev", F.last(ts_obs, ignorenulls=True).over(w_prev))
            .withColumn("_t_next", F.first(ts_obs, ignorenulls=True).over(w_next))
        )
        for c in value_cols:
            v_prev = F.last(c, ignorenulls=True).over(w_prev)
            v_next = F.first(c, ignorenulls=True).over(w_next)
            frac = (F.col("bucket_ts").cast("double") - F.col("_t_prev")) / (
                F.col("_t_next") - F.col("_t_prev")
            )
            out = out.withColumn(
                c,
                F.when(~F.col("gap_filled"), F.col(c)).otherwise(
                    v_prev + (v_next - v_prev) * frac
                ),
            )
        out = out.drop("_t_prev", "_t_next")
    return out.withColumn("fill_method", F.lit(method))
