"""Time-series joins Spark lacks natively (SURVEY.md §2.3 addenda).

The reference aligns positionally (pandas index), which the engine replaces
with explicit keys (J1-J5). Two alignment shapes a production time-series
store additionally needs:

* ``asof_join`` — attach to each left row the LATEST right row with
  right_ts ≤ left_ts per key (e.g. enrich raw events with the most recent
  completed rollup point). Implemented as the union-window trick: tag both
  sides, sort per key by (ts, side) with right-before-left on ties, and
  carry right values forward with ``last(..., ignorenulls)``. ONE shuffle
  (the window sort), no per-row subquery, no cross product — the standard
  scale form; semantics match pandas ``merge_asof`` (backward, exact ties
  allowed) and DuckDB ``ASOF JOIN`` (the driver oracle).

* ``interval_join_binned`` — point-in-interval equi-ish join: intervals
  explode into fixed-width time bins, points compute their bin, the join is
  an equi-join on (keys, bin) followed by the exact BETWEEN filter. Work is
  proportional to overlaps + interval span/bin_width, never |points|×
  |intervals| — the standard binning defusal of a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(df: DataFrame, c: str) -> F.Column:
    """Order column → double (epoch seconds for timestamps). TIMESTAMP_NTZ
    has no direct double cast; hop through TIMESTAMP (session TZ is pinned
    UTC engine-wide, so the hop is deterministic)."""
    col = F.col(c)
    if dict(df.dtypes)[c].startswith("timestamp"):
        col = col.cast("timestamp")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left rows + latest-right values (right_ts ≤ left_ts) per key; right
    columns are null when no right row precedes the left row."""
    lcols = [c for c in left.columns]
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(*lcols, "_ts", "_side", *[f"_r_{c}" for c in right_cols]).unionByName(
        r.select(*lcols, "_ts", "_side", *[f"_r_{c}" for c in right_cols])
    )
    # right (side 0) sorts before left (side 1) at equal ts ⇒ exact-tie match
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .select(*lcols, *[F.col(f"_r_{c}").alias(c) for c in right_cols])
    )


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int = 3600,
) -> DataFrame:
    """Inner join of points to enclosing intervals (start ≤ ts ≤ end) per
    key, binned so the equi-join carries the range predicate's selectivity."""
    p = points.withColumn(
        "_bin", F.floor(_epoch(points, ts_col) / bin_width_s).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch(intervals, start_col) / bin_width_s).cast("long"),
                F.floor(_epoch(intervals, end_col) / bin_width_s).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, [*keys, "_bin"])
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_bin")
    )
