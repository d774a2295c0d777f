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


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    val_col: str,
    n_out: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, public
    thesis) — the perceptual companion to :func:`m4_downsample`: selects the
    ``n_out`` points whose connecting line preserves the series' visual
    shape (first + last always kept; each middle bucket contributes its
    max-effective-area point w.r.t. the previous selection and the next
    bucket's mean).

    EXACT-INTEGER variant: with integer ``val_col`` (cents) and integral
    timestamps, the effective area against the next bucket's mean point is
    compared via the n-scaled cross product
    ``|(t_p·n − Σt)(v_c − v_p) − (t_p − t_c)(Σv − n·v_p)|`` — all BIGINT,
    so the argmax (first-max/smallest-index tiebreak) is deterministic
    across engines and parallelism, unlike float-area LTTB whose near-ties
    flip on association. Magnitude contract: ``span_sec · |v| · bucket_n``
    must stay below 2^63 (holds for cents-scale tier loads by orders of
    magnitude).

    The selection is a sequential sweep (each bucket's winner depends on
    the previous winner), so per the repo rule it runs as a grouped-map
    Arrow kernel (`applyInPandas`) over TIER POINTS per key — the
    retention-bounded post-rollup contract shared with the Gorilla packer;
    never raw rows. Bucket boundaries use pure integer division
    ``1 + j·(N−2)//(n_out−2)`` so the oracle can replay them.

    Returns the selected rows (keys + ts + val) with ``sel_pos`` ordinal.
    Series with ``N ≤ n_out`` pass through whole.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    if n_out < 3:
        raise ValueError("lttb_downsample needs n_out >= 3 (first + last + 1 bucket)")
    data_cols = [*keys, ts_col, val_col]
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[c] for c in data_cols] + [StructField("sel_pos", IntegerType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf.assign(sel_pos=np.arange(n, dtype=np.int32))[
                data_cols + ["sel_pos"]
            ]
        t_abs = pdf[ts_col].to_numpy("datetime64[ns]").view("int64") // 1_000_000_000
        t = t_abs - t_abs[0]
        v = pdf[val_col].to_numpy(np.int64)
        nb = n_out - 2
        # integer bucket boundaries; B[0]=1, B[nb]=n-1, B[nb+1] clamped to n
        bounds = [min(1 + (j * (n - 2)) // nb, n) for j in range(n_out)]
        a = 0
        sel = [0]
        for i in range(nb):
            lo, hi = bounds[i], bounds[i + 1]
            alo, ahi = bounds[i + 1], bounds[i + 2] if i + 2 < len(bounds) else n
            if ahi <= alo:  # final step: the "next bucket" is the last point
                alo, ahi = n - 1, n
            n_a = ahi - alo
            st, sv = int(t[alo:ahi].sum()), int(v[alo:ahi].sum())
            tp, vp = int(t[a]), int(v[a])
            area2n = np.abs(
                (tp * n_a - st) * (v[lo:hi] - vp) - (tp - t[lo:hi]) * (sv - n_a * vp)
            )
            a = lo + int(np.argmax(area2n))  # first max = smallest-index tiebreak
            sel.append(a)
        sel.append(n - 1)
        out = pdf.iloc[sel].reset_index(drop=True)
        return out.assign(sel_pos=np.arange(len(sel), dtype=np.int32))[
            data_cols + ["sel_pos"]
        ]

    return df.select(*data_cols).groupBy(*keys).applyInPandas(kernel, out_schema)
