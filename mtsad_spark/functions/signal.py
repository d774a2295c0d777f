"""Signal kernels (SURVEY.md §2.7): FFT band-stop residual and HP-filter
detrending, as grouped pandas/Arrow kernels (no native Spark equivalent;
reference: /root/reference/statistication/fft.py and hp.py).

These run per (key) group — fixture-scale series. For long series, slice the
key with halos like operators/scoring.py (FFT is global-window by nature, so
the true scale path is per-chunk spectra; out of the north-rule critical
path per SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType


def fft_bandstop_residual(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    low_cut: float = 0.04,
    k: float = 2.0,
) -> DataFrame:
    """Reference fft.py:37-49 semantics: zero out low-frequency components
    (|freq| < low_cut of the spectrum), inverse-transform → high-frequency
    residual; sigma-rule label on the residual (fft.py:79-86)."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("resid", DoubleType()), StructField("label", IntegerType())]
    )
    cols = [f.name for f in df.schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        v = pdf[val_col].values.astype(np.float64)
        spec = np.fft.fft(v)
        freq = np.fft.fftfreq(len(v))
        spec[np.abs(freq) < low_cut] = 0
        resid = np.real(np.fft.ifft(spec))
        sigma = resid.std()
        label = np.where(np.abs(resid) > k * sigma, 1, -1).astype(np.int32)
        return pdf.assign(resid=resid, label=label)[cols + ["resid", "label"]]

    return df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


def _solve_sym_penta(
    a0: np.ndarray, a1: np.ndarray, a2: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """O(n) LDLᵀ solve of a symmetric positive-definite PENTAdiagonal system
    (main diag a0[n], first off-diag a1[n-1], second off-diag a2[n-2]).
    No pivoting needed: SPD. Replaces the round-1 dense n×n solve (O(n²)
    memory / O(n³) time — 8 TB of matrix at 1M points); the reference itself
    solves sparsely (statistication/hp.py:18-24 spdiags)."""
    n = len(y)
    d = np.empty(n)
    l1 = np.zeros(n)  # L[i, i-1]
    l2 = np.zeros(n)  # L[i, i-2]
    d[0] = a0[0]
    l1[1] = a1[0] / d[0]
    d[1] = a0[1] - l1[1] * l1[1] * d[0]
    for i in range(2, n):
        l2[i] = a2[i - 2] / d[i - 2]
        l1[i] = (a1[i - 1] - l2[i] * d[i - 2] * l1[i - 1]) / d[i - 1]
        d[i] = a0[i] - l2[i] * l2[i] * d[i - 2] - l1[i] * l1[i] * d[i - 1]
    z = np.empty(n)  # forward: L z = y
    z[0] = y[0]
    z[1] = y[1] - l1[1] * z[0]
    for i in range(2, n):
        z[i] = y[i] - l1[i] * z[i - 1] - l2[i] * z[i - 2]
    z /= d
    x = np.empty(n)  # back: Lᵀ x = z
    x[n - 1] = z[n - 1]
    x[n - 2] = z[n - 2] - l1[n - 1] * x[n - 1]
    for i in range(n - 3, -1, -1):
        x[i] = z[i] - l1[i + 1] * x[i + 1] - l2[i + 2] * x[i + 2]
    return x


def _hp_filter(y: np.ndarray, lamb: float) -> np.ndarray:
    """Hodrick-Prescott trend: minimize ||y−t||² + λ||D²t||² ⇒
    t = (I + λ DᵀD)⁻¹ y, with D the 2nd-difference operator (hp.py:18-24).
    scipy-free banded O(n) solve: A = I + λDᵀD is SPD pentadiagonal.
    """
    n = len(y)
    if n < 3:
        return y.copy()
    m = n - 2
    # DᵀD diagonals from the [1, -2, 1] second-difference stencil
    dd0 = np.zeros(n)
    dd0[0:m] += 1.0
    dd0[1 : m + 1] += 4.0
    dd0[2 : m + 2] += 1.0
    dd1 = np.zeros(n - 1)
    dd1[0:m] += -2.0
    dd1[1 : m + 1] += -2.0
    dd2 = np.full(n - 2, 1.0)
    return _solve_sym_penta(
        1.0 + lamb * dd0, lamb * dd1, lamb * dd2, np.asarray(y, dtype=np.float64)
    )


def hp_residual_mad(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    lamb: float = 1600.0,
    k: float = 3.0,
) -> DataFrame:
    """Reference hp.py:44-63: HP-detrend, then modified-z on the residual
    (0.6745·|d−median| / median-abs-dev) with threshold k."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("trend", DoubleType()),
            StructField("resid", DoubleType()),
            StructField("mod_z", DoubleType()),
            StructField("label", IntegerType()),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        y = pdf[val_col].values.astype(np.float64)
        trend = _hp_filter(y, lamb)
        resid = y - trend
        med = np.median(resid)
        mad = np.median(np.abs(resid - med))
        mod_z = 0.6745 * np.abs(resid - med) / mad if mad > 0 else np.zeros_like(resid)
        label = np.where(mod_z > k, 1, -1).astype(np.int32)
        return pdf.assign(trend=trend, resid=resid, mod_z=mod_z, label=label)[
            cols + ["trend", "resid", "mod_z", "label"]
        ]

    return df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


def epsilon_by_f1(
    df: DataFrame,
    density_col: str,
    truth_col: str,
    n_steps: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """A12 (gaussian.py:113-125): sweep n_steps thresholds between min and max
    density, keep the argmax-F1 epsilon — explode(sequence) × conditional
    aggs × max_by, one Spark plan, no driver loop."""
    keys = keys or []
    # project before the step fan-out (guide §2.3): the explode multiplies
    # every row n_steps times, so only the three columns the sweep reads may
    # ride through it
    df = df.select(*keys, density_col, truth_col)
    bounds = df.groupBy(*keys).agg(
        F.min(density_col).alias("_lo"), F.max(density_col).alias("_hi")
    )
    steps = bounds.select(
        *keys,
        F.explode(F.sequence(F.lit(1), F.lit(n_steps))).alias("_i"),
        ((F.col("_hi") - F.col("_lo")) / n_steps).alias("_step"),
        F.col("_lo"),
    ).select(
        *keys, (F.col("_lo") + F.col("_i") * F.col("_step")).alias("epsilon")
    )
    joined = df.join(F.broadcast(steps), keys, "inner") if keys else df.crossJoin(F.broadcast(steps))
    pred = F.col(density_col) < F.col("epsilon")  # low density ⇒ anomaly
    truth = F.col(truth_col) == 1
    from .metrics import with_prf_columns

    agg = joined.groupBy(*keys, "epsilon").agg(
        F.sum((pred & truth).cast("long")).alias("tp"),
        F.sum((pred & ~truth).cast("long")).alias("fp"),
        F.sum((~pred & truth).cast("long")).alias("fn"),
    )
    scored = with_prf_columns(agg)
    # deterministic tiebreak: adjacent epsilon steps often yield identical
    # confusion matrices (tied f1) — keep the LOWEST epsilon among the max-f1
    # rows, matching the reference's first-best strict-> scan
    # (gaussian.py:113-125). max_by on (f1, -epsilon) is order-independent.
    return scored.groupBy(*keys).agg(
        F.max_by("epsilon", F.struct(F.col("f1"), (-F.col("epsilon")).alias("_ne"))).alias("epsilon"),
        F.max("f1").alias("f1"),
    )
