"""MTS → UTS dimension reduction (SURVEY.md §0 transformation family).

The reference reduces d-dimensional series to one dimension with
PCA/KernelPCA/t-SNE before scoring (/root/reference/transformation/
eeg_eye_state.py:207-226 ``to_uts``). The Spark-native equivalent uses
``pyspark.ml.feature.PCA`` (distributed covariance + local SVD on the d×d
matrix — d is small, rows are many) after the reference's StandardScaler
step (eeg_eye_state.py:201-204, population-std z-norm like A1). KernelPCA /
t-SNE are non-linear and O(n²) — out of scope at 10^12 rows (they would be
per-sample kernels anyway, not dataflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_to_uts(
    df: DataFrame,
    val_cols: list[str],
    out_col: str = "uts",
    standardize: bool = True,
    keys: list[str] | None = None,
) -> DataFrame:
    """Project the feature columns onto the first principal component.

    Standardization uses population std (ddof=0) per the reference's
    StandardScaler. Sign convention: the component is flipped so its largest-
    magnitude loading is positive (PCA sign is arbitrary; pinning it makes
    results deterministic across runs/partitionings).
    """
    from pyspark.ml.feature import PCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from .stats import znorm

    work = znorm(df, val_cols, keys=keys) if standardize else df
    assembled = VectorAssembler(inputCols=val_cols, outputCol="_feat").transform(work)
    model = PCA(k=1, inputCol="_feat", outputCol="_pc").fit(assembled)
    sign = 1.0
    dense = model.pc.toArray()[:, 0]
    if abs(dense.min()) > abs(dense.max()):
        sign = -1.0
    out = model.transform(assembled).withColumn(
        out_col, vector_to_array(F.col("_pc")).getItem(0) * F.lit(sign)
    )
    return out.drop("_feat", "_pc")
