"""Lag/lead reframing + window-tensor ops (SURVEY.md W1-W4, J5, O7).

W1 ``to_supervised`` re-expresses the reference's ``series_to_supervised``
(/root/reference/prediction/lstm_mts.py:192-230 — the identical helper is
copied at prediction/main.py:34-40, lstm_multidimension.py:69-95,
ensemblation/processor.py:68-101) as lag/lead window functions: column
``var{j+1}(t-i)`` = lag(col_j, i), ``var{j+1}(t+k)`` = lead(col_j, k), then
rows with any null are dropped (dropnan=True semantics of :226-229).

W3 ``sliding_windows`` materializes the (samples, timesteps) tensor view
(lstm_mts.py:149-151) as an ArrayType column via collect_list over a row
frame; the window's tag is the LAST row's tag (J5 alignment,
prediction/lstm_model.py:110-112).

All JVM window functions — one shuffle per (keys) partitioning, shared by
every lag/lead column (Catalyst collapses same-window expressions into a
single Window physical node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_supervised(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_cols: list[str],
    n_in: int,
    n_out: int = 1,
    dropnan: bool = True,
) -> DataFrame:
    """W1: supervised lag/lead frame with reference column naming."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    out = df
    names: list[str] = []
    for i in range(n_in, 0, -1):
        for j, c in enumerate(val_cols):
            name = f"var{j + 1}(t-{i})"
            out = out.withColumn(name, F.lag(c, i).over(w))
            names.append(name)
    for k in range(0, n_out):
        for j, c in enumerate(val_cols):
            name = f"var{j + 1}(t)" if k == 0 else f"var{j + 1}(t+{k})"
            out = out.withColumn(name, F.lead(c, k).over(w))
            names.append(name)
    if dropnan:
        out = out.na.drop(subset=names)
    return out


def difference(
    df: DataFrame, keys: list[str], order_col: str, val_col: str, lag: int = 1,
    out_col: str = "diff",
) -> DataFrame:
    """W2: x_t − x_{t−lag} (prediction/main.py:44-49); head rows → null."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn(out_col, F.col(val_col) - F.lag(val_col, lag).over(w))


def inverse_difference(
    df: DataFrame, keys: list[str], order_col: str, diff_col: str, history_col: str,
    lag: int = 1, out_col: str = "undiff",
) -> DataFrame:
    """W2 inverse: diff_t + x_{t−lag} (prediction/main.py:53-54)."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn(out_col, F.col(diff_col) + F.lag(history_col, lag).over(w))


def sliding_windows(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_cols: list[str],
    w: int,
    tag_col: str | None = None,
) -> DataFrame:
    """W3: overlapping stride-1 subsequences as array columns
    ``{col}_win: array<double>``; incomplete head windows are dropped
    (size == w filter). Window tag = tag of the LAST row (J5)."""
    win = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(-(w - 1), 0)
    out = df
    for c in val_cols:
        # collect_list silently SKIPS nulls, which would misalign windows
        # across columns; map null → NaN first (pandas keeps NaN in place,
        # reference lstm_mts.py:149-151 semantics), then every column's
        # window has exactly w entries
        safe = F.when(F.col(c).isNull(), F.lit(float("nan"))).otherwise(
            F.col(c).cast("double")
        )
        out = out.withColumn(f"{c}_win", F.collect_list(safe).over(win))
    for c in val_cols:
        out = out.filter(F.size(f"{c}_win") == w)
    if tag_col is not None:
        # the frame ends at the current row ⇒ current row IS the last row
        out = out.withColumn("win_tag", F.col(tag_col))
    return out


def shift_tags(
    df: DataFrame, keys: list[str], order_col: str, tag_col: str, timesteps: int
) -> DataFrame:
    """W4: Series(tag).shift(TIMESTEPS) (lstm_mts.py:139) as lag()."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn(f"{tag_col}_shifted", F.lag(tag_col, timesteps).over(w))


def stack_long(df: DataFrame, id_cols: list[str], val_cols: list[str]) -> DataFrame:
    """O7: wide → long (df.stack(), prediction/lstm_unsupervised.py:106-107)
    via the built-in stack() table function."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in val_cols)
    expr = f"stack({len(val_cols)}, {pairs}) as (dim, value)"
    return df.select(*id_cols, F.expr(expr))
