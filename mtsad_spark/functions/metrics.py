"""Label-comparison aggregates: precision / recall / F1 (SURVEY.md A8/A9).

Manual TP/FP/FN conditional-aggregate semantics of
/root/reference/prediction/lstm_model.py:310-343 and
statistication/gaussian.py:11-34 (f1 = 2pr/(p+r); 0 when undefined), computed
as ONE hash aggregate — no collect, no sklearn. ``round_to`` replicates the
3-decimal presentation of the sklearn wrappers (lstm_mts.py:366-388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_prf_columns(counts: DataFrame) -> DataFrame:
    """Attach precision/recall/f1 to a frame carrying tp/fp/fn count columns
    — THE single implementation of the guarded formula (f1 = 2pr/(p+r), all
    three 0 when undefined); every sweep/ensemble caller reuses it."""
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    out = counts.withColumn("precision", prec).withColumn("recall", rec)
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    return out.withColumn("f1", f1)


def prf(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
    keys: list[str] | None = None,
    positive: int = 1,
    round_to: int | None = None,
) -> DataFrame:
    keys = keys or []
    t = F.col(truth_col) == positive
    p = F.col(pred_col) == positive
    agg = df.groupBy(*keys).agg(
        F.sum((p & t).cast("long")).alias("tp"),
        F.sum((p & ~t).cast("long")).alias("fp"),
        F.sum((~p & t).cast("long")).alias("fn"),
        F.sum((~p & ~t).cast("long")).alias("tn"),
    )
    out = with_prf_columns(agg)
    if round_to is not None:
        for c in ("precision", "recall", "f1"):
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out
