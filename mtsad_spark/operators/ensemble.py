"""Scorer ensembles (SURVEY.md §0 ensemblation family, re-expressed).

The reference ensembles sklearn classifiers by majority vote / stacked
meta-features (/root/reference/ensemblation/ensemble_voting.py,
ensemble_stacking.py). The engine's analog combines its own anomaly scorers:

* ``majority_vote`` — ±1 label columns → majority (ties → -1 normal, the
  conservative default matching the reference's anomaly-is-positive framing).
* ``stack_meta_features`` — per-row score columns from several scorers as a
  meta-feature table (the ensemble_stacking.py:81-87 shape), ready for any
  downstream learner or threshold rule.

Pure column expressions — one projection, no shuffle beyond what the input
scorers already did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def majority_vote(df: DataFrame, label_cols: list[str], out_col: str = "vote") -> DataFrame:
    total = None
    for c in label_cols:
        t = F.when(F.col(c) == 1, 1).otherwise(0)
        total = t if total is None else total + t
    vote = F.when(total * 2 > len(label_cols), 1).otherwise(-1)
    return df.withColumn(out_col, vote)


def stack_meta_features(
    df: DataFrame, keys: list[str], score_cols: list[str], prefix: str = "mf_"
) -> DataFrame:
    cols = [F.col(c).alias(f"{prefix}{c}") for c in score_cols]
    return df.select(*keys, *cols)


def stacking_ensemble(
    df: DataFrame,
    order_col: str,
    feature_cols: list[str],
    truth_col: str,
    keys: list[str] | None = None,
    train_frac: float = 0.8,
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> DataFrame:
    """Second-stage stacking meta-learner
    (/root/reference/ensemblation/ensemble_stacking.py:81-129): base-scorer
    outputs become the meta-feature matrix, a logistic-regression classifier
    trains on the positional train split and predicts ±1 on the test split.

    Spark-first shape: ``pyspark.ml`` LogisticRegression over a
    VectorAssembler of the meta-feature columns — distributed fit (the
    reference fits sklearn in-process on a saved TSV, S9). The split is the
    deterministic positional 80/20 (operators/splits.fraction_split), never
    randomSplit. Returns the TEST rows with ``tag_pred`` (+1 anomaly / -1).
    Deterministic: LBFGS on identical ordered input converges identically.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from .splits import fraction_split

    keys = keys or []
    train, test = fraction_split(df, order_col, train_frac, keys=keys or None)
    asm = VectorAssembler(inputCols=feature_cols, outputCol="_feat")
    lab = F.when(F.col(truth_col) == 1, 1.0).otherwise(0.0)
    lr = LogisticRegression(
        featuresCol="_feat", labelCol="_lab", maxIter=max_iter, regParam=reg_param
    )
    model = lr.fit(asm.transform(train.withColumn("_lab", lab)))
    pred = model.transform(asm.transform(test.withColumn("_lab", lab)))
    return pred.withColumn(
        "tag_pred", F.when(F.col("prediction") == 1.0, 1).otherwise(-1)
    ).drop("_feat", "_lab", "rawPrediction", "probability", "prediction")
