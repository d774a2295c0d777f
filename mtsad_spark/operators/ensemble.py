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
