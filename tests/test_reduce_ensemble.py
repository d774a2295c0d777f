"""PCA→UTS reduction, scorer ensembles, salted-rollup equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_pca_to_uts_vs_numpy(spark):
    rng = np.random.RandomState(12)
    # strongly correlated 3-d data with a dominant direction
    base = rng.randn(500)
    pdf = pd.DataFrame(
        {
            "idx": range(500),
            "v0": base + rng.randn(500) * 0.1,
            "v1": 2 * base + rng.randn(500) * 0.1,
            "v2": -base + rng.randn(500) * 0.1,
        }
    )
    from mtsad_spark.operators.reduce_dims import pca_to_uts

    df = spark.createDataFrame(pdf)
    out = pca_to_uts(df, ["v0", "v1", "v2"]).orderBy("idx").toPandas()
    # numpy oracle: z-norm (ddof=0) then first PC projection
    x = pdf[["v0", "v1", "v2"]].values
    z = (x - x.mean(0)) / x.std(0)
    _, _, vt = np.linalg.svd(z - z.mean(0), full_matrices=False)
    pc = vt[0]
    if abs(pc.min()) > abs(pc.max()):
        pc = -pc
    want = z @ pc
    got = out["uts"].values
    # PCA sign pinned; allow global sign flip in the comparison anyway
    agree = min(np.abs(got - want).max(), np.abs(got + want).max())
    assert agree < 1e-6
    # the 1-d projection preserves the dominant structure
    assert abs(np.corrcoef(np.abs(got), np.abs(base))[0, 1]) > 0.9


def test_majority_vote_and_stack(spark):
    pdf = pd.DataFrame(
        {
            "id": range(6),
            "l1": [1, 1, -1, -1, 1, -1],
            "l2": [1, -1, -1, -1, 1, 1],
            "l3": [-1, 1, -1, 1, 1, -1],
            "s1": [0.9, 0.8, 0.1, 0.2, 0.95, 0.3],
        }
    )
    from mtsad_spark.operators.ensemble import majority_vote, stack_meta_features

    df = spark.createDataFrame(pdf)
    out = majority_vote(df, ["l1", "l2", "l3"]).orderBy("id").toPandas()
    assert list(out["vote"]) == [1, 1, -1, -1, 1, -1]
    meta = stack_meta_features(df, ["id"], ["s1"]).toPandas()
    assert list(meta.columns) == ["id", "mf_s1"]


def test_salted_rollup_equals_plain(spark, seq_df):
    from mtsad_spark.operators.rollup import rollup_partials, salted_rollup_partials

    plain = (
        rollup_partials(seq_df, "ingest_ts", "n_tok", ["source"], "1m")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    salted = (
        salted_rollup_partials(seq_df, "ingest_ts", "n_tok", ["source"], "doc_id", "1m", n_salt=7)
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(plain) == len(salted)
    for c in plain.columns:
        assert (plain[c].values == salted[c].values).all(), c
