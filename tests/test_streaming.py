"""Streaming 1m rollup == batch 1m rollup on the same data (availableNow
drain over static parquet; append mode emits only watermark-closed windows,
so the comparison drops the final open window per key)."""

from __future__ import annotations

import pytest


def test_streaming_rollup_matches_batch(spark, seq_df, tmp_path):
    from mtsad_spark.operators.rollup import rollup_partials
    from mtsad_spark.streaming.rollup_stream import run_available_now, streaming_rollup_1m

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    seq_df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(seq_df.schema).parquet(src)
    q = run_available_now(
        streaming_rollup_1m(stream, "ingest_ts", "n_tok", ["source"]), out, ck
    )
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        rollup_partials(seq_df, "ingest_ts", "n_tok", ["source"], "1m")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    # append mode withholds windows the watermark hasn't closed: every emitted
    # window must match batch exactly; at most a tail sliver may be withheld
    merged = want.merge(got, on=["source", "bucket_ts"], suffixes=("_b", "_s"))
    assert len(merged) == len(got)
    for c in ("cnt", "s1", "s2", "vmin", "vmax"):
        assert (merged[f"{c}_b"].values == merged[f"{c}_s"].values).all(), c
    assert len(got) >= len(want) - 5 * 3  # ≤ a few open windows per source


def test_stateful_streaming_ewma_matches_batch(spark, tmp_path):
    """applyInPandasWithState EWMA over an availableNow drain == the batch
    kernel (single-batch case; the recursion state lives in the state store)."""
    import numpy as np
    from pyspark.sql import functions as F

    from mtsad_spark.fixtures import sequences
    from mtsad_spark.operators.rollup import rollup_tiers
    from mtsad_spark.operators.scoring import ewma_residual
    from mtsad_spark.streaming.stateful_ewma import streaming_ewma

    seq = sequences(spark, 5_000, 120, with_tokens=False)
    fin, _ = rollup_tiers(seq, "ingest_ts", "n_tok", ["source"])
    m1 = fin["1m"].select(
        "source", F.col("bucket_ts").alias("ts"), F.col("mean").alias("value")
    ).cache()
    src = str(tmp_path / "src")
    m1.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(m1.schema).parquet(src)
    q = (
        streaming_ewma(stream, alpha=0.25)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    want = (
        ewma_residual(m1, ["source"], "ts", "value", alpha=0.25)
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert np.allclose(got["ewma_level"].values, want["ewma_level"].values, rtol=1e-12)
    assert np.allclose(got["resid"].values, want["resid"].values, rtol=1e-12, atol=1e-12)
