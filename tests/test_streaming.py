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
