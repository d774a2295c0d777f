"""Headline benchmark — one JSON line per the driver contract.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end with the noop
writer (full computation, no driver collect). The flagship sequence-rollup
pipeline additionally reports sequences/sec (the BASELINE.json metric) over a
deterministically synthesized tokenized table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from mtsad_spark.session import get_spark  # noqa: E402

# 48M rows: at 16M the input-size-independent downstream job (~2.5 s of
# shuffle rounds + Arrow worker latency over the 10k-bucket rollup) was ~45%
# of flagship wall, understating scan+rollup throughput ~6× vs the 1.536B-row
# scaling run of the SAME pipeline (BENCH/BASELINE.md). 48M keeps the bench
# under ~15 s/trial while the scan dominates; seq_rows rides in the JSON.
SEQ_ROWS = int(os.environ.get("BENCH_SEQ_ROWS", "48000000"))
SEQ_MINUTES = 10_080  # 7 days of 1m buckets


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ensure_seq_parquet(spark, n_rows: int) -> str:
    """Materialize the tokenized table ONCE (untimed) so the flagship
    measures the north-star dataflow — SCAN parquet → rollup → score — not
    fixture synthesis; identical semantics to bench_scaling/bench_job."""
    path = os.environ.get("BENCH_SEQ_DIR", f"/tmp/mtsad-bench-seq-{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from mtsad_spark.fixtures import sequences

        sequences(spark, n_rows=n_rows, n_minutes=SEQ_MINUTES, with_tokens=False).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def seq_pipeline(spark, input_path: str) -> None:
    """North-star pipeline over the tokenized table: scan → 3-tier exact
    rollup cascade → LOCF gap-fill → z-score + EWMA scoring → Gorilla pack.

    Two jobs: the data-proportional scan→partials (persisted once, like the
    checkpointed pipeline), then ONE action covering every downstream output
    via a union of commutative content hashes (serialized per-output writes
    pay fixed job latency five times over — measured in bench_scaling)."""
    from functools import reduce

    from mtsad_spark.bench_job import content_hash_row
    from mtsad_spark.functions.gorilla import pack_rollup
    from mtsad_spark.operators.gapfill import gap_fill
    from mtsad_spark.operators.rollup import rollup_tiers
    from mtsad_spark.operators.scoring import ewma_residual_chunked, sliding_zscore

    seq = spark.read.parquet(input_path)
    finalized, partials = rollup_tiers(seq, "ingest_ts", "n_tok", ["source"])
    partials["1m"].persist().count()  # job 1: raw scan+aggregate, once
    m1 = finalized["1m"]
    filled = gap_fill(m1, ["source"], "1m", ["mean"], method="locf")
    outputs = {
        "zscore": sliding_zscore(filled, ["source"], "bucket_ts", "mean", w=30, k=3.0),
        "ewma": ewma_residual_chunked(
            m1.select("source", "bucket_ts", "mean"), ["source"], "bucket_ts", "mean", alpha=0.2
        ),
        "gorilla": pack_rollup(m1, ["source"], "mean", chunk="day"),
        "rollup_1h": finalized["1h"],
        "rollup_1d": finalized["1d"],
    }
    reduce(
        lambda a, b: a.unionByName(b),
        [content_hash_row(df, n) for n, df in outputs.items()],
    ).collect()  # job 2: all downstream lineages, one action
    partials["1m"].unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 16m splits: sf0.1 tables and the 216 MB flagship parquet are otherwise
    # packed into 2-3 scan tasks by the 128m default (measured 2× slower)
    spark = get_spark(
        "mtsad-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM/codegen so per-query numbers measure the engine, not JIT
    spark.range(1_000_000).agg(F.sum("id")).collect()

    from mtsad_spark.driver_queries import queries as dq

    qs = dq()
    headline = [
        "rollup_1m",
        "rollup_1h_composed",
        "rollup_1d_composed",
        "gapfill_locf_1h",
        "gapfill_linear_1h",
        "gorilla_roundtrip_1h",
        "zscore_roll24_1h",
        "ewma_scores_1h",
        "percentile_sweep",
        "tpch_q1",
        "top_orders_by_revenue",
        "mktsegment_totals",
        "dedup_exact_docs",
        "docs_quality",
        "minhash_near_dups_docs",
        "simhash_docs",
        "knn_cosine_top3",
    ]
    # this host's CPU grant swings ~2-3× by the hour (BENCH/BASELINE.md
    # calibration) — each query takes the MIN of TRIALS runs so the recorded
    # number measures the engine, not the noisy neighbor
    # min-of-3 by default: the host CPU grant swings 2-5x WITHIN a run
    # (BENCH/BASELINE.md calibration); with 2 trials a mid-run slow window
    # can hit both attempts of a heavy query (measured: seq_pipeline 12.8s
    # at 2 trials vs 6.0s at 3 in the same session), reading as a false
    # regression. A third attempt usually lands one in a normal window.
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    # ROUND-ROBIN trials (VERDICT r05 #6): trial t runs every query once
    # before any query's trial t+1, so a multi-minute bad host window can't
    # poison all N back-to-back attempts of one heavy query — each query
    # gets attempts spread across the whole run's time span. Per-query
    # trial lists ride in the JSON as `spread` so a reader can see the
    # noise floor behind each min.
    samples: dict[str, list[float]] = {name: [] for name in headline}
    for _ in range(trials):
        for name in headline:
            t0 = time.time()
            run_noop(qs[name](spark, sf_dir))
            samples[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    timings: dict[str, float] = {n: min(s) for n, s in samples.items()}

    # flagship sequences pipeline (BASELINE.json metric: sequences/sec);
    # input parquet materialized untimed — the metric is scan→rollup→score.
    # min-of-5 regardless of BENCH_TRIALS (VERDICT r05 #1): the flagship is
    # the north-star metric and the one whose window noise has twice read
    # as a false regression.
    seq_path = ensure_seq_parquet(spark, SEQ_ROWS)
    # untimed warm read: the first scan otherwise measures cold page cache
    # (measured 43s cold vs 8s warm for the same plan on this host)
    spark.read.parquet(seq_path).write.format("noop").mode("overwrite").save()
    seq_trials = max(trials, int(os.environ.get("BENCH_SEQ_TRIALS", "5")))
    samples["seq_pipeline"] = []
    for _ in range(seq_trials):
        t0 = time.time()
        seq_pipeline(spark, seq_path)
        samples["seq_pipeline"].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    timings["seq_pipeline"] = min(samples["seq_pipeline"])
    seq_s = timings["seq_pipeline"]

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": samples,  # all trials per query, run order — the noise floor
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "seq_rows": SEQ_ROWS,
        "seq_throughput_rows_per_sec": round(SEQ_ROWS / seq_s, 1),
        "cpus": cpus,
    }
    # surface the committed N->4N scaling measurement (tools/bench_scaling.py)
    try:
        import re

        md = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")).read()
        m = re.search(r"efficiency ([0-9.]+) raw", md)
        if m:
            out["scaling_efficiency_n_to_4n"] = float(m.group(1))
            out["scaling_evidence"] = "BENCH/BASELINE.md"
        m = re.search(r"raw / ([0-9.]+)\s*\ncapacity-normalized", md)
        if m:
            out["scaling_efficiency_capacity_normalized"] = float(m.group(1))
        # the same pipeline's throughput on the 1.536B-row scaling input —
        # the fixed downstream job cost (~2.5 s of shuffle/NumPy-worker
        # latency, input-size-independent) understates the engine by ~6× at
        # the small flagship input, so the amortized number rides along
        m = re.search(r"\| local\[32\] \| [0-9.]+ \| ([0-9,]+) \|", md)
        if m:
            out["seq_throughput_at_1536m_rows_per_sec"] = float(m.group(1).replace(",", ""))
    except OSError:
        pass
    # run-exit hook (ADVICE r05): drain the last query's scoped persists
    from mtsad_spark.plans.scope import release_scoped

    release_scoped()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
