"""Single-process scaling-bench job: run the full sequence pipeline at a given
core count over a FIXED parquet input, print one JSON line with wall time,
throughput, and an order-insensitive output hash (determinism evidence).

Invoked by tools/bench_scaling.py in separate processes (local[8] vs
local[32] — the sandbox proxy for N vs 4N executors per BASELINE.md §2).

    python -m mtsad_spark.bench_job --cores 8 --input /tmp/seq --rows 8000000
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from mtsad_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True, help="parquet dir of sequences")
    ap.add_argument("--generate-rows", type=int, default=0, help="generate input first")
    ap.add_argument("--minutes", type=int, default=10_080)
    args = ap.parse_args()

    spark = get_spark(
        f"scaling-bench-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate_rows:
        from mtsad_spark.fixtures import sequences

        seq = sequences(
            spark, n_rows=args.generate_rows, n_minutes=args.minutes, with_tokens=False,
            partitions=64,
        )
        seq.write.mode("overwrite").parquet(args.input)
        print(json.dumps({"generated": args.generate_rows, "path": args.input}))
        return

    from mtsad_spark.functions.gorilla import pack_rollup
    from mtsad_spark.operators.gapfill import gap_fill
    from mtsad_spark.operators.rollup import rollup_tiers
    from mtsad_spark.operators.scoring import ewma_residual_chunked, sliding_zscore

    # JVM/codegen warm-up outside the timed section
    spark.range(1_000_000).agg(F.sum("id")).collect()

    seq = spark.read.parquet(args.input)
    n_rows = seq.count()

    t0 = time.time()
    finalized, partials = rollup_tiers(seq, "ingest_ts", "n_tok", ["source"])
    partials["1m"].persist()  # one raw scan; downstream is rollup-sized
    m1 = finalized["1m"]
    filled = gap_fill(m1, ["source"], "1m", ["mean"], method="locf")
    z = sliding_zscore(filled, ["source"], "bucket_ts", "mean", w=30, k=3.0)
    e = ewma_residual_chunked(
        m1.select("source", "bucket_ts", "mean"), ["source"], "bucket_ts", "mean", alpha=0.2
    )
    packed = pack_rollup(m1, ["source"], "mean", chunk="day")
    for df in (z, e, packed, finalized["1h"], finalized["1d"]):
        df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    # determinism evidence: commutative content hash of every tier's points
    hashes = {}
    for tier in ("1m", "1h", "1d"):
        d = finalized[tier]
        h = F.xxhash64(*[F.col(c).cast("string") for c in d.columns])
        hashes[tier] = d.select(h.alias("h")).agg(F.expr("bit_xor(h)")).collect()[0][0]

    print(
        json.dumps(
            {
                "cores": args.cores,
                "rows": n_rows,
                "wall_s": round(wall, 3),
                "rows_per_sec": round(n_rows / wall, 1),
                "tier_hashes": hashes,
            }
        )
    )


if __name__ == "__main__":
    main()
