"""spark-submit entrypoint (north rule: launched with spark-submit --py-files).

    zip -r mtsad_spark.zip mtsad_spark
    spark-submit --py-files mtsad_spark.zip -m ... \
        [or: spark-submit --py-files mtsad_spark.zip run_pipeline.py ...]
    python -m mtsad_spark --input <parquet|iceberg table> --output <dir> [...]

Runs the checkpointed rollup + scoring pipeline (plans/pipeline.py) on the
given sequences table. On a cluster, master/executors come from spark-submit
conf; locally it falls back to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="mtsad_spark")
    ap.add_argument("--input", required=True, help="sequences parquet dir or table name")
    ap.add_argument("--output", required=True, help="pipeline base dir (checkpoints + tiers)")
    ap.add_argument("--ts-col", default="ingest_ts")
    ap.add_argument("--val-col", default="n_tok")
    ap.add_argument("--keys", default="source", help="comma-separated key columns")
    ap.add_argument("--zscore-w", type=int, default=30)
    ap.add_argument("--zscore-k", type=float, default=3.0)
    ap.add_argument("--ewma-alpha", type=float, default=0.2)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--synthesize-rows", type=int, default=0,
                    help="generate the input deterministically instead of reading it")
    args = ap.parse_args()

    from mtsad_spark.plans.pipeline import RollupPipeline
    from mtsad_spark.session import get_spark

    spark = get_spark("mtsad-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.synthesize_rows:
        from mtsad_spark.fixtures import sequences

        seq = sequences(spark, n_rows=args.synthesize_rows, n_minutes=10_080, with_tokens=False)
    elif "/" in args.input:
        seq = spark.read.parquet(args.input)
    else:
        seq = spark.read.table(args.input)

    pipe = RollupPipeline(
        spark,
        args.output,
        keys=args.keys.split(","),
        ts_col=args.ts_col,
        val_col=args.val_col,
        zscore_w=args.zscore_w,
        zscore_k=args.zscore_k,
        ewma_alpha=args.ewma_alpha,
    )
    out = pipe.run(seq, resume=not args.no_resume)
    metrics = [r.asDict() for r in out["metrics"].collect()]
    print(json.dumps({"run_id": pipe.run_id, "stages": metrics}, default=str))


if __name__ == "__main__":
    main()
