"""SparkSession construction with the engine's canonical configuration.

All knobs here are public Spark SQL configs. The defaults are sized for the
sandbox (local[N] single JVM); on a real cluster the same builder is used by
``spark-submit --py-files`` with master/cores supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that matter for this engine, applied identically at every
# parallelism level so plans (and float results) are reproducible.
ENGINE_CONFS: dict[str, str] = {
    # Arrow transport for every pandas UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Generated-class cache sized to the engine's query surface (r7, guide
    # §1.2 per-task work): the default 100-entry codegen cache thrashes when
    # a session runs the multi-query registry — every re-run of a query whose
    # classes were evicted pays multi-second janino recompilation of its
    # widest generated operators (the 64-min-agg signature stage alone costs
    # seconds to compile). Measured on a 10-query round-robin at sf1.0:
    # sum-of-mins 16.5 s → 12.1 s from this setting alone. Not a local-mode
    # tune: any long-lived session or thrift/job server replaying a query mix
    # hits the same eviction wall; memory cost is bounded (a few thousand
    # compiled classes).
    "spark.sql.codegen.cache.maxEntries": "5000",
    # Session timezone pinned: bucket boundaries must not depend on host TZ.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # ANSI off: engine relies on permissive casts like the reference's pandas.
    "spark.sql.ansi.enabled": "false",
    # Single-JVM local mode: the driver heap IS the executor heap. 16g on
    # the 128 GiB sandbox measured 5-10% faster across the full headline
    # bench than 8g in order-controlled A/B pairs (less GC across the
    # 18-query × 3-trial mix); still env-overridable, and on a real cluster
    # the submitter sizes the driver explicitly.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "mtsad-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — one shuffle partition
    per core keeps the partial→final rollup agg a single wave.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[k] / local[*] → k / cpus
        inner = master.split("[")[-1].rstrip("]") if "[" in master else str(cpus)
        shuffle_partitions = cpus if inner == "*" else int(inner)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.default.parallelism", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
