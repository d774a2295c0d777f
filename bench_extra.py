"""Extra benchmarks for the optimization round (guide §1.4): stage-isolated
noop-sink timings for the expensive pipelines, separate from the FROZEN
bench.py. Each stage is labeled (setJobDescription) and timed end-to-end
with the noop writer so the numbers measure computation, not the sink.

Usage: python bench_extra.py [minhash|simhash|knn|queries] ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from mtsad_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def profile_minhash(spark, sf_dir: str) -> dict[str, float]:
    """Per-stage cost of the minhash near-dup pipeline. Stages are timed
    cumulatively (each includes its upstream lineage) AND incrementally with
    persisted upstreams, so the delta is the stage's own cost."""
    from mtsad_spark.driver_queries import _docs
    from mtsad_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    sc = spark.sparkContext
    out: dict[str, float] = {}
    docs = _docs(spark, sf_dir)

    sc.setJobDescription("minhash: 1 shingles")
    sh = word_shingles(docs, "doc_id", "text", k=3)
    out["shingles"] = noop(sh)
    sh = sh.persist()
    sh.count()

    sc.setJobDescription("minhash: 2 signatures (shingles hot)")
    sigs = minhash_signatures(sh, "doc_id", 64)
    out["signatures"] = noop(sigs)

    sc.setJobDescription("minhash: 3 lsh pairs (shingles hot)")
    cand = lsh_candidate_pairs(sigs, "doc_id", 64, 16)
    out["lsh_pairs"] = noop(cand)
    cand = cand.persist()
    cand.count()

    sc.setJobDescription("minhash: 4 jaccard verify (shingles+pairs hot)")
    jac = jaccard_pairs(cand, sh, "doc_id", 0.5)
    out["jaccard_verify"] = noop(jac)

    sc.setJobDescription(None)
    n_docs = docs.count()
    out["n_docs"] = n_docs
    out["n_shingle_rows"] = sh.count()
    out["n_cand_pairs"] = cand.count()
    sh.unpersist()
    cand.unpersist()
    return out


def profile_queries(spark, sf_dir: str, names: list[str], trials: int = 3) -> dict:
    from mtsad_spark.driver_queries import queries as dq

    qs = dq()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(trials):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {n}")
            samples[n].append(noop(qs[n](spark, sf_dir)))
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return {"min": {n: min(s) for n, s in samples.items()}, "spread": samples}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "mtsad-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg(F.sum("id")).collect()  # JIT warmup

    what = sys.argv[1:] or ["minhash"]
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}
    for w in what:
        if w == "minhash":
            out["minhash"] = profile_minhash(spark, sf_dir)
        else:
            out[w] = profile_queries(spark, sf_dir, [w])
    from mtsad_spark.plans.scope import release_scoped

    release_scoped()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
