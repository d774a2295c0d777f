"""Deterministic synthetic fixtures (FIXTURES.md F1-F3).

F1 ``sequences`` is generated fully distributed: ``spark.range(n)`` + JVM-side
hash expressions (xxhash64), so the same (seed, n) yields bitwise-identical rows
at any parallelism level and any partition count — no driver-side data, no
Python in the hot path. This is the sandbox stand-in for the 10^12-row Iceberg
table (BASELINE.json input_hint): at scale the generator is replaced by
``spark.read.table(...)`` behind the same column contract.

F2 ``mts2_wave`` mirrors the reference's synthetic MTS² generator semantics
(/root/reference/util/gen_data.py:69-131): base sin waves + seeded noise with 3
injected anomaly windows of length size/20 tagged +1 (anomaly) / -1 (normal,
README.md:6-7). Injection positions are fixed for determinism, like the
commented fixed-insert variant (gen_data.py:102-113).

F3 ``uts_plain`` is the 1-column float series analog of the reference's
``np.loadtxt`` inputs (statistication/moving_average.py:145).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
EPOCH = "2024-01-01 00:00:00"
VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "forums"]  # web ≈ 60% (skew)


def sequences(
    spark: SparkSession,
    n_rows: int,
    n_minutes: int = 240,
    seed: int = SEED,
    with_tokens: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """F1: (doc_id, tokens, n_tok, source, ingest_ts) — pure function of row idx.

    - ``source`` Zipf-skewed: web 60 / books 15 / code 10 / wiki 10 / forums 5.
    - ``n_tok`` = 32 + mix(i) % 480, with a heavy-tail 4x spike on ~1% of the
      hot source's rows (exercises skew + salting).
    - ``ingest_ts`` = EPOCH + minute(i) + jitter-seconds; for source='code'
      every minute with m % 7 == 3 is remapped to m+1, leaving genuinely empty
      minutes (exercises LOCF/linear gap-fill).
    - ``tokens`` = deterministic array<int> of length n_tok, values [0, VOCAB).
    """
    df = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    h = lambda salt: F.abs(F.xxhash64(i, F.lit(seed), F.lit(salt)))  # noqa: E731

    src_pick = h(1) % 100
    source = (
        F.when(src_pick < 60, "web")
        .when(src_pick < 75, "books")
        .when(src_pick < 85, "code")
        .when(src_pick < 95, "wiki")
        .otherwise("forums")
    )
    base_tok = (F.lit(32) + (h(2) % 480)).cast("int")
    spike = (source == "web") & ((h(3) % 100) == 0)
    n_tok = F.when(spike, base_tok * 4).otherwise(base_tok).cast("int")

    minute = (i % n_minutes).cast("long")
    gap = (F.col("source") == "code") & (minute % 7 == 3)
    df = (
        df.withColumn("source", source)
        .withColumn("n_tok", n_tok)
        .withColumn("minute_idx", F.when(gap, minute + 1).otherwise(minute))
        .withColumn("jitter_s", (h(4) % 60).cast("long"))
        .withColumn(
            "ingest_ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(EPOCH).cast("timestamp"))
                + F.col("minute_idx") * 60
                + F.col("jitter_s")
            ),
        )
        .withColumn("doc_id", F.format_string("doc-%010d", i))
    )
    if with_tokens:
        # element j of row i = |xxhash64(i, seed, 7, j)| % VOCAB — JVM-side,
        # no Python; array length n_tok.
        df = df.withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda j: (F.abs(F.xxhash64(i, F.lit(seed), F.lit(7), j)) % VOCAB).cast("int"),
            ),
        )
    else:
        df = df.withColumn("tokens", F.array().cast("array<int>"))
    return df.select("doc_id", "tokens", "n_tok", "source", "ingest_ts")


def mts2_wave(size: int = 8760, n_dims: int = 1, seed: int = SEED) -> pd.DataFrame:
    """F2: MTS² anomaly wave — pandas frame (t, v0..v{d-1}, tag).

    Semantics of /root/reference/util/gen_data.py:69-131: hourly index, base
    signal sin(4πx)+sin(2πx)+N(0,0.1); 3 anomaly windows of length size//20 at
    fixed offsets get a sin(10πx) rider and tag=+1; elsewhere tag=-1.
    """
    rng = np.random.RandomState(seed)
    t = pd.date_range("2010-01-01 10:00:00", periods=size, freq="h")
    # reference time axis: arange step 0.01 (gen_data.py:83) ⇒ base wave1
    # sin(4πt)+1 has a 50-sample period; rider sin(10πt') a 20-sample period
    x = np.arange(size, dtype=np.float64) * 0.01
    win = max(int(round(size / 20)), 4)  # ANORMAL_PERCENT=20 (gen_data.py:29)
    starts = [int(size * f) for f in (0.15, 0.5, 0.8)]
    tag = np.full(size, -1, dtype=np.int32)
    rider = np.sin(10 * np.pi * np.arange(win, dtype=np.float64) * 0.01)
    cols: dict[str, np.ndarray] = {}
    for d in range(n_dims):
        phase = d * 0.37
        v = np.sin(2 * 2 * np.pi * (x + phase)) + 1 + np.sin(2 * np.pi * (x + phase))
        v = v + rng.normal(0.0, 0.1, size)
        for s in starts:
            end = min(s + win, size)
            v[s:end] = v[s:end] + rider[: end - s]
        cols[f"v{d}"] = v
    for s in starts:
        tag[s : min(s + win, size)] = 1
    out = pd.DataFrame({"t": t, **cols, "tag": tag})
    return out


def mts2_wave_df(spark: SparkSession, size: int = 8760, n_dims: int = 1, seed: int = SEED) -> DataFrame:
    pdf = mts2_wave(size=size, n_dims=n_dims, seed=seed)
    return spark.createDataFrame(pdf)


def uts_plain(size: int = 1000, seed: int = SEED, kind: str = "sine") -> pd.DataFrame:
    """F3: univariate series (idx, value) for operator golden tests."""
    rng = np.random.RandomState(seed)
    x = np.arange(size, dtype=np.float64)
    if kind == "sine":
        v = np.sin(2 * np.pi * x / 50.0) + rng.normal(0, 0.25, size)
    elif kind == "constant":
        v = np.full(size, 3.25)
    elif kind == "step":
        v = np.where(x < size // 2, 1.0, 10.0) + rng.normal(0, 0.01, size)
    elif kind == "monotonic":
        v = x * 0.5 + rng.normal(0, 0.1, size)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return pd.DataFrame({"idx": np.arange(size, dtype=np.int64), "value": v})


def uts_plain_df(spark: SparkSession, size: int = 1000, seed: int = SEED, kind: str = "sine") -> DataFrame:
    return spark.createDataFrame(uts_plain(size=size, seed=seed, kind=kind))
