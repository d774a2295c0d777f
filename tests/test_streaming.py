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


def test_streaming_sessionize_matches_batch_and_classic_algebra(spark, tmp_path):
    """session_window sessions from an availableNow drain == the same
    expression in batch == the classic cumulative-sum-of-boundaries algebra
    (with the matching >= boundary predicate) on crafted multi-session data."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mtsad_spark.streaming.sessionize_stream import sessionize, streaming_sessionize

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for u in range(6):
        t = base + pd.Timedelta(minutes=7 * u)
        for s in range(3):  # 3 sessions per user
            for i in range(4 + (u + s) % 3):  # 4-6 events, minutes apart
                rows.append((u, t))
                t += pd.Timedelta(minutes=3 + ((u + i) % 5))
            t += pd.Timedelta(minutes=45 + s)  # inactivity gap > 30m
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    df = spark.createDataFrame(pdf)

    batch = sessionize(df).toPandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    assert (batch.groupby("user_id").size() == 3).all()

    # classic algebra with the session_window-matching >= boundary
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    bound = F.when(
        prev.isNull() | (F.col("ts") >= prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classic = (
        df.withColumn("_b", bound)
        .withColumn("sid", F.sum("_b").over(cum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("first_ev"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ev"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas().sort_values(["user_id", "first_ev"]).reset_index(drop=True)
    )
    assert (batch["session_start"].values == classic["first_ev"].values).all()
    assert (batch["session_end"].values == classic["end_ev"].values).all()
    assert (batch["n_events"].values == classic["n_events"].values).all()

    # streaming drain: append mode emits only watermark-closed sessions;
    # every emitted session must equal its batch twin
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ck = str(tmp_path / "sess_ck")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_sessionize(stream, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) > 0
    merged = batch.merge(
        got, on=["user_id", "session_start"], suffixes=("_b", "_s")
    )
    assert len(merged) == len(got)  # every emitted session exists in batch
    assert (merged["session_end_b"].values == merged["session_end_s"].values).all()
    assert (merged["n_events_b"].values == merged["n_events_s"].values).all()


def test_streaming_exact_dedup_first_arrival_wins(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedup: an availableNow drain over a
    corpus with planted duplicates keeps exactly one row per content hash
    (all dups inside the watermark window), matching batch drop_exact_dups
    cardinality per hash."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mtsad_spark.streaming.dedup_stream import streaming_drop_exact_dups

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(300):
        text = f"document body {i % 100}"  # 100 distinct texts, 3 copies each
        rows.append((i, text, base + pd.Timedelta(seconds=13 * i)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ingest_ts"])
    src = str(tmp_path / "dd_src")
    out = str(tmp_path / "dd_out")
    ck = str(tmp_path / "dd_ck")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id LONG, text STRING, ingest_ts TIMESTAMP"
    ).parquet(src)
    q = (
        streaming_drop_exact_dups(stream, "text", "ingest_ts", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 100  # one survivor per distinct text
    assert got["content_hash"].nunique() == 100
    assert set(got["text"]) == set(pdf["text"])


def test_streaming_continuous_aggregate_matches_batch(spark, tmp_path):
    """foreachBatch ingest maintaining the stored tier tables: an
    availableNow drain over multiple micro-batches must leave the tier
    tables bitwise-equal to one batch rollup of the same rows, and a
    replayed batch id must NOT double-merge (the transactional-sink
    contract)."""
    from pyspark.sql import functions as F

    from mtsad_spark.operators.rollup import reaggregate, rollup_partials
    from mtsad_spark.plans.continuous import ContinuousAggregate
    from mtsad_spark.streaming.continuous_stream import StreamingContinuousAggregate

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .select("event_type", "ts", "cents")
    )
    src = str(tmp_path / "src")
    # several files → several availableNow micro-batches with maxFilesPerTrigger
    ev.repartition(4).write.parquet(src)
    agg = ContinuousAggregate(
        spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents"
    )
    sink = StreamingContinuousAggregate(agg)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sink.start(stream, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert len(sink._applied()) >= 2, "expected multiple micro-batches"

    full = {"1m": rollup_partials(ev, "ts", "cents", ["event_type"], "1m")}
    full["1h"] = reaggregate(full["1m"], ["event_type"], "1h")
    full["1d"] = reaggregate(full["1h"], ["event_type"], "1d")
    for tier in ("1m", "1h", "1d"):
        got = agg.read_partials(tier).toPandas().sort_values(
            ["event_type", "bucket_ts"]).reset_index(drop=True)
        want = full[tier].toPandas().sort_values(
            ["event_type", "bucket_ts"]).reset_index(drop=True)
        assert len(got) == len(want), tier
        for c in ("cnt", "s1", "s2", "vmin", "vmax"):
            assert (got[c].values == want[c].values).all(), (tier, c)

    # replaying an applied batch id is a no-op
    before = agg.read_partials("1m").agg(F.sum("cnt")).first()[0]
    sink(ev, batch_id=sorted(sink._applied())[0])
    after = agg.read_partials("1m").agg(F.sum("cnt")).first()[0]
    assert before == after


def test_token_heavy_hitters_exact(spark):
    """Per-key heavy hitters: exact counts/ranks vs a pandas recompute,
    deterministic tie-break on token id."""
    from mtsad_spark.operators.rollup import token_heavy_hitters

    rows = [
        ("a", [1, 1, 1, 2, 2, 3, 7, 7, 7, 7]),
        ("a", [2, 2, 3, 3]),
        ("b", [5, 5, 6]),
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    out = (
        token_heavy_hitters(df, ["source"], "tokens", k=3)
        .toPandas().sort_values(["source", "rank"]).reset_index(drop=True)
    )
    # a: 7×4, 2×4 (tie → smaller token first... counts: 1:3, 2:4, 3:3, 7:4)
    a = out[out["source"] == "a"]
    assert list(a["token"]) == [2, 7, 1]  # cnt 4,4 (tie→2 first), then 1 vs 3 tie→1
    assert list(a["cnt"]) == [4, 4, 3]
    assert list(a["rank"]) == [1, 2, 3]
    assert abs(a["support"].iloc[0] - 4 / 14) < 1e-12
    b = out[out["source"] == "b"]
    assert list(b["token"]) == [5, 6] and list(b["cnt"]) == [2, 1]


def test_streaming_continuous_aggregate_rejects_foreign_checkpoint(spark, tmp_path):
    """Batch ids are only unique PER checkpoint: a fresh checkpoint (ids
    restart at 0) pointed at an existing table must be refused loudly, not
    silently dedup real batches against the old stream's ids."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mtsad_spark.plans.continuous import ContinuousAggregate
    from mtsad_spark.streaming.continuous_stream import StreamingContinuousAggregate

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .select("event_type", "ts", "cents")
    )
    agg = ContinuousAggregate(spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents")
    sink = StreamingContinuousAggregate(agg, checkpoint=str(tmp_path / "ck1"))
    sink(ev, batch_id=0)
    sink2 = StreamingContinuousAggregate(agg, checkpoint=str(tmp_path / "ck2"))
    with _pytest.raises(ValueError, match="checkpoint"):
        sink2(ev, batch_id=0)


class _FakeIcebergIO:
    """In-memory stand-in for streaming.continuous_stream.IcebergTierIO (no
    Iceberg runtime in this sandbox): models exactly the two catalog
    guarantees the exactly-once sink relies on — (1) overwrite_partitions
    replaces ONLY the _day values present in the frame, and (2) the data
    replacement and the snapshot-summary batch id land ATOMICALLY (one
    commit).
    Everything above the seam (merge algebra, per-tier replay guard, crash
    re-delivery) is the real production code."""

    def __init__(self, spark):
        self.spark = spark
        self.days = {}     # tier -> {iso_day: pandas rows}
        self.snaps = {}    # tier -> [(batch_id, checkpoint) | None, ...] newest last
        self.schema = {}

    def exists(self, tier):
        return tier in self.days

    def read(self, tier):
        import pandas as pd

        parts = list(self.days[tier].values())
        return self.spark.createDataFrame(
            pd.concat(parts, ignore_index=True), self.schema[tier]
        )

    def overwrite_partitions(self, df, tier, batch_id, checkpoint):
        pdf = df.toPandas()
        self.schema.setdefault(tier, df.schema)
        store = self.days.setdefault(tier, {})
        # one atomic commit: partition replacement + snapshot properties
        for day, rows in pdf.groupby(pdf["_day"].astype(str)):
            store[day] = rows.reset_index(drop=True)
        self.snaps.setdefault(tier, []).append((batch_id, checkpoint))

    def maintenance_commit(self, tier):
        """Simulate expire_snapshots/rewrite_data_files: a newer snapshot
        with NO sink properties (summary lacks mtsad.batch-id)."""
        self.snaps.setdefault(tier, []).append(None)

    def table(self, tier):
        return f"fake.db.metrics_agg_{tier}"

    def last_applied(self, tier):
        # newest snapshot CARRYING the property, not the newest snapshot
        for entry in reversed(self.snaps.get(tier, [])):
            if entry is not None:
                return entry
        return None


class _CrashingIO(_FakeIcebergIO):
    """Commits normally, then dies AFTER the first successful tier commit —
    the exact crash window that makes the parquet backend at-least-once."""

    def __init__(self, spark, crash_after=1):
        super().__init__(spark)
        self.remaining = crash_after

    def overwrite_partitions(self, df, tier, batch_id, checkpoint):
        if self.remaining == 0:
            raise RuntimeError("simulated crash between tier commits")
        super().overwrite_partitions(df, tier, batch_id, checkpoint)
        self.remaining -= 1


def _iceberg_sink_fixture(spark, io):
    from pyspark.sql import functions as F

    from mtsad_spark.streaming.continuous_stream import (
        IcebergStreamingContinuousAggregate,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .select("event_type", "ts", "cents")
    )
    sink = IcebergStreamingContinuousAggregate(io, ["event_type"], "ts", "cents")
    return ev, sink


def _full_partials(ev):
    from mtsad_spark.operators.rollup import reaggregate, rollup_partials

    full = {"1m": rollup_partials(ev, "ts", "cents", ["event_type"], "1m")}
    full["1h"] = reaggregate(full["1m"], ["event_type"], "1h")
    full["1d"] = reaggregate(full["1h"], ["event_type"], "1d")
    return full


def _assert_matches_rebuild(io, ev):
    full = _full_partials(ev)
    for tier in ("1m", "1h", "1d"):
        got = (
            io.read(tier)
            .toPandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = (
            full[tier]
            .toPandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), tier
        for c in ("cnt", "s1", "s2", "vmin", "vmax"):
            assert (got[c].values == want[c].values).all(), (tier, c)


def test_iceberg_exactly_once_stream_matches_rebuild(spark):
    """The snapshot-commit branch (VERDICT r05 #8): batches merge via
    per-tier atomic commits carrying the batch id; a replayed applied id is
    a no-op (no new snapshots, no data change), and the drained table is
    bitwise-equal to one rebuild."""
    from pyspark.sql import functions as F

    io = _FakeIcebergIO(spark)
    ev, sink = _iceberg_sink_fixture(spark, io)
    b1 = ev.filter(F.abs(F.hash("ts")) % 2 == 0)
    b2 = ev.filter(F.abs(F.hash("ts")) % 2 == 1)
    sink(b1, batch_id=0)
    sink(b2, batch_id=1)
    _assert_matches_rebuild(io, ev)

    # replay of an applied id: every tier's newest snapshot already carries
    # an id >= 1 -> all tiers skip; no snapshot appended, data unchanged
    snaps_before = {t: list(s) for t, s in io.snaps.items()}
    sink(b2, batch_id=1)
    assert io.snaps == snaps_before
    _assert_matches_rebuild(io, ev)


def test_iceberg_exactly_once_survives_crash_between_tiers(spark):
    """The crash window that leaves the parquet backend at-least-once: die
    after the 1m commit of batch 1, re-deliver the batch (what the stream
    runtime does on restart). The guard skips the committed 1m tier and
    applies 1h/1d — each tier merges the batch EXACTLY once."""
    from pyspark.sql import functions as F

    io = _CrashingIO(spark, crash_after=4)  # batch0: 3 commits; batch1: 1
    ev, sink = _iceberg_sink_fixture(spark, io)
    b1 = ev.filter(F.abs(F.hash("ts")) % 2 == 0)
    b2 = ev.filter(F.abs(F.hash("ts")) % 2 == 1)
    sink(b1, batch_id=0)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(b2, batch_id=1)  # 1m commits, then the "process" dies
    ck = sink.checkpoint
    assert io.snaps["1m"] == [(0, ck), (1, ck)] and io.snaps["1h"] == [(0, ck)]

    io.remaining = 10  # restart
    sink(b2, batch_id=1)  # foreachBatch re-delivers the uncommitted batch
    assert io.snaps["1m"] == [(0, ck), (1, ck)], "replayed tier must not double-merge"
    assert io.snaps["1h"] == [(0, ck), (1, ck)]
    assert io.snaps["1d"] == [(0, ck), (1, ck)]
    _assert_matches_rebuild(io, ev)


def test_iceberg_guard_survives_maintenance_commits(spark):
    """Table maintenance (expire_snapshots / rewrite_data_files) appends
    snapshots WITHOUT the sink's batch-id property; the replay guard must
    read the newest snapshot CARRYING the property, or a replayed batch
    after maintenance double-merges (code-review r6)."""
    from pyspark.sql import functions as F

    io = _FakeIcebergIO(spark)
    ev, sink = _iceberg_sink_fixture(spark, io)
    b1 = ev.filter(F.abs(F.hash("ts")) % 2 == 0)
    b2 = ev.filter(F.abs(F.hash("ts")) % 2 == 1)
    sink(b1, batch_id=0)
    sink(b2, batch_id=1)
    for tier in ("1m", "1h", "1d"):
        io.maintenance_commit(tier)  # newest snapshot now lacks the property
    snaps_before = {t: list(s) for t, s in io.snaps.items()}
    sink(b2, batch_id=1)  # replay after maintenance: must still skip
    assert io.snaps == snaps_before
    _assert_matches_rebuild(io, ev)


def test_iceberg_fresh_checkpoint_refuses_existing_table(spark):
    """A NEW stream (fresh checkpoint, batch ids restart at 0) pointed at
    tier tables fed by a different checkpoint must refuse loudly instead of
    batch-id-skipping every real batch — same contract as the parquet
    ledger (code-review r6)."""
    from mtsad_spark.streaming.continuous_stream import (
        IcebergStreamingContinuousAggregate,
    )

    io = _FakeIcebergIO(spark)
    ev, sink = _iceberg_sink_fixture(spark, io)
    sink.checkpoint = "/ck/old"
    sink(ev, batch_id=0)
    sink2 = IcebergStreamingContinuousAggregate(
        io, ["event_type"], "ts", "cents", checkpoint="/ck/new"
    )
    with pytest.raises(ValueError, match="checkpoint"):
        sink2(ev, batch_id=0)


def test_streaming_token_drift_matches_batch(spark, tmp_path):
    """The tier-timeseries × tokens fusion END-TO-END in streaming: a
    foreachBatch continuous aggregate keyed by TOKEN maintains the stored
    per-bucket token histogram across micro-batches, and the drift read
    path (token_drift_from_counts over the re-bucketed stored 1m tier) is
    BITWISE equal to the batch token_distribution_drift over the same
    rows."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from mtsad_spark.functions.text import (
        token_distribution_drift,
        token_drift_from_counts,
    )
    from mtsad_spark.plans.continuous import ContinuousAggregate
    from mtsad_spark.streaming.continuous_stream import StreamingContinuousAggregate

    rng = np.random.default_rng(31)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for b in range(3):
        lo, hi = (0, 20) if b < 2 else (10, 40)
        toks = rng.integers(lo, hi, size=300).tolist()
        for j in range(0, len(toks), 50):
            rows.append(
                (t0 + dt.timedelta(seconds=600 * b + j // 50), toks[j : j + 50])
            )
    docs = spark.createDataFrame(rows, "ts timestamp, tokens array<int>")
    V = 40

    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    agg = ContinuousAggregate(
        spark, str(tmp_path / "ca"), ["token"], "ts", "one"
    )
    sink = StreamingContinuousAggregate(agg)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("ts", F.explode("tokens").alias("token"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    q = sink.start(stream, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert len(sink._applied()) >= 2, "expected multiple micro-batches"

    stored = agg.read_partials("1m")
    rebucketed = stored.groupBy(
        (
            (F.col("bucket_ts").cast("timestamp").cast("long") / 600).cast("long")
            * 600
        )
        .cast("timestamp")
        .alias("bucket_ts"),
        "token",
    ).agg(F.sum("cnt").alias("cnt"))
    got = {
        r["bucket_ts"]: (r["n_union"], r["kl"])
        for r in token_drift_from_counts(rebucketed, 600, V).collect()
    }
    want = {
        r["bucket_ts"]: (r["n_union"], r["kl"])
        for r in token_distribution_drift(docs, "ts", "tokens", 600, V).collect()
    }
    assert got == want and len(got) == 2  # bitwise stream ≡ batch


def test_streamed_store_feeds_robust_scorer_bitwise(spark, tmp_path):
    """North-star composition: micro-batches maintain the STORED tier
    tables (foreachBatch continuous aggregate), and the robust scorer
    consuming the stored 1h tier must be BITWISE equal to the same scorer
    over a one-shot batch rollup of the identical rows — the
    tiers-feed-scorers contract that makes the stored path a drop-in."""
    from pyspark.sql import functions as F

    from mtsad_spark.operators.stats import hampel_filter
    from mtsad_spark.plans.continuous import ContinuousAggregate
    from mtsad_spark.streaming.continuous_stream import StreamingContinuousAggregate

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .select("event_type", "ts", "cents")
    )
    agg = ContinuousAggregate(
        spark, str(tmp_path / "store"), ["event_type"], "ts", "cents"
    )
    sink = StreamingContinuousAggregate(agg, checkpoint=str(tmp_path / "ck"))
    b1 = ev.filter(F.abs(F.hash("ts")) % 3 != 0)
    b2 = ev.filter(F.abs(F.hash("ts")) % 3 == 0)
    sink(b1, batch_id=0)
    sink(b2, batch_id=1)

    stored_1h = agg.read_partials("1h").select(
        "event_type", "bucket_ts", F.col("s1").alias("lv")
    )
    scored_stream = (
        hampel_filter(stored_1h, ["event_type"], "bucket_ts", "lv", window=24)
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    batch_1h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.sum("cents").alias("lv"))
    scored_batch = (
        hampel_filter(batch_1h, ["event_type"], "bucket_ts", "lv", window=24)
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(scored_stream) == len(scored_batch) > 0
    for c in ("lv", "n_w", "med", "mad"):
        assert (scored_stream[c].values == scored_batch[c].values).all(), c
    assert (
        scored_stream.is_outlier.values == scored_batch.is_outlier.values
    ).all()
