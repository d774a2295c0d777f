"""Continuous-aggregate surface (r5): incremental refresh, tier stitching,
deterministic sampling, n-gram contamination."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_incremental_refresh_equals_full_rebuild(spark, events, tmp_path):
    """N incremental refreshes must be bitwise-equal to one from-scratch
    rollup (associative LONG partials), at every tier."""
    from mtsad_spark.operators.rollup import reaggregate, rollup_partials
    from mtsad_spark.plans.continuous import ContinuousAggregate

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    ca = ContinuousAggregate(spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents")
    # three uneven batches, one of which is empty-ish (single day)
    b1 = ev.filter(F.col("event_id") % 3 == 0)
    b2 = ev.filter(F.col("event_id") % 3 == 1)
    b3 = ev.filter(F.col("event_id") % 3 == 2)
    a1 = ca.refresh(b1)
    ca.refresh(b2)
    ca.refresh(b3)
    assert a1["1m"] >= 1 and a1["1d"] >= 1  # affected-day lineage metric

    full = {"1m": rollup_partials(ev, "ts", "cents", ["event_type"], "1m")}
    full["1h"] = reaggregate(full["1m"], ["event_type"], "1h")
    full["1d"] = reaggregate(full["1h"], ["event_type"], "1d")
    for tier in ("1m", "1h", "1d"):
        got = ca.read_partials(tier).toPandas().sort_values(
            ["event_type", "bucket_ts"]).reset_index(drop=True)
        want = full[tier].toPandas().sort_values(
            ["event_type", "bucket_ts"]).reset_index(drop=True)
        assert len(got) == len(want), tier
        for c in ("cnt", "s1", "s2", "vmin", "vmax"):
            assert (got[c].values == want[c].values).all(), (tier, c)


def test_refresh_merges_on_uri_scheme_paths(spark, events, tmp_path):
    """VERDICT r05 "wrong" #1: the table-existence probe must go through the
    Hadoop FS API, not os.path. With a ``file://`` URI base dir the old
    os.path.isdir probe returned False, so every refresh saw "no table" and
    dynamic-partition overwrite silently REPLACED the overlapping days'
    stored partials with batch-only partials (merge → replace). Two batches
    that SHARE days must merge to the same partials as a one-shot rebuild."""
    from mtsad_spark.plans.continuous import ContinuousAggregate

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    base = "file://" + str(tmp_path / "ca_uri")  # non-bare scheme path
    ca = ContinuousAggregate(spark, base, ["event_type"], "ts", "cents")
    # hash split: both batches land in (almost) every day, so a replace
    # instead of a merge loses batch-1 rows in every shared partition
    b1 = ev.filter(F.abs(F.hash("event_id")) % 2 == 0)
    b2 = ev.filter(F.abs(F.hash("event_id")) % 2 == 1)
    ca.refresh(b1)
    ca.refresh(b2)

    full = ContinuousAggregate(
        spark, str(tmp_path / "ca_uri_full"), ["event_type"], "ts", "cents"
    )
    full.refresh(ev)
    for tier in ("1m", "1d"):
        got = (
            ca.read_partials(tier)
            .toPandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = (
            full.read_partials(tier)
            .toPandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), tier
        for c in ("cnt", "s1", "s2", "vmin", "vmax"):
            assert (got[c].values == want[c].values).all(), (tier, c)


def test_incremental_refresh_touches_only_affected_partitions(spark, events, tmp_path):
    """The partition-metadata promise: a batch landing in one day must leave
    every other stored day-partition's files untouched (dynamic overwrite +
    pruned read), not rewrite the table."""
    from mtsad_spark.plans.continuous import ContinuousAggregate

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    ca = ContinuousAggregate(spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents")
    ca.refresh(ev)

    def day_files(tier):
        root = os.path.join(str(tmp_path / "ca"), f"agg_{tier}")
        out = {}
        for d in os.listdir(root):
            if d.startswith("_day="):
                full = os.path.join(root, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full)
                }
        return out

    before = day_files("1m")
    one_day = ev.filter(F.to_date("ts") == F.lit("2024-01-05"))
    assert one_day.count() > 0
    affected = ca.refresh(one_day)
    assert affected["1m"] == 1 and affected["1d"] == 1
    after = day_files("1m")
    assert set(after) == set(before)
    for d in before:
        if d == "_day=2024-01-05":
            assert after[d] != before[d], "affected partition must be rewritten"
        else:
            assert after[d] == before[d], f"untouched partition {d} was rewritten"


@pytest.mark.parametrize(
    "t0,t1",
    [
        ("2024-01-03 05:17:00", "2024-01-27 21:43:00"),  # all three tiers
        ("2024-01-10 00:00:00", "2024-01-12 00:00:00"),  # pure days
        ("2024-01-10 07:00:00", "2024-01-10 19:00:00"),  # hours in one day
        ("2024-01-10 07:05:00", "2024-01-10 07:31:00"),  # minutes in one hour
        ("2024-01-09 23:58:00", "2024-01-10 00:03:00"),  # midnight straddle
    ],
)
def test_stitched_range_equals_direct(spark, events, t0, t1):
    from mtsad_spark.operators.rollup import (
        reaggregate,
        rollup_partials,
        stitched_range_aggregate,
    )

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    p1m = rollup_partials(ev, "ts", "cents", ["event_type"], "1m")
    tiers = {"1m": p1m, "1h": reaggregate(p1m, ["event_type"], "1h")}
    tiers["1d"] = reaggregate(tiers["1h"], ["event_type"], "1d")
    d0, d1 = dt.datetime.fromisoformat(t0), dt.datetime.fromisoformat(t1)
    got = (
        stitched_range_aggregate(tiers, ["event_type"], d0, d1)
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    direct = (
        ev.filter((F.col("ts") >= F.lit(d0)) & (F.col("ts") < F.lit(d1)))
        .groupBy("event_type")
        .agg(
            F.count("cents").alias("cnt"),
            F.sum("cents").alias("sum_v"),
            F.min("cents").alias("vmin"),
            F.max("cents").alias("vmax"),
        )
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    assert len(got) == len(direct)
    for c in ("cnt", "sum_v", "vmin", "vmax"):
        assert (got[c].values == direct[c].values).all(), (t0, t1, c)


def test_hash_ranked_sample_matches_naive_and_is_stable(spark, events):
    """Exact per-key ranks vs a pandas recompute of the same md5 order, and
    partitioning-invariance (the determinism the op exists for)."""
    import hashlib

    from mtsad_spark.operators.splits import hash_ranked_sample

    ev = events.select("event_type", "event_id")
    got = hash_ranked_sample(ev, ["event_type"], "event_id", k=7, seed=9).toPandas()
    pdf = ev.toPandas()
    pdf["h"] = [
        int(hashlib.md5(f"9|{i}".encode()).hexdigest()[:15], 16)
        for i in pdf["event_id"]
    ]
    want = (
        pdf.sort_values(["h", "event_id"])
        .groupby("event_type")
        .head(7)
        .sort_values(["event_type", "h"])
    )
    g = got.sort_values(["event_type", "sample_rank"])
    assert list(g["event_id"]) == list(want["event_id"])
    assert list(g["sample_rank"]) == sorted(range(7)) * want["event_type"].nunique()
    got2 = (
        hash_ranked_sample(ev.repartition(13), ["event_type"], "event_id", k=7, seed=9)
        .toPandas().sort_values(["event_type", "sample_rank"])
    )
    assert list(got2["event_id"]) == list(g["event_id"])


def test_ngram_contamination_finds_planted_overlap(spark):
    from mtsad_spark.operators.dedup import ngram_contamination

    rows = [
        ("t1", list(range(100, 160))),           # source doc
        ("t2", list(range(500, 560))),           # unrelated
        ("t3", list(range(9, 12))),              # shorter than n → no grams
    ]
    train = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    holdout = spark.createDataFrame(
        [("e1", list(range(110, 140))),          # 30-token slice of t1
         ("e2", list(range(900, 930)))],         # clean
        "doc_id string, tokens array<int>",
    )
    out = ngram_contamination(train, holdout, "doc_id", "tokens", n=13).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["holdout_id"], r["train_id"]) == ("e1", "t1")
    assert r["n_shared"] == 30 - 13 + 1  # every 13-gram of the slice

    # df_cap drops boilerplate n-grams shared by too many training docs
    boiler = spark.createDataFrame(
        [(f"b{i}", list(range(0, 20))) for i in range(5)] + rows,
        "doc_id string, tokens array<int>",
    )
    h2 = spark.createDataFrame(
        [("e3", list(range(0, 20)))], "doc_id string, tokens array<int>"
    )
    capped = ngram_contamination(boiler, h2, "doc_id", "tokens", n=13, df_cap=3)
    assert capped.count() == 0
    uncapped = ngram_contamination(boiler, h2, "doc_id", "tokens", n=13)
    assert uncapped.count() == 5


def test_range_query_on_stored_tables_prunes_partitions(spark, events, tmp_path):
    """The stored-table read path: stitched [t0, t1) against the CA tables
    must (a) equal the direct raw aggregation and (b) PRUNE day partitions —
    the 1m/1h scans may only open the edge days' files, never the whole
    table (the 100-TB reason the tiling exists)."""
    import datetime as dt

    from mtsad_spark.plans.continuous import ContinuousAggregate

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    ca = ContinuousAggregate(spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents")
    ca.refresh(ev)

    t0 = dt.datetime(2024, 1, 5, 7, 13)
    t1 = dt.datetime(2024, 1, 25, 18, 47)
    got = (
        ca.range_query(t0, t1)
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    direct = (
        ev.filter((F.col("ts") >= F.lit(t0)) & (F.col("ts") < F.lit(t1)))
        .groupBy("event_type")
        .agg(F.count("cents").alias("cnt"), F.sum("cents").alias("sum_v"),
             F.min("cents").alias("vmin"), F.max("cents").alias("vmax"))
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    for c in ("cnt", "sum_v", "vmin", "vmax"):
        assert (got[c].values == direct[c].values).all(), c

    # pruning evidence: every tier scan in the stitched plan must carry the
    # day bounds as PARTITION filters (inputFiles() ignores predicates, so
    # read the physical plan — PartitionFilters is what the FileIndex prunes
    # directories with at scale)
    plan_df = ca.range_query(t0, t1)
    plan = plan_df._sc._jvm.PythonSQLUtils.explainString(
        plan_df._jdf.queryExecution(), "formatted"
    )
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert len(pf_lines) == 3, f"expected 3 tier scans: {pf_lines}"
    for l in pf_lines:
        assert "_day" in l and ">=" in l and "<=" in l, f"unpruned scan: {l}"


def test_zorder_key_interleaves_and_localizes(spark):
    """(a) the key equals a python bit-interleave recompute; (b) chunking a
    2-D grid by z-order gives every chunk a bbox covering ~1/chunks of the
    AREA (both dims narrow), where a linear sort leaves dim-2 spanning the
    full range in every chunk — the file-skipping property the key exists
    for."""
    import pandas as pd

    from mtsad_spark.sources.tables import zorder_key

    side = 64  # 64×64 grid
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    got = grid.select("x", "y", zorder_key("x", "y", bits=6).alias("z")).toPandas()

    def interleave(x, y, bits=6):
        z = 0
        for j in range(bits):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    want = [interleave(x, y) for x, y in zip(got["x"], got["y"])]
    assert list(got["z"]) == want
    assert got["z"].nunique() == side * side  # bijective on the grid

    n_chunks = 16
    df = got.sort_values("z").reset_index(drop=True)
    df["chunk"] = df.index * n_chunks // len(df)
    spans = df.groupby("chunk").agg(
        xa=("x", "min"), xb=("x", "max"), ya=("y", "min"), yb=("y", "max")
    )
    areas = (spans["xb"] - spans["xa"] + 1) * (spans["yb"] - spans["ya"] + 1)
    # perfect quad-tree chunks would be side²/16 each; allow 2× slop
    assert areas.max() <= side * side / n_chunks * 2, areas.max()
    # linear sort on x: every chunk's y-range spans the whole side
    lin = got.sort_values(["x", "y"]).reset_index(drop=True)
    lin["chunk"] = lin.index * n_chunks // len(lin)
    lspans = lin.groupby("chunk").agg(ya=("y", "min"), yb=("y", "max"))
    assert ((lspans["yb"] - lspans["ya"] + 1) == side).all()


def test_streaming_heavy_hitters_misra_gries_guarantees(spark, tmp_path):
    """MG streaming summary: after an availableNow drain over several
    micro-batches, for each key (a) every token with true count > err is
    present, (b) every estimate under-counts by at most err, and
    (c) err ≤ n/(m+1) — the classic MG guarantee, maintained across batch
    boundaries by the mergeable-summaries combine."""
    import numpy as np
    import pandas as pd

    from mtsad_spark.streaming.heavy_hitters_stream import streaming_heavy_hitters

    rng = np.random.RandomState(7)
    # skewed stream: a few heavy tokens + a long uniform tail
    heavy = rng.choice([1, 2, 3], size=3000, p=[0.5, 0.3, 0.2])
    tail = rng.randint(100, 5000, size=3000)
    toks = np.concatenate([heavy, tail])
    rng.shuffle(toks)
    rows = [
        ("web", [int(t) for t in toks[i : i + 50]]) for i in range(0, len(toks), 50)
    ]
    df = spark.createDataFrame(rows, "source string, tokens array<long>")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_heavy_hitters(stream, m=32)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    final = out[out["n_total"] == out["n_total"].max()]
    assert final["n_total"].iloc[0] == len(toks)
    err = final["err"].iloc[0]
    assert err <= len(toks) // (32 + 1)
    true = pd.Series(toks).value_counts()
    est = dict(zip(final["token"], final["est_count"]))
    for t, c in true.items():
        if c > err:
            assert t in est, f"token {t} (count {c} > err {err}) missing"
        if t in est:
            assert est[t] <= c and c - est[t] <= err, (t, c, est[t], err)


def test_continuous_aggregate_full_lifecycle(spark, events, tmp_path):
    """The whole tier-engine story on one table: incremental ingest →
    stitched range query over the stored tiers → retention drop of expired
    1m day-partitions (metadata-only) → range queries still correct wherever
    the surviving tiers cover them."""
    import datetime as dt

    from mtsad_spark.plans.continuous import ContinuousAggregate
    from mtsad_spark.sources.tables import TableProvider

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    ca = ContinuousAggregate(spark, str(tmp_path / "ca"), ["event_type"], "ts", "cents")
    ca.refresh(ev.filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 15))))
    ca.refresh(ev.filter(F.col("ts") >= F.lit(dt.datetime(2024, 1, 15))))

    t0, t1 = dt.datetime(2024, 1, 12, 6, 30), dt.datetime(2024, 1, 20, 17, 45)
    got = ca.range_query(t0, t1).toPandas().sort_values("event_type")
    direct = (
        ev.filter((F.col("ts") >= F.lit(t0)) & (F.col("ts") < F.lit(t1)))
        .groupBy("event_type").agg(F.count("cents").alias("cnt"))
        .toPandas().sort_values("event_type")
    )
    assert list(got["cnt"]) == list(direct["cnt"])

    # retention: expire the 1m tier before Jan 10 (the fine tier ages out
    # first in a real retention ladder; 1h/1d keep the history)
    tp = TableProvider(spark, str(tmp_path / "ca"))
    res = tp.drop_partitions_before("agg_1m", "_day", "2024-01-10")
    assert len(res["dropped"]) == 9 and len(res["kept"]) == 21

    # ranges whose minute-edges fall inside the surviving window still work
    got2 = ca.range_query(dt.datetime(2024, 1, 12, 6, 30), t1).toPandas()
    assert list(got2.sort_values("event_type")["cnt"]) == list(direct["cnt"])
    # day-aligned ranges in the expired region need no 1m data at all
    t0d = dt.datetime(2024, 1, 3)
    got3 = ca.range_query(t0d, dt.datetime(2024, 1, 8)).toPandas()
    direct3 = (
        ev.filter((F.col("ts") >= F.lit(t0d)) & (F.col("ts") < F.lit(dt.datetime(2024, 1, 8))))
        .groupBy("event_type").agg(F.count("cents").alias("cnt"))
        .toPandas()
    )
    assert sorted(got3["cnt"]) == sorted(direct3["cnt"])

    # a minute-edge inside the expired region is a retention HOLE: the 1m
    # day-partition is gone while 1h/1d still cover the day. ADVICE r05
    # (no-silent-caps): detected from the partition layouts BEFORE any data
    # scan and raised, never a silent undercount; allow_partial=True is the
    # documented best-effort opt-in for aged ranges.
    with pytest.raises(ValueError, match="retention-expired"):
        ca.range_query(dt.datetime(2024, 1, 5, 6, 30), dt.datetime(2024, 1, 8))
    part = ca.range_query(
        dt.datetime(2024, 1, 5, 6, 30), dt.datetime(2024, 1, 8), allow_partial=True
    ).toPandas()
    assert len(part) > 0  # opt-in still answers (undercounted by design)


def test_compact_to_gorilla_cold_tier(spark, events, tmp_path):
    """Cold-tier compaction lifecycle: days older than the cutoff move from
    row-form parquet into Gorilla-packed binary columns, and every read path
    is BITWISE unchanged — plus crash-consistency (row-form precedence),
    idempotence, and late-refresh-into-a-packed-day semantics."""
    from mtsad_spark.operators.rollup import rollup_partials
    from mtsad_spark.plans.continuous import ContinuousAggregate

    ev = events.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    base = str(tmp_path / "ca")
    ca = ContinuousAggregate(spark, base, ["event_type"], "ts", "cents")
    ca.refresh(ev.filter(F.col("event_id") % 2 == 0))
    ca.refresh(ev.filter(F.col("event_id") % 2 == 1))

    def snap(tier):
        return (
            ca.read_partials(tier)
            .toPandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )

    def day_dirs(path):
        root = os.path.join(base, path)
        if not os.path.isdir(root):
            return set()
        return {d[len("_day=") :] for d in os.listdir(root) if d.startswith("_day=")}

    before = {t: snap(t) for t in ("1m", "1h")}
    all_days = sorted(day_dirs("agg_1m"))
    assert len(all_days) >= 4
    cut = all_days[len(all_days) // 2]
    cold = {d for d in all_days if d < cut}

    import datetime as dtmod

    n = ca.compact("1m", dtmod.date.fromisoformat(cut))
    assert n == len(cold)
    assert day_dirs("agg_1m") == set(all_days) - cold  # hot rows gone
    assert day_dirs("agg_1m_packed") == cold  # cold days packed

    # every read path bitwise-unchanged across the hot/cold stitch
    after = snap("1m")
    assert len(after) == len(before["1m"])
    for c in ("cnt", "s1", "s2", "vmin", "vmax"):
        assert (after[c].values == before["1m"][c].values).all(), c

    # range_query spanning the compaction boundary: equal to pre-compaction
    lo = dtmod.datetime.fromisoformat(all_days[0]) + dtmod.timedelta(hours=7)
    hi = dtmod.datetime.fromisoformat(all_days[-1]) + dtmod.timedelta(hours=5)
    got = (
        ca.range_query(lo, hi)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (got["cnt"] > 0).all()
    # oracle: direct aggregation of the raw rows in [lo, hi)
    want = (
        ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("cents").alias("s1"))
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (got["cnt"].values == want["cnt"].values).all()
    assert (got["sum_v"].values == want["s1"].values).all()

    # idempotent: nothing left to compact below the cutoff
    assert ca.compact("1m", dtmod.date.fromisoformat(cut)) == 0

    # crash window: a row-form copy of a packed day takes PRECEDENCE and
    # re-compacting converges (packed rewritten, row dir re-deleted)
    d0 = sorted(cold)[0]
    batch_d0 = ev.filter(F.to_date("ts") == F.lit(dtmod.date.fromisoformat(d0)))
    ca.refresh(batch_d0)  # late data into a compacted day
    assert d0 in day_dirs("agg_1m")  # resurrected as hot row-form
    # merged = original + the re-ingested batch (double-count by design here)
    exp = (
        rollup_partials(
            ev.unionByName(batch_d0), "ts", "cents", ["event_type"], "1m"
        )
        .toPandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    got2 = snap("1m")
    assert len(got2) == len(exp)
    for c in ("cnt", "s1", "s2", "vmin", "vmax"):
        assert (got2[c].values == exp[c].values).all(), c
    # re-compact folds the resurrected day back into the cold layout
    assert ca.compact("1m", dtmod.date.fromisoformat(cut)) == 1
    assert d0 not in day_dirs("agg_1m")
    got3 = snap("1m")
    for c in ("cnt", "s1", "s2", "vmin", "vmax"):
        assert (got3[c].values == exp[c].values).all(), c


def test_mixture_token_sample_vs_python_oracle(spark):
    """Quotas must match a python Hamilton apportionment over isqrt weights,
    and the greedy hash-order selection must match an md5-sorted cumsum —
    including the capped-quota (unmet) path and partitioning invariance."""
    import hashlib
    import math

    import numpy as np

    from mtsad_spark.operators.splits import mixture_quotas, mixture_token_sample

    rng = np.random.default_rng(3)
    rows = []
    sizes = {"web": 60, "code": 20, "wiki": 5, "tiny": 2}
    for src, nd in sizes.items():
        for j in range(nd):
            rows.append((src, f"{src}-{j:04d}", int(rng.integers(40, 400))))
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    toks = {s: sum(t for ss, _, t in rows if ss == s) for s in sizes}
    total = sum(toks.values())

    def py_quotas(budget, sqrt_w):
        w = {s: (math.isqrt(t) if sqrt_w else t) for s, t in toks.items()}
        W = sum(w.values())
        base = {s: budget * w[s] // W for s in w}
        rem = {s: budget * w[s] % W for s in w}
        left = budget - sum(base.values())
        order = sorted(w, key=lambda s: (-rem[s], s))
        raw = {
            s: base[s] + (1 if order.index(s) < left else 0) for s in w
        }
        return {s: (min(raw[s], toks[s]), max(raw[s] - toks[s], 0)) for s in w}

    for budget, sqrt_w in [(total // 3, True), (total // 3, False), (total * 2, True)]:
        want = py_quotas(budget, sqrt_w)
        got = {
            r["source"]: (r["quota"], r["unmet"])
            for r in mixture_quotas(df, "source", "n_tok", budget, sqrt_w).collect()
        }
        assert got == want, (budget, sqrt_w)

    # sqrt weights upweight 'tiny' far beyond its totals at a big budget
    assert py_quotas(total * 2, True)["tiny"][1] > 0

    budget = total // 3
    want_q = py_quotas(budget, True)
    sel = mixture_token_sample(df, "source", "doc_id", "n_tok", budget).toPandas()

    def py_select(src):
        docs = [(d, t) for ss, d, t in rows if ss == src]
        docs.sort(key=lambda x: (int(hashlib.md5(f"42|{x[0]}".encode()).hexdigest()[:15], 16), x[0]))
        out, cum = [], 0
        for d, t in docs:
            if cum + t <= want_q[src][0]:
                cum += t
                out.append((d, cum))
        return out

    for src in sizes:
        sub = sel[sel.source == src].sort_values("cum_tok")
        assert list(zip(sub.doc_id, sub.cum_tok)) == py_select(src), src
        assert (sub.quota == want_q[src][0]).all()

    sel2 = mixture_token_sample(
        df.repartition(13), "source", "doc_id", "n_tok", budget
    ).toPandas()
    assert sorted(sel2.doc_id) == sorted(sel.doc_id)


def test_mixture_quotas_zero_total_weight_surfaces_unmet(spark):
    """code-review r6: a corpus where every source has zero tokens made
    _W = 0 NULL-propagate through the DECIMAL div/% into silent NULL quotas
    (and an empty sample with no signal). The guard falls back to equal
    weights: quotas 0 (capped at tot_tok = 0), Σunmet = budget, in-band."""
    from mtsad_spark.operators.splits import mixture_quotas, mixture_token_sample

    rows = [("a", "a-0", 0), ("a", "a-1", 0), ("b", "b-0", 0), ("c", "c-0", 0)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    for sqrt_w in (True, False):
        got = mixture_quotas(df, "source", "n_tok", 100, sqrt_w).toPandas()
        assert got.quota.notna().all() and got.unmet.notna().all()
        assert (got.quota == 0).all()
        assert got.unmet.sum() == 100, "the whole budget must surface in-band"
    sel = mixture_token_sample(df, "source", "doc_id", "n_tok", 100).toPandas()
    # zero-token docs fit any quota (cum 0 <= 0) — present, contributing 0
    assert sel.cum_tok.notna().all() and (sel.cum_tok == 0).all()
