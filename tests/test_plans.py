"""Plan-quality guardrails: the physical plans the engine relies on at 100 TB
must not silently regress — predicate pushdown to the parquet scan, column
pruning, map-side partial aggregation, broadcast joins for small dims, and
no Python eval nodes in JVM-path operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_filter_and_projection_pushed_to_scan(events):
    q = events.filter(F.col("value") > 400).select("event_id", "value")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,400.0)]" in p
    assert "struct<event_id:bigint,value:double>" in p  # pruned ReadSchema


def test_rollup_scan_prunes_columns_and_partially_aggregates(events):
    from mtsad_spark.operators.rollup import rollup_partials

    q = rollup_partials(events, "ts", "value", ["event_type"], "1m", exact_int=False)
    p = plan_of(q)
    assert "partial_sum" in p and "partial_count" in p  # map-side combine
    assert "struct<ts:timestamp" in p and "props" not in p  # 3-col scan only
    assert p.count(") Exchange") == 1  # single shuffle for the base tier


def test_tier_reaggregation_adds_one_exchange_not_a_rescan(events):
    from mtsad_spark.operators.rollup import reaggregate, rollup_partials

    q = reaggregate(
        rollup_partials(events, "ts", "value", ["event_type"], "1m", exact_int=False),
        ["event_type"],
        "1h",
    )
    p = plan_of(q)
    assert p.count(") Scan parquet") == 1  # cascade = one scan, not per-tier
    assert p.count(") Exchange") == 2


def test_small_dim_join_broadcasts(spark):
    from mtsad_spark.driver_queries import mktsegment_totals

    q = mktsegment_totals(spark, "/root/testdata/sf0.001")
    p = plan_of(q)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_jvm_path_operators_have_no_python_nodes(spark, events):
    from mtsad_spark.operators.scoring import sliding_zscore
    from mtsad_spark.operators.stats import moving_average_same, znorm

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    for q in (
        sliding_zscore(hourly, ["event_type"], "bucket_ts", "v", w=24),
        moving_average_same(hourly, ["event_type"], "bucket_ts", "v", w=5),
        znorm(hourly.select("event_type", "v"), ["v"], keys=["event_type"]),
    ):
        p = plan_of(q)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "FlatMapGroupsInPandas" not in p


def test_pandas_kernels_are_arrow_grouped_map(spark, events):
    from mtsad_spark.operators.scoring import ewma_residual

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    p = plan_of(ewma_residual(hourly, ["event_type"], "bucket_ts", "v"))
    # grouped-map Arrow transport — NOT row-at-a-time BatchEvalPython
    assert "FlatMapGroupsInPandas" in p
    assert "BatchEvalPython" not in p


def test_whole_stage_codegen_covers_rollup(events):
    from mtsad_spark.operators.rollup import finalize, rollup_partials

    q = finalize(
        rollup_partials(events, "ts", "value", ["event_type"], "1m", exact_int=False),
        ["event_type"],
        "1m",
    )
    # AQE finalizes the plan only on execution — run it, then inspect; the
    # star prefix *(n) marks WholeStageCodegen spans in the simple plan string
    q.write.format("noop").mode("overwrite").save()
    final = q._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final


def test_halo_slicer_has_no_per_key_window_over_raw_rows(spark, events):
    """Round-1 scale-killer regression guard (VERDICT r01 #1): the halo
    slicer must not compute row numbers with a window partitioned by the
    bare key over the raw rows — a monster key would serialize through one
    task. Every raw-row window must be partitioned by (key, coarse bucket);
    a keys-only window is allowed ONLY directly above an Aggregate (the
    per-bucket count frame)."""
    from mtsad_spark.operators.scoring import ewma_residual_chunked, sliding_zscore_pandas

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    for q in (
        sliding_zscore_pandas(hourly, ["event_type"], "bucket_ts", "v", w=24, rows_per_slice=100),
        ewma_residual_chunked(hourly, ["event_type"], "bucket_ts", "v", alpha=0.2, rows_per_slice=100),
    ):
        tree = q._jdf.queryExecution().optimizedPlan().toString()
        lines = tree.splitlines()
        for i, line in enumerate(lines):
            if "Window [" not in line:
                continue
            # partition spec is the second bracketed list: ...], [p1, p2], [ord...
            spec = line.split("], [")[1]
            if "_cb#" in spec:
                continue  # (key, coarse-bucket) window over rows — parallel
            # keys-only window: its direct child must be an Aggregate
            assert "Aggregate [" in lines[i + 1], (
                f"keys-only Window over a non-aggregate child:\n{line}\n{lines[i + 1]}"
            )


def test_asof_join_bare_key_window_only_over_bucket_frame(spark, events):
    """VERDICT r02 "what's wrong" #1 regression guard: asof_join must not
    window raw union rows partitioned by the bare key (a hot key would
    serialize through one task). Raw-row windows carry the coarse bucket in
    their partition spec; any keys-only window must sit over the per-bucket
    aggregate frame — i.e. reach an Aggregate before any scan."""
    from mtsad_spark.operators.joins import asof_join

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("avg_v"))
    q = asof_join(
        events.select("event_id", "ts", "event_type"), hourly,
        ["event_type"], "ts", "bucket_ts", ["avg_v"],
    )
    lines = q._jdf.queryExecution().optimizedPlan().toString().splitlines()
    saw_bare_key_window = False
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        spec = line.split("], [")[1]
        if "_asof_cb#" in spec:
            continue  # (key, coarse-bucket) window over raw rows — parallel
        saw_bare_key_window = True
        for below in lines[i + 1 :]:
            if "Aggregate [" in below:
                break
            assert "Relation" not in below and "FileScan" not in below, (
                f"bare-key Window directly over raw rows:\n{line}\n{below}"
            )
    assert saw_bare_key_window  # the carry window exists (over the bucket frame)


def test_dedup_pipeline_has_no_cartesian_or_pair_broadcast(spark):
    """VERDICT r01 #2 regression guard: the near-dup pipeline must contain
    no CartesianProduct/BroadcastNestedLoopJoin anywhere, and no broadcast
    exchange feeding a join on candidate-pair-sized frames (pairs are
    O(corpus) on dup-heavy crawls). AQE may still pick broadcasts at RUNTIME
    from measured sizes — this guards the STATIC plan only."""
    from mtsad_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = minhash_dedup(docs, "doc_id", "text", threshold=0.5)
    p = plan_of(q)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # no broadcast HINTS anywhere in the pipeline (size-estimate-driven
    # broadcasts chosen by Catalyst/AQE are fine — they adapt to real sizes;
    # a hard-coded hint on a pair frame does not)
    analyzed = q._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def _assert_no_bare_key_window_over_raw_rows(q):
    """Every keys-only Window must sit over an aggregate-sized frame; raw-row
    windows must carry the coarse bucket (_cb) in their partition spec. The
    persisted frames render their CACHED PHYSICAL plan inline, so the
    aggregate may sit under Sort/Exchange nodes — skip those."""
    tree = q._jdf.queryExecution().optimizedPlan().toString()
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        spec = line.split("], [")[1]
        if "_cb#" in spec:
            continue  # (key, coarse-bucket) window — parallel
        child = ""
        for below in lines[i + 1 :]:
            if " Sort [" in below or "Exchange " in below:
                continue
            child = below
            break
        assert "Aggregate" in child, (
            f"keys-only Window over a non-aggregate child:\n{line}\n{child}"
        )


def test_bitmap_grid_scorer_is_jvm_only_and_scale_clean(spark, events):
    """The distributed grid bitmap scorer must stay entirely JVM-side (no
    Python eval nodes of any kind) and must not window raw rows partitioned
    by the bare key — its only sequential windows are the per-bucket count
    composition inside _global_row_numbers (same rule as the halo slicer)."""
    from mtsad_spark.functions.tsbitmap import bitmap_grid_scores

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    q = bitmap_grid_scores(
        hourly, ["event_type"], "bucket_ts", "v",
        feature_window_size=24, bins=5, level_size=3,
        lag_window_size=96, lead_window_size=48,
    )
    p = plan_of(q)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    _assert_no_bare_key_window_over_raw_rows(q)


def test_no_bare_or_empty_key_aggregate_windows(spark, events):
    """VERDICT r03 "what's wrong" #2 regression guard: engine normalization
    operators must not compute whole-group statistics with an aggregate
    Window over the raw rows — an empty partitionBy funnels EVERY row through
    one task, a bare-key one serializes each key. znorm /
    sigma_rule_stationary (and pca_to_uts via standardize=True) now use the
    minmax fit/apply shape: tiny groupBy aggregate + broadcast join, so their
    optimized plans contain NO Window node at all."""
    from mtsad_spark.operators.stats import sigma_rule_stationary, znorm

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    for q in (
        znorm(hourly.select("event_type", "v"), ["v"], keys=["event_type"]),
        znorm(hourly.select("v"), ["v"]),  # global form
    ):
        tree = q._jdf.queryExecution().optimizedPlan().toString()
        assert "Window [" not in tree, f"znorm reintroduced a window:\n{tree}"
    s = sigma_rule_stationary(hourly, ["event_type"], "bucket_ts", "v", w=5)
    for line in s._jdf.queryExecution().optimizedPlan().toString().splitlines():
        if "Window [" not in line:
            continue
        spec = line.split("], [")[1]
        # the only surviving window is the centered moving average — a
        # framed ROWS BETWEEN window, never a whole-partition aggregate
        assert "specifiedwindowframe(RowFrame" in line, line
        assert spec.strip(), f"empty partitionBy window in plan:\n{line}"


def test_sax_and_ngram_bitmap_are_scale_clean(spark, events):
    """The corpus-scale bitmap algebra (sax_symbols_df → ngram_bitmap) must
    not window raw rows by the bare key either — positions come from the
    per-bucket count composition, consecutive symbols from equi-self-joins.
    (The only allowed keys-only window is the max over the n-gram COUNT
    frame, whose groups are bounded by alphabet^level.)"""
    from mtsad_spark.functions.tsbitmap import ngram_bitmap, sax_symbols_df

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("v"))
    sym = sax_symbols_df(hourly, ["event_type"], "bucket_ts", "v",
                         feature_window_size=24, bins=5)
    bm = ngram_bitmap(sym, ["event_type"], "bucket_ts", level=3)
    _assert_no_bare_key_window_over_raw_rows(bm)
    p = plan_of(bm)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_lsh_candidate_distinct_carries_no_vectors(spark, embeddings):
    """VERDICT r03 #6: the ANN candidate dedup must key on the two id longs
    only — a distinct over rows still carrying the d-length arrays shuffles
    and compares full vectors. Vectors re-attach after the distinct."""
    from mtsad_spark.operators.similarity import cosine_topk_lsh

    q = embeddings.filter(F.col("vec_id") < 5)
    out = cosine_topk_lsh(embeddings, q, k=3, dim=64, n_planes=8, n_tables=2)
    tree = out._jdf.queryExecution().optimizedPlan().toString()
    for line in tree.splitlines():
        if "Aggregate [" in line and ("_qv" in line or "_cv" in line):
            raise AssertionError(f"candidate distinct carries vectors:\n{line}")


def test_prefix_sum_is_scale_clean(spark, events):
    """keyed_prefix_sum must compose from per-(key, coarse-bucket) partials —
    the only per-key sequential window runs over the bucket-sum frame, never
    the raw rows (same contract as scoring._global_row_numbers)."""
    from mtsad_spark.operators.prefix import keyed_prefix_sum

    q = keyed_prefix_sum(events, ["event_type"], "ts", "value", coarse_width=3600.0)
    _assert_no_bare_key_window_over_raw_rows(q)


def test_scoped_persists_release_at_query_boundary(spark, events):
    """VERDICT r04 #3: operator-scoped persists (as-of join union frame, SAX
    sym/codes, minhash shingles/candidates, dup-group labels) must all be
    released at the next query boundary — a 50-query driver run may never
    accumulate storage blocks. plans/scope.py owns the lifetime: operators
    register via scoped_persist, driver_queries._q releases on entry."""
    from mtsad_spark.operators.joins import asof_join
    from mtsad_spark.plans.scope import _LIVE, release_scoped

    release_scoped()
    # session-scoped test fixtures hold their own caches — judge only blocks
    # created by THIS operator (new RDD ids)
    pre = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    right = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.avg("value").alias("avg_v"))
    out = asof_join(
        events.limit(200), right, ["event_type"], "ts", "bucket_ts", ["avg_v"]
    )
    out.count()  # consuming action — scoped blocks now live
    assert (
        sum(len(v) for v in _LIVE.values()) == 1
    ), "asof_join should register exactly its union frame"
    new = [
        r
        for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if r.id() not in pre
    ]
    assert any(
        r.numCachedPartitions() > 0 for r in new
    ), "the scoped persist should actually hold blocks after the action"
    n = release_scoped()  # what _q does on the next query's entry
    assert n == 1 and not _LIVE
    assert all(
        r.numCachedPartitions() == 0
        for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if r.id() not in pre
    ), "no operator-scoped blocks may survive the query boundary"


def test_scoped_persists_are_session_isolated(spark, events):
    """VERDICT r05 #3: the scope registry is keyed by SparkSession — one
    session's query-boundary release (driver_queries._q passes its own
    session) must leave another live session's scoped blocks hot, so
    interleaved sessions (bench_scaling-style harnesses) can't cross-release
    each other's caches and re-pay the ~5× lineage-recompute tax."""
    from mtsad_spark.plans.scope import _LIVE, release_scoped, scoped_persist

    release_scoped()
    other = spark.newSession()  # same JVM context, distinct session object
    a = scoped_persist(
        spark.createDataFrame([(1, "x")], "id int, v string").filter("id > 0")
    )
    b = scoped_persist(
        other.createDataFrame([(2, "y")], "id int, v string").filter("id > 0")
    )
    a.count(), b.count()
    assert sum(len(v) for v in _LIVE.values()) == 2 and len(_LIVE) == 2
    # what _q does on entry in session `other`: releases ONLY other's frames
    assert release_scoped(other) == 1
    assert a.storageLevel.useMemory, "session A's block was cross-released"
    assert not b.storageLevel.useMemory
    # run-exit hook (no session arg): everything else drains
    assert release_scoped() == 1
    assert not a.storageLevel.useMemory and not _LIVE


def test_scope_registry_values_do_not_pin_their_session(spark):
    """code-review r6: _LIVE is weak-KEYED by session, but a DataFrame value
    strongly references its own session (df._session) — storing DataFrames
    would make every key reachable from its value and nothing could ever
    evict. The registry must store only the JVM dataset handles."""
    import gc
    import weakref

    from mtsad_spark.plans.scope import _LIVE, release_scoped, scoped_persist

    release_scoped()
    s2 = spark.newSession()
    df = scoped_persist(s2.range(10).filter("id > 1"))
    df.count()
    assert len(_LIVE) == 1
    # the stored values must not reference the Python session object
    # (py4j JavaObjects proxy every attribute name, so isinstance, not hasattr)
    from pyspark.sql import DataFrame as _PyDF

    for vals in _LIVE.values():
        for v in vals:
            assert not isinstance(v, _PyDF), "registry holds DataFrames"
    wr = weakref.ref(s2)
    del df, s2
    # pyspark globally pins the LAST-constructed session: SparkSession.__init__
    # monkey-patches RDD.toDF with a closure over it (and may hold class-level
    # slots). Displace both pins — they are pyspark's, not the registry's —
    # so the only remaining question is whether _LIVE pins s2.
    from pyspark.sql import SparkSession

    _displacer = spark.newSession()  # re-points the RDD.toDF closure cell
    for attr in ("_activeSession", "_instantiatedSession"):
        if getattr(SparkSession, attr, None) is not None:
            setattr(SparkSession, attr, spark)
    gc.collect()
    assert wr() is None, "scope registry (or harness) still pins the session"
    assert len(_LIVE) == 0, "weak key failed to evict after session collection"


def test_contamination_and_sampler_plans_are_scale_clean(spark):
    """r5 additions under the same static-plan bans: the n-gram contamination
    join must be a bucket-local equi-join (no cartesian/nested-loop, no
    broadcast hints — the n-gram frames are corpus-proportional), and the
    hash sampler must never window raw rows by the bare key."""
    from mtsad_spark.operators.dedup import ngram_contamination
    from mtsad_spark.operators.splits import hash_ranked_sample

    seq = spark.createDataFrame(
        [("d%d" % i, list(range(i, i + 30))) for i in range(50)],
        "doc_id string, tokens array<int>",
    )
    hold = seq.limit(5).select(
        F.concat(F.lit("e-"), "doc_id").alias("doc_id"), "tokens"
    )
    q = ngram_contamination(seq, hold, "doc_id", "tokens", n=13, df_cap=100)
    p = plan_of(q)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "ResolvedHint" not in q._jdf.queryExecution().analyzed().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = hash_ranked_sample(
        ev.select("event_type", "event_id"), ["event_type"], "event_id", k=10
    )
    # the keys-only window must run over the (keys, _hb) COUNT frame, and the
    # raw-row window must carry the hash bucket in its partition spec
    tree = s._jdf.queryExecution().optimizedPlan().toString()
    for i, line in enumerate(tree.splitlines()):
        if "Window [" not in line:
            continue
        spec = line.split("], [")[1]
        if "_hb#" in spec:
            continue  # (keys, hash-bucket) local rank — parallel
        lines = tree.splitlines()
        child = next(
            (b for b in lines[i + 1 :] if " Sort [" not in b and "Exchange " not in b),
            "",
        )
        assert "Aggregate" in child, f"bare-key window over raw rows:\n{line}"


def test_fit_joins_broadcast_via_aqe_without_hints(spark, events):
    """VERDICT r05 #4: fit-frame joins (sigma fit, seasonal profile,
    thresholds, scalers) carry NO broadcast hint — the frames are
    key-proportional, and a forced hint bypasses AQE's size check (job
    death at 10⁶+ keys instead of a shuffle fallback). The logical plan
    must be hint-free, and at fixture scale AQE's runtime stats must still
    CHOOSE a broadcast join on its own — the fast path is preserved, just
    no longer forced."""
    from mtsad_spark.operators.stats import (
        seasonal_profile_residual,
        sigma_rule_stationary,
    )

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        for out in (
            sigma_rule_stationary(events, ["event_type"], "ts", "value", w=5),
            seasonal_profile_residual(events, ["event_type"], "ts", "value"),
        ):
            assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
            out.write.format("noop").mode("overwrite").save()
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")


def test_r6_ops_plans_are_scale_clean(spark, events):
    """r6 additions under the same static-plan bans: repeated_spans and
    token_distribution_drift must stay equi-join/bucket-local (no
    cartesian/nested-loop, no Python eval nodes, no broadcast hints on
    corpus-proportional frames), and the mixture sampler's raw-row windows
    must carry the hash bucket (its only bare-key windows run over the
    #sources/#buckets aggregate frames)."""
    from mtsad_spark.functions.text import tfidf_top_terms, token_distribution_drift
    from mtsad_spark.operators.dedup import repeated_spans
    from mtsad_spark.operators.splits import mixture_token_sample

    seq = spark.createDataFrame(
        [("d%d" % i, "s%d" % (i % 3), list(range(i, i + 30))) for i in range(50)],
        "doc_id string, source string, tokens array<int>",
    )
    for q, allow_scalar_cross in (
        (repeated_spans(seq, "doc_id", "tokens", n=13), False),
        (
            token_distribution_drift(
                seq.withColumn(
                    "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
                ),
                "ts",
                "tokens",
                900,
                100,
            ),
            False,
        ),
        # tfidf cross-joins the ONE-ROW corpus-count aggregate (the keyless
        # fit_join shape) — a broadcast nested-loop of a scalar is fine
        (
            tfidf_top_terms(
                seq.select("doc_id", F.concat_ws(" ", "tokens").alias("text")),
                "doc_id",
                "text",
            ),
            True,
        ),
    ):
        p = plan_of(q)
        assert "CartesianProduct" not in p
        if not allow_scalar_cross:
            assert "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "ResolvedHint" not in q._jdf.queryExecution().analyzed().toString()

    m = mixture_token_sample(
        seq.withColumn("n_tok", F.size("tokens")),
        "source",
        "doc_id",
        "n_tok",
        budget=300,
    )
    p = plan_of(m)
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p
    tree = m._jdf.queryExecution().optimizedPlan().toString()
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        spec = line.split("], [")[1]
        if "_hb#" in spec:
            continue  # (source, hash-bucket) local running sum — parallel
        child = next(
            (b for b in lines[i + 1 :] if " Sort [" not in b and "Exchange " not in b),
            "",
        )
        assert "Aggregate" in child or "Join" in child, (
            f"bare-key window over raw rows:\n{line}"
        )


def test_r6_robust_and_corpus_ops_are_scale_clean(spark):
    """Round-6 additions under the standing static-plan bans: the robust
    scorers (rolling median / Hampel) must stay pure JVM window algebra
    (no Python eval), the corpus-statistics family (zipf, PMI, entropy,
    novelty, jaccard) must be equi-join only (no cartesian / nested-loop),
    and none may carry explicit broadcast hints on corpus-proportional
    frames."""
    import datetime as dt

    from mtsad_spark.functions.text import (
        bigram_conditional_entropy,
        bigram_pmi,
        token_bucket_entropy,
        token_novelty,
        zipf_slope,
    )
    from mtsad_spark.operators.dedup import source_ngram_jaccard
    from mtsad_spark.operators.stats import hampel_filter, rolling_median

    t0 = dt.datetime(2024, 1, 1)
    tier = spark.createDataFrame(
        [("a", t0 + dt.timedelta(hours=i), 100 + i) for i in range(30)],
        "key string, ts timestamp, v long",
    )
    seq = spark.createDataFrame(
        [("s%d" % (i % 3), t0 + dt.timedelta(seconds=60 * i), list(range(i, i + 8)))
         for i in range(30)],
        "source string, ts timestamp, tokens array<int>",
    )
    docs = spark.createDataFrame(
        [("s%d" % (i % 3), "tok%d word%d the and" % (i, i % 7)) for i in range(30)],
        "source string, text string",
    )
    from mtsad_spark.operators.prefix import (
        interval_coverage,
        pack_training_windows,
    )
    from mtsad_spark.operators.rollup import rollup_partials_multi

    iv = spark.createDataFrame(
        [("u%d" % (i % 4), t0 + dt.timedelta(minutes=9 * i),
          t0 + dt.timedelta(minutes=9 * i + 5)) for i in range(20)],
        "key string, st timestamp, en timestamp",
    )
    packin = spark.createDataFrame(
        [("s%d" % (i % 3), i * 1000, "d%d" % i, 10 + i) for i in range(20)],
        "key string, ord long, doc_id string, n long",
    )
    ev2 = spark.createDataFrame(
        [("a", t0 + dt.timedelta(minutes=i), 100 + i, 3 + i % 5)
         for i in range(60)],
        "key string, ts timestamp, m1 long, m2 long",
    )
    frames = [
        rolling_median(tier, ["key"], "ts", "v", 5),
        hampel_filter(tier, ["key"], "ts", "v", 5),
        zipf_slope(docs, "source", "text", top_k=100),
        bigram_conditional_entropy(seq, "source", "tokens"),
        bigram_pmi(seq, "source", "tokens", min_count=1, top_k=5),
        source_ngram_jaccard(seq, "source", "tokens", n=2),
        token_novelty(seq, "ts", "tokens", 900),
        token_bucket_entropy(seq, "ts", "tokens", 900),
        interval_coverage(iv, ["key"], "st", "en"),
        pack_training_windows(packin, ["key"], "ord", "n", 64, coarse_width=4000),
        rollup_partials_multi(ev2, "ts", ["m1", "m2"], ["key"], "1m"),
    ]
    for i, f in enumerate(frames):
        p = plan_of(f)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, i
        assert "CartesianProduct" not in p, i
        assert "BroadcastNestedLoopJoin" not in p, i
        analyzed = f._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, i
