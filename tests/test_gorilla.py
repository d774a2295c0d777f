"""Gorilla codec: round-trip property tests (SURVEY.md §5.2 item 5) + Spark
pack/unpack integration with bitwise equality on every tier.
"""

from __future__ import annotations

import numpy as np
import pytest

from mtsad_spark.functions.gorilla import compress, decompress

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _roundtrip(ts, vals):
    blob = compress(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    t2, v2 = decompress(blob)
    assert np.array_equal(np.asarray(ts, np.int64), t2)
    a = np.asarray(vals, np.float64).view(np.uint64)
    b = v2.view(np.uint64)
    assert np.array_equal(a, b), "value bit patterns differ"
    return blob


def test_empty():
    blob = compress(np.empty(0, np.int64), np.empty(0, np.float64))
    t, v = decompress(blob)
    assert len(t) == 0 and len(v) == 0


def test_single_point():
    _roundtrip([1704067200], [3.14159])


def test_regular_minutes_constant():
    ts = 1704067200 + 60 * np.arange(500)
    blob = _roundtrip(ts, np.full(500, 42.5))
    # dod==0 + xor==0 → ~2 bits/point after the header
    assert len(blob) < 22 + 500 // 3


def test_irregular_ts_random_vals():
    rng = np.random.RandomState(7)
    ts = np.cumsum(rng.randint(1, 100000, 300)).astype(np.int64)
    vals = rng.randn(300) * 1e6
    _roundtrip(ts, vals)


def test_nan_inf_and_negatives():
    ts = 1704067200 + 60 * np.arange(8)
    vals = np.array([np.nan, 0.0, -0.0, np.inf, -np.inf, 1e-308, -1e308, np.nan])
    _roundtrip(ts, vals)


def test_step_series():
    ts = np.arange(100, dtype=np.int64) * 3600
    vals = np.where(np.arange(100) < 50, 1.0, 1e9)
    _roundtrip(ts, vals)


def test_backward_timestamps():
    # codec itself is order-agnostic (dod can be negative)
    _roundtrip([100, 50, 200, 199], [1.0, 2.0, 3.0, 4.0])


if HAVE_HYP:

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**40), max_value=2**40),
                st.floats(allow_nan=True, allow_infinity=True, width=64),
            ),
            min_size=0,
            max_size=200,
        )
    )
    def test_roundtrip_property(pairs):
        ts = [p[0] for p in pairs]
        vals = [p[1] for p in pairs]
        _roundtrip(ts, vals)


def test_spark_pack_unpack_all_tiers(spark, seq_df):
    from mtsad_spark.functions.gorilla import pack_rollup, unpack_rollup
    from mtsad_spark.operators.rollup import TIER_ORDER, rollup_tiers

    finalized, _ = rollup_tiers(seq_df, "ingest_ts", "n_tok", ["source"])
    for tier in TIER_ORDER:
        t = finalized[tier]
        packed = pack_rollup(t, ["source"], "mean", chunk="day")
        back = (
            unpack_rollup(packed, ["source"])
            .toPandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        orig = (
            t.select("source", "bucket_ts", "mean")
            .toPandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert len(back) == len(orig), tier
        assert (back["bucket_ts"].values == orig["bucket_ts"].values).all(), tier
        assert (
            back["value"].values.view(np.uint64) == orig["mean"].values.view(np.uint64)
        ).all(), tier


def test_i64_bit_reinterpret_roundtrip():
    """gorilla_pack_i64's contract at the kernel level: int64 payloads
    viewed as float64 bit patterns survive compress∘decompress bitwise —
    including values past 2^53 where a VALUE cast to double would round."""
    import numpy as np

    from mtsad_spark.functions.gorilla import compress, decompress

    vals = np.array(
        [0, 1, -1, 2**53 + 1, -(2**53) - 7, 2**62 + 12345, np.iinfo(np.int64).min + 1],
        dtype=np.int64,
    )
    ts = np.arange(len(vals), dtype=np.int64) * 60
    blob = compress(ts, vals.view(np.float64))
    t2, v2 = decompress(blob)
    assert (t2 == ts).all()
    assert (v2.view(np.int64) == vals).all()


def test_pack_partials_multicolumn_roundtrip(spark, seq_df):
    """pack_partials/unpack_partials: every PARTIAL column round-trips
    bitwise through its own per-column block, all sharing one ts stream."""
    from pyspark.sql import functions as F

    from mtsad_spark.functions.gorilla import pack_partials, unpack_partials
    from mtsad_spark.operators.rollup import PARTIAL_COLS, rollup_partials

    p = rollup_partials(seq_df, "ingest_ts", "n_tok", ["source"], "1m")
    packed = pack_partials(p, ["source"], PARTIAL_COLS, set(PARTIAL_COLS))
    back = unpack_partials(packed, ["source"], PARTIAL_COLS, set(PARTIAL_COLS))
    got = back.toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    want = p.toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in PARTIAL_COLS:
        assert (got[c].values == want[c].values).all(), c
    # block row count is bounded by (keys × days), and n_points audits the
    # explode: total points must equal the tier's row count
    n_pts = packed.agg(F.sum("n_points")).collect()[0][0]
    assert n_pts == len(want)


def test_pack_partials_partitioning_invariant(spark, seq_df):
    """Cold-tier blocks are BYTES-deterministic under any input partitioning
    (sort_array orders points before packing), so a compacted store's
    content never depends on cluster layout — the cross-parallelism
    determinism the north rule's tier-match criterion needs."""
    from pyspark.sql import functions as F

    from mtsad_spark.functions.gorilla import pack_partials
    from mtsad_spark.operators.rollup import PARTIAL_COLS, rollup_partials

    p = rollup_partials(seq_df, "ingest_ts", "n_tok", ["source"], "1m")
    a = (
        pack_partials(p, ["source"], PARTIAL_COLS, set(PARTIAL_COLS))
        .toPandas()
        .sort_values(["source", "chunk_start"])
        .reset_index(drop=True)
    )
    b = (
        pack_partials(p.repartition(7, "bucket_ts"), ["source"], PARTIAL_COLS, set(PARTIAL_COLS))
        .toPandas()
        .sort_values(["source", "chunk_start"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    for c in PARTIAL_COLS:
        col = f"block_{c}"
        assert all(bytes(x) == bytes(y) for x, y in zip(a[col], b[col])), col
