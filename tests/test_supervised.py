"""W1-W4 + splits vs pandas oracles, including the reference's own
series_to_supervised shift semantics (prediction/lstm_mts.py:192-230)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mtsad_spark.fixtures import uts_plain, uts_plain_df
from mtsad_spark.operators.splits import (
    dropin_augment,
    fraction_split,
    label_encode,
    positional_slice,
    stratified_split,
)
from mtsad_spark.operators.supervised import (
    difference,
    inverse_difference,
    shift_tags,
    sliding_windows,
    stack_long,
    to_supervised,
)


def series_to_supervised_oracle(df: pd.DataFrame, n_in: int, n_out: int) -> pd.DataFrame:
    """Literal reimplementation of the reference helper's semantics
    (shift(i) for i in n_in..1, shift(-i) for 0..n_out-1, dropna)."""
    cols, names = [], []
    n_vars = df.shape[1]
    for i in range(n_in, 0, -1):
        cols.append(df.shift(i))
        names += [f"var{j + 1}(t-{i})" for j in range(n_vars)]
    for i in range(0, n_out):
        cols.append(df.shift(-i))
        names += [f"var{j + 1}(t)" if i == 0 else f"var{j + 1}(t+{i})" for j in range(n_vars)]
    agg = pd.concat(cols, axis=1)
    agg.columns = names
    return agg.dropna()


@pytest.fixture(scope="module")
def uts(spark):
    return uts_plain_df(spark, size=300).withColumn("k", F.lit("a")).cache()


@pytest.fixture(scope="module")
def uts_pdf():
    return uts_plain(size=300)


@pytest.mark.parametrize("n_in,n_out", [(1, 1), (3, 1), (2, 2), (5, 3)])
def test_to_supervised_vs_reference_oracle(spark, uts, uts_pdf, n_in, n_out):
    got = (
        to_supervised(uts, ["k"], "idx", ["value"], n_in, n_out)
        .orderBy("idx")
        .toPandas()
    )
    want = series_to_supervised_oracle(uts_pdf[["value"]], n_in, n_out)
    assert len(got) == len(want)
    for c in want.columns:
        assert np.allclose(got[c].values, want[c].values, rtol=1e-12), c


def test_to_supervised_multivar(spark):
    pdf = pd.DataFrame({"idx": range(50), "a": np.arange(50.0), "b": np.arange(50.0) * 2})
    df = spark.createDataFrame(pdf).withColumn("k", F.lit("x"))
    got = to_supervised(df, ["k"], "idx", ["a", "b"], 2, 1).orderBy("idx").toPandas()
    want = series_to_supervised_oracle(pdf[["a", "b"]], 2, 1)
    for c in want.columns:
        assert np.allclose(got[c].values, want[c].values), c


def test_difference_and_inverse(spark, uts, uts_pdf):
    d = difference(uts, ["k"], "idx", "value", lag=3)
    got = d.orderBy("idx").toPandas()["diff"].values
    want = uts_pdf["value"].diff(3).values
    assert np.allclose(got[3:], want[3:], rtol=1e-12)
    assert np.isnan(got[:3]).all()
    inv = inverse_difference(d, ["k"], "idx", "diff", "value", lag=3)
    gi = inv.orderBy("idx").toPandas()["undiff"].values
    assert np.allclose(gi[3:], uts_pdf["value"].values[3:], rtol=1e-12)


def test_sliding_windows_last_tag(spark):
    pdf = pd.DataFrame(
        {"idx": range(20), "v": np.arange(20.0), "tag": [-1] * 15 + [1] * 5}
    )
    df = spark.createDataFrame(pdf).withColumn("k", F.lit("x"))
    got = sliding_windows(df, ["k"], "idx", ["v"], w=4, tag_col="tag").orderBy("idx").toPandas()
    assert len(got) == 17  # 20 - (4-1)
    first = got.iloc[0]
    assert list(first["v_win"]) == [0.0, 1.0, 2.0, 3.0]
    # window tag == tag of last row (J5 / lstm_model.py:110-112)
    assert (got["win_tag"].values == pdf["tag"].values[3:]).all()


def test_shift_tags(spark, uts):
    df = uts.withColumn("tag", (F.col("idx") % 7 == 0).cast("int"))
    got = shift_tags(df, ["k"], "idx", "tag", 5).orderBy("idx").toPandas()
    want = got["tag"].shift(5).values
    m = ~pd.isna(got["tag_shifted"].values)
    assert (got["tag_shifted"].values[m] == want[m]).all()


def test_stack_long(spark):
    pdf = pd.DataFrame({"idx": [0, 1], "v0": [1.0, 2.0], "v1": [3.0, 4.0]})
    df = spark.createDataFrame(pdf)
    got = stack_long(df, ["idx"], ["v0", "v1"]).orderBy("idx", "dim").toPandas()
    assert list(got["value"]) == [1.0, 3.0, 2.0, 4.0]


def test_positional_slice_and_splits(spark, uts, uts_pdf):
    got = positional_slice(uts, "idx", 10, 20).orderBy("idx").toPandas()
    assert list(got["idx"]) == list(range(10, 20))
    train, test = fraction_split(uts, "idx", 0.8)
    n_train, n_test = train.count(), test.count()
    assert n_train == 240 and n_test == 60
    assert train.agg(F.max("idx")).collect()[0][0] < test.agg(F.min("idx")).collect()[0][0]


def test_stratified_split(spark):
    pdf = pd.DataFrame({"idx": range(100), "cls": ["a"] * 80 + ["b"] * 20})
    df = spark.createDataFrame(pdf)
    train, test = stratified_split(df, "idx", "cls", 0.75)
    tr = train.groupBy("cls").count().toPandas().set_index("cls")["count"]
    te = test.groupBy("cls").count().toPandas().set_index("cls")["count"]
    assert tr["a"] == 60 and te["a"] == 20
    assert tr["b"] == 15 and te["b"] == 5


def test_label_encode_and_dropin(spark):
    pdf = pd.DataFrame({"tag": ["anormal", "normal", "normal", "anormal"]})
    df = spark.createDataFrame(pdf)
    got = label_encode(df, "tag", {"anormal": 1, "normal": -1}).toPandas()
    assert list(got["tag_encoded"]) == [1, -1, -1, 1]
    aug = dropin_augment(spark.range(200).withColumn("v", F.col("id")), factor_max=10, seed=1)
    n = aug.count()
    assert 200 * 2 < n < 200 * 10  # E ≈ 5x, bounded outcome
    # deterministic across reruns
    assert aug.count() == n


def test_dropin_augment_hashed_matches_md5_oracle(spark):
    """Portable O8 variant: copy counts must equal an independent hashlib.md5
    computation per id, be partitioning-independent, and drop n==0 rows."""
    import hashlib

    from mtsad_spark.operators.splits import dropin_augment_hashed

    base = spark.range(100).withColumn("v", F.col("id") * 2)
    aug = dropin_augment_hashed(base, "id", factor_max=10, seed=42)
    got = aug.groupBy("id").count().toPandas().set_index("id")["count"].to_dict()
    for i in range(100):
        n = int(hashlib.md5(f"42|{i}".encode()).hexdigest()[:8], 16) % 10
        assert got.get(i, 0) == n, f"id {i}: expected {n} copies, got {got.get(i, 0)}"
    # partitioning-independent: same multiset under a different layout
    re = dropin_augment_hashed(base.repartition(7), "id", factor_max=10, seed=42)
    got2 = re.groupBy("id").count().toPandas().set_index("id")["count"].to_dict()
    assert got == got2


def test_seeded_shuffle_md5_matches_hashlib_and_partitioning(spark):
    """O1 portable form: the shuffle position must equal an independent
    hashlib.md5 ranking and survive any input partitioning."""
    import hashlib

    from mtsad_spark.operators.splits import seeded_shuffle

    ids = spark.range(200).select(F.col("id").cast("long").alias("id"))
    got = (
        seeded_shuffle(ids, seed=42, hash="md5", pos_col="pos")
        .toPandas().set_index("id")["pos"].to_dict()
    )
    keys = {
        i: int(hashlib.md5(f"42|{i}".encode()).hexdigest()[:15], 16) for i in range(200)
    }
    want = {i: p for p, (i, _) in enumerate(sorted(keys.items(), key=lambda kv: (kv[1], kv[0])))}
    assert got == want
    got2 = (
        seeded_shuffle(ids.repartition(7), seed=42, hash="md5", pos_col="pos")
        .toPandas().set_index("id")["pos"].to_dict()
    )
    assert got2 == want
