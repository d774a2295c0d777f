"""Gap-fill (W7 LOCF / W8 linear) vs pandas reindex+ffill/interpolate oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mtsad_spark.operators.gapfill import dense_spine, gap_fill
from mtsad_spark.operators.rollup import rollup_tiers


@pytest.fixture(scope="module")
def rollup_1m(seq_df):
    finalized, _ = rollup_tiers(seq_df, "ingest_ts", "n_tok", ["source"])
    return finalized["1m"].cache()


def _oracle(pdf: pd.DataFrame, method: str) -> pd.DataFrame:
    outs = []
    for src, g in pdf.groupby("source"):
        g = g.set_index("bucket_ts").sort_index()
        full = pd.date_range(g.index.min(), g.index.max(), freq="min")
        r = g.reindex(full)
        filled = r["mean"].isna()
        if method == "locf":
            r["mean"] = r["mean"].ffill()
        else:
            # interior-only linear interpolation against the REAL timestamps
            r["mean"] = r["mean"].interpolate(method="index", limit_area="inside")
        r["source"] = src
        r["gap_filled"] = filled
        outs.append(r.reset_index(names="bucket_ts"))
    return (
        pd.concat(outs)[["source", "bucket_ts", "mean", "gap_filled"]]
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_spine_is_dense(spark, rollup_1m):
    spine = dense_spine(rollup_1m, ["source"], "1m").toPandas()
    for src, g in spine.groupby("source"):
        ts = g["bucket_ts"].sort_values().values
        deltas = np.diff(ts).astype("timedelta64[s]").astype(int)
        assert (deltas == 60).all(), src


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_gap_fill_vs_pandas(spark, rollup_1m, method):
    got = (
        gap_fill(rollup_1m, ["source"], "1m", ["mean"], method=method)
        .select("source", "bucket_ts", "mean", "gap_filled")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = _oracle(
        rollup_1m.select("source", "bucket_ts", "mean").toPandas(), method
    )
    assert len(got) == len(want)
    assert (got["gap_filled"].values == want["gap_filled"].values).all()
    a, b = got["mean"].values, want["mean"].values
    nan_a, nan_b = pd.isna(a), pd.isna(b)
    assert (nan_a == nan_b).all()
    assert np.allclose(
        a[~nan_a].astype(float), b[~nan_b].astype(float), rtol=1e-12, atol=0
    )
    # some gaps must actually exist in the fixture (injected empty minutes)
    assert got["gap_filled"].sum() > 0


def test_gap_fill_zero_count_semantics(spark, rollup_1m):
    got = gap_fill(rollup_1m, ["source"], "1m", ["mean"], method="locf")
    bad = got.filter("gap_filled and cnt != 0").count()
    assert bad == 0
    tiers = [r[0] for r in got.select("tier").distinct().collect()]
    assert tiers == ["1m"]
