"""Golden tests for operators/alerts.episodes (gaps-and-islands alerting)."""

from __future__ import annotations

import datetime as dt

import pytest

from mtsad_spark.operators.alerts import episodes


def _rows(spark, hot_buckets, key="a", width=60):
    """Build tier-point rows at minute buckets; hot_buckets is a set of
    bucket indexes that are flagged, with value = 10*idx."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (key, base + dt.timedelta(seconds=width * i), i in hot_buckets, 10 * i)
        for i in range(max(hot_buckets) + 3)
    ]
    return spark.createDataFrame(data, "k string, bt timestamp, is_hot boolean, v long")


def _py_episodes(hot_idx, width, merge_gap, min_len):
    """Pure-python oracle: merge sorted hot bucket indexes into episodes."""
    eps, cur = [], None
    for i in sorted(hot_idx):
        if cur is not None and (i - cur[-1]) <= merge_gap + 1:
            cur.append(i)
        else:
            if cur is not None:
                eps.append(cur)
            cur = [i]
    if cur is not None:
        eps.append(cur)
    out = []
    for e in eps:
        if len(e) >= min_len:
            out.append(
                (e[0], e[-1], len(e), (e[-1] - e[0]) * width + width,
                 max(10 * i for i in e), sum(10 * i for i in e))
            )
    return out


@pytest.mark.parametrize(
    "hot,gap,minlen",
    [
        ({1, 2, 3, 7, 8, 20}, 0, 1),        # three plain runs
        ({1, 2, 4, 5, 9}, 1, 1),            # gap=1 bridges 2→4
        ({1, 2, 4, 5, 9}, 1, 3),            # min_len drops the singleton
        ({0, 5, 10, 15}, 0, 2),             # all singletons dropped
        ({3}, 2, 1),                        # one bucket
    ],
)
def test_episodes_vs_python(spark, hot, gap, minlen):
    df = _rows(spark, hot)
    got = (
        episodes(df, ["k"], "bt", 60, val_col="v", merge_gap=gap, min_len=minlen)
        .orderBy("start_ts")
        .collect()
    )
    base = dt.datetime(2024, 1, 1)
    want = _py_episodes(hot, 60, gap, minlen)
    assert len(got) == len(want)
    for r, (s, e, n, dur, peak, sv) in zip(got, want):
        assert r.start_ts == base + dt.timedelta(seconds=60 * s)
        assert r.end_ts == base + dt.timedelta(seconds=60 * e)
        assert (r.n_hot, r.duration_s, r.peak_val, r.sum_val) == (n, dur, peak, sv)


def test_episodes_multi_key_and_missing_buckets(spark):
    """Keys never merge across each other; missing (not merely cold) buckets
    count toward the gap exactly like cold ones."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(minutes=0), True, 1),
        ("a", base + dt.timedelta(minutes=2), True, 2),  # bucket 1 absent
        ("b", base + dt.timedelta(minutes=1), True, 3),
    ]
    df = spark.createDataFrame(rows, "k string, bt timestamp, is_hot boolean, v long")
    got = {
        (r.k, r.n_hot, r.duration_s)
        for r in episodes(df, ["k"], "bt", 60, val_col="v", merge_gap=1).collect()
    }
    assert got == {("a", 2, 180), ("b", 1, 60)}
    got0 = episodes(df, ["k"], "bt", 60, val_col="v", merge_gap=0).collect()
    # the absent bucket splits key a into two singleton episodes at gap=0
    assert len(got0) == 3 and all(r.n_hot == 1 for r in got0)


def test_episodes_validates_args(spark):
    df = _rows(spark, {1})
    for kw in ({"merge_gap": -1}, {"min_len": 0}):
        with pytest.raises(ValueError):
            episodes(df, ["k"], "bt", 60, **kw)
    with pytest.raises(ValueError):
        episodes(df, ["k"], "bt", 0)
