"""Reader knobs (S1-S3) + the python -m mtsad_spark CLI entrypoint."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd


def test_read_mts_table_knobs(spark, tmp_path):
    from mtsad_spark.sources.readers import read_mts_table

    pdf = pd.DataFrame(
        {
            "t": pd.date_range("2020-01-01", periods=50, freq="h").strftime("%Y-%m-%d %H:%M:%S"),
            "v0": np.arange(50.0),
            "v1": np.arange(50.0) * 2,
            "tag": ["n"] * 50,
        }
    )
    p = str(tmp_path / "mts.tsv")
    pdf.to_csv(p, sep="\t", index=False)
    df = read_mts_table(
        spark, p, schema="t string, v0 double, v1 double, tag string",
        sep="\t", ts_col="t", usecols=["t", "v0"], nrows=10,
    )
    out = df.toPandas()
    assert list(out.columns) == ["t", "v0"]
    assert len(out) == 10
    assert str(out["t"].dtype).startswith("datetime64")


def test_read_float_series(spark, tmp_path):
    from mtsad_spark.sources.readers import read_float_series

    p = str(tmp_path / "series.txt")
    vals = np.sin(np.arange(100) / 7.0)
    with open(p, "w") as f:
        f.write("\n".join(str(v) for v in vals))
    out = read_float_series(spark, p).orderBy("idx").toPandas()
    assert len(out) == 100
    assert np.allclose(out["value"].values, vals)


def test_cli_pipeline_end_to_end(tmp_path):
    """python -m mtsad_spark --synthesize-rows ... runs the full checkpointed
    pipeline in a fresh process (the spark-submit path)."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out_dir = str(tmp_path / "pipe")
    r = subprocess.run(
        [sys.executable, "-m", "mtsad_spark", "--input", "unused", "--output", out_dir,
         "--synthesize-rows", "5000"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    stages = {s["stage"]: s["status"] for s in payload["stages"]}
    assert stages["partials_1m"] == "computed"
    assert stages["scores_1m"] == "computed"
    assert os.path.exists(f"{out_dir}/rollup_1d/_SUCCESS")
