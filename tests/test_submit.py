"""spark-submit --py-files launch path (north rule: the engine must run via
spark-submit on a cluster, i.e. executors import the package from the
shipped zip, not from a checked-out repo)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_runs_bench_job(spark, seq_df, tmp_path):
    """Build dist/mtsad_spark.zip, then spark-submit the launcher from a
    BARE working directory (no repo on sys.path) — the pipeline must run
    end-to-end purely off the --py-files artifact and print its result
    JSON. Skipped only if no spark-submit binary exists."""
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("no spark-submit on PATH")

    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "mtsad_spark.zip"))
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert "mtsad_spark/bench_job.py" in names
    assert not any(n.endswith(".pyc") for n in names)

    inp = str(tmp_path / "seq")
    seq_df.write.mode("overwrite").parquet(inp)
    launcher = str(tmp_path / "launcher.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_launcher.py"), launcher)

    workdir = tmp_path / "bare"
    workdir.mkdir()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            launcher,
            "--cores", "2",
            "--input", inp,
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no result JSON: stdout={out.stdout[-800:]} stderr={out.stderr[-800:]}"
    res = json.loads(lines[-1])
    assert res["rows"] == seq_df.count()
    assert res["rows_per_sec"] > 0
    assert set(res["tier_hashes"]) >= {"rollup_1m", "rollup_1h", "rollup_1d"}
