"""Two-cluster-size scaling bench (north rule: ≥0.8 efficiency N → 4N).

Sandbox proxy per BASELINE.md §2: the identical job + identical parquet input
at local[8] vs local[32], run in SEPARATE processes (a shared JVM would lie
about parallelism). Reports throughput at both levels, scaling efficiency
thr32/(4·thr8), and the per-tier output hashes which must be identical
(determinism rides along for free with the exact partial algebra).

Writes BENCH/BASELINE.md. Usage:  python tools/bench_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str]) -> dict:
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"no JSON from {cmd}: {out.stdout[-500:]} {out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_SEQ_ROWS", "8000000"))
    workdir = os.environ.get("BENCH_WORKDIR", tempfile.mkdtemp(prefix="mtsad-scaling-"))
    input_dir = os.path.join(workdir, "sequences")

    py = sys.executable
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        print(f"generating {rows} rows → {input_dir}", file=sys.stderr)
        run([py, "-m", "mtsad_spark.bench_job", "--cores", "32", "--input", input_dir,
             "--generate-rows", str(rows)])

    results = {}
    for cores in (8, 32):
        t0 = time.time()
        r = run([py, "-m", "mtsad_spark.bench_job", "--cores", str(cores), "--input", input_dir])
        r["proc_wall_s"] = round(time.time() - t0, 1)
        results[cores] = r
        print(json.dumps(r), file=sys.stderr)

    thr8, thr32 = results[8]["rows_per_sec"], results[32]["rows_per_sec"]
    eff = thr32 / (4 * thr8)
    same_hashes = results[8]["tier_hashes"] == results[32]["tier_hashes"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling + determinism evidence

Job: full sequence pipeline (scan parquet → 1m/1h/1d exact rollup cascade →
LOCF gap-fill → sliding z-score → chunked EWMA → Gorilla pack), identical
input at both parallelism levels, separate JVM processes
(mtsad_spark/bench_job.py via tools/bench_scaling.py).

Input: {rows:,} synthesized tokenized-sequence rows (fixtures.sequences,
seed=42, 7 days of 1m buckets, skewed sources), parquet at {input_dir}.

| parallelism | wall (s) | throughput (sequences/sec) |
|---|---|---|
| local[8]  (N)  | {results[8]["wall_s"]} | {thr8:,.0f} |
| local[32] (4N) | {results[32]["wall_s"]} | {thr32:,.0f} |

**Scaling efficiency (N → 4N): {eff:.3f}** (target ≥ 0.8)

Determinism: per-tier commutative output hashes identical across levels →
**{same_hashes}**
```json
{json.dumps(results[8]["tier_hashes"], indent=2)}
```

Notes: single host, 32 physical cores — the local[8] run still shares memory
bandwidth/LLC with nothing else, so this proxy slightly UNDER-estimates what a
real 8-node→32-node scale-out achieves when per-node resources are constant.
Shuffle-partition count scales with cores (8 vs 32) keeping one partition per
core; same code path, same configs otherwise.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    if not same_hashes:
        sys.exit(2)


if __name__ == "__main__":
    main()
