"""Scaling-efficiency evidence: the SAME rollup job at local[8] vs
local[32] on the same input (north rule: N vs 4N executors ≥ 0.8).

Each parallelism level runs in its own subprocess (fresh JVM — no
shared-executor contamination), executing jobs/rollup_job.py on a
pre-materialized deterministic transcripts parquet. Writes
BENCH/BASELINE.md with throughput at both levels and the efficiency.

Usage: python scripts/scaling_bench.py [--convs N] [--repeats R]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_input(n_convs: int, path: str) -> int:
    """Materialize the bench transcripts once (deterministic seed)."""
    marker = os.path.join(path, "_COUNT")
    if os.path.exists(marker):
        return int(open(marker).read())
    from yahoo_anomaly_detection_spark.session import get_spark
    from yahoo_anomaly_detection_spark.synthgen import gen_transcripts

    spark = get_spark("scaling-gen", cores=32, shuffle_partitions=64)
    df = gen_transcripts(spark, n_convs=n_convs, seed=42, partitions=128)
    df.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    with open(marker, "w") as f:
        f.write(str(n))
    spark.stop()
    return n


def run_job(cpus: int, input_path: str, run_id: str) -> dict:
    cat = tempfile.mkdtemp(prefix=f"scaling_cat_{cpus}_")
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SHUFFLE=str(max(cpus * 2, 16)))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "rollup_job.py"),
             "--input", input_path, "--catalog-root", cat,
             "--run-id", run_id],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    finally:
        shutil.rmtree(cat, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int,
                    default=int(os.environ.get("SCALING_CONVS", "120000")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--input", default=os.path.join(REPO, ".bench",
                                                    "transcripts"))
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.input), exist_ok=True)
    n_turns = ensure_input(args.convs, args.input)
    print(f"input: {n_turns} turns at {args.input}")

    results: dict[int, dict] = {}
    for cpus in (8, 32):
        best = None
        for r in range(args.repeats):
            m = run_job(cpus, args.input, f"scal_{cpus}_{r}")
            print(f"local[{cpus}] run {r}: wall={m['wall_sec']}s "
                  f"tps={m['turns_per_sec']}")
            if best is None or m["turns_per_sec"] > best["turns_per_sec"]:
                best = m
        results[cpus] = best

    tp8 = results[8]["turns_per_sec"]
    tp32 = results[32]["turns_per_sec"]
    eff = tp32 / (4 * tp8)
    print(f"throughput local[8]={tp8} local[32]={tp32} efficiency={eff:.3f}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — scaling efficiency evidence (north rule)

Same rollup job (`jobs/rollup_job.py`: bronze scan → per-turn latency
(lag over stable turn order) → 1m tier → 1h/1d recombination cascade →
catalog-committed tier tables with checkpoints + lineage) on the SAME
deterministic synthetic transcripts input, at two parallelism levels
in separate JVMs. In-sandbox stand-in for N vs 4N executors (no real
cluster available): local[8] vs local[32] on the 32-core host.

| config | input turns | wall (s) | throughput (turns/s) |
| --- | --- | --- | --- |
| local[8]  (N)  | {n_turns} | {results[8]['wall_sec']} | {tp8:,.0f} |
| local[32] (4N) | {n_turns} | {results[32]['wall_sec']} | {tp32:,.0f} |

**Scaling efficiency = tp(4N) / (4 × tp(N)) = {eff:.3f}**
(north-rule acceptance: ≥ 0.8; best of {args.repeats} repeats per
level to suppress shared-host noise)

Per-stage seconds (best runs):

| stage | local[8] | local[32] |
| --- | --- | --- |
""")
        for k in results[8]["stages"]:
            if k.endswith("_rows") or k.endswith("_snapshot"):
                continue
            f.write(f"| {k} | {results[8]['stages'][k]} | "
                    f"{results[32]['stages'][k]} |\n")
        rows = {k: v for k, v in results[32]["stages"].items()
                if k.endswith("_rows")}
        f.write("\nTier row counts (identical at both levels — "
                f"determinism across parallelism): {rows}\n")
    print("wrote BENCH/BASELINE.md")

    # determinism across parallelism: tier row counts must match
    for k in results[8]["stages"]:
        if k.endswith("_rows"):
            assert results[8]["stages"][k] == results[32]["stages"][k], k
    print("tier row counts identical across parallelism levels")


if __name__ == "__main__":
    main()
