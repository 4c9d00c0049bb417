"""Multi-EXECUTOR scaling evidence via spark-submit --py-files (north rule).

The north rule asks for the job to run "via spark-submit --py-files on
a multi-executor cluster at two cluster sizes (N and 4N executors)".
`scripts/scaling_bench.py` evidences the throughput-scaling half with
single-JVM local[N] thread parallelism; THIS harness evidences the
deployment half with the closest thing the sandbox can grant to a real
cluster: **`local-cluster[N,cores,mem]`** — Spark's pseudo-cluster
master that spawns N genuinely separate executor JVM processes behind
a standalone-style scheduler. Unlike local[N]:

- executors are separate OS processes with their own heaps, off-heap
  pools and Python worker pools (no shared-JVM shortcuts);
- shuffle blocks are fetched between block managers over the
  Netty transfer service, exactly as on a real cluster;
- the `yahoo_anomaly_detection_spark` package reaches executor Python
  workers ONLY through the `--py-files` zip (the harness scrubs
  PYTHONPATH from the submit environment and verifies, via a
  mapInPandas probe, that the package imports from the zip path on
  executors — see `BENCH/CLUSTER.md`).

What it runs, at 1 executor (N) vs 4 executors (4N), same cores each:

1. a --py-files import probe (package must resolve to the zip on
   executors);
2. the tier cascade (`jobs/rollup_job.py --sink noop --warmup`),
   interleaved best-of-R, efficiency = tps(4N) / (4 * tps(N));
3. one full-pipeline run per level with the catalog parquet sink on a
   smaller input — the EWMA `applyInPandas` and Gorilla `mapInPandas`
   stages execute on executor Python workers fed by the zip, and the
   committed tier/stat row counts must be IDENTICAL across cluster
   sizes (determinism across physical parallelism).

Caveats kept honest in the report: all executors share one guest's
silicon, memory bandwidth and page cache, so the same hardware-probe
ceiling normalization as scaling_bench applies; cores-per-executor is
kept at 2 so the 1->4 executor pair stays inside the host's healthy
2->8-thread capacity range.

Usage: python scripts/cluster_scaling_bench.py [--convs N] [--repeats R]
       [--skip-probe] [--skip-full] [--out BENCH/CLUSTER.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import ensure_input, hardware_probe, measure  # noqa: E402
from submit_common import build_pyfiles_zip, find_spark_submit  # noqa: E402

EXEC_LEVELS = (1, 4)  # executors: N and 4N
CORES_PER_EXEC = 2  # 1->4 executors = 2->8 cores, the host's healthy pair
WORKER_MEM_MB = 8192  # local-cluster worker memory (must cover executor)
EXEC_MEM = "4g"
EXEC_OFFHEAP = "2g"  # session.py reads SPARK_OFFHEAP_MEM (per executor)
SHUFFLE = 64  # data-sized, identical at both cluster sizes
SCRATCH = "/dev/shm/spark-scratch"


def make_pyfiles_zip(out: str) -> str:
    """Zip the package exactly as a user would ship it to spark-submit:
    `python scripts/cluster_scaling_bench.py --make-zip-only` emits the
    same artifact for a real cluster. Shared builder with
    scripts/submit_smoke.py (submit_common)."""
    return build_pyfiles_zip(out)


def _submit_bin() -> str:
    return find_spark_submit()


def _submit_env() -> dict:
    # scrub PYTHONPATH: executor Python workers must get the package
    # from --py-files alone, or the evidence proves nothing
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update(
        SPARK_LOCAL_DIRS=SCRATCH,
        SPARK_OFFHEAP_MEM=EXEC_OFFHEAP,
        SPARK_GRAFT_SHUFFLE=str(SHUFFLE),
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    return env


def _submit_cmd(n_exec: int, zip_path: str, primary: str,
                job_args: list[str]) -> list[str]:
    return [
        _submit_bin(),
        "--master", f"local-cluster[{n_exec},{CORES_PER_EXEC},"
                    f"{WORKER_MEM_MB}]",
        "--driver-memory", "8g",
        "--conf", f"spark.executor.memory={EXEC_MEM}",
        # AlwaysPreTouch: fault in the whole heap at JVM startup,
        # BEFORE the warmup pass and the timed section. This sandbox
        # host has multi-minute degraded-memory episodes where fresh
        # first-touch page faults run ~1000x slow; without pretouch
        # the 4N cluster size (4x more fresh JVM memory) absorbs 4x
        # the fault storm INSIDE its first timed stages — measured: a
        # 4-executor warmup frozen 5.5 min with zero task completions
        # while 24 GB of heap faulted in. On a real cluster the same
        # flag is standard benchmarking practice.
        "--driver-java-options", "-XX:+AlwaysPreTouch",
        "--conf", "spark.executor.extraJavaOptions=-XX:+AlwaysPreTouch",
        "--py-files", zip_path,
        primary,
        *job_args,
    ]


def run_submit(n_exec: int, input_path: str, run_id: str, sink: str,
               full: bool, zip_path: str, extra: list[str] | None = None,
               ) -> dict:
    """One spark-submit rollup_job run on a local-cluster of n_exec
    executors; returns the job's metrics dict (same shape as
    scaling_bench.run_job, so measure() interleaving is reused)."""
    cat = tempfile.mkdtemp(prefix=f"cluster_cat_{n_exec}_")
    os.makedirs(SCRATCH, exist_ok=True)
    job_args = ["--input", input_path, "--catalog-root", cat,
                "--run-id", run_id, "--sink", sink, "--warmup",
                *(extra or [])]
    if full:
        job_args.append("--full")
    cmd = _submit_cmd(n_exec, zip_path,
                      os.path.join(REPO, "jobs", "rollup_job.py"), job_args)
    canary = _canary()  # host memory state at launch (healthy < 0.5 s)
    try:
        out = subprocess.run(cmd, env=_submit_env(), capture_output=True,
                             text=True, timeout=3600)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"spark-submit rollup_job (local-cluster[{n_exec},"
                f"{CORES_PER_EXEC},{WORKER_MEM_MB}]) exited "
                f"{out.returncode} with no metrics line; stderr tail:\n"
                + "\n".join(out.stderr.splitlines()[-60:])
            )
        m = json.loads(lines[-1])
        m["canary_sec"] = canary
        return m
    finally:
        shutil.rmtree(cat, ignore_errors=True)


def _canary() -> float:
    """First-touch cost of a fresh 240 MB allocation (seconds) —
    same probe as bench.py. Healthy host ~0.03-0.1 s; a degraded
    memory-backend episode reads 10-40 s. Recorded per measured run
    so the report can show which samples a degraded host touched."""
    import numpy as np

    t0 = time.time()
    np.arange(30_000_000)
    return round(time.time() - t0, 3)


_PROBE_SRC = '''\
"""--py-files probe: on each executor, import the engine package inside
a mapInPandas worker and report where it was imported from."""
import pandas as pd
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("pyfiles-probe").getOrCreate()


def which_module(batches):
    import yahoo_anomaly_detection_spark as m

    for b in batches:
        yield pd.DataFrame({"n": [len(b)], "src": [m.__file__]})


df = spark.range(0, 64, 1, 8).mapInPandas(which_module,
                                          "n long, src string")
srcs = sorted({r.src for r in df.collect()})
print("PROBE_SRCS=" + "|".join(srcs))
spark.stop()
'''


def verify_pyfiles(zip_path: str, n_exec: int = 2) -> list[str]:
    """Assert the package import on executor Python workers resolves to
    the --py-files zip (PYTHONPATH scrubbed, driver never imports it)."""
    with tempfile.NamedTemporaryFile("w", suffix="_probe.py",
                                     delete=False) as f:
        f.write(_PROBE_SRC)
        probe = f.name
    try:
        cmd = _submit_cmd(n_exec, zip_path, probe, [])
        out = subprocess.run(cmd, env=_submit_env(), capture_output=True,
                             text=True, timeout=600)
        marks = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("PROBE_SRCS=")]
        if out.returncode != 0 or not marks:
            raise RuntimeError(
                f"pyfiles probe failed (exit {out.returncode}); stderr "
                "tail:\n" + "\n".join(out.stderr.splitlines()[-30:])
            )
        srcs = marks[-1][len("PROBE_SRCS="):].split("|")
        bad = [s for s in srcs if ".zip" not in s]
        if bad:
            raise RuntimeError(
                "package imported OUTSIDE the --py-files zip on some "
                f"executor: {bad} — evidence would be vacuous"
            )
        return srcs
    finally:
        os.unlink(probe)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int,
                    default=int(os.environ.get("SCALING_CONVS", "500000")))
    ap.add_argument("--full-convs", type=int, default=100000,
                    help="smaller input for the full-pipeline "
                         "determinism runs (Python stages are ~8x the "
                         "tier cost)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--input", default=os.path.join(REPO, ".bench",
                                                    "transcripts"))
    ap.add_argument("--full-input",
                    default=os.path.join(REPO, ".bench", "transcripts_f"))
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--make-zip-only", action="store_true",
                    help="just (re)build the --py-files artifact and exit")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH", "CLUSTER.md"),
                    help="report path — OVERWRITTEN; point elsewhere for "
                         "validation runs")
    args = ap.parse_args()

    zip_path = make_pyfiles_zip(os.path.join(REPO, ".bench", "yads.zip"))
    print(f"--py-files artifact: {zip_path} "
          f"({os.path.getsize(zip_path)} bytes)")
    if args.make_zip_only:
        return

    os.makedirs(os.path.dirname(args.input), exist_ok=True)
    n_turns = ensure_input(args.convs, args.input)
    print(f"input: {n_turns:,} turns at {args.input}")

    probe_srcs: list[str] = []
    if not args.skip_probe:
        probe_srcs = verify_pyfiles(zip_path)
        print("pyfiles probe OK:", probe_srcs)

    print("hardware probe (pure-CPU multiprocessing ceiling)...",
          flush=True)
    ratio = EXEC_LEVELS[1] / EXEC_LEVELS[0]  # never hardcode the 4
    core_a = EXEC_LEVELS[0] * CORES_PER_EXEC
    core_b = EXEC_LEVELS[1] * CORES_PER_EXEC
    hw = hardware_probe(per_level=2, levels=(core_a, core_b))
    hw_ceiling = hw[core_b] / (ratio * hw[core_a])
    print(f"hardware {core_a}->{core_b}-thread ceiling: {hw_ceiling:.3f}",
          flush=True)

    def runner(n_exec, input_path, run_id, sink, full):
        return run_submit(n_exec, input_path, run_id, sink, full, zip_path)

    tiers = measure("cl_tiers", "noop", False, args.input, args.repeats,
                    levels=EXEC_LEVELS, runner=runner)
    eff = (tiers[EXEC_LEVELS[1]]["best"]["turns_per_sec"]
           / (ratio * tiers[EXEC_LEVELS[0]]["best"]["turns_per_sec"]))
    eff_med = (tiers[EXEC_LEVELS[1]]["median_tps"]
               / (ratio * tiers[EXEC_LEVELS[0]]["median_tps"]))
    print(f"cluster tiers efficiency best={eff:.3f} median={eff_med:.3f} "
          f"(hw ceiling {hw_ceiling:.3f})")

    full_rows: dict[int, dict] = {}
    full_metrics: dict[int, dict] = {}
    if not args.skip_full:
        nf = ensure_input(args.full_convs, args.full_input)
        print(f"full-pipeline input: {nf:,} turns at {args.full_input}")
        for n_exec in EXEC_LEVELS:
            m = run_submit(n_exec, args.full_input, f"clf_{n_exec}",
                           "parquet", True, zip_path)
            full_metrics[n_exec] = m
            full_rows[n_exec] = {k: v for k, v in m["stages"].items()
                                 if k.endswith("_rows")}
            print(f"[cl_full] {n_exec} executors: wall={m['wall_sec']}s "
                  f"rows={full_rows[n_exec]}", flush=True)
        a, b = (full_rows[lv] for lv in EXEC_LEVELS)
        rows_match = a == b
        if rows_match:
            print("tier/stat row counts identical across cluster sizes")
        else:
            # don't raise yet: the report write below must not lose a
            # session's worth of interleaved tier measurements — the
            # mismatch is recorded IN the report, then raised after
            print(f"ROW-COUNT MISMATCH across cluster sizes: {a} vs {b}",
                  flush=True)
    else:
        rows_match = True

    def _table(res):
        rows = []
        for lv in EXEC_LEVELS:
            bst = res[lv]["best"]
            rows.append(
                f"| {lv} executors x {CORES_PER_EXEC} cores | "
                f"{bst['wall_sec']} | {bst['turns_per_sec']:,.0f} | "
                f"{res[lv]['median_tps']:,.0f} | "
                f"{[round(t) for t in res[lv]['all_tps']]} | "
                f"{bst.get('canary_sec')} |")
        return "\n".join(rows)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH — multi-executor spark-submit evidence (north rule)

The north rule's deployment clause: run via **spark-submit
--py-files** on a **multi-executor cluster** at **N and 4N
executors**. No real cluster exists in the sandbox; this harness uses
Spark's `local-cluster[N,{CORES_PER_EXEC},{WORKER_MEM_MB}]`
pseudo-cluster master — N separate executor JVM processes
({EXEC_MEM} heap + {EXEC_OFFHEAP} off-heap each) behind a
standalone-style scheduler, shuffle blocks fetched between block
managers over the Netty transfer service, Python stages running in
per-executor Python worker pools. Submit command (reproduce:
`python scripts/cluster_scaling_bench.py`):

```
spark-submit --master local-cluster[N,{CORES_PER_EXEC},{WORKER_MEM_MB}] \\
    --driver-memory 8g --conf spark.executor.memory={EXEC_MEM} \\
    --py-files .bench/yads.zip jobs/rollup_job.py \\
    --input .bench/transcripts --catalog-root <tmp> \\
    --sink noop --warmup
```

## --py-files proof

PYTHONPATH is scrubbed from the submit environment, so executor
Python workers can resolve `yahoo_anomaly_detection_spark` ONLY from
the shipped zip. A mapInPandas probe imported the package on every
executor and reported its origin:

""")
        for s in (probe_srcs or ["(probe skipped this run)"]):
            f.write(f"- `{s}`\n")
        f.write(f"""
## Tier cascade at N=1 vs 4N=4 executors ({n_turns:,} turns, sink=noop)

Interleaved best-of-{args.repeats} per level, separate spark-submit
invocations, shuffle partitions fixed at {SHUFFLE} for both sizes
(data-sized, not core-sized). Efficiency = tps(4N) / (4 * tps(N)).

| cluster size | wall best (s) | tps best | tps median | all runs (tps) | canary at best (s) |
| --- | --- | --- | --- | --- | --- |
{_table(tiers)}

(canary = fresh 240 MB first-touch cost sampled at each run's launch;
healthy host < 0.5 s — same probe as bench.py. Executor and driver
JVMs run -XX:+AlwaysPreTouch so heap first-touch lands at JVM
startup, before the untimed warmup pass, not inside the timed
stages.)

**efficiency (best) = {eff:.3f}**, (median) = {eff_med:.3f};
same-session pure-CPU hardware ceiling for {core_a}->{core_b} busy
threads on this guest: **{hw_ceiling:.3f}** (all "executors" share
one KVM guest's silicon — a real cluster adds whole nodes instead).

Cores per executor stays at {CORES_PER_EXEC} so the 4N size (=
{core_b} busy threads) remains inside the host's healthy capacity
range measured in `BENCH/BASELINE.md`.
""")
        if full_rows:
            f.write(f"""
## Full pipeline determinism across cluster sizes ({args.full_convs:,} convs, catalog parquet sink, --full)

The complete north-star pipeline — tiers + rolling stats/z-flags +
EWMA (`applyInPandas`) + Gorilla encode (`mapInPandas`), all Python
stages fed by the --py-files zip — committed through the catalog at
both cluster sizes. Row counts per committed table:

| table | 1 executor | 4 executors |
| --- | --- | --- |
""")
            all_keys = sorted(set(full_rows[EXEC_LEVELS[0]])
                              | set(full_rows[EXEC_LEVELS[1]]))
            for k in all_keys:
                f.write(f"| {k[:-5]} | {full_rows[EXEC_LEVELS[0]].get(k)} | "
                        f"{full_rows[EXEC_LEVELS[1]].get(k)} |\n")
            f.write(
                ("\nIdentical at both sizes (asserted by the harness): "
                 "physical parallelism does not change committed results.\n"
                 if rows_match else
                 "\n**ROW-COUNT MISMATCH across cluster sizes** — the "
                 "harness raised after writing this report; do not use "
                 "this session as determinism evidence.\n")
                + f"\nWall: {full_metrics[EXEC_LEVELS[0]]['wall_sec']}s at "
                f"1 executor, {full_metrics[EXEC_LEVELS[1]]['wall_sec']}s "
                "at 4 executors (catalog commits share the sandbox's "
                "single disk, so this section evidences determinism + the "
                "--py-files Python path, not the scaling claim).\n")
    print(f"wrote {args.out}")
    if not rows_match:
        raise RuntimeError(
            "tier row counts differ across cluster sizes: "
            f"{full_rows[EXEC_LEVELS[0]]} vs {full_rows[EXEC_LEVELS[1]]} "
            f"(report with all measurements was still written to "
            f"{args.out})"
        )


if __name__ == "__main__":
    main()
