"""spark-submit --py-files packaging smoke (north rule literal).

The north rule requires the job to run "via spark-submit --py-files
on a multi-executor cluster". This harness proves the packaging path
end-to-end, not just in a docstring:

1. builds ``yads.zip`` containing the ``yahoo_anomaly_detection_spark``
   package (the artifact a cluster deploy ships),
2. copies ``jobs/rollup_job.py`` into a BARE temp directory — so the
   job's own repo-relative sys.path fallback cannot find the package
   and every import must resolve from the ``--py-files`` zip, exactly
   as on an executor,
3. generates a small deterministic transcripts input,
4. runs real ``spark-submit --master local[4] --py-files yads.zip``
   and asserts the job's JSON metrics line reports all three tiers
   with rows > 0 and zero skipped units,
5. runs ``jobs/refresh_job.py`` the same way, twice, over an
   event-time split of the input (per conv, ts order == turn order,
   so a global ts split keeps every conversation's appends in order):
   cycle 1 must report ``mode=initial``, cycle 2 ``mode=incremental``
   with affected days and merged tier rows — the incremental-refresh
   deploy story, not just its pytest,
6. runs ``jobs/monitor_job.py`` the same way and asserts the ensemble
   flagged rows and the tier committed — the observability deploy
   story.

Usage: python scripts/submit_smoke.py [--convs N]
Exit code 0 = the cluster packaging story works.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from submit_common import build_pyfiles_zip, find_spark_submit  # noqa: E402


def build_zip(dest: str) -> str:
    """Zip the package the way a deploy pipeline would — shared
    builder with the cluster evidence harness (submit_common)."""
    return build_pyfiles_zip(os.path.join(dest, "yads.zip"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=300)
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        zpath = build_zip(tmp)

        # small deterministic input (driver-side session, then stopped
        # so spark-submit starts its own JVM cleanly)
        from yahoo_anomaly_detection_spark.session import get_spark
        from yahoo_anomaly_detection_spark.synthgen import gen_transcripts

        from pyspark.sql import functions as F

        spark = get_spark("submit-smoke-gen", cores=4, shuffle_partitions=8)
        inp = os.path.join(tmp, "transcripts")
        raw = gen_transcripts(spark, n_convs=args.convs, seed=7,
                              partitions=8)
        raw.write.mode("overwrite").parquet(inp)
        # event-time halves for the refresh job's two cycles
        mid = raw.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
        inp_a = os.path.join(tmp, "batch_a")
        inp_b = os.path.join(tmp, "batch_b")
        raw.where(F.col("ts") <= F.lit(mid)).write.parquet(inp_a)
        raw.where(F.col("ts") > F.lit(mid)).write.parquet(inp_b)
        spark.stop()

        # bare dir: only the job file — imports MUST come from the zip
        jobdir = os.path.join(tmp, "deploy")
        os.makedirs(jobdir)
        job = os.path.join(jobdir, "rollup_job.py")
        shutil.copy(os.path.join(REPO, "jobs", "rollup_job.py"), job)

        cat = os.path.join(tmp, "warehouse")
        cmd = [
            find_spark_submit(),
            "--master", f"local[{args.cores}]",
            "--py-files", zpath,
            job,
            "--input", inp,
            "--catalog-root", cat,
            "--run-id", "submit_smoke",
            "--sink", "parquet",
            "--shuffle-partitions", "8",
        ]
        print("running:", " ".join(cmd), flush=True)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # nothing leaks in from the repo
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=600, cwd=jobdir, env=env)
        if out.returncode != 0:
            sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
            raise SystemExit(f"spark-submit failed rc={out.returncode}")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        m = json.loads(line)
        for tier in ("1m", "1h", "1d"):
            rows = m["stages"].get(f"tier_{tier}_rows", 0)
            assert rows > 0, f"tier_{tier} empty: {m}"
        assert m["skipped_units"] == 0, m
        # refresh job through the identical packaging path
        rjob = os.path.join(jobdir, "refresh_job.py")
        shutil.copy(os.path.join(REPO, "jobs", "refresh_job.py"), rjob)
        rcat = os.path.join(tmp, "warehouse_refresh")

        def submit_refresh(batch: str) -> dict:
            rcmd = [
                find_spark_submit(),
                "--master", f"local[{args.cores}]",
                "--py-files", zpath,
                rjob,
                "--catalog-root", rcat,
                "--append", batch,
                "--shuffle-partitions", "8",
            ]
            print("running:", " ".join(rcmd), flush=True)
            r = subprocess.run(rcmd, capture_output=True, text=True,
                               timeout=600, cwd=jobdir, env=env)
            if r.returncode != 0:
                sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
                raise SystemExit(
                    f"refresh spark-submit failed rc={r.returncode}")
            return json.loads([l for l in r.stdout.splitlines()
                               if l.startswith("{")][-1])

        m1 = submit_refresh(inp_a)
        assert m1["mode"] == "initial", m1
        m2 = submit_refresh(inp_b)
        assert m2["mode"] == "incremental", m2
        assert m2["affected_days"] >= 1, m2
        assert m2["stages"]["tier_1m_affected_rows"] > 0, m2

        # monitoring job through the identical packaging path
        mjob = os.path.join(jobdir, "monitor_job.py")
        shutil.copy(os.path.join(REPO, "jobs", "monitor_job.py"), mjob)
        mcmd = [
            find_spark_submit(),
            "--master", f"local[{args.cores}]",
            "--py-files", zpath,
            mjob,
            "--input", inp,
            "--catalog-root", os.path.join(tmp, "warehouse_monitor"),
            "--shuffle-partitions", "8",
        ]
        print("running:", " ".join(mcmd), flush=True)
        mo = subprocess.run(mcmd, capture_output=True, text=True,
                            timeout=600, cwd=jobdir, env=env)
        if mo.returncode != 0:
            sys.stderr.write(mo.stdout[-4000:] + "\n" + mo.stderr[-4000:])
            raise SystemExit(
                f"monitor spark-submit failed rc={mo.returncode}")
        mm = json.loads([l for l in mo.stdout.splitlines()
                         if l.startswith("{")][-1])
        assert mm["stages"]["mon_tier_1m_rows"] > 0, mm
        assert mm["stages"]["mon_flags_rows"] > 0, mm
        assert mm["skipped_units"] == 0, mm

        # diagnostics job through the identical packaging path
        pjob = os.path.join(jobdir, "profile_job.py")
        shutil.copy(os.path.join(REPO, "jobs", "profile_job.py"), pjob)
        pcmd = [
            find_spark_submit(),
            "--master", f"local[{args.cores}]",
            "--py-files", zpath,
            pjob,
            "--input", inp,
            "--catalog-root", os.path.join(tmp, "warehouse_profile"),
            "--shuffle-partitions", "8",
        ]
        print("running:", " ".join(pcmd), flush=True)
        po = subprocess.run(pcmd, capture_output=True, text=True,
                            timeout=600, cwd=jobdir, env=env)
        if po.returncode != 0:
            sys.stderr.write(po.stdout[-4000:] + "\n" + po.stderr[-4000:])
            raise SystemExit(
                f"profile spark-submit failed rc={po.returncode}")
        pm = json.loads([l for l in po.stdout.splitlines()
                         if l.startswith("{")][-1])
        assert pm["stages"]["prof_series_rows"] > 0, pm
        assert pm["skipped_units"] == 0, pm

        print(json.dumps({"submit_smoke": "ok",
                          "n_turns": m["n_turns"],
                          "tiers": {t: m["stages"][f"tier_{t}_rows"]
                                    for t in ("1m", "1h", "1d")},
                          "refresh_modes": [m1["mode"], m2["mode"]],
                          "refresh_affected_days": m2["affected_days"],
                          "monitor_flags": mm["stages"]["mon_flags_rows"],
                          "profile_series": pm["stages"]["prof_series_rows"],
                          "wall_sec": m["wall_sec"]}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
