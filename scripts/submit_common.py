"""Shared spark-submit plumbing for the packaging smoke
(`submit_smoke.py`) and the multi-executor evidence harness
(`cluster_scaling_bench.py`) — one zip builder and one spark-submit
resolver, so the two harnesses can never test different artifacts or
different Spark binaries."""

from __future__ import annotations

import os
import shutil
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "yahoo_anomaly_detection_spark"


def build_pyfiles_zip(out: str) -> str:
    """Zip the package exactly as a deploy pipeline would ship it to
    spark-submit --py-files: every .py, package-root-relative paths,
    deterministic order, no bytecode caches."""
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    pkg = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return out


def find_spark_submit() -> str:
    """Prefer the spark-submit inside the installed pyspark dist (its
    jars are guaranteed to match the Python library's version); fall
    back to PATH. Both harnesses MUST use this one resolver, or they
    can silently test different Spark binaries."""
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    raise FileNotFoundError("spark-submit not found in pyspark dist or PATH")
