"""Spark-free tests for the spark-submit/local-cluster evidence harness
(`scripts/cluster_scaling_bench.py`): the --py-files artifact must ship
the complete package (and nothing else), and the submit command must
pin the cluster geometry the report claims."""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from cluster_scaling_bench import (  # noqa: E402
    CORES_PER_EXEC,
    EXEC_MEM,
    WORKER_MEM_MB,
    _submit_cmd,
    make_pyfiles_zip,
)


def test_pyfiles_zip_ships_the_whole_package(tmp_path):
    out = make_pyfiles_zip(str(tmp_path / "yads.zip"))
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
    # exactly the on-disk .py set, package-root-relative
    pkg = os.path.join(REPO, "yahoo_anomaly_detection_spark")
    expected = set()
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if fn.endswith(".py"):
                expected.add(
                    os.path.relpath(os.path.join(root, fn), REPO)
                )
    assert names == expected
    assert "yahoo_anomaly_detection_spark/__init__.py" in names
    assert "yahoo_anomaly_detection_spark/operators/rollup.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)
    # the zip must be self-sufficient for executors: every package
    # subdir present in the tree must contribute its __init__.py
    subpkgs = {os.path.dirname(n) for n in expected if "/" in n}
    for sp in subpkgs:
        assert f"{sp}/__init__.py" in names, f"{sp} missing __init__"


def test_submit_cmd_pins_cluster_geometry(tmp_path):
    z = str(tmp_path / "a.zip")
    cmd = _submit_cmd(4, z, "job.py", ["--x", "1"])
    assert f"local-cluster[4,{CORES_PER_EXEC},{WORKER_MEM_MB}]" in cmd
    assert f"spark.executor.memory={EXEC_MEM}" in cmd
    i = cmd.index("--py-files")
    assert cmd[i + 1] == z
    # primary script then job args, in order, at the tail
    assert cmd[-3:] == ["job.py", "--x", "1"]
    # heap first-touch must land at JVM startup on BOTH sides, not
    # inside the timed stages (degraded-memory-episode mitigation)
    assert "spark.executor.extraJavaOptions=-XX:+AlwaysPreTouch" in cmd
    di = cmd.index("--driver-java-options")
    assert "-XX:+AlwaysPreTouch" in cmd[di + 1]
