#!/bin/bash
# Launch the multi-executor (local-cluster) scaling bench once the
# host is healthy and no other JVM can contaminate the measurement.
# Thin wrapper over the shared gate — see run_when_healthy.sh.
cd "$(dirname "$0")/.."
exec bash scripts/run_when_healthy.sh --threshold 0.5 --require-no-java \
  -- python scripts/cluster_scaling_bench.py "$@"
