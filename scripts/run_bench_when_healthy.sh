#!/bin/bash
# Launch the single-JVM scaling bench once the host's memory backend
# is healthy. Thin wrapper over the shared gate — see
# run_when_healthy.sh for the canary semantics.
cd "$(dirname "$0")/.."
exec bash scripts/run_when_healthy.sh --threshold 0.5 \
  -- python scripts/scaling_bench.py --repeats 3 "$@"
