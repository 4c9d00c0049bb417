#!/bin/bash
# Launch the multi-executor (local-cluster) scaling bench once the
# host's memory backend is healthy AND no other JVM is running (so a
# concurrent test/bench session can't contaminate the measurement).
# Canary: a fresh 240MB numpy allocation must write in <0.3s, three
# times in a row, same probe as bench.py / cluster_scaling_bench.py.
# See scripts/run_bench_when_healthy.sh for the single-JVM variant.
cd "$(dirname "$0")/.."
while true; do
  if pgrep -x java >/dev/null 2>&1; then
    echo "$(date): other JVMs running — waiting"
    sleep 120
    continue
  fi
  ok=1
  for i in 1 2 3; do
    t=$(python -c "
import numpy as np, time
t0=time.time(); a=np.arange(30_000_000); print(f'{time.time()-t0:.3f}')")
    if ! python -c "import sys; sys.exit(0 if float('$t') < 0.3 else 1)"; then
      ok=0
      break
    fi
    sleep 2
  done
  if [ "$ok" = "1" ]; then
    echo "$(date): host healthy (canary $t s) — starting cluster bench"
    python scripts/cluster_scaling_bench.py "$@"
    exit $?
  fi
  echo "$(date): host degraded (canary $t s) — waiting"
  sleep 120
done
