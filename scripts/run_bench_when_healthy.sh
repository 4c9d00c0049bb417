#!/bin/bash
# Launch the scaling bench once the host's memory backend is healthy.
# The sandbox host has multi-minute episodes where first-touch page
# faults cost ~100µs each (fresh np.arange(30M) takes 10-40s instead
# of ~30ms); benchmarking during an episode measures the host, not
# the engine. Canary: a fresh 240MB allocation must write in <0.5s,
# three times in a row.
cd "$(dirname "$0")/.."
while true; do
  ok=1
  for i in 1 2 3; do
    t=$(python -c "
import numpy as np, time
t0=time.time(); a=np.arange(30_000_000); print(f'{time.time()-t0:.3f}')")
    if python -c "import sys; sys.exit(0 if float('$t') < 0.5 else 1)"; then
      :
    else
      ok=0; break
    fi
    sleep 2
  done
  if [ "$ok" = "1" ]; then
    echo "$(date): host healthy (canary $t s) — starting scaling bench"
    python scripts/scaling_bench.py --repeats 3 "$@"
    exit $?
  fi
  echo "$(date): host degraded (canary $t s) — waiting"
  sleep 60
done
