#!/bin/bash
# Shared healthy-host gate: wait until the host's memory backend is
# healthy (and, optionally, no other JVM is running), then exec the
# given command. The sandbox host has multi-minute episodes where
# first-touch page faults run ~1000x slow; benchmarking during one
# measures the host, not the engine.
#
# Usage: run_when_healthy.sh [--threshold SECS] [--require-no-java] -- CMD...
# Canary: a fresh 240MB numpy allocation must write in < threshold,
# three times in a row (same probe as bench.py / cluster_scaling_bench).
set -u
THRESHOLD=0.5
NO_JAVA=0
while [ $# -gt 0 ]; do
  case "$1" in
    --threshold) THRESHOLD="$2"; shift 2 ;;
    --require-no-java) NO_JAVA=1; shift ;;
    --) shift; break ;;
    *) echo "run_when_healthy.sh: unknown arg $1 (before --)" >&2; exit 2 ;;
  esac
done
if [ $# -eq 0 ]; then
  echo "run_when_healthy.sh: no command given after --" >&2
  exit 2
fi
while true; do
  if [ "$NO_JAVA" = "1" ] && pgrep -x java >/dev/null 2>&1; then
    echo "$(date): other JVMs running — waiting"
    sleep 120
    continue
  fi
  ok=1
  for i in 1 2 3; do
    t=$(python -c "
import numpy as np, time
t0=time.time(); a=np.arange(30_000_000); print(f'{time.time()-t0:.3f}')")
    # a probe that FAILS (no numpy, OOM-killed) must abort loudly, not
    # be misread as "host degraded" and spin forever
    case "$t" in
      ''|*[!0-9.]*) echo "canary probe failed (output: '$t')" >&2; exit 3 ;;
    esac
    if ! awk -v t="$t" -v th="$THRESHOLD" 'BEGIN{exit !(t<th)}'; then
      ok=0
      break
    fi
    sleep 2
  done
  if [ "$ok" = "1" ]; then
    echo "$(date): host healthy (canary $t s) — running: $*"
    exec "$@"
  fi
  echo "$(date): host degraded (canary $t s) — waiting"
  sleep 120
done
