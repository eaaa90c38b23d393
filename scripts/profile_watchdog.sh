#!/bin/bash
# Watchdog for on-chip profiling through a flaky TPU tunnel: restart the
# profiler when it makes no observable progress (results-json or stderr
# mtime) for STALL_S seconds. Kills ONLY the exact child PID it started.
set -u
cd /root/repo
STALL_S=${STALL_S:-720}
MAX_TRIES=${MAX_TRIES:-8}
RES=scripts/profile_step_results.json
ERR=scripts/profile_step_stderr.txt

mtime() { stat -c %Y "$1" 2>/dev/null || echo 0; }

for try in $(seq 1 "$MAX_TRIES"); do
  echo "=== watchdog try $try/$MAX_TRIES $(date -u +%H:%M:%S) ===" >> scripts/profile_watchdog.log
  # Quick health probe: tiny program must complete within 90 s.
  if ! PYTHONPATH=/root/repo:/root/.axon_site timeout 90 python -c \
      "import jax,jax.numpy as jnp; float(jnp.sum(jax.jit(lambda a:a@a)(jnp.ones((256,256)))))" \
      >/dev/null 2>&1; then
    echo "device unhealthy; sleeping 600s" >> scripts/profile_watchdog.log
    sleep 600
    continue
  fi
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py \
      > scripts/profile_step_stdout.txt 2> "$ERR" &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    last=$(( $(mtime "$RES") > $(mtime "$ERR") ? $(mtime "$RES") : $(mtime "$ERR") ))
    if [ $((now - last)) -gt "$STALL_S" ]; then
      echo "stalled $((now - last))s; killing $pid" >> scripts/profile_watchdog.log
      kill "$pid" 2>/dev/null
      sleep 10
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  echo "profiler exited rc=$rc" >> scripts/profile_watchdog.log
  if [ "$rc" -eq 0 ] && grep -q train_step_hyb_ms "$RES" 2>/dev/null \
      && grep -q train_step_fops_ms "$RES" 2>/dev/null; then
    echo "complete" >> scripts/profile_watchdog.log
    exit 0
  fi
  sleep 120
done
echo "gave up" >> scripts/profile_watchdog.log
exit 1
