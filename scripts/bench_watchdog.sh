#!/bin/bash
# Run bench.py to completion through tunnel outages: restart on stall
# (no stderr-log mtime progress for STALL_S) or nonzero exit, until a JSON
# line lands on stdout. Kills ONLY the exact child PID it started.
set -u
cd /root/repo
STALL_S=${STALL_S:-720}
MAX_TRIES=${MAX_TRIES:-12}
OUT=${OUT:-/tmp/bench_r2.json}
ERR=${ERR:-/tmp/bench_r2.log}

mtime() { stat -c %Y "$1" 2>/dev/null || echo 0; }

for try in $(seq 1 "$MAX_TRIES"); do
  echo "=== bench watchdog try $try/$MAX_TRIES $(date -u +%H:%M:%S) ===" >> scripts/bench_watchdog.log
  if ! PYTHONPATH=/root/repo:/root/.axon_site timeout 90 python -c \
      "import jax,jax.numpy as jnp; float(jnp.sum(jax.jit(lambda a:a@a)(jnp.ones((256,256)))))" \
      >/dev/null 2>&1; then
    echo "device unhealthy; sleeping 600s" >> scripts/bench_watchdog.log
    sleep 600
    continue
  fi
  PYTHONPATH=/root/repo:/root/.axon_site python bench.py > "$OUT" 2> "$ERR" &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $((now - $(mtime "$ERR"))) -gt "$STALL_S" ]; then
      echo "stalled; killing $pid" >> scripts/bench_watchdog.log
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  echo "bench exited rc=$rc" >> scripts/bench_watchdog.log
  if [ "$rc" -eq 0 ] && grep -q '"metric"' "$OUT" 2>/dev/null; then
    echo "complete" >> scripts/bench_watchdog.log
    exit 0
  fi
  sleep 120
done
echo "gave up" >> scripts/bench_watchdog.log
exit 1
