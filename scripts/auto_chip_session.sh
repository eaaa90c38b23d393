#!/bin/bash
# Round-3 chip session: wait for the TPU tunnel to recover, then run the
# full measured training (scripts/train_full_r3.py -> TRAIN_FULL_r3.json,
# with resume-on-retry) followed by bench.py. Designed to run under nohup.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  if timeout 240 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import jax.numpy as jnp
assert float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()) == 256.0 * 256 * 256
print('tpu ok:', jax.devices())
" 2>&1; then
    echo "tunnel up at $(date)"
    break
  fi
  echo "still down at $(date)"
  sleep 60
done

for i in 1 2 3; do
  echo "=== train_full_r3 attempt $i at $(date) ==="
  if [ "$i" -gt 1 ]; then export RESUME=1; fi
  if timeout 10800 python scripts/train_full_r3.py; then
    echo "train_full_r3 OK at $(date)"
    break
  fi
  echo "attempt $i failed (rc=$?) at $(date)"
  sleep 180
done

echo "=== bench at $(date) ==="
timeout 5400 python bench.py > scripts/bench_r3_out.json 2> scripts/bench_r3_err.log
echo "bench rc=$? at $(date)"
echo "=== chip session done at $(date) ==="
