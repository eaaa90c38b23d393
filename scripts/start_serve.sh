#!/usr/bin/env bash
# Start the recommender server in the background (reference torchserve/start_serve.sh).
# Usage: scripts/start_serve.sh [DATA_DIR] [CKPT_DIR] [PORT]
set -euo pipefail
DATA_DIR=${1:-data/prepared}
CKPT_DIR=${2:-model-checkpoints}
PORT=${3:-8080}
mkdir -p logs
nohup python -m gnn_ecommerce_tpu.cli.serve -d "$DATA_DIR" -c "$CKPT_DIR" -p "$PORT" \
    > logs/serve.log 2>&1 &
echo $! > logs/serve.pid
echo "serving on :$PORT (pid $(cat logs/serve.pid), log logs/serve.log)"
