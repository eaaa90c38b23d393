#!/usr/bin/env bash
# Stop the recommender server by recorded pid (reference torchserve/stop_serve.sh).
set -euo pipefail
if [[ -f logs/serve.pid ]]; then
    kill "$(cat logs/serve.pid)" && rm logs/serve.pid && echo stopped
else
    echo "no logs/serve.pid found" >&2; exit 1
fi
