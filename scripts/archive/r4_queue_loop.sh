#!/bin/bash
# Retry wrapper for the round-4 TPU queue: re-enters until QUEUE COMPLETE.
# Training stages resume from checkpoints; completed stages are stamped.
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  echo "=== queue pass $i $(date -u +%H:%M:%S) ==="
  bash scripts/r4_tpu_queue.sh && break
  echo "=== pass $i exited nonzero; sleeping 120 ==="
  sleep 120
done
echo "=== queue loop done $(date -u +%H:%M:%S) ==="
