#!/bin/bash
# SUPERSEDED by scripts/r4_tpu_queue.sh, which runs the same naive-arm
# retrain (VERDICT r3 item 1) as stamped, resumable, relay-gated stages —
# including the ONE-TIME cleanup of the invalid r3 naive artifacts
# (stamp: results/r4_queue/naive_clean.done). This wrapper used to
# `rm -rf` the naive arm unconditionally, which would destroy a completed
# retrain if re-run; use the queue instead.
echo "superseded: run  bash scripts/r4_tpu_queue.sh  (stamped/resumable)" >&2
exit 2
