#!/bin/bash
# Round-4 SECOND TPU queue: measurements that must not contend with the
# main r4 queue (CLAUDE.md: one TPU job at a time on the relay). Gates on
# the main loop's completion marker, then runs the generation-quality FD
# evals (live metric_utils consumers) and the flash-kernel block sweep.
# Stamped + resumable like r4_tpu_queue.sh.
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
Q=results/r4_queue
mkdir -p "$Q" results

stage() { # stage <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if [ -f "$Q/$name.done" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name: start $(date -u +%H:%M:%S)"
  if timeout "$tmo" "$@" > "$Q/$name.log" 2>&1; then
    touch "$Q/$name.done"
    echo "== $name: OK $(date -u +%H:%M:%S)"
  else
    echo "== $name: FAILED/TIMEOUT (rc=$?) $(date -u +%H:%M:%S) — see $Q/$name.log"
    return 1
  fi
}

# gate 1: the main queue loop must have fully exited (marker written by
# scripts/r4_queue_loop.sh as its last line)
until grep -q "queue loop done" results/r4_queue_loop.log 2>/dev/null; do
  sleep 120
done
echo "main queue done at $(date -u +%H:%M:%S)"

# gate 2: relay health (same probe as the main queue)
until timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))" \
    >/dev/null 2>&1; do
  echo "relay down at $(date -u +%H:%M:%S); waiting"
  sleep 90
done
echo "relay up at $(date -u +%H:%M:%S)"

# generation-quality FD for both trained arms (only meaningful if the
# arm's pipeline exists; the script fails loud otherwise)
stage fd_naive 7200 $PY -u scripts/eval_gen_fd.py --arm naive || true
stage fd_af    7200 $PY -u scripts/eval_gen_fd.py --arm af || true

# flash-kernel block sweep + bottleneck attribution
stage flash_sweep_bf16 4800 $PY -u scripts/bench_flash_sweep.py \
    --dtype bf16 || true
stage flash_sweep_f32  4800 $PY -u scripts/bench_flash_sweep.py \
    --dtype f32 || true

timeout 120 $PY scripts/r4_collect.py || true
echo "R4B QUEUE COMPLETE $(date -u +%H:%M:%S)"
