#!/bin/bash
# Round-5 follow-up queue — chained behind the live scripts/r5_queue.sh run
# (waits for /tmp/r5.pid to exit, then re-invokes r5_queue.sh once to mop up
# any stage the live run left unstamped, then runs the round-5 closure
# stages below). Shares the results/r4_queue stamp directory, so everything
# is resumable and nothing re-runs.
#
# New stages (why):
#   * af_prec_default_eval — the 21.2% training-MFU point uses
#     af_precision=default; this measures its eval-PSNR cost on the trained
#     pass-2 AF pipeline (highest/high re-measured on the same pipeline for
#     a like-for-like ladder).
#   * mfu_b48/b40 — batch 64 OOMs by 441 MB (recorded negative); probe the
#     largest batch that fits to see if MFU rises past 21.2%.
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
Q=results/r4_queue
mkdir -p "$Q" results

relay_probe() {
  timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))" \
      >/dev/null 2>&1
}

stage() { # stage <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2" attempt rc; shift 2
  if [ -f "$Q/$name.done" ]; then echo "== $name: already done"; return 0; fi
  for attempt in 1 2 3; do
    until relay_probe; do
      echo "relay down at $(date -u +%H:%M:%S); waiting"
      sleep 90
    done
    echo "== $name: attempt $attempt start $(date -u +%H:%M:%S)"
    if timeout "$tmo" "$@" > "$Q/$name.log" 2>&1; then
      touch "$Q/$name.done"
      echo "== $name: OK $(date -u +%H:%M:%S)"
      return 0
    else
      # rc must be read in the else branch: after `fi` with a failed
      # condition and no else, $? is the if-statement's own 0
      rc=$?
    fi
    echo "== $name: FAILED/TIMEOUT (rc=$rc) $(date -u +%H:%M:%S) — see $Q/$name.log"
  done
  return 1
}

commit_evidence() { # commit_evidence <message>
  local f
  for f in results/benchmarks.json results/bench_sdpa2.json \
      results/bench_interp_denoise.json results/roofline_denoise_bf16.json \
      results/roofline_denoise_f32.json results/bench_train_r4.jsonl \
      results/af_precision_eval.json results/bench_flash_sweep.json \
      results/bench_serve.json results/equivariance_ab.json \
      results/flagship_ab/report.json \
      results/flagship_ab/*/eval.json results/flagship_ab/*/gen_fd.json \
      results/flagship_ab/*/gen_fd_p1.json \
      results/flagship_ab/*/diag_shift_cliff.json \
      results/eq_metrics_naive.json results/eq_metrics_af.json \
      results/flagship_ab/*/shift_small.gif; do
    [ -e "$f" ] && git add -f "$f"
  done
  $PY scripts/r4_collect.py || echo "r4_collect failed (continuing)"
  git add BENCH_NOTES.md BENCH_HISTORY.jsonl 2>&1 | head -2
  git diff --cached --quiet || git commit -q -m "$1"
}

# 1. wait for the live r5 queue (never overlap TPU jobs — CLAUDE.md)
if [ -f /tmp/r5.pid ] && kill -0 "$(cat /tmp/r5.pid)" 2>/dev/null; then
  echo "waiting for the live r5 queue (pid $(cat /tmp/r5.pid))"
  while kill -0 "$(cat /tmp/r5.pid)" 2>/dev/null; do sleep 60; done
  echo "r5 queue exited at $(date -u +%H:%M:%S)"
fi

# 2. mop up: stamped stages are skipped, anything the live run failed or
# never reached gets its retries here
bash scripts/r5_queue.sh

# 3. round-5 closure stages
stage af_prec_default_eval 5400 $PY -u scripts/eval_af_precision.py \
    --precisions highest,high,default || true
stage mfu_b48_default 4800 $PY -u scripts/bench_train.py --batch 48 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --af_precision default || true
stage mfu_b40_default 4800 $PY -u scripts/bench_train.py --batch 40 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --af_precision default || true
# bonus A/B axis: StyleGAN-3 EQ-T / EQ-T_frac on the trained pass-2 arms
# (the reference ships these metrics but never invokes them)
for arm in naive af; do
  stage eq_metrics_${arm} 4800 $PY -u scripts/eval_equivariance.py \
      --pipeline_dir results/flagship_ab/${arm}/ldm/pipeline --use_ema \
      --num_samples 16 --steps 20 --out results/eq_metrics_${arm}.json \
      || true
done
commit_evidence "Record pass-2 af-precision ladder + batch-roof MFU probes + EQ-T metrics"

echo "R5B QUEUE COMPLETE $(date -u +%H:%M:%S)"
