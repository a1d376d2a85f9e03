#!/bin/bash
# Round-5 TPU queue — the ONE live queue (predecessors live in
# scripts/archive/). Serialized: one TPU job at a time (CLAUDE.md).
# Stamped + resumable: shares results/r4_queue stamps, so everything the
# round-4 queue finished (pass-1 A/B, interp-denoise, roofline bf16,
# remat A/B, af_precision, headline bench) is skipped.
#
# Order (VERDICT r4): the short perf/evidence stages that round 4 starved
# run FIRST (sdpa2 re-measure, pass-1 gen-FD, serve, flash sweep, training
# MFU levers), then the multi-hour pass-2 A/B extension in step-matched
# chunks, then pass-2 evals + gen-FD + report.
#
# ADVICE r4 fixes vs r4d_queue.sh:
#   * commit_evidence force-adds every small raw measurement JSON (and
#     BENCH_HISTORY.jsonl) so r4_collect.py can always rebuild BENCH_NOTES
#     from in-repo artifacts — results/ wipes no longer destroy data;
#   * add failures are visible (per-file loop, no 2>/dev/null);
#   * the relay gate runs before EVERY stage attempt with bounded retries,
#     so a mid-queue relay flap costs a retry, not the rest of the queue;
#   * committed GIFs are the half-res shift_small.gif (~4x smaller).
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
    fi
    rc=$?
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
      results/flagship_ab/*/shift_small.gif; do
    [ -e "$f" ] && git add -f "$f"
  done
  $PY scripts/r4_collect.py || echo "r4_collect failed (continuing)"
  git add BENCH_NOTES.md BENCH_HISTORY.jsonl 2>&1 | head -2
  git diff --cached --quiet || git commit -q -m "$1"
}

# never overlap a TPU job left running by a previous session
if [ -f /tmp/p2_naive_vae.pid ] && kill -0 "$(cat /tmp/p2_naive_vae.pid)" 2>/dev/null; then
  echo "waiting for in-flight p2_naive_vae (pid $(cat /tmp/p2_naive_vae.pid))"
  while kill -0 "$(cat /tmp/p2_naive_vae.pid)" 2>/dev/null; do sleep 60; done
  echo "in-flight job finished at $(date -u +%H:%M:%S)"
fi

# ---- short perf/evidence stages (starved in round 4 — run them first) ----
stage sdpa2_r5 2400 $PY -u scripts/bench_sdpa2.py || true
stage gen_fd_p1_naive 4800 $PY -u scripts/eval_gen_fd.py --arm naive \
    --out results/flagship_ab/naive/gen_fd_p1.json || true
stage gen_fd_p1_af 4800 $PY -u scripts/eval_gen_fd.py --arm af \
    --out results/flagship_ab/af/gen_fd_p1.json || true
commit_evidence "Record sdpa2 per-op re-measure + pass-1 generation FD (pixel/rvgg/latent banks)"
stage serve_r5 3600 $PY -u scripts/bench_serve.py || true
stage flash_sweep_r5 4800 $PY -u scripts/bench_flash_sweep.py || true
stage mfu_b32_high 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --af_precision high || true
stage mfu_b32_default 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --af_precision default || true
stage mfu_b64_high 4800 $PY -u scripts/bench_train.py --batch 64 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --af_precision high || true
# attribution arms: af tax = af minus naive; shift-loss tax = af minus
# no_shift (per-op-class table for the MFU "proof of the roof")
stage mfu_b32_noshift 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --no_shift_loss || true
stage mfu_b32_naive 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots \
    --naive || true
commit_evidence "Record serve + flash-sweep + training-MFU lever measurements"

# ---- pass 2: extend both arms to the full budget, step-matched chunks ----
# VAE to 2020; LDM in chunks (2400 / 3500 / 4500) with arms interleaved so
# a mid-queue death leaves the arms at most one chunk apart, resumable
# from checkpoints either way.
stage p2_naive_vae 10800 $PY scripts/flagship_ab.py vae --arm naive \
    --max_steps 2020 || exit 1
stage p2_af_vae 10800 $PY scripts/flagship_ab.py vae --arm af \
    --max_steps 2020 || exit 1
commit_evidence "Flagship A/B pass-2: both VAE arms extended to 2020 steps"
for budget in 2400 3500 4500; do
  for arm in naive af; do
    stage p2_${arm}_ldm_${budget} 9000 $PY scripts/flagship_ab.py ldm \
        --arm $arm --max_steps $budget || exit 1
  done
  echo "== pass-2 LDM chunk $budget done for both arms $(date -u +%H:%M:%S)"
done
for arm in naive af; do
  stage p2_${arm}_eval 5400 $PY scripts/flagship_ab.py eval --arm $arm \
      || exit 1
done
stage p2_report 300 $PY scripts/flagship_ab.py report || exit 1
commit_evidence "Flagship A/B pass-2 report: full-budget (2020/4500) step-matched naive vs AF"
stage gen_fd_p2_naive 4800 $PY -u scripts/eval_gen_fd.py --arm naive || true
stage gen_fd_p2_af 4800 $PY -u scripts/eval_gen_fd.py --arm af || true
commit_evidence "Pass-2 generation-quality FD for both arms"
# acceptance harness against the trained pass-2 AF pipeline (VERDICT r4
# item 6): ffhq_shift gets weights=trained provenance; the SR/SD slots run
# as plumbing-on-random until converted reference checkpoints exist
stage run_all_r5 9000 $PY -u scripts/run_all_benchmarks.py \
    --ldm_pipeline_dir results/flagship_ab/af/ldm/pipeline || true
commit_evidence "results/benchmarks.json: acceptance harness vs trained pass-2 AF pipeline"

echo "R5 QUEUE COMPLETE $(date -u +%H:%M:%S)"
ls "$Q"
