#!/bin/bash
# Round-4 session-C TPU queue: fresh BOTH-ARMS flagship A/B.
#
# Context: results/ (gitignored) is wiped across builder sessions, so the
# round-3 AF checkpoints and the earlier round-4 naive retrain are gone.
# Multi-GB checkpoints can't ride in git; what CAN survive is the eval
# evidence. So this queue retrains BOTH arms step-matched from scratch and
# commits the eval/report JSONs + GIF strips the moment each lands.
#
# Progressive budgets: pass 1 is sized to complete inside one builder
# session (vae 600 / ldm 1200 per arm); pass 2 extends to the round-3 AF
# budget (vae 2020 / ldm 4500) and re-evals, reusing pass-1 checkpoints
# (train.py resumes from latest). A session death between passes still
# leaves a committed, step-matched, honest report.
#
# Serialized: one TPU job at a time (CLAUDE.md). Stamped + resumable.
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

relay_gate() {
  until timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))" \
      >/dev/null 2>&1; do
    echo "relay down at $(date -u +%H:%M:%S); waiting"
    sleep 90
  done
  echo "relay up at $(date -u +%H:%M:%S)"
}

commit_ab() { # commit whatever A/B evidence exists right now
  git add -f results/flagship_ab/*/eval.json results/flagship_ab/report.json \
      results/flagship_ab/*/shift.gif 2>/dev/null
  $PY scripts/r4_collect.py >/dev/null 2>&1 || true
  git add BENCH_NOTES.md results/benchmarks.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

relay_gate

# data is CPU-side and idempotent
stage ab_data 1800 $PY scripts/flagship_ab.py data || exit 1

# ---- pass 1: step-matched small budget, both arms, report ----
P1_VAE=600; P1_LDM=1200
for arm in naive af; do
  stage p1_${arm}_vae 7200 $PY scripts/flagship_ab.py vae --arm $arm \
      --max_steps $P1_VAE || exit 1
  stage p1_${arm}_ldm 7200 $PY scripts/flagship_ab.py ldm --arm $arm \
      --max_steps $P1_LDM || exit 1
  stage p1_${arm}_eval 5400 $PY scripts/flagship_ab.py eval --arm $arm \
      || exit 1
  commit_ab "Flagship A/B pass-1: $arm arm trained (vae $P1_VAE / ldm $P1_LDM) + shift eval"
done
stage p1_report 300 $PY scripts/flagship_ab.py report || exit 1
commit_ab "Flagship A/B pass-1 report: step-matched naive vs AF at 256px"

# ---- pass 2: extend both arms to the round-3 AF budget, re-eval ----
P2_VAE=2020; P2_LDM=4500
for arm in naive af; do
  stage p2_${arm}_vae 10800 $PY scripts/flagship_ab.py vae --arm $arm \
      --max_steps $P2_VAE || exit 1
  stage p2_${arm}_ldm 14400 $PY scripts/flagship_ab.py ldm --arm $arm \
      --max_steps $P2_LDM || exit 1
  stage p2_${arm}_eval 5400 $PY scripts/flagship_ab.py eval --arm $arm \
      || exit 1
  commit_ab "Flagship A/B pass-2: $arm arm extended (vae $P2_VAE / ldm $P2_LDM) + shift eval"
done
stage p2_report 300 $PY scripts/flagship_ab.py report || exit 1
commit_ab "Flagship A/B pass-2 report: full-budget step-matched naive vs AF"

# ---- pending perf measurements (VERDICT r3 items 2/3) ----
relay_gate
stage interp_denoise 4800 $PY -u scripts/bench_interp_denoise.py || true
commit_ab "Record interp-denoise fused-vs-unfused A/B"
stage roofline_bf16 4800 $PY -u scripts/roofline_denoise.py --dtype bf16 \
    --out results/roofline_denoise_bf16.json || true
stage train_remat_full 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy full || true
stage train_remat_dots 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing --remat_policy dots || true
commit_ab "Record roofline + training-MFU measurements"
stage af_precision 5400 $PY -u scripts/eval_af_precision.py || true
stage bench 3600 $PY bench.py || true
commit_ab "Record af-precision eval + headline bench"

echo "R4C QUEUE COMPLETE $(date -u +%H:%M:%S)"
ls "$Q"
