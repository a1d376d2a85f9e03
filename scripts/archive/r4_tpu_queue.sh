#!/bin/bash
# Round-4 serialized TPU queue (one job at a time on the relay — CLAUDE.md).
# Resumable: each completed stage writes a stamp under results/r4_queue/;
# re-running skips stamped stages. Training stages additionally resume
# from their own checkpoints, so a relay flap mid-train loses nothing.
#
#   bash scripts/r4_tpu_queue.sh         # run everything pending
#
# Order: short perf measurements first (VERDICT r3 items 2/3), then the
# long naive-arm retrain + dual eval + report (item 1), then the headline
# bench (item 7's drift guard records it).
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

# relay gate: don't burn stage timeouts while the relay is down
until timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))" \
    >/dev/null 2>&1; do
  echo "relay down at $(date -u +%H:%M:%S); waiting"
  sleep 90
done
echo "relay up at $(date -u +%H:%M:%S)"

# --- verification drivers for the round-4 commits (verify skill) ---
stage verify_r4a 3000 $PY -u scripts/verify_r4a.py || true
stage verify_r4b 3000 $PY -u scripts/verify_r4b.py || true

# --- quick per-op measurement first: guarantees recorded perf evidence
#     even if the relay window is short (VERDICT item 2) ---
stage sdpa2_f32  2400 $PY -u scripts/bench_sdpa2.py --dtype f32  || true
stage sdpa2_bf16 2400 $PY -u scripts/bench_sdpa2.py --dtype bf16 || true
# checkpoint the evidence trail early: if the relay dies again mid-queue,
# whatever was measured is already in BENCH_NOTES.md
timeout 120 $PY scripts/r4_collect.py || true

# --- the flagship A/B naive retrain (VERDICT item 1) — the single
#     highest-leverage item; runs before the compile-heavy benches ---
# r3's naive artifacts are invalid (AF-wired VAE); clear ONCE, stamped
stage naive_clean 60 bash -c \
  "rm -rf results/flagship_ab/naive results/flagship_ab/report.json" || true
# dependent chain: a failed/timed-out stage must NOT let the next one
# burn hours of serialized relay budget on an under-trained upstream —
# exit and let the outer retry loop re-enter (training stages resume
# from their own checkpoints, so nothing is lost)
stage naive_vae 10800 $PY scripts/flagship_ab.py vae --arm naive --max_steps 2020 || exit 1
stage naive_ldm 12600 $PY scripts/flagship_ab.py ldm --arm naive --max_steps 4500 || exit 1
stage naive_eval 5400 $PY scripts/flagship_ab.py eval --arm naive || exit 1
# re-run the AF eval so both eval.json carry the audit fields under the
# fixed loader
stage af_eval 5400 $PY scripts/flagship_ab.py eval --arm af || exit 1
stage report 300 $PY scripts/flagship_ab.py report || exit 1
timeout 120 $PY scripts/r4_collect.py || true

# --- compile-heavy perf measurements (VERDICT item 3; fresh HLO after
#     the in-graph-chaining rewrite, so first compiles are slow) ---
stage interp_denoise 4800 $PY -u scripts/bench_interp_denoise.py || true
stage roofline_bf16 4800 $PY -u scripts/roofline_denoise.py --dtype bf16 \
    --out results/roofline_denoise_bf16.json || true
stage roofline_f32 4800 $PY -u scripts/roofline_denoise.py --dtype f32 \
    --out results/roofline_denoise_f32.json || true
stage af_precision 5400 $PY -u scripts/eval_af_precision.py || true
stage bench_serve 4800 $PY -u scripts/bench_serve.py || true

# --- training MFU: full vs dots remat at the r2 measurement point
#     (batch 32 bf16; VERDICT item 3) ---
stage train_remat_full 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing \
    --remat_policy full || true
stage train_remat_dots 4800 $PY -u scripts/bench_train.py --batch 32 \
    --mixed_precision bf16 --gradient_checkpointing \
    --remat_policy dots || true

# --- headline bench + drift guard ---
stage bench 3600 $PY bench.py || true

# --- record everything measured so far into BENCH_NOTES.md +
#     results/benchmarks.json (idempotent; not stamped — re-collects on
#     every pass so late artifacts still land) ---
timeout 120 $PY scripts/r4_collect.py || true

echo "QUEUE COMPLETE $(date -u +%H:%M:%S)"
ls "$Q"
