"""Training-step throughput on the real TPU: the reference's flagship
training workload (train_afldm.sh — FFHQ-256 LDM, AF UNet + frozen AF-VAE,
shift loss + CFA + EMA, batch 16, ref configs/ldm/train_unet_ffhq.json)
as ONE jitted step through the actual LDMTrainer.

Reports steps/s, images/s, program GFLOP and TFLOP/s (from the compiled
executable's cost analysis) for f32 and bf16 mixed precision. Timing rule
per CLAUDE.md: materialize the loss scalar each step.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--mixed_precision", default="no",
                   choices=["no", "bf16"])
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "dots"],
                   help="remat selectivity under --gradient_checkpointing")
    p.add_argument("--no_shift_loss", action="store_true")
    p.add_argument("--naive", action="store_true",
                   help="af_models=False (the alias-free training tax is "
                        "full minus this, per-op-class attribution)")
    p.add_argument("--af_precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="MXU precision for the alias-free circulant "
                        "matmuls (ops.ideal_lpf.set_af_precision). "
                        "eval_af_precision.py measured 'high' at +0.014 dB "
                        "vs 'highest' on the flagship shift eval — inside "
                        "the 0.1 dB parity budget")
    p.add_argument("--cpu", action="store_true",
                   help="force the host CPU backend (smoke tests)")
    p.add_argument("--out", default="results/bench_train_r4.jsonl",
                   help="JSONL sink ('' to disable)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from afldm_tpu.ops.ideal_lpf import set_af_precision
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 create_trainer)

    set_af_precision(args.af_precision)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vae_cfg = json.load(open(os.path.join(root, "configs/vae/model_afvae.json")))
    unet_cfg = json.load(open(os.path.join(root, "configs/ldm/model_unet.json")))
    sched_cfg = json.load(open(
        os.path.join(root, "configs/ldm/noise_scheduler.json")))

    base = BaseTrainingConfig(
        logging_dir="logs", output_dir="/tmp/bench_train",
        resolution=args.resolution, train_batch_size=args.batch,
        num_epochs=1, seed=0, mixed_precision=args.mixed_precision,
        gradient_checkpointing=args.gradient_checkpointing,
        remat_policy=args.remat_policy)
    ldm = LDMTrainingConfig(
        af_models=not args.naive, use_shift_loss=not args.no_shift_loss,
        use_ema=True, use_cross_attn=not args.no_shift_loss)
    tr = create_trainer("ldm", base, ldm)
    tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                    scheduler_config=sched_cfg)
    tr.init_optimizers()
    tr.prepare_modules()

    rng = np.random.default_rng(0)
    batch = {"input": jnp.asarray(rng.standard_normal(
        (args.batch, args.resolution, args.resolution, 3)) * 0.5,
        jnp.float32)}

    t0 = time.perf_counter()
    logs = tr.training_step(0, batch)   # compile + step (logs are floats)
    compile_s = time.perf_counter() - t0
    print(f"first step (compile): {compile_s:.1f}s "
          f"loss={logs['train_loss']:.4f}", file=sys.stderr)

    best = float("inf")
    for i in range(args.steps):
        t0 = time.perf_counter()
        logs = tr.training_step(i + 1, batch)
        best = min(best, time.perf_counter() - t0)

    flops = None
    try:
        cost = tr._step_fn.lower(
            tr.state, tr.vae_params, tr.shard(batch["input"]),
            tr.replicate(jax.random.PRNGKey(0))).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    out = {
        "workload": "ldm_train_step_ffhq256",
        "batch": args.batch,
        "mixed_precision": args.mixed_precision,
        "gradient_checkpointing": args.gradient_checkpointing,
        "remat_policy": args.remat_policy,
        "af_precision": args.af_precision,
        "af_models": not args.naive,
        "shift_loss": not args.no_shift_loss,
        "steps_per_s": round(1.0 / best, 4),
        "images_per_s": round(args.batch / best, 3),
        "final_loss": round(logs["train_loss"], 4),
    }
    if flops:
        out["program_gflop"] = round(flops / 1e9, 1)
        out["tflop_per_s"] = round(flops / best / 1e12, 2)
        out["mfu_vs_197tflops_bf16"] = round(flops / best / 1e12 / 197.0, 4)
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
