"""End-to-end A/B of the fused two-KV CFA-interp attention inside the REAL
interpolation denoise (VERDICT r3 item 2): the exact `interp`-mode scan of
pipelines/interpolation.py:130-139 — SD UNet, 17 frames, 64x64 latents,
kv0/kv1 from endpoint STORE passes — timed with the fused one-pass
sdpa2_flash vs two single-KV flash passes + blend (ops.attention.
set_sdpa2_fused), same everything else.

Run on the real TPU, ONE job on the relay:

  python scripts/bench_interp_denoise.py [--frames 17] [--steps 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=17)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--out", type=str,
                   default="results/bench_interp_denoise.json")
    p.add_argument("--tiny", action="store_true",
                   help="tiny UNet for CPU smoke tests (NOT a benchmark)")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from afldm_tpu.models import UNet2DConditionModel, UNet2DConditionConfig
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.ops.attention import set_sdpa2_fused

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    if args.tiny:
        cfg = UNet2DConditionConfig(
            alias_free=True, sample_size=16, block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, attention_head_dim=2,
            cross_attention_dim=32, norm_num_groups=8)
    else:
        cfg = UNet2DConditionConfig(alias_free=True)
    unet = UNet2DConditionModel(cfg, dtype=dt)
    sched = DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                          beta_start=0.00085, clip_sample=False,
                          num_train_timesteps=1000, set_alpha_to_one=False,
                          steps_offset=1, timestep_spacing="leading")

    S = cfg.sample_size
    lat1 = jnp.zeros((1, S, S, cfg.in_channels), jnp.float32)
    ehs1 = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat1,
                                jnp.zeros((1,), jnp.int32), ehs1)

    ts = jnp.asarray(sched.set_timesteps(args.steps))
    ts_prev = ts - sched.num_train_timesteps // args.steps

    @jax.jit
    def store(params, latents, ehs):
        def body(carry, x):
            t, pt = x
            eps, kv = unet.apply(params, carry, t, ehs)
            nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
            return nxt, kv
        return jax.lax.scan(body, latents, (ts, ts_prev))

    def make_interp():
        # fresh trace each time: set_sdpa2_fused is a trace-time knob
        @jax.jit
        def interp(params, latents, ehs, kv0, kv1, alphas):
            def body(carry, x):
                t, pt, k0, k1 = x
                eps, _ = unet.apply(params, carry, t, ehs, kv_in=k0,
                                    kv_in2=k1, alpha=alphas)
                nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                return nxt, None
            return jax.lax.scan(body, latents,
                                (ts, ts_prev, kv0, kv1))[0]
        return interp

    r = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    inv0 = jnp.asarray(r.standard_normal(lat1.shape), jnp.float32)
    inv1 = jnp.asarray(r.standard_normal(lat1.shape), jnp.float32)
    print("compiling store scan...", flush=True)
    _, kv0 = store(params, inv0, ehs1)
    _, kv1 = store(params, inv1, ehs1)
    jax.block_until_ready(kv1)
    print("store done", flush=True)

    F = args.frames
    noises = jax.random.normal(key, (F, S, S, cfg.in_channels), jnp.float32)
    ehsN = jnp.repeat(ehs1, F, 0)
    alphas = jnp.asarray(np.linspace(0, 1, F), jnp.float32)[:, None, None]

    def measure(fused):
        set_sdpa2_fused(fused)
        print(f"compiling interp scan (fused={fused})...", flush=True)
        try:
            f = make_interp()
            # in-graph scalar materialization (CLAUDE.md: block_until_ready
            # may return early on this backend)
            out = f(params, noises, ehsN, kv0, kv1, alphas)
            chk = float(out.sum())
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(f(params, noises, ehsN, kv0, kv1, alphas).sum())
            return (time.perf_counter() - t0) / args.iters, chk
        finally:
            set_sdpa2_fused(True)

    t_un, c_un = measure(False)
    t_fu, c_fu = measure(True)
    out = {"frames": F, "steps": args.steps, "dtype": args.dtype,
           "latent": S,
           "unfused_s": round(t_un, 3), "fused_s": round(t_fu, 3),
           "speedup": round(t_un / t_fu, 3),
           "unfused_ms_per_step": round(t_un / args.steps * 1e3, 2),
           "fused_ms_per_step": round(t_fu / args.steps * 1e3, 2),
           "checksum_rel_diff": abs(c_un - c_fu) / max(abs(c_un), 1e-9)}
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    mode = "a" if os.path.exists(args.out) else "w"
    with open(args.out, mode) as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
