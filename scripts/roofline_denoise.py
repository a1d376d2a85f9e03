"""Per-op-class roofline attribution for the batch-8 bf16 denoise step
(VERDICT r2 item 6): measure the full FFHQ UNet denoise step, then ablate
one op class at a time (attention -> identity-ish, filtered activations ->
plain, alias-free resamplers -> naive) and attribute the time delta to
that class. Ablation timing is the honest instrument on this relay
backend, where per-op profiler traces aren't retrievable.

Run on the real TPU, ONE job on the relay:

  python scripts/roofline_denoise.py [--batch 8] [--dtype bf16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--iters", type=int, default=20,
                   help="chained steps inside the timed scan")
    p.add_argument("--repeats", type=int, default=3,
                   help="timed scan launches; best-of is reported")
    p.add_argument("--out", type=str, default="results/roofline_denoise.json")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from afldm_tpu.models import UNet2DModel, UNet2DConfig

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ucfg_json = json.load(open(os.path.join(root,
                                            "configs/ldm/model_unet.json")))
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    def build(alias_free=True, add_attention=True, filtered_act=None):
        cfg_d = dict(ucfg_json)
        if not add_attention:
            # drop the attention blocks entirely (DownBlock2D / UpBlock2D)
            cfg_d["down_block_types"] = [
                t.replace("AttnDownBlock2D", "DownBlock2D")
                for t in cfg_d["down_block_types"]]
            cfg_d["up_block_types"] = [
                t.replace("AttnUpBlock2D", "UpBlock2D")
                for t in cfg_d["up_block_types"]]
            cfg_d["add_attention"] = False
        if filtered_act is not None:
            cfg_d["filtered_act"] = filtered_act
        cfg = UNet2DConfig.from_diffusers(cfg_d, alias_free=alias_free)
        model = UNet2DModel(cfg, dtype=dt)
        lat = jnp.zeros((args.batch, cfg.sample_size, cfg.sample_size,
                         cfg.in_channels), dt)
        t = jnp.zeros((args.batch,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lat, t)

        # time an IN-GRAPH scan of `iters` chained steps: one host<->relay
        # roundtrip per measurement instead of one per step. A 40 ms step
        # measured call-by-call on this relay is latency-dominated (the
        # first cut of this script produced a negative attention share
        # that way — BENCH_NOTES round 4).
        @jax.jit
        def stepN(params, z, t):
            def body(c, _):
                return model.apply(params, c, t)[0], None
            return jax.lax.scan(body, z, None, length=args.iters)[0]

        return stepN, params, lat, t

    def measure(stepN, params, lat, t):
        float(stepN(params, lat, t).sum())   # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            # in-graph scalar materialization (CLAUDE.md: block_until_ready
            # may return early on this backend)
            float(stepN(params, lat, t).sum())
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    from afldm_tpu.ops import set_af_precision

    rows = {}
    stepN, params, lat, t = build(alias_free=True, add_attention=True)
    base = measure(stepN, params, lat, t)
    rows["full_af_step_ms"] = round(base * 1e3, 3)
    # MFU: compiled-executable flops of the scan program ~= one step's
    # flops (the while body is counted ONCE regardless of trip count —
    # CLAUDE.md), over the v5e bf16 peak
    try:
        cost = stepN.lower(params, lat, t).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            rows["gflop_per_step"] = round(flops / 1e9, 2)
            rows["mfu_vs_197tflops_bf16"] = round(
                flops / base / 197e12, 4)
    except Exception as e:  # pragma: no cover - relay quirk tolerance
        rows["cost_analysis_error"] = str(e)
    # MXU precision of the circulant filtered-act matmuls: HIGHEST is the
    # 6-pass exact default; "high" (3-pass, ~4e-5 err) and DEFAULT (raw
    # bf16 MXU) trade exactness for time — candidate MFU lever
    for prec in ("high", "default"):
        set_af_precision(prec)
        try:
            t = measure(*build(alias_free=True, add_attention=True))
            rows[f"full_af_step_prec_{prec}_ms"] = round(t * 1e3, 3)
        finally:
            set_af_precision("highest")
    if args.dtype == "bf16":
        # 2-pass operator-split circulant path for bf16 activations
        # (ops/ideal_lpf.set_af_bf16_split; default off until measured)
        from afldm_tpu.ops import set_af_bf16_split
        set_af_bf16_split(True)
        try:
            t = measure(*build(alias_free=True, add_attention=True))
            rows["full_af_step_bf16_split_ms"] = round(t * 1e3, 3)
        finally:
            set_af_bf16_split(False)
    no_attn = measure(*build(alias_free=True, add_attention=False))
    rows["no_attention_ms"] = round(no_attn * 1e3, 3)
    naive = measure(*build(alias_free=False, add_attention=True))
    rows["naive_resample_plain_act_ms"] = round(naive * 1e3, 3)
    # split the AF machinery: filtered activations vs FFT resamplers
    plain_act = measure(*build(alias_free=True, add_attention=True,
                               filtered_act=False))
    rows["af_resample_plain_act_ms"] = round(plain_act * 1e3, 3)
    act_only = measure(*build(alias_free=False, add_attention=True,
                              filtered_act=True))
    rows["naive_resample_filtered_act_ms"] = round(act_only * 1e3, 3)
    naive_noattn = measure(*build(alias_free=False, add_attention=False))
    rows["conv_core_ms"] = round(naive_noattn * 1e3, 3)

    rows["attention_share"] = round(1 - no_attn / base, 3)
    rows["af_machinery_share"] = round(1 - naive / base, 3)
    rows["filtered_act_share"] = round(1 - plain_act / base, 3)
    rows["af_resample_share"] = round((plain_act - naive) / base, 3)
    rows["batch"] = args.batch
    rows["dtype"] = args.dtype
    print(json.dumps(rows, indent=2))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
