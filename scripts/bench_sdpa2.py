"""A/B the fused two-KV CFA-interp attention (ops.attention.sdpa2_flash)
against the unfused two-flash-calls + blend baseline at SD sizes
(VERDICT r2 item 5). Run on the real TPU (no JAX_PLATFORMS override), ONE
job at a time on the relay.

  python scripts/bench_sdpa2.py [--frames 17] [--heads 8] [--tokens 4096]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=17)   # interp default
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--tokens", type=int, default=4096)  # SD 64x64 latents
    p.add_argument("--dim", type=int, default=80)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", type=str, default="f32",
                   choices=["f32", "bf16"])
    p.add_argument("--out", type=str, default="results/bench_sdpa2.json")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from afldm_tpu.ops.attention import sdpa_flash, sdpa2_flash

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    B, H, L, D = args.frames, args.heads, args.tokens, args.dim
    r = np.random.default_rng(0)

    def rand():
        return jnp.asarray(r.standard_normal((B, H, L, D)), dt)

    q, k0, v0, k1, v1 = rand(), rand(), rand(), rand(), rand()
    alpha = jnp.asarray(np.linspace(0, 1, B), jnp.float32)

    def fused1(q, k0, v0, k1, v1, alpha):
        return sdpa2_flash(q, k0, v0, k1, v1, alpha)

    def unfused1(q, k0, v0, k1, v1, alpha):
        o0 = sdpa_flash(q, k0, v0)
        o1 = sdpa_flash(q, k1, v1)
        a = alpha[:, None, None, None]
        return (1.0 - a) * o0 + a * o1

    fused = jax.jit(fused1)
    unfused = jax.jit(unfused1)

    def chainN(f1):
        # IN-GRAPH chain of `iters` dependent op calls: one host<->relay
        # roundtrip per measurement (a lone ~50 ms op timed call-by-call
        # on this relay is latency-diluted — BENCH_NOTES round 4)
        @jax.jit
        def g(q, k0, v0, k1, v1, alpha):
            def body(c, _):
                # cast the OUTPUT: the unfused blend promotes bf16 to f32
                # (alpha is f32), which would mismatch the bf16 carry
                return f1(c, k0, v0, k1, v1, alpha).astype(dt), None
            return jax.lax.scan(body, q, None, length=args.iters)[0]
        return g

    def measure(f1):
        g = chainN(f1)
        # materialize an in-graph scalar: block_until_ready may return
        # before remote execution finishes on this backend (CLAUDE.md)
        float(g(q, k0, v0, k1, v1, alpha).sum())   # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(q, k0, v0, k1, v1, alpha).sum())
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    t_un = measure(unfused1)
    t_fu = measure(fused1)
    # correctness on device
    d = float(jnp.max(jnp.abs(
        fused(q, k0, v0, k1, v1, alpha).astype(jnp.float32)
        - unfused(q, k0, v0, k1, v1, alpha).astype(jnp.float32))))
    out = {"shape": [B, H, L, D], "dtype": args.dtype,
           "unfused_ms": round(t_un * 1e3, 3),
           "fused_ms": round(t_fu * 1e3, 3),
           "speedup": round(t_un / t_fu, 3), "max_abs_diff": d}
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    mode = "a" if os.path.exists(args.out) else "w"
    with open(args.out, mode) as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
